#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]

For each query result parquet under <verifyOutDir>/<name>/, runs the
matching oracle SQL from oracle_sql.json against DuckDB views over the
sfDir parquet tables, sorts columns by name, sorts rows, and compares
cell values exactly. Queries without oracle SQL get a rows-only note.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols, got_rows = canon(got.fetchall(), got.columns)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            bad += 1
            continue
        try:
            exp = con.sql(sql)
            exp_types = dict(zip(exp.columns, [str(t) for t in exp.types]))
            exp_cols, exp_rows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            bad += 1
            continue
        # The driver's comparator hashes pandas dtypes and row-sorts
        # with hashable cells — HUGEINT (vs Spark's BIGINT) and any
        # list-typed column fail there even when values are identical.
        # Replicate that strictness locally so it can't ship red.
        type_bad = False
        for c, t in exp_types.items():
            if "HUGEINT" in t:
                print(f"FAIL {name}: oracle column {c} is {t} "
                      f"(driver hash-mismatches vs Spark BIGINT — "
                      f"CAST(... AS BIGINT) in the oracle SQL)")
                type_bad = True
            if t.endswith("[]") or "STRUCT" in t or "MAP" in t:
                print(f"FAIL {name}: oracle column {c} is {t} "
                      f"(driver comparator can't sort list/struct cells — "
                      f"declare a scalar digest instead)")
                type_bad = True
        for c, t in zip(got.columns, [str(t) for t in got.types]):
            if t.endswith("[]") or "STRUCT" in t or "MAP" in t:
                print(f"FAIL {name}: spark column {c} is {t} "
                      f"(declared outputs must be scalar — digest it)")
                type_bad = True
        # scalar width mismatches (spark INTEGER vs oracle BIGINT) are
        # WARN only: round-4 driver evidence (q16/q73 green) shows the
        # driver's comparator tolerates int32-vs-int64; only HUGEINT
        # (pandas object/float) and list cells actually fail there.
        for c in got.columns:
            if c in exp_types and not type_bad:
                gt = str(dict(zip(got.columns,
                                  [str(t) for t in got.types]))[c])
                if gt != exp_types[c]:
                    print(f"WARN {name}: column {c} typed {gt} (spark) "
                          f"vs {exp_types[c]} (oracle)")
        if type_bad:
            bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            bad += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            bad += 1
            continue
        mismatch = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            if g != e:
                mismatch = (i, g, e)
                break
        if mismatch:
            i, g, e = mismatch
            print(f"FAIL {name}: first row diff at {i}:")
            print(f"  cols:  {got_cols}")
            print(f"  spark: {g}")
            print(f"  duckdb:{e}")
            bad += 1
        else:
            print(f"OK   {name} ({len(got_rows)} rows)")
            ok += 1
    # rows-only queries
    import glob
    import os
    for p in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(p)
        if name not in oracle and (not only or name in only):
            try:
                n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"ROWS {name}: {n} rows (no oracle)")
            except Exception as e:
                print(f"FAIL {name}: unreadable: {e}")
                bad += 1
    print(f"\n{ok} ok, {bad} failed")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
