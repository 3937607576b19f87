package graft.queries

import org.apache.spark.sql.functions._

import QU._
import graft.engine.Transform

/** The engine's signature transform (SURVEY §2.3 T1) exercised as
  * declared queries, plus the JSON scalar-access surface.
  *
  * The pack itself produces `map<string,string>`; for the oracle the
  * packed map is probed back out with `element_at`, which verifies
  * both the pack and map access against plain column reads in DuckDB.
  * Payload values here are strings/ints — stringification of those is
  * byte-identical across engines (doubles would not be; their JSON
  * path is covered by unit tests instead, SURVEY §7.4.2).
  */
object JsonOps {

  lazy val queries: Seq[Q] = Seq(

    // -- signature op end-to-end: wide (orders⋈customer) → packJsonb →
    //    probe the map. One shuffle (the join); the pack is map-side.
    Q("q30_pack_jsonb",
      (s, d) => {
        val x = t(s, d)
        val wide = x.orders
          .join(x.customer, col("o_custkey") === col("c_custkey"))
          .filter(col("o_orderkey") % 20 === 0)
          .select(
            col("c_name").as("ticker"),                 // ticker column (Schema.TickerNames)
            year(col("o_orderdate")).as("year"),        // year column
            col("o_orderkey"),                          // payload below
            col("o_orderstatus"),
            col("o_orderpriority"))
        val packed = Transform.packJsonb(wide)
        packed.select(
            col("ticker"), col("year"),
            element_at(col("data"), "o_orderkey").as("okey_str"),
            element_at(col("data"), "o_orderstatus").as("status"),
            element_at(col("data"), "o_orderpriority").as("priority"))
          .orderBy(col("okey_str"))
      },
      Some("""SELECT c_name AS ticker, CAST(YEAR(o_orderdate) AS INT) AS year,
        CAST(o_orderkey AS VARCHAR) AS okey_str,
        o_orderstatus AS status, o_orderpriority AS priority
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderkey % 20 = 0 ORDER BY okey_str"""),
      "wide→(ticker,year,data) pack + map probe"),

    // -- pack edge semantics: no year/ticker columns at all →
    //    year null, ticker literal default (reference :50, :59).
    Q("q31_pack_defaults",
      (s, d) => {
        val wide = t(s, d).part
          .filter(col("p_partkey") % 25 === 0)
          .select(col("p_partkey"), col("p_brand"), col("p_type"))
        Transform.packJsonb(wide)
          .select(col("ticker"), col("year"),
            element_at(col("data"), "p_partkey").as("pkey_str"),
            element_at(col("data"), "p_brand").as("brand"),
            map_keys(col("data")).getItem(0).as("first_key"),
            size(col("data")).as("n_keys"))
          .orderBy(col("pkey_str"))
      },
      Some("""SELECT 'FPT' AS ticker, CAST(NULL AS INT) AS year,
        CAST(p_partkey AS VARCHAR) AS pkey_str, p_brand AS brand,
        'p_partkey' AS first_key, 3 AS n_keys
        FROM part WHERE p_partkey % 25 = 0 ORDER BY pkey_str"""),
      "pack fallback ticker + null year + key order"),

    // -- JSON string scalar access over events.props.
    Q("q32_json_access",
      (s, d) => t(s, d).events
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
        CAST(SUM(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
        COUNT(CAST(props->>'k' AS INT)) AS n
        FROM events GROUP BY event_type ORDER BY event_type"""),
      "get_json_object + aggregate"),

    // -- from_json into a typed struct, then field access.
    Q("q33_json_struct",
      (s, d) => t(s, d).events
        .filter(col("event_id") % 10 === 0)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, CAST(props->>'k' AS INT) AS k
        FROM events WHERE event_id % 10 = 0 ORDER BY event_id"""),
      "from_json schema-full parse"),

    // -- to_json re-serialization round-trip on string/int fields
    //    (struct key order is schema order — deterministic both sides).
    Q("q34_to_json",
      (s, d) => t(s, d).orders
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"),
          to_json(struct(col("o_orderstatus").as("st"),
                         col("o_orderpriority").as("pr"))).as("payload"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        '{"st":"' || o_orderstatus || '","pr":"' || o_orderpriority || '"}' AS payload
        FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey"""),
      "to_json(struct) serialization")
  )
}
