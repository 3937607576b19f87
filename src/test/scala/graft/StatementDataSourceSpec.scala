package graft

import org.apache.spark.sql.functions._

import graft.engine.Transform

/** DSv2 connector behavior: (symbol × statement) partition fan-out,
  * required-column pruning reaching the scan, deterministic rows, and
  * compatibility with the engine's pack transform.
  */
class StatementDataSourceSpec extends SparkSpec {

  private def read(symbols: String, statements: String) =
    spark.read.format("graft.sources.StatementDataSource")
      .option("symbols", symbols)
      .option("statements", statements)
      .option("years", "2018-2022")
      .load()

  test("one input partition per (symbol, statement); rows = years each") {
    val df = read("FPT,VNM,HPG", "income_statement,balance_sheet")
    assert(df.rdd.getNumPartitions === 6)
    assert(df.count() === 6L * 5)
    assert(df.select(col("cp")).distinct().count() === 3)
  }

  test("column pruning pushes into the DSv2 scan") {
    val df = read("FPT", "income_statement").select(col("cp"), col("revenue"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name).toSet === Set("cp", "revenue"),
      s"scan produced ${scan.output.map(_.name)} — pruning not pushed")
  }

  test("symbol/statement equality filters prune the partition plan") {
    val df = read("FPT,VNM,HPG", "income_statement,balance_sheet")
      .filter(col("cp") === "FPT")
    // 1 surviving symbol × 2 statements — the filter removed four
    // partitions from the PLAN, it did not scan-and-drop their rows
    assert(df.rdd.getNumPartitions === 2,
      s"expected 2 planned partitions, got ${df.rdd.getNumPartitions}")
    assert(df.count() === 2L * 5)
    val one = read("FPT,VNM,HPG", "income_statement,balance_sheet")
      .filter(col("cp") === "VNM" && col("statement") === "balance_sheet")
    assert(one.rdd.getNumPartitions === 1)
    assert(one.count() === 5)
  }

  test("year range filters narrow every reader's fetch range") {
    val base = read("FPT,VNM", "income_statement")
    val ranged = base.filter(col("year") >= 2021 && col("year") < 2022)
    assert(ranged.count() === 2, "one year × two symbols")
    assert(ranged.select(col("year")).distinct().collect().map(_.getInt(0)).toSeq === Seq(2021))
    // pushed range must agree with post-scan filtering semantics
    val expected = base.collect().filter(r => r.getInt(2) == 2021).map(_.toSeq).toSet
    assert(ranged.collect().map(_.toSeq).toSet === expected)
    // contradictory range → zero partitions planned, zero rows
    val none = base.filter(col("year") > 2030)
    assert(none.count() === 0)
  }

  test("unsupported predicates stay residual and still filter correctly") {
    val df = read("FPT", "income_statement")
    val all = df.collect()
    val cut = all.map(_.getDouble(3)).sorted.apply(2) // a mid revenue value
    val got = df.filter(col("revenue") > cut).collect().map(_.toSeq).toSet
    val expected = all.filter(_.getDouble(3) > cut).map(_.toSeq).toSet
    assert(got === expected && got.nonEmpty)
  }

  test("rows are deterministic across reads") {
    val a = read("FPT", "cash_flow").collect().map(_.toSeq).toSet
    val b = read("FPT", "cash_flow").collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
  }

  test("connector output packs through the engine transform") {
    val packed = Transform.packJsonb(read("FPT", "income_statement"))
    val rows = packed.collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getString(0) == "FPT"))
    // non-reserved columns land in the payload map
    val data = rows.head.getMap[String, String](2)
    assert(graft.sources.StatementDataSource.Metrics
      .forall(m => data.contains(m)))
  }
}
