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
