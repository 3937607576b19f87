package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Sources

/** One declared query: the Spark plan and (when SQL-expressible) the
  * DuckDB oracle SQL over the same parquet tables. Keeping both in one
  * value is what keeps column names in sync — the driver's compare
  * sorts columns by name before hashing, so every computed column is
  * aliased identically on both sides.
  *
  * Caching contract: a query MAY persist() intermediates it reuses
  * (the dedup pipelines do). Harnesses that execute many queries in
  * one session should `spark.catalog.clearCache()` between queries —
  * Bench and Verify do — since the lazily-returned frame gives the
  * query no hook to unpersist after its action completes.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String],
    doc: String = "")

object Registry {
  def all: Seq[Q] =
    Relational.queries ++ Windows.queries ++ JsonOps.queries ++
      EventOps.queries ++ TextOps.queries ++ NearDupOps.queries ++
      CorpusStatsOps.queries ++ SampleOps.queries ++
      Similarity.queries ++ MultimodalOps.queries ++
      TrainingOps.queries ++ TokenizerOps.queries ++
      QualityOps.queries ++ LayoutOps.queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(q.name -> _)).toMap
}

/** Shared helpers enforcing the determinism conventions. */
object QU {
  /** Exact money arithmetic: sum in DECIMAL(38,6) (order-independent,
    * identical in Spark and DuckDB) then surface as double. A raw
    * double sum differs in low bits across partition orders — it
    * would be flaky against the oracle AND across Spark runs.
    *
    * Measured cost (sf0.1 lineitem, local[32]): the decimal path is
    * ~4× a plain double sum (1.7s vs 0.4s for q01's aggregate). The
    * tempting fast path — scaled-long micro-units summed as BIGINT —
    * is rejected for 100 TB honesty: a long caps the sum at ~9.2e12
    * units (6dp scale), and a petabyte fact table's money totals
    * exceed that (6e11 rows × 4e4 avg ≈ 2e16). DECIMAL(38,6) is the
    * smallest type that stays exact at the target scale on both
    * engines; the 4× is the price of bit-stable answers.
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(38,6)")).cast("double")

  /** Deterministic average: exact decimal sum / count, divided in
    * double space (IEEE-identical across engines).
    */
  def davg(c: Column): Column =
    sum(c.cast("decimal(38,6)")).cast("double") / count(c)

  /** DuckDB-side spellings of the same. */
  def sqlDsum(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(38,6))) AS DOUBLE)"
  def sqlDavg(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(38,6))) AS DOUBLE) / COUNT($e)"

  def t(spark: SparkSession, sfDir: String): Sources.Tables =
    Sources.Tables(spark, sfDir)
}
