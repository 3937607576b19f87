package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Sources, Transform}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship end-to-end slice (SURVEY §7.2): scan orders+customer,
    * join, run the engine's signature wide→JSONB pack
    * (reference etl_supabase.py:35-68 re-expressed as one Catalyst
    * projection). Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val x = Sources.Tables(spark, "/root/testdata/sf0.001")
    val wide = x.orders
      .join(x.customer, col("o_custkey") === col("c_custkey"))
      .select(
        col("c_name").as("ticker"),
        year(col("o_orderdate")).as("year"),
        col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
    Transform.packJsonb(wide)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-hash-based MinHash/SimHash/LSH) → driver records a weaker
    * rows-only check; those operators carry ScalaTest recall specs.
    */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
