package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.plans.JaccardSizePrefilter

/** The injected optimizer rule must rewrite Jaccard-threshold filters
  * with the implied size bound and must not change results.
  */
class PlanRulesSpec extends SparkSpec {

  private def pairQuery = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
      .select(col("doc_id"), Text.shingleHashes(col("text"), 3).as("sh"))
    docs.select(col("doc_id").as("a"), col("sh").as("sh_a"))
      .crossJoin(docs.select(col("doc_id").as("b"), col("sh").as("sh_b")))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), Text.jaccardLong(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= 0.2)
  }

  test("rule injects the size prefilter and preserves results exactly") {
    val plain = pairQuery.collect().map(_.toSeq).toSet
    spark.experimental.extraOptimizations = Seq(new JaccardSizePrefilter(spark))
    try {
      val q = pairQuery
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("least(") && optimized.contains("greatest("),
        s"size bound missing from optimized plan:\n$optimized")
      assert(q.collect().map(_.toSeq).toSet === plain)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule is idempotent across repeated application") {
    val rule = new JaccardSizePrefilter(spark)
    spark.experimental.extraOptimizations = Seq(rule)
    try {
      val once = pairQuery.queryExecution.optimizedPlan
      val twice = rule(rule(once))
      assert(twice.toString === once.toString)
    } finally spark.experimental.extraOptimizations = Nil
  }
}
