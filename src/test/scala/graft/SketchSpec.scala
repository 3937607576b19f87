package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.queries.Registry

/** Contract verification for the count-min-sketch heavy-hitter query
  * (q72), which has no SQL oracle: estimates must respect the CMS
  * guarantee against exact counts, and the sample+sketch pipeline
  * must recover the exact top tokens.
  */
class SketchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("q72 CMS estimates: est >= exact and est <= exact + eps*N; top-20 recall >= 0.9") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val exact = docs.select(explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalTokens = exact.values.sum
    val eps = 0.001
    val got = Registry.queries("q72_token_cms")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.length === 20)
    got.foreach { case (tok, est) =>
      val truth = exact(tok)
      assert(est >= truth, s"CMS must never underestimate: $tok est $est < $truth")
      assert(est <= truth + eps * totalTokens,
        s"$tok est $est exceeds $truth + ${eps * totalTokens}")
    }
    val exactTop20 = exact.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(20).map(_._1).toSet
    val recall = got.map(_._1).count(exactTop20.contains).toDouble / 20
    info(s"q72 recall vs exact top-20: $recall")
    assert(recall >= 0.9, s"recall $recall")
  }

  test("q72 is deterministic for fixed input (fixed sketch seed)") {
    val a = Registry.queries("q72_token_cms")(spark, dir).collect().toSeq
    val b = Registry.queries("q72_token_cms")(spark, dir).collect().toSeq
    assert(a === b && a.nonEmpty)
  }
}
