package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k WITHOUT a sort window.
  *
  * The standard Spark formulation — `row_number() over (partition by
  * g order by s desc)` then `rn <= k` — materializes and SORTS every
  * group in full before discarding all but k rows; on a skewed 100 TB
  * corpus the hottest group becomes one task sorting billions of rows
  * it will throw away. This operator keeps a bounded k-element heap
  * per group inside a typed [[Aggregator]] instead: partial
  * aggregation trims map-side, the shuffle carries at most k rows per
  * (partition, group), and no full-group sort ever exists. Same
  * preference-order reasoning as SURVEY §2.8: an `Aggregator` plans
  * as a normal aggregate — no custom strategy needed.
  *
  * Ordering is (score DESC, id ASC) — exactly `row_number`'s
  * deterministic tie-break — so results are row-identical to the
  * window formulation (TopKSpec asserts it) and any window-form
  * oracle applies unchanged.
  */
object TopKPerGroup {

  /** Bounded top-k buffer: best-first by (-score, id); reduce is an
    * O(k) sorted insert, merge an O(k) sorted merge — constant state
    * per group regardless of group size.
    */
  final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(b: List[(Double, Long)],
                       a: (Double, Long)): List[(Double, Long)] = {
      val (pre, post) = b.span(better(_, a))
      val merged = pre ::: (a :: post)
      if (merged.length > k) merged.take(k) else merged
    }
    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)],
                        a: (Double, Long)): List[(Double, Long)] = insert(b, a)
    override def merge(x: List[(Double, Long)],
                       y: List[(Double, Long)]): List[(Double, Long)] =
      y.foldLeft(x)(insert)
    override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder()
  }

  /** Top `k` rows per group of `df`: highest `score` first, ties by
    * lowest `id`. Returns the group columns plus (id, score, rn) —
    * the `row_number <= k` output shape, computed as one hash
    * aggregate plus a k-element explode.
    */
  def topK(df: DataFrame, groupCols: Seq[String], score: Column,
           id: Column, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k), ExpressionEncoder[(Double, Long)]())
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(score.cast("double"), id.cast("long")).as("__top"))
      .select(groupCols.map(col) :+
        posexplode(col("__top")).as(Seq("__pos", "__t")): _*)
      .select(groupCols.map(col) :+
        col("__t._2").as("id") :+
        col("__t._1").as("score") :+
        (col("__pos") + 1).cast("int").as("rn"): _*)
  }
}
