package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: pair every point row with every interval row
  * whose half-open interval [lo, hi) contains the point value. Spark
  * has no native range-join operator — the naive formulation
  * `points.join(intervals, v >= lo && v < hi)` has no equi-key, so
  * Catalyst plans a BroadcastNestedLoopJoin: O(|P|·|I|) comparisons,
  * and a driver OOM once neither side fits the broadcast threshold.
  *
  * This is the bin-bucketed rewrite (the standard one in genomics /
  * interval engines): quantize the value domain into fixed-width
  * bins, explode each interval onto every bin it overlaps, bucket
  * each point into its single bin, equi-join on the bin id, and
  * re-check the exact predicate as a residual filter. Catalyst then
  * plans an ordinary hash/sort-merge equi-join: shuffle volume is
  * |P| + |I|·(span/binWidth + 1) rows — linear, the 100 TB-safe
  * shape — and AQE still auto-broadcasts when the exploded interval
  * side is small.
  *
  * binWidth tuning: bins per interval = span/binWidth + 1 (the
  * explode factor) while candidate pairs per bin grow with binWidth
  * (the residual-filter factor); set binWidth ≈ the typical interval
  * span so both stay O(1). A degenerately small width fails loudly
  * inside `sequence` (hard element cap) rather than silently
  * degrading to a cartesian.
  *
  * Nulls: a null point value or interval bound never matches (its
  * bin key is null and null keys don't equi-join) — SQL inner-join
  * semantics. Empty intervals (hi <= lo) are dropped up front so the
  * descending-`sequence` corner can't manufacture candidate bins.
  */
object RangeJoin {

  /** @param points     side carrying one value per row
    * @param pointValue numeric column name on `points`
    * @param intervals  side carrying [lo, hi) per row
    * @param lo         inclusive lower-bound column name on `intervals`
    * @param hi         exclusive upper-bound column name on `intervals`
    * @param binWidth   bin size in value units (≈ typical interval span)
    * @return inner join of `points.*` with `intervals.*` on containment
    */
  def binned(points: DataFrame, pointValue: String,
             intervals: DataFrame, lo: String, hi: String,
             binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!(points.columns ++ intervals.columns).exists(_.startsWith("__")),
      "RangeJoin reserves the __ column-name prefix for internal bin keys")
    val p = points.withColumn("__bin",
      floor(col(pointValue) / binWidth).cast("long"))
    val i = intervals
      .filter(col(lo) < col(hi))
      .withColumn("__bin",
        explode(sequence(floor(col(lo) / binWidth).cast("long"),
          floor(col(hi) / binWidth).cast("long"))))
    p.join(i, Seq("__bin"))
      .filter(col(pointValue) >= col(lo) && col(pointValue) < col(hi))
      .drop("__bin")
  }
}
