package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared candidate-pair stage of every LSH dedup family (text
  * MinHash q56, SimHash q68, embedding hyperplane q69): band rows
  * sharing a bucket become pairs, with the skew discipline applied
  * uniformly —
  *
  *  - singleton buckets can't pair and are dropped before the join;
  *  - buckets ≤ `maxBucket` self-join into ordinary (a < b) pairs;
  *  - OVER-cap buckets (dense duplicate clusters — members agree on a
  *    whole band, so they are near-identical by construction) take the
  *    CLUSTER-REPRESENTATIVE path instead of vanishing: each member
  *    pairs with the bucket's min id only, m−1 star edges instead of
  *    m² — a 20k-copy cluster emits 19,999 candidates, not 2×10⁸.
  *    Every star edge still flows through the caller's estimate/verify
  *    chain like any other candidate.
  *
  * ONE aggregate computes both the bucket size and the representative
  * (map-side partial count/min, so a hot key never concentrates rows
  * on one task); the tagged band table is persisted AND materialized
  * here because it feeds three consumers (both self-join sides plus
  * the star branch) — an unmaterialized cache is recomputed by each
  * racing consumer (the measured 156s-vs-21s cascade, SURVEY §2.10).
  *
  * Cache lifetime: this object holds at most ONE live band-table
  * persist. Each call releases the previous call's (by then the
  * previous query's candidates are materialized), so a session
  * running many dedup queries (q56→q68→q69→q78…) accumulates one
  * n×L band table, not four — harness `clearCache()` or
  * [[releaseCache]] drops the last one. Unpersisting a frame a
  * still-lazy consumer references is safe in Spark (it recomputes).
  */
object BandedPairs {

  private var lastTagged: Option[DataFrame] = None

  /** Drop the most recent call's persisted band table. */
  def releaseCache(): Unit = synchronized {
    lastTagged.foreach(_.unpersist(blocking = false))
    lastTagged = None
  }

  /** @param banded     one row per (id, band bucket) — columns `idCol`
    *                    and `bucketCols` (must not contain `bn`/`rep`)
    * @param idCol      the element id column name
    * @param bucketCols the bucket key column name(s)
    * @param maxBucket  cap above which the star path engages
    * @param outA       output column name for the smaller/rep id
    * @param outB       output column name for the larger/member id
    * @return deduped candidate pairs (outA, outB)
    */
  def cappedCandidates(banded: DataFrame, idCol: String,
                       bucketCols: Seq[String], maxBucket: Int,
                       outA: String, outB: String): DataFrame = {
    require(!banded.columns.contains("bn") && !banded.columns.contains("rep"),
      "banded input must not carry bn/rep columns")
    val bCols = bucketCols.map(col)
    val bucketAgg = banded.groupBy(bCols: _*)
      .agg(count(lit(1)).as("bn"), min(col(idCol)).as("rep"))
      .filter(col("bn") > 1)
    val tagged = banded.join(bucketAgg, bucketCols).persist()
    synchronized {
      lastTagged.foreach(_.unpersist(blocking = false))
      lastTagged = Some(tagged)
    }
    tagged.count()
    val pruned = tagged.filter(col("bn") <= maxBucket)
    val pairCands = pruned.select(col(idCol).as(outA) +: bCols: _*)
      .join(pruned.select(col(idCol).as(outB) +: bCols: _*), bucketCols)
      .filter(col(outA) < col(outB))
      .select(col(outA), col(outB))
    val repPairs = tagged
      .filter(col("bn") > maxBucket && col(idCol) =!= col("rep"))
      .select(col("rep").as(outA), col(idCol).as(outB))
    pairCands.union(repPairs).distinct()
  }
}
