package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HDR-style integer log-histogram: the deterministic, relation-shaped
  * quantile sketch behind q117 and `EventStream.histRollupStream`.
  *
  * Values are bucketed in centi-units (`floor(value·100)`) with 7
  * mantissa ("sub-bucket") bits: exact buckets below 2^8 centi-units,
  * then per-power-of-two bands of 128 buckets — relative bucket width
  * ≤ 1/128 everywhere above the exact region. ~2k buckets span 9
  * decades, so per-group state is bounded and the histogram of ANY
  * key range is a groupBy-sum of stored rows (mergeable by integer
  * addition — no sketch library, no randomness, and the whole
  * pipeline is expressible in ANSI SQL, which is what lets q117 carry
  * a full DuckDB hash-match where KLL/t-digest could only offer a
  * rows-only check).
  *
  * floor(log2 x) is `length(bin(x)) - 1` — pure integer/string ops
  * that Spark and DuckDB evaluate identically (both render BIGINT as
  * an unpadded binary string).
  */
object HdrHistogram {
  /** Mantissa bits: relative bucket width ≤ 2^-7. */
  val SubBucketBits = 7

  private val Base = 1 << (SubBucketBits + 1) // 256: exact-region bound
  private val Sub = 1 << SubBucketBits // 128 sub-buckets per band

  /** Centi-unit integerization of a non-negative double value. */
  def centi(value: Column): Column = floor(value * 100).cast("long")

  /** Bucket id of a non-negative BIGINT `x` (monotone in x). */
  def bucket(x: Column): Column = {
    val e = (length(bin(x)) - 1).cast("int") // floor(log2 x), x >= 1
    when(x < Base, x).otherwise(
      (e - SubBucketBits).cast("bigint") * Sub
        + call_function("shiftright", x, e - lit(SubBucketBits))
        - Sub + Base)
  }

  /** Midpoint decode of a bucket id back to value units (double). */
  def midpoint(bucket: Column): Column = {
    // band arithmetic: /128 and %128 are constant power-of-two shifts
    val eShift = shiftright(bucket - Base, SubBucketBits).cast("int")
    val sub = (bucket - Base).bitwiseAND(lit(Sub - 1))
    val lo = call_function("shiftleft", sub + Sub, eShift)
    val w = call_function("shiftleft", lit(1L), eShift)
    when(bucket < Base, (bucket * 2 + 1) / lit(200.0))
      .otherwise((lo * 2 + w) / lit(200.0))
  }

  /** Per-day histogram of `value`: the stored mergeable table
    * `(day, bucket, cnt)`. Shuffle key is (day, bucket) — bounded by
    * days × ~2k buckets regardless of event volume, with map-side
    * partial aggregation collapsing each partition first.
    */
  def dailyHist(events: DataFrame, ts: Column, value: Column): DataFrame =
    events.select(to_date(ts).as("day"), bucket(centi(value)).as("bucket"))
      .groupBy(col("day"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Lower-quantile estimate per GROUP off a `(keys…, bucket, cnt)`
    * histogram: least bucket whose cumulative count reaches
    * ceil(p·n), decoded to its midpoint (deterministic ≤ 1/128
    * relative error above the exact region — the q117 walk with a
    * group key instead of a day range). Output: (keys…, `out`).
    * Every frame is (groups × ~2k buckets)-cardinality.
    */
  def groupQuantile(hist: DataFrame, keys: Seq[String], p: Double,
                    out: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val kc = keys.map(col)
    val cum = hist
      .withColumn("cum", sum(col("cnt"))
        .over(w.partitionBy(kc: _*).orderBy(col("bucket"))))
      .withColumn("n", sum(col("cnt")).over(w.partitionBy(kc: _*)))
    cum.filter(col("cum") >= ceil(col("n") * p))
      .groupBy(kc: _*)
      .agg(min(col("bucket")).as("__b"))
      .select(kc :+ midpoint(col("__b")).as(out): _*)
  }

  /** Quantiles of arbitrary day ranges from a stored histogram table
    * (q117's walk, public so the `histRollupStream`-maintained table
    * is queryable without re-deriving it). `ranges` is a tiny
    * `(range_name, d_lo, d_hi)` frame (broadcast); output is one row
    * per (range, p): lower quantile — least bucket whose cumulative
    * count reaches ceil(p·n) — decoded to the bucket midpoint. Every
    * frame after the merge is (ranges × buckets)-cardinality; raw
    * events are never touched.
    */
  def rangeQuantiles(hist: DataFrame, ranges: DataFrame,
                     ps: Seq[Double]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val merged = hist
      .join(broadcast(ranges), col("day").between(col("d_lo"), col("d_hi")))
      .groupBy(col("range_name"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val cum = merged
      .withColumn("cum", sum(col("cnt")).over(
        w.partitionBy(col("range_name")).orderBy(col("bucket"))))
      .withColumn("n", sum(col("cnt")).over(w.partitionBy(col("range_name"))))
    val qs = hist.sparkSession.range(1)
      .select(explode(array(ps.map(lit(_)): _*)).as("p"))
    cum.crossJoin(broadcast(qs))
      .filter(col("cum") >= ceil(col("n") * col("p")))
      .groupBy(col("range_name"), col("p"))
      .agg(min(col("bucket")).as("bucket"), max(col("n")).as("n_events"))
      .select(col("range_name"), col("p"), col("n_events"),
        midpoint(col("bucket")).as("est_value"))
      .orderBy(col("range_name"), col("p"))
  }
}
