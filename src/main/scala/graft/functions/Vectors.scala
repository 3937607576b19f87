package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, as pure
  * Catalyst expression compositions (`zip_with` + `aggregate`) — no
  * UDFs, so similarity scoring stays inside the expression pipeline
  * and distributes as a plain projection.
  *
  * Determinism: elements are cast to double FIRST, then folded
  * left-to-right in index order — both Spark's `aggregate` and the
  * oracle's list functions accumulate sequentially, so scores are
  * bit-identical across engines.
  */
object Vectors {

  /** Element-wise cast to double. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product in double precision, index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; null-safe denominator (0-norm → null).
    * Implemented as the native fused-loop expression
    * [[graft.expressions.CosineSim]] — bit-identical to the HOF
    * composition (pinned in SimilaritySpec).
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Reference HOF formulation of [[cosine]] (kept for the spec pin). */
  def cosineHof(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(null).cast("double")).otherwise(dot(a, b) / d)
  }

  /** Let-bind `e` once inside `body` — HOFs run interpreted with no
    * common-subexpression elimination, so an aggregate referenced in
    * a per-element lambda would otherwise re-run per element (the
    * Text.bindOnce lesson).
    */
  private def bindOnce(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)

  /** max |v_i| in double precision (0.0 for an empty vector). */
  def maxAbs(v: Column): Column =
    aggregate(asDouble(v), lit(0.0), (acc, x) => greatest(acc, abs(x)))

  /** Symmetric int8 quantization scale: max|v|/127, or 1.0 for a
    * zero vector (so quantization maps it to zeros instead of NaN).
    */
  def quantScale(v: Column): Column =
    bindOnce(maxAbs(v)) { m =>
      when(m === 0.0, lit(1.0)).otherwise(m / 127.0)
    }

  /** Int8 scalar quantization: q_i = round(v_i / scale) ∈ [−127,127].
    * The 4× storage cut (float32 → int8) that makes a 100 TB ANN
    * corpus hold its index in memory; reconstruction is q_i·scale
    * with per-element error ≤ scale/2 by construction
    * ([[int8MaxAbsErr]], pinned in spec). Ties round away from zero
    * in both Spark (HALF_UP) and DuckDB, so the op is oracle-exact.
    */
  def quantizeInt8(v: Column): Column =
    bindOnce(quantScale(v)) { s =>
      transform(asDouble(v), x => round(x / s).cast("int"))
    }

  /** Max per-element reconstruction error |v_i − q_i·scale| (max is
    * order-free, each term a deterministic double expression — no
    * rounding needed for cross-engine compare).
    */
  def int8MaxAbsErr(v: Column): Column =
    bindOnce(quantScale(v)) { s =>
      aggregate(asDouble(v), lit(0.0),
        (acc, x) => greatest(acc, abs(x - round(x / s) * s)))
    }

  /** Random-hyperplane LSH bucket: `nBits` sign bits of dot products
    * with deterministic pseudo-hyperplanes. Hyperplane component
    * (i, j) is a fixed hash-derived value in [-1, 1) — stable across
    * runs, no runtime randomness. Vectors in the same bucket are ANN
    * candidates; at scale the bucket is the shuffle key (equi-join),
    * replacing the brute-force cross join.
    *
    * Dimensionality is taken from the vector itself (components are
    * derived per (bit, index) at runtime), so any embedding length
    * buckets correctly — no hardcoded dim that silently null-pads
    * mismatched arrays. All nBits partial sums are updated in ONE
    * pass over the vector instead of nBits separate
    * aggregate(zip_with(...)) traversals.
    */
  def hyperplaneBucket(v: Column, nBits: Int = 8, seed: Column = lit(7L)): Column = {
    val indexed = zip_with(asDouble(v), sequence(lit(0L), size(v).cast("bigint") - 1),
      (x, j) => struct(x.as("x"), j.as("j")))
    val sums = aggregate(indexed, array_repeat(lit(0.0), nBits),
      (acc, e) => transform(acc, (s, i) =>
        s + e.getField("x") * planeComponent(i, e.getField("j"), seed)))
    aggregate(transform(sums, s => when(s >= 0, lit(1L)).otherwise(lit(0L))),
      lit(0L), (b, bit) => b * 2 + bit)
  }

  /** All L multi-table hyperplane buckets in one native pass — the
    * codegen'd [[graft.expressions.HyperplaneBuckets]] (memoized
    * plane matrix + one fused loop), bit-identical to evaluating
    * [[hyperplaneBucket]] with seed = 0..L−1 (pinned in
    * SimilaritySpec). Explode the result to get (table, bucket) join
    * keys.
    */
  def hyperplaneBuckets(v: Column, nBits: Int, tables: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.HyperplaneBuckets(
      ColumnBridge.expression(v), nBits, tables))
  }

  /** Deterministic pseudo-hyperplane component for (bit i, index j,
    * seed): first 32 bits of `md5("i:j:seed")`, scaled to [-1, 1).
    * The mix MUST avalanche: an affine `i*A + j*B + seed*C mod 2^31`
    * leaves different seeds producing near-identical
    * (constant-shifted) planes, so "independent" LSH tables all hash
    * alike and extra tables add zero recall (measured: recall flat at
    * 1-table level for L=4..16). MD5 avalanches AND is
    * engine-portable (unlike xxhash64, which DuckDB lacks), so the
    * q63/q69 oracles replay the exact planes in SQL:
    * `('0x' || substr(md5(i||':'||j||':'||seed), 1, 8))::BIGINT /
    * 2147483648.0 - 1.0`. The quotient of a 32-bit int by 2^31 is
    * exact in double, so both engines hold the identical component.
    * The seed is a Column so one exploded table index drives L
    * independent tables in a single pass. Must stay bit-identical to
    * graft.expressions.HyperplaneBuckets.component (pinned in
    * SimilaritySpec).
    */
  private def planeComponent(i: Column, j: Column, seed: Column): Column = {
    val h = conv(substring(md5(concat_ws(":",
      i.cast("string"), j.cast("string"), seed.cast("string"))), 1, 8),
      16, 10).cast("bigint")
    h.cast("double") / lit(0x80000000L.toDouble) - 1.0
  }

  // ---- element-wise vector aggregation ----------------------------

  /** Element-wise vector sum with exact DECIMAL(38,6) accumulation —
    * the order-independent determinism convention (QU.dsum) applied
    * per element. Used for centroid computation: shuffle volume is
    * one k×dim partial per map task (TypedImperativeAggregate gives
    * map-side partial merge), NOT rows×dim exploded rows.
    *
    * Each input element is rounded to scale 6 from its EXACT binary
    * value (`new BigDecimal(v)`, not `valueOf`'s shortest-string
    * repr), and the final sum is surfaced as double. Exact-value
    * rounding is the only engine-portable convention: no double can
    * sit exactly on a .5×10⁻⁶ boundary (10⁻⁷ is not dyadic), so the
    * tie-breaking mode is irrelevant and any engine that rounds the
    * exact value — DuckDB's double→decimal cast included — agrees
    * bit-for-bit. (String-repr rounding diverged from the oracle on
    * ~2% of float-derived components: the shortest repr can print
    * "…5" for a value strictly above/below the half-way point.
    * The oracle must cast float columns to DOUBLE before the decimal
    * cast — DuckDB's direct FLOAT→DECIMAL scales in float32, which
    * manufactures exact .5 ties that round differently again.)
    */
  /** Exact 6dp half-up rounding of a double's BINARY value, returned
    * as a ×10⁶-scaled long. Equivalent to
    * `new BigDecimal(v).setScale(6, HALF_UP).movePointRight(6)` but
    * ~100× cheaper: the exact-expansion route does a multi-precision
    * divide per element (~5 µs — it put the sf0.1 covariance
    * aggregate at 37 s), while here the rounding decision is made on
    * the double product `|v|·10⁶` whenever it lands farther than
    * 1e-7 from a rounding boundary, and only boundary-band values
    * (and anything ≥ 1e13, where double integer resolution decays)
    * take the exact BigDecimal path.
    *
    * Why the fast path agrees with the exact expansion is NOT a
    * small-error bound on the multiply — near the 1e13 cutoff a
    * half-ulp of `y` is ~1e-3, far wider than the 1e-7 band. The
    * real invariant is representability: every x.5 offset lies ON
    * the double grid for y < 2^52 (0.5 = 2⁻¹ is dyadic, and the
    * 0.5-step grid extends to 2^52), and round-to-nearest can never
    * carry a value ACROSS a representable point — if the exact
    * product a·10⁶ ≤ x.5 then fl(a·1e6) ≤ x.5, and symmetrically
    * above. So whenever `y` sits strictly beyond the 1e-7 band from
    * x.5, the exact product is on the same side and the floor/side
    * decision matches the exact expansion; the band (and the 1e13
    * cutoff, comfortably below 2^52) only routes the ambiguous
    * near-boundary cases to BigDecimal. Do not "tighten" this by
    * raising the cutoff past 2^52 or shrinking the band below ulp
    * resolution — the argument above is what breaks. True ties
    * cannot exist (10⁻⁷ is not dyadic), so HALF_UP here is a
    * labeling, not a behavior difference.
    */
  def scaled6(v: Double): Long = {
    val neg = v < 0
    val a = if (neg) -v else v
    val y = a * 1e6
    val l =
      if (y >= 1e13)
        new JBigDecimal(a).setScale(6, RoundingMode.HALF_UP)
          .movePointRight(6).longValueExact()
      else {
        val fl = Math.floor(y)
        val f = y - fl
        if (f > 0.5 + 1e-7) fl.toLong + 1L
        else if (f < 0.5 - 1e-7) fl.toLong
        else new JBigDecimal(a).setScale(6, RoundingMode.HALF_UP)
          .movePointRight(6).longValueExact()
      }
    if (neg) -l else l
  }

  class VectorDecimalSum extends Aggregator[Seq[Double], Array[Long], Seq[Double]] {
    override def zero: Array[Long] = Array.empty
    private def widen(b: Array[Long], n: Int): Array[Long] =
      if (b.length >= n) b else b ++ Array.fill(n - b.length)(0L)
    override def reduce(b0: Array[Long], a: Seq[Double]): Array[Long] = {
      if (a == null) return b0
      // iterator, NOT while(i < a.length){ a(i) }: the deserializer
      // hands a List, where indexed access is O(n) — the indexed loop
      // is O(n²) per row, which at q124's 2080-term arrays was 40 s
      // of List.length walking for a 1 s aggregate
      val b = widen(b0, a.length)
      val it = a.iterator
      var i = 0
      while (it.hasNext) {
        val v = it.next()
        // NaN/Infinity cast to DECIMAL is null in Spark (and the
        // oracle); SUM ignores null — mirror that
        if (!v.isNaN && !v.isInfinity)
          // addExact: the scaled-long state caps |sum| at ~9.2e12
          // (DECIMAL(19,6) capacity) — overflow throws instead of
          // wrapping; swap back to a BigDecimal buffer if an
          // aggregate ever legitimately exceeds it
          b(i) = Math.addExact(b(i), scaled6(v))
        i += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      val (big, small) = if (x.length >= y.length) (x, y) else (y, x)
      val out = big.clone()
      var i = 0
      while (i < small.length) { out(i) = Math.addExact(out(i), small(i)); i += 1 }
      out
    }
    override def finish(b: Array[Long]): Seq[Double] =
      b.toSeq.map(l => JBigDecimal.valueOf(l, 6).doubleValue)
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** `vecDecimalSum(array<double>)` aggregate column function. */
  val vecDecimalSum: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new VectorDecimalSum, ExpressionEncoder[Seq[Double]]())

  /** Bounded top-`n` selector over (score, id) pairs — the reduction
    * behind codebook-as-RELATION cell assignment
    * ([[graft.queries.Similarity]] above `CodebookLiteralMaxCells`):
    * each row's k broadcast-join candidates collapse through this
    * buffer MAP-SIDE (partial aggregation), so the shuffle carries
    * one n-slot row per input row and per-group state is O(n), never
    * O(k). Keeps the n smallest (score, id) pairs under tuple order
    * — a commutative/associative bounded merge, so the result is
    * independent of task order (deterministic like the literal-path
    * argsort, which uses the same (negScore, c_id) ordering).
    */
  class TopCellsAgg(n: Int)
      extends Aggregator[(Double, Int), Seq[(Double, Int)], Seq[Int]] {
    private def trim(s: Seq[(Double, Int)]): Seq[(Double, Int)] =
      s.sorted.take(n)
    override def zero: Seq[(Double, Int)] = Nil
    override def reduce(b: Seq[(Double, Int)], a: (Double, Int)): Seq[(Double, Int)] =
      trim(b :+ a)
    override def merge(x: Seq[(Double, Int)], y: Seq[(Double, Int)]): Seq[(Double, Int)] =
      trim(x ++ y)
    override def finish(b: Seq[(Double, Int)]): Seq[Int] = b.map(_._2)
    override def bufferEncoder: Encoder[Seq[(Double, Int)]] =
      Encoders.kryo[Seq[(Double, Int)]]
    override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
  }

  /** `topCells(n)(score, id)` aggregate column function: ids of the
    * n smallest scores, nearest-first (pass a NEGATED similarity).
    */
  def topCells(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopCellsAgg(n), ExpressionEncoder[(Double, Int)]())
}
