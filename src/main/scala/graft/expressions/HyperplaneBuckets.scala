package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All L multi-table hyperplane-LSH buckets of a vector in ONE pass:
  * element t of the result is the nBits-bit sign bucket of table t
  * (seed = t). Bit-identical to evaluating the Column-level
  * `Vectors.hyperplaneBucket(v, nBits, seed = lit(t))` L times
  * (pinned in SimilaritySpec): plane component (i, j, t) is the
  * first 32 bits of `md5("i:j:t")` scaled to [-1, 1) — a PORTABLE
  * derivation (standard MD5 over a decimal-rendered key), so any
  * engine with an md5 builtin replays the exact planes and the
  * q63/q69 oracles can value-check the full LSH search instead of
  * settling for a rows-only gate. The md5 runs once per (bit, index,
  * table) when the memoized plane matrix for a shape is first built
  * — never per row — so portability costs the hot path nothing.
  *
  * The Column formulation explodes the table index first and then
  * re-traverses the vector per table with interpreted lambdas
  * (L × dim boxed iterations, fresh accumulator arrays per element);
  * this kernel holds all L×nBits partial sums in one flat array and
  * is JIT-compiled inside whole-stage codegen.
  */
case class HyperplaneBuckets(child: Expression, nBits: Int, tables: Int)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 62, s"nBits out of range: $nBits")
  require(tables >= 1, s"tables must be >= 1, got $tables")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hyperplane_buckets"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], isFloat, nBits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.HyperplaneBuckets.compute($c, $isFloat, $nBits, $tables)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  private val Half = 0x80000000L.toDouble // 2^31

  /** Plane component (bit i, index j, table seed): the first 4 bytes
    * of `md5("i:j:seed")` as an unsigned 32-bit integer, scaled to
    * [-1, 1) by h/2^31 − 1. Both pieces are engine-portable — MD5 is
    * MD5 everywhere, and a 32-bit-int-over-power-of-two quotient is
    * exact in double — so DuckDB's
    * `('0x' || substr(md5(i||':'||j||':'||t), 1, 8))::BIGINT /
    * 2147483648.0 - 1.0` produces the identical double. MD5
    * avalanches, so distinct seeds give properly decorrelated
    * planes (the property an affine mix lacks — see
    * Vectors.planeComponent).
    */
  private def component(i: Long, j: Long, seed: Long): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j:$seed".getBytes("UTF-8"))
    val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    h.toDouble / Half - 1.0
  }

  /** Plane matrices are data-independent — memoize per (nBits,
    * tables, dim) so rows pay multiplies, not hash chains. Values are
    * deterministic, so concurrent recomputation is benign. Bounded:
    * ragged corpora could otherwise retain one matrix per distinct
    * vector length for the executor's lifetime, so the cache resets
    * past MaxCachedShapes (recompute is cheap; correctness unaffected).
    */
  private val MaxCachedShapes = 64
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def planes(nBits: Int, tables: Int, dim: Int): Array[Double] = {
    if (planeCache.size > MaxCachedShapes) planeCache.clear()
    planeCache.computeIfAbsent((nBits, tables, dim), { key =>
      val (b, tb, d) = key
      val m = new Array[Double](tb * b * d)
      var t = 0
      while (t < tb) {
        var i = 0
        while (i < b) {
          var j = 0
          while (j < d) {
            m((t * b + i) * d + j) = component(i, j, t)
            j += 1
          }
          i += 1
        }
        t += 1
      }
      m
    })
  }

  def compute(v: ArrayData, isFloat: Boolean, nBits: Int, tables: Int): ArrayData = {
    val dim = v.numElements()
    // empty vector: all projections are vacuously 0; return bucket 0
    // per table (matching the Column formulation's null-collapsed
    // sign bits) instead of letting `0.0 >= 0` set every bit
    if (dim == 0) return new GenericArrayData(new Array[Long](tables))
    val m = planes(nBits, tables, dim)
    val sums = new Array[Double](tables * nBits)
    var j = 0
    while (j < dim) {
      val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
      var t = 0
      while (t < tables) {
        var i = 0
        while (i < nBits) {
          sums(t * nBits + i) += x * m((t * nBits + i) * dim + j)
          i += 1
        }
        t += 1
      }
      j += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var i = 0
      while (i < nBits) {
        b = b * 2 + (if (sums(t * nBits + i) >= 0) 1L else 0L)
        i += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}
