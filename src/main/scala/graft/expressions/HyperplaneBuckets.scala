package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All L multi-table hyperplane-LSH buckets of a vector in ONE pass:
  * element t of the result is the nBits-bit sign bucket of table t
  * (seed = t). Bit-identical to evaluating the Column-level
  * `Vectors.hyperplaneBucket(v, nBits, seed = lit(t))` L times
  * (pinned in SimilaritySpec): plane component (i, j, t) chains
  * Spark's xxhash64 fold over the three longs exactly like the
  * `xxhash64(i, j, seed)` builtin, scaled to [-1, 1).
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
  private val Mod = 0x80000000L
  private val Scale = 0x40000000L.toDouble

  /** Plane component (bit i, index j, table seed): the same xxhash64
    * left-fold Spark's multi-argument `xxhash64(i, j, seed)` computes
    * over three longs, reduced mod 2^31 and scaled to [-1, 1).
    */
  private def component(i: Long, j: Long, seed: Long): Double = {
    var h = XXH64.hashLong(i, 42L)
    h = XXH64.hashLong(j, h)
    h = XXH64.hashLong(seed, h)
    java.lang.Math.floorMod(h, Mod).toDouble / Scale - 1.0
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
