package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature over a shingle array: per shingle,
  * `h = xxhash64(s) mod P` (Spark's own string hash, seed 42 —
  * bit-compatible with the `xxhash64()` builtin), then the running
  * minimum of `(a_i*h + b_i) mod P` per permutation i < k. Empty
  * inputs yield the sentinel P ("infinity") so they never collide.
  *
  * Same rationale as [[SimHash64]]: the higher-order-function
  * formulation pays ~k interpreted lambda evaluations and a fresh
  * k-array PER SHINGLE; this kernel is one JIT loop and stays inside
  * whole-stage codegen. Permutation constants are derived by the same
  * fixed-seed LCG as always (signatures are stable across runs and
  * releases) and shipped into generated code as reference objects.
  * Bit-exactness vs the HOF formulation is pinned in MinHashSpec.
  */
case class MinHash(child: Expression, k: Int = 48, seed: Long = 42L)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "minhash requires array<string> (shingles) or array<bigint> " +
        s"(pre-hashed shingles), got ${other.catalogString}")
  }

  private def fromHashes: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash"

  @transient private lazy val aConsts = MinHash.lcg(seed, k)
  @transient private lazy val bConsts = MinHash.lcg(seed + 1, k)

  override def nullSafeEval(input: Any): Any =
    if (fromHashes)
      MinHash.computeFromHashes(input.asInstanceOf[ArrayData], aConsts, bConsts)
    else MinHash.compute(input.asInstanceOf[ArrayData], aConsts, bConsts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aConsts)
    val bRef = ctx.addReferenceObj("minhashB", bConsts)
    val kernel = if (fromHashes) "computeFromHashes" else "compute"
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.MinHash.$kernel($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash =
    copy(child = newChild)
}

object MinHash {

  /** Mersenne prime 2^31 − 1: the permutation modulus. 31-bit domain
    * keeps `a*h + b` far below Long overflow (max ~2^62).
    */
  val P: Long = 2147483647L

  /** Deterministic affine-permutation constants: fixed-seed LCG in
    * [1, P−1] — NOT runtime randomness; signatures must be stable
    * across runs and engines.
    */
  def lcg(seed: Long, n: Int): Array[Long] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % (P - 1)) + 1
    }
  }

  /** Kernel over pre-hashed shingles (raw xxhash64 longs, e.g. from
    * [[ShingleHashes]]): identical signatures to [[compute]] because
    * the string path hashes with the same function before folding.
    */
  def computeFromHashes(hashes: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val mins = Array.fill(k)(P)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) { // null shingles contribute nothing
        val h = java.lang.Math.floorMod(hashes.getLong(t), P)
        var i = 0
        while (i < k) {
          val v = java.lang.Math.floorMod(a(i) * h + b(i), P)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  /** Tight-loop kernel shared by interpreted eval and codegen. */
  def compute(shingles: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val mins = Array.fill(k)(P)
    val n = shingles.numElements()
    var t = 0
    while (t < n) {
      if (!shingles.isNullAt(t)) {
        val h = java.lang.Math.floorMod(
          XXH64.hashUTF8String(shingles.getUTF8String(t), 42L), P)
        var i = 0
        while (i < k) {
          val v = java.lang.Math.floorMod(a(i) * h + b(i), P)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins)
  }
}
