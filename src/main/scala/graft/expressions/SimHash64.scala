package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over a token array: per token, xxhash64
  * (seed 42, Spark's own hash — bit-compatible with the
  * `xxhash64()` builtin); per bit position, ±1 vote by the hash bit;
  * fingerprint bit = sign of the vote sum. Returned as two 32-bit
  * halves `struct<hi:bigint, lo:bigint>` so XOR + bit_count gives
  * Hamming distance without 64-bit sign issues.
  *
  * Why a custom `Expression` and not higher-order functions: the HOF
  * formulation (`aggregate` over tokens × `transform` over 64
  * accumulators) runs interpreted — ~64 boxed lambda evaluations and
  * a fresh 64-element array PER TOKEN. This expression does the same
  * arithmetic in one tight JIT-compiled loop and participates in
  * whole-stage codegen (`doGenCode` emits a call to the static
  * kernel), measured ~10× faster at sf0.1. Semantics are pinned
  * against the HOF formulation in SimHashSpec.
  */
case class SimHash64(child: Expression, seed: Long = 42L)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "simhash64 requires array<string> (tokens) or array<bigint> " +
        s"(pre-hashed tokens), got ${other.catalogString}")
  }

  /** array<bigint> input: elements are the 64-bit token hashes
    * themselves (any hash family — e.g. the md5-derived portable
    * hashes the oracle-replayable queries use), voted bit-for-bit
    * with no further hashing.
    */
  private def fromHashes: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    if (fromHashes)
      SimHash64.computeFromHashes(input.asInstanceOf[ArrayData])
    else SimHash64.compute(input.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (fromHashes)
      defineCodeGen(ctx, ev,
        c => s"graft.expressions.SimHash64.computeFromHashes($c)")
    else
      defineCodeGen(ctx, ev,
        c => s"graft.expressions.SimHash64.compute($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Tight-loop kernel shared by interpreted eval and codegen. */
  def compute(tokens: ArrayData, seed: Long): InternalRow = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(t), seed)
        vote(votes, h)
      }
      t += 1
    }
    fold(votes)
  }

  /** Kernel over pre-hashed tokens (64-bit longs): identical voting
    * and fold, hash supplied by the caller.
    */
  def computeFromHashes(hashes: ArrayData): InternalRow = {
    val n = hashes.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) vote(votes, hashes.getLong(t))
      t += 1
    }
    fold(votes)
  }

  private def vote(votes: Array[Int], h: Long): Unit = {
    var i = 0
    while (i < 64) {
      votes(i) += ((((h >>> i) & 1L) << 1) - 1L).toInt
      i += 1
    }
  }

  private def fold(votes: Array[Int]): InternalRow = {
    var hi = 0L
    var i = 0
    while (i < 32) { hi = hi * 2 + (if (votes(i) > 0) 1L else 0L); i += 1 }
    var lo = 0L
    while (i < 64) { lo = lo * 2 + (if (votes(i) > 0) 1L else 0L); i += 1 }
    new GenericInternalRow(Array[Any](hi, lo))
  }
}
