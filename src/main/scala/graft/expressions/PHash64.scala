package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native q158 fake-decode perceptual hash over PRE-HASHED tokens
  * (array<bigint> — the md5-derived portable values): every token
  * contributes `(h · (i+1)) mod 1009` to each of the 72 grid cells
  * (the dense "every pixel gets light from every token" raster), then
  * the 64 dHash gradient bits ([[graft.functions.Media
  * .dHash64FromGrid]]'s exact layout) fold to `struct<hi, lo>` 32-bit
  * halves.
  *
  * Why a custom `Expression`: the HOF formulation (`transform` over
  * 72 cells × `aggregate` over tokens) runs interpreted — ~72 boxed
  * lambda evaluations and modular arithmetic PER TOKEN; it was the
  * whole of q158's 22.8 s at sf0.1/local[32]. This kernel does the
  * identical arithmetic in one tight JIT loop inside whole-stage
  * codegen. Semantics are pinned against the HOF formulation
  * ([[graft.queries.MultimodalOps.phashFingerprintsHof]]) in
  * PHashSpec, and the DuckDB oracles replay the same arithmetic.
  */
case class PHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phash64 requires array<bigint> (pre-hashed tokens), got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))

  override def prettyName: String = "phash64"

  override def nullSafeEval(input: Any): Any =
    PHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}

object PHash64 {

  /** Tight-loop kernel shared by interpreted eval and codegen. */
  def compute(hashes: ArrayData): InternalRow = {
    val n = hashes.numElements()
    val cells = new Array[Long](72)
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) {
        val h = hashes.getLong(t)
        var i = 0
        while (i < 72) {
          cells(i) += (h * (i + 1)) % 1009L
          i += 1
        }
      }
      t += 1
    }
    // 64 gradient bits, MSB-first per half: comparison k (row k/8,
    // col k%8) against its right neighbor in the 9-wide row-major grid
    var hi = 0L
    var k = 0
    while (k < 32) {
      val idx = (k >>> 3) * 9 + (k & 7)
      hi = (hi << 1) | (if (cells(idx) > cells(idx + 1)) 1L else 0L)
      k += 1
    }
    var lo = 0L
    while (k < 64) {
      val idx = ((k >>> 3) + 0) * 9 + (k & 7)
      lo = (lo << 1) | (if (cells(idx) > cells(idx + 1)) 1L else 0L)
      k += 1
    }
    new GenericInternalRow(Array[Any](hi, lo))
  }
}
