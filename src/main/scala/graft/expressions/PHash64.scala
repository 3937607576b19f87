package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native q158 fake-decode perceptual hash over the RAW token array
  * (array<string> — the whitespace split): each token is md5-hashed
  * (h = the first 4 digest bytes as an unsigned 32-bit value, exactly
  * `conv(substr(md5(w),1,8),16,10)`), contributes `(h · (i+1)) mod
  * 1009` to each of the 72 grid cells (the dense "every pixel gets
  * light from every token" raster), then the 64 dHash gradient bits
  * ([[graft.functions.Media.dHash64FromGrid]]'s exact layout) fold to
  * `struct<hi, lo>` 32-bit halves.
  *
  * Why a custom `Expression`, and why the md5 lives INSIDE it: the
  * HOF formulation (`transform` md5 per token, then `transform` over
  * 72 cells × `aggregate` over tokens) runs interpreted — ~72 boxed
  * lambda evaluations per token were the whole of q158's 22.8 s at
  * sf0.1/local[32]. Round 12 fused the cell fold but left the
  * per-token md5 as a `transform` HOF child; any higher-order
  * function is `CodegenFallback`, which drops the ENTIRE projection
  * out of whole-stage codegen (round-13 finding — the "fused" kernel
  * ran as an interpreted `ProjectExec`, md5 via boxed
  * hex-string→conv→cast round trips). With the digest folded in here
  * the child is a plain codegen'd `split`, the projection fuses with
  * the scan and the zero-token filter into one codegen stage
  * (PlanShapeSpec pins the `*(n)` span), and each token costs one
  * digest + one integer loop — no hex strings, no boxing. Semantics
  * are pinned against the HOF formulation
  * ([[graft.queries.MultimodalOps.phashFingerprintsHof]]) in
  * PHashSpec, and the DuckDB oracles replay the same arithmetic.
  */
case class PHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phash64 requires array<string> (tokens), got ${other.catalogString}")
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

  /** One digest instance per executor thread — MD5 lookup via
    * `MessageDigest.getInstance` is a provider search per call and
    * would dominate the per-token cost.
    */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Tight-loop kernel shared by interpreted eval and codegen. */
  def compute(tokens: ArrayData): InternalRow = {
    val md = digest.get()
    val n = tokens.numElements()
    val cells = new Array[Long](72)
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        md.reset()
        val d = md.digest(tokens.getUTF8String(t).getBytes)
        // first 8 hex chars of md5 == first 4 digest bytes, unsigned
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
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
