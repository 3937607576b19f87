package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunker (`QualityOps` q136 and the
  * [[graft.queries.ChunkIndex]] build): Rabin-style rolling hash over
  * a 3-word window of md5-derived word values; position `i ≥ 3`
  * starts a new chunk when `(v[i-2]·961 + v[i-1]·31 + v[i]) % 16 == 0`
  * (1-based), position 1 always starts one. Returns
  * `array<struct<n_words:int, chunk_str:string>>` in document order —
  * the word counts feed the q136 census, the strings feed the chunk
  * relation.
  *
  * Why a custom `Expression`: the Column formulation paid an
  * interpreted md5+conv+substring lambda PER TOKEN for the word
  * values, then a second interpreted slice+array_join PER CHUNK for
  * the strings. This kernel does one MD5 per token and one pass of
  * boundary checks inside whole-stage codegen. Word values are
  * byte-identical to the Column form (md5 hex, first 6 nibbles as an
  * integer, mod 1021 — q75's portable md5→int convention), so chunk
  * boundaries and strings are exactly those of the HOF formulation
  * (spec-pinned in QualityOpsSpec against the plain-Scala reference
  * chunker, and the DuckDB oracle replays the same arithmetic).
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("chunk_str", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CdcChunks.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  private val Space = UTF8String.fromString(" ")
  private val WhitespaceRx = UTF8String.fromString("\\s+")

  /** One MessageDigest per thread: `getInstance("MD5")` pays a JCA
    * provider lookup plus allocation, and [[wordVal]] runs once per
    * word of every document — exactly the constant factor this
    * kernel exists to remove. `digest()` auto-resets, so one
    * instance serves every call on its thread.
    */
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** md5-derived word value in [0, 1021) — identical to
    * `pmod(conv(substring(md5(w), 1, 6), 16, 10), 1021)`: the first
    * six hex nibbles of the digest are exactly its first three bytes
    * read big-endian.
    */
  private def wordVal(md: java.security.MessageDigest, w: UTF8String): Long = {
    val digest = md.digest(w.getBytes)
    var v = 0L
    var i = 0
    while (i < 3) {
      v = v * 256 + (digest(i) & 0xff)
      i += 1
    }
    v % 1021L
  }

  def compute(text: UTF8String): ArrayData = {
    val toks = text.toLowerCase.trim.split(WhitespaceRx, -1)
    val n = toks.length
    val vals = new Array[Long](n)
    val md = md5.get()
    var i = 0
    while (i < n) { vals(i) = wordVal(md, toks(i)); i += 1 }
    // 1-based starts: 1, plus every i >= 3 with the window hash ≡ 0
    val starts = new scala.collection.mutable.ArrayBuffer[Int](8)
    starts += 1
    i = 3
    while (i <= n) {
      if ((vals(i - 3) * 961L + vals(i - 2) * 31L + vals(i - 1)) % 16 == 0)
        starts += i
      i += 1
    }
    val out = new Array[Any](starts.length)
    var j = 0
    while (j < starts.length) {
      val from = starts(j) - 1
      val until = if (j + 1 < starts.length) starts(j + 1) - 1 else n
      val words = until - from
      val parts = new Array[UTF8String](words)
      var k = 0
      while (k < words) { parts(k) = toks(from + k); k += 1 }
      out(j) = new GenericInternalRow(Array[Any](
        words, UTF8String.concatWs(Space, parts: _*)))
      j += 1
    }
    new GenericArrayData(out)
  }
}
