package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document token statistics for the quality-signal stage
  * (`QualityOps.signalsRelationOf`): one pass over the token array
  * producing `struct<n_tokens:int, top_uni_c:int, n_bigrams:int,
  * top_bi_c:int, dup_bi_pos:int>` — the exact integers the
  * Gopher-style repetition rules consume.
  *
  * Why a custom `Expression` and not higher-order functions: the HOF
  * formulation (`transform(array_distinct(tk), t => size(filter(tk,
  * _ === t)))` for the mode count, again over the bigram array) runs
  * interpreted at O(len · distinct) boxed lambda evaluations per
  * document — it was the single most expensive fold in the engine
  * before the stage was shared. This kernel builds two hash maps in
  * one tight JIT loop, O(len), inside whole-stage codegen. Semantics
  * are pinned bit-for-bit against the HOF formulation in
  * QualityOpsSpec, including the sub-2-token null contract:
  * `top_bi_c` / `dup_bi_pos` are NULL when no bigram exists (the
  * guard that keeps downstream ratios off the ANSI 0/0 path).
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("top_uni_c", IntegerType, nullable = true),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("top_bi_c", IntegerType, nullable = true),
    StructField("dup_bi_pos", IntegerType, nullable = true)))

  override def prettyName: String = "token_stats"

  override def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {

  private val Space = UTF8String.fromString(" ")

  /** Tight-loop kernel shared by interpreted eval and codegen. Null
    * ELEMENTS are not expected (the tokenizer is a split — it never
    * yields null tokens) and are skipped from the count maps.
    */
  def compute(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val uni = new java.util.HashMap[UTF8String, Int]()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        uni.merge(t, 1, (a, b) => a + b)
      }
      i += 1
    }
    var topUni = 0
    val uit = uni.values().iterator()
    while (uit.hasNext) { val c = uit.next(); if (c > topUni) topUni = c }

    val nBigrams = if (n >= 2) n - 1 else 0
    var topBi: Any = null
    var dupPos: Any = null
    if (n >= 2) {
      val bi = new java.util.HashMap[UTF8String, Int]()
      i = 0
      while (i < n - 1) {
        if (!tokens.isNullAt(i) && !tokens.isNullAt(i + 1)) {
          val g = UTF8String.concat(tokens.getUTF8String(i), Space,
            tokens.getUTF8String(i + 1))
          bi.merge(g, 1, (a, b) => a + b)
        }
        i += 1
      }
      var tb = 0
      var dp = 0
      val bit = bi.values().iterator()
      while (bit.hasNext) {
        val c = bit.next()
        if (c > tb) tb = c
        if (c > 1) dp += c
      }
      topBi = tb
      dupPos = dp
    }
    new GenericInternalRow(Array[Any](
      n, if (topUni > 0) topUni else null, nBigrams, topBi, dupPos))
  }
}
