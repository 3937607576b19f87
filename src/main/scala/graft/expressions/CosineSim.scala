package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two numeric arrays, one fused loop:
  * dot product and both squared norms accumulate together, each as a
  * sequential left fold in double precision — bit-identical to the
  * `aggregate(zip_with(...))` composition it replaces (pinned in
  * SimilaritySpec) and to the oracle's `list_dot_product`, so scored
  * queries keep hash-matching. Returns null on zero norms or
  * mismatched lengths (the HOF formulation's null-padding yields null
  * there too).
  *
  * The HOF version costs three interpreted array traversals plus a
  * materialized product array per pair — this kernel makes exhaustive
  * pair scoring (millions of pairs) and the ANN rescoring paths
  * JIT-bound instead of interpreter-bound.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<float|double>, got ${l.catalogString} " +
          s"and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  @transient private lazy val leftIsFloat = elemType(left) == FloatType
  @transient private lazy val rightIsFloat = elemType(right) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // kernel may return null (zero norm / length mismatch): route
    // through nullSafeCodeGen with an explicit null re-check. The
    // local MUST be freshName'd — with non-nullable children
    // nullSafeExec emits no enclosing block, so two CosineSim calls in
    // one generated method would redeclare a fixed name and fail
    // janino compilation (silent fallback to interpreted eval).
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val result = ctx.freshName("cosineResult")
      s"""
         |Object $result = graft.expressions.CosineSim.compute(
         |  $a, $leftIsFloat, $b, $rightIsFloat);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $result).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def compute(a: ArrayData, aFloat: Boolean,
              b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < n) {
      // a null element poisons the fold in the HOF formulation; keep
      // that contract rather than silently reading 0
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      sa += x * x
      sb += y * y
      i += 1
    }
    val d = math.sqrt(sa) * math.sqrt(sb)
    if (d == 0.0) null else java.lang.Double.valueOf(dot / d)
  }
}
