package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The centered upper-triangle outer product of one vector: for a
  * d-dim embedding x and mean vector μ, the d(d+1)/2 doubles
  * (x_i−μ_i)·(x_j−μ_j) for i ≤ j, enumerated row-major — the per-row
  * map step of the distributed covariance aggregate
  * ([[graft.queries.Similarity.covarianceMatrix]], q124).
  *
  * One fused compiled loop replaces the nested-HOF formulation
  * (`flatten(transform(transform(...)))`), which evaluates ~2·d²
  * interpreted `element_at` lambdas per row (measured 27 s for the
  * sf0.1 covariance; this kernel takes it to ~1 s). A wide built-in
  * aggregate (d(d+1)/2 separate `sum` slots) is no better: above
  * `spark.sql.codegen.maxFields` whole-stage codegen bails and the
  * 2080-expression plan pays ~13 s of fixed optimizer/fallback cost
  * before the first row. Returns null on length mismatch — the
  * decimal-sum aggregator ignores nulls, mirroring `SUM` semantics.
  *
  * Scale note: output length is d(d+1)/2 per row BEFORE aggregation,
  * but the consumer folds it map-side (partial aggregation), so the
  * d² never crosses a shuffle.
  */
case class UpperTriProducts(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"upper_tri_products requires array<float|double>, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def prettyName: String = "upper_tri_products"

  @transient private lazy val leftIsFloat = elemType(left) == FloatType
  @transient private lazy val rightIsFloat = elemType(right) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    UpperTriProducts.compute(a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val result = ctx.freshName("triResult")
      s"""
         |Object $result = graft.expressions.UpperTriProducts.compute(
         |  $a, $leftIsFloat, $b, $rightIsFloat);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $result;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UpperTriProducts =
    copy(left = newLeft, right = newRight)
}

object UpperTriProducts {
  /** Null on length mismatch; otherwise the i ≤ j products of the
    * centered vector, row-major.
    */
  def compute(x: ArrayData, xF: Boolean, mu: ArrayData, mF: Boolean): Any = {
    val d = x.numElements()
    if (mu.numElements() != d) return null
    val xc = new Array[Double](d)
    var i = 0
    while (i < d) {
      val xv = if (xF) x.getFloat(i).toDouble else x.getDouble(i)
      val mv = if (mF) mu.getFloat(i).toDouble else mu.getDouble(i)
      xc(i) = xv - mv
      i += 1
    }
    val out = new Array[Double](d * (d + 1) / 2)
    var k = 0
    i = 0
    while (i < d) {
      val xi = xc(i)
      var j = i
      while (j < d) {
        out(k) = xi * xc(j)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
