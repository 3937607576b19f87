package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Executor-side count-min-sketch membership test: true iff the
  * sketch's estimate for the child long key is ≥ `minCount`.
  *
  * This is the per-ROW probe q72's driver-side pattern can't express:
  * there the bounded candidate list is collected and probed on the
  * driver; here the sketch rides the plan (deserialized once per
  * expression instance via the transient lazy, referenced — not
  * re-parsed — from generated code) so a corpus-scale FILTER can
  * consult it. Because count-min only ever OVER-counts, `estimate ≥
  * actual` always holds — a filter at `minCount = 2` passes every
  * truly-duplicated key (zero false negatives) and an exact
  * aggregation downstream removes the false positives: the sketch
  * prunes the shuffle, never the answer. At cluster scale the
  * ~`width·depth·8` byte sketch serializes with the plan's reference
  * array once per executor, the same transport as a broadcast of
  * model state.
  */
case class CmsAtLeast(child: Expression, sketchBytes: Array[Byte],
                      minCount: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_at_least requires bigint input, got ${other.catalogString}")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "cms_at_least"

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

  override def nullSafeEval(input: Any): Any =
    cms.estimateCount(input.asInstanceOf[java.lang.Long]) >= minCount

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cmsRef = ctx.addReferenceObj("cms", cms,
      classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, c =>
      s"$cmsRef.estimateCount((Object) java.lang.Long.valueOf($c)) >= ${minCount}L")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsAtLeast =
    copy(child = newChild)
}
