package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.expressions.JaccardLong

/** Optimizer rule: a threshold filter on set-Jaccard implies a cheap
  * size bound — `|A∩B| ≤ min(|A|,|B|)` and `|A∪B| ≥ max(|A|,|B|)`, so
  * `jaccard(a,b) ≥ t` requires `min(|a|,|b|) ≥ t·max(|a|,|b|)`. The
  * rule prepends that O(1) predicate (array sizes are header reads)
  * as a short-circuiting conjunct ahead of the O(n) hash-probe
  * kernel, so wildly size-mismatched candidate pairs never pay for an
  * intersection. Purely an optimization: the bound is implied by the
  * original predicate, so output is provably unchanged (asserted in
  * PlanRulesSpec).
  *
  * Registered through [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) — any query using `jaccard_long`, SQL or
  * Column API, gets the prefilter automatically.
  */
class JaccardSizePrefilter(session: SparkSession) extends Rule[LogicalPlan] {

  private def boundFor(j: JaccardLong, t: Double): Expression = {
    val sa = Cast(Size(j.left, legacySizeOfNull = false), DoubleType)
    val sb = Cast(Size(j.right, legacySizeOfNull = false), DoubleType)
    GreaterThanOrEqual(Least(Seq(sa, sb)), Multiply(Literal(t), Greatest(Seq(sa, sb))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case node =>
      // the predicate may live in a Filter, a pushed-down Join
      // condition, or even a projected boolean — the rewrite
      // (bound AND cmp) equals cmp wherever it appears, since the
      // bound is implied. The canonicalized-presence check makes the
      // rule a no-op on the optimizer's fixed-point reruns.
      lazy val present: Set[Expression] =
        node.expressions.flatMap(_.collect { case e => e.canonicalized }).toSet
      node.transformExpressionsUp {
        case cmp @ GreaterThanOrEqual(j: JaccardLong, Literal(t: Double, DoubleType))
            if t > 0.0 && nullFreeArrays(j) &&
              !present.contains(boundFor(j, t).canonicalized) =>
          And(boundFor(j, t), cmp)
      }
  }

  /** The bound is SOUND only when array sizes equal set sizes:
    * jaccard_long ignores null elements but Size() counts them, so a
    * null-padded array could fail the size bound while its effective
    * set still clears the threshold. Only rewrite when the schema
    * proves elements non-null (e.g. ShingleHashes output).
    */
  private def nullFreeArrays(j: JaccardLong): Boolean =
    Seq(j.left, j.right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(_, containsNull) => !containsNull
      case _ => false
    })
}
