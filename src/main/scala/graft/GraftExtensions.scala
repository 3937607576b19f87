package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.expressions.GraftFunctions

/** Session-extension injector: makes every graft native expression a
  * SQL function at session build time. Configure with
  * `--conf spark.sql.extensions=graft.GraftExtensions`; for an
  * already-running session use
  * `org.apache.spark.sql.graftbridge.FunctionRegistration.registerAll`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(extensions.injectFunction)
    extensions.injectOptimizerRule(new graft.plans.JaccardSizePrefilter(_))
  }
}
