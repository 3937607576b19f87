package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 hides the classic
  * `ExpressionUtils` behind `private[sql]`, so extension libraries
  * shipping custom Catalyst expressions expose it through a shim in
  * the `org.apache.spark.sql` namespace — the standard pattern for
  * Spark-native extensions (no reflection, no copied internals).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Registers graft's native expressions as SQL functions on a LIVE
  * session (the build-time path is `spark.sql.extensions=
  * graft.GraftExtensions`). Lives in the sql namespace because
  * `sessionState` is `private[sql]` in Spark 4.
  */
object FunctionRegistration {
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.expressions.GraftFunctions.all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
