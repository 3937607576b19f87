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

/** Bloom-filter runtime-filter expressions. Spark ships
  * `BloomFilterAggregate` / `BloomFilterMightContain` for its OWN
  * `InjectRuntimeFilter` rule but does not register them as SQL
  * functions, so an explicit bloom-prefilter plan (q38) builds them
  * directly — over `xxhash64` of the key, exactly as the injected
  * runtime filter does.
  */
object BloomBridge {
  import org.apache.spark.sql.catalyst.expressions.XxHash64
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  /** Aggregate column: a serialized bloom filter over the key. */
  def bloomAgg(key: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(new XxHash64(Seq(ColumnBridge.expression(key))),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Probe predicate: false → key definitely absent (no false
    * negatives); true → verify exactly.
    */
  def mightContain(bloom: Column, key: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(bloom),
        new XxHash64(Seq(ColumnBridge.expression(key)))))
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
