package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row
  * with `rightTime <= leftTime` within the same key — the canonical
  * time-series lookup (latest statement as of an event, last quote as
  * of a trade). Spark has no native ASOF operator; a naive rewrite is
  * a range join (O(n·m) per key) or a per-left-row subquery.
  *
  * This is the union–sort–backfill formulation, which Catalyst plans
  * as ONE shuffle by key plus a per-partition sort — the 100 TB-safe
  * shape: tag both sides, union them (columns padded with nulls),
  * and per key in time order carry the last seen right payload
  * forward (`last(ignoreNulls)` over an unbounded-preceding running
  * frame). Left rows then read their backfilled right value
  * directly. Ties (equal timestamps) resolve right-before-left, i.e.
  * a right row AT the left timestamp matches — standard ASOF
  * (DuckDB/kdb) semantics, enforced by sorting the right tag first.
  *
  * At scale: shuffle volume = |L| + |R| rows (vs |L|·|R| worst-case
  * for the range-join rewrite), no broadcast requirement on either
  * side, skew bounded by key cardinality like any windowed op.
  *
  * Null keys: window partitioning groups null keys TOGETHER (null
  * left rows see null right rows), unlike SQL join equality where
  * NULL never matches. Filter null keys out beforehand if SQL-join
  * semantics are required.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side (its latest row as-of is attached)
    * @param keys       equi-join key column names (present both sides)
    * @param leftTime   event-time column name on `left`
    * @param rightTime  event-time column name on `right`
    * @param payload    right columns to carry (default: all non-key,
    *                   non-time columns)
    * @return `left.*` plus the as-of right payload columns (null when
    *         no right row precedes the left row)
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTime: String, rightTime: String,
            payload: Seq[String] = Seq.empty): DataFrame = {
    require(!(left.columns ++ right.columns).exists(_.startsWith("__")),
      "AsOfJoin reserves the __ column-name prefix for internal tagging")
    val payloadCols =
      if (payload.nonEmpty) payload
      else right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTime)

    // The right payload travels as ONE struct, not per-column: the
    // struct is non-null exactly when a right row exists, so
    // last(ignoreNulls) cannot (a) skip a genuine right row whose
    // payload VALUE is null (DuckDB ASOF attaches it, with nulls), or
    // (b) stitch fields of different right rows into a row that never
    // existed when some payload columns are null and others are not.
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c).copy(name = c)))
    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(keys.map(col) ++ Seq(col("__t"), col("__side"),
        lit(null).cast(payloadStructType).as("__r")) ++
        left.columns.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
    val taggedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(keys.map(col) ++ Seq(col("__t"), col("__side"),
        struct(payloadCols.map(col): _*).as("__r")) ++
        left.columns.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)

    // one shuffle on keys; right (__side=0) sorts before left at equal
    // timestamps so an exact-time right row is visible to that left row
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val backfilled = taggedLeft.unionByName(taggedRight)
      .select((keys.map(col) :+ col("__side") :+
        last(col("__r"), ignoreNulls = true).over(w).as("__asof")) ++
        left.columns.filterNot(keys.contains).map(c => col(s"__l_$c")): _*)

    backfilled.filter(col("__side") === 1)
      .select(keys.map(col) ++
        left.columns.filterNot(keys.contains)
          .map(c => col(s"__l_$c").as(c)) ++
        payloadCols.map(c => col("__asof").getField(c).as(c)): _*)
  }
}
