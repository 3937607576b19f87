package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sum (scan) over a totally-ordered key.
  *
  * The naive formulation — `sum(v) OVER (ORDER BY k)` with no
  * PARTITION BY — funnels the entire table through ONE task (Spark
  * plans an all-to-one Exchange into a single-partition window): the
  * classic scan bottleneck, unusable at 100 TB. This operator is the
  * standard two-level scan instead:
  *
  *   1. rows are grouped into deterministic ordered blocks
  *      (`block = floor(key / blockSize)` — no range-sampled
  *      repartition, so block membership is identical on every run
  *      and under task retry);
  *   2. a window PARTITIONED by block computes each row's local
  *      exclusive prefix — fully parallel across blocks;
  *   3. block totals (one row per block — corpus/blockSize rows, tiny
  *      by construction) get their own exclusive cumsum in a
  *      single-partition window over that tiny frame;
  *   4. the per-block base offsets broadcast-join back onto the rows:
  *      global prefix = block base + local prefix.
  *
  * The only single-partition work is step 3 over ~n/blockSize rows
  * (1e5 blocks at 1e11 rows with blockSize=1e6), and the only
  * shuffles are the per-block window and the tiny block aggregate.
  *
  * Requires: `key` non-null, unique per row (ties would make "prefix"
  * ill-defined), and numeric/castable to double for `floor(key /
  * blockSize)` blocking — dense integer ids are the intended use.
  */
object PrefixSum {

  /** Returns `df` with column `out` = sum of `value` over all rows
    * whose `key` is strictly lower (exclusive prefix; first row gets
    * 0). Output type is the window-sum type of `value` (bigint for
    * integral inputs).
    */
  def exclusive(
      df: DataFrame,
      key: Column,
      value: Column,
      blockSize: Long,
      out: String): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val block = "__ps_block"
    val local = "__ps_local"
    val base = "__ps_base"
    val tot = "__ps_tot"

    val blocked = df.withColumn(block, floor(key / blockSize).cast("long"))

    // Step 2: local exclusive prefix, parallel per block.
    val wLocal = Window.partitionBy(col(block)).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = blocked.withColumn(
      local, coalesce(sum(value).over(wLocal), lit(0)))

    // Step 3: exclusive cumsum of block totals. The frame here is one
    // row per block — the single-partition window is over a tiny
    // aggregate, not the data.
    val totals = blocked.groupBy(col(block)).agg(sum(value).as(tot))
    val wBlocks = Window.orderBy(col(block))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn(base, coalesce(sum(col(tot)).over(wBlocks), lit(0)))
      .select(col(block), col(base))

    // Step 4: base offsets are |blocks| rows — always broadcastable.
    withLocal.join(broadcast(offsets), block)
      .withColumn(out, (col(local) + col(base)).cast("long"))
      .drop(block, local, base)
  }
}
