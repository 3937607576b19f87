package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * The reference archives its tables as flat CSV with no layout
  * control (`etl_supabase.py:139-141`); at 100 TB the dominant cost
  * of every selective scan is how many files/row-groups the filter
  * can SKIP, and min/max skipping only works when each file covers a
  * small rectangle of the filtered key space. Sorting on one column
  * clusters that column perfectly and scatters every other; the
  * Morton curve interleaves the bits of two (or more) bucketed keys
  * so a range predicate on EITHER dimension prunes ~sqrt-style
  * instead of not at all — the layout trick Delta/Iceberg expose as
  * OPTIMIZE ZORDER, built here from plain `shiftleft`/`&` columns so
  * it stays inside whole-stage codegen.
  *
  * Determinism: pure bit arithmetic on bucketed non-negative longs —
  * bit-identical in Spark and DuckDB, so the key itself is
  * oracle-verifiable (q134).
  */
object ZOrder {

  /** Morton key of two `bits`-bit bucketed dimensions: bit i of `x`
    * lands at position 2i, bit i of `y` at 2i+1. Inputs must already
    * be bucketed into [0, 2^bits) — callers bucket with `pmod`.
    */
  def zkey(x: Column, y: Column, bits: Int = 10): Column =
    (0 until bits)
      .flatMap(i => Seq(
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)))
      .reduce(_ + _)

  /** The identical computation as DuckDB SQL, for oracle mirroring. */
  def zkeySql(x: String, y: String, bits: Int = 10): String =
    (0 until bits)
      .flatMap(i => Seq(
        s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" + ")

  /** Write `df` parquet clustered along the Morton curve of two
    * bucketed key columns: range-partition on the z-key (so files
    * tile contiguous curve segments — at cluster scale each task
    * writes one tile) and sort within partitions (so row groups tile
    * sub-segments, sharpening footer min/max bounds). The z-key is
    * layout-only and dropped from the written schema.
    *
    * `ZOrderSpec` measures the effect rather than asserting prose:
    * per output file, the bounding box (x-span × y-span) under this
    * writer must be a fraction of the unsorted writer's.
    */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, outDir: String,
      numFiles: Int, bits: Int = 10): Unit = {
    val keyed = df.withColumn("__zkey", zkey(x, y, bits))
    keyed
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(outDir)
  }
}
