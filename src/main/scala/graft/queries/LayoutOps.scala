package graft.queries

import org.apache.spark.sql.functions._

import QU._
import graft.operators.ZOrder

/** Data-layout operators: the write-side half of scan performance.
  * At 100 TB a selective query's cost is decided before it runs — by
  * whether the layout lets footer min/max stats skip files — so the
  * Morton-curve clustering `ZOrder.writeZOrdered` applies is a
  * first-class operator, not an afterthought. q134 puts the key
  * computation itself on the oracle surface (pure bit arithmetic,
  * bit-identical across engines); ZOrderSpec measures the layout
  * effect (per-file bounding boxes shrink vs an unsorted write).
  */
object LayoutOps {

  /** Bucket width for the two clustered dimensions (2^10 buckets). */
  val ZBits = 10

  lazy val queries: Seq[Q] = Seq(

    // -- Morton-key census over lineitem's (partkey, suppkey) —
    //    the clustering key a part+supplier-filtered workload wants.
    //    Bucketing is pmod into [0, 1024); the census aggregates per
    //    curve segment (top 8 of 20 bits), so output stays 256 rows
    //    at any scale and min_z/max_z pin the exact interleave.
    Q("q134_zorder_key_census",
      (s, d) => {
        val z = ZOrder.zkey(
          pmod(col("l_partkey"), lit(1024L)),
          pmod(col("l_suppkey"), lit(1024L)), ZBits)
        t(s, d).lineitem
          .select(z.as("zkey"), col("l_quantity"))
          .groupBy(shiftright(col("zkey"), 12).as("zbucket"))
          .agg(count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"),
            min(col("zkey")).as("min_z"), max(col("zkey")).as("max_z"))
          .orderBy(col("zbucket"))
      },
      Some(s"""WITH z AS (
          SELECT (${ZOrder.zkeySql("(l_partkey % 1024)", "(l_suppkey % 1024)", ZBits)}) AS zkey,
            l_quantity
          FROM lineitem)
        SELECT zkey >> 12 AS zbucket, COUNT(*) AS n,
          ${sqlDsum("l_quantity")} AS sum_qty,
          MIN(zkey) AS min_z, MAX(zkey) AS max_z
        FROM z GROUP BY 1 ORDER BY zbucket"""),
      "Morton (z-order) interleave key census"),

    // -- q20's top-3-per-customer computed WITHOUT a sort window:
    //    [[graft.operators.TopKPerGroup]] keeps a bounded k-element
    //    heap per group inside a typed Aggregator, so partial
    //    aggregation trims map-side and the shuffle carries at most
    //    k rows per (partition, group) — on a skewed corpus the
    //    window form sorts the hottest group in one task; this form
    //    never materializes a group at all. Ordering (score DESC,
    //    id ASC) is row_number's exact tie-break, so the window-form
    //    oracle applies verbatim (and the driver hash-verifies the
    //    heap path against it). PlanShapeSpec pins the no-Window
    //    plan; TopKSpec measures the skew win.
    Q("q142_topk_heap_agg",
      (s, d) => graft.operators.TopKPerGroup.topK(
          t(s, d).orders, Seq("o_custkey"),
          col("o_totalprice"), col("o_orderkey"), 3)
        .select(col("o_custkey"), col("id").as("o_orderkey"),
          col("score").as("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn")),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        WHERE rn <= 3 ORDER BY o_custkey, rn"""),
      "per-group top-k via bounded-heap aggregate (no sort window)"))
}
