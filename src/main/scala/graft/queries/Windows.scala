package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QU._

/** Window-function surface (SURVEY §2.5): ranking (top-N per group),
  * running/sliding frame aggregates, lag/lead. All orderings carry a
  * unique tiebreaker so ranks are deterministic — `row_number` over a
  * tied ordering is nondeterministic in BOTH engines and would be
  * flaky against the oracle.
  *
  * Scale: one shuffle on the partition key per window spec; specs
  * sharing a (partitionBy, orderBy) reuse the same sort.
  */
object Windows {

  lazy val queries: Seq[Q] = Seq(

    // -- top-N per group via row_number.
    Q("q20_top_orders_per_customer",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d).orders
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        WHERE rn <= 3 ORDER BY o_custkey, rn"""),
      "top-3 orders per customer"),

    // -- running (cumulative) frame: rows unbounded-preceding..current.
    //    Decimal accumulator keeps the running sum exact so the two
    //    engines agree bit-for-bit after the final double cast.
    Q("q21_running_order_total",
      (s, d) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d).lineitem
          .filter(col("l_orderkey") % 50 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            sum(col("l_quantity").cast("decimal(38,6)")).over(w)
              .cast("double").as("running_qty"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (
          PARTITION BY l_orderkey ORDER BY l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        FROM lineitem WHERE l_orderkey % 50 = 0
        ORDER BY l_orderkey, l_linenumber"""),
      "running sum frame"),

    // -- sliding frame: trailing 2 rows + current.
    Q("q22_sliding_avg_price",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-2, Window.currentRow)
        t(s, d).orders
          .filter(col("o_custkey") % 20 === 0)
          .select(col("o_custkey"), col("o_orderkey"),
            (sum(col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double") /
              count(lit(1)).over(w)).as("trailing_avg"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
          / COUNT(*) OVER w AS trailing_avg
        FROM orders WHERE o_custkey % 20 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey"""),
      "sliding row frame"),

    // -- lag/lead: day gaps between a customer's consecutive orders.
    Q("q23_order_gaps",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d).orders
          .filter(col("o_custkey") % 20 === 0)
          .select(col("o_custkey"), col("o_orderkey"),
            datediff(col("o_orderdate"),
              lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(DATEDIFF('day',
          LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey),
          o_orderdate) AS INT) AS days_since_prev
        FROM orders WHERE o_custkey % 20 = 0
        ORDER BY o_custkey, o_orderkey"""),
      "lag across partition"),

    // -- rank with gaps + dense rank + percent breakdown per group.
    Q("q24_rank_variants",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, d).customer
          .filter(col("c_custkey") % 10 === 0)
          .select(col("c_mktsegment"), col("c_custkey"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"))
          .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
      },
      Some("""SELECT c_mktsegment, c_custkey,
        CAST(RANK() OVER w AS INT) AS rnk,
        CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        CAST(NTILE(4) OVER w AS INT) AS quartile
        FROM customer WHERE c_custkey % 10 = 0
        WINDOW w AS (PARTITION BY c_mktsegment
          ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_mktsegment, rnk, c_custkey"""),
      "rank/dense_rank/ntile"),

    // -- distribution + navigation analytics: percent_rank/cume_dist
    //    over the running frame, lead and first/nth value over the
    //    full-partition frame. One window spec per frame shape so
    //    Spark computes all five functions in a single sort.
    Q("q25_window_analytics",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d).customer
          .filter(col("c_custkey") % 10 === 0)
          .select(col("c_mktsegment"), col("c_custkey"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cdist"),
            lead(col("c_acctbal"), 1).over(w).as("next_bal"),
            first(col("c_custkey")).over(wFull).as("top_cust"),
            nth_value(col("c_custkey"), 2).over(wFull).as("runner_up"))
          .orderBy(col("c_mktsegment"), col("c_custkey"))
      },
      Some("""SELECT c_mktsegment, c_custkey,
        PERCENT_RANK() OVER w AS pct_rank,
        CUME_DIST() OVER w AS cdist,
        LEAD(c_acctbal, 1) OVER w AS next_bal,
        FIRST_VALUE(c_custkey) OVER wf AS top_cust,
        NTH_VALUE(c_custkey, 2) OVER wf AS runner_up
        FROM customer WHERE c_custkey % 10 = 0
        WINDOW w AS (PARTITION BY c_mktsegment
          ORDER BY c_acctbal DESC, c_custkey),
        wf AS (PARTITION BY c_mktsegment
          ORDER BY c_acctbal DESC, c_custkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY c_mktsegment, c_custkey"""),
      "percent_rank/cume_dist/lead/first/nth_value")
  )
}
