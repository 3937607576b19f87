package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Error-bound contract for the approximate-distinct sketch (q19),
  * which has no SQL oracle: the HLL++ estimate must sit within the
  * configured relative standard deviation of the exact count.
  */
class RelationalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("q19 approx distinct within 5% of exact per group") {
    val approx = Registry.queries("q19_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    exact.foreach { case (k, ex) =>
      val err = math.abs(approx(k) - ex).toDouble / ex
      assert(err <= 0.05, s"group $k: approx ${approx(k)} vs exact $ex (err $err)")
    }
  }

  test("q29 approx percentiles within 1% of exact q28 per group") {
    def byGroup(name: String) =
      Registry.queries(name)(spark, dir)
        .collect()
        .map(r => r.getString(0) ->
          Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toMap
    val exact = byGroup("q28_percentiles")
    val approx = byGroup("q29_approx_percentiles")
    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    exact.foreach { case (k, ex) =>
      ex.zip(approx(k)).zip(Seq("p50", "p90", "p99")).foreach {
        case ((e, a), p) =>
          val err = math.abs(a - e) / e
          assert(err <= 0.01, s"group $k $p: approx $a vs exact $e (err $err)")
      }
    }
  }

  test("approx percentile sketch is deterministic for fixed input") {
    val a = Registry.queries("q29_approx_percentiles")(spark, dir).collect().toSeq
    val b = Registry.queries("q29_approx_percentiles")(spark, dir).collect().toSeq
    assert(a === b)
  }

  test("approx sketch is deterministic for fixed input") {
    val a = Registry.queries("q19_approx_distinct")(spark, dir).collect().toSeq
    val b = Registry.queries("q19_approx_distinct")(spark, dir).collect().toSeq
    assert(a === b)
  }
}
