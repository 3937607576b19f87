package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Semantics + plan-shape pins for the binned range join. Value
  * parity against DuckDB's IEJoin is covered by q103's oracle; here
  * we pin (a) equivalence with the naive non-equi join on generated
  * data that crosses bin boundaries and zero, (b) half-open boundary
  * semantics, (c) null/empty-interval hygiene, and (d) that the plan
  * is an equi-join, not a nested loop.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points(n: Int) =
    (0 until n).map(i => (i.toLong, (i * 7919 % 1000) / 3.0 - 150.0))
      .toDF("pid", "v")

  private def intervals(n: Int) =
    (0 until n).map { i =>
      val lo = (i * 104729 % 900) / 3.0 - 140.0
      (i.toLong, lo, lo + (i % 5) * 13.7)
    }.toDF("iid", "lo", "hi")

  test("binned equals the naive non-equi join across bin boundaries and negatives") {
    val p = points(400)
    val iv = intervals(60)
    val got = RangeJoin.binned(p, "v", iv, "lo", "hi", binWidth = 15.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = p.join(iv, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture must produce matches")
    assert(got === want)
  }

  test("half-open [lo, hi): lo matches, hi does not") {
    val p = Seq((1L, 10.0), (2L, 20.0)).toDF("pid", "v")
    val iv = Seq((1L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(p, "v", iv, "lo", "hi", binWidth = 4.0)
      .select("pid").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("an interval spanning many bins still matches every contained point") {
    val p = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("pid", "v")
    val iv = Seq((1L, 5.0, 95.0)).toDF("iid", "lo", "hi")
    val n = RangeJoin.binned(p, "v", iv, "lo", "hi", binWidth = 3.0).count()
    assert(n === 90L) // 5..94 inclusive
  }

  test("null values, null bounds, and empty intervals never match") {
    val p = Seq((1L, Some(10.0)), (2L, None)).toDF("pid", "v")
    val iv = Seq(
      (1L, Some(0.0), Some(100.0)),  // matches pid 1 only
      (2L, None, Some(100.0)),       // null lo
      (3L, Some(0.0), None),         // null hi
      (4L, Some(50.0), Some(50.0)),  // empty
      (5L, Some(60.0), Some(40.0))   // inverted (descending-sequence corner)
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(p, "v", iv, "lo", "hi", binWidth = 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L)))
  }

  test("plan is an equi-join on the bin key, never a nested loop") {
    val plan = RangeJoin
      .binned(points(400), "v", intervals(60), "lo", "hi", binWidth = 15.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join degraded to a nested loop:\n$plan")
    assert(plan.contains("Join") || plan.contains("join"),
      s"expected a join in:\n$plan")
  }
}
