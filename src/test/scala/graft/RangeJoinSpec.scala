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

  test("10x data on both sides costs ~10x, not the nested loop's 100x") {
    // constant density: the value domain grows with n, so matches per
    // interval stay O(1) and output grows ~10x. The naive non-equi
    // join does 100x the COMPARISONS regardless of output; the binned
    // rewrite's work follows output. Generators are spec-local (the
    // corpus-backed ScalingSpec covers the doc/embedding operators;
    // range join's sides come from relational tables).
    def pts(n: Int) = (0 until n)
      .map(i => (i.toLong, (i * 7919 % n).toDouble)).toDF("pid", "v")
    def ivs(n: Int) = (0 until n / 8).map { i =>
      val lo = (i * 104729 % n).toDouble
      (i.toLong, lo, lo + 4.0)
    }.toDF("iid", "lo", "hi")
    def timeAndCount(n: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = RangeJoin.binned(pts(n), "v", ivs(n), "lo", "hi", 4.0).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    timeAndCount(20000) // JIT/codegen warmup
    val (t1, r1) = { val a = timeAndCount(20000); val b = timeAndCount(20000)
      (math.min(a._1, b._1), a._2) }
    val (t10, r10) = { val a = timeAndCount(200000); val b = timeAndCount(200000)
      (math.min(a._1, b._1), a._2) }
    assert(r10 >= 8 * r1 && r10 <= 13 * r1,
      s"output should track data size: $r1 -> $r10")
    val ratio = t10 / math.max(t1, 0.05)
    info(f"range join: rows $r1 -> $r10, time $t1%.2fs -> $t10%.2fs (ratio $ratio%.1fx)")
    assert(ratio < 30.0,
      f"10x data cost $ratio%.1fx — quadratic-shaped growth")
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
