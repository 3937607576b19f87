package graft

import org.apache.spark.sql.functions._

import graft.operators.BandedPairs

class BandedPairsSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {

  // cappedCandidates persists its tagged band table on every call;
  // release after each test instead of leaking into the shared session
  override def afterEach(): Unit = {
    spark.catalog.clearCache()
    super.afterEach()
  }

  private def banded(rows: Seq[(Long, Int)]) = {
    import spark.implicits._
    rows.toDF("id", "b")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame, cap: Int): Set[(Long, Long)] =
    BandedPairs.cappedCandidates(df, "id", Seq("b"), cap, "a", "bb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("below the cap: exactly the brute-force within-bucket pairs, deduped across buckets") {
    // bucket 1 = {1,2,3}; bucket 2 = {3,4}; bucket 3 = {5} (singleton)
    // pair (2,3) also co-occurs in bucket 4 — must appear once
    val df = banded(Seq(1L -> 1, 2L -> 1, 3L -> 1, 3L -> 2, 4L -> 2, 5L -> 3,
      2L -> 4, 3L -> 4))
    assert(pairs(df, 100) ===
      Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
  }

  test("above the cap: each over-cap bucket contributes exactly m-1 star edges to its min id") {
    val hot = (10L until 30L).map(_ -> 7) // 20 members, cap 5
    val cold = Seq(100L -> 8, 101L -> 8)
    val got = pairs(banded(hot ++ cold), 5)
    val star = (11L until 30L).map(10L -> _).toSet
    assert(got === star + (100L -> 101L))
  }

  test("rep id is always the pair's smaller side (canonical orientation)") {
    val df = banded((0L until 50L).map(i => (49L - i) -> 9)) // reversed insert order
    val got = pairs(df, 10)
    assert(got.forall { case (a, b) => a < b })
    assert(got === (1L until 50L).map(0L -> _).toSet)
  }

  test("bn/rep column collisions are rejected loudly") {
    import spark.implicits._
    val bad = Seq((1L, 1, 2L)).toDF("id", "b", "bn")
    intercept[IllegalArgumentException] {
      BandedPairs.cappedCandidates(bad, "id", Seq("b"), 10, "a", "bb")
    }
  }
}
