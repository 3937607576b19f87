package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

/** ASOF semantics pins: inclusive match at equal timestamps, latest
  * prior row wins, null when nothing precedes, left rows never
  * multiply. (Value parity vs DuckDB's native ASOF JOIN is covered by
  * q26's oracle.)
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("asof: latest prior wins, equal-time matches, missing -> null") {
    val left = Seq(
      (1L, ts(10), "e1"), (1L, ts(20), "e2"), (1L, ts(5), "e0"),
      (2L, ts(10), "x1")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(8), 100.0), (1L, ts(10), 200.0), (1L, ts(15), 300.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin(left, right, keys = Seq("k"),
      leftTime = "t", rightTime = "t")
      .collect().map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(out === Set(
      (1L, "e0", None),          // nothing at or before t=5
      (1L, "e1", Some(200.0)),   // equal-time right row matches
      (1L, "e2", Some(300.0)),   // latest prior among three
      (2L, "x1", None)))         // key with no right rows at all
  }

  test("asof: right row with null payload value is still the match (not skipped)") {
    val left = Seq((1L, ts(10), "e")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(5), Some(5.0)), (1L, ts(8), None))
      .toDF("k", "t", "v")
    val out = AsOfJoin(left, right, Seq("k"), "t", "t").collect()
    assert(out.length === 1)
    // the t=8 row is the latest prior; its null value must be attached —
    // skipping back to t=5's 5.0 would invent standard-ASOF-violating output
    assert(out.head.isNullAt(out.head.fieldIndex("v")))
  }

  test("asof: multi-column payload comes from ONE right row (no stitching)") {
    val left = Seq((1L, ts(10), "e")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(5), Some(5.0), Some("old")),
      (1L, ts(8), None, Some("new"))).toDF("k", "t", "v", "label")
    val r = AsOfJoin(left, right, Seq("k"), "t", "t").collect().head
    assert(r.isNullAt(r.fieldIndex("v")))              // from t=8
    assert(r.getAs[String]("label") === "new")          // also from t=8
  }

  test("asof: left cardinality preserved") {
    val left = (1 to 100).map(i => (i.toLong % 5, ts(i), i)).toDF("k", "t", "x")
    val right = (1 to 30).map(i => (i.toLong % 5, ts(i * 2), i * 1.0)).toDF("k", "t", "v")
    assert(AsOfJoin(left, right, Seq("k"), "t", "t").count() === 100L)
  }
}
