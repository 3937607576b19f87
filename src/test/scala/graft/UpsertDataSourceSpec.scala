package graft

import org.apache.spark.sql.functions._

import graft.engine.Sink

class UpsertDataSourceSpec extends SparkSpec {

  private def write(df: org.apache.spark.sql.DataFrame, w: Sink.InMemoryUpsertWriter,
                    table: String, chunkSize: Int = 300): Unit =
    df.write.format("graft.sources.UpsertDataSource")
      .option("table", table)
      .option("writerId", w.id)
      .option("keys", "ticker,year")
      .option("chunkSize", chunkSize.toString)
      .mode("append")
      .save()

  private def fixture = {
    import spark.implicits._
    (0 until 1000).map(i => (s"T${i % 50}", 2000 + i / 50, i.toDouble))
      .toDF("ticker", "year", "value")
  }

  test("planner-integrated write delivers every row through bounded chunks") {
    val w = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    try {
      write(fixture.repartition(8), w, "t1", chunkSize = 37)
      assert(w.size === 1000, "one row per (ticker, year) key")
      val byKey = w.rows.map(r =>
        (r.getAs[String]("ticker"), r.getAs[Int]("year")) -> r.getAs[Double]("value")).toMap
      assert(byKey(("T0", 2000)) === 0.0)
      assert(byKey(("T49", 2019)) === 999.0)
    } finally w.dispose()
  }

  test("replayed write is idempotent (at-least-once converges on the key)") {
    val w = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    try {
      write(fixture, w, "t2")
      val once = w.size
      assert(once === 1000, "nonzero baseline before replay")
      write(fixture, w, "t2")
      assert(w.size === once, "replay must not duplicate")
    } finally w.dispose()
  }

  test("missing key column in the written schema fails at plan time") {
    import spark.implicits._
    val w = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    try {
      val bad = Seq(("A", 1.0)).toDF("ticker", "value") // no year
      val e = intercept[Exception] { write(bad, w, "t3") }
      assert(e.getMessage != null)
      assert(w.size === 0, "no rows may be delivered on a plan-time failure")
    } finally w.dispose()
  }

  test("distinct tables share one endpoint store without key collisions") {
    import spark.implicits._
    val w = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    try {
      val df = Seq(("A", 2024, 1.0)).toDF("ticker", "year", "value")
      write(df, w, "income")
      write(df, w, "balance")
      assert(w.size === 2, "same key under two tables = two entries")
    } finally w.dispose()
  }

  test("streaming write: micro-batch epochs upsert through the same sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val w = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    val stream = MemoryStream[(String, Int, Double)]
    val q = stream.toDF().toDF("ticker", "year", "value")
      .writeStream.format("graft.sources.UpsertDataSource")
      .option("table", "t_stream")
      .option("writerId", w.id)
      .option("keys", "ticker,year")
      .option("chunkSize", "2")
      .option("checkpointLocation",
        s"/tmp/graft-upsert-ckpt-${java.util.UUID.randomUUID()}")
      .outputMode("append")
      .start()
    try {
      stream.addData(Seq(("A", 2024, 1.0), ("B", 2024, 2.0), ("C", 2024, 3.0)))
      q.processAllAvailable()
      assert(w.size === 3)
      // second epoch: one new key, one key updated — last write wins
      stream.addData(Seq(("A", 2024, 9.0), ("D", 2024, 4.0)))
      q.processAllAvailable()
      assert(w.size === 4)
      val a = w.rows.find(r => r.getAs[String]("ticker") == "A").get
      assert(a.getAs[Double]("value") === 9.0, "later epoch must win on the key")
    } finally { q.stop(); w.dispose() }
  }

  test("update-mode stateful aggregation upserts evolving per-key state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val w = new Sink.InMemoryUpsertWriter(Seq("ticker"))
    val stream = MemoryStream[(String, Double)]
    // running sum per ticker, Update mode: each epoch re-emits changed
    // keys and the sink's upsert-as-append converges to latest state
    val q = stream.toDF().toDF("ticker", "value")
      .groupBy(col("ticker")).agg(sum(col("value")).as("total"))
      .writeStream.format("graft.sources.UpsertDataSource")
      .option("table", "totals")
      .option("writerId", w.id)
      .option("keys", "ticker")
      .option("checkpointLocation",
        s"/tmp/graft-upsert-ckpt-${java.util.UUID.randomUUID()}")
      .outputMode("update")
      .start()
    try {
      stream.addData(Seq(("A", 1.0), ("B", 2.0)))
      q.processAllAvailable()
      stream.addData(Seq(("A", 10.0)))
      q.processAllAvailable()
      assert(w.size === 2)
      val totals = w.rows.map(r =>
        r.getAs[String]("ticker") -> r.getAs[Double]("total")).toMap
      assert(totals === Map("A" -> 11.0, "B" -> 2.0),
        "the sink must hold the LATEST aggregate per key")
    } finally { q.stop(); w.dispose() }
  }

  test("DSv2 write result equals the foreachPartition sink result") {
    val wA = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    val wB = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    try {
      write(fixture, wA, "t")
      Sink.upsert(fixture, "t", wB)
      def snap(w: Sink.InMemoryUpsertWriter) = w.rows.map(r =>
        (r.getAs[String]("ticker"), r.getAs[Int]("year"), r.getAs[Double]("value"))).toSet
      assert(snap(wA) === snap(wB))
    } finally { wA.dispose(); wB.dispose() }
  }
}
