package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.engine.{Sink, Sources}
import graft.streaming.EventStream

/** Event for the MemoryStream-driven streaming tests (mirrors the
  * events fixture's analytic columns).
  */
case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Proves the streaming surface computes the SAME results as the
  * DuckDB-verified batch queries: the transforms are literally shared
  * (EventOps delegates to EventStream), so these tests pin the
  * streaming execution mode — incremental state, watermark-driven
  * emission, and the foreachBatch idempotent upsert load.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureEvents: Seq[Ev] =
    Sources.Tables(spark, "/root/testdata/sf0.001").events
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => Ev(r.getTimestamp(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSeq

  private def batchDf(evs: Seq[Ev]): DataFrame = evs.toDF()

  private def collectSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("streaming tumblingAgg over MemoryStream == batch tumblingAgg (q40 logic)") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStream.tumblingAgg(stream.toDF())
      .writeStream.format("memory").queryName("s_tumb").outputMode("complete")
      .start()
    try {
      val (a, b) = fixtureEvents.splitAt(fixtureEvents.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val got = collectSet(spark.table("s_tumb"))
      val want = collectSet(EventStream.tumblingAgg(batchDf(fixtureEvents)))
      assert(want.nonEmpty && got === want)
    } finally q.stop()
  }

  test("streaming sessionAgg emits closed sessions == batch sessions (q42 logic)") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStream.sessionAgg(stream.toDF())
      .writeStream.format("memory").queryName("s_sess").outputMode("append")
      .start()
    try {
      val maxTs = fixtureEvents.map(_.ts.getTime).max
      val flushUser = -1L
      stream.addData(fixtureEvents); q.processAllAvailable()
      // two far-future flush events advance the watermark past every
      // real session (emission uses the watermark computed at the
      // START of a batch, so it takes two triggers to drain)
      stream.addData(Seq(Ev(new Timestamp(maxTs + 36L * 3600 * 1000), flushUser, "flush", 0.0)))
      q.processAllAvailable()
      stream.addData(Seq(Ev(new Timestamp(maxTs + 72L * 3600 * 1000), flushUser, "flush", 0.0)))
      q.processAllAvailable()
      val got = collectSet(spark.table("s_sess").filter(col("user_id") =!= flushUser))
      val want = collectSet(EventStream.sessionAgg(batchDf(fixtureEvents)))
      assert(want.nonEmpty && got === want)
    } finally q.stop()
  }

  test("foreachBatch upsert load converges to the batch aggregate") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val writer = new Sink.InMemoryUpsertWriter(Seq("window_start", "event_type"))
    val ckpt = java.nio.file.Files.createTempDirectory("streamckpt").toString
    val q = EventStream.upsertStream(
      EventStream.tumblingAgg(stream.toDF()), "hourly", writer, ckpt)
    try {
      val (a, b) = fixtureEvents.splitAt(fixtureEvents.size / 3)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val got = writer.rows
        .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
      val want = EventStream.tumblingAgg(batchDf(fixtureEvents)).collect()
        .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
      assert(want.nonEmpty && got === want)
    } finally q.stop()
  }

  test("streaming near-dup candidates == batch LSH candidates (custom state op)") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val docRows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val stream = MemoryStream[(Long, String)]
    // threshold 0.5 to mirror the batch ground truth below exactly
    // (the production default is the 0.25 prefilter cut)
    val q = EventStream.nearDupCandidates(
        stream.toDF().toDF("doc_id", "text"), threshold = 0.5)
      .writeStream.format("memory").queryName("s_neardup").outputMode("append")
      .start()
    try {
      val (a, b) = docRows.splitAt(docRows.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val got = spark.table("s_neardup")
        .select(col("doc_a"), col("doc_b")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch ground truth: same banding, same estimate threshold
      val docs = docRows.toDF("doc_id", "text")
      val sig = docs.select(col("doc_id"),
        graft.functions.Text.minHash(
          graft.functions.Text.shingleHashes(col("text"), 3)).as("sig"))
      val banded = sig.select(col("doc_id"),
        explode(graft.functions.Text.lshBands(col("sig"))).as("b"))
      val cands = banded.select(col("doc_id").as("doc_a"), col("b"))
        .join(banded.select(col("doc_id").as("doc_b"), col("b")), Seq("b"))
        .filter(col("doc_a") < col("doc_b")).select("doc_a", "doc_b").distinct()
      val want = cands
        .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
        .filter(graft.functions.Text.sigEstimate(col("sig_a"), col("sig_b")) >= 0.5)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty && got === want)
    } finally q.stop()
  }

  test("near-dup hot band keeps a recency ring: post-saturation duplicates still pair") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val copy = "identical boilerplate paragraph with plenty of shared " +
      "tokens so every document lands in the same minhash bands"
    val stream = MemoryStream[(Long, String)]
    val q = EventStream.nearDupCandidates(
        stream.toDF().toDF("doc_id", "text"), threshold = 0.5, maxPerBand = 5)
      .writeStream.format("memory").queryName("s_ring").outputMode("append")
      .start()
    try {
      // saturate every band (10 identical docs, cap 5) ...
      stream.addData((0L until 10L).map(i => (i, copy))); q.processAllAvailable()
      // ... then two FRESH duplicates in separate later batches: under
      // round-2 stop-storing, 100 was never stored, so (100, 101)
      // could not be emitted; the recency ring must report it
      stream.addData(Seq((100L, copy))); q.processAllAvailable()
      stream.addData(Seq((101L, copy))); q.processAllAvailable()
      val got = spark.table("s_ring").select(col("doc_a"), col("doc_b"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((100L, 101L)),
        s"fresh post-saturation pair missing from ${got.size} pairs")
      assert(got.contains((100L, 9L)) || got.contains((9L, 100L)) ||
        got.contains((100L, 101L)), "hot band must still report pairs")
    } finally q.stop()
  }

  test("near-dup event-time horizon: beyond-watermark duplicates are re-deduped") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val copy = "identical boilerplate paragraph with plenty of shared " +
      "tokens so every document lands in the same minhash bands"
    val other = "entirely unrelated filler content about orbital mechanics " +
      "and satellite constellations to advance the watermark only"
    val t0 = 1700000000000L
    def ts(offsetMin: Long) = new Timestamp(t0 + offsetMin * 60000)
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = EventStream.nearDupCandidates(
        stream.toDF().toDF("doc_id", "text", "ts"),
        threshold = 0.5, eventTimeHorizon = Some("1 hour"))
      .writeStream.format("memory").queryName("s_horizon").outputMode("append")
      .start()
    try {
      stream.addData(Seq((1L, copy, ts(0)))); q.processAllAvailable()
      // advance the watermark far past doc 1's horizon (wm = max ts − 1h)
      stream.addData(Seq((50L, other, ts(600)))); q.processAllAvailable()
      stream.addData(Seq((51L, other, ts(601)))); q.processAllAvailable()
      // a duplicate of doc 1 arriving beyond the horizon: state for
      // doc 1 is expired, so NO (1, 2) pair — doc 2 starts a new
      // dedup generation...
      stream.addData(Seq((2L, copy, ts(600)))); q.processAllAvailable()
      // ...and a duplicate within doc 2's horizon pairs with IT
      stream.addData(Seq((3L, copy, ts(601)))); q.processAllAvailable()
      val got = spark.table("s_horizon").select(col("doc_a"), col("doc_b"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!got.contains((1L, 2L)) && !got.contains((1L, 3L)),
        s"expired state must not produce pairs: $got")
      assert(got.contains((2L, 3L)), s"in-horizon duplicate missing: $got")
    } finally q.stop()
  }

  test("near-dup horizon: a late-arriving row must not shorten stored entries' expiry") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val copy = "identical boilerplate paragraph with plenty of shared " +
      "tokens so every document lands in the same minhash bands"
    val other = "entirely unrelated filler content about orbital mechanics " +
      "and satellite constellations to advance the watermark only"
    val t0 = 1700000000000L
    def ts(offsetMin: Long) = new Timestamp(t0 + offsetMin * 60000)
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = EventStream.nearDupCandidates(
        stream.toDF().toDF("doc_id", "text", "ts"),
        threshold = 0.5, eventTimeHorizon = Some("1 hour"))
      .writeStream.format("memory").queryName("s_late").outputMode("append")
      .start()
    try {
      // doc 1 at 10:00 → its horizon runs to 11:00
      stream.addData(Seq((1L, copy, ts(600)))); q.processAllAvailable()
      // watermark moves to 9:00 (10:00 − 1h)
      stream.addData(Seq((50L, other, ts(600)))); q.processAllAvailable()
      // LATE duplicate (9:10, behind doc 1): with the buggy timeout
      // floor (batch max ts only) this reset the band's timeout to
      // 10:10, 50 min before doc 1's documented expiry
      stream.addData(Seq((2L, copy, ts(550)))); q.processAllAvailable()
      // advance the watermark to 10:30: past the buggy timeout, before
      // doc 1's true horizon — idle batches give timeouts a chance
      stream.addData(Seq((51L, other, ts(690)))); q.processAllAvailable()
      stream.addData(Seq((52L, other, ts(690)))); q.processAllAvailable()
      // doc 3 at 10:45 (above the 10:30 watermark, inside doc 1's
      // 11:00 horizon): doc 1 must still be present
      stream.addData(Seq((3L, copy, ts(645)))); q.processAllAvailable()
      val got = spark.table("s_late").select(col("doc_a"), col("doc_b"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((1L, 3L)),
        s"stored entry expired prematurely on late arrival: $got")
    } finally q.stop()
  }

  test("near-dup redelivery: an at-least-once re-arrival refreshes the entry's horizon") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val copy = "identical boilerplate paragraph with plenty of shared " +
      "tokens so every document lands in the same minhash bands"
    val other = "entirely unrelated filler content about orbital mechanics " +
      "and satellite constellations to advance the watermark only"
    val t0 = 1700000000000L
    def ts(offsetMin: Long) = new Timestamp(t0 + offsetMin * 60000)
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = EventStream.nearDupCandidates(
        stream.toDF().toDF("doc_id", "text", "ts"),
        threshold = 0.5, eventTimeHorizon = Some("1 hour"))
      .writeStream.format("memory").queryName("s_redeliver").outputMode("append")
      .start()
    try {
      // doc 1 @ 0:00 → horizon runs to 1:00
      stream.addData(Seq((1L, copy, ts(0)))); q.processAllAvailable()
      // upstream redelivers doc 1 @ 0:50: must refresh the stored
      // entry to 0:50 (horizon now 1:50), not stay pinned to 0:00
      stream.addData(Seq((1L, copy, ts(50)))); q.processAllAvailable()
      // advance the watermark to 1:20 — past the FIRST-seen horizon,
      // inside the refreshed one
      stream.addData(Seq((50L, other, ts(140)))); q.processAllAvailable()
      stream.addData(Seq((51L, other, ts(141)))); q.processAllAvailable()
      // doc 2 @ 1:40 (above the watermark, within the refreshed
      // horizon): with the pre-fix pinning, doc 1's entry is already
      // pruned and this pair is silently lost
      stream.addData(Seq((2L, copy, ts(100)))); q.processAllAvailable()
      val got = spark.table("s_redeliver").select(col("doc_a"), col("doc_b"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((1L, 2L)),
        s"redelivered doc lost its refreshed horizon: $got")
    } finally q.stop()
  }

  test("intervalMs: single-component strings parse; compound strings are rejected") {
    assert(EventStream.intervalMs("90 seconds") === 90000L)
    assert(EventStream.intervalMs("2 hours") === 7200000L)
    intercept[IllegalArgumentException] {
      EventStream.intervalMs("1 hour 30 minutes")
    }
  }

  test("readEvents wires a parquet directory as an unbounded source") {
    val sdf = EventStream.readEvents(spark, "/root/testdata/sf0.001/events.parquet")
    assert(sdf.isStreaming)
    assert(Seq("ts", "user_id", "event_type", "value")
      .forall(sdf.columns.contains))
  }

  test("streaming dedup: first occurrence kept, duplicates within watermark dropped") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    // duplicate every event (same ts/user/type) across two batches
    val rows = fixtureEvents.take(300)
    val stream = MemoryStream[Ev]
    val q = EventStream.streamingDedup(
        stream.toDF(), keys = Seq("user_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("s_dedup").outputMode("append")
      .start()
    try {
      stream.addData(rows); q.processAllAvailable()
      stream.addData(rows); q.processAllAvailable() // exact replay batch
      val got = spark.table("s_dedup").count()
      val want = rows.toDF().select("user_id", "ts", "event_type")
        .distinct().count()
      assert(want > 0 && got === want)
    } finally q.stop()
  }

  test("streaming embedding near-dup == batch banded near-dup (q69 logic)") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val stream = MemoryStream[(Long, Array[Float])]
    val sdf = stream.toDF().toDF("vec_id", "embedding")
    val q = EventStream.embNearDupCandidates(sdf)
      .writeStream.format("memory").queryName("s_embdup")
      .outputMode("append").start()
    try {
      stream.addData(emb.take(250)); q.processAllAvailable()
      stream.addData(emb.drop(250)); q.processAllAvailable()
    } finally q.stop()
    // multi-band collisions emit at-least-once; dedupe like a consumer
    val got = spark.table("s_embdup").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.queries.Similarity
      .embNearDupLshOn(spark.read.parquet(s"$dir/embeddings.parquet"))
      .select(col("vec_a").cast("long"), col("vec_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture has no embedding near-dups")
    assert(got === batch)
    spark.catalog.clearCache()
    graft.operators.BandedPairs.releaseCache()
  }

  /** (day, bucket, register) rows of a stored portable-HLL register
    * table — the exact state, so parity checks are row equality, not
    * estimate-closeness.
    */
  private def regRows(path: String): Set[(String, Int, Int)] =
    spark.read.parquet(path)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getInt(2))).toSet

  /** The one-shot batch register state for the same events — shared
    * derivation (EventOps.hllRows), so streaming must reproduce it
    * row-for-row.
    */
  private def batchRegs(rows: Seq[Ev]): Set[(String, Int, Int)] =
    graft.queries.EventOps.hllRows(batchDf(rows))
      .groupBy(col("day"), col("b")).agg(max(col("rho")).as("m_reg"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getInt(2))).toSet

  test("streaming HLL register maintenance == batch registers row-for-row; " +
      "redelivery is a no-op") {
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-hll").toString
    val rows = fixtureEvents
    val stream = MemoryStream[Ev]
    val q = EventStream.sketchRollupStream(
      stream.toDF(), s"$base/sketches", s"$base/ckpt")
    try {
      stream.addData(rows.take(400)); q.processAllAvailable()
      stream.addData(rows.drop(400)); q.processAllAvailable()
      // at-least-once: replay an already-merged slice — the merge is
      // register-wise max, so the table must not change
      val before = regRows(s"$base/sketches")
      stream.addData(rows.take(400)); q.processAllAvailable()
      val after = regRows(s"$base/sketches")
      assert(after === before, "redelivered batch changed the register table")
      // parity: the streamed store IS the batch register state (same
      // portable derivation — q102's estimates follow identically)
      assert(after === batchRegs(rows))
    } finally q.stop()
  }

  test("sketch rollup heals a mid-swap crash before merging the next batch") {
    implicit val ctx = spark.sqlContext
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft-hll-heal").toString
    val rows = fixtureEvents
    val stream = MemoryStream[Ev]
    val table = s"$base/sketches"
    val q = EventStream.sketchRollupStream(stream.toDF(), table, s"$base/ckpt")
    try {
      stream.addData(rows.take(400)); q.processAllAvailable()
      // simulate dying between the two renames: the table survives
      // ONLY under .old — the next batch must restore it before
      // merging, or the first 400 events' counts silently vanish
      Files.move(Paths.get(table), Paths.get(table + ".old"),
        StandardCopyOption.ATOMIC_MOVE)
      stream.addData(rows.drop(400)); q.processAllAvailable()
      assert(regRows(table) === batchRegs(rows),
        "mid-swap crash lost the pre-crash register state")
      assert(!Files.exists(Paths.get(table + ".old")))
      assert(!Files.exists(Paths.get(table + ".tmp")))
    } finally q.stop()
  }

  test("hist rollup stream equals the one-shot batch histogram exactly") {
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-hist-stream").toString
    val rows = fixtureEvents
    val stream = MemoryStream[Ev]
    val table = s"$base/hist"
    val q = EventStream.histRollupStream(stream.toDF(), table, s"$base/ckpt")
    try {
      stream.addData(rows.take(400)); q.processAllAvailable()
      stream.addData(rows.drop(400)); q.processAllAvailable()
      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
      val got = toMap(spark.read.parquet(table))
      // counts are exact integers: streamed-and-merged must equal the
      // single-pass batch histogram BIT-exactly, not approximately
      val want = toMap(graft.operators.HdrHistogram
        .dailyHist(batchDf(rows), col("ts"), col("value")))
      assert(got === want, "streamed histogram != batch histogram")
      // the public quantile walk answers from the MAINTAINED table
      // exactly as from a one-shot histogram (q117's consumer path)
      val stored = spark.read.parquet(table)
      val bounds = stored.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val ranges = bounds.select(lit("all").as("range_name"),
        col("lo").as("d_lo"), col("hi").as("d_hi"))
      val fromStream = graft.operators.HdrHistogram
        .rangeQuantiles(stored, ranges, Seq(0.5, 0.99)).collect().toSeq
      val fromBatch = graft.operators.HdrHistogram
        .rangeQuantiles(graft.operators.HdrHistogram
          .dailyHist(batchDf(rows), col("ts"), col("value")), ranges,
          Seq(0.5, 0.99)).collect().toSeq
      assert(fromStream === fromBatch && fromStream.size === 2)
    } finally q.stop()
  }

  test("hist rollup merge skips an already-merged batch id (crash redelivery)") {
    val base = java.nio.file.Files.createTempDirectory("graft-hist-redeliver").toString
    val table = s"$base/hist"
    val (a, b) = fixtureEvents.splitAt(300)
    assert(EventStream.mergeHistBatch(batchDf(a), table, 0L))
    val before = spark.read.parquet(table).collect().toSet
    // count merging is not idempotent by algebra (unlike HLL's
    // register-max) — the batch-id marker must make it so
    assert(!EventStream.mergeHistBatch(batchDf(a), table, 0L),
      "same batch id must be skipped")
    assert(spark.read.parquet(table).collect().toSet === before,
      "redelivered batch changed the histogram table")
    assert(EventStream.mergeHistBatch(batchDf(b), table, 1L))
    val total = spark.read.parquet(table)
      .agg(sum(col("cnt"))).head().getLong(0)
    assert(total === fixtureEvents.size.toLong,
      "histogram mass != event count after distinct-id merges")
  }

  test("hist rollup heals a mid-swap crash before merging the next batch") {
    implicit val ctx = spark.sqlContext
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft-hist-heal").toString
    val rows = fixtureEvents
    val stream = MemoryStream[Ev]
    val table = s"$base/hist"
    val q = EventStream.histRollupStream(stream.toDF(), table, s"$base/ckpt")
    try {
      stream.addData(rows.take(400)); q.processAllAvailable()
      // die between the two renames: table (and its batch-id marker)
      // survive only under .old — the next batch must restore both
      Files.move(Paths.get(table), Paths.get(table + ".old"),
        StandardCopyOption.ATOMIC_MOVE)
      stream.addData(rows.drop(400)); q.processAllAvailable()
      val healed = spark.read.parquet(table)
        .agg(sum(col("cnt"))).head().getLong(0)
      assert(healed === rows.size.toLong,
        "mid-swap crash lost pre-crash histogram mass")
      assert(!Files.exists(Paths.get(table + ".old")))
      assert(!Files.exists(Paths.get(table + ".tmp")))
    } finally q.stop()
  }

  test("IvfIndex.appendStream: streamed vectors land in the same cells as batch assignment") {
    implicit val ctx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-stream").toString
    val idx = s"$base/index"
    // build on the resident half; stream in the arrivals
    graft.queries.IvfIndex.build(emb.filter(col("vec_id") < 250), idx)
    val rest = emb.filter(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    assert(rest.nonEmpty)
    val stream = MemoryStream[(Long, Array[Float])]
    val q = graft.queries.IvfIndex.appendStream(
      stream.toDF().toDF("vec_id", "embedding"), idx, s"$base/ckpt")
    try {
      stream.addData(rest.take(100)); q.processAllAvailable()
      stream.addData(rest.drop(100)); q.processAllAvailable()
    } finally q.stop()
    val cells = graft.engine.EpochStore.read(spark, s"$idx/cells")
      .select(col("vec_id").cast("long"), col("cell").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells.size === emb.count())
    // parity: every stored cell — resident AND streamed — equals the
    // direct batch assignment under the stored codebook
    val cents = graft.queries.IvfIndex.loadCodebook(spark, idx)
    val expected = graft.queries.IvfIndex.assign(emb, cents)
      .select(col("vec_id").cast("long"), col("cell").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells === expected)
  }

  /** Relative (path, size) set of every data file under a dir. */
  private def fileSet(root: String): Set[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val rp = java.nio.file.Paths.get(root)
    val w = java.nio.file.Files.walk(rp)
    try w.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => rp.relativize(p).toString -> java.nio.file.Files.size(p))
      .toSet
    finally w.close()
  }

  test("IvfIndex epoch append: replayed batchId is a storage-level no-op") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-replay").toString
    val idx = s"$base/index"
    graft.queries.IvfIndex.build(emb.filter(col("vec_id") < 250), idx)
    val cents = graft.queries.IvfIndex.loadCodebook(spark, idx)
    val batch = emb.filter(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding"))
    graft.queries.IvfIndex.appendEpoch(batch, cents, idx, 7L)
    val once = fileSet(s"$idx/cells")
    assert(once.exists(_._1.contains("epoch=7")))
    // redelivery of the same epoch: byte-identical store, no new files
    graft.queries.IvfIndex.appendEpoch(batch, cents, idx, 7L)
    assert(fileSet(s"$idx/cells") === once)
    // a crashed stage (dead tmp) is overwritten by the retry, and the
    // final store equals the single-delivery file set
    val tmp =
      s"${graft.engine.EpochStore.liveDir(s"$idx/cells")}/.epoch-8.tmp"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/garbage.parquet"), "x")
    graft.queries.IvfIndex.appendEpoch(batch.limit(10), cents, idx, 8L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tmp)))
    assert(fileSet(s"$idx/cells").exists(_._1.contains("epoch=8")))
  }

  test("MinHashIndex epoch append: replay and mid-commit crash both converge") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft-mh-replay").toString
    val ix = s"$base/ix"
    graft.queries.MinHashIndex.build(docs.filter(col("doc_id") < 250), ix)
    val batch = docs.filter(col("doc_id") >= 250 && col("doc_id") < 300)
    graft.queries.MinHashIndex.appendEpoch(batch, ix, 3L)
    val docsOnce = fileSet(s"$ix/docs")
    val bandsOnce = fileSet(s"$ix/bands")
    graft.queries.MinHashIndex.appendEpoch(batch, ix, 3L) // replay
    assert(fileSet(s"$ix/docs") === docsOnce)
    assert(fileSet(s"$ix/bands") === bandsOnce)
    // crash between the two renames: docs committed, bands not — the
    // redelivery completes exactly the missing table
    val liveBands = graft.engine.EpochStore.liveDir(s"$ix/bands")
    graft.engine.Archive.deleteTree(
      java.nio.file.Paths.get(s"$liveBands/epoch=3"))
    graft.queries.MinHashIndex.appendEpoch(batch, ix, 3L)
    assert(fileSet(s"$ix/docs") === docsOnce)
    val healedBands = graft.engine.EpochStore.read(spark, s"$ix/bands")
      .select(col("band"), col("h"), col("doc_id"))
      .collect().map(_.toSeq).toSet
    // row-level equality for bands: part-file byte layout after a
    // heal may legitimately differ (different task split), the
    // CONTENT may not
    graft.engine.Archive.deleteTree(
      java.nio.file.Paths.get(s"$liveBands/epoch=3"))
    graft.queries.MinHashIndex.appendEpoch(batch, ix, 3L)
    assert(graft.engine.EpochStore.read(spark, s"$ix/bands")
      .select(col("band"), col("h"), col("doc_id"))
      .collect().map(_.toSeq).toSet === healedBands)
    // and the matching surface sees one copy of everything
    val m = graft.queries.MinHashIndex.matches(spark, ix,
      docs.filter(col("doc_id") >= 300 && col("doc_id") < 310))
    m.collect() // must simply run clean over the epoch-partitioned store
  }

  test("streaming quality verdicts == batch q133 rules; replayed epoch " +
      "is a no-op; compaction preserves the table") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val base = java.nio.file.Files.createTempDirectory("graft-qual-s").toString
    val store = s"$base/q"
    // resident corpus filtered at build; daily batches streamed in
    graft.queries.QualityOps.buildVerdicts(
      docs.filter(col("doc_id") < 200), store)
    val arrivals = docs.filter(col("doc_id") >= 200)
      .as[(Long, String, String)].collect().toSeq
    val stream = MemoryStream[(Long, String, String)]
    val q = graft.queries.QualityOps.verdictsStream(
      stream.toDF().toDF("doc_id", "text", "lang"), store, s"$base/ckpt")
    try {
      val (a, b) = arrivals.splitAt(arrivals.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
    } finally q.stop()
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val streamed = rows(graft.queries.QualityOps.verdicts(spark, store))
    val batch = rows(graft.queries.QualityOps.verdictsOf(docs))
    assert(batch.nonEmpty && streamed === batch)
    // replayed epoch (a committed batchId redelivered): storage no-op
    val root = s"$store/verdicts"
    val files0 = fileSet(root)
    graft.engine.EpochStore.commitEpoch(root, 0L) { tmp =>
      graft.queries.QualityOps.verdictsOf(docs.limit(5))
        .write.mode("overwrite").parquet(tmp)
    }
    assert(fileSet(root) === files0)
    // compaction folds the daily epochs; values unchanged
    graft.engine.EpochStore.compact(spark, root)
    assert(graft.engine.EpochStore.epochCount(root) === 1)
    assert(rows(graft.queries.QualityOps.verdicts(spark, store)) === batch)
  }

  test("streaming JSONL corpus append: file-sink shards equal the batch archive content") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    // the streaming ingest shape for a training corpus: micro-batches
    // append gzip JSONL shards exactly-once (file sink + checkpoint
    // manifest), and a batch reader over the shard directory sees
    // precisely the union of all batches
    val base = java.nio.file.Files.createTempDirectory("graft-sjsonl").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val stream = MemoryStream[(Long, String, String, String, Long)]
    val sdf = stream.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = sdf.writeStream.format("json")
      .option("compression", "gzip")
      .option("path", s"$base/corpus")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    try {
      stream.addData(docs.take(200)); q.processAllAvailable()
      stream.addData(docs.drop(200)); q.processAllAvailable()
    } finally q.stop()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    val back = graft.engine.Archive.readJsonl(spark, s"$base/corpus", schema)
    assert(back.count() === docs.length.toLong)
    assert(back.select("doc_id", "text").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet ===
      docs.map(d => (d._1, d._2)).toSet)
  }

  test("stream-stream interval join == batch attribution join (q44 logic)") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    // events WITH ids for deterministic pair identity
    val evRows = Sources.Tables(spark, "/root/testdata/sf0.001").events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val views = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val purchases = MemoryStream[(Long, Timestamp, Long, String, Double)]
    def frame(s: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
      s.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.attributionJoin(frame(views), frame(purchases))
      .writeStream.format("memory").queryName("s_attr").outputMode("append")
      .start()
    try {
      // split purchases CHRONOLOGICALLY: stream-stream state honors the
      // watermark, so data arriving later than the watermark allows is
      // (correctly) dropped — an arbitrary split would test that drop,
      // not the join
      val ps = evRows.filter(_._4 == "purchase").sortBy(_._2.getTime)
      val (a, b) = ps.splitAt(ps.size / 2)
      views.addData(evRows.filter(_._4 == "view"))
      purchases.addData(a); q.processAllAvailable()
      purchases.addData(b); q.processAllAvailable()
      val got = spark.table("s_attr")
        .select(col("view_id"), col("purchase_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val evDf = evRows.toDF("event_id", "ts", "user_id", "event_type", "value")
      val want = EventStream.attributionJoin(
          evDf.filter(col("event_type") === "view"),
          evDf.filter(col("event_type") === "purchase"))
        .select(col("view_id"), col("purchase_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty && got === want)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the directory source and equals batch") {
    // the streaming file source requires a DIRECTORY; stage the fixture
    // file into one
    val dir = java.nio.file.Files.createTempDirectory("availnow").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    // same ts normalization the batch Tables.events applies
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sdf = Sources.normalizeEventTs(EventStream.readEvents(spark, dir))
    val q = EventStream.tumblingAgg(sdf)
      .writeStream.format("memory").queryName("s_avail")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) // AvailableNow terminates after draining
    val got = collectSet(spark.table("s_avail"))
    val want = collectSet(EventStream.tumblingAgg(
      Sources.Tables(spark, "/root/testdata/sf0.001").events))
    assert(want.nonEmpty && got === want)
  }
}
