package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{EpochStore, Maintenance}
import graft.queries.{CalibrationStore, ChunkIndex, ContainmentStore,
  IvfIndex, MinHashIndex, MultimodalOps, NearDupOps, PHashIndex,
  QualityOps, Similarity, VerdictStore}
import graft.streaming.CrawlPipeline

/** The one-pipeline daily crawl ([[CrawlPipeline]]) — the capstone
  * composition: one streaming ingest appends ALL EIGHT stores per
  * micro-batch under a single [[Maintenance.onEpochCadence]] wrapper
  * and serves the q160 manifest between batches. Under test, on the
  * driver's fixture corpus:
  *
  *   - streamed days == a one-batch build over the union, across
  *     every store's READ surface (resolved verdicts, served
  *     calibration, probe answers, exhaustive ANN, the manifest);
  *   - the manifest served MID-STREAM (between two days) equals
  *     q146's full recompute over exactly the ingested corpus;
  *   - the composed tick fires on the stream's epoch cadence and
  *     reports all eight stores with no divergence;
  *   - a crash mid-day (a committed prefix of stores plus one
  *     intra-store half-commit) heals on redelivery of the same day:
  *     committed appends no-op, the dangling one completes, and every
  *     surface equals a crash-free deployment's.
  */
class CrawlPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).resolve("dep").toString

  private lazy val docsAll = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
  private lazy val embAll = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def docsSlice(lo: Long, hi: Long): DataFrame =
    docsAll.filter(col("doc_id") >= lo && col("doc_id") < hi)
  private def embSlice(lo: Long, hi: Long): DataFrame =
    embAll.filter(col("vec_id") >= lo && col("vec_id") < hi)

  /** One crawl day as the pipeline's input row shape: docs with their
    * embeddings riding along (vec id = doc id, the fixtures' shared
    * id space).
    */
  private def crawlDf(lo: Long, hi: Long): DataFrame =
    docsSlice(lo, hi)
      .join(embAll, col("doc_id") === col("vec_id"), "left")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
        col("embedding"))

  private def crawlRows(lo: Long, hi: Long)
      : Seq[(Long, String, String, Long, Seq[Float])] =
    crawlDf(lo, hi).as[(Long, String, String, Long, Seq[Float])]
      .collect().sortBy(_._1).toSeq

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  /** Every store's READ surface, canonicalized — the cross-deployment
    * equality unit. Probes are fixed seed-corpus slices so streamed
    * and one-batch deployments answer the same questions.
    */
  private def storeReads(
      roots: CrawlPipeline.StoreRoots): Map[String, Seq[Seq[Any]]] = {
    val probeDocs = docsSlice(0, 60).select(col("doc_id"), col("text"))
    val probeEmb = embAll.filter(col("vec_id") % 25 === 0 &&
        col("vec_id") < 120)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    Map(
      "verdicts" -> canon(VerdictStore.read(spark, roots.verdicts)),
      "containment" -> canon(ContainmentStore.read(spark, roots.containment)),
      "calibration" -> canon(CalibrationStore.served(spark, roots.calibration)),
      "minhash_probe" -> canon(MinHashIndex.matches(spark, roots.minhash,
        probeDocs)),
      "chunks" -> canon(EpochStore.read(spark, s"${roots.chunks}/chunks")
        .drop("epoch")),
      "phash_hashes" -> canon(PHashIndex.hashes(spark, roots.phash)),
      "phash_probe" -> canon(PHashIndex.matches(spark, roots.phash,
        MultimodalOps.phashFingerprints(probeDocs
          .withColumnRenamed("text", "text")))),
      // nprobe = k is exhaustive, so the ANN answers are codebook-
      // independent — the read-surface equality that survives the two
      // deployments training different codebooks
      "ivf_exhaustive" -> canon(IvfIndex.query(spark, roots.ivf, probeEmb,
        nprobe = Similarity.IvfCells, topK = 5)),
      "manifest" -> canon(CrawlPipeline.manifest(spark, roots)))
  }

  private def dv(verdicts: DataFrame): DataFrame =
    verdicts.select(col("doc_id"), col("verdict").as("d_v"))
  private def ctv(verdicts: DataFrame): DataFrame =
    verdicts.filter(col("is_kept") === 0)
      .select(col("doc_id"), lit(1).as("ct"))

  test("streamed days == one-batch build across all eight stores; the " +
      "mid-stream manifest == q146's recompute; the tick fires on cadence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rootsA = CrawlPipeline.build(
      docsSlice(0, 120), embSlice(0, 120), tmp("crawl-a"))
    val stream = MemoryStream[(Long, String, String, Long, Seq[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("crawl-ck").toString
    var reports = Vector.empty[Maintenance.Report]
    val q = CrawlPipeline.ingest(
      stream.toDF().toDF("doc_id", "text", "lang", "n_chars", "embedding"),
      rootsA, ckpt, everyN = 2, onReport = r => reports :+= r)
    try {
      // day 1
      stream.addData(crawlRows(120, 160)); q.processAllAvailable()

      // the manifest served BETWEEN batches == q146's full recompute
      // over exactly the corpus ingested so far
      val u1 = docsSlice(0, 160)
      val got1 = canon(CrawlPipeline.manifest(spark, rootsA))
      val want1 = canon(QualityOps.manifestFrom(
        QualityOps.manifestStateOn(u1, embSlice(0, 160)),
        dv(NearDupOps.dedupVerdictsOn(u1)),
        ctv(NearDupOps.containmentVerdictsOn(NearDupOps.containmentOn(u1)))))
      assert(got1.nonEmpty && got1 === want1,
        "the mid-stream manifest must equal the full recompute")

      // day 2
      stream.addData(crawlRows(160, 200)); q.processAllAvailable()
    } finally q.stop()

    // the composed tick fired once (everyN = 2 over two days), saw
    // all eight stores, and found no divergence (in-cadence ticks run
    // strictly between appends — never a half-commit); data-shape
    // cues (IVF skew under a stale codebook) are legitimate outputs,
    // not failures
    assert(reports.length === 1,
      s"everyN=2 over 2 days must tick once, got ${reports.length}")
    val r = reports.head
    assert(r.ivf.isDefined && r.minhash.isDefined && r.chunks.isDefined &&
      r.verdicts.isDefined && r.containment.isDefined &&
      r.manifest.isDefined && r.calibration.isDefined && r.phash.isDefined,
      "the tick must census all eight stores")
    assert(!r.alerts.exists(_.endsWith("_diverged")),
      s"in-cadence tick saw a half-commit: ${r.alerts}")

    // one-batch deployment over the union: every read surface equal
    val rootsC = CrawlPipeline.build(
      docsSlice(0, 200), embSlice(0, 200), tmp("crawl-c"))
    val a = storeReads(rootsA)
    val c = storeReads(rootsC)
    for (k <- a.keys) {
      assert(a(k).nonEmpty, s"store surface $k must not be empty")
      assert(a(k) === c(k), s"store surface $k diverged from the " +
        "one-batch build")
    }
    spark.catalog.clearCache()
  }

  test("a crash mid-day heals on redelivery: the committed prefix " +
      "no-ops, the half-committed store completes, every surface " +
      "converges to the crash-free deployment's") {
    val day1 = crawlDf(120, 160).localCheckpoint(true)
    val day1Docs = day1.select(col("doc_id"), col("text"), col("lang"),
      col("n_chars"))

    // the crashed deployment: three stores fully committed for epoch
    // 0 (the body died after them), plus calibration caught INSIDE
    // its two-table append (scores committed, hist missing)
    val rootsB = CrawlPipeline.build(
      docsSlice(0, 120), embSlice(0, 120), tmp("crawl-b"))
    MinHashIndex.appendEpoch(day1Docs.select(col("doc_id"), col("text")),
      rootsB.minhash, 0L)
    ChunkIndex.appendEpoch(day1Docs.select(col("doc_id"), col("text")),
      rootsB.chunks, 0L)
    VerdictStore.appendEpoch(day1Docs, rootsB.verdicts, 0L)
    EpochStore.commitEpoch(s"${rootsB.calibration}/scores", 0L) { tmpDir =>
      CalibrationStore.scoreRelation(day1Docs)
        .write.mode("overwrite").parquet(tmpDir)
    }

    // redelivery of the same day through the pipeline body
    CrawlPipeline.appendDay(rootsB, day1, 0L)

    // the crash-free deployment of the same two days of history
    val rootsD = CrawlPipeline.build(
      docsSlice(0, 120), embSlice(0, 120), tmp("crawl-d"))
    CrawlPipeline.appendDay(rootsD, day1, 0L)

    val b = storeReads(rootsB)
    val d = storeReads(rootsD)
    for (k <- b.keys)
      assert(b(k) === d(k), s"store surface $k did not heal")
    // and a SECOND redelivery is a storage-level no-op everywhere
    CrawlPipeline.appendDay(rootsB, day1, 0L)
    for ((k, v) <- storeReads(rootsB))
      assert(v === d(k), s"replay disturbed store surface $k")
    spark.catalog.clearCache()
  }

  test("the stream lineage survives a restart: a new query on the same " +
      "checkpoint continues batch ids, replays nothing, and every " +
      "surface equals the no-restart reference") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rootsE = CrawlPipeline.build(
      docsSlice(0, 120), embSlice(0, 120), tmp("crawl-e"))
    val stream = MemoryStream[(Long, String, String, Long, Seq[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("crawl-rck").toString
    def start() = CrawlPipeline.ingest(
      stream.toDF().toDF("doc_id", "text", "lang", "n_chars", "embedding"),
      rootsE, ckpt)
    val q1 = start()
    try {
      stream.addData(crawlRows(120, 160)); q1.processAllAvailable()
    } finally q1.stop()
    // restart: a NEW StreamingQuery on the SAME checkpoint — the one
    // stream lineage that owns this deployment, resumed
    val q2 = start()
    try {
      stream.addData(crawlRows(160, 200)); q2.processAllAvailable()
    } finally q2.stop()

    // batch ids CONTINUED across the restart (a fresh-checkpoint
    // restart would reissue id 0, which the stores would no-op as a
    // replay — silently dropping the day)
    assert(EpochStore.committedIds(s"${rootsE.minhash}/docs")
      === Set(0L, 1L),
      "the restarted query must continue the epoch sequence")

    // every surface equals the same two days appended with no restart
    val rootsF = CrawlPipeline.build(
      docsSlice(0, 120), embSlice(0, 120), tmp("crawl-f"))
    CrawlPipeline.appendDay(rootsF, crawlDf(120, 160), 0L)
    CrawlPipeline.appendDay(rootsF, crawlDf(160, 200), 1L)
    val e = storeReads(rootsE)
    val f = storeReads(rootsF)
    for (k <- e.keys)
      assert(e(k) === f(k), s"store surface $k diverged across the restart")
    spark.catalog.clearCache()
  }

  test("an out-of-band codebook rebuild mid-stream fails the next " +
      "append loudly; the fingerprint pin survives compaction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val roots = CrawlPipeline.build(
      docsSlice(0, 120), embSlice(0, 120), tmp("crawl-oob"))
    // maintenance compaction copies the codebook sidecar into the
    // next version byte-identically — the stream's pin must NOT trip
    // on the deployment's own housekeeping
    val fp0 = IvfIndex.codebookFingerprint(roots.ivf)
    IvfIndex.compact(spark, roots.ivf)
    assert(IvfIndex.codebookFingerprint(roots.ivf) === fp0,
      "compaction must not change the codebook fingerprint")

    val stream = MemoryStream[(Long, String, String, Long, Seq[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("crawl-oob-ck").toString
    val q = CrawlPipeline.ingest(
      stream.toDF().toDF("doc_id", "text", "lang", "n_chars", "embedding"),
      roots, ckpt, everyN = 100) // no tick: isolate the out-of-band case
    try {
      stream.addData(crawlRows(120, 160)); q.processAllAvailable()

      // violate the single-maintenance-writer contract: rebuild the
      // index (new codebook trained over a different corpus) while
      // the stream holds its stream-start pin
      IvfIndex.build(embSlice(0, 160), roots.ivf)
      stream.addData(crawlRows(160, 200))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c =>
          c.isInstanceOf[IllegalStateException] &&
            c.getMessage.contains("changed outside this stream")),
        s"expected the loud codebook-drift error, got: $ex")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("takedowns ride the crawl stream: interleaved days and forget " +
      "rows through one checkpoint, exactly once; the cadence tick is " +
      "the purge point; taken-down content returns under a fresh id") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val roots = CrawlPipeline.build(
      docsSlice(0, 120), embSlice(0, 120), tmp("crawl-t"))
    val stream = MemoryStream[(Long, String, String, Long, Seq[Float], Boolean)]
    val ckpt = java.nio.file.Files.createTempDirectory("crawl-tck").toString
    val q = CrawlPipeline.ingest(
      stream.toDF().toDF("doc_id", "text", "lang", "n_chars",
        "embedding", "tombstone"),
      roots, ckpt, everyN = 1)
    def docRows(lo: Long, hi: Long) =
      crawlRows(lo, hi).map(r => (r._1, r._2, r._3, r._4, r._5, false))
    try {
      // day 1: plain crawl
      stream.addData(docRows(120, 160)); q.processAllAvailable()
      // day 2: MIXED — new docs plus takedowns of a seed doc (30) and
      // a day-1 BENCH doc (150, the eval-side decrement in-stream);
      // the everyN=1 tick after the day is the purge point
      stream.addData(docRows(160, 180) ++ Seq(
        (30L, null: String, null: String, 0L, null: Seq[Float], true),
        (150L, null: String, null: String, 0L, null: Seq[Float], true)))
      q.processAllAvailable()
      // the tick after day 2 is the purge point: tombstones cleared
      for (pp <- Seq(roots.verdicts, roots.containment, roots.manifest,
          roots.calibration))
        assert(!graft.engine.Tombstones.pending(spark, pp),
          s"the cadence tick must purge tombstones at $pp")
      // day 3: more docs PLUS the taken-down content RE-CRAWLED under
      // a FRESH id (crawl ids are never reused — VerdictStore's
      // monotonic-ingest contract; the takedown applied to the old
      // snapshot, this is a new document)
      val re = crawlRows(150, 151).map(r =>
        (201L, r._2, r._3, r._4, r._5, false))
      stream.addData(docRows(180, 200) ++ re)
      q.processAllAvailable()
    } finally q.stop()
    // expected: a one-batch deployment over the final logical corpus —
    // everything minus the takedowns (30, 150), plus the re-crawl's
    // fresh-id row carrying 150's content
    val reDocs = docsSlice(150, 151).select(lit(201L).as("doc_id"),
      col("text"), col("lang"), col("n_chars"))
    val reEmb = embSlice(150, 151).select(lit(201L).as("vec_id"),
      col("embedding"))
    val rootsN = CrawlPipeline.build(
      docsSlice(0, 200).filter(!col("doc_id").isin(30L, 150L))
        .unionByName(reDocs),
      embSlice(0, 200).filter(!col("vec_id").isin(30L, 150L))
        .unionByName(reEmb), tmp("crawl-tn"))
    val f = storeReads(roots); val n = storeReads(rootsN)
    for (k <- f.keys) {
      assert(f(k).nonEmpty, s"store surface $k must not be empty")
      assert(f(k) === n(k),
        s"store surface $k diverged from the expected deployment")
    }
    val man = canon(CrawlPipeline.manifest(spark, roots))
    assert(man.exists(_.head == 201L), "the re-crawl must be present")
    assert(!man.exists(r => r.head == 30L || r.head == 150L),
      "the takedowns must stay down")
    spark.catalog.clearCache()
  }

  test("a crash AFTER the day's forget redelivers the whole day: the " +
      "committed appends no-op past their own same-day tombstones " +
      "instead of wedging on the re-ingest guard") {
    val roots = CrawlPipeline.build(
      docsSlice(0, 120), embSlice(0, 120), tmp("crawl-rf"))
    // a day that both crawls id 130 and takes it down — append THEN
    // forget, the ordering ingestDay guarantees
    val day = crawlDf(120, 160).localCheckpoint(true)
    CrawlPipeline.appendDay(roots, day, 0L)
    CrawlPipeline.forget(roots, spark.range(130, 131)
      .select(col("id").as("doc_id")))
    // crash BEFORE the checkpoint commit: the engine redelivers the
    // whole day — every store's appendEpoch now sees id 130
    // tombstoned-awaiting-purge and must converge on its committed
    // epoch (full-replay no-op) rather than throw the re-ingest
    // guard and wedge the stream permanently (the purge tick only
    // fires after a COMPLETED batch)
    CrawlPipeline.appendDay(roots, day, 0L)
    CrawlPipeline.forget(roots, spark.range(130, 131)
      .select(col("id").as("doc_id")))
    // and the surfaces equal a never-ingested-130 deployment
    // (pre-purge merge-on-read equality — the ForgetSpec contract)
    val rootsN = CrawlPipeline.build(
      docsSlice(0, 160).filter(col("doc_id") =!= 130L),
      embSlice(0, 160).filter(col("vec_id") =!= 130L), tmp("crawl-rfn"))
    val g = storeReads(roots); val n = storeReads(rootsN)
    // pre-purge: every VIEW surface equal (the raw chunks table still
    // holds tombstoned rows by design — merge-on-read)
    for (k <- g.keys if k != "chunks") {
      assert(g(k).nonEmpty, s"store surface $k must not be empty")
      assert(g(k) === n(k),
        s"store surface $k diverged after the day's redelivery")
    }
    // the purge (the tick's compaction) erases the raw rows too
    ChunkIndex.compact(spark, roots.chunks)
    assert(canon(EpochStore.read(spark, s"${roots.chunks}/chunks")
        .drop("epoch")) === n("chunks"),
      "store surface chunks diverged after the purge")
    spark.catalog.clearCache()
  }

  test("a takedown STREAM survives a restart: takedown days before and " +
      "after a query restart on one checkpoint, surfaces equal the " +
      "no-restart deployment") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val roots = CrawlPipeline.build(
      docsSlice(0, 120), embSlice(0, 120), tmp("crawl-tr"))
    val stream = MemoryStream[(Long, String, String, Long, Seq[Float], Boolean)]
    val ckpt = java.nio.file.Files.createTempDirectory("crawl-trck").toString
    def start() = CrawlPipeline.ingest(
      stream.toDF().toDF("doc_id", "text", "lang", "n_chars",
        "embedding", "tombstone"),
      roots, ckpt, everyN = 1)
    def docRows(lo: Long, hi: Long) =
      crawlRows(lo, hi).map(r => (r._1, r._2, r._3, r._4, r._5, false))
    def takedown(id: Long) =
      (id, null: String, null: String, 0L, null: Seq[Float], true)
    val q1 = start()
    try {
      // day 1: crawl + a resident takedown through the same frame
      stream.addData(docRows(120, 160) :+ takedown(30L))
      q1.processAllAvailable()
    } finally q1.stop() // the restart: kill the query mid-lineage
    val q2 = start()
    try {
      // day 2 (post-restart): more crawl + a day-1 doc taken down
      stream.addData(docRows(160, 200) :+ takedown(150L))
      q2.processAllAvailable()
    } finally q2.stop()
    // expected: the same two days through one uninterrupted stream
    val rootsN = CrawlPipeline.build(
      docsSlice(0, 120), embSlice(0, 120), tmp("crawl-trn"))
    val streamN = MemoryStream[(Long, String, String, Long, Seq[Float], Boolean)]
    val ckptN = java.nio.file.Files.createTempDirectory("crawl-trnck").toString
    val qN = CrawlPipeline.ingest(
      streamN.toDF().toDF("doc_id", "text", "lang", "n_chars",
        "embedding", "tombstone"),
      rootsN, ckptN, everyN = 1)
    try {
      streamN.addData(docRows(120, 160) :+ takedown(30L))
      qN.processAllAvailable()
      streamN.addData(docRows(160, 200) :+ takedown(150L))
      qN.processAllAvailable()
    } finally qN.stop()
    val g = storeReads(roots); val n = storeReads(rootsN)
    for (k <- g.keys) {
      assert(g(k).nonEmpty, s"store surface $k must not be empty")
      assert(g(k) === n(k),
        s"store surface $k diverged across the takedown-stream restart")
    }
    spark.catalog.clearCache()
  }

  test("a takedown day under repeated kills: crashes after a PREFIX of " +
      "the appends, and after a PREFIX of the forgets, all converge on " +
      "redelivery of the whole day") {
    import spark.implicits._
    val day = crawlDf(120, 160).localCheckpoint(true)
    val dayDocs = day.select(col("doc_id"), col("text"), col("lang"),
      col("n_chars"))
    val fids = Seq(130L, 30L).toDF("doc_id").localCheckpoint(true)
    val fids2 = Seq(45L).toDF("doc_id").localCheckpoint(true)
    // the expected deployment: never ingested 130 (same-day takedown)
    // nor 30/45 (resident takedowns), day 120-160 otherwise present
    val rootsN = CrawlPipeline.build(
      docsSlice(0, 120).filter(!col("doc_id").isin(30L, 45L)),
      embSlice(0, 120).filter(!col("vec_id").isin(30L, 45L)),
      tmp("crawl-kn"))
    CrawlPipeline.appendDay(rootsN,
      day.filter(col("doc_id") =!= 130L), 0L)
    val expect = storeReads(rootsN)

    // kill point 1: crash after TWO of the eight appends committed
    val rootsK = CrawlPipeline.build(
      docsSlice(0, 120), embSlice(0, 120), tmp("crawl-k"))
    MinHashIndex.appendEpoch(dayDocs.select(col("doc_id"), col("text")),
      rootsK.minhash, 0L)
    ChunkIndex.appendEpoch(dayDocs.select(col("doc_id"), col("text")),
      rootsK.chunks, 0L)
    // full-day redelivery converges (appends no-op / complete,
    // forgets land) ...
    CrawlPipeline.appendDay(rootsK, day, 0L)
    CrawlPipeline.forget(rootsK, fids)
    // kill point 2: a SECOND takedown crashes after a PREFIX of the
    // composed forget — three stores tombstoned, five not — then the
    // whole day redelivers: the day append must no-op past every
    // tombstone state, the composed forget must converge on stores
    // that already hold fids2 AND land it on the five that don't
    MinHashIndex.forget(spark, rootsK.minhash, fids2)
    ChunkIndex.forget(spark, rootsK.chunks, fids2)
    VerdictStore.forget(spark, rootsK.verdicts, fids2)
    CrawlPipeline.appendDay(rootsK, day, 0L)
    CrawlPipeline.forget(rootsK, fids2)
    // a full replay of BOTH days' worth of operations is a no-op
    CrawlPipeline.appendDay(rootsK, day, 0L)
    CrawlPipeline.forget(rootsK, fids)
    CrawlPipeline.forget(rootsK, fids2)
    val got = storeReads(rootsK)
    for (k <- got.keys if k != "chunks")
      assert(got(k) === expect(k),
        s"store surface $k diverged after the killed takedown day")
    ChunkIndex.compact(spark, rootsK.chunks)
    ChunkIndex.compact(spark, rootsN.chunks)
    assert(canon(EpochStore.read(spark, s"${rootsK.chunks}/chunks")
        .drop("epoch")) ===
      canon(EpochStore.read(spark, s"${rootsN.chunks}/chunks")
        .drop("epoch")),
      "store surface chunks diverged after the purge")
    spark.catalog.clearCache()
  }

  test("CrawlPipeline.forget: one composed takedown — every store's " +
      "read surface equals the never-ingested deployment, before AND " +
      "after the purge; the served manifest drops the forgotten docs") {
    val FS = Seq(100L, 150L, 7L, 33L) // two bench/eval ids + two train
    val rootsF = CrawlPipeline.build(
      docsSlice(0, 160), embSlice(0, 160), tmp("crawl-f"))
    val pre = canon(CrawlPipeline.manifest(spark, rootsF))
    assert(pre.exists(r => FS.contains(r.head.asInstanceOf[Long])),
      "forgotten docs must be in the manifest BEFORE the takedown")
    CrawlPipeline.forget(rootsF, FS.toDF("doc_id"))
    val rootsN = CrawlPipeline.build(
      docsSlice(0, 160).filter(!col("doc_id").isin(FS: _*)),
      embSlice(0, 160).filter(!col("vec_id").isin(FS: _*)), tmp("crawl-n"))
    val f1 = storeReads(rootsF); val n1 = storeReads(rootsN)
    // pre-purge: every VIEW surface equal (the raw chunks table still
    // holds tombstoned rows by design — merge-on-read)
    for (k <- f1.keys if k != "chunks") {
      assert(f1(k).nonEmpty, s"store surface $k must not be empty")
      assert(f1(k) === n1(k),
        s"store surface $k diverged from never-ingested after forget")
    }
    assert(canon(CrawlPipeline.manifest(spark, rootsF))
      .forall(r => !FS.contains(r.head.asInstanceOf[Long])),
      "forgotten docs must vanish from the served manifest")
    // the compressed ANN tier serves from the same deployment: cell-
    // pruned 6-byte ADC scan, takedown excluded
    val annProbe = embAll.filter(col("vec_id") % 25 === 0 &&
        col("vec_id") < 120)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val ann = CrawlPipeline.ann(spark, rootsF, annProbe)
    assert(ann.count() > 0, "the IVF-PQ tier must serve the deployment")
    assert(ann.filter(col("neighbor_id").isin(FS: _*)).count() === 0L,
      "the served ANN answers must exclude the takedown")
    assert(ann.queryExecution.executedPlan.toString
      .contains("dynamicpruning"),
      "the deployment's ADC scan must stay cell-pruned")
    // the composed purge: every store compacts, tombstones clear,
    // and now even the RAW chunk rows are gone
    IvfIndex.compact(spark, rootsF.ivf)
    MinHashIndex.compact(spark, rootsF.minhash)
    ChunkIndex.compact(spark, rootsF.chunks)
    VerdictStore.compact(spark, rootsF.verdicts)
    ContainmentStore.compact(spark, rootsF.containment)
    CalibrationStore.compact(spark, rootsF.calibration)
    PHashIndex.compact(spark, rootsF.phash)
    graft.queries.ManifestStore.compact(spark, rootsF.manifest)
    for (p <- Seq(rootsF.ivf, rootsF.minhash, rootsF.chunks,
        rootsF.verdicts, rootsF.containment, rootsF.calibration,
        rootsF.phash, rootsF.manifest))
      assert(!graft.engine.Tombstones.pending(spark, p),
        s"tombstones must clear at $p")
    val f2 = storeReads(rootsF)
    for (k <- f2.keys)
      assert(f2(k) === n1(k), s"store surface $k diverged post-purge")
    spark.catalog.clearCache()
  }
}
