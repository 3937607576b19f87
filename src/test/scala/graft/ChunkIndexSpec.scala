package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.ChunkIndex

/** The persisted content-defined-chunk store: build/append/stream
  * parity and the epoch exactly-once contract (the IvfIndex/
  * MinHashIndex storage conventions applied to the chunk relation).
  */
class ChunkIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
    df.select(col("doc_id").cast("long"), col("chunk_id").cast("int"),
        col("chunk_str"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

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

  test("build + epoch append == build over the union, row-identical") {
    val base = java.nio.file.Files.createTempDirectory("chunkix").toString
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)

    ChunkIndex.build(corpus, s"$base/incr")
    ChunkIndex.appendEpoch(batch, s"$base/incr", 1L)
    ChunkIndex.build(docs, s"$base/full")

    assert(rowsOf(ChunkIndex.chunks(spark, s"$base/incr")) ===
      rowsOf(ChunkIndex.chunks(spark, s"$base/full")))
  }

  test("appendStream == batch chunking; replayed epoch is a no-op") {
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("chunkix-s").toString
    val idx = s"$base/ix"
    ChunkIndex.build(docs.filter(col("doc_id") < 400), idx)

    val arrivals = docs.filter(col("doc_id") >= 400)
      .as[(Long, String)].collect().toSeq
    assert(arrivals.nonEmpty)
    val stream = MemoryStream[(Long, String)]
    val q = ChunkIndex.appendStream(
      stream.toDF().toDF("doc_id", "text"), idx, s"$base/ckpt")
    try {
      stream.addData(arrivals.take(30)); q.processAllAvailable()
      stream.addData(arrivals.drop(30)); q.processAllAvailable()
    } finally q.stop()

    assert(rowsOf(ChunkIndex.chunks(spark, idx)) ===
      rowsOf(graft.queries.QualityOps.chunkRelationOf(docs)))

    // redelivery of a committed epoch: byte-identical store
    val once = fileSet(s"$idx/chunks")
    ChunkIndex.appendEpoch(docs.filter(col("doc_id") >= 400).limit(10), idx, 0L)
    assert(fileSet(s"$idx/chunks") === once)
    // crash mid-stage (stale tmp left behind) is overwritten by retry
    val tmp =
      s"${graft.engine.EpochStore.liveDir(s"$idx/chunks")}/.epoch-9.tmp"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/garbage"), "x")
    ChunkIndex.appendEpoch(docs.filter(col("doc_id") === 1), idx, 9L)
    assert(fileSet(s"$idx/chunks").exists(_._1.contains("epoch=9")))
  }

  test("maintain(): healthy tick is a pure-read no-op; fragmented folds; " +
      "census fields reconcile with the stored relation") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("ck-maint").toString
    val idx = s"$base/ix"
    ChunkIndex.build(docs.filter(col("doc_id") < 300), idx)
    ChunkIndex.appendEpoch(docs.filter(
      col("doc_id") >= 300 && col("doc_id") < 350), idx, 1L)

    val r0 = ChunkIndex.maintain(spark, idx)
    assert(!r0.compacted && r0.epochs === 2)
    val rel = ChunkIndex.chunks(spark, idx)
    assert(r0.nDocs === rel.select(col("doc_id")).distinct().count())
    assert(r0.nChunks === rel.count())
    assert(r0.nDistinctChunks ===
      rel.select(col("chunk_str")).distinct().count())
    // duplicated-occurrence fraction reconciles with the freq index
    val dup = ChunkIndex.freq(spark, idx)
      .agg(sum(when(col("n_copies") > 1, col("n_copies")).otherwise(0L))
        .cast("double").as("d"), sum(col("n_copies")).cast("double").as("n"))
      .head()
    assert(math.abs(r0.dupOccurrenceFrac - dup.getDouble(0) / dup.getDouble(1))
      < 1e-12)

    // past the bound: folds to one base, census unchanged
    val r1 = ChunkIndex.maintain(spark, idx, maxEpochs = 1)
    assert(r1.compacted && r1.epochs === 1)
    assert(r1.nDocs === r0.nDocs && r1.nChunks === r0.nChunks &&
      r1.nDistinctChunks === r0.nDistinctChunks &&
      r1.dupOccurrenceFrac === r0.dupOccurrenceFrac)
    spark.catalog.clearCache()
  }

  test("compaction folds epochs into one base: values identical, " +
      "readers live through the flip, replays still no-ops") {
    import graft.engine.EpochStore
    val base = java.nio.file.Files.createTempDirectory("chunkix-c").toString
    val idx = s"$base/ix"
    ChunkIndex.build(docs.filter(col("doc_id") < 300), idx)
    ChunkIndex.appendEpoch(docs.filter(
      col("doc_id") >= 300 && col("doc_id") < 400), idx, 1L)
    ChunkIndex.appendEpoch(docs.filter(col("doc_id") >= 400), idx, 2L)
    val root = s"$idx/chunks"
    assert(EpochStore.epochCount(root) === 3)
    val before = rowsOf(ChunkIndex.chunks(spark, idx))

    // a reader thread hammering the store across repeated compactions
    // must never observe an error or a wrong count (the manifest-flip
    // guarantee, racing the maintenance writer)
    val expectedN = before.size.toLong
    @volatile var readerErr: Option[Throwable] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop && readerErr.isEmpty) {
        try {
          val n = ChunkIndex.chunks(spark, idx).count()
          if (n != expectedN)
            readerErr = Some(new AssertionError(s"reader saw $n rows"))
        } catch { case e: Throwable => readerErr = Some(e) }
      }
    })
    reader.start()
    try {
      ChunkIndex.compact(spark, idx)
      ChunkIndex.compact(spark, idx) // idempotent re-compact
    } finally { stop = true; reader.join(30000) }
    readerErr.foreach(throw _)

    assert(EpochStore.epochCount(root) === 1)
    // N appends + compact == one build, row-identical
    assert(rowsOf(ChunkIndex.chunks(spark, idx)) === before)
    val full = java.nio.file.Files.createTempDirectory("chunkix-f").toString
    ChunkIndex.build(docs, s"$full/ix")
    assert(rowsOf(ChunkIndex.chunks(spark, idx)) ===
      rowsOf(ChunkIndex.chunks(spark, s"$full/ix")))
    // a batchId folded into the base is STILL a replay no-op
    val files = fileSet(root)
    ChunkIndex.appendEpoch(docs.filter(col("doc_id") >= 400), idx, 2L)
    assert(fileSet(root) === files)
    // a genuinely new epoch still appends
    assert(!EpochStore.committed(root, 5L))
    ChunkIndex.appendEpoch(docs.filter(col("doc_id") === 2), idx, 5L)
    assert(EpochStore.epochCount(root) === 2)
  }
}
