package graft

import org.apache.spark.sql.functions._

import graft.engine.EpochStore
import graft.queries.{NearDupOps, VerdictStore}

/** The persisted dedup verdict store (build / append / appendStream /
  * compact / maintain): last-write-wins delta epochs over the q152
  * incremental path. Under test:
  *
  *   - build + appends == the from-scratch composed verdict pass over
  *     the union corpus, including the resident-cluster MERGE case;
  *   - appends never read resident text (they run off the stored
  *     signature relation);
  *   - the exactly-once epoch contract: replay no-op, crash between
  *     the two table commits completed by redelivery;
  *   - compaction folds to the resolved table (GC of superseded
  *     rows) with reads unchanged and the ledger intact;
  *   - maintain reports divergence instead of burying it.
  */
class VerdictStoreSpec extends SparkSpec {

  private def fixtureDocs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("vs").toString

  private def mk(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("verdict"), col("canonical_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toList

  test("build + two appends == from-scratch verdicts over the union; " +
      "a bridge batch merges resident clusters through the store") {
    val path = tmp("vs-merge")
    val old = mk(Seq(
      10L -> "alpha beta gamma delta epsilon zeta",
      11L -> "alpha beta gamma delta epsilon eta",
      20L -> "one two three four five six",
      21L -> "one two three four five seven",
      30L -> "red green blue yellow purple orange",
      40L -> "lorem ipsum dolor sit amet consectetur",
      41L -> "lorem ipsum dolor sit amet consectetur"))
    val batch1 = mk(Seq(
      100L -> "alpha beta gamma delta one two three four", // bridge
      101L -> "lorem ipsum dolor sit amet consectetur",    // exact probe
      102L -> "completely different words here entirely novel"))
    val batch2 = mk(Seq(
      200L -> "red green blue yellow purple magenta",      // joins 30
      201L -> "completely different words here entirely new")) // joins 102? no: one token differs
    VerdictStore.build(old, path)
    VerdictStore.append(batch1, path)
    VerdictStore.append(batch2, path)
    val got = rowsOf(VerdictStore.read(spark, path))
    val full = rowsOf(NearDupOps.dedupVerdictsOn(
      old.unionByName(batch1).unionByName(batch2)))
    assert(got === full)
    // the merge actually happened: B's members re-point at A's min
    assert(got.contains((20L, "near", 10L)) &&
      got.contains((21L, "near", 10L)) && got.contains((100L, "near", 10L)))
    assert(got.contains((101L, "exact", 40L)))
    assert(got.contains((200L, "near", 30L)))
    spark.catalog.clearCache()
  }

  test("an append violating the monotonic-ingest contract fails loudly " +
      "and commits nothing") {
    val path = tmp("vs-monotonic")
    val old = mk(Seq(
      10L -> "alpha beta gamma delta epsilon zeta",
      20L -> "one two three four five six"))
    VerdictStore.build(old, path)
    // a re-ingested resident id AND an id below the resident max both
    // violate the contract the incremental exactness rests on
    val bad = mk(Seq(15L -> "between the resident ids entirely new"))
    val ex = intercept[IllegalArgumentException] {
      VerdictStore.append(bad, path)
    }
    assert(ex.getMessage.contains("monotonic-ingest"))
    // nothing landed: a clean monotonic batch still appends and matches
    val good = mk(Seq(100L -> "alpha beta gamma delta epsilon eta"))
    VerdictStore.append(good, path)
    assert(rowsOf(VerdictStore.read(spark, path)) ===
      rowsOf(NearDupOps.dedupVerdictsOn(old.unionByName(good))))
    spark.catalog.clearCache()
  }

  test("fixture corpus: build + append == from-scratch; the signature " +
      "table covers every ingested doc (appends take only the batch — " +
      "resident text is structurally out of reach)") {
    val path = tmp("vs-fix")
    val old = fixtureDocs.filter(col("doc_id") < 400)
    val batch = fixtureDocs.filter(col("doc_id") >= 400)
    VerdictStore.build(old, path)
    VerdictStore.append(batch, path)
    val got = rowsOf(VerdictStore.read(spark, path))
    assert(got === rowsOf(NearDupOps.dedupVerdictsOn(fixtureDocs)))
    // resident text is never re-read: the only text scanned by an
    // append is the batch's (signatures of resident docs come from
    // the store) — assert by appending a second batch while passing
    // a resident frame is impossible structurally (appendEpoch takes
    // only the batch), so pin the signature table's coverage instead
    val sigDocs = VerdictStore.readSigs(spark, path)
      .select(col("doc_id")).distinct().count()
    assert(sigDocs === fixtureDocs.count())
    spark.catalog.clearCache()
  }

  test("epoch replay is a no-op; a crash between the sigs and verdicts " +
      "commits is completed — not duplicated — by redelivery") {
    val path = tmp("vs-crash")
    VerdictStore.build(fixtureDocs.filter(col("doc_id") < 300), path)
    val b1 = fixtureDocs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    VerdictStore.appendEpoch(b1, path, 7L)
    def fileSet(p: String) = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).toSet
      finally s.close()
    }
    val before = fileSet(path)
    VerdictStore.appendEpoch(b1, path, 7L) // replay: storage no-op
    assert(fileSet(path) === before)

    // crash simulation for the NEXT batch: sigs commits (in the
    // batch-append id band), verdicts doesn't — the batch append's
    // retry must re-use the crashed id and complete it
    val b2 = fixtureDocs.filter(col("doc_id") >= 400)
    EpochStore.commitEpoch(s"$path/sigs", 1000000000L) { tmpDir =>
      NearDupOps.signatureOf(b2).write.mode("overwrite").parquet(tmpDir)
    }
    assert(!EpochStore.committed(s"$path/verdicts", 1000000000L))
    VerdictStore.append(b2, path) // self-heal path reuses the crashed id
    assert(EpochStore.committed(s"$path/verdicts", 1000000000L))
    assert(rowsOf(VerdictStore.read(spark, path)) ===
      rowsOf(NearDupOps.dedupVerdictsOn(
        fixtureDocs.filter(col("doc_id") < 500))))
    // a DIFFERENT batch may not ride a crashed id — simulate another
    // half-commit (a genuinely new batch b3) and offer the wrong batch
    val b3 = b2.select((col("doc_id") + 20000L).as("doc_id"), col("text"),
      col("lang"), col("n_chars"))
    EpochStore.commitEpoch(s"$path/sigs", 1000000001L) { tmpDir =>
      NearDupOps.signatureOf(b3).write.mode("overwrite").parquet(tmpDir)
    }
    intercept[IllegalStateException] { VerdictStore.append(b2, path) }
    // the ORIGINAL batch heals: the crashed id is re-used and both
    // tables converge
    VerdictStore.append(b3, path)
    assert(EpochStore.committedIds(s"$path/sigs") ===
      EpochStore.committedIds(s"$path/verdicts"))
    spark.catalog.clearCache()
  }

  test("compact folds superseded rows, preserves reads and the ledger; " +
      "maintain reports the census and refuses nothing it shouldn't") {
    val path = tmp("vs-compact")
    VerdictStore.build(fixtureDocs.filter(col("doc_id") < 300), path)
    VerdictStore.appendEpoch(
      fixtureDocs.filter(col("doc_id") >= 300 && col("doc_id") < 400),
      path, 0L)
    VerdictStore.appendEpoch(fixtureDocs.filter(col("doc_id") >= 400),
      path, 1L)
    val before = rowsOf(VerdictStore.read(spark, path))
    val rawBefore = EpochStore.read(spark, s"$path/verdicts").count()

    val healthy = VerdictStore.maintain(spark, path)
    assert(!healthy.diverged && !healthy.compacted,
      "3 epochs under maxEpochs=64 must not fold")
    assert(healthy.nDocs === before.length)
    assert(healthy.rawRows === rawBefore)

    val r = VerdictStore.maintain(spark, path, maxEpochs = 1)
    assert(r.compacted)
    assert(r.verdictEpochs === 1 && r.sigsEpochs === 1)
    assert(r.supersededFrac === 0.0, "post-fold raw == resolved")
    assert(rowsOf(VerdictStore.read(spark, path)) === before)
    // folded epochs stay replay-no-ops
    val files = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).toSet
      finally s.close()
    }
    VerdictStore.appendEpoch(fixtureDocs.filter(col("doc_id") >= 400),
      path, 1L)
    val files2 = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).toSet
      finally s.close()
    }
    assert(files2 === files)
    // appends keep working after the fold, seq stays monotonic
    VerdictStore.append(
      fixtureDocs.filter(col("doc_id") >= 400)
        .select((col("doc_id") + 10000L).as("doc_id"), col("text"),
          col("lang"), col("n_chars")), path)
    assert(VerdictStore.read(spark, path).count() === 500 + 100)
    spark.catalog.clearCache()
  }

  test("appendStream == batch appends, epoch per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val streamed = tmp("vs-stream")
    val old = fixtureDocs.filter(col("doc_id") < 300)
    VerdictStore.build(old, streamed)
    val rest = fixtureDocs.filter(col("doc_id") >= 300)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val (a, b) = rest.splitAt(rest.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, String, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("vs-ckpt").toString
    val q = VerdictStore.appendStream(
      stream.toDF().toDF("doc_id", "text", "lang", "n_chars"),
      streamed, ckpt)
    try {
      stream.addData(a.toSeq); q.processAllAvailable()
      stream.addData(b.toSeq); q.processAllAvailable()
    } finally q.stop()
    // two streamed epochs landed
    assert(EpochStore.committedIds(s"$streamed/verdicts").size >= 2)
    spark.catalog.clearCache()
    // streamed store == from-scratch over the union — the decisive
    // equality across micro-batch boundaries
    assert(
      VerdictStore.read(spark, streamed).collect().map(_.toSeq).toSet ===
        NearDupOps.dedupVerdictsOn(fixtureDocs).collect().map(_.toSeq)
          .toSet)
  }
}
