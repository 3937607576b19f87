package graft

import org.apache.spark.sql.functions._

import graft.engine.EpochStore
import graft.queries.{ContainmentStore, NearDupOps}

/** The persisted containment store (build / append / compact /
  * maintain): four LWW delta-epoch tables over the q155 incremental
  * path — the store where arrivals MUTATE resident rows. Under test:
  *
  *   - build + append == the from-scratch q149 pass over the union,
  *     on the crafted df-crossing corpus (drop, rise, merge, carrier
  *     flip, untouched) — including the EMPTIED-ARRAY overwrite and
  *     the pair/verdict TOMBSTONES no other store needs;
  *   - the exactly-once epoch contract: full replay no-op
  *     (file-set-identical), a crash between table renames completed
  *     by redelivery, a different batch on a crashed id failing loud;
  *   - compaction folds all four tables to resolved rows (GC of
  *     superseded + dead rows) with reads unchanged;
  *   - maintain reports divergence instead of burying it.
  */
class ContainmentStoreSpec extends SparkSpec {
  import spark.implicits._

  private val maxDf = 3L

  // the q155 crafted corpus (MinHashSpec documents every group):
  // X(0)⊂Y(1) dissolves; P(2)-Q(3) rises; C-chain gains carrier
  // C3(103); M clusters merge under M5(104); V untouched; W batch pair
  private def resident = Seq(
    (0L, "s1 s2 s3 s4 s5"),
    (1L, "s1 s2 s3 s4 s5 y1 y2"),
    (2L, "p1 p2 p3 c1 c2 c3 c4 c5"),
    (3L, "q1 q2 q3 c1 c2 c3 c4 c5"),
    (4L, "q1 q2 q3 c1 c2 r1 r2 r3"),
    (5L, "q1 q2 q3 c1 c2 t1 t2 t3"),
    (6L, "d1 d2 d3 d4 d5"),
    (7L, "d1 d2 d3 d4 d5 d6 d7"),
    (8L, "g1 g2 g3 g4 g5"),
    (9L, "g1 g2 g3 g4 g5 g6 g7"),
    (10L, "h1 h2 h3 h4 h5"),
    (11L, "h1 h2 h3 h4 h5 h6 h7"),
    (12L, "v1 v2 v3 v4 v5"),
    (13L, "v1 v2 v3 v4 v5 v6 v7")).toDF("doc_id", "text")

  private def batch = Seq(
    (100L, "s1 s2 s3 s4 s5 za1 za2"),
    (101L, "s1 s2 s3 s4 s5 zb1 zb2"),
    (102L, "q1 q2 q3 c1 c2"),
    (103L, "d1 d2 d3 d4 d5 d6 d7 d8 d9"),
    (104L, "g1 g2 g3 g4 g5 g6 g7 h1 h2 h3 h4 h5 h6 h7"),
    (105L, "u1 u2 u3 u4 u5"),
    (106L, "u1 u2 u3 u4 u5 u6 u7")).toDF("doc_id", "text")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("cs").toString

  private def verdictKey(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getInt(4))).toSet

  private def fullRecompute = verdictKey(
    NearDupOps.containmentVerdictsOn(
      NearDupOps.containmentOn(resident.union(batch), maxDf = maxDf)))

  test("build + append == from-scratch q149 over the union; emptied arrays " +
      "overwrite; dead pairs and verdicts tombstoned") {
    val p = tmp("cs-basic")
    ContainmentStore.build(resident, p, maxDf = maxDf)
    // t0 store sanity: the X-Y pair and cluster are live
    val pairs0 = ContainmentStore.readPairs(spark, p)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs0.contains((0L, 1L)))
    ContainmentStore.append(batch, p)
    assert(verdictKey(ContainmentStore.read(spark, p)) === fullRecompute)
    // the emptied-array OVERWRITE: X(0) held the s-block only; after
    // the crossing its stored signature must resolve to an empty
    // array, not the stale one
    val xRow = ContainmentStore.stateView(spark, p).perDoc
      .filter(col("doc_id") === 0L).collect()
    assert(xRow.length === 1 && xRow.head.getSeq[String](1).isEmpty,
      s"X's stored array did not empty: ${xRow.mkString}")
    // the dead X-Y pair is tombstoned out of the resolved pair view
    val pairs1 = ContainmentStore.readPairs(spark, p)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs1.contains((0L, 1L)))
    // ...and the risen P-Q pair appeared
    assert(pairs1.contains((2L, 3L)))
    spark.catalog.clearCache()
  }

  test("replay is a storage-level no-op; a crash between table renames " +
      "is completed by redelivery; a different batch fails loudly") {
    val p = tmp("cs-crash")
    ContainmentStore.build(resident, p, maxDf = maxDf)
    val id = EpochStore.nextAppendEpochId(s"$p/dfs")
    ContainmentStore.appendEpoch(batch, p, id)
    def listing = Seq("dfs", "perdoc", "pairs", "verdicts").flatMap { t =>
      val dir = java.nio.file.Paths.get(EpochStore.liveDir(s"$p/$t"))
      val s = java.nio.file.Files.walk(dir)
      try s.iterator().asScala.map(_.toString).toVector.sorted
      finally s.close()
    }
    val before = listing
    ContainmentStore.appendEpoch(batch, p, id) // replay
    assert(listing === before, "replay changed the stored file set")
    // simulate a crash AFTER dfs+perdoc committed but BEFORE
    // pairs+verdicts: delete the trailing epochs
    Seq("pairs", "verdicts").foreach { t =>
      graft.engine.Archive.deleteTree(java.nio.file.Paths.get(
        EpochStore.liveDir(s"$p/$t"), s"epoch=$id"))
    }
    // a DIFFERENT batch must refuse the crashed id
    val other = Seq((999L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val ex = intercept[IllegalStateException] {
      ContainmentStore.append(other, p)
    }
    assert(ex.getMessage.contains("shingle set differs"))
    // redelivering the ORIGINAL batch completes the missing tables
    ContainmentStore.append(batch, p)
    assert(verdictKey(ContainmentStore.read(spark, p)) === fullRecompute)
    spark.catalog.clearCache()
  }

  test("compaction folds to resolved rows (GC of superseded + dead) " +
      "with reads unchanged; maintain reports the debt then clears it") {
    val p = tmp("cs-compact")
    ContainmentStore.build(resident, p, maxDf = maxDf)
    ContainmentStore.append(batch, p)
    val before = verdictKey(ContainmentStore.read(spark, p))
    val rep0 = ContainmentStore.maintain(spark, p)
    assert(!rep0.diverged && !rep0.compacted)
    assert(rep0.supersededFrac > 0.0,
      "the df-crossing append must leave superseded/dead rows to GC")
    assert(rep0.nDocs === 21L) // every signed doc, incl. emptied X
    ContainmentStore.compact(spark, p)
    assert(verdictKey(ContainmentStore.read(spark, p)) === before)
    val rep1 = ContainmentStore.maintain(spark, p)
    assert(rep1.supersededFrac === 0.0)
    assert(rep1.epochs.values.forall(_ === 1))
    // a further append on the compacted store still works and matches
    val more = Seq(
      (200L, "v1 v2 v3 v4 v5 m1 m2"), // quotes V1 -> joins the V cluster
      (201L, "n1 n2 n3 n4 n5")).toDF("doc_id", "text")
    ContainmentStore.append(more, p)
    val expected = verdictKey(NearDupOps.containmentVerdictsOn(
      NearDupOps.containmentOn(resident.union(batch).union(more),
        maxDf = maxDf)))
    assert(verdictKey(ContainmentStore.read(spark, p)) === expected)
    spark.catalog.clearCache()
  }

  test("appendStream: sequential micro-batches == the full recompute, " +
      "with a df crossing that only completes on the SECOND epoch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val p = tmp("cs-stream")
    ContainmentStore.build(resident, p, maxDf = maxDf)
    // micro-batch 0 brings the s-block df to 3 (still informative);
    // micro-batch 1 pushes it over — the X-Y dissolution happens one
    // epoch AFTER the shingle first arrived, so the stored df
    // statistic (not the batch alone) must drive the crossing. The
    // q-block crosses already at mb0.
    val mb0 = Seq((100L, "s1 s2 s3 s4 s5 za1 za2"),
      (102L, "q1 q2 q3 c1 c2"), (103L, "d1 d2 d3 d4 d5 d6 d7 d8 d9"))
    val mb1 = Seq((101L, "s1 s2 s3 s4 s5 zb1 zb2"),
      (104L, "g1 g2 g3 g4 g5 g6 g7 h1 h2 h3 h4 h5 h6 h7"),
      (105L, "u1 u2 u3 u4 u5"), (106L, "u1 u2 u3 u4 u5 u6 u7"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("cs-ckpt").toString
    val q = ContainmentStore.appendStream(
      stream.toDF().toDF("doc_id", "text"), p, ckpt)
    try {
      stream.addData(mb0); q.processAllAvailable()
      // after mb0 the X-Y cluster still stands (s-block df = 3)
      val mid = verdictKey(ContainmentStore.read(spark, p))
      assert(mid.exists(v => v._1 == 0L && v._3 == 1L),
        "X-Y must survive micro-batch 0 (s-block at the cap, not over)")
      stream.addData(mb1); q.processAllAvailable()
    } finally q.stop()
    assert(verdictKey(ContainmentStore.read(spark, p)) === fullRecompute,
      "streamed epochs diverged from the full recompute")
    spark.catalog.clearCache()
  }

  test("maintain reports a diverged (half-committed) store and touches nothing") {
    val p = tmp("cs-diverged")
    ContainmentStore.build(resident, p, maxDf = maxDf)
    val id = EpochStore.nextAppendEpochId(s"$p/dfs")
    ContainmentStore.appendEpoch(batch, p, id)
    graft.engine.Archive.deleteTree(java.nio.file.Paths.get(
      EpochStore.liveDir(s"$p/verdicts"), s"epoch=$id"))
    val rep = ContainmentStore.maintain(spark, p)
    assert(rep.diverged && !rep.compacted)
    // the census must reflect a CONSISTENT pre-append state, not a mix
    // of the crashed epoch's committed tables (dfs/perdoc/pairs landed,
    // verdicts missing): nDocs is the RESIDENT signature count, not
    // the 21 a completed append reports
    assert(rep.nDocs === 14L,
      s"diverged census mixed mid-append state: nDocs=${rep.nDocs}")
    val ex = intercept[IllegalStateException] {
      ContainmentStore.compact(spark, p)
    }
    assert(ex.getMessage.contains("diverged"))
    spark.catalog.clearCache()
  }

  test("an append whose batch re-ingests a resident doc_id fails loudly") {
    val p = tmp("cs-overlap")
    ContainmentStore.build(resident, p, maxDf = maxDf)
    val overlapping = Seq(
      (5L, "q1 q2 q3 c1 c2 t1 t2 t3"), // resident id re-ingested
      (300L, "fresh1 fresh2 fresh3 fresh4 fresh5")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      ContainmentStore.append(overlapping, p)
    }
    assert(ex.getMessage.contains("already resident"))
    // the refused append must not have committed anything: a clean
    // follow-up batch still lands and matches the recompute
    ContainmentStore.append(batch, p)
    assert(verdictKey(ContainmentStore.read(spark, p)) === fullRecompute)
    spark.catalog.clearCache()
  }

  test("a pre-round-14 layout (no postings/ sidecar) stays servable " +
      "for reads, maintain and compact; appends and forget refuse " +
      "with the migration message") {
    val p = tmp("cs-legacy")
    ContainmentStore.build(resident, p, maxDf = maxDf)
    // degrade to the legacy layout: drop the exact-forget sidecar
    graft.engine.Archive.deleteTree(java.nio.file.Paths.get(s"$p/postings"))
    val before = verdictKey(ContainmentStore.read(spark, p))
    // requirePostings promises "reads and compaction remain
    // servable" — the maintenance tick and the fold must not crash
    // on the missing table
    val rep = ContainmentStore.maintain(spark, p)
    assert(!rep.diverged)
    assert(!rep.epochs.contains("postings"))
    ContainmentStore.compact(spark, p)
    assert(verdictKey(ContainmentStore.read(spark, p)) === before,
      "compaction on a legacy layout must preserve the read surface")
    // appends and forgets stay blocked until a migrating rebuild
    val ea = intercept[IllegalStateException] {
      ContainmentStore.append(batch, p)
    }
    assert(ea.getMessage.contains("postings"))
    val ef = intercept[IllegalStateException] {
      ContainmentStore.forget(spark, p, Seq(0L).toDF("doc_id"))
    }
    assert(ef.getMessage.contains("postings"))
    spark.catalog.clearCache()
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
