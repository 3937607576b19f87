package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{EpochStore, Tombstones}
import graft.queries.{CalibrationStore, ChunkIndex, IvfIndex, MinHashIndex,
  MultimodalOps, PHashIndex}

/** The right-to-be-forgotten contract (round 13), store by store:
  * after `forget(S)`, every READ surface equals the same store built
  * over the corpus WITHOUT S — the never-ingested equality — while
  * the store itself was not rewritten (merge-on-read tombstones);
  * the next compaction purges physically and clears the tombstone
  * table; a replayed forget converges instead of growing state.
  *
  * For IvfIndex the equality is on the codebook-INDEPENDENT surface
  * (nprobe = k exact search — the CrawlPipelineSpec discipline):
  * k-means trained with vs without S gives different cell layouts by
  * construction, and the stored SQ/PQ codes of surviving rows were
  * written under the WITH-S books — the read surfaces exclude S
  * exactly, which is what the law requires; re-training is the
  * documented rebuild cadence.
  */
class ForgetSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")

  /** A forget set that exercises structure: ids with duplicate /
    * near-dup partners in the fixture plus a couple of plain docs.
    */
  private val S = Seq(3L, 7L, 42L, 128L, 301L)
  private def sdf = {
    import spark.implicits._
    S.toDF("doc_id")
  }
  private def minus(df: DataFrame, key: String = "doc_id") =
    df.filter(!col(key).isin(S: _*))

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => math.round(d * 1e9) // fp-stable compare
      case x => x
    }.toVector).toVector.sortBy(_.mkString("|"))

  private def assertSameRows(got: DataFrame, want: DataFrame,
                             what: String): Unit = {
    val g = rowsOf(got)
    val w = rowsOf(want)
    assert(g === w, s"$what: forget(S) != never-ingested build")
    assert(g.nonEmpty, s"$what: equality is vacuous (no rows)")
  }

  test("ChunkIndex.forget: reads equal never-ingested; compact purges " +
      "physically and clears tombstones; replayed forget is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("forget-chunk").toString
    val full = s"$base/full"; val ni = s"$base/ni"
    ChunkIndex.build(docs, full)
    ChunkIndex.build(minus(docs), ni)
    ChunkIndex.forget(spark, full, sdf)
    assertSameRows(ChunkIndex.chunks(spark, full),
      ChunkIndex.chunks(spark, ni), "chunks")
    assertSameRows(ChunkIndex.freq(spark, full),
      ChunkIndex.freq(spark, ni), "freq")
    // merge-on-read: rows still physically present pre-purge
    val raw = EpochStore.read(spark, s"$full/chunks")
    assert(raw.filter(col("doc_id").isin(S: _*)).count() > 0,
      "tombstoned rows should still be physical before the purge")
    // the maintenance tick is the purge point
    assert(ChunkIndex.compactIfFragmented(spark, full, maxEpochs = 64))
    assert(EpochStore.read(spark, s"$full/chunks")
      .filter(col("doc_id").isin(S: _*)).count() === 0L)
    assert(!Tombstones.pending(spark, full))
    assertSameRows(ChunkIndex.chunks(spark, full),
      ChunkIndex.chunks(spark, ni), "chunks post-purge")
    // replayed forget of the same batch: converges, nothing re-grows
    ChunkIndex.forget(spark, full, sdf)
    assertSameRows(ChunkIndex.chunks(spark, full),
      ChunkIndex.chunks(spark, ni), "chunks post-replay")
  }

  test("MinHashIndex.forget: a forgotten doc neither matches nor " +
      "represents a bucket; both probe paths equal never-ingested") {
    val base = java.nio.file.Files.createTempDirectory("forget-mh").toString
    val full = s"$base/full"; val ni = s"$base/ni"
    MinHashIndex.build(docs, full)
    MinHashIndex.build(minus(docs), ni)
    // the probe batch: the forgotten docs' own texts under fresh ids
    // (guaranteed exact-duplicate matches BEFORE the forget) plus
    // copies of SURVIVING docs, so the post-forget equality is
    // non-vacuous
    val probe = docs
      .filter(col("doc_id").isin((S ++ Seq(1L, 2L, 10L, 55L)): _*))
      .select((col("doc_id") + 20000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val pre = MinHashIndex.matches(spark, full, probe)
    assert(pre.filter(col("match_id").isin(S: _*)).count() > 0,
      "probe must match the to-be-forgotten docs before the forget")
    MinHashIndex.forget(spark, full, sdf)
    val post = MinHashIndex.matches(spark, full, probe)
    assert(post.filter(col("match_id").isin(S: _*)).count() === 0L)
    assertSameRows(post, MinHashIndex.matches(spark, ni, probe), "matches")
    assertSameRows(
      MinHashIndex.invertedMatches(spark, full, probe),
      MinHashIndex.invertedMatches(spark, ni, probe), "invertedMatches")
    // purge via the tick, then re-verify and confirm physical removal
    assert(MinHashIndex.compactIfFragmented(spark, full, maxEpochs = 64))
    assert(EpochStore.read(spark, s"$full/docs")
      .filter(col("doc_id").isin(S: _*)).count() === 0L)
    assert(EpochStore.read(spark, s"$full/bands")
      .filter(col("doc_id").isin(S: _*)).count() === 0L)
    assertSameRows(MinHashIndex.matches(spark, full, probe),
      MinHashIndex.matches(spark, ni, probe), "matches post-purge")
  }

  test("PHashIndex.forget: probe answers equal never-ingested; purge " +
      "drops both tables") {
    val base = java.nio.file.Files.createTempDirectory("forget-ph").toString
    val full = s"$base/full"; val ni = s"$base/ni"
    PHashIndex.build(MultimodalOps.phashFingerprints(docs), full)
    PHashIndex.build(MultimodalOps.phashFingerprints(minus(docs)), ni)
    val probe = MultimodalOps.phashFingerprints(
      docs.filter(col("doc_id").isin((S ++ Seq(1L, 2L, 10L, 55L)): _*))
        .select((col("doc_id") + 20000L).as("doc_id"), col("text")))
      .localCheckpoint(true)
    assert(PHashIndex.matches(spark, full, probe)
      .filter(col("match_id").isin(S: _*)).count() > 0,
      "probe must match the to-be-forgotten docs before the forget")
    PHashIndex.forget(spark, full, sdf)
    assertSameRows(PHashIndex.matches(spark, full, probe),
      PHashIndex.matches(spark, ni, probe), "phash matches")
    assert(PHashIndex.maintain(spark, full).compacted,
      "pending tombstones must trigger the tick's purge")
    assert(EpochStore.read(spark, s"$full/hashes")
      .filter(col("doc_id").isin(S: _*)).count() === 0L)
    assert(EpochStore.read(spark, s"$full/bands")
      .filter(col("doc_id").isin(S: _*)).count() === 0L)
    assertSameRows(PHashIndex.matches(spark, full, probe),
      PHashIndex.matches(spark, ni, probe), "phash matches post-purge")
  }

  test("CalibrationStore.forget: served calibration equals " +
      "never-ingested (negative hist deltas), appends after a forget " +
      "mint non-colliding ids, the half-commit heals, compact purges") {
    val base = java.nio.file.Files.createTempDirectory("forget-cal").toString
    val full = s"$base/full"; val ni = s"$base/ni"
    val resident = docs.filter(col("doc_id") < 400)
    val late = docs.filter(col("doc_id") >= 400)
    CalibrationStore.build(resident, full)
    CalibrationStore.build(minus(resident), ni)
    CalibrationStore.forget(spark, full, sdf)
    assertSameRows(CalibrationStore.served(spark, full),
      CalibrationStore.served(spark, ni), "served")
    // an append AFTER the forget: the derived id must not collide
    // with the forget's hist epoch (the silent-no-op hazard)
    CalibrationStore.append(late, full)
    CalibrationStore.append(late, ni)
    assertSameRows(CalibrationStore.served(spark, full),
      CalibrationStore.served(spark, ni), "served post-append")
    // crash drill: a tombstone epoch whose negative delta is missing
    // (Tombstones.forget directly = dying between the two commits);
    // the next forget() heals it from the still-stored score rows
    val S2 = Seq(401L, 402L)
    import spark.implicits._
    Tombstones.forget(spark, full, S2.toDF("doc_id"))
    CalibrationStore.forget(spark, full, S2.toDF("doc_id")) // heal path
    val ni2 = s"$base/ni2"
    CalibrationStore.build(
      docs.filter(!col("doc_id").isin((S ++ S2): _*)), ni2)
    assertSameRows(CalibrationStore.served(spark, full),
      CalibrationStore.served(spark, ni2), "served post-heal")
    // purge: tick compacts (tombstones pending), physical rows gone,
    // reads unchanged
    val rep = CalibrationStore.maintain(spark, full)
    assert(rep.compacted && !rep.diverged)
    assert(EpochStore.read(spark, s"$full/scores")
      .filter(col("doc_id").isin((S ++ S2): _*)).count() === 0L)
    assertSameRows(CalibrationStore.served(spark, full),
      CalibrationStore.served(spark, ni2), "served post-purge")
  }

  test("VerdictStore.forget: promote-merge, canonical rename, cluster " +
      "split — read equals dedupVerdictsOn over the never-ingested " +
      "corpus; crash heals; compact purges") {
    import spark.implicits._
    import graft.queries.{NearDupOps, VerdictStore}
    // engineered corpus (all one length bucket):
    //  - exact group {10,11,12} with doc 11 under a DIFFERENT lang —
    //    forgetting min 10 promotes 11, whose lang-L2 blocking lets
    //    it pair with cluster {30,31}: a promote that MERGES a
    //    resident cluster under a smaller canonical
    //  - {10,20} near pair (L1): forgetting 10 strands 20 → keep
    //  - {40,41,42} chain (L3): forgetting bridge 41 SPLITS it
    val tA = (1 to 10).map(i => s"a$i").mkString(" ")
    val tA2 = ((1 to 5).map(i => s"a$i") ++ (1 to 5).map(i => s"x$i")).mkString(" ")
    val tB = ((1 to 5).map(i => s"b$i") ++ (6 to 10).map(i => s"a$i")).mkString(" ")
    val tB2 = ((1 to 5).map(i => s"b$i") ++ (1 to 5).map(i => s"y$i")).mkString(" ")
    val t40 = ((1 to 5).map(i => s"c$i") ++ (1 to 5).map(i => s"d$i")).mkString(" ")
    val t41 = ((1 to 5).map(i => s"d$i") ++ (1 to 5).map(i => s"e$i")).mkString(" ")
    val t42 = ((1 to 5).map(i => s"e$i") ++ (1 to 5).map(i => s"f$i")).mkString(" ")
    val corpus = Seq(
      (10L, tA, "L1"), (11L, tA, "L2"), (12L, tA, "L1"), (20L, tA2, "L1"),
      (30L, tB, "L2"), (31L, tB2, "L2"),
      (40L, t40, "L3"), (41L, t41, "L3"), (42L, t42, "L3"),
      (50L, (1 to 10).map(i => s"g$i").mkString(" "), "L4"))
      .toDF("doc_id", "text", "lang")
      .withColumn("n_chars", lit(10L))
      .localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("forget-vs").toString
    val full = s"$base/full"
    VerdictStore.build(corpus, full)
    def expectOver(remaining: DataFrame): Seq[Seq[Any]] =
      rowsOf(NearDupOps.dedupVerdictsOn(remaining))
    // sanity: the crafted structure is in the pre-forget verdicts
    val pre = VerdictStore.read(spark, full).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(pre(11L) === (("exact", 10L)) && pre(20L) === (("near", 10L)))
    assert(pre(31L) === (("near", 30L)) && pre(42L) === (("near", 40L)))
    // forget the exact-group min / cluster canonical
    VerdictStore.forget(spark, full, Seq(10L).toDF("doc_id"))
    val after10 = corpus.filter(col("doc_id") =!= 10L)
    assert(rowsOf(VerdictStore.read(spark, full)) === expectOver(after10),
      "forget(10) != never-ingested (promote-merge case)")
    val post = VerdictStore.read(spark, full).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(post(11L) === (("keep", 11L)), "11 must promote to survivor")
    assert(post(30L) === (("near", 11L)) && post(31L) === (("near", 11L)),
      "the promoted doc must merge cluster {30,31} under canonical 11")
    assert(post(20L) === (("keep", 20L)), "20 must strand to keep")
    // forget the bridge: the chain must split
    VerdictStore.forget(spark, full, Seq(41L).toDF("doc_id"))
    val after41 = corpus.filter(!col("doc_id").isin(10L, 41L))
    assert(rowsOf(VerdictStore.read(spark, full)) === expectOver(after41),
      "forget(41) != never-ingested (split case)")
    val post2 = VerdictStore.read(spark, full).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(post2(40L) === (("keep", 40L)) && post2(42L) === (("keep", 42L)),
      "the bridge forget must split {40,42} into keeps")
    // crash drill: tombstone committed, relabel delta missing — the
    // next heal derives the identical delta from the committed epoch
    val id = math.max(
      EpochStore.nextForgetEpochId(s"$full/forgotten"),
      EpochStore.nextForgetEpochId(s"$full/verdicts"))
    Tombstones.forget(spark, full, Seq(30L).toDF("doc_id"), Some(id))
    VerdictStore.healForgets(spark, full)
    val after30 = corpus.filter(!col("doc_id").isin(10L, 41L, 30L))
    assert(rowsOf(VerdictStore.read(spark, full)) === expectOver(after30),
      "healed forget(30) != never-ingested")
    // purge: tick compacts (tombstones pending), physical rows gone,
    // reads unchanged; a replayed forget converges
    val rep = VerdictStore.maintain(spark, full)
    assert(rep.compacted && !rep.diverged)
    assert(EpochStore.read(spark, s"$full/sigs")
      .filter(col("doc_id").isin(10L, 41L, 30L)).count() === 0L)
    assert(EpochStore.read(spark, s"$full/verdicts")
      .filter(col("doc_id").isin(10L, 41L, 30L)).count() === 0L)
    assert(rowsOf(VerdictStore.read(spark, full)) === expectOver(after30),
      "post-purge read changed")
    VerdictStore.forget(spark, full, Seq(10L).toDF("doc_id"))
    assert(rowsOf(VerdictStore.read(spark, full)) === expectOver(after30),
      "replayed forget must be a no-op on the read surface")
  }

  test("VerdictStore.forget on the fixture corpus equals " +
      "dedupVerdictsOn over the never-ingested corpus") {
    import spark.implicits._
    import graft.queries.{NearDupOps, VerdictStore}
    val base = java.nio.file.Files.createTempDirectory("forget-vsf").toString
    val full = s"$base/full"
    VerdictStore.build(docs, full)
    // forget docs that have verdict structure in the fixture: a
    // couple of exact-dup canonicals plus near members
    val interesting = VerdictStore.read(spark, full)
      .filter(col("verdict") =!= "keep")
      .select(col("canonical_id").as("doc_id")).distinct().limit(3)
      .unionByName(spark.range(2).select((col("id") * 37 + 5).as("doc_id")))
      .distinct().localCheckpoint(true)
    val sSet = interesting.collect().map(_.getLong(0)).toSet
    assert(sSet.nonEmpty)
    VerdictStore.forget(spark, full, interesting)
    val remaining = docs.filter(!col("doc_id").isin(sSet.toSeq: _*))
    assert(rowsOf(VerdictStore.read(spark, full)) ===
      rowsOf(NearDupOps.dedupVerdictsOn(remaining)),
      "fixture forget != never-ingested")
  }

  test("IvfIndex.forget: exact search (nprobe = k) equals " +
      "never-ingested; q154's probe excludes forgotten vectors; " +
      "compact purges cells") {
    val base = java.nio.file.Files.createTempDirectory("forget-ivf").toString
    val full = s"$base/full"; val ni = s"$base/ni"
    val SV = Seq(5L, 17L, 100L, 250L)
    IvfIndex.build(embs, full)
    IvfIndex.build(embs.filter(!col("vec_id").isin(SV: _*)), ni)
    import spark.implicits._
    IvfIndex.forget(spark, full, SV.toDF("vec_id"))
    val queries = embs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .localCheckpoint(true)
    val k = graft.queries.Similarity.IvfCells
    // nprobe = k probes every cell on both stores, so the exact
    // cosine top-5 is codebook-independent — the never-ingested
    // equality surface
    assertSameRows(IvfIndex.query(spark, full, queries, nprobe = k),
      IvfIndex.query(spark, ni, queries, nprobe = k), "exact query")
    // the ADC and SQ paths exclude too (recall differs from a
    // re-trained store by construction; absence is the law)
    val pq = IvfIndex.pqQuery(spark, full, queries)
    assert(pq.filter(col("neighbor_id").isin(SV: _*)).count() === 0L)
    val dedup = graft.queries.Similarity.incrementalSemanticDedupOn(
      embs.filter(col("vec_id") % 5 === 0), full)
    assert(dedup.filter(col("dup_of").isin(SV: _*)).count() === 0L)
    assert(IvfIndex.compactIfFragmented(spark, full, maxEpochs = 64))
    assert(EpochStore.read(spark, s"$full/cells")
      .filter(col("vec_id").isin(SV: _*)).count() === 0L)
    assert(!Tombstones.pending(spark, full))
    assertSameRows(IvfIndex.query(spark, full, queries, nprobe = k),
      IvfIndex.query(spark, ni, queries, nprobe = k),
      "exact query post-purge")
  }

  // ---- ContainmentStore: the EXACT decrement (round 14) -----------

  /** The ContainmentStoreSpec crafted corpus at maxDf = 3. The
    * trigram "q1 q2 q3" sits in docs 3/4/5/102 — df 4, over-cap —
    * so forgetting 102 REQUALIFIES it into 3/4/5's informative sets:
    * the case the round-13 boundary said a tombstone forget could
    * not serve, now exact via the postings sidecar.
    */
  private val csMaxDf = 3L
  private def csDocs = {
    import spark.implicits._
    Seq(
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
      (12L, "v1 v2 v3 v4 v5"),
      (13L, "v1 v2 v3 v4 v5 v6 v7"),
      (100L, "s1 s2 s3 s4 s5 za1 za2"),
      (102L, "q1 q2 q3 c1 c2")).toDF("doc_id", "text")
  }
  private val csF = Seq(0L, 102L) // a pair member + the requalifier
  private def csFdf = {
    import spark.implicits._
    csF.toDF("doc_id")
  }
  private def csPairs(p: String) = graft.queries.ContainmentStore
    .readPairs(spark, p)
    .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"),
      col("n_b"), col("containment"))
  private def csVerdicts(p: String) = graft.queries.ContainmentStore
    .read(spark, p)
    .select(col("doc_id"), col("cluster_id"), col("canon_id"),
      col("n"), col("is_kept"))

  test("ContainmentStore.forget: pairs and verdicts equal the " +
      "never-ingested build, INCLUDING a df requalification other " +
      "docs' signatures must absorb; never-ingested ids no-op; " +
      "replay converges") {
    val base = java.nio.file.Files.createTempDirectory("forget-cs").toString
    val full = s"$base/full"; val ni = s"$base/ni"
    graft.queries.ContainmentStore.build(csDocs, full, maxDf = csMaxDf)
    graft.queries.ContainmentStore.build(
      csDocs.filter(!col("doc_id").isin(csF: _*)), ni, maxDf = csMaxDf)
    // the requalification is real and observable: pre-forget the
    // q-trigrams are over-cap, so doc 3's informative size is 3 and
    // the (2,3) containment pair is live; forgetting 102 drops their
    // df to 3, doc 3 absorbs them (n 3 -> 6), the denominator grows
    // and the pair DIES — exactly the resident-signature staleness a
    // tombstone-only forget could not serve
    def pairSet(p: String) = csPairs(p).select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(full).contains((2L, 3L)), "pre-forget (2,3) live")
    graft.queries.ContainmentStore.forget(spark, full, csFdf)
    assertSameRows(csPairs(full), csPairs(ni), "containment pairs")
    assertSameRows(csVerdicts(full), csVerdicts(ni),
      "containment verdicts")
    assert(!pairSet(full).contains((2L, 3L)),
      "the requalified shingles must kill (2,3) via doc 3's grown n")
    // never-ingested ids change nothing
    import spark.implicits._
    graft.queries.ContainmentStore.forget(spark, full,
      Seq(9999L).toDF("doc_id"))
    assertSameRows(csVerdicts(full), csVerdicts(ni), "after no-op forget")
    // replay converges (ids already tombstoned -> storage no-op)
    graft.queries.ContainmentStore.forget(spark, full, csFdf)
    assertSameRows(csVerdicts(full), csVerdicts(ni), "after replay")
  }

  test("ContainmentStore.forget: a crash between tombstone and delta " +
      "heals on maintain; append after forget equals the fresh " +
      "sequence, re-ingesting a forgotten id included") {
    val base = java.nio.file.Files.createTempDirectory("forget-cs2").toString
    val full = s"$base/full"; val ni = s"$base/ni"
    graft.queries.ContainmentStore.build(csDocs, full, maxDf = csMaxDf)
    // CRASH DRILL: commit only the tombstone half (what a crash
    // inside forget leaves), then let the tick heal — and PURGE:
    // pending tombstones now trigger the compaction policy, so one
    // maintenance tick both lands the delta and erases the bytes
    Tombstones.forget(spark, full, csFdf,
      withId = Some(EpochStore.ForgetFloor))
    val rep = graft.queries.ContainmentStore.maintain(spark, full)
    assert(!rep.diverged, "heal must land the forget delta")
    assert(rep.compacted, "pending tombstones must trigger the purge")
    assert(!Tombstones.pending(spark, full))
    for (t <- Seq("postings", "perdoc", "verdicts"))
      assert(EpochStore.read(spark, s"$full/$t")
        .filter(col("doc_id").isin(csF: _*)).count() === 0L, s"$t purged")
    assert(EpochStore.read(spark, s"$full/pairs")
      .filter(col("doc_a").isin(csF: _*) || col("doc_b").isin(csF: _*))
      .count() === 0L, "pairs purged")
    graft.queries.ContainmentStore.build(
      csDocs.filter(!col("doc_id").isin(csF: _*)), ni, maxDf = csMaxDf)
    assertSameRows(csVerdicts(full), csVerdicts(ni),
      "healed + purged verdicts")
    // append AFTER the purge — the dfs decrement must compose with
    // the append's dr lookups, and the RE-INGESTED forgotten id 102
    // is legal now (the store genuinely no longer knows it)
    import spark.implicits._
    val batch2 = Seq((102L, "q1 q2 q3 c1 c2"),
      (200L, "w1 w2 w3 w4 w5"),
      (201L, "w1 w2 w3 w4 w5 w6 w7")).toDF("doc_id", "text")
    graft.queries.ContainmentStore.append(batch2, full)
    val ni2 = s"$base/ni2"
    graft.queries.ContainmentStore.build(
      csDocs.filter(!col("doc_id").isin(csF: _*)).unionByName(batch2),
      ni2, maxDf = csMaxDf)
    assertSameRows(csPairs(full), csPairs(ni2), "pairs after re-append")
    assertSameRows(csVerdicts(full), csVerdicts(ni2),
      "verdicts after re-append")
    // re-using a tombstoned id BEFORE its purge refuses loudly: the
    // store still holds the taken-down rows physically, so admitting
    // new ones would hide them behind the exclusion and then destroy
    // them at the purging fold (the Tombstones guard, all 8 stores)
    graft.queries.ContainmentStore.forget(spark, full,
      Seq(200L).toDF("doc_id"))
    val ex = intercept[IllegalStateException] {
      graft.queries.ContainmentStore.append(
        Seq((200L, "w1 w2 w3 w4 w5"), (300L, "y1 y2 y3 y4 y5"))
          .toDF("doc_id", "text"), full)
    }
    assert(ex.getMessage.contains("tombstoned awaiting purge"))
  }

  // ---- ManifestStore: exact eval-side decrement (round 14) --------

  /** The ManifestStoreSpec crafted corpus, extended for provenance:
    * eval 150 holds doc 7's semantic max (identical vector); bench
    * 150/200 both introduce the SHARED text T that train doc 11
    * chunks against (the "last introducer" corner); bench 100 shares
    * ngram8 with train doc 3.
    */
  private def msGenDoc(prefix: String, n: Int): String =
    ((0 until n).map(i => s"$prefix$i").take(2) ++ Seq("the") ++
      (0 until n).map(i => s"$prefix$i").drop(2)).mkString(" ")
  private val msNgram8 = (1 to 8).map(i => s"p8s$i").mkString(" ")
  private val msT = msGenDoc("c", 40)
  private def msDocs = {
    import spark.implicits._
    Seq(
      0L -> msGenDoc("z", 20),
      3L -> (msGenDoc("m", 26) + " " + msNgram8),
      5L -> "tiny doc here",
      7L -> msGenDoc("e", 19),
      9L -> msGenDoc("h", 19),
      11L -> msT,
      100L -> (msGenDoc("r", 16) + " " + msNgram8),
      150L -> msT,
      200L -> msT).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }
  private def msEmb = {
    import spark.implicits._
    Seq(0L -> Seq(0f, 0f, 0f, 1f), 7L -> Seq(1f, 0f, 0f, 0f),
      9L -> Seq(0f, 1f, 0f, 0f), 150L -> Seq(1f, 0f, 0f, 0f))
      .toDF("vec_id", "embedding")
  }
  private def msState(p: String) =
    graft.queries.ManifestStore.stateView(spark, p)
  private def msServed(p: String) = {
    import spark.implicits._
    graft.queries.ManifestStore.manifest(spark, p,
      Seq.empty[(Long, String)].toDF("doc_id", "d_v"),
      Seq.empty[(Long, Int)].toDF("doc_id", "ct"))
  }
  private def msBuildMinus(p: String, minus: Seq[Long]): Unit =
    graft.queries.ManifestStore.build(
      msDocs.filter(!col("doc_id").isin(minus: _*)),
      msEmb.filter(!col("vec_id").isin(minus: _*)), p)

  test("ManifestStore.forget: an eval takedown exactly decrements " +
      "the contam aggregates (semantic max, bench count, shared " +
      "chunks with a surviving introducer); reads equal the " +
      "never-ingested build") {
    val base = java.nio.file.Files.createTempDirectory("forget-ms").toString
    val full = s"$base/full"; val ni = s"$base/ni"
    graft.queries.ManifestStore.build(msDocs, msEmb, full)
    // doc 7's max is 1.0, achieved ONLY by eval 150; doc 11 shares
    // every chunk of T with introducers {150, 200}
    def contamOf(p: String, id: Long) = msState(p).contam
      .filter(col("doc_id") === id).collect().head
    assert(contamOf(full, 7L).getDouble(2) === 1.0)
    val SM = Seq(150L, 3L) // an eval doc + a train doc
    import spark.implicits._
    graft.queries.ManifestStore.forget(spark, full, SM.toDF("doc_id"))
    msBuildMinus(ni, SM)
    assertSameRows(msState(full).contam, msState(ni).contam, "contam")
    assertSameRows(msState(full).quality, msState(ni).quality, "quality")
    assertSameRows(msState(full).benchSh8, msState(ni).benchSh8,
      "benchSh8")
    assertSameRows(msState(full).evalChunks, msState(ni).evalChunks,
      "evalChunks")
    assertSameRows(msServed(full), msServed(ni), "served manifest")
    // non-vacuous: 7's semantic max DROPPED (150 held it); 11's
    // shared chunks SURVIVE (200 still introduces T)
    val c7 = contamOf(full, 7L)
    assert(c7.getDouble(2) === 0.0, s"doc 7 max must drop: $c7")
    val c11 = contamOf(full, 11L)
    assert(c11.getLong(4) === c11.getLong(3) && c11.getLong(4) > 0,
      s"doc 11's chunks must stay shared via introducer 200: $c11")
  }

  test("ManifestStore.forget: the LAST introducer leaving retracts " +
      "the shared strings; crash heals on maintain; compaction " +
      "purges physically") {
    val base = java.nio.file.Files.createTempDirectory("forget-ms2").toString
    val full = s"$base/full"; val ni = s"$base/ni"
    graft.queries.ManifestStore.build(msDocs, msEmb, full)
    import spark.implicits._
    // CRASH DRILL for {150, 3}: tombstone half only, tick heals
    Tombstones.forget(spark, full, Seq(150L, 3L).toDF("doc_id"),
      withId = Some(EpochStore.ForgetFloor))
    val rep = graft.queries.ManifestStore.maintain(spark, full)
    assert(!rep.diverged, "heal must land the contam delta")
    // now the LAST introducer of T leaves
    graft.queries.ManifestStore.forget(spark, full, Seq(200L).toDF("doc_id"))
    msBuildMinus(ni, Seq(150L, 3L, 200L))
    assertSameRows(msState(full).contam, msState(ni).contam,
      "contam after last introducer left")
    val c11 = msState(full).contam.filter(col("doc_id") === 11L)
      .collect().head
    assert(c11.getLong(4) === 0L, s"doc 11's shared count must hit 0: $c11")
    // never-ingested ids are a read no-op
    graft.queries.ManifestStore.forget(spark, full, Seq(8888L).toDF("doc_id"))
    assertSameRows(msState(full).contam, msState(ni).contam, "no-op forget")
    // purge: compaction drops every tombstoned row physically
    graft.queries.ManifestStore.compact(spark, full)
    for ((t, k) <- Seq("quality" -> "doc_id", "trainsh8" -> "doc_id",
        "benchsh8" -> "bench_id", "evalchunks" -> "eval_id",
        "evalemb" -> "eval_id"))
      assert(EpochStore.read(spark, s"$full/$t")
        .filter(col(k).isin(150L, 3L, 200L)).count() === 0L, s"$t purged")
    assert(!Tombstones.pending(spark, full))
    assertSameRows(msState(full).contam, msState(ni).contam, "post-purge")
    assertSameRows(msServed(full), msServed(ni), "post-purge manifest")
  }
}
