package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{NearDupOps, QualityOps}

/** q157's crafted-corpus battery: incremental manifest maintenance
  * (resident component state + one ingest batch) must equal the full
  * recompute over the union, with EVERY flip family engaged — the
  * paths the fixture corpus may not exercise:
  *
  *  - near-cluster MERGE: a batch doc bridges two resident near-dup
  *    clusters, so a resident cluster-canonical ('keep') becomes
  *    'near' → drop_duplicate.
  *  - containment carrier flip: a batch superset doc becomes the
  *    carrier of a resident keep doc → 'contained'.
  *  - ngram contamination onset: a batch BENCH doc shares an 8-gram
  *    with a resident train doc → 'ngram'.
  *  - semantic contamination onset: a batch EVAL vector lands next to
  *    a resident train vector → 'semantic'.
  *  - chunk contamination onset: a batch bench doc shares a
  *    content-defined chunk (and NO 8-gram) with a resident train doc
  *    → 'chunk'. Chunk boundaries are content-defined, so the shared
  *    chunk is ENGINEERED: a deterministic vocabulary search places
  *    rolling-hash boundaries exactly around a 7-word shared segment
  *    (7 < 8 keeps the 8-gram arm silent) in both documents.
  *  - batch-side rows: a too_short doc, an exact duplicate of a
  *    resident doc, a semantically contaminated train doc, and a
  *    clean keeper appended to the packing order.
  *  - packing shift: resident docs flipping out of 'keep' move every
  *    later kept doc's start_tok.
  */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  // ---- the chunker's rolling hash, replicated for boundary search
  //      (pinned to QualityOps.chunkStarts / expressions.CdcChunks:
  //      wordVal = md5 hex prefix % 1021; boundary at i >= 3 when
  //      v(i-2)*961 + v(i-1)*31 + v(i) ≡ 0 mod 16)
  private def wv(w: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 6), 16) % 1021L
  }
  private def isB(a: String, b: String, c: String): Boolean =
    (wv(a) * 961L + wv(b) * 31L + wv(c)) % 16L == 0L

  /** Append `k` words from the `prefix` pool, skipping any candidate
    * that would place a chunk boundary at its own position.
    */
  private def appendClean(buf: mutable.Buffer[String], prefix: String,
                          k: Int): Unit = {
    var i = 0
    var added = 0
    while (added < k) {
      val w = s"$prefix$i"
      i += 1
      if (buf.size < 2 || !isB(buf(buf.size - 2), buf(buf.size - 1), w)) {
        buf += w; added += 1
      }
    }
  }

  /** A 7-word segment with no interior boundary, shared verbatim by
    * the two chunk-flip docs.
    */
  private lazy val seg: Seq[String] = {
    val b = mutable.Buffer[String]()
    appendClean(b, "gq", 7)
    b.toSeq
  }

  /** Splice `seg` into a doc so it forms EXACTLY one chunk: find a
    * clean (x, y) with a boundary at seg's first word and none at its
    * second, then a successor with a boundary right after the
    * segment. All filler from the doc-specific `prefix` pool.
    */
  private def chunkFlipDoc(prefix: String, withStop: Boolean): String = {
    val buf = mutable.Buffer[String]()
    appendClean(buf, prefix + "a", 4)
    if (withStop) {
      // "the" placed mid-prefix; retry the spot if it forms a boundary
      if (!isB(buf(buf.size - 2), buf(buf.size - 1), "the")) buf += "the"
      else { appendClean(buf, prefix + "s", 1); buf += "the" }
      require(!isB(buf(buf.size - 2), buf(buf.size - 1), "the") ||
        buf.last == "the")
    }
    appendClean(buf, prefix + "b", 4)
    // search the boundary-forming pair (x, y)
    val cands = (0 until 4000).map(i => s"$prefix-x$i")
    val pair = (for {
      x <- cands.iterator
      if !isB(buf(buf.size - 2), buf(buf.size - 1), x)
      y <- cands.iterator
      if !isB(buf.last, x, y) && isB(x, y, seg(0)) && !isB(y, seg(0), seg(1))
    } yield (x, y)).next()
    buf += pair._1 += pair._2
    buf ++= seg
    val q = (0 until 4000).map(i => s"$prefix-q$i")
      .find(q => isB(seg(5), seg(6), q)).get
    buf += q
    appendClean(buf, prefix + "c", 6)
    buf.mkString(" ")
  }

  /** Generic quality-passing doc: n distinct pool tokens, optional
    * stopword (bench docs omit it so no train chunk can accidentally
    * equal a bench chunk — every bench token pool is doc-specific).
    */
  private def genDoc(prefix: String, n: Int, withStop: Boolean = true): String = {
    val toks = (0 until n).map(i => s"$prefix$i").toBuffer
    if (withStop) toks.insert(2, "the")
    toks.mkString(" ")
  }

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("source", lit("spec"))

  private def embDf(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def dv(verdicts: DataFrame): DataFrame =
    verdicts.select(col("doc_id"), col("verdict").as("d_v"))
  private def ctv(verdicts: DataFrame): DataFrame =
    verdicts.filter(col("is_kept") === 0)
      .select(col("doc_id"), lit(1).as("ct"))

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)
      .sortBy(r => r.head.asInstanceOf[Long])

  test("incremental manifest == full recompute; every flip family engages") {
    // fixed-width token pools for the near-dup quartet: identical
    // n_chars keeps all five in one (lang, n_chars/64) blocking bucket
    def w4(p: String, i: Int) = f"$p${i}%03d"
    val aTok = (1 to 25).map(w4("a", _))
    val cTok = (1 to 25).map(w4("c", _))
    val dTok = (1 to 8).map(w4("d", _))
    val doc2 = (aTok.take(12) :+ "the") ++ aTok.slice(13, 25)
    val doc3 = (aTok.take(12) :+ "the") ++ aTok.slice(13, 17) ++ dTok.map(_ + "b")
    val doc4 = (cTok.take(12) :+ "the") ++ cTok.slice(13, 25)
    val doc5 = (cTok.take(12) :+ "the") ++ cTok.slice(13, 17) ++ dTok
    // the bridge: a 12-token run of doc3 plus doc5's c/d tail run
    val bridge = aTok.take(12) ++ cTok.slice(13, 17) ++ dTok

    val ngram8 = (1 to 8).map(i => s"p8n$i")
    val tN = genDoc("m", 26).split(" ").toSeq ++ ngram8 ++
      (1 to 4).map(i => s"m2x$i")
    val bN = genDoc("r", 16, withStop = false).split(" ").toSeq ++ ngram8

    val doc9 = genDoc("h", 19)
    val doc1009 = doc9 + " " + (1 to 30).map(i => s"k$i").mkString(" ")
    val doc11 = genDoc("v", 19)

    val residentRows: Seq[(Long, String)] = Seq(
      0L -> genDoc("z", 20, withStop = false), // resident bench doc
      2L -> doc2.mkString(" "),
      3L -> doc3.mkString(" "),
      4L -> doc4.mkString(" "),
      5L -> doc5.mkString(" "),
      7L -> genDoc("e", 19), // semantic-flip target (vec below)
      9L -> doc9, // containment carrier-flip target
      11L -> doc11, // exact-dup source
      21L -> tN.mkString(" "), // ngram-flip target
      23L -> chunkFlipDoc("ca", withStop = true), // chunk-flip target
      31L -> genDoc("f31u", 19), 33L -> genDoc("f33u", 19),
      35L -> genDoc("f35u", 19), 37L -> genDoc("f37u", 19),
      45L -> genDoc("f45u", 19))
    val batchRows: Seq[(Long, String)] = Seq(
      1000L -> bN.mkString(" "), // bench: ngram source
      1005L -> bridge.mkString(" "), // near-cluster bridge
      1007L -> genDoc("s", 19), // train doc semantically contaminated
      1009L -> doc1009, // containment carrier (superset of doc 9)
      1011L -> doc11, // exact duplicate of resident 11
      1013L -> "x1 x2 x3 x4 x5", // too_short
      1017L -> genDoc("t", 19), // clean keeper
      1050L -> chunkFlipDoc("cb", withStop = false)) // bench: chunk source

    // sanity on the engineered chunk splice: both docs contain the
    // shared 7-word segment and no 8-token run is shared
    val segStr = seg.mkString(" ")
    assert(residentRows.toMap.apply(23L).contains(segStr))
    assert(batchRows.toMap.apply(1050L).contains(segStr))

    val evalV = Seq(0f, 0f, 0f, 1f)
    val semV = Seq(1f, 0f, 0f, 0f)
    val resEmbRows = Seq(0L -> evalV, 7L -> semV)
    val batchEmbRows = Seq(1007L -> evalV, 1050L -> semV)

    val resident = docsDf(residentRows)
    val batch = docsDf(batchRows)
    val union = docsDf(residentRows ++ batchRows)
    val resEmb = embDf(resEmbRows)
    val batchEmb = embDf(batchEmbRows)
    val unionEmb = embDf(resEmbRows ++ batchEmbRows)

    // resident (pre-ingest) state and stores
    val stRes = QualityOps.manifestStateOn(resident, resEmb)
    val dedupRes = NearDupOps.dedupVerdictsOn(resident)
    val contStateRes = NearDupOps.containmentStateOn(resident)
    val pre = canon(QualityOps.manifestFrom(stRes, dv(dedupRes),
      ctv(contStateRes.verdicts)))

    // incremental: advance the manifest state by the batch; dedup and
    // containment arrive through their own incremental engines (the
    // store paths q153/q156 pin)
    val dedupInc = NearDupOps.incrementalVerdicts(resident, dedupRes, batch)
    val contInc = NearDupOps.incrementalContainmentVerdicts(
      contStateRes, batch)
    val inc = canon(QualityOps.incrementalManifest(
      stRes, batch, batchEmb, dv(dedupInc), ctv(contInc)))

    // full recompute over the union
    val full = canon(QualityOps.manifestFrom(
      QualityOps.manifestStateOn(union, unionEmb),
      dv(NearDupOps.dedupVerdictsOn(union)),
      ctv(NearDupOps.containmentVerdictsOn(NearDupOps.containmentOn(union)))))

    assert(inc === full)

    def byDoc(rows: Seq[Seq[Any]]): Map[Long, (String, String)] =
      rows.map(r => r.head.asInstanceOf[Long] ->
        (r(1).asInstanceOf[String], r(2).asInstanceOf[String])).toMap
    val preM = byDoc(pre)
    val postM = byDoc(inc)

    // every resident flip family engaged
    assert(preM(21L) === (("keep", "keep")))
    assert(postM(21L) === (("drop_contaminated", "ngram")))
    assert(preM(7L) === (("keep", "keep")))
    assert(postM(7L) === (("drop_contaminated", "semantic")))
    assert(preM(23L) === (("keep", "keep")))
    assert(postM(23L) === (("drop_contaminated", "chunk")))
    assert(preM(4L) === (("keep", "keep"))) // canonical of {4,5} pre-merge
    assert(postM(4L) === (("drop_duplicate", "near"))) // bridged to comp 2
    assert(preM(9L) === (("keep", "keep")))
    assert(postM(9L) === (("drop_duplicate", "contained")))
    // batch-side rows
    assert(postM(1013L) === (("drop_quality", "too_short")))
    assert(postM(1011L) === (("drop_duplicate", "exact")))
    assert(postM(1007L) === (("drop_contaminated", "semantic")))
    assert(postM(1017L) === (("keep", "keep")))
    assert(postM(1009L) === (("keep", "keep"))) // the carrier survives

    // packing shifted for a later kept resident doc (earlier docs
    // flipped out of keep, so its start_tok moved down)
    def startTok(rows: Seq[Seq[Any]], id: Long): Any =
      rows.find(_.head == id).get.apply(4)
    assert(startTok(pre, 45L) !== startTok(inc, 45L))
  }

  test("persisted-state semantic arm: the IVF probe at nprobe=k equals " +
      "the exhaustive cross-join, carries dynamic partition pruning, " +
      "and nprobe<k prunes the resident rows it scores") {
    // 40 resident train docs/vectors in four orthogonal-axis clusters
    // (ids 1..40 are all %50 != 0 → all train; no eval vectors at
    // build, so every resident max_eval_cos starts NULL and any probed
    // d_mec touches its row)
    val resDocs = docsDf((1L to 40L).map(i => i -> genDoc(s"sp$i", 19)))
    val resEmb = embDf((1L to 40L).map { i =>
      val axis = (i % 4).toInt
      i -> Seq.tabulate(4)(j =>
        if (j == axis) 1f + (i % 7) * 0.01f else (i % 3) * 0.001f)
    })
    val stDir = java.nio.file.Files.createTempDirectory("mfsem").toString
    QualityOps.writeManifestState(
      QualityOps.manifestStateOn(resDocs, resEmb), stDir)
    val stIx = QualityOps.readManifestState(spark, stDir)
    assert(stIx.semIndex.isDefined,
      "the persisted state must carry its semantic probe index")

    // batch: one bench doc whose eval vector sits on axis 0 — both
    // parquet-backed with the ingest id-threshold filter, the
    // production arrival shape (a filterless in-memory relation would
    // give the optimizer no selective predicate to derive dynamic
    // partition pruning from)
    val arrDir = java.nio.file.Files.createTempDirectory("mfarr").toString
    docsDf(Seq(1050L -> genDoc("bt", 19)))
      .write.mode("overwrite").parquet(s"$arrDir/docs")
    embDf(Seq(1050L -> Seq(1f, 0f, 0f, 0f)))
      .write.mode("overwrite").parquet(s"$arrDir/emb")
    val batch = spark.read.parquet(s"$arrDir/docs")
      .filter(col("doc_id") >= 1000L)
    val batchEmb = spark.read.parquet(s"$arrDir/emb")
      .filter(col("vec_id") >= 1000L)

    val dProbe = QualityOps.manifestDelta(stIx, batch, batchEmb)
    val dFull = QualityOps.manifestDelta(
      stIx.copy(semIndex = None), batch, batchEmb)
    // (a) nprobe = k is EXHAUSTIVE: the resident contamination delta
    //     equals the full cross-join's row for row
    val probed = canon(dProbe.contamChanged)
    assert(probed === canon(dFull.contamChanged))
    assert(probed.size === 40, "every resident vector must be touched")
    // (b) the probe plan reads the cell-partitioned store under
    //     dynamic partition pruning (the q128/q154 scan discipline)
    val plan = dProbe.contamChanged.queryExecution.executedPlan
      .toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"the semantic delta scan carries no dynamic partition pruning:\n$plan")
    // (c) nprobe < k prunes: only the probed cell's residents are
    //     scored (fewer touched rows), and every row it does emit is
    //     the EXACT cosine the exhaustive pass computed
    val st1 = stIx.copy(semIndex = stIx.semIndex.map(_.copy(nprobe = 1)))
    val d1 = canon(QualityOps.manifestDelta(st1, batch, batchEmb)
      .contamChanged)
    assert(d1.nonEmpty && d1.size < probed.size,
      s"nprobe=1 must score a strict subset of residents, got ${d1.size}")
    val fullByDoc = probed.map(r => r.head -> r).toMap
    d1.foreach(r => assert(r === fullByDoc(r.head),
      s"nprobe=1 row for doc ${r.head} diverged from the exact cosine"))
  }

  test("ten pinned in-session appends == one full build, with a flat " +
      "per-append plan (the lineage bound)") {
    def batchRows(b: Int): Seq[(Long, String)] = {
      val base = 1000L * (b + 1)
      // one bench doc per batch (id %50 == 0) + seven train docs
      (base +: (1L to 7L).map(base + _))
        .map(id => id -> genDoc(s"lb${b}d$id", 19))
    }
    def batchEmbRows(b: Int): Seq[(Long, Seq[Float])] = {
      val base = 1000L * (b + 1)
      Seq(base -> Seq(0f, 0f, 1f, 0f), // eval vector
        (base + 3) -> Seq(1f, 0f, (b % 3) * 0.1f, 0f))
    }
    val res = (1L to 9L).map(i => i -> genDoc(s"lr$i", 19))
    val resEmb = Seq(2L -> Seq(1f, 0f, 0f, 0f), 4L -> Seq(0f, 1f, 0f, 0f))

    var st = QualityOps.pinManifestState(
      QualityOps.manifestStateOn(docsDf(res), embDf(resEmb)))
    var planSizes = Vector.empty[Int]
    for (b <- 0 until 10) {
      st = QualityOps.pinManifestState(QualityOps.advanceManifestState(
        st, docsDf(batchRows(b)), embDf(batchEmbRows(b))))
      planSizes :+= st.contam.queryExecution.logical
        .numberedTreeString.linesIterator.size
    }
    // pinned states are checkpoint leaves: the plan does NOT deepen
    // with the append count
    assert(planSizes.max <= planSizes.head,
      s"per-append plan grew across pinned appends: $planSizes")

    val full = QualityOps.manifestStateOn(
      docsDf(res ++ (0 until 10).flatMap(batchRows)),
      embDf(resEmb ++ (0 until 10).flatMap(batchEmbRows)))
    for ((n, got) <- st.relations) {
      val want = full.relations.toMap.apply(n)
      assert(canonAny(got) === canonAny(want),
        s"relation $n diverged after ten pinned appends")
    }
  }

  private def canonAny(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq.map {
      case f: Float => f.toDouble
      case x => x
    }).sortBy(_.mkString("|"))
}
