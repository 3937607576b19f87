package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.EpochStore

/** The persisted MANIFEST STORE — the seventh build-once/
  * maintain-forever store, and the production artifact behind q160:
  * the component state of the q146/q157 training manifest as
  * delta-epoch tables, so a daily batch updates the shipped manifest
  * without a full recompute AND without rewriting resident rows it
  * didn't change.
  *
  * Layout under `path` — eight [[EpochStore]] tables mirroring
  * [[QualityOps.ManifestState]]:
  *
  *  - `quality/`     (doc_id, q_v, n_tokens): APPEND-ONLY — quality
  *    verdicts are per-doc map-side, a batch only adds rows.
  *  - `contam/`      (doc_id, n_bench_docs, max_eval_cos, n_chunks,
  *    n_shared, seq): LWW by doc — the ONE mutable table: a batch's
  *    bench docs can update resident train rows. Each epoch carries
  *    exactly the batch's own train rows plus the resident rows its
  *    delta probes TOUCHED ([[QualityOps.manifestDelta]]) — the
  *    "delta rows only for docs whose components changed" write
  *    volume.
  *  - `trainsh8/ benchsh8/ trainchunks/ evalchunks/ trainemb/
  *    evalemb/`: the contamination probe indexes, all append-only
  *    (eval-chunk epochs carry only NEWLY-introduced strings, kept
  *    disjoint by the delta's anti-join).
  *
  * What is deliberately NOT stored: decisions, reasons, packing.
  * [[manifest]] derives them at read by folding precedence against
  * the dedup / containment store views and re-running the PrefixSum
  * packing — a single verdict flip shifts every later kept doc's
  * start_tok, so storing them would force a full-table rewrite per
  * append (the q157 design note, now a storage contract).
  *
  * RIGHT-TO-BE-FORGOTTEN (round 14 — the round-13 boundary, closed
  * by taking the documented provenance trade): `evalchunks/` and
  * `evalemb/` now carry the introducing doc's id (`eval_id`), so
  * both sides of every takedown are EXACT. A forgotten TRAIN doc is
  * pure tombstone exclusion (no other row's value depends on it). A
  * forgotten EVAL/BENCH doc exactly DECREMENTS the contam
  * aggregates: the three probes (shared bench shingles, eval-chunk
  * strings whose LAST introducer left, eval vectors achieving a
  * row's stored max) identify the takedown-bounded affected train
  * rows, and [[forget]] recomputes exactly those rows' aggregates
  * over the post-forget eval state — ForgetSpec pins equality with
  * the never-ingested build on every read surface. Tombstoned ids
  * are excluded from keyed reads immediately, purged at compaction;
  * a crash between the tombstone and the contam delta heals
  * deterministically from storage (the CalibrationStore /
  * ContainmentStore discipline). Composed reads fold the
  * ContainmentStore view, which closed the same boundary the same
  * round.
  *
  * Exactly-once — the [[ContainmentStore]] scheme: every read an
  * append performs EXCLUDES the in-flight epoch id, so a redelivery
  * reconstructs the exact pre-append state, recomputes the identical
  * eight deltas ([[QualityOps.manifestDelta]] is deterministic), and
  * each per-table commit either no-ops or completes; no table
  * ordering is load-bearing. All reads go through one pinned
  * [[EpochStore.snapshot]] so a maintenance flip cannot hand a
  * composed read mixed table versions. Single-maintenance-writer
  * contract throughout.
  */
object ManifestStore {

  private val Tables = Seq("quality", "contam", "trainsh8", "benchsh8",
    "trainchunks", "evalchunks", "trainemb", "evalemb")

  /** The semantic probe codebook — a version-scoped SIDECAR of the
    * `trainemb` table (the [[IvfIndex]] `_codebook` discipline): it
    * lives inside the table's manifest version, so a rebuild flips
    * codebook and cell assignments in ONE atomic rename.
    */
  private val SemCodebookName = "_semcodebook"

  /** The codebook of a PINNED trainemb version dir — resolved through
    * the caller's snapshot so a maintenance flip can never pair a new
    * codebook with old assignments (or vice versa).
    */
  private def loadSemCodebook(spark: SparkSession,
      trainembVersionDir: String): Option[Seq[(Int, Seq[Double])]] = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(trainembVersionDir, SemCodebookName)
    if (!java.nio.file.Files.isDirectory(dir)) None
    else {
      val s = java.nio.file.Files.list(dir)
      val parts =
        try s.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".parquet")).toSeq
        finally s.close()
      // bounded model state: k ≤ IvfCells codebook rows (the
      // IvfIndex.loadCodebook collect pattern)
      Some(spark.read.parquet(parts: _*).collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1))
        .sortBy(_._1).toSeq)
    }
  }

  /** Build the store from scratch: one [[QualityOps.manifestStateOn]]
    * pass, each relation as the base epoch of its table. The
    * `trainemb` base is stored CELL-PARTITIONED under a codebook
    * trained here (staged as a version-scoped sidecar), so the
    * semantic delta arm of every later append PROBES the stored
    * cells under dynamic partition pruning instead of scanning every
    * resident embedding ([[QualityOps.SemanticIndex]]).
    */
  def build(docs: DataFrame, emb: DataFrame, path: String,
            chunks: Option[DataFrame] = None,
            signals: Option[DataFrame] = None): String = {
    val ch = chunks.getOrElse(QualityOps.chunkRelationOf(docs))
      .select(col("doc_id"), col("chunk_str"))
    val st = QualityOps.manifestStateOn(docs, emb, Some(ch), signals)
    val base = Map(
      "quality" -> st.quality,
      "contam" -> st.contam.withColumn("seq", lit(0L)),
      "trainsh8" -> st.trainSh8, "benchsh8" -> st.benchSh8,
      "trainchunks" -> st.trainChunks,
      // the eval sides carry their INTRODUCER's id — the provenance
      // that makes an eval-doc takedown exactly decrementable (the
      // read views project it away)
      "evalchunks" -> evalChunkPairsOf(ch),
      "trainemb" -> st.trainEmb, "evalemb" -> evalEmbRowsOf(emb))
    val cb = QualityOps.semCodebookOf(st.trainEmb)
    Tables.foreach {
      case "trainemb" if cb.nonEmpty =>
        EpochStore.create(s"$path/trainemb", rebuild = true) { dir =>
          val verDir = dir.stripSuffix("/epoch=base")
          import st.trainEmb.sparkSession.implicits._
          cb.toDF("c_id", "c_emb").coalesce(1)
            .write.mode("overwrite").parquet(s"$verDir/$SemCodebookName")
          QualityOps.assignSemCells(st.trainEmb, cb)
            .write.mode("overwrite").partitionBy("cell").parquet(dir)
        }
      case t =>
        EpochStore.create(s"$path/$t", rebuild = true) { dir =>
          base(t).write.mode("overwrite").parquet(dir)
        }
    }
    path
  }

  /** The eval docs' (eval_id, chunk_str) provenance pairs of a chunk
    * relation — what `evalchunks/` persists (the read view projects
    * distinct strings).
    */
  private def evalChunkPairsOf(ch: DataFrame): DataFrame =
    ch.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("eval_id"), col("chunk_str")).distinct()

  /** The capped eval vectors WITH their doc id — what `evalemb/`
    * persists.
    */
  private def evalEmbRowsOf(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 50 === 0 &&
        col("vec_id") < Similarity.ExactBaselineVecCap)
      .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"))

  /** The resolved [[QualityOps.ManifestState]] view, optionally
    * excluding in-flight epoch ids (the redelivery trick). One pinned
    * snapshot across all eight tables. Tombstoned ids are excluded
    * from every keyed surface (train tables by doc/vec id, eval
    * tables by their provenance id).
    */
  private[graft] def stateView(spark: SparkSession, path: String,
      excludeIds: Set[Long] = Set.empty,
      nprobe: Int = Similarity.IvfCells): QualityOps.ManifestState =
    resolvedState(spark, path, excludeIds,
      Some(graft.engine.Tombstones.ids(spark, path)), nprobe)

  /** [[stateView]] with the doc-exclusion frame explicit — the heal
    * path passes only the ALREADY-APPLIED forgotten ids so the epoch
    * being healed still sees its docs' pre-forget rows.
    */
  private def resolvedState(spark: SparkSession, path: String,
      excludeIds: Set[Long],
      excludeDocs: Option[DataFrame],
      nprobe: Int = Similarity.IvfCells): QualityOps.ManifestState = {
    val snap = EpochStore.snapshot(Tables.map(t => s"$path/$t"))
    def raw(t: String) = {
      val r = snap.read(spark, s"$path/$t")
      if (excludeIds.isEmpty) r
      else r.filter(!col("epoch").isin(excludeIds.map(_.toString).toSeq: _*))
    }
    def minus(df: DataFrame, key: String): DataFrame =
      excludeDocs match {
        case Some(f) if df.columns.contains(key) =>
          df.join(broadcast(f.select(col("doc_id").as(key))), Seq(key),
            "left_anti")
        case _ => df // pre-provenance layout: no eval_id column
      }
    val semIx = loadSemCodebook(spark, snap.dir(s"$path/trainemb"))
      .map { cb =>
        QualityOps.SemanticIndex(
          minus(raw("trainemb"), "vec_id")
            .select(col("cell"), col("vec_id"), col("embedding")),
          cb, nprobe)
      }
    val contam = minus(raw("contam"), "doc_id")
      .groupBy(col("doc_id"))
      .agg(max(struct(col("seq"), col("n_bench_docs"), col("max_eval_cos"),
        col("n_chunks"), col("n_shared"))).as("s"))
      .select(col("doc_id"), col("s.n_bench_docs").as("n_bench_docs"),
        col("s.max_eval_cos").as("max_eval_cos"),
        col("s.n_chunks").as("n_chunks"), col("s.n_shared").as("n_shared"))
    QualityOps.ManifestState(
      quality = minus(raw("quality"), "doc_id")
        .select(col("doc_id"), col("q_v"), col("n_tokens")),
      contam = contam,
      trainSh8 = minus(raw("trainsh8"), "doc_id")
        .select(col("doc_id"), col("sh")),
      benchSh8 = minus(raw("benchsh8"), "bench_id")
        .select(col("bench_id"), col("sh")),
      trainChunks = minus(raw("trainchunks"), "doc_id")
        .select(col("doc_id"), col("chunk_str")),
      evalChunks = minus(raw("evalchunks"), "eval_id")
        .select(col("chunk_str")).distinct(),
      trainEmb = minus(raw("trainemb"), "vec_id")
        .select(col("vec_id"), col("embedding")),
      evalEmb = minus(raw("evalemb"), "eval_id").select(col("e_emb")),
      semIndex = semIx)
  }

  /** Append one ingest batch (docs + the same id slice of the
    * embeddings) as epoch `id`. Replay-idempotent and crash-healing:
    * see the object doc.
    */
  def appendEpoch(batch: DataFrame, batchEmb: DataFrame, path: String,
                  id: Long): Unit = {
    val spark = batch.sparkSession
    // a dangling forget's delta must land BEFORE this append reads
    // the state (deterministic from storage, so healing inline keeps
    // the stream available)
    healForgetDeltas(spark, path)
    if (Tables.forall(t => EpochStore.committed(s"$path/$t", id)))
      return // full replay — storage-level no-op
    graft.engine.Tombstones.requireNotTombstoned(spark, path,
      batch.select("doc_id"), "ManifestStore")
    val state = stateView(spark, path, excludeIds = Set(id))
    // append-only id contract (the ContainmentStore guard): a
    // re-ingested doc would duplicate its append-only rows and
    // double-count every contamination probe
    val overlap = state.quality
      .join(broadcast(batch.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .limit(1).count()
    if (overlap > 0)
      throw new IllegalArgumentException(
        s"ManifestStore at $path: append batch contains doc_id(s) " +
          "already resident — component tables are append-only (only " +
          "contamination rows mutate, and only via delta probes); " +
          "appends must carry NEW ids only")
    val seqRow = EpochStore.read(spark, s"$path/contam")
      .filter(col("epoch") =!= id.toString)
      .agg(max(col("seq"))).head()
    val seqNext = (if (seqRow.isNullAt(0)) 0L else seqRow.getLong(0)) + 1L
    val d = QualityOps.manifestDelta(state, batch, batchEmb)
    // the batch's train vectors join the probed layout under the
    // STORED codebook (the q154 production contract: daily arrivals
    // are assigned under yesterday's codebook; staleness is a rebuild
    // cadence knob, not a correctness one — probes use the same
    // stored codebook, so assignment and probe cannot drift)
    val storedCb = loadSemCodebook(spark,
      EpochStore.liveDir(s"$path/trainemb"))
    val trainEmbDelta = storedCb match {
      case Some(cb) => QualityOps.assignSemCells(d.trainEmb, cb)
      case None => d.trainEmb
    }
    // the persisted eval sides carry provenance (batch ids are new,
    // so the pairs are disjoint from stored rows by construction);
    // the delta's RESIDENT-update math still uses d.evalChunks /
    // d.evalEmb — only the storage shape widens
    val evalChunkPairs = evalChunkPairsOf(
      QualityOps.chunkRelationOf(batch.filter(col("doc_id") % 50 === 0))
        .select(col("doc_id"), col("chunk_str")))
    // layout-matched eval deltas, decided PER TABLE off each table's
    // own base: a pre-provenance (pre-round-14) table must stay
    // uniformly pre-provenance — writing eval_id-carrying delta files
    // into a provenance-less base would leave that table's per-file
    // schemas mixed, and the provenance gate (requireEvalProvenance
    // reads the merged schema) nondeterministic. A store whose two
    // eval tables DISAGREE is refused outright: one shared verdict
    // (the pre-round-16 exists() bug) would drop eval_id from the
    // still-provenanced table's delta — null eval_id rows its forget
    // heal's provenance joins silently miss. The migration path is a
    // rebuild, never an append.
    val legacyByTable = Seq("evalchunks", "evalemb").map(t =>
      t -> !EpochStore.read(spark, s"$path/$t").columns
        .contains("eval_id")).toMap
    if (legacyByTable.values.toSeq.distinct.size > 1)
      throw new IllegalStateException(
        s"ManifestStore at $path: eval tables disagree on the " +
          "provenance layout (" +
          legacyByTable.map { case (t, l) =>
            s"$t=${if (l) "pre" else "post"}-provenance"
          }.mkString(", ") +
          ") — appending to a half-migrated store is unsafe in both " +
          "directions: dropping eval_id starves the provenanced " +
          "table's forget heal, keeping it mixes per-file schemas in " +
          "the legacy one. Re-run ManifestStore.build to migrate " +
          "both tables together.")
    def layoutMatched(t: String, df: DataFrame): DataFrame =
      if (legacyByTable(t)) df.drop("eval_id") else df
    val deltas = Map(
      "quality" -> d.quality,
      "contam" -> d.contamChanged.unionByName(d.contamBatch)
        .withColumn("seq", lit(seqNext)),
      "trainsh8" -> d.trainSh8, "benchsh8" -> d.benchSh8,
      "trainchunks" -> d.trainChunks,
      "evalchunks" -> layoutMatched("evalchunks", evalChunkPairs),
      "trainemb" -> trainEmbDelta,
      "evalemb" -> layoutMatched("evalemb", evalEmbRowsOf(batchEmb)))
    // materialize every delta BEFORE the first commit mutates the
    // stores the delta plans read (the ContainmentStore rule)
    val staged = deltas.map { case (t, df) => t -> df.localCheckpoint(true) }
    Tables.foreach { t =>
      EpochStore.commitEpoch(s"$path/$t", id) { tmp =>
        val w = staged(t).write.mode("overwrite")
        (if (t == "trainemb" && storedCb.isDefined) w.partitionBy("cell")
         else w).parquet(tmp)
      }
    }
  }

  /** Ad-hoc batch append: id from the LAGGING table, so a crashed
    * half-commit is completed (reads exclude the in-flight id, so the
    * recomputed deltas are identical) before new ids are minted.
    */
  def append(batch: DataFrame, batchEmb: DataFrame, path: String): Unit = {
    val id = Tables.map(t => EpochStore.nextAppendEpochId(s"$path/$t")).min
    appendEpoch(batch, batchEmb, path, id)
  }

  /** The shipped manifest served from the store: fold precedence
    * against the dedup / containment verdict tables (in production:
    * [[VerdictStore.read]] and [[ContainmentStore.read]] views) and
    * derive packing — all doc-keyed (the q157 read shape).
    */
  def manifest(spark: SparkSession, path: String,
               dedup: DataFrame, contained: DataFrame): DataFrame =
    QualityOps.manifestFrom(stateView(spark, path), dedup, contained)

  /** EXACT right-to-be-forgotten, both sides of the takedown:
    * tombstone the ids (train rows vanish from every keyed read
    * immediately; eval rows vanish from the probe views via their
    * provenance id), then commit the contam decrement delta — the
    * recomputed aggregates of exactly the train rows the forgotten
    * EVAL docs touched — as one forget-band epoch across all eight
    * tables (empty on the seven append-only ones, committed only to
    * keep the id sets converged). Replay-idempotent and
    * crash-healing like the sibling stores. Requires the round-14
    * provenance layout when the batch contains eval ids.
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    val hasEval = ids.select(col(ids.columns.head).cast("long").as("i"))
      .filter(col("i") % 50 === 0).limit(1).count() > 0
    if (hasEval) requireEvalProvenance(spark, path)
    val id = math.max(
      if (graft.engine.Archive.hasVersion(s"$path/forgotten"))
        EpochStore.nextForgetEpochId(s"$path/forgotten")
      else EpochStore.ForgetFloor,
      Tables.map(t => EpochStore.nextForgetEpochId(s"$path/$t")).max)
    graft.engine.Tombstones.forget(spark, path, ids, withId = Some(id))
    healForgetDeltas(spark, path)
  }

  private def requireEvalProvenance(spark: SparkSession,
      path: String): Unit = {
    val ok = Seq("evalchunks" -> "eval_id", "evalemb" -> "eval_id")
      .forall { case (t, c) =>
        EpochStore.read(spark, s"$path/$t").columns.contains(c) }
    if (!ok)
      throw new IllegalStateException(
        s"ManifestStore at $path stores its eval sides without " +
          "provenance (a pre-round-14 layout) — an eval-doc takedown " +
          "cannot be decremented exactly. Train-doc forgets remain " +
          "servable; re-run ManifestStore.build to migrate the layout " +
          "for eval-side forgets.")
  }

  /** Forget epochs committed in the tombstone table whose contam
    * delta has not landed.
    */
  private def danglingForgetIds(path: String): Set[Long] =
    (if (graft.engine.Archive.hasVersion(s"$path/forgotten"))
       EpochStore.committedIds(s"$path/forgotten")
     else Set.empty[Long]) -- EpochStore.committedIds(s"$path/contam")

  /** Commit the contam decrement for every tombstoned epoch whose
    * delta is missing — [[forget]]'s second half, re-runnable from
    * storage alone. The affected train rows are found by three
    * takedown-bounded probes and recomputed EXACTLY over the
    * post-forget eval state:
    *
    *  - n_bench_docs: rows sharing an 8-shingle with a forgotten
    *    bench doc, re-counted against the remaining bench postings
    *    (exact because benchSh8 always carried bench_id);
    *  - n_shared: rows holding a chunk string whose LAST introducer
    *    left (the provenance pairs make "last" decidable),
    *    re-counted against the remaining eval string set;
    *  - max_eval_cos: rows whose stored max is ACHIEVED by a
    *    forgotten eval vector (4dp-rounded equality — the stored
    *    value's own domain), re-maxed over the remaining eval
    *    vectors (NULL when none remain — the never-probed shape).
    *
    * A row missed by all three probes keeps its stored aggregates
    * verbatim: no shared shingle means its bench count is over the
    * unchanged set, no leaving string means its shared count is,
    * and a strict-below cosine cannot have been the max.
    */
  private def healForgetDeltas(spark: SparkSession, path: String): Unit = {
    import graft.functions.Vectors
    if (danglingForgetIds(path).isEmpty) return
    danglingForgetIds(path).toSeq.sorted.foreach { id =>
      val forgotten = EpochStore.read(spark, s"$path/forgotten")
      val applied = EpochStore.committedIds(s"$path/forgotten")
        .intersect(EpochStore.committedIds(s"$path/contam"))
      val appliedDocs =
        if (applied.isEmpty) None
        else Some(forgotten
          .filter(col("epoch").isin(applied.map(_.toString).toSeq: _*))
          .select(col("doc_id")))
      val fids = forgotten.filter(col("epoch") === id.toString)
        .select(col("doc_id")).localCheckpoint(true)
      val fEval = fids.filter(col("doc_id") % 50 === 0)
      // pre-forget view: this epoch's docs still visible
      val pre = resolvedState(spark, path, Set.empty, appliedDocs)
      // post-forget view: this epoch's docs gone too
      val post = resolvedState(spark, path, Set.empty,
        Some(appliedDocs.map(_.unionByName(fids)).getOrElse(fids)))
      // probe (a): rows sharing an 8-shingle with a forgotten bench
      val fBenchSh = pre.benchSh8.join(
        broadcast(fEval.select(col("doc_id").as("bench_id"))),
        Seq("bench_id"), "left_semi")
      val hitNgram = pre.trainSh8
        .join(fBenchSh.select(col("sh")).distinct(), Seq("sh"), "left_semi")
        .select(col("doc_id"))
      // probe (b): rows holding a string whose last introducer left
      val leavingStrs = pre.evalChunks
        .join(post.evalChunks, Seq("chunk_str"), "left_anti")
      val hitChunk = pre.trainChunks
        .join(broadcast(leavingStrs), Seq("chunk_str"), "left_semi")
        .select(col("doc_id"))
      // probe (c): rows whose stored max a forgotten vector achieves.
      // On a pre-provenance layout (no eval_id on evalemb) the probe
      // is structurally empty instead of a plan-time AnalysisException:
      // only TRAIN-doc forgets can be tombstoned there ([[forget]]
      // runs requireEvalProvenance BEFORE committing an eval-bearing
      // tombstone), so fEval is empty and the probe has nothing to
      // find — the promise that train forgets "remain servable" must
      // hold through this heal, which appendEpoch/maintain/compact
      // all re-run.
      val rawEvalEmb = EpochStore.read(spark, s"$path/evalemb")
      val hitSem =
        if (!rawEvalEmb.columns.contains("eval_id")) {
          // out-of-contract backstop: an eval-bearing tombstone can
          // only exist here if Tombstones.forget was called directly,
          // bypassing [[forget]]'s provenance gate — refuse rather
          // than heal an under-corrected delta silently
          if (fEval.limit(1).count() > 0) requireEvalProvenance(spark, path)
          spark.range(0).select(col("id").as("doc_id"))
        } else {
          val fVecs = rawEvalEmb
            .join(broadcast(fEval.select(col("doc_id").as("eval_id"))),
              Seq("eval_id"), "left_semi")
            .select(col("e_emb"))
          pre.trainEmb.crossJoin(broadcast(fVecs))
            .groupBy(col("vec_id"))
            .agg(max(round(Vectors.cosine(col("embedding"), col("e_emb")), 4))
              .as("fmax"))
            .join(pre.contam.select(col("doc_id").as("vec_id"),
              col("max_eval_cos")), Seq("vec_id"))
            .filter(col("fmax") <=> col("max_eval_cos"))
            .select(col("vec_id").as("doc_id"))
        }
      val affected = hitNgram.unionByName(hitChunk).unionByName(hitSem)
        .distinct()
        .join(broadcast(fids), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      // exact recompute of the affected rows over the POST state
      val nb = post.trainSh8.join(broadcast(affected), Seq("doc_id"),
          "left_semi")
        .join(post.benchSh8, Seq("sh"))
        .groupBy(col("doc_id"))
        .agg(count_distinct(col("bench_id")).as("nb"))
      val sem = post.trainEmb
        .join(broadcast(affected.select(col("doc_id").as("vec_id"))),
          Seq("vec_id"), "left_semi")
        .crossJoin(broadcast(post.evalEmb))
        .groupBy(col("vec_id"))
        .agg(max(round(Vectors.cosine(col("embedding"), col("e_emb")), 4))
          .as("mec"))
        .select(col("vec_id").as("doc_id"), col("mec"))
      val chunkAgg = post.trainChunks
        .join(broadcast(affected), Seq("doc_id"), "left_semi")
        .join(broadcast(post.evalChunks.withColumn("shared", lit(1))),
          Seq("chunk_str"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(coalesce(col("shared"), lit(0))).as("n_shared"))
      val seqRow = EpochStore.read(spark, s"$path/contam")
        .filter(col("epoch") =!= id.toString)
        .agg(max(col("seq"))).head()
      val seqNext = (if (seqRow.isNullAt(0)) 0L else seqRow.getLong(0)) + 1L
      val restamped = affected
        .join(nb, Seq("doc_id"), "left")
        .join(sem, Seq("doc_id"), "left")
        .join(chunkAgg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("nb"), lit(0L)).as("n_bench_docs"),
          col("mec").as("max_eval_cos"),
          col("n_chunks"), col("n_shared"))
        .withColumn("seq", lit(seqNext))
      val staged = restamped.localCheckpoint(true)
      Tables.foreach { t =>
        EpochStore.commitEpoch(s"$path/$t", id) { tmp =>
          val df =
            if (t == "contam") staged
            else EpochStore.read(spark, s"$path/$t").drop("epoch").limit(0)
          val w = df.write.mode("overwrite")
          (if (t == "trainemb" && df.columns.contains("cell"))
             w.partitionBy("cell")
           else w).parquet(tmp)
        }
      }
    }
  }

  /** Fold every table to its resolved rows (contam to LWW winners —
    * the GC of superseded component rows; append-only tables
    * concatenate) and PURGE tombstoned ids physically. Refuses over
    * a half-committed append; heals a dangling forget first (purging
    * before the heal would destroy the heal's inputs).
    */
  def compact(spark: SparkSession, path: String): Unit = {
    healForgetDeltas(spark, path)
    val sets = Tables.map(t => t -> EpochStore.committedIds(s"$path/$t"))
    if (sets.map(_._2).distinct.size != 1)
      throw new IllegalStateException(
        s"ManifestStore at $path has diverged epoch sets (" +
          sets.map { case (t, s) =>
            s"$t=${s.toSeq.sorted.mkString(",")}"
          }.mkString("; ") +
          ") — a half-committed append; heal via the appender's retry " +
          "before compacting")
    val st = stateView(spark, path)
    val seqRow = EpochStore.read(spark, s"$path/contam")
      .agg(max(col("seq"))).head()
    val seqKeep = if (seqRow.isNullAt(0)) 0L else seqRow.getLong(0)
    // the eval sides fold WITH their provenance columns (the views
    // project them away; the fold must not)
    def rawMinus(t: String, key: String) = {
      val r = EpochStore.read(spark, s"$path/$t").drop("epoch")
      if (r.columns.contains(key))
        r.join(broadcast(graft.engine.Tombstones.ids(spark, path)
          .select(col("doc_id").as(key))), Seq(key), "left_anti")
      else r
    }
    val folded = Map(
      "quality" -> st.quality,
      "contam" -> st.contam.withColumn("seq", lit(seqKeep)),
      "trainsh8" -> st.trainSh8, "benchsh8" -> st.benchSh8,
      "trainchunks" -> st.trainChunks,
      "evalchunks" -> rawMinus("evalchunks", "eval_id"),
      // the fold keeps the stored cell assignment (values unchanged,
      // no reassignment) so the probe layout and its codebook survive
      "trainemb" -> st.semIndex.map(_.cells).getOrElse(st.trainEmb),
      "evalemb" -> rawMinus("evalemb", "eval_id"))
      .map { case (t, df) => t -> df.localCheckpoint(true) }
    Tables.foreach { t =>
      EpochStore.create(s"$path/$t", rebuild = true) { dir =>
        if (t == "trainemb" && st.semIndex.isDefined) {
          val verDir = dir.stripSuffix("/epoch=base")
          import spark.implicits._
          st.semIndex.get.codebook.toDF("c_id", "c_emb").coalesce(1)
            .write.mode("overwrite").parquet(s"$verDir/$SemCodebookName")
          folded(t).write.mode("overwrite").partitionBy("cell").parquet(dir)
        } else folded(t).write.mode("overwrite").parquet(dir)
      }
    }
    graft.engine.Tombstones.clear(spark, path)
  }

  /** Compaction policy: fold only past `maxEpochs` committed epochs
    * on any table (the listing-cost bound).
    */
  def compactIfFragmented(spark: SparkSession, path: String,
                          maxEpochs: Int = 64): Boolean = {
    val fragmented =
      Tables.exists(t => EpochStore.epochCount(s"$path/$t") > maxEpochs) ||
        graft.engine.Tombstones.pending(spark, path)
    if (fragmented) compact(spark, path)
    fragmented
  }

  final case class MaintenanceReport(compacted: Boolean,
                                     diverged: Boolean,
                                     epochs: Map[String, Int],
                                     nTrainDocs: Long,
                                     supersededFrac: Double)

  /** One maintenance tick — the cron body, mirroring the other
    * stores: report a half-committed append first (touch nothing),
    * else apply the compaction policy, then one census: train docs
    * under management and the superseded-row fraction of the one
    * mutable table (the LWW GC debt `compact` would clear). A
    * diverged census reads the converged epoch-set intersection (the
    * ContainmentStore round-10 ADVICE fix, inherited).
    */
  def maintain(spark: SparkSession, path: String,
               maxEpochs: Int = 64): MaintenanceReport = {
    // a dangling forget heals deterministically from storage — the
    // tick repairs it before judging divergence; a half-committed
    // APPEND still reports untouched
    healForgetDeltas(spark, path)
    val idSets = Tables.map(t => EpochStore.committedIds(s"$path/$t"))
    val diverged = idSets.distinct.size != 1
    val compacted = !diverged && compactIfFragmented(spark, path, maxEpochs)
    val dangling =
      if (!diverged) Set.empty[Long]
      else idSets.reduce(_ union _) diff idSets.reduce(_ intersect _)
    val st = stateView(spark, path, excludeIds = dangling)
    val nTrain = st.contam.count()
    val rawContam = {
      val r = EpochStore.read(spark, s"$path/contam")
      (if (dangling.isEmpty) r
       else r.filter(!col("epoch").isin(dangling.map(_.toString).toSeq: _*)))
        .count()
    }
    MaintenanceReport(
      compacted = compacted,
      diverged = diverged,
      epochs = Tables.map(t =>
        t -> EpochStore.epochCount(s"$path/$t")).toMap,
      nTrainDocs = nTrain,
      supersededFrac =
        if (rawContam == 0) 0.0 else 1.0 - nTrain.toDouble / rawContam)
  }
}
