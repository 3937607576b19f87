package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.EpochStore

/** The persisted CONTAINMENT STORE — the fifth build-once /
  * maintain-forever store (IvfIndex, MinHashIndex, ChunkIndex,
  * VerdictStore), and the production artifact behind q155: the
  * quote/subset dedup verdict table plus the state that makes its
  * maintenance incremental. It is the store where arrivals MUTATE
  * resident rows by design — the df-relative informative measure
  * means a batch can flip resident verdicts (q155's drop / rise /
  * carrier-flip cases) — so every table is a DELTA-epoch store under
  * LAST-WRITE-WINS reads, and the two relation-valued tables carry
  * tombstones (`live = false`) because pairs and verdict rows can
  * VANISH, not just change (a doc whose informative set empties
  * leaves every cluster).
  *
  * Layout under `path` — four versioned EpochStores sharing the
  * atomic-epoch exactly-once contract:
  *
  *  - `dfs/`      (sh, df, seq): the document-frequency statistic,
  *    LWW by shingle. Each append re-stamps every batch-present
  *    shingle with its union df. Over-cap rows are KEPT — a future
  *    batch's shingle must never masquerade as new.
  *  - `perdoc/`   (doc_id, shs, n, plen, seq): q151's prefix arrays
  *    (the per-doc signature, folded once at ingest), LWW by doc.
  *    An affected doc's replacement row may carry an EMPTY array —
  *    that overwrite is what keeps a stale signature from pairing.
  *  - `pairs/`    (doc_a, doc_b, n_common, n_a, n_b, containment,
  *    live, seq): LWW by (doc_a, doc_b); dead rows tombstone stored
  *    pairs that stopped qualifying.
  *  - `verdicts/` (doc_id, cluster_id, canon_id, n, is_kept, live,
  *    seq): the q149 table, LWW by doc with tombstones.
  *
  * Exactly-once — SIMPLER than VerdictStore's ordered-commit dance,
  * because every read used by an append EXCLUDES the in-flight epoch
  * id: a redelivery (same id) reconstructs the exact pre-append
  * state from the stores, recomputes the identical four deltas
  * ([[NearDupOps.incrementalContainmentParts]] is deterministic),
  * and each per-table commit either no-ops (already renamed) or
  * completes. A crash between ANY of the four renames is healed by
  * redelivering the same (batch, id); no table ordering is
  * load-bearing. Batch appends ([[append]]) derive their id from the
  * lagging table and, on a crashed half-commit, verify the batch's
  * shingle set against the committed `dfs/` epoch before reusing the
  * id (a different batch fails loudly; a crashed epoch folded
  * out-of-band names its [[appendEpoch]] recovery) — MinHashIndex's
  * round-9 self-heal contract.
  *
  * Correctness: [[read]] after any build+append sequence equals the
  * q149 full recompute over the union corpus, row for row — q155's
  * exactness argument, inherited delta by delta. Spec-pinned in
  * ContainmentStoreSpec on the crafted df-crossing corpus (drop,
  * rise, merge, carrier flip, emptied-array overwrite, untouched).
  *
  * Single-maintenance-writer contract throughout: one appender, and
  * [[maintain]]/[[compact]] run between micro-batches or with the
  * append stream stopped.
  *
  * RIGHT-TO-BE-FORGOTTEN (round 14 — the round-13 boundary, closed
  * by taking the documented design trade): the store now persists a
  * fifth table `postings/` (doc_id, sh) — the FULL doc→shingle
  * relation, over-cap shingles included — precisely so a takedown
  * can be decremented EXACTLY: [[forget]] recomputes the union df
  * minus the forgotten docs' contributions, rebuilds the arrays of
  * the (takedown-bounded) docs whose informative sets GAIN a
  * requalified shingle, re-scores only pairs touching those docs,
  * and re-solves only adjacent clusters
  * ([[NearDupOps.forgetContainmentParts]] — the incremental append
  * engine in reverse; post-forget reads equal a fresh build over the
  * corpus minus the forgotten set, ForgetSpec-pinned). The sidecar's
  * price is the over-cap posting tail the arrays deliberately drop —
  * ~the corpus' shingle volume, the storage trade that buys
  * O(|takedown|) exact forgets instead of O(corpus) rebuilds per
  * request. Forgotten ids land in the shared tombstone table
  * ([[graft.engine.Tombstones]]): doc-keyed read surfaces exclude
  * them immediately, [[compact]] purges physically, and a crash
  * between the tombstone commit and the delta commit heals on the
  * next [[forget]]/[[maintain]]/[[appendEpoch]] (the delta
  * recomputes deterministically from storage — the CalibrationStore
  * discipline).
  */
object ContainmentStore {

  /** The four LWW delta tables (seq-stamped). */
  private val LwwTables = Seq("dfs", "perdoc", "pairs", "verdicts")

  /** All five epoch tables; `postings/` is the append-only full
    * doc→shingle sidecar (no seq — rows are never re-stamped, docs
    * are never re-ingested while resident).
    */
  private val Tables = LwwTables :+ "postings"

  /** Build the store: one full [[NearDupOps.containmentStateOn]] pass
    * (the one-time from-scratch cost), each relation as the base
    * epoch of its table. Rebuild carries the epoch ledgers.
    */
  def build(docs: DataFrame, path: String, tau: Double = 0.8,
            maxDf: Long = graft.queries.TextOps.MaxShingleDf): Unit = {
    // the measure parameters are STORE metadata, decided once at
    // build time: an append at a different (tau, maxDf) would
    // silently corrupt the state semantics (dfs crossings, prefix
    // lengths and pair scores all depend on them), so appends READ
    // this sidecar instead of taking parameters — the foot-gun the
    // streaming parity spec caught when appendStream defaulted to
    // the global maxDf against a maxDf=3 store.
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_params"), s"tau=$tau\nmaxDf=$maxDf")
    val st = NearDupOps.containmentStateOn(docs, tau, maxDf)
    val base = Map(
      "dfs" -> st.dfAll.withColumn("seq", lit(0L)),
      "perdoc" -> st.perDoc.withColumn("seq", lit(0L)),
      "pairs" -> st.pairs.withColumn("live", lit(true))
        .withColumn("seq", lit(0L)),
      "verdicts" -> st.verdicts.withColumn("live", lit(true))
        .withColumn("seq", lit(0L)),
      // the FULL doc→shingle relation, over-cap rows included — the
      // exact-forget sidecar (one extra shingling pass at build time;
      // appends derive theirs from the batch)
      "postings" -> fullPostingsOf(docs))
    Tables.foreach { t =>
      EpochStore.create(s"$path/$t", rebuild = true) { dir =>
        base(t).write.mode("overwrite").parquet(dir)
      }
    }
  }

  private def lwwBy(raw: DataFrame, keys: Seq[String],
                    payload: Seq[String]): DataFrame = raw
    .groupBy(keys.map(col): _*)
    .agg(max(struct((col("seq") +: payload.map(col)): _*)).as("s"))
    .select(keys.map(col) ++ payload.map(c => col(s"s.$c").as(c)): _*)

  /** The resolved [[NearDupOps.ContainmentState]] view of the store,
    * optionally EXCLUDING one in-flight epoch id — the redelivery
    * trick: reads that skip the crashed epoch reconstruct the exact
    * pre-append state, so a retry recomputes identical deltas. All
    * four tables are read through ONE pinned
    * [[EpochStore.snapshot]], narrowing the window in which a
    * maintenance flip racing this view could hand it table A
    * pre-fold and table B post-fold (mixed epoch sets would confuse
    * the redelivery exclusion, which reasons about epoch MEMBERSHIP,
    * not just values) from the whole read to the resolution loop;
    * the single-maintenance-writer contract remains the guarantee.
    */
  private[graft] def stateView(spark: SparkSession, path: String,
      excludeIds: Set[Long] = Set.empty): NearDupOps.ContainmentState =
    resolvedState(spark, path, excludeIds,
      Some(graft.engine.Tombstones.ids(spark, path)))

  /** [[stateView]] with the doc-exclusion frame explicit — the heal
    * path passes only the ALREADY-APPLIED forgotten ids so the
    * epoch being healed still sees its docs' pre-forget rows.
    */
  private def resolvedState(spark: SparkSession, path: String,
      excludeIds: Set[Long],
      excludeDocs: Option[DataFrame]): NearDupOps.ContainmentState = {
    val snap = EpochStore.snapshot(LwwTables.map(t => s"$path/$t"))
    def raw(t: String) = {
      val r = snap.read(spark, s"$path/$t")
      if (excludeIds.isEmpty) r
      else r.filter(!col("epoch").isin(excludeIds.map(_.toString).toSeq: _*))
    }
    def minus(df: DataFrame, keys: String*): DataFrame =
      excludeDocs match {
        case None => df
        case Some(f) => keys.foldLeft(df) { (d, k) =>
          d.join(broadcast(f.select(col("doc_id").as(k))), Seq(k),
            "left_anti")
        }
      }
    val pairsLive = minus(lwwBy(raw("pairs"), Seq("doc_a", "doc_b"),
      Seq("n_common", "n_a", "n_b", "containment", "live"))
      .filter(col("live")).drop("live"), "doc_a", "doc_b")
    val verdictsLive = minus(lwwBy(raw("verdicts"), Seq("doc_id"),
      Seq("cluster_id", "canon_id", "n", "is_kept", "live"))
      .filter(col("live")).drop("live"), "doc_id")
    NearDupOps.ContainmentState(
      dfAll = lwwBy(raw("dfs"), Seq("sh"), Seq("df")),
      perDoc = minus(lwwBy(raw("perdoc"), Seq("doc_id"),
        Seq("shs", "n", "plen")), "doc_id"),
      pairs = pairsLive,
      verdicts = verdictsLive)
  }

  /** The full doc→shingle relation of `docs` — what `postings/`
    * persists (distinct (doc_id, sh) rows, NO df cut: the over-cap
    * tail is the whole point).
    */
  private def fullPostingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(
        graft.functions.Text.shingles(col("text"), 3))).as("sh"))
      .distinct()

  /** The resolved postings view minus `excludeDocs` (defaults to the
    * tombstoned set).
    */
  private def postingsView(spark: SparkSession, path: String,
      excludeDocs: Option[DataFrame]): DataFrame = {
    val raw = EpochStore.read(spark, s"$path/postings")
      .select(col("doc_id"), col("sh")).distinct()
    excludeDocs match {
      case None => raw
      case Some(f) => raw.join(broadcast(f.select(col("doc_id"))),
        Seq("doc_id"), "left_anti")
    }
  }

  /** The tables this store's layout actually has: a pre-round-14
    * store lacks the postings/ exact-forget sidecar, and maintenance
    * surfaces ([[maintain]], [[compact]], [[requireConverged]]) must
    * honor [[requirePostings]]'s promise that reads AND compaction
    * stay servable there — only appendEpoch/forget are blocked.
    */
  private def presentTables(path: String): Seq[String] =
    if (graft.engine.Archive.hasVersion(s"$path/postings")) Tables
    else LwwTables

  private def requirePostings(path: String): Unit =
    if (!graft.engine.Archive.hasVersion(s"$path/postings"))
      throw new IllegalStateException(
        s"ContainmentStore at $path has no postings/ table — a " +
          "pre-round-14 layout without the exact-forget sidecar. " +
          "Reads and compaction remain servable, but appends and " +
          "forget are blocked until ContainmentStore.build re-runs " +
          "over the corpus to migrate the layout.")

  /** Forget epochs committed in the tombstone table whose data-side
    * delta has not landed (a crash between [[forget]]'s two halves).
    */
  private def danglingForgetIds(path: String): Set[Long] =
    (if (graft.engine.Archive.hasVersion(s"$path/forgotten"))
       EpochStore.committedIds(s"$path/forgotten")
     else Set.empty[Long]) -- EpochStore.committedIds(s"$path/dfs")

  /** The resolved verdict table — q156's body. */
  def read(spark: SparkSession, path: String): DataFrame =
    stateView(spark, path).verdicts

  /** The resolved pair table (quote/subset pairs of the full stored
    * corpus).
    */
  def readPairs(spark: SparkSession, path: String): DataFrame =
    stateView(spark, path).pairs

  /** The store's build-time (tau, maxDf) — the measure every append
    * must score under.
    */
  private[graft] def params(path: String): (Double, Long) = {
    val f = java.nio.file.Paths.get(path, "_params")
    if (!java.nio.file.Files.exists(f))
      throw new IllegalStateException(
        s"ContainmentStore at $path has no _params sidecar — not a " +
          "built store (or a pre-sidecar layout; re-run build)")
    val kv = java.nio.file.Files.readString(f).split("\n")
      .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
    (kv("tau").toDouble, kv("maxDf").toLong)
  }

  /** Append one batch as epoch `id` under the store's OWN build-time
    * measure parameters. Replay-idempotent and crash-healing: see the
    * object doc. `seq` advances from the max across all four tables
    * (a delta may be empty on some tables — per-table maxima would
    * let two epochs collide on a stamp).
    */
  def appendEpoch(batch: DataFrame, path: String, id: Long): Unit = {
    val spark = batch.sparkSession
    requirePostings(path)
    // a dangling forget's delta must land BEFORE this append reads
    // the state (the delta recomputes deterministically, so healing
    // inline is safe and keeps the stream available)
    healForgetDeltas(spark, path)
    val (tau, maxDf) = params(path)
    if (Tables.forall(t => EpochStore.committed(s"$path/$t", id)))
      return // full replay — storage-level no-op
    graft.engine.Tombstones.requireNotTombstoned(spark, path,
      batch.select("doc_id"), "ContainmentStore")
    val state = stateView(spark, path, excludeIds = Set(id))
    // the "batch ids are new" precondition, ENFORCED: a re-ingested
    // resident doc_id would double-count its shingles in dfs/
    // (dr + db inflates the union df) and LWW-overwrite its perdoc
    // row — silent df-crossing corruption, so fail as loudly as the
    // crashed-epoch mismatches do. One bounded probe: the resident
    // perdoc relation semi-joined to the (small, broadcast) batch ids.
    val overlap = state.perDoc
      .join(broadcast(batch.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .limit(1).count()
    if (overlap > 0)
      throw new IllegalArgumentException(
        s"ContainmentStore at $path: append batch contains doc_id(s) " +
          "already resident in the store — re-ingesting a document " +
          "would double-count its shingles in dfs/ and overwrite its " +
          "perdoc signature; appends must carry NEW ids only")
    val seqNext = 1L + LwwTables.map { t =>
      val r = EpochStore.read(spark, s"$path/$t")
        .filter(col("epoch") =!= id.toString)
        .agg(max(col("seq"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }.max
    val d = NearDupOps.incrementalContainmentParts(state, batch, tau, maxDf)
    val deltas = Map(
      "postings" -> fullPostingsOf(batch),
      "dfs" -> d.dfs.withColumn("seq", lit(seqNext)),
      "perdoc" -> d.perDoc.withColumn("seq", lit(seqNext)),
      "pairs" -> d.pairsLive.withColumn("live", lit(true))
        .unionByName(d.pairsDead
          .withColumn("n_common", lit(0L)).withColumn("n_a", lit(0L))
          .withColumn("n_b", lit(0L))
          .withColumn("containment", lit(0.0))
          .withColumn("live", lit(false)))
        .withColumn("seq", lit(seqNext)),
      "verdicts" -> d.verdictsLive.withColumn("live", lit(true))
        .unionByName(d.verdictsDead
          .withColumn("cluster_id", lit(0L)).withColumn("canon_id", lit(0L))
          .withColumn("n", lit(0L)).withColumn("is_kept", lit(0))
          .withColumn("live", lit(false)))
        .withColumn("seq", lit(seqNext)))
    // materialize every delta BEFORE the first commit mutates the
    // stores the delta plans read
    val staged = deltas.map { case (t, df) => t -> df.localCheckpoint(true) }
    Tables.foreach { t =>
      EpochStore.commitEpoch(s"$path/$t", id) { tmp =>
        staged(t).write.mode("overwrite").parquet(tmp)
      }
    }
  }

  /** Ad-hoc batch append: id from the high band via the LAGGING
    * table; a crashed half-commit is re-used after the pending
    * batch's shingle set verifies against the committed `dfs/` epoch
    * (dfs commits first, so a partial epoch always has it), a
    * different batch fails loudly, and a crashed epoch folded
    * out-of-band gets a distinct error naming the recovery.
    */
  def append(batch: DataFrame, path: String): Unit = {
    // the documented legacy-layout refusal, BEFORE the id-minting
    // walk touches the (absent) postings table
    requirePostings(path)
    val nexts = Tables.map(t => EpochStore.nextAppendEpochId(s"$path/$t"))
    val id =
      if (nexts.distinct.size == 1) nexts.head
      else {
        val crashed = nexts.max - 1
        if (EpochStore.folded(s"$path/dfs", crashed))
          throw new IllegalStateException(
            s"ContainmentStore at $path has a half-committed append " +
              s"epoch=$crashed whose dfs side was folded by a " +
              "compaction — complete the remaining tables with " +
              s"ContainmentStore.appendEpoch(originalBatch, path, $crashed) " +
              "(committed tables no-op via the folded-epoch ledger), " +
              "then retry this append.")
        val committedShs = EpochStore.read(batch.sparkSession, s"$path/dfs")
          .filter(col("epoch") === crashed.toString)
          .select(col("sh"))
        val pendingShs = batch.select(explode(array_distinct(
            graft.functions.Text.shingles(col("text"), 3))).as("sh"))
          .distinct()
        val differ =
          committedShs.join(pendingShs, Seq("sh"), "left_anti").limit(1)
            .count() +
          pendingShs.join(committedShs, Seq("sh"), "left_anti").limit(1)
            .count() > 0
        if (differ)
          throw new IllegalStateException(
            s"ContainmentStore at $path has a half-committed append " +
              s"epoch=$crashed whose shingle set differs from this " +
              "batch — re-run the append with the ORIGINAL crashed " +
              "batch to heal it first")
        crashed
      }
    appendEpoch(batch, path, id)
  }

  /** Streaming maintenance: each micro-batch of documents lands as
    * one epoch through [[appendEpoch]] — the same exactly-once
    * contract as the other stores' streams.
    */
  def appendStream(docs: DataFrame, path: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendEpoch(batch, path, batchId)
      }
      .start()

  /** EXACT right-to-be-forgotten: tombstone the ids (one atomic
    * epoch — doc-keyed read surfaces exclude them immediately), then
    * commit the decrement delta
    * ([[NearDupOps.forgetContainmentParts]]: union-df decrements,
    * requalification-affected array rebuilds, A-neighborhood pair
    * re-scores, adjacent-cluster verdict re-solves) as one forget-
    * band epoch across all five tables. Replay-idempotent (a
    * redelivered batch drops already-tombstoned ids; a committed
    * delta id no-ops) and crash-healing (a dangle between the two
    * halves recomputes deterministically from storage on the next
    * forget/append/maintain). Never-ingested ids change no read
    * surface. Requires the round-14 postings layout.
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    requirePostings(path)
    val id = math.max(
      if (graft.engine.Archive.hasVersion(s"$path/forgotten"))
        EpochStore.nextForgetEpochId(s"$path/forgotten")
      else EpochStore.ForgetFloor,
      LwwTables.map(t => EpochStore.nextForgetEpochId(s"$path/$t")).max)
    graft.engine.Tombstones.forget(spark, path, ids, withId = Some(id))
    healForgetDeltas(spark, path)
  }

  /** Commit the decrement delta for every tombstoned epoch whose
    * data side is missing — [[forget]]'s second half, re-runnable
    * from storage alone: the epoch's ids come from the tombstone
    * table, its pre-forget state from the LWW views excluding only
    * ALREADY-APPLIED forget batches (so the docs being healed still
    * show their rows), and
    * [[NearDupOps.forgetContainmentParts]] is deterministic. Called
    * by [[forget]], [[appendEpoch]], [[maintain]] and [[compact]].
    */
  private def healForgetDeltas(spark: SparkSession, path: String): Unit = {
    if (danglingForgetIds(path).isEmpty) return
    val (tau, maxDf) = params(path)
    danglingForgetIds(path).toSeq.sorted.foreach { id =>
      val forgotten = EpochStore.read(spark, s"$path/forgotten")
      val applied = (EpochStore.committedIds(s"$path/forgotten")
        intersect EpochStore.committedIds(s"$path/dfs"))
      val appliedDocs =
        if (applied.isEmpty) None
        else Some(forgotten
          .filter(col("epoch").isin(applied.map(_.toString).toSeq: _*))
          .select(col("doc_id")))
      val fids = forgotten.filter(col("epoch") === id.toString)
        .select(col("doc_id"))
      val state = resolvedState(spark, path, Set.empty, appliedDocs)
      val postAll = postingsView(spark, path, appliedDocs)
      val seqNext = 1L + LwwTables.map { t =>
        val r = EpochStore.read(spark, s"$path/$t")
          .filter(col("epoch") =!= id.toString)
          .agg(max(col("seq"))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }.max
      val d = NearDupOps.forgetContainmentParts(state, postAll, fids,
        tau, maxDf)
      val deltas = Map(
        "dfs" -> d.dfs.withColumn("seq", lit(seqNext)),
        "perdoc" -> d.perDoc.withColumn("seq", lit(seqNext)),
        "pairs" -> d.pairsLive.withColumn("live", lit(true))
          .unionByName(d.pairsDead
            .withColumn("n_common", lit(0L)).withColumn("n_a", lit(0L))
            .withColumn("n_b", lit(0L))
            .withColumn("containment", lit(0.0))
            .withColumn("live", lit(false)))
          .withColumn("seq", lit(seqNext)),
        "verdicts" -> d.verdictsLive.withColumn("live", lit(true))
          .unionByName(d.verdictsDead
            .withColumn("cluster_id", lit(0L)).withColumn("canon_id", lit(0L))
            .withColumn("n", lit(0L)).withColumn("is_kept", lit(0))
            .withColumn("live", lit(false)))
          .withColumn("seq", lit(seqNext)),
        // the forgotten docs' posting rows are retracted by the
        // tombstone exclusion (purged at compaction) — the epoch
        // here is empty, committed only to keep the five id sets
        // converged
        "postings" -> EpochStore.read(spark, s"$path/postings")
          .select(col("doc_id"), col("sh")).limit(0))
      val staged = deltas.map { case (t, df) =>
        t -> df.localCheckpoint(true) }
      Tables.foreach { t =>
        EpochStore.commitEpoch(s"$path/$t", id) { tmp =>
          staged(t).write.mode("overwrite").parquet(tmp)
        }
      }
    }
  }

  /** Fold all five tables to their RESOLVED rows (LWW winners; dead
    * pair/verdict rows are dropped outright — after the fold, absence
    * means never-paired, exactly the read semantics) and PURGE
    * tombstoned docs physically (the postings fold is what finally
    * erases a forgotten doc's bytes). Each fold is one manifest flip
    * with the epoch ledger carried. Refuses over a half-committed
    * append; heals a dangling forget first (purging before the heal
    * would destroy the heal's inputs).
    */
  def compact(spark: SparkSession, path: String): Unit = {
    healForgetDeltas(spark, path)
    requireConverged(path)
    val st = stateView(spark, path)
    val seqKeep = LwwTables.map { t =>
      val r = EpochStore.read(spark, s"$path/$t")
        .agg(max(col("seq"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }.max
    val lwwFolds = Map(
      "dfs" -> st.dfAll, "perdoc" -> st.perDoc,
      "pairs" -> st.pairs.withColumn("live", lit(true)),
      "verdicts" -> st.verdicts.withColumn("live", lit(true)))
      .map { case (t, df) => t -> df.withColumn("seq", lit(seqKeep)) }
    // legacy (pre-postings) layout: fold only the four LWW tables —
    // requirePostings promises compaction stays servable there
    val folded = (if (presentTables(path).contains("postings"))
      lwwFolds + ("postings" -> postingsView(spark, path,
        Some(graft.engine.Tombstones.ids(spark, path))))
    else lwwFolds)
      .map { case (t, df) => t -> df.localCheckpoint(true) }
    presentTables(path).foreach { t =>
      EpochStore.create(s"$path/$t", rebuild = true) { dir =>
        folded(t).write.mode("overwrite").parquet(dir)
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
      presentTables(path).exists(t =>
        EpochStore.epochCount(s"$path/$t") > maxEpochs) ||
        graft.engine.Tombstones.pending(spark, path)
    if (fragmented) compact(spark, path)
    fragmented
  }

  private def requireConverged(path: String): Unit = {
    val sets = presentTables(path)
      .map(t => t -> EpochStore.committedIds(s"$path/$t"))
    if (sets.map(_._2).distinct.size != 1)
      throw new IllegalStateException(
        s"ContainmentStore at $path has diverged epoch sets (" +
          sets.map { case (t, s) =>
            s"$t=${s.toSeq.sorted.mkString(",")}"
          }.mkString("; ") +
          ") — a half-committed append; heal via the appender's " +
          "retry before compacting")
  }

  final case class MaintenanceReport(compacted: Boolean,
                                     diverged: Boolean,
                                     epochs: Map[String, Int],
                                     nDocs: Long,
                                     nPairs: Long,
                                     clusteredDocs: Long,
                                     supersededFrac: Double)

  /** One maintenance tick — the cron body, mirroring the other four
    * stores: report a half-committed append first (touch nothing),
    * else apply the compaction policy, then one census: signed docs,
    * live pairs, docs under a cluster verdict, and the superseded+
    * dead row fraction across pairs/verdicts (the GC debt `compact`
    * would clear).
    */
  def maintain(spark: SparkSession, path: String,
               maxEpochs: Int = 64): MaintenanceReport = {
    // a dangling forget heals deterministically from storage — the
    // tick repairs it before judging divergence (the CalibrationStore
    // discipline); a half-committed APPEND still reports untouched
    if (graft.engine.Archive.hasVersion(s"$path/postings"))
      healForgetDeltas(spark, path)
    val idSets = presentTables(path)
      .map(t => EpochStore.committedIds(s"$path/$t"))
    val diverged = idSets.distinct.size != 1
    val compacted = !diverged && compactIfFragmented(spark, path, maxEpochs)
    // When diverged (half-committed append), the census must read a
    // CONSISTENT state: LWW over the raw stores would resolve the
    // committed subset of the crashed epoch (e.g. dfs/perdoc landed,
    // pairs/verdicts missing), mixing mid-append state into the
    // report. Excluding the dangling ids (committed on some table but
    // not all) reconstructs the converged pre-append state — the same
    // epoch-exclusion trick appendEpoch's redelivery read uses.
    val dangling =
      if (!diverged) Set.empty[Long]
      else idSets.reduce(_ union _) diff idSets.reduce(_ intersect _)
    val st = stateView(spark, path, excludeIds = dangling)
    val nDocs = st.perDoc.count()
    val nPairs = st.pairs.count()
    val clustered = st.verdicts.count()
    def rawConverged(t: String) = {
      val r = EpochStore.read(spark, s"$path/$t")
      if (dangling.isEmpty) r
      else r.filter(!col("epoch").isin(dangling.map(_.toString).toSeq: _*))
    }
    val rawRel = rawConverged("pairs").count() +
      rawConverged("verdicts").count()
    val liveRel = nPairs + clustered
    MaintenanceReport(
      compacted = compacted,
      diverged = diverged,
      epochs = presentTables(path).map(t =>
        t -> EpochStore.epochCount(s"$path/$t")).toMap,
      nDocs = nDocs,
      nPairs = nPairs,
      clusteredDocs = clustered,
      supersededFrac =
        if (rawRel == 0) 0.0 else 1.0 - liveRel.toDouble / rawRel)
  }
}
