package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.EpochStore

/** The persisted DEDUP VERDICT STORE — the fourth build-once /
  * maintain-forever store (after IvfIndex, MinHashIndex, ChunkIndex),
  * and the production artifact behind q152: a dedup pass ships one
  * verdict row per document (keep / exact / near + canonical id,
  * q100's table), and each day's crawl must UPDATE that relation —
  * new docs decided, resident clusters grown or merged — without the
  * full recompute a 100 TB corpus cannot afford.
  *
  * Layout under `path` (both tables versioned EpochStores sharing the
  * atomic-epoch exactly-once contract):
  *
  *  - `sigs/` — APPEND-ONLY per-doc signature relation
  *    `(doc_id, k, lang, bucket, sh)` ([[NearDupOps.signatureOf]]):
  *    content key, blocking keys, shingle hashes — written once per
  *    document at ingest, so an append NEVER re-reads resident text
  *    (the store-served form of the resident scans q152's
  *    self-contained declaration recomputes; the honest cost of an
  *    append is then one scan of this compact relation + the
  *    batch-broadcast candidate join + the quotient component loop).
  *  - `verdicts/` — DELTA epochs under LAST-WRITE-WINS reads: each
  *    append commits only the rows it changed (touched resident rows
  *    re-labeled + all batch rows) stamped with a store-monotonic
  *    `seq`; [[read]] resolves max-seq per doc. Superseded rows are
  *    garbage-collected by [[compact]], which folds the store to the
  *    resolved table in one manifest flip (create(rebuild = true)
  *    carries the committed-epoch ledger, so stream replays stay
  *    storage-level no-ops even after their epochs folded).
  *
  * Exactly-once: an epoch append stages fully and lands as one atomic
  * rename per table, sigs first. A crash between the two renames is
  * healed by redelivery — the delta recomputes identically because
  * the resident-sig read EXCLUDES the in-flight epoch id, then the
  * sigs commit no-ops and the verdicts commit completes. Batch
  * appends ([[append]]) derive their id from the LAGGING table and
  * re-use a crashed id only after verifying the pending batch's
  * doc_id set against the committed half (MinHashIndex's round-9
  * self-heal contract, same loud failure for a different batch).
  *
  * Correctness: [[read]] after any build+append sequence equals
  * [[NearDupOps.dedupVerdictsOn]] over the union corpus, row for row
  * — the q152 equality, inherited from [[NearDupOps
  * .incrementalVerdictParts]] under the monotonic-ingest contract
  * (every appended id exceeds every resident id — ENFORCED at
  * [[appendEpoch]]: a violating batch fails loudly instead of
  * silently corrupting canonicals). Spec-pinned in VerdictStoreSpec
  * including the resident-cluster MERGE case.
  *
  * Single-maintenance-writer contract throughout: one appender, and
  * [[maintain]]/[[compact]] run between micro-batches or with the
  * append stream stopped.
  */
object VerdictStore {

  /** Build the store: full [[NearDupOps.dedupVerdictsOn]] pass (the
    * one-time from-scratch cost) + the signature relation, each as
    * the base epoch of its table. Rebuild carries the epoch ledger.
    */
  def build(docs: DataFrame, path: String): Unit = {
    val sigs = NearDupOps.signatureOf(docs).persist()
    sigs.count()
    val verdicts = NearDupOps.dedupVerdictsOn(docs)
      .withColumn("seq", lit(0L))
    EpochStore.create(s"$path/sigs", rebuild = true) { base =>
      sigs.write.mode("overwrite").parquet(base)
    }
    EpochStore.create(s"$path/verdicts", rebuild = true) { base =>
      verdicts.write.mode("overwrite").parquet(base)
    }
    sigs.unpersist(): Unit
  }

  /** The resolved verdict table: one row per document, max-seq wins.
    * The aggregate state is one (seq, verdict, canonical) triple per
    * group — bounded however many epochs a doc's cluster was touched
    * by.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    graft.engine.Tombstones.exclude(
      resolve(EpochStore.read(spark, s"$path/verdicts")),
      path, "doc_id")

  private def resolve(raw: DataFrame): DataFrame = raw
    .groupBy(col("doc_id"))
    .agg(max(struct(col("seq"), col("verdict"), col("canonical_id")))
      .as("s"))
    .select(col("doc_id"), col("s.verdict").as("verdict"),
      col("s.canonical_id").as("canonical_id"))

  /** The stored signature relation (all epochs, minus forgotten). */
  def readSigs(spark: SparkSession, path: String): DataFrame =
    graft.engine.Tombstones.exclude(
      EpochStore.read(spark, s"$path/sigs")
        .select(col("doc_id"), col("k"), col("lang"), col("bucket"),
          col("sh")),
      path, "doc_id")

  /** Forget documents (right-to-be-forgotten) — the store whose
    * derived state makes deletion MORE than a row filter: a
    * forgotten doc may be an exact-group min (the smallest remaining
    * member PROMOTES and enters the pair graph for the first time,
    * possibly merging resident clusters), a cluster canonical (the
    * cluster renames), or a cluster bridge (the cluster SPLITS).
    * One tombstone epoch hides the rows from [[read]]/[[readSigs]]
    * immediately; the RELABEL delta ([[NearDupOps.forgetVerdictParts]]
    * — recomputed over affected state only, never the corpus) lands
    * as a forget-band verdicts epoch under the same id, so a crash
    * between the two commits heals on any retry ([[healForgets]]
    * re-derives the identical delta from the committed tombstone
    * epoch). After both, [[read]] equals
    * [[NearDupOps.dedupVerdictsOn]] over the never-ingested corpus —
    * ForgetSpec pins promote-merge, rename, and split.
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    val id = math.max(
      if (graft.engine.Archive.hasVersion(s"$path/forgotten"))
        EpochStore.nextForgetEpochId(s"$path/forgotten")
      else EpochStore.ForgetFloor,
      EpochStore.nextForgetEpochId(s"$path/verdicts"))
    graft.engine.Tombstones.forget(spark, path, ids, withId = Some(id))
    healForgets(spark, path)
  }

  /** Commit the relabel delta for every tombstone epoch whose
    * verdicts half is missing — shared by [[forget]] and callable
    * after a crash.
    */
  def healForgets(spark: SparkSession, path: String): Unit = {
    if (!graft.engine.Archive.hasVersion(s"$path/forgotten")) return
    val dangling = (EpochStore.committedIds(s"$path/forgotten") --
      EpochStore.committedIds(s"$path/verdicts"))
      .filter(_ >= EpochStore.ForgetFloor)
    dangling.toSeq.sorted.foreach { id =>
      val forgotten = EpochStore.read(spark, s"$path/forgotten")
      val s = forgotten.filter(col("epoch") === id.toString)
        .select(col("doc_id"))
      // PRIOR tombstones (earlier forget batches) are already gone
      // from the read surface — they must not re-enter this delta's
      // derivation; the epoch's OWN ids stay visible (the delta is
      // exactly what turns the pre-S state into the post-S state)
      val prior = broadcast(forgotten.filter(col("epoch") =!= id.toString)
        .select(col("doc_id")))
      val rawVerd = EpochStore.read(spark, s"$path/verdicts")
      val resolved = resolve(rawVerd).join(prior, Seq("doc_id"), "left_anti")
      val allSigs = EpochStore.read(spark, s"$path/sigs")
        .select(col("doc_id"), col("k"), col("lang"), col("bucket"),
          col("sh"))
        .join(prior, Seq("doc_id"), "left_anti")
      val seqRow = rawVerd.agg(max(col("seq"))).head()
      val seqNext = (if (seqRow.isNullAt(0)) 0L else seqRow.getLong(0)) + 1L
      val delta = NearDupOps.forgetVerdictParts(allSigs, resolved, s)
        .withColumn("seq", lit(seqNext))
      EpochStore.commitEpoch(s"$path/verdicts", id) { tmp =>
        delta.write.mode("overwrite").parquet(tmp)
      }
    }
  }

  /** Append one batch as epoch `id` — the streaming form
    * ([[appendStream]] passes the micro-batch id; [[append]] draws
    * from the high batch band). Replay-idempotent: resident state is
    * read EXCLUDING this epoch id, so a redelivery recomputes the
    * identical delta and the per-table commits no-op / complete.
    */
  def appendEpoch(batch: DataFrame, path: String, id: Long): Unit = {
    val spark = batch.sparkSession
    val sigsRoot = s"$path/sigs"
    val verdRoot = s"$path/verdicts"
    // replay no-op BEFORE the tombstone guard (the MinHashIndex
    // ordering rationale): a redelivered append+forget day must
    // converge, not wedge on its own same-day tombstones
    if (EpochStore.committed(sigsRoot, id) &&
        EpochStore.committed(verdRoot, id)) return // full replay
    graft.engine.Tombstones.requireNotTombstoned(spark, path,
      batch.select("doc_id"), "VerdictStore")
    // both resident tables through ONE pinned snapshot — the
    // redelivery read reasons about epoch membership, so this
    // narrows the window in which a maintenance flip could hand it
    // sigs pre-fold and verdicts post-fold (the single-writer
    // contract remains the guarantee)
    val snap = EpochStore.snapshot(Seq(sigsRoot, verdRoot))
    val residentSigs = snap.read(spark, sigsRoot)
      .filter(col("epoch") =!= id.toString) // in-flight epoch excluded
      .select(col("doc_id"), col("k"), col("lang"), col("bucket"), col("sh"))
    // the monotonic-ingest contract, ENFORCED (it was caller-owned and
    // silent): every batch id must exceed every resident id — that is
    // what makes the incremental path exact (a content-hash group's
    // min cannot move, quotient labels lift). A violating batch —
    // including a re-ingested resident id, which would also duplicate
    // its append-only sigs/ row — fails as loudly as the
    // crashed-epoch mismatches. Two column-pruned extrema, no join.
    val maxResRow = residentSigs.agg(max(col("doc_id"))).head()
    if (!maxResRow.isNullAt(0)) {
      val minBatchRow = batch.agg(min(col("doc_id"))).head()
      if (!minBatchRow.isNullAt(0) &&
          minBatchRow.getLong(0) <= maxResRow.getLong(0))
        throw new IllegalArgumentException(
          s"VerdictStore at $path: append batch violates the " +
            s"monotonic-ingest contract (batch min id " +
            s"${minBatchRow.getLong(0)} <= resident max id " +
            s"${maxResRow.getLong(0)}) — incremental exactness requires " +
            "every appended id to exceed every resident id")
    }
    val rawVerd = snap.read(spark, verdRoot)
    val residentVerdicts = resolve(rawVerd).persist()
    residentVerdicts.count()
    val seqRow = rawVerd.agg(max(col("seq"))).head()
    val seqNext = (if (seqRow.isNullAt(0)) 0L else seqRow.getLong(0)) + 1L
    val batchSigs = NearDupOps.signatureOf(batch).persist()
    batchSigs.count()
    val (updatedOld, newRows) = NearDupOps.incrementalVerdictParts(
      residentSigs, residentVerdicts, batchSigs)
    val delta = updatedOld.unionByName(newRows)
      .withColumn("seq", lit(seqNext))
      .persist()
    delta.count() // materialize BEFORE the sigs commit: the delta plan
                  // reads the sigs store, which the commit mutates
    EpochStore.commitEpoch(sigsRoot, id) { tmp =>
      batchSigs.write.mode("overwrite").parquet(tmp)
    }
    EpochStore.commitEpoch(verdRoot, id) { tmp =>
      delta.write.mode("overwrite").parquet(tmp)
    }
    Seq(residentVerdicts, batchSigs, delta).foreach(_.unpersist()): Unit
  }

  /** Ad-hoc batch append: id from the high band via the LAGGING
    * verdicts table; a crashed half-commit (sigs ahead) is re-used
    * after the pending batch verifies against the committed sigs
    * epoch, a different batch fails loudly, and a crashed epoch
    * already folded by an out-of-band compaction names its recovery.
    */
  def append(batch: DataFrame, path: String): Unit = {
    val sigsNext = EpochStore.nextAppendEpochId(s"$path/sigs")
    val verdNext = EpochStore.nextAppendEpochId(s"$path/verdicts")
    val id =
      if (sigsNext > verdNext) {
        val crashed = sigsNext - 1
        if (EpochStore.folded(s"$path/sigs", crashed))
          throw new IllegalStateException(
            s"VerdictStore at $path has a half-committed append " +
              s"epoch=$crashed whose sigs side was folded by a " +
              "compaction — complete the verdicts table with " +
              s"VerdictStore.appendEpoch(originalBatch, path, $crashed) " +
              "(the sigs commit no-ops via the folded-epoch ledger), " +
              "then retry this append.")
        val committed = EpochStore.read(batch.sparkSession, s"$path/sigs")
          .filter(col("epoch") === crashed.toString)
          .select(col("doc_id"))
        val pending = batch.select(col("doc_id"))
        val differ =
          committed.join(pending, Seq("doc_id"), "left_anti").limit(1)
            .count() +
          pending.join(committed, Seq("doc_id"), "left_anti").limit(1)
            .count() > 0
        if (differ)
          throw new IllegalStateException(
            s"VerdictStore at $path has a half-committed append " +
              s"epoch=$crashed (sigs committed, verdicts missing) whose " +
              "doc_id set differs from this batch — re-run the append " +
              "with the ORIGINAL crashed batch to heal it first")
        crashed
      } else sigsNext
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

  /** Fold both tables: sigs by the generic value-preserving epoch
    * fold; verdicts to the RESOLVED table (each doc's winning row,
    * its seq retained so later appends keep monotonic stamps) — the
    * fold doubles as garbage collection of superseded verdict rows.
    * Refuses over a half-committed append, like MinHashIndex.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    requireConverged(path)
    val resolvedWithSeq = graft.engine.Tombstones.exclude(
      EpochStore.read(spark, s"$path/verdicts")
        .groupBy(col("doc_id"))
        .agg(max(struct(col("seq"), col("verdict"), col("canonical_id")))
          .as("s"))
        .select(col("doc_id"), col("s.verdict").as("verdict"),
          col("s.canonical_id").as("canonical_id"), col("s.seq").as("seq")),
      path, "doc_id")
      .persist()
    resolvedWithSeq.count() // materialize before the flip re-roots reads
    EpochStore.create(s"$path/verdicts", rebuild = true) { base =>
      resolvedWithSeq.write.mode("overwrite").parquet(base)
    }
    resolvedWithSeq.unpersist()
    EpochStore.compact(spark, s"$path/sigs",
      transform = graft.engine.Tombstones.exclude(_, path, "doc_id"))
    graft.engine.Tombstones.clear(spark, path)
  }

  /** Compaction policy: fold only past `maxEpochs` committed epochs
    * on either table (the listing-cost bound); a store under the
    * bound is a pure-read no-op. */
  def compactIfFragmented(spark: SparkSession, path: String,
                          maxEpochs: Int = 64): Boolean = {
    val fragmented =
      EpochStore.epochCount(s"$path/sigs") > maxEpochs ||
        EpochStore.epochCount(s"$path/verdicts") > maxEpochs ||
        graft.engine.Tombstones.pending(spark, path)
    if (fragmented) compact(spark, path)
    fragmented
  }

  /** Band-aware convergence: batch/stream verdicts epochs pair with
    * sigs epochs; forget-band verdicts epochs pair with tombstone
    * epochs ([[forget]] commits to verdicts + forgotten, never sigs).
    */
  private def requireConverged(path: String): Unit = {
    val forgotten =
      if (graft.engine.Archive.hasVersion(s"$path/forgotten"))
        EpochStore.committedIds(s"$path/forgotten")
      else Set.empty[Long]
    val s = EpochStore.committedIds(s"$path/sigs") ++ forgotten
    val v = EpochStore.committedIds(s"$path/verdicts")
    if (s != v)
      throw new IllegalStateException(
        s"VerdictStore at $path has diverged epoch sets (sigs " +
          s"${s.toSeq.sorted.mkString(",")} vs verdicts " +
          s"${v.toSeq.sorted.mkString(",")}) — a half-committed append; " +
          "heal via the appender's retry before compacting")
  }

  final case class MaintenanceReport(compacted: Boolean,
                                     diverged: Boolean,
                                     sigsEpochs: Int,
                                     verdictEpochs: Int,
                                     nDocs: Long,
                                     rawRows: Long,
                                     supersededFrac: Double,
                                     dropFrac: Double)

  /** One maintenance tick — the cron body, mirroring the other three
    * stores: report a half-committed append first (touch nothing; the
    * heal belongs to the appender's retry), else apply the compaction
    * policy, then one census pass: resolved doc count, raw verdict
    * rows, the superseded-row fraction (the GC debt `compact` would
    * clear), and the fraction of documents currently dropped.
    */
  def maintain(spark: SparkSession, path: String,
               maxEpochs: Int = 64): MaintenanceReport = {
    val forgottenIds =
      if (graft.engine.Archive.hasVersion(s"$path/forgotten"))
        EpochStore.committedIds(s"$path/forgotten")
      else Set.empty[Long]
    val diverged = EpochStore.committedIds(s"$path/sigs") ++ forgottenIds !=
      EpochStore.committedIds(s"$path/verdicts")
    val compacted = !diverged && compactIfFragmented(spark, path, maxEpochs)
    val raw = EpochStore.read(spark, s"$path/verdicts")
    val rawRows = raw.count()
    val stats = graft.engine.Tombstones.exclude(resolve(raw), path, "doc_id")
      .agg(count(lit(1)).as("n"),
        sum((col("verdict") =!= "keep").cast("long")).as("dropped"))
      .head()
    val nDocs = stats.getLong(0)
    val dropped = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    MaintenanceReport(
      compacted = compacted,
      diverged = diverged,
      sigsEpochs = EpochStore.epochCount(s"$path/sigs"),
      verdictEpochs = EpochStore.epochCount(s"$path/verdicts"),
      nDocs = nDocs,
      rawRows = rawRows,
      supersededFrac =
        if (rawRows == 0) 0.0 else 1.0 - nDocs.toDouble / rawRows,
      dropFrac = if (nDocs == 0) 0.0 else dropped.toDouble / nDocs)
  }
}
