package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Persisted MinHash/LSH near-dup index — the text analog of
  * [[IvfIndex]]: build once over the corpus, append new crawl batches
  * (batch or streaming) without touching existing rows, and match an
  * incoming batch against everything indexed so far WITHOUT
  * re-shingling the corpus. This is the amortization regime the
  * ad-hoc q56 plan can never reach: q56 re-signs the whole corpus per
  * run, the index signs each document exactly once in its lifetime.
  *
  * Layout under `path`:
  *   - `docs/`  — (doc_id, sig array<int>, sh array<bigint>): the
  *     MinHash signature (estimate stage) and the distinct 3-gram
  *     shingle hashes (exact-verify stage). Storing `sh` trades
  *     ~8 bytes/shingle for verify-without-rereading-text — at 100 TB
  *     that is ~the tokenized corpus footprint, far below the text
  *     it replaces, and it keeps matching one self-contained scan.
  *   - `bands/` — (band (partition col), h, doc_id): the exploded LSH
  *     band index, partitioned by band so a probe reads only the
  *     band directories (k=48, r=4 → 12 of them) and Spark prunes
  *     nothing-shared partitions under band-keyed probe joins.
  *
  * All hash parameters (3-gram shingles, k=48/seed=42 MinHash, r=4
  * bands) are the library defaults — deterministic, so append and
  * build commute: any interleaving of build/append over the same
  * docs yields byte-identical index rows (spec-pinned).
  *
  * Scale posture: build/append are map-side projections + one
  * partitioned write (no shuffle beyond the write's own); matching
  * is banded equi-joins — never doc×doc. Hot stored buckets (a
  * 10⁵-copy boilerplate cluster shares every band hash) are capped:
  * buckets over `maxBucket` members join only their min-doc_id
  * representative, so a new member of a huge duplicate cluster still
  * matches (the representative carries the same bands) while the
  * join fanout stays ≤ maxBucket per bucket.
  */
object MinHashIndex {

  /** (doc_id, sig, sh) for any (doc_id, text) frame — the one row
    * per document the index stores. Exposed so specs can reproduce
    * exactly what [[build]]/[[append]] persist.
    */
  def signatures(docs: DataFrame): DataFrame = {
    val sh = Text.shingleHashes(col("text"), 3)
    docs.select(col("doc_id"), sh.as("sh"))
      .select(col("doc_id"), Text.minHash(col("sh")).as("sig"), col("sh"))
  }

  private def bandsOf(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), explode(Text.lshBands(col("sig"))).as("b"))
      .select(col("b.band").as("band"), col("b.h").as("h"), col("doc_id"))

  def build(docs: DataFrame, path: String): Unit =
    write(docs, path, "overwrite")

  /** Append-only incremental maintenance: new documents are signed
    * and added; existing rows are never rewritten. The caller owns
    * id-disjointness (re-appending an id duplicates its rows, as in
    * any append-only store — dedup upstream with q82's incremental
    * exact stage). Requires a prior [[build]] (the live version is
    * resolved through the manifest), and commits as its OWN epoch
    * dir — one atomic rename per table, so a racing reader sees the
    * batch entirely or not at all (direct part-file appends into the
    * live base were visible mid-write). Single-maintenance-writer
    * contract, like [[compact]].
    */
  def append(docs: DataFrame, path: String): Unit =
    write(docs, path, "append")

  // batch build/append write into the "base" epoch of a versioned
  // EpochStore per table; streamed batches land as sibling
  // epoch=<batchId> dirs ([[appendEpoch]]) — the epoch level is the
  // storage exactly-once unit, `band` below it stays the
  // probe-pruning partition column, and [[compact]] folds epochs
  // back into one base per table under a manifest flip
  private def write(docs: DataFrame, path: String, mode: String): Unit = {
    import graft.engine.EpochStore
    val sigs = signatures(docs).persist() // feeds both tables; sign once
    sigs.count()
    if (mode == "append") {
      // incremental batch append: its own epoch in each table, from
      // the high id band disjoint from streaming batchIds. A crash
      // between the two commits leaves docs-only; the RETRY is
      // self-healing (round 9): when the docs table is one append id
      // ahead of bands, re-running the append REUSES the crashed id
      // — commitEpoch no-ops on the committed docs side and
      // completes bands — instead of drawing a fresh id and silently
      // duplicating the batch's docs rows. Healing is only safe when
      // THIS batch is the crashed one, so the pending doc_id set is
      // checked against the committed epoch first (one bounded
      // epoch-vs-batch anti-join each way) and a DIFFERENT batch
      // fails loudly: committing its bands under the old id would
      // silently mismatch the two tables.
      val docsNext = EpochStore.nextAppendEpochId(s"$path/docs")
      val bandsNext = EpochStore.nextAppendEpochId(s"$path/bands")
      val id =
        if (docsNext > bandsNext) {
          val crashed = docsNext - 1
          // An out-of-band compaction between the crash and this retry
          // folds the crashed docs epoch into the base: the epoch
          // filter below would read EMPTY and reject even the original
          // batch — a permanent wedge. [[compact]] refuses to run over
          // a half-committed append precisely to prevent this, but a
          // store compacted directly through EpochStore (or by an
          // older library) can still arrive here: fail with the one
          // recovery that works — appendEpoch commits bands under the
          // crashed id while the docs side no-ops via the folded-id
          // ledger.
          if (EpochStore.folded(s"$path/docs", crashed))
            throw new IllegalStateException(
              s"MinHashIndex at $path has a half-committed append " +
                s"epoch=$crashed whose docs side was already folded " +
                "into the base by a compaction — the batch can no " +
                "longer be verified against the crashed epoch. Heal " +
                "by completing the bands table directly: " +
                s"MinHashIndex.appendEpoch(originalBatch, path, $crashed) " +
                "(the docs commit is a no-op via the folded-epoch " +
                "ledger), then retry this append.")
          val committed = EpochStore.read(docs.sparkSession, s"$path/docs")
            .filter(col("epoch") === crashed.toString)
            .select(col("doc_id"))
          val pending = sigs.select(col("doc_id"))
          val differ =
            committed.join(pending, Seq("doc_id"), "left_anti").limit(1)
              .count() +
            pending.join(committed, Seq("doc_id"), "left_anti").limit(1)
              .count() > 0
          if (differ)
            throw new IllegalStateException(
              s"MinHashIndex at $path has a half-committed append " +
                s"epoch=$crashed (docs committed, bands missing) whose " +
                "doc_id set differs from this batch — re-run the append " +
                "with the ORIGINAL crashed batch to heal it before " +
                "appending new batches")
          crashed
        } else docsNext
      EpochStore.commitEpoch(s"$path/docs", id) { tmp =>
        sigs.write.mode("overwrite").parquet(tmp)
      }
      EpochStore.commitEpoch(s"$path/bands", id) { tmp =>
        bandsOf(sigs).write.mode("overwrite").partitionBy("band")
          .parquet(tmp)
      }
    } else {
      // build = deliberate rebuild: ledger carries forward (see
      // EpochStore.create) so surviving stream checkpoints stay safe
      EpochStore.create(s"$path/docs", rebuild = true) { base =>
        sigs.write.mode("overwrite").parquet(base)
      }
      EpochStore.create(s"$path/bands", rebuild = true) { base =>
        bandsOf(sigs).write.mode("overwrite").partitionBy("band")
          .parquet(base)
      }
    }
    sigs.unpersist(): Unit
  }

  /** Fold the committed epochs of both tables into one base each
    * (new manifest versions; readers and post-compaction replays stay
    * safe — [[graft.engine.EpochStore.compact]]). A crash between the
    * two per-table compactions leaves one table folded and the other
    * not — both remain exactly the same rows, so matching stays
    * correct and the next compact converges the layouts.
    */
  /** Forget documents (right-to-be-forgotten): one tombstone epoch;
    * [[matches]]/[[invertedMatches]] exclude the set immediately (a
    * forgotten doc can no longer surface as a match or serve as an
    * over-cap bucket representative), the next [[compact]] purges it
    * from both tables. See [[graft.engine.Tombstones]].
    */
  def forget(spark: SparkSession, path: String,
             ids: DataFrame): Unit =
    graft.engine.Tombstones.forget(spark, path, ids): Unit

  def compact(spark: SparkSession, path: String): Unit = {
    import graft.engine.EpochStore
    // Refuse to fold over a half-committed append: compaction removes
    // the crashed epoch dir the self-heal in [[append]] verifies
    // against, leaving the store healable only via [[appendEpoch]].
    // Heal first (re-run the crashed append), then compact. The id
    // SETS are compared — not just counts — so this also catches a
    // store where the two tables diverged any other way.
    val d = EpochStore.committedIds(s"$path/docs")
    val b = EpochStore.committedIds(s"$path/bands")
    if (d != b)
      throw new IllegalStateException(
        s"MinHashIndex at $path has diverged docs/bands epoch sets " +
          s"(docs-only: ${(d -- b).toSeq.sorted.mkString(",")}; " +
          s"bands-only: ${(b -- d).toSeq.sorted.mkString(",")}) — a " +
          "crashed append is half-committed. Re-run the crashed " +
          "append (or appendEpoch the original batch) to heal, then " +
          "compact.")
    EpochStore.compact(spark, s"$path/docs",
      transform = graft.engine.Tombstones.exclude(_, path, "doc_id"))
    EpochStore.compact(spark, s"$path/bands", Seq("band"),
      transform = graft.engine.Tombstones.exclude(_, path, "doc_id"))
    graft.engine.Tombstones.clear(spark, path)
  }

  /** [[compact]] both tables once EITHER passes `maxEpochs` — one
    * policy decision so the two layouts stay within one fold of each
    * other. Returns true iff a fold ran.
    */
  def compactIfFragmented(spark: SparkSession, path: String,
                          maxEpochs: Int = 64): Boolean = {
    import graft.engine.EpochStore
    val fragmented = EpochStore.epochCount(s"$path/docs") > maxEpochs ||
      EpochStore.epochCount(s"$path/bands") > maxEpochs ||
      graft.engine.Tombstones.pending(spark, path)
    if (fragmented) compact(spark, path)
    fragmented
  }

  /** Streaming maintenance: micro-batches of (doc_id, text) appended
    * under the same deterministic hash params — streamed index rows
    * are byte-identical to a batch [[append]] of the same docs
    * (spec-pinned parity). Exactly-once is STORAGE-level: each batch
    * commits as its own `epoch=<batchId>` dirs via [[appendEpoch]],
    * so a redelivered batchId is a no-op (StreamingSpec pins the
    * identical-file-set contract). One stream lineage owns an index:
    * a fresh checkpoint restarts batchIds at 0, which the store
    * would treat as replays.
    */
  def appendStream(docs: DataFrame, path: String,
                   checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendEpoch(batch, path, batchId)
      }
      .start()

  /** Append one micro-batch as the `epoch=<batchId>` dirs of both
    * stores: sign once, stage each table fully under a tmp dir, then
    * one atomic rename per table. Replay-idempotent by NAMING (the
    * [[IvfIndex.appendEpoch]] contract): a committed epoch dir is
    * never rewritten, a crash mid-stage leaves only tmp dirs that the
    * retry overwrites, and a crash BETWEEN the two renames commits
    * docs but not bands — the redelivery completes exactly the
    * missing table (same deterministic rows), converging both stores
    * to the single-delivery file set. Public because it is also the
    * documented recovery path for a half-committed append whose docs
    * epoch a compaction already folded (see [[append]]).
    */
  def appendEpoch(batch: DataFrame, path: String,
                  batchId: Long): Unit = {
    // full-replay no-op BEFORE the tombstone guard: a crawl day that
    // appends then forgets the same id, redelivered after a crash
    // past the forget, must converge — the guard would see the id
    // tombstoned and wedge the stream (the committed epoch proves the
    // batch was admitted before the forget). A HALF-committed epoch
    // falls through, and the guard stays sound there: the composed
    // day forgets only after ALL appends commit, so a mid-append
    // crash means any tombstone hit predates this batch — a genuine
    // violation the first delivery would have refused identically.
    if (graft.engine.EpochStore.committed(s"$path/docs", batchId) &&
        graft.engine.EpochStore.committed(s"$path/bands", batchId))
      return // full replay — storage-level no-op
    graft.engine.Tombstones.requireNotTombstoned(batch.sparkSession,
      path, batch.select("doc_id"), "MinHashIndex")
    val sigs = signatures(batch).persist()
    sigs.count()
    graft.engine.EpochStore.commitEpoch(s"$path/docs", batchId) { tmp =>
      sigs.write.mode("overwrite").parquet(tmp)
    }
    graft.engine.EpochStore.commitEpoch(s"$path/bands", batchId) { tmp =>
      bandsOf(sigs).write.mode("overwrite").partitionBy("band").parquet(tmp)
    }
    sigs.unpersist(): Unit
  }

  /** Index-health audit off the stored bands — the MinHash analog of
    * the IVF audit (q144): per band, bucket count, largest bucket,
    * buckets over the `maxBucket` probe cap, and the fraction of
    * postings living in capped buckets. The capped-posting fraction
    * is the operational signal: [[matches]] collapses over-cap
    * buckets to one representative, so a rising fraction means a
    * growing share of the corpus is reachable only THROUGH
    * representatives (recall rests on the min-id member carrying the
    * cluster's bands) — the cue to dedup the resident corpus or raise
    * the cap. One scan of the band store, band-keyed aggregates,
    * 12-row output; the corpus text is never touched. No DuckDB
    * oracle (band hashes are xxhash64 — engine-specific), so this
    * stays a library surface gated by MinHashIndexSpec rather than a
    * declared query.
    */
  def bucketStats(spark: SparkSession, path: String,
                  maxBucket: Long = TextOps.MaxLshBucket): DataFrame = {
    val stored = graft.engine.EpochStore.read(spark, s"$path/bands")
    val buckets = stored.groupBy(col("band"), col("h"))
      .agg(count(lit(1)).as("m"))
    buckets.groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("m")).as("max_bucket"),
        sum(when(col("m") > maxBucket, 1L).otherwise(0L)).as("n_over_cap"),
        round(sum(when(col("m") > maxBucket, col("m")).otherwise(0L))
          .cast("double") / sum(col("m")), 4).as("capped_post_frac"))
      .orderBy(col("band"))
  }

  /** What one [[maintain]] tick did and saw — the MinHash analog of
    * [[IvfIndex.MaintenanceReport]]: whether a fold ran, whether the
    * two tables' committed-epoch sets diverged (a half-committed
    * append — heal before anything else), the per-table epoch counts,
    * and the operational health observables off [[bucketStats]]
    * (largest band bucket and the worst capped-posting fraction —
    * the recall-through-representatives signal documented there).
    */
  final case class MaintenanceReport(compacted: Boolean,
                                     diverged: Boolean,
                                     docsEpochs: Int,
                                     bandsEpochs: Int,
                                     nDocs: Long,
                                     maxBucket: Long,
                                     cappedPostFrac: Double)

  /** One maintenance TICK — the documented cron body, mirroring
    * [[IvfIndex.maintain]]: detect a half-committed append first
    * (report it, touch nothing — the heal belongs to the crashed
    * appender's retry, not the cron), else [[compactIfFragmented]]
    * (listing-cost bound), then one band-store scan for the health
    * row. A healthy compact index is a pure-read no-op tick.
    * Single-maintenance-writer contract: run between micro-batches
    * or with the append stream stopped.
    *
    * The report is for ALERTING: a rising `cappedPostFrac` means a
    * growing share of the corpus is reachable only through bucket
    * representatives — the cue to dedup the resident corpus (q100/
    * q149) or raise the cap, neither of which a cron should do
    * unilaterally.
    */
  def maintain(spark: SparkSession, path: String,
               maxEpochs: Int = 64,
               maxBucket: Long = TextOps.MaxLshBucket): MaintenanceReport = {
    import graft.engine.EpochStore
    val diverged = EpochStore.committedIds(s"$path/docs") !=
      EpochStore.committedIds(s"$path/bands")
    val compacted = !diverged &&
      compactIfFragmented(spark, path, maxEpochs)
    val stats = bucketStats(spark, path, maxBucket)
      .agg(max(col("max_bucket")).as("mb"),
        max(col("capped_post_frac")).as("cf"))
      .head()
    val nDocs = EpochStore.read(spark, s"$path/docs").count()
    MaintenanceReport(compacted, diverged,
      EpochStore.epochCount(s"$path/docs"),
      EpochStore.epochCount(s"$path/bands"),
      nDocs,
      if (stats.isNullAt(0)) 0L else stats.getLong(0),
      if (stats.isNullAt(1)) 0.0 else stats.getDouble(1))
  }

  /** Match a new (doc_id, text) batch against the index: banded
    * candidate generation (equi-join on (band, h)), signature
    * estimate prefilter at `estThresh`, exact shingle-Jaccard verify
    * at `jacThresh` — q56's estimate→verify chain with the corpus
    * side read from the index instead of recomputed. Output:
    * (doc_id, match_id, jac), every row exact-verified.
    *
    * Stored buckets larger than `maxBucket` are collapsed to their
    * min-doc_id representative before the probe join (fanout cap;
    * a new member of a mega-cluster still matches the
    * representative, which shares its bands).
    */
  def matches(spark: SparkSession, path: String, batch: DataFrame,
              estThresh: Double = 0.25, jacThresh: Double = 0.5,
              maxBucket: Long = TextOps.MaxLshBucket): DataFrame = {
    val probe = signatures(batch).persist() // bands + estimate + verify
    probe.count()
    val stored = graft.engine.Tombstones.exclude(
      graft.engine.EpochStore.read(spark, s"$path/bands"), path, "doc_id")
    // cap hot buckets to one representative: count per (band, h) is
    // a band-keyed aggregate (the table is already band-partitioned),
    // and only over-cap buckets lose members
    val bucketSized = stored
      .groupBy(col("band"), col("h"))
      .agg(count(lit(1)).as("m"), min(col("doc_id")).as("rep"))
    val capped = stored.join(bucketSized, Seq("band", "h"))
      .filter(col("m") <= maxBucket || col("doc_id") === col("rep"))
      .select(col("band"), col("h"), col("doc_id").as("match_id"))
    val cands = bandsOf(probe)
      .join(capped, Seq("band", "h"))
      .filter(col("doc_id") =!= col("match_id"))
      .select(col("doc_id"), col("match_id"))
      .distinct()
    val sigs = graft.engine.Tombstones.exclude(
      graft.engine.EpochStore.read(spark, s"$path/docs"), path, "doc_id")
    val estimated = cands
      .join(probe.select(col("doc_id"), col("sig").as("sig_a")), Seq("doc_id"))
      .join(sigs.select(col("doc_id").as("match_id"), col("sig").as("sig_b")),
        Seq("match_id"))
      .filter(Text.sigEstimate(col("sig_a"), col("sig_b")) >= estThresh)
      .select(col("doc_id"), col("match_id"))
    estimated
      .join(probe.select(col("doc_id"), col("sh").as("sh_a")), Seq("doc_id"))
      .join(sigs.select(col("doc_id").as("match_id"), col("sh").as("sh_b")),
        Seq("match_id"))
      .select(col("doc_id"), col("match_id"),
        Text.jaccardLong(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= jacThresh)
      .orderBy(col("doc_id"), col("match_id"))
  }

  /** EXACT incremental matching against the index via a shingle
    * inverted index — q114's semantics served from the store: the
    * incoming batch is shingled (it's today's crawl — small), the
    * CORPUS side is the already-persisted `docs/` hash arrays
    * exploded to (shingle, doc) postings, and candidates exist only
    * where an informative shingle is shared (corpus shingles carried
    * by more than `maxDf` documents are dropped from candidate
    * generation — boilerplate fanout, ~zero Jaccard mass; the per-doc
    * set sizes keep every shingle). Unlike [[matches]] (LSH banding —
    * probabilistic recall at bounded cost), this path is exact w.r.t.
    * the informative-shingle Jaccard, at inverted-index join cost.
    *
    * The point of serving it from the index: the corpus TEXT is never
    * re-read and never re-shingled — the three corpus-side consumers
    * (posting explode, DF count, set sizes) scan the compact stored
    * hash arrays. Output matches [[NearDupOps.incrementalNearDupOn]]
    * row-for-row on a disjoint batch/corpus split: (doc_id, match_id,
    * n_common, n_a, n_b, jaccard ≥ `tau`), best match per batch doc
    * (jaccard desc, match_id), jaccard 4dp-rounded BEFORE the filter
    * and the rank.
    */
  def invertedMatches(spark: SparkSession, path: String, batch: DataFrame,
                      tau: Double = 0.2,
                      maxDf: Long = TextOps.MaxShingleDf): DataFrame = {
    val probeSh = batch
      .select(col("doc_id"), explode(Text.shingleHashes(col("text"), 3)).as("sh"))
      .persist() // candidate join + n_a: shingle the batch once
    probeSh.count()
    val nA = probeSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
    val stored = graft.engine.Tombstones.exclude(
        graft.engine.EpochStore.read(spark, s"$path/docs"), path, "doc_id")
      .select(col("doc_id").as("match_id"), col("sh"))
    val corpusSh = stored.select(col("match_id"), explode(col("sh")).as("sh"))
    val informative = corpusSh.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("sh"))
    val cand = probeSh.join(corpusSh.join(informative, Seq("sh")), Seq("sh"))
      .groupBy(col("doc_id"), col("match_id"))
      .agg(count(lit(1)).as("n_common"))
    val scored = cand
      .join(nA, Seq("doc_id"))
      .join(stored.select(col("match_id"),
        size(col("sh")).cast("bigint").as("n_b")), Seq("match_id"))
      .withColumn("jaccard", round(col("n_common").cast("double")
        / (col("n_a") + col("n_b") - col("n_common")), 4))
      .filter(col("jaccard") >= tau)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("match_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("match_id"), col("n_common"),
        col("n_a"), col("n_b"), col("jaccard"))
      .orderBy(col("doc_id"))
  }
}
