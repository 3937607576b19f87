package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{EpochStore, Tombstones}

/** Persisted per-language SCORE CALIBRATION store — the maintenance
  * form of q139's CCNet-style rank cutoff (keep the top 80% of each
  * language by quality score). The full-recompute q139 pays a global
  * per-language RANK — one sort of the whole corpus per read. This
  * store maintains what that rank actually needs:
  *
  *  - `scores/` (doc_id, lang, score): the per-doc 6dp-rounded q101
  *    hashed-linear score — per-doc map-side, append-only (a doc's
  *    score never changes), one epoch per ingest batch.
  *  - `hist/`   (lang, bucket, cnt): per-language score HISTOGRAM
  *    deltas, `bucket = round(score · 10⁶)` — the 6dp rounding makes
  *    buckets exact integers, so the histogram is a lossless
  *    sufficient statistic for the rank: resolved by SUM over
  *    epochs, bounded by (#langs × #distinct scores), never by rows
  *    (the q117/q150 HDR-state argument).
  *
  * [[served]] reconstructs q139's output EXACTLY from the store:
  *   lang_rank(d) = (# docs of d.lang in strictly higher buckets,
  *   read off the cumulative histogram — histogram-cardinality work)
  *   + row_number among d's own (lang, bucket) tie group by doc_id
  *   (windows over tie groups only — no per-language corpus sort).
  * Since bucket ↔ 6dp score is a bijection, this equals ROW_NUMBER
  * ordered by (score DESC, doc_id) row for row, so q159 shares
  * q139's oracle VERBATIM (the q152 oracle-sharing play).
  *
  * Exactly-once: scores/ commits first; the hist/ delta is DERIVED
  * from the committed scores epoch itself (not from the caller's
  * batch), so a crash between the two commits heals on ANY retry of
  * the same epoch id — redelivery recomputes the identical delta
  * from storage, and each commit no-ops if present. Appends must
  * carry NEW doc ids (append-only contract); enforced with the
  * ContainmentStore-style loud guard.
  */
object CalibrationStore {

  /** q139/q101's hashed-linear score relation: (doc_id, lang, score)
    * with the 6dp round-before-rank rule. Shared by the store and the
    * q139 full recompute so the two cannot drift.
    */
  private[graft] def scoreRelation(docs: DataFrame): DataFrame = {
    val k = 1024L
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(graft.functions.Text.tokens(col("text"))).as("token"))
    val bucket = pmod(
      conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long"),
      lit(k))
    val w = (bucket * 2654435761L % 1000003L).cast("double")
      ./(1000003.0).-(0.5)
    tok.select(col("doc_id"), col("lang"), w.as("w"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(sum(col("w").cast("decimal(38,12)")).cast("double")
        / count(lit(1)), 6).as("score"))
  }

  /** The exact integer bucket of a 6dp-rounded score. */
  private def bucketOf(score: Column): Column =
    round(score * 1000000).cast("long")

  private def histOf(scores: DataFrame): DataFrame =
    scores.groupBy(col("lang"), bucketOf(col("score")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Build the store over `docs` (columns doc_id, lang, text). */
  def build(docs: DataFrame, path: String): String = {
    val sc = scoreRelation(docs).localCheckpoint(true)
    EpochStore.create(s"$path/scores", rebuild = true) { base =>
      sc.write.mode("overwrite").parquet(base)
    }
    EpochStore.create(s"$path/hist", rebuild = true) { base =>
      histOf(sc).write.mode("overwrite").parquet(base)
    }
    path
  }

  /** Append one batch as epoch `id`. Replay-idempotent and
    * crash-healing: see the object doc.
    */
  def appendEpoch(batch: DataFrame, path: String, id: Long): Unit = {
    val spark = batch.sparkSession
    val scoresRoot = s"$path/scores"
    val histRoot = s"$path/hist"
    if (EpochStore.committed(scoresRoot, id) &&
        EpochStore.committed(histRoot, id)) return // full replay
    Tombstones.requireNotTombstoned(spark, path,
      batch.select("doc_id"), "CalibrationStore")
    if (!EpochStore.committed(scoresRoot, id)) {
      // append-only contract, enforced loudly (the ContainmentStore
      // guard): a re-ingested doc_id would double-count in the
      // histogram and duplicate its serving row
      val overlap = EpochStore.read(spark, scoresRoot)
        .join(broadcast(batch.select(col("doc_id")).distinct()),
          Seq("doc_id"), "left_semi")
        .limit(1).count()
      if (overlap > 0)
        throw new IllegalArgumentException(
          s"CalibrationStore at $path: append batch contains doc_id(s) " +
            "already resident — scores are append-only; re-ingesting " +
            "would double-count the language histogram")
      EpochStore.commitEpoch(scoresRoot, id) { tmp =>
        scoreRelation(batch).write.mode("overwrite").parquet(tmp)
      }
    }
    // a scores epoch folded out-of-band while its hist half is
    // missing can no longer serve the derivation below — name the
    // recovery instead of silently committing an EMPTY hist delta
    if (EpochStore.folded(scoresRoot, id))
      throw new IllegalStateException(
        s"CalibrationStore at $path: scores epoch=$id was folded by a " +
          "compaction while its hist half is missing — the per-epoch " +
          "derivation is gone; run CalibrationStore.rebuildHistogram " +
          "to restore the hist table from the scores relation")
    // hist delta DERIVED from the committed scores epoch: identical
    // on any redelivery, so the half-commit crash window self-heals
    val committedScores = EpochStore.read(spark, scoresRoot)
      .filter(col("epoch") === id.toString)
      .select(col("doc_id"), col("lang"), col("score"))
    EpochStore.commitEpoch(histRoot, id) { tmp =>
      histOf(committedScores).write.mode("overwrite").parquet(tmp)
    }
  }

  /** Ad-hoc batch append: complete a dangling half-commit first (the
    * crashed epoch's id is re-used so the heal derivation runs), else
    * mint a fresh id ABOVE both tables' used sets — the hist table
    * also carries forget-negative epochs ([[forget]]) that the scores
    * side never sees, so a bare min-of-nexts could collide a new
    * append with a committed forget delta and silently no-op its
    * hist half.
    */
  def append(batch: DataFrame, path: String): Unit = {
    val dangling = EpochStore.committedIds(s"$path/scores") --
      EpochStore.committedIds(s"$path/hist")
    val id =
      if (dangling.nonEmpty) dangling.min
      else math.max(
        EpochStore.nextAppendEpochId(s"$path/scores"),
        EpochStore.nextAppendEpochId(s"$path/hist"))
    appendEpoch(batch, path, id)
  }

  /** Forget documents (right-to-be-forgotten): ONE tombstone epoch on
    * the store's `forgotten/` table plus a NEGATIVE histogram delta
    * derived from the tombstoned docs' STILL-STORED score rows — the
    * store's own two-table heal discipline pointed backwards: the
    * delta recomputes identically from storage on any retry, so a
    * crash between the two commits heals on redelivery, and a full
    * replay of the batch is a no-op (already-tombstoned ids are
    * dropped before an epoch is minted). [[scores]] excludes the set
    * immediately; [[histogram]] stays a raw delta sum (the negative
    * epoch IS the correction); [[compact]] purges physically.
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    // the id must be fresh on BOTH the forgotten table and hist
    // (forget-band ids — see EpochStore.ForgetFloor: band disjointness
    // is what keeps a dangling forget detectable by id-set compare)
    val id = math.max(
      if (graft.engine.Archive.hasVersion(s"$path/forgotten"))
        EpochStore.nextForgetEpochId(s"$path/forgotten")
      else EpochStore.ForgetFloor,
      EpochStore.nextForgetEpochId(s"$path/hist"))
    Tombstones.forget(spark, path, ids, withId = Some(id))
    healForgetDeltas(spark, path)
  }

  /** Commit the hist negative for every forgotten epoch whose delta
    * is missing — the forget heal. Called by [[forget]] (crash
    * between its two commits) and by [[maintain]] (a tick that finds
    * the divergence explained ENTIRELY by dangling forgets repairs
    * them — the negative recomputes deterministically from the
    * stored forgotten ids, unlike a dangling append whose heal needs
    * the appender's retry data).
    */
  private def healForgetDeltas(spark: SparkSession, path: String): Unit = {
    val dangling = EpochStore.committedIds(s"$path/forgotten") --
      EpochStore.committedIds(s"$path/hist")
    dangling.toSeq.sorted.foreach { id =>
      val epochIds = EpochStore.read(spark, s"$path/forgotten")
        .filter(col("epoch") === id.toString)
        .select(col("doc_id"))
      val gone = EpochStore.read(spark, s"$path/scores")
        .join(broadcast(epochIds), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"), col("score"))
      EpochStore.commitEpoch(s"$path/hist", id) { tmp =>
        histOf(gone).withColumn("cnt", -col("cnt"))
          .write.mode("overwrite").parquet(tmp)
      }
    }
  }

  /** Streaming maintenance: one epoch per micro-batch. */
  def appendStream(docs: DataFrame, path: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendEpoch(batch, path, batchId)
      }
      .start()

  /** The resolved per-doc score relation (append-only union, minus
    * any forgotten docs — the histogram side needs no read fix: the
    * forget negatives keep its raw delta sum exact).
    */
  def scores(spark: SparkSession, path: String): DataFrame =
    Tombstones.exclude(
      EpochStore.read(spark, s"$path/scores")
        .select(col("doc_id"), col("lang"), col("score")),
      path, "doc_id")

  /** The resolved per-language histogram (sum over epoch deltas). */
  def histogram(spark: SparkSession, path: String): DataFrame =
    EpochStore.read(spark, s"$path/hist")
      .groupBy(col("lang"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** q159's body: q139's calibrated filter SERVED from the store —
    * bit-identical to the full recompute (the object doc's rank
    * decomposition), with no per-language corpus sort: the cumulative
    * walk runs over the HISTOGRAM, and the only doc-keyed window
    * partitions by (lang, bucket) tie groups.
    */
  def served(spark: SparkSession, path: String): DataFrame = {
    val sc = scores(spark, path)
    val hist = histogram(spark, path)
    val above = hist.withColumn("above",
      coalesce(sum(col("cnt")).over(Window.partitionBy(col("lang"))
        .orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val nLang = hist.groupBy(col("lang")).agg(sum(col("cnt")).as("n_lang"))
    sc.withColumn("bucket", bucketOf(col("score")))
      .join(above.select(col("lang"), col("bucket"), col("above")),
        Seq("lang", "bucket"))
      .join(nLang, Seq("lang"))
      .withColumn("tie_rank", row_number().over(
        Window.partitionBy(col("lang"), col("bucket"))
          .orderBy(col("doc_id"))))
      .select(col("doc_id"), col("lang"), col("score"),
        (col("above") + col("tie_rank")).cast("int").as("lang_rank"),
        ((col("above") + col("tie_rank")) * 5 <= col("n_lang") * 4 + 4)
          .cast("int").as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Fold both tables' epochs (hist deltas sum into one row per
    * (lang, bucket); scores concatenate). Refuses over a
    * half-committed append: folding the scores side of a dangling
    * epoch would delete the very epoch dir the heal derives the hist
    * delta from.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    if (divergedIds(path))
      throw new IllegalStateException(
        s"CalibrationStore at $path has diverged epoch sets — a " +
          "half-committed append or forget; heal via the appender's " +
          "retry / CalibrationStore.forget (or rebuildHistogram) " +
          "before compacting")
    // hist folds FIRST (its delta sum is already net of forget
    // negatives, so the folded base equals histOf(remaining scores)
    // whether or not the scores purge below has happened — either
    // crash side leaves every read surface exact)
    val folded = histogram(spark, path).localCheckpoint(true)
    EpochStore.create(s"$path/hist", rebuild = true) { base =>
      folded.write.mode("overwrite").parquet(base)
    }
    EpochStore.compact(spark, s"$path/scores",
      transform = Tombstones.exclude(_, path, "doc_id"))
    Tombstones.clear(spark, path)
  }

  /** Half-commit detector: every hist epoch is an append's (shared
    * with scores) or a forget's negative (shared with the forgotten
    * table), so the three tables' committed-id sets must satisfy
    * hist == scores ∪ forgotten.
    */
  private def divergedIds(path: String): Boolean = {
    val forgotten =
      if (graft.engine.Archive.hasVersion(s"$path/forgotten"))
        EpochStore.committedIds(s"$path/forgotten")
      else Set.empty[Long]
    EpochStore.committedIds(s"$path/scores") ++ forgotten !=
      EpochStore.committedIds(s"$path/hist")
  }

  /** True iff the id-set divergence is explained ENTIRELY by forget
    * epochs whose hist negative is missing — every scores id reached
    * hist, hist holds nothing outside scores ∪ forgotten, and at
    * least one forgotten id is dangling. Exactly the state
    * [[healForgetDeltas]] repairs without outside data.
    */
  private def forgetDanglingOnly(path: String): Boolean = {
    val f =
      if (graft.engine.Archive.hasVersion(s"$path/forgotten"))
        EpochStore.committedIds(s"$path/forgotten")
      else Set.empty[Long]
    val s = EpochStore.committedIds(s"$path/scores")
    val h = EpochStore.committedIds(s"$path/hist")
    (f -- h).nonEmpty && (s -- h).isEmpty && (h -- (s ++ f)).isEmpty
  }

  /** Out-of-band recovery: the histogram is fully DERIVABLE from the
    * scores table, so a hist side wedged beyond the epoch-derived
    * heal (e.g. its epoch folded out-of-band) rebuilds in one pass.
    * The rebuilt base contains every SCORES epoch's contribution —
    * including any dangling epoch the hist side never committed — so
    * those ids are recorded as folded into the new base: the
    * appender's inevitable retry of the crashed epoch is then a
    * storage no-op (it would otherwise double-count the histogram),
    * and the two tables' committed-id sets converge, unblocking
    * compaction.
    */
  def rebuildHistogram(spark: SparkSession, path: String): Unit = {
    // scores() already excludes tombstoned docs, so the rebuilt base
    // needs no forget negatives; their epoch ids fold into the ledger
    // (alsoFolded) so a dangling forget's heal retry stays a no-op
    val folded = histOf(scores(spark, path)).localCheckpoint(true)
    val forgottenIds =
      if (graft.engine.Archive.hasVersion(s"$path/forgotten"))
        EpochStore.committedIds(s"$path/forgotten")
      else Set.empty[Long]
    EpochStore.create(s"$path/hist", rebuild = true,
      alsoFolded = EpochStore.committedIds(s"$path/scores") ++
        forgottenIds) { base =>
      folded.write.mode("overwrite").parquet(base)
    }
  }

  final case class MaintenanceReport(compacted: Boolean,
                                     diverged: Boolean,
                                     scoreEpochs: Int,
                                     histEpochs: Int,
                                     nDocs: Long,
                                     nLangs: Long,
                                     histRows: Long)

  /** One maintenance tick: heal any dangling FORGET deltas first
    * (the negative recomputes deterministically from the stored
    * forgotten ids — [[healForgetDeltas]]), report a half-committed
    * APPEND untouched (its heal is the appender's retry, which
    * carries batch data this tick does not have), else apply the
    * compaction policy, then one census — doc count, language count,
    * and the histogram-relation cardinality (the bounded-state
    * claim, observable).
    */
  def maintain(spark: SparkSession, path: String,
               maxEpochs: Int = 64): MaintenanceReport = {
    if (forgetDanglingOnly(path)) healForgetDeltas(spark, path)
    val diverged = divergedIds(path)
    val fragmented = !diverged &&
      (EpochStore.epochCount(s"$path/scores") > maxEpochs ||
        EpochStore.epochCount(s"$path/hist") > maxEpochs ||
        Tombstones.pending(spark, path))
    if (fragmented) compact(spark, path)
    val hist = histogram(spark, path)
    val census = hist.agg(count(lit(1)).as("rows"),
      count_distinct(col("lang")).as("langs"),
      sum(col("cnt")).as("docs")).head()
    MaintenanceReport(
      compacted = fragmented,
      diverged = diverged,
      scoreEpochs = EpochStore.epochCount(s"$path/scores"),
      histEpochs = EpochStore.epochCount(s"$path/hist"),
      nDocs = if (census.isNullAt(2)) 0L else census.getLong(2),
      nLangs = census.getLong(1),
      histRows = census.getLong(0))
  }
}
