package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{EpochStore, Tombstones}

/** Persisted content-defined-chunk store — the third build-once/
  * query-many index alongside [[IvfIndex]] (vectors) and
  * [[MinHashIndex]] (shingle signatures): each document is chunked
  * ONCE at ingest ([[QualityOps.chunkRelationOf]], rolling-hash
  * boundaries) and the (doc_id, chunk_id, chunk_str) relation is
  * what every downstream consumer reads — the corpus-wide frequency
  * census (q137), boilerplate removal (q138), or a content-addressed
  * dedup store. Re-chunking the corpus per consumer is exactly what
  * a 100 TB pipeline cannot afford; chunking a daily crawl batch and
  * APPENDING is cheap.
  *
  * Storage: a versioned [[EpochStore]] at `<path>/chunks` — the batch
  * build writes `epoch=base` of v0; each streamed micro-batch commits
  * as its own `epoch=<batchId>` dir via one atomic rename, so a
  * replayed batch is a storage-level no-op and a crash mid-stage
  * leaves only a tmp dir the retry overwrites; [[compact]] folds the
  * accumulated epoch dirs back into one base under a manifest flip
  * (readers stay live; post-compaction replays stay no-ops via the
  * folded-id ledger). Chunking is per-doc deterministic, so
  * build-then-append and build-over-union produce identical rows.
  */
object ChunkIndex {

  /** Chunk `docs` (columns doc_id, text) and write the base epoch. */
  def build(docs: DataFrame, path: String): String = {
    EpochStore.create(s"$path/chunks", rebuild = true) { base =>
      QualityOps.chunkRelationOf(docs)
        .write.mode("overwrite").parquet(base)
    }
    path
  }

  /** Append a batch of new documents as one epoch dir. */
  private[graft] def appendEpoch(batch: DataFrame, path: String,
                                 batchId: Long): Unit = {
    // replay no-op BEFORE the tombstone guard (the MinHashIndex
    // ordering rationale): a redelivered append+forget day must
    // converge, not wedge on its own same-day tombstones
    if (EpochStore.committed(s"$path/chunks", batchId))
      return // full replay — storage-level no-op
    Tombstones.requireNotTombstoned(batch.sparkSession, path,
      batch.select("doc_id"), "ChunkIndex")
    EpochStore.commitEpoch(s"$path/chunks", batchId) { tmp =>
      QualityOps.chunkRelationOf(batch)
        .write.mode("overwrite").parquet(tmp)
    }
  }

  /** Forget documents (right-to-be-forgotten): one tombstone epoch;
    * every read surface excludes the set immediately, the next
    * [[compact]] purges it physically. O(|ids|), never a store
    * rewrite — see [[graft.engine.Tombstones]].
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame): Unit =
    Tombstones.forget(spark, path, ids): Unit

  /** Fold all committed epochs into one base (a new manifest version;
    * readers never see a half-folded store), PURGING any tombstoned
    * docs from the new base, then reset the tombstone table (ledger
    * carried — replayed forgets stay no-ops). Run between batches —
    * the single-maintenance-writer contract in [[EpochStore]].
    */
  def compact(spark: SparkSession, path: String): Unit = {
    EpochStore.compact(spark, s"$path/chunks",
      transform = Tombstones.exclude(_, path, "doc_id"))
    Tombstones.clear(spark, path)
  }

  /** [[compact]] past `maxEpochs` committed epochs OR with tombstones
    * pending (the purge point) — the policy form for a maintenance
    * cron. Returns true iff a fold ran.
    */
  def compactIfFragmented(spark: SparkSession, path: String,
                          maxEpochs: Int = 64): Boolean = {
    val should = EpochStore.epochCount(s"$path/chunks") > maxEpochs ||
      Tombstones.pending(spark, path)
    if (should) compact(spark, path)
    should
  }

  /** Incremental maintenance: each micro-batch of new documents
    * chunks under the same boundary function and commits as its own
    * epoch — no rewrite of existing epochs, replay-idempotent by
    * naming.
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

  /** What one [[maintain]] tick did and saw — the chunk-store analog
    * of [[IvfIndex.MaintenanceReport]]: whether a fold ran, the
    * post-tick epoch count, and the census an operator alerts on —
    * document/chunk counts and the duplicated-occurrence fraction
    * (share of chunk occurrences whose content exists in more than
    * one copy: the q137/q138 dedup-opportunity signal, rising as
    * boilerplate accumulates across appends).
    */
  final case class MaintenanceReport(compacted: Boolean,
                                     epochs: Int,
                                     nDocs: Long,
                                     nChunks: Long,
                                     nDistinctChunks: Long,
                                     dupOccurrenceFrac: Double)

  /** One maintenance TICK — the documented cron body, mirroring
    * [[IvfIndex.maintain]]: [[compactIfFragmented]] (listing-cost
    * bound), then one store scan for the census row. A compact store
    * is a pure-read no-op tick. Single-maintenance-writer contract:
    * run between micro-batches or with the append stream stopped.
    */
  def maintain(spark: SparkSession, path: String,
               maxEpochs: Int = 64): MaintenanceReport = {
    import org.apache.spark.sql.functions._
    val compacted = compactIfFragmented(spark, path, maxEpochs)
    // both census aggregates read ONE cached store scan (the frequency
    // census groups by chunk_str, the doc count by doc_id — different
    // keys, so two aggregates, but the parquet scan is paid once)
    val ch = chunks(spark, path).persist()
    val census = ch
      .groupBy(col("chunk_str"))
      .agg(count(lit(1)).as("n_copies"))
      .agg(sum(col("n_copies")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("n_copies") > 1, col("n_copies")).otherwise(0L))
          .as("dup_occ"))
      .head()
    val nDocs = ch.select(col("doc_id")).distinct().count()
    ch.unpersist()
    val nChunks = if (census.isNullAt(0)) 0L else census.getLong(0)
    MaintenanceReport(compacted,
      EpochStore.epochCount(s"$path/chunks"),
      nDocs, nChunks,
      census.getLong(1),
      if (nChunks == 0L) 0.0
      else census.getLong(2).toDouble / nChunks)
  }

  /** The full chunk relation across every committed epoch, minus any
    * forgotten docs (merge-on-read exclusion).
    */
  def chunks(spark: SparkSession, path: String): DataFrame =
    Tombstones.exclude(
      EpochStore.read(spark, s"$path/chunks")
        .select("doc_id", "chunk_id", "chunk_str"),
      path, "doc_id")

  /** The corpus-wide chunk-frequency index (chunk_str, n_copies) —
    * derived, never stored: counts cannot be appended per-epoch
    * without read-merge, and the aggregate is one shuffle over
    * chunk-cardinality keys.
    */
  def freq(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    chunks(spark, path).groupBy(col("chunk_str"))
      .agg(count(lit(1)).as("n_copies"))
  }
}
