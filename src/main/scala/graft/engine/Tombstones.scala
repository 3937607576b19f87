package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten primitive shared by the persisted stores —
  * the operation a training-data pipeline cannot ship without: a
  * takedown/GDPR batch must leave every store's READ surface exactly
  * as if the documents had never been ingested, without rewriting a
  * 100 TB store per request.
  *
  * Design: MERGE-ON-READ tombstones with purge-at-compaction — the
  * Delta/Iceberg delete-vector posture, in this engine's own epoch
  * vocabulary:
  *
  *  - each store gains one `forgotten/` [[EpochStore]] table of ids.
  *    A forget batch is ONE committed epoch there (atomic, replay-
  *    idempotent under the usual epoch contract), so forget cost is
  *    O(|batch|) regardless of store size;
  *  - every read surface excludes the forgotten set with a broadcast
  *    anti-join ([[exclude]]) — the set is bounded by takedown
  *    volume between compactions, so the join stays a map-side
  *    probe. Aggregated state (CalibrationStore's histogram) is
  *    corrected by SUBTRACTING the tombstoned rows' contribution,
  *    derived at read time from the still-present base rows;
  *  - the store's next compaction PURGES: the fold excludes
  *    tombstoned rows from the new base, then [[clear]] resets the
  *    forgotten table to an empty base CARRYING its epoch ledger, so
  *    a replayed forget batch stays a storage no-op after its rows
  *    are physically gone. A crash between the data flip and the
  *    clear leaves tombstones that now anti-join against nothing —
  *    harmless, and the next compaction converges.
  *
  * What forgetting does NOT undo, stated honestly: model state
  * TRAINED on forgotten rows (k-means codebooks, PQ subspace books,
  * learned BPE merges). Those are bounded aggregates retaining no
  * row, and the stores' existing health-driven rebuild cadence
  * re-trains them from the post-purge corpus — machine unlearning
  * beyond that is a policy question, not a storage one.
  */
object Tombstones {

  private def root(path: String) = s"$path/forgotten"

  private def emptyIds(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("doc_id"))

  /** Commit a forget batch (any single-column frame of ids) as one
    * epoch of the store's forgotten table, creating the table on
    * first use. Already-forgotten ids are dropped first so an
    * at-least-once caller redelivering the same batch (under a new
    * derived id) converges instead of growing the table. Returns the
    * committed epoch id, or -1 when every id was already tombstoned.
    *
    * `withId`: stores whose forget also posts a DERIVED epoch to a
    * sibling table (CalibrationStore's negative histogram delta)
    * mint the id themselves so it is fresh on BOTH tables — a
    * forgotten-table-local id could collide with a committed epoch
    * on the sibling and silently no-op the derived half.
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame,
             withId: Option[Long] = None): Long = {
    val r = root(path)
    if (!Archive.hasVersion(r))
      EpochStore.create(r) { base =>
        emptyIds(spark).write.mode("overwrite").parquet(base)
      }
    val fresh = ids.select(col(ids.columns.head).cast("long").as("doc_id"))
      .distinct()
      .join(EpochStore.read(spark, r).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    if (fresh.isEmpty) return -1L
    val id = withId.getOrElse(EpochStore.nextForgetEpochId(r))
    EpochStore.commitEpoch(r, id) { tmp =>
      fresh.coalesce(1).write.mode("overwrite").parquet(tmp)
    }
    id
  }

  /** The store's forgotten ids (empty frame when none yet). */
  def ids(spark: SparkSession, path: String): DataFrame =
    if (!Archive.hasVersion(root(path))) emptyIds(spark)
    else EpochStore.read(spark, root(path))
      .select(col("doc_id")).distinct()

  /** Anti-join `df` against the forgotten set on `keyCol` — the
    * merge-on-read exclusion every read surface applies. A store
    * with no forgotten table reads untouched (no job, no plan
    * change).
    */
  def exclude(df: DataFrame, path: String, keyCol: String): DataFrame =
    if (!Archive.hasVersion(root(path))) df
    else df.join(
      broadcast(ids(df.sparkSession, path)
        .withColumnRenamed("doc_id", keyCol)),
      Seq(keyCol), "left_anti")

  /** True when the store has tombstones awaiting a purge. */
  def pending(spark: SparkSession, path: String): Boolean =
    Archive.hasVersion(root(path)) && !ids(spark, path).isEmpty

  /** Loud append guard: a batch id that is currently TOMBSTONED
    * (forgotten but not yet purged) must not be re-ingested. The
    * store still holds the taken-down rows physically — admitting
    * new rows under the same id would either resurrect the old ones
    * (were the id un-forgotten) or hide the new rows behind the
    * exclusion and then DESTROY them at the purging fold (were it
    * kept) — both silent, both wrong. Compaction purges and clears,
    * after which the id is clean to re-use (a re-crawl of
    * previously-taken-down content is new content). Every store's
    * appendEpoch calls this; the composed crawl stream's maintenance
    * tick is the natural purge point between a takedown day and a
    * re-crawl day.
    */
  def requireNotTombstoned(spark: SparkSession, path: String,
                           batchIds: DataFrame, store: String): Unit =
    if (Archive.hasVersion(root(path))) {
      val hit = batchIds
        .select(col(batchIds.columns.head).cast("long").as("doc_id"))
        .distinct()
        .join(broadcast(ids(spark, path)), Seq("doc_id"), "left_semi")
        .limit(1).count()
      if (hit > 0)
        throw new IllegalStateException(
          s"$store at $path: the append batch re-uses id(s) that are " +
            "tombstoned awaiting purge — run the store's compaction " +
            "(physical purge + tombstone clear) before re-ingesting a " +
            "forgotten id")
    }

  /** Tombstone count for maintenance censuses (0 when no table). */
  def count(spark: SparkSession, path: String): Long =
    if (!Archive.hasVersion(root(path))) 0L
    else ids(spark, path).count()

  /** Reset the forgotten table to an empty base after a purging
    * fold, CARRYING the epoch ledger (a replayed forget id must stay
    * a no-op — its rows are physically gone from the new base).
    */
  def clear(spark: SparkSession, path: String): Unit =
    if (Archive.hasVersion(root(path)))
      EpochStore.create(root(path), rebuild = true) { base =>
        emptyIds(spark).write.mode("overwrite").parquet(base)
      }
}
