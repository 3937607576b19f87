package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.EpochStore

/** Persisted per-source KMV sketch store — the sketch family joining
  * the build-once/query-many epoch discipline the other stores
  * follow: a crawl batch folds into bounded per-source retained sets
  * ONCE at ingest, and the standing acquisition dashboards (novelty,
  * overlap — q115/q116's estimates) are then served from ≤ (K+1)
  * retained hashes per (source, epoch) without ever re-scanning
  * resident text.
  *
  * Layout under `path` — one append-only [[EpochStore]] table plus a
  * version-scoped sidecar:
  *
  *  - `sketches/` (source, h): each epoch holds the BATCH's own KMV
  *    sketch rows — the K+1 smallest distinct portable md5 shingle
  *    hashes ([[graft.functions.Text.md5ShingleHashes]]) of that
  *    batch per source.
  *  - `_kmvk`: the store's K, written at build and carried by
  *    compaction, so appends and reads can never mix sketch sizes.
  *
  * Correctness rests on KMV's EXACT mergeability, which is what lets
  * the incremental path share q116's full replay oracle verbatim:
  * the K+1 smallest distinct values of A ∪ B are each among the K+1
  * smallest of their own side, so re-sketching the UNION of per-epoch
  * retained rows ([[sketches]]' merge-on-read grouped
  * [[graft.expressions.KmvSketchAgg]]) equals the from-scratch sketch
  * of the union corpus BIT-FOR-BIT — order-free, fragmentation-free
  * (KmvStoreSpec pins the equality; q173 hash-proves the served
  * novelty against the whole-corpus SQL replay).
  *
  * What this store deliberately does NOT support: exact forget. A
  * sketch retains no row provenance to reverse (the codebook/BPE
  * boundary, not the verdict-store one) — removing a source's day
  * from the estimates means rebuilding from the surviving corpus,
  * and [[build]]`(rebuild = true)` with the carried epoch ledger is
  * that path.
  */
object KmvStore {

  private val KName = "_kmvk"

  /** The batch's own bounded sketch rows (source, h): the full K+1
    * BUFFER exploded — the θ witness must travel with the epoch or
    * merge exactness breaks (the [[CorpusStatsOps.kmvBufOf]] note).
    */
  private def batchRows(docs: DataFrame, k: Int): DataFrame =
    CorpusStatsOps.kmvBufOfDocs(docs, k)
      .select(col("source"), explode(col("buf")).as("h"))

  /** Build from a (source, text) corpus slice. `rebuild = true`
    * carries the committed-epoch ledger forward (the post-forget /
    * re-parameterization path).
    */
  def build(docs: DataFrame, path: String,
            k: Int = CorpusStatsOps.KmvKNovelty,
            rebuild: Boolean = false): String = {
    val spark = docs.sparkSession
    val rows = batchRows(docs, k).localCheckpoint(true)
    EpochStore.create(s"$path/sketches", rebuild = rebuild) { base =>
      import spark.implicits._
      Seq(k).toDF("k").coalesce(1).write.mode("overwrite")
        .parquet(base.stripSuffix("/epoch=base") + "/" + KName)
      rows.write.mode("overwrite").parquet(base)
    }
    path
  }

  /** The store's K, resolved from the LIVE version's sidecar — the
    * hidden-dir part-file listing (a `_`-prefixed dir handed to
    * `spark.read` as the root trips the hidden-path filter).
    */
  def storedK(spark: SparkSession, path: String): Int = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(
      EpochStore.liveDir(s"$path/sketches"), KName)
    if (!java.nio.file.Files.isDirectory(dir))
      throw new IllegalStateException(
        s"KmvStore at $path has no $KName sidecar in its live version " +
          "— not a KmvStore layout (or corrupted). Re-run " +
          "KmvStore.build over the corpus.")
    val s = java.nio.file.Files.list(dir)
    val parts =
      try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq
      finally s.close()
    spark.read.parquet(parts: _*).head().getInt(0)
  }

  /** Append one crawl batch as epoch `id` — replay-idempotent (the
    * committed-epoch no-op), single-table so there is no multi-table
    * crash window; the batch is sketched under the STORE's K.
    */
  def appendEpoch(docs: DataFrame, path: String, id: Long): Unit = {
    val spark = docs.sparkSession
    val root = s"$path/sketches"
    if (EpochStore.committed(root, id)) return // full replay
    val k = storedK(spark, path)
    EpochStore.commitEpoch(root, id) { tmp =>
      batchRows(docs, k).write.mode("overwrite").parquet(tmp)
    }
  }

  /** Merge-on-read served sketches (source, theta, retained): the
    * grouped bounded re-sketch of every committed epoch's retained
    * rows — by exact mergeability, identical to the from-scratch
    * sketch of the union corpus.
    */
  def sketches(spark: SparkSession, path: String): DataFrame =
    CorpusStatsOps.kmvSketchOf(
      EpochStore.read(spark, s"$path/sketches").select("source", "h"),
      storedK(spark, path))

  /** Fold all committed epochs into one base. The fold IS the merge
    * (the same bounded re-sketch the read path runs), so the
    * compacted base holds exactly the served retained sets — smaller
    * than the epoch union it replaces, and the served values are
    * unchanged by construction.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val k = storedK(spark, path)
    EpochStore.compact(spark, s"$path/sketches",
      carryExtras = Seq(KName),
      transform = df => CorpusStatsOps.kmvBufOf(
          df.select("source", "h"), k)
        .select(col("source"), explode(col("buf")).as("h")))
  }

  final case class MaintenanceReport(compacted: Boolean,
                                     epochs: Int,
                                     nSources: Long)

  /** One maintenance tick — the [[graft.engine.Maintenance]] cron
    * body's entry for this store: fold when the epoch listing cost
    * crosses the bound (the fold IS the merge, so it also re-trims
    * the stored rows to one buffer per source), and census the
    * served source count. No health-driven rebuild exists here by
    * construction: a KMV sketch never degrades — retained sets are
    * exact functions of the hash SET seen, insensitive to order,
    * fragmentation and skew — so compaction cost is the only
    * maintained dimension.
    */
  def maintain(spark: SparkSession, path: String,
               maxEpochs: Int = 64): MaintenanceReport = {
    val fragmented = EpochStore.epochCount(s"$path/sketches") > maxEpochs
    if (fragmented) compact(spark, path) // the merge-trimming fold
    MaintenanceReport(fragmented,
      EpochStore.epochCount(s"$path/sketches"),
      sketches(spark, path).count())
  }
}
