package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.EpochStore

/** Persisted PERCEPTUAL-HASH index — the EIGHTH build-once/
  * query-many store, completing the fourth dedup modality's
  * incremental story (q158 gave images their hash family; this gives
  * them the [[MinHashIndex]] serving shape): each asset is hashed
  * ONCE at ingest and a crawl batch probes the resident corpus by
  * band equality without re-hashing (or re-decoding) anything
  * resident.
  *
  * Layout under `path` — two append-only [[EpochStore]] tables:
  *
  *  - `hashes/` (doc_id, hi, lo): the 64-bit dHash split into the
  *    32-bit halves ([[graft.functions.Media.dHash64FromGrid]]'s
  *    layout — real pixels via [[graft.functions.Media.imageHashes]],
  *    or q158's fake-decode fingerprints on the oracle surface).
  *  - `bands/`  (band, v, doc_id): the 4×16-bit band postings — the
  *    probe side of the Manku-style multi-index, DERIVED from the
  *    hashes.
  *
  * Exactly-once — the [[CalibrationStore]] derived-heal scheme:
  * hashes commit first, and the bands delta derives FROM THE
  * COMMITTED hashes epoch (not the caller's batch), so a crash
  * between the two commits heals on any retry of the same id with no
  * batch verification; a hashes epoch folded out-of-band names
  * [[rebuildBands]] as its recovery. Appends must carry NEW doc ids
  * (append-only contract, enforced loudly).
  *
  * Probe exactness: two hashes within Hamming ≤ 3 agree exactly on
  * one of the 4 bands (pigeonhole), so [[matches]] misses nothing
  * below the bucket cap; over-cap buckets collapse to their
  * representative (the [[graft.operators.BandedPairs]] discipline).
  */
object PHashIndex {

  private def bandsOf(fp: DataFrame): DataFrame = fp
    .select(col("doc_id"), explode(array(
      struct(lit(0).as("band"), shiftright(col("hi"), 16).as("v")),
      struct(lit(1).as("band"),
        col("hi").bitwiseAND(lit(0xFFFFL)).as("v")),
      struct(lit(2).as("band"), shiftright(col("lo"), 16).as("v")),
      struct(lit(3).as("band"),
        col("lo").bitwiseAND(lit(0xFFFFL)).as("v")))).as("bv"))
    .select(col("bv.band").as("band"), col("bv.v").as("v"), col("doc_id"))

  /** Build the index from a fingerprint relation (doc_id, hi, lo). */
  def build(fp: DataFrame, path: String): String = {
    val pinned = fp.localCheckpoint(true)
    EpochStore.create(s"$path/hashes", rebuild = true) { base =>
      pinned.write.mode("overwrite").parquet(base)
    }
    EpochStore.create(s"$path/bands", rebuild = true) { base =>
      bandsOf(pinned).write.mode("overwrite")
        .partitionBy("band").parquet(base)
    }
    path
  }

  /** Append one batch of fingerprints as epoch `id`. Replay-idempotent
    * and crash-healing: see the object doc.
    */
  def appendEpoch(batch: DataFrame, path: String, id: Long): Unit = {
    val spark = batch.sparkSession
    val hashesRoot = s"$path/hashes"
    val bandsRoot = s"$path/bands"
    if (EpochStore.committed(hashesRoot, id) &&
        EpochStore.committed(bandsRoot, id)) return // full replay
    if (!EpochStore.committed(hashesRoot, id)) {
      val overlap = EpochStore.read(spark, hashesRoot)
        .join(broadcast(batch.select(col("doc_id")).distinct()),
          Seq("doc_id"), "left_semi")
        .limit(1).count()
      if (overlap > 0)
        throw new IllegalArgumentException(
          s"PHashIndex at $path: append batch contains doc_id(s) " +
            "already resident — the hash tables are append-only; " +
            "appends must carry NEW ids only")
      EpochStore.commitEpoch(hashesRoot, id) { tmp =>
        batch.select(col("doc_id"), col("hi"), col("lo"))
          .write.mode("overwrite").parquet(tmp)
      }
    }
    if (EpochStore.folded(hashesRoot, id))
      throw new IllegalStateException(
        s"PHashIndex at $path: hashes epoch=$id was folded by a " +
          "compaction while its bands half is missing — run " +
          "PHashIndex.rebuildBands to restore the band postings from " +
          "the hash relation")
    val committed = EpochStore.read(spark, hashesRoot)
      .filter(col("epoch") === id.toString)
      .select(col("doc_id"), col("hi"), col("lo"))
    EpochStore.commitEpoch(bandsRoot, id) { tmp =>
      bandsOf(committed).write.mode("overwrite")
        .partitionBy("band").parquet(tmp)
    }
  }

  /** Ad-hoc batch append: id from the LAGGING table so a crashed
    * half-commit completes before new ids are minted.
    */
  def append(batch: DataFrame, path: String): Unit = {
    val id = math.min(
      EpochStore.nextAppendEpochId(s"$path/hashes"),
      EpochStore.nextAppendEpochId(s"$path/bands"))
    appendEpoch(batch, path, id)
  }

  /** Streaming maintenance: one epoch per micro-batch of
    * fingerprints.
    */
  def appendStream(fp: DataFrame, path: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    fp.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendEpoch(batch, path, batchId)
      }
      .start()

  /** The stored fingerprint relation. */
  def hashes(spark: SparkSession, path: String): DataFrame =
    EpochStore.read(spark, s"$path/hashes")
      .select(col("doc_id"), col("hi"), col("lo"))

  /** Probe the index with a batch of fingerprints: every (probe doc,
    * resident doc) pair within Hamming ≤ `maxDist` — the
    * new-crawl-vs-corpus dedup screen. The probe side is banded and
    * broadcast (batch-sized); the stored postings are read
    * band-partitioned; over-cap buckets take their representative
    * (exactness below the cap — the q68 discipline); verify is one
    * XOR+popcount per candidate against the stored hashes.
    */
  def matches(spark: SparkSession, path: String, probe: DataFrame,
              maxDist: Int = 3,
              maxBucket: Long = TextOps.MaxLshBucket): DataFrame = {
    val fp = probe.localCheckpoint(true) // bands + verify side
    val stored = EpochStore.read(spark, s"$path/bands")
    val bucketSized = stored
      .groupBy(col("band"), col("v"))
      .agg(count(lit(1)).as("m"), min(col("doc_id")).as("rep"))
    val capped = stored.join(bucketSized, Seq("band", "v"))
      .filter(col("m") <= maxBucket || col("doc_id") === col("rep"))
      .select(col("band"), col("v"), col("doc_id").as("match_id"))
    val cands = capped
      .join(broadcast(bandsOf(fp)), Seq("band", "v"))
      .select(col("doc_id"), col("match_id")).distinct()
    cands
      .join(broadcast(fp.select(col("doc_id"),
        col("hi").as("p_hi"), col("lo").as("p_lo"))), Seq("doc_id"))
      .join(hashes(spark, path)
        .select(col("doc_id").as("match_id"),
          col("hi").as("s_hi"), col("lo").as("s_lo")), Seq("match_id"))
      .select(col("doc_id"), col("match_id"),
        (bit_count(col("p_hi").bitwiseXOR(col("s_hi"))) +
          bit_count(col("p_lo").bitwiseXOR(col("s_lo"))))
          .cast("int").as("dist"))
      .filter(col("dist") <= maxDist)
      .orderBy(col("doc_id"), col("match_id"))
  }

  /** Out-of-band recovery: the band postings are fully DERIVABLE from
    * the hash relation. The rebuilt base contains every HASHES
    * epoch's postings — including any dangling epoch the bands side
    * never committed — so those ids are recorded as folded into the
    * new base: the appender's retry of the crashed epoch is then a
    * storage no-op (duplicated postings would inflate bucket sizes
    * past the probe cap and silently drop true matches), and the two
    * tables' committed-id sets converge, unblocking compaction.
    */
  def rebuildBands(spark: SparkSession, path: String): Unit = {
    val folded = bandsOf(hashes(spark, path)).localCheckpoint(true)
    EpochStore.create(s"$path/bands", rebuild = true,
      alsoFolded = EpochStore.committedIds(s"$path/hashes")) { base =>
      folded.write.mode("overwrite").partitionBy("band").parquet(base)
    }
  }

  /** Fold both tables' epochs. Refuses over a half-committed append
    * (folding the hashes side would delete the epoch the heal
    * derives from).
    */
  def compact(spark: SparkSession, path: String): Unit = {
    if (EpochStore.committedIds(s"$path/hashes") !=
        EpochStore.committedIds(s"$path/bands"))
      throw new IllegalStateException(
        s"PHashIndex at $path has diverged epoch sets — a " +
          "half-committed append; heal via the appender's retry (or " +
          "rebuildBands) before compacting")
    EpochStore.compact(spark, s"$path/hashes")
    EpochStore.compact(spark, s"$path/bands", partitionCols = Seq("band"))
  }

  final case class MaintenanceReport(compacted: Boolean,
                                     diverged: Boolean,
                                     hashEpochs: Int,
                                     bandEpochs: Int,
                                     nAssets: Long,
                                     maxBucket: Long)

  /** One maintenance tick: diverged-first, compaction policy, then a
    * census — asset count and the largest band bucket (the recall-
    * risk signal for the probe cap, [[MinHashIndex.bucketStats]]'s
    * analog).
    */
  def maintain(spark: SparkSession, path: String,
               maxEpochs: Int = 64): MaintenanceReport = {
    val diverged = EpochStore.committedIds(s"$path/hashes") !=
      EpochStore.committedIds(s"$path/bands")
    val fragmented = !diverged &&
      (EpochStore.epochCount(s"$path/hashes") > maxEpochs ||
        EpochStore.epochCount(s"$path/bands") > maxEpochs)
    if (fragmented) compact(spark, path)
    val nAssets = hashes(spark, path).count()
    val bucketRow = EpochStore.read(spark, s"$path/bands")
      .groupBy(col("band"), col("v")).agg(count(lit(1)).as("m"))
      .agg(max(col("m"))).head()
    MaintenanceReport(
      compacted = fragmented,
      diverged = diverged,
      hashEpochs = EpochStore.epochCount(s"$path/hashes"),
      bandEpochs = EpochStore.epochCount(s"$path/bands"),
      nAssets = nAssets,
      maxBucket = if (bucketRow.isNullAt(0)) 0L else bucketRow.getLong(0))
  }
}
