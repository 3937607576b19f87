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
  * When [[maintain]] reports a bucket over the probe cap (the
  * phash_bucket_over_cap cue of the composed Maintenance tick),
  * [[rebandIfOverCap]] is the measured response: re-derive the
  * postings under a ROTATED 4×16 band split (every disjoint split
  * keeps the pigeonhole) when — and only when — the measurement says
  * the rotation spreads the bucket; a true mega-cluster of identical
  * fingerprints is rotation-invariant and stays collapsed, which is
  * the correct serving shape for it.
  *
  * Migration note (round 12): fingerprint producers now DROP
  * zero-token documents instead of emitting their all-zero
  * fingerprint ([[MultimodalOps.phashFingerprints]]), so new probes
  * never carry (hi=0, lo=0). A store built BEFORE that change may
  * still hold the empty docs' all-zero rows in its hashes/bands
  * epochs and keeps serving the spurious dist-0 empty-doc cluster to
  * any all-zero STORED row until it is migrated: rebuild the store
  * from the source corpus, or one-off delete the `hi = 0 AND lo = 0`
  * rows from the hashes epochs and run [[rebuildBands]].
  */
object PHashIndex {

  /** The 4×16-bit band postings of a fingerprint relation under a
    * band LAYOUT: the 64-bit word (hi ++ lo) is rotated left by
    * `rot` bits, then split into four disjoint 16-bit bands. ANY
    * disjoint 4-way split preserves the ≤3-Hamming pigeonhole
    * (rotation never changes which PAIRS are reachable below the
    * cap — it changes which VALUES share a bucket), which is exactly
    * the [[rebandIfOverCap]] lever: a degenerate region of the hash
    * space that welds one band's value constant (an over-cap bucket
    * of coincidental collisions) spreads across bucket values under
    * a rotated split. `rot` = 0 is the layout [[build]] writes.
    */
  private def bandsOf(fp: DataFrame, rot: Int): DataFrame = {
    require(rot >= 0 && rot < 64, s"band rotation out of range: $rot")
    val w = shiftleft(col("hi"), 32).bitwiseOR(col("lo"))
    val wr =
      if (rot == 0) w
      else shiftleft(w, rot).bitwiseOR(shiftrightunsigned(w, 64 - rot))
    fp.select(col("doc_id"), wr.as("w"))
      .select(col("doc_id"), explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("w"), 48 - 16 * b)
            .bitwiseAND(lit(0xFFFFL)).as("v"))): _*)).as("bv"))
      .select(col("bv.band").as("band"), col("bv.v").as("v"), col("doc_id"))
  }

  private val BandLayoutName = "_bandlayout"

  /** The live bands table's rotation — absent sidecar reads as the
    * build layout (rot 0). Writers (append, reband) resolve the live
    * version directly: the single-maintenance-writer contract already
    * serializes them against flips. READERS must instead resolve
    * through a pinned snapshot ([[rotationOf]]) so a re-band flip
    * cannot pair one layout with the other layout's postings.
    */
  private[graft] def storedRotation(path: String): Int =
    rotationOf(EpochStore.liveDir(s"$path/bands"))

  /** The rotation recorded in a PINNED bands version dir. */
  private def rotationOf(bandsVersionDir: String): Int = {
    val f = java.nio.file.Paths.get(bandsVersionDir, BandLayoutName)
    if (!java.nio.file.Files.exists(f)) 0
    else java.nio.file.Files.readString(f).trim.toInt
  }

  private def writeRotation(versionDir: String, rot: Int): Unit = {
    val dir = java.nio.file.Paths.get(versionDir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(
      dir.resolve(BandLayoutName), rot.toString): Unit
  }

  /** Build the index from a fingerprint relation (doc_id, hi, lo). */
  def build(fp: DataFrame, path: String): String = {
    val pinned = fp.localCheckpoint(true)
    EpochStore.create(s"$path/hashes", rebuild = true) { base =>
      pinned.write.mode("overwrite").parquet(base)
    }
    EpochStore.create(s"$path/bands", rebuild = true) { base =>
      writeRotation(base.stripSuffix("/epoch=base"), 0)
      bandsOf(pinned, 0).write.mode("overwrite")
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
    // replay no-op BEFORE the tombstone guard (the MinHashIndex
    // ordering rationale): a redelivered append+forget day must
    // converge, not wedge on its own same-day tombstones
    if (EpochStore.committed(hashesRoot, id) &&
        EpochStore.committed(bandsRoot, id)) return // full replay
    graft.engine.Tombstones.requireNotTombstoned(spark, path,
      batch.select("doc_id"), "PHashIndex")
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
    val rot = storedRotation(path)
    EpochStore.commitEpoch(bandsRoot, id) { tmp =>
      bandsOf(committed, rot).write.mode("overwrite")
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

  /** The stored fingerprint relation, minus any forgotten docs. */
  def hashes(spark: SparkSession, path: String): DataFrame =
    graft.engine.Tombstones.exclude(
      EpochStore.read(spark, s"$path/hashes")
        .select(col("doc_id"), col("hi"), col("lo")),
      path, "doc_id")

  /** Forget documents: one tombstone epoch; [[matches]] and
    * [[hashes]] exclude the set immediately (a forgotten asset can
    * no longer surface as a match or serve as a bucket
    * representative), the next [[compact]] purges both tables. See
    * [[graft.engine.Tombstones]].
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame): Unit =
    graft.engine.Tombstones.forget(spark, path, ids): Unit

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
    // one pinned snapshot for the whole read: the probe-side band
    // layout, the postings it joins, and the verify hashes must come
    // from the same store version — a re-band or compaction flip
    // racing this read must not mix them (the EpochStore.snapshot
    // discipline; rotation and postings flip together by staging)
    val snap = EpochStore.snapshot(Seq(s"$path/bands", s"$path/hashes"))
    val rot = rotationOf(snap.dir(s"$path/bands"))
    val stored = graft.engine.Tombstones.exclude(
      snap.read(spark, s"$path/bands"), path, "doc_id")
    val bucketSized = stored
      .groupBy(col("band"), col("v"))
      .agg(count(lit(1)).as("m"), min(col("doc_id")).as("rep"))
    val capped = stored.join(bucketSized, Seq("band", "v"))
      .filter(col("m") <= maxBucket || col("doc_id") === col("rep"))
      .select(col("band"), col("v"), col("doc_id").as("match_id"))
    val cands = capped
      .join(broadcast(bandsOf(fp, rot)), Seq("band", "v"))
      .select(col("doc_id"), col("match_id")).distinct()
    cands
      .join(broadcast(fp.select(col("doc_id"),
        col("hi").as("p_hi"), col("lo").as("p_lo"))), Seq("doc_id"))
      .join(graft.engine.Tombstones.exclude(
          snap.read(spark, s"$path/hashes"), path, "doc_id")
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
  def rebuildBands(spark: SparkSession, path: String): Unit =
    rebuildBands(spark, path, storedRotation(path))

  /** [[rebuildBands]] under an explicit band layout — the write half
    * of [[rebandIfOverCap]]: the new base derives every posting from
    * the stored hashes at `rot`, and the rotation sidecar flips with
    * it in the same manifest rename (a reader never pairs a layout
    * with postings it didn't produce).
    */
  private[graft] def rebuildBands(spark: SparkSession, path: String,
                                  rot: Int): Unit = {
    val folded = bandsOf(hashes(spark, path), rot).localCheckpoint(true)
    EpochStore.create(s"$path/bands", rebuild = true,
      alsoFolded = EpochStore.committedIds(s"$path/hashes")) { base =>
      writeRotation(base.stripSuffix("/epoch=base"), rot)
      folded.write.mode("overwrite").partitionBy("band").parquet(base)
    }
  }

  final case class RebandReport(rebanded: Boolean,
                                rotationBefore: Int,
                                rotationAfter: Int,
                                maxBucketBefore: Long,
                                maxBucketByRotation: Map[Int, Long])

  /** The MEASURED over-cap response — the q144 → rebuildIfStale
    * pattern for this store: when [[maintain]]'s probe-recall cue
    * fires (`maxBucket` above the probe cap, i.e. [[matches]] is
    * collapsing that bucket to its representative and true matches
    * behind it go unreported), measure the max bucket EVERY candidate
    * rotation would give (one pass over the stored hashes, rotations
    * exploded) and re-band to the argmin — but only when the
    * measurement says the move helps (a TRUE mega-cluster of
    * identical fingerprints is invariant under every rotation: the
    * report then says so and the store is left alone; collapsing such
    * a cluster to its representative is the correct serving shape).
    * Tie-break prefers the current layout (no churn), then the
    * smaller rotation. Single-maintenance-writer contract: run
    * between appends, like [[compact]].
    */
  def rebandIfOverCap(spark: SparkSession, path: String,
                      maxBucket: Long = TextOps.MaxLshBucket,
                      candidates: Seq[Int] = Seq(0, 4, 8, 12)): RebandReport = {
    val rot0 = storedRotation(path)
    val cands = (candidates :+ rot0).distinct
    // measure through bandsOf itself (the measurement CANNOT drift
    // from the banding it predicts); the hash relation is compact
    // (24 bytes/doc) and pinned once, so each candidate costs one
    // small aggregate over it
    val fp = hashes(spark, path).localCheckpoint(true)
    if (fp.isEmpty)
      return RebandReport(rebanded = false, rot0, rot0, 0L, Map.empty)
    val maxByRot = cands.map { r =>
      r -> bandsOf(fp, r)
        .groupBy(col("band"), col("v")).agg(count(lit(1)).as("m"))
        .agg(max(col("m"))).head().getLong(0)
    }.toMap
    val before = maxByRot(rot0)
    if (before <= maxBucket)
      return RebandReport(rebanded = false, rot0, rot0, before, maxByRot)
    val best = cands.minBy(r => (maxByRot(r), r != rot0, r))
    if (maxByRot(best) >= before)
      return RebandReport(rebanded = false, rot0, rot0, before, maxByRot)
    rebuildBands(spark, path, best)
    RebandReport(rebanded = true, rot0, best, before, maxByRot)
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
    EpochStore.compact(spark, s"$path/hashes",
      transform = graft.engine.Tombstones.exclude(_, path, "doc_id"))
    EpochStore.compact(spark, s"$path/bands", partitionCols = Seq("band"),
      carryExtras = Seq(BandLayoutName),
      transform = graft.engine.Tombstones.exclude(_, path, "doc_id"))
    graft.engine.Tombstones.clear(spark, path)
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
        EpochStore.epochCount(s"$path/bands") > maxEpochs ||
        graft.engine.Tombstones.pending(spark, path))
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
