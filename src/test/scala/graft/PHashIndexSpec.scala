package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.EpochStore
import graft.queries.PHashIndex

/** The persisted perceptual-hash index (build / append / probe /
  * compact / maintain) behind q161. Fingerprints here are crafted
  * longs (the index is hash-family-agnostic); the REAL pixel path is
  * PHashSpec's business and q161 pins the fake-decode family on the
  * driver surface. Under test:
  *
  *   - probe == the brute-force batch×corpus Hamming scan (the ≤3
  *     pigeonhole over the stored bands), across build AND appends;
  *   - replay no-op; a crash between the hashes and bands commits
  *     heals on retry (the bands delta derives from the committed
  *     hashes epoch);
  *   - append-only contract and diverged-compaction refusal, with
  *     rebuildBands as the folded-wedge recovery;
  *   - compaction preserves probes; over-cap buckets degrade to the
  *     representative instead of exploding.
  */
class PHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("phidx").resolve("ph").toString

  private def fp(rows: Seq[(Long, Long)]): DataFrame =
    rows.map { case (id, h) => (id, (h >>> 32) & 0xFFFFFFFFL, h & 0xFFFFFFFFL) }
      .toDF("doc_id", "hi", "lo")

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def bruteForce(probe: Seq[(Long, Long)],
                         stored: Seq[(Long, Long)]): Set[(Long, Long, Int)] =
    (for {
      (pid, ph) <- probe
      (sid, sh) <- stored
      d = hamming(ph, sh) if d <= 3
    } yield (pid, sid, d)).toSet

  private def probeSet(path: String,
                       probe: Seq[(Long, Long)]): Set[(Long, Long, Int)] =
    PHashIndex.matches(spark, path, fp(probe))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  // deterministic 64-bit values with a few engineered near-collisions
  private def h(seed: Long): Long = {
    var x = seed * 0x9E3779B97F4A7C15L
    x ^= x >>> 31; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 27
    x
  }
  private val corpus0 = (1L to 20L).map(i => i -> h(i))
  private val batch1 = Seq(
    100L -> h(5),                 // exact hash dup of doc 5
    101L -> (h(7) ^ 0x8001L),     // Hamming 2 from doc 7
    102L -> h(999))               // unrelated
  private val probe = Seq(
    200L -> h(3),                 // exact of resident 3
    201L -> (h(100) ^ 1L),        // Hamming 1 of appended... h(100)? not stored
    202L -> (h(12) ^ 0x110L),     // Hamming 2 from doc 12
    203L -> h(12345))             // unrelated

  test("probe == brute force across build + append; replay and crash heal") {
    val path = tmp()
    PHashIndex.build(fp(corpus0), path)
    PHashIndex.appendEpoch(fp(batch1), path, 3L)
    val stored = corpus0 ++ batch1
    assert(probeSet(path, probe) === bruteForce(probe, stored))
    // replay: storage-level no-op
    PHashIndex.appendEpoch(fp(batch1), path, 3L)
    assert(probeSet(path, probe) === bruteForce(probe, stored))
    // crash window: commit ONLY the hashes half of the next epoch
    val batch2 = Seq(300L -> h(3), 301L -> h(777))
    EpochStore.commitEpoch(s"$path/hashes", 4L) { tmpDir =>
      fp(batch2).write.mode("overwrite").parquet(tmpDir)
    }
    assert(!EpochStore.committed(s"$path/bands", 4L))
    PHashIndex.appendEpoch(fp(batch2), path, 4L) // heals from storage
    assert(EpochStore.committed(s"$path/bands", 4L))
    assert(probeSet(path, probe) === bruteForce(probe, stored ++ batch2))
    spark.catalog.clearCache()
  }

  test("append-only guard, diverged-compaction refusal, rebuildBands recovery") {
    val path = tmp()
    PHashIndex.build(fp(corpus0), path)
    val e = intercept[IllegalArgumentException] {
      PHashIndex.append(fp(Seq(5L -> h(5), 400L -> h(400))), path)
    }
    assert(e.getMessage.contains("NEW ids"))
    // half-committed append: hashes ahead of bands
    EpochStore.commitEpoch(s"$path/hashes", 9L) { tmpDir =>
      fp(Seq(500L -> h(500))).write.mode("overwrite").parquet(tmpDir)
    }
    val e2 = intercept[IllegalStateException] {
      PHashIndex.compact(spark, path)
    }
    assert(e2.getMessage.contains("diverged"))
    // the named recovery restores the bands from the hash relation
    PHashIndex.rebuildBands(spark, path)
    assert(probeSet(path, probe) ===
      bruteForce(probe, corpus0 :+ (500L -> h(500))))
    // ... and CLOSES the dangling epoch's ledger: the appender's
    // retry of epoch 9 is a storage no-op (a second bands commit
    // would duplicate its postings, inflating bucket sizes past the
    // probe cap), the id sets converge, and the fold is unblocked
    PHashIndex.appendEpoch(fp(Seq(500L -> h(500))), path, 9L)
    assert(probeSet(path, probe) ===
      bruteForce(probe, corpus0 :+ (500L -> h(500))))
    assert(EpochStore.committedIds(s"$path/hashes") ===
      EpochStore.committedIds(s"$path/bands"))
    PHashIndex.compact(spark, path)
    assert(probeSet(path, probe) ===
      bruteForce(probe, corpus0 :+ (500L -> h(500))))
    spark.catalog.clearCache()
  }

  test("compaction preserves probes; over-cap buckets keep the representative") {
    val path = tmp()
    PHashIndex.build(fp(corpus0), path)
    PHashIndex.append(fp(batch1), path)
    val before = probeSet(path, probe)
    // force divergence-free fold
    PHashIndex.compact(spark, path)
    assert(probeSet(path, probe) === before)
    assert(EpochStore.epochCount(s"$path/hashes") === 1)
    // a mass of identical hashes over the cap: the probe still finds
    // the REPRESENTATIVE (min id), not nothing — and not all clones
    val clones = (1000L to 1100L).map(i => i -> h(42L))
    PHashIndex.append(fp(clones), path)
    val got = PHashIndex.matches(spark, path, fp(Seq(9000L -> h(42L))),
        maxBucket = 16)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(got.contains((1000L, 0)), "representative must match")
    assert(got.size < clones.size, "over-cap bucket must not explode")
    val rep = PHashIndex.maintain(spark, path)
    assert(!rep.diverged && rep.nAssets === (corpus0 ++ batch1 ++ clones).size)
    assert(rep.maxBucket >= 101)
    spark.catalog.clearCache()
  }

  test("over-cap cue → measured re-band restores probe recall; a true " +
      "mega-cluster is rotation-invariant and stays collapsed") {
    val path = tmp()
    val cap = 8L
    val rnd = new scala.util.Random(7)
    // degenerate corpus: band 0 (the top 16 bits) welded to zero for
    // every doc, the other 48 bits random — ONE coincidental
    // mega-bucket of otherwise-distant fingerprints
    val corpus = (0L until 64L).map(i =>
      i -> (rnd.nextLong() & 0x0000FFFFFFFFFFFFL))
    // probes: each differs from its corpus partner by exactly one bit
    // in EACH non-welded band, so under the build layout the only
    // agreeing band is the over-cap one — the recall-loss shape
    val probes = corpus.take(16).map { case (i, hsh) =>
      (i + 1000L) -> (hsh ^ (1L << 32) ^ (1L << 16) ^ 1L)
    }
    PHashIndex.build(fp(corpus), path)
    val expected = bruteForce(probes, corpus)
    assert(expected.size === 16)

    def capped(): Set[(Long, Long, Int)] =
      PHashIndex.matches(spark, path, fp(probes), maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // before: the welded bucket collapsed to its representative —
    // measured recall loss
    val before = capped()
    assert(before.size < expected.size,
      s"the over-cap collapse must lose matches, got ${before.size}")
    // the cue [[Maintenance.tick]] alerts on
    val m0 = PHashIndex.maintain(spark, path)
    assert(m0.maxBucket === 64L && m0.maxBucket > cap)

    // the measured action: rotation 8 moves the welded region off a
    // band boundary, spreading the bucket under the cap
    val r = PHashIndex.rebandIfOverCap(spark, path, maxBucket = cap,
      candidates = Seq(0, 8))
    assert(r.rebanded && r.rotationBefore === 0 && r.rotationAfter === 8)
    assert(r.maxBucketBefore === 64L)
    assert(r.maxBucketByRotation(8) <= cap,
      s"rotation 8 must spread the welded bucket: ${r.maxBucketByRotation}")
    assert(PHashIndex.maintain(spark, path).maxBucket <= cap)
    // recall RESTORED, at the same probe cap
    assert(capped() === expected)
    // appends keep the new layout: the pair arrives for a fresh doc
    PHashIndex.append(fp(Seq(
      5000L -> (corpus(20)._2 ^ (1L << 32) ^ (1L << 16) ^ 1L))), path)
    assert(PHashIndex.matches(spark, path,
        fp(Seq(9000L -> corpus(20)._2)), maxBucket = cap)
      .collect().exists(row => row.getLong(1) === 5000L))
    // idempotent: a healthy store is left alone
    assert(!PHashIndex.rebandIfOverCap(spark, path, maxBucket = cap,
      candidates = Seq(0, 8)).rebanded)

    // a TRUE mega-cluster (identical fingerprints) is invariant under
    // every rotation: the measurement says so and nothing is rewritten
    val p2 = tmp()
    PHashIndex.build(
      fp((0L until 64L).map(i => i -> 0x1234567890ABCDEFL)), p2)
    val r2 = PHashIndex.rebandIfOverCap(spark, p2, maxBucket = cap,
      candidates = Seq(0, 8))
    assert(!r2.rebanded && r2.maxBucketBefore === 64L &&
      r2.maxBucketByRotation.values.forall(_ === 64L))
    spark.catalog.clearCache()
  }

  test("a probe plan pinned before a re-band flip stays consistent: " +
      "its snapshot's layout and postings evaluate together") {
    val path = tmp()
    PHashIndex.build(fp(corpus0), path)
    // the read pins its store version at PLAN time — the rotation it
    // read and the postings/hashes it will scan come from the same
    // pinned dirs, so the flip below cannot hand it rot-8 bands
    // against rot-0 postings (or vice versa)
    val preFlip = PHashIndex.matches(spark, path, fp(probe))
    val expected = bruteForce(probe, corpus0)
    PHashIndex.rebuildBands(spark, path, 8)
    assert(PHashIndex.storedRotation(path) === 8)
    // the pre-flip plan still answers exactly (the stageVersion
    // displaced-version retention keeps its pinned dirs alive)
    assert(preFlip.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      === expected)
    // and a fresh read under the new layout answers exactly too
    assert(probeSet(path, probe) === expected)
    spark.catalog.clearCache()
  }
}
