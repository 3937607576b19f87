package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.EpochStore
import graft.queries.KmvStore

/** The persisted KMV sketch store's contract: incremental build +
  * append EQUALS the from-scratch sketch of the union corpus
  * bit-for-bit (exact mergeability — the property q173's shared
  * oracle rides on), replays are no-ops, and compaction preserves
  * the served sketches while shrinking the stored rows.
  */
class KmvStoreSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/store"

  /** Canonical (source, θ, retained) rows for equality checks. */
  private def canon(sk: DataFrame): Map[String, (Long, Seq[Long])] =
    sk.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getSeq[Long](2).toSeq)).toMap

  test("build + append == from-scratch over the union corpus, at the " +
      "production K and at a small K deep in estimation mode") {
    // small K forces the θ-witness case: the union's (K+1)-th
    // smallest is routinely one side's own witness value, so this
    // fails loudly if epochs stored only the θ-trimmed retained set
    for (k <- Seq(graft.queries.CorpusStatsOps.KmvKNovelty, 64)) {
      val inc = tmp(s"kmv-inc-$k")
      KmvStore.build(docs.filter(col("doc_id") % 5 =!= 4), inc, k = k)
      KmvStore.appendEpoch(docs.filter(col("doc_id") % 5 === 4), inc, 1L)
      val full = tmp(s"kmv-full-$k")
      KmvStore.build(docs, full, k = k)
      val got = canon(KmvStore.sketches(spark, inc))
      val want = canon(KmvStore.sketches(spark, full))
      assert(got === want, s"k=$k: incremental != from-scratch")
      assert(got.nonEmpty)
      assert(KmvStore.storedK(spark, inc) === k)
      if (k == 64) // the small K must actually be estimating
        assert(got.values.forall(_._1 < 2147483647L))
    }
  }

  test("replayed append is a storage-level no-op, even with different " +
      "batch content") {
    val p = tmp("kmv-replay")
    KmvStore.build(docs.filter(col("doc_id") % 5 =!= 4), p)
    KmvStore.appendEpoch(docs.filter(col("doc_id") % 5 === 4), p, 1L)
    val before = canon(KmvStore.sketches(spark, p))
    KmvStore.appendEpoch(docs.filter(col("doc_id") % 5 === 4), p, 1L)
    // a crash-redelivered epoch id must not re-fold even if the
    // caller's batch drifted — epoch membership is the exactly-once
    // unit (the EpochStore ledger contract)
    KmvStore.appendEpoch(docs.limit(3), p, 1L)
    assert(canon(KmvStore.sketches(spark, p)) === before)
    assert(EpochStore.committedIds(s"$p/sketches") === Set(1L))
  }

  test("compact folds to one base, carries the K sidecar, preserves " +
      "served sketches exactly, and shrinks stored rows") {
    val p = tmp("kmv-compact")
    KmvStore.build(docs.filter(col("doc_id") % 3 === 0), p, k = 64)
    KmvStore.appendEpoch(docs.filter(col("doc_id") % 3 === 1), p, 1L)
    KmvStore.appendEpoch(docs.filter(col("doc_id") % 3 === 2), p, 2L)
    val before = canon(KmvStore.sketches(spark, p))
    val rowsBefore = EpochStore.read(spark, s"$p/sketches").count()
    KmvStore.compact(spark, p)
    assert(EpochStore.epochCount(s"$p/sketches") === 1)
    assert(KmvStore.storedK(spark, p) === 64)
    assert(canon(KmvStore.sketches(spark, p)) === before)
    val rowsAfter = EpochStore.read(spark, s"$p/sketches").count()
    assert(rowsAfter < rowsBefore,
      s"fold must merge-trim the epoch union: $rowsBefore -> $rowsAfter")
    // post-compaction replay of a folded id stays a no-op
    KmvStore.appendEpoch(docs.limit(5), p, 2L)
    assert(canon(KmvStore.sketches(spark, p)) === before)
    spark.catalog.clearCache()
  }

  test("a non-store path fails loudly with the rebuild message") {
    val p = tmp("kmv-bad")
    // an EpochStore table WITHOUT the _kmvk sidecar = not a KmvStore
    EpochStore.create(s"$p/sketches") { base =>
      docs.limit(1).select(col("source"), col("doc_id").as("h"))
        .write.mode("overwrite").parquet(base)
    }
    val e = intercept[IllegalStateException] {
      KmvStore.storedK(spark, p)
    }
    assert(e.getMessage.contains("KmvStore.build"))
  }
}
