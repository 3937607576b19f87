package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.queries.{MinHashIndex, NearDupOps, TextOps}

/** The persisted MinHash/LSH index (build / append / appendStream /
  * matches) and q114's shingle-inverted-index incremental near-dup:
  * precision is exact by construction (every emitted pair is
  * exact-verified), so the spec pins recall vs a brute-force scan,
  * build/append interleaving parity, streaming parity, the
  * hot-bucket representative cap, and q114's DF-cap engagement.
  * All hashes are fixed-seed — deterministic assertions throughout.
  */
class MinHashIndexSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def corpus = docs.filter(col("doc_id") % 5 =!= 0)
  private def batch = docs.filter(col("doc_id") % 5 === 0)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("ix").toString

  /** Exact batch-vs-corpus pair set at `thresh` via brute force —
    * the ground truth `matches` is measured against.
    */
  private def exactPairs(thresh: Double): Set[(Long, Long)] = {
    val sh = docs.select(col("doc_id"), Text.shingleHashes(col("text"), 3).as("sh"))
    sh.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("a"), col("sh").as("sh_a"))
      .crossJoin(sh.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id").as("b"), col("sh").as("sh_b")))
      .select(col("a"), col("b"), Text.jaccardLong(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= thresh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def matchPairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("build + matches: output ⊆ exact pairs, recall ≥ 0.9 (sf0.01 split)") {
    val ix = tmp("mhix")
    MinHashIndex.build(corpus, ix)
    val got = matchPairs(MinHashIndex.matches(spark, ix, batch))
    val truth = exactPairs(0.5)
    assert(truth.nonEmpty, "fixture must contain cross-split near-dups")
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
    val recall = got.size.toDouble / truth.size
    info(f"index matches ${got.size}/${truth.size} exact pairs (recall $recall%.2f)")
    assert(recall >= 0.9, f"recall $recall%.2f < 0.9")
  }

  test("append commutes with build: incremental index rows and matches are identical") {
    val oneShot = tmp("mhix-one")
    val incr = tmp("mhix-incr")
    MinHashIndex.build(corpus, oneShot)
    val (h1, h2) = (corpus.filter(col("doc_id") % 2 === 1),
      corpus.filter(col("doc_id") % 2 === 0))
    MinHashIndex.build(h1, incr)
    MinHashIndex.append(h2, incr)
    def docRows(p: String) = graft.engine.EpochStore.read(spark, s"$p/docs")
      .select(col("doc_id"), col("sig").cast("string"), col("sh").cast("string"))
      .collect().map(_.toSeq).toSet
    def bandRows(p: String) = graft.engine.EpochStore.read(spark, s"$p/bands")
      .select(col("band"), col("h"), col("doc_id"))
      .collect().map(_.toSeq).toSet
    assert(docRows(incr) === docRows(oneShot))
    assert(bandRows(incr) === bandRows(oneShot))
    assert(matchPairs(MinHashIndex.matches(spark, incr, batch)) ===
      matchPairs(MinHashIndex.matches(spark, oneShot, batch)))
  }

  test("appendStream == batch append: streamed index rows are byte-identical") {
    import spark.implicits._
    val streamed = tmp("mhix-str")
    val batched = tmp("mhix-bat")
    val half = corpus.filter(col("doc_id") < 250)
    val rest = corpus.filter(col("doc_id") >= 250)
    MinHashIndex.build(half, streamed)
    MinHashIndex.build(half, batched)
    MinHashIndex.append(rest, batched)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = rest.as[(Long, String)].collect()
    val stream = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("mhix-ckpt").toString
    val q = MinHashIndex.appendStream(
      stream.toDF().toDF("doc_id", "text"), streamed, ckpt)
    try {
      // two micro-batches: parity must hold across epoch boundaries
      val (a, b) = rows.splitAt(rows.length / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
    } finally q.stop()
    def docRows(p: String) = graft.engine.EpochStore.read(spark, s"$p/docs")
      .select(col("doc_id"), col("sig").cast("string"), col("sh").cast("string"))
      .collect().map(_.toSeq).toSet
    assert(docRows(streamed) === docRows(batched))
    assert(matchPairs(MinHashIndex.matches(spark, streamed, batch)) ===
      matchPairs(MinHashIndex.matches(spark, batched, batch)))
  }

  test("maintain(): healthy tick is a pure-read no-op; fragmented folds " +
      "both tables; a half-committed append is reported, not buried") {
    import graft.engine.EpochStore
    val ix = tmp("mh-maint")
    MinHashIndex.build(corpus.filter(col("doc_id") < 300)
      .select(col("doc_id"), col("text")), ix)
    MinHashIndex.append(corpus.filter(
      col("doc_id") >= 300 && col("doc_id") < 350)
      .select(col("doc_id"), col("text")), ix)

    // healthy + under the epoch bound: nothing folds, report carries
    // the census + bucketStats health observables
    val r0 = MinHashIndex.maintain(spark, ix)
    assert(!r0.compacted && !r0.diverged)
    assert(r0.docsEpochs === 2 && r0.bandsEpochs === 2)
    assert(r0.nDocs === EpochStore.read(spark, s"$ix/docs").count())
    val statsMax = MinHashIndex.bucketStats(spark, ix)
      .agg(max(col("max_bucket")), max(col("capped_post_frac"))).head()
    assert(r0.maxBucket === statsMax.getLong(0))
    assert(r0.cappedPostFrac === statsMax.getDouble(1))

    // past the bound: the tick folds BOTH tables to one base each
    val r1 = MinHashIndex.maintain(spark, ix, maxEpochs = 1)
    assert(r1.compacted && r1.docsEpochs === 1 && r1.bandsEpochs === 1)
    assert(r1.nDocs === r0.nDocs && r1.maxBucket === r0.maxBucket)

    // half-committed append: the tick REPORTS divergence and folds
    // nothing (the heal belongs to the appender's retry)
    EpochStore.commitEpoch(s"$ix/docs", 1000000009L) { tmpDir =>
      MinHashIndex.signatures(corpus.filter(
          col("doc_id") >= 350 && col("doc_id") < 360)
        .select(col("doc_id"), col("text")))
        .write.mode("overwrite").parquet(tmpDir)
    }
    val r2 = MinHashIndex.maintain(spark, ix, maxEpochs = 0)
    assert(r2.diverged && !r2.compacted)
    assert(r2.docsEpochs === 2 && r2.bandsEpochs === 1)
    spark.catalog.clearCache()
  }

  test("bucketStats: totals reconcile with the band store; a hot " +
      "cluster shows up as capped postings") {
    import spark.implicits._
    val copy = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val uniq = (1L to 30L).map(i =>
      (100L + i, s"unrelated document number $i with its own words ${i * 7} ${i * 13}"))
    val cluster = (1L to 30L).map(i => (i, copy))
    val ix = tmp("mhix-health")
    MinHashIndex.build((cluster ++ uniq).toDF("doc_id", "text"), ix)
    val stats = MinHashIndex.bucketStats(spark, ix, maxBucket = 10L)
      .collect()
    // one row per band; postings reconcile: Σ over buckets of m ==
    // stored band rows (checked per band via the capped fraction's
    // denominator being exact)
    val bandRows = graft.engine.EpochStore.read(spark, s"$ix/bands")
      .groupBy(col("band")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stats.length === bandRows.size)
    stats.foreach { r =>
      val band = r.getInt(0)
      assert(r.getLong(1) >= 1L) // n_buckets
      assert(r.getLong(2) >= 30L, // the 30-copy cluster is one bucket
        s"band $band max_bucket ${r.getLong(2)}")
      assert(r.getLong(3) >= 1L) // that bucket is over the cap of 10
      // 30 of the ~60 postings per band sit in the capped bucket
      assert(r.getDouble(4) > 0.3 && r.getDouble(4) < 0.9)
    }
    // a cap no bucket reaches: zero capped postings everywhere
    val loose = MinHashIndex.bucketStats(spark, ix, maxBucket = 1000L)
      .collect()
    assert(loose.forall(r => r.getLong(3) == 0L && r.getDouble(4) == 0.0))
  }

  test("hot buckets collapse to their representative; under-cap buckets are untouched") {
    import spark.implicits._
    val copy = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val uniq = (1L to 30L).map(i =>
      (100L + i, s"unrelated document number $i with its own words ${i * 7} ${i * 13}"))
    val cluster = (1L to 30L).map(i => (i, copy))
    val ix = tmp("mhix-hot")
    MinHashIndex.build((cluster ++ uniq).toDF("doc_id", "text"), ix)
    val probe = Seq((1000L, copy)).toDF("doc_id", "text")
    // capped: the 30-member cluster bucket joins only its min-id
    // representative — the new copy still matches, exactly once
    val capped = matchPairs(MinHashIndex.matches(spark, ix, probe, maxBucket = 10L))
    assert(capped === Set((1000L, 1L)))
    // uncapped: all 30 members match
    val full = matchPairs(MinHashIndex.matches(spark, ix, probe, maxBucket = 10000L))
    assert(full === (1L to 30L).map((1000L, _)).toSet)
  }

  test("invertedMatches == incrementalNearDupOn: the index-served q114 path is row-identical to the from-scratch formulation") {
    val ix = tmp("mhix-inv")
    MinHashIndex.build(corpus, ix)
    def rows(df: DataFrame) = df
      .select(col("doc_id"), col("match_id"), col("n_common"),
        col("n_a"), col("n_b"), col("jaccard"))
      .collect().map(_.toSeq).toSeq
    val served = rows(MinHashIndex.invertedMatches(spark, ix, batch))
    val scratch = rows(NearDupOps.incrementalNearDupOn(
      spark.read.parquet(s"$dir/documents.parquet")))
    assert(served.nonEmpty, "fixture must produce incremental matches")
    assert(served === scratch)
  }

  test("invertedMatches honors the DF cap from the stored postings") {
    import spark.implicits._
    val boiler = "all rights reserved contact us terms of service privacy policy applies"
    val corpusDocs = (1L to 8L).map(i =>
      (i, s"$boiler body text variant $i with words ${i * 3} ${i * 11} ${i * 17}"))
    val boilerOnly = (10L, s"$boiler completely fresh subject matter nine eight seven")
    val nearDup = (15L, s"$boiler body text variant 7 with words 21 77 120")
    val ix = tmp("mhix-invcap")
    MinHashIndex.build(corpusDocs.toDF("doc_id", "text"), ix)
    val probe = Seq(boilerOnly, nearDup).toDF("doc_id", "text")
    val capped = MinHashIndex.invertedMatches(spark, ix, probe,
        tau = 0.15, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(_._1 == 10L),
      s"boilerplate-only doc must not match under the cap: $capped")
    assert(capped.exists(p => p._1 == 15L && p._2 == 7L),
      s"genuine near-dup must survive the cap: $capped")
    val uncapped = MinHashIndex.invertedMatches(spark, ix, probe,
        tau = 0.15, maxDf = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.exists(_._1 == 10L),
      s"without the cap the boilerplate overlap should match: $uncapped")
  }

  test("q114 DF cap: boilerplate-only overlap is dropped, genuine near-dups survive") {
    import spark.implicits._
    val boiler = "all rights reserved contact us terms of service privacy policy applies"
    // corpus docs 1..8 (none ≡ 0 mod 5): every one carries the
    // boilerplate → its shingles have DF 8 > cap 3
    val corpusDocs = (1L to 8L).map(i =>
      (i, s"$boiler body text variant $i with words ${i * 3} ${i * 11} ${i * 17}"))
    // batch doc 10: boilerplate plus unique words — overlaps corpus
    // ONLY through boilerplate shingles
    val boilerOnly = (10L, s"$boiler completely fresh subject matter nine eight seven")
    // batch doc 15 ≈ corpus doc 7's body with one word changed —
    // genuine near-dup through low-DF shingles
    val nearDup = (15L, s"$boiler body text variant 7 with words 21 77 120")
    val docs = (corpusDocs :+ boilerOnly :+ nearDup).toDF("doc_id", "text")
    val capped = NearDupOps.incrementalNearDupOn(docs, tau = 0.15, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 10 matches nothing (its only shared shingles are over-cap);
    // doc 15 still finds doc 7 (their shared body shingles have DF 1)
    assert(!capped.exists(_._1 == 10L),
      s"boilerplate-only doc must not match under the cap: $capped")
    assert(capped.exists(p => p._1 == 15L && p._2 == 7L),
      s"genuine near-dup must survive the cap: $capped")
    // uncapped: the boilerplate overlap is enough to clear τ
    val uncapped = NearDupOps.incrementalNearDupOn(docs, tau = 0.15, maxDf = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.exists(_._1 == 10L),
      s"without the cap the boilerplate overlap should match: $uncapped")
  }
}
