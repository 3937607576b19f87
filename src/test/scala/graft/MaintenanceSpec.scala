package graft

import org.apache.spark.sql.functions._

import graft.engine.{EpochStore, Maintenance}
import graft.queries.{ChunkIndex, ContainmentStore, IvfIndex, MinHashIndex, Similarity, VerdictStore}

/** The composed cross-store maintenance tick ([[Maintenance.tick]]):
  * one cron body over the nine persisted stores. Under test:
  *
  *   - healthy stores: every sub-tick is a pure-read no-op, the
  *     serving push-down equals the base re-rank width, no alerts;
  *   - a subset deployment maintains only the stores it names;
  *   - the degraded fixtures each raise exactly their own alert
  *     (data-skewed IVF that a rebuild cannot fix; half-committed
  *     MinHash append; boilerplate-heavy chunk store), and the IVF
  *     skew that raised the alert is the SAME measurement that
  *     widens the pushed SQ re-rank width.
  */
class MaintenanceSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))
  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("ix").toString

  test("healthy nine-store tick: no-op everywhere, base width, " +
      "no alerts; subset deployments tick only their stores") {
    val (ivf, mh, ch, vs, ct) =
      (tmp("mnt-ivf"), tmp("mnt-mh"), tmp("mnt-ch"), tmp("mnt-vs"),
        tmp("mnt-ct"))
    val (mf, cb, ph) = (tmp("mnt-mf"), tmp("mnt-cb"), tmp("mnt-ph"))
    IvfIndex.build(emb.filter(col("vec_id") < 250), ivf)
    MinHashIndex.build(docs.filter(col("doc_id") < 300), mh)
    ChunkIndex.build(docs.filter(col("doc_id") < 300), ch)
    val fullDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    VerdictStore.build(fullDocs.filter(col("doc_id") < 300), vs)
    ContainmentStore.build(docs.filter(col("doc_id") < 300), ct)
    graft.queries.ManifestStore.build(
      fullDocs.filter(col("doc_id") < 300),
      emb.filter(col("vec_id") < 300), mf)
    graft.queries.CalibrationStore.build(
      fullDocs.filter(col("doc_id") < 300), cb)
    graft.queries.PHashIndex.build(
      graft.queries.MultimodalOps.phashFingerprints(
        docs.filter(col("doc_id") < 300)), ph)
    val kv = tmp("mnt-kmv")
    graft.queries.KmvStore.build(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 300), kv, k = 64)

    val r = Maintenance.tick(spark,
      Maintenance.Stores(Some(ivf), Some(mh), Some(ch), Some(vs), Some(ct),
        Some(mf), Some(cb), Some(ph), Some(kv)))
    assert(r.manifest.exists(m =>
      !m.compacted && !m.diverged && m.supersededFrac === 0.0))
    assert(r.calibration.exists(c =>
      !c.compacted && !c.diverged && c.nDocs === 300))
    assert(r.ivf.exists(i => !i.rebuilt && !i.compacted))
    assert(r.minhash.exists(m => !m.compacted && !m.diverged))
    assert(r.chunks.exists(c => !c.compacted))
    assert(r.verdicts.exists(v =>
      !v.compacted && !v.diverged && v.nDocs === 300))
    assert(r.containment.exists(c =>
      !c.compacted && !c.diverged && c.nDocs === 300 &&
        c.supersededFrac === 0.0))
    assert(r.phash.exists(p =>
      !p.compacted && !p.diverged && p.nAssets === 300))
    assert(r.kmv.exists(k => !k.compacted && k.epochs === 1 &&
      k.nSources > 0))
    // the pushed width is the health-driven knob for the measured
    // skew (a healthy store's natural skew of ~2 still widens the
    // base — only a no-IVF deployment falls back to the base)
    assert(r.sqRerankWidth ===
      IvfIndex.sqRerankWidthFor(r.ivf.get.maxSkew))
    assert(r.ivf.exists(_.maxSkew <= 4.0))
    // the ADC knob rides the same tick: healthy code spread (the
    // fixture's crowding sits under the ceiling) keeps the base
    val frac = r.ivf.get.maxCodeFrac
    assert(!frac.isNaN && frac * Similarity.PqCentroids <=
      IvfIndex.HealthyCodeCrowd, s"healthy crowding: $frac")
    assert(r.pqRerankWidth === Similarity.PqRerankWidth)
    assert(r.alerts.isEmpty, s"healthy tick alerted: ${r.alerts}")

    // a deployment without an IVF store still ticks, and both width
    // push-downs fall back to the serving base
    val sub = Maintenance.tick(spark,
      Maintenance.Stores(minhash = Some(mh)))
    assert(sub.ivf.isEmpty && sub.chunks.isEmpty && sub.verdicts.isEmpty &&
      sub.phash.isEmpty && sub.minhash.isDefined)
    assert(sub.sqRerankWidth === Similarity.SqRerankWidth)
    assert(sub.pqRerankWidth === Similarity.PqRerankWidth)
    spark.catalog.clearCache()
  }

  test("degraded stores: each fixture raises its own alert, and the " +
      "alerting IVF skew is what widens the pushed re-rank width") {
    val (ivf, mh, ch) = (tmp("mnt-ivf2"), tmp("mnt-mh2"), tmp("mnt-ch2"))

    // IVF: a mass of identical vectors — k-means cannot split them,
    // so the skew survives the rebuild the tick runs (the documented
    // skew-is-the-data case)
    IvfIndex.build(emb.filter(col("vec_id") < 250), ivf)
    val clones = emb
      .select((col("vec_id") + 2000).as("vec_id"),
        transform(col("embedding"), _ => lit(1.0f)).as("embedding"))
    IvfIndex.appendEpoch(clones, IvfIndex.loadCodebook(spark, ivf), ivf, 1L)

    // MinHash: a half-committed append (docs epoch without its bands
    // half)
    MinHashIndex.build(docs.filter(col("doc_id") < 300), mh)
    EpochStore.commitEpoch(s"$mh/docs", 77L) { tmpDir =>
      MinHashIndex.signatures(docs.filter(
          col("doc_id") >= 300 && col("doc_id") < 320))
        .write.mode("overwrite").parquet(tmpDir)
    }

    // Chunk store: every doc stored twice — every chunk occurrence
    // duplicated
    val twice = docs.filter(col("doc_id") < 200)
    ChunkIndex.build(
      twice.unionAll(twice.select(col("doc_id") + 100000, col("text"))
        .toDF("doc_id", "text")), ch)

    // Verdict store: a half-committed append (sigs epoch without its
    // verdicts half)
    val vs = tmp("mnt-vs2")
    val vdocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    VerdictStore.build(vdocs.filter(col("doc_id") < 300), vs)
    EpochStore.commitEpoch(s"$vs/sigs", 1000000000L) { tmpDir =>
      graft.queries.NearDupOps.signatureOf(
          vdocs.filter(col("doc_id") >= 300))
        .write.mode("overwrite").parquet(tmpDir)
    }

    // Containment store: a half-committed append (dfs epoch without
    // the other three tables)
    val ct = tmp("mnt-ct2")
    ContainmentStore.build(docs.filter(col("doc_id") < 300), ct)
    EpochStore.commitEpoch(s"$ct/dfs", 1000000000L) { tmpDir =>
      spark.range(1).select(lit("zz zz zz").as("sh"),
        lit(1L).as("df"), lit(1L).as("seq"))
        .write.mode("overwrite").parquet(tmpDir)
    }

    // Manifest store: a half-committed append (quality epoch without
    // the other seven tables)
    val mf = tmp("mnt-mf2")
    graft.queries.ManifestStore.build(
      vdocs.filter(col("doc_id") < 300),
      emb.filter(col("vec_id") < 300), mf)
    EpochStore.commitEpoch(s"$mf/quality", 1000000000L) { tmpDir =>
      spark.range(1).select(lit(9999L).as("doc_id"), lit("keep").as("q_v"),
        lit(10).as("n_tokens"))
        .write.mode("overwrite").parquet(tmpDir)
    }

    // Calibration store: a half-committed append (scores epoch
    // without its hist half)
    val cb = tmp("mnt-cb2")
    graft.queries.CalibrationStore.build(
      vdocs.filter(col("doc_id") < 300), cb)
    EpochStore.commitEpoch(s"$cb/scores", 1000000000L) { tmpDir =>
      graft.queries.CalibrationStore.scoreRelation(
          vdocs.filter(col("doc_id") >= 300))
        .write.mode("overwrite").parquet(tmpDir)
    }

    // PHash store: a half-committed append (hashes epoch without its
    // derived bands half — the derived-heal divergence)
    val ph = tmp("mnt-ph2")
    val fps = graft.queries.MultimodalOps.phashFingerprints(docs)
    graft.queries.PHashIndex.build(fps.filter(col("doc_id") < 300), ph)
    EpochStore.commitEpoch(s"$ph/hashes", 1000000000L) { tmpDir =>
      fps.filter(col("doc_id") >= 300)
        .write.mode("overwrite").parquet(tmpDir)
    }

    val r = Maintenance.tick(spark,
      Maintenance.Stores(Some(ivf), Some(mh), Some(ch), Some(vs), Some(ct),
        Some(mf), Some(cb), Some(ph)))
    assert(r.alerts.contains("phash_diverged"))
    assert(r.phash.exists(p => p.diverged && !p.compacted))
    assert(r.alerts.contains("manifest_diverged"))
    assert(r.manifest.exists(m => m.diverged && !m.compacted))
    assert(r.alerts.contains("calibration_diverged"))
    assert(r.calibration.exists(c => c.diverged && !c.compacted))
    assert(r.alerts.contains("verdictstore_diverged"))
    assert(r.verdicts.exists(v => v.diverged && !v.compacted))
    assert(r.alerts.contains("containment_diverged"))
    assert(r.containment.exists(c => c.diverged && !c.compacted))

    assert(r.alerts.exists(_.startsWith("ivf_skew_persists:")),
      s"alerts: ${r.alerts}")
    assert(r.ivf.exists(_.rebuilt), "the tick must have tried a rebuild")
    assert(r.alerts.contains("minhash_diverged"))
    assert(r.minhash.exists(m => m.diverged && !m.compacted))
    assert(r.alerts.exists(_.startsWith("chunkstore_dup_heavy:")))
    assert(r.chunks.exists(_.dupOccurrenceFrac > 0.99))

    val skew = r.ivf.get.maxSkew
    assert(skew > 4.0)
    assert(r.sqRerankWidth ===
      IvfIndex.sqRerankWidthFor(skew) && r.sqRerankWidth >
      Similarity.SqRerankWidth)
    // the identical-vector mass codes into the same 8 codes, so the
    // dominant code's share ~= the clone fraction of the store and
    // the pushed ADC width widens past the base alongside the SQ one
    assert(r.ivf.get.maxCodeFrac > 0.5, s"crowd: ${r.ivf.get.maxCodeFrac}")
    assert(r.pqRerankWidth ===
      IvfIndex.pqRerankWidthFor(r.ivf.get.maxCodeFrac) &&
      r.pqRerankWidth > Similarity.PqRerankWidth)
    spark.catalog.clearCache()
  }

  test("onEpochCadence: the tick fires on the stream's own epoch " +
      "cadence, folds fragmentation as it goes, and the maintained " +
      "store stays value-identical to a batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mh = tmp("mnt-cadence")
    val corpus = docs.filter(col("doc_id") < 400)
    MinHashIndex.build(corpus.filter(col("doc_id") < 100), mh)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = corpus.filter(col("doc_id") >= 100)
      .as[(Long, String)].collect().sortBy(_._1)
    val stream = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("mnt-ckpt").toString
    var reports = Vector.empty[Maintenance.Report]
    // everyN=2 over 4 micro-batches → ticks after epochs 1 and 3;
    // maxEpochs=1 makes every tick's compaction observable (any
    // fragmentation past the base folds)
    val body = Maintenance.onEpochCadence(spark,
      Maintenance.Stores(minhash = Some(mh)), everyN = 2,
      onReport = r => reports :+= r, maxEpochs = 1) {
      (batch, batchId) => MinHashIndex.appendEpoch(batch, mh, batchId)
    }
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(body)
      .start()
    try {
      rows.grouped(math.max(1, rows.length / 4)).take(4).foreach { g =>
        stream.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()

    assert(reports.length === 2,
      s"everyN=2 over 4 epochs must tick twice, got ${reports.length}")
    assert(reports.forall(r => r.ivf.isEmpty && r.chunks.isEmpty),
      "a minhash-only deployment must not touch other stores")
    assert(reports.last.minhash.exists(_.compacted),
      "the final tick saw epoch 3 over maxEpochs=1 and must fold")
    assert(reports.last.alerts.forall(!_.startsWith("minhash_diverged")),
      "in-cadence ticks run between appends: never a half-commit")
    // epochs past the base are folded down to at most the one epoch
    // appended since the last tick
    assert(EpochStore.epochCount(s"$mh/docs") <= 2)

    // the maintained store answers exactly like an unmaintained
    // batch build over the same corpus
    val batchIx = tmp("mnt-cadence-batch")
    MinHashIndex.build(corpus, batchIx)
    val probe = corpus.limit(50)
    def pairs(p: String) = MinHashIndex.matches(spark, p, probe)
      .select(col("doc_id"), col("match_id")).collect()
      .map(_.toSeq).toSet
    assert(pairs(mh) === pairs(batchIx))
    spark.catalog.clearCache()
  }
}
