package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.EpochStore
import graft.queries.{ManifestStore, NearDupOps, QualityOps}

/** The persisted manifest store (build / delta append / LWW read /
  * compact) behind q160 — STORAGE semantics on a crafted corpus (path
  * equivalence of the delta engine itself is ManifestSpec's job):
  *
  *   - build + append == the full-recompute manifest over the union,
  *     with resident rows flipped by the batch (ngram + semantic
  *     contamination onset);
  *   - the contam epoch carries ONLY touched-resident + batch-train
  *     rows — the delta write-volume contract;
  *   - replay no-op; a crash between table commits heals on retry
  *     (no commit order is load-bearing);
  *   - append-only id contract enforced loudly;
  *   - compaction folds to resolved rows with the served manifest
  *     unchanged; a diverged (half-committed) store refuses to fold.
  */
class ManifestStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("mstore").resolve("ms").toString

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  private def embDf(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def genDoc(prefix: String, n: Int, withStop: Boolean = true): String = {
    val toks = (0 until n).map(i => s"$prefix$i").toBuffer
    if (withStop) toks.insert(2, "the")
    toks.mkString(" ")
  }

  private val ngram8 = (1 to 8).map(i => s"p8s$i")
  private val residentRows: Seq[(Long, String)] = Seq(
    0L -> genDoc("z", 20, withStop = false), // resident bench doc
    3L -> (genDoc("m", 26) + " " + ngram8.mkString(" ")), // ngram target
    5L -> "tiny doc here", // quality drop
    7L -> genDoc("e", 19), // semantic target (vec below)
    9L -> genDoc("h", 19))
  private val batchRows: Seq[(Long, String)] = Seq(
    100L -> (genDoc("r", 16, withStop = false) + " " + ngram8.mkString(" ")),
    101L -> genDoc("t", 19), // clean keeper
    103L -> "x1 x2 x3") // too_short
  private val resEmbRows = Seq(0L -> Seq(0f, 0f, 0f, 1f),
    7L -> Seq(1f, 0f, 0f, 0f),
    // resident embedded doc whose max_eval_cos the new eval vector
    // does NOT improve (orthogonal to both evals) — must stay OUT of
    // the contam delta epoch (the no-op-touch write-volume pin)
    9L -> Seq(0f, 1f, 0f, 0f))
  private val batchEmbRows = Seq(150L -> Seq(1f, 0f, 0f, 0f)) // new eval

  private def resident = docsDf(residentRows)
  private def batch = docsDf(batchRows)
  private def union = docsDf(residentRows ++ batchRows)
  private def resEmb = embDf(resEmbRows)
  private def batchEmb = embDf(batchEmbRows)
  private def unionEmb = embDf(resEmbRows ++ batchEmbRows)

  private def dv(docs: DataFrame) =
    NearDupOps.dedupVerdictsOn(docs)
      .select(col("doc_id"), col("verdict").as("d_v"))
  private def ctv(docs: DataFrame) =
    NearDupOps.containmentVerdictsOn(NearDupOps.containmentOn(docs))
      .filter(col("is_kept") === 0)
      .select(col("doc_id"), lit(1).as("ct"))

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])

  private def served(path: String): Seq[Seq[Any]] =
    canon(ManifestStore.manifest(spark, path, dv(union), ctv(union)))

  private def fullRecompute: Seq[Seq[Any]] =
    canon(QualityOps.manifestFrom(
      QualityOps.manifestStateOn(union, unionEmb), dv(union), ctv(union)))

  test("build + append == full recompute; flips land; contam epoch " +
      "carries only touched + batch rows") {
    val path = tmp()
    ManifestStore.build(resident, resEmb, path)
    ManifestStore.appendEpoch(batch, batchEmb, path, 5L)
    val got = served(path)
    assert(got === fullRecompute)
    def rowOf(id: Long) = got.find(_.head == id).get
    assert(rowOf(3L)(1) === "drop_contaminated" && rowOf(3L)(2) === "ngram")
    assert(rowOf(7L)(1) === "drop_contaminated" && rowOf(7L)(2) === "semantic")
    assert(rowOf(5L)(2) === "too_short")
    assert(rowOf(101L)(1) === "keep")
    // delta write volume: epoch 5 of contam/ = CHANGED residents
    // {3 (ngram hit), 7 (semantic max rises 0 -> 1)} + batch train
    // {101, 103}. Doc 9 has an embedding too, but the new eval
    // vector doesn't raise its stored max (0 -> 0), so the dSem
    // probe row must NOT count as touched — otherwise every append
    // carrying any eval vector would rewrite the whole resident
    // embedded set (pure LWW churn)
    val epochRows = EpochStore.read(spark, s"$path/contam")
      .filter(col("epoch") === "5")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(epochRows === Set(3L, 7L, 101L, 103L))
    assert(!epochRows.contains(9L))
    spark.catalog.clearCache()
  }

  test("replay no-op; a crash between table commits heals on retry") {
    val path = tmp()
    ManifestStore.build(resident, resEmb, path)
    // simulate the crash window: commit ONLY the quality epoch (the
    // identical delta a real first attempt would have staged)
    val preState = ManifestStore.stateView(spark, path, excludeIds = Set(5L))
    val d = QualityOps.manifestDelta(preState, batch, batchEmb)
    EpochStore.commitEpoch(s"$path/quality", 5L) { tmpDir =>
      d.quality.write.mode("overwrite").parquet(tmpDir)
    }
    assert(EpochStore.committed(s"$path/quality", 5L))
    assert(!EpochStore.committed(s"$path/contam", 5L))
    // redelivery of the same (batch, id) completes the other tables
    ManifestStore.appendEpoch(batch, batchEmb, path, 5L)
    val healed = served(path)
    assert(healed === fullRecompute)
    // full replay after completion: byte-level no-op on the epoch set
    ManifestStore.appendEpoch(batch, batchEmb, path, 5L)
    assert(served(path) === healed)
    spark.catalog.clearCache()
  }

  test("append-only contract and diverged-compaction refusal") {
    val path = tmp()
    ManifestStore.build(resident, resEmb, path)
    val bad = docsDf(Seq(3L -> "whatever text", 200L -> genDoc("q", 18)))
    val e = intercept[IllegalArgumentException] {
      ManifestStore.append(bad, embDf(Nil), path)
    }
    assert(e.getMessage.contains("NEW ids"))
    // a half-committed append (one table ahead) must refuse to fold
    EpochStore.commitEpoch(s"$path/quality", 9L) { tmpDir =>
      Seq((300L, "keep", 5)).toDF("doc_id", "q_v", "n_tokens")
        .write.mode("overwrite").parquet(tmpDir)
    }
    val e2 = intercept[IllegalStateException] {
      ManifestStore.compact(spark, path)
    }
    assert(e2.getMessage.contains("diverged"))
    spark.catalog.clearCache()
  }

  test("compaction folds to resolved rows with the served manifest unchanged") {
    val path = tmp()
    ManifestStore.build(resident, resEmb, path)
    ManifestStore.append(batch, batchEmb, path)
    val before = served(path)
    ManifestStore.compact(spark, path)
    assert(served(path) === before)
    assert(EpochStore.epochCount(s"$path/contam") === 1)
    assert(EpochStore.epochCount(s"$path/quality") === 1)
    // post-compaction appends still work and stay exact
    val more = docsDf(Seq(400L -> genDoc("v", 19)))
    ManifestStore.append(more, embDf(Nil), path)
    val ext = docsDf(residentRows ++ batchRows :+ (400L -> genDoc("v", 19)))
    assert(canon(ManifestStore.manifest(spark, path, dv(ext), ctv(ext))) ===
      canon(QualityOps.manifestFrom(
        QualityOps.manifestStateOn(ext, unionEmb), dv(ext), ctv(ext))))
    spark.catalog.clearCache()
  }

  test("a pre-provenance layout serves a TRAIN-only forget: the heal " +
      "carries no plan-time eval_id reference, append/maintain/compact " +
      "keep working after the tombstone, and an out-of-contract " +
      "eval-bearing tombstone still refuses loudly") {
    val path = tmp()
    ManifestStore.build(resident, resEmb, path)
    // degrade both eval sides to the pre-round-14 shape (no eval_id)
    val ec = EpochStore.read(spark, s"$path/evalchunks")
      .select(col("chunk_str")).distinct().localCheckpoint(true)
    val ee = EpochStore.read(spark, s"$path/evalemb")
      .select(col("e_emb")).localCheckpoint(true)
    EpochStore.create(s"$path/evalchunks", rebuild = true) { d =>
      ec.write.mode("overwrite").parquet(d) }
    EpochStore.create(s"$path/evalemb", rebuild = true) { d =>
      ee.write.mode("overwrite").parquet(d) }
    // TRAIN-only forget (9 ≢ 0 mod 50): requireEvalProvenance's error
    // message promises train forgets "remain servable" — the promise
    // must hold through the heal, which forget itself AND every later
    // appendEpoch/maintain/compact re-run
    ManifestStore.forget(spark, path, Seq(9L).toDF("doc_id"))
    ManifestStore.appendEpoch(batch, batchEmb, path, 5L)
    val rep = ManifestStore.maintain(spark, path)
    assert(!rep.diverged)
    ManifestStore.compact(spark, path)
    // never-ingested equality on the served manifest
    val unionMinus = docsDf((residentRows ++ batchRows).filterNot(_._1 == 9L))
    val umEmb = embDf((resEmbRows ++ batchEmbRows).filterNot(_._1 == 9L))
    val got = canon(ManifestStore.manifest(spark, path,
      dv(unionMinus), ctv(unionMinus)))
    val want = canon(QualityOps.manifestFrom(
      QualityOps.manifestStateOn(unionMinus, umEmb),
      dv(unionMinus), ctv(unionMinus)))
    assert(got === want,
      "train-only forget on a pre-provenance layout must equal the " +
        "never-ingested recompute")
    // out-of-contract: an eval-bearing tombstone minted by a DIRECT
    // Tombstones.forget (bypassing the provenance gate) must refuse at
    // the heal rather than under-correct silently
    graft.engine.Tombstones.forget(spark, path, Seq(0L).toDF("doc_id"))
    val ex = intercept[IllegalStateException] {
      ManifestStore.maintain(spark, path)
    }
    assert(ex.getMessage.contains("provenance"))
    spark.catalog.clearCache()
  }

  test("a HALF-migrated store (eval tables disagreeing on provenance) " +
      "refuses appends with the rebuild message instead of silently " +
      "dropping eval_id from the provenanced table's delta") {
    val path = tmp()
    ManifestStore.build(resident, resEmb, path)
    // degrade ONLY evalemb to the pre-round-14 shape: evalchunks
    // keeps its provenance, so a shared legacy verdict would starve
    // its forget heal with provenance-less delta rows
    val ee = EpochStore.read(spark, s"$path/evalemb")
      .select(col("e_emb")).localCheckpoint(true)
    EpochStore.create(s"$path/evalemb", rebuild = true) { d =>
      ee.write.mode("overwrite").parquet(d) }
    val ex = intercept[IllegalStateException] {
      ManifestStore.appendEpoch(batch, batchEmb, path, 5L)
    }
    assert(ex.getMessage.contains("disagree"))
    assert(ex.getMessage.contains("evalemb=pre-provenance"))
    assert(ex.getMessage.contains("evalchunks=post-provenance"))
    assert(ex.getMessage.contains("ManifestStore.build"))
    spark.catalog.clearCache()
  }
}
