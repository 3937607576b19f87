package graft

import org.apache.spark.sql.functions._

import graft.engine.EpochStore
import graft.queries.{IvfIndex, MinHashIndex}

/** Epoch compaction for the persisted IVF and MinHash stores (the
  * chunk store's test lives in ChunkIndexSpec): folding N committed
  * epoch dirs into one base must change the LAYOUT only — values,
  * query results, and replay idempotence are all preserved, and a
  * reader racing the manifest flip never errors.
  */
class EpochCompactionSpec extends SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("IvfIndex: appends + compact == same cells, same query answers, " +
      "epoch count 1, folded replays no-op") {
    val base = java.nio.file.Files.createTempDirectory("ivf-compact").toString
    val idx = s"$base/ix"
    IvfIndex.build(emb.filter(col("vec_id") < 250), idx)
    val cents = IvfIndex.loadCodebook(spark, idx)
    val rest = emb.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") >= 250)
    IvfIndex.appendEpoch(rest.filter(col("vec_id") < 350), cents, idx, 1L)
    IvfIndex.appendEpoch(rest.filter(col("vec_id") >= 350), cents, idx, 2L)
    val root = s"$idx/cells"
    assert(EpochStore.epochCount(root) === 3)

    def cellRows = EpochStore.read(spark, root)
      .select(col("vec_id").cast("long"), col("cell").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    def answers = IvfIndex.query(spark, idx, queries, topK = 3)
      .collect().map(_.toSeq).toSeq

    val cellsBefore = cellRows
    val ansBefore = answers

    IvfIndex.compact(spark, idx)
    assert(EpochStore.epochCount(root) === 1)
    assert(cellRows === cellsBefore)
    assert(answers === ansBefore)
    // the cell partition layout survives the fold (pruning intact)
    assert(fileDirs(root).exists(_.contains("cell=")))
    // a batchId folded into the base is still a replay no-op
    val files = fileDirs(root)
    IvfIndex.appendEpoch(rest.filter(col("vec_id") >= 350), cents, idx, 2L)
    assert(fileDirs(root) === files)
  }

  test("MinHashIndex: appends + compact == same rows and matches, " +
      "epoch count 1 per table") {
    val base = java.nio.file.Files.createTempDirectory("mh-compact").toString
    val ix = s"$base/ix"
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    MinHashIndex.build(corpus.filter(col("doc_id") < 300), ix)
    MinHashIndex.appendEpoch(corpus.filter(
      col("doc_id") >= 300 && col("doc_id") < 500), ix, 1L)
    MinHashIndex.appendEpoch(corpus.filter(col("doc_id") >= 500), ix, 2L)
    assert(EpochStore.epochCount(s"$ix/docs") === 3)
    assert(EpochStore.epochCount(s"$ix/bands") === 3)

    val batch = docs.filter(col("doc_id") % 5 === 0).limit(40)
    def sigRows = EpochStore.read(spark, s"$ix/docs")
      .select(col("doc_id"), col("sig"), col("sh"))
      .collect().map(_.toSeq).toSet
    def matchRows = MinHashIndex.invertedMatches(spark, ix, batch)
      .collect().map(_.toSeq).toSeq
    val sigsBefore = sigRows
    val matchesBefore = matchRows
    assert(matchesBefore.nonEmpty, "fixture must produce matches")

    MinHashIndex.compact(spark, ix)
    assert(EpochStore.epochCount(s"$ix/docs") === 1)
    assert(EpochStore.epochCount(s"$ix/bands") === 1)
    assert(sigRows === sigsBefore)
    assert(matchRows === matchesBefore)
    assert(fileDirs(s"$ix/bands").exists(_.contains("band=")))
    // folded replay is a no-op on both tables
    val d = fileDirs(s"$ix/docs"); val b = fileDirs(s"$ix/bands")
    MinHashIndex.appendEpoch(corpus.filter(col("doc_id") >= 500), ix, 2L)
    assert(fileDirs(s"$ix/docs") === d && fileDirs(s"$ix/bands") === b)
  }

  test("batch append() commits as its own epoch: base untouched, " +
      "matches grow, id drawn from the high band") {
    val base = java.nio.file.Files.createTempDirectory("mh-append").toString
    val ix = s"$base/ix"
    MinHashIndex.build(docs.filter(col("doc_id") < 300), ix)
    val baseFiles = fileDirs(s"$ix/docs")
    MinHashIndex.append(docs.filter(
      col("doc_id") >= 300 && col("doc_id") < 400), ix)
    // the pre-append base files are byte-identical (no part files
    // were injected into epoch=base mid-flight); the batch is its
    // own epoch from the >=10^9 band, disjoint from stream batchIds
    assert(fileDirs(s"$ix/docs").filter(_.contains("epoch=base")) ===
      baseFiles.filter(_.contains("epoch=base")))
    assert(EpochStore.epochCount(s"$ix/docs") === 2)
    assert(EpochStore.committed(s"$ix/docs", 1000000000L))
    assert(EpochStore.committed(s"$ix/bands", 1000000000L))
    // a second append takes the next id up
    MinHashIndex.append(docs.filter(col("doc_id") >= 400).limit(50), ix)
    assert(EpochStore.committed(s"$ix/docs", 1000000001L))
    val n = EpochStore.read(spark, s"$ix/docs").count()
    assert(n === docs.filter(col("doc_id") < 400).count() + 50)
  }

  test("compactIfFragmented: under the bound is a pure no-op; over it " +
      "folds to one base (IvfIndex form carries the codebook sidecar)") {
    val base = java.nio.file.Files.createTempDirectory("ivf-frag").toString
    val idx = s"$base/ix"
    IvfIndex.build(emb.filter(col("vec_id") < 250), idx)
    val cents = IvfIndex.loadCodebook(spark, idx)
    val rest = emb.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") >= 250)
    IvfIndex.appendEpoch(rest.filter(col("vec_id") < 350), cents, idx, 1L)
    IvfIndex.appendEpoch(rest.filter(col("vec_id") >= 350), cents, idx, 2L)
    val root = s"$idx/cells"
    assert(EpochStore.epochCount(root) === 3)

    // bound not reached: no fold, no new version
    val v0 = graft.engine.Archive.currentVersion(root)
    assert(!IvfIndex.compactIfFragmented(spark, idx, maxEpochs = 5))
    assert(EpochStore.epochCount(root) === 3)
    assert(graft.engine.Archive.currentVersion(root) === v0)

    // bound exceeded: folds, codebook sidecar survives the fold
    assert(IvfIndex.compactIfFragmented(spark, idx, maxEpochs = 2))
    assert(EpochStore.epochCount(root) === 1)
    assert(IvfIndex.loadCodebook(spark, idx) === cents)
    assert(EpochStore.read(spark, root).count() === 500)
  }

  test("crashed append() (docs committed, bands missing) heals on retry " +
      "with the same batch; a different batch fails loudly") {
    val base = java.nio.file.Files.createTempDirectory("mh-heal").toString
    val ix = s"$base/ix"
    MinHashIndex.build(docs.filter(col("doc_id") < 300), ix)
    val batchA = docs.filter(col("doc_id") >= 300 && col("doc_id") < 360)
    val batchB = docs.filter(col("doc_id") >= 360 && col("doc_id") < 420)

    // simulate the crash window: the docs epoch committed, the bands
    // epoch never staged
    EpochStore.commitEpoch(s"$ix/docs", 1000000000L) { tmp =>
      MinHashIndex.signatures(batchA).write.mode("overwrite").parquet(tmp)
    }
    assert(EpochStore.committed(s"$ix/docs", 1000000000L))
    assert(!EpochStore.committed(s"$ix/bands", 1000000000L))

    // retrying with a DIFFERENT batch must not adopt the crashed id
    val e = intercept[IllegalStateException] {
      MinHashIndex.append(batchB, ix)
    }
    assert(e.getMessage.contains("half-committed"))
    assert(!EpochStore.committed(s"$ix/bands", 1000000000L))

    // retrying with the ORIGINAL batch heals: the crashed id is
    // reused (docs commit no-ops, bands completes) — no duplicate
    // docs rows, both tables converged
    val docFiles = fileDirs(s"$ix/docs")
    MinHashIndex.append(batchA, ix)
    assert(fileDirs(s"$ix/docs") === docFiles) // docs side untouched
    assert(EpochStore.committed(s"$ix/bands", 1000000000L))
    assert(EpochStore.read(spark, s"$ix/docs").count() ===
      docs.filter(col("doc_id") < 300).count() + batchA.count())

    // and the next append draws a FRESH id again
    MinHashIndex.append(batchB, ix)
    assert(EpochStore.committed(s"$ix/docs", 1000000001L))
    assert(EpochStore.committed(s"$ix/bands", 1000000001L))
  }

  test("compact refuses over a half-committed append; a crashed epoch " +
      "folded out-of-band gets the distinct appendEpoch-heal error") {
    val base = java.nio.file.Files.createTempDirectory("mh-wedge").toString
    val ix = s"$base/ix"
    MinHashIndex.build(docs.filter(col("doc_id") < 300), ix)
    val batchA = docs.filter(col("doc_id") >= 300 && col("doc_id") < 360)

    // crash window: docs epoch committed, bands never staged
    EpochStore.commitEpoch(s"$ix/docs", 1000000000L) { tmp =>
      MinHashIndex.signatures(batchA).write.mode("overwrite").parquet(tmp)
    }

    // 1) maintenance must not bury the crashed epoch: both the direct
    // compact and the policy form refuse with the diverged-sets error
    val eC = intercept[IllegalStateException] {
      MinHashIndex.compact(spark, ix)
    }
    assert(eC.getMessage.contains("diverged"))
    assert(eC.getMessage.contains("docs-only: 1000000000"))
    val eF = intercept[IllegalStateException] {
      MinHashIndex.compactIfFragmented(spark, ix, maxEpochs = 0)
    }
    assert(eF.getMessage.contains("diverged"))

    // 2) simulate the pre-guard wedge: fold docs DIRECTLY through the
    // engine (bypassing the refusal, as an older library or a raw
    // EpochStore.compact call would). The retry with the ORIGINAL
    // batch can no longer verify row-wise — it must get the distinct
    // folded-epoch error naming the appendEpoch recovery, not the
    // misleading "re-run the original batch" one.
    EpochStore.compact(spark, s"$ix/docs")
    assert(EpochStore.folded(s"$ix/docs", 1000000000L))
    val eH = intercept[IllegalStateException] {
      MinHashIndex.append(batchA, ix)
    }
    assert(eH.getMessage.contains("folded"))
    assert(eH.getMessage.contains("appendEpoch"))

    // 3) and the named recovery WORKS: docs no-ops via the folded
    // ledger, bands completes under the crashed id — store healed,
    // next append draws a fresh id
    val docFiles = fileDirs(s"$ix/docs")
    MinHashIndex.appendEpoch(batchA, ix, 1000000000L)
    assert(fileDirs(s"$ix/docs") === docFiles)
    assert(EpochStore.committed(s"$ix/bands", 1000000000L))
    MinHashIndex.append(docs.filter(
      col("doc_id") >= 360 && col("doc_id") < 420), ix)
    assert(EpochStore.committed(s"$ix/docs", 1000000001L))
    assert(EpochStore.committed(s"$ix/bands", 1000000001L))
    // matching against the healed store sees batchA's docs
    val m = MinHashIndex.matches(spark, ix,
      batchA.select(col("doc_id") + 100000, col("text"))
        .toDF("doc_id", "text"), jacThresh = 0.99)
    assert(m.count() >= batchA.count())
  }

  test("append racing compact fails loudly instead of losing the epoch " +
      "(engine-level: all three stores share this path)") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("race").toString + "/store"
    EpochStore.create(root) { b =>
      Seq((1L, "a")).toDF("id", "v").write.parquet(b)
    }
    EpochStore.commitEpoch(root, 1L) { t =>
      Seq((2L, "b")).toDF("id", "v").write.parquet(t)
    }
    // deterministic interleave: the maintenance flip happens INSIDE
    // the appender's stage window (after it resolved the live
    // version, before its rename) — the single-maintenance-writer
    // contract violated on purpose
    val e = intercept[IllegalStateException] {
      EpochStore.commitEpoch(root, 2L) { t =>
        Seq((3L, "c")).toDF("id", "v").write.parquet(t)
        EpochStore.compact(spark, root) // flips the manifest mid-stage
      }
    }
    assert(e.getMessage.contains("displaced"))
    // the store is intact: epoch 2 is NOT visible (it landed in the
    // displaced version), nothing was lost from the live table...
    assert(!EpochStore.committed(root, 2L))
    assert(EpochStore.read(spark, root).count() === 2)
    // ...and the documented recovery — retry the commit — lands it
    EpochStore.commitEpoch(root, 2L) { t =>
      Seq((3L, "c")).toDF("id", "v").write.parquet(t)
    }
    assert(EpochStore.read(spark, root).count() === 3)
  }

  test("create() refuses a silent rebuild; rebuild=true carries the " +
      "committed-epoch ledger forward (stale checkpoints stay no-ops)") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("rebuild").toString + "/store"
    EpochStore.create(root) { b =>
      Seq((1L, "a")).toDF("id", "v").write.parquet(b)
    }
    EpochStore.commitEpoch(root, 7L) { t =>
      Seq((2L, "b")).toDF("id", "v").write.parquet(t)
    }
    EpochStore.compact(spark, root) // 7 moves into the folded ledger
    EpochStore.commitEpoch(root, 9L) { t =>
      Seq((3L, "c")).toDF("id", "v").write.parquet(t)
    }
    // accidental re-create fails loudly
    intercept[IllegalStateException] {
      EpochStore.create(root) { b =>
        Seq((4L, "d")).toDF("id", "v").write.parquet(b)
      }
    }
    // deliberate rebuild: both the folded id (7) and the live epoch
    // id (9) are remembered, so a stream checkpoint surviving the
    // rebuild cannot re-commit either
    EpochStore.create(root, rebuild = true) { b =>
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").write.parquet(b)
    }
    assert(EpochStore.committed(root, 7L) && EpochStore.committed(root, 9L))
    val files = fileDirs(root)
    EpochStore.commitEpoch(root, 7L) { t => // redelivery: storage no-op
      Seq((99L, "x")).toDF("id", "v").write.parquet(t)
    }
    assert(fileDirs(root) === files)
    assert(EpochStore.read(spark, root).count() === 3)
    // genuinely new epochs still commit after the rebuild
    EpochStore.commitEpoch(root, 10L) { t =>
      Seq((4L, "d")).toDF("id", "v").write.parquet(t)
    }
    assert(EpochStore.read(spark, root).count() === 4)
  }

  /** Relative paths of every data file under `root`. */
  private def fileDirs(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val rp = java.nio.file.Paths.get(root)
    val w = java.nio.file.Files.walk(rp)
    try w.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => rp.relativize(p).toString).toSet
    finally w.close()
  }
}
