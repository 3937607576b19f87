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
