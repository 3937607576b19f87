package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted content-defined-chunk store — the third build-once/
  * query-many index alongside [[IvfIndex]] (vectors) and
  * [[MinHashIndex]] (shingle signatures): each document is chunked
  * ONCE at ingest ([[QualityOps.chunkRelationOf]], rolling-hash
  * boundaries) and the (doc_id, chunk_id, chunk_str) relation is
  * what every downstream consumer reads — the corpus-wide frequency
  * census (q137), boilerplate removal (q138), or a content-addressed
  * dedup store. Re-chunking the corpus per consumer is exactly what
  * a 100 TB pipeline cannot afford; chunking a daily crawl batch and
  * APPENDING is cheap.
  *
  * Storage layout: `<path>/chunks/epoch=<id>` — the batch build
  * writes `epoch=base`; each streamed micro-batch commits as its own
  * `epoch=<batchId>` dir via one atomic rename (the
  * [[IvfIndex]]/[[MinHashIndex]] epoch contract), so a replayed
  * batch is a storage-level no-op by naming and a crash mid-stage
  * leaves only a tmp dir the retry overwrites. Chunking is per-doc
  * deterministic, so build-then-append and build-over-union produce
  * identical rows.
  */
object ChunkIndex {

  /** Chunk `docs` (columns doc_id, text) and write the base epoch. */
  def build(docs: DataFrame, path: String): String = {
    QualityOps.chunkRelationOf(docs)
      .write.mode("overwrite").parquet(s"$path/chunks/epoch=base")
    path
  }

  /** Append a batch of new documents as one epoch dir. */
  private[graft] def appendEpoch(batch: DataFrame, path: String,
                                 batchId: Long): Unit = {
    val target = Paths.get(s"$path/chunks/epoch=$batchId")
    if (!Files.exists(target)) {
      val tmp = s"$path/.chunks-epoch-$batchId.tmp"
      graft.engine.Archive.deleteTree(Paths.get(tmp))
      QualityOps.chunkRelationOf(batch)
        .write.mode("overwrite").parquet(tmp)
      Files.move(Paths.get(tmp), target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    }
  }

  /** Incremental maintenance: each micro-batch of new documents
    * chunks under the same boundary function and commits as its own
    * epoch — no rewrite of existing epochs, replay-idempotent by
    * naming.
    */
  def appendStream(docs: DataFrame, path: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendEpoch(batch, path, batchId)
      }
      .start()

  /** The full chunk relation across every committed epoch. */
  def chunks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/chunks")
      .select("doc_id", "chunk_id", "chunk_str")

  /** The corpus-wide chunk-frequency index (chunk_str, n_copies) —
    * derived, never stored: counts cannot be appended per-epoch
    * without read-merge, and the aggregate is one shuffle over
    * chunk-cardinality keys.
    */
  def freq(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    chunks(spark, path).groupBy(col("chunk_str"))
      .agg(count(lit(1)).as("n_copies"))
  }
}
