package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end pipeline orchestration — the Spark form of the
  * reference's `run_etl()` (reference `etl_supabase.py:111-158`):
  * per statement table, EXTRACT → TRANSFORM (packJsonb) →
  * ARCHIVE (wide CSV) → LOAD (chunked upsert) → PUBLISH.
  *
  * The reference runs its three tables sequentially in one thread
  * (`:128-156`); here each spec is an independent Spark job, so specs
  * can run sequentially (fail-fast parity, `:83`/`:106`) or
  * concurrently — Spark's scheduler interleaves their stages across
  * the cluster either way. At 100 TB each spec is itself fully
  * distributed; the pipeline layer only sequences DAGs.
  */
object Pipeline {

  /** One table's flow: which (symbol, statement) to pull through the
    * connector, where records upsert to, where the wide archive lands
    * (reference `:145-147`, `:139-141`, `:154-156`).
    */
  final case class Spec(
      source: Sources.StatementSource,
      symbol: String,
      statement: Sources.Statement,
      targetTable: String,
      archivePath: String,
      remotePrefix: String)

  final case class Result(spec: Spec, recordsUpserted: Long, filesPublished: Int)

  /** Run one spec. Fail-fast: any exception aborts the pipeline run
    * (reference `:83`, `:106`); already-upserted chunks are safe
    * because the sink is idempotent.
    */
  def run(spark: SparkSession, spec: Spec, writer: Sink.ChunkWriter,
          publisher: Archive.Publisher,
          chunkSize: Int = Sink.DefaultChunkSize,
          bucket: String = Archive.DefaultBucket): Result = {
    val wide = Sources.dropAllNullRows(                 // EXTRACT (+ dropna
      spec.source.load(spark, spec.symbol, spec.statement)) // parity, `:117-119`)
    val packed = Transform.packJsonb(wide)              // TRANSFORM
    Archive.toCsv(wide, spec.archivePath)               // ARCHIVE (wide, not packed — reference `:139`)
    val n = Sink.upsert(packed, spec.targetTable, writer, chunkSize) // LOAD
    val published = Archive.publishDir(publisher, spec.archivePath,
      spec.remotePrefix, bucket)                        // PUBLISH
    Result(spec, n, published)
  }

  /** Run all specs in order, fail-fast — reference `:128-156`. */
  def runAll(spark: SparkSession, specs: Seq[Spec], writer: Sink.ChunkWriter,
             publisher: Archive.Publisher): Seq[Result] =
    specs.map(run(spark, _, writer, publisher))
}
