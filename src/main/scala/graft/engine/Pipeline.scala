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

  /** The scheduler analog (reference `etl.yml:5-6` daily cron) AS
    * CODE: each invocation drains whatever statement files have
    * appeared under `<base>/<statement>` since the last run —
    * `Trigger.AvailableNow` processes everything available, then
    * stops — transforms them through the same dropna + JSONB pack,
    * and loads through [[graft.streaming.EventStream.upsertStream]]'s
    * foreachBatch upsert. The checkpoint is the "last run" memory:
    * file-source offsets live there, so a re-run (or a crashed run's
    * retry) never re-reads files it already committed, and the
    * idempotent keyed sink converges replayed in-flight batches —
    * cron + re-run safety without any external scheduler state.
    *
    * Cumulative semantics note: the keyed upsert means N incremental
    * runs over a growing directory end in the same store as ONE
    * batch [[run]] over the final directory (PipelineSpec pins this).
    */
  def runIncremental(spark: SparkSession, base: String, symbol: String,
                     statement: Sources.Statement, targetTable: String,
                     writer: Sink.ChunkWriter, checkpointDir: String,
                     chunkSize: Int = Sink.DefaultChunkSize): Unit = {
    val dir = s"$base/${statement.name}"
    // file streams need an explicit schema; the directory's own
    // footer schema is authoritative (and one driver-side read)
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    val symCol = Schema.resolve(raw, Schema.TickerNames).getOrElse(throw
      new IllegalArgumentException(
        s"statement table ${statement.name} has no ticker column " +
          s"(looked for ${Schema.TickerNames.mkString("/")})"))
    val wide = Sources.dropAllNullRows(
      raw.filter(org.apache.spark.sql.functions.col(s"`$symCol`") === symbol))
    val packed = Transform.packJsonb(wide)
    val q = graft.streaming.EventStream.upsertStream(
      packed, targetTable, writer, checkpointDir, chunkSize,
      outputMode = "append",
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q.awaitTermination()
  }
}
