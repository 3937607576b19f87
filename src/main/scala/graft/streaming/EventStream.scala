package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.Sink
import graft.queries.QU.dsum

/** Structured Streaming surface (SURVEY §2.7, §7.1 step 9).
  *
  * The reference's operating mode is a cron-scheduled idempotent
  * refresh (reference `.github/workflows/etl.yml:5-6`, upsert
  * semantics `etl_supabase.py:71-91`); the Spark-native
  * generalization is a continuous pipeline: `readStream` → the SAME
  * event-time transforms the batch queries use → `foreachBatch`
  * into the idempotent chunked upsert sink. Because the transforms
  * are plain DataFrame functions, each works unchanged on a batch
  * OR a streaming frame — batch q40/q41/q42 (DuckDB-verified) and
  * the streaming pipeline share one implementation, and
  * StreamingSpec proves the outputs coincide on the same data.
  *
  * Scale posture: watermarked windowed aggregation keeps state
  * bounded by (#open windows × #keys); the upsert sink inherits
  * at-least-once + idempotent-key convergence from Sink.upsert, so
  * a replayed micro-batch cannot double-count.
  */
object EventStream {

  /** Streaming read of an events directory (parquet files appearing
    * over time). Schema is locked from the existing files — streaming
    * sources require an explicit schema.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Tumbling event-time window aggregate — the streaming/batch form
    * of q40. On a batch frame the watermark node is eliminated by the
    * optimizer; on a stream it bounds state and lateness.
    */
  def tumblingAgg(events: DataFrame, window_ : String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding event-time windows — the q41 transform. */
  def slidingCounts(events: DataFrame, window_ : String = "10 minutes",
                    slide: String = "5 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows (gap-based) per user — the q42 transform. In
    * streaming, sessions emit on watermark passage (append mode).
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Continuous load: every micro-batch of `df` goes through the
    * idempotent chunked upsert (Sink.upsert). At-least-once delivery
    * on retry + last-write-wins per key = converged state, exactly
    * the reference's PostgREST upsert contract made continuous.
    */
  def upsertStream(df: DataFrame, table: String, writer: Sink.ChunkWriter,
                   checkpointDir: String,
                   chunkSize: Int = Sink.DefaultChunkSize,
                   outputMode: String = "update"): StreamingQuery =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sink.upsert(batch, table, writer, chunkSize): Unit
      }
      .start()
}
