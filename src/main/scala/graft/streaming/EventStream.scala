package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery}

import graft.engine.Sink
import graft.functions.Text
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
    * over time). Streaming sources require an explicit schema: pass
    * one for a directory that may still be empty at deploy time;
    * otherwise it is locked from the files already present (a batch
    * inference read, which fails on an empty directory).
    */
  def readEvents(spark: SparkSession, dir: String,
                 schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val s = schema.getOrElse(spark.read.parquet(dir).schema)
    spark.readStream.schema(s).parquet(dir)
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

  /** Streaming exact dedup: first occurrence per key wins; duplicate
    * state is bounded by the watermark (a duplicate arriving later
    * than `watermark` after the original is treated as new — the
    * unbounded-history variant is plain `dropDuplicates`, whose state
    * grows forever). The streaming form of q50's content-hash dedup:
    * key on the hash column, watermark on event time.
    */
  def streamingDedup(df: DataFrame, keys: Seq[String],
                     tsCol: String = "ts",
                     watermark: String = "2 hours"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join — attribution shape: every view
    * paired with the same user's purchases within `within` after it.
    * On streams, BOTH sides carry watermarks and the time-range
    * predicate bounds the join state (Spark evicts rows once the
    * watermark passes the interval) — the only way a stream-stream
    * join is runnable unbounded. On batch frames the watermarks are
    * optimizer-eliminated and this is a plain range join (q44's
    * DuckDB-verified form).
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
                      within: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame = {
    val v = views.withWatermark("ts", watermark).alias("v")
    val p = purchases.withWatermark("ts", watermark).alias("p")
    v.join(p,
        expr("v.user_id = p.user_id AND p.ts >= v.ts AND " +
          s"p.ts <= v.ts + INTERVAL $within"))
      .select(col("v.user_id").as("user_id"),
        col("v.event_id").as("view_id"), col("v.ts").as("view_ts"),
        col("p.event_id").as("purchase_id"), col("p.ts").as("purchase_ts"),
        col("p.value").as("purchase_value"))
  }

  /** One (band-key, doc, signature) assignment for the streaming
    * near-dup state operator.
    */
  final case class BandedDoc(band: Int, bandHash: Long, doc_id: Long,
                             sig: Array[Long])

  /** A streaming near-dup candidate: MinHash-estimated similarity of
    * a newly-arrived document against one seen earlier in the stream.
    */
  final case class DupCandidate(doc_a: Long, doc_b: Long, est: Double)

  /** Per-band state: signatures of documents seen so far. */
  final case class BandState(docs: List[(Long, Array[Long])])

  /** Streaming near-duplicate CANDIDATE detection — the LSH pipeline
    * (q56) made continuous with CUSTOM state
    * (`flatMapGroupsWithState`): documents are shingled, MinHashed,
    * and banded exactly like the batch path; state is keyed by LSH
    * band and holds the signatures seen in that band. Each arriving
    * document is compared against every stored signature; pairs whose
    * MinHash agreement estimate clears `threshold` are emitted. The
    * default threshold is the q56 PREFILTER cut (0.25 for a 0.5
    * Jaccard target) — the estimate's stderr at the target is ~0.07,
    * so cutting AT the target would drop ~half the boundary-true
    * pairs; downstream exact-verifies survivors exactly like q56's
    * last stage.
    *
    * Bounds, in order: documents with no shingles are excluded before
    * banding (they share MinHash's all-sentinel signature and would
    * all pair with est=1.0 despite zero true similarity — batch q56's
    * exact-verify kills those; a candidate stream must not emit
    * them); a full band (`maxPerBand`) still COMPARES new arrivals
    * against its stored signatures but stops storing (the batch skew
    * cap drops symmetric candidates; privileging stored-vs-new keeps
    * recall for dups of the retained docs); and with `stateTtl` set,
    * state entries expire that long after their last update via
    * processing-time timeout — total state bounded by arrival rate ×
    * TTL, not the corpus (a doc arriving after its band expired is
    * simply re-deduped against later arrivals, the watermark-style
    * horizon every unbounded streaming dedup needs). `stateTtl =
    * None` keeps state forever: fine for bounded corpora, and
    * REQUIRED for processAllAvailable-style tests — with
    * ProcessingTimeTimeout the state operator requests a batch on
    * every trigger (`shouldRunAnotherBatch` is unconditionally true
    * in that mode), so such queries never quiesce. Production
    * unbounded streams run periodic triggers and should set a TTL.
    *
    * Emission is at-least-once per pair (two docs can collide in
    * several bands); downstream consumers dedupe by (doc_a, doc_b) —
    * consistent with the engine's idempotent-sink philosophy.
    */
  def nearDupCandidates(docs: DataFrame, threshold: Double = 0.25,
                        maxPerBand: Int = 1000,
                        stateTtl: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        Text.shingleHashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), Text.minHash(col("sh")).as("sig"))
      .select(col("doc_id"), col("sig"), explode(Text.lshBands(col("sig"))).as("b"))
      .select(col("b.band").as("band"), col("b.h").as("bandHash"),
        col("doc_id"), col("sig"))
      .as[BandedDoc]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(d => (d.band, d.bandHash))
      .flatMapGroupsWithState[BandState, DupCandidate](
        OutputMode.Append, timeoutConf) {
        case (_, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.map(_.docs).getOrElse(Nil)
            val out = List.newBuilder[DupCandidate]
            rows.foreach { d =>
              if (!seen.exists(_._1 == d.doc_id)) {
                seen.foreach { case (otherId, otherSig) =>
                  var eq = 0
                  var i = 0
                  while (i < d.sig.length) {
                    if (d.sig(i) == otherSig(i)) eq += 1
                    i += 1
                  }
                  val est = eq.toDouble / d.sig.length
                  if (est >= threshold)
                    out += DupCandidate(math.min(d.doc_id, otherId),
                      math.max(d.doc_id, otherId), est)
                }
                if (seen.size < maxPerBand) seen = (d.doc_id, d.sig) :: seen
              }
            }
            state.update(BandState(seen))
            stateTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
      .toDF()
  }

  /** Continuous load: every micro-batch of `df` goes through the
    * idempotent chunked upsert (Sink.upsert). At-least-once delivery
    * on retry + last-write-wins per key = converged state, exactly
    * the reference's PostgREST upsert contract made continuous.
    *
    * outputMode: "update" suits keyed aggregations that re-emit
    * (tumbling/sliding); session-window aggregations only support
    * "append" (they emit once, on watermark passage) — pass it
    * explicitly when loading [[sessionAgg]] output.
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
