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
    * near-dup state operator. `ts` carries the WATERMARKED event-time
    * attribute itself (null when no horizon is configured) — deriving
    * a new column would strip the watermark metadata the event-time
    * timeout requires.
    */
  final case class BandedDoc(band: Int, bandHash: Long, doc_id: Long,
                             sig: Array[Long], ts: java.sql.Timestamp)

  /** A streaming near-dup candidate: MinHash-estimated similarity of
    * a newly-arrived document against one seen earlier in the stream.
    */
  final case class DupCandidate(doc_a: Long, doc_b: Long, est: Double)

  /** Per-band state: (doc_id, signature, event-time ms) of documents
    * seen so far, newest first.
    */
  final case class BandState(docs: List[(Long, Array[Long], Long)])

  /** Parse the single-component interval strings this surface accepts
    * ("90 seconds", "30 minutes", "2 hours", "1 day") to milliseconds.
    * Compound strings ("1 hour 30 minutes") are REJECTED rather than
    * silently truncated: `withWatermark` would honor the full string
    * while a misparsed horizon expired state early — the two must
    * never disagree.
    */
  private[graft] def intervalMs(s: String): Long = {
    val parts = s.trim.split("\\s+")
    require(parts.length == 2,
      s"eventTimeHorizon must be '<n> <unit>' (single component), got: '$s'")
    val base = parts(1).toLowerCase(java.util.Locale.ROOT) match {
      case "millisecond" | "milliseconds" => 1L
      case "second" | "seconds" => 1000L
      case "minute" | "minutes" => 60L * 1000
      case "hour" | "hours" => 3600L * 1000
      case "day" | "days" => 24L * 3600 * 1000
      case u => throw new IllegalArgumentException(s"unsupported interval unit: $u")
    }
    parts(0).toLong * base
  }

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
    * them). A full band (`maxPerBand`) keeps a RECENCY RING: new
    * arrivals still compare against everything stored, are stored
    * themselves, and the oldest entry is evicted — so two fresh
    * duplicates arriving after saturation still pair (the round-2
    * stop-storing variant silently lost exactly those), recall is
    * lost only for pairs separated by more than `maxPerBand` arrivals
    * within one band, and both memory and per-arrival compare cost
    * stay O(maxPerBand). (Salt-splitting the band key was considered
    * and rejected: state keys cannot be re-partitioned mid-stream,
    * and upstream salting makes cross-salt pairs structurally
    * invisible rather than recency-bounded.)
    *
    * With `eventTimeHorizon` set, state expiry is EVENT-time, matching
    * the semantics of every other stateful operator here: the input
    * is watermarked on `tsCol`, stored entries are pruned once the
    * watermark passes `entry ts + horizon`, and idle bands time out
    * via `EventTimeTimeout` (no wall-clock dependence, deterministic
    * under replay — a processing-time TTL would expire different docs
    * on a re-run). A duplicate arriving beyond the horizon is simply
    * re-deduped against later arrivals, the watermark-style bound
    * every unbounded streaming dedup needs; total state is bounded by
    * in-horizon arrivals, not the corpus. `eventTimeHorizon = None`
    * keeps state forever (fine for bounded corpora; unbounded
    * production streams should set it).
    *
    * Emission is at-least-once per pair (two docs can collide in
    * several bands); downstream consumers dedupe by (doc_a, doc_b) —
    * consistent with the engine's idempotent-sink philosophy.
    */
  def nearDupCandidates(docs: DataFrame, threshold: Double = 0.25,
                        maxPerBand: Int = 1000,
                        eventTimeHorizon: Option[String] = None,
                        tsCol: String = "ts"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val input = eventTimeHorizon.map(h => docs.withWatermark(tsCol, h))
      .getOrElse(docs)
    val tsExpr =
      if (eventTimeHorizon.isDefined) col(tsCol)
      else lit(null).cast("timestamp")
    val banded = input
      .select(col("doc_id").cast("long").as("doc_id"),
        Text.shingleHashes(col("text"), 3).as("sh"), tsExpr.as("ts"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), Text.minHash(col("sh")).as("sig"), col("ts"))
      .select(col("doc_id"), col("sig"), col("ts"),
        explode(Text.lshBands(col("sig"))).as("b"))
      .select(col("b.band").as("band"), col("b.h").as("bandHash"),
        col("doc_id"), col("sig"), col("ts"))
      .as[BandedDoc]
    statefulBandCandidates(banded, sigAgreement, threshold, maxPerBand,
      eventTimeHorizon.map(intervalMs))
  }

  /** MinHash agreement fraction — the estimate [[nearDupCandidates]]
    * emits (same formula as the batch q56 prefilter).
    */
  private def sigAgreement(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) {
      if (a(i) == b(i)) eq += 1
      i += 1
    }
    eq.toDouble / a.length
  }

  /** Exact cosine over float payloads stored as raw IEEE-754 bits —
    * operation-for-operation the batch CosineSim kernel
    * (`expressions/CosineSim.compute`: index-order double fold,
    * dot/(√sa·√sb)), so the streaming verdict is bit-identical to the
    * batch one. Returns −∞ for zero norms / length mismatch (never
    * emits).
    */
  private def bitsCosine(a: Array[Long], b: Array[Long]): Double = {
    if (a.length != b.length) return Double.NegativeInfinity
    var dot = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < a.length) {
      val x = java.lang.Float.intBitsToFloat(a(i).toInt).toDouble
      val y = java.lang.Float.intBitsToFloat(b(i).toInt).toDouble
      dot += x * y
      sa += x * x
      sb += y * y
      i += 1
    }
    val d = math.sqrt(sa) * math.sqrt(sb)
    if (d == 0.0) Double.NegativeInfinity else dot / d
  }

  /** Streaming EMBEDDING near-dup — q69's hyperplane-banded pipeline
    * made continuous with the same state machine as
    * [[nearDupCandidates]] (recency ring, event-time expiry,
    * redelivery refresh): vectors band under the q69 bucket-equality
    * tables ((table, bucket) is the state key), and each arrival is
    * EXACT-cosine-verified against the band's stored vectors — unlike
    * the text path there is no estimate/verify split, because the
    * verdict itself is O(dim) per stored entry. Float payloads ride
    * the shared `Array[Long]` state slot as raw IEEE bits, decoded in
    * the kernel, so the emitted score is bit-identical to batch
    * CosineSim. Emission is at-least-once per pair (multi-band
    * collisions); consumers dedupe by (doc_a, doc_b).
    */
  def embNearDupCandidates(vecs: DataFrame, minCos: Double = 0.45,
                           nBits: Int = 8, tables: Int = 70,
                           maxPerBand: Int = 1000,
                           eventTimeHorizon: Option[String] = None,
                           tsCol: String = "ts"): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val input = eventTimeHorizon.map(h => vecs.withWatermark(tsCol, h))
      .getOrElse(vecs)
    val tsExpr =
      if (eventTimeHorizon.isDefined) col(tsCol)
      else lit(null).cast("timestamp")
    val banded = input
      .select(col("vec_id").cast("long").as("doc_id"),
        col("embedding").as("vec"), tsExpr.as("ts"))
      .select(col("doc_id"), col("vec"), col("ts"),
        posexplode(graft.functions.Vectors
          .hyperplaneBuckets(col("vec"), nBits, tables))
          .as(Seq("tbl", "b")))
      .select(col("tbl"), col("b"), col("doc_id"), col("vec"), col("ts"))
      .as[(Int, Long, Long, Array[Float], java.sql.Timestamp)]
      .map { case (tbl, b, id, vec, ts) =>
        BandedDoc(tbl, b, id,
          vec.map(f =>
            java.lang.Float.floatToRawIntBits(f).toLong & 0xffffffffL),
          ts)
      }
    statefulBandCandidates(banded, bitsCosine, minCos, maxPerBand,
      eventTimeHorizon.map(intervalMs))
  }

  /** The shared stateful band machine of [[nearDupCandidates]] and
    * [[embNearDupCandidates]]: per-band recency ring, event-time
    * expiry against the watermark, at-least-once redelivery refresh.
    * `sim` scores an arriving payload against a stored one; pairs
    * clearing `threshold` are emitted.
    */
  private def statefulBandCandidates(
      banded: org.apache.spark.sql.Dataset[BandedDoc],
      sim: (Array[Long], Array[Long]) => Double,
      threshold: Double, maxPerBand: Int,
      horizonMs: Option[Long]): DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (horizonMs.isDefined) GroupStateTimeout.EventTimeTimeout
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
            // event-time expiry ALSO applies when the band receives
            // data (timeouts only fire for idle groups): entries whose
            // ts + horizon the watermark has passed are gone before
            // any comparison, so a beyond-horizon duplicate is genuinely
            // re-deduped, not matched against expired state
            horizonMs.foreach { h =>
              val wm = state.getCurrentWatermarkMs()
              if (wm > 0) seen = seen.filter(_._3 + h >= wm)
            }
            val out = List.newBuilder[DupCandidate]
            var maxTs = Long.MinValue
            rows.foreach { d =>
              val dTs = if (d.ts == null) 0L else d.ts.getTime
              if (dTs > maxTs) maxTs = dTs
              val idx = seen.indexWhere(_._1 == d.doc_id)
              if (idx >= 0) {
                // at-least-once redelivery: REFRESH the stored entry —
                // move it to the ring head with the newer of its two
                // timestamps — so a redelivered doc keeps its full
                // documented horizon instead of staying pinned to its
                // first-seen ts (earlier expiry). No emission needed:
                // every entry stored since the first arrival already
                // compared itself against this doc when IT arrived.
                val (id, sig, oldTs) = seen(idx)
                seen = (id, sig, math.max(oldTs, dTs)) ::
                  seen.patch(idx, Nil, 1)
              } else {
                seen.foreach { case (otherId, otherSig, _) =>
                  val est = sim(d.sig, otherSig)
                  if (est >= threshold)
                    out += DupCandidate(math.min(d.doc_id, otherId),
                      math.max(d.doc_id, otherId), est)
                }
                // recency ring: newest first, evict beyond the cap
                seen = ((d.doc_id, d.sig, dTs) :: seen).take(maxPerBand)
              }
            }
            state.update(BandState(seen))
            horizonMs.foreach { h =>
              // the timeout must cover the NEWEST SURVIVING entry, not
              // just this batch's rows: a late-arriving row with an
              // older ts would otherwise pull the band's timeout
              // earlier than already-stored entries' horizon, and the
              // idle-group timeout would remove them prematurely
              val newestStored =
                if (seen.isEmpty) maxTs else seen.iterator.map(_._3).max
              val floor = math.max(math.max(newestStored, maxTs),
                state.getCurrentWatermarkMs() + 1)
              state.setTimeoutTimestamp(floor + h)
            }
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
                   outputMode: String = "update",
                   trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): StreamingQuery = {
    val w = df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sink.upsert(batch, table, writer, chunkSize): Unit
      }
    trigger.foreach(w.trigger)
    w.start()
  }

  /** Incremental maintenance of q102's per-day HLL REGISTER table:
    * each micro-batch folds its events into (day, bucket) → max(rho)
    * register rows ([[graft.queries.EventOps.hllRows]] — the SAME
    * portable md5 derivation the batch query uses, so streaming and
    * batch state are row-identical, not merely estimate-close) and
    * MERGES them into the stored table (tmp+rename swap, the Sink
    * idiom), so the distinct-count dashboard never re-scans raw
    * events — the streaming form of mergeable pre-aggregation. The
    * merge IS the HLL union (grouped register-wise max), which makes
    * at-least-once delivery safe WITHOUT keyed dedup: merging the
    * same batch twice is a no-op (idempotent), the sketch analog of
    * the upsert sink's last-write-wins convergence (StreamingSpec
    * pins both: register-row parity with the batch q102 state, and
    * redelivery convergence). Any date range's estimate is one more
    * grouped max + the q102 estimator arithmetic over ≤ m rows per
    * day — plain SQL over the stored table, no sketch library on the
    * read path.
    *
    * Cost model: every micro-batch re-reads and rewrites the WHOLE
    * sketch table — O(|table|) per batch, which is fine because the
    * table is day-keyed (≤ a few thousand rows after years); for a
    * high-cardinality key swap this for partitioned dynamic
    * overwrite of only the touched partitions. The swap is two
    * renames, not atomic: a crash between them parks the table under
    * `.old`, which the NEXT batch heals below before merging — the
    * stream self-recovers, no manual repair.
    */
  def sketchRollupStream(events: DataFrame, tablePath: String,
                         checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import java.nio.file.{Files, Paths}
        val spark = batch.sparkSession
        val dir = Paths.get(tablePath)
        val old = Paths.get(tablePath + ".old")
        val tmp = Paths.get(tablePath + ".tmp")
        // heal a mid-swap crash from a previous batch, then swap —
        // the shared Archive machinery (one copy of the subtle part)
        graft.engine.Archive.healSwap(dir, old, tmp)
        val daily = graft.queries.EventOps.hllRows(batch)
          .groupBy(col("day"), col("b"))
          .agg(max(col("rho")).as("m_reg"))
        val merged =
          if (Files.exists(dir))
            spark.read.parquet(tablePath).union(daily)
              .groupBy(col("day"), col("b"))
              .agg(max(col("m_reg")).as("m_reg"))
          else daily
        merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        graft.engine.Archive.swapInPlace(dir, old, tmp)
        (): Unit
      }
      .start()

  /** Incremental maintenance of q117's per-day HDR-histogram table —
    * the quantile twin of [[sketchRollupStream]] with one extra piece
    * of machinery the HLL stream doesn't need: count merging is NOT
    * idempotent (HLL union is register-max, so redelivering a batch
    * is a no-op there; re-summing the same counts doubles them).
    * Idempotence here comes from the batch-id marker: each merge
    * writes Spark's monotonically increasing `batchId` as an
    * underscore-prefixed file INSIDE the tmp table directory before
    * the swap, so the marker travels atomically with the data (a
    * post-swap marker write would leave a crash window in which the
    * same batch merges twice). On crash-redelivery foreachBatch
    * re-runs the last batch with the SAME id — `batchId <= marker`
    * skips the merge, and the stream converges exactly-once.
    *
    * Cost model matches sketchRollupStream: O(|table|) per batch,
    * day-keyed tables stay in the thousands of rows × ~2k buckets;
    * the same tmp+rename swap with healSwap self-recovery applies.
    */
  def histRollupStream(events: DataFrame, tablePath: String,
                       checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeHistBatch(batch, tablePath, batchId): Unit
      }
      .start()

  /** One histogram merge step (exposed for direct redelivery tests:
    * MemoryStream can't replay a batch id, a crashed driver can).
    * Returns true when the batch was merged, false when the marker
    * proved it already was.
    */
  private[graft] def mergeHistBatch(batch: DataFrame, tablePath: String,
                                    batchId: Long): Boolean = {
    import java.nio.file.{Files, Paths}
    val spark = batch.sparkSession
    val dir = Paths.get(tablePath)
    val old = Paths.get(tablePath + ".old")
    val tmp = Paths.get(tablePath + ".tmp")
    graft.engine.Archive.healSwap(dir, old, tmp)
    val marker = dir.resolve("_GRAFT_BATCH")
    val lastMerged =
      if (Files.exists(marker)) Files.readString(marker).trim.toLong else -1L
    if (batchId <= lastMerged) false
    else {
      val daily = graft.operators.HdrHistogram
        .dailyHist(batch, col("ts"), col("value"))
      val merged =
        if (Files.exists(dir))
          spark.read.parquet(tablePath).union(daily)
            .groupBy(col("day"), col("bucket"))
            .agg(sum(col("cnt")).as("cnt"))
        else daily
      merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      // marker inside tmp: swaps into place atomically with the data
      Files.writeString(tmp.resolve("_GRAFT_BATCH"), batchId.toString)
      graft.engine.Archive.swapInPlace(dir, old, tmp)
      true
    }
  }
}
