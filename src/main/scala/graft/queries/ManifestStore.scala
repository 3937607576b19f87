package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.EpochStore

/** The persisted MANIFEST STORE — the seventh build-once/
  * maintain-forever store, and the production artifact behind q160:
  * the component state of the q146/q157 training manifest as
  * delta-epoch tables, so a daily batch updates the shipped manifest
  * without a full recompute AND without rewriting resident rows it
  * didn't change.
  *
  * Layout under `path` — eight [[EpochStore]] tables mirroring
  * [[QualityOps.ManifestState]]:
  *
  *  - `quality/`     (doc_id, q_v, n_tokens): APPEND-ONLY — quality
  *    verdicts are per-doc map-side, a batch only adds rows.
  *  - `contam/`      (doc_id, n_bench_docs, max_eval_cos, n_chunks,
  *    n_shared, seq): LWW by doc — the ONE mutable table: a batch's
  *    bench docs can update resident train rows. Each epoch carries
  *    exactly the batch's own train rows plus the resident rows its
  *    delta probes TOUCHED ([[QualityOps.manifestDelta]]) — the
  *    "delta rows only for docs whose components changed" write
  *    volume.
  *  - `trainsh8/ benchsh8/ trainchunks/ evalchunks/ trainemb/
  *    evalemb/`: the contamination probe indexes, all append-only
  *    (eval-chunk epochs carry only NEWLY-introduced strings, kept
  *    disjoint by the delta's anti-join).
  *
  * What is deliberately NOT stored: decisions, reasons, packing.
  * [[manifest]] derives them at read by folding precedence against
  * the dedup / containment store views and re-running the PrefixSum
  * packing — a single verdict flip shifts every later kept doc's
  * start_tok, so storing them would force a full-table rewrite per
  * append (the q157 design note, now a storage contract).
  *
  * RIGHT-TO-BE-FORGOTTEN boundary (round 13, deliberate): no
  * `forget` here — the [[ContainmentStore]] argument, twice over.
  * The contam table's `max_eval_cos` / `n_shared` are MAX/COUNT
  * aggregates over the eval side: forgetting an EVAL doc would need
  * each affected train row's aggregate recomputed over the remaining
  * eval set, and the store does not record which eval doc achieved
  * a row's max — a tombstone forget would leave other rows' values
  * silently stale. Composed reads also fold the ContainmentStore
  * view, which has the same boundary. The honest operation is a
  * rebuild over the corpus minus the forgotten set; the exact
  * decremental path (argmax provenance per contam row + full
  * containment postings) is a documented design trade, not taken.
  *
  * Exactly-once — the [[ContainmentStore]] scheme: every read an
  * append performs EXCLUDES the in-flight epoch id, so a redelivery
  * reconstructs the exact pre-append state, recomputes the identical
  * eight deltas ([[QualityOps.manifestDelta]] is deterministic), and
  * each per-table commit either no-ops or completes; no table
  * ordering is load-bearing. All reads go through one pinned
  * [[EpochStore.snapshot]] so a maintenance flip cannot hand a
  * composed read mixed table versions. Single-maintenance-writer
  * contract throughout.
  */
object ManifestStore {

  private val Tables = Seq("quality", "contam", "trainsh8", "benchsh8",
    "trainchunks", "evalchunks", "trainemb", "evalemb")

  /** The semantic probe codebook — a version-scoped SIDECAR of the
    * `trainemb` table (the [[IvfIndex]] `_codebook` discipline): it
    * lives inside the table's manifest version, so a rebuild flips
    * codebook and cell assignments in ONE atomic rename.
    */
  private val SemCodebookName = "_semcodebook"

  /** The codebook of a PINNED trainemb version dir — resolved through
    * the caller's snapshot so a maintenance flip can never pair a new
    * codebook with old assignments (or vice versa).
    */
  private def loadSemCodebook(spark: SparkSession,
      trainembVersionDir: String): Option[Seq[(Int, Seq[Double])]] = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(trainembVersionDir, SemCodebookName)
    if (!java.nio.file.Files.isDirectory(dir)) None
    else {
      val s = java.nio.file.Files.list(dir)
      val parts =
        try s.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".parquet")).toSeq
        finally s.close()
      // bounded model state: k ≤ IvfCells codebook rows (the
      // IvfIndex.loadCodebook collect pattern)
      Some(spark.read.parquet(parts: _*).collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1))
        .sortBy(_._1).toSeq)
    }
  }

  /** Build the store from scratch: one [[QualityOps.manifestStateOn]]
    * pass, each relation as the base epoch of its table. The
    * `trainemb` base is stored CELL-PARTITIONED under a codebook
    * trained here (staged as a version-scoped sidecar), so the
    * semantic delta arm of every later append PROBES the stored
    * cells under dynamic partition pruning instead of scanning every
    * resident embedding ([[QualityOps.SemanticIndex]]).
    */
  def build(docs: DataFrame, emb: DataFrame, path: String,
            chunks: Option[DataFrame] = None,
            signals: Option[DataFrame] = None): String = {
    val st = QualityOps.manifestStateOn(docs, emb, chunks, signals)
    val base = Map(
      "quality" -> st.quality,
      "contam" -> st.contam.withColumn("seq", lit(0L)),
      "trainsh8" -> st.trainSh8, "benchsh8" -> st.benchSh8,
      "trainchunks" -> st.trainChunks, "evalchunks" -> st.evalChunks,
      "trainemb" -> st.trainEmb, "evalemb" -> st.evalEmb)
    val cb = QualityOps.semCodebookOf(st.trainEmb)
    Tables.foreach {
      case "trainemb" if cb.nonEmpty =>
        EpochStore.create(s"$path/trainemb", rebuild = true) { dir =>
          val verDir = dir.stripSuffix("/epoch=base")
          import st.trainEmb.sparkSession.implicits._
          cb.toDF("c_id", "c_emb").coalesce(1)
            .write.mode("overwrite").parquet(s"$verDir/$SemCodebookName")
          QualityOps.assignSemCells(st.trainEmb, cb)
            .write.mode("overwrite").partitionBy("cell").parquet(dir)
        }
      case t =>
        EpochStore.create(s"$path/$t", rebuild = true) { dir =>
          base(t).write.mode("overwrite").parquet(dir)
        }
    }
    path
  }

  /** The resolved [[QualityOps.ManifestState]] view, optionally
    * excluding in-flight epoch ids (the redelivery trick). One pinned
    * snapshot across all eight tables.
    */
  private[graft] def stateView(spark: SparkSession, path: String,
      excludeIds: Set[Long] = Set.empty,
      nprobe: Int = Similarity.IvfCells): QualityOps.ManifestState = {
    val snap = EpochStore.snapshot(Tables.map(t => s"$path/$t"))
    def raw(t: String) = {
      val r = snap.read(spark, s"$path/$t")
      if (excludeIds.isEmpty) r
      else r.filter(!col("epoch").isin(excludeIds.map(_.toString).toSeq: _*))
    }
    val semIx = loadSemCodebook(spark, snap.dir(s"$path/trainemb"))
      .map { cb =>
        QualityOps.SemanticIndex(
          raw("trainemb")
            .select(col("cell"), col("vec_id"), col("embedding")),
          cb, nprobe)
      }
    val contam = raw("contam")
      .groupBy(col("doc_id"))
      .agg(max(struct(col("seq"), col("n_bench_docs"), col("max_eval_cos"),
        col("n_chunks"), col("n_shared"))).as("s"))
      .select(col("doc_id"), col("s.n_bench_docs").as("n_bench_docs"),
        col("s.max_eval_cos").as("max_eval_cos"),
        col("s.n_chunks").as("n_chunks"), col("s.n_shared").as("n_shared"))
    QualityOps.ManifestState(
      quality = raw("quality")
        .select(col("doc_id"), col("q_v"), col("n_tokens")),
      contam = contam,
      trainSh8 = raw("trainsh8").select(col("doc_id"), col("sh")),
      benchSh8 = raw("benchsh8").select(col("bench_id"), col("sh")),
      trainChunks = raw("trainchunks")
        .select(col("doc_id"), col("chunk_str")),
      evalChunks = raw("evalchunks").select(col("chunk_str")),
      trainEmb = raw("trainemb").select(col("vec_id"), col("embedding")),
      evalEmb = raw("evalemb").select(col("e_emb")),
      semIndex = semIx)
  }

  /** Append one ingest batch (docs + the same id slice of the
    * embeddings) as epoch `id`. Replay-idempotent and crash-healing:
    * see the object doc.
    */
  def appendEpoch(batch: DataFrame, batchEmb: DataFrame, path: String,
                  id: Long): Unit = {
    val spark = batch.sparkSession
    if (Tables.forall(t => EpochStore.committed(s"$path/$t", id)))
      return // full replay — storage-level no-op
    val state = stateView(spark, path, excludeIds = Set(id))
    // append-only id contract (the ContainmentStore guard): a
    // re-ingested doc would duplicate its append-only rows and
    // double-count every contamination probe
    val overlap = state.quality
      .join(broadcast(batch.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .limit(1).count()
    if (overlap > 0)
      throw new IllegalArgumentException(
        s"ManifestStore at $path: append batch contains doc_id(s) " +
          "already resident — component tables are append-only (only " +
          "contamination rows mutate, and only via delta probes); " +
          "appends must carry NEW ids only")
    val seqRow = EpochStore.read(spark, s"$path/contam")
      .filter(col("epoch") =!= id.toString)
      .agg(max(col("seq"))).head()
    val seqNext = (if (seqRow.isNullAt(0)) 0L else seqRow.getLong(0)) + 1L
    val d = QualityOps.manifestDelta(state, batch, batchEmb)
    // the batch's train vectors join the probed layout under the
    // STORED codebook (the q154 production contract: daily arrivals
    // are assigned under yesterday's codebook; staleness is a rebuild
    // cadence knob, not a correctness one — probes use the same
    // stored codebook, so assignment and probe cannot drift)
    val storedCb = loadSemCodebook(spark,
      EpochStore.liveDir(s"$path/trainemb"))
    val trainEmbDelta = storedCb match {
      case Some(cb) => QualityOps.assignSemCells(d.trainEmb, cb)
      case None => d.trainEmb
    }
    val deltas = Map(
      "quality" -> d.quality,
      "contam" -> d.contamChanged.unionByName(d.contamBatch)
        .withColumn("seq", lit(seqNext)),
      "trainsh8" -> d.trainSh8, "benchsh8" -> d.benchSh8,
      "trainchunks" -> d.trainChunks, "evalchunks" -> d.evalChunks,
      "trainemb" -> trainEmbDelta, "evalemb" -> d.evalEmb)
    // materialize every delta BEFORE the first commit mutates the
    // stores the delta plans read (the ContainmentStore rule)
    val staged = deltas.map { case (t, df) => t -> df.localCheckpoint(true) }
    Tables.foreach { t =>
      EpochStore.commitEpoch(s"$path/$t", id) { tmp =>
        val w = staged(t).write.mode("overwrite")
        (if (t == "trainemb" && storedCb.isDefined) w.partitionBy("cell")
         else w).parquet(tmp)
      }
    }
  }

  /** Ad-hoc batch append: id from the LAGGING table, so a crashed
    * half-commit is completed (reads exclude the in-flight id, so the
    * recomputed deltas are identical) before new ids are minted.
    */
  def append(batch: DataFrame, batchEmb: DataFrame, path: String): Unit = {
    val id = Tables.map(t => EpochStore.nextAppendEpochId(s"$path/$t")).min
    appendEpoch(batch, batchEmb, path, id)
  }

  /** The shipped manifest served from the store: fold precedence
    * against the dedup / containment verdict tables (in production:
    * [[VerdictStore.read]] and [[ContainmentStore.read]] views) and
    * derive packing — all doc-keyed (the q157 read shape).
    */
  def manifest(spark: SparkSession, path: String,
               dedup: DataFrame, contained: DataFrame): DataFrame =
    QualityOps.manifestFrom(stateView(spark, path), dedup, contained)

  /** Fold every table to its resolved rows (contam to LWW winners —
    * the GC of superseded component rows; append-only tables
    * concatenate). Refuses over a half-committed append.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val sets = Tables.map(t => t -> EpochStore.committedIds(s"$path/$t"))
    if (sets.map(_._2).distinct.size != 1)
      throw new IllegalStateException(
        s"ManifestStore at $path has diverged epoch sets (" +
          sets.map { case (t, s) =>
            s"$t=${s.toSeq.sorted.mkString(",")}"
          }.mkString("; ") +
          ") — a half-committed append; heal via the appender's retry " +
          "before compacting")
    val st = stateView(spark, path)
    val seqRow = EpochStore.read(spark, s"$path/contam")
      .agg(max(col("seq"))).head()
    val seqKeep = if (seqRow.isNullAt(0)) 0L else seqRow.getLong(0)
    val folded = Map(
      "quality" -> st.quality,
      "contam" -> st.contam.withColumn("seq", lit(seqKeep)),
      "trainsh8" -> st.trainSh8, "benchsh8" -> st.benchSh8,
      "trainchunks" -> st.trainChunks, "evalchunks" -> st.evalChunks,
      // the fold keeps the stored cell assignment (values unchanged,
      // no reassignment) so the probe layout and its codebook survive
      "trainemb" -> st.semIndex.map(_.cells).getOrElse(st.trainEmb),
      "evalemb" -> st.evalEmb)
      .map { case (t, df) => t -> df.localCheckpoint(true) }
    Tables.foreach { t =>
      EpochStore.create(s"$path/$t", rebuild = true) { dir =>
        if (t == "trainemb" && st.semIndex.isDefined) {
          val verDir = dir.stripSuffix("/epoch=base")
          import spark.implicits._
          st.semIndex.get.codebook.toDF("c_id", "c_emb").coalesce(1)
            .write.mode("overwrite").parquet(s"$verDir/$SemCodebookName")
          folded(t).write.mode("overwrite").partitionBy("cell").parquet(dir)
        } else folded(t).write.mode("overwrite").parquet(dir)
      }
    }
  }

  /** Compaction policy: fold only past `maxEpochs` committed epochs
    * on any table (the listing-cost bound).
    */
  def compactIfFragmented(spark: SparkSession, path: String,
                          maxEpochs: Int = 64): Boolean = {
    val fragmented =
      Tables.exists(t => EpochStore.epochCount(s"$path/$t") > maxEpochs)
    if (fragmented) compact(spark, path)
    fragmented
  }

  final case class MaintenanceReport(compacted: Boolean,
                                     diverged: Boolean,
                                     epochs: Map[String, Int],
                                     nTrainDocs: Long,
                                     supersededFrac: Double)

  /** One maintenance tick — the cron body, mirroring the other
    * stores: report a half-committed append first (touch nothing),
    * else apply the compaction policy, then one census: train docs
    * under management and the superseded-row fraction of the one
    * mutable table (the LWW GC debt `compact` would clear). A
    * diverged census reads the converged epoch-set intersection (the
    * ContainmentStore round-10 ADVICE fix, inherited).
    */
  def maintain(spark: SparkSession, path: String,
               maxEpochs: Int = 64): MaintenanceReport = {
    val idSets = Tables.map(t => EpochStore.committedIds(s"$path/$t"))
    val diverged = idSets.distinct.size != 1
    val compacted = !diverged && compactIfFragmented(spark, path, maxEpochs)
    val dangling =
      if (!diverged) Set.empty[Long]
      else idSets.reduce(_ union _) diff idSets.reduce(_ intersect _)
    val st = stateView(spark, path, excludeIds = dangling)
    val nTrain = st.contam.count()
    val rawContam = {
      val r = EpochStore.read(spark, s"$path/contam")
      (if (dangling.isEmpty) r
       else r.filter(!col("epoch").isin(dangling.map(_.toString).toSeq: _*)))
        .count()
    }
    MaintenanceReport(
      compacted = compacted,
      diverged = diverged,
      epochs = Tables.map(t =>
        t -> EpochStore.epochCount(s"$path/$t")).toMap,
      nTrainDocs = nTrain,
      supersededFrac =
        if (rawContam == 0) 0.0 else 1.0 - nTrain.toDouble / rawContam)
  }
}
