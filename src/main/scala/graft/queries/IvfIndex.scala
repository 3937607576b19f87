package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Persisted IVF index — the build-once / query-many form of q64's
  * search (reference capability: similarity search over the
  * embeddings table; SURVEY §2.9). The round-3 crossover analysis
  * showed WHY this exists: at 1% ad-hoc query volume the index build
  * can never amortize (q60's brute force wins), so the index must be
  * BUILT ONCE and stored. Layout:
  *
  *   <path>/cells/v<N>/_codebook/  (c_id, c_emb) — k rows,
  *     driver-small, a version-scoped SIDECAR: the codebook lives
  *     inside the cells store's manifest version (round 9), so a
  *     rebuild flips codebook and assignments with ONE atomic
  *     manifest rename — no window where a new codebook describes
  *     old assignments (the `_` prefix hides it from Spark's data
  *     discovery; [[graft.engine.EpochStore.compact]] carries it
  *     into each compacted version)
  *   <path>/cells/v<N>/epoch=<e>/cell=<c>/
  *     (vec_id, embedding, scale, code, pq0..pq7)
  *     — epoch = the storage exactly-once unit ("base" for the
  *       build, the batchId for each streamed append), cell = the
  *       probe-pruning partition column; scale/code = the row's q89
  *       int8 quantization, written at assign time so the SQ search
  *       path (q147) scans codes instead of vectors; pq0..7 = the
  *       6-byte ADC code (round 13 — q166's scan reads only these),
  *       computed on the raw subvectors or, in a `residualPq` store
  *       (round 15), on v − c_cell — the mode rides the
  *       `_pqcodebook` sidecar's `residual` column
  *
  * Partitioning by cell is the scale design: a query probing nprobe
  * cells reads only those partition directories. The probe-side join
  * is a broadcast of (query, cell) pairs, which Spark turns into
  * DYNAMIC PARTITION PRUNING on the cell column — the scan plans
  * only the probed partitions, verified structurally in
  * SimilaritySpec (the plan carries a dynamicpruning subquery), so
  * at 100 TB a 7-probe query touches ~7/k of the corpus bytes.
  *
  * Determinism: the codebook is [[Similarity.kmeansCodebook]]
  * (decimal-summed means, sorted collect), so build → query equals
  * the in-memory q64 plan bit-for-bit.
  */
object IvfIndex {

  /** `residualPq = true` (round 15) trains the PQ books on the CELL
    * RESIDUALS v − c_cell and codes every row (build and appends
    * alike) on its residual — q171's formulation persisted: the code
    * space spends its 64 ids per subspace on within-cell geometry.
    * The mode travels as a `residual` column on the pq-codebook
    * sidecar (absent = raw, the pre-round-15 layout), so
    * [[pqQuery]]/[[appendEpoch]]/[[rebuildIfStale]] always score,
    * code and re-train under the store's own mode. The stored row
    * shape is IDENTICAL to the raw tier (cell, vec_id, pq0..7 —
    * |recon| derives from (cell, code) via
    * [[Similarity.residNormTables]] below
    * [[Similarity.CodebookLiteralMaxCells]], else from the
    * `_pqnorms` sidecar this build persists (round 16) — never a
    * per-row stored float), so the ADC scan's byte cut is unchanged.
    */
  def build(emb: DataFrame, path: String,
            k: Int = Similarity.IvfCells,
            lloydIters: Int = Similarity.IvfLloydIters,
            residualPq: Boolean = false): Unit = {
    val spark = emb.sparkSession
    val cents = Similarity.kmeansCodebook(emb, lloydIters, k)
    val trainRel =
      if (residualPq)
        // pinned once: the book build's jobs would otherwise re-run
        // the probe + subtraction lineage per Lloyd round
        Similarity.residualsUnder(emb, cents).localCheckpoint(true)
      else emb.select(col("vec_id"),
        graft.functions.Vectors.asDouble(col("embedding")).as("v"))
    val books = Similarity.pqCodebooks(trainRel)
    import spark.implicits._
    // the base build is epoch "base" of a versioned EpochStore;
    // streamed arrivals land as sibling epoch=<batchId> dirs (see
    // [[appendEpoch]]) — epoch is the exactly-once unit, cell below
    // it stays the pruning column, and [[compact]] folds epochs back
    // into one base under a manifest flip. The codebook is staged
    // INSIDE the same version dir, so on a rebuild the (codebook,
    // assignments) pair becomes visible in one manifest rename —
    // writing it beside the store would leave a crash window where
    // a fresh codebook describes the previous version's cells. The
    // PQ subspace codebooks (round 13 — the 6-byte ADC scan tier,
    // q166) ride the same version dir for the same reason: one
    // rename flips (codebook, pq codebooks, assignments) together.
    graft.engine.EpochStore.create(s"$path/cells", rebuild = true) { base =>
      val verDir = base.stripSuffix("/epoch=base")
      cents.toDF("c_id", "c_emb").coalesce(1)
        .write.mode("overwrite").parquet(s"$verDir/$CodebookName")
      books.zipWithIndex
        .flatMap { case (b, s) => b.map { case (id, c) => (s, id, c) } }
        .toDF("sub", "c_id", "c_emb")
        // the mode column rides the sidecar (positional reads below
        // stay valid; its absence = raw, the pre-round-15 layout)
        .withColumn("residual", lit(residualPq))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$verDir/$PqCodebookName")
      // residual stores also persist the (cell, nsq[sub][code]) norm
      // tables (round 16): |recon| is cell-DEPENDENT there, and past
      // CodebookLiteralMaxCells the serving path joins these as a
      // broadcast relation instead of folding k×8×64 plan literals —
      // built once here, riding the same manifest flip as the books
      // they derive from, so a rebuild can never leave norms that
      // describe a different codebook
      if (residualPq)
        Similarity.residNormRel(spark, cents, books)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$verDir/$PqNormsName")
      assign(emb, cents, Some(books), residualPq)
        .write.mode("overwrite").partitionBy("cell").parquet(base)
    }
  }

  private val CodebookName = "_codebook"
  private val PqCodebookName = "_pqcodebook"
  private val PqNormsName = "_pqnorms"

  /** Fold all committed cell epochs into one base (new manifest
    * version; readers and replays stay safe — see
    * [[graft.engine.EpochStore.compact]]). The cell partitioning is
    * re-applied so probe-side dynamic partition pruning keeps its
    * layout.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    graft.engine.EpochStore.compact(spark, s"$path/cells", Seq("cell"),
      carryExtras = Seq(CodebookName, PqCodebookName, PqNormsName),
      transform = graft.engine.Tombstones.exclude(_, path, "vec_id"))
    graft.engine.Tombstones.clear(spark, path)
  }

  /** [[compact]] only past `maxEpochs` committed epochs — the policy
    * form for a maintenance cron ([[graft.engine.EpochStore.compactIfFragmented]]).
    * Returns true iff a fold ran.
    */
  def compactIfFragmented(spark: SparkSession, path: String,
                          maxEpochs: Int = 64): Boolean = {
    val should =
      graft.engine.EpochStore.epochCount(s"$path/cells") > maxEpochs ||
        graft.engine.Tombstones.pending(spark, path)
    if (should) compact(spark, path)
    should
  }

  /** Nearest-cell assignment of (`vec_id`, `embedding`) rows under a
    * given codebook — [[Similarity.probeCells]] at nprobe=1, exposed
    * so consumers (and the parity spec) can reproduce exactly what
    * [[build]]/[[appendStream]] store. Round 9: each stored row also
    * carries its q89 int8 quantization (`code` + `scale`) computed
    * at WRITE time — the scan-side 4× byte cut for the SQ search
    * path (q147): the approximate scoring pass reads only the
    * bit-packed code column and column pruning never touches the
    * float vectors; `scale` makes the codes reconstructible for
    * non-cosine metrics.
    */
  def assign(vectors: DataFrame,
             cents: Seq[(Int, Seq[Double])],
             books: Option[Seq[Seq[(Int, Seq[Double])]]] = None,
             residualPq: Boolean = false,
             maxLitCells: Int = Similarity.CodebookLiteralMaxCells): DataFrame = {
    val base = Similarity.probeCells(
      vectors.select(col("vec_id"), col("embedding")),
      Seq("vec_id", "embedding"), "embedding", cents, 1)
      .withColumn("scale", Vectors.quantScale(col("embedding")))
      .withColumn("code", Vectors.quantizeInt8(col("embedding")))
    books.fold(base) { bs =>
      // round 13: each stored row also carries its 6-byte PQ code
      // (one small int per subspace, written at assign time under
      // the STORED subspace codebooks — the same staleness contract
      // as the cell assignment). The ADC search path (q166) scans
      // only (cell, vec_id, pq0..7): ~6 bytes of quantizer payload
      // per row against SQ's 64. A residual store codes the row's
      // offset from its assigned centroid instead (round 15) —
      // same columns, same bytes; the subtraction dispatches on
      // codebook size ([[Similarity.subtractCell]]) so a large-k
      // residual build never folds k×dim plan literals.
      if (residualPq) {
        val withRv = Similarity.subtractCell(
          base.withColumn("v", Vectors.asDouble(col("embedding"))),
          "v", cents, "rv", maxLitCells)
        withRv.select(base.columns.map(col) ++
          Similarity.pqCodeCols(col("rv"), bs): _*)
      } else
        base.select(col("*") +:
          Similarity.pqCodeCols(Vectors.asDouble(col("embedding")), bs): _*)
    }
  }

  /** The stored codebook, sorted — model state, k×dim small.
    * Resolved through the cells manifest (the codebook is a
    * version-scoped sidecar), so a reader always gets the codebook
    * that produced the assignments it is about to scan. The part
    * FILES are listed and passed explicitly: the sidecar dir is
    * `_`-prefixed (hidden from the cells scan's file discovery), and
    * handing a hidden dir to `spark.read` as the root trips the
    * hidden-path filter's warning path — the part files themselves
    * are ordinary names.
    */
  def loadCodebook(spark: SparkSession, path: String): Seq[(Int, Seq[Double])] = {
    val parts = sidecarParts(path, CodebookName).getOrElse(
      throw new IllegalStateException(
        s"IvfIndex at $path has no $CodebookName sidecar in its live " +
          "version — rebuild required: this is a pre-sidecar index " +
          "layout (codebook beside the store, cells rows without the " +
          "code/scale SQ columns) or a corrupted store. Re-run " +
          "IvfIndex.build over the corpus to migrate."))
    spark.read.parquet(parts: _*)
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .sortBy(_._1).toSeq
  }

  /** Part files of a `_`-prefixed version-scoped sidecar dir in the
    * LIVE cells version, or None if the sidecar is absent. Listed
    * explicitly because a hidden dir handed to `spark.read` as the
    * root trips the hidden-path filter — the part files themselves
    * are ordinary names.
    */
  private def sidecarParts(path: String, name: String): Option[Seq[String]] = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(
      graft.engine.EpochStore.liveDir(s"$path/cells"), name)
    if (!java.nio.file.Files.isDirectory(dir)) return None
    val s = java.nio.file.Files.list(dir)
    try Some(s.iterator().asScala.map(_.toString)
      .filter(_.endsWith(".parquet")).toSeq)
    finally s.close()
  }

  private def missingPqSidecar(path: String): Nothing =
    throw new IllegalStateException(
      s"IvfIndex at $path has no $PqCodebookName sidecar in its live " +
        "version — this is a pre-round-13 index layout (cells rows " +
        "without the pq0..7 ADC columns). The exact float path " +
        "(query) and the SQ path (sqQuery) remain servable from this " +
        "store, but pqQuery AND appends (appendEpoch/appendStream, " +
        "which code arrivals through these books) are blocked until " +
        "IvfIndex.build re-runs over the corpus to migrate the layout.")

  /** The stored PQ subspace codebooks, sub-major then c_id-sorted —
    * model state, subspaces×k×subdim small, resolved through the
    * cells manifest like [[loadCodebook]] (same version-scoped
    * sidecar discipline, same hidden-dir part-file listing).
    */
  def loadPqCodebooks(spark: SparkSession,
                      path: String): Seq[Seq[(Int, Seq[Double])]] =
    loadPqCodebooksWithMode(spark, path)._1

  /** Books AND coding mode in ONE sidecar read — every serving/append
    * path needs both, and reading them separately cost a directory
    * listing plus a parquet job each (per micro-batch, through
    * [[appendEpoch]]). The mode rides the sidecar's `residual` column
    * (absent = raw, the pre-round-15 layout).
    */
  def loadPqCodebooksWithMode(spark: SparkSession,
      path: String): (Seq[Seq[(Int, Seq[Double])]], Boolean) = {
    val parts = sidecarParts(path, PqCodebookName)
      .getOrElse(missingPqSidecar(path))
    val df = spark.read.parquet(parts: _*)
    val hasMode = df.columns.contains("residual")
    val rows = df.collect()
    val books = (0 until Similarity.PqSubspaces).map { sub =>
      rows.filter(_.getInt(0) == sub)
        .map(r => r.getInt(1) -> r.getSeq[Double](2)).sortBy(_._1).toSeq
    }
    val residual = hasMode && rows.headOption.exists(
      r => r.getBoolean(r.fieldIndex("residual")))
    (books, residual)
  }

  /** Whether the stored PQ books were trained on CELL RESIDUALS
    * (round 15) — the mode half of [[loadPqCodebooksWithMode]] for
    * callers that need no books ([[rebuildIfStale]]); a missing
    * sidecar (pre-round-13 layout) is a raw-subspace store. Every
    * path that scores, codes or re-trains consults this, so one
    * store never mixes the two formulations.
    */
  def pqResidualMode(spark: SparkSession, path: String): Boolean =
    sidecarParts(path, PqCodebookName).exists { parts =>
      val df = spark.read.parquet(parts: _*)
      df.columns.contains("residual") &&
        df.select(col("residual")).head().getBoolean(0)
    }

  /** The persisted residual norm tables (cell, nsq[sub][code]) — the
    * round-16 sidecar a residual store's large-k serving joins
    * against ([[pqQuery]]); None on a pre-round-16 residual store,
    * whose norms derive on the fly from (codebook, books) via
    * [[Similarity.residNormRel]] — same values (both are the same
    * expression over the same model state), just recomputed.
    */
  def loadPqNorms(spark: SparkSession, path: String): Option[DataFrame] =
    sidecarParts(path, PqNormsName).map(parts =>
      spark.read.parquet(parts: _*))

  /** Content fingerprint of the LIVE codebook sidecar — md5 over its
    * part-file bytes (names sorted, bytes concatenated). Stable
    * across maintenance compactions ([[compact]] carries the sidecar
    * into the next version byte-identically) and changes exactly when
    * a rebuild stages different codebook bytes — the cheap
    * driver-side identity a long-lived codebook pin (the streaming
    * appender's once-per-stream load) re-checks each batch to detect
    * an out-of-band rebuild instead of silently assigning arrivals
    * under a codebook the store no longer uses.
    */
  def codebookFingerprint(path: String): String = {
    val parts = sidecarParts(path, CodebookName).getOrElse(
      throw new IllegalStateException(
        s"IvfIndex at $path has no $CodebookName sidecar in its live " +
          "version — rebuild required (see loadCodebook).")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach { p =>
      md.update(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Streaming index maintenance — the growing-corpus path: each
    * micro-batch of new vectors (`vec_id`, `embedding`) is assigned
    * with the STORED codebook and appended to the cell-partitioned
    * layout, so the index absorbs daily arrivals without a rebuild.
    * Appends are per-partition parquet file adds (no rewrite of
    * existing cells). Codebook staleness is the documented IVF
    * tradeoff: assignments stay self-consistent because search
    * probes with the same stored codebook; the rebuild cadence (re-
    * running [[build]]) is an operational knob, not a correctness
    * one — and q144 (the index-health audit in
    * [[Similarity.queries]]) makes the knob measurable: per-cell
    * size skew and centroid cohesion off the stored index tell an
    * operator when drift warrants the rebuild.
    * Exactly-once per micro-batch is STORAGE-level: each batch
    * lands as its own `epoch=<batchId>` directory via
    * [[appendEpoch]] — staged fully, then one atomic dir rename —
    * so a redelivered batchId finds its epoch already present and
    * is a no-op (StreamingSpec pins the identical-file-set
    * contract). Consequence (same as the histRollup marker): one
    * stream LINEAGE owns an index — a fresh checkpoint restarts
    * batchIds at 0, which the store would treat as replays.
    */
  def appendStream(vectors: DataFrame, path: String,
                   checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // load once at stream start: the codebook is immutable for the
    // index lifetime (rebuilding while appending is already unsafe),
    // so re-reading it per micro-batch would add a driver-side job
    // per batch for identical data; the PQ books are pinned with it
    val cents = loadCodebook(vectors.sparkSession, path)
    val (books, residual) =
      loadPqCodebooksWithMode(vectors.sparkSession, path)
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendEpoch(batch, cents, path, batchId, Some(books),
          Some(residual))
      }
      .start()
  }

  /** Append one micro-batch as the `epoch=<batchId>` directory of the
    * cells store: stage the assigned, cell-partitioned output under a
    * tmp dir, then ONE atomic rename into place. Replay-idempotent by
    * NAMING, not by marker: a redelivered batchId sees its epoch dir
    * already committed and does nothing, and a crash mid-stage leaves
    * only a tmp (overwritten on retry) — the file set after any
    * number of replays equals the file set after one delivery.
    */
  private[graft] def appendEpoch(batch: DataFrame,
                                   cents: Seq[(Int, Seq[Double])],
                                   path: String, batchId: Long,
                                   books: Option[Seq[Seq[(Int, Seq[Double])]]] = None,
                                   residual: Option[Boolean] = None): Unit = {
    // replay no-op BEFORE the tombstone guard (the MinHashIndex
    // ordering rationale): a redelivered append+forget day must
    // converge, not wedge on its own same-day tombstones
    if (graft.engine.EpochStore.committed(s"$path/cells", batchId))
      return // full replay — storage-level no-op
    graft.engine.Tombstones.requireNotTombstoned(batch.sparkSession,
      path, batch.select("vec_id"), "IvfIndex")
    // callers that hold only the cell codebook (the pre-round-13
    // signature) get the STORED PQ books + coding MODE (raw vs
    // residual subvectors) loaded here in ONE sidecar read — small
    // model state per append, and by construction exactly the books
    // the store's resident codes were written under; the streaming
    // appender pins both once per stream and passes them in, so a
    // micro-batch costs zero sidecar jobs.
    val (bs, rs) = books match {
      case Some(b) => (b, residual.getOrElse(
        pqResidualMode(batch.sparkSession, path)))
      case None =>
        val (b, r) = loadPqCodebooksWithMode(batch.sparkSession, path)
        (b, residual.getOrElse(r))
    }
    graft.engine.EpochStore.commitEpoch(s"$path/cells", batchId) { tmp =>
      assign(batch, cents, Some(bs), rs)
        .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    }
  }

  /** Forget vectors (right-to-be-forgotten): one tombstone epoch;
    * every search path ([[query]], [[sqQuery]], [[pqQuery]]) and
    * [[health]] exclude the set immediately, and the next purge
    * point — [[compact]], or any rebuild ([[rebuildIfStale]] retrains
    * from the EXCLUDED rows) — drops the rows physically. The
    * codebooks (cell + PQ) are bounded aggregates retaining no row;
    * the health-driven rebuild cadence is the documented re-training
    * path ([[graft.engine.Tombstones]]'s unlearning note).
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame): Unit =
    graft.engine.Tombstones.forget(spark, path, ids): Unit

  /** The stored cell rows minus any forgotten vectors — the serving
    * relation every search path reads.
    */
  private def storedRows(spark: SparkSession, path: String): DataFrame =
    graft.engine.Tombstones.exclude(
      graft.engine.EpochStore.read(spark, s"$path/cells"),
      path, "vec_id")

  /** Per-cell health metrics off the stored index alone (q144's
    * body): member count, skew (n·k/total — 1.0 is perfectly
    * balanced; a probe of a skew-4 cell reads 4× its share of
    * bytes), and mean member-to-own-centroid cosine (drifting corpus
    * → falling cohesion). One scan of the stored cells, the k-row
    * codebook broadcast, one cell-keyed aggregate, one 1-row total
    * broadcast — the raw corpus is never touched. Mean cohesion
    * follows q126's determinism rule: 6dp-round each cosine,
    * decimal-sum, divide once in double, surface 4dp.
    */
  def health(spark: SparkSession, path: String): DataFrame = {
    val cents = loadCodebook(spark, path)
    import spark.implicits._
    val cb = cents.toDF("cell", "c_emb")
    val k = cents.size
    val stored = storedRows(spark, path)
      .select(col("cell").cast("int").as("cell"), col("embedding"))
    val perCell = stored.join(broadcast(cb), Seq("cell"))
      .select(col("cell"),
        round(Vectors.cosine(col("embedding"), col("c_emb")), 6)
          .as("cos6"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        (sum(col("cos6").cast("decimal(38,6)")).cast("double")
          / count(lit(1))).as("mc"))
    val tot = perCell.agg(sum(col("n_vectors")).as("total"))
    perCell.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vectors"),
        ((col("n_vectors") * k).cast("double") / col("total"))
          .as("skew"),
        round(col("mc"), 4).as("mean_cos_centroid"))
      .orderBy(col("cell"))
  }

  /** Health-DRIVEN rebuild — closes the loop q144 left open: the
    * audit made codebook staleness measurable; this acts on it.
    * Stale iff max cell skew exceeds `maxSkew` (the documented
    * operational rule: a probe of a skew-4 cell reads 4× its byte
    * share) OR the mean cohesion of any HEAVY cell (skew ≥ 1 — a
    * cell carrying at least its share; tiny cells have noisy means)
    * falls below `minCohesion`. On stale: the codebook is re-learned
    * from the STORED vectors (one scan of the cells store, never the
    * raw corpus) and the whole index rewrites via [[build]] — one
    * atomic manifest flip covering codebook + assignments, committed
    * epoch ledger carried forward so surviving stream checkpoints
    * stay replay-safe ([[graft.engine.EpochStore.create]]).
    *
    * Single-maintenance-writer contract (same as [[compact]]): call
    * between micro-batches or with the append stream stopped.
    * Returns true iff a rebuild ran; a healthy index is a pure-read
    * no-op (manifest untouched — IvfIndexSpec pins both paths).
    */
  def rebuildIfStale(spark: SparkSession, path: String,
                     maxSkew: Double = 4.0,
                     minCohesion: Double = 0.0,
                     k: Int = Similarity.IvfCells,
                     lloydIters: Int = Similarity.IvfLloydIters): Boolean = {
    val (worstSkew, worstCohesion) = healthAgg(spark, path)
    rebuildIfStale0(spark, path, worstSkew, worstCohesion,
      maxSkew, minCohesion, k, lloydIters)
  }

  /** One full-store [[health]] pass reduced to the two staleness
    * observables: (max skew, min heavy-cell cohesion) — None on an
    * empty store (no rows → both aggregates null). Shared by
    * [[rebuildIfStale]] and [[maintain]] so a tick costs one scan,
    * not two.
    */
  private def healthAgg(spark: SparkSession,
                        path: String): (Option[Double], Option[Double]) = {
    val row = health(spark, path)
      .agg(max(col("skew")).as("worst_skew"),
        min(when(col("skew") >= 1.0, col("mean_cos_centroid")))
          .as("worst_heavy_cohesion"))
      .head()
    (if (row.isNullAt(0)) None else Some(row.getDouble(0)),
     if (row.isNullAt(1)) None else Some(row.getDouble(1)))
  }

  private def rebuildIfStale0(spark: SparkSession, path: String,
                              worstSkew: Option[Double],
                              worstCohesion: Option[Double],
                              maxSkew: Double, minCohesion: Double,
                              k: Int, lloydIters: Int): Boolean = {
    val stale = worstSkew.exists(_ > maxSkew) ||
      worstCohesion.exists(_ < minCohesion)
    if (stale) {
      // a rebuild is a physical rewrite — the natural purge point:
      // retrain and rewrite from the EXCLUDED rows, then reset the
      // tombstone table (ledger carried). The PQ coding MODE is the
      // store's own — a residual store rebuilds residual.
      val residual = pqResidualMode(spark, path)
      val vecs = storedRows(spark, path)
        .select(col("vec_id"), col("embedding"))
      build(vecs, path, k, lloydIters, residual)
      graft.engine.Tombstones.clear(spark, path)
    }
    stale
  }

  /** What one [[maintain]] tick did and saw: whether a rebuild ran
    * (health thresholds crossed), whether a fold ran (epoch count
    * past the bound), and the post-tick observables an operator
    * would alert on.
    */
  final case class MaintenanceReport(rebuilt: Boolean,
                                     compacted: Boolean,
                                     epochs: Int,
                                     maxSkew: Double,
                                     maxCodeFrac: Double)

  /** One maintenance TICK — the documented cron body now that both
    * policies exist (round-9 §7.1 item): first [[rebuildIfStale]]
    * (health-driven; a rebuild rewrites the store into one base
    * epoch, so compaction after a rebuild is definitionally a
    * no-op), then [[compactIfFragmented]] (listing-cost bound). A
    * healthy, compact index is a pure-read no-op tick. Single-
    * maintenance-writer contract: run between micro-batches or with
    * the append stream stopped.
    *
    * The report is for ALERTING, not looping: an inherently skewed
    * corpus — a mass of identical/near-identical vectors — stays
    * above any skew threshold after every rebuild (k-means cannot
    * split identical points across cells), so a scheduler that
    * re-ticks on `rebuilt = true` would rebuild forever. Compare
    * `maxSkew` across ticks: unchanged after a rebuild means the
    * skew is the DATA (dedup it — q92/q148), not the codebook.
    */
  def maintain(spark: SparkSession, path: String,
               maxEpochs: Int = 64,
               maxSkew: Double = 4.0,
               minCohesion: Double = 0.0,
               k: Int = Similarity.IvfCells,
               lloydIters: Int = Similarity.IvfLloydIters): MaintenanceReport = {
    // one health scan decides staleness AND (when nothing rewrote the
    // store) feeds the report; only a rebuild changes the skew, so
    // only that branch pays a second scan. Compaction preserves rows
    // exactly — pre-tick skew is post-tick skew there. An EMPTY store
    // aggregates to null → NaN in the report, not an NPE.
    val (preSkew, preCohesion) = healthAgg(spark, path)
    val rebuilt = rebuildIfStale0(spark, path, preSkew, preCohesion,
      maxSkew, minCohesion, k, lloydIters)
    val compacted = !rebuilt &&
      compactIfFragmented(spark, path, maxEpochs)
    val skewNow =
      if (rebuilt) healthAgg(spark, path)._1 else preSkew
    MaintenanceReport(rebuilt, compacted,
      graft.engine.EpochStore.epochCount(s"$path/cells"),
      skewNow.getOrElse(Double.NaN),
      // post-tick truth (a rebuild recodes every row); reads ONLY
      // the 8 pq code columns — the ADC tier's byte argument
      pqMaxCellFrac(spark, path))
  }

  /** Worst per-subspace code crowding of the STORED codes: max over
    * subspaces of (largest single code's share of rows) — the
    * `max_cell_frac` health signal ([[pqHealth]]) reduced to the one
    * number [[pqRerankWidthFor]] consumes, measured from the 8 pq
    * code columns alone (no vectors, no books — a maintenance tick
    * pays code-histogram bytes only). NaN on an empty or pre-PQ
    * (round-13 layout) store → the width rule keeps the base.
    */
  def pqMaxCellFrac(spark: SparkSession, path: String): Double = {
    val m = Similarity.PqSubspaces
    val rows = storedRows(spark, path)
    if (!rows.columns.contains("pq0")) return Double.NaN
    val agg = rows
      .select(posexplode(array((0 until m).map(s =>
        col(s"pq$s")): _*)).as(Seq("sub", "code")))
      .groupBy(col("sub"), col("code")).agg(count(lit(1)).as("n"))
      .groupBy(col("sub"))
      .agg((max(col("n")) / sum(col("n"))).as("frac"))
      .agg(max(col("frac")))
      .head()
    if (agg.isNullAt(0)) Double.NaN else agg.getDouble(0)
  }

  /** SQ (int8-code) approximate search + exact re-rank against a
    * built index — q147's body, parameterized. The approximate pass
    * scans ONLY (cell, vec_id, code) from the probed partitions
    * (column pruning never touches the float vectors — the ~4× byte
    * cut); approximate cosines 4dp-round before the candidate rank
    * (the round-before-rank rule), the top-`rerankWidth` candidates
    * per query fetch their true vectors for the exact re-rank.
    * Output: (query_id, neighbor_id, score, rk), rk ≤ `topK`.
    */
  def sqQuery(spark: SparkSession, path: String, queries: DataFrame,
              nprobe: Int = Similarity.IvfNProbe,
              topK: Int = 5,
              rerankWidth: Int = Similarity.SqRerankWidth): DataFrame = {
    import graft.functions.Vectors
    val cents = loadCodebook(spark, path)
    val qcells = Similarity.probeCells(queries,
      Seq("query_id", "q_emb"), "q_emb", cents, nprobe)
    val store = storedRows(spark, path)
    val codes = store.select(col("cell").cast("int").as("cell"),
      col("vec_id"), col("code").cast("array<double>").as("cd"))
    val approx = codes.join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(Vectors.cosine(col("cd"),
          col("q_emb").cast("array<double>")), 4).as("ascore"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("vec_id"))
    val cand = approx.withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= rerankWidth)
      .select(col("query_id"), col("vec_id"))
    val exact = cand
      .join(store.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosine(col("embedding"), col("q_emb")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    exact.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .orderBy(col("query_id"), col("rk"))
  }

  /** PQ-ADC approximate search + exact re-rank against a built index
    * — q166's body: the q147 chain one compression tier further. The
    * approximate pass scans ONLY (cell, vec_id, pq0..7) from the
    * probed partitions — neither the float vectors NOR the int8 SQ
    * codes are read, so the quantizer payload is ~6 bytes/row
    * (8 subspaces × 6 bits) against SQ's 64 and the raw vector's
    * 256. Scoring is the hoisted ADC decomposition (q165's): each
    * query's 8×64 partial-dot lookup tables + norm are built once
    * before the probe explode ([[Similarity.adcLut]]), |recon| is
    * one literal-lookup chain per stored row
    * ([[Similarity.pqReconNorm]]), and each (query × row) pair costs
    * 8 array lookups + adds ([[Similarity.adcScore]]). 4dp-rounds
    * before the candidate rank, then re-ranks the top `rerankWidth`
    * with exact cosines over the true vectors fetched for candidates
    * only.
    */
  def pqQuery(spark: SparkSession, path: String, queries: DataFrame,
              nprobe: Int = Similarity.IvfNProbe,
              topK: Int = 5,
              rerankWidth: Int = Similarity.PqRerankWidth,
              maxLitCells: Int = Similarity.CodebookLiteralMaxCells): DataFrame = {
    val cents = loadCodebook(spark, path)
    val (books, residual) = loadPqCodebooksWithMode(spark, path)
    val m = Similarity.PqSubspaces
    val q = queries.select(col("query_id"),
      Vectors.asDouble(col("q_emb")).as("qv"))
    val qlut = q.select(col("query_id") +: col("qv") +:
      Vectors.norm(col("qv")).as("qnorm") +:
      books.zipWithIndex.map { case (b, s) =>
        Similarity.adcLut(col("qv"), b, s).as(s"lut$s") }: _*)
    // residual stores need dot(q, c_cell) per probed cell (the
    // reconstruction's leading term) — computed here, once per
    // (query, cell), while qv is still in hand; cellDot carries
    // probeCells' literal-vs-broadcast size dispatch
    val qcells0 = Similarity.probeCells(qlut,
      Seq("query_id", "qv", "qnorm") ++ (0 until m).map(s => s"lut$s"),
      "qv", cents, nprobe)
    val qcells = (if (residual)
      Similarity.cellDot(qcells0, "qv", cents, "qcdot", maxLitCells)
    else qcells0)
      .drop("qv") // the ADC pass needs only the tables + norm
    val store = storedRows(spark, path)
    val pqCols = (0 until m).map(s => col(s"pq$s"))
    val luts = (0 until m).map(s => col(s"lut$s"))
    // |recon| per coded row: raw stores from book norms alone;
    // residual stores from the (cell, code) norm tables — neither
    // reads vectors, so the scan stays (cell, vec_id, pq0..7).
    // The norm tables dispatch on k like every cell-keyed lookup:
    // constant-folded literals below maxLitCells, else the persisted
    // `_pqnorms` sidecar (derived on the fly for a pre-round-16
    // residual store) joined in as a broadcast relation on the cell
    // key — k×8×64 doubles ride the broadcast, never the plan
    val codes0 = store.select(
      col("cell").cast("int").as("cell") +: col("vec_id") +: pqCols: _*)
    val codes =
      if (!residual)
        codes0.withColumn("rnorm", Similarity.pqReconNorm(books, pqCols))
      else if (cents.size <= maxLitCells)
        codes0.withColumn("rnorm", Similarity.residReconNormStored(
          Similarity.residNormTables(cents, books), col("cell"), pqCols))
      else {
        val norms = loadPqNorms(spark, path)
          .getOrElse(Similarity.residNormRel(spark, cents, books))
        codes0.join(broadcast(norms), Seq("cell"))
          .withColumn("rnorm", Similarity.residReconNormRel(pqCols))
          .drop("nsq")
      }
    val pairScore =
      if (residual)
        (col("qcdot") +: pqCols.zip(luts).map { case (cd, l) =>
          element_at(l, cd + 1) }).reduce(_ + _) /
          (col("qnorm") * col("rnorm"))
      else Similarity.adcScore(pqCols, luts, col("qnorm"), col("rnorm"))
    val approx = codes.join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(pairScore, 4).as("ascore"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("vec_id"))
    val cand = approx.withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= rerankWidth)
      .select(col("query_id"), col("vec_id"))
    val exact = cand
      .join(store.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosine(Vectors.asDouble(col("embedding")), col("qv"))
          .as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    exact.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Per-SUBSPACE health of the stored PQ books — q144's audit for
    * the ADC tier (q168's body): off the stored rows alone, each
    * subspace reports how many of its centroids are LIVE (codes in
    * use — dead cells mean wasted code space), the largest cell's
    * share (code skew: one hot code degrades ADC's ordering power
    * the way a hot IVF cell degrades probe cost), and the mean
    * subvector-to-coded-centroid cosine (reconstruction cohesion —
    * the staleness signal: drifting arrivals coded under old books
    * cohere worse, and the rebuild cadence is the re-training path).
    * One scan of (embedding, pq0..7); the books are model-sized
    * sidecar state. Determinism: 6dp-round each cosine, decimal-sum,
    * divide once, surface 4dp — q144/q126's rule.
    */
  def pqHealth(spark: SparkSession, path: String): DataFrame = {
    val (books, residual) = loadPqCodebooksWithMode(spark, path)
    val m = Similarity.PqSubspaces
    // cohesion must compare the vector the books actually CODE: a
    // residual store's books quantize v − c_cell, so its health
    // audits residual subvectors against residual centroids —
    // auditing raw subvectors there would report meaningless
    // cohesion and trip the rebuild cadence on a healthy store.
    // subtractCell carries the literal-vs-broadcast size dispatch.
    val base = storedRows(spark, path)
      .withColumn("v0", Vectors.asDouble(col("embedding")))
    val withV =
      if (residual)
        Similarity.subtractCell(base, "v0",
          loadCodebook(spark, path), "v")
      else base.withColumn("v", col("v0"))
    val stored = withV
      .select(col("v") +: (0 until m).map(s => col(s"pq$s")): _*)
    val subRows = stored.select(posexplode(array((0 until m).map { s =>
      struct(lit(s).as("sub"), col(s"pq$s").as("code"),
        round(Vectors.cosine(
          slice(col("v"), s * Similarity.PqSubDim + 1, Similarity.PqSubDim),
          element_at(Similarity.bookLit(books(s)), col(s"pq$s"))), 6)
          .as("cos6"))
    }: _*)))
      .select(col("col.sub").as("sub"), col("col.code").as("code"),
        col("col.cos6").as("cos6"))
    val perCell = subRows.groupBy(col("sub"), col("code"))
      .agg(count(lit(1)).as("n"),
        sum(col("cos6").cast("decimal(38,6)")).as("sc"))
    perCell.groupBy(col("sub"))
      .agg(sum(col("n")).as("n_vectors"),
        count(lit(1)).as("n_cells_live"),
        round(max(col("n")).cast("double") / sum(col("n")), 4)
          .as("max_cell_frac"),
        round((sum(col("sc")).cast("double") / sum(col("n"))), 4)
          .as("mean_cos_centroid"))
      .select(col("sub").cast("int").as("sub"), col("n_vectors"),
        col("n_cells_live"), col("max_cell_frac"),
        col("mean_cos_centroid"))
      .orderBy(col("sub"))
  }

  /** SQ re-rank width picked from the index's own health — the
    * closed-loop form of q147's width knob. The approximate int8
    * scan mis-orders more candidates where many members crowd one
    * cell (tight score ties inside a crowded probe), which is
    * exactly what cell SKEW measures, so the width scales with the
    * worst skew: `base · max(1, ⌈maxSkew⌉)`, capped at 8·base —
    * past that the re-rank is reading most of a skewed cell anyway
    * and the right action is a rebuild ([[rebuildIfStale]] fires at
    * skew > 4, well inside the cap). NaN (empty store) → base.
    * Feed it [[maintain]]'s reported `maxSkew` (or [[health]]'s max)
    * so the maintenance tick that measured the store also sets the
    * serving knob; SimilaritySpec measures recall-vs-width on a
    * drifted corpus to back the rule.
    */
  def sqRerankWidthFor(maxSkew: Double,
                       base: Int = Similarity.SqRerankWidth): Int =
    if (maxSkew.isNaN || maxSkew <= 1.0) base
    else math.min(8 * base, base * math.ceil(maxSkew).toInt)

  /** A healthy store's worst code CROWDING ceiling (max_cell_frac ×
    * [[Similarity.PqCentroids]]; 1.0 = perfectly spread codes).
    * MEASURED: the sf fixtures' built stores sit at 2–4 across
    * subspaces; the drift fixture (one dominant coordinate over
    * damped residuals) pushes the worst subspace past 30. The
    * threshold sits between the regimes with headroom on the healthy
    * side, so the loop never widens a healthy store's serving.
    */
  val HealthyCodeCrowd = 8.0

  /** PQ re-rank width picked from the stored BOOKS' own health — the
    * ADC tier's closed loop (q168 made code skew measurable; this
    * acts on it, completing for [[pqQuery]] what [[sqRerankWidthFor]]
    * closed for the SQ tier). The ADC ordering degrades where one
    * CODE crowds a subspace ([[pqHealth]]'s max_cell_frac): rows
    * sharing that code are indistinguishable in that subspace's
    * 1/[[Similarity.PqSubspaces]] of the score, ties thicken at the
    * 4dp candidate cut, and only the re-rank width buys the order
    * back. Width scales with the worst subspace's crowding past the
    * measured healthy ceiling, capped at 8·base (the sq rule's cap
    * rationale: past that the re-rank reads most of a probed cell
    * and the right action is the physical re-train — pqHealth's
    * COHESION falling is that signal, consumed by the rebuild
    * cadence, not by this knob). NaN (empty store) → base. Feed it
    * pqHealth's max max_cell_frac; SimilaritySpec recall-measures
    * the rule on the drifted corpus like the SQ one.
    */
  def pqRerankWidthFor(maxCellFrac: Double,
                       base: Int = Similarity.PqRerankWidth): Int =
    if (maxCellFrac.isNaN) base
    else {
      val crowd = maxCellFrac * Similarity.PqCentroids
      if (crowd <= HealthyCodeCrowd) base
      else math.min(8 * base,
        base * math.ceil(crowd / HealthyCodeCrowd).toInt)
    }

  /** Top-`topK` neighbors per query row (`query_id`, `q_emb`) against
    * a built index. Output matches q64's shape: (query_id,
    * neighbor_id, score, rk).
    */
  def query(spark: SparkSession, path: String, queries: DataFrame,
            nprobe: Int = Similarity.IvfNProbe,
            topK: Int = 5): DataFrame = {
    val cents = loadCodebook(spark, path)
    val qcells = Similarity.probeCells(queries,
      Seq("query_id", "q_emb"), "q_emb", cents, nprobe)
    val assigned = storedRows(spark, path)
    val scored = assigned.join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosine(col("q_emb"), col("embedding")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .orderBy(col("query_id"), col("rk"))
  }
}
