package graft

import org.apache.spark.sql.functions._

import graft.engine.{Archive, EpochStore}
import graft.queries.IvfIndex

/** Health-driven IVF index maintenance (round 9): q144 made codebook
  * staleness measurable; [[IvfIndex.rebuildIfStale]] acts on it. The
  * contract under test:
  *
  *   - a HEALTHY index is a pure-read no-op — `false`, manifest
  *     version untouched, codebook byte-identical;
  *   - a DRIFTED index (appended vectors the stale codebook assigns
  *     badly) rebuilds — `true`, manifest advances one version, and
  *     the health metrics RECOVER (max skew falls, cohesion of the
  *     worst heavy cell rises);
  *   - the committed-epoch ledger survives the rebuild, so replaying
  *     an append folded into the rebuilt base stays a storage no-op;
  *   - the codebook is a version-scoped sidecar: it lives INSIDE the
  *     live version dir, so the rebuild's manifest flip publishes
  *     codebook + assignments atomically.
  */
class IvfIndexSpec extends SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Relative paths of every data file under `root` (same helper as
    * EpochCompactionSpec).
    */
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

  private def maxSkew(idx: String): Double =
    IvfIndex.health(spark, idx)
      .agg(max(col("skew"))).head().getDouble(0)

  test("rebuildIfStale: healthy no-op; drifted corpus rebuilds and " +
      "metrics recover; ledger carries through the rebuild") {
    val base = java.nio.file.Files.createTempDirectory("ivf-stale").toString
    val idx = s"$base/ix"
    IvfIndex.build(emb.filter(col("vec_id") < 250), idx)
    val root = s"$idx/cells"
    val v0 = Archive.currentVersion(root)
    val cb0 = IvfIndex.loadCodebook(spark, idx)
    val skew0 = maxSkew(idx)
    assert(skew0 <= 4.0,
      s"fixture's built index must start healthy (max skew $skew0)")

    // healthy: below the default threshold -> no-op, nothing written
    assert(!IvfIndex.rebuildIfStale(spark, idx))
    assert(Archive.currentVersion(root) === v0)
    assert(IvfIndex.loadCodebook(spark, idx) === cb0)

    // drift: a new MODE the build never saw — 250 identical all-ones
    // vectors. The stale codebook funnels all of them into one
    // nearest cell, so that cell's skew hits ≥ (250·k)/500 = 5 no
    // matter which cell catches them
    val cents = IvfIndex.loadCodebook(spark, idx)
    val drift = emb.filter(col("vec_id") >= 250)
      .select((col("vec_id") + 1000).as("vec_id"),
        transform(col("embedding"), _ => lit(1.0f)).as("embedding"))
    IvfIndex.appendEpoch(drift, cents, idx, 5L)
    val skewDrifted = maxSkew(idx)
    assert(skewDrifted > 4.0,
      s"fixture drift must cross the default threshold (skew $skewDrifted)")

    // stale: rebuild runs, manifest advances, the new mode gets its
    // own centroid (its cell's cohesion recovers to ~1.0)
    assert(IvfIndex.rebuildIfStale(spark, idx))
    assert(Archive.currentVersion(root) !== v0)
    // every vector survived the rebuild
    assert(EpochStore.read(spark, root).count() === 500)
    val heaviest = IvfIndex.health(spark, idx)
      .orderBy(col("n_vectors").desc).head()
    assert(heaviest.getLong(1) >= 250,
      "the drift mode must share one cell after the rebuild")
    assert(heaviest.getDouble(3) > 0.9,
      s"the drift cell must cohere to its OWN centroid after the " +
        s"rebuild (mean cos ${heaviest.getDouble(3)})")

    // the ledger carried: the folded append id replays as a no-op
    val files = fileDirs(root)
    IvfIndex.appendEpoch(drift, cents, idx, 5L)
    assert(fileDirs(root) === files)

    // the codebook is a sidecar INSIDE the live version dir (one
    // manifest flip covers codebook + assignments)
    val live = EpochStore.liveDir(root)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(live, "_codebook")))
  }

  test("SQ codes survive appends: appended rows carry the same " +
      "(code, scale) a fresh build over the union stores") {
    import graft.functions.Vectors
    // (code, scale) are per-ROW quantization (q89's formula) and
    // codebook-independent — only the CELL differs between an append
    // under a stale codebook and a rebuild. appendEpoch is the exact
    // storage body every appendStream micro-batch commits through
    // (StreamingSpec pins that identity), so this is the
    // build+append == build-over-union contract for the SQ columns.
    def sqOf(idx: String): Map[Long, (Seq[Int], Double)] =
      EpochStore.read(spark, s"$idx/cells")
        .select(col("vec_id").cast("long"), col("code"), col("scale"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getDouble(2))))
        .toMap
    val base = java.nio.file.Files.createTempDirectory("ivf-sq").toString
    val a = emb.filter(col("vec_id") < 250)
    val b = emb.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") >= 250)
    val incr = s"$base/incr"
    IvfIndex.build(a, incr)
    IvfIndex.appendEpoch(b, IvfIndex.loadCodebook(spark, incr), incr, 1L)
    val together = s"$base/union"
    IvfIndex.build(emb, together)
    val viaAppend = sqOf(incr)
    val viaUnion = sqOf(together)
    assert(viaAppend.keySet === viaUnion.keySet)
    assert(viaAppend === viaUnion)
    // and both equal the direct q89 quantization of the raw vectors
    val direct = emb.select(col("vec_id").cast("long"),
        Vectors.quantizeInt8(col("embedding")).as("code"),
        Vectors.quantScale(col("embedding")).as("scale"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getDouble(2))))
      .toMap
    assert(viaAppend === direct)
  }

  test("pq codes: appends code arrivals under the STORED subspace books " +
      "(default-loaded), compaction carries the _pqcodebook sidecar, " +
      "and a pre-round-13 store fails loud with the migration note") {
    val base = java.nio.file.Files.createTempDirectory("ivf-pq").toString
    val idx = s"$base/ix"
    IvfIndex.build(emb.filter(col("vec_id") < 250), idx)
    val cents = IvfIndex.loadCodebook(spark, idx)
    val books = IvfIndex.loadPqCodebooks(spark, idx)
    assert(books.size === graft.queries.Similarity.PqSubspaces)
    assert(books.forall(_.nonEmpty))
    val batch = emb.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") >= 250)
    // pre-round-13 call shape (no books passed): the append must
    // default-load the STORED books, never re-learn or skip
    IvfIndex.appendEpoch(batch, cents, idx, 1L)
    val m = graft.queries.Similarity.PqSubspaces
    def pqOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Int]] = df
      .select(col("vec_id").cast("long") +:
        (0 until m).map(s => col(s"pq$s")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to m).map(r.getInt(_)).toSeq).toMap
    val stored = pqOf(EpochStore.read(spark, s"$idx/cells"))
    assert(stored.size === emb.count())
    val direct = pqOf(IvfIndex.assign(emb, cents, Some(books)))
    assert(stored === direct)
    // the fold carries both sidecars and preserves every code
    IvfIndex.compact(spark, idx)
    assert(IvfIndex.loadPqCodebooks(spark, idx) === books)
    assert(pqOf(EpochStore.read(spark, s"$idx/cells")) === stored)
    // degrade to the pre-round-13 layout: explicit migration error
    Archive.deleteTree(java.nio.file.Paths.get(
      EpochStore.liveDir(s"$idx/cells"), "_pqcodebook"))
    val e = intercept[IllegalStateException] {
      IvfIndex.loadPqCodebooks(spark, idx)
    }
    assert(e.getMessage.contains("pre-round-13"))
    assert(e.getMessage.contains("sqQuery"))
  }

  test("loadCodebook on a pre-sidecar layout fails with an explicit " +
      "rebuild-required error, not a raw file exception") {
    val base = java.nio.file.Files.createTempDirectory("ivf-legacy").toString
    val idx = s"$base/ix"
    IvfIndex.build(emb.filter(col("vec_id") < 100), idx)
    // degrade to the pre-sidecar layout: no _codebook in the version
    val live = EpochStore.liveDir(s"$idx/cells")
    graft.engine.Archive.deleteTree(
      java.nio.file.Paths.get(live, "_codebook"))
    val e = intercept[IllegalStateException] {
      IvfIndex.loadCodebook(spark, idx)
    }
    assert(e.getMessage.contains("rebuild required"))
    assert(e.getMessage.contains("pre-sidecar"))
  }

  /** Every Literal in the optimized plan whose folded Map/Array value
    * holds more than `cap` elements — the "k-sized plan literal"
    * detector: the PQ books fold to 64-slot literals by design, so a
    * cap between 64 and k separates model-sized constants from a
    * codebook leaking into the plan.
    */
  private def oversizedLiterals(df: org.apache.spark.sql.DataFrame,
      cap: Int): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
    df.queryExecution.optimizedPlan.collect { case n => n }
      .flatMap(_.expressions)
      .flatMap(_.collect { case l: Literal => l })
      .flatMap { l =>
        l.value match {
          case m: MapData if m.numElements() > cap =>
            Some(s"map literal of ${m.numElements()} entries")
          case a: ArrayData if a.numElements() > cap =>
            Some(s"array literal of ${a.numElements()} elements")
          case _ => None
        }
      }
  }

  private def queriesOf(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  test("residual serving: literal and broadcast forms are byte-identical " +
      "(q172 shape), the _pqnorms sidecar matches an independent " +
      "recomputation, and compaction carries it") {
    val base = java.nio.file.Files.createTempDirectory("ivf-rlit").toString
    val idx = s"$base/ix"
    IvfIndex.build(emb, idx, residualPq = true)
    val q = queriesOf(emb)
    // the serving chain, both dispatch arms on the SAME store:
    // maxLitCells = 0 forces every cell-keyed lookup (qcdot, |recon|
    // norm tables, the assign subtraction) onto the broadcast-
    // relation form a k-past-the-ceiling store uses
    val lit = IvfIndex.pqQuery(spark, idx, q).collect().toSeq
    val rel = IvfIndex.pqQuery(spark, idx, q, maxLitCells = 0)
      .collect().toSeq
    assert(lit.nonEmpty)
    assert(lit === rel,
      "literal and broadcast residual serving must be byte-identical")
    // assign: the coding side of the same dispatch
    val cents = IvfIndex.loadCodebook(spark, idx)
    val (books, mode) = IvfIndex.loadPqCodebooksWithMode(spark, idx)
    assert(mode, "build(residualPq = true) must record the mode")
    val m = graft.queries.Similarity.PqSubspaces
    def codesOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id").cast("long") +: col("cell").cast("int") +:
        (0 until m).map(s => col(s"pq$s")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to m + 1).map(r.getInt(_)).toSeq).toMap
    val aLit = codesOf(IvfIndex.assign(emb, cents, Some(books),
      residualPq = true))
    val aRel = codesOf(IvfIndex.assign(emb, cents, Some(books),
      residualPq = true, maxLitCells = 0))
    assert(aLit === aRel,
      "literal and broadcast residual coding must be byte-identical")
    // the persisted norm tables equal an independent recomputation
    // from the stored model state: nsq[s][code] = Σ_i (c_sub[i]+b[i])²
    // folded left-to-right, null for ids a Lloyd round emptied
    val pqd = graft.queries.Similarity.PqSubDim
    val pqc = graft.queries.Similarity.PqCentroids
    val expected = cents.map { case (cid, c) =>
      cid -> (0 until m).map { s =>
        val cSub = c.slice(s * pqd, (s + 1) * pqd)
        val bm = books(s).toMap
        (0 until pqc).map { code =>
          bm.get(code).map(bc => cSub.zip(bc).foldLeft(0.0) {
            case (a, (x, y)) => val t = x + y; a + t * t
          })
        }
      }
    }.toMap
    def normsOf(df: org.apache.spark.sql.DataFrame)
        : Map[Int, Seq[Seq[Option[Double]]]] = df.collect()
      .map { r =>
        r.getInt(0) -> r.getSeq[scala.collection.Seq[Any]](1)
          .map(_.map(v => Option(v).map(_.asInstanceOf[Double])).toSeq)
          .toSeq
      }.toMap
    val sidecar = IvfIndex.loadPqNorms(spark, idx)
    assert(sidecar.isDefined, "residual build must persist _pqnorms")
    val got = normsOf(sidecar.get)
    assert(got.keySet === expected.keySet)
    for (cid <- expected.keys) {
      assert(got(cid) === expected(cid).map(_.toSeq).toSeq,
        s"cell $cid norm table")
    }
    // the fold carries the norms sidecar with the books it derives
    // from (one manifest flip covers all three sidecars + rows)
    IvfIndex.appendEpoch(emb.select((col("vec_id") + 5000).as("vec_id"),
      col("embedding")).limit(20), cents, idx, 1L)
    IvfIndex.compact(spark, idx)
    val carried = IvfIndex.loadPqNorms(spark, idx)
    assert(carried.isDefined, "compact must carry _pqnorms")
    assert(normsOf(carried.get) === got)
  }

  test("residual store past the literal ceiling: build, serve, audit " +
      "and append run relation-shaped with no k-sized plan literals") {
    import graft.queries.Similarity
    // 2100 deterministic 64-dim vectors, k = 2080 >
    // CodebookLiteralMaxCells (2048): every cell-keyed residual
    // lookup must ride broadcast relations — folding this codebook
    // into plan literals is exactly the 100 TB scale killer the
    // probeCells threshold exists for (k grows with the corpus under
    // the k ∝ n contract)
    import spark.implicits._
    val k = 2080
    assert(k > Similarity.CodebookLiteralMaxCells)
    val corpus = (0 until 2100).map { i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 64.0 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("ivf-bigk").toString
    val idx = s"$base/ix"
    IvfIndex.build(corpus, idx, k = k, lloydIters = 0, residualPq = true)
    assert(IvfIndex.loadCodebook(spark, idx).size >
      Similarity.CodebookLiteralMaxCells,
      "fixture must actually exceed the literal ceiling")
    assert(IvfIndex.loadPqNorms(spark, idx).isDefined)

    // serve: the full residual ADC chain (probe → qcdot → norm join
    // → rerank) plans without the codebook or the norm tables as
    // literals; the 64-slot book literals stay (model-sized)
    val q = queriesOf(corpus)
    val out = IvfIndex.pqQuery(spark, idx, q, nprobe = 3)
    val big = oversizedLiterals(out, cap = 1024)
    assert(big.isEmpty, s"k-sized literals in the serving plan: $big")
    val rows = out.collect()
    assert(rows.length >= 21, // >= 1 row per query (21 queries)
      s"each query must find candidates (got ${rows.length} rows)")

    // audit: pqHealth's residual subtraction takes the relation arm
    val health = IvfIndex.pqHealth(spark, idx)
    assert(oversizedLiterals(health, cap = 1024).isEmpty)
    assert(health.collect().length === Similarity.PqSubspaces)

    // append: arrivals code relation-shaped under the stored model
    val batch = (3000 until 3020).map { i =>
      (i.toLong, Array.tabulate(64)(j => math.cos(i * 64.0 + j).toFloat))
    }.toDF("vec_id", "embedding")
    IvfIndex.appendEpoch(batch,
      IvfIndex.loadCodebook(spark, idx), idx, 1L)
    assert(EpochStore.read(spark, s"$idx/cells").count() === 2120)
    spark.catalog.clearCache()
  }

  test("maintain(): healthy+compact no-op tick; fragmented folds; " +
      "drifted rebuilds (and skips the redundant fold)") {
    val base = java.nio.file.Files.createTempDirectory("ivf-maint").toString
    val idx = s"$base/ix"
    IvfIndex.build(emb.filter(col("vec_id") < 250), idx)
    val root = s"$idx/cells"

    // healthy + compact: pure-read tick
    val r0 = IvfIndex.maintain(spark, idx)
    assert(r0 === IvfIndex.MaintenanceReport(rebuilt = false,
      compacted = false, epochs = 1, maxSkew = r0.maxSkew,
      maxCodeFrac = r0.maxCodeFrac))
    assert(r0.maxSkew <= 4.0)
    // healthy stored codes spread under the crowding ceiling
    assert(!r0.maxCodeFrac.isNaN &&
      r0.maxCodeFrac * graft.queries.Similarity.PqCentroids <=
        IvfIndex.HealthyCodeCrowd)

    // healthy + fragmented past the bound: fold only
    val cents = IvfIndex.loadCodebook(spark, idx)
    val rest = emb.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") >= 250 && col("vec_id") < 350)
    IvfIndex.appendEpoch(rest.filter(col("vec_id") < 300), cents, idx, 1L)
    IvfIndex.appendEpoch(rest.filter(col("vec_id") >= 300), cents, idx, 2L)
    val r1 = IvfIndex.maintain(spark, idx, maxEpochs = 2)
    assert(!r1.rebuilt && r1.compacted && r1.epochs === 1)

    // drifted: rebuild runs; the rebuilt store is one base epoch, so
    // the fold is skipped as redundant
    // 500 identical all-ones rows against 350 stored: the caught
    // cell's skew is >= (500*10)/850 ≈ 5.9
    val drift = emb
      .select((col("vec_id") + 2000).as("vec_id"),
        transform(col("embedding"), _ => lit(1.0f)).as("embedding"))
    IvfIndex.appendEpoch(drift, IvfIndex.loadCodebook(spark, idx), idx, 3L)
    assert(maxSkew(idx) > 4.0, "drift fixture must cross the threshold")
    val r2 = IvfIndex.maintain(spark, idx, maxEpochs = 0)
    assert(r2.rebuilt && !r2.compacted && r2.epochs === 1)
    assert(EpochStore.read(spark, root).count() === 850)
  }
}
