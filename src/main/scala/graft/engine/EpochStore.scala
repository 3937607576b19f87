package graft.engine

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Epoch-dir table under a versioned manifest root — the shared
  * storage contract of the three persisted indexes
  * ([[graft.queries.IvfIndex]] cells, [[graft.queries.MinHashIndex]]
  * docs/bands, [[graft.queries.ChunkIndex]] chunks). Layout:
  *
  *   <root>/MANIFEST            one line, the live version (vN)
  *   <root>/v<N>/epoch=base     the batch build / compacted base
  *   <root>/v<N>/epoch=<id>     one dir per committed append batch
  *   <root>/v<N>/_folded_epochs ids folded into this base (see below)
  *
  * Two orthogonal guarantees compose here:
  *
  *   - EPOCH commits are the streaming exactly-once unit: each batch
  *     stages fully under a hidden tmp dir inside the live version,
  *     then lands with ONE atomic rename. A redelivered batchId finds
  *     its epoch present and is a storage no-op; a crash mid-stage
  *     leaves only a tmp the retry overwrites.
  *   - VERSION flips are the maintenance unit ([[Archive]]'s manifest
  *     machinery): compaction builds the next version dir completely
  *     — every epoch folded into one `epoch=base` — and flips the
  *     manifest with one atomic rename, so a reader resolving through
  *     the manifest sees the old epoch set or the new base, never a
  *     half-folded table. Without this, a year of daily appends costs
  *     one directory listing per batch per query — the listing,
  *     not the data, becomes the scan bottleneck.
  *
  * The two interact at replay: compaction REMOVES the epoch dirs
  * whose presence made redelivery a no-op. `_folded_epochs` closes
  * that hole — the compacted version records every numeric epoch id
  * folded into its base (accumulating across compactions), and
  * [[committed]] checks it alongside the dir probe, so a batch
  * redelivered after an intervening compaction is STILL a no-op.
  *
  * Single-maintenance-writer contract (same as rebuilding an index):
  * compaction must not race an in-flight append — run it between
  * micro-batches (foreachBatch is serial per stream) or while the
  * stream is stopped. Readers need no coordination.
  */
object EpochStore {

  private val FoldedName = "_folded_epochs"

  /** Create the store: write the base epoch of version 0 and commit
    * the manifest. `writeBase` receives the `epoch=base` dir path.
    *
    * On an ALREADY-BUILT root this fails unless `rebuild = true`: a
    * silent re-create used to stage a fresh version with no
    * `_folded_epochs` ledger, so a streaming checkpoint surviving the
    * rebuild would re-commit previously-delivered batchIds as new
    * epochs (the replay hole, re-opened). A deliberate rebuild
    * CARRIES THE LEDGER FORWARD — every epoch id the old version had
    * committed or folded is recorded as folded into the new base —
    * which closes the hole outright: the rebuild's source corpus owns
    * those batches' rows now, so their redelivery must stay a no-op.
    */
  /** `alsoFolded`: extra epoch ids to record as folded into the new
    * base beyond the rebuilt table's own — the DERIVED-table rebuild
    * hook: when a table is rebuilt from a SOURCE relation that
    * already contains a dangling epoch the derived side never
    * committed (CalibrationStore.rebuildHistogram,
    * PHashIndex.rebuildBands), that id's rows are in the new base,
    * so the ledger must say so — otherwise the appender's retry
    * double-applies the delta and the store reads diverged forever.
    */
  def create(root: String, rebuild: Boolean = false,
             alsoFolded: Set[Long] = Set.empty)(writeBase: String => Unit): Unit = {
    val existing = Archive.hasVersion(root)
    if (existing && !rebuild)
      throw new IllegalStateException(
        s"EpochStore at $root is already built; pass rebuild = true " +
          "for a deliberate rebuild (the committed-epoch ledger is " +
          "carried forward so surviving stream checkpoints stay safe)")
    val carried: Set[Long] =
      (if (existing) {
        val live = liveDir(root)
        foldedIds(live) ++ liveEpochIds(live)
      } else Set.empty[Long]) ++ alsoFolded
    Archive.stageVersion(root) { dir =>
      writeBase(s"$dir/epoch=base")
      if (carried.nonEmpty)
        Files.writeString(Paths.get(dir, FoldedName),
          carried.toSeq.sorted.mkString("\n")): Unit
    }: Unit
  }

  /** The live version directory, resolved through the manifest. */
  def liveDir(root: String): String = Archive.resolveVersioned(root)

  /** A pinned (root → live version dir) SNAPSHOT across several
    * stores/tables — the composed-read consistency unit. A reader
    * that resolves each table's manifest independently as its plan
    * touches it can straddle a maintenance flip: table A read
    * pre-tick, table B post-tick — a mixed epoch set (harmless for
    * VALUES under value-preserving compaction, but wrong for any
    * reader that reasons about epoch membership, e.g. a census or a
    * redelivery read). Resolving every manifest up front in one tight
    * loop pins one version per table for the whole read.
    *
    * This is a NARROWING, not an atomicity guarantee: the resolution
    * loop itself is sequential, so a flip landing inside it (a
    * microseconds window, vs. the whole multi-stage read without the
    * pin) still mixes versions. The contracts that make composed
    * reads actually safe are unchanged: appenders don't race
    * maintenance (single-maintenance-writer), and the `stageVersion`
    * retention policy (exactly one displaced version kept) keeps the
    * pinned dirs readable across one flip per table while the read
    * runs — the same in-flight-reader contract single-table readers
    * already rely on.
    */
  final case class Snapshot(pinned: Map[String, String]) {
    def dir(root: String): String = pinned(root)
    def read(spark: SparkSession, root: String): DataFrame =
      spark.read.parquet(pinned(root))
  }

  /** Pin the live version of every listed root — call once at
    * composed-read start, then read tables only through the result.
    */
  def snapshot(roots: Seq[String]): Snapshot =
    Snapshot(roots.map(r => r -> liveDir(r)).toMap)

  /** All committed rows across every epoch of the live version. The
    * `epoch` partition column rides along (string-typed: `base` mixes
    * with batch ids); callers select their data columns.
    */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(liveDir(root))

  private def foldedIds(live: String): Set[Long] = {
    val f = Paths.get(live, FoldedName)
    if (!Files.exists(f)) Set.empty
    else Files.readString(f).split("\n").iterator
      .filter(_.nonEmpty).map(_.toLong).toSet
  }

  /** True when epoch `id` is already in the store — as its own dir,
    * or folded into the base by a past compaction.
    */
  def committed(root: String, id: Long): Boolean = {
    val live = liveDir(root)
    Files.exists(Paths.get(live, s"epoch=$id")) || foldedIds(live).contains(id)
  }

  /** True when epoch `id` is no longer its own dir but was folded
    * into the base by a past compaction — the one committed state a
    * retrying batch append cannot verify row-wise anymore.
    */
  def folded(root: String, id: Long): Boolean = foldedIds(liveDir(root)).contains(id)

  /** Every epoch id the live version has committed — as a dir or
    * folded into the base. Multi-table stores (MinHash docs/bands)
    * compare these sets to detect a half-committed append before
    * maintenance buries it.
    */
  def committedIds(root: String): Set[Long] = {
    val live = liveDir(root)
    foldedIds(live) ++ liveEpochIds(live)
  }

  /** Commit epoch `id` atomically: stage via `write` (handed a tmp
    * dir inside the live version — dot-prefixed, invisible to
    * readers), then one rename. No-op if [[committed]].
    */
  def commitEpoch(root: String, id: Long)(write: String => Unit): Unit =
    if (!committed(root, id)) {
      val live = liveDir(root)
      val tmp = s"$live/.epoch-$id.tmp"
      Archive.deleteTree(Paths.get(tmp))
      write(tmp)
      Files.move(Paths.get(tmp), Paths.get(live, s"epoch=$id"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      // A compact() racing this commit (single-maintenance-writer
      // contract violated) flips the manifest mid-stage: the epoch
      // just renamed into the DISPLACED version dir, which the next
      // compaction deletes — silent data loss. Re-resolve and fail
      // loudly instead, turning a contract violation into an error
      // the caller can retry against the new live version. This is
      // best-effort NARROWING, not a guarantee: a compact that
      // listed epochs before this rename but flips after the
      // re-read below still drops the epoch silently — only the
      // single-maintenance-writer contract makes commits safe; this
      // check just converts most violations into loud errors.
      val liveNow = liveDir(root)
      if (liveNow != live)
        throw new IllegalStateException(
          s"epoch=$id committed into displaced version $live but the " +
            s"manifest now points at $liveNow — a maintenance writer " +
            "raced this append; retry the commit")
    }

  /** Epoch-id bands: streaming batchIds count from 0; ad-hoc batch
    * appends mint from [[BatchFloor]]; forget batches
    * ([[Tombstones]]) mint from [[ForgetFloor]]. Three disjoint
    * bands because a derived id colliding with a committed epoch on
    * ANY table it must land on silently no-ops that half — the
    * forget band exists specifically so a forget's derived sibling
    * epoch (CalibrationStore's negative histogram delta) can never
    * collide with an append's, and so a dangling forget stays
    * DETECTABLE by id-set comparison.
    */
  val BatchFloor = 1000000000L
  val ForgetFloor = 2000000000L

  /** Next free epoch id for ad-hoc BATCH appends, drawn from the
    * batch band — disjoint from streaming batchIds below and forget
    * ids above. Single-maintenance-writer contract applies (derive
    * and commit must not race another appender).
    */
  def nextAppendEpochId(root: String): Long = {
    val live = liveDir(root)
    val used = (foldedIds(live) ++ liveEpochIds(live))
      .filter(id => id >= BatchFloor && id < ForgetFloor)
    if (used.isEmpty) BatchFloor else used.max + 1
  }

  /** Next free epoch id in the FORGET band. */
  def nextForgetEpochId(root: String): Long = {
    val live = liveDir(root)
    val used = (foldedIds(live) ++ liveEpochIds(live)).filter(_ >= ForgetFloor)
    if (used.isEmpty) ForgetFloor else used.max + 1
  }

  /** Numeric epoch ids present as dirs in the live version. */
  private def liveEpochIds(live: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(live))
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("epoch=\\d+"))
      .map(_.stripPrefix("epoch=").toLong).toSeq
    finally s.close()
  }

  /** Count of epoch dirs in the live version (listing-cost proxy). */
  def epochCount(root: String): Int = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(liveDir(root)))
    try s.iterator().asScala
      .count(_.getFileName.toString.startsWith("epoch="))
    finally s.close()
  }

  /** Epoch-count-driven maintenance policy: [[compact]] only when the
    * live version holds more than `maxEpochs` epoch dirs. The cost
    * model this enforces is the one the header documents — each epoch
    * is one directory listing per query, so a year of daily appends
    * degrades scans linearly until a fold; a store under the bound is
    * a pure-read no-op (one listing, no job). Returns true iff a
    * compaction ran. Single-maintenance-writer contract, like
    * [[compact]] — call between micro-batches or with the stream
    * stopped.
    */
  def compactIfFragmented(spark: SparkSession, root: String,
                          partitionCols: Seq[String] = Nil,
                          carryExtras: Seq[String] = Nil,
                          maxEpochs: Int = 64): Boolean = {
    val fragmented = epochCount(root) > maxEpochs
    if (fragmented) compact(spark, root, partitionCols, carryExtras)
    fragmented
  }

  /** Fold every committed epoch into one `epoch=base` of the next
    * version and flip the manifest. Values are preserved exactly
    * (union of immutable epoch contents, no dedup — epoch membership
    * was already the exactly-once unit); `partitionCols` re-applies
    * the store's pruning layout (cell / band) to the new base.
    * Readers racing the flip resolve the old or the new version,
    * never a missing table; the folded-id ledger keeps post-compaction
    * replays no-ops.
    *
    * `transform` rewrites the folded rows on their way into the new
    * base — the PURGE hook: a store with pending [[Tombstones]]
    * passes its exclusion so the fold physically drops forgotten
    * rows (values are then preserved exactly w.r.t. the store's READ
    * surface, which already excluded them).
    */
  def compact(spark: SparkSession, root: String,
              partitionCols: Seq[String] = Nil,
              carryExtras: Seq[String] = Nil,
              transform: DataFrame => DataFrame = identity): Unit = {
    val live = liveDir(root)
    val folded = foldedIds(live) ++ liveEpochIds(live)
    val data = transform(read(spark, root).drop("epoch"))
    Archive.stageVersion(root) { dir =>
      val w = data.write.mode("overwrite")
      (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
        .parquet(s"$dir/epoch=base")
      Files.writeString(Paths.get(dir, FoldedName),
        folded.toSeq.sorted.mkString("\n"))
      // version-scoped sidecars (e.g. IvfIndex's `_codebook`) ride
      // the same manifest flip as the data they describe — names
      // must be `_`/`.`-prefixed so Spark's file discovery over the
      // version dir never reads them as epochs
      carryExtras.foreach { name =>
        val src = Paths.get(live, name)
        if (Files.exists(src))
          Archive.copyTree(src, Paths.get(dir, name))
      }
    }: Unit
  }
}
