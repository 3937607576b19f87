package graft.engine

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame

/** CSV archive + publish — the reference's secondary sink pair:
  * wide tables to local CSV (reference `etl_supabase.py:139-141`)
  * then streamed upload to object storage with `?upsert=true`
  * (`:88-108`, called `:154-156`).
  *
  * Spark-native shape: the archive is a distributed
  * `df.write.csv` (header on, no index column — pandas
  * `index=False` is Spark's default); the publish step is a
  * driver-side byte-stream hook because object-storage upload is
  * control-plane work, not row compute. At scale the archive keeps
  * one file per partition; `singleFile=true` reproduces the
  * reference's one-CSV-per-table artifact for small outputs only.
  */
object Archive {

  /** Content type by file extension — reference `:93-94`. */
  def contentType(path: String): String = {
    val ext = path.lastIndexOf('.') match {
      case -1 => ""
      case i  => path.substring(i).toLowerCase(java.util.Locale.ROOT)
    }
    Map(
      ".csv" -> "text/csv",
      ".json" -> "application/json",
      ".parquet" -> "application/octet-stream"
    ).getOrElse(ext, "application/octet-stream")
  }

  /** Archive a DataFrame as CSV with header (reference `:139-141`).
    * `singleFile` coalesces to 1 partition — only for reference-sized
    * outputs; large tables keep their partitioning.
    */
  def toCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** JSON-Lines corpus interchange (one JSON object per line, the
    * standard LLM training-corpus wire format): the writer shards
    * across tasks like any distributed sink (`singleFile` coalesces
    * for small hand-off files), gzip-compressed by default — JSONL
    * corpora ship compressed, and Spark splits .gz per FILE, so
    * shard count = read parallelism downstream. The reader takes an
    * explicit schema: schema inference on a 100 TB corpus is a full
    * extra pass, and silently-merged drifting schemas are exactly
    * the bug an ingest gate should fail loudly on — `mode=FAILFAST`
    * makes a malformed line an error, not a silent null row.
    */
  def toJsonl(df: DataFrame, path: String, singleFile: Boolean = false,
              compress: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    val w = out.write.mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  def readJsonl(spark: org.apache.spark.sql.SparkSession,
                path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Parquet small-file compaction: rewrite a directory into
    * ~`targetBytes` files (computed from the CURRENT on-disk size, so
    * compression ratio carries over), then atomically swap via the
    * tmp+rename idiom. The operational fix for the small-files
    * problem a chunked/streaming writer accumulates at scale — a
    * million 1 MB shards cost a NameNode/listing pass and a task per
    * file downstream; compacted 128 MB files restore scan
    * parallelism economics. `coalesce` (not `repartition`) keeps the
    * rewrite shuffle-free when shrinking file counts — each output
    * task concatenates input splits.
    */
  private[graft] def deleteTree(p: Path): Unit = if (Files.exists(p)) {
    import scala.jdk.CollectionConverters._
    val w = Files.walk(p)
    try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists)
    finally w.close()
  }

  /** Recursive file/dir copy (REPLACE_EXISTING per file) — used to
    * carry version-scoped sidecars (e.g. an index codebook) into a
    * staged next version before its manifest flip.
    */
  private[graft] def copyTree(src: Path, dst: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val w = Files.walk(src)
    try w.iterator().asScala.foreach { p =>
      val to = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(to): Unit
      else Files.copy(p, to,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
    finally w.close()
  }

  /** Crash healing for the two-rename in-place swap, shared by
    * [[compactParquet]] and the streaming sketch rollup — run BEFORE
    * writing `tmp`: a table that exists only under `old` (death
    * between the two renames) is restored; an `old` beside a live
    * `dir` is the stale displaced copy of a death after the swap;
    * a surviving `tmp` is always a dead partial write.
    */
  private[graft] def healSwap(dir: Path, old: Path, tmp: Path): Unit = {
    if (Files.exists(old) && !Files.exists(dir))
      Files.move(old, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    else deleteTree(old)
    deleteTree(tmp)
  }

  /** The swap itself: NOT one atomic rename — readers racing between
    * the two moves see a missing directory for that instant, and a
    * crash there parks the data under `old` (healed by [[healSwap]]
    * on the next call). Acceptable for offline maintenance and
    * single-writer streams; a concurrent-reader table needs the
    * manifest pointer flip instead — [[writeVersionedParquet]] /
    * [[compactVersionedParquet]] below close exactly this window.
    */
  private[graft] def swapInPlace(dir: Path, old: Path, tmp: Path): Unit = {
    if (Files.exists(dir))
      Files.move(dir, old, java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    Files.move(tmp, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    deleteTree(old) // best-effort cleanup of the displaced originals
  }

  def compactParquet(spark: org.apache.spark.sql.SparkSession,
                     path: String,
                     targetBytes: Long = 128L * 1024 * 1024): Long = {
    import java.nio.file.Paths
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(path)
    val tmp = Paths.get(path.stripSuffix("/") + ".compact-tmp")
    val old = Paths.get(path.stripSuffix("/") + ".compact-old")
    healSwap(dir, old, tmp)
    // a hive-partitioned dir (key=value subdirs) would read back with
    // partition columns and REWRITE FLAT — silently changing layout
    // and pruning behavior. Compact those per-partition instead.
    val ls = Files.list(dir)
    val partitioned =
      try ls.iterator().asScala.exists(p =>
        Files.isDirectory(p) && p.getFileName.toString.contains("="))
      finally ls.close()
    require(!partitioned,
      s"$path is hive-partitioned; compact each partition directory instead")
    val walk = Files.walk(dir)
    val bytes =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(Files.size).sum
      finally walk.close()
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    spark.read.parquet(path)
      .coalesce(nFiles.toInt)
      .write.mode("overwrite").parquet(tmp.toString)
    swapInPlace(dir, old, tmp)
    nFiles
  }

  // ---- manifest-pointer versioned table ---------------------------
  //
  // [[compactParquet]]'s in-place two-rename swap has a documented
  // reader window (see [[swapInPlace]]): between the two moves the
  // directory does not exist. The closed form: data lives in
  // IMMUTABLE versioned subdirs `<root>/v<N>/` and a one-line
  // `<root>/MANIFEST` file names the live version. Writers build the
  // next version dir completely, then flip the manifest with ONE
  // atomic rename (write-temp + rename(2), which POSIX replaces
  // atomically) — a reader resolving through the manifest sees the
  // old version or the new one, never an absent table. This is the
  // one-pointer core of what table formats (Iceberg/Delta-style
  // metadata pointers) do at full scale.
  //
  // Crash safety without a log: a writer that dies before the flip
  // leaves an orphan `v<k>` ABOVE the manifest version — dead by
  // definition (never referenced) and deleted by the next writer
  // before it claims the version number. After a successful flip the
  // writer GCs versions BELOW the displaced one, keeping exactly one
  // back version so a reader that resolved just before the flip can
  // finish its scan; the retention window is therefore one full
  // write cycle, an explicit operational contract (lengthen by
  // keeping more versions on object stores with slow readers).

  private val ManifestName = "MANIFEST"

  private def versionsIn(root: Path): Seq[Long] =
    if (!Files.exists(root)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(root)
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.matches("v\\d+"))
        .map(_.getFileName.toString.drop(1).toLong).toSeq
      finally s.close()
    }

  /** The committed version number, if the table exists. */
  def currentVersion(root: String): Option[Long] = {
    val m = Paths.get(root, ManifestName)
    if (!Files.exists(m)) None
    else Some(Files.readString(m).trim.stripPrefix("v").toLong)
  }

  /** The live data directory, resolved through the manifest. */
  def resolveVersioned(root: String): String =
    currentVersion(root) match {
      case Some(v) => Paths.get(root, s"v$v").toString
      case None => sys.error(s"no committed version under $root")
    }

  /** True when `root` carries a committed manifest version. */
  def hasVersion(root: String): Boolean = currentVersion(root).isDefined

  def readVersionedParquet(spark: org.apache.spark.sql.SparkSession,
                           root: String): DataFrame =
    spark.read.parquet(resolveVersioned(root))

  private def commitVersion(root: Path, v: Long): Unit = {
    val tmp = root.resolve(s".$ManifestName.tmp")
    Files.writeString(tmp, s"v$v")
    // rename over the live manifest: atomic on POSIX; ATOMIC_MOVE
    // makes a filesystem that cannot promise it fail loudly instead
    Files.move(tmp, root.resolve(ManifestName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  /** The generic stage-and-flip: populate the next version directory
    * via `write` (handed the version dir path; it may lay out any
    * file structure — [[graft.queries.ChunkIndex]]-style epoch dirs,
    * hive partitions, sidecar files), then flip the manifest with one
    * atomic rename. Crash semantics as documented above: a writer
    * dying pre-flip leaves an orphan the next writer deletes; after
    * the flip exactly one back version is retained for in-flight
    * readers. Returns the committed version number.
    */
  def stageVersion(root: String)(write: String => Unit): Long = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP)
    val cur = currentVersion(root)
    // dead partials: any version above the committed one is a
    // crashed writer's leftover — never referenced, safe to drop
    versionsIn(rootP).filter(v => v > cur.getOrElse(-1L))
      .foreach(v => deleteTree(rootP.resolve(s"v$v")))
    val next = cur.getOrElse(-1L) + 1
    write(rootP.resolve(s"v$next").toString)
    commitVersion(rootP, next)
    // keep exactly the displaced version for in-flight readers
    versionsIn(rootP).filter(v => v < cur.getOrElse(next))
      .foreach(v => deleteTree(rootP.resolve(s"v$v")))
    next
  }

  /** Write `df` as the next version of the table and flip the
    * manifest. Returns the committed version number.
    */
  def writeVersionedParquet(df: DataFrame, root: String): Long =
    stageVersion(root) { dir =>
      df.write.mode("overwrite").parquet(dir)
    }

  /** [[compactParquet]] for a versioned table: compact the live
    * version into the next one and flip — readers racing the swap
    * resolve either version, never nothing (PipelineSpec races a
    * reader thread against repeated compactions to pin exactly
    * that). Returns the new file count.
    */
  def compactVersionedParquet(spark: org.apache.spark.sql.SparkSession,
                              root: String,
                              targetBytes: Long = 128L * 1024 * 1024): Long = {
    import scala.jdk.CollectionConverters._
    val live = Paths.get(resolveVersioned(root))
    val walk = Files.walk(live)
    val bytes =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(Files.size).sum
      finally walk.close()
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    writeVersionedParquet(
      spark.read.parquet(live.toString).coalesce(nFiles.toInt), root)
    nFiles
  }

  /** Partitioned parquet archive with DYNAMIC partition overwrite —
    * the 100 TB form of the reference's idempotent daily re-archive
    * (`etl_supabase.py:139-141` rewrites whole CSVs each run; at
    * scale a re-run must replace only the partitions it recomputed).
    * With `partitionOverwriteMode=dynamic`, `mode("overwrite")`
    * replaces exactly the partition directories present in `df` and
    * leaves every other partition untouched — re-running yesterday's
    * slice cannot clobber the rest of the archive. The setting is
    * applied per-write via `.option`, not session-wide.
    */
  def toPartitionedParquet(df: DataFrame, path: String,
                           partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Pluggable publisher — the `upload_to_storage` seam
    * (reference `:88-108`). Implementations must upsert (`:91`).
    */
  trait Publisher {
    def publish(localPath: String, remotePath: String, bucket: String,
                contentType: String): Unit
  }

  /** Filesystem-backed publisher (test double for Supabase Storage):
    * copies bytes to `root/bucket/remotePath`, overwriting — the
    * upsert=true semantics of `:91`.
    */
  class LocalFsPublisher(root: String) extends Publisher {
    override def publish(localPath: String, remotePath: String,
                         bucket: String, contentType: String): Unit = {
      val dst: Path = Paths.get(root, bucket, remotePath)
      Files.createDirectories(dst.getParent)
      Files.copy(Paths.get(localPath), dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  val DefaultBucket = "processed-data" // reference `:88`

  /** Publish every part-file of an archived directory (or a single
    * file path) through `publisher`, fail-fast (reference `:106`).
    */
  def publishDir(publisher: Publisher, localDir: String, remotePrefix: String,
                 bucket: String = DefaultBucket): Int = {
    val dir = Paths.get(localDir)
    val files: Seq[Path] =
      if (Files.isDirectory(dir)) {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(p => Files.isRegularFile(p) &&
            !p.getFileName.toString.startsWith("_") &&
            !p.getFileName.toString.startsWith(".")).toSeq
        } finally s.close()
      } else Seq(dir)
    files.foreach { f =>
      val remote = s"$remotePrefix/${f.getFileName}"
      publisher.publish(f.toString, remote, bucket, contentType(f.toString))
    }
    files.size
  }
}
