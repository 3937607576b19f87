package graft.engine

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Chunked, idempotent upsert sink — the Spark-native form of the
  * reference's `upsert_table(records, table, chunk_size=300)`
  * (reference `etl_supabase.py:71-85`).
  *
  * The reference slices a driver-side record list into ≤300-row
  * chunks and POSTs them sequentially, aborting the run on the first
  * failed chunk (`:83` `raise_for_status`). Here the same contract is
  * distributed: each partition groups its rows into bounded chunks
  * and hands them to a [[ChunkWriter]]; a thrown exception fails the
  * task → Spark retries the task → the job aborts after max retries.
  * Because Spark gives at-least-once on retry, the writer MUST be
  * idempotent on the natural key — exactly the reference's own
  * answer (PostgREST upsert, docstring `:71-72`; storage
  * `?upsert=true`, `:91`). SURVEY §7.4.4.
  *
  * At 100 TB: no `collect()`, memory bounded by `chunkSize` rows per
  * in-flight chunk per task, parallelism = partitions. Use
  * `df.repartition(n)` upstream to match the endpoint's concurrency
  * budget.
  */
object Sink {

  val DefaultChunkSize = 300

  /** Pluggable chunk endpoint. Implementations must be idempotent on
    * the record's natural key and Serializable (shipped to
    * executors).
    */
  trait ChunkWriter extends Serializable {
    /** Write one chunk; throw to abort (fail-fast, reference `:83`). */
    def writeChunk(table: String, chunk: Seq[Row]): Unit
  }

  /** Pure re-statement of the reference's slicing loop (`:77-78`):
    * all chunks ≤ chunkSize, order preserved, concat = input.
    * Exposed for property tests (SURVEY §5.2.2).
    */
  def chunked[T](records: Seq[T], chunkSize: Int = DefaultChunkSize): Seq[Seq[T]] = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    records.grouped(chunkSize).map(_.toSeq).toSeq
  }

  /** Distributed chunked upsert: every partition streams its rows in
    * bounded chunks to `writer`. Returns the number of rows written
    * (via accumulator — no extra job, unlike the reference's
    * `len(records)` recount at `:132-134`).
    */
  def upsert(df: DataFrame, table: String, writer: ChunkWriter,
             chunkSize: Int = DefaultChunkSize): Long = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    val written = df.sparkSession.sparkContext.longAccumulator(s"upsert_$table")
    df.foreachPartition { (it: Iterator[Row]) =>
      it.grouped(chunkSize).foreach { chunk =>
        writer.writeChunk(table, chunk)
        written.add(chunk.size)
      }
    }
    written.value
  }

  /** In-memory idempotent writer keyed by natural key — the test
    * double for the PostgREST endpoint. Last write wins per key, so
    * replays (task retries) converge to the same state.
    *
    * NOTE: local-mode only. Spark serializes task closures even in
    * local mode, so instance state mutated inside `writeChunk` would
    * land in a deserialized COPY and the driver's copy would stay
    * empty. The store therefore lives in a JVM-static registry in the
    * companion object, keyed by a per-writer UUID: only the (small,
    * Serializable) id travels with the closure, and driver + local
    * executors resolve the same map through the shared JVM. A real
    * deployment plugs an HTTP/JDBC writer here instead.
    */
  class InMemoryUpsertWriter private (keyColumns: Seq[String],
                                      val id: String,
                                      owns: Boolean)
      extends ChunkWriter {
    /** Owning constructor — the ONLY path that may create the store.
      * [[InMemoryUpsertWriter.attach]] must find it already present.
      */
    def this(keyColumns: Seq[String],
             id: String = java.util.UUID.randomUUID().toString) =
      this(keyColumns, id, owns = true)
    if (owns)
      InMemoryUpsertWriter.registry.putIfAbsent(id, new ConcurrentHashMap): Unit
    else if (!InMemoryUpsertWriter.registry.containsKey(id))
      throw new IllegalStateException(
        s"attach($id): no live store with that id — the owning writer was " +
          "never created in this JVM, was disposed, or the id is wrong. " +
          "Refusing to create an orphan store that would swallow writes.")
    private def store = {
      val s = InMemoryUpsertWriter.registry.get(id)
      if (s == null)
        throw new IllegalStateException(s"writer $id used after dispose()")
      s
    }
    override def writeChunk(table: String, chunk: Seq[Row]): Unit =
      chunk.foreach { row =>
        val key = keyColumns.map(k => row.get(row.fieldIndex(k)))
        store.put((table, key), row)
      }
    def size: Int = store.size()
    def rows: Seq[Row] = {
      import scala.jdk.CollectionConverters._
      store.values().asScala.toSeq
    }
    /** Release the JVM-static store — the registry otherwise retains
      * every writer's rows for the JVM lifetime (harnesses that build
      * a writer per run should dispose when done asserting).
      */
    def dispose(): Unit = InMemoryUpsertWriter.registry.remove(id): Unit
  }

  object InMemoryUpsertWriter {
    /** JVM-wide store registry; shared by driver and local-mode
      * executor threads regardless of closure serialization.
      */
    private val registry =
      new ConcurrentHashMap[String, ConcurrentHashMap[(String, Seq[Any]), Row]]()

    /** Attach a writer to an EXISTING store by id — how the DSv2 sink
      * ([[graft.sources.UpsertDataSource]]) reaches the store from a
      * write task: only the string id crosses the task boundary, and
      * attaching never clears rows already written (idempotent).
      * Throws if no store with that id is live: a disposed/typo'd/
      * cross-JVM writerId must fail the write task fast, not silently
      * drop every row into a resurrected empty map (which also meant
      * the "used after dispose" guard could never fire in a task).
      */
    def attach(id: String, keyColumns: Seq[String]): InMemoryUpsertWriter =
      new InMemoryUpsertWriter(keyColumns, id, owns = false)
  }

  /** Parquet-backed upsert for durable local runs: MERGE-like
    * last-write-wins on the key columns, expressed relationally
    * (read existing ∪ new, keep newest per key). Idempotent by
    * construction.
    */
  def upsertParquet(df: DataFrame, path: String, keyColumns: Seq[String]): Unit = {
    val spark = df.sparkSession
    val exists = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val merged =
      if (!exists) df
      else {
        val old = spark.read.parquet(path)
        // new rows win: anti-join old against new keys, then union
        old.join(df.select(keyColumns.map(col): _*).distinct(),
                 keyColumns, "left_anti")
          .unionByName(df)
      }
    // Never overwrite the path we are still reading from: a cache-
    // then-overwrite scheme loses data if a cached partition is
    // evicted mid-write (recompute would re-read a truncated path).
    // Protocol: write fully to tmp; rename target aside (fast, both
    // copies intact); rename tmp into place; drop the backup. A crash
    // leaves at worst a missing target with BOTH complete copies on
    // disk under recoverable names — never a window where the only
    // copy has been deleted. A failed write cleans its tmp dir up.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(
      path + ".__tmp__" + java.util.UUID.randomUUID().toString)
    val backup = new org.apache.hadoop.fs.Path(path + ".__backup__")
    try merged.write.mode("overwrite").parquet(tmp.toString)
    catch { case e: Throwable => fs.delete(tmp, true); throw e }
    if (fs.exists(backup)) fs.delete(backup, true)
    if (exists && !fs.rename(target, backup))
      throw new java.io.IOException(s"backup rename $target -> $backup failed")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(
        s"rename $tmp -> $target failed; previous data is at $backup")
    fs.delete(backup, true)
  }
}
