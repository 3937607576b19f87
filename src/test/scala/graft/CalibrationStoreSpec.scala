package graft

import org.apache.spark.sql.functions._

import graft.engine.EpochStore
import graft.queries.CalibrationStore

/** The persisted per-language calibration store (build / append /
  * appendStream / compact) behind q159. Under test:
  *
  *   - served == the q139 full rank recompute over the union,
  *     including the TIE path (identical texts share a 6dp score, so
  *     the cutoff falls inside one histogram bucket and the tie-group
  *     row_number must split it by doc_id exactly like the global
  *     rank);
  *   - appends move the cutoff: a batch of high scorers demotes
  *     resident keeps (the calibration drift the store exists to
  *     absorb without a corpus re-rank);
  *   - exactly-once: replayed epoch ids are storage no-ops; a crash
  *     between the scores and hist commits heals on retry (the hist
  *     delta derives from the committed scores epoch);
  *   - append-only contract enforced loudly on doc_id overlap;
  *   - streamed == batch; compaction preserves reads.
  */
class CalibrationStoreSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("calib").resolve("cs").toString

  private def mk(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  // distinct-ish texts with a spread of scores per language
  private def corpus(ids: Seq[Long], lang: String) =
    ids.map(i => (i, s"w$i x${i * 7 % 13} y${i * 3 % 11} z${i % 5} q$lang$i", lang))

  /** The q101 hashed-linear token weight, replicated so the test can
    * pick deterministically HIGH-scoring batch words.
    */
  private def weight(w: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val b = java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1024L
    (b * 2654435761L % 1000003L).toDouble / 1000003.0 - 0.5
  }

  /** Docs built from the highest-weight words of a candidate pool —
    * guaranteed to outrank the generic corpus docs.
    */
  private def highCorpus(ids: Seq[Long], lang: String) = {
    val top = (0 until 3000).map(i => s"hi$i").sortBy(w => -weight(w)).take(5)
    ids.map(i => (i, (top :+ s"hiu$i").mkString(" "), lang))
  }

  private def fullRank(docs: org.apache.spark.sql.DataFrame) = {
    val scored = CalibrationStore.scoreRelation(docs)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("score").desc, col("doc_id"))
    val cwin = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    scored
      .withColumn("lang_rank", row_number().over(win))
      .withColumn("n_lang", count(lit(1)).over(cwin))
      .select(col("doc_id"), col("lang"), col("score"),
        col("lang_rank").cast("int").as("lang_rank"),
        (col("lang_rank") * 5 <= col("n_lang") * 4 + 4).cast("int").as("keep"))
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "lang", "score", "lang_rank", "keep")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getInt(3), r.getInt(4)))
      .sortBy(_._1).toList

  test("build + append == full rank recompute, ties split by doc_id, " +
      "cutoff moves with the batch") {
    val path = tmp()
    // en: 10 resident docs + 3 identical texts (one tie bucket);
    // de: 6 resident docs
    val resident = mk(corpus(1L to 10L map (_ * 2), "en") ++
      Seq((30L, "same same text here", "en"),
        (31L, "same same text here", "en"),
        (32L, "same same text here", "en")) ++
      corpus(41L to 46L, "de"))
    // batch skews the en distribution upward (top-weight words by
    // construction): resident keeps demote
    val batch = mk(highCorpus(100L to 109L, "en") ++ corpus(120L to 122L, "de"))
    CalibrationStore.build(resident, path)
    val served0 = rowsOf(CalibrationStore.served(spark, path))
    assert(served0 === rowsOf(fullRank(resident)))
    CalibrationStore.append(batch, path)
    val served1 = rowsOf(CalibrationStore.served(spark, path))
    assert(served1 === rowsOf(fullRank(resident.unionByName(batch))))
    // the tie group exists and is split: three docs share one score
    val ties = served1.filter(t => Set(30L, 31L, 32L)(t._1))
    assert(ties.map(_._3).distinct.size === 1)
    assert(ties.map(_._4).distinct.size === 3) // distinct ranks by doc_id
    // the batch demoted at least one resident keep (cutoff moved)
    val kept0 = served0.filter(_._5 == 1).map(_._1).toSet
    val kept1 = served1.filter(_._5 == 1).map(_._1).toSet
    assert((kept0 -- kept1).nonEmpty,
      "high-scoring batch should demote some resident keeps")
    spark.catalog.clearCache()
  }

  test("replay no-op; crash between scores and hist commits heals on retry") {
    val path = tmp()
    val resident = mk(corpus(1L to 8L, "en"))
    val b1 = mk(corpus(100L to 104L, "en"))
    CalibrationStore.build(resident, path)
    CalibrationStore.appendEpoch(b1, path, 7L)
    val before = rowsOf(CalibrationStore.served(spark, path))
    CalibrationStore.appendEpoch(b1, path, 7L) // full replay: no-op
    assert(rowsOf(CalibrationStore.served(spark, path)) === before)
    // simulate the crash window: commit ONLY the scores epoch of b2
    val b2 = mk(corpus(200L to 204L, "en"))
    EpochStore.commitEpoch(s"$path/scores", 8L) { tmpDir =>
      CalibrationStore.scoreRelation(b2)
        .write.mode("overwrite").parquet(tmpDir)
    }
    assert(EpochStore.committed(s"$path/scores", 8L))
    assert(!EpochStore.committed(s"$path/hist", 8L))
    // retrying the SAME append heals: hist delta derives from storage
    CalibrationStore.appendEpoch(b2, path, 8L)
    assert(EpochStore.committed(s"$path/hist", 8L))
    assert(rowsOf(CalibrationStore.served(spark, path)) ===
      rowsOf(fullRank(resident.unionByName(b1).unionByName(b2))))
    spark.catalog.clearCache()
  }

  test("rebuildHistogram closes the dangling epoch's ledger: the retry " +
      "is a no-op (no double count) and compaction unblocks") {
    val path = tmp()
    val resident = mk(corpus(1L to 8L, "en"))
    CalibrationStore.build(resident, path)
    // crash window: scores epoch committed, hist half missing
    val b = mk(corpus(100L to 104L, "en"))
    EpochStore.commitEpoch(s"$path/scores", 5L) { tmpDir =>
      CalibrationStore.scoreRelation(b)
        .write.mode("overwrite").parquet(tmpDir)
    }
    // the out-of-band recovery instead of the appender's retry
    CalibrationStore.rebuildHistogram(spark, path)
    val healed = rowsOf(CalibrationStore.served(spark, path))
    assert(healed === rowsOf(fullRank(resident.unionByName(b))))
    // the inevitable stream redelivery of epoch 5 must be a storage
    // no-op — double-applying its hist delta would inflate the
    // language histogram and corrupt every rank in the language
    CalibrationStore.appendEpoch(b, path, 5L)
    assert(rowsOf(CalibrationStore.served(spark, path)) === healed)
    // committed-id sets converge, so the fold is unblocked
    assert(EpochStore.committedIds(s"$path/scores") ===
      EpochStore.committedIds(s"$path/hist"))
    CalibrationStore.compact(spark, path)
    assert(rowsOf(CalibrationStore.served(spark, path)) === healed)
    spark.catalog.clearCache()
  }

  test("append-only contract: resident doc_id in a batch fails loudly") {
    val path = tmp()
    CalibrationStore.build(mk(corpus(1L to 5L, "en")), path)
    val bad = mk(corpus(Seq(3L, 100L), "en"))
    val e = intercept[IllegalArgumentException] {
      CalibrationStore.append(bad, path)
    }
    assert(e.getMessage.contains("append-only") ||
      e.getMessage.contains("already resident"))
    spark.catalog.clearCache()
  }

  test("streamed == batch; compaction preserves the served rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = tmp()
    val resident = mk(corpus(1L to 8L, "en") ++ corpus(41L to 44L, "de"))
    CalibrationStore.build(resident, path)
    val ms = MemoryStream[(Long, String, String)]
    val q = CalibrationStore.appendStream(
      ms.toDF().toDF("doc_id", "text", "lang"), path,
      java.nio.file.Files.createTempDirectory("calib-ck").toString)
    ms.addData(corpus(100L to 104L, "en").map(t => (t._1, t._2, t._3)): _*)
    q.processAllAvailable()
    ms.addData(corpus(200L to 204L, "de").map(t => (t._1, t._2, t._3)): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = rowsOf(CalibrationStore.served(spark, path))
    val union = resident
      .unionByName(mk(corpus(100L to 104L, "en")))
      .unionByName(mk(corpus(200L to 204L, "de")))
    assert(streamed === rowsOf(fullRank(union)))
    CalibrationStore.compact(spark, path)
    assert(rowsOf(CalibrationStore.served(spark, path)) === streamed)
    // epochs folded to one base per table
    assert(EpochStore.epochCount(s"$path/scores") === 1)
    assert(EpochStore.epochCount(s"$path/hist") === 1)
    spark.catalog.clearCache()
  }
}
