package graft

import org.apache.spark.sql.functions._

import graft.engine.EpochStore

/** Cross-store read-consistency: a composed reader (q146/q157 read
  * five persisted stores; ContainmentStore's state view reads four
  * tables) that resolves each store's manifest independently can
  * straddle a maintenance flip — store A read pre-tick, store B
  * post-tick — observing a MIXED epoch set. [[EpochStore.snapshot]]
  * pins every live version up front; this spec demonstrates the
  * hazard without it and its absence with it, plus the
  * displaced-version retention that keeps a pinned read alive across
  * the flip.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def mkStore(tag: String, rows: Seq[(Long, String)]): String = {
    val root = java.nio.file.Files.createTempDirectory(tag)
      .resolve("t").toString
    EpochStore.create(root) { base =>
      rows.take(2).toDF("id", "v").write.mode("overwrite").parquet(base)
    }
    rows.drop(2).zipWithIndex.foreach { case (r, i) =>
      EpochStore.commitEpoch(root, i.toLong) { tmp =>
        Seq(r).toDF("id", "v").write.mode("overwrite").parquet(tmp)
      }
    }
    root
  }

  private def epochSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("epoch").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet

  test("unpinned composed read straddling a two-store tick sees a mixed " +
      "epoch set; a pinned snapshot does not, and survives the flip") {
    val rows = Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
    val storeA = mkStore("snap-a", rows)
    val storeB = mkStore("snap-b", rows)
    val pre = Set("base", "0", "1")

    // the consistent snapshot, pinned BEFORE the tick
    val snap = EpochStore.snapshot(Seq(storeA, storeB))
    // an unpinned reader resolves A's manifest now ...
    val aUnpinned = epochSet(EpochStore.read(spark, storeA))
    assert(aUnpinned === pre)

    // ... then the maintenance tick folds BOTH stores (value-
    // preserving, one manifest flip each) ...
    EpochStore.compact(spark, storeA)
    EpochStore.compact(spark, storeB)

    // ... and the unpinned reader's LATE resolution of B sees the
    // post-fold epoch set: a mixed composed view (A={base,0,1},
    // B={base}) — exactly what epoch-membership logic (census,
    // redelivery exclusion) must never be handed
    val bUnpinned = epochSet(EpochStore.read(spark, storeB))
    assert(bUnpinned === Set("base"))
    assert(aUnpinned !== bUnpinned, "the hazard this spec documents")

    // the pinned snapshot reads BOTH stores at their pre-tick
    // versions: one consistent epoch set, values intact (the
    // displaced version is retained for exactly this in-flight read)
    val aPinned = snap.read(spark, storeA)
    val bPinned = snap.read(spark, storeB)
    assert(epochSet(aPinned) === pre)
    assert(epochSet(bPinned) === pre)
    assert(aPinned.select("id", "v").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet ===
      rows.toSet)
    assert(bPinned.select("id", "v").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet ===
      rows.toSet)
    spark.catalog.clearCache()
  }
}
