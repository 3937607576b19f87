package graft

import org.apache.spark.sql.functions._

import graft.queries.{SharedStages, TextOps}

/** The session-shared stage table must be a pure materialization: the
  * round-6 change routed q54/q78/q100/q110 through ONE persisted pair
  * table, and q100 additionally derives its survivor-restricted pair
  * set by filtering that table instead of recomputing — both
  * transformations must be invisible in the values.
  */
class SharedStagesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def pairRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_a"), col("doc_b"), col("jac"))
      .collect().map(_.toSeq).toSet

  test("shared pair table == direct ngramNearDupPairsOn over the capped corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < TextOps.ExactBaselineDocCap)
    val shared = pairRows(SharedStages.cappedNearDupPairs(spark, dir))
    val direct = pairRows(TextOps.ngramNearDupPairsOn(docs))
    assert(direct.nonEmpty, "fixture must contain near-dup pairs")
    assert(shared === direct)
    // second call must hit the memo (same path, no rebuild) — the
    // whole point of the stage is computing once per session
    val again = SharedStages.cappedNearDupPairs(spark, dir)
    assert(pairRows(again) === direct)
    spark.catalog.clearCache()
  }

  test("shared cluster + verdict tables == their from-scratch computations") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < TextOps.ExactBaselineDocCap)
    val sharedComps = SharedStages.cappedNearDupComponents(spark, dir)
      .select(col("id"), col("comp")).collect().map(_.toSeq).toSet
    val directComps = graft.operators.ConnectedComponents
      .components(TextOps.ngramNearDupPairsOn(docs)
        .select(col("doc_a"), col("doc_b")))
      .select(col("id"), col("comp")).collect().map(_.toSeq).toSet
    assert(directComps.nonEmpty)
    assert(sharedComps === directComps)
    spark.catalog.clearCache()
    val sharedVerdicts = SharedStages.dedupVerdictsTable(spark, dir)
      .collect().map(_.toSeq).toSet
    val directVerdicts = TextOps.dedupVerdictsOn(docs)
      .collect().map(_.toSeq).toSet
    assert(sharedVerdicts === directVerdicts)
    spark.catalog.clearCache()
  }

  test("dedupVerdictsOn(sharedPairs) == dedupVerdictsOn from scratch") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < TextOps.ExactBaselineDocCap)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("verdict"), col("canonical_id"))
        .collect().map(_.toSeq).toSeq
    val viaShared = rows(TextOps.dedupVerdictsOn(docs,
      sharedPairs = Some(SharedStages.cappedNearDupPairs(spark, dir))))
    spark.catalog.clearCache()
    val scratch = rows(TextOps.dedupVerdictsOn(docs))
    assert(viaShared.nonEmpty)
    assert(viaShared === scratch)
    spark.catalog.clearCache()
  }
}
