package graft

import graft.queries.Registry

/** Registry integrity: the declared surface is what the driver sees.
  * A duplicate name would silently shadow a query in the Map; a
  * query that only fails at driver time would waste a whole round.
  */
class RegistrySpec extends SparkSpec {

  test("query names are unique (no silent Map shadowing)") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size,
      names.groupBy(identity).filter(_._2.size > 1).keys.mkString(", "))
  }

  test("every oracle key has a query; names are well-formed") {
    val qnames = Registry.queries.keySet
    Registry.oracleSql.keySet.foreach(k => assert(qnames.contains(k)))
    qnames.foreach(n => assert(n.matches("q[0-9]+_[a-z0-9_]+"), n))
  }

  test("the declared surface never shrinks: every family object is " +
      "non-empty, wired into Registry.all, and q1..q156 all resolve") {
    // The round-8 TextOps split showed the failure mode: a file split
    // can silently drop a family from Registry.all (or break its
    // object) while the driver artifacts keep passing on what's left.
    // Force-load every family object and pin the historical surface.
    import graft.queries._
    val families: Map[String, Seq[Q]] = Map(
      "Relational" -> Relational.queries,
      "Windows" -> Windows.queries,
      "JsonOps" -> JsonOps.queries,
      "EventOps" -> EventOps.queries,
      "TextOps" -> TextOps.queries,
      "NearDupOps" -> NearDupOps.queries,
      "CorpusStatsOps" -> CorpusStatsOps.queries,
      "SampleOps" -> SampleOps.queries,
      "Similarity" -> Similarity.queries,
      "MultimodalOps" -> MultimodalOps.queries,
      "TrainingOps" -> TrainingOps.queries,
      "TokenizerOps" -> TokenizerOps.queries,
      "QualityOps" -> QualityOps.queries,
      "LayoutOps" -> LayoutOps.queries)
    val all = Registry.all.map(_.name).toSet
    families.foreach { case (fam, qs) =>
      assert(qs.nonEmpty, s"$fam lost its queries")
      qs.foreach(q => assert(all.contains(q.name),
        s"$fam's ${q.name} is not wired into Registry.all"))
    }
    val ids = all.map(_.drop(1).takeWhile(_.isDigit).toInt)
    (1 to 172).foreach(i =>
      assert(ids.contains(i), s"q$i vanished from the registry"))
  }

  test("no declared query plans a CartesianProduct") {
    // The capped exact baselines (q65/q54) deliberately cross-join,
    // but their capped inputs must stay under the broadcast threshold
    // so Spark plans BroadcastNestedLoopJoin — an unpartitioned
    // CartesianProduct anywhere in the declared surface is a scale
    // regression (full plan lint swept 2026-08: zero offenders).
    val offenders = Registry.all.flatMap { q =>
      val plan = q.fn(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"CartesianProduct in: ${offenders.mkString(", ")}")
  }

  test("every declared query executes at sf0.001") {
    val failures = Registry.all.flatMap { q =>
      try { q.fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(q.name -> e.getMessage) }
    }
    assert(failures.isEmpty, failures.map(_._1).mkString(", "))
  }
}
