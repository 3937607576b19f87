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
