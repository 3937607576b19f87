package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.queries.Registry

/** Contract verification for the count-min-sketch heavy-hitter query
  * (q72), which has no SQL oracle: estimates must respect the CMS
  * guarantee against exact counts, and the sample+sketch pipeline
  * must recover the exact top tokens.
  */
class SketchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("q72 CMS estimates: est >= exact and est <= exact + eps*N; top-20 recall >= 0.9") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val exact = docs.select(explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalTokens = exact.values.sum
    val eps = 0.001
    val got = Registry.queries("q72_token_cms")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.length === 20)
    got.foreach { case (tok, est) =>
      val truth = exact(tok)
      assert(est >= truth, s"CMS must never underestimate: $tok est $est < $truth")
      assert(est <= truth + eps * totalTokens,
        s"$tok est $est exceeds $truth + ${eps * totalTokens}")
    }
    val exactTop20 = exact.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(20).map(_._1).toSet
    val recall = got.map(_._1).count(exactTop20.contains).toDouble / 20
    info(s"q72 recall vs exact top-20: $recall")
    assert(recall >= 0.9, s"recall $recall")
  }

  test("bloom prefilter (q38): no false negatives, and it actually prunes") {
    import org.apache.spark.sql.graftbridge.BloomBridge
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloomBytes = urgent
      .agg(BloomBridge.bloomAgg(col("o_orderkey"), 10000L, 81920L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val total = lineitem.count()
    val prefiltered = lineitem
      .filter(BloomBridge.mightContain(lit(bloomBytes), col("l_orderkey")))
      .count()
    val exact = lineitem.join(urgent,
      lineitem("l_orderkey") === urgent("o_orderkey"), "left_semi").count()
    info(s"rows: total $total -> bloom $prefiltered -> exact $exact")
    assert(prefiltered >= exact, "bloom must never drop a true match")
    assert(prefiltered < total,
      "bloom must prune something on a selective build side")
    // false-positive rate within an order of magnitude of the
    // configured capacity's nominal rate (loose, deterministic bound)
    val fpRate = (prefiltered - exact).toDouble / (total - exact)
    assert(fpRate <= 0.1, s"false-positive rate $fpRate")
  }

  test("q102 HLL rollup: per-day and union estimates within 5% of exact") {
    val dir = "/root/testdata/sf0.01"
    val got = Registry.queries("q102_hll_rollup")(spark, dir).collect()
    spark.catalog.clearCache()
    val ev = graft.engine.Sources.Tables(spark, dir).events
    val exactByDay = ev
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exactTotal = ev.select("user_id").distinct().count().toDouble
    assert(got.nonEmpty)
    got.foreach { r =>
      val day = r.getDate(0).toString
      val est = r.getLong(2).toDouble
      val exact = exactByDay(day).toDouble
      assert(math.abs(est - exact) / exact <= 0.05, s"$day: $est vs $exact")
      // the union column repeats per row; check it once per row anyway
      assert(math.abs(r.getLong(3).toDouble - exactTotal) / exactTotal <= 0.05)
    }
  }

  test("q115 theta overlap: every estimate within 5% of q113's exact values") {
    // q113 is the exact source-pair Jaccard matrix over the same
    // distinct 3-gram shingle relation — the ground truth for the
    // sketch estimates. MEASURED regimes (round 16): sf0.01
    // per-source cardinalities (1063–1462 distinct hashes) sit UNDER
    // K = 4096, so this fixture exercises exact mode (estimates ==
    // exact, the golden pins are exact-mode outputs); genuine
    // estimation mode engages at sf0.1 (9.8k–10.9k per source),
    // where the full replay oracle hash-proves the estimator, and in
    // the small-K estimation-mode test below, which bounds its error
    // directly on this fixture.
    val exact = Registry.queries("q113_source_overlap")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    spark.catalog.clearCache()
    val est = Registry.queries("q115_theta_source_overlap")(spark, dir).collect()
    assert(est.length === exact.size, "pair matrices must cover the same pairs")
    est.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (nCommon, nA, nB) = exact(key)
      def within(e: Long, x: Long, what: String): Unit =
        assert(math.abs(e - x) <= math.max(0.05 * x, 2.0),
          s"$key $what: est $e vs exact $x")
      within(r.getLong(2), nCommon, "intersection")
      within(r.getLong(3), nA, "n_a")
      within(r.getLong(4), nB, "n_b")
      within(r.getLong(5), nA + nB - nCommon, "union")
    }
  }

  test("q116 theta novelty: rates within 0.05 of the exact co-occurrence answer") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = docs.select(col("source"), explode(array_distinct(
        Text.shingles(col("text"), 3))).as("sh"))
      .distinct().persist()
    sh.count()
    val per = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    // a shingle is novel to its source iff no OTHER source carries it
    val novel = sh.groupBy(col("sh"))
      .agg(countDistinct(col("source")).as("ns"), first(col("source")).as("source"))
      .filter(col("ns") === 1)
      .groupBy(col("source")).agg(count(lit(1)).as("novel"))
    val exact = per.join(novel, Seq("source"), "left")
      .select(col("source"), col("n"),
        coalesce(col("novel"), lit(0L)).as("novel"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    sh.unpersist()
    val est = Registry.queries("q116_theta_novelty")(spark, dir).collect()
    assert(est.length === exact.size)
    est.foreach { r =>
      val (n, novel) = exact(r.getString(0))
      assert(math.abs(r.getLong(1) - n) <= math.max(0.05 * n, 2.0),
        s"${r.getString(0)} n_est ${r.getLong(1)} vs exact $n")
      val exactRate = novel.toDouble / n
      assert(math.abs(r.getDouble(3) - exactRate) <= 0.05,
        s"${r.getString(0)} novelty_rate ${r.getDouble(3)} vs exact $exactRate")
    }
  }

  test("KMV estimation mode: small-K per-source estimates land within " +
      "sampling error of exact cardinalities (and theta actually engages)") {
    // The production K values hold every sf0.01 source exactly (the
    // regime note on the q115 test), so force estimation mode here
    // with K = 256: per-source cardinalities (~1.1k–1.5k) are 4–6×
    // past the retained set and the estimate is genuinely sampled.
    // KMV standard error is ~1/sqrt(K) ≈ 6.25%; a 4-sigma band per
    // source keeps the test deterministic-in-practice while still
    // failing on any estimator-math regression (the estimate itself
    // is exactly reproducible — fixed hashes, no RNG).
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val k = 256
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val hs = docs.select(col("source"),
      explode(Text.md5ShingleHashes(col("text"), 3)).as("h"))
    val exact = hs.groupBy(col("source"))
      .agg(countDistinct(col("h")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kmv = ColumnBridge.column(graft.expressions.KmvSketchAgg(
      ColumnBridge.expression(col("h")), k + 1).toAggregateExpression())
    val est = hs.groupBy(col("source")).agg(kmv.as("buf"))
      .withColumn("theta", when(size(col("buf")) <= k, lit(2147483647L))
        .otherwise(element_at(col("buf"), k + 1)))
      .select(col("source"), col("theta"),
        round(size(filter(col("buf"), h => h < col("theta")))
          .cast("double") * lit(2147483647.0) / col("theta"))
          .cast("long").as("est"))
      .collect()
    assert(est.nonEmpty && est.length === exact.size)
    est.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) < 2147483647L,
        s"$src must be in estimation mode at K=$k")
      val n = exact(src).toDouble
      val rel = math.abs(r.getLong(2) - n) / n
      info(f"$src%-12s exact ${n.toLong} est ${r.getLong(2)} rel $rel%.4f")
      assert(rel <= 4.0 / math.sqrt(k.toDouble),
        f"$src: est ${r.getLong(2)} vs exact ${n.toLong} (rel $rel%.4f)")
    }
  }

  test("q72 is deterministic for fixed input (fixed sketch seed)") {
    val a = Registry.queries("q72_token_cms")(spark, dir).collect().toSeq
    val b = Registry.queries("q72_token_cms")(spark, dir).collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("q117 histogram quantiles: ≤1% relative error vs exact, bounded state, additive merge") {
    val events = graft.engine.Sources.Tables(spark, dir).events
    val rows = events.select(to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
    val ord = Ordering.by[java.time.LocalDate, Long](_.toEpochDay)
    val lo = rows.map(_._1).min(ord)
    val hi = rows.map(_._1).max(ord)
    val ranges = Map(
      "all" -> ((lo, hi)),
      "first_week" -> ((lo, lo.plusDays(6))),
      "rest" -> ((lo.plusDays(7), hi)))
    val got = Registry.queries("q117_hist_quantile_rollup")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.size === 9, "3 ranges x 3 quantiles")
    got.foreach { case ((rn, p), (n, est)) =>
      val (a, b) = ranges(rn)
      val sub = rows.filter { case (d, _) =>
        !d.isBefore(a) && !d.isAfter(b) }.map(_._2).sorted
      assert(n === sub.length.toLong, s"$rn row count")
      // exact lower quantile: least v with rank >= ceil(p*n)
      val exact = sub(math.ceil(p * sub.length).toInt - 1)
      val rel = math.abs(est - exact) / exact
      info(f"$rn%-11s p=$p exact=$exact%.4f est=$est%.4f rel=$rel%.5f")
      // bucket width is <= 1/128 relative (plus centi-unit floor);
      // the midpoint decode halves it — 1% is a loose deterministic
      // ceiling for any value >= 1
      assert(rel <= 0.01, s"$rn p=$p rel error $rel")
    }
    // additive merge: disjoint sub-range counts partition the total
    assert(got(("first_week", 0.5))._1 + got(("rest", 0.5))._1 ===
      got(("all", 0.5))._1)
    // bounded sketch state: per-day histogram rows are capped by the
    // bucket count, not the event count (9 decades < 2048 buckets)
    val buckets = events.select(
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("x"))
      .withColumn("e", length(bin(col("x"))) - 1)
      .select(expr("CASE WHEN x < 256 THEN x ELSE " +
        "(e - 7) * 128 + shiftright(x, e - 7) - 128 + 256 END").as("b"))
      .distinct().count()
    info(s"distinct buckets over the whole corpus: $buckets")
    assert(buckets <= 2048, s"bucket-count state bound violated: $buckets")
  }
}
