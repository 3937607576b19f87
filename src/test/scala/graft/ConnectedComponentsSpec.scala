package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two cliques and an isolated pair resolve to min-id components") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (1, 3),      // clique {1,2,3}
      (10, 11), (11, 12), (10, 12), // clique {10,11,12}
      (20, 21))                     // pair {20,21}
    val got = comps(edges)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a long chain converges in O(log n) rounds via pointer jumping") {
    import spark.implicits._
    // 64-node chain: pure neighbor-min would need 63 rounds; with
    // path halving the maxIters=12 cap must suffice (2^12 >> 64).
    // driverCutoff=0 forces the DISTRIBUTED loop this test pins.
    val edges = (0L until 63L).map(i => (i, i + 1))
    val got = ConnectedComponents
      .components(edges.toDF("a", "b"), driverCutoff = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 64)
    assert(got.values.forall(_ === 0L),
      s"chain must collapse to component 0, got ${got.values.toSet}")
  }

  test("reliable-checkpoint mode: the 64-chain converges through durable round snapshots") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    try {
      val edges = (0L until 63L).map(i => (i, i + 1))
      val got = ConnectedComponents
        .components(edges.toDF("a", "b"), checkpointDir = Some(dir),
          driverCutoff = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size === 64)
      assert(got.values.forall(_ === 0L),
        s"chain must collapse to component 0, got ${got.values.toSet}")
      // the rounds actually went through the durable path
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliable mode must write checkpoint files")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("transitive near-dup A~B~C keeps exactly one canonical doc") {
    // the dedup motivation: A~B and B~C but A!~C directly — all three
    // must land in one cluster with min id kept
    val got = comps(Seq((100L, 200L), (200L, 300L)))
    assert(got === Map(100L -> 100L, 200L -> 100L, 300L -> 100L))
  }

  test("non-convergence within the cap throws instead of returning partial labels") {
    import spark.implicits._
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      ConnectedComponents.components(edges, maxIters = 1, driverCutoff = 0)
    }
  }

  test("driver fast path == distributed loop on a dense random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph with cliques, chains, and
    // isolated pairs mixed: the fast path must label identically
    val rnd = new scala.util.Random(7)
    val edges = (Seq.tabulate(400)(i =>
        (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong)) ++
      (1000L until 1063L).map(i => (i, i + 1)))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("a", "b")
    def m(res: org.apache.spark.sql.DataFrame) =
      res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = m(ConnectedComponents.components(df))
    val dist = m(ConnectedComponents.components(df, driverCutoff = 0))
    assert(fast === dist)
    assert(fast.nonEmpty)
  }

  test("q78 over the sf0.01 fixture: clusters cover q54's pairs exactly") {
    val dir = "/root/testdata/sf0.01"
    val q78 = graft.queries.Registry.queries("q78_dedup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = graft.queries.Registry.queries("q54_ngram_neardup")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every near-dup pair is in one cluster…
    pairs.foreach { case (a, b) =>
      assert(q78(a) === q78(b), s"pair ($a,$b) split across clusters")
    }
    // …and clustered docs are exactly the docs appearing in pairs
    assert(q78.keySet === pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // exactly one kept (the min) per cluster
    q78.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.keys.min === comp)
    }
    spark.catalog.clearCache()
  }
}
