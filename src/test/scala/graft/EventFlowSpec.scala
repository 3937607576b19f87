package graft

import org.apache.spark.sql.functions._

import graft.queries.{Registry, Similarity}

/** Structural invariants of the round-5 flow/statistics queries
  * (q119–q125). These are oracle-hash-checked by the driver; the
  * cases here pin the properties a hash can't express — the algebra
  * that must hold on ANY data, not just the fixture.
  */
class EventFlowSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = Registry.queries(name)(spark, sf)

  test("q121 funnel counts are monotone non-increasing across steps") {
    val r = run("q121_funnel_steps").head()
    val (nv, nc, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv >= nc && nc >= np && nv > 0)
    // rates are consistent with the counts they summarize
    assert(math.abs(r.getDouble(3) - nc.toDouble / nv) < 1e-4 + 1e-9)
    assert(math.abs(r.getDouble(4) - np.toDouble / nc) < 1e-4 + 1e-9)
  }

  test("q122 transition rows partition each source state's outgoing mass") {
    val rows = run("q122_markov_transitions").collect()
    assert(rows.nonEmpty)
    // per from_type: sum(n) == out_n exactly, sum(p) == 1 within
    // 25 rows of 4dp rounding
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val outN = g.map(_.getLong(3)).distinct
      assert(outN.size === 1)
      assert(g.map(_.getLong(2)).sum === outN.head)
      assert(math.abs(g.map(_.getDouble(4)).sum - 1.0) < 25 * 5e-5)
    }
  }

  test("q123 novelty: first doc fully novel; all rates within [0, 1]") {
    val rows = run("q123_shingle_novelty").collect()
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(1) > 0 && first.getDouble(3) === 1.0)
    rows.filter(_.getLong(1) > 0).foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // novel shingles across docs count every distinct shingle exactly once
    val distinctShingles = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(explode(array_distinct(
        graft.functions.Text.shingles(col("text"), 3))).as("sh"))
      .select(countDistinct(col("sh"))).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum === distinctShingles)
  }

  test("q120 anomalies are a subset of the dense grid with |z| >= 2") {
    val rows = run("q120_hourly_anomaly").collect()
    assert(rows.nonEmpty) // fixture has quiet night hours → anomalies exist
    rows.foreach(r => assert(math.abs(r.getDouble(3)) >= 2.0))
  }

  test("q124 covariance: upper triangle, non-negative diagonal, PSD-consistent") {
    val cov = Similarity
      .covarianceMatrix(spark.read.parquet(s"$sf/embeddings.parquet"))
      .collect()
    val d = Similarity.Dim
    assert(cov.length === d * (d + 1) / 2)
    cov.foreach { r =>
      assert(r.getInt(0) <= r.getInt(1))
      if (r.getInt(0) == r.getInt(1)) assert(r.getDouble(2) >= 0.0)
      // Cauchy–Schwarz up to the 6dp rounding the pipeline applies
      else {
        val (i, j) = (r.getInt(0), r.getInt(1))
        val vi = cov.find(x => x.getInt(0) == i && x.getInt(1) == i).get.getDouble(2)
        val vj = cov.find(x => x.getInt(0) == j && x.getInt(1) == j).get.getDouble(2)
        assert(math.abs(r.getDouble(2)) <= math.sqrt(vi * vj) + 1e-3)
      }
    }
  }

  test("q125 correlations are bounded by 1 in absolute value") {
    run("q125_dim_correlation").collect().foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-4)
    }
  }

  test("q119 PMI output carries only pairs above the support floor") {
    val rows = run("q119_bigram_pmi").collect()
    assert(rows.length === 50)
    rows.foreach(r => assert(r.getLong(2) >= 5))
    // ranked by rounded pmi descending
    val pmis = rows.map(_.getDouble(3)).toSeq
    assert(pmis === pmis.sorted.reverse)
  }
}
