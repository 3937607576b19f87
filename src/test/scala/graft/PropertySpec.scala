package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Salted}
import graft.functions.Text

/** Property-based equivalence checks (SURVEY §5.2.2): the custom
  * operators must agree with naive reference implementations on
  * GENERATED data, not just hand-picked examples. Generators are
  * ScalaCheck `Gen`s sampled from fixed seeds, so failures reproduce.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val eventGen: Gen[List[(Long, Int, Double)]] =
    Gen.listOfN(120, for {
      k <- Gen.choose(0L, 4L)       // few keys -> dense per-key history
      t <- Gen.choose(0, 50)        // coarse times -> frequent ties
      v <- Gen.choose(-100.0, 100.0)
    } yield (k, t, v))

  test("property: AsOfJoin == naive per-row latest-prior lookup") {
    for (seed <- 1L to 8L) {
      val leftRaw = sample(eventGen, seed)
      val rightRaw = sample(eventGen, seed + 100)
        // unique (key, time) on the right so tie resolution is well-defined
        .groupBy(r => (r._1, r._2)).map { case ((k, t), rs) =>
          (k, t, rs.map(_._3).max) }.toList
      val left = leftRaw.zipWithIndex
        .map { case ((k, t, v), i) => (i.toLong, k, new Timestamp(t * 1000L), v) }
        .toDF("row_id", "k", "t", "v")
      val right = rightRaw
        .map { case (k, t, v) => (k, new Timestamp(t * 1000L), v) }
        .toDF("k", "t", "rv")
      val got = AsOfJoin(left, right, Seq("k"), "t", "t")
        .collect()
        .map { r =>
          val rv = r.fieldIndex("rv")
          r.getAs[Long]("row_id") ->
            (if (r.isNullAt(rv)) None else Some(r.getDouble(rv)))
        }
        .toMap
      val rightMap = rightRaw.groupBy(_._1)
      val want = leftRaw.zipWithIndex.map { case ((k, t, _), i) =>
        val prior = rightMap.getOrElse(k, Nil).filter(_._2 <= t)
        i.toLong -> (if (prior.isEmpty) None
                     else Some(prior.maxBy(_._2)._3))
      }.toMap
      assert(got === want, s"asof mismatch at seed $seed")
    }
  }

  test("property: saltedJoin == plain join on generated skew") {
    for (seed <- 1L to 5L) {
      val rows = sample(Gen.listOfN(300, for {
        k <- Gen.frequency(7 -> Gen.const("HOT"), 3 -> Gen.choose(0, 20).map("k" + _))
        v <- Gen.choose(0, 1000000)
      } yield (k, v)), seed)
      val dims = sample(Gen.listOfN(30, for {
        k <- Gen.oneOf(Gen.const("HOT"), Gen.choose(0, 20).map("k" + _))
        n <- Gen.alphaStr.map(_.take(5))
      } yield (k, n)), seed + 7).distinctBy(_._1)
      val facts = rows.toDF("k", "v")
      val dim = dims.toDF("k", "name")
      for (joinType <- Seq("inner", "left")) {
        val plain = facts.join(dim, Seq("k"), joinType)
          .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
        val salted = Salted.saltedJoin(facts, dim, Seq("k"), 5, joinType)
          .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
        assert(salted === plain, s"salted $joinType mismatch at seed $seed")
      }
    }
  }

  test("property: jaccard bounds, symmetry, and identity on generated sets") {
    val pairs = sample(Gen.listOfN(300, for {
      a <- Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct)
      b <- Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct)
    } yield (a, b)), 42L)
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      Text.jaccardLong(col("a"), col("b")).as("jab"),
      Text.jaccardLong(col("b"), col("a")).as("jba"),
      Text.jaccardLong(col("a"), col("a")).as("jaa"),
      size(col("a")).as("na")).collect()
    rows.foreach { r =>
      val (jab, jba, jaa, na) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getInt(3))
      assert(jab >= 0.0 && jab <= 1.0)
      assert(jab === jba)                       // symmetric
      assert(jaa === (if (na == 0) 0.0 else 1.0)) // identity (empty-set convention)
    }
  }

  test("property: minhash estimate is a [0,1] similarity consistent with jaccard order") {
    // exact-equal sets estimate 1.0; disjoint sets estimate ~0
    val pairs = sample(Gen.listOfN(80, for {
      base <- Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8)))
    } yield base.distinct.mkString(" ")), 7L)
    val df = pairs.toDF("text")
    val sig = Text.minHash(Text.shingleHashes(col("text"), 1))
    val rows = df.select(Text.sigEstimate(sig, sig).as("self")).collect()
    rows.foreach(r => assert(r.getDouble(0) === 1.0))
  }

  test("property: span coverage == brute-force interval union on generated corpora") {
    // small vocab + short docs force heavy window collisions, doc
    // clones force saturated coverage, and sub-W docs exercise the
    // empty-window branch — shapes the fixture corpus doesn't hit.
    val W = 4
    val docGen: Gen[List[String]] = Gen.listOfN(40, for {
      n <- Gen.choose(1, 20) // some docs shorter than W
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" "))
    for (seed <- 1L to 6L) {
      val texts = sample(docGen, seed)
      // clone a few docs verbatim -> guaranteed full-coverage rows
      val corpus = (texts ++ texts.take(5)).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val wins = corpus.flatMap { case (id, text) =>
        val tk = text.trim.toLowerCase.split("\\s+")
        if (tk.length >= W)
          (0 to tk.length - W).map(i => (id, i + 1, tk.slice(i, i + W).mkString(" ")))
        else Nil
      }
      val dupSet = wins.groupBy(_._3).filter(_._2.size > 1).keySet
      val expected = corpus.map { case (id, text) =>
        val tk = text.trim.toLowerCase.split("\\s+")
        val dups = wins.filter(x => x._1 == id && dupSet(x._3))
        val covered = dups.flatMap(x => x._2 until (x._2 + W)).toSet.size
        id -> ((tk.length.toLong, dups.size.toLong, covered.toLong))
      }.toMap
      val got = graft.queries.TrainingOps
        .spanCoverageOn(corpus.toDF("doc_id", "text"), W)
        .collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got === expected, s"seed $seed")
      // the count-min prefilter path must be answer-identical — on
      // these tiny-vocab corpora nearly every window repeats, the
      // sketch's worst case for pruning and the best stress for the
      // no-false-negatives contract
      val gotCms = graft.queries.TrainingOps
        .spanCoverageOn(corpus.toDF("doc_id", "text"), W, cmsPrefilter = true)
        .collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(gotCms === expected, s"seed $seed (cms path)")
      assert(expected.values.exists(_._3 > 0), s"seed $seed: degenerate fixture")
    }
  }

  test("property: TopCellsAgg == sorted.take(n), merge-order invariant") {
    // The bounded top-n buffer behind the relation-path codebook
    // assignment must be a commutative/associative monoid — that is
    // what makes big-codebook cell assignment deterministic under any
    // task order and partial-aggregation split.
    val agg = new graft.functions.Vectors.TopCellsAgg(3)
    val gen = Gen.listOf(for {
      s <- Gen.choose(-100, 100).map(_ / 16.0)
      id <- Gen.choose(0, 50)
    } yield (s, id))
    for (seed <- 1L to 8L) {
      val xs = sample(gen, seed)
      val expected = xs.sorted.take(3).map(_._2)
      // sequential reduce in listed order
      val seqBuf = xs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(seqBuf) === expected, s"seed $seed sequential")
      // arbitrary split + merge (partial aggregation), reversed order
      val (l, r) = xs.splitAt(xs.length / 3)
      val merged = agg.merge(
        r.reverse.foldLeft(agg.zero)(agg.reduce),
        l.reverse.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === expected, s"seed $seed merged")
      // merging with zero is identity
      assert(agg.finish(agg.merge(seqBuf, agg.zero)) === expected)
    }
  }
}
