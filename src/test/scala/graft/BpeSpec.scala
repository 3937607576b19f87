package graft

import org.apache.spark.sql.functions._

import graft.queries.TokenizerOps

/** BPE merge induction vs an independent plain-Scala reference: the
  * distributed learner (delimited-string replace over a vocab-bounded
  * relation) must reproduce classic BPE — per-position pair counts,
  * (count DESC, pair ASC) argmax, LEFT-TO-RIGHT non-overlapping merge
  * application — on corpora where the expected merges are known,
  * including the overlap case ("aaaa" + merge (a,a) → [aa, aa], never
  * [aa, a, a]).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference BPE over a word-frequency map. */
  private def refBpe(wf: Map[String, Long],
                     rounds: Int): Seq[(Int, String, String, Long)] = {
    var words: Vector[(Vector[String], Long)] =
      wf.toVector.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Vector.newBuilder[(Int, String, String, Long)]
    var r = 1
    var stop = false
    while (r <= rounds && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (sy, f) =>
        sy.indices.dropRight(1).foreach { i =>
          val k = (sy(i), sy(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.toVector
          .minBy { case ((x, y), n) => (-n, x, y) }
        out += ((r, a, b, c))
        words = words.map { case (sy, f) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) {
              nb += (a + b); i += 2
            } else { nb += sy(i); i += 1 }
          }
          (nb.result(), f)
        }
        r += 1
      }
    }
    out.result()
  }

  private def learned(docs: Seq[String], rounds: Int) =
    TokenizerOps.learnBpe(docs.toDF("text"), rounds)
      .map(m => (m.rank, m.left, m.right, m.count))

  private def wfOf(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  test("learned merges == reference BPE on the classic Sennrich-style corpus") {
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest newest",
      "newest newest newest widest widest widest")
    val got = learned(docs, 8)
    val exp = refBpe(wfOf(docs), 8)
    assert(exp.nonEmpty)
    assert(got === exp)
  }

  test("overlapping pair merges left-to-right, and ties break by (count desc, pair asc)") {
    // "aaaa": pair (a,a) occurs 3 times per word; after the merge the
    // word must be [aa, aa] (left-to-right non-overlap), so round 2's
    // top pair is (aa, aa) — a wrong greedy would leave [aa, a, a]
    // and pick (aa, a). "bc bc" forces a count tie with ("b","c") at
    // some round — reference and learner must break it identically.
    val docs = Seq("aaaa aaaa aaaa bc bc bc cb cb cb")
    val got = learned(docs, 6)
    val exp = refBpe(wfOf(docs), 6)
    assert(got === exp)
    assert(got.head._2 == "a" && got.head._3 == "a")
    assert(got(1)._2 == "aa" && got(1)._3 == "aa",
      s"round 2 must merge [aa][aa], got ${got(1)}")
  }

  test("exhaustion: loop stops when every word is a single symbol, both paths agree") {
    val docs = Seq("ab ab ab cd cd")
    val got = learned(docs, 12)
    val exp = refBpe(wfOf(docs), 12)
    // only 2 merges exist ("a"+"b", "c"+"d") — far under the budget
    assert(got === exp)
    assert(got.size == 2)
  }

  /** Apply a learned merge list to one word, left-to-right
    * non-overlapping per rank — the standard BPE encode.
    */
  private def applyMerges(w: String,
      merges: Seq[(Int, String, String, Long)]): Vector[String] =
    merges.foldLeft(w.map(_.toString).toVector) { case (sy, (_, a, b, _)) =>
      val nb = Vector.newBuilder[String]
      var i = 0
      while (i < sy.length) {
        if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) {
          nb += (a + b); i += 2
        } else { nb += sy(i); i += 1 }
      }
      nb.result()
    }

  test("q143 corpus emit matches a full plain-Scala encode+pack") {
    val docs = Seq(
      "low low low lower newest newest",
      "widest newest low bc",
      "aaaa bc cb aaaa low")
    val dir = java.nio.file.Files.createTempDirectory("bpe-emit").toString
    docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val merges = refBpe(wfOf(docs), TokenizerOps.BpeRounds)
    val wf = wfOf(docs)
    val symCounts = wf.toSeq
      .flatMap { case (w, f) => applyMerges(w, merges).map(_ -> f) }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val ids = symCounts.toSeq.sortBy { case (s, n) => (-n, s) }
      .zipWithIndex.map { case ((s, _), i) => s -> (i + 1) }.toMap
    val perDoc = docs.zipWithIndex.map { case (t, i) =>
      val seq = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => applyMerges(w, merges).map(ids))
      (i.toLong, seq.size.toLong,
        seq.zipWithIndex.map { case (id, p) => (p + 1).toLong * id }.sum)
    }
    val starts = perDoc.map(_._2).scanLeft(0L)(_ + _).init
    val expected = perDoc.zip(starts).map { case ((d, n, ck), st) =>
      (d, n, ck, st, st / 2048L, st % 2048L,
        if ((st + n - 1) / 2048L > st / 2048L) 1 else 0)
    }

    val got = graft.queries.Registry
      .queries("q143_bpe_corpus_emit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6))).toSeq
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("fixture run produces the declared round budget and strictly ranked rows") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val ms = TokenizerOps.learnBpe(docs, TokenizerOps.BpeRounds)
    assert(ms.size == TokenizerOps.BpeRounds,
      s"fixture vocabulary exhausted early: ${ms.size} merges")
    assert(ms.map(_.rank) == (1 to TokenizerOps.BpeRounds))
    // counts are non-increasing only within equal-pair regimes is NOT
    // guaranteed by BPE (a merge can create a hotter pair), but every
    // count must be >= 1 and every merged symbol non-empty
    ms.foreach { m =>
      assert(m.count >= 1)
      assert(m.left.nonEmpty && m.right.nonEmpty)
    }
  }
}
