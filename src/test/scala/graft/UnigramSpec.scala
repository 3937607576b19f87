package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.TokenizerOps

/** q162's unigram-LM segmenter against an INDEPENDENT plain-Scala
  * reference (the BpeSpec discipline): vocabulary induction and the
  * Viterbi DP are re-implemented here with explicit lexicographic
  * (max score, then fewest pieces) tie-breaking, so the equality
  * proves the engine's single-integer packing (1024·score − pieces)
  * realizes exactly that rule — including on an ENGINEERED tie the
  * fixture corpus may never hit.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // ---- the reference implementation (explicit tie-break, no packing)

  private def refPieces(w: String): Set[String] =
    (for {
      i <- 0 until w.length
      l <- 1 to math.min(TokenizerOps.UniPieceMaxLen, w.length - i)
    } yield w.substring(i, i + l)).toSet

  private def refVocab(wordFreq: Map[String, Long]): Map[String, Long] = {
    val pf = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- wordFreq; p <- refPieces(w)) pf(p) += f
    val multi = pf.iterator.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, f) => (-f, p) }
      .take(TokenizerOps.UniVocabSize)
    (multi ++ pf.iterator.filter(_._1.length == 1))
      .map { case (p, f) => p -> f * p.length * p.length }.toMap
  }

  /** (total score, piece count) of the best segmentation — max score,
    * fewest pieces on ties, explicitly.
    */
  private def refSeg(w: String, vocab: Map[String, Long]): (Long, Long) = {
    val none = (Long.MinValue, Long.MinValue)
    val best = Array.fill(w.length + 1)(none)
    best(0) = (0L, 0L)
    for {
      i <- 1 to w.length
      j <- math.max(0, i - TokenizerOps.UniPieceMaxLen) until i
      if best(j) != none
      s <- vocab.get(w.substring(j, i))
    } {
      val cand = (best(j)._1 + s, best(j)._2 - 1)
      if (cand._1 > best(i)._1 ||
          (cand._1 == best(i)._1 && cand._2 > best(i)._2))
        best(i) = cand
    }
    (best(w.length)._1, -best(w.length)._2)
  }

  private def sparkSeg(docs: DataFrame): Map[String, (Long, Long)] =
    TokenizerOps.unigramSegmented(docs, TokenizerOps.unigramVocab(docs))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def docsOf(texts: Seq[String]): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("Spark DP == the explicit-tie-break reference on the fixture " +
      "corpus, word for word") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val got = sparkSeg(docs)
    val wordFreq = docs
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0 &&
        length(col("w")) <= TokenizerOps.UniMaxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = refVocab(wordFreq)
    assert(got.nonEmpty && got.keySet === wordFreq.keySet)
    for ((w, sp) <- got)
      assert(sp === refSeg(w, vocab), s"word '$w' diverged")
    // the vocabulary cut genuinely engaged (multi-char pieces beyond
    // the budget exist on this corpus)
    assert(wordFreq.keys.flatMap(refPieces).count(_.length >= 2) >
      TokenizerOps.UniVocabSize)
    spark.catalog.clearCache()
  }

  test("an engineered score tie picks the fewest-piece segmentation") {
    // corpus: 'xy' ×3 and 'xyxy' ×3 → s(xy) = 4·6 = 24, s(xyxy) =
    // 16·3 = 48: segmenting 'xyxy' as [xyxy] (score 48, 1 piece) TIES
    // [xy, xy] (score 48, 2 pieces) — the packed DP must take 1 piece
    val docs = docsOf(Seq("xy xy xy xyxy xyxy xyxy"))
    val got = sparkSeg(docs)
    assert(got("xyxy") === ((48L, 1L)),
      s"tie must resolve to fewest pieces, got ${got("xyxy")}")
    assert(got("xy") === ((24L, 1L)))
    // and the reference agrees on the whole crafted corpus
    val vocab = refVocab(Map("xy" -> 3L, "xyxy" -> 3L))
    for ((w, sp) <- got) assert(sp === refSeg(w, vocab))
  }
}
