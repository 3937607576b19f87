package graft

import org.apache.spark.sql.functions._

import graft.queries.{QualityOps, Registry}

/** Within-doc repetition signals (q132), the reason-coded composite
  * quality filter (q133), and content-defined chunking (q136/q137):
  * each checked against an independent plain-Scala reference
  * implementation on crafted corpora (the BpeSpec pattern), plus
  * invariants on the real fixture. The DuckDB oracle covers value
  * parity at sf0.01; these specs pin the SEMANTICS on inputs the
  * fixture doesn't contain (precedence collisions, sub-window docs).
  */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = Registry.queries(name)

  private def docsDir(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("qualspec").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // Reference implementation of the q132 signals.
  private def refSignals(text: String): (Double, Double, Double) = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    val uni = toks.groupBy(identity).values.map(_.size).max.toDouble / toks.size
    val bg = toks.sliding(2).map(_.mkString(" ")).toSeq
    val counts = bg.groupBy(identity).values.map(_.size)
    val top = counts.max.toDouble / bg.size
    val dup = counts.filter(_ > 1).sum.toDouble / bg.size
    (round4(uni), round4(top), round4(dup))
  }

  test("q132 matches a plain-Scala reference on crafted docs") {
    val texts = Seq(
      "a a a b c",
      "x y x y x y z",
      "one two three four five six seven eight nine ten")
    val dir = docsDir(texts)
    val got = q("q132_repetition_signals")(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === texts.map(refSignals))
  }

  test("q133 verdicts: every rule engages; precedence is first-fail") {
    val tooShort = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10" // 10 < MinTokens
    val lowStop = (1 to 20).map(i => s"t$i").mkString(" ") // 0 stopwords
    val highUni = "the x x x x x " + (1 to 14).map(i => s"u$i").mkString(" ")
    val cycle = (1 to 10).map(i => s"c$i").mkString(" ")
    val highDup = s"$cycle $cycle the end" // dup bigrams, no hot unigram
    val keep = "the " + (1 to 19).map(i => s"k$i").mkString(" ")
    // precedence: fails too_short AND low_stopword -> too_short wins
    val collide = (1 to 10).map(i => s"p$i").mkString(" ")
    val dir = docsDir(Seq(tooShort, lowStop, highUni, highDup, keep, collide))
    val got = q("q133_quality_filter_verdicts")(spark, dir)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(got.toSeq === Seq("too_short", "low_stopword", "high_top_unigram",
      "high_dup_bigram", "keep", "too_short"))
  }

  test("native token_stats kernel == the HOF signal formulation, " +
      "fixture + edge docs") {
    val crafted = docsDir(Seq(
      "solo", "two words", "a a a b c", "x y x y x y z",
      "the the the", "one two three four five six seven eight"))
    for (dir <- Seq(crafted, "/root/testdata/sf0.001")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      assert(rows(graft.queries.QualityOps.signalsRelationOf(docs)) ===
        rows(graft.queries.QualityOps.signalsRelationHof(docs)))
    }
    // and the SQL registration works inside codegen
    org.apache.spark.sql.graftbridge.FunctionRegistration.registerAll(spark)
    val r = spark.sql(
      """SELECT token_stats(array('a','b','a','b','a')) AS st""").collect()(0)
      .getStruct(0)
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      === ((5, 3, 4, 2, 4)))
  }

  test("q132/q133 survive sub-2-token docs under ANSI mode: bigram " +
      "ratios are NULL, not DIVIDE_BY_ZERO") {
    // bigrams() of a 1-token doc is empty; the downstream ratios must
    // null-guard the 0/0 (round-6 ADVICE: the construction guard
    // alone left the divisions ANSI-throwing)
    val dir = docsDir(Seq("solo", "two words",
      "the " + (1 to 19).map(i => s"k$i").mkString(" ")))
    val sig = q("q132_repetition_signals")(spark, dir)
      .orderBy("doc_id").collect()
    assert(sig(0).getDouble(1) === 1.0) // top unigram of a 1-token doc
    assert(sig(0).isNullAt(2) && sig(0).isNullAt(3))
    assert(!sig(1).isNullAt(2) && !sig(2).isNullAt(3))
    val v = q("q133_quality_filter_verdicts")(spark, dir)
      .orderBy("doc_id").collect()
    assert(v(0).getString(1) === "too_short") // 1 token < MinTokens
    assert(v(0).isNullAt(5)) // dup_bigram_frac NULL, surfaced as such
    assert(v(2).getString(1) === "keep")
  }

  test("q133 stopword rule is per-language; no-profile langs skip it") {
    val dir = java.nio.file.Files.createTempDirectory("qualspec").toString
    // German stopwords, labeled de: must NOT flag low_stopword under
    // the de profile (the old English-only rule would have); the same
    // words labeled en DO flag; zh has no profile -> rule skipped
    val deText = "der die das und " + (1 to 16).map(i => s"d$i").mkString(" ")
    Seq(
      (0L, deText, "de"), (1L, deText, "en"), (2L, deText, "zh"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val v = q("q133_quality_filter_verdicts")(spark, dir)
      .orderBy("doc_id").collect()
    assert(v(0).getString(1) === "keep")
    assert(v(1).getString(1) === "low_stopword")
    assert(v(2).getString(1) === "keep")
    assert(!v(0).isNullAt(3) && v(2).isNullAt(3)) // zh ratio is NULL
  }

  // Reference implementation of the q136 chunker.
  private def refWordVal(w: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 6), 16) % 1021
  }

  private def refStarts(toks: Array[String]): Seq[Int] = {
    val v = toks.map(refWordVal)
    1 +: (3 to toks.length).filter(i =>
      (v(i - 3) * 961 + v(i - 2) * 31 + v(i - 1)) % 16 == 0)
  }

  private def refChunks(text: String): Seq[Seq[String]] = {
    val toks = text.trim.toLowerCase.split("\\s+")
    val starts = refStarts(toks)
    starts.zipAll(starts.drop(1), 0, toks.length + 1).map {
      case (s, e) => toks.slice(s - 1, e - 1).toSeq
    }
  }

  test("native cdc_chunks kernel == the HOF chunk relation") {
    for (dir <- Seq(
        docsDir(Seq("solo", "two words", "a b c d e",
          (1 to 60).map(i => s"w${i % 23}").mkString(" "))),
        "/root/testdata/sf0.001")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      assert(rows(graft.queries.QualityOps.chunkRelationOf(docs)) ===
        rows(graft.queries.QualityOps.chunkRelationHof(docs)))
    }
  }

  test("q136 chunking matches the reference chunker on the fixture") {
    val sample = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 50)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = q("q136_cdc_chunking")(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 50).collect()
    assert(got.length === 50)
    got.foreach { r =>
      val chunks = refChunks(sample(r.getLong(0)))
      assert(r.getLong(1) === chunks.size.toLong, s"n_chunks doc ${r.get(0)}")
      assert(r.getDouble(2) ===
        round4(chunks.map(_.size).sum.toDouble / chunks.size))
      assert(r.getLong(3) === chunks.map(_.size).max.toLong)
    }
  }

  test("chunking is content-defined: a prefix insertion only reshapes " +
      "chunks up to the next boundary") {
    // The storage-dedup property fixed-width blocks lack: chunks
    // strictly after the first boundary past the edit are identical.
    val base = (1 to 60).map(i => s"w${i % 23}").mkString(" ")
    val edited = "inserted " + base
    val a = refChunks(base).map(_.mkString(" "))
    val b = refChunks(edited).map(_.mkString(" "))
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.nonEmpty, "no chunk survived a 1-word prefix insertion")
  }

  test("q136 handles sub-window docs (fewer than 3 tokens)") {
    val dir = docsDir(Seq("solo", "two words", "a b c d e"))
    val got = q("q136_cdc_chunking")(spark, dir).orderBy("doc_id").collect()
    assert(got.map(_.getLong(1)).forall(_ >= 1L))
    assert(got(0).getLong(3) === 1L) // one 1-word chunk
    assert(got(1).getLong(3) === 2L)
  }

  test("q137 census counts every chunk exactly once") {
    val dir = docsDir(Seq("a b c d e f g h", "a b c d e f g h", "z y x"))
    val census = q("q137_chunk_dedup_census")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = census.map { case (c, n) => c * n }.sum
    val expected = Seq("a b c d e f g h", "a b c d e f g h", "z y x")
      .map(t => refChunks(t).size.toLong).sum
    assert(total === expected)
    // the duplicated doc's chunks all appear with n_copies = 2
    assert(census.contains(2L))
  }

  test("q138 drops corpus-repeated chunks and reassembles the rest " +
      "in order") {
    val boiler = "a b c d e f g h"
    val clean = "z y x w v u t s r q"
    val dir = docsDir(Seq(boiler, boiler, boiler, clean))
    val got = q("q138_boilerplate_removal")(spark, dir)
      .orderBy("doc_id").collect()
    // the tripled doc: every chunk occurs 3x -> all dropped
    (0 to 2).foreach { i =>
      assert(got(i).getLong(1) === 0L, "kept chunks in boilerplate doc")
      assert(got(i).getLong(2) >= 1L)
      assert(got(i).getString(3) === "")
    }
    // the unique doc: nothing dropped, reassembly is the identity
    assert(got(3).getLong(2) === 0L)
    assert(got(3).getString(3) === clean)
  }

  test("q140: a training doc identical to an eval doc is fully " +
      "contaminated; an unrelated one is clean") {
    val evalText = "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"
    val dir = docsDir(Seq(
      evalText, // doc 0: eval split (doc_id % 50 == 0)
      evalText, // doc 1: train, identical -> every chunk shared
      "c1 c2 c3 c4 c5 c6 c7 c8")) // doc 2: train, disjoint
    val got = q("q140_chunk_decontamination")(spark, dir)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(got(0).getLong(2) === got(0).getLong(1)) // all chunks shared
    assert(got(0).getInt(4) === 1)
    assert(got(1).getLong(2) === 0L)
    assert(got(1).getInt(4) === 0)
  }

  test("q145: each contamination rule fires; verbatim overlap " +
      "outranks semantic") {
    val evalText = "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10" // doc 0: eval split
    val unrelated = (1 to 10).map(i => s"u$i").mkString(" ")
    val alsoClean = (1 to 10).map(i => s"v$i").mkString(" ")
    val dir = docsDir(Seq(
      evalText, // 0: eval
      evalText, // 1: verbatim copy AND similar vector -> ngram wins
      unrelated, // 2: no text overlap, eval-identical vector -> semantic
      alsoClean)) // 3: nothing -> clean
    def vec(xs: Double*) =
      (xs ++ Seq.fill(8 - xs.size)(0.0)).map(_.toFloat)
    Seq(
      (0L, vec(1.0), 0), (1L, vec(1.0), 0),
      (2L, vec(1.0), 0), (3L, vec(0.0, 1.0), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = q("q145_contamination_verdicts")(spark, dir)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L)) // train docs only
    assert(got.map(_.getString(1)).toSeq === Seq("ngram", "semantic", "clean"))
    assert(got(0).getLong(2) === 1L) // one bench doc hit
    assert(got(1).getDouble(3) === 1.0) // eval-identical vector
    assert(got(2).getDouble(4) === 0.0) // no chunks shared
    spark.catalog.clearCache()
  }

  test("q146 manifest: packing is gapless over keeps, drops carry no " +
      "pack, decisions agree with the stage tables") {
    val dir = "/root/testdata/sf0.001"
    val rows = q("q146_training_manifest")(spark, dir)
      .orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    // keeps: start_tok is the exclusive prefix sum of kept n_tokens
    var expect = 0L
    rows.filter(_.getString(1) == "keep").foreach { r =>
      assert(r.getLong(4) === expect, s"gap at doc ${r.getLong(0)}")
      assert(r.getLong(5) === expect / 2048L)
      assert(r.getLong(6) === expect % 2048L)
      expect += r.getInt(3)
    }
    // drops: no pack assignment, reason matches the decision family
    rows.filter(_.getString(1) != "keep").foreach { r =>
      assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
      val (dec, reason) = (r.getString(1), r.getString(2))
      if (dec == "drop_quality")
        assert(Set("too_short", "low_stopword", "high_top_unigram",
          "high_dup_bigram")(reason))
      else if (dec == "drop_duplicate")
        assert(Set("exact", "near", "contained")(reason))
      else assert(Set("ngram", "semantic", "chunk")(reason))
    }
    // cross-check a sample against the source verdict tables
    val qual = graft.queries.QualityOps
      .verdictsOf(spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(100).foreach { r =>
      val id = r.getLong(0)
      if (qual(id) != "keep")
        assert(r.getString(1) === "drop_quality" &&
          r.getString(2) === qual(id))
    }
    spark.catalog.clearCache()
  }

  test("q141: clusters partition the capped corpus; the chosen best " +
      "is a member carrying the cluster's max score") {
    val dir = "/root/testdata/sf0.001"
    val rows = q("q141_quality_canonical")(spark, dir).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < graft.queries.TextOps.ExactBaselineDocCap)
      .count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    // best member must sit in its own cluster (cluster_id is the
    // component min, so best_id >= cluster_id always)
    assert(rows.forall(r => r.getLong(2) >= r.getLong(0)))
    spark.catalog.clearCache()
  }
}
