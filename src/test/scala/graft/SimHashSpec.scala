package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

/** Behavioral verification of SimHash (q57) and the rolling
  * fingerprint (q58), which have no SQL oracle: SimHash must be
  * invariant for identical token streams, near for small edits, far
  * for unrelated text; the rolling fingerprint must be order-
  * SENSITIVE (the property that distinguishes it from MinHash).
  */
class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the storm gathers over the quiet harbor and ships wait"
  private val edited = base.replace("quiet", "silent") // one-token edit
  private val unrelated = "completely different subject matter about " +
    "linear algebra matrix decomposition eigenvalues and spectral norms"
  private val permuted = base.split(" ").reverse.mkString(" ")

  private def simhashOf(texts: (String, String)*) = {
    val df = texts.toSeq.toDF("id", "text")
    df.select(col("id"), Text.simHash(Text.tokens(col("text"))).as("sh"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
  }

  private def hamming(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Int =
    java.lang.Long.bitCount(a.getLong(0) ^ b.getLong(0)) +
      java.lang.Long.bitCount(a.getLong(1) ^ b.getLong(1))

  test("simhash: identical text -> distance 0; small edit near; unrelated far") {
    val m = simhashOf("a" -> base, "a2" -> base, "b" -> edited, "c" -> unrelated)
    assert(hamming(m("a"), m("a2")) === 0)
    val near = hamming(m("a"), m("b"))
    val far = hamming(m("a"), m("c"))
    assert(near < far, s"edit distance $near should be < unrelated distance $far")
    assert(near <= 16, s"one-token edit moved $near of 64 bits")
    assert(far >= 16, s"unrelated text only $far of 64 bits apart")
  }

  test("simhash: bag-of-tokens invariant (permutation keeps fingerprint)") {
    val m = simhashOf("a" -> base, "p" -> permuted)
    assert(hamming(m("a"), m("p")) === 0)
  }

  test("native SimHash64 expression is bit-exact vs the HOF formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .limit(200)
    val both = docs.select(
      Text.simHash(Text.tokens(col("text"))).as("a"),
      Text.simHashHof(Text.tokens(col("text"))).as("b"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (a, b) = (r.getStruct(0), r.getStruct(1))
      assert(a.getLong(0) === b.getLong(0) && a.getLong(1) === b.getLong(1))
    }
  }

  test("native SimHash64 pre-hashed path is bit-exact vs the HOF fold " +
      "(portable md5 hash family, q57/q68's path)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .limit(200)
    val hs = Text.md5TokenHash64(Text.tokens(col("text")))
    val both = docs.select(
      Text.simHash(hs).as("a"),
      Text.simHashHofFromHashes(hs).as("b"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (a, b) = (r.getStruct(0), r.getStruct(1))
      assert(a.getLong(0) === b.getLong(0) && a.getLong(1) === b.getLong(1))
    }
  }

  test("Text.hamming column matches bit_count XOR semantics") {
    val df = Seq(("x", base, edited)).toDF("id", "t1", "t2")
    val got = df.select(Text.hamming(
      Text.simHash(Text.tokens(col("t1"))),
      Text.simHash(Text.tokens(col("t2")))).as("d"))
      .first().getAs[Number]("d").longValue
    val m = simhashOf("a" -> base, "b" -> edited)
    assert(got === hamming(m("a"), m("b")).toLong)
  }

  test("rolling fingerprint: order-sensitive, deterministic, stable domain") {
    val df = Seq(("a", base), ("a2", base), ("p", permuted), ("c", unrelated))
      .toDF("id", "text")
    val fps = df.select(col("id"), Text.fingerprint(Text.tokens(col("text"))).as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fps("a") === fps("a2"))          // deterministic
    assert(fps("a") !== fps("p"))           // permutation changes it (unlike MinHash/SimHash)
    assert(fps("a") !== fps("c"))
    fps.values.foreach(v => assert(v >= 0 && v < 2147483647L)) // mod-P domain
  }

  test("q68 band multi-index is EXACT for Hamming <= 3 (pigeonhole) at sf0.01") {
    // 4 bands of 16 bits: <= 3 differing bits cannot touch all 4
    // bands, so every true pair shares a band verbatim — the banded
    // output must EQUAL the brute-force all-pairs scan, not merely
    // approximate it.
    val dir = "/root/testdata/sf0.01"
    // q68 runs the PORTABLE fingerprint family (round 8); the
    // pigeonhole exactness claim is hash-family-independent, so the
    // brute-force side uses the same family as the query under test
    val fp = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        Text.simHash(Text.md5TokenHash64(Text.tokens(col("text")))).as("sh"))
      .cache()
    val brute = fp.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .crossJoin(fp.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Text.hamming(col("sh_a"), col("sh_b")).as("dist"))
      .filter(col("dist") <= 3)
    val banded = graft.queries.Registry.queries("q68_simhash_neardup")(spark, dir)
    assert(brute.count() > 0, "fixture must contain Hamming<=3 pairs")
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty,
      "banded multi-index must equal the brute-force Hamming<=3 pair set")
    fp.unpersist()
  }

  test("q68 recall vs q54's exact n-gram near-dup pairs >= 0.8 at sf0.01") {
    // Different similarity notion (token multiset vs 3-gram shingles),
    // so this is a cross-family recall measurement, not an identity:
    // of q54's Jaccard>=0.2 pairs, those within SimHash Hamming 3 are
    // found; the fixture puts 4 of 5 there.
    val dir = "/root/testdata/sf0.01"
    def pairs(name: String): Set[(Long, Long)] =
      graft.queries.Registry.queries(name)(spark, dir)
        .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("q54_ngram_neardup")
    val got = pairs("q68_simhash_neardup")
    assert(exact.nonEmpty)
    val recall = exact.count(got.contains).toDouble / exact.size
    info(s"q68 recall vs q54: $recall (${exact.size} exact pairs)")
    assert(recall >= 0.8, s"recall $recall")
  }

  test("q68 over-cap buckets dedup via representative star instead of vanishing") {
    import spark.implicits._
    // 200 identical docs (identical fingerprints → every band bucket
    // holds all 200) with the cap forced to 50: round-3's first cut
    // dropped hot buckets, silently losing the densest clusters; now
    // every copy must link to the representative (min doc_id).
    val copy = "the same boilerplate paragraph repeated across the " +
      "corpus with enough tokens to produce a stable fingerprint"
    val distinctText = (i: Int) => s"unique document $i about subject $i " +
      s"with vocabulary item${i}a item${i}b item${i}c item${i}d item${i}e"
    val corpus = ((0 until 200).map(i => (i.toLong, copy)) ++
      (200 until 240).map(i => (i.toLong, distinctText(i)))).toDF("doc_id", "text")
    val out = graft.queries.NearDupOps.simHashNearDupOn(corpus, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (1 until 200).map(i => (0L, i.toLong)).toSet
    assert(expected.subsetOf(out),
      s"missing ${(expected -- out).size} representative edges of ${expected.size}")
    spark.catalog.clearCache()
  }

  test("q57/q58 over the fixture: one fingerprint per doc, deterministic") {
    val dir = "/root/testdata/sf0.01"
    val q57 = graft.queries.Registry.queries("q57_simhash")(spark, dir)
    val q58 = graft.queries.Registry.queries("q58_fingerprint")(spark, dir)
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(q57.count() === n)
    assert(q58.count() === n)
    // identical text must collide on both fingerprints: recompute over
    // the same corpus and require exact agreement per doc_id
    val q57again = graft.queries.Registry.queries("q57_simhash")(spark, dir)
    assert(q57.exceptAll(q57again).isEmpty)
    val q58again = graft.queries.Registry.queries("q58_fingerprint")(spark, dir)
    assert(q58.exceptAll(q58again).isEmpty)
  }
}
