package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.queries.Registry

/** Statistical verification of the MinHash estimator and the LSH
  * near-dup pipeline (q55/q56), which have no SQL oracle: the
  * estimator must track exact Jaccard, and the banded-LSH candidate
  * generator must recover (almost) every truly-near pair that an
  * exact quadratic scan finds. All hashes are fixed-seed, so these
  * are deterministic assertions, not flaky statistics.
  */
class MinHashSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def shingleHashes =
    docs.select(col("doc_id"),
      transform(Text.shingles(col("text"), 3), xxhash64(_)).as("sh"))

  test("MinHash estimate tracks exact Jaccard within ±0.15 (48 components)") {
    // all pairs over a 60-doc subsample: wide spread of true Jaccard
    // (exact dup clusters + unrelated docs)
    val sub = docs.filter(col("doc_id") < 60)
    val sh = sub.select(col("doc_id"), Text.shingles(col("text"), 3).as("sh"))
    val sig = sub.select(col("doc_id"), Text.minHash(Text.shingles(col("text"), 3)).as("sig"))
    val pairs = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")))
      .filter(col("doc_a") < col("doc_b"))
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(Text.jaccard(col("sh_a"), col("sh_b")).as("jac"),
        Text.sigEstimate(col("sig_a"), col("sig_b")).as("est"))
      .collect()
    assert(pairs.length > 1000)
    val errs = pairs.map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    assert(errs.max <= 0.15, s"worst estimate error ${errs.max}")
    assert(errs.sum / errs.length <= 0.03, s"mean estimate error ${errs.sum / errs.length}")
  }

  test("jaccardFast equals jaccard on shingle-hash arrays") {
    val sh = shingleHashes.limit(40)
    val both = sh.select(col("doc_id").as("a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("b"), col("sh").as("sh_b")))
      .filter(col("a") < col("b"))
      .select(Text.jaccard(col("sh_a"), col("sh_b")).as("j1"),
        Text.jaccardFast(col("sh_a"), col("sh_b")).as("j2"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("LSH near-dup (q56) recall >= 0.9 vs exact all-pairs Jaccard >= 0.5") {
    // exact ground truth on a 150-doc subsample (quadratic is fine here)
    val sub = shingleHashes.filter(col("doc_id") < 150)
    val exact = sub.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .crossJoin(sub.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Text.jaccardFast(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "ground truth must be nonempty for a meaningful recall")
    val lsh = Registry.queries("q56_lsh_near_dup")(spark, dir)
      .filter(col("doc_a") < 150 && col("doc_b") < 150)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} true pairs")
    // and no false positives: every reported pair truly has jac >= 0.5
    assert(lsh.subsetOf(exact), "q56 verify step must make output exact")
  }

  test("q148 containment: a quoted doc scores ~1.0 where Jaccard misses it; " +
      "disjoint docs score nothing") {
    import spark.implicits._
    // doc 1 = 60 distinct trigrams of filler; doc 2 = a 10-word quote
    // lifted verbatim from doc 1's middle; doc 3 = disjoint text.
    val words = (1 to 62).map(i => s"w$i")
    val long = words.mkString(" ")
    val quote = words.slice(20, 30).mkString(" ")
    val docs = Seq((1L, long), (2L, quote), (3L, (1 to 20).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.queries.NearDupOps.containmentOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    // quote: all 8 of doc 2's trigrams appear in doc 1 -> containment 1.0
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
    // and the symmetric measure would have REJECTED it: jaccard = 8/60
    val jac = 8.0 / 60.0
    assert(jac < 0.5, s"the quote's Jaccard $jac is below every dedup tau")
    spark.catalog.clearCache()
  }

  test("q149 containment clusters: a quote-of-a-quote CHAIN collapses " +
      "to one kept carrier; ties keep the min id") {
    import spark.implicits._
    // A ⊂ B, B ⊂~ C, but A shares NOTHING with C directly: the A–C
    // link exists only transitively. Trigram arithmetic:
    //   A = a1..a6                  → 4 trigrams, all inside B: 1.0
    //   B = a1..a6 b1..b30          → 34 trigrams
    //   C = b1..b30 c1..c30         → 58 trigrams; |B∩C| = 28 b-runs
    //     → containment(B,C) = 28/34 ≈ 0.824 ≥ 0.8, containment(A,C)=0
    val A = (1 to 6).map(i => s"a$i").mkString(" ")
    val bs = (1 to 30).map(i => s"b$i").mkString(" ")
    val C = bs + " " + (1 to 30).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, A), (2L, A + " " + bs), (3L, C),
      (4L, (1 to 20).map(i => s"z$i").mkString(" ")), // disjoint
      (10L, "t1 t2 t3 t4 t5"), (11L, "t1 t2 t3 t4 t5")) // exact tie
      .toDF("doc_id", "text")
    val pairs = graft.queries.NearDupOps.containmentOn(docs)
    // the direct A–C pair must NOT exist (that's what makes this a chain)
    assert(!pairs.collect().exists(r => r.getLong(0) == 1L && r.getLong(1) == 3L))
    val out = graft.queries.NearDupOps.containmentVerdictsOn(pairs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    // chain {1,2,3}: ONE kept carrier — the largest doc (3), even
    // though it never paired with 1; min-id labels the cluster
    assert(out.filter(_._2 == 1L).toSeq === Seq(
      (1L, 1L, 3L, 0), (2L, 1L, 3L, 0), (3L, 1L, 3L, 1)))
    // disjoint doc 4 appears in no verdict row (implicitly kept)
    assert(!out.exists(_._1 == 4L))
    // equal-size tie (exact duplicates): min id is the carrier
    assert(out.filter(_._2 == 10L).toSeq === Seq(
      (10L, 10L, 10L, 1), (11L, 10L, 10L, 0)))
    spark.catalog.clearCache()
  }

  test("q155 incremental containment: df crossings drop, raise, merge, flip " +
      "and leave untouched clusters byte-stable — == full recompute, pinned") {
    import spark.implicits._
    val maxDf = 3L
    // Resident corpus (maxDf = 3; trigram arithmetic per group):
    //  X(0) ⊂ Y(1) via the s-block (df 2)       → a t0 cluster
    //  P(2)/Q(3) share the c-block (df 2) at containment 0.5 (< τ);
    //    Q/R0(4)/R1(5) share the q-block (df 3, exactly at cap)
    //  C1(6) ⊂ C2(7) via the d-block            → a t0 cluster
    //  M1(8) ⊂ M2(9), M3(10) ⊂ M4(11)           → two t0 clusters
    //  V1(12) ⊂ V2(13)                          → the untouched cluster
    val resident = Seq(
      (0L, "s1 s2 s3 s4 s5"),
      (1L, "s1 s2 s3 s4 s5 y1 y2"),
      (2L, "p1 p2 p3 c1 c2 c3 c4 c5"),
      (3L, "q1 q2 q3 c1 c2 c3 c4 c5"),
      (4L, "q1 q2 q3 c1 c2 r1 r2 r3"),
      (5L, "q1 q2 q3 c1 c2 t1 t2 t3"),
      (6L, "d1 d2 d3 d4 d5"),
      (7L, "d1 d2 d3 d4 d5 d6 d7"),
      (8L, "g1 g2 g3 g4 g5"),
      (9L, "g1 g2 g3 g4 g5 g6 g7"),
      (10L, "h1 h2 h3 h4 h5"),
      (11L, "h1 h2 h3 h4 h5 h6 h7"),
      (12L, "v1 v2 v3 v4 v5"),
      (13L, "v1 v2 v3 v4 v5 v6 v7")).toDF("doc_id", "text")
    // Batch: Z1a/Z1b push the s-block over the cap (X–Y pair DROPS,
    // the cluster dissolves); Z2 pushes the q-block over (Q's size
    // shrinks 6→3, so the dormant P–Q pair RISES to 1.0); C3 extends
    // the C chain and STEALS the carrier; M5 contains both M2 and M4
    // (two resident clusters MERGE under a batch carrier); W1 ⊂ W2 is
    // a batch-internal cluster.
    val batch = Seq(
      (100L, "s1 s2 s3 s4 s5 za1 za2"),
      (101L, "s1 s2 s3 s4 s5 zb1 zb2"),
      (102L, "q1 q2 q3 c1 c2"),
      (103L, "d1 d2 d3 d4 d5 d6 d7 d8 d9"),
      (104L, "g1 g2 g3 g4 g5 g6 g7 h1 h2 h3 h4 h5 h6 h7"),
      (105L, "u1 u2 u3 u4 u5"),
      (106L, "u1 u2 u3 u4 u5 u6 u7")).toDF("doc_id", "text")
    val st = graft.queries.NearDupOps.containmentStateOn(resident, maxDf = maxDf)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    // t0 sanity: X–Y is a real resident cluster (so its dissolution
    // below is a genuine verdict FLIP, not a never-existed pair)
    val t0 = key(st.verdicts)
    assert(t0.contains((0L, 0L, 1L, 3L, 0)) && t0.contains((1L, 0L, 1L, 5L, 1)))
    assert(!t0.exists(v => v._1 == 2L || v._1 == 3L)) // P–Q dormant at t0
    val inc = key(graft.queries.NearDupOps
      .incrementalContainmentVerdicts(st, batch, maxDf = maxDf))
    // the core contract: incremental == the full recompute over the union
    val full = key(graft.queries.NearDupOps.containmentVerdictsOn(
      graft.queries.NearDupOps.containmentOn(resident.union(batch),
        maxDf = maxDf)))
    assert(inc === full, s"incremental != full recompute:\n+${inc -- full}\n-${full -- inc}")
    // and the full pinned verdict table, every engagement visible:
    assert(inc === Set(
      (2L, 2L, 2L, 6L, 1), (3L, 2L, 2L, 3L, 0),            // RISEN pair
      (6L, 6L, 103L, 3L, 0), (7L, 6L, 103L, 5L, 0),
      (103L, 6L, 103L, 7L, 1),                             // carrier FLIP
      (8L, 8L, 104L, 3L, 0), (9L, 8L, 104L, 5L, 0),
      (10L, 8L, 104L, 3L, 0), (11L, 8L, 104L, 5L, 0),
      (104L, 8L, 104L, 12L, 1),                            // MERGE
      (12L, 12L, 13L, 3L, 0), (13L, 12L, 13L, 5L, 1),      // untouched
      (105L, 105L, 106L, 3L, 0), (106L, 105L, 106L, 5L, 1) // batch pair
    ))
    // X/Y/Z1a/Z1b/Z2/R0/R1 all absent: the s- and q-blocks crossed the
    // df cap, so the X–Y cluster DISSOLVED and Z2 has no informative
    // shingles left at all
    assert(!inc.exists(v => Set(0L, 1L, 4L, 5L, 100L, 101L, 102L)(v._1)))
    spark.catalog.clearCache()
  }

  test("over-cap LSH buckets dedup via representative star instead of vanishing") {
    import spark.implicits._
    // A dense duplicate cluster larger than the bucket cap: 200 exact
    // copies with the cap forced to 50 (same code path as 20k copies
    // against the production cap — every band bucket is hot). Round-2
    // behavior dropped hot buckets entirely, losing precisely the
    // densest duplicate clusters; now every copy must still be linked
    // to the cluster representative (min doc_id) through the ordinary
    // estimate+verify chain.
    val copyText = "the same boilerplate paragraph repeated across the " +
      "corpus with enough tokens to produce a full shingle set"
    val distinctText = (i: Int) => s"unique document number $i about topic $i " +
      s"with its own vocabulary item${i}a item${i}b item${i}c item${i}d"
    val corpus = ((0 until 200).map(i => (i.toLong, copyText)) ++
      (200 until 240).map(i => (i.toLong, distinctText(i)))).toDF("doc_id", "text")
    val out = graft.queries.NearDupOps.lshNearDupOn(corpus, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // star edges: every copy pairs with doc 0 (the representative)
    val expected = (1 until 200).map(i => (0L, i.toLong)).toSet
    assert(expected.subsetOf(out),
      s"missing ${(expected -- out).size} representative edges of ${expected.size}")
    // distinct docs must not be claimed as duplicates of anything
    val distinctIds = (200 until 240).map(_.toLong).toSet
    assert(!out.exists { case (a, b) => distinctIds(a) || distinctIds(b) },
      "unrelated docs must not appear in near-dup output")
    spark.catalog.clearCache()
  }

  test("native MinHash expression is bit-exact vs the HOF formulation") {
    val both = docs.limit(200).select(
      Text.minHash(Text.shingles(col("text"), 3)).as("a"),
      Text.minHashHof(Text.shingles(col("text"), 3)).as("b"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("native ShingleHashes == hashed HOF shingles; pre-hashed MinHash agrees") {
    val both = docs.limit(200).select(
      Text.shingleHashes(col("text"), 3).as("a"),
      transform(Text.shingles(col("text"), 3), xxhash64(_)).as("b"),
      Text.minHash(Text.shingleHashes(col("text"), 3)).as("sig_h"),
      Text.minHash(Text.shingles(col("text"), 3)).as("sig_s"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1)) // same hashes, same order
      assert(r.getSeq[Long](2) === r.getSeq[Long](3)) // same signatures
    }
  }

  test("q151 prefix-filtered containment == the full self-join exactly; " +
      "candidates shrink") {
    import graft.queries.NearDupOps
    // fixture corpus: real text with quote structure built in
    val fix = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val quotes = fix.filter(col("doc_id") < 40)
      .select((col("doc_id") + 5000).as("doc_id"),
        // a verbatim prefix slice of each doc: guaranteed containment
        concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"),
          1, 12)).as("text"))
    val docs = fix.union(quotes)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    val full = rows(NearDupOps.containmentOn(docs))
    val pref = rows(NearDupOps.containmentPrefixOn(docs))
    assert(full.nonEmpty, "fixture must produce containment pairs")
    assert(pref === full) // lossless: bit-identical output
    // and the filter is real: candidate pairs < the full self-join's
    val (inf, _, cand) = NearDupOps.containmentPrefixCandidates(
      docs, 0.8, graft.queries.TextOps.MaxShingleDf)
    val fullPairs = inf.select(col("sh"), col("doc_id").as("a"))
      .join(inf.select(col("sh"), col("doc_id").as("b")), Seq("sh"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct().count()
    val prefPairs = cand.count()
    info(s"candidates: full $fullPairs -> prefix $prefPairs")
    assert(prefPairs < fullPairs,
      s"prefix filter must prune candidates ($prefPairs vs $fullPairs)")
    assert(prefPairs >= full.size.toLong) // still superset of truth
    spark.catalog.clearCache()
  }

  test("native Md5ShingleHashes == the composed-builtin md5 chain, " +
      "bit-exact incl. order; portable signatures agree") {
    import spark.implicits._
    val both = docs.limit(200).select(
      Text.md5ShingleHashes(col("text"), 3).as("a"),
      Text.md5ShingleHashesHof(col("text"), 3).as("b"),
      Text.minHash(Text.md5ShingleHashes(col("text"), 3)).as("sig_n"),
      Text.minHash(Text.md5ShingleHashesHof(col("text"), 3)).as("sig_h"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1)) // values AND order
      assert(r.getSeq[Long](2) === r.getSeq[Long](3)) // same signatures
    }
    // edge docs: empty, whitespace-only, sub-n, non-ASCII (the digest
    // runs over UTF-8 bytes — must match md5() on multibyte text),
    // repeated grams (dedup), and mixed case (tokenizer parity)
    val edges = Seq("", "   ", "one two", "xin chào thế giới xin chào",
      "a b c a b c a b c", "A B c D a b C d").toDF("text")
    val er = edges.select(
      Text.md5ShingleHashes(col("text"), 3).as("a"),
      Text.md5ShingleHashesHof(col("text"), 3).as("b")).collect()
    er.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // and the SQL registration resolves
    org.apache.spark.sql.graftbridge.FunctionRegistration.registerAll(spark)
    spark.sql("SELECT md5_shingle_hashes('a b c d', 3) AS h")
      .collect().head.getSeq[Long](0)
    spark.catalog.clearCache()
  }

  test("native JaccardLong equals the HOF jaccard on hash arrays") {
    val sh = docs.limit(40).select(col("doc_id"),
      Text.shingleHashes(col("text"), 3).as("sh"))
    val both = sh.select(col("doc_id").as("a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("b"), col("sh").as("sh_b")))
      .filter(col("a") < col("b"))
      .select(Text.jaccard(col("sh_a"), col("sh_b")).as("j1"),
        Text.jaccardLong(col("sh_a"), col("sh_b")).as("j2"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("jaccardLong: symmetric true-set semantics even with duplicates") {
    import spark.implicits._
    val df = Seq((Seq(1L), Seq(1L, 1L, 1L))).toDF("a", "b")
    val r = df.select(Text.jaccardLong(col("a"), col("b")).as("ab"),
      Text.jaccardLong(col("b"), col("a")).as("ba")).first()
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 1.0) // sets are equal
  }

  test("lshBands: signatures shorter than the band width yield no bands") {
    import spark.implicits._
    val df = Seq((Seq.empty[Long], Seq(1L, 2L, 3L))).toDF("empty", "short")
    val r = df.select(size(Text.lshBands(col("empty"))).as("a"),
      size(Text.lshBands(col("short"))).as("b")).first()
    assert(r.getInt(0) === 0 && r.getInt(1) === 0) // not the sequence(0,-1) trap
  }

  test("q100 composed verdicts: exact, near, and keep all fire on a crafted corpus") {
    import spark.implicits._
    // fixture corpora carry no exact duplicates, so the exact branch
    // is exercised here: A(0), its verbatim copy B(1), a one-token
    // variant C(2) in A's (lang, length) block, and an unrelated D(3)
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 29).map(i => s"tok$i") :+ "changed").mkString(" ")
    val other = (100 to 129).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (0L, base, "en", base.length.toLong),
      (1L, base, "en", base.length.toLong),
      (2L, near, "en", base.length.toLong),
      (3L, other, "en", 9999L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = graft.queries.NearDupOps.dedupVerdictsOn(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(got === List(
      (0L, "keep", 0L), (1L, "exact", 0L), (2L, "near", 0L), (3L, "keep", 3L)))
    spark.catalog.clearCache()
  }

  test("q152 incremental verdicts: a new bridge doc MERGES two resident " +
      "clusters; exact probes, batch-internal dups, and untouched rows " +
      "all land exactly as the full recompute") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    // resident: near clusters A{10,11} and B{20,21}, unique 30, an
    // exact pair {40,41}
    val old = mk(Seq(
      10L -> "alpha beta gamma delta epsilon zeta",
      11L -> "alpha beta gamma delta epsilon eta",
      20L -> "one two three four five six",
      21L -> "one two three four five seven",
      30L -> "red green blue yellow purple orange",
      40L -> "lorem ipsum dolor sit amet consectetur",
      41L -> "lorem ipsum dolor sit amet consectetur"))
    // batch (all ids above every resident id): 100 BRIDGES A and B
    // (jac 0.25 to each, 0 between them), 101 exact-probes 40's hash
    // group, 102 is novel, 103/104 are an exact pair born inside the
    // batch, 105 near-joins resident 30
    val batch = mk(Seq(
      100L -> "alpha beta gamma delta one two three four",
      101L -> "lorem ipsum dolor sit amet consectetur",
      102L -> "completely different words here entirely novel",
      103L -> "duplicate batch text content example words",
      104L -> "duplicate batch text content example words",
      105L -> "red green blue yellow purple magenta"))
    val oldV = graft.queries.NearDupOps.dedupVerdictsOn(old)
    val got = graft.queries.NearDupOps
      .incrementalVerdicts(old, oldV, batch)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    val full = graft.queries.NearDupOps
      .dedupVerdictsOn(old.unionByName(batch))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(got === full)
    assert(got === List(
      (10L, "keep", 10L), (11L, "near", 10L),
      (20L, "near", 10L), (21L, "near", 10L), // B's canonical MOVED to A's
      (30L, "keep", 30L),
      (40L, "keep", 40L), (41L, "exact", 40L),
      (100L, "near", 10L), (101L, "exact", 40L), (102L, "keep", 102L),
      (103L, "keep", 103L), (104L, "exact", 103L), (105L, "near", 30L)))
    spark.catalog.clearCache()
  }

  test("q152 == q100's full recompute on the fixture's last-fifth split") {
    val capped = docs
      .filter(col("doc_id") < graft.queries.TextOps.ExactBaselineDocCap)
    val split = graft.queries.NearDupOps.incrementalSplitId(capped)
    assert(split > 0 && capped.filter(col("doc_id") >= split).count() > 100,
      "the split must leave a real batch")
    val old = capped.filter(col("doc_id") < split)
    val incr = graft.queries.NearDupOps.incrementalVerdicts(
        old, graft.queries.NearDupOps.dedupVerdictsOn(old),
        capped.filter(col("doc_id") >= split))
      .collect().map(_.toSeq).toList
    val full = graft.queries.NearDupOps.dedupVerdictsOn(capped)
      .collect().map(_.toSeq).toList
    assert(incr === full)
    spark.catalog.clearCache()
  }

  test("q55 signatures: deterministic, k=48, empty docs get sentinel") {
    val sig = docs.select(col("doc_id"),
      Text.minHash(Text.shingles(col("text"), 3)).as("sig"))
    val sizes = sig.select(size(col("sig"))).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq == Seq(48))
    val again = docs.select(col("doc_id"),
      Text.minHash(Text.shingles(col("text"), 3)).as("sig"))
    assert(sig.exceptAll(again).isEmpty && again.exceptAll(sig).isEmpty)
  }
}
