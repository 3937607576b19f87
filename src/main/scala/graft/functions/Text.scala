package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, MinHash signatures, SimHash fingerprints,
  * rolling-hash document fingerprints, quality features, and an
  * n-gram/stopword language-ID heuristic.
  *
  * Everything here is a pure Catalyst expression composition
  * (higher-order functions over arrays — `transform`/`aggregate`/
  * `filter`/`zip_with`): no UDFs, no driver-side loops, so every
  * operator is a map-side projection that scales linearly with rows
  * and keeps Tungsten's columnar batches intact. ANSI-mode-safe: all
  * hash arithmetic is reduced to a 31-bit domain before affine
  * transforms so no 64-bit overflow can throw.
  *
  * Extension surface mandated alongside the reference's ETL ops —
  * SURVEY §2.9 (reference repo has no text ops; these are the
  * LLM-pipeline additions).
  */
object Text {

  /** Mersenne-ish prime for affine MinHash permutations (fits 31 bits). */
  private val P: Long = 2147483647L // 2^31 - 1

  /** Deterministic affine-permutation constants — single source of
    * truth lives with the native expression.
    */
  private def lcg(seed: Long, n: Int): IndexedSeq[Long] =
    graft.expressions.MinHash.lcg(seed, n).toIndexedSeq

  /** Whitespace tokens of lowercased text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Bind `e` as a lambda variable inside `body`, forcing single
    * evaluation. Higher-order functions run interpreted with NO
    * common-subexpression elimination, so an expression referenced
    * inside a lambda body is otherwise re-evaluated on EVERY
    * iteration — referencing a whole-text `split` inside a
    * per-position lambda turns shingling into O(tokens²) per
    * document (measured: 129s → <2s on 5k docs at sf0.1).
    */
  private def bindOnce(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)

  /** Word n-gram shingles (distinct), e.g. n=3: "a b c". Empty array
    * when the document has fewer than n tokens. The token array is
    * bound once ([[bindOnce]]); each shingle is n O(1) element_at
    * lookups, so the whole projection is O(tokens·n) per document.
    */
  def shingles(text: Column, n: Int = 3): Column =
    bindOnce(tokens(text)) { ts =>
      val count = size(ts) - (n - 1)
      when(count >= 1,
        array_distinct(transform(sequence(lit(1), count),
          i => concat_ws(" ", (0 until n).map(o => element_at(ts, i + o)): _*))))
        .otherwise(array().cast("array<string>"))
    }

  /** Non-negative 31-bit base hash of a string (xxhash64 folded into
    * [0, P) so affine permutations can't overflow under ANSI mode).
    */
  def baseHash(s: Column): Column = pmod(xxhash64(s), lit(P))

  /** ENGINE-PORTABLE 31-bit base hash: first 8 md5 hex digits mod P —
    * exactly `('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647`
    * in DuckDB/ANSI SQL. The portable hash family exists so the
    * MinHash/LSH/fingerprint queries can carry FULL value oracles
    * (the driver's DuckDB compare replays every hash bit); the
    * xxhash64 family ([[baseHash]]/[[shingleHashes]]) remains the
    * scale path for the persisted-index pipelines (one hash
    * invocation vs md5's full digest). Same algorithm either way —
    * MinHashSpec pins recall on both.
    */
  def md5BaseHash(s: Column): Column =
    pmod(conv(substring(md5(s), 1, 8), 16, 10).cast("long"), lit(P))

  /** Distinct md5-derived shingle hashes — the portable analog of
    * [[shingleHashes]]. `array_distinct` runs AFTER hashing on both
    * engines so the two sides hold the identical hash SET even if
    * two distinct shingles collide in the 32-bit prefix space.
    * Round 10: the native fused kernel
    * ([[graft.expressions.Md5ShingleHashes]] — tokenize → gram →
    * digest → fold → dedup in one JIT loop, reused MessageDigest)
    * replaces the interpreted HOF chain, which paid lambda dispatch,
    * a materialized string array and a hex-string conv round trip
    * per gram; [[md5ShingleHashesHof]] stays as the executable
    * reference the kernel is spec-pinned bit-exact against.
    */
  def md5ShingleHashes(text: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.expressions.Md5ShingleHashes(ColumnBridge.expression(text), n))
  }

  /** The composed-builtin formulation of [[md5ShingleHashes]], kept
    * as the executable reference the native kernel is pinned against
    * (MinHashSpec) — it IS the oracle SQL, spelled in Spark builtins.
    */
  def md5ShingleHashesHof(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(text, n), md5BaseHash(_)))

  /** Scalar 64-bit md5-derived hash (first 16 md5 hex digits as a
    * signed-wrapped long). DuckDB mirror:
    * `('0x' || substr(md5(t), 1, 16))::UBIGINT` read bit-by-bit.
    */
  def md5Hash64(t: Column): Column =
    shiftleft(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(t), 9, 8), 16, 10).cast("long"))

  /** Per-token 64-bit md5-derived hashes — the portable input to
    * [[simHash]]'s pre-hashed path. Per-OCCURRENCE md5; prefer the
    * per-distinct-token form (q57's vocabulary pattern) when the
    * token stream repeats heavily.
    */
  def md5TokenHash64(toks: Column): Column =
    transform(toks, md5Hash64(_))

  /** Distinct word-n-gram shingles as raw xxhash64 longs — the native
    * codegen'd [[graft.expressions.ShingleHashes]]. The preferred form
    * for dedup pipelines: set-identical to hashing [[shingles]]'s
    * strings (same tokenizer, same hash), at ~1/3 the bytes through
    * persist and shuffle and none of the interpreted-HOF cost.
    */
  def shingleHashes(text: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.expressions.ShingleHashes(ColumnBridge.expression(text), n))
  }

  /** Per-POSITION window hashes (no dedup) — the span-coverage
    * machinery's input; values join-compatible with [[shingleHashes]].
    */
  def positionalShingleHashes(text: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.expressions.PositionalShingleHashes(
        ColumnBridge.expression(text), n))
  }

  /** Set-Jaccard of two distinct `array<bigint>` columns — the native
    * [[graft.expressions.JaccardLong]] hash-probe kernel (use with
    * [[shingleHashes]] on hot pair-verify paths).
    */
  def jaccardLong(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.JaccardLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** MinHash signature: k affine permutations `(a*h + b) mod P` over
    * the shingle hashes, min per permutation, all map-side.
    * Implemented as the native codegen'd expression
    * [[graft.expressions.MinHash]] (one JIT loop per row).
    *
    * Returns `array<bigint>` of length k (empty-input docs get
    * signature values P = "infinity" so they never collide).
    */
  def minHash(shingleCol: Column, k: Int = 48, seed: Long = 42L): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.expressions.MinHash(ColumnBridge.expression(shingleCol), k, seed))
  }

  /** Reference higher-order-function formulation of [[minHash]]
    * (interpreted single pass; kept so MinHashSpec can pin the native
    * expression's bit-exact semantics against an independent
    * implementation).
    */
  def minHashHof(shingleCol: Column, k: Int = 48, seed: Long = 42L): Column = {
    val aLit = array(lcg(seed, k).map(lit): _*)
    val bLit = array(lcg(seed + 1, k).map(lit): _*)
    val hashes = transform(shingleCol, baseHash(_))
    aggregate(
      hashes,
      array_repeat(lit(P), k),
      (acc, h) => transform(acc, (m, i) =>
        least(m, pmod(element_at(aLit, i + 1) * h +
          element_at(bLit, i + 1), lit(P)))))
  }

  /** LSH band hashes over a MinHash signature: bands of `r` rows, each
    * band hashed to one long. Join candidates share any (bandIdx,
    * bandHash). Returns `array<struct<band:int, h:bigint>>` — explode
    * then equi-join; pure shuffle-based, 100 TB-safe (no cross join).
    */
  def lshBands(sig: Column, r: Int = 4): Column = {
    val nBands = floor(size(sig) / r).cast("int")
    // guard the empty/short case: sequence(0, -1) defaults its step to
    // -1 and yields [0, -1] — two spurious bands that would make every
    // short signature collide in bogus band -1
    when(nBands >= 1,
      transform(sequence(lit(0), nBands - 1),
        b => struct(b.cast("int").as("band"),
          xxhash64(concat_ws(",", transform(slice(sig, b * r + 1, lit(r)),
            _.cast("string")))).as("h"))))
      .otherwise(array().cast("array<struct<band:int,h:bigint>>"))
  }

  /** SimHash fingerprint over token hashes, returned as
    * `struct<hi:bigint, lo:bigint>` (two 32-bit halves, so XOR +
    * bit_count gives Hamming distance without 64-bit sign issues).
    *
    * Implemented as the native codegen'd expression
    * [[graft.expressions.SimHash64]] — one JIT-compiled loop per row
    * instead of ~64 interpreted lambda evaluations per token.
    */
  def simHash(toks: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.expressions.SimHash64(ColumnBridge.expression(toks)))
  }

  /** Reference higher-order-function formulation of [[simHash]]
    * (interpreted; kept so SimHashSpec can pin the native
    * expression's bit-exact semantics against an independent
    * implementation).
    */
  def simHashHof(toks: Column): Column =
    simHashHofFromHashes(transform(toks, t => xxhash64(t)))

  /** Interpreted reference fold over pre-hashed 64-bit tokens — pins
    * the native kernel's pre-hashed path the same way [[simHashHof]]
    * pins its string path.
    */
  def simHashHofFromHashes(hashes: Column): Column = {
    // counts[i] = sum over tokens of (bit i ? +1 : -1), i in 0..63
    val counts = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, i) => a + when(getbit(h, i) === 1, 1).otherwise(-1)))
    val bits = transform(counts, c => when(c > 0, lit(1L)).otherwise(lit(0L)))
    val half = (bitsSlice: Column) =>
      aggregate(bitsSlice, lit(0L), (s, b) => s * 2 + b)
    struct(
      half(slice(bits, 1, 32)).as("hi"),
      half(slice(bits, 33, 32)).as("lo"))
  }

  /** Hamming distance between two simHash structs. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.getField("hi").bitwiseXOR(b.getField("hi"))) +
      bit_count(a.getField("lo").bitwiseXOR(b.getField("lo")))

  /** Rolling polynomial fingerprint over tokens:
    * `fp = fold(tokens)(acc*31 + baseHash(tok) mod P)` — order-
    * sensitive (unlike MinHash), so it distinguishes permuted docs.
    */
  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * 31 + baseHash(t), lit(P)))

  /** [[fingerprint]] over the portable hash family — DuckDB replays
    * the fold verbatim with `list_reduce` (acc < P, so acc·31 + h
    * stays < 2^37: no overflow on either engine).
    */
  def fingerprintPortable(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * 31 + md5BaseHash(t), lit(P)))

  /** LSH band keys over a MinHash signature in PORTABLE form: the
    * band's r signature values joined as a string key instead of
    * [[lshBands]]'s xxhash64 — two docs bucket together iff their
    * slices are EQUAL, which ANSI SQL can replay exactly (the hashed
    * form buckets on hash equality — same buckets minus a ~2^-64
    * collision, but not bit-replayable). At 100 TB the hashed form
    * wins (8-byte vs ~40-byte shuffle keys); the string form is the
    * oracle-carrying one.
    */
  def lshBandKeys(sig: Column, r: Int = 4): Column = {
    val nBands = floor(size(sig) / r).cast("int")
    when(nBands >= 1,
      transform(sequence(lit(0), nBands - 1),
        b => struct(b.cast("int").as("band"),
          concat_ws(",", transform(slice(sig, b * r + 1, lit(r)),
            _.cast("string"))).as("k"))))
      .otherwise(array().cast("array<struct<band:int,k:string>>"))
  }

  /** MinHash Jaccard ESTIMATE: fraction of equal signature components.
    * E[estimate] = true Jaccard; with k=48 components the standard
    * error at j=0.5 is ~0.07, so a loose lower cut (e.g. est ≥ 0.25
    * for a 0.5 target) prunes nearly all false candidates while
    * keeping true pairs with overwhelming probability. Cheap: 48
    * long-compares per pair vs exact set ops over full shingle arrays.
    */
  def sigEstimate(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
      .cast("double") / size(a)

  /** Set-Jaccard over two (distinct) arrays — used to verify LSH
    * candidates; division is int/int → double, deterministic across
    * engines.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Set-Jaccard via the intersect size only: for distinct arrays
    * |A∪B| = |A|+|B| − |A∩B|, so the `array_union` pass (as costly as
    * the intersect) is skipped, and the intersect size is bound once
    * ([[bindOnce]]) so the filter-then-project plan can't evaluate the
    * set op twice. Same value as [[jaccard]] — use on hot pair-verify
    * paths (hundreds of thousands of candidate pairs).
    */
  def jaccardFast(a: Column, b: Column): Column =
    bindOnce(size(array_intersect(a, b)).cast("double")) { i =>
      val u = size(a) + size(b) - i
      when(u === 0, lit(0.0)).otherwise(i / u)
    }

  // ---- quality features -------------------------------------------

  /** Stopword profiles for the language-ID heuristic (tiny fixed
    * lists; deterministic, engine-agnostic).
    */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "los", "por"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "est", "dans", "que", "pour"))

  /** Count of tokens that are members of `words`. */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Language-ID by stopword-profile argmax with a fixed tie order
    * (en > de > es > fr). A real system plugs an n-gram model here;
    * the operator shape (per-doc scores → argmax) is identical.
    */
  def langIdHeuristic(toks: Column): Column = {
    val counts = StopwordProfiles.map { case (lang, ws) => lang -> stopwordCount(toks, ws) }
    counts.init.foldRight(lit(counts.last._1): Column) { case ((lang, c), rest) =>
      val laterCounts = counts.drop(counts.indexWhere(_._1 == lang) + 1).map(_._2)
      when(laterCounts.foldLeft(lit(true): Column)((acc, o) => acc && c >= o), lit(lang))
        .otherwise(rest)
    }
  }
}
