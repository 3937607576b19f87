package graft.queries

import org.apache.spark.sql.functions._

import QU._
import graft.functions.Text

/** Corpus-analysis and decontamination operators over the
  * `documents` table (SURVEY §2.9 text analysis), split out of
  * TextOps along its family seam: TF-IDF/BM25 relevance, PMI,
  * tokenizer fertility, source overlap (exact and theta-sketch),
  * novelty, and the train/eval decontamination checks.
  */
object CorpusStatsOps {
  import TextOps.ExactBaselineDocCap

  /** Count-min grid (q72): d rows × w buckets of 8-byte counters —
    * ~80 KB of mergeable state regardless of corpus size. w = 2000
    * matches ceil(2/eps) at eps = 0.001 (the bound SketchSpec
    * asserts); d = 5 puts the per-candidate failure probability at
    * ~e^-5.
    */
  val CmsDepth = 5
  val CmsWidth = 2000

  lazy val queries: Seq[Q] = Seq(


    // -- sketch-based heavy hitters: corpus token frequencies WITHOUT
    //    the (token, count) shuffle. The count-min registers are a
    //    fixed CmsDepth×CmsWidth counter grid held AS A RELATION: each
    //    task folds its token occurrences into ≤ d·w (j, bucket)
    //    partial counts map-side, the shuffle carries only the grid,
    //    and estimates are a broadcast join of the 40 candidate tokens
    //    against it (est = min over the d rows a token hashes to).
    //    Candidate tokens come from a 5% deterministic doc sample; the
    //    sketch scores them. vs exact q67: this trades the full-token
    //    shuffle (which q67 keeps map-combined anyway) for a
    //    CONSTANT-size mergeable summary — the shape that composes
    //    with streaming and repeated probing at 100 TB.
    //    Round 16: the row hashes are the PORTABLE md5 family (the
    //    q63/q69 move), so the entire register grid replays in ANSI
    //    SQL and the query carries a FULL value oracle instead of a
    //    golden pin; the CMS contract (est >= true, est <= true +
    //    eps·N w.h.p.) stays asserted in SketchSpec. The d rows'
    //    buckets are DISJOINT 24-BIT SLICES OF ONE DIGEST (row j
    //    reads hex chars 6j+1..6j+6 of md5(token); 5×6 = 30 ≤ 32
    //    available) — one md5 per occurrence instead of d salted
    //    digests (measured 5× less hashing on the battery), and
    //    disjoint slices of an ideal digest are exactly the
    //    independent-across-rows hash family the CMS bound asks for.
    Q("q72_token_cms",
      (s, d) => {
        val docs = t(s, d).documents
        val toks = docs.select(explode(Text.tokens(col("text"))).as("token"))
        // UNROLLED register rows (round 16): the first spelling built
        // the (j, bucket) array with transform(sequence(0, d-1), ...)
        // closing over md5(tok) — higher-order functions evaluate
        // interpreted AND re-evaluate the captured digest per
        // element, so every token occurrence paid d md5s through the
        // slow path (measured: the whole query was one ~1.4s task,
        // almost all of it this). CmsDepth is a compile-time
        // constant, so the array unrolls to d literal-indexed
        // substrings of ONE md5 evaluated once per row, and the
        // whole projection whole-stage-codegens. Same digest, same
        // slices, same buckets — bit-identical registers.
        def rowBuckets(tok: org.apache.spark.sql.Column) = {
          val h = md5(tok)
          array((0 until CmsDepth).map { j =>
            struct(lit(j).as("j"), pmod(
              conv(h.substr(j * 6 + 1, 6), 16, 10).cast("long"),
              lit(CmsWidth)).as("b"))
          }: _*)
        }
        val regs = toks
          .select(explode(rowBuckets(col("token"))).as("jb"))
          .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
          .agg(count(lit(1)).as("cnt"))
        val cands = docs.filter(col("doc_id") % 20 === 0)
          .select(explode(Text.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token")).limit(40)
          .select(col("token"))
        cands
          .select(col("token"), explode(rowBuckets(col("token"))).as("jb"))
          .select(col("token"), col("jb.j").as("j"), col("jb.b").as("b"))
          .join(broadcast(regs), Seq("j", "b"))
          .groupBy(col("token")).agg(min(col("cnt")).as("est_n"))
          .orderBy(col("est_n").desc, col("token"))
          .limit(20)
      },
      Some(s"""WITH tok AS (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
          FROM documents),
        regs AS (
          SELECT j,
            ('0x' || substr(md5(token), CAST(j * 6 + 1 AS INT), 6))::BIGINT
              % $CmsWidth AS b,
            COUNT(*) AS cnt
          FROM tok CROSS JOIN range($CmsDepth) r(j)
          GROUP BY 1, 2),
        samp AS (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
          FROM documents WHERE doc_id % 20 = 0),
        cand AS (
          SELECT token, COUNT(*) AS n FROM samp GROUP BY 1
          ORDER BY n DESC, token LIMIT 40),
        est AS (
          SELECT c.token, MIN(r.cnt) AS est_n
          FROM cand c CROSS JOIN range($CmsDepth) rj(j)
          JOIN regs r ON r.j = rj.j AND r.b =
            ('0x' || substr(md5(c.token), CAST(rj.j * 6 + 1 AS INT), 6))::BIGINT
              % $CmsWidth
          GROUP BY 1)
        SELECT token, est_n FROM est
        ORDER BY est_n DESC, token LIMIT 20"""),
      "count-min heavy hitters, portable-register full replay oracle"),

    // -- TF-IDF: the canonical text-relevance scoring a training-data
    //    pipeline runs for keyword extraction / relevance filtering.
    //    Three aggregates composed in one plan: per-(doc, term)
    //    frequency, document frequency over the FULL corpus, corpus
    //    size via a one-row broadcast — then smooth idf and top-3
    //    terms per doc (output bounded to doc_id < 50). Scores are
    //    rounded to 4 dp BEFORE ranking on both engines, so a 1-ulp
    //    libm divergence in ln() cannot flip a rank across engines.
    Q("q74_tfidf",
      (s, d) => {
        val docs = t(s, d).documents
        val tf = docs.select(col("doc_id"),
            explode(Text.tokens(col("text"))).as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df_docs"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(df, Seq("token"))
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("token"), col("tf"), col("df_docs"),
            round(col("tf") * (log((col("n_docs") + 1.0) / (col("df_docs") + 1.0))
              + 1.0), 4).as("tfidf"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("token"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("doc_id") < 50 && col("rk") <= 3)
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH tok AS (
          SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS df_docs FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, token, tf, df_docs,
            ROUND(tf * (LN((n.n_docs + 1.0) / (df_docs + 1.0)) + 1.0), 4) AS tfidf
          FROM tf JOIN df USING (token), n),
        ranked AS (
          SELECT doc_id, token, tf, df_docs, tfidf,
            ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, token) AS rk
          FROM scored)
        SELECT doc_id, token, tf, df_docs, tfidf, CAST(rk AS INT) AS rk
        FROM ranked WHERE doc_id < 50 AND rk <= 3 ORDER BY doc_id, rk"""),
      "TF-IDF top terms per document"),

    // -- decontamination: flag training documents sharing any 8-token
    //    shingle with a benchmark/eval set (here: doc_id % 50 == 0
    //    stands in for the heldout set) — the train/eval overlap
    //    check every serious LLM data pipeline runs. Scale shape is
    //    an exploded shingle EQUI-join (distinct shingles per doc,
    //    benchmark side small → broadcast), never a doc×doc cross
    //    join; at 100 TB the join key would be the 64-bit shingle
    //    hash (q54's trick) — strings here so the oracle can replay
    //    it verbatim.
    Q("q77_decontamination",
      (s, d) => {
        val docs = t(s, d).documents
        val corpus = docs.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"),
            explode(array_distinct(Text.shingles(col("text"), 8))).as("sh"))
        val bench = docs.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("bench_id"),
            explode(array_distinct(Text.shingles(col("text"), 8))).as("sh"))
        corpus.join(broadcast(bench), Seq("sh"))
          .groupBy(col("doc_id"), col("bench_id"))
          .agg(count(lit(1)).as("n_shared"))
          .orderBy(col("doc_id"), col("bench_id"))
      },
      Some("""WITH sh AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(string_split_regex(lower(trim(text)), '\s+')) >= 8
              THEN list_transform(
                range(1, len(string_split_regex(lower(trim(text)), '\s+')) - 6),
                i -> array_to_string(string_split_regex(lower(trim(text)), '\s+')[i:i+7], ' '))
              ELSE [] END)) AS sh
          FROM documents),
        corpus AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
        bench AS (SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id % 50 = 0)
        SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
        FROM corpus c JOIN bench b USING (sh)
        GROUP BY c.doc_id, b.bench_id
        ORDER BY doc_id, bench_id"""),
      "train/eval 8-gram overlap decontamination"),

    // -- per-doc contamination FRACTION: q77 detects train/eval
    //    overlap pairs; this is the decision form a pipeline actually
    //    filters on — for each training doc, the fraction of its
    //    token positions covered by the UNION of 8-gram windows
    //    shared with the benchmark set, and the drop verdict at the
    //    20% threshold. Same machinery as q90 (positional hashed
    //    windows + interval-union window), with the benchmark's
    //    distinct shingle-hash set on the broadcast side of the
    //    semi join — at 100 TB the benchmark is the small fixed side,
    //    so the corpus is scanned once and never shuffled by pair.
    Q("q93_contamination_frac",
      (s, d) => {
        val W = 8
        val docs = t(s, d).documents
        val corpus = docs.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
          .select(col("doc_id"), col("tk"),
            size(col("tk")).cast("long").as("n"))
        // native per-position window hashes (one JIT loop per doc;
        // values join-compatible with the bench side's shingleHashes)
        val wins = docs.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"),
            posexplode(Text.positionalShingleHashes(col("text"), W)))
          .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
            col("col").as("h"))
        val bench = docs.filter(col("doc_id") % 50 === 0)
          .select(explode(Text.shingleHashes(col("text"), W)).as("h"))
          .distinct()
        val wnd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("p"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val agg = wins.join(broadcast(bench), Seq("h"), "left_semi")
          .withColumn("prev_end", max(col("p") + (W - 1)).over(wnd))
          .withColumn("contrib", greatest(lit(0L),
            (col("p") + (W - 1)) -
              greatest(coalesce(col("prev_end"), lit(0L)), col("p") - 1)))
          .groupBy(col("doc_id"))
          .agg(sum(col("contrib")).as("contaminated"))
        corpus.select(col("doc_id"), col("n").as("n_tokens"))
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("contaminated"), lit(0L)).as("contaminated_tokens"),
            (coalesce(col("contaminated"), lit(0L)).cast("double")
              / col("n_tokens")).as("contaminated_frac"),
            (coalesce(col("contaminated"), lit(0L)).cast("double")
              / col("n_tokens") > 0.2).cast("int").as("dropped"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents),
        d AS (SELECT doc_id, tk, len(tk) AS n FROM toks
              WHERE doc_id % 50 <> 0),
        w AS (
          SELECT doc_id, i AS p, array_to_string(tk[i:i+7], ' ') AS win
          FROM d, LATERAL unnest(range(1, n - 6)) AS r(i)
          WHERE n >= 8),
        bench AS (
          SELECT DISTINCT unnest(list_distinct(
            CASE WHEN len(tk) >= 8
              THEN list_transform(range(1, len(tk) - 6),
                i -> array_to_string(tk[i:i+7], ' '))
              ELSE [] END)) AS win
          FROM toks WHERE doc_id % 50 = 0),
        cw AS (SELECT w.doc_id, w.p FROM w SEMI JOIN bench USING (win)),
        iv AS (
          SELECT doc_id, p,
            GREATEST(0, (p + 7) - GREATEST(COALESCE(MAX(p + 7) OVER (
              PARTITION BY doc_id ORDER BY p
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
              p - 1)) AS contrib
          FROM cw),
        agg AS (SELECT doc_id, SUM(contrib) AS contaminated
                FROM iv GROUP BY doc_id)
        SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_tokens,
          CAST(COALESCE(agg.contaminated, 0) AS BIGINT)
            AS contaminated_tokens,
          CAST(COALESCE(agg.contaminated, 0) AS DOUBLE) / d.n
            AS contaminated_frac,
          CAST(CAST(COALESCE(agg.contaminated, 0) AS DOUBLE) / d.n > 0.2
            AS INT) AS dropped
        FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""),
      "per-doc benchmark-contamination fraction with drop verdict"),

    // -- BM25 relevance scoring: the probabilistic ranking function
    //    behind retrieval-based quality filtering and dataset search.
    //    Query = the top-3 corpus-frequency tokens (deterministic
    //    tie-break), so the operator needs no external literal. One
    //    token explode feeds doc lengths, the query-term cut, and
    //    per-(doc, term) tf; df and (N, avgdl) are term-bounded /
    //    1-row broadcasts, so nothing shuffles at corpus scale except
    //    the (doc, term) aggregate itself. Every constant is written
    //    as the SAME literal on both sides (1.2+1.0 at plan time is
    //    not bit-identical to the literal 2.2); per-term contributions
    //    round to 4dp then sum in DECIMAL so per-doc totals are
    //    partition-order-free (q74's convention).
    Q("q109_bm25",
      (s, d) => {
        // ONE corpus explode+aggregate, reused three ways: doc
        // lengths, the query-term cut, and per-(doc, term) tf all
        // roll up from the persisted (doc, token) counts — three
        // separate explodes would be three corpus scans at 100 TB.
        val tfAll = t(s, d).documents.select(col("doc_id"),
            explode(Text.tokens(col("text"))).as("token"))
          .filter(length(col("token")) > 0)
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
          .persist()
        val dl = tfAll.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
          davg(col("dl")).as("avgdl"))
        val qterms = tfAll.groupBy(col("token"))
          .agg(sum(col("tf")).as("cf"))
          .orderBy(col("cf").desc, col("token")).limit(3)
          .select(col("token"))
        val tf = tfAll.join(broadcast(qterms), Seq("token"))
        val dfd = tf.groupBy(col("token")).agg(count(lit(1)).as("df_docs"))
        val contrib = tf.join(broadcast(dfd), Seq("token"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .select(col("doc_id"),
            round(
              log((col("n_docs") - col("df_docs") + 0.5)
                  / (col("df_docs") + 0.5) + 1.0)
                * (col("tf") * lit(2.2))
                / (col("tf")
                  + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))),
              4).as("contrib"))
        contrib.groupBy(col("doc_id"))
          .agg(count(lit(1)).cast("int").as("n_terms_hit"),
            round(sum(col("contrib").cast("decimal(38,6)")).cast("double"), 4)
              .as("bm25"))
          .filter(col("doc_id") < 200)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tok AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
          FROM documents),
        tok2 AS (SELECT * FROM tok WHERE length(token) > 0),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY 1),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
            ${sqlDavg("dl")} AS avgdl FROM dl),
        qterms AS (SELECT token FROM tok2 GROUP BY token
          ORDER BY COUNT(*) DESC, token LIMIT 3),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok2
          SEMI JOIN qterms USING (token) GROUP BY 1, 2),
        dfd AS (SELECT token, COUNT(*) AS df_docs FROM tf GROUP BY 1),
        contrib AS (
          SELECT tf.doc_id,
            ROUND(LN((stats.n_docs - dfd.df_docs + 0.5)
                / (dfd.df_docs + 0.5) + 1.0)
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
              4) AS contrib
          FROM tf JOIN dfd USING (token) JOIN dl USING (doc_id), stats)
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_terms_hit,
          ROUND(CAST(SUM(CAST(contrib AS DECIMAL(38,6))) AS DOUBLE), 4) AS bm25
        FROM contrib WHERE doc_id < 200 GROUP BY doc_id ORDER BY doc_id"""),
      "BM25 scoring vs the top-3 corpus terms (retrieval-based filter)"),

    // -- tokenizer FERTILITY per language: subwords per whitespace
    //    word (q51's BPE-ish regex as the subword stand-in) and chars
    //    per subword — the metric that decides whether a tokenizer's
    //    vocab fits a language (high fertility = the language pays
    //    more sequence length per word). Language-cardinality
    //    aggregate, map-side combinable; exact integer sums (cast off
    //    DuckDB's HUGEINT path) divided in double space, so no
    //    rounding is needed anywhere.
    Q("q112_tokenizer_fertility",
      (s, d) => {
        val ws = size(Text.tokens(col("text")))
        val bpe = size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        val chars = length(regexp_replace(col("text"), "\\s", ""))
        t(s, d).documents
          .select(col("lang"), ws.cast("long").as("ws"),
            bpe.cast("long").as("bpe"), chars.cast("long").as("chars"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ws")).as("n_words"),
            sum(col("bpe")).as("n_subwords"),
            (sum(col("bpe")).cast("double") / sum(col("ws")))
              .as("fertility"),
            (sum(col("chars")).cast("double") / sum(col("bpe")))
              .as("chars_per_subword"))
          .orderBy(col("lang"))
      },
      Some("""WITH per AS (
          SELECT lang,
            CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
              AS ws,
            CAST(len(regexp_extract_all(lower(text),
              '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe,
            CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
              AS chars
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(ws) AS BIGINT) AS n_words,
          CAST(SUM(bpe) AS BIGINT) AS n_subwords,
          CAST(SUM(bpe) AS DOUBLE) / SUM(ws) AS fertility,
          CAST(SUM(chars) AS DOUBLE) / SUM(bpe) AS chars_per_subword
        FROM per GROUP BY lang ORDER BY lang"""),
      "per-language tokenizer fertility (subwords/word, chars/subword)"),

    // -- cross-source content OVERLAP: exact Jaccard between every
    //    pair of sources' distinct 3-gram shingle sets — the corpus
    //    composition audit that catches one source mirroring another
    //    (mirrored content defeats per-source mix weights and leaks
    //    across dedup shards). Shape: distinct (source, shingle)
    //    rows, a self-equi-join ON THE SHINGLE (pairs per shingle ≤
    //    |sources|², a constant), per-source set sizes joined back —
    //    linear in distinct shingles at any sf, never doc×doc.
    Q("q113_source_overlap",
      (s, d) => {
        // persisted: the distinct (source, shingle) set feeds the
        // self-join twice plus the per-source sizes — recomputing it
        // three times is three corpus explodes at scale
        val sh = t(s, d).documents
          .select(col("source"), explode(array_distinct(
            Text.shingles(col("text"), 3))).as("sh"))
          .distinct()
          .persist()
        val per = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
        val pairs = sh.as("a").join(sh.as("b"),
            col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(count(lit(1)).as("n_common"))
        pairs
          .join(per.select(col("source").as("src_a"), col("n_sh").as("n_a")),
            Seq("src_a"))
          .join(per.select(col("source").as("src_b"), col("n_sh").as("n_b")),
            Seq("src_b"))
          .select(col("src_a"), col("src_b"), col("n_common"),
            col("n_a"), col("n_b"),
            round(col("n_common").cast("double")
              / (col("n_a") + col("n_b") - col("n_common")), 4).as("jaccard"))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some("""WITH sh0 AS (
          SELECT source, unnest(list_distinct(
            CASE WHEN len(string_split_regex(lower(trim(text)), '\s+')) >= 3
              THEN list_transform(
                range(1, len(string_split_regex(lower(trim(text)), '\s+')) - 1),
                i -> array_to_string(string_split_regex(lower(trim(text)), '\s+')[i:i+2], ' '))
              ELSE [] END)) AS sh
          FROM documents),
        sh AS (SELECT DISTINCT source, sh FROM sh0),
        per AS (SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY 1),
        pairs AS (
          SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
          GROUP BY 1, 2)
        SELECT src_a, src_b, n_common, p1.n_sh AS n_a, p2.n_sh AS n_b,
          ROUND(CAST(n_common AS DOUBLE)
            / (p1.n_sh + p2.n_sh - n_common), 4) AS jaccard
        FROM pairs JOIN per p1 ON pairs.src_a = p1.source
          JOIN per p2 ON pairs.src_b = p2.source
        ORDER BY src_a, src_b"""),
      "cross-source 3-gram Jaccard overlap matrix (composition audit)"),

    // -- ESTIMATED cross-source overlap via KMV/Theta sketches:
    //    q113's exact Jaccard matrix needs the full distinct-shingle
    //    relation through a self-join; the K-minimum-values sketch
    //    (the mergeable family that, unlike HLL, supports
    //    INTERSECTION and DIFFERENCE) answers the same question from
    //    one bounded-state aggregate — per-source state is ≤ K+1
    //    retained hashes regardless of corpus size
    //    ([[graft.expressions.KmvSketchAgg]]: O(log K) tree insert
    //    with an O(1) threshold reject once full), partials merge
    //    map-side, and the pair matrix is a broadcast of the
    //    source-cardinality sketch table; set ops run as array
    //    functions over the ≤ K retained sets below θ = the (K+1)-th
    //    smallest hash, est = c·H/θ (H = the md5 family's 2^31-1
    //    hash space).
    //    Round 16: the hashes are the PORTABLE md5 shingle family
    //    (q55/q56's), so the ENTIRE register state — retained sets,
    //    thetas, every set-op estimate — replays in ANSI SQL
    //    (ROW_NUMBER over the distinct hashes; the sort the oracle
    //    pays is exactly what the bounded tree avoids engine-side)
    //    and the query carries a FULL value oracle instead of a
    //    golden pin. SketchSpec still bounds the estimates against
    //    q113's exact values.
    Q("q115_theta_source_overlap",
      (s, d) => {
        val k = KmvK
        // the session-shared K=16384 buffers, TRIMMED to this query's
        // K: the 4097 smallest distinct hashes are within the 16385
        // smallest, so the trim-derived sketch is bit-identical to a
        // from-scratch K=4096 build (the KmvStore mergeability
        // argument) — one corpus hash pass serves both theta queries
        val sk = kmvSketchFromBuf(
          SharedStages.kmvSketchBufs(s, d)
            .withColumn("buf", slice(col("buf"), 1, k + 1)), k).persist()
        sk.count() // feeds both sides of the pair frame
        val a = sk.select(col("source").as("src_a"),
          col("theta").as("th_a"), col("retained").as("ra"))
        val b = sk.select(col("source").as("src_b"),
          col("theta").as("th_b"), col("retained").as("rb"))
        a.crossJoin(broadcast(b))
          .filter(col("src_a") < col("src_b"))
          .withColumn("th_i", least(col("th_a"), col("th_b")))
          .withColumn("nc", size(filter(
            array_intersect(col("ra"), col("rb")), h => h < col("th_i"))))
          .withColumn("uc", array_sort(filter(
            array_distinct(concat(col("ra"), col("rb"))),
            h => h < col("th_i"))))
          .withColumn("th_u", when(size(col("uc")) > k,
            element_at(col("uc"), k + 1)).otherwise(col("th_i")))
          .withColumn("nu", when(size(col("uc")) > k, lit(k))
            .otherwise(size(col("uc"))))
          .select(col("src_a"), col("src_b"),
            kmvEst(col("nc"), col("th_i")).as("n_common_est"),
            kmvEst(size(col("ra")), col("th_a")).as("n_a_est"),
            kmvEst(size(col("rb")), col("th_b")).as("n_b_est"),
            kmvEst(col("nu"), col("th_u")).as("n_union_est"))
          .withColumn("jaccard_est",
            round(col("n_common_est").cast("double") / col("n_union_est"), 4))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some(s"""WITH ${kmvSketchCtes(KmvK)},
        rc AS (SELECT source, COUNT(*) AS c FROM ret GROUP BY 1),
        pr AS (
          SELECT ta.source AS src_a, tb.source AS src_b,
            ta.theta AS th_a, tb.theta AS th_b,
            LEAST(ta.theta, tb.theta) AS th_i
          FROM th ta JOIN th tb ON ta.source < tb.source),
        com AS (
          SELECT pr.src_a, pr.src_b, COUNT(*) AS nc
          FROM pr JOIN ret ra ON ra.source = pr.src_a AND ra.h < pr.th_i
            JOIN ret rb ON rb.source = pr.src_b AND rb.h = ra.h
          GROUP BY 1, 2),
        ucand AS (
          SELECT DISTINCT pr.src_a, pr.src_b, r2.h
          FROM pr JOIN ret r2
            ON r2.source IN (pr.src_a, pr.src_b) AND r2.h < pr.th_i),
        ur AS (
          SELECT src_a, src_b, h,
            ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS r
          FROM ucand),
        un AS (
          SELECT src_a, src_b, COUNT(*) AS total,
            MAX(CASE WHEN r = ${KmvK + 1} THEN h END) AS h_kp1
          FROM ur GROUP BY 1, 2),
        est AS (
          SELECT pr.src_a, pr.src_b,
            CAST(ROUND(COALESCE(com.nc, 0) * 2147483647.0 / pr.th_i) AS BIGINT)
              AS n_common_est,
            CAST(ROUND(rca.c * 2147483647.0 / pr.th_a) AS BIGINT) AS n_a_est,
            CAST(ROUND(rcb.c * 2147483647.0 / pr.th_b) AS BIGINT) AS n_b_est,
            CAST(ROUND((CASE WHEN un.total > $KmvK THEN $KmvK ELSE un.total END)
              * 2147483647.0
              / (CASE WHEN un.total > $KmvK THEN un.h_kp1 ELSE pr.th_i END))
              AS BIGINT) AS n_union_est
          FROM pr
          JOIN rc rca ON rca.source = pr.src_a
          JOIN rc rcb ON rcb.source = pr.src_b
          JOIN un ON un.src_a = pr.src_a AND un.src_b = pr.src_b
          LEFT JOIN com ON com.src_a = pr.src_a AND com.src_b = pr.src_b)
        SELECT src_a, src_b, n_common_est, n_a_est, n_b_est, n_union_est,
          ROUND(n_common_est / n_union_est, 4) AS jaccard_est
        FROM est ORDER BY src_a, src_b"""),
      "cross-source overlap via portable KMV set ops (full replay oracle)"),

    // -- per-source content NOVELTY: how much of a source's distinct
    //    shingle set appears in NO other source — the acquisition
    //    metric ("does buying this corpus add anything?"). Exact
    //    form needs shingle×source co-occurrence; the sketch form is
    //    difference(sk_s, union of every other source's sketch),
    //    with the union-of-others built from the same bounded
    //    per-source KMV sketches (source-cardinality broadcast pair
    //    frame, a grouped re-rank over sources²×K retained hashes —
    //    post-sketch model state, never a second corpus scan).
    //    Round 16: portable md5 hashes → FULL replay oracle (the
    //    q115 note); SketchSpec still bounds novelty_rate against
    //    the exact co-occurrence answer.
    //
    //    Sketch sizing: the DIFFERENCE estimate's error is driven by
    //    the union-of-others sketch, which holds ~|sources|× a
    //    single source's cardinality — at K 4096 that union is deep
    //    in sampling and the novelty rate drifted 0.07 off exact on
    //    the fixture. K 16384 (128 KB per source — trivial state at
    //    source-cardinality groups) keeps the rate within 0.05 at
    //    any corpus size; precision is a knob, not a rewrite.
    Q("q116_theta_novelty",
      (s, d) => {
        val sk = kmvSketchFromBuf(
          SharedStages.kmvSketchBufs(s, d), KmvKNovelty).persist()
        sk.count() // feeds both sides of the pair frame + the join back
        kmvNoveltyOf(sk, KmvKNovelty)
      },
      Some(kmvNoveltyOracleSql),
      "per-source novelty via portable KMV difference (full replay oracle)"),

    // -- q173: q116's novelty SERVED FROM THE PERSISTED INCREMENTAL
    //    KMV STORE ([[KmvStore]] — built over the 4/5 crawl prefix,
    //    one appended epoch for the last fifth): each batch was
    //    folded into bounded per-source retained sets at ingest, and
    //    the dashboard read re-sketches ≤ (K+1)·epochs rows per
    //    source — never the resident text. The oracle is q116's
    //    whole-corpus SQL replay VERBATIM: KMV's exact mergeability
    //    (the union's K+1 smallest are each among their own side's
    //    K+1 smallest) makes the incremental store's merge-on-read
    //    equal the from-scratch sketch bit-for-bit, order-free — so
    //    the driver's hash compare proves the entire persisted
    //    apparatus (batch sketching, epoch commits, θ-witness
    //    carriage, merge-on-read) against plain SQL over the raw
    //    corpus. The q152/q157 incremental == from-scratch pattern,
    //    carried to the sketch family.
    Q("q173_incremental_source_novelty",
      (s, d) => {
        val sk = KmvStore.sketches(s, SharedStages.kmvStorePath(s, d))
          .persist()
        sk.count() // feeds both sides of the pair frame + the join back
        kmvNoveltyOf(sk, KmvKNovelty)
      },
      Some(kmvNoveltyOracleSql),
      "novelty from the persisted incremental KMV store (full replay oracle)"),

    // -- q119: adjacent-bigram PMI — phrase/collocation mining (the
    //    word2vec-style phrase-merge signal, and the association score
    //    behind "these tokens behave as one unit" vocabulary
    //    decisions). Reuses q98's bigram construction (per-doc lag
    //    window over positioned tokens) but scores association rather
    //    than surprise: pmi = ln(c12·N² / (B·c1·c2)) from five exact
    //    integer aggregates — c12 vocab²-bounded, c1/c2 vocab-bounded
    //    (broadcast into the join), N/B one broadcast row. The ratio
    //    is assembled in doubles with a FIXED left-to-right operation
    //    order spelled identically in both engines and 4dp-rounded
    //    BEFORE the rank, so libm's last ulp can't reorder the top-k
    //    (q74's round-before-rank rule). Output is the top 50 by
    //    (pmi, pair) over pairs seen ≥5 times — TakeOrderedAndProject,
    //    never a global sort.
    Q("q119_bigram_pmi",
      (s, d) => {
        val toks = t(s, d).documents
          .select(col("doc_id"), posexplode(Text.tokens(col("text")))
            .as(Seq("p", "w2")))
          .withColumn("w1", lag(col("w2"), 1)
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("doc_id")).orderBy(col("p"))))
        val uni = toks.groupBy(col("w2").as("w")).agg(count(lit(1)).as("c"))
          .persist() // feeds both unigram joins + the N total
        uni.count()
        val bi = toks.filter(col("w1").isNotNull)
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
          .persist() // feeds the join + the B total
        bi.count()
        val totals = uni.agg(sum(col("c")).as("n_tok"))
          .crossJoin(bi.agg(sum(col("c12")).as("n_big")))
        // no broadcast hint on the unigram joins: "vocab-bounded" is
        // small at fixture scale (AQE broadcasts it on its own) but a
        // real 100 TB crawl's vocabulary is 10⁷–10⁸ types — forcing
        // the hint would pin a maybe-GBs relation to every executor,
        // while a plain vocab-keyed shuffle join is always safe
        bi.filter(col("c12") >= 5)
          .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
          .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
          .crossJoin(broadcast(totals))
          .select(col("w1"), col("w2"), col("c12"),
            round(log(col("c12").cast("double") * col("n_tok") * col("n_tok")
              / (col("n_big").cast("double") * col("c1") * col("c2"))), 4)
              .as("pmi"))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
          .limit(50)
      },
      Some("""WITH tok AS (
          SELECT doc_id, i AS p, tk[i] AS w2,
            CASE WHEN i > 1 THEN tk[i - 1] END AS w1
          FROM (SELECT doc_id,
                  string_split_regex(lower(trim(text)), '\s+') AS tk
                FROM documents) t,
            LATERAL unnest(range(1, len(tk) + 1)) AS r(i)),
        uni AS (SELECT w2 AS w, COUNT(*) AS c FROM tok GROUP BY 1),
        bi AS (
          SELECT w1, w2, COUNT(*) AS c12 FROM tok
          WHERE w1 IS NOT NULL GROUP BY 1, 2),
        totals AS (
          SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n_tok,
            (SELECT CAST(SUM(c12) AS BIGINT) FROM bi) AS n_big)
        SELECT w1, w2, c12,
          ROUND(LN(CAST(c12 AS DOUBLE) * n_tok * n_tok
            / (CAST(n_big AS DOUBLE) * u1.c * u2.c)), 4) AS pmi
        FROM bi
        JOIN uni u1 ON bi.w1 = u1.w
        JOIN uni u2 ON bi.w2 = u2.w, totals
        WHERE c12 >= 5
        ORDER BY pmi DESC, w1, w2 LIMIT 50"""),
      "top adjacent-bigram PMI collocations (round-before-rank)"),

    // -- q123: crawl-order SHINGLE NOVELTY per document — the exact,
    //    per-doc complement of q116's per-source theta estimate: with
    //    doc_id as crawl order, what fraction of each document's
    //    distinct 3-gram shingles has never appeared in any earlier
    //    document? The dedup-pipeline use is ordering-aware corpus
    //    valuation (novelty decays as a crawl saturates) and
    //    diminishing-returns curves for data acquisition. One
    //    aggregate computes each shingle's FIRST carrier (min doc_id
    //    — q118's min-first-bucket rule), one equi-join back marks
    //    novel shingles; no pair join, no window over the corpus.
    //    Work is linear in distinct (doc, shingle) pairs.
    Q("q123_shingle_novelty",
      (s, d) => {
        val docs = t(s, d).documents
        val sh = docs
          .select(col("doc_id"), explode(array_distinct(
            Text.shingles(col("text"), 3))).as("sh"))
          .persist() // feeds the first-carrier agg AND the per-doc count
        sh.count()
        val first = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
        val perDoc = sh.join(first, Seq("sh"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            count(when(col("first_doc") === col("doc_id"), lit(1)))
              .as("n_novel"))
        docs.select(col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"),
            round(col("n_novel").cast("double") / col("n_shingles"), 4)
              .as("novelty"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH sh AS (
          SELECT DISTINCT doc_id,
            array_to_string(tk[i:i+2], ' ') AS sh
          FROM (SELECT doc_id,
                  string_split_regex(lower(trim(text)), '\s+') AS tk
                FROM documents) t,
            LATERAL unnest(range(1, len(tk) - 1)) AS r(i)
          WHERE len(tk) >= 3),
        first AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
        per_doc AS (
          SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
            CAST(COUNT(CASE WHEN f.first_doc = sh.doc_id THEN 1 END)
              AS BIGINT) AS n_novel
          FROM sh JOIN first f USING (sh) GROUP BY 1)
        SELECT d.doc_id,
          COALESCE(p.n_shingles, 0) AS n_shingles,
          COALESCE(p.n_novel, 0) AS n_novel,
          ROUND(CAST(p.n_novel AS DOUBLE) / p.n_shingles, 4) AS novelty
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
        ORDER BY d.doc_id"""),
      "per-document crawl-order shingle novelty (exact first-carrier join)"),
  )

  /** KMV nominal entries for q115's pair matrix (the DataSketches
    * default lgK 12) and q116's novelty difference (lgK 14 — the
    * union-of-others precision argument at the q116 declaration).
    * Sized so sf0.01 per-source shingle cardinalities keep the
    * sketches in genuine estimation mode (SketchSpec's proviso).
    */
  val KmvK = 4096
  val KmvKNovelty = 16384

  /** The md5 hash family's space: hashes live in [0, 2^31-1), so an
    * exact-mode sketch's θ is the space bound itself and c·H/θ
    * degrades to the exact count.
    */
  val KmvHashSpace = 2147483647L

  /** q116's full replay oracle — ALSO q173's: the incremental
    * [[KmvStore]]'s merge-on-read equals the from-scratch sketch by
    * exact mergeability, so the same whole-corpus SQL replay
    * hash-verifies both the direct and the persisted path (the
    * shared-spelling discipline of q100/q152).
    */
  private def kmvNoveltyOracleSql: String =
    s"""WITH ${kmvSketchCtes(KmvKNovelty)},
        rc AS (SELECT source, COUNT(*) AS na FROM ret GROUP BY 1),
        thu0 AS (
          SELECT a.source AS src, MIN(b.theta) AS th_u0
          FROM th a JOIN th b ON b.source <> a.source GROUP BY 1),
        cand AS (
          SELECT DISTINCT a.source AS src, r2.h
          FROM th a JOIN ret r2 ON r2.source <> a.source
          JOIN thu0 ON thu0.src = a.source
          WHERE r2.h < thu0.th_u0),
        ur AS (
          SELECT src, h,
            ROW_NUMBER() OVER (PARTITION BY src ORDER BY h) AS r
          FROM cand),
        uth AS (
          SELECT ur.src, MAX(thu0.th_u0) AS th_u0, COUNT(*) AS total,
            MAX(CASE WHEN r = ${KmvKNovelty + 1} THEN h END) AS h_kp1
          FROM ur JOIN thu0 ON thu0.src = ur.src
          GROUP BY 1),
        uth2 AS (
          SELECT src,
            CASE WHEN total > $KmvKNovelty THEN h_kp1 ELSE th_u0 END AS th_u
          FROM uth),
        uret AS (
          SELECT ur.src, ur.h FROM ur JOIN uth2 USING (src)
          WHERE ur.h < uth2.th_u),
        base AS (
          SELECT th.source, th.theta AS th_s, rc.na, uth2.th_u,
            LEAST(th.theta, uth2.th_u) AS th_d
          FROM th JOIN rc USING (source)
          JOIN uth2 ON uth2.src = th.source),
        novel AS (
          SELECT b.source, COUNT(*) AS nn
          FROM base b JOIN ret r ON r.source = b.source AND r.h < b.th_d
          WHERE NOT EXISTS (
            SELECT 1 FROM uret u WHERE u.src = b.source AND u.h = r.h)
          GROUP BY 1)
        SELECT b.source,
          CAST(ROUND(b.na * 2147483647.0 / b.th_s) AS BIGINT) AS n_est,
          CAST(ROUND(COALESCE(novel.nn, 0) * 2147483647.0 / b.th_d) AS BIGINT)
            AS n_novel_est,
          ROUND(CAST(ROUND(COALESCE(novel.nn, 0) * 2147483647.0 / b.th_d) AS BIGINT)
            / CAST(ROUND(b.na * 2147483647.0 / b.th_s) AS BIGINT), 4)
            AS novelty_rate
        FROM base b LEFT JOIN novel USING (source)
        ORDER BY source"""

  private[queries] def kmvAgg(c: org.apache.spark.sql.Column, retain: Int) = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.KmvSketchAgg(
      ColumnBridge.expression(c), retain).toAggregateExpression())
  }

  /** KMV distinct-count estimate: c retained values below θ →
    * round(c·H/θ) (H = [[KmvHashSpace]]); c ≤ 2^15 and H < 2^31 keep
    * the product exact in a double, so both engines compute the
    * identical single division and round.
    */
  private def kmvEst(c: org.apache.spark.sql.Column,
      theta: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c.cast("double") * lit(KmvHashSpace.toDouble) / theta).cast("long")

  /** Per-source KMV sketch over the distinct md5 3-gram shingle
    * hashes: (source, theta, retained) — retained = the K smallest
    * distinct hashes strictly below θ = the (K+1)-th smallest (or
    * the hash-space bound when the source holds ≤ K distinct
    * hashes: exact mode). One bounded aggregate over the exploded
    * shingle-hash relation; the md5 digests ride the fused
    * [[graft.expressions.Md5ShingleHashes]] kernel.
    */
  /** (source, buf) raw K+1 buffers over a (source, text) corpus —
    * the md5 3-gram shingle hashes through one bounded [[kmvAgg]];
    * the build seam [[KmvStore]], the session-shared q115/q116 stage
    * ([[SharedStages.kmvSketchBufs]]) and the specs all reuse.
    */
  private[queries] def kmvBufOfDocs(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame =
    kmvBufOf(docs.select(col("source"),
      explode(Text.md5ShingleHashes(col("text"), 3)).as("h")), k)

  /** (source, buf) — the raw K+1-smallest-distinct buffers from a
    * (source, h) hash relation: one bounded [[kmvAgg]] per source
    * over however the hashes arrive — the raw corpus explode
    * (q115/q116) or a [[KmvStore]]'s merge-on-read union of
    * per-epoch buffer rows. The buffer (NOT the θ-trimmed retained
    * set) is the mergeable unit: the union's (K+1)-th smallest can
    * be one side's θ witness, so dropping it pre-merge would break
    * the exact-mergeability equality the store's oracle rides on.
    */
  private[queries] def kmvBufOf(hs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame =
    hs.groupBy(col("source"))
      .agg(kmvAgg(col("h"), k + 1).as("buf"))

  /** (source, θ, retained) sketches from the raw buffers: θ = the
    * (K+1)-th smallest (hash-space bound when the source holds ≤ K
    * distinct hashes), retained = the values strictly below θ.
    */
  private[queries] def kmvSketchFromBuf(
      bufDf: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame =
    bufDf
      .withColumn("theta", when(size(col("buf")) <= k, lit(KmvHashSpace))
        .otherwise(element_at(col("buf"), k + 1)))
      .withColumn("retained", filter(col("buf"), h => h < col("theta")))
      .select(col("source"), col("theta"), col("retained"))

  private[queries] def kmvSketchOf(hs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame =
    kmvSketchFromBuf(kmvBufOf(hs, k), k)

  /** q116's novelty computation over ALREADY-BUILT sketches (caller
    * persists `sk` — it feeds both sides of the pair frame and the
    * join back): union-of-others via a grouped re-rank of the
    * bounded retained sets (sources²×K rows — post-sketch model
    * state), then the difference estimate below θ_d = min(θ_s, θ_u).
    * Shared by q116 (sketches from the corpus) and q173 (sketches
    * from the persisted incremental [[KmvStore]]), so the stored
    * path provably computes the same answer.
    */
  private[queries] def kmvNoveltyOf(sk: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    // union-of-others: θ_u0 = min other θ, then the K+1 smallest
    // candidates below it via the SAME bounded [[kmvAgg]] the
    // sketches were built with (it dedups and trims map-side) —
    // θ_u = min(θ_u0, the (K+1)-th smallest candidate), retained =
    // candidates below θ_u. Equivalent to ranking all distinct
    // candidates per src, without materializing the sources²×K
    // candidate frame through a distinct + sort window (the
    // measured-slow first spelling).
    //
    // Round-16 shape (measured on the r16 profile: this arm was ~4s
    // of the 4.5s query): (a) the src frame REPARTITIONS by src so
    // the sources×K explode + partial fold runs one task per source
    // instead of inheriting the sketch table's 1–2 read partitions
    // (a 20-row shuffle buys sources-way parallelism over the only
    // sources²×K stage in the plan); (b) θ_u0 — a sources-cardinality
    // aggregate — joins as an explicit BROADCAST, which removes the
    // planner's Exchange+Sort+SortMergeJoin under the exploded frame
    // (the sources²×K rows now flow scan→filter→partial-fold with no
    // sort and no row-level shuffle: the exchange carries one bounded
    // buffer per (task, src)); (c) ubuf PERSISTS — it feeds both θ_u
    // and the retained-union explode, and unpersisted the whole
    // sources²×K subtree executed twice (the two ~5.7s sibling jobs
    // on the r16 profile). Values are unchanged: kmvAgg is
    // order-insensitive (a dedup + K+1-smallest selection), so
    // partitioning and join strategy cannot move a single hash.
    val pairsFrame = sk.select(col("source").as("src"))
      .repartition(col("src"))
      .crossJoin(broadcast(sk.select(col("source").as("other"),
        col("theta").as("th_o"), col("retained").as("ro"))))
      .filter(col("src") =!= col("other"))
    val thU0 = pairsFrame.groupBy(col("src"))
      .agg(min(col("th_o")).as("th_u0"))
    val ubuf = pairsFrame
      .select(col("src"), explode(col("ro")).as("h"))
      .join(broadcast(thU0), Seq("src")).filter(col("h") < col("th_u0"))
      .groupBy(col("src"), col("th_u0"))
      .agg(kmvAgg(col("h"), k + 1).as("ubuf"))
      .withColumn("th_u", when(size(col("ubuf")) <= k, col("th_u0"))
        .otherwise(element_at(col("ubuf"), k + 1)))
      .persist()
    val uth = ubuf.select(col("src").as("source"), col("th_u"))
    val uret = ubuf.select(col("src").as("source"),
      explode(filter(col("ubuf"), h => h < col("th_u"))).as("h"))
    // difference sk_s ∖ union(others), below θ_d = min(θ_s, θ_u)
    val base = sk
      .select(col("source"), col("theta").as("th_s"),
        col("retained"), size(col("retained")).as("na"))
      .join(uth, Seq("source"))
      .withColumn("th_d", least(col("th_s"), col("th_u")))
    val novel = base
      .select(col("source"), col("th_d"), explode(col("retained")).as("h"))
      .filter(col("h") < col("th_d"))
      .join(uret, Seq("source", "h"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).as("nn"))
    base.join(novel, Seq("source"), "left")
      .select(col("source"),
        kmvEst(col("na"), col("th_s")).as("n_est"),
        kmvEst(coalesce(col("nn"), lit(0L)), col("th_d"))
          .as("n_novel_est"))
      .withColumn("novelty_rate",
        round(col("n_novel_est").cast("double") / col("n_est"), 4))
      .orderBy(col("source"))
  }

  /** DuckDB replay of [[kmvSourceSketches]]: distinct md5 shingle
    * hashes per source (q55's `hs` spelling), ranked ascending;
    * θ = the value at rank k+1 (hash-space bound if absent), `ret` =
    * the values below θ. Shared by the q115 and q116 oracles.
    */
  private def kmvSketchCtes(k: Int): String =
    s"""tk AS (
          SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS tk
          FROM documents),
        hs0 AS (
          SELECT source, unnest(list_distinct(list_transform(
            CASE WHEN len(tk) >= 3
              THEN list_transform(range(1, len(tk) - 1),
                i -> array_to_string(tk[i:i+2], ' '))
              ELSE [] END,
            g -> ('0x' || substr(md5(g), 1, 8))::BIGINT % 2147483647))) AS h
          FROM tk),
        dh AS (SELECT DISTINCT source, h FROM hs0),
        rk AS (
          SELECT source, h,
            ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS r
          FROM dh),
        th AS (
          SELECT source,
            COALESCE(MAX(CASE WHEN r = ${k + 1} THEN h END), $KmvHashSpace)
              AS theta
          FROM rk GROUP BY 1),
        ret AS (
          SELECT rk.source, rk.h FROM rk JOIN th USING (source)
          WHERE rk.h < th.theta)"""
}
