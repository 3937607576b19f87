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

  lazy val queries: Seq[Q] = Seq(


    // -- sketch-based heavy hitters: corpus token frequencies WITHOUT
    //    the (token, count) shuffle. One count-min sketch aggregate —
    //    each task folds its tokens into a fixed 2000×5 counter grid,
    //    partials merge associatively, and the driver holds the result
    //    as model state (same posture as the IVF codebook). Candidate
    //    tokens come from a 5% deterministic doc sample; the sketch
    //    scores them. vs exact q67: this trades the full-token shuffle
    //    (which q67 keeps map-combined anyway) for a CONSTANT-size
    //    mergeable summary — the shape that composes with streaming
    //    and repeated probing at 100 TB. CMS contract (est >= true,
    //    est <= true + eps·N w.p. 0.99) is asserted in SketchSpec.
    Q("q72_token_cms",
      (s, d) => {
        val docs = t(s, d).documents
        val toks = docs.select(explode(Text.tokens(col("text"))).as("token"))
        val bytes = toks
          .agg(expr("count_min_sketch(token, 0.001d, 0.99d, 42)").as("cms"))
          .head().getAs[Array[Byte]](0)
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bytes))
        val cands = docs.filter(col("doc_id") % 20 === 0)
          .select(explode(Text.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token")).limit(40)
          .select(col("token")).collect().map(_.getString(0)).toSeq
        import s.implicits._
        cands.map(tok => (tok, cms.estimateCount(tok)))
          .toDF("token", "est_n")
          .orderBy(col("est_n").desc, col("token"))
          .limit(20)
      },
      None,
      "count-min-sketch heavy hitters (contract + recall in SketchSpec)"),

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

    // -- ESTIMATED cross-source overlap via Theta sketches: q113's
    //    exact Jaccard matrix needs the full distinct-shingle
    //    relation through a self-join; the Theta sketch (the
    //    mergeable K-minimum-values family that, unlike HLL,
    //    supports INTERSECTION and DIFFERENCE) answers the same
    //    question from one bounded-state aggregate — per-source
    //    state is ≤4096 retained hashes regardless of corpus size,
    //    partials merge map-side, and the pair matrix is a
    //    broadcast of the source-cardinality sketch table. The
    //    sketch is order-insensitive (retained set = K smallest
    //    hashes), so results are deterministic — golden-pinned, and
    //    SketchSpec bounds the estimates against q113's exact
    //    values. No DuckDB theta → rows-only driver check.
    Q("q115_theta_source_overlap",
      (s, d) => {
        val sh = t(s, d).documents
          .select(col("source"), explode(array_distinct(
            Text.shingles(col("text"), 3))).as("sh"))
        val sk = sh.groupBy(col("source"))
          .agg(call_function("theta_sketch_agg", col("sh")).as("sk"))
        val a = sk.select(col("source").as("src_a"), col("sk").as("sk_a"))
        val b = sk.select(col("source").as("src_b"), col("sk").as("sk_b"))
        a.crossJoin(broadcast(b))
          .filter(col("src_a") < col("src_b"))
          .select(col("src_a"), col("src_b"),
            call_function("theta_sketch_estimate",
              call_function("theta_intersection", col("sk_a"), col("sk_b")))
              .as("n_common_est"),
            call_function("theta_sketch_estimate", col("sk_a")).as("n_a_est"),
            call_function("theta_sketch_estimate", col("sk_b")).as("n_b_est"),
            call_function("theta_sketch_estimate",
              call_function("theta_union", col("sk_a"), col("sk_b")))
              .as("n_union_est"))
          .withColumn("jaccard_est",
            round(col("n_common_est").cast("double") / col("n_union_est"), 4))
          .orderBy(col("src_a"), col("src_b"))
      },
      None,
      "estimated cross-source shingle overlap via theta sketch set ops"),

    // -- per-source content NOVELTY: how much of a source's distinct
    //    shingle set appears in NO other source — the acquisition
    //    metric ("does buying this corpus add anything?"). Exact
    //    form needs shingle×source co-occurrence; the theta form is
    //    difference(sk_s, union of every other source's sketch),
    //    with the union-of-others built from the same bounded
    //    per-source sketches (source-cardinality broadcast pair
    //    frame, theta_union_agg rollup — never a second corpus
    //    scan). Deterministic → golden-pinned; SketchSpec bounds
    //    novelty_rate against the exact co-occurrence answer.
    //
    //    Sketch sizing: the DIFFERENCE estimate's error is driven by
    //    the union-of-others sketch, which holds ~|sources|× a
    //    single source's cardinality — at the default lgK 12 (4096
    //    retained) that union is deep in sampling and the novelty
    //    rate drifted 0.07 off exact on the fixture. lgK 14 (16384
    //    retained, 128 KB per source — trivial state at
    //    source-cardinality groups) keeps the rate within 0.05 at
    //    any corpus size; precision is a knob, not a rewrite.
    Q("q116_theta_novelty",
      (s, d) => {
        val sh = t(s, d).documents
          .select(col("source"), explode(array_distinct(
            Text.shingles(col("text"), 3))).as("sh"))
        val sk = sh.groupBy(col("source"))
          .agg(call_function("theta_sketch_agg", col("sh"), lit(14)).as("sk"))
          .persist() // feeds both sides of the pair frame + the join back
        sk.count()
        val a = sk.select(col("source").as("src"), col("sk").as("sk_s"))
        val others = a.crossJoin(broadcast(
            sk.select(col("source").as("other"), col("sk").as("sk_o"))))
          .filter(col("src") =!= col("other"))
          .groupBy(col("src"))
          // the union agg trims to ITS OWN lgK (default 12) whatever
          // the input sketches hold — size it to match
          .agg(call_function("theta_union_agg", col("sk_o"), lit(14))
            .as("sk_others"))
        a.join(others, Seq("src"))
          .select(col("src").as("source"),
            call_function("theta_sketch_estimate", col("sk_s")).as("n_est"),
            call_function("theta_sketch_estimate",
              call_function("theta_difference", col("sk_s"), col("sk_others")))
              .as("n_novel_est"))
          .withColumn("novelty_rate",
            round(col("n_novel_est").cast("double") / col("n_est"), 4))
          .orderBy(col("source"))
      },
      None,
      "per-source novel-content estimate via theta difference"),

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
}
