package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QU._
import graft.functions.Text
import graft.operators.PrefixSum

/** Training-data pipeline operators beyond the core text battery
  * (SURVEY §2.9 extension surface): context-window sequence packing,
  * PII redaction, corpus-statistics (Zipf fit, char entropy), and
  * mixture-weight computation for multi-source training mixes.
  *
  * Scale posture: packing uses the distributed two-level prefix sum
  * (`operators/PrefixSum`) so no full-corpus single-partition window
  * exists anywhere; redaction/entropy are map-side projections or
  * alphabet-bounded aggregates; Zipf and mixture stats reduce to
  * vocabulary- or source-cardinality frames before any ordering.
  * Determinism: ratios are int/int double divisions (bit-identical
  * cross-engine); libm-dependent outputs (ln) are rounded before
  * compare, the q74 convention.
  */
object TrainingOps {

  /** Context-window size for q83's packing. */
  val PackWindow = 2048L

  /** Block size for the distributed prefix sum: one block per
    * ~4k docs keeps the block-total frame tiny at every fixture sf
    * while exercising multi-block merging (sf0.01 has >1 block).
    */
  val PackBlock = 128L

  /** Token-window width for q90's duplicated-span coverage. 8 tokens
    * over the fixtures' ~30-word vocabulary makes accidental repeats
    * rare (30⁻⁸ per pair) while the corpus's near-dup clusters still
    * share thousands of genuine 8-grams — coverage is informative,
    * not saturated.
    */
  val SpanWindow = 8

  /** Redaction patterns in the Java∩RE2 common regex subset (no
    * lookaround, no backreferences) so Spark and DuckDB agree.
    */
  val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePat = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val IpPat = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  /** Deterministic synthetic contact line per doc: the fixtures carry
    * no real PII, so q84 appends one (email + phone + IPv4 derived
    * from doc_id) and the redactor must remove all of it.
    */
  def withSyntheticPii(text: org.apache.spark.sql.Column,
      docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      text,
      lit(" contact user"), docId.cast("string"),
      lit("@mail"), (docId % 7).cast("string"),
      lit(".example.com call +1-555-"),
      lpad((docId % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (docId % 256).cast("string"),
      lit("."), (docId.cast("long") / 256).cast("long").%(256).cast("string"),
      lit(".77"))

  /** The redaction operator: email → [EMAIL], phone → [PHONE],
    * IPv4 → [IP], in that order (emails contain dotted hosts that the
    * IP pattern must never see first).
    */
  def redactPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPat, "[EMAIL]"),
        PhonePat, "[PHONE]"),
      IpPat, "[IP]")

  lazy val queries: Seq[Q] = Seq(

    // -- q83: concat-and-chunk sequence packing (the GPT-style
    //    pretraining shape: concatenate docs in deterministic order,
    //    split into fixed token windows). Each doc's global start
    //    offset comes from the distributed exclusive prefix sum —
    //    NOT a global ORDER BY window, which would be a one-task scan
    //    at scale. pack_id = window index where the doc starts;
    //    straddles flags docs crossing a window boundary (what a
    //    loader would split across samples).
    Q("q83_sequence_pack",
      (s, d) => {
        val docs = t(s, d).documents.select(
          col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
        PrefixSum.exclusive(docs, col("doc_id"), col("n_tokens"),
            PackBlock, "start_tok")
          .select(
            col("doc_id"),
            col("n_tokens"),
            col("start_tok"),
            expr(s"start_tok div $PackWindow").as("pack_id"),
            (col("start_tok") % PackWindow).as("offset_in_pack"),
            (expr(s"(start_tok + n_tokens - 1) div $PackWindow") >
              expr(s"start_tok div $PackWindow")).cast("int").as("straddles"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (
          SELECT doc_id,
            CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
              AS n_tokens
          FROM documents),
        c AS (
          SELECT doc_id, n_tokens,
            CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_tok
          FROM d)
        SELECT doc_id, n_tokens, start_tok,
          CAST(start_tok // $PackWindow AS BIGINT) AS pack_id,
          CAST(start_tok % $PackWindow AS BIGINT) AS offset_in_pack,
          CAST((start_tok + n_tokens - 1) // $PackWindow
            > start_tok // $PackWindow AS INT) AS straddles
        FROM c ORDER BY doc_id"""),
      "context-window sequence packing via distributed prefix sum"),

    // -- q84: PII redaction. The fixtures are synthetic word streams
    //    with no real PII, so the query first APPENDS a deterministic
    //    contact line derived from doc_id (email + E.164-ish phone +
    //    IPv4) and then redacts it — the redaction regexes are the
    //    operator under test, and every doc exercises all three.
    //    Patterns stay in the Java∩RE2 common subset (no lookaround,
    //    no backreferences) so Spark and DuckDB agree byte-for-byte.
    Q("q84_pii_redaction",
      (s, d) => {
        val contact = withSyntheticPii(col("text"), col("doc_id"))
        val redacted = redactPii(contact)
        t(s, d).documents.select(
            col("doc_id"),
            regexp_count(contact, lit(EmailPat)).cast("int").as("n_emails"),
            regexp_count(contact, lit(PhonePat)).cast("int").as("n_phones"),
            regexp_count(
              regexp_replace(contact, EmailPat, "[EMAIL]"), lit(IpPat))
              .cast("int").as("n_ips"),
            length(redacted).as("redacted_len"),
            sha2(redacted, 256).as("redacted_sha"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH aug AS (
          SELECT doc_id,
            text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail' || CAST(doc_id % 7 AS VARCHAR)
              || '.example.com call +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST(doc_id // 256 % 256 AS VARCHAR)
              || '.77' AS contact
          FROM documents),
        r AS (
          SELECT doc_id, contact,
            regexp_replace(contact,
              '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g')
              AS no_email
          FROM aug),
        r2 AS (
          SELECT doc_id, contact, no_email,
            regexp_replace(regexp_replace(no_email,
              '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
              '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '[IP]', 'g') AS redacted
          FROM r)
        SELECT doc_id,
          CAST(len(regexp_extract_all(contact,
            '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
          CAST(len(regexp_extract_all(contact,
            '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
          CAST(len(regexp_extract_all(no_email,
            '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) AS INT) AS n_ips,
          CAST(length(redacted) AS INT) AS redacted_len,
          sha256(redacted) AS redacted_sha
        FROM r2 ORDER BY doc_id"""),
      "regex PII redaction (email/phone/IP) with match counts"),

    // -- q85: Zipf's-law fit over the corpus vocabulary: token
    //    frequencies → deterministic top-100 ranks → OLS slope of
    //    ln(freq) on ln(rank). The group-by is vocabulary-bounded and
    //    map-side combinable; ranking happens after the top-K cut so
    //    the window never sees corpus-cardinality data (q79's rule).
    //    Slope rounded to 4dp: regr_slope accumulates doubles in
    //    partition order, so low bits are engine-specific (q74's
    //    round-before-compare convention).
    Q("q85_zipf_slope",
      (s, d) => {
        val freq = t(s, d).documents
          .select(explode(Text.tokens(col("text"))).as("tok"))
          .filter(length(col("tok")) > 0)
          .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("tok")).limit(100)
        freq
          .withColumn("rank",
            row_number().over(Window.orderBy(col("freq").desc, col("tok"))))
          .agg(
            count(lit(1)).cast("long").as("n_ranks"),
            round(regr_slope(log(col("freq")), log(col("rank"))), 4)
              .as("zipf_slope"))
      },
      Some("""WITH tok AS (
          SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
          FROM documents),
        freq AS (
          SELECT tok, COUNT(*) AS freq FROM tok WHERE length(tok) > 0
          GROUP BY tok ORDER BY freq DESC, tok LIMIT 100),
        ranked AS (
          SELECT freq,
            ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rank
          FROM freq)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
          ROUND(regr_slope(ln(freq), ln(rank)), 4) AS zipf_slope
        FROM ranked"""),
      "Zipf slope: OLS of ln(freq) on ln(rank) over top-100 vocab"),

    // -- q86: per-doc character-level Shannon entropy (a cheap
    //    gibberish/compression-quality signal). Char histogram via
    //    (doc_id, ch) group-by: partial aggregation collapses each
    //    partition to ≤|alphabet| rows per doc before the shuffle, so
    //    the shuffle carries ~alphabet×docs rows, not chars. Entropy
    //    as ln(N) − Σc·ln(c)/N avoids per-term division; 4dp round
    //    for cross-engine libm safety.
    Q("q86_char_entropy",
      (s, d) => {
        val chars = t(s, d).documents
          .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
          .filter(length(col("ch")) > 0)
        chars.groupBy(col("doc_id"), col("ch"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("doc_id"))
          .agg(
            sum(col("cnt")).as("n_chars_counted"),
            round(
              (log(sum(col("cnt")))
                - sum(col("cnt") * log(col("cnt"))) / sum(col("cnt")))
                / log(lit(2.0)), 4).as("entropy_bits"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH ch AS (
          SELECT doc_id, unnest(string_split(text, '')) AS ch
          FROM documents),
        cc AS (
          SELECT doc_id, ch, COUNT(*) AS cnt FROM ch
          WHERE length(ch) > 0 GROUP BY doc_id, ch)
        SELECT doc_id,
          CAST(SUM(cnt) AS BIGINT) AS n_chars_counted,
          ROUND((ln(SUM(cnt)) - SUM(cnt * ln(cnt)) / SUM(cnt)) / ln(2), 4)
            AS entropy_bits
        FROM cc GROUP BY doc_id ORDER BY doc_id"""),
      "per-doc character Shannon entropy"),

    // -- q88: per-source token budgeting: walk each source's docs in
    //    deterministic order and keep them until the source's token
    //    budget is spent (the "cap each domain at N tokens" step of
    //    mixture construction). The running total is a window
    //    PARTITIONED by source — Spark parallelizes across sources
    //    natively, and within a source the window is the per-key scan
    //    (for a single pathological mega-source, PrefixSum applies —
    //    q83's shape). Output is the per-source keep summary, so the
    //    result stays source-cardinality at any sf.
    Q("q88_token_budget",
      (s, d) => {
        val budget = 5000L
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d).documents
          .select(col("source"), col("doc_id"),
            size(Text.tokens(col("text"))).cast("long").as("nt"))
          .withColumn("running", sum(col("nt")).over(w))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("running") <= budget, 1).otherwise(0))
              .as("n_kept"),
            sum(when(col("running") <= budget, col("nt")).otherwise(0))
              .as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
          SELECT source, doc_id,
            CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
              AS nt
          FROM documents),
        r AS (
          SELECT source, nt,
            SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
          FROM d)
        SELECT source,
          COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN running <= 5000 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_kept,
          CAST(SUM(CASE WHEN running <= 5000 THEN nt ELSE 0 END) AS BIGINT)
            AS kept_tokens
        FROM r GROUP BY source ORDER BY source"""),
      "per-source token budget cut via partitioned running totals"),

    // -- q87: training-mix reweighting: per-source token counts vs a
    //    uniform target share → sampling weight per source. One
    //    source-cardinality aggregate + a 1-row broadcast (q80's
    //    pattern); every ratio is exact-int-into-double with an
    //    identical formula on both sides, so no rounding is needed
    //    except the documented 6dp on the weight.
    Q("q87_mix_weights",
      (s, d) => {
        val per = t(s, d).documents
          .select(col("source"),
            size(Text.tokens(col("text"))).cast("long").as("nt"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        val tot = per.agg(
          sum(col("n_tokens")).as("tot_tokens"),
          count(lit(1)).as("n_sources"))
        per.crossJoin(broadcast(tot))
          .select(
            col("source"),
            col("n_docs"),
            col("n_tokens"),
            (col("n_tokens").cast("double") / col("tot_tokens"))
              .as("token_share"),
            round(
              col("tot_tokens").cast("double")
                / (col("n_sources") * col("n_tokens")), 6).as("mix_weight"))
          .orderBy(col("source"))
      },
      Some("""WITH per AS (
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(CAST(len(string_split_regex(lower(trim(text)), '\s+'))
              AS BIGINT)) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        tot AS (
          SELECT SUM(n_tokens) AS tot_tokens, COUNT(*) AS n_sources
          FROM per)
        SELECT source, n_docs, n_tokens,
          CAST(n_tokens AS DOUBLE) / tot_tokens AS token_share,
          ROUND(CAST(tot_tokens AS DOUBLE) / (n_sources * n_tokens), 6)
            AS mix_weight
        FROM per, tot ORDER BY source"""),
      "uniform-target mixture weights per source"),

    // -- q90: duplicated-SPAN coverage (Lee et al.-style substring
    //    dedup signal): every [[SpanWindow]]-token rolling window is
    //    keyed; windows whose key occurs anywhere else in the corpus
    //    (same doc or another) are "duplicated spans", and the per-doc
    //    output is the fraction of token positions covered by the
    //    UNION of its duplicated spans — the quantity a span-level
    //    dedup pass would cut. Spark keys windows by xxhash64 of the
    //    window string (16 bytes/row through the shuffle instead of
    //    the ~50-byte string; injective w.h.p. — the q54 argument),
    //    while the oracle groups the strings themselves: identical
    //    results barring a ~1e-12 collision. Coverage is the classic
    //    sorted-interval union: running max of span end over the
    //    per-doc position order, each span contributing its extension
    //    beyond that max. Scale: one corpus-keyed groupBy (partial
    //    map-side count), one id-keyed join back, one per-doc window
    //    — no pair join anywhere, so a 20k-copy cluster costs 20k
    //    rows, not 2×10⁸ pairs.
    Q("q90_span_coverage",
      (s, d) => spanCoverageOn(t(s, d).documents),
      Some(SpanCoverageSql),
      "duplicated 8-token-span coverage per document (substring dedup signal)"),

    // -- q99: q90's SCALE path — identical semantics (and the
    //    IDENTICAL oracle: the count-min prefilter can only shrink
    //    the shuffle, never change the answer — see
    //    [[spanCoverageOn]]), with the executor-side `cms_at_least`
    //    probe pruning singleton windows before the duplicate
    //    groupBy. At sf0.1 this RECORDS SLOWER than q90 (~3.9s vs
    //    ~1.9s): the sketch build is an extra full pass and the
    //    shuffle it prunes is a few MB — the q63-vs-q60 arithmetic
    //    again. The trade inverts when the all-windows shuffle is
    //    the bottleneck (at 100 TB, ~tokens×16 bytes vs the few
    //    percent that might repeat).
    Q("q99_span_coverage_cms",
      (s, d) => spanCoverageOn(t(s, d).documents, cmsPrefilter = true),
      Some(SpanCoverageSql),
      "span coverage with count-min singleton prefilter (q90's scale path)"),

    // -- q167: repeated-span REMOVAL — the dedup ACTION q90 only
    //    signals (Lee et al.'s substring dedup: drop every duplicated
    //    span except its corpus-FIRST occurrence). Each duplicated
    //    window key elects one keeper — the lexicographically least
    //    (doc_id, position) occurrence — and a token position is
    //    removed iff a NON-keeper duplicated span covers it, so the
    //    first carrier of any repeated passage keeps it and every
    //    later copy is cut. Per doc: removed/kept token counts from
    //    the sorted-interval union of its non-keeper spans (q90's
    //    running-max machinery), the number of contiguous CUT RUNS
    //    (adjacent/overlapping spans merge — the count of splice
    //    points a cleaner would emit), and the first cut position —
    //    positional structure on the hash surface, not just counts.
    //    Same engine-vs-oracle discipline as q90: Spark keys windows
    //    by the xxhash64 kernel, the oracle groups the window strings
    //    (identical barring a ~1e-12 collision); keeper election is a
    //    groupBy min-struct in Spark and a ROW_NUMBER in SQL — the
    //    same (doc_id, p) total order. Scale shape: one window-keyed
    //    groupBy (map-side partial), one keyed join back, one per-doc
    //    window — no pair stage anywhere, so a 20k-copy passage costs
    //    20k rows.
    Q("q167_span_removal",
      (s, d) => spanRemovalOn(t(s, d).documents),
      Some(SpanRemovalSql),
      "substring dedup action: cut every duplicated 8-token span " +
        "except its corpus-first occurrence; per-doc cut geometry"),

    // -- q91: unigram cross-entropy scoring (the CCNet-style corpus-
    //    model perplexity signal: docs whose token distribution is
    //    far from the corpus unigram model score high). Three stages:
    //    vocabulary-cardinality frequency table, a 1-row total, and
    //    a token-keyed join back over the exploded corpus. Per-token
    //    -ln p is rounded at 6dp (the q74 libm convention), summed in
    //    DECIMAL(38,10) so partial-aggregation order can't wiggle low
    //    bits, then normalized per doc. Scale: the freq join is a
    //    plain token-keyed equi-join (broadcastable when the
    //    vocabulary is small; AQE handles the hot-token skew that a
    //    natural-language corpus would have).
    Q("q91_unigram_xent",
      (s, d) => {
        val tok = t(s, d).documents.select(col("doc_id"),
          explode(Text.tokens(col("text"))).as("token"))
        val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        // corpus token total == sum of per-doc sizes: a map-side
        // 1-row aggregate, NOT a second pass over the vocabulary
        // groupBy (plan audit: sum-over-freq re-aggregated the whole
        // corpus a second time)
        val tot = t(s, d).documents
          .agg(sum(size(Text.tokens(col("text")))).cast("long").as("tot"))
        tok.join(freq, Seq("token"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"),
            round(log(col("tot").cast("double") / col("cnt")), 6).as("nll"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            round(sum(col("nll").cast("decimal(38,10)")).cast("double")
              / count(lit(1)), 4).as("xent_nats"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents),
        freq AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
        tot AS (
          SELECT SUM(len(string_split_regex(lower(trim(text)), '\s+')))
            AS tot
          FROM documents),
        nl AS (
          SELECT doc_id, ROUND(LN(CAST(tot AS DOUBLE) / cnt), 6) AS nll
          FROM tok JOIN freq USING (token), tot)
        SELECT doc_id, COUNT(*) AS n_tokens,
          ROUND(CAST(SUM(CAST(nll AS DECIMAL(38,10))) AS DOUBLE)
            / COUNT(*), 4) AS xent_nats
        FROM nl GROUP BY doc_id ORDER BY doc_id"""),
      "per-doc unigram cross-entropy vs the corpus model"),

    // -- q94: deterministic TRAINING ORDER — the shuffle-and-
    //    interleave step that fixes what a loader reads when: docs
    //    are pseudo-shuffled by the q75 md5 key (repartition-stable,
    //    no rand(seed) whose draw order depends on task layout), then
    //    round-robin interleaved across sources so round r holds one
    //    doc per source — consecutive samples never share a source,
    //    the mixing property curriculum loaders want. Per-source
    //    row_number is a PARTITIONED window (parallel across
    //    sources); the only global operation is the bounded
    //    sort+limit prefix, which Spark plans as TakeOrdered — no
    //    full-corpus single-partition sort at any sf.
    Q("q94_training_order",
      (s, d) => {
        val sk = md5(col("doc_id").cast("string"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("sk"), col("doc_id"))
        t(s, d).documents
          .select(col("doc_id"), col("source"), sk.as("sk"))
          .withColumn("round", row_number().over(w))
          .orderBy(col("round"), col("source"), col("doc_id"))
          .limit(200)
      },
      Some("""WITH r AS (
          SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS sk,
            CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
              AS round
          FROM documents)
        SELECT doc_id, source, sk, round
        FROM r ORDER BY round, source, doc_id LIMIT 200"""),
      "deterministic md5-shuffled round-robin training order prefix"),

    // -- q95: per-source KL divergence from the corpus unigram
    //    distribution — the domain-shift signal mixture tuning reads
    //    (a source whose token distribution diverges hard from the
    //    mix gets its weight revisited). ONE corpus scan builds the
    //    (source, token) counts; the source totals, corpus token
    //    counts, and grand total are all rollups of that aggregate,
    //    never a re-scan (the q91 lesson). The pair aggregate is
    //    persisted AND eagerly materialized: Spark shares no plan
    //    subtree across its four consumers, so the unpersisted form
    //    re-scans the corpus per consumer (measured: 12 parquet scans
    //    vs 1 — PlanShapeSpec pins the 1). Shuffles are bounded by
    //    |sources|×|vocab|. Determinism: probability ratios are
    //    exact-int double divisions, ln is rounded at 6dp, each term
    //    at 9dp, and the per-source sum accumulates in
    //    DECIMAL(38,12) — order- and engine-stable throughout.
    Q("q95_source_kl",
      (s, d) => {
        val cst = t(s, d).documents
          .select(col("source"), explode(Text.tokens(col("text"))).as("token"))
          .groupBy(col("source"), col("token"))
          .agg(count(lit(1)).as("c_st"))
          .persist()
        cst.count() // materialize before the racing consumers
        val ns = cst.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
        val ct = cst.groupBy(col("token")).agg(sum(col("c_st")).as("c_t"))
        val n = ns.agg(sum(col("n_s")).as("n"))
        val term = round(
          (col("c_st").cast("double") / col("n_s")) *
            round(log((col("c_st").cast("double") * col("n")) /
              (col("n_s").cast("double") * col("c_t"))), 6), 9)
        cst.join(broadcast(ns), Seq("source"))
          .join(ct, Seq("token"))
          .crossJoin(broadcast(n))
          .select(col("source"), col("n_s"), term.as("term"))
          .groupBy(col("source"))
          .agg(min(col("n_s")).as("n_tokens"),
            round(sum(col("term").cast("decimal(38,12)")).cast("double"), 6)
              .as("kl_nats"))
          .orderBy(col("source"))
      },
      Some("""WITH tok AS (
          SELECT source,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents),
        cst AS (
          SELECT source, token, COUNT(*) AS c_st FROM tok GROUP BY 1, 2),
        ns AS (SELECT source, SUM(c_st) AS n_s FROM cst GROUP BY source),
        ct AS (SELECT token, SUM(c_st) AS c_t FROM cst GROUP BY token),
        n AS (SELECT SUM(n_s) AS n FROM ns),
        terms AS (
          SELECT cst.source, ns.n_s,
            ROUND((CAST(c_st AS DOUBLE) / n_s) *
              ROUND(LN((CAST(c_st AS DOUBLE) * n.n) /
                (CAST(n_s AS DOUBLE) * c_t)), 6), 9) AS term
          FROM cst JOIN ns USING (source) JOIN ct USING (token), n)
        SELECT source, CAST(MIN(n_s) AS BIGINT) AS n_tokens,
          ROUND(CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6)
            AS kl_nats
        FROM terms GROUP BY source ORDER BY source"""),
      "per-source KL divergence from the corpus unigram model"),

    // -- q98: BIGRAM conditional cross-entropy — the n-gram LM
    //    perplexity filter one step past q91's unigram (CCNet runs a
    //    5-gram KenLM; the join shape is identical from bigrams up):
    //    per-doc mean −ln p(tᵢ | tᵢ₋₁) with add-1 smoothing over the
    //    corpus vocabulary. The exploded-bigram table is persisted
    //    (it feeds the per-token join AND the bigram-count model;
    //    unpersisted, each consumer re-runs the corpus scan + per-doc
    //    window — the q95 lesson), context counts are a ROLLUP of the
    //    bigram counts (Σ_w2 c12 ≡ the context count, no third pass),
    //    and vocab size rides the 1-row broadcast. Same determinism
    //    stack as q91: exact-int ratios, 6dp ln, decimal accumulation.
    Q("q98_bigram_xent",
      (s, d) => {
        val docs = t(s, d).documents
        val big = docs.select(col("doc_id"), posexplode(Text.tokens(col("text")))
            .as(Seq("p", "w2")))
          .withColumn("w1", lag(col("w2"), 1)
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("doc_id")).orderBy(col("p"))))
          .filter(col("w1").isNotNull)
          .persist()
        big.count() // materialize before the racing consumers
        val bc = big.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("c12"))
        val uc = bc.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
        val v = docs.select(explode(Text.tokens(col("text"))).as("w"))
          .agg(countDistinct(col("w")).as("v"))
        big.join(bc, Seq("w1", "w2"))
          .join(uc, Seq("w1"))
          .crossJoin(broadcast(v))
          .select(col("doc_id"),
            round(log((col("c1") + col("v")).cast("double")
              / (col("c12") + 1)), 6).as("nll"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            round(sum(col("nll").cast("decimal(38,10)")).cast("double")
              / count(lit(1)), 4).as("xent_nats"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
          SELECT doc_id, i AS p, tk[i] AS w2,
            CASE WHEN i > 1 THEN tk[i - 1] END AS w1
          FROM (SELECT doc_id,
                  string_split_regex(lower(trim(text)), '\s+') AS tk
                FROM documents) t,
            LATERAL unnest(range(1, len(tk) + 1)) AS r(i)),
        big AS (SELECT doc_id, w1, w2 FROM tok WHERE w1 IS NOT NULL),
        bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2),
        uc AS (SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY 1),
        v AS (
          SELECT COUNT(DISTINCT w) AS v FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents) t),
        nl AS (
          SELECT doc_id,
            ROUND(LN(CAST(c1 + v.v AS DOUBLE) / (c12 + 1)), 6) AS nll
          FROM big JOIN bc USING (w1, w2) JOIN uc USING (w1), v)
        SELECT doc_id, COUNT(*) AS n_bigrams,
          ROUND(CAST(SUM(CAST(nll AS DECIMAL(38,10))) AS DOUBLE)
            / COUNT(*), 4) AS xent_nats
        FROM nl GROUP BY doc_id ORDER BY doc_id"""),
      "per-doc add-1-smoothed bigram cross-entropy"),

    // -- q101: hashed-linear CLASSIFIER INFERENCE — the "apply a
    //    trained quality model to the whole corpus" step (fastText /
    //    DCLM-style bag-of-hashed-tokens): each token hashes to one
    //    of K weight buckets, the doc's score is the mean bucket
    //    weight, and the verdict thresholds the raw mean (folding the
    //    monotone sigmoid into the threshold keeps libm out of the
    //    decision entirely). Pure map-side projection + per-doc
    //    aggregate — the inference scan shape that tiles to any
    //    corpus size. The weights here are a synthetic but
    //    integer-exact function of the bucket index (identical in
    //    both engines, no 1024-literal table); production swaps in a
    //    broadcast weight array, same plan. Buckets use the q75
    //    md5-prefix idiom since the hash value feeds arithmetic,
    //    not just grouping, so Spark and DuckDB must agree on it.
    Q("q101_classifier_score",
      (s, d) => {
        val k = 1024L
        val tok = t(s, d).documents.select(col("doc_id"),
          explode(Text.tokens(col("text"))).as("token"))
        val bucket = pmod(
          conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long"), lit(k))
        val w = (bucket * 2654435761L % 1000003L).cast("double")
          ./(1000003.0).-(0.5)
        tok.select(col("doc_id"), w.as("w"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            round(sum(col("w").cast("decimal(38,12)")).cast("double")
              / count(lit(1)), 6).as("score"))
          .withColumn("keep", (col("score") > 0).cast("int"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents),
        scored AS (
          SELECT doc_id,
            CAST(('0x' || substr(md5(token), 1, 8))::BIGINT % 1024
              * 2654435761 % 1000003 AS DOUBLE) / 1000003.0 - 0.5 AS w
          FROM tok)
        SELECT doc_id, COUNT(*) AS n_tokens,
          ROUND(CAST(SUM(CAST(w AS DECIMAL(38,12))) AS DOUBLE)
            / COUNT(*), 6) AS score,
          CAST(ROUND(CAST(SUM(CAST(w AS DECIMAL(38,12))) AS DOUBLE)
            / COUNT(*), 6) > 0 AS INT) AS keep
        FROM scored GROUP BY doc_id ORDER BY doc_id"""),
      "hashed linear classifier inference (corpus-scale quality scoring)"),

    // -- q118: HEAPS'-LAW VOCABULARY GROWTH per source — V(N) ≈ K·N^β,
    //    the companion diagnostic to q85's Zipf slope: β near 1 means
    //    the source keeps minting new types (OCR noise, IDs, markup
    //    soup — tokenizer-hostile), β near 0 means template/boilerplate
    //    text whose vocabulary saturates (the synthetic fixture's
    //    ~31-word vocabulary pins β ≈ 0 — the oracle verifies the
    //    machinery, TrainingOpsSpec verifies real growth on a corpus
    //    that has some). Docs are split into 8 cumulative prefixes by
    //    integer rank arithmetic ((8·(r−1)) div n_docs — repartition-
    //    stable, both engines floor), and both curves come from ONE
    //    (source, token, bucket) aggregate: token totals roll up as a
    //    sum, vocabulary as first-occurrence-bucket counts (min-bucket
    //    per type, q95's one-scan rule). Every frame after the first
    //    groupBy is vocab- or source-cardinality; the OLS runs over 8
    //    points per source. ln/regr_slope are 4dp-rounded (q85's
    //    convention) and +0.0 normalizes the -0.0 a zero slope rounds
    //    to (IEEE negative zero hashes differently than 0.0).
    Q("q118_heaps_vocab_growth",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
        val ranked = t(s, d).documents
          .select(col("doc_id"), col("source"), Text.tokens(col("text")).as("toks"))
          .withColumn("r", row_number().over(
            w.partitionBy(col("source")).orderBy(col("doc_id"))))
          .withColumn("nd", count(lit(1)).over(w.partitionBy(col("source"))))
          .withColumn("b", expr("(8 * (r - 1)) div nd").cast("int"))
        val g = ranked
          .select(col("source"), col("b"), explode(col("toks")).as("tok"))
          .filter(length(col("tok")) > 0)
          .groupBy(col("source"), col("tok"), col("b"))
          .agg(count(lit(1)).as("c"))
        val tokCounts = g.groupBy(col("source"), col("b"))
          .agg(sum(col("c")).as("toks_in_b"))
        val newTypes = g.groupBy(col("source"), col("tok"))
          .agg(min(col("b")).as("fb"))
          .groupBy(col("source"), col("fb").as("b"))
          .agg(count(lit(1)).as("types_in_b"))
        val spine = ranked.select(col("source")).distinct()
          .crossJoin(broadcast(ranked.sparkSession.range(8)
            .select(col("id").cast("int").as("b"))))
        val wCum = w.partitionBy(col("source")).orderBy(col("b"))
        val cum = spine
          .join(tokCounts, Seq("source", "b"), "left")
          .join(newTypes, Seq("source", "b"), "left")
          .withColumn("n_cum", sum(coalesce(col("toks_in_b"), lit(0L))).over(wCum))
          .withColumn("v_cum", sum(coalesce(col("types_in_b"), lit(0L))).over(wCum))
          .filter(col("n_cum") > 0 && col("v_cum") > 0)
        cum.groupBy(col("source"))
          .agg(count(lit(1)).as("n_points"),
            (round(regr_slope(log(col("v_cum")), log(col("n_cum"))), 4) + 0.0)
              .as("heaps_beta"),
            (round(exp(regr_intercept(log(col("v_cum")), log(col("n_cum")))), 4)
              + 0.0).as("heaps_k"))
          .orderBy(col("source"))
      },
      Some("""WITH ranked AS (
          SELECT doc_id, source,
            string_split_regex(lower(trim(text)), '\s+') AS toks,
            ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS r,
            COUNT(*) OVER (PARTITION BY source) AS nd
          FROM documents),
        bucketed AS (
          SELECT source, (8 * (r - 1)) // nd AS b, toks FROM ranked),
        g AS (
          SELECT source, tok, b, COUNT(*) AS c FROM (
            SELECT source, b, UNNEST(toks) AS tok FROM bucketed) t
          WHERE length(tok) > 0 GROUP BY 1, 2, 3),
        tok_counts AS (
          SELECT source, b, CAST(SUM(c) AS BIGINT) AS toks_in_b
          FROM g GROUP BY 1, 2),
        new_types AS (
          SELECT source, fb AS b, CAST(COUNT(*) AS BIGINT) AS types_in_b
          FROM (SELECT source, tok, MIN(b) AS fb FROM g GROUP BY 1, 2) f
          GROUP BY 1, 2),
        spine AS (
          SELECT source, b FROM (SELECT DISTINCT source FROM ranked) s
          CROSS JOIN (SELECT UNNEST([0,1,2,3,4,5,6,7]) AS b) q),
        cum AS (
          SELECT s.source, s.b,
            CAST(SUM(COALESCE(tc.toks_in_b, 0)) OVER
              (PARTITION BY s.source ORDER BY s.b) AS BIGINT) AS n_cum,
            CAST(SUM(COALESCE(nt.types_in_b, 0)) OVER
              (PARTITION BY s.source ORDER BY s.b) AS BIGINT) AS v_cum
          FROM spine s
          LEFT JOIN tok_counts tc ON s.source = tc.source AND s.b = tc.b
          LEFT JOIN new_types nt ON s.source = nt.source AND s.b = nt.b)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_points,
          ROUND(regr_slope(ln(v_cum), ln(n_cum)), 4) + 0.0 AS heaps_beta,
          ROUND(EXP(regr_intercept(ln(v_cum), ln(n_cum))), 4) + 0.0 AS heaps_k
        FROM cum WHERE n_cum > 0 AND v_cum > 0
        GROUP BY source ORDER BY source"""),
      "Heaps'-law vocabulary growth fit per source (8-prefix OLS)")
  )

  /** Shared oracle for q90 and q99 (same answer by construction).
    * Lazy: referenced from `queries`, which initializes earlier in
    * the object body.
    */
  private lazy val SpanCoverageSql = """WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents),
        d AS (SELECT doc_id, tk, len(tk) AS n FROM toks),
        w AS (
          SELECT doc_id, i AS p, array_to_string(tk[i:i+7], ' ') AS win
          FROM d, LATERAL unnest(range(1, n - 6)) AS r(i)
          WHERE n >= 8),
        dup AS (SELECT win FROM w GROUP BY win HAVING COUNT(*) > 1),
        dw AS (SELECT w.doc_id, w.p FROM w JOIN dup USING (win)),
        iv AS (
          SELECT doc_id, p,
            GREATEST(0, (p + 7) - GREATEST(COALESCE(MAX(p + 7) OVER (
              PARTITION BY doc_id ORDER BY p
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
              p - 1)) AS contrib
          FROM dw),
        agg AS (
          SELECT doc_id, COUNT(*) AS dup_spans, SUM(contrib) AS covered
          FROM iv GROUP BY doc_id)
        SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_tokens,
          CAST(COALESCE(agg.dup_spans, 0) AS BIGINT) AS dup_spans,
          CAST(COALESCE(agg.covered, 0) AS BIGINT) AS covered_tokens,
          CAST(COALESCE(agg.covered, 0) AS DOUBLE) / d.n AS coverage
        FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""

  /** Shared oracle for q167: q90's window CTEs, keeper election by
    * ROW_NUMBER over (doc_id, p) per duplicated window string, and
    * the interval union restricted to non-keeper spans, with run
    * starts counted where a span begins past prev_end + 1 (adjacent
    * positions are one contiguous cut).
    */
  private lazy val SpanRemovalSql = """WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents),
        d AS (SELECT doc_id, tk, len(tk) AS n FROM toks),
        w AS (
          SELECT doc_id, i AS p, array_to_string(tk[i:i+7], ' ') AS win
          FROM d, LATERAL unnest(range(1, n - 6)) AS r(i)
          WHERE n >= 8),
        k AS (
          SELECT doc_id, p,
            ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, p) AS rk,
            COUNT(*) OVER (PARTITION BY win) AS c
          FROM w),
        rw AS (SELECT doc_id, p FROM k WHERE c > 1 AND rk > 1),
        iv AS (
          SELECT doc_id, p,
            GREATEST(0, (p + 7) - GREATEST(COALESCE(prev_end, 0), p - 1))
              AS contrib,
            CASE WHEN prev_end IS NULL OR p > prev_end + 1
              THEN 1 ELSE 0 END AS newrun
          FROM (
            SELECT doc_id, p, MAX(p + 7) OVER (
              PARTITION BY doc_id ORDER BY p
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
            FROM rw) t),
        agg AS (
          SELECT doc_id, SUM(contrib) AS removed, SUM(newrun) AS runs,
            MIN(p) AS first_cut
          FROM iv GROUP BY doc_id)
        SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_tokens,
          CAST(COALESCE(agg.removed, 0) AS BIGINT) AS removed_tokens,
          CAST(d.n - COALESCE(agg.removed, 0) AS BIGINT) AS kept_tokens,
          CAST(d.n - COALESCE(agg.removed, 0) AS DOUBLE) / d.n AS keep_frac,
          CAST(COALESCE(agg.runs, 0) AS BIGINT) AS cut_runs,
          CAST(agg.first_cut AS BIGINT) AS first_cut
        FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""

  /** q167's operator body: q90's window relation, keeper election
    * per duplicated key (min (doc_id, p) struct — the corpus-first
    * occurrence), interval union + run count over the non-keeper
    * spans only.
    */
  def spanRemovalOn(docs: org.apache.spark.sql.DataFrame,
                    w: Int = SpanWindow): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("n"))
    val wins = docs
      .select(col("doc_id"),
        posexplode(Text.positionalShingleHashes(col("text"), w)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("h"))
    // keeper election: one window-keyed aggregate (map-side partial;
    // min over a (doc_id, p) struct is the same lexicographic total
    // order the oracle's ROW_NUMBER uses)
    val keepers = wins.groupBy(col("h"))
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("p"))).as("kp"))
      .filter(col("c") > 1)
      .select(col("h"), col("kp.doc_id").as("k_doc"), col("kp.p").as("k_p"))
    val removedSpans = wins.join(keepers, Seq("h"))
      .filter(!(col("doc_id") === col("k_doc") && col("p") === col("k_p")))
      .select(col("doc_id"), col("p"))
    val wnd = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = removedSpans
      .withColumn("prev_end", max(col("p") + (w - 1)).over(wnd))
      .withColumn("contrib", greatest(lit(0L),
        (col("p") + (w - 1)) -
          greatest(coalesce(col("prev_end"), lit(0L)), col("p") - 1)))
      .withColumn("newrun",
        when(col("prev_end").isNull || col("p") > col("prev_end") + 1, 1L)
          .otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("removed"),
        sum(col("newrun")).as("runs"),
        min(col("p")).as("first_cut"))
    toks.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").as("n_tokens"),
        coalesce(col("removed"), lit(0L)).as("removed_tokens"),
        (col("n") - coalesce(col("removed"), lit(0L))).as("kept_tokens"),
        ((col("n") - coalesce(col("removed"), lit(0L))).cast("double")
          / col("n")).as("keep_frac"),
        coalesce(col("runs"), lit(0L)).as("cut_runs"),
        col("first_cut"))
      .orderBy(col("doc_id"))
  }

  /** q90's operator body over any (doc_id, text) frame — extracted so
    * the property spec can run it on generated corpora.
    *
    * `cmsPrefilter` engages the SCALE path (q99): a count-min sketch
    * over the window hashes is built first (map-side mergeable, one
    * small driver collect — IVF-codebook posture), and only windows
    * whose estimate is ≥ 2 enter the duplicate groupBy. Count-min
    * only over-counts, so every truly-duplicated window survives the
    * filter and the exact groupBy after it removes the false
    * positives — the output is IDENTICAL to the exact path (q99
    * carries q90's oracle verbatim) while the shuffle shrinks from
    * all windows to candidates. On a mostly-unique 100 TB corpus
    * that is the difference between shuffling every token window and
    * shuffling the few percent that might repeat.
    */
  def spanCoverageOn(docs: org.apache.spark.sql.DataFrame,
                     w: Int = SpanWindow,
                     cmsPrefilter: Boolean = false): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"),
        size(col("tk")).cast("long").as("n"))
    // per-position window hashes via the native kernel (bit-identical
    // to the interpreted transform-over-sequence formulation it
    // replaced; parity spec-pinned in TrainingOpsSpec)
    val wins = docs
      .select(col("doc_id"),
        posexplode(Text.positionalShingleHashes(col("text"), w)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("h"))
    val dupInput =
      if (!cmsPrefilter) wins
      else {
        // eps 1e-5 keeps the additive over-count (~eps·N) well under
        // the ≥2 threshold at every fixture sf; ~1.4 MB sketch
        val bytes = wins
          .agg(expr("count_min_sketch(h, CAST(0.00001 AS DOUBLE), " +
            "CAST(0.99 AS DOUBLE), 42)").as("cms"))
          .head().getAs[Array[Byte]](0)
        import org.apache.spark.sql.graftbridge.ColumnBridge
        wins.filter(ColumnBridge.column(graft.expressions.CmsAtLeast(
          ColumnBridge.expression(col("h")), bytes, 2L)))
      }
    val dup = dupInput.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("h"))
    val wnd = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = wins.join(dup, Seq("h"))
      .withColumn("prev_end", max(col("p") + (w - 1)).over(wnd))
      .withColumn("contrib", greatest(lit(0L),
        (col("p") + (w - 1)) -
          greatest(coalesce(col("prev_end"), lit(0L)), col("p") - 1)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_spans"),
        sum(col("contrib")).as("covered"))
    toks.select(col("doc_id"), col("n").as("n_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        coalesce(col("covered"), lit(0L)).as("covered_tokens"),
        (coalesce(col("covered"), lit(0L)).cast("double")
          / col("n_tokens")).as("coverage"))
      .orderBy(col("doc_id"))
  }
}
