package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import QU._
import graft.functions.Text

/** Within-document quality / repetition signals and content-defined
  * chunking — the Gopher/C4-style filter battery that sits in front
  * of every LLM training-data pipeline, downstream of the corpus
  * sources the reference's ETL models (`etl_supabase.py:117-119`)
  * and upstream of the dedup stages (q50/q54/q90).
  *
  * Everything here is deliberately MAP-SIDE: the repetition counts
  * and chunk boundaries are higher-order-function folds over each
  * row's own token array, so no shuffle touches token-cardinality
  * data — the only exchanges are the final doc- or chunk-keyed
  * aggregates. Per-doc work is O(len · distinct) for the mode
  * counts; documents are context-window-bounded in this pipeline,
  * and a megadoc corpus would swap the HOF mode count for the
  * posexplode + groupBy((doc, token)) shape (same result, token-
  * cardinality shuffle) — the oracle SQL is written in exactly that
  * shape, which doubles as the swap's specification.
  */
object QualityOps {

  /** Count of the most frequent element of an array column. */
  private def modeCount(arr: Column): Column =
    array_max(transform(array_distinct(arr),
      t => size(filter(arr, x => x === t))))

  /** Total positions covered by elements occurring more than once. */
  private def dupPositions(arr: Column): Column = {
    val counts = transform(array_distinct(arr),
      t => size(filter(arr, x => x === t)))
    aggregate(counts, lit(0),
      (acc, c) => acc + when(c > lit(1), c).otherwise(lit(0)))
  }

  /** Adjacent-bigram strings of a token array. The size guard keeps
    * single-token docs legal at CONSTRUCTION: sequence(1, 0) would
    * count DOWN and element_at(tk, 0) ANSI-throws. Downstream ratios
    * over the (possibly empty) result carry their own null guards in
    * [[signalsRelationOf]] — 0/0 ANSI-throws too.
    */
  private def bigrams(tk: Column): Column =
    when(size(tk) >= 2,
      transform(sequence(lit(1), size(tk) - 1),
        i => concat(element_at(tk, i), lit(" "), element_at(tk, i + 1))))
      .otherwise(array().cast("array<string>"))

  // Thresholds for the composite filter (q133), chosen to engage on
  // the fixture corpus (each rule fires on ~5-10% of documents) so
  // the oracle actually exercises every branch.
  val MinTokens = 16
  val MinStopwordRatio = 0.015
  val MaxTopUnigramFrac = 0.12
  val MaxDupBigramFrac = 0.10

  /** A chunk occurring in at least this many places corpus-wide is
    * boilerplate (q138); the fixture's census tail reaches 9 copies,
    * so the rule engages on ~20% of documents.
    */
  val BoilerplateMinCopies = 3

  /** Per-language stopword count: the profile is selected by the
    * doc's own `lang` column (the per-language Gopher/C4 form — an
    * English list applied to a German doc flags every German doc
    * low-stopword). Languages without a profile (the fixture's zh)
    * get NULL: no profile means the stopword test cannot be ASSESSED,
    * so the q133 rule is skipped for them (NULL comparisons fall
    * through the verdict CASE on both engines).
    */
  private def stopCountByLang(tk: Column, lang: Column): Column =
    Text.StopwordProfiles.foldRight(lit(null).cast("int")) {
      case ((l, ws), rest) =>
        when(lang === l, Text.stopwordCount(tk, ws)).otherwise(rest)
    }

  /** The DuckDB spelling of [[stopCountByLang]]. */
  private def stopCountSql(tkExpr: String): String =
    "CASE " + Text.StopwordProfiles.map { case (l, ws) =>
      s"WHEN lang = '$l' THEN len(list_filter($tkExpr, x -> x IN " +
        s"(${ws.map(w => s"'$w'").mkString(",")})))"
    }.mkString(" ") + " ELSE NULL END"

  /** The per-doc quality-SIGNAL relation shared by q132 and q133 (and
    * the streaming verdict maintenance): one row per document with
    * the token/bigram fold results as exact integers — ratios are the
    * consumers' business, so the stored stage is engine-exact by
    * construction. Columns: doc_id, lang, n_tokens, n_stop (per-lang
    * profile, NULL when the lang has none), top_uni_c (count of the
    * most frequent unigram), n_bigrams, top_bi_c / dup_bi_pos (NULL
    * on sub-2-token docs — the guard that keeps the downstream
    * ratios off the ANSI 0/0 path).
    *
    * Everything is MAP-SIDE: higher-order-function folds over each
    * row's own token array, no shuffle at any cardinality. Per-doc
    * work is O(len · distinct) for the mode counts; documents are
    * context-window-bounded in this pipeline, and a megadoc corpus
    * would swap the HOF mode count for the posexplode +
    * groupBy((doc, token)) shape — the oracle SQL is written in
    * exactly that shape, which doubles as the swap's specification.
    */
  private[graft] def signalsRelationOf(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val tk = Text.tokens(col("text"))
    docs
      .select(col("doc_id"), col("lang"), tk.as("tk"))
      .select(col("doc_id"), col("lang"),
        // the mode/bigram folds run in the native one-pass kernel
        // ([[graft.expressions.TokenStats]]); the interpreted-HOF
        // formulation below ([[signalsRelationHof]]) is its pinned
        // reference semantics
        ColumnBridge.column(graft.expressions.TokenStats(
          ColumnBridge.expression(col("tk")))).as("st"),
        stopCountByLang(col("tk"), col("lang")).as("n_stop"))
      .select(col("doc_id"), col("lang"),
        col("st.n_tokens").as("n_tokens"), col("n_stop"),
        col("st.top_uni_c").as("top_uni_c"),
        col("st.n_bigrams").as("n_bigrams"),
        col("st.top_bi_c").as("top_bi_c"),
        col("st.dup_bi_pos").as("dup_bi_pos"))
  }

  /** The higher-order-function formulation of [[signalsRelationOf]] —
    * O(len · distinct) interpreted lambda evaluations per doc, kept
    * as the executable reference the native kernel is spec-pinned
    * against (the minHashHof pattern).
    */
  private[graft] def signalsRelationHof(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tk = Text.tokens(col("text"))
    docs
      .select(col("doc_id"), col("lang"), tk.as("tk"))
      .select(col("doc_id"), col("lang"),
        size(col("tk")).as("n_tokens"),
        stopCountByLang(col("tk"), col("lang")).as("n_stop"),
        modeCount(col("tk")).as("top_uni_c"),
        bigrams(col("tk")).as("bg"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_stop"),
        col("top_uni_c"),
        size(col("bg")).as("n_bigrams"),
        when(size(col("bg")) > 0, modeCount(col("bg"))).as("top_bi_c"),
        when(size(col("bg")) > 0, dupPositions(col("bg"))).as("dup_bi_pos"))
  }

  /** q133's reason-coded verdicts over a signal relation
    * ([[signalsRelationOf]] rows): FIRST-failing-rule precedence
    * (too_short > low_stopword > high_top_unigram > high_dup_bigram >
    * keep). Rule comparisons run on the UNROUNDED int/int ratios —
    * identical doubles on both engines — so no threshold can straddle
    * a rounding edge; the surfaced signal columns are 4dp. NULL
    * ratios (no stopword profile; sub-2-token docs) fall through
    * their rule on both engines.
    */
  private[graft] def verdictsFromSignals(
      sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sig.select(
        col("doc_id"), col("n_tokens"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("top_uni_c").cast("double") / col("n_tokens")).as("uni_frac"),
        (col("dup_bi_pos").cast("double") / col("n_bigrams")).as("dup_frac"))
      .select(
        col("doc_id"),
        when(col("n_tokens") < MinTokens, "too_short")
          .when(col("stop_ratio") < MinStopwordRatio, "low_stopword")
          .when(col("uni_frac") > MaxTopUnigramFrac, "high_top_unigram")
          .when(col("dup_frac") > MaxDupBigramFrac, "high_dup_bigram")
          .otherwise("keep").as("verdict"),
        col("n_tokens").cast("int").as("n_tokens"),
        round(col("stop_ratio"), 4).as("stopword_ratio"),
        round(col("uni_frac"), 4).as("top_unigram_frac"),
        round(col("dup_frac"), 4).as("dup_bigram_frac"))

  /** Signals → verdicts in one shot — the standalone form the
    * streaming maintenance path applies per micro-batch (the rules
    * are per-doc map-side, so batch and stream compose trivially).
    */
  private[graft] def verdictsOf(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    verdictsFromSignals(signalsRelationOf(docs))

  /** Batch-build the persisted verdict table (epoch `base` of a
    * versioned [[graft.engine.EpochStore]] at `<path>/verdicts`) —
    * the quality-filter ship-table a pipeline writes once and every
    * downstream consumer (sampling, mixing, reporting) reads.
    */
  def buildVerdicts(docs: org.apache.spark.sql.DataFrame,
                    path: String): String = {
    graft.engine.EpochStore.create(s"$path/verdicts", rebuild = true) { base =>
      verdictsOf(docs).write.mode("overwrite").parquet(base)
    }
    path
  }

  /** Streaming maintenance of the verdict table: each micro-batch of
    * (doc_id, text, lang) documents gets the identical q133 rule
    * battery (per-doc map-side — no cross-batch state, so streamed
    * verdicts are bit-identical to a batch run over the same docs)
    * and commits as its own epoch under the
    * [[graft.engine.EpochStore]] exactly-once contract: replayed
    * batchIds are storage no-ops, [[graft.engine.EpochStore.compact]]
    * folds the accumulated epochs. The quality table grows with the
    * crawl exactly like the three indexes.
    */
  def verdictsStream(docs: org.apache.spark.sql.DataFrame, path: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.engine.EpochStore.commitEpoch(s"$path/verdicts", batchId) {
          tmp => verdictsOf(batch).write.mode("overwrite").parquet(tmp)
        }
      }
      .start()

  /** The full verdict table across every committed epoch. */
  def verdicts(spark: org.apache.spark.sql.SparkSession,
               path: String): org.apache.spark.sql.DataFrame =
    graft.engine.EpochStore.read(spark, s"$path/verdicts")
      .select("doc_id", "verdict", "n_tokens", "stopword_ratio",
        "top_unigram_frac", "dup_bigram_frac")

  /** Shared DuckDB CTE chain producing the q132/q133 signal inputs —
    * toks (with lang), uni (top unigram count), bi (bigram counts;
    * LEFT-joined by consumers: a sub-2-token doc has no bi row and
    * must surface NULL bigram ratios, matching the Spark side's
    * null guard).
    */
  private val SignalCtes: String =
    raw"""toks AS (
      SELECT doc_id, lang,
        string_split_regex(lower(trim(text)), '\s+') AS tk
      FROM documents),
    uni AS (
      SELECT doc_id, MAX(c) AS topc, SUM(c) AS n FROM (
        SELECT doc_id, t, COUNT(*) AS c
        FROM toks, UNNEST(tk) AS u(t) GROUP BY doc_id, t)
      GROUP BY doc_id),
    bi AS (
      SELECT doc_id, MAX(c) AS topc,
        SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_pos, SUM(c) AS n
      FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM (
          SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
          FROM toks, UNNEST(range(1, len(tk))) AS r(i)) GROUP BY doc_id, g)
      GROUP BY doc_id)"""

  lazy val queries: Seq[Q] = Seq(

    // -- Gopher-style repetition signals, per document: share of the
    //    most common unigram / adjacent bigram, and the fraction of
    //    bigram positions whose bigram repeats within the doc. All
    //    int/int ratios -> bit-identical doubles on both engines;
    //    rounded 4dp for display only. Reads the session-shared
    //    signal stage ([[SharedStages.qualitySignals]]) — q133
    //    consumes the identical folds, and recomputing them per
    //    consumer was the bench's single biggest waste (~12s of a
    //    ~125s sf0.1 run at local[32]).
    Q("q132_repetition_signals",
      (s, d) => SharedStages.qualitySignals(s, d)
        .select(col("doc_id"),
          round(col("top_uni_c").cast("double") / col("n_tokens"), 4)
            .as("top_unigram_frac"),
          round(col("top_bi_c").cast("double") / col("n_bigrams"), 4)
            .as("top_bigram_frac"),
          round(col("dup_bi_pos").cast("double") / col("n_bigrams"), 4)
            .as("dup_bigram_frac"))
        .orderBy(col("doc_id")),
      Some(s"""WITH $SignalCtes
        SELECT uni.doc_id,
          ROUND(CAST(uni.topc AS DOUBLE) / uni.n, 4) AS top_unigram_frac,
          ROUND(CAST(bi.topc AS DOUBLE) / bi.n, 4) AS top_bigram_frac,
          ROUND(CAST(bi.dup_pos AS DOUBLE) / bi.n, 4) AS dup_bigram_frac
        FROM uni LEFT JOIN bi USING (doc_id) ORDER BY uni.doc_id"""),
      "Gopher-style within-doc repetition signals"),

    // -- Composite C4/Gopher quality filter over the same shared
    //    signal stage. Stopword lists are PER-LANGUAGE (the doc's
    //    lang column selects the profile; languages without one skip
    //    the stopword rule) — an absolute English list would
    //    systematically flag every non-English doc.
    Q("q133_quality_filter_verdicts",
      (s, d) => verdictsFromSignals(SharedStages.qualitySignals(s, d))
        .orderBy(col("doc_id")),
      Some(s"""WITH $SignalCtes,
        sig AS (
          SELECT t.doc_id, len(t.tk) AS n_tokens,
            CAST(${stopCountSql("t.tk")}
              AS DOUBLE) / len(t.tk) AS stop_ratio,
            CAST(uni.topc AS DOUBLE) / uni.n AS uni_frac,
            CAST(bi.dup_pos AS DOUBLE) / bi.n AS dup_frac
          FROM toks t JOIN uni ON t.doc_id = uni.doc_id
            LEFT JOIN bi ON t.doc_id = bi.doc_id)
        SELECT doc_id,
          CASE WHEN n_tokens < $MinTokens THEN 'too_short'
               WHEN stop_ratio < $MinStopwordRatio THEN 'low_stopword'
               WHEN uni_frac > $MaxTopUnigramFrac THEN 'high_top_unigram'
               WHEN dup_frac > $MaxDupBigramFrac THEN 'high_dup_bigram'
               ELSE 'keep' END AS verdict,
          CAST(n_tokens AS INT) AS n_tokens,
          ROUND(stop_ratio, 4) AS stopword_ratio,
          ROUND(uni_frac, 4) AS top_unigram_frac,
          ROUND(dup_frac, 4) AS dup_bigram_frac
        FROM sig ORDER BY doc_id"""),
      "reason-coded composite quality filter (per-language C4/Gopher rules)"),

    // -- Content-defined chunking: Rabin-style rolling hash over a
    //    3-word window; a position whose hash ≡ 0 (mod 16) STARTS a
    //    new chunk, so chunk boundaries move with content, not
    //    offsets — an insertion early in a document shifts every
    //    fixed-width block but only the one containing chunk here
    //    (the storage-dedup property; q137 measures the resulting
    //    cross-doc chunk sharing). Word values are md5-derived
    //    (q75's engine-portable md5→int convention); everything is
    //    integer arithmetic inside one codegen'd projection.
    Q("q136_cdc_chunking",
      (s, d) => t(s, d).documents
        .select(col("doc_id"), cdcChunks(col("text")).as("ch"))
        .select(
          col("doc_id"),
          size(col("ch")).cast("long").as("n_chunks"),
          // every token lands in exactly one chunk, so Σ n_words over
          // the (small, per-doc) chunk array is the token count
          round(aggregate(col("ch"), lit(0),
            (a, c) => a + c.getField("n_words")).cast("double")
            / size(col("ch")), 4).as("avg_chunk_words"),
          array_max(transform(col("ch"), _.getField("n_words")))
            .cast("long").as("max_chunk_words"))
        .orderBy(col("doc_id")),
      Some(s"WITH $ChunkCtes " +
        """SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
          ROUND(CAST(SUM(n_words) AS DOUBLE) / COUNT(*), 4) AS avg_chunk_words,
          CAST(MAX(n_words) AS BIGINT) AS max_chunk_words
        FROM chunk_sizes GROUP BY doc_id ORDER BY doc_id"""),
      "content-defined chunking (rolling-hash boundaries)"),

    // -- Cross-document chunk-level dedup census: how many chunks
    //    occur in 1, 2, ... places corpus-wide — the dedup-ratio a
    //    content-addressed store would realize. Reads the session-
    //    shared persisted chunk store (built once by [[ChunkIndex]];
    //    q138 reads the same stage) — the corpus text is never
    //    re-chunked per consumer. The output is a copies-histogram,
    //    constant-sized at any corpus scale.
    Q("q137_chunk_dedup_census",
      (s, d) => {
        val chunks = SharedStages.chunkStore(s, d)
        chunks.groupBy(col("chunk_str"))
          .agg(count(lit(1)).as("n_copies"))
          .groupBy(col("n_copies"))
          .agg(count(lit(1)).as("n_chunks"))
          .orderBy(col("n_copies"))
      },
      Some(s"WITH $ChunkCtes, $ChunkTextCte " +
        """SELECT n_copies, COUNT(*) AS n_chunks FROM freq
        GROUP BY n_copies ORDER BY n_copies"""),
      "corpus-wide chunk sharing histogram"),

    // -- C4-style boilerplate removal at CHUNK granularity: a chunk
    //    occurring in >= 3 places corpus-wide is boilerplate (the
    //    census above shows the fixture's own tail reaches 9); docs
    //    are REASSEMBLED from their surviving chunks in order — the
    //    actual cleaning transform, not just a report. Both fan-out
    //    consumers (the frequency aggregate and the join probe side)
    //    read the session-shared persisted chunk store — the
    //    q54/q56/q125 lesson: a lazy shared subtree would re-chunk
    //    the corpus per consumer. The only token-cardinality shuffle
    //    is the chunk-string frequency join; reassembly is one
    //    doc-keyed aggregate whose per-group state is the doc's own
    //    chunks.
    Q("q138_boilerplate_removal",
      (s, d) => {
        val chunks = SharedStages.chunkStore(s, d)
        val freq = chunks.groupBy(col("chunk_str"))
          .agg(count(lit(1)).as("n_copies"))
        chunks.join(freq, Seq("chunk_str"))
          .withColumn("keep", col("n_copies") < BoilerplateMinCopies)
          .groupBy(col("doc_id"))
          .agg(
            sum(col("keep").cast("int")).cast("long").as("n_chunks_kept"),
            sum((!col("keep")).cast("int")).cast("long")
              .as("n_chunks_dropped"),
            array_join(transform(
              array_sort(collect_list(when(col("keep"),
                struct(col("chunk_id"), col("chunk_str"))))),
              x => x.getField("chunk_str")), " ").as("cleaned_text"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH $ChunkCtes, $ChunkTextCte, " +
        s"""verdicts AS (
          SELECT ctext.doc_id, ctext.chunk_id, ctext.chunk_str,
            (freq.n_copies >= $BoilerplateMinCopies) AS drop_it
          FROM ctext JOIN freq USING (chunk_str))
        SELECT doc_id,
          CAST(COUNT(*) FILTER (WHERE NOT drop_it) AS BIGINT) AS n_chunks_kept,
          CAST(COUNT(*) FILTER (WHERE drop_it) AS BIGINT) AS n_chunks_dropped,
          COALESCE(string_agg(chunk_str, ' ' ORDER BY chunk_id)
            FILTER (WHERE NOT drop_it), '') AS cleaned_text
        FROM verdicts GROUP BY doc_id ORDER BY doc_id"""),
      "C4-style boilerplate-chunk removal with reassembled text"),

    // -- Per-LANGUAGE calibrated quality filtering (the CCNet move):
    //    an absolute score threshold keeps 95% of one language and
    //    5% of another, so the keep rule is a per-language RANK
    //    cutoff — top 80% of each language by the q101 hashed-linear
    //    score. The rank window partitions by lang (per-key scans
    //    parallelize natively; a pathological mega-language falls
    //    back to the q83 PrefixSum shape); the cutoff is pure
    //    integer arithmetic (rank·5 ≤ 4n+4 ⟺ rank ≤ ceil(0.8n)), so
    //    no fp threshold can straddle engines, and the score is
    //    6dp-rounded BEFORE the rank (q74's round-before-rank rule)
    //    with doc_id breaking ties.
    Q("q139_calibrated_quality",
      (s, d) => {
        val scored = CalibrationStore.scoreRelation(t(s, d).documents)
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(col("score").desc, col("doc_id"))
        val cwin = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
        scored
          .withColumn("lang_rank", row_number().over(win))
          .withColumn("n_lang", count(lit(1)).over(cwin))
          .select(col("doc_id"), col("lang"), col("score"),
            col("lang_rank").cast("int").as("lang_rank"),
            (col("lang_rank") * 5 <= col("n_lang") * 4 + 4).cast("int")
              .as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(CalibratedQualitySql),
      "per-language rank-calibrated quality filter (top 80% per lang)"),

    // -- q159: the CALIBRATION STORE serving q139 (the q153/q156
    //    served-from-the-store pattern): per-language score
    //    histograms maintained in an epoch store
    //    ([[CalibrationStore]] — 6dp scores make the buckets exact
    //    integers, so the histogram is a LOSSLESS sufficient
    //    statistic for the rank), built over the resident split and
    //    appended the last-fifth batch. The read reconstructs
    //    lang_rank as cumulative-histogram count above + tie-group
    //    row_number — NO per-language corpus sort, the thing q139's
    //    global rank window pays per read and a 100 TB corpus
    //    cannot. Oracle is q139's VERBATIM, so the driver
    //    hash-verifies the whole score → histogram-epoch → resolved
    //    cutoff → serve chain against the from-scratch rank.
    Q("q159_calibration_store_served",
      (s, d) => CalibrationStore.served(
        s, SharedStages.calibrationStorePath(s, d)),
      Some(CalibratedQualitySql),
      "histogram-store-served calibrated quality filter (== full rank recompute)"),

    // -- Chunk-level decontamination: the chunk-store complement of
    //    q77's 8-gram overlap — for each training doc, what fraction
    //    of its content-defined chunks also appear in the eval split
    //    (doc_id % 50 == 0, q77's convention), and the drop verdict
    //    at >= 25% (integer rule: 4·shared >= total, so no fp
    //    threshold exists). The training side reads the persisted
    //    chunk store; the eval side reads the PERSISTED eval chunk
    //    set ([[SharedStages.evalChunkSet]] — the fixed side of every
    //    decontamination run, distinct'd once per session, not per
    //    run) and rides the broadcast, so the training corpus is
    //    scanned once and never pair-shuffled.
    Q("q140_chunk_decontamination",
      (s, d) => {
        val chunks = SharedStages.chunkStore(s, d)
        val evalSet = SharedStages.evalChunkSet(s, d)
          .withColumn("shared", lit(1))
        chunks.filter(col("doc_id") % 50 =!= 0)
          .join(broadcast(evalSet), Seq("chunk_str"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(coalesce(col("shared"), lit(0))).as("n_shared"))
          .select(col("doc_id"), col("n_chunks"), col("n_shared"),
            round(col("n_shared").cast("double") / col("n_chunks"), 4)
              .as("shared_frac"),
            (col("n_shared") * 4 >= col("n_chunks")).cast("int")
              .as("contaminated"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH $ChunkCtes, $ChunkTextCte, " +
        raw"""ev AS (SELECT DISTINCT chunk_str FROM ctext WHERE doc_id % 50 = 0),
        agg AS (
          SELECT t.doc_id, COUNT(*) AS n_chunks,
            SUM(CASE WHEN ev.chunk_str IS NOT NULL THEN 1 ELSE 0 END) AS n_shared
          FROM (SELECT * FROM ctext WHERE doc_id % 50 <> 0) t
          LEFT JOIN ev ON t.chunk_str = ev.chunk_str
          GROUP BY t.doc_id)
        SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
          CAST(n_shared AS BIGINT) AS n_shared,
          ROUND(CAST(n_shared AS DOUBLE) / n_chunks, 4) AS shared_frac,
          CAST(4 * n_shared >= n_chunks AS INT) AS contaminated
        FROM agg ORDER BY doc_id"""),
      "chunk-granularity train/eval decontamination via the chunk store"),

    // -- Composed CONTAMINATION verdicts: the q100/q131 composition
    //    pattern applied to decontamination — every serious pipeline
    //    runs several leakage checks, and the ship-table is ONE
    //    reason-coded row per training doc, not three reports to
    //    reconcile. Precedence: verbatim 8-gram overlap with the eval
    //    split (q77's rule — the strongest evidence) > semantic
    //    nearest-eval cosine ≥ τ (q111's rule, embedding joined by
    //    doc_id = vec_id; docs without a vector skip the rule via
    //    NULL fall-through, q131's convention) > chunk-level sharing
    //    ≥ 25% (q140's integer rule) > clean. Diagnostics surfaced
    //    per doc: distinct bench docs hit, max eval cosine (4dp
    //    BEFORE the max and the compare — q111's rounding rule), and
    //    the chunk shared fraction.
    //
    //    Scale shape: three independent bounded probes over one
    //    corpus pass each — bench shingles and capped eval vectors
    //    broadcast (q77/q111's shapes), the chunk side reads the
    //    persisted store + persisted eval set (q140's shape) — then
    //    doc-keyed left joins; nothing pair-shuffles.
    Q("q145_contamination_verdicts",
      (s, d) => contaminationVerdictsOn(s, d).orderBy(col("doc_id")),
      Some(ContaminationOracleSql),
      "reason-coded composed contamination verdicts (8-gram > semantic > chunk)"),

    // -- The TRAINING MANIFEST: the engine's end-to-end ship artifact
    //    — one decision row per training document composing the whole
    //    prep chain: quality filter (q133's shared-signal verdicts) >
    //    dedup (q100's shared exact→near verdict table) >
    //    decontamination (q145's composed verdicts) > keep, with the
    //    first-failing stage as the decision and its sub-verdict as
    //    the reason. Survivors get their q83 context-window packing
    //    (start_tok / pack_id / offset via the distributed PrefixSum
    //    over kept docs only); dropped docs carry NULL pack columns.
    //    This is the table a training job actually reads: which docs,
    //    why the rest were dropped, and where each kept doc lands.
    //    Round 10: the dedup stage also sees CONTAINMENT redundancy —
    //    q149's carrier verdicts (quote/subset chains collapsed to
    //    their largest carrier) drop non-carriers with reason
    //    'contained', after exact/near (a doc that is both an exact
    //    copy and a quote reports the stronger evidence) and before
    //    contamination.
    //
    //    Scale shape: every input is a session-shared persisted stage
    //    (signal relation, dedup verdict table, containment pair
    //    table, chunk store + eval set) or a bounded broadcast probe —
    //    composing the manifest adds only doc-keyed joins and the
    //    two-level prefix scan. Scope: the capped corpus prefix ∩
    //    training split (the dedup table's declared domain; both
    //    fixture sfs sit fully inside the cap). Containment verdicts
    //    are corpus-wide (q148's domain): a training doc quoted
    //    inside ANY corpus carrier is redundant regardless of where
    //    the carrier sits.
    Q("q146_training_manifest",
      (s, d) => {
        val qual = verdictsFromSignals(SharedStages.qualitySignals(s, d))
          .select(col("doc_id"), col("verdict").as("q_v"), col("n_tokens"))
        val base = t(s, d).documents
          .filter(col("doc_id") % 50 =!= 0 &&
            col("doc_id") < TextOps.ExactBaselineDocCap)
          .select(col("doc_id"))
          .join(qual, Seq("doc_id"))
        composeManifest(base,
          SharedStages.dedupVerdictsTable(s, d)
            .select(col("doc_id"), col("verdict").as("d_v")),
          NearDupOps
            .containmentVerdictsOn(SharedStages.containmentPairs(s, d))
            .filter(col("is_kept") === 0)
            .select(col("doc_id"), lit(1).as("ct")),
          contaminationVerdictsOn(s, d)
            .select(col("doc_id"), col("verdict").as("c_v")))
      },
      Some(manifestOracleSql),
      "end-to-end training manifest: quality > dedup > contamination > pack"),

    // -- q157: INCREMENTAL manifest maintenance — the capstone of the
    //    incremental trio (q152 text, q154 embeddings, q155
    //    containment): with every INPUT verdict family maintaining
    //    incrementally, the composed q146 manifest itself can. The
    //    resident state (quality components, contamination components
    //    + their probe indexes — the persisted decontamination
    //    posting/chunk/vector sides) is the session-shared pre-ingest
    //    build; the batch (ids ≥ the crawl split) advances it WITHOUT
    //    re-reading resident text: quality is per-doc map-side on the
    //    batch alone, the three contamination arms update by
    //    delta-bounded probes (new bench shingles against the stored
    //    posting index, new eval vectors against the stored corpus
    //    vectors, newly-shared chunk strings against the stored chunk
    //    relation — each broadcast-delta-sized), and the dedup /
    //    containment verdicts are READ from the two persisted stores
    //    (VerdictStore, ContainmentStore) whose own appends already
    //    folded the batch — the store views q153/q156 hash-prove equal
    //    to their full recomputes. Precedence then re-folds over the
    //    doc-keyed component table (text-free, cheap at any scale) and
    //    packing re-derives via the distributed PrefixSum — start_tok
    //    is a corpus-order prefix, so ANY verdict flip shifts every
    //    later kept doc; deriving it at read from the maintained
    //    components is exactly why packing is NOT stored state.
    //    Exactness: each arm's incremental update is argued at
    //    [[advanceManifestState]]; the oracle is q146's VERBATIM
    //    full-recompute chain, so the driver hash-verifies the entire
    //    incremental composition against the from-scratch build.
    //    ManifestSpec engages every flip path (near-cluster merge,
    //    containment carrier flip, ngram / semantic / chunk
    //    contamination onset) on a crafted corpus.
    Q("q157_incremental_manifest",
      (s, d) => {
        val docs = t(s, d).documents
        val split = NearDupOps.incrementalSplitId(docs)
        incrementalManifest(
          SharedStages.manifestResidentState(s, d),
          docs.filter(col("doc_id") >= split),
          t(s, d).embeddings.filter(col("vec_id") >= split),
          VerdictStore.read(s, SharedStages.verdictStorePath(s, d))
            .select(col("doc_id"), col("verdict").as("d_v")),
          ContainmentStore
            .read(s, SharedStages.containmentStorePath(s, d))
            .filter(col("is_kept") === 0)
            .select(col("doc_id"), lit(1).as("ct")))
      },
      Some(manifestOracleSql),
      "incremental manifest maintenance from the persisted verdict stores (== full recompute)"),

    // -- q160: the PERSISTED ManifestStore on the driver's oracle
    //    surface (the q153/q156/q159 served-from-the-store pattern):
    //    the session-shared store is BUILT over the resident split,
    //    the last-fifth batch APPENDED through the eight-table
    //    delta-epoch path (append-only component tables + the one
    //    LWW contamination table whose epochs carry ONLY the
    //    batch-touched resident rows), and this query serves the
    //    manifest from the resolved state + the two verdict-store
    //    views — so the driver hash-verifies the store's entire
    //    build → delta-append → LWW-read → precedence → packing
    //    chain against q146's from-scratch recompute.
    Q("q160_manifest_store_read",
      (s, d) => ManifestStore.manifest(s,
        SharedStages.manifestStorePath(s, d),
        VerdictStore.read(s, SharedStages.verdictStorePath(s, d))
          .select(col("doc_id"), col("verdict").as("d_v")),
        ContainmentStore
          .read(s, SharedStages.containmentStorePath(s, d))
          .filter(col("is_kept") === 0)
          .select(col("doc_id"), lit(1).as("ct"))),
      Some(manifestOracleSql),
      "persisted manifest store: build + delta append, served read == full recompute"),

    // -- Quality-aware canonical selection: dedup normally keeps the
    //    MIN-id member of each near-dup cluster (q78/q100); the
    //    better pipeline keeps the HIGHEST-QUALITY member. One row
    //    per cluster (singletons included via the left join) with
    //    the best member by the q101 hashed-linear score — argmax
    //    realized window-free as max-score + min-id-among-ties (two
    //    cluster-keyed aggregates, deterministic because the score
    //    is 6dp-rounded before the equality).
    //    Round 12: BOTH inputs are now maintained state (the
    //    q153/q156/q160 store-served discipline): clusters read the
    //    session-persisted component table, and the per-doc score is
    //    served from the persisted [[CalibrationStore]]'s scores
    //    table ([[CalibrationStore.scoreRelation]] is q141's exact
    //    formula, stored per-doc at ingest) — so the selection is
    //    joins + two cluster-keyed aggregates with ZERO corpus text
    //    scans and no component loop per read. Docs whose capped
    //    membership the store doesn't know about are impossible: the
    //    store ingests every document, and the id-cap filter pushes
    //    to its scores scan.
    Q("q141_quality_canonical",
      (s, d) => {
        // the doc universe is the store's own: every ingested doc has
        // a score row (zero-token docs have none — exactly the rows
        // the original inner join with the scored relation dropped)
        val scored = CalibrationStore
          .scores(s, SharedStages.calibrationStorePath(s, d))
          .filter(col("doc_id") < TextOps.ExactBaselineDocCap)
          .select(col("doc_id"), col("score"))
        val clusters = scored.select(col("doc_id"))
          .join(SharedStages.cappedNearDupComponents(s, d)
            .select(col("id").as("doc_id"), col("comp")),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("doc_id")).as("cluster_id"))
        val joined = clusters.join(scored, Seq("doc_id"))
        val maxs = joined.groupBy(col("cluster_id"))
          .agg(max(col("score")).as("best_score"),
            count(lit(1)).as("n_members"))
        joined.join(maxs, Seq("cluster_id"))
          .filter(col("score") === col("best_score"))
          .groupBy(col("cluster_id"), col("n_members"), col("best_score"))
          .agg(min(col("doc_id")).as("best_id"))
          .select(col("cluster_id"), col("n_members"), col("best_id"),
            col("best_score"))
          .orderBy(col("cluster_id"))
      },
      Some(raw"""WITH RECURSIVE docs AS (
          SELECT doc_id, lang, CAST(FLOOR(n_chars / 64) AS BIGINT) AS bucket,
            list_distinct(CASE WHEN len(string_split_regex(lower(trim(text)), '\s+')) >= 3
              THEN list_transform(
                range(1, len(string_split_regex(lower(trim(text)), '\s+')) - 1),
                i -> array_to_string(string_split_regex(lower(trim(text)), '\s+')[i:i+2], ' '))
              ELSE [] END) AS sh
          FROM documents WHERE doc_id < 8192),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM docs a JOIN docs b
            ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
        walk AS (
          SELECT a AS id, a AS reach FROM edges
          UNION
          SELECT w.id, e.b AS reach FROM walk w JOIN edges e ON e.a = w.reach),
        comp AS (SELECT id AS doc_id, MIN(reach) AS cluster_id
                 FROM walk GROUP BY id),
        clusters AS (
          SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
          FROM (SELECT doc_id FROM documents WHERE doc_id < 8192) d
          LEFT JOIN comp c ON d.doc_id = c.doc_id),
        tok AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents WHERE doc_id < 8192),
        scored AS (
          SELECT doc_id,
            ROUND(CAST(SUM(CAST(
              CAST(('0x' || substr(md5(token), 1, 8))::BIGINT % 1024
                * 2654435761 % 1000003 AS DOUBLE) / 1000003.0 - 0.5
              AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS score
          FROM tok GROUP BY doc_id),
        joined AS (
          SELECT cl.cluster_id, cl.doc_id, s.score
          FROM clusters cl JOIN scored s ON cl.doc_id = s.doc_id),
        maxs AS (
          SELECT cluster_id, MAX(score) AS best_score, COUNT(*) AS n_members
          FROM joined GROUP BY cluster_id)
        SELECT j.cluster_id, CAST(m.n_members AS BIGINT) AS n_members,
          MIN(j.doc_id) AS best_id, m.best_score
        FROM joined j JOIN maxs m ON j.cluster_id = m.cluster_id
        WHERE j.score = m.best_score
        GROUP BY j.cluster_id, m.n_members, m.best_score
        ORDER BY j.cluster_id"""),
      "quality-aware canonical selection per dedup cluster"))

  /** q145's operator body: the composed per-training-doc
    * contamination verdict table (see the query comment for the
    * precedence and scale rationale). Exposed so q146's manifest can
    * reuse the verdicts without re-declaring the machinery.
    */
  private[graft] def contaminationVerdictsOn(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import graft.functions.Vectors
    val docs = t(s, d).documents
    val train = docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"))
    val corpusSh = docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"),
        explode(array_distinct(Text.shingles(col("text"), 8))).as("sh"))
    val benchSh = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_id"),
        explode(array_distinct(Text.shingles(col("text"), 8))).as("sh"))
    val ngram = corpusSh.join(broadcast(benchSh), Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("bench_id")).as("n_bench_docs"))
    val emb = t(s, d).embeddings
    val ev = emb.filter(col("vec_id") % 50 === 0 &&
        col("vec_id") < Similarity.ExactBaselineVecCap)
      .select(col("embedding").as("e_emb"))
    val sem = emb.filter(col("vec_id") % 50 =!= 0)
      .crossJoin(broadcast(ev))
      .groupBy(col("vec_id"))
      .agg(max(round(Vectors.cosine(col("embedding"), col("e_emb")), 4))
        .as("max_eval_cos"))
      .select(col("vec_id").as("doc_id"), col("max_eval_cos"))
    val chunks = SharedStages.chunkStore(s, d)
    val evalSet = SharedStages.evalChunkSet(s, d)
      .withColumn("shared", lit(1))
    val chunk = chunks.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(evalSet), Seq("chunk_str"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("shared"), lit(0))).as("n_shared"))
    train
      .join(ngram, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .join(chunk, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("n_bench_docs") >= 1, "ngram")
          .when(col("max_eval_cos") >= Similarity.SemDedupTau, "semantic")
          .when(col("n_shared") * 4 >= col("n_chunks"), "chunk")
          .otherwise("clean").as("verdict"),
        coalesce(col("n_bench_docs"), lit(0L)).as("n_bench_docs"),
        col("max_eval_cos"),
        round(col("n_shared").cast("double") / col("n_chunks"), 4)
          .as("chunk_shared_frac"))
  }

  /** Fold the four per-doc verdict families into the shipped manifest
    * — q146's precedence + packing block, shared verbatim by q146
    * (full recompute) and q157 (incremental maintenance) so the two
    * surfaces cannot drift. `base` carries (doc_id, q_v, n_tokens)
    * for every manifest-domain doc; `dedup` (doc_id, d_v),
    * `contained` (doc_id, ct) and `cont` (doc_id, c_v) left-join onto
    * it. Everything here is doc-keyed — the fold itself is free at
    * any scale; the cost lives in producing the inputs.
    */
  private def composeManifest(
      base: org.apache.spark.sql.DataFrame,
      dedup: org.apache.spark.sql.DataFrame,
      contained: org.apache.spark.sql.DataFrame,
      cont: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.operators.PrefixSum
    val joined = base
      .join(dedup, Seq("doc_id"), "left")
      .join(contained, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("q_v"),
        coalesce(col("d_v"), lit("keep")).as("d_v"),
        col("ct"),
        coalesce(col("c_v"), lit("clean")).as("c_v"))
      .select(col("doc_id"), col("n_tokens"),
        when(col("q_v") =!= "keep", lit("drop_quality"))
          .when(col("d_v") =!= "keep", lit("drop_duplicate"))
          .when(col("ct").isNotNull, lit("drop_duplicate"))
          .when(col("c_v") =!= "clean", lit("drop_contaminated"))
          .otherwise(lit("keep")).as("decision"),
        when(col("q_v") =!= "keep", col("q_v"))
          .when(col("d_v") =!= "keep", col("d_v"))
          .when(col("ct").isNotNull, lit("contained"))
          .when(col("c_v") =!= "clean", col("c_v"))
          .otherwise(lit("keep")).as("reason"))
    val packs = PrefixSum.exclusive(
        joined.filter(col("decision") === "keep")
          .select(col("doc_id"), col("n_tokens").cast("long").as("nt")),
        col("doc_id"), col("nt"), TrainingOps.PackBlock, "start_tok")
      .select(col("doc_id"), col("start_tok"),
        expr(s"start_tok div ${TrainingOps.PackWindow}").as("pack_id"),
        (col("start_tok") % TrainingOps.PackWindow).as("offset_in_pack"))
    joined.join(packs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("decision"), col("reason"),
        col("n_tokens"), col("start_tok"), col("pack_id"),
        col("offset_in_pack"))
      .orderBy(col("doc_id"))
  }

  /** The MAINTAINED per-doc component state behind the manifest —
    * what a production pipeline persists so that q146's composition
    * never re-reads resident text when a batch arrives. Two component
    * tables plus the six probe-index relations the contamination arms
    * update against:
    *
    *  - `quality`  (doc_id, q_v, n_tokens): q133's verdict + token
    *    count — per-doc map-side, so an append only ADDS rows.
    *  - `contam`   (doc_id, n_bench_docs, max_eval_cos, n_chunks,
    *    n_shared): the q145 arm components per TRAIN doc. Additive /
    *    monotone under append (see [[advanceManifestState]]) — the
    *    reason components, not verdicts, are the stored state.
    *  - `trainSh8` (doc_id, sh): distinct 8-shingle postings of train
    *    docs — the decontamination n-gram index a new bench doc
    *    probes (the persisted-index analog of q77's broadcast side).
    *  - `benchSh8` (bench_id, sh): the bench-side postings a new
    *    TRAIN doc probes.
    *  - `trainChunks` (doc_id, chunk_str) / `evalChunks` (chunk_str):
    *    the chunk-overlap arm's two sides (the [[ChunkIndex]] shape).
    *  - `trainEmb` (vec_id, embedding) / `evalEmb` (e_emb): the
    *    semantic arm's two sides (the vectors ARE the index — q111's
    *    capped eval set stays broadcast-sized by construction).
    *
    * Deliberately NOT stored: decisions, reasons, packing — all
    * derived at read by [[manifestFrom]], because a single verdict
    * flip shifts start_tok for every later kept doc; storing them
    * would force a full-table rewrite per append.
    */
  final case class ManifestState(
      quality: org.apache.spark.sql.DataFrame,
      contam: org.apache.spark.sql.DataFrame,
      trainSh8: org.apache.spark.sql.DataFrame,
      benchSh8: org.apache.spark.sql.DataFrame,
      trainChunks: org.apache.spark.sql.DataFrame,
      evalChunks: org.apache.spark.sql.DataFrame,
      trainEmb: org.apache.spark.sql.DataFrame,
      evalEmb: org.apache.spark.sql.DataFrame,
      semIndex: Option[SemanticIndex] = None) {
    private[graft] def relations: Seq[(String, org.apache.spark.sql.DataFrame)] =
      Seq("quality" -> quality, "contam" -> contam,
        "trainsh8" -> trainSh8, "benchsh8" -> benchSh8,
        "trainchunks" -> trainChunks, "evalchunks" -> evalChunks,
        "trainemb" -> trainEmb, "evalemb" -> evalEmb)
  }

  /** The IVF serving handle of a [[ManifestState]]'s train-embedding
    * side: the SAME rows as `trainEmb` but carrying their nearest-
    * centroid `cell` (stored cell-PARTITIONED so the semantic delta
    * probe reads only probed partitions under dynamic partition
    * pruning — the [[IvfIndex]]/q154 scan shape), plus the codebook
    * that produced the assignment. At `nprobe` = k (the declared
    * q157/q160 operating point — the q128 trick) the probe is
    * EXHAUSTIVE, so the delta arm equals the full resident-embedding
    * scan bit-for-bit and the oracles verify the whole probe
    * machinery; production deployments drop `nprobe` below k and buy
    * the ~nprobe/k byte cut at the measured SemDeDup recall trade
    * (ManifestSpec measures it on the fixture).
    */
  private[graft] final case class SemanticIndex(
      cells: org.apache.spark.sql.DataFrame,
      codebook: Seq[(Int, Seq[Double])],
      nprobe: Int)

  /** Nearest-cell assignment of a train-embedding relation under a
    * codebook — [[Similarity.probeCells]] at nprobe = 1 (the
    * [[IvfIndex.assign]] semantics; re-stated here because the
    * manifest's cells carry no SQ columns).
    */
  private[graft] def assignSemCells(
      emb: org.apache.spark.sql.DataFrame,
      codebook: Seq[(Int, Seq[Double])]): org.apache.spark.sql.DataFrame =
    Similarity.probeCells(emb.select(col("vec_id"), col("embedding")),
      Seq("vec_id", "embedding"), "embedding", codebook, 1)

  /** Train the semantic probe codebook over a train-embedding
    * relation (empty-corpus-safe: no vectors → no codebook → callers
    * fall back to the exhaustive cross-join form).
    */
  private[graft] def semCodebookOf(
      emb: org.apache.spark.sql.DataFrame): Seq[(Int, Seq[Double])] =
    if (emb.isEmpty) Seq.empty
    else Similarity.kmeansCodebook(emb, Similarity.IvfLloydIters,
      Similarity.IvfCells)

  /** Build [[ManifestState]] from scratch over `docs` + `emb` — the
    * t0 full pass whose output [[advanceManifestState]] maintains.
    * `chunks`/`signals` let a caller reuse already-persisted stages
    * (the session-shared chunk store and signal relation); when
    * absent they are computed from the text. The arm shapes are
    * verbatim [[contaminationVerdictsOn]]'s (broadcast bench
    * shingles, broadcast capped eval vectors, chunk left-join) so the
    * stored components equal the q145 components row for row.
    */
  private[graft] def manifestStateOn(
      docs: org.apache.spark.sql.DataFrame,
      emb: org.apache.spark.sql.DataFrame,
      chunks: Option[org.apache.spark.sql.DataFrame] = None,
      signals: Option[org.apache.spark.sql.DataFrame] = None): ManifestState = {
    import graft.functions.Vectors
    val ch = chunks.getOrElse(chunkRelationOf(docs))
      .select(col("doc_id"), col("chunk_str"))
    val quality = verdictsFromSignals(
        signals.getOrElse(signalsRelationOf(docs)))
      .select(col("doc_id"), col("verdict").as("q_v"), col("n_tokens"))
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val trainSh8 = train.select(col("doc_id"),
      explode(array_distinct(Text.shingles(col("text"), 8))).as("sh"))
    val benchSh8 = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_id"),
        explode(array_distinct(Text.shingles(col("text"), 8))).as("sh"))
    val trainChunks = ch.filter(col("doc_id") % 50 =!= 0)
    val evalChunks = ch.filter(col("doc_id") % 50 === 0)
      .select(col("chunk_str")).distinct()
    val trainEmb = emb.filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val evalEmb = emb.filter(col("vec_id") % 50 === 0 &&
        col("vec_id") < Similarity.ExactBaselineVecCap)
      .select(col("embedding").as("e_emb"))
    val ngram = trainSh8.join(broadcast(benchSh8), Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("bench_id")).as("nb"))
    val sem = trainEmb.crossJoin(broadcast(evalEmb))
      .groupBy(col("vec_id"))
      .agg(max(round(Vectors.cosine(col("embedding"), col("e_emb")), 4))
        .as("mec"))
      .select(col("vec_id").as("doc_id"), col("mec"))
    val chunkAgg = trainChunks
      .join(broadcast(evalChunks.withColumn("shared", lit(1))),
        Seq("chunk_str"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("shared"), lit(0))).as("n_shared"))
    val contam = train.select(col("doc_id"))
      .join(ngram, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .join(chunkAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bench_docs"),
        col("mec").as("max_eval_cos"),
        col("n_chunks"), col("n_shared"))
    ManifestState(quality, contam, trainSh8, benchSh8,
      trainChunks, evalChunks, trainEmb, evalEmb)
  }

  /** Everything one manifest ingest batch produces — the batch-side
    * component rows plus the UPDATED resident contamination rows (the
    * only resident rows an append can change), i.e. exactly what a
    * persisted [[ManifestStore]] commits as one delta epoch. The
    * append-only relations (postings, chunks, vectors, eval sides)
    * carry only batch-derived rows by construction.
    */
  private[graft] final case class ManifestDelta(
      quality: org.apache.spark.sql.DataFrame,
      contamChanged: org.apache.spark.sql.DataFrame,
      contamBatch: org.apache.spark.sql.DataFrame,
      trainSh8: org.apache.spark.sql.DataFrame,
      benchSh8: org.apache.spark.sql.DataFrame,
      trainChunks: org.apache.spark.sql.DataFrame,
      evalChunks: org.apache.spark.sql.DataFrame,
      trainEmb: org.apache.spark.sql.DataFrame,
      evalEmb: org.apache.spark.sql.DataFrame)

  /** Advance a [[ManifestState]] by one ingest batch (ids ≥ the crawl
    * split; `batchEmb` is the same id slice of the embeddings) —
    * WITHOUT re-reading resident text. Exactness per arm:
    *
    *  - quality: per-doc map-side → the batch rows simply union on.
    *  - ngram: resident and batch bench ids are DISJOINT (id
    *    threshold), so full-recompute's count_distinct over the union
    *    bench set splits as stored + delta, where the delta probes
    *    the STORED train posting index with the (broadcast,
    *    delta-sized) new bench shingles. Batch train docs probe the
    *    stored bench postings plus the new ones.
    *  - semantic: max(round(cos,4)) over the union eval set equals
    *    greatest(stored max, max over the NEW eval vectors) — max
    *    distributes over the disjoint split and round is per-pair
    *    (greatest skips NULLs, covering docs the resident eval set
    *    never reached). The delta probe is stored corpus vectors ×
    *    broadcast new eval vectors.
    *  - chunk: n_shared counts chunks whose string sits in the eval
    *    set; the newly-added eval strings (batch bench chunks MINUS
    *    the stored eval set — disjoint from it by construction) can
    *    only ADD matches, so stored + delta over the stored chunk
    *    relation is the union count. n_chunks is append-only. NULL
    *    components (docs with no chunks / no vector) stay NULL: the
    *    delta joins produce no row for them.
    *
    * Everything the update touches is batch-sized or a doc-keyed
    * probe of a persisted index — the q155 scale contract.
    */
  private[graft] def manifestDelta(
      state: ManifestState,
      batch: org.apache.spark.sql.DataFrame,
      batchEmb: org.apache.spark.sql.DataFrame): ManifestDelta = {
    import graft.functions.Vectors
    val bTrain = batch.filter(col("doc_id") % 50 =!= 0)
    val qualityB = verdictsFromSignals(signalsRelationOf(batch))
      .select(col("doc_id"), col("verdict").as("q_v"), col("n_tokens"))
    val bTrainSh8 = bTrain.select(col("doc_id"),
      explode(array_distinct(Text.shingles(col("text"), 8))).as("sh"))
    val bBenchSh8 = batch.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_id"),
        explode(array_distinct(Text.shingles(col("text"), 8))).as("sh"))
    val bChunks = chunkRelationOf(batch)
      .select(col("doc_id"), col("chunk_str"))
    val bTrainChunks = bChunks.filter(col("doc_id") % 50 =!= 0)
    // eval-chunk strings this batch INTRODUCES — the anti-join keeps
    // the stored/new sets disjoint, which is what makes the resident
    // n_shared update additive
    val newEvalStrs = bChunks.filter(col("doc_id") % 50 === 0)
      .select(col("chunk_str")).distinct()
      .join(state.evalChunks, Seq("chunk_str"), "left_anti")
    val bTrainEmb = batchEmb.filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val newEvalEmb = batchEmb.filter(col("vec_id") % 50 === 0 &&
        col("vec_id") < Similarity.ExactBaselineVecCap)
      .select(col("embedding").as("e_emb"))
    // resident deltas: stored index × broadcast batch side
    val dNg = state.trainSh8.join(broadcast(bBenchSh8), Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("bench_id")).as("d_nb"))
    // the one resident-cardinality probe of the append: when the
    // state carries its [[SemanticIndex]], the new eval vectors are
    // banded to their top-nprobe cells and the CELL-PARTITIONED
    // stored train vectors are read under dynamic partition pruning
    // (the q154 scan shape — ~nprobe/k of the resident bytes); at
    // nprobe = k the probe is exhaustive, so it equals the fallback
    // cross-join (every (train, new-eval) pair scored) bit-for-bit
    val dSem = state.semIndex match {
      case Some(ix) =>
        val probes = Similarity.probeCells(newEvalEmb, Seq("e_emb"),
          "e_emb", ix.codebook, ix.nprobe)
        ix.cells.join(broadcast(probes), Seq("cell"))
          .groupBy(col("vec_id"))
          .agg(max(round(Vectors.cosine(col("embedding"), col("e_emb")), 4))
            .as("d_mec"))
          .select(col("vec_id").as("doc_id"), col("d_mec"))
      case None =>
        state.trainEmb.crossJoin(broadcast(newEvalEmb))
          .groupBy(col("vec_id"))
          .agg(max(round(Vectors.cosine(col("embedding"), col("e_emb")), 4))
            .as("d_mec"))
          .select(col("vec_id").as("doc_id"), col("d_mec"))
    }
    val dCh = state.trainChunks
      .join(broadcast(newEvalStrs), Seq("chunk_str"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("d_sh"))
    // resident rows an append can CHANGE = those a delta probe hit
    // AND whose stored component actually moves. The distinction
    // matters for the semantic arm: dSem produces a row for EVERY
    // resident embedded doc whenever the batch carries any new eval
    // vector (the crossJoin has no threshold), but greatest() only
    // changes the stored value when the new max EXCEEDS it — keeping
    // the no-op rows would rewrite near-all resident embedded docs
    // per append (pure LWW churn breaking the delta-write-volume
    // contract). The ngram/chunk arms' delta rows always change the
    // row (counts only grow and a row implies count ≥ 1).
    val touched = dNg.select(col("doc_id"))
      .unionByName(dSem.select(col("doc_id")))
      .unionByName(dCh.select(col("doc_id"))).distinct()
    val contamChanged = state.contam
      .join(touched, Seq("doc_id"), "left_semi")
      .join(dNg, Seq("doc_id"), "left")
      .join(dSem, Seq("doc_id"), "left")
      .join(dCh, Seq("doc_id"), "left")
      .filter(col("d_nb").isNotNull || col("d_sh").isNotNull ||
        (col("d_mec").isNotNull &&
          (col("max_eval_cos").isNull ||
            col("d_mec") > col("max_eval_cos"))))
      .select(col("doc_id"),
        (col("n_bench_docs") + coalesce(col("d_nb"), lit(0L)))
          .as("n_bench_docs"),
        greatest(col("max_eval_cos"), col("d_mec")).as("max_eval_cos"),
        col("n_chunks"),
        // NULL-preserving: a doc with no chunks has NULL n_shared and
        // no dCh row — NULL + 0 stays NULL, matching the full build
        (col("n_shared") + coalesce(col("d_sh"), lit(0L))).as("n_shared"))
    // batch train docs: full arms against the UNION fixed sides
    // (batch-side broadcast where the side is delta-sized; the stored
    // bench postings join batch-train postings sh-keyed — both sides
    // partition by shingle, nothing corpus-cardinality shuffles)
    val ngB = state.benchSh8.unionByName(bBenchSh8)
      .join(broadcast(bTrainSh8), Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("bench_id")).as("nb"))
    val semB = bTrainEmb
      .crossJoin(broadcast(state.evalEmb.unionByName(newEvalEmb)))
      .groupBy(col("vec_id"))
      .agg(max(round(Vectors.cosine(col("embedding"), col("e_emb")), 4))
        .as("mec"))
      .select(col("vec_id").as("doc_id"), col("mec"))
    val evalUnion = state.evalChunks.unionByName(newEvalStrs)
    val chB = bTrainChunks
      .join(broadcast(evalUnion.withColumn("shared", lit(1))),
        Seq("chunk_str"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("shared"), lit(0))).as("n_shared"))
    val contamB = bTrain.select(col("doc_id"))
      .join(ngB, Seq("doc_id"), "left")
      .join(semB, Seq("doc_id"), "left")
      .join(chB, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bench_docs"),
        col("mec").as("max_eval_cos"),
        col("n_chunks"), col("n_shared"))
    ManifestDelta(qualityB, contamChanged, contamB,
      bTrainSh8, bBenchSh8, bTrainChunks, newEvalStrs,
      bTrainEmb, newEvalEmb)
  }

  private[graft] def advanceManifestState(
      state: ManifestState,
      batch: org.apache.spark.sql.DataFrame,
      batchEmb: org.apache.spark.sql.DataFrame): ManifestState = {
    val d = manifestDelta(state, batch, batchEmb)
    val contamUntouched = state.contam.join(
      d.contamChanged.select(col("doc_id")), Seq("doc_id"), "left_anti")
    ManifestState(
      quality = state.quality.unionByName(d.quality),
      // Spark 4.1's union output-partitioning propagation
      // (spark.sql.unionOutputPartitioning) plans a downstream doc_id
      // join directly over this union when BOTH children already end
      // hash-partitioned on doc_id (no exchange above the union),
      // then fails executing the join zipping the concatenated union
      // partitions against the other side ("Can't zip RDDs with
      // unequal numbers of partitions"). An explicit-N repartition
      // (bare repartition(col) gets elided by the same
      // satisfied-distribution claim) re-establishes one well-formed
      // hash partitioning — the exchange the doc-keyed joins need
      // anyway, so no extra cost.
      contam = contamUntouched.unionByName(d.contamChanged)
        .unionByName(d.contamBatch).repartition(
          batch.sparkSession.sessionState.conf.numShufflePartitions,
          col("doc_id")),
      trainSh8 = state.trainSh8.unionByName(d.trainSh8),
      benchSh8 = state.benchSh8.unionByName(d.benchSh8),
      trainChunks = state.trainChunks.unionByName(d.trainChunks),
      evalChunks = state.evalChunks.unionByName(d.evalChunks),
      trainEmb = state.trainEmb.unionByName(d.trainEmb),
      evalEmb = state.evalEmb.unionByName(d.evalEmb))
  }

  /** The manifest of a [[ManifestState]]: re-derive the contamination
    * verdicts from the maintained components, fold precedence against
    * the dedup / containment tables (in production: the two persisted
    * stores' resolved views), and re-derive packing. All doc-keyed.
    */
  private[graft] def manifestFrom(
      state: ManifestState,
      dedup: org.apache.spark.sql.DataFrame,
      contained: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = state.quality
      .filter(col("doc_id") % 50 =!= 0 &&
        col("doc_id") < TextOps.ExactBaselineDocCap)
    val cv = state.contam.select(col("doc_id"),
      when(col("n_bench_docs") >= 1, "ngram")
        .when(col("max_eval_cos") >= Similarity.SemDedupTau, "semantic")
        .when(col("n_shared") * 4 >= col("n_chunks"), "chunk")
        .otherwise("clean").as("c_v"))
    composeManifest(base, dedup, contained, cv)
  }

  /** q157's body: advance the resident state by the batch, then fold
    * the manifest from the advanced components and the two persisted
    * stores' views.
    */
  /** Materialize every relation of a [[ManifestState]] and cut its
    * lineage (eager localCheckpoint — the q155 delta-relation play).
    * The lazy [[advanceManifestState]] output is right for the
    * one-append read q157 declares (each relation is consumed once;
    * materializing would add a pass), but an in-session appender
    * looping MANY batches through the returned state would otherwise
    * pay a unionByName plan that deepens per append. Such loops must
    * pin each advanced state with this before the next append —
    * ManifestSpec drives ten appends and asserts the plan stays flat
    * — or use the persisted [[ManifestStore]], the production
    * multi-batch form, whose epochs bound lineage by construction.
    * The semantic probe index is dropped, not pinned: it describes
    * the PRE-append train side only (the store re-assigns its delta
    * under the stored codebook; an in-session loop falls back to the
    * exhaustive arm, which is exact).
    */
  private[graft] def pinManifestState(st: ManifestState): ManifestState =
    ManifestState(
      quality = st.quality.localCheckpoint(true),
      contam = st.contam.localCheckpoint(true),
      trainSh8 = st.trainSh8.localCheckpoint(true),
      benchSh8 = st.benchSh8.localCheckpoint(true),
      trainChunks = st.trainChunks.localCheckpoint(true),
      evalChunks = st.evalChunks.localCheckpoint(true),
      trainEmb = st.trainEmb.localCheckpoint(true),
      evalEmb = st.evalEmb.localCheckpoint(true))

  private[graft] def incrementalManifest(
      state: ManifestState,
      batch: org.apache.spark.sql.DataFrame,
      batchEmb: org.apache.spark.sql.DataFrame,
      dedup: org.apache.spark.sql.DataFrame,
      contained: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    manifestFrom(advanceManifestState(state, batch, batchEmb),
      dedup, contained)

  /** Persist / load a [[ManifestState]] as one parquet dir per
    * relation — the session-shared stage's storage shape. The
    * train-embedding side is stored CELL-PARTITIONED under a
    * k-means codebook trained here (written beside it), so the
    * loaded state carries a [[SemanticIndex]] and
    * [[manifestDelta]]'s semantic arm probes instead of scanning.
    */
  private[graft] def writeManifestState(st: ManifestState,
                                        path: String): Unit = {
    st.relations.foreach {
      case ("trainemb", df) =>
        val cb = semCodebookOf(df)
        if (cb.isEmpty) {
          // a rewrite of a previously-indexed path must not leave the
          // old sidecar behind: readManifestState keys the semantic
          // index off the sidecar's presence, and a stale codebook
          // over a freshly-written UNPARTITIONED trainemb would fail
          // the loaded state's first probe (no `cell` column)
          graft.engine.Archive.deleteTree(
            java.nio.file.Paths.get(path, "semcodebook"))
          df.write.mode("overwrite").parquet(s"$path/trainemb")
        } else {
          import df.sparkSession.implicits._
          assignSemCells(df, cb).write.mode("overwrite")
            .partitionBy("cell").parquet(s"$path/trainemb")
          cb.toDF("c_id", "c_emb").coalesce(1)
            .write.mode("overwrite").parquet(s"$path/semcodebook")
        }
      case (n, df) =>
        df.write.mode("overwrite").parquet(s"$path/$n")
    }
  }

  private[graft] def readManifestState(
      spark: org.apache.spark.sql.SparkSession,
      path: String): ManifestState = {
    def r(n: String) = spark.read.parquet(s"$path/$n")
    val cbDir = java.nio.file.Paths.get(path, "semcodebook")
    val semIx =
      if (!java.nio.file.Files.isDirectory(cbDir)) None
      else {
        // bounded model state: k ≤ IvfCells codebook rows (the
        // loadCodebook/kmeans-centers collect pattern)
        val cb = r("semcodebook").collect()
          .map(row => row.getInt(0) -> row.getSeq[Double](1))
          .sortBy(_._1).toSeq
        Some(SemanticIndex(
          r("trainemb").select(col("cell"), col("vec_id"), col("embedding")),
          cb, nprobe = Similarity.IvfCells))
      }
    ManifestState(r("quality"), r("contam"), r("trainsh8"), r("benchsh8"),
      r("trainchunks"), r("evalchunks"),
      r("trainemb").select(col("vec_id"), col("embedding")), r("evalemb"),
      semIndex = semIx)
  }

  /** q139's oracle — and q159's VERBATIM (the q152 oracle-sharing
    * play): the store-served filter reconstructs the identical
    * per-language rank, so both queries hash-verify against the one
    * from-scratch SQL.
    */
  private val CalibratedQualitySql: String = raw"""WITH tok AS (
          SELECT doc_id, lang,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents),
        scored AS (
          SELECT doc_id, lang,
            ROUND(CAST(SUM(CAST(
              CAST(('0x' || substr(md5(token), 1, 8))::BIGINT % 1024
                * 2654435761 % 1000003 AS DOUBLE) / 1000003.0 - 0.5
              AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS score
          FROM tok GROUP BY doc_id, lang),
        ranked AS (
          SELECT doc_id, lang, score,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY score DESC, doc_id) AS lang_rank,
            COUNT(*) OVER (PARTITION BY lang) AS n_lang
          FROM scored)
        SELECT doc_id, lang, score, CAST(lang_rank AS INT) AS lang_rank,
          CAST(lang_rank * 5 <= n_lang * 4 + 4 AS INT) AS keep
        FROM ranked ORDER BY doc_id"""

  /** The q145 contamination CTE chain (everything through `ch`) —
    * shared verbatim by the q145 oracle and q146's manifest oracle.
    */
  private def contaminationCtes: String =
    s"$ChunkCtes, $ChunkTextCte, " +
      raw"""sh8 AS (
        SELECT doc_id, unnest(list_distinct(
          CASE WHEN len(string_split_regex(lower(trim(text)), '\s+')) >= 8
            THEN list_transform(
              range(1, len(string_split_regex(lower(trim(text)), '\s+')) - 6),
              i -> array_to_string(string_split_regex(lower(trim(text)), '\s+')[i:i+7], ' '))
            ELSE [] END)) AS sh
        FROM documents),
      ng AS (
        SELECT c.doc_id, COUNT(DISTINCT b.doc_id) AS n_bench_docs
        FROM (SELECT * FROM sh8 WHERE doc_id % 50 <> 0) c
        JOIN (SELECT * FROM sh8 WHERE doc_id % 50 = 0) b USING (sh)
        GROUP BY c.doc_id),
      ev AS (
        SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE vec_id % 50 = 0 AND vec_id < ${Similarity.ExactBaselineVecCap}),
      sem AS (
        SELECT tr.vec_id AS doc_id,
          MAX(ROUND(list_dot_product(tr.t, ev.e)
            / (sqrt(list_dot_product(tr.t, tr.t))
             * sqrt(list_dot_product(ev.e, ev.e))), 4)) AS max_eval_cos
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS t
              FROM embeddings WHERE vec_id % 50 <> 0) tr, ev
        GROUP BY tr.vec_id),
      evch AS (SELECT DISTINCT chunk_str FROM ctext WHERE doc_id % 50 = 0),
      ch AS (
        SELECT t.doc_id, COUNT(*) AS n_chunks,
          SUM(CASE WHEN evch.chunk_str IS NOT NULL THEN 1 ELSE 0 END) AS n_shared
        FROM (SELECT * FROM ctext WHERE doc_id % 50 <> 0) t
        LEFT JOIN evch ON t.chunk_str = evch.chunk_str
        GROUP BY t.doc_id),
      contv AS (
        SELECT b.doc_id,
          CASE WHEN ng.n_bench_docs >= 1 THEN 'ngram'
               WHEN sem.max_eval_cos >= ${Similarity.SemDedupTau} THEN 'semantic'
               WHEN ch.n_shared * 4 >= ch.n_chunks THEN 'chunk'
               ELSE 'clean' END AS verdict,
          CAST(COALESCE(ng.n_bench_docs, 0) AS BIGINT) AS n_bench_docs,
          sem.max_eval_cos,
          ROUND(CAST(ch.n_shared AS DOUBLE) / ch.n_chunks, 4)
            AS chunk_shared_frac
        FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) b
        LEFT JOIN ng ON b.doc_id = ng.doc_id
        LEFT JOIN sem ON b.doc_id = sem.doc_id
        LEFT JOIN ch ON b.doc_id = ch.doc_id)"""

  private def ContaminationOracleSql: String =
    s"""WITH $contaminationCtes
      SELECT doc_id, verdict, n_bench_docs, max_eval_cos,
        chunk_shared_frac
      FROM contv ORDER BY doc_id"""

  /** The q146 oracle: the full chain — contamination CTEs (above) +
    * the q133 quality verdicts rebuilt off the shared `toks` CTE +
    * q100's recursive exact→near dedup machinery + keep-only packing.
    */
  private def manifestOracleSql: String =
    s"""WITH RECURSIVE $contaminationCtes,
      uni2 AS (
        SELECT doc_id, MAX(c) AS topc FROM (
          SELECT doc_id, t, COUNT(*) AS c
          FROM toks, UNNEST(tk) AS u(t) GROUP BY doc_id, t)
        GROUP BY doc_id),
      bi2 AS (
        SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_pos,
          SUM(c) AS n
        FROM (
          SELECT doc_id, g, COUNT(*) AS c FROM (
            SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
            FROM toks, UNNEST(range(1, len(tk))) AS r(i)) GROUP BY doc_id, g)
        GROUP BY doc_id),
      sigq AS (
        SELECT t.doc_id, len(t.tk) AS n_tokens,
          CAST(${stopCountSql("t.tk")}
            AS DOUBLE) / len(t.tk) AS stop_ratio,
          CAST(uni2.topc AS DOUBLE) / len(t.tk) AS uni_frac,
          CAST(bi2.dup_pos AS DOUBLE) / bi2.n AS dup_frac
        FROM toks t JOIN documents d ON t.doc_id = d.doc_id
        JOIN uni2 ON t.doc_id = uni2.doc_id
        LEFT JOIN bi2 ON t.doc_id = bi2.doc_id),
      qv AS (
        SELECT doc_id, n_tokens,
          CASE WHEN n_tokens < $MinTokens THEN 'too_short'
               WHEN stop_ratio < $MinStopwordRatio THEN 'low_stopword'
               WHEN uni_frac > $MaxTopUnigramFrac THEN 'high_top_unigram'
               WHEN dup_frac > $MaxDupBigramFrac THEN 'high_dup_bigram'
               ELSE 'keep' END AS verdict
        FROM sigq),
      capped AS (
        SELECT * FROM documents WHERE doc_id < ${TextOps.ExactBaselineDocCap}),
      keyed AS (SELECT doc_id, sha256(text) AS k FROM capped),
      exact AS (SELECT k, MIN(doc_id) AS exact_canon FROM keyed GROUP BY k),
      tagged AS (
        SELECT keyed.doc_id, exact.exact_canon
        FROM keyed JOIN exact USING (k)),
      surv AS (SELECT doc_id FROM tagged WHERE doc_id = exact_canon),
      ddocs AS (
        SELECT c.doc_id, c.lang, CAST(FLOOR(c.n_chars / 64) AS BIGINT) AS bucket,
          list_distinct(CASE WHEN len(string_split_regex(lower(trim(c.text)), '\\s+')) >= 3
            THEN list_transform(
              range(1, len(string_split_regex(lower(trim(c.text)), '\\s+')) - 1),
              i -> array_to_string(string_split_regex(lower(trim(c.text)), '\\s+')[i:i+2], ' '))
            ELSE [] END) AS sh
        FROM capped c SEMI JOIN surv ON c.doc_id = surv.doc_id),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ddocs a JOIN ddocs b
          ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2),
      edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
      walk AS (
        SELECT a AS id, a AS reach FROM edges
        UNION
        SELECT w.id, e.b AS reach FROM walk w JOIN edges e ON e.a = w.reach),
      comp AS (SELECT id AS doc_id, MIN(reach) AS near_canon
               FROM walk GROUP BY id),
      dv AS (
        SELECT t.doc_id,
          CASE WHEN t.doc_id <> t.exact_canon THEN 'exact'
               WHEN c.near_canon IS NOT NULL AND t.doc_id <> c.near_canon
                 THEN 'near'
               ELSE 'keep' END AS verdict
        FROM tagged t LEFT JOIN comp c USING (doc_id)),
      ${NearDupOps.containmentScoredCtes},
      cedges AS (
        SELECT doc_a AS a, doc_b AS b FROM cpairs
        UNION ALL SELECT doc_b, doc_a FROM cpairs),
      cwalk AS (
        SELECT a AS id, a AS reach FROM cedges
        UNION
        SELECT w.id, e.b AS reach FROM cwalk w JOIN cedges e ON e.a = w.reach),
      ccomp AS (SELECT id AS doc_id, MIN(reach) AS cl FROM cwalk GROUP BY id),
      csz AS (
        SELECT DISTINCT doc_id, n FROM (
          SELECT doc_a AS doc_id, n_a AS n FROM cpairs
          UNION ALL SELECT doc_b, n_b FROM cpairs)),
      cranked AS (
        SELECT c.doc_id, c.cl,
          ROW_NUMBER() OVER (PARTITION BY c.cl
            ORDER BY s.n DESC, c.doc_id ASC) AS rk
        FROM ccomp c JOIN csz s ON s.doc_id = c.doc_id),
      ctdrop AS (SELECT doc_id FROM cranked WHERE rk > 1),
      mbase AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 50 <> 0 AND doc_id < ${TextOps.ExactBaselineDocCap}),
      mrow AS (
        SELECT b.doc_id, CAST(qv.n_tokens AS INT) AS n_tokens,
          CASE WHEN qv.verdict <> 'keep' THEN 'drop_quality'
               WHEN COALESCE(dv.verdict, 'keep') <> 'keep'
                 THEN 'drop_duplicate'
               WHEN ctd.doc_id IS NOT NULL THEN 'drop_duplicate'
               WHEN COALESCE(contv.verdict, 'clean') <> 'clean'
                 THEN 'drop_contaminated'
               ELSE 'keep' END AS decision,
          CASE WHEN qv.verdict <> 'keep' THEN qv.verdict
               WHEN COALESCE(dv.verdict, 'keep') <> 'keep' THEN dv.verdict
               WHEN ctd.doc_id IS NOT NULL THEN 'contained'
               WHEN COALESCE(contv.verdict, 'clean') <> 'clean'
                 THEN contv.verdict
               ELSE 'keep' END AS reason
        FROM mbase b
        JOIN qv ON b.doc_id = qv.doc_id
        LEFT JOIN dv ON b.doc_id = dv.doc_id
        LEFT JOIN ctdrop ctd ON b.doc_id = ctd.doc_id
        LEFT JOIN contv ON b.doc_id = contv.doc_id),
      packs AS (
        SELECT doc_id,
          CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_tok
        FROM mrow WHERE decision = 'keep')
      SELECT m.doc_id, m.decision, m.reason, m.n_tokens,
        p.start_tok,
        CAST(p.start_tok // ${TrainingOps.PackWindow} AS BIGINT) AS pack_id,
        CAST(p.start_tok % ${TrainingOps.PackWindow} AS BIGINT)
          AS offset_in_pack
      FROM mrow m LEFT JOIN packs p ON m.doc_id = p.doc_id
      ORDER BY m.doc_id"""

  /** The chunk relation of a documents frame: one (doc_id, chunk_id,
    * chunk_str) row per content-defined chunk. The unit of the
    * persisted [[ChunkIndex]] and of the q137/q138 shared stage.
    */
  private[graft] def chunkRelationOf(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      posexplode(transform(cdcChunks(col("text")), _.getField("chunk_str")))
        .as(Seq("chunk_id", "chunk_str")))

  /** The HOF formulation of [[chunkRelationOf]], kept as the
    * executable reference the native [[graft.expressions.CdcChunks]]
    * kernel is spec-pinned against.
    */
  private[graft] def chunkRelationHof(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    chunkStarts(docs).select(col("doc_id"),
      posexplode(chunkStrings(col("tk"), col("starts")))
        .as(Seq("chunk_id", "chunk_str")))

  /** Native content-defined chunker column (one MD5 + one boundary
    * pass per doc inside codegen — see [[graft.expressions.CdcChunks]]).
    */
  private def cdcChunks(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.CdcChunks(
      ColumnBridge.expression(text)))
  }

  /** md5-derived word value in [0, 1021) — q75's portable md5→int. */
  private def wordVal(w: Column): Column =
    pmod(conv(substring(md5(w), 1, 6), 16, 10).cast("long"), lit(1021L))

  /** Chunk START indices (1-based): position 1 plus every i >= 3
    * where the rolling hash of words (i-2, i-1, i) ≡ 0 mod 16.
    */
  private def chunkStarts(docs: org.apache.spark.sql.DataFrame) = {
    val tk = Text.tokens(col("text"))
    docs.select(col("doc_id"), tk.as("tk"))
      .withColumn("vals", transform(col("tk"), w => wordVal(w)))
      // The i >= 3 conjunct guards the window; greatest() keeps the
      // probe indices legal (element_at is 1-based and ANSI-throws at
      // 0) on sub-window docs where the conjunct is already false.
      .withColumn("starts",
        concat(array(lit(1)),
          filter(sequence(lit(1), size(col("tk"))),
            i => i >= 3 &&
              (element_at(col("vals"), greatest(i - 2, lit(1))) * 961L
                + element_at(col("vals"), greatest(i - 1, lit(1))) * 31L
                + element_at(col("vals"), i)) % 16 === 0)))
      .drop("vals")
  }

  /** Word counts per chunk, from the starts array. */
  private def chunkSizes(tk: Column, starts: Column): Column =
    transform(sequence(lit(1), size(starts)),
      j => when(j < size(starts),
          element_at(starts, j + 1) - element_at(starts, j))
        .otherwise(size(tk) + 1 - element_at(starts, j)))

  /** The chunk substrings themselves (space-joined token runs). */
  private def chunkStrings(tk: Column, starts: Column): Column =
    transform(sequence(lit(1), size(starts)),
      j => array_join(
        slice(tk, element_at(starts, j),
          when(j < size(starts),
            element_at(starts, j + 1) - element_at(starts, j))
          .otherwise(size(tk) + 1 - element_at(starts, j))), " "))

  /** Shared DuckDB CTE chain mirroring chunkStarts via lag windows —
    * also the documented megadoc swap shape for the Spark side.
    */
  private val ChunkCtes: String =
    raw"""toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
      FROM documents),
    vals AS (
      SELECT doc_id, i, ('0x' || substr(md5(tk[i]), 1, 6))::BIGINT % 1021 AS v
      FROM toks, UNNEST(range(1, len(tk)+1)) AS r(i)),
    marks AS (
      SELECT doc_id, i,
        CASE WHEN i >= 3 AND
          (LAG(v, 2) OVER w * 961 + LAG(v, 1) OVER w * 31 + v) % 16 = 0
          THEN 1 ELSE 0 END AS boundary
      FROM vals WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
    chunks AS (
      SELECT doc_id, i,
        SUM(boundary) OVER (PARTITION BY doc_id ORDER BY i) AS chunk_id
      FROM marks),
    chunk_sizes AS (
      SELECT doc_id, chunk_id, COUNT(*) AS n_words
      FROM chunks GROUP BY doc_id, chunk_id)"""

  /** Chunk text + corpus frequency CTEs (append after [[ChunkCtes]]). */
  private val ChunkTextCte: String =
    raw"""ctext AS (
      SELECT c.doc_id, c.chunk_id, string_agg(t.tok, ' ' ORDER BY c.i) AS chunk_str
      FROM chunks c JOIN (
        SELECT doc_id, i, tk[i] AS tok
        FROM toks, UNNEST(range(1, len(tk)+1)) AS r(i)) t
        ON c.doc_id = t.doc_id AND c.i = t.i
      GROUP BY c.doc_id, c.chunk_id),
    freq AS (SELECT chunk_str, COUNT(*) AS n_copies FROM ctext GROUP BY chunk_str)"""
}
