package graft.queries

import org.apache.spark.sql.functions._

import QU._
import graft.functions.Text

/** Deterministic sampling and chunking operators over the
  * `documents` table (SURVEY §2.9), split out of TextOps along its
  * family seam: md5-bucket stratified/weighted/quota sampling and
  * overlapping token-window chunking — the corpus-shaping steps a
  * training-data pipeline runs after quality/dedup.
  */
object SampleOps {

  lazy val queries: Seq[Q] = Seq(


    // -- stratified sampling for training-data mixing: per-language
    //    rates (50% en, 20% others) via DETERMINISTIC md5-bucket
    //    assignment — bucket = first 4 hex digits of md5(doc_id) mod
    //    100, identical in any engine computing standard MD5 and
    //    stable under repartitioning. `sample()`/`rand(seed)` are NOT
    //    reproducible across partitionings, which silently changes
    //    the training set between runs; hash-assignment is, and it
    //    keeps every decision a map-side projection.
    Q("q75_stratified_sample",
      (s, d) => {
        val bucket = pmod(
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("int"), lit(100))
        t(s, d).documents
          .select(col("doc_id"), col("lang"), bucket.as("bucket"))
          .filter(col("bucket") <
            when(col("lang") === "en", 50).otherwise(20))
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100 AS bucket
          FROM documents) t
        WHERE bucket < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
        ORDER BY doc_id"""),
      "deterministic md5-bucket stratified sample (per-language rates)"),

    // -- quality-WEIGHTED resampling: keep-probability proportional
    //    to a per-doc quality score (here: lexical diversity =
    //    distinct/total tokens), decided by comparing the score
    //    against a deterministic per-doc md5 uniform — the importance
    //    resampling step of modern pretraining-data pipelines, with
    //    q75's repartition-stable hash in place of rand(seed). Both
    //    engines derive the identical 4-hex-digit integer and the
    //    identical int/int double, so the keep decision hash-matches.
    Q("q81_weighted_sample",
      (s, d) => {
        val toks = Text.tokens(col("text"))
        val score = size(array_distinct(toks)).cast("double") / size(toks)
        val u = pmod(
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("int"), lit(10000)).cast("double") / 10000.0
        t(s, d).documents
          .select(col("doc_id"), score.as("score"), u.as("u"))
          .filter(col("u") < col("score"))
          .select(col("doc_id"), col("score"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, score FROM (
          SELECT doc_id,
            CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS DOUBLE)
              / len(string_split_regex(lower(trim(text)), '\s+')) AS score,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 10000 AS DOUBLE)
              / 10000.0 AS u
          FROM documents) t
        WHERE u < score ORDER BY doc_id"""),
      "quality-weighted deterministic resampling (keep-prob = lexical diversity)"),

    // -- exact QUOTA sampling: exactly N docs per stratum in the
    //    deterministic md5 order (doc_id tiebreak) — the eval-set
    //    carving step where rate-based sampling (q75) can't promise
    //    exact counts. The window is PARTITIONED by stratum, so
    //    strata rank in parallel; no global sort exists (final
    //    orderBy is the bounded output's presentation order).
    Q("q96_quota_sample",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        t(s, d).documents.select(col("doc_id"), col("lang"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 20)
          .orderBy(col("lang"), col("rk"))
      },
      Some("""SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM (
          SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents) t
        WHERE rk <= 20 ORDER BY lang, rk"""),
      "exact per-stratum quota sample in deterministic md5 order"),

    // -- overlapping token-window chunking: split each document into
    //    size-32 windows at stride 24 (8-token overlap) — the
    //    context-window prep step every LLM training pipeline runs
    //    before tokenization. Pure map-side generate (chunk starts =
    //    sequence(0, n−1, stride), slice per start, explode); trailing
    //    partial windows kept. Output bounded to doc_id < 100.
    Q("q76_token_chunks",
      (s, d) => {
        val size32 = 32
        val stride = 24
        val toks = Text.tokens(col("text"))
        val n = size(toks)
        t(s, d).documents
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), toks.as("toks"), n.as("n"))
          .filter(col("n") > 0)
          .select(col("doc_id"), col("n"),
            explode(transform(
              sequence(lit(0), col("n") - 1, lit(stride)),
              st => struct((st / stride).cast("int").as("chunk_idx"),
                array_join(slice(col("toks"), st + 1, lit(size32)), " ")
                  .as("chunk_text"),
                least(lit(size32), col("n") - st).as("n_chunk_tokens"))))
              .as("c"))
          .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
            col("c.n_chunk_tokens").as("n_chunk_tokens"),
            col("c.chunk_text").as("chunk_text"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH t AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
          FROM documents WHERE doc_id < 100),
        sized AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
        starts AS (
          SELECT doc_id, toks, n, unnest(range(0, n, 24)) AS st FROM sized),
        chunks AS (
          SELECT doc_id,
            CAST(st / 24 AS INT) AS chunk_idx,
            CAST(LEAST(32, n - st) AS INT) AS n_chunk_tokens,
            array_to_string(toks[st + 1 : st + 32], ' ') AS chunk_text
          FROM starts)
        SELECT doc_id, chunk_idx, n_chunk_tokens, chunk_text
        FROM chunks ORDER BY doc_id, chunk_idx"""),
      "overlapping token-window chunking (size 32, stride 24)"),
  )
}
