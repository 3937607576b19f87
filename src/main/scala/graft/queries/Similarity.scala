package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QU._
import graft.functions.Vectors

/** Similarity search over the `embeddings` table (SURVEY §2.9):
  * brute-force cosine top-k as the exact baseline, plus the two
  * scale paths — random-hyperplane LSH bucketing and an IVF-style
  * coarse quantizer — that replace the cross join with equi-joins.
  *
  * Scoring is `zip_with`+`aggregate` in double precision, index
  * order (graft.functions.Vectors) — bit-identical to the oracle's
  * sequential list accumulation, so scores hash-match without
  * rounding fudge.
  */
object Similarity {

  val queries: Seq[Q] = Seq(

    // -- exact top-k: the small query set is broadcast, so the
    //    "cross join" is a map-side nested loop over candidates —
    //    no shuffle until the per-query top-k window.
    Q("q60_knn_brute_force",
      (s, d) => {
        val emb = t(s, d).embeddings
        val q = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        val scored = emb.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            Vectors.cosine(col("q_emb"), col("embedding")).as("score"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("query_id"), col("neighbor_id"), col("score"),
            col("rk").as("rk"))
          .orderBy(col("query_id"), col("rk"))
      },
      Some("""WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
          WHERE vec_id % 100 = 0),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
            list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS score
          FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        ranked AS (
          SELECT query_id, neighbor_id, score,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS rk
          FROM scored)
        SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
        FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""),
      "brute-force cosine top-5 per query"),

    // -- vector stats: L2 norms aggregated per label (array math +
    //    deterministic decimal-sum average).
    Q("q61_embedding_norms",
      (s, d) => t(s, d).embeddings
        .select(col("label"), Vectors.norm(col("embedding")).as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), davg(col("nrm")).as("avg_norm"),
          min(col("nrm")).as("min_norm"), max(col("nrm")).as("max_norm"))
        .orderBy(col("label")),
      Some(s"""WITH norms AS (
          SELECT label,
            sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
          FROM embeddings)
        SELECT label, COUNT(*) AS n, ${sqlDavg("nrm")} AS avg_norm,
          MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
        FROM norms GROUP BY label ORDER BY label"""),
      "per-label norm statistics"),

    // -- IVF coarse quantizer, step 1: per-label centroids via ONE
    //    element-wise decimal-sum aggregate (Vectors.vecDecimalSum).
    //    No posexplode: exploding multiplies rows by dim (×64) before
    //    aggregation — at 100 TB of vectors that's 64× the hash-agg
    //    probe work. The typed aggregator folds whole arrays with
    //    map-side partial merge, so the shuffle carries one k×dim
    //    decimal buffer per task, and determinism is preserved
    //    (per-element DECIMAL(38,6) sums are order-independent;
    //    norm is the same index-ordered double fold as before).
    Q("q62_centroids",
      (s, d) => {
        val emb = t(s, d).embeddings
        // Precondition (holds for the fixture; guarded by the specs):
        // uniform-dimension, finite, non-null embeddings. The oracle
        // divides per-component by a hardcoded 64-dim non-null count;
        // this side divides by the non-null row count — equivalent
        // exactly under that precondition (ragged or NaN-bearing
        // groups would diverge).
        val cent = emb.groupBy(col("label"))
          .agg(
            Vectors.vecDecimalSum(Vectors.asDouble(col("embedding"))).as("sums"),
            count(col("embedding")).as("n"))
          .select(col("label"),
            transform(col("sums"), x => x / col("n")).as("c_emb"))
        cent.select(col("label"),
            sqrt(Vectors.dot(col("c_emb"), col("c_emb"))).as("centroid_norm"))
          .orderBy(col("label"))
      },
      Some("""WITH comp AS (
          SELECT label, i,
            CAST(SUM(CAST(embedding[i + 1] AS DECIMAL(38,6))) AS DOUBLE)
              / COUNT(embedding[i + 1]) AS m
          FROM embeddings, (SELECT unnest(range(0, 64)) AS i)
          GROUP BY label, i),
        cent AS (
          SELECT label, list(m ORDER BY i) AS c_emb FROM comp GROUP BY label)
        SELECT label, sqrt(list_dot_product(c_emb, c_emb)) AS centroid_norm
        FROM cent ORDER BY label"""),
      "IVF centroids via positional explode + aggregate"),

    // -- LSH ANN, multi-table: L independent hyperplane tables (seed =
    //    exploded table index), candidates = vectors sharing (table,
    //    bucket) with the query in ANY table, deduped, then exact-
    //    scored and top-k'd. One table at useful precision has low
    //    recall by construction (P[all bits agree]^1); the union over
    //    L decorrelated tables is the standard recall amplifier —
    //    measured 1.0 vs exact top-5 at sf0.01 (SimilaritySpec).
    //    Scale shape: explode ×L on ids+bucket only (16-byte rows),
    //    equi-join per (table, bucket), never a cross join; candidate
    //    scoring joins embeddings back by id. On this near-random toy
    //    corpus candidates are a large fraction of n — with clustered
    //    real embeddings the same plan prunes aggressively (raise
    //    nBits with corpus density).
    Q("q63_ann_lsh",
      (s, d) => {
        val emb = t(s, d).embeddings
        val L = 12
        val banded = emb.select(col("vec_id"),
          posexplode(Vectors.hyperplaneBuckets(col("embedding"), nBits = 3,
            tables = L)).as(Seq("tbl", "b")))
        val q = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        // bucket the ~1% query subset directly — joining the full
        // banded table would recompute the whole corpus bucketing a
        // second time just to look up a handful of rows
        val qb = q.select(col("query_id"),
          posexplode(Vectors.hyperplaneBuckets(col("q_emb"), nBits = 3,
            tables = L)).as(Seq("tbl", "b")))
        val cands = banded.join(broadcast(qb), Seq("tbl", "b"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id")).distinct()
        val scored = cands
          .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
          .join(broadcast(q), Seq("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            Vectors.cosine(col("q_emb"), col("embedding")).as("score"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .orderBy(col("query_id"), col("rk"))
      },
      None,
      "multi-table hyperplane-LSH ANN (rows-only oracle; recall in spec)"),

    // -- embedding-cosine near-dup, EXACT baseline: every pair with
    //    cosine ≥ 0.45 over all vec_id-ordered pairs. Quadratic by
    //    definition (this is the ground truth the bucketed paths are
    //    measured against — same role as q54 for text); per-pair cost
    //    is one fused native kernel (CosineSim), and the n² pair space
    //    is the documented reason q63/q64's banded equi-joins are the
    //    100 TB path.
    Q("q65_embedding_neardup",
      (s, d) => {
        val emb = t(s, d).embeddings
        emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
          .crossJoin(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")))
          .filter(col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b"),
            Vectors.cosine(col("emb_a"), col("emb_b")).as("cos"))
          .filter(col("cos") >= 0.45)
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some("""WITH scored AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
            list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cos
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        SELECT vec_a, vec_b, cos FROM scored WHERE cos >= 0.45
        ORDER BY vec_a, vec_b"""),
      "exact embedding-cosine near-dup pairs"),

    // -- IVF ANN, step 2: assign every vector to its nearest centroid
    //    (map-side argmax over a ONE-row broadcast codebook — zero
    //    shuffle per vector, the only scale-correct IVF assignment
    //    over 100 TB of vectors), then MULTI-PROBE search: each query
    //    scans its top-`nprobe` cells by centroid similarity, not just
    //    its own cell. Single-cell search caps recall at how well the
    //    quantizer matches neighbor structure; probing 7 of the 10 toy
    //    cells reaches 0.88 with the per-label seed codebook and 0.96
    //    after two Lloyd rounds (SimilaritySpec measures both). At
    //    production scale k ≫ 10 cells and nprobe/k is a small
    //    fraction — the plan shape (probe-cell equi-join) is the same.
    //
    //    The codebook is a real (spherical) k-means: per-label means
    //    seed it, then `LloydIters` fixed Lloyd rounds refine it —
    //    each round is the SAME two scale-correct pieces the search
    //    uses (broadcast-argmax assignment + one element-wise
    //    vecDecimalSum re-centering pass), so the quantizer costs
    //    (LloydIters+1) linear scans, never a rows×dim explode.
    //    Decimal accumulation keeps every centroid (and therefore the
    //    cell partition and probe ranking) identical run-to-run.
    Q("q64_ann_ivf", (s, d) => ivfAnn(s, d),
      None,
      "IVF multi-probe ANN: k-means broadcast-codebook assignment + top-nprobe cell search")
  )

  /** The q64 plan, parameterized so SimilaritySpec can measure the
    * Lloyd refinement's recall gain over the per-label seed
    * (`lloydIters = 0` is the round-2 stand-in quantizer; measured
    * recall at nprobe=7, sf0.01: 0.88 seed → 0.92 after one round →
    * 0.96 after two, flat thereafter — and the extra rounds are
    * wall-time-free at bench scale because each is one linear
    * broadcast-argmax pass, so the declared query uses 2).
    */
  def ivfAnn(s: org.apache.spark.sql.SparkSession, d: String,
             lloydIters: Int = 2, nprobe: Int = 7): DataFrame = {
    val emb = t(s, d).embeddings
    // Fixed, deterministic iteration count. Each codebook is ONE
    // row (k × dim doubles) and is persisted: it feeds the next
    // Lloyd round AND (for the final one) both the assignment and
    // the probe-cell ranking — without persist the whole centroid
    // chain re-runs per consumer.
    //
    // Element-wise decimal-sum means per cell key — the q62
    // centroid shape (shuffle = k×dim partials per task), NOT the
    // rows×dim posexplode.
    def means(df: DataFrame, key: Column) = df
      .groupBy(key.as("c_id"))
      .agg(
        Vectors.vecDecimalSum(Vectors.asDouble(col("embedding"))).as("sums"),
        count(col("embedding")).as("n"))
      .select(col("c_id"),
        transform(col("sums"), x => x / col("n")).as("c_emb"))
      .agg(collect_list(struct(col("c_id"), col("c_emb"))).as("cents"))
      .persist()
    // Map-side nearest-centroid argmax against the broadcast
    // codebook (ties break to the larger c_id, deterministically).
    def assign(codebook: DataFrame) =
      emb.crossJoin(broadcast(codebook))
        .select(col("vec_id"), col("embedding"),
          array_max(transform(col("cents"),
            c => struct(Vectors.cosine(col("embedding"), c.getField("c_emb")).as("s"),
              c.getField("c_id").as("c_id"))))
            .getField("c_id").as("cell"))
    var codebook = means(emb, col("label"))
    for (_ <- 1 to lloydIters)
      codebook = means(assign(codebook), col("cell"))
    val assigned = assign(codebook)
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val probeCells = q.crossJoin(broadcast(codebook))
      .select(col("query_id"), col("q_emb"), explode(col("cents")).as("c"))
      .select(col("query_id"), col("c.c_id").as("cell"),
        Vectors.cosine(col("q_emb"), col("c.c_emb")).as("cs"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cs").desc, col("cell"))
    val topCells = probeCells.withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("cell"))
    val scored = assigned.join(broadcast(topCells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosine(col("q_emb"), col("embedding")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy(col("query_id"), col("rk"))
  }
}
