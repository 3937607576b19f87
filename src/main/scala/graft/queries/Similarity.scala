package graft.queries

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
        val cent = emb.groupBy(col("label"))
          .agg(
            Vectors.vecDecimalSum(Vectors.asDouble(col("embedding"))).as("sums"),
            count(lit(1)).as("n"))
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

    // -- LSH ANN: hyperplane sign-bucket as the equi-join key. The
    //    scale path for similarity joins: candidates meet only inside
    //    a bucket (shuffle on bucket id), never via cross join.
    //    Engine-specific hashing → rows-only oracle; recall vs the
    //    brute-force baseline is asserted in SimilaritySpec.
    Q("q63_ann_lsh",
      (s, d) => {
        val emb = t(s, d).embeddings
          .select(col("vec_id"), col("label"), col("embedding"),
            Vectors.hyperplaneBucket(col("embedding"), nBits = 8).as("bucket"))
        val q = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
            col("bucket").as("q_bucket"))
        val scored = emb.join(broadcast(q),
            col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            Vectors.cosine(col("q_emb"), col("embedding")).as("score"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .orderBy(col("query_id"), col("rk"))
      },
      None,
      "hyperplane-LSH bucketed ANN (rows-only oracle; recall in spec)"),

    // -- IVF ANN, step 2: assign every vector to its nearest
    //    centroid, then search only within the probe's cell. Centroids
    //    here are per-label means (a stand-in for k-means — same
    //    operator shape). The whole k×dim codebook is collected into
    //    ONE broadcast row (k is small by construction), so assignment
    //    is a map-side `array_max` argmax projection — zero shuffle
    //    per vector, the only scale-correct way to run IVF assignment
    //    over 100 TB of vectors.
    Q("q64_ann_ivf",
      (s, d) => {
        val emb = t(s, d).embeddings
        val codebook = emb
          .select(col("label").as("c_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("c_id"), col("pos"))
          .agg(avg(col("v")).as("m"))
          .groupBy(col("c_id"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m")).as("c_emb"))
          .agg(collect_list(struct(col("c_id"), col("c_emb"))).as("cents"))
        // nearest centroid per vector: broadcast 1-row codebook +
        // argmax over the centroid array in a single projection.
        val assigned = emb.crossJoin(broadcast(codebook))
          .select(col("vec_id"), col("label"), col("embedding"),
            array_max(transform(col("cents"),
              c => struct(Vectors.cosine(col("embedding"), c.getField("c_emb")).as("s"),
                c.getField("c_id").as("c_id"))))
              .getField("c_id").as("cell"))
        val q = assigned.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
            col("cell").as("q_cell"))
        val scored = assigned.join(broadcast(q),
            col("cell") === col("q_cell") && col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            Vectors.cosine(col("q_emb"), col("embedding")).as("score"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .orderBy(col("query_id"), col("rk"))
      },
      None,
      "IVF-cell ANN: nearest-centroid assignment + in-cell search")
  )
}
