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

  /** q63's measured operating point (SimilaritySpec asserts both
    * recall and candidate fraction at exactly these values — a single
    * source so the declared query and the spec's measurement can
    * never drift apart).
    */
  val AnnNBits = 14
  val AnnTables = 45
  val AnnProbeRadius = 2

  /** q64's quantizer defaults: Lloyd rounds, probe cells, seed cells. */
  val IvfLloydIters = 2
  val IvfNProbe = 7
  val IvfCells = 10

  /** q69's measured operating point (bucket equality — see
    * [[embNearDupLshOn]] for why it differs from q63's).
    */
  val NearDupNBits = 8
  val NearDupTables = 80

  /** Skew guard for the q69 self-join, same contract as
    * TextOps.MaxLshBucket: over-cap buckets emit representative star
    * edges instead of bn² pairs.
    */
  val MaxVecBucket = 10000

  /** Deterministic id-prefix cap for the EXACT quadratic baseline
    * (q65): bounds the cartesian at ≤ Cap²/2 pairs no matter what sf
    * the entry runs at, while every test corpus (vec_id < 2000 at
    * sf0.1) passes through unchanged. SQL oracle carries the literal.
    */
  val ExactBaselineVecCap = 4096

  /** q147: approximate candidates per query kept for exact re-rank
    * (2× the final top-5 — SQ's 4dp score error only matters AT the
    * cut boundary, and the exact pass corrects any order inside it).
    */
  val SqRerankWidth = 10

  /** Product-quantization geometry (q165 and the persisted IVF-PQ
    * arm): the 64-dim fixture splits into 8 contiguous 8-dim
    * subspaces, each with its own 64-centroid spherical-k-means
    * codebook (hash-seeded, [[PqLloydIters]] Lloyd rounds — the
    * [[kmeansCodebook]] machinery verbatim, per subvector slice).
    * A vector's PQ code is 8 six-bit ids — 6 bytes of scan payload
    * against the raw vector's 256 (64 floats) or SQ's 64 (int8
    * codes): the ~40×/10× byte cut is the whole reason PQ exists at
    * 100 TB, where the ANN scan is bytes-bound (q147's argument,
    * one compression tier further). The geometry is MEASURED on the
    * fixture, which is PQ's worst case — near-random vectors are
    * incompressible, so coarse codebooks carry almost no ordering
    * signal (4×16-dim/16: recall 0.36; 8×8-dim/16: 0.44): 8×8-dim
    * at k=64 is the point where the ADC order becomes usable
    * (recall 0.88 at width 40). The persisted tiers (q166/q169)
    * code RAW subvectors — the replay stays one k-means per
    * subspace and |recon| derives from book norms alone; the
    * RESIDUAL variant (q171, [[residualPqOn]] — codes on v −
    * c_cell, the classic IVF-ADC refinement) is the round-15
    * addition with its own cosine-faithful decomposition and full
    * replay oracle, recall-compared against q166 at equal bytes in
    * SimilaritySpec.
    */
  val PqSubspaces = 8
  val PqSubDim = 8
  val PqCentroids = 64
  val PqLloydIters = 2

  /** q165: ADC candidates per query kept for the exact re-rank —
    * the FAISS refine k_factor, 8× the final top-5 where SQ needs
    * only 2× ([[SqRerankWidth]]): a 6-byte code's ordering error is
    * real, and the refine list is what buys recall back (measured
    * on the fixture: width 10/20/40 → recall 0.52/0.76/0.88). The
    * width is a CONSTANT per query — independent of corpus size, so
    * the refine fetch stays ~40 rows/query at any scale.
    */
  val PqRerankWidth = 40

  /** All XOR masks with at most `radius` bits set among `nBits` —
    * generated combinatorially (C(n,1)+C(n,2)+…), never by filtering
    * the 2^nBits code space, which stalls the driver at high nBits.
    */
  private[queries] def probeMasks(nBits: Int, radius: Int): Seq[Long] = {
    def combos(bits: List[Int], k: Int): Seq[List[Int]] =
      if (k == 0) Seq(Nil)
      else bits match {
        case Nil => Seq.empty
        case b :: rest => combos(rest, k - 1).map(b :: _) ++ combos(rest, k)
      }
    (1 to radius).flatMap(r =>
      combos((0 until nBits).toList, r)
        .map(_.map(1L << _).reduce(_ | _)))
  }

  // lazy: q111's oracle string interpolates SemDedupTau, which is
  // declared BELOW — an eager val would capture the pre-init 0.0
  // (caught by the local oracle gate as a contaminated-flag flip).
  lazy val queries: Seq[Q] = Seq(

    // -- exact top-k: the small query set is broadcast, so the
    //    "cross join" is a map-side nested loop over candidates —
    //    no shuffle until the per-query top-k window.
    Q("q60_knn_brute_force",
      (s, d) => knnBruteForceOn(t(s, d).embeddings),
      Some(s"""WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
          WHERE vec_id % 100 = 0 AND vec_id < $ExactBaselineVecCap),
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
            // cast the order-independent decimal sums to double BEFORE
            // the divide, exactly like the oracle's CAST(SUM AS
            // DOUBLE)/COUNT: IEEE double division is bit-deterministic,
            // while decimal division rounds at a Spark-chosen result
            // scale that DuckDB does not replicate (~1e-9 norm drift).
            transform(col("sums"), x => x.cast("double") / col("n")).as("c_emb"))
        cent.select(col("label"),
            sqrt(Vectors.dot(col("c_emb"), col("c_emb"))).as("centroid_norm"))
          .orderBy(col("label"))
      },
      Some("""WITH comp AS (
          SELECT label, i,
            CAST(SUM(CAST(CAST(embedding[i + 1] AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE)
              / COUNT(embedding[i + 1]) AS m
          FROM embeddings, (SELECT unnest(range(0, 64)) AS i)
          GROUP BY label, i),
        cent AS (
          SELECT label, list(m ORDER BY i) AS c_emb FROM comp GROUP BY label)
        SELECT label, sqrt(list_dot_product(c_emb, c_emb)) AS centroid_norm
        FROM cent ORDER BY label"""),
      "IVF centroids via positional explode + aggregate"),

    // -- LSH ANN, multi-table multi-probe: L independent hyperplane
    //    tables (seed = exploded table index); the corpus is bucketed
    //    once per table, and each QUERY additionally probes every
    //    bucket at Hamming distance 1 from its own code (flip each of
    //    the nBits sign bits). Multi-probe is the standard trick for
    //    recall on weakly-separated corpora: a near neighbor that
    //    disagrees on exactly one bit is still found without adding a
    //    whole extra table, so the candidate set stays small. Probing
    //    expands only the tiny query side (×(nBits+1)); corpus rows
    //    are still bucketed exactly once per table.
    //
    //    Parameters are MEASURED, not guessed (SimilaritySpec asserts
    //    both sides of the tradeoff on this corpus, whose labels carry
    //    no geometry — same-label mean cosine 0.002, true top-5
    //    neighbors at 0.27..0.51): nBits=14, L=45, probe radius 2
    //    gives recall 0.95 (sf0.1) with candidates 29% / 29% of corpus
    //    at sf0.01 / sf0.1 (radius-1 at any (nBits, L) could not hold
    //    recall >= 0.8 under 30% candidates on this corpus).
    //    Scale shape: explode ×L on ids+bucket only (16-byte rows),
    //    equi-join per (table, bucket), never a cross join; candidate
    //    scoring joins embeddings back by id.
    //
    //    Round 16: FULL value oracle. The planes are md5-derived
    //    (graft.expressions.HyperplaneBuckets.component — first 32
    //    bits of md5("i:j:t") scaled to [-1,1), exact in double), so
    //    the oracle replays the entire search in SQL: build all
    //    L×nBits 64-dim planes, code corpus and queries by
    //    sign-of-dot-product, expand each query code by every XOR
    //    mask of popcount <= 2 (the probeMasks set), equi-join on
    //    (table, code), exact-cosine score, top-5. The 64 in the
    //    plane CTE is the fixture dim (q62's precedent); the engine
    //    derives dim from the vector itself.
    Q("q63_ann_lsh", (s, d) => annLsh(s, d),
      Some(s"""WITH planes AS (
          SELECT t, i, list(comp ORDER BY j) AS plane
          FROM (
            SELECT t, i, j,
              ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)
                || ':' || CAST(t AS VARCHAR)), 1, 8))::BIGINT
                / 2147483648.0 - 1.0 AS comp
            FROM range($AnnTables) r1(t), range($AnnNBits) r2(i), range(64) r3(j))
          GROUP BY t, i),
        codes AS (
          SELECT e.vec_id, p.t,
            CAST(SUM(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p.plane) >= 0
              THEN 1::BIGINT << CAST(${AnnNBits - 1} - p.i AS INT) ELSE 0 END) AS BIGINT) AS b
          FROM embeddings e, planes p
          GROUP BY e.vec_id, p.t),
        masks AS (
          SELECT 0::BIGINT AS m
          UNION ALL
          SELECT 1::BIGINT << CAST(b1 AS INT) FROM range($AnnNBits) rm(b1)
          UNION ALL
          SELECT (1::BIGINT << CAST(b1 AS INT)) | (1::BIGINT << CAST(b2 AS INT))
          FROM range($AnnNBits) ra(b1), range($AnnNBits) rb(b2) WHERE b1 < b2),
        cands AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id
          FROM codes q
          CROSS JOIN masks
          JOIN codes c ON c.t = q.t AND c.b = xor(q.b, masks.m)
          WHERE q.vec_id % 100 = 0 AND q.vec_id < $ExactBaselineVecCap
            AND c.vec_id <> q.vec_id),
        scored AS (
          SELECT cd.query_id, cd.vec_id AS neighbor_id,
            list_dot_product(CAST(qe.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(CAST(qe.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS score
          FROM cands cd
          JOIN embeddings e ON e.vec_id = cd.vec_id
          JOIN embeddings qe ON qe.vec_id = cd.query_id),
        ranked AS (
          SELECT query_id, neighbor_id, score,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS rk
          FROM scored)
        SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
        FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""),
      "multi-probe hyperplane-LSH ANN, full md5-plane replay oracle"),

    // -- embedding-cosine near-dup, EXACT baseline: every pair with
    //    cosine ≥ 0.45 over all vec_id-ordered pairs. Quadratic by
    //    definition (this is the ground truth the bucketed paths are
    //    measured against — same role as q54 for text); per-pair cost
    //    is one fused native kernel (CosineSim), and the n² pair space
    //    is the documented reason q63/q64's banded equi-joins are the
    //    100 TB path.
    //    The pair stage itself is session-shared (SharedStages): q131
    //    composes the same exact pair set into its cross-modal
    //    verdicts, so a Verify/Bench session computes it once.
    Q("q65_embedding_neardup",
      (s, d) => SharedStages.cappedEmbNearDupPairs(s, d)
        .orderBy(col("vec_a"), col("vec_b")),
      Some("""WITH emb AS (
          SELECT * FROM embeddings WHERE vec_id < 4096),
        scored AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
            list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cos
          FROM emb a JOIN emb b ON a.vec_id < b.vec_id)
        SELECT vec_a, vec_b, cos FROM scored WHERE cos >= 0.45
        ORDER BY vec_a, vec_b"""),
      "exact embedding-cosine near-dup pairs"),

    // -- banded embedding near-dup: q65's subquadratic scale path
    //    (see [[embNearDupLshOn]]); recall + candidate-pair fraction
    //    asserted in SimilaritySpec.
    //
    //    Round 16: FULL value oracle via the same md5-plane replay as
    //    q63 (bucket EQUALITY self-join — no probe masks). Boundary:
    //    the oracle's plain all-pairs form equals the engine exactly
    //    whenever no (table, bucket) exceeds MaxVecBucket (=10000) —
    //    the capped star-edge path can't engage with corpus <= 2000
    //    rows at every test sf; the over-cap behavior is pinned
    //    separately in SimilaritySpec ("over-cap buckets dedup via
    //    representative star").
    Q("q69_embedding_neardup_lsh", (s, d) => embNearDupLshOn(t(s, d).embeddings),
      Some(s"""WITH planes AS (
          SELECT t, i, list(comp ORDER BY j) AS plane
          FROM (
            SELECT t, i, j,
              ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)
                || ':' || CAST(t AS VARCHAR)), 1, 8))::BIGINT
                / 2147483648.0 - 1.0 AS comp
            FROM range($NearDupTables) r1(t), range($NearDupNBits) r2(i), range(64) r3(j))
          GROUP BY t, i),
        codes AS (
          SELECT e.vec_id, p.t,
            CAST(SUM(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p.plane) >= 0
              THEN 1::BIGINT << CAST(${NearDupNBits - 1} - p.i AS INT) ELSE 0 END) AS BIGINT) AS b
          FROM embeddings e, planes p
          GROUP BY e.vec_id, p.t),
        cands AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM codes a JOIN codes b ON b.t = a.t AND b.b = a.b
            AND a.vec_id < b.vec_id),
        scored AS (
          SELECT c.vec_a, c.vec_b,
            list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))) AS cos
          FROM cands c
          JOIN embeddings ea ON ea.vec_id = c.vec_a
          JOIN embeddings eb ON eb.vec_id = c.vec_b)
        SELECT vec_a, vec_b, cos FROM scored WHERE cos >= 0.45
        ORDER BY vec_a, vec_b"""),
      "banded LSH embedding near-dup, full md5-plane replay oracle"),

    // -- IVF ANN, step 2: assign every vector to its nearest centroid
    //    (map-side argmax over the k×dim codebook, carried in the plan
    //    as a constant-folded literal — zero shuffle per vector, the
    //    only scale-correct IVF assignment over 100 TB of vectors),
    //    then MULTI-PROBE search: each query scans its top-`nprobe`
    //    cells by centroid similarity, not just its own cell.
    //    Single-cell search caps recall at how well the quantizer
    //    matches neighbor structure; probing 7 of the 10 toy cells
    //    reaches 0.88 with the per-label seed codebook and more after
    //    Lloyd refinement (SimilaritySpec measures both). At
    //    production scale k ≫ 10 cells and nprobe/k is a small
    //    fraction — the plan shape (probe-cell equi-join) is the same.
    //
    //    The codebook is a real (spherical) k-means: per-label means
    //    seed it, then `lloydIters` fixed Lloyd rounds refine it —
    //    each round is the SAME two scale-correct pieces the search
    //    uses (literal-codebook argmax assignment + one element-wise
    //    vecDecimalSum re-centering pass), so the quantizer costs
    //    (lloydIters+1) linear scans, never a rows×dim explode.
    //    Decimal accumulation keeps every centroid (and therefore the
    //    cell partition and probe ranking) identical run-to-run.
    //    Round 8: full hash oracle — the build is deterministic
    //    decimal-mean k-means, so the oracle replays it in unrolled
    //    CTEs (q144's pattern) and value-checks the search output.
    Q("q64_ann_ivf", (s, d) => ivfAnn(s, d),
      Some(ivfAnnOracleSql),
      "IVF multi-probe ANN: k-means literal-codebook assignment + top-nprobe cell search"),

    // -- int8 scalar quantization: the 4× storage compression
    //    (float32 → int8 + one float scale per vector) that lets a
    //    100 TB embedding corpus keep its ANN index in memory. Pure
    //    map-side projection; per-element ops are identical double
    //    expressions in both engines (ties round away from zero in
    //    both), so even the reconstruction error needs no rounding.
    //    The quantized vector is DECLARED as a sha256 digest of its
    //    comma-joined elements rather than the raw int array — the
    //    driver's comparator can't sort rows containing list columns,
    //    and the digest is an equally exact witness of every element.
    Q("q89_quantize_int8",
      (s, d) => t(s, d).embeddings
        .select(
          col("vec_id"),
          graft.functions.Vectors.quantScale(col("embedding")).as("scale"),
          sha2(concat_ws(",",
            graft.functions.Vectors.quantizeInt8(col("embedding"))
              .cast("array<string>")), 256).as("qvec_sha"),
          graft.functions.Vectors.int8MaxAbsErr(col("embedding"))
            .as("max_abs_err"))
        .orderBy(col("vec_id")),
      Some("""WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        s AS (
          SELECT vec_id, emb,
            CASE WHEN list_max(list_transform(emb, x -> abs(x))) = 0 THEN 1.0
              ELSE list_max(list_transform(emb, x -> abs(x))) / 127.0
            END AS scale
          FROM v)
        SELECT vec_id, scale,
          sha256(array_to_string(
            list_transform(emb, x -> CAST(CAST(round(x / scale) AS INT)
              AS VARCHAR)), ',')) AS qvec_sha,
          list_max(list_transform(emb,
            x -> abs(x - round(x / scale) * scale))) AS max_abs_err
        FROM s ORDER BY vec_id"""),
      "int8 scalar quantization with per-vector scale + max error"),

    // -- SemDeDup-style semantic dedup: cluster the corpus with the
    //    q64 k-means codebook, then near-dup ONLY within clusters —
    //    the cluster assignment is the blocking key, turning the n²
    //    cosine matrix into k cluster-bounded self-joins routed
    //    through the shared capped candidate stage (same skew
    //    contract as q56/q68/q69: singleton cells free, over-cap
    //    cells take the star-representative path). Keep-lowest-id:
    //    a vector is dropped iff some lower-id candidate partner has
    //    exact cosine ≥ τ. Cross-cluster near-dups are the documented
    //    approximation (the SemDeDup tradeoff); SimilaritySpec
    //    measures that capture rate against the exact q65 baseline
    //    instead of trusting it. Deterministic (codebook + exact
    //    verify) → golden-pinned.
    //    Round 8: full hash oracle — build replay + probe-cell pair
    //    generation + exact-cosine verify, all in unrolled CTEs
    //    (valid below MaxVecBucket, which every fixture is; capture
    //    rate vs the exact q65 baseline stays spec-measured).
    Q("q92_semantic_dedup",
      (s, d) => semanticDedupOn(t(s, d).embeddings),
      Some(semanticDedupOracleSql),
      "cluster-bucketed embedding dedup, keep-lowest-id (capture rate in spec)"),

    // -- semantic DECONTAMINATION: the embedding analog of q77's
    //    shingle check — flag eval-set vectors whose nearest TRAINING
    //    vector is ≥ τ cosine (an eval item semantically present in
    //    the training corpus, the leakage no string match catches).
    //    Eval = the capped 2%-of-id subset riding the broadcast side
    //    (bounded like q60's queries), so the scan is linear in the
    //    corpus at any sf; the corpus-scale swap is q63/q64's banded
    //    candidate generation with this same exact-cosine verify.
    //    Cosines round to 4dp BEFORE the argmax rank (q74's
    //    convention) so a 1-ulp libm divergence can't flip the
    //    nearest-neighbor choice across engines.
    Q("q111_semantic_decontamination",
      (s, d) => {
        val emb = t(s, d).embeddings
        val ev = emb.filter(col("vec_id") % 50 === 0 &&
            col("vec_id") < ExactBaselineVecCap)
          .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"))
        val scored = emb.filter(col("vec_id") % 50 =!= 0)
          .crossJoin(broadcast(ev))
          .select(col("eval_id"), col("vec_id").as("train_id"),
            round(Vectors.cosine(col("e_emb"), col("embedding")), 4)
              .as("cos"))
        val w = Window.partitionBy(col("eval_id"))
          .orderBy(col("cos").desc, col("train_id"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("eval_id"), col("train_id").as("nearest_train_id"),
            col("cos").as("nearest_cos"),
            (col("cos") >= SemDedupTau).cast("int").as("contaminated"))
          .orderBy(col("eval_id"))
      },
      Some(s"""WITH ev AS (
          SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings
          WHERE vec_id % 50 = 0 AND vec_id < $ExactBaselineVecCap),
        tr AS (
          SELECT vec_id AS train_id, CAST(embedding AS DOUBLE[]) AS t
          FROM embeddings WHERE vec_id % 50 <> 0),
        scored AS (
          SELECT ev.eval_id, tr.train_id,
            ROUND(list_dot_product(ev.e, tr.t)
              / (sqrt(list_dot_product(ev.e, ev.e))
               * sqrt(list_dot_product(tr.t, tr.t))), 4) AS cos
          FROM ev, tr),
        ranked AS (
          SELECT eval_id, train_id, cos,
            ROW_NUMBER() OVER (PARTITION BY eval_id
              ORDER BY cos DESC, train_id) AS rk
          FROM scored)
        SELECT eval_id, train_id AS nearest_train_id, cos AS nearest_cos,
          CAST(cos >= $SemDedupTau AS INT) AS contaminated
        FROM ranked WHERE rk = 1 ORDER BY eval_id"""),
      "semantic decontamination: nearest training vector per eval vector"),

    // -- q124: distributed COVARIANCE matrix of the embedding space —
    //    the PCA/whitening prep step every embedding post-processing
    //    pipeline starts with (retrieval-quality whitening, dimension
    //    pruning, drift monitoring). The q62 shape, one order up:
    //    each row maps to its d(d+1)/2 upper-triangle centered
    //    products (the centered vector is LAMBDA-BOUND once so the
    //    HOF can't re-evaluate it per pair), and ONE
    //    `Vectors.vecDecimalSum` typed aggregate folds whole term
    //    arrays with map-side partial merge — the shuffle carries one
    //    2080-slot decimal buffer per task, NOT rows×d² exploded
    //    tuples (the oracle's join formulation is exactly what this
    //    plan avoids at 100 TB; the d² blowup happens once, on the
    //    single post-aggregate row). Means come first from the same
    //    decimal-sum aggregate (1-row broadcast). Determinism: q62's
    //    stack — per-term DECIMAL(38,6) half-up rounding inside the
    //    aggregator mirrored by the oracle's CAST AS DECIMAL(38,6),
    //    double division only at the end, 6dp output round.
    Q("q124_embedding_covariance",
      (s, d) => covarianceMatrix(t(s, d).embeddings),
      Some(s"""WITH m AS (
          SELECT i, CAST(SUM(CAST(CAST(embedding[i + 1] AS DOUBLE)
              AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mu
          FROM embeddings, (SELECT unnest(range(0, $Dim)) AS i)
          GROUP BY i),
        x AS (
          SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) - mu AS xc
          FROM embeddings, (SELECT unnest(range(0, $Dim)) AS i) r
          JOIN m USING (i)),
        n AS (SELECT COUNT(*) AS n FROM embeddings)
        SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
          ROUND(CAST(SUM(CAST(a.xc * b.xc AS DECIMAL(38,6))) AS DOUBLE)
            / n.n, 6) + 0.0 AS cov
        FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i, n
        GROUP BY a.i, b.i, n.n ORDER BY i, j"""),
      "distributed covariance matrix of the embedding space (PCA prep)"),

    // -- q125: top CORRELATED dimension pairs — the redundancy audit
    //    over q124's matrix: r_ij = cov_ij / √(var_i·var_j) from the
    //    (already 6dp-deterministic) covariance relation, diagonal
    //    variances broadcast back onto the off-diagonal entries.
    //    Everything after the covariance aggregate is d²-bounded;
    //    the top-20 is rank-by-rounded (q74's rule) and plans as
    //    TakeOrderedAndProject.
    Q("q125_dim_correlation",
      (s, d) => {
        // persist + materialize the covariance relation EAGERLY: it
        // fans out into three subtrees (the i<j filter plus the two
        // diagonal broadcast joins), and the repo's own q54/q56
        // lesson is that racing consumers of a lazy shared subtree
        // each recompute its lineage — here that would re-run the
        // corpus scan + upper_tri_products + 2080-slot aggregate up
        // to three times. The relation is d(d+1)/2 rows — trivial to
        // cache at any corpus size.
        val cov = covarianceMatrix(t(s, d).embeddings).persist()
        cov.count()
        val diag = cov.filter(col("i") === col("j"))
          .select(col("i").as("k"), col("cov").as("v"))
        cov.filter(col("i") < col("j"))
          .join(broadcast(diag.withColumnRenamed("k", "i")
            .withColumnRenamed("v", "var_i")), Seq("i"))
          .join(broadcast(diag.withColumnRenamed("k", "j")
            .withColumnRenamed("v", "var_j")), Seq("j"))
          .filter(col("var_i") > 0 && col("var_j") > 0)
          .select(col("i"), col("j"),
            (round(col("cov") / sqrt(col("var_i") * col("var_j")), 4) + 0.0)
              .as("r"))
          .orderBy(abs(col("r")).desc, col("i"), col("j"))
          .limit(20)
      },
      Some(s"""WITH m AS (
          SELECT i, CAST(SUM(CAST(CAST(embedding[i + 1] AS DOUBLE)
              AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mu
          FROM embeddings, (SELECT unnest(range(0, $Dim)) AS i)
          GROUP BY i),
        x AS (
          SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) - mu AS xc
          FROM embeddings, (SELECT unnest(range(0, $Dim)) AS i) r
          JOIN m USING (i)),
        n AS (SELECT COUNT(*) AS n FROM embeddings),
        cov AS (
          SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
            ROUND(CAST(SUM(CAST(a.xc * b.xc AS DECIMAL(38,6))) AS DOUBLE)
              / n.n, 6) AS cov
          FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i, n
          GROUP BY a.i, b.i, n.n),
        diag AS (SELECT i AS k, cov AS v FROM cov WHERE i = j)
        SELECT c.i, c.j,
          ROUND(c.cov / SQRT(di.v * dj.v), 4) + 0.0 AS r
        FROM cov c
        JOIN diag di ON c.i = di.k JOIN diag dj ON c.j = dj.k
        WHERE c.i < c.j AND di.v > 0 AND dj.v > 0
        ORDER BY ABS(ROUND(c.cov / SQRT(di.v * dj.v), 4)) DESC, c.i, c.j
        LIMIT 20"""),
      "top correlated embedding dimension pairs (redundancy audit)"),

    // -- q126: per-dimension STANDARDIZATION (whitening apply) with
    //    outlier flags — the apply step after q124's covariance: each
    //    vector's components are z-scored against the corpus
    //    per-dimension mean/variance (diagonal of the covariance
    //    relation, folded to one broadcast row via a sort-then-
    //    transform collect_list so the array order is deterministic),
    //    then reduced map-side to a standardized norm and max |z|.
    //    The embedding-space cousin of q80's percentile-band filter:
    //    a vector whose max |z| exceeds 3 is distributionally
    //    anomalous (dead dimension, scaling bug, adversarial input).
    //    Determinism: z² terms are 6dp-rounded THEN decimal-summed
    //    (q109's round-then-DECIMAL-sum rule) so the index-ordered
    //    HOF fold and the oracle's unordered SUM agree exactly; the
    //    diagonal reuses covarianceMatrix verbatim so both engines
    //    inherit q124's already-proven variance values.
    // -- q128: PERSISTED-INDEX ANN — the build-once/query-many serving
    //    shape on the driver's correctness surface. The session-shared
    //    IvfIndex (SharedStages builds it once per sf dir: codebook
    //    parquet + cell-PARTITIONED vectors) answers the shared capped
    //    query subset through the DPP probe join — the plan reads the
    //    stored cells scan under a dynamicpruning filter from the
    //    broadcast (query, cell) pairs (asserted in PlanShapeSpec).
    //    Declared at nprobe = k: probing every cell makes IVF
    //    EXHAUSTIVE, so the output is exactly q60's brute-force top-5
    //    and the DuckDB oracle hash-matches in full — the driver
    //    verifies the whole index machinery (build → store → probe →
    //    score → rank), not just row counts. The production
    //    nprobe < k regime (same plan, pruned partitions) keeps its
    //    recall ≥ 0.8 + partition-pruning spec in SimilaritySpec; the
    //    100 TB arithmetic for WHY the persisted index is the only
    //    amortizable ANN shape is in [[IvfIndex]]'s doc.
    Q("q128_ivf_index_search",
      (s, d) => IvfIndex.query(s, SharedStages.ivfIndexPath(s, d),
        querySubset(t(s, d).embeddings), nprobe = IvfCells, topK = 5),
      Some(s"""WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
          WHERE vec_id % 100 = 0 AND vec_id < $ExactBaselineVecCap),
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
      "persisted-IVF-index ANN at nprobe=k (exhaustive -> exact top-5, full hash oracle)"),

    Q("q126_standardize_embeddings",
      (s, d) => {
        val emb = t(s, d).embeddings
        val stats = covarianceMatrix(emb)
          .filter(col("i") === col("j"))
          .agg(collect_list(struct(col("i"), col("cov"))).as("vs"))
          .select(transform(array_sort(col("vs")), v => v.getField("cov"))
            .as("vars"))
        val means = emb
          .agg(Vectors.vecDecimalSum(Vectors.asDouble(col("embedding"))).as("sums"),
            count(lit(1)).as("n"))
          .select(transform(col("sums"), s0 => s0 / col("n")).as("mu"))
        val z = emb.crossJoin(broadcast(means)).crossJoin(broadcast(stats))
          .select(col("vec_id"),
            zip_with(
              zip_with(Vectors.asDouble(col("embedding")), col("mu"), _ - _),
              col("vars"),
              (xc, v) => when(v > 0, xc / sqrt(v)).otherwise(lit(0.0)))
              .as("z"))
        z.select(col("vec_id"),
            round(sqrt(aggregate(col("z"),
              lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)"),
              (acc, zk) => acc + round(zk * zk, 6).cast("decimal(38,6)"))
              .cast("double")), 4).as("norm_std"),
            round(aggregate(col("z"), lit(0.0),
              (acc, zk) => greatest(acc, abs(zk))), 4).as("max_abs_z"))
          .withColumn("is_outlier", (col("max_abs_z") > 3.0).cast("int"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH m AS (
          SELECT i, CAST(SUM(CAST(CAST(embedding[i + 1] AS DOUBLE)
              AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mu
          FROM embeddings, (SELECT unnest(range(0, $Dim)) AS i)
          GROUP BY i),
        x AS (
          SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) - mu AS xc
          FROM embeddings, (SELECT unnest(range(0, $Dim)) AS i) r
          JOIN m USING (i)),
        n AS (SELECT COUNT(*) AS n FROM embeddings),
        v AS (
          SELECT i, ROUND(CAST(SUM(CAST(xc * xc AS DECIMAL(38,6))) AS DOUBLE)
            / n.n, 6) + 0.0 AS var
          FROM x, n GROUP BY i, n.n),
        z AS (
          SELECT x.vec_id,
            CASE WHEN v.var > 0 THEN x.xc / SQRT(v.var) ELSE 0.0 END AS z
          FROM x JOIN v USING (i)),
        agg AS (
          SELECT vec_id,
            CAST(SUM(CAST(ROUND(z * z, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s2,
            MAX(ABS(z)) AS mz
          FROM z GROUP BY vec_id)
        SELECT vec_id, ROUND(SQRT(s2), 4) AS norm_std,
          ROUND(mz, 4) AS max_abs_z,
          CAST(ROUND(mz, 4) > 3.0 AS INT) AS is_outlier
        FROM agg ORDER BY vec_id"""),
      "per-dimension standardization with z-score outlier flags"),

    // -- hard-negative mining: for each (capped, q60-convention)
    //    query vector, the top-3 most similar vectors carrying a
    //    DIFFERENT label — the contrastive-training counterpart of
    //    q60's plain top-k. Same plan shape: the query side (with
    //    its label) broadcasts, scoring is a map-side nested loop,
    //    and the only shuffle is the per-query top-k window.
    Q("q135_hard_negatives",
      (s, d) => {
        val emb = t(s, d).embeddings
        val q = emb
          .filter(col("vec_id") % 100 === 0 &&
            col("vec_id") < ExactBaselineVecCap)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("q_emb"), col("label").as("q_label"))
        val scored = emb.crossJoin(broadcast(q))
          .filter(col("label") =!= col("q_label"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            Vectors.cosine(col("q_emb"), col("embedding")).as("score"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("query_id"), col("neighbor_id"), col("score"),
            col("rk").cast("int").as("rk"))
          .orderBy(col("query_id"), col("rk"))
      },
      Some(s"""WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
          FROM embeddings
          WHERE vec_id % 100 = 0 AND vec_id < $ExactBaselineVecCap),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
            list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS score
          FROM embeddings e, q WHERE e.label <> q.q_label),
        ranked AS (
          SELECT query_id, neighbor_id, score,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS rk
          FROM scored)
        SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
        FROM ranked WHERE rk <= 3 ORDER BY query_id, rk"""),
      "cross-label hard-negative mining (contrastive training prep)"),

    // -- q144: IVF index HEALTH audit — the operational complement of
    //    q128: codebook staleness is the documented IVF tradeoff
    //    ([[IvfIndex]]'s appendStream note), and this query makes it
    //    MEASURABLE from the stored index alone: per-cell member
    //    count, skew (n·k/total — 1.0 is perfectly balanced; a probe
    //    of a skew-4 cell reads 4× its share of bytes), and mean
    //    cosine of members to their own centroid (drifting corpus →
    //    falling cohesion). Operational rule documented here: rebuild
    //    the codebook when max skew exceeds ~4 or mean cohesion of a
    //    heavy cell falls well below the build-time value — both
    //    thresholds are readable straight off this output.
    //
    //    Scale shape: one scan of the stored cells (never the raw
    //    corpus), the k-row codebook broadcast, one cell-keyed
    //    aggregate, one 1-row total broadcast. The DuckDB oracle has
    //    no stored index, so it REPLAYS the whole build — per-label
    //    seed means, two Lloyd rounds (argmax ties to the LARGER
    //    c_id, [[cellOf]]'s array_max rule), final assignment (ties
    //    to the SMALLER c_id, [[probeCells]]'s argsort rule) — in
    //    unrolled CTEs, q129's oracle pattern; matching it end-to-end
    //    verifies the stored assignment IS the k-means the build
    //    claims. Mean cohesion follows q126: 6dp-round each cosine,
    //    decimal-sum, divide once in double, surface 4dp.
    //    Body lives in [[IvfIndex.health]] (round 9) so the
    //    maintenance op [[IvfIndex.rebuildIfStale]] reads the SAME
    //    metrics it acts on — audit and trigger cannot drift.
    Q("q144_ivf_index_health",
      (s, d) => IvfIndex.health(s, SharedStages.ivfIndexPath(s, d)),
      Some(ivfHealthOracleSql),
      "per-cell IVF index health: size skew + centroid cohesion " +
        "(rebuild signal)"),

    // -- q147: IVF-SQ search — the byte-cut composition of the
    //    persisted index (q128) and int8 scalar quantization (q89).
    //    At 100 TB the ANN scan's bottleneck is BYTES: the stored
    //    cells carry each row's write-time quantization (code +
    //    scale, [[IvfIndex.assign]]), and the approximate pass reads
    //    ONLY (cell, vec_id, code) — column pruning never touches
    //    the float vectors, so the probed partitions stream ~1/4 the
    //    bytes (int8 codes bit-pack; the q89 digest pins the exact
    //    code values). Cosine is SCALE-INVARIANT, so scoring the raw
    //    integer codes against the query needs no dequantization —
    //    `scale` stays in the store for non-cosine reconstruction.
    //    Approximate scores 4dp-round before the candidate rank
    //    (q74's round-before-rank rule), top-$SqRerankWidth per query
    //    re-rank with EXACT cosines over the true vectors fetched for
    //    candidates only. The oracle replays the whole chain: k-means
    //    build, probe cells, SQL-side quantization (q89's formula),
    //    candidate cut, exact re-rank. SimilaritySpec additionally
    //    pins recall vs q60 and that the approximate scan's
    //    ReadSchema excludes `embedding`.
    //    Round 10: the body is [[IvfIndex.sqQuery]] (same plan,
    //    parameterized) so the re-rank width is a library knob —
    //    [[IvfIndex.sqRerankWidthFor]] picks it from the index's own
    //    health (skew-scaled, SimilaritySpec measures the rule on a
    //    drifted corpus); the DECLARED query keeps the fixed default
    //    width the oracle replays.
    Q("q147_ivf_sq_search",
      (s, d) => IvfIndex.sqQuery(s, SharedStages.ivfIndexPath(s, d),
        querySubset(t(s, d).embeddings),
        IvfNProbe, topK = 5, rerankWidth = SqRerankWidth),
      Some(ivfSqOracleSql),
      "IVF-SQ: int8-code approximate scan (embedding column never read) " +
        "+ exact re-rank of the top candidates"),

    // -- q154: INCREMENTAL semantic dedup — the embedding analog of
    //    q114 (text) and q82 (exact): a "new batch" of vectors
    //    (vec_id % 5 == 0, the same arrival split) is screened
    //    against the EXISTING corpus without re-reading or
    //    re-clustering it. The corpus state is the persisted
    //    corpus-only IvfIndex (SharedStages builds it once per sf
    //    dir); the batch probes its top-$IvfNProbe cells under the
    //    STORED codebook — the q64/q147 SEARCH operating point, not
    //    q92's $SemDedupProbes: q92 blocks on probe-set INTERSECTION
    //    (both sides multi-probe), while a stored corpus vector sits
    //    in its single primary cell, so the batch side must probe as
    //    wide as a search does (measured on the weakly-clustered
    //    fixture: capture 0.60 at 3 probes vs 0.81 at $IvfNProbe;
    //    1.0 on a clustered corpus either way — both in
    //    SimilaritySpec). The codebook is fixed at index-build time,
    //    which is exactly the production contract: daily arrivals
    //    are screened under yesterday's codebook (staleness is
    //    q144's measurable knob, not this query's concern). The probe join broadcasts the (cell, batch) pairs
    //    so the cell-partitioned store is read under DYNAMIC
    //    PARTITION PRUNING — nprobe/k of the corpus bytes, and the
    //    batch never shuffles the corpus (q114's posture, vector
    //    modality). Exact-cosine verify on the candidates only,
    //    4dp round BEFORE the best-match rank (q111's convention),
    //    verdict at q92's τ: dup_of = the best corpus match when
    //    best_cos ≥ τ, else a novel vector. The oracle replays the
    //    corpus-only k-means build (same CTEs as q92/q144, filtered),
    //    the stored primary assignment, the batch probe, and the
    //    verify — so the driver hash-verifies that screening against
    //    the PERSISTED index equals the from-scratch formulation.
    //    SimilaritySpec measures capture vs the exact batch×corpus
    //    screen (the multi-probe miss rate is the documented
    //    SemDeDup tradeoff, measured not trusted).
    Q("q154_incremental_semantic_dedup",
      (s, d) => incrementalSemanticDedup(s, d),
      Some(incrementalSemanticDedupOracleSql),
      "new-batch semantic dedup against the persisted corpus IVF " +
        "index under the stored codebook (DPP probe, exact verify)"),

    // -- q163: the manifest's semantic-contamination screen at its
    //    PRODUCTION probe width (round-12's follow-through on the
    //    q157/q160 nprobe = k declaration): a new day's eval vectors
    //    probe the persisted ManifestStore's cell-partitioned train
    //    embeddings at nprobe = $IvfNProbe — the ~nprobe/k-bytes
    //    operating point itself, ON the driver's hash-verified
    //    surface. The oracle replays the ENTIRE apparatus (the q154
    //    discipline): the codebook k-means over the RESIDENT train
    //    vectors under hash seeds (the manifest's trainEmb carries no
    //    label column), the stored assignment of every train vector —
    //    resident rows assigned at build, batch rows at append, both
    //    under the SAME stored codebook — and the eval-side top-nprobe
    //    probe, so the hash match proves the store serves exactly the
    //    k-means probe it claims. The probe side is the FULL eval set
    //    (the benchmark-refresh re-screen — delta-sized by the % 50
    //    bench split at every SF; an ingest-threshold slice is empty
    //    at sf0.1, whose embedding domain is smaller than its
    //    document domain). Output: per probed train doc, the max 4dp
    //    cosine any eval vector reaches (the d_mec the q146 semantic
    //    arm thresholds) and its τ verdict. Misses vs the exhaustive
    //    arm are the documented SemDeDup probe trade (q154's measured
    //    stance); here the trade is IN the verified semantics, not
    //    hidden behind it.
    Q("q163_manifest_semantic_probe",
      (s, d) => {
        val st = ManifestStore.stateView(s,
          SharedStages.manifestStorePath(s, d), nprobe = IvfNProbe)
        val ix = st.semIndex.getOrElse(throw new IllegalStateException(
          "q163 requires a ManifestStore with a semantic probe index " +
            "(a store built over a non-empty train-embedding side)"))
        val newEvalEmb = QU.t(s, d).embeddings
          .filter(col("vec_id") % 50 === 0 &&
            col("vec_id") < ExactBaselineVecCap)
          .select(col("embedding").as("e_emb"))
        val probes = probeCells(newEvalEmb, Seq("e_emb"), "e_emb",
          ix.codebook, ix.nprobe)
        ix.cells.join(broadcast(probes), Seq("cell"))
          .groupBy(col("vec_id"))
          .agg(max(round(Vectors.cosine(col("embedding"), col("e_emb")), 4))
            .as("d_mec"))
          .select(col("vec_id").as("doc_id"), col("d_mec"),
            coalesce((col("d_mec") >= SemDedupTau).cast("int"), lit(0))
              .as("flagged"))
          .orderBy(col("doc_id"))
      },
      Some(manifestSemanticProbeOracleSql),
      "production-width probe of the manifest store's semantic arm " +
        "(full codebook/assignment/probe replay oracle)"),

    // -- q164: q154's CAPTURE TRADE on the hash surface (round-13's
    //    follow-through on the round-12 verdict): the incremental
    //    semantic-dedup probe's one measured-not-verified claim was
    //    that its nprobe-wide capture misses are a WEAK-CLUSTER
    //    artifact — on genuinely clustered data the same operator
    //    loses nothing. This query derives a deterministic CLUSTERED
    //    corpus from the fixture embeddings ([[clusteredEmbeddings]]:
    //    centers every $ClusterStride-th vector, member i =
    //    $ClusterScale·center + own embedding, so within-cluster
    //    cosines sit near 1 and cross-cluster cosines near the
    //    random-direction noise floor), builds the persisted
    //    [[IvfIndex]] over its pre-arrival slice (vec_id % 5 != 0,
    //    q154's split), and runs BOTH arms over the batch: the q154
    //    operator verbatim at production width ($IvfNProbe, τ=−1 so
    //    the best probed match always surfaces) and the exhaustive
    //    batch×corpus screen (capped at $ExactBaselineVecCap like
    //    q60/q65, cap mirrored in the oracle). Output: per batch
    //    vector, both best matches, both 4dp cosines, and
    //    `captured` = probe best IS the exhaustive best — the capture
    //    claim is now a hash-verified VALUE (all 1 on this corpus),
    //    with the oracle replaying the entire apparatus (clustered
    //    construction, hash-seeded k-means, stored assignment, probe,
    //    both ranks) in SQL. Scale shape: the probe arm is q154's
    //    DPP-pruned store scan; the exhaustive arm is the documented
    //    capped baseline that exists only to sit on the other side of
    //    the comparison.
    Q("q164_clustered_probe_capture",
      (s, d) => {
        val cl = clusteredEmbeddings(t(s, d).embeddings)
        val batch = cl.filter(col("vec_id") % 5 === 0)
        val probe = incrementalSemanticDedupOn(batch,
            SharedStages.clusteredIvfIndexPath(s, d), tau = -1.0)
          .select(col("vec_id"), col("dup_of").as("probe_best"),
            col("best_cos").as("probe_cos"))
        val b = batch.select(col("vec_id").as("b_id"),
          col("embedding").as("b_emb"))
        val exact = cl.filter(col("vec_id") % 5 =!= 0)
          .crossJoin(broadcast(b))
          .select(col("b_id"), col("vec_id").as("c_id"),
            round(Vectors.cosine(col("b_emb"), col("embedding")), 4)
              .as("cos"))
        val w = Window.partitionBy(col("b_id"))
          .orderBy(col("cos").desc, col("c_id"))
        exact.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("b_id").as("vec_id"), col("c_id").as("exact_best"),
            (col("cos") + lit(0.0)).as("exact_cos"))
          .join(probe, Seq("vec_id"), "left")
          .select(col("vec_id"), col("exact_best"), col("exact_cos"),
            col("probe_best"), col("probe_cos"),
            (col("probe_best") <=> col("exact_best")).cast("int")
              .as("captured"))
          .orderBy(col("vec_id"))
      },
      Some(clusteredProbeCaptureOracleSql),
      "probe-vs-exhaustive best match on a derived clustered corpus: " +
        "q154's capture trade as a hash-verified value"),

    // -- q165: PQ-ADC search — the COMPRESSED-SCAN tier of the ANN
    //    family (q60 exact floats → q147 int8 SQ → this, 6-byte PQ
    //    codes). Eight 8-dim subspace codebooks are learned by the
    //    SAME deterministic spherical k-means as every other codebook
    //    here ([[kmeansCodebook]] per subvector slice — hash seeds,
    //    decimal-summed means, DESC-tie [[cellOf]] assignment), each
    //    vector quantizes to 8 six-bit ids, and the approximate pass
    //    is a TRUE ADC scan: per query the 8×64 partial-dot lookup
    //    tables ([[adcLut]]) and norm are built once on the
    //    broadcast side, |recon| is hoisted once per coded row
    //    ([[pqReconNorm]] — subspaces concatenate, so |recon|² =
    //    Σ_s |c_s|²), and each pair costs 8 array lookups + adds
    //    ([[adcScore]]: Σ_s dot(q_s, c_s) IS dot(q, concat)).
    //    4dp-round before the candidate rank (the round-before-rank
    //    rule), top-$PqRerankWidth per query re-ranked with exact
    //    cosines. The scan is LINEAR per query (flat-PQ: compression
    //    is the win, not pruning) over the capped query subset — the
    //    q60 cap discipline, mirrored in the oracle; the probe-
    //    PRUNED composition is the persisted IVF-PQ arm (q166),
    //    which stores these codes at write time. The oracle replays
    //    the whole apparatus: 8 independent subspace k-means builds,
    //    code assignment, the same Σ_s-grouped ADC score, ADC rank,
    //    exact re-rank.
    Q("q165_pq_adc_search",
      (s, d) => pqAdcOn(t(s, d).embeddings),
      Some(pqAdcOracleSql),
      "product-quantization ADC scan (8x8-dim subspace codebooks, " +
        "6-byte codes) + exact re-rank of the top candidates"),

    // -- q166: IVF-PQ search — the persisted composition of q128's
    //    cell-pruned probe and q165's 6-byte ADC scan, the plan a
    //    100 TB vector store actually serves: the stored cells carry
    //    each row's PQ code written at assign time ([[IvfIndex
    //    .assign]], round 13), the probe reads ~nprobe/k of the
    //    partitions under dynamic partition pruning, and the
    //    approximate pass's scan reads ONLY (cell, vec_id, pq0..7) —
    //    neither the float vectors nor q147's int8 codes, so the
    //    quantizer bytes drop 64× vs raw and 16× vs SQ. Exact
    //    re-rank fetches true vectors for the top-$PqRerankWidth
    //    candidates only. The oracle replays everything: the IVF
    //    k-means build, the stored primary assignment, the 8
    //    subspace k-means builds, the stored codes, the probe, the
    //    ADC rank inside probed cells, and the exact re-rank.
    //    SimilaritySpec pins recall vs q60 and that the ADC scan's
    //    ReadSchema carries the pq columns WITHOUT embedding or code.
    Q("q166_ivf_pq_search",
      (s, d) => IvfIndex.pqQuery(s, SharedStages.ivfIndexPath(s, d),
        querySubset(t(s, d).embeddings),
        IvfNProbe, topK = 5, rerankWidth = PqRerankWidth),
      Some(ivfPqOracleSql),
      "IVF-PQ: cell-pruned 6-byte ADC scan (neither vectors nor SQ " +
        "codes read) + exact re-rank of the top candidates"),

    // -- q168: PQ-BOOK HEALTH — q144's audit for the ADC tier: per
    //    subspace, off the STORED index alone, live-cell count (dead
    //    codes = wasted code space), the largest cell's share (a hot
    //    code degrades ADC ordering the way a hot IVF cell degrades
    //    probe cost), and mean subvector-to-coded-centroid cosine
    //    (reconstruction cohesion — the PQ staleness signal; drifting
    //    arrivals coded under old books cohere worse, and the
    //    rebuild cadence re-trains). 6dp-round each cosine, decimal
    //    sum, one divide, 4dp surface (q144/q126's rule). The oracle
    //    replays the 8 subspace k-means builds AND the stored code
    //    assignment, then re-derives every statistic — so the hash
    //    match proves the stored codes are the k-means codes the
    //    build claims, subspace by subspace.
    Q("q168_pq_book_health",
      (s, d) => IvfIndex.pqHealth(s, SharedStages.ivfIndexPath(s, d)),
      Some(pqHealthOracleSql),
      "per-subspace PQ codebook health: live cells, code skew, " +
        "reconstruction cohesion (rebuild signal for the ADC tier)"),

    // -- q169: IVF-PQ SERVING on a FRAGMENTED store — q166's search
    //    run against the store shape a deployment actually has
    //    mid-maintenance-cycle: a base build plus two appended
    //    epochs whose rows were assigned and PQ-coded under the
    //    STORED (base-trained) codebook and books, exactly
    //    [[IvfIndex.appendEpoch]]'s contract. Three epoch file sets,
    //    two write times, one pinned model — and the ADC scan still
    //    reads only (cell, vec_id, pq0..7) from the probed
    //    partitions of every epoch. The oracle replays the build
    //    over the base slice ONLY (the q154 pre-arrival-slice
    //    discipline) and codes the full corpus under those books
    //    ([[pqSubspaceCtes]]'s codeSrc seam), so the hash match
    //    proves the appended epochs' stored codes are the pinned
    //    books' codes — the composition q166 could not witness on
    //    its single-epoch store. SimilaritySpec adds the measured
    //    on-disk byte-cut of the quantizer columns vs the vector
    //    column across the fragmented epochs.
    Q("q169_fragmented_ivf_pq",
      (s, d) => IvfIndex.pqQuery(s,
        SharedStages.fragmentedIvfIndexPath(s, d),
        querySubset(t(s, d).embeddings),
        IvfNProbe, topK = 5, rerankWidth = PqRerankWidth),
      Some(ivfPqFragOracleSql),
      "IVF-PQ search on a fragmented store (base + 2 appended " +
        "epochs coded under the pinned base-trained books)"),

    // -- q171: RESIDUAL-PQ search — the classic IVF-ADC refinement
    //    and the round-14 verdict's last named ANN-quality gap: the
    //    subspace books train and code r = v − c_cell, spending the
    //    code space on within-cell geometry (see [[residualPqOn]]
    //    for the cosine-faithful score decomposition and the O(1)-
    //    per-pair hoisting; SimilaritySpec measures recall vs q166
    //    at equal bytes). The oracle extends q166's full replay by
    //    the residual-subtraction CTE: IVF build, assignment,
    //    residuals, 8 subspace builds OVER the residuals, coding,
    //    per-row |c_cell + recon| re-derivation, probed ADC rank,
    //    exact re-rank — so the hash match proves the whole
    //    residual pipeline end to end.
    Q("q171_residual_pq",
      (s, d) => residualPqOn(t(s, d).embeddings),
      Some(residualPqOracleSql),
      "residual product quantization (codes on v - c_cell): " +
        "cell-pruned ADC scan + exact re-rank, cosine-faithful"),

    // -- q172: the residual tier PERSISTED AND FRAGMENTED — q171's
    //    formulation served the way q169 serves the raw tier: the
    //    store's base build trains the cell codebook + residual
    //    books over the base slice, two appended epochs are
    //    assigned and residual-coded under the STORED model
    //    ([[IvfIndex]] `residualPq` mode, carried on the sidecar so
    //    query/append/rebuild can never mix formulations), and the
    //    ADC scan still reads ONLY (cell, vec_id, pq0..7) — |recon|
    //    derives from (cell, code) via the precomputed norm tables
    //    ([[residNormTables]]), so the residual tier's scan bytes
    //    equal the raw tier's. The oracle composes q169's
    //    fragmented replay (build over the base slice, code the
    //    full corpus) with q171's residual CTE: train `rsrcb`
    //    (residuals of base rows), code `rsrc` (all rows) — the
    //    hash match proves the appended epochs' stored codes are
    //    the pinned residual books' codes over the pinned cell
    //    centroids.
    Q("q172_residual_ivf_pq",
      (s, d) => IvfIndex.pqQuery(s,
        SharedStages.fragmentedResidualIvfIndexPath(s, d),
        querySubset(t(s, d).embeddings),
        IvfNProbe, topK = 5, rerankWidth = PqRerankWidth),
      Some(residualIvfPqFragOracleSql),
      "residual IVF-PQ served from a fragmented store (appends " +
        "residual-coded under the pinned base-trained model)")
  )

  /** The q169 oracle: the q166 chain with the build replay RESTRICTED
    * to the base slice (vec_id % 4 != 0 — the rows the stored index
    * was built over) while assignment, coding, the probe, the ADC
    * rank and the exact re-rank all run over the FULL corpus CTE
    * `ea` — the stored-codebook append contract, replayed.
    */
  private def ivfPqFragOracleSql: String = {
    val sub = (0 until PqSubspaces)
      .map(s => pqSubspaceCtes(s, codeSrc = "ea")).mkString(",\n    ")
    val reconJoin = (0 until PqSubspaces).map(s =>
      s"JOIN cd$s ON cd$s.vec_id = ea.vec_id " +
        s"JOIN c${s}2 cb$s ON cb$s.c = cd$s.c").mkString(" ")
    val cvs = (0 until PqSubspaces).map(s => s"cb$s.cv AS cv$s")
      .mkString(", ")
    val num = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim + 1; val hi = (s + 1) * PqSubDim
      s"list_dot_product(eq.v[$lo:$hi], r.cv$s)" }
      .mkString("\n          + ")
    val rn2 = (0 until PqSubspaces).map(s =>
      s"list_dot_product(r.cv$s, r.cv$s)").mkString(" + ")
    s"""WITH ${kmeansBuildCtesWhere("WHERE vec_id % 4 <> 0")},
    ea AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ${probeSql("c2", "pr", IvfNProbe, src = "ea")},
    assigned AS (SELECT vec_id, c AS cell FROM pr WHERE rk = 1),
    qc AS (
      SELECT vec_id AS query_id, c AS cell FROM pr
      WHERE vec_id % 100 = 0 AND vec_id < $ExactBaselineVecCap),
    $sub,
    recon AS (
      SELECT ea.vec_id, $cvs FROM ea $reconJoin),
    approx AS (
      SELECT qc.query_id, a.vec_id,
        ROUND(($num)
          / (sqrt(list_dot_product(eq.v, eq.v))
           * sqrt($rn2)), 4) AS ascore
      FROM qc JOIN assigned a ON a.cell = qc.cell
        JOIN recon r ON r.vec_id = a.vec_id
        JOIN ea eq ON eq.vec_id = qc.query_id
      WHERE a.vec_id <> qc.query_id),
    cand AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY ascore DESC NULLS LAST, vec_id) AS crk
        FROM approx) t WHERE crk <= $PqRerankWidth),
    exact AS (
      SELECT cand.query_id, cand.vec_id AS neighbor_id,
        list_dot_product(ev.v, eq.v)
          / (sqrt(list_dot_product(ev.v, ev.v))
           * sqrt(list_dot_product(eq.v, eq.v))) AS score
      FROM cand JOIN ea ev ON ev.vec_id = cand.vec_id
        JOIN ea eq ON eq.vec_id = cand.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
        ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY score DESC, neighbor_id) AS rk
      FROM exact)
    SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""
  }

  /** The q171 oracle: the q166 chain with the RESIDUAL subtraction
    * CTE spliced between assignment and the subspace builds — the
    * books train AND code over `rsrc` (v − c_cell), |recon| is
    * re-derived per row from (cell, code) as Σ_s |c_sub + b_s|²
    * (each inner sum a `list_dot_product(l, l)` over the element-
    * wise sum list — [[residReconNorm]]'s exact fold order), and the
    * ADC numerator gains the leading dot(q, c_cell) term. Probe, 4dp
    * ADC rank, exact re-rank: q166's verbatim.
    */
  private def residualPqOracleSql: String = {
    val sub = (0 until PqSubspaces)
      .map(s => pqSubspaceCtes(s, codeSrc = "rsrc", trainSrc = "rsrc"))
      .mkString(",\n    ")
    val reconJoin = (0 until PqSubspaces).map(s =>
      s"JOIN cd$s ON cd$s.vec_id = rsrc.vec_id " +
        s"JOIN c${s}2 cb$s ON cb$s.c = cd$s.c").mkString(" ")
    val cvs = (0 until PqSubspaces).map(s => s"cb$s.cv AS cv$s")
      .mkString(", ")
    val recons = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim
      s"list_transform(range(1, ${PqSubDim + 1}), " +
        s"i -> cc.cv[$lo + i] + cb$s.cv[i]) AS l$s"
    }.mkString(",\n        ")
    val num = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim + 1; val hi = (s + 1) * PqSubDim
      s"list_dot_product(eq.v[$lo:$hi], r.cv$s)" }
      .mkString("\n          + ")
    val rn2 = (0 until PqSubspaces).map(s =>
      s"list_dot_product(r.l$s, r.l$s)").mkString(" + ")
    s"""WITH $kmeansBuildCtes,
    ${probeSql("c2", "pr", IvfNProbe)},
    assigned AS (SELECT vec_id, c AS cell FROM pr WHERE rk = 1),
    qc AS (
      SELECT vec_id AS query_id, c AS cell FROM pr
      WHERE vec_id % 100 = 0 AND vec_id < $ExactBaselineVecCap),
    rsrc AS (
      SELECT e.vec_id,
        list_transform(range(1, ${Dim + 1}), i -> e.v[i] - c2.cv[i]) AS v
      FROM e JOIN assigned a ON a.vec_id = e.vec_id
        JOIN c2 ON c2.c = a.cell),
    $sub,
    recon AS (
      SELECT rsrc.vec_id, $cvs,
        $recons
      FROM rsrc JOIN assigned a2 ON a2.vec_id = rsrc.vec_id
        JOIN c2 cc ON cc.c = a2.cell $reconJoin),
    approx AS (
      SELECT qc.query_id, a.vec_id,
        ROUND((list_dot_product(eq.v, cc.cv)
          + $num)
          / (sqrt(list_dot_product(eq.v, eq.v))
           * sqrt($rn2)), 4) AS ascore
      FROM qc JOIN assigned a ON a.cell = qc.cell
        JOIN c2 cc ON cc.c = a.cell
        JOIN recon r ON r.vec_id = a.vec_id
        JOIN e eq ON eq.vec_id = qc.query_id
      WHERE a.vec_id <> qc.query_id),
    cand AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY ascore DESC NULLS LAST, vec_id) AS crk
        FROM approx) t WHERE crk <= $PqRerankWidth),
    exact AS (
      SELECT cand.query_id, cand.vec_id AS neighbor_id,
        list_dot_product(ev.v, eq.v)
          / (sqrt(list_dot_product(ev.v, ev.v))
           * sqrt(list_dot_product(eq.v, eq.v))) AS score
      FROM cand JOIN e ev ON ev.vec_id = cand.vec_id
        JOIN e eq ON eq.vec_id = cand.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
        ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY score DESC, neighbor_id) AS rk
      FROM exact)
    SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""
  }

  /** The q172 oracle: q169's fragmented replay (k-means build over
    * the base slice, assignment/probe/coding over the FULL corpus)
    * composed with q171's residual CTE — the books train on `rsrcb`
    * (base rows' residuals under the base-trained centroids) and
    * code `rsrc` (every row's residual), |recon| re-derives from
    * (cell, code), and the ADC numerator carries the dot(q, c_cell)
    * leading term.
    */
  private def residualIvfPqFragOracleSql: String = {
    val sub = (0 until PqSubspaces)
      .map(s => pqSubspaceCtes(s, codeSrc = "rsrc", trainSrc = "rsrcb"))
      .mkString(",\n    ")
    val reconJoin = (0 until PqSubspaces).map(s =>
      s"JOIN cd$s ON cd$s.vec_id = rsrc.vec_id " +
        s"JOIN c${s}2 cb$s ON cb$s.c = cd$s.c").mkString(" ")
    val cvs = (0 until PqSubspaces).map(s => s"cb$s.cv AS cv$s")
      .mkString(", ")
    val recons = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim
      s"list_transform(range(1, ${PqSubDim + 1}), " +
        s"i -> cc.cv[$lo + i] + cb$s.cv[i]) AS l$s"
    }.mkString(",\n        ")
    val num = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim + 1; val hi = (s + 1) * PqSubDim
      s"list_dot_product(eq.v[$lo:$hi], r.cv$s)" }
      .mkString("\n          + ")
    val rn2 = (0 until PqSubspaces).map(s =>
      s"list_dot_product(r.l$s, r.l$s)").mkString(" + ")
    s"""WITH ${kmeansBuildCtesWhere("WHERE vec_id % 4 <> 0")},
    ea AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ${probeSql("c2", "pr", IvfNProbe, src = "ea")},
    assigned AS (SELECT vec_id, c AS cell FROM pr WHERE rk = 1),
    qc AS (
      SELECT vec_id AS query_id, c AS cell FROM pr
      WHERE vec_id % 100 = 0 AND vec_id < $ExactBaselineVecCap),
    rsrc AS (
      SELECT ea.vec_id,
        list_transform(range(1, ${Dim + 1}), i -> ea.v[i] - c2.cv[i]) AS v
      FROM ea JOIN assigned a ON a.vec_id = ea.vec_id
        JOIN c2 ON c2.c = a.cell),
    rsrcb AS (SELECT * FROM rsrc WHERE vec_id % 4 <> 0),
    $sub,
    recon AS (
      SELECT rsrc.vec_id, $cvs,
        $recons
      FROM rsrc JOIN assigned a2 ON a2.vec_id = rsrc.vec_id
        JOIN c2 cc ON cc.c = a2.cell $reconJoin),
    approx AS (
      SELECT qc.query_id, a.vec_id,
        ROUND((list_dot_product(eq.v, cc.cv)
          + $num)
          / (sqrt(list_dot_product(eq.v, eq.v))
           * sqrt($rn2)), 4) AS ascore
      FROM qc JOIN assigned a ON a.cell = qc.cell
        JOIN c2 cc ON cc.c = a.cell
        JOIN recon r ON r.vec_id = a.vec_id
        JOIN ea eq ON eq.vec_id = qc.query_id
      WHERE a.vec_id <> qc.query_id),
    cand AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY ascore DESC NULLS LAST, vec_id) AS crk
        FROM approx) t WHERE crk <= $PqRerankWidth),
    exact AS (
      SELECT cand.query_id, cand.vec_id AS neighbor_id,
        list_dot_product(ev.v, eq.v)
          / (sqrt(list_dot_product(ev.v, ev.v))
           * sqrt(list_dot_product(eq.v, eq.v))) AS score
      FROM cand JOIN ea ev ON ev.vec_id = cand.vec_id
        JOIN ea eq ON eq.vec_id = cand.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
        ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY score DESC, neighbor_id) AS rk
      FROM exact)
    SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""
  }

  /** The q164 oracle: clustered-corpus construction, hash-seeded
    * k-means build replay over its pre-arrival slice, stored primary
    * assignment, batch probe at production width, and the exhaustive
    * best — both arms ranked 4dp-round-first with the id tie-break.
    */
  private def clusteredProbeCaptureOracleSql: String =
    s"""WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
      FROM embeddings WHERE vec_id < $ExactBaselineVecCap),
    cl AS (
      SELECT m.vec_id,
        list($ClusterScale * c.ev[r.i + 1] + m.ev[r.i + 1] ORDER BY r.i)
          AS v
      FROM base m
        JOIN base c ON c.vec_id = m.vec_id - (m.vec_id % $ClusterStride),
        (SELECT unnest(range(0, $Dim)) AS i) r
      GROUP BY m.vec_id),
    e AS (
      SELECT vec_id, v, CAST(vec_id % $IvfCells AS INT) AS seed
      FROM cl WHERE vec_id % 5 <> 0),
    $kmeansRoundsFromE,
    ${probeSql("c2", "ca", 1)},
    b AS (SELECT vec_id, v FROM cl WHERE vec_id % 5 = 0),
    ${probeSql("c2", "pb", IvfNProbe, "b")},
    pscored AS (
      SELECT pb.vec_id AS b_id, ca.vec_id AS c_id,
        ROUND(list_dot_product(bb.v, e.v)
          / (sqrt(list_dot_product(bb.v, bb.v))
           * sqrt(list_dot_product(e.v, e.v))), 4) AS cos
      FROM pb JOIN ca ON ca.c = pb.c
        JOIN b bb ON bb.vec_id = pb.vec_id
        JOIN e ON e.vec_id = ca.vec_id),
    pbest AS (
      SELECT b_id, c_id, cos FROM (
        SELECT b_id, c_id, cos,
          ROW_NUMBER() OVER (PARTITION BY b_id
            ORDER BY cos DESC, c_id) AS rk
        FROM pscored) t WHERE rk = 1),
    escored AS (
      SELECT b.vec_id AS b_id, e.vec_id AS c_id,
        ROUND(list_dot_product(b.v, e.v)
          / (sqrt(list_dot_product(b.v, b.v))
           * sqrt(list_dot_product(e.v, e.v))), 4) AS cos
      FROM b CROSS JOIN e),
    ebest AS (
      SELECT b_id, c_id, cos FROM (
        SELECT b_id, c_id, cos,
          ROW_NUMBER() OVER (PARTITION BY b_id
            ORDER BY cos DESC, c_id) AS rk
        FROM escored) t WHERE rk = 1)
    SELECT eb.b_id AS vec_id, eb.c_id AS exact_best,
      eb.cos + 0.0 AS exact_cos,
      pb2.c_id AS probe_best, pb2.cos + 0.0 AS probe_cos,
      CAST(pb2.c_id IS NOT DISTINCT FROM eb.c_id AS INT) AS captured
    FROM ebest eb LEFT JOIN pbest pb2 ON pb2.b_id = eb.b_id
    ORDER BY vec_id"""

  /** The [[PqSubspaces]] subspace codebooks over `e` (vec_id, v) —
    * [[kmeansCodebook]]'s build (hash seeds, decimal-summed means,
    * [[cellOf]] assignment) run on each contiguous [[PqSubDim]]-dim
    * slice, but BATCHED: all subspaces ride one sub-tagged relation,
    * so each of the 1 + [[PqLloydIters]] rounds is ONE job instead
    * of [[PqSubspaces]] — first measured as 8 independent
    * kmeansCodebook calls, q165 paid 24 sequential driver jobs
    * (~12s of pure scheduling at sf0.1) for work that is value-
    * identical per (sub, cell) group. k×subdim×subspaces model
    * state (8×8×64 doubles), the codebook-literal tradition:
    * collecting model parameters is not collecting data.
    */
  private[queries] def pqCodebooks(e: DataFrame): Seq[Seq[(Int, Seq[Double])]] = {
    val sliced = fanOut(e).select(col("vec_id"),
        posexplode(array((0 until PqSubspaces).map(s =>
          slice(col("v"), s * PqSubDim + 1, PqSubDim)): _*)))
      .toDF("vec_id", "sub", "embedding")
    val seedKey = pmod(col("vec_id"), lit(PqCentroids))
    var books = pqMeans(sliced, seedKey)
    for (_ <- 1 to PqLloydIters)
      books = pqMeans(sliced, subCellOf(col("sub"), col("embedding"), books))
    books
  }

  /** Element-wise decimal-sum means per (sub, key) — [[means]] with
    * the subspace tag carried through, returned sub-major.
    */
  private def pqMeans(df: DataFrame,
      key: Column): Seq[Seq[(Int, Seq[Double])]] = {
    val rows = df
      .filter(key.cast("int").isNotNull)
      .groupBy(col("sub"), key.cast("int").as("c_id"))
      .agg(
        Vectors.vecDecimalSum(Vectors.asDouble(col("embedding"))).as("sums"),
        count(col("embedding")).as("n"))
      .select(col("sub"), col("c_id"),
        transform(col("sums"), x => x / col("n")).as("c_emb"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    (0 until PqSubspaces).map { s =>
      rows.filter(_._1 == s).map(r => r._2 -> r._3).sortBy(_._1).toSeq
    }
  }

  /** [[cellOf]] dispatched on the subspace tag — one expression
    * assigning every sub-tagged row under its own codebook.
    */
  private def subCellOf(sub: Column, v: Column,
      books: Seq[Seq[(Int, Seq[Double])]]): Column =
    books.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (b, s)) => when(sub === s, cellOf(v, b)).otherwise(acc)
    }

  /** One subspace's PQ code per row: [[cellOf]] over the subvector —
    * the same DESC-tie nearest-centroid argmax every codebook
    * assignment here uses.
    */
  private[queries] def pqCodeCols(v: Column,
      books: Seq[Seq[(Int, Seq[Double])]]): Seq[Column] =
    books.zipWithIndex.map { case (b, s) =>
      cellOf(slice(v, s * PqSubDim + 1, PqSubDim), b).as(s"pq$s") }

  /** code → centroid as a constant-folded map literal (keyed by
    * c_id, NOT position: a Lloyd round can empty a seed cell, so
    * surviving ids need not be dense).
    */
  private[queries] def bookLit(cents: Seq[(Int, Seq[Double])]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    // one literal node, not k×(dim+1) — the centsLit rationale
    ColumnBridge.column(Literal.create(cents.toMap,
      MapType(IntegerType, ArrayType(DoubleType, containsNull = false),
        valueContainsNull = false)))
  }

  /** Slot code+1 → |centroid|² for one subspace book, as a constant-
    * folded 64-slot array literal (ids emptied by a Lloyd round get
    * null — they are never produced as codes, so never looked up).
    * Scala's foldLeft multiplies-and-adds in the same left-to-right
    * index order as the oracle's `list_dot_product(cv, cv)`, so the
    * literal is bit-equal to the replayed value.
    */
  private[queries] def bookSqNorms(book: Seq[(Int, Seq[Double])]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val m = book.toMap
    // one literal node, not 64 — the centsLit rationale; the fold
    // order (left-assoc multiply-add) is unchanged
    val values: Seq[Any] = (0 until PqCentroids).map { id =>
      m.get(id) match {
        case Some(c) => java.lang.Double.valueOf(
          c.foldLeft(0.0)((a, x) => a + x * x))
        case None => null
      }
    }
    ColumnBridge.column(Literal.create(values,
      ArrayType(DoubleType, containsNull = true)))
  }

  /** |reconstruction| once per CODED ROW: subspaces concatenate, so
    * |recon|² = Σ_s |c_{s,code_s}|² — [[PqSubspaces]] O(1) array
    * lookups against [[bookSqNorms]] literals and a left-assoc add
    * chain; no 64-dim vector is materialized. Hoist this into the
    * codes projection so the per-pair ADC score never recomputes it.
    */
  private[queries] def pqReconNorm(books: Seq[Seq[(Int, Seq[Double])]],
      codes: Seq[Column]): Column =
    sqrt(books.zipWithIndex.map { case (b, s) =>
      element_at(bookSqNorms(b), codes(s) + 1) }.reduce(_ + _))

  /** One subspace's ADC lookup table for a query vector: slot
    * code+1 = dot(q_sub_s, centroid_code) — the classic per-query
    * [[PqSubspaces]]×[[PqCentroids]] table of partial dots, computed
    * ONCE per query row (the broadcast side) so each (query × code)
    * pair costs [[PqSubspaces]] array indexes + adds instead of a
    * 64-dim cosine against a freshly allocated reconstruction.
    * Explicit left-assoc product-sum = the oracle's sequential
    * `list_dot_product` order, term for term.
    */
  private[queries] def adcLut(qv: Column, book: Seq[(Int, Seq[Double])],
      s: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val lo = s * PqSubDim
    val m = book.toMap
    // centroids as ONE literal array-of-arrays node and a small
    // transform lambda (8 products) — NOT 64 unrolled dot
    // expressions, whose ~4096-term projection cost seconds of
    // codegen compile per plan and dwarfed the scan it was hoisted
    // out of; round 16 collapses the remaining 64×8 lit() tree to a
    // single Literal node (the centsLit rationale)
    val bookArr = ColumnBridge.column(Literal.create(
      (0 until PqCentroids).map[Any](id => m.get(id).orNull),
      ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = true)))
    transform(bookArr, c =>
      (0 until PqSubDim).map(i =>
        element_at(qv, lo + i + 1) * element_at(c, i + 1))
        .reduce(_ + _))
  }

  /** The per-pair ADC score off hoisted state: Σ_s lut_s[code_s]
    * over (qnorm · rnorm). Numerator grouping (per-subspace partial
    * dots summed left-assoc) and denominator grouping (per-subspace
    * |c|² summed under one sqrt) are mirrored exactly in the q165/
    * q166 oracles, so 4dp round-before-rank stays bit-stable.
    */
  private[queries] def adcScore(codes: Seq[Column], luts: Seq[Column],
      qnorm: Column, rnorm: Column): Column =
    codes.zip(luts).map { case (cd, l) =>
      element_at(l, cd + 1) }.reduce(_ + _) / (qnorm * rnorm)

  /** q165's body: learn the subspace codebooks, code every vector
    * (hoisting the reconstruction norm into the SAME projection —
    * once per row), build each query's ADC lookup tables + norm once
    * on the broadcast side, then score every pair as
    * [[PqSubspaces]] O(1) lookups + adds ([[adcScore]] — 4dp round
    * before the candidate rank), exact re-rank the top `rerankWidth`
    * to `topK`. Output matches q64/q147's shape.
    */
  def pqAdcOn(emb: DataFrame,
              rerankWidth: Int = PqRerankWidth, topK: Int = 5): DataFrame = {
    // fanned AND pinned once: e feeds the 3 book-training passes, the
    // codes projection and the exact re-rank — unpinned, each pass
    // re-ran the scan + the fan-out exchange (the q171 resid note)
    val e = fanOut(emb.select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))).localCheckpoint(true)
    val books = pqCodebooks(e)
    val pqCols = (0 until PqSubspaces).map(s => col(s"pq$s"))
    val codes = e.select(col("vec_id") +: pqCodeCols(col("v"), books): _*)
      .withColumn("rnorm", pqReconNorm(books, pqCols))
    val q = querySubset(emb).select(col("query_id"),
      Vectors.asDouble(col("q_emb")).as("qv"))
    val qlut = q.select(col("query_id") +:
      Vectors.norm(col("qv")).as("qnorm") +:
      books.zipWithIndex.map { case (b, s) =>
        adcLut(col("qv"), b, s).as(s"lut$s") }: _*)
    val luts = (0 until PqSubspaces).map(s => col(s"lut$s"))
    val approx = codes.crossJoin(broadcast(qlut))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(adcScore(pqCols, luts, col("qnorm"), col("rnorm")), 4)
          .as("ascore"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("vec_id"))
    val cand = approx.withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= rerankWidth)
      .select(col("query_id"), col("vec_id"))
    val exact = cand.join(e, Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosine(col("v"), col("qv")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    exact.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .orderBy(col("query_id"), col("rk"))
  }

  /** |reconstruction| for a RESIDUAL-coded row — cell-dependent,
    * unlike [[pqReconNorm]]: recon = c_cell + concat_s(b_s[code_s]),
    * so |recon|² = Σ_s Σ_i (c_sub[i] + b[i])², folded index-ascending
    * per subspace (the oracle's `list_dot_product(l_s, l_s)`) and
    * left-assoc across subspaces. Rides the codes projection — once
    * per row, never per pair.
    */
  private[queries] def residReconNorm(
      books: Seq[Seq[(Int, Seq[Double])]], centMap: Column,
      cell: Column, codes: Seq[Column]): Column =
    sqrt(books.zipWithIndex.map { case (b, s) =>
      val cSub = slice(element_at(centMap, cell),
        s * PqSubDim + 1, PqSubDim)
      aggregate(zip_with(cSub, element_at(bookLit(b), codes(s)), _ + _),
        lit(0.0), (a, t) => a + t * t)
    }.reduce(_ + _))

  /** `out` = `vecCol` − c_cell over rows carrying a `cell` column —
    * the residual subtraction every residual-PQ path shares,
    * dispatched on codebook size exactly like [[probeCells]]: below
    * [[CodebookLiteralMaxCells]] the centroid is one constant-folded
    * map-literal lookup (fused, no join); above it the k×dim literal
    * would blow up plan size and codegen (the probeCells rationale),
    * so the codebook joins in as a BROADCAST RELATION on the cell
    * key. Values are identical — the joined `c_emb` IS the array the
    * literal lookup returns — only the plan shape differs
    * (byte-equality pinned in IvfIndexSpec).
    */
  private[queries] def subtractCell(rows: DataFrame, vecCol: String,
      cents: Seq[(Int, Seq[Double])], out: String,
      maxLitCells: Int = CodebookLiteralMaxCells): DataFrame =
    if (cents.size <= maxLitCells)
      rows.withColumn(out,
        zip_with(col(vecCol), element_at(bookLit(cents), col("cell")), _ - _))
    else
      rows.join(broadcast(centsRel(rows, cents)
          .select(col("c_id").as("cell"), col("c_emb"))), Seq("cell"))
        .withColumn(out, zip_with(col(vecCol), col("c_emb"), _ - _))
        .drop("c_emb")

  /** `out` = dot(`vecCol`, c_cell) — the reconstruction's leading
    * term for a residual-coded store, with [[subtractCell]]'s
    * literal-vs-broadcast dispatch.
    */
  private[queries] def cellDot(rows: DataFrame, vecCol: String,
      cents: Seq[(Int, Seq[Double])], out: String,
      maxLitCells: Int = CodebookLiteralMaxCells): DataFrame =
    if (cents.size <= maxLitCells)
      rows.withColumn(out,
        Vectors.dot(col(vecCol), element_at(bookLit(cents), col("cell"))))
    else
      rows.join(broadcast(centsRel(rows, cents)
          .select(col("c_id").as("cell"), col("c_emb"))), Seq("cell"))
        .withColumn(out, Vectors.dot(col(vecCol), col("c_emb")))
        .drop("c_emb")

  /** The residual relation (vec_id, v = embedding − c_cell) of a
    * corpus under a codebook — the training/coding input of every
    * residual-PQ path (q171 in-query; [[IvfIndex.build]] with
    * `residualPq = true`). Primary assignment via [[probeCells]]
    * (…, 1) — probeSql's rk = 1 rule — subtraction in index order,
    * [[subtractCell]]'s size dispatch (a large-k residual build
    * must never fold the cell codebook into plan literals).
    */
  private[queries] def residualsUnder(emb: DataFrame,
      cents: Seq[(Int, Seq[Double])]): DataFrame =
    subtractCell(
      probeCells(
        emb.select(col("vec_id"),
          Vectors.asDouble(col("embedding")).as("v")),
        Seq("vec_id", "v"), "v", cents, 1),
      "v", cents, "rv")
      .select(col("vec_id"), col("rv").as("v"))

  /** Per-subspace (cell, code) → |c_sub + b_code|² lookup tables as
    * constant-folded literals (map keyed by cell id — ids can be
    * non-dense — of a [[PqCentroids]]-slot array), so a residual
    * store's |recon| derives from (cell, pq0..7) alone and the ADC
    * scan stays at ~6 quantizer bytes/row (no stored norm, no
    * vectors). Each entry is the ascending fold Σ_i (c[i]+b[i])² —
    * bit-equal to the oracle's `list_dot_product(l, l)` over the
    * same element-wise sum list (the [[bookSqNorms]] precedent).
    * Size k×[[PqSubspaces]]×[[PqCentroids]] doubles — model state,
    * the codebook-literal tradition; past
    * [[CodebookLiteralMaxCells]] the serving path switches to
    * [[residNormRel]] (the same values as a broadcast relation —
    * persisted at build time as IvfIndex's `_pqnorms` sidecar).
    */
  private[queries] def residNormTables(cents: Seq[(Int, Seq[Double])],
      books: Seq[Seq[(Int, Seq[Double])]]): Seq[Column] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    // one literal node per subspace, not k×(codes+1) — the centsLit
    // rationale; every value and its fold order are unchanged
    books.zipWithIndex.map { case (b, s) =>
      val bm = b.toMap
      val table: Map[Int, Seq[Any]] = cents.map { case (cid, c) =>
        val cSub = c.slice(s * PqSubDim, (s + 1) * PqSubDim)
        cid -> (0 until PqCentroids).map[Any] { code =>
          bm.get(code) match {
            case Some(bc) => java.lang.Double.valueOf(
              cSub.zip(bc).foldLeft(0.0) {
                case (a, (x, y)) => val t = x + y; a + t * t })
            case None => null
          }
        }
      }.toMap
      ColumnBridge.column(Literal.create(table,
        MapType(IntegerType, ArrayType(DoubleType, containsNull = true),
          valueContainsNull = false)))
    }
  }

  /** [[residReconNorm]] off the precomputed [[residNormTables]] —
    * the STORED-tier form: 8 two-level O(1) lookups + adds per coded
    * row, no vector, no stored norm. Same grouping as the oracle's
    * sqrt(Σ_s list_dot_product(l_s, l_s)).
    */
  private[queries] def residReconNormStored(tables: Seq[Column],
      cell: Column, codes: Seq[Column]): Column =
    sqrt(tables.zip(codes).map { case (tbl, cd) =>
      element_at(element_at(tbl, cell), cd + 1)
    }.reduce(_ + _))

  /** [[residNormTables]] as a RELATION — one row per cell,
    * `nsq[s][code] = |c_sub + b_code|²` — the k-proportional form a
    * large-k residual store serves from (and what
    * [[IvfIndex.build]] persists as the `_pqnorms` sidecar): past
    * [[CodebookLiteralMaxCells]] the literal map would be
    * k×[[PqSubspaces]]×[[PqCentroids]] plan constants, so the norms
    * BROADCAST-join on the cell key instead. Only the BOOKS (8×64×8
    * doubles, k-independent) fold into the expression. Each entry is
    * the same left-assoc (c[i]+b[i])² chain as the literal form —
    * (0.0 + x) ≡ x in IEEE, so the two forms are bit-equal
    * (IvfIndexSpec pins it).
    */
  private[queries] def residNormRel(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Int, Seq[Double])],
      books: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    import spark.implicits._
    val centsDf = cents.toDF("cell", "c_emb")
    val nsq = array(books.zipWithIndex.map { case (b, s) =>
      val bm = b.toMap
      val bookArr = array((0 until PqCentroids).map { code =>
        bm.get(code) match {
          case Some(bc) => array(bc.map(lit(_)): _*)
          case None     => lit(null).cast("array<double>")
        }
      }: _*)
      transform(bookArr, bc =>
        (0 until PqSubDim).map { i =>
          val t = element_at(col("c_emb"), s * PqSubDim + i + 1) +
            element_at(bc, i + 1)
          t * t
        }.reduce(_ + _))
    }: _*)
    centsDf.select(col("cell"), nsq.as("nsq"))
  }

  /** Per-row |recon| for a residual store off the broadcast `nsq`
    * column [[residNormRel]] carries — the large-k counterpart of
    * [[residReconNormStored]], same Σ_s grouping under one sqrt.
    */
  private[queries] def residReconNormRel(codes: Seq[Column]): Column =
    sqrt(codes.zipWithIndex.map { case (cd, s) =>
      element_at(element_at(col("nsq"), s + 1), cd + 1)
    }.reduce(_ + _))

  /** q171's body — RESIDUAL product quantization, the classic
    * IVF-ADC refinement and [[PqSubspaces]]' long-named untaken
    * trade, now taken: the books learn and the codes quantize
    * r = v − c_cell (each vector's offset from its IVF centroid)
    * instead of the raw subvectors, so the 64 ids per subspace spend
    * their code space on the WITHIN-CELL geometry the probe has
    * already narrowed to, not on re-describing the coarse layout the
    * cell id already pins. The score stays COSINE-FAITHFUL — it is
    * the exact cosine against the reconstruction:
    *
    *   recon = c_cell + concat_s(b_s[code_s])
    *   cos(q, recon) = (dot(q, c_cell) + Σ_s dot(q_s, b_s[code_s]))
    *                   / (|q| · |recon|)
    *
    * and every term is O(1)-per-pair off hoisted state: the cell
    * term is one lookup into a per-(query, probed-cell) dot built
    * once broadcast-side (`qcdot` — the probe join already carries
    * the (query, cell) pair), the Σ_s is [[adcLut]] verbatim over
    * the residual books, and |recon| hoists once per coded row
    * ([[residReconNorm]] — cell-DEPENDENT here, so it rides the
    * codes projection; a persisted tier would store the float or a
    * k×[[PqSubspaces]]×[[PqCentroids]] norm-table sidecar). The
    * probe, the 4dp round-before-rank ADC cut and the exact re-rank
    * are q166's shape, so SimilaritySpec's q171-vs-q166 recall
    * comparison is equal-bytes by construction (same cell id + 8
    * six-bit codes per row, same nprobe, same rerank width). The
    * oracle replays everything: the IVF build, the assignment, the
    * residual subtraction CTE, 8 subspace k-means builds over the
    * residuals, the coding, |recon| from (cell, code), the probed
    * ADC rank and the exact re-rank.
    */
  def residualPqOn(emb: DataFrame, nprobe: Int = IvfNProbe,
                   rerankWidth: Int = PqRerankWidth,
                   topK: Int = 5,
                   onResiduals: Boolean = true): DataFrame = {
    val e = emb.select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
    val cents = kmeansCodebook(emb, IvfLloydIters, IvfCells)
    val centMap = bookLit(cents)
    // primary assignment — probeCells(…, 1), probeSql's rk = 1 rule
    val assigned = probeCells(e, Seq("vec_id", "v"), "v", cents, 1)
    // the residual subtraction — index order, like every fold here.
    // `onResiduals = false` codes the raw subvectors instead: the
    // q166 formulation in-query, kept ONLY as SimilaritySpec's
    // equal-everything-but-the-residual comparison arm.
    // pinned once: the book build's 1 + PqLloydIters jobs and the
    // codes projection would each re-run the probe + subtraction
    // lineage otherwise (~4 recomputations of k fused cosines/row)
    // fanned out BEFORE the checkpoint so the pinned partitions carry
    // cluster-width parallelism into the book builds + the codes
    // projection (4 subsequent passes; a checkpoint freezes its
    // partitioning)
    val resid = fanOut(
      (if (onResiduals) assigned.withColumn("rv",
        zip_with(col("v"), element_at(centMap, col("cell")), _ - _))
      else assigned.withColumn("rv", col("v"))))
        .localCheckpoint(true)
    val books = pqCodebooks(resid.select(col("vec_id"), col("rv").as("v")))
    val pqCols = (0 until PqSubspaces).map(s => col(s"pq$s"))
    val codes = resid.select(
        col("vec_id") +: col("cell") +: pqCodeCols(col("rv"), books): _*)
      .withColumn("rnorm",
        if (onResiduals)
          residReconNorm(books, centMap, col("cell"), pqCols)
        else pqReconNorm(books, pqCols))
    val q = querySubset(emb).select(col("query_id"),
      Vectors.asDouble(col("q_emb")).as("qv"))
    val qcells = probeCells(q, Seq("query_id", "qv"), "qv", cents, nprobe)
    val luts = (0 until PqSubspaces).map(s => col(s"lut$s"))
    // per (query, probed cell): the cell term + norm + the 8 LUTs —
    // all broadcast-side, nprobe rows per query
    val ql = qcells.select(
      col("query_id") +: col("cell") +:
        Vectors.dot(col("qv"), element_at(centMap, col("cell")))
          .as("qcdot") +:
        Vectors.norm(col("qv")).as("qnorm") +:
        books.zipWithIndex.map { case (b, s) =>
          adcLut(col("qv"), b, s).as(s"lut$s") }: _*)
    val lookups = pqCols.zip(luts).map { case (cd, l) =>
      element_at(l, cd + 1) }
    // raw codes reconstruct v directly — no cell term in the dot
    val numTerms = if (onResiduals) col("qcdot") +: lookups else lookups
    val approx = codes.join(broadcast(ql), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(numTerms.reduce(_ + _)
          / (col("qnorm") * col("rnorm")), 4).as("ascore"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("vec_id"))
    val cand = approx.withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= rerankWidth)
      .select(col("query_id"), col("vec_id"))
    val exact = cand.join(e, Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosine(col("v"), col("qv")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    exact.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .orderBy(col("query_id"), col("rk"))
  }

  /** One subspace's full replay: slice CTE `e<s>`, seed means, two
    * Lloyd rounds (DESC ties — [[cellOf]]'s rule, the
    * [[kmeansRoundsFromE]] pattern at [[PqSubDim]] dims with
    * suffixed CTE names), final code assignment `cd<s>`.
    *
    * `codeSrc`: the corpus the FINAL assignment codes. The default
    * codes the training corpus itself (q165/q166 — books and rows
    * share one epoch); the fragmented-store replay (q169) trains
    * over the base slice `e` but codes the FULL corpus CTE, exactly
    * the stored-books append contract [[IvfIndex.appendEpoch]]
    * implements.
    *
    * `trainSrc`: the (vec_id, v) relation the books TRAIN over — the
    * residual replay (q171) trains and codes the residual CTE
    * instead of the raw corpus.
    */
  private def pqSubspaceCtes(s: Int, codeSrc: String = "e",
                             trainSrc: String = "e"): String = {
    val lo = s * PqSubDim + 1
    val hi = (s + 1) * PqSubDim
    def cos(src: String, cb: String) =
      s"list_dot_product($src.v, $cb.cv) / " +
        s"(sqrt(list_dot_product($src.v, $src.v)) * " +
        s"sqrt(list_dot_product($cb.cv, $cb.cv)))"
    def meanSql(from: String, groupKey: String, mOut: String,
                cOut: String) =
      s"""$mOut AS (
      SELECT $groupKey AS c, r.i,
        CAST(SUM(CAST(e$s.v[r.i + 1] AS DECIMAL(38,6))) AS DOUBLE)
          / COUNT(*) AS mu
      FROM $from, (SELECT unnest(range(0, $PqSubDim)) AS i) r
      GROUP BY $groupKey, r.i),
    $cOut AS (SELECT c, list(mu ORDER BY i) AS cv FROM $mOut GROUP BY c)"""
    def assignSql(cIn: String, aOut: String, src: String) =
      s"""$aOut AS (
      SELECT vec_id, c FROM (
        SELECT $src.vec_id, $cIn.c,
          ROW_NUMBER() OVER (PARTITION BY $src.vec_id
            ORDER BY ${cos(src, cIn)} DESC NULLS LAST, $cIn.c DESC)
            AS rk
        FROM $src CROSS JOIN $cIn) t WHERE rk = 1)"""
    val codeSlice =
      if (codeSrc == trainSrc) ""
      else s"""ec$s AS (
      SELECT vec_id, v[$lo:$hi] AS v FROM $codeSrc),
    """
    val codeFrom = if (codeSrc == trainSrc) s"e$s" else s"ec$s"
    s"""e$s AS (
      SELECT vec_id, v[$lo:$hi] AS v,
        CAST(vec_id % $PqCentroids AS INT) AS seed
      FROM $trainSrc),
    $codeSlice${meanSql(s"e$s", s"e$s.seed", s"m${s}0", s"c${s}0")},
    ${assignSql(s"c${s}0", s"a${s}1", s"e$s")},
    ${meanSql(s"a${s}1 a JOIN e$s USING (vec_id)", "a.c",
        s"m${s}1", s"c${s}1")},
    ${assignSql(s"c${s}1", s"a${s}2", s"e$s")},
    ${meanSql(s"a${s}2 a JOIN e$s USING (vec_id)", "a.c",
        s"m${s}2", s"c${s}2")},
    ${assignSql(s"c${s}2", s"cd$s", codeFrom)}"""
  }

  /** The q165 oracle: 8 subspace k-means replays, code assignment,
    * per-subspace partial-dot ADC score (the same Σ_s grouping as
    * [[adcScore]] — numerator summed left-assoc over subspace
    * `list_dot_product`s, |recon|² the left-assoc sum of per-
    * subspace |c|² under one sqrt), 4dp ADC rank at $PqRerankWidth,
    * exact re-rank to top-5 — the q147 chain with the PQ quantizer
    * in place of SQ.
    */
  private def pqAdcOracleSql: String = {
    val sub = (0 until PqSubspaces).map(s => pqSubspaceCtes(s)).mkString(",\n    ")
    val reconJoin = (0 until PqSubspaces).map(s =>
      s"JOIN cd$s ON cd$s.vec_id = e.vec_id " +
        s"JOIN c${s}2 cb$s ON cb$s.c = cd$s.c").mkString(" ")
    val cvs = (0 until PqSubspaces).map(s => s"cb$s.cv AS cv$s")
      .mkString(", ")
    val num = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim + 1; val hi = (s + 1) * PqSubDim
      s"list_dot_product(q.v[$lo:$hi], r.cv$s)" }
      .mkString("\n          + ")
    val rn2 = (0 until PqSubspaces).map(s =>
      s"list_dot_product(r.cv$s, r.cv$s)").mkString(" + ")
    s"""WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    $sub,
    recon AS (
      SELECT e.vec_id, $cvs FROM e $reconJoin),
    q AS (
      SELECT vec_id AS query_id, v FROM e
      WHERE vec_id % 100 = 0 AND vec_id < $ExactBaselineVecCap),
    approx AS (
      SELECT q.query_id, r.vec_id,
        ROUND(($num)
          / (sqrt(list_dot_product(q.v, q.v))
           * sqrt($rn2)), 4) AS ascore
      FROM q CROSS JOIN recon r WHERE r.vec_id <> q.query_id),
    cand AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY ascore DESC NULLS LAST, vec_id) AS crk
        FROM approx) t WHERE crk <= $PqRerankWidth),
    exact AS (
      SELECT cand.query_id, cand.vec_id AS neighbor_id,
        list_dot_product(ev.v, eq.v)
          / (sqrt(list_dot_product(ev.v, ev.v))
           * sqrt(list_dot_product(eq.v, eq.v))) AS score
      FROM cand JOIN e ev ON ev.vec_id = cand.vec_id
        JOIN e eq ON eq.vec_id = cand.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
        ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY score DESC, neighbor_id) AS rk
      FROM exact)
    SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""
  }

  /** The q166 oracle: the q147 replay chain with the PQ quantizer —
    * IVF k-means build + stored assignment + probe cells
    * ([[ivfSqOracleSql]]'s machinery), 8 subspace k-means replays +
    * stored codes + reconstruction ([[pqAdcOracleSql]]'s), ADC rank
    * restricted to probed cells, exact re-rank to top-5.
    */
  private def ivfPqOracleSql: String = {
    val sub = (0 until PqSubspaces).map(s => pqSubspaceCtes(s)).mkString(",\n    ")
    val reconJoin = (0 until PqSubspaces).map(s =>
      s"JOIN cd$s ON cd$s.vec_id = e.vec_id " +
        s"JOIN c${s}2 cb$s ON cb$s.c = cd$s.c").mkString(" ")
    val cvs = (0 until PqSubspaces).map(s => s"cb$s.cv AS cv$s")
      .mkString(", ")
    val num = (0 until PqSubspaces).map { s =>
      val lo = s * PqSubDim + 1; val hi = (s + 1) * PqSubDim
      s"list_dot_product(eq.v[$lo:$hi], r.cv$s)" }
      .mkString("\n          + ")
    val rn2 = (0 until PqSubspaces).map(s =>
      s"list_dot_product(r.cv$s, r.cv$s)").mkString(" + ")
    s"""WITH $kmeansBuildCtes,
    ${probeSql("c2", "pr", IvfNProbe)},
    assigned AS (SELECT vec_id, c AS cell FROM pr WHERE rk = 1),
    qc AS (
      SELECT vec_id AS query_id, c AS cell FROM pr
      WHERE vec_id % 100 = 0 AND vec_id < $ExactBaselineVecCap),
    $sub,
    recon AS (
      SELECT e.vec_id, $cvs FROM e $reconJoin),
    approx AS (
      SELECT qc.query_id, a.vec_id,
        ROUND(($num)
          / (sqrt(list_dot_product(eq.v, eq.v))
           * sqrt($rn2)), 4) AS ascore
      FROM qc JOIN assigned a ON a.cell = qc.cell
        JOIN recon r ON r.vec_id = a.vec_id
        JOIN e eq ON eq.vec_id = qc.query_id
      WHERE a.vec_id <> qc.query_id),
    cand AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY ascore DESC NULLS LAST, vec_id) AS crk
        FROM approx) t WHERE crk <= $PqRerankWidth),
    exact AS (
      SELECT cand.query_id, cand.vec_id AS neighbor_id,
        list_dot_product(ev.v, eq.v)
          / (sqrt(list_dot_product(ev.v, ev.v))
           * sqrt(list_dot_product(eq.v, eq.v))) AS score
      FROM cand JOIN e ev ON ev.vec_id = cand.vec_id
        JOIN e eq ON eq.vec_id = cand.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
        ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY score DESC, neighbor_id) AS rk
      FROM exact)
    SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""
  }


  /** The q168 oracle: subspace k-means replays + stored codes
    * ([[pqSubspaceCtes]]), per-cell counts and 6dp-rounded decimal
    * cosine sums, folded to one stat row per subspace.
    */
  private def pqHealthOracleSql: String = {
    def ps(s: Int) =
      s"""ps$s AS (
      SELECT CAST($s AS INT) AS sub,
        CAST(SUM(n) AS BIGINT) AS n_vectors,
        CAST(COUNT(*) AS BIGINT) AS n_cells_live,
        ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 4) AS max_cell_frac,
        ROUND(CAST(SUM(sc) AS DOUBLE) / SUM(n), 4) AS mean_cos_centroid
      FROM (
        SELECT cd.c, COUNT(*) AS n,
          SUM(CAST(ROUND(
            list_dot_product(e$s.v, cb.cv)
              / (sqrt(list_dot_product(e$s.v, e$s.v))
               * sqrt(list_dot_product(cb.cv, cb.cv))), 6)
            AS DECIMAL(38,6))) AS sc
        FROM cd$s cd JOIN c${s}2 cb ON cb.c = cd.c
          JOIN e$s ON e$s.vec_id = cd.vec_id
        GROUP BY cd.c) t)"""
    val sub = (0 until PqSubspaces).map(s => pqSubspaceCtes(s)).mkString(",\n    ")
    val stats = (0 until PqSubspaces).map(ps).mkString(",\n    ")
    val un = (0 until PqSubspaces).map(s => s"SELECT * FROM ps$s")
      .mkString(" UNION ALL ")
    s"""WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    $sub,
    $stats
    SELECT * FROM ($un) ORDER BY sub"""
  }

  /** The q163 oracle: hash-seeded k-means over the RESIDENT train
    * vectors, stored assignment of ALL train vectors under it, eval
    * probe at $IvfNProbe, max 4dp cosine per probed train vector.
    */
  private def manifestSemanticProbeOracleSql: String =
    s"""WITH split AS (
      SELECT MAX(doc_id) * 4 // 5 AS s FROM documents),
    ${kmeansBuildCtesSeeded(
      s"WHERE vec_id % 50 <> 0 AND vec_id < (SELECT s FROM split)",
      s"CAST(vec_id % $IvfCells AS INT)")},
    et AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % 50 <> 0),
    ${probeSql("c2", "ca", 1, "et")},
    b AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
      WHERE vec_id % 50 = 0 AND vec_id < $ExactBaselineVecCap),
    ${probeSql("c2", "pb", IvfNProbe, "b")},
    scored AS (
      SELECT ca.vec_id AS doc_id,
        ROUND(list_dot_product(et.v, bb.v)
          / (sqrt(list_dot_product(et.v, et.v))
           * sqrt(list_dot_product(bb.v, bb.v))), 4) AS cos
      FROM pb JOIN ca ON ca.c = pb.c AND ca.rk = 1
        JOIN et ON et.vec_id = ca.vec_id
        JOIN b bb ON bb.vec_id = pb.vec_id)
    SELECT doc_id, MAX(cos) + 0.0 AS d_mec,
      CAST(COALESCE(MAX(cos) >= $SemDedupTau, FALSE) AS INT) AS flagged
    FROM scored GROUP BY doc_id ORDER BY doc_id"""

  /** One k-means Lloyd replay step in DuckDB: assignment of every
    * vector to its best cell of codebook CTE `cIn` (ties by `tieDir`
    * on c — DESC mirrors [[cellOf]], ASC mirrors [[probeCells]]),
    * emitted as CTE `aOut`; optionally followed by the next round's
    * means/codebook CTEs `mOut`/`cOut`.
    */
  private def lloydStepSql(cIn: String, aOut: String, tieDir: String,
                           mOut: String, cOut: String): String = {
    val cos = s"list_dot_product(e.v, $cIn.cv) / " +
      s"(sqrt(list_dot_product(e.v, e.v)) * " +
      s"sqrt(list_dot_product($cIn.cv, $cIn.cv)))"
    val assign = s"""$aOut AS (
      SELECT vec_id, c, cos FROM (
        SELECT e.vec_id, $cIn.c, $cos AS cos,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY $cos DESC NULLS LAST, $cIn.c $tieDir) AS rk
        FROM e CROSS JOIN $cIn) t WHERE rk = 1)"""
    if (mOut.isEmpty) assign
    else assign + s""",
    $mOut AS (
      SELECT a.c, r.i,
        CAST(SUM(CAST(e.v[r.i + 1] AS DECIMAL(38,6))) AS DOUBLE)
          / COUNT(*) AS mu
      FROM $aOut a JOIN e USING (vec_id),
        (SELECT unnest(range(0, $Dim)) AS i) r
      GROUP BY a.c, r.i),
    $cOut AS (SELECT c, list(mu ORDER BY i) AS cv FROM $mOut GROUP BY c)"""
  }

  /** The shared k-means build replay (q144's oracle pattern): CTE
    * chain `e` (vectors + per-label seeds) → `c0` (seed means) → two
    * Lloyd rounds → final codebook CTE `c2`. Shared by the q144
    * health, q64 IVF-ANN, and q92 semantic-dedup oracles — one
    * spelling of the build, three consumers.
    */
  private def kmeansBuildCtes: String = kmeansBuildCtesWhere("")

  /** [[kmeansBuildCtes]] with a row filter on the training corpus —
    * the q154 oracle trains on the pre-arrival corpus only, exactly
    * the rows the stored index was built over.
    */
  private def kmeansBuildCtesWhere(where: String): String =
    kmeansBuildCtesSeeded(where,
      s"COALESCE(CAST(label AS INT), CAST(vec_id % $IvfCells AS INT))")

  /** [[kmeansBuildCtesWhere]] with an explicit seed expression — the
    * manifest's semantic codebook trains on a (vec_id, embedding)
    * relation WITHOUT the label column, so its replay seeds by the
    * hash partition alone ([[kmeansCodebook]]'s no-label branch).
    */
  private def kmeansBuildCtesSeeded(where: String,
                                    seedExpr: String): String =
    s"""e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        $seedExpr AS seed
      FROM embeddings $where),
    $kmeansRoundsFromE"""

  /** The build replay's Lloyd rounds alone (seed means → two steps →
    * final codebook CTE `c2`), fed by whatever CTE `e` (vec_id, v,
    * seed) the caller assembled — the q164 oracle trains over a
    * DERIVED clustered relation, not the embeddings table itself.
    */
  private def kmeansRoundsFromE: String =
    s"""m0 AS (
      SELECT seed AS c, r.i,
        CAST(SUM(CAST(v[r.i + 1] AS DECIMAL(38,6))) AS DOUBLE)
          / COUNT(*) AS mu
      FROM e, (SELECT unnest(range(0, $Dim)) AS i) r GROUP BY seed, r.i),
    c0 AS (SELECT c, list(mu ORDER BY i) AS cv FROM m0 GROUP BY c),
    ${lloydStepSql("c0", "a1", "DESC", "m1", "c1")},
    ${lloydStepSql("c1", "a2", "DESC", "m2", "c2")}"""

  /** Top-`nprobe` probe cells of codebook `cIn` for every vector of
    * CTE `e`, with the rank retained — [[probeCells]]'s ordering
    * rule verbatim (cos DESC with nulls last, then smaller c_id).
    * `WHERE rk = 1` on the output CTE is the primary assignment.
    */
  private def probeSql(cIn: String, out: String, nprobe: Int,
                       src: String = "e"): String = {
    val cos = s"list_dot_product($src.v, $cIn.cv) / " +
      s"(sqrt(list_dot_product($src.v, $src.v)) * " +
      s"sqrt(list_dot_product($cIn.cv, $cIn.cv)))"
    s"""$out AS (
      SELECT vec_id, c, cos, rk FROM (
        SELECT $src.vec_id, $cIn.c, $cos AS cos,
          ROW_NUMBER() OVER (PARTITION BY $src.vec_id
            ORDER BY $cos DESC NULLS LAST, $cIn.c ASC) AS rk
        FROM $src CROSS JOIN $cIn) t WHERE rk <= $nprobe)"""
  }

  /** The q144 oracle: full k-means build replay + per-cell health. */
  private def ivfHealthOracleSql: String =
    s"""WITH $kmeansBuildCtes,
    ${lloydStepSql("c2", "af", "ASC", "", "")},
    agg AS (
      SELECT c AS cell, COUNT(*) AS n,
        CAST(SUM(CAST(ROUND(cos, 6) AS DECIMAL(38,6))) AS DOUBLE)
          / COUNT(*) AS mc
      FROM af GROUP BY c),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM agg)
    SELECT CAST(cell AS INT) AS cell, CAST(n AS BIGINT) AS n_vectors,
      CAST(n * $IvfCells AS DOUBLE) / total AS skew,
      ROUND(mc, 4) + 0.0 AS mean_cos_centroid
    FROM agg, tot ORDER BY cell"""

  /** The q64 oracle: k-means build replay, primary assignment (rk=1
    * of the probe ranking), each query's top-$IvfNProbe probe cells,
    * exact scoring of the probed cells' members, top-5. Raw cosine
    * scores surface unrounded — the q60 precedent shows the two
    * engines' dot/norm arithmetic is bit-identical on this fixture.
    */
  /** The q147 oracle: build replay + probe cells (q64's machinery),
    * q89's quantization in SQL, 4dp-rounded code-cosine candidate cut
    * at $SqRerankWidth, exact re-rank to top-5.
    */
  private def ivfSqOracleSql: String =
    s"""WITH $kmeansBuildCtes,
    ${probeSql("c2", "pr", IvfNProbe)},
    assigned AS (SELECT vec_id, c AS cell FROM pr WHERE rk = 1),
    qc AS (
      SELECT vec_id AS query_id, c AS cell FROM pr
      WHERE vec_id % 100 = 0 AND vec_id < $ExactBaselineVecCap),
    codes AS (
      SELECT vec_id,
        list_transform(v, x -> CAST(round(x /
          CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END) AS DOUBLE)) AS cd
      FROM (SELECT vec_id, v,
          list_max(list_transform(v, x -> abs(x))) AS mx FROM e) t),
    approx AS (
      SELECT qc.query_id, a.vec_id,
        ROUND(list_dot_product(c.cd, eq.v)
          / (sqrt(list_dot_product(c.cd, c.cd))
           * sqrt(list_dot_product(eq.v, eq.v))), 4) AS ascore
      FROM qc JOIN assigned a ON a.cell = qc.cell
        JOIN codes c ON c.vec_id = a.vec_id
        JOIN e eq ON eq.vec_id = qc.query_id
      WHERE a.vec_id <> qc.query_id),
    cand AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY ascore DESC NULLS LAST, vec_id) AS crk
        FROM approx) t WHERE crk <= $SqRerankWidth),
    exact AS (
      SELECT cand.query_id, cand.vec_id AS neighbor_id,
        list_dot_product(ev.v, eq.v)
          / (sqrt(list_dot_product(ev.v, ev.v))
           * sqrt(list_dot_product(eq.v, eq.v))) AS score
      FROM cand JOIN e ev ON ev.vec_id = cand.vec_id
        JOIN e eq ON eq.vec_id = cand.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
        ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY score DESC, neighbor_id) AS rk
      FROM exact)
    SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""

  /** The q154 oracle: corpus-only k-means build replay (the stored
    * codebook), corpus primary assignment (what the index stores),
    * batch top-probe cells, candidate = (batch, corpus) sharing a
    * probed cell, exact cosine 4dp-rounded before the best-match
    * rank, verdict at τ. A batch vector whose probed cells hold no
    * corpus member survives as novel with null best_cos.
    */
  private def incrementalSemanticDedupOracleSql: String =
    s"""WITH ${kmeansBuildCtesWhere("WHERE vec_id % 5 <> 0")},
    ${probeSql("c2", "ca", 1)},
    b AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % 5 = 0),
    ${probeSql("c2", "pb", IvfNProbe, "b")},
    scored AS (
      SELECT pb.vec_id AS b_id, ca.vec_id AS c_id,
        ROUND(list_dot_product(bb.v, e.v)
          / (sqrt(list_dot_product(bb.v, bb.v))
           * sqrt(list_dot_product(e.v, e.v))), 4) AS cos
      FROM pb JOIN ca ON ca.c = pb.c
        JOIN b bb ON bb.vec_id = pb.vec_id
        JOIN e ON e.vec_id = ca.vec_id),
    best AS (
      SELECT b_id, c_id, cos,
        ROW_NUMBER() OVER (PARTITION BY b_id
          ORDER BY cos DESC, c_id) AS rk
      FROM scored)
    SELECT pm.vec_id, CAST(pm.c AS INT) AS cell,
      CASE WHEN bs.cos >= $SemDedupTau THEN bs.c_id END AS dup_of,
      bs.cos + 0.0 AS best_cos,
      CAST(COALESCE(bs.cos >= $SemDedupTau, FALSE) AS INT) AS is_dup
    FROM (SELECT vec_id, c FROM pb WHERE rk = 1) pm
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) bs ON bs.b_id = pm.vec_id
    ORDER BY pm.vec_id"""

  private def ivfAnnOracleSql: String =
    s"""WITH $kmeansBuildCtes,
    ${probeSql("c2", "pr", IvfNProbe)},
    assigned AS (SELECT vec_id, c AS cell FROM pr WHERE rk = 1),
    qc AS (
      SELECT vec_id AS query_id, c AS cell FROM pr
      WHERE vec_id % 100 = 0 AND vec_id < $ExactBaselineVecCap),
    scored AS (
      SELECT qc.query_id, a.vec_id AS neighbor_id,
        list_dot_product(eq.v, ev.v)
          / (sqrt(list_dot_product(eq.v, eq.v))
           * sqrt(list_dot_product(ev.v, ev.v))) AS score
      FROM qc JOIN assigned a ON a.cell = qc.cell
        JOIN e eq ON eq.vec_id = qc.query_id
        JOIN e ev ON ev.vec_id = a.vec_id
      WHERE a.vec_id <> qc.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
        ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY score DESC, neighbor_id) AS rk
      FROM scored)
    SELECT query_id, neighbor_id, score, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""

  /** The q92 oracle: k-means build replay, top-$SemDedupProbes probe
    * cells per vector, candidate pairs = probe-cell intersection
    * (a < b, deduped — BandedPairs' pair set below the cap), exact
    * cosine ≥ τ drops the larger id, output = primary cell + verdict.
    */
  private def semanticDedupOracleSql: String =
    s"""WITH $kmeansBuildCtes,
    ${probeSql("c2", "pr", SemDedupProbes)},
    cand AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM pr a JOIN pr b ON a.c = b.c AND a.vec_id < b.vec_id),
    drops AS (
      SELECT DISTINCT c.vb FROM cand c
        JOIN e ea ON ea.vec_id = c.va
        JOIN e eb ON eb.vec_id = c.vb
      WHERE list_dot_product(ea.v, eb.v)
          / (sqrt(list_dot_product(ea.v, ea.v))
           * sqrt(list_dot_product(eb.v, eb.v))) >= $SemDedupTau)
    SELECT p.vec_id, CAST(p.c AS INT) AS cell,
      CAST(CASE WHEN d.vb IS NOT NULL THEN 1 ELSE 0 END AS INT) AS dropped
    FROM pr p LEFT JOIN drops d ON d.vb = p.vec_id
    WHERE p.rk = 1 ORDER BY p.vec_id"""

  /** Fixture embedding dimensionality (declared, like q37's pivot
    * alphabet: discovering it needs a pre-plan scan and makes the
    * output schema data-dependent).
    */
  val Dim = 64

  /** q124's operator body: population covariance of the embedding
    * space as an (i, j, cov) upper-triangle relation. One decimal-sum
    * aggregate for the means (1-row broadcast), then per row ONE call
    * to the native `upper_tri_products` kernel
    * ([[graft.expressions.UpperTriProducts]]: centered i ≤ j products
    * in a fused compiled loop) folded elementwise by
    * `Vectors.vecDecimalSum` with map-side partial merge — the
    * shuffle carries one d(d+1)/2-slot decimal buffer per task, never
    * rows×d² exploded tuples, and the d² explode onto (i, j) rows
    * happens on the single post-aggregate row. Two rejected
    * formulations, measured at sf0.1: nested interpreted HOFs for the
    * term array (27 s — ~2·d² lambda evals per row), and d(d+1)/2
    * separate built-in `sum` slots in one wide aggregate (20 s —
    * past `spark.sql.codegen.maxFields` the 2080-expression plan
    * drops out of whole-stage codegen and pays ~13 s of fixed
    * optimizer/fallback cost before the first row).
    */
  def covarianceMatrix(emb: org.apache.spark.sql.DataFrame,
                       dim: Int = Dim): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val means = emb
      .agg(Vectors.vecDecimalSum(Vectors.asDouble(col("embedding"))).as("sums"),
        count(lit(1)).as("n"))
      .select(transform(col("sums"), s => s / col("n")).as("mu"),
        col("n"))
    val pairs = filter(
      transform(sequence(lit(0), lit(dim * dim - 1)),
        k => struct((k / dim).cast("int").as("i"), pmod(k, lit(dim)).cast("int").as("j"))),
      p => p.getField("i") <= p.getField("j"))
    val terms = emb.crossJoin(broadcast(means))
      .select(col("n"),
        ColumnBridge.column(graft.expressions.UpperTriProducts(
          ColumnBridge.expression(col("embedding")),
          ColumnBridge.expression(col("mu")))).as("t"))
    terms
      .groupBy(col("n"))
      .agg(Vectors.vecDecimalSum(col("t")).as("sums"))
      .select(posexplode(arrays_zip(pairs.as("p"), col("sums").as("s"))),
        col("n"))
      .select(col("col.p.i").as("i"), col("col.p.j").as("j"),
        // +0.0 normalizes the -0.0 a tiny negative cov rounds to
        // (q118's rule: IEEE negative zero hashes differently)
        (round(col("col.s") / col("n"), 6) + 0.0).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  /** q92's threshold — q65's, so the exact baseline doubles as this
    * operator's ground truth.
    */
  val SemDedupTau = 0.45

  /** q92's multi-probe width: each vector bands under its top-3
    * nearest cells, so a near-dup pair is blocked together when their
    * probe sets INTERSECT — single-assignment SemDeDup misses any
    * pair straddling a Voronoi boundary, which on a weakly-clustered
    * corpus is most of the tail (measured: capture 0.29 single vs
    * 0.93 at p=3 on the near-random sf0.01 fixture; ~1.0 on a
    * genuinely clustered corpus either way — SimilaritySpec measures
    * both).
    */
  val SemDedupProbes = 3

  def semanticDedupOn(emb: DataFrame, tau: Double = SemDedupTau,
                      k: Int = IvfCells, lloydIters: Int = IvfLloydIters,
                      nprobe: Int = SemDedupProbes,
                      maxBucket: Int = MaxVecBucket): DataFrame = {
    val cents = kmeansCodebook(emb, lloydIters, k)
    // top-nprobe probe cells via [[probeCells]] (q64's probe shape):
    // literal argsort below the codebook threshold, broadcast
    // relation + bounded top-n aggregate above it.
    val banded = probeCells(emb.select(col("vec_id"), col("embedding")),
      Seq("vec_id"), "embedding", cents, nprobe)
    val cands = graft.operators.BandedPairs.cappedCandidates(
      banded, "vec_id", Seq("cell"), maxBucket, "vec_a", "vec_b")
    // exact-cosine verify on candidate ids only — embeddings join
    // back by id, so the pair shuffle carries ids, never vectors.
    val drops = cands
      .join(emb.select(col("vec_id").as("vec_a"),
        col("embedding").as("emb_a")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"),
        col("embedding").as("emb_b")), "vec_b")
      .filter(Vectors.cosine(col("emb_a"), col("emb_b")) >= tau)
      .select(col("vec_b").as("vec_id")).distinct()
    // output carries the PRIMARY (nearest) cell per vector
    probeCells(emb.select(col("vec_id"), col("embedding")),
        Seq("vec_id"), "embedding", cents, 1)
      .join(drops.withColumn("dropped", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("dropped"), lit(0)).as("dropped"))
      .orderBy(col("vec_id"))
  }

  /** q164's cluster geometry: centers are every `ClusterStride`-th
    * fixture vector, members add their own embedding as noise at
    * 1/`ClusterScale` of the center's weight — within-cluster cosines
    * land near 1, cross-cluster cosines near the random-direction
    * noise floor of the 64-dim fixture, so the inter-centroid margin
    * dwarfs the noise and the probe provably captures the exhaustive
    * best match.
    */
  val ClusterStride = 17
  val ClusterScale = 40.0

  /** The deterministic CLUSTERED corpus q164 derives from the fixture
    * embeddings (which are near-random — the one regime where the
    * q154 capture trade actually loses tail pairs): member i's vector
    * is `ClusterScale·center + own embedding`, centers being the
    * vec_id % ClusterStride == 0 rows, membership the nearest-lower
    * multiple of the stride. All arithmetic in DOUBLE so the oracle's
    * replay (same widening, same multiply-add) is bit-identical.
    * The center relation is stride-bounded model-sized state and
    * rides a broadcast; nothing shuffles the corpus.
    */
  private[queries] def clusteredEmbeddings(emb: DataFrame): DataFrame = {
    val base = emb.filter(col("vec_id") < ExactBaselineVecCap)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("e"))
    val centers = base.filter(col("vec_id") % ClusterStride === 0)
      .select(col("vec_id").as("center_id"), col("e").as("c"))
    base
      .withColumn("center_id",
        col("vec_id") - col("vec_id") % ClusterStride)
      .join(broadcast(centers), Seq("center_id"))
      .select(col("vec_id"),
        zip_with(col("c"), col("e"),
          (a, b) => lit(ClusterScale) * a + b).as("embedding"))
  }

  /** q154's declared form: the arrival batch (vec_id % 5 == 0)
    * against the session-shared persisted corpus index.
    */
  def incrementalSemanticDedup(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    incrementalSemanticDedupOn(
      t(s, d).embeddings.filter(col("vec_id") % 5 === 0),
      SharedStages.corpusIvfIndexPath(s, d))

  /** q154's operator body: screen `batch` (vec_id, embedding) against
    * a built [[IvfIndex]] at `indexPath` under its STORED codebook.
    * One row per batch vector: primary cell, best corpus match id
    * when its 4dp-rounded exact cosine ≥ `tau` (else null dup_of /
    * is_dup 0), best_cos (null when the probed cells hold no corpus
    * member). Scale shape: the codebook is k×dim model state
    * (bounded collect), the probe relation is batch-sized and rides
    * the BROADCAST side, so the stored cells scan is pruned to the
    * probed partitions (DPP, q128's plan discipline) and the corpus
    * is never shuffled — candidate work is |batch| × (corpus
    * share of nprobe cells), never |corpus|².
    */
  def incrementalSemanticDedupOn(batch: DataFrame, indexPath: String,
      tau: Double = SemDedupTau,
      nprobe: Int = IvfNProbe): DataFrame = {
    val s = batch.sparkSession
    val cents = IvfIndex.loadCodebook(s, indexPath)
    val b = batch.select(col("vec_id").as("b_id"),
      col("embedding").as("b_emb"))
    val probes = probeCells(b, Seq("b_id", "b_emb"), "b_emb", cents, nprobe)
    val store = graft.engine.Tombstones.exclude(
        graft.engine.EpochStore.read(s, s"$indexPath/cells"),
        indexPath, "vec_id")
      .select(col("cell"), col("vec_id"), col("embedding"))
    val scored = store.join(broadcast(probes), Seq("cell"))
      .select(col("b_id"), col("vec_id").as("c_id"),
        round(Vectors.cosine(col("b_emb"), col("embedding")), 4).as("cos"))
    val w = Window.partitionBy(col("b_id"))
      .orderBy(col("cos").desc, col("c_id"))
    val best = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("b_id"), col("c_id"), col("cos"))
    probeCells(b, Seq("b_id"), "b_emb", cents, 1)
      .join(best, Seq("b_id"), "left")
      .select(col("b_id").as("vec_id"), col("cell"),
        when(col("cos") >= tau, col("c_id")).as("dup_of"),
        (col("cos") + lit(0.0)).as("best_cos"),
        coalesce((col("cos") >= tau).cast("int"), lit(0)).as("is_dup"))
      .orderBy(col("vec_id"))
  }

  /** q63's candidate generator, exposed so SimilaritySpec can measure
    * the pruning claim instead of trusting it: (query_id, vec_id)
    * pairs that share a (table, bucket) with the query's own code or
    * any probe within `probeRadius` bit flips of it, deduped. The
    * spec asserts
    * avg(candidates)/(n−1) < 0.30 AND recall ≥ 0.8 — the two sides of
    * the LSH tradeoff — at both sf0.01 and sf0.1.
    *
    * Why q63 does NOT beat q60 in the recorded bench, by arithmetic
    * (measured round 3): at sf0.1 the query set is 1% of the corpus
    * (20 of 2000), so brute force costs n·q·dim ≈ 2.5M multiplies,
    * while the LSH INDEX BUILD alone costs n·L·nBits·dim ≈ 80M
    * multiplies (0.22 s vs 0.40 s for all of q60) — at this query
    * volume the index can never amortize, on any corpus. The
    * operator's winning regimes — measured, not asserted, in
    * SimilaritySpec — are (a) clustered data at larger n (3–5×
    * crossover at 16k vectors) and (b) repeated query volume against
    * a built index. On the near-random fixture at 1% queries the
    * right engineering call IS brute force; the bench records that
    * honestly rather than tuning the recall floor away.
    */
  def annLshCandidates(s: org.apache.spark.sql.SparkSession, d: String,
                       nBits: Int = AnnNBits, tables: Int = AnnTables,
                       probeRadius: Int = AnnProbeRadius): DataFrame =
    annLshCandidatesOn(t(s, d).embeddings, nBits, tables, probeRadius)

  def annLshCandidatesOn(emb: DataFrame,
                         nBits: Int = AnnNBits, tables: Int = AnnTables,
                         probeRadius: Int = AnnProbeRadius,
                         queryCap: Long = ExactBaselineVecCap): DataFrame = {
    val banded = emb.select(col("vec_id"),
      posexplode(Vectors.hyperplaneBuckets(col("embedding"), nBits, tables))
        .as(Seq("tbl", "b")))
    val q = querySubset(emb, queryCap)
    // bucket the ~1% query subset directly — joining the full banded
    // table would recompute the whole corpus bucketing a second time
    // just to look up a handful of rows. Each (tbl, code) fans out to
    // every probe code within Hamming distance `probeRadius` of its
    // own (all XOR masks of popcount <= probeRadius).
    val masks: Seq[Long] = probeMasks(nBits, probeRadius)
    val qb = q.select(col("query_id"),
        posexplode(Vectors.hyperplaneBuckets(col("q_emb"), nBits, tables))
          .as(Seq("tbl", "b0")))
      .select(col("query_id"), col("tbl"),
        explode(array(col("b0") +:
          masks.map(m => col("b0").bitwiseXOR(lit(m))): _*))
          .as("b"))
    banded.join(broadcast(qb), Seq("tbl", "b"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")).distinct()
  }

  /** The q63 plan: candidates from [[annLshCandidates]], exact-scored
    * and top-k'd per query.
    */
  def annLsh(s: org.apache.spark.sql.SparkSession, d: String,
             nBits: Int = AnnNBits, tables: Int = AnnTables,
             probeRadius: Int = AnnProbeRadius): DataFrame =
    annLshOn(t(s, d).embeddings, nBits, tables, probeRadius)

  def annLshOn(emb: DataFrame,
               nBits: Int = AnnNBits, tables: Int = AnnTables,
               probeRadius: Int = AnnProbeRadius,
               queryCap: Long = ExactBaselineVecCap): DataFrame = {
    val q = querySubset(emb, queryCap)
    val scored = annLshCandidatesOn(emb, nBits, tables, probeRadius, queryCap)
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosine(col("q_emb"), col("embedding")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Banded embedding-cosine near-dup — q65's scale path, completing
    * the pattern every other dedup family already has (q54→q56,
    * q57→q68): symmetric pair generation via bucket-equality
    * hyperplane LSH (the MLlib approxSimilarityJoin shape — AND over
    * nBits sign bits within a table, OR over L tables) instead of the
    * n² cross join. Candidates share a (table, bucket); singleton
    * buckets are dropped before the self-join exactly like q56, and
    * candidates are exact-verified with the same fused cosine kernel
    * and threshold as q65. Shuffle rows are (id, table, code) only;
    * embeddings join back by id for the verify.
    *
    * Multi-probe (the q63 trick) was MEASURED and rejected here: for
    * symmetric all-pairs the probe expansion rides the full corpus
    * side of the join (n×L×107 rows at radius 2 — 6× the runtime of
    * this plan at sf0.1), whereas in q63 it only expands the ~1%
    * query side. More tables at fewer bits buys the same recall with
    * corpus-linear banding rows.
    *
    * Parameters measured like q63's (SimilaritySpec asserts recall
    * AND candidate-pair fraction at both sf0.01 and sf0.1).
    */
  def embNearDupLshOn(emb: DataFrame,
                      nBits: Int = NearDupNBits, tables: Int = NearDupTables,
                      minCos: Double = 0.45,
                      maxBucket: Int = MaxVecBucket): DataFrame = {
    // persist: the band table feeds the bucket-count aggregate AND
    // both self-join sides — without it the L×nBits hyperplane pass
    // over the corpus runs three times
    val banded = emb.select(col("vec_id"),
      posexplode(Vectors.hyperplaneBuckets(col("embedding"), nBits, tables))
        .as(Seq("tbl", "b")))
      .persist()
    banded.count() // materialize eagerly: three consumers (bucket agg
                   // + both self-join sides) would otherwise recompute
                   // the L×nBits hyperplane pass while racing to
                   // populate the cache
    // shared skew discipline (operators/BandedPairs): singleton
    // prefilter, capped self-join, representative star for over-cap
    // buckets — every candidate still cosine-verified below
    val cands = graft.operators.BandedPairs.cappedCandidates(
      banded, "vec_id", Seq("tbl", "b"), maxBucket, "vec_a", "vec_b")
    banded.unpersist() // dead once the helper's tagged table is
                       // materialized — holding both would pin the
                       // n×L band rows in cache twice
    cands
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")),
        Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")),
        Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        Vectors.cosine(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= minCos)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** q65's exact pair plan over any embeddings frame: every
    * (vec_a < vec_b) pair with cosine ≥ `minCos` over the
    * `vec_id < cap` prefix. Deterministic prefix cap: the baseline is
    * ground truth for q69's recall spec, and recall measured on a
    * fixed-size id prefix is just as meaningful — while an UNCAPPED
    * cartesian is 4e10 pairs if this entry is ever run at 100×
    * vectors. Every test sf has vec_id < 4096, so results there are
    * bit-identical to the uncapped form (oracle carries the same
    * predicate).
    */
  def embNearDupExactOn(emb: DataFrame,
                        minCos: Double = SemDedupTau,
                        cap: Long = ExactBaselineVecCap): DataFrame = {
    val capped = emb.filter(col("vec_id") < cap)
    capped.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
      .crossJoin(capped.select(col("vec_id").as("vec_b"),
        col("embedding").as("emb_b")))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        Vectors.cosine(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** q60's exact plan over any embeddings frame (the crossover spec
    * runs it against a scaled corpus where compute, not fixed
    * overhead, decides the comparison with [[annLshOn]]).
    *
    * The 1%-of-corpus query subset is additionally capped at
    * [[ExactBaselineVecCap]] ids — without the cap the BROADCAST side
    * grows with the corpus (1% of 100 TB is not broadcastable); with
    * it the query set is ≤ Cap/100 vectors at any sf, and the sf
    * fixtures (vec_id < 2000) pass through unchanged. Specs that
    * compare search paths on LARGER generated corpora must pass the
    * same explicit `queryCap` to every path under comparison, or the
    * wall-clock/recall comparison silently measures different
    * workloads (the crossover spec does exactly this).
    */
  def knnBruteForceOn(emb: DataFrame,
                      queryCap: Long = ExactBaselineVecCap): DataFrame = {
    val q = querySubset(emb, queryCap)
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
  }

  /** The q64 plan, parameterized so SimilaritySpec can measure the
    * Lloyd refinement's recall gain over the per-label seed
    * (`lloydIters = 0` is the round-2 stand-in quantizer; the spec
    * asserts the refined codebook's recall is >= the seed's and
    * >= 0.8 at nprobe=7, sf0.01 — the declared query uses 2 rounds,
    * each one a linear assignment scan plus a k-row re-centering
    * aggregate).
    */
  def ivfAnn(s: org.apache.spark.sql.SparkSession, d: String,
             lloydIters: Int = IvfLloydIters, nprobe: Int = IvfNProbe,
             k: Int = IvfCells): DataFrame =
    ivfAnnOn(t(s, d).embeddings, lloydIters, nprobe, k)

  // The codebook lives on the DRIVER between rounds — the one
  // deliberate departure from the no-collect posture, and the same
  // one Spark MLlib's KMeans makes: centers are k×dim (fixed model
  // state, independent of corpus size), and holding them as plan
  // literals makes every assignment a pure map-side projection with
  // no broadcast-exchange/persist chain per round. Collecting model
  // parameters is not collecting data.
  //
  // Element-wise decimal-sum means per cell key — the q62 centroid
  // shape (shuffle = k×dim partials per task), NOT the rows×dim
  // posexplode. Decimal accumulation + sorted collect keep the
  // codebook bit-identical run-to-run regardless of task order.
  // Filter on the CAST key: a label that is non-null but not
  // int-castable (string labels, say) would otherwise survive the
  // filter, collapse into one null c_id group, and NPE at getInt.
  private def means(df: DataFrame, key: Column): Seq[(Int, Seq[Double])] = df
    .filter(key.cast("int").isNotNull)
    .groupBy(key.cast("int").as("c_id"))
    .agg(
      Vectors.vecDecimalSum(Vectors.asDouble(col("embedding"))).as("sums"),
      count(col("embedding")).as("n"))
    .select(col("c_id"),
      transform(col("sums"), x => x / col("n")).as("c_emb"))
    .collect()
    .map(r => r.getInt(0) -> r.getSeq[Double](1))
    .sortBy(_._1).toSeq

  /** The codebook as ONE literal node (round 16): the first spelling
    * built array(struct(lit, array(lit…))) — k×(dim+1) expression
    * nodes that every analyzer/optimizer rule batch re-walks on every
    * plan embedding the tree (the PQ/IVF queries embed several per
    * job across ~10–20 jobs; measured as a large share of their 2.5–
    * 3.6s driver gaps). `Literal.create` yields exactly the constant
    * ConstantFolding would have folded the tree into — same type,
    * same values, bit-identical evaluation — at O(1) plan nodes.
    */
  private def centsLit(cents: Seq[(Int, Seq[Double])]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    ColumnBridge.column(Literal.create(
      cents.map { case (id, c) => org.apache.spark.sql.Row(id, c) },
      ArrayType(StructType(Seq(
        StructField("c_id", IntegerType, nullable = false),
        StructField("c_emb", ArrayType(DoubleType, containsNull = false),
          nullable = false))), containsNull = false)))
  }

  // Nearest-centroid argmax over the literal codebook (ties break
  // to the larger c_id, deterministically) — constant-folded, so
  // each row pays k fused cosine kernels and nothing else.
  private[queries] def cellOf(v: Column,
      cents: Seq[(Int, Seq[Double])]): Column =
    array_max(transform(centsLit(cents),
      c => struct(Vectors.cosine(v, c.getField("c_emb")).as("s"),
        c.getField("c_id").as("c_id"))))
      .getField("c_id")

  /** Above this many cells the codebook stops being a plan LITERAL:
    * k×dim struct literals inside one expression tree blow up
    * codegen and plan size, and q92's k ∝ n contract grows k with
    * the corpus — at 100 TB that is 10⁵–10⁶ structs per expression.
    * Past the threshold [[probeCells]] broadcasts the codebook as a
    * RELATION instead: assignment is a broadcast-nested-loop join
    * whose k candidates per row collapse through the bounded
    * [[Vectors.topCells]] partial aggregate map-side — plan size
    * O(1) in k, per-group state O(nprobe), shuffle one row per
    * input row. The literal stays below the threshold because
    * constant-folded fused kernels are faster there (no join, no
    * aggregation machinery).
    */
  val CodebookLiteralMaxCells = 2048

  /** The shared 1%-of-ids query subset, capped at
    * [[ExactBaselineVecCap]]: 1% of a 100 TB corpus is not
    * broadcastable, and every search path (exact baseline q60, LSH
    * q63, IVF q64) must score the SAME query set — otherwise recall
    * and crossover comparisons silently compare different workloads.
    * Test corpora with vec_id < 2000 pass through unchanged.
    */
  private[queries] def querySubset(emb: DataFrame,
      cap: Long = ExactBaselineVecCap): DataFrame =
    emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < cap)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  private def centsRel(df: DataFrame,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    cents.toDF("c_id", "c_emb")
  }

  /** Top-`nprobe` nearest cells per row of `df` — `keep` columns
    * plus one exploded `cell` per probe, nearest-first. Dispatches
    * on codebook size (see [[CodebookLiteralMaxCells]]); both paths
    * order candidates by the same (−cosine, c_id) key, so they
    * produce identical rows — only the plan shape differs.
    *
    * Null cosines (a ZERO-NORM centroid — e.g. a seed cell whose
    * members cancel — scores null against every vector) are
    * coalesced to rank LAST on BOTH paths. Without the coalesce the
    * literal path would rank them FIRST: `array_sort`'s nulls-last
    * rule applies to null ELEMENTS, while a struct with a null
    * field sorts by the struct field order, nulls-first — so every
    * vector would probe the dead centroid before any live one.
    */
  private[queries] def probeCells(df: DataFrame, keep: Seq[String],
      vecCol: String, cents: Seq[(Int, Seq[Double])],
      nprobe: Int): DataFrame =
    if (cents.size <= CodebookLiteralMaxCells)
      df.select(keep.map(col) :+ explode(transform(
        slice(array_sort(transform(centsLit(cents),
          c => struct(
            coalesce(-Vectors.cosine(col(vecCol), c.getField("c_emb")),
              lit(Double.MaxValue)).as("negs"),
            c.getField("c_id").as("c_id")))), 1, nprobe),
        p => p.getField("c_id"))).as("cell"): _*)
    else
      df.crossJoin(broadcast(centsRel(df, cents)))
        .groupBy(keep.map(col): _*)
        .agg(Vectors.topCells(nprobe)(
          // zero-norm cosine is null; rank those candidates last
          // (the literal path's array_sort is nulls-last too)
          -coalesce(Vectors.cosine(col(vecCol), col("c_emb")),
            lit(Double.MinValue)),
          col("c_id")).as("cells"))
        .select(keep.map(col) :+ explode(col("cells")).as("cell"): _*)

  /** Spherical-k-means codebook over `emb`: per-label seed when the
    * corpus carries labels (hash-partition fallback per-row for
    * non-castable labels), else a deterministic hash partition, then
    * `lloydIters` Lloyd rounds. Deterministic by construction (see
    * [[means]]), so every consumer — q64's IVF probe, q92's semantic
    * dedup — is pin-stable.
    */
  /** Round-robin fan-out of an under-partitioned relation before a
    * multi-pass CPU-bound stage (k-means training, code assignment):
    * the fixture's single-row-group parquet gives every scan exactly
    * one task, so the Lloyd rounds and coded projections ran serially
    * on one core regardless of session width. A NO-OP (no exchange)
    * whenever the input already fills the cluster — at production
    * scale scans arrive thousands-of-partitions wide and this never
    * fires; when it does fire, the one shuffle it pays is over
    * exactly the under-parallel relation the following passes
    * re-scan. Results are unchanged: every consumer is order-free
    * (decimal-sum means, per-row code assignment, grouped
    * aggregates), and round-robin repartition is deterministic under
    * retry (sortBeforeRepartition, on by default).
    */
  private[queries] def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  private[queries] def kmeansCodebook(emb: DataFrame, lloydIters: Int,
      k: Int): Seq[(Int, Seq[Double])] = {
    // no fanOut here: the IVF assignment (k ≤ tens of fused cosines
    // per row) is light enough that an extra exchange per Lloyd pass
    // measured as a net LOSS on q64/q92 (+0.5s) — the fan-out pays
    // only for the 64-code PQ folds (pqCodebooks' callers checkpoint
    // a fanned relation once instead)
    val hashSeed = pmod(col("vec_id"), lit(k)).cast("int")
    val seedKey =
      if (emb.columns.contains("label"))
        coalesce(col("label").cast("int"), hashSeed)
      else hashSeed
    var cents = means(emb, seedKey)
    for (_ <- 1 to lloydIters)
      cents =
        if (cents.size <= CodebookLiteralMaxCells)
          means(emb, cellOf(col("embedding"), cents))
        else // big codebook: assign via the relation path, then group
          means(probeCells(emb.select(col("vec_id"), col("embedding")),
            Seq("vec_id", "embedding"), "embedding", cents, 1), col("cell"))
    cents
  }

  def ivfAnnOn(emb: DataFrame,
               lloydIters: Int = IvfLloydIters, nprobe: Int = IvfNProbe,
               k: Int = IvfCells): DataFrame = {
    val cents = kmeansCodebook(emb, lloydIters, k)
    val assigned = probeCells(emb.select(col("vec_id"), col("embedding")),
      Seq("vec_id", "embedding"), "embedding", cents, 1)
    // Each query's top-`nprobe` probe cells come from [[probeCells]]:
    // below the codebook threshold a pure EXPRESSION over the literal
    // (sort k (−cs, c_id) structs, slice, explode — no window
    // shuffle, no separate probe-cell job), above it the broadcast
    // relation + bounded top-n aggregate. q_emb rides along in the
    // one broadcast the probe join needs, so the search plan is
    // scan ⋈ broadcast → window top-k, the same shape as q60 plus
    // the cell filter.
    val q = querySubset(emb)
    val qcells = probeCells(q, Seq("query_id", "q_emb"), "q_emb",
      cents, nprobe)
    val scored = assigned.join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosine(col("q_emb"), col("embedding")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy(col("query_id"), col("rk"))
  }
}
