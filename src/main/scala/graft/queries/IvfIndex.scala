package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Persisted IVF index — the build-once / query-many form of q64's
  * search (reference capability: similarity search over the
  * embeddings table; SURVEY §2.9). The round-3 crossover analysis
  * showed WHY this exists: at 1% ad-hoc query volume the index build
  * can never amortize (q60's brute force wins), so the index must be
  * BUILT ONCE and stored. Layout:
  *
  *   <path>/codebook/   (c_id, c_emb)          — k rows, driver-small
  *   <path>/cells/      (vec_id, embedding) PARTITIONED BY cell
  *
  * Partitioning by cell is the scale design: a query probing nprobe
  * cells reads only those partition directories. The probe-side join
  * is a broadcast of (query, cell) pairs, which Spark turns into
  * DYNAMIC PARTITION PRUNING on the cell column — the scan plans
  * only the probed partitions, verified structurally in
  * SimilaritySpec (the plan carries a dynamicpruning subquery), so
  * at 100 TB a 7-probe query touches ~7/k of the corpus bytes.
  *
  * Determinism: the codebook is [[Similarity.kmeansCodebook]]
  * (decimal-summed means, sorted collect), so build → query equals
  * the in-memory q64 plan bit-for-bit.
  */
object IvfIndex {

  def build(emb: DataFrame, path: String,
            k: Int = Similarity.IvfCells,
            lloydIters: Int = Similarity.IvfLloydIters): Unit = {
    val spark = emb.sparkSession
    val cents = Similarity.kmeansCodebook(emb, lloydIters, k)
    import spark.implicits._
    cents.toDF("c_id", "c_emb").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebook")
    Similarity.probeCells(emb.select(col("vec_id"), col("embedding")),
        Seq("vec_id", "embedding"), "embedding", cents, 1)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/cells")
  }

  /** Top-`topK` neighbors per query row (`query_id`, `q_emb`) against
    * a built index. Output matches q64's shape: (query_id,
    * neighbor_id, score, rk).
    */
  def query(spark: SparkSession, path: String, queries: DataFrame,
            nprobe: Int = Similarity.IvfNProbe,
            topK: Int = 5): DataFrame = {
    val cents = spark.read.parquet(s"$path/codebook")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .sortBy(_._1).toSeq
    val qcells = Similarity.probeCells(queries,
      Seq("query_id", "q_emb"), "q_emb", cents, nprobe)
    val assigned = spark.read.parquet(s"$path/cells")
    val scored = assigned.join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosine(col("q_emb"), col("embedding")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .orderBy(col("query_id"), col("rk"))
  }
}
