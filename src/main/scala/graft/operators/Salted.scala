package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by deterministic salting. AQE's skew-join split
  * handles sort-merge cases at runtime, but salting is still the
  * right tool when (a) the skewed side feeds an AGGREGATION whose
  * partial state is large (collect_list/distinct-style — one hot
  * group lands on one task regardless of AQE), (b) the join runs
  * inside Structured Streaming (no AQE), or (c) the hot keys are
  * known and stable. Salts are derived by hashing the whole row —
  * never runtime randomness — so plans stay deterministic and
  * retry-safe (a rand() salt re-rolls on task retry and can lose or
  * duplicate rows).
  */
object Salted {

  /** Equi-join with the LEFT side's hot keys spread over `factor`
    * salt buckets and the RIGHT side replicated ×factor: result is
    * row-identical to `left.join(right, keys, joinType)`, but a key
    * holding p% of left rows shuffles to `factor` tasks instead of
    * one. Right replication cost = |R|·factor, so use with a
    * moderate-size right side. Supported joinTypes: inner/left.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting is row-preserving for inner/left joins only, got $joinType")
    require(!(left.columns ++ right.columns).contains("__salt"),
      "saltedJoin reserves the __salt column name")
    val allLeft = struct(left.columns.map(left(_)): _*)
    val sl = left.withColumn("__salt", pmod(xxhash64(allLeft), lit(factor)).cast("int"))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    sl.join(sr, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation for holistic aggregates: phase 1
    * aggregates per (key, salt) — spreading one hot key over `factor`
    * tasks — phase 2 merges the per-salt partials per key. The caller
    * supplies both phases (e.g. `collect_set` then
    * `array_distinct(flatten(collect_list))`). Algebraic aggregates
    * (sum/count/min/max/avg) don't need this — Spark's partial
    * aggregation already combines map-side.
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], factor: Int,
                  phase1: Seq[Column], phase2: Seq[Column]): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val allCols = struct(df.columns.map(df(_)): _*)
    df.withColumn("__salt", pmod(xxhash64(allCols), lit(factor)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)
  }
}
