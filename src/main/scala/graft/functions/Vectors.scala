package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, as pure
  * Catalyst expression compositions (`zip_with` + `aggregate`) — no
  * UDFs, so similarity scoring stays inside the expression pipeline
  * and distributes as a plain projection.
  *
  * Determinism: elements are cast to double FIRST, then folded
  * left-to-right in index order — both Spark's `aggregate` and the
  * oracle's list functions accumulate sequentially, so scores are
  * bit-identical across engines.
  */
object Vectors {

  /** Element-wise cast to double. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product in double precision, index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; null-safe denominator (0-norm → null). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(null).cast("double")).otherwise(dot(a, b) / d)
  }

  /** Random-hyperplane LSH bucket: `nBits` sign bits of dot products
    * with deterministic pseudo-hyperplanes. Hyperplane component j of
    * plane i is a fixed hash-derived value in [-1, 1) — stable across
    * runs, no runtime randomness. Vectors in the same bucket are ANN
    * candidates; at scale the bucket is the shuffle key (equi-join),
    * replacing the brute-force cross join.
    */
  def hyperplaneBucket(v: Column, nBits: Int = 12, dim: Int = 64,
                       seed: Long = 7L): Column = {
    val bits: Seq[Column] = (0 until nBits).map { i =>
      // component j = hash(i, j) scaled to [-1, 1)
      val comps: Seq[Column] = (0 until dim).map { j =>
        val h = ((i * 1315423911L + j * 2654435761L + seed * 97531L) & 0x7fffffffL)
        lit(h.toDouble / 0x40000000L.toDouble - 1.0)
      }
      val proj = aggregate(
        zip_with(asDouble(v), array(comps: _*), _ * _), lit(0.0), _ + _)
      when(proj >= 0, lit(1L)).otherwise(lit(0L))
    }
    bits.foldLeft(lit(0L): Column)((acc, b) => acc * 2 + b)
  }
}
