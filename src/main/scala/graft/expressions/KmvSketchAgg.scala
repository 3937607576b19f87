package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded K-minimum-values distinct sketch: retains the `retain`
  * SMALLEST DISTINCT hash values seen (ascending array out). This is
  * the register state of the Theta/KMV sketch family — with
  * `retain = K + 1`, the (K+1)-th smallest value is the threshold θ
  * and `K / (θ/H)` (H = hash-space size) estimates the distinct
  * count; retained sets intersect/union/difference BELOW min(θ)
  * for the set-operation estimates HLL cannot provide (q115/q116).
  *
  * Scale shape: one mutable tree per partial buffer, O(log retain)
  * per row with an O(1)-amortized threshold reject once full (after
  * the first `retain` distinct values, acceptance probability for the
  * i-th distinct value is retain/i, so total tree inserts are
  * ~retain·ln(n/retain) regardless of corpus size); merge walks the
  * smaller side ascending and stops at the threshold. State is
  * `retain` longs — constant, mergeable, shuffle-safe.
  *
  * Built over the PORTABLE md5 hash family ([[Md5ShingleHashes]] /
  * `Text.md5BaseHash`, hash space [0, 2^31-1)), the retained set —
  * and therefore every downstream estimate — replays in ANSI SQL as
  * `ROW_NUMBER() OVER (ORDER BY h) <= retain` over the distinct
  * hashes (the q63/q69 portable-replay move applied to sketch
  * registers); the sort the oracle pays is exactly what the bounded
  * tree avoids engine-side.
  */
case class KmvSketchAgg(
    child: Expression,
    retain: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(retain >= 2, s"retain must be >= 2, got $retain")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a LONG hash input, got ${other.simpleString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(b: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (b.size < retain) { b.add(h); () }
    else if (h < b.last) {
      b.add(h)
      if (b.size > retain) { b.pollLast(); () }
    }
  }

  override def update(b: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
                     o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    // ascending walk; once b is full, values past b's threshold can
    // never enter (o is ascending too), so stop early
    val it = o.iterator()
    var continue = true
    while (continue && it.hasNext) {
      val h = it.next()
      if (b.size == retain && h >= b.last) continue = false
      else add(b, h)
    }
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val b = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) b.add(bb.getLong)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}
