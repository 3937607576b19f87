package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling: lowercase → trim → whitespace-split → word
  * n-grams → xxhash64 per n-gram (seed 42, Spark's own string hash) →
  * distinct, first-occurrence order. Returns `array<bigint>`.
  *
  * Emitting HASHES instead of n-gram strings is the scale choice: the
  * dedup pipeline only ever set-compares shingles (Jaccard, MinHash),
  * and 8-byte longs through persist/shuffle cost ~3× less than ~25-
  * byte strings — while xxhash64 keeps hash-set equality collision-
  * safe at corpus scale (~1e-10 at 400k pairs). Tokenization reuses
  * UTF8String's own toLowerCase/trim/split so semantics match the
  * `lower`/`trim`/`split` builtins the HOF formulation composes
  * (pinned bit-exact in MinHashSpec).
  */
case class ShingleHashes(child: Expression, n: Int = 3)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Space = UTF8String.fromString(" ")
  private val WhitespaceRx = UTF8String.fromString("\\s+")

  def compute(text: UTF8String, n: Int): ArrayData = {
    // identical pipeline to split(trim(lower(text)), "\s+")
    val toks = text.toLowerCase.trim.split(WhitespaceRx, -1)
    val count = toks.length - (n - 1)
    if (count < 1) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long](count * 2)
    var i = 0
    while (i < count) {
      val gram =
        if (n == 1) toks(i)
        else {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = toks(i + j); j += 1 }
          UTF8String.concatWs(Space, parts: _*)
        }
      seen.add(XXH64.hashUTF8String(gram, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** ENGINE-PORTABLE variant of [[ShingleHashes]]: per distinct n-gram,
  * the first 4 md5-digest bytes read big-endian (= the first 8 md5
  * hex digits) folded into [0, 2³¹−1) — bit-identical to the
  * composed-builtin chain
  * `array_distinct(transform(shingles(text, n),
  *   g => pmod(conv(substring(md5(g),1,8),16,10) :: long, 2^31-1)))`
  * and to DuckDB's
  * `list_distinct(list_transform(..., s -> ('0x' || substr(md5(s),
  * 1, 8))::BIGINT % 2147483647))`, which is what makes the q55/q56
  * oracles full-value-replayable. The fused kernel exists because the
  * HOF chain pays interpreted lambda dispatch + a materialized string
  * array + per-gram UTF8String→hex-string→conv round trips; here the
  * whole pipeline (tokenize → gram → digest → fold → dedup) is one
  * JIT loop per document, with a thread-local reused MessageDigest.
  * Output order equals the HOF chain's (first occurrence of each hash
  * value — distinct-strings-then-distinct-hashes yields the same
  * earliest position). Shares [[ShingleHashes]]'s tokenizer exactly.
  */
case class Md5ShingleHashes(child: Expression, n: Int = 3)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_shingle_hashes requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "md5_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    Md5ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Md5ShingleHashes =
    copy(child = newChild)
}

object Md5ShingleHashes {
  private val Space = UTF8String.fromString(" ")
  private val WhitespaceRx = UTF8String.fromString("\\s+")
  private val P = 2147483647L // 2^31 - 1, the portable fold modulus

  // MessageDigest is stateful and ~1µs to instantiate — reuse one per
  // executor thread across the millions of grams a partition hashes
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 digest bytes of md5(utf8 bytes), big-endian unsigned,
    * mod P — exactly `('0x' || substr(md5(s), 1, 8))::BIGINT % P`.
    */
  def hash(gram: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(gram.getBytes)
    val v = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
    v % P
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    // identical pipeline to split(trim(lower(text)), "\s+")
    val toks = text.toLowerCase.trim.split(WhitespaceRx, -1)
    val count = toks.length - (n - 1)
    if (count < 1) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long](count * 2)
    var i = 0
    while (i < count) {
      val gram =
        if (n == 1) toks(i)
        else {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = toks(i + j); j += 1 }
          UTF8String.concatWs(Space, parts: _*)
        }
      seen.add(hash(gram))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Positional variant of [[ShingleHashes]]: one xxhash64 per window
  * POSITION (no dedup) — `h[i]` hashes tokens `i..i+n-1` — feeding
  * the span-coverage machinery (q90/q93/q99), whose interval-union
  * needs every position, not the distinct set. Identical tokenizer
  * and hash pipeline, so values are join-compatible with
  * [[ShingleHashes]] output (q93 probes a ShingleHashes bench set
  * with these) and bit-identical to the interpreted
  * `transform(sequence, i => xxhash64(concat_ws(" ", ...)))`
  * formulation this replaces — which paid ~n boxed lambda evals and
  * 8 `element_at` calls per position; this is one JIT loop per doc.
  */
case class PositionalShingleHashes(child: Expression, n: Int = 3)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"positional_shingle_hashes requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "positional_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    PositionalShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.PositionalShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): PositionalShingleHashes =
    copy(child = newChild)
}

object PositionalShingleHashes {
  private val Space = UTF8String.fromString(" ")
  private val WhitespaceRx = UTF8String.fromString("\\s+")

  def compute(text: UTF8String, n: Int): ArrayData = {
    // identical pipeline to split(trim(lower(text)), "\s+")
    val toks = text.toLowerCase.trim.split(WhitespaceRx, -1)
    val count = toks.length - (n - 1)
    if (count < 1) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      val gram =
        if (n == 1) toks(i)
        else {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = toks(i + j); j += 1 }
          UTF8String.concatWs(Space, parts: _*)
        }
      out(i) = XXH64.hashUTF8String(gram, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native set-Jaccard over two DISTINCT `array<bigint>` columns:
  * |A∩B| / (|A|+|B| − |A∩B|), hash-probe intersection in one kernel —
  * no array_intersect/array_union materialization, evaluated once per
  * pair (the hot path runs per candidate pair, hundreds of thousands
  * of times). Empty∪empty yields 0.0 like the HOF formulation.
  */
case class JaccardLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_long requires two array<bigint>, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaccard_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardLong.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.JaccardLong.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardLong =
    copy(left = newLeft, right = newRight)
}

object JaccardLong {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val (small, big) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    val nb = big.numElements()
    if (ns == 0 && nb == 0) return 0.0
    // true SET semantics regardless of input hygiene: both sides are
    // deduplicated and nulls treated as absent, so the result is a
    // genuine symmetric Jaccard in [0, 1] even for a SQL caller who
    // passes duplicate-bearing arrays (counting raw occurrences on
    // one side only would give asymmetric values above 1)
    val sa = new java.util.HashSet[java.lang.Long](ns * 2)
    var i = 0
    while (i < ns) {
      if (!small.isNullAt(i)) sa.add(small.getLong(i))
      i += 1
    }
    val sb = new java.util.HashSet[java.lang.Long](nb * 2)
    i = 0
    while (i < nb) {
      if (!big.isNullAt(i)) sb.add(big.getLong(i))
      i += 1
    }
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) { if (sa.contains(it.next())) inter += 1 }
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }
}
