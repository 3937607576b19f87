package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registrations for the native expressions, so `spark.sql` users
  * call them like builtins (`SELECT simhash64(tokens), ...`). Inject
  * at session build with `spark.sql.extensions=graft.GraftExtensions`,
  * or into a live session via
  * `org.apache.spark.sql.graftbridge.FunctionRegistration.registerAll`.
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    if (args.size != n) throw new IllegalArgumentException(
      s"$name takes $n argument(s), got ${args.size}")
    args
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      args => SimHash64(arity("simhash64", 1)(args).head)),
    (FunctionIdentifier("minhash"),
      new ExpressionInfo(classOf[MinHash].getName, "minhash"),
      {
        case Seq(c) => MinHash(c)
        case Seq(c, k) => MinHash(c, litInt(k, "minhash k"))
        case args => throw new IllegalArgumentException(
          s"minhash takes 1-2 arguments, got ${args.size}")
      }),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      {
        case Seq(c) => ShingleHashes(c)
        case Seq(c, n) => ShingleHashes(c, litInt(n, "shingle width"))
        case args => throw new IllegalArgumentException(
          s"shingle_hashes takes 1-2 arguments, got ${args.size}")
      }),
    (FunctionIdentifier("jaccard_long"),
      new ExpressionInfo(classOf[JaccardLong].getName, "jaccard_long"),
      args => { val a = arity("jaccard_long", 2)(args); JaccardLong(a(0), a(1)) }),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      args => { val a = arity("cosine_sim", 2)(args); CosineSim(a(0), a(1)) }),
    (FunctionIdentifier("media_dims"),
      new ExpressionInfo(classOf[MediaDims].getName, "media_dims"),
      args => MediaDims(arity("media_dims", 1)(args).head)),
    (FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "token_stats"),
      args => TokenStats(arity("token_stats", 1)(args).head)),
    (FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      args => CdcChunks(arity("cdc_chunks", 1)(args).head)),
    (FunctionIdentifier("md5_shingle_hashes"),
      new ExpressionInfo(classOf[Md5ShingleHashes].getName,
        "md5_shingle_hashes"),
      {
        case Seq(c) => Md5ShingleHashes(c)
        case Seq(c, n) => Md5ShingleHashes(c, litInt(n, "shingle width"))
        case args => throw new IllegalArgumentException(
          s"md5_shingle_hashes takes 1-2 arguments, got ${args.size}")
      }),
    (FunctionIdentifier("positional_shingle_hashes"),
      new ExpressionInfo(classOf[PositionalShingleHashes].getName,
        "positional_shingle_hashes"),
      {
        case Seq(c) => PositionalShingleHashes(c)
        case Seq(c, n) =>
          PositionalShingleHashes(c, litInt(n, "shingle width"))
        case args => throw new IllegalArgumentException(
          s"positional_shingle_hashes takes 1-2 arguments, got ${args.size}")
      }),
    (FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      args => { val a = arity("hyperplane_buckets", 3)(args)
        HyperplaneBuckets(a(0), litInt(a(1), "nBits"), litInt(a(2), "tables")) }),
    (FunctionIdentifier("upper_tri_products"),
      new ExpressionInfo(classOf[UpperTriProducts].getName, "upper_tri_products"),
      args => { val a = arity("upper_tri_products", 2)(args)
        UpperTriProducts(a(0), a(1)) }),
    // aggregate: the registry builder returns the AggregateFunction
    // itself — the analyzer wraps it in an AggregateExpression, the
    // same contract Spark's own sum/min builders follow
    (FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      args => { val a = arity("kmv_sketch", 2)(args)
        KmvSketchAgg(a(0), litInt(a(1), "kmv_sketch retain")) }))
}
