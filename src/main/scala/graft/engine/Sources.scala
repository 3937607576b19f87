package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources. The reference's sources are three per-symbol financial
  * statement API pulls (reference `etl_supabase.py:115-119`) plus
  * env config (`:14-18`). The engine keeps the connector SHAPE as an
  * interface — a statement source yields a wide DataFrame per
  * (symbol, statement) — while the harness binds it to the driver's
  * parquet fixtures under `/root/testdata` (one dir per scale factor).
  *
  * Scale posture: a real API connector implements DataSource V2
  * `TableProvider` with one `InputPartition` per (symbol, statement)
  * so a 10k-symbol universe fans out across executors; the fixture
  * binding is a plain parquet scan which already gives vectorized
  * read + filter/column pushdown.
  */
object Sources {

  /** Statement kinds in the reference (`:117-119`). */
  sealed trait Statement { def name: String }
  case object Income extends Statement { val name = "income_statement" }
  case object Balance extends Statement { val name = "balance_sheet" }
  case object CashFlow extends Statement { val name = "cash_flow" }

  /** Connector seam: wide table for one (symbol, statement). */
  trait StatementSource {
    def load(spark: SparkSession, symbol: String, statement: Statement): DataFrame
  }

  /** Concrete fixture-backed connector: statement tables laid out as
    * `<base>/<statement.name>` parquet directories carrying a ticker
    * column (resolved case-insensitively like every other engine
    * lookup). The symbol predicate is a plain column filter, so it
    * pushes down to the parquet scan — listing a symbol never reads
    * the other symbols' row groups. A production HTTP connector
    * implements this same trait (as a DSv2 TableProvider with one
    * InputPartition per (symbol, statement) for executor fan-out,
    * reference `etl_supabase.py:115-119`).
    */
  final class ParquetStatementSource(base: String) extends StatementSource {
    override def load(spark: SparkSession, symbol: String,
                      statement: Statement): DataFrame = {
      val df = spark.read.parquet(s"$base/${statement.name}")
      val symCol = Schema.resolve(df, Schema.TickerNames).getOrElse(throw
        new IllegalArgumentException(
          s"statement table ${statement.name} has no ticker column " +
            s"(looked for ${Schema.TickerNames.mkString("/")})"))
      df.filter(org.apache.spark.sql.functions.col(s"`$symCol`") === symbol)
    }
  }

  /** `dropna=True` parity (`:117-119`): drop rows whose every
    * non-reserved value is null.
    */
  def dropAllNullRows(df: DataFrame): DataFrame = {
    val payload = Schema.payloadColumns(df)
    if (payload.isEmpty) df else df.na.drop("all", payload)
  }

  /** Connector bound to the DataSource V2 statement source
    * (graft.sources.StatementDataSource): the load plans a DSv2 scan
    * whose partitions fan out per (symbol, statement) on executors.
    * The `statement` helper column is internal to the source and
    * dropped so the frame is pack-ready like any wide statement table.
    */
  final class Dsv2StatementSource(years: String = "2015-2024") extends StatementSource {
    override def load(spark: SparkSession, symbol: String,
                      statement: Statement): DataFrame =
      spark.read.format("graft.sources.StatementDataSource")
        .option("symbols", symbol)
        .option("statements", statement.name)
        .option("years", years)
        .load()
        .drop("statement")
  }

  /** Live HTTP connector — the read-side twin of
    * [[HttpChunkWriter]], closing the reference's extract seam
    * (`etl_supabase.py:115-119`): same DSv2 plan as
    * [[Dsv2StatementSource]] (per-(symbol, statement) partitions,
    * column pruning, partition-pruning filters) but each partition
    * performs a real GET against `<baseUrl>/<statement>` ON THE
    * EXECUTOR — the driver never holds response bodies, and task
    * retry gives at-least-once fetch.
    */
  final class HttpStatementSource(baseUrl: String,
                                  years: String = "2015-2024")
      extends StatementSource {
    override def load(spark: SparkSession, symbol: String,
                      statement: Statement): DataFrame =
      spark.read.format("graft.sources.StatementDataSource")
        .option("url", baseUrl)
        .option("symbols", symbol)
        .option("statements", statement.name)
        .option("years", years)
        .load()
        .drop("statement")
  }

  // ---- fixture tables (TESTDATA.md) -------------------------------

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Convenience bundle over one scale-factor directory. */
  final case class Tables(spark: SparkSession, sfDir: String) {
    def region: DataFrame = table(spark, sfDir, "region")
    def nation: DataFrame = table(spark, sfDir, "nation")
    def customer: DataFrame = table(spark, sfDir, "customer")
    def supplier: DataFrame = table(spark, sfDir, "supplier")
    def part: DataFrame = table(spark, sfDir, "part")
    def orders: DataFrame = table(spark, sfDir, "orders")
    def lineitem: DataFrame = table(spark, sfDir, "lineitem")
    /** The events fixture's `ts` physical type has varied across
      * driver rounds: TIMESTAMP(NANOS) (which Spark's vectorized
      * reader rejects — read as long via the legacy conf, then
      * convert with integer `div`, not double division, because
      * nanos exceed 2^53) vs plain TIMESTAMP micros (NTZ). Values
      * are micro-exact in both layouts, so normalize by inspecting
      * the read schema rather than assuming either.
      */
    def events: DataFrame = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(table(spark, sfDir, "events"))
    }
    def documents: DataFrame = table(spark, sfDir, "documents")
    def embeddings: DataFrame = table(spark, sfDir, "embeddings")
  }

  /** Bring an `events.ts` column read from any fixture layout to
    * session-zoned micro-precision TimestampType: nanos-as-long →
    * `timestamp_micros(ts div 1000)`; TIMESTAMP_NTZ (or LTZ) →
    * plain cast, value-preserving under the engine's pinned UTC
    * session timezone.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Env-config source with fail-fast on missing keys — reference
    * `:14-18`.
    */
  def requiredEnv(name: String, env: Map[String, String] = sys.env): String =
    env.getOrElse(name,
      throw new IllegalStateException(s"Missing required env var: $name"))
}
