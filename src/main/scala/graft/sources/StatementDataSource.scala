package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for financial-statement pulls — the
  * scale-out form of the reference's per-(symbol, statement) API
  * loop (reference `etl_supabase.py:115-119`, SURVEY §2.1 S1–S3):
  * `planInputPartitions` emits ONE partition per (symbol, statement),
  * so a 10k-symbol universe fans out across executors instead of
  * looping on the driver; `SupportsPushDownRequiredColumns` prunes
  * unrequested metric columns before any row is built, and
  * `SupportsPushDownFilters` turns symbol/statement/year predicates
  * into partition pruning (fewer fetches planned, not rows dropped
  * after the fact).
  *
  * The per-partition fetch is the connector seam, with TWO bindings:
  * without a `url` option the reader generates deterministic
  * synthetic statements (hash-derived metric values); with `url` it
  * performs a real HTTP GET per partition —
  * `<url>/<statement>?symbol=<s>&year_from=<a>&year_to=<b>` — and
  * parses the JSON-array response into rows (the VNStock-shaped
  * live read side, reference `etl_supabase.py:115-119`). The fetch
  * runs ON THE EXECUTOR inside the partition reader, so a 10k-call
  * universe parallelizes like any scan, task retry gives
  * at-least-once fetch semantics, and the pushed year range rides
  * the query string so the SERVER prunes too. Non-2xx responses
  * throw — a failed pull is a failed task, never silent empty data.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.StatementDataSource")
  *   .option("symbols", "FPT,VNM")
  *   .option("statements", "income_statement,balance_sheet")
  *   .option("years", "2015-2024")
  *   .option("url", "http://api.example.com/statements") // live mode
  *   .load()
  * }}}
  */
class StatementDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StatementDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new StatementTable(new CaseInsensitiveStringMap(properties))
}

object StatementDataSource {

  val Metrics: Seq[String] = Seq(
    "revenue", "gross_profit", "operating_income", "net_income",
    "total_assets", "total_liabilities", "equity", "operating_cash_flow")

  /** Wide statement schema: reserved columns + metric payload. */
  val Schema: StructType = StructType(
    Seq(StructField("cp", StringType, nullable = false),
      StructField("statement", StringType, nullable = false),
      StructField("year", IntegerType, nullable = false)) ++
      Metrics.map(m => StructField(m, DoubleType, nullable = true)))

  def parseYears(spec: String): Range.Inclusive = {
    val parts = spec.split("-", 2)
    parts(0).trim.toInt to parts(parts.length - 1).trim.toInt
  }

  /** Deterministic synthetic fetch for one (symbol, statement, year,
    * metric) — the stand-in for the HTTP client response.
    */
  def metricValue(symbol: String, statement: String, year: Int,
                  metric: String): Double = {
    var h = 0xcbf29ce484222325L
    for (s <- Seq(symbol, statement, metric); c <- s)
      h = (h ^ c) * 0x100000001b3L
    h = (h ^ year) * 0x100000001b3L
    (java.lang.Math.floorMod(h, 1000000000L)).toDouble / 1000.0
  }
}

private[sources] class StatementTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = "graft_statements"

  override def schema(): StructType = StatementDataSource.Schema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new StatementScanBuilder(
      options.getOrDefault("symbols", "FPT").split(",").map(_.trim).toSeq,
      options.getOrDefault("statements",
        "income_statement,balance_sheet,cash_flow").split(",").map(_.trim).toSeq,
      StatementDataSource.parseYears(options.getOrDefault("years", "2015-2024")),
      Option(options.get("url")))
}

private[sources] class StatementScanBuilder(
    symbols: Seq[String], statements: Seq[String], years: Range.Inclusive,
    url: Option[String])
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = StatementDataSource.Schema
  private var symbolsF: Seq[String] = symbols
  private var statementsF: Seq[String] = statements
  private var yearFrom: Int = years.start
  private var yearTo: Int = years.end
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Predicates on the three partition-defining columns prune the
    * PARTITION PLAN, not just rows: a `year > X` or `cp = S` filter
    * means fewer (symbol, statement) partitions and a narrower year
    * range per reader — the statements never fetched at all, which at
    * the reference's per-call HTTP cost is the entire point. Fully-
    * applied filters are consumed here (not re-evaluated by Spark);
    * anything else stays residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition(applyFilter)
    pushed = supported
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  private def applyFilter(f: Filter): Boolean = f match {
    case EqualTo(a, v: String) if is(a, "cp") =>
      symbolsF = symbolsF.filter(_ == v); true
    case In(a, vs) if is(a, "cp") && vs.forall(_.isInstanceOf[String]) =>
      val keep = vs.map(_.asInstanceOf[String]).toSet
      symbolsF = symbolsF.filter(keep); true
    case EqualTo(a, v: String) if is(a, "statement") =>
      statementsF = statementsF.filter(_ == v); true
    case In(a, vs) if is(a, "statement") && vs.forall(_.isInstanceOf[String]) =>
      val keep = vs.map(_.asInstanceOf[String]).toSet
      statementsF = statementsF.filter(keep); true
    case EqualTo(a, v: Int) if is(a, "year") =>
      yearFrom = math.max(yearFrom, v); yearTo = math.min(yearTo, v); true
    case GreaterThan(a, v: Int) if is(a, "year") =>
      yearFrom = math.max(yearFrom, v + 1); true
    case GreaterThanOrEqual(a, v: Int) if is(a, "year") =>
      yearFrom = math.max(yearFrom, v); true
    case LessThan(a, v: Int) if is(a, "year") =>
      yearTo = math.min(yearTo, v - 1); true
    case LessThanOrEqual(a, v: Int) if is(a, "year") =>
      yearTo = math.min(yearTo, v); true
    case _ => false
  }

  private def is(attr: String, col: String): Boolean =
    attr.equalsIgnoreCase(col)

  override def build(): Scan =
    new StatementScan(symbolsF, statementsF, yearFrom to yearTo, required, url)
}

private[sources] class StatementScan(
    symbols: Seq[String], statements: Seq[String], years: Range.Inclusive,
    required: StructType, url: Option[String]) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  /** The fan-out: one partition per (symbol, statement). */
  override def planInputPartitions(): Array[InputPartition] =
    (for (s <- symbols; st <- statements)
      yield StatementPartition(s, st, years.start, years.end)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new StatementReaderFactory(required, url)
}

private[sources] case class StatementPartition(
    symbol: String, statement: String, yearFrom: Int, yearTo: Int)
  extends InputPartition

private[sources] class StatementReaderFactory(required: StructType,
    url: Option[String])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StatementPartition]
    url match {
      case Some(base) => new HttpStatementReader(base, p, required)
      case None       => syntheticReader(p)
    }
  }

  private def syntheticReader(p: StatementPartition): PartitionReader[InternalRow] = {
    val fields = required.fields
    new PartitionReader[InternalRow] {
      private var year = p.yearFrom - 1
      override def next(): Boolean = { year += 1; year <= p.yearTo }
      override def get(): InternalRow = {
        val values: Array[Any] = fields.map(_.name match {
          case "cp" => UTF8String.fromString(p.symbol)
          case "statement" => UTF8String.fromString(p.statement)
          case "year" => year
          case metric => StatementDataSource.metricValue(
            p.symbol, p.statement, year, metric)
        })
        new GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}

/** Executor-side HTTP fetch for one (symbol, statement) partition:
  * one GET per partition, response = JSON array of flat objects
  * (year + metric fields). Rows are built against the PRUNED schema
  * — a metric the query never selects is simply not read out of the
  * parsed tree. Jackson (already on Spark's classpath) does the
  * parsing; any non-2xx status or malformed body throws, failing the
  * task so Spark's retry gives at-least-once fetch semantics.
  */
private[sources] class HttpStatementReader(base: String,
    p: StatementPartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[InternalRow] = fetch()
  private var current: InternalRow = _

  private def fetch(): Iterator[InternalRow] = {
    val uri = java.net.URI.create(
      s"${base.stripSuffix("/")}/${p.statement}" +
        s"?symbol=${java.net.URLEncoder.encode(p.symbol, "UTF-8")}" +
        s"&year_from=${p.yearFrom}&year_to=${p.yearTo}")
    val resp = HttpStatementReader.client.send(
      java.net.http.HttpRequest.newBuilder(uri)
        .timeout(java.time.Duration.ofSeconds(60)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new java.io.IOException(
        s"statement fetch $uri failed: HTTP ${resp.statusCode()} " +
          resp.body().take(500))
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(resp.body())
    if (!root.isArray)
      throw new java.io.IOException(
        s"statement fetch $uri: expected JSON array, got ${root.getNodeType}")
    root.elements().asScala.map { node =>
      val values: Array[Any] = required.fields.map { f =>
        f.name match {
          case "cp" => UTF8String.fromString(p.symbol)
          case "statement" => UTF8String.fromString(p.statement)
          case "year" => node.path("year").asInt()
          case metric =>
            val v = node.path(metric)
            if (v.isMissingNode || v.isNull) null else v.asDouble()
        }
      }
      new GenericInternalRow(values): InternalRow
    }
  }

  override def next(): Boolean = {
    val has = rows.hasNext
    if (has) current = rows.next()
    has
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

private[sources] object HttpStatementReader {
  /** One client per executor JVM: HttpClient is thread-safe and owns
    * a selector thread + connection pool, so per-partition instances
    * would leak both across a 10k-partition scan (JDK 17 has no
    * close()). Connect timeout bounds a black-holed server; the
    * request timeout rides each request.
    */
  lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(20))
      .build()
}
