package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.engine.{HttpChunkWriter, Sink}

/** Drives the live-HTTP form of the chunked upsert (reference
  * `etl_supabase.py:70-84`) against a local stub endpoint: chunking,
  * JSON shape, headers, fail-fast on non-2xx, and idempotent replay
  * through the full distributed Sink.upsert path.
  */
class HttpChunkWriterSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("ticker", StringType),
    StructField("year", IntegerType),
    StructField("v", IntegerType)))

  /** Stub PostgREST: records (path, prefer, contentType, body) per
    * request; responds with `status`. Returns (server, log).
    */
  private def stub(status: Int) = {
    val log = new ConcurrentLinkedQueue[(String, String, String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/rest/v1", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      log.add((exchange.getRequestURI.getPath,
        exchange.getRequestHeaders.getFirst("Prefer"),
        exchange.getRequestHeaders.getFirst("Content-Type"),
        body))
      exchange.sendResponseHeaders(status, -1) // no response body
      exchange.close()
    })
    server.start()
    (server, log)
  }

  private def rows(n: Int): Seq[Row] =
    (1 to n).map(i => Row(s"T$i", 2020, i))

  test("chunks arrive as JSON arrays at <baseUrl>/<table> with the reference's headers") {
    val (server, log) = stub(201)
    try {
      val writer = new HttpChunkWriter(
        s"http://127.0.0.1:${server.getAddress.getPort}/rest/v1")
      val df = spark.createDataFrame(rows(10).asJava, schema).repartition(1)
      val written = Sink.upsert(df, "fpt_income_statement", writer, chunkSize = 3)
      assert(written === 10)
      val reqs = log.asScala.toSeq
      assert(reqs.size === 4) // 3+3+3+1
      assert(reqs.forall(_._1 == "/rest/v1/fpt_income_statement"))
      assert(reqs.forall(_._2 == "return=minimal"))
      assert(reqs.forall(_._3 == "application/json"))
      // each body is a JSON array of <=3 three-field objects
      val objCounts = reqs.map(_._4.sliding(9).count(_ == "\"ticker\":"))
      assert(objCounts.forall(_ <= 3) && objCounts.sum === 10)
      assert(reqs.forall(r => r._4.startsWith("[") && r._4.endsWith("]")))
    } finally server.stop(0)
  }

  test("JSONB map columns serialize as nested JSON objects (the reference's data pack)") {
    val jsonbSchema = StructType(Seq(
      StructField("ticker", StringType),
      StructField("year", IntegerType),
      StructField("data", MapType(StringType, StringType))))
    val (server, log) = stub(201)
    try {
      val writer = new HttpChunkWriter(
        s"http://127.0.0.1:${server.getAddress.getPort}/rest/v1")
      val df = spark.createDataFrame(
        Seq(Row("FPT", 2021, Map("Doanh thu" -> "1234.5", "LNST" -> null))).asJava,
        jsonbSchema)
      Sink.upsert(df, "t", writer): Unit
      val body = log.asScala.head._4
      assert(body ===
        """[{"ticker":"FPT","year":2021,"data":{"Doanh thu":"1234.5","LNST":null}}]""")
    } finally server.stop(0)
  }

  test("non-2xx fails the chunk loudly (reference raise_for_status) and aborts the job") {
    val (server, log) = stub(500)
    try {
      val writer = new HttpChunkWriter(
        s"http://127.0.0.1:${server.getAddress.getPort}/rest/v1")
      val df = spark.createDataFrame(rows(5).asJava, schema).repartition(1)
      val e = intercept[Exception](Sink.upsert(df, "t", writer))
      assert(e.getMessage != null)
      assert(log.asScala.nonEmpty) // it did try, then aborted
    } finally server.stop(0)
  }

  test("replay is idempotent end-to-end: an upserting endpoint converges to one row per key") {
    // keyed store behind the stub = the PostgREST upsert contract
    val (server, log) = stub(201)
    try {
      val writer = new HttpChunkWriter(
        s"http://127.0.0.1:${server.getAddress.getPort}/rest/v1")
      val df = spark.createDataFrame(rows(7).asJava, schema).repartition(2)
      Sink.upsert(df, "t", writer, chunkSize = 2): Unit
      Sink.upsert(df, "t", writer, chunkSize = 2): Unit // at-least-once replay
      // rowJson is deterministic (schema field order), so key-dedup of
      // the delivered record strings == the endpoint's keyed upsert
      val objs = log.asScala.flatMap(
        _._4.stripPrefix("[").stripSuffix("]").split("(?<=\\}),(?=\\{)"))
      assert(objs.size === 14) // every chunk delivered twice...
      assert(objs.toSet.size === 7) // ...but converges to 7 distinct records
    } finally server.stop(0)
  }

  test("authenticated factory carries apikey + bearer headers") {
    val seen = new ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/rest/v1", { exchange =>
      seen.add((exchange.getRequestHeaders.getFirst("apikey"),
        exchange.getRequestHeaders.getFirst("Authorization")))
      exchange.sendResponseHeaders(201, -1)
      exchange.close()
    })
    server.start()
    try {
      val writer = HttpChunkWriter.supabase(
        s"http://127.0.0.1:${server.getAddress.getPort}", "sekret")
      val df = spark.createDataFrame(rows(1).asJava, schema)
      Sink.upsert(df, "t", writer): Unit
      assert(seen.asScala.head === ("sekret", "Bearer sekret"))
    } finally server.stop(0)
  }
}
