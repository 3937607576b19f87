package graft.engine

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Row

/** HTTP implementation of [[Sink.ChunkWriter]] — the live form of the
  * reference's `upsert_table` (reference `etl_supabase.py:70-84`):
  * each chunk is serialized as ONE JSON array and POSTed to
  * `<baseUrl>/<table>`, with `Prefer: return=minimal` and fail-fast on
  * any non-2xx status (`:79-82` `resp.raise_for_status()`). Idempotency
  * is the endpooint's contract (PostgREST upsert on the table's natural
  * key, reference docstring `:71-72`); this writer's job is only to
  * deliver chunks at-least-once and abort loudly, which composes with
  * Spark task retry into the same converged end state as the
  * reference's sequential loop.
  *
  * Serialization: rows become JSON objects keyed by field name, in
  * schema order; `Map` columns (the JSONB `data` pack) become nested
  * objects, arrays become JSON arrays, and NaN/Infinity — which JSON
  * cannot carry — are written as null (the reference's transform
  * already nulls NaN upstream, `etl_supabase.py:50-57`; this is the
  * same rule applied at the wire).
  *
  * Scale posture: the writer is Serializable (only strings cross the
  * closure); the HttpClient is per-executor transient state, built on
  * first use after deserialization. One in-flight request per task —
  * parallelism is partition count, exactly [[Sink.upsert]]'s model.
  */
class HttpChunkWriter(baseUrl: String,
                      headers: Map[String, String] = Map.empty,
                      requestTimeoutSec: Long = 60)
    extends Sink.ChunkWriter {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(requestTimeoutSec))
      .build()

  override def writeChunk(table: String, chunk: Seq[Row]): Unit = {
    val body = HttpChunkWriter.toJsonArray(chunk)
    val builder = HttpRequest.newBuilder(URI.create(s"$baseUrl/$table"))
      .timeout(java.time.Duration.ofSeconds(requestTimeoutSec))
      .header("Content-Type", "application/json")
      .header("Prefer", "return=minimal")
    headers.foreach { case (k, v) => builder.header(k, v) }
    val resp = client.send(
      builder.POST(HttpRequest.BodyPublishers.ofString(body,
        StandardCharsets.UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new java.io.IOException(
        s"upsert chunk (${chunk.size} rows) to $table failed: " +
          s"HTTP ${resp.statusCode()} ${resp.body().take(500)}")
  }
}

object HttpChunkWriter {

  /** The reference's exact header recipe (`etl_supabase.py:23-32`):
    * service key as both `apikey` and bearer token, against the
    * PostgREST base `<supabaseUrl>/rest/v1`.
    */
  def supabase(supabaseUrl: String, serviceKey: String): HttpChunkWriter =
    new HttpChunkWriter(
      s"${supabaseUrl.stripSuffix("/")}/rest/v1",
      Map("apikey" -> serviceKey, "Authorization" -> s"Bearer $serviceKey"))

  /** Chunk → JSON array. Deterministic: fields in schema order, map
    * keys in sorted order (so a replayed chunk is byte-identical —
    * useful for dedup at test stubs and idempotent at any endpoint).
    */
  def toJsonArray(chunk: Seq[Row]): String =
    chunk.map(rowJson).mkString("[", ",", "]")

  private def rowJson(row: Row): String = {
    val fields = row.schema.fieldNames
    fields.indices.map { i =>
      quote(fields(i)) + ":" + valueJson(row.get(i))
    }.mkString("{", ",", "}")
  }

  private[engine] def valueJson(v: Any): String = v match {
    case null => "null"
    case s: String => quote(s)
    case b: Boolean => b.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float =>
      if (f.isNaN || f.isInfinite) "null" else f.toString
    case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, mv) => (String.valueOf(k), mv) }
        .sortBy(_._1)
        .map { case (k, mv) => quote(k) + ":" + valueJson(mv) }
        .mkString("{", ",", "}")
    case a: scala.collection.Seq[_] =>
      a.map(valueJson).mkString("[", ",", "]")
    case a: Array[_] => a.map(valueJson).mkString("[", ",", "]")
    case r: Row => rowJson(r)
    case other => quote(other.toString) // Timestamp, Date, enum-ish
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb += '"'
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
    sb.toString()
  }
}
