package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.engine.{Archive, Pipeline, Sink, Sources, Transform}

/** End-to-end parity with the reference's single entry point
  * `run_etl()` (reference `etl_supabase.py:111-158`): for each
  * (symbol, statement), EXTRACT through the concrete connector
  * (with dropna), TRANSFORM (wide→JSONB pack), ARCHIVE (wide CSV),
  * LOAD (chunked idempotent upsert), PUBLISH (object-storage double).
  * This is the flow that had never executed end-to-end before.
  */
class PipelineSpec extends SparkSpec {

  private val symbol = "Customer#000000001"

  /** Lay statement fixtures out as `<base>/<statement>` parquet from
    * the sf0.001 tables: a wide per-(cp, year) frame plus one all-null
    * payload row that extraction must drop (dropna parity).
    */
  private def writeStatementFixtures(base: String): Unit = {
    val t = Sources.Tables(spark, "/root/testdata/sf0.001")
    val wide = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name").as("CP"), year(col("o_orderdate")).as("Year"),
        col("o_totalprice").as("total_price"),
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"))
    val allNullPayload = wide.limit(1).select(
      lit(symbol).as("CP"), lit(2099).as("Year"),
      lit(null).cast("double").as("total_price"),
      lit(null).cast("string").as("status"),
      lit(null).cast("string").as("priority"))
    for (st <- Seq(Sources.Income, Sources.Balance, Sources.CashFlow))
      wide.unionByName(allNullPayload)
        .write.mode("overwrite").parquet(s"$base/${st.name}")
  }

  test("run_etl parity: extract -> pack -> archive -> upsert -> publish, idempotent") {
    val base = Files.createTempDirectory("pipesrc").toString
    val archBase = Files.createTempDirectory("pipearch").toString
    val pubRoot = Files.createTempDirectory("pipepub").toString
    writeStatementFixtures(base)

    val source = new Sources.ParquetStatementSource(base)
    val statements = Seq(Sources.Income, Sources.Balance, Sources.CashFlow)
    val specs = statements.map { st =>
      Pipeline.Spec(source, symbol, st, s"fin_${st.name}",
        s"$archBase/${st.name}", st.name)
    }
    val writer = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    val publisher = new Archive.LocalFsPublisher(pubRoot)

    val results = Pipeline.runAll(spark, specs, writer, publisher)

    // EXTRACT: connector pushdown returns only this symbol's rows, and
    // dropna removed the all-null payload row
    val expected = Sources.dropAllNullRows(
      source.load(spark, symbol, Sources.Income))
    val perStatement = expected.count()
    assert(perStatement > 0)
    assert(source.load(spark, symbol, Sources.Income).count() === perStatement + 1)

    // LOAD: every packed record upserted, store converged on the key
    assert(results.map(_.recordsUpserted) === statements.map(_ => perStatement))
    val distinctKeys = Transform.packJsonb(expected)
      .select(col("ticker"), col("year")).distinct().count()
    // store is keyed (table, naturalKey); each statement has its own table
    assert(writer.size.toLong === distinctKeys * statements.size)

    // ARCHIVE: CSV part files exist with a header row
    for (st <- statements) {
      val dir = Paths.get(s"$archBase/${st.name}")
      assert(Files.isDirectory(dir))
      val parts = Files.list(dir).iterator()
      var found = false
      while (parts.hasNext) {
        val p = parts.next()
        if (p.getFileName.toString.endsWith(".csv")) {
          found = true
          val head = Files.readAllLines(p)
          if (!head.isEmpty)
            assert(head.get(0).toLowerCase.startsWith("cp,year"))
        }
      }
      assert(found, s"no csv part files archived for ${st.name}")
    }

    // PUBLISH: every archived part file landed under the bucket prefix
    for ((st, r) <- statements.zip(results)) {
      val published = Paths.get(pubRoot, Archive.DefaultBucket, st.name)
      assert(Files.isDirectory(published))
      val n = Files.list(published).count()
      assert(n.toInt === r.filesPublished && n > 0)
    }

    // IDEMPOTENCY: replaying the whole pipeline converges (the
    // reference's re-run safety, upsert=true everywhere)
    val again = Pipeline.runAll(spark, specs, writer, publisher)
    assert(again.map(_.recordsUpserted) === results.map(_.recordsUpserted))
    assert(writer.size.toLong === distinctKeys * statements.size)
  }

  test("pipeline runs end-to-end through the DSv2 connector") {
    val archBase = Files.createTempDirectory("pipearch2").toString
    val pubRoot = Files.createTempDirectory("pipepub2").toString
    val source = new Sources.Dsv2StatementSource(years = "2019-2023")
    val spec = Pipeline.Spec(source, "FPT", Sources.Income,
      "fin_income", s"$archBase/income", "income")
    val writer = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    val r = Pipeline.run(spark, spec, writer, new Archive.LocalFsPublisher(pubRoot))
    assert(r.recordsUpserted === 5) // one packed record per year
    assert(writer.size === 5)
    assert(Files.list(Paths.get(pubRoot, Archive.DefaultBucket, "income")).count() > 0)
  }

  test("live HTTP both ends: executor-side statement GET -> pipeline -> PostgREST POST") {
    // Stub server hosts BOTH ends of the reference flow: the VNStock-
    // shaped statement API (GET, JSON array per (symbol, statement))
    // and the PostgREST upsert endpoint (POST). The statement rows
    // include one all-null-metric row extraction must drop (dropna
    // parity), and metric values reuse the synthetic generator so the
    // HTTP path is value-comparable with the DSv2 synthetic mode.
    import com.sun.net.httpserver.HttpServer
    import graft.sources.StatementDataSource.{Metrics, metricValue}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val gets = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val posts = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    server.createContext("/api", { exchange =>
      gets.add(exchange.getRequestURI.toString)
      val params = Option(exchange.getRequestURI.getQuery).getOrElse("")
        .split("&").map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v }.toMap
      val stmt = exchange.getRequestURI.getPath.stripPrefix("/api/")
      val sym = java.net.URLDecoder.decode(params("symbol"), "UTF-8")
      val rows = (params("year_from").toInt to params("year_to").toInt).map {
        y =>
          val ms = Metrics.map(m => s""""$m":${metricValue(sym, stmt, y, m)}""")
          (Seq(s""""year":$y""") ++ ms).mkString("{", ",", "}")
      } :+ (Seq(""""year":2099""") ++ Metrics.map(m => s""""$m":null"""))
        .mkString("{", ",", "}")
      val body = rows.mkString("[", ",", "]").getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.createContext("/rest/v1", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
      posts.add((exchange.getRequestURI.getPath, body))
      exchange.sendResponseHeaders(201, -1)
      exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val source = new Sources.HttpStatementSource(
        s"http://127.0.0.1:$port/api", years = "2019-2023")
      val writer = new graft.engine.HttpChunkWriter(
        s"http://127.0.0.1:$port/rest/v1")
      val archBase = Files.createTempDirectory("pipehttp").toString
      val pubRoot = Files.createTempDirectory("pipehttppub").toString
      val spec = Pipeline.Spec(source, "FPT", Sources.Income,
        "fin_income", s"$archBase/income", "income")
      val r = Pipeline.run(spark, spec, writer,
        new Archive.LocalFsPublisher(pubRoot))
      // 2019..2023 survive; the 2099 all-null row is dropna'd
      assert(r.recordsUpserted === 5)
      // the reader's GET carried symbol + year range (server prunes too)
      assert(gets.asScala.exists(u => u.contains("/api/income_statement")
        && u.contains("symbol=FPT") && u.contains("year_from=2019")
        && u.contains("year_to=2023")), s"GETs: ${gets.asScala.toSeq}")
      // packed records landed as JSON arrays at <base>/<table>
      assert(posts.asScala.nonEmpty)
      assert(posts.asScala.forall(_._1 == "/rest/v1/fin_income"))
      val payload = posts.asScala.map(_._2).mkString
      assert(payload.contains(""""ticker":"FPT""""))
      assert(!payload.contains("2099"))
      // value parity with the synthetic DSv2 mode: same generator
      assert(payload.contains(metricValue("FPT", "income_statement",
        2019, "revenue").toString))
    } finally server.stop(0)
  }

  test("multi-symbol fan-out: one GET per (symbol, statement) partition; " +
      "an injected mid-run chunk failure converges on the cron-style rerun") {
    // The reference's real daily shape is N symbols × 3 statements
    // (etl_supabase.py:115-119) under a cron that simply reruns on
    // failure (etl.yml:4-6). The stub hosts both HTTP ends; the
    // upsert end is a keyed store (PostgREST upsert semantics) whose
    // Nth POST fails once — at-least-once delivery + idempotent keys
    // must converge the rerun to the clean-run state.
    import com.sun.net.httpserver.HttpServer
    import graft.sources.StatementDataSource.{Metrics, metricValue}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val gets = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val posts = new java.util.concurrent.atomic.AtomicInteger(0)
    val failAt = 5 // one mid-run failure: some specs committed, one aborts
    val store = new java.util.concurrent.ConcurrentHashMap[
      (String, String, String), Boolean]()
    server.createContext("/api", { exchange =>
      gets.add(exchange.getRequestURI.toString)
      val params = Option(exchange.getRequestURI.getQuery).getOrElse("")
        .split("&").map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v }.toMap
      val stmt = exchange.getRequestURI.getPath.stripPrefix("/api/")
      val sym = java.net.URLDecoder.decode(params("symbol"), "UTF-8")
      val rows = (params("year_from").toInt to params("year_to").toInt).map {
        y =>
          val ms = Metrics.map(m => s""""$m":${metricValue(sym, stmt, y, m)}""")
          (Seq(s""""year":$y""") ++ ms).mkString("{", ",", "}")
      }
      val body = rows.mkString("[", ",", "]").getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.createContext("/rest/v1", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
      if (posts.incrementAndGet() == failAt) {
        exchange.sendResponseHeaders(500, -1)
        exchange.close()
      } else {
        val table = exchange.getRequestURI.getPath.stripPrefix("/rest/v1/")
        // keyed upsert double: (table, ticker, year) — re-POSTs of
        // the same record overwrite, PostgREST's on-conflict shape
        val tickers = """"ticker":"([^"]+)"""".r
          .findAllMatchIn(body).map(_.group(1)).toSeq
        val years = """"year":(\d+)""".r
          .findAllMatchIn(body).map(_.group(1)).toSeq
        tickers.zip(years).foreach { case (t, y) =>
          store.put((table, t, y), true): Unit
        }
        exchange.sendResponseHeaders(201, -1)
        exchange.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val symbols = Seq("AAA", "BBB", "CCC", "DDD")
      val statements = Seq(Sources.Income, Sources.Balance, Sources.CashFlow)

      // fan-out shape first: ONE DSv2 read over all symbols plans one
      // partition (and so exactly one executor-side GET) per
      // (symbol, statement)
      val fanout = spark.read.format("graft.sources.StatementDataSource")
        .option("url", s"http://127.0.0.1:$port/api")
        .option("symbols", symbols.mkString(","))
        .option("years", "2019-2021").load()
      assert(fanout.rdd.getNumPartitions === 12)
      gets.clear()
      assert(fanout.count() === 12 * 3) // 4 symbols x 3 statements x 3 years
      val got = gets.asScala.toSeq
      assert(got.size === 12, s"one GET per (symbol, statement): $got")
      for (sym <- symbols; st <- statements)
        assert(got.count(u => u.contains(s"/api/${st.name}")
          && u.contains(s"symbol=$sym")) === 1, s"($sym, ${st.name}) in $got")

      // the reference loop at fan-out: 12 specs through the live
      // writer; POST #5 dies mid-run, the cron rerun converges
      val archBase = Files.createTempDirectory("pipefan").toString
      val pubRoot = Files.createTempDirectory("pipefanpub").toString
      val writer = new graft.engine.HttpChunkWriter(
        s"http://127.0.0.1:$port/rest/v1")
      val specs = for (sym <- symbols; st <- statements) yield
        Pipeline.Spec(
          new Sources.HttpStatementSource(
            s"http://127.0.0.1:$port/api", years = "2019-2021"),
          sym, st, s"fin_${st.name}",
          s"$archBase/${st.name}_$sym", s"${st.name}/$sym")
      def runAll(): Unit = Pipeline.runAll(spark, specs, writer,
        new Archive.LocalFsPublisher(pubRoot)): Unit
      val firstFailed =
        try { runAll(); false } catch { case _: Exception => true }
      assert(firstFailed, "POST #5 must abort the first run loudly")
      assert(store.size < 36, "the aborted run must be mid-flight")
      runAll() // the cron tick
      val expected = (for (sym <- symbols; st <- statements; y <- 2019 to 2021)
        yield (s"fin_${st.name}", sym, y.toString)).toSet
      assert(store.keySet.asScala.toSet === expected)
    } finally server.stop(0)
  }

  test("runIncremental (AvailableNow): two incremental runs == one batch run") {
    // The cron analog as code: files land in the statement dir
    // between runs; each runIncremental drains only what's new
    // (checkpointed file offsets) and the keyed upsert makes the
    // final store identical to ONE batch run over everything.
    import spark.implicits._
    val base = Files.createTempDirectory("pipeincr").toString
    val ckpt = Files.createTempDirectory("pipeincrckpt").toString
    val dir = s"$base/${Sources.Income.name}"
    def batchOf(years: Range): org.apache.spark.sql.DataFrame =
      years.map(y => ("FPT", y, y * 100.0, s"s$y")).toDF(
        "CP", "Year", "total_price", "status")
    batchOf(2015 to 2018).write.mode("append").parquet(dir)

    val incWriter = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    Pipeline.runIncremental(spark, base, "FPT", Sources.Income,
      "fin_income", incWriter, ckpt)
    assert(incWriter.size === 4)

    // day 2: more files appear; a re-run picks up ONLY those
    batchOf(2019 to 2021).write.mode("append").parquet(dir)
    Pipeline.runIncremental(spark, base, "FPT", Sources.Income,
      "fin_income", incWriter, ckpt)
    assert(incWriter.size === 7)

    // equivalence with one batch run over the final directory
    val batchWriter = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    val archBase = Files.createTempDirectory("pipeincrarch").toString
    val pubRoot = Files.createTempDirectory("pipeincrpub").toString
    Pipeline.run(spark,
      Pipeline.Spec(new Sources.ParquetStatementSource(base), "FPT",
        Sources.Income, "fin_income", s"$archBase/income", "income"),
      batchWriter, new Archive.LocalFsPublisher(pubRoot))
    def snapshot(w: Sink.InMemoryUpsertWriter): Set[String] =
      w.rows.map(_.toString).toSet
    assert(snapshot(incWriter) === snapshot(batchWriter))

    // a third run with nothing new is a no-op (idempotent cron tick)
    Pipeline.runIncremental(spark, base, "FPT", Sources.Income,
      "fin_income", incWriter, ckpt)
    assert(snapshot(incWriter) === snapshot(batchWriter))
  }

  test("connector fails loudly when the statement table lacks a ticker column") {
    val base = Files.createTempDirectory("pipebad").toString
    import spark.implicits._
    Seq((1, 2.0)).toDF("a", "b").write.parquet(s"$base/income_statement")
    val e = intercept[IllegalArgumentException] {
      new Sources.ParquetStatementSource(base).load(spark, "X", Sources.Income)
    }
    assert(e.getMessage.contains("no ticker column"))
  }

  test("partitioned archive: dynamic overwrite touches only re-run partitions") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-partarch").toString
    val path = s"$base/archive"
    val full = Seq((2023, 1L, "a"), (2023, 2L, "b"), (2024, 3L, "c"))
      .toDF("year", "id", "v")
    Archive.toPartitionedParquet(full, path, Seq("year"))
    // re-run ONLY the 2024 slice with changed content: 2023 must survive
    val slice = Seq((2024, 3L, "c2"), (2024, 4L, "d")).toDF("year", "id", "v")
    Archive.toPartitionedParquet(slice, path, Seq("year"))
    val got = spark.read.parquet(path)
      .select("year", "id", "v").as[(Int, Long, String)].collect().toSet
    assert(got === Set((2023, 1L, "a"), (2023, 2L, "b"),
      (2024, 3L, "c2"), (2024, 4L, "d")))
  }

  test("JSONL archive: documents round-trip losslessly; malformed input fails fast") {
    val base = Files.createTempDirectory("graft-jsonl").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Archive.toJsonl(docs, s"$base/corpus")
    // gzip shards on disk (the compressed-corpus wire format)
    assert(Files.list(Paths.get(s"$base/corpus")).iterator().asScala
      .exists(_.toString.endsWith(".json.gz")))
    val back = Archive.readJsonl(spark, s"$base/corpus", docs.schema)
    assert(back.schema === docs.schema)
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    assert(back.collect().sortBy(key).toSeq ===
      docs.collect().sortBy(key).toSeq)
    // FAILFAST: a malformed line is an ingest error, not a null row
    Files.write(Paths.get(s"$base/bad.jsonl"),
      "{\"doc_id\": 1, \"text\": \"ok\"}\nnot json at all\n".getBytes)
    intercept[org.apache.spark.SparkException] {
      Archive.readJsonl(spark, s"$base/bad.jsonl", docs.schema).collect()
    }
  }

  test("compactParquet: many small shards become few files, content preserved") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-compact").toString
    val path = s"$base/t"
    // 64 tiny shards — the small-files shape a chunked writer leaves
    (1L to 2048L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(64).write.parquet(path)
    val before = Files.list(Paths.get(path)).iterator().asScala
      .count(_.toString.endsWith(".parquet"))
    assert(before == 64)
    val n = graft.engine.Archive.compactParquet(spark, path,
      targetBytes = 1024L * 1024)
    val after = Files.list(Paths.get(path)).iterator().asScala
      .count(_.toString.endsWith(".parquet"))
    assert(after.toLong == n && after < 8, s"still $after files")
    val got = spark.read.parquet(path).as[(Long, String)].collect().toSet
    assert(got == (1L to 2048L).map(i => (i, s"v$i")).toSet)
    assert(!Files.exists(Paths.get(s"$path.compact-tmp")) &&
      !Files.exists(Paths.get(s"$path.compact-old")))
    // a hive-partitioned dir must be refused, not silently flattened
    val part = s"$base/part"
    Seq((2023, 1L), (2024, 2L)).toDF("year", "id")
      .write.partitionBy("year").parquet(part)
    intercept[IllegalArgumentException] {
      graft.engine.Archive.compactParquet(spark, part)
    }
  }

  test("compactParquet heals a mid-swap crash and clears stale leftovers") {
    import spark.implicits._
    import java.nio.file.{Files => F, Paths, StandardCopyOption}
    val root = Files.createTempDirectory("compactheal").toString
    val path = s"$root/table"
    (1 to 100).toDF("x").repartition(8).write.parquet(path)
    val expected = spark.read.parquet(path).as[Int].collect().sorted.toSeq
    // crash window: first rename done, second never happened — data
    // lives only under .compact-old, plus a dead partial tmp
    F.move(Paths.get(path), Paths.get(path + ".compact-old"),
      StandardCopyOption.ATOMIC_MOVE)
    Seq(999).toDF("x").write.parquet(path + ".compact-tmp")
    val n = graft.engine.Archive.compactParquet(spark, path,
      targetBytes = Long.MaxValue)
    assert(n === 1)
    assert(spark.read.parquet(path).as[Int].collect().sorted.toSeq === expected)
    assert(!F.exists(Paths.get(path + ".compact-old")))
    assert(!F.exists(Paths.get(path + ".compact-tmp")))
    // a .compact-old BESIDE a live table is a stale displaced copy
    // from a crash after the swap: removed, live data untouched
    Seq(1000).toDF("x").write.parquet(path + ".compact-old")
    graft.engine.Archive.compactParquet(spark, path,
      targetBytes = Long.MaxValue)
    assert(spark.read.parquet(path).as[Int].collect().sorted.toSeq === expected)
    assert(!F.exists(Paths.get(path + ".compact-old")))
  }

  test("versioned table: reader racing repeated compactions sees old or new, never nothing") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-versioned").toString + "/t"
    val data = (1L to 512L).map(i => (i, s"v$i"))
    Archive.writeVersionedParquet(
      data.toDF("id", "v").repartition(16), root)
    assert(Archive.currentVersion(root) === Some(0L))
    val expected = data.toSet
    // reader thread: resolve through the manifest and READ, in a hot
    // loop, while the main thread swaps versions via compaction — the
    // in-place swap this replaces had a provable missing-directory
    // window here; the manifest flip must never expose one
    @volatile var failure: Option[Throwable] = None
    @volatile var stop = false
    var reads = 0
    val reader = new Thread(() => {
      try while (!stop) {
        val got = spark.read.parquet(Archive.resolveVersioned(root))
          .as[(Long, String)].collect().toSet
        assert(got == expected, s"partial read: ${got.size} rows")
        reads += 1
      } catch { case t: Throwable => failure = Some(t) }
    })
    reader.start()
    try (1 to 4).foreach { _ =>
      Archive.compactVersionedParquet(spark, root, targetBytes = 1024L * 1024)
    } finally { stop = true; reader.join(30000) }
    failure.foreach(throw _)
    assert(reads > 0, "reader thread never completed a read")
    assert(Archive.currentVersion(root) === Some(4L))
    // retention contract: live version + exactly one back version
    val dirs = Files.list(Paths.get(root)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("v")).toSeq.sorted
    assert(dirs == Seq("v3", "v4"), s"unexpected versions: $dirs")
    // a crashed writer's orphan above the manifest is GC'd on next write
    Seq(9L -> "dead").toDF("id", "v").write.parquet(s"$root/v9")
    Archive.writeVersionedParquet(data.toDF("id", "v"), root)
    assert(Archive.currentVersion(root) === Some(5L))
    assert(!Files.exists(Paths.get(s"$root/v9")))
    assert(Archive.readVersionedParquet(spark, root)
      .as[(Long, String)].collect().toSet == expected)
  }

  test("requiredEnv: fail-fast on missing key, passthrough on present") {
    assert(Sources.requiredEnv("K", Map("K" -> "v")) === "v")
    intercept[IllegalStateException](Sources.requiredEnv("MISSING", Map.empty))
  }
}
