package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.engine.Sink

/** Chunking invariants (SURVEY §5.2.2 — reference `:77-79`) and sink
  * idempotency under replay (SURVEY §5.2.5 — reference `:71-91`).
  */
class SinkSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("chunked: every chunk <= size, order preserved, concat = input") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val xs = List.fill(rnd.nextInt(100) + 1)(rnd.nextInt())
      val size = rnd.nextInt(10) + 1
      val cs = Sink.chunked(xs, size)
      assert(cs.forall(_.size <= size))
      assert(cs.init.forall(_.size == size))
      assert(cs.flatten === xs)
    }
  }

  test("chunked: rejects non-positive chunk size") {
    intercept[IllegalArgumentException](Sink.chunked(Seq(1), 0))
  }

  private val schema = StructType(Seq(
    StructField("ticker", StringType), StructField("year", IntegerType),
    StructField("v", IntegerType)))

  test("upsert delivers all rows in bounded chunks and counts them") {
    val rows = (1 to 1000).map(i => Row(s"T${i % 7}", 2000 + i % 3, i))
    val df = spark.createDataFrame(rows.asJava, schema).repartition(4)
    val w = new Sink.InMemoryUpsertWriter(Seq("ticker", "year", "v"))
    val n = Sink.upsert(df, "t1", w, chunkSize = 30)
    assert(n === 1000)
    assert(w.size === 1000)
  }

  test("upsert is idempotent on the natural key under replay") {
    val rows = (1 to 100).map(i => Row(s"T$i", 2020, i))
    val df = spark.createDataFrame(rows.asJava, schema)
    val w = new Sink.InMemoryUpsertWriter(Seq("ticker", "year"))
    Sink.upsert(df, "t", w)
    val once = w.size
    assert(once === 100) // nonzero baseline: idempotency can't pass vacuously
    Sink.upsert(df, "t", w) // replay = task retry
    assert(w.size === once)
  }

  test("upsertParquet: double-run converges, new rows win on key") {
    val dir = java.nio.file.Files.createTempDirectory("sinkspec").toString + "/t"
    val df1 = spark.createDataFrame(
      Seq(Row("A", 2020, 1), Row("B", 2020, 2)).asJava, schema)
    Sink.upsertParquet(df1, dir, Seq("ticker", "year"))
    val df2 = spark.createDataFrame(
      Seq(Row("A", 2020, 99), Row("C", 2021, 3)).asJava, schema)
    Sink.upsertParquet(df2, dir, Seq("ticker", "year"))
    Sink.upsertParquet(df2, dir, Seq("ticker", "year")) // idempotent replay
    val out = spark.read.parquet(dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(out === Map(("A", 2020) -> 99, ("B", 2020) -> 2, ("C", 2021) -> 3))
  }

  test("attach to a disposed or unknown writerId fails fast, never resurrects a store") {
    val owner = new Sink.InMemoryUpsertWriter(Seq("ticker"))
    val df = spark.createDataFrame(Seq(Row("A", 2020, 1)).asJava, schema)
    Sink.upsert(df, "t", owner): Unit
    // live id: attach sees the existing rows
    assert(Sink.InMemoryUpsertWriter.attach(owner.id, Seq("ticker")).size === 1)
    owner.dispose()
    // disposed id: a write task attaching must throw, not report
    // success while dropping every row into a fresh empty map
    intercept[IllegalStateException] {
      Sink.InMemoryUpsertWriter.attach(owner.id, Seq("ticker"))
    }
    intercept[IllegalStateException] {
      Sink.InMemoryUpsertWriter.attach("no-such-writer", Seq("ticker"))
    }
  }

  test("upsert fail-fast: writer exception aborts the job") {
    val rows = (1 to 10).map(i => Row("T", 2020, i))
    val df = spark.createDataFrame(rows.asJava, schema)
    val bad = new Sink.ChunkWriter {
      def writeChunk(table: String, chunk: Seq[Row]): Unit =
        throw new RuntimeException("endpoint down")
    }
    val e = intercept[Exception](Sink.upsert(df, "t", bad))
    assert(e.getMessage != null)
  }
}
