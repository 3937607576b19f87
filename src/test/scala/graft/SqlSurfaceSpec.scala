package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.FunctionRegistration

import graft.functions.{Text, Vectors}
import graft.queries.Registry

/** The SQL surface: native expressions callable from spark.sql (same
  * results as the Column API), the extension injector, and the
  * shared-text SQL entry query.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    FunctionRegistration.registerAll(spark)
  }

  test("SQL functions match the Column API bit-for-bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash64(split(trim(lower(text)), '\\s+')) AS sh,
        minhash(shingle_hashes(text, 3)) AS sig
        FROM docs_sql""").collect()
    val viaCols = docs.select(col("doc_id"),
      Text.simHash(Text.tokens(col("text"))).as("sh"),
      Text.minHash(Text.shingleHashes(col("text"), 3)).as("sig")).collect()
    assert(viaSql.length === viaCols.length && viaSql.nonEmpty)
    viaSql.zip(viaCols).foreach { case (a, b) =>
      assert(a.getStruct(1) === b.getStruct(1))
      assert(a.getSeq[Long](2) === b.getSeq[Long](2))
    }
  }

  test("cosine_sim and jaccard_long work in SQL expressions") {
    val r = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
               jaccard_long(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j""").first()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12)
  }

  test("upper_tri_products emits centered row-major i<=j products") {
    val r = spark.sql(
      """SELECT upper_tri_products(
           array(CAST(3.0 AS FLOAT), CAST(5.0 AS FLOAT)),
           array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) AS t""").first()
    // centered = [2, 3] → products (0,0)=4, (0,1)=6, (1,1)=9
    assert(r.getSeq[Double](0) === Seq(4.0, 6.0, 9.0))
    // length mismatch → null, mirroring SUM-ignores-null semantics
    val n = spark.sql(
      """SELECT upper_tri_products(array(CAST(1.0 AS DOUBLE)),
           array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) AS t""").first()
    assert(n.isNullAt(0))
  }

  test("kmv_sketch aggregates from SQL: k+1 smallest distinct values, " +
      "ascending, dedup'd") {
    val r = spark.sql(
      """SELECT kmv_sketch(h, 4) AS buf FROM (
           SELECT explode(array(9L, 3L, 7L, 3L, 1L, 8L, 5L, 1L)) AS h)""")
      .first()
    // distinct = {1,3,5,7,8,9}; the 4 smallest ascending
    assert(r.getSeq[Long](0) === Seq(1L, 3L, 5L, 7L))
    // grouped: bounded state per group, null inputs skipped
    val g = spark.sql(
      """SELECT g, kmv_sketch(h, 3) AS buf FROM VALUES
           (0, 5L), (0, 2L), (0, NULL), (0, 9L), (0, 2L), (1, 4L)
           AS t(g, h) GROUP BY g ORDER BY g""").collect()
    assert(g(0).getSeq[Long](1) === Seq(2L, 5L, 9L))
    assert(g(1).getSeq[Long](1) === Seq(4L))
  }

  test("GraftExtensions accepts every function descriptor") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e) // throws on any malformed descriptor
    assert(graft.expressions.GraftFunctions.all.size === 13)
  }

  test("q27 shared-text SQL entry runs and is deterministically ordered") {
    val out = Registry.queries("q27_sql_entry")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.length === 10)
    val revs = out.map(_.getDouble(1))
    assert(revs.sorted.reverse.toSeq === revs.toSeq)
  }
}
