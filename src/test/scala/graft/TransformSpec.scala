package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.engine.{Schema, Transform}

/** Golden tests for the signature wide→JSONB pack — semantics of
  * reference `etl_supabase.py:35-68` (SURVEY §5.2.1).
  */
class TransformSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  private def packedRows(d: org.apache.spark.sql.DataFrame) =
    Transform.packJsonb(d).collect().map { r =>
      (r.getString(0),
       if (r.isNullAt(1)) None else Some(r.getInt(1)),
       r.getMap[String, String](2).toMap)
    }

  test("basic pack: reserved columns excluded, payload stringified") {
    val s = StructType(Seq(
      StructField("ticker", StringType),
      StructField("year", IntegerType),
      StructField("revenue", DoubleType),
      StructField("note", StringType)))
    val out = packedRows(df(s, Row("AAA", 2020, 12.5, "x")))
    assert(out === Seq(("AAA", Some(2020), Map("revenue" -> "12.5", "note" -> "x"))))
  }

  test("year column matched case-insensitively, incl Vietnamese 'Năm'") {
    val s = StructType(Seq(
      StructField("Năm", IntegerType), StructField("v", IntegerType)))
    val out = packedRows(df(s, Row(2019, 7)))
    assert(out === Seq((Transform.DefaultTicker, Some(2019), Map("v" -> "7"))))

    val s2 = StructType(Seq(
      StructField("YEAR", LongType), StructField("v", IntegerType)))
    val out2 = packedRows(df(s2, Row(2018L, 1)))
    assert(out2.head._2 === Some(2018))
  }

  test("NaN year and NaN payload values become null (reference :50,:57)") {
    val s = StructType(Seq(
      StructField("year", DoubleType), StructField("m", DoubleType)))
    val out = packedRows(df(s, Row(Double.NaN, Double.NaN), Row(2021.0, 1.5)))
    assert(out(0)._2 === None)
    assert(out(0)._3 === Map("m" -> null))
    assert(out(1) === ((Transform.DefaultTicker, Some(2021), Map("m" -> "1.5"))))
  }

  test("ticker coalesce is Python-falsy: CP wins, empty string skipped (:59)") {
    val s = StructType(Seq(
      StructField("CP", StringType), StructField("ticker", StringType),
      StructField("v", IntegerType)))
    val out = packedRows(df(s,
      Row("CPX", "TKX", 1),   // CP wins
      Row("", "TKY", 2),      // empty CP is falsy -> ticker
      Row(null, "", 3),       // both falsy -> default
      Row(null, null, 4)))    // both null -> default
    assert(out.map(_._1) === Seq("CPX", "TKY",
      Transform.DefaultTicker, Transform.DefaultTicker))
    // CP/ticker are reserved: payload holds only v
    assert(out.forall(_._3.keySet === Set("v")))
  }

  test("missing year column -> null year; no ticker cols -> default") {
    val s = StructType(Seq(StructField("a", IntegerType)))
    val out = packedRows(df(s, Row(5)))
    assert(out === Seq((Transform.DefaultTicker, None, Map("a" -> "5"))))
  }

  test("empty DataFrame packs to empty") {
    val s = StructType(Seq(StructField("year", IntegerType),
      StructField("a", IntegerType)))
    assert(packedRows(df(s)) === Seq.empty)
  }

  test("all-reserved-columns DataFrame packs to empty map") {
    val s = StructType(Seq(StructField("year", IntegerType),
      StructField("ticker", StringType)))
    val out = packedRows(df(s, Row(2020, "T")))
    assert(out === Seq(("T", Some(2020), Map.empty[String, String])))
  }

  test("pack preserves row count and every non-reserved cell") {
    val s = StructType(Seq(
      StructField("year", IntegerType), StructField("k1", StringType),
      StructField("k2", IntegerType)))
    val rows = (1 to 50).map(i => Row(2000 + i % 5, s"v$i", i))
    val out = packedRows(df(s, rows: _*))
    assert(out.length === 50)
    assert(out.zip(rows).forall { case ((_, y, m), r) =>
      y.contains(r.getInt(0)) && m === Map("k1" -> r.getString(1),
        "k2" -> r.getInt(2).toString)
    })
  }

  test("packJson emits JSON text data column") {
    val s = StructType(Seq(
      StructField("year", IntegerType), StructField("a", StringType)))
    val out = Transform.packJson(df(s, Row(2020, "x"))).collect()
    assert(out.head.getString(2) === """{"a":"x"}""")
  }

  test("schema resolution follows first-match in schema order") {
    val s = StructType(Seq(
      StructField("Year", IntegerType), StructField("năm", IntegerType),
      StructField("v", IntegerType)))
    val d = df(s, Row(1, 2, 3))
    assert(Schema.yearColumn(d) === Some("Year"))
    assert(Schema.payloadColumns(d) === Seq("v"))
  }

  test("packJsonbTyped: typed sink record round-trips the pack") {
    val schema = StructType(Seq(
      StructField("ticker", StringType), StructField("year", IntegerType),
      StructField("v", DoubleType)))
    import scala.jdk.CollectionConverters._
    val d = spark.createDataFrame(
      Seq(Row("ABC", 2021, 1.5), Row(null, null, null)).asJava, schema)
    val recs = Transform.packJsonbTyped(d).collect().sortBy(_.ticker)
    assert(recs.length === 2)
    assert(recs(0) === Transform.JsonbRecord("ABC", Some(2021), Map("v" -> "1.5")))
    assert(recs(1).ticker === "FPT") // default ticker (reference :59)
    assert(recs(1).year === None)
    assert(recs(1).data === Map("v" -> null))
  }
}
