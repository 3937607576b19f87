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

  test("numeric zero ticker is Python-falsy; string \"0\" is truthy (:59)") {
    // A numeric CP column holding 0/0.0 is falsy under Python `or`,
    // exactly like None/NaN — the chain must fall through.
    val num = StructType(Seq(
      StructField("CP", DoubleType), StructField("ticker", StringType),
      StructField("v", IntegerType)))
    val out = packedRows(df(num,
      Row(0.0, "TKA", 1),              // 0.0 falsy -> ticker
      Row(java.lang.Double.valueOf(7.0), "TKB", 2), // nonzero truthy
      Row(0.0, null, 3)))              // 0.0 falsy, null -> default
    assert(out.map(_._1) === Seq("TKA", "7.0", Transform.DefaultTicker))

    val intS = StructType(Seq(
      StructField("CP", IntegerType), StructField("v", IntegerType)))
    assert(packedRows(df(intS, Row(0, 1))).map(_._1)
      === Seq(Transform.DefaultTicker))

    // But the STRING "0" is truthy in Python — must be kept.
    val str = StructType(Seq(
      StructField("CP", StringType), StructField("ticker", StringType),
      StructField("v", IntegerType)))
    assert(packedRows(df(str, Row("0", "TKC", 1))).map(_._1) === Seq("0"))
  }

  test("property: numeric ticker chain matches a Python-or reference model") {
    // Reference model of `row.get('CP') or row.get('ticker') or 'FPT'`
    // for numeric CP and string ticker cells.
    def pyOr(cp: Option[Double], tk: Option[String]): String = {
      val c = cp.filter(v => !v.isNaN && v != 0.0).map(_.toString)
      val t = tk.filter(_.nonEmpty)
      c.orElse(t).getOrElse(Transform.DefaultTicker)
    }
    val cps = Seq(None, Some(0.0), Some(Double.NaN), Some(-1.5), Some(3.0))
    val tks = Seq(None, Some(""), Some("TK"))
    val cases = for (c <- cps; t <- tks) yield (c, t)
    val s = StructType(Seq(
      StructField("CP", DoubleType), StructField("ticker", StringType),
      StructField("v", IntegerType)))
    val rows = cases.zipWithIndex.map { case ((c, t), i) =>
      Row(c.map(java.lang.Double.valueOf).orNull, t.orNull, i)
    }
    val out = packedRows(df(s, rows: _*))
    assert(out.map(_._1) === cases.map { case (c, t) => pyOr(c, t) })
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
