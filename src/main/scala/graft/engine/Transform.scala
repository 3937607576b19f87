package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's signature operator: wide per-year rows →
  * `(ticker, year, data)` JSONB-style records.
  *
  * Capability parity with the reference's `df_to_jsonb_records`
  * (reference `etl_supabase.py:35-68`), re-expressed as ONE
  * vectorized Catalyst projection instead of a row-at-a-time Python
  * loop (`:49` `iterrows`, `:54` inner column loop). No custom
  * `Expression` is needed: `map_from_arrays` + `coalesce` +
  * `cast` compose into a single whole-stage-codegen'd `Project`,
  * so the pack runs at scan speed on any number of executors and
  * never materializes on the driver (the reference's `:40` list
  * append is deliberately NOT ported — SURVEY §7.4.6).
  *
  * Semantics reproduced:
  *   - year column discovered case-insensitively over {năm, year}
  *     (`:42-47`); missing → null year (`:50`).
  *   - year cast to int, NaN → null (`:50`).
  *   - ticker = first *Python-truthy* of the CP column, the ticker
  *     column, then a literal default (`:59` `row.get('CP') or
  *     row.get('ticker', 'FPT')`). Python `or` skips empty strings
  *     and NaN, not just nulls — parity encoded in [[pyTruthyString]]
  *     (SURVEY §7.4.1).
  *   - every non-reserved column becomes a key of the `data` map,
  *     values stringified, NaN/null → null value (`:53-57`).
  */
object Transform {

  val DefaultTicker = "FPT"

  /** Python-truthiness for a ticker-candidate cell: the reference's
    * `or`-chain (`:59`) skips every Python-falsy value. What is falsy
    * depends on the cell's *runtime type* in pandas, so the check is
    * type-aware on the Spark column type:
    *   - numeric: null, NaN and **numeric zero** are falsy (`0 or x`
    *     → `x` in Python — SURVEY §7.4.1);
    *   - boolean: null and `False`;
    *   - string: only null and `""` — the *string* `"0"` (and even
    *     `"NaN"` text) is truthy in Python, but a CSV-ingested "NaN"
    *     arrives in pandas as float NaN, which our string-typed
    *     columns surface as the literal "NaN"; we treat that one
    *     token as missing to match the ingested-float reality.
    */
  private def pyTruthyString(df: DataFrame, name: String): Column = {
    val c = df.col(s"`$name`")
    val s = c.cast(StringType)
    val falsy = df.schema(name).dataType match {
      case _: NumericType =>
        c.isNull || isnan(c.cast(DoubleType)) || c.cast(DoubleType) === lit(0.0)
      case BooleanType => c.isNull || !c
      case _ => c.isNull || s === lit("") || s === lit("NaN")
    }
    when(falsy, lit(null).cast(StringType)).otherwise(s)
  }

  /** Stringify one payload cell with NaN→null normalization
    * (reference `:57` `pd.isna(val)` → JSON null). Floating NaN must
    * not survive as the string "NaN".
    */
  private def cellToString(df: DataFrame, name: String): Column = {
    val c = df.col(s"`$name`")
    df.schema(name).dataType match {
      case DoubleType | FloatType =>
        when(isnan(c), lit(null).cast(StringType)).otherwise(c.cast(StringType))
      case _ => c.cast(StringType)
    }
  }

  /** Wide → `(ticker: string, year: int?, data: map<string,string>)`.
    *
    * Output is one narrow projection; at 100 TB this is a pure
    * map-side transform with no shuffle.
    */
  def packJsonb(df: DataFrame, defaultTicker: String = DefaultTicker): DataFrame = {
    val yearCol = Schema.yearColumn(df)
    val payload = Schema.payloadColumns(df)

    // Python `or`-chain over the ticker candidates in reference
    // priority order (CP before ticker, reference `:59`), then the
    // literal default.
    val tickerCandidates = Schema.tickerColumns(df)
      .sortBy(c => if (Schema.normalize(c) == "cp") 0 else 1)
      .map(c => pyTruthyString(df, c))
    val ticker = coalesce(tickerCandidates :+ lit(defaultTicker): _*)

    val year: Column = yearCol match {
      case Some(yc) =>
        val c = df.col(s"`$yc`")
        df.schema(yc).dataType match {
          case DoubleType | FloatType =>
            when(isnan(c), lit(null)).otherwise(c).cast(IntegerType)
          case _ => c.cast(IntegerType)
        }
      case None => lit(null).cast(IntegerType)
    }

    val data: Column =
      if (payload.isEmpty) map().cast(MapType(StringType, StringType))
      else map_from_arrays(
        array(payload.map(lit(_)): _*),
        array(payload.map(cellToString(df, _)): _*))

    df.select(ticker.as("ticker"), year.as("year"), data.as("data"))
  }

  /** The fixed sink record (SURVEY §1.3): the ONE schema in the
    * system that is static, so the typed Dataset API applies.
    */
  final case class JsonbRecord(
      ticker: String, year: Option[Int], data: Map[String, String])

  /** Typed view of the pack — `Dataset[JsonbRecord]` for callers that
    * want compile-time field access on the sink side (the wide input
    * stays an untyped DataFrame because its schema is dynamic by
    * design, reference `:42-47`).
    */
  def packJsonbTyped(df: DataFrame,
                     defaultTicker: String = DefaultTicker): Dataset[JsonbRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    packJsonb(df, defaultTicker).as[JsonbRecord]
  }

  /** JSON-text variant of the pack: `data` as a JSON string with keys
    * in schema order (reference `:79` `json.dumps`). Useful when the
    * sink wants JSONB text rather than a map column.
    */
  def packJson(df: DataFrame, defaultTicker: String = DefaultTicker): DataFrame = {
    val packed = packJsonb(df, defaultTicker)
    packed.select(col("ticker"), col("year"), to_json(col("data")).as("data"))
  }

  /** Numeric view over a packed `data` map — SURVEY §7.4.2: the
    * string-typed map is JSON-faithful; analyses needing numbers cast
    * through this.
    */
  def dataNum(data: Column): Column =
    map_filter(
      transform_values(data, (_, v) => v.cast(DoubleType)),
      (_, v) => v.isNotNull)
}
