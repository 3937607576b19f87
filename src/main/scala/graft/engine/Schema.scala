package graft.engine

import java.util.Locale

import org.apache.spark.sql.DataFrame

/** Plan-time (driver-side) schema resolution for the wide→JSONB pack.
  *
  * The reference discovers its year column at runtime by
  * case-insensitive name match over `["năm", "year"]`
  * (reference `etl_supabase.py:42-47`) and excludes the reserved
  * columns `["năm", "year", "cp", "ticker"]` from the packed payload
  * (`etl_supabase.py:55`). These are metadata operations over
  * `df.schema`, not row operations — they cost nothing at any scale.
  *
  * Unicode note (SURVEY §7.4.3): lowercase with `Locale.ROOT` so the
  * match is locale-stable; `Năm` must match `năm` regardless of the
  * JVM default locale (e.g. Turkish dotless-i).
  */
object Schema {

  /** Column names treated as the year column (reference `:43`). */
  val YearNames: Set[String] = Set("năm", "year")

  /** Column names treated as the ticker column (reference `:59`). */
  val TickerNames: Set[String] = Set("cp", "ticker")

  /** Columns never packed into the payload (reference `:55`). */
  val Reserved: Set[String] = YearNames ++ TickerNames

  def normalize(name: String): String = name.toLowerCase(Locale.ROOT)

  /** First column whose lowercased name is in `candidates`, in schema
    * order — mirrors the reference's first-match loop (`:44-47`).
    */
  def resolve(df: DataFrame, candidates: Set[String]): Option[String] =
    df.columns.find(c => candidates.contains(normalize(c)))

  def yearColumn(df: DataFrame): Option[String] = resolve(df, YearNames)

  def tickerColumns(df: DataFrame): Seq[String] =
    df.columns.filter(c => TickerNames.contains(normalize(c))).toSeq

  /** Payload columns: everything not reserved, in schema order
    * (`:54-55` iterates the row's own key order, i.e. column order).
    */
  def payloadColumns(df: DataFrame): Seq[String] =
    df.columns.filterNot(c => Reserved.contains(normalize(c))).toSeq
}
