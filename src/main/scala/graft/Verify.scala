package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: exactly (sfDir, outDir). Extra args are a
    // local-iteration filter: only the named queries are dumped.
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Disabled: Spark 4.1's union output-partitioning propagation
      // executes co-partitioned unions as a partition zip, which AQE
      // can break at runtime by re-planning one child's partition
      // count ("Can't zip RDDs with unequal numbers of partitions",
      // hit by q157's component-table union); the claim also elides
      // any explicit repartition above the union, so it cannot be
      // worked around plan-side.
      .config("spark.sql.unionOutputPartitioning", "false")
      // match Bench: hash-mode ObjectHashAggregate up to the
      // battery's model-bounded group counts (see Bench.scala)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4096")
      // tiny-task shuffles: the bypass writer opens one file PER
      // REDUCE PARTITION per map task (32x32 file creations per
      // exchange here — measured as most of the fixed per-task cost
      // on sub-MB shuffles); below the threshold Spark uses the sort
      // writer, one data+index file per map task regardless of R. At
      // production R (thousands) bypass never engages anyway.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache() // release per-query persisted intermediates
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
