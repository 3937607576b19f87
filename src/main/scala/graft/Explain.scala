package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-capture tool for the optimization rounds: writes each named
  * query's `.explain("formatted")` text to `<outDir>/<name>.txt`
  * against the given sf dir, under the same session config as Bench.
  * Usage: Explain <sfDir> <outDir> [query ...] (default: all).
  *
  * NOTE: this prints the INITIAL plan (`AdaptiveSparkPlan
  * isFinalPlan=false` where AQE applies) without executing the query
  * — join-strategy or partition-count changes AQE makes at runtime
  * are not visible here; Exchange counts, pushed filters, read
  * schemas and static join picks are.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.unionOutputPartitioning", "false")
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
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
        } catch {
          case e: Throwable =>
            System.err.println(s"[explain] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
