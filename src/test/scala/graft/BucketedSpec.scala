package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Bucketed

/** Bucketed co-location must eliminate the join shuffle: same keys,
  * same bucket count on both sides → sort-merge join with zero
  * ShuffleExchange nodes, identical results to the plain join.
  */
class BucketedSpec extends SparkSpec {

  test("bucketed fact-fact join plans no shuffle and matches plain join") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketed.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8)
    Bucketed.writeBucketed(lineitem, "b_lineitem", Seq("o_orderkey"), 8)
    try {
      // disable broadcast so the co-location (not AQE) is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), Seq("o_orderkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join should be shuffle-free, found ${shuffles.size} exchanges")
      val plain = orders.join(lineitem, Seq("o_orderkey"))
      assert(joined.count() === plain.count())
      val a = joined.agg(sum(col("l_quantity"))).first().getDouble(0)
      val b = plain.agg(sum(col("l_quantity"))).first().getDouble(0)
      assert(a === b)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("partspec").toString + "/docs"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Bucketed.writePartitioned(docs, dir, Seq("lang"))
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
      .select(col("doc_id"))
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"partition filter missing from scan:\n$scan")
    // pruned scan reads only the en directory's files
    val allLangs = docs.select(col("lang")).distinct().count()
    assert(allLangs > 1)
    assert(q.count() === docs.filter(col("lang") === "en").count())
    def filesScanned(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().head match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }
    val scannedFiles = filesScanned(q)
    val totalFiles = filesScanned(spark.read.parquet(dir))
    assert(scannedFiles < totalFiles,
      s"pruning read $scannedFiles of $totalFiles files")
  }

  test("bucketed groupBy on the bucket key avoids the aggregate shuffle") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Bucketed.writeBucketed(orders, "b_orders2", Seq("o_custkey"), 8)
    try {
      val agg = spark.table("b_orders2").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      val shuffles = agg.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucket-key aggregate should be shuffle-free, found ${shuffles.size}")
    } finally spark.sql("DROP TABLE IF EXISTS b_orders2")
  }
}
