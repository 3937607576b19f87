package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed layout for shuffle-free co-located joins. Writing both
  * sides of a recurring join bucketed (and sorted) on the join key
  * with the same bucket count lets Spark plan a sort-merge join with
  * NO exchange on either side — the shuffle is paid once at write
  * time and amortized over every subsequent join/aggregate on that
  * key. This is the 100 TB answer for fact⋈fact joins that are too
  * big to broadcast and too frequent to re-shuffle per query
  * (broadcast handles the small-dim case; AQE cannot remove a
  * shuffle that co-location avoids entirely).
  */
object Bucketed {

  /** Persist `df` as a bucketed, sorted managed parquet table.
    * Bucket count must match across tables meant to co-join.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Persist `df` hive-partitioned on low-cardinality columns: a
    * reader filtering on them scans only the matching directories
    * (partition pruning — the scan's PartitionFilters, no data files
    * touched outside the selected partitions). Partition columns must
    * be low-cardinality (lang, date, segment); high-cardinality keys
    * belong in [[writeBucketed]] buckets instead — millions of tiny
    * directories kill the file listing at scale.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
