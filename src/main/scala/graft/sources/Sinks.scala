package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink-side layout helpers (the write half of OP-21, the Firehose →
  * Elasticsearch delivery at decorator/index.js:254-257, re-expressed as
  * columnar-lake writes).
  *
  * At 100 TB the dominant sink decision is LAYOUT: a flow-log table
  * partitioned by coarse query dimensions (action, date) lets every
  * downstream scan prune whole directories (`PartitionFilters` in the
  * plan), and `maxRecordsPerFile` bounds file sizes so a 1000-executor
  * write neither creates millions of tiny files nor few unsplittable
  * giants. Bucketing (graft.operators.Bucketing) is the complementary
  * layout for join keys.
  */
object Sinks {

  /** Write a hive-style partitioned parquet dataset. `partitionCols`
    * should be low-cardinality query dimensions — each distinct tuple
    * becomes a directory, so partitioning by a high-cardinality key
    * (e.g. interface_id) would shatter the table. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
