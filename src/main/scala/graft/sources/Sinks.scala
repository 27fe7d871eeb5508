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

  /** Exactly-once `foreachBatch` sink: each micro-batch lands in its
    * own `batch_id=` partition, written with DYNAMIC partition
    * overwrite — a retried batch (at-least-once delivery after a
    * failure) REPLACES its partition instead of appending duplicates,
    * and never touches other batches' partitions. This is the
    * idempotence contract Structured Streaming requires of a sink for
    * end-to-end exactly-once; the reference's Firehose retry semantics
    * (whole-batch redelivery, ingestor/index.js:45-60) get the same
    * treatment. Use as `.writeStream.foreachBatch(idempotentBatchWriter(path))`.
    */
  def idempotentBatchWriter(path: String)(
      batch: DataFrame, batchId: Long): Unit = {
    batch.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    batch
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write.mode("overwrite")
      .partitionBy("batch_id")
      .parquet(path)
  }
}
