package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{FlowLog, Ingestor}

/** File sources for raw flow-log data (the reference's only "formats"
  * are gzip JSON envelopes and base64 payloads — SURVEY.md §2.1; a real
  * deployment lands raw lines or envelopes on object storage).
  *
  * Text reads are line-splittable and parallelize per HDFS/S3 block;
  * gzip inputs are handled transparently by the source codec but are
  * NOT splittable — at 100 TB, prefer many ≤1 GB .gz objects (one task
  * each) or uncompressed/zstd parquet landing zones.
  */
object FlowLogSource {

  /** Raw v2 flow-log lines from text file(s), one record per line, with
    * a per-file/offset-stable id for dead-letter correlation. */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF("line")
      .withColumn("id", monotonically_increasing_id())
      .select(col("id"), col("line"))

  /** Lines → parsed/validated frame (OP-9/10/12). */
  def readParsed(spark: SparkSession, path: String): DataFrame =
    FlowLog.parseFlowLines(readLines(spark, path))

  /** CloudWatch subscription envelopes stored as JSON lines with a
    * base64(gzip(payload)) `awslogs.data` field (OP-1 wire format,
    * ingestor/index.js:117-121). */
  def readEnvelopes(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    Ingestor.decodeEnvelopes(raw.select(col("awslogs.data").as("data")), "data")
  }

  /** Schema-on-read alternative to the regex parser: the v2 flow-log
    * line is space-delimited, so the CSV reader with a space delimiter
    * and an explicit schema types the 14 fields at scan time.
    * PERMISSIVE mode + columnNameOfCorruptRecord keeps the dead-letter
    * contract: malformed lines land with typed fields null and the raw
    * payload preserved in `_corrupt`. Faster than regex for
    * known-clean data; the regex path remains authoritative for enum
    * validation (ACCEPT/REJECT etc. — CSV typing alone can't check
    * those).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("delimiter", " ")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema("version INT, account_id STRING, interface_id STRING, " +
        "srcaddr STRING, destaddr STRING, srcport INT, dstport INT, " +
        "protocol INT, packets BIGINT, bytes BIGINT, start BIGINT, " +
        "`end` BIGINT, action STRING, log_status STRING, _corrupt STRING")
      .csv(path)

  /** Streaming variant of readLines (same schema, readStream).
    * monotonically_increasing_id is unsupported under streaming, so the
    * id is a content hash — stable across replays (at-least-once
    * redelivery maps to the same id), with duplicate lines sharing one
    * id; the raw payload is carried through for dead-lettering anyway. */
  def streamLines(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path)
      .withColumnRenamed("value", "line")
      .withColumn("id", xxhash64(col("line")))
      .select(col("id"), col("line"))
}
