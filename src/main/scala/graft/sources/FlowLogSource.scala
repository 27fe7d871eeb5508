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

  /** Deterministic CloudWatch envelope synthesis from a tick counter:
    * tick → JSON envelope of `eventsPerEnvelope` flow-log events,
    * gzipped + base64'd exactly as the subscription wire format
    * (ingestor/index.js:117-121). Shared by [[rateEnvelopes]] and its
    * redelivery test — determinism is the point: a replayed tick range
    * re-produces byte-identical envelopes. Every 50th tick is a
    * CONTROL_MESSAGE (the subscription handshake the ingestor must
    * drop, ingestor/index.js:73-76). */
  def envelopesFromTicks(ticks: DataFrame, eventsPerEnvelope: Int = 5): DataFrame = {
    val tick = col("value")
    val ev = sequence(lit(0), lit(eventsPerEnvelope - 1))
    val events = transform(ev, i => struct(
      concat(tick, lit("-"), i).as("id"),
      (tick * 1000 + i).as("timestamp"),
      concat_ws(" ", lit("2"), lit("123456789012"),
        concat(lit("eni-"), pmod(tick * lit(eventsPerEnvelope) + i, lit(997))),
        concat(lit("10.0."), pmod(i, lit(256)), lit(".1")),
        concat(lit("172.31.16."), pmod(tick, lit(200)) + 1),
        lit("20641"), lit("443"), lit("6"), lit("10"), lit("840"),
        tick % 86400 + 1418530010, tick % 86400 + 1418530070,
        lit("ACCEPT"), lit("OK")).as("message")))
    val envelope = to_json(struct(
      when(pmod(tick, lit(50)) === 0, lit("CONTROL_MESSAGE"))
        .otherwise(lit("DATA_MESSAGE")).as("messageType"),
      lit("123456789012").as("owner"),
      lit("flow-log-group").as("logGroup"),
      concat(lit("stream-"), pmod(tick, lit(8))).as("logStream"),
      events.as("logEvents")))
    ticks.select(tick.as("tick"),
      base64(graft.functions.functions.gzip(envelope.cast("binary")))
        .as("data"))
  }

  /** Rate-limited, backpressured streaming ingest — the Kinesis-delivery
    * analog the sandbox can run (no Kinesis here; the wire format and
    * retry semantics are what matter). Spark's `rate` source is the
    * throttle: `rowsPerSecond` caps envelope delivery exactly like a
    * provisioned Firehose stream, offsets are checkpointed per
    * micro-batch, and a failed batch replays its tick range — which,
    * through [[envelopesFromTicks]]' determinism, redelivers identical
    * envelopes (at-least-once). Compose with
    * `Ingestor.decodeEnvelopes(...)` and an idempotent sink
    * (`Sinks.upsertAppendWriter` + `Sinks.latestById`) for end-to-end
    * effectively-once, proven by `StreamingSpec`'s redelivery test. */
  def rateEnvelopes(spark: SparkSession, rowsPerSecond: Int,
      eventsPerEnvelope: Int = 5): DataFrame =
    envelopesFromTicks(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond).load(),
      eventsPerEnvelope)
}
