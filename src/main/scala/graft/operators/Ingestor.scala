package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark re-expression of the reference's ingestor Lambda (OP-1..OP-6):
  * CloudWatch Logs subscription envelopes — base64(gzip(JSON)) — are
  * decoded, the control messages dropped, log events exploded and
  * projected to newline-terminated lines, then batched for the sink.
  *
  * Reference: decode ingestor/index.js:125, gunzip 100-110, JSON parse +
  * logEvents projection 128-129, control-message filter 73-76, newline
  * projection 78-81, 500-record chunking 84-87.
  */
object Ingestor {

  val envelopeSchema: StructType = StructType(Seq(
    StructField("messageType", StringType),
    StructField("owner", StringType),
    StructField("logGroup", StringType),
    StructField("logStream", StringType),
    StructField("logEvents", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("timestamp", LongType),
      StructField("message", StringType)))))))

  /** base64 → try_gunzip → JSON envelope, with an explicit per-record
    * `error` flag instead of a batch-aborting throw: a corrupt gzip
    * payload nulls out (try_gunzip), an unparseable/shapeless envelope
    * nulls `logEvents` — both are flagged, never silently dropped. */
  private def decoded(df: DataFrame, dataCol: String): DataFrame =
    df.withColumn("payload",
        graft.functions.functions.try_gunzip(unbase64(col(dataCol))))
      .withColumn("env", from_json(col("payload").cast("string"), envelopeSchema))
      // A control message is dropped, never dead-lettered — even when its
      // envelope carries no logEvents (the reference drops on messageType
      // alone, ingestor/index.js:73-76), so test the type before shape.
      .withColumn("is_control",
        coalesce(col("env.messageType"), lit("")) === "CONTROL_MESSAGE")
      .withColumn("error",
        !col("is_control") &&
          (col("payload").isNull || col("env").isNull ||
            col("env.logEvents").isNull))

  /** OP-1/2/3/4/5: envelope column (base64 of gzipped JSON) → one row per
    * log event, with the reference's trailing-newline projection.
    * Control-message filtering is null-safe (a failed parse has a null
    * messageType, which must not look like a control message); decode
    * failures route to [[deadLetterEnvelopes]] rather than throwing. */
  def decodeEnvelopes(df: DataFrame, dataCol: String): DataFrame =
    decoded(df, dataCol)
      .filter(!col("error") && !col("is_control"))
      .select(explode(col("env.logEvents")).as("ev"))
      .select(concat(col("ev.message"), lit("\n")).as("Data"))

  /** The dead-letter route: envelopes whose payload failed gzip/JSON/shape
    * decoding, carrying the ORIGINAL still-encoded payload for replay
    * (the decorator's ProcessingFailed semantics, decorator/index.js:215-219,
    * applied per record instead of the reference ingestor's batch abort). */
  def deadLetterEnvelopes(df: DataFrame, dataCol: String): DataFrame =
    decoded(df, dataCol)
      .filter(col("error"))
      .select(col(dataCol).as("data"),
        when(col("payload").isNull, "CORRUPT_GZIP").otherwise("BAD_ENVELOPE")
          .as("reason"))

  /** OP-6: group a partition's records into putRecordBatch-sized chunks
    * (500 in the reference). Returns (chunk sizes) per partition — the
    * sink adapter would call `putRecordBatch` per chunk; at scale this
    * runs on executors with no driver round-trip. */
  def batchedSink(df: DataFrame, batchSize: Int)(
      put: Seq[String] => Unit): Unit =
    df.foreachPartition { (rows: Iterator[Row]) =>
      rows.map(_.getString(0)).grouped(batchSize).foreach(put)
    }
}
