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

  /** OP-1/2/3/4/5: envelope column (base64 of gzipped JSON) → one row per
    * log event, with the reference's trailing-newline projection. */
  def decodeEnvelopes(df: DataFrame, dataCol: String): DataFrame =
    df.withColumn("env",
        from_json(graft.functions.functions.gunzip(unbase64(col(dataCol)))
          .cast("string"), envelopeSchema))
      .filter(col("env.messageType") =!= "CONTROL_MESSAGE")
      .select(explode(col("env.logEvents")).as("ev"))
      .select(concat(col("ev.message"), lit("\n")).as("Data"))

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
