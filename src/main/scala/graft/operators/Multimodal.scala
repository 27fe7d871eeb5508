package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): `decodeImageStub` derives deterministic fake
  * width/height/format from the payload bytes. Everything around it —
  * the binary schema, the mapPartitions batch shape (one reusable
  * "decoder" per partition, mirroring how a real codec or Pandas-UDF
  * batch would amortize model/codec init), partition sizing, and the
  * metadata struct — is real and tested.
  */
object Multimodal {

  val imageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType))))))

  /** Wrap a text corpus as binary payloads (the testdata has no real
    * media, so documents stand in as opaque bytes). */
  def asBinaryPayloads(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** STUB decoder: deterministic fake dimensions from the payload.
    * A real implementation would decode the image header here; the
    * surrounding plumbing (per-partition init, struct output) is the
    * part that matters for the pipeline. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, String) = {
    if (payload.isEmpty) (0, 0, "empty")
    else {
      val w = 16 + (payload(0) & 0x3f)
      val h = 16 + (payload(payload.length - 1) & 0x3f)
      val fmt = if (payload.length % 2 == 0) "png" else "jpeg"
      (w, h, fmt)
    }
  }

  /** Decode stage as mapPartitions: one decoder instance per partition,
    * rows streamed through it (the Scala analog of mapInPandas batches). */
  def decodeImages(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    implicit val enc = RowEncoder.encoderFor(imageSchema)
    payloads.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      // per-partition "codec init" would happen here
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, fmt) = decodeStub(bytes)
        Row(id, bytes, Row(bytes.length.toLong, w, h, fmt))
      }
    }
  }

  /** Content-addressable chunking for large blobs: split each payload
    * into fixed-size chunks and key each by its md5 — the
    * dedup-friendly storage layout for multimodal corpora (identical
    * chunks across documents share storage; transfer diffs reduce to
    * hash-set differences). Pure generator + projection, no shuffle. */
  def chunkPayloads(payloads: DataFrame, chunkSize: Int): DataFrame =
    payloads
      .select(col("doc_id"), col("payload"),
        expr(s"sequence(0, greatest(0, ceil(length(payload) / $chunkSize) - 1))")
          .as("idx"))
      .select(col("doc_id"), explode(col("idx")).as("chunk_no"),
        expr(s"substring(payload, cast(chunk_no * $chunkSize + 1 as int), $chunkSize)")
          .as("chunk"))
      .select(col("doc_id"), col("chunk_no").cast("int").as("chunk_no"),
        length(col("chunk")).as("chunk_len"),
        md5(col("chunk")).as("chunk_hash"))

  /** Frame sampling for "video" payloads: split the byte stream into
    * fixed-size frames and keep every `stride`-th one. Pure column ops
    * (codegen), no UDF. */
  def sampleFrames(payloads: DataFrame, frameSize: Int, stride: Int): DataFrame =
    payloads
      .select(col("doc_id"), col("payload"),
        explode(expr(
          s"sequence(0, greatest(0, ceil(length(payload) / $frameSize) - 1))"))
          .as("frame_no"))
      .filter(col("frame_no") % stride === 0)
      .select(col("doc_id"), col("frame_no"),
        expr(s"substring(payload, cast(frame_no * $frameSize + 1 as int), $frameSize)")
          .as("frame"))

  /** STUB resize: keep every `factor`-th payload byte and scale the fake
    * dimensions down accordingly (a real implementation decodes, scales,
    * re-encodes here). Same mapPartitions batch shape as the decoder. */
  def resizeImages(decoded: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, "factor must be positive")
    implicit val enc = RowEncoder.encoderFor(imageSchema)
    decoded.select(col("doc_id"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val meta = r.getStruct(2)
          val out =
            if (bytes.isEmpty) bytes
            else Array.tabulate((bytes.length + factor - 1) / factor)(i =>
              bytes(i * factor))
          Row(id, out, Row(out.length.toLong,
            math.max(1, meta.getInt(1) / factor),
            math.max(1, meta.getInt(2) / factor),
            meta.getString(3)))
        }
      }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(DoubleType))))

  /** STUB feature extraction: a normalized `bins`-bin byte histogram per
    * payload — the (doc_id, float-vector) shape a real embedding or
    * feature model emits, so the output composes directly with the
    * Similarity operators. One "model" per partition, rows streamed
    * through (the mapInPandas batch shape). */
  def extractFeatures(payloads: DataFrame, bins: Int = 8): DataFrame = {
    require(bins > 0, "bins must be positive")
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    payloads.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      // per-partition "model init" would happen here
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Double](bins)
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xff) * bins / 256) += 1.0
          i += 1
        }
        val n = math.max(1, bytes.length).toDouble
        Row(id, hist.map(_ / n).toSeq)
      }
    }
  }

  /** Oracle-friendly metadata extraction over the binary column:
    * byte length, sha256, and a hex "magic number" prefix. */
  def binaryMeta(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("byte_len"),
      sha2(col("text").cast("binary"), 256).as("sha"),
      lower(hex(substring(col("text"), 1, 4).cast("binary"))).as("magic"))
}
