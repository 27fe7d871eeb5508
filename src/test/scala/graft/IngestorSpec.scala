package graft

import graft.operators.Ingestor

/** Ingestor path (OP-1..OP-6): CloudWatch envelope decode, control-message
  * filtering, newline projection, batched sink chunking. */
class IngestorSpec extends SparkSpec {
  import spark.implicits._

  private def envelope(messageType: String, messages: Seq[String]): String = {
    val events = messages.zipWithIndex.map { case (m, i) =>
      s"""{"id":"$i","timestamp":${1510772160000L + i},"message":"$m"}"""
    }.mkString(",")
    val json =
      s"""{"messageType":"$messageType","owner":"123456789012","logGroup":"g","logStream":"s","logEvents":[$events]}"""
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(json.getBytes("UTF-8")); gz.close()
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  test("decodeEnvelopes: gunzip + JSON explode, control messages dropped") {
    val df = Seq(
      envelope("DATA_MESSAGE", Seq("line one", "line two")),
      envelope("CONTROL_MESSAGE", Seq("ignore me")),
      envelope("DATA_MESSAGE", Seq("line three"))).toDF("data")
    val out = Ingestor.decodeEnvelopes(df, "data").as[String].collect().sorted
    assert(out.toSeq === Seq("line one\n", "line three\n", "line two\n"))
  }

  test("batchedSink chunks partitions at the Firehose put limit") {
    val acc = spark.sparkContext.collectionAccumulator[Int]("chunks")
    val df = (1 to 1205).map(i => s"rec$i\n").toDF("Data").repartition(2)
    Ingestor.batchedSink(df, 500)(chunk => acc.add(chunk.size))
    val sizes = acc.value
    assert(sizes.size() >= 3) // at least ceil(1205/500) chunks
    sizes.forEach(s => assert(s <= 500))
    var total = 0
    sizes.forEach(s => total += s)
    assert(total === 1205)
  }
}
