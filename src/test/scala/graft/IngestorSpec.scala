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

  test("corrupt gzip and shapeless envelopes dead-letter per record, not per batch") {
    val corrupt = java.util.Base64.getEncoder.encodeToString(
      Array[Byte](1, 2, 3, 4, 5)) // not gzip
    val notJson = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write("this is not an envelope".getBytes("UTF-8")); gz.close()
      java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    }
    val df = Seq(
      envelope("DATA_MESSAGE", Seq("good line")),
      corrupt, notJson).toDF("data")
    // The good record still flows — one bad payload must not abort the batch.
    val ok = Ingestor.decodeEnvelopes(df, "data").as[String].collect()
    assert(ok.toSeq === Seq("good line\n"))
    // Both failures land in the dead-letter route with their original payload.
    val dead = Ingestor.deadLetterEnvelopes(df, "data")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(dead.length === 2)
    assert(dead.map(_._1).toSet === Set(corrupt, notJson))
    assert(dead.find(_._1 == corrupt).get._2 === "CORRUPT_GZIP")
    assert(dead.find(_._1 == notJson).get._2 === "BAD_ENVELOPE")
  }

  test("null messageType is not silently dropped as a control message") {
    val json = """{"owner":"o","logGroup":"g","logStream":"s","logEvents":[{"id":"0","timestamp":1,"message":"kept"}]}"""
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(json.getBytes("UTF-8")); gz.close()
    val noType = java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    val out = Ingestor.decodeEnvelopes(Seq(noType).toDF("data"), "data")
      .as[String].collect()
    assert(out.toSeq === Seq("kept\n"))
  }

  test("control message without logEvents is dropped, not dead-lettered") {
    val json = """{"messageType":"CONTROL_MESSAGE","owner":"o","logGroup":"g","logStream":"s"}"""
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(json.getBytes("UTF-8")); gz.close()
    val ctrl = java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    val df = Seq(ctrl).toDF("data")
    assert(Ingestor.decodeEnvelopes(df, "data").count() === 0)
    assert(Ingestor.deadLetterEnvelopes(df, "data").count() === 0)
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
