package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming MinHash-LSH near-duplicate detection — the ONLINE analog of
  * [[graft.operators.Dedup.lshIncrementalPairs]]: documents arrive in
  * micro-batches and every arrival is checked against everything seen so
  * far, without re-scanning the corpus. The trick making LSH
  * streaming-safe is that a document's whole signature chain is a
  * NARROW projection (no aggregation): the batch `min()` over exploded
  * shingles becomes `array_min` over a transformed shingle array, so
  * the only stateful operator is the per-bucket history — which lives
  * in the RocksDB state store, keyed by band bucket, exactly the small
  * derived key the batch LSH shuffles on. State per bucket is the doc-id
  * list of its members (8 bytes/doc, the same bound as the batch
  * in-bucket expansion), so state scales with corpus size spread over
  * the bucket keyspace, and RocksDB spills it off-heap.
  *
  * Emitted pairs are (id_a < id_b) candidate pairs, identical in
  * aggregate to the batch [[graft.operators.Dedup.lshCandidatePairs]]
  * over the union of all batches (StreamingSpec pins that parity); a
  * pair sharing several buckets emits once per bucket — dedup
  * downstream if exact-once pairs matter, like the batch operator's
  * `.distinct()`.
  */
object StreamingDedup {

  /** (doc_id, bucket) rows via per-row signatures: word 3-shingles →
    * `numHashes` md5("k:" + shingle) minima → `bands` buckets of
    * `rowsPerBand` concatenated hashes — the same hash family, shingle
    * shape, and bucket ids as the batch chain (Dedup.shingles /
    * minhashSignatures / bandBuckets), verified by the parity test.
    * Documents shorter than 3 words have no shingles and drop, exactly
    * like the batch `shingles()` filter. */
  def bandedBuckets(docs: DataFrame, numHashes: Int = 6, bands: Int = 3,
      rowsPerBand: Int = 2): DataFrame = {
    require(bands * rowsPerBand <= numHashes,
      s"bands x rowsPerBand must fit in $numHashes hashes")
    val sigs = (1 to numHashes).foldLeft(
      docs
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 3)
        .withColumn("sh", expr(
          """transform(sequence(1, size(w) - 2), i ->
            |  concat_ws(' ', element_at(w, i), element_at(w, i + 1),
            |            element_at(w, i + 2)))""".stripMargin))
    ) { (df, k) =>
      df.withColumn(s"h$k", expr(
        s"array_min(transform(sh, s -> md5(cast(concat('$k:', s) as binary))))"))
    }
    sigs.select(col("doc_id"), explode(array((1 to bands).map { b =>
      val rows = ((b - 1) * rowsPerBand + 1 to b * rowsPerBand)
        .map(k => col(s"h$k"))
      concat(lit(s"b$b:") +: rows: _*)
    }: _*)).as("bucket"))
  }

  /** Per-bucket membership history: every new document pairs with all
    * earlier members of its bucket (and with same-batch members that
    * sorted before it), then joins the list. ListState keeps the ids in
    * RocksDB — appends are O(1), no read-modify-write of the whole
    * list on the hot path beyond the pairing scan itself. */
  class BucketHistoryProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long), (Long, Long)] {
    import org.apache.spark.sql.streaming.{ListState, TTLConfig}
    import org.apache.spark.sql.{Encoders, streaming => ss}
    @transient private var members: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: ss.TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timerValues: ss.TimerValues): Iterator[(Long, Long)] = {
      val prior = {
        val it = members.get(); val b = Seq.newBuilder[Long]
        while (it.hasNext) b += it.next()
        b.result()
      }
      // Deterministic in-batch order (redeliveries/dups collapse too).
      val fresh = rows.map(_._2).toArray.distinct.sorted
        .filterNot(prior.contains)
      val out = Seq.newBuilder[(Long, Long)]
      var seen = prior
      for (n <- fresh) {
        for (p <- seen)
          out += (if (p < n) (p, n) else (n, p))
        seen = seen :+ n
      }
      members.appendList(fresh)
      out.result().iterator
    }
  }

  /** The full online chain: `docs` is a STREAMING frame of
    * (doc_id, text); output is the append stream of candidate pairs.
    * Callers must run with the RocksDB state store provider (the
    * Spark 4 arbitrary-state API requires it). */
  def candidatePairs(docs: DataFrame, numHashes: Int = 6, bands: Int = 3,
      rowsPerBand: Int = 2): Dataset[(Long, Long)] = {
    import docs.sparkSession.implicits._
    bandedBuckets(docs, numHashes, bands, rowsPerBand)
      .select(col("bucket"), col("doc_id").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new BucketHistoryProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }
}
