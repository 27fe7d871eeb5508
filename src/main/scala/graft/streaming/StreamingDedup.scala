package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming MinHash-LSH near-duplicate detection — the ONLINE analog of
  * [[graft.operators.Dedup.lshIncrementalPairs]]: documents arrive in
  * micro-batches and every arrival is checked against everything seen so
  * far, without re-scanning the corpus. The trick making LSH
  * streaming-safe is that a document's whole signature chain is a
  * NARROW projection (no aggregation): the codegen'd per-row signature
  * expressions ([[graft.functions.MinHashSigsV2]] by default) replace
  * the batch shingle-explode aggregate, so
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

  /** (doc_id, bucket) rows via per-row signatures (a streaming frame
    * cannot run the batch path's intermediate groupBy before the
    * stateful operator) banded by the SAME bucket generator as the
    * batch chain, so bucket ids are byte-identical across the two
    * (pinned by the parity tests). Documents shorter than 3 words have
    * no shingles and drop, exactly like the batch `shingles()` filter.
    *
    * `family` picks the signature expression: `"v2"` (default — ONE
    * md5 per shingle, [[graft.operators.Dedup.minhashSignaturesV2]],
    * the recommended production family: per-row digest cost is the
    * streaming hot path) or `"v1"` (the `md5('k:'||shingle)` contract,
    * [[graft.operators.Dedup.minhashSignaturesFused]]) for parity with
    * v1-keyed batch state. */
  def bandedBuckets(docs: DataFrame, numHashes: Int = 6, bands: Int = 3,
      rowsPerBand: Int = 2, family: String = "v2"): DataFrame = {
    require(bands * rowsPerBand <= numHashes,
      s"bands x rowsPerBand must fit in $numHashes hashes")
    require(family == "v1" || family == "v2",
      s"family must be v1 or v2, got $family")
    val sigs =
      if (family == "v2")
        graft.operators.Dedup.minhashSignaturesV2(docs, numHashes)
      else graft.operators.Dedup.minhashSignaturesFused(docs, numHashes)
    val sep = if (family == "v2") "|" else ""
    sigs.select(col("doc_id"),
      graft.operators.Dedup.bandBuckets(bands, rowsPerBand, sep).as("bucket"))
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
      val prior = scala.collection.mutable.ArrayBuffer.empty[Long]
      val priorSet = scala.collection.mutable.HashSet.empty[Long]
      val it = members.get()
      while (it.hasNext) { val v = it.next(); prior += v; priorSet += v }
      // Deterministic in-batch order (redeliveries/dups collapse too).
      val fresh = rows.map(_._2).toArray.distinct.sorted
        .filterNot(priorSet.contains)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val seen = prior
      for (n <- fresh) {
        for (p <- seen)
          out += (if (p < n) (p, n) else (n, p))
        seen += n
      }
      // ListStateImpl rejects empty appends (EMPTY_LIST_VALUE) — an
      // all-redelivered batch legitimately produces zero fresh ids.
      if (fresh.nonEmpty) members.appendList(fresh)
      out.iterator
    }
  }

  /** The full online chain: `docs` is a STREAMING frame of
    * (doc_id, text); output is the append stream of candidate pairs.
    * Callers must run with the RocksDB state store provider (the
    * Spark 4 arbitrary-state API requires it).
    *
    * State-family isolation: the state key is `"<family>:<bucket>"`, not
    * the bare bucket. The two families generate bucket strings from
    * DIFFERENT digest chains, so without the tag a v2 run restarted on a
    * v1-keyed checkpoint would silently read the wrong history —
    * documents the v1 run had seen would never pair with new arrivals
    * (their ids live under untagged v1 keys that v2's buckets never
    * touch), with no error anywhere. With the tag the keyspaces are
    * disjoint BY CONSTRUCTION: a family switch over an old checkpoint
    * behaves exactly like a cold start for the new family (old-family
    * state is inert, never garbage-read), which is the documented
    * contract — switching family requires re-seeding the corpus through
    * the new family (SCALING.md "Streaming dedup state families").
    * StreamingSpec pins this: v1-state + v2-run emits precisely the
    * v2-cold-start pair set. */
  def candidatePairs(docs: DataFrame, numHashes: Int = 6, bands: Int = 3,
      rowsPerBand: Int = 2, family: String = "v2"): Dataset[(Long, Long)] = {
    import docs.sparkSession.implicits._
    bandedBuckets(docs, numHashes, bands, rowsPerBand, family)
      .select(concat_ws(":", lit(family), col("bucket")).as("bucket"),
        col("doc_id").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new BucketHistoryProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** Online EMBEDDING near-dup candidates — the same bucket-history
    * machinery applied to the vector modality: each arriving vector
    * (vec_id, v: array<double>) is bucketed by its sign-LSH key
    * ([[graft.operators.Similarity.signBucket]], a narrow per-row
    * projection — streaming-safe exactly like the text signature
    * chain) and pairs with every earlier same-bucket member held in
    * RocksDB ListState. State family `"emb<bits>"` keeps this keyspace
    * disjoint from the text families (and from itself at a different
    * `bits` — re-bucketing is a cold start, same rule as a text family
    * switch). Output pairs are CANDIDATES, identical in aggregate to
    * the batch sign-bucket expansion over the union of batches
    * (StreamingSpec pins the parity); score exact cosine downstream on
    * the candidate set — the vectors themselves never enter state, so
    * state stays 8 bytes per (vector, bucket) at any dimensionality. */
  def embedCandidatePairs(vecs: DataFrame, bits: Int = 8)
      : Dataset[(Long, Long)] = {
    import vecs.sparkSession.implicits._
    vecs
      .select(concat_ws(":", lit(s"emb$bits"),
          graft.operators.Similarity.signBucket(col("v"), bits))
        .as("bucket"),
        col("vec_id").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new BucketHistoryProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }
}
