package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data
  * pipelines: exact (hash group-by), MinHash+LSH (shingle → signature →
  * banded buckets → candidate join), n-gram Jaccard verification, and
  * SimHash fingerprinting.
  *
  * Scale design: every stage is a shuffle on a *small* derived key
  * (text hash, band bucket, shingle) — never a cross join. The LSH
  * candidate join is an equi-join on bucket, so at 100 TB it hash-
  * partitions by bucket and only near-duplicate groups co-locate. Exact
  * Jaccard runs only on LSH survivors.
  */
object Dedup {

  /** Test-corpus augmentation: injects exact duplicates (doc_id+100000,
    * every 10th doc) and near-duplicates with three appended tokens
    * (doc_id+200000, every 10th from 5), so dedup queries have known
    * positives to find. Mirrored by the `corpus` CTE in the oracle SQL.
    */
  def augmentCorpus(documents: DataFrame): DataFrame = {
    // NB: measured at sf0.1, repartitioning this (small) corpus before
    // the shingle explode made the chain slower — task/shuffle overhead
    // outweighs parallelism below ~10^5 source rows. At real corpus
    // scale the source arrives as many splittable files.
    val base = documents.select(col("doc_id"), col("text"))
    base
      .unionByName(base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .unionByName(base.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" zq extra token")).as("text")))
  }

  /** Exact dedup: group on full text, keep the minimum doc_id. */
  def exactDuplicates(corpus: DataFrame): DataFrame =
    corpus.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"),
        md5(col("text").cast("binary")).as("text_hash"))

  /** Distinct word 3-shingles per document (1-based element_at to match
    * the oracle's 1-based list indexing). */
  def shingles(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(expr("sequence(1, size(w) - 2)")).as("i"), col("w"))
      .select(col("doc_id"),
        concat_ws(" ", element_at(col("w"), col("i")),
          element_at(col("w"), col("i") + 1),
          element_at(col("w"), col("i") + 2)).as("shingle"))
      .distinct()

  val NumHashes = 6

  /** MinHash signature: h_k = min over shingles of md5(k ':' shingle).
    * md5-hex min is a uniform order statistic — good enough for LSH and
    * exactly reproducible in any engine with md5.
    */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val aggs = (1 to NumHashes).map(k =>
      min(md5(concat(lit(s"$k:"), col("shingle")).cast("binary")))
        .as(s"h$k"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: 3 bands of 2 hashes; docs sharing any band bucket are
    * candidate pairs. */
  def lshCandidatePairs(sigs: DataFrame): DataFrame = {
    // NB: the 3-band union × 2-sided self-join re-evaluates the
    // signature chain per branch; persisting `sigs` was measured SLOWER
    // at sf0.1 (caching forces full-column materialization and defeats
    // pruning) — recompute wins at this scale.
    val buckets = sigs
      .select(col("doc_id"), concat(lit("b1:"), col("h1"), col("h2")).as("bucket"))
      .unionByName(sigs.select(col("doc_id"),
        concat(lit("b2:"), col("h3"), col("h4")).as("bucket")))
      .unionByName(sigs.select(col("doc_id"),
        concat(lit("b3:"), col("h5"), col("h6")).as("bucket")))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard over LSH candidate pairs only. */
  def jaccardPairs(sh: DataFrame, candidates: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = candidates
      .join(sh.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("id_b") === col("sb.doc_id") &&
          col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("za"), col("id_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("id_b") === col("zb.doc_id"))
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
          (col("za.n_sh") + col("zb.n_sh") - col("n_inter")).cast("double"))
          .as("jaccard"))
  }

  /** 16-bit SimHash over distinct words: bit i is the sign of the vote
    * sum where a word votes +1 if hex digit i of its md5 has the high
    * nibble bit set, else -1. */
  def simhash(corpus: DataFrame): DataFrame = {
    val wordHashes = corpus
      .select(col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
      .distinct()
      .select(col("doc_id"), md5(col("word").cast("binary")).as("h"))
    val voteAggs = (1 to 16).map(i =>
      sum(when(expr(s"instr('89abcdef', substring(h, $i, 1))") > 0, 1)
        .otherwise(-1)).as(s"s$i"))
    val votes = wordHashes.groupBy(col("doc_id"))
      .agg(voteAggs.head, voteAggs.tail: _*)
    votes.select(col("doc_id"),
      concat((1 to 16).map(i =>
        when(col(s"s$i") > 0, "1").otherwise("0")): _*).as("simhash"))
  }
}
