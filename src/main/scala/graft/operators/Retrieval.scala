package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid (lexical ⊕ vector) retrieval over the document corpus — the
  * serving-side composition a training-data pipeline needs for
  * retrieval-augmented curation: candidate docs are ranked once by
  * lexical term overlap (the inverted-index path) and once by embedding
  * cosine (the ANN path), then fused with Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher, SIGIR 2009: score(d) = Σ 1/(k₀+rank)).
  * RRF needs no score calibration between the two modalities — only the
  * RANKS flow into the fusion — which is what makes it the standard
  * first fusion baseline in hybrid search engines.
  *
  * Scale shape: both legs broadcast only the PROBE side (queries are
  * few; the corpus is the 100 TB side and never shuffles before its
  * per-leg aggregation). The lexical leg is a term-keyed join — the
  * distributed equivalent of an inverted-index posting intersection —
  * whose aggregation key (probe_id, doc_id) is bounded by overlap
  * fan-out, not corpus size. Each leg cuts to `depth` per probe through
  * a ranking window that Spark 4 executes with a pushed
  * WindowGroupLimit (bounded per-partition heaps, map-side partial
  * limit), so the fusion full-outer join sees at most
  * 2·depth·|probes| rows — driver-free and tiny at any corpus scale.
  *
  * Determinism contract (the oracle hash depends on it): lexical ranks
  * break ties by (n_shared desc, doc_id asc); vector ranks by
  * (cos_r desc, neighbor_id asc) on the 6-dp rounded cosine; fused
  * ranks by (rrf desc, doc_id asc) on the 6-dp rounded RRF score. All
  * three are total orders.
  */
object Retrieval {

  /** Distinct (doc_id, term) postings — whitespace tokenization, the
    * corpus-wide tokenizer contract shared with TextAnalysis. */
  private def postings(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()

  /** Lexical leg core: overlap counts of a (broadcast) probe-terms
    * frame against the corpus postings, ranked per probe. Self-matches
    * are excluded (mirroring [[Similarity.scoreAll]]'s probe ≠ neighbor
    * contract). */
  private def lexicalLeg(post: DataFrame, probeTerms: DataFrame,
      depth: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("n_shared").desc, col("doc_id").asc)
    broadcast(probeTerms).join(post, Seq("term"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("rank_lex", row_number().over(w))
      .filter(col("rank_lex") <= depth)
  }

  /** Lexical leg with probes selected out of the corpus by predicate. */
  def lexicalOverlapTopK(documents: DataFrame, probePred: Column,
      depth: Int): DataFrame = {
    val post = postings(documents)
    lexicalLeg(post,
      post.filter(probePred).select(col("doc_id").as("probe_id"),
        col("term")), depth)
  }

  /** Vector leg core: brute-force cosine ranks from
    * [[Similarity.scoreAll]] (broadcast probes, corpus streams), cut to
    * `depth` per probe. `probes` must carry (vec_id, v). */
  private def vectorLeg(vecs: DataFrame, probes: DataFrame,
      depth: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_r").desc, col("neighbor_id").asc)
    Similarity.scoreAll(vecs, probes)
      .withColumn("rank_vec", row_number().over(w))
      .filter(col("rank_vec") <= depth)
      .select(col("probe_id"), col("neighbor_id").as("doc_id"),
        col("rank_vec"))
  }

  /** Vector leg with probes selected out of the corpus by predicate. */
  def vectorTopK(vecs: DataFrame, probePred: Column, depth: Int): DataFrame =
    vectorLeg(vecs, vecs.filter(probePred), depth)

  /** The RRF fusion of two rank-list legs (shared by the batch and
    * serving entry points — byte-identical contract). */
  private def fuse(lex: DataFrame, vec: DataFrame, k: Int,
      k0: Int): DataFrame = {
    val fused = lex.join(vec, Seq("probe_id", "doc_id"), "full_outer")
      .select(col("probe_id"), col("doc_id"),
        col("rank_lex"), col("rank_vec"),
        round(
          coalesce(lit(1.0) / (lit(k0) + col("rank_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(k0) + col("rank_vec")), lit(0.0)),
          6).as("rrf"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Serving-mode hybrid retrieval: the probes arrive as their OWN
    * frames — (doc_id, text) for the lexical leg, (vec_id, v) for the
    * vector leg — instead of as corpus predicates. This is the shape a
    * `foreachBatch` online-serving loop calls per micro-batch; the
    * plan, tie-breaks, and rounding are byte-identical to
    * [[hybridRrf]], so offline and online results agree exactly
    * (StreamingSpec pins the parity). */
  def hybridRrfServe(documents: DataFrame, vecs: DataFrame,
      probeDocs: DataFrame, probeVecs: DataFrame, depth: Int = 20,
      k: Int = 10, k0: Int = 60): DataFrame = {
    val probeTerms = probeDocs
      .select(col("doc_id").as("probe_id"),
        explode(split(col("text"), " ")).as("term"))
      .distinct()
    val lex = lexicalLeg(postings(documents), probeTerms, depth)
      .select(col("probe_id"), col("doc_id"), col("rank_lex"))
    fuse(lex, vectorLeg(vecs, probeVecs, depth), k, k0)
  }

  /** The fused retrieval: RRF over the two legs' top-`depth` rank lists,
    * final top-`k` per probe. A doc missing from one leg contributes 0
    * from that leg (the standard RRF convention for truncated lists).
    * `k0` is RRF's smoothing constant — 60 in the original paper and
    * every mainstream implementation. */
  def hybridRrf(documents: DataFrame, vecs: DataFrame, lexProbePred: Column,
      vecProbePred: Column, depth: Int = 20, k: Int = 10,
      k0: Int = 60): DataFrame = {
    val lex = lexicalOverlapTopK(documents, lexProbePred, depth)
      .select(col("probe_id"), col("doc_id"), col("rank_lex"))
    fuse(lex, vectorTopK(vecs, vecProbePred, depth), k, k0)
  }

  /** Hybrid RRF served ENTIRELY from persisted layouts — the
    * composition a standing retrieval deployment actually runs: the
    * lexical leg's postings come from a
    * [[TextAnalysis.writeInvertedIndex]] dir, the vector leg's
    * candidates from a [[Similarity.writeIvfIndex]] dir (cell-
    * restricted, nprobe-bounded — the leg is the ANN serve, not a
    * corpus scan), and the fusion frame is byte-identical to
    * [[hybridRrf]]'s. Neither corpus table is read at serve time:
    * probes are the only non-index inputs. Deletion masking is
    * PER-LEG — each layout masks its own tombstones, so retiring a
    * document from the deployment means deleting it from both
    * indexes (spec-pinned: after both deletes it cannot appear in
    * the fused list through either leg).
    *
    * Contract difference vs the corpus-scan [[hybridRrf]]: the vector
    * ranks are the IVF serve's (complete within the probed cells), so
    * the fused list inherits IVF's recall bound — the gated query
    * carries its own oracle replaying exactly that. */
  def hybridRrfFromIndexes(spark: org.apache.spark.sql.SparkSession,
      probeDocs: DataFrame, probeVecs: DataFrame, invDir: String,
      ivfDir: String, depth: Int = 20, k: Int = 10, k0: Int = 60,
      nprobe: Int = 2): DataFrame = {
    val probeTerms = probeDocs
      .select(col("doc_id").as("probe_id"),
        explode(split(col("text"), " ")).as("term"))
      .distinct()
    val lex = lexicalLeg(
      TextAnalysis.maskedPostingPairs(spark, invDir), probeTerms, depth)
      .select(col("probe_id"), col("doc_id"), col("rank_lex"))
    val vec = Similarity.searchIvfIndex(spark, ivfDir, probeVecs,
        depth, nprobe)
      .select(col("probe_id"), col("neighbor_id").as("doc_id"),
        col("rnk").as("rank_vec"))
    fuse(lex, vec, k, k0)
  }

  /** [[hybridRrfFromIndexes]] with the COMPRESSED vector leg: the
    * candidates come from a cell-blocked
    * [[Similarity.writeIvfBqIndex]] layout instead of flat IVF — the
    * 100 TB-preferred serve, where the scan reads
    * corpus·nprobe/kCells 16-byte codes (DPP-pruned partitions)
    * instead of the probed cells' full float vectors. The Hamming
    * shortlist (depth-wide) re-ranks by exact cosine, so `vecs`
    * supplies floats for the SHORTLIST SURVIVORS ONLY (the two-stage
    * BQ contract); the fusion frame, tie-breaks, and rounding are
    * byte-identical to the flat-leg composition. The fused list
    * inherits the IVF-BQ leg's recall bound (nprobe cells, Hamming
    * shortlist) — the gated query's oracle replays exactly that.
    * Deletion masking stays PER-LEG, as in the flat composition. */
  def hybridRrfFromIndexesBq(spark: org.apache.spark.sql.SparkSession,
      probeDocs: DataFrame, probeVecs: DataFrame, invDir: String,
      ivfBqDir: String, vecs: DataFrame, depth: Int = 20, k: Int = 10,
      k0: Int = 60, nprobe: Int = 2): DataFrame = {
    val probeTerms = probeDocs
      .select(col("doc_id").as("probe_id"),
        explode(split(col("text"), " ")).as("term"))
      .distinct()
    val lex = lexicalLeg(
      TextAnalysis.maskedPostingPairs(spark, invDir), probeTerms, depth)
      .select(col("probe_id"), col("doc_id"), col("rank_lex"))
    val vec = Similarity.searchIvfBqIndex(spark, ivfBqDir, vecs,
        probeVecs, shortlist = depth, k = depth, nprobe = nprobe)
      .select(col("probe_id"), col("neighbor_id").as("doc_id"),
        col("rnk").as("rank_vec"))
    fuse(lex, vec, k, k0)
  }

  /** Diversity-capped re-rank over the fused candidates: at most
    * `maxPerSource` results from any one source per probe, then the
    * global top-`k` — the standard result-diversification guard against
    * one dominant source (a crawl domain, a boilerplate mill) filling
    * the whole result list. Two stacked ranking windows implement the
    * greedy cap exactly: the per-(probe, source) window keeps each
    * source's `maxPerSource` best candidates, the per-probe window
    * re-ranks the survivors.
    *
    * Scale shape: the candidate list (≤ 2·depth·|probes| rows) is the
    * BROADCAST side of the source-attach join — the corpus streams and
    * never shuffles — and both windows run over candidates only, with
    * pushed WindowGroupLimits. Determinism: both windows order by the
    * fused contract (rrf desc, doc_id asc). */
  def diversifiedRrf(documents: DataFrame, vecs: DataFrame,
      lexProbePred: Column, vecProbePred: Column, depth: Int = 20,
      k: Int = 5, maxPerSource: Int = 2, k0: Int = 60): DataFrame = {
    val cand = hybridRrf(documents, vecs, lexProbePred, vecProbePred,
      depth, k = 2 * depth, k0)
      .select(col("probe_id"), col("doc_id"), col("rrf"))
    val withSrc = documents.select(col("doc_id"), col("source"))
      .join(broadcast(cand), Seq("doc_id"))
    val wSrc = Window.partitionBy(col("probe_id"), col("source"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    val wAll = Window.partitionBy(col("probe_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    withSrc
      .withColumn("src_rnk", row_number().over(wSrc))
      .filter(col("src_rnk") <= maxPerSource)
      .withColumn("rnk", row_number().over(wAll))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("doc_id"), col("source"), col("rrf"),
        col("src_rnk"), col("rnk"))
  }
}
