package graft

/** The SCALING.md plan invariants as a regression guard over EVERY
  * registered query: no cartesian product may ever appear, and
  * BroadcastNestedLoopJoin may appear only in the audited set of
  * deliberate bounded broadcasts (one-row aggregates, tiny enumerated
  * dimensions, bounded probe sets). A new query that accidentally plans
  * a cartesian or an unbounded BNLJ fails here before it ships.
  */
class PlanInvariantsSpec extends SparkSpec {

  /** Queries whose plans legitimately contain BroadcastNestedLoopJoin —
    * each is a bounded broadcast by construction (see SCALING.md). */
  private val allowedBnlj = Set(
    "q_cross_join",      // 5x5 enumeration
    "q_range_join",      // tiny band dimension
    "q_scalar_subquery", // one-row aggregate
    "q_tpch_q11",        // one-row aggregate
    "q_tpch_q22",        // one-row aggregate
    "text_bm25",         // one-row corpus stats
    "text_bm25_serve",   // same one-row stats, read from the index
    "text_bm25_shards",  // same, re-aggregated across index shards
    "text_tfidf_vocab",  // one-row corpus size
    "text_boilerplate",  // one-row corpus size
    "text_unigram_logprob", // one-row (n_total, vocab) LM normalizer
    "text_quality_deciles", // same LM normalizer, decile rollup
    "text_dsir_weights", // one-row (ns, nt, vocab) two-LM normalizer
    "sim_topk_bruteforce", "sim_topk_aggregator", "sim_topk_native", // probes
    "sim_range_search",  // broadcast probes, map-side threshold filter
    "graph_pagerank",    // one-row node-count normalizer per iteration
    "graph_pagerank_dangling", // + one-row dangling-mass scalar per iteration
    "pipeline_temperature_mix", // one-row pow-normalizer aggregate
    "sim_kmeans_step",   // K centroids
    "sim_index_stats",   // one-row (total, n_cells) normalizer
    "pipeline_source_mix", // |sources|-row capped-count dimension
    "pipeline_mixture",    // one-row source-count aggregate
    "pipeline_mixture_sample", // same normalizer, materialized
    "pipeline_key_skew",   // one-row global-stats aggregate
    "pipeline_drift_psi",  // one-row corpus-total normalizer
    "sim_hybrid_rrf",      // vector leg = broadcast probes (scoreAll's
                           // probe≠neighbor non-equi), same as the
                           // audited brute-force family
    "sim_rrf_diverse",     // same fused chain + diversity windows
    "sim_pca_power",       // one-row mean / direction / norm vectors
    "sim_pca_residual",    // same chain + the broadcast final direction
    "sim_random_projection", // dOut-row (4) output-dimension table
    "text_cooccurrence_pmi", // one-row n_docs normalizer aggregate
    "text_bigram_logprob",   // one-row vocab scalar (the context-count
                             // side is a broadcast HASH join on `a`)
    "flow_ewma_anomaly",     // observed-bucket dim (≤ |day/600| rows)
                             // crossed into the dense (eni, bucket)
                             // grid
    "text_bpe_train",        // one-row winning-pair broadcast per
                             // unrolled merge round (crossJoin(limit 1))
    "text_bpe_apply",        // same train chain feeding the tokenize join
    "sim_mips_topk"          // broadcast probes, probe != neighbor
                             // non-equi (the brute-force family shape)
  )

  test("no CartesianProduct in any plan; BNLJ only in the audited set") {
    // Iterative queries (connected components) execute driver-side jobs
    // while BUILDING their final frame; that is acceptable here — the
    // final plan is still what ships to the sink.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !allowedBnlj.contains(name)
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (bnlj) Some(s"$name: unaudited BroadcastNestedLoopJoin")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
