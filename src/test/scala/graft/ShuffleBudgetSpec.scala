package graft

/** Shuffle budgets for flagship queries: each plan may not exceed its
  * audited ShuffleExchange count. The BNLJ/cartesian guard
  * (PlanInvariantsSpec) catches wrong JOIN strategies; this catches the
  * other scale regression class — an operator change that silently adds
  * an exchange (lost broadcast, lost partitioning reuse, an aggregate
  * split into two). Budgets are the CURRENT counts, not aspirations:
  * tightening an operator should lower its budget here in the same
  * commit. Counted from the executed-plan string (AQE wraps the tree,
  * so node collection misses inner stages); iterative queries
  * (connected components, BFS) are excluded — their final frame prints
  * cached lineage repeatedly and the count is meaningless.
  */
class ShuffleBudgetSpec extends SparkSpec {

  // ROUND-19 NOTE: the trained-quantizer fleet's budgets were
  // tightened wholesale after the inline-assignment rewrite
  // (Similarity.scala: collected-literal quantizers; assignment,
  // ranking, and residual encode are per-row expressions — no
  // exploded dim×k joins, no row_number windows, no per-vector argmin
  // aggregates, no re-attach joins). Representative deltas, measured
  // via Test/runMain graft.CountExchanges: sim_imi_persist 14→2,
  // sim_imipq_topk 39→8, sim_imipq_persist 22→10, sim_ivf_persist
  // 5→2, sim_ivfpq_persist 10→4, sim_ivf_kmeans 22→4,
  // sim_kmeans_train 8→2. Older per-row comments in the quantizer
  // family describe the pre-rewrite plan shapes where they mention
  // assignment windows or centroid joins; the NUMBERS are the
  // post-rewrite measured counts.
  private val budgets: Map[String, Int] = Map(
    // flow pipeline: the ONLY exchange is the input repartition; every
    // enrichment join broadcasts (dimensions), nothing else moves.
    "flow_parse" -> 1,
    "flow_enriched" -> 1,
    "flow_beacon_detect" -> 2,   // repartition + window/agg co-key
    // relational flagships
    "q1_pricing_summary" -> 2,   // agg + output sort
    "q_asof_join" -> 2,          // equi-key shuffle + window
    "q_session_window" -> 2,
    "q_skew_join" -> 2,          // salted equi-join (both sides keyed)
    "q_zorder" -> 2,             // bucket agg + output sort
    "q_lateral_topn" -> 2,
    "q_recursive_cte" -> 2,
    "q_tpch_q21" -> 4,           // hardest fact-fact-fact co-shuffle
    // pipeline / text / similarity
    "dedup_exact" -> 2,          // hash groupBy + output sort
    "dedup_minhash_lsh" -> 3,    // fused per-row sigs: bucket agg +
                                 // pair distinct + sort (was 4 with
                                 // the shingle-explode aggregate)
    "dedup_ngram_jaccard" -> 10, // LSH chain + jaccard verify
    // Substring-span family (r19): the guarded salted expansion prints
    // its bucket-size window once per leg (cold/hot-within/hot-cross ×
    // both sides) and the surgery tails re-print the spans lineage —
    // TEXTUAL counts; the canonically-identical exchanges dedup at
    // runtime via ReuseExchange (sf0.1 steadies stayed inside the
    // pre-guard quiet bands: spans 2.7-3.0, rewrite 0.7-0.8 s).
    "dedup_substring_spans" -> 7, // winnow explode is narrow
                                  // (codegen'd kernel); bucket-size
                                  // window + salted expansion legs +
                                  // merge window/agg + extension
                                  // joins + output sort
    "dedup_substring_skew_guarded" -> 7, // same chain, maxBucket=2
    "dedup_substring_selfspans" -> 7,    // same chain, same-doc filter
    "dedup_substring_decontam" -> 10, // two-sided guard: per-side
                                  // bucket counts + cold/hot legs +
                                  // merge/extension + output sort
    "dedup_substring_decontam_guarded" -> 10, // same chain, maxBucket=2
    "dedup_substring_append" -> 10, // the decontam chain with the
                                  // reference side READ from the
                                  // persisted fp table instead of
                                  // fingerprinted — same exchange set
    "dedup_substring_rewrite" -> 26, // the spans chain (re-printed by
                                  // the piece frames) + interval
                                  // snap/dedup/merge windows
                                  // (doc-keyed) + rebuild agg + two
                                  // doc-keyed left joins + output sort
    "dedup_substring_rewrite_self" -> 26, // unified matched frame
    "dedup_substring_scrub" -> 35, // decontam chain + surgery tail
                                  // (the cross-corpus lineage prints
                                  // once more per piece frame)
    "dedup_substring_scrub_incr" -> 35, // same tail over the
                                  // persisted-fp serve — identical
                                  // exchange set (reference fps read
                                  // instead of fingerprinted)
    "text_nb_classify" -> 12,    // (label,tok)/label/vocab/prior model
                                  // aggs + the candidate fan-out's
                                  // (label,tok) model join + per-(doc,
                                  // label) rollup + argmax window +
                                  // ground-label re-join + sort (model
                                  // sides broadcast; the shared
                                  // nbScore frame derives ct/vocab
                                  // FROM cwc, so that chain prints
                                  // under both consumers)
    "text_nb_serve" -> 12,       // the same scoring frame over the
                                  // stored count tables — plus the
                                  // two per-key re-aggregations that
                                  // make appends additive
    "text_nb_compact" -> 12,     // identical serve plan over the
                                  // compacted tables (compaction's own
                                  // writes are eager, pre-plan)
    "text_nb_delete" -> 12,      // identical serve plan over the
                                  // surviving partitions (the delete
                                  // is a pre-plan filesystem drop)
    "text_top_ngrams" -> 2,      // (gram,doc) pre-agg + gram rollup
    "text_gopher_rules" -> 1,     // per-row integer rules; output sort only
    "text_spell_candidates" -> 6, // vocab agg + probe sort-limits +
                                  // candidate distinct + freq sum +
                                  // rank + sort (the freq sum is the
                                  // price of the appendable
                                  // keys/stats split)
    "text_spell_serve" -> 6,      // same serve frame over the stored
                                  // keys/stats tables
    "text_spell_append" -> 6,     // identical serve frame over the
                                  // unioned batches
    "text_spell_delete" -> 6,     // identical serve frame over the
                                  // rewritten tables
    "text_trigram_entropy" -> 1, // per-row codegen'd expression + sort
    "text_bm25" -> 8,
    "sim_topk_bruteforce" -> 2,  // window rank + sort (probes broadcast)
    // sim_mmr_rerank is excluded like the other unrolled iterative
    // plans (kmeans, pagerank, BFS): each greedy round re-references
    // the candidate pool, so the plan STRING repeats cached lineage
    // (~46 textual exchanges for 3 rounds). PlanInvariantsSpec pins its
    // unrolled structure via the derived Window-count formula instead.
    "sim_pq_codes" -> 3,         // window + rollup + sort
    "pipeline_quality_dedup" -> 2,
    "pipeline_seq_pack" -> 2,
    "mm_scene_cut" -> 2,
    "dedup_bloom_prefilter" -> 4, // history-distinct + anti co-key + sort
    "pipeline_key_skew" -> 3,     // key agg + stats agg + top-N sort
    "pipeline_dataset_card" -> 5, // base agg + dist agg/window + join + sort
    "text_chunk_overlap" -> 1,    // generator is narrow; output sort only
    "sim_winsorize" -> 3,         // dim dist agg/window + output sort
    "q_pipe_syntax" -> 2,         // agg + sort (same plan as classic SQL)
    "pipeline_end_to_end" -> 4,   // doc-key join + text-key dedup chain + sort
    // round-6 additions (graph_pagerank is excluded like BFS/CC: its
    // unrolled plan prints cached lineage repeatedly, inflating the
    // string count far past the ~8 real exchanges)
    "text_tokenize_bpe" -> 1,     // pure projection + output sort
    "text_unigram_logprob" -> 5,  // tok agg + re-join + doc rollup + sort
    "sim_range_search" -> 1,      // broadcast probes + map filter + sort
    "sim_hybrid_indexed" -> 8,   // postings-overlap agg + lex window
                                  // + the IVF serve frame + full-outer
                                  // fusion + rank + output sort — all
                                  // from stored layouts, no corpus scan
    "sim_bq_rerank" -> 2,         // Hamming-shortlist window + rerank
                                  // window; codes broadcast, floats
                                  // join only the shortlist
    "sim_bq_persist" -> 2,        // identical serve over the stored
                                  // code table
    "sim_bq_append" -> 2,         // identical serve over the unioned
                                  // batches
    "sim_bq_compact" -> 2,        // compacted table, identical serve
    "sim_bq_filtered" -> 2,       // same serve — the metadata filter
                                  // is a pushed scan predicate, zero
                                  // added exchanges
    "sim_bq_range" -> 2,          // the thresholded refined tail —
                                  // the Hamming-shortlist window stays
    "sim_bq_delete" -> 2,         // same 2 — the tombstone mask is a
                                  // broadcast anti-join over the
                                  // 16-byte code rows, zero added
    "sim_ivfbq_persist" -> 2,     // SERVING plan — probe cell assign
                                  // + DPP-pruned cell-equi Hamming
                                  // (codes never shuffle: probe codes
                                  // broadcast) + shortlist window +
                                  // re-rank window + output sort
    "sim_ivfbq_append" -> 2,      // identical serve over the unioned
                                  // cell partitions
    "sim_ivfbq_compact" -> 2,     // compacted cells, identical serve
    "sim_ivfbq_filtered" -> 2,    // same serve — the metadata filter
                                  // is a pushed scan predicate, zero
                                  // added exchanges
    "sim_ivfbq_range" -> 2,       // the thresholded refined tail —
                                  // the Hamming-shortlist window
                                  // stays, only the final rank window
                                  // drops (its exchange is reused)
    "sim_ivfbq_delete" -> 2,      // same — the tombstone mask is a
                                  // broadcast anti-join, zero added
    // sim_recall_ladder is excluded like kmeans/MMR: it unions four
    // rungs over ONE trained-quantizer lineage, so the plan string
    // re-prints the kmeans chain per rung and the textual exchange
    // count is meaningless. Its structure is gated by the oracle
    // (integer overlap counts) and each rung's own budget row.
    // sim_recall_curve is excluded for the same reason ×4 nprobe
    // points (16 rung enumerations over one trained lineage);
    // sim_imi_curve / _clustered / _external likewise (two rungs ×
    // 4 operating points over one two-level trained lineage).
    "mm_gray" -> 1,               // codegen'd kernel + pixel explode;
                                  // output sort only
    "mm_flip" -> 1,               // same shape (pure index remap)
    "mm_crop" -> 1,               // same shape (window extraction)
    "mm_upsample" -> 1,           // same shape (index replication)
    "mm_png_decode" -> 1,         // encode→decode both codegen'd
                                  // per-row kernels; output sort only
    "mm_channel_stats" -> 1,      // per-row kernel + channel explode;
                                  // output sort only
    "mm_png_pipeline" -> 1,       // PNG encode→decode→resize→gray→
                                  // histogram, one codegen span +
                                  // output sort (same as mm_pipeline)
    "mm_pipeline" -> 1,           // resize→gray→histogram chained in
                                  // ONE codegen span (spec-pinned
                                  // exchange-free before the sort)
    "mm_audio_energy" -> 1,       // WAV kernel + window explode;
                                  // output sort only
    "mm_video_cuts" -> 2,         // per-doc cut/scene windows share
                                  // one doc_id exchange + output sort;
                                  // frame split + gray-sum signature
                                  // are per-row kernels
    "mm_feature_knn" -> 2,        // the brute-force serve over
                                  // kernel-extracted vectors: top-k
                                  // window + output sort (probes
                                  // broadcast) — sim_topk_bruteforce's
                                  // shape
    "sim_hybrid_indexed_bq" -> 8, // the hybrid frame with the
                                  // IVF-BQ serve as the vector leg:
                                  // lex agg + window + the 6-exchange
                                  // cell-blocked BQ serve + fusion +
                                  // rank + sort — one more than the
                                  // flat-IVF twin (the shortlist →
                                  // re-rank pair replaces the single
                                  // IVF rank window)
    // graph_kcore_salted is excluded like graph_kcore (unrolled peel
    // lineage); GraphOpsSpec pins its two-phase plan shape + parity.
    "sim_ivf_range" -> 1,         // the persisted-IVF serve frame
                                  // (assign + cell join) minus any
                                  // ranking window — thresholded scan
    "dedup_substring_mass" -> 5,  // gram agg + re-join + doc rollup + sort
    "dedup_containment" -> 10,    // LSH chain + intersect + sizes joins
    "pipeline_epoch_shuffle" -> 2, // (epoch, shard) window + output sort
    "pipeline_drift_psi" -> 9,    // (source,bin) agg + dense joins + sort
    // round-7 additions (dedup_cluster_stats is excluded like CC/BFS:
    // the iterative components chain prints cached lineage repeatedly)
    "dedup_bloom_sharded" -> 8,   // 2 groupByKey sides of the cogroup
    "dedup_bloom_persist" -> 6,   // stored-filter serve drops the
                                  // build-side groupByKey vs the 8 of
                                  // the in-memory sharded path
    "dedup_bloom_append" -> 6,    // identical serve frame; the merge
                                  // happens inside the cogroup task
                                  // (x2: the maybe_dup split re-reads
                                  // it) + history distinct + anti
                                  // co-key + sort
    "text_dsir_weights" -> 5,     // tok agg + re-join + doc rollup + sort
    "text_quality_deciles" -> 8,  // LM chain + source ntile window +
                                  // decile rollup + sort
    "dedup_degree_dist" -> 5,     // fused sigs (was 8): bucket agg +
                                  // pair distinct + endpoint agg +
                                  // corpus join + degree rollup/sort
    // round-8 additions
    "dedup_lsh_skew_guarded" -> 6, // fused sigs (was 10): one bucket
                                    // exchange printed per branch
                                    // (normal + within + 2 join sides;
                                    // ReuseExchange dedups at runtime)
                                    // + pair distinct + sort
    "sim_ivf_nprobe" -> 2,          // centroid agg + assignment window +
                                    // cluster-scan window + rollup + sort
    "sim_imi_topk" -> 2,           // sub-centroid agg + corpus sub-d2
                                    // agg + argmin-pair agg (one
                                    // combine-friendly exchange, no
                                    // window) on the corpus side; the
                                    // probe side re-prints the
                                    // centroid/d2 subtree (ReuseExchange
                                    // dedups at runtime) + pair-rank
                                    // window + cell join + top-k window
                                    // + sort
    "sim_imipq_topk" -> 8,         // Multi-D-ADC + refine: the
                                    // sub-centroid/sub-d2 subtrees
                                    // print under the corpus-index,
                                    // residual-encode, and probe
                                    // branches (ReuseExchange dedups
                                    // at runtime — the same textual
                                    // inflation every multi-stage
                                    // enumeration here carries) +
                                    // code-assign windows + ADC rollup
                                    // + shortlist window + re-rank
                                    // window + sort
    "sim_imi_stats" -> 4,          // corpus sub-d2 + argmin-pair aggs
                                    // + pair occupancy + the one-row
                                    // total broadcast + output sort
    "sim_imipq_persist" -> 10,      // Multi-D-ADC SERVING plan (both
                                    // quantizer tables + codes written
                                    // before the frame): probe sub-d2
                                    // under both pair branches + pair
                                    // rank window + probe pair-residual
                                    // slices + ADC rollup + shortlist
                                    // window + refine re-rank window +
                                    // sort (ReuseExchange dedups the
                                    // repeated probe subtrees)
    "sim_imipq_append" -> 10,       // identical serve frame over the
                                    // appended pair partitions
    "sim_imipq_delete" -> 10,       // tombstone mask = broadcast
                                    // anti-join, zero added exchanges
    "sim_imipq_compact" -> 10,      // compacted pair leaves, identical
                                    // serve frame
    "sim_imipq_filtered" -> 10,     // same serve — the metadata filter
                                    // is a pushed predicate on the
                                    // pair-partitioned code scan, zero
                                    // added exchanges
    "sim_imipq_range" -> 9,        // the thresholded tail over the
                                    // refined frame — one less than
                                    // the ranked serves (no final
                                    // top-k window exchange)
    "sim_imipq_auto" -> 10,         // identical serve frame: the auto
                                    // depth resolves EAGERLY from a
                                    // ≤k²-row code-table aggregate at
                                    // plan-build time, so the served
                                    // frame's plan is persist's
                                    // verbatim with a different depth
                                    // constant
    "sim_imi_persist" -> 2,        // SERVING plan (codebooks + index
                                    // written before the frame): the
                                    // probe sub-d2 agg prints under
                                    // both pair branches (ReuseExchange
                                    // dedups at runtime) + pair-rank
                                    // window + the DPP-pruned pair scan
                                    // under the broadcast serve join +
                                    // top-k window + sort
    "sim_imi_append" -> 2,         // identical serve frame over the
                                    // appended pair partitions
    "sim_imi_delete" -> 2,         // same — the tombstone mask is a
                                    // broadcast anti-join over the
                                    // index rows, zero added exchanges
    "sim_imi_compact" -> 2,        // compacted pair leaves, identical
                                    // serve frame
    "sim_imi_filtered" -> 2,       // same serve — the metadata filter
                                    // is a pushed scan predicate, zero
                                    // added exchanges
    "sim_imi_range" -> 1,          // the thresholded tail over the
                                    // same scored frame — one less
                                    // than the ranked serves (no top-k
                                    // window exchange)
    "sim_imi_kmeans" -> 10,         // the two half-Lloyd trajectories
                                    // are localCheckpointed (run once,
                                    // cut from the printed plan — was
                                    // 37 textual with live lineage);
                                    // what remains is the serve: two
                                    // half-d2 aggs + argmin-pair agg +
                                    // pair-rank window + cell join +
                                    // top-k window + sort
    "pipeline_temperature_mix" -> 4, // source agg (printed again under
                                     // the one-row normalizer branch;
                                     // ReuseExchange dedups) + sort
    // round-9 additions (v2 = one-digest signature family)
    "dedup_minhash_v2" -> 1,      // per-row sigs are narrow; output sort
    "dedup_lsh_v2" -> 3,          // bucket agg + pair distinct + sort
                                  // (same shape as dedup_minhash_lsh)
    "sim_knn_join" -> 2,          // centroid agg + assignment agg/topk
                                  // + cell-join co-key reused by the
                                  // final top-k window + sort
    // round-10 additions (timestamp-native twins)
    "q_time_bucket_ts" -> 2,      // window() agg + output sort
    "q_session_window_ts" -> 2,   // user-key session agg + output sort
    "q_date_trunc_ts" -> 2,       // calendar agg + output sort
    // round-11 retrieval/analytics additions
    "sim_hybrid_rrf" -> 9,        // 2 postings distincts + overlap agg
                                  // + per-leg top-depth windows + the
                                  // rank-list full-outer (2 sides, tiny)
                                  // + fused top-k window + sort
    "sim_rrf_diverse" -> 11,      // the fused chain's 9 + the two
                                  // stacked diversity windows (the
                                  // source-attach join broadcasts the
                                  // candidate side, no extra exchange)
    "sim_ivf_persist" -> 2,       // SERVING plan only (the train+write
                                  // runs before the returned frame):
                                  // probe assignment agg/window over
                                  // the broadcast stored centroids +
                                  // DPP-pruned cell join + top-k
                                  // window + sort
    "sim_pca_power" -> 32,        // the mean/centered subtrees print
                                  // under every consuming branch (v0 +
                                  // both power rounds; ReuseExchange
                                  // dedups identical subplans at
                                  // runtime) + per-round contraction,
                                  // norm, and collect aggregations
    "sim_pca_residual" -> 35,     // sim_pca_power's chain + the final
                                  // direction-collect and output sort
    "sim_embed_drift" -> 3,       // (dim, half) agg + dim pivot + sort
    "sim_random_projection" -> 2, // (vec, out_dim) contraction + sort
    "pipeline_reservoir_weighted" -> 2, // per-source top-k window + sort
    "pipeline_canonical_quality" -> 2,  // cluster argmax agg + sort (CC
                                  // chain excluded like dedup_components:
                                  // cached lineage prints repeatedly)
    "text_cooccurrence_pmi" -> 10, // vocab distinct-df agg + per-doc
                                  // collect_set + pair agg + sort; the
                                  // postings subtree prints under both
                                  // the vocab and pair branches
                                  // (ReuseExchange dedups at runtime)
    // round-11 additions (timestamp-native twins)
    "q_asof_join_ts" -> 2,        // user-key shuffle + rank window
    "q_cohort_retention_ts" -> 4, // first-seen agg + user join + cohort
                                  // agg + sort (same as integer form)
    "q_gap_fill_ts" -> 3,         // hourly snap window + grid join + fill
    "q_time_slice" -> 2,          // pruned scan + agg + output sort
    "dedup_embed_cosine_guarded" -> 6, // salted expansion (bucket window
                                  // + 2 expand groupings + cross-salt
                                  // join) + pair distinct + id-join sort
    "sim_kmeans_train" -> 2,      // final means agg + output sort —
                                  // earlier Lloyd rounds collect
                                  // eagerly and leave the plan
    "sim_ivf_kmeans" -> 4,       // the trained-cells chain prints per
                                  // consuming branch (corpus index +
                                  // probe assignment; ReuseExchange
                                  // dedups at runtime) + cell join +
                                  // top-k window + sort
    "sim_knn_join_indexed" -> 4, // the ranked-assignment exchange
                                  // prints once per consuming branch
                                  // (probe cells + index cells;
                                  // ReuseExchange dedups at runtime)
                                  // + cell join + top-k window + sort
    "sim_knn_join_persist" -> 4,  // SERVING plan (the assignment agg
                                  // ran ONCE at build, before the
                                  // returned frame): 2 id-keyed joins
                                  // against the stored table + top-k
                                  // window + sort — the 10-exchange
                                  // in-memory print collapses to 4
    "sim_knn_join_delete" -> 4,   // same serve frame — the tombstone
                                  // mask is a broadcast anti-join,
                                  // zero added exchanges
    // round-11 serving-path additions (sim_ivfpq_topk is excluded like
    // the other unrolled trainers: the kmeans trajectory prints per
    // consuming branch and the string count is meaningless)
    "text_bm25_serve" -> 4,       // pruned postings df agg + doc rollup
                                  // + sort (stats is a broadcast
                                  // one-row crossJoin, no exchange)
    "text_bm25_shards" -> 4,      // same shape: the shard union is
                                  // narrow, both scans statically
                                  // bucket-pruned
    "text_phrase_search" -> 2,    // (doc,start) co-keyed leg joins +
                                  // doc rollup; legs co-partition so
                                  // the chain reuses one exchange per
                                  // side
    // late-round-11 sketch/maintenance family
    "sketch_kmv_distinct" -> 3,   // distinct agg + TopKPerKey key
                                  // exchange + output sort
    "sketch_kmv_sharded" -> 5,    // per-shard (grp,sh) rank + merge
                                  // re-rank + output sort
    "sketch_kmv_jaccard" -> 2,    // 2 distinct aggs; the union top-k is
                                  // TakeOrderedAndProject (no exchange)
                                  // and the output is one row
    "sketch_hll_distinct" -> 3,   // (grp,bucket) register agg + grp
                                  // rollup + output sort
    "sketch_cms_heavy" -> 3,      // cell agg + candidate agg (sketch
                                  // side broadcasts) + output sort
    "sketch_cms_sharded" -> 4,    // (sh,j,bucket) cell agg + cell-wise
                                  // merge + candidate agg + sort (was 6
                                  // as 4 filter-per-index builds; the
                                  // group-by-shard rework is also the
                                  // correctness fix for out-of-range
                                  // shard values)
    "pipeline_compaction_plan" -> 2, // part-key window + bin rollup
                                  // share one exchange + output sort
    "q_mad_outliers" -> 8,        // 2 bounded-state percentile chains
                                  // (value-dist agg + cum windows) +
                                  // final rollup; med/mad broadcast
    "graph_common_neighbors" -> 13, // the capped-edge subtree prints
                                  // under both self-join branches and
                                  // ldeg under both pair joins
                                  // (ReuseExchange dedups at runtime)
                                  // + pair agg + top sort; 11 -> 13
                                  // textual with the pinned
                                  // shuffle_hash pair join (SHJ
                                  // prints both shuffled inputs where
                                  // SMJ shared a sort subtree) —
                                  // runtime exchanges unchanged,
                                  // steady halved 5.9 -> 2.4 s
    "sketch_kmv_persist" -> 2,    // SERVING plan: estimate rollup +
                                  // sort over the stored synopsis
    "sketch_hll_sharded" -> 4,    // (grp,sh,bucket) register agg +
                                  // merge max-agg + estimate rollup +
                                  // sort (was 6 as 4 filter-per-index
                                  // builds; group-by-shard rework)
    "sketch_hll_persist" -> 2,    // SERVING plan: estimate rollup +
                                  // sort over the stored registers
    "sketch_cms_persist" -> 2,    // SERVING plan: candidate agg + sort
                                  // (the stored cell table broadcasts;
                                  // the build ran before the frame)
    "q_weighted_median" -> 3,     // (flag,cents) dist agg + cum window
                                  // co-key + final rollup/sort
    "flow_exfil_ratio" -> 2,      // repartition + eni-key agg (the
                                  // dimension broadcasts) + sort
    "sim_mips_topk" -> 2,         // probes broadcast; rank window +
                                  // output sort (TopKPerKey rewrite)
    "pipeline_negative_sample" -> 5, // bucket-rep agg + its ≤64-row
                                  // rank window print under BOTH the
                                  // occupied-count and slot-join
                                  // branches (ReuseExchange dedups at
                                  // runtime) + output sort; draws stay
                                  // narrow — the corpus never shuffles
    "text_bpe_train" -> 14,       // 3 unrolled rounds: vocab agg + per-
                                  // round pair agg + one-row best
                                  // (limit-1 sort) printed per
                                  // consuming branch; ReuseExchange
                                  // dedups at runtime
    "text_bpe_apply" -> 17,       // the train chain + the corpus word
                                  // explode co-keyed join + per-doc
                                  // reassembly agg + sort
    "text_bigram_logprob" -> 6,   // (a,b) bigram agg co-keyed with the
                                  // instance join + doc rollup + sort;
                                  // context counts and vocab broadcast
    "flow_ewma_anomaly" -> 4,     // (eni,bucket) agg + 2 tiny dim
                                  // distincts (bucket side broadcasts
                                  // into the dense grid) + eni window
                                  // reusing the grid exchange + sort
    "text_keywords" -> 6,         // (doc,term) tf agg + distinct/df
                                  // aggs + per-doc top-k window + sort
                                  // (the one-row corpus count is a
                                  // broadcast crossJoin, no exchange)
    "pipeline_token_budget" -> 2, // source-key cumsum window + sort
    // graph_label_prop is excluded like pagerank/BFS/CC: the unrolled
    // lineage re-prints the symmetrized-edge subtree per round and the
    // string count is meaningless (round count pinned instead in
    // PlanInvariantsSpec-style via the unrolled oracle gate).
    "sketch_quantile" -> 2,       // grp sample rank (TopKPerKey) +
                                  // estimate windows share the grp
                                  // exchange + output sort
    "sketch_quantile_sharded" -> 3, // + the (grp, sh) partial rank
    "sketch_quantile_persist" -> 2, // SERVING plan: estimate windows
                                  // + sort over the stored sample
    "mm_cdc_chunks" -> 1,         // pure per-row HOFs + generator;
                                  // output sort only
    "flow_port_entropy" -> 3,     // (eni, port) agg + eni rollup +
                                  // output sort — bounded by distinct
                                  // ports, never flows
    "text_bpe_serve" -> 2,        // SERVING plan (vocab trained+written
                                  // before the frame): per-doc
                                  // reassembly agg + output sort — the
                                  // stored vocab broadcasts into the
                                  // tokenize join
    "dedup_lsh_persist" -> 2,     // SERVING plan (base index written
                                  // before the frame): bucket-keyed
                                  // join/distinct + output sort; base
                                  // text and signatures never touched
    "dedup_lsh_delete" -> 2,      // same serve frame over the
                                  // post-delete index — the rewrite
                                  // ran before the frame
    "text_bm25_delete" -> 5,      // SERVING plan: pruned-postings df
                                  // agg + doc rollup + sort; the
                                  // tombstone mask is a broadcast
                                  // anti-join and the stats
                                  // adjustment a one-row broadcast —
                                  // neither adds a data exchange
    "sketch_cms_lookup" -> 3,     // external-candidate agg + true_c
                                  // co-key join + sort; the sketch
                                  // broadcasts into the cell lookup
    "sketch_kmv_setops" -> 7,     // SERVING plan over the stored
                                  // synopsis (k rows/group): pair
                                  // flag agg + union window + ests
                                  // joins + sort — every exchange
                                  // moves profile rows, never data
    "sim_ivf_compact" -> 2,       // compacted cells, identical serve
    "sim_ivf_delete" -> 2,        // SERVING plan — same 5 as
                                  // sim_ivf_persist: the tombstone
                                  // mask is a broadcast anti-join,
                                  // zero added exchanges
    "sim_ivf_filtered" -> 2,      // SERVING plan — same 5: the
                                  // metadata filter is a pushed scan
                                  // predicate, zero added exchanges
    "sim_sq8_persist" -> 2,       // SERVING plan — the SQ8 serve keeps
                                  // the flat layout's exchange budget:
                                  // probe assign + cell join + rank
                                  // window + sort; codes never re-read
                                  // the float corpus
    "sim_sq8_compact" -> 2,       // compacted cells, identical serve
    "sim_sq8_filtered" -> 2,      // same serve — the metadata filter
                                  // is a pushed scan predicate, zero
                                  // added exchanges
    "sim_sq8_delete" -> 2,        // same 5 — the tombstone mask is a
                                  // broadcast anti-join, zero added
    "sim_sq8_range" -> 1,         // the SQ8 serve frame minus the
                                  // ranking window (thresholded scan)
                                  // — the sim_ivf_range shape on the
                                  // compressed rows
    "dedup_segments" -> 5,        // seg-freq agg + seg re-join + doc
                                  // rollup + output sort
    "dedup_segments_wide" -> 5,   // identical plan, wider shuffle key
                                  // (hash + length struct)
    "mm_jpeg_roundtrip" -> 1,     // per-row codec, output sort only
    "mm_jpeg_color_roundtrip" -> 1, // same shape, 3-component MCUs
    "mm_jpeg_pipeline" -> 1,      // codec + kernels fused in one
                                  // codegen pass; output sort only
    "mm_chunk_store" -> 2,        // reassembly: hash-keyed store join
                                  // + doc rollup + sort (manifest
                                  // and store written before the
                                  // frame)
    "mm_chunk_gc" -> 2,           // same reassembly frame over the
                                  // post-GC layout — the sweep's
                                  // joins ran before the frame
    // round-13 additions
    "q_bucketed_join" -> 0,       // the whole point of the bucketed
                                  // layout: the join of two tables
                                  // bucketed+sorted on the key plans
                                  // with ZERO exchange — the shuffle
                                  // was paid once at write time
    "q_bucketed_agg" -> 0,        // same layout serving an AGGREGATE:
                                  // stored hash distribution satisfies
                                  // the groupBy clustering, no exchange
    "dedup_lsh_append" -> 2,      // SERVING plan — same 2 as
                                  // dedup_lsh_persist: appended bucket
                                  // rows are just more index files
    "sim_ivfpq_append" -> 4,     // SERVING plan — same 10 as
                                  // sim_ivfpq_persist: the append leg
                                  // ran before the served frame
    "sketch_cms_delete" -> 4,     // two cell aggs (all / retracted) +
                                  // cell-keyed subtract join + sort
    "sim_ivfpq_persist" -> 4,    // by-residual refine SERVING plan:
                                  // probe-assign agg/window + the
                                  // kCells centroid-array agg (that
                                  // trio prints TWICE across consuming
                                  // branches; ReuseExchange dedups at
                                  // runtime) + ADC rollup + shortlist
                                  // window + re-rank window + sort.
                                  // Corpus floats NEVER shuffle: the
                                  // rerank fetch probes the scan via
                                  // the broadcast shortlist, and the
                                  // distance-table subtree stays
                                  // broadcast-only
    "sim_ivfpq_auto" -> 4,       // identical serve frame — the auto
                                  // depth resolves eagerly from a
                                  // ≤K-row cell-occupancy aggregate at
                                  // plan-build time (sim_imipq_auto's
                                  // rule at the cell key)
    "sim_ivfpq_delete" -> 4,     // same serve — the tombstone mask is
                                  // a broadcast anti-join, zero added
                                  // exchanges
    "sim_ivfpq_compact" -> 4,    // compacted cells, identical serve
    "sim_ivfpq_filtered" -> 4,   // same serve — the metadata filter
                                  // is a pushed predicate on the
                                  // cell-partitioned code scan, zero
                                  // added exchanges
    "sim_ivfpq_range" -> 3)       // the thresholded tail over the
                                  // refined frame — one less than the
                                  // ranked serves (no final top-k
                                  // window exchange)

  test("flagship plans stay within their audited shuffle budgets") {
    val over = budgets.toSeq.sortBy(_._1).flatMap { case (name, budget) =>
      // Per-query Try: one analysis-broken query (e.g. fixture schema
      // drift) reports individually instead of aborting every other
      // budget check in the suite.
      scala.util.Try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        "Exchange (hash|range|SinglePartition)".r.findAllIn(plan).size
      } match {
        case scala.util.Success(n) =>
          if (n > budget) Some(s"$name: $n > $budget") else None
        case scala.util.Failure(e) =>
          Some(s"$name: plan build failed: " +
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(over.isEmpty,
      s"shuffle budget exceeded (broadcast lost / exchange added?): " +
        over.mkString("; "))
  }
}
