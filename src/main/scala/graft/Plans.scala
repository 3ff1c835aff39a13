package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

/** Writes PLANS.md: the formatted physical plans of headline queries, so the
  * scan pushdown / broadcast / partial-agg / codegen shapes are reviewable
  * without running anything.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val headline = Seq(
      "q_agg_pricing_summary", "q_join_broadcast_dims", "q_topk",
      "q_date_range_revenue", "q_asof_click_before_error",
      "dedup_minhash_sig", "ann_topk_bruteforce", "frag_range_query",
      "dedup_embedding_cosine", "cur_decontamination", "cur_token_packing",
      "q_range_join_bands", "q_left_join_order_counts",
      "q_full_outer_balance_orders", "q_skew_join_salted",
      "dedup_clusters", "dedup_fuzzy_pairs", "txt_tfidf",
      "cur_quality_bands", "q_cross_grid_zero_fill", "q_ntile_spend_quartiles",
      "q_bloom_semi_reduce", "q_session_window",
      "ann_pq_topk", "cur_mixture_sample", "q_cdc_apply", "q_histogram_bins",
      "q_stats_moments", "sample_shard_shuffle", "q_zorder_values",
      "ann_ivfpq_topk", "cur_chunk_overlap", "q_events_funnel",
      "txt_bm25_topdocs", "q_geo_grid_join", "q_regr_per_group",
      "q_rolling_median_rev", "ann_hamming_topk", "q_profile_orders",
      "q_window_distinct_users", "dedup_simhash_pairs",
      "q_dq_report", "q_percentile_cont_quartiles", "q_asof_nearest_click",
      "sample_weighted_topk", "q_time_bracket_left_join",
      // round 8 additions
      "cur_span_corrupt", "cur_dsir_weight", "q_winsorize_clip",
      "q_merge_intervals", "emb_group_centroids", "txt_vocab_overlap",
      "q_pagerank_suppliers", "q_approx_quantile_guard",
      "q_basket_lift", "q_gini_concentration", "q_scd2_intervals",
      "q_prorate_fee", "txt_symspell_restore", "q_triangle_parts",
      "q_psi_drift", "q_kcore_parts", "q_holt_smooth", "q_rfm_segments",
      "q_weighted_median", "q_anova_f",
      // round 8 continuation
      "q_spearman_rank", "q_kaplan_meier", "q_hll_estimate", "emb_kmeans_step",
      "q_modularity", "q_ks_two_sample", "q_peak_backlog", "q_record_linkage",
      "q_growth_accounting", "q_bloom_fpr", "emb_dim_variance", "q_abc_by_type",
      // round 9 additions
      "q_window_top_order_per_cust", // TopKPerKeyExec replaces WindowExec here
      "dedup_minhash_eval", "ann_sq_recall", "cur_kanonymity",
      "cur_temperature_mix", "q_histogram_equiheight", "q_join_card_est",
      "q_zonemap_prune", "txt_simpson_diversity", "src_xml_docs",
      // round 10 additions (q_kth_element/q_exact_quartiles omitted: their
      // result frames are driver-built scalar rows; the histogram scans run
      // as actions inside Selection, not in the entries' returned plans)
      "pipe_incr_agg", "q_zorder_prune_gain", "dedup_prefix_pairs",
      "q_window_rank_topk", "mm_decode_stats",
      // round 11 additions (the index-building entries write inside the
      // entry body; their returned frames are the index READ plans — the
      // part worth reviewing)
      "dedup_incremental_near", "dedup_span_rewrite", "mm_dhash_pairs",
      "mm_aphash_pairs", "ann_lsh_index_fetch", "ann_pq_index_fetch",
      "pipe_incr_agg_signed", "q_time_bracket_inner_join", "q_running_totals",
      "mm_dhash_incremental", "emb_incremental_neardup", "mm_dhash_clusters",
      "mm_keep_best_res", "dedup_signal_matrix", "dedup_incremental_spans",
      "dedup_post_mix", "pipe_disposition", "dedup_forget_flow",
      "q_kth_wide_domain",
      // round 11 continuation
      "dedup_incremental_clusters", "dedup_decontam_near",
      "dedup_index_compact", "pipe_delta_join", "ann_multiprobe_topk",
      "mm_dhash_inc_clusters", "dedup_index_stats", "dedup_forget_repair",
      "emb_incremental_clusters", "dedup_incremental_rewrite",
      "ann_multiprobe_index", "mm_dhash_forget_repair",
      "pipe_incremental_disposition", "pipe_delta_join_signed",
      "pipe_incr_agg_retract", "txt_bm25_index", "q_zorder_append_read",
      "dedup_state_diff", "pipe_incr_topk", "ann_ivf_index_fetch",
      // round 12 additions
      "cur_html_extract", "txt_bigram_perplexity", "ann_graph_topk",
      "cur_link_frontier", "ann_graph_index_fetch",
      "cur_url_templates", "cur_fetch_schedule", "cur_anchor_text",
      "cur_robots_decision", "q_hits_scores", "txt_backoff_trigram",
      "mm_phash_values", "cur_crawl_budget", "cur_recrawl",
      "txt_ql_dirichlet", "pipe_consistent_hash", "q_kmv_setops",
      "cur_classifier_ece", "txt_ndcg_eval", "sample_apportionment",
      "cur_pii_luhn", "q_sprt_decision", "dedup_cdc_chunks", "dedup_cluster_ari",
      "ann_csls_topk", "cur_privacy_audit", "sample_kcenter_diverse",
      "q_snm_pairs", "q_emd_drift", "q_hbos_outliers", "q_seq_patterns",
      "cur_pr_curve", "txt_langid_confusion", "sample_cluster_split",
      "cur_padding_waste", "cur_quantile_norm", "dedup_source_overlap",
      "cur_token_budget", "cur_stride_interleave", "cur_epoch_schedule",
      "txt_prf_expansion", "cur_labeler_kappa", "cur_corpus_card",
      "q_shapley_credit", "cur_date_shift", "cur_kanon_lattice",
      "q_mv_rewrite",
      // round 13 additions
      "q_mv_rewrite_minmax", "q_mv_rewrite_filter", "q_mv_rewrite_countcol",
      "ann_mmr_rerank", "txt_kn_bigram",
      // round 14 additions
      "dedup_fuzzy_canonical", "q_mv_incremental", "txt_ql_jm", "txt_pivoted_vsm",
      "txt_bm25_plus", "txt_witten_bell", "q_mannwhitney_u",
      "q_hodges_lehmann", "dedup_sim_coefficients", "txt_textrank", "q_cliffs_delta",
      "cur_ppl_buckets", "q_pettitt_change", "q_durbin_watson",
      "txt_min_k_prob", "q_theil_index", "q_bh_fdr", "q_friedman_test",
      "sample_neyman_alloc", "ann_hnsw_topk", "txt_cond_entropy", "txt_keyness_llr",
      "q_nelson_aalen", "q_price_elasticity", "q_cochran_armitage",
      "q_cohens_d", "txt_jsd_sources", "ann_hnsw_index_fetch",
      "q_gumbel_fit", "dedup_minhash_1bit",
      // round 15 additions (frag_sql_merge / frag_engine_merge build
      // warehouses inside the entry body; the returned frame is the
      // post-merge fragment READ — the part worth reviewing)
      "q_mv_incremental_delete", "frag_sql_merge", "frag_engine_merge",
      "txt_bpe_encode",
      // round 16 additions (q_mv_backfill_refresh builds its warehouse in
      // the entry body — the returned frame is the MV-rewritten read;
      // txt_unigram_pieces' returned frame is the Viterbi + recount plan,
      // the piece table having been collected as the broadcast model)
      "q_hilbert_values", "q_hilbert_prune_gain", "cur_dp_release",
      "cur_classifier_train", "txt_unigram_pieces", "emb_margin_mine",
      "mm_mp4_meta", "q_mv_backfill_refresh",
      // round 17 additions (cur_rho_select trains both models inside the
      // entry body — the returned frame is the scoring join + TakeOrdered
      // cut; emb_pca_power's iterations run as actions, the returned frame
      // is the final component table)
      "dedup_prefix_join", "q_skyline_orders", "cur_rho_select",
      "emb_abtt_proj", "q_bloom_zone_skip", "mm_audio_qc",
      "txt_ccnet_buckets", "q_label_prop", "dedup_golden_record",
      "q_mv_compaction_refresh", "pipe_mixture_curation"
    )
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append("Generated by `graft.Plans` at sf0.001 (plan shapes are sf-independent).\n")
    sb.append("What to look for: `PushedFilters`/`ReadSchema` at scans, `BroadcastHashJoin`\n")
    sb.append("for dims, `TakeOrderedAndProject` for top-k, `partial_*` aggregates before\n")
    sb.append("exchanges, `*(n)` whole-stage-codegen markers.\n")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
