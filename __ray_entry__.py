"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself; nothing here (or in ctdray) calls
``ray.init``/``ray.shutdown``.  ``entry()`` runs the flagship extraction
pipeline at sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator family (SURVEY.md §2 + the training-data additions) with DuckDB
oracles wherever the semantics are SQL-expressible.  Column names match the
SQL aliases exactly (the driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ctdray.functions.dedup import (dedup_clusters, embedding_near_dedup,
                                    exact_dedup, frequent_chunk_scrub,
                                    incremental_dedup, minhash_lsh_dedup,
                                    ngram_jaccard_dedup, simhash_dedup,
                                    simhash_near_dedup, token_set_dedup)
from ctdray.functions.quantiles import exact_quantiles, grouped_exact_quantiles
from ctdray.functions.similarity import (cosine_range_search, knn_bruteforce,
                                         knn_ivf, knn_lsh)
from ctdray.functions.text import (deterministic_sample_batch,
                                   fingerprint_batch, langid_batch,
                                   quality_filter_batch,
                                   rolling_fingerprint_batch,
                                   text_stats_batch, token_count_batch)
from ctdray.pipelines.analytics import (asof_last_event, events_hourly,
                                        interval_count_join,
                                        local_supplier_volume,
                                        lineitem_pricing_summary,
                                        orders_by_nation,
                                        daily_distinct_users,
                                        daily_users_hll,
                                        doc_top_terms,
                                        docs_stratified_sample,
                                        events_rollup,
                                        events_sliding_2h,
                                        orders_by_mktsegment,
                                        orders_monthly_by_priority,
                                        part_type_stats, partial_aggregate,
                                        sessionize_events,
                                        shipped_1995_by_flag,
                                        supplier_stats_by_nation,
                                        token_countmin,
                                        top_bigrams, top_tokens,
                                        viewers_not_purchasers,
                                        events_daily_pivot,
                                        top_customers_by_orders,
                                        top_orders_per_customer,
                                        customer_urgent_order_counts,
                                        user_event_gaps, event_funnel,
                                        bloom_semi_volume, token_postings,
                                        user_record_events,
                                        events_json_k_stats, orders_cube,
                                        user_best_event, cohort_retention,
                                        lang_char_trigrams,
                                        frequent_token_pairs,
                                        order_status_transitions,
                                        doc_length_histogram,
                                        doc_repetition_stats,
                                        small_qty_part_revenue,
                                        bm25_top_docs, user_value_trend,
                                        views_purchases_full,
                                        daily_revenue_moving7,
                                        global_event_rank,
                                        user_top_event_type,
                                        heavy_hitter_tokens,
                                        price_quartile_volumes,
                                        session_duration_stats,
                                        token_offset_packing,
                                        decontaminate_5gram,
                                        user_outlier_events,
                                        rolling_7d_active_users,
                                        users_per_event_type,
                                        token_typo_pairs,
                                        nation_revenue_share_ppm,
                                        region_priority_matrix,
                                        selfjoin_cardinality_by_part,
                                        source_quality_stats,
                                        lineitem_orphans,
                                        daily_order_counts_dense,
                                        part_metrics_unpivot,
                                        user_path_prefixes,
                                        q3_shipping_priority,
                                        late_ship_priority_counts,
                                        event_dedup_60s,
                                        q14_promo_revenue_ppm,
                                        user_value_quartiles,
                                        major_parts_by_revenue,
                                        embedding_norm_stats_by_label,
                                        lang_confusion_matrix,
                                        q19_disjunctive_revenue,
                                        idle_customers_by_nation,
                                        event_type_jaccard,
                                        docs_weighted_sample,
                                        doc_length_deciles,
                                        docs_with_hapax,
                                        bilateral_trade_volume,
                                        customer_order_gap_median,
                                        daily_revenue_delta,
                                        cheapest_supplier_per_part,
                                        q10_returned_revenue,
                                        order_count_distribution,
                                        q18_large_orders,
                                        q8_market_share,
                                        chunk_dedup_stats,
                                        label_centroid_dots,
                                        q21_last_ship_supplier,
                                        docs_matching_all_terms,
                                        value_mad_by_event_type,
                                        cross_source_dup_docs,
                                        user_value_1h_window,
                                        region_nation_rollup,
                                        top_chunk_overlap_pairs,
                                        time_rollup_multigrain,
                                        pareto_customer_cutoff,
                                        events_dow_hour_share,
                                        session_type_pairs,
                                        q6_forecast_revenue,
                                        q9_profit_by_nation_year,
                                        q15_top_supplier,
                                        q20_dominant_suppliers,
                                        q12_late_lines_by_priority,
                                        q16_supplier_variety,
                                        doc_token_commonness,
                                        user_ping_pong_transitions,
                                        doc_chunks_sliding,
                                        tokens_in_all_langs,
                                        customer_rfm_scores,
                                        value_decile_matrix,
                                        user_active_day_streaks,
                                        mutual_top_partner_nations,
                                        embedding_quantize_int8,
                                        daily_new_vs_returning,
                                        lang_balanced_sample,
                                        coordered_part_pairs,
                                        dim_correlation_topk,
                                        part_graph_bfs,
                                        ngram_novelty_ratio,
                                        fulfillment_lag_histogram,
                                        user_top_value_share,
                                        nation_supplier_hhi,
                                        user_activity_bitmask,
                                        part_skyline,
                                        customers_all_priorities,
                                        part_price_band_pairs,
                                        weighted_median_price,
                                        user_type_signature,
                                        orders_above_group_median,
                                        dedup_keep_longest,
                                        customer_status_asof,
                                        doc_char_class_profile,
                                        value_first_digit_hist,
                                        monthly_revenue_growth_ppm,
                                        part_supplier_degree_hist,
                                        top_tokens_per_lang,
                                        parts_never_ordered,
                                        event_round_value_bias,
                                        token_length_hist,
                                        part_triangle_count,
                                        token_first_seen_hist,
                                        doc_intra_repeat_positions,
                                        orders_open_per_day,
                                        knn_label_vote,
                                        user_burst_max_5min,
                                        repeat_purchase_stats,
                                        dup_cluster_size_hist,
                                        supplier_revenue_pctile,
                                        lang_source_lift,
                                        token_pair_lift_topk,
                                        session_bounce_stats,
                                        events_peak_hour_per_type,
                                        revenue_abc_classification,
                                        trimmed_price_sum,
                                        supplier_first_month_cohort,
                                        order_total_consistency,
                                        lineitem_linenumber_gaps,
                                        embedding_norm_outlier_ids,
                                        order_value_concentration_hist,
                                        doc_hash_shard_balance,
                                        docs_with_phrase,
                                        top_revenue_day_per_nation,
                                        lineitem_quantity_mode,
                                        part_revenue_gini_ppm,
                                        customer_year_overlap_matrix,
                                        view_to_purchase_lag_hist,
                                        token_zipf_ranks,
                                        supplier_quadrant_counts,
                                        doc_ttr_ppm,
                                        user_value_milestone,
                                        part_name_bigram_topk,
                                        user_second_event_type_dist,
                                        user_longest_increasing_run,
                                        order_seasonality_index,
                                        embedding_dim_range,
                                        doc_top_token,
                                        label_peak_dim,
                                        docs_term_first_pos,
                                        discount_tax_joint_hist,
                                        customer_value_trend_counts,
                                        parts_multi_nation,
                                        top_value_events,
                                        event_weekend_share_ppm,
                                        global_event_gap_topk,
                                        source_vocab_jaccard,
                                        nation_cr4_ppm,
                                        parts_above_brand_mean,
                                        weekly_stickiness_ppm,
                                        supplier_exclusive_parts,
                                        event_type_share_volatility,
                                        price_last_digit_hist,
                                        user_resurrection_counts,
                                        doc_first_token_dist,
                                        order_ship_span_hist,
                                        user_type_loyalty,
                                        supplier_active_months,
                                        token_cooccurrence_degree,
                                        preferred_order_dow_dist,
                                        doc_adjacent_repeat_counts,
                                        nation_customer_reach,
                                        top_order_value_jumps,
                                        event_minute_hist,
                                        user_weekend_ratio_hist,
                                        source_dup_stats,
                                        user_hour_bitmask,
                                        part_name_collisions,
                                        referential_integrity_audit,
                                        embedding_dim_sign_balance,
                                        avg_token_len_by_lang,
                                        user_type_run_counts,
                                        pagerank_nation_trade,
                                        brand_name_lcp,
                                        embedding_top2_dims,
                                        views_except_all_purchases,
                                        pretrain_pipeline_docs,
                                        user_type_gini_ppm,
                                        global_gap_median_us,
                                        user_event_id_inversions,
                                        doc_longest_token,
                                        top_token_context_diversity,
                                        customer_balance_peers,
                                        source_exclusive_vocab,
                                        session_conversion_ppm,
                                        daily_revenue_interpolated,
                                        events_rate_limited,
                                        order_first_ship_lag_hist,
                                        user_late_events,
                                        event_type_daily_dominance,
                                        lineitem_table_checksum,
                                        cust_supp_balance_matches,
                                        embedding_dim_variance,
                                        dau_overlap_jaccard,
                                        join_size_estimate,
                                        event_value_log2_hist,
                                        shipdate_zonemap_overlap,
                                        source_weighted_jaccard,
                                        qty_discount_cov_by_flag,
                                        priority_dow_independence,
                                        same_month_ship_share_by_year,
                                        priority_value_drift_l1,
                                        quantity_ks_between_flags,
                                        dedup_survivorship_stats,
                                        diversified_top_orders,
                                        coorder_degree_assortativity,
                                        fingerprint_collision_audit,
                                        brand_rank_churn,
                                        events_hourly_ohlc,
                                        user_daily_twap,
                                        order_overlap_pairs_per_customer,
                                        supplier_borda_top10,
                                        same_customer_yoy_delta,
                                        type_coburst_hours,
                                        revenue_sigma_outlier_days,
                                        view_purchase_within3_events,
                                        embedding_power_iteration,
                                        top_customer_part_drilldown,
                                        consistent_hash_move_audit,
                                        part_name_levenshtein_pairs,
                                        lineitem_profile,
                                        purchase_position_in_session,
                                        priority_lag_quantiles,
                                        customer_name_key_audit,
                                        event_id_density_audit,
                                        customer_status_sequence_signatures,
                                        customer_giant_orders,
                                        vocab_coverage_curve,
                                        arrival_dispersion_by_type,
                                        token_burstiness_top10,
                                        part_staleness_tiers,
                                        daily_peak_3h_window,
                                        type_pair_lag_xcorr,
                                        brand_revenue_anova,
                                        user_value_ewma2,
                                        revenue_growth_accounting,
                                        order_total_allocation,
                                        quality_pass_by_length_decile,
                                        revenue_changepoint_day,
                                        orders_fiscal_445_counts,
                                        sampled_topk_fidelity,
                                        user_decayed_value,
                                        daily_revenue_kmeans2,
                                        token_anagram_groups,
                                        session_handoff_matrix,
                                        domestic_supply_share,
                                        dataset_split_manifest,
                                        lineitem_sync_manifest,
                                        session_count_sweep,
                                        customer_supplier_diversity_hist,
                                        corpus_lang_run_count,
                                        order_ship_atomicity,
                                        purchase_attribution_models,
                                        cumulative_unique_users,
                                        brand_return_rate_top10,
                                        join_size_bucket_estimate,
                                        customer_lorenz_curve,
                                        order_line_concentration_hist,
                                        revenue_multiscale_variance,
                                        rapid_event_share,
                                        revenue_up_down_streaks,
                                        brand_size_grid_sparsity,
                                        transition_time_matrix,
                                        hierarchy_share_report,
                                        month_end_revenue_share,
                                        user_staleness_hist,
                                        unit_price_deviation_hist,
                                        brand_price_gap_hist,
                                        users_business_hours_share,
                                        priority_habit_consistency,
                                        customer_rank_spearman_d2,
                                        activation_gap_median_days,
                                        orderkey_fragmentation,
                                        quality_filter_ablation,
                                        bpe_overhead_by_lang,
                                        label_centroid_distance_matrix,
                                        user_day_density_ppm,
                                        salted_top_user,
                                        kmv_intersection_estimate,
                                        token_position_diversity,
                                        coorder_clustering_coefficient,
                                        early_value_share_hist,
                                        popularity_rec_hit_at10,
                                        order_rolling_rank_counts,
                                        hourly_hotuser_share_hist,
                                        doc_half_jaccard_hist,
                                        zorder_locality_audit,
                                        lang_hapax_tail_mass,
                                        value_split_retention,
                                        priority_multiline_share,
                                        props_k_value_cov,
                                        same_day_repeat_buyers,
                                        repdigit_value_audit,
                                        alert_2of3_low_days,
                                        boilerplate_prefix_docs,
                                        segment_staleness_matrix,
                                        coorder_largest_component,
                                        core_vocab_mass_ppm,
                                        duplicate_order_suspects,
                                        monetization_by_activity_decile,
                                        bigram_holdout_coverage,
                                        error_rate_churn_matrix,
                                        monthly_value_p90,
                                        intermittent_parts,
                                        customer_top2_gap_hist,
                                        price_fd_violations,
                                        worst_5day_window,
                                        snapshot_staleness_by_type,
                                        premium_sku_counts,
                                        nation_median_of_customer_medians,
                                        frequent_part_triples,
                                        user_value_temporal_spearman,
                                        stream_outage_audit,
                                        purchase_hazard_table,
                                        score_calibration_lift,
                                        unattributed_purchase_share,
                                        nation_dow_mix_l1,
                                        session_3step_funnel,
                                        corpus_simpson_index,
                                        supplier_share_movers,
                                        popular_part_antipairs,
                                        discount_ladder,
                                        lang_length_mix_l1,
                                        first_event_purchase_share,
                                        part_reorder_gap_hist,
                                        token_lifetime_hist,
                                        value_nextgap_cov,
                                        nation_entity_balance,
                                        session_position_type_matrix,
                                        brand_activation_rate,
                                        value_granularity_audit,
                                        session_size_hist,
                                        order_dup_part_lines,
                                        customer_kanonymity_audit,
                                        price_percentile_ranks,
                                        event_type_trigrams,
                                        order_priority_escalation,
                                        nation_segment_lift,
                                        customer_part_diversity_hist,
                                        user_first_last_matrix,
                                        token_df_hist,
                                        supplier_part_jaccard_topk,
                                        embedding_signbucket_hist,
                                        sentence_len_hist,
                                        daily_type_mix_l1,
                                        customer_rrf_top10,
                                        coorder_kcore_peel,
                                        order_fulfill_30d_share_by_month,
                                        supplier_leadtime_variance_topk,
                                        q4_late_order_share,
                                        q22_sales_opportunity,
                                        supplier_customer_concentration_hist,
                                        daily_count_autocorr,
                                        region_trade_matrix,
                                        part_supplier_price_spread_hist,
                                        first_line_dominance_ppm,
                                        source_ttr_ppm,
                                        distinct_users_multigrain,
                                        user_modal_type_churn,
                                        label_inertia_moments,
                                        event_dow_value_share,
                                        monthly_new_customer_revenue_share,
                                        orderkey_range_partition_plan,
                                        part_margin_below_retail,
                                        second_order_within30_ppm,
                                        stopword_share_by_source,
                                        dup_shingles_topk,
                                        brand_size_price_inversions,
                                        region_parttype_lift,
                                        segment_basket_size_matrix,
                                        session_size_duration_cov,
                                        doc_max_token_run_topk,
                                        doc_pack_plan_by_bucket,
                                        q6_grid_sweep,
                                        orderkey_date_sortedness,
                                        props_k_quartiles_by_type,
                                        users_active_all_weeks,
                                        daily_whale_share_hist,
                                        single_supplier_order_ppm,
                                        customer_tenure_years_hist,
                                        lapsed_customers_sweep,
                                        part_name_token_set_dups,
                                        coorder_edge_weight_hist,
                                        order_ship_month_matrix,
                                        customer_quarter_density_hist,
                                        parts_ordered_all_years,
                                        purchase_nearest_view_gap_hist,
                                        part_price_runnerup_gap_hist,
                                        nation_acctbal_profile,
                                        nearest_centroid_confusion,
                                        customer_brand_loyalty_hist,
                                        token_suffix_diversity,
                                        signbucket_label_purity,
                                        quantity_mannwhitney_u2,
                                        brand_discount_subsidy_ppm,
                                        event_arrival_lateness_hist,
                                        customer_acctbal_sign_by_segment,
                                        purchase_priorviews_cov,
                                        brand_size_rollup,
                                        error_recovery_minutes_hist,
                                        linenumber_quantity_profile,
                                        fingerprint_density_hist,
                                        first_order_ltv_cov,
                                        user_spend_spread_hist,
                                        doc_prefix_dup_hist,
                                        nation_acctbal_mad,
                                        daily_revenue_streak_hist,
                                        customer_spend_halves_matrix,
                                        bigram_asymmetry_topk,
                                        sorted_neighborhood_pair_hist,
                                        unitprice_divisibility_audit,
                                        order_shipdate_monotonicity,
                                        token_length_by_position,
                                        countmin_sketch_estimates,
                                        sample_quota_largest_remainder,
                                        timestamp_delta_varint_audit,
                                        error_burst_hour_hist,
                                        user_type_simpson_hist,
                                        shuffle_skew_audit,
                                        doc_alpha_order_share_hist,
                                        discount_tax_net_grid,
                                        events_orders_daily_cov,
                                        centroid_margin_hist,
                                        nation_supplier_hhi_ppm,
                                        purchase_dow_hour_heatmap,
                                        order_total_reconciliation,
                                        intersession_gap_hist,
                                        doc_ttr_hist,
                                        order_topline_share_hist,
                                        coorder_pagerank2,
                                        embedding_dim_cov_sign_census,
                                        monthly_yoy_sign_matrix,
                                        supplier_distinct_orders_hist,
                                        coorder_minlabel_rounds,
                                        pps_systematic_sample_audit,
                                        order_width_transition_matrix,
                                        doc_internal_shingle_repeats,
                                        greedy_vocab_cover,
                                        doc_toklen_lag_sign_census,
                                        kendall_width_price,
                                        order_price_ratio_pairs_hist,
                                        ams_f2_sketch_audit,
                                        daily_revenue_next_higher_wait,
                                        supplier_ship_interval_coverage,
                                        rle_chunk_encoding_audit,
                                        split_leakage_audit,
                                        coorder_heaviest_edge_hooking,
                                        doc_repeat_mass_log2,
                                        daily_revenue_extrema_census,
                                        histogram_quantile_audit,
                                        token_trie_level_widths,
                                        daily_revenue_gorilla_audit,
                                        dow_detrend_sign_census,
                                        daily_peak_concurrent_sessions,
                                        price_firstdigit_two_sample,
                                        iblt_difference_cells,
                                        hash_bit_balance_audit,
                                        coorder_percolation_curve,
                                        vocab_adjacent_lcp_profile,
                                        daily_revenue_haar_energy,
                                        dow_rank_occupancy_matrix,
                                        price_interpolation_error_hist,
                                        cdc_chunk_length_hist,
                                        partkey_bag_algebra_years,
                                        source_doclen_ks_matrix,
                                        embedding_adjacent_dot_hist,
                                        coorder_hub_common_neighbors,
                                        order_subset_containment,
                                        doc_alphabet_size_hist,
                                        order_date_inversions,
                                        orders_vs_lines_qq_table,
                                        user_replay_checksum_hist,
                                        expensive_line_ships_last,
                                        lww_compaction_by_type,
                                        orders_count_revenue_best_lag,
                                        join_salt_plan,
                                        hub_pair_path_census,
                                        coorder_edge_churn_by_year,
                                        deletion_vector_plan,
                                        type_quiet_window,
                                        type_mix_changepoint,
                                        cluster_sample_estimator_audit,
                                        selectivity_independence_audit,
                                        kmv_monthly_distinct_audit,
                                        revenue_sign_motif_census,
                                        merkle_anti_entropy_audit,
                                        roaring_container_census,
                                        grace_hash_recursion_plan,
                                        bloom_skip_index_audit,
                                        theilsen_slope_ppm_hist,
                                        chao1_distinct_estimator,
                                        ta_topk_stop_depth,
                                        pq2_block_assignment_census,
                                        dict_encoding_planner,
                                        checkpoint_cadence_plan,
                                        samplesort_splitter_audit,
                                        median_of_medians_rank_audit,
                                        vocab_growth_checkpoints,
                                        bitsliced_sum_audit,
                                        hash_table_probe_cost_sweep,
                                        cuckoo_choice_load_audit,
                                        seasonal_naive_backtest,
                                        knn1_hubness_hist,
                                        cascade_delete_impact,
                                        sort_layout_pruning_audit,
                                        rounding_policy_divergence_census,
                                        skiplist_level_census,
                                        bpe_first_merge_audit,
                                        rice_parameter_selection,
                                        feistel_shuffle_audit,
                                        topk_overlap_curve,
                                        weighted_bottomk_sample,
                                        natural_sort_run_census,
                                        art_node_type_census,
                                        per_group_uniform_pick_bias,
                                        list_intersection_cost_audit,
                                        sparse_layout_planner,
                                        fd_strength_census,
                                        ldiversity_audit,
                                        voptimal_2bucket_split,
                                        mm1_backlog_audit,
                                        elias_fano_plan,
                                        sharded_topk_recall,
                                        rank_block_popcount_plan,
                                        value_flatline_run_census,
                                        btree_bulkload_plan,
                                        external_sort_pass_plan,
                                        multi_pattern_match_census,
                                        secretary_rule_audit,
                                        join_order_dp_plan,
                                        linear_counting_audit,
                                        countsketch_sign_estimates,
                                        dhondt_seat_allocation,
                                        int32_overflow_day_census,
                                        kgram_index_size_planner,
                                        doc_minimizer_density,
                                        hashagg_spill_planner,
                                        condorcet_nation_audit,
                                        for_encoding_chunk_plan,
                                        vocab_tiering_plan,
                                        lsm_compaction_plan,
                                        jl_projection_distortion_census,
                                        luhn_checksum_census,
                                        zipf_mandelbrot_shift_fit,
                                        dominant_type_run_census,
                                        kleinberg_burst_dp_audit,
                                        uuidv7_id_plan_audit,
                                        pinball_loss_decile_audit,
                                        zstd_dict_sample_coverage,
                                        graycode_hamming_census,
                                        predicate_order_cost_audit,
                                        reorder_point_stockout_census,
                                        md5_permutation_test,
                                        hilbert_vs_zorder_locality,
                                        cache_admission_knapsack_plan,
                                        skipgram_window_pairs_topk,
                                        daily_revenue_max_drawdown,
                                        buddy_allocation_frag_census,
                                        good_turing_unseen_mass,
                                        wsjf_schedule_cost_audit,
                                        sign_partition_cut_audit,
                                        streaming_centroid_drift,
                                        customer_order_spree_census,
                                        patricia_compression_census,
                                        type_hourweek_cosine_matrix,
                                        ts_precision_collision_census,
                                        task_assignment_makespan_audit,
                                        drf_dominant_share_top5,
                                        edge_block_locality_audit,
                                        bullwhip_variance_ratio,
                                        assoc_rule_confidence_top5,
                                        richclub_top8_coefficient,
                                        ewma_crossover_signal_census,
                                        aimd_congestion_replay,
                                        day_boundary_shift_sensitivity,
                                        embedding_anisotropy_ppm,
                                        top_value_event_day_concentration,
                                        waterfill_fair_allocation,
                                        rendezvous_hash_balance,
                                        quality_length_kappa_ppm,
                                        weekly_fourier_energy,
                                        bipartite_butterfly_census,
                                        mlm_masking_plan_census,
                                        order_ship_busday_lag_hist,
                                        nation_revenue_hoover_ppm,
                                        length_rule_pr_curve,
                                        filter_shapley_attribution,
                                        segment_priority_tcloseness,
                                        quantity_gini_mean_difference,
                                        iso_week_rollover_census,
                                        laplace_smoothing_rank_flips,
                                        size_price_simpson_probe,
                                        friday13_order_lift,
                                        source_vocab_shapley,
                                        feature_hashing_collision_sweep,
                                        linear_probing_cluster_census,
                                        source_minhash_jaccard_error,
                                        lang_vocab_overlap_coeff,
                                        token_bigram_pmi_top10,
                                        region_priority_hist_intersection,
                                        collatz_stopping_census,
                                        daily_revenue_max_rally,
                                        order_day_next_greater_census)
from ctdray.pipelines.extract import build_blocks, build_detected_spans
from ctdray.pipelines.interleave import read_interleaved_docs

_STOPLIST_SQL = "('the','a','of','and','is','to','in')"

# Exact all-pairs word-3-gram Jaccard dedup (DuckDB list kernels).  Shingle
# semantics mirror ctdray.functions.dedup.jaccard: <3 tokens → the whole
# text is the single shingle; ties keep the smaller doc_id.
_NGRAM_JACCARD_SQL = (
    "WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t "
    "FROM documents), "
    "sh AS (SELECT doc_id, CASE WHEN len(t) >= 3 "
    "THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] "
    "FOR i IN range(1, len(t)-1)]) "
    "ELSE [array_to_string(t, ' ')] END AS g FROM toks), "
    "p AS (SELECT b.doc_id AS b_id, len(list_intersect(a.g, b.g)) AS ni, "
    "len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS nu "
    "FROM sh a JOIN sh b ON a.doc_id < b.doc_id), "
    "dup AS (SELECT DISTINCT b_id FROM p WHERE 5 * ni >= 4 * nu) "
    "SELECT doc_id, text FROM documents "
    "WHERE doc_id NOT IN (SELECT b_id FROM dup)")


_CM_MD5 = "md5(CAST(depth AS VARCHAR) || ':' || tok)"


def _fold60_sql(expr: str) -> str:
    """15-hex-char fold of an md5 string expression into a 60-bit BIGINT —
    the SQL mirror of dedup._token_hash60 / analytics._hash60_str."""
    fold = "0"
    for i in range(1, 16):
        fold = (f"({fold})*16 + (strpos('0123456789abcdef', "
                f"substr({expr},{i},1))-1)")
    return fold


def _fold48_sql(expr: str) -> str:
    """12-hex-char fold → 48-bit BIGINT (48 not 60 so threshold·weight
    products stay inside int64; mirrors docs_weighted_sample)."""
    fold = "0"
    for i in range(1, 13):
        fold = (f"({fold})*16 + (strpos('0123456789abcdef', "
                f"substr({expr},{i},1))-1)")
    return fold


def _fold4_sql(expr: str) -> str:
    """4-hex-char fold of an md5 string expression into a 16-bit
    BIGINT — mirrors ``int(md5(s).hexdigest()[:4], 16)``."""
    fold = "0"
    for i in range(1, 5):
        fold = (f"({fold})*16 + (strpos('0123456789abcdef', "
                f"substr({expr},{i},1))-1)")
    return fold


def _percolation_sql(thresholds: tuple = (2, 3, 4, 5)) -> str:
    """Unrolled recursive-CTE connected components per edge-weight
    threshold — the SQL mirror of analytics.coorder_percolation_curve
    (w=1 excluded: the near-complete giant component makes the
    reachability CTE quadratic in |V|)."""
    parts = [
        "WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey AS o, "
        "CAST(l_partkey AS BIGINT) AS p FROM lineitem), "
        "pr AS (SELECT a.p AS a, b.p AS b, count(*) AS n FROM lp a "
        "JOIN lp b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2)"]
    sel = []
    for w in thresholds:
        parts.append(
            f", e{w} AS (SELECT a, b FROM pr WHERE n >= {w}), "
            f"n{w} AS (SELECT a AS v FROM e{w} "
            f"UNION SELECT b FROM e{w}), "
            f"nb{w} AS (SELECT a AS v, b AS w FROM e{w} "
            f"UNION ALL SELECT b, a FROM e{w}), "
            f"r{w}(v, lab) AS (SELECT v, v FROM n{w} UNION "
            f"SELECT nb{w}.v, r{w}.lab FROM nb{w} "
            f"JOIN r{w} ON r{w}.v = nb{w}.w), "
            f"lb{w} AS (SELECT v, min(lab) AS lab FROM r{w} "
            f"GROUP BY 1), "
            f"c{w} AS (SELECT lab, count(*) AS cnt FROM lb{w} "
            f"GROUP BY 1)")
        sel.append(
            f"SELECT CAST({w} AS BIGINT) AS min_weight, "
            f"CAST((SELECT count(*) FROM lb{w}) AS BIGINT) "
            f"AS n_nodes, "
            f"CAST((SELECT count(*) FROM c{w}) AS BIGINT) "
            f"AS n_components, "
            f"CAST((SELECT COALESCE(max(cnt), 0) FROM c{w}) "
            f"AS BIGINT) AS largest")
    return "".join(parts) + " " + " UNION ALL ".join(sel) \
        + " ORDER BY 1"


def _simhash_sql(select: str) -> str:
    """Build the 60-bit SimHash SQL shared by the simhash oracles: per-token
    hash = first 15 md5 hex chars folded per char (mirrors
    dedup._token_hash60), signature = sign of the per-bit ±1 column sums
    (mirrors dedup.simhash60 exactly — split(' '), unit weights)."""
    fold = _fold60_sql("md5(x)")
    return (
        "WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t "
        "FROM documents), "
        f"hm AS (SELECT doc_id, text, [ {fold} FOR x IN t ] AS hs FROM toks), "
        "sig AS (SELECT doc_id, text, CAST(list_sum([ "
        "CASE WHEN list_sum([ ((h // CAST(power(2, b) AS BIGINT)) % 2)*2 - 1 "
        "FOR h IN hs ]) > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END "
        "FOR b IN range(0, 60) ]) AS BIGINT) AS s FROM hm) "
        + select)


def _knn_lsh_sql(n_planes: int = 8, seed: int = 11, probe_hamming: int = 2,
                 n_tables: int = 6, dim: int = 64, k: int = 10) -> str:
    """Exact SQL re-implementation of similarity.knn_lsh's DEFAULT geometry
    (multi-table + multiprobe): the hyperplanes are data-INDEPENDENT
    (seeded by dim alone), so they embed as literals and the oracle holds
    at any scale factor.  A vector is a candidate iff, in ANY of the
    ``n_tables`` plane sets, the popcount of its bucket XOR the query's
    bucket is ≤ ``probe_hamming`` — exactly the engine's enumerated probe
    set, without enumerating it.  (knn_ivf's data-trained centroids need
    the per-corpus generation of :func:`_knn_ivf_sql` instead.)"""
    import numpy as np

    def bucket(vec_expr: str, planes) -> str:
        terms = []
        for j in range(n_planes):
            lit = "[" + ",".join(repr(float(x)) for x in planes[:, j]) + "]"
            terms.append(
                f"(CASE WHEN list_inner_product({vec_expr}, "
                f"{lit}::DOUBLE[]) > 0 THEN {1 << j} ELSE 0 END)")
        return "(" + " + ".join(terms) + ")"

    conds = []
    for t in range(n_tables):
        rng = np.random.default_rng(seed + 1000 * t)
        planes = rng.standard_normal((dim, n_planes))
        conds.append(
            f"bit_count(xor({bucket('ev', planes)}::BIGINT, "
            f"{bucket('q.qv', planes)}::BIGINT)) <= {probe_hamming}")
    return (
        "WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv "
        "FROM embeddings WHERE vec_id < 5), "
        "ev_t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev "
        "FROM embeddings), "
        "cand AS (SELECT q.q_id, e.vec_id, "
        "list_cosine_similarity(e.ev, q.qv) AS sim "
        f"FROM ev_t e CROSS JOIN q WHERE {' OR '.join(conds)}) "
        "SELECT q_id, vec_id, \"rank\" FROM ("
        "  SELECT q_id, vec_id, CAST(row_number() OVER ("
        "    PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS INTEGER) "
        f"  AS \"rank\" FROM cand) WHERE \"rank\" <= {k}")


def _knn_ivf_sql(n_lists: int = 8, n_probe: int = 3, train_sample: int = 2048,
                 seed: int = 13, k: int = 10) -> str:
    """Exact SQL oracle for similarity.knn_ivf's DEFAULT geometry.  The
    centroids are k-means-TRAINED on the first ``train_sample`` data rows,
    so no single literal set holds across scale factors; instead this
    generator re-runs the engine's own deterministic training
    (similarity._seeded_kmeans over the parquet head — identical numpy
    code) for EVERY testdata scale factor and embeds each centroid set
    behind an exact content probe (the first element of vec_id 0's
    embedding, a single float literal — no aggregation-order FP risk).
    The SQL then performs only single-shot computations — nearest-centroid
    assignment, the query's n_probe closest lists, cosine top-k — with the
    same lowest-index tie-breaks as the numpy argmin/argsort, so there is
    no iteration drift: the oracle is value-exact wherever the embeddings
    table matches one of the embedded corpora (the driver's sf0.01, plus
    sf0.001/sf0.1 for spot checks)."""
    import numpy as np

    from ctdray.functions.similarity import _seeded_kmeans

    branches = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"):
        try:
            t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        except (OSError, IOError):      # pragma: no cover - sf dir absent
            continue
        sample = np.array(t.column("embedding").to_pylist()[:train_sample],
                          dtype=np.float64)
        cents = _seeded_kmeans(sample, n_lists, seed=seed)
        import pyarrow.compute as pc_

        row0 = t.filter(pc_.equal(t.column("vec_id"), 0))
        probe = float(np.float64(row0.column("embedding")[0][0].as_py()))
        vals = ", ".join(
            f"({cid}, [{','.join(repr(float(x)) for x in cv)}]::DOUBLE[])"
            for cid, cv in enumerate(cents))
        branches.append(
            f"SELECT cid, cv FROM (VALUES {vals}) t(cid, cv) "
            f"WHERE (SELECT p FROM probe) = {probe!r}")
    cent = " UNION ALL ".join(branches)
    return (
        "WITH probe AS (SELECT list_extract(CAST(embedding AS DOUBLE[]), 1) "
        "AS p FROM embeddings WHERE vec_id = 0), "
        f"cent AS ({cent}), "
        "q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv "
        "FROM embeddings WHERE vec_id < 5), "
        "ev_t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev "
        "FROM embeddings), "
        "vassign AS (SELECT vec_id, ev, (SELECT cid FROM cent "
        "  ORDER BY list_distance(ev_t.ev, cent.cv) ASC, cid ASC LIMIT 1) "
        "  AS cid FROM ev_t), "
        "qprobe AS (SELECT q_id, cid FROM ("
        "  SELECT q.q_id, cent.cid, CAST(row_number() OVER ("
        "    PARTITION BY q.q_id "
        "    ORDER BY list_distance(q.qv, cent.cv) ASC, cent.cid ASC) "
        "    AS INTEGER) AS pr FROM q CROSS JOIN cent) "
        f"  WHERE pr <= {n_probe}), "
        "cand AS (SELECT q.q_id, v.vec_id, "
        "  list_cosine_similarity(v.ev, q.qv) AS sim "
        "  FROM vassign v JOIN qprobe p ON v.cid = p.cid "
        "  JOIN q ON q.q_id = p.q_id) "
        "SELECT q_id, vec_id, \"rank\" FROM ("
        "  SELECT q_id, vec_id, CAST(row_number() OVER ("
        "    PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS INTEGER) "
        f"  AS \"rank\" FROM cand) WHERE \"rank\" <= {k}")


def _documents(sf_dir: str):
    from ctdray.sources.tables import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def _lineitem_price(sf_dir: str):
    from ctdray.sources.tables import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                              columns=["l_extendedprice"])


def _documents_full(sf_dir: str):
    from ctdray.sources.tables import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet")


def _embeddings(sf_dir: str):
    from ctdray.sources.tables import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/embeddings.parquet")


def _query_vectors(sf_dir: str, n: int = 5):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    import pyarrow.compute as pc

    mask = pc.less(t.column("vec_id"), n)
    t = t.filter(mask)
    order = np.argsort(np.asarray(t.column("vec_id").to_numpy(zero_copy_only=False)))
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)[order]
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)[order]
    return vecs, ids


def entry() -> Any:
    """Flagship: interleaved docs (derived from sf0.001 documents) →
    key-scan density routing → fused decode/detect/splice (dense tail via
    groupby(doc_id)) → flat span rows."""
    from ctdray.pipelines.extract import interleaved_extraction

    return interleaved_extraction("/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _blocks_flat(sf_dir: str):
    """build_blocks → flat columns (stable schema for the smoke check)."""
    ds = build_blocks(read_interleaved_docs(sf_dir))

    def flatten(batch: pa.Table) -> pa.Table:
        blk = batch.column("block")
        if isinstance(blk, pa.ChunkedArray):
            blk = blk.combine_chunks()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "language": blk.field("language"),
            "vertical": blk.field("vertical"),
            "angle": blk.field("angle"),
            "order": blk.field("order"),
            "n_lines": pa.array(
                [len(x) for x in blk.field("lines").to_pylist()], pa.int32()),
        })

    return ds.map_batches(flatten, batch_format="pyarrow")


def _refined_masks_summary(sf_dir: str):
    """Mask refinement (K1-K5) summary rows — compact columns only so the
    driver comparison never hashes megabytes of mask bytes."""
    from ctdray.pipelines.extract import build_refined_masks

    ds = build_refined_masks(read_interleaved_docs(sf_dir))
    return ds.select_columns(["doc_id", "media_ref", "mask_h", "mask_w",
                              "fg_pixels", "n_blocks"])


def _refine_resume_summary(sf_dir: str):
    """Annotation round trip (SURVEY.md §3.2, traverse_by_dict parity):
    save per-page block structs + refined mask (build_annotations), then
    resume K1-K5 refinement from the saved rows WITHOUT a detector
    (refine_from_annotations).  Same compact summary columns as
    extract_refined_masks, same row set and mask dims; fg_pixels reflects
    re-refining from the SAVED mask rather than the raw prediction —
    faithful to traverse_by_dict, which refines whatever mask was saved
    (refinement is near- but not exactly idempotent: 13 of 1,085 sf0.001
    pages differ, by <1 px on average).  Distributed-vs-single-process
    equality of the resumed masks is pytest-pinned in
    tests/test_annotations_roundtrip.py."""
    from ctdray.pipelines.extract import (build_annotations,
                                          refine_from_annotations)

    ann = build_annotations(read_interleaved_docs(sf_dir))
    ds = refine_from_annotations(ann)
    return ds.select_columns(["doc_id", "media_ref", "mask_h", "mask_w",
                              "fg_pixels", "n_blocks"])


def _media_thumbnails(sf_dir: str):
    """Multimodal decode+resize stage over every page (binary → thumbnail)."""
    from ctdray.stages.explode import explode_media_spans
    from ctdray.stages.multimodal import thumbnails_task

    pages = read_interleaved_docs(sf_dir).map_batches(
        explode_media_spans, batch_format="pyarrow")
    thumbs = pages.map_batches(thumbnails_task, batch_format="pyarrow",
                               batch_size=8)
    return thumbs.select_columns(["media_ref", "height", "width", "mean_px",
                                  "decode_ok"])


def _media_probe_dims(sf_dir: str):
    """Header-only shape probe over every page (r4 verdict task 2 smoke):
    DecodeStage(keep_pixels=False) routes through probe_image_dims — no
    pixel decompression — and each probed (im_h, im_w) is re-checked
    in-stage against the FULL decode so any probe/decode divergence
    surfaces as dims_match=false rows, not just in unit tests."""
    from ctdray.sources.media import decode_page
    from ctdray.stages.decode import DecodeStage
    from ctdray.stages.explode import explode_media_spans

    def check(batch: pa.Table) -> pa.Table:
        match = []
        for row in batch.select(["media_ref", "im_h", "im_w",
                                 "decode_ok"]).to_pylist():
            if not row["decode_ok"]:
                match.append(False)
                continue
            try:
                shape = decode_page(row["media_ref"]).shape[:2]
            except ValueError:
                # header probed clean but the body fails full decode —
                # exactly the divergence class this query surfaces
                match.append(False)
                continue
            match.append(shape == (row["im_h"], row["im_w"]))
        return batch.append_column("dims_match", pa.array(match, pa.bool_()))

    pages = read_interleaved_docs(sf_dir).map_batches(
        explode_media_spans, batch_format="pyarrow")
    probed = pages.map_batches(DecodeStage(keep_pixels=False),
                               batch_format="pyarrow", batch_size=64)
    return (probed.map_batches(check, batch_format="pyarrow")
                  .select_columns(["media_ref", "im_h", "im_w",
                                   "decode_ok", "dims_match"]))


def _media_refs(sf_dir: str, scheme: str):
    """One synthetic clip per document (vid://…, aud://…) — the multimodal
    stages' input shape."""
    def to_refs(b: pa.Table) -> pa.Table:
        return pa.table({"media_ref": pa.array(
            [f"{scheme}://doc-{int(i):08d}"
             for i in b.column("doc_id").to_pylist()], pa.string())})

    return _documents(sf_dir).map_batches(to_refs, batch_format="pyarrow")


def _media_frame_samples(sf_dir: str):
    """Video frame sampling: real CTVF container decode per clip."""
    from ctdray.stages.multimodal import sample_frames_task

    return (_media_refs(sf_dir, "vid")
            .map_batches(sample_frames_task, batch_format="pyarrow",
                         batch_size=16)
            .select_columns(["media_ref", "frame_idx", "frame_h", "frame_w"]))


def _media_audio_features(sf_dir: str):
    """Audio feature extraction: real WAV decode + rFFT band energies."""
    from ctdray.stages.multimodal import audio_features_task

    return (_media_refs(sf_dir, "aud")
            .map_batches(audio_features_task, batch_format="pyarrow",
                         batch_size=16)
            .select_columns(["media_ref", "n_windows"]))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- extraction (model-driven; pytest oracle, rows-only here) ---
        "extract_flat_spans": lambda sf: __import__(
            "ctdray.pipelines.extract", fromlist=["interleaved_extraction"])
            .interleaved_extraction(sf),
        "extract_detected_spans": lambda sf: build_detected_spans(read_interleaved_docs(sf)),
        # Split (prod GPU) detect layout on the surrogate backend — same
        # span contract as the fused path (tests/test_split_mode.py); here
        # so the driver exercises the infer→tensor-rows→postprocess plumbing
        # end-to-end at sf scale.
        "extract_detected_spans_split": lambda sf: build_detected_spans(
            read_interleaved_docs(sf),
            __import__("ctdray.config", fromlist=["PipelineConfig"])
            .PipelineConfig(detect_layout="split", half_maps=True)),
        "extract_blocks": _blocks_flat,
        "extract_refined_masks": _refined_masks_summary,
        "extract_refine_resume": _refine_resume_summary,
        "media_thumbnails": _media_thumbnails,
        "media_probe_dims": _media_probe_dims,
        "media_frame_samples": _media_frame_samples,
        "media_audio_features": _media_audio_features,
        "detection_quality": lambda sf: __import__("ctdray.eval", fromlist=["detection_quality"])
            .detection_quality(read_interleaved_docs(sf)),
        # --- text analysis (SQL-oracled) ---
        "doc_token_count": lambda sf: _documents(sf).map_batches(
            token_count_batch, batch_format="pyarrow"),
        "doc_bpe_token_count": lambda sf: _documents(sf).map_batches(
            __import__("ctdray.functions.text",
                       fromlist=["bpe_token_count_batch"])
            .bpe_token_count_batch, batch_format="pyarrow"),
        "doc_text_stats": lambda sf: _documents(sf).map_batches(
            text_stats_batch, batch_format="pyarrow"),
        "doc_fingerprint": lambda sf: _documents(sf).map_batches(
            fingerprint_batch, batch_format="pyarrow"),
        "doc_rolling_fingerprint": lambda sf: _documents(sf).map_batches(
            rolling_fingerprint_batch, batch_format="pyarrow"),
        "doc_langid": lambda sf: _documents(sf).map_batches(
            langid_batch, batch_format="pyarrow"),
        "doc_quality_filter": lambda sf: _documents(sf).map_batches(
            quality_filter_batch, batch_format="pyarrow")
            .select_columns(["doc_id", "text"]),
        "doc_sample_16th": lambda sf: _documents(sf).map_batches(
            deterministic_sample_batch, batch_format="pyarrow")
            .select_columns(["doc_id", "text"]),
        "top_tokens": top_tokens,
        "top_bigrams": top_bigrams,
        "token_countmin": token_countmin,
        "doc_top_terms": doc_top_terms,
        "docs_stratified_sample": docs_stratified_sample,
        "docs_by_lang": lambda sf: partial_aggregate(
            _documents_full(sf).map_batches(
                lambda b: pa.table({
                    "lang": b.column("lang"),
                    "n_chars": b.column("n_chars"),
                    "one": pa.array(np.ones(len(b), dtype=np.int64))}),
                batch_format="pyarrow"),
            ["lang"],
            [("one", "sum", "n_docs"), ("n_chars", "sum", "total_chars")]),
        # --- dedup ---
        "dedup_exact": lambda sf: exact_dedup(_documents(sf))
            .select_columns(["doc_id", "text"]),
        "dedup_token_set": lambda sf: token_set_dedup(_documents(sf))
            .select_columns(["doc_id", "text"]),
        "dedup_simhash": lambda sf: simhash_dedup(_documents(sf))
            .select_columns(["doc_id", "text"]),
        "dedup_simhash_near": lambda sf: simhash_near_dedup(_documents(sf))
            .select_columns(["doc_id", "text"]),
        "dedup_minhash_lsh": lambda sf: minhash_lsh_dedup(_documents(sf)),
        "dedup_chunk_scrub": lambda sf: frequent_chunk_scrub(_documents(sf)),
        "dedup_clusters": lambda sf: dedup_clusters(_documents(sf)),
        "dedup_ngram_jaccard": lambda sf: ngram_jaccard_dedup(_documents(sf)),
        "dedup_embedding": lambda sf: embedding_near_dedup(_embeddings(sf))
            .select_columns(["vec_id", "label"]),
        "dedup_incremental": lambda sf: incremental_dedup(
            _documents(sf).map_batches(
                lambda b: b.append_column("is_new", pa.compute.cast(
                    pa.compute.bit_wise_and(b.column("doc_id"), 1),
                    pa.int32())),
                batch_format="pyarrow")),
        # --- similarity search ---
        "knn_bruteforce": lambda sf: knn_bruteforce(
            _embeddings(sf), *_query_vectors(sf), k=10),
        "knn_lsh": lambda sf: knn_lsh(_embeddings(sf), *_query_vectors(sf), k=10),
        # full-probe variants: exact BY CONSTRUCTION (every list/bucket
        # probed), so the driver value-verifies the partition/assign/scan
        # machinery loses or duplicates no vector; the approximate defaults
        # above stay pytest-verified via recall floors.
        "knn_ivf_fullprobe": lambda sf: knn_ivf(
            _embeddings(sf), *_query_vectors(sf), k=10,
            n_lists=8, n_probe=8),
        "knn_lsh_allbuckets": lambda sf: knn_lsh(
            _embeddings(sf), *_query_vectors(sf), k=10,
            n_planes=6, probe_hamming=6, n_tables=1),
        "knn_ivf": lambda sf: knn_ivf(_embeddings(sf), *_query_vectors(sf), k=10),
        "cosine_range_search": lambda sf: cosine_range_search(
            _embeddings(sf), *_query_vectors(sf), threshold=0.2),
        # --- relational / windowed ---
        "q1_pricing_summary": lineitem_pricing_summary,
        "top10_customers": top_customers_by_orders,
        "top_orders_per_customer": top_orders_per_customer,
        "orders_by_nation": orders_by_nation,
        "events_hourly": events_hourly,
        "sessionize_events": sessionize_events,
        "part_type_stats": part_type_stats,
        "shipped_1995_by_flag": shipped_1995_by_flag,
        "supplier_stats_by_nation": supplier_stats_by_nation,
        "orders_monthly_by_priority": orders_monthly_by_priority,
        "orders_by_mktsegment": orders_by_mktsegment,
        "events_sliding_2h": events_sliding_2h,
        "daily_distinct_users": daily_distinct_users,
        "events_asof_last_view": asof_last_event,
        "events_rollup": events_rollup,
        "daily_users_hll": daily_users_hll,
        "viewers_not_purchasers": viewers_not_purchasers,
        "events_daily_pivot": events_daily_pivot,
        "events_interval_join_60s": interval_count_join,
        "local_supplier_volume": local_supplier_volume,
        "lineitem_price_quantiles": lambda sf: exact_quantiles(
            _lineitem_price(sf), "l_extendedprice", collect_cap=10_000),
        "customer_urgent_order_counts": customer_urgent_order_counts,
        "user_event_gaps": user_event_gaps,
        "event_funnel_24h": event_funnel,
        "bloom_semi_volume": bloom_semi_volume,
        "token_postings": token_postings,
        "user_record_events": user_record_events,
        "events_json_k_stats": events_json_k_stats,
        "orders_cube": orders_cube,
        "user_best_event": user_best_event,
        "cohort_retention": cohort_retention,
        "lang_char_trigrams": lang_char_trigrams,
        "frequent_token_pairs": frequent_token_pairs,
        "order_status_transitions": order_status_transitions,
        "doc_length_histogram": doc_length_histogram,
        "doc_repetition_stats": doc_repetition_stats,
        "small_qty_part_revenue": small_qty_part_revenue,
        "bm25_top_docs": bm25_top_docs,
        "user_value_trend": user_value_trend,
        "doc_normalize": lambda sf: _documents(sf).map_batches(
            __import__("ctdray.functions.text",
                       fromlist=["normalize_batch"]).normalize_batch,
            batch_format="pyarrow"),
        "views_purchases_full": views_purchases_full,
        "daily_revenue_moving7": daily_revenue_moving7,
        "global_event_rank": global_event_rank,
        "user_top_event_type": user_top_event_type,
        "heavy_hitter_tokens": heavy_hitter_tokens,
        "price_quartile_volumes": price_quartile_volumes,
        "session_duration_stats": session_duration_stats,
        "token_offset_packing": token_offset_packing,
        "decontaminate_5gram": decontaminate_5gram,
        "user_outlier_events": user_outlier_events,
        "rolling_7d_active_users": rolling_7d_active_users,
        "users_per_event_type": users_per_event_type,
        "token_typo_pairs": token_typo_pairs,
        "nation_revenue_share_ppm": nation_revenue_share_ppm,
        "region_priority_matrix": region_priority_matrix,
        "selfjoin_cardinality_by_part": selfjoin_cardinality_by_part,
        "source_quality_stats": source_quality_stats,
        "lineitem_orphans": lineitem_orphans,
        "daily_order_counts_dense": daily_order_counts_dense,
        "part_metrics_unpivot": part_metrics_unpivot,
        "user_path_prefixes": user_path_prefixes,
        "q3_shipping_priority": q3_shipping_priority,
        "late_ship_priority_counts": late_ship_priority_counts,
        "event_dedup_60s": event_dedup_60s,
        "q14_promo_revenue_ppm": q14_promo_revenue_ppm,
        "user_value_quartiles": user_value_quartiles,
        "major_parts_by_revenue": major_parts_by_revenue,
        "embedding_norm_stats_by_label": embedding_norm_stats_by_label,
        "lang_confusion_matrix": lang_confusion_matrix,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "idle_customers_by_nation": idle_customers_by_nation,
        "event_type_jaccard": event_type_jaccard,
        "docs_weighted_sample": docs_weighted_sample,
        "doc_length_deciles": doc_length_deciles,
        "docs_with_hapax": docs_with_hapax,
        "bilateral_trade_volume": bilateral_trade_volume,
        "customer_order_gap_median": customer_order_gap_median,
        "daily_revenue_delta": daily_revenue_delta,
        "cheapest_supplier_per_part": cheapest_supplier_per_part,
        "q10_returned_revenue": q10_returned_revenue,
        "order_count_distribution": order_count_distribution,
        "q18_large_orders": q18_large_orders,
        "q8_market_share": q8_market_share,
        "chunk_dedup_stats": chunk_dedup_stats,
        "label_centroid_dots": label_centroid_dots,
        "q21_last_ship_supplier": q21_last_ship_supplier,
        "docs_matching_all_terms": docs_matching_all_terms,
        "value_mad_by_event_type": value_mad_by_event_type,
        "cross_source_dup_docs": cross_source_dup_docs,
        "user_value_1h_window": user_value_1h_window,
        "region_nation_rollup": region_nation_rollup,
        "top_chunk_overlap_pairs": top_chunk_overlap_pairs,
        "time_rollup_multigrain": time_rollup_multigrain,
        "pareto_customer_cutoff": pareto_customer_cutoff,
        "events_dow_hour_share": events_dow_hour_share,
        "session_type_pairs": session_type_pairs,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q9_profit_by_nation_year": q9_profit_by_nation_year,
        "q15_top_supplier": q15_top_supplier,
        "q20_dominant_suppliers": q20_dominant_suppliers,
        "q12_late_lines_by_priority": q12_late_lines_by_priority,
        "q16_supplier_variety": q16_supplier_variety,
        "doc_token_commonness": doc_token_commonness,
        "user_ping_pong_transitions": user_ping_pong_transitions,
        "doc_chunks_sliding": doc_chunks_sliding,
        "tokens_in_all_langs": tokens_in_all_langs,
        "customer_rfm_scores": customer_rfm_scores,
        "value_decile_matrix": value_decile_matrix,
        "user_active_day_streaks": user_active_day_streaks,
        "mutual_top_partner_nations": mutual_top_partner_nations,
        "embedding_quantize_int8": embedding_quantize_int8,
        "daily_new_vs_returning": daily_new_vs_returning,
        "lang_balanced_sample": lang_balanced_sample,
        "coordered_part_pairs": coordered_part_pairs,
        "dim_correlation_topk": dim_correlation_topk,
        "part_graph_bfs": part_graph_bfs,
        "ngram_novelty_ratio": ngram_novelty_ratio,
        "fulfillment_lag_histogram": fulfillment_lag_histogram,
        "user_top_value_share": user_top_value_share,
        "nation_supplier_hhi": nation_supplier_hhi,
        "user_activity_bitmask": user_activity_bitmask,
        "part_skyline": part_skyline,
        "customers_all_priorities": customers_all_priorities,
        "part_price_band_pairs": part_price_band_pairs,
        "weighted_median_price": weighted_median_price,
        "user_type_signature": user_type_signature,
        "orders_above_group_median": orders_above_group_median,
        "dedup_keep_longest": dedup_keep_longest,
        "customer_status_asof": customer_status_asof,
        "doc_char_class_profile": doc_char_class_profile,
        "value_first_digit_hist": value_first_digit_hist,
        "monthly_revenue_growth_ppm": monthly_revenue_growth_ppm,
        "part_supplier_degree_hist": part_supplier_degree_hist,
        "top_tokens_per_lang": top_tokens_per_lang,
        "parts_never_ordered": parts_never_ordered,
        "event_round_value_bias": event_round_value_bias,
        "token_length_hist": token_length_hist,
        "part_triangle_count": part_triangle_count,
        "token_first_seen_hist": token_first_seen_hist,
        "doc_intra_repeat_positions": doc_intra_repeat_positions,
        "orders_open_per_day": orders_open_per_day,
        "knn_label_vote": knn_label_vote,
        "user_burst_max_5min": user_burst_max_5min,
        "repeat_purchase_stats": repeat_purchase_stats,
        "dup_cluster_size_hist": dup_cluster_size_hist,
        "supplier_revenue_pctile": supplier_revenue_pctile,
        "lang_source_lift": lang_source_lift,
        "token_pair_lift_topk": token_pair_lift_topk,
        "session_bounce_stats": session_bounce_stats,
        "events_peak_hour_per_type": events_peak_hour_per_type,
        "revenue_abc_classification": revenue_abc_classification,
        "trimmed_price_sum": trimmed_price_sum,
        "supplier_first_month_cohort": supplier_first_month_cohort,
        "order_total_consistency": order_total_consistency,
        "lineitem_linenumber_gaps": lineitem_linenumber_gaps,
        "embedding_norm_outlier_ids": embedding_norm_outlier_ids,
        "order_value_concentration_hist": order_value_concentration_hist,
        "doc_hash_shard_balance": doc_hash_shard_balance,
        "docs_with_phrase": docs_with_phrase,
        "top_revenue_day_per_nation": top_revenue_day_per_nation,
        "lineitem_quantity_mode": lineitem_quantity_mode,
        "part_revenue_gini_ppm": part_revenue_gini_ppm,
        "customer_year_overlap_matrix": customer_year_overlap_matrix,
        "view_to_purchase_lag_hist": view_to_purchase_lag_hist,
        "token_zipf_ranks": token_zipf_ranks,
        "supplier_quadrant_counts": supplier_quadrant_counts,
        "doc_ttr_ppm": doc_ttr_ppm,
        "user_value_milestone": user_value_milestone,
        "part_name_bigram_topk": part_name_bigram_topk,
        "user_second_event_type_dist": user_second_event_type_dist,
        "user_longest_increasing_run": user_longest_increasing_run,
        "order_seasonality_index": order_seasonality_index,
        "embedding_dim_range": embedding_dim_range,
        "doc_top_token": doc_top_token,
        "label_peak_dim": label_peak_dim,
        "docs_term_first_pos": docs_term_first_pos,
        "discount_tax_joint_hist": discount_tax_joint_hist,
        "customer_value_trend_counts": customer_value_trend_counts,
        "parts_multi_nation": parts_multi_nation,
        "top_value_events": top_value_events,
        "event_weekend_share_ppm": event_weekend_share_ppm,
        "global_event_gap_topk": global_event_gap_topk,
        "source_vocab_jaccard": source_vocab_jaccard,
        "nation_cr4_ppm": nation_cr4_ppm,
        "parts_above_brand_mean": parts_above_brand_mean,
        "weekly_stickiness_ppm": weekly_stickiness_ppm,
        "supplier_exclusive_parts": supplier_exclusive_parts,
        "event_type_share_volatility": event_type_share_volatility,
        "price_last_digit_hist": price_last_digit_hist,
        "user_resurrection_counts": user_resurrection_counts,
        "doc_first_token_dist": doc_first_token_dist,
        "order_ship_span_hist": order_ship_span_hist,
        "user_type_loyalty": user_type_loyalty,
        "supplier_active_months": supplier_active_months,
        "token_cooccurrence_degree": token_cooccurrence_degree,
        "preferred_order_dow_dist": preferred_order_dow_dist,
        "doc_adjacent_repeat_counts": doc_adjacent_repeat_counts,
        "nation_customer_reach": nation_customer_reach,
        "top_order_value_jumps": top_order_value_jumps,
        "event_minute_hist": event_minute_hist,
        "user_weekend_ratio_hist": user_weekend_ratio_hist,
        "source_dup_stats": source_dup_stats,
        "user_hour_bitmask": user_hour_bitmask,
        "part_name_collisions": part_name_collisions,
        "referential_integrity_audit": referential_integrity_audit,
        "embedding_dim_sign_balance": embedding_dim_sign_balance,
        "avg_token_len_by_lang": avg_token_len_by_lang,
        "user_type_run_counts": user_type_run_counts,
        "pagerank_nation_trade": pagerank_nation_trade,
        "brand_name_lcp": brand_name_lcp,
        "embedding_top2_dims": embedding_top2_dims,
        "views_except_all_purchases": views_except_all_purchases,
        "pretrain_pipeline_docs": pretrain_pipeline_docs,
        "user_type_gini_ppm": user_type_gini_ppm,
        "global_gap_median_us": global_gap_median_us,
        "user_event_id_inversions": user_event_id_inversions,
        "doc_longest_token": doc_longest_token,
        "top_token_context_diversity": top_token_context_diversity,
        "customer_balance_peers": customer_balance_peers,
        "source_exclusive_vocab": source_exclusive_vocab,
        "session_conversion_ppm": session_conversion_ppm,
        "daily_revenue_interpolated": daily_revenue_interpolated,
        "events_rate_limited": events_rate_limited,
        "order_first_ship_lag_hist": order_first_ship_lag_hist,
        "user_late_events": user_late_events,
        "event_type_daily_dominance": event_type_daily_dominance,
        "lineitem_table_checksum": lineitem_table_checksum,
        "cust_supp_balance_matches": cust_supp_balance_matches,
        "embedding_dim_variance": embedding_dim_variance,
        "dau_overlap_jaccard": dau_overlap_jaccard,
        "join_size_estimate": join_size_estimate,
        "event_value_log2_hist": event_value_log2_hist,
        "shipdate_zonemap_overlap": shipdate_zonemap_overlap,
        "source_weighted_jaccard": source_weighted_jaccard,
        "qty_discount_cov_by_flag": qty_discount_cov_by_flag,
        "priority_dow_independence": priority_dow_independence,
        "same_month_ship_share_by_year": same_month_ship_share_by_year,
        "priority_value_drift_l1": priority_value_drift_l1,
        "quantity_ks_between_flags": quantity_ks_between_flags,
        "dedup_survivorship_stats": dedup_survivorship_stats,
        "diversified_top_orders": diversified_top_orders,
        "coorder_degree_assortativity": coorder_degree_assortativity,
        "fingerprint_collision_audit": fingerprint_collision_audit,
        "brand_rank_churn": brand_rank_churn,
        "events_hourly_ohlc": events_hourly_ohlc,
        "user_daily_twap": user_daily_twap,
        "order_overlap_pairs_per_customer": order_overlap_pairs_per_customer,
        "supplier_borda_top10": supplier_borda_top10,
        "same_customer_yoy_delta": same_customer_yoy_delta,
        "type_coburst_hours": type_coburst_hours,
        "revenue_sigma_outlier_days": revenue_sigma_outlier_days,
        "view_purchase_within3_events": view_purchase_within3_events,
        "embedding_power_iteration": embedding_power_iteration,
        "top_customer_part_drilldown": top_customer_part_drilldown,
        "consistent_hash_move_audit": consistent_hash_move_audit,
        "part_name_levenshtein_pairs": part_name_levenshtein_pairs,
        "lineitem_profile": lineitem_profile,
        "purchase_position_in_session": purchase_position_in_session,
        "priority_lag_quantiles": priority_lag_quantiles,
        "customer_name_key_audit": customer_name_key_audit,
        "event_id_density_audit": event_id_density_audit,
        "customer_status_sequence_signatures":
            customer_status_sequence_signatures,
        "customer_giant_orders": customer_giant_orders,
        "vocab_coverage_curve": vocab_coverage_curve,
        "arrival_dispersion_by_type": arrival_dispersion_by_type,
        "token_burstiness_top10": token_burstiness_top10,
        "part_staleness_tiers": part_staleness_tiers,
        "daily_peak_3h_window": daily_peak_3h_window,
        "type_pair_lag_xcorr": type_pair_lag_xcorr,
        "brand_revenue_anova": brand_revenue_anova,
        "user_value_ewma2": user_value_ewma2,
        "revenue_growth_accounting": revenue_growth_accounting,
        "order_total_allocation": order_total_allocation,
        "quality_pass_by_length_decile": quality_pass_by_length_decile,
        "revenue_changepoint_day": revenue_changepoint_day,
        "orders_fiscal_445_counts": orders_fiscal_445_counts,
        "sampled_topk_fidelity": sampled_topk_fidelity,
        "user_decayed_value": user_decayed_value,
        "daily_revenue_kmeans2": daily_revenue_kmeans2,
        "token_anagram_groups": token_anagram_groups,
        "session_handoff_matrix": session_handoff_matrix,
        "domestic_supply_share": domestic_supply_share,
        "dataset_split_manifest": dataset_split_manifest,
        "lineitem_sync_manifest": lineitem_sync_manifest,
        "session_count_sweep": session_count_sweep,
        "customer_supplier_diversity_hist":
            customer_supplier_diversity_hist,
        "corpus_lang_run_count": corpus_lang_run_count,
        "order_ship_atomicity": order_ship_atomicity,
        "purchase_attribution_models": purchase_attribution_models,
        "cumulative_unique_users": cumulative_unique_users,
        "brand_return_rate_top10": brand_return_rate_top10,
        "join_size_bucket_estimate": join_size_bucket_estimate,
        "customer_lorenz_curve": customer_lorenz_curve,
        "order_line_concentration_hist": order_line_concentration_hist,
        "revenue_multiscale_variance": revenue_multiscale_variance,
        "rapid_event_share": rapid_event_share,
        "revenue_up_down_streaks": revenue_up_down_streaks,
        "brand_size_grid_sparsity": brand_size_grid_sparsity,
        "transition_time_matrix": transition_time_matrix,
        "hierarchy_share_report": hierarchy_share_report,
        "month_end_revenue_share": month_end_revenue_share,
        "user_staleness_hist": user_staleness_hist,
        "unit_price_deviation_hist": unit_price_deviation_hist,
        "brand_price_gap_hist": brand_price_gap_hist,
        "users_business_hours_share": users_business_hours_share,
        "priority_habit_consistency": priority_habit_consistency,
        "customer_rank_spearman_d2": customer_rank_spearman_d2,
        "activation_gap_median_days": activation_gap_median_days,
        "orderkey_fragmentation": orderkey_fragmentation,
        "quality_filter_ablation": quality_filter_ablation,
        "bpe_overhead_by_lang": bpe_overhead_by_lang,
        "label_centroid_distance_matrix": label_centroid_distance_matrix,
        "user_day_density_ppm": user_day_density_ppm,
        "salted_top_user": salted_top_user,
        "kmv_intersection_estimate": kmv_intersection_estimate,
        "token_position_diversity": token_position_diversity,
        "coorder_clustering_coefficient": coorder_clustering_coefficient,
        "early_value_share_hist": early_value_share_hist,
        "popularity_rec_hit_at10": popularity_rec_hit_at10,
        "order_rolling_rank_counts": order_rolling_rank_counts,
        "hourly_hotuser_share_hist": hourly_hotuser_share_hist,
        "doc_half_jaccard_hist": doc_half_jaccard_hist,
        "zorder_locality_audit": zorder_locality_audit,
        "lang_hapax_tail_mass": lang_hapax_tail_mass,
        "value_split_retention": value_split_retention,
        "priority_multiline_share": priority_multiline_share,
        "props_k_value_cov": props_k_value_cov,
        "same_day_repeat_buyers": same_day_repeat_buyers,
        "repdigit_value_audit": repdigit_value_audit,
        "alert_2of3_low_days": alert_2of3_low_days,
        "boilerplate_prefix_docs": boilerplate_prefix_docs,
        "segment_staleness_matrix": segment_staleness_matrix,
        "coorder_largest_component": coorder_largest_component,
        "core_vocab_mass_ppm": core_vocab_mass_ppm,
        "duplicate_order_suspects": duplicate_order_suspects,
        "monthly_value_p90": monthly_value_p90,
        "intermittent_parts": intermittent_parts,
        "customer_top2_gap_hist": customer_top2_gap_hist,
        "price_fd_violations": price_fd_violations,
        "nation_median_of_customer_medians":
            nation_median_of_customer_medians,
        "frequent_part_triples": frequent_part_triples,
        "user_value_temporal_spearman": user_value_temporal_spearman,
        "stream_outage_audit": stream_outage_audit,
        "purchase_hazard_table": purchase_hazard_table,
        "score_calibration_lift": score_calibration_lift,
        "unattributed_purchase_share": unattributed_purchase_share,
        "nation_dow_mix_l1": nation_dow_mix_l1,
        "session_3step_funnel": session_3step_funnel,
        "corpus_simpson_index": corpus_simpson_index,
        "supplier_share_movers": supplier_share_movers,
        "popular_part_antipairs": popular_part_antipairs,
        "discount_ladder": discount_ladder,
        "lang_length_mix_l1": lang_length_mix_l1,
        "first_event_purchase_share": first_event_purchase_share,
        "part_reorder_gap_hist": part_reorder_gap_hist,
        "token_lifetime_hist": token_lifetime_hist,
        "value_nextgap_cov": value_nextgap_cov,
        "nation_entity_balance": nation_entity_balance,
        "session_position_type_matrix": session_position_type_matrix,
        "brand_activation_rate": brand_activation_rate,
        "value_granularity_audit": value_granularity_audit,
        "session_size_hist": session_size_hist,
        "order_dup_part_lines": order_dup_part_lines,
        "customer_kanonymity_audit": customer_kanonymity_audit,
        "price_percentile_ranks": price_percentile_ranks,
        "event_type_trigrams": event_type_trigrams,
        "order_priority_escalation": order_priority_escalation,
        "nation_segment_lift": nation_segment_lift,
        "customer_part_diversity_hist": customer_part_diversity_hist,
        "user_first_last_matrix": user_first_last_matrix,
        "token_df_hist": token_df_hist,
        "supplier_part_jaccard_topk": supplier_part_jaccard_topk,
        "embedding_signbucket_hist": embedding_signbucket_hist,
        "sentence_len_hist": sentence_len_hist,
        "daily_type_mix_l1": daily_type_mix_l1,
        "customer_rrf_top10": customer_rrf_top10,
        "coorder_kcore_peel": coorder_kcore_peel,
        "order_fulfill_30d_share_by_month": order_fulfill_30d_share_by_month,
        "supplier_leadtime_variance_topk": supplier_leadtime_variance_topk,
        "q4_late_order_share": q4_late_order_share,
        "q22_sales_opportunity": q22_sales_opportunity,
        "supplier_customer_concentration_hist":
            supplier_customer_concentration_hist,
        "daily_count_autocorr": daily_count_autocorr,
        "region_trade_matrix": region_trade_matrix,
        "part_supplier_price_spread_hist": part_supplier_price_spread_hist,
        "first_line_dominance_ppm": first_line_dominance_ppm,
        "source_ttr_ppm": source_ttr_ppm,
        "distinct_users_multigrain": distinct_users_multigrain,
        "user_modal_type_churn": user_modal_type_churn,
        "label_inertia_moments": label_inertia_moments,
        "event_dow_value_share": event_dow_value_share,
        "monthly_new_customer_revenue_share":
            monthly_new_customer_revenue_share,
        "orderkey_range_partition_plan": orderkey_range_partition_plan,
        "part_margin_below_retail": part_margin_below_retail,
        "second_order_within30_ppm": second_order_within30_ppm,
        "stopword_share_by_source": stopword_share_by_source,
        "dup_shingles_topk": dup_shingles_topk,
        "brand_size_price_inversions": brand_size_price_inversions,
        "region_parttype_lift": region_parttype_lift,
        "segment_basket_size_matrix": segment_basket_size_matrix,
        "session_size_duration_cov": session_size_duration_cov,
        "doc_max_token_run_topk": doc_max_token_run_topk,
        "doc_pack_plan_by_bucket": doc_pack_plan_by_bucket,
        "q6_grid_sweep": q6_grid_sweep,
        "orderkey_date_sortedness": orderkey_date_sortedness,
        "props_k_quartiles_by_type": props_k_quartiles_by_type,
        "users_active_all_weeks": users_active_all_weeks,
        "daily_whale_share_hist": daily_whale_share_hist,
        "single_supplier_order_ppm": single_supplier_order_ppm,
        "customer_tenure_years_hist": customer_tenure_years_hist,
        "lapsed_customers_sweep": lapsed_customers_sweep,
        "part_name_token_set_dups": part_name_token_set_dups,
        "coorder_edge_weight_hist": coorder_edge_weight_hist,
        "order_ship_month_matrix": order_ship_month_matrix,
        "customer_quarter_density_hist": customer_quarter_density_hist,
        "parts_ordered_all_years": parts_ordered_all_years,
        "purchase_nearest_view_gap_hist": purchase_nearest_view_gap_hist,
        "part_price_runnerup_gap_hist": part_price_runnerup_gap_hist,
        "nation_acctbal_profile": nation_acctbal_profile,
        "nearest_centroid_confusion": nearest_centroid_confusion,
        "customer_brand_loyalty_hist": customer_brand_loyalty_hist,
        "token_suffix_diversity": token_suffix_diversity,
        "signbucket_label_purity": signbucket_label_purity,
        "quantity_mannwhitney_u2": quantity_mannwhitney_u2,
        "brand_discount_subsidy_ppm": brand_discount_subsidy_ppm,
        "event_arrival_lateness_hist": event_arrival_lateness_hist,
        "customer_acctbal_sign_by_segment":
            customer_acctbal_sign_by_segment,
        "purchase_priorviews_cov": purchase_priorviews_cov,
        "brand_size_rollup": brand_size_rollup,
        "error_recovery_minutes_hist": error_recovery_minutes_hist,
        "linenumber_quantity_profile": linenumber_quantity_profile,
        "fingerprint_density_hist": fingerprint_density_hist,
        "first_order_ltv_cov": first_order_ltv_cov,
        "user_spend_spread_hist": user_spend_spread_hist,
        "doc_prefix_dup_hist": doc_prefix_dup_hist,
        "nation_acctbal_mad": nation_acctbal_mad,
        "daily_revenue_streak_hist": daily_revenue_streak_hist,
        "customer_spend_halves_matrix": customer_spend_halves_matrix,
        "bigram_asymmetry_topk": bigram_asymmetry_topk,
        "sorted_neighborhood_pair_hist": sorted_neighborhood_pair_hist,
        "unitprice_divisibility_audit": unitprice_divisibility_audit,
        "order_shipdate_monotonicity": order_shipdate_monotonicity,
        "token_length_by_position": token_length_by_position,
        "countmin_sketch_estimates": countmin_sketch_estimates,
        "sample_quota_largest_remainder": sample_quota_largest_remainder,
        "timestamp_delta_varint_audit": timestamp_delta_varint_audit,
        "error_burst_hour_hist": error_burst_hour_hist,
        "user_type_simpson_hist": user_type_simpson_hist,
        "shuffle_skew_audit": shuffle_skew_audit,
        "doc_alpha_order_share_hist": doc_alpha_order_share_hist,
        "discount_tax_net_grid": discount_tax_net_grid,
        "events_orders_daily_cov": events_orders_daily_cov,
        "centroid_margin_hist": centroid_margin_hist,
        "nation_supplier_hhi_ppm": nation_supplier_hhi_ppm,
        "purchase_dow_hour_heatmap": purchase_dow_hour_heatmap,
        "order_total_reconciliation": order_total_reconciliation,
        "intersession_gap_hist": intersession_gap_hist,
        "doc_ttr_hist": doc_ttr_hist,
        "order_topline_share_hist": order_topline_share_hist,
        "coorder_pagerank2": coorder_pagerank2,
        "embedding_dim_cov_sign_census": embedding_dim_cov_sign_census,
        "monthly_yoy_sign_matrix": monthly_yoy_sign_matrix,
        "supplier_distinct_orders_hist": supplier_distinct_orders_hist,
        "coorder_minlabel_rounds": coorder_minlabel_rounds,
        "pps_systematic_sample_audit": pps_systematic_sample_audit,
        "order_width_transition_matrix": order_width_transition_matrix,
        "doc_internal_shingle_repeats": doc_internal_shingle_repeats,
        "greedy_vocab_cover": greedy_vocab_cover,
        "doc_toklen_lag_sign_census": doc_toklen_lag_sign_census,
        "kendall_width_price": kendall_width_price,
        "order_price_ratio_pairs_hist": order_price_ratio_pairs_hist,
        "ams_f2_sketch_audit": ams_f2_sketch_audit,
        "daily_revenue_next_higher_wait": daily_revenue_next_higher_wait,
        "supplier_ship_interval_coverage": supplier_ship_interval_coverage,
        "rle_chunk_encoding_audit": rle_chunk_encoding_audit,
        "split_leakage_audit": split_leakage_audit,
        "coorder_heaviest_edge_hooking": coorder_heaviest_edge_hooking,
        "doc_repeat_mass_log2": doc_repeat_mass_log2,
        "daily_revenue_extrema_census": daily_revenue_extrema_census,
        "histogram_quantile_audit": histogram_quantile_audit,
        "token_trie_level_widths": token_trie_level_widths,
        "daily_revenue_gorilla_audit": daily_revenue_gorilla_audit,
        "dow_detrend_sign_census": dow_detrend_sign_census,
        "daily_peak_concurrent_sessions": daily_peak_concurrent_sessions,
        "price_firstdigit_two_sample": price_firstdigit_two_sample,
        "iblt_difference_cells": iblt_difference_cells,
        "hash_bit_balance_audit": hash_bit_balance_audit,
        "coorder_percolation_curve": coorder_percolation_curve,
        "vocab_adjacent_lcp_profile": vocab_adjacent_lcp_profile,
        "daily_revenue_haar_energy": daily_revenue_haar_energy,
        "dow_rank_occupancy_matrix": dow_rank_occupancy_matrix,
        "price_interpolation_error_hist":
            price_interpolation_error_hist,
        "cdc_chunk_length_hist": cdc_chunk_length_hist,
        "partkey_bag_algebra_years": partkey_bag_algebra_years,
        "source_doclen_ks_matrix": source_doclen_ks_matrix,
        "embedding_adjacent_dot_hist": embedding_adjacent_dot_hist,
        "coorder_hub_common_neighbors": coorder_hub_common_neighbors,
        "order_subset_containment": order_subset_containment,
        "doc_alphabet_size_hist": doc_alphabet_size_hist,
        "order_date_inversions": order_date_inversions,
        "orders_vs_lines_qq_table": orders_vs_lines_qq_table,
        "user_replay_checksum_hist": user_replay_checksum_hist,
        "expensive_line_ships_last": expensive_line_ships_last,
        "lww_compaction_by_type": lww_compaction_by_type,
        "orders_count_revenue_best_lag": orders_count_revenue_best_lag,
        "join_salt_plan": join_salt_plan,
        "hub_pair_path_census": hub_pair_path_census,
        "coorder_edge_churn_by_year": coorder_edge_churn_by_year,
        "deletion_vector_plan": deletion_vector_plan,
        "type_quiet_window": type_quiet_window,
        "type_mix_changepoint": type_mix_changepoint,
        "cluster_sample_estimator_audit": cluster_sample_estimator_audit,
        "selectivity_independence_audit": selectivity_independence_audit,
        "kmv_monthly_distinct_audit": kmv_monthly_distinct_audit,
        "revenue_sign_motif_census": revenue_sign_motif_census,
        "merkle_anti_entropy_audit": merkle_anti_entropy_audit,
        "roaring_container_census": roaring_container_census,
        "grace_hash_recursion_plan": grace_hash_recursion_plan,
        "bloom_skip_index_audit": bloom_skip_index_audit,
        "theilsen_slope_ppm_hist": theilsen_slope_ppm_hist,
        "chao1_distinct_estimator": chao1_distinct_estimator,
        "ta_topk_stop_depth": ta_topk_stop_depth,
        "pq2_block_assignment_census": pq2_block_assignment_census,
        "dict_encoding_planner": dict_encoding_planner,
        "checkpoint_cadence_plan": checkpoint_cadence_plan,
        "samplesort_splitter_audit": samplesort_splitter_audit,
        "median_of_medians_rank_audit": median_of_medians_rank_audit,
        "vocab_growth_checkpoints": vocab_growth_checkpoints,
        "bitsliced_sum_audit": bitsliced_sum_audit,
        "hash_table_probe_cost_sweep": hash_table_probe_cost_sweep,
        "cuckoo_choice_load_audit": cuckoo_choice_load_audit,
        "seasonal_naive_backtest": seasonal_naive_backtest,
        "knn1_hubness_hist": knn1_hubness_hist,
        "cascade_delete_impact": cascade_delete_impact,
        "sort_layout_pruning_audit": sort_layout_pruning_audit,
        "rounding_policy_divergence_census":
            rounding_policy_divergence_census,
        "skiplist_level_census": skiplist_level_census,
        "bpe_first_merge_audit": bpe_first_merge_audit,
        "rice_parameter_selection": rice_parameter_selection,
        "feistel_shuffle_audit": feistel_shuffle_audit,
        "topk_overlap_curve": topk_overlap_curve,
        "weighted_bottomk_sample": weighted_bottomk_sample,
        "natural_sort_run_census": natural_sort_run_census,
        "art_node_type_census": art_node_type_census,
        "per_group_uniform_pick_bias": per_group_uniform_pick_bias,
        "list_intersection_cost_audit": list_intersection_cost_audit,
        "sparse_layout_planner": sparse_layout_planner,
        "fd_strength_census": fd_strength_census,
        "ldiversity_audit": ldiversity_audit,
        "voptimal_2bucket_split": voptimal_2bucket_split,
        "mm1_backlog_audit": mm1_backlog_audit,
        "elias_fano_plan": elias_fano_plan,
        "sharded_topk_recall": sharded_topk_recall,
        "rank_block_popcount_plan": rank_block_popcount_plan,
        "value_flatline_run_census": value_flatline_run_census,
        "btree_bulkload_plan": btree_bulkload_plan,
        "external_sort_pass_plan": external_sort_pass_plan,
        "multi_pattern_match_census": multi_pattern_match_census,
        "secretary_rule_audit": secretary_rule_audit,
        "join_order_dp_plan": join_order_dp_plan,
        "linear_counting_audit": linear_counting_audit,
        "countsketch_sign_estimates": countsketch_sign_estimates,
        "dhondt_seat_allocation": dhondt_seat_allocation,
        "int32_overflow_day_census": int32_overflow_day_census,
        "kgram_index_size_planner": kgram_index_size_planner,
        "doc_minimizer_density": doc_minimizer_density,
        "hashagg_spill_planner": hashagg_spill_planner,
        "condorcet_nation_audit": condorcet_nation_audit,
        "for_encoding_chunk_plan": for_encoding_chunk_plan,
        "vocab_tiering_plan": vocab_tiering_plan,
        "lsm_compaction_plan": lsm_compaction_plan,
        "jl_projection_distortion_census":
            jl_projection_distortion_census,
        "luhn_checksum_census": luhn_checksum_census,
        "zipf_mandelbrot_shift_fit": zipf_mandelbrot_shift_fit,
        "dominant_type_run_census": dominant_type_run_census,
        "kleinberg_burst_dp_audit": kleinberg_burst_dp_audit,
        "uuidv7_id_plan_audit": uuidv7_id_plan_audit,
        "pinball_loss_decile_audit": pinball_loss_decile_audit,
        "zstd_dict_sample_coverage": zstd_dict_sample_coverage,
        "graycode_hamming_census": graycode_hamming_census,
        "predicate_order_cost_audit": predicate_order_cost_audit,
        "reorder_point_stockout_census":
            reorder_point_stockout_census,
        "md5_permutation_test": md5_permutation_test,
        "hilbert_vs_zorder_locality": hilbert_vs_zorder_locality,
        "cache_admission_knapsack_plan":
            cache_admission_knapsack_plan,
        "skipgram_window_pairs_topk": skipgram_window_pairs_topk,
        "daily_revenue_max_drawdown": daily_revenue_max_drawdown,
        "buddy_allocation_frag_census": buddy_allocation_frag_census,
        "good_turing_unseen_mass": good_turing_unseen_mass,
        "wsjf_schedule_cost_audit": wsjf_schedule_cost_audit,
        "sign_partition_cut_audit": sign_partition_cut_audit,
        "streaming_centroid_drift": streaming_centroid_drift,
        "customer_order_spree_census": customer_order_spree_census,
        "patricia_compression_census": patricia_compression_census,
        "type_hourweek_cosine_matrix": type_hourweek_cosine_matrix,
        "ts_precision_collision_census":
            ts_precision_collision_census,
        "task_assignment_makespan_audit":
            task_assignment_makespan_audit,
        "drf_dominant_share_top5": drf_dominant_share_top5,
        "edge_block_locality_audit": edge_block_locality_audit,
        "bullwhip_variance_ratio": bullwhip_variance_ratio,
        "assoc_rule_confidence_top5": assoc_rule_confidence_top5,
        "richclub_top8_coefficient": richclub_top8_coefficient,
        "ewma_crossover_signal_census": ewma_crossover_signal_census,
        "aimd_congestion_replay": aimd_congestion_replay,
        "day_boundary_shift_sensitivity":
            day_boundary_shift_sensitivity,
        "embedding_anisotropy_ppm": embedding_anisotropy_ppm,
        "top_value_event_day_concentration":
            top_value_event_day_concentration,
        "waterfill_fair_allocation": waterfill_fair_allocation,
        "rendezvous_hash_balance": rendezvous_hash_balance,
        "quality_length_kappa_ppm": quality_length_kappa_ppm,
        "weekly_fourier_energy": weekly_fourier_energy,
        "bipartite_butterfly_census": bipartite_butterfly_census,
        "mlm_masking_plan_census": mlm_masking_plan_census,
        "order_ship_busday_lag_hist": order_ship_busday_lag_hist,
        "nation_revenue_hoover_ppm": nation_revenue_hoover_ppm,
        "length_rule_pr_curve": length_rule_pr_curve,
        "filter_shapley_attribution": filter_shapley_attribution,
        "segment_priority_tcloseness": segment_priority_tcloseness,
        "quantity_gini_mean_difference": quantity_gini_mean_difference,
        "iso_week_rollover_census": iso_week_rollover_census,
        "laplace_smoothing_rank_flips": laplace_smoothing_rank_flips,
        "size_price_simpson_probe": size_price_simpson_probe,
        "friday13_order_lift": friday13_order_lift,
        "source_vocab_shapley": source_vocab_shapley,
        "feature_hashing_collision_sweep":
            feature_hashing_collision_sweep,
        "linear_probing_cluster_census": linear_probing_cluster_census,
        "source_minhash_jaccard_error": source_minhash_jaccard_error,
        "lang_vocab_overlap_coeff": lang_vocab_overlap_coeff,
        "token_bigram_pmi_top10": token_bigram_pmi_top10,
        "region_priority_hist_intersection":
            region_priority_hist_intersection,
        "collatz_stopping_census": collatz_stopping_census,
        "daily_revenue_max_rally": daily_revenue_max_rally,
        "order_day_next_greater_census":
            order_day_next_greater_census,
        "worst_5day_window": worst_5day_window,
        "snapshot_staleness_by_type": snapshot_staleness_by_type,
        "premium_sku_counts": premium_sku_counts,
        "monetization_by_activity_decile":
            monetization_by_activity_decile,
        "bigram_holdout_coverage": bigram_holdout_coverage,
        "error_rate_churn_matrix": error_rate_churn_matrix,
        "jaccard_pairs_prefix": lambda sf: __import__(
            "ctdray.functions.dedup",
            fromlist=["prefix_jaccard_pairs"]).prefix_jaccard_pairs(
            _documents(sf)),
        "doc_blocklist_scrub": lambda sf: _documents(sf).map_batches(
            __import__("ctdray.functions.text",
                       fromlist=["blocklist_scrub_batch"])
            .blocklist_scrub_batch,
            batch_format="pyarrow"),
        "daily_value_median": lambda sf: grouped_exact_quantiles(
            __import__("ctdray.sources.tables",
                       fromlist=["read_parquet_clean"]).read_parquet_clean(
                f"{sf}/events.parquet", columns=["ts", "value"])
            .map_batches(
                lambda b: pa.table({
                    "day": pa.compute.cast(
                        pa.compute.floor_temporal(b.column("ts"),
                                                  unit="day"),
                        pa.timestamp("us")),
                    "value": b.column("value")}),
                batch_format="pyarrow"),
            "day", "value", qs=(0.5,), collect_cap=5_000),
        "price_quantiles_by_flag": lambda sf: grouped_exact_quantiles(
            __import__("ctdray.sources.tables",
                       fromlist=["read_parquet_clean"]).read_parquet_clean(
                f"{sf}/lineitem.parquet",
                columns=["l_returnflag", "l_extendedprice"]),
            "l_returnflag", "l_extendedprice", collect_cap=5_000),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_token_count": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
            "FROM documents"),
        "doc_text_stats": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens, "
            "CAST(length(text) - (len(string_split(text,' ')) - 1) AS BIGINT) "
            "  AS total_token_chars, "
            "CAST(len(list_filter(string_split(text,' '), x -> x IN "
            f"{_STOPLIST_SQL})) AS BIGINT) AS stopword_count "
            "FROM documents"),
        "doc_bpe_token_count": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+')) AS BIGINT) "
            "AS n_bpe_tokens FROM documents"),
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fingerprint FROM documents",
        # Rabin–Karp rolling fingerprint: 15-bit md5-derived token hashes,
        # base-2^16 polynomial over 4-token windows, doc keeps min + count
        # (mirrors functions.text.rolling_fingerprint_batch exactly).
        "doc_rolling_fingerprint": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "hm AS (SELECT doc_id, "
            "[ ((((strpos('0123456789abcdef', substr(md5(x),1,1))-1)*16 "
            "+ (strpos('0123456789abcdef', substr(md5(x),2,1))-1))*16 "
            "+ (strpos('0123456789abcdef', substr(md5(x),3,1))-1))*16 "
            "+ (strpos('0123456789abcdef', substr(md5(x),4,1))-1)) % 32768 "
            "FOR x IN t ] AS hs FROM toks), "
            "w AS (SELECT doc_id, CASE WHEN len(hs) >= 4 "
            "THEN [hs[i]*281474976710656 + hs[i+1]*4294967296 "
            "+ hs[i+2]*65536 + hs[i+3] FOR i IN range(1, len(hs)-2)] "
            "ELSE [CAST(list_sum([hs[j+1]*CAST(power(65536, len(hs)-1-j) "
            "AS BIGINT) FOR j IN range(0, len(hs))]) AS BIGINT)] END AS ws "
            "FROM hm) "
            "SELECT doc_id, CAST(list_min(ws) AS BIGINT) AS fp_min, "
            "CAST(len(ws) AS BIGINT) AS n_windows FROM w"),
        "doc_quality_filter": (
            "SELECT doc_id, text FROM documents WHERE "
            "len(string_split(text,' ')) BETWEEN 10 AND 5000 AND "
            "2 * len(list_filter(string_split(text,' '), x -> x IN "
            f"{_STOPLIST_SQL})) <= len(string_split(text,' '))"),
        "doc_langid": (
            "SELECT doc_id, CASE WHEN 5 * len(list_filter(string_split(text,' '), "
            f"x -> x IN {_STOPLIST_SQL})) >= len(string_split(text,' ')) "
            "THEN 'eng' ELSE 'unknown' END AS lang_pred FROM documents"),
        "docs_by_lang": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY lang"),
        "dedup_exact": (
            "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"),
        "dedup_token_set": (
            "SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text "
            "FROM documents GROUP BY "
            "array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')"),
        # C4/CCNet-style boilerplate scrub: non-overlapping 3-token chunks,
        # chunks in >2 documents removed from every doc, sub-chunk tail kept.
        "dedup_chunk_scrub": ("""
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), kidx AS (
              SELECT doc_id, t, unnest(range(0, len(t)//3)) AS k FROM toks
            ), chunks AS (
              SELECT doc_id, k,
                     array_to_string(t[k*3+1 : k*3+3], ' ') AS chunk
              FROM kidx
            ), hotset AS (
              SELECT chunk FROM chunks GROUP BY chunk
              HAVING count(DISTINCT doc_id) > 2
            ), marked AS (
              SELECT c.doc_id, c.k, c.chunk, (h.chunk IS NOT NULL) AS hot
              FROM chunks c LEFT JOIN hotset h USING (chunk)
            ), rebuilt AS (
              SELECT doc_id,
                     string_agg(chunk, ' ' ORDER BY k) FILTER (WHERE NOT hot)
                       AS body,
                     count(*) AS n_chunks,
                     count(*) FILTER (WHERE hot) AS n_removed
              FROM marked GROUP BY doc_id
            ), tails AS (
              SELECT doc_id,
                     CASE WHEN len(t) % 3 = 0 THEN NULL
                          ELSE array_to_string(
                              t[len(t) - (len(t) % 3) + 1 : len(t)], ' ')
                     END AS tail
              FROM toks
            )
            SELECT ta.doc_id,
                   coalesce(concat_ws(' ', r.body, ta.tail), '') AS text,
                   coalesce(r.n_chunks, 0) AS n_chunks,
                   coalesce(r.n_removed, 0) AS n_removed
            FROM tails ta LEFT JOIN rebuilt r USING (doc_id)
        """),
        # Exact all-pairs 3-gram Jaccard: a doc is a duplicate iff a smaller
        # doc_id partner reaches Jaccard ≥ 0.8 (5·|∩| ≥ 4·|∪| in integers).
        # The Ray side generates candidates by MinHash-LSH; the pinned band
        # geometry gives recall 1 on the testdata's near-dup structure
        # (verified empirically at sf0.001/0.01/0.1), so LSH+exact-verify
        # equals the all-pairs oracle.
        "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
        "dedup_minhash_lsh": _NGRAM_JACCARD_SQL,
        # Transitive closure of the exact all-pairs near-dup graph (DuckDB
        # recursive CTE): cluster_id = min doc_id reachable through edges
        # with 3-gram Jaccard >= 0.8.  The engine's LSH pair set has recall
        # 1 on this testdata (see dedup_minhash_lsh), so components match.
        "dedup_clusters": (
            "WITH RECURSIVE toks AS (SELECT doc_id, "
            "string_split(text, ' ') AS t FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(t) >= 3 "
            "THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] "
            "FOR i IN range(1, len(t)-1)]) "
            "ELSE [array_to_string(t, ' ')] END AS g FROM toks), "
            "e AS (SELECT a.doc_id AS ua, b.doc_id AS ub FROM sh a "
            "JOIN sh b ON a.doc_id <> b.doc_id "
            "WHERE 5 * len(list_intersect(a.g, b.g)) >= "
            "4 * (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))), "
            "reach(node, r) AS ("
            "SELECT doc_id, doc_id FROM documents "
            "UNION "
            "SELECT e.ub, reach.r FROM reach JOIN e ON e.ua = reach.node) "
            "SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id "
            "FROM reach GROUP BY node"),
        # 60-bit SimHash rebuilt in SQL (md5-derived token hashes, per-bit
        # sign sums) — exact-signature grouping keeps the smallest doc_id.
        "dedup_simhash": _simhash_sql(
            "SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text "
            "FROM sig GROUP BY s"),
        # Banded hamming-k dedup: the pigeonhole bands make candidate
        # generation COMPLETE for hd ≤ k, so the engine equals the exact
        # all-pairs xor-popcount expression.
        "dedup_simhash_near": _simhash_sql(
            "SELECT doc_id, text FROM sig WHERE doc_id NOT IN ("
            "SELECT b.doc_id FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.s, b.s)) <= 3)"),
        # Exact all-pairs cosine near-dup at 0.98 (exists-smaller-partner
        # semantics — exactly the engine's multi-table LSH + verify rule).
        # On this testdata the max pairwise cosine is ≈0.51, so the check
        # certifies the engine never spuriously drops rows.
        "dedup_embedding": (
            "WITH dup AS (SELECT DISTINCT b.vec_id AS b_id "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.98) "
            "SELECT vec_id, label FROM embeddings "
            "WHERE vec_id NOT IN (SELECT b_id FROM dup)"),
        "knn_bruteforce": (
            "WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 5) "
            "SELECT q_id, vec_id, \"rank\" FROM ("
            "  SELECT q.q_id, e.vec_id, CAST(row_number() OVER ("
            "    PARTITION BY q.q_id ORDER BY "
            "    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC, "
            "    e.vec_id ASC) AS INTEGER) AS \"rank\" "
            "  FROM embeddings e CROSS JOIN q) WHERE \"rank\" <= 10"),
        "knn_ivf_fullprobe": (
            "WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 5) "
            "SELECT q_id, vec_id, \"rank\" FROM ("
            "  SELECT q.q_id, e.vec_id, CAST(row_number() OVER ("
            "    PARTITION BY q.q_id ORDER BY "
            "    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC, "
            "    e.vec_id ASC) AS INTEGER) AS \"rank\" "
            "  FROM embeddings e CROSS JOIN q) WHERE \"rank\" <= 10"),
        "knn_lsh_allbuckets": (
            "WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 5) "
            "SELECT q_id, vec_id, \"rank\" FROM ("
            "  SELECT q.q_id, e.vec_id, CAST(row_number() OVER ("
            "    PARTITION BY q.q_id ORDER BY "
            "    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC, "
            "    e.vec_id ASC) AS INTEGER) AS \"rank\" "
            "  FROM embeddings e CROSS JOIN q) WHERE \"rank\" <= 10"),
        # DEFAULT knn_lsh geometry, exactly re-expressed (see _knn_lsh_sql)
        "knn_lsh": _knn_lsh_sql(),
        # DEFAULT knn_ivf geometry: engine-identical centroid training
        # re-run per testdata corpus at generation time (see _knn_ivf_sql)
        "knn_ivf": _knn_ivf_sql(),
        "cosine_range_search": (
            "WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 5) "
            "SELECT q.q_id, e.vec_id FROM embeddings e CROSS JOIN q "
            "WHERE list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) "
            ">= 0.2"),
        "q1_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
            "CAST(count(*) AS BIGINT) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
        "top10_customers": (
            "SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_orders, "
            "any_value(c_name) AS c_name "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY o_custkey ORDER BY n_orders DESC, custkey ASC LIMIT 10"),
        "top_orders_per_customer": (
            "SELECT custkey, o_orderkey, o_totalprice, rnk FROM ("
            "SELECT o_custkey AS custkey, o_orderkey, o_totalprice, "
            "CAST(row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk "
            "FROM orders) WHERE rnk <= 2"),
        "orders_by_nation": (
            "SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),
        "events_hourly": (
            "SELECT date_trunc('hour', ts) AS hour, event_type, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "min(value) AS min_value, max(value) AS max_value "
            "FROM events GROUP BY 1, 2"),
        "sessionize_events": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(1 + sum(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_sessions FROM ("
            "  SELECT user_id, epoch(ts - lag(ts) OVER ("
            "    PARTITION BY user_id ORDER BY ts)) AS gap_s FROM events) "
            "GROUP BY user_id"),
        "part_type_stats": (
            "SELECT p_type, CAST(count(*) AS BIGINT) AS n_parts, "
            "min(p_retailprice) AS min_price, max(p_retailprice) AS max_price "
            "FROM part GROUP BY p_type"),
        "shipped_1995_by_flag": (
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-01-01' GROUP BY l_returnflag"),
        "supplier_stats_by_nation": (
            "SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers, "
            "min(s_acctbal) AS min_acctbal, max(s_acctbal) AS max_acctbal "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "GROUP BY n_name"),
        "orders_monthly_by_priority": (
            "SELECT date_trunc('month', o_orderdate) AS month, "
            "o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders GROUP BY 1, 2"),
        "orders_by_mktsegment": (
            "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"),
        "events_sliding_2h": (
            "SELECT win_start, event_type, CAST(count(*) AS BIGINT) AS n_events "
            "FROM (SELECT unnest([date_trunc('hour', ts), "
            "date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start, "
            "event_type FROM events) GROUP BY win_start, event_type"),
        "local_supplier_volume": (
            "SELECT n_name, CAST(sum(CAST(round(l_extendedprice*"
            "(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_e4 "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY n_name"),
        "lineitem_price_quantiles": (
            " UNION ALL ".join(
                f"SELECT {q} AS q, quantile_disc(l_extendedprice, {q}) "
                "AS value FROM lineitem"
                for q in (0.25, 0.5, 0.75, 0.95))),
        "price_quantiles_by_flag": (
            " UNION ALL ".join(
                f"SELECT l_returnflag, {q} AS q, "
                f"quantile_disc(l_extendedprice, {q}) AS value "
                "FROM lineitem GROUP BY l_returnflag"
                for q in (0.25, 0.5, 0.75, 0.95))),
        "events_interval_join_60s": (
            "SELECT p.ts, CAST(count(v.ts) AS BIGINT) AS n_nearby "
            "FROM (SELECT ts FROM events WHERE event_type='purchase') p "
            "LEFT JOIN (SELECT ts FROM events WHERE event_type='view') v "
            "ON abs(epoch_us(p.ts) - epoch_us(v.ts)) <= 60000000 "
            "GROUP BY p.ts"),
        "events_asof_last_view": (
            "SELECT l.user_id, l.ts, r.ts AS last_view_ts "
            "FROM (SELECT * FROM events WHERE event_type='purchase') l "
            "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='view') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"),
        "daily_distinct_users": (
            "SELECT date_trunc('day', ts) AS day, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1"),
        "doc_sample_16th": (
            "SELECT doc_id, text FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'"),
        "top_tokens": (
            "SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences "
            "FROM (SELECT unnest(string_split(text, ' ')) AS token "
            "FROM documents) GROUP BY token "
            "ORDER BY n_occurrences DESC, token ASC LIMIT 20"),
        "top_bigrams": (
            "SELECT bigram, CAST(count(*) AS BIGINT) AS n_occurrences "
            "FROM (SELECT unnest([t[i] || ' ' || t[i+1] "
            "FOR i IN range(1, len(t))]) AS bigram "
            "FROM (SELECT string_split(text, ' ') AS t FROM documents)) "
            "GROUP BY bigram ORDER BY n_occurrences DESC, bigram ASC "
            "LIMIT 20"),
        # TF-IDF-shaped rank is float-free: idf is monotone-decreasing in
        # df, so (tf DESC, df ASC, term ASC) is the exact tf-idf ordering.
        "doc_top_terms": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS term FROM documents), "
            "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
            "FROM toks GROUP BY doc_id, term), "
            "df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) "
            "AS df FROM toks GROUP BY term) "
            "SELECT doc_id, term, tf, df, rnk FROM ("
            "SELECT tf.doc_id, tf.term, tf.tf, df.df, "
            "CAST(row_number() OVER (PARTITION BY tf.doc_id "
            "ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS BIGINT) AS rnk "
            "FROM tf JOIN df USING (term)) WHERE rnk <= 3"),
        # Count-Min register table rebuilt exactly: same md5-derived row
        # hashes h_d(tok) = fold60(md5(d || ':' || tok)) mod 256, summed
        # over every token occurrence.
        "token_countmin": (
            "WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents), "
            "dd AS (SELECT unnest([0,1,2,3]) AS depth, tok FROM toks), "
            "s AS (SELECT depth, ("
            f"{_fold60_sql(_CM_MD5)}) % 256 AS slot FROM dd) "
            "SELECT CAST(depth AS BIGINT) AS depth, CAST(slot AS BIGINT) "
            "AS slot, CAST(count(*) AS BIGINT) AS n FROM s "
            "GROUP BY depth, slot"),
        "docs_stratified_sample": (
            "SELECT lang, doc_id, rnk FROM ("
            "SELECT lang, doc_id, CAST(row_number() OVER ("
            "PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, "
            "doc_id ASC) AS BIGINT) AS rnk FROM documents) WHERE rnk <= 5"),
        "events_rollup": (
            "SELECT COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), "
            "'ALL') AS grp_day, COALESCE(event_type, 'ALL') AS grp_type, "
            "CAST(count(*) AS BIGINT) AS n_events FROM events "
            "GROUP BY ROLLUP (date_trunc('day', ts), event_type)"),
        # HLL register sketch rebuilt exactly in SQL: same 60-bit md5 fold,
        # register = h mod 64, rho = bit_count(w XOR w-1) (trailing-zero
        # rank), 55 when the 54 remaining bits are all zero.
        "daily_users_hll": (
            "WITH h AS (SELECT date_trunc('day', ts) AS day, "
            f"{_fold60_sql('md5(CAST(user_id AS VARCHAR))')} AS hh "
            "FROM events), "
            "r AS (SELECT day, hh % 64 AS register, "
            "CASE WHEN hh // 64 = 0 THEN 55 "
            "ELSE bit_count(xor(hh // 64, hh // 64 - 1)) END AS rho FROM h) "
            "SELECT day, CAST(register AS BIGINT) AS register, "
            "CAST(max(rho) AS BIGINT) AS max_rho FROM r "
            "GROUP BY day, register"),
        "viewers_not_purchasers": (
            "SELECT date_trunc('day', ts) AS day, user_id FROM events "
            "GROUP BY 1, 2 "
            "HAVING max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1 "
            "AND max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 0"),
        "events_daily_pivot": (
            "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, "
            + ", ".join(
                f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) "
                f"AS n_{t}"
                for t in ("click", "error", "purchase", "signup", "view"))
            + " FROM events GROUP BY 1"),
        # Incremental dedup: snapshot = even doc_ids, delta = odd; a
        # fingerprint group survives iff it contains no snapshot member, and
        # the smallest-doc_id delta row represents it.
        "dedup_incremental": (
            "WITH f AS (SELECT doc_id, text, md5(text) AS fp, "
            "CAST(doc_id % 2 AS INTEGER) AS is_new FROM documents), "
            "ok AS (SELECT fp FROM f GROUP BY fp HAVING min(is_new) = 1) "
            "SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text "
            "FROM f WHERE fp IN (SELECT fp FROM ok) GROUP BY fp"),
        "customer_urgent_order_counts": (
            "SELECT c_custkey, c_mktsegment, "
            "CAST(count(o.o_custkey) AS BIGINT) AS n_urgent, "
            "CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), "
            "0) AS BIGINT) AS urgent_cents "
            "FROM customer c LEFT JOIN orders o "
            "ON o.o_custkey = c.c_custkey "
            "AND o.o_orderpriority = '1-URGENT' "
            "GROUP BY 1, 2"),
        "user_event_gaps": (
            "WITH o AS (SELECT user_id, ts, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts "
            "FROM events) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(max(date_diff('microseconds', pts, ts)) AS BIGINT) "
            "AS max_gap_us, "
            "CAST(min(date_diff('microseconds', pts, ts)) AS BIGINT) "
            "AS min_gap_us, "
            "CAST(date_diff('microseconds', min(ts), max(ts)) AS BIGINT) "
            "AS span_us "
            "FROM o GROUP BY user_id"),
        "event_funnel_24h": (
            "WITH fv AS (SELECT user_id, min(ts) AS first_view_ts "
            "FROM events WHERE event_type = 'view' GROUP BY user_id) "
            "SELECT fv.user_id, fv.first_view_ts, "
            "CAST(count(e.ts) AS BIGINT) AS n_purchases_24h "
            "FROM fv LEFT JOIN events e ON e.user_id = fv.user_id "
            "AND e.event_type = 'purchase' AND e.ts >= fv.first_view_ts "
            "AND e.ts <= fv.first_view_ts + INTERVAL 24 HOUR "
            "GROUP BY 1, 2"),
        "bloom_semi_volume": (
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
            "FROM lineitem WHERE l_partkey IN "
            "(SELECT p_partkey FROM part WHERE p_type = 'PROMO') "
            "GROUP BY l_returnflag"),
        "token_postings": (
            "WITH pairs AS (SELECT DISTINCT doc_id, token FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS token "
            "FROM documents) t) "
            "SELECT token, doc_id FROM pairs "
            "QUALIFY count(*) OVER (PARTITION BY token) >= 100"),
        "user_record_events": (
            "SELECT user_id, ts, event_id, value FROM ("
            "SELECT user_id, ts, event_id, value, "
            "max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm "
            "FROM events) WHERE pm IS NULL OR value > pm"),
        "events_json_k_stats": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(k) AS BIGINT) AS sum_k, "
            "CAST(min(k) AS BIGINT) AS min_k, "
            "CAST(max(k) AS BIGINT) AS max_k FROM ("
            "SELECT event_type, "
            "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k "
            "FROM events) WHERE k IS NOT NULL GROUP BY event_type"),
        "orders_cube": (
            "SELECT COALESCE(strftime(o_orderdate, '%Y'), 'ALL') "
            "AS grp_year, COALESCE(o_orderpriority, 'ALL') AS grp_priority, "
            "CAST(count(*) AS BIGINT) AS n_orders FROM orders "
            "GROUP BY CUBE (strftime(o_orderdate, '%Y'), o_orderpriority)"),
        "user_best_event": (
            "SELECT user_id, event_id, value AS best_value FROM ("
            "SELECT user_id, event_id, value, row_number() OVER ("
            "PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn "
            "FROM events) WHERE rn = 1"),
        "cohort_retention": (
            "WITH c AS (SELECT user_id, date_trunc('week', min(ts)) AS cw "
            "FROM events WHERE event_type = 'signup' GROUP BY user_id), "
            "a AS (SELECT DISTINCT e.user_id, date_trunc('week', e.ts) "
            "AS aw FROM events e), "
            "j AS (SELECT c.user_id, cw, aw FROM c JOIN a USING (user_id) "
            "WHERE aw >= cw) "
            "SELECT CAST(cw AS TIMESTAMP) AS cohort_week, "
            "CAST(date_diff('week', cw, aw) AS BIGINT) AS week_offset, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM j GROUP BY 1, 2"),
        "frequent_token_pairs": (
            "WITH dt AS (SELECT DISTINCT doc_id, token FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS token "
            "FROM documents) t) "
            "SELECT a.token AS ta, b.token AS tb, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM dt a JOIN dt b ON a.doc_id = b.doc_id "
            "AND a.token < b.token "
            "GROUP BY 1, 2 HAVING count(*) >= 50"),
        "order_status_transitions": (
            "WITH s AS (SELECT o_custkey, o_orderstatus, "
            "lag(o_orderstatus) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) AS prev FROM orders) "
            "SELECT prev AS from_status, o_orderstatus AS to_status, "
            "CAST(count(*) AS BIGINT) AS n FROM s "
            "WHERE prev IS NOT NULL GROUP BY 1, 2"),
        "doc_length_histogram": (
            "SELECT n_chars // 100 AS bin, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(min(n_chars) AS BIGINT) AS min_chars, "
            "CAST(max(n_chars) AS BIGINT) AS max_chars "
            "FROM documents GROUP BY 1"),
        "doc_repetition_stats": (
            "WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS tok FROM documents), "
            "c AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2) "
            "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
            "CAST(count(*) AS BIGINT) AS n_distinct, "
            "CAST(max(c) AS BIGINT) AS top_count FROM c GROUP BY doc_id"),
        "small_qty_part_revenue": (
            "WITH pk AS (SELECT p_partkey FROM part "
            "WHERE p_brand = 'Brand#1'), "
            "li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents "
            "FROM lineitem JOIN pk ON l_partkey = p_partkey), "
            "st AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS sq, "
            "CAST(count(*) AS BIGINT) AS c FROM li GROUP BY 1) "
            "SELECT CAST(sum(cents) AS BIGINT) AS revenue_cents, "
            "CAST(count(*) AS BIGINT) AS n_rows "
            "FROM li JOIN st USING (l_partkey) WHERE 5 * q * c < sq"),
        "bm25_top_docs": (
            "WITH st AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS a, "
            "greatest(1, sum(CASE WHEN list_contains("
            "string_split(text, ' '), 'join') THEN 1 ELSE 0 END)) AS dfj, "
            "greatest(1, sum(CASE WHEN list_contains("
            "string_split(text, ' '), 'filter') THEN 1 ELSE 0 END)) AS dff, "
            "greatest(1, sum(CASE WHEN list_contains("
            "string_split(text, ' '), 'scan') THEN 1 ELSE 0 END)) AS dfs "
            "FROM documents), "
            "sc AS (SELECT doc_id, "
            "(1000 * st.n // st.dfj) * (tfj * 3000 // (tfj * 1000 + 500 + l)) "
            "+ (1000 * st.n // st.dff) * (tff * 3000 // (tff * 1000 + 500 + l)) "
            "+ (1000 * st.n // st.dfs) * (tfs * 3000 // (tfs * 1000 + 500 + l)) "
            "AS score FROM (SELECT doc_id, "
            "len(list_filter(string_split(text, ' '), x -> x = 'join')) AS tfj, "
            "len(list_filter(string_split(text, ' '), x -> x = 'filter')) AS tff, "
            "len(list_filter(string_split(text, ' '), x -> x = 'scan')) AS tfs, "
            "len(string_split(text, ' ')) * 1000 * "
            "(SELECT n FROM st) // (SELECT a FROM st) AS l "
            "FROM documents) d, st) "
            "SELECT doc_id, CAST(score AS BIGINT) AS score FROM sc "
            "WHERE score > 0 ORDER BY score DESC, doc_id ASC LIMIT 20"),
        "doc_normalize": (
            "SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), "
            "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS text_norm, "
            "CAST(length(trim(regexp_replace(regexp_replace(lower(text), "
            "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT) "
            "AS n_chars_norm FROM documents"),
        "views_purchases_full": (
            "WITH v AS (SELECT date_trunc('day', ts) AS day, user_id, "
            "CAST(count(*) AS BIGINT) AS n_views FROM events "
            "WHERE event_type = 'view' GROUP BY 1, 2), "
            "p AS (SELECT date_trunc('day', ts) AS day, user_id, "
            "CAST(count(*) AS BIGINT) AS n_purchases FROM events "
            "WHERE event_type = 'purchase' GROUP BY 1, 2) "
            "SELECT COALESCE(v.day, p.day) AS day, "
            "COALESCE(v.user_id, p.user_id) AS user_id, "
            "CAST(COALESCE(n_views, 0) AS BIGINT) AS n_views, "
            "CAST(COALESCE(n_purchases, 0) AS BIGINT) AS n_purchases "
            "FROM v FULL OUTER JOIN p "
            "ON v.day = p.day AND v.user_id = p.user_id"),
        "daily_revenue_moving7": (
            "WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_cents FROM orders GROUP BY 1) "
            "SELECT day, revenue_cents, "
            "CAST(sum(revenue_cents) OVER (ORDER BY day "
            "RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS moving7_cents FROM d"),
        "global_event_rank": (
            "SELECT event_id, CAST(row_number() OVER "
            "(ORDER BY ts, event_id) AS BIGINT) AS rnk FROM events"),
        "user_top_event_type": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS cnt "
            "FROM events GROUP BY 1, 2) "
            "SELECT user_id, event_type AS top_type, "
            "CAST(cnt AS BIGINT) AS n FROM c "
            "QUALIFY row_number() OVER (PARTITION BY user_id "
            "ORDER BY cnt DESC, event_type ASC) = 1"),
        "heavy_hitter_tokens": (
            "SELECT tok AS token, CAST(count(*) AS BIGINT) AS n "
            "FROM (SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY tok HAVING count(*) >= 800"),
        "price_quartile_volumes": (
            "WITH q AS (SELECT quantile_disc(l_extendedprice, 0.25) AS b1, "
            "quantile_disc(l_extendedprice, 0.5) AS b2, "
            "quantile_disc(l_extendedprice, 0.75) AS b3 FROM lineitem) "
            "SELECT CAST(CASE WHEN l_extendedprice <= b1 THEN 0 "
            "WHEN l_extendedprice <= b2 THEN 1 "
            "WHEN l_extendedprice <= b3 THEN 2 ELSE 3 END AS BIGINT) "
            "AS bucket, CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS sum_cents FROM lineitem, q GROUP BY 1"),
        "users_per_event_type": (
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) "
            "AS n_users FROM events GROUP BY 1"),
        "source_quality_stats": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(length(text)) AS BIGINT) AS total_chars, "
            "CAST(sum(len(string_split(text, ' '))) AS BIGINT) "
            "AS total_tokens, "
            "CAST(sum(len(list_filter(string_split(text, ' '), x -> x IN "
            f"{_STOPLIST_SQL}))) AS BIGINT) AS total_stopwords "
            "FROM documents GROUP BY source"),
        "daily_value_median": (
            "SELECT date_trunc('day', ts) AS day, 0.5 AS q, "
            "quantile_disc(value, 0.5) AS value FROM events GROUP BY 1"),
        "lineitem_orphans": (
            "SELECT CAST(count(*) AS BIGINT) AS n_orphans FROM lineitem "
            "WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)"),
        "part_metrics_unpivot": (
            "SELECT p_partkey, 'size' AS metric, "
            "CAST(p_size AS BIGINT) AS value FROM part "
            "UNION ALL SELECT p_partkey, 'retail_cents' AS metric, "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS value FROM part"),
        "q3_shipping_priority": (
            "SELECT l_orderkey, "
            "SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS revenue_cp, "
            "o_orderdate, o_orderpriority "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1995-03-15' "
            "AND l_shipdate > TIMESTAMP '1995-03-15' "
            "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY revenue_cp DESC, o_orderdate, l_orderkey LIMIT 10"),
        "docs_weighted_sample": (
            "SELECT doc_id, n_chars FROM documents WHERE "
            f"({_fold48_sql('md5(CAST(doc_id AS VARCHAR))')}) "
            "* (SELECT max(n_chars) FROM documents) "
            "< n_chars * 281474976710656"),
        "doc_length_deciles": (
            "SELECT doc_id, n_chars, CAST(ntile(10) OVER "
            "(ORDER BY n_chars, doc_id) AS BIGINT) AS decile "
            "FROM documents"),
        "docs_with_hapax": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(list_distinct(string_split(text, ' '))) AS t "
            "FROM documents), "
            "df AS (SELECT t, count(*) AS c FROM tok GROUP BY 1) "
            "SELECT DISTINCT doc_id FROM tok "
            "WHERE t IN (SELECT t FROM df WHERE c = 1)"),
        "bilateral_trade_volume": (
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "CAST(year(l_shipdate) AS BIGINT) AS ship_year, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_cp "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
            "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
            "GROUP BY 1, 2, 3"),
        "customer_order_gap_median": (
            "WITH o AS (SELECT o_custkey, o_orderdate, "
            "lag(o_orderdate) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) AS prev FROM orders), "
            "g AS (SELECT o_custkey, date_diff('day', "
            "date_trunc('day', prev), date_trunc('day', o_orderdate)) "
            "AS gap FROM o WHERE prev IS NOT NULL) "
            "SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps, "
            "CAST(quantile_disc(gap, 0.5) AS BIGINT) AS median_gap_days "
            "FROM g GROUP BY o_custkey"),
        "daily_revenue_delta": (
            "WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, "
            "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS rc FROM orders GROUP BY 1), "
            "w AS (SELECT day, rc, lag(rc) OVER (ORDER BY day) AS prev "
            "FROM d) "
            "SELECT day, rc AS revenue_cents, "
            "CAST(coalesce(rc - prev, 0) AS BIGINT) AS delta_cents, "
            "CAST(CASE WHEN prev IS NULL THEN 0 ELSE "
            "CAST(sign(rc - prev) AS BIGINT) * "
            "(abs(rc - prev) * 1000000 // greatest(prev, 1)) END AS BIGINT) "
            "AS delta_ppm FROM w"),
        "cheapest_supplier_per_part": (
            "WITH spend AS (SELECT l_partkey, l_suppkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS spend_cp FROM lineitem GROUP BY 1, 2) "
            "SELECT l_partkey, l_suppkey AS best_suppkey, spend_cp "
            "FROM spend QUALIFY row_number() OVER (PARTITION BY l_partkey "
            "ORDER BY spend_cp, l_suppkey) = 1"),
        "q10_returned_revenue": (
            "SELECT o_custkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_cp, c_name "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE l_returnflag = 'R' "
            "GROUP BY o_custkey, c_name "
            "ORDER BY revenue_cp DESC, o_custkey LIMIT 20"),
        "order_count_distribution": (
            "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM ("
            "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_custkey) GROUP BY c_count"),
        "q18_large_orders": (
            "SELECT c_name, o_custkey, o_orderkey, o_orderdate, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, "
            "sum_qty FROM ("
            "SELECT l_orderkey, "
            "CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) "
            "AS sum_qty FROM lineitem GROUP BY 1 HAVING sum_qty >= 300) q "
            "JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "ORDER BY total_cents DESC, o_orderkey LIMIT 100"),
        "q8_market_share": (
            "WITH rev AS (SELECT year(o_orderdate) AS yr, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS cp, "
            "(n1.n_name = 'NATION_2') AS is_target "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
            "JOIN region ON n2.n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA') "
            "SELECT CAST(yr AS BIGINT) AS order_year, "
            "CAST(sum(cp) AS BIGINT) AS total_cp, "
            "CAST(coalesce(sum(CASE WHEN is_target THEN cp END), 0) "
            "AS BIGINT) AS nation_cp, "
            "CAST(coalesce(sum(CASE WHEN is_target THEN cp END), 0) "
            "* 1000000 // sum(cp) AS BIGINT) AS share_ppm "
            "FROM rev GROUP BY 1"),
        "chunk_dedup_stats": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "occ AS (SELECT doc_id, unnest([array_to_string("
            "t[8*k+1:8*k+8], ' ') FOR k IN range(0, len(t)//8)]) AS chunk "
            "FROM toks), "
            "df AS (SELECT chunk, count(DISTINCT doc_id) AS nd "
            "FROM occ GROUP BY 1) "
            "SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_chunks, "
            "CAST(sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_dup_chunks "
            "FROM occ o JOIN df USING(chunk) GROUP BY o.doc_id"),
        "label_centroid_dots": (
            "WITH comp AS (SELECT label, k AS dim, "
            "CAST(SUM(CAST(round(CAST(embedding[k] AS DOUBLE) * 10000) "
            "AS BIGINT)) AS BIGINT) AS s "
            "FROM embeddings, range(1, 65) r(k) GROUP BY 1, 2) "
            "SELECT a.label AS label_a, b.label AS label_b, "
            "CAST(SUM(a.s * b.s) AS BIGINT) AS dot "
            "FROM comp a JOIN comp b ON a.dim = b.dim "
            "AND a.label <= b.label GROUP BY 1, 2"),
        "q21_last_ship_supplier": (
            "WITH ms AS (SELECT l_orderkey, l_suppkey, "
            "max(l_shipdate) AS md FROM lineitem GROUP BY 1, 2), "
            "w AS (SELECT l_orderkey, l_suppkey, "
            "row_number() OVER (PARTITION BY l_orderkey "
            "ORDER BY md DESC, l_suppkey) AS rn, "
            "count(*) OVER (PARTITION BY l_orderkey) AS ns FROM ms) "
            "SELECT l_suppkey, CAST(count(*) AS BIGINT) "
            "AS n_last_ship_orders FROM w WHERE rn = 1 AND ns >= 2 "
            "GROUP BY 1"),
        "docs_matching_all_terms": (
            "SELECT doc_id FROM documents "
            "WHERE list_contains(string_split(text, ' '), 'table') "
            "AND list_contains(string_split(text, ' '), 'query') "
            "AND list_contains(string_split(text, ' '), 'value')"),
        "value_mad_by_event_type": (
            "WITH c AS (SELECT event_type, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "m AS (SELECT event_type, quantile_disc(cents, 0.5) AS med "
            "FROM c GROUP BY 1) "
            "SELECT c.event_type, CAST(m.med AS BIGINT) AS median_cents, "
            "CAST(quantile_disc(abs(c.cents - m.med), 0.5) AS BIGINT) "
            "AS mad_cents, CAST(count(*) AS BIGINT) AS n_events "
            "FROM c JOIN m USING(event_type) GROUP BY c.event_type, m.med"),
        "cross_source_dup_docs": (
            "WITH k AS (SELECT doc_id, source, array_to_string(list_sort("
            "list_distinct(string_split(text, ' '))), ' ') AS key "
            "FROM documents) "
            "SELECT doc_id, source FROM k a WHERE EXISTS ("
            "SELECT 1 FROM k b WHERE b.key = a.key "
            "AND b.source <> a.source)"),
        "user_value_1h_window": (
            "SELECT event_id, user_id, ts, "
            "CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS w_cents FROM events"),
        "region_nation_rollup": (
            "SELECT coalesce(r_name, 'ALL') AS region_name, "
            "coalesce(n_name, 'ALL') AS nation_name, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_cents, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY ROLLUP(r_name, n_name)"),
        "top_chunk_overlap_pairs": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "occ AS (SELECT DISTINCT doc_id, chunk FROM ("
            "SELECT doc_id, unnest([array_to_string(t[8*k+1:8*k+8], ' ') "
            "FOR k IN range(0, len(t)//8)]) AS chunk FROM toks)), "
            "df AS (SELECT chunk, count(*) AS nd FROM occ GROUP BY 1), "
            "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "count(*) AS n_shared FROM occ a "
            "JOIN occ b ON a.chunk = b.chunk AND a.doc_id < b.doc_id "
            "JOIN df ON df.chunk = a.chunk AND df.nd BETWEEN 2 AND 64 "
            "GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared "
            "FROM p ORDER BY n_shared DESC, doc_a, doc_b LIMIT 20"),
        "time_rollup_multigrain": (
            "WITH e AS (SELECT ts, CAST(round(value * 100) AS BIGINT) "
            "AS cents FROM events) "
            "SELECT 'hour' AS granularity, date_trunc('hour', ts) AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(cents) AS BIGINT) AS value_cents FROM e GROUP BY 2 "
            "UNION ALL SELECT 'day', date_trunc('day', ts), "
            "CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT) "
            "FROM e GROUP BY 2 "
            "UNION ALL SELECT 'week', date_trunc('week', ts), "
            "CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT) "
            "FROM e GROUP BY 2"),
        "pareto_customer_cutoff": (
            "WITH p AS (SELECT o_custkey, CAST(sum(CAST(round("
            "o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s "
            "FROM orders GROUP BY 1), "
            "t AS (SELECT CAST(sum(s) AS BIGINT) AS tot FROM p), "
            "w AS (SELECT sum(s) OVER (ORDER BY s DESC, o_custkey) AS cum, "
            "row_number() OVER (ORDER BY s DESC, o_custkey) AS k FROM p) "
            "SELECT CAST(k AS BIGINT) AS n_customers, "
            "CAST(cum AS BIGINT) AS cum_cents, tot AS total_cents "
            "FROM w, t WHERE cum * 1000000 >= 800000 * tot "
            "ORDER BY k LIMIT 1"),
        "events_dow_hour_share": (
            "WITH c AS (SELECT CAST(isodow(ts) AS BIGINT) AS isodow, "
            "CAST(hour(ts) AS BIGINT) AS hour, "
            "CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1, 2), "
            "d AS (SELECT isodow, sum(n_events) AS tot FROM c GROUP BY 1) "
            "SELECT c.isodow, hour, n_events, "
            "CAST(n_events * 1000000 // tot AS BIGINT) AS share_ppm "
            "FROM c JOIN d USING(isodow)"),
        "session_type_pairs": (
            "WITH g AS (SELECT user_id, ts, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND THEN 1 ELSE 0 "
            "END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, event_type, SUM(brk) OVER ("
            "PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) "
            "AS sid FROM g), "
            "d AS (SELECT DISTINCT user_id, sid, event_type FROM s) "
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "CAST(count(*) AS BIGINT) AS n_sessions "
            "FROM d a JOIN d b ON a.user_id = b.user_id AND a.sid = b.sid "
            "AND a.event_type < b.event_type GROUP BY 1, 2"),
        "q6_forecast_revenue": (
            "SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_e4, CAST(count(*) AS BIGINT) AS n_lines "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-01-01' "
            "AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
            "AND CAST(round(l_quantity) AS BIGINT) < 24"),
        "q9_profit_by_nation_year": (
            "SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS order_year, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_cp "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "WHERE p_name LIKE '%red%' GROUP BY 1, 2"),
        "q15_top_supplier": (
            "WITH r AS (SELECT l_suppkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS total_cp FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1995-01-01' "
            "AND l_shipdate < TIMESTAMP '1995-04-01' GROUP BY 1) "
            "SELECT s_suppkey, s_name, total_cp FROM r "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "WHERE total_cp = (SELECT max(total_cp) FROM r) "
            "ORDER BY s_suppkey"),
        "q20_dominant_suppliers": (
            "WITH pq_ AS (SELECT l_partkey, l_suppkey, "
            "CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q "
            "FROM lineitem GROUP BY 1, 2), "
            "t AS (SELECT l_partkey, SUM(q) AS tq FROM pq_ GROUP BY 1) "
            "SELECT l_suppkey, CAST(count(*) AS BIGINT) "
            "AS n_dominated_parts FROM pq_ JOIN t USING(l_partkey) "
            "WHERE q * 1000000 > 200000 * tq GROUP BY 1"),
        "q12_late_lines_by_priority": (
            "SELECT l_returnflag, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY "
            "GROUP BY 1"),
        "q16_supplier_variety": (
            "SELECT p_brand, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_brand <> 'Brand#1' AND l_suppkey NOT IN "
            "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
            "GROUP BY 1, 2"),
        "doc_token_commonness": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS tok FROM documents), "
            "cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS n "
            "FROM tok GROUP BY 1) "
            "SELECT doc_id, CAST(SUM(n) AS BIGINT) AS sum_commonness, "
            "CAST(MIN(n) AS BIGINT) AS min_commonness, "
            "CAST(count(*) AS BIGINT) AS n_tokens "
            "FROM tok JOIN cnt USING(tok) GROUP BY 1"),
        "user_ping_pong_transitions": (
            "WITH s AS (SELECT user_id, event_type, "
            "LAG(event_type) OVER w AS prev, "
            "LEAD(event_type) OVER w AS nxt FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT prev AS a_type, event_type AS b_type, "
            "CAST(count(*) AS BIGINT) AS n FROM s "
            "WHERE prev = nxt AND prev <> event_type GROUP BY 1, 2"),
        "doc_chunks_sliding": (
            "WITH d AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "c AS (SELECT doc_id, t, unnest([1 + 4 * i FOR i IN "
            "range(0, CAST(ceil(len(t) / 4.0) AS BIGINT))]) AS s FROM d) "
            "SELECT doc_id, CAST((s - 1) / 4 AS BIGINT) AS chunk_idx, "
            "array_to_string(t[s:s+5], ' ') AS chunk_text, "
            "CAST(least(6, len(t) - s + 1) AS BIGINT) AS n_tokens "
            "FROM c"),
        "tokens_in_all_langs": (
            "WITH tok AS (SELECT DISTINCT doc_id, lang, "
            "unnest(string_split(text, ' ')) AS tok FROM documents) "
            "SELECT tok, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, "
            "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs "
            "FROM tok GROUP BY 1 HAVING count(DISTINCT lang) = "
            "(SELECT count(DISTINCT lang) FROM documents)"),
        "customer_rfm_scores": (
            "WITH a AS (SELECT o_custkey, max(o_orderdate) AS last_dt, "
            "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS cents, count(*) AS n "
            "FROM orders GROUP BY 1), "
            "s AS (SELECT o_custkey, "
            "CAST(NTILE(4) OVER (ORDER BY last_dt, o_custkey) AS BIGINT) "
            "AS r_score, "
            "CAST(NTILE(4) OVER (ORDER BY n, o_custkey) AS BIGINT) "
            "AS f_score, "
            "CAST(NTILE(4) OVER (ORDER BY cents, o_custkey) AS BIGINT) "
            "AS m_score FROM a) "
            "SELECT o_custkey, r_score, f_score, m_score, "
            "100 * r_score + 10 * f_score + m_score AS rfm_code FROM s"),
        "value_decile_matrix": (
            "WITH s AS (SELECT event_type, "
            "NTILE(10) OVER (ORDER BY value, event_id) AS decile "
            "FROM events) "
            "SELECT event_type, CAST(decile AS BIGINT) AS decile, "
            "CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1, 2"),
        "user_active_day_streaks": (
            "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
            "FROM events), "
            "g AS (SELECT user_id, day, day - to_days(CAST(ROW_NUMBER() "
            "OVER (PARTITION BY user_id ORDER BY day) AS INT)) AS grp "
            "FROM d), "
            "s AS (SELECT user_id, grp, count(*) AS streak FROM g "
            "GROUP BY 1, 2) "
            "SELECT user_id, CAST(SUM(streak) AS BIGINT) AS "
            "n_active_days, CAST(MAX(streak) AS BIGINT) AS "
            "longest_streak FROM s GROUP BY 1"),
        "mutual_top_partner_nations": (
            "WITH v AS (SELECT n1.n_name AS a, n2.n_name AS b, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS volume "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
            "WHERE n1.n_name <> n2.n_name GROUP BY 1, 2), "
            "t AS (SELECT a, b, volume, ROW_NUMBER() OVER "
            "(PARTITION BY a ORDER BY volume DESC, b) AS rn FROM v) "
            "SELECT t1.a AS nation_a, t1.b AS nation_b, "
            "t1.volume AS volume_ab, t2.volume AS volume_ba "
            "FROM t t1 JOIN t t2 ON t1.b = t2.a AND t2.b = t1.a "
            "WHERE t1.rn = 1 AND t2.rn = 1 AND t1.a < t1.b"),
        "embedding_quantize_int8": (
            "WITH m AS (SELECT vec_id, "
            "[CAST(x AS DOUBLE) FOR x IN embedding] AS e, "
            "list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]) AS mx "
            "FROM embeddings), "
            "q AS (SELECT vec_id, mx, "
            "[CAST(trunc(127 * x / mx) AS BIGINT) FOR x IN e] AS qs "
            "FROM m) "
            "SELECT vec_id, CAST(list_sum(qs) AS BIGINT) AS q_sum, "
            "CAST(list_min(qs) AS BIGINT) AS q_min, "
            "CAST(list_max(qs) AS BIGINT) AS q_max, "
            "CAST(trunc(mx * 1000000) AS BIGINT) AS scale_e6 FROM q"),
        "daily_new_vs_returning": (
            "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
            "FROM events), "
            "f AS (SELECT user_id, MIN(day) AS first_day FROM d "
            "GROUP BY 1) "
            "SELECT CAST(day AS TIMESTAMP) AS day, "
            "CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) "
            "AS BIGINT) AS new_users, "
            "CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) "
            "AS BIGINT) AS returning_users "
            "FROM d JOIN f USING (user_id) GROUP BY 1"),
        "lang_balanced_sample": (
            "SELECT doc_id, lang, smp_rank AS sample_rank FROM ("
            "SELECT doc_id, lang, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY lang ORDER BY "
            f"({_fold48_sql('md5(CAST(doc_id AS VARCHAR))')}), doc_id) "
            "AS BIGINT) AS smp_rank FROM documents) "
            "WHERE smp_rank <= 40"),
        "coordered_part_pairs": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem) "
            "SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
            "CAST(count(*) AS BIGINT) AS n_orders "
            "FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey "
            "GROUP BY 1, 2 ORDER BY n_orders DESC, part_a, part_b "
            "LIMIT 20"),
        "jaccard_pairs_prefix": (
            "WITH s AS (SELECT doc_id, "
            "list_distinct(string_split(text, ' ')) AS toks "
            "FROM documents) "
            "SELECT a.doc_id AS a_id, b.doc_id AS b_id, "
            "CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) "
            "AS inter_size, "
            "CAST(len(list_distinct(a.toks || b.toks)) AS BIGINT) "
            "AS union_size "
            "FROM s a JOIN s b ON a.doc_id < b.doc_id "
            "WHERE len(list_intersect(a.toks, b.toks)) * 5 >= "
            "4 * len(list_distinct(a.toks || b.toks))"),
        "dim_correlation_topk": (
            "WITH q AS (SELECT vec_id, "
            "[CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) "
            "FOR x IN embedding] AS e FROM embeddings), "
            "d AS (SELECT CAST(i - 1 AS BIGINT) AS dim_a, "
            "CAST(j - 1 AS BIGINT) AS dim_b, "
            "CAST(SUM(e[CAST(i AS INT)] * e[CAST(j AS INT)]) AS BIGINT) "
            "AS dot_e8 "
            "FROM q, range(1, 65) ri(i), range(1, 65) rj(j) "
            "WHERE i < j GROUP BY 1, 2) "
            "SELECT dim_a, dim_b, dot_e8 FROM d "
            "ORDER BY dot_e8 DESC, dim_a, dim_b LIMIT 20"),
        "part_graph_bfs": (
            "WITH RECURSIVE e AS (SELECT DISTINCT a.l_partkey AS src, "
            "b.l_partkey AS dst FROM lineitem a "
            "JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey <> b.l_partkey), "
            "bfs(part_id, d) AS ("
            "SELECT (SELECT min(p_partkey) FROM part), 0 "
            "UNION "
            "SELECT e.dst, bfs.d + 1 FROM bfs "
            "JOIN e ON bfs.part_id = e.src WHERE bfs.d < 3) "
            "SELECT part_id, CAST(MIN(d) AS BIGINT) AS dist "
            "FROM bfs GROUP BY 1"),
        "ngram_novelty_ratio": (
            "WITH g AS (SELECT DISTINCT doc_id, gram FROM ("
            "SELECT doc_id, unnest([array_to_string(t[CAST(i AS INT):"
            "CAST(i AS INT)+2], ' ') FOR i IN range(1, len(t) - 1)]) "
            "AS gram FROM (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents) WHERE len(t) >= 3)), "
            "df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1) "
            "SELECT doc_id, CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_unique_grams, "
            "CAST(count(*) AS BIGINT) AS n_grams "
            "FROM g JOIN df USING (gram) GROUP BY 1"),
        "fulfillment_lag_histogram": (
            "WITH j AS (SELECT date_diff('day', "
            "CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) "
            "AS lag FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey) "
            "SELECT CAST(floor(lag / 7.0) AS BIGINT) AS bucket_week, "
            "CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(min(lag) AS BIGINT) AS min_lag_days, "
            "CAST(max(lag) AS BIGINT) AS max_lag_days "
            "FROM j GROUP BY 1"),
        "user_top_value_share": (
            "WITH a AS (SELECT user_id, "
            "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS total_cents, "
            "CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS max_c FROM events GROUP BY 1) "
            "SELECT user_id, total_cents, "
            "CAST(CASE WHEN total_cents = 0 THEN 0 ELSE "
            "(1000000 * max_c) // total_cents END AS BIGINT) "
            "AS top_share_ppm FROM a"),
        "nation_supplier_hhi": (
            "WITH sc AS (SELECT n_name, s_suppkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS c FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey GROUP BY 1, 2), "
            "t AS (SELECT n_name, "
            "(1000000 * c) // SUM(c) OVER (PARTITION BY n_name) "
            "AS share_ppm FROM sc) "
            "SELECT n_name, CAST(SUM(share_ppm * share_ppm) AS BIGINT) "
            "AS hhi_ppm2, CAST(count(*) AS BIGINT) AS n_suppliers "
            "FROM t GROUP BY 1"),
        "user_activity_bitmask": (
            "WITH d AS (SELECT DISTINCT user_id, date_diff('day', "
            "DATE '2024-01-01', CAST(ts AS DATE)) AS off FROM events) "
            "SELECT user_id, "
            "CAST(SUM(CAST(1 AS BIGINT) << CAST(off AS INT)) AS BIGINT) "
            "AS mask, CAST(count(*) AS BIGINT) AS n_days "
            "FROM d WHERE off >= 0 AND off < 63 GROUP BY 1"),
        "part_skyline": (
            "WITH p AS (SELECT p_partkey, "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents, "
            "CAST(p_size AS BIGINT) AS p_size FROM part) "
            "SELECT p_partkey, price_cents, p_size FROM p a "
            "WHERE NOT EXISTS (SELECT 1 FROM p b WHERE "
            "b.price_cents <= a.price_cents AND b.p_size >= a.p_size "
            "AND (b.price_cents < a.price_cents "
            "OR b.p_size > a.p_size))"),
        "customers_all_priorities": (
            "SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders GROUP BY 1 "
            "HAVING count(DISTINCT o_orderpriority) = "
            "(SELECT count(DISTINCT o_orderpriority) FROM orders)"),
        "part_price_band_pairs": (
            "WITH p AS (SELECT p_partkey, p_brand, "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS cents "
            "FROM part) "
            "SELECT a.p_partkey AS part_a, b.p_partkey AS part_b, "
            "CAST(abs(a.cents - b.cents) AS BIGINT) AS price_diff_cents "
            "FROM p a JOIN p b ON a.p_brand = b.p_brand "
            "AND a.p_partkey < b.p_partkey "
            "AND abs(a.cents - b.cents) <= 100"),
        "weighted_median_price": (
            "WITH w AS (SELECT CAST(round(l_extendedprice * 100) "
            "AS BIGINT) AS c, CAST(round(l_quantity) AS BIGINT) AS q "
            "FROM lineitem), "
            "o AS (SELECT c, SUM(q) OVER (ORDER BY c) AS cw, "
            "(SELECT SUM(q) FROM w) AS tw FROM w) "
            "SELECT CAST(MIN(c) AS BIGINT) AS median_cents, "
            "CAST((SELECT SUM(q) FROM w) AS BIGINT) AS total_weight "
            "FROM o WHERE 2 * cw >= tw"),
        "user_type_signature": (
            "WITH s AS (SELECT user_id, string_agg(DISTINCT event_type, "
            "',' ORDER BY event_type) AS signature FROM events "
            "GROUP BY 1) "
            "SELECT signature, CAST(count(*) AS BIGINT) AS n_users "
            "FROM s GROUP BY 1"),
        "orders_above_group_median": (
            "WITH m AS (SELECT o_orderpriority, "
            "quantile_disc(o_totalprice, 0.5) AS med FROM orders "
            "GROUP BY 1) "
            "SELECT o.o_orderpriority, "
            "CAST(round(MIN(med) * 100) AS BIGINT) AS median_cents, "
            "CAST(SUM(CASE WHEN o_totalprice > med THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_above, "
            "CAST(count(*) AS BIGINT) AS n_total "
            "FROM orders o JOIN m USING (o_orderpriority) GROUP BY 1"),
        "dedup_keep_longest": (
            "SELECT doc_id, n_chars FROM ("
            "SELECT doc_id, n_chars, ROW_NUMBER() OVER ("
            "PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id) "
            "AS rn FROM documents) WHERE rn = 1"),
        "customer_status_asof": (
            "SELECT o_custkey, o_orderkey, o_orderstatus, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents "
            "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn "
            "FROM orders WHERE o_orderdate <= TIMESTAMP '1995-06-30') "
            "WHERE rn = 1"),
        "doc_char_class_profile": (
            "SELECT doc_id, "
            "CAST(length(text) - length(regexp_replace(text, '[a-z]', "
            "'', 'g')) AS BIGINT) AS n_letters, "
            "CAST(length(text) - length(replace(text, ' ', '')) "
            "AS BIGINT) AS n_spaces, "
            "CAST(length(text) - length(regexp_replace(text, "
            "'[aeiou]', '', 'g')) AS BIGINT) AS n_vowels "
            "FROM documents"),
        "value_first_digit_hist": (
            "WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS c "
            "FROM events WHERE round(value * 100) > 0) "
            "SELECT CAST(left(CAST(c AS VARCHAR), 1) AS BIGINT) "
            "AS digit, CAST(count(*) AS BIGINT) AS n, "
            "CAST(min(c) AS BIGINT) AS min_cents, "
            "CAST(max(c) AS BIGINT) AS max_cents FROM c GROUP BY 1"),
        "monthly_revenue_growth_ppm": (
            "WITH m AS (SELECT date_trunc('month', o_orderdate) "
            "AS month, CAST(SUM(CAST(round(o_totalprice * 100) "
            "AS BIGINT)) AS BIGINT) AS cents FROM orders GROUP BY 1), "
            "w AS (SELECT CAST(month AS TIMESTAMP) AS month, cents "
            "AS revenue_cents, LAG(cents) OVER (ORDER BY month) "
            "AS prev_cents FROM m) "
            "SELECT month, revenue_cents, "
            "CAST(prev_cents AS BIGINT) AS prev_cents, "
            "CAST(floor(1000000.0 * (revenue_cents - prev_cents) "
            "/ prev_cents) AS BIGINT) AS growth_ppm "
            "FROM w WHERE prev_cents IS NOT NULL"),
        "part_supplier_degree_hist": (
            "WITH d AS (SELECT l_partkey, "
            "count(DISTINCT l_suppkey) AS n_suppliers "
            "FROM lineitem GROUP BY 1) "
            "SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers, "
            "CAST(count(*) AS BIGINT) AS n_parts FROM d GROUP BY 1"),
        "top_tokens_per_lang": (
            "WITH c AS (SELECT lang, "
            "unnest(string_split(text, ' ')) AS tok FROM documents), "
            "a AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS n "
            "FROM c GROUP BY 1, 2) "
            "SELECT lang, tok, n, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY lang ORDER BY n DESC, tok) AS BIGINT) AS rnk "
            "FROM a QUALIFY rnk <= 5"),
        "parts_never_ordered": (
            "SELECT p_partkey, p_brand FROM part "
            "WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)"),
        "event_round_value_bias": (
            "WITH c AS (SELECT event_type, "
            "CAST(round(value * 100) AS BIGINT) AS c FROM events) "
            "SELECT event_type, "
            "CAST(SUM(CASE WHEN c % 100 = 0 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_whole_dollar, "
            "CAST(SUM(CASE WHEN c % 1000 = 0 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_whole_ten, "
            "CAST(count(*) AS BIGINT) AS n_total FROM c GROUP BY 1"),
        "token_length_hist": (
            "SELECT CAST(length(tok) AS BIGINT) AS tok_len, "
            "CAST(count(*) AS BIGINT) AS n FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1"),
        "part_triangle_count": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "w AS (SELECT count(*) AS nw FROM e e1 "
            "JOIN e e2 ON e1.v = e2.u), "
            "t AS (SELECT count(*) AS nt FROM e e1 "
            "JOIN e e2 ON e1.v = e2.u "
            "JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) "
            "SELECT CAST(nt AS BIGINT) AS n_triangles, "
            "(SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges, "
            "CAST(nw AS BIGINT) AS n_wedges FROM t, w"),
        "token_first_seen_hist": (
            "WITH f AS (SELECT tok, MIN(doc_id) AS first_doc FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1) "
            "SELECT CAST(first_doc // 64 AS BIGINT) AS doc_bucket, "
            "CAST(count(*) AS BIGINT) AS n_new_tokens FROM f "
            "GROUP BY 1"),
        "doc_intra_repeat_positions": (
            "WITH c AS (SELECT doc_id, "
            "unnest([i FOR i IN range(1, len(t) - 6)]) AS i, "
            "unnest([array_to_string(t[CAST(i AS INT):CAST(i AS INT)+7]"
            ", ' ') FOR i IN range(1, len(t) - 6)]) AS ch "
            "FROM (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents) WHERE len(t) >= 8), "
            "m AS (SELECT doc_id, i, MIN(i) OVER ("
            "PARTITION BY doc_id, ch) AS fi FROM c) "
            "SELECT doc_id, CAST(SUM(CASE WHEN i > fi THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_repeat_positions, "
            "CAST(count(*) AS BIGINT) AS n_positions "
            "FROM m GROUP BY 1"),
        "orders_open_per_day": (
            "WITH del AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "1 AS delta FROM orders UNION ALL "
            "SELECT CAST(o_orderdate AS DATE) + to_days(30), -1 "
            "FROM orders), "
            "agg AS (SELECT day, SUM(delta) AS d FROM del GROUP BY 1), "
            "spine AS (SELECT (SELECT min(day) FROM agg) + "
            "to_days(CAST(i AS INT)) AS day FROM range(0, 100000) r(i) "
            "WHERE i < (SELECT date_diff('day', min(day), max(day)) + 1 "
            "FROM agg)), "
            "lv AS (SELECT spine.day, SUM(COALESCE(agg.d, 0)) OVER ("
            "ORDER BY spine.day) AS n_open FROM spine "
            "LEFT JOIN agg USING (day)) "
            "SELECT CAST(day AS TIMESTAMP) AS day, "
            "CAST(n_open AS BIGINT) AS n_open FROM lv "
            "WHERE n_open > 0"),
        "knn_label_vote": (
            "WITH q AS (SELECT vec_id, label, "
            "[CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) "
            "FOR x IN embedding] AS e FROM embeddings), "
            "d AS (SELECT a.vec_id AS qa, a.label AS la, "
            "b.vec_id AS vb, b.label AS lb, "
            "list_sum([a.e[CAST(k AS INT)] * b.e[CAST(k AS INT)] "
            "FOR k IN range(1, 65)]) AS dot "
            "FROM q a JOIN q b ON a.vec_id <> b.vec_id), "
            "r AS (SELECT qa, la, lb, ROW_NUMBER() OVER ("
            "PARTITION BY qa ORDER BY dot DESC, vb) AS rn FROM d), "
            "v AS (SELECT qa, la, lb, count(*) AS c FROM r "
            "WHERE rn <= 5 GROUP BY 1, 2, 3), "
            "p AS (SELECT qa, la, lb AS pred, ROW_NUMBER() OVER ("
            "PARTITION BY qa ORDER BY c DESC, lb) AS pr FROM v) "
            "SELECT CAST(la AS BIGINT) AS true_label, "
            "CAST(pred AS BIGINT) AS pred_label, "
            "CAST(count(*) AS BIGINT) AS n FROM p WHERE pr = 1 "
            "GROUP BY 1, 2"),
        "user_burst_max_5min": (
            "SELECT a.user_id, CAST(MAX(c) AS BIGINT) AS max_burst, "
            "CAST(MAX(tot) AS BIGINT) AS n_events FROM ("
            "SELECT a.user_id, a.event_id, count(*) AS c, "
            "(SELECT count(*) FROM events x "
            "WHERE x.user_id = a.user_id) AS tot "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE "
            "GROUP BY 1, 2, a.user_id) a GROUP BY 1"),
        "repeat_purchase_stats": (
            "WITH t AS (SELECT DISTINCT o_custkey, l_partkey, "
            "l_orderkey FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey), "
            "p AS (SELECT o_custkey, l_partkey, count(*) AS n "
            "FROM t GROUP BY 1, 2) "
            "SELECT CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_repeat_pairs, "
            "CAST(MAX(n) AS BIGINT) AS max_repeats FROM p"),
        "dup_cluster_size_hist": (
            "WITH f AS (SELECT md5(text) AS fp, count(*) AS n "
            "FROM documents GROUP BY 1) "
            "SELECT CAST(n AS BIGINT) AS cluster_size, "
            "CAST(count(*) AS BIGINT) AS n_clusters FROM f GROUP BY 1"),
        "supplier_revenue_pctile": (
            "WITH sc AS (SELECT n_name, s_suppkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS cents FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey GROUP BY 1, 2), "
            "r AS (SELECT n_name, s_suppkey, cents, "
            "RANK() OVER (PARTITION BY n_name ORDER BY cents) AS rnk, "
            "COUNT(*) OVER (PARTITION BY n_name) AS cnt FROM sc) "
            "SELECT n_name, s_suppkey, cents, "
            "CAST(CASE WHEN cnt = 1 THEN 0 ELSE "
            "((rnk - 1) * 1000000) // (cnt - 1) END AS BIGINT) "
            "AS pct_ppm FROM r"),
        "lang_source_lift": (
            "WITH c AS (SELECT lang, source, count(*) AS n_ab "
            "FROM documents GROUP BY 1, 2), "
            "a AS (SELECT lang, SUM(n_ab) AS n_a FROM c GROUP BY 1), "
            "b AS (SELECT source, SUM(n_ab) AS n_b FROM c GROUP BY 1), "
            "n AS (SELECT SUM(n_ab) AS n FROM c) "
            "SELECT lang, source, CAST(n_ab AS BIGINT) AS n_ab, "
            "CAST((n.n * n_ab * 1000000) // (a.n_a * b.n_b) AS BIGINT) "
            "AS lift_ppm FROM c JOIN a USING (lang) "
            "JOIN b USING (source) CROSS JOIN n"),
        "token_pair_lift_topk": (
            "WITH td AS (SELECT DISTINCT doc_id, "
            "unnest(string_split(text, ' ')) AS tok FROM documents), "
            "m AS (SELECT tok, count(*) AS df FROM td GROUP BY 1), "
            "p AS (SELECT a.tok AS tok_a, b.tok AS tok_b, "
            "count(*) AS n_ab FROM td a JOIN td b "
            "ON a.doc_id = b.doc_id AND a.tok < b.tok GROUP BY 1, 2), "
            "n AS (SELECT count(*) AS n FROM documents) "
            "SELECT tok_a, tok_b, CAST(n_ab AS BIGINT) AS n_ab, "
            "CAST((n.n * n_ab * 1000000) // (ma.df * mb.df) AS BIGINT) "
            "AS lift_ppm FROM p JOIN m ma ON ma.tok = p.tok_a "
            "JOIN m mb ON mb.tok = p.tok_b CROSS JOIN n "
            "WHERE n_ab >= 5 "
            "ORDER BY lift_ppm DESC, tok_a, tok_b LIMIT 20"),
        "session_bounce_stats": (
            "WITH s AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL OR "
            "epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END "
            "AS brk FROM events WINDOW w AS ("
            "PARTITION BY user_id ORDER BY ts, event_id)), "
            "g AS (SELECT user_id, event_type, ts, event_id, "
            "SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS sid FROM s), "
            "a AS (SELECT user_id, sid, count(*) AS ne, "
            "first(event_type ORDER BY ts, event_id) AS ft "
            "FROM g GROUP BY 1, 2) "
            "SELECT ft AS first_event_type, "
            "CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(SUM(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_bounce FROM a GROUP BY 1"),
        "events_peak_hour_per_type": (
            "WITH c AS (SELECT event_type, "
            "CAST(hour(ts) AS BIGINT) AS hour, count(*) AS n "
            "FROM events GROUP BY 1, 2), "
            "r AS (SELECT event_type, hour, n, ROW_NUMBER() OVER ("
            "PARTITION BY event_type ORDER BY n DESC, hour) AS rn "
            "FROM c) "
            "SELECT event_type, hour AS peak_hour, "
            "CAST(n AS BIGINT) AS n_events FROM r WHERE rn = 1"),
        "revenue_abc_classification": (
            "WITH p AS (SELECT l_partkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS cents FROM lineitem GROUP BY 1), "
            "r AS (SELECT cents, SUM(cents) OVER (ORDER BY cents DESC, "
            "l_partkey ROWS UNBOUNDED PRECEDING) * 1000000 // "
            "(SELECT SUM(cents) FROM p) AS share_ppm FROM p), "
            "c AS (SELECT cents, CASE WHEN share_ppm <= 800000 THEN 'A' "
            "WHEN share_ppm <= 950000 THEN 'B' ELSE 'C' END AS "
            "abc_class FROM r) "
            "SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts, "
            "CAST(SUM(cents) AS BIGINT) AS revenue_cents "
            "FROM c GROUP BY 1"),
        "trimmed_price_sum": (
            "WITH w AS (SELECT CAST(round(l_extendedprice * 100) "
            "AS BIGINT) AS c FROM lineitem), "
            "kk AS (SELECT (50000 * count(*)) // 1000000 AS k, "
            "count(*) AS n FROM w), "
            "r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn "
            "FROM w) "
            "SELECT CAST(SUM(c) AS BIGINT) AS sum_trimmed_cents, "
            "CAST(count(*) AS BIGINT) AS n_trimmed, "
            "CAST((SELECT k FROM kk) AS BIGINT) AS k_each_side "
            "FROM r WHERE rn > (SELECT k FROM kk) "
            "AND rn <= (SELECT n - k FROM kk)"),
        "supplier_first_month_cohort": (
            "WITH f AS (SELECT l_suppkey, MIN(l_shipdate) AS fd "
            "FROM lineitem GROUP BY 1) "
            "SELECT CAST(date_trunc('month', fd) AS TIMESTAMP) "
            "AS cohort_month, CAST(count(*) AS BIGINT) AS n_suppliers "
            "FROM f GROUP BY 1"),
        "order_total_consistency": (
            "WITH ls AS (SELECT l_orderkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS line_cents FROM lineitem GROUP BY 1), "
            "j AS (SELECT abs(CAST(round(o_totalprice * 100) AS BIGINT) "
            "- line_cents) AS d FROM ls JOIN orders "
            "ON l_orderkey = o_orderkey) "
            "SELECT CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_exact, "
            "CAST(MAX(d) AS BIGINT) AS max_abs_diff_cents FROM j"),
        "lineitem_linenumber_gaps": (
            "WITH a AS (SELECT l_orderkey, count(*) AS c, "
            "count(DISTINCT l_linenumber) AS dc, "
            "max(l_linenumber) AS mx FROM lineitem GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CASE WHEN mx <> c OR dc <> c THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_gapped FROM a"),
        "embedding_norm_outlier_ids": (
            "WITH n AS (SELECT vec_id, CAST(list_sum("
            "[CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) * "
            "CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) "
            "FOR x IN embedding]) AS BIGINT) AS norm2_e8 "
            "FROM embeddings) "
            "SELECT vec_id, norm2_e8 FROM n WHERE norm2_e8 > "
            "(SELECT quantile_disc(norm2_e8, 0.99) FROM n)"),
        "order_value_concentration_hist": (
            "WITH p AS (SELECT l_orderkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS s, "
            "CAST(MAX(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS m FROM lineitem GROUP BY 1), "
            "b AS (SELECT CASE WHEN s > 0 THEN (1000000 * m) // s "
            "ELSE 0 END AS ppm FROM p) "
            "SELECT CAST(ppm // 100000 AS BIGINT) AS share_bucket, "
            "CAST(count(*) AS BIGINT) AS n_orders FROM b GROUP BY 1"),
        "doc_hash_shard_balance": (
            "WITH s AS (SELECT "
            f"({_fold48_sql('md5(CAST(doc_id AS VARCHAR))')}) % 16 "
            "AS shard, n_chars FROM documents) "
            "SELECT CAST(shard AS BIGINT) AS shard, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM s "
            "GROUP BY 1"),
        "docs_with_phrase": (
            "SELECT doc_id FROM documents "
            "WHERE strpos(' ' || text || ' ', ' key agg row ') > 0"),
        "top_revenue_day_per_nation": (
            "WITH c AS (SELECT n_name, "
            "CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS cents FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey GROUP BY 1, 2), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name "
            "ORDER BY cents DESC, day) AS rn FROM c) "
            "SELECT n_name, day AS peak_day, cents AS revenue_cents "
            "FROM r WHERE rn = 1"),
        "lineitem_quantity_mode": (
            "WITH c AS (SELECT CAST(round(l_quantity) AS BIGINT) "
            "AS qty, count(*) AS n FROM lineitem GROUP BY 1), "
            "r AS (SELECT qty, n, ROW_NUMBER() OVER ("
            "ORDER BY n DESC, qty) AS rn FROM c) "
            "SELECT (SELECT CAST(qty AS BIGINT) FROM r WHERE rn = 1) "
            "AS mode_qty, "
            "(SELECT CAST(n AS BIGINT) FROM r WHERE rn = 1) "
            "AS n_occurrences, "
            "(SELECT CAST(count(*) AS BIGINT) FROM c) AS n_distinct"),
        "part_revenue_gini_ppm": (
            "WITH p AS (SELECT l_partkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS cents FROM lineitem GROUP BY 1), "
            "r AS (SELECT cents, ROW_NUMBER() OVER ("
            "ORDER BY cents, l_partkey) AS rn, "
            "count(*) OVER () AS n FROM p) "
            "SELECT CAST(SUM((2 * rn - n - 1) * cents) * 1000000 // "
            "(MAX(n) * SUM(cents)) AS BIGINT) AS gini_ppm, "
            "CAST(MAX(n) AS BIGINT) AS n_parts, "
            "CAST(SUM(cents) AS BIGINT) AS total_cents FROM r"),
        "customer_year_overlap_matrix": (
            "WITH d AS (SELECT DISTINCT o_custkey, "
            "CAST(year(o_orderdate) AS BIGINT) AS y FROM orders) "
            "SELECT a.y AS year_a, b.y AS year_b, "
            "CAST(count(*) AS BIGINT) AS n_customers "
            "FROM d a JOIN d b ON a.o_custkey = b.o_custkey "
            "AND a.y <= b.y GROUP BY 1, 2"),
        "view_to_purchase_lag_hist": (
            "WITH f AS (SELECT user_id, event_type, min(ts) AS t "
            "FROM events WHERE event_type IN ('view', 'purchase') "
            "GROUP BY 1, 2), "
            "v AS (SELECT a.user_id, CAST(epoch_us(b.t) - "
            "epoch_us(a.t) AS BIGINT) AS lag_us FROM f a "
            "JOIN f b ON a.user_id = b.user_id "
            "AND a.event_type = 'view' AND b.event_type = 'purchase') "
            "SELECT CAST((lag_us // 1000000) // 3600 AS BIGINT) "
            "AS lag_bucket, CAST(count(*) AS BIGINT) AS n_users "
            "FROM v WHERE lag_us >= 0 GROUP BY 1"),
        "token_zipf_ranks": (
            "WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n "
            "FROM (SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1) "
            "SELECT tok, n AS n_occurrences, "
            "CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS BIGINT) "
            "AS freq_rank FROM c"),
        "supplier_quadrant_counts": (
            "WITH rev AS (SELECT l_suppkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS rv FROM lineitem GROUP BY 1), "
            "r AS (SELECT s_suppkey, "
            "CAST(round(s_acctbal * 100) AS BIGINT) AS bal, "
            "COALESCE(rv, 0) AS rv FROM supplier "
            "LEFT JOIN rev ON s_suppkey = l_suppkey), "
            "m AS (SELECT quantile_disc(bal, 0.5) AS mb, "
            "quantile_disc(rv, 0.5) AS mr FROM r) "
            "SELECT CASE WHEN bal > mb AND rv > mr THEN 'hb_hr' "
            "WHEN bal > mb THEN 'hb_lr' WHEN rv > mr THEN 'lb_hr' "
            "ELSE 'lb_lr' END AS quadrant, "
            "CAST(count(*) AS BIGINT) AS n_suppliers "
            "FROM r, m GROUP BY 1"),
        "doc_ttr_ppm": (
            "SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, "
            "CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct, "
            "CAST(CASE WHEN len(t) = 0 THEN 0 ELSE "
            "(1000000 * len(list_distinct(t))) // len(t) END AS BIGINT) "
            "AS ttr_ppm FROM (SELECT doc_id, "
            "string_split(text, ' ') AS t FROM documents)"),
        "user_value_milestone": (
            "WITH s AS (SELECT user_id, event_id, "
            "SUM(CAST(round(value * 100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS cum, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events), "
            "f AS (SELECT user_id, event_id, rn, cum, "
            "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) "
            "AS hitrank FROM s WHERE cum >= 10000) "
            "SELECT user_id, event_id, "
            "CAST(rn AS BIGINT) AS n_events_to_milestone, "
            "CAST(cum AS BIGINT) AS cum_cents FROM f "
            "WHERE hitrank = 1"),
        "part_name_bigram_topk": (
            "WITH g AS (SELECT unnest([t[CAST(i AS INT)] || ' ' || "
            "t[CAST(i AS INT) + 1] FOR i IN range(1, len(t))]) "
            "AS bigram FROM (SELECT string_split(p_name, ' ') AS t "
            "FROM part)) "
            "SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM g "
            "GROUP BY 1 ORDER BY n DESC, bigram LIMIT 10"),
        "user_second_event_type_dist": (
            "WITH s AS (SELECT user_id, event_type, ROW_NUMBER() OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS rn "
            "FROM events) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_users "
            "FROM s WHERE rn = 2 GROUP BY 1"),
        "user_longest_increasing_run": (
            "WITH s AS (SELECT user_id, ts, event_id, "
            "CAST(round(value * 100) AS BIGINT) AS c, "
            "LAG(CAST(round(value * 100) AS BIGINT)) OVER w AS prev "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)), "
            "g AS (SELECT user_id, SUM(CASE WHEN prev IS NULL "
            "OR c <= prev THEN 1 ELSE 0 END) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM s), "
            "runs AS (SELECT user_id, sid, count(*) AS run "
            "FROM g GROUP BY 1, 2) "
            "SELECT user_id, CAST(MAX(run) AS BIGINT) AS longest_run, "
            "CAST(SUM(run) AS BIGINT) AS n_events FROM runs "
            "GROUP BY 1"),
        "order_seasonality_index": (
            "WITH m AS (SELECT CAST(month(o_orderdate) AS BIGINT) "
            "AS month_of_year, "
            "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents FROM orders GROUP BY 1) "
            "SELECT month_of_year, revenue_cents, "
            "CAST(revenue_cents * 12 * 1000000 // "
            "(SELECT SUM(revenue_cents) FROM m) AS BIGINT) "
            "AS seasonality_ppm FROM m"),
        "embedding_dim_range": (
            "SELECT CAST(k - 1 AS BIGINT) AS dim, "
            "CAST(MIN(CAST(round(CAST(embedding[CAST(k AS INT)] "
            "AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS min_e4, "
            "CAST(MAX(CAST(round(CAST(embedding[CAST(k AS INT)] "
            "AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS max_e4 "
            "FROM embeddings, range(1, 65) r(k) GROUP BY 1"),
        "doc_top_token": (
            "WITH c AS (SELECT doc_id, tok, count(*) AS n FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1, 2), "
            "r AS (SELECT doc_id, tok, n, ROW_NUMBER() OVER ("
            "PARTITION BY doc_id ORDER BY n DESC, tok) AS rn FROM c) "
            "SELECT doc_id, tok AS top_token, "
            "CAST(n AS BIGINT) AS n_occurrences FROM r WHERE rn = 1"),
        "label_peak_dim": (
            "WITH s AS (SELECT CAST(label AS BIGINT) AS label, "
            "CAST(k - 1 AS BIGINT) AS dim, "
            "CAST(SUM(CAST(round(CAST(embedding[CAST(k AS INT)] "
            "AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS s_e4 "
            "FROM embeddings, range(1, 65) r(k) GROUP BY 1, 2), "
            "r AS (SELECT label, dim, s_e4, ROW_NUMBER() OVER ("
            "PARTITION BY label ORDER BY abs(s_e4) DESC, dim) AS rn "
            "FROM s) "
            "SELECT label, dim AS peak_dim, s_e4 AS component_e4 "
            "FROM r WHERE rn = 1"),
        "docs_term_first_pos": (
            "SELECT doc_id, CAST(list_position("
            "string_split(text, ' '), 'key') AS BIGINT) AS first_pos "
            "FROM documents "
            "WHERE list_position(string_split(text, ' '), 'key') "
            "IS NOT NULL AND list_position(string_split(text, ' '), "
            "'key') > 0"),
        "discount_tax_joint_hist": (
            "SELECT CAST(round(l_discount * 100) AS BIGINT) "
            "AS disc_pct, CAST(round(l_tax * 100) AS BIGINT) "
            "AS tax_pct, CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents "
            "FROM lineitem GROUP BY 1, 2"),
        "customer_value_trend_counts": (
            "WITH a AS (SELECT o_custkey, "
            "first(CAST(round(o_totalprice * 100) AS BIGINT) "
            "ORDER BY o_orderdate, o_orderkey) AS f, "
            "last(CAST(round(o_totalprice * 100) AS BIGINT) "
            "ORDER BY o_orderdate, o_orderkey) AS l "
            "FROM orders GROUP BY 1) "
            "SELECT CAST(SUM(CASE WHEN l > f THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_up, "
            "CAST(SUM(CASE WHEN l < f THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_down, "
            "CAST(SUM(CASE WHEN l = f THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_flat FROM a"),
        "parts_multi_nation": (
            "WITH d AS (SELECT DISTINCT l_partkey, s_nationkey "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey) "
            "SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_nations "
            "FROM d GROUP BY 1 HAVING count(*) >= 3"),
        "top_value_events": (
            "SELECT event_id, user_id, event_type, "
            "CAST(round(value * 100) AS BIGINT) AS value_cents "
            "FROM events ORDER BY value_cents DESC, event_id "
            "LIMIT 10"),
        "event_weekend_share_ppm": (
            "WITH s AS (SELECT event_type, "
            "CAST(SUM(CASE WHEN isodow(ts) >= 6 THEN "
            "CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) "
            "AS weekend_cents, "
            "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS total_cents FROM events GROUP BY 1) "
            "SELECT event_type, weekend_cents, total_cents, "
            "CAST(CASE WHEN total_cents = 0 THEN 0 ELSE "
            "(1000000 * weekend_cents) // total_cents END AS BIGINT) "
            "AS weekend_share_ppm FROM s"),
        "global_event_gap_topk": (
            "WITH s AS (SELECT ts, LEAD(ts) OVER (ORDER BY ts) AS nxt "
            "FROM events), "
            "g AS (SELECT CAST(epoch_us(nxt) - epoch_us(ts) AS BIGINT) "
            "AS gap_us, ts FROM s WHERE nxt IS NOT NULL) "
            "SELECT gap_us, CAST(ts AS TIMESTAMP) AS start_ts "
            "FROM g ORDER BY gap_us DESC, ts LIMIT 10"),
        "source_vocab_jaccard": (
            "WITH d AS (SELECT DISTINCT source, tok FROM ("
            "SELECT source, unnest(string_split(text, ' ')) AS tok "
            "FROM documents)), "
            "i AS (SELECT a.source AS source_a, b.source AS source_b, "
            "count(*) AS n FROM d a JOIN d b ON a.tok = b.tok "
            "AND a.source < b.source GROUP BY 1, 2), "
            "sz AS (SELECT source, count(*) AS n FROM d GROUP BY 1) "
            "SELECT source_a, source_b, CAST(i.n AS BIGINT) "
            "AS inter_size, CAST(sa.n + sb.n - i.n AS BIGINT) "
            "AS union_size FROM i "
            "JOIN sz sa ON sa.source = i.source_a "
            "JOIN sz sb ON sb.source = i.source_b"),
        "nation_cr4_ppm": (
            "WITH sc AS (SELECT n_name, s_suppkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS c FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey GROUP BY 1, 2), "
            "r AS (SELECT n_name, c, ROW_NUMBER() OVER ("
            "PARTITION BY n_name ORDER BY c DESC, s_suppkey) AS rn "
            "FROM sc) "
            "SELECT n_name, CAST((1000000 * SUM(CASE WHEN rn <= 4 "
            "THEN c ELSE 0 END)) // SUM(c) AS BIGINT) AS cr4_ppm, "
            "CAST(count(*) AS BIGINT) AS n_suppliers FROM r "
            "GROUP BY 1"),
        "parts_above_brand_mean": (
            "WITH c AS (SELECT p_brand, "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS cents "
            "FROM part), "
            "s AS (SELECT p_brand, SUM(cents) AS sm, count(*) AS n "
            "FROM c GROUP BY 1) "
            "SELECT c.p_brand, CAST(SUM(CASE WHEN cents * n > sm "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_above, "
            "CAST(MAX(n) AS BIGINT) AS n_total "
            "FROM c JOIN s USING (p_brand) GROUP BY 1"),
        "weekly_stickiness_ppm": (
            "WITH d AS (SELECT DISTINCT user_id, date_diff('day', "
            "DATE '1970-01-01', CAST(ts AS DATE)) AS day FROM events), "
            "g AS (SELECT week, count(*) AS sum_dau, "
            "count(DISTINCT user_id) AS wau, "
            "count(DISTINCT day) AS n_days FROM ("
            "SELECT user_id, day, (day + 3) // 7 AS week FROM d) "
            "GROUP BY 1) "
            "SELECT CAST(week AS BIGINT) AS week, "
            "CAST(sum_dau AS BIGINT) AS sum_dau, "
            "CAST(wau AS BIGINT) AS wau, "
            "CAST(n_days AS BIGINT) AS n_days, "
            "CAST((1000000 * sum_dau) // (n_days * wau) AS BIGINT) "
            "AS stickiness_ppm FROM g"),
        "supplier_exclusive_parts": (
            "WITH d AS (SELECT DISTINCT l_partkey, l_suppkey "
            "FROM lineitem), "
            "e AS (SELECT l_partkey FROM d GROUP BY 1 "
            "HAVING count(*) = 1) "
            "SELECT l_suppkey, CAST(count(*) AS BIGINT) "
            "AS n_exclusive_parts FROM d JOIN e USING (l_partkey) "
            "GROUP BY 1"),
        "event_type_share_volatility": (
            "WITH c AS (SELECT CAST(ts AS DATE) AS day, event_type, "
            "count(*) AS n FROM events GROUP BY 1, 2), "
            "t AS (SELECT day, SUM(n) AS tot FROM c GROUP BY 1), "
            "sh AS (SELECT event_type, (1000000 * n) // tot AS ppm "
            "FROM c JOIN t USING (day)) "
            "SELECT event_type, CAST(MIN(ppm) AS BIGINT) "
            "AS min_share_ppm, CAST(MAX(ppm) AS BIGINT) "
            "AS max_share_ppm, CAST(MAX(ppm) - MIN(ppm) AS BIGINT) "
            "AS share_range_ppm FROM sh GROUP BY 1"),
        "price_last_digit_hist": (
            "SELECT CAST(CAST(round(l_extendedprice * 100) AS BIGINT) "
            "% 10 AS BIGINT) AS last_digit, "
            "CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1"),
        "user_resurrection_counts": (
            "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) "
            "AS day FROM events), "
            "g AS (SELECT user_id, date_diff('day', "
            "LAG(day) OVER (PARTITION BY user_id ORDER BY day), day) "
            "AS gap FROM d), "
            "u AS (SELECT user_id, SUM(CASE WHEN gap > 7 THEN 1 "
            "ELSE 0 END) AS n_resurrections FROM g GROUP BY 1) "
            "SELECT CAST(n_resurrections AS BIGINT) "
            "AS n_resurrections, CAST(count(*) AS BIGINT) AS n_users "
            "FROM u GROUP BY 1"),
        "doc_first_token_dist": (
            "SELECT string_split(text, ' ')[1] AS first_token, "
            "CAST(count(*) AS BIGINT) AS n_docs FROM documents "
            "GROUP BY 1"),
        "order_ship_span_hist": (
            "WITH p AS (SELECT l_orderkey, date_diff('day', "
            "CAST(min(l_shipdate) AS DATE), "
            "CAST(max(l_shipdate) AS DATE)) AS span "
            "FROM lineitem GROUP BY 1) "
            "SELECT CAST(span AS BIGINT) AS span_days, "
            "CAST(count(*) AS BIGINT) AS n_orders FROM p GROUP BY 1"),
        "user_type_loyalty": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS n "
            "FROM events GROUP BY 1, 2) "
            "SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events, "
            "CAST((1000000 * MAX(n)) // SUM(n) AS BIGINT) "
            "AS loyalty_ppm FROM c GROUP BY 1"),
        "supplier_active_months": (
            "WITH d AS (SELECT DISTINCT l_suppkey, "
            "date_trunc('month', l_shipdate) AS m FROM lineitem), "
            "a AS (SELECT l_suppkey, count(*) AS nm, "
            "date_diff('month', min(m), max(m)) + 1 AS span "
            "FROM d GROUP BY 1) "
            "SELECT l_suppkey, CAST(nm AS BIGINT) AS n_active_months, "
            "CAST(span AS BIGINT) AS span_months, "
            "CAST((1000000 * nm) // span AS BIGINT) AS coverage_ppm "
            "FROM a"),
        "token_cooccurrence_degree": (
            "WITH td AS (SELECT DISTINCT doc_id, "
            "unnest(string_split(text, ' ')) AS tok FROM documents), "
            "e AS (SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b "
            "FROM td a JOIN td b ON a.doc_id = b.doc_id "
            "AND a.tok < b.tok) "
            "SELECT tok, CAST(count(*) AS BIGINT) AS degree FROM ("
            "SELECT tok_a AS tok FROM e UNION ALL "
            "SELECT tok_b FROM e) GROUP BY 1"),
        "preferred_order_dow_dist": (
            "WITH c AS (SELECT o_custkey, isodow(o_orderdate) AS dow, "
            "count(*) AS n FROM orders GROUP BY 1, 2), "
            "r AS (SELECT o_custkey, dow, ROW_NUMBER() OVER ("
            "PARTITION BY o_custkey ORDER BY n DESC, dow) AS rn "
            "FROM c) "
            "SELECT CAST(dow AS BIGINT) AS preferred_dow, "
            "CAST(count(*) AS BIGINT) AS n_customers FROM r "
            "WHERE rn = 1 GROUP BY 1"),
        "doc_adjacent_repeat_counts": (
            "SELECT doc_id, CAST(COALESCE(list_sum([CASE WHEN "
            "t[CAST(i AS INT)] = t[CAST(i AS INT) + 1] THEN 1 ELSE 0 "
            "END FOR i IN range(1, len(t))]), 0) AS BIGINT) "
            "AS n_adjacent_repeats, CAST(len(t) AS BIGINT) AS n_tokens "
            "FROM (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents)"),
        "nation_customer_reach": (
            "WITH a AS (SELECT n_name, "
            "CAST(SUM(CASE WHEN c_custkey IN ("
            "SELECT o_custkey FROM orders) THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_active, "
            "CAST(count(*) AS BIGINT) AS n_customers "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY 1) "
            "SELECT n_name, n_active, n_customers, "
            "CAST((1000000 * n_active) // n_customers AS BIGINT) "
            "AS reach_ppm FROM a"),
        "top_order_value_jumps": (
            "WITH s AS (SELECT o_custkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) - "
            "LAG(CAST(round(o_totalprice * 100) AS BIGINT)) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) "
            "AS jump FROM orders), "
            "m AS (SELECT o_custkey, CAST(MAX(jump) AS BIGINT) "
            "AS jump_cents FROM s WHERE jump IS NOT NULL "
            "GROUP BY 1 HAVING MAX(jump) > 0) "
            "SELECT o_custkey, jump_cents FROM m "
            "ORDER BY jump_cents DESC, o_custkey LIMIT 10"),
        "event_minute_hist": (
            "SELECT CAST(minute(ts) AS BIGINT) AS minute, "
            "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1"),
        "user_weekend_ratio_hist": (
            "WITH u AS (SELECT user_id, "
            "SUM(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END) AS w, "
            "count(*) AS t FROM events GROUP BY 1) "
            "SELECT CAST(((1000000 * w) // t) // 100000 AS BIGINT) "
            "AS ratio_bucket, CAST(count(*) AS BIGINT) AS n_users "
            "FROM u GROUP BY 1"),
        "source_dup_stats": (
            "WITH f AS (SELECT source, md5(text) AS fp, count(*) AS n "
            "FROM documents GROUP BY 1, 2), "
            "a AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs, "
            "CAST(count(*) AS BIGINT) AS n_unique FROM f GROUP BY 1) "
            "SELECT source, n_docs, n_unique, "
            "CAST((1000000 * (n_docs - n_unique)) // n_docs AS BIGINT) "
            "AS dup_ratio_ppm FROM a"),
        "user_hour_bitmask": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "CAST(hour(ts) AS INT) AS h FROM events) "
            "SELECT user_id, CAST(SUM(CAST(1 AS BIGINT) << h) "
            "AS BIGINT) AS hour_mask, "
            "CAST(count(*) AS BIGINT) AS n_active_hours "
            "FROM d GROUP BY 1"),
        "part_name_collisions": (
            "WITH d AS (SELECT DISTINCT p_name, p_brand FROM part) "
            "SELECT p_name, CAST(count(*) AS BIGINT) AS n_brands "
            "FROM d GROUP BY 1 HAVING count(*) >= 2"),
        "referential_integrity_audit": (
            "SELECT 'lineitem.l_partkey->part' AS fk, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(CASE WHEN l_partkey NOT IN "
            "(SELECT p_partkey FROM part) THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_orphans FROM lineitem "
            "UNION ALL SELECT 'lineitem.l_suppkey->supplier', "
            "CAST(count(*) AS BIGINT), "
            "CAST(SUM(CASE WHEN l_suppkey NOT IN "
            "(SELECT s_suppkey FROM supplier) THEN 1 ELSE 0 END) "
            "AS BIGINT) FROM lineitem "
            "UNION ALL SELECT 'orders.o_custkey->customer', "
            "CAST(count(*) AS BIGINT), "
            "CAST(SUM(CASE WHEN o_custkey NOT IN "
            "(SELECT c_custkey FROM customer) THEN 1 ELSE 0 END) "
            "AS BIGINT) FROM orders "
            "UNION ALL SELECT 'customer.c_nationkey->nation', "
            "CAST(count(*) AS BIGINT), "
            "CAST(SUM(CASE WHEN c_nationkey NOT IN "
            "(SELECT n_nationkey FROM nation) THEN 1 ELSE 0 END) "
            "AS BIGINT) FROM customer"),
        "embedding_dim_sign_balance": (
            "WITH v AS (SELECT CAST(k - 1 AS BIGINT) AS dim, "
            "CAST(round(CAST(embedding[CAST(k AS INT)] AS DOUBLE) "
            "* 10000) AS BIGINT) AS q "
            "FROM embeddings, range(1, 65) r(k)) "
            "SELECT dim, "
            "CAST(SUM(CASE WHEN q > 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_pos, "
            "CAST(SUM(CASE WHEN q < 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_neg, "
            "CAST(SUM(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_zero FROM v GROUP BY 1"),
        "avg_token_len_by_lang": (
            "WITH t AS (SELECT lang, "
            "unnest(string_split(text, ' ')) AS tok FROM documents), "
            "k AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(SUM(length(tok)) AS BIGINT) AS tok_chars "
            "FROM t GROUP BY 1), "
            "d AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY 1) "
            "SELECT d.lang, d.n_docs, k.n_tokens, k.tok_chars, "
            "CAST((1000000 * k.tok_chars) // k.n_tokens AS BIGINT) "
            "AS avg_len_ppm FROM d JOIN k ON d.lang = k.lang"),
        "pagerank_nation_trade": (
            "WITH e AS (SELECT CAST(c.c_nationkey AS BIGINT) AS u, "
            "CAST(s.s_nationkey AS BIGINT) AS v, "
            "CAST(count(*) AS BIGINT) AS w FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2), "
            "ow AS (SELECT u, SUM(w) AS wout FROM e GROUP BY 1), "
            "n AS (SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation), "
            "p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM n), "
            "c1 AS (SELECT e.v AS id, SUM((p0.pr * e.w) // ow.wout) AS s "
            "FROM e JOIN p0 ON e.u = p0.id JOIN ow ON e.u = ow.u "
            "GROUP BY 1), "
            "p1 AS (SELECT n.id, CAST(150000 + "
            "(850 * COALESCE(c1.s, 0)) // 1000 AS BIGINT) AS pr "
            "FROM n LEFT JOIN c1 ON n.id = c1.id), "
            "c2 AS (SELECT e.v AS id, SUM((p1.pr * e.w) // ow.wout) AS s "
            "FROM e JOIN p1 ON e.u = p1.id JOIN ow ON e.u = ow.u "
            "GROUP BY 1), "
            "p2 AS (SELECT n.id, CAST(150000 + "
            "(850 * COALESCE(c2.s, 0)) // 1000 AS BIGINT) AS pr "
            "FROM n LEFT JOIN c2 ON n.id = c2.id), "
            "c3 AS (SELECT e.v AS id, SUM((p2.pr * e.w) // ow.wout) AS s "
            "FROM e JOIN p2 ON e.u = p2.id JOIN ow ON e.u = ow.u "
            "GROUP BY 1), "
            "p3 AS (SELECT n.id, CAST(150000 + "
            "(850 * COALESCE(c3.s, 0)) // 1000 AS BIGINT) AS pr "
            "FROM n LEFT JOIN c3 ON n.id = c3.id) "
            "SELECT id AS nationkey, pr AS pr_e6 FROM p3"),
        "brand_name_lcp": (
            "WITH a AS (SELECT p_brand, "
            "CAST(count(*) AS BIGINT) AS n_parts, "
            "min(p_name) AS mn, max(p_name) AS mx FROM part GROUP BY 1) "
            "SELECT p_brand, n_parts, CAST(COALESCE((SELECT MIN(i) "
            "FROM unnest(range(1, LEAST(length(mn), length(mx)) + 1)) "
            "t(i) WHERE substr(mn, CAST(i AS INT), 1) <> "
            "substr(mx, CAST(i AS INT), 1)) - 1, "
            "LEAST(length(mn), length(mx))) AS BIGINT) AS lcp_len "
            "FROM a"),
        "embedding_top2_dims": (
            "WITH v AS (SELECT vec_id, CAST(k - 1 AS BIGINT) AS dim, "
            "CAST(round(CAST(embedding[CAST(k AS INT)] AS DOUBLE) "
            "* 10000) AS BIGINT) AS q "
            "FROM embeddings, range(1, 65) r(k)), "
            "r AS (SELECT vec_id, dim, row_number() OVER ("
            "PARTITION BY vec_id ORDER BY q DESC, dim) AS rn FROM v), "
            "p AS (SELECT vec_id, "
            "MAX(CASE WHEN rn = 1 THEN dim END) AS dim1, "
            "MAX(CASE WHEN rn = 2 THEN dim END) AS dim2 "
            "FROM r WHERE rn <= 2 GROUP BY 1) "
            "SELECT dim1, dim2, CAST(count(*) AS BIGINT) AS n_vecs "
            "FROM p GROUP BY 1, 2"),
        "views_except_all_purchases": (
            "WITH c AS (SELECT user_id, "
            "SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nv, "
            "SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
            "AS np FROM events GROUP BY 1) "
            "SELECT user_id, CAST(nv - np AS BIGINT) AS surplus_views "
            "FROM c WHERE nv > np"),
        "pretrain_pipeline_docs": (
            "WITH d AS (SELECT min(doc_id) AS doc_id, text "
            "FROM documents GROUP BY text), "
            "q AS (SELECT doc_id, text FROM d WHERE "
            "len(string_split(text,' ')) BETWEEN 10 AND 5000 AND "
            "2 * len(list_filter(string_split(text,' '), x -> x IN "
            f"{_STOPLIST_SQL})) <= len(string_split(text,' '))) "
            "SELECT doc_id, text FROM q "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'"),
        "user_type_gini_ppm": (
            "WITH c AS (SELECT user_id, event_type, "
            "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) "
            "SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events, "
            "CAST(1000000 - (1000000 * SUM(n * n)) "
            "// (SUM(n) * SUM(n)) AS BIGINT) AS gini_ppm "
            "FROM c GROUP BY 1"),
        "global_gap_median_us": (
            "WITH o AS (SELECT user_id, "
            "epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id)) AS gap FROM events) "
            "SELECT 0.5 AS q, CAST(quantile_disc(gap, 0.5) AS DOUBLE) "
            "AS value FROM o WHERE gap IS NOT NULL"),
        "brand_activation_rate": (
            "WITH act AS (SELECT DISTINCT l_partkey FROM lineitem) "
            "SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_parts, "
            "CAST(SUM(CASE WHEN act.l_partkey IS NOT NULL THEN 1 "
            "ELSE 0 END) AS BIGINT) AS n_active, "
            "CAST((1000000 * SUM(CASE WHEN act.l_partkey IS NOT NULL "
            "THEN 1 ELSE 0 END)) // GREATEST(count(*), 1) AS BIGINT) "
            "AS activation_ppm FROM part p "
            "LEFT JOIN act ON act.l_partkey = p.p_partkey GROUP BY 1"),
        "value_granularity_audit": (
            "WITH c AS (SELECT DISTINCT "
            "CAST(round(value * 100) AS BIGINT) AS c FROM events) "
            "SELECT CAST(count(*) AS BIGINT) AS n_distinct_cents, "
            "CAST(min(c) AS BIGINT) AS min_cents, "
            "CAST(max(c) AS BIGINT) AS max_cents, "
            "CAST((1000000 * count(*)) // (max(c) - min(c) + 1) "
            "AS BIGINT) AS coverage_ppm FROM c"),
        "session_size_hist": (
            "WITH o AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w "
            "IS NULL OR epoch_us(ts) - epoch_us(lag(ts) OVER w) "
            "> 1800000000 THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, sum(brk) OVER ("
            "PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "z AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) "
            "AS session_events FROM s GROUP BY 1, 2) "
            "SELECT session_events, CAST(count(*) AS BIGINT) "
            "AS n_sessions FROM z GROUP BY 1"),
        "customer_kanonymity_audit": (
            "WITH g AS (SELECT c_nationkey, c_mktsegment, "
            "CAST(floor(c_acctbal / 1000) AS BIGINT) AS band, "
            "count(*) AS n FROM customer GROUP BY 1, 2, 3) "
            "SELECT CAST(count(*) AS BIGINT) AS n_groups, "
            "CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_risky_groups, "
            "CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) "
            "AS BIGINT) AS n_risky_customers, "
            "CAST(min(n) AS BIGINT) AS min_group_size FROM g"),
        "price_percentile_ranks": (
            "WITH c AS (SELECT CAST(round(l_extendedprice * 100) "
            "AS BIGINT) AS cents FROM lineitem), "
            "t(threshold_cents) AS (VALUES (2500000), (5000000), "
            "(7500000), (10000000)) "
            "SELECT CAST(threshold_cents AS BIGINT) AS threshold_cents, "
            "CAST(SUM(CASE WHEN cents <= threshold_cents THEN 1 "
            "ELSE 0 END) AS BIGINT) AS n_le, "
            "CAST((1000000 * SUM(CASE WHEN cents <= threshold_cents "
            "THEN 1 ELSE 0 END)) // GREATEST(count(*), 1) AS BIGINT) "
            "AS pctile_ppm FROM c CROSS JOIN t GROUP BY 1"),
        "event_type_trigrams": (
            "WITH o AS (SELECT event_type AS t1, "
            "lead(event_type, 1) OVER w AS t2, "
            "lead(event_type, 2) OVER w AS t3 FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n FROM o "
            "WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY 1, 2, 3 "
            "ORDER BY n DESC, t1, t2, t3 LIMIT 20"),
        "order_priority_escalation": (
            "WITH o AS (SELECT o_custkey, "
            "CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS r, "
            "lag(CAST(substr(o_orderpriority, 1, 1) AS BIGINT)) "
            "OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) AS pr FROM orders) "
            "SELECT CAST(count(*) FILTER (WHERE pr IS NOT NULL) "
            "AS BIGINT) AS n_pairs, "
            "CAST(count(*) FILTER (WHERE r < pr) AS BIGINT) "
            "AS n_escalations, "
            "CAST(count(*) FILTER (WHERE r > pr) AS BIGINT) "
            "AS n_deescalations, "
            "CAST(count(DISTINCT o_custkey) FILTER (WHERE r < pr) "
            "AS BIGINT) AS n_escalating_customers FROM o"),
        "nation_segment_lift": (
            "WITH g AS (SELECT CAST(c_nationkey AS BIGINT) AS "
            "c_nationkey, c_mktsegment, count(*) AS n FROM customer "
            "GROUP BY 1, 2) "
            "SELECT c_nationkey, c_mktsegment, "
            "CAST(n AS BIGINT) AS n_customers, "
            "CAST((1000000 * n * (SELECT sum(n) FROM g)) // "
            "(sum(n) OVER (PARTITION BY c_nationkey) * "
            "sum(n) OVER (PARTITION BY c_mktsegment)) AS BIGINT) "
            "AS lift_ppm FROM g ORDER BY 1, 2"),
        "customer_part_diversity_hist": (
            "WITH k AS (SELECT o_custkey, "
            "count(DISTINCT l_partkey) AS n_parts FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey GROUP BY 1) "
            "SELECT CAST(n_parts AS BIGINT) AS n_parts, "
            "CAST(count(*) AS BIGINT) AS n_customers FROM k "
            "GROUP BY 1 ORDER BY 1"),
        "user_first_last_matrix": (
            "WITH o AS (SELECT user_id, "
            "first_value(event_type) OVER w AS first_type, "
            "last_value(event_type) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
            "AS last_type, row_number() OVER w AS rn FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT first_type, last_type, CAST(count(*) AS BIGINT) "
            "AS n_users FROM o WHERE rn = 1 GROUP BY 1, 2 "
            "ORDER BY 1, 2"),
        "token_df_hist": (
            "WITH d AS (SELECT DISTINCT doc_id, "
            "unnest(string_split(text, ' ')) AS token FROM documents), "
            "f AS (SELECT token, count(*) AS df FROM d GROUP BY 1) "
            "SELECT CAST(df AS BIGINT) AS df, "
            "CAST(count(*) AS BIGINT) AS n_tokens FROM f "
            "GROUP BY 1 ORDER BY 1"),
        "supplier_part_jaccard_topk": (
            "WITH d AS (SELECT DISTINCT l_partkey AS p, "
            "l_suppkey AS s FROM lineitem), "
            "sz AS (SELECT s, count(*) AS n FROM d GROUP BY 1), "
            "sh AS (SELECT a.s AS s1, b.s AS s2, count(*) AS shared "
            "FROM d a JOIN d b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2) "
            "SELECT CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2, "
            "CAST(shared AS BIGINT) AS shared, "
            "CAST((1000000 * shared) // (z1.n + z2.n - shared) "
            "AS BIGINT) AS jaccard_ppm FROM sh "
            "JOIN sz z1 ON z1.s = sh.s1 JOIN sz z2 ON z2.s = sh.s2 "
            "ORDER BY jaccard_ppm DESC, s1, s2 LIMIT 10"),
        "embedding_signbucket_hist": (
            "SELECT CAST(b AS BIGINT) AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_vectors FROM ("
            "SELECT (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) "
            "+ 2 * (CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END) "
            "+ 4 * (CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) "
            "+ 8 * (CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END) "
            "+ 16 * (CASE WHEN embedding[5] > 0 THEN 1 ELSE 0 END) "
            "+ 32 * (CASE WHEN embedding[6] > 0 THEN 1 ELSE 0 END) "
            "+ 64 * (CASE WHEN embedding[7] > 0 THEN 1 ELSE 0 END) "
            "+ 128 * (CASE WHEN embedding[8] > 0 THEN 1 ELSE 0 END) "
            "AS b FROM embeddings) GROUP BY 1 ORDER BY 1"),
        "sentence_len_hist": (
            "SELECT CAST(len AS BIGINT) AS sentence_tokens, "
            "CAST(count(*) AS BIGINT) AS n_sentences FROM ("
            "SELECT length(string_split(s, ' ')) AS len FROM ("
            "SELECT unnest(string_split(text, '. ')) AS s "
            "FROM documents)) GROUP BY 1 ORDER BY 1"),
        "part_name_token_set_dups": (
            "WITH k AS (SELECT array_to_string(list_sort("
            "list_distinct(string_split(p_name, ' '))), ' ') "
            "AS token_set_key FROM part), "
            "g AS (SELECT token_set_key, count(*) AS n_parts FROM k "
            "GROUP BY 1) "
            "SELECT token_set_key, CAST(n_parts AS BIGINT) AS n_parts "
            "FROM g WHERE n_parts >= 2 "
            "ORDER BY n_parts DESC, token_set_key"),
        "coorder_edge_weight_hist": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "e AS (SELECT a.l_partkey AS a, b.l_partkey AS b, "
            "count(*) AS w FROM d a JOIN d b "
            "ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey GROUP BY 1, 2) "
            "SELECT CAST(w AS BIGINT) AS weight, "
            "CAST(count(*) AS BIGINT) AS n_edges FROM e "
            "GROUP BY 1 ORDER BY 1"),
        "order_ship_month_matrix": (
            "WITH o AS (SELECT l_orderkey, "
            "date_trunc('month', o_orderdate) AS order_month, "
            "date_trunc('month', min(l_shipdate)) AS ship_month "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY 1, 2) "
            "SELECT order_month, ship_month, "
            "CAST(count(*) AS BIGINT) AS n_orders FROM o "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "customer_quarter_density_hist": (
            "WITH p AS (SELECT DISTINCT o_custkey, "
            "year(o_orderdate) * 4 + (month(o_orderdate) - 1) // 3 "
            "AS q FROM orders), "
            "c AS (SELECT o_custkey, count(*) AS active, "
            "max(q) - min(q) + 1 AS span FROM p GROUP BY 1) "
            "SELECT CAST((1000000 * active // span) // 100000 "
            "AS BIGINT) AS density_decile, "
            "CAST(count(*) AS BIGINT) AS n_customers FROM c "
            "GROUP BY 1 ORDER BY 1"),
        "purchase_priorviews_cov": (
            "WITH p AS (SELECT user_id, ts, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events "
            "WHERE event_type = 'purchase'), "
            "v AS (SELECT user_id, ts FROM events "
            "WHERE event_type = 'view'), "
            "x AS (SELECT p.user_id, p.ts, p.cents, "
            "(SELECT count(*) FROM v WHERE v.user_id = p.user_id "
            "AND v.ts < p.ts) AS nv FROM p) "
            "SELECT CAST(count(*) AS BIGINT) AS n_purchases, "
            "CAST(count(*) * SUM(CAST(nv AS HUGEINT) * cents) "
            "- SUM(CAST(nv AS HUGEINT)) * SUM(CAST(cents AS HUGEINT)) "
            "AS VARCHAR) AS cov_num FROM x"),
        "brand_size_rollup": (
            "WITH b AS (SELECT p_brand, CAST(p_size AS BIGINT) "
            "AS p_size, CAST(round(p_retailprice * 100) AS BIGINT) "
            "AS cents FROM part) "
            "SELECT CAST(1 AS BIGINT) AS lvl, p_brand, "
            "CAST(-1 AS BIGINT) AS p_size, "
            "CAST(count(*) AS BIGINT) AS n_parts, "
            "CAST(sum(cents) AS BIGINT) AS retail_cents FROM b "
            "GROUP BY p_brand "
            "UNION ALL "
            "SELECT CAST(2 AS BIGINT), p_brand, p_size, "
            "CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT) "
            "FROM b GROUP BY p_brand, p_size "
            "ORDER BY lvl, p_brand, p_size"),
        "error_recovery_minutes_hist": (
            "WITH e AS (SELECT DISTINCT user_id, ts FROM events "
            "WHERE event_type = 'error'), "
            "o AS (SELECT user_id, ts FROM events "
            "WHERE event_type <> 'error'), "
            "g AS (SELECT e.user_id, e.ts, "
            "min(epoch_us(o.ts)) - epoch_us(e.ts) AS gap_us "
            "FROM e JOIN o ON e.user_id = o.user_id AND o.ts > e.ts "
            "GROUP BY 1, 2) "
            "SELECT CAST(gap_us // 60000000 AS BIGINT) "
            "AS recovery_minutes, "
            "CAST(count(*) AS BIGINT) AS n_errors FROM g "
            "GROUP BY 1 ORDER BY 1"),
        "linenumber_quantity_profile": (
            "SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber, "
            "CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) "
            "AS qty_sum, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS price_cents FROM lineitem "
            "GROUP BY 1 ORDER BY 1"),
        "fingerprint_density_hist": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS L "
            "FROM documents), "
            "g AS (SELECT doc_id, i, array_to_string("
            "L[CAST(i AS INT):CAST(i + 2 AS INT)], ' ') AS gram "
            "FROM t CROSS JOIN range(1, 4096) r(i) "
            "WHERE i <= len(L) - 2), "
            "h AS (SELECT doc_id, i, "
            "CAST(list_sum(list_transform(range(1, length(gram) + 1), "
            "j -> j * ascii(substr(gram, CAST(j AS INT), 1)))) % 97 "
            "AS BIGINT) AS h FROM g), "
            "s AS (SELECT doc_id, h, min(h) OVER (PARTITION BY doc_id "
            "ORDER BY i ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) "
            "AS pm FROM h), "
            "d AS (SELECT doc_id, count(*) AS n, "
            "SUM(CASE WHEN pm IS NULL OR h <= pm THEN 1 ELSE 0 END) "
            "AS ns FROM s GROUP BY 1) "
            "SELECT CAST((1000 * ns // n) // 100 AS BIGINT) "
            "AS density_decile, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM d GROUP BY 1 ORDER BY 1"),
        "first_order_ltv_cov": (
            "WITH o AS (SELECT o_custkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) AS rn FROM orders), "
            "c AS (SELECT o_custkey, "
            "SUM(CASE WHEN rn = 1 THEN cents END) AS x, "
            "SUM(CAST(cents AS HUGEINT)) AS y FROM o GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_customers, "
            "CAST(count(*) * SUM(CAST(x AS HUGEINT) * y) "
            "- SUM(CAST(x AS HUGEINT)) * SUM(y) AS VARCHAR) "
            "AS cov_num FROM c"),
        "user_spend_spread_hist": (
            "WITH p AS (SELECT user_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events "
            "WHERE event_type = 'purchase'), "
            "u AS (SELECT user_id, min(cents) AS mn, max(cents) AS mx "
            "FROM p GROUP BY 1 "
            "HAVING count(*) >= 2 AND max(cents) > 0) "
            "SELECT CAST((mx - mn) * 1000000 // mx // 100000 "
            "AS BIGINT) AS spread_decile, "
            "CAST(count(*) AS BIGINT) AS n_users FROM u "
            "GROUP BY 1 ORDER BY 1"),
        "doc_prefix_dup_hist": (
            "WITH t AS (SELECT string_split(text, ' ') AS L "
            "FROM documents), "
            "p AS (SELECT array_to_string(L[1:8], ' ') AS prefix "
            "FROM t WHERE len(L) >= 8), "
            "g AS (SELECT prefix, count(*) AS gs FROM p "
            "GROUP BY 1 HAVING count(*) >= 2) "
            "SELECT CAST(gs AS BIGINT) AS group_size, "
            "CAST(count(*) AS BIGINT) AS n_groups FROM g "
            "GROUP BY 1 ORDER BY 1"),
        "nation_acctbal_mad": (
            "WITH c AS (SELECT c_nationkey, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS cents "
            "FROM customer), "
            "p AS (SELECT a.c_nationkey AS nk, "
            "SUM(CAST(abs(a.cents - b.cents) AS HUGEINT)) AS mad "
            "FROM c a JOIN c b ON a.c_nationkey = b.c_nationkey "
            "GROUP BY 1), "
            "n AS (SELECT c_nationkey AS nk, count(*) AS n_customers "
            "FROM c GROUP BY 1) "
            "SELECT n_name, CAST(n_customers AS BIGINT) "
            "AS n_customers, CAST(mad AS VARCHAR) AS mad_num "
            "FROM p JOIN n USING (nk) "
            "JOIN nation ON n_nationkey = nk ORDER BY n_name"),
        "daily_revenue_streak_hist": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev "
            "FROM orders GROUP BY 1), "
            "w AS (SELECT day, rev, "
            "CASE WHEN lag(rev) OVER (ORDER BY day) IS NULL "
            "OR lag(rev) OVER (ORDER BY day) >= rev THEN 1 ELSE 0 END "
            "AS brk FROM d), "
            "i AS (SELECT day, SUM(brk) OVER (ORDER BY day) AS island "
            "FROM w), "
            "s AS (SELECT island, count(*) AS slen FROM i GROUP BY 1) "
            "SELECT CAST(slen AS BIGINT) AS streak_len, "
            "CAST(count(*) AS BIGINT) AS n_streaks FROM s "
            "GROUP BY 1 ORDER BY 1"),
        "customer_spend_halves_matrix": (
            "WITH o AS (SELECT o_custkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) AS rn, "
            "count(*) OVER (PARTITION BY o_custkey) AS n FROM orders),"
            " h AS (SELECT o_custkey, "
            "SUM(CASE WHEN rn <= n // 2 THEN cents ELSE 0 END) AS h1, "
            "SUM(CASE WHEN rn > n - n // 2 THEN cents ELSE 0 END) "
            "AS h2 FROM o WHERE n >= 2 GROUP BY 1), "
            "t AS (SELECT o_custkey, CASE WHEN h2 > h1 THEN 'up' "
            "WHEN h2 < h1 THEN 'down' ELSE 'flat' END AS trend "
            "FROM h) "
            "SELECT c_mktsegment, trend, "
            "CAST(count(*) AS BIGINT) AS n_customers "
            "FROM t JOIN customer ON c_custkey = o_custkey "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "bigram_asymmetry_topk": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS L "
            "FROM documents), "
            "b AS (SELECT L[CAST(i AS INT)] AS a, "
            "L[CAST(i + 1 AS INT)] AS bb "
            "FROM t CROSS JOIN range(1, 4096) r(i) "
            "WHERE i <= len(L) - 1), "
            "g AS (SELECT a, bb, count(*) AS n FROM b "
            "WHERE a <> bb GROUP BY 1, 2), "
            "u AS (SELECT least(a, bb) AS tok_a, "
            "greatest(a, bb) AS tok_b, "
            "SUM(CASE WHEN a < bb THEN n ELSE 0 END) AS n_fwd, "
            "SUM(CASE WHEN a > bb THEN n ELSE 0 END) AS n_rev "
            "FROM g GROUP BY 1, 2) "
            "SELECT tok_a, tok_b, CAST(n_fwd AS BIGINT) AS n_ab, "
            "CAST(n_rev AS BIGINT) AS n_ba, "
            "CAST(abs(n_fwd - n_rev) AS BIGINT) AS asym FROM u "
            "WHERE n_fwd + n_rev >= 20 "
            "ORDER BY asym DESC, tok_a, tok_b LIMIT 20"),
        "sorted_neighborhood_pair_hist": (
            "WITH d AS (SELECT doc_id, text, "
            "string_split(text, ' ') AS L FROM documents), "
            "k AS (SELECT doc_id, text, L[1] AS blk, "
            "list_distinct(L) AS toks FROM d), "
            "w AS (SELECT blk, toks, lead(toks) OVER "
            "(PARTITION BY blk ORDER BY text, doc_id) AS nxt FROM k), "
            "p AS (SELECT len(list_intersect(toks, nxt)) AS i, "
            "len(toks) + len(nxt) - len(list_intersect(toks, nxt)) "
            "AS u FROM w WHERE nxt IS NOT NULL) "
            "SELECT CAST(10 * i // u AS BIGINT) AS jaccard_decile, "
            "CAST(count(*) AS BIGINT) AS n_pairs FROM p "
            "GROUP BY 1 ORDER BY 1"),
        "unitprice_divisibility_audit": (
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,"
            " CAST(SUM(CASE WHEN "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "% CAST(round(l_quantity) AS BIGINT) <> 0 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_indivisible "
            "FROM lineitem GROUP BY 1 ORDER BY 1"),
        "order_shipdate_monotonicity": (
            "WITH w AS (SELECT l_orderkey, l_shipdate, "
            "lag(l_shipdate) OVER (PARTITION BY l_orderkey "
            "ORDER BY l_linenumber, l_shipdate) AS prev, "
            "count(*) OVER (PARTITION BY l_orderkey) AS n "
            "FROM lineitem), "
            "o AS (SELECT l_orderkey, max(n) AS n_lines, "
            "CASE WHEN SUM(CASE WHEN prev IS NOT NULL "
            "AND prev > l_shipdate THEN 1 ELSE 0 END) = 0 "
            "THEN 1 ELSE 0 END AS mono FROM w WHERE n >= 2 "
            "GROUP BY 1) "
            "SELECT CAST(n_lines AS BIGINT) AS n_lines, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(mono) AS BIGINT) AS n_monotone FROM o "
            "GROUP BY 1 ORDER BY 1"),
        "token_length_by_position": (
            "WITH t AS (SELECT string_split(text, ' ') AS L "
            "FROM documents), "
            "u AS (SELECT len(L) AS n, i, "
            "length(L[CAST(i AS INT)]) AS tl "
            "FROM t CROSS JOIN range(1, 4096) r(i) WHERE i <= len(L))"
            " SELECT CAST(10 * (i - 1) // n AS BIGINT) AS pos_decile, "
            "CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(SUM(tl) AS BIGINT) AS len_sum FROM u "
            "GROUP BY 1 ORDER BY 1"),
        "countmin_sketch_estimates": (
            "WITH t AS (SELECT string_split(text, ' ') AS L "
            "FROM documents), "
            "tok AS (SELECT unnest(L) AS w FROM t), "
            "c AS (SELECT w, count(*) AS n FROM tok GROUP BY 1), "
            "h AS (SELECT w, n, "
            "CAST(list_sum(list_transform(range(1, length(w) + 1), "
            "i -> i * ascii(substr(w, CAST(i AS INT), 1)))) AS BIGINT)"
            " AS h0, "
            "CAST(list_sum(list_transform(range(1, length(w) + 1), "
            "i -> ascii(substr(w, CAST(i AS INT), 1)))) AS BIGINT) "
            "AS s FROM c), "
            "r0 AS (SELECT h0 % 16 AS idx, SUM(n) AS cell FROM h "
            "GROUP BY 1), "
            "r1 AS (SELECT (h0 + s) % 16 AS idx, SUM(n) AS cell "
            "FROM h GROUP BY 1) "
            "SELECT w AS token, CAST(h.n AS BIGINT) AS n_true, "
            "CAST(least(r0.cell, r1.cell) AS BIGINT) AS n_est "
            "FROM h JOIN r0 ON r0.idx = h.h0 % 16 "
            "JOIN r1 ON r1.idx = (h.h0 + h.s) % 16 ORDER BY token"),
        "sample_quota_largest_remainder": (
            "WITH c AS (SELECT lang, count(*) AS n FROM documents "
            "GROUP BY 1), "
            "tot AS (SELECT SUM(n) AS nt, CAST(1000 AS BIGINT) AS B "
            "FROM c), "
            "q AS (SELECT lang, n, B * n // nt AS fl, B * n % nt "
            "AS rem FROM c, tot), "
            "k AS (SELECT B - SUM(fl) AS extra FROM q, tot "
            "GROUP BY B), "
            "r AS (SELECT lang, n, fl, row_number() OVER "
            "(ORDER BY rem DESC, lang) AS rk FROM q) "
            "SELECT lang, CAST(n AS BIGINT) AS n_docs, "
            "CAST(fl + CASE WHEN rk <= (SELECT extra FROM k) "
            "THEN 1 ELSE 0 END AS BIGINT) AS quota FROM r "
            "ORDER BY lang"),
        "timestamp_delta_varint_audit": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS us "
            "FROM events), "
            "d AS (SELECT us - lag(us) OVER (PARTITION BY user_id "
            "ORDER BY us) AS dus FROM e), "
            "v AS (SELECT dus FROM d WHERE dus IS NOT NULL) "
            "SELECT CAST(count(*) AS BIGINT) AS n_deltas, "
            "CAST(SUM(CASE WHEN dus < 128 THEN 1 "
            "WHEN dus < 16384 THEN 2 WHEN dus < 2097152 THEN 3 "
            "WHEN dus < 268435456 THEN 4 "
            "WHEN dus < 34359738368 THEN 5 "
            "WHEN dus < 4398046511104 THEN 6 "
            "WHEN dus < 562949953421312 THEN 7 "
            "WHEN dus < 72057594037927936 THEN 8 ELSE 9 END) "
            "AS BIGINT) AS delta_bytes, "
            "CAST(SUM(CASE WHEN dus = 0 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_zero_deltas FROM v"),
        "error_burst_hour_hist": (
            "WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) AS us "
            "FROM events WHERE event_type = 'error'), "
            "b AS (SELECT a.user_id, a.us, count(*) AS nearby "
            "FROM e a JOIN e o ON a.user_id = o.user_id "
            "AND o.us <> a.us AND abs(o.us - a.us) <= 86400000000 "
            "GROUP BY 1, 2), "
            "f AS (SELECT us FROM b WHERE nearby >= 2) "
            "SELECT CAST((us // 3600000000) % 24 AS BIGINT) AS hour, "
            "CAST(count(*) AS BIGINT) AS n_bursty FROM f "
            "GROUP BY 1 ORDER BY 1"),
        "user_type_simpson_hist": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS n "
            "FROM events GROUP BY 1, 2), "
            "u AS (SELECT user_id, SUM(n) AS nt, "
            "SUM(n * (n - 1)) AS num FROM c GROUP BY 1 "
            "HAVING SUM(n) >= 2) "
            "SELECT CAST(1000000 * num // (nt * (nt - 1)) // 100000 "
            "AS BIGINT) AS simpson_decile, "
            "CAST(count(*) AS BIGINT) AS n_users FROM u "
            "GROUP BY 1 ORDER BY 1"),
        "shuffle_skew_audit": (
            "WITH b AS (SELECT o_custkey % 256 AS bkt, count(*) "
            "AS load FROM orders GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_buckets_used, "
            "CAST(min(load) AS BIGINT) AS min_load, "
            "CAST(max(load) AS BIGINT) AS max_load, "
            "CAST(SUM(load) AS BIGINT) AS total_rows, "
            "CAST(1000000 * max(load) * 256 // SUM(load) AS BIGINT) "
            "AS skew_ppm FROM b"),
        "doc_alpha_order_share_hist": (
            "WITH t AS (SELECT string_split(text, ' ') AS L "
            "FROM documents), "
            "p AS (SELECT len(L) - 1 AS n, "
            "len(list_filter(range(1, len(L)), "
            "i -> L[CAST(i AS INT)] <= L[CAST(i + 1 AS INT)])) AS k "
            "FROM t WHERE len(L) >= 2) "
            "SELECT CAST(1000000 * k // n // 100000 AS BIGINT) "
            "AS alpha_decile, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM p GROUP BY 1 ORDER BY 1"),
        "discount_tax_net_grid": (
            "WITH l AS (SELECT "
            "CAST(round(l_discount * 100) AS BIGINT) AS d_pct, "
            "CAST(round(l_tax * 100) AS BIGINT) AS t_pct, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents "
            "FROM lineitem) "
            "SELECT d_pct, t_pct, CAST(count(*) AS BIGINT) AS n_lines,"
            " CAST(SUM(CAST(cents * (100 - d_pct) * (100 + t_pct) "
            "AS HUGEINT)) AS VARCHAR) AS net_e4 FROM l "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "events_orders_daily_cov": (
            "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "count(*) AS ne FROM events GROUP BY 1), "
            "o AS (SELECT epoch_us(o_orderdate) // 86400000000 "
            "AS day, count(*) AS no_ FROM orders GROUP BY 1), "
            "j AS (SELECT COALESCE(ne, 0) AS x, COALESCE(no_, 0) "
            "AS y FROM e FULL OUTER JOIN o ON e.day = o.day) "
            "SELECT CAST(count(*) AS BIGINT) AS n_days, "
            "CAST(count(*) * SUM(CAST(x AS HUGEINT) * y) "
            "- SUM(CAST(x AS HUGEINT)) * SUM(CAST(y AS HUGEINT)) "
            "AS VARCHAR) AS cov_num FROM j"),
        "centroid_margin_hist": (
            "WITH v AS (SELECT vec_id, label, r.i AS i, "
            "CAST(round(CAST(embedding[CAST(r.i AS INT)] AS DOUBLE) "
            "* 10000) AS BIGINT) AS q FROM embeddings "
            "CROSS JOIN range(1, 65) AS r(i)), "
            "cs AS (SELECT label, i, SUM(q) AS s, "
            "CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1, 2), "
            "c AS (SELECT label, i, (10000 * s + 1000000000 * n) "
            "// n - 1000000000 AS c FROM cs), "
            "d AS (SELECT v.vec_id, c.label AS cand, "
            "SUM((10000 * v.q - c.c) * (10000 * v.q - c.c)) AS dist "
            "FROM v JOIN c ON v.i = c.i GROUP BY 1, 2), "
            "p AS (SELECT vec_id, dist, row_number() OVER "
            "(PARTITION BY vec_id ORDER BY dist, cand) AS rn FROM d),"
            " m AS (SELECT a.vec_id, "
            "1000000 * (b.dist - a.dist) // b.dist AS ppm "
            "FROM p a JOIN p b ON a.vec_id = b.vec_id "
            "AND a.rn = 1 AND b.rn = 2 WHERE b.dist > 0) "
            "SELECT CAST(ppm // 10000 AS BIGINT) AS margin_pct, "
            "CAST(count(*) AS BIGINT) AS n_vectors FROM m "
            "GROUP BY 1 ORDER BY 1"),
        "nation_supplier_hhi_ppm": (
            "WITH r AS (SELECT l_suppkey, "
            "SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS cents FROM lineitem GROUP BY 1), "
            "j AS (SELECT s_nationkey AS nk, CAST(cents AS HUGEINT) "
            "AS c FROM r JOIN supplier ON s_suppkey = l_suppkey), "
            "h AS (SELECT nk, count(*) AS ns, SUM(c * c) AS ss, "
            "SUM(c) AS s FROM j GROUP BY 1) "
            "SELECT n_name, CAST(ns AS BIGINT) AS n_suppliers, "
            "CAST(1000000 * ss // (s * s) AS BIGINT) AS hhi_ppm "
            "FROM h JOIN nation ON n_nationkey = nk ORDER BY n_name"),
        "purchase_dow_hour_heatmap": (
            "SELECT CAST(((epoch_us(ts) // 86400000000) + 4) % 7 "
            "AS BIGINT) AS dow, "
            "CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) "
            "AS hour, CAST(count(*) AS BIGINT) AS n_purchases "
            "FROM events WHERE event_type = 'purchase' "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "order_total_reconciliation": (
            "WITH l AS (SELECT l_orderkey, "
            "SUM(CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT)) "
            "* (100 + CAST(round(l_tax * 100) AS BIGINT))) AS net_e4 "
            "FROM lineitem GROUP BY 1), "
            "j AS (SELECT o_orderpriority, "
            "CASE WHEN net_e4 > "
            "CAST(round(o_totalprice * 100) AS BIGINT) * 10000 "
            "THEN 1 WHEN net_e4 < "
            "CAST(round(o_totalprice * 100) AS BIGINT) * 10000 "
            "THEN -1 ELSE 0 END AS sign "
            "FROM orders JOIN l ON l_orderkey = o_orderkey) "
            "SELECT o_orderpriority, CAST(sign AS BIGINT) AS sign, "
            "CAST(count(*) AS BIGINT) AS n_orders FROM j "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "intersession_gap_hist": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS us "
            "FROM events), "
            "w AS (SELECT user_id, us, lag(us) OVER "
            "(PARTITION BY user_id ORDER BY us) AS prev FROM e), "
            "g AS (SELECT us - prev AS d FROM w "
            "WHERE prev IS NOT NULL AND us - prev > 1800000000) "
            "SELECT CAST(least(d // 3600000000, 48) AS BIGINT) "
            "AS gap_hours, CAST(count(*) AS BIGINT) AS n_gaps "
            "FROM g GROUP BY 1 ORDER BY 1"),
        "doc_ttr_hist": (
            "WITH t AS (SELECT string_split(text, ' ') AS L "
            "FROM documents), "
            "p AS (SELECT len(list_distinct(L)) AS v, len(L) AS n "
            "FROM t) "
            "SELECT CAST(1000000 * v // n // 100000 AS BIGINT) "
            "AS ttr_decile, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM p GROUP BY 1 ORDER BY 1"),
        "order_topline_share_hist": (
            "WITH l AS (SELECT l_orderkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents "
            "FROM lineitem), "
            "o AS (SELECT l_orderkey, max(cents) AS mx, "
            "SUM(cents) AS s FROM l GROUP BY 1 "
            "HAVING count(*) >= 2) "
            "SELECT CAST(1000000 * mx // s // 100000 AS BIGINT) "
            "AS share_decile, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM o GROUP BY 1 ORDER BY 1"),
        "coorder_pagerank2": (
            "WITH li AS (SELECT DISTINCT l_orderkey AS o, "
            "l_partkey AS p FROM lineitem), "
            "e AS (SELECT DISTINCT a.p AS a, b.p AS b FROM li a "
            "JOIN li b ON a.o = b.o AND a.p < b.p), "
            "u AS (SELECT a AS src, b AS dst FROM e "
            "UNION ALL SELECT b, a FROM e), "
            "d AS (SELECT src AS node, count(*) AS deg FROM u "
            "GROUP BY 1), "
            "r1 AS (SELECT u.dst AS node, 150000 + "
            "SUM(850 * (1000000 // d.deg) // 1000) AS r FROM u "
            "JOIN d ON d.node = u.src GROUP BY 1), "
            "r2 AS (SELECT u.dst AS node, 150000 + "
            "SUM(850 * (r1.r // d.deg) // 1000) AS r FROM u "
            "JOIN d ON d.node = u.src JOIN r1 ON r1.node = u.src "
            "GROUP BY 1) "
            "SELECT CAST(r2.node AS BIGINT) AS part, "
            "CAST(d2.deg AS BIGINT) AS degree, "
            "CAST(r2.r AS BIGINT) AS r2 FROM r2 "
            "JOIN d d2 ON d2.node = r2.node "
            "ORDER BY r2.r DESC, part LIMIT 20"),
        "embedding_dim_cov_sign_census": (
            "WITH v AS (SELECT vec_id, r.i AS i, "
            "CAST(round(CAST(embedding[CAST(r.i AS INT)] AS DOUBLE) "
            "* 10000) AS BIGINT) AS q FROM embeddings "
            "CROSS JOIN range(1, 65) r(i)), "
            "m AS (SELECT i, SUM(CAST(q AS HUGEINT)) AS sx, "
            "count(*) AS n FROM v GROUP BY 1), "
            "p AS (SELECT a.i AS i, b.i AS j, "
            "SUM(CAST(a.q AS HUGEINT) * b.q) AS sxy FROM v a "
            "JOIN v b ON a.vec_id = b.vec_id AND a.i < b.i "
            "GROUP BY 1, 2), "
            "s AS (SELECT sign(ma.n * p.sxy - ma.sx * mb.sx) AS sg "
            "FROM p JOIN m ma ON ma.i = p.i "
            "JOIN m mb ON mb.i = p.j) "
            "SELECT CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(SUM(CASE WHEN sg > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_pos, "
            "CAST(SUM(CASE WHEN sg < 0 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_neg, "
            "CAST(SUM(CASE WHEN sg = 0 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_zero FROM s"),
        "monthly_yoy_sign_matrix": (
            "WITH m AS (SELECT year(o_orderdate) AS y, "
            "month(o_orderdate) AS mo, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev "
            "FROM orders GROUP BY 1, 2), "
            "j AS (SELECT a.mo AS mo, sign(a.rev - b.rev) AS sg "
            "FROM m a JOIN m b ON b.y = a.y - 1 AND b.mo = a.mo) "
            "SELECT CAST(mo AS BIGINT) AS month, "
            "CAST(SUM(CASE WHEN sg > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_up, "
            "CAST(SUM(CASE WHEN sg < 0 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_down, CAST(count(*) AS BIGINT) AS n_pairs "
            "FROM j GROUP BY 1 ORDER BY 1"),
        "supplier_distinct_orders_hist": (
            "WITH u AS (SELECT DISTINCT l_suppkey, l_orderkey "
            "FROM lineitem), "
            "c AS (SELECT l_suppkey, count(*) AS reach FROM u "
            "GROUP BY 1) "
            "SELECT CAST(reach // 64 AS BIGINT) AS reach_bucket, "
            "CAST(count(*) AS BIGINT) AS n_suppliers FROM c "
            "GROUP BY 1 ORDER BY 1"),
        "coorder_minlabel_rounds": (
            "WITH lp AS (SELECT DISTINCT l_orderkey AS o, "
            "CAST(l_partkey AS BIGINT) AS p FROM lineitem), "
            "e0 AS (SELECT DISTINCT a.p AS a, b.p AS b FROM lp a "
            "JOIN lp b ON a.o = b.o AND a.p < b.p), "
            "nodes AS (SELECT a AS v FROM e0 UNION SELECT b FROM e0), "
            "nb AS (SELECT a AS v, b AS w FROM e0 "
            "UNION ALL SELECT b, a FROM e0), "
            "r0 AS (SELECT v, v AS lbl FROM nodes), "
            "r1 AS (SELECT nb.v, LEAST(rv.lbl, min(rw.lbl)) AS lbl "
            "FROM nb JOIN r0 rv ON rv.v = nb.v "
            "JOIN r0 rw ON rw.v = nb.w GROUP BY nb.v, rv.lbl), "
            "r2 AS (SELECT nb.v, LEAST(rv.lbl, min(rw.lbl)) AS lbl "
            "FROM nb JOIN r1 rv ON rv.v = nb.v "
            "JOIN r1 rw ON rw.v = nb.w GROUP BY nb.v, rv.lbl), "
            "r3 AS (SELECT nb.v, LEAST(rv.lbl, min(rw.lbl)) AS lbl "
            "FROM nb JOIN r2 rv ON rv.v = nb.v "
            "JOIN r2 rw ON rw.v = nb.w GROUP BY nb.v, rv.lbl) "
            "SELECT CAST(0 AS BIGINT) AS round, "
            "CAST(count(DISTINCT lbl) AS BIGINT) AS n_labels, "
            "CAST(sum(lbl) AS BIGINT) AS sum_labels FROM r0 "
            "UNION ALL SELECT 1, count(DISTINCT lbl), sum(lbl) FROM r1 "
            "UNION ALL SELECT 2, count(DISTINCT lbl), sum(lbl) FROM r2 "
            "UNION ALL SELECT 3, count(DISTINCT lbl), sum(lbl) FROM r3 "
            "ORDER BY 1"),
        "pps_systematic_sample_audit": (
            "WITH w AS (SELECT o_custkey AS c, "
            "CAST(count(*) AS BIGINT) AS wt FROM orders GROUP BY 1), "
            "tot AS (SELECT sum(wt) AS t FROM w), "
            "g AS (SELECT greatest(t // 64, 1) AS step FROM tot), "
            "cum AS (SELECT c, wt, sum(wt) OVER (ORDER BY c "
            "ROWS UNBOUNDED PRECEDING) AS hi FROM w), "
            "q AS (SELECT c, wt, "
            "LEAST((hi - step // 2 + step - 1) // step, 64) "
            "- LEAST((hi - wt - step // 2 + step - 1) // step, 64) "
            "AS hits FROM cum, g) "
            "SELECT CAST(c_nationkey AS BIGINT) AS nationkey, "
            "CAST(count(*) FILTER (hits > 0) AS BIGINT) AS n_selected, "
            "CAST(sum(hits) AS BIGINT) AS n_hits, "
            "CAST(COALESCE(sum(wt) FILTER (hits > 0), 0) AS BIGINT) "
            "AS sel_weight "
            "FROM q JOIN customer ON c_custkey = q.c "
            "GROUP BY 1 ORDER BY 1"),
        "order_width_transition_matrix": (
            "WITH w AS (SELECT l_orderkey AS o, "
            "LEAST(count(*), 7) AS wd FROM lineitem GROUP BY 1), "
            "ow AS (SELECT o_custkey AS c, o_orderdate AS d, "
            "o_orderkey AS k, wd FROM orders "
            "JOIN w ON o_orderkey = w.o), "
            "tr AS (SELECT c, wd, lag(wd) OVER (PARTITION BY c "
            "ORDER BY d, k) AS pw FROM ow) "
            "SELECT CAST(pw AS BIGINT) AS w_from, "
            "CAST(wd AS BIGINT) AS w_to, "
            "CAST(count(*) AS BIGINT) AS n_pairs FROM tr "
            "WHERE pw IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"),
        "doc_internal_shingle_repeats": (
            "WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "bg AS (SELECT doc_id, [t[i] || ' ' || t[i+1] "
            "FOR i IN range(1, len(t))] AS gs FROM tk) "
            "SELECT CAST(LEAST(len(gs) - len(list_distinct(gs)), 12) "
            "AS BIGINT) AS repeat_bucket, "
            "CAST(count(*) AS BIGINT) AS n_docs FROM bg "
            "GROUP BY 1 ORDER BY 1"),
        "greedy_vocab_cover": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(list_distinct(string_split(text, ' '))) AS tk "
            "FROM documents), "
            "top AS (SELECT tk FROM tok GROUP BY tk "
            "ORDER BY count(*) DESC, tk LIMIT 32), "
            "ntop AS (SELECT count(*) AS k FROM top), "
            "dt AS (SELECT DISTINCT doc_id, tk FROM tok "
            "JOIN top USING (tk)), "
            "docs AS (SELECT DISTINCT doc_id FROM dt), "
            "c1 AS (SELECT d.doc_id, count(dt.tk) AS c FROM docs d "
            "LEFT JOIN dt ON dt.doc_id = d.doc_id GROUP BY 1), "
            "p1 AS (SELECT doc_id, c FROM c1 "
            "ORDER BY c DESC, doc_id LIMIT 1), "
            "cov1 AS (SELECT tk FROM dt "
            "WHERE doc_id = (SELECT doc_id FROM p1)), "
            "u1 AS (SELECT tk FROM top EXCEPT SELECT tk FROM cov1), "
            "c2 AS (SELECT d.doc_id, count(u1.tk) AS c FROM docs d "
            "LEFT JOIN dt ON dt.doc_id = d.doc_id "
            "LEFT JOIN u1 ON u1.tk = dt.tk GROUP BY 1), "
            "p2 AS (SELECT doc_id, c FROM c2 "
            "ORDER BY c DESC, doc_id LIMIT 1), "
            "cov2 AS (SELECT tk FROM cov1 UNION SELECT dt.tk FROM dt "
            "JOIN u1 ON u1.tk = dt.tk "
            "WHERE dt.doc_id = (SELECT doc_id FROM p2)), "
            "u2 AS (SELECT tk FROM top EXCEPT SELECT tk FROM cov2), "
            "c3 AS (SELECT d.doc_id, count(u2.tk) AS c FROM docs d "
            "LEFT JOIN dt ON dt.doc_id = d.doc_id "
            "LEFT JOIN u2 ON u2.tk = dt.tk GROUP BY 1), "
            "p3 AS (SELECT doc_id, c FROM c3 "
            "ORDER BY c DESC, doc_id LIMIT 1) "
            "SELECT CAST(1 AS BIGINT) AS round, "
            "CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(c AS BIGINT) AS n_new, "
            "CAST((SELECT k FROM ntop) - c AS BIGINT) AS n_remaining "
            "FROM p1 "
            "UNION ALL SELECT 2, doc_id, c, "
            "(SELECT count(*) FROM u1) - c FROM p2 "
            "UNION ALL SELECT 3, doc_id, c, "
            "(SELECT count(*) FROM u2) - c FROM p3 ORDER BY 1"),
        "doc_toklen_lag_sign_census": (
            "WITH t AS (SELECT doc_id, lang, "
            "string_split(text, ' ') AS s FROM documents "
            "WHERE len(string_split(text, ' ')) >= 3), "
            "x AS (SELECT doc_id, lang, length(s[i]) AS x, "
            "length(s[i+1]) AS y FROM t, "
            "UNNEST(range(1, len(s))) r(i)), "
            "m AS (SELECT doc_id, lang, count(*) AS m, "
            "sum(x*y) AS sxy, sum(x) AS sx, sum(y) AS sy "
            "FROM x GROUP BY 1, 2) "
            "SELECT lang, "
            "CAST(sign(m*sxy - sx*sy) AS BIGINT) AS sgn, "
            "CAST(count(*) AS BIGINT) AS n_docs "
            "FROM m GROUP BY 1, 2 ORDER BY 1, 2"),
        "kendall_width_price": (
            "WITH w AS (SELECT l_orderkey AS o, "
            "LEAST(count(*), 7) AS w FROM lineitem GROUP BY 1), "
            "j AS (SELECT w.w AS w, "
            "LEAST(CAST(round(o_totalprice * 100) AS BIGINT) "
            "// 5000000, 9) AS p FROM orders "
            "JOIN w ON o_orderkey = w.o), "
            "h AS (SELECT w, p, CAST(count(*) AS HUGEINT) AS n "
            "FROM j GROUP BY 1, 2) "
            "SELECT "
            "CAST((SELECT COALESCE(sum(n), 0) FROM h) AS BIGINT) "
            "AS n_orders, "
            "CAST((SELECT COALESCE(sum(a.n*b.n), 0) FROM h a "
            "JOIN h b ON b.w > a.w AND b.p > a.p) AS VARCHAR) "
            "AS conc, "
            "CAST((SELECT COALESCE(sum(a.n*b.n), 0) FROM h a "
            "JOIN h b ON b.w > a.w AND b.p < a.p) AS VARCHAR) "
            "AS disc, "
            "CAST((SELECT COALESCE(sum(a.n*b.n), 0) FROM h a "
            "JOIN h b ON b.w = a.w AND b.p > a.p) AS VARCHAR) "
            "AS ties_w, "
            "CAST((SELECT COALESCE(sum(a.n*b.n), 0) FROM h a "
            "JOIN h b ON b.p = a.p AND b.w > a.w) AS VARCHAR) "
            "AS ties_p, "
            "CAST((SELECT COALESCE(sum(n*(n-1)//2), 0) FROM h) "
            "AS VARCHAR) AS ties_both"),
        "order_price_ratio_pairs_hist": (
            "WITH l AS (SELECT l_orderkey AS o, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS c "
            "FROM lineitem), "
            "p AS (SELECT a.o, count(*) AS np FROM l a "
            "JOIN l b ON a.o = b.o AND 2*a.c <= b.c GROUP BY 1), "
            "allo AS (SELECT o FROM l GROUP BY 1) "
            "SELECT CAST(LEAST(COALESCE(np, 0), 16) AS BIGINT) "
            "AS pairs_bucket, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM allo LEFT JOIN p USING (o) "
            "GROUP BY 1 ORDER BY 1"),
        "ams_f2_sketch_audit": (
            "WITH f AS (SELECT CAST(user_id AS VARCHAR) AS u, "
            "CAST(count(*) AS BIGINT) AS f FROM events GROUP BY 1), "
            "s AS (SELECT r, u, f, CASE WHEN ("
            + _fold60_sql("md5(CAST(r AS VARCHAR) || ':' || u)")
            + ") % 2 = 0 THEN 1 ELSE -1 END AS sgn "
            "FROM f, (VALUES (0), (1), (2), (3)) t(r)), "
            "m AS (SELECT r, sum(sgn * f) AS ss FROM s GROUP BY 1), "
            "f2 AS (SELECT sum(CAST(f AS HUGEINT) * f) AS v FROM f) "
            "SELECT CAST(r AS BIGINT) AS sketch_row, "
            "CAST(ss AS BIGINT) AS signed_sum, "
            "CAST(CAST(ss AS HUGEINT) * ss AS VARCHAR) AS est_f2, "
            "CAST((SELECT v FROM f2) AS VARCHAR) AS f2_exact "
            "FROM m ORDER BY 1"),
        "daily_revenue_next_higher_wait": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev "
            "FROM orders GROUP BY 1), "
            "n AS (SELECT a.day, min(b.day - a.day) AS w FROM d a "
            "JOIN d b ON b.day > a.day AND b.rev > a.rev GROUP BY 1) "
            "SELECT CAST(CASE WHEN w IS NULL THEN -1 "
            "ELSE LEAST(w, 31) END AS BIGINT) "
            "AS wait_bucket, CAST(count(*) AS BIGINT) AS n_days "
            "FROM d LEFT JOIN n USING (day) GROUP BY 1 ORDER BY 1"),
        "supplier_ship_interval_coverage": (
            "WITH iv AS (SELECT l_suppkey AS sk, "
            "year(o_orderdate) AS y, CAST(o_orderdate AS DATE) AS s, "
            "GREATEST(CAST(l_shipdate AS DATE), "
            "CAST(o_orderdate AS DATE)) AS e FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderpriority = '1-URGENT'), "
            "w AS (SELECT sk, y, s, e, max(e) OVER (PARTITION BY sk, y "
            "ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) AS pmax FROM iv), "
            "g AS (SELECT sk, y, s, e, CASE WHEN pmax IS NULL "
            "OR s > pmax THEN 1 ELSE 0 END AS brk FROM w), "
            "i AS (SELECT sk, y, s, e, sum(brk) OVER (PARTITION BY "
            "sk, y ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS isl "
            "FROM g), "
            "c AS (SELECT sk, y, isl, max(e) - min(s) + 1 AS len "
            "FROM i GROUP BY 1, 2, 3), "
            "p AS (SELECT sk, y, sum(len) AS cov, count(*) AS ni "
            "FROM c GROUP BY 1, 2) "
            "SELECT CAST(cov // 32 AS BIGINT) AS cov_bucket, "
            "CAST(count(*) AS BIGINT) AS n_cells, "
            "CAST(sum(ni) AS BIGINT) AS n_islands "
            "FROM p GROUP BY 1 ORDER BY 1"),
        "rle_chunk_encoding_audit": (
            "WITH l AS (SELECT l_orderkey // 64 AS ch, "
            "l_orderkey AS k, l_linenumber AS ln, "
            "l_returnflag || l_linestatus AS v FROM lineitem), "
            "w AS (SELECT ch, CASE WHEN lag(v) OVER (PARTITION BY ch "
            "ORDER BY k, ln, v) IS DISTINCT FROM v THEN 1 ELSE 0 END "
            "AS chg FROM l), "
            "c AS (SELECT ch, sum(chg) AS runs, count(*) AS nr "
            "FROM w GROUP BY 1) "
            "SELECT CAST(1000000 * runs // nr // 20000 AS BIGINT) "
            "AS rle_bucket, CAST(count(*) AS BIGINT) AS n_chunks "
            "FROM c GROUP BY 1 ORDER BY 1"),
        "split_leakage_audit": (
            "WITH d AS (SELECT array_to_string("
            "(string_split(text, ' '))[1:8], ' ') AS fp, "
            "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), "
            "1, 2)) AS BIGINT) % 10 AS b FROM documents), "
            "ds AS (SELECT DISTINCT fp, CASE WHEN b < 8 THEN 0 "
            "WHEN b = 8 THEN 1 ELSE 2 END AS s FROM d) "
            "SELECT CAST(a.s AS BIGINT) AS split_a, "
            "CAST(b.s AS BIGINT) AS split_b, "
            "CAST(count(*) AS BIGINT) AS n_groups FROM ds a "
            "JOIN ds b ON a.fp = b.fp AND a.s < b.s "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "coorder_heaviest_edge_hooking": (
            "WITH lp AS (SELECT DISTINCT l_orderkey AS o, "
            "CAST(l_partkey AS BIGINT) AS p FROM lineitem), "
            "pr AS (SELECT a.p AS a, b.p AS b, "
            "CAST(count(*) AS BIGINT) AS n FROM lp a "
            "JOIN lp b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2), "
            "nb AS (SELECT a AS v, b AS w, n FROM pr "
            "UNION ALL SELECT b, a, n FROM pr), "
            "pick AS (SELECT v, w, n FROM (SELECT v, w, n, "
            "row_number() OVER (PARTITION BY v "
            "ORDER BY n DESC, w ASC) AS rn FROM nb) WHERE rn = 1), "
            "np AS (SELECT LEAST(n, 8) AS wb, count(*) AS n_picks "
            "FROM pick GROUP BY 1), "
            "mut AS (SELECT LEAST(p1.n, 8) AS wb, count(*) AS nm "
            "FROM pick p1 JOIN pick p2 ON p1.w = p2.v "
            "AND p2.w = p1.v AND p1.v < p1.w GROUP BY 1) "
            "SELECT CAST(COALESCE(np.wb, mut.wb) AS BIGINT) "
            "AS weight_bucket, "
            "CAST(COALESCE(n_picks, 0) AS BIGINT) AS n_picks, "
            "CAST(COALESCE(nm, 0) AS BIGINT) AS n_mutual_pairs "
            "FROM np FULL OUTER JOIN mut ON np.wb = mut.wb "
            "ORDER BY 1"),
        "doc_repeat_mass_log2": (
            "WITH tk AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS t FROM documents), "
            "f AS (SELECT doc_id, t, count(*) AS f FROM tk "
            "GROUP BY 1, 2), "
            "m AS (SELECT doc_id, "
            "sum(f * (length(bin(f)) - 1)) AS mass FROM f "
            "GROUP BY 1) "
            "SELECT CAST(LEAST(mass // 16, 31) AS BIGINT) "
            "AS mass_bucket, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM m GROUP BY 1 ORDER BY 1"),
        "daily_revenue_extrema_census": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev "
            "FROM orders GROUP BY 1), "
            "w AS (SELECT year(day) AS y, rev, "
            "lag(rev) OVER (ORDER BY day) AS p, "
            "lead(rev) OVER (ORDER BY day) AS n FROM d) "
            "SELECT CAST(y AS BIGINT) AS year, "
            "CAST(sum(CASE WHEN p IS NOT NULL AND n IS NOT NULL "
            "AND rev > p AND rev > n THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_local_max, "
            "CAST(sum(CASE WHEN p IS NOT NULL AND n IS NOT NULL "
            "AND rev < p AND rev < n THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_local_min, "
            "CAST(count(*) AS BIGINT) AS n_days "
            "FROM w GROUP BY 1 ORDER BY 1"),
        "histogram_quantile_audit": (
            "WITH c AS (SELECT CAST(round(l_extendedprice * 100) "
            "AS BIGINT) AS c FROM lineitem), "
            "pw AS (SELECT min(c) AS lo, max(c) AS hi, "
            "count(*) AS n, (max(c) - min(c)) // 256 + 1 AS w "
            "FROM c), "
            "h AS (SELECT (c.c - pw.lo) // pw.w AS b, "
            "count(*) AS cnt FROM c, pw GROUP BY 1), "
            "cm AS (SELECT b, sum(cnt) OVER (ORDER BY b "
            "ROWS UNBOUNDED PRECEDING) AS cum FROM h), "
            "qk AS (SELECT q, (q * (SELECT n FROM pw) + 99) // 100 "
            "AS k FROM (VALUES (50), (90), (99)) t(q)), "
            "tb AS (SELECT q, k, min(b) AS bq FROM qk "
            "JOIN cm ON cm.cum >= k GROUP BY 1, 2), "
            "es AS (SELECT q, k, (SELECT lo FROM pw) "
            "+ (SELECT w FROM pw) * (bq + 1) - 1 AS est FROM tb), "
            "rk AS (SELECT c, row_number() OVER (ORDER BY c) AS rn "
            "FROM c), "
            "ex AS (SELECT qk.q, rk.c AS exact FROM qk "
            "JOIN rk ON rk.rn = qk.k) "
            "SELECT CAST(es.q AS BIGINT) AS q, "
            "CAST(est AS BIGINT) AS est_cents, "
            "CAST(exact AS BIGINT) AS exact_cents, "
            "CAST(abs(est - exact) AS BIGINT) AS abs_err "
            "FROM es JOIN ex ON es.q = ex.q ORDER BY 1"),
        "token_trie_level_widths": (
            "WITH v AS (SELECT DISTINCT "
            "unnest(string_split(text, ' ')) AS t FROM documents) "
            "SELECT CAST(l AS BIGINT) AS level, "
            "CAST(count(DISTINCT substr(t, 1, l)) AS BIGINT) "
            "AS n_prefixes FROM v, "
            "(VALUES (1), (2), (3), (4)) x(l) "
            "GROUP BY 1 ORDER BY 1"),
        "daily_revenue_gorilla_audit": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev "
            "FROM orders GROUP BY 1), "
            "a AS (SELECT day, rev - lag(rev) OVER (ORDER BY day) "
            "AS d1 FROM d), "
            "b AS (SELECT day, d1, d1 - lag(d1) OVER (ORDER BY day) "
            "AS d2 FROM a WHERE d1 IS NOT NULL), "
            "vb1 AS (SELECT sum(GREATEST((length(bin(CASE WHEN d1 >= 0 "
            "THEN 2 * d1 ELSE -2 * d1 - 1 END)) + 6) // 7, 1)) AS v "
            "FROM b), "
            "vb2 AS (SELECT sum(GREATEST((length(bin(CASE WHEN d2 >= 0 "
            "THEN 2 * d2 ELSE -2 * d2 - 1 END)) + 6) // 7, 1)) AS v, "
            "count(*) AS n, sum(CASE WHEN d2 = 0 THEN 1 ELSE 0 END) "
            "AS z FROM b WHERE d2 IS NOT NULL) "
            "SELECT CAST((SELECT count(*) FROM d) AS BIGINT) "
            "AS n_days, "
            "CAST((SELECT n FROM vb2) AS BIGINT) AS n_second_diffs, "
            "CAST((SELECT z FROM vb2) AS BIGINT) AS n_zero_d2, "
            "CAST((SELECT v FROM vb1) AS BIGINT) AS varint_bytes_d1, "
            "CAST((SELECT v FROM vb2) AS BIGINT) AS varint_bytes_d2"),
        "dow_detrend_sign_census": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev "
            "FROM orders GROUP BY 1), "
            "g AS (SELECT isodow(day) AS dow, rev, "
            "count(*) OVER (PARTITION BY isodow(day)) AS n, "
            "sum(CAST(rev AS HUGEINT)) OVER (PARTITION BY "
            "isodow(day)) AS s FROM d) "
            "SELECT CAST(dow AS BIGINT) AS dow, "
            "CAST(sum(CASE WHEN CAST(rev AS HUGEINT) * n > s "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_above, "
            "CAST(sum(CASE WHEN CAST(rev AS HUGEINT) * n < s "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_below, "
            "CAST(sum(CASE WHEN CAST(rev AS HUGEINT) * n = s "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_at "
            "FROM g GROUP BY 1 ORDER BY 1"),
        "daily_peak_concurrent_sessions": (
            "WITH o AS (SELECT user_id, ts, event_id, lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS prev "
            "FROM events), "
            "g AS (SELECT user_id, ts, event_id, CASE WHEN prev IS "
            "NULL OR ts - prev > INTERVAL 1800 SECOND THEN 1 ELSE 0 "
            "END AS brk FROM o), "
            "s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY "
            "user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) "
            "AS sid FROM g), "
            "iv AS (SELECT user_id, sid, min(ts) AS st, max(ts) AS en "
            "FROM s GROUP BY 1, 2), "
            "dl AS (SELECT st AS t, 1 AS d FROM iv "
            "UNION ALL SELECT en, -1 FROM iv), "
            "rp AS (SELECT t, d, sum(d) OVER (ORDER BY t, d DESC "
            "ROWS UNBOUNDED PRECEDING) AS conc FROM dl) "
            "SELECT CAST(CAST(t AS DATE) AS TIMESTAMP) AS day, "
            "CAST(max(conc) AS BIGINT) AS peak_sessions "
            "FROM rp GROUP BY 1 ORDER BY 1"),
        "price_firstdigit_two_sample": (
            "WITH a AS (SELECT CAST(substr(CAST(CAST(round("
            "o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) "
            "AS BIGINT) AS digit, count(*) AS n FROM orders "
            "GROUP BY 1), "
            "b AS (SELECT CAST(substr(CAST(CAST(round("
            "l_extendedprice * 100) AS BIGINT) AS VARCHAR), 1, 1) "
            "AS BIGINT) AS digit, count(*) AS n FROM lineitem "
            "GROUP BY 1), "
            "t AS (SELECT (SELECT sum(n) FROM a) AS t1, "
            "(SELECT sum(n) FROM b) AS t2) "
            "SELECT CAST(COALESCE(a.digit, b.digit) AS BIGINT) "
            "AS digit, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_orders, "
            "CAST(COALESCE(b.n, 0) AS BIGINT) AS n_lines, "
            "CAST(abs(CAST(COALESCE(a.n, 0) AS HUGEINT) * t2 "
            "- CAST(COALESCE(b.n, 0) AS HUGEINT) * t1) AS VARCHAR) "
            "AS l1_num, "
            "CAST(sign(CAST(COALESCE(a.n, 0) AS HUGEINT) * t2 "
            "- CAST(COALESCE(b.n, 0) AS HUGEINT) * t1) AS BIGINT) "
            "AS sgn "
            "FROM a FULL OUTER JOIN b USING (digit), t ORDER BY 1"),
        "iblt_difference_cells": (
            "WITH ks AS (SELECT DISTINCT l_orderkey * 8 "
            "+ l_linenumber AS k FROM lineitem), "
            "df AS (SELECT k FROM ks WHERE k % 31 = 0), "
            "ins AS (SELECT ("
            + _fold60_sql("md5(CAST(i AS VARCHAR) || ':' "
                          "|| CAST(k AS VARCHAR))")
            + ") % 64 AS cell, k FROM df, "
            "(VALUES (0), (1), (2)) h(i)) "
            "SELECT CAST(cell AS BIGINT) AS cell, "
            "CAST(count(*) AS BIGINT) AS n_keys, "
            "CAST(bit_xor(k) AS BIGINT) AS key_xor "
            "FROM ins GROUP BY 1 ORDER BY 1"),
        "hash_bit_balance_audit": (
            "WITH ks AS (SELECT DISTINCT o_orderkey AS k "
            "FROM orders), "
            "h AS (SELECT ("
            + _fold60_sql("md5(CAST(k AS VARCHAR))")
            + ") AS hv FROM ks) "
            "SELECT CAST(b AS BIGINT) AS bit, "
            "CAST(sum((hv >> b) % 2) AS BIGINT) AS n_set, "
            "CAST(count(*) AS BIGINT) AS n_keys "
            "FROM h, UNNEST(range(0, 60)) t(b) "
            "GROUP BY 1 ORDER BY 1"),
        "coorder_percolation_curve": _percolation_sql(),
        "vocab_adjacent_lcp_profile": (
            "WITH v AS (SELECT DISTINCT "
            "unnest(string_split(text, ' ')) AS t FROM documents), "
            "p AS (SELECT t, lag(t) OVER (ORDER BY t) AS pt FROM v), "
            "q AS (SELECT t, pt FROM p WHERE pt IS NOT NULL) "
            "SELECT CAST(l AS BIGINT) AS l, "
            "CAST(count(*) FILTER (substr(t, 1, l) "
            "= substr(pt, 1, l)) AS BIGINT) AS n_pairs_ge "
            "FROM q, UNNEST(range(1, 9)) x(l) "
            "GROUP BY 1 ORDER BY 1"),
        "daily_revenue_haar_energy": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev "
            "FROM orders GROUP BY 1), "
            "r0 AS (SELECT rev, row_number() OVER (ORDER BY day) - 1 "
            "AS rn FROM d), "
            "g1 AS (SELECT rn // 2 AS g, "
            "max(CASE WHEN rn % 2 = 0 THEN rev END) AS a, "
            "max(CASE WHEN rn % 2 = 1 THEN rev END) AS b "
            "FROM r0 GROUP BY 1), "
            "p1 AS (SELECT g, a, b FROM g1 WHERE b IS NOT NULL), "
            "s1 AS (SELECT a + b AS rev, "
            "row_number() OVER (ORDER BY g) - 1 AS rn FROM p1), "
            "g2 AS (SELECT rn // 2 AS g, "
            "max(CASE WHEN rn % 2 = 0 THEN rev END) AS a, "
            "max(CASE WHEN rn % 2 = 1 THEN rev END) AS b "
            "FROM s1 GROUP BY 1), "
            "p2 AS (SELECT g, a, b FROM g2 WHERE b IS NOT NULL), "
            "s2 AS (SELECT a + b AS rev, "
            "row_number() OVER (ORDER BY g) - 1 AS rn FROM p2), "
            "g3 AS (SELECT rn // 2 AS g, "
            "max(CASE WHEN rn % 2 = 0 THEN rev END) AS a, "
            "max(CASE WHEN rn % 2 = 1 THEN rev END) AS b "
            "FROM s2 GROUP BY 1), "
            "p3 AS (SELECT g, a, b FROM g3 WHERE b IS NOT NULL) "
            "SELECT CAST(1 AS BIGINT) AS level, "
            "CAST((SELECT count(*) FROM p1) AS BIGINT) AS n_pairs, "
            "CAST((SELECT count(*) FILTER (a = b) FROM p1) "
            "AS BIGINT) AS zero_details, "
            "(SELECT CAST(COALESCE(sum(CAST(a - b AS HUGEINT) "
            "* (a - b)), 0) AS VARCHAR) FROM p1) AS energy "
            "UNION ALL SELECT 2, (SELECT count(*) FROM p2), "
            "(SELECT count(*) FILTER (a = b) FROM p2), "
            "(SELECT CAST(COALESCE(sum(CAST(a - b AS HUGEINT) "
            "* (a - b)), 0) AS VARCHAR) FROM p2) "
            "UNION ALL SELECT 3, (SELECT count(*) FROM p3), "
            "(SELECT count(*) FILTER (a = b) FROM p3), "
            "(SELECT CAST(COALESCE(sum(CAST(a - b AS HUGEINT) "
            "* (a - b)), 0) AS VARCHAR) FROM p3) ORDER BY 1"),
        "dow_rank_occupancy_matrix": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev "
            "FROM orders GROUP BY 1), "
            "rk AS (SELECT isodow(day) AS dow, row_number() OVER "
            "(PARTITION BY date_trunc('week', day) "
            "ORDER BY rev DESC, day ASC) AS rnk FROM d) "
            "SELECT CAST(dow AS BIGINT) AS dow, "
            "CAST(rnk AS BIGINT) AS rnk, "
            "CAST(count(*) AS BIGINT) AS n_weeks "
            "FROM rk GROUP BY 1, 2 ORDER BY 1, 2"),
        "price_interpolation_error_hist": (
            "WITH k AS (SELECT DISTINCT CAST(round(o_totalprice "
            "* 100) AS BIGINT) AS k FROM orders), "
            "mm AS (SELECT min(k) AS lo, max(k) AS hi, count(*) AS n "
            "FROM k), "
            "r AS (SELECT k, row_number() OVER (ORDER BY k) - 1 "
            "AS rnk FROM k), "
            "e AS (SELECT abs((k - lo) * (n - 1) "
            "// greatest(hi - lo, 1) - rnk) AS err FROM r, mm) "
            "SELECT CAST(CASE WHEN err = 0 THEN 0 "
            "ELSE length(bin(err)) END AS BIGINT) AS err_bucket, "
            "CAST(count(*) AS BIGINT) AS n_keys FROM e "
            "GROUP BY 1 ORDER BY 1"),
        "cdc_chunk_length_hist": (
            "WITH tk AS (SELECT doc_id, i, s[i] AS tok FROM "
            "(SELECT doc_id, string_split(text, ' ') AS s "
            "FROM documents), UNNEST(range(1, len(s) + 1)) r(i)), "
            "hb AS (SELECT doc_id, i, CASE WHEN ("
            + _fold4_sql("md5(tok)")
            + ") % 64 = 0 THEN 1 ELSE 0 END AS b FROM tk), "
            "cid AS (SELECT doc_id, i, COALESCE(sum(b) OVER "
            "(PARTITION BY doc_id ORDER BY i ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING), 0) AS cid FROM hb), "
            "cl AS (SELECT doc_id, cid, count(*) AS clen FROM cid "
            "GROUP BY 1, 2) "
            "SELECT CAST(LEAST(clen, 32) AS BIGINT) AS len_bucket, "
            "CAST(count(*) AS BIGINT) AS n_chunks FROM cl "
            "GROUP BY 1 ORDER BY 1"),
        "partkey_bag_algebra_years": (
            "WITH li AS (SELECT l_partkey AS p, year(l_shipdate) "
            "AS y FROM lineitem "
            "WHERE year(l_shipdate) IN (1995, 1996)), "
            "c AS (SELECT p, "
            "sum(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS n1, "
            "sum(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS n2 "
            "FROM li GROUP BY 1) "
            "SELECT p_brand AS brand, "
            "CAST(sum(LEAST(n1, n2)) AS BIGINT) AS bag_intersect, "
            "CAST(sum(GREATEST(n1 - n2, 0)) AS BIGINT) AS only_y1, "
            "CAST(sum(GREATEST(n2 - n1, 0)) AS BIGINT) AS only_y2, "
            "CAST(count(*) AS BIGINT) AS n_parts "
            "FROM c JOIN part ON p_partkey = c.p "
            "GROUP BY 1 ORDER BY 1"),
        "source_doclen_ks_matrix": (
            "WITH h AS (SELECT source, CAST(n_chars AS BIGINT) AS v, "
            "count(*) AS n FROM documents GROUP BY 1, 2), "
            "c AS (SELECT source, v, sum(n) OVER (PARTITION BY "
            "source ORDER BY v ROWS UNBOUNDED PRECEDING) AS f "
            "FROM h), "
            "tot AS (SELECT source, count(*) AS n FROM documents "
            "GROUP BY 1), "
            "src AS (SELECT DISTINCT source FROM documents), "
            "pairs AS (SELECT a.source AS sa, b.source AS sb "
            "FROM src a JOIN src b ON a.source < b.source), "
            "vals AS (SELECT DISTINCT CAST(n_chars AS BIGINT) AS v "
            "FROM documents), "
            "grid AS (SELECT sa, sb, v FROM pairs, vals), "
            "ga AS (SELECT g.sa, g.sb, g.v, COALESCE(ca.f, 0) AS fa "
            "FROM grid g ASOF LEFT JOIN c ca ON ca.source = g.sa "
            "AND ca.v <= g.v), "
            "gb AS (SELECT g.sa, g.sb, g.v, COALESCE(cb.f, 0) AS fb "
            "FROM grid g ASOF LEFT JOIN c cb ON cb.source = g.sb "
            "AND cb.v <= g.v), "
            "m AS (SELECT ga.sa, ga.sb, ga.v, fa, fb FROM ga "
            "JOIN gb ON ga.sa = gb.sa AND ga.sb = gb.sb "
            "AND ga.v = gb.v) "
            "SELECT m.sa AS source_a, m.sb AS source_b, "
            "CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) "
            "AS n_b, "
            "CAST(max(abs(CAST(fa AS HUGEINT) * tb.n "
            "- CAST(fb AS HUGEINT) * ta.n)) AS VARCHAR) AS ks_num "
            "FROM m JOIN tot ta ON ta.source = m.sa "
            "JOIN tot tb ON tb.source = m.sb "
            "GROUP BY 1, 2, 3, 4 ORDER BY 1, 2"),
        "embedding_adjacent_dot_hist": (
            "WITH e AS (SELECT vec_id, embedding AS v "
            "FROM embeddings), "
            "p AS (SELECT a.vec_id, a.v AS va, b.v AS vb FROM e a "
            "JOIN e b ON b.vec_id = a.vec_id + 1), "
            "d AS (SELECT vec_id, list_sum("
            "[CAST(round(CAST(va[i] AS DOUBLE) * 1000) AS BIGINT) "
            "* CAST(round(CAST(vb[i] AS DOUBLE) * 1000) AS BIGINT) "
            "FOR i IN range(1, len(va) + 1)]) AS dot FROM p) "
            "SELECT CAST(sign(dot) AS BIGINT) AS sgn, "
            "CAST(CASE WHEN dot = 0 THEN 0 "
            "ELSE length(bin(abs(dot))) END AS BIGINT) AS mag, "
            "CAST(count(*) AS BIGINT) AS n_pairs FROM d "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "coorder_hub_common_neighbors": (
            "WITH lp AS (SELECT DISTINCT l_orderkey AS o, "
            "CAST(l_partkey AS BIGINT) AS p FROM lineitem), "
            "pr AS (SELECT DISTINCT a.p AS a, b.p AS b FROM lp a "
            "JOIN lp b ON a.o = b.o AND a.p < b.p), "
            "nb AS (SELECT a AS v, b AS w FROM pr "
            "UNION ALL SELECT b, a FROM pr), "
            "dg AS (SELECT v, count(*) AS deg FROM nb GROUP BY 1), "
            "hubs AS (SELECT v FROM dg ORDER BY deg DESC, v ASC "
            "LIMIT 8), "
            "ha AS (SELECT nb.v AS h, nb.w FROM nb "
            "JOIN hubs ON hubs.v = nb.v), "
            "pairs AS (SELECT a.v AS ha_, b.v AS hb_ FROM hubs a "
            "JOIN hubs b ON a.v < b.v), "
            "cnt AS (SELECT x.h AS ha_, y.h AS hb_, "
            "count(*) AS n FROM ha x "
            "JOIN ha y ON x.w = y.w AND x.h < y.h GROUP BY 1, 2) "
            "SELECT CAST(p.ha_ AS BIGINT) AS hub_a, "
            "CAST(p.hb_ AS BIGINT) AS hub_b, "
            "CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_common "
            "FROM pairs p LEFT JOIN cnt "
            "ON cnt.ha_ = p.ha_ AND cnt.hb_ = p.hb_ "
            "ORDER BY 1, 2"),
        "order_subset_containment": (
            "WITH lp AS (SELECT DISTINCT l_orderkey AS o, "
            "l_partkey AS p FROM lineitem), "
            "sz AS (SELECT o, count(*) AS n FROM lp GROUP BY 1), "
            "shared AS (SELECT a.o AS oa, b.o AS ob, count(*) AS c "
            "FROM lp a JOIN lp b ON a.p = b.p AND a.o != b.o "
            "GROUP BY 1, 2), "
            "cont AS (SELECT DISTINCT oa FROM shared "
            "JOIN sz ON sz.o = oa WHERE c = sz.n) "
            "SELECT CAST(sz.n AS BIGINT) AS subset_size, "
            "CAST(count(*) AS BIGINT) AS n_contained "
            "FROM cont JOIN sz ON sz.o = cont.oa "
            "GROUP BY 1 ORDER BY 1"),
        "doc_alphabet_size_hist": (
            "SELECT CAST(LEAST(len(list_distinct("
            "string_split(text, ''))), 40) AS BIGINT) "
            "AS alphabet_bucket, "
            "CAST(count(*) AS BIGINT) AS n_docs FROM documents "
            "GROUP BY 1 ORDER BY 1"),
        "order_date_inversions": (
            "WITH k AS (SELECT o_orderkey AS k, "
            "CAST(o_orderdate AS DATE) AS d FROM orders "
            "WHERE o_orderkey % 4 = 0) "
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(count(DISTINCT k // 4096) AS BIGINT) AS n_chunks, "
            "CAST((SELECT count(*) FROM k a JOIN k b "
            "ON a.k < b.k AND a.d > b.d) AS VARCHAR) "
            "AS n_inversions FROM k"),
        "orders_vs_lines_qq_table": (
            "WITH o AS (SELECT CAST(round(o_totalprice * 100) "
            "AS BIGINT) AS c FROM orders), "
            "l AS (SELECT CAST(round(l_extendedprice * 100) "
            "AS BIGINT) AS c FROM lineitem), "
            "ro AS (SELECT c, row_number() OVER (ORDER BY c) AS rn "
            "FROM o), "
            "rl AS (SELECT c, row_number() OVER (ORDER BY c) AS rn "
            "FROM l), "
            "sel AS (SELECT q, (q * (SELECT count(*) FROM o) + 99) "
            "// 100 AS ko, (q * (SELECT count(*) FROM l) + 99) "
            "// 100 AS kl FROM (VALUES (10), (20), (30), (40), (50), "
            "(60), (70), (80), (90)) t(q)) "
            "SELECT CAST(q AS BIGINT) AS q, "
            "CAST(ro.c AS BIGINT) AS order_cents, "
            "CAST(rl.c AS BIGINT) AS line_cents, "
            "CAST(1000000 * rl.c // ro.c AS BIGINT) AS ratio_ppm "
            "FROM sel JOIN ro ON ro.rn = sel.ko "
            "JOIN rl ON rl.rn = sel.kl ORDER BY 1"),
        "user_replay_checksum_hist": (
            "WITH s AS (SELECT user_id, string_agg(event_type, '|' "
            "ORDER BY ts, event_id) AS seq FROM events GROUP BY 1) "
            "SELECT CAST(CAST(CONCAT('0x', substr(md5(seq), 1, 2)) "
            "AS BIGINT) % 64 AS BIGINT) AS cks_bucket, "
            "CAST(count(*) AS BIGINT) AS n_users FROM s "
            "GROUP BY 1 ORDER BY 1"),
        "expensive_line_ships_last": (
            "WITH l AS (SELECT l_orderkey AS o, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS c, "
            "l_shipdate AS sd FROM lineitem), "
            "a AS (SELECT o, max(c) AS p, max(sd) AS s, "
            "count(*) AS n FROM l GROUP BY 1), "
            "m AS (SELECT l.o, max(l.sd) AS sp FROM l "
            "JOIN a ON a.o = l.o AND l.c = a.p GROUP BY 1), "
            "j AS (SELECT a.o, CASE WHEN m.sp = a.s THEN 1 ELSE 0 "
            "END AS hit FROM a JOIN m ON m.o = a.o WHERE a.n >= 2) "
            "SELECT o_orderpriority AS priority, "
            "CAST(count(*) AS BIGINT) AS n_multi, "
            "CAST(sum(hit) AS BIGINT) AS n_expensive_last "
            "FROM j JOIN orders ON o_orderkey = j.o "
            "GROUP BY 1 ORDER BY 1"),
        "lww_compaction_by_type": (
            "WITH w AS (SELECT user_id, event_type, value, "
            "row_number() OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_keys, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS surviving_cents FROM w WHERE rn = 1 "
            "GROUP BY 1 ORDER BY 1"),
        "orders_count_revenue_best_lag": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "count(*) AS cnt, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev "
            "FROM orders GROUP BY 1), "
            "lg AS (SELECT l FROM UNNEST(range(-7, 8)) t(l)), "
            "dot AS (SELECT lg.l AS lag, "
            "COALESCE(sum(CAST(a.cnt AS HUGEINT) * b.rev), 0) AS dp "
            "FROM lg CROSS JOIN d a LEFT JOIN d b "
            "ON b.day = a.day + CAST(lg.l AS INTEGER) GROUP BY 1), "
            "best AS (SELECT lag FROM dot "
            "ORDER BY dp DESC, lag ASC LIMIT 1) "
            "SELECT CAST(lag AS BIGINT) AS lag, "
            "CAST(dp AS VARCHAR) AS dot_product, "
            "CAST(CASE WHEN lag = (SELECT lag FROM best) THEN 1 "
            "ELSE 0 END AS BIGINT) AS is_best FROM dot ORDER BY 1"),
        "join_salt_plan": (
            "WITH c AS (SELECT o_custkey, count(*) AS n FROM orders "
            "GROUP BY 1) "
            "SELECT CAST((n + 7) // 8 AS BIGINT) AS n_salts, "
            "CAST(count(*) AS BIGINT) AS n_keys FROM c "
            "GROUP BY 1 ORDER BY 1"),
        "hub_pair_path_census": (
            "WITH lp AS (SELECT DISTINCT l_orderkey AS o, "
            "CAST(l_partkey AS BIGINT) AS p FROM lineitem), "
            "pr AS (SELECT DISTINCT a.p AS a, b.p AS b FROM lp a "
            "JOIN lp b ON a.o = b.o AND a.p < b.p), "
            "nb AS (SELECT a AS v, b AS w FROM pr "
            "UNION ALL SELECT b, a FROM pr), "
            "dg AS (SELECT v, count(*) AS deg FROM nb GROUP BY 1), "
            "t2 AS (SELECT v, row_number() OVER (ORDER BY deg DESC, "
            "v ASC) AS rn FROM dg), "
            "h AS (SELECT max(CASE WHEN rn = 1 THEN v END) AS ha, "
            "max(CASE WHEN rn = 2 THEN v END) AS hb FROM t2 "
            "WHERE rn <= 2), "
            "naa AS (SELECT w FROM nb, h WHERE v = ha), "
            "nbb AS (SELECT w FROM nb, h WHERE v = hb), "
            "p1 AS (SELECT count(*) AS c FROM pr, h "
            "WHERE a = LEAST(ha, hb) AND b = GREATEST(ha, hb)), "
            "p2 AS (SELECT count(*) AS c FROM naa x "
            "JOIN nbb y ON x.w = y.w CROSS JOIN h "
            "WHERE x.w NOT IN (ha, hb)), "
            "p3 AS (SELECT count(*) AS c FROM nb e CROSS JOIN h "
            "WHERE e.v IN (SELECT w FROM naa) "
            "AND e.w IN (SELECT w FROM nbb) "
            "AND e.v NOT IN (ha, hb) AND e.w NOT IN (ha, hb) "
            "AND e.v != e.w) "
            "SELECT CAST(1 AS BIGINT) AS path_len, "
            "CAST((SELECT c FROM p1) AS BIGINT) AS n_paths "
            "UNION ALL SELECT 2, (SELECT c FROM p2) "
            "UNION ALL SELECT 3, (SELECT c FROM p3) ORDER BY 1"),
        "coorder_edge_churn_by_year": (
            "WITH lp AS (SELECT DISTINCT l_orderkey AS o, "
            "CAST(l_partkey AS BIGINT) AS p FROM lineitem), "
            "oy AS (SELECT o_orderkey AS o, year(o_orderdate) AS y "
            "FROM orders), "
            "lpy AS (SELECT lp.o, oy.y, lp.p FROM lp "
            "JOIN oy ON oy.o = lp.o), "
            "e AS (SELECT DISTINCT a.y, a.p AS a, b.p AS b "
            "FROM lpy a JOIN lpy b ON a.o = b.o AND a.p < b.p), "
            "tot AS (SELECT y, count(*) AS n FROM e GROUP BY 1), "
            "com AS (SELECT a.y AS ya, count(*) AS n FROM e a "
            "JOIN e b ON b.y = a.y + 1 AND a.a = b.a AND a.b = b.b "
            "GROUP BY 1) "
            "SELECT CAST(ta.y AS BIGINT) AS year_a, "
            "CAST(tb.y AS BIGINT) AS year_b, "
            "CAST(COALESCE(com.n, 0) AS BIGINT) AS n_common, "
            "CAST(ta.n AS BIGINT) AS n_edges_a, "
            "CAST(tb.n AS BIGINT) AS n_edges_b "
            "FROM tot ta JOIN tot tb ON tb.y = ta.y + 1 "
            "LEFT JOIN com ON com.ya = ta.y ORDER BY 1"),
        "deletion_vector_plan": (
            "WITH m AS (SELECT event_id // 32 AS ch, "
            "CASE WHEN CAST(CONCAT('0x', substr(md5(CAST(user_id "
            "AS VARCHAR)), 1, 2)) AS BIGINT) % 16 = 0 THEN 1 ELSE 0 "
            "END AS del FROM events), "
            "c AS (SELECT ch, count(*) AS n, sum(del) AS d FROM m "
            "GROUP BY 1) "
            "SELECT CAST(100 * d // n // 5 AS BIGINT) "
            "AS del_decile, CAST(count(*) AS BIGINT) AS n_chunks "
            "FROM c GROUP BY 1 ORDER BY 1"),
        "type_quiet_window": (
            "WITH mm AS (SELECT DISTINCT event_type AS ty, "
            "(epoch_us(ts) // 60000000) % 1440 AS m FROM events), "
            "w AS (SELECT ty, m, lead(m) OVER (PARTITION BY ty "
            "ORDER BY m) AS nm FROM mm), "
            "g AS (SELECT ty, CASE WHEN nm IS NULL THEN 1440 - m "
            "+ (SELECT min(m2.m) FROM mm m2 WHERE m2.ty = w.ty) "
            "ELSE nm - m END AS gap FROM w), "
            "s AS (SELECT ty, count(*) AS n_minutes, max(gap) AS mg "
            "FROM g GROUP BY 1) "
            "SELECT ty AS event_type, "
            "CAST(n_minutes AS BIGINT) AS n_minutes, "
            "CAST(CASE WHEN n_minutes = 1 THEN 1440 ELSE mg END "
            "AS BIGINT) AS max_gap FROM s ORDER BY 1"),
        "type_mix_changepoint": (
            "WITH dgrid AS (SELECT DISTINCT CAST(ts AS DATE) AS day "
            "FROM events), "
            "tys AS (SELECT DISTINCT event_type AS ty FROM events), "
            "cnt AS (SELECT event_type AS ty, CAST(ts AS DATE) "
            "AS day, count(*) AS n FROM events GROUP BY 1, 2), "
            "g AS (SELECT tys.ty, dgrid.day, COALESCE(cnt.n, 0) AS n "
            "FROM tys CROSS JOIN dgrid LEFT JOIN cnt "
            "ON cnt.ty = tys.ty AND cnt.day = dgrid.day), "
            "cum AS (SELECT ty, day, sum(n) OVER (PARTITION BY ty "
            "ORDER BY day ROWS UNBOUNDED PRECEDING) AS pre, "
            "row_number() OVER (PARTITION BY ty ORDER BY day) AS i, "
            "count(*) OVER (PARTITION BY ty) AS nd, "
            "sum(n) OVER (PARTITION BY ty) AS tot FROM g), "
            "dev AS (SELECT ty, day, abs(CAST(pre AS HUGEINT) "
            "* (nd - i) - CAST(tot - pre AS HUGEINT) * i) AS dv "
            "FROM cum WHERE i < nd), "
            "best AS (SELECT ty, day, dv, row_number() OVER "
            "(PARTITION BY ty ORDER BY dv DESC, day ASC) AS rn "
            "FROM dev) "
            "SELECT ty AS event_type, "
            "CAST(day AS TIMESTAMP) AS best_day, "
            "CAST(dv AS VARCHAR) AS deviation FROM best "
            "WHERE rn = 1 ORDER BY 1"),
        "cluster_sample_estimator_audit": (
            "WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k, "
            "CAST(round(o_totalprice * 100) AS HUGEINT) AS cents "
            "FROM orders), "
            "f AS (SELECT cents, "
            "CAST(CONCAT('0x', substr(md5(CAST(k // 64 AS VARCHAR)), "
            "1, 2)) AS BIGINT) % 8 = 0 AS inch, "
            "CAST(CONCAT('0x', substr(md5(CAST(k AS VARCHAR)), "
            "1, 2)) AS BIGINT) % 8 = 0 AS inrow FROM o), "
            "s AS (SELECT sum(cents) AS total, "
            "COALESCE(sum(CASE WHEN inch THEN cents END), 0) AS cs, "
            "COALESCE(sum(CASE WHEN inrow THEN cents END), 0) AS rs "
            "FROM f) "
            "SELECT CAST(total AS VARCHAR) AS exact_cents, "
            "CAST(8 * cs AS VARCHAR) AS est_chunk_cents, "
            "CAST(8 * rs AS VARCHAR) AS est_row_cents, "
            "CAST(1000000 * abs(8 * cs - total) "
            "// greatest(total, 1) AS BIGINT) AS err_chunk_ppm, "
            "CAST(1000000 * abs(8 * rs - total) "
            "// greatest(total, 1) AS BIGINT) AS err_row_ppm FROM s"),
        "selectivity_independence_audit": (
            "WITH f AS (SELECT "
            "CASE WHEN CAST(round(l_quantity) AS BIGINT) >= 25 "
            "THEN 1 ELSE 0 END AS a, "
            "CASE WHEN CAST(round(l_discount * 100) AS BIGINT) >= 5 "
            "THEN 1 ELSE 0 END AS b, "
            "CASE WHEN year(l_shipdate) = 1996 THEN 1 ELSE 0 END "
            "AS c FROM lineitem), "
            "s AS (SELECT count(*) AS n, sum(a) AS na, sum(b) AS nb, "
            "sum(c) AS nc, sum(a * b) AS nab, sum(a * c) AS nac, "
            "sum(b * c) AS nbc FROM f), "
            "p AS (SELECT 'AB' AS pair, na AS n_a, nb AS n_b, "
            "nab AS n_ab, n FROM s "
            "UNION ALL SELECT 'AC', na, nc, nac, n FROM s "
            "UNION ALL SELECT 'BC', nb, nc, nbc, n FROM s) "
            "SELECT pair, CAST(n_a AS BIGINT) AS n_a, "
            "CAST(n_b AS BIGINT) AS n_b, CAST(n_ab AS BIGINT) AS n_ab, "
            "CAST(sign(CAST(n_ab AS HUGEINT) * n "
            "- CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS sgn, "
            "CAST(1000000 * abs(CAST(n_ab AS HUGEINT) * n "
            "- CAST(n_a AS HUGEINT) * n_b) "
            "// greatest(CAST(n_a AS HUGEINT) * n_b, 1) AS BIGINT) "
            "AS err_ppm FROM p ORDER BY pair"),
        "kmv_monthly_distinct_audit": (
            "WITH du AS (SELECT DISTINCT "
            "CAST(date_trunc('month', ts) AS TIMESTAMP) AS mo, "
            "CAST(user_id AS BIGINT) AS u FROM events), "
            "h AS (SELECT mo, CAST(CONCAT('0x', "
            "substr(md5(CAST(u AS VARCHAR)), 1, 12)) AS BIGINT) AS hv "
            "FROM du), "
            "r AS (SELECT mo, hv, row_number() OVER "
            "(PARTITION BY mo ORDER BY hv) AS rn FROM h), "
            "s AS (SELECT mo, count(*) AS n, "
            "max(CASE WHEN rn = 8 THEN hv END) AS h8, max(hv) AS mx "
            "FROM r GROUP BY 1) "
            "SELECT mo AS month, CAST(n AS BIGINT) AS n_exact, "
            "CAST(CASE WHEN n >= 8 THEN h8 ELSE mx END AS BIGINT) "
            "AS kth_hash, "
            "CAST(CASE WHEN n >= 8 THEN 1970324836974592 // h8 "
            "ELSE n END AS BIGINT) AS est FROM s ORDER BY 1"),
        "revenue_sign_motif_census": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS rev "
            "FROM orders GROUP BY 1), "
            "sg AS (SELECT day, sign(rev - lag(rev) OVER "
            "(ORDER BY day)) AS s FROM d), "
            "w AS (SELECT lag(s, 2) OVER (ORDER BY day) AS s1, "
            "lag(s, 1) OVER (ORDER BY day) AS s2, s AS s3 FROM sg) "
            "SELECT CAST((s1 + 1) * 9 + (s2 + 1) * 3 + (s3 + 1) "
            "AS BIGINT) AS motif_code, CAST(count(*) AS BIGINT) AS n "
            "FROM w WHERE s1 IS NOT NULL GROUP BY 1 ORDER BY 1"),
        "merkle_anti_entropy_audit": (
            "WITH r AS (SELECT CAST(l_orderkey AS BIGINT) // 512 "
            "AS leaf, CAST(CONCAT('0x', substr(md5("
            "CAST(CAST(l_orderkey AS BIGINT) AS VARCHAR) || ':' || "
            "CAST(CAST(l_linenumber AS BIGINT) AS VARCHAR)), 1, 12)) "
            "AS BIGINT) AS cs, "
            "CAST(CONCAT('0x', substr(md5(CAST(CAST(l_orderkey "
            "AS BIGINT) AS VARCHAR)), 1, 2)) AS BIGINT) % 16 = 0 "
            "AS lost FROM lineitem), "
            "l AS (SELECT leaf, sum(cs) AS f, "
            "sum(CASE WHEN lost THEN 0 ELSE cs END) AS s FROM r "
            "GROUP BY 1), "
            "p AS (SELECT leaf // 16 AS par, "
            "sum(CASE WHEN f != s THEN 1 ELSE 0 END) AS d FROM l "
            "GROUP BY 1) "
            "SELECT CAST(0 AS BIGINT) AS level, "
            "CAST(count(*) AS BIGINT) AS n_nodes, "
            "CAST(sum(CASE WHEN f != s THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_diff FROM l "
            "UNION ALL SELECT 1, count(*), "
            "sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) FROM p "
            "ORDER BY 1"),
        "roaring_container_census": (
            "WITH c AS (SELECT l_returnflag AS flag, "
            "(CAST(l_orderkey AS BIGINT) * 8 "
            "+ CAST(l_linenumber AS BIGINT)) // 65536 AS cont, "
            "count(*) AS n FROM lineitem GROUP BY 1, 2) "
            "SELECT flag, "
            "CAST(sum(CASE WHEN n < 4096 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_array_containers, "
            "CAST(sum(CASE WHEN n >= 4096 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_bitmap_containers, "
            "CAST(sum(CASE WHEN n < 4096 THEN 2 * n ELSE 8192 END) "
            "AS BIGINT) AS total_bytes, "
            "CAST(sum(n) AS BIGINT) AS n_rows FROM c "
            "GROUP BY 1 ORDER BY 1"),
        "grace_hash_recursion_plan": (
            "WITH h AS (SELECT CAST(CONCAT('0x', substr(md5("
            "CAST(CAST(l_partkey AS BIGINT) AS VARCHAR)), 1, 2)) "
            "AS BIGINT) % 16 AS b1, "
            "CAST(CONCAT('0x', substr(md5(CAST(CAST(l_partkey "
            "AS BIGINT) AS VARCHAR)), 3, 2)) AS BIGINT) % 16 AS b2 "
            "FROM lineitem), "
            "g AS (SELECT b1, b2, count(*) AS n FROM h GROUP BY 1, 2), "
            "caps AS (SELECT (9 * sum(n) + 127) // 128 AS cap1, "
            "((9 * sum(n) + 127) // 128 + 15) // 16 AS cap2 FROM g), "
            "l1 AS (SELECT b1, sum(n) AS n FROM g GROUP BY 1), "
            "o1 AS (SELECT b1 FROM l1, caps WHERE n > cap1), "
            "l2 AS (SELECT g.n FROM g JOIN o1 ON g.b1 = o1.b1) "
            "SELECT CAST(1 AS BIGINT) AS level, "
            "CAST(16 AS BIGINT) AS n_buckets, "
            "CAST((SELECT count(*) FROM o1) AS BIGINT) AS n_overflow, "
            "CAST(COALESCE((SELECT max(n) FROM l1), 0) AS BIGINT) "
            "AS max_rows, "
            "CAST((SELECT cap1 FROM caps) AS BIGINT) AS cap_rows "
            "UNION ALL SELECT 2, 16 * (SELECT count(*) FROM o1), "
            "COALESCE((SELECT sum(CASE WHEN n > cap2 THEN 1 ELSE 0 "
            "END) FROM l2, caps), 0), "
            "COALESCE((SELECT max(n) FROM l2), 0), "
            "(SELECT cap2 FROM caps) ORDER BY 1"),
        "bloom_skip_index_audit": (
            "WITH pr AS (SELECT DISTINCT CAST(s_suppkey AS BIGINT) "
            "AS k FROM supplier WHERE round(s_acctbal * 100) < 0), "
            "li AS (SELECT CAST(l_orderkey AS BIGINT) // 1024 AS ch, "
            "CAST(l_suppkey AS BIGINT) AS k FROM lineitem), "
            "hx AS (SELECT DISTINCT k FROM li), "
            "hp AS (SELECT k, CAST(CONCAT('0x', "
            "substr(md5(CAST(k AS VARCHAR)), 1, 2)) AS BIGINT) % 60 "
            "AS p1, CAST(CONCAT('0x', "
            "substr(md5(CAST(k AS VARCHAR)), 3, 2)) AS BIGINT) % 60 "
            "AS p2 FROM hx), "
            "b AS (SELECT li.ch, bit_or((CAST(1 AS BIGINT) << hp.p1) "
            "| (CAST(1 AS BIGINT) << hp.p2)) AS w FROM li "
            "JOIN hp ON hp.k = li.k GROUP BY 1), "
            "pres AS (SELECT DISTINCT ch, k FROM li "
            "WHERE k IN (SELECT k FROM pr)), "
            "pp AS (SELECT k, CAST(CONCAT('0x', "
            "substr(md5(CAST(k AS VARCHAR)), 1, 2)) AS BIGINT) % 60 "
            "AS p1, CAST(CONCAT('0x', "
            "substr(md5(CAST(k AS VARCHAR)), 3, 2)) AS BIGINT) % 60 "
            "AS p2 FROM pr), "
            "cls AS (SELECT b.ch, pp.k, "
            "((b.w >> pp.p1) & 1) = 1 AND ((b.w >> pp.p2) & 1) = 1 "
            "AS maybe, pres.k IS NOT NULL AS present "
            "FROM b CROSS JOIN pp LEFT JOIN pres "
            "ON pres.ch = b.ch AND pres.k = pp.k) "
            "SELECT CAST((SELECT count(*) FROM pr) AS BIGINT) "
            "AS n_probes, "
            "CAST((SELECT count(*) FROM b) AS BIGINT) AS n_chunks, "
            "CAST(COALESCE(sum(CASE WHEN present THEN 1 ELSE 0 END), "
            "0) AS BIGINT) AS n_present, "
            "CAST(COALESCE(sum(CASE WHEN maybe AND NOT present "
            "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_false_pos, "
            "CAST(COALESCE(sum(CASE WHEN NOT maybe AND NOT present "
            "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_skipped "
            "FROM cls"),
        "theilsen_slope_ppm_hist": (
            "WITH m AS (SELECT date_trunc('month', o_orderdate) "
            "AS mo, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS rev FROM orders GROUP BY 1), "
            "r AS (SELECT rev, row_number() OVER (ORDER BY mo) AS i "
            "FROM m), "
            "p AS (SELECT 1000000 * (b.rev - a.rev) AS num, "
            "b.i - a.i AS den FROM r a JOIN r b ON b.i > a.i), "
            "s AS (SELECT CASE WHEN num >= 0 THEN num // den "
            "ELSE -((-num + den - 1) // den) END AS slope_ppm "
            "FROM p) "
            "SELECT CAST(slope_ppm AS BIGINT) AS slope_ppm, "
            "CAST(count(*) AS BIGINT) AS n_pairs FROM s "
            "GROUP BY 1 ORDER BY 1"),
        "chao1_distinct_estimator": (
            "WITH s AS (SELECT CAST(user_id AS BIGINT) AS u, "
            "sum(CASE WHEN CAST(CONCAT('0x', substr(md5("
            "CAST(CAST(event_id AS BIGINT) AS VARCHAR)), 1, 2)) "
            "AS BIGINT) % 8 = 0 THEN 1 ELSE 0 END) AS ns "
            "FROM events GROUP BY 1), "
            "a AS (SELECT count(*) AS n_exact, "
            "sum(CASE WHEN ns > 0 THEN 1 ELSE 0 END) AS d, "
            "sum(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS f1, "
            "sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS f2 FROM s) "
            "SELECT CAST(n_exact AS BIGINT) AS n_exact, "
            "CAST(d AS BIGINT) AS d_sample, CAST(f1 AS BIGINT) AS f1, "
            "CAST(f2 AS BIGINT) AS f2, "
            "CAST(d + f1 * (f1 - 1) // (2 * (f2 + 1)) AS BIGINT) "
            "AS est FROM a"),
        "ta_topk_stop_depth": (
            "WITH base AS (SELECT o_custkey AS c, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS s, "
            "count(*) AS n FROM orders GROUP BY 1), "
            "r AS (SELECT c, s, n, s + 1000 * n AS sc, "
            "row_number() OVER (ORDER BY s DESC, c) AS ra, "
            "row_number() OVER (ORDER BY n DESC, c) AS rb FROM base), "
            "g AS (SELECT d.ra AS d, x.sc FROM r d JOIN r x "
            "ON least(x.ra, x.rb) <= d.ra), "
            "w AS (SELECT d, sc, row_number() OVER (PARTITION BY d "
            "ORDER BY sc DESC) AS rk, count(*) OVER (PARTITION BY d) "
            "AS n_seen FROM g), "
            "kv AS (SELECT d, max(CASE WHEN rk = 10 THEN sc END) "
            "AS kth, max(n_seen) AS n_seen FROM w GROUP BY d), "
            "t AS (SELECT a.ra AS d, a.s + 1000 * b.n AS thr "
            "FROM r a JOIN r b ON b.rb = a.ra), "
            "st AS (SELECT kv.d, kv.kth, kv.n_seen, t.thr FROM kv "
            "JOIN t ON t.d = kv.d WHERE kv.n_seen >= 10 "
            "AND kv.kth >= t.thr ORDER BY kv.d LIMIT 1) "
            "SELECT CAST(10 AS BIGINT) AS k, "
            "CAST(d AS BIGINT) AS stop_depth, "
            "CAST(thr AS BIGINT) AS threshold, "
            "CAST(kth AS BIGINT) AS kth_score, "
            "CAST(n_seen AS BIGINT) AS n_seen FROM st"),
        "pq2_block_assignment_census": (
            "WITH dm AS (SELECT CAST(r.i AS INT) AS i "
            "FROM range(1, 65) r(i)), "
            "q AS (SELECT vec_id, dm.i, "
            "CAST(round(CAST(embedding[dm.i] AS DOUBLE) * 100) "
            "AS BIGINT) AS v, (dm.i - 1) // 8 AS blk "
            "FROM embeddings, dm), "
            "c0 AS (SELECT i, v FROM q WHERE vec_id = 0), "
            "c1 AS (SELECT i, v FROM q WHERE vec_id = 1), "
            "dist AS (SELECT q.vec_id, q.blk, "
            "sum((q.v - c0.v) * (q.v - c0.v)) AS d0, "
            "sum((q.v - c1.v) * (q.v - c1.v)) AS d1 FROM q "
            "JOIN c0 ON c0.i = q.i JOIN c1 ON c1.i = q.i "
            "GROUP BY 1, 2), "
            "asg AS (SELECT blk, CASE WHEN d0 <= d1 THEN 0 ELSE 1 END "
            "AS pick, CASE WHEN d0 <= d1 THEN d0 ELSE d1 END AS dd "
            "FROM dist) "
            "SELECT CAST(blk AS BIGINT) AS block, "
            "CAST(sum(CASE WHEN pick = 0 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_c0, "
            "CAST(sum(CASE WHEN pick = 1 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_c1, "
            "CAST(sum(dd) AS BIGINT) AS distortion FROM asg "
            "GROUP BY 1 ORDER BY 1"),
        "dict_encoding_planner": (
            "WITH v AS (SELECT 'p_brand' AS col, p_brand AS val "
            "FROM part UNION ALL SELECT 'p_type', p_type FROM part "
            "UNION ALL SELECT 'p_name', p_name FROM part), "
            "g AS (SELECT col, val, count(*) AS n FROM v "
            "GROUP BY 1, 2), "
            "s AS (SELECT col, sum(n) AS n_rows, count(*) "
            "AS n_distinct, sum(n * length(val)) AS plain_bytes, "
            "sum(length(val)) + 2 * sum(n) AS dict_bytes FROM g "
            "GROUP BY 1) "
            "SELECT col, CAST(n_rows AS BIGINT) AS n_rows, "
            "CAST(n_distinct AS BIGINT) AS n_distinct, "
            "CAST(plain_bytes AS BIGINT) AS plain_bytes, "
            "CAST(dict_bytes AS BIGINT) AS dict_bytes, "
            "CAST(CASE WHEN dict_bytes < plain_bytes THEN 1 ELSE 0 "
            "END AS BIGINT) AS use_dict FROM s ORDER BY col"),
        "checkpoint_cadence_plan": (
            "WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, "
            "user_id AS u FROM events), "
            "a AS (SELECT day, count(*) AS ad FROM du GROUP BY 1), "
            "g AS (SELECT ad, row_number() OVER (ORDER BY day) - 1 "
            "AS i FROM a), "
            "uu AS (SELECT count(DISTINCT user_id) AS u FROM events), "
            "ks AS (SELECT unnest([1, 2, 4, 8]) AS k) "
            "SELECT CAST(k AS BIGINT) AS cadence, "
            "CAST(sum(CASE WHEN i % k = 0 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_full, "
            "CAST(sum(CASE WHEN i % k = 0 THEN 0 ELSE 1 END) "
            "AS BIGINT) AS n_incr, "
            "CAST(sum(CASE WHEN i % k = 0 THEN uu.u ELSE ad END) "
            "AS BIGINT) AS total_units "
            "FROM g, uu, ks GROUP BY 1 ORDER BY 1"),
        "samplesort_splitter_audit": (
            "WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS c "
            "FROM orders), "
            "sm AS (SELECT c FROM o WHERE CAST(CONCAT('0x', "
            "substr(md5(CAST(k AS VARCHAR)), 1, 2)) AS BIGINT) "
            "% 64 = 0), "
            "r AS (SELECT c, row_number() OVER (ORDER BY c) - 1 AS i, "
            "count(*) OVER () AS ns FROM sm), "
            "sp AS (SELECT r.c FROM r JOIN (SELECT unnest("
            "range(1, 16)) AS j) js ON r.i = (js.j * r.ns) // 16), "
            "b AS (SELECT o.c, (SELECT count(*) FROM sp "
            "WHERE sp.c <= o.c) AS bucket FROM o) "
            "SELECT CAST(bucket AS BIGINT) AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_rows FROM b "
            "GROUP BY 1 ORDER BY 1"),
        "median_of_medians_rank_audit": (
            "WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS c "
            "FROM orders), "
            "rr AS (SELECT k // 8 AS ch, c, row_number() OVER "
            "(PARTITION BY k // 8 ORDER BY c, k) AS rn, "
            "count(*) OVER (PARTITION BY k // 8) AS n FROM o), "
            "md AS (SELECT ch, c AS med FROM rr "
            "WHERE rn = (n + 1) // 2), "
            "mr AS (SELECT med, row_number() OVER "
            "(ORDER BY med, ch) AS rn, count(*) OVER () AS n "
            "FROM md), "
            "m AS (SELECT med FROM mr WHERE rn = (n + 1) // 2) "
            "SELECT CAST((SELECT med FROM m) AS BIGINT) AS m_cents, "
            "CAST(sum(CASE WHEN c < (SELECT med FROM m) THEN 1 "
            "ELSE 0 END) AS BIGINT) AS n_below, "
            "CAST(sum(CASE WHEN c = (SELECT med FROM m) THEN 1 "
            "ELSE 0 END) AS BIGINT) AS n_eq, "
            "CAST(count(*) AS BIGINT) AS n_total, "
            "CAST(1000000 * sum(CASE WHEN c < (SELECT med FROM m) "
            "THEN 1 ELSE 0 END) // greatest(count(*), 1) AS BIGINT) "
            "AS rank_ppm FROM o"),
        "vocab_growth_checkpoints": (
            "WITH mt AS (SELECT tok, min(doc_id) AS md FROM "
            "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1), "
            "mx AS (SELECT max(doc_id) AS m FROM documents), "
            "ks AS (SELECT r.i AS k FROM range(0, 64) r(i), mx "
            "WHERE r.i = 0 OR (CAST(1 AS BIGINT) << (r.i - 1)) "
            "<= mx.m) "
            "SELECT CAST(k AS BIGINT) AS k, "
            "CAST((SELECT count(*) FROM documents WHERE doc_id "
            "< (CAST(1 AS BIGINT) << k)) AS BIGINT) AS n_docs, "
            "CAST((SELECT count(*) FROM mt WHERE md "
            "< (CAST(1 AS BIGINT) << k)) AS BIGINT) AS vocab_size "
            "FROM ks ORDER BY 1"),
        "bitsliced_sum_audit": (
            "WITH q AS (SELECT CAST(round(l_quantity) AS BIGINT) "
            "AS v FROM lineitem), "
            "b AS (SELECT r.i AS bit FROM range(0, 7) r(i)) "
            "SELECT CAST(bit AS BIGINT) AS bit, "
            "CAST(sum((v >> bit) & 1) AS BIGINT) AS n_set, "
            "CAST(sum((v >> bit) & 1) * (CAST(1 AS BIGINT) << bit) "
            "AS BIGINT) AS contribution "
            "FROM q, b GROUP BY bit ORDER BY 1"),
        "hash_table_probe_cost_sweep": (
            "WITH ks AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) "
            "AS c FROM orders), "
            "h AS (SELECT CAST(CONCAT('0x', "
            "substr(md5(CAST(c AS VARCHAR)), 1, 12)) AS BIGINT) "
            "AS hv FROM ks), "
            "kk AS (SELECT unnest([4, 6, 8, 10]) AS k), "
            "ld AS (SELECT kk.k, hv % (CAST(1 AS BIGINT) << kk.k) "
            "AS b, count(*) AS c FROM h, kk GROUP BY 1, 2), "
            "s AS (SELECT k, max(c) AS mx, "
            "sum(c * (c + 1) // 2) AS cost, sum(c) AS nk FROM ld "
            "GROUP BY 1) "
            "SELECT CAST(k AS BIGINT) AS k, "
            "CAST(CAST(1 AS BIGINT) << k AS BIGINT) AS n_buckets, "
            "CAST(nk AS BIGINT) AS n_keys, "
            "CAST(mx AS BIGINT) AS max_load, "
            "CAST(cost AS BIGINT) AS probe_cost FROM s ORDER BY 1"),
        "cuckoo_choice_load_audit": (
            "WITH ks AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) "
            "AS k FROM lineitem), "
            "h AS (SELECT k, CAST(CONCAT('0x', "
            "substr(md5(CAST(k AS VARCHAR)), 1, 4)) AS BIGINT) % 256 "
            "AS b1, CAST(CONCAT('0x', "
            "substr(md5(CAST(k AS VARCHAR)), 5, 4)) AS BIGINT) % 256 "
            "AS b2 FROM ks), "
            "ch AS (SELECT b1 AS b FROM h "
            "UNION ALL SELECT b2 FROM h), "
            "ld AS (SELECT b, count(*) AS n FROM ch GROUP BY 1), "
            "l2 AS (SELECT r.i AS b, COALESCE(ld.n, 0) AS load "
            "FROM range(0, 256) r(i) LEFT JOIN ld ON ld.b = r.i), "
            "hist AS (SELECT load, count(*) AS n FROM l2 GROUP BY 1), "
            "hard AS (SELECT count(*) AS n FROM h "
            "JOIN l2 a ON a.b = h.b1 JOIN l2 c ON c.b = h.b2 "
            "WHERE a.load > 8 AND c.load > 8) "
            "SELECT CAST(load AS BIGINT) AS load, "
            "CAST(n AS BIGINT) AS n_buckets FROM hist "
            "UNION ALL SELECT -1, (SELECT n FROM hard) ORDER BY 1"),
        "seasonal_naive_backtest": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev "
            "FROM orders GROUP BY 1), "
            "j AS (SELECT a.day, abs(a.rev - b.rev) AS err "
            "FROM d a JOIN d b ON b.day = a.day - 7) "
            "SELECT CAST(isodow(day) AS BIGINT) AS isodow, "
            "CAST(count(*) AS BIGINT) AS n_days, "
            "CAST(sum(err) AS BIGINT) AS sum_abs_err_cents "
            "FROM j GROUP BY 1 ORDER BY 1"),
        "knn1_hubness_hist": (
            "WITH s AS (SELECT vec_id, embedding FROM embeddings "
            "WHERE vec_id % 8 = 0), "
            "dm AS (SELECT CAST(r.i AS INT) AS i "
            "FROM range(1, 65) r(i)), "
            "q AS (SELECT vec_id, dm.i, "
            "CAST(round(CAST(embedding[dm.i] AS DOUBLE) * 100) "
            "AS BIGINT) AS v FROM s, dm), "
            "dp AS (SELECT a.vec_id AS a, b.vec_id AS b, "
            "sum(a.v * b.v) AS dot FROM q a JOIN q b "
            "ON a.i = b.i AND a.vec_id != b.vec_id GROUP BY 1, 2), "
            "nn AS (SELECT a, b FROM (SELECT a, b, row_number() "
            "OVER (PARTITION BY a ORDER BY dot DESC, b ASC) AS rn "
            "FROM dp) WHERE rn = 1), "
            "ind AS (SELECT s.vec_id, COALESCE(c.n, 0) AS indeg "
            "FROM s LEFT JOIN (SELECT b, count(*) AS n FROM nn "
            "GROUP BY 1) c ON c.b = s.vec_id) "
            "SELECT CAST(indeg AS BIGINT) AS indegree, "
            "CAST(count(*) AS BIGINT) AS n_vectors FROM ind "
            "GROUP BY 1 ORDER BY 1"),
        "cascade_delete_impact": (
            "WITH dc AS (SELECT c_custkey AS ck FROM customer "
            "WHERE CAST(CONCAT('0x', substr(md5("
            "CAST(CAST(c_custkey AS BIGINT) AS VARCHAR)), 1, 2)) "
            "AS BIGINT) % 32 = 0), "
            "do2 AS (SELECT o_orderkey AS ok FROM orders "
            "WHERE o_custkey IN (SELECT ck FROM dc)), "
            "dl AS (SELECT count(*) AS n FROM lineitem "
            "WHERE l_orderkey IN (SELECT ok FROM do2)), "
            "tot AS (SELECT count(*) AS n FROM lineitem) "
            "SELECT CAST((SELECT count(*) FROM dc) AS BIGINT) "
            "AS n_cust_deleted, "
            "CAST((SELECT count(*) FROM do2) AS BIGINT) "
            "AS n_orders_cascaded, "
            "CAST((SELECT n FROM dl) AS BIGINT) "
            "AS n_lineitems_cascaded, "
            "CAST(1000000 * (SELECT n FROM dl) "
            "// greatest((SELECT n FROM tot), 1) AS BIGINT) "
            "AS lineitem_share_ppm"),
        "sort_layout_pruning_audit": (
            "WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k, "
            "epoch_us(o_orderdate) AS us, "
            "CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END "
            "AS m FROM orders), "
            "c AS (SELECT 'okey' AS layout, k // 512 AS ch, "
            "count(*) AS n, sum(m) AS mm FROM o GROUP BY 1, 2 "
            "UNION ALL SELECT 'date', us // 86400000000 // 8, "
            "count(*), sum(m) FROM o GROUP BY 1, 2) "
            "SELECT layout, CAST(count(*) AS BIGINT) AS n_chunks, "
            "CAST(sum(CASE WHEN mm > 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_touched, "
            "CAST(sum(CASE WHEN mm > 0 THEN n ELSE 0 END) AS BIGINT) "
            "AS rows_scanned, "
            "CAST(sum(mm) AS BIGINT) AS n_match FROM c "
            "GROUP BY 1 ORDER BY 1"),
        "rounding_policy_divergence_census": (
            "WITH f AS (SELECT l_returnflag AS flag, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* CAST(round(l_discount * 100) AS BIGINT) AS prod "
            "FROM lineitem) "
            "SELECT flag, CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(sum(CASE WHEN prod % 100 = 50 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_half_boundary, "
            "CAST(sum(CASE WHEN prod % 100 = 50 "
            "AND (prod // 100) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_divergent FROM f GROUP BY 1 ORDER BY 1"),
        "skiplist_level_census": (
            "WITH ks AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT) "
            "AS k FROM orders), "
            "h AS (SELECT CAST(CONCAT('0x', "
            "substr(md5(CAST(k AS VARCHAR)), 1, 12)) AS BIGINT) "
            "AS hv FROM ks), "
            "lv AS (SELECT CASE WHEN hv = 0 THEN 48 "
            "ELSE bit_count((hv & -hv) - 1) END AS level FROM h) "
            "SELECT CAST(level AS BIGINT) AS level, "
            "CAST(count(*) AS BIGINT) AS n_keys FROM lv "
            "GROUP BY 1 ORDER BY 1"),
        "bpe_first_merge_audit": (
            "WITH tk AS (SELECT tok, count(*) AS n FROM "
            "(SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1), "
            "bg AS (SELECT n, unnest([substr(tok, CAST(i AS INT), 2) "
            "FOR i IN range(1, length(tok))]) AS pr FROM tk "
            "WHERE length(tok) >= 2), "
            "pf AS (SELECT pr, sum(n) AS freq FROM bg GROUP BY 1), "
            "top AS (SELECT pr, freq FROM pf "
            "ORDER BY freq DESC, pr ASC LIMIT 1) "
            "SELECT (SELECT pr FROM top) AS pair, "
            "CAST((SELECT freq FROM top) AS BIGINT) AS freq, "
            "CAST(count(*) AS BIGINT) AS n_tokens_affected, "
            "CAST(sum(n) AS BIGINT) AS n_occurrences_affected "
            "FROM tk, top WHERE contains(tok, top.pr)"),
        "rice_parameter_selection": (
            "WITH tc AS (SELECT tok, count(*) AS n FROM "
            "(SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1), "
            "top AS (SELECT tok FROM tc "
            "ORDER BY n DESC, tok ASC LIMIT 64), "
            "pl AS (SELECT DISTINCT tok, doc_id FROM "
            "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "FROM documents) WHERE tok IN (SELECT tok FROM top)), "
            "g AS (SELECT tok, CASE WHEN lag(doc_id) OVER w IS NULL "
            "THEN doc_id + 1 ELSE doc_id - lag(doc_id) OVER w END "
            "AS gap FROM pl WINDOW w AS "
            "(PARTITION BY tok ORDER BY doc_id)), "
            "c AS (SELECT tok, r.i AS k, "
            "sum((gap >> CAST(r.i AS INT)) + 1 + r.i) AS bits "
            "FROM g, range(0, 8) r(i) GROUP BY 1, 2), "
            "b AS (SELECT tok, k, bits, row_number() OVER "
            "(PARTITION BY tok ORDER BY bits ASC, k ASC) AS rn "
            "FROM c) "
            "SELECT CAST(k AS BIGINT) AS best_k, "
            "CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(sum(bits) AS BIGINT) AS total_bits FROM b "
            "WHERE rn = 1 GROUP BY 1 ORDER BY 1"),
        "feistel_shuffle_audit": (
            "WITH ks AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT) "
            "& 4294967295 AS k FROM orders), "
            "s1 AS (SELECT k, (k & 65535) AS l1, "
            "xor(k >> 16, CAST(CONCAT('0x', substr(md5("
            "CAST(k & 65535 AS VARCHAR) || ':0'), 1, 4)) AS BIGINT)) "
            "AS r1 FROM ks), "
            "s2 AS (SELECT k, r1 AS l2, "
            "xor(l1, CAST(CONCAT('0x', substr(md5("
            "CAST(r1 AS VARCHAR) || ':1'), 1, 4)) AS BIGINT)) AS r2 "
            "FROM s1), "
            "o AS (SELECT k, (l2 << 16) | r2 AS ov FROM s2), "
            "d AS (SELECT CASE WHEN ov >= k THEN ov - k "
            "ELSE k - ov END AS dd FROM o), "
            "hist AS (SELECT CASE WHEN dd = 0 THEN 0 "
            "ELSE length(bin(dd)) END AS bl, count(*) AS n FROM d "
            "GROUP BY 1) "
            "SELECT CAST(bl AS BIGINT) AS disp_bits, "
            "CAST(n AS BIGINT) AS n_keys FROM hist "
            "UNION ALL SELECT -1, "
            "(SELECT count(DISTINCT ov) FROM o) ORDER BY 1"),
        "topk_overlap_curve": (
            "WITH tk AS (SELECT CAST(CONCAT('0x', substr(md5("
            "CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) % 2 AS h, "
            "unnest(string_split(text, ' ')) AS tok FROM documents), "
            "c AS (SELECT h, tok, count(*) AS n FROM tk "
            "GROUP BY 1, 2), "
            "r AS (SELECT h, tok, row_number() OVER (PARTITION BY h "
            "ORDER BY n DESC, tok ASC) AS rn FROM c), "
            "dg AS (SELECT r.i AS depth FROM range(1, 21) r(i)), "
            "j AS (SELECT a.tok, a.rn AS ra, b.rn AS rb FROM r a "
            "JOIN r b ON a.tok = b.tok AND a.h = 0 AND b.h = 1) "
            "SELECT CAST(depth AS BIGINT) AS depth, "
            "CAST(count(j.tok) AS BIGINT) AS n_overlap FROM dg "
            "LEFT JOIN j ON j.ra <= dg.depth AND j.rb <= dg.depth "
            "GROUP BY 1 ORDER BY 1"),
        "weighted_bottomk_sample": (
            "WITH s AS (SELECT o_custkey AS c, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS sp "
            "FROM orders GROUP BY 1), "
            "p AS (SELECT c, sp, CAST(CONCAT('0x', substr(md5("
            "CAST(CAST(c AS BIGINT) AS VARCHAR)), 1, 8)) AS BIGINT) "
            "* 1000000 // greatest(sp, 1) AS pr FROM s), "
            "r AS (SELECT c, sp, pr, row_number() OVER "
            "(ORDER BY pr ASC, c ASC) AS rk FROM p) "
            "SELECT CAST(rk AS BIGINT) AS rank, "
            "CAST(c AS BIGINT) AS c_custkey, "
            "CAST(sp AS BIGINT) AS spend_cents, "
            "CAST(pr AS BIGINT) AS priority FROM r WHERE rk <= 16 "
            "ORDER BY 1"),
        "natural_sort_run_census": (
            "WITH s AS (SELECT epoch_us(l_shipdate) AS v, "
            "row_number() OVER (ORDER BY l_orderkey, l_linenumber, "
            "l_shipdate) AS i FROM lineitem), "
            "b AS (SELECT v, lag(v) OVER (ORDER BY i) AS pv FROM s) "
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(sum(CASE WHEN pv IS NOT NULL AND pv > v THEN 1 "
            "ELSE 0 END) + CASE WHEN count(*) > 0 THEN 1 ELSE 0 END "
            "AS BIGINT) AS n_runs FROM b"),
        "art_node_type_census": (
            "WITH ks AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT) "
            "& 4294967295 AS k FROM orders), "
            "lv AS (SELECT unnest([0, 1, 2, 3]) AS l), "
            "pr AS (SELECT lv.l, k >> (8 * (4 - lv.l)) AS pfx, "
            "(k >> (8 * (3 - lv.l))) & 255 AS child FROM ks, lv), "
            "n AS (SELECT l, pfx, count(DISTINCT child) AS nc "
            "FROM pr GROUP BY 1, 2), "
            "t AS (SELECT l, CASE WHEN nc <= 4 THEN 4 "
            "WHEN nc <= 16 THEN 16 WHEN nc <= 48 THEN 48 "
            "ELSE 256 END AS nt FROM n) "
            "SELECT CAST(l AS BIGINT) AS level, "
            "CAST(nt AS BIGINT) AS node_type, "
            "CAST(count(*) AS BIGINT) AS n_nodes FROM t "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "per_group_uniform_pick_bias": (
            "WITH o AS (SELECT o_custkey AS c, o_orderkey AS k, "
            "o_orderpriority AS p, CAST(CONCAT('0x', substr(md5("
            "CAST(CAST(o_orderkey AS BIGINT) AS VARCHAR)), 1, 12)) "
            "AS BIGINT) AS h FROM orders), "
            "pk AS (SELECT c, p FROM (SELECT c, p, row_number() "
            "OVER (PARTITION BY c ORDER BY h, k) AS rn FROM o) "
            "WHERE rn = 1), "
            "a AS (SELECT p, count(*) AS na FROM o GROUP BY 1), "
            "b AS (SELECT p, count(*) AS npk FROM pk GROUP BY 1), "
            "t AS (SELECT (SELECT count(*) FROM o) AS ta, "
            "(SELECT count(*) FROM pk) AS tp) "
            "SELECT a.p AS priority, CAST(na AS BIGINT) AS n_all, "
            "CAST(COALESCE(npk, 0) AS BIGINT) AS n_picked, "
            "CAST(sign(CAST(COALESCE(npk, 0) AS HUGEINT) * ta "
            "- CAST(na AS HUGEINT) * tp) AS BIGINT) AS sgn, "
            "CAST(1000000 * abs(CAST(COALESCE(npk, 0) AS HUGEINT) "
            "* ta - CAST(na AS HUGEINT) * tp) "
            "// greatest(CAST(na AS HUGEINT) * tp, 1) AS BIGINT) "
            "AS err_ppm "
            "FROM a LEFT JOIN b ON b.p = a.p, t ORDER BY 1"),
        "list_intersection_cost_audit": (
            "WITH tc AS (SELECT tok, count(*) AS n FROM "
            "(SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1), "
            "t2 AS (SELECT tok, row_number() OVER "
            "(ORDER BY n DESC, tok ASC) AS rn FROM tc), "
            "ta AS (SELECT tok FROM t2 WHERE rn = 1), "
            "tb AS (SELECT tok FROM t2 WHERE rn = 2), "
            "pl AS (SELECT DISTINCT tok, doc_id AS d FROM "
            "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "FROM documents) WHERE tok IN (SELECT tok FROM ta "
            "UNION ALL SELECT tok FROM tb)), "
            "a AS (SELECT d FROM pl, ta WHERE pl.tok = ta.tok), "
            "b AS (SELECT d FROM pl, tb WHERE pl.tok = tb.tok), "
            "na AS (SELECT count(*) AS n FROM a), "
            "nb AS (SELECT count(*) AS n FROM b), "
            "sm AS (SELECT d FROM a, na, nb WHERE na.n < nb.n "
            "UNION ALL SELECT d FROM b, na, nb WHERE na.n >= nb.n), "
            "lg AS (SELECT d FROM b, na, nb WHERE na.n < nb.n "
            "UNION ALL SELECT d FROM a, na, nb WHERE na.n >= nb.n), "
            "pos AS (SELECT sm.d, (SELECT count(*) FROM lg "
            "WHERE lg.d < sm.d) AS p FROM sm), "
            "j AS (SELECT CASE WHEN lag(p) OVER (ORDER BY d) IS NULL "
            "THEN p + 1 ELSE p - lag(p) OVER (ORDER BY d) END "
            "AS jump FROM pos), "
            "cg AS (SELECT COALESCE(sum(2 * length(bin(jump + 1))), "
            "0) AS cost FROM j), "
            "nc AS (SELECT count(*) AS n FROM sm "
            "WHERE d IN (SELECT d FROM lg)) "
            "SELECT (SELECT tok FROM ta) AS token_a, "
            "(SELECT tok FROM tb) AS token_b, "
            "CAST((SELECT n FROM na) AS BIGINT) AS n_a, "
            "CAST((SELECT n FROM nb) AS BIGINT) AS n_b, "
            "CAST((SELECT n FROM nc) AS BIGINT) AS n_common, "
            "CAST((SELECT n FROM na) + (SELECT n FROM nb) AS BIGINT) "
            "AS cost_linear, "
            "CAST((SELECT cost FROM cg) AS BIGINT) AS cost_gallop"),
        "sparse_layout_planner": (
            "WITH du AS (SELECT DISTINCT user_id AS u, "
            "epoch_us(ts) // 86400000000 // 7 AS w FROM events), "
            "s AS (SELECT count(DISTINCT u) AS rows_, "
            "count(DISTINCT w) AS cols_, count(*) AS nnz FROM du), "
            "b AS (SELECT rows_, cols_, nnz, 12 * nnz AS coo, "
            "8 * nnz + 4 * (rows_ + 1) AS csr, "
            "rows_ * ((cols_ + 7) // 8) AS bmp FROM s) "
            "SELECT CAST(rows_ AS BIGINT) AS n_users, "
            "CAST(cols_ AS BIGINT) AS n_weeks, "
            "CAST(nnz AS BIGINT) AS nnz, "
            "CAST(coo AS BIGINT) AS bytes_coo, "
            "CAST(csr AS BIGINT) AS bytes_csr, "
            "CAST(bmp AS BIGINT) AS bytes_bitmap, "
            "CASE WHEN bmp <= coo AND bmp <= csr THEN 'bitmap' "
            "WHEN coo <= csr THEN 'coo' ELSE 'csr' END AS best "
            "FROM b"),
        "fd_strength_census": (
            "WITH p AS (SELECT 'brand->type' AS fd, p_brand AS lhs, "
            "p_type AS rhs FROM part "
            "UNION ALL SELECT 'brand->size', p_brand, "
            "CAST(p_size AS VARCHAR) FROM part "
            "UNION ALL SELECT 'size->brand', "
            "CAST(p_size AS VARCHAR), p_brand FROM part "
            "UNION ALL SELECT 'type->brand', p_type, p_brand "
            "FROM part), "
            "g AS (SELECT fd, lhs, count(DISTINCT rhs) AS d FROM p "
            "GROUP BY 1, 2) "
            "SELECT fd, CAST(count(*) AS BIGINT) AS n_lhs, "
            "CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_violating, "
            "CAST(sum(d - 1) AS BIGINT) AS n_extra FROM g "
            "GROUP BY 1 ORDER BY 1"),
        "ldiversity_audit": (
            "WITH c AS (SELECT c_nationkey AS nk, c_mktsegment "
            "AS seg, sign(CAST(round(c_acctbal * 100) AS BIGINT)) "
            "AS sg, count(*) AS n FROM customer GROUP BY 1, 2, 3), "
            "g AS (SELECT nk, seg, count(*) AS d, sum(n) AS nc "
            "FROM c GROUP BY 1, 2) "
            "SELECT CAST(d AS BIGINT) AS n_sensitive, "
            "CAST(count(*) AS BIGINT) AS n_groups, "
            "CAST(sum(nc) AS BIGINT) AS n_customers FROM g "
            "GROUP BY 1 ORDER BY 1"),
        "voptimal_2bucket_split": (
            "WITH h AS (SELECT CAST(round(l_quantity) AS BIGINT) "
            "AS v, count(*) AS n FROM lineitem GROUP BY 1), "
            "sp AS (SELECT unnest(generate_series("
            "(SELECT min(v) FROM h), (SELECT max(v) FROM h) - 1)) "
            "AS s), "
            "e AS (SELECT s, "
            "(SELECT COALESCE(sum(n), 0) FROM h WHERE v <= s) AS n1, "
            "(SELECT COALESCE(sum(n * v), 0) FROM h WHERE v <= s) "
            "AS s1, "
            "(SELECT COALESCE(sum(n * v * v), 0) FROM h "
            "WHERE v <= s) AS q1, "
            "(SELECT COALESCE(sum(n), 0) FROM h WHERE v > s) AS n2, "
            "(SELECT COALESCE(sum(n * v), 0) FROM h WHERE v > s) "
            "AS s2, "
            "(SELECT COALESCE(sum(n * v * v), 0) FROM h WHERE v > s) "
            "AS q2 FROM sp), "
            "er AS (SELECT s, n1, n2, "
            "(CASE WHEN n1 = 0 THEN 0 ELSE (CAST(n1 AS HUGEINT) * q1 "
            "- CAST(s1 AS HUGEINT) * s1) * 1000000 // n1 END) "
            "+ (CASE WHEN n2 = 0 THEN 0 ELSE (CAST(n2 AS HUGEINT) "
            "* q2 - CAST(s2 AS HUGEINT) * s2) * 1000000 // n2 END) "
            "AS err FROM e), "
            "b AS (SELECT s, err, n1, n2 FROM er "
            "ORDER BY err ASC, s ASC LIMIT 1) "
            "SELECT CAST(s AS BIGINT) AS split, "
            "CAST(err AS VARCHAR) AS err_scaled, "
            "CAST(n1 AS BIGINT) AS n_lo, CAST(n2 AS BIGINT) AS n_hi "
            "FROM b"),
        "mm1_backlog_audit": (
            "WITH a AS (SELECT CAST(date_trunc('day', ts) AS DATE) "
            "AS day, count(*) AS n FROM events GROUP BY 1), "
            "g AS (SELECT CAST(unnest(generate_series("
            "(SELECT min(day) FROM a), (SELECT max(day) FROM a), "
            "INTERVAL 1 DAY)) AS DATE) AS day), "
            "tot AS (SELECT (SELECT sum(n) FROM a) AS t, "
            "(SELECT count(*) FROM g) AS nd), "
            "cc AS (SELECT (t + nd - 1) // nd AS c FROM tot), "
            "s AS (SELECT g.day, COALESCE(a.n, 0) AS n, "
            "row_number() OVER (ORDER BY g.day) AS i FROM g "
            "LEFT JOIN a ON a.day = g.day), "
            "b AS (SELECT day, sum(n) OVER (ORDER BY i) "
            "- (SELECT c FROM cc) * i AS bt FROM s), "
            "qq AS (SELECT day, bt - least(0, min(bt) OVER "
            "(ORDER BY day ROWS UNBOUNDED PRECEDING)) AS q FROM b), "
            "pk AS (SELECT day, q FROM qq "
            "ORDER BY q DESC, day ASC LIMIT 1) "
            "SELECT CAST((SELECT c FROM cc) AS BIGINT) "
            "AS service_rate, "
            "CAST((SELECT q FROM pk) AS BIGINT) AS peak_backlog, "
            "CAST((SELECT day FROM pk) AS TIMESTAMP) AS peak_day, "
            "CAST((SELECT count(*) FROM qq WHERE q > 0) AS BIGINT) "
            "AS n_busy_days, "
            "CAST((SELECT count(*) FROM g) AS BIGINT) AS n_days"),
        "elias_fano_plan": (
            "WITH ks AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT) "
            "AS k FROM orders), "
            "st AS (SELECT count(*) AS n, max(k) + 1 AS u FROM ks), "
            "lp AS (SELECT n, u, CASE WHEN u // n >= 1 "
            "THEN length(bin(u // n)) - 1 ELSE 0 END AS l FROM st), "
            "bk AS (SELECT k >> (SELECT l FROM lp) AS b FROM ks), "
            "oc AS (SELECT count(*) AS ne, max(cnt) AS mx FROM "
            "(SELECT b, count(*) AS cnt FROM bk GROUP BY 1)) "
            "SELECT CAST(n AS BIGINT) AS n_keys, "
            "CAST(u AS BIGINT) AS universe, CAST(l AS BIGINT) AS l, "
            "CAST(n * l AS BIGINT) AS lower_bits, "
            "CAST(n + (u >> l) AS BIGINT) AS upper_bits, "
            "CAST((SELECT ne FROM oc) AS BIGINT) "
            "AS n_buckets_nonempty, "
            "CAST((SELECT mx FROM oc) AS BIGINT) AS max_bucket "
            "FROM lp"),
        "sharded_topk_recall": (
            "WITH s AS (SELECT o_custkey AS c, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS sp "
            "FROM orders GROUP BY 1), "
            "r AS (SELECT c, sp, CAST(CONCAT('0x', substr(md5("
            "CAST(CAST(c AS BIGINT) AS VARCHAR)), 1, 2)) AS BIGINT) "
            "% 16 AS sh FROM s), "
            "tr AS (SELECT c FROM r ORDER BY sp DESC, c ASC "
            "LIMIT 10), "
            "ps AS (SELECT c FROM (SELECT c, row_number() OVER "
            "(PARTITION BY sh ORDER BY sp DESC, c ASC) AS rn FROM r) "
            "WHERE rn <= 4), "
            "ms AS (SELECT count(*) AS n FROM tr "
            "WHERE c NOT IN (SELECT c FROM ps)) "
            "SELECT CAST(10 AS BIGINT) AS k, CAST(4 AS BIGINT) AS m, "
            "CAST(16 AS BIGINT) AS n_shards, "
            "CAST((SELECT count(*) FROM ps) AS BIGINT) AS n_union, "
            "CAST((SELECT n FROM ms) AS BIGINT) AS n_missed"),
        "rank_block_popcount_plan": (
            "WITH c AS (SELECT CAST(l_orderkey AS BIGINT) AS k, "
            "count(*) AS n FROM lineitem GROUP BY 1), "
            "uu AS (SELECT max(k) + 1 AS u FROM c), "
            "o AS (SELECT k FROM c WHERE n >= 2), "
            "bl AS (SELECT k // 64 AS b, count(*) AS pcnt FROM o "
            "GROUP BY 1), "
            "s AS (SELECT (SELECT u FROM uu) AS u, "
            "(SELECT count(*) FROM o) AS n1, "
            "(SELECT count(*) FROM bl) AS nbne, "
            "(SELECT COALESCE(max(pcnt), 0) FROM bl) AS mp) "
            "SELECT CAST(u AS BIGINT) AS universe_bits, "
            "CAST(n1 AS BIGINT) AS n_ones, "
            "CAST((u + 63) // 64 AS BIGINT) AS n_blocks, "
            "CAST((u + 63) // 64 - nbne AS BIGINT) AS n_empty_blocks, "
            "CAST(mp AS BIGINT) AS max_popcount, "
            "CAST(8 * ((u + 511) // 512) AS BIGINT) "
            "AS bytes_superblock, "
            "CAST(2 * ((u + 63) // 64) AS BIGINT) AS bytes_block "
            "FROM s"),
        "value_flatline_run_census": (
            "WITH e AS (SELECT event_type AS ty, "
            "CAST(round(value * 100) AS BIGINT) AS v, ts, event_id "
            "FROM events), "
            "w AS (SELECT ty, v, lag(v) OVER (PARTITION BY ty "
            "ORDER BY ts, event_id) AS pv FROM e) "
            "SELECT ty AS event_type, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CASE WHEN pv IS NULL OR pv != v THEN 1 "
            "ELSE 0 END) AS BIGINT) AS n_runs FROM w "
            "GROUP BY 1 ORDER BY 1"),
        "btree_bulkload_plan": (
            "WITH RECURSIVE c AS (SELECT CAST(l_orderkey AS BIGINT) "
            "AS k, count(*) AS n FROM lineitem GROUP BY 1), "
            "p AS (SELECT k, n, COALESCE(SUM(n) OVER (ORDER BY k "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS st FROM c), "
            "tot AS (SELECT COALESCE(SUM(n), 0) AS nr, count(*) "
            "AS nk FROM c), "
            "mixl AS (SELECT st // 64 AS leaf, count(*) AS cnt "
            "FROM p WHERE st % 64 <> 0 GROUP BY 1), "
            "mx AS (SELECT count(*) AS nm, COALESCE(MAX(cnt), 0) "
            "AS mc FROM mixl), "
            "lv(l, cnt) AS (SELECT 0, (SELECT (nr + 63) // 64 "
            "FROM tot) UNION ALL SELECT l + 1, (cnt + 63) // 64 "
            "FROM lv WHERE cnt > 1), "
            "hh AS (SELECT MAX(l) AS h, SUM(CASE WHEN l > 0 "
            "THEN cnt ELSE 0 END) AS ni FROM lv) "
            "SELECT CAST(nr AS BIGINT) AS n_rows, "
            "CAST(nk AS BIGINT) AS n_keys, "
            "CAST((nr + 63) // 64 AS BIGINT) AS n_leaves, "
            "CAST(nm AS BIGINT) AS n_mixed_leaves, "
            "CAST((nr + 63) // 64 - nm AS BIGINT) AS n_pure_leaves, "
            "CAST(CASE WHEN nr = 0 THEN 0 ELSE 1 + mc END "
            "AS BIGINT) AS max_keys_per_leaf, "
            "CAST(h AS BIGINT) AS height, "
            "CAST(COALESCE(ni, 0) AS BIGINT) AS n_internal "
            "FROM tot, mx, hh"),
        "external_sort_pass_plan": (
            "WITH RECURSIVE c AS (SELECT l_returnflag AS f, "
            "count(*) AS n FROM lineitem GROUP BY 1), "
            "r0 AS (SELECT f, n, (n + 4095) // 4096 AS runs "
            "FROM c), "
            "m(f, r, p) AS (SELECT f, runs, 0 FROM r0 UNION ALL "
            "SELECT f, (r + 7) // 8, p + 1 FROM m WHERE r > 1), "
            "mp AS (SELECT f, MAX(p) AS passes FROM m GROUP BY 1) "
            "SELECT r0.f AS l_returnflag, CAST(n AS BIGINT) "
            "AS n_rows, CAST(runs AS BIGINT) AS n_runs, "
            "CAST(passes AS BIGINT) AS n_passes, "
            "CAST(n * (passes + 1) AS BIGINT) AS io_rows "
            "FROM r0 JOIN mp ON r0.f = mp.f"),
        "multi_pattern_match_census": (
            "SELECT lang, p AS pattern, "
            "CAST(SUM((length(text) - length(replace(text, p, '')))"
            " // length(p)) AS BIGINT) AS n_occurrences, "
            "CAST(SUM(CASE WHEN length(text) <> "
            "length(replace(text, p, '')) THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_docs "
            "FROM documents CROSS JOIN (SELECT unnest(['the', "
            "'and', 'tion', 'ing']) AS p) pats GROUP BY 1, 2"),
        "secretary_rule_audit": (
            "WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') "
            "AS day, strftime(o_orderdate, '%Y-%m') AS mon, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v "
            "FROM orders GROUP BY 1, 2), "
            "r AS (SELECT mon, v, row_number() OVER (PARTITION BY "
            "mon ORDER BY md5(day)) AS rk FROM d), "
            "st AS (SELECT mon, count(*) AS n, count(*) // 3 AS k, "
            "MAX(v) AS mx FROM r GROUP BY 1), "
            "m1 AS (SELECT r.mon, COALESCE(MAX(CASE WHEN rk <= k "
            "THEN v END), -1) AS m1 FROM r JOIN st "
            "ON r.mon = st.mon GROUP BY 1), "
            "pk AS (SELECT r.mon, MIN(rk) AS pr FROM r "
            "JOIN st ON r.mon = st.mon "
            "JOIN m1 ON r.mon = m1.mon "
            "WHERE rk > st.k AND r.v > m1.m1 GROUP BY 1), "
            "fin AS (SELECT st.mon, st.n, st.k, st.mx, "
            "COALESCE(pk.pr, st.n) AS pr, "
            "CASE WHEN pk.pr IS NULL THEN 0 ELSE 1 END AS early "
            "FROM st LEFT JOIN pk ON st.mon = pk.mon) "
            "SELECT fin.mon AS month, CAST(n AS BIGINT) AS n_days, "
            "CAST(k AS BIGINT) AS k_observe, "
            "CAST(pr AS BIGINT) AS picked_rank, "
            "CAST(early AS BIGINT) AS early_pick, "
            "CAST(CASE WHEN r.v = fin.mx THEN 1 ELSE 0 END "
            "AS BIGINT) AS picked_is_max "
            "FROM fin JOIN r ON fin.mon = r.mon AND r.rk = fin.pr"),
        "join_order_dp_plan": (
            "WITH co AS (SELECT count(*) AS n FROM orders "
            "WHERE o_custkey IN (SELECT c_custkey FROM customer)), "
            "ol AS (SELECT count(*) AS n FROM lineitem "
            "WHERE l_orderkey IN (SELECT o_orderkey FROM orders)), "
            "lp AS (SELECT count(*) AS n FROM lineitem "
            "WHERE l_partkey IN (SELECT p_partkey FROM part)), "
            "col AS (SELECT count(*) AS n FROM lineitem "
            "WHERE l_orderkey IN (SELECT o_orderkey FROM orders "
            "WHERE o_custkey IN (SELECT c_custkey FROM customer))), "
            "olp AS (SELECT count(*) AS n FROM lineitem "
            "WHERE l_orderkey IN (SELECT o_orderkey FROM orders) "
            "AND l_partkey IN (SELECT p_partkey FROM part)), "
            "pl AS (SELECT 'CO_L_P' AS plan, "
            "(SELECT n FROM co) + (SELECT n FROM col) AS cost_rows "
            "UNION ALL SELECT 'LP_O_C', "
            "(SELECT n FROM lp) + (SELECT n FROM olp) "
            "UNION ALL SELECT 'OL_C_P', "
            "(SELECT n FROM ol) + (SELECT n FROM col) "
            "UNION ALL SELECT 'OL_P_C', "
            "(SELECT n FROM ol) + (SELECT n FROM olp)), "
            "bst AS (SELECT plan AS bp FROM pl "
            "ORDER BY cost_rows ASC, plan ASC LIMIT 1) "
            "SELECT plan, CAST(cost_rows AS BIGINT) AS cost_rows, "
            "CAST(CASE WHEN plan = (SELECT bp FROM bst) THEN 1 "
            "ELSE 0 END AS BIGINT) AS is_best FROM pl"),
        "linear_counting_audit": (
            "WITH p AS (SELECT DISTINCT strftime(ts, '%Y-%m') "
            "AS mon, user_id AS u FROM events), "
            "b AS (SELECT mon, u, CAST(CONCAT('0x', "
            "substr(md5(CAST(u AS VARCHAR)), 1, 2)) AS BIGINT) "
            "% 256 AS bk FROM p) "
            "SELECT mon AS month, "
            "CAST(count(*) AS BIGINT) AS n_distinct_users, "
            "CAST(count(DISTINCT bk) AS BIGINT) AS n_occupied, "
            "CAST(256 - count(DISTINCT bk) AS BIGINT) AS n_empty, "
            "CAST(count(*) - count(DISTINCT bk) AS BIGINT) "
            "AS n_collisions FROM b GROUP BY 1"),
        "countsketch_sign_estimates": (
            "WITH tok AS (SELECT unnest(string_split(text, ' ')) "
            "AS t FROM documents), "
            "tc AS (SELECT t, count(*) AS c FROM tok GROUP BY 1), "
            "h AS (SELECT r, t, c, CAST(CONCAT('0x', substr(md5("
            "CONCAT(CAST(r AS VARCHAR), ':', t)), 1, 2)) AS BIGINT) "
            "% 16 AS b, CAST(CONCAT('0x', substr(md5(CONCAT("
            "CAST(r AS VARCHAR), ':', t)), 3, 1)) AS BIGINT) "
            "% 2 * 2 - 1 AS s "
            "FROM tc CROSS JOIN (SELECT unnest([0, 1, 2]) AS r)), "
            "sk AS (SELECT r, b, SUM(s * c) AS v FROM h "
            "GROUP BY 1, 2), "
            "top5 AS (SELECT t, c FROM tc "
            "ORDER BY c DESC, t ASC LIMIT 5), "
            "est AS (SELECT top5.t, top5.c, h.s * sk.v AS e "
            "FROM top5 JOIN h ON h.t = top5.t "
            "JOIN sk ON sk.r = h.r AND sk.b = h.b) "
            "SELECT t AS token, CAST(c AS BIGINT) AS true_count, "
            "CAST(SUM(e) - MAX(e) - MIN(e) AS BIGINT) "
            "AS est_median FROM est GROUP BY 1, 2"),
        "dhondt_seat_allocation": (
            "WITH v AS (SELECT c_nationkey AS nk, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY 1), "
            "q AS (SELECT nk, k, (v * 1000000) // k AS q FROM v "
            "CROSS JOIN generate_series(1, 64) t(k)), "
            "r AS (SELECT nk, k, q, row_number() OVER (ORDER BY "
            "q DESC, nk ASC, k ASC) AS rnk FROM q), "
            "dd AS (SELECT nk, count(*) AS sd FROM r "
            "WHERE rnk <= 64 GROUP BY 1), "
            "tot AS (SELECT SUM(v) AS tv FROM v), "
            "fl AS (SELECT nk, v, (v * 64) // tv AS fs, "
            "(v * 64) % tv AS rem FROM v, tot), "
            "lo AS (SELECT 64 - SUM(fs) AS extra FROM fl), "
            "rr AS (SELECT nk, fs, row_number() OVER (ORDER BY "
            "rem DESC, nk ASC) AS rrk FROM fl), "
            "lr AS (SELECT nk, fs + CASE WHEN rrk <= "
            "(SELECT extra FROM lo) THEN 1 ELSE 0 END AS sl "
            "FROM rr) "
            "SELECT n_name, "
            "CAST(COALESCE(dd.sd, 0) AS BIGINT) AS seats_dhondt, "
            "CAST(lr.sl AS BIGINT) AS seats_lr, "
            "CAST(COALESCE(dd.sd, 0) - lr.sl AS BIGINT) "
            "AS seats_diff "
            "FROM lr JOIN nation ON lr.nk = n_nationkey "
            "LEFT JOIN dd ON lr.nk = dd.nk"),
        "int32_overflow_day_census": (
            "WITH d AS (SELECT l_returnflag AS f, "
            "strftime(l_shipdate, '%Y-%m-%d') AS day, "
            "SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS v "
            "FROM lineitem GROUP BY 1, 2), "
            "c AS (SELECT f, day, SUM(v) OVER (PARTITION BY f "
            "ORDER BY day) AS cs FROM d), "
            "fo AS (SELECT f, MIN(day) AS fd FROM c "
            "WHERE cs > 2147483647 GROUP BY 1), "
            "t AS (SELECT f, SUM(v) AS tot FROM d GROUP BY 1) "
            "SELECT t.f AS l_returnflag, "
            "COALESCE(fo.fd, '') AS first_overflow_day, "
            "CAST(tot // 2147483648 AS BIGINT) AS n_wraps, "
            "CAST(tot AS BIGINT) AS total_cents "
            "FROM t LEFT JOIN fo ON t.f = fo.f"),
        "kgram_index_size_planner": (
            "WITH dt AS (SELECT DISTINCT tok FROM (SELECT "
            "unnest(string_split(text, ' ')) AS tok "
            "FROM documents)), "
            "ix AS (SELECT tok, unnest(range(1, "
            "greatest(length(tok) - 1, 1))) AS i FROM dt), "
            "g AS (SELECT DISTINCT tok, substr(tok, i, 3) AS g "
            "FROM ix), "
            "p AS (SELECT g, count(*) AS n FROM g GROUP BY 1) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM dt) "
            "AS n_tokens, "
            "CAST(count(*) AS BIGINT) AS n_distinct_grams, "
            "CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_postings, "
            "CAST(COALESCE(MAX(n), 0) AS BIGINT) "
            "AS max_posting_len FROM p"),
        "doc_minimizer_density": (
            "WITH d AS (SELECT doc_id, text FROM documents "
            "WHERE doc_id % 4 = 0), "
            "ix AS (SELECT doc_id, text, unnest(range(1, "
            "greatest(length(text) - 2, 1))) AS i FROM d), "
            "pos AS (SELECT doc_id, i, md5(substr(text, i, 4)) || "
            "lpad(CAST(i AS VARCHAR), 10, '0') AS key, "
            "length(text) - 3 AS g FROM ix), "
            "w AS (SELECT doc_id, g, i, MIN(key) OVER (PARTITION "
            "BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND "
            "7 FOLLOWING) AS mk FROM pos), "
            "st AS (SELECT doc_id, g, mk FROM w "
            "WHERE i <= greatest(g - 7, 1)), "
            "agg AS (SELECT doc_id, MAX(g) AS nk, count(*) AS nw, "
            "count(DISTINCT mk) AS nm FROM st GROUP BY 1) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(agg.nk, 0) AS BIGINT) AS n_kgrams, "
            "CAST(COALESCE(agg.nw, 0) AS BIGINT) AS n_windows, "
            "CAST(COALESCE(agg.nm, 0) AS BIGINT) AS n_minimizers "
            "FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id"),
        "hashagg_spill_planner": (
            "WITH s AS (SELECT 'returnflag' AS grouping_name, "
            "1 AS n_keys, (SELECT count(DISTINCT l_returnflag) "
            "FROM lineitem) AS n_groups "
            "UNION ALL SELECT 'returnflag_linestatus', 2, "
            "(SELECT count(*) FROM (SELECT DISTINCT l_returnflag, "
            "l_linestatus FROM lineitem)) "
            "UNION ALL SELECT 'partkey', 1, "
            "(SELECT count(DISTINCT l_partkey) FROM lineitem) "
            "UNION ALL SELECT 'orderkey', 1, "
            "(SELECT count(DISTINCT l_orderkey) FROM lineitem)) "
            "SELECT grouping_name, CAST(n_keys AS BIGINT) "
            "AS n_keys, CAST(n_groups AS BIGINT) AS n_groups, "
            "CAST(n_groups * (64 + 8 * n_keys + 16) AS BIGINT) "
            "AS est_bytes, "
            "CAST(CASE WHEN n_groups * (64 + 8 * n_keys + 16) "
            "<= 1048576 THEN 1 ELSE 0 END AS BIGINT) "
            "AS fits_budget, "
            "CAST(CASE WHEN n_groups * (64 + 8 * n_keys + 16) "
            "<= 1048576 THEN 1 ELSE (n_groups * (64 + 8 * n_keys "
            "+ 16) + 1048575) // 1048576 END AS BIGINT) "
            "AS n_spill_partitions FROM s"),
        "condorcet_nation_audit": (
            "WITH v AS (SELECT n_nationkey AS nk, n_name, "
            "COALESCE(r.v, 0) AS rev, COALESCE(r.n, 0) AS nord, "
            "COALESCE(cc.n, 0) AS ncust FROM nation "
            "LEFT JOIN (SELECT c_nationkey AS nk2, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v, "
            "count(*) AS n FROM orders JOIN customer "
            "ON o_custkey = c_custkey GROUP BY 1) r "
            "ON n_nationkey = r.nk2 "
            "LEFT JOIN (SELECT c_nationkey AS nk3, count(*) AS n "
            "FROM customer GROUP BY 1) cc "
            "ON n_nationkey = cc.nk3), "
            "rk AS (SELECT nk, n_name, "
            "row_number() OVER (ORDER BY rev DESC, nk ASC) AS r1, "
            "row_number() OVER (ORDER BY nord DESC, nk ASC) AS r2, "
            "row_number() OVER (ORDER BY ncust DESC, nk ASC) AS r3 "
            "FROM v), "
            "w AS (SELECT a.nk, a.n_name, SUM(CASE WHEN "
            "(CASE WHEN a.r1 < b.r1 THEN 1 ELSE 0 END + "
            "CASE WHEN a.r2 < b.r2 THEN 1 ELSE 0 END + "
            "CASE WHEN a.r3 < b.r3 THEN 1 ELSE 0 END) >= 2 "
            "THEN 1 ELSE 0 END) AS wins, count(*) AS np "
            "FROM rk a JOIN rk b ON a.nk <> b.nk GROUP BY 1, 2) "
            "SELECT n_name, CAST(wins AS BIGINT) AS n_wins, "
            "CAST(CASE WHEN wins = np THEN 1 ELSE 0 END AS BIGINT) "
            "AS is_condorcet FROM w"),
        "for_encoding_chunk_plan": (
            "WITH c AS (SELECT l_orderkey // 4096 AS ch, "
            "MIN(l_partkey) AS mn, MAX(l_partkey) AS mx, "
            "count(*) AS n FROM lineitem GROUP BY 1), "
            "wdt AS (SELECT CASE WHEN mx = mn THEN 0 ELSE "
            "length(bin(mx - mn)) END AS wb, n, "
            "8 + (n * (CASE WHEN mx = mn THEN 0 ELSE "
            "length(bin(mx - mn)) END) + 7) // 8 AS byt FROM c) "
            "SELECT CAST(wb AS BIGINT) AS width_bits, "
            "CAST(count(*) AS BIGINT) AS n_chunks, "
            "CAST(SUM(n) AS BIGINT) AS n_rows, "
            "CAST(SUM(byt) AS BIGINT) AS total_bytes "
            "FROM wdt GROUP BY 1"),
        "vocab_tiering_plan": (
            "WITH tc AS (SELECT t, count(*) AS c FROM (SELECT "
            "unnest(string_split(text, ' ')) AS t FROM documents) "
            "GROUP BY 1), "
            "rk AS (SELECT t, c, row_number() OVER (ORDER BY "
            "c DESC, t ASC) AS rn FROM tc), "
            "tr AS (SELECT CASE WHEN rn <= 64 THEN 'head' "
            "WHEN c >= 2 THEN 'body' ELSE 'tail' END AS tier, c, "
            "CASE WHEN rn <= 64 THEN c WHEN c >= 2 THEN 2 * c "
            "ELSE length(t) + 1 END AS byt FROM rk), "
            "agg AS (SELECT tier, count(*) AS nt, SUM(c) AS occ, "
            "SUM(byt) AS cb FROM tr GROUP BY 1) "
            "SELECT tl.tier, "
            "CAST(COALESCE(nt, 0) AS BIGINT) AS n_tokens, "
            "CAST(COALESCE(occ, 0) AS BIGINT) AS n_occurrences, "
            "CAST(COALESCE(cb, 0) AS BIGINT) AS code_bytes "
            "FROM (SELECT unnest(['head', 'body', 'tail']) AS tier)"
            " tl LEFT JOIN agg ON tl.tier = agg.tier"),
        "lsm_compaction_plan": (
            "WITH RECURSIVE cnt AS (SELECT event_type AS ty, "
            "count(*) AS n FROM events GROUP BY 1), "
            "m(ty, cap, l) AS (SELECT ty, 4096, 0 FROM cnt "
            "UNION ALL SELECT m.ty, m.cap * 8, m.l + 1 FROM m "
            "JOIN cnt ON m.ty = cnt.ty WHERE m.cap < cnt.n), "
            "lv AS (SELECT ty, MAX(l) AS levels FROM m GROUP BY 1) "
            "SELECT cnt.ty AS event_type, CAST(n AS BIGINT) "
            "AS n_rows, CAST((n + 4095) // 4096 AS BIGINT) "
            "AS n_flushes, CAST(levels AS BIGINT) AS n_levels, "
            "CAST(n * (levels + 1) AS BIGINT) AS write_rows "
            "FROM cnt JOIN lv ON cnt.ty = lv.ty"),
        "jl_projection_distortion_census": (
            "WITH e AS (SELECT vec_id, embedding AS v "
            "FROM embeddings), "
            "q AS (SELECT vec_id, [CAST(round(CAST(v[i] AS DOUBLE) "
            "* 1000) AS BIGINT) FOR i IN range(1, len(v) + 1)] "
            "AS qv FROM e), "
            "p AS (SELECT a.vec_id, a.qv AS va, b.qv AS vb "
            "FROM q a JOIN q b ON b.vec_id = a.vec_id + 1), "
            "df AS (SELECT vec_id, [va[i] - vb[i] FOR i IN "
            "range(1, len(va) + 1)] AS dv FROM p), "
            "pr AS (SELECT vec_id, list_sum([dv[i] * dv[i] FOR i "
            "IN range(1, len(dv) + 1)]) AS d2o, "
            "list_sum([(CASE WHEN CAST(CONCAT('0x', substr(md5("
            "CONCAT(CAST(i AS VARCHAR), ':1')), 1, 1)) AS BIGINT) "
            "% 2 = 0 THEN 1 ELSE -1 END) * dv[i] FOR i IN "
            "range(1, len(dv) + 1)]) AS y1, "
            "list_sum([(CASE WHEN CAST(CONCAT('0x', substr(md5("
            "CONCAT(CAST(i AS VARCHAR), ':2')), 1, 1)) AS BIGINT) "
            "% 2 = 0 THEN 1 ELSE -1 END) * dv[i] FOR i IN "
            "range(1, len(dv) + 1)]) AS y2, "
            "list_sum([(CASE WHEN CAST(CONCAT('0x', substr(md5("
            "CONCAT(CAST(i AS VARCHAR), ':3')), 1, 1)) AS BIGINT) "
            "% 2 = 0 THEN 1 ELSE -1 END) * dv[i] FOR i IN "
            "range(1, len(dv) + 1)]) AS y3, "
            "list_sum([(CASE WHEN CAST(CONCAT('0x', substr(md5("
            "CONCAT(CAST(i AS VARCHAR), ':4')), 1, 1)) AS BIGINT) "
            "% 2 = 0 THEN 1 ELSE -1 END) * dv[i] FOR i IN "
            "range(1, len(dv) + 1)]) AS y4 FROM df), "
            "er AS (SELECT vec_id, y1 * y1 + y2 * y2 + y3 * y3 "
            "+ y4 * y4 - 4 * d2o AS e FROM pr) "
            "SELECT CAST(sign(e) AS BIGINT) AS sgn, "
            "CAST(CASE WHEN e = 0 THEN 0 ELSE "
            "length(bin(abs(e))) END AS BIGINT) AS mag, "
            "CAST(count(*) AS BIGINT) AS n_pairs FROM er "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "luhn_checksum_census": (
            "WITH ks AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT)"
            " AS k FROM orders), "
            "ix AS (SELECT k, unnest(range(0, 10)) AS p FROM ks), "
            "d AS (SELECT k, p, (k // ([1, 10, 100, 1000, 10000, "
            "100000, 1000000, 10000000, 100000000, 1000000000])"
            "[p + 1]) % 10 AS dg FROM ix), "
            "t AS (SELECT k, SUM(CASE WHEN p % 2 = 0 THEN "
            "CASE WHEN 2 * dg > 9 THEN 2 * dg - 9 ELSE 2 * dg END "
            "ELSE dg END) AS s FROM d GROUP BY 1) "
            "SELECT CAST((10 - s % 10) % 10 AS BIGINT) "
            "AS check_digit, CAST(count(*) AS BIGINT) AS n_keys "
            "FROM t GROUP BY 1"),
        "zipf_mandelbrot_shift_fit": (
            "WITH tc AS (SELECT t, count(*) AS c FROM (SELECT "
            "unnest(string_split(text, ' ')) AS t FROM documents) "
            "GROUP BY 1), "
            "rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, "
            "t ASC) AS r FROM tc), "
            "tt AS (SELECT * FROM rk WHERE r <= 64), "
            "pr AS (SELECT a.c AS ca, b.c AS cb, a.r AS r "
            "FROM tt a JOIN tt b ON b.r = a.r + 1), "
            "bl AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7, 8]) "
            "AS b), "
            "bs AS (SELECT bl.b, COALESCE(SUM(abs(ca * (r + bl.b) "
            "- cb * (r + 1 + bl.b))), 0) AS err FROM bl "
            "LEFT JOIN pr ON TRUE GROUP BY 1), "
            "mn AS (SELECT b AS bb FROM bs "
            "ORDER BY err ASC, b ASC LIMIT 1) "
            "SELECT CAST(b AS BIGINT) AS b, "
            "CAST(err AS BIGINT) AS total_error, "
            "CAST(CASE WHEN b = (SELECT bb FROM mn) THEN 1 ELSE 0 "
            "END AS BIGINT) AS is_best FROM bs"),
        "dominant_type_run_census": (
            "WITH dc AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
            "event_type AS ty, count(*) AS n FROM events "
            "GROUP BY 1, 2), "
            "dm AS (SELECT day, ty FROM (SELECT day, ty, "
            "row_number() OVER (PARTITION BY day ORDER BY n DESC, "
            "ty ASC) AS rn FROM dc) WHERE rn = 1), "
            "sq AS (SELECT day, ty, CASE WHEN lag(ty) OVER "
            "(ORDER BY day) IS DISTINCT FROM ty THEN 1 ELSE 0 END "
            "AS brk FROM dm), "
            "rr AS (SELECT day, ty, SUM(brk) OVER (ORDER BY day) "
            "AS rid FROM sq), "
            "runs AS (SELECT ty, rid, count(*) AS ln FROM rr "
            "GROUP BY 1, 2) "
            "SELECT ty AS event_type, "
            "CAST(SUM(ln) AS BIGINT) AS n_days_dominant, "
            "CAST(count(*) AS BIGINT) AS n_runs, "
            "CAST(MAX(ln) AS BIGINT) AS longest_run FROM runs "
            "GROUP BY 1"),
        "kleinberg_burst_dp_audit": (
            "WITH RECURSIVE dc AS (SELECT strftime(ts, '%Y-%m-%d') "
            "AS day, count(*) AS n FROM events GROUP BY 1), "
            "sq AS (SELECT n, row_number() OVER (ORDER BY day) "
            "AS idx FROM dc), "
            "tot AS (SELECT count(*) AS nd FROM sq), "
            "md AS (SELECT n AS mu0 FROM (SELECT n, row_number() "
            "OVER (ORDER BY n) AS r FROM sq) "
            "WHERE r = (SELECT (nd + 1) // 2 FROM tot)), "
            "dp(idx, c0, c1, p0, p1) AS ("
            "SELECT 1, abs(sq.n - md.mu0), abs(sq.n - 2 * md.mu0), "
            "'0', '1' FROM sq, md WHERE sq.idx = 1 "
            "UNION ALL SELECT dp.idx + 1, "
            "abs(sq.n - md.mu0) + LEAST(dp.c0, dp.c1 + 100), "
            "abs(sq.n - 2 * md.mu0) + LEAST(dp.c1, dp.c0 + 100), "
            "(CASE WHEN dp.c0 <= dp.c1 + 100 THEN dp.p0 "
            "ELSE dp.p1 END) || '0', "
            "(CASE WHEN dp.c1 <= dp.c0 + 100 THEN dp.p1 "
            "ELSE dp.p0 END) || '1' "
            "FROM dp, sq, md WHERE sq.idx = dp.idx + 1), "
            "fin AS (SELECT CASE WHEN c0 <= c1 THEN c0 ELSE c1 END "
            "AS cost, CASE WHEN c0 <= c1 THEN p0 ELSE p1 END "
            "AS path FROM dp WHERE idx = (SELECT nd FROM tot)), "
            "sw AS (SELECT COALESCE(SUM(d), 0) AS s FROM (SELECT "
            "CASE WHEN substr(path, i, 1) <> substr(path, i + 1, 1)"
            " THEN 1 ELSE 0 END AS d FROM (SELECT path, "
            "unnest(range(1, greatest(length(path), 1))) AS i "
            "FROM fin))) "
            "SELECT (SELECT CAST(nd AS BIGINT) FROM tot) "
            "AS n_days, CAST(cost AS BIGINT) AS final_cost, "
            "CAST(length(path) - length(replace(path, '1', '')) "
            "AS BIGINT) AS n_burst_days, "
            "CAST((SELECT s FROM sw) AS BIGINT) AS n_switches "
            "FROM fin"),
        "uuidv7_id_plan_audit": (
            "WITH i AS (SELECT epoch_ms(ts) * 65536 + "
            "CAST(CONCAT('0x', substr(md5(CAST(event_id "
            "AS VARCHAR)), 1, 4)) AS BIGINT) AS id FROM events), "
            "c AS (SELECT id, count(*) AS n FROM i GROUP BY 1) "
            "SELECT CAST(SUM(n) AS BIGINT) AS n_events, "
            "CAST(count(*) AS BIGINT) AS n_distinct_ids, "
            "CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_colliding_ids, "
            "CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) "
            "AS BIGINT) AS n_collision_events FROM c"),
        "pinball_loss_decile_audit": (
            "WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') "
            "AS day, SUM(CAST(round(o_totalprice * 100) AS BIGINT))"
            " AS v FROM orders GROUP BY 1), "
            "srt AS (SELECT v, row_number() OVER (ORDER BY v) "
            "AS rn FROM d), "
            "tot AS (SELECT count(*) AS n FROM d), "
            "cand AS (SELECT kk.k, s.v AS q FROM (SELECT "
            "unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS k) kk, tot, "
            "srt s WHERE s.rn = ((tot.n - 1) * kk.k) // 10 + 1), "
            "loss AS (SELECT c.k, c.q, SUM(GREATEST(9 * (d.v - "
            "c.q), c.q - d.v)) AS l FROM cand c, d GROUP BY 1, 2), "
            "mn AS (SELECT k AS bk FROM loss "
            "ORDER BY l ASC, k ASC LIMIT 1) "
            "SELECT CAST(k AS BIGINT) AS k, "
            "CAST(q AS BIGINT) AS candidate_cents, "
            "CAST(l AS BIGINT) AS loss_x10, "
            "CAST(CASE WHEN k = (SELECT bk FROM mn) THEN 1 ELSE 0 "
            "END AS BIGINT) AS is_min FROM loss"),
        "zstd_dict_sample_coverage": (
            "WITH ix AS (SELECT doc_id, text, unnest(range(1, "
            "greatest(length(text) - 6, 1))) AS i FROM documents), "
            "ag AS (SELECT doc_id, substr(text, i, 8) AS g "
            "FROM ix), "
            "sg AS (SELECT DISTINCT g FROM ag WHERE CAST(CONCAT("
            "'0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) "
            "AS BIGINT) % 8 = 0), "
            "stats AS (SELECT count(*) AS t, SUM(CASE WHEN g IN "
            "(SELECT g FROM sg) THEN 1 ELSE 0 END) AS c FROM ag), "
            "docs AS (SELECT count(*) AS nd, SUM(CASE WHEN "
            "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR))"
            ", 1, 2)) AS BIGINT) % 8 = 0 THEN 1 ELSE 0 END) AS ns "
            "FROM documents) "
            "SELECT CAST(nd AS BIGINT) AS n_docs, "
            "CAST(ns AS BIGINT) AS n_sample_docs, "
            "CAST((SELECT count(*) FROM sg) AS BIGINT) "
            "AS n_sample_grams, "
            "CAST(t AS BIGINT) AS total_gram_occurrences, "
            "CAST(c * 1000000 // t AS BIGINT) AS covered_ppm "
            "FROM stats, docs"),
        "graycode_hamming_census": (
            "WITH ks AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT)"
            " AS k FROM orders), "
            "p AS (SELECT k, lag(k) OVER (ORDER BY k) AS pk "
            "FROM ks), "
            "pp AS (SELECT k, pk FROM p WHERE pk IS NOT NULL), "
            "hb AS (SELECT bit_count(xor(k, pk)) AS h FROM pp), "
            "hg AS (SELECT bit_count(xor(xor(k, k >> 1), "
            "xor(pk, pk >> 1))) AS h FROM pp) "
            "SELECT 'binary' AS encoding, CAST(h AS BIGINT) "
            "AS hamming, CAST(count(*) AS BIGINT) AS n_pairs "
            "FROM hb GROUP BY 2 "
            "UNION ALL SELECT 'gray', CAST(h AS BIGINT), "
            "CAST(count(*) AS BIGINT) FROM hg GROUP BY 2"),
        "predicate_order_cost_audit": (
            "WITH c AS (SELECT count(*) AS n, "
            "SUM(CASE WHEN CAST(round(l_quantity) AS BIGINT) >= 25 "
            "THEN 1 ELSE 0 END) AS na, "
            "SUM(CASE WHEN CAST(round(l_discount * 100) AS BIGINT) "
            ">= 5 THEN 1 ELSE 0 END) AS nb, "
            "SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
            "AS nc, "
            "SUM(CASE WHEN CAST(round(l_quantity) AS BIGINT) >= 25 "
            "AND CAST(round(l_discount * 100) AS BIGINT) >= 5 "
            "THEN 1 ELSE 0 END) AS nab, "
            "SUM(CASE WHEN CAST(round(l_quantity) AS BIGINT) >= 25 "
            "AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS nac, "
            "SUM(CASE WHEN CAST(round(l_discount * 100) AS BIGINT) "
            ">= 5 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS nbc "
            "FROM lineitem), "
            "o AS (SELECT 'ABC' AS eval_order, n + na + nab "
            "AS cost FROM c "
            "UNION ALL SELECT 'ACB', n + na + nac FROM c "
            "UNION ALL SELECT 'BAC', n + nb + nab FROM c "
            "UNION ALL SELECT 'BCA', n + nb + nbc FROM c "
            "UNION ALL SELECT 'CAB', n + nc + nac FROM c "
            "UNION ALL SELECT 'CBA', n + nc + nbc FROM c), "
            "b AS (SELECT eval_order AS bo FROM o "
            "ORDER BY cost ASC, eval_order ASC LIMIT 1) "
            "SELECT eval_order, CAST(cost AS BIGINT) "
            "AS cost_evals, CAST(CASE WHEN eval_order = "
            "(SELECT bo FROM b) THEN 1 ELSE 0 END AS BIGINT) "
            "AS is_best FROM o"),
        "reorder_point_stockout_census": (
            "WITH RECURSIVE dd AS (SELECT CAST(o_orderdate AS DATE)"
            " AS day, count(*) AS n FROM orders GROUP BY 1), "
            "bounds AS (SELECT min(day) AS mn, max(day) AS mx "
            "FROM dd), "
            "grid AS (SELECT unnest(generate_series(mn, mx, "
            "INTERVAL 1 DAY)) AS day FROM bounds), "
            "g2 AS (SELECT COALESCE(dd.n, 0) AS n, row_number() "
            "OVER (ORDER BY CAST(g.day AS DATE)) AS idx FROM grid g"
            " LEFT JOIN dd ON CAST(g.day AS DATE) = dd.day), "
            "tot AS (SELECT count(*) AS nd FROM g2), "
            "md AS (SELECT n AS mu FROM (SELECT n, row_number() "
            "OVER (ORDER BY n) AS r FROM g2) "
            "WHERE r = (SELECT (nd + 1) // 2 FROM tot)), "
            "sim(idx, inv, st, ro) AS ("
            "SELECT 0, 3 * mu, 0, 0 FROM md "
            "UNION ALL SELECT g2.idx, "
            "CASE WHEN (CASE WHEN sim.inv < g2.n THEN 0 "
            "ELSE sim.inv - g2.n END) <= md.mu THEN 3 * md.mu "
            "ELSE (CASE WHEN sim.inv < g2.n THEN 0 "
            "ELSE sim.inv - g2.n END) END, "
            "sim.st + CASE WHEN sim.inv < g2.n THEN 1 ELSE 0 END, "
            "sim.ro + CASE WHEN (CASE WHEN sim.inv < g2.n THEN 0 "
            "ELSE sim.inv - g2.n END) <= md.mu THEN 1 ELSE 0 END "
            "FROM sim, g2, md WHERE g2.idx = sim.idx + 1) "
            "SELECT (SELECT CAST(nd AS BIGINT) FROM tot) "
            "AS n_days, (SELECT CAST(mu AS BIGINT) FROM md) AS mu, "
            "(SELECT CAST(mu AS BIGINT) FROM md) AS s_small, "
            "(SELECT CAST(3 * mu AS BIGINT) FROM md) AS s_big, "
            "CAST(st AS BIGINT) AS n_stockouts, "
            "CAST(ro AS BIGINT) AS n_reorders, "
            "CAST(inv AS BIGINT) AS final_inventory "
            "FROM sim WHERE idx = (SELECT nd FROM tot)"),
        "md5_permutation_test": (
            "WITH f AS (SELECT CAST(round(l_quantity) AS BIGINT) "
            "AS q, l_returnflag AS fl, md5(CONCAT(CAST(l_orderkey "
            "AS BIGINT), ':', l_linenumber)) AS h FROM lineitem "
            "WHERE l_returnflag IN ('R', 'N')), "
            "base AS (SELECT SUM(CASE WHEN fl = 'R' THEN q ELSE 0 "
            "END) AS sr, SUM(CASE WHEN fl = 'R' THEN 1 ELSE 0 END) "
            "AS nr, SUM(CASE WHEN fl = 'N' THEN q ELSE 0 END) "
            "AS sn, SUM(CASE WHEN fl = 'N' THEN 1 ELSE 0 END) "
            "AS nn FROM f), "
            "pp AS (SELECT p, SUM(CASE WHEN CAST(CONCAT('0x', "
            "substr(h, p + 1, 1)) AS BIGINT) % 2 = 0 THEN q ELSE 0 "
            "END) AS sa, SUM(CASE WHEN CAST(CONCAT('0x', substr(h,"
            " p + 1, 1)) AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END) "
            "AS na, SUM(q) AS st, count(*) AS nt FROM f CROSS JOIN "
            "(SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS p) "
            "GROUP BY 1), "
            "ob AS (SELECT abs(sr * nn - sn * nr) AS obs "
            "FROM base), "
            "ge AS (SELECT SUM(CASE WHEN abs(sa * (nt - na) - "
            "(st - sa) * na) >= (SELECT obs FROM ob) THEN 1 ELSE 0 "
            "END) AS n_ge FROM pp) "
            "SELECT (SELECT CAST(obs AS BIGINT) FROM ob) "
            "AS obs_stat, CAST(8 AS BIGINT) AS n_perms, "
            "(SELECT CAST(n_ge AS BIGINT) FROM ge) AS n_perms_ge, "
            "(SELECT CAST((n_ge + 1) * 1000000 // 9 AS BIGINT) "
            "FROM ge) AS p_value_ppm"),
        "hilbert_vs_zorder_locality": (
            "WITH RECURSIVE cells AS (SELECT DISTINCT "
            "CAST(o_custkey % 16 AS BIGINT) AS x, "
            "CAST(dayofyear(o_orderdate) % 16 AS BIGINT) AS y "
            "FROM orders), "
            "zd AS (SELECT x, y, "
            "((x & 1) * 2 + (y & 1) + ((x >> 1) & 1) * 8 + "
            "((y >> 1) & 1) * 4 + ((x >> 2) & 1) * 32 + "
            "((y >> 2) & 1) * 16 + ((x >> 3) & 1) * 128 + "
            "((y >> 3) & 1) * 64) AS d FROM cells), "
            "hc(x0, y0, cx, cy, s, d) AS ("
            "SELECT x, y, x, y, CAST(8 AS BIGINT), "
            "CAST(0 AS BIGINT) FROM cells "
            "UNION ALL SELECT x0, y0, "
            "CASE WHEN (CASE WHEN (cy & s) > 0 THEN 1 ELSE 0 END) "
            "= 1 THEN cx ELSE CASE WHEN (CASE WHEN (cx & s) > 0 "
            "THEN 1 ELSE 0 END) = 1 THEN s - 1 - cy ELSE cy END "
            "END, "
            "CASE WHEN (CASE WHEN (cy & s) > 0 THEN 1 ELSE 0 END) "
            "= 1 THEN cy ELSE CASE WHEN (CASE WHEN (cx & s) > 0 "
            "THEN 1 ELSE 0 END) = 1 THEN s - 1 - cx ELSE cx END "
            "END, "
            "s // 2, "
            "d + s * s * CAST(xor(3 * (CASE WHEN (cx & s) > 0 "
            "THEN 1 ELSE 0 END), (CASE WHEN (cy & s) > 0 THEN 1 "
            "ELSE 0 END)) AS BIGINT) "
            "FROM hc WHERE s >= 1), "
            "hd AS (SELECT x0 AS x, y0 AS y, d FROM hc "
            "WHERE s = 0), "
            "lz AS (SELECT COALESCE(SUM(abs(x - lx) + abs(y - ly))"
            ", 0) AS td, count(*) AS nc FROM (SELECT x, y, "
            "lag(x) OVER (ORDER BY d) AS lx, lag(y) OVER "
            "(ORDER BY d) AS ly FROM zd)), "
            "lh AS (SELECT COALESCE(SUM(abs(x - lx) + abs(y - ly))"
            ", 0) AS td, count(*) AS nc FROM (SELECT x, y, "
            "lag(x) OVER (ORDER BY d) AS lx, lag(y) OVER "
            "(ORDER BY d) AS ly FROM hd)) "
            "SELECT 'zorder' AS curve, CAST(nc AS BIGINT) "
            "AS n_occupied, CAST(td AS BIGINT) AS total_manhattan "
            "FROM lz UNION ALL SELECT 'hilbert', "
            "CAST(nc AS BIGINT), CAST(td AS BIGINT) FROM lh"),
        "cache_admission_knapsack_plan": (
            "WITH r AS (SELECT l_partkey AS p, "
            "SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS v FROM lineitem GROUP BY 1), "
            "it AS (SELECT r.p, r.v, CAST(p_size AS BIGINT) AS s "
            "FROM r JOIN part ON r.p = p_partkey "
            "WHERE p_size > 0), "
            "tot AS (SELECT SUM(s) AS ts, SUM(v) AS tv, count(*) "
            "AS np FROM it), "
            "rk AS (SELECT p, v, s, SUM(s) OVER (ORDER BY "
            "(v * 1000000) // s DESC, p ASC ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND CURRENT ROW) AS cum FROM it), "
            "sel AS (SELECT count(*) AS nc, COALESCE(SUM(s), 0) "
            "AS cs, COALESCE(SUM(v), 0) AS cv FROM rk, tot "
            "WHERE cum <= ts // 10) "
            "SELECT CAST(np AS BIGINT) AS n_parts, "
            "CAST(ts // 10 AS BIGINT) AS budget, "
            "CAST(nc AS BIGINT) AS n_cached, "
            "CAST(cs AS BIGINT) AS cached_size, "
            "CAST(cv AS BIGINT) AS cached_revenue_cents, "
            "CAST(CASE WHEN tv > 0 THEN cv * 1000000 // tv "
            "ELSE 0 END AS BIGINT) AS hit_ppm FROM sel, tot"),
        "skipgram_window_pairs_topk": (
            "WITH a AS (SELECT doc_id, string_split(text, ' ') "
            "AS arr FROM documents), "
            "ix AS (SELECT doc_id, arr, unnest(range(1, len(arr) "
            "+ 1)) AS i FROM a), "
            "tk AS (SELECT doc_id, i, arr[i] AS tok FROM ix), "
            "pr AS (SELECT t1.tok AS w1, t2.tok AS w2 FROM tk t1 "
            "JOIN tk t2 ON t1.doc_id = t2.doc_id "
            "AND t2.i - t1.i BETWEEN 1 AND 3) "
            "SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_cooccur "
            "FROM pr GROUP BY 1, 2 "
            "ORDER BY n_cooccur DESC, w1 ASC, w2 ASC LIMIT 10"),
        "daily_revenue_max_drawdown": (
            "WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') "
            "AS day, SUM(CAST(round(o_totalprice * 100) AS BIGINT))"
            " AS v FROM orders GROUP BY 1), "
            "w AS (SELECT day, v, MAX(v) OVER (ORDER BY day) "
            "AS pk FROM d), "
            "dd AS (SELECT day, pk - v AS dd FROM w), "
            "mx AS (SELECT dd AS m, day FROM dd "
            "ORDER BY dd DESC, day ASC LIMIT 1) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) "
            "AS n_days, (SELECT CAST(MAX(v) AS BIGINT) FROM d) "
            "AS peak_cents, CAST(CASE WHEN m > 0 THEN m ELSE 0 END"
            " AS BIGINT) AS max_drawdown_cents, "
            "CASE WHEN m > 0 THEN day ELSE '' END AS drawdown_day "
            "FROM mx"),
        "buddy_allocation_frag_census": (
            "WITH c AS (SELECT l_orderkey, count(*) AS w "
            "FROM lineitem GROUP BY 1), "
            "b AS (SELECT w, CASE WHEN w = 1 THEN 1 ELSE "
            "(1 << length(bin(w - 1))) END AS blk FROM c) "
            "SELECT CAST(blk AS BIGINT) AS block_size, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(w) AS BIGINT) AS total_rows, "
            "CAST(SUM(blk - w) AS BIGINT) AS total_waste "
            "FROM b GROUP BY 1"),
        "good_turing_unseen_mass": (
            "WITH oc AS (SELECT o_custkey AS c, count(*) AS n "
            "FROM orders GROUP BY 1), "
            "j AS (SELECT c_mktsegment AS seg, n FROM oc "
            "JOIN customer ON oc.c = c_custkey) "
            "SELECT seg AS c_mktsegment, "
            "CAST(SUM(n) AS BIGINT) AS n_orders, "
            "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_singleton_customers, "
            "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) "
            "* 1000000 // SUM(n) AS BIGINT) AS unseen_ppm "
            "FROM j GROUP BY 1"),
        "wsjf_schedule_cost_audit": (
            "WITH dc AS (SELECT strftime(o_orderdate, '%Y-%m-%d') "
            "AS day, count(*) AS n FROM orders GROUP BY 1), "
            "bd AS (SELECT day FROM dc ORDER BY n DESC, day ASC "
            "LIMIT 1), "
            "jb AS (SELECT CAST(o_orderkey AS BIGINT) AS k, "
            "6 - CAST(substr(o_orderpriority, 1, 1) AS BIGINT) "
            "AS w, CAST(round(o_totalprice * 100) AS BIGINT) AS s "
            "FROM orders WHERE strftime(o_orderdate, '%Y-%m-%d') "
            "= (SELECT day FROM bd)), "
            "ff AS (SELECT w, SUM(s) OVER (ORDER BY k ASC ROWS "
            "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
            "FROM jb), "
            "wj AS (SELECT w, SUM(s) OVER (ORDER BY (w * 1000000) "
            "// s DESC, k ASC ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS cum FROM jb) "
            "SELECT 'fifo' AS schedule, (SELECT CAST(count(*) "
            "AS BIGINT) FROM jb) AS n_jobs, "
            "CAST(COALESCE(SUM(w * cum), 0) AS BIGINT) "
            "AS total_weighted_completion FROM ff "
            "UNION ALL SELECT 'wsjf', (SELECT CAST(count(*) "
            "AS BIGINT) FROM jb), "
            "CAST(COALESCE(SUM(w * cum), 0) AS BIGINT) FROM wj"),
        "sign_partition_cut_audit": (
            "WITH e AS (SELECT CAST(vec_id AS BIGINT) AS v, "
            "CASE WHEN CAST(embedding[1] AS DOUBLE) >= 0 THEN 1 "
            "ELSE 0 END AS s0, CAST(CONCAT('0x', substr(md5("
            "CAST(vec_id AS VARCHAR)), 1, 2)) AS BIGINT) % 2 "
            "AS sm FROM embeddings), "
            "p AS (SELECT a.s0 AS a0, b.s0 AS b0, a.sm AS am, "
            "b.sm AS bm FROM e a JOIN e b ON b.v = a.v + 1) "
            "SELECT 'dim0_sign' AS split_rule, "
            "(SELECT CAST(count(*) AS BIGINT) FROM p) AS n_pairs, "
            "CAST(COALESCE(SUM(CASE WHEN a0 <> b0 THEN 1 ELSE 0 "
            "END), 0) AS BIGINT) AS n_crossing FROM p "
            "UNION ALL SELECT 'md5', (SELECT CAST(count(*) "
            "AS BIGINT) FROM p), CAST(COALESCE(SUM(CASE WHEN am "
            "<> bm THEN 1 ELSE 0 END), 0) AS BIGINT) FROM p"),
        "streaming_centroid_drift": (
            "WITH q AS (SELECT vec_id, [CAST(round(CAST("
            "embedding[i] AS DOUBLE) * 1000) AS BIGINT) FOR i IN "
            "range(1, 5)] AS qv FROM embeddings), "
            "ck AS (SELECT unnest([8, 16, 32, 64, 128, 256, 512]) "
            "AS c) "
            "SELECT CAST(ck.c AS BIGINT) AS checkpoint, "
            "CAST(count(q.vec_id) AS BIGINT) AS n_vecs, "
            "CAST(COALESCE(SUM(qv[1]), 0) AS BIGINT) AS sum_d0, "
            "CAST(COALESCE(SUM(qv[2]), 0) AS BIGINT) AS sum_d1, "
            "CAST(COALESCE(SUM(qv[3]), 0) AS BIGINT) AS sum_d2, "
            "CAST(COALESCE(SUM(qv[4]), 0) AS BIGINT) AS sum_d3 "
            "FROM ck LEFT JOIN q ON q.vec_id < ck.c GROUP BY 1"),
        "customer_order_spree_census": (
            "WITH cd AS (SELECT DISTINCT o_custkey AS c, "
            "CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d "
            "FROM orders), "
            "lg AS (SELECT c, d, lag(d) OVER (PARTITION BY c "
            "ORDER BY d) AS pd FROM cd), "
            "br AS (SELECT c, d, CASE WHEN pd IS NULL OR d - pd "
            "> 7 THEN 1 ELSE 0 END AS brk FROM lg), "
            "sid AS (SELECT c, SUM(brk) OVER (PARTITION BY c "
            "ORDER BY d) AS sid FROM br), "
            "sp AS (SELECT c, sid, count(*) AS ln FROM sid "
            "GROUP BY 1, 2) "
            "SELECT CAST(ln AS BIGINT) AS spree_len, "
            "CAST(count(*) AS BIGINT) AS n_sprees FROM sp "
            "GROUP BY 1"),
        "patricia_compression_census": (
            "WITH nm AS (SELECT DISTINCT p_name AS n FROM part), "
            "pref AS (SELECT DISTINCT p FROM (SELECT substr(n, 1, "
            "i) AS p FROM (SELECT n, unnest(range(1, length(n) "
            "+ 1)) AS i FROM nm))), "
            "nx AS (SELECT substr(n, 1, i) AS p, substr(n, i + 1, "
            "1) AS c FROM (SELECT n, unnest(range(1, length(n))) "
            "AS i FROM nm)), "
            "br AS (SELECT p FROM (SELECT p, count(DISTINCT c) "
            "AS k FROM nx GROUP BY 1) WHERE k >= 2), "
            "pat AS (SELECT p FROM br UNION SELECT n FROM nm) "
            "SELECT CAST((SELECT count(*) FROM nm) AS BIGINT) "
            "AS n_names, "
            "CAST((SELECT count(*) FROM pref) AS BIGINT) "
            "AS n_trie_nodes, "
            "CAST((SELECT count(*) FROM pat) AS BIGINT) "
            "AS n_patricia_nodes, "
            "CAST((SELECT count(*) FROM pref) - (SELECT count(*) "
            "FROM pat) AS BIGINT) AS n_skipped"),
        "type_hourweek_cosine_matrix": (
            "WITH h AS (SELECT event_type AS ty, (epoch_ms(ts) // "
            "86400000 % 7) * 24 + (epoch_ms(ts) // 3600000) % 24 "
            "AS hw, count(*) AS n FROM events GROUP BY 1, 2), "
            "tys AS (SELECT DISTINCT ty FROM h), "
            "pr AS (SELECT a.ty AS ta, b.ty AS tb FROM tys a "
            "JOIN tys b ON a.ty < b.ty), "
            "dt AS (SELECT a.ty AS ta, b.ty AS tb, SUM(a.n * b.n) "
            "AS dot FROM h a JOIN h b ON a.hw = b.hw AND a.ty "
            "< b.ty GROUP BY 1, 2), "
            "n2 AS (SELECT ty, SUM(n * n) AS s FROM h GROUP BY 1) "
            "SELECT pr.ta AS ty_a, pr.tb AS ty_b, "
            "CAST(COALESCE(dt.dot, 0) AS BIGINT) AS dot, "
            "CAST(CAST(COALESCE(dt.dot, 0) AS HUGEINT) * "
            "COALESCE(dt.dot, 0) * 1000000 // (CAST(na.s "
            "AS HUGEINT) * nb.s) AS BIGINT) AS cos2_ppm "
            "FROM pr LEFT JOIN dt ON pr.ta = dt.ta AND pr.tb "
            "= dt.tb JOIN n2 na ON pr.ta = na.ty "
            "JOIN n2 nb ON pr.tb = nb.ty"),
        "ts_precision_collision_census": (
            "WITH t AS (SELECT epoch_us(ts) AS us FROM events), "
            "n AS (SELECT count(*) AS ne FROM t) "
            "SELECT 'us' AS trunc_unit, CAST(count(DISTINCT us) "
            "AS BIGINT) AS n_distinct, CAST((SELECT ne FROM n) - "
            "count(DISTINCT us) AS BIGINT) AS n_collisions FROM t "
            "UNION ALL SELECT 'ms', CAST(count(DISTINCT us // "
            "1000) AS BIGINT), CAST((SELECT ne FROM n) - "
            "count(DISTINCT us // 1000) AS BIGINT) FROM t "
            "UNION ALL SELECT 's', CAST(count(DISTINCT us // "
            "1000000) AS BIGINT), CAST((SELECT ne FROM n) - "
            "count(DISTINCT us // 1000000) AS BIGINT) FROM t"),
        "task_assignment_makespan_audit": (
            "WITH l AS (SELECT l_suppkey AS s, count(*) AS n "
            "FROM lineitem GROUP BY 1), "
            "rr AS (SELECT s, n, (row_number() OVER (ORDER BY s) "
            "- 1) % 8 AS w FROM l), "
            "rw AS (SELECT w, SUM(n) AS ld FROM rr GROUP BY 1), "
            "hh AS (SELECT CAST(CONCAT('0x', substr(md5(CAST(s "
            "AS VARCHAR)), 1, 2)) AS BIGINT) % 8 AS w, SUM(n) "
            "AS ld FROM l GROUP BY 1), "
            "tot AS (SELECT SUM(n) AS t FROM l) "
            "SELECT 'round_robin' AS policy, CAST(8 AS BIGINT) "
            "AS n_workers, CAST(t AS BIGINT) AS total_rows, "
            "CAST((SELECT MAX(ld) FROM rw) AS BIGINT) "
            "AS makespan, CAST(t * 1000000 // (8 * (SELECT "
            "MAX(ld) FROM rw)) AS BIGINT) AS utilization_ppm "
            "FROM tot "
            "UNION ALL SELECT 'md5_hash', CAST(8 AS BIGINT), "
            "CAST(t AS BIGINT), CAST((SELECT MAX(ld) FROM hh) "
            "AS BIGINT), CAST(t * 1000000 // (8 * (SELECT "
            "MAX(ld) FROM hh)) AS BIGINT) FROM tot"),
        "drf_dominant_share_top5": (
            "WITH p AS (SELECT o_custkey AS c, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v, "
            "count(*) AS n FROM orders GROUP BY 1), "
            "t AS (SELECT SUM(v) AS sv, SUM(n) AS sn FROM p), "
            "sc AS (SELECT c, n * 1000000 // sn AS op, "
            "v * 1000000 // sv AS sp, GREATEST(n * 1000000 // sn, "
            "v * 1000000 // sv) AS dom FROM p, t) "
            "SELECT CAST(c AS BIGINT) AS o_custkey, "
            "CAST(op AS BIGINT) AS orders_ppm, "
            "CAST(sp AS BIGINT) AS spend_ppm, "
            "CAST(dom AS BIGINT) AS dominant_ppm FROM sc "
            "ORDER BY dom DESC, c ASC LIMIT 5"),
        "edge_block_locality_audit": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS pa, "
            "b.l_partkey AS pb FROM lineitem a JOIN lineitem b "
            "ON a.l_orderkey = b.l_orderkey AND a.l_partkey "
            "< b.l_partkey), "
            "st AS (SELECT count(*) AS ne, SUM(CASE WHEN pa // "
            "1024 = pb // 1024 THEN 1 ELSE 0 END) AS ir, "
            "SUM(CASE WHEN CAST(CONCAT('0x', substr(md5(CAST(pa "
            "AS VARCHAR)), 1, 2)) AS BIGINT) % 16 = CAST(CONCAT("
            "'0x', substr(md5(CAST(pb AS VARCHAR)), 1, 2)) "
            "AS BIGINT) % 16 THEN 1 ELSE 0 END) AS im FROM e) "
            "SELECT 'partkey_range' AS layout, CAST(ne AS BIGINT) "
            "AS n_edges, CAST(COALESCE(ir, 0) AS BIGINT) "
            "AS n_intra_block FROM st "
            "UNION ALL SELECT 'md5_hash', CAST(ne AS BIGINT), "
            "CAST(COALESCE(im, 0) AS BIGINT) FROM st"),
        "bullwhip_variance_ratio": (
            "WITH od AS (SELECT strftime(o_orderdate, '%Y-%m-%d') "
            "AS day, count(*) AS n FROM orders GROUP BY 1), "
            "ld AS (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,"
            " count(*) AS n FROM lineitem GROUP BY 1), "
            "bounds AS (SELECT LEAST((SELECT min(CAST(day AS DATE))"
            " FROM od), (SELECT min(CAST(day AS DATE)) FROM ld)) "
            "AS mn, GREATEST((SELECT max(CAST(day AS DATE)) "
            "FROM od), (SELECT max(CAST(day AS DATE)) FROM ld)) "
            "AS mx), "
            "grid AS (SELECT CAST(unnest(generate_series(mn, mx, "
            "INTERVAL 1 DAY)) AS DATE) AS day FROM bounds), "
            "g AS (SELECT COALESCE(od.n, 0) AS o, "
            "COALESCE(ld.n, 0) AS l FROM grid "
            "LEFT JOIN od ON strftime(grid.day, '%Y-%m-%d') "
            "= od.day "
            "LEFT JOIN ld ON strftime(grid.day, '%Y-%m-%d') "
            "= ld.day), "
            "st AS (SELECT count(*) AS n, SUM(o) AS so, "
            "SUM(o * o) AS so2, SUM(l) AS sl, SUM(l * l) AS sl2 "
            "FROM g) "
            "SELECT CAST(n AS BIGINT) AS n_days, "
            "CAST(n * so2 - so * so AS BIGINT) AS varnum_orders, "
            "CAST(n * sl2 - sl * sl AS BIGINT) AS varnum_lines, "
            "CAST(CASE WHEN n * so2 - so * so > 0 THEN "
            "CAST(n * sl2 - sl * sl AS HUGEINT) * 1000000 // "
            "(n * so2 - so * so) ELSE 0 END AS BIGINT) "
            "AS amplification_ppm FROM st"),
        "assoc_rule_confidence_top5": (
            "WITH op AS (SELECT DISTINCT l_orderkey AS o, "
            "l_partkey AS p FROM lineitem), "
            "pc2 AS (SELECT p, count(*) AS n FROM op GROUP BY 1), "
            "pr AS (SELECT a.p AS a, b.p AS b, count(*) AS nab "
            "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p "
            "GROUP BY 1, 2), "
            "ru AS (SELECT a AS ant, b AS con, nab FROM pr "
            "WHERE nab >= 2 UNION ALL SELECT b, a, nab FROM pr "
            "WHERE nab >= 2), "
            "cf AS (SELECT ant, con, nab, pc2.n AS na, "
            "nab * 1000000 // pc2.n AS conf FROM ru "
            "JOIN pc2 ON ru.ant = pc2.p) "
            "SELECT CAST(ant AS BIGINT) AS antecedent, "
            "CAST(con AS BIGINT) AS consequent, "
            "CAST(nab AS BIGINT) AS n_both, "
            "CAST(na AS BIGINT) AS n_antecedent, "
            "CAST(conf AS BIGINT) AS confidence_ppm FROM cf "
            "ORDER BY conf DESC, ant ASC, con ASC LIMIT 5"),
        "richclub_top8_coefficient": (
            "WITH op AS (SELECT DISTINCT l_orderkey AS o, "
            "l_partkey AS p FROM lineitem), "
            "e AS (SELECT DISTINCT a.p AS a, b.p AS b FROM op a "
            "JOIN op b ON a.o = b.o AND a.p < b.p), "
            "dg AS (SELECT p, count(*) AS d FROM (SELECT a AS p "
            "FROM e UNION ALL SELECT b FROM e) GROUP BY 1), "
            "hb AS (SELECT p FROM dg ORDER BY d DESC, p ASC "
            "LIMIT 8), "
            "he AS (SELECT count(*) AS n FROM e WHERE a IN "
            "(SELECT p FROM hb) AND b IN (SELECT p FROM hb)), "
            "mi AS (SELECT MIN(d) AS md FROM dg WHERE p IN "
            "(SELECT p FROM hb)), "
            "nh AS (SELECT count(*) AS k FROM hb) "
            "SELECT CAST(k AS BIGINT) AS n_hubs, "
            "CAST(md AS BIGINT) AS min_hub_degree, "
            "CAST((SELECT n FROM he) AS BIGINT) AS n_hub_edges, "
            "CAST(k * (k - 1) // 2 AS BIGINT) AS possible_edges, "
            "CAST(CASE WHEN k >= 2 THEN (SELECT n FROM he) "
            "* 1000000 // (k * (k - 1) // 2) ELSE 0 END "
            "AS BIGINT) AS richclub_ppm FROM nh, mi"),
        "ewma_crossover_signal_census": (
            "WITH RECURSIVE d AS (SELECT strftime(o_orderdate, "
            "'%Y-%m-%d') AS day, SUM(CAST(round(o_totalprice "
            "* 100) AS BIGINT)) AS v FROM orders GROUP BY 1), "
            "bounds AS (SELECT min(CAST(day AS DATE)) AS mn, "
            "max(CAST(day AS DATE)) AS mx FROM d), "
            "grid AS (SELECT CAST(unnest(generate_series(mn, mx, "
            "INTERVAL 1 DAY)) AS DATE) AS day FROM bounds), "
            "g2 AS (SELECT COALESCE(d.v, 0) AS v, row_number() "
            "OVER (ORDER BY grid.day) AS idx FROM grid "
            "LEFT JOIN d ON strftime(grid.day, '%Y-%m-%d') "
            "= d.day), "
            "tot AS (SELECT count(*) AS nd FROM g2), "
            "sim(idx, f, s, prev, cr) AS ("
            "SELECT 1, v, v, CAST(0 AS BIGINT), CAST(0 AS BIGINT) "
            "FROM g2 WHERE idx = 1 "
            "UNION ALL SELECT g2.idx, (sim.f + g2.v) // 2, "
            "(7 * sim.s + g2.v) // 8, "
            "CAST(sign((sim.f + g2.v) // 2 - (7 * sim.s + g2.v) "
            "// 8) AS BIGINT), "
            "sim.cr + CASE WHEN CAST(sign((sim.f + g2.v) // 2 - "
            "(7 * sim.s + g2.v) // 8) AS BIGINT) <> sim.prev "
            "THEN 1 ELSE 0 END "
            "FROM sim, g2 WHERE g2.idx = sim.idx + 1) "
            "SELECT (SELECT CAST(nd AS BIGINT) FROM tot) "
            "AS n_days, CAST(cr AS BIGINT) AS n_crossovers, "
            "CAST(f AS BIGINT) AS final_fast, "
            "CAST(s AS BIGINT) AS final_slow "
            "FROM sim WHERE idx = (SELECT nd FROM tot)"),
        "aimd_congestion_replay": (
            "WITH RECURSIVE dd AS (SELECT strftime(o_orderdate, "
            "'%Y-%m-%d') AS day, count(*) AS n FROM orders "
            "GROUP BY 1), "
            "bounds AS (SELECT min(CAST(day AS DATE)) AS mn, "
            "max(CAST(day AS DATE)) AS mx FROM dd), "
            "grid AS (SELECT CAST(unnest(generate_series(mn, mx, "
            "INTERVAL 1 DAY)) AS DATE) AS day FROM bounds), "
            "g2 AS (SELECT COALESCE(dd.n, 0) AS n, row_number() "
            "OVER (ORDER BY grid.day) AS idx FROM grid "
            "LEFT JOIN dd ON strftime(grid.day, '%Y-%m-%d') "
            "= dd.day), "
            "tot AS (SELECT count(*) AS nd FROM g2), "
            "sim(idx, cw, ls, mx) AS ("
            "SELECT 0, 4, 0, 4 "
            "UNION ALL SELECT g2.idx, "
            "CASE WHEN g2.n > sim.cw THEN GREATEST(sim.cw // 2, 1)"
            " ELSE sim.cw + 1 END, "
            "sim.ls + CASE WHEN g2.n > sim.cw THEN 1 ELSE 0 END, "
            "GREATEST(sim.mx, CASE WHEN g2.n > sim.cw THEN "
            "GREATEST(sim.cw // 2, 1) ELSE sim.cw + 1 END) "
            "FROM sim, g2 WHERE g2.idx = sim.idx + 1) "
            "SELECT (SELECT CAST(nd AS BIGINT) FROM tot) "
            "AS n_days, CAST(ls AS BIGINT) AS n_losses, "
            "CAST(cw AS BIGINT) AS final_cwnd, "
            "CAST(mx AS BIGINT) AS max_cwnd "
            "FROM sim WHERE idx = (SELECT nd FROM tot)"),
        "day_boundary_shift_sensitivity": (
            "WITH s AS (SELECT unnest([0, 6, 12, 18]) AS sh), "
            "b AS (SELECT sh, (epoch_us(ts) + sh * 3600000000) // "
            "86400000000 AS day, count(*) AS n FROM events "
            "CROSS JOIN s GROUP BY 1, 2) "
            "SELECT CAST(sh AS BIGINT) AS shift_hours, "
            "CAST(count(*) AS BIGINT) AS n_days, "
            "CAST(MAX(n) AS BIGINT) AS max_day_count "
            "FROM b GROUP BY 1"),
        "embedding_anisotropy_ppm": (
            "WITH q AS (SELECT [CAST(round(CAST(embedding[i] "
            "AS DOUBLE) * 1000) AS BIGINT) FOR i IN range(1, "
            "len(embedding) + 1)] AS qv FROM embeddings), "
            "n AS (SELECT count(*) AS nv FROM q), "
            "m AS (SELECT SUM(list_sum([qv[i] * qv[i] FOR i IN "
            "range(1, len(qv) + 1)])) AS m2 FROM q), "
            "dims AS (SELECT unnest(range(1, (SELECT len(qv) "
            "FROM q LIMIT 1) + 1)) AS i), "
            "s2 AS (SELECT SUM(s * s) AS ss FROM (SELECT i, "
            "SUM(qv[i]) AS s FROM q, dims GROUP BY 1)) "
            "SELECT CAST(nv AS BIGINT) AS n_vecs, "
            "CAST(ss AS BIGINT) AS sum_sq_of_sums, "
            "CAST(m2 AS BIGINT) AS total_sq_norm, "
            "CAST(CASE WHEN nv > 0 AND m2 > 0 THEN "
            "CAST(ss AS HUGEINT) * 1000000 // (nv * m2) ELSE 0 "
            "END AS BIGINT) AS anisotropy_ppm FROM n, m, s2"),
        "top_value_event_day_concentration": (
            "WITH t AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
            "CAST(round(value * 100) AS BIGINT) AS v, event_id "
            "FROM events ORDER BY v DESC, event_id ASC LIMIT 100),"
            " d AS (SELECT day, count(*) AS n FROM t GROUP BY 1), "
            "st AS (SELECT (SELECT count(*) FROM t) AS nt, "
            "count(*) AS nd, MAX(n) AS mx FROM d) "
            "SELECT CAST(nt AS BIGINT) AS n_top, "
            "CAST(nd AS BIGINT) AS n_days, "
            "CAST(mx AS BIGINT) AS max_day_count, "
            "CAST(CASE WHEN nt > 0 THEN mx * 1000000 // nt "
            "ELSE 0 END AS BIGINT) AS max_day_share_ppm FROM st"),
        "waterfill_fair_allocation": (
            "WITH dem AS (SELECT c_nationkey AS nk, count(*) AS d "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY 1), "
            "tot AS (SELECT CAST(sum(d) AS BIGINT) AS t, "
            "CAST(max(d) AS BIGINT) AS mx, count(*) AS k FROM dem), "
            "cap AS (SELECT t // 2 AS b FROM tot), "
            "lv AS (SELECT unnest(range(0, mx + 1)) AS l FROM tot), "
            "f AS (SELECT l, sum(least(d, l)) AS alloc "
            "FROM lv CROSS JOIN dem GROUP BY 1), "
            "best AS (SELECT COALESCE(max(l), 0) AS lvl "
            "FROM f, cap WHERE alloc <= b), "
            "fin AS (SELECT sum(least(d, lvl)) AS alloc, "
            "sum(CASE WHEN d > lvl THEN 1 ELSE 0 END) AS sat "
            "FROM dem, best) "
            "SELECT CAST(k AS BIGINT) AS n_nations, "
            "CAST(b AS BIGINT) AS budget, "
            "CAST(lvl AS BIGINT) AS fill_level, "
            "CAST(alloc AS BIGINT) AS allocated, "
            "CAST(sat AS BIGINT) AS n_unsaturated_demands, "
            "CAST(b - alloc AS BIGINT) AS leftover "
            "FROM tot, cap, best, fin"),
        "rendezvous_hash_balance": (
            "WITH nodes AS (SELECT unnest(range(0, 9)) AS nd), "
            "w AS (SELECT c_custkey AS k, nd, "
            "CAST(CONCAT('0x', substr(md5(CONCAT("
            "CAST(nd AS VARCHAR), '-', "
            "CAST(c_custkey AS VARCHAR))), 1, 12)) AS BIGINT) AS h "
            "FROM customer CROSS JOIN nodes), "
            "a8 AS (SELECT k, nd FROM (SELECT k, nd, row_number() "
            "OVER (PARTITION BY k ORDER BY h DESC, nd ASC) AS rn "
            "FROM w WHERE nd < 8) WHERE rn = 1), "
            "a9 AS (SELECT k, nd FROM (SELECT k, nd, row_number() "
            "OVER (PARTITION BY k ORDER BY h DESC, nd ASC) AS rn "
            "FROM w) WHERE rn = 1), "
            "c8 AS (SELECT nd, count(*) AS n FROM a8 GROUP BY 1), "
            "c9 AS (SELECT nd, count(*) AS n FROM a9 GROUP BY 1), "
            "st AS (SELECT a8.nd, count(*) AS n FROM a8 JOIN a9 "
            "ON a8.k = a9.k AND a8.nd = a9.nd GROUP BY 1) "
            "SELECT CAST(nodes.nd AS BIGINT) AS node, "
            "CAST(COALESCE(c8.n, 0) AS BIGINT) AS n_keys_8nodes, "
            "CAST(COALESCE(c9.n, 0) AS BIGINT) AS n_keys_9nodes, "
            "CAST(COALESCE(st.n, 0) AS BIGINT) AS n_stayed "
            "FROM nodes LEFT JOIN c8 ON nodes.nd = c8.nd "
            "LEFT JOIN c9 ON nodes.nd = c9.nd "
            "LEFT JOIN st ON nodes.nd = st.nd"),
        "quality_length_kappa_ppm": (
            "WITH f AS (SELECT (len(string_split(text, ' ')) "
            "BETWEEN 10 AND 5000 AND "
            "2 * len(list_filter(string_split(text, ' '), x -> x IN "
            f"{_STOPLIST_SQL})) <= len(string_split(text, ' '))) "
            "AS q, n_chars >= 200 AS l FROM documents), "
            "c AS (SELECT "
            "sum(CASE WHEN NOT q AND NOT l THEN 1 ELSE 0 END) AS c0, "
            "sum(CASE WHEN NOT q AND l THEN 1 ELSE 0 END) AS c1, "
            "sum(CASE WHEN q AND NOT l THEN 1 ELSE 0 END) AS c2, "
            "sum(CASE WHEN q AND l THEN 1 ELSE 0 END) AS c3, "
            "count(*) AS n FROM f), "
            "k AS (SELECT n, c0, c1, c2, c3, "
            "CAST(n AS HUGEINT) * (c0 + c3) "
            "- (CAST(c0 + c1 AS HUGEINT) * (c0 + c2) "
            "+ CAST(c2 + c3 AS HUGEINT) * (c1 + c3)) AS num, "
            "CAST(n AS HUGEINT) * n "
            "- (CAST(c0 + c1 AS HUGEINT) * (c0 + c2) "
            "+ CAST(c2 + c3 AS HUGEINT) * (c1 + c3)) AS den FROM c) "
            "SELECT CAST(n AS BIGINT) AS n_docs, "
            "CAST(c3 AS BIGINT) AS both_pass, "
            "CAST(c2 AS BIGINT) AS quality_only, "
            "CAST(c1 AS BIGINT) AS length_only, "
            "CAST(c0 AS BIGINT) AS both_fail, "
            "CAST(CASE WHEN den = 0 THEN 0 "
            "WHEN num >= 0 THEN (num * 1000000) // den "
            "ELSE -((-num * 1000000 + den - 1) // den) END "
            "AS BIGINT) AS kappa_ppm FROM k"),
        "weekly_fourier_energy": (
            "WITH co(r, c, s) AS (VALUES (0, 1000, 0), "
            "(1, 623, 782), (2, -223, 975), (3, -901, 434), "
            "(4, -901, -434), (5, -223, -975), (6, 623, -782)), "
            "b AS (SELECT (epoch_us(o_orderdate) // 86400000000) "
            "% 7 AS r, count(*) AS n FROM orders GROUP BY 1), "
            "t AS (SELECT SUM(n) AS n_orders, SUM(n * c) AS cs, "
            "SUM(n * s) AS ss FROM b JOIN co ON b.r = co.r) "
            "SELECT CAST(n_orders AS BIGINT) AS n_orders, "
            "CAST(cs AS BIGINT) AS cos_sum_milli, "
            "CAST(ss AS BIGINT) AS sin_sum_milli, "
            "CAST(CAST(cs AS HUGEINT) * cs + CAST(ss AS HUGEINT) "
            "* ss AS BIGINT) AS weekly_power FROM t"),
        "bipartite_butterfly_census": (
            "WITH e AS (SELECT DISTINCT o_custkey AS c, "
            "l_partkey AS p FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey), "
            "deg AS (SELECT p, count(*) AS d FROM e GROUP BY 1), "
            "pr AS (SELECT a.c AS c1, b.c AS c2, count(*) AS w "
            "FROM e a JOIN e b ON a.p = b.p AND a.c < b.c "
            "GROUP BY 1, 2) "
            "SELECT (SELECT CAST(count(DISTINCT c) AS BIGINT) "
            "FROM e) AS n_customers, "
            "(SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_parts, "
            "(SELECT CAST(sum(d) AS BIGINT) FROM deg) AS n_edges, "
            "(SELECT CAST(COALESCE(sum(d * (d - 1) // 2), 0) "
            "AS BIGINT) FROM deg) AS n_wedges, "
            "(SELECT CAST(COALESCE(sum(CAST(w AS HUGEINT) "
            "* (w - 1) // 2), 0) AS BIGINT) FROM pr) "
            "AS n_butterflies"),
        "mlm_masking_plan_census": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') "
            "AS t FROM documents), "
            "pos AS (SELECT md5(CONCAT(CAST(doc_id AS VARCHAR), "
            "'-', CAST(i AS VARCHAR))) AS h FROM toks, "
            "UNNEST(range(1, len(t) + 1)) u(i)), "
            "cl AS (SELECT CAST(CONCAT('0x', substr(h, 1, 8)) "
            "AS BIGINT) % 100 < 15 AS m, "
            "CAST(CONCAT('0x', substr(h, 9, 4)) AS BIGINT) % 10 "
            "AS pol FROM pos) "
            "SELECT CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_masked, "
            "CAST(sum(CASE WHEN m AND pol <= 7 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_mask_token, "
            "CAST(sum(CASE WHEN m AND pol = 8 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_random_token, "
            "CAST(sum(CASE WHEN m AND pol = 9 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_kept FROM cl"),
        "order_ship_busday_lag_hist": (
            "WITH j AS (SELECT epoch_us(o_orderdate) "
            "// 86400000000 AS od, epoch_us(l_shipdate) "
            "// 86400000000 AS sd FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey), "
            "w AS (SELECT (5 * ((sd + 1) // 7) "
            "+ [0,1,2,2,2,3,4,5][((sd + 1) % 7) + 1]) "
            "- (5 * ((od + 1) // 7) "
            "+ [0,1,2,2,2,3,4,5][((od + 1) % 7) + 1]) AS lag "
            "FROM j) "
            "SELECT CAST(lag AS BIGINT) AS busday_lag, "
            "CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1"),
        "nation_revenue_hoover_ppm": (
            "WITH nk AS (SELECT c_nationkey AS k, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY 1), "
            "t AS (SELECT count(*) AS k, SUM(x) AS s FROM nk), "
            "d AS (SELECT SUM(abs(CAST(t.k AS HUGEINT) * x - s)) "
            "AS dev FROM nk, t) "
            "SELECT CAST(k AS BIGINT) AS n_nations, "
            "CAST(s AS BIGINT) AS total_cents, "
            "CAST(dev AS BIGINT) AS abs_dev_scaled, "
            "CAST(CASE WHEN k > 0 AND s > 0 THEN "
            "dev * 1000000 // (2 * k * CAST(s AS HUGEINT)) "
            "ELSE 0 END AS BIGINT) AS hoover_ppm FROM t, d"),
        "length_rule_pr_curve": (
            "WITH th AS (SELECT unnest([50, 100, 200, 400, 800]) "
            "AS t), "
            "f AS (SELECT (len(string_split(text, ' ')) "
            "BETWEEN 10 AND 5000 AND "
            "2 * len(list_filter(string_split(text, ' '), x -> x IN "
            f"{_STOPLIST_SQL})) <= len(string_split(text, ' '))) "
            "AS q, n_chars FROM documents), "
            "c AS (SELECT t, "
            "sum(CASE WHEN q AND n_chars >= t THEN 1 ELSE 0 END) "
            "AS tp, "
            "sum(CASE WHEN NOT q AND n_chars >= t THEN 1 ELSE 0 "
            "END) AS fp, "
            "sum(CASE WHEN q AND n_chars < t THEN 1 ELSE 0 END) "
            "AS fn, "
            "sum(CASE WHEN NOT q AND n_chars < t THEN 1 ELSE 0 "
            "END) AS tn FROM f CROSS JOIN th GROUP BY t) "
            "SELECT CAST(t AS BIGINT) AS threshold, "
            "CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, "
            "CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn, "
            "CAST(CASE WHEN tp + fp > 0 THEN tp * 1000000 "
            "// (tp + fp) ELSE 0 END AS BIGINT) AS precision_ppm, "
            "CAST(CASE WHEN tp + fn > 0 THEN tp * 1000000 "
            "// (tp + fn) ELSE 0 END AS BIGINT) AS recall_ppm "
            "FROM c"),
        "filter_shapley_attribution": (
            "WITH s AS (SELECT len(string_split(text, ' ')) AS "
            "ntok, len(list_filter(string_split(text, ' '), "
            f"x -> x IN {_STOPLIST_SQL})) AS stop FROM documents), "
            "m AS (SELECT (CASE WHEN ntok >= 10 THEN 1 ELSE 0 END) "
            "+ 2 * (CASE WHEN ntok <= 5000 THEN 1 ELSE 0 END) "
            "+ 4 * (CASE WHEN 2 * stop <= ntok THEN 1 ELSE 0 END) "
            "AS mask FROM s), "
            "cc AS (SELECT mask, count(*) AS n FROM m GROUP BY 1), "
            "sub AS (SELECT unnest(range(0, 8)) AS sb), "
            "pv AS (SELECT sb, (SELECT COALESCE(sum(n), 0) FROM cc "
            "WHERE (mask & sb) = sb) AS a FROM sub), "
            "av AS (SELECT "
            "max(CASE WHEN sb = 0 THEN a END) AS a0, "
            "max(CASE WHEN sb = 1 THEN a END) AS a1, "
            "max(CASE WHEN sb = 2 THEN a END) AS a2, "
            "max(CASE WHEN sb = 3 THEN a END) AS a3, "
            "max(CASE WHEN sb = 4 THEN a END) AS a4, "
            "max(CASE WHEN sb = 5 THEN a END) AS a5, "
            "max(CASE WHEN sb = 6 THEN a END) AS a6, "
            "max(CASE WHEN sb = 7 THEN a END) AS a7 FROM pv) "
            "SELECT 'min_tokens' AS filter, "
            "CAST(a0 - a1 AS BIGINT) AS removed_solo, "
            "CAST(2 * (a0 - a1) + (a2 - a3) + (a4 - a5) "
            "+ 2 * (a6 - a7) AS BIGINT) AS shapley_x6 FROM av "
            "UNION ALL SELECT 'max_tokens', "
            "CAST(a0 - a2 AS BIGINT), "
            "CAST(2 * (a0 - a2) + (a1 - a3) + (a4 - a6) "
            "+ 2 * (a5 - a7) AS BIGINT) FROM av "
            "UNION ALL SELECT 'stopword_share', "
            "CAST(a0 - a4 AS BIGINT), "
            "CAST(2 * (a0 - a4) + (a1 - a5) + (a2 - a6) "
            "+ 2 * (a3 - a7) AS BIGINT) FROM av"),
        "segment_priority_tcloseness": (
            "WITH j AS (SELECT c_mktsegment AS seg, "
            "o_orderpriority AS pri FROM orders JOIN customer "
            "ON o_custkey = c_custkey), "
            "cell AS (SELECT seg, pri, count(*) AS n FROM j "
            "GROUP BY 1, 2), "
            "pris AS (SELECT pri, row_number() OVER (ORDER BY pri) "
            "AS i, count(*) OVER () AS k FROM "
            "(SELECT DISTINCT pri FROM cell)), "
            "gcnt AS (SELECT pri, sum(n) AS gn FROM cell "
            "GROUP BY 1), "
            "tot AS (SELECT sum(gn) AS nt FROM gcnt), "
            "segs AS (SELECT seg, sum(n) AS m FROM cell "
            "GROUP BY 1), "
            "grid AS (SELECT s.seg, s.m, p.i, p.k, "
            "COALESCE(c.n, 0) AS n, gl.gn FROM segs s "
            "CROSS JOIN pris p JOIN gcnt gl ON gl.pri = p.pri "
            "LEFT JOIN cell c ON c.seg = s.seg AND c.pri = p.pri), "
            "cum AS (SELECT seg, m, i, k, "
            "sum(n) OVER (PARTITION BY seg ORDER BY i) AS cg, "
            "sum(gn) OVER (PARTITION BY seg ORDER BY i) AS cgl "
            "FROM grid), "
            "emd AS (SELECT seg, m, k, "
            "sum(abs(CAST(nt AS HUGEINT) * cg "
            "- CAST(m AS HUGEINT) * cgl)) AS e "
            "FROM cum, tot WHERE i < k GROUP BY 1, 2, 3) "
            "SELECT seg AS segment, CAST(m AS BIGINT) AS n_orders, "
            "CAST(e AS BIGINT) AS emd_scaled, "
            "CAST(CASE WHEN (k - 1) * m > 0 THEN e * 1000000 "
            "// (CAST(k - 1 AS HUGEINT) * m "
            "* (SELECT nt FROM tot)) ELSE 0 END AS BIGINT) "
            "AS tcloseness_ppm FROM emd"),
        "quantity_gini_mean_difference": (
            "WITH h AS (SELECT CAST(round(l_quantity) AS BIGINT) "
            "AS q, count(*) AS n FROM lineitem GROUP BY 1), "
            "t AS (SELECT sum(n) AS n, sum(q * n) AS sq FROM h), "
            "p AS (SELECT COALESCE(sum(2 * (b.q - a.q) "
            "* CAST(a.n AS HUGEINT) * b.n), 0) AS num "
            "FROM h a JOIN h b ON b.q > a.q) "
            "SELECT CAST(n AS BIGINT) AS n_lines, "
            "CAST(sq AS BIGINT) AS sum_qty, "
            "CAST(num AS BIGINT) AS gmd_numerator, "
            "CAST(CASE WHEN n > 1 AND sq > 0 THEN "
            "num * 1000000 // (CAST(n - 1 AS HUGEINT) * sq) "
            "ELSE 0 END AS BIGINT) AS relative_gmd_ppm "
            "FROM t, p"),
        "iso_week_rollover_census": (
            "WITH d AS (SELECT isoyear(o_orderdate) AS iy, "
            "weekofyear(o_orderdate) AS wk, "
            "CASE WHEN year(o_orderdate) <> isoyear(o_orderdate) "
            "THEN 1 ELSE 0 END AS mm FROM orders) "
            "SELECT CAST(iy AS BIGINT) AS iso_year, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(count(DISTINCT wk) AS BIGINT) AS n_weeks_seen, "
            "CAST(sum(mm) AS BIGINT) AS n_year_mismatch "
            "FROM d GROUP BY 1"),
        "laplace_smoothing_rank_flips": (
            "WITH b AS (SELECT p_brand AS brand, "
            "sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
            "AS x, count(*) AS n FROM lineitem JOIN part "
            "ON l_partkey = p_partkey GROUP BY 1), "
            "pr AS (SELECT sign(a.x * b2.n - b2.x * a.n) AS s1, "
            "sign((a.x + 1) * (b2.n + 2) "
            "- (b2.x + 1) * (a.n + 2)) AS s2 "
            "FROM b a JOIN b b2 ON a.brand < b2.brand) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM b) "
            "AS n_brands, "
            "CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(sum(CASE WHEN s1 * s2 = -1 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_flipped, "
            "CAST(sum(CASE WHEN s1 <> s2 AND s1 * s2 <> -1 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_changed "
            "FROM pr"),
        "size_price_simpson_probe": (
            "WITH m AS (SELECT p_brand AS brand, count(*) AS n, "
            "sum(CAST(p_size AS BIGINT)) AS sx, "
            "sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS sy, "
            "sum(CAST(p_size AS BIGINT) "
            "* CAST(round(p_retailprice * 100) AS BIGINT)) AS sxy "
            "FROM part GROUP BY 1), "
            "p AS (SELECT sign(CAST(sum(n) AS HUGEINT) * sum(sxy) "
            "- CAST(sum(sx) AS HUGEINT) * sum(sy)) AS ps FROM m), "
            "g AS (SELECT sign(CAST(n AS HUGEINT) * sxy "
            "- CAST(sx AS HUGEINT) * sy) AS s FROM m) "
            "SELECT CAST(ps AS BIGINT) AS pooled_sign, "
            "(SELECT CAST(count(*) AS BIGINT) FROM m) AS n_brands, "
            "CAST(sum(CASE WHEN s <> 0 AND ps <> 0 AND s = ps "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_agree, "
            "CAST(sum(CASE WHEN s <> 0 AND ps <> 0 AND s <> ps "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree, "
            "CAST(sum(CASE WHEN s = 0 OR ps = 0 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_zero FROM g, p GROUP BY ps"),
        "friday13_order_lift": (
            "WITH dd AS (SELECT epoch_us(o_orderdate) "
            "// 86400000000 AS e, count(*) AS n FROM orders "
            "GROUP BY 1), "
            "b AS (SELECT min(e) AS mn, max(e) AS mx, sum(n) "
            "AS tot FROM dd), "
            "grid AS (SELECT unnest(range(mn, mx + 1)) AS e "
            "FROM b), "
            "cls AS (SELECT e, CASE WHEN (e + 3) % 7 = 4 AND "
            "day(DATE '1970-01-01' + CAST(e AS INT)) = 13 "
            "THEN 1 ELSE 0 END AS f13 FROM grid), "
            "f AS (SELECT sum(f13) AS nf FROM cls), "
            "onf AS (SELECT COALESCE(sum(dd.n), 0) AS s FROM dd "
            "JOIN cls ON dd.e = cls.e WHERE cls.f13 = 1) "
            "SELECT CAST(mx - mn + 1 AS BIGINT) AS n_days, "
            "CAST(nf AS BIGINT) AS n_f13_days, "
            "CAST(s AS BIGINT) AS n_orders_f13, "
            "CAST(tot AS BIGINT) AS n_orders, "
            "CAST(CASE WHEN tot > 0 AND nf > 0 THEN "
            "CAST(s AS HUGEINT) * (mx - mn + 1) * 1000000 "
            "// (tot * nf) ELSE 0 END AS BIGINT) AS f13_lift_ppm "
            "FROM b, f, onf"),
        "source_vocab_shapley": (
            "WITH tok AS (SELECT DISTINCT source, t FROM "
            "(SELECT source, unnest(string_split(text, ' ')) AS t "
            "FROM documents)), "
            "m AS (SELECT t, count(*) AS m FROM tok GROUP BY 1) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_exclusive, "
            "CAST(sum(232792560 // m) AS BIGINT) AS shapley_scaled "
            "FROM tok JOIN m USING (t) GROUP BY source"),
        "feature_hashing_collision_sweep": (
            "WITH v AS (SELECT DISTINCT t FROM (SELECT "
            "unnest(string_split(text, ' ')) AS t FROM documents)), "
            "h AS (SELECT CAST(CONCAT('0x', substr(md5(t), 1, 12)) "
            "AS BIGINT) AS hh FROM v), "
            "ks AS (SELECT unnest([8, 10, 12, 14]) AS k), "
            "b AS (SELECT k, hh % (1 << k) AS bkt, count(*) AS c "
            "FROM h CROSS JOIN ks GROUP BY 1, 2), "
            "s AS (SELECT k, sum(c) AS vocab, count(*) AS occ, "
            "sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS singles "
            "FROM b GROUP BY 1) "
            "SELECT CAST(k AS BIGINT) AS k_bits, "
            "CAST(vocab AS BIGINT) AS vocab, "
            "CAST(occ AS BIGINT) AS occupied, "
            "CAST(singles AS BIGINT) AS singleton_buckets, "
            "CAST(vocab - singles AS BIGINT) AS collided_tokens, "
            "CAST(CASE WHEN vocab > 0 THEN (vocab - singles) "
            "* 1000000 // vocab ELSE 0 END AS BIGINT) "
            "AS collision_ppm FROM s"),
        "linear_probing_cluster_census": (
            "WITH sl AS (SELECT CAST(CONCAT('0x', substr(md5("
            "CAST(c_custkey AS VARCHAR)), 1, 12)) AS BIGINT) "
            "% 4096 AS slot FROM customer), "
            "ld AS (SELECT slot, count(*) AS c FROM sl GROUP BY 1), "
            "oc AS (SELECT slot, slot - row_number() "
            "OVER (ORDER BY slot) AS grp FROM ld), "
            "runs AS (SELECT count(*) AS len FROM oc GROUP BY grp) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM sl) "
            "AS n_keys, CAST(4096 AS BIGINT) AS n_slots, "
            "(SELECT CAST(count(*) AS BIGINT) FROM ld) AS occupied, "
            "(SELECT CAST(count(*) AS BIGINT) FROM runs) AS n_runs, "
            "(SELECT CAST(COALESCE(max(len), 0) AS BIGINT) "
            "FROM runs) AS longest_run, "
            "(SELECT CAST(COALESCE(max(c), 0) AS BIGINT) FROM ld) "
            "AS max_slot_load"),
        "source_minhash_jaccard_error": (
            "WITH tok AS (SELECT DISTINCT source, t FROM "
            "(SELECT source, unnest(string_split(text, ' ')) AS t "
            "FROM documents)), "
            "sz AS (SELECT source, count(*) AS n FROM tok "
            "GROUP BY 1), "
            "it AS (SELECT a.source AS sa, b.source AS sb, "
            "count(*) AS ix FROM tok a JOIN tok b ON a.t = b.t "
            "AND a.source < b.source GROUP BY 1, 2), "
            "hh AS (SELECT DISTINCT source, CAST(CONCAT('0x', "
            "substr(md5(t), 1, 12)) AS BIGINT) AS h FROM tok), "
            "mh AS (SELECT source, h FROM (SELECT source, h, "
            "row_number() OVER (PARTITION BY source ORDER BY h) "
            "AS rn FROM hh) WHERE rn <= 32), "
            "pr AS (SELECT a.source AS sa, b.source AS sb, "
            "a.n AS na, b.n AS nb FROM sz a JOIN sz b "
            "ON a.source < b.source), "
            "uh AS (SELECT p.sa, p.sb, m.h, "
            "max(CASE WHEN m.source = p.sa THEN 1 ELSE 0 END) "
            "AS ina, "
            "max(CASE WHEN m.source = p.sb THEN 1 ELSE 0 END) "
            "AS inb FROM pr p JOIN mh m "
            "ON m.source IN (p.sa, p.sb) GROUP BY 1, 2, 3), "
            "rk AS (SELECT sa, sb, ina, inb, row_number() "
            "OVER (PARTITION BY sa, sb ORDER BY h) AS rn, "
            "count(*) OVER (PARTITION BY sa, sb) AS tot FROM uh), "
            "est AS (SELECT sa, sb, sum(CASE WHEN rn <= 32 AND "
            "ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS em, "
            "least(32, max(tot)) AS kk FROM rk GROUP BY 1, 2), "
            "fin AS (SELECT p.sa AS src_a, p.sb AS src_b, "
            "CAST(COALESCE(it.ix, 0) AS BIGINT) AS n_inter, "
            "CAST(p.na + p.nb - COALESCE(it.ix, 0) AS BIGINT) "
            "AS n_union, CAST(e.em AS BIGINT) AS est_matches, "
            "CAST(CASE WHEN p.na + p.nb - COALESCE(it.ix, 0) > 0 "
            "THEN COALESCE(it.ix, 0) * 1000000 "
            "// (p.na + p.nb - COALESCE(it.ix, 0)) ELSE 0 END "
            "AS BIGINT) AS exact_jaccard_ppm, "
            "CAST(CASE WHEN e.kk > 0 THEN e.em * 1000000 // e.kk "
            "ELSE 0 END AS BIGINT) AS est_jaccard_ppm "
            "FROM pr p LEFT JOIN it ON it.sa = p.sa "
            "AND it.sb = p.sb JOIN est e ON e.sa = p.sa "
            "AND e.sb = p.sb) "
            "SELECT *, CAST(abs(exact_jaccard_ppm "
            "- est_jaccard_ppm) AS BIGINT) AS abs_err_ppm "
            "FROM fin"),
        "lang_vocab_overlap_coeff": (
            "WITH tok AS (SELECT DISTINCT lang, t FROM "
            "(SELECT lang, unnest(string_split(text, ' ')) AS t "
            "FROM documents)), "
            "sz AS (SELECT lang, count(*) AS n FROM tok GROUP BY 1), "
            "it AS (SELECT a.lang AS la, b.lang AS lb, count(*) AS ix "
            "FROM tok a JOIN tok b ON a.t = b.t AND a.lang < b.lang "
            "GROUP BY 1, 2), "
            "pr AS (SELECT a.lang AS la, b.lang AS lb, a.n AS na, "
            "b.n AS nb FROM sz a JOIN sz b ON a.lang < b.lang) "
            "SELECT p.la AS lang_a, p.lb AS lang_b, "
            "CAST(p.na AS BIGINT) AS n_a, CAST(p.nb AS BIGINT) AS n_b, "
            "CAST(COALESCE(it.ix, 0) AS BIGINT) AS n_inter, "
            "CAST(COALESCE(it.ix, 0) * 1000000 "
            "// least(p.na, p.nb) AS BIGINT) AS overlap_ppm "
            "FROM pr p LEFT JOIN it ON it.la = p.la AND it.lb = p.lb"),
        "token_bigram_pmi_top10": (
            "WITH tk AS (SELECT string_split(text, ' ') AS t "
            "FROM documents), "
            "bg AS (SELECT t[i] AS ta, t[i + 1] AS tb FROM tk, "
            "UNNEST(range(1, len(t))) u(i)), "
            "cab AS (SELECT ta, tb, count(*) AS cab FROM bg "
            "GROUP BY 1, 2), "
            "ca AS (SELECT ta, sum(cab) AS ca FROM cab GROUP BY 1), "
            "cb AS (SELECT tb, sum(cab) AS cb FROM cab GROUP BY 1), "
            "nn AS (SELECT sum(cab) AS n FROM cab) "
            "SELECT ta, tb, CAST(cab AS BIGINT) AS n_pair, "
            "CAST(ca AS BIGINT) AS n_left, "
            "CAST(cb AS BIGINT) AS n_right, "
            "CAST(CAST(cab AS HUGEINT) * n * 1000000 "
            "// (CAST(ca AS HUGEINT) * cb) AS BIGINT) "
            "AS pmi_score_ppm "
            "FROM cab JOIN ca USING (ta) JOIN cb USING (tb), nn "
            "WHERE cab >= 2 "
            "ORDER BY pmi_score_ppm DESC, ta, tb LIMIT 10"),
        "region_priority_hist_intersection": (
            "WITH o AS (SELECT r_name, o_orderpriority AS pr, "
            "count(*) AS c FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2), "
            "t AS (SELECT r_name, sum(c) AS n FROM o GROUP BY 1), "
            "pr AS (SELECT a.r_name AS ra, b.r_name AS rb, a.n AS na, "
            "b.n AS nb FROM t a JOIN t b ON a.r_name < b.r_name), "
            "kv AS (SELECT p.ra, p.rb, sum(least("
            "CAST(oa.c AS HUGEINT) * p.nb, "
            "CAST(ob.c AS HUGEINT) * p.na)) AS k FROM pr p "
            "JOIN o oa ON oa.r_name = p.ra "
            "JOIN o ob ON ob.r_name = p.rb AND ob.pr = oa.pr "
            "GROUP BY 1, 2) "
            "SELECT p.ra AS region_a, p.rb AS region_b, "
            "CAST(p.na AS BIGINT) AS n_a, CAST(p.nb AS BIGINT) AS n_b, "
            "CAST(CAST(COALESCE(kv.k, 0) AS HUGEINT) * 1000000 "
            "// (CAST(p.na AS HUGEINT) * p.nb) AS BIGINT) "
            "AS intersection_ppm "
            "FROM pr p LEFT JOIN kv ON kv.ra = p.ra AND kv.rb = p.rb"),
        "collatz_stopping_census": (
            "WITH RECURSIVE r AS ("
            "SELECT c_custkey AS k, CAST(c_custkey AS BIGINT) AS v, "
            "0 AS s FROM customer "
            "UNION ALL "
            "SELECT k, CASE WHEN v % 2 = 0 THEN v // 2 "
            "ELSE 3 * v + 1 END, s + 1 FROM r WHERE v > 1), "
            "f AS (SELECT k, max(s) AS steps FROM r GROUP BY 1) "
            "SELECT CAST(steps AS BIGINT) AS steps, "
            "CAST(count(*) AS BIGINT) AS n_keys, "
            "CAST(min(k) AS BIGINT) AS min_key FROM f GROUP BY 1"),
        "daily_revenue_max_rally": (
            "WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') "
            "AS day, CAST(sum(CAST(round(o_totalprice * 100) "
            "AS BIGINT)) AS BIGINT) AS v FROM orders GROUP BY 1), "
            "w AS (SELECT day, v, min(v) OVER (ORDER BY day "
            "ROWS UNBOUNDED PRECEDING) AS rmin FROM d), "
            "g AS (SELECT max(v - rmin) AS mr FROM w) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) "
            "AS n_days, "
            "(SELECT CAST(min(v) AS BIGINT) FROM d) AS trough_cents, "
            "CAST(g.mr AS BIGINT) AS max_rally_cents, "
            "(SELECT min(day) FROM w WHERE v - rmin = g.mr) "
            "AS rally_day FROM g"),
        "order_day_next_greater_census": (
            "WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') "
            "AS day, count(*) AS c FROM orders GROUP BY 1), "
            "i AS (SELECT day, c, row_number() OVER (ORDER BY day) "
            "AS idx FROM d), "
            "ng AS (SELECT a.idx AS ai, "
            "COALESCE(min(b.idx) - a.idx, -1) AS dist FROM i a "
            "LEFT JOIN i b ON b.idx > a.idx AND b.c > a.c "
            "GROUP BY 1) "
            "SELECT CAST(dist AS BIGINT) AS dist, "
            "CAST(count(*) AS BIGINT) AS n_days "
            "FROM ng GROUP BY 1"),
        "quantity_mannwhitney_u2": (
            "WITH f AS (SELECT l_returnflag AS flag, "
            "CAST(round(l_quantity) AS BIGINT) AS qty FROM lineitem "
            "WHERE l_returnflag IN ('R', 'N')), "
            "h AS (SELECT flag, qty, CAST(count(*) AS HUGEINT) AS n "
            "FROM f GROUP BY 1, 2), "
            "a AS (SELECT qty, n FROM h WHERE flag = 'R'), "
            "b AS (SELECT qty, n FROM h WHERE flag = 'N'), "
            "w AS (SELECT COALESCE(SUM(a.n * 2 * b.n), 0) AS wins "
            "FROM a JOIN b ON b.qty < a.qty), "
            "t AS (SELECT COALESCE(SUM(a.n * b.n), 0) AS ties "
            "FROM a JOIN b ON a.qty = b.qty), "
            "na AS (SELECT COALESCE(SUM(n), 0) AS n_a FROM a), "
            "nb AS (SELECT COALESCE(SUM(n), 0) AS n_b FROM b) "
            "SELECT CAST(wins + ties AS VARCHAR) AS u2, "
            "CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b "
            "FROM w, t, na, nb"),
        "brand_discount_subsidy_ppm": (
            "WITH s AS (SELECT p_brand, "
            "SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)) "
            "AS gross, "
            "SUM(CAST(round(l_extendedprice * 100) AS HUGEINT) "
            "* CAST(round(l_discount * 100) AS HUGEINT)) AS sub "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "GROUP BY 1) "
            "SELECT p_brand, "
            "CAST(1000000 * sub // (100 * gross) AS BIGINT) "
            "AS subsidy_ppm FROM s ORDER BY p_brand"),
        "event_arrival_lateness_hist": (
            "WITH w AS (SELECT epoch_us(ts) AS us, "
            "max(epoch_us(ts)) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS prevmax FROM events) "
            "SELECT CAST(CASE WHEN prevmax IS NULL "
            "OR prevmax <= us THEN 0 "
            "ELSE (prevmax - us) // 60000000 END AS BIGINT) "
            "AS lateness_minutes, "
            "CAST(count(*) AS BIGINT) AS n_events FROM w "
            "GROUP BY 1 ORDER BY 1"),
        "customer_acctbal_sign_by_segment": (
            "SELECT c_mktsegment, "
            "CAST(sign(CAST(round(c_acctbal * 100) AS BIGINT)) "
            "AS BIGINT) AS bal_sign, "
            "CAST(count(*) AS BIGINT) AS n_customers FROM customer "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "nearest_centroid_confusion": (
            "WITH v AS (SELECT vec_id, label, r.i AS i, "
            "CAST(round(CAST(embedding[CAST(r.i AS INT)] AS DOUBLE) "
            "* 10000) AS BIGINT) AS q FROM embeddings "
            "CROSS JOIN range(1, 65) AS r(i)), "
            "cs AS (SELECT label, i, SUM(q) AS s, "
            "CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1, 2), "
            "c AS (SELECT label, i, (10000 * s + 1000000000 * n) // n "
            "- 1000000000 AS c FROM cs), "
            "d AS (SELECT v.vec_id, v.label AS true_label, "
            "c.label AS cand, SUM((10000 * v.q - c.c) "
            "* (10000 * v.q - c.c)) AS dist "
            "FROM v JOIN c ON v.i = c.i GROUP BY 1, 2, 3), "
            "p AS (SELECT vec_id, true_label, cand AS pred_label, "
            "row_number() OVER (PARTITION BY vec_id "
            "ORDER BY dist, cand) AS rn FROM d) "
            "SELECT CAST(true_label AS BIGINT) AS true_label, "
            "CAST(pred_label AS BIGINT) AS pred_label, "
            "CAST(count(*) AS BIGINT) AS n_vectors FROM p "
            "WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2"),
        "customer_brand_loyalty_hist": (
            "WITH cb AS (SELECT o_custkey AS cust, p_brand AS brand, "
            "count(*) AS n FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN part ON l_partkey = p_partkey GROUP BY 1, 2), "
            "pc AS (SELECT cust, sum(n) AS total, max(n) AS mx "
            "FROM cb GROUP BY 1) "
            "SELECT CAST((1000000 * mx // total) // 100000 AS BIGINT) "
            "AS loyalty_decile, "
            "CAST(count(*) AS BIGINT) AS n_customers FROM pc "
            "GROUP BY 1 ORDER BY 1"),
        "token_suffix_diversity": (
            "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t "
            "FROM documents), "
            "f AS (SELECT t FROM tok WHERE length(t) >= 3), "
            "st AS (SELECT substr(t, length(t) - 2, 3) AS suffix, t, "
            "count(*) AS occ FROM f GROUP BY 1, 2), "
            "s AS (SELECT suffix, count(*) AS n_types, sum(occ) AS "
            "n_occurrences FROM st GROUP BY 1) "
            "SELECT suffix, CAST(n_types AS BIGINT) AS n_types, "
            "CAST(n_occurrences AS BIGINT) AS n_occurrences FROM s "
            "ORDER BY n_types DESC, suffix LIMIT 20"),
        "signbucket_label_purity": (
            "WITH b AS (SELECT "
            "(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) "
            "+ 2 * (CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END) "
            "+ 4 * (CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) "
            "+ 8 * (CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END) "
            "+ 16 * (CASE WHEN embedding[5] > 0 THEN 1 ELSE 0 END) "
            "+ 32 * (CASE WHEN embedding[6] > 0 THEN 1 ELSE 0 END) "
            "+ 64 * (CASE WHEN embedding[7] > 0 THEN 1 ELSE 0 END) "
            "+ 128 * (CASE WHEN embedding[8] > 0 THEN 1 ELSE 0 END) "
            "AS bucket, label FROM embeddings), "
            "bl AS (SELECT bucket, label, count(*) AS n FROM b "
            "GROUP BY 1, 2) "
            "SELECT CAST(bucket AS BIGINT) AS bucket, "
            "CAST(sum(n) AS BIGINT) AS n_vectors, "
            "CAST(max(n) AS BIGINT) AS max_label_n, "
            "CAST(count(*) AS BIGINT) AS n_labels FROM bl "
            "GROUP BY 1 ORDER BY 1"),
        "parts_ordered_all_years": (
            "WITH py AS (SELECT DISTINCT l_partkey, "
            "year(l_shipdate) AS y FROM lineitem), "
            "yy AS (SELECT count(DISTINCT year(l_shipdate)) AS ny "
            "FROM lineitem), "
            "c AS (SELECT l_partkey, count(*) AS n FROM py "
            "GROUP BY 1) "
            "SELECT CAST(l_partkey AS BIGINT) AS p_partkey "
            "FROM c, yy WHERE n = ny ORDER BY 1"),
        "purchase_nearest_view_gap_hist": (
            "WITH p AS (SELECT DISTINCT user_id, ts FROM events "
            "WHERE event_type = 'purchase'), "
            "v AS (SELECT user_id, ts FROM events "
            "WHERE event_type = 'view'), "
            "g AS (SELECT p.user_id, p.ts, "
            "min(abs(epoch_us(p.ts) - epoch_us(v.ts))) AS gap_us "
            "FROM p JOIN v ON p.user_id = v.user_id GROUP BY 1, 2) "
            "SELECT CAST(gap_us // 60000000 AS BIGINT) AS gap_minutes, "
            "CAST(count(*) AS BIGINT) AS n_purchases FROM g "
            "GROUP BY 1 ORDER BY 1"),
        "part_price_runnerup_gap_hist": (
            "WITH ps AS (SELECT l_partkey, l_suppkey, "
            "min(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS cents FROM lineitem GROUP BY 1, 2), "
            "r AS (SELECT l_partkey, cents, row_number() OVER ("
            "PARTITION BY l_partkey ORDER BY cents, l_suppkey) AS rn "
            "FROM ps) "
            "SELECT CAST((b.cents - a.cents) // 10000 AS BIGINT) "
            "AS gap_bucket, CAST(count(*) AS BIGINT) AS n_parts "
            "FROM r a JOIN r b ON a.l_partkey = b.l_partkey "
            "AND a.rn = 1 AND b.rn = 2 GROUP BY 1 ORDER BY 1"),
        "nation_acctbal_profile": (
            "WITH c AS (SELECT c_nationkey AS nk, "
            "sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS cs, "
            "count(*) AS nc FROM customer GROUP BY 1), "
            "s AS (SELECT s_nationkey AS nk, "
            "sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS ss, "
            "count(*) AS ns FROM supplier GROUP BY 1) "
            "SELECT n_name, "
            "CAST(COALESCE(cs, 0) AS BIGINT) AS cust_sum_cents, "
            "CAST(COALESCE(nc, 0) AS BIGINT) AS n_cust, "
            "CAST(COALESCE(ss, 0) AS BIGINT) AS supp_sum_cents, "
            "CAST(COALESCE(ns, 0) AS BIGINT) AS n_supp "
            "FROM nation LEFT JOIN c ON n_nationkey = c.nk "
            "LEFT JOIN s ON n_nationkey = s.nk ORDER BY n_name"),
        "daily_whale_share_hist": (
            "WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, "
            "max(CAST(round(o_totalprice * 100) AS BIGINT)) AS mx, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS total "
            "FROM orders GROUP BY 1) "
            "SELECT CAST((1000000 * mx // GREATEST(total, 1)) "
            "// 100000 AS BIGINT) AS share_decile, "
            "CAST(count(*) AS BIGINT) AS n_days FROM d "
            "GROUP BY 1 ORDER BY 1"),
        "single_supplier_order_ppm": (
            "WITH o AS (SELECT l_orderkey, count(*) AS n, "
            "min(l_suppkey) AS mn, max(l_suppkey) AS mx "
            "FROM lineitem GROUP BY 1) "
            "SELECT CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_multi, "
            "CAST(SUM(CASE WHEN n >= 2 AND mn = mx THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_single_supplier, "
            "CAST(1000000 * SUM(CASE WHEN n >= 2 AND mn = mx THEN 1 "
            "ELSE 0 END) // GREATEST(SUM(CASE WHEN n >= 2 THEN 1 "
            "ELSE 0 END), 1) AS BIGINT) AS single_ppm FROM o"),
        "customer_tenure_years_hist": (
            "WITH c AS (SELECT o_custkey, "
            "year(max(o_orderdate)) - year(min(o_orderdate)) AS t "
            "FROM orders GROUP BY 1) "
            "SELECT CAST(t AS BIGINT) AS tenure_years, "
            "CAST(count(*) AS BIGINT) AS n_customers FROM c "
            "GROUP BY 1 ORDER BY 1"),
        "lapsed_customers_sweep": (
            "WITH c AS (SELECT o_custkey, "
            "date_diff('day', max(o_orderdate), "
            "TIMESTAMP '2001-08-01') AS silent FROM orders "
            "GROUP BY 1), "
            "w(window_days) AS (VALUES (30), (90), (180), (365)) "
            "SELECT CAST(window_days AS BIGINT) AS window_days, "
            "CAST(count(*) AS BIGINT) AS n_total, "
            "CAST(SUM(CASE WHEN silent > window_days THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_lapsed FROM c CROSS JOIN w "
            "GROUP BY 1 ORDER BY 1"),
        "q6_grid_sweep": (
            "WITH l AS (SELECT CAST(round(l_extendedprice * 100) "
            "AS BIGINT) AS cents, CAST(round(l_discount * 100) "
            "AS BIGINT) AS d, CAST(round(l_quantity) AS BIGINT) AS q "
            "FROM lineitem), "
            "g(disc_pct, qty_cap) AS (VALUES (3, 24), (3, 35), "
            "(3, 50), (5, 24), (5, 35), (5, 50), (7, 24), (7, 35), "
            "(7, 50)) "
            "SELECT CAST(disc_pct AS BIGINT) AS disc_pct, "
            "CAST(qty_cap AS BIGINT) AS qty_cap, "
            "CAST(SUM(CASE WHEN d BETWEEN disc_pct - 1 AND "
            "disc_pct + 1 AND q < qty_cap THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_lines, "
            "CAST(SUM(CASE WHEN d BETWEEN disc_pct - 1 AND "
            "disc_pct + 1 AND q < qty_cap THEN cents * d ELSE 0 END) "
            "AS BIGINT) AS revenue_e4 FROM l CROSS JOIN g "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "orderkey_date_sortedness": (
            "WITH w AS (SELECT o_orderdate, lag(o_orderdate) OVER "
            "(PARTITION BY o_orderkey // 4096 ORDER BY o_orderkey) "
            "AS pd FROM orders) "
            "SELECT CAST(count(*) FILTER (WHERE pd IS NOT NULL) "
            "AS BIGINT) AS n_pairs, "
            "CAST(count(*) FILTER (WHERE o_orderdate < pd) AS BIGINT) "
            "AS n_inversions, "
            "CAST(1000000 * count(*) FILTER (WHERE o_orderdate < pd) "
            "// GREATEST(count(*) FILTER (WHERE pd IS NOT NULL), 1) "
            "AS BIGINT) AS inversion_ppm FROM w"),
        "props_k_quartiles_by_type": (
            "WITH k AS (SELECT event_type, "
            "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k "
            "FROM events) "
            "SELECT event_type, "
            "CAST(quantile_disc(k, 0.25) AS BIGINT) AS k_p25, "
            "CAST(quantile_disc(k, 0.5) AS BIGINT) AS k_p50, "
            "CAST(quantile_disc(k, 0.75) AS BIGINT) AS k_p75 "
            "FROM k WHERE k IS NOT NULL GROUP BY 1 ORDER BY 1"),
        "users_active_all_weeks": (
            "WITH p AS (SELECT DISTINCT user_id, "
            "date_trunc('week', ts) AS week FROM events), "
            "w AS (SELECT count(DISTINCT week) AS nw FROM p), "
            "u AS (SELECT user_id, count(*) AS c FROM p GROUP BY 1) "
            "SELECT CAST(w.nw AS BIGINT) AS n_weeks, "
            "CAST(count(*) AS BIGINT) AS n_users_total, "
            "CAST(SUM(CASE WHEN c = w.nw THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_users_full FROM u, w GROUP BY w.nw"),
        "segment_basket_size_matrix": (
            "WITH n AS (SELECT l_orderkey, c_mktsegment, "
            "count(*) AS nl FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2) "
            "SELECT c_mktsegment, CAST(LEAST(nl, 8) AS BIGINT) "
            "AS lines_bucket, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM n GROUP BY 1, 2 ORDER BY 1, 2"),
        "session_size_duration_cov": (
            "WITH g AS (SELECT user_id, ts, CASE WHEN "
            "date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000 "
            "OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts)), "
            "s AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY "
            "user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid "
            "FROM g), "
            "p AS (SELECT user_id, sid, CAST(count(*) AS HUGEINT) "
            "AS x, CAST(date_diff('microsecond', min(ts), max(ts)) "
            "AS HUGEINT) AS y FROM s GROUP BY 1, 2) "
            "SELECT CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(sum(x) AS BIGINT) AS sum_events, "
            "CAST(sum(y) AS BIGINT) AS sum_duration_us, "
            "CAST(count(*) * SUM(x * y) - SUM(x) * SUM(y) AS VARCHAR) "
            "AS cov_num FROM p"),
        "doc_max_token_run_topk": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS L "
            "FROM documents), "
            "p AS (SELECT doc_id, CAST(i AS INT) AS i, "
            "L[CAST(i AS INT)] AS tok FROM t "
            "CROSS JOIN range(1, 4096) r(i) WHERE i <= len(L)), "
            "g AS (SELECT doc_id, tok, i - row_number() OVER "
            "(PARTITION BY doc_id, tok ORDER BY i) AS grp FROM p), "
            "r AS (SELECT doc_id, count(*) AS run FROM g "
            "GROUP BY doc_id, tok, grp), "
            "m AS (SELECT doc_id, CAST(max(run) AS BIGINT) AS max_run "
            "FROM r GROUP BY 1) "
            "SELECT doc_id, max_run FROM m "
            "ORDER BY max_run DESC, doc_id LIMIT 10"),
        "doc_pack_plan_by_bucket": (
            "WITH RECURSIVE d AS (SELECT CAST(doc_id % 16 AS BIGINT) "
            "AS bucket, doc_id, len(string_split(text, ' ')) AS x, "
            "row_number() OVER (PARTITION BY doc_id % 16 "
            "ORDER BY doc_id) AS rn FROM documents), "
            "s AS (SELECT bucket, rn, x, 1 AS n_files, x AS fill "
            "FROM d WHERE rn = 1 "
            "UNION ALL SELECT d.bucket, d.rn, d.x, "
            "CASE WHEN s.fill + d.x > 4096 THEN s.n_files + 1 "
            "ELSE s.n_files END, "
            "CASE WHEN s.fill + d.x > 4096 THEN d.x "
            "ELSE s.fill + d.x END FROM s "
            "JOIN d ON d.bucket = s.bucket AND d.rn = s.rn + 1), "
            "m AS (SELECT bucket, max(rn) AS mr FROM s GROUP BY 1) "
            "SELECT s.bucket, CAST(m.mr AS BIGINT) AS n_docs, "
            "CAST(s.n_files AS BIGINT) AS n_files, "
            "CAST((SELECT sum(x) FROM d WHERE d.bucket = s.bucket) "
            "AS BIGINT) AS total_tokens FROM s "
            "JOIN m ON s.bucket = m.bucket AND s.rn = m.mr "
            "ORDER BY s.bucket"),
        "stopword_share_by_source": (
            "WITH t AS (SELECT source, "
            "unnest(string_split(text, ' ')) AS token FROM documents), "
            "s AS (SELECT source, count(*) AS n_tokens, "
            "SUM(CASE WHEN token IN ('the', 'a', 'of', 'and', 'is', "
            "'to', 'in') THEN 1 ELSE 0 END) AS n_stopwords FROM t "
            "GROUP BY 1) "
            "SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(n_stopwords AS BIGINT) AS n_stopwords, "
            "CAST((1000000 * n_stopwords) // GREATEST(n_tokens, 1) "
            "AS BIGINT) AS stopword_ppm FROM s ORDER BY source"),
        "dup_shingles_topk": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS L "
            "FROM documents), "
            "g AS (SELECT DISTINCT doc_id, array_to_string("
            "L[CAST(i AS INT):CAST(i + 15 AS INT)], ' ') AS shingle "
            "FROM t CROSS JOIN range(1, 4096) r(i) "
            "WHERE i <= len(L) - 15), "
            "f AS (SELECT shingle, count(*) AS df FROM g GROUP BY 1) "
            "SELECT shingle, CAST(df AS BIGINT) AS df FROM f "
            "WHERE df >= 2 ORDER BY df DESC, shingle LIMIT 20"),
        "brand_size_price_inversions": (
            "WITH m AS (SELECT p_brand AS brand, p_size AS size, "
            "min(CAST(round(p_retailprice * 100) AS BIGINT)) AS mc "
            "FROM part GROUP BY 1, 2), "
            "w AS (SELECT brand, mc, lag(mc) OVER "
            "(PARTITION BY brand ORDER BY size) AS pmc FROM m) "
            "SELECT brand, CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(SUM(CASE WHEN mc < pmc THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_inversions FROM w WHERE pmc IS NOT NULL "
            "GROUP BY 1 ORDER BY 1"),
        "region_parttype_lift": (
            "WITH c AS (SELECT r_name AS cust_region, p_type, "
            "SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents"
            " FROM lineitem JOIN part ON l_partkey = p_partkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2) "
            "SELECT cust_region, p_type, "
            "CAST(cents AS BIGINT) AS revenue_cents, "
            "CAST((1000000 * CAST(cents AS HUGEINT) * "
            "(SELECT sum(cents) FROM c)) // "
            "(sum(cents) OVER (PARTITION BY cust_region) * "
            "sum(cents) OVER (PARTITION BY p_type)) AS BIGINT) "
            "AS lift_ppm FROM c ORDER BY 1, 2"),
        "monthly_new_customer_revenue_share": (
            "WITH cm AS (SELECT o_custkey, "
            "date_trunc('month', o_orderdate) AS month, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1, 2), "
            "f AS (SELECT o_custkey, min(month) AS fm FROM cm "
            "GROUP BY 1), "
            "s AS (SELECT cm.month, "
            "SUM(CASE WHEN cm.month = f.fm THEN cents ELSE 0 END) "
            "AS new_cents, "
            "SUM(CASE WHEN cm.month = f.fm THEN 0 ELSE cents END) "
            "AS repeat_cents FROM cm JOIN f "
            "ON cm.o_custkey = f.o_custkey GROUP BY 1) "
            "SELECT month, CAST(new_cents AS BIGINT) AS new_cents, "
            "CAST(repeat_cents AS BIGINT) AS repeat_cents, "
            "CAST((1000000 * new_cents) // "
            "GREATEST(new_cents + repeat_cents, 1) AS BIGINT) "
            "AS new_share_ppm FROM s ORDER BY month"),
        "orderkey_range_partition_plan": (
            "WITH q AS (SELECT quantile_disc(o_orderkey, "
            "[" + ", ".join(f"{i}/16.0" for i in range(1, 16)) + "]) "
            "AS bs, count(*) AS n, max(o_orderkey) AS mx FROM orders), "
            "b AS (SELECT r.i AS p, "
            "CAST(bs[CAST(r.i AS INT)] AS BIGINT) AS ub FROM q "
            "CROSS JOIN range(1, 16) AS r(i) "
            "UNION ALL SELECT 16, CAST(mx AS BIGINT) FROM q), "
            "c AS (SELECT p, ub, (SELECT count(*) FROM orders "
            "WHERE o_orderkey <= ub) AS cum FROM b) "
            "SELECT CAST(p AS BIGINT) AS bucket_id, ub AS upper_key, "
            "CAST(cum - coalesce(lag(cum) OVER (ORDER BY p), 0) "
            "AS BIGINT) AS n_rows FROM c ORDER BY p"),
        "part_margin_below_retail": (
            "WITH j AS (SELECT p_brand, "
            "CASE WHEN CAST(round(l_extendedprice * 100) AS BIGINT) "
            "// GREATEST(CAST(round(l_quantity) AS BIGINT), 1) "
            "< CAST(round(p_retailprice * 100) AS BIGINT) "
            "THEN 1 ELSE 0 END AS below "
            "FROM lineitem JOIN part ON l_partkey = p_partkey) "
            "SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(sum(below) AS BIGINT) AS n_below, "
            "CAST((1000000 * sum(below)) // GREATEST(count(*), 1) "
            "AS BIGINT) AS below_ppm FROM j GROUP BY 1 ORDER BY 1"),
        "second_order_within30_ppm": (
            "WITH r AS (SELECT o_custkey, o_orderdate, row_number() "
            "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, "
            "o_orderkey) AS rk FROM orders), "
            "p AS (SELECT a.o_custkey, date_diff('day', b.o_orderdate, "
            "a.o_orderdate) AS gap FROM r a JOIN r b "
            "ON a.o_custkey = b.o_custkey AND a.rk = 2 AND b.rk = 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_multi, "
            "CAST(SUM(CASE WHEN gap <= 30 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_within, "
            "CAST(1000000 * SUM(CASE WHEN gap <= 30 THEN 1 ELSE 0 END) "
            "// GREATEST(count(*), 1) AS BIGINT) AS within_ppm FROM p"),
        "distinct_users_multigrain": (
            "SELECT grain, bucket, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ("
            "SELECT 'day' AS grain, date_trunc('day', ts) AS bucket, "
            "user_id FROM events "
            "UNION ALL SELECT 'week', date_trunc('week', ts), user_id "
            "FROM events "
            "UNION ALL SELECT 'month', date_trunc('month', ts), "
            "user_id FROM events) GROUP BY 1, 2 ORDER BY 1, 2"),
        "user_modal_type_churn": (
            "WITH c AS (SELECT user_id, CASE WHEN ts < "
            "TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS half, "
            "event_type, count(*) AS n FROM events GROUP BY 1, 2, 3), "
            "m AS (SELECT user_id, half, event_type, row_number() "
            "OVER (PARTITION BY user_id, half ORDER BY n DESC, "
            "event_type) AS rk FROM c), "
            "t AS (SELECT user_id, half, event_type FROM m "
            "WHERE rk = 1) "
            "SELECT b.event_type AS before_type, "
            "a.event_type AS after_type, "
            "CAST(count(*) AS BIGINT) AS n_users FROM t b "
            "JOIN t a ON b.user_id = a.user_id AND b.half = 0 "
            "AND a.half = 1 GROUP BY 1, 2 ORDER BY 1, 2"),
        "label_inertia_moments": (
            "WITH q AS (SELECT label, r.i AS i, "
            "CAST(round(CAST(embedding[CAST(r.i AS INT)] AS DOUBLE) "
            "* 10000) AS HUGEINT) AS v FROM embeddings "
            "CROSS JOIN range(1, 65) AS r(i)), "
            "d AS (SELECT label, i, SUM(v) AS s, SUM(v * v) AS ss "
            "FROM q GROUP BY 1, 2), "
            "n AS (SELECT label, CAST(count(*) AS HUGEINT) AS n "
            "FROM embeddings GROUP BY 1) "
            "SELECT n.label, CAST(n.n AS BIGINT) AS n_vectors, "
            "CAST(n.n * SUM(d.ss) - SUM(d.s * d.s) AS VARCHAR) "
            "AS inertia_num FROM d JOIN n ON d.label = n.label "
            "GROUP BY n.label, n.n ORDER BY n.label"),
        "event_dow_value_share": (
            "WITH d AS (SELECT isodow(ts) AS isodow, "
            "count(*) AS n_events, "
            "SUM(CAST(round(value * 100) AS BIGINT)) AS value_cents "
            "FROM events GROUP BY 1) "
            "SELECT CAST(isodow AS BIGINT) AS isodow, "
            "CAST(n_events AS BIGINT) AS n_events, "
            "CAST(value_cents AS BIGINT) AS value_cents, "
            "CAST(1000000 * value_cents // GREATEST("
            "(SELECT sum(value_cents) FROM d), 1) AS BIGINT) "
            "AS value_share_ppm FROM d ORDER BY 1"),
        "region_trade_matrix": (
            "SELECT rc.r_name AS cust_region, rs.r_name AS supp_region, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation nc ON c_nationkey = nc.n_nationkey "
            "JOIN region rc ON nc.n_regionkey = rc.r_regionkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ns ON s_nationkey = ns.n_nationkey "
            "JOIN region rs ON ns.n_regionkey = rs.r_regionkey "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "part_supplier_price_spread_hist": (
            "WITH p AS (SELECT l_partkey, l_suppkey, "
            "SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "// GREATEST(SUM(CAST(round(l_quantity) AS BIGINT)), 1) "
            "AS unit FROM lineitem GROUP BY 1, 2), "
            "m AS (SELECT l_partkey, max(unit) - min(unit) AS spread "
            "FROM p GROUP BY 1) "
            "SELECT CASE WHEN spread > 0 THEN "
            "CAST(floor(log2(spread)) AS BIGINT) ELSE -1 END "
            "AS spread_log2, CAST(count(*) AS BIGINT) AS n_parts "
            "FROM m GROUP BY 1 ORDER BY 1"),
        "first_line_dominance_ppm": (
            "WITH o AS (SELECT l_orderkey, "
            "max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS pmax, "
            "max(CASE WHEN l_linenumber = 1 THEN "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "ELSE -1 END) AS p1, count(*) AS n FROM lineitem "
            "GROUP BY 1) "
            "SELECT CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_multi, "
            "CAST(SUM(CASE WHEN n >= 2 AND p1 = pmax THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_dominant, "
            "CAST(1000000 * SUM(CASE WHEN n >= 2 AND p1 = pmax "
            "THEN 1 ELSE 0 END) // GREATEST(SUM(CASE WHEN n >= 2 "
            "THEN 1 ELSE 0 END), 1) AS BIGINT) AS dominance_ppm "
            "FROM o"),
        "source_ttr_ppm": (
            "WITH v AS (SELECT source, token, count(*) AS n FROM ("
            "SELECT source, unnest(string_split(text, ' ')) AS token "
            "FROM documents) GROUP BY 1, 2), "
            "f AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types, "
            "CAST(sum(n) AS BIGINT) AS n_tokens FROM v GROUP BY 1) "
            "SELECT source, n_types, n_tokens, "
            "CAST((1000000 * n_types) // GREATEST(n_tokens, 1) "
            "AS BIGINT) AS ttr_ppm FROM f ORDER BY source"),
        "q4_late_order_share": (
            "WITH w AS (SELECT o_orderkey, o_orderdate, o_orderpriority "
            "FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' "
            "AND o_orderdate < TIMESTAMP '1995-04-01'), "
            "m AS (SELECT o_orderkey, o_orderpriority, "
            "max(CASE WHEN date_diff('day', o_orderdate, l_shipdate) "
            "> 60 THEN 1 ELSE 0 END) AS late FROM w "
            "JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1, 2) "
            "SELECT o_orderpriority, CAST(sum(late) AS BIGINT) "
            "AS n_late_orders FROM m GROUP BY 1 ORDER BY 1"),
        "q22_sales_opportunity": (
            "WITH s AS (SELECT count(*) AS n_pos, "
            "SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_pos "
            "FROM customer WHERE round(c_acctbal * 100) > 0) "
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(count(*) AS BIGINT) AS n_custs, "
            "CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)"
            " AS total_cents FROM customer, s "
            "WHERE CAST(round(c_acctbal * 100) AS BIGINT) * s.n_pos "
            "> s.sum_pos AND c_custkey NOT IN "
            "(SELECT o_custkey FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '2000-01-01') "
            "GROUP BY 1 ORDER BY 1"),
        "supplier_customer_concentration_hist": (
            "WITH p AS (SELECT l_suppkey, o_custkey, "
            "SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS c "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY 1, 2), "
            "m AS (SELECT l_suppkey, max(c) AS top, sum(c) AS total "
            "FROM p GROUP BY 1) "
            "SELECT CAST((1000000 * top // GREATEST(total, 1)) "
            "// 100000 AS BIGINT) AS share_decile, "
            "CAST(count(*) AS BIGINT) AS n_suppliers FROM m "
            "GROUP BY 1 ORDER BY 1"),
        "daily_count_autocorr": (
            "WITH c AS (SELECT date_trunc('day', ts) AS day, "
            "CAST(count(*) AS HUGEINT) AS n FROM events GROUP BY 1) "
            "SELECT CAST(1 AS BIGINT) AS lag_days, "
            "CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(coalesce(count(*) * SUM(a.n * b.n) "
            "- SUM(a.n) * SUM(b.n), 0) AS VARCHAR) AS corr_num "
            "FROM c a JOIN c b ON a.day = b.day + INTERVAL 1 DAY "
            "UNION ALL "
            "SELECT CAST(7 AS BIGINT), CAST(count(*) AS BIGINT), "
            "CAST(coalesce(count(*) * SUM(a.n * b.n) "
            "- SUM(a.n) * SUM(b.n), 0) AS VARCHAR) "
            "FROM c a JOIN c b ON a.day = b.day + INTERVAL 7 DAY "
            "ORDER BY lag_days"),
        "customer_rrf_top10": (
            "WITH a AS (SELECT o_custkey, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents, "
            "count(*) AS n FROM orders GROUP BY 1), "
            "r AS (SELECT o_custkey, "
            "row_number() OVER (ORDER BY cents DESC, o_custkey) AS r1, "
            "row_number() OVER (ORDER BY n DESC, o_custkey) AS r2 "
            "FROM a) "
            "SELECT CAST(o_custkey AS BIGINT) AS o_custkey, "
            "CAST(1000000 // (60 + r1) + 1000000 // (60 + r2) "
            "AS BIGINT) AS rrf_score FROM r "
            "ORDER BY rrf_score DESC, o_custkey LIMIT 10"),
        "coorder_kcore_peel": (
            "WITH e0 AS (SELECT DISTINCT a.l_partkey AS a, "
            "b.l_partkey AS b FROM lineitem a JOIN lineitem b "
            "ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "d1 AS (SELECT node, count(*) AS deg FROM ("
            "SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) "
            "GROUP BY 1), "
            "k1 AS (SELECT node FROM d1 WHERE deg >= 3), "
            "e1 AS (SELECT * FROM e0 WHERE a IN (SELECT node FROM k1) "
            "AND b IN (SELECT node FROM k1)), "
            "d2 AS (SELECT node, count(*) AS deg FROM ("
            "SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1) "
            "GROUP BY 1), "
            "k2 AS (SELECT node FROM d2 WHERE deg >= 3), "
            "e2 AS (SELECT * FROM e1 WHERE a IN (SELECT node FROM k2) "
            "AND b IN (SELECT node FROM k2)) "
            "SELECT CAST(1 AS BIGINT) AS \"round\", "
            "CAST((SELECT count(*) FROM k1) AS BIGINT) AS n_nodes, "
            "CAST((SELECT count(*) FROM e1) AS BIGINT) AS n_edges "
            "UNION ALL SELECT CAST(2 AS BIGINT), "
            "CAST((SELECT count(*) FROM k2) AS BIGINT), "
            "CAST((SELECT count(*) FROM e2) AS BIGINT) "
            "ORDER BY \"round\""),
        "order_fulfill_30d_share_by_month": (
            "WITH m AS (SELECT l_orderkey, "
            "date_trunc('month', o_orderdate) AS month, "
            "max(date_diff('day', o_orderdate, l_shipdate)) AS lag "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY 1, 2) "
            "SELECT month, CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CASE WHEN lag <= 30 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_ok, "
            "CAST((1000000 * SUM(CASE WHEN lag <= 30 THEN 1 ELSE 0 END))"
            " // GREATEST(count(*), 1) AS BIGINT) AS ok_ppm "
            "FROM m GROUP BY 1 ORDER BY 1"),
        "supplier_leadtime_variance_topk": (
            "WITH x AS (SELECT l_suppkey, "
            "date_diff('day', o_orderdate, l_shipdate) AS d "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), "
            "m AS (SELECT l_suppkey, count(*) AS n, "
            "SUM(CAST(d AS HUGEINT)) AS s, "
            "SUM(CAST(d AS HUGEINT) * d) AS ss FROM x GROUP BY 1) "
            "SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey, "
            "CAST(n AS BIGINT) AS n_lines, "
            "CAST(n * ss - s * s AS VARCHAR) AS var_num FROM m "
            "ORDER BY n * ss - s * s DESC, l_suppkey LIMIT 10"),
        "daily_type_mix_l1": (
            "WITH c AS (SELECT date_trunc('day', ts) AS day, "
            "event_type, count(*) AS n FROM events GROUP BY 1, 2), "
            "t AS (SELECT day, sum(n) AS nd, "
            "row_number() OVER (ORDER BY day) AS rk FROM c GROUP BY 1), "
            "p AS (SELECT a.day AS day, a.nd AS nd, b.day AS pday, "
            "b.nd AS np FROM t a JOIN t b ON a.rk = b.rk + 1), "
            "ty AS (SELECT DISTINCT event_type FROM c) "
            "SELECT p.day, CAST((1000000 * sum(abs("
            "coalesce(cd.n, 0) * p.np - coalesce(cp.n, 0) * p.nd))) "
            "// (p.nd * p.np) AS BIGINT) AS l1_ppm "
            "FROM p CROSS JOIN ty "
            "LEFT JOIN c cd ON cd.day = p.day "
            "AND cd.event_type = ty.event_type "
            "LEFT JOIN c cp ON cp.day = p.pday "
            "AND cp.event_type = ty.event_type "
            "GROUP BY p.day, p.nd, p.np ORDER BY p.day"),
        "order_dup_part_lines": (
            "WITH p AS (SELECT l_orderkey, l_partkey, count(*) AS n "
            "FROM lineitem GROUP BY 1, 2), "
            "d AS (SELECT * FROM p WHERE n > 1) "
            "SELECT CAST((SELECT count(*) FROM d) AS BIGINT) "
            "AS n_dup_pairs, "
            "CAST((SELECT COALESCE(SUM(n - 1), 0) FROM d) AS BIGINT) "
            "AS n_extra_lines, "
            "CAST((SELECT count(DISTINCT l_orderkey) FROM d) "
            "AS BIGINT) AS n_orders_affected"),
        "token_lifetime_hist": (
            "WITH s AS (SELECT tok, max(doc_id) - min(doc_id) AS life "
            "FROM (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS tok FROM documents) GROUP BY 1) "
            "SELECT CASE WHEN life > 0 THEN "
            "CAST(floor(log2(life)) AS BIGINT) ELSE -1 END AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_tokens FROM s GROUP BY 1"),
        "value_nextgap_cov": (
            "WITH o AS (SELECT user_id, "
            "CAST(round(value * 100) AS BIGINT) AS x, "
            "epoch_us(lead(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id)) - epoch_us(ts) AS y FROM events), "
            "k AS (SELECT x, y FROM o WHERE y IS NOT NULL) "
            "SELECT CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(COALESCE(CAST(count(*) AS HUGEINT) "
            "* SUM(CAST(x AS HUGEINT) * y) "
            "- CAST(SUM(x) AS HUGEINT) * SUM(y), 0) AS VARCHAR) "
            "AS cov_num FROM k"),
        "nation_entity_balance": (
            "WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nk, "
            "count(*) AS n FROM customer GROUP BY 1), "
            "s AS (SELECT CAST(s_nationkey AS BIGINT) AS nk, "
            "count(*) AS n FROM supplier GROUP BY 1), "
            "nats AS (SELECT DISTINCT nk FROM (SELECT nk FROM c "
            "UNION ALL SELECT nk FROM s)) "
            "SELECT nats.nk AS nationkey, "
            "CAST(COALESCE(c.n, 0) AS BIGINT) AS n_customers, "
            "CAST(COALESCE(s.n, 0) AS BIGINT) AS n_suppliers, "
            "CAST((1000000 * COALESCE(c.n, 0)) // GREATEST("
            "COALESCE(c.n, 0) + COALESCE(s.n, 0), 1) AS BIGINT) "
            "AS customer_ppm FROM nats "
            "LEFT JOIN c ON c.nk = nats.nk "
            "LEFT JOIN s ON s.nk = nats.nk"),
        "session_position_type_matrix": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - "
            "epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END "
            "AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, ts, event_id, event_type, "
            "sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "r AS (SELECT event_type, row_number() OVER ("
            "PARTITION BY user_id, sid ORDER BY ts, event_id) AS rf, "
            "row_number() OVER (PARTITION BY user_id, sid "
            "ORDER BY ts DESC, event_id DESC) AS rl, "
            "count(*) OVER (PARTITION BY user_id, sid) AS sz FROM s), "
            "c AS (SELECT CASE WHEN sz = 1 THEN 'solo' "
            "WHEN rf = 1 THEN 'first' WHEN rl = 1 THEN 'last' "
            "ELSE 'middle' END AS position, event_type FROM r) "
            "SELECT position, event_type, "
            "CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1, 2"),
        "discount_ladder": (
            "WITH c AS (SELECT CAST(round(l_quantity) AS BIGINT) // 10 "
            "AS bracket, CAST(round(l_discount * 100) AS BIGINT) "
            "AS disc_cents, count(*) AS n FROM lineitem GROUP BY 1, 2), "
            "r AS (SELECT bracket, disc_cents, n, row_number() OVER ("
            "PARTITION BY bracket ORDER BY n DESC, disc_cents) AS rn "
            "FROM c) "
            "SELECT bracket, disc_cents AS modal_discount_cents, "
            "CAST(n AS BIGINT) AS n_lines FROM r WHERE rn = 1"),
        "lang_length_mix_l1": (
            "WITH c AS (SELECT lang, CASE WHEN n_chars > 0 THEN "
            "CAST(floor(log2(n_chars)) AS BIGINT) ELSE -1 END "
            "AS bucket, count(*) AS n FROM documents GROUP BY 1, 2), "
            "langs AS (SELECT DISTINCT lang FROM c), "
            "bkts AS (SELECT DISTINCT bucket FROM c), "
            "grid AS (SELECT langs.lang, bkts.bucket, "
            "COALESCE(c.n, 0) AS n FROM langs CROSS JOIN bkts "
            "LEFT JOIN c ON c.lang = langs.lang "
            "AND c.bucket = bkts.bucket), "
            "gl AS (SELECT bucket, SUM(n) AS g FROM grid GROUP BY 1), "
            "tm AS (SELECT SUM(n) AS tg FROM grid), "
            "tl AS (SELECT lang, SUM(n) AS t FROM grid GROUP BY 1) "
            "SELECT grid.lang, CAST(tl.t AS BIGINT) AS n_docs, "
            "CAST(SUM(abs(CAST(grid.n AS HUGEINT) * tm.tg "
            "- CAST(gl.g AS HUGEINT) * tl.t)) AS DOUBLE) AS l1_num "
            "FROM grid JOIN gl ON gl.bucket = grid.bucket "
            "JOIN tl ON tl.lang = grid.lang, tm GROUP BY 1, 2"),
        "first_event_purchase_share": (
            "WITH f AS (SELECT user_id, event_type, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS rn "
            "FROM events) "
            "SELECT CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_cold_purchasers, "
            "CAST((1000000 * SUM(CASE WHEN event_type = 'purchase' "
            "THEN 1 ELSE 0 END)) // GREATEST(count(*), 1) AS BIGINT) "
            "AS cold_ppm FROM f WHERE rn = 1"),
        "part_reorder_gap_hist": (
            "WITH d AS (SELECT DISTINCT l_partkey, "
            "CAST(l_shipdate AS DATE) AS day FROM lineitem), "
            "g AS (SELECT day - lag(day) OVER (PARTITION BY l_partkey "
            "ORDER BY day) AS gap FROM d) "
            "SELECT CAST(floor(log2(gap)) AS BIGINT) AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_gaps FROM g "
            "WHERE gap IS NOT NULL GROUP BY 1"),
        "session_3step_funnel": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - "
            "epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END "
            "AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, ts, event_id, event_type, "
            "sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM o), "
            "fv AS (SELECT user_id, sid, MIN(rn) AS v FROM s "
            "WHERE event_type = 'view' GROUP BY 1, 2), "
            "fc AS (SELECT s.user_id, s.sid, MIN(s.rn) AS c FROM s "
            "JOIN fv ON fv.user_id = s.user_id AND fv.sid = s.sid "
            "WHERE s.event_type = 'click' AND s.rn > fv.v "
            "GROUP BY 1, 2), "
            "fp AS (SELECT s.user_id, s.sid FROM s "
            "JOIN fc ON fc.user_id = s.user_id AND fc.sid = s.sid "
            "WHERE s.event_type = 'purchase' AND s.rn > fc.c "
            "GROUP BY 1, 2) "
            "SELECT CAST((SELECT count(*) FROM (SELECT DISTINCT "
            "user_id, sid FROM s)) AS BIGINT) AS n_sessions, "
            "CAST((SELECT count(*) FROM fv) AS BIGINT) "
            "AS n_view_sessions, "
            "CAST((SELECT count(*) FROM fp) AS BIGINT) "
            "AS n_full_funnel"),
        "corpus_simpson_index": (
            "WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n "
            "FROM (SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1) "
            "SELECT CAST(SUM(n) AS BIGINT) AS n_occurrences, "
            "CAST(SUM(n * n) AS BIGINT) AS sum_f2, "
            "CAST(count(*) AS BIGINT) AS n_types FROM c"),
        "supplier_share_movers": (
            "WITH a AS (SELECT l_suppkey, "
            "SUM(CASE WHEN year(l_shipdate) < 1998 THEN "
            "CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) "
            "AS cb, "
            "SUM(CASE WHEN year(l_shipdate) >= 1998 THEN "
            "CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) "
            "AS ca FROM lineitem GROUP BY 1), "
            "t AS (SELECT SUM(cb) AS tb, SUM(ca) AS ta FROM a), "
            "sh AS (SELECT a.l_suppkey, "
            "(1000000 * a.cb) // GREATEST(t.tb, 1) AS sb, "
            "(1000000 * a.ca) // GREATEST(t.ta, 1) AS sa FROM a, t) "
            "SELECT l_suppkey, CAST(sb AS BIGINT) AS share_before_ppm, "
            "CAST(sa AS BIGINT) AS share_after_ppm, "
            "CAST(sa - sb AS BIGINT) AS delta_ppm FROM sh "
            "ORDER BY abs(sa - sb) DESC, l_suppkey LIMIT 10"),
        "popular_part_antipairs": (
            "WITH top AS (SELECT l_partkey FROM (SELECT l_partkey, "
            "count(*) AS n FROM lineitem GROUP BY 1) "
            "ORDER BY n DESC, l_partkey LIMIT 20), "
            "op AS (SELECT DISTINCT l.l_orderkey, l.l_partkey "
            "FROM lineitem l JOIN top ON l.l_partkey = top.l_partkey), "
            "seen AS (SELECT DISTINCT a.l_partkey AS u, "
            "b.l_partkey AS v FROM op a "
            "JOIN op b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey) "
            "SELECT a.l_partkey AS part_a, b.l_partkey AS part_b "
            "FROM top a JOIN top b ON a.l_partkey < b.l_partkey "
            "LEFT JOIN seen ON seen.u = a.l_partkey "
            "AND seen.v = b.l_partkey WHERE seen.u IS NULL"),
        "purchase_hazard_table": (
            "WITH p AS (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'purchase'), "
            "g AS (SELECT (epoch_us(ts) - epoch_us(lag(ts) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id))) "
            "// 86400000000 AS gd FROM p), "
            "h AS (SELECT gd FROM g WHERE gd IS NOT NULL), "
            "ks AS (SELECT unnest(range(1, 8)) AS k) "
            "SELECT CAST(ks.k AS BIGINT) AS k_days, "
            "CAST(COALESCE(SUM(CASE WHEN h.gd >= ks.k - 1 THEN 1 "
            "ELSE 0 END), 0) AS BIGINT) AS n_at_risk, "
            "CAST(COALESCE(SUM(CASE WHEN h.gd = ks.k - 1 THEN 1 "
            "ELSE 0 END), 0) AS BIGINT) AS n_events, "
            "CAST((SELECT count(*) FROM h) AS BIGINT) "
            "AS n_gaps_total FROM ks LEFT JOIN h ON TRUE GROUP BY 1"),
        "score_calibration_lift": (
            "WITH u AS (SELECT user_id, "
            "SUM(CASE WHEN ts < TIMESTAMP '2024-01-21' THEN "
            "CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS score, "
            "SUM(CASE WHEN ts >= TIMESTAMP '2024-01-21' THEN "
            "CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS future "
            "FROM events GROUP BY 1), "
            "r AS (SELECT score, future, row_number() OVER ("
            "ORDER BY score, user_id) - 1 AS rnk, "
            "(SELECT count(*) FROM u) AS total FROM u), "
            "d AS (SELECT (10 * rnk) // total AS decile, future FROM r) "
            "SELECT CAST(decile AS BIGINT) AS decile, "
            "CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(SUM(future) AS BIGINT) AS future_cents "
            "FROM d GROUP BY 1"),
        "unattributed_purchase_share": (
            "WITH p AS (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'purchase'), "
            "att AS (SELECT p.user_id, p.event_id FROM p "
            "JOIN events n ON n.user_id = p.user_id "
            "AND n.event_type <> 'purchase' "
            "AND (n.ts < p.ts OR (n.ts = p.ts "
            "AND n.event_id < p.event_id)) "
            "AND epoch_us(n.ts) >= epoch_us(p.ts) - 86400000000 "
            "GROUP BY 1, 2) "
            "SELECT CAST((SELECT count(*) FROM p) AS BIGINT) "
            "AS n_purchases, "
            "CAST((SELECT count(*) FROM p) "
            "- (SELECT count(*) FROM att) AS BIGINT) "
            "AS n_unattributed, "
            "CAST((1000000 * ((SELECT count(*) FROM p) "
            "- (SELECT count(*) FROM att))) "
            "// GREATEST((SELECT count(*) FROM p), 1) AS BIGINT) "
            "AS unattributed_ppm"),
        "nation_dow_mix_l1": (
            "WITH c AS (SELECT CAST(cu.c_nationkey AS BIGINT) AS nk, "
            "CAST(isodow(o.o_orderdate) AS BIGINT) AS dow, "
            "count(*) AS n FROM orders o "
            "JOIN customer cu ON o.o_custkey = cu.c_custkey "
            "GROUP BY 1, 2), "
            "nats AS (SELECT DISTINCT nk FROM c), "
            "dows AS (SELECT unnest(range(1, 8)) AS dow), "
            "grid AS (SELECT nats.nk, dows.dow, COALESCE(c.n, 0) AS n "
            "FROM nats CROSS JOIN dows "
            "LEFT JOIN c ON c.nk = nats.nk AND c.dow = dows.dow), "
            "gl AS (SELECT dow, SUM(n) AS g FROM grid GROUP BY 1), "
            "tm AS (SELECT SUM(n) AS tg FROM grid), "
            "tn AS (SELECT nk, SUM(n) AS t FROM grid GROUP BY 1) "
            "SELECT grid.nk AS nationkey, "
            "CAST(tn.t AS BIGINT) AS n_orders, "
            "CAST(SUM(abs(CAST(grid.n AS HUGEINT) * tm.tg "
            "- CAST(gl.g AS HUGEINT) * tn.t)) AS DOUBLE) AS l1_num "
            "FROM grid JOIN gl ON gl.dow = grid.dow "
            "JOIN tn ON tn.nk = grid.nk, tm GROUP BY 1, 2"),
        "nation_median_of_customer_medians": (
            "WITH cm AS (SELECT o_custkey, quantile_disc("
            "CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS med "
            "FROM orders GROUP BY 1) "
            "SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey, "
            "CAST(quantile_disc(cm.med, 0.5) AS BIGINT) "
            "AS median_of_medians_cents, "
            "CAST(count(*) AS BIGINT) AS n_customers FROM cm "
            "JOIN customer c ON c.c_custkey = cm.o_custkey "
            "GROUP BY 1"),
        "frequent_part_triples": (
            "WITH op AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "t AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, "
            "c.l_partkey AS pc, count(*) AS n FROM op a "
            "JOIN op b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey "
            "JOIN op c ON a.l_orderkey = c.l_orderkey "
            "AND b.l_partkey < c.l_partkey GROUP BY 1, 2, 3) "
            "SELECT pa AS part_a, pb AS part_b, pc AS part_c, "
            "CAST(n AS BIGINT) AS n_orders FROM t WHERE n >= 2 "
            "ORDER BY n DESC, pa, pb, pc LIMIT 5"),
        "user_value_temporal_spearman": (
            "WITH u AS (SELECT user_id, "
            "SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN "
            "CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS cb, "
            "SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN "
            "CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS ca, "
            "SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 "
            "ELSE 0 END) AS nb, "
            "SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 "
            "ELSE 0 END) AS na FROM events GROUP BY 1), "
            "k AS (SELECT user_id, cb, ca FROM u "
            "WHERE nb > 0 AND na > 0), "
            "r AS (SELECT row_number() OVER ("
            "ORDER BY cb DESC, user_id) AS r1, row_number() OVER ("
            "ORDER BY ca DESC, user_id) AS r2 FROM k) "
            "SELECT CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(COALESCE(SUM((r1 - r2) * (r1 - r2)), 0) AS BIGINT) "
            "AS sum_d2 FROM r"),
        "stream_outage_audit": (
            "WITH m AS (SELECT DISTINCT date_trunc('minute', ts) "
            "AS minute FROM events), "
            "g AS (SELECT (epoch_us(minute) - epoch_us(lag(minute) "
            "OVER (ORDER BY minute))) // 60000000 - 1 AS gap FROM m) "
            "SELECT CAST((SELECT count(*) FROM m) AS BIGINT) "
            "AS n_active_minutes, "
            "CAST(COALESCE(SUM(CASE WHEN gap >= 60 THEN 1 ELSE 0 "
            "END), 0) AS BIGINT) AS n_outages, "
            "CAST(COALESCE(MAX(gap), 0) AS BIGINT) "
            "AS longest_gap_minutes FROM g WHERE gap IS NOT NULL"),
        "price_fd_violations": (
            "WITH d AS (SELECT DISTINCT p_brand, p_size, "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS cents "
            "FROM part), "
            "g AS (SELECT p_brand, p_size, count(*) AS np FROM d "
            "GROUP BY 1, 2) "
            "SELECT CAST(count(*) AS BIGINT) AS n_groups, "
            "CAST(SUM(CASE WHEN np > 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_violating FROM g"),
        "worst_5day_window": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1), "
            "b AS (SELECT min(day) AS lo, max(day) AS hi FROM d), "
            "spine AS (SELECT CAST(unnest(generate_series(lo, hi, "
            "INTERVAL 1 DAY)) AS DATE) AS day FROM b), "
            "dense AS (SELECT spine.day, COALESCE(d.cents, 0) AS cents "
            "FROM spine LEFT JOIN d ON spine.day = d.day), "
            "w AS (SELECT day, SUM(cents) OVER (ORDER BY day "
            "ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS s, "
            "row_number() OVER (ORDER BY day DESC) AS from_end "
            "FROM dense), "
            "v AS (SELECT day, s FROM w WHERE from_end >= 5 "
            "UNION ALL SELECT day, s FROM w WHERE "
            "(SELECT count(*) FROM dense) < 5 AND from_end = "
            "(SELECT count(*) FROM dense)) "
            "SELECT CAST(day AS TIMESTAMP) AS start_day, "
            "CAST(s AS BIGINT) AS window_cents FROM v "
            "ORDER BY s, day LIMIT 1"),
        "snapshot_staleness_by_type": (
            "WITH l AS (SELECT event_type, "
            "epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY) "
            "- epoch_us(ts) AS d FROM events) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(SUM(d) AS BIGINT) AS total_lag_us, "
            "CAST(MAX(d) AS BIGINT) AS max_lag_us FROM l GROUP BY 1"),
        "premium_sku_counts": (
            "WITH c AS (SELECT p_brand, "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS cents "
            "FROM part), "
            "q AS (SELECT p_brand, quantile_disc(cents, 0.9) AS p90 "
            "FROM c GROUP BY 1) "
            "SELECT c.p_brand, CAST(count(*) AS BIGINT) AS n_parts, "
            "CAST(SUM(CASE WHEN c.cents > q.p90 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_premium, "
            "CAST(MIN(q.p90) AS BIGINT) AS p90_cents FROM c "
            "JOIN q ON q.p_brand = c.p_brand GROUP BY 1"),
        "monthly_value_p90": (
            "SELECT strftime(date_trunc('month', o_orderdate), "
            "'%Y-%m') AS month, 0.9 AS q, "
            "CAST(quantile_disc(CAST(round(o_totalprice * 100) "
            "AS BIGINT), 0.9) AS DOUBLE) AS value "
            "FROM orders GROUP BY 1"),
        "intermittent_parts": (
            "WITH py AS (SELECT DISTINCT l_partkey, "
            "CAST(year(l_shipdate) AS BIGINT) AS y FROM lineitem), "
            "h AS (SELECT a.l_partkey, count(*) AS holes FROM py a "
            "JOIN py b ON a.l_partkey = b.l_partkey "
            "AND b.y = a.y + 2 "
            "LEFT JOIN py c ON c.l_partkey = a.l_partkey "
            "AND c.y = a.y + 1 "
            "WHERE c.l_partkey IS NULL GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_intermittent_parts, "
            "CAST(COALESCE(SUM(holes), 0) AS BIGINT) AS n_gap_years "
            "FROM h"),
        "customer_top2_gap_hist": (
            "WITH r AS (SELECT o_custkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS c, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY round(o_totalprice * 100) DESC) AS rn "
            "FROM orders), "
            "g AS (SELECT a.c - b.c AS gap FROM r a "
            "JOIN r b ON a.o_custkey = b.o_custkey "
            "AND a.rn = 1 AND b.rn = 2) "
            "SELECT CASE WHEN gap > 0 THEN "
            "CAST(floor(log2(gap)) AS BIGINT) ELSE -1 END AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_customers FROM g "
            "GROUP BY 1"),
        "duplicate_order_suspects": (
            "WITH g AS (SELECT o_custkey, "
            "date_trunc('day', o_orderdate) AS day, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents, "
            "count(*) AS n FROM orders GROUP BY 1, 2, 3), "
            "s AS (SELECT * FROM g WHERE n >= 2) "
            "SELECT CAST(count(*) AS BIGINT) AS n_suspect_groups, "
            "CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_suspect_orders "
            "FROM s"),
        "monetization_by_activity_decile": (
            "WITH u AS (SELECT user_id, count(*) AS ne, "
            "SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
            "AS np FROM events GROUP BY 1), "
            "r AS (SELECT ne, np, row_number() OVER ("
            "ORDER BY ne, user_id) - 1 AS rnk, "
            "(SELECT count(*) FROM u) AS total FROM u), "
            "d AS (SELECT (10 * rnk) // total AS decile, ne, np FROM r) "
            "SELECT CAST(decile AS BIGINT) AS decile, "
            "CAST(SUM(ne) AS BIGINT) AS n_events, "
            "CAST(SUM(np) AS BIGINT) AS n_purchases, "
            "CAST((1000000 * SUM(np)) // GREATEST(SUM(ne), 1) "
            "AS BIGINT) AS purchase_ppm FROM d GROUP BY 1"),
        "bigram_holdout_coverage": (
            "WITH b AS (SELECT CASE WHEN substr(md5("
            "CAST(doc_id AS VARCHAR)), 1, 1) = '0' THEN 1 ELSE 0 END "
            "AS is_test, toks[i] || ' ' || toks[i + 1] AS bigram "
            "FROM (SELECT doc_id, string_split(text, ' ') AS toks "
            "FROM documents), unnest(range(1, len(toks))) t(i)), "
            "g AS (SELECT bigram, MAX(1 - is_test) AS in_train, "
            "MAX(is_test) AS in_test FROM b GROUP BY 1) "
            "SELECT CAST(SUM(in_test) AS BIGINT) AS n_test_bigrams, "
            "CAST(SUM(in_test * in_train) AS BIGINT) AS n_seen, "
            "CAST((1000000 * SUM(in_test * in_train)) "
            "// GREATEST(SUM(in_test), 1) AS BIGINT) AS coverage_ppm "
            "FROM g"),
        "error_rate_churn_matrix": (
            "WITH u AS (SELECT user_id, count(*) AS n, "
            "SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
            "AS ne, max(ts) AS last FROM events GROUP BY 1), "
            "m AS (SELECT max(last) AS mx FROM u), "
            "c AS (SELECT ((1000000 * u.ne) // GREATEST(u.n, 1)) "
            "// 100000 AS err_bucket, CASE WHEN epoch_us(u.last) < "
            "epoch_us(m.mx) - 2592000000000 THEN 'stale' ELSE 'active' "
            "END AS status FROM u, m) "
            "SELECT CAST(err_bucket AS BIGINT) AS err_bucket, status, "
            "CAST(count(*) AS BIGINT) AS n_users FROM c GROUP BY 1, 2"),
        "boilerplate_prefix_docs": (
            "WITH p AS (SELECT source, array_to_string(list_slice("
            "string_split(text, ' '), 1, 3), ' ') AS prefix "
            "FROM documents), "
            "big AS (SELECT prefix FROM p GROUP BY 1 "
            "HAVING count(*) >= 5) "
            "SELECT p.source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(CASE WHEN p.prefix IN (SELECT prefix FROM big) "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged "
            "FROM p GROUP BY 1"),
        "segment_staleness_matrix": (
            "WITH l AS (SELECT o_custkey, "
            "CAST(max(o_orderdate) AS DATE) AS lo FROM orders "
            "GROUP BY 1), "
            "m AS (SELECT max(lo) AS mx FROM l), "
            "t AS (SELECT c.c_mktsegment AS segment, "
            "CASE WHEN m.mx - l.lo < 365 THEN 'hot' "
            "WHEN m.mx - l.lo < 730 THEN 'warm' ELSE 'cold' END "
            "AS tier FROM l "
            "JOIN customer c ON c.c_custkey = l.o_custkey, m) "
            "SELECT segment, tier, CAST(count(*) AS BIGINT) "
            "AS n_customers FROM t GROUP BY 1, 2"),
        "coorder_largest_component": (
            "WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey, "
            "l_partkey FROM lineitem), "
            "e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "nodes AS (SELECT DISTINCT node FROM ("
            "SELECT u AS node FROM e UNION ALL SELECT v FROM e)), "
            "sym AS (SELECT u, v FROM e UNION ALL "
            "SELECT v, u FROM e), "
            "reach AS (SELECT node, node AS m FROM nodes "
            "UNION SELECT sym.v AS node, reach.m FROM reach "
            "JOIN sym ON sym.u = reach.node AND reach.m < sym.v), "
            "comp AS (SELECT node, MIN(m) AS c FROM reach GROUP BY 1), "
            "s AS (SELECT c, count(*) AS sz FROM comp GROUP BY 1) "
            "SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) "
            "AS n_nodes, "
            "CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges, "
            "CAST((SELECT count(*) FROM s) AS BIGINT) "
            "AS n_components, "
            "CAST((SELECT COALESCE(max(sz), 0) FROM s) AS BIGINT) "
            "AS lcc_size"),
        "core_vocab_mass_ppm": (
            "WITH c AS (SELECT tok, lang, count(*) AS n FROM ("
            "SELECT lang, unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1, 2), "
            "t AS (SELECT tok, SUM(n) AS n, count(*) AS nl "
            "FROM c GROUP BY 1), "
            "k AS (SELECT count(DISTINCT lang) AS k FROM documents) "
            "SELECT CAST(SUM(t.n) AS BIGINT) AS n_occurrences, "
            "CAST(SUM(CASE WHEN t.nl = k.k THEN t.n ELSE 0 END) "
            "AS BIGINT) AS core_occurrences, "
            "CAST(SUM(CASE WHEN t.nl = k.k THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_core_tokens, "
            "CAST((1000000 * SUM(CASE WHEN t.nl = k.k THEN t.n "
            "ELSE 0 END)) // GREATEST(SUM(t.n), 1) AS BIGINT) "
            "AS core_mass_ppm FROM t, k GROUP BY k.k"),
        "props_k_value_cov": (
            "WITH e AS (SELECT event_type, "
            "CAST(regexp_extract(props, '\"k\": (-?\\d+)', 1) "
            "AS BIGINT) AS k, "
            "CAST(round(value * 100) AS BIGINT) AS v FROM events) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(*) * SUM(k * v) - SUM(k) * SUM(v) AS DOUBLE) "
            "AS cov_num FROM e GROUP BY 1"),
        "same_day_repeat_buyers": (
            "WITH p AS (SELECT o_custkey, "
            "date_trunc('day', o_orderdate) AS day, count(*) AS n "
            "FROM orders GROUP BY 1, 2), "
            "r AS (SELECT * FROM p WHERE n >= 2) "
            "SELECT CAST(count(*) AS BIGINT) "
            "AS n_repeat_customer_days, "
            "CAST(count(DISTINCT o_custkey) AS BIGINT) "
            "AS n_repeat_customers FROM r"),
        "repdigit_value_audit": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CASE WHEN CAST(round(value * 100) AS BIGINT) IN "
            "(1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 22, 33, 44, 55, 66, 77, 88, 99, 111, 222, 333, 444, 555, 666, 777, 888, 999, 1111, 2222, 3333, 4444, 5555, 6666, 7777, 8888, 9999, 11111, 22222, 33333, 44444, 55555, 66666, 77777, 88888, 99999, 111111, 222222, 333333, 444444, 555555, 666666, 777777, 888888, 999999, 1111111, 2222222, 3333333, 4444444, 5555555, 6666666, 7777777, 8888888, 9999999, 11111111, 22222222, 33333333, 44444444, 55555555, 66666666, 77777777, 88888888, 99999999, 111111111, 222222222, 333333333, 444444444, 555555555, 666666666, 777777777, 888888888, 999999999, 1111111111, 2222222222, 3333333333, 4444444444, 5555555555, 6666666666, 7777777777, 8888888888, 9999999999, 11111111111, 22222222222, 33333333333, 44444444444, 55555555555, 66666666666, 77777777777, 88888888888, 99999999999, 111111111111, 222222222222, 333333333333, 444444444444, 555555555555, 666666666666, 777777777777, 888888888888, 999999999999, 1111111111111, 2222222222222, 3333333333333, 4444444444444, 5555555555555, 6666666666666, 7777777777777, 8888888888888, 9999999999999, 11111111111111, 22222222222222, 33333333333333, 44444444444444, 55555555555555, 66666666666666, 77777777777777, 88888888888888, 99999999999999, 111111111111111, 222222222222222, 333333333333333, 444444444444444, 555555555555555, 666666666666666, 777777777777777, 888888888888888, 999999999999999) THEN 1 ELSE 0 END) AS BIGINT) AS n_repdigit "
            "FROM events GROUP BY 1"),
        "alert_2of3_low_days": (
            "WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1), "
            "m AS (SELECT count(*) AS n, SUM(cents) AS s FROM d), "
            "l AS (SELECT day, CASE WHEN CAST(cents AS HUGEINT) * m.n "
            "< m.s THEN 1 ELSE 0 END AS low FROM d, m), "
            "a AS (SELECT l1.day, l1.low + COALESCE(l2.low, 0) "
            "+ COALESCE(l3.low, 0) AS c FROM l l1 "
            "LEFT JOIN l l2 ON l2.day = l1.day - INTERVAL 1 DAY "
            "LEFT JOIN l l3 ON l3.day = l1.day - INTERVAL 2 DAY) "
            "SELECT CAST((SELECT count(*) FROM d) AS BIGINT) "
            "AS n_days, "
            "CAST((SELECT SUM(low) FROM l) AS BIGINT) AS n_low_days, "
            "CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_alert_days FROM a"),
        "zorder_locality_audit": (
            "WITH b AS (SELECT o_custkey AS c, "
            "CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' "
            "AS BIGINT) AS d FROM orders), "
            "zz AS (SELECT ((((d >> 0) & 1) << 0) + (((c >> 0) & 1) << 1) + (((d >> 1) & 1) << 2) + (((c >> 1) & 1) << 3) + (((d >> 2) & 1) << 4) + (((c >> 2) & 1) << 5) + (((d >> 3) & 1) << 6) + (((c >> 3) & 1) << 7) + (((d >> 4) & 1) << 8) + (((c >> 4) & 1) << 9) + (((d >> 5) & 1) << 10) + (((c >> 5) & 1) << 11) + (((d >> 6) & 1) << 12) + (((c >> 6) & 1) << 13) + (((d >> 7) & 1) << 14) + (((c >> 7) & 1) << 15) + (((d >> 8) & 1) << 16) + (((c >> 8) & 1) << 17) + (((d >> 9) & 1) << 18) + (((c >> 9) & 1) << 19) + (((d >> 10) & 1) << 20) + (((c >> 10) & 1) << 21) + (((d >> 11) & 1) << 22) + (((c >> 11) & 1) << 23) + (((d >> 12) & 1) << 24) + (((c >> 12) & 1) << 25) + (((d >> 13) & 1) << 26) + (((c >> 13) & 1) << 27) + (((d >> 14) & 1) << 28) + (((c >> 14) & 1) << 29) + (((d >> 15) & 1) << 30) + (((c >> 15) & 1) << 31) + (((d >> 16) & 1) << 32) + (((c >> 16) & 1) << 33) + (((d >> 17) & 1) << 34) + (((c >> 17) & 1) << 35) + (((d >> 18) & 1) << 36) + (((c >> 18) & 1) << 37) + (((d >> 19) & 1) << 38) + (((c >> 19) & 1) << 39)) AS z, d, c FROM b), "
            "ch AS (SELECT z >> 30 AS chunk, min(d) AS dmn, "
            "max(d) AS dmx, min(c) AS kmn, max(c) AS kmx, "
            "count(*) AS n FROM zz GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_chunks, "
            "CAST(SUM(dmx - dmn) AS BIGINT) AS sum_day_span, "
            "CAST(SUM(kmx - kmn) AS BIGINT) AS sum_key_span, "
            "CAST(SUM(n) AS BIGINT) AS n_rows FROM ch"),
        "lang_hapax_tail_mass": (
            "WITH c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) "
            "AS n FROM (SELECT lang, "
            "unnest(string_split(text, ' ')) AS tok FROM documents) "
            "GROUP BY 1, 2) "
            "SELECT lang, CAST(SUM(n) AS BIGINT) AS n_occurrences, "
            "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_hapax, "
            "CAST((1000000 * SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)) "
            "// GREATEST(SUM(n), 1) AS BIGINT) AS tail_ppm "
            "FROM c GROUP BY 1"),
        "value_split_retention": (
            "WITH u AS (SELECT user_id, "
            "SUM(CAST(round(value * 100) AS BIGINT)) AS cents, "
            "max(ts) AS last FROM events GROUP BY 1), "
            "m AS (SELECT quantile_disc(cents, 0.5) AS med, "
            "max(last) AS mx FROM u), "
            "c AS (SELECT CASE WHEN u.cents > m.med THEN 'high' "
            "ELSE 'low' END AS segment, CASE WHEN epoch_us(u.last) >= "
            "epoch_us(m.mx) - 2592000000000 THEN 1 ELSE 0 END AS act "
            "FROM u, m) "
            "SELECT segment, CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(SUM(act) AS BIGINT) AS n_retained, "
            "CAST((1000000 * SUM(act)) // GREATEST(count(*), 1) "
            "AS BIGINT) AS retention_ppm FROM c GROUP BY 1"),
        "priority_multiline_share": (
            "WITH po AS (SELECT l_orderkey, count(*) AS nl "
            "FROM lineitem GROUP BY 1), "
            "j AS (SELECT o.o_orderpriority AS priority, po.nl "
            "FROM po JOIN orders o ON po.l_orderkey = o.o_orderkey) "
            "SELECT priority, CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CASE WHEN nl > 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_multi, "
            "CAST((1000000 * SUM(CASE WHEN nl > 1 THEN 1 ELSE 0 END)) "
            "// GREATEST(count(*), 1) AS BIGINT) AS multi_ppm "
            "FROM j GROUP BY 1"),
        "popularity_rec_hit_at10": (
            "WITH lo AS (SELECT o_custkey, o_orderkey, row_number() "
            "OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, "
            "o_orderkey DESC) AS rn, count(*) OVER ("
            "PARTITION BY o_custkey) AS nc FROM orders), "
            "last AS (SELECT o_orderkey, nc FROM lo WHERE rn = 1), "
            "train AS (SELECT l_partkey, count(*) AS n FROM lineitem "
            "WHERE l_orderkey NOT IN (SELECT o_orderkey FROM last) "
            "GROUP BY 1), "
            "top AS (SELECT l_partkey FROM train "
            "ORDER BY n DESC, l_partkey LIMIT 10), "
            "ev AS (SELECT o_orderkey FROM last WHERE nc >= 2), "
            "ho AS (SELECT l.l_orderkey, MAX(CASE WHEN l.l_partkey IN "
            "(SELECT l_partkey FROM top) THEN 1 ELSE 0 END) AS hit "
            "FROM lineitem l JOIN ev ON l.l_orderkey = ev.o_orderkey "
            "GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_eval_customers, "
            "CAST(SUM(hit) AS BIGINT) AS n_hits, "
            "CAST((1000000 * SUM(hit)) // GREATEST(count(*), 1) "
            "AS BIGINT) AS hit_ppm FROM ho"),
        "order_rolling_rank_counts": (
            "WITH r AS (SELECT o_custkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS c, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) AS rn FROM orders), "
            "k AS (SELECT a.o_custkey, a.rn, 1 + SUM(CASE WHEN "
            "b.c > a.c THEN 1 ELSE 0 END) AS rnk FROM r a "
            "JOIN r b ON a.o_custkey = b.o_custkey "
            "AND b.rn BETWEEN a.rn - 4 AND a.rn GROUP BY 1, 2) "
            "SELECT CAST(rnk AS BIGINT) AS rank, "
            "CAST(count(*) AS BIGINT) AS n_orders FROM k GROUP BY 1"),
        "hourly_hotuser_share_hist": (
            "WITH c AS (SELECT date_trunc('hour', ts) AS h, user_id, "
            "count(*) AS n FROM events GROUP BY 1, 2), "
            "s AS (SELECT h, (1000000 * MAX(n)) // SUM(n) AS share "
            "FROM c GROUP BY 1) "
            "SELECT share // 100000 AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_hours FROM s GROUP BY 1"),
        "doc_half_jaccard_hist": (
            "WITH e AS (SELECT doc_id, toks[i] AS tok, "
            "CASE WHEN i - 1 < len(toks) // 2 THEN 1 ELSE 0 END AS ia "
            "FROM (SELECT doc_id, string_split(text, ' ') AS toks "
            "FROM documents), unnest(range(1, len(toks) + 1)) t(i)), "
            "g AS (SELECT doc_id, tok, MAX(ia) AS ina, "
            "MAX(1 - ia) AS inb FROM e GROUP BY 1, 2), "
            "d AS (SELECT doc_id, SUM(ina * inb) AS inter, "
            "count(*) AS un FROM g GROUP BY 1) "
            "SELECT ((1000000 * inter) // un) // 100000 AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_docs FROM d GROUP BY 1"),
        "kmv_intersection_estimate": (
            "WITH du AS (SELECT DISTINCT event_type, user_id "
            "FROM events WHERE event_type IN ('view', 'purchase')), "
            "hh AS (SELECT event_type, CAST(CONCAT('0x', "
            "substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) "
            "AS h FROM du), "
            "a AS (SELECT h FROM hh WHERE event_type = 'view' "
            "ORDER BY h LIMIT 64), "
            "b AS (SELECT h FROM hh WHERE event_type = 'purchase' "
            "ORDER BY h LIMIT 64), "
            "un AS (SELECT h FROM (SELECT h FROM a UNION "
            "SELECT h FROM b) ORDER BY h LIMIT 64), "
            "st AS (SELECT (SELECT count(*) FROM ("
            "SELECT h FROM a UNION SELECT h FROM b)) AS full_union, "
            "(SELECT count(*) FROM un) AS nu, "
            "(SELECT max(h) FROM un) AS theta), "
            "i AS (SELECT count(*) AS i FROM (SELECT h FROM a "
            "INTERSECT SELECT h FROM b) x, st "
            "WHERE st.full_union <= 64 OR x.h <= st.theta), "
            "ex AS (SELECT count(*) AS exact FROM ("
            "SELECT h FROM hh WHERE event_type = 'view' INTERSECT "
            "SELECT h FROM hh WHERE event_type = 'purchase')) "
            "SELECT CAST(CASE WHEN st.full_union <= 64 THEN i.i ELSE "
            "(CAST(i.i AS HUGEINT) * (st.nu - 1) "
            "* CAST(1152921504606846976 AS HUGEINT)) "
            "// (st.nu * GREATEST(st.theta, 1)) END AS BIGINT) "
            "AS est_intersection, "
            "CAST(ex.exact AS BIGINT) AS exact_intersection, "
            "CAST(64 AS BIGINT) AS k FROM st, i, ex"),
        "token_position_diversity": (
            "WITH p AS (SELECT DISTINCT i - 1 AS pos, toks[i] AS tok "
            "FROM (SELECT string_split(text, ' ') AS toks "
            "FROM documents), "
            "unnest(range(1, LEAST(len(toks), 10) + 1)) t(i)) "
            "SELECT CAST(pos AS BIGINT) AS pos, "
            "CAST(count(*) AS BIGINT) AS n_distinct_tokens "
            "FROM p GROUP BY 1"),
        "coorder_clustering_coefficient": (
            "WITH op AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "tri AS (SELECT count(*) AS t FROM e e1 "
            "JOIN e e2 ON e1.v = e2.u "
            "JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v), "
            "d AS (SELECT node, count(*) AS deg FROM ("
            "SELECT u AS node FROM e UNION ALL SELECT v FROM e) "
            "GROUP BY 1), "
            "p2 AS (SELECT SUM(deg * (deg - 1) // 2) AS p FROM d) "
            "SELECT CAST(tri.t AS BIGINT) AS n_triangles, "
            "CAST(p2.p AS BIGINT) AS n_paths2, "
            "CAST((1000000 * 3 * tri.t) // GREATEST(p2.p, 1) "
            "AS BIGINT) AS clustering_ppm FROM tri, p2"),
        "early_value_share_hist": (
            "WITH u AS (SELECT user_id, min(ts) AS mn FROM events "
            "GROUP BY 1), "
            "s AS (SELECT e.user_id, SUM(CASE WHEN epoch_us(e.ts) < "
            "epoch_us(u.mn) + 604800000000 THEN "
            "CAST(round(e.value * 100) AS BIGINT) ELSE 0 END) AS early, "
            "SUM(CAST(round(e.value * 100) AS BIGINT)) AS total "
            "FROM events e JOIN u ON e.user_id = u.user_id GROUP BY 1) "
            "SELECT ((1000000 * early) // GREATEST(total, 1)) "
            "// 100000 AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_users FROM s GROUP BY 1"),
        "bpe_overhead_by_lang": (
            "WITH a AS (SELECT lang, "
            "CAST(len(regexp_extract_all(text, "
            "'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+')) AS BIGINT) AS nb, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS nw "
            "FROM documents) "
            "SELECT lang, CAST(SUM(nb) AS BIGINT) AS n_bpe, "
            "CAST(SUM(nw) AS BIGINT) AS n_ws, "
            "CAST((1000000 * SUM(nb)) // GREATEST(SUM(nw), 1) "
            "AS BIGINT) AS overhead_ppm FROM a GROUP BY 1"),
        "label_centroid_distance_matrix": (
            "WITH q AS (SELECT CAST(label AS BIGINT) AS label, "
            "CAST(k - 1 AS BIGINT) AS dim, "
            "CAST(round(CAST(embedding[CAST(k AS INT)] AS DOUBLE) "
            "* 10000) AS BIGINT) AS q "
            "FROM embeddings, range(1, 65) r(k)), "
            "s AS (SELECT label, dim, CAST(SUM(q) AS HUGEINT) AS s "
            "FROM q GROUP BY 1, 2), "
            "n AS (SELECT CAST(label AS BIGINT) AS label, "
            "CAST(count(*) AS HUGEINT) AS n FROM embeddings "
            "GROUP BY 1) "
            "SELECT a.label AS label_a, b.label AS label_b, "
            "CAST(SUM((nb.n * a.s - na.n * b.s) "
            "* (nb.n * a.s - na.n * b.s)) AS DOUBLE) AS d2_num, "
            "CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b "
            "FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label "
            "JOIN n na ON na.label = a.label "
            "JOIN n nb ON nb.label = b.label "
            "GROUP BY a.label, b.label, na.n, nb.n"),
        "user_day_density_ppm": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "date_trunc('day', ts) AS day FROM events) "
            "SELECT CAST(count(*) AS BIGINT) AS n_user_days, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
            "CAST(count(DISTINCT day) AS BIGINT) AS n_days, "
            "CAST((1000000 * count(*)) // GREATEST("
            "count(DISTINCT user_id) * count(DISTINCT day), 1) "
            "AS BIGINT) AS density_ppm FROM d"),
        "salted_top_user": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY 1 "
            "ORDER BY n_events DESC, user_id LIMIT 1"),
        "customer_rank_spearman_d2": (
            "WITH t AS (SELECT o_custkey, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents, "
            "count(*) AS n FROM orders GROUP BY 1), "
            "r AS (SELECT row_number() OVER ("
            "ORDER BY cents DESC, o_custkey) AS r1, "
            "row_number() OVER (ORDER BY n DESC, o_custkey) AS r2 "
            "FROM t) "
            "SELECT CAST(count(*) AS BIGINT) AS n_customers, "
            "CAST(SUM((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2 "
            "FROM r"),
        "activation_gap_median_days": (
            "WITH r AS (SELECT o_custkey, "
            "CAST(o_orderdate AS DATE) AS d, row_number() OVER ("
            "PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) AS rn FROM orders), "
            "g AS (SELECT CAST(b.d - a.d AS DOUBLE) AS gap FROM r a "
            "JOIN r b ON a.o_custkey = b.o_custkey "
            "AND a.rn = 1 AND b.rn = 2) "
            "SELECT 0.5 AS q, CAST(quantile_disc(gap, 0.5) AS DOUBLE) "
            "AS value FROM g"),
        "orderkey_fragmentation": (
            "WITH b AS (SELECT count(*) AS nb FROM orders WHERE "
            "o_orderkey + 1 NOT IN (SELECT o_orderkey FROM orders)), "
            "m AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx, "
            "count(*) AS n FROM orders) "
            "SELECT CAST(m.n AS BIGINT) AS n_keys, "
            "CAST(b.nb AS BIGINT) AS n_fragments, "
            "CAST(m.mx - m.mn + 1 - m.n AS BIGINT) AS total_missing "
            "FROM b, m"),
        "quality_filter_ablation": (
            "WITH a AS (SELECT len(string_split(text, ' ')) AS nt, "
            "len(list_filter(string_split(text, ' '), x -> x IN "
            f"{_STOPLIST_SQL})) AS ns FROM documents) "
            "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(CASE WHEN nt < 10 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_fail_short, "
            "CAST(SUM(CASE WHEN nt > 5000 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_fail_long, "
            "CAST(SUM(CASE WHEN 2 * ns > nt THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_fail_stopword, "
            "CAST(SUM(CASE WHEN nt >= 10 AND nt <= 5000 "
            "AND 2 * ns <= nt THEN 1 ELSE 0 END) AS BIGINT) AS n_pass "
            "FROM a"),
        "unit_price_deviation_hist": (
            "WITH j AS (SELECT "
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) AS ext, "
            "(CAST(round(p.p_retailprice * 100) AS BIGINT) "
            "* CAST(round(l.l_quantity * 100) AS BIGINT)) // 100 "
            "AS expected FROM lineitem l "
            "JOIN part p ON l.l_partkey = p.p_partkey), "
            "d AS (SELECT (1000000 * (ext - expected)) "
            "// GREATEST(expected, 1) - CASE WHEN "
            "(1000000 * (ext - expected)) % GREATEST(expected, 1) <> 0 "
            "AND ext < expected THEN 1 ELSE 0 END AS dev FROM j), "
            "b AS (SELECT dev // 100000 - CASE WHEN dev % 100000 <> 0 "
            "AND dev < 0 THEN 1 ELSE 0 END AS bucket FROM d) "
            "SELECT bucket, CAST(count(*) AS BIGINT) AS n_lines "
            "FROM b GROUP BY 1"),
        "brand_price_gap_hist": (
            "WITH s AS (SELECT p_brand, "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS c "
            "FROM part), "
            "d AS (SELECT c - lag(c) OVER (PARTITION BY p_brand "
            "ORDER BY c) AS gap FROM s), "
            "b AS (SELECT CASE WHEN gap > 0 THEN "
            "CAST(floor(log2(gap)) AS BIGINT) ELSE -1 END AS bucket "
            "FROM d WHERE gap IS NOT NULL) "
            "SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps "
            "FROM b GROUP BY 1"),
        "users_business_hours_share": (
            "WITH h AS (SELECT user_id, CAST(hour(ts) AS BIGINT) "
            "AS hr, count(*) AS n FROM events GROUP BY 1, 2), "
            "m AS (SELECT user_id, hr FROM (SELECT user_id, hr, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY n DESC, hr) AS rn FROM h) WHERE rn = 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(SUM(CASE WHEN hr BETWEEN 9 AND 17 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_business, "
            "CAST((1000000 * SUM(CASE WHEN hr BETWEEN 9 AND 17 "
            "THEN 1 ELSE 0 END)) // GREATEST(count(*), 1) AS BIGINT) "
            "AS business_ppm FROM m"),
        "priority_habit_consistency": (
            "WITH c AS (SELECT o_custkey, o_orderpriority AS p, "
            "count(*) AS n FROM orders GROUP BY 1, 2), "
            "m AS (SELECT o_custkey, p FROM (SELECT o_custkey, p, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY n DESC, p) AS rn FROM c) WHERE rn = 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CASE WHEN o.o_orderpriority = m.p THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_matching, "
            "CAST((1000000 * SUM(CASE WHEN o.o_orderpriority = m.p "
            "THEN 1 ELSE 0 END)) // GREATEST(count(*), 1) AS BIGINT) "
            "AS consistency_ppm FROM orders o "
            "JOIN m ON o.o_custkey = m.o_custkey"),
        "transition_time_matrix": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "lead(event_type) OVER w AS nt, "
            "epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "g AS (SELECT event_type || '>' || nt AS pair, "
            "CAST(gap AS DOUBLE) AS gap_us FROM o "
            "WHERE nt IS NOT NULL) "
            "SELECT pair, 0.5 AS q, "
            "CAST(quantile_disc(gap_us, 0.5) AS DOUBLE) AS value "
            "FROM g GROUP BY 1"),
        "hierarchy_share_report": (
            "WITH nv AS (SELECT n.n_name, n.n_regionkey, "
            "SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY 1, 2), "
            "rv AS (SELECT n_regionkey, SUM(cents) AS cents "
            "FROM nv GROUP BY 1), "
            "tv AS (SELECT SUM(cents) AS total FROM rv) "
            "SELECT 'nation' AS level, nv.n_name AS key, "
            "r.r_name AS parent, CAST(nv.cents AS BIGINT) AS cents, "
            "CAST((1000000 * nv.cents) // GREATEST(rv.cents, 1) "
            "AS BIGINT) AS share_of_parent_ppm FROM nv "
            "JOIN rv ON rv.n_regionkey = nv.n_regionkey "
            "JOIN region r ON r.r_regionkey = nv.n_regionkey "
            "UNION ALL SELECT 'region', r.r_name, 'ALL', "
            "CAST(rv.cents AS BIGINT), "
            "CAST((1000000 * rv.cents) // GREATEST(tv.total, 1) "
            "AS BIGINT) FROM rv "
            "JOIN region r ON r.r_regionkey = rv.n_regionkey, tv"),
        "month_end_revenue_share": (
            "WITH a AS (SELECT CAST(year(o_orderdate) AS BIGINT) "
            "AS year, CASE WHEN day(o_orderdate) > "
            "day(last_day(CAST(o_orderdate AS DATE))) - 3 "
            "THEN 1 ELSE 0 END AS is_end, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents "
            "FROM orders) "
            "SELECT year, CAST(SUM(is_end * cents) AS BIGINT) "
            "AS end_cents, CAST(SUM(cents) AS BIGINT) AS total_cents, "
            "CAST((1000000 * SUM(is_end * cents)) // SUM(cents) "
            "AS BIGINT) AS month_end_ppm FROM a GROUP BY 1"),
        "user_staleness_hist": (
            "WITH l AS (SELECT user_id, "
            "CAST(max(ts) AS DATE) AS ld FROM events GROUP BY 1), "
            "m AS (SELECT max(ld) AS md FROM l) "
            "SELECT CAST(m.md - l.ld AS BIGINT) AS days_stale, "
            "CAST(count(*) AS BIGINT) AS n_users FROM l, m GROUP BY 1"),
        "revenue_multiscale_variance": (
            " UNION ALL ".join(
                f"SELECT '{g}' AS grain, "
                "CAST(count(*) AS BIGINT) AS n_buckets, "
                "CAST(count(*) * SUM(CAST(x AS HUGEINT) * x) "
                "- CAST(SUM(x) AS HUGEINT) * SUM(x) AS VARCHAR) "
                "AS var_num FROM ("
                f"SELECT date_trunc('{g}', o_orderdate) AS b, "
                "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x "
                "FROM orders GROUP BY 1)"
                for g in ("day", "week", "month"))),
        "rapid_event_share": (
            "WITH o AS (SELECT value, epoch_us(ts) - epoch_us(lag(ts) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap "
            "FROM events) "
            "SELECT CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CASE WHEN gap <= 60000000 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_rapid, "
            "CAST(SUM(CASE WHEN gap <= 60000000 THEN "
            "CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) "
            "AS rapid_cents, "
            "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS total_cents FROM o"),
        "revenue_up_down_streaks": (
            "WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1), "
            "w AS (SELECT day, cents, lag(day) OVER (ORDER BY day) "
            "AS pd, lag(cents) OVER (ORDER BY day) AS pv FROM d), "
            "f AS (SELECT day, CASE WHEN pd = day - INTERVAL 1 DAY "
            "AND cents > pv THEN 1 ELSE 0 END AS up, "
            "CASE WHEN pd = day - INTERVAL 1 DAY AND cents < pv "
            "THEN 1 ELSE 0 END AS dn FROM w), "
            "g AS (SELECT up, dn, SUM(CASE WHEN up = 0 THEN 1 ELSE 0 "
            "END) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS ug, "
            "SUM(CASE WHEN dn = 0 THEN 1 ELSE 0 END) OVER ("
            "ORDER BY day ROWS UNBOUNDED PRECEDING) AS dg FROM f), "
            "ur AS (SELECT COALESCE(MAX(c), 0) AS m FROM ("
            "SELECT ug, count(*) AS c FROM g WHERE up = 1 "
            "GROUP BY ug)), "
            "dr AS (SELECT COALESCE(MAX(c), 0) AS m FROM ("
            "SELECT dg, count(*) AS c FROM g WHERE dn = 1 "
            "GROUP BY dg)) "
            "SELECT CAST(ur.m AS BIGINT) AS longest_up_days, "
            "CAST(dr.m AS BIGINT) AS longest_down_days, "
            "CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days "
            "FROM ur, dr"),
        "brand_size_grid_sparsity": (
            "WITH d AS (SELECT DISTINCT p_brand, p_size FROM part), "
            "m AS (SELECT CAST(count(DISTINCT p_brand) AS BIGINT) "
            "AS nb, CAST(count(DISTINCT p_size) AS BIGINT) AS ns, "
            "CAST(count(*) AS BIGINT) AS occ FROM d) "
            "SELECT nb AS n_brands, ns AS n_sizes, occ AS n_occupied, "
            "CAST((1000000 * occ) // GREATEST(nb * ns, 1) AS BIGINT) "
            "AS occupancy_ppm FROM m"),
        "brand_return_rate_top10": (
            "WITH a AS (SELECT p.p_brand, "
            "CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_returned FROM lineitem l "
            "JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1) "
            "SELECT p_brand, n_lines, n_returned, "
            "CAST((1000000 * n_returned) // n_lines AS BIGINT) "
            "AS return_ppm FROM a "
            "ORDER BY return_ppm DESC, p_brand LIMIT 10"),
        "join_size_bucket_estimate": (
            "WITH kc AS (SELECT l_orderkey AS k, "
            "CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1), "
            "b AS (SELECT k % 16 AS b, SUM(n) AS nl, "
            "CAST(count(*) AS BIGINT) AS dl, SUM(n * n) AS sq "
            "FROM kc GROUP BY 1) "
            "SELECT CAST(SUM((nl * nl) // GREATEST(dl, 1)) AS BIGINT) "
            "AS est_rows, CAST(SUM(sq) AS BIGINT) AS exact_rows, "
            "CAST((1000000 * abs(SUM((nl * nl) // GREATEST(dl, 1)) "
            "- SUM(sq))) // GREATEST(SUM(sq), 1) AS BIGINT) "
            "AS err_ppm FROM b"),
        "customer_lorenz_curve": (
            "WITH t AS (SELECT o_custkey, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1), "
            "r AS (SELECT cents, row_number() OVER ("
            "ORDER BY cents, o_custkey) AS rn, "
            "SUM(cents) OVER (ORDER BY cents, o_custkey "
            "ROWS UNBOUNDED PRECEDING) AS cum FROM t), "
            "m AS (SELECT count(*) AS n, SUM(cents) AS total FROM t), "
            "ks AS (SELECT unnest(range(1, 11)) AS k) "
            "SELECT CAST(ks.k AS BIGINT) AS decile, "
            "CAST(CASE WHEN (ks.k * m.n) // 10 = 0 THEN 0 ELSE "
            "(1000000 * (SELECT cum FROM r "
            "WHERE rn = (ks.k * m.n) // 10)) "
            "// GREATEST(m.total, 1) END AS BIGINT) AS cum_share_ppm "
            "FROM ks, m"),
        "order_line_concentration_hist": (
            "WITH a AS (SELECT l_orderkey, "
            "MAX(CAST(round(l_extendedprice * 100) AS BIGINT)) AS mx, "
            "SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS s "
            "FROM lineitem GROUP BY 1) "
            "SELECT ((1000000 * mx) // s) // 100000 AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_orders FROM a GROUP BY 1"),
        "corpus_lang_run_count": (
            "WITH j AS (SELECT a.lang AS la, b.lang AS lb "
            "FROM documents a "
            "JOIN documents b ON b.doc_id = a.doc_id + 1) "
            "SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) "
            "AS n_docs, CAST(count(*) AS BIGINT) AS n_adjacent_pairs, "
            "CAST((SELECT count(*) FROM documents) - count(*) "
            "+ SUM(CASE WHEN la <> lb THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_runs FROM j"),
        "order_ship_atomicity": (
            "WITH a AS (SELECT l_orderkey, count(*) AS nl, "
            "min(date_trunc('day', l_shipdate)) AS mn, "
            "max(date_trunc('day', l_shipdate)) AS mx "
            "FROM lineitem GROUP BY 1) "
            "SELECT CAST(SUM(CASE WHEN nl > 1 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_multi, "
            "CAST(SUM(CASE WHEN nl > 1 AND mn = mx THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_atomic, "
            "CAST((1000000 * SUM(CASE WHEN nl > 1 AND mn = mx "
            "THEN 1 ELSE 0 END)) // GREATEST(SUM(CASE WHEN nl > 1 "
            "THEN 1 ELSE 0 END), 1) AS BIGINT) AS atomic_ppm FROM a"),
        "purchase_attribution_models": (
            "WITH e AS (SELECT user_id, ts, event_id, event_type, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "p AS (SELECT user_id, ts, event_id, cents FROM e "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT p.user_id, p.event_id AS pid, p.cents, "
            "n.event_type, row_number() OVER (PARTITION BY p.user_id, "
            "p.event_id ORDER BY n.ts, n.event_id) AS rf, "
            "row_number() OVER (PARTITION BY p.user_id, p.event_id "
            "ORDER BY n.ts DESC, n.event_id DESC) AS rl "
            "FROM p JOIN e n ON n.user_id = p.user_id "
            "AND n.event_type <> 'purchase' "
            "AND (n.ts < p.ts OR (n.ts = p.ts "
            "AND n.event_id < p.event_id)) "
            "AND epoch_us(n.ts) >= epoch_us(p.ts) - 86400000000) "
            "SELECT event_type, "
            "CAST(SUM(CASE WHEN rf = 1 THEN cents ELSE 0 END) "
            "AS BIGINT) AS first_touch_cents, "
            "CAST(SUM(CASE WHEN rl = 1 THEN cents ELSE 0 END) "
            "AS BIGINT) AS last_touch_cents FROM c "
            "WHERE rf = 1 OR rl = 1 GROUP BY 1"),
        "cumulative_unique_users": (
            "WITH f AS (SELECT user_id, "
            "min(date_trunc('day', ts)) AS fd FROM events GROUP BY 1), "
            "d AS (SELECT fd AS day, CAST(count(*) AS BIGINT) AS n_new "
            "FROM f GROUP BY 1) "
            "SELECT CAST(day AS TIMESTAMP) AS day, n_new, "
            "CAST(SUM(n_new) OVER (ORDER BY day "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users FROM d"),
        "dataset_split_manifest": (
            "WITH a AS (SELECT lang, CASE WHEN "
            "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), "
            "1, 2)) AS BIGINT) % 10 < 8 THEN 'train' WHEN "
            "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), "
            "1, 2)) AS BIGINT) % 10 = 8 THEN 'val' ELSE 'test' END "
            "AS split FROM documents) "
            "SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM a GROUP BY 1, 2"),
        "lineitem_sync_manifest": (
            "SELECT l_orderkey // 10000 AS chunk, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "bit_xor(CAST(CONCAT('0x', substr(md5("
            "CAST(l_orderkey AS VARCHAR) || '|' || "
            "CAST(l_linenumber AS VARCHAR) || '|' || "
            "CAST(CAST(round(l_quantity * 100) AS BIGINT) AS VARCHAR)"
            "), 1, 15)) AS BIGINT)) AS checksum, "
            "min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship "
            "FROM lineitem GROUP BY 1"),
        "session_count_sweep": (
            "WITH o AS (SELECT user_id, epoch_us(ts) - "
            "epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) "
            "AS gap FROM events), "
            "g AS (SELECT unnest([5, 15, 30, 60]) AS gm), "
            "u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) "
            "AS nu FROM events) "
            "SELECT CAST(g.gm AS BIGINT) AS gap_minutes, "
            "CAST(u.nu + SUM(CASE WHEN o.gap > "
            "CAST(g.gm AS BIGINT) * 60000000 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions "
            "FROM g, o, u GROUP BY 1, u.nu"),
        "customer_supplier_diversity_hist": (
            "WITH d AS (SELECT DISTINCT o.o_custkey, l.l_suppkey "
            "FROM lineitem l JOIN orders o "
            "ON l.l_orderkey = o.o_orderkey), "
            "p AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS ns "
            "FROM d GROUP BY 1) "
            "SELECT ns AS n_suppliers, "
            "CAST(count(*) AS BIGINT) AS n_customers FROM p GROUP BY 1"),
        "daily_revenue_kmeans2": (
            "WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, "
            "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS x FROM orders GROUP BY 1), "
            "c0 AS (SELECT min(x) AS lo, max(x) AS hi FROM d), "
            "c1 AS (SELECT COALESCE(SUM(x) FILTER ("
            "2 * x <= c0.lo + c0.hi) // NULLIF(count(*) FILTER ("
            "2 * x <= c0.lo + c0.hi), 0), c0.lo) AS lo, "
            "COALESCE(SUM(x) FILTER (2 * x > c0.lo + c0.hi) "
            "// NULLIF(count(*) FILTER (2 * x > c0.lo + c0.hi), 0), "
            "c0.hi) AS hi FROM d, c0 GROUP BY c0.lo, c0.hi), "
            "c2 AS (SELECT COALESCE(SUM(x) FILTER ("
            "2 * x <= c1.lo + c1.hi) // NULLIF(count(*) FILTER ("
            "2 * x <= c1.lo + c1.hi), 0), c1.lo) AS lo, "
            "COALESCE(SUM(x) FILTER (2 * x > c1.lo + c1.hi) "
            "// NULLIF(count(*) FILTER (2 * x > c1.lo + c1.hi), 0), "
            "c1.hi) AS hi FROM d, c1 GROUP BY c1.lo, c1.hi), "
            "c3 AS (SELECT COALESCE(SUM(x) FILTER ("
            "2 * x <= c2.lo + c2.hi) // NULLIF(count(*) FILTER ("
            "2 * x <= c2.lo + c2.hi), 0), c2.lo) AS lo, "
            "COALESCE(SUM(x) FILTER (2 * x > c2.lo + c2.hi) "
            "// NULLIF(count(*) FILTER (2 * x > c2.lo + c2.hi), 0), "
            "c2.hi) AS hi FROM d, c2 GROUP BY c2.lo, c2.hi) "
            "SELECT CAST(c3.lo AS BIGINT) AS centroid_lo, "
            "CAST(c3.hi AS BIGINT) AS centroid_hi, "
            "CAST(count(*) FILTER (2 * x <= c3.lo + c3.hi) AS BIGINT) "
            "AS n_lo, "
            "CAST(count(*) FILTER (2 * x > c3.lo + c3.hi) AS BIGINT) "
            "AS n_hi FROM d, c3 GROUP BY c3.lo, c3.hi"),
        "token_anagram_groups": (
            "WITH v AS (SELECT DISTINCT "
            "unnest(string_split(text, ' ')) AS tok FROM documents), "
            "k AS (SELECT array_to_string(list_sort("
            "string_split_regex(tok, '')), '') AS akey, tok FROM v) "
            "SELECT akey, CAST(count(*) AS BIGINT) AS n_tokens "
            "FROM k GROUP BY 1 HAVING count(*) >= 2"),
        "session_handoff_matrix": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - "
            "epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END "
            "AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, ts, event_id, event_type, "
            "sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "r AS (SELECT user_id, sid, event_type, "
            "row_number() OVER (PARTITION BY user_id, sid "
            "ORDER BY ts, event_id) AS rf, "
            "row_number() OVER (PARTITION BY user_id, sid "
            "ORDER BY ts DESC, event_id DESC) AS rl FROM s), "
            "fl AS (SELECT user_id, sid, "
            "MAX(CASE WHEN rf = 1 THEN event_type END) AS first_type, "
            "MAX(CASE WHEN rl = 1 THEN event_type END) AS last_type "
            "FROM r GROUP BY 1, 2) "
            "SELECT a.last_type AS from_type, b.first_type AS to_type, "
            "CAST(count(*) AS BIGINT) AS n FROM fl a "
            "JOIN fl b ON a.user_id = b.user_id AND b.sid = a.sid + 1 "
            "GROUP BY 1, 2"),
        "domestic_supply_share": (
            "WITH j AS (SELECT CAST(c.c_nationkey AS BIGINT) "
            "AS nationkey, "
            "CASE WHEN s.s_nationkey = c.c_nationkey THEN 1 ELSE 0 END "
            "AS dom, CAST(round(l.l_extendedprice * 100) AS BIGINT) "
            "AS cents FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey) "
            "SELECT nationkey, "
            "CAST(SUM(dom * cents) AS BIGINT) AS domestic_cents, "
            "CAST(SUM(cents) AS BIGINT) AS total_cents, "
            "CAST((1000000 * SUM(dom * cents)) // SUM(cents) AS BIGINT) "
            "AS domestic_ppm FROM j GROUP BY 1"),
        "revenue_changepoint_day": (
            "WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, "
            "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS HUGEINT) AS cents, CAST(count(*) AS HUGEINT) AS n "
            "FROM orders GROUP BY 1), "
            "t AS (SELECT SUM(cents) AS ts, SUM(n) AS tn, "
            "CAST(count(*) AS BIGINT) AS nd FROM d), "
            "c AS (SELECT day, SUM(cents) OVER w AS sp, "
            "SUM(n) OVER w AS np, row_number() OVER ("
            "ORDER BY day DESC) AS from_end FROM d "
            "WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)), "
            "sc AS (SELECT day, abs(sp * (t.tn - np) "
            "- (t.ts - sp) * np) AS score FROM c, t "
            "WHERE from_end > 1), "
            "best AS (SELECT day, score, row_number() OVER ("
            "ORDER BY score DESC, day) AS rn FROM sc) "
            "SELECT CAST(best.day AS TIMESTAMP) AS split_day, "
            "CAST(best.score AS DOUBLE) AS score, t.nd AS n_days "
            "FROM best, t WHERE rn = 1"),
        "orders_fiscal_445_counts": (
            "WITH w AS (SELECT (CAST(o_orderdate AS DATE) "
            "- DATE '1994-12-26') // 7 AS wk_abs, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents "
            "FROM orders), "
            "p AS (SELECT CAST(wk_abs // 52 AS BIGINT) AS fiscal_year, "
            "CAST(CASE WHEN wk_abs % 52 < 4 THEN 1 "
            "WHEN wk_abs % 52 < 8 THEN 2 WHEN wk_abs % 52 < 13 THEN 3 "
            "WHEN wk_abs % 52 < 17 THEN 4 WHEN wk_abs % 52 < 21 THEN 5 "
            "WHEN wk_abs % 52 < 26 THEN 6 WHEN wk_abs % 52 < 30 THEN 7 "
            "WHEN wk_abs % 52 < 34 THEN 8 WHEN wk_abs % 52 < 39 THEN 9 "
            "WHEN wk_abs % 52 < 43 THEN 10 "
            "WHEN wk_abs % 52 < 47 THEN 11 ELSE 12 END AS BIGINT) "
            "AS period, cents FROM w) "
            "SELECT fiscal_year, period, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(cents) AS BIGINT) AS cents FROM p GROUP BY 1, 2"),
        "sampled_topk_fidelity": (
            "WITH c AS (SELECT tok, count(*) AS n FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1), "
            "e AS (SELECT tok FROM c ORDER BY n DESC, tok LIMIT 10), "
            "sc AS (SELECT tok, count(*) AS n FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents WHERE "
            "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0') "
            "GROUP BY 1), "
            "s AS (SELECT tok FROM sc ORDER BY n DESC, tok LIMIT 10), "
            "i AS (SELECT CAST(count(*) AS BIGINT) AS inter "
            "FROM e JOIN s USING (tok)), "
            "u AS (SELECT CAST(count(*) AS BIGINT) AS un FROM ("
            "SELECT tok FROM e UNION SELECT tok FROM s)) "
            "SELECT CAST(10 AS BIGINT) AS k, i.inter AS n_overlap, "
            "CAST((1000000 * i.inter) // GREATEST(u.un, 1) AS BIGINT) "
            "AS jaccard_ppm FROM i, u"),
        "user_decayed_value": (
            "WITH mx AS (SELECT CAST(max(ts) AS DATE) AS md "
            "FROM events) "
            "SELECT user_id, CAST(SUM("
            "CAST(round(value * 100) AS BIGINT) >> LEAST("
            "mx.md - CAST(ts AS DATE), 62)) AS BIGINT) "
            "AS decayed_cents, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events, mx GROUP BY 1"),
        "revenue_growth_accounting": (
            "WITH cy AS (SELECT o_custkey AS c, "
            "CAST(year(o_orderdate) AS BIGINT) AS y, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v "
            "FROM orders GROUP BY 1, 2), "
            "j AS (SELECT COALESCE(b.y, a.y + 1) AS year, "
            "a.c AS ac, b.c AS bc, COALESCE(a.v, 0) AS prev, "
            "COALESCE(b.v, 0) AS cur FROM cy a "
            "FULL OUTER JOIN cy b ON a.c = b.c AND a.y + 1 = b.y) "
            "SELECT year, "
            "CAST(SUM(CASE WHEN ac IS NULL THEN cur ELSE 0 END) "
            "AS BIGINT) AS new_cents, "
            "CAST(SUM(CASE WHEN bc IS NULL THEN prev ELSE 0 END) "
            "AS BIGINT) AS churned_cents, "
            "CAST(SUM(CASE WHEN ac IS NOT NULL AND bc IS NOT NULL "
            "THEN GREATEST(cur - prev, 0) ELSE 0 END) AS BIGINT) "
            "AS expansion_cents, "
            "CAST(SUM(CASE WHEN ac IS NOT NULL AND bc IS NOT NULL "
            "THEN GREATEST(prev - cur, 0) ELSE 0 END) AS BIGINT) "
            "AS contraction_cents FROM j GROUP BY 1"),
        "order_total_allocation": (
            "WITH j AS (SELECT l.l_orderkey, l.l_linenumber, "
            "l.l_returnflag, "
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) AS w, "
            "CAST(round(o.o_totalprice * 100) AS BIGINT) AS total "
            "FROM lineitem l JOIN orders o "
            "ON l.l_orderkey = o.o_orderkey), "
            "g AS (SELECT *, SUM(w) OVER (PARTITION BY l_orderkey) "
            "AS wsum FROM j), "
            "b AS (SELECT *, (total * w) // wsum AS base, "
            "(total * w) % wsum AS rem FROM g), "
            "kk AS (SELECT l_orderkey, MIN(total) - SUM(base) AS k "
            "FROM b GROUP BY 1), "
            "r AS (SELECT b.*, row_number() OVER ("
            "PARTITION BY b.l_orderkey "
            "ORDER BY b.rem DESC, b.l_linenumber) - 1 AS pos FROM b) "
            "SELECT r.l_returnflag, "
            "CAST(SUM(r.base + CASE WHEN r.pos < kk.k THEN 1 ELSE 0 "
            "END) AS BIGINT) AS allocated_cents, "
            "CAST(count(*) AS BIGINT) AS n_lines FROM r "
            "JOIN kk ON kk.l_orderkey = r.l_orderkey GROUP BY 1"),
        "quality_pass_by_length_decile": (
            "WITH b AS (SELECT quantile_disc(CAST(n_chars AS DOUBLE), "
            "[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs "
            "FROM documents), "
            "d AS (SELECT CAST(len(list_filter(b.qs, "
            "x -> x < CAST(n_chars AS DOUBLE))) AS BIGINT) AS decile, "
            "CASE WHEN len(string_split(text,' ')) BETWEEN 10 AND 5000 "
            "AND 2 * len(list_filter(string_split(text,' '), x -> x IN "
            f"{_STOPLIST_SQL})) <= len(string_split(text,' ')) "
            "THEN 1 ELSE 0 END AS pass FROM documents, b) "
            "SELECT decile, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(pass) AS BIGINT) AS n_pass, "
            "CAST((1000000 * SUM(pass)) // count(*) AS BIGINT) "
            "AS pass_ppm FROM d GROUP BY 1"),
        "daily_peak_3h_window": (
            "WITH h AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "(epoch_us(ts) % 86400000000) // 3600000000 AS hour, "
            "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
            "days AS (SELECT DISTINCT day FROM h), "
            "grid AS (SELECT days.day, s.start, "
            "CAST(COALESCE(SUM(h.n), 0) AS BIGINT) AS w "
            "FROM days CROSS JOIN range(0, 22) s(start) "
            "LEFT JOIN h ON h.day = days.day "
            "AND h.hour BETWEEN s.start AND s.start + 2 GROUP BY 1, 2), "
            "best AS (SELECT day, start, w, row_number() OVER ("
            "PARTITION BY day ORDER BY w DESC, start) AS rn FROM grid) "
            "SELECT epoch_ms(CAST(day AS BIGINT) * 86400000) AS day, "
            "CAST(start AS BIGINT) AS start_hour, "
            "w AS window_events FROM best WHERE rn = 1"),
        "type_pair_lag_xcorr": (
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "event_type, CAST(count(*) AS BIGINT) AS n FROM events "
            "WHERE event_type IN ('view', 'purchase') GROUP BY 1, 2), "
            "a AS (SELECT day, n FROM d WHERE event_type = 'view'), "
            "p AS (SELECT day, n FROM d WHERE event_type = 'purchase'), "
            "lags AS (SELECT unnest([0, 1, 2, 3]) AS lag) "
            "SELECT CAST(lags.lag AS BIGINT) AS lag, "
            "CAST(COALESCE(SUM(a.n * p.n), 0) AS BIGINT) AS dot "
            "FROM lags LEFT JOIN a ON TRUE "
            "LEFT JOIN p ON p.day = a.day + lags.lag "
            "GROUP BY 1"),
        "brand_revenue_anova": (
            "WITH m AS (SELECT p.p_brand, "
            "CAST(count(*) AS HUGEINT) AS n, "
            "CAST(SUM(CAST(round(l.l_extendedprice) AS BIGINT)) "
            "AS HUGEINT) AS s, "
            "SUM(CAST(round(l.l_extendedprice) AS HUGEINT) "
            "* CAST(round(l.l_extendedprice) AS HUGEINT)) AS ss "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "GROUP BY 1), "
            "g AS (SELECT SUM(n) AS n, SUM(s) AS s, SUM(ss) AS ss, "
            "CAST(count(*) AS BIGINT) AS n_brands FROM m), "
            "gm AS (SELECT g.s // g.n AS gmean FROM g), "
            "ssb AS (SELECT SUM(m.n * (m.s // m.n - gm.gmean) "
            "* (m.s // m.n - gm.gmean)) AS v FROM m, gm), "
            "sst AS (SELECT g.ss - 2 * gm.gmean * g.s "
            "+ g.n * gm.gmean * gm.gmean AS v FROM g, gm) "
            "SELECT CAST(g.n AS BIGINT) AS n_rows, g.n_brands, "
            "CAST((1000000 * ssb.v) // sst.v AS BIGINT) AS ssb_ppm "
            "FROM g, ssb, sst"),
        "user_value_ewma2": (
            "WITH RECURSIVE seq AS (SELECT user_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events), "
            "cnt AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n "
            "FROM seq GROUP BY 1), "
            "r AS (SELECT user_id, rn, cents // 2 AS e "
            "FROM seq WHERE rn = 1 "
            "UNION ALL SELECT seq.user_id, seq.rn, "
            "(seq.cents + r.e) // 2 FROM r "
            "JOIN seq ON seq.user_id = r.user_id "
            "AND seq.rn = r.rn + 1) "
            "SELECT r.user_id, CAST(r.e AS BIGINT) AS ewma_cents, "
            "cnt.n AS n_events FROM r "
            "JOIN cnt ON cnt.user_id = r.user_id WHERE r.rn = cnt.n"),
        "vocab_coverage_curve": (
            "WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1), "
            "r AS (SELECT n, row_number() OVER ("
            "ORDER BY n DESC, tok) AS rnk FROM c), "
            "t AS (SELECT SUM(n) AS total FROM c), "
            "ks AS (SELECT unnest([10, 100, 1000]) AS k) "
            "SELECT CAST(ks.k AS BIGINT) AS k, "
            "CAST(SUM(r.n) AS BIGINT) AS covered, "
            "CAST(t.total AS BIGINT) AS total, "
            "CAST((1000000 * SUM(r.n)) // t.total AS BIGINT) "
            "AS coverage_ppm FROM ks "
            "JOIN r ON r.rnk <= ks.k, t GROUP BY ks.k, t.total"),
        "arrival_dispersion_by_type": (
            "WITH g AS (SELECT event_type, epoch_us(ts) - "
            "epoch_us(lag(ts) OVER (PARTITION BY event_type "
            "ORDER BY ts, event_id)) AS gap FROM events) "
            "SELECT event_type, CAST(count(gap) AS BIGINT) AS n_gaps, "
            "CAST(SUM(gap) AS BIGINT) AS sum_gap_us, "
            "CAST(COALESCE(SUM(CAST(gap AS HUGEINT) * gap), 0) "
            "AS VARCHAR) AS sumsq_gap, "
            "CAST(COALESCE(count(gap) * SUM(CAST(gap AS HUGEINT) * gap) "
            "- CAST(SUM(gap) AS HUGEINT) * SUM(gap), 0) AS VARCHAR) "
            "AS disp_num FROM g GROUP BY 1"),
        "token_burstiness_top10": (
            "WITH pd AS (SELECT doc_id, tok, "
            "CAST(count(*) AS BIGINT) AS n FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1, 2) "
            "SELECT tok, CAST(MAX(n) AS BIGINT) AS max_in_doc, "
            "CAST(SUM(n) AS BIGINT) AS total FROM pd GROUP BY 1 "
            "ORDER BY max_in_doc DESC, tok LIMIT 10"),
        "part_staleness_tiers": (
            "WITH a AS (SELECT l_partkey, max(l_shipdate) AS last_ship, "
            "SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents "
            "FROM lineitem GROUP BY 1), "
            "t AS (SELECT CASE WHEN DATE '2001-08-01' - "
            "CAST(last_ship AS DATE) < 365 THEN 'hot' "
            "WHEN DATE '2001-08-01' - CAST(last_ship AS DATE) < 730 "
            "THEN 'warm' ELSE 'cold' END AS tier, cents FROM a) "
            "SELECT tier, CAST(count(*) AS BIGINT) AS n_parts, "
            "CAST(SUM(cents) AS BIGINT) AS revenue_cents FROM t "
            "GROUP BY 1 "
            "UNION ALL SELECT 'never', "
            "CAST((SELECT count(*) FROM part) - "
            "(SELECT count(*) FROM a) AS BIGINT), CAST(0 AS BIGINT)"),
        "customer_name_key_audit": (
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(CASE WHEN c_name LIKE 'Customer#%' AND "
            "TRY_CAST(substr(c_name, 10) AS BIGINT) = c_custkey "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent, "
            "CAST(SUM(CASE WHEN c_name LIKE 'Customer#%' AND "
            "TRY_CAST(substr(c_name, 10) AS BIGINT) = c_custkey "
            "THEN 0 ELSE 1 END) AS BIGINT) AS n_mismatched "
            "FROM customer"),
        "event_id_density_audit": (
            "SELECT CAST(min(event_id) AS BIGINT) AS min_id, "
            "CAST(max(event_id) AS BIGINT) AS max_id, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(count(*) - count(DISTINCT event_id) AS BIGINT) "
            "AS n_duplicates, "
            "CAST(max(event_id) - min(event_id) + 1 "
            "- count(DISTINCT event_id) AS BIGINT) AS n_holes "
            "FROM events"),
        "customer_status_sequence_signatures": (
            "WITH s AS (SELECT o_custkey, "
            "string_agg(o_orderstatus, '' ORDER BY o_orderdate, "
            "o_orderkey) AS signature FROM orders GROUP BY 1) "
            "SELECT signature, CAST(count(*) AS BIGINT) AS n_customers "
            "FROM s GROUP BY 1"),
        "customer_giant_orders": (
            "WITH c AS (SELECT o_custkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents "
            "FROM orders), "
            "m AS (SELECT o_custkey, quantile_disc(cents, 0.5) AS med, "
            "CAST(count(*) AS BIGINT) AS n_orders FROM c GROUP BY 1) "
            "SELECT c.o_custkey, m.n_orders, "
            "CAST(SUM(CASE WHEN c.cents > 3 * m.med THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_giant FROM c "
            "JOIN m ON c.o_custkey = m.o_custkey GROUP BY 1, 2 "
            "HAVING SUM(CASE WHEN c.cents > 3 * m.med THEN 1 ELSE 0 END) "
            "> 0"),
        "part_name_levenshtein_pairs": (
            "WITH n AS (SELECT DISTINCT p_brand, p_name FROM part), "
            "p AS (SELECT a.p_brand, count(*) AS np FROM n a "
            "JOIN n b ON a.p_brand = b.p_brand AND a.p_name < b.p_name "
            "AND levenshtein(a.p_name, b.p_name) <= 2 GROUP BY 1), "
            "c AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_names "
            "FROM n GROUP BY 1) "
            "SELECT c.p_brand, c.n_names, "
            "CAST(COALESCE(p.np, 0) AS BIGINT) AS n_close_pairs "
            "FROM c LEFT JOIN p ON p.p_brand = c.p_brand"),
        "lineitem_profile": (
            " UNION ALL ".join(
                f"SELECT '{c}' AS col_name, "
                f"CAST(count({c}) AS BIGINT) AS n_nonnull, "
                f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct "
                "FROM lineitem"
                for c in ("l_orderkey", "l_partkey", "l_suppkey",
                          "l_linenumber", "l_returnflag",
                          "l_linestatus"))),
        "purchase_position_in_session": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - "
            "epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END "
            "AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, ts, event_id, event_type, "
            "sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "p AS (SELECT user_id, sid, event_type, row_number() OVER ("
            "PARTITION BY user_id, sid ORDER BY ts, event_id) - 1 "
            "AS pos FROM s) "
            "SELECT CAST((SELECT count(*) FROM ("
            "SELECT DISTINCT user_id, sid FROM s)) AS BIGINT) "
            "AS n_sessions, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_purchases, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN pos "
            "ELSE 0 END) AS BIGINT) AS sum_position FROM p"),
        "priority_lag_quantiles": (
            " UNION ALL ".join(
                f"SELECT o_orderpriority, {q} AS q, "
                f"quantile_disc(CAST(CAST(l_shipdate AS DATE) - "
                f"CAST(o_orderdate AS DATE) AS DOUBLE), {q}) AS value "
                "FROM lineitem JOIN orders "
                "ON l_orderkey = o_orderkey GROUP BY 1"
                for q in (0.5, 0.9, 0.99))),
        # floor division helper inlined: q = a//b (trunc) minus 1 when
        # a%b != 0 and a < 0 (b always > 0 here)
        "embedding_power_iteration": (
            "WITH q AS (SELECT vec_id, CAST(k - 1 AS BIGINT) AS dim, "
            "CAST(round(CAST(embedding[CAST(k AS INT)] AS DOUBLE) "
            "* 10000) AS BIGINT) AS q "
            "FROM embeddings, range(1, 65) r(k)), "
            "a AS (SELECT x.dim AS i, y.dim AS j, "
            "SUM(CAST(x.q AS HUGEINT) * y.q) AS a "
            "FROM q x JOIN q y ON x.vec_id = y.vec_id GROUP BY 1, 2), "
            "av1 AS (SELECT i, SUM(a) AS s FROM a GROUP BY 1), "
            "m1 AS (SELECT MAX(abs(s)) AS mx FROM av1), "
            "v1 AS (SELECT i AS dim, (100 * s) // mx - CASE WHEN "
            "(100 * s) % mx <> 0 AND s < 0 THEN 1 ELSE 0 END AS v "
            "FROM av1, m1), "
            "av2 AS (SELECT a.i, SUM(a.a * v1.v) AS s FROM a "
            "JOIN v1 ON a.j = v1.dim GROUP BY 1), "
            "m2 AS (SELECT MAX(abs(s)) AS mx FROM av2), "
            "v2 AS (SELECT i AS dim, (100 * s) // mx - CASE WHEN "
            "(100 * s) % mx <> 0 AND s < 0 THEN 1 ELSE 0 END AS v "
            "FROM av2, m2), "
            "av3 AS (SELECT a.i, SUM(a.a * v2.v) AS s FROM a "
            "JOIN v2 ON a.j = v2.dim GROUP BY 1), "
            "m3 AS (SELECT MAX(abs(s)) AS mx FROM av3), "
            "v3 AS (SELECT i AS dim, (100 * s) // mx - CASE WHEN "
            "(100 * s) % mx <> 0 AND s < 0 THEN 1 ELSE 0 END AS v "
            "FROM av3, m3) "
            "SELECT dim, CAST(v AS BIGINT) AS v FROM v3"),
        "top_customer_part_drilldown": (
            "WITH cp AS (SELECT o.o_custkey, l.l_partkey, "
            "SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) "
            "AS cents FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY 1, 2), "
            "tc AS (SELECT o_custkey, SUM(cents) AS c FROM cp "
            "GROUP BY 1 ORDER BY c DESC, o_custkey LIMIT 5), "
            "r AS (SELECT cp.o_custkey, cp.l_partkey, cp.cents, "
            "row_number() OVER (PARTITION BY cp.o_custkey "
            "ORDER BY cp.cents DESC, cp.l_partkey) AS rn "
            "FROM cp JOIN tc ON tc.o_custkey = cp.o_custkey) "
            "SELECT o_custkey, l_partkey, cents, "
            "CAST(rn AS BIGINT) AS part_rank FROM r WHERE rn <= 3"),
        "consistent_hash_move_audit": (
            "WITH w AS (SELECT doc_id, node, "
            "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) "
            "|| '|' || CAST(node AS VARCHAR)), 1, 15)) AS BIGINT) AS wt "
            "FROM documents, range(0, 17) t(node)), "
            "old AS (SELECT doc_id, node FROM (SELECT doc_id, node, "
            "row_number() OVER (PARTITION BY doc_id "
            "ORDER BY wt DESC, node DESC) AS rn FROM w WHERE node < 16) "
            "WHERE rn = 1), "
            "nw AS (SELECT doc_id, node FROM (SELECT doc_id, node, "
            "row_number() OVER (PARTITION BY doc_id "
            "ORDER BY wt DESC, node DESC) AS rn FROM w) WHERE rn = 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(CASE WHEN old.doc_id % 16 <> old.doc_id % 17 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS moved_mod, "
            "CAST(SUM(CASE WHEN old.node <> nw.node THEN 1 ELSE 0 END) "
            "AS BIGINT) AS moved_rendezvous "
            "FROM old JOIN nw ON old.doc_id = nw.doc_id"),
        "same_customer_yoy_delta": (
            "WITH p AS (SELECT o_custkey, "
            "SUM(CASE WHEN year(o_orderdate) = 1996 THEN "
            "CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) "
            "AS cents_a, "
            "SUM(CASE WHEN year(o_orderdate) = 1997 THEN "
            "CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) "
            "AS cents_b, "
            "SUM(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) "
            "AS n_a, "
            "SUM(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) "
            "AS n_b FROM orders "
            "WHERE year(o_orderdate) IN (1996, 1997) GROUP BY 1) "
            "SELECT o_custkey, CAST(cents_a AS BIGINT) AS cents_a, "
            "CAST(cents_b AS BIGINT) AS cents_b, "
            "CAST(cents_b - cents_a AS BIGINT) AS delta_cents "
            "FROM p WHERE n_a > 0 AND n_b > 0"),
        "type_coburst_hours": (
            "WITH hc AS (SELECT date_trunc('hour', ts) AS hour, "
            "event_type, CAST(count(*) AS BIGINT) AS n FROM events "
            "GROUP BY 1, 2), "
            "hrs AS (SELECT DISTINCT hour FROM hc), "
            "t AS (SELECT DISTINCT event_type FROM hc), "
            "grid AS (SELECT hrs.hour, t.event_type, "
            "COALESCE(hc.n, 0) AS n FROM hrs CROSS JOIN t "
            "LEFT JOIN hc ON hc.hour = hrs.hour "
            "AND hc.event_type = t.event_type), "
            "med AS (SELECT event_type, quantile_disc(n, 0.5) AS m "
            "FROM grid GROUP BY 1), "
            "ab AS (SELECT grid.hour, grid.event_type FROM grid "
            "JOIN med ON med.event_type = grid.event_type "
            "WHERE grid.n > med.m) "
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "CAST(count(*) AS BIGINT) AS n_coburst_hours "
            "FROM ab a JOIN ab b ON a.hour = b.hour "
            "AND a.event_type < b.event_type GROUP BY 1, 2"),
        "revenue_sigma_outlier_days": (
            "WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1), "
            "m AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
            "CAST(SUM(cents) AS HUGEINT) AS s, "
            "SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS ss "
            "FROM d) "
            "SELECT CAST(d.day AS TIMESTAMP) AS day, "
            "CAST(d.cents AS BIGINT) AS revenue_cents, "
            "CAST(CASE WHEN (m.n * CAST(d.cents AS HUGEINT) - m.s) "
            "* (m.n * CAST(d.cents AS HUGEINT) - m.s) "
            "> 4 * (m.n * m.ss - m.s * m.s) THEN 1 ELSE 0 END "
            "AS BIGINT) AS is_outlier FROM d, m"),
        "view_purchase_within3_events": (
            "WITH o AS (SELECT user_id, event_type, "
            "lead(event_type, 1) OVER w AS t1, "
            "lead(event_type, 2) OVER w AS t2, "
            "lead(event_type, 3) OVER w AS t3 FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT user_id, "
            "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_views, "
            "CAST(SUM(CASE WHEN event_type = 'view' AND ("
            "t1 = 'purchase' OR t2 = 'purchase' OR t3 = 'purchase') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_views "
            "FROM o GROUP BY 1"),
        "events_hourly_ohlc": (
            "WITH w AS (SELECT date_trunc('hour', ts) AS hour, "
            "event_type, CAST(round(value * 100) AS BIGINT) AS cents, "
            "row_number() OVER (PARTITION BY date_trunc('hour', ts), "
            "event_type ORDER BY ts, event_id) AS rf, "
            "row_number() OVER (PARTITION BY date_trunc('hour', ts), "
            "event_type ORDER BY ts DESC, event_id DESC) AS rl "
            "FROM events) "
            "SELECT CAST(hour AS TIMESTAMP) AS hour, event_type, "
            "CAST(MAX(CASE WHEN rf = 1 THEN cents END) AS BIGINT) "
            "AS open_cents, "
            "CAST(MAX(cents) AS BIGINT) AS high_cents, "
            "CAST(MIN(cents) AS BIGINT) AS low_cents, "
            "CAST(MAX(CASE WHEN rl = 1 THEN cents END) AS BIGINT) "
            "AS close_cents FROM w GROUP BY 1, 2"),
        "user_daily_twap": (
            "WITH o AS (SELECT user_id, ts, "
            "CAST(round(value * 100) AS BIGINT) AS cents, "
            "date_trunc('day', ts) AS day, "
            "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS nxt FROM events), "
            "d AS (SELECT user_id, day, cents, "
            "CASE WHEN nxt IS NOT NULL AND date_trunc('day', nxt) = day "
            "THEN epoch_us(nxt) ELSE epoch_us(day + INTERVAL 1 DAY) END "
            "- epoch_us(ts) AS dur FROM o) "
            "SELECT user_id, CAST(day AS TIMESTAMP) AS day, "
            "CAST(SUM(cents * dur) AS BIGINT) AS twap_num, "
            "CAST(SUM(dur) AS BIGINT) AS dur_us FROM d GROUP BY 1, 2"),
        "order_overlap_pairs_per_customer": (
            "WITH s AS (SELECT o.o_custkey, o.o_orderkey, "
            "LEAST(o.o_orderdate, m.last_ship) AS lo, "
            "GREATEST(o.o_orderdate, m.last_ship) AS hi FROM orders o "
            "JOIN (SELECT l_orderkey, max(l_shipdate) AS last_ship "
            "FROM lineitem GROUP BY 1) m ON m.l_orderkey = o.o_orderkey), "
            "p AS (SELECT a.o_custkey, count(*) AS np FROM s a "
            "JOIN s b ON a.o_custkey = b.o_custkey "
            "AND a.o_orderkey < b.o_orderkey "
            "AND a.lo <= b.hi AND b.lo <= a.hi GROUP BY 1), "
            "c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) "
            "AS n_orders FROM s GROUP BY 1) "
            "SELECT c.o_custkey, c.n_orders, "
            "CAST(COALESCE(p.np, 0) AS BIGINT) AS n_overlap_pairs "
            "FROM c LEFT JOIN p ON p.o_custkey = c.o_custkey"),
        "supplier_borda_top10": (
            "WITH m AS (SELECT l_suppkey, "
            "SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS revenue_cents, "
            "count(DISTINCT l_partkey) AS n_parts FROM lineitem "
            "GROUP BY 1), "
            "r AS (SELECT l_suppkey, "
            "row_number() OVER (ORDER BY revenue_cents DESC, l_suppkey) "
            "AS rank_revenue, "
            "row_number() OVER (ORDER BY n_parts DESC, l_suppkey) "
            "AS rank_parts FROM m) "
            "SELECT l_suppkey, CAST(rank_revenue AS BIGINT) "
            "AS rank_revenue, CAST(rank_parts AS BIGINT) AS rank_parts, "
            "CAST(rank_revenue + rank_parts AS BIGINT) AS borda FROM r "
            "ORDER BY borda, l_suppkey LIMIT 10"),
        "diversified_top_orders": (
            "WITH r AS (SELECT o_orderkey, o_custkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY round(o_totalprice * 100) DESC, o_orderkey) AS rn "
            "FROM orders) "
            "SELECT o_orderkey, o_custkey, price_cents FROM r "
            "WHERE rn <= 2 ORDER BY price_cents DESC, o_orderkey "
            "LIMIT 10"),
        "coorder_degree_assortativity": (
            "WITH op AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM ("
            "SELECT u AS node FROM e UNION ALL SELECT v FROM e) "
            "GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_edges, "
            "CAST(SUM(du.deg * dv.deg) AS BIGINT) AS sum_dudv, "
            "CAST(SUM(du.deg + dv.deg) AS BIGINT) AS sum_deg, "
            "CAST(SUM(du.deg * du.deg + dv.deg * dv.deg) AS BIGINT) "
            "AS sum_degsq FROM e "
            "JOIN d du ON e.u = du.node JOIN d dv ON e.v = dv.node"),
        "fingerprint_collision_audit": (
            "WITH d AS (SELECT DISTINCT md5(text) AS fp FROM documents), "
            "b AS (SELECT substr(fp, 1, 4) AS prefix, "
            "CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1) "
            "SELECT n AS bucket_size, "
            "CAST(count(*) AS BIGINT) AS n_buckets FROM b GROUP BY 1"),
        "brand_rank_churn": (
            "WITH g AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS y, "
            "p.p_brand AS brand, "
            "SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1, 2), "
            "years AS (SELECT DISTINCT y FROM g), "
            "brands AS (SELECT DISTINCT brand FROM g), "
            "grid AS (SELECT years.y, brands.brand, "
            "COALESCE(g.cents, 0) AS cents FROM years CROSS JOIN brands "
            "LEFT JOIN g ON g.y = years.y AND g.brand = brands.brand), "
            "r AS (SELECT y, brand, row_number() OVER (PARTITION BY y "
            "ORDER BY cents DESC, brand) AS rnk FROM grid), "
            "ch AS (SELECT a.brand, SUM(abs(b.rnk - a.rnk)) AS churn "
            "FROM r a JOIN r b ON a.brand = b.brand AND b.y = a.y + 1 "
            "GROUP BY 1) "
            "SELECT brands.brand, "
            "CAST(COALESCE(ch.churn, 0) AS BIGINT) AS rank_churn, "
            "CAST((SELECT count(*) FROM years) AS BIGINT) AS n_years "
            "FROM brands LEFT JOIN ch ON ch.brand = brands.brand"),
        "same_month_ship_share_by_year": (
            "WITH j AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) "
            "AS order_year, CASE WHEN date_trunc('month', l.l_shipdate) "
            "= date_trunc('month', o.o_orderdate) THEN 1 ELSE 0 END "
            "AS same FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey) "
            "SELECT order_year, CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(SUM(same) AS BIGINT) AS n_same_month, "
            "CAST((1000000 * SUM(same)) // count(*) AS BIGINT) "
            "AS same_month_ppm FROM j GROUP BY 1"),
        "priority_value_drift_l1": (
            "WITH c AS (SELECT o_orderpriority AS priority, "
            "CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) > 0 "
            "THEN CAST(floor(log2(CAST(round(o_totalprice * 100) "
            "AS BIGINT))) AS BIGINT) ELSE -1 END AS bucket, "
            "CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END "
            "AS era FROM orders), "
            "g AS (SELECT priority, bucket, "
            "SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS na, "
            "SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS nb "
            "FROM c GROUP BY 1, 2), "
            "t AS (SELECT priority, SUM(na) AS ta, SUM(nb) AS tb "
            "FROM g GROUP BY 1) "
            "SELECT g.priority, CAST(t.ta AS BIGINT) AS n_before, "
            "CAST(t.tb AS BIGINT) AS n_after, "
            "CAST(SUM(abs(g.na * t.tb - g.nb * t.ta)) AS BIGINT) "
            "AS l1_num FROM g JOIN t ON g.priority = t.priority "
            "GROUP BY 1, 2, 3"),
        "quantity_ks_between_flags": (
            "WITH c AS (SELECT l_returnflag AS flag, "
            "CAST(round(l_quantity * 100) AS BIGINT) AS q, "
            "count(*) AS n FROM lineitem "
            "WHERE l_returnflag IN ('A', 'R') GROUP BY 1, 2), "
            "v AS (SELECT DISTINCT q FROM c), "
            "cum AS (SELECT v.q, "
            "SUM(CASE WHEN c.flag = 'A' THEN c.n ELSE 0 END) AS ca, "
            "SUM(CASE WHEN c.flag = 'R' THEN c.n ELSE 0 END) AS cb "
            "FROM v LEFT JOIN c ON c.q <= v.q GROUP BY 1), "
            "tot AS (SELECT SUM(CASE WHEN flag = 'A' THEN n ELSE 0 END) "
            "AS na, SUM(CASE WHEN flag = 'R' THEN n ELSE 0 END) AS nb "
            "FROM c) "
            "SELECT CAST(tot.na AS BIGINT) AS n_a, "
            "CAST(tot.nb AS BIGINT) AS n_b, "
            "CAST(MAX(abs(cum.ca * tot.nb - cum.cb * tot.na)) AS BIGINT) "
            "AS ks_num FROM cum, tot GROUP BY 1, 2"),
        "dedup_survivorship_stats": (
            "WITH k AS (SELECT doc_id, length(text) AS ch, "
            "CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) "
            "THEN 'kept' ELSE 'dropped' END AS status FROM documents) "
            "SELECT status, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(ch) AS BIGINT) AS total_chars FROM k GROUP BY 1"),
        "shipdate_zonemap_overlap": (
            "WITH e AS (SELECT l_orderkey // 1000 AS chunk, "
            "min(l_shipdate) AS mn, max(l_shipdate) AS mx "
            "FROM lineitem GROUP BY 1), "
            "p AS (SELECT count(*) AS np FROM e a JOIN e b "
            "ON a.chunk < b.chunk AND a.mn <= b.mx AND b.mn <= a.mx), "
            "c AS (SELECT count(*) AS nc FROM e) "
            "SELECT CAST(c.nc AS BIGINT) AS n_chunks, "
            "CAST(p.np AS BIGINT) AS n_overlapping_pairs, "
            "CAST(CASE WHEN c.nc >= 2 THEN (1000000 * p.np) // "
            "(c.nc * (c.nc - 1) // 2) ELSE 0 END AS BIGINT) "
            "AS overlap_ppm FROM p, c"),
        "source_weighted_jaccard": (
            "WITH c AS (SELECT source, tok, "
            "CAST(count(*) AS BIGINT) AS n FROM ("
            "SELECT source, unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1, 2), "
            "tot AS (SELECT source, SUM(n) AS t FROM c GROUP BY 1), "
            "m AS (SELECT a.source AS sa, b.source AS sb, "
            "SUM(LEAST(a.n, b.n)) AS mn FROM c a JOIN c b "
            "ON a.tok = b.tok AND a.source < b.source GROUP BY 1, 2) "
            "SELECT m.sa AS source_a, m.sb AS source_b, "
            "CAST(m.mn AS BIGINT) AS min_sum, "
            "CAST(ta.t + tb.t - m.mn AS BIGINT) AS max_sum, "
            "CAST((1000000 * m.mn) // (ta.t + tb.t - m.mn) AS BIGINT) "
            "AS wjaccard_ppm FROM m "
            "JOIN tot ta ON ta.source = m.sa "
            "JOIN tot tb ON tb.source = m.sb"),
        "qty_discount_cov_by_flag": (
            "WITH x AS (SELECT l_returnflag, "
            "CAST(round(l_quantity * 100) AS BIGINT) AS q, "
            "CAST(round(l_discount * 100) AS BIGINT) AS d "
            "FROM lineitem) "
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
            "CAST(SUM(q) AS BIGINT) AS sum_q, "
            "CAST(SUM(d) AS BIGINT) AS sum_d, "
            "CAST(SUM(q * d) AS BIGINT) AS sum_qd, "
            "CAST(count(*) * SUM(q * d) - SUM(q) * SUM(d) AS BIGINT) "
            "AS cov_num FROM x GROUP BY 1"),
        "priority_dow_independence": (
            "WITH cells AS (SELECT CAST(isodow(o_orderdate) AS BIGINT) "
            "AS dow, o_orderpriority AS priority, "
            "CAST(count(*) AS BIGINT) AS obs FROM orders GROUP BY 1, 2), "
            "t AS (SELECT SUM(obs) AS total FROM cells), "
            "r AS (SELECT dow, SUM(obs) AS rt FROM cells GROUP BY 1), "
            "k AS (SELECT priority, SUM(obs) AS ct FROM cells GROUP BY 1) "
            "SELECT cells.dow, cells.priority, cells.obs, "
            "CAST(cells.obs * t.total - r.rt * k.ct AS BIGINT) "
            "AS dev_num FROM cells, t "
            "JOIN r ON r.dow = cells.dow "
            "JOIN k ON k.priority = cells.priority"),
        "embedding_dim_variance": (
            "WITH v AS (SELECT CAST(k - 1 AS BIGINT) AS dim, "
            "CAST(round(CAST(embedding[CAST(k AS INT)] AS DOUBLE) "
            "* 10000) AS BIGINT) AS q "
            "FROM embeddings, range(1, 65) r(k)) "
            "SELECT dim, CAST(count(*) AS BIGINT) AS n, "
            "CAST(SUM(q) AS BIGINT) AS sum_e4, "
            "CAST(SUM(q * q) AS BIGINT) AS sumsq_e8, "
            "CAST(count(*) * SUM(q * q) - SUM(q) * SUM(q) AS BIGINT) "
            "AS var_num_e8 FROM v GROUP BY 1"),
        "dau_overlap_jaccard": (
            "WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, "
            "user_id FROM events), "
            "c AS (SELECT day, CAST(count(*) AS BIGINT) AS n "
            "FROM du GROUP BY 1), "
            "i AS (SELECT a.day, CAST(count(*) AS BIGINT) AS inter "
            "FROM du a JOIN du b ON a.user_id = b.user_id "
            "AND b.day = a.day + INTERVAL 1 DAY GROUP BY 1) "
            "SELECT CAST(c.day AS TIMESTAMP) AS day, c.n AS n_today, "
            "c2.n AS n_next, "
            "CAST(COALESCE(i.inter, 0) AS BIGINT) AS n_both, "
            "CAST((1000000 * COALESCE(i.inter, 0)) // "
            "(c.n + c2.n - COALESCE(i.inter, 0)) AS BIGINT) "
            "AS jaccard_ppm FROM c "
            "JOIN c c2 ON c2.day = c.day + INTERVAL 1 DAY "
            "LEFT JOIN i ON i.day = c.day"),
        "join_size_estimate": (
            "WITH l AS (SELECT l_orderkey AS k, "
            "CAST(count(*) AS BIGINT) AS nl FROM lineitem GROUP BY 1), "
            "r AS (SELECT o_orderkey AS k, "
            "CAST(count(*) AS BIGINT) AS nr FROM orders GROUP BY 1), "
            "j AS (SELECT l.nl, r.nr FROM l JOIN r ON l.k = r.k) "
            "SELECT CAST(SUM(nl) AS BIGINT) AS n_left_rows, "
            "CAST(count(*) AS BIGINT) AS n_keys_both, "
            "CAST(SUM(nl * nr) AS BIGINT) AS est_join_rows FROM j"),
        "event_value_log2_hist": (
            "WITH b AS (SELECT event_type, "
            "CASE WHEN CAST(round(value * 100) AS BIGINT) > 0 "
            "THEN CAST(floor(log2(CAST(round(value * 100) AS BIGINT))) "
            "AS BIGINT) ELSE -1 END AS bucket FROM events) "
            "SELECT event_type, bucket, "
            "CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2"),
        "user_late_events": (
            "WITH o AS (SELECT user_id, ts, max(ts) OVER ("
            "PARTITION BY user_id ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm "
            "FROM events) "
            "SELECT user_id, CAST(SUM(CASE WHEN wm IS NOT NULL AND "
            "epoch_us(ts) < epoch_us(wm) - 60000000 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_late, "
            "CAST(count(*) AS BIGINT) AS n_events FROM o GROUP BY 1"),
        "event_type_daily_dominance": (
            "WITH d AS (SELECT date_trunc('day', ts) AS day, event_type, "
            "count(*) AS n FROM events GROUP BY 1, 2), "
            "t AS (SELECT DISTINCT event_type FROM events), "
            "days AS (SELECT DISTINCT day FROM d), "
            "grid AS (SELECT days.day, t.event_type, COALESCE(d.n, 0) "
            "AS n FROM days CROSS JOIN t LEFT JOIN d "
            "ON days.day = d.day AND t.event_type = d.event_type) "
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "CAST(SUM(CASE WHEN a.n > b.n THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_days_a_wins FROM grid a JOIN grid b "
            "ON a.day = b.day AND a.event_type <> b.event_type "
            "GROUP BY 1, 2"),
        "lineitem_table_checksum": (
            "SELECT bit_xor(CAST(CONCAT('0x', substr(md5("
            "CAST(l_orderkey AS VARCHAR) || '|' || "
            "CAST(l_linenumber AS VARCHAR) || '|' || "
            "CAST(CAST(round(l_quantity * 100) AS BIGINT) AS VARCHAR)"
            "), 1, 15)) AS BIGINT)) AS checksum, "
            "CAST(count(*) AS BIGINT) AS n_rows FROM lineitem"),
        "cust_supp_balance_matches": (
            "SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey, "
            "CAST(count(*) AS BIGINT) AS n_pairs FROM customer c "
            "JOIN supplier s ON c.c_nationkey = s.s_nationkey "
            "AND CAST(round(c.c_acctbal * 100) AS BIGINT) BETWEEN "
            "CAST(round(s.s_acctbal * 100) AS BIGINT) - 1000 AND "
            "CAST(round(s.s_acctbal * 100) AS BIGINT) + 1000 "
            "GROUP BY 1"),
        "session_conversion_ppm": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - "
            "epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END "
            "AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, event_type, sum(brk) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "g AS (SELECT user_id, sid, "
            "max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv, "
            "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
            "AS hp FROM s GROUP BY 1, 2) "
            "SELECT CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(SUM(hv) AS BIGINT) AS n_view_sessions, "
            "CAST(SUM(hv * hp) AS BIGINT) AS n_converted, "
            "CAST((1000000 * SUM(hv * hp)) // SUM(hv) AS BIGINT) "
            "AS conversion_ppm FROM g"),
        "daily_revenue_interpolated": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1), "
            "b AS (SELECT min(day) AS lo, max(day) AS hi FROM d), "
            "spine AS (SELECT CAST(unnest(generate_series(lo, hi, "
            "INTERVAL 1 DAY)) AS DATE) AS day FROM b), "
            "j AS (SELECT spine.day, d.cents FROM spine "
            "LEFT JOIN d ON spine.day = d.day), "
            "w AS (SELECT day, cents, "
            "last_value(cents IGNORE NULLS) OVER (ORDER BY day) AS pv, "
            "last_value(CASE WHEN cents IS NOT NULL THEN day END "
            "IGNORE NULLS) OVER (ORDER BY day) AS pd, "
            "first_value(cents IGNORE NULLS) OVER (ORDER BY day "
            "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv, "
            "first_value(CASE WHEN cents IS NOT NULL THEN day END "
            "IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW "
            "AND UNBOUNDED FOLLOWING) AS nd FROM j) "
            "SELECT CAST(day AS TIMESTAMP) AS day, "
            "CAST(CASE WHEN cents IS NOT NULL THEN cents "
            "ELSE pv + ((nv - pv) * (day - pd)) // (nd - pd) "
            "- CASE WHEN ((nv - pv) * (day - pd)) % (nd - pd) <> 0 "
            "AND (nv - pv) * (day - pd) < 0 THEN 1 ELSE 0 END END "
            "AS BIGINT) AS revenue_cents, "
            "CAST(CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS BIGINT) "
            "AS interpolated FROM w"),
        "events_rate_limited": (
            "SELECT event_id FROM (SELECT event_id, row_number() OVER ("
            "PARTITION BY user_id, date_trunc('minute', ts) "
            "ORDER BY ts, event_id) AS rn FROM events) WHERE rn <= 2"),
        "order_first_ship_lag_hist": (
            "WITH m AS (SELECT l_orderkey, min(l_shipdate) AS fs "
            "FROM lineitem GROUP BY 1) "
            "SELECT CAST(CAST(m.fs AS DATE) - CAST(o.o_orderdate AS DATE) "
            "AS BIGINT) AS lag_days, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM m JOIN orders o ON m.l_orderkey = o.o_orderkey "
            "GROUP BY 1"),
        "doc_longest_token": (
            "WITH t AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS tok FROM documents), "
            "r AS (SELECT doc_id, tok, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY length(tok) DESC, tok) AS rn "
            "FROM t) "
            "SELECT doc_id, tok AS longest_token, "
            "CAST(length(tok) AS BIGINT) AS token_len FROM r "
            "WHERE rn = 1"),
        "top_token_context_diversity": (
            "WITH c AS (SELECT tok, count(*) AS n FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents) GROUP BY 1), "
            "head AS (SELECT tok FROM c "
            "ORDER BY n DESC, tok LIMIT 20), "
            "bg AS (SELECT DISTINCT toks[i] AS tok, "
            "toks[i + 1] AS next_tok FROM ("
            "SELECT string_split(text, ' ') AS toks FROM documents), "
            "unnest(range(1, len(toks))) t(i)) "
            "SELECT bg.tok, CAST(count(*) AS BIGINT) AS n_contexts "
            "FROM bg JOIN head ON bg.tok = head.tok GROUP BY 1"),
        "customer_balance_peers": (
            "SELECT a.c_custkey, CAST(count(b.c_custkey) - 1 AS BIGINT) "
            "AS n_peers FROM customer a JOIN customer b "
            "ON a.c_nationkey = b.c_nationkey "
            "AND CAST(round(b.c_acctbal * 100) AS BIGINT) BETWEEN "
            "CAST(round(a.c_acctbal * 100) AS BIGINT) - 10000 AND "
            "CAST(round(a.c_acctbal * 100) AS BIGINT) + 10000 "
            "GROUP BY 1"),
        "source_exclusive_vocab": (
            "WITH p AS (SELECT DISTINCT tok, source FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok, source "
            "FROM documents)), "
            "x AS (SELECT tok, min(source) AS source FROM p "
            "GROUP BY 1 HAVING count(*) = 1) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_exclusive "
            "FROM x GROUP BY 1"),
        "user_event_id_inversions": (
            "WITH inv AS (SELECT a.user_id, "
            "CAST(count(*) AS BIGINT) AS n_inversions "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND a.ts < b.ts AND a.event_id > b.event_id GROUP BY 1), "
            "tot AS (SELECT user_id, CAST(count(*) AS BIGINT) "
            "AS n_events FROM events GROUP BY 1) "
            "SELECT tot.user_id, "
            "CAST(COALESCE(inv.n_inversions, 0) AS BIGINT) "
            "AS n_inversions, tot.n_events FROM tot "
            "LEFT JOIN inv ON tot.user_id = inv.user_id"),
        "user_type_run_counts": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) IS DISTINCT FROM event_type "
            "THEN 1 ELSE 0 END AS brk FROM events), "
            "s AS (SELECT user_id, sum(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS rid "
            "FROM o), "
            "runs AS (SELECT user_id, rid, count(*) AS run_len "
            "FROM s GROUP BY 1, 2) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_runs, "
            "CAST(max(run_len) AS BIGINT) AS longest_run "
            "FROM runs GROUP BY 1"),
        "lang_confusion_matrix": (
            "SELECT lang, CASE WHEN 5 * len(list_filter("
            "string_split(text,' '), "
            f"x -> x IN {_STOPLIST_SQL})) >= len(string_split(text,' ')) "
            "THEN 'eng' ELSE 'unknown' END AS lang_pred, "
            "CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY 1, 2"),
        "q19_disjunctive_revenue": (
            "SELECT CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_cp "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 10) "
            "OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30)"),
        "idle_customers_by_nation": (
            "SELECT n_name, CAST(count(*) AS BIGINT) AS n_idle_customers "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey) GROUP BY n_name"),
        "event_type_jaccard": (
            "WITH tu AS (SELECT DISTINCT event_type, user_id FROM events), "
            "c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n "
            "FROM tu GROUP BY 1), "
            "p AS (SELECT a.event_type AS ta, b.event_type AS tb, "
            "CAST(count(*) AS BIGINT) AS nb FROM tu a "
            "JOIN tu b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2) "
            "SELECT ta AS type_a, tb AS type_b, ca.n AS n_a, cb.n AS n_b, "
            "nb AS n_both, "
            "CAST(nb * 1000000 // (ca.n + cb.n - nb) AS BIGINT) "
            "AS jaccard_ppm FROM p "
            "JOIN c ca ON ta = ca.event_type "
            "JOIN c cb ON tb = cb.event_type"),
        "q14_promo_revenue_ppm": (
            "WITH r AS (SELECT l_partkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev "
            "FROM lineitem), "
            "s AS (SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev "
            "ELSE 0 END) AS BIGINT) AS promo_cp, "
            "CAST(SUM(rev) AS BIGINT) AS total_cp "
            "FROM r JOIN part ON l_partkey = p_partkey) "
            "SELECT promo_cp, total_cp, "
            "CAST(CAST(promo_cp AS HUGEINT) * 1000000 // total_cp "
            "AS BIGINT) AS promo_ppm FROM s"),
        "user_value_quartiles": (
            "SELECT event_id, user_id, value, "
            "CAST(ntile(4) OVER (PARTITION BY user_id "
            "ORDER BY value, event_id) AS BIGINT) AS quartile FROM events"),
        "major_parts_by_revenue": (
            "WITH r AS (SELECT l_partkey, CAST(SUM("
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_cp FROM lineitem GROUP BY 1) "
            "SELECT l_partkey, revenue_cp FROM r "
            "WHERE revenue_cp * 1000000 > "
            "600 * (SELECT SUM(revenue_cp) FROM r)"),
        "embedding_norm_stats_by_label": (
            "WITH n AS (SELECT CAST(label AS BIGINT) AS label, "
            "CAST(list_sum([CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)"
            " * CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) "
            "FOR x IN embedding]) AS BIGINT) AS norm2 FROM embeddings) "
            "SELECT label, CAST(count(*) AS BIGINT) AS n_vectors, "
            "CAST(SUM(norm2) AS BIGINT) AS norm2_sum, "
            "MIN(norm2) AS norm2_min, MAX(norm2) AS norm2_max "
            "FROM n GROUP BY label"),
        "late_ship_priority_counts": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) "
            "AS n_late_orders FROM orders WHERE EXISTS "
            "(SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            "AND l_shipdate > o_orderdate + INTERVAL 90 DAY) "
            "GROUP BY o_orderpriority"),
        "event_dedup_60s": (
            "SELECT event_id, ts, user_id, event_type FROM "
            "(SELECT event_id, ts, user_id, event_type, "
            "lag(ts) OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) AS prev_ts FROM events) "
            "WHERE prev_ts IS NULL OR ts - prev_ts >= INTERVAL 60 SECOND"),
        "doc_blocklist_scrub": (
            "SELECT doc_id, regexp_replace(text, "
            "'\\b(customer|spark|secret)\\b', '<SCRUBBED>', 'g') "
            "AS text_scrubbed, "
            "CAST(len(regexp_extract_all(text, "
            "'\\b(customer|spark|secret)\\b')) AS BIGINT) AS n_scrubbed "
            "FROM documents"),
        "user_path_prefixes": (
            "WITH r AS (SELECT user_id, event_type, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn, ts, event_id FROM events), "
            "p AS (SELECT user_id, string_agg(event_type, '>' "
            "ORDER BY ts, event_id) AS path FROM r WHERE rn <= 3 "
            "GROUP BY 1) "
            "SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM p "
            "GROUP BY 1"),
        "daily_order_counts_dense": (
            "WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo, "
            "CAST(max(o_orderdate) AS DATE) AS hi FROM orders), "
            "spine AS (SELECT unnest(generate_series(lo, hi, "
            "INTERVAL 1 DAY)) AS day FROM b), "
            "a AS (SELECT date_trunc('day', o_orderdate) AS day, "
            "CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1) "
            "SELECT CAST(spine.day AS TIMESTAMP) AS day, "
            "CAST(COALESCE(a.n, 0) AS BIGINT) AS n_orders "
            "FROM spine LEFT JOIN a ON spine.day = a.day"),
        "selfjoin_cardinality_by_part": (
            "SELECT CAST((SELECT count(*) FROM lineitem a JOIN lineitem b "
            "ON a.l_partkey = b.l_partkey) AS BIGINT) AS join_rows, "
            "CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_keys "
            "FROM lineitem"),
        "nation_revenue_share_ppm": (
            "WITH r AS (SELECT n_name, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS cents FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1) "
            "SELECT n_name, cents AS revenue_cents, "
            "CAST(cents * 1000000 // (SELECT sum(cents) FROM r) AS BIGINT) "
            "AS share_ppm FROM r"),
        "region_priority_matrix": (
            "WITH a AS (SELECT r_name, o_orderpriority AS pr, "
            "CAST(count(*) AS BIGINT) AS n FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2), "
            "d AS (SELECT r_name, pr FROM (SELECT DISTINCT r_name "
            "FROM region), (SELECT DISTINCT o_orderpriority AS pr "
            "FROM orders)) "
            "SELECT d.r_name, d.pr AS priority, "
            "CAST(COALESCE(a.n, 0) AS BIGINT) AS n_orders FROM d "
            "LEFT JOIN a ON d.r_name = a.r_name AND d.pr = a.pr"),
        "token_typo_pairs": (
            "WITH v AS (SELECT DISTINCT unnest(string_split(text, ' ')) "
            "AS tok FROM documents) "
            "SELECT a.tok AS ta, b.tok AS tb FROM v a JOIN v b "
            "ON a.tok < b.tok AND levenshtein(a.tok, b.tok) = 1"),
        "user_outlier_events": (
            "WITH e AS (SELECT event_id, user_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "s AS (SELECT user_id, CAST(sum(cents) AS BIGINT) AS sc, "
            "CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1) "
            "SELECT event_id, e.user_id, cents FROM e JOIN s USING "
            "(user_id) WHERE cents * n > 3 * sc"),
        "rolling_7d_active_users": (
            "WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id "
            "FROM events), "
            "ex AS (SELECT d + to_days(CAST(o AS INT)) AS d, user_id "
            "FROM du, UNNEST(range(0, 7)) t(o)) "
            "SELECT CAST(d AS TIMESTAMP) AS day, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS wau "
            "FROM ex GROUP BY 1"),
        "token_offset_packing": (
            "WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS nt "
            "FROM documents) "
            "SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens, "
            "CAST(COALESCE(sum(nt) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS BIGINT) AS start_tok, "
            "CAST(COALESCE(sum(nt) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "// 4096 AS BIGINT) AS chunk_id FROM t"),
        "decontaminate_5gram": (
            "WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "gg AS (SELECT doc_id, CASE WHEN len(t) >= 5 THEN "
            "[array_to_string(t[i:i+4], ' ') FOR i IN range(1, len(t) - 3)] "
            "ELSE [] END AS gs FROM tk), "
            "ev AS (SELECT DISTINCT g FROM gg, UNNEST(gs) u(g) "
            "WHERE doc_id < 10), "
            "tr AS (SELECT doc_id, gs FROM gg WHERE doc_id >= 10), "
            "hits AS (SELECT tr.doc_id, count(*) AS n FROM tr, "
            "UNNEST(gs) w(g) JOIN ev USING (g) GROUP BY 1) "
            "SELECT tr.doc_id, CAST(COALESCE(hits.n, 0) AS BIGINT) "
            "AS n_matches FROM tr LEFT JOIN hits ON tr.doc_id = hits.doc_id"),
        "session_duration_stats": (
            "WITH o AS (SELECT user_id, ts, lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts) AS prev FROM events), "
            "g AS (SELECT user_id, ts, CASE WHEN prev IS NULL "
            "OR ts - prev > INTERVAL 1800 SECOND THEN 1 ELSE 0 END "
            "AS brk FROM o), "
            "s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM g), "
            "d AS (SELECT user_id, sid, epoch_us(max(ts)) - epoch_us(min(ts)) "
            "AS dur FROM s GROUP BY 1, 2) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(sum(dur) AS BIGINT) AS total_dur_us, "
            "CAST(max(dur) AS BIGINT) AS longest_dur_us "
            "FROM d GROUP BY user_id"),
        "user_value_trend": (
            "WITH e AS (SELECT user_id, "
            "CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x, "
            "CAST(round(value * 100) AS BIGINT) AS y FROM events) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(x) AS BIGINT) AS sum_x, "
            "CAST(sum(y) AS BIGINT) AS sum_y, "
            "CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) "
            "AS trend_num, "
            "CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) "
            "AS trend_den FROM e GROUP BY user_id"),
        "lang_char_trigrams": (
            "WITH tg AS (SELECT lang, substr(text, i, 3) AS tri "
            "FROM documents, UNNEST(range(1, length(text) - 1)) t(i)) "
            "SELECT lang, tri, n, rnk FROM ("
            "SELECT lang, tri, CAST(count(*) AS BIGINT) AS n, "
            "CAST(row_number() OVER (PARTITION BY lang "
            "ORDER BY count(*) DESC, tri ASC) AS BIGINT) AS rnk "
            "FROM tg GROUP BY lang, tri) WHERE rnk <= 5"),
    }
