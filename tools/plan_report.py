"""Generate PLANS.md: physical-plan evidence for the headline queries
(pushdown, pruning, join strategies, codegen) so plan properties are
reviewable without running Spark.

Usage: PYTHONPATH=. python tools/plan_report.py
"""

from __future__ import annotations

import re
import sys

# PLANS.md must cover every benched query (bench.py HEADLINE is the
# floor, merged in main() — a benched query without committed plan
# evidence is unreviewable); EXTRA adds plan-interesting queries that
# are not benchmark headliners.
EXTRA = [
    "scan_parquet",
    "filter_pred",
    "agg_groupby",
    "join_broadcast",
    "join_multiway",
    "join_asof",
    "join_bucketed",
    "limit_topk",
    "win_rank_topk",
    "dedup_minhash",
    "dedup_jaccard_prefix",
    "sim_topk",
    "sim_ann_lsh",
    "sim_ann_ivf_trained",
    "dedup_embedding_lsh",
    "decontaminate_ngram",
    "mix_sources_weighted",
    "text_pii_mask",
    "extract_dispatch",
    "tpch_q18_large_orders",
    "text_gopher_rules",
    "dedup_containment",
    "sim_ann_pq",
    "agg_bloom_prefilter",
    "tpch_q7_volume",
    "graph_triangle_count",
    "zorder_cluster_audit",
    "cdc_merge_apply",
    "tpch_q19_disjunctive",
    "dedup_lsh_recall_audit",
    "join_dpp",
    "latency_ship_percentiles",
    "tpch_q6_forecast",
    "tpch_q13_custdist",
    "tpch_q21_waiting",
    "revenue_gini",
    "text_oov_rate",
    "dq_referential_integrity",
    "sim_topk_batch",
    "fn_variant_json",
    "sql_recursive_tree",
    "subq_lateral_topn",
    "ivm_merge_agg",
    "pack_concat_chunks",
    "shuffle_deterministic",
    "sample_stratified_exact",
    "table_snapshot_diff",
    "skew_diagnose_keys",
    "dedup_incremental_minhash",
    "sample_hard_negatives",
    "orders_basket_affinity",
    "corpus_domain_stats",
    "chunk_overlap_windows",
    "dedup_normalized",
    "orders_abc_pareto",
    "embedding_centroid_stats",
    "events_active_users_trailing7d",
    "dq_uniqueness_audit",
    "orders_backlog_sweepline",
    "join_null_safe_classes",
    "orders_fulfillment_lag",
    "events_ab_test_lift",
    "join_scd2_asof",
    "mix_temperature_sampling",
    "join_geo_grid",
    "geo_hotspot_cells",
    "dq_k_anonymity",
    "sample_pps_systematic",
    "timeseries_ewma",
    "text_collocation_lift",
    "text_boolean_search",
    "events_bounce_rate",
    "orders_skyline_2d",
    "orders_prorate_monthly",
    "events_seasonal_profile",
    "join_spatial_knn",
    "dq_freshness_audit",
    # round-4 (driver r4) additions
    "win_ntile_percent",
    "rfm_segmentation",
    "part_abc_pareto",
    "text_vocab_growth",
    "fn_surrogate_key",
    "tpch_q1_pricing_summary",
    "agg_ols_regression",
    "embedding_pca_power",
    "sample_kcenter_diverse",
    "dq_rule_engine",
    "extract_detect_filetype",
    "extract_test_sweep",
    "scan_xml_nested",
    "sort_paginate",
    "sql_parameterized",
    "df_transpose",
    "text_bpe_pair_census",
    "events_path_trigrams",
    "mix_epoch_plan",
    "pack_shard_manifest",
    "sim_search_filtered",
    "udf_iterator_series",
    "agg_percentile_cont",
    "dedup_sorted_neighborhood",
    "multimodal_phash_dedup",
    "events_diff_in_diff",
    "dq_outlier_iqr",
    "text_keyword_rake",
    "dq_books_balance",
    # round-6 (driver r5) additions
    "dq_ks_two_sample",
    "dedup_paragraphs",
    "dedup_url_canonical",
    "embedding_matryoshka_audit",
    "sim_ann_recall_curve",
    "agg_ols_two_features",
    "join_bloom_runtime",
    "sample_reservoir_bottomk",
    # round-7 (driver r6) additions: the stats.py module + headliners
    "dq_chi2_independence",
    "dq_mann_whitney",
    "dq_mutual_information",
    "dq_theil_index",
    "dq_psi_drift",
    "dq_simpson_screen",
    "text_entropy_unigram",
    "text_zipf_slope",
    "text_vocab_coverage_curve",
    "text_bigram_cond_entropy",
    "text_winnowing_fingerprint",
    "text_langid_confusion",
    "graph_degree_stats",
    "graph_kcore",
    "embedding_dim_variance_audit",
    "tokenizer_bpe_encode",
    "multimodal_tile_stats",
    "multimodal_aspect_bucket",
    "multimodal_channel_correlation",
    "multimodal_decode_errors",
    "win_distinct_rolling",
    "win_pattern_funnel_regex",
    "win_interval_coalesce",
    "sim_distribution_audit",
    "sample_importance_hash",
    "sample_stratified_neyman",
    "join_asof_tolerance",
    "events_markov_attribution",
    "events_funnel_steps",
    "orders_holt_forecast",
    "orders_survival_km",
    "pack_bin_ffd",
    # round-8 (driver r7) additions
    "tokenizer_bpe_train",
    "tokenizer_bpe_vocab",
    "graph_hits",
    "sim_mmr_rerank",
    "mix_domain_reweight",
    "text_keyphrase_textrank",
    "events_changepoint_binary",
    "agg_cms_heavy_hitters",
    "agg_hll_distinct",
    "stream_hll_distinct",
    "stream_cms_heavy_hitters",
    "multimodal_patch_pool",
    "scd2_build_history",
    "text_readability",
    "dedup_cluster_medoid",
    "extract_dispatch_roundtrip",
    "orders_cohort_ltv",
    "stream_scd2_build",
    "orders_return_rate_wilson",
    "events_funnel_time_bound",
    # round-9 (driver r8) additions
    "extract_dispatch_diff",
    "shard_consistent_hash",
    "stream_shard_router",
    "graph_label_propagation",
    "agg_bloom_membership",
    "stream_bloom_membership",
    "tokenizer_wordpiece_encode",
    "tokenizer_viterbi_segment",
    # round-9 wave 2 (this session)
    "sim_hybrid_rrf",
    "sim_hybrid_rrf_ann",
    "dedup_semantic_cluster",
    "text_phrase_search",
    "graph_link_prediction",
    "graph_bfs_landmarks",
    "embedding_random_projection",
    "stream_markov_transition",
    "tokenizer_unigram_em_step",
    "tokenizer_unigram_em_train",
    "timeseries_ohlc_bars",
    "trend_theil_sen",
    "stream_ohlc_bars",
    "graph_ppr",
    "dedup_semantic_apply",
    "dedup_semantic_recall_audit",
    "dedup_semantic_multiprobe_audit",
    "orders_supplier_hhi",
    "scan_fixed_width",
    "multimodal_audio_frames",
    "multimodal_audio_decode_errors",
    "multimodal_audio_silence_split",
    "multimodal_audio_fingerprint",
]

INTERESTING = re.compile(
    r"ReadSchema|PushedFilters|PartitionFilters|BroadcastHashJoin|SortMergeJoin"
    r"|ShuffledHashJoin|HashAggregate|Exchange|TakeOrderedAndProject|Bucketed"
    r"|WholeStageCodegen|Window |Generate |MapInPandas|FlatMapGroupsInPandas"
)


def section_names() -> list[str]:
    """bench.py's HEADLINE (every benched query gets plan evidence)
    followed by the EXTRA plan-interesting queries, deduplicated in
    order. tests/test_artifacts.py asserts PLANS.md ⊇ bench HEADLINE."""
    from bench import HEADLINE as BENCH_HEADLINE

    seen: set[str] = set()
    names = []
    for n in list(BENCH_HEADLINE) + EXTRA:
        if n not in seen:
            seen.add(n)
            names.append(n)
    return names


def main() -> None:
    from metadata_extractors_api_spark import QUERIES
    from metadata_extractors_api_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    names = section_names()
    out = ["# PLANS — physical-plan evidence (auto-generated by tools/plan_report.py)", ""]
    for name in names:
        plan = QUERIES[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        # keep the clause the line matched even when FileScan attributes
        # push it past the clip width (e.g. PartitionFilters)
        lines = []
        for ln in plan.splitlines():
            if not INTERESTING.search(ln):
                continue
            ln = ln.strip()
            if len(ln) > 160 and "PartitionFilters: [" in ln:
                pf = ln.index("PartitionFilters: [")
                lines.append(ln[:120] + " ... " + ln[pf : pf + 120])
            else:
                lines.append(ln[:160])
        out.append(f"## {name}\n")
        out.append("```")
        out.extend(lines[:25])
        out.append("```")
        out.append("")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"PLANS.md written ({len(names)} queries)")


if __name__ == "__main__":
    sys.exit(main())
