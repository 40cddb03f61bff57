"""Benchmark runner (driver contract): times the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Results are forced through the noop datasource sink so timing covers the
full distributed plan without driver-side collection overhead.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "scan_parquet",
    "filter_pred",
    "agg_groupby",
    "agg_distinct",
    "join_broadcast",
    "join_shuffle",
    "join_multiway",
    "join_asof",
    "win_rank_topk",
    "win_running",
    "limit_topk",
    "win_range_frame",
    # UDF-surface headliners (Arrow-batched Python path)
    "udf_grouped_map",
    "pipe_cli",
    # LLM-pipeline headliners
    "dedup_exact",
    "dedup_minhash",
    "dedup_jaccard_prefix",
    "dedup_embedding",
    "sim_topk",
    "sim_ann_lsh",
    "sim_ann_ivf_trained",
    "text_stats",
    "text_fingerprint",
    # extraction dispatch (the reference-capability centerpiece)
    "extract_dispatch",
    # composite workload
    "tpch_q3_shipping",
    "tpch_q10_returns",
    "tpch_q18_large_orders",
    "text_bigrams",
    # round-3 additions: shuffle-free quality screens, containment
    # dedup, PQ-compressed ANN, Bloom semi-join reduction, Q7
    "text_gopher_rules",
    "dedup_containment",
    "sim_ann_pq",
    "agg_bloom_prefilter",
    "tpch_q7_volume",
    "pipeline_e2e_curation",
    "join_dpp",
    # late round-3 additions: TPC-H suite completion (pushdown canary,
    # outer-join double agg, aggregated EXISTS/NOT-EXISTS) + quality
    "tpch_q6_forecast",
    "tpch_q13_custdist",
    "tpch_q21_waiting",
    "revenue_gini",
    "text_oov_rate",
    "dq_referential_integrity",
    "agg_weighted_median",
    "multimodal_dedup",
    "sim_ann_lsh_delta",
    "udtf_dynamic_schema",
    # round-4 additions: training-data assembly (packing, seeded
    # shuffle, exact stratified sampling, incremental dedup,
    # hard-negative mining, basket lift)
    "pack_concat_chunks",
    "shuffle_deterministic",
    "sample_stratified_exact",
    "dedup_incremental_minhash",
    "sample_hard_negatives",
    "orders_basket_affinity",
    "chunk_overlap_windows",
    "orders_abc_pareto",
    # round-4 late additions: spatial grid join + privacy/smoothing
    # audits
    "join_geo_grid",
    "dq_k_anonymity",
    "timeseries_ewma",
    "sample_pps_systematic",
    "text_collocation_lift",
    "orders_skyline_2d",
    "orders_prorate_monthly",
    "join_spatial_knn",
    "agg_percentile_cont",
    "dedup_sorted_neighborhood",
    "multimodal_phash_dedup",
    "text_keyword_rake",
    # round-5 additions: TPC-H Q1 (scan-throughput probe), iterative
    # embedding analytics, declarative DQ rules, tokenizer census
    "tpch_q1_pricing_summary",
    "embedding_pca_power",
    "agg_ols_regression",
    "dq_rule_engine",
    "text_bpe_pair_census",
    "sample_kcenter_diverse",
    # round-6 additions: pair-blowup-free vocab growth, paragraph-level
    # dedup, REAL pixel path (decode + resample + gradient), matryoshka
    # truncation + IVF recall audits, bottom-k reservoir, URL
    # canonicalization, multiple regression, runtime-bloom join
    "text_vocab_growth",
    "dedup_paragraphs",
    "multimodal_resize",
    "multimodal_gradient_stats",
    "embedding_matryoshka_audit",
    "sim_ann_recall_curve",
    "sample_reservoir_bottomk",
    "dedup_url_canonical",
    "agg_ols_two_features",
    "join_bloom_runtime",
    # round-7 additions: statistical inference (rank test over the
    # two-phase prefix sum, information-theoretic dependency), per-doc
    # entropy, BPE merge chain, per-dim embedding audit, real-pixel
    # tile pooling, rolling-distinct window
    "dq_mann_whitney",
    "dq_mutual_information",
    "text_entropy_unigram",
    "text_zipf_slope",
    "tokenizer_bpe_encode",
    "embedding_dim_variance_audit",
    "multimodal_tile_stats",
    "win_distinct_rolling",
    "sim_distribution_audit",
    "text_vocab_coverage_curve",
    "text_winnowing_fingerprint",
    "text_bigram_cond_entropy",
    "join_asof_tolerance",
    "multimodal_channel_correlation",
    "events_markov_attribution",
    "win_pattern_funnel_regex",
    "graph_kcore",
    "multimodal_decode_errors",
    "pack_bin_ffd",
    "sample_stratified_neyman",
    "dq_theil_index",
    "win_interval_coalesce",
    "orders_survival_km",
    "dq_psi_drift",
    "orders_holt_forecast",
    "dq_simpson_screen",
    "events_funnel_steps",
    # round-7 (driver r7) additions
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
    "extract_install_plan",
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
    # round-10 additions
    "dedup_semantic_boundary_audit",
    "tokenizer_unigram_prune",
    "multimodal_audio_resample",
    "multimodal_audio_autocorr",
    "embedding_int8_quant_audit",
    "multimodal_audio_spectral_bands",
    "dq_benford_screen",
]

RUNS = 5

#: Ambient-normalization controls: three cheap, code-stable queries
#: timed FIRST each run and stamped into the artifact as `controls`.
#: Cross-round comparisons divide a round's per-query medians by the
#: controls' drift ratio to cancel machine weather (the r9 1.42x
#: uniform-drift episode, BENCH.md) instead of arguing about it in
#: prose. Keep this list frozen — its value is that the same three
#: queries never change across rounds.
CONTROLS = ["scan_parquet", "agg_groupby", "limit_topk"]


def time_query(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from metadata_extractors_api_spark import QUERIES
    from metadata_extractors_api_spark.session import get_spark

    # Machine-load stamp (BENCH.md documents ±15-50% ambient swing on
    # totals): record the 1-min load average at start so a hot machine
    # is visible in the artifact, and warn loudly when it exceeds half
    # the core count — per-query medians stay the quotable numbers.
    load1 = os.getloadavg()[0]
    ncpu = os.cpu_count() or 1
    contended = load1 > ncpu / 2
    if contended:
        print(
            f"WARNING: load average {load1:.1f} on {ncpu} cpus at bench "
            "start; totals will run hot — trust per-query medians only. "
            "This run is stamped \"contended\": true and MUST NOT be "
            "committed as a cross-round BENCH_LOCAL artifact "
            "(set SPARK_GRAFT_BENCH_STRICT=1 to refuse instead).",
            file=sys.stderr,
        )
        if os.environ.get("SPARK_GRAFT_BENCH_STRICT"):
            print(
                json.dumps(
                    {
                        "metric": "headline_queries_total_runtime",
                        "error": "refused: machine contended",
                        "load1_at_start": round(load1, 2),
                        "ncpu": ncpu,
                    }
                )
            )
            sys.exit(3)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="mdx-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Controls first: medians of the three frozen normalization queries
    # before the main sweep heats anything, quotable as the run's
    # ambient factor.
    controls: dict[str, float] = {}
    for name in CONTROLS:
        fn = QUERIES[name]
        time_query(fn, spark, sf_dir)  # warm-up
        controls[name] = round(
            statistics.median(
                [time_query(fn, spark, sf_dir) for _ in range(RUNS)]
            ),
            4,
        )

    names = [n for n in HEADLINE if n in QUERIES]
    results: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        time_query(fn, spark, sf_dir)  # warm-up (JIT, file listing, broadcast)
        samples = [time_query(fn, spark, sf_dir) for _ in range(RUNS)]
        results[name] = round(statistics.median(samples), 4)
        spread[name] = [round(min(samples), 4), round(max(samples), 4)]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(results.values()), 4),
        "unit": "sec",
        "queries": results,
        "spread": spread,
        "controls": controls,
        "runs": RUNS,
        # Protocol stamp: every query gets ONE untimed warm-up run
        # before its RUNS timed samples (JIT, file listing, broadcast,
        # and any session-scoped index/candidate memo builds execute
        # there — see BENCH.md), so the quoted medians are warm-path
        # numbers. Stamped so the artifact is self-describing.
        "warmup": 1,
        "load1_at_start": round(load1, 2),
        "ncpu": ncpu,
        "contended": contended,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
