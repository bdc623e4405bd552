"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Protocol (BASELINE.md): per query, 2 warm-ups + 3 timed runs, median
recorded; execution via the noop sink so results materialize fully without
driver-side collection. ``value`` is the sum of per-query medians. Two
warm-ups because the first executions pay whole-stage-codegen compilation
and JVM JIT — one-time costs irrelevant to steady-state cluster throughput.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_report1",
    "q_tpch_q1",
    "q_join_multi",
    "q_topn",
    "q_window_lag",
    "q_tumbling_window",
    "q_session_window",
    "q_asof_join",
    "q_dedup_exact",
    "q_simhash",
    "q_dedup_near",
    "q_topk_cosine",
    "q_text_stats",
    "q_sentiment_lexicon",
]

# Round-5 additions timed as a SEPARATE group: the headline list (and its
# total, the baseline-comparable number) is frozen; extras give per-round
# visibility into new-operator cost without moving the yardstick.
EXTRAS = [
    "q_tpch_q2",
    "q_tpch_q21",
    "q_boilerplate",
    "q_token_rarity",
    "q_chunk_documents",
    "q_hopping_window",
    "q_salted_join",
    "q_zorder_stats",
    "q_zscore_outliers",
    "q_funnel",
    "q_retention_cohort",
    "q_quantize_embeddings",
    "q_chunk_dedup",
    "q_sessionize",
    "q_profile",
    "q_scd2_merge",
    "q_inverted_index",
    "q_forward_fill",
    "q_rebalance_sample",
    "q_winsorize",
    "q_autocorr",
    "q_type_transitions",
    # round-5 batch 3
    "q_max_drawdown",
    "q_vwap_bars",
    "q_mad_outliers",
    "q_rfm",
    "q_ab_test",
    "q_basket_pairs",
    "q_cooccurrence",
    "q_triangle_count",
    "q_hll_rollup",
    "q_kll_quantiles",
    "q_attribution",
    "q_pruned_scan",
    # round-5 batch 4/5
    "q_first_touch",
    "q_gini",
    "q_market_beta",
    "q_corr_matrix",
    "q_drift_tvd",
    "q_time_to_convert",
    "q_snapshot_diff",
    "q_semijoin_selectivity",
    "q_bfs_levels",
    "q_share_of_parent",
    "q_pps_sample",
    # round-6 batch 1/2
    "q_interpolate",
    "q_salted_agg",
    "q_random_projection",
    "q_kcore",
    "q_streaks",
    "q_changepoint",
    "q_benford",
    "q_auc",
    "q_decile_lift",
    "q_containment",
    "q_table_checksum",
    "q_knn_eval",
    "q_stratified_exact",
    "q_skew_audit",
    "q_phash_dedup",
    "q_sql_interface",
    "q_python_source",
    # this-session additions (driver round 5)
    "q_variant_json",
    "q_udtf_runs",
    "q_dpp_join",
    "q_seasonal_profile",
    "q_target_encode",
    "q_kanonymity",
    "q_walk_forward",
    "q_time_rollup",
    "q_quantile_normalize",
    "q_interval_join",
    "q_dedup_delta",
    # round-6 session additions
    "q_bollinger",
    "q_rsi",
    "q_candle_patterns",
    "q_drawdown_duration",
    "q_bigram_lm",
    "q_source_overlap",
    "q_doc_length_hist",
    "q_node_jaccard",
    "q_label_propagation",
    "q_centroid_classify",
    "q_referential_integrity",
    "q_functional_dependency",
    "q_recursive_cte",
    "q_atr",
    "q_obv",
    "q_turnover_hhi",
    "q_grouped_mode",
    "q_outlier_iqr",
    "q_gap_top",
    "q_degree_hist",
    "q_tail_tokens",
    "q_embedding_drift",
    "q_principal_component",
    # round-6 microstructure / stattests / textqc / risk / retrieval
    "q_realized_vol",
    "q_roll_spread",
    "q_kyle_lambda",
    "q_amihud",
    "q_weighted_median",
    "q_ks_test",
    "q_chi_square",
    "q_spearman",
    "q_ttr",
    "q_token_coverage",
    "q_ngram_novelty",
    "q_encoding_qc",
    "q_readability",
    "q_silhouette",
    "q_kmeans_step",
    "q_var_es",
    "q_sharpe",
    "q_event_study",
    "q_semantic_dedup",
    "q_hybrid_rrf",
    # round-6 continuation (this session)
    "q_bm25",
    "q_retrieval_eval",
    "q_fertility",
    "q_pq_encode",
    # round 7 brought q_entity_canonical in: the former row-level
    # Σ|block|² DP verify (~13 s at sf0.1) now runs at distinct
    # (brand, name) granularity — vocabulary-bounded, sub-second
    "q_entity_canonical",
    "q_mixture_weights",
    "q_diff_in_diff",
    "q_cdc_chunks",
    "q_ldiversity",
    "q_langid_eval",
    "q_lateness_audit",
    # round-7 session additions
    "q_stochastic",
    "q_mfi",
    "q_dollar_bars",
    "q_sortino",
    "q_vpin",
    "q_rolling_beta",
    "q_repetition",
    "q_simpson_diversity",
    "q_xml_ingest",
    "q_fixed_effects",
    "q_variance_ratio",
    "q_macd",
    "q_ewma_vol",
    "q_moments",
    "q_gap_risk",
    "q_tier_migration",
    "q_tail_dependence",
    "q_ab_cuped",
    "q_kendall_tau",
    "q_interarrival",
    "q_markout",
    "q_return_split",
    # round-8 additions
    "q_ndcg",
    "q_triple_barrier",
    "q_mann_whitney",
    "q_volume_concentration",
    "q_srm_check",
    "q_label_balance",
    "q_donchian",
    "q_acf_profile",
    "q_xsec_momentum",
    "q_pairs_signal",
    "q_embedding_norms",
    "q_imbalance_profile",
    "q_exec_shortfall",
    "q_pack_efficiency",
    "q_power_analysis",
    "q_var_backtest",
    "q_rolling_corr",
    # round-8 batch 5 (risk ratios)
    "q_omega_ratio",
    "q_hill_tail",
    "q_kupiec_pof",
    "q_ulcer_index",
    "q_calmar",
    # round-8 batch 6 (range/flow indicators)
    "q_williams_r",
    "q_aroon",
    "q_cci",
    "q_vortex",
    "q_chaikin",
    "q_ichimoku",
    # round-8 batch 7 (k-sample / resampling stat tests)
    "q_kruskal_wallis",
    "q_brown_forsythe",
    "q_cramers_v",
    "q_jackknife_sharpe",
    "q_runs_test",
    # round-8 batch 8 (corpus curation)
    "q_gopher_rules",
    "q_prefix_dedup",
    "q_psi",
    "q_mutual_info",
    "q_brier",
    "q_zipf_fit",
    "q_token_entropy",
    # round-8 batch 9 (OHLC range volatility)
    "q_parkinson",
    "q_garman_klass",
    "q_rogers_satchell",
    "q_yang_zhang",
    "q_corwin_schultz",
    # round-8 batch 10 (classical stat tests)
    "q_jarque_bera",
    "q_ljung_box",
    "q_durbin_watson",
    "q_anova",
    "q_welch_t",
    "q_cohens_kappa",
    "q_bartlett",
    # round-8 batch 11 (DMI / volume-flow indicators)
    "q_adx",
    "q_ultimate_osc",
    "q_keltner",
    "q_force_index",
    "q_ease_of_movement",
    # round-8 batch 12 (time-series diagnostics)
    "q_hurst",
    "q_granger",
    "q_quantile_binning",
    # round-8 batch 13 (jump/trend/unit-root + calibration)
    "q_bipower",
    "q_mann_kendall",
    "q_adf",
    "q_ece",
    # round-8 batch 14 (robust / resampling)
    "q_hodges_lehmann",
    "q_bootstrap_ci",
    "q_assortativity",
    # round-8 batch 15 (monitoring / sequence information)
    "q_cusum",
    "q_trimmed_mean",
    "q_markov_entropy",
    "q_pastor_stambaugh",
    # round-8 batch 16 (performance ratios / embedding geometry)
    "q_dual_beta",
    "q_k_ratio",
    "q_rachev",
    "q_embedding_isotropy",
    # round-8 batch 17/18 (importance resampling, tokenizer/CCNet prep)
    "q_dsir_weights",
    "q_bpe_step",
    "q_ccnet_buckets",
    # round-8 batch 19 (concentration / inequality)
    "q_lorenz_deciles",
    "q_theil_index",
]

RUNS = 3
WARMUPS = 2
# Extras are informational (headline is the baseline-comparable number):
# a lighter protocol keeps the full-bench wall clock bounded as the
# extras list grows (~80 queries; the driver may invoke bench several
# times per round).
RUNS_EXTRA = 2
WARMUPS_EXTRA = 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from trading_data_pipeline_spark.registry import all_queries
    from trading_data_pipeline_spark.session import build_session

    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    timings: dict[str, float] = {}
    bands: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        fn = specs[name].fn
        for _ in range(WARMUPS):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        bands[name] = {
            "min": round(min(samples), 3),
            "median": timings[name],
            "max": round(max(samples), 3),
        }
        # Isolation between queries: drop cached plans and force a JVM GC so
        # broadcast/shuffle debt from one query can't tax the next one's
        # timings (late-in-list queries otherwise inherit heap pressure —
        # observed as a 5x wall-clock swing on q_dedup_near with no code
        # change between rounds).
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    extras: dict[str, float] = {}
    for name in EXTRAS:
        fn = specs[name].fn
        for _ in range(WARMUPS_EXTRA):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(RUNS_EXTRA):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        extras[name] = round(statistics.median(samples), 3)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    # Full record first (bands/extras/co-load for humans + BASELINE.md),
    # then a COMPACT headline-only line LAST: the driver tail-captures
    # stdout, and in round 5 the ever-growing extras dict pushed the
    # leading "metric"/"value" fields out of its window ("parsed": null).
    # The final line must stay small and self-contained forever.
    print(
        json.dumps(
            {
                "metric": "headline_query_wallclock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "bands": bands,
                "extras": extras,
                "co_load": _co_load_sentinel(),
                "sf": float(sf),
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_query_wallclock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        ),
        flush=True,
    )


def _co_load_sentinel() -> dict:
    """Machine co-load snapshot recorded alongside the timings, so a
    regression in a future round is attributable in-file (is it the code,
    or were other JVMs/processes competing for the box?). Pure /proc reads —
    no extra dependencies."""
    sent: dict = {}
    try:
        with open("/proc/loadavg") as f:
            sent["loadavg_1m"] = float(f.read().split()[0])
    except OSError:
        pass
    try:
        n_java = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/comm") as f:
                    if f.read().strip() == "java":
                        n_java += 1
            except OSError:
                continue
        sent["other_jvms"] = max(0, n_java - 1)  # minus our own
    except OSError:
        pass
    sent["cpus"] = os.cpu_count()
    return sent


if __name__ == "__main__":
    main()
