"""Central query/oracle registry backing __spark_entry__.py.

Every operator the engine claims (SURVEY.md §2 inventory + beyond-reference
pipeline ops) registers here as a (spark, sf_dir) -> DataFrame callable,
optionally paired with the ANSI-SQL oracle string DuckDB runs on the same
fixtures. Keys without an oracle get the driver's weaker rows-only check
(reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering an operator under its SURVEY §2 key."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle.strip()
        return fn

    return deco


# Keys the driver's budget-limited correctness gate should reach FIRST,
# in order. The gate walks queries() in dict order and truncates at 50
# keys (observed every round). THE STANDING RULE (restated per the r8
# verdict, apply every round): (1) any key whose implementing file
# changed since its last green driver row leads, (2) everything else
# follows stalest-evidence-first (latest green CORRECTNESS row,
# ascending round). With zero red rows the gate's risk is staleness,
# not breakage; at ~50 keys/round the rotation refreshes every key
# within ~6 rounds. (Rows-only keys used to sit dead last because an
# err:"no_oracle" row wastes a gate slot — moot since r9: every key
# has a value oracle.) r9 rotation regenerated from CORRECTNESS_r01-08.
GATE_PRIORITY: tuple[str, ...] = (
    # -- Block R9-SECOND-WAVE: the 31 operators added after the r9
    # verdict tasks closed — never driver-checked, so they consume the
    # head of the gate budget (builder-side proof: full dual-ANSI-leg
    # sweeps green, per-key recompute tests in tests/) --
    "events_chisq",
    "events_sprt",
    "timeseries_hampel",
    "timeseries_sax",
    "pipeline_gopher_rules",
    "pipeline_tokenizer_fertility",
    "agg_corr_matrix",
    "layout_zone_map_prune",
    "search_trigram_fuzzy",
    "graph_closeness",
    "events_mutual_info",
    "timeseries_spectral_dft",
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
    # -- Block R9-FIRST-WAVE-CHANGED: the four r9-new operators, the
    # de-rows-only'd HLL sketch table, the df-ceiling'd lexical keys,
    # the ADVICE-hardened recall curve, the PIL-gated phash --
    "agg_quantile_sketch_table",
    "search_phrase_match",
    "dedup_substring",
    "graph_scc",
    "agg_hll_sketch_table",
    "search_bm25_topk",
    "search_hybrid_rrf",
    "dedup_lsh_recall_curve",
    "mm_image_phash",
    # -- Block R9-FILE-CHANGED: keys living in modules the second wave
    # APPENDED to (similarity/text_analysis/modern/layout/tpch_extra/
    # stateful/graph) — the appends add new functions only, but the
    # file-granularity rule says re-prove them before merely-stale keys
    "search_mmr_rerank",
    "ann_bruteforce_topk",
    "dedup_embedding",
    "dedup_semantic",
    "text_quality",
    "text_tokens",
    "text_langid",
    "text_unigram_logprob",
    "agg_weighted_median",
    "agg_gini",
    "fn_variant",
    "fn_udtf_split",
    "layout_zorder",
    "layout_hilbert",
    "fn_geohash",
    "join_spatial_grid",
    "join_fuzzy_names",
    "stream_pattern_match",
    "stream_holt",
    "graph_bfs",
    "graph_kcore",
    # -- everything else, stalest driver evidence first (latest green
    # CORRECTNESS row ascending, regenerated at r9 from r01-r08; with
    # zero red rows the gate's job is refreshing stale evidence, and
    # at ~50 keys/round the rotation revisits every key within ~6
    # rounds). Rule for r10+: changed-implementation keys first, then
    # stalest-first — regenerate this tuple each round. --
    "limit_offset",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "cte_with",
    "exists_agg",
    "fn_cast",
    "fn_conditional",
    "fn_date_arith",
    "fn_date_parts",
    "fn_generate_series",
    "fn_json_extract",
    "fn_math",
    "fn_regexp",
    "fn_string_basic",
    "fn_struct",
    "fn_unnest",
    "join_asof",
    "join_range_bucket",
    "pivot",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union",
    "set_union_all",
    "set_union_byname",
    "subquery_correlated",
    "subquery_in",
    "subquery_scalar",
    "tpch_q10",
    "tpch_q14",
    "tpch_q18",
    "tpch_q2",
    "tpch_q4",
    "tpch_q6",
    "tpch_q7",
    "unpivot",
    "win_agg_frame",
    "win_firstlast",
    "win_lag",
    "win_percent",
    "win_qualify",
    "win_range_frame",
    "win_rank",
    "delete_where",
    "merge_upsert",
    "rollup_time_partitioned",
    "sample_quota",
    "sample_stratified",
    "split_train_test",
    "stream_dedup",
    "stream_interval_join",
    "stream_session",
    "stream_sliding",
    "stream_tumbling",
    "stream_upsert_sink",
    "timeseries_gapfill",
    "tpch_q11",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "tpch_q8",
    "tpch_q9",
    "agg_approx_topk",
    "agg_bitmap_distinct",
    "agg_grouping_id",
    "agg_histogram",
    "agg_listagg",
    "agg_mode_median",
    "agg_regression",
    "agg_theta_sketch_ops",
    "ann_filtered_topk",
    "dedup_incremental",
    "dedup_lines",
    "events_anomaly_mad",
    "events_dau_wau",
    "events_funnel",
    "events_sessionize",
    "events_transition_matrix",
    "fmt_jsoncompact",
    "fn_bitwise",
    "fn_edit_distance",
    "fn_hashing",
    "fn_time_bucket",
    "join_asof_forward",
    "join_skew_salted",
    "mm_audio_energy",
    "mm_decode",
    "mm_feature_extract",
    "mm_resize",
    "mv_incremental_refresh",
    "pipeline_mix_domains",
    "pipeline_overlap_matrix",
    "pipeline_quality_audit",
    "pipeline_shuffle_shards",
    "retention_cohorts",
    "scan_csv",
    "scan_jsonl",
    "stream_enrich_join",
    "stream_running_totals",
    "stream_watermark_late",
    "subquery_any_all",
    "text_bigram_topk",
    "text_pii_scrub",
    "text_tfidf_topterms",
    "text_winnowing",
    "timeseries_interpolate",
    "win_time_range",
    "agg_list",
    "ann_ivf_pruned",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_range_search",
    "basket_pair_lift",
    "cluster_kmeans",
    "dedup_clusters",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "events_attribution",
    "events_rfm",
    "events_top_paths",
    "fn_array_hof",
    "fn_array_ops",
    "fn_cast_ch",
    "fn_date_ch",
    "fn_map_access",
    "fn_url_ip",
    "graph_pagerank",
    "join_asof_tolerance",
    "merge_scd2",
    "mm_binary_meta",
    "mm_frame_sample",
    "pipeline_bpe_merges",
    "pipeline_bpe_tokenize",
    "pipeline_corpus_prep",
    "pipeline_decontaminate",
    "pipeline_dedup_keep_best",
    "pipeline_pack_sequences",
    "recursive_cte",
    "text_fingerprint",
    "text_repetition",
    "text_vocab_topk",
    "topk_per_group",
    "tpch_q12",
    "win_ntile",
    "agg_cms_frequency",
    "agg_hll_portable",
    "agg_skew_kurtosis",
    "dedup_containment",
    "events_ab_test",
    "events_bootstrap_ci",
    "events_churn_hazard",
    "events_cuped",
    "events_funnel_windowed",
    "events_incidents",
    "events_ks_test",
    "events_ltv_triangle",
    "events_mannwhitney",
    "events_slo_burn",
    "events_streaks",
    "events_time_to_convert",
    "events_welch_ttest",
    "graph_jaccard",
    "graph_triangles",
    "graph_wcc",
    "join_interval_overlap",
    "join_nearest",
    "join_scd2_pointintime",
    "join_spatial_nn",
    "join_trajectory_hausdorff",
    "pipeline_chunk_windows",
    "pipeline_mix_temperature",
    "pipeline_normalize_zscore",
    "pipeline_shard_balance",
    "sample_random",
    "stream_topk",
    "text_code_detect",
    "text_entropy",
    "text_lang_confusion",
    "text_novelty",
    "text_readability",
    "timeseries_anomaly_stl",
    "timeseries_autocorr",
    "timeseries_cusum",
    "timeseries_forecast_snaive",
    "timeseries_rolling_median",
    "timeseries_seasonal_decompose",
    "agg_winsorized_mean",
    "ann_recall_eval",
    "cluster_dbscan",
    "events_ab_srm",
    "events_anova_dow",
    "events_attribution_position",
    "events_did",
    "events_pattern_match",
    "events_power_mde",
    "events_qte",
    "events_ratio_delta_method",
    "filter_conj",
    "filter_eq",
    "fn_date_spine",
    "fn_format_ch",
    "graph_adamic_adar",
    "graph_lpa_communities",
    "join_ip_lpm",
    "mm_audio_vad",
    "mm_scene_cuts",
    "pipeline_dp_counts",
    "project_cols",
    "sample_percent",
    "sample_reservoir",
    "scan_binary_files",
    "scan_csv_badrecords",
    "scan_jsonl_nested",
    "scan_orc",
    "scan_parquet",
    "scan_table",
    "scan_xml",
    "text_collocations_pmi",
    "text_url_normalize",
    "timeseries_downsample_lttb",
    "timeseries_ewma_control",
    "timeseries_holt",
    "timeseries_vwap",
    "agg_approx",
    "agg_argminmax",
    "agg_basic",
    "agg_count_star",
    "agg_cube",
    "agg_distinct",
    "agg_distinct_on",
    "agg_distinct_rows",
    "agg_filter",
    "agg_groupby",
    "agg_grouping_sets",
    "agg_having",
    "agg_quantile",
    "agg_rollup",
    "agg_stats",
    "ann_pq_distortion",
    "events_concurrency",
    "filter_between_in",
    "filter_like_regex",
    "filter_null_case",
    "filter_param",
    "join_anti",
    "join_bloom_prefilter",
    "join_bucketed_colocated",
    "join_cross",
    "join_full",
    "join_inner_on",
    "join_lateral",
    "join_left",
    "join_positional",
    "join_right",
    "join_semi",
    "join_theta",
    "join_using",
    "merge_cdc_apply",
    "orderby_desc_limit",
    "orderby_limit_ties",
    "orderby_multi",
    "pipeline_dataset_fingerprint",
    "pipeline_dsir_logratio",
    "pipeline_importance_sample",
    "scan_schema_evolution",
    "scan_time_travel",
    "stream_cdc_apply",
    "timeseries_ohlc",
)


def _apply_gate_priority() -> None:
    """Rebuild QUERIES/ORACLES in GATE_PRIORITY-first order (in place, so
    modules holding references to the dicts see the new order)."""
    ordered = {k: QUERIES[k] for k in GATE_PRIORITY if k in QUERIES}
    ordered.update((k, v) for k, v in QUERIES.items() if k not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    orc = {k: ORACLES[k] for k in QUERIES if k in ORACLES}
    ORACLES.clear()
    ORACLES.update(orc)


def load_all() -> None:
    """Import every module that registers queries (idempotent), then sort
    the registry so the driver's gate budget lands on unproven keys first
    (GATE_PRIORITY above)."""
    import quackflight_spark.operators.asof  # noqa: F401
    import quackflight_spark.operators.recursive  # noqa: F401
    import quackflight_spark.operators.graph  # noqa: F401
    import quackflight_spark.operators.windows  # noqa: F401
    import quackflight_spark.operators.subqueries  # noqa: F401
    import quackflight_spark.operators.setops  # noqa: F401
    import quackflight_spark.functions.scalar_suite  # noqa: F401
    import quackflight_spark.functions.modern  # noqa: F401
    import quackflight_spark.operators.sketches  # noqa: F401
    import quackflight_spark.operators.skew  # noqa: F401
    import quackflight_spark.operators.bucketed  # noqa: F401
    import quackflight_spark.operators.tpch_extra  # noqa: F401
    import quackflight_spark.operators.tpch_full  # noqa: F401
    import quackflight_spark.pipeline.dedup  # noqa: F401
    import quackflight_spark.pipeline.similarity  # noqa: F401
    import quackflight_spark.pipeline.text_analysis  # noqa: F401
    import quackflight_spark.pipeline.multimodal  # noqa: F401
    import quackflight_spark.pipeline.sampling  # noqa: F401
    import quackflight_spark.pipeline.composite  # noqa: F401
    import quackflight_spark.pipeline.bpe  # noqa: F401
    import quackflight_spark.pipeline.quality_audit  # noqa: F401
    import quackflight_spark.pipeline.privacy  # noqa: F401
    import quackflight_spark.operators.runtime_filter  # noqa: F401
    import quackflight_spark.operators.dbscan  # noqa: F401
    import quackflight_spark.sources.merge  # noqa: F401
    import quackflight_spark.sources.layout  # noqa: F401
    import quackflight_spark.sources.matview  # noqa: F401
    import quackflight_spark.sources.textformats  # noqa: F401
    import quackflight_spark.sources.timetravel  # noqa: F401
    import quackflight_spark.serving.formats  # noqa: F401
    import quackflight_spark.streaming.windowed  # noqa: F401
    import quackflight_spark.streaming.analytics_extra  # noqa: F401
    import quackflight_spark.streaming.stats_tests  # noqa: F401
    import quackflight_spark.streaming.timeseries_extra  # noqa: F401
    import quackflight_spark.streaming.upsert_sink  # noqa: F401
    import quackflight_spark.streaming.stateful  # noqa: F401
    import quackflight_spark.operators.relational  # noqa: F401
    _apply_gate_priority()
