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
    # -- r12 close rotation (tools/gate_rotation.py vs ref a2d657d,
    # the r11 close) under the AMENDED rule (VERDICT r11 #3): lead
    # capped at 15 (6 never-checked r12 keys + 9 changed-file
    # stalest), the remainder strictly stalest-first — gate slots
    # 16-50 are drawn from the 53-key r1-r3 stale-evidence cohort
    # (win_*/set_*/tpch/subquery/fn_* lead), so CORRECTNESS_r12
    # refreshes >=30 of them and the cohort strictly shrinks. --
    "events_survival_consistency",  # new
    "search_ndcg_eval",  # new
    "text_lexicon_score",  # new
    "events_gains_deciles",  # new
    "mm_shot_stats",  # new
    "graph_modularity_components",  # new
    "timeseries_haar_dwt",  # new
    "graph_hits",  # new
    "search_index_append",  # new
    "search_index_build",  # new
    "search_snippet_extract",  # new
    "timeseries_model_select",  # new
    "rollup_time_partitioned",  # chg r3
    "stream_dedup",  # chg r3
    "stream_interval_join",  # chg r3
    "stream_session",  # chg r3
    "stream_sliding",  # chg r3
    "stream_tumbling",  # chg r3
    "timeseries_gapfill",  # chg r3
    "events_anomaly_mad",  # chg r4
    "events_dau_wau",  # chg r4
    "limit_offset",  # r1
    "tpch_q1",  # r1
    "tpch_q3",  # r1
    "tpch_q5",  # r1
    "cte_with",  # r2
    "exists_agg",  # r2
    "fn_cast",  # r2
    "fn_conditional",  # r2
    "fn_date_arith",  # r2
    "fn_date_parts",  # r2
    "fn_generate_series",  # r2
    "fn_json_extract",  # r2
    "fn_math",  # r2
    "fn_regexp",  # r2
    "fn_string_basic",  # r2
    "fn_struct",  # r2
    "fn_unnest",  # r2
    "join_asof",  # r2
    "join_range_bucket",  # r2
    "pivot",  # r2
    "set_except",  # r2
    "set_except_all",  # r2
    "set_intersect",  # r2
    "set_intersect_all",  # r2
    "set_union",  # r2
    "set_union_all",  # r2
    "set_union_byname",  # r2
    "subquery_correlated",  # r2
    "subquery_in",  # r2
    "subquery_scalar",  # r2
    "tpch_q10",  # r2
    "tpch_q14",  # r2
    "tpch_q18",  # r2
    "tpch_q4",  # r2
    "tpch_q6",  # r2
    "unpivot",  # r2
    "win_agg_frame",  # r2
    "win_firstlast",  # r2
    "win_lag",  # r2
    "win_percent",  # r2
    "win_qualify",  # r2
    "win_range_frame",  # r2
    "win_rank",  # r2
    "delete_where",  # r3
    "merge_upsert",  # r3
    "stream_upsert_sink",  # r3
    "agg_bitmap_distinct",  # r4
    "agg_theta_sketch_ops",  # r4
    "events_funnel",  # chg r4
    "events_sessionize",  # chg r4
    "events_transition_matrix",  # chg r4
    "fmt_jsoncompact",  # r4
    "join_asof_forward",  # r4
    "join_skew_salted",  # r4
    "mv_incremental_refresh",  # r4
    "pipeline_overlap_matrix",  # r4
    "pipeline_quality_audit",  # r4
    "pipeline_shuffle_shards",  # r4
    "retention_cohorts",  # chg r4
    "scan_csv",  # r4
    "scan_jsonl",  # r4
    "stream_enrich_join",  # chg r4
    "stream_running_totals",  # r4
    "stream_watermark_late",  # chg r4
    "subquery_any_all",  # r4
    "timeseries_interpolate",  # chg r4
    "win_time_range",  # r4
    "agg_list",  # r5
    "basket_pair_lift",  # r5
    "events_attribution",  # chg r5
    "events_rfm",  # chg r5
    "events_top_paths",  # chg r5
    "fn_array_hof",  # r5
    "fn_array_ops",  # r5
    "fn_cast_ch",  # r5
    "fn_date_ch",  # r5
    "fn_map_access",  # r5
    "fn_url_ip",  # r5
    "graph_pagerank",  # chg r5
    "join_asof_tolerance",  # r5
    "join_fuzzy_names",  # r5
    "merge_scd2",  # r5
    "pipeline_bpe_merges",  # chg r5
    "pipeline_bpe_tokenize",  # chg r5
    "pipeline_corpus_prep",  # r5
    "pipeline_decontaminate",  # r5
    "recursive_cte",  # chg r5
    "topk_per_group",  # chg r5
    "tpch_q12",  # r5
    "win_ntile",  # r5
    "agg_cms_frequency",  # r6
    "agg_hll_portable",  # r6
    "events_ab_test",  # chg r6
    "events_bootstrap_ci",  # chg r6
    "events_churn_hazard",  # chg r6
    "events_cuped",  # chg r6
    "events_funnel_windowed",  # chg r6
    "events_incidents",  # chg r6
    "events_ks_test",  # chg r6
    "events_ltv_triangle",  # chg r6
    "events_mannwhitney",  # chg r6
    "events_slo_burn",  # chg r6
    "events_streaks",  # chg r6
    "events_time_to_convert",  # chg r6
    "events_welch_ttest",  # chg r6
    "graph_jaccard",  # chg r6
    "graph_triangles",  # chg r6
    "graph_wcc",  # chg r6
    "join_interval_overlap",  # r6
    "join_nearest",  # r6
    "join_scd2_pointintime",  # r6
    "join_spatial_grid",  # r6
    "join_spatial_nn",  # r6
    "join_trajectory_hausdorff",  # r6
    "pipeline_chunk_windows",  # r6
    "pipeline_mix_temperature",  # r6
    "pipeline_normalize_zscore",  # r6
    "pipeline_shard_balance",  # r6
    "sample_random",  # r6
    "stream_topk",  # chg r6
    "text_readability",  # chg r6
    "timeseries_anomaly_stl",  # chg r6
    "timeseries_autocorr",  # chg r6
    "timeseries_cusum",  # chg r6
    "timeseries_forecast_snaive",  # chg r6
    "timeseries_rolling_median",  # chg r6
    "timeseries_seasonal_decompose",  # chg r6
    "agg_winsorized_mean",  # r7
    "ann_recall_eval",  # chg r7
    "cluster_dbscan",  # r7
    "events_ab_srm",  # chg r7
    "events_anova_dow",  # r7
    "events_attribution_position",  # r7
    "events_did",  # r7
    "events_pattern_match",  # chg r7
    "events_power_mde",  # r7
    "events_qte",  # r7
    "events_ratio_delta_method",  # r7
    "filter_conj",  # r7
    "filter_eq",  # r7
    "fn_date_spine",  # r7
    "fn_format_ch",  # r7
    "fn_geohash",  # chg r7
    "graph_adamic_adar",  # chg r7
    "graph_bfs",  # chg r7
    "graph_kcore",  # chg r7
    "graph_lpa_communities",  # chg r7
    "join_ip_lpm",  # r7
    "layout_zorder",  # chg r7
    "mm_audio_vad",  # chg r7
    "mm_scene_cuts",  # chg r7
    "pipeline_dp_counts",  # r7
    "project_cols",  # r7
    "sample_percent",  # r7
    "sample_reservoir",  # r7
    "scan_binary_files",  # r7
    "scan_csv_badrecords",  # r7
    "scan_jsonl_nested",  # r7
    "scan_orc",  # r7
    "scan_parquet",  # r7
    "scan_table",  # r7
    "scan_xml",  # r7
    "stream_holt",  # r7
    "stream_pattern_match",  # r7
    "text_collocations_pmi",  # chg r7
    "text_url_normalize",  # chg r7
    "timeseries_downsample_lttb",  # r7
    "timeseries_ewma_control",  # r7
    "timeseries_holt",  # chg r7
    "timeseries_vwap",  # r7
    "agg_approx",  # r8
    "agg_argminmax",  # r8
    "agg_basic",  # r8
    "agg_count_star",  # r8
    "agg_cube",  # r8
    "agg_distinct",  # r8
    "agg_distinct_on",  # r8
    "agg_distinct_rows",  # r8
    "agg_filter",  # r8
    "agg_groupby",  # r8
    "agg_grouping_sets",  # r8
    "agg_having",  # r8
    "agg_quantile",  # r8
    "agg_rollup",  # r8
    "agg_stats",  # r8
    "ann_pq_distortion",  # chg r8
    "events_concurrency",  # r8
    "filter_between_in",  # r8
    "filter_like_regex",  # r8
    "filter_null_case",  # r8
    "filter_param",  # r8
    "join_anti",  # r8
    "join_bloom_prefilter",  # r8
    "join_bucketed_colocated",  # r8
    "join_cross",  # r8
    "join_full",  # r8
    "join_inner_on",  # r8
    "join_lateral",  # r8
    "join_left",  # r8
    "join_positional",  # r8
    "join_right",  # r8
    "join_semi",  # r8
    "join_theta",  # r8
    "join_using",  # r8
    "merge_cdc_apply",  # r8
    "orderby_desc_limit",  # r8
    "orderby_limit_ties",  # r8
    "orderby_multi",  # r8
    "pipeline_dataset_fingerprint",  # r8
    "pipeline_dsir_logratio",  # chg r8
    "pipeline_importance_sample",  # r8
    "scan_schema_evolution",  # r8
    "scan_time_travel",  # r8
    "stream_cdc_apply",  # r8
    "timeseries_ohlc",  # chg r8
    "agg_corr_matrix",  # chg r9
    "agg_gini",  # chg r9
    "agg_hll_sketch_table",  # r9
    "agg_quantile_sketch_table",  # r9
    "agg_weighted_median",  # chg r9
    "ann_bruteforce_topk",  # chg r9
    "dedup_embedding",  # r9
    "dedup_lsh_recall_curve",  # r9
    "dedup_semantic",  # chg r9
    "dedup_substring",  # r9
    "events_chisq",  # chg r9
    "events_cmh",  # chg r9
    "events_decay_score",  # chg r9
    "events_markov_stationary",  # chg r9
    "events_mutual_info",  # chg r9
    "events_sprt",  # chg r9
    "fn_udf_slugify",  # chg r9
    "graph_betweenness",  # chg r9
    "graph_closeness",  # chg r9
    "graph_scc",  # chg r9
    "join_point_in_polygon",  # r9
    "layout_zone_map_prune",  # chg r9
    "mm_image_phash",  # chg r9
    "pipeline_data_card",  # chg r9
    "pipeline_gopher_rules",  # chg r9
    "pipeline_hard_negatives",  # chg r9
    "pipeline_tokenizer_fertility",  # chg r9
    "pipeline_triplet_mining",  # chg r9
    "sample_systematic",  # r9
    "scan_csv_gzip",  # r9
    "search_bm25_topk",  # chg r9
    "search_hybrid_rrf",  # chg r9
    "search_mmr_rerank",  # chg r9
    "search_phrase_match",  # chg r9
    "search_trigram_fuzzy",  # chg r9
    "stream_alert_hysteresis",  # r9
    "stream_sprt",  # r9
    "text_langid",  # chg r9
    "text_perplexity_bigram",  # chg r9
    "text_quality",  # chg r9
    "text_script_ratio",  # chg r9
    "text_tokens",  # chg r9
    "text_unigram_logprob",  # chg r9
    "timeseries_croston",  # chg r9
    "timeseries_hampel",  # chg r9
    "timeseries_holt_winters",  # chg r9
    "timeseries_pacf",  # chg r9
    "timeseries_sax",  # chg r9
    "timeseries_spectral_dft",  # chg r9
    "timeseries_twap",  # chg r9
    "agg_approx_topk",  # chg r10
    "agg_grouping_id",  # chg r10
    "agg_histogram",  # chg r10
    "agg_listagg",  # chg r10
    "agg_mode_median",  # chg r10
    "agg_ols_multi",  # chg r10
    "agg_regression",  # chg r10
    "ann_filtered_topk",  # chg r10
    "ann_ivf_append",  # chg r10
    "dedup_incremental",  # r10
    "dedup_lines",  # r10
    "events_propensity_match",  # chg r10
    "fn_bitwise",  # chg r10
    "fn_edit_distance",  # chg r10
    "fn_hashing",  # chg r10
    "fn_time_bucket",  # chg r10
    "fn_udtf_split",  # chg r10
    "fn_variant",  # chg r10
    "graph_ktruss",  # chg r10
    "graph_random_walk",  # chg r10
    "mm_audio_energy",  # chg r10
    "mm_decode",  # chg r10
    "mm_feature_extract",  # chg r10
    "mm_resize",  # chg r10
    "pipeline_dataset_diff",  # chg r10
    "pipeline_length_buckets",  # chg r10
    "pipeline_mix_domains",  # r10
    "pipeline_train_quality_filter",  # chg r10
    "sample_quota",  # r10
    "sample_stratified",  # r10
    "scan_csv_multiline",  # r10
    "scan_partitioned_dir",  # r10
    "search_spell_correct",  # chg r10
    "split_train_test",  # r10
    "stream_kalman",  # r10
    "timeseries_kalman",  # chg r10
    "timeseries_ljung_box",  # chg r10
    "tpch_q11",  # r10
    "tpch_q13",  # r10
    "tpch_q15",  # r10
    "tpch_q16",  # r10
    "tpch_q17",  # r10
    "tpch_q19",  # r10
    "tpch_q2",  # r10
    "tpch_q20",  # r10
    "tpch_q21",  # r10
    "tpch_q22",  # r10
    "tpch_q7",  # r10
    "tpch_q8",  # r10
    "tpch_q9",  # r10
    "agg_benford",  # chg r11
    "agg_skew_kurtosis",  # chg r11
    "ann_ivf_pruned",  # chg r11
    "ann_ivf_topk",  # chg r11
    "ann_ivfpq_topk",  # chg r11
    "ann_lsh_topk",  # chg r11
    "ann_pq_topk",  # chg r11
    "ann_range_search",  # chg r11
    "cluster_kmeans",  # chg r11
    "dedup_clusters",  # r11
    "dedup_containment",  # r11
    "dedup_exact",  # r11
    "dedup_minhash_append",  # r11
    "dedup_minhash_lsh",  # r11
    "dedup_ngram_jaccard",  # r11
    "dedup_simhash",  # r11
    "events_attribution_shapley",  # chg r11
    "events_competing_risks",  # chg r11
    "events_hmm_viterbi",  # chg r11
    "events_markov_absorption",  # chg r11
    "events_survival_km",  # chg r11
    "graph_assortativity",  # chg r11
    "graph_diameter_2sweep",  # chg r11
    "layout_hilbert",  # chg r11
    "mm_binary_meta",  # chg r11
    "mm_frame_sample",  # chg r11
    "pipeline_dedup_keep_best",  # r11
    "pipeline_pack_sequences",  # chg r11
    "search_prf_expansion",  # chg r11
    "text_bigram_topk",  # chg r11
    "text_burrows_delta",  # chg r11
    "text_code_detect",  # chg r11
    "text_entropy",  # chg r11
    "text_fingerprint",  # chg r11
    "text_kneser_ney_bigram",  # chg r11
    "text_lang_confusion",  # chg r11
    "text_mtld",  # chg r11
    "text_novelty",  # r11
    "text_pii_scrub",  # chg r11
    "text_rake_keywords",  # chg r11
    "text_repetition",  # chg r11
    "text_tfidf_topterms",  # chg r11
    "text_vocab_topk",  # chg r11
    "text_winnowing",  # chg r11
    "text_zipf_fit",  # chg r11
    "timeseries_changepoint",  # chg r11
    "timeseries_dtw",  # chg r11
    "timeseries_mann_kendall",  # chg r11
    "timeseries_matrix_profile",  # chg r11
    "timeseries_theil_sen",  # chg r11
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
