"""Physical-plan assertions — the 100 TB contract from ARCHITECTURE.md.

These tests pin the plan *shape*, not timings: pushdown reached the scan,
projections pruned, top-k fused, dims broadcast, no cartesian products in
keyed pipelines. A regression here is a scale bug even when sf0.001
results stay correct.
"""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _queries():
    import __spark_entry__ as e

    return e.queries()


@pytest.fixture(scope="module")
def q():
    return _queries()


def test_filter_pushdown_reaches_scan(spark, sf_dir, q):
    out = _formatted(q["filter_eq"](spark, sf_dir))
    assert "PushedFilters" in out
    assert "EqualTo(o_orderstatus,F)" in out


def test_column_pruning(spark, sf_dir, q):
    out = _formatted(q["project_cols"](spark, sf_dir))
    read_schema = out.split("ReadSchema")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema
    assert "l_orderkey" in read_schema


def test_topk_fused(spark, sf_dir, q):
    assert "TakeOrderedAndProject" in _plan(q["orderby_desc_limit"](spark, sf_dir))


def test_q1_partial_agg(spark, sf_dir, q):
    plan = _plan(q["tpch_q1"](spark, sf_dir))
    # two-phase hash aggregation (map-side combine before the exchange)
    assert plan.count("HashAggregate") >= 2


def test_q3_q5_dims_broadcast(spark, sf_dir, q):
    for key in ("tpch_q3", "tpch_q5"):
        plan = _plan(q[key](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, key
        assert "CartesianProduct" not in plan, key


def test_theta_join_broadcast_nested_loop(spark, sf_dir, q):
    plan = _plan(q["join_theta"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_single_shuffle_window(spark, sf_dir, q):
    plan = _plan(q["join_asof"](spark, sf_dir))
    assert "Window" in plan
    # no join operator at all — the rewrite is union+window
    assert "Join" not in plan


def test_no_cartesian_in_dedup_pipeline(spark, sf_dir, q):
    for key in ("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard"):
        plan = _plan(q[key](spark, sf_dir))
        assert "CartesianProduct" not in plan, key
        assert "BroadcastNestedLoopJoin" not in plan, key


def test_whole_stage_codegen_on_scan_agg(spark, sf_dir, q):
    # AQE only annotates codegen stages in the *final* plan — execute
    # first; codegen'd operators are starred "*(n)" in the plan string
    df = q["tpch_q1"](spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert "*(1) HashAggregate" in plan or "*(2) HashAggregate" in plan


def test_scalar_suite_stays_jvm_side(spark, sf_dir, q):
    """No Python eval operators in the scalar-function plans."""
    for key in ("fn_string_basic", "fn_math", "fn_array_hof", "fn_json_extract"):
        plan = _plan(q[key](spark, sf_dir))
        assert "BatchEvalPython" not in plan, key
        assert "ArrowEvalPython" not in plan, key


def test_ivf_pruned_scan_has_partition_filters(spark, sf_dir, q):
    """The materialized IVF search must push the probed-cell set down as a
    PARTITION filter on the layout scan (directory skip — the nprobe/K IO
    contract), not as a post-scan row filter."""
    out = _formatted(q["ann_ivf_pruned"](spark, sf_dir))
    pf_lines = [ln for ln in out.splitlines() if "PartitionFilters" in ln]
    assert pf_lines, "no PartitionFilters in the plan"
    assert any("cell" in ln and "[]" not in ln for ln in pf_lines), pf_lines


def test_deterministic_splits_are_pure_maps(spark, sf_dir, q):
    """split_train_test / sample_stratified must be shuffle-free: the
    hash-bucket selection is a function of the row alone, so no Exchange
    belongs in the plan at any scale."""
    for key in ("split_train_test", "sample_stratified"):
        plan = _plan(q[key](spark, sf_dir))
        assert "Exchange" not in plan, key


def test_dynamic_partition_pruning_on_events_layout(spark, sf_dir):
    """Joining the date-partitioned events layout against a filtered dim
    on the partition column must inject a DPP subquery into the scan's
    PartitionFilters — at 100 TB this is the difference between scanning
    the two joined day-directories and scanning the whole table."""
    import datetime

    from pyspark.sql import functions as F

    from quackflight_spark.streaming.windowed import events_build_layout

    path = events_build_layout(spark, sf_dir)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(datetime.date(2024, 1, 1), "a"), (datetime.date(2024, 1, 2), "b")],
        "event_date DATE, tag STRING",
    ).filter(F.col("tag") >= "a")  # non-foldable filter: keeps the dim a real join side
    j = fact.join(dim, "event_date").groupBy("event_date").count()
    out = _formatted(j)
    pf_lines = [ln for ln in out.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and any("dynamicpruning" in ln for ln in pf_lines), pf_lines


def test_time_rollup_prunes_date_partitions(spark, sf_dir, q):
    """The date-ranged rollup must prune to its day-directories: the
    BETWEEN lands in PartitionFilters (directory skip), and the scan
    reports fewer partitions than the table has days."""
    out = _formatted(q["rollup_time_partitioned"](spark, sf_dir))
    pf_lines = [ln for ln in out.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and any("event_date" in ln for ln in pf_lines), pf_lines


def test_mix_domains_broadcasts_rates(spark, sf_dir, q):
    """The per-source rate table must broadcast back onto the corpus (a
    shuffle keyed on `source` would funnel 100 TB through #domains
    reducers), and the corpus side must not exchange before the join."""
    plan = _plan(q["pipeline_mix_domains"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dedup_incremental_anti_join_shape(spark, sf_dir, q):
    """Delta-vs-corpus must be a LeftAnti hash join on the content hash —
    never a cartesian — and the corpus side must prune to the hash
    column before the exchange."""
    plan = _plan(q["dedup_incremental"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_dedup_lines_no_doc_pairing(spark, sf_dir, q):
    """Segment dedup shuffles on the chunk text and doc_id only; there
    must be no doc-by-doc join surface and no Python in the path."""
    plan = _plan(q["dedup_lines"](spark, sf_dir))
    assert "LeftAnti" in plan            # boilerplate chunks anti-joined away
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_cluster_kmeans_arrow_assignment(spark, sf_dir, q):
    """Cluster assignment must run in the Arrow-batched kernel (no
    row-at-a-time Python), and the size annotation joins broadcast."""
    plan = _plan(q["cluster_kmeans"](spark, sf_dir))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_sessionize_single_exchange(spark, sf_dir, q):
    """The lag-flag and cumsum windows share partitioning AND ordering,
    so sessionization must plan exactly one exchange (on user_id) — a
    second shuffle would double the cost of the dominant stage."""
    plan = _plan(q["events_sessionize"](spark, sf_dir))
    final = plan.split("== Initial Plan ==")[0]
    import re

    n_shuffle = len(re.findall(r"Exchange hashpartitioning", final))
    assert n_shuffle == 1, final


def test_filtered_ann_pushes_label_predicate(spark, sf_dir, q):
    """ann_filtered_topk's metadata predicate must sit on the parquet
    scan (pre-filter strategy), not above the scoring kernel."""
    out = _formatted(q["ann_filtered_topk"](spark, sf_dir))
    assert "PushedFilters" in out
    assert "In(label" in out or "label IN" in out


def test_events_rfm_no_single_partition_window(spark, sf_dir, q):
    """The r3 verdict flagged events_rfm's three global `ntile` windows
    (Exchange SinglePartition + one-task Sort — the 10^9-user
    scale-killer). The rewrite ranks via range partitioning + parallel
    per-partition row_number; the executed plan must contain NO
    single-partition exchange and no ntile window at all."""
    plan = _plan(q["events_rfm"](spark, sf_dir))
    assert "Exchange SinglePartition" not in plan, plan
    assert "ntile" not in plan, plan


def test_layout_zorder_fuses_topk_no_exchange(spark, sf_dir, q):
    """The Morton projection is pure codegen arithmetic and the
    clustered-order LIMIT fuses to TakeOrderedAndProject — no shuffle,
    no UDF, no global sort in the queryable key."""
    plan = _plan(q["layout_zorder"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_join_ip_lpm_no_range_join(spark, sf_dir, q):
    """LPM must run as masked equi-join probes, never the nest-loop
    range join the naive containment predicate produces."""
    plan = _plan(q["join_ip_lpm"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_graph_triangles_no_cartesian(spark, sf_dir, q):
    """2-path build and closing-edge check are keyed equi-joins (the
    closing edge a left-semi); degree orientation must not introduce a
    cartesian anywhere."""
    plan = _plan(q["graph_triangles"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_timeseries_holt_single_fold_no_python(spark, sf_dir, q):
    """The smoothing fold is ONE Catalyst higher-order aggregate over
    each sorted series — no Python evaluation, no per-iteration joins."""
    plan = _plan(q["timeseries_holt"](spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 2, plan.count("Exchange")


def test_events_pattern_match_single_user_exchange(spark, sf_dir, q):
    """Sequence fold = one user-keyed agg; the regex evaluates JVM-side
    on the folded string (no UDF)."""
    plan = _plan(q["events_pattern_match"](spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 1, plan.count("Exchange")


def test_fn_geohash_zero_exchange_no_python(spark, sf_dir, q):
    """Geohash is pure per-row codegen arithmetic + substr concat."""
    plan = _plan(q["fn_geohash"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_join_spatial_grid_equi_join_no_cartesian(spark, sf_dir, q):
    """The radius join must run as a cell-keyed equi-join (3x3 probe
    explode), never the cartesian the naive distance predicate plans."""
    plan = _plan(q["join_spatial_grid"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_join_spatial_nn_equi_join_argmin_no_window(spark, sf_dir, q):
    """Bounded-radius NN = cell equi-join + min(struct) agg — no
    cartesian, no window/sort-based argmin."""
    plan = _plan(q["join_spatial_nn"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_join_interval_overlap_equi_join_no_nested_loop(spark, sf_dir, q):
    """The overlap theta-predicate must ride a bucket EQUI-join; the
    naive form plans a nested-loop product."""
    plan = _plan(q["join_interval_overlap"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_readability_zero_exchange_no_python(spark, sf_dir, q):
    """Pure per-row regexp arithmetic: map-only, JVM-side."""
    plan = _plan(q["text_readability"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_timeseries_ohlc_single_agg_no_window(spark, sf_dir, q):
    """OHLC is ONE map-side-combinable groupBy: the open/close argmin
    rides min/max(struct), never a window sort."""
    plan = _plan(q["timeseries_ohlc"](spark, sf_dir))
    assert "Window" not in plan
    assert plan.count("Exchange") <= 1, plan.count("Exchange")
    # struct-min/max plans as SortAggregate; the map-side combine is the
    # partial_min/partial_max pass before the single exchange
    assert "partial_min" in plan and "partial_max" in plan


def test_agg_cms_frequency_broadcast_sketch_no_cartesian(spark, sf_dir, q):
    """The sketch (bounded depth x width) must broadcast to the probe
    side; the build is a partial-agg shuffle."""
    plan = _plan(q["agg_cms_frequency"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_graph_jaccard_neighbor_keyed_join_broadcast_degrees(spark, sf_dir, q):
    """Common-neighbor counting joins on the shared-neighbor key (equi),
    and the degree frames come back broadcast."""
    plan = _plan(q["graph_jaccard"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_events_welch_ttest_two_exchanges_no_python(spark, sf_dir, q):
    """User-keyed agg + one-row global conditional agg — the
    events_ab_test pass structure; everything JVM-side."""
    plan = _plan(q["events_welch_ttest"](spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 2, plan.count("Exchange")


def test_bucketed_join_is_colocated_no_exchange(spark, sf_dir, q):
    """The operator's whole point: with broadcast disabled (forcing the
    join strategy a 100 TB fact-fact join would use), both scans read
    bucketed tables and the SortMergeJoin runs WITHOUT any Exchange —
    the per-query shuffle is gone, paid once at ingest."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = _formatted(q["join_bucketed_colocated"](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert out.count("Bucketed: true") == 2, out
    assert "SortMergeJoin" in out
    # exactly ONE Exchange in the whole plan: the tiny post-aggregation
    # one. The join subtree (everything below SortMergeJoin) has none.
    tree = out.split("(1) Scan")[0]
    assert tree.count("Exchange") == 1, out
    assert tree.index("Exchange") < tree.index("SortMergeJoin"), out
    assert "SelectedBucketsCount: 16 out of 16" in out


def test_slugify_is_arrow_batched_not_rowwise(spark):
    """The scalar pandas UDF must show ArrowEvalPython in the physical
    plan — never row-wise BatchEvalPython."""
    import __spark_entry__ as e

    df = e.queries()["fn_udf_slugify"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan[:500]
    assert "BatchEvalPython" not in plan


def test_partitioned_dir_scan_prunes(spark, sf_dir, q):
    """r10: scan_partitioned_dir's lang predicate must land as a
    PartitionFilter (directory skip), never a post-scan row filter."""
    out = _formatted(q["scan_partitioned_dir"](spark, sf_dir))
    pf_lines = [ln for ln in out.splitlines() if "PartitionFilters" in ln]
    assert pf_lines, "no PartitionFilters in the plan"
    assert any("lang" in ln and "[]" not in ln for ln in pf_lines), pf_lines


def test_bm25_streams_postings_broadcasts_query_terms(spark, sf_dir, q):
    """The r12 staged-index contract: search_bm25_topk reads the
    materialized postings/dictionary tables (Bucketed scans), the
    BOUNDED query-term side builds the broadcast hash, and the
    corpus-sized postings scan STREAMS — never the other way around
    (Catalyst's file-size stats would broadcast the postings table at
    fixture scale, exactly backwards at 100 TB)."""
    df = q["search_bm25_topk"](spark, sf_dir)
    df.count()  # resolve AQE so the final plan is inspectable
    plan = _plan(df)
    assert "Bucketed: true" in _formatted(df)
    assert "BatchEvalPython" not in plan
    # the broadcast legs must NOT contain the 4-column candidate
    # postings scan (w, doc_id, tf, len -> cand side); spot it by the
    # alias set on the BroadcastExchange subtree
    import re

    for m in re.finditer(r"BroadcastExchange[^\n]*\n((?:\s+[:+|-][^\n]*\n)*)", plan):
        sub = m.group(0)
        assert "len#" not in sub.split("BroadcastExchange")[1][:2000] or \
            "query_id" in sub, sub[:500]


def test_lexical_index_build_idempotent_and_consistent(spark, sf_dir):
    """lexical_index_build must be build-once (second call returns the
    same tables without rewriting) and internally consistent: per-doc
    len in every posting equals the doc's sum(tf), and the dictionary's
    df/tf_total equal fresh rollups of the postings."""
    import os

    from pyspark.sql import functions as F

    from quackflight_spark.pipeline.similarity import lexical_index_build

    idx1 = lexical_index_build(spark, sf_dir)
    stats_m = os.path.getmtime(f"{idx1['stats']}/_SUCCESS")
    idx2 = lexical_index_build(spark, sf_dir)
    assert idx1 == idx2
    assert os.path.getmtime(f"{idx2['stats']}/_SUCCESS") == stats_m
    post = spark.table(idx1["postings"])
    bad_len = (
        post.groupBy("doc_id", "len")
        .agg(F.sum("tf").alias("s"))
        .filter(F.col("s") != F.col("len"))
        .count()
    )
    assert bad_len == 0
    fresh = post.groupBy("w").agg(
        F.count(F.lit(1)).alias("df2"), F.sum("tf").alias("tt2")
    )
    mism = (
        spark.table(idx1["dict"])
        .join(fresh, "w", "full")
        .filter(
            (F.col("df") != F.col("df2")) | (F.col("tf_total") != F.col("tt2"))
        )
        .count()
    )
    assert mism == 0
