"""Write-path layout tests: partition pruning, shuffle-free bucketed
joins, skew salting — plan-level assertions for the sink-side scale
design (ARCHITECTURE.md)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from quackflight_spark.sources.fixtures import load_table
from quackflight_spark.sources.writers import (
    salted_join,
    two_phase_skew_agg,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="qf_writers_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_prunes(spark, sf_dir, tmpdir):
    ev = load_table(spark, sf_dir, "events")
    write_partitioned(ev, f"{tmpdir}/events_by_type", "event_type")
    back = spark.read.parquet(f"{tmpdir}/events_by_type")
    q = back.filter(F.col("event_type") == "error").select("event_id")
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    # the filter becomes a partition filter (directory pruning), not a data filter
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1].splitlines()[0]
    assert q.count() == ev.filter(F.col("event_type") == "error").count()


def test_bucketed_join_no_shuffle(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o.withColumnRenamed("o_orderkey", "k"), "b_orders", ["k"], 8)
    write_bucketed(li.withColumnRenamed("l_orderkey", "k"), "b_lineitem", ["k"], 8)
    # disable broadcast so the join would otherwise need an exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_lineitem").join(spark.table("b_orders"), on="k").select(
            "k", "l_quantity", "o_totalprice"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing co-located both sides
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_lineitem")


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k"), "l_quantity"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), "s_name"
    )
    plain = li.join(supp, on="k").groupBy("k").count()
    salted = salted_join(li, supp, "k").groupBy("k").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_two_phase_skew_agg_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        tuple(r)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total"))
        .collect()
    }
    salted = {
        tuple(r) for r in two_phase_skew_agg(li, "l_returnflag", "l_quantity").collect()
    }
    assert direct == salted


def test_merge_cow_rewrites_only_touched_partitions(spark, sf_dir, tmpdir):
    """Copy-on-write MERGE: untouched partition directories must be
    byte-identical on disk (same files, same mtimes); touched ones get
    the merged rows."""
    import os

    from quackflight_spark.sources.merge import merge_upsert_cow

    path = f"{tmpdir}/cust"
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    base.write.mode("overwrite").partitionBy("c_mktsegment").parquet(path)

    def listing(seg):
        d = f"{path}/c_mktsegment={seg}"
        return sorted((f, os.path.getmtime(f"{d}/{f}")) for f in os.listdir(d))

    untouched_before = listing("FURNITURE")
    src = base.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") % 5 == 0)
    ).withColumn("c_acctbal", F.col("c_acctbal") + F.lit(500.0))
    merge_upsert_cow(spark, path, src, ["c_custkey"], "c_mktsegment")

    assert listing("FURNITURE") == untouched_before  # never rewritten
    back = spark.read.parquet(path)
    assert back.count() == base.count()  # pure update: no inserts
    updated = back.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") % 5 == 0)
    )
    expected = src.select("c_custkey", "c_acctbal")
    assert (
        updated.select("c_custkey", "c_acctbal")
        .exceptAll(expected)
        .isEmpty()
    )


def test_merge_cow_inserts_new_partition(spark, sf_dir, tmpdir):
    """Source rows for a partition value the target has never seen land
    as a brand-new partition directory."""
    from quackflight_spark.sources.merge import merge_upsert_cow

    path = f"{tmpdir}/cust2"
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    base.write.mode("overwrite").partitionBy("c_mktsegment").parquet(path)
    src = base.limit(5).withColumn("c_mktsegment", F.lit("BRANDNEW")).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(10**6)
    )
    merge_upsert_cow(spark, path, src, ["c_custkey"], "c_mktsegment")
    back = spark.read.parquet(path)
    assert back.filter(F.col("c_mktsegment") == "BRANDNEW").count() == 5
    assert back.count() == base.count() + 5


def test_delete_cow_whole_partition(spark, sf_dir, tmpdir):
    """A predicate matching EVERY row of a partition must remove the
    whole partition directory (retention-sweep / GDPR erasure), not
    silently leave it behind because staging emitted no dir for it."""
    import os

    from quackflight_spark.sources.merge import delete_where_cow

    path = f"{tmpdir}/cust3"
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    base.write.mode("overwrite").partitionBy("c_mktsegment").parquet(path)
    assert os.path.isdir(f"{path}/c_mktsegment=BUILDING")
    delete_where_cow(spark, path, F.col("c_mktsegment") == "BUILDING", "c_mktsegment")
    assert not os.path.exists(f"{path}/c_mktsegment=BUILDING")
    back = spark.read.parquet(path)
    assert back.filter(F.col("c_mktsegment") == "BUILDING").count() == 0
    assert back.count() == base.filter(F.col("c_mktsegment") != "BUILDING").count()


def test_delete_cow_null_predicate_rows_survive(spark, sf_dir, tmpdir):
    """DELETE removes predicate=TRUE rows only: rows where the predicate
    evaluates NULL (NULL acctbal here) must survive in rewritten
    partitions, matching both SQL semantics and the touched-partition
    computation."""
    from quackflight_spark.sources.merge import delete_where_cow

    path = f"{tmpdir}/cust4"
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    # null out the balance for every 3rd customer, then delete negatives
    based = base.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.lit(None)).otherwise(F.col("c_acctbal")),
    )
    based.write.mode("overwrite").partitionBy("c_mktsegment").parquet(path)
    n_null = based.filter(F.col("c_acctbal").isNull()).count()
    n_neg = based.filter(F.col("c_acctbal") < 0).count()
    delete_where_cow(spark, path, F.col("c_acctbal") < 0, "c_mktsegment")
    back = spark.read.parquet(path)
    assert back.filter(F.col("c_acctbal").isNull()).count() == n_null
    assert back.count() == based.count() - n_neg


def test_partition_swap_safety_net_replaces_stale_dest(tmpdir):
    """If the driver-side dirname computation ever disagrees with what the
    writer wrote (escaping fallback), the safety-net loop must REPLACE the
    stale target directory with the staged rewrite — the old behavior
    skipped dirs whose dest existed, then rmtree'd staging, silently
    discarding the rewrite (lost update)."""
    import os
    from types import SimpleNamespace

    from quackflight_spark.sources.merge import _commit_partition_swap

    target = os.path.join(str(tmpdir), "t")
    staging = target + "__staging"
    os.makedirs(os.path.join(target, "seg=B"))
    os.makedirs(os.path.join(staging, "seg=B"))
    with open(os.path.join(target, "seg=B", "old.parquet"), "w") as f:
        f.write("old")
    with open(os.path.join(staging, "seg=B", "new.parquet"), "w") as f:
        f.write("new")

    # touched empty = the touched loop never claims seg=B (name mismatch)
    touched = SimpleNamespace(collect=lambda: [])
    _commit_partition_swap(None, staging, target, "seg", touched)

    assert os.listdir(os.path.join(target, "seg=B")) == ["new.parquet"]
    assert not os.path.exists(staging)


def test_partition_swap_raises_on_unresolvable_touched_value(tmpdir):
    """A touched value whose computed dirname exists in neither staging
    nor target means the escaping disagrees with the writer: the commit
    must fail loudly and leave staging on disk for recovery."""
    import os
    from types import SimpleNamespace

    import pytest as _pytest

    from quackflight_spark.sources.merge import _commit_partition_swap

    target = os.path.join(str(tmpdir), "t")
    staging = target + "__staging"
    os.makedirs(target)
    os.makedirs(os.path.join(staging, "seg=X"))

    touched = SimpleNamespace(collect=lambda: [("GHOST",)])
    with _pytest.raises(RuntimeError, match="neither staging nor target"):
        _commit_partition_swap(None, staging, target, "seg", touched)
    assert os.path.exists(os.path.join(staging, "seg=X"))


def test_zorder_layout_tightens_both_columns(spark, sf_dir, tmpdir):
    """Z-order clustering must give every parquet file a tight min/max
    envelope on BOTH cluster columns (multi-column data skipping); a
    linear sort only clusters its leading column."""
    import glob

    import pyarrow.parquet as pq

    from quackflight_spark.sources.layout import write_zordered

    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "event_id")
    lo_u, hi_u = [
        (r["lo"], r["hi"])
        for r in ev.agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi")).collect()
    ][0]
    lo_v, hi_v = [
        (r["lo"], r["hi"])
        for r in ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).collect()
    ][0]

    def mean_range_frac(path, col, lo, hi):
        fracs = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        fracs.append((s.max - s.min) / (hi - lo))
        assert fracs
        return sum(fracs) / len(fracs)

    # baseline: linear sort by user_id — value spans everything
    lin = f"{tmpdir}/linear"
    ev.repartitionByRange(16, F.col("user_id")).sortWithinPartitions("user_id").write.mode(
        "overwrite"
    ).parquet(lin)
    zo = f"{tmpdir}/zorder"
    write_zordered(ev, zo, "user_id", "value")

    lin_value_frac = mean_range_frac(lin, "value", lo_v, hi_v)
    z_user_frac = mean_range_frac(zo, "user_id", lo_u, hi_u)
    z_value_frac = mean_range_frac(zo, "value", lo_v, hi_v)
    # z-order keeps BOTH columns skippable...
    assert z_user_frac < 0.5, z_user_frac
    assert z_value_frac < 0.5, z_value_frac
    # ...while the linear layout's second column spans ≥2× wider envelopes
    assert lin_value_frac > 2 * z_value_frac, (lin_value_frac, z_value_frac)
    # and the data round-trips
    assert spark.read.parquet(zo).count() == ev.count()


def test_mv_refresh_leaves_untouched_partitions_alone(spark, sf_dir):
    """Incremental refresh must not rewrite MV partitions whose dates
    did not receive data: their files stay byte-identical (same paths,
    same mtimes) across the refresh."""
    import os

    from quackflight_spark.sources.matview import (
        MV_ROOT, SPLIT_DAY, _daily_rollup, refresh_incremental,
    )

    events = load_table(spark, sf_dir, "events")
    mv_path = f"{MV_ROOT}/test_incr"
    shutil.rmtree(mv_path, ignore_errors=True)
    split = F.lit(SPLIT_DAY).cast("date")
    (
        _daily_rollup(events.filter(F.to_date("ts") <= split))
        .repartition("event_date")
        .write.mode("overwrite").partitionBy("event_date").parquet(mv_path)
    )

    def snapshot():
        out = {}
        for d in os.listdir(mv_path):
            if d.startswith("event_date="):
                p = os.path.join(mv_path, d)
                out[d] = sorted(
                    (f, os.path.getmtime(os.path.join(p, f)))
                    for f in os.listdir(p)
                )
        return out

    before = snapshot()
    refresh_incremental(
        spark, mv_path, events.filter(F.to_date("ts") > split)
    )
    after = snapshot()
    base_dates = set(before)
    appended_dates = set(after) - base_dates
    assert appended_dates  # refresh added the new days
    for d in base_dates:  # and rewrote nothing else
        assert after[d] == before[d]
    shutil.rmtree(mv_path, ignore_errors=True)


def test_compact_files_reduces_count_preserves_rows(spark, sf_dir, tmpdir):
    """Compaction: 32 shards -> right-sized files, identical content."""
    from quackflight_spark.sources.layout import compact_files

    path = f"{tmpdir}/frag"
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(32).write.mode("overwrite").parquet(path)  # fragmented
    n = ev.count()
    before_rows = {tuple(r) for r in spark.read.parquet(path).collect()}
    before, after = compact_files(spark, path, target_rows_per_file=n // 2 + 1)
    assert before == 32
    assert after == 2
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before_rows


def test_minhash_bucketed_verify_array_side_no_exchange(spark):
    """Past BROADCAST_DOC_LIMIT the minhash verify joins read the
    8 KB/doc hash arrays from a doc_id-bucketed table. Contract (r3
    verdict item 3): the ARRAY side of every verify join plans zero
    Exchange — only the (long, long) candidate stream shuffles (and only
    its final hop carries one attached array). Also: the bucketed path
    must produce byte-identical results to the broadcast path."""
    from pyspark.sql import functions as F

    from quackflight_spark.pipeline.dedup import minhash_verify
    from quackflight_spark.sources.writers import write_bucketed

    # synthetic shingle-hash table with known overlaps: docs 1/2 share
    # 9 hashes (j=9/12=0.75 keep), 1/3 share 5 (j=5/15=0.33 drop),
    # 4/5 identical (j=1.0 keep)
    rows = [
        (1, sorted(range(0, 10)), 10),
        (2, sorted(list(range(1, 10)) + [100, 101]), 11),
        (3, sorted(list(range(5, 10)) + list(range(200, 205))), 10),
        (4, sorted(range(300, 340)), 40),
        (5, sorted(range(300, 340)), 40),
    ]
    hs = spark.createDataFrame(
        [(d, [int(x) for x in a], n) for d, a, n in rows],
        "doc_id bigint, hsh array<bigint>, n_sh int",
    )
    cand = spark.createDataFrame(
        [(a, b) for a in range(1, 6) for b in range(a + 1, 6)],
        "doc_a bigint, doc_b bigint",
    ).localCheckpoint()
    spark.sql("DROP TABLE IF EXISTS qf_test_minhash_hsh")
    write_bucketed(hs, "qf_test_minhash_hsh", ["doc_id"], 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = minhash_verify(cand, spark.table("qf_test_minhash_hsh"), use_broadcast=False)
        got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
        assert got == {(1, 2): 0.75, (4, 5): 1.0}
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        import re

        # 4 bucketed scans feed the joins directly — no Exchange between
        # any bucketed FileScan and its SortMergeJoin; the only exchanges
        # are the candidate stream's re-keyings (a->b->a->b = 4)
        assert final.count("Bucketed: true") == 4, final
        assert len(re.findall(r"Exchange hashpartitioning", final)) <= 4, final
        assert "BroadcastHashJoin" not in final
        # broadcast path must agree exactly
        bc = minhash_verify(cand, hs, use_broadcast=True)
        got_bc = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in bc.collect()}
        assert got_bc == got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE qf_test_minhash_hsh")


def test_minhash_bucketed_path_end_to_end(spark, sf_dir, monkeypatch):
    """Force the REAL dedup_minhash_lsh down the past-broadcast-limit
    path (limit monkeypatched to 0) and require byte-identical pairs to
    the broadcast path — the full pipeline integration of the bucketed
    verify, not just the synthetic-join unit above."""
    from quackflight_spark.pipeline import dedup
    from quackflight_spark.pipeline.frame_cache import clear_frames

    broadcast_rows = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    monkeypatch.setattr(dedup, "BROADCAST_DOC_LIMIT", 0)
    clear_frames()
    spark.sql("DROP TABLE IF EXISTS " + dedup.minhash_table_name(sf_dir))
    try:
        bucketed_rows = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS " + dedup.minhash_table_name(sf_dir))
        clear_frames()
    assert bucketed_rows == broadcast_rows
    assert len(bucketed_rows) > 0


def test_zorder_clusters_both_dimensions(spark):
    """The z-order claim, quantified: chunk the sorted output into
    row-group-sized blocks and measure each block's (max-min) key range
    — the exact quantity parquet footer pruning depends on. Sorting by
    one column leaves the OTHER column's per-block range near the full
    domain (no pruning); the Morton order must keep the WORST of the
    two ranges well under that."""
    from pyspark.sql import functions as F

    from quackflight_spark.sources.layout import _morton_sql

    dom, chunk = 64, 128
    n = dom * dom  # the full (a, b) grid, each cell exactly once
    df = spark.range(n).select(
        (F.col("id") % dom).alias("a"),
        (F.col("id") / dom).cast("long").alias("b"),
    )

    def worst_chunk_range(ordered_cols):
        rows = df.orderBy(*ordered_cols).collect()
        worst = 0
        for i in range(0, n, chunk):
            blk = rows[i:i + chunk]
            ra = max(r["a"] for r in blk) - min(r["a"] for r in blk)
            rb = max(r["b"] for r in blk) - min(r["b"] for r in blk)
            worst = max(worst, max(ra, rb))
        return worst

    single = worst_chunk_range(["a", "b"])
    z = worst_chunk_range([F.expr(_morton_sql("a", "b"))])
    # single-column sort leaves b's per-block range ~ the whole domain;
    # z-order must cut the worst dimension's block range at least in half
    assert single >= dom - 2, single
    assert z <= single / 2, (z, single)


def test_hilbert_sql_chain_matches_reference(spark):
    """The 8-level engine-neutral SQL chain must agree with the
    driver-side reference xy2d on a dense sample of the 256x256 grid
    (every 7th/11th cell plus the corners)."""
    from pyspark.sql import functions as F

    from quackflight_spark.sources.layout import (
        HILBERT_BITS,
        _hilbert_step_exprs,
        hilbert_xy2d,
    )

    n = 1 << HILBERT_BITS
    pts = [(x, y) for x in range(0, n, 7) for y in range(0, n, 11)]
    pts += [(0, 0), (n - 1, 0), (0, n - 1), (n - 1, n - 1)]
    df = spark.createDataFrame(pts, "x: bigint, y: bigint").select(
        F.col("x").alias("x0"), F.col("y").alias("y0"),
        F.col("x"), F.col("y"), F.lit(0).cast("bigint").alias("d"),
    )
    for lvl in range(HILBERT_BITS):
        s = n >> (lvl + 1)
        xn, yn, dn = _hilbert_step_exprs(s, n)
        df = df.select(
            "x0", "y0",
            F.expr(xn).alias("x"), F.expr(yn).alias("y"),
            F.expr(dn).alias("d"),
        )
    for r in df.collect():
        assert r["d"] == hilbert_xy2d(r["x0"], r["y0"]), (r["x0"], r["y0"])


def test_hilbert_beats_zorder_on_worst_block_range():
    """The locality claim that justifies the second curve: on the same
    chunked-scan measure as the z-order test, the Hilbert order's worst
    per-block coordinate range must be no worse than Morton's (Hilbert
    has no quadrant-boundary jumps)."""
    from quackflight_spark.sources.layout import hilbert_xy2d

    dom, chunk = 64, 128

    def worst_chunk_range(key):
        cells = sorted(
            ((x, y) for x in range(dom) for y in range(dom)), key=key
        )
        worst = 0
        for i in range(0, dom * dom, chunk):
            blk = cells[i:i + chunk]
            ra = max(c[0] for c in blk) - min(c[0] for c in blk)
            rb = max(c[1] for c in blk) - min(c[1] for c in blk)
            worst = max(worst, ra, rb)
        return worst

    def morton(c):
        x, y = c
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    h = worst_chunk_range(lambda c: hilbert_xy2d(c[0], c[1]))
    m = worst_chunk_range(morton)
    assert h <= m, (h, m)


def test_time_travel_manifests_and_mor_delete(spark, sf_dir):
    """The commit-log claims, checked at the FILE level: v1's manifest
    reuses v0's physical files for every unchanged partition (CoW cost
    proportional to changed data); v2 adds only a delete sidecar (zero
    data files touched); v0 snapshot equals the raw fixture; v2 hides
    exactly the keys in the deletion vector."""
    import json

    from quackflight_spark.sources.fixtures import load_table
    from quackflight_spark.sources.timetravel import (
        TT_DEL_KEY_MOD,
        TT_UPD_NATION_MOD,
        build_versioned_table,
        read_version,
    )

    root = build_versioned_table(spark, sf_dir)
    m = [json.load(open(f"{root}/manifest_{v}.json")) for v in (0, 1, 2)]
    for nk, files in m[0]["files"].items():
        if int(nk) % 5 == TT_UPD_NATION_MOD:
            assert m[1]["files"][nk] != files, nk  # rewritten
        else:
            assert m[1]["files"][nk] == files, nk  # carried forward
    assert m[2]["files"] == m[1]["files"]  # MOR delete touches no data
    assert m[2]["deletes"] and not m[1]["deletes"]

    cust = load_table(spark, sf_dir, "customer")
    v0 = read_version(spark, root, 0)
    assert v0.count() == cust.count()
    v2 = read_version(spark, root, 2)
    expected_deleted = cust.filter(
        (F.col("c_custkey") % 7) == TT_DEL_KEY_MOD
    ).count()
    assert v2.count() == cust.count() - expected_deleted
    assert v2.filter((F.col("c_custkey") % 7) == TT_DEL_KEY_MOD).count() == 0
