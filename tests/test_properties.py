"""Property-based differential tests (hypothesis) — SURVEY §5.2 stretch
goal the reference never had: for arbitrary generated inputs, the engine's
scalar semantics must match DuckDB's on the same data.

Each property materializes one generated column into BOTH engines and
compares a battery of expressions. Examples are capped (Spark actions are
~0.3 s each); the value is the adversarial inputs hypothesis finds —
empty strings, unicode, signed zeros, huge ints — not volume.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@pytest.fixture(scope="module")
def q():
    import __spark_entry__ as e

    return e.queries()


def _both(spark, values: list, sql_body: str, dtype: str):
    """Run `SELECT <sql_body> FROM t(v)` in Spark and DuckDB, return both
    row lists (column-name-sorted like the driver compare)."""
    pdf = pd.DataFrame({"v": pd.Series(values, dtype=dtype)})
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("prop_t")
    s = [tuple(r) for r in spark.sql(f"SELECT {sql_body} FROM prop_t").collect()]
    con = duckdb.connect()
    con.register("prop_t", pdf)
    d = con.execute(f"SELECT {sql_body} FROM prop_t").fetchall()
    return sorted(map(repr, s)), sorted(map(repr, d))


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), min_size=1, max_size=20))
def test_integer_arithmetic_matches(spark, xs):
    s, d = _both(
        spark,
        xs,
        "v + 1 AS a, v * 2 AS b, abs(v) AS c, CAST(v % 7 AS BIGINT) AS m, "
        "CASE WHEN v > 0 THEN 'pos' WHEN v < 0 THEN 'neg' ELSE 'zero' END AS sgn",
        "int64",
    )
    assert s == d


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(
            # Found by this very property: non-ASCII case mapping diverges
            # between engines — upper('ß') is 'SS' in Spark (Java full
            # mapping) vs 'ẞ' in DuckDB (simple mapping), and upper('ƛ')
            # differs because Java 17 and DuckDB ship different Unicode
            # table versions. Real engine-semantics differences (recorded
            # in the gotchas memory); the property pins the stable ASCII
            # surface, where hypothesis still probes empties, quotes,
            # escapes and punctuation.
            alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
            max_size=24,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_string_functions_match(spark, xs):
    s, d = _both(
        spark,
        xs,
        "upper(v) AS u, lower(v) AS l, length(v) AS n, reverse(v) AS r, "
        "substr(v, 1, 3) AS s3, concat(v, '!') AS bang, trim(v) AS t",
        "object",
    )
    assert s == d


@settings(**SETTINGS)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=20,
    )
)
def test_decimal_exact_aggregation_matches(spark, xs):
    """The engine's decimal-exact SUM contract holds for arbitrary floats
    (the property behind every agg oracle in the suite)."""
    s, d = _both(
        spark,
        xs,
        "CAST(SUM(CAST(v AS DECIMAL(28,6))) AS DOUBLE) AS total, COUNT(*) AS n",
        "float64",
    )
    assert s == d


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=20))
def test_distinct_and_topk_match(spark, xs):
    s, d = _both(
        spark,
        xs,
        "COUNT(DISTINCT v) AS nd, MIN(v) AS lo, MAX(v) AS hi",
        "int64",
    )
    assert s == d


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "ab"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([("a", "b"), ("a", "a"), ("b", "c"), ("ab", "c")]),
)
def test_bpe_merge_fold_matches_python(spark, seqs, pair):
    """The Catalyst left-to-right merge fold must agree with the Python
    reference on arbitrary symbol sequences, including overlapping runs
    ("aaa" + (a,a) -> ["aa","a"]) and symbols equal to the merged token."""
    from pyspark.sql import functions as F

    from quackflight_spark.pipeline.bpe import _apply_merge

    a, b = pair

    def py_merge(sym):
        out = []
        for s in sym:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)], "i int, sym array<string>"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", _apply_merge(F.col("sym"), a, b).alias("m")
        ).collect()
    }
    for i, s in enumerate(seqs):
        assert got[i] == py_merge(s), (s, a, b)


def test_ntile_distributed_matches_window_ntile(spark):
    """_ntile_distributed must be bit-identical to the global-window
    NTILE for every bucket count and frame size, including n < buckets
    and the uneven-remainder cases — exercised across many partitions so
    the offset arithmetic is actually multi-partition."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from quackflight_spark.streaming.windowed import _ntile_distributed

    for n, b in [(0, 4), (1, 4), (3, 4), (97, 4), (1000, 7), (64, 64)]:
        df = (
            spark.range(n)
            .select(
                F.col("id").alias("k"),
                # collide values so the tie-break path is exercised
                (F.col("id") % 11).alias("v"),
            )
            .repartition(8)
        )
        got = {
            r["k"]: r["b"]
            for r in _ntile_distributed(df, ["v", "k"], "b", b).collect()
        }
        want = {
            r["k"]: r["b"]
            for r in df.select(
                "k", F.ntile(b).over(W.orderBy("v", "k")).alias("b")
            ).collect()
        }
        assert got == want, (n, b)


def test_ntile_distributed_arrow_matches_window_ntile(spark):
    """The mapInArrow rank-in-materialization variant (r4-verdict
    stretch investigation — measured slower than the Window form at
    scale, kept as documented evidence) must still be bit-identical to
    the global-window NTILE across bucket counts and frame sizes."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from quackflight_spark.streaming.windowed import _ntile_distributed_arrow

    for n, b in [(0, 4), (3, 4), (97, 4), (1000, 7)]:
        df = (
            spark.range(n)
            .select(F.col("id").alias("k"), (F.col("id") % 11).alias("v"))
            .repartition(8)
        )
        got = {
            r["k"]: r["b"]
            for r in _ntile_distributed_arrow(df, ["v", "k"], "b", b).collect()
        }
        want = {
            r["k"]: r["b"]
            for r in df.select(
                "k", F.ntile(b).over(W.orderBy("v", "k")).alias("b")
            ).collect()
        }
        assert got == want, (n, b)


def test_ntile_distributed_long_matches_window_ntile(spark):
    """The fused long-format variant (one barrier for ALL metrics — the
    r5 events_rfm optimization) must assign per-metric buckets
    bit-identical to a per-metric global-window NTILE. Metrics get
    different sizes and value distributions so per-metric offsets/totals
    are genuinely distinct, and the range partitioning straddles metric
    boundaries."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from quackflight_spark.streaming.windowed import _ntile_distributed_long

    for b in (4, 7):
        # metric 0: 97 rows, metric 1: 500 rows, metric 2: 3 rows (n < b)
        long = (
            spark.range(600)
            .select(
                F.when(F.col("id") < 97, 0)
                .when(F.col("id") < 597, 1)
                .otherwise(2)
                .alias("metric_id"),
                ((F.col("id") * 37) % 101).cast("double").alias("value"),
                F.col("id").alias("user_id"),
            )
            .repartition(8)
        )
        got = {
            (r["metric_id"], r["user_id"]): r["bucket"]
            for r in _ntile_distributed_long(long, b).collect()
        }
        want = {
            (r["metric_id"], r["user_id"]): r["b"]
            for r in long.select(
                "metric_id",
                "user_id",
                F.ntile(b)
                .over(W.partitionBy("metric_id").orderBy("value", "user_id"))
                .alias("b"),
            ).collect()
        }
        assert got == want, b


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),   # descriptor length
            st.integers(min_value=0, max_value=2),    # noun id
        ),
        min_size=1,
        max_size=25,
    )
)
def test_fuzzy_banding_lossless_property(spark, specs):
    """Hypothesis form of the banding proof: for arbitrary name
    populations (repeated-character descriptors of adversarial lengths
    over a tiny noun vocabulary — maximal band-boundary pressure), the
    banded fuzzy join must equal the unbanded token-blocked ground
    truth exactly."""
    from pyspark.sql import functions as F

    from quackflight_spark.operators.tpch_extra import (
        FUZZY_MAX_DIST, fuzzy_name_pairs,
    )

    names = list({f"{'x' * d} noun{t}" for d, t in specs})
    df = spark.createDataFrame([(n,) for n in names], ["p_name"])
    # band_threshold=0 forces the banded branch (the adaptive default
    # would route these tiny blocks down the plain token join, which is
    # definitionally identical to the ground truth below)
    got = {
        tuple(r)
        for r in fuzzy_name_pairs(df, block_cap=10**9, band_threshold=0).collect()
    }
    last = lambda c: F.element_at(F.split(F.col(c), " "), -1)  # noqa: E731
    a = df.select(F.col("p_name").alias("name_a"))
    b = df.select(F.col("p_name").alias("name_b"))
    want = {
        tuple(r)
        for r in (
            a.join(b, (F.col("name_a") < F.col("name_b")) & (last("name_a") == last("name_b")))
            .withColumn("dist", F.levenshtein("name_a", "name_b").cast("int"))
            .filter(F.col("dist") <= FUZZY_MAX_DIST)
            .collect()
        )
    }
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),       # key
            st.floats(min_value=-1e4, max_value=1e4,
                      allow_nan=False, allow_infinity=False),  # new value
        ),
        min_size=0,
        max_size=5,
        unique_by=lambda t: t[0],
    )
)
def test_scd2_merge_invariants_property(spark, upd):
    """Hypothesis invariants for scd2_merge over a fixed 5-key dimension:
    exactly one is_current row per key, closed rows carry the effective
    date, version counts grow only for keys whose tracked value actually
    changed, and no rows are lost."""
    import datetime

    from quackflight_spark.sources.merge import scd2_merge

    d0 = datetime.date(2020, 1, 1)
    dim = spark.createDataFrame(
        [(k, float(k) * 10, d0, None, True) for k in range(1, 6)],
        "k bigint, v double, valid_from date, valid_to date, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(k, v) for k, v in upd], "k bigint, v double"
    ) if upd else spark.createDataFrame([], "k bigint, v double")
    out = scd2_merge(dim, updates, ["k"], ["v"], "2021-06-01").collect()
    changed = {k for k, v in upd if v != float(k) * 10}
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    assert set(by_key) == set(range(1, 6))  # no key lost
    for k, rows in by_key.items():
        current = [r for r in rows if r.is_current]
        assert len(current) == 1  # exactly one open version
        if k in changed:
            assert len(rows) == 2
            closed = next(r for r in rows if not r.is_current)
            assert str(closed.valid_to) == "2021-06-01"
            assert str(current[0].valid_from) == "2021-06-01"
        else:
            assert len(rows) == 1 and current[0].v == float(k) * 10


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet="abcz ", min_size=1, max_size=30),
        min_size=1, max_size=10,
    )
)
def test_text_entropy_bounds_and_python_parity(spark, texts):
    """Shannon-entropy invariants on arbitrary texts: 0 ≤ H ≤ log2 of
    the doc's distinct-char count (equality iff uniform), and the
    histogram-based Spark formula must match a direct Python
    computation to the same 6-decimal rounding."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    chars = sdf.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col("text"), ""), lambda x: x != "")).alias("ch"),
    )
    hist = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    got = {
        r["doc_id"]: (r["n"], r["h"])
        for r in hist.groupBy("doc_id").agg(
            F.sum("c").alias("n"),
            F.round(
                F.log2(F.sum("c").cast("double"))
                - F.sum(F.col("c") * F.log2(F.col("c").cast("double"))) / F.sum("c"),
                6,
            ).alias("h"),
        ).collect()
    }
    for i, t in enumerate(texts):
        cnt = Counter(t)
        n = sum(cnt.values())
        if n == 0:
            assert i not in got  # empty text yields no histogram row
            continue
        h = math.log2(n) - sum(c * math.log2(c) for c in cnt.values()) / n
        want_n, want_h = n, round(h, 6)
        assert got[i][0] == want_n
        assert abs(got[i][1] - want_h) <= 1e-6, (t, got[i], want_h)
        assert -1e-9 <= got[i][1] <= math.log2(max(len(cnt), 1)) + 1e-6


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=0, max_size=24,
    )
)
def test_triangle_orientation_invariance(spark, raw_edges):
    """Degree-ordered orientation must count exactly the triangles a
    brute-force enumeration finds, on arbitrary small graphs (the
    boundary shapes: multi-edges collapse, self-loops drop, hubs force
    ties in the degree order)."""
    from collections import Counter
    from itertools import combinations

    from pyspark.sql import functions as F

    edges = {(min(u, v), max(u, v)) for u, v in raw_edges if u != v}
    nodes = sorted({x for e in edges for x in e})
    want = Counter()
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= edges:
            want[a] += 1; want[b] += 1; want[c] += 1
    if not edges:
        return
    und = spark.createDataFrame(sorted(edges), ["u", "v"])
    deg_rows = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg_rows.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg_rows.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = und.join(du, "u").join(dv, "v").select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    e1 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    e2 = oriented.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    e3 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    tri = (
        e1.join(e2, "y").join(e3, ["x", "z"], "left_semi")
        .select(F.explode(F.array("x", "y", "z")).alias("node"))
    )
    got = {
        r["node"]: r["n"]
        for r in tri.groupBy("node").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == dict(want), (sorted(edges), got, dict(want))


@settings(**SETTINGS)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000_000),
        min_size=1, max_size=20,
    )
)
def test_holt_fold_matches_python(spark, obs):
    """The Catalyst higher-order Holt fold must equal a direct Python
    left fold for arbitrary non-negative integer series — including the
    negative intermediate trends floor-halving produces on decreasing
    series (the case DuckDB 1.0's list_reduce got wrong, which is why
    the oracle replays via recursive CTE instead)."""
    import math

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(obs,)], "obs array<bigint>")
    fold = F.expr("""
        aggregate(
          slice(obs, 2, size(obs) - 1),
          named_struct('lv', obs[0], 'tr', CAST(0 AS BIGINT)),
          (a, x) -> named_struct(
            'lv', CAST(floor((a.lv + a.tr + x) / 2.0) AS BIGINT),
            'tr', CAST(floor((a.tr
                              + CAST(floor((a.lv + a.tr + x) / 2.0) AS BIGINT)
                              - a.lv) / 2.0) AS BIGINT)))
    """)
    got = df.select(fold.alias("st")).collect()[0]["st"]
    lv, tr = obs[0], 0
    for x in obs[1:]:
        nl = math.floor((lv + tr + x) / 2)
        tr = math.floor((tr + nl - lv) / 2)
        lv = nl
    assert (got["lv"], got["tr"]) == (lv, tr), (obs, got, (lv, tr))


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-900, max_value=900),
            st.integers(min_value=-1800, max_value=1800),
        ),
        min_size=1, max_size=20,
    )
)
def test_spatial_grid_join_lossless(spark, pts):
    """The r-cell + 3x3-neighbor-probe decomposition must find exactly
    the pairs the quadratic definition finds, for arbitrary integer
    point sets — including points ON cell boundaries and pairs
    straddling the corner of four cells (the shapes the neighbor probe
    could drop if the adjacency argument were wrong)."""
    from pyspark.sql import functions as F

    r = 20
    uniq = sorted(set(pts))
    want = {
        (i, j, (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2)
        for i, a in enumerate(uniq)
        for j, b in enumerate(uniq)
        if i < j and (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 <= r * r
    }
    df = spark.createDataFrame(
        [(i, a[0], a[1]) for i, a in enumerate(uniq)], "k long, lat_d long, lon_d long"
    )
    cx = ((F.col("lat_d") + 900) / r).cast("bigint")
    cy = ((F.col("lon_d") + 1800) / r).cast("bigint")
    build = df.select(
        F.col("k").alias("key_b"), F.col("lat_d").alias("lat_b"),
        F.col("lon_d").alias("lon_b"), cx.alias("cx"), cy.alias("cy"),
    )
    probe = df.select(
        F.col("k").alias("key_a"), F.col("lat_d").alias("lat_a"),
        F.col("lon_d").alias("lon_a"),
        F.explode(F.array(*[
            F.struct((cx + dx).alias("cx"), (cy + dy).alias("cy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])).alias("c"),
    ).select("key_a", "lat_a", "lon_a",
             F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    d2 = (F.col("lat_a") - F.col("lat_b")) ** 2 + (F.col("lon_a") - F.col("lon_b")) ** 2
    got = {
        (r_["key_a"], r_["key_b"], int(r_["d2"]))
        for r_ in probe.join(build, ["cx", "cy"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("d2", d2.cast("bigint"))
        .filter(F.col("d2") <= r * r)
        .collect()
    }
    assert got == want, (uniq, got ^ want)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),   # start
            st.integers(min_value=1, max_value=100),   # length
        ),
        min_size=2, max_size=24,
    )
)
def test_interval_overlap_bucket_join_exactly_once(spark, ivs):
    """The bucket decomposition must emit each overlapping pair EXACTLY
    once (the owning-bucket filter), for arbitrary intervals — including
    intervals longer than the bucket, pairs straddling bucket edges, and
    identical intervals."""
    from pyspark.sql import functions as F

    w = 64
    a = [(i, s, s + ln) for i, (s, ln) in enumerate(ivs[::2])]
    b = [(i, s, s + ln) for i, (s, ln) in enumerate(ivs[1::2])]
    want = sorted(
        (ia, ib, min(ea, eb) - max(sa, sb))
        for ia, sa, ea in a
        for ib, sb, eb in b
        if sa < eb and sb < ea
    )
    if not a or not b:
        return

    def side(rows, key, s, e):
        df = spark.createDataFrame(rows, f"{key} long, {s} long, {e} long")
        return df.select(
            key, s, e,
            F.explode(
                F.sequence(
                    (F.col(s) / w).cast("bigint"),
                    ((F.col(e) - 1) / w).cast("bigint"),
                )
            ).alias("bucket"),
        )

    got = sorted(
        (r["key_a"], r["key_b"], r["ov"])
        for r in side(a, "key_a", "sa", "ea")
        .join(side(b, "key_b", "sb", "eb"), "bucket")
        .filter(
            (F.col("sa") < F.col("eb")) & (F.col("sb") < F.col("ea"))
            & ((F.greatest(F.col("sa"), F.col("sb")) / w).cast("bigint")
               == F.col("bucket"))
        )
        .select(
            "key_a", "key_b",
            (F.least(F.col("ea"), F.col("eb"))
             - F.greatest(F.col("sa"), F.col("sb"))).alias("ov"),
        )
        .collect()
    )
    assert got == want, (a, b, got, want)


def test_cms_never_underestimates(spark, sf_dir, q):
    """The count-min guarantee: est >= true for EVERY item, and with
    width << |items| the fixture must show at least one genuine
    collision overestimate (otherwise the demo is vacuous)."""
    rows = q["agg_cms_frequency"](spark, sf_dir).collect()
    assert rows
    assert all(r["est_count"] >= r["true_count"] for r in rows)
    assert any(r["est_count"] > r["true_count"] for r in rows)


def test_welch_ttest_matches_textbook_formula(spark, sf_dir, q):
    """Recompute Welch's t from the raw per-user revenue in plain Python
    (float accumulation over sorted users) and compare to 6 decimals."""
    import math

    from pyspark.sql import functions as F

    from quackflight_spark.sources.fixtures import load_table

    got = q["events_welch_ttest"](spark, sf_dir).collect()[0]
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(18,2)"),
                    )
                ),
                F.lit(0),
            ).alias("y")
        )
        .collect()
    )
    import hashlib

    arms = {0: [], 1: []}
    for r in per_user:
        v = int(hashlib.md5(str(r["user_id"]).encode()).hexdigest()[:4], 16) % 2
        arms[v].append(float(r["y"]))
    ya, yb = arms[0], arms[1]
    ma, mb = sum(ya) / len(ya), sum(yb) / len(yb)
    va = sum((x - ma) ** 2 for x in ya) / (len(ya) - 1)
    vb = sum((x - mb) ** 2 for x in yb) / (len(yb) - 1)
    t = (ma - mb) / math.sqrt(va / len(ya) + vb / len(yb))
    assert got["n_a"] == len(ya) and got["n_b"] == len(yb)
    assert abs(got["mean_a"] - ma) < 1e-4
    assert abs(got["t_stat"] - t) < 1e-4, (got["t_stat"], t)


def test_ohlc_open_close_are_first_last_ticks(spark, sf_dir, q):
    """open/close must equal the value at the chronologically first/last
    (ts, event_id) tick of each bucket — checked by brute force."""
    from quackflight_spark.sources.fixtures import load_table

    got = {
        (r["event_type"], r["day"]): r
        for r in q["timeseries_ohlc"](spark, sf_dir).collect()
    }
    raw = (
        load_table(spark, sf_dir, "events")
        .filter("event_type IN ('purchase','click','view')")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    from collections import defaultdict
    from decimal import Decimal

    buckets = defaultdict(list)
    for r in raw:
        buckets[(r["event_type"], r["ts"].date())].append(
            (r["ts"], r["event_id"], Decimal(str(round(r["value"], 2))))
        )
    assert set(got) == set(buckets)
    for k, ticks in buckets.items():
        ticks.sort()
        # outputs are DOUBLE since r8 (decimal-output gate hazard);
        # the decimal->double cast of a 2-dp cents value is exact
        assert got[k]["open"] == float(ticks[0][2]), k
        assert got[k]["close"] == float(ticks[-1][2]), k
        assert got[k]["n_ticks"] == len(ticks)


def test_graph_jaccard_brute_force(spark, sf_dir, q):
    """Jaccard pairs must match the brute-force set computation over the
    distinct supplier->parts adjacency."""
    from quackflight_spark.sources.fixtures import load_table

    got = {
        (r["s_a"], r["s_b"]): (r["n_common"], r["n_union"])
        for r in q["graph_jaccard"](spark, sf_dir).collect()
    }
    adj = {}
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .collect()
    ):
        adj.setdefault(r["l_suppkey"], set()).add(r["l_partkey"])
    want = {}
    ks = sorted(adj)
    for i, sa in enumerate(ks):
        for sb in ks[i + 1:]:
            c = len(adj[sa] & adj[sb])
            if c >= 3:
                want[(sa, sb)] = (c, len(adj[sa] | adj[sb]))
    assert got == want


def test_readability_counts_match_python_re(spark, sf_dir, q):
    """Word / sentence / syllable counts must equal an independent
    Python re recomputation on every fixture document."""
    import re as _re

    from quackflight_spark.sources.fixtures import load_table

    got = {r["doc_id"]: r for r in q["text_readability"](spark, sf_dir).collect()}
    for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect():
        text = r["text"]
        words = [t for t in _re.split(r"\s+", text.strip()) if t]
        sents = max(len(_re.findall(r"[.!?]+", text)), 1)
        syls = len(_re.findall(r"[aeiouy]+", text.lower()))
        g = got[r["doc_id"]]
        assert g["n_words"] == len(words), r["doc_id"]
        assert g["n_sentences"] == sents, r["doc_id"]
        assert g["n_syllables"] == syls, r["doc_id"]


def test_hll_portable_accuracy_and_raw_range(spark, sf_dir, q):
    """Portable-HLL contract: every fixture segment sits safely in the
    raw-estimate range (true > 2.5m = 80, so the skipped linear-
    counting branch is provably never exercised), and the estimate
    lands within 3 sigma (~55% for m=32) of exact distinct."""
    rows = q["agg_hll_portable"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["true_distinct"] > 80, r
        rel = abs(r["est_distinct"] - r["true_distinct"]) / r["true_distinct"]
        assert rel < 0.55, (r, rel)


def test_cusum_matches_sequential_recurrence(spark, sf_dir, q):
    """The prefix-min closed form must equal the textbook sequential
    recurrence s_i = max(0, s_{i-1} + (x_i - k)) replayed in Python,
    exactly (all-integer pipeline)."""
    from collections import defaultdict

    rows = q["timeseries_cusum"](spark, sf_dir).collect()
    assert rows
    series = defaultdict(list)
    for r in rows:
        series[r["event_type"]].append(r)
    for ev, rs in series.items():
        rs.sort(key=lambda r: r["day"])
        total = sum(r["n_events"] for r in rs)
        k = total // len(rs)
        s = 0
        for r in rs:
            s = max(0, s + (r["n_events"] - k))
            assert r["cusum"] == s, (ev, r, s)
            assert r["is_alarm"] == (s > k // 2), (ev, r)


def test_ks_test_matches_manual_ecdf(spark, sf_dir, q):
    """Replay the two-sample KS statistic from the raw per-arm value
    lists in Python (exact integer cross-multiplication over the pooled
    support) and require exact agreement."""
    import hashlib

    from pyspark.sql import functions as F

    from quackflight_spark.sources.fixtures import load_table

    got = q["events_ks_test"](spark, sf_dir).collect()[0]
    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("value").cast("decimal(18,2)").alias("v"))
        .collect()
    )
    a, b = [], []
    for r in rows:
        h = int(hashlib.md5(str(r["user_id"]).encode()).hexdigest()[:4], 16) % 2
        (a if h == 0 else b).append(r["v"])
    n_a, n_b = len(a), len(b)
    support = sorted(set(a) | set(b))
    d_num = max(
        abs(
            sum(1 for x in a if x <= v) * n_b
            - sum(1 for x in b if x <= v) * n_a
        )
        for v in support
    )
    assert (got["n_a"], got["n_b"], got["d_num"]) == (n_a, n_b, d_num), got
    assert got["d_stat"] == d_num / (n_a * n_b)


def test_cdc_apply_matches_sequential_replay(spark, sf_dir, q):
    """Replay the changelog row-by-row per key in (ts, event_id) order
    (the naive stateful apply) and require the compacted state to match
    exactly — including tombstoned keys being absent."""
    from pyspark.sql import functions as F

    from quackflight_spark.sources.fixtures import load_table

    got = {
        r["user_id"]: (r["last_op"], r["last_value"], r["last_ts"], r["n_changes"])
        for r in q["merge_cdc_apply"](spark, sf_dir).collect()
    }
    raw = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id", "ts", "event_id", "event_type",
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .collect()
    )
    state, counts = {}, {}
    for r in sorted(raw, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        op = {"signup": "I", "error": "D"}.get(r["event_type"], "U")
        counts[r["user_id"]] = counts.get(r["user_id"], 0) + 1
        state[r["user_id"]] = (op, r["v"], r["ts"])
    want = {
        # last_value is DOUBLE since r8 (decimal-output gate hazard);
        # the decimal->double cast of a 2-dp value is exact
        k: (op, float(v), ts, counts[k])
        for k, (op, v, ts) in state.items()
        if op != "D"
    }
    assert got == want
    assert len(want) < len(counts)  # some keys really tombstoned


def _both2(spark, a_rows, b_rows, sql: str):
    """Two-table differential: register prop_a(k,a) / prop_b(k,b) in both
    engines, run the SAME SQL text, return repr-sorted row lists. Key 0
    is turned into NULL inside the queries (NULLIF) so hypothesis
    reaches the null-semantics paths without nullable-dtype plumbing."""
    pa = pd.DataFrame(a_rows, columns=["k", "a"], dtype="int64")
    pb = pd.DataFrame(b_rows, columns=["k", "b"], dtype="int64")
    spark.createDataFrame(pa).createOrReplaceTempView("prop_a")
    spark.createDataFrame(pb).createOrReplaceTempView("prop_b")
    s = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    con.register("prop_a", pa)
    con.register("prop_b", pb)
    d = con.execute(sql).fetchall()
    return sorted(map(repr, s)), sorted(map(repr, d))


_PAIRS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6), st.integers(min_value=-9, max_value=9)),
    min_size=1,
    max_size=12,
)
_PAIRS_B = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6), st.integers(min_value=-9, max_value=9)),
    min_size=0,
    max_size=12,
)


@settings(**SETTINGS)
@given(_PAIRS, _PAIRS_B)
def test_outer_join_null_key_semantics(spark, a_rows, b_rows):
    """FULL OUTER JOIN over duplicate AND NULL keys must agree row-for-row:
    null keys never match (each side's null rows surface unmatched), and
    duplicate keys produce the full multiset product."""
    if not b_rows:
        b_rows = [(0, 0)]
    sql = """
        SELECT a.k AS ka, b.k AS kb, a.a AS a, b.b AS b
        FROM (SELECT NULLIF(k, 0) AS k, a FROM prop_a) a
        FULL JOIN (SELECT NULLIF(k, 0) AS k, b FROM prop_b) b
          ON a.k = b.k
    """
    s, d = _both2(spark, a_rows, b_rows, sql)
    assert s == d


@settings(**SETTINGS)
@given(_PAIRS, _PAIRS_B)
def test_not_in_vs_not_exists_null_trap(spark, a_rows, b_rows):
    """The classic ANSI null trap, pinned differentially: k NOT IN
    (subquery containing NULL) yields NO rows, while NOT EXISTS treats
    the null as simply unmatched — both engines must agree on BOTH
    spellings for arbitrary generated inputs."""
    if not b_rows:
        b_rows = [(0, 0)]
    sql = """
        SELECT
          (SELECT count(*) FROM prop_a
            WHERE k NOT IN (SELECT NULLIF(k, 0) FROM prop_b)) AS n_not_in,
          (SELECT count(*) FROM prop_a ta
            WHERE NOT EXISTS (SELECT 1 FROM prop_b tb
                              WHERE NULLIF(tb.k, 0) = ta.k)) AS n_not_exists
    """
    s, d = _both2(spark, a_rows, b_rows, sql)
    assert s == d


@settings(**SETTINGS)
@given(_PAIRS, _PAIRS_B)
def test_multiset_setops_match(spark, a_rows, b_rows):
    """INTERSECT ALL / EXCEPT ALL multiset arithmetic (min/than-difference
    of per-value multiplicities, with NULL equal to NULL per ANSI set-op
    rules) must agree on generated multisets."""
    if not b_rows:
        b_rows = [(0, 0)]
    sql = """
        SELECT 'i' AS op, v FROM (
          SELECT NULLIF(a, 0) AS v FROM prop_a
          INTERSECT ALL
          SELECT NULLIF(b, 0) AS v FROM prop_b
        )
        UNION ALL
        SELECT 'e' AS op, v FROM (
          SELECT NULLIF(a, 0) AS v FROM prop_a
          EXCEPT ALL
          SELECT NULLIF(b, 0) AS v FROM prop_b
        )
    """
    s, d = _both2(spark, a_rows, b_rows, sql)
    assert s == d


@settings(**SETTINGS)
@given(_PAIRS)
def test_window_ties_and_null_order_semantics(spark, a_rows):
    """rank/dense_rank under ties and a RANGE cumulative sum must agree —
    with the ORDER BY null placement PINNED (NULLS FIRST): Spark defaults
    ascending NULLS FIRST while DuckDB defaults NULLS LAST, so any window
    oracle in this repo must spell the placement explicitly (this property
    is the regression guard for that rule)."""
    sql = """
        SELECT k, v,
               rank()       OVER (PARTITION BY k ORDER BY v NULLS FIRST) AS rk,
               dense_rank() OVER (PARTITION BY k ORDER BY v NULLS FIRST) AS drk,
               CAST(sum(v) OVER (PARTITION BY k ORDER BY v NULLS FIRST
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM (SELECT k, NULLIF(a, 0) AS v FROM prop_a)
    """
    s, d = _both2(spark, a_rows, [(0, 0)], sql)
    assert s == d


@settings(**SETTINGS)
@given(_PAIRS)
def test_groupby_null_group_semantics(spark, a_rows):
    """A NULL group key forms ONE group (ANSI grouping equality, unlike
    join equality) in both engines; aggregates over it must match."""
    sql = """
        SELECT NULLIF(k, 0) AS g,
               count(*) AS n,
               count(NULLIF(a, 0)) AS n_nonnull,
               CAST(sum(a) AS BIGINT) AS total
        FROM prop_a GROUP BY NULLIF(k, 0)
    """
    s, d = _both2(spark, a_rows, [(0, 0)], sql)
    assert s == d


@settings(**SETTINGS)
@given(
    st.lists(
        st.integers(min_value=0, max_value=25000),  # 1970..2038 epoch days
        min_size=1,
        max_size=12,
    )
)
def test_date_arithmetic_semantics(spark, days):
    """Calendar arithmetic must agree on generated dates, including the
    end-of-month clamp (+1 MONTH from Jan 31 lands on Feb 28/29 in both
    engines), truncation anchors, and last_day."""
    sql_body = (
        "CAST(d + INTERVAL 1 DAY AS DATE) AS d1, "
        "CAST(d + INTERVAL 1 MONTH AS DATE) AS m1, "
        "CAST(date_trunc('month', d) AS DATE) AS t_mon, "
        "CAST(date_trunc('week', d) AS DATE) AS t_wk, "
        "last_day(d) AS eom, "
        "CAST(year(d) AS INT) AS y, CAST(month(d) AS INT) AS mo, "
        "CAST(day(d) AS INT) AS dd"
    )
    # materialize epoch-day ints, derive the DATE inside each engine with
    # the same expression (DATE + INT days is shared syntax; INTERVAL
    # with a column operand is not) so no pandas date dtype is involved
    dexpr = "(DATE '1970-01-01' + CAST(v AS INT))"
    s, d = _both(
        spark,
        days,
        sql_body.replace("d ", dexpr + " ").replace("d)", dexpr + ")"),
        "int64",
    )
    assert s == d


@given(
    st.integers(min_value=1, max_value=2),      # channels
    st.sampled_from([1, 2, 4]),                  # sample width
    st.lists(st.integers(min_value=-30000, max_value=30000),
             min_size=1, max_size=200),
)
@settings(max_examples=30, deadline=None)
def test_wav_decode_roundtrip(n_ch, width, samples):
    """Property (r10): any PCM signal round-trips through a real WAV
    container and wav_pcm_samples_real — 8-bit clamps to unsigned,
    wider widths are signed, multi-channel downmixes by channel sum."""
    import wave
    from io import BytesIO

    import numpy as np

    from quackflight_spark.pipeline.multimodal import wav_pcm_samples_real

    if width == 1:
        arr = (np.abs(np.array(samples, dtype=np.int64)) % 256).astype(
            np.uint8
        )
        frames = np.repeat(arr, n_ch)
        expect = arr.astype(np.int64) * n_ch
        raw = frames.tobytes()
    else:
        dt = "<i2" if width == 2 else "<i4"
        arr = np.array(samples, dtype=dt)
        frames = np.repeat(arr, n_ch)
        expect = arr.astype(np.int64) * n_ch
        raw = frames.tobytes()
    buf = BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(width)
        w.setframerate(8000)
        w.writeframes(raw)
    got = wav_pcm_samples_real(buf.getvalue())
    assert np.array_equal(got, expect)
