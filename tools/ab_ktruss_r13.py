"""Interleaved old-vs-new A/B for the r13 ktruss round-body rework:
NEW (shipped) = explode-based role recount + three LEFT ANTI joins
against one identically-projected dropped set (one broadcast build +
reuses); OLD (replicated verbatim below) = 3-way union role recount +
marker left-joins with a null filter. The whole graph_ktruss pipeline
is replicated for the OLD leg (the loop is inline in the registered
function); the NEW leg calls the registered function. Alternating
min-of-N with /proc/stat steal%% per run.

Usage: N_AB=3 python tools/ab_ktruss_r13.py
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("N_AB", "3"))


def ktruss_old(spark, sf_dir):
    """graph_ktruss with the r12 round body, verbatim."""
    from quackflight_spark.operators import graph as g
    from quackflight_spark.sources.fixtures import load_table

    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    edges = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .localCheckpoint(eager=False)
    )
    n_edges = edges.count()
    use_broadcast = n_edges <= g.KTRUSS_BROADCAST_EDGE_LIMIT

    def maybe_bcast(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if use_broadcast else df

    adj = edges.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    ax = maybe_bcast(adj.select(F.col("src").alias("x"), F.col("nbrs").alias("ax")))
    ay = maybe_bcast(adj.select(F.col("src").alias("y"), F.col("nbrs").alias("ay")))
    tri = (
        edges.select(F.col("src").alias("x"), F.col("dst").alias("y"))
        .join(ax, "x")
        .join(ay, "y")
        .select("x", "y", F.explode(F.array_intersect("ax", "ay")).alias("z"))
        .localCheckpoint(eager=False)
    )

    def role_sup(t: DataFrame) -> DataFrame:
        roles = (
            t.select(F.col("x").alias("src"), F.col("y").alias("dst"))
            .unionByName(t.select(F.col("x").alias("src"), F.col("z").alias("dst")))
            .unionByName(t.select(F.col("y").alias("src"), F.col("z").alias("dst")))
        )
        return roles.groupBy("src", "dst").agg(
            F.count(F.lit(1)).cast("bigint").alias("support")
        )

    sup = role_sup(tri).localCheckpoint(eager=False)
    surv = F.col("support") >= g.KTRUSS_K - 2
    n_prev = -1
    for _ in range(g.KTRUSS_MAX_ROUNDS):
        n_keep = sup.filter(surv).count()
        if n_keep == n_prev:
            break
        n_prev = n_keep
        dropped = sup.filter(~surv).select("src", "dst")
        d1 = dropped.select(
            F.col("src").alias("x"), F.col("dst").alias("y"), F.lit(1).alias("m1")
        )
        d2 = dropped.select(
            F.col("src").alias("x"), F.col("dst").alias("z"), F.lit(1).alias("m2")
        )
        d3 = dropped.select(
            F.col("src").alias("y"), F.col("dst").alias("z"), F.lit(1).alias("m3")
        )
        tri = (
            tri.join(maybe_bcast(d1), ["x", "y"], "left")
            .join(maybe_bcast(d2), ["x", "z"], "left")
            .join(maybe_bcast(d3), ["y", "z"], "left")
            .filter(
                F.col("m1").isNull()
                & F.col("m2").isNull()
                & F.col("m3").isNull()
            )
            .select("x", "y", "z")
            .localCheckpoint(eager=False)
        )
        sup = role_sup(tri).localCheckpoint(eager=False)
    else:
        raise RuntimeError("old ktruss: no convergence")
    return sup.filter(surv).select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("v"),
        "support",
    )


def steal():
    f = open("/proc/stat").readline().split()
    vals = list(map(int, f[1:]))
    return vals[7], sum(vals)


def main() -> None:
    import __spark_entry__ as e

    from quackflight_spark.pipeline.frame_cache import clear_frames
    from quackflight_spark.session import get_spark

    spark = get_spark(app_name="ab_ktruss_r13")
    qs = e.queries()

    def run(fn):
        t0 = time.perf_counter()
        fn(spark, SF).count()
        dt = time.perf_counter() - t0
        clear_frames()
        spark.catalog.clearCache()
        gc.collect()
        return dt

    new_fn = qs["graph_ktruss"]
    # output equality spot check first (cheap insurance for the harness)
    got_new = {(r.u, r.v): r.support for r in new_fn(spark, SF).collect()}
    clear_frames(); spark.catalog.clearCache()
    got_old = {(r.u, r.v): r.support for r in ktruss_old(spark, SF).collect()}
    clear_frames(); spark.catalog.clearCache()
    assert got_new == got_old and got_new, "old/new outputs differ!"
    print(f"# outputs identical ({len(got_new)} edges)", flush=True)

    old_t, new_t, old_s, new_s = [], [], [], []
    for _ in range(N):
        s0, t0 = steal()
        old_t.append(run(ktruss_old))
        s1, t1 = steal()
        old_s.append(round(100 * (s1 - s0) / max(1, t1 - t0), 2))
        s0, t0 = steal()
        new_t.append(run(new_fn))
        s1, t1 = steal()
        new_s.append(round(100 * (s1 - s0) / max(1, t1 - t0), 2))
    print(json.dumps({
        "old_min": round(min(old_t), 3), "new_min": round(min(new_t), 3),
        "old": [round(x, 3) for x in old_t],
        "new": [round(x, 3) for x in new_t],
        "old_steal": old_s, "new_steal": new_s,
    }), flush=True)


if __name__ == "__main__":
    main()
