"""Interleaved old-vs-new A/B for the r13 `_fb_labels` rework
(graph_scc): NEW = fused one-join/one-shuffle neighbor-min pull +
observe-fused convergence count riding the parquet write (1 job/round,
3-col payload); OLD = the r12 shape (two pull joins + two pull
shuffles, 5-col materialize, separate read-back count job — replicated
inline below and monkeypatched over graph._fb_labels for the old leg).
Alternating min-of-N with /proc/stat steal%% per run cancels the host's
slow-window bias (the r12 protocol).

Usage: N_AB=4 python tools/ab_scc_r13.py [key ...]   (default graph_scc)
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
N = int(os.environ.get("N_AB", "4"))


def _fb_labels_old(edges, nodes, caller, n_nodes=None):
    """The r12 shape, verbatim (two pull joins, 5-col parquet +
    separate count job, unconditional entry count)."""
    from quackflight_spark.operators import graph as g

    labels = nodes.select(
        "node", F.col("node").alias("f"), F.col("node").alias("b")
    ).localCheckpoint(eager=False)
    n_nodes = labels.count()
    bcast = n_nodes <= g.SCC_BROADCAST_NODE_LIMIT

    def maybe_bcast(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bcast else df

    changed = -1
    g.ROUND_TRACE["scc_fb_inner"] = g.ROUND_TRACE.get("scc_fb_inner", 0)
    for _ in range(g.SCC_MAX_INNER):
        g.ROUND_TRACE["scc_fb_inner"] += 1
        nmf = (
            edges.join(
                maybe_bcast(labels.select("node", "f")),
                edges.dst == F.col("node"),
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("f").alias("nf"))
        )
        nmb = (
            edges.join(
                maybe_bcast(labels.select("node", "b")),
                edges.src == F.col("node"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("b").alias("nb"))
        )
        stepped = (
            labels.join(maybe_bcast(nmf), "node", "left")
            .join(maybe_bcast(nmb), "node", "left")
            .select(
                "node",
                F.least("f", F.coalesce("nf", "f")).alias("f"),
                F.least("b", F.coalesce("nb", "b")).alias("b"),
                F.col("f").alias("of"),
                F.col("b").alias("ob"),
            )
        )
        fmap = labels.select(F.col("node").alias("fk"), F.col("f").alias("fv"))
        bmap = labels.select(F.col("node").alias("bk"), F.col("b").alias("bv"))
        new_labels = (
            stepped.join(maybe_bcast(fmap), stepped.f == fmap.fk, "left")
            .join(maybe_bcast(bmap), stepped.b == bmap.bk, "left")
            .select(
                "node",
                F.least("f", F.coalesce("fv", "f")).alias("f"),
                F.least("b", F.coalesce("bv", "b")).alias("b"),
                "of",
                "ob",
            )
        )
        new_labels = g._scc_materialize(new_labels, "lab")
        changed = new_labels.filter("f != of OR b != ob").count()
        labels = new_labels.select("node", "f", "b")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(f"{caller}: no convergence (old leg)")
    return labels


def steal():
    f = open("/proc/stat").readline().split()
    vals = list(map(int, f[1:]))
    return vals[7], sum(vals)


def main() -> None:
    import __spark_entry__ as e

    from quackflight_spark.operators import graph as g
    from quackflight_spark.pipeline.frame_cache import clear_frames
    from quackflight_spark.session import get_spark

    keys = sys.argv[1:] or ["graph_scc"]
    spark = get_spark(app_name="ab_scc_r13")
    qs = e.queries()
    new_fb = g._fb_labels

    def run(key):
        t0 = time.perf_counter()
        qs[key](spark, SF).count()
        dt = time.perf_counter() - t0
        clear_frames()
        spark.catalog.clearCache()
        gc.collect()
        return dt

    res = {}
    for key in keys:
        g._fb_labels = _fb_labels_old
        run(key)  # warm-up old
        g._fb_labels = new_fb
        run(key)  # warm-up new
        old_t, new_t, old_s, new_s = [], [], [], []
        for _ in range(N):
            g._fb_labels = _fb_labels_old
            s0, t0 = steal()
            old_t.append(run(key))
            s1, t1 = steal()
            old_s.append(round(100 * (s1 - s0) / max(1, t1 - t0), 2))
            g._fb_labels = new_fb
            s0, t0 = steal()
            new_t.append(run(key))
            s1, t1 = steal()
            new_s.append(round(100 * (s1 - s0) / max(1, t1 - t0), 2))
        res[key] = {
            "old_min": round(min(old_t), 3),
            "new_min": round(min(new_t), 3),
            "old": [round(x, 3) for x in old_t],
            "new": [round(x, 3) for x in new_t],
            "old_steal": old_s,
            "new_steal": new_s,
        }
        print(key, json.dumps(res[key]), flush=True)


if __name__ == "__main__":
    main()
