"""Scaling evidence for graph_triangles' degree-ordered orientation: on
a hub-and-fringe graph (one high-degree node + a sparse fringe), the
2-path build — the expensive middle stage of triangle counting — is
quadratic in hub degree under naive id-ordered orientation when the hub
sorts low, and ~zero under degree ordering (all hub edges point INTO
the hub, so it contributes no forward 2-paths).

Synthetic graph: the hub sits at the MIDDLE id (n/2) connected to every
fringe node — the id-ordering worst case: half its edges orient inbound
(from lower ids) and half outbound, so the hub as MIDDLE node carries
in·out ≈ n²/4 candidate 2-paths. (A hub at id 0 is a pure source under
id ordering — zero paths THROUGH it — which is why the worst case needs
the middle placement.) A sparse ring + skip edges among the fringe
supply real triangles. Measures, per size: forward 2-path count under
each orientation (the join's candidate volume — the quantity the
arboricity bound controls) and the wall-clock of the full per-node
triangle count.

Usage: python tools/scale_curve_triangles.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from quackflight_spark.session import get_spark  # noqa: E402

SIZES = [10_000, 40_000, 160_000]


def synth_hub_graph(spark, n: int) -> DataFrame:
    """Undirected (u < v) edges: hub at id n/2 — every fringe node
    (fringe ids skip the hub id), fringe ring i—(i+1), and skip edges
    i—(i+2) — every consecutive fringe triple closes a triangle, and
    each ring/skip edge also forms a triangle with the hub."""
    hub_id = n // 2
    fringe = spark.range(n + 1).filter(F.col("id") != hub_id)
    hub = fringe.select(
        F.least(F.lit(hub_id).cast("bigint"), F.col("id")).alias("u"),
        F.greatest(F.lit(hub_id).cast("bigint"), F.col("id")).alias("v"),
    )
    ring = spark.range(n).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    ).filter((F.col("u") != hub_id) & (F.col("v") != hub_id))
    skip = spark.range(n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 2).alias("v")
    ).filter((F.col("u") != hub_id) & (F.col("v") != hub_id))
    return hub.unionByName(ring).unionByName(skip).distinct().localCheckpoint()


def orient(und: DataFrame, by_degree: bool) -> DataFrame:
    if not by_degree:
        return und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return und.join(du, "u").join(dv, "v").select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint()


def two_path_count(oriented: DataFrame) -> int:
    """Σ outdeg·(outdeg-1)... actually the join candidate volume is
    Σ_y indeg_fwd... the 2-path build joins e1.dst = e2.src, so the
    candidate count is Σ_m (in(m) · out(m)) over middle nodes m."""
    d = oriented.groupBy("src").agg(F.count(F.lit(1)).alias("out"))
    i = oriented.groupBy("dst").agg(F.count(F.lit(1)).alias("inn"))
    row = (
        d.join(i, d.src == i.dst)
        .agg(F.sum(F.col("out") * F.col("inn")).alias("p"))
        .collect()[0]
    )
    return int(row["p"] or 0)


def count_triangles(oriented: DataFrame) -> int:
    e1 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    e2 = oriented.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    e3 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    return e1.join(e2, "y").join(e3, ["x", "z"], "left_semi").count()


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    fn()
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


TIME_BOUND = 1_000_000_000  # skip wall-clock above this 2-path volume


def main() -> None:
    spark = get_spark(app_name="tri-scale")
    for n in SIZES:
        und = synth_hub_graph(spark, n)
        by_id = orient(und, by_degree=False)
        by_deg = orient(und, by_degree=True)
        p_id, p_deg = two_path_count(by_id), two_path_count(by_deg)
        t_deg = count_triangles(by_deg)
        if p_id <= TIME_BOUND:
            assert count_triangles(by_id) == t_deg  # orientation-invariant
        rec = {
            "n_fringe": n,
            "triangles": t_deg,
            "id_order": {"two_paths": p_id,
                         "sec": timed(lambda: count_triangles(by_id))
                         if p_id <= TIME_BOUND else f"skipped>{TIME_BOUND}"},
            "degree_order": {"two_paths": p_deg,
                             "sec": timed(lambda: count_triangles(by_deg))},
            "two_path_ratio": round(p_id / max(p_deg, 1), 1),
        }
        print(json.dumps(rec))
        und.unpersist(); by_id.unpersist(); by_deg.unpersist()


if __name__ == "__main__":
    main()
