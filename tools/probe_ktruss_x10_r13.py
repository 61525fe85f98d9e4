"""Per-phase profile of graph_ktruss at the x10 iso-workload scale
(r13: the x10 leg read 244.9 s vs 15.8 s at x1 — super-linear, and the
sf0.1 profiling said per-round cost is 80% planning, so SOMETHING else
grows at x10). Replicates the shipped pipeline (anti-join + explode
round body) with per-round wall-clock + JVM storage telemetry
(getRDDStorageInfo: cached blocks from the accumulated localCheckpoints)
so the super-linear term gets a name: execution, eviction/recompute, or
broadcast build.

  QF_PROBE_DIR=/tmp/qf_sf1x10 QF_GC=1 python tools/probe_ktruss_x10_r13.py
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("QF_PROBE_DIR", "/tmp/qf_sf1x10")
DO_GC = os.environ.get("QF_GC") == "1"


def storage_mb(spark) -> tuple[float, float, int]:
    infos = spark._jsc.sc().getRDDStorageInfo()
    mem = sum(i.memSize() for i in infos) / 1e6
    disk = sum(i.diskSize() for i in infos) / 1e6
    return round(mem, 1), round(disk, 1), len(infos)


def main() -> None:
    from quackflight_spark.operators import graph as g
    from quackflight_spark.session import get_spark
    from quackflight_spark.sources.fixtures import load_table

    spark = get_spark(app_name="probe_ktruss_x10")
    t00 = time.perf_counter()

    op = (
        load_table(spark, SF_DIR, "lineitem")
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
    print(f"[{time.perf_counter()-t00:7.2f}s] edges counted: {n_edges}",
          flush=True)
    use_broadcast = n_edges <= g.KTRUSS_BROADCAST_EDGE_LIMIT
    print(f"broadcast gate: {use_broadcast}", flush=True)

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
        roles = t.select(
            F.explode(
                F.array(
                    F.struct(F.col("x").alias("src"), F.col("y").alias("dst")),
                    F.struct(F.col("x").alias("src"), F.col("z").alias("dst")),
                    F.struct(F.col("y").alias("src"), F.col("z").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
        return roles.groupBy("src", "dst").agg(
            F.count(F.lit(1)).cast("bigint").alias("support")
        )

    sup = role_sup(tri).localCheckpoint(eager=False)
    surv = F.col("support") >= g.KTRUSS_K - 2
    n_prev = -1
    rnd = 0
    for _ in range(g.KTRUSS_MAX_ROUNDS):
        rnd += 1
        t0 = time.perf_counter()
        n_keep = sup.filter(surv).count()
        dt = time.perf_counter() - t0
        mem, disk, nblk = storage_mb(spark)
        print(f"[round {rnd:2d}] count job {dt:6.2f}s keep={n_keep} "
              f"storage={mem:.0f}MB mem / {disk:.0f}MB disk / {nblk} rdds",
              flush=True)
        if n_keep == n_prev:
            break
        n_prev = n_keep
        dropped = sup.filter(~surv).select("src", "dst")
        t0 = time.perf_counter()
        for ca, cb in (("x", "y"), ("x", "z"), ("y", "z")):
            d = maybe_bcast(
                dropped.select(
                    F.col("src").alias("ds"), F.col("dst").alias("dd")
                )
            )
            tri = tri.join(
                d,
                (F.col(ca) == F.col("ds")) & (F.col(cb) == F.col("dd")),
                "left_anti",
            )
        t1 = time.perf_counter()
        tri = tri.localCheckpoint(eager=False)
        t2 = time.perf_counter()
        sup = role_sup(tri).localCheckpoint(eager=False)
        t3 = time.perf_counter()
        if DO_GC:
            gc.collect()
        t4 = time.perf_counter()
        print(f"[round {rnd:2d}] build: joins {t1-t0:5.2f}s "
              f"tri-ckpt {t2-t1:6.2f}s sup-ckpt {t3-t2:6.2f}s "
              f"gc {t4-t3:5.2f}s", flush=True)
    print(f"TOTAL {time.perf_counter()-t00:.2f}s rounds={rnd} gc={DO_GC}",
          flush=True)


if __name__ == "__main__":
    main()
