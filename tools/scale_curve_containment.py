"""Containment-dedup scaling curve: dedup_containment's inverted-index
plan at 1x/4x/16x the sf0.1 documents corpus (5k/20k/80k docs), Spark
local[32], min of 3 warm runs — reusing scale_curve_dedup's replicated
corpora (disjoint per-replica vocabularies, so true pair structure
scales LINEARLY with the corpus, the regime a real crawl lives in).

The claim under test: candidate-pair volume is bounded by the shingle
postings lists (Σ df(s)²), not all-pairs — so runtime grows ~linearly
in the corpus when the duplicate structure does, and the directed
containment split adds only projection cost over the Jaccard plan.

Usage: python tools/scale_curve_containment.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_curve_dedup import ensure_scaled  # noqa: E402


def main() -> None:
    from quackflight_spark.pipeline.dedup import dedup_containment
    from quackflight_spark.session import get_spark

    spark = get_spark(app_name="scale_containment", master="local[32]")
    print("mult\tdocs\tpairs\tspark_s")
    for mult in (1, 4, 16):
        sf_dir = ensure_scaled(spark, mult)
        from quackflight_spark.pipeline.frame_cache import clear_frames

        clear_frames()
        spark.catalog.clearCache()
        n_pairs = dedup_containment(spark, sf_dir).count()  # warm
        times = []
        for _ in range(3):
            clear_frames()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            dedup_containment(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        print(f"x{mult}\t{docs}\t{n_pairs}\t{min(times):.2f}")


if __name__ == "__main__":
    main()
