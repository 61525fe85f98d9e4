"""Scaling evidence for join_fuzzy_names' r5 blocking hardening: token-
only blocking (the r4 shape the verdict flagged) vs (token, length-band)
blocking on synthetic name populations of growing size sharing a small
noun vocabulary — the exact regime where token-only blocks grow linearly
with the population and the within-block Levenshtein work grows
quadratically.

Measures, per population size N:
  - max block size and Σ(block²) (the candidate-pair bound) per strategy
  - wall-clock of the full fuzzy join per strategy (min of 3 warm runs)

Names are md5-varied descriptor strings over a 20-noun vocabulary with
lengths spread across ~10 bands, so banding divides each noun block ~10×
and the pair bound ~100×. Reproduction script for the PERF.md paragraph.

Usage: python tools/scale_curve_fuzzy.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from quackflight_spark.operators.tpch_extra import (  # noqa: E402
    FUZZY_LEN_BAND,
    FUZZY_MAX_DIST,
    fuzzy_name_pairs,
)
from quackflight_spark.session import get_spark  # noqa: E402

SIZES = [2_000, 20_000, 100_000]
NOUNS = 20


def synth_names(spark, n: int):
    """n distinct names over NOUNS nouns: 'desc<md5-chunk> noun<k>' with
    md5-derived descriptor lengths spreading ~10 length bands."""
    return (
        spark.range(n)
        .select(
            F.concat(
                F.substring(
                    F.repeat(F.md5(F.col("id").cast("string")), 3),
                    1,
                    # 8..47 chars of descriptor -> ~10 bands of width 4
                    (F.abs(F.hash(F.col("id"))) % 40 + 8).cast("int"),
                ),
                F.lit(" noun"),
                (F.col("id") % NOUNS).cast("string"),
            ).alias("p_name")
        )
        .localCheckpoint()
    )


def block_stats(names, banded: bool):
    tok = F.element_at(F.split(F.col("p_name"), " "), -1)
    keys = [tok.alias("tok")]
    if banded:
        keys.append((F.length("p_name") / FUZZY_LEN_BAND).cast("int").alias("band"))
    sizes = names.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    row = sizes.agg(
        F.max("n").alias("max_block"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
    ).collect()[0]
    return int(row["max_block"]), int(row["sum_sq"])


def token_only_pairs(names):
    """The r4 shape: block on final token alone (kept here only as the
    ablation baseline for this curve)."""
    last = lambda c: F.element_at(F.split(F.col(c), " "), -1)  # noqa: E731
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(b, (F.col("name_a") < F.col("name_b")) & (last("name_a") == last("name_b")))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", "dist")
    )


def timed(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="fuzzy-scale")
    out = []
    for n in SIZES:
        names = synth_names(spark, n)
        mb_tok, sq_tok = block_stats(names, banded=False)
        mb_band, sq_band = block_stats(names, banded=True)
        # correctness cross-check at the smallest size (token-only is the
        # unbanded ground truth for the same distance predicate)
        if n == SIZES[0]:
            a = {tuple(r) for r in fuzzy_name_pairs(names, block_cap=10**9, band_threshold=0, has_oversized=True).collect()}
            b = {tuple(r) for r in token_only_pairs(names).collect()}
            assert a == b, f"banded != token-only at n={n}"
        t_band = timed(lambda: fuzzy_name_pairs(names, block_cap=10**9, band_threshold=0, has_oversized=True).count())
        t_tok = timed(lambda: token_only_pairs(names).count())
        rec = {
            "n_names": n,
            "token_only": {"max_block": mb_tok, "pair_bound": sq_tok, "sec": t_tok},
            "banded": {"max_block": mb_band, "pair_bound": sq_band, "sec": t_band},
            "pair_bound_ratio": round(sq_tok / max(sq_band, 1), 1),
        }
        out.append(rec)
        print(json.dumps(rec))
    print(json.dumps({"curve": out}))


if __name__ == "__main__":
    main()
