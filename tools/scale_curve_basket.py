"""Scaling evidence for basket_pair_lift (r4 verdict task): show that
pair-expansion cost tracks Σ(basket²), not row count, and that the
docstring's mega-basket skew note is a real, measured hazard.

Three experiments over synthetic deduped (o, p) basket frames
(localCheckpointed so generation is excluded from timing), all running
the EXACT operator pipeline (basket_pair_lift_core):

  A. order-count scaling at fixed basket=7: work = N·b² → linear in N.
  B. basket-size scaling at ~constant item count (N·b ≈ 5.6M rows):
     work = N·b² = items·b → linear in BASKET SIZE while the input
     row count stays fixed — the Σ(basket²) law isolated.
  C. mega-basket hazard: the experiment-A midpoint plus ONE 5,000-item
     basket (+12.5M pairs on a single join key) — the skew a real
     deployment salts before this operator.

Prints one JSON line per measurement. min of 2 warm runs.

Usage: python tools/scale_curve_basket.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from quackflight_spark.operators.tpch_extra import basket_pair_lift_core  # noqa: E402
from quackflight_spark.session import get_spark  # noqa: E402

P_VOCAB = 9973  # prime so parts within an order never collide


def synth_baskets(spark, n_orders: int, basket: int, mega: int = 0):
    df = (
        spark.range(n_orders)
        .select(
            F.col("id").alias("o"),
            F.explode(F.sequence(F.lit(0), F.lit(basket - 1))).alias("i"),
        )
        .select(
            "o",
            ((F.col("o") * 31 + F.col("i") * 17) % P_VOCAB).alias("p"),
        )
    )
    if mega:
        df = df.union(
            spark.range(mega).select(
                F.lit(-1).cast("bigint").alias("o"),
                (F.col("id") + P_VOCAB).alias("p"),  # disjoint part ids
            )
        )
    return df.localCheckpoint()


def timed(op, reps: int = 2) -> float:
    # cap_checked=True: this curve MEASURES the mega-basket hazard the
    # r6 plan-time cap now refuses (check_basket_cap raises on the
    # synthetic 50k basket), and the timed section must not include the
    # stat job either
    best = float("inf")
    basket_pair_lift_core(op, cap_checked=True).count()  # warm-up
    for _ in range(reps):
        t0 = time.perf_counter()
        basket_pair_lift_core(op, cap_checked=True).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    spark = get_spark(app_name="basket-scale")
    # A: linear in order count at fixed basket size
    for n in [125_000, 500_000, 2_000_000]:
        op = synth_baskets(spark, n, 7)
        print(json.dumps({"exp": "A-orders", "n_orders": n, "basket": 7,
                          "rows": n * 7, "pair_work": n * 21, "sec": timed(op)}))
        op.unpersist()
    # B: linear in basket size at constant row count
    for n, b in [(800_000, 7), (200_000, 28), (50_000, 112)]:
        op = synth_baskets(spark, n, b)
        print(json.dumps({"exp": "B-basket", "n_orders": n, "basket": b,
                          "rows": n * b, "pair_work": n * b * (b - 1) // 2,
                          "sec": timed(op)}))
        op.unpersist()
    # C: mega-basket skew hazard
    for mega in [0, 5_000]:
        op = synth_baskets(spark, 500_000, 7, mega=mega)
        print(json.dumps({"exp": "C-mega", "n_orders": 500_000, "basket": 7,
                          "mega_items": mega,
                          "extra_pairs": mega * (mega - 1) // 2,
                          "sec": timed(op)}))
        op.unpersist()


if __name__ == "__main__":
    main()
