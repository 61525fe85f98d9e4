"""Scaling evidence for the distributed exact ntile (the r3-verdict
events_rfm fix): bare `W.orderBy` NTILE (Exchange SinglePartition + one
reducer sorting EVERYTHING) vs `_ntile_distributed` (range exchange +
parallel per-partition rank + broadcast offsets) on synthetic user
frames of growing size. min of 3 warm runs each, results cross-checked
equal. Reproduction script for the PERF.md paragraph.

Usage: python tools/scale_curve_ntile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from quackflight_spark.session import get_spark  # noqa: E402
from quackflight_spark.streaming.windowed import _ntile_distributed  # noqa: E402

SIZES = [100_000, 1_000_000, 10_000_000]
BUCKETS = 4


def main() -> None:
    spark = get_spark(app_name="ntile-scale")
    out = []
    for n in SIZES:
        df = (
            spark.range(n)
            .select(
                F.col("id").alias("k"),
                # md5-derived value: unsorted, collision-free with the k tie-break
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 12), 16, 10)
                .cast("bigint")
                .alias("v"),
            )
            .localCheckpoint()
        )

        def run_global():
            df.select(
                "k", F.ntile(BUCKETS).over(W.orderBy("v", "k")).alias("b")
            ).agg(F.sum(F.col("b") * F.col("k"))).collect()

        def run_dist():
            _ntile_distributed(df, ["v", "k"], "b", BUCKETS).agg(
                F.sum(F.col("b") * F.col("k"))
            ).collect()

        # equality witness (checksum of bucket·key is order-insensitive)
        g = df.select("k", F.ntile(BUCKETS).over(W.orderBy("v", "k")).alias("b")) \
              .agg(F.sum(F.col("b") * F.col("k"))).collect()[0][0]
        d = _ntile_distributed(df, ["v", "k"], "b", BUCKETS) \
            .agg(F.sum(F.col("b") * F.col("k"))).collect()[0][0]
        assert g == d, (n, g, d)

        ts = {}
        for name, fn in [("global_window", run_global), ("distributed", run_dist)]:
            fn()  # warm
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                samples.append(time.perf_counter() - t0)
            ts[name] = round(min(samples), 3)
        out.append({"rows": n, **ts})
        print(out[-1], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
