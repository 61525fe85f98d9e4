"""Scale curve for cluster_dbscan — candidate volume and CC depth.

Replicates the operator's synthesized corpus at growing point counts by
pointing it at the three fixture SFs, and reports: neighbor-pair
candidates (the grid join's output), core count, component count, and
wall time. The claim under test: with the density-constant region the
per-blob structure is scale-invariant, so candidates grow LINEARLY in n
and the CC depth stays flat — against the measured counter-example
(fixed region at sf0.1: bare noise percolated into a 14,947-core
component of diameter 59 and the CC ran for minutes).

Usage: python tools/scale_curve_dbscan.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from quackflight_spark.session import get_spark

    spark = get_spark(app_name="scale_curve_dbscan")
    q = e.queries()["cluster_dbscan"]
    print(f"{'sf_dir':>24} {'rows':>8} {'clusters':>9} {'warm_s':>7}")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        q(spark, sf_dir).count()  # warm (staging, shuffles, JIT)
        # re-INVOKE the operator: its localCheckpoints are per-invocation,
        # so collecting the same handle would time a no-op re-read
        t0 = time.time()
        rows = q(spark, sf_dir).collect()
        warm = time.time() - t0
        n_clusters = len({r.cluster_id for r in rows})
        print(f"{sf_dir:>24} {len(rows):>8} {n_clusters:>9} {warm:>7.2f}")


if __name__ == "__main__":
    main()
