"""r10 A/B for the r9 in-session bench movers (VERDICT What's-wrong #1).

Seven keys slowed 1.4-6.8x between the r8 and r9 driver bench sessions
with UNCHANGED code (git-diff-verified by the r9 judge); the r9 judge's
isolated re-timings were 3-5x faster than the same keys' in-session
numbers, implicating session composition (cross-key JVM accumulation
over a 208-key run) rather than the operators.

Phase ISOLATED (this script): a fresh session runs ONLY the suspect
keys, bench.py protocol exactly (one untimed warm-up, min of 3 timed
runs, full inter-key hygiene). Compare against the same keys' values in
bench_samples.json from a full 208-key session at the same HEAD: if
isolated ~= r8 values and in-session >> isolated, composition is
confirmed; the bench.py per-key `jvm` trace (code-cache pools,
metaspace, loaded classes — added r10) then names WHICH accumulation.

Usage: python tools/bench_ab_r10.py [key ...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUSPECTS = [
    "agg_skew_kurtosis",
    "agg_weighted_median",
    "events_time_to_convert",
    "graph_jaccard",
    "agg_cms_frequency",
    "tpch_q7",
    "tpch_q9",
]


def main() -> None:
    keys = sys.argv[1:] or SUSPECTS
    import __spark_entry__ as e

    from quackflight_spark.pipeline.frame_cache import clear_frames
    from quackflight_spark.session import get_spark

    spark = get_spark(app_name="bench-ab-isolated")
    queries = e.queries()
    out = {}
    for key in keys:
        fn = queries[key]
        fn(spark, SF_DIR).count()  # warm-up, untimed
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            samples.append(round(time.perf_counter() - t0, 4))
        out[key] = {"min": min(samples), "runs": samples}
        print(f"# isolated {key}: {min(samples)}s {samples}", file=sys.stderr)
        clear_frames()
        spark.catalog.clearCache()
        gc.collect()
    print(json.dumps({"phase": "isolated", "sf_dir": SF_DIR, "keys": out}))


if __name__ == "__main__":
    main()
