"""r12 A/B for the pipeline_corpus_prep in-bench anomaly (VERDICT r11
what's-wrong #1): the driver's BENCH_r11 row was 4.16 s with ALL THREE
in-session runs 4.2-5.4 s, vs 0.69 s isolated (judge re-time) — heap
jumped 5.5 -> 9.9 GB during the key and collapsed to 3.5 GB one key
later, implicating work DEFERRED from earlier keys (async ContextCleaner
shuffle/broadcast removal, unpersist of the ANN family's embedding
frames) rather than the plan (unchanged since r2, 2 exchanges).

Protocol: replay a PREFIX of BENCH_KEYS with bench.py's exact hygiene
(warm-up + 3 timed runs + clear_frames + clearCache + gc.collect), then
time the TARGET the same way. Modes:
  python tools/bench_ab_r12.py                 # default: 12-key prefix
  QF_AB_PREFIX=ann_bruteforce_topk,...         # explicit prefix
  QF_AB_N=24                                   # prefix = N keys before target
  QF_AB_JVMGC=1                                # force System.gc() after hygiene
  QF_AB_SETTLE=5                               # sleep N s after hygiene
If the target reproduces slow with the prefix and returns to ~isolated
with JVMGC/SETTLE, the mechanism is deferred JVM-side cleanup landing in
the target's timed window; if it stays slow, the prefix changed
something durable (bisect with QF_AB_N).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET = os.environ.get("QF_AB_TARGET", "pipeline_corpus_prep")


def main() -> None:
    import bench
    import __spark_entry__ as e

    from quackflight_spark.pipeline.frame_cache import clear_frames
    from quackflight_spark.session import get_spark

    if os.environ.get("QF_AB_PREFIX"):
        prefix = os.environ["QF_AB_PREFIX"].split(",")
    else:
        n = int(os.environ.get("QF_AB_N", "12"))
        i = bench.BENCH_KEYS.index(TARGET)
        prefix = bench.BENCH_KEYS[max(0, i - n) : i]
    spark = get_spark(app_name="bench-ab-r12")
    queries = e.queries()

    def hygiene() -> None:
        clear_frames()
        spark.catalog.clearCache()
        gc.collect()
        if os.environ.get("QF_AB_JVMGC") == "1":
            spark._jvm.System.gc()
        settle = float(os.environ.get("QF_AB_SETTLE", "0"))
        if settle:
            time.sleep(settle)

    def run(key: str) -> dict:
        fn = queries[key]
        fn(spark, SF_DIR).count()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            samples.append(round(time.perf_counter() - t0, 4))
        hygiene()
        return {"min": min(samples), "runs": samples}

    out = {}
    for key in prefix:
        out[key] = run(key)
        print(f"prefix {key}: {out[key]['min']}s", flush=True)
    out[TARGET] = run(TARGET)
    print(f"TARGET {TARGET}: {out[TARGET]['runs']}", flush=True)
    print(json.dumps({"prefix_n": len(prefix), "target": out[TARGET]}))


if __name__ == "__main__":
    main()
