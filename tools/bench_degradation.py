"""Diagnose the r4 in-session bench degradation: several keys' 3 warm
runs grew monotonically WITHIN one session (stream_session [1.00, 1.98,
3.87], dedup_minhash_lsh [3.46, 6.54, 8.15], timeseries_gapfill [0.38,
1.14, 1.95]) — consistent with engine-side accumulation rather than
host CPU steal.

Hypothesis: every invocation builds a fresh DataFrame DAG whose
intermediate persist()/localCheckpoint() blocks and memory-sink tables
stay referenced until the PYTHON garbage collector happens to run —
ContextCleaner only frees JVM-side blocks/shuffles when the Python
wrapper is collected — so storage/GC pressure climbs across runs.

Protocol: for each suspect key, N_REPS timed runs under (a) baseline
(bench.py behavior), (b) gc.collect() after every run. Records per-run
wall-clock plus a JVM heap-used snapshot after each run (enough to see
monotone storage growth; full GC-time accounting isn't exposed without
a listener). Prints one JSON line per (key, mode) and a summary
verdict.

Usage: python tools/bench_degradation.py [sf_dir]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KEYS = ["stream_session", "timeseries_gapfill", "dedup_minhash_lsh", "ann_ivfpq_topk"]
N_REPS = 6


def jvm_stats(spark):
    sc = spark.sparkContext
    status = sc._jsc.sc().getExecutorMemoryStatus()
    # single JVM in local mode: one entry (driver/executor combined)
    mem_free = None
    it = status.iterator()
    while it.hasNext():
        e = it.next()
        mem_free = e._2()._2()  # remaining storage memory
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    heap_used = rt.totalMemory() - rt.freeMemory()
    return {"storage_free": mem_free, "heap_used": int(heap_used)}


def run_series(spark, fn, mode: str):
    times, stats = [], []
    fn(spark, SF_DIR).count()  # warm-up, untimed (bench.py behavior)
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        times.append(round(time.perf_counter() - t0, 3))
        stats.append(jvm_stats(spark))
        if mode == "gc":
            gc.collect()
    return times, stats


def main() -> None:
    import __spark_entry__ as e

    from quackflight_spark.pipeline.frame_cache import clear_frames
    from quackflight_spark.session import get_spark

    spark = get_spark(app_name="bench-degradation")
    queries = e.queries()
    out = []
    for key in KEYS:
        for mode in ("baseline", "gc"):
            clear_frames()
            spark.catalog.clearCache()
            gc.collect()
            times, stats = run_series(spark, queries[key], mode)
            rec = {
                "key": key,
                "mode": mode,
                "runs": times,
                "growth": round(times[-1] / max(times[0], 1e-9), 2),
                "heap_used_mb": [round(s["heap_used"] / 1e6) for s in stats],
            }
            out.append(rec)
            print(json.dumps(rec), file=sys.stderr)
    # verdict: does gc.collect() flatten the curve?
    summary = {}
    for key in KEYS:
        b = next(r for r in out if r["key"] == key and r["mode"] == "baseline")
        g = next(r for r in out if r["key"] == key and r["mode"] == "gc")
        summary[key] = {"baseline_growth": b["growth"], "gc_growth": g["growth"],
                        "baseline_runs": b["runs"], "gc_runs": g["runs"]}
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
