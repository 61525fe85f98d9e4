"""r13 isolated re-time with per-run /proc/stat steal annotation.

Protocol (the graph_bfs r12 precedent): fresh session, bench.py hygiene
(warm-up + N timed runs + clear_frames + clearCache + gc.collect per
key), and for every run the host steal%% over exactly that run's window
(delta steal jiffies / delta total jiffies across all cpus). Min-of-N
is the engine number; a run whose steal%% is high explains its own
inflation.

  QF_KEYS=graph_scc,graph_kcore,cluster_dbscan QF_RUNS=5 \
      python tools/retime_r13.py
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_totals() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) summed over all cpus."""
    steal = total = 0
    with open("/proc/stat") as f:
        for line in f:
            if not line.startswith("cpu"):
                break
            parts = line.split()
            if parts[0] == "cpu":
                continue
            vals = [int(x) for x in parts[1:]]
            total += sum(vals)
            if len(vals) >= 8:
                steal += vals[7]
    return steal, total


def main() -> None:
    import __spark_entry__ as e

    from quackflight_spark.pipeline.frame_cache import clear_frames
    from quackflight_spark.session import get_spark

    keys = os.environ["QF_KEYS"].split(",")
    n_runs = int(os.environ.get("QF_RUNS", "5"))
    spark = get_spark(app_name="retime-r13")
    queries = e.queries()
    out: dict[str, dict] = {}
    for key in keys:
        fn = queries[key]
        spark.sparkContext.setJobDescription(f"retime:{key}")
        fn(spark, SF_DIR).count()  # warm-up (untimed)
        samples, steals = [], []
        for _ in range(n_runs):
            s0, t0j = cpu_totals()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            s1, t1j = cpu_totals()
            samples.append(round(dt, 4))
            steals.append(
                round(100.0 * (s1 - s0) / max(t1j - t0j, 1), 2)
            )
        out[key] = {
            "min": min(samples),
            "runs": samples,
            "steal_pct": steals,
        }
        print(f"# {key}: min {min(samples)}s runs {samples} "
              f"steal% {steals}", file=sys.stderr)
        clear_frames()
        spark.catalog.clearCache()
        gc.collect()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
