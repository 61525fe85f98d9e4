"""Builder-side baseline ratio: our Spark bench per-key minima vs the
SAME oracle SQL executed by DuckDB (32 threads, warm, min of 3) on the
same sf0.1 parquet — the BASELINE.md protocol, precomputed so the ratio
distribution's composition is explicit:

- data-heavy pipeline keys, where the engine actually works, BEAT DuckDB;
- sub-half-second keys are dominated by Spark's fixed per-query cost
  (scheduler + codegen + 32-task fan-out), where DuckDB's 2-20 ms is
  unreachable by construction and irrelevant at the 100 TB design point
  (see PERF.md "The crossover, measured").

Usage: python tools/baseline_ratio.py   (reads bench_samples.json for the
Spark minima — note the committed baseline_ratio.json was post-processed
to use the per-key min across the three r4 bench sessions, the same
minima PERF.md's 34.8 s headline uses; writes baseline_ratio.json)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    spark_min = json.load(open(os.path.join(ROOT, "bench_samples.json")))["queries"]

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    rows = []
    for key, s_sec in spark_min.items():
        sql = oracles.get(key)
        if sql is None:
            continue  # rows-only keys have no comparable oracle
        try:
            con.execute(sql).fetchall()  # warm
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            d_sec = round(min(samples), 4)
        except Exception as ex:  # noqa: BLE001 — recorded, not fatal
            print(f"# {key}: oracle failed: {ex}", file=sys.stderr)
            continue
        rows.append(
            {
                "key": key,
                "spark_s": s_sec,
                "duckdb_s": d_sec,
                "ratio": round(s_sec / d_sec, 2) if d_sec > 0 else None,
            }
        )
        print(f"# {key}: spark {s_sec}s duckdb {d_sec}s", file=sys.stderr)

    ratios = [r["ratio"] for r in rows if r["ratio"]]
    big = [r for r in rows if r["duckdb_s"] >= 0.2 or r["spark_s"] >= 1.0]
    summary = {
        "sf_dir": SF_DIR,
        "n_keys": len(rows),
        "median_ratio_all": round(statistics.median(ratios), 2),
        "keys_spark_wins": sorted(
            r["key"] for r in rows if r["ratio"] and r["ratio"] < 1.0
        ),
        "median_ratio_nontrivial": round(
            statistics.median([r["ratio"] for r in big if r["ratio"]]), 2
        )
        if big
        else None,
        "rows": sorted(rows, key=lambda r: r["ratio"] or 0),
    }
    with open(os.path.join(ROOT, "baseline_ratio.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))


if __name__ == "__main__":
    main()
