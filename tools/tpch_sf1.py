"""sf1 TPC-H leg (r9 verdict stretch #9): replicate the sf0.1 fixtures
10x with CONSISTENT key remapping (each replica is a disjoint copy —
per-rep offsets added to every key domain, so join cardinalities scale
exactly linearly) and time the 13 benched tpch keys Spark local[32] vs
DuckDB (32 threads) on the same parquet. Extends the q1/q6 crossover
evidence (tools/scale_curve.py, 60M rows) to the JOIN-heavy queries:
the question is which joins flip to Spark wins at ~6M-row lineitem.

Derived data lands under /tmp (fixtures never written). Usage:
python tools/tpch_sf1.py          (one line per key + a JSON summary)
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
MULT = int(os.environ.get("QF_TPCH_MULT", "10"))
TPCH_KEYS = os.environ.get(
    "QF_TPCH_KEYS",
    "tpch_q1,tpch_q2,tpch_q3,tpch_q4,tpch_q5,tpch_q6,tpch_q7,tpch_q9,"
    "tpch_q10,tpch_q12,tpch_q14,tpch_q18,tpch_q21",
).split(",")
# key-domain remaps per table: (column, offset-name)
REMAP = {
    "customer": [("c_custkey", "c")],
    "orders": [("o_orderkey", "o"), ("o_custkey", "c")],
    "lineitem": [("l_orderkey", "o"), ("l_partkey", "p"), ("l_suppkey", "s")],
    "part": [("p_partkey", "p")],
    "supplier": [("s_suppkey", "s")],
}
COPY = ("region", "nation")  # fixed-size dims: one copy, keys untouched


def build_sf1(spark) -> str:
    out = f"/tmp/qf_sfx{MULT}"
    if os.path.exists(f"{out}/_BUILT"):
        return out
    os.makedirs(out, exist_ok=True)
    offs = {}
    for dom, table, col in (
        ("c", "customer", "c_custkey"),
        ("o", "orders", "o_orderkey"),
        ("p", "part", "p_partkey"),
        ("s", "supplier", "s_suppkey"),
    ):
        m = (
            spark.read.parquet(f"{BASE}/{table}.parquet")
            .agg(F.max(col))
            .collect()[0][0]
        )
        offs[dom] = int(m) + 1
    reps = spark.range(MULT).select(F.col("id").alias("rep"))
    for table, remaps in REMAP.items():
        df = spark.read.parquet(f"{BASE}/{table}.parquet")
        big = df.crossJoin(F.broadcast(reps))
        for col, dom in remaps:
            big = big.withColumn(col, F.col(col) + F.col("rep") * offs[dom])
        big.drop("rep").write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
    for table in COPY:
        spark.read.parquet(f"{BASE}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{table}.parquet")
    open(f"{out}/_BUILT", "w").write("ok")
    return out


def min3(fn) -> float:
    fn()  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(min(samples), 3)


def main() -> None:
    import __spark_entry__ as e

    from quackflight_spark.pipeline.frame_cache import clear_frames
    from quackflight_spark.session import get_spark

    spark = get_spark(app_name="tpch_sf1")
    sf1 = build_sf1(spark)
    queries, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in list(REMAP) + list(COPY):
        p = f"{sf1}/{t}.parquet"
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
        )

    summary = {}
    for key in TPCH_KEYS:
        s_sec = min3(lambda: queries[key](spark, sf1).count())
        clear_frames()
        spark.catalog.clearCache()
        d_sec = min3(lambda: con.execute(oracles[key]).fetchall())
        ratio = round(s_sec / d_sec, 2) if d_sec else None
        summary[key] = {"spark": s_sec, "duckdb": d_sec, "ratio": ratio}
        print(
            f"{key}: spark={s_sec}s duckdb={d_sec}s ratio={ratio}x",
            flush=True,
        )
    print(json.dumps({"sf": f"sf0.1 x{MULT}", "keys": summary}))


if __name__ == "__main__":
    main()
