"""Scaling-curve measurement: q1/q6 shapes at 1×/10×/100× the sf0.1
lineitem, Spark local[32] vs DuckDB (32 threads), medians of 3 warm runs.

Derived data lands in /tmp/qf_scale (fixtures are never written). This is
the reproduction script for the crossover table in PERF.md.

Usage: python tools/scale_curve.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SCALE_DIR = "/tmp/qf_scale"
BASE = "/root/testdata/sf0.1/lineitem.parquet"

Q1_SQL = """SELECT l_returnflag, l_linestatus,
 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) sq,
 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))*(1-CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) rev,
 count(*) n FROM {t} WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1,2"""
Q6_SQL = """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) rev
 FROM {t} WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
 AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""


def _dec(c):
    return F.col(c).cast("decimal(18,2)")


def q1(df):
    return (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sq"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("double").alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q6(df):
    return df.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("rev"))


def ensure_scaled(spark, mult: int, name: str) -> str:
    path = f"{SCALE_DIR}/lineitem_{name}.parquet"
    if not os.path.exists(path):
        li = spark.read.parquet(BASE)
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        big = (
            li.crossJoin(F.broadcast(reps))
            .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * 10_000_000)
            .drop("rep")
        )
        big.write.mode("overwrite").parquet(path)
    return path


def median_time(fn, n: int = 3) -> float:
    fn()  # warm
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    from quackflight_spark.session import get_spark

    spark = get_spark(app_name="scale_curve")
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    datasets = [("0.6M", BASE)]
    for mult, name in [(10, "x10"), (100, "x100")]:
        datasets.append((f"{mult * 600_000 // 1_000_000}M" if mult >= 2 else name,
                         ensure_scaled(spark, mult, name)))
    for label, path in datasets:
        df = spark.read.parquet(path)
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        for qname, qfn, sql in [("q1", q1, Q1_SQL), ("q6", q6, Q6_SQL)]:
            s_t = median_time(lambda: qfn(df).count())
            dsql = sql.format(t=f"read_parquet('{glob}')")
            d_t = median_time(lambda: con.execute(dsql).fetchall())
            print(
                f"{label} {qname}: spark={s_t:.3f}s duckdb={d_t:.3f}s "
                f"ratio={s_t / d_t:.1f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
