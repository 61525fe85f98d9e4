"""Fixture/table loading.

The reference's scan surface is `read_parquet(...)` table functions and
catalog tables passed through to DuckDB (SURVEY.md §2.1 S1/S2). Here every
table is a parquet scan through the DataFrame reader, so Catalyst gives us
predicate pushdown, column pruning and (on partitioned layouts) partition
pruning for free.

At 100 TB the same call reads a partitioned directory tree; nothing here
assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region/nation are bounded by geography; supplier/part/customer grow with
# SF but stay dimension-sized relative to the fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def events_ts_normalized(df: DataFrame) -> DataFrame:
    """Normalize the events `ts` column to µs-precision TimestampType.

    events.parquet stores ts as parquet TIMESTAMP(NANOS). How Spark scans
    that is version-dependent: 4.1 reads it natively as TIMESTAMP_NTZ
    (µs-truncated); older readers with
    spark.sql.legacy.parquet.nanosAsLong=true surface LongType ns. Both
    are normalized to TimestampType — watermarks require it
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ), and with the session
    timezone pinned to UTC (session.py) the wall-clock values are
    identical to the UTC-naive oracle. The bigint branch uses integer
    DIV, not float division — ns values exceed double's 2^53. All
    branches are codegen'd column expressions, free at scale.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (parquet; single file or directory)."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = events_ts_normalized(df)
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view and return the frames.

    Views make the SQL surface (spark.sql) work against the same data the
    DataFrame operators use — the Spark analog of the reference's catalog
    pass-through (reference main.py:722, 955).
    """
    frames: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        frames[name] = df
    return frames
