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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (parquet; single file or directory).

    events.ts is parquet TIMESTAMP(NANOS); with
    spark.sql.legacy.parquet.nanosAsLong=true it scans as LongType and we
    convert to TimestampType at µs precision (floor-truncating, matching
    DuckDB's CAST(ts_ns AS TIMESTAMP)). The conversion is a codegen'd
    column expression — free at scale.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # integer DIV, not float division — ns values exceed double's 2^53
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
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
