"""Concurrent append + read — the reference's entire streaming story
(SURVEY.md §2.9 ST1-ST4).

Reference behaviors:
- ST1 producer: CREATE TABLE IF NOT EXISTS + 1000-row INSERT batch every
  2 s over Flight (examples/flight_insert.py:40-95)
- ST2 consumer: poll COUNT(*) + 1-row random sample every 5 s against the
  same table (examples/flight_watch.py:38-76)
- ST3 streamed ingest: unbounded Arrow batch sequence → incremental
  insert per batch → row-count ack (main.py:1050-1094)
- ST4 headline: "unlocked concurrent inserts and querying" (README.md:14)

Spark-native equivalents here: an append-mode parquet table written in
batches while independent queries re-read it. On a cluster this is the
normal multi-job pattern; the table format must tolerate concurrent
append+read (parquet-append here; Delta would add snapshot isolation —
jar not in this build, noted in SURVEY §7 P5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def create_append_table(spark: SparkSession, path: str, schema_ddl: str) -> None:
    """ST1's CREATE TABLE IF NOT EXISTS: materialize an empty parquet
    table directory with a pinned schema."""
    empty = spark.createDataFrame([], schema_ddl)
    empty.write.mode("ignore").parquet(path)


def append_batch(spark: SparkSession, path: str, df: DataFrame) -> int:
    """ST1/ST3 producer step: append one batch, return its row count (the
    reference acks rows_inserted per batch, main.py:1077).

    Each batch commits as ONE file: a single task-file rename is atomic,
    so concurrent readers see whole batches or nothing — parquet-append's
    per-file atomicity becomes per-batch. Ingest batches are small by
    construction (the reference streams 1000-row batches); large backfills
    go through sources/writers.py layouts or an IdempotentSink on a
    transactional table instead."""
    n = df.count()
    df.coalesce(1).write.mode("append").parquet(path)
    return n


def read_state(spark: SparkSession, path: str) -> tuple[int, list]:
    """ST2 consumer step: COUNT(*) + 1-row uniform sample, re-reading the
    table fresh (the reference re-executes both queries per poll,
    examples/flight_watch.py:46,53-57)."""
    df = spark.read.parquet(path)
    n = df.count()
    sample = df.orderBy(F.rand()).limit(1).collect()
    return n, sample
