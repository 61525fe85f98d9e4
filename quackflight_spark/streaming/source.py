"""Shared staging for file-source streaming keys.

Structured Streaming's file source tails a DIRECTORY; the fixtures are
single parquet files. Each streaming key therefore stages a symlink dir
and reads it with readStream + the batch-inferred schema — this module
is the one implementation of that idiom (it previously lived inline in
four operators) plus the drain-to-memory-sink runner they all share.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def stage_events_stream(
    spark: SparkSession, sf_dir: str, tag_prefix: str
) -> DataFrame:
    """readStream over a symlink-staged copy of `<sf_dir>/events.parquet`
    with the batch-inferred schema. Returns the RAW stream — callers
    apply events_ts_normalized / filters themselves."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"qf_{tag_prefix}_src_{tag}")
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    os.symlink(f"{sf_dir}/events.parquet", f"{stage}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return spark.readStream.schema(raw_schema).parquet(stage)


def drain_to_memory(
    spark: SparkSession,
    stream: DataFrame,
    name: str,
    output_mode: str,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Start the stream into a memory sink, drain all available input,
    stop, and return the snapshot table. `shuffle_partitions` narrows
    the state-store partition count for fixture-sized state (200 state
    partitions on 150 keys is pure overhead)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
