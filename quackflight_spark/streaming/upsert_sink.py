"""Streaming upsert sink: foreachBatch → copy-on-write MERGE.

The lakehouse ingest pattern the reference approximates with polled
re-inserts (examples/flight_insert.py + flight_watch.py): a change-data
stream lands in partitioned parquet via per-microbatch MERGE, so
late-arriving updates REPLACE matched keys instead of appending
duplicates.  Spark-first shape:

    readStream (file source) → writeStream.foreachBatch(
        merge_upsert_cow into the partitioned target
    ) with Trigger.AvailableNow

Exactly-once: the CoW commit is idempotent per (key, partition) — a
replayed microbatch re-merges the same rows to the same result — and
partition-directory swaps touch only partitions the batch's keys live
in.  At 100 TB the same foreachBatch body calls the table-format MERGE
(Delta/Iceberg) and IO stays proportional to touched partitions per
microbatch, never the table.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table
from quackflight_spark.sources.merge import _COLS, _SEGS, merge_upsert_cow

from quackflight_spark.staging import stage_root

SINK_ROOT = stage_root("stream_upsert")  # derived data; fixtures untouched


def run_upsert_stream(
    spark: SparkSession, source_dir: str, target_path: str,
    key_cols: list[str], partition_col: str, schema,
) -> None:
    """Drain every available file from source_dir through a foreachBatch
    CoW MERGE into target_path (Trigger.AvailableNow → terminates when
    caught up)."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert_cow(
            batch_df.sparkSession, target_path, batch_df, key_cols, partition_col
        )

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", target_path + "__ckpt")
        .start()
    )
    q.awaitTermination()


@query("stream_upsert_sink", oracle=f"""
    WITH src AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
             c_mktsegment
      FROM customer
      WHERE c_mktsegment IN {_SEGS} AND c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEW ' || c_name, c_nationkey, c_acctbal,
             c_mktsegment
      FROM customer
      WHERE c_mktsegment IN {_SEGS} AND c_custkey % 7 = 3
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE NOT (c_mktsegment IN {_SEGS} AND c_custkey % 10 = 0)
    UNION ALL
    SELECT * FROM src
""")
def stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streamed MERGE: the merge_upsert change-set arrives as
    a file stream and lands through foreachBatch CoW upserts; the final
    table equals the batch MERGE result (same oracle as merge_upsert —
    the sink is the streaming route to identical post-state)."""
    from quackflight_spark.sources.merge import _source_df

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    target = f"{SINK_ROOT}/tgt_{tag}"
    staging = f"{SINK_ROOT}/src_{tag}"
    for p in (target, staging, target + "__ckpt"):
        shutil.rmtree(p, ignore_errors=True)

    base = load_table(spark, sf_dir, "customer").select(*_COLS)
    base.write.mode("overwrite").partitionBy("c_mktsegment").parquet(target)
    changes = _source_df(spark, sf_dir)
    changes.write.mode("overwrite").parquet(staging)

    run_upsert_stream(
        spark, staging, target, ["c_custkey"], "c_mktsegment", changes.schema
    )
    return spark.read.parquet(target).select(*_COLS)
