"""Idempotent (exactly-once) batch sink — the ST3 ingest ack done right.

The reference's do_exchange acks rows_inserted per batch
(main.py:1050-1094) but a client retry after a lost ack double-inserts.
The Spark-native fix is an idempotent foreachBatch-style sink: each batch
carries a batch_id; a committed-ids ledger makes replays no-ops. This is
the standard Structured Streaming `foreachBatch(epoch_id)` contract,
usable from both the streaming and the Flight-ingest paths.

The ledger is a parquet append of (batch_id) — at scale a transactional
table (Delta) replaces it; the protocol is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IdempotentSink:
    def __init__(self, spark: SparkSession, data_path: str, ledger_path: str):
        self.spark = spark
        self.data_path = data_path
        self.ledger_path = ledger_path

    def committed_ids(self) -> set[int]:
        if not os.path.exists(self.ledger_path):
            return set()
        return {
            r["batch_id"] for r in self.spark.read.parquet(self.ledger_path).collect()
        }

    def write(self, df: DataFrame, batch_id: int) -> int:
        """Write one batch unless batch_id already committed; returns rows
        written (0 on replay). The reference-shaped rows_inserted ack is
        the return value, now retry-safe."""
        if batch_id in self.committed_ids():
            return 0
        n = df.count()
        df.write.mode("append").parquet(self.data_path)
        self.spark.createDataFrame([(batch_id,)], "batch_id bigint").write.mode(
            "append"
        ).parquet(self.ledger_path)
        return n

    def foreach_batch(self):
        """Adapter for writeStream.foreachBatch(...)."""

        def fn(df: DataFrame, epoch_id: int) -> None:
            self.write(df, epoch_id)

        return fn


def dedup_on_read(spark: SparkSession, data_path: str, key_cols: list[str]) -> DataFrame:
    """Belt-and-braces reader: drop duplicate rows by key (covers sinks
    without a ledger). One shuffle on key_cols."""
    df = spark.read.parquet(data_path)
    return df.dropDuplicates(key_cols)
