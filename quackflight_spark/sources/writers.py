"""Write-path layouts for scale — the sink-side half of the 100 TB design.

The reference's only sinks are protocol serializations (SURVEY §2.1
S11-S16); table persistence is delegated to DuckDB files. On Spark the
*layout* of written data is a first-class performance lever, so the
engine exposes the three that matter:

- partitioned writes  → partition PRUNING at read time (a filter on the
  partition column skips whole directories — zero IO, better than any
  row-group pushdown),
- bucketed writes     → co-located joins/aggs on the bucket key with NO
  shuffle at read time (the 100 TB answer to repeated fact⋈fact joins),
- salted keys         → manual skew spreading where AQE's runtime
  skew-join splitting isn't available (e.g. aggregations on a hot key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, *partition_cols: str, mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet layout: one directory per partition
    value; readers filtering on partition_cols prune directories before
    any file is opened."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame, table: str, bucket_cols: list[str], n_buckets: int, mode: str = "overwrite"
) -> None:
    """Bucketed managed table: rows hash-distributed into n_buckets files
    per partition by bucket_cols. Two tables bucketed the same way join
    WITHOUT an exchange on either side (asserted in tests/test_writers.py).
    At 100 TB, bucket the big fact tables on their join key once at ingest
    and every downstream join/agg on that key skips its shuffle."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def salt_column(key: Column, n_salts: int) -> Column:
    """Deterministic salt derived from the row's key — spreads a hot key
    over n_salts reducers. Use on the skewed side; replicate the other
    side n_salts× (salted_join below does both)."""
    return F.pmod(F.hash(key), F.lit(n_salts))


def salted_join(
    skewed: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Skew-resistant equi-join: the skewed side gets a random salt in
    [0, n_salts); the small side is exploded n_salts× so every salted
    partition finds its match. Result equals a plain inner join on key.

    Prefer AQE's skew-join splitting when it kicks in (sort-merge joins);
    this helper is for the cases it doesn't cover (e.g. hot-key hash
    aggregations, broadcast-ineligible medium tables).
    """
    salted_left = skewed.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_left.join(replicated, on=[key, "__salt"], how="inner")
    return joined.drop("__salt")


def two_phase_skew_agg(df: DataFrame, key: str, value: str, n_salts: int = 16) -> DataFrame:
    """Hot-key aggregation in two phases: partial agg on (key, salt) —
    spreading one hot key over n_salts reducers — then final agg on key.
    Returns (key, total). Decimal-exact, so the result is identical to a
    one-phase sum regardless of salting."""
    partial = (
        df.withColumn("__salt", salt_column(F.col(value), n_salts))
        .groupBy(key, "__salt")
        .agg(F.sum(F.col(value).cast("decimal(18,2)")).alias("__partial"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("__partial").cast("double").alias("total"))
    )

