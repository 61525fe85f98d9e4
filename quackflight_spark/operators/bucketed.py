"""Bucketed (pre-shuffled) tables — the shuffle-free co-located join.

The single biggest cost of a 100 TB fact-fact join is the shuffle: both
sides repartition on the join key every time the query runs.  Bucketing
pays that shuffle ONCE at ingest: each table is written hash-partitioned
into N buckets on the join key (`bucketBy`), the bucket spec lives in the
catalog, and every later equi-join on that key reads bucket i of each
side directly — `Exchange` disappears from the plan entirely (the
`Bucketed: true` / `SelectedBucketsCount` scan annotations plus a
SortMergeJoin with no child Exchange, pinned in tests/test_plans.py).
Filters on the bucket key additionally prune whole buckets at plan time.

This is the Spark-native equivalent of the co-located storage the
reference gets implicitly from DuckDB's single-file locality (reference
main.py:231 delegates joins to one embedded process where "shuffle" is
free); on a cluster only bucketing (or a table format's clustering) buys
that locality back.

Local caveat (documented, not load-bearing): each writer task emits its
own file per bucket, so Spark cannot trust `sortBy` order across files
and keeps a per-bucket Sort before the merge join — the Exchange (the
O(data) network cost) is still gone, which is the point at scale.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

from quackflight_spark.staging import stage_root

BUCKET_ROOT = stage_root("bucketed")  # derived data; fixtures untouched
N_BUCKETS = 16


def bucketed_table(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> str:
    """Materialize fixture table `name` as a bucketed catalog table on
    `key` (idempotent per corpus + session).  This is the one-time
    ingest job; at 100 TB it replaces the per-query shuffle of every
    downstream equi-join on `key`.

    If the catalog lost the table (fresh session) the path is rebuilt:
    bucket metadata lives in the metastore, and trusting orphaned files
    without it would silently degrade to a plain (shuffling) scan."""
    tbl = f"qf_b_{name}_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    if not spark.catalog.tableExists(tbl):
        path = f"{BUCKET_ROOT}/{tbl}"
        if os.path.exists(path):
            shutil.rmtree(path)
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tbl)
        )
    return tbl


@query("join_bucketed_colocated", oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
""")
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join answered from bucketed tables (new r6): orders and
    lineitem are both bucketed 16-ways on the order key at ingest, so
    the join plan has NO Exchange on either side — bucket i joins
    bucket i where it already sits.  Values are identical to the plain
    parquet join (the oracle); only the physical plan differs, and THAT
    is the operator: tests pin `Bucketed: true` on both scans and the
    absence of any Exchange under the SortMergeJoin, the exact shuffle
    this saves per-query at 100 TB."""
    orders = spark.table(bucketed_table(spark, sf_dir, "orders", "o_orderkey"))
    lineitem = spark.table(
        bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    )
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
