"""Data-quality audit — constraint checking as a first-class operator.

Before a 100 TB corpus feeds training, the pipeline asserts its
contracts: key uniqueness, null-freedom of required columns, referential
integrity between fact and dimension, and domain/range invariants. Each
check is one aggregate or one anti-join — cheap relative to the data —
and the output is a small metrics table a gate can alert on, the
dbt-test / Deequ pattern expressed directly in DataFrame ops.

Shapes: null/range checks ride the table scan (one pass, map-side
combine); duplicate-key counts are one groupBy on the key; orphan checks
are broadcast/shuffle anti-joins that Catalyst plans like any other
join. Nothing here collects raw rows — only violation COUNTS leave the
executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table


@query("pipeline_quality_audit", oracle="""
    SELECT 'orders.pk_dups' AS check_name,
           CAST((SELECT count(*) FROM (
              SELECT o_orderkey FROM orders GROUP BY o_orderkey
              HAVING count(*) > 1)) AS BIGINT) AS violations
    UNION ALL
    SELECT 'orders.null_keys',
           CAST((SELECT count(*) FROM orders
                 WHERE o_orderkey IS NULL OR o_custkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.orphans',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.bad_quantity',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_quantity IS NULL OR l_quantity <= 0) AS BIGINT)
    UNION ALL
    SELECT 'orders.bad_status',
           CAST((SELECT count(*) FROM orders
                 WHERE o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT)
    UNION ALL
    SELECT 'events.ts_out_of_range',
           CAST((SELECT count(*) FROM events
                 WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2020-01-01 00:00:00'
                    OR CAST(ts AS TIMESTAMP) >= TIMESTAMP '2030-01-01 00:00:00')
                AS BIGINT)
""")
def pipeline_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six contract checks over the fixture warehouse, one row each:
    primary-key uniqueness, required-column nulls, referential orphans
    (anti-join), numeric and categorical domains, timestamp range."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("bigint").alias("violations"),
        )

    pk_dups = one(
        "orders.pk_dups",
        orders.groupBy("o_orderkey").count().filter("count > 1"),
    )
    null_keys = one(
        "orders.null_keys",
        orders.filter("o_orderkey IS NULL OR o_custkey IS NULL"),
    )
    orphans = one(
        "lineitem.orphans",
        li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        ),
    )
    bad_qty = one(
        "lineitem.bad_quantity",
        li.filter("l_quantity IS NULL OR l_quantity <= 0"),
    )
    bad_status = one(
        "orders.bad_status",
        orders.filter("o_orderstatus NOT IN ('F', 'O', 'P')"),
    )
    ts_range = one(
        "events.ts_out_of_range",
        events.filter(
            "ts < TIMESTAMP '2020-01-01 00:00:00'"
            " OR ts >= TIMESTAMP '2030-01-01 00:00:00'"
        ),
    )
    return (
        pk_dups.union(null_keys)
        .union(orphans)
        .union(bad_qty)
        .union(bad_status)
        .union(ts_range)
    )
