"""CTEs, subqueries, pivot/unpivot, range joins — the rest of the Tier B
relational surface (delegated DuckDB SQL at reference main.py:231) that a
capability-parity engine must accept.

Catalyst handles decorrelation (RewriteCorrelatedScalarSubquery /
RewritePredicateSubquery) exactly where DuckDB's optimizer does
(SURVEY §4.2), so these are all native — the value here is coverage
plus the scale notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table


def _views(spark, sf_dir, *names):
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query("cte_with", oracle="""
    WITH cust_orders AS (
      SELECT o_custkey, count(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey
    ), big AS (
      SELECT * FROM cust_orders WHERE spend > 1000000
    )
    SELECT c_name, n_orders, spend
    FROM big JOIN customer ON o_custkey = c_custkey
""")
def cte_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH chains — native; Catalyst inlines or reuses CTEs by cost."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        WITH cust_orders AS (
          SELECT o_custkey, count(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
          FROM orders GROUP BY o_custkey
        ), big AS (
          SELECT * FROM cust_orders WHERE spend > 1000000
        )
        SELECT c_name, n_orders, spend
        FROM big JOIN customer ON o_custkey = c_custkey
        """
    )


@query("subquery_scalar", oracle="""
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6) AS vs_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 2
""")
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subqueries → broadcast singleton (one extra
    tiny job, no per-row execution)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6) AS vs_avg
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 2
        """
    )


@query("subquery_correlated", oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_acctbal > (SELECT count(*) * 400 FROM orders
                       WHERE o_custkey = c_custkey)
""")
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates to an aggregate
    + join (same rewrite DuckDB applies; never executes per-row)."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_acctbal > (SELECT count(*) * 400 FROM orders
                           WHERE o_custkey = c_custkey)
        """
    )


@query("subquery_in", oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
      AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount = 0.0
                            AND l_partkey IS NOT NULL)
""")
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries → left-semi / null-aware anti joins."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
          AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount = 0.0
                                AND l_partkey IS NOT NULL)
        """
    )


@query("pivot", oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS F,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS O
    FROM lineitem GROUP BY l_returnflag
""")
def pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (DuckDB has native PIVOT; Spark df.pivot) — one hash agg,
    explicit value list so no extra distinct-values job at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )


@query("unpivot", oracle="""
    SELECT o_orderkey, kind, CAST(val AS DOUBLE) AS val
    FROM (SELECT o_orderkey, o_totalprice AS price, CAST(o_custkey AS DOUBLE) AS cust
          FROM orders)
    UNPIVOT (val FOR kind IN (price, cust))
""")
def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT ↔ df.unpivot (melt) — pure map-side row expansion."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_custkey").cast("double").alias("cust"),
    )
    return o.unpivot("o_orderkey", ["price", "cust"], "kind", "val")


@query("join_range_bucket", oracle="""
    SELECT e1.event_id AS a, e2.event_id AS b
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 MINUTE
     AND e1.event_id <> e2.event_id
""")
def join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (events within 1 minute after each event, per user).

    Naive form is a per-key nested loop; the scale pattern is
    equi-join on (user, time-bucket) for the bucket pair (b, b) and
    (b, b+1), then filter the exact range — shuffle stays keyed and
    bounded. The oracle is the naive form; equality proves the bucketed
    plan lossless (any pair ≤1min apart lands in the same or adjacent
    1-minute bucket)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    bucket = (F.unix_timestamp("ts") / 60).cast("bigint")
    left = e.select(
        F.col("event_id").alias("a"), F.col("user_id").alias("u"),
        F.col("ts").alias("ts_a"), bucket.alias("b"),
    )
    right = e.select(
        F.col("event_id").alias("b_id"), F.col("user_id").alias("u2"),
        F.col("ts").alias("ts_b"), bucket.alias("b2"),
    )
    # candidate buckets: same or next minute bucket
    expanded = left.withColumn("probe", F.explode(F.array(F.col("b"), F.col("b") + 1)))
    joined = expanded.join(
        right, (F.col("u") == F.col("u2")) & (F.col("probe") == F.col("b2"))
    )
    return (
        joined.filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 1 MINUTE"))
            & (F.col("a") != F.col("b_id"))
        )
        .select("a", F.col("b_id").alias("b"))
        .distinct()
    )


@query("exists_agg", oracle="""
    SELECT n_name, count(*) AS n_cust
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
""")
def exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + join + agg composition."""
    _views(spark, sf_dir, "nation", "customer", "orders")
    return spark.sql(
        """
        SELECT n_name, count(*) AS n_cust
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
        GROUP BY n_name
        """
    )


@query("subquery_any_all", oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > ALL (
            SELECT o_totalprice FROM orders WHERE o_orderpriority = '5-LOW'
              AND o_custkey < 100
          )
      AND o_orderkey < ANY (
            SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
          )
""")
def subquery_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparisons (ALL / ANY subqueries) — rewritten to the
    aggregate forms Catalyst executes directly: `> ALL (S)` = `> max(S)`
    (with empty-S = TRUE via coalesce) and `< ANY (S)` = `< max(S)`.
    The rewrite turns a correlated quantifier into one scalar aggregate
    broadcast against the outer scan — no per-row subquery execution at
    any scale."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_anyall_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM _anyall_orders
        WHERE o_totalprice > coalesce(
                (SELECT max(o_totalprice) FROM _anyall_orders
                 WHERE o_orderpriority = '5-LOW' AND o_custkey < 100),
                CAST('-Infinity' AS DOUBLE))
          AND o_orderkey < (SELECT max(o_orderkey) FROM _anyall_orders
                            WHERE o_orderstatus = 'F')
        """
    )
