"""Set operations — SURVEY.md §2.7 (Tier B, delegated at reference
main.py:231).

UNION ALL is a zero-shuffle concatenation in Spark; the deduplicating
variants (UNION/INTERSECT/EXCEPT) hash-shuffle on all columns — at scale,
prefer UNION ALL + downstream agg when semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table


def _custkeys_big(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )


def _custkeys_urgent(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )


@query("set_union_all", oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
      UNION ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
""")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_big(spark, sf_dir).union(_custkeys_urgent(spark, sf_dir))


@query("set_union", oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNION deduplicates → union + distinct."""
    return _custkeys_big(spark, sf_dir).union(_custkeys_urgent(spark, sf_dir)).distinct()


@query("set_union_byname", oracle="""
    SELECT n_nationkey AS k, n_name AS name FROM nation
    UNION ALL BY NAME
    SELECT r_name AS name, r_regionkey AS k FROM region
""")
def set_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB `UNION ALL BY NAME` ↔ Spark unionByName."""
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("name")
    )
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_name").alias("name"), F.col("r_regionkey").alias("k")
    )
    return n.unionByName(r)


@query("set_intersect", oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_big(spark, sf_dir).intersect(_custkeys_urgent(spark, sf_dir))


@query("set_intersect_all", oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_big(spark, sf_dir).intersectAll(_custkeys_urgent(spark, sf_dir))


@query("set_except", oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_big(spark, sf_dir).subtract(_custkeys_urgent(spark, sf_dir))


@query("set_except_all", oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_big(spark, sf_dir).exceptAll(_custkeys_urgent(spark, sf_dir))
