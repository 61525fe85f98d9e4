"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query on sf0.001 (smoke).
queries()     — every implemented operator from SURVEY.md §2 (+ the
                beyond-reference pipeline ops), (spark, sf_dir) -> DataFrame.
oracle_sql()  — matching DuckDB-runnable ANSI SQL per key; keys without an
                oracle are non-SQL-expressible and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from quackflight_spark.operators.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from quackflight_spark import registry

    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    from quackflight_spark import registry

    registry.load_all()
    return dict(registry.ORACLES)
