"""Central query/oracle registry backing __spark_entry__.py.

Every operator the engine claims (SURVEY.md §2 inventory + beyond-reference
pipeline ops) registers here as a (spark, sf_dir) -> DataFrame callable,
optionally paired with the ANSI-SQL oracle string DuckDB runs on the same
fixtures. Keys without an oracle get the driver's weaker rows-only check
(reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering an operator under its SURVEY §2 key."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent).

    ORDER MATTERS: the driver's correctness gate walks keys in
    registration order and has a budget (r1 truncated after 50 of 141).
    Modules whose keys have never received a driver correctness row —
    and the three hardest frontend/rewrite keys (join_asof, win_qualify
    via windows, recursive_cte) — register FIRST; the 47 keys already
    proven green in CORRECTNESS_r01.json (relational.py, most of
    windows.py) register LAST, so a recurrence of the truncation spends
    its budget on unproven keys."""
    import quackflight_spark.operators.asof  # noqa: F401
    import quackflight_spark.operators.recursive  # noqa: F401
    import quackflight_spark.operators.windows  # noqa: F401
    import quackflight_spark.operators.subqueries  # noqa: F401
    import quackflight_spark.operators.setops  # noqa: F401
    import quackflight_spark.functions.scalar_suite  # noqa: F401
    import quackflight_spark.operators.sketches  # noqa: F401
    import quackflight_spark.operators.tpch_extra  # noqa: F401
    import quackflight_spark.operators.tpch_full  # noqa: F401
    import quackflight_spark.pipeline.dedup  # noqa: F401
    import quackflight_spark.pipeline.similarity  # noqa: F401
    import quackflight_spark.pipeline.text_analysis  # noqa: F401
    import quackflight_spark.pipeline.multimodal  # noqa: F401
    import quackflight_spark.pipeline.sampling  # noqa: F401
    import quackflight_spark.pipeline.composite  # noqa: F401
    import quackflight_spark.sources.merge  # noqa: F401
    import quackflight_spark.serving.formats  # noqa: F401
    import quackflight_spark.streaming.windowed  # noqa: F401
    import quackflight_spark.streaming.upsert_sink  # noqa: F401
    import quackflight_spark.operators.relational  # noqa: F401
