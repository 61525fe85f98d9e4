"""ASOF join — SURVEY.md §2.3 J6 (DuckDB ≥0.9 surface, delegated at
reference main.py:231). Spark has no native ASOF; the engine re-expresses
it as union + partitioned window last-value fill:

    left(user_id, ts)  ASOF JOIN  right(user_id, ts)  ON left.ts >= right.ts
  ≡ tag rows, union, window over (partition user_id, order ts with right
    rows sorting before left rows at equal ts), carry last non-null right
    payload forward, keep left rows.

Cost: ONE shuffle on the join key + a per-partition sort — same asymptotic
shape as a sort-merge join, no per-row nested-loop, no driver collect.
This scales to 100 TB exactly like any keyed window. (The pandas
merge_asof alternative would force Arrow transfer of both sides; the
union-window form stays entirely JVM-side.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Generic distributed ASOF join (left rows keep all columns; the
    right side contributes payload_cols from the most recent row with
    right.ts <= left.ts, per `on` key)."""
    assert direction == "backward", "forward ASOF: flip the sort order"
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    r = right.select(
        on, ts, *[F.col(c).alias(f"__p_{c}") for c in payload_cols]
    ).withColumn("__side", F.lit(0))
    unioned = l.unionByName(r, allowMissingColumns=True)
    # right rows (side=0) sort before left rows at equal ts → `>=` semantics
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")


@query("join_asof", oracle="""
    SELECT e.event_id, e.user_id, e.ts, err.event_id AS last_error_id
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
          WHERE event_type <> 'error') e
    ASOF LEFT JOIN
         (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
          WHERE event_type = 'error') err
    ON e.user_id = err.user_id AND e.ts >= err.ts
""")
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every non-error event: the id of the user's most recent error
    at-or-before it (classic 'state as of time t' lookup)."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "error").select("event_id", "user_id", "ts")
    right = (
        ev.filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("last_error_id"), "user_id", "ts")
    )
    return asof_join(left, right, on="user_id", ts="ts", payload_cols=["last_error_id"])
