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
    """Generic distributed ASOF join (left rows keep all columns).

    direction="backward": right contributes payload_cols from the most
    recent row with right.ts <= left.ts per `on` key (last-ignorenulls
    over the preceding frame). direction="forward": from the NEAREST row
    with right.ts >= left.ts (first-ignorenulls over the following
    frame); equal-ts right rows tie-break on the first payload column so
    the pick is deterministic under any partitioning."""
    lcols = left.columns
    if direction == "backward":
        l = left.withColumn("__side", F.lit(1))
        r = right.select(
            on, ts, *[F.col(c).alias(f"__p_{c}") for c in payload_cols]
        ).withColumn("__side", F.lit(0))
        unioned = l.unionByName(r, allowMissingColumns=True)
        # right rows (side=0) sort before left rows at equal ts → `>=`
        w = (
            W.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("__side").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        fills = [
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ]
        keep = 1
    else:
        l = left.withColumn("__side", F.lit(0))
        r = right.select(
            on, ts, *[F.col(c).alias(f"__p_{c}") for c in payload_cols]
        ).withColumn("__side", F.lit(1))
        unioned = l.unionByName(r, allowMissingColumns=True)
        # left rows (side=0) sort before right rows at equal ts → `<=`
        # is inclusive; equal-ts right rows order by payload for a
        # deterministic nearest pick
        w = (
            W.partitionBy(on)
            .orderBy(
                F.col(ts).asc(),
                F.col("__side").asc(),
                F.col(f"__p_{payload_cols[0]}").asc_nulls_last(),
            )
            .rowsBetween(0, W.unboundedFollowing)
        )
        fills = [
            F.first(f"__p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ]
        keep = 0
    filled = unioned.select(*lcols, "__side", *fills)
    return filled.filter(F.col("__side") == keep).drop("__side")


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


@query("join_asof_forward", oracle="""
    WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type <> 'error'),
    r AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'error'),
    scored AS (
      SELECT l.event_id, l.user_id, l.ts, r.event_id AS next_error_id,
             row_number() OVER (PARTITION BY l.event_id
               ORDER BY r.ts, r.event_id) AS rn
      FROM l LEFT JOIN r
        ON l.user_id = r.user_id AND r.ts >= l.ts
    )
    SELECT event_id, user_id, ts, next_error_id
    FROM scored WHERE rn = 1
""")
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward ASOF: for every non-error event, the id of the user's
    NEXT error at-or-after it (time-to-failure lookups, label joins for
    'what happens next' training targets). Same one-shuffle union+window
    shape as the backward form, frame flipped to following."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "error").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("next_error_id"), "user_id", "ts")
    )
    return asof_join(
        left, right, on="user_id", ts="ts",
        payload_cols=["next_error_id"], direction="forward",
    )
