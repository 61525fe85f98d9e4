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
    frame). All payload columns travel as ONE struct, so they always
    come from the SAME right row, and equal-ts right rows tie-break on
    the full payload struct — deterministic under any partitioning even
    with multiple payload columns or NULL payload values (r3 advice)."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join direction must be 'backward' or 'forward', got {direction!r}"
        )
    lcols = left.columns
    pay = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    if direction == "backward":
        l = left.withColumn("__side", F.lit(1))
        r = right.select(on, ts, pay.alias("__p")).withColumn("__side", F.lit(0))
        unioned = l.unionByName(r, allowMissingColumns=True)
        # right rows (side=0) sort before left rows at equal ts → `>=`;
        # equal-(ts, side) right rows order by payload struct, so last()
        # deterministically picks the max
        w = (
            W.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("__side").asc(), F.col("__p").asc_nulls_last())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        fill = F.last("__p", ignorenulls=True).over(w)
        keep = 1
    else:
        l = left.withColumn("__side", F.lit(0))
        r = right.select(on, ts, pay.alias("__p")).withColumn("__side", F.lit(1))
        unioned = l.unionByName(r, allowMissingColumns=True)
        # left rows (side=0) sort before right rows at equal ts → `<=`
        # is inclusive; first() deterministically picks the min payload
        # struct among equal-ts right rows
        w = (
            W.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("__side").asc(), F.col("__p").asc_nulls_last())
            .rowsBetween(0, W.unboundedFollowing)
        )
        fill = F.first("__p", ignorenulls=True).over(w)
        keep = 0
    filled = unioned.select(*lcols, "__side", fill.alias("__f"))
    return filled.filter(F.col("__side") == keep).select(
        *lcols, *[F.col("__f").getField(c).alias(c) for c in payload_cols]
    )


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


ASOF_TOLERANCE_MIN = 30  # minutes — matches pandas merge_asof(tolerance=...)


@query("join_asof_tolerance", oracle=f"""
    WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type <> 'error'),
    r AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'error'),
    matched AS (
      SELECT l.event_id, l.user_id, l.ts,
             r.event_id AS last_error_id, r.ts AS err_ts
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN err_ts IS NOT NULL
                 AND ts - err_ts <= INTERVAL {ASOF_TOLERANCE_MIN} MINUTE
                THEN last_error_id END AS last_error_id
    FROM matched
""")
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF join with a max-gap tolerance (pandas merge_asof's
    `tolerance`): the most recent error at-or-before each event counts
    only if it happened within the last ASOF_TOLERANCE_MIN minutes —
    stale state must NOT be carried forward indefinitely (feature
    freshness windows, attribution lookback caps). Same one-shuffle
    union+window shape: the matched right row's ts rides the payload
    struct, and the tolerance check nulls out stale matches afterwards —
    no second join, no extra exchange."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "error").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("last_error_id"), "user_id", "ts")
        .withColumn("err_ts", F.col("ts"))
    )
    out = asof_join(
        left, right, on="user_id", ts="ts",
        payload_cols=["last_error_id", "err_ts"],
    )
    within = F.col("err_ts").isNotNull() & (
        F.col("ts").cast("long") - F.col("err_ts").cast("long")
        <= ASOF_TOLERANCE_MIN * 60
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("last_error_id")).alias("last_error_id"),
    )


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


@query("join_nearest", oracle="""
    WITH l AS (
      SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events WHERE event_type <> 'error'
    ),
    r AS (
      SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events WHERE event_type = 'error'
    ),
    cand AS (
      SELECT l.event_id, l.user_id, l.t,
             min(ROW(abs(l.t - r.t), r.t, r.event_id)) AS best
      FROM l LEFT JOIN r USING (user_id)
      GROUP BY l.event_id, l.user_id, l.t
    )
    SELECT event_id, user_id, t AS ts_us,
           best[3] AS nearest_error_id,
           CAST(best[1] AS BIGINT) AS gap_us
    FROM cand
""")
def join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-key join (new r6) — merge_asof(direction='nearest'): for
    every non-error event, the user's CLOSEST error event in time,
    either direction, ties to the earlier one then the smaller id. The
    two-sided sibling of join_asof (backward) and join_asof_forward —
    sensor-alignment and blame-assignment pipelines want nearest, not
    latest-before.

    Spark-first: ONE union + ONE user-partitioned sort carries BOTH
    directions — a running max(struct(t, -id)) over preceding rows
    yields the best at-or-before error (max t, then MIN id via the
    negated field — matching the oracle's min-ROW tie order) and a
    running min(struct(t, id)) over following rows the best strictly-
    after; a projection picks the smaller gap. No join against the
    error table at all, so there is no per-user quadratic blowup —
    the oracle states ground truth with exactly that quadratic
    LEFT JOIN + argmin, proving the window rewrite lossless.

    Scale shape: one exchange on user_id, one sort, two frame
    aggregates over it, pure projection after — the same
    shuffle-budget as join_asof; 100 TB of events pay one user-keyed
    shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("t"),
        (F.col("event_type") == "error").alias("is_err"),
    )
    merged = ev.select(
        "event_id",
        "user_id",
        "t",
        # errors sort BEFORE events at equal t: an error exactly at the
        # event's timestamp is a gap-0 backward candidate
        F.when(F.col("is_err"), 0).otherwise(1).alias("src"),
        F.when(
            F.col("is_err"), F.struct(F.col("t"), (-F.col("event_id")).alias("nid"))
        ).alias("eb"),
        F.when(
            F.col("is_err"), F.struct(F.col("t"), F.col("event_id").alias("id"))
        ).alias("ef"),
    )
    order = [F.col("t"), F.col("src"), F.col("event_id")]
    w_back = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    scored = merged.select(
        "event_id",
        "user_id",
        "t",
        "src",
        F.max("eb").over(w_back).alias("back"),
        F.min("ef").over(w_fwd).alias("fwd"),
    ).filter(F.col("src") == 1)
    gap_back = F.col("t") - F.col("back.t")
    gap_fwd = F.col("fwd.t") - F.col("t")
    use_back = F.col("fwd").isNull() | (
        F.col("back").isNotNull() & (gap_back <= gap_fwd)
    )
    return scored.select(
        "event_id",
        "user_id",
        F.col("t").alias("ts_us"),
        F.when(use_back, -F.col("back.nid"))
        .otherwise(F.col("fwd.id"))
        .alias("nearest_error_id"),
        F.when(use_back, gap_back).otherwise(gap_fwd).cast("bigint").alias("gap_us"),
    )
