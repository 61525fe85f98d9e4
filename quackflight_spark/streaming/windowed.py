"""Event-time windowed aggregations — SURVEY.md §2.9 beyond-reference
extensions (the reference's streaming story is client polling; watermarks
and windows are our upgrade path, per SURVEY §2.9 note).

Each operator is the *batch-equivalent semantics* of the Structured
Streaming aggregation (same F.window/session_window expressions work under
readStream + withWatermark — proven in tests/test_streaming.py, which runs
the same aggregation through an actual streaming query and asserts
equality with these batch results). Oracles emulate the window assignment
in plain SQL.

Scale: window aggs shuffle on (window, key) with map-side partial aggs;
sliding windows multiply rows by size/slide before the shuffle — keep
ratios small (ours is 2×).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table
from quackflight_spark.staging import stage_root


@query("stream_tumbling", oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
""")
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window per event_type."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@query("stream_sliding", oracle="""
    WITH starts AS (
      SELECT e.*, time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP))
               - INTERVAL (s.i * 30) MINUTE AS window_start
      FROM events e, (SELECT unnest(range(0, 2)) AS i) s
    )
    SELECT window_start, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM starts
    WHERE CAST(ts AS TIMESTAMP) >= window_start
      AND CAST(ts AS TIMESTAMP) < window_start + INTERVAL 1 HOUR
    GROUP BY 1
""")
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1 hour size, 30 min slide (each event lands in 2
    windows — the oracle enumerates both candidate starts per event)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


@query("stream_session", oracle="""
    WITH o AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM o
    )
    SELECT user_id, min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, session_id
""")
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via F.session_window — the
    streaming-native sessionization operator, batch-evaluated. The oracle
    is the classic gaps-and-islands rewrite (lag + running sum), which is
    also what we'd use on engines without session_window."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query("stream_watermark_late", oracle="""
    WITH m AS (
      SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             max(CAST(ts AS TIMESTAMP)) OVER (
               PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_seen
      FROM events
    ),
    ot AS (
      SELECT * FROM m
      WHERE max_seen IS NULL OR ts >= max_seen - INTERVAL 10 MINUTE
    )
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type, CAST(count(*) AS BIGINT) AS n
    FROM ot GROUP BY 1, 2
""")
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data handling: tumbling window count that *drops* events
    arriving later than the 10-minute watermark would allow. Batch
    emulation: an event is late if an event ≥10min newer was already seen
    (by event_id arrival order) in its key's stream; real streaming run in
    tests/test_streaming.py matches this semantics under availableNow.
    Oracle-BACKED since r4 (was rows-only): the batch emulation is a
    deterministic window + filter DuckDB replays exactly — the weaker
    rows-only check was an oversight, not a necessity."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    # max event-time seen so far in arrival order (event_id), per type
    w = W.partitionBy("event_type").orderBy("event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    max_seen = F.max("ts").over(w)
    on_time = e.withColumn("late", F.col("ts") < max_seen - F.expr("INTERVAL 10 MINUTES")).filter(
        ~F.coalesce(F.col("late"), F.lit(False))
    )
    return (
        on_time.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


@query("stream_dedup", oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           value, props
    FROM events
""")
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay-safe deduplication: at-least-once delivery made exactly-once.

    Input = the events feed unioned with a full replay of itself (the
    retry/replay failure mode of at-least-once sources); output = one row
    per event_id, which must equal the original table exactly — hence the
    exact oracle. Streaming form is dropDuplicatesWithinWatermark on the
    same key (parity asserted in tests/test_streaming.py); the state
    store holds only ids inside the watermark horizon, so state is
    bounded at any throughput. Batch form: one shuffle on event_id;
    duplicate rows are identical, so survivor choice is deterministic.
    """
    e = load_table(spark, sf_dir, "events")
    replayed = e.union(e)  # simulated duplicate delivery
    return replayed.dropDuplicates(["event_id"])


EVENTS_LAYOUT_ROOT = stage_root("events_layout")  # derived data; fixtures untouched
ROLLUP_FROM, ROLLUP_TO = "2024-01-08", "2024-01-14"


@query("stream_interval_join", oracle="""
    SELECT c.event_id AS click_id, e.event_id AS error_id, c.user_id,
           CAST(date_diff('second', CAST(c.ts AS TIMESTAMP),
                          CAST(e.ts AS TIMESTAMP)) AS BIGINT) AS lag_sec
    FROM events c JOIN events e
      ON c.user_id = e.user_id
     AND e.ts >= c.ts
     AND e.ts < c.ts + INTERVAL 10 MINUTE
    WHERE c.event_type = 'click' AND e.event_type = 'error'
""")
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-interval join, batch-equivalent semantics:
    every error within 10 minutes AFTER a click by the same user.

    Under Structured Streaming the identical join condition runs as a
    watermarked stream-stream inner join (state bounded by watermark +
    interval width; proven equal to this batch form in
    tests/test_streaming.py::test_streaming_interval_join_equals_batch).
    Batch plan: equi-join keyed on user_id with the time bound as a
    residual predicate — shuffles on user_id only, never on time. At
    100 TB the state store holds ≤ (watermark + 10 min) of each side per
    key; the batch backfill form here is how the same pipeline reprocesses
    history."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("error_ts"),
    )
    return (
        clicks.join(
            errors,
            (F.col("user_id") == F.col("e_user_id"))
            & (F.col("error_ts") >= F.col("click_ts"))
            & (F.col("error_ts") < F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            "click_id",
            "error_id",
            "user_id",
            (F.unix_timestamp("error_ts") - F.unix_timestamp("click_ts")).alias("lag_sec"),
        )
    )


def events_build_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events as a date-partitioned parquet layout (one
    directory per event_date) — the hypertable/time-chunk pattern.
    Build-once per corpus; at 100 TB this is how the events stream lands
    from ingest (writeStream partitionBy(event_date)), and every
    time-ranged query afterwards prunes to its date directories."""
    import hashlib
    import os

    path = f"{EVENTS_LAYOUT_ROOT}/{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        e = load_table(spark, sf_dir, "events")
        (
            e.withColumn("event_date", F.to_date("ts"))
            .repartition(F.col("event_date"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
    return path


@query("rollup_time_partitioned", oracle=f"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE)
          BETWEEN DATE '{ROLLUP_FROM}' AND DATE '{ROLLUP_TO}'
    GROUP BY 1, 2
""")
def rollup_time_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup over a date range, read from the date-partitioned
    layout: the BETWEEN on event_date is a PARTITION filter, so the scan
    opens only the 7 requested day-directories out of 30 — IO scales with
    the queried range, not the table (the hypertable/continuous-aggregate
    access pattern; PartitionFilters asserted in tests/test_plans.py).
    Aggregation is the usual two-phase hash agg on (hour, type)."""
    path = events_build_layout(spark, sf_dir)
    e = spark.read.parquet(path).filter(
        F.col("event_date").between(F.lit(ROLLUP_FROM).cast("date"), F.lit(ROLLUP_TO).cast("date"))
    )
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


GAPFILL_DAY = "2024-01-10"


@query("timeseries_gapfill", oracle=f"""
    WITH e AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS t, value FROM events
      WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) = DATE '{GAPFILL_DAY}'
    ),
    agg AS (
      SELECT event_type, date_trunc('hour', t) AS hour_start,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM e GROUP BY 1, 2
    ),
    grid AS (
      SELECT DISTINCT e.event_type, g.h AS hour_start
      FROM e, (SELECT unnest(generate_series(
                 TIMESTAMP '{GAPFILL_DAY} 00:00:00',
                 TIMESTAMP '{GAPFILL_DAY} 23:00:00',
                 INTERVAL 1 HOUR)) AS h) g
    )
    SELECT grid.event_type, grid.hour_start,
           COALESCE(agg.n, 0) AS n,
           COALESCE(last_value(agg.total IGNORE NULLS) OVER (
               PARTITION BY grid.event_type ORDER BY grid.hour_start), 0.0
           ) AS total_ff
    FROM grid LEFT JOIN agg
      ON grid.event_type = agg.event_type AND grid.hour_start = agg.hour_start
""")
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill + forward-fill over one day of events — the
    hypertable `time_bucket_gapfill`/`locf` pattern: build the dense
    (event_type × hour) grid, left-join the sparse hourly rollup, carry
    the last observed total forward into empty hours (0 before the first
    observation).

    Scale shape: the grid is |keys| × |buckets| rows built from a
    per-key `sequence()` explode — never materialized on the driver —
    and the fill is a running `last(ignorenulls)` window per key, one
    shuffle on the same key as the rollup agg.  At 100 TB the day filter
    rides the date-partitioned layout (see rollup_time_partitioned), so
    IO is one day's directory regardless of table size."""
    from pyspark.sql import Window as W

    day_start = F.lit(f"{GAPFILL_DAY} 00:00:00").cast("timestamp")
    day_end = F.lit(f"{GAPFILL_DAY} 23:00:00").cast("timestamp")
    e = load_table(spark, sf_dir, "events").filter(
        F.to_date("ts") == F.lit(GAPFILL_DAY).cast("date")
    )
    agg = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    grid = e.select("event_type").distinct().select(
        "event_type",
        F.explode(F.sequence(day_start, day_end, F.expr("interval 1 hour"))).alias(
            "hour_start"
        ),
    )
    w = W.partitionBy("event_type").orderBy("hour_start").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return grid.join(agg, on=["event_type", "hour_start"], how="left").select(
        "event_type",
        "hour_start",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce(F.last("total", ignorenulls=True).over(w), F.lit(0.0)).alias(
            "total_ff"
        ),
    )


SESSION_GAP_MIN = 30  # inactivity gap closing a session


@query("events_sessionize", oracle=f"""
    WITH flagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           CAST(sum(new_session) OVER (PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
             AS session_idx
    FROM flagged
""")
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: assign every event a per-user session index,
    where a gap of more than SESSION_GAP_MIN minutes of inactivity starts
    a new session — the classic lag-flag-cumsum form (the batch analog of
    stream_session's session_window, over the full history instead of a
    watermarked stream).

    One shuffle on user_id serves both windows (same partitioning and
    ordering, so Catalyst plans a single exchange + sort). At 100 TB a
    mega-user is the skew risk; the standard mitigation is pre-bucketing
    the event log by (user_id, coarse time range) so one reducer never
    holds a user's full history."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = SESSION_GAP_MIN * 60
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        e.withColumn("new_session", new_session)
        .withColumn(
            "session_idx",
            F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("int"),
        )
        .select("event_id", "user_id", "session_idx")
    )


@query("events_ltv_triangle", oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE)
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort_week
    ),
    rev AS (
      SELECT f.cohort_week,
             CAST((CAST(date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS DATE)
                   - f.cohort_week) // 7 AS INT) AS age_week,
             CAST(sum(CAST(e.value AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_week, age_week,
             CAST(sum(cents) OVER (PARTITION BY cohort_week ORDER BY age_week
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      FROM rev
    )
    SELECT c.cohort_week, c.age_week, s.cohort_size, c.cum_cents,
           CAST(c.cum_cents AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
             AS ltv_cents_per_user
    FROM cum c JOIN sizes s USING (cohort_week)
""")
def events_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle (new r6) — cumulative revenue per user by
    (first-seen week, weeks-since-first) — the revenue sibling of
    retention_cohorts and the table every growth-finance model (payback
    window, LTV/CAC) is fit on. Cells are OBSERVED (cohort, age) pairs;
    the running sum is over observed ages, so each emitted cell carries
    the true cumulative value at that age.

    Exactness: revenue is integer cents end-to-end; week buckets are
    date_trunc('week') (Monday start in both engines) and ages exact
    integer day-diffs // 7; the only double is the final per-user LTV —
    one division of two identical exact integers.

    Scale shape: one user-keyed first-seen agg (map-side combined), one
    user-keyed join co-partitioned with it, one (cohort, age) rollup
    that is calendar-bounded (|weeks|² cells regardless of corpus
    size), and the running sum + size join run over that tiny triangle
    partitioned by cohort."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("datediff(CAST(date_trunc('week', ts) AS DATE), cohort_week)")
            .cast("int")
            .alias("dd"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .select(
            "cohort_week",
            F.expr("dd DIV 7").cast("int").alias("age_week"),
            "cents",
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cum_cents", F.sum("cents").over(w).cast("bigint"))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "age_week",
        "cohort_size",
        "cum_cents",
        (F.col("cum_cents").cast("double") / F.col("cohort_size").cast("double"))
        .alias("ltv_cents_per_user"),
    )


@query("retention_cohorts", oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT cohort_day, CAST(day_offset AS INT) AS day_offset,
           count(*) AS n_users
    FROM active
    GROUP BY cohort_day, day_offset
""")
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen day, counted
    on each later day-offset they were active — the product-analytics
    rollup behind every retention curve.

    Three map-side-combinable shuffles, all keyed on user_id or the tiny
    (cohort, offset) pair: per-user first-day agg, the distinct
    (user, offset) projection, and the final count. The firsts table is
    |users| rows of (bigint, date) — at 100 TB it is the materialized
    user-dimension one join side, co-partitioned with the event log on
    user_id so the join reuses the first agg's exchange."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return active.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


FUNNEL_STAGES = ("view", "click", "purchase")


@query("events_funnel", oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.ts1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS ts3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.ts2
      GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 'view' AS stage, count(*) AS n_users FROM s1
      UNION ALL SELECT 'view>click', count(*) FROM s2
      UNION ALL SELECT 'view>click>purchase', count(*) FROM s3
    )
""")
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel completion: users who did view, THEN click, THEN
    purchase (each stage strictly after the previous one's first
    occurrence), counted per stage — the product-analytics funnel query.

    Stage N is a per-user min-timestamp aggregate of the events matching
    stage N's type after the user's stage-N-1 time: each of the three
    rounds is one map-side-combined agg plus a join on user_id, and every
    round's input is filtered by event_type BEFORE the shuffle (predicate
    reaches the scan), so the shuffled volume is one stage's events, not
    the log. Co-partitioning the log on user_id collapses all three
    rounds onto one exchange at scale. The final stage counts are
    single-row aggs unioned driver-free."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")

    def stage_after(prev: DataFrame, etype: str, prev_ts: str, out_ts: str) -> DataFrame:
        ev = e.filter(F.col("event_type") == etype)
        if prev is None:
            return ev.groupBy("user_id").agg(F.min("ts").alias(out_ts))
        return (
            ev.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    s1 = stage_after(None, "view", "", "ts1")
    s2 = stage_after(s1, "click", "ts1", "ts2")
    s3 = stage_after(s2, "purchase", "ts2", "ts3")
    rows = [
        s1.agg(F.lit("view").alias("stage"), F.count(F.lit(1)).alias("n_users")),
        s2.agg(F.lit("view>click").alias("stage"), F.count(F.lit(1)).alias("n_users")),
        s3.agg(
            F.lit("view>click>purchase").alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000  # windowFunnel(24h)


@query("events_funnel_windowed", oracle=f"""
    WITH e AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_id
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (
      SELECT *, max(CASE WHEN event_type = 'view' THEN t END) OVER
        (PARTITION BY user_id ORDER BY t, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
      FROM e
    ),
    s2 AS (
      SELECT *, max(CASE WHEN event_type = 'click' THEN lv END) OVER
        (PARTITION BY user_id ORDER BY t, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vc
      FROM s1
    ),
    u AS (
      SELECT user_id,
        max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
        max(CASE WHEN event_type = 'click'
                  AND lv >= t - {FUNNEL_WINDOW_US} THEN 1 ELSE 0 END) AS l2,
        max(CASE WHEN event_type = 'purchase'
                  AND vc >= t - {FUNNEL_WINDOW_US} THEN 1 ELSE 0 END) AS l3
      FROM s2 GROUP BY user_id
    )
    SELECT level, n_users FROM (
      SELECT 1 AS level, CAST(sum(l1) AS BIGINT) AS n_users FROM u
      UNION ALL SELECT 2, CAST(sum(l2) AS BIGINT) FROM u
      UNION ALL SELECT 3, CAST(sum(l3) AS BIGINT) FROM u
    )
""")
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse windowFunnel-compatible TIME-CONSTRAINED funnel (new
    r6) — unlike events_funnel (whose stages may be months apart), a
    chain only counts if ALL its events fit inside a 24 h window
    anchored at the chain's first event: level ≥ 2 needs a view<click
    pair with click ≤ view+W, level ≥ 3 a view<click<purchase triple
    with purchase ≤ view+W. Reference semantics: chsql/ClickHouse
    windowFunnel(window)(ts, cond1, cond2, cond3).

    The naive form is a per-user sliding search over candidate chain
    starts; the exact closed form used here is two RUNNING MAXES over
    the per-user event sequence: lv(row) = latest view strictly before
    the row — the OPTIMAL chain start for any click at that row (later
    start = larger allowed end) — and vc(row) = max over preceding
    clicks of THEIR lv, the optimal (view, click) prefix for a purchase
    at the row. A purchase completes a chain iff vc ≥ t − W; greediness
    is exact because maximizing the chain-start timestamp maximizes the
    window end. Equal-timestamp events order by event_id (the
    ClickHouse spec leaves same-second order undefined; this pins it
    deterministically in both engines). All comparisons are exact
    epoch-microsecond BIGINTs.

    Scale shape: both running maxes and the final flag-agg are
    partitioned BY USER (two Window nodes sharing one sort + one
    exchange — plan-asserted no Exchange SinglePartition); the level
    pivot is three 1-row aggregates. 100 TB of events never leave
    user-partitioned processing."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("t"),
            "event_id",
        )
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s1 = e.withColumn(
        "lv",
        F.max(F.when(F.col("event_type") == "view", F.col("t"))).over(wprev),
    )
    s2 = s1.withColumn(
        "vc",
        F.max(F.when(F.col("event_type") == "click", F.col("lv"))).over(wprev),
    )
    w = F.lit(FUNNEL_WINDOW_US)
    u = s2.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("l1"),
        F.max(
            F.when(
                (F.col("event_type") == "click") & (F.col("lv") >= F.col("t") - w),
                1,
            ).otherwise(0)
        ).alias("l2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("vc") >= F.col("t") - w),
                1,
            ).otherwise(0)
        ).alias("l3"),
    )
    rows = [
        u.agg(
            F.lit(lvl).cast("int").alias("level"),
            F.sum(col).cast("bigint").alias("n_users"),
        )
        for lvl, col in ((1, "l1"), (2, "l2"), (3, "l3"))
    ]
    return rows[0].unionByName(rows[1]).unionByName(rows[2])


@query("timeseries_interpolate", oracle=f"""
    WITH e AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS t, value FROM events
      WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) = DATE '{GAPFILL_DAY}'
    ),
    agg AS (
      SELECT event_type, date_trunc('hour', t) AS hour_start,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM e GROUP BY 1, 2
    ),
    grid AS (
      SELECT DISTINCT e.event_type, g.h AS hour_start
      FROM e, (SELECT unnest(generate_series(
                 TIMESTAMP '{GAPFILL_DAY} 00:00:00',
                 TIMESTAMP '{GAPFILL_DAY} 23:00:00',
                 INTERVAL 1 HOUR)) AS h) g
    ),
    j AS (
      SELECT grid.event_type, grid.hour_start, agg.n, agg.cents,
             CAST(epoch(grid.hour_start) AS BIGINT) AS h
      FROM grid LEFT JOIN agg
        ON grid.event_type = agg.event_type AND grid.hour_start = agg.hour_start
    ),
    w AS (
      SELECT *,
             last_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY hour_start
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             last_value(cents IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY hour_start
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             first_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY hour_start
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt,
             first_value(cents IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY hour_start
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
      FROM j
    )
    SELECT event_type, hour_start,
           COALESCE(n, 0) AS n,
           CASE
             WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE) / 100.0
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               (CAST(pv AS DOUBLE)
                + CAST(nv - pv AS DOUBLE)
                  * (CAST(h - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))) / 100.0
           END AS v_interp
    FROM w
""")
def timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill + LINEAR interpolation over one day of events —
    the hypertable `time_bucket_gapfill`/`interpolate` pattern: dense
    (event_type × hour) grid, sparse hourly rollup, and each missing
    hour lerped between its nearest observed neighbours (NULL outside
    the observed range, matching the hypertable semantics).

    Exactness design: the hourly metric is an integer (cents from a
    DECIMAL sum), hour positions are integer epoch seconds, and the
    lerp is written with the identical IEEE expression tree on both
    engines — integer-derived doubles, one division, one multiply, one
    add — so the oracle compare is bit-exact, no tolerance needed.

    Scale shape: same as timeseries_gapfill — one shuffle on the
    grouping key, two running-window passes over the (key × 24) grid
    (tiny relative to the input), day filter rides the date-partitioned
    layout."""
    from pyspark.sql import Window as W

    day_start = F.lit(f"{GAPFILL_DAY} 00:00:00").cast("timestamp")
    day_end = F.lit(f"{GAPFILL_DAY} 23:00:00").cast("timestamp")
    e = load_table(spark, sf_dir, "events").filter(
        F.to_date("ts") == F.lit(GAPFILL_DAY).cast("date")
    )
    agg = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents"),
    )
    grid = e.select("event_type").distinct().select(
        "event_type",
        F.explode(F.sequence(day_start, day_end, F.expr("interval 1 hour"))).alias(
            "hour_start"
        ),
    )
    j = grid.join(agg, on=["event_type", "hour_start"], how="left").withColumn(
        "h", F.unix_timestamp("hour_start")
    )
    past = W.partitionBy("event_type").orderBy("hour_start").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    future = W.partitionBy("event_type").orderBy("hour_start").rowsBetween(
        1, W.unboundedFollowing
    )
    observed_h = F.when(F.col("cents").isNotNull(), F.col("h"))
    w = (
        j.withColumn("pt", F.last(observed_h, ignorenulls=True).over(past))
        .withColumn("pv", F.last("cents", ignorenulls=True).over(past))
        .withColumn("nt", F.first(observed_h, ignorenulls=True).over(future))
        .withColumn("nv", F.first("cents", ignorenulls=True).over(future))
    )
    lerp = (
        F.col("pv").cast("double")
        + (F.col("nv") - F.col("pv")).cast("double")
        * ((F.col("h") - F.col("pt")).cast("double")
           / (F.col("nt") - F.col("pt")).cast("double"))
    ) / 100.0
    return w.select(
        "event_type",
        "hour_start",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.when(F.col("cents").isNotNull(), F.col("cents").cast("double") / 100.0)
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), lerp)
        .alias("v_interp"),
    )


ANOMALY_K = 3.0  # MAD multiplier


@query("events_anomaly_mad", oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, median(n) AS med FROM hourly GROUP BY 1
    ),
    dev AS (
      SELECT h.*, m.med, abs(h.n - m.med) AS adev
      FROM hourly h JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type, d.hour_start, d.n, d.med, m2.mad
    FROM dev d JOIN mad m2 USING (event_type)
    WHERE d.adev > {ANOMALY_K} * m2.mad
""")
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume-anomaly detection: flag hours whose event count
    deviates from the per-type median by more than K median-absolute-
    deviations. Median/MAD (not mean/stddev) so the baseline itself is
    not dragged by the outliers being hunted — the standard robust
    monitor for ingest-volume regressions.

    Determinism: counts are integers and both engines' exact medians of
    integers land on .0/.5, so every comparison is exact — no tolerance.
    Scale shape: the hourly rollup collapses the corpus to |types| ×
    |hours| rows in one shuffle; the two median passes and the flag join
    run on that tiny frame (broadcast), never on raw events."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        # |types| x |hours| rows; pinning it keeps the corpus scan+rollup
        # from re-running once per downstream branch (med, dev, mad);
        # lazy (r12) — the first downstream job materializes it
        .localCheckpoint(eager=False)
    )
    med = hourly.groupBy("event_type").agg(F.median("n").alias("med"))
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("n") - F.col("med"))
    ).localCheckpoint(eager=False)
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > ANOMALY_K * F.col("mad"))
        .select("event_type", "hour_start", "n", "med", "mad")
    )


SEVERITY = {"view": 1, "click": 2, "signup": 3, "purchase": 4, "error": 5}


@query("stream_enrich_join", oracle="""
    SELECT event_id, event_type,
           CASE event_type
             WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'signup' THEN 3
             WHEN 'purchase' THEN 4 WHEN 'error' THEN 5
           END AS severity,
           value
    FROM events
    WHERE event_id % 13 = 0
""")
def stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: a streaming fact feed joined to a
    static dimension (the severity lookup) — the stateless streaming
    join class (no watermark, no state store; the dim broadcasts into
    every micro-batch). Batch parity is exact, so the oracle is the
    batch join.

    At 100 TB-rate streams this is the standard enrichment shape: the
    dim refreshes by replacing the static frame between restarts (or
    via a slowly-changing broadcast), while the stream side never
    shuffles — the join is map-side in each micro-batch."""
    import hashlib

    from quackflight_spark.streaming.source import (
        drain_to_memory,
        stage_events_stream,
    )

    dim = spark.createDataFrame(
        [(k, v) for k, v in SEVERITY.items()], "event_type string, severity int"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stream = (
        stage_events_stream(spark, sf_dir, "enrich")
        .filter("event_id % 13 = 0")
        .select("event_id", "event_type", "value")
        .join(F.broadcast(dim), "event_type")
        .select("event_id", "event_type", "severity", "value")
    )
    return drain_to_memory(spark, stream, f"enrich_{tag}", "append")


WAU_DAYS = 7


@query("events_dau_wau", oracle=f"""
    WITH ud AS (
      SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, user_id
      FROM events
    ),
    dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
    cover AS (
      SELECT CAST(ud.d + (g.i || ' days')::INTERVAL AS DATE) AS target_d,
             ud.user_id
      FROM ud, (SELECT unnest(range(0, {WAU_DAYS})) AS i) g
    ),
    wau AS (
      SELECT target_d AS d, count(DISTINCT user_id) AS wau
      FROM cover GROUP BY 1
    )
    SELECT dau.d, CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau USING (d)
""")
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-{WAU_DAYS}-day WAU / stickiness per day.

    Windowed COUNT(DISTINCT) does not exist as a window function (in
    either engine) — the scalable rewrite is coverage-explode: each
    (user, active-day) row contributes to the {WAU_DAYS} target days it
    keeps the user "active" for, then a plain groupBy-distinct per
    target day. Shuffle volume is |user-days| x {WAU_DAYS} compact rows
    — linear, partition-friendly, no per-day self-joins. Days at the
    range edge aggregate only the fixture's observed days (both engines
    identically), so the oracle is exact."""
    ud = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        # |users| x |days| frame feeding both the DAU count and the
        # WAU coverage-explode — pin it so the events scan+distinct
        # runs once, not once per branch (lazy r12: first job
        # materializes)
        .localCheckpoint(eager=False)
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    cover = ud.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), WAU_DAYS - 1))
        ).alias("d"),
        "user_id",
    )
    wau = cover.groupBy("d").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "d")
        .select(
            "d",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


@query("events_transition_matrix", oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    totals AS (
      SELECT from_type, sum(n) AS total FROM pairs GROUP BY 1
    )
    SELECT p.from_type, p.to_type, CAST(p.n AS BIGINT) AS n,
           round(CAST(p.n AS DOUBLE) / t.total, 6) AS p
    FROM pairs p JOIN totals t USING (from_type)
""")
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current type). The sequencing is one
    lead() window per user (ts + event_id tie-break, deterministic),
    the matrix a |types|² count table row-normalized via a broadcast
    totals join — the funnel/next-action analysis primitive.

    Scale shape: one shuffle on user_id for the window, then map-side
    combinable pair counts; the matrix and totals are
    vocabulary-sized."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = (
        seq.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        # |types|^2 matrix feeding both the totals agg and the final
        # join — pin it so the window+count pipeline runs once (lazy
        # r12: first job materializes)
        .localCheckpoint(eager=False)
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("total"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("total"), 6).alias("p"),
        )
    )


GROUP_TOP_K = 3


@query("topk_per_group", oracle=f"""
    WITH c AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT day, event_type, n,
             row_number() OVER (PARTITION BY day
               ORDER BY n DESC, event_type) AS rn
      FROM c
    )
    SELECT day, event_type, n, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= {GROUP_TOP_K}
""")
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (here: the {GROUP_TOP_K} busiest event types per
    day) — the grouped companion of the fused global top-k
    (orderby_desc_limit). Scale shape: the heavy lifting is ONE
    partial-aggregated count shuffle on (day, event_type); the rank
    window then partitions by day over the already-tiny per-day
    aggregate — every partition sorts |event_types| rows, never raw
    events, and there is no single-partition stage."""
    from pyspark.sql import Window as W

    c = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("ts").cast("date").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = W.partitionBy("day").orderBy(F.desc("n"), "event_type")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= GROUP_TOP_K)
        .select("day", "event_type", "n", "rn")
    )


RFM_BUCKETS = 4


def _ntile_distributed(df: DataFrame, cols: list, out_col: str, buckets: int) -> DataFrame:
    """Exact NTILE(buckets) OVER (ORDER BY cols) with no single-task sort.

    A bare `W.orderBy(...)` window funnels the whole frame through ONE
    reducer (Exchange SinglePartition + global Sort) — the scale-killer
    class at 10^8-10^9 users. Instead: (1) range-partition on the order
    key (the same sampled-boundary exchange a global sort uses, but the
    downstream work stays parallel); (2) per-partition row_number — a
    Window partitioned by the physical partition id, so every task sorts
    only its slice; (3) per-partition counts (one tiny agg, ≤P rows,
    bounded driver collect) → cumulative offsets broadcast back; (4) the
    exact ntile bucket formula from global rank r and total n:
    the first n%B buckets hold n//B+1 rows, the rest n//B. Output is
    bit-identical to the window ntile because `cols` ends in a unique
    tie-break key, making the global order total.
    """
    spark = df.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    from pyspark.sql import Window as W

    part = (
        df.repartitionByRange(p, *[F.col(c).asc() for c in cols])
        .withColumn("_pid", F.spark_partition_id())
        # pin so the counts pass and the rank pass see one pid
        # assignment — lazy (r12) keeps the same single planned RDD,
        # materialized by the offsets collect in one fused job
        .localCheckpoint(eager=False)
    )
    rows = sorted(
        (r["_pid"], r["_c"])
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).collect()
    )  # ≤P rows — bounded collect
    n = sum(c for _, c in rows)
    offs, acc = [], 0
    for pid, c in rows:
        offs.append((pid, acc))
        acc += c
    off_df = spark.createDataFrame(offs, "`_pid` INT, `_off` BIGINT")
    q, rem = divmod(n, buckets)
    qs = max(q, 1)  # q=0 only when n<buckets; the when() below never divides then
    r = F.col("_off") + F.row_number().over(W.partitionBy("_pid").orderBy(*cols))
    bucket = F.when(
        r <= rem * (q + 1), F.floor((r + F.lit(q)) / F.lit(q + 1))
    ).otherwise(rem + F.floor((r - rem * (q + 1) + qs - 1) / F.lit(qs)))
    return (
        part.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, bucket.cast("int"))
        .drop("_pid", "_off")
    )


def _ntile_distributed_arrow(df: DataFrame, cols: list, out_col: str,
                             buckets: int) -> DataFrame:
    """The r4-verdict stretch variant of _ntile_distributed: ranks are
    computed IN the materialization pass instead of by a Window
    afterwards. repartitionByRange → sortWithinPartitions (JVM sort) →
    mapInArrow appends (_pid, _r) with a per-partition running counter
    (order-preserving batch iteration; ~zero-cost Python: one arange
    per Arrow batch) → localCheckpoint pins the assignment. The later
    offsets join then needs NO sort at all — the post-checkpoint stage
    is a broadcast join + map, where the Window form re-sorts every
    partition after the checkpoint.

    Same bucket arithmetic and tie-break contract as
    _ntile_distributed (property-tested bit-identical). MEASURED
    OUTCOME (PERF.md r5 stretch note): parity at 1M rows (1.31 vs
    1.36 s) but 34% SLOWER at 10M (3.50 vs 2.62 s, local[32]) — the
    JVM→Arrow→JVM round-trip through Python costs more than the saved
    post-checkpoint Window re-sort. The Window form stays the default;
    this variant is kept as the documented investigation result and a
    template for engines where the checkpoint pass is the bottleneck."""
    import pyarrow as pa

    spark = df.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def add_rank(batches):
        pid = None
        seen = 0
        for batch in batches:
            if pid is None:
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
            n = batch.num_rows
            arrs = batch.columns + [
                pa.array([pid] * n, pa.int32()),
                pa.array(range(seen + 1, seen + n + 1), pa.int64()),
            ]
            seen += n
            yield pa.RecordBatch.from_arrays(
                arrs, names=batch.schema.names + ["_pid", "_r"]
            )

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    schema = StructType(
        df.schema.fields
        + [StructField("_pid", IntegerType()), StructField("_r", LongType())]
    )
    part = (
        df.repartitionByRange(p, *[F.col(c).asc() for c in cols])
        .sortWithinPartitions(*cols)
        .mapInArrow(add_rank, schema=schema)
        .localCheckpoint(eager=False)
    )
    rows = sorted(
        (r["_pid"], r["_c"])
        for r in part.groupBy("_pid").agg(F.max("_r").alias("_c")).collect()
    )  # ≤P rows; max(_r) = partition count since _r is 1..count
    n = sum(c for _, c in rows)
    offs, acc = [], 0
    for pid, c in rows:
        offs.append((pid, acc))
        acc += c
    off_df = spark.createDataFrame(offs, "`_pid` INT, `_off` BIGINT")
    q, rem = divmod(n, buckets)
    qs = max(q, 1)
    r = F.col("_off") + F.col("_r")
    bucket = F.when(
        r <= rem * (q + 1), F.floor((r + F.lit(q)) / F.lit(q + 1))
    ).otherwise(rem + F.floor((r - rem * (q + 1) + qs - 1) / F.lit(qs)))
    return (
        part.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, bucket.cast("int"))
        .drop("_pid", "_off", "_r")
    )


def _ntile_distributed_long(long: DataFrame, buckets: int) -> DataFrame:
    """Exact NTILE over a LONG-format frame — one bucket assignment per
    (metric_id, row), every metric in ONE barrier.

    Same construction as _ntile_distributed, fused across metrics (the
    r4-verdict events_rfm optimization): one range partition on
    (metric_id, value, user_id), one localCheckpoint to pin partition
    identity, one bounded ≤P×M-row counts collect; offsets and totals
    are computed PER METRIC (a metric's rows may span several range
    partitions, and a partition may straddle two metrics — the window
    below partitions by (_pid, metric_id) so both cases rank
    correctly). Bucket formula identical to _ntile_distributed with n
    the per-metric total carried on the broadcast row."""
    spark = long.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    from pyspark.sql import Window as W

    part = (
        long.repartitionByRange(
            p,
            F.col("metric_id").asc(), F.col("value").asc(), F.col("user_id").asc(),
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    rows = sorted(
        ((r["metric_id"], r["_pid"]), r["_c"])
        for r in part.groupBy("_pid", "metric_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )  # ≤ P × n_metrics rows — bounded collect
    totals: dict[int, int] = {}
    for (m, _), c in rows:
        totals[m] = totals.get(m, 0) + c
    offs, acc = [], {}
    for (m, pid), c in rows:
        offs.append((pid, m, acc.get(m, 0), totals[m]))
        acc[m] = acc.get(m, 0) + c
    off_df = spark.createDataFrame(
        offs, "`_pid` INT, `metric_id` INT, `_off` BIGINT, `_n` BIGINT"
    )
    r = F.col("_off") + F.row_number().over(
        W.partitionBy("_pid", "metric_id").orderBy("value", "user_id")
    )
    q = F.floor(F.col("_n") / buckets)
    rem = F.col("_n") % buckets
    qs = F.greatest(q, F.lit(1))  # q=0 only when n<buckets; then the
    #                               when() branch below never divides
    bucket = F.when(
        r <= rem * (q + 1), F.floor((r + q) / (q + 1))
    ).otherwise(rem + F.floor((r - rem * (q + 1) + qs - 1) / qs))
    return (
        part.join(F.broadcast(off_df), ["_pid", "metric_id"])
        .withColumn("bucket", bucket.cast("int"))
        .drop("_pid", "_off", "_n")
    )


@query("events_rfm", oracle=f"""
    WITH agg AS (
      SELECT user_id,
             max(CAST(ts AS TIMESTAMP)) AS last_ts,
             CAST(count(*) AS BIGINT) AS freq,
             sum(CAST(value AS DECIMAL(18,2))) AS monetary_dec
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY last_ts, user_id) AS INT)
               AS r_score,
           CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY freq, user_id) AS INT)
               AS f_score,
           CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY monetary_dec, user_id) AS INT)
               AS m_score,
           freq, CAST(monetary_dec AS DOUBLE) AS monetary
    FROM agg
""")
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency/frequency/monetary quartile
    scores — the classic customer-value matrix. One aggregate shuffle on
    user_id, then ONE fused distributed ntile pass (r5; previously three
    sequential _ntile_distributed rounds = three checkpoint barriers):
    the three metrics stack long-format as (metric_id, value double,
    user_id) — epoch-micros for recency, the exact-in-double bigint for
    frequency, the decimal-exact sum for monetary; all three conversions
    are order-preserving and injective below 2^53, and ntile depends
    only on per-metric ORDER, so fused assignments stay bit-identical to
    the oracle's global-window ntile — then one range partition + one
    checkpoint + one ≤P×3-row offsets collect scores every metric
    (_ntile_distributed_long), and a map-side-combinable user_id pivot
    folds the scores back to wide. No Exchange SinglePartition /
    single-task Sort anywhere, so the plan survives 10^9 users."""
    agg = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("monetary_dec"),
        )
        .withColumn("monetary", F.col("monetary_dec").cast("double"))
    )
    # stacked sort key is BIGINT — exact for all three metrics with fast
    # long-backed sorting: epoch-micros and counts are bigint-native,
    # and monetary ranks by integer CENTS (monetary_dec·100 on the
    # sum's native decimal(28,2) — never a narrowing decimal cast that
    # could overflow to NULL silently with ANSI off, the r5 advisory).
    # Cents order ≡ the exact decimal order the oracle ranks by, and two
    # distinct decimals can never collapse the way their double
    # projections could. Bound: the bigint cents cast is exact below
    # 2^63 cents ≈ $9.2e16 — documented, not checked. (A decimal(28,2)
    # stack was tried first: order-exact but 128-bit-backed, measured
    # +1.3 s on the fused ntile sort at sf0.1; the bigint stack keeps
    # the long-backed radix path.)
    long = agg.select(
        "user_id",
        "freq",
        "monetary",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("metric_id"),
                    F.unix_micros(F.col("last_ts")).alias("value"),
                ),
                F.struct(
                    F.lit(1).alias("metric_id"),
                    F.col("freq").alias("value"),
                ),
                F.struct(
                    F.lit(2).alias("metric_id"),
                    (F.col("monetary_dec") * 100).cast("bigint").alias("value"),
                ),
            )
        ).alias("mv"),
    ).select("user_id", "freq", "monetary", F.col("mv.metric_id").alias("metric_id"), F.col("mv.value").alias("value"))
    scored = _ntile_distributed_long(long, RFM_BUCKETS)
    return scored.groupBy("user_id").agg(
        F.max(F.when(F.col("metric_id") == 0, F.col("bucket"))).alias("r_score"),
        F.max(F.when(F.col("metric_id") == 1, F.col("bucket"))).alias("f_score"),
        F.max(F.when(F.col("metric_id") == 2, F.col("bucket"))).alias("m_score"),
        F.max("freq").alias("freq"),
        F.max("monetary").alias("monetary"),
    ).select("user_id", "r_score", "f_score", "m_score", "freq", "monetary")


PATH_LEN = 3      # leading events per user forming the path signature
PATH_TOP_K = 20


@query("events_top_paths", oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ordered WHERE rn <= {PATH_LEN} GROUP BY user_id
    ),
    counts AS (SELECT path, CAST(count(*) AS BIGINT) AS n_users
               FROM paths GROUP BY path)
    SELECT path, n_users,
           CAST(row_number() OVER (ORDER BY n_users DESC, path) AS INT) AS rn
    FROM counts QUALIFY rn <= {PATH_TOP_K}
""")
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journey paths (new r5): each user's first PATH_LEN
    events (ordered by ts, event_id — deterministic) join into a
    'view>click>signup' path signature; the PATH_TOP_K most common
    paths ranked — the path-analysis primitive behind onboarding-flow
    and drop-off dashboards.

    Scale shape: ONE user-keyed window shuffle (the path agg reuses the
    same partitioning, so no second wide exchange); the counts frame is
    bounded by the event-type VOCABULARY (≤ |types|^PATH_LEN rows —
    independent of user count), so the final rank runs on a tiny frame
    and the top-k 'global window' never sees raw data. collect_list is
    order-free in Spark, so the path string sorts (rn, type) structs
    before joining — deterministic under any partitioning."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= PATH_LEN)
    paths = ordered.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    # top-k first via the fused TakeOrderedAndProject (no global-sort
    # exchange), THEN rank the ≤PATH_TOP_K survivors — the single-
    # partition window only ever sees k rows
    top = counts.orderBy(F.desc("n_users"), "path").limit(PATH_TOP_K)
    wr = W.orderBy(F.desc("n_users"), "path")
    return top.withColumn("rn", F.row_number().over(wr)).select(
        "path", "n_users", "rn"
    )


@query("events_attribution", oracle="""
    WITH t AS (
      SELECT user_id, event_type, CAST(value AS DECIMAL(18,2)) AS v,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_touch,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch
      FROM events
    ),
    p AS (SELECT * FROM t WHERE event_type = 'purchase')
    SELECT model, channel, CAST(count(*) AS BIGINT) AS conversions,
           CAST(sum(v) AS DOUBLE) AS revenue
    FROM (
      SELECT 'first_touch' AS model,
             COALESCE(first_touch, '(direct)') AS channel, v FROM p
      UNION ALL
      SELECT 'last_touch', COALESCE(last_touch, '(direct)'), v FROM p
    ) GROUP BY model, channel
""")
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution (new r5): for every purchase, credit the
    user's FIRST prior non-purchase touch and the LAST prior
    non-purchase touch (the two classic single-touch models), rolled up
    to (model, channel) with conversion counts and decimal-exact
    revenue. Purchases with no prior touch credit '(direct)'.

    Scale shape: ONE window shuffle on user_id computes both touch
    channels in the same ordered pass (frame = rows preceding the
    purchase, ignorenulls first/last — no per-purchase lookback join,
    no self-join on the events table); the rollup is a
    map-side-combinable agg over |models|×|channels| rows. (ts,
    event_id) ordering makes every credit deterministic."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    t = ev.select(
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    ).filter(F.col("event_type") == "purchase")
    # explode, not union: a UNION of two projections of `t` makes
    # Catalyst recompute the window pass per branch (two event scans,
    # 4 exchanges); the 2-element explode keeps ONE window pass and one
    # agg shuffle (2 exchanges total, plan-audited in PLANS.md)
    long = t.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.coalesce("first_touch", F.lit("(direct)")).alias("channel"),
                ),
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.coalesce("last_touch", F.lit("(direct)")).alias("channel"),
                ),
            )
        ).alias("mc"),
        "v",
    )
    return long.groupBy(
        F.col("mc.model").alias("model"), F.col("mc.channel").alias("channel")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("conversions"),
        F.sum("v").cast("double").alias("revenue"),
    )


@query("events_ab_test", oracle="""
    WITH u AS (
      SELECT user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
               % 2 AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      FROM u
    )
    SELECT n_a, conv_a, n_b, conv_b,
           round(CAST(conv_a AS DOUBLE) / nullif(n_a, 0), 8) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / nullif(n_b, 0), 8) AS rate_b,
           round((CAST(conv_a AS DOUBLE) / nullif(n_a, 0)
                  - CAST(conv_b AS DOUBLE) / nullif(n_b, 0))
                 / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / nullif(n_a, 0) + 1.0 / nullif(n_b, 0))), 0),
                 6) AS z_score
    FROM s
""")
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic 50/50 user split (md5
    bucket — the same hash-the-key idiom as split_train_test, so
    assignment is reproducible on any cluster with zero RNG state),
    conversion = user had ≥1 purchase event, two-proportion pooled
    z-score. The experimentation primitive every growth pipeline runs.

    Scale shape: one user_id agg shuffle (map-side combined), then a
    global conditional-sum aggregate whose partials reduce to ONE row —
    no pivot join, no second pass over events. All counts integer; the
    rate/z arithmetic is the identical double expression in both
    engines."""
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
        .withColumn(
            "variant",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
            ).cast("int")
            % 2,
        )
    )
    s = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    # try_divide everywhere: on a fully-converting corpus p_pool = 1 so
    # the pooled-variance term is exactly 0 — the z-score must be NULL
    # (matching DuckDB's divide-by-zero NULL), not a DIVIDE_BY_ZERO
    # error under an ANSI-enabled session (Spark 4's default).
    p_a = F.try_divide(F.col("conv_a").cast("double"), F.col("n_a"))
    p_b = F.try_divide(F.col("conv_b").cast("double"), F.col("n_b"))
    p_pool = F.try_divide(
        (F.col("conv_a") + F.col("conv_b")).cast("double"),
        F.col("n_a") + F.col("n_b"),
    )
    return s.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(p_a, 8).alias("rate_a"),
        F.round(p_b, 8).alias("rate_b"),
        F.round(
            F.try_divide(
                p_a - p_b,
                F.sqrt(
                    p_pool * (1 - p_pool)
                    * (
                        F.try_divide(F.lit(1.0), F.col("n_a"))
                        + F.try_divide(F.lit(1.0), F.col("n_b"))
                    )
                ),
            ),
            6,
        ).alias("z_score"),
    )


CUPED_CUTOFF = "2024-01-16 00:00:00"  # pre/post split of the fixture month


@query("events_cuped", oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
               % 2 AS variant,
             COALESCE(sum(CASE WHEN event_type = 'purchase'
                                AND CAST(ts AS TIMESTAMP) < TIMESTAMP '{CUPED_CUTOFF}'
                               THEN CAST(value AS DECIMAL(18,2)) END),
                      0) AS x,
             COALESCE(sum(CASE WHEN event_type = 'purchase'
                                AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '{CUPED_CUTOFF}'
                               THEN CAST(value AS DECIMAL(18,2)) END),
                      0) AS y
      FROM events GROUP BY user_id
    ),
    pool AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(x * y) AS DOUBLE) AS sxy
      FROM u
    ),
    th AS (
      SELECT n, sx / n AS xbar,
             (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) AS theta
      FROM pool
    )
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS mean_post,
           round(CAST(sum(y) AS DOUBLE) / count(*)
                 - th.theta * (CAST(sum(x) AS DOUBLE) / count(*) - th.xbar),
                 6) AS mean_adj,
           round(th.theta, 6) AS theta
    FROM u CROSS JOIN th
    GROUP BY variant, th.theta, th.xbar
""")
def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (new r6, Deng et al. 2013 —
    the industry-standard experimentation estimator): per-user
    pre-period revenue x (before CUPED_CUTOFF) is the covariate,
    post-period revenue y the metric; θ = cov(x,y)/var(x) pooled over
    all users, and each variant's adjusted mean is
    mean(y) − θ·(mean(x) − x̄). Same deterministic md5 50/50 user split
    as events_ab_test.

    Exactness contract: x and y are DECIMAL(18,2)-exact per-user sums;
    the moment sums Σx, Σy, Σx², Σxy stay in exact decimal (products of
    two (18,2)s are (37,4)-exact) and only their FINAL values cast to
    double, so both engines compute θ from the identical IEEE inputs
    with the identical expression tree — no summation-order drift
    anywhere. Divisions are try_divide/nullif (a zero-variance covariate
    yields NULL θ under ANSI too, not an error).

    Scale shape: one user-keyed agg shuffle (map-side combined; the
    pre/post conditional sums ride the same pass), ONE 5-value pooled
    row broadcast back, and a 2-row variant agg — the whole estimator
    adds zero extra passes over events compared with the naive A/B
    readout."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(CUPED_CUTOFF).cast("timestamp")
    dec = F.col("value").cast("decimal(18,2)")
    is_p = F.col("event_type") == "purchase"
    u = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(is_p & (F.col("ts") < cutoff), dec)), F.lit(0)
            ).alias("x"),
            F.coalesce(
                F.sum(F.when(is_p & (F.col("ts") >= cutoff), dec)), F.lit(0)
            ).alias("y"),
        )
        .withColumn(
            "variant",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
            ).cast("int")
            % 2,
        )
    )
    pool = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    ).select(
        "n",
        (F.col("sx") / F.col("n")).alias("xbar"),
        F.try_divide(
            F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
        ).alias("theta"),
    )
    return (
        u.crossJoin(F.broadcast(pool))
        .groupBy("variant", "theta", "xbar")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("y").cast("double").alias("sy_v"),
            F.sum("x").cast("double").alias("sx_v"),
        )
        .select(
            "variant",
            "n_users",
            F.round(F.col("sy_v") / F.col("n_users"), 6).alias("mean_post"),
            F.round(
                F.col("sy_v") / F.col("n_users")
                - F.col("theta")
                * (F.col("sx_v") / F.col("n_users") - F.col("xbar")),
                6,
            ).alias("mean_adj"),
            F.round("theta", 6).alias("theta"),
        )
    )


# single-char codes keep the per-user sequence string compact and the
# pattern regex readable in BOTH engines
PATTERN_CODES = {"view": "v", "click": "c", "signup": "s",
                 "purchase": "p", "error": "e"}
PATTERN_RE = "c[^p]*p"  # click leading (eventually) to purchase
_CODE_SQL = " ".join(
    f"WHEN event_type = '{t}' THEN '{c}'" for t, c in PATTERN_CODES.items()
)


@query("events_pattern_match", oracle=f"""
    WITH coded AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE {_CODE_SQL} ELSE '?' END AS code
      FROM events
    ),
    seqs AS (
      SELECT user_id,
             string_agg(code, '' ORDER BY ts, event_id) AS seq,
             CAST(count(*) AS BIGINT) AS n_events
      FROM coded GROUP BY user_id
    )
    SELECT user_id, n_events,
           regexp_matches(seq, '{PATTERN_RE}') AS matched,
           CASE WHEN regexp_matches(seq, '{PATTERN_RE}')
                THEN regexp_extract(seq, '{PATTERN_RE}', 0) ELSE '' END
             AS first_match
    FROM seqs
""")
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite sequence pattern matching (new r6): each
    user's event history folds to a compact single-char code string in
    deterministic (ts, event_id) order, and a regex runs over it —
    here '{PATTERN_RE}': a click eventually followed by a purchase with
    no purchase in between, the row-pattern shape SQL:2016
    MATCH_RECOGNIZE expresses and Spark SQL lacks. Output: whether each
    user's history matches and the leftmost matching subsequence (both
    engines' regex engines are leftmost-first on this pattern class).

    Scale shape: ONE user-keyed agg shuffle; the per-user sequence is
    bounded by events-per-user (the same bound sessionize/funnel/paths
    already rely on), collect_list is order-free so the struct array is
    array_sort-ed before folding — deterministic under any
    partitioning. Regex evaluation is JVM-side per row (no UDF). A
    pathological power-user's history lands on one executor row — the
    standard per-entity bound of every sequence operator in this
    module."""
    code_col = None
    for t, c in PATTERN_CODES.items():
        branch = code_col if code_col is not None else F
        code_col = branch.when(F.col("event_type") == t, F.lit(c))
    code_col = code_col.otherwise(F.lit("?"))
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.struct("ts", "event_id", code_col.alias("code")).alias("st")
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("st")), lambda x: x.code), ""
        ).alias("seq"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    matched = F.col("seq").rlike(PATTERN_RE)
    return seqs.select(
        "user_id",
        "n_events",
        matched.alias("matched"),
        F.when(matched, F.regexp_extract(F.col("seq"), PATTERN_RE, 0))
        .otherwise(F.lit(""))
        .alias("first_match"),
    )


@query("timeseries_holt", oracle="""
    WITH RECURSIVE daily AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_id, cents,
             row_number() OVER (PARTITION BY user_id ORDER BY d) AS i,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM daily
    ),
    st AS (
      SELECT user_id, 1 AS i, cents AS lv, CAST(0 AS BIGINT) AS tr, n
      FROM ranked WHERE i = 1
      UNION ALL
      SELECT s.user_id, s.i + 1,
             CAST(floor((s.lv + s.tr + r.cents) / 2.0) AS BIGINT),
             CAST(floor((s.tr
                         + CAST(floor((s.lv + s.tr + r.cents) / 2.0) AS BIGINT)
                         - s.lv) / 2.0) AS BIGINT),
             s.n
      FROM st s JOIN ranked r ON r.user_id = s.user_id AND r.i = s.i + 1
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_days,
           lv AS level_cents, tr AS trend_cents,
           lv + tr AS forecast_cents
    FROM st WHERE i = n
""")
def timeseries_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (new r6) — level+trend
    forecasting over each user's daily purchase-revenue series, the
    classic operational-forecasting primitive. α = β = 1/2 in INTEGER
    fixed-point (cents, floor-halving) so the inherently sequential
    smoothing recursion is bit-exact in any engine and under any
    partitioning — the same exactness trick as graph_pagerank and the
    BPE fold. The one-step-ahead forecast is level + trend.

    Engine note: the fold runs as ONE Catalyst higher-order `aggregate`
    over each user's sorted day array — per-series sequential but
    series-parallel across users, no UDF, no driver loop. The oracle
    replays it as a recursive CTE advancing every user one observation
    per iteration (DuckDB 1.0's list_reduce mis-evaluates multi-field
    struct accumulators — traced during r6 — so the CTE unroll is the
    reliable replay, the pipeline_bpe_tokenize idiom).

    Scale shape: one (user, day) pre-agg shuffle (map-side combined),
    one user-keyed collect_list agg; state per series is the bounded
    day array. A series too long to hold as an array (years of
    per-second points) shards the fold by time range and carries
    (level, trend) across shard boundaries — the streaming sibling
    would hold exactly that pair in applyInPandasWithState, the
    stream_running_totals pattern."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    series = daily.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "cents"))),
            lambda x: x.cents,
        ).alias("obs"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    fold = F.expr("""
        aggregate(
          slice(obs, 2, size(obs) - 1),
          named_struct('lv', obs[0], 'tr', CAST(0 AS BIGINT)),
          (a, x) -> named_struct(
            'lv', CAST(floor((a.lv + a.tr + x) / 2.0) AS BIGINT),
            'tr', CAST(floor((a.tr
                              + CAST(floor((a.lv + a.tr + x) / 2.0) AS BIGINT)
                              - a.lv) / 2.0) AS BIGINT)))
    """)
    return series.select(
        "user_id",
        "n_days",
        fold.getField("lv").alias("level_cents"),
        fold.getField("tr").alias("trend_cents"),
        (fold.getField("lv") + fold.getField("tr")).alias("forecast_cents"),
    )


@query("events_welch_ttest", oracle="""
    WITH u AS (
      SELECT user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
               % 2 AS variant,
             COALESCE(sum(CASE WHEN event_type = 'purchase'
                               THEN CAST(value AS DECIMAL(18,2)) END),
                      0) AS y
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN variant = 0 THEN y END) AS DOUBLE) AS sy_a,
             CAST(sum(CASE WHEN variant = 1 THEN y END) AS DOUBLE) AS sy_b,
             CAST(sum(CASE WHEN variant = 0 THEN y * y END) AS DOUBLE) AS syy_a,
             CAST(sum(CASE WHEN variant = 1 THEN y * y END) AS DOUBLE) AS syy_b
      FROM u
    ),
    m AS (
      SELECT n_a, n_b,
             sy_a / n_a AS mean_a, sy_b / n_b AS mean_b,
             (syy_a - sy_a * sy_a / n_a) / nullif(n_a - 1, 0) AS var_a,
             (syy_b - sy_b * sy_b / n_b) / nullif(n_b - 1, 0) AS var_b
      FROM s
    )
    SELECT n_a, n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round((mean_a - mean_b)
                 / nullif(sqrt(var_a / n_a + var_b / n_b), 0), 6) AS t_stat,
           round(pow(var_a / n_a + var_b / n_b, 2)
                 / nullif(pow(var_a / n_a, 2) / nullif(n_a - 1, 0)
                          + pow(var_b / n_b, 2) / nullif(n_b - 1, 0), 0),
                 4) AS df
    FROM m
""")
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on per-user purchase revenue (new
    r6) — the continuous-metric sibling of `events_ab_test`'s
    two-proportion z and `events_cuped`'s variance-reduced mean: the
    three readouts every experimentation platform ships. Same
    deterministic md5 50/50 user split; t = (ȳ_A − ȳ_B) /
    √(s²_A/n_A + s²_B/n_B) with Welch–Satterthwaite degrees of freedom.

    Exactness contract (the events_cuped pattern): per-user revenue y is
    a DECIMAL(18,2)-exact sum; the per-variant moment sums Σy and Σy²
    stay exact decimal through the one-row conditional aggregate and
    only their FINAL values cast to double, so both engines evaluate
    mean/variance/t from identical IEEE inputs with the identical
    expression tree — no summation-order drift. try_divide throughout:
    a single-user arm (n−1 = 0) or two zero-variance arms yield NULL,
    not an ANSI DIVIDE_BY_ZERO.

    Scale shape: one user_id agg shuffle (map-side combined), then a
    global conditional-sum aggregate reducing to ONE row — identical
    pass structure to events_ab_test; the whole test adds no extra scan
    of events no matter the corpus size."""
    dec = F.col("value").cast("decimal(18,2)")
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", dec)), F.lit(0)
            ).alias("y")
        )
        .withColumn(
            "variant",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
            ).cast("int")
            % 2,
        )
    )
    is_a, is_b = F.col("variant") == 0, F.col("variant") == 1
    s = u.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(is_a, F.col("y"))).cast("double").alias("sy_a"),
        F.sum(F.when(is_b, F.col("y"))).cast("double").alias("sy_b"),
        F.sum(F.when(is_a, F.col("y") * F.col("y"))).cast("double").alias("syy_a"),
        F.sum(F.when(is_b, F.col("y") * F.col("y"))).cast("double").alias("syy_b"),
    )
    mean_a = F.col("sy_a") / F.col("n_a")
    mean_b = F.col("sy_b") / F.col("n_b")
    var_a = F.try_divide(
        F.col("syy_a") - F.col("sy_a") * F.col("sy_a") / F.col("n_a"),
        F.col("n_a") - 1,
    )
    var_b = F.try_divide(
        F.col("syy_b") - F.col("sy_b") * F.col("sy_b") / F.col("n_b"),
        F.col("n_b") - 1,
    )
    se2 = var_a / F.col("n_a") + var_b / F.col("n_b")
    return s.select(
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(F.try_divide(mean_a - mean_b, F.sqrt(se2)), 6).alias("t_stat"),
        F.round(
            F.try_divide(
                F.pow(se2, 2),
                F.try_divide(F.pow(var_a / F.col("n_a"), 2), F.col("n_a") - 1)
                + F.try_divide(F.pow(var_b / F.col("n_b"), 2), F.col("n_b") - 1),
            ),
            4,
        ).alias("df"),
    )


@query("timeseries_ohlc", oracle="""
    WITH pts AS (
      SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type IN ('purchase', 'click', 'view')
    ),
    agg AS (
      SELECT event_type, day,
             min(ROW(ts, event_id, v)) AS o,
             max(ROW(ts, event_id, v)) AS c,
             min(v) AS low, max(v) AS high,
             CAST(count(*) AS BIGINT) AS n_ticks,
             sum(v) AS total
      FROM pts GROUP BY event_type, day
    )
    SELECT event_type, day,
           CAST(o[3] AS DOUBLE) AS open,
           CAST(high AS DOUBLE) AS high, CAST(low AS DOUBLE) AS low,
           CAST(c[3] AS DOUBLE) AS close,
           n_ticks, CAST(total AS DOUBLE) AS total
    FROM agg
""")
def timeseries_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (candlestick) downsampling per (series, day) — open/high/
    low/close + tick count + volume, the canonical M4-style time-series
    compaction every monitoring and market-data stack runs (new r6).
    Open/close are the values at the FIRST/LAST tick of the bucket,
    ties impossible because (ts, event_id) is unique.

    Exactness: open/close ride the lexicographic min/max(struct(ts,
    event_id, value)) — the shuffle-once argmin idiom (same as
    pipeline_dedup_keep_best / join_spatial_nn), so there is no window
    function and no per-bucket sort anywhere; high/low/total are plain
    DECIMAL-exact aggregates internally. The FINAL projection casts to
    DOUBLE on both engine texts: DECIMAL in an output schema is a gate
    hazard (DuckDB's pandas path renders it float64 while Spark keeps
    Decimal objects, so trailing-zero cells stringify differently) —
    the r6/r7 lesson; exactness lives upstream, the emitted type is
    canonicalizer-safe.

    Scale shape: ONE map-side-combinable groupBy on (series, bucket) —
    the partial aggregates are constant-size per group, so 100 TB of
    raw ticks reduce to |series|×|buckets| rows in a single shuffle;
    repartitioning the sink by series keeps downstream chart scans
    pruned."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click", "view")
    )
    v = F.col("value").cast("decimal(18,2)")
    pts = ev.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "ts",
        "event_id",
        v.alias("v"),
    )
    return (
        pts.groupBy("event_type", "day")
        .agg(
            F.min(F.struct("ts", "event_id", "v")).alias("o"),
            F.max(F.struct("ts", "event_id", "v")).alias("c"),
            F.min("v").alias("low"),
            F.max("v").alias("high"),
            F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
            F.sum("v").cast("decimal(28,2)").alias("total"),
        )
        .select(
            "event_type",
            "day",
            F.col("o.v").cast("double").alias("open"),
            F.col("high").cast("double").alias("high"),
            F.col("low").cast("double").alias("low"),
            F.col("c.v").cast("double").alias("close"),
            "n_ticks",
            F.col("total").cast("double").alias("total"),
        )
    )


@query("timeseries_cusum", oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    target AS (
      SELECT event_type, sum(n_events) // count(*) AS k
      FROM daily GROUP BY event_type
    ),
    c AS (
      SELECT d.event_type, d.day, d.n_events, t.k,
             sum(d.n_events - t.k) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS UNBOUNDED PRECEDING) AS csum
      FROM daily d JOIN target t USING (event_type)
    ),
    s AS (
      SELECT event_type, day, n_events, k, csum,
             least(0, min(csum) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)) AS runmin
      FROM c
    )
    SELECT event_type, day, n_events,
           CAST(csum - runmin AS BIGINT) AS cusum,
           (csum - runmin > k // 2) AS is_alarm
    FROM s
""")
def timeseries_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over per-series daily volume (new
    r6) — Page 1954's one-sided cumulative-sum control chart, the
    standard drift/level-shift monitor next to the MAD spike detector
    (events_anomaly_mad: point anomalies; CUSUM: sustained shifts).

    The textbook statistic is the SEQUENTIAL recurrence
    s_i = max(0, s_{i-1} + (x_i - k)) — seemingly a per-series loop.
    It has an exact prefix-scan closed form:
    s_i = csum_i - min(0, min_{j<=i} csum_j), so the whole monitor is
    TWO running windows (cumulative sum + running min) over the daily
    rollup — no recursion, no UDF, no driver loop; Spark and DuckDB
    evaluate the identical integer algebra.

    Exactness: the reference level k is the integer floor-mean
    (sum DIV days), so every intermediate (dev, csum, runmin, cusum) is
    exact BIGINT arithmetic — bit-identical cross-engine; the alarm
    threshold k/2 is likewise integer. A property test replays the
    naive sequential recurrence in Python and matches exactly.

    Scale shape: the raw 100 TB event stream reduces in ONE map-side-
    combinable groupBy to |series|x|days| rows; both windows then run
    over that tiny rollup partitioned BY SERIES (series-parallel, no
    single-partition sort). The floor-mean join is a broadcast of
    |series| rows."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    target = daily.groupBy("event_type").agg(
        F.expr("sum(n_events) DIV count(*)").alias("k")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = (
        daily.join(F.broadcast(target), "event_type")
        .withColumn("csum", F.sum(F.col("n_events") - F.col("k")).over(w))
        .withColumn("runmin", F.least(F.lit(0), F.min("csum").over(w)))
    )
    return c.select(
        "event_type",
        "day",
        "n_events",
        (F.col("csum") - F.col("runmin")).cast("bigint").alias("cusum"),
        ((F.col("csum") - F.col("runmin")) > F.expr("k DIV 2")).alias(
            "is_alarm"
        ),
    )


STREAM_TOPK_K = 5


@query("stream_topk", oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             user_id,
             CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    r AS (
      SELECT day, user_id, cents,
             CAST(row_number() OVER (PARTITION BY day
               ORDER BY cents DESC, user_id) AS INT) AS rank
      FROM daily
    )
    SELECT day, user_id, cents, rank FROM r WHERE rank <= {STREAM_TOPK_K}
""")
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-K (new r6): the top-{STREAM_TOPK_K} revenue users
    per day, maintained over a live stream — the leaderboard/trending
    shape every real-time analytics surface runs. Architecture is the
    canonical one: the STREAM maintains only the additive per-(day,
    user) revenue state (a streaming aggregation — mergeable, bounded,
    restart-safe); the RANK is computed at read time over the
    aggregate snapshot, because top-K itself is not an incremental
    aggregate (an eviction-based streaming rank can never re-admit a
    key that later grows past an evicted one).

    Exactness: integer-cents sums in streaming state; the final rank
    orders (cents DESC, user_id) so ties are deterministic in both
    engines. The drained snapshot equals the batch aggregate exactly —
    the oracle is strict.

    Scale shape: streaming state is |days|x|active users| additive
    BIGINTs partitioned by group key; the read-time rank partitions BY
    DAY (no global sort). The memory sink here is the fixture-scale
    stand-in for a Delta/Kafka sink — the state contract is what the
    key proves."""
    from quackflight_spark.sources.fixtures import events_ts_normalized
    from quackflight_spark.streaming.source import (
        drain_to_memory,
        stage_events_stream,
    )

    stream = (
        events_ts_normalized(stage_events_stream(spark, sf_dir, "topk"))
        .filter("event_type = 'purchase'")
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            "user_id",
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    snap = drain_to_memory(
        spark, stream, f"stream_topk_{tag}", "complete", shuffle_partitions=8
    )
    w = Window.partitionBy("day").orderBy(F.desc("cents"), F.asc("user_id"))
    return (
        snap.select(
            F.col("w.start").cast("date").alias("day"), "user_id", "cents"
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= STREAM_TOPK_K)
    )


@query("events_time_to_convert", oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS v
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id,
             (epoch_us(min(CAST(e.ts AS TIMESTAMP))) - epoch_us(f.v))
               // 1000000 AS lat_s
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > f.v
      GROUP BY e.user_id, f.v
    ),
    hist AS (
      SELECT lat_s, CAST(count(*) AS BIGINT) AS c FROM conv GROUP BY lat_s
    ),
    cum AS (
      SELECT lat_s, sum(c) OVER (ORDER BY lat_s ROWS UNBOUNDED PRECEDING)
               AS cw,
             sum(c) OVER () AS n, sum(lat_s * c) OVER () AS tot
      FROM hist
    )
    SELECT CAST(max(n) AS BIGINT) AS n_converted,
           CAST(min(CASE WHEN 4 * cw >= n THEN lat_s END) AS BIGINT) AS p25_s,
           CAST(min(CASE WHEN 2 * cw >= n THEN lat_s END) AS BIGINT) AS p50_s,
           CAST(min(CASE WHEN 4 * cw >= 3 * n THEN lat_s END) AS BIGINT)
             AS p75_s,
           CAST(max(tot) AS DOUBLE) / CAST(max(n) AS DOUBLE) AS mean_s
    FROM cum
""")
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution (new r6) — first view → first
    subsequent purchase per user, summarized as exact order-statistic
    quartiles + mean: the funnel-LATENCY readout next to the funnel-
    depth ones (events_funnel/_windowed) — 'how long does conversion
    take', the metric behind payback and remarketing windows.

    Exactness: latencies are integer seconds; the quartiles are LOWER
    order statistics picked off a cumulative sum (min lat where
    k·cw ≥ q·n — pure integer comparisons, no interpolated quantile
    estimator for engines to disagree on); the mean is one double
    division of exact integers.

    Scale shape: two user-keyed aggs (map-side-combinable, the join
    co-partitioned), then the distribution work runs on the LATENCY
    rollup whose size is bounded by the latency DOMAIN in seconds —
    corpus-independent, same domain-bound argument as events_ks_test —
    so the single-partition cumulative window is over a bounded frame
    by construction."""
    e = load_table(spark, sf_dir, "events")
    firsts = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(F.col("ts") > F.col("v"))
        .groupBy("user_id", "v")
        .agg(F.min("ts").alias("p"))
        .select(
            F.expr("(unix_micros(p) - unix_micros(v)) DIV 1000000").alias(
                "lat_s"
            )
        )
    )
    hist = conv.groupBy("lat_s").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wcum = Window.orderBy("lat_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = hist.select(
        "lat_s",
        F.sum("c").over(wcum).alias("cw"),
        F.sum("c").over(wall).alias("n"),
        F.sum(F.col("lat_s") * F.col("c")).over(wall).alias("tot"),
    )
    return cum.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        F.min(F.when(4 * F.col("cw") >= F.col("n"), F.col("lat_s")))
        .cast("bigint")
        .alias("p25_s"),
        F.min(F.when(2 * F.col("cw") >= F.col("n"), F.col("lat_s")))
        .cast("bigint")
        .alias("p50_s"),
        F.min(F.when(4 * F.col("cw") >= 3 * F.col("n"), F.col("lat_s")))
        .cast("bigint")
        .alias("p75_s"),
        (F.max("tot").cast("double") / F.max("n").cast("double")).alias(
            "mean_s"
        ),
    )


@query("events_ab_srm", oracle="""
    WITH u AS (
      SELECT user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
               % 2 AS variant
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM u
    )
    SELECT n_a, n_b,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE) AS chi2,
           (CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE)) > 3.841458820694124 AS srm_detected
    FROM s
""")
def events_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) guardrail (new r6) — the FIRST check
    every experimentation platform runs before reading an A/B result:
    a chi-square goodness-of-fit of the observed arm sizes against the
    designed 50/50 split. A failed SRM invalidates the experiment
    regardless of the metric movement (assignment, logging, or
    filtering is biased — Fabijan et al. 2019). For an even split the
    chi-square statistic reduces EXACTLY to (n_a−n_b)²/(n_a+n_b).

    Exactness: arm counts are integers, the statistic is one double
    division of two exact integers, and the alpha=0.05 critical value
    (chi², 1 df) is a shared literal — no distribution functions at
    query time.

    Scale shape: one user-grain rollup (map-side combined) and a 1-row
    conditional-sum aggregate — the cheapest possible guardrail, worth
    running before every readout at any scale."""
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 4),
                    16,
                    10,
                ).cast("int")
                % 2
            ).alias("variant")
        )
    )
    s = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    chi2 = (
        ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))).cast(
            "double"
        )
        / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    return s.select(
        "n_a",
        "n_b",
        chi2.alias("chi2"),
        (chi2 > F.lit(3.841458820694124)).alias("srm_detected"),
    )


BOOT_B = 200        # bootstrap replicates
BOOT_LO, BOOT_HI = 5, 195   # 2.5% / 97.5% order statistics of B=200

# Poisson(1) CDF scaled to the 48-bit md5 draw domain — computed ONCE
# here and baked as integer literals into BOTH engine texts, so no libm
# runs at query time anywhere.
import math as _math  # noqa: E402

_POIS_CDF = []
_acc = 0.0
for _k in range(8):
    _acc += _math.exp(-1.0) / _math.factorial(_k)
    _POIS_CDF.append(int(_acc * (1 << 48)))


def _poisson_w_sql(h: str) -> str:
    """Engine-neutral CASE chain mapping a uniform 48-bit integer draw
    to a Poisson(1) weight (capped at 8, tail mass ~1e-5)."""
    branches = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"(CASE {branches} ELSE 8 END)"


@query("events_bootstrap_ci", oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
               % 2 AS variant,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,2)) END) * 100
                  AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ),
    base AS (
      SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN variant = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_a,
             CAST(sum(CASE WHEN variant = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_b
      FROM u
    ),
    drawn AS (
      SELECT r.rep, u.variant, u.cents,
             {_poisson_w_sql(
                 "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' ||"
                 " CAST(r.rep AS VARCHAR)), 1, 12) AS BIGINT)")} AS w
      FROM u, (SELECT unnest(range(0, {BOOT_B})) AS rep) r
    ),
    reps AS (
      SELECT rep,
             CAST(sum(CASE WHEN variant = 0 THEN w * cents ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN variant = 0 THEN w ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN variant = 1 THEN w * cents ELSE 0 END) AS BIGINT) AS sb,
             CAST(sum(CASE WHEN variant = 1 THEN w ELSE 0 END) AS BIGINT) AS nb
      FROM drawn GROUP BY rep
    ),
    deltas AS (
      SELECT CAST(sa AS DOUBLE) / nullif(na, 0)
             - CAST(sb AS DOUBLE) / nullif(nb, 0) AS delta
      FROM reps
    ),
    ranked AS (
      SELECT delta, row_number() OVER (ORDER BY delta) AS rn
      FROM deltas WHERE delta IS NOT NULL
    )
    SELECT b.n_a, b.n_b,
           round(CAST(b.s_a AS DOUBLE) / nullif(b.n_a, 0)
                 - CAST(b.s_b AS DOUBLE) / nullif(b.n_b, 0), 8) AS delta_cents,
           round(min(CASE WHEN rn = {BOOT_LO} THEN delta END), 8) AS ci_lo,
           round(min(CASE WHEN rn = {BOOT_HI} THEN delta END), 8) AS ci_hi,
           CAST(count(*) AS BIGINT) AS n_replicates
    FROM ranked, base b
    GROUP BY b.n_a, b.n_b, b.s_a, b.s_b
""")
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the A/B revenue-per-
    user delta (new r6) — the bootstrap variant that actually runs at
    warehouse scale (each unit draws an independent Poisson(1) weight
    per replicate, so NO resampling pass over the data is needed; the
    technique behind large-scale experiment CIs at Google/Meta,
    Chamandy et al. 2012). Complements the parametric readouts
    (z-score, Welch t, CUPED, KS): distribution-free interval on the
    metric delta itself.

    Determinism: the per-(user, replicate) weight is a 48-bit md5 draw
    compared against Poisson(1) CDF thresholds PRECOMPUTED into integer
    literals — zero RNG state, zero libm at query time, bit-identical
    in both engines (same idiom as split_train_test). All sums are
    exact BIGINT cents; each replicate's delta is one double division
    pair; the 95% CI is exact order statistics (ranks {BOOT_LO}/{BOOT_HI}
    of {BOOT_B}) — no interpolated quantile estimator to disagree on.

    Scale shape: the ×{BOOT_B} replicate explode happens on the USER-
    GRAIN rollup (after the one map-side-combinable events shuffle),
    never on raw events; replicate aggregation shuffles on rep ({BOOT_B}
    groups, embarrassingly parallel). The final rank runs over {BOOT_B}
    rows — bounded by construction, not by data."""
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(18,2)"),
                    )
                )
                * 100
            )
            .cast("bigint")
            .alias("cents")
        )
        .select(
            "user_id",
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
                .cast("int")
                % 2
            ).alias("variant"),
            "cents",
        )
    )
    base = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("s_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("s_b"),
    )
    h = (
        "CAST(conv(substring(md5(concat(CAST(user_id AS STRING), ':',"
        " CAST(rep AS STRING))), 1, 12), 16, 10) AS BIGINT)"
    )
    drawn = u.select(
        "user_id",
        "variant",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("rep"),
    ).withColumn("w", F.expr(_poisson_w_sql(h)))
    reps = drawn.groupBy("rep").agg(
        F.sum(F.when(F.col("variant") == 0, F.col("w") * F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("sa"),
        F.sum(F.when(F.col("variant") == 0, F.col("w")).otherwise(0))
        .cast("bigint")
        .alias("na"),
        F.sum(F.when(F.col("variant") == 1, F.col("w") * F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("sb"),
        F.sum(F.when(F.col("variant") == 1, F.col("w")).otherwise(0))
        .cast("bigint")
        .alias("nb"),
    )
    deltas = reps.select(
        (
            F.try_divide(F.col("sa").cast("double"), F.nullif(F.col("na").cast("double"), F.lit(0.0)))
            - F.try_divide(F.col("sb").cast("double"), F.nullif(F.col("nb").cast("double"), F.lit(0.0)))
        ).alias("delta")
    ).filter(F.col("delta").isNotNull())
    ranked = deltas.withColumn(
        "rn", F.row_number().over(Window.orderBy("delta"))
    )
    ci = ranked.agg(
        F.round(F.min(F.when(F.col("rn") == BOOT_LO, F.col("delta"))), 8).alias("ci_lo"),
        F.round(F.min(F.when(F.col("rn") == BOOT_HI, F.col("delta"))), 8).alias("ci_hi"),
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
    )
    return base.crossJoin(ci).select(
        "n_a",
        "n_b",
        F.round(
            F.try_divide(F.col("s_a").cast("double"), F.nullif(F.col("n_a").cast("double"), F.lit(0.0)))
            - F.try_divide(F.col("s_b").cast("double"), F.nullif(F.col("n_b").cast("double"), F.lit(0.0))),
            8,
        ).alias("delta_cents"),
        "ci_lo",
        "ci_hi",
        "n_replicates",
    )


@query("timeseries_autocorr", oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, CAST(sum(x) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day,
             CAST(t.n * d.x - t.s AS DECIMAL(38,0)) AS dv
      FROM daily d JOIN stats t USING (event_type)
    ),
    l AS (
      SELECT event_type, dv,
             lead(dv, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
             lead(dv, 2) OVER (PARTITION BY event_type ORDER BY day) AS l2,
             lead(dv, 7) OVER (PARTITION BY event_type ORDER BY day) AS l7
      FROM dev
    ),
    a AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             sum(dv * dv) AS den,
             sum(dv * l1) AS n1, sum(dv * l2) AS n2, sum(dv * l7) AS n7
      FROM l GROUP BY event_type
    )
    SELECT event_type, lag, n_days,
           CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS acf
    FROM (
      SELECT event_type, 1 AS lag, n_days, n1 AS num, den FROM a
      UNION ALL
      SELECT event_type, 2, n_days, n2, den FROM a
      UNION ALL
      SELECT event_type, 7, n_days, n7, den FROM a
    )
""")
def timeseries_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation (ACF) of per-series daily volume at lags
    1, 2 and 7 (new r6) — the seasonality/persistence diagnostic behind
    every forecasting pipeline (the lag-7 spike is how weekly
    periodicity is detected before fitting Holt/seasonal models).

    Exactness: the textbook r_k = sum((x_t-m)(x_{t+k}-m)) / sum((x_t-m)^2)
    with the float mean m is a cross-engine summation-order trap, so
    both engines compute the EQUIVALENT integer form scaled by n^2:
    dev_t = n*x_t - S is an exact integer, num = sum(dev_t * dev_{t+k})
    and den = sum(dev_t^2) are exact DECIMAL(38,0) sums, and acf is ONE
    double division of two identical exact values — bit-for-bit equal.
    All three lags ride a single window pass (three leads over one
    sort) and one aggregate; the lag pivot is a projection-only union.

    Scale shape: 100 TB of raw events reduce in one map-side-combinable
    groupBy to |series|x|days| rows; the window and aggregate run over
    that rollup partitioned BY SERIES. The stats join broadcasts
    |series| rows. Calendar-bounded n keeps n*x inside DECIMAL(38,0)
    headroom with ~10 digits to spare at 10^12 events/day; overflow is
    a loud ANSI error, never a silent wrap."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    stats = daily.groupBy("event_type").agg(
        F.sum("x").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    dev = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        (F.col("n") * F.col("x") - F.col("s")).cast("decimal(38,0)").alias("dv"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    led = dev.select(
        "event_type",
        "dv",
        F.lead("dv", 1).over(w).alias("l1"),
        F.lead("dv", 2).over(w).alias("l2"),
        F.lead("dv", 7).over(w).alias("l7"),
    )
    a = led.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.col("dv") * F.col("dv")).alias("den"),
        F.sum(F.col("dv") * F.col("l1")).alias("n1"),
        F.sum(F.col("dv") * F.col("l2")).alias("n2"),
        F.sum(F.col("dv") * F.col("l7")).alias("n7"),
    )
    parts = [
        a.select(
            "event_type",
            F.lit(lag).cast("int").alias("lag"),
            "n_days",
            (F.col(num).cast("double") / F.col("den").cast("double")).alias(
                "acf"
            ),
        )
        for lag, num in ((1, "n1"), (2, "n2"), (7, "n7"))
    ]
    return parts[0].unionByName(parts[1]).unionByName(parts[2])


@query("timeseries_seasonal_decompose", oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    ma AS (
      SELECT event_type, day, x,
             ((CAST(day - DATE '1970-01-05' AS INT) % 7) + 7) % 7 AS dow,
             sum(x) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             count(*) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      FROM daily
    ),
    season AS (
      SELECT event_type, dow,
             CAST(sum(7 * x - s7) AS BIGINT) AS s_num,
             CAST(7 * count(*) AS BIGINT) AS s_den
      FROM ma WHERE c7 = 7 GROUP BY event_type, dow
    )
    SELECT m.event_type, m.day, m.x,
           CASE WHEN m.c7 = 7
                THEN CAST(m.s7 AS DOUBLE) / CAST(7 AS DOUBLE) END AS trend,
           CAST(s.s_num AS DOUBLE) / CAST(s.s_den AS DOUBLE) AS seasonal,
           CASE WHEN m.c7 = 7
                THEN CAST(m.x AS DOUBLE)
                     - CAST(m.s7 AS DOUBLE) / CAST(7 AS DOUBLE)
                     - CAST(s.s_num AS DOUBLE) / CAST(s.s_den AS DOUBLE)
           END AS residual
    FROM ma m JOIN season s
      ON m.event_type = s.event_type AND m.dow = s.dow
""")
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (new r6) — the
    moving-average decomposition behind statsmodels seasonal_decompose
    and the first step of every forecasting/anomaly stack: per-series
    daily volume splits into trend (centered 7-day moving average),
    weekly seasonal index (mean detrended value per day-of-week over
    full-window rows), and residual. Edge days without a full 7-day
    window carry NULL trend/residual, the reference behavior.

    Exactness: the detrended value x - s7/7 is held as the exact
    integer 7x - s7, so the seasonal index is sum(7x - s7)/(7*cnt) —
    exact BIGINT numerator and denominator with ONE double division;
    trend is s7/7 the same way, and the residual subtracts the two
    identical doubles in the same order in both engines. Day-of-week
    is epoch-day arithmetic mod 7 (Monday=0), immune to engine DOW
    numbering (Spark counts Sunday=1, DuckDB Sunday=0).

    Scale shape: one map-side-combinable rollup to |series|x|days|
    rows, one 7-row window partitioned BY SERIES over that rollup, one
    |series|x7-row seasonal aggregate broadcast back. Nothing touches
    raw-event grain after the first groupBy."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "event_type",
        "day",
        "x",
        F.pmod(F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")), F.lit(7))
        .cast("int")
        .alias("dow"),
        F.sum("x").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
    )
    season = (
        ma.filter(F.col("c7") == 7)
        .groupBy("event_type", "dow")
        .agg(
            F.sum(7 * F.col("x") - F.col("s7")).cast("bigint").alias("s_num"),
            (7 * F.count(F.lit(1))).cast("bigint").alias("s_den"),
        )
    )
    trend = F.when(
        F.col("c7") == 7, F.col("s7").cast("double") / F.lit(7).cast("double")
    )
    seasonal = F.col("s_num").cast("double") / F.col("s_den").cast("double")
    return ma.join(F.broadcast(season), ["event_type", "dow"]).select(
        "event_type",
        "day",
        "x",
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        F.when(
            F.col("c7") == 7,
            F.col("x").cast("double") - trend - seasonal,
        ).alias("residual"),
    )


@query("events_churn_hazard", oracle="""
    WITH d AS (
      SELECT user_id,
             CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS first_d,
             CAST(max(CAST(ts AS TIMESTAMP)) AS DATE) AS last_d
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    horizon AS (SELECT max(last_d) - 2 AS censor_d FROM d),
    lt AS (
      SELECT CAST(d.last_d - d.first_d AS INT) AS age_days,
             (d.last_d >= h.censor_d) AS censored
      FROM d, horizon h
    ),
    by_age AS (
      SELECT age_days,
             CAST(count(*) AS BIGINT) AS n_ending,
             CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
               AS n_churned
      FROM lt GROUP BY age_days
    ),
    risk AS (
      SELECT age_days, n_churned,
             sum(n_ending) OVER (ORDER BY age_days DESC
               ROWS UNBOUNDED PRECEDING) AS n_at_risk
      FROM by_age
    )
    SELECT age_days, CAST(n_at_risk AS BIGINT) AS n_at_risk, n_churned,
           round(CAST(n_churned AS DOUBLE) / CAST(n_at_risk AS DOUBLE), 8)
             AS hazard
    FROM risk
""")
def events_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival life table (new r6) — the churn-hazard
    readout behind retention modeling, on per-user PURCHASE activity
    spans: per age (days between first and last purchase), the number
    of users still at risk, the number churning at exactly that age,
    and the hazard d/n — with RIGHT-CENSORING handled correctly (users
    still purchasing within the 3-day horizon before the corpus's last
    purchase date are censored, not churned — the mistake naive churn
    queries make, counting every trailing user as lost). The
    Kaplan-Meier survival curve is the running product of (1 − hazard)
    over this table; emitting the hazard table keeps every value a
    single exact division (a cross-engine-deterministic running
    PRODUCT needs exp/log — libm — or unbounded rationals; the table
    is the estimator's sufficient statistic).

    Exactness: integer day lifetimes, exact integer churn/at-risk
    counts (n_at_risk = reverse-cumulative window over the age
    rollup), one double division per row.

    Scale shape: one user-keyed first/last agg (map-side), a 1-row
    broadcast horizon, an age rollup bounded by the calendar, one tiny
    window over it."""
    d = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.min("ts").cast("date").alias("first_d"),
            F.max("ts").cast("date").alias("last_d"),
        )
    )
    horizon = d.agg(F.date_sub(F.max("last_d"), 2).alias("censor_d"))
    lt = d.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.col("last_d"), F.col("first_d")).cast("int").alias("age_days"),
        (F.col("last_d") >= F.col("censor_d")).alias("censored"),
    )
    by_age = lt.groupBy("age_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ending"),
        F.sum(F.when(F.col("censored"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_churned"),
    )
    wrev = Window.orderBy(F.desc("age_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = by_age.withColumn(
        "n_at_risk", F.sum("n_ending").over(wrev).cast("bigint")
    )
    return risk.select(
        "age_days",
        "n_at_risk",
        "n_churned",
        F.round(
            F.col("n_churned").cast("double") / F.col("n_at_risk").cast("double"),
            8,
        ).alias("hazard"),
    )


SLO_TARGET_BP = 9000   # SLO: 90% non-error -> 10% error budget
SLO_ERR_BUDGET_BP = 10_000 - SLO_TARGET_BP  # error budget in basis points
# burn multiples ×10 (integer cross-multiplication needs integer burns);
# 2.2x fast / 2.1x slow — fixture-scaled so all three flags fire but
# stay the tail on the ~20%-error feed (workbook multiples assume 99.9% SLOs)
SLO_FAST_BURN_X10 = 22
SLO_SLOW_BURN_X10 = 21


@query("events_slo_burn", oracle=f"""
    WITH pts AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_err
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT hour_start, n_total, n_err,
             sum(n_err) OVER (ORDER BY hour_start
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS err_6h,
             sum(n_total) OVER (ORDER BY hour_start
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS tot_6h,
             count(*) OVER (ORDER BY hour_start
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS c_6h
      FROM pts
    )
    SELECT hour_start, n_total, n_err,
           CAST(err_6h AS BIGINT) AS err_6h, CAST(tot_6h AS BIGINT) AS tot_6h,
           (10 * 10000 * n_err > {SLO_FAST_BURN_X10} * {SLO_ERR_BUDGET_BP} * n_total)
             AS fast_burn,
           (c_6h = 6 AND 10 * 10000 * err_6h
              > {SLO_SLOW_BURN_X10} * {SLO_ERR_BUDGET_BP} * tot_6h) AS slow_burn,
           ((10 * 10000 * n_err > {SLO_FAST_BURN_X10} * {SLO_ERR_BUDGET_BP} * n_total)
            AND c_6h = 6 AND 10 * 10000 * err_6h
              > {SLO_SLOW_BURN_X10} * {SLO_ERR_BUDGET_BP} * tot_6h) AS page
    FROM w
""")
def events_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO burn-rate alerting (new r6) — the Google SRE
    workbook's error-budget alert: page only when BOTH the fast window
    (1 h, burn ≥ {SLO_FAST_BURN_X10 / 10}×) and the slow window (6 h,
    burn ≥ {SLO_SLOW_BURN_X10 / 10}×) exceed their burn-rate thresholds — fast-only
    flaps on blips, slow-only pages too late; the AND gives speed AND
    sustained evidence. Fixture SLO: {SLO_ERR_BUDGET_BP} bp error
    budget over the events feed's error rate.

    Exactness: burn-rate comparisons are cross-multiplied INTEGER
    inequalities (10000·err > burn·budget_bp·total) — no rate division
    anywhere, so no float and no divide-by-zero on empty hours; window
    sums are exact BIGINTs.

    Scale shape: one map-side-combinable hourly rollup, then two frame
    aggregates on the |hours| rollup (calendar-bounded — the same
    domain-bound argument as CUSUM; partitioned by series when
    monitoring per-service SLOs, unpartitioned here as the feed is one
    service)."""
    pts = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_start"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_err"),
        )
    )
    w6 = Window.orderBy("hour_start").rowsBetween(-5, Window.currentRow)
    w = pts.select(
        "hour_start",
        "n_total",
        "n_err",
        F.sum("n_err").over(w6).cast("bigint").alias("err_6h"),
        F.sum("n_total").over(w6).cast("bigint").alias("tot_6h"),
        F.count(F.lit(1)).over(w6).alias("c_6h"),
    )
    fast = (
        10 * 10000 * F.col("n_err")
        > SLO_FAST_BURN_X10 * SLO_ERR_BUDGET_BP * F.col("n_total")
    )
    slow = (F.col("c_6h") == 6) & (
        10 * 10000 * F.col("err_6h")
        > SLO_SLOW_BURN_X10 * SLO_ERR_BUDGET_BP * F.col("tot_6h")
    )
    return w.select(
        "hour_start",
        "n_total",
        "n_err",
        "err_6h",
        "tot_6h",
        fast.alias("fast_burn"),
        slow.alias("slow_burn"),
        (fast & slow).alias("page"),
    )


@query("events_streaks", oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    ),
    isl AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
               ORDER BY day) AS INT) AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island, CAST(count(*) AS BIGINT) AS streak_days,
             min(day) AS streak_start
      FROM isl GROUP BY user_id, island
    ),
    best AS (
      SELECT user_id,
             max(ROW(streak_days, streak_start)) AS b,
             CAST(count(*) AS BIGINT) AS n_streaks,
             CAST(sum(streak_days) AS BIGINT) AS active_days
      FROM streaks GROUP BY user_id
    )
    SELECT user_id, b[1] AS longest_streak, b[2] AS streak_start,
           n_streaks, active_days
    FROM best
""")
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (new r6) — the
    engagement metric behind every 'N-day streak' product surface, and
    the third distinct gaps-and-islands variant in the suite: islands
    on CALENDAR ADJACENCY (day − row_number is constant within a run
    of consecutive days), vs time-gap islands (events_sessionize) and
    boolean-run islands (events_incidents). Ties between equal-length
    streaks resolve to the LATEST start via the max(struct) shuffle-
    once argmax — no window over the streaks.

    Exactness: pure date/integer arithmetic throughout. Scale shape:
    one distinct on (user, day) — map-side combinable and bounded by
    users × calendar — one user-partitioned row_number, two keyed
    aggregates."""
    days = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn(
        "island", F.expr("date_sub(day, CAST(row_number() OVER "
                         "(PARTITION BY user_id ORDER BY day) AS INT))")
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak_days"),
        F.min("day").alias("streak_start"),
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max(F.struct("streak_days", "streak_start")).alias("b"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.sum("streak_days").cast("bigint").alias("active_days"),
        )
        .select(
            "user_id",
            F.col("b.streak_days").alias("longest_streak"),
            F.col("b.streak_start").alias("streak_start"),
            "n_streaks",
            "active_days",
        )
    )


@query("events_incidents", oracle=f"""
    WITH pts AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_err
      FROM events GROUP BY 1
    ),
    flags AS (
      SELECT hour_start, n_total, n_err,
             (10 * 10000 * n_err > 22 * 1000 * n_total) AS firing
      FROM pts
    ),
    runs AS (
      SELECT *, CASE WHEN firing AND NOT coalesce(lag(firing)
               OVER (ORDER BY hour_start), FALSE) THEN 1 ELSE 0 END AS is_start
      FROM flags
    ),
    grp AS (
      SELECT *, sum(is_start) OVER (ORDER BY hour_start
               ROWS UNBOUNDED PRECEDING) AS incident_id
      FROM runs
    )
    SELECT CAST(incident_id AS BIGINT) AS incident_id,
           min(hour_start) AS started_at,
           max(hour_start) + INTERVAL 1 HOUR AS ended_at,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(n_err) AS BIGINT) AS total_errors,
           round(CAST(10000 * max(10000 * n_err // n_total) AS DOUBLE)
                 / 10000 / 10000, 8) AS peak_err_rate
    FROM grp WHERE firing GROUP BY incident_id
""")
def events_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert-to-incident collapsing (new r6) — the flap-suppression /
    dedup step between a firing alert rule and a pager: consecutive
    firing hours (the fast-burn condition from events_slo_burn) group
    into ONE incident row with start, end, duration, total errors and
    peak error rate — the gaps-and-islands rewrite on a BOOLEAN run
    (a new island starts where firing rises; compare events_sessionize,
    whose islands break on time gaps instead).

    Exactness: the firing predicate is the integer cross-multiplied
    burn comparison; island ids are exact running sums over the hourly
    rollup; the peak rate is computed from the exact integer basis-
    point maximum, divided once.

    Scale shape: everything runs on the calendar-bounded hourly
    rollup; per-service monitoring partitions the lag/cumsum windows
    by series exactly like CUSUM."""
    pts = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_start"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_err"),
        )
    )
    flags = pts.withColumn(
        "firing",
        10 * 10000 * F.col("n_err") > 22 * 1000 * F.col("n_total"),
    )
    w = Window.orderBy("hour_start")
    runs = flags.withColumn(
        "is_start",
        F.when(
            F.col("firing")
            & ~F.coalesce(F.lag("firing").over(w), F.lit(False)),
            1,
        ).otherwise(0),
    )
    grp = runs.withColumn(
        "incident_id",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        grp.filter(F.col("firing"))
        .groupBy(F.col("incident_id").cast("bigint").alias("incident_id"))
        .agg(
            F.min("hour_start").alias("started_at"),
            (F.max("hour_start") + F.expr("INTERVAL 1 HOUR")).alias("ended_at"),
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum("n_err").cast("bigint").alias("total_errors"),
            F.round(
                (
                    10000
                    * F.max(F.expr("(10000 * n_err) DIV n_total"))
                ).cast("double")
                / 10000
                / 10000,
                8,
            ).alias("peak_err_rate"),
        )
    )


STL_MAD_K = 4.4478  # 3 sigma × 1.4826 (normal-consistency MAD scale)


@query("timeseries_anomaly_stl", oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    ma AS (
      SELECT event_type, day, x,
             ((CAST(day - DATE '1970-01-05' AS INT) % 7) + 7) % 7 AS dow,
             sum(x) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             count(*) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      FROM daily
    ),
    season AS (
      SELECT event_type, dow,
             CAST(sum(7 * x - s7) AS BIGINT) AS s_num,
             CAST(7 * count(*) AS BIGINT) AS s_den
      FROM ma WHERE c7 = 7 GROUP BY event_type, dow
    ),
    res AS (
      SELECT m.event_type, m.day, m.x,
             CAST(m.x AS DOUBLE)
               - CAST(m.s7 AS DOUBLE) / CAST(7 AS DOUBLE)
               - CAST(s.s_num AS DOUBLE) / CAST(s.s_den AS DOUBLE) AS r
      FROM ma m JOIN season s
        ON m.event_type = s.event_type AND m.dow = s.dow
      WHERE m.c7 = 7
    ),
    med AS (
      SELECT event_type, min(r) FILTER (2 * rn >= n) AS med_r
      FROM (SELECT event_type, r,
                   row_number() OVER (PARTITION BY event_type
                     ORDER BY r, day) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM res)
      GROUP BY event_type
    ),
    madt AS (
      SELECT event_type, min(ad) FILTER (2 * rn >= n) AS mad
      FROM (SELECT r.event_type, abs(r.r - m.med_r) AS ad,
                   row_number() OVER (PARTITION BY r.event_type
                     ORDER BY abs(r.r - m.med_r), r.day) AS rn,
                   count(*) OVER (PARTITION BY r.event_type) AS n
            FROM res r JOIN med m USING (event_type))
      GROUP BY event_type
    )
    SELECT r.event_type, r.day, r.x,
           round(r.r, 8) AS residual,
           abs(r.r - m.med_r) > {STL_MAD_K} * t.mad AS is_anomaly
    FROM res r JOIN med m USING (event_type) JOIN madt t USING (event_type)
""")
def timeseries_anomaly_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decomposition-residual anomaly detection (new r6) — the robust
    monitor that events_anomaly_mad (raw volume) cannot be: anomalies
    are scored on the RESIDUAL after removing trend and weekly
    seasonality (timeseries_seasonal_decompose's output), so a busy
    Monday is normal and a quiet Monday is an anomaly — the
    STL-residual + MAD recipe (Cleveland; Twitter's AnomalyDetection).
    Threshold = 3σ via the 1.4826 MAD consistency constant, a literal.

    Determinism: residuals are the decompose key's bit-identical
    doubles; the median and MAD are LOWER order statistics (rank picks
    over identical double multisets — no interpolation), and the flag
    compares identical doubles. Emits every full-window day with its
    flag so the oracle checks the whole decision surface, not just the
    positives.

    Scale shape: everything after the one |series|x|days| rollup runs
    per-series (windows partitioned by event_type); the two rank picks
    are series-local sorts over the same tiny rollup."""
    dec = timeseries_seasonal_decompose(spark, sf_dir).filter(
        F.col("residual").isNotNull()
    )
    wcnt = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy("residual", "day")
    ranked = dec.select(
        "event_type",
        "day",
        "x",
        "residual",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wcnt).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.min(F.when(2 * F.col("rn") >= F.col("n"), F.col("residual"))).alias(
            "med_r"
        )
    )
    wad = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("residual") - F.col("med_r")), "day"
    )
    ranked2 = (
        ranked.join(F.broadcast(med), "event_type")
        .withColumn("rn2", F.row_number().over(wad))
    )
    mad = ranked2.groupBy("event_type").agg(
        F.min(
            F.when(
                2 * F.col("rn2") >= F.col("n"),
                F.abs(F.col("residual") - F.col("med_r")),
            )
        ).alias("mad")
    )
    return (
        ranked.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            "x",
            F.round(F.col("residual"), 8).alias("residual"),
            (
                F.abs(F.col("residual") - F.col("med_r"))
                > F.lit(STL_MAD_K) * F.col("mad")
            ).alias("is_anomaly"),
        )
    )


@query("timeseries_rolling_median", oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    expanded AS (
      SELECT d.event_type, d.day + CAST(o.o AS INT) AS anchor, d.x
      FROM daily d, (SELECT unnest(range(0, 7)) AS o) o
    ),
    med AS (
      SELECT e.event_type, e.anchor AS day,
             CAST(count(*) AS BIGINT) AS n_window,
             (list_sort(list(e.x)))[CAST(ceil(count(*) / 2.0) AS INT)]
               AS rolling_median
      FROM expanded e GROUP BY e.event_type, e.anchor
    )
    SELECT m.event_type, m.day, d.x, m.n_window, m.rolling_median
    FROM med m JOIN daily d ON d.event_type = m.event_type
     AND d.day = m.day
""")
def timeseries_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day MEDIAN filter (new r6) — the robust smoother the
    moving average is not (one spike drags a mean for a week; the
    median filter rejects it outright — the standard pre-step before
    thresholding noisy ops series). Each day's window covers the
    TRAILING 7 days; edge days report the median of the days available
    (n_window < 7), the filtfilt-free convention.

    Exactness: windows materialize by exploding each daily point to
    the ≤7 anchors it serves (bounded fan-out — the windowed-COUNT-
    DISTINCT rewrite of events_dau_wau, applied to an order statistic
    that no frame aggregate computes), and the LOWER median is element
    ceil(n/2) of the sorted ≤7-element array — exact integers, no
    interpolation, deterministic under any partitioning because the
    array is sorted after collection.

    Scale shape: the ×7 explode happens on the |series|×|days| rollup,
    never raw events; the per-anchor groups are ≤7 rows by
    construction, map-side combinable."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    expanded = daily.select(
        "event_type",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "day",
    ).select(
        "event_type", "x", F.expr("date_add(day, o)").alias("anchor")
    )
    med = expanded.groupBy("event_type", F.col("anchor").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_window"),
        F.element_at(
            F.sort_array(F.collect_list("x")),
            F.ceil(F.count(F.lit(1)) / 2).cast("int"),
        ).alias("rolling_median"),
    )
    return med.join(daily, ["event_type", "day"]).select(
        "event_type", "day", "x", "n_window", "rolling_median"
    )


@query("timeseries_forecast_snaive", oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, day, x,
             lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS yhat,
             lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS naive1,
             max(day) OVER (PARTITION BY event_type) AS max_day
      FROM daily
    ),
    test AS (
      SELECT * FROM lagged
      WHERE day > max_day - 7 AND yhat IS NOT NULL AND naive1 IS NOT NULL
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(abs(x - yhat)) AS BIGINT) AS sae_snaive,
           CAST(sum(abs(x - naive1)) AS BIGINT) AS sae_naive1,
           CAST(sum(abs(x - yhat)) AS DOUBLE) / count(*) AS mae_snaive,
           CAST(sum(abs(x - naive1)) AS DOUBLE) / count(*) AS mae_naive1
    FROM test GROUP BY event_type
""")
def timeseries_forecast_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest (new r6) — the forecasting
    BASELINE every model must beat (Hyndman's forecasting bible uses it
    as the benchmark for seasonal series): predict day t with the value
    from t-7, scored by MAE over the series' final week against the
    1-day naive (persistence) baseline. This is the evaluation harness
    shape of a forecasting pipeline: rollup → lag features → holdout
    window → per-series error aggregate.

    Exactness: counts, lags and absolute errors are pure BIGINTs; the
    two MAEs are single divisions of identical exact integers. The
    holdout predicate (day > max_day - 7) is date arithmetic, identical
    in both engines.

    Scale shape: one map-side-combinable rollup to |series|x|days|,
    one window pass partitioned BY SERIES producing both lags and the
    per-series max-day (no separate join), then a tiny per-series
    aggregate. Nothing touches raw-event grain after the first
    groupBy."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "x",
        F.lag("x", 7).over(w).alias("yhat"),
        F.lag("x", 1).over(w).alias("naive1"),
        F.max("day").over(Window.partitionBy("event_type")).alias("max_day"),
    )
    test = lagged.filter(
        (F.col("day") > F.date_sub(F.col("max_day"), 7))
        & F.col("yhat").isNotNull()
        & F.col("naive1").isNotNull()
    )
    return test.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.abs(F.col("x") - F.col("yhat"))).cast("bigint").alias("sae_snaive"),
        F.sum(F.abs(F.col("x") - F.col("naive1")))
        .cast("bigint")
        .alias("sae_naive1"),
        (
            F.sum(F.abs(F.col("x") - F.col("yhat"))).cast("double")
            / F.count(F.lit(1))
        ).alias("mae_snaive"),
        (
            F.sum(F.abs(F.col("x") - F.col("naive1"))).cast("double")
            / F.count(F.lit(1))
        ).alias("mae_naive1"),
    )


@query("timeseries_model_select", oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    feat AS (
      SELECT event_type, day, x,
             lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS l7,
             lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
             CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s7,
             CAST(count(x) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS c7,
             max(day) OVER (PARTITION BY event_type) AS max_day
      FROM daily
    ),
    test AS (
      SELECT * FROM feat
      WHERE day > max_day - 7 AND l7 IS NOT NULL AND l1 IS NOT NULL
        AND c7 = 7
    ),
    sae AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(7 * abs(x - l7)) AS BIGINT) AS sae7_snaive,
             CAST(sum(7 * abs(x - l1)) AS BIGINT) AS sae7_naive1,
             CAST(sum(abs(7 * x - s7)) AS BIGINT) AS sae7_ma7
      FROM test GROUP BY event_type
    )
    SELECT event_type, n_test, sae7_snaive, sae7_naive1, sae7_ma7,
           CASE WHEN sae7_snaive <= sae7_naive1 AND sae7_snaive <= sae7_ma7
                THEN 'snaive'
                WHEN sae7_naive1 <= sae7_ma7 THEN 'naive1'
                ELSE 'ma7' END AS winner,
           CAST(least(sae7_snaive, sae7_naive1, sae7_ma7) AS DOUBLE)
             / CAST(7 * n_test AS DOUBLE) AS winner_mae
    FROM sae
""")
def timeseries_model_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast MODEL SELECTION over a common holdout (new r12) — the
    decision step timeseries_forecast_snaive's error report feeds: per
    series, backtest three standard baselines (seasonal-naive t−7,
    persistence t−1, trailing 7-day mean) on the final week and pick
    the winner — what an operational forecasting pipeline does before
    promoting a method per series (the M-competition protocol in
    miniature, and the cross-method audit discipline of
    events_survival_consistency applied to the forecasting family).

    Exactness: the three SAEs are compared at a COMMON integer 7×
    scale — 7·|x−l7|, 7·|x−l1|, |7x−Σprev7| — so the winner is a pure
    BIGINT argmin with a fixed preference order (snaive ≻ naive1 ≻
    ma7) on ties; the only float is the winner's MAE, one division of
    identical exact integers in identical text. Lags and frames are
    row-based over the observed daily rollup, identical in both
    engines (the fixture calendar is dense; stated).

    Scale shape: the snaive plan exactly — one map-side-combinable
    rollup to |series|×|days|, one series-partitioned window pass
    producing all three feature columns in one Sort, a per-series
    aggregate, and a 9-row decision projection."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wf = w.rowsBetween(-7, -1)
    feat = daily.select(
        "event_type",
        "day",
        "x",
        F.lag("x", 7).over(w).alias("l7"),
        F.lag("x", 1).over(w).alias("l1"),
        F.sum("x").over(wf).cast("bigint").alias("s7"),
        F.count("x").over(wf).cast("bigint").alias("c7"),
        F.max("day").over(Window.partitionBy("event_type")).alias("max_day"),
    )
    test = feat.filter(
        (F.col("day") > F.date_sub(F.col("max_day"), 7))
        & F.col("l7").isNotNull()
        & F.col("l1").isNotNull()
        & (F.col("c7") == 7)
    )
    sae = test.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(7 * F.abs(F.col("x") - F.col("l7")))
        .cast("bigint")
        .alias("sae7_snaive"),
        F.sum(7 * F.abs(F.col("x") - F.col("l1")))
        .cast("bigint")
        .alias("sae7_naive1"),
        F.sum(F.abs(7 * F.col("x") - F.col("s7")))
        .cast("bigint")
        .alias("sae7_ma7"),
    )
    winner = (
        F.when(
            (F.col("sae7_snaive") <= F.col("sae7_naive1"))
            & (F.col("sae7_snaive") <= F.col("sae7_ma7")),
            F.lit("snaive"),
        )
        .when(F.col("sae7_naive1") <= F.col("sae7_ma7"), F.lit("naive1"))
        .otherwise(F.lit("ma7"))
    )
    return sae.select(
        "event_type",
        "n_test",
        "sae7_snaive",
        "sae7_naive1",
        "sae7_ma7",
        winner.alias("winner"),
        (
            F.least("sae7_snaive", "sae7_naive1", "sae7_ma7").cast("double")
            / (7 * F.col("n_test")).cast("double")
        ).alias("winner_mae"),
    )


@query("events_mannwhitney", oracle="""
    WITH pts AS (
      SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
               % 2 AS variant,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    g AS (
      SELECT v,
             CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(count(*) AS BIGINT) AS cnt
      FROM pts GROUP BY v
    ),
    cum AS (
      SELECT v, c_a, cnt,
             sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumw
      FROM g
    ),
    s AS (
      SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
             CAST(sum(cnt - c_a) AS BIGINT) AS n_b,
             CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(c_a * (2 * cumw - cnt + 1)) AS BIGINT) AS r2_a,
             CAST(sum(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt)
                  AS DECIMAL(38,0)) AS t_ties
      FROM cum
    )
    SELECT n_a, n_b,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2 AS u_a,
           round(
             (CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
              - CAST(n_a * n_b AS DOUBLE))
             / (2 * sqrt(CAST(n_a * n_b AS DOUBLE) / 12.0
                 * (CAST(n + 1 AS DOUBLE)
                    - CAST(t_ties AS DOUBLE)
                      / CAST(n * (n - 1) AS DOUBLE)))), 8) AS z
    FROM s
""")
def events_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test on A/B purchase revenue (new r6) — the
    nonparametric LOCATION test completing the experimentation suite
    (z: proportions; Welch t: means, normality-leaning; KS: whole
    distribution; U: median-shift, outlier-robust — the test a skewed
    revenue metric actually wants). Normal approximation with the
    standard TIE CORRECTION, since cents-quantized revenue ties
    heavily.

    Exactness: midranks never materialize as halves — the per-value
    group contributes c_a·(2·cumw − cnt + 1) to the DOUBLED rank sum,
    so R2 and U2 = R2 − n_a(n_a+1) are exact BIGINTs; the tie term
    Σ(t³−t) is an exact DECIMAL(38,0); z is one shared double
    expression over those exact integers (single sqrt).

    Scale shape: the ranking needs a total order — taken over the
    VALUE ROLLUP, bounded by the cents price domain, not the corpus
    (the events_ks_test device), so the one ordered scan walks a
    domain-bounded table; everything upstream is one map-side
    combinable groupBy of the raw stream."""
    pts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 4),
                    16,
                    10,
                ).cast("int")
                % 2
            ).alias("variant"),
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v"),
        )
    )
    g = pts.groupBy("v").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c_a"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.withColumn("cumw", F.sum("cnt").over(wcum))
    s = cum.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum(F.col("cnt") - F.col("c_a")).cast("bigint").alias("n_b"),
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("c_a") * (2 * F.col("cumw") - F.col("cnt") + 1))
        .cast("bigint")
        .alias("r2_a"),
        F.sum(
            F.col("cnt").cast("decimal(38,0)") * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        )
        .cast("decimal(38,0)")
        .alias("t_ties"),
    )
    u2 = F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)
    return s.select(
        "n_a",
        "n_b",
        u2.cast("bigint").alias("u2_a"),
        (u2.cast("double") / 2).alias("u_a"),
        F.round(
            (u2.cast("double") - (F.col("n_a") * F.col("n_b")).cast("double"))
            / (
                2
                * F.sqrt(
                    (F.col("n_a") * F.col("n_b")).cast("double")
                    / F.lit(12.0)
                    * (
                        (F.col("n") + 1).cast("double")
                        - F.col("t_ties").cast("double")
                        / (F.col("n") * (F.col("n") - 1)).cast("double")
                    )
                )
            ),
            8,
        ).alias("z"),
    )


@query("events_ks_test", oracle="""
    WITH pts AS (
      SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
               % 2 AS variant,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    g AS (
      SELECT v,
             CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
      FROM pts GROUP BY v
    ),
    cum AS (
      SELECT v,
             sum(c_a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
             sum(c_b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb,
             sum(c_a) OVER () AS n_a, sum(c_b) OVER () AS n_b
      FROM g
    )
    SELECT CAST(max(n_a) AS BIGINT) AS n_a,
           CAST(max(n_b) AS BIGINT) AS n_b,
           CAST(max(abs(ca * n_b - cb * n_a)) AS BIGINT) AS d_num,
           CAST(max(abs(ca * n_b - cb * n_a)) AS DOUBLE)
             / (CAST(max(n_a) AS DOUBLE) * CAST(max(n_b) AS DOUBLE)) AS d_stat,
           (CAST(max(abs(ca * n_b - cb * n_a)) AS DOUBLE)
             / (CAST(max(n_a) AS DOUBLE) * CAST(max(n_b) AS DOUBLE)))
           > (CAST(1.358 AS DOUBLE)
              * sqrt(CAST(max(n_a) + max(n_b) AS DOUBLE)
                     / (CAST(max(n_a) AS DOUBLE) * CAST(max(n_b) AS DOUBLE))))
             AS reject_h0
    FROM cum
""")
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test on purchase-revenue
    DISTRIBUTIONS across the md5-deterministic A/B arms (new r6) — the
    nonparametric sibling of the Welch t (means) and z-test
    (proportions): detects ANY distributional shift, not just location.

    Exactness: D = max|F_a - F_b| is evaluated as the exact INTEGER
    max|ca*n_b - cb*n_a| over the pooled support — no per-step float
    division — then divided once by n_a*n_b; the alpha=0.05 rejection
    threshold 1.358*sqrt((n_a+n_b)/(n_a*n_b)) uses only IEEE-exact
    sqrt/*,/ (no libm), so both engines agree bit-for-bit.

    Scale shape: revenue quantizes to the cents grid (DECIMAL(18,2)),
    so the ECDF support is bounded by the PRICE DOMAIN, not the corpus
    — 100 TB of purchases still roll up (one map-side-combinable
    groupBy) to at most |distinct prices| rows, and the ordered scan
    that takes the running maximum walks that bounded table. The same
    rollup is what a t-digest would sketch; here the domain bound makes
    the exact answer affordable."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    pts = ev.select(
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
            .cast("int")
            % 2
        ).alias("variant"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    g = pts.groupBy("v").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c_b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = g.select(
        F.sum("c_a").over(w).alias("ca"),
        F.sum("c_b").over(w).alias("cb"),
        F.sum("c_a").over(Window.partitionBy()).alias("n_a"),
        F.sum("c_b").over(Window.partitionBy()).alias("n_b"),
    )
    return cum.agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.max(F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")))
        .cast("bigint")
        .alias("d_num"),
        F.expr(
            "CAST(max(abs(ca * n_b - cb * n_a)) AS DOUBLE)"
            " / (CAST(max(n_a) AS DOUBLE) * CAST(max(n_b) AS DOUBLE))"
        ).alias("d_stat"),
        F.expr(
            "(CAST(max(abs(ca * n_b - cb * n_a)) AS DOUBLE)"
            " / (CAST(max(n_a) AS DOUBLE) * CAST(max(n_b) AS DOUBLE)))"
            " > (CAST(1.358 AS DOUBLE)"
            "    * sqrt(CAST(max(n_a) + max(n_b) AS DOUBLE)"
            "           / (CAST(max(n_a) AS DOUBLE) * CAST(max(n_b) AS DOUBLE))))"
        ).alias("reject_h0"),
    )
