"""Custom stateful streaming operator — applyInPandasWithState.

Beyond-reference (SURVEY §2.9: the reference has no stateful streaming);
this is the Structured Streaming pattern for operators that need
arbitrary per-key state across micro-batches. The demo operator keeps a
running (count, sum) per user_id — the building block for incremental
sessionization / rate counters.

State lives in the state store (checkpointed, per-key, partitioned by
the groupBy key) — no driver state, scales with executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from quackflight_spark.registry import query

OUTPUT_SCHEMA = "user_id bigint, n bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum(value)) per user across micro-batches."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [round(total, 2)]})


def attach(grouped):
    """events.groupBy('user_id') → streaming running totals."""
    return grouped.applyInPandasWithState(
        running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


STATE_CENTS_SCHEMA = "n bigint, cents bigint"


def running_totals_exact(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum) per user with INTEGER-CENTS state.

    Accumulating a float sum across micro-batches makes the result
    depend on batch order (IEEE addition is not associative); holding
    the metric as integer cents makes the fold exact and batch-order
    independent — which is what lets the registered key carry a strict
    value-hash oracle rather than a tolerance compare."""
    if state.exists:
        n, cents = state.get
    else:
        n, cents = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # round half AWAY FROM ZERO to match the oracle's DECIMAL(18,2)
        # cast — pandas .round() is banker's half-even, which diverges on
        # any exact half at the third decimal (r3 advice)
        import numpy as np

        v = pdf["value"].to_numpy(dtype="float64") * 100.0
        cents += int(np.trunc(v + np.copysign(0.5, v)).astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n": [n], "total": [cents / 100.0]}
    )


def attach_exact(grouped):
    """events.groupBy('user_id') → exact streaming running totals."""
    return grouped.applyInPandasWithState(
        running_totals_exact,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_CENTS_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query("stream_running_totals", oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
                AS DOUBLE) / 100.0 AS total
    FROM events
    GROUP BY user_id
""")
def stream_running_totals(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Registered surface for the custom stateful operator: drain the
    events feed through applyInPandasWithState running totals and return
    each user's final state row. Because the per-key fold is exact
    (integer cents), the final state equals the batch aggregate exactly
    — the DuckDB GROUP BY is a strict oracle, proving the stateful
    operator loses nothing across micro-batch boundaries.

    Scale shape: state is per-key in the executor-local state store
    (checkpointed, partitioned by the groupBy key) — no driver state;
    update-mode emits only keys touched per batch."""
    import hashlib

    from quackflight_spark.sources.fixtures import events_ts_normalized
    from quackflight_spark.streaming.source import (
        drain_to_memory,
        stage_events_stream,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stream = events_ts_normalized(
        stage_events_stream(spark, sf_dir, "state")
    ).select("user_id", "value")
    out = attach_exact(stream.groupBy("user_id"))
    # The stateful shuffle instantiates one state store + one Python
    # worker per shuffle partition; for a 150-key state that fixed cost
    # dwarfs the work. 8 partitions is still executor-parallel; at real
    # scale (millions of keys) raise it back toward the core count.
    snap = drain_to_memory(
        spark, out, f"running_totals_{tag}", "update", shuffle_partitions=8
    )
    # update-mode memory sink may hold several emissions per key (one per
    # micro-batch that touched it); the final state per key is the row
    # with the highest n.
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    w = W.partitionBy("user_id").orderBy(F.desc("n"))
    return (
        snap.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "n", "total")
    )


PATTERN_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, matched boolean"
PATTERN_STATE_SCHEMA = "matched boolean, pending boolean, n bigint"


def pattern_automaton(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming row-pattern matcher for 'c[^p]*p' (click eventually
    converting to purchase with no purchase in between) as a 2-bit
    AUTOMATON per user — `pending` = saw a click since the last
    purchase, `matched` = sticky accept — NOT an accumulated history
    string. The state is O(1) per key regardless of how many events a
    user ever produces; this is the scale difference between streaming
    MATCH_RECOGNIZE and replaying the batch fold (the batch sibling,
    events_pattern_match, folds the whole coded history because batch
    can afford to see it at once)."""
    if state.exists:
        matched, pending, n = state.get
    else:
        matched, pending, n = False, False, 0
    for pdf in pdfs:
        # event-time order within the batch: the fold is order-sensitive
        # by definition (a purchase before a click must not match), and
        # rows inside a micro-batch arrive unordered
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        if not matched:
            for et in pdf["event_type"]:
                if et == "click":
                    pending = True
                elif et == "purchase":
                    if pending:
                        matched = True
                        break
                    pending = False
    state.update((matched, pending, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "matched": [matched]}
    )


@query("stream_pattern_match", oracle="""
    WITH coded AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN event_type = 'click' THEN 'c'
                  WHEN event_type = 'purchase' THEN 'p'
                  ELSE '.' END AS code
      FROM events
    ),
    seqs AS (
      SELECT user_id,
             string_agg(code, '' ORDER BY ts, event_id) AS seq,
             CAST(count(*) AS BIGINT) AS n_events
      FROM coded GROUP BY user_id
    )
    SELECT user_id, n_events,
           regexp_matches(seq, 'c[^p]*p') AS matched
    FROM seqs
""")
def stream_pattern_match(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Streaming MATCH_RECOGNIZE-lite (new r6): the events feed drains
    through an applyInPandasWithState automaton that tracks, per user,
    whether a click-then-purchase pattern has completed — the streaming
    sibling of events_pattern_match with O(1) state per key (2 booleans
    + a count in the executor-local state store; no history retained).
    Because the automaton accepts exactly the language of the batch
    regex, the final state equals the batch fold and the DuckDB oracle
    is strict — proving no state is lost or reordered across
    micro-batch boundaries.

    Ordering contract: rows are event-time-sorted WITHIN each
    micro-batch (the fold is order-sensitive); cross-batch order follows
    source arrival order, correct for in-order feeds like this file
    source — an out-of-order producer needs the watermark-and-reorder
    front end of stream_watermark_late ahead of the automaton."""
    import hashlib

    from quackflight_spark.sources.fixtures import events_ts_normalized
    from quackflight_spark.streaming.source import (
        drain_to_memory,
        stage_events_stream,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stream = events_ts_normalized(
        stage_events_stream(spark, sf_dir, "pattern")
    ).select("user_id", "ts", "event_id", "event_type")
    out = stream.groupBy("user_id").applyInPandasWithState(
        pattern_automaton,
        outputStructType=PATTERN_OUTPUT_SCHEMA,
        stateStructType=PATTERN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    snap = drain_to_memory(
        spark, out, f"pattern_match_{tag}", "update", shuffle_partitions=8
    )
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        snap.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "n_events", "matched")
    )


HOLT_OUTPUT_SCHEMA = "user_id bigint, n bigint, level_cents bigint, trend_cents bigint"
HOLT_STATE_SCHEMA = "lv bigint, tr bigint, n bigint"


def holt_smoother(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming Holt double exponential smoothing: per-user (level,
    trend) in integer cents, folded over purchase events in event-time
    order — EXACTLY the pair the batch operator's shard-boundary note
    promises (timeseries_holt docstring): state is two bigints however
    long the series runs, and the integer floor-halving fold is
    batch-order-exact, so the final state replays in SQL."""
    import numpy as np

    if state.exists:
        lv, tr, n = state.get
    else:
        lv, tr, n = None, 0, 0
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        v = pdf["value"].to_numpy(dtype="float64") * 100.0
        cents = np.trunc(v + np.copysign(0.5, v)).astype("int64")
        for x in cents:
            x = int(x)
            n += 1
            if lv is None:
                lv = x
                continue
            # Python // is floor division for any sign — identical to
            # the CAST(floor(x/2.0)) both engines' oracles use
            nl = (lv + tr + x) // 2
            tr = (tr + nl - lv) // 2
            lv = nl
    state.update((lv if lv is not None else 0, tr, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n": [n],
            "level_cents": [lv if lv is not None else 0],
            "trend_cents": [tr],
        }
    )


@query("stream_holt", oracle="""
    WITH RECURSIVE ranked AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS i,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events WHERE event_type = 'purchase'
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
    SELECT user_id, CAST(n AS BIGINT) AS n, lv AS level_cents,
           tr AS trend_cents
    FROM st WHERE i = n
""")
def stream_holt(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Streaming Holt smoothing (new r6): each user's purchase-revenue
    signal smoothed incrementally as events arrive — the
    applyInPandasWithState realization of timeseries_holt's
    shard-boundary contract: per-key state is exactly (level, trend, n)
    in integer cents, O(1) forever, and the floor-halving fold is
    bit-exact, so the final state after draining the feed equals the
    batch recursion and the recursive-CTE oracle is strict. Same
    ordering contract as stream_pattern_match: event-time sort within
    each micro-batch, in-order feed across batches."""
    import hashlib

    from quackflight_spark.sources.fixtures import events_ts_normalized
    from quackflight_spark.streaming.source import (
        drain_to_memory,
        stage_events_stream,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stream = (
        events_ts_normalized(stage_events_stream(spark, sf_dir, "holt"))
        .filter("event_type = 'purchase'")
        .select("user_id", "ts", "event_id", "value")
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        holt_smoother,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    snap = drain_to_memory(
        spark, out, f"stream_holt_{tag}", "update", shuffle_partitions=8
    )
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    w = W.partitionBy("user_id").orderBy(F.desc("n"))
    return (
        snap.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "n", "level_cents", "trend_cents")
    )


CDC_OUTPUT_SCHEMA = (
    "user_id bigint, last_op string, last_cents bigint, last_ts_us bigint, "
    "n_changes bigint"
)
CDC_STATE_SCHEMA = "ts_us bigint, eid bigint, op string, cents bigint, n bigint"


def cdc_compactor(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming CDC compaction: per-key state is the LATEST change row
    by (ts, event_id) plus a change counter — the O(1) streaming form of
    merge_cdc_apply's max(struct) argmax. The max-merge is associative
    and commutative, so the fold is batch-order-independent by
    construction (unlike the order-sensitive automaton keys, this one
    needs no within-batch sort to stay exact — kept anyway for clarity
    when a human reads emitted intermediates)."""
    import numpy as np

    if state.exists:
        ts_us, eid, op, cents, n = state.get
    else:
        ts_us, eid, op, cents, n = -1, -1, "", 0, 0
    for pdf in pdfs:
        n += len(pdf)
        ts_np = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        v = pdf["value"].to_numpy(dtype="float64") * 100.0
        cents_np = np.trunc(v + np.copysign(0.5, v)).astype("int64")
        for t, e, et, c in zip(
            ts_np, pdf["event_id"].to_numpy(), pdf["event_type"], cents_np
        ):
            if (t, e) > (ts_us, eid):
                ts_us, eid = int(t), int(e)
                op = "I" if et == "signup" else ("D" if et == "error" else "U")
                cents = int(c)
    state.update((ts_us, eid, op, cents, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "last_op": [op],
            "last_cents": [cents],
            "last_ts_us": [ts_us],
            "n_changes": [n],
        }
    )


@query("stream_cdc_apply", oracle="""
    WITH log_ AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    compacted AS (
      SELECT user_id,
             max(ROW(ts, event_id, op, v)) AS last_,
             CAST(count(*) AS BIGINT) AS n_changes
      FROM log_ GROUP BY user_id
    )
    SELECT user_id,
           last_[3] AS last_op,
           CAST(last_[4] AS DOUBLE) AS last_value,
           last_[1] AS last_ts,
           n_changes
    FROM compacted
    WHERE last_[3] <> 'D'
""")
def stream_cdc_apply(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Streaming CDC apply (new r7): the Debezium-shaped changelog
    (merge_cdc_apply's batch fixture — signup=I, error=D tombstone,
    else U, keyed by user_id) maintained INCREMENTALLY as the feed
    drains: per-key state is one latest-change row + a counter, O(1)
    forever, updated by an associative max-merge — so the materialized
    'current table' is always one state-store read away, no log replay.
    This is the streaming-table duality (Kafka compacted topic / Delta
    CDF apply) as a custom stateful operator.

    Because max(struct) is associative AND commutative, the final state
    is exactly the batch compaction whatever the micro-batch slicing —
    merge_cdc_apply's DuckDB oracle is strict. Tombstoned keys stay in
    the STATE (a later change may resurrect them) but are filtered from
    the read surface, matching the batch key's contract."""
    import hashlib

    from quackflight_spark.sources.fixtures import events_ts_normalized
    from quackflight_spark.streaming.source import (
        drain_to_memory,
        stage_events_stream,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stream = events_ts_normalized(
        stage_events_stream(spark, sf_dir, "cdc")
    ).select("user_id", "ts", "event_id", "event_type", "value")
    out = stream.groupBy("user_id").applyInPandasWithState(
        cdc_compactor,
        outputStructType=CDC_OUTPUT_SCHEMA,
        stateStructType=CDC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    snap = drain_to_memory(
        spark, out, f"stream_cdc_{tag}", "update", shuffle_partitions=8
    )
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    w = W.partitionBy("user_id").orderBy(F.desc("n_changes"))
    return (
        snap.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .filter(F.col("last_op") != "D")
        .select(
            "user_id",
            "last_op",
            (F.col("last_cents").cast("decimal(18,2)") / 100)
            .cast("double")
            .alias("last_value"),
            F.timestamp_micros(F.col("last_ts_us")).alias("last_ts"),
            "n_changes",
        )
    )


# ---------------------------------------------------------------------------
# stream_sprt — Wald's SPRT as an O(1)-state streaming monitor (r9)
# ---------------------------------------------------------------------------

SPRT_OUTPUT_SCHEMA = (
    "variant int, n_trials bigint, k_succ bigint, "
    "first_up bigint, first_dn bigint"
)
SPRT_STATE_SCHEMA = "n bigint, k bigint, first_up bigint, first_dn bigint"


def sprt_monitor(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    """Per-variant SPRT walk state: trial count n, success count k, and
    the first boundary-crossing trial indices (−1 = not yet crossed).
    O(1) per key forever — the monitor never retains a trial. The LLR
    is evaluated per arriving trial from (n, k) and the module
    constants; crossings latch once (a sequential test STOPS at its
    first crossing, later trials cannot un-cross it), so the fold is
    exact as long as trials arrive in (ts, event_id) order across
    batches — the stream_pattern_match ordering contract (within-batch
    sort here; cross-batch order is the source's per-key delivery
    order, which time-split files / Kafka per-partition order give)."""
    from quackflight_spark.streaming.stats_tests import (
        SPRT_A,
        SPRT_B,
        SPRT_L0,
        SPRT_L1,
    )

    if state.exists:
        n, k, first_up, first_dn = state.get
    else:
        n, k, first_up, first_dn = 0, 0, -1, -1
    # The pdfs iterator delivers the group in ~10k-row Arrow chunks
    # (spark.sql.execution.arrow.maxRecordsPerBatch); chunk order is not
    # an ordering guarantee, so concatenate and sort ONCE per batch —
    # sorting each chunk independently would leave the cross-chunk order
    # at the mercy of shuffle fetch order.
    chunks = [c for c in pdfs if len(c)]
    for pdf in (
        [pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])]
        if chunks
        else []
    ):
        for et in pdf["event_type"]:
            n += 1
            k += 1 if et == "purchase" else 0
            llr = k * SPRT_L1 + (n - k) * SPRT_L0
            if first_up < 0 and llr >= SPRT_A:
                first_up = n
            if first_dn < 0 and llr <= SPRT_B:
                first_dn = n
    state.update((n, k, first_up, first_dn))
    yield pd.DataFrame(
        {
            "variant": [key[0]],
            "n_trials": [n],
            "k_succ": [k],
            "first_up": [first_up],
            "first_dn": [first_dn],
        }
    )


def _stream_sprt_oracle() -> str:
    from quackflight_spark.registry import ORACLES

    # strict oracle: the batch events_sprt (same walk, same constants)
    return ORACLES["events_sprt"]


@query("stream_sprt", oracle=None)
def stream_sprt(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Streaming SPRT (new r9): events_sprt's always-valid sequential
    monitor run the way it is DESIGNED to run — incrementally on every
    arriving trial, per A/B variant, with O(1) state (n, k, and the two
    latched first-crossing indices). The batch key proves what the
    answer must be; this key proves the monitor maintains it from a
    live feed without ever retaining a trial — the state store holds
    4 BIGINTs per variant regardless of feed length (contrast a naive
    'recompute LLR over history' which replays the log per batch).

    Strictness: the drained state is compared against events_sprt's
    DuckDB oracle verbatim (registered at import; the decision and
    final LLR are derived from the drained exact-integer state by the
    same literal-constant expressions). Ordering contract as
    stream_pattern_match: order-sensitive fold, within-batch sort +
    in-order batch delivery."""
    import hashlib

    from pyspark.sql import functions as F

    from quackflight_spark.sources.fixtures import events_ts_normalized
    from quackflight_spark.streaming.source import (
        drain_to_memory,
        stage_events_stream,
    )
    from quackflight_spark.streaming.stats_tests import (
        SPRT_A,
        SPRT_B,
        SPRT_L0,
        SPRT_L1,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stream = events_ts_normalized(
        stage_events_stream(spark, sf_dir, "sprt")
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
            ).cast("int")
            % 2
        ).alias("variant"),
        "ts",
        "event_id",
        "event_type",
    )
    out = stream.groupBy("variant").applyInPandasWithState(
        sprt_monitor,
        outputStructType=SPRT_OUTPUT_SCHEMA,
        stateStructType=SPRT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    snap = drain_to_memory(
        spark, out, f"stream_sprt_{tag}", "update", shuffle_partitions=8
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("variant").orderBy(F.desc("n_trials"))
    latest = (
        snap.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    first_up = F.when(F.col("first_up") >= 0, F.col("first_up"))
    first_dn = F.when(F.col("first_dn") >= 0, F.col("first_dn"))
    llr_final = (
        F.col("k_succ").cast("double") * F.lit(SPRT_L1)
        + (F.col("n_trials") - F.col("k_succ")).cast("double") * F.lit(SPRT_L0)
    )
    return latest.select(
        "variant",
        "n_trials",
        "k_succ",
        F.round(llr_final, 8).alias("llr_final"),
        first_up.cast("bigint").alias("first_up"),
        first_dn.cast("bigint").alias("first_dn"),
        F.when(
            first_up.isNotNull() & (first_dn.isNull() | (first_up < first_dn)),
            F.lit("accept_h1"),
        )
        .when(first_dn.isNotNull(), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


# register the strict batch oracle for the streaming key (import-time;
# the @query decorator ran before events_sprt's oracle was guaranteed
# loadable, so wire it lazily here)
def _wire_stream_sprt_oracle() -> None:
    from quackflight_spark import registry

    import quackflight_spark.streaming.stats_tests  # noqa: F401

    registry.ORACLES["stream_sprt"] = registry.ORACLES["events_sprt"]


_wire_stream_sprt_oracle()


# ---------------------------------------------------------------------------
# stream_alert_hysteresis — threshold alerting with hysteresis (r9)
# ---------------------------------------------------------------------------

ALERT_HI = 6    # raise when an hour bucket exceeds this count
ALERT_LO = 3    # clear only when a bucket drops below this
ALERT_OUTPUT_SCHEMA = (
    "event_type string, n_buckets bigint, n_alerts bigint, alerting boolean"
)
ALERT_STATE_SCHEMA = "alerting boolean, n_alerts bigint, n_buckets bigint"


def alert_hysteresis(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    """Two-threshold alert automaton per series: RAISE when an hourly
    count exceeds ALERT_HI, CLEAR only below ALERT_LO — the hysteresis
    band that stops a series oscillating around one threshold from
    paging every hour (the PagerDuty/Alertmanager debounce semantics).
    State is O(1): (alerting, alert count, bucket count). Buckets are
    completed within the batch (the stream_pattern_match ordering
    contract: within-batch sort; cross-batch delivery must be
    bucket-aligned, which time-split files / watermarked upstream
    aggregation give)."""
    if state.exists:
        alerting, n_alerts, n_buckets = state.get
    else:
        alerting, n_alerts, n_buckets = False, 0, 0
    # Accumulate hour counts across ALL Arrow chunks before folding:
    # applyInPandasWithState splits a group into ~10k-row chunks
    # (spark.sql.execution.arrow.maxRecordsPerBatch), so an hour bucket
    # straddling a chunk boundary would otherwise be counted as two
    # buckets and fed through the automaton twice.
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        batch = pd.concat(chunks, ignore_index=True)
        counts = batch.groupby(batch["ts"].dt.floor("h")).size().sort_index()
        for c in counts:
            n_buckets += 1
            if not alerting and c > ALERT_HI:
                alerting = True
                n_alerts += 1
            elif alerting and c < ALERT_LO:
                alerting = False
    state.update((alerting, n_alerts, n_buckets))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_buckets": [n_buckets],
            "n_alerts": [n_alerts],
            "alerting": [alerting],
        }
    )


@query("stream_alert_hysteresis", oracle=f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, c,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr)
                  AS BIGINT) AS i,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM hourly
    ),
    st AS (
      SELECT event_type, CAST(1 AS BIGINT) AS i,
             c > {ALERT_HI} AS alerting,
             CAST(CASE WHEN c > {ALERT_HI} THEN 1 ELSE 0 END AS BIGINT)
               AS n_alerts,
             n
      FROM ranked WHERE i = 1
      UNION ALL
      SELECT s.event_type, s.i + 1,
             CASE WHEN NOT s.alerting AND r.c > {ALERT_HI} THEN true
                  WHEN s.alerting AND r.c < {ALERT_LO} THEN false
                  ELSE s.alerting END,
             s.n_alerts + CASE WHEN NOT s.alerting AND r.c > {ALERT_HI}
                               THEN 1 ELSE 0 END,
             s.n
      FROM st s JOIN ranked r ON r.event_type = s.event_type
       AND r.i = s.i + 1
    )
    SELECT event_type, n AS n_buckets, n_alerts, alerting
    FROM st WHERE i = n
""")
def stream_alert_hysteresis(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Streaming threshold alerting with HYSTERESIS (new r9): hourly
    counts per event_type run through a two-threshold automaton —
    raise above {ALERT_HI}, clear only below {ALERT_LO} — maintained
    incrementally with O(1) state per series. A single-threshold alert
    flaps on every boundary-straddling series; the hysteresis band is
    the ops-monitoring debounce every alerting system implements, here
    as a custom stateful operator whose drained state is STRICTLY
    oracle-checked (the recursive-CTE replay advances every series one
    bucket per step — the timeseries_holt idiom over an automaton).

    Order contract as stream_pattern_match: the fold is
    order-sensitive (an alert at bucket i depends on the state left by
    bucket i−1), so buckets sort within batch and batches must arrive
    bucket-aligned."""
    import hashlib

    from pyspark.sql import functions as F

    from quackflight_spark.sources.fixtures import events_ts_normalized
    from quackflight_spark.streaming.source import (
        drain_to_memory,
        stage_events_stream,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stream = events_ts_normalized(
        stage_events_stream(spark, sf_dir, "alert")
    ).select("event_type", "ts")
    out = stream.groupBy("event_type").applyInPandasWithState(
        alert_hysteresis,
        outputStructType=ALERT_OUTPUT_SCHEMA,
        stateStructType=ALERT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    snap = drain_to_memory(
        spark, out, f"stream_alert_{tag}", "update", shuffle_partitions=8
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy(F.desc("n_buckets"))
    return (
        snap.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("event_type", "n_buckets", "n_alerts", "alerting")
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — availability gate + new-API twin (r10)
# ---------------------------------------------------------------------------


def tws_available() -> bool:
    """True iff transformWithStateInPandas can actually run on this
    build. Mirrors avro_available / pil_available: feature-detect the
    REAL dependency chain, not a surface import — the public
    StatefulProcessor class imports fine without protobuf, but the
    state-server client's generated StateMessage_pb2 module needs
    google.protobuf the moment a query starts, which this container
    ships without (SURVEY §2.10). A properly-provisioned cluster
    (protobuf deployed with pyspark) returns True and the twin below
    activates."""
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False


def _make_running_totals_processor():
    """Build the StatefulProcessor twin of running_totals_exact for the
    transformWithStateInPandas successor API (SPARK-49564): the same
    integer-cents exact fold, state held in a named ValueState instead
    of the GroupState tuple. Constructed lazily so importing this
    module never touches the new API's machinery on gated builds."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    class RunningTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("cents", LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                # half-away-from-zero, as running_totals_exact
                v = pdf["value"].to_numpy(dtype="float64") * 100.0
                cents += int(
                    np.trunc(v + np.copysign(0.5, v)).astype("int64").sum()
                )
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total": [cents / 100.0]}
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor()


def stream_running_totals_tws(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """stream_running_totals re-expressed on transformWithStateInPandas
    — the applyInPandasWithState successor (typed named state, timers,
    initial-state seeding). The fold is the SAME exact integer-cents
    accumulation, so on a provisioned cluster this key carries the SAME
    strict batch oracle as stream_running_totals; here the gate raises
    the documented, actionable error instead of an opaque
    ModuleNotFoundError from inside a streaming epoch. Unregistered in
    queries() until a build where tws_available() is True can
    driver-prove it (the scan_avro precedent)."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf on the "
            "Python workers (the state-server client's generated "
            "StateMessage_pb2 imports it); this build ships without "
            "protobuf. Deploy protobuf>=4 with the application to enable "
            "the new-API twin; the applyInPandasWithState operators "
            "(stream_running_totals et al.) are the driver-proven "
            "equivalents on this build (see tws_available)."
        )
    import hashlib

    from quackflight_spark.sources.fixtures import events_ts_normalized
    from quackflight_spark.streaming.source import (
        drain_to_memory,
        stage_events_stream,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stream = events_ts_normalized(
        stage_events_stream(spark, sf_dir, "tws")
    ).select("user_id", "value")
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_running_totals_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    snap = drain_to_memory(
        spark, out, f"running_totals_tws_{tag}", "update", shuffle_partitions=8
    )
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy(F.desc("n"))
    return (
        snap.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "n", "total")
    )


# ---------------------------------------------------------------------------
# stream_kalman — the timeseries_kalman filter as a live monitor (r10)
# ---------------------------------------------------------------------------

KALMAN_OUTPUT_SCHEMA = (
    "event_type string, n_hours bigint, x double, sse double"
)
KALMAN_STATE_SCHEMA = "i bigint, x double, sse double"


def kalman_monitor(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    """Per-series local-level Kalman state: observation index i,
    filtered level x, accumulated innovation SSE — O(1) per key
    forever, the state a live anomaly monitor holds (the innovation
    e = z − x IS the anomaly score; timeseries_kalman's docstring has
    the model). Gains come from the shared literal schedule, so the
    drained state replays the batch key's oracle exactly. Hour buckets
    accumulate across ALL Arrow chunks before folding (the
    alert_hysteresis chunk contract), and the fold consumes buckets in
    hr order; cross-batch delivery must be bucket-aligned."""
    from quackflight_spark.streaming.timeseries_extra import (
        KALMAN_GAINS,
        KALMAN_M,
    )

    if state.exists:
        i, x, sse = state.get
    else:
        i, x, sse = 0, 0.0, 0.0
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        batch = pd.concat(chunks, ignore_index=True)
        counts = batch.groupby(batch["ts"].dt.floor("h")).size().sort_index()
        for z in counts:
            z = float(z)
            i += 1
            if i == 1:
                x = z
            else:
                k = KALMAN_GAINS[min(i, KALMAN_M) - 1]
                e = z - x
                x = x + k * e
                sse = sse + e * e
    state.update((i, x, sse))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n_hours": [i], "x": [x], "sse": [sse]}
    )


@query("stream_kalman", oracle=None)
def stream_kalman(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Streaming Kalman level monitor (new r10): timeseries_kalman run
    the way a production anomaly detector runs it — the filter state
    advanced incrementally per completed hour bucket, O(1) state per
    series (contrast replaying the series per batch). The drained
    state is compared verbatim against timeseries_kalman's DuckDB
    oracle (wired below, the stream_sprt device), so the monitor is
    proven to maintain EXACTLY the batch answer from a live feed —
    same literal gain schedule, same hr-sorted fold order."""
    import hashlib

    from pyspark.sql import functions as F

    from quackflight_spark.sources.fixtures import events_ts_normalized
    from quackflight_spark.streaming.source import (
        drain_to_memory,
        stage_events_stream,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stream = events_ts_normalized(
        stage_events_stream(spark, sf_dir, "kalman")
    ).select("event_type", "ts")
    out = stream.groupBy("event_type").applyInPandasWithState(
        kalman_monitor,
        outputStructType=KALMAN_OUTPUT_SCHEMA,
        stateStructType=KALMAN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    snap = drain_to_memory(
        spark, out, f"stream_kalman_{tag}", "update", shuffle_partitions=8
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy(F.desc("n_hours"))
    latest = (
        snap.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    )
    return latest.filter(F.col("n_hours") >= 2).select(
        "event_type",
        "n_hours",
        F.round(F.col("x"), 6).alias("level_kalman"),
        F.round(
            F.col("sse") / (F.col("n_hours") - 1).cast("double"), 6
        ).alias("innovation_mse"),
    )


def _wire_stream_kalman_oracle() -> None:
    from quackflight_spark import registry

    import quackflight_spark.streaming.timeseries_extra  # noqa: F401

    registry.ORACLES["stream_kalman"] = registry.ORACLES["timeseries_kalman"]


_wire_stream_kalman_oracle()
