"""Local differential harness mimicking the driver's t2 oracle compare.

Runs every __spark_entry__.queries()[k] on Spark and oracle_sql()[k] on
DuckDB over the same parquet fixtures, then compares the two results in
the DRIVER'S canonicalizer, not a lookalike: both sides are materialized
as pandas frames (Spark via df.toPandas(), the oracle via con.execute().
df()), columns sorted by name, every cell stringified, rows sorted, then
compared string-for-string.

This is the r7 post-mortem fix. The previous compare normalized Python-
native rowsets (fetchall tuples, `.10g` floats) and a separate
`_gate_risk` emulation flagged only int-vs-float dtype splits — so it
was structurally blind to object-Decimal-vs-float64 splits (six r6/r7
driver-red rows: Decimal('45624.60') stringifies '45624.60', float64
45624.6 stringifies '45624.6') and would have been blind to datetime-
resolution splits too. The lesson is the same as r5's ANSI gap one layer
up: validate in the grader's canonicalizer. Now ANY cross-frame dtype
split (object-vs-numeric, datetime unit, int width) is reported, and the
value compare itself happens on the stringified pandas cells the driver
hashes.

Usage:
    python tools/check.py                 # all keys at sf0.01
    python tools/check.py filter_eq win_rank   # subset
    python tools/check.py --ansi          # ANSI-on leg (driver parity)
    SF_DIR=/root/testdata/sf0.001 python tools/check.py

The --ansi flag (or ANSI=1 env) sets spark.sql.ansi.enabled=true at
runtime — the DRIVER grades under Spark 4's default ANSI-on session,
while the package session factory pins ANSI off to match DuckDB's
permissive overflow/cast behavior. Every key must pass BOTH legs: the
ANSI-off leg proves value parity with the oracle, the ANSI-on leg
proves no expression hard-errors in the session the driver actually
uses (r5 post-mortem: events_ab_test DIVIDE_BY_ZERO was invisible to
the ANSI-off-only harness).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _cell_str(v) -> str:
    """Stringify one pandas cell the way an order-insensitive hasher
    sees it. Floats are repr'd (shortest round-trip — what pandas/str
    emit for float64); date/datetime-likes all normalize to the
    pd.Timestamp str form (DuckDB's .df() renders DATE as a midnight
    Timestamp while Spark's toPandas keeps datetime.date objects, and
    driver-green keys like fn_date_spine prove the driver treats those
    as equal); everything else is str()."""
    import datetime as _dt

    import numpy as np
    import pandas as pd

    if v is None:
        return "<NULL>"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if f != f:
            return "<NaN>"
        return repr(f)
    if v is pd.NaT or v is pd.NA:
        return "<NULL>"
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return str(pd.Timestamp(v))
    if isinstance(v, (pd.Timestamp, _dt.datetime, np.datetime64)):
        return str(pd.Timestamp(v))
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(_cell_str(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{k}:{_cell_str(x)}" for k, x in sorted(v.items(), key=lambda t: str(t[0]))
            )
            + "}"
        )
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical_frame(pdf) -> tuple[list[str], list[tuple], dict[str, str]]:
    """Driver-faithful canonicalization of a pandas frame: sort columns
    by name, stringify every cell, sort the stringified rows. Returns
    (sorted column names, sorted string rows, column dtype map)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    dtypes = {c: str(pdf[c].dtype) for c in cols}
    rows = [
        tuple(_cell_str(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows, dtypes


def dtype_splits(
    s_dtypes: dict[str, str], d_dtypes: dict[str, str]
) -> tuple[list[str], list[str]]:
    """Cross-frame dtype divergences, partitioned into (hard, soft).

    Hard splits FAIL: different dtype families stringify differently
    even when values are equal — the proven driver-red classes are
    object-Decimal vs float64 (r6/r7, six red rows) and int vs float
    (r2 tpch_q12 HUGEINT).

    Soft splits WARN only — each class proven driver-tolerated by
    green rows that carry it: datetime64 unit differences (Spark
    toPandas emits [ns], DuckDB .df() emits [us] — every driver-green
    timestamp key), object-date vs datetime64 (fn_date_spine green),
    and integer WIDTH (int32 vs int64 — win_rank/tpch_q7-q9/
    fn_string_basic/fn_udtf_split/agg_list all green since r1-r4;
    np.int32(5) and np.int64(5) stringify identically)."""

    def fam(dt: str) -> str:
        if dt.startswith("datetime64"):
            return "dt"
        if dt.startswith(("int", "uint")):
            return "int"
        return dt

    hard, soft = [], []
    for c in s_dtypes:
        if c not in d_dtypes or s_dtypes[c] == d_dtypes[c]:
            continue
        msg = f"column {c!r}: spark={s_dtypes[c]} oracle={d_dtypes[c]}"
        sf, df_ = fam(s_dtypes[c]), fam(d_dtypes[c])
        if sf == df_:  # same family (dt unit, int width) — driver-tolerated
            soft.append(msg)
        elif {sf, df_} == {"dt", "object"}:
            # object side may be datetime.date cells (Spark DateType);
            # the stringifier normalizes both — soft. A non-date object
            # column against datetime64 would fail the value compare.
            soft.append(msg)
        else:
            hard.append(msg)
    return hard, soft


def main(keys: list[str]) -> int:
    import __spark_entry__ as e

    from quackflight_spark.session import get_spark

    ansi = os.environ.get("ANSI", "") == "1"
    strict_dtypes = os.environ.get("DTYPE_STRICT", "1") != "0"
    if "--ansi" in keys:
        keys = [k for k in keys if k != "--ansi"]
        ansi = True

    queries = e.queries()
    oracles = e.oracle_sql()
    if keys:
        queries = {k: queries[k] for k in keys}
    spark = get_spark(app_name="check", master="local[8]")
    if ansi:
        # Runtime-settable: flips this session to the driver's grading
        # config without touching the package default.
        spark.conf.set("spark.sql.ansi.enabled", "true")
        print("[check] ANSI-on leg (spark.sql.ansi.enabled=true)")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    for key, fn in queries.items():
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            spd = df.toPandas()
        except Exception as ex:
            print(f"FAIL  {key}: spark error: {ex}")
            n_fail += 1
            continue
        if key not in oracles:
            print(
                f"rows  {key}: {len(spd)} rows (no oracle, rows-only) "
                f"[{time.time()-t0:.1f}s]"
            )
            n_rowsonly += 1
            continue
        try:
            dpd = con.execute(oracles[key]).df()
        except Exception as ex:
            print(f"FAIL  {key}: duckdb error: {ex}")
            n_fail += 1
            continue
        try:
            sc, sr, sd = canonical_frame(spd)
        except Exception as ex:
            print(f"FAIL  {key}: spark frame not canonicalizable: {ex}")
            n_fail += 1
            continue
        try:
            dc, dr, dd = canonical_frame(dpd)
        except Exception as ex:
            print(f"FAIL  {key}: oracle frame not canonicalizable: {ex}")
            n_fail += 1
            continue
        if sc != dc:
            print(f"FAIL  {key}: columns differ spark={sc} duckdb={dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL  {key}: rowcount spark={len(sr)} duckdb={len(dr)}")
            n_fail += 1
        elif sr != dr:
            diff = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            print(f"FAIL  {key}: values differ at sorted-row {diff}:")
            print(f"      spark : {sr[diff]}")
            print(f"      duckdb: {dr[diff]}")
            n_fail += 1
        else:
            hard, soft = dtype_splits(sd, dd)
            if hard and strict_dtypes:
                for s in hard:
                    print(f"RISK  {key}: dtype split — {s}")
                n_fail += 1
            else:
                for s in hard + soft:
                    print(f"warn  {key}: dtype split (values equal) — {s}")
                print(f"ok    {key}: {len(sr)} rows [{time.time()-t0:.1f}s]")
                n_pass += 1

    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAILED")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
