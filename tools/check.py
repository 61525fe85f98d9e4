"""Local differential harness mimicking the driver's t2 oracle compare.

Runs every __spark_entry__.queries()[k] on Spark and oracle_sql()[k] on
DuckDB over the same parquet fixtures, then compares row count, column
names, and order-insensitive values (column-name-sorted, like the driver).

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

import math
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


def _gate_risk(key: str, s_cols, s_rows, con, oracle: str) -> list[str]:
    """Emulate the DRIVER's canonicalizer (pandas-based) to surface
    gate-compatibility hazards the value compare below tolerates:

    - unhashable cells: raw array/map values break pandas sort_values
      (r2: fn_array_hof/fn_array_ops/fn_map_access, r1: agg_list)
    - dtype artifacts: DuckDB HUGEINT reaches pandas as float64 while the
      Spark column is int64, so equal values hash differently
      (r2: tpch_q12)
    """
    import pandas as pd

    risks: list[str] = []
    try:
        spd = pd.DataFrame(s_rows, columns=s_cols)
        spd = spd[sorted(spd.columns)]
        spd.sort_values(list(spd.columns))
    except TypeError as ex:
        risks.append(f"spark frame not pandas-sortable ({ex})")
    try:
        dpd = con.execute(oracle).df()
        dpd = dpd[sorted(dpd.columns)]
        dpd.sort_values(list(dpd.columns))
    except TypeError as ex:
        risks.append(f"oracle frame not pandas-sortable ({ex})")
        dpd = None
    except Exception:
        dpd = None
    if dpd is not None and not risks and len(spd.columns) == len(dpd.columns):
        for c in spd.columns:
            sk, dk = spd[c].dtype.kind, dpd[c].dtype.kind
            if {sk, dk} == {"i", "f"} or {sk, dk} == {"u", "f"}:
                risks.append(
                    f"column {c!r}: int-vs-float dtype split "
                    f"(spark={spd[c].dtype}, oracle={dpd[c].dtype}) — "
                    "HUGEINT-style hash artifact"
                )
    return risks


def _norm(v):
    """Normalize one cell for comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _rowset(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name (driver behavior) and normalize values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return sorted_cols, out


def main(keys: list[str]) -> int:
    import __spark_entry__ as e

    from quackflight_spark.session import get_spark

    ansi = os.environ.get("ANSI", "") == "1"
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
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL  {key}: spark error: {ex}")
            n_fail += 1
            continue
        if key not in oracles:
            print(f"rows  {key}: {len(s_rows)} rows (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[key])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {key}: duckdb error: {ex}")
            n_fail += 1
            continue
        sc, sr = _rowset(s_cols, s_rows)
        dc, dr = _rowset(d_cols, d_rows)
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
            risks = _gate_risk(key, s_cols, s_rows, con, oracles[key])
            if risks:
                for r in risks:
                    print(f"RISK  {key}: {r}")
                n_fail += 1
            else:
                print(f"ok    {key}: {len(sr)} rows [{time.time()-t0:.1f}s]")
                n_pass += 1

    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAILED")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
