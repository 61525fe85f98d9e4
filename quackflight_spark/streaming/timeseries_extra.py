"""Time-series symbolic representation + robust repair — round-9
additions to the timeseries family (SURVEY.md §2.12; same
beyond-reference family as timeseries_rolling_median /
timeseries_anomaly_stl in streaming/windowed.py). The reference (a
DuckDB serving shim, /root/reference/main.py) has no time-series
surface; these add the two classic primitives the family still lacked:
SAX (Lin/Keogh symbolic aggregate approximation — the discretization
that turns a series into a WORD so motif mining / indexing / hashing
can run on strings) and the Hampel filter (rolling-median ± k·MAD
outlier REPAIR — the robust despiker that rolling_median only smooths).

Exactness doctrine: daily counts and their window order statistics are
exact BIGINTs end-to-end (the Hampel decision |x−med| > k·MAD compares
pure integers — zero float anywhere in that key); SAX's z-scores are
single shared double expressions over exact integer moment sums, with
Gaussian breakpoints embedded as identical literals in both texts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

HAMPEL_W = 7   # trailing window width (days), the rolling_median convention
HAMPEL_K = 3   # repair threshold in MAD units (integer: no 1.4826 scaling,
               # so the decision stays exact integer arithmetic)

SAX_ANCHOR = "2024-01-01"  # fixture epoch; weeks = trailing 7-day buckets
SAX_BP_LO = -0.6745        # Gaussian quartile breakpoints for a 4-symbol
SAX_BP_HI = 0.6745         # alphabet (P25/P50/P75 of N(0,1))


@query("timeseries_hampel", oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    expanded AS (
      SELECT d.event_type, d.day + CAST(o.o AS INT) AS anchor, d.x
      FROM daily d, (SELECT unnest(range(0, {HAMPEL_W})) AS o) o
    ),
    win AS (
      SELECT event_type, anchor AS day,
             CAST(count(*) AS BIGINT) AS n_window,
             list_sort(list(x)) AS a
      FROM expanded GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, day, n_window,
             a[CAST(ceil(n_window / 2.0) AS INT)] AS med, a
      FROM win
    ),
    mad AS (
      SELECT event_type, day, n_window, med,
             list_sort(list_transform(a, v -> abs(v - med)))
               [CAST(ceil(n_window / 2.0) AS INT)] AS mad
      FROM med
    )
    SELECT m.event_type, m.day, d.x, m.n_window,
           CAST(m.med AS BIGINT) AS med, CAST(m.mad AS BIGINT) AS mad,
           abs(d.x - m.med) > {HAMPEL_K} * m.mad AS is_outlier,
           CAST(CASE WHEN abs(d.x - m.med) > {HAMPEL_K} * m.mad
                     THEN m.med ELSE d.x END AS BIGINT) AS x_repaired
    FROM mad m JOIN daily d ON d.event_type = m.event_type AND d.day = m.day
""")
def timeseries_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter over daily event counts (new r9): each day is
    tested against the TRAILING {HAMPEL_W}-day rolling median, and
    flagged + repaired (replaced by that median) when its absolute
    deviation exceeds {HAMPEL_K}× the window's median absolute
    deviation — the robust despiker standard in sensor/ops pipelines,
    completing rolling_median (which smooths but never repairs) and
    anomaly_mad (whose MAD is global, not windowed).

    Exactness: fully integer. The window's lower median and the MAD
    (lower median of integer absolute deviations) are exact order
    statistics of a ≤{HAMPEL_W}-element sorted array, and the decision
    |x − med| > {HAMPEL_K}·MAD compares exact BIGINTs — no float exists
    anywhere in the key, so it is bit-deterministic under any
    partitioning by construction.

    Scale shape: the trailing window materializes by the bounded
    ×{HAMPEL_W} explode of the |series|×|days| rollup (the
    rolling_median device) — never raw events; per-anchor groups are
    ≤{HAMPEL_W} rows, map-side combinable, and the two order
    statistics are array ops INSIDE the group row (no second shuffle,
    unlike a self-join formulation)."""
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
        F.explode(F.sequence(F.lit(0), F.lit(HAMPEL_W - 1))).alias("o"),
        "day",
    ).select("event_type", "x", F.expr("date_add(day, o)").alias("anchor"))
    win = expanded.groupBy("event_type", F.col("anchor").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_window"),
        F.sort_array(F.collect_list("x")).alias("a"),
    )
    mid = F.ceil(F.col("n_window") / 2).cast("int")
    med = win.withColumn("med", F.element_at(F.col("a"), mid))
    mad = med.withColumn(
        "mad",
        F.element_at(
            F.sort_array(
                F.transform(F.col("a"), lambda v: F.abs(v - F.col("med")))
            ),
            mid,
        ),
    )
    out = mad.join(daily, ["event_type", "day"])
    is_out = F.abs(F.col("x") - F.col("med")) > HAMPEL_K * F.col("mad")
    return out.select(
        "event_type",
        "day",
        "x",
        "n_window",
        F.col("med").cast("bigint").alias("med"),
        F.col("mad").cast("bigint").alias("mad"),
        is_out.alias("is_outlier"),
        F.when(is_out, F.col("med"))
        .otherwise(F.col("x"))
        .cast("bigint")
        .alias("x_repaired"),
    )


@query("timeseries_sax", oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DECIMAL(38,0)) AS s1,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS s2
      FROM daily GROUP BY 1
    ),
    weekly AS (
      SELECT event_type,
             datediff('day', DATE '{SAX_ANCHOR}', day) // 7 AS wk,
             CAST(sum(x) AS BIGINT) AS wsum,
             CAST(count(*) AS BIGINT) AS wdays
      FROM daily GROUP BY 1, 2
    ),
    z AS (
      SELECT w.event_type, w.wk,
             (CAST(w.wsum AS DOUBLE) / CAST(w.wdays AS DOUBLE)
              - CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
             / sqrt((CAST(s.n AS DOUBLE) * CAST(s.s2 AS DOUBLE)
                     - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE))
                    / (CAST(s.n AS DOUBLE) * CAST(s.n - 1 AS DOUBLE))) AS z
      FROM weekly w JOIN stats s USING (event_type)
    ),
    sym AS (
      SELECT event_type, wk,
             CASE WHEN z < {SAX_BP_LO!r} THEN 'a'
                  WHEN z < 0.0 THEN 'b'
                  WHEN z < {SAX_BP_HI!r} THEN 'c'
                  ELSE 'd' END AS sym
      FROM z
    )
    SELECT s.event_type,
           CAST(count(*) AS BIGINT) AS n_weeks,
           string_agg(s.sym, '' ORDER BY s.wk) AS sax_word,
           round(CAST(any_value(st.s1) AS DOUBLE)
                 / CAST(any_value(st.n) AS DOUBLE), 8) AS mean_daily,
           round(sqrt((CAST(any_value(st.n) AS DOUBLE)
                       * CAST(any_value(st.s2) AS DOUBLE)
                       - CAST(any_value(st.s1) AS DOUBLE)
                         * CAST(any_value(st.s1) AS DOUBLE))
                      / (CAST(any_value(st.n) AS DOUBLE)
                         * CAST(any_value(st.n) - 1 AS DOUBLE))), 8)
             AS std_daily
    FROM sym s JOIN stats st USING (event_type)
    GROUP BY s.event_type
""")
def timeseries_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX — symbolic aggregate approximation (new r9): each series of
    daily counts is PAA-reduced to weekly means, z-normalized against
    the series' own daily mean/std, and discretized through the
    Gaussian quartile breakpoints (±0.6745, 0) into a 4-symbol
    alphabet, emitting one WORD per series — the Lin/Keogh
    representation that lets motif mining, suffix indexing and
    hash-based similarity run on plain strings (and pairs naturally
    with this repo's winnowing/fingerprint string machinery).

    Exactness: the PAA buckets are exact integer (weekly sum, day
    count) pairs; the series moments are exact BIGINT/DECIMAL(38,0)
    sums; each week's z-score is ONE shared double expression over
    those exact integers, compared against breakpoint literals embedded
    identically in both texts — so every symbol decision is
    bit-deterministic. The word assembles with an explicit ORDER BY
    week on both sides (string_agg ORDER BY / sorted-struct fold).

    Scale shape: two map-side-combinable rollups (daily → weekly,
    daily → per-series moments) and a broadcast-size join on series id;
    the word concatenation is per-series over a |weeks|-bounded array.
    Nothing after the first rollup touches raw-event grain."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    weekly = daily.groupBy(
        "event_type",
        F.expr(f"datediff(day, DATE '{SAX_ANCHOR}') div 7").alias("wk"),
    ).agg(
        F.sum("x").cast("bigint").alias("wsum"),
        F.count(F.lit(1)).cast("bigint").alias("wdays"),
    )
    n_d = F.col("n").cast("double")
    s1_d = F.col("s1").cast("double")
    s2_d = F.col("s2").cast("double")
    z = weekly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "wk",
        (
            (F.col("wsum").cast("double") / F.col("wdays").cast("double")
             - s1_d / n_d)
            / F.sqrt(
                (n_d * s2_d - s1_d * s1_d)
                / (n_d * (F.col("n") - 1).cast("double"))
            )
        ).alias("z"),
    )
    sym = z.select(
        "event_type",
        "wk",
        F.when(F.col("z") < SAX_BP_LO, "a")
        .when(F.col("z") < 0.0, "b")
        .when(F.col("z") < SAX_BP_HI, "c")
        .otherwise("d")
        .alias("sym"),
    )
    return (
        sym.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_weeks"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("wk"), F.col("sym")))
                    ),
                    lambda x: x["sym"],
                ),
                "",
            ).alias("sax_word"),
        )
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "n_weeks",
            "sax_word",
            F.round(F.col("s1").cast("double") / F.col("n").cast("double"), 8)
            .alias("mean_daily"),
            F.round(
                F.sqrt(
                    (F.col("n").cast("double") * F.col("s2").cast("double")
                     - F.col("s1").cast("double") * F.col("s1").cast("double"))
                    / (F.col("n").cast("double")
                       * (F.col("n") - 1).cast("double"))
                ),
                8,
            ).alias("std_daily"),
        )
    )


# ---------------------------------------------------------------------------
# timeseries_spectral_dft — weekly-period periodogram power (r9)
# ---------------------------------------------------------------------------

import math as _math

DFT_PERIOD = 7
# cos/sin tables computed ONCE here and embedded as identical literals in
# both engine texts — never cos()/sin() in SQL (the SPRT libm rationale)
DFT_COS = [_math.cos(2 * _math.pi * k / DFT_PERIOD) for k in range(DFT_PERIOD)]
DFT_SIN = [_math.sin(2 * _math.pi * k / DFT_PERIOD) for k in range(DFT_PERIOD)]
_DFT_COS_SQL = "[" + ", ".join(repr(v) for v in DFT_COS) + "]"
_DFT_SIN_SQL = "[" + ", ".join(repr(v) for v in DFT_SIN) + "]"


@query("timeseries_spectral_dft", oracle=f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '{SAX_ANCHOR}',
                      CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
               AS t,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS s2,
             list_sort(list({{'t': t, 'x': x}})) AS a
      FROM daily GROUP BY 1
    ),
    folds AS (
      SELECT event_type, n_days, s1, s2,
             list_reduce(list_transform(a, e ->
               CAST(e.x AS DOUBLE) * {_DFT_COS_SQL}[(e.t % {DFT_PERIOD}) + 1]),
               (p, q) -> p + q) AS sxc,
             list_reduce(list_transform(a, e ->
               CAST(e.x AS DOUBLE) * {_DFT_SIN_SQL}[(e.t % {DFT_PERIOD}) + 1]),
               (p, q) -> p + q) AS sxs,
             list_reduce(list_transform(a, e ->
               {_DFT_COS_SQL}[(e.t % {DFT_PERIOD}) + 1]), (p, q) -> p + q) AS sc,
             list_reduce(list_transform(a, e ->
               {_DFT_SIN_SQL}[(e.t % {DFT_PERIOD}) + 1]), (p, q) -> p + q) AS ss
      FROM arr
    )
    SELECT event_type, n_days,
           round(sxc - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) * sc, 6)
             AS dft_real,
           round(sxs - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) * ss, 6)
             AS dft_imag,
           round(  (sxc - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) * sc)
                 * (sxc - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) * sc)
                 + (sxs - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) * ss)
                 * (sxs - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) * ss),
                 6) AS power,
           round((  (sxc - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) * sc)
                  * (sxc - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) * sc)
                  + (sxs - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) * ss)
                  * (sxs - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) * ss))
                 / (CAST(s2 AS DOUBLE)
                    - CAST(CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
                      / CAST(n_days AS DOUBLE)), 6) AS strength
    FROM folds
""")
def timeseries_spectral_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-frequency DFT periodogram at the weekly period (new r9) —
    the seasonality DETECTOR the family's decomposers assume: project
    each series of daily counts onto cos/sin at period {DFT_PERIOD}
    (mean-removed via the DC cross-terms, the textbook Goertzel-free
    single-bin periodogram) and report the spectral power plus its
    fraction of the series' total centered energy (Σx²−S1²/n) — the
    'seasonal strength' score that decides whether snaive/STL modeling
    is even warranted.

    Exactness: the cos/sin tables are Python-computed module constants
    embedded as identical 17-digit literal arrays in BOTH texts (the
    SPRT device — never trig in SQL, whose libm can differ in the last
    ulp between JVM and DuckDB); each product x·c[t mod {DFT_PERIOD}]
    is exact-int × identical-literal, and all four projections fold
    over the SAME day-sorted array, so both engines add identical
    doubles in identical order. The energy denominator is exact
    BIGINT/DECIMAL moments with one final division.

    Scale shape: one map-side-combinable rollup to |series|×|days|,
    then per-series folds over |days|-bounded arrays. At 100 TB the
    array per series is bounded by the calendar, not the corpus; a
    longer horizon chunks by (series, year) and merges the complex
    sums — they are associative — without changing the math."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"),
                F.lit(SAX_ANCHOR).cast("date"),
            ).alias("t"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    cos_arr = F.array(*[F.lit(v) for v in DFT_COS])
    sin_arr = F.array(*[F.lit(v) for v in DFT_SIN])
    arr = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("s2"),
        F.sort_array(
            F.collect_list(F.struct(F.col("t"), F.col("x")))
        ).alias("a"),
    )

    def fold(expr_fn):
        return F.aggregate(
            F.transform(F.col("a"), expr_fn), F.lit(0.0), lambda acc, v: acc + v
        )

    folds = arr.select(
        "event_type",
        "n_days",
        "s1",
        "s2",
        fold(
            lambda e: e["x"].cast("double")
            * F.element_at(cos_arr, (e["t"] % DFT_PERIOD) + 1)
        ).alias("sxc"),
        fold(
            lambda e: e["x"].cast("double")
            * F.element_at(sin_arr, (e["t"] % DFT_PERIOD) + 1)
        ).alias("sxs"),
        fold(
            lambda e: F.element_at(cos_arr, (e["t"] % DFT_PERIOD) + 1)
        ).alias("sc"),
        fold(
            lambda e: F.element_at(sin_arr, (e["t"] % DFT_PERIOD) + 1)
        ).alias("ss"),
    )
    mean = F.col("s1").cast("double") / F.col("n_days").cast("double")
    re = F.col("sxc") - mean * F.col("sc")
    im = F.col("sxs") - mean * F.col("ss")
    energy = (
        F.col("s2").cast("double")
        - (F.col("s1").cast("decimal(38,0)") * F.col("s1")).cast("double")
        / F.col("n_days").cast("double")
    )
    return folds.select(
        "event_type",
        "n_days",
        F.round(re, 6).alias("dft_real"),
        F.round(im, 6).alias("dft_imag"),
        F.round(re * re + im * im, 6).alias("power"),
        F.round((re * re + im * im) / energy, 6).alias("strength"),
    )


# ---------------------------------------------------------------------------
# timeseries_pacf — ACF + PACF via unrolled Durbin–Levinson (r9)
# ---------------------------------------------------------------------------

PACF_LAGS = 3


@query("timeseries_pacf", oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, x,
             lag(x, 1) OVER w AS x1,
             lag(x, 2) OVER w AS x2,
             lag(x, 3) OVER w AS x3
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS s2,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x1) AS DECIMAL(38,0)) AS sl1,
             CAST(sum(CASE WHEN x1 IS NOT NULL THEN x END) AS BIGINT) AS b1,
             CAST(sum(x1) AS BIGINT) AS a1,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x2) AS DECIMAL(38,0)) AS sl2,
             CAST(sum(CASE WHEN x2 IS NOT NULL THEN x END) AS BIGINT) AS b2,
             CAST(sum(x2) AS BIGINT) AS a2,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x3) AS DECIMAL(38,0)) AS sl3,
             CAST(sum(CASE WHEN x3 IS NOT NULL THEN x END) AS BIGINT) AS b3,
             CAST(sum(x3) AS BIGINT) AS a3
      FROM lagged GROUP BY 1
    ),
    acf AS (
      SELECT event_type, n,
        ( (CAST(sl1 AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(a1 + b1 AS DOUBLE)
           + CAST(n - 1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        / (CAST(s2 AS DOUBLE)
           - CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) ) AS r1,
        ( (CAST(sl2 AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(a2 + b2 AS DOUBLE)
           + CAST(n - 2 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        / (CAST(s2 AS DOUBLE)
           - CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) ) AS r2,
        ( (CAST(sl3 AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(a3 + b3 AS DOUBLE)
           + CAST(n - 3 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        / (CAST(s2 AS DOUBLE)
           - CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) ) AS r3
      FROM m
    ),
    dl AS (
      SELECT event_type, n, r1, r2, r3,
             (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
      FROM acf
    )
    SELECT event_type, n,
           round(r1, 8) AS r1, round(r2, 8) AS r2, round(r3, 8) AS r3,
           round(r1, 8) AS pacf1,
           round(phi22, 8) AS pacf2,
           round((r3 - (r1 - phi22 * r1) * r2 - phi22 * r1)
                 / (1.0 - (r1 - phi22 * r1) * r1 - phi22 * r2), 8) AS pacf3
    FROM dl
""")
def timeseries_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation + PARTIAL autocorrelation at lags 1–{PACF_LAGS}
    (new r9) — the ARIMA order-selection pair: ACF tails off / PACF
    cuts off at the AR order (Box–Jenkins identification). PACF comes
    from the Durbin–Levinson recursion UNROLLED for the fixed lag
    count: φ11=r1, φ22=(r2−r1²)/(1−r1²), φ21=r1(1−φ22),
    φ33=(r3−φ21·r2−φ22·r1)/(1−φ21·r1−φ22·r2) — each a scalar
    expression over the ACF values, written identically in both texts
    (timeseries_autocorr reports the raw ACF; this key adds the
    recursion that makes it actionable).

    Exactness: each c_k expands to exact integer moments —
    S_k = Σx_t·x_{{t+k}} (DECIMAL(38,0)), the head/tail partial sums
    A_k/B_k (conditional BIGINT sums over the same window pass) — so
    every r_k is one shared double expression over exact integers, and
    the DL recursion is deterministic scalar arithmetic on identical
    doubles. No float ever aggregates.

    Scale shape: one rollup to |series|×|days|, ONE window pass
    partitioned by series producing all {PACF_LAGS} lags, one
    map-side-combinable aggregate. The series must be gap-free at the
    rollup grain (lag = positional step); timeseries_gapfill is the
    documented pre-step for sparse series."""
    from pyspark.sql.window import Window

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
        "x",
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in range(1, PACF_LAGS + 1)],
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("s2"),
    ]
    for k in range(1, PACF_LAGS + 1):
        aggs += [
            F.sum(F.col("x").cast("decimal(38,0)") * F.col(f"x{k}"))
            .cast("decimal(38,0)")
            .alias(f"sl{k}"),
            F.sum(F.when(F.col(f"x{k}").isNotNull(), F.col("x")))
            .cast("bigint")
            .alias(f"b{k}"),
            F.sum(f"x{k}").cast("bigint").alias(f"a{k}"),
        ]
    m = lagged.groupBy("event_type").agg(*aggs)
    n_d = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n_d
    c0 = F.col("s2").cast("double") - n_d * mean * mean

    def r(k: int):
        return (
            F.col(f"sl{k}").cast("double")
            - mean * (F.col(f"a{k}") + F.col(f"b{k}")).cast("double")
            + (F.col("n") - k).cast("double") * mean * mean
        ) / c0

    acf = m.select("event_type", "n", r(1).alias("r1"), r(2).alias("r2"), r(3).alias("r3"))
    dl = acf.withColumn(
        "phi22",
        (F.col("r2") - F.col("r1") * F.col("r1"))
        / (F.lit(1.0) - F.col("r1") * F.col("r1")),
    )
    phi21 = F.col("r1") - F.col("phi22") * F.col("r1")
    return dl.select(
        "event_type",
        "n",
        F.round("r1", 8).alias("r1"),
        F.round("r2", 8).alias("r2"),
        F.round("r3", 8).alias("r3"),
        F.round("r1", 8).alias("pacf1"),
        F.round("phi22", 8).alias("pacf2"),
        F.round(
            (F.col("r3") - phi21 * F.col("r2") - F.col("phi22") * F.col("r1"))
            / (F.lit(1.0) - phi21 * F.col("r1") - F.col("phi22") * F.col("r2")),
            8,
        ).alias("pacf3"),
    )


# ---------------------------------------------------------------------------
# timeseries_twap — time-weighted average over irregular samples (r9)
# ---------------------------------------------------------------------------


@query("timeseries_twap", oracle="""
    WITH pts AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    held AS (
      SELECT event_type, cents,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS held_us
      FROM pts
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_intervals,
             CAST(sum(held_us) AS BIGINT) AS span_us,
             CAST(sum(CAST(cents AS DECIMAL(38,0)) * held_us)
                  AS DECIMAL(38,0)) AS wsum
      FROM held WHERE held_us IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n_intervals, span_us,
           round(CAST(wsum AS DOUBLE)
                 / CAST(span_us AS DOUBLE) / 100.0, 8) AS twap
    FROM agg
""")
def timeseries_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price/value over IRREGULAR samples (new
    r9) — the metric a plain AVG gets wrong on event-driven data: each
    observation is weighted by how long it was the latest value (hold
    time until the next sample), the step-function integral divided by
    the span. The companion to timeseries_vwap (volume-weighted):
    vwap answers 'average paid', twap answers 'average quoted over
    time' — the ops/finance pair. Last sample per series contributes
    no interval (no successor), the standard convention.

    Exactness: hold times are exact integer MICROSECONDS
    (epoch_us/unix_micros of the same timestamps), values are exact
    cents (the mannwhitney quantization), the weighted sum is an exact
    DECIMAL(38,0), and twap is one shared double expression — no float
    accumulates. Ordering ties break on event_id (the
    events_concurrency tiebreaker).

    Scale shape: ONE window pass partitioned by series (lead), one
    map-side-combinable aggregate — identical cost to any per-series
    cumulative metric; no join, no second data-grain pass."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pts = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    held = pts.select(
        "event_type",
        "cents",
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
        ).alias("held_us"),
    ).filter(F.col("held_us").isNotNull())
    agg = held.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("held_us").cast("bigint").alias("span_us"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("held_us"))
        .cast("decimal(38,0)")
        .alias("wsum"),
    )
    return agg.select(
        "event_type",
        "n_intervals",
        "span_us",
        F.round(
            F.col("wsum").cast("double") / F.col("span_us").cast("double")
            / F.lit(100.0),
            8,
        ).alias("twap"),
    )


# ---------------------------------------------------------------------------
# timeseries_holt_winters — additive triple exponential smoothing (r9)
# ---------------------------------------------------------------------------

HW_PERIOD = 7  # weekly seasonality; α = β = γ = 1/2 as floor-halving


@query("timeseries_holt_winters", oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             list(x ORDER BY d) AS a,
             CAST(count(*) AS BIGINT) AS n
      FROM daily GROUP BY 1
    ),
    st AS (
      SELECT event_type, CAST({HW_PERIOD} AS BIGINT) AS i,
             CAST(list_aggregate(a[1:{HW_PERIOD}], 'sum')
                  // {HW_PERIOD} AS BIGINT) AS l,
             CAST(0 AS BIGINT) AS b,
             list_transform(a[1:{HW_PERIOD}],
               v -> CAST(v - list_aggregate(a[1:{HW_PERIOD}], 'sum')
                         // {HW_PERIOD} AS BIGINT)) AS s,
             a, n
      FROM arr WHERE n >= {HW_PERIOD}
      UNION ALL
      SELECT event_type, i + 1,
             CAST(floor((a[CAST(i + 1 AS INT)] - s[1] + l + b) / 2.0)
                  AS BIGINT),
             CAST(floor((b
               + CAST(floor((a[CAST(i + 1 AS INT)] - s[1] + l + b) / 2.0)
                      AS BIGINT) - l) / 2.0) AS BIGINT),
             list_append(s[2:{HW_PERIOD}],
               CAST(floor((s[1] + (a[CAST(i + 1 AS INT)]
                 - CAST(floor((a[CAST(i + 1 AS INT)] - s[1] + l + b) / 2.0)
                        AS BIGINT))) / 2.0) AS BIGINT)),
             a, n
      FROM st WHERE i < n
    )
    SELECT event_type, n AS n_days,
           l AS level, b AS trend,
           CAST(l + b + s[1] AS BIGINT) AS forecast_next,
           s[1] AS s1, s[2] AS s2, s[3] AS s3, s[4] AS s4,
           s[5] AS s5, s[6] AS s6, s[7] AS s7
    FROM st WHERE i = n
""")
def timeseries_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters ADDITIVE triple exponential smoothing (new r9) —
    the seasonal completion of timeseries_holt: per-series (level,
    trend, {HW_PERIOD} seasonal offsets) state advanced one observation
    at a time with α = β = γ = 1/2 as INTEGER floor-halving, seeded the
    textbook way (level = first-week mean, seasonals = first-week
    deviations, trend = 0). Output is the converged state and the
    one-step forecast level + trend + next-season offset — the
    operational forecaster for any metric with a weekly shape.

    Exactness: the whole recursion is exact integer arithmetic —
    floor((…)/2.0) on small-magnitude integers is exact in IEEE and
    floors toward −∞ identically in both engines (deliberately NOT
    `div`, which truncates toward zero and diverges on the negative
    seasonal deviations). Bit-identical under any partitioning, like
    graph_pagerank.

    Engine note: the inherently sequential fold runs as ONE Catalyst
    higher-order `aggregate` over each series' sorted day array with a
    (level, trend, seasonal-array) struct accumulator — per-series
    sequential, series-parallel, no UDF; the oracle replays it as a
    recursive CTE advancing every series one observation per step
    (the timeseries_holt idiom with a list-typed state column added).

    Scale shape: one map-side-combinable rollup, one series-keyed
    collect; a years-long series shards the fold by time range and
    carries the (l, b, s) state across boundaries — exactly the state
    a streaming sibling would hold per key."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    arr = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("day"), F.col("x")))),
            lambda e: e["x"],
        ).alias("a"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).filter(F.col("n") >= HW_PERIOD)

    week = F.slice(F.col("a"), 1, HW_PERIOD)
    l0 = (
        F.aggregate(week, F.lit(0).cast("bigint"), lambda acc, v: acc + v)
        / HW_PERIOD
    ).cast("bigint")  # positive mean: floor == truncate, both exact
    seeded = arr.select(
        "event_type",
        "a",
        "n",
        F.struct(
            l0.alias("l"),
            F.lit(0).cast("bigint").alias("b"),
            F.transform(week, lambda v: (v - l0).cast("bigint")).alias("s"),
        ).alias("init"),
    )

    def half_floor(col):
        return F.floor(col / F.lit(2.0)).cast("bigint")

    def step(acc, x):
        s_head = F.element_at(acc["s"], 1)
        l1 = half_floor(x - s_head + acc["l"] + acc["b"])
        b1 = half_floor(acc["b"] + l1 - acc["l"])
        s_t = half_floor(s_head + (x - l1))
        return F.struct(
            l1.alias("l"),
            b1.alias("b"),
            F.concat(
                F.slice(acc["s"], 2, HW_PERIOD - 1), F.array(s_t)
            ).alias("s"),
        )

    rest = F.slice(
        F.col("a"), HW_PERIOD + 1, F.size("a") - HW_PERIOD
    )
    final = seeded.select(
        "event_type",
        "n",
        F.aggregate(rest, F.col("init"), step).alias("st"),
    )
    s = final["st"]["s"]
    return final.select(
        "event_type",
        F.col("n").alias("n_days"),
        final["st"]["l"].alias("level"),
        final["st"]["b"].alias("trend"),
        (final["st"]["l"] + final["st"]["b"] + F.element_at(s, 1))
        .cast("bigint")
        .alias("forecast_next"),
        *[F.element_at(s, i).alias(f"s{i}") for i in range(1, HW_PERIOD + 1)],
    )


# ---------------------------------------------------------------------------
# timeseries_croston — intermittent-demand forecasting (r9)
# ---------------------------------------------------------------------------


@query("timeseries_croston", oracle="""
    WITH RECURSIVE daily AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_id, cents,
             CAST(row_number() OVER w AS BIGINT) AS i,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
             CAST(coalesce(datediff('day', lag(d) OVER w, d), 0)
                  AS BIGINT) AS q
      FROM daily
      WINDOW w AS (PARTITION BY user_id ORDER BY d)
    ),
    st AS (
      SELECT user_id, CAST(1 AS BIGINT) AS i, cents AS z,
             CAST(1 AS BIGINT) AS p, n
      FROM ranked WHERE i = 1
      UNION ALL
      SELECT s.user_id, s.i + 1,
             CAST(floor((s.z + r.cents) / 2.0) AS BIGINT),
             CAST(floor((s.p + r.q) / 2.0) AS BIGINT),
             s.n
      FROM st s JOIN ranked r ON r.user_id = s.user_id AND r.i = s.i + 1
    )
    SELECT user_id, n AS n_demands, z AS z_cents, p AS p_days,
           round(CAST(z AS DOUBLE) / CAST(p AS DOUBLE) / 100.0, 6)
             AS forecast_per_day
    FROM st WHERE i = n
""")
def timeseries_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for INTERMITTENT demand (new r9) — the
    forecaster for series that are mostly zero (spare parts, per-user
    purchases): smooth the demand SIZE and the inter-demand INTERVAL as
    two separate exponential averages over demand points only, forecast
    rate = size / interval. The family's holt/holt_winters assume a
    dense series; per-user purchase days are sparse, which is exactly
    Croston's case. α = 1/2 as integer floor-halving (the holt device);
    seeds: size = first demand, interval = 1 (updates begin at the
    second demand with its observed gap — documented convention).

    Exactness: demand sizes are exact cents, intervals exact day
    counts; the whole recursion is integer floor-halving — bit-exact
    in any engine/partitioning; the forecast rate is one shared double
    expression.

    Scale shape: identical to timeseries_holt — one (user, day)
    map-side-combinable rollup, one lag window, one user-keyed fold
    over the bounded demand array (Catalyst higher-order aggregate, no
    UDF); the oracle advances every user one demand per recursive-CTE
    step."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("user_id").orderBy("d")
    ranked = daily.select(
        "user_id",
        "cents",
        F.coalesce(F.datediff(F.col("d"), F.lag("d").over(w)), F.lit(0))
        .cast("bigint")
        .alias("q"),
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    arr = ranked.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("i"), F.col("q"), F.col("cents")))
            ),
            lambda e: F.struct(e["q"].alias("q"), e["cents"].alias("x")),
        ).alias("a"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )

    def half_floor(col):
        return F.floor(col / F.lit(2.0)).cast("bigint")

    def step(acc, e):
        return F.struct(
            half_floor(acc["z"] + e["x"]).alias("z"),
            half_floor(acc["p"] + e["q"]).alias("p"),
        )

    init = F.struct(
        F.element_at(F.col("a"), 1)["x"].alias("z"),
        F.lit(1).cast("bigint").alias("p"),
    )
    rest = F.slice(F.col("a"), 2, F.greatest(F.size("a") - 1, F.lit(0)))
    final = arr.select(
        "user_id", "n", F.aggregate(rest, init, step).alias("st")
    )
    return final.select(
        "user_id",
        F.col("n").alias("n_demands"),
        final["st"]["z"].alias("z_cents"),
        final["st"]["p"].alias("p_days"),
        F.round(
            final["st"]["z"].cast("double")
            / final["st"]["p"].cast("double")
            / F.lit(100.0),
            6,
        ).alias("forecast_per_day"),
    )


# ---------------------------------------------------------------------------
# timeseries_kalman — local-level Kalman filter, literal gain schedule (r10)
# ---------------------------------------------------------------------------

KALMAN_Q = 4.0    # process (random-walk) variance
KALMAN_R = 16.0   # observation variance
KALMAN_M = 64     # gain schedule length (converged long before this)


def _kalman_gains() -> list[float]:
    """The local-level Kalman gain sequence is DATA-INDEPENDENT (it
    depends only on Q, R and the step index), so it is precomputed once
    here and embedded as the SAME literal table in both engine texts —
    the spectral_dft trig-table device applied to the Riccati
    recursion. gains[i] (1-based) is the gain applied to observation
    i+1; index saturates at KALMAN_M (the steady-state gain)."""
    gains = [0.0]  # observation 1 seeds the state; no gain applied
    p = KALMAN_R
    for _ in range(KALMAN_M - 1):
        p_pred = p + KALMAN_Q
        k = p_pred / (p_pred + KALMAN_R)
        p = (1.0 - k) * p_pred
        gains.append(k)
    return gains


KALMAN_GAINS = _kalman_gains()
_KALMAN_GAINS_SQL = "[" + ", ".join(repr(g) for g in KALMAN_GAINS) + "]"


@query("timeseries_kalman", oracle=f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             CAST(count(*) AS BIGINT) AS z
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, CAST(z AS DOUBLE) AS z,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr)
                  AS BIGINT) AS i,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM hourly
    ),
    st AS (
      SELECT event_type, CAST(1 AS BIGINT) AS i, z AS x,
             CAST(0.0 AS DOUBLE) AS sse, n
      FROM ranked WHERE i = 1
      UNION ALL
      SELECT s.event_type, s.i + 1,
             s.x + {_KALMAN_GAINS_SQL}[CAST(least(s.i + 1, {KALMAN_M})
                                       AS INT)] * (r.z - s.x),
             s.sse + (r.z - s.x) * (r.z - s.x),
             s.n
      FROM st s JOIN ranked r ON r.event_type = s.event_type
       AND r.i = s.i + 1
    )
    SELECT event_type, n AS n_hours,
           round(x, 6) AS level_kalman,
           round(sse / CAST(n - 1 AS DOUBLE), 6) AS innovation_mse
    FROM st WHERE i = n AND n >= 2
""")
def timeseries_kalman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level (random-walk-plus-noise) Kalman filter per series
    (new r10): hourly counts smoothed by x ← x + K_t·(z − x), with the
    one-step-ahead innovation MSE as the model-fit diagnostic — the
    statistically-grounded upgrade of timeseries_ewma_control (an EWMA
    is the STEADY-STATE of exactly this filter; the Kalman version also
    handles the warm-up correctly, where early observations deserve
    higher gain because the prior is weak).

    Exactness: the gain sequence of a constant-(Q,R) local-level model
    is data-independent (the scalar Riccati recursion), so the schedule
    is computed ONCE in Python and embedded as an identical literal
    table in both engine texts ({KALMAN_M} entries, saturating at the
    steady state); the fold then applies literal-coefficient double
    arithmetic in the same hr-sorted order on both sides — identical
    IEEE results, the timeseries_holt contract with float coefficients
    made safe by literal sharing.

    Scale shape: one map-side-combinable hourly rollup; the inherently
    sequential fold runs as one Catalyst higher-order `aggregate` per
    series over its sorted array (series-parallel, no UDF); the oracle
    replays it as a recursive CTE advancing every series one step per
    round. State is O(1) per series — the streaming twin would hold
    (i, x, sse) per key."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hr"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("z"))
    )
    arr = (
        hourly.groupBy("event_type")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("hr"), F.col("z")))),
                lambda e: e["z"].cast("double"),
            ).alias("a"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .filter(F.col("n") >= 2)
    )
    gains = F.array(*[F.lit(g) for g in KALMAN_GAINS])
    init = F.struct(
        F.lit(1).cast("bigint").alias("i"),
        F.element_at(F.col("a"), 1).alias("x"),
        F.lit(0.0).alias("sse"),
    )

    def step(acc, z):
        i1 = acc["i"] + 1
        k = F.element_at(gains, F.least(i1, F.lit(KALMAN_M)).cast("int"))
        e = z - acc["x"]
        return F.struct(
            i1.alias("i"),
            (acc["x"] + k * e).alias("x"),
            (acc["sse"] + e * e).alias("sse"),
        )

    rest = F.slice(F.col("a"), 2, F.size("a") - 1)
    final = arr.select(
        "event_type",
        "n",
        F.aggregate(rest, init, step).alias("st"),
    )
    return final.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.round(final["st"]["x"], 6).alias("level_kalman"),
        F.round(
            final["st"]["sse"] / (F.col("n") - 1).cast("double"), 6
        ).alias("innovation_mse"),
    )


# ---------------------------------------------------------------------------
# timeseries_ljung_box — portmanteau white-noise test (r10)
# ---------------------------------------------------------------------------

# chi-square 0.95 quantile at 3 df, Python-computed once and shared as a
# literal by both engine texts (the SPRT constant device — never a CDF
# call in SQL)
LB_CHI2_95_DF3 = 7.814727903251179

# Shared VERBATIM from `daily(event_type, day, x)` onward: lag windows,
# exact moments, the three ACF values (the timeseries_pacf expressions),
# and the Ljung-Box statistic. Identical text => identical IEEE results.
_LB_TAIL_SQL = f"""lagged AS (
      SELECT event_type, x,
             lag(x, 1) OVER w AS x1,
             lag(x, 2) OVER w AS x2,
             lag(x, 3) OVER w AS x3
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS s2,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x1) AS DECIMAL(38,0)) AS sl1,
             CAST(sum(CASE WHEN x1 IS NOT NULL THEN x END) AS BIGINT) AS b1,
             CAST(sum(x1) AS BIGINT) AS a1,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x2) AS DECIMAL(38,0)) AS sl2,
             CAST(sum(CASE WHEN x2 IS NOT NULL THEN x END) AS BIGINT) AS b2,
             CAST(sum(x2) AS BIGINT) AS a2,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x3) AS DECIMAL(38,0)) AS sl3,
             CAST(sum(CASE WHEN x3 IS NOT NULL THEN x END) AS BIGINT) AS b3,
             CAST(sum(x3) AS BIGINT) AS a3
      FROM lagged GROUP BY 1
    ),
    acf AS (
      SELECT event_type, n,
        ( (CAST(sl1 AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(a1 + b1 AS DOUBLE)
           + CAST(n - 1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        / (CAST(s2 AS DOUBLE)
           - CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) ) AS r1,
        ( (CAST(sl2 AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(a2 + b2 AS DOUBLE)
           + CAST(n - 2 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        / (CAST(s2 AS DOUBLE)
           - CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) ) AS r2,
        ( (CAST(sl3 AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(a3 + b3 AS DOUBLE)
           + CAST(n - 3 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        / (CAST(s2 AS DOUBLE)
           - CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) ) AS r3
      FROM m
    )
    SELECT event_type, n,
           round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
                 * (r1*r1 / (CAST(n AS DOUBLE) - 1.0)
                    + r2*r2 / (CAST(n AS DOUBLE) - 2.0)
                    + r3*r3 / (CAST(n AS DOUBLE) - 3.0)), 8) AS q_lb,
           CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
                 * (r1*r1 / (CAST(n AS DOUBLE) - 1.0)
                    + r2*r2 / (CAST(n AS DOUBLE) - 2.0)
                    + r3*r3 / (CAST(n AS DOUBLE) - 3.0))
             > {LB_CHI2_95_DF3!r} AS reject_white_noise
    FROM acf WHERE n > 3"""


@query("timeseries_ljung_box", oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    {_LB_TAIL_SQL}
""")
def timeseries_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau white-noise test at lags 1–3 (new r10) —
    the residual-diagnostic that completes the Box–Jenkins loop the
    family already covers (timeseries_autocorr reports ACF,
    timeseries_pacf identifies AR order; Ljung–Box answers 'is there
    ANY autocorrelation left?'): Q = n(n+2)·Σ r_k²/(n−k), rejected at
    α=0.05 against the χ²(3) quantile embedded as a shared Python
    literal (the SPRT constant device — no CDF call in any engine).

    Exactness: the r_k expressions are timeseries_pacf's exact-moment
    forms, and EVERYTHING from the daily rollup onward is one SQL text
    shared verbatim by both engines (module constant _LB_TAIL_SQL) —
    identical expression trees, identical IEEE rounding.

    Scale shape: one rollup, one window pass, one aggregate — the pacf
    plan with a scalar statistic on top."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    daily.createOrReplaceTempView("_lb_daily")
    return spark.sql(
        f"WITH daily AS (SELECT * FROM _lb_daily), {_LB_TAIL_SQL}"
    )


# ---------------------------------------------------------------------------
# timeseries_changepoint — exact-integer AMOC level-shift localization (r11)
# ---------------------------------------------------------------------------

@query("timeseries_changepoint", oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    pos AS (
      SELECT event_type, day, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
             sum(x) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS st
      FROM daily
    ),
    tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sn
      FROM daily GROUP BY event_type
    ),
    g AS (
      SELECT p.event_type, p.day, p.t, p.st, o.n, o.sn,
             abs(o.n * p.st - p.t * o.sn) AS gstat
      FROM pos p JOIN tot o USING (event_type)
      WHERE p.t < o.n
    ),
    best AS (
      SELECT event_type, day AS cp_day, t, st, n, sn, gstat,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY gstat DESC, t) AS rk
      FROM g
    )
    SELECT event_type, cp_day, CAST(n AS BIGINT) AS n_days,
           CAST(t AS BIGINT) AS cp_t,
           CAST(gstat AS BIGINT) AS g_stat,
           round(CAST(st AS DOUBLE) / t, 6) AS mean_before,
           round(CAST(sn - st AS DOUBLE) / (n - t), 6) AS mean_after
    FROM best WHERE rk = 1
""")
def timeseries_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint localization per series (new r11) — AMOC
    ("at most one changepoint") via the CUSUM max statistic: the best
    level-shift point is argmax_t |n·S_t − t·S_n|, the integer-scaled
    form of max_t |S_t − (t/n)·S_n| (scaling by the positive constant n
    preserves the argmax and keeps the WHOLE objective in exact BIGINT
    arithmetic — no float enters the decision). The companion to
    timeseries_cusum: CUSUM streams an alarm as the shift happens;
    this key answers the retrospective question "WHERE did the level
    change?" — the first step of binary segmentation, and what an
    analyst runs on a metric after an incident.

    Exactness: daily counts, prefix sums, and the objective are exact
    BIGINT (|n·S_t − t·S_n| ≤ n·S_n ≈ 60·6e5 at sf0.1 — far inside
    int64 at any fixture scale; at 100 TB the rollup is per-series
    daily so n stays calendar-bounded); the argmax tie-breaks to the
    earliest position in both engines (ORDER BY gstat DESC, t). Only
    the EMITTED segment means divide — round(int/int, 6) from
    identical expression text, identical IEEE result.

    Scale shape: one map-side-combinable rollup to |series|×|days|
    rows, one per-series window pass (prefix sums), one broadcast of
    the |series|-row totals, one per-series argmax window — the
    timeseries_cusum plan with an argmax on top. Never touches raw
    events after the first groupBy."""
    from pyspark.sql import Window as W

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    ws = W.partitionBy("event_type").orderBy("day")
    pos = daily.select(
        "event_type",
        "day",
        F.row_number().over(ws).alias("t"),
        F.sum("x")
        .over(ws.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("st"),
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sn"),
    )
    g = (
        pos.join(F.broadcast(tot), "event_type")
        .filter(F.col("t") < F.col("n"))
        .withColumn(
            "gstat", F.abs(F.col("n") * F.col("st") - F.col("t") * F.col("sn"))
        )
    )
    wbest = W.partitionBy("event_type").orderBy(F.desc("gstat"), "t")
    return (
        g.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            F.col("n").alias("n_days"),
            F.col("t").cast("bigint").alias("cp_t"),
            F.col("gstat").cast("bigint").alias("g_stat"),
            F.round(F.col("st").cast("double") / F.col("t"), 6).alias(
                "mean_before"
            ),
            F.round(
                (F.col("sn") - F.col("st")).cast("double")
                / (F.col("n") - F.col("t")),
                6,
            ).alias("mean_after"),
        )
    )


# ---------------------------------------------------------------------------
# timeseries_mann_kendall + timeseries_theil_sen — robust trend suite (r11)
# ---------------------------------------------------------------------------

# z_{0.975} embedded as the EXACT rational 49/25 = 1.96, so the MK
# significance decision is pure integer arithmetic: |S|-vs-threshold
# squares to 625*18*(|S|-1)^2 > 2401*Var18 with Var18 = 18*Var(S) kept
# integer (the SPRT/chi-square constant device, one step further: not
# even the CONSTANT is float here).
MK_Z2_NUM = 2401   # (49)^2
MK_Z2_DEN = 625    # (25)^2
TS_ANCHOR = "2024-01-01"   # fixture epoch (the SAX/decay anchor)

# Shared VERBATIM from pts(event_type, t, x) onward by both engines.
_MK_TAIL_SQL = f"""sgns AS (
      SELECT a.event_type,
             CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END
               AS sgn
      FROM pts a JOIN pts b
        ON b.event_type = a.event_type AND b.t > a.t
    ),
    s AS (
      SELECT event_type,
             CAST(sum(sgn) AS BIGINT) AS s_stat,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM sgns GROUP BY event_type
    ),
    nn AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY event_type
    ),
    ties AS (
      SELECT event_type,
             CAST(sum(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT) AS tie18
      FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS tt
            FROM pts GROUP BY event_type, x)
      GROUP BY event_type
    ),
    v AS (
      SELECT nn.event_type, nn.n, s.s_stat, s.n_pairs,
             CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie18
                  AS BIGINT) AS var18
      FROM nn
      JOIN s ON s.event_type = nn.event_type
      JOIN ties ON ties.event_type = nn.event_type
    )
    SELECT event_type, n AS n_days, n_pairs, s_stat, var18,
           CASE WHEN s_stat > 1
                 AND {MK_Z2_DEN} * 18 * (s_stat - 1) * (s_stat - 1)
                     > {MK_Z2_NUM} * var18 THEN 'increasing'
                WHEN s_stat < -1
                 AND {MK_Z2_DEN} * 18 * (s_stat + 1) * (s_stat + 1)
                     > {MK_Z2_NUM} * var18 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM v"""


def _trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily series as (event_type, t, x): t = exact day index
    from the fixture epoch {TS_ANCHOR}, x = exact BIGINT daily count —
    the one data-grain pass both trend keys share."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"),
                F.lit(TS_ANCHOR).cast("date"),
            )
            .cast("bigint")
            .alias("t"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )


_TREND_PTS_ORACLE = f"""pts AS (
      SELECT event_type,
             CAST(datediff('day', DATE '{TS_ANCHOR}',
                  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
                  AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    )"""


@query("timeseries_mann_kendall", oracle=f"""
    WITH {_TREND_PTS_ORACLE},
    {_MK_TAIL_SQL}
""")
def timeseries_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per series (new r11) — the standard
    nonparametric monotonic-trend test (Mann 1945, Kendall 1975):
    S = Σ_{i<j} sign(x_j − x_i), Var(S) = [n(n−1)(2n+5) −
    Σ_g t_g(t_g−1)(2t_g+5)]/18 with the tie correction over groups of
    equal values, decision |Z| > z_{0.975} with the continuity
    correction (|S|−1). Pairs with timeseries_theil_sen exactly as in
    the hydrology literature: MK answers IS there a trend, Theil–Sen
    reports its magnitude.

    Exactness: the ENTIRE key is integer arithmetic — S, n_pairs, and
    18·Var(S) are exact BIGINTs, and the significance decision squares
    the z-test into 625·18·(|S|−1)² > 2401·Var18 using z = 49/25
    exactly (= 1.96); not one float exists in either engine text. The
    tail from pts(event_type, t, x) onward is one shared-verbatim SQL
    constant (_MK_TAIL_SQL).

    Scale shape: one map-side-combinable rollup to |series|×|days|
    rows, then a per-series self-join over calendar-bounded points
    (C(days,2) pairs — bounded by the horizon, NOT the data volume;
    100 TB only raises the counts inside x). The tie rollup is a
    second groupBy on the same tiny frame."""
    _trend_daily(spark, sf_dir).createOrReplaceTempView("_mk_pts")
    return spark.sql(
        f"WITH pts AS (SELECT * FROM _mk_pts), {_MK_TAIL_SQL}"
    )


_TS_TAIL_SQL = """sl AS (
      SELECT a.event_type,
             CAST(b.x - a.x AS BIGINT) AS dy,
             CAST(b.t - a.t AS BIGINT) AS dx,
             CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
               AS slope,
             a.t AS ti, b.t AS tj
      FROM pts a JOIN pts b
        ON b.event_type = a.event_type AND b.t > a.t
    ),
    rk AS (
      SELECT event_type, dy, dx, slope,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope, ti, tj) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
      FROM sl
    )
    SELECT event_type, m AS n_pairs, dy AS sen_dy, dx AS sen_dx,
           round(slope, 6) AS sen_slope
    FROM rk WHERE rn = CAST(floor((m + 1) / 2.0) AS BIGINT)"""


@query("timeseries_theil_sen", oracle=f"""
    WITH {_TREND_PTS_ORACLE},
    {_TS_TAIL_SQL}
""")
def timeseries_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust slope per series (new r11) — the median of all
    pairwise slopes (x_j−x_i)/(t_j−t_i), the classical 29%-breakdown
    robust trend estimator and Mann–Kendall's companion magnitude
    (Theil 1950, Sen 1968). Convention: the LOW median (element
    ⌈m/2⌉ of the slope order) so exactly ONE pair is selected — its
    exact integer numerator/denominator (sen_dy, sen_dx) are emitted
    alongside the rounded slope, so the result row is auditable as a
    rational number, not just a float.

    Exactness: slopes are IEEE doubles computed from identical exact
    BIGINT (dy, dx) by the identical division in both engines, so the
    ORDER (slope, ti, tj) is identical; the selection index
    ⌈m/2⌉ = floor((m+1)/2) is integer; the emitted dy/dx are exact.
    Tail shared verbatim (_TS_TAIL_SQL).

    Scale shape: identical to timeseries_mann_kendall — one rollup,
    one calendar-bounded per-series self-join, one per-series window
    rank. The pair count m = C(days,2) is horizon-bounded."""
    _trend_daily(spark, sf_dir).createOrReplaceTempView("_ts_pts")
    return spark.sql(
        f"WITH pts AS (SELECT * FROM _ts_pts), {_TS_TAIL_SQL}"
    )


# ---------------------------------------------------------------------------
# timeseries_matrix_profile — exact squared-Euclidean matrix profile (r11)
# ---------------------------------------------------------------------------

MP_M = 8          # subsequence length (one day at 3-hour grain)
MP_EXCL = 4       # trivial-match exclusion zone (m/2, the MP convention)
MP_BPD = 8        # buckets per day (3-hour grain)
MP_BUCKETS = 240  # fixture horizon: 30 days x 8 buckets (anchor device)
MP_LAST_START = MP_BUCKETS - MP_M  # last valid window start

# Shared VERBATIM from hs(event_type, b, x) + offs(o) onward.
_MP_TAIL_SQL = f"""wk AS (
      SELECT event_type, b - o AS i, o AS k, x
      FROM hs CROSS JOIN offs
      WHERE b - o >= 0 AND b - o <= {MP_LAST_START}
    ),
    prof AS (
      SELECT a.event_type, a.i, b.i AS j,
             CAST(sum((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS d2
      FROM wk a JOIN wk b
        ON b.event_type = a.event_type AND b.k = a.k
       AND abs(b.i - a.i) >= {MP_EXCL}
      GROUP BY 1, 2, 3
    ),
    nn1 AS (
      SELECT event_type, i, j, d2,
             row_number() OVER (PARTITION BY event_type, i
                                ORDER BY d2, j) AS rn
      FROM prof)
    SELECT event_type, CAST(i AS BIGINT) AS win_start,
           CAST(j AS BIGINT) AS nn_start, d2 AS nn_d2
    FROM nn1 WHERE rn = 1"""


@query("timeseries_matrix_profile", oracle=f"""
    WITH types AS (SELECT DISTINCT event_type FROM events),
    cnts AS (
      SELECT event_type,
             CAST(datediff('day', DATE '{TS_ANCHOR}',
                  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
                  * {MP_BPD}
                  + floor(hour(CAST(ts AS TIMESTAMP)) / 3) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    hs AS (
      SELECT t.event_type, g.b, COALESCE(c.x, 0) AS x
      FROM types t CROSS JOIN
           (SELECT CAST(unnest(range(0, {MP_BUCKETS})) AS BIGINT) AS b) g
      LEFT JOIN cnts c ON c.event_type = t.event_type AND c.b = g.b),
    offs AS (SELECT CAST(unnest(range(0, {MP_M})) AS BIGINT) AS o),
    {_MP_TAIL_SQL}
""")
def timeseries_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile per series (new r11) — for every length-{MP_M}
    subsequence of each series, the distance to its nearest
    NON-TRIVIAL neighbor subsequence in the same series (exclusion
    zone |i−j| ≥ {MP_EXCL}), the all-pairs-of-subsequences primitive
    behind motif discovery and discord (anomaly) detection (Yeh et al.
    ICDM 2016). The minimum row of the profile is the top motif pair;
    the maximum is the top discord — this key emits the full profile
    so both reads are one ORDER BY away.

    Exactness: distances are NON-normalized squared Euclidean over
    exact BIGINT 3-hour counts on a dense bucket spine (missing
    buckets are zero-filled) — every d2 and the per-window argmin
    (tie: smaller j) are pure integer arithmetic; no sqrt, no mean/std
    normalization, no float anywhere. The z-normalized variant trades
    that exactness away, so the integer ED form is deliberate.

    Scale shape: one map-side-combinable rollup to the bucket grain,
    a {MP_BUCKETS}-row-per-series spine (calendar-bounded LITERAL:
    30-day fixture horizon x {MP_BPD} buckets/day), then the
    (window x offset) grid self-joined per (series, offset) — volume
    = |series| x {MP_M} x windows², bounded by the CALENDAR, not data
    volume; 100 TB only raises the counts inside x. Everything from
    hs/offs onward is one shared-verbatim SQL constant."""
    ev = load_table(spark, sf_dir, "events")
    cnts = ev.groupBy(
        "event_type",
        (
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"),
                F.lit(TS_ANCHOR).cast("date"),
            ).cast("bigint")
            * MP_BPD
            + F.floor(F.hour("ts") / 3).cast("bigint")
        ).alias("b"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    spine = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(MP_BUCKETS - 1))).alias("b0"),
        )
        .select("event_type", F.col("b0").cast("bigint").alias("b"))
    )
    hs = spine.join(cnts, ["event_type", "b"], "left").select(
        "event_type", "b", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
    )
    hs.createOrReplaceTempView("_mp_hs")
    spark.range(MP_M).select(
        F.col("id").cast("bigint").alias("o")
    ).createOrReplaceTempView("_mp_offs")
    return spark.sql(
        "WITH hs AS (SELECT * FROM _mp_hs), "
        f"offs AS (SELECT * FROM _mp_offs), {_MP_TAIL_SQL}"
    )


# ---------------------------------------------------------------------------
# timeseries_dtw — exact-integer dynamic time warping between series (r11)
# ---------------------------------------------------------------------------

DTW_INF = 10**15   # out-of-grid sentinel; real costs are bounded by
                   # max_cell^2 * (na+nb) << 10^15 at any fixture scale


@query("timeseries_dtw", oracle=f"""
    WITH RECURSIVE pts AS (
      SELECT event_type,
             CAST(datediff('day', DATE '{TS_ANCHOR}',
                  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
                  AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type, list(x ORDER BY t) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY 1
    ),
    pr AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             a.s AS sa, b.s AS sb, a.n AS na, b.n AS nb
      FROM ser a JOIN ser b ON b.event_type > a.event_type
    ),
    dp AS (
      SELECT ta, tb, sa, sb, na, nb,
             CAST(2 AS BIGINT) AS d,
             [CAST((sa[1] - sb[1]) * (sa[1] - sb[1]) AS BIGINT)] AS cur,
             CAST([] AS BIGINT[]) AS prev
      FROM pr
      UNION ALL
      SELECT ta, tb, sa, sb, na, nb,
             d + 1,
             list_transform(
               range(CAST(greatest(1, d + 1 - nb) AS BIGINT),
                     CAST(least(na, d) AS BIGINT) + 1),
               i -> (sa[CAST(i AS INT)] - sb[CAST(d + 1 - i AS INT)])
                    * (sa[CAST(i AS INT)] - sb[CAST(d + 1 - i AS INT)])
                  + least(
                      CASE WHEN i - 1 >= greatest(1, d - nb)
                            AND i - 1 <= least(na, d - 1)
                           THEN cur[CAST(i - 1 - greatest(1, d - nb) + 1
                                         AS INT)]
                           ELSE {DTW_INF} END,
                      CASE WHEN i >= greatest(1, d - nb)
                            AND i <= least(na, d - 1)
                           THEN cur[CAST(i - greatest(1, d - nb) + 1 AS INT)]
                           ELSE {DTW_INF} END,
                      CASE WHEN i - 1 >= greatest(1, d - 1 - nb)
                            AND i - 1 <= least(na, d - 2)
                           THEN prev[CAST(i - 1 - greatest(1, d - 1 - nb) + 1
                                          AS INT)]
                           ELSE {DTW_INF} END
                    )
             ) AS cur,
             cur AS prev
      FROM dp WHERE d < na + nb
    )
    SELECT ta, tb, na, nb, cur[1] AS dtw_d2,
           CAST(cur[1] AS DOUBLE) / CAST(na + nb AS DOUBLE) AS dtw_norm
    FROM dp WHERE d = na + nb
""")
def timeseries_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic time warping distance between every pair of per-type
    daily series (new r11) — the classical elastic alignment distance
    (Sakoe & Chiba 1978): D(i,j) = (a_i − b_j)² + min(D(i−1,j),
    D(i,j−1), D(i−1,j−1)), full grid, squared-difference local cost.
    The series-similarity primitive the family lacked: matrix_profile
    compares subsequences WITHIN one series; DTW compares ACROSS
    series under tempo shifts (a day-shifted spike still aligns).

    Exactness: daily counts, local costs, and the whole DP are exact
    BIGINT arithmetic — min over integers, no float until the single
    emitted normalization d2/(na+nb), the RAW IEEE quotient in both
    texts (no round(): Python round() is half-even, DuckDB's half-away
    — the raw-quotient lesson). The Spark leg runs the identical recurrence as exact
    Python ints; the oracle states it as a recursive CTE advancing
    the DP one ANTI-DIAGONAL per step (cells of diagonal d depend
    only on diagonals d−1, d−2 — the classical wavefront
    parallelization of DTW), carrying the two frontier diagonals as
    lists.

    Scale shape: the ONE data-grain pass is the daily rollup
    (map-side combinable); the DP grid is |days|² per pair over
    |types|² pairs — calendar-bounded metadata, NOT data-bounded, so
    it runs driver-side as exact control-plane arithmetic (the
    events_markov_stationary / IVF-centroid precedent: a ~60-round
    chain of 5-row Spark jobs would cost pure scheduling floor; at
    100 TB the rollup shrinks 100 TB to |types|×|days| rows and
    NOTHING else grows)."""
    daily = _trend_daily(spark, sf_dir)
    rows = daily.collect()  # |types| x |days| rows — metadata-scale
    ser: dict = {}
    for r in rows:
        ser.setdefault(r.event_type, []).append((r.t, r.x))
    out = []
    ets = sorted(ser)
    for ai in range(len(ets)):
        for bi in range(ai + 1, len(ets)):
            a = [x for _, x in sorted(ser[ets[ai]])]
            b = [x for _, x in sorted(ser[ets[bi]])]
            na, nb = len(a), len(b)
            inf = DTW_INF
            prev_row = [0] + [inf] * nb
            for i in range(1, na + 1):
                cur_row = [inf] * (nb + 1)
                for j in range(1, nb + 1):
                    c = (a[i - 1] - b[j - 1]) ** 2
                    cur_row[j] = c + min(
                        prev_row[j], cur_row[j - 1], prev_row[j - 1]
                    )
                prev_row = cur_row
            d2 = prev_row[nb]
            # raw IEEE quotient of exact ints, NO round(): Python
            # round() is half-even, DuckDB round() half-away — the
            # recorded raw-quotient lesson (r11 ADVICE); identical
            # numerator/denominator gives the identical double
            out.append((ets[ai], ets[bi], na, nb, d2, d2 / (na + nb)))
    return spark.createDataFrame(
        out,
        "ta string, tb string, na bigint, nb bigint, "
        "dtw_d2 bigint, dtw_norm double",
    )


# ---------------------------------------------------------------------------
# timeseries_haar_dwt — unnormalized Haar wavelet energies (r12)
# ---------------------------------------------------------------------------

HAAR_N = 256       # spine padded to the next power of two past MP_BUCKETS
HAAR_LEVELS = 3    # detail levels emitted


@query("timeseries_haar_dwt", oracle=f"""
    WITH cnts AS (
      SELECT event_type,
             CAST(datediff('day', DATE '{TS_ANCHOR}',
                  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
                  AS BIGINT) * {MP_BPD}
               + CAST(hour(CAST(ts AS TIMESTAMP)) // 3 AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT t.event_type, CAST(g.i AS BIGINT) AS b
      FROM (SELECT DISTINCT event_type FROM events) t,
           LATERAL (SELECT unnest(range(0, {HAAR_N})) AS i) g
    ),
    a0 AS (
      SELECT s.event_type, s.b, CAST(coalesce(c.x, 0) AS BIGINT) AS x
      FROM spine s LEFT JOIN cnts c
        ON c.event_type = s.event_type AND c.b = s.b
    ),
    l1 AS (
      SELECT event_type, CAST(b // 2 AS BIGINT) AS b,
             CAST(sum(CASE WHEN b % 2 = 0 THEN x ELSE 0 END)
                + sum(CASE WHEN b % 2 = 1 THEN x ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN b % 2 = 0 THEN x ELSE 0 END)
                - sum(CASE WHEN b % 2 = 1 THEN x ELSE 0 END) AS BIGINT) AS d
      FROM a0 GROUP BY 1, 2
    ),
    l2 AS (
      SELECT event_type, CAST(b // 2 AS BIGINT) AS b,
             CAST(sum(CASE WHEN b % 2 = 0 THEN a ELSE 0 END)
                + sum(CASE WHEN b % 2 = 1 THEN a ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN b % 2 = 0 THEN a ELSE 0 END)
                - sum(CASE WHEN b % 2 = 1 THEN a ELSE 0 END) AS BIGINT) AS d
      FROM l1 GROUP BY 1, 2
    ),
    l3 AS (
      SELECT event_type, CAST(b // 2 AS BIGINT) AS b,
             CAST(sum(CASE WHEN b % 2 = 0 THEN a ELSE 0 END)
                + sum(CASE WHEN b % 2 = 1 THEN a ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN b % 2 = 0 THEN a ELSE 0 END)
                - sum(CASE WHEN b % 2 = 1 THEN a ELSE 0 END) AS BIGINT) AS d
      FROM l2 GROUP BY 1, 2
    ),
    det AS (
      SELECT event_type, 1 AS level, d FROM l1
      UNION ALL SELECT event_type, 2, d FROM l2
      UNION ALL SELECT event_type, 3, d FROM l3
    )
    SELECT event_type, CAST(level AS INT) AS level,
           CAST(count(*) AS BIGINT) AS n_coeffs,
           CAST(sum(d * d) AS BIGINT) AS energy,
           CAST(max(abs(d)) AS BIGINT) AS max_abs
    FROM det GROUP BY 1, 2
""")
def timeseries_haar_dwt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet decomposition per series (new r12) —
    the multi-resolution companion of timeseries_spectral_dft: where
    the DFT localizes energy in FREQUENCY only, the Haar detail
    coefficients (pairwise differences of successively coarser sums)
    localize burst energy in TIME at dyadic scales — the change/burst
    profile a monitoring pipeline reads per 6-hour/12-hour/daily band
    (and the transform behind wavelet-based series compression and
    similarity). Emits per (series, level) the detail count, energy
    Σd² and peak |d|.

    Exactness: the unnormalized Haar transform (a = x₀+x₁, d = x₀−x₁,
    no 1/√2) is PURE INTEGER on exact 3-hour counts over a dense
    {HAAR_N}-bucket spine (the matrix_profile calendar device, padded
    to the dyadic length with exact zeros); energies and maxima are
    exact BIGINTs — not one float in either text.

    Scale shape: one map-side-combinable rollup to the bucket grain,
    then {HAAR_LEVELS} successive halving groupBys on the
    |series|×{HAAR_N} spine — calendar-bounded volume; 100 TB only
    raises the counts inside x."""
    ev = load_table(spark, sf_dir, "events")
    cnts = ev.groupBy(
        "event_type",
        (
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"),
                F.lit(TS_ANCHOR).cast("date"),
            ).cast("bigint")
            * MP_BPD
            + F.floor(F.hour("ts") / 3).cast("bigint")
        ).alias("b"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    spine = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(HAAR_N - 1))).alias("b0"),
        )
        .select("event_type", F.col("b0").cast("bigint").alias("b"))
    )
    cur = spine.join(cnts, ["event_type", "b"], "left").select(
        "event_type",
        "b",
        F.coalesce("x", F.lit(0)).cast("bigint").alias("a"),
    )
    dets = []
    for level in range(1, HAAR_LEVELS + 1):
        even = F.sum(F.when(F.col("b") % 2 == 0, F.col("a")).otherwise(0))
        odd = F.sum(F.when(F.col("b") % 2 == 1, F.col("a")).otherwise(0))
        nxt = cur.groupBy(
            "event_type", (F.col("b") / 2).cast("bigint").alias("b")
        ).agg(
            (even + odd).cast("bigint").alias("a"),
            (even - odd).cast("bigint").alias("d"),
        )
        dets.append(
            nxt.select(
                "event_type", F.lit(level).alias("level"), F.col("d")
            )
        )
        cur = nxt.select("event_type", "b", "a")
    det = dets[0]
    for x in dets[1:]:
        det = det.unionByName(x)
    return det.groupBy("event_type", F.col("level").cast("int").alias("level")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("energy"),
        F.max(F.abs("d")).cast("bigint").alias("max_abs"),
    )
