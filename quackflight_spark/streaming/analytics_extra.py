"""Round-7 experimentation / time-series analytics additions.

Beyond-reference family (SURVEY.md §2.12): difference-in-differences,
position-based (U-shaped) attribution, quantile treatment effects, and
LTTB-style series downsampling. Same exactness contracts as the r5/r6
events suite in streaming/windowed.py — integer/decimal arithmetic until
one final shared double expression, try_divide everywhere a denominator
can be zero, md5-deterministic arm assignment.

The reference (/root/reference/main.py, a DuckDB serving shim) has no
analytics surface; these extend the experimentation readout family
(events_ab_test / cuped / welch / ks / mannwhitney) and the dashboarding
family (timeseries_ohlc / rolling_median).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table
from quackflight_spark.streaming.windowed import CUPED_CUTOFF

_VARIANT_SQL = (
    "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT) % 2"
)


def _variant_col() -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 2
    )


@query("events_did", oracle=f"""
    WITH u AS (
      SELECT user_id, {_VARIANT_SQL} AS variant,
             COALESCE(sum(CASE WHEN event_type = 'purchase'
                               AND CAST(ts AS TIMESTAMP) < TIMESTAMP '{CUPED_CUTOFF}'
                               THEN CAST(value AS DECIMAL(18,2)) END), 0) AS pre,
             COALESCE(sum(CASE WHEN event_type = 'purchase'
                               AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '{CUPED_CUTOFF}'
                               THEN CAST(value AS DECIMAL(18,2)) END), 0) AS post
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN variant = 0 THEN pre END) AS DOUBLE) AS pre_a,
             CAST(sum(CASE WHEN variant = 1 THEN pre END) AS DOUBLE) AS pre_b,
             CAST(sum(CASE WHEN variant = 0 THEN post END) AS DOUBLE) AS post_a,
             CAST(sum(CASE WHEN variant = 1 THEN post END) AS DOUBLE) AS post_b,
             CAST(sum(CASE WHEN variant = 0 THEN post - pre END) AS DOUBLE) AS sd_a,
             CAST(sum(CASE WHEN variant = 1 THEN post - pre END) AS DOUBLE) AS sd_b,
             CAST(sum(CASE WHEN variant = 0
                           THEN (post - pre) * (post - pre) END) AS DOUBLE) AS sdd_a,
             CAST(sum(CASE WHEN variant = 1
                           THEN (post - pre) * (post - pre) END) AS DOUBLE) AS sdd_b
      FROM u
    )
    SELECT n_a, n_b,
           round(pre_a / n_a, 6) AS mean_pre_a,
           round(post_a / n_a, 6) AS mean_post_a,
           round(pre_b / n_b, 6) AS mean_pre_b,
           round(post_b / n_b, 6) AS mean_post_b,
           round(sd_b / n_b - sd_a / n_a, 6) AS did,
           round((sd_b / n_b - sd_a / n_a)
                 / nullif(sqrt(
                     (sdd_a - sd_a * sd_a / n_a) / nullif(n_a - 1, 0) / n_a
                   + (sdd_b - sd_b * sd_b / n_b) / nullif(n_b - 1, 0) / n_b), 0),
                 6) AS t_stat
    FROM s
""")
def events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (new r7): the panel estimator for
    pre/post × group designs — did = (ȳ_B,post − ȳ_B,pre) −
    (ȳ_A,post − ȳ_A,pre), equivalently the mean of per-user diffs
    d = post − pre contrasted across groups, which is the
    fixed-effects form whose t-statistic uses the variance of d
    (each user is their own control — the CUPED-adjacent trick that
    absorbs user-level heterogeneity). Completes the experimentation
    shelf next to events_ab_test (proportions), events_welch_ttest
    (means), events_cuped (variance reduction): DiD is the readout
    when assignment is NOT randomized (a rollout, a market launch).

    Exactness (the welch/cuped contract): per-user pre/post revenue are
    DECIMAL(18,2)-exact sums split at the shared CUPED_CUTOFF; Σd and
    Σd² stay exact decimal through the one-row conditional aggregate
    and cast to double only at the end, so both engines evaluate the
    identical IEEE expression. try_divide: a one-user arm yields NULL,
    never an ANSI divide-by-zero.

    Scale shape: one user_id agg shuffle (map-side combined) + a
    one-row global conditional-sum — the events_ab_test pass structure;
    no second scan of events at any corpus size."""
    dec = F.col("value").cast("decimal(18,2)")
    cutoff = F.lit(CUPED_CUTOFF).cast("timestamp")
    is_purchase = F.col("event_type") == "purchase"
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(is_purchase & (F.col("ts") < cutoff), dec)), F.lit(0)
            ).alias("pre"),
            F.coalesce(
                F.sum(F.when(is_purchase & (F.col("ts") >= cutoff), dec)), F.lit(0)
            ).alias("post"),
        )
        .withColumn("variant", _variant_col())
    )
    d = F.col("post") - F.col("pre")
    is_a, is_b = F.col("variant") == 0, F.col("variant") == 1
    s = u.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(is_a, F.col("pre"))).cast("double").alias("pre_a"),
        F.sum(F.when(is_b, F.col("pre"))).cast("double").alias("pre_b"),
        F.sum(F.when(is_a, F.col("post"))).cast("double").alias("post_a"),
        F.sum(F.when(is_b, F.col("post"))).cast("double").alias("post_b"),
        F.sum(F.when(is_a, d)).cast("double").alias("sd_a"),
        F.sum(F.when(is_b, d)).cast("double").alias("sd_b"),
        F.sum(F.when(is_a, d * d)).cast("double").alias("sdd_a"),
        F.sum(F.when(is_b, d * d)).cast("double").alias("sdd_b"),
    )
    did = F.col("sd_b") / F.col("n_b") - F.col("sd_a") / F.col("n_a")
    var_a = F.try_divide(
        F.col("sdd_a") - F.col("sd_a") * F.col("sd_a") / F.col("n_a"),
        F.col("n_a") - 1,
    )
    var_b = F.try_divide(
        F.col("sdd_b") - F.col("sd_b") * F.col("sd_b") / F.col("n_b"),
        F.col("n_b") - 1,
    )
    return s.select(
        "n_a",
        "n_b",
        F.round(F.col("pre_a") / F.col("n_a"), 6).alias("mean_pre_a"),
        F.round(F.col("post_a") / F.col("n_a"), 6).alias("mean_post_a"),
        F.round(F.col("pre_b") / F.col("n_b"), 6).alias("mean_pre_b"),
        F.round(F.col("post_b") / F.col("n_b"), 6).alias("mean_post_b"),
        F.round(did, 6).alias("did"),
        F.round(
            F.try_divide(
                did,
                F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b")),
            ),
            6,
        ).alias("t_stat"),
    )


@query("events_attribution_position", oracle="""
    WITH fp AS (
      SELECT user_id, pts, pid, rev FROM (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, event_id AS pid,
               CAST(value AS DECIMAL(18,2)) AS rev,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ),
    touch AS (
      SELECT e.user_id, e.event_type AS channel, f.rev,
             row_number() OVER (PARTITION BY e.user_id
                                ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id) AS pos,
             count(*) OVER (PARTITION BY e.user_id) AS m
      FROM events e JOIN fp f USING (user_id)
      WHERE e.event_type <> 'purchase'
        AND (CAST(e.ts AS TIMESTAMP) < f.pts
             OR (CAST(e.ts AS TIMESTAMP) = f.pts AND e.event_id < f.pid))
    ),
    credit AS (
      SELECT channel, rev,
             CASE WHEN m = 1 THEN 10000
                  WHEN pos = 1 OR pos = m
                    THEN CASE WHEN m = 2 THEN 5000 ELSE 4000 END
                  ELSE 2000 // (m - 2)
                       + CASE WHEN pos - 1 <= 2000 % (m - 2) THEN 1 ELSE 0 END
             END AS bp
      FROM touch
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS touches,
           CAST(sum(bp) AS BIGINT) AS credit_bp,
           round(CAST(sum(CAST(rev AS DECIMAL(38,2)) * bp) AS DOUBLE)
                 / 10000, 6) AS credited_revenue
    FROM credit GROUP BY channel
""")
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) attribution (new r7): the multi-touch
    model between events_attribution's two single-touch extremes — the
    first and last touches before a user's first purchase each earn
    40%, the middles split the remaining 20% (1 touch → 100%, 2 →
    50/50). The standard U-shaped credit rule of marketing analytics.

    Exactness: credit is INTEGER BASIS POINTS — 4000/5000/10000 at the
    edges; each middle gets 2000 // (m−2) with the division remainder
    distributed one point each to the EARLIEST middles, so every
    journey's credits sum to exactly 10000 on any engine (no 0.4·rev
    binary-fraction drift). Credited revenue is the exact
    DECIMAL(rev) × bp sum, divided by 10⁴ once, as a double, at the end.

    Scale shape: the first purchase per user is one keyed window (or
    equivalently a min(struct) agg); touches join back co-partitioned
    on user_id and take ONE more window pass for (pos, m) on the same
    partitioning — journey length bounds the frame, the rollup is
    map-side-combinable over |channels| rows. Journeys with zero prior
    touches have nothing to credit and drop out (events_attribution's
    '(direct)' bucket covers them)."""
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w_user))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("pts"),
            F.col("event_id").alias("pid"),
            F.col("value").cast("decimal(18,2)").alias("rev"),
        )
    )
    touch = (
        ev.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id")
        .filter(
            (F.col("ts") < F.col("pts"))
            | ((F.col("ts") == F.col("pts")) & (F.col("event_id") < F.col("pid")))
        )
        .select(
            "user_id", F.col("event_type").alias("channel"), "rev", "ts", "event_id"
        )
        .withColumn("pos", F.row_number().over(w_user))
        .withColumn(
            "m",
            F.count(F.lit(1)).over(
                Window.partitionBy("user_id").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    mid = F.col("m") - 2
    bp = (
        F.when(F.col("m") == 1, 10000)
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("m")),
            F.when(F.col("m") == 2, 5000).otherwise(4000),
        )
        .otherwise(
            F.expr("2000 DIV (m - 2)")
            + F.when(F.col("pos") - 1 <= F.lit(2000) % mid, 1).otherwise(0)
        )
    )
    return (
        touch.withColumn("bp", bp)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("touches"),
            F.sum("bp").cast("bigint").alias("credit_bp"),
            F.round(
                F.sum(F.col("rev").cast("decimal(38,2)") * F.col("bp")).cast(
                    "double"
                )
                / 10000,
                6,
            ).alias("credited_revenue"),
        )
    )


@query("events_qte", oracle=f"""
    WITH u AS (
      SELECT user_id, {_VARIANT_SQL} AS variant,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,2)) END) * 100
                  AS BIGINT) AS cents
      FROM events GROUP BY user_id
      HAVING sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
    ),
    hist AS (
      SELECT variant, cents, CAST(count(*) AS BIGINT) AS c
      FROM u GROUP BY variant, cents
    ),
    cum AS (
      SELECT variant, cents,
             sum(c) OVER (PARTITION BY variant ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(c) OVER (PARTITION BY variant) AS n
      FROM hist
    ),
    q AS (
      SELECT variant,
             CAST(max(n) AS BIGINT) AS n_users,
             min(CASE WHEN 4 * cw >= n THEN cents END) AS p25,
             min(CASE WHEN 2 * cw >= n THEN cents END) AS p50,
             min(CASE WHEN 4 * cw >= 3 * n THEN cents END) AS p75
      FROM cum GROUP BY variant
    )
    SELECT a.n_users AS n_a, b.n_users AS n_b,
           a.p25 AS p25_a, a.p50 AS p50_a, a.p75 AS p75_a,
           b.p25 AS p25_b, b.p50 AS p50_b, b.p75 AS p75_b,
           b.p25 - a.p25 AS qte_p25,
           b.p50 - a.p50 AS qte_p50,
           b.p75 - a.p75 AS qte_p75
    FROM (SELECT * FROM q WHERE variant = 0) a
    CROSS JOIN (SELECT * FROM q WHERE variant = 1) b
""")
def events_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects (new r7): per-arm exact quartiles of
    converted users' purchase revenue and their B−A differences — the
    distributional readout that shows WHERE a treatment moves the
    metric (a lift concentrated in the p75 tail is a different product
    story than a median shift), the standard companion to the mean
    tests when revenue is skewed.

    Exactness (the events_time_to_convert recipe): revenue quantizes to
    exact integer CENTS from the decimal sum; each quartile is the
    LOWER order statistic picked off a per-arm cumulative sum by pure
    integer comparison (min cents where k·cw ≥ q·n) — no interpolated
    estimator for engines to disagree on; the QTEs are integer
    subtractions.

    Scale shape: one user_id agg shuffle, then all distribution work on
    the (variant, cents) rollup bounded by 2 × the PRICE DOMAIN —
    corpus-independent (the events_ks_test argument), so the per-arm
    cumulative windows run over bounded frames by construction."""
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
        .filter(F.col("cents").isNotNull())
        .withColumn("variant", _variant_col())
    )
    hist = u.groupBy("variant", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy("variant")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("variant")
    cum = hist.select(
        "variant",
        "cents",
        F.sum("c").over(w_cum).alias("cw"),
        F.sum("c").over(w_all).alias("n"),
    )
    # fold the 2-row per-arm frame into ONE row with conditional
    # aggregates — a crossJoin of two filtered branches would recompute
    # the whole upstream plan per branch (the events_attribution
    # explode-not-union lesson)
    is_a, is_b = F.col("variant") == 0, F.col("variant") == 1

    def pick(arm, num: int, den: int):
        return F.min(
            F.when(arm & (den * F.col("cw") >= num * F.col("n")), F.col("cents"))
        )

    one = cum.agg(
        F.max(F.when(is_a, F.col("n"))).cast("bigint").alias("n_a"),
        F.max(F.when(is_b, F.col("n"))).cast("bigint").alias("n_b"),
        pick(is_a, 1, 4).alias("p25_a"),
        pick(is_a, 1, 2).alias("p50_a"),
        pick(is_a, 3, 4).alias("p75_a"),
        pick(is_b, 1, 4).alias("p25_b"),
        pick(is_b, 1, 2).alias("p50_b"),
        pick(is_b, 3, 4).alias("p75_b"),
    )
    return one.select(
        "n_a",
        "n_b",
        "p25_a",
        "p50_a",
        "p75_a",
        "p25_b",
        "p50_b",
        "p75_b",
        (F.col("p25_b") - F.col("p25_a")).alias("qte_p25"),
        (F.col("p50_b") - F.col("p50_a")).alias("qte_p50"),
        (F.col("p75_b") - F.col("p75_a")).alias("qte_p75"),
    )


LTTB_BUCKET_DAYS = 5  # downsample bucket width (fixture month → 6 buckets)


@query("timeseries_downsample_lttb", oracle=f"""
    WITH daily AS (
      SELECT event_type AS series,
             date_diff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE))
               AS x,
             CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    based AS (
      SELECT series, x, y,
             (x - min(x) OVER (PARTITION BY series)) // {LTTB_BUCKET_DAYS} AS b
      FROM daily
    ),
    bstat AS (
      SELECT series, b, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      FROM based GROUP BY series, b
    ),
    anchors AS (
      SELECT series, b,
             max(b)   OVER (PARTITION BY series) AS b_max,
             lag(n)   OVER (PARTITION BY series ORDER BY b) AS na,
             lag(sx)  OVER (PARTITION BY series ORDER BY b) AS sax,
             lag(sy)  OVER (PARTITION BY series ORDER BY b) AS say,
             lead(n)  OVER (PARTITION BY series ORDER BY b) AS nc,
             lead(sx) OVER (PARTITION BY series ORDER BY b) AS scx,
             lead(sy) OVER (PARTITION BY series ORDER BY b) AS scy
      FROM bstat
    ),
    scored AS (
      SELECT p.series, p.b, p.x, p.y,
             CASE WHEN a.b = 0 THEN CAST(0 AS BIGINT)
                  WHEN a.b = a.b_max THEN CAST(0 AS BIGINT)
                  ELSE abs((a.sax - a.na * p.x) * (a.scy - a.nc * p.y)
                         - (a.scx - a.nc * p.x) * (a.say - a.na * p.y))
             END AS k1,
             CASE WHEN a.b = 0 THEN -p.x
                  WHEN a.b = a.b_max THEN p.x
                  ELSE -p.x END AS k2
      FROM based p JOIN anchors a ON a.series = p.series AND a.b = p.b
    ),
    pick AS (
      SELECT series, b, max(ROW(k1, k2, x, y)) AS w
      FROM scored GROUP BY series, b
    )
    SELECT series, CAST(w[3] AS BIGINT) AS day_x, CAST(w[4] AS BIGINT) AS y_cents
    FROM pick
""")
def timeseries_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB-style series downsampling (new r7): one representative point
    per {LTTB_BUCKET_DAYS}-day bucket per series, chosen to preserve
    visual shape — the Largest-Triangle-Three-Buckets dashboarding
    downsampler (Steinarsson 2013), as used by Grafana/InfluxDB, in its
    FIXED-ANCHOR variant: the triangle anchors are the neighbor BUCKET
    MEANS rather than the previously-selected point. Canonical LTTB's
    left anchor is the previous selection, a sequential dependence no
    parallel engine should replicate; anchoring on the previous bucket's
    mean keeps the shape-preserving intent, makes every bucket's argmax
    independent (series-parallel AND bucket-parallel), and is
    deterministic on any engine.

    Exactness: the triangle-area argmax is PURE BIGINT — with mean
    anchors A = (Sax/na, Say/na), C = (Scx/nc, Scy/nc), the area
    comparison scales by the positive constant na·nc into
    |(Sax − na·x)(Scy − nc·y) − (Scx − nc·x)(Say − na·y)| over integer
    epoch-day x and integer-cents y; ties break to the earliest day.
    First/last buckets keep their first/last point (LTTB's endpoint
    rule). The whole pick is the shuffle-once max(struct) argmax idiom
    (timeseries_ohlc) — no window sort over raw points.

    Scale shape: raw events reduce to the daily rollup in ONE map-side-
    combinable agg; bucket stats and the lag/lead anchor pass run on
    |series|×|buckets| rows; the argmax joins anchors back broadcast
    and reduces in a second combinable agg. Nothing is ever sorted
    globally and no frame exceeds the bucket rollup."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.col("event_type").alias("series"),
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("x"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("y")
        )
    )
    w_series = Window.partitionBy("series")
    based = (
        daily.withColumn("minx", F.min("x").over(w_series))
        .withColumn("b", F.expr(f"(x - minx) DIV {LTTB_BUCKET_DAYS}"))
        .drop("minx")
    )
    bstat = based.groupBy("series", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    w_ord = Window.partitionBy("series").orderBy("b")
    anchors = bstat.select(
        "series",
        "b",
        F.max("b").over(w_series).alias("b_max"),
        F.lag("n").over(w_ord).alias("na"),
        F.lag("sx").over(w_ord).alias("sax"),
        F.lag("sy").over(w_ord).alias("say"),
        F.lead("n").over(w_ord).alias("nc"),
        F.lead("sx").over(w_ord).alias("scx"),
        F.lead("sy").over(w_ord).alias("scy"),
    )
    j = based.join(F.broadcast(anchors), ["series", "b"])
    area = F.abs(
        (F.col("sax") - F.col("na") * F.col("x"))
        * (F.col("scy") - F.col("nc") * F.col("y"))
        - (F.col("scx") - F.col("nc") * F.col("x"))
        * (F.col("say") - F.col("na") * F.col("y"))
    )
    is_edge = (F.col("b") == 0) | (F.col("b") == F.col("b_max"))
    scored = j.select(
        "series",
        "b",
        "x",
        "y",
        F.when(is_edge, F.lit(0).cast("bigint")).otherwise(area).alias("k1"),
        F.when(F.col("b") == 0, -F.col("x"))
        .when(F.col("b") == F.col("b_max"), F.col("x"))
        .otherwise(-F.col("x"))
        .alias("k2"),
    )
    return (
        scored.groupBy("series", "b")
        .agg(F.max(F.struct("k1", "k2", "x", "y")).alias("w"))
        .select(
            "series",
            F.col("w.x").cast("bigint").alias("day_x"),
            F.col("w.y").cast("bigint").alias("y_cents"),
        )
    )


EWMA_L = 3  # control limit: |residual| > L x MAD


@query("timeseries_ewma_control", oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type AS series, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT series, d, cents,
             row_number() OVER (PARTITION BY series ORDER BY d) AS i,
             count(*) OVER (PARTITION BY series) AS n
      FROM daily
    ),
    st AS (
      SELECT series, 1 AS i, cents AS lv, n FROM ranked WHERE i = 1
      UNION ALL
      SELECT s.series, s.i + 1,
             CAST(floor((s.lv + r.cents) / 2.0) AS BIGINT), s.n
      FROM st s JOIN ranked r ON r.series = s.series AND r.i = s.i + 1
      WHERE s.i < s.n
    ),
    resid AS (
      SELECT r.series, r.d, r.cents, s.lv AS ewma_prev,
             r.cents - s.lv AS resid
      FROM ranked r JOIN st s ON s.series = r.series AND s.i = r.i - 1
    ),
    mad AS (
      SELECT series,
             list_sort(list(abs(resid)))[(count(*) + 1) // 2] AS mad_resid
      FROM resid GROUP BY series
    )
    SELECT r.series, r.d AS day, r.cents, r.ewma_prev,
           CAST(r.resid AS BIGINT) AS resid,
           CAST(m.mad_resid AS BIGINT) AS mad_resid,
           abs(r.resid) > 3 * m.mad_resid AS flagged
    FROM resid r JOIN mad m USING (series)
""")
def timeseries_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (new r7): each series' daily total is compared
    against the exponentially-weighted moving average of its PAST —
    residual r_t = x_t − s_{t−1}, flagged when |r_t| exceeds
    {EWMA_L}× the series' median absolute residual. The SPC chart for
    SMALL sustained shifts (Roberts 1959; Shewhart catches spikes,
    CUSUM catches drifts, EWMA sits between) — completing the
    monitoring shelf next to timeseries_cusum / events_anomaly_mad /
    timeseries_anomaly_stl. All days are emitted with their flag so the
    whole decision surface is oracle-checked, not just the alerts.

    Exactness: α = 1/2 in integer floor-halving fixed point (the
    timeseries_holt recipe) makes the sequential EWMA recursion
    bit-exact on any engine; the robust scale is the LOWER MEDIAN of
    |residual| picked as an exact order statistic from the per-series
    sorted array (bounded by the calendar, the rolling_median
    argument); the flag is a pure integer comparison — nothing floats
    anywhere.

    Engine shape: one (series, day) pre-agg shuffle, one per-series
    fold as a Catalyst higher-order `aggregate` that CARRIES the state
    history (the per-day EWMA is needed per row, not just finally —
    the accumulator appends to a calendar-bounded array), then a
    broadcast MAD join. Series-parallel, no UDF, no driver loop; the
    oracle replays the recursion as the holt-style recursive CTE."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("series"), F.to_date("ts").alias("d")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    series = daily.groupBy("series").agg(
        F.sort_array(F.collect_list(F.struct("d", "cents"))).alias("obs")
    )
    # fold carries (lv, hist): hist[i] = EWMA after observation i+1 —
    # appending to a calendar-bounded array keeps the whole state path
    hist = F.expr("""
        aggregate(
          slice(obs, 2, size(obs) - 1),
          named_struct('lv', obs[0].cents,
                       'hist', array(obs[0].cents)),
          (a, x) -> named_struct(
            'lv', CAST(floor((a.lv + x.cents) / 2.0) AS BIGINT),
            'hist', concat(a.hist,
                           array(CAST(floor((a.lv + x.cents) / 2.0) AS BIGINT))))
        ).hist
    """)
    rows = (
        series.withColumn("hist", hist)
        .select(
            "series",
            F.posexplode("obs").alias("pos", "ob"),
            F.col("hist"),
        )
        .filter(F.col("pos") >= 1)
        .select(
            "series",
            F.col("ob.d").alias("day"),
            F.col("ob.cents").alias("cents"),
            F.element_at("hist", F.col("pos")).alias("ewma_prev"),
            (F.col("ob.cents") - F.element_at("hist", F.col("pos")))
            .cast("bigint")
            .alias("resid"),
        )
    )
    mad = rows.groupBy("series").agg(
        F.element_at(
            F.sort_array(F.collect_list(F.abs("resid"))),
            F.expr("CAST((count(*) + 1) DIV 2 AS INT)"),
        )
        .cast("bigint")
        .alias("mad_resid")
    )
    return rows.join(F.broadcast(mad), "series").select(
        "series",
        "day",
        "cents",
        "ewma_prev",
        "resid",
        "mad_resid",
        (F.abs("resid") > EWMA_L * F.col("mad_resid")).alias("flagged"),
    )


CONC_GAP_MIN = 30  # session gap, matches events_sessionize


@query("events_concurrency", oracle=f"""
    WITH marked AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                       > INTERVAL {CONC_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    sess AS (
      SELECT user_id, sid,
             epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
      FROM (
        SELECT user_id, ts,
               sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
      ) GROUP BY user_id, sid
    ),
    clipped AS (
      SELECT unnest(range(s_us // 86400000000, e_us // 86400000000 + 1)) AS day,
             s_us, e_us
      FROM sess
    ),
    deltas AS (
      SELECT day, greatest(s_us, day * 86400000000) AS t, 1 AS delta FROM clipped
      UNION ALL
      SELECT day, least(e_us, (day + 1) * 86400000000 - 1), -1 FROM clipped
    ),
    swept AS (
      SELECT day,
             sum(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM deltas
    )
    SELECT CAST(day AS BIGINT) AS day_x,
           CAST(max(conc) AS BIGINT) AS max_concurrent,
           CAST(count(*) / 2 AS BIGINT) AS n_sessions_active
    FROM swept GROUP BY day
""")
def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-concurrency rollup (new r7): sessionize each user's events
    ({CONC_GAP_MIN}-minute inactivity gap — the events_sessionize
    rule), then sweep-line count how many sessions overlap at once,
    reporting each day's PEAK concurrency and active-session count —
    the capacity-planning readout (license seats, connection pools,
    concurrent viewers) that a plain per-day COUNT can't answer.

    Exactness: the sweep is the classic +1/−1 delta walk in integer
    MICROSECONDS; sessions are CLOSED intervals, so at equal timestamps
    starts order before ends (ORDER BY t, delta DESC — touching
    sessions count as concurrent) and the running sum is pure integer.
    Sessions spanning midnight are SPLIT at day boundaries (the
    join_interval_overlap bucket trick), so every day's sweep is
    self-contained.

    Scale shape: sessionization is the lag-flag-cumsum pass on ONE
    user_id shuffle (shared shape with events_sessionize); the sweep's
    running sum partitions BY DAY over the bounded per-day delta list
    (2 rows per active session) — no global ordering anywhere, the
    midnight split is a bounded explode over covered days."""
    from quackflight_spark.sources.fixtures import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = CONC_GAP_MIN * 60 * 1_000_000
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > gap_us
            ),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    # event_id tiebreaks the cumulative sum: without it, a user with
    # two events at the same ts straddling a session start would get
    # engine/partition-order-dependent session membership (r8 advice;
    # the same total-(ts, event_id) order the is_start lag already uses)
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        marked.withColumn("sid", F.sum("is_start").over(w_cum))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
        )
    )
    day_us = 86_400_000_000
    clipped = sess.select(
        F.explode(
            F.sequence(
                F.expr(f"s_us DIV {day_us}"), F.expr(f"e_us DIV {day_us}")
            )
        ).alias("day"),
        "s_us",
        "e_us",
    )
    starts = clipped.select(
        "day",
        F.greatest(F.col("s_us"), F.col("day") * day_us).alias("t"),
        F.lit(1).alias("delta"),
    )
    ends = clipped.select(
        "day",
        F.least(F.col("e_us"), (F.col("day") + 1) * day_us - 1).alias("t"),
        F.lit(-1).alias("delta"),
    )
    deltas = starts.unionByName(ends)
    w_sweep = (
        Window.partitionBy("day")
        .orderBy(F.col("t"), F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = deltas.select("day", F.sum("delta").over(w_sweep).alias("conc"))
    return swept.groupBy("day").agg(
        F.max("conc").cast("bigint").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_sessions_active"),
    ).select(
        F.col("day").cast("bigint").alias("day_x"),
        "max_concurrent",
        "n_sessions_active",
    )


def _anova_sql() -> str:
    """One-way ANOVA over the 7 DOW groups, emitted as explicit fixed-
    order arithmetic: group moment sums stay exact (integer cents)
    through the one-row conditional aggregate, and the SSB/SSW/F math is
    ONE deterministic double expression with a hand-ordered 7-term sum —
    a second aggregation over groups would sum doubles in partition
    order (the cross-engine drift the fixed order exists to kill)."""
    per_g = []
    for g in range(7):
        per_g.append(
            f"CAST(sum(CASE WHEN dow = {g} THEN 1 ELSE 0 END) AS BIGINT) AS n{g},\n"
            f"             CAST(sum(CASE WHEN dow = {g} THEN cents END) AS BIGINT) AS s{g},\n"
            f"             CAST(sum(CASE WHEN dow = {g} THEN cents * cents END) AS BIGINT) AS q{g}"
        )
    ssb_terms = " + ".join(
        f"CAST(s{g} AS DOUBLE) * s{g} / nullif(n{g}, 0)" for g in range(7)
    )
    q_sum = " + ".join(f"q{g}" for g in range(7))
    s_sum = " + ".join(f"s{g}" for g in range(7))
    n_sum = " + ".join(f"n{g}" for g in range(7))
    return f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             CAST(date_diff('day', DATE '1970-01-05',
                            CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS INT)
               AS dow,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,2)) * 100 END)
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT {", ".join(per_g)}
      FROM daily WHERE cents IS NOT NULL
    ),
    m AS (
      SELECT n0, n1, n2, n3, n4, n5, n6,
             CAST({n_sum} AS BIGINT) AS n,
             ({ssb_terms}) AS gterm,
             CAST({s_sum} AS DOUBLE) AS stot,
             CAST({q_sum} AS DOUBLE) AS qtot
      FROM s
    )
    SELECT n,
           round(gterm - stot * stot / n, 4) AS ss_between,
           round(qtot - gterm, 4) AS ss_within,
           CAST(6 AS INT) AS df1, CAST(n - 7 AS BIGINT) AS df2,
           round(((gterm - stot * stot / n) / 6)
                 / nullif((qtot - gterm) / nullif(n - 7, 0), 0), 6) AS f_stat
    FROM m
"""


@query("events_anova_dow", oracle=_anova_sql())
def events_anova_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across day-of-week groups (new r7): does daily
    purchase revenue differ by weekday? F = (SSB/6)/(SSW/(N−7)) over
    the 7 DOW groups of the daily rollup — the significance companion
    to timeseries_seasonal_decompose's DOW index (that key ESTIMATES
    the weekday effect; this one tests whether it's real), and the
    k-group generalization of the two-arm Welch shelf.

    Exactness: daily revenue is integer cents; per-group (n, Σx, Σx²)
    stay exact BIGINT through one conditional aggregate; DOW is the
    epoch-day mod-7 arithmetic (engine-DOW-numbering immune, the
    seasonal_decompose recipe); the SSB/SSW/F arithmetic is one shared
    double expression whose 7-term group sum is EXPLICITLY ordered in
    the generated text — never a second float aggregation whose
    summation order the partitioning would pick.

    Scale shape: one (day) pre-agg shuffle bounded by the calendar,
    then a single-row conditional aggregate — the events_ab_test pass
    structure with 7 arms."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.to_date("ts").alias("d"),
            F.pmod(
                F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")),
                F.lit(7),
            )
            .cast("int")
            .alias("dow"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,2)") * 100,
                )
            )
            .cast("bigint")
            .alias("cents")
        )
        .filter(F.col("cents").isNotNull())
    )
    aggs = []
    for g in range(7):
        is_g = F.col("dow") == g
        aggs += [
            F.sum(F.when(is_g, 1).otherwise(0)).cast("bigint").alias(f"n{g}"),
            F.sum(F.when(is_g, F.col("cents"))).cast("bigint").alias(f"s{g}"),
            F.sum(F.when(is_g, F.col("cents") * F.col("cents")))
            .cast("bigint")
            .alias(f"q{g}"),
        ]
    s = daily.agg(*aggs)
    gterm = None
    for g in range(7):
        t = F.try_divide(
            F.col(f"s{g}").cast("double") * F.col(f"s{g}"), F.col(f"n{g}")
        )
        gterm = t if gterm is None else gterm + t
    n = None
    stot = None
    qtot = None
    for g in range(7):
        n = F.col(f"n{g}") if n is None else n + F.col(f"n{g}")
        stot = F.col(f"s{g}") if stot is None else stot + F.col(f"s{g}")
        qtot = F.col(f"q{g}") if qtot is None else qtot + F.col(f"q{g}")
    n = n.cast("bigint")
    stot = stot.cast("double")
    qtot = qtot.cast("double")
    ssb = gterm - stot * stot / n
    ssw = qtot - gterm
    return s.select(
        n.alias("n"),
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.lit(6).cast("int").alias("df1"),
        (n - 7).cast("bigint").alias("df2"),
        F.round(
            F.try_divide(ssb / 6, F.try_divide(ssw, n - 7)), 6
        ).alias("f_stat"),
    )


@query("events_ratio_delta_method", oracle=f"""
    WITH u AS (
      SELECT user_id, {_VARIANT_SQL} AS variant,
             COALESCE(sum(CASE WHEN event_type = 'purchase'
                               THEN CAST(value AS DECIMAL(18,2)) END), 0) AS y,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT variant,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(s) AS DOUBLE) AS ss,
             CAST(sum(y * y) AS DOUBLE) AS syy,
             CAST(sum(CAST(s AS DECIMAL(18,0)) * s) AS DOUBLE) AS sss,
             CAST(sum(y * s) AS DOUBLE) AS sys
      FROM u GROUP BY variant
    ),
    r AS (
      SELECT variant, n,
             sy / ss AS ratio,
             -- delta method: Var(ȳ/s̄) ≈ (var_y − 2R·cov + R²·var_s)
             --               / (n · s̄²), all moments exact till here
             ((syy - sy * sy / n) / nullif(n - 1, 0)
              - 2 * (sy / ss) * ((sys - sy * ss / n) / nullif(n - 1, 0))
              + (sy / ss) * (sy / ss)
                * ((sss - ss * ss / n) / nullif(n - 1, 0)))
             / (n * (ss / n) * (ss / n)) AS var_ratio
      FROM m
    )
    SELECT a.n AS n_a, b.n AS n_b,
           round(a.ratio, 8) AS ratio_a,
           round(b.ratio, 8) AS ratio_b,
           round(b.ratio - a.ratio, 8) AS diff,
           round((b.ratio - a.ratio)
                 / nullif(sqrt(a.var_ratio + b.var_ratio), 0), 6) AS z_score
    FROM (SELECT * FROM r WHERE variant = 0) a,
         (SELECT * FROM r WHERE variant = 1) b
""")
def events_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-metric A/B readout via the delta method (new r7): revenue
    per VIEW — a ratio of two per-user quantities, the metric family
    (CTR, revenue/session, items/order) where naive per-user averaging
    is wrong because the denominator varies per user. The estimator is
    ȳ/s̄ per arm with Var(ȳ/s̄) ≈ (σ²_y − 2R·σ_ys + R²·σ²_s)/(n·s̄²)
    (Deng–Knight–Lu 2018, the standard large-scale-experimentation
    treatment), z = Δ/√(V_A + V_B). Completes the experimentation shelf
    for the metrics the Welch key's per-user mean cannot express.

    Exactness: per-user y is the DECIMAL-exact purchase sum and s the
    integer view count; all five moment sums (Σy, Σs, Σy², Σs², Σys)
    stay exact through the per-arm aggregate and cast to double only in
    the final shared expression; try_divide guards the degenerate arms.
    The two-arm combine is a cross join of two 1-row frames — no float
    aggregation whose order the partitioning picks.

    Scale shape: one user_id agg shuffle + a 2-row conditional
    aggregate — the events_ab_test pass structure."""
    dec = F.col("value").cast("decimal(18,2)")
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", dec)), F.lit(0)
            ).alias("y"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("bigint")
            .alias("s"),
        )
        .withColumn("variant", _variant_col())
    )
    m = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("s").cast("double").alias("ss"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("s").cast("decimal(18,0)") * F.col("s"))
        .cast("double")
        .alias("sss"),
        F.sum(F.col("y") * F.col("s")).cast("double").alias("sys"),
    )
    ratio = F.col("sy") / F.col("ss")
    var_y = F.try_divide(
        F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"), F.col("n") - 1
    )
    cov = F.try_divide(
        F.col("sys") - F.col("sy") * F.col("ss") / F.col("n"), F.col("n") - 1
    )
    var_s = F.try_divide(
        F.col("sss") - F.col("ss") * F.col("ss") / F.col("n"), F.col("n") - 1
    )
    sbar = F.col("ss") / F.col("n")
    var_ratio = (var_y - 2 * ratio * cov + ratio * ratio * var_s) / (
        F.col("n") * sbar * sbar
    )
    r = m.select("variant", "n", ratio.alias("ratio"), var_ratio.alias("var_ratio"))
    # fold the 2-row per-arm frame into ONE row with conditional
    # aggregates — a crossJoin of two filtered branches would recompute
    # the user-level scan per branch (the events_qte lesson; measured
    # 0.74 s vs ~0.35 s at sf0.1)
    is_a, is_b = F.col("variant") == 0, F.col("variant") == 1
    one = r.agg(
        F.max(F.when(is_a, F.col("n"))).cast("bigint").alias("n_a"),
        F.max(F.when(is_b, F.col("n"))).cast("bigint").alias("n_b"),
        F.max(F.when(is_a, F.col("ratio"))).alias("ratio_a"),
        F.max(F.when(is_b, F.col("ratio"))).alias("ratio_b"),
        F.max(F.when(is_a, F.col("var_ratio"))).alias("v_a"),
        F.max(F.when(is_b, F.col("var_ratio"))).alias("v_b"),
    )
    return one.select(
        "n_a",
        "n_b",
        F.round("ratio_a", 8).alias("ratio_a"),
        F.round("ratio_b", 8).alias("ratio_b"),
        F.round(F.col("ratio_b") - F.col("ratio_a"), 8).alias("diff"),
        F.round(
            F.try_divide(
                F.col("ratio_b") - F.col("ratio_a"),
                F.sqrt(F.col("v_a") + F.col("v_b")),
            ),
            6,
        ).alias("z_score"),
    )


@query("timeseries_vwap", oracle="""
    WITH t AS (
      SELECT event_type AS series,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
             CAST(1 + event_id % 97 AS BIGINT) AS qty
      FROM events WHERE event_type IN ('purchase', 'click', 'view')
    )
    SELECT series, day,
           CAST(sum(qty) AS BIGINT) AS volume,
           CAST(sum(price_c * qty) AS BIGINT) AS notional_c,
           round(CAST(sum(price_c * qty) AS DOUBLE) / sum(qty) / 100, 8)
             AS vwap
    FROM t GROUP BY series, day
""")
def timeseries_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VWAP downsampling (new r7): volume-weighted average price per
    (series, day) — the finance/market-data companion to
    timeseries_ohlc's candles: OHLC shows the range, VWAP shows where
    the VALUE actually traded, the benchmark execution algos settle
    against. Quantity is md5-free deterministic (1 + event_id % 97 —
    the fixture has no volume column; the weighting arithmetic is the
    operator).

    Exactness: price in integer cents, quantity integer, notional an
    exact BIGINT sum; VWAP is ONE double division at the end, round-8.

    Scale shape: a single map-side-combinable groupBy — the partial
    aggregates are constant-size, identical pass structure to
    timeseries_ohlc; 100 TB of ticks reduce in one shuffle."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click", "view")
    )
    t = ev.select(
        F.col("event_type").alias("series"),
        F.to_date("ts").alias("day"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_c"),
        (1 + F.col("event_id") % 97).cast("bigint").alias("qty"),
    )
    return t.groupBy("series", "day").agg(
        F.sum("qty").cast("bigint").alias("volume"),
        F.sum(F.col("price_c") * F.col("qty")).cast("bigint").alias("notional_c"),
        F.round(
            F.col("notional_c").cast("double") / F.col("volume") / 100, 8
        ).alias("vwap"),
    )


@query("agg_winsorized_mean", oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,2)) END) * 100
                  AS BIGINT) AS cents
      FROM events GROUP BY user_id
      HAVING sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
    ),
    hist AS (
      SELECT cents, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY cents
    ),
    cum AS (
      SELECT cents,
             sum(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cw,
             sum(c) OVER () AS n
      FROM hist
    ),
    th AS (
      SELECT CAST(min(CASE WHEN 20 * cw >= n THEN cents END) AS BIGINT) AS lo,
             CAST(min(CASE WHEN 20 * cw >= 19 * n THEN cents END) AS BIGINT)
               AS hi
      FROM cum
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           t.lo AS p05_cents, t.hi AS p95_cents,
           round(CAST(sum(u.cents) AS DOUBLE) / count(*) / 100, 6) AS mean,
           round(CAST(sum(least(greatest(u.cents, t.lo), t.hi)) AS DOUBLE)
                 / count(*) / 100, 6) AS winsorized_mean
    FROM u CROSS JOIN th t
    GROUP BY t.lo, t.hi
""")
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean (new r7): per-user purchase revenue with the
    bottom/top 5% CLIPPED to the p05/p95 order statistics before
    averaging — the robust location estimate heavy-tailed revenue
    metrics report next to the raw mean (a single whale moves the mean;
    the winsorized mean bounds any one user's influence). The robust
    companion to agg_stats' moments and events_mannwhitney's rank test.

    Exactness: thresholds are exact LOWER order statistics picked by
    integer comparison off the cents-domain cumulative (the
    events_time_to_convert recipe — no interpolated percentile
    estimator); clipping is least/greatest on integers; both means are
    one double division at the end.

    Scale shape: one user agg shuffle; the threshold scan runs on the
    price-domain-bounded rollup; thresholds broadcast back as a 1-row
    frame and the clipped sum is map-side-combinable."""
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
        .filter(F.col("cents").isNotNull())
    )
    hist = u.groupBy("cents").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w_cum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = hist.select(
        "cents",
        F.sum("c").over(w_cum).alias("cw"),
        F.sum("c").over(w_all).alias("n"),
    )
    th = cum.agg(
        F.min(F.when(20 * F.col("cw") >= F.col("n"), F.col("cents")))
        .cast("bigint")
        .alias("lo"),
        F.min(F.when(20 * F.col("cw") >= 19 * F.col("n"), F.col("cents")))
        .cast("bigint")
        .alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        u.crossJoin(F.broadcast(th))
        .groupBy("lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(
                F.sum("cents").cast("double") / F.count(F.lit(1)) / 100, 6
            ).alias("mean"),
            F.round(
                F.sum(clipped).cast("double") / F.count(F.lit(1)) / 100, 6
            ).alias("winsorized_mean"),
        )
        .select(
            "n_users",
            F.col("lo").alias("p05_cents"),
            F.col("hi").alias("p95_cents"),
            "mean",
            "winsorized_mean",
        )
    )


Z_ALPHA = 1.959963984540054  # two-sided 5% normal quantile (literal)
Z_BETA = 0.8416212335729143  # 80% power normal quantile (literal)


@query("events_power_mde", oracle=f"""
    WITH u AS (
      SELECT user_id, {_VARIANT_SQL} AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(converted) AS BIGINT) AS conv,
             CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a
      FROM u
    )
    SELECT n, n_a, CAST(n - n_a AS BIGINT) AS n_b,
           round(CAST(conv AS DOUBLE) / n, 8) AS p_pool,
           round(({Z_ALPHA} + {Z_BETA})
                 * sqrt(2 * (CAST(conv AS DOUBLE) / n)
                        * (1 - CAST(conv AS DOUBLE) / n)
                        / least(n_a, n - n_a)), 8) AS mde_abs,
           CAST(ceil(2 * (CAST(conv AS DOUBLE) / n)
                     * (1 - CAST(conv AS DOUBLE) / n)
                     * ({Z_ALPHA} + {Z_BETA}) * ({Z_ALPHA} + {Z_BETA})
                     / (0.01 * 0.01)) AS BIGINT) AS n_per_arm_for_1pt
    FROM s
""")
def events_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power planning (new r7): given the corpus's pooled
    conversion rate and current arm sizes, the minimum detectable
    absolute effect at alpha = 5% two-sided / 80% power —
    MDE = (z_a + z_b)·√(2p(1−p)/n_arm) — and the per-arm sample size a
    1-point lift would need. The BEFORE-the-test planning readout that
    pairs with events_ab_test's after-the-fact z (ship an experiment
    platform without it and every underpowered test reads as 'no
    effect'). Normal quantiles are embedded LITERALS (the one thing a
    SQL engine cannot compute without erf) — the standard practice and
    the events_bootstrap_ci precedent of precomputing distribution
    constants into the query text.

    Exactness: one user rollup + a 1-row aggregate; p, MDE and the
    ceil'd sample size are one shared double expression over exact
    integers in both engines.

    Scale shape: events_ab_test's exact pass structure — one map-side
    combinable user agg, one global conditional sum."""
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
        .withColumn("variant", _variant_col())
    )
    s = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
    )
    p = F.col("conv").cast("double") / F.col("n")
    n_min = F.least(F.col("n_a"), F.col("n") - F.col("n_a"))
    zsum = Z_ALPHA + Z_BETA
    return s.select(
        "n",
        "n_a",
        (F.col("n") - F.col("n_a")).cast("bigint").alias("n_b"),
        F.round(p, 8).alias("p_pool"),
        F.round(
            zsum * F.sqrt(2 * p * (1 - p) / n_min), 8
        ).alias("mde_abs"),
        F.ceil(2 * p * (1 - p) * zsum * zsum / (0.01 * 0.01))
        .cast("bigint")
        .alias("n_per_arm_for_1pt"),
    )
