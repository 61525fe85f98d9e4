"""Categorical / sequential hypothesis tests — round-9 additions to the
experimentation suite (SURVEY.md §2.12; same beyond-reference family as
events_welch_ttest / events_mannwhitney / events_ks_test in
streaming/windowed.py). The reference (a DuckDB serving shim,
/root/reference/main.py) has no analytics surface; these are the two
tests that suite still lacked: independence of two CATEGORICAL
dimensions (chi-square — guardrail metrics, sample-ratio checks on
segment×variant grids) and ALWAYS-VALID sequential monitoring (Wald's
SPRT — the peeking-safe test an experimentation platform runs on every
arriving event instead of waiting for a fixed horizon).

Exactness doctrine (the mannwhitney device): every count is an exact
BIGINT; float work is either a single shared expression over exact
integers or a fold over a DETERMINISTICALLY ORDERED array so both
engines add the same doubles in the same sequence. Log-likelihood
constants are computed ONCE in Python and embedded as identical
17-digit literals in both engine texts — never `log()` in SQL, whose
libm may differ in the last ulp between the JVM and DuckDB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

# ---------------------------------------------------------------------------
# events_chisq — chi-square test of independence, event_type × md5-cohort
# ---------------------------------------------------------------------------

CHISQ_COHORTS = 3  # deterministic md5 user segmentation, as events_mannwhitney


def _contingency_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (event_type, cohort, n) contingency grid, materialized once
    per corpus dir (frame_cache) and shared by events_chisq and
    events_mutual_info — the 'compute both tests from one rollup pass'
    contract their docstrings state. The staged grid is
    |types|×|cohorts| rows, so every downstream reference is a tiny
    file scan instead of replaying the raw-event groupBy per branch
    (the plan-audit exchange count is the tripwire this answers)."""
    from quackflight_spark.pipeline.frame_cache import shared_frame

    def build() -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        cohort = (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
            ).cast("int")
            % CHISQ_COHORTS
        )
        return ev.groupBy("event_type", cohort.alias("cohort")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )

    return shared_frame("events_contingency", sf_dir, build)


@query("events_chisq", oracle=f"""
    WITH cells AS (
      SELECT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
               % {CHISQ_COHORTS} AS cohort,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    rowt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS r FROM cells GROUP BY 1),
    colt AS (SELECT cohort, CAST(sum(n) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot  AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
                    CAST(count(*) AS BIGINT) AS n_cells,
                    CAST(count(DISTINCT event_type) AS BIGINT) AS n_rows,
                    CAST(count(DISTINCT cohort) AS BIGINT) AS n_cols
             FROM cells),
    terms AS (
      SELECT cells.event_type, cells.cohort,
             CAST(CAST(cells.n AS DECIMAL(38,0)) * cells.n AS DOUBLE)
               / CAST(CAST(rowt.r AS DECIMAL(38,0)) * colt.c AS DOUBLE) AS term
      FROM cells JOIN rowt USING (event_type) JOIN colt USING (cohort)
    ),
    s AS (
      SELECT list_reduce(
               list_transform(
                 list_sort(list({{'et': event_type, 'co': cohort, 't': term}})),
                 x -> x.t),
               (a, b) -> a + b) AS s_fit
      FROM terms
    )
    SELECT tot.n_rows, tot.n_cols,
           CAST((tot.n_rows - 1) * (tot.n_cols - 1) AS BIGINT) AS dof,
           tot.n_total,
           round(CAST(tot.n_total AS DOUBLE) * s.s_fit
                 - CAST(tot.n_total AS DOUBLE), 8) AS chi2,
           round(sqrt((CAST(tot.n_total AS DOUBLE) * s.s_fit
                       - CAST(tot.n_total AS DOUBLE))
                 / (CAST(tot.n_total AS DOUBLE)
                    * CAST(least(tot.n_rows, tot.n_cols) - 1 AS DOUBLE))),
                 8) AS cramers_v
    FROM tot, s
""")
def events_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence on the event_type × user-cohort
    contingency table (new r9) — the categorical counterpart to the
    suite's numeric tests: is traffic composition independent of the
    deterministic md5 user segmentation? (The same machinery is the
    sample-ratio-mismatch / guardrail-grid check an experimentation
    platform runs per segment.) Reports χ² and Cramér's V effect size;
    the p-value needs the incomplete gamma, which neither engine
    exposes deterministically, so the key honestly stops at the
    statistic (as events_mannwhitney stops at z).

    Exactness: cell/row/column counts are exact BIGINTs; χ² uses the
    textbook rearrangement χ² = N·Σ n²/(r·c) − N so each cell
    contributes ONE double division of exact integers (products held in
    DECIMAL(38,0) so a 100 TB cell count cannot overflow), and the
    Σ over the ≤|types|×|cohorts| cells is a fold over the array sorted
    by cell key — both engines add identical doubles in identical
    order, so the sum is bit-reproducible under any partitioning.

    Scale shape: one map-side-combinable groupBy of the raw stream to
    the |types|×|cohorts| cell grid; everything after runs on that
    constant-size grid (two broadcast-size rollups and a single-row
    fold). No window over raw events, no ordered scan at data grain.
    """
    cells = _contingency_cells(spark, sf_dir)
    rowt = cells.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("r"))
    colt = cells.groupBy("cohort").agg(F.sum("n").cast("bigint").alias("c"))
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.countDistinct("event_type").cast("bigint").alias("n_rows"),
        F.countDistinct("cohort").cast("bigint").alias("n_cols"),
    )
    terms = (
        cells.join(F.broadcast(rowt), "event_type")
        .join(F.broadcast(colt), "cohort")
        .select(
            "event_type",
            "cohort",
            (
                (F.col("n").cast("decimal(38,0)") * F.col("n")).cast("double")
                / (F.col("r").cast("decimal(38,0)") * F.col("c")).cast("double")
            ).alias("term"),
        )
    )
    s = terms.agg(
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("event_type").alias("et"),
                            F.col("cohort").alias("co"),
                            F.col("term").alias("t"),
                        )
                    )
                ),
                lambda x: x["t"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s_fit")
    )
    n_d = F.col("n_total").cast("double")
    chi2 = n_d * F.col("s_fit") - n_d
    return tot.crossJoin(F.broadcast(s)).select(
        "n_rows",
        "n_cols",
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
        .cast("bigint")
        .alias("dof"),
        "n_total",
        F.round(chi2, 8).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (n_d * (F.least("n_rows", "n_cols") - 1).cast("double"))
            ),
            8,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# events_sprt — Wald's sequential probability ratio test on conversion
# ---------------------------------------------------------------------------

SPRT_P0 = 0.1   # H0 conversion rate
SPRT_P1 = 0.2   # H1 conversion rate
SPRT_ALPHA = 0.05
SPRT_BETA = 0.05
# log-likelihood-ratio constants, computed once here and embedded as
# IDENTICAL literals in both engine texts (never log() in SQL: JVM and
# DuckDB libm may round the last ulp differently)
SPRT_L1 = math.log(SPRT_P1 / SPRT_P0)                  # per-success increment
SPRT_L0 = math.log((1 - SPRT_P1) / (1 - SPRT_P0))      # per-failure increment
SPRT_A = math.log((1 - SPRT_BETA) / SPRT_ALPHA)        # accept-H1 boundary
SPRT_B = math.log(SPRT_BETA / (1 - SPRT_ALPHA))        # accept-H0 boundary


@query("events_sprt", oracle=f"""
    WITH trials AS (
      SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
               % 2 AS variant,
             ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS succ
      FROM events
    ),
    walk AS (
      SELECT variant, succ,
             CAST(row_number() OVER w AS BIGINT) AS n,
             CAST(sum(succ) OVER w AS BIGINT) AS k
      FROM trials
      WINDOW w AS (PARTITION BY variant ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    llr AS (
      SELECT variant, n, k,
             CAST(k AS DOUBLE) * {SPRT_L1!r}
               + CAST(n - k AS DOUBLE) * {SPRT_L0!r} AS llr
      FROM walk
    )
    SELECT variant,
           CAST(max(n) AS BIGINT) AS n_trials,
           CAST(max(k) AS BIGINT) AS k_succ,
           round(arg_max(llr, n), 8) AS llr_final,
           CAST(min(CASE WHEN llr >= {SPRT_A!r} THEN n END) AS BIGINT)
             AS first_up,
           CAST(min(CASE WHEN llr <= {SPRT_B!r} THEN n END) AS BIGINT)
             AS first_dn,
           CASE
             WHEN min(CASE WHEN llr >= {SPRT_A!r} THEN n END) IS NOT NULL
              AND (min(CASE WHEN llr <= {SPRT_B!r} THEN n END) IS NULL
                   OR min(CASE WHEN llr >= {SPRT_A!r} THEN n END)
                      < min(CASE WHEN llr <= {SPRT_B!r} THEN n END))
               THEN 'accept_h1'
             WHEN min(CASE WHEN llr <= {SPRT_B!r} THEN n END) IS NOT NULL
               THEN 'accept_h0'
             ELSE 'continue'
           END AS decision
    FROM llr GROUP BY variant
""")
def events_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test per A/B variant (new
    r9) — the ALWAYS-VALID monitor the fixed-horizon tests in this
    suite are not: the log-likelihood ratio of H1 (p={SPRT_P1}) vs H0
    (p={SPRT_P0}) is updated on every arriving trial and the test stops
    the moment it crosses log((1−β)/α) above (accept H1) or log(β/(1−α))
    below (accept H0) — peeking at every event is exactly the designed
    use. Success = 'purchase' among all events; trials ordered by
    (ts, event_id) — the events_concurrency tiebreaker, so the walk is
    deterministic under timestamp ties.

    Exactness: the walk state is two exact BIGINTs (trial index n,
    success count k) from one window pass; LLR_n = k·L1 + (n−k)·L0
    where L1/L0/A/B are module-level Python constants embedded as
    identical 17-digit literals in BOTH texts — so every per-row double
    and every boundary comparison is bit-identical across engines. The
    first-crossing indices are conditional MINs of exact integers, and
    the decision is pure CASE logic over them.

    Scale shape: one ordered window scan partitioned by variant (the
    per-variant order is intrinsic to a sequential test), then a
    per-variant aggregate; no joins, no data-grain second pass. On a
    cluster the per-variant scan parallelizes across variants;
    within-variant it is the same single-pass prefix sum every
    cumulative metric here pays.
    """
    w = (
        Window.partitionBy("variant")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    trials = load_table(spark, sf_dir, "events").select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
            ).cast("int")
            % 2
        ).alias("variant"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("succ"),
    )
    walk = trials.select(
        "variant",
        F.row_number()
        .over(Window.partitionBy("variant").orderBy("ts", "event_id"))
        .cast("bigint")
        .alias("n"),
        F.sum("succ").over(w).cast("bigint").alias("k"),
    )
    llr_col = (
        F.col("k").cast("double") * F.lit(SPRT_L1)
        + (F.col("n") - F.col("k")).cast("double") * F.lit(SPRT_L0)
    )
    llr = walk.select("variant", "n", "k", llr_col.alias("llr"))
    first_up = F.min(F.when(F.col("llr") >= SPRT_A, F.col("n")))
    first_dn = F.min(F.when(F.col("llr") <= SPRT_B, F.col("n")))
    return llr.groupBy("variant").agg(
        F.max("n").cast("bigint").alias("n_trials"),
        F.max("k").cast("bigint").alias("k_succ"),
        F.round(
            F.max_by(F.col("llr"), F.col("n")), 8
        ).alias("llr_final"),
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


# ---------------------------------------------------------------------------
# events_mutual_info — mutual information / entropy decomposition (r9)
# ---------------------------------------------------------------------------


@query("events_mutual_info", oracle=f"""
    WITH cells AS (
      SELECT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
               % {CHISQ_COHORTS} AS cohort,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    rowt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS r FROM cells GROUP BY 1),
    colt AS (SELECT cohort, CAST(sum(n) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot  AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells),
    terms AS (
      SELECT cells.event_type AS et, cells.cohort AS co,
             (CAST(cells.n AS DOUBLE) / CAST(tot.nt AS DOUBLE))
               * ln(CAST(CAST(cells.n AS DECIMAL(38,0)) * tot.nt AS DOUBLE)
                    / CAST(CAST(rowt.r AS DECIMAL(38,0)) * colt.c AS DOUBLE))
               AS mi_term,
             CAST(rowt.r AS BIGINT) AS r, CAST(colt.c AS BIGINT) AS c,
             CAST(tot.nt AS BIGINT) AS nt
      FROM cells JOIN rowt USING (event_type) JOIN colt USING (cohort), tot
    ),
    hx AS (
      SELECT -list_reduce(
               list_transform(
                 list_sort(list({{'k': event_type,
                   't': (CAST(r AS DOUBLE) / CAST(nt AS DOUBLE))
                        * ln(CAST(r AS DOUBLE) / CAST(nt AS DOUBLE))}})),
                 x -> x.t),
               (a, b) -> a + b) AS h_row
      FROM (SELECT r.event_type, r.r, tot.nt FROM rowt r, tot) t(event_type, r, nt)
    ),
    hy AS (
      SELECT -list_reduce(
               list_transform(
                 list_sort(list({{'k': cohort,
                   't': (CAST(c AS DOUBLE) / CAST(nt AS DOUBLE))
                        * ln(CAST(c AS DOUBLE) / CAST(nt AS DOUBLE))}})),
                 x -> x.t),
               (a, b) -> a + b) AS h_col
      FROM (SELECT c.cohort, c.c, tot.nt FROM colt c, tot) t(cohort, c, nt)
    ),
    mi AS (
      SELECT list_reduce(
               list_transform(
                 list_sort(list({{'et': et, 'co': co, 't': mi_term}})),
                 x -> x.t),
               (a, b) -> a + b) AS mi
      FROM terms
    )
    SELECT round(mi.mi, 6) AS mutual_info,
           round(hx.h_row, 6) AS h_event_type,
           round(hy.h_col, 6) AS h_cohort,
           round(mi.mi / least(hx.h_row, hy.h_col), 6) AS norm_mi
    FROM mi, hx, hy
""")
def events_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information of the event_type × cohort contingency grid
    (new r9) — the information-theoretic companion to events_chisq:
    I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))), plus both marginal
    entropies and the normalized MI (I/min(H_x,H_y)) — the feature-
    selection / clustering-agreement score ML pipelines standardize on
    where χ² is the hypothesis test.

    Exactness: the grid counts and marginals are exact BIGINTs; each
    cell's ln() argument is a ratio of DECIMAL(38,0)-held exact
    products (n·N)/(r·c) — ONE division, one ln per cell — and every
    float sum (MI over ≤|types|×|cohorts| cells, entropies over the
    marginals) is a fold over the array sorted by cell key, so both
    engines add identical doubles in identical order. ln() itself is
    evaluated on bit-identical inputs; the round(…,6) margin absorbs
    any last-ulp libm divergence (the text_unigram_logprob precedent).

    Scale shape: identical to events_chisq — one map-side-combinable
    rollup to the constant-size grid, then constant-size folds. The
    two keys deliberately share the cell rollup so a real pipeline
    computes both from one pass."""
    cells = _contingency_cells(spark, sf_dir)
    rowt = cells.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("r"))
    colt = cells.groupBy("cohort").agg(F.sum("n").cast("bigint").alias("c"))
    tot = cells.agg(F.sum("n").cast("bigint").alias("nt"))

    def _entropy_fold(df: DataFrame, key: str, cnt: str):
        t = (
            (F.col(cnt).cast("double") / F.col("nt").cast("double"))
            * F.log(F.col(cnt).cast("double") / F.col("nt").cast("double"))
        )
        return df.crossJoin(F.broadcast(tot)).agg(
            (
                -F.aggregate(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct(F.col(key).alias("k"), t.alias("t"))
                            )
                        ),
                        lambda x: x["t"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("h")
        )

    hx = _entropy_fold(rowt, "event_type", "r").withColumnRenamed("h", "h_row")
    hy = _entropy_fold(colt, "cohort", "c").withColumnRenamed("h", "h_col")
    terms = (
        cells.join(F.broadcast(rowt), "event_type")
        .join(F.broadcast(colt), "cohort")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("event_type").alias("et"),
            F.col("cohort").alias("co"),
            (
                (F.col("n").cast("double") / F.col("nt").cast("double"))
                * F.log(
                    (F.col("n").cast("decimal(38,0)") * F.col("nt")).cast(
                        "double"
                    )
                    / (F.col("r").cast("decimal(38,0)") * F.col("c")).cast(
                        "double"
                    )
                )
            ).alias("mi_term"),
        )
    )
    mi = terms.agg(
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("et").alias("et"),
                            F.col("co").alias("co"),
                            F.col("mi_term").alias("t"),
                        )
                    )
                ),
                lambda x: x["t"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("mi")
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.round("mi", 6).alias("mutual_info"),
            F.round("h_row", 6).alias("h_event_type"),
            F.round("h_col", 6).alias("h_cohort"),
            F.round(F.col("mi") / F.least("h_row", "h_col"), 6).alias("norm_mi"),
        )
    )


# ---------------------------------------------------------------------------
# events_cmh — Cochran–Mantel–Haenszel stratified 2×2 test (r9)
# ---------------------------------------------------------------------------

CMH_ANCHOR = "2024-01-01"  # strata = day-of-week via engine-neutral datediff


@query("events_cmh", oracle=f"""
    WITH pts AS (
      SELECT datediff('day', DATE '{CMH_ANCHOR}',
                      CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
               % 7 AS dow,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
               % 2 AS variant,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    strata AS (
      SELECT dow,
             CAST(sum(CASE WHEN variant = 0 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(sum(CASE WHEN variant = 0 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(sum(CASE WHEN variant = 1 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(sum(CASE WHEN variant = 1 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS t
      FROM pts GROUP BY dow
    ),
    folds AS (
      SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(a) AS BIGINT) AS sum_a,
             list_reduce(list_transform(list_sort(list({{'k': dow,
               'v': CAST(CAST(a + b AS DECIMAL(38,0)) * (a + c) AS DOUBLE)
                    / CAST(t AS DOUBLE)}})), x -> x.v),
               (p, q) -> p + q) AS sum_e,
             list_reduce(list_transform(list_sort(list({{'k': dow,
               'v': CAST(CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c)
                         * (b + d) AS DOUBLE)
                    / CAST(CAST(t AS DECIMAL(38,0)) * t * (t - 1)
                           AS DOUBLE)}})), x -> x.v),
               (p, q) -> p + q) AS sum_v,
             list_reduce(list_transform(list_sort(list({{'k': dow,
               'v': CAST(CAST(a AS DECIMAL(38,0)) * d AS DOUBLE)
                    / CAST(t AS DOUBLE)}})), x -> x.v),
               (p, q) -> p + q) AS sum_ad,
             list_reduce(list_transform(list_sort(list({{'k': dow,
               'v': CAST(CAST(b AS DECIMAL(38,0)) * c AS DOUBLE)
                    / CAST(t AS DOUBLE)}})), x -> x.v),
               (p, q) -> p + q) AS sum_bc
      FROM strata
    )
    SELECT n_strata, sum_a,
           round((CAST(sum_a AS DOUBLE) - sum_e)
                 * (CAST(sum_a AS DOUBLE) - sum_e) / sum_v, 8) AS cmh_stat,
           round(sum_ad / sum_bc, 8) AS or_mh
    FROM folds
""")
def events_cmh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Mantel–Haenszel stratified association test (new r9) —
    the confounder-adjusted sibling of events_chisq: is conversion
    associated with the md5 variant AFTER stratifying by day-of-week?
    (Simpson's-paradox protection — the per-stratum 2×2 tables are
    combined without pooling their rows.) Reports the CMH statistic
    (1 dof, no continuity correction — documented) and the
    Mantel–Haenszel pooled odds ratio Σ(aᵢdᵢ/Tᵢ)/Σ(bᵢcᵢ/Tᵢ).

    Exactness: each stratum's 2×2 cells are exact BIGINTs from one
    map-side-combinable rollup; Eᵢ, Vᵢ and the OR terms are single
    double divisions of DECIMAL(38,0)-held exact products, and all
    four cross-stratum sums fold over the dow-sorted array (identical
    doubles, identical order in both engines). The stratum key is the
    engine-neutral datediff-mod-7, never locale-dependent dayofweek.

    Scale shape: one groupBy of the raw stream to 7×2×2 cells, then
    constant-size folds — the events_chisq plan with a stratum axis."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        (
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"),
                F.lit(CMH_ANCHOR).cast("date"),
            )
            % 7
        ).alias("dow"),
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
            ).cast("int")
            % 2
        ).alias("variant"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    strata = pts.groupBy("dow").agg(
        F.sum(F.when((F.col("variant") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("variant") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )

    def fold_of(expr) -> "F.Column":
        return F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("dow").alias("k"), expr.alias("v"))
                    )
                ),
                lambda x: x["v"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    e_i = (
        ((F.col("a") + F.col("b")).cast("decimal(38,0)") * (F.col("a") + F.col("c")))
        .cast("double")
        / F.col("t").cast("double")
    )
    v_i = (
        (
            (F.col("a") + F.col("b")).cast("decimal(38,0)")
            * (F.col("c") + F.col("d"))
            * (F.col("a") + F.col("c"))
            * (F.col("b") + F.col("d"))
        ).cast("double")
        / (F.col("t").cast("decimal(38,0)") * F.col("t") * (F.col("t") - 1)).cast(
            "double"
        )
    )
    ad_i = (F.col("a").cast("decimal(38,0)") * F.col("d")).cast("double") / F.col(
        "t"
    ).cast("double")
    bc_i = (F.col("b").cast("decimal(38,0)") * F.col("c")).cast("double") / F.col(
        "t"
    ).cast("double")
    folds = strata.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("a").cast("bigint").alias("sum_a"),
        fold_of(e_i).alias("sum_e"),
        fold_of(v_i).alias("sum_v"),
        fold_of(ad_i).alias("sum_ad"),
        fold_of(bc_i).alias("sum_bc"),
    )
    diff = F.col("sum_a").cast("double") - F.col("sum_e")
    return folds.select(
        "n_strata",
        "sum_a",
        F.round(diff * diff / F.col("sum_v"), 8).alias("cmh_stat"),
        F.round(F.col("sum_ad") / F.col("sum_bc"), 8).alias("or_mh"),
    )


# ---------------------------------------------------------------------------
# events_markov_stationary — stationary distribution by power iteration (r9)
# ---------------------------------------------------------------------------

MKV_SCALE = 10**12
MKV_ITERS = 12


def _mkv_prefix_sql() -> str:
    return """
    seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    totals AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS total
      FROM pairs GROUP BY 1
    ),
    states AS (SELECT DISTINCT from_type AS state FROM pairs),
    n_states AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states)"""


def _mkv_iter_sql(iters: int, scale: int) -> str:
    parts = [
        f"pi0 AS MATERIALIZED (SELECT state, "
        f"CAST({scale} AS BIGINT) // (SELECT k FROM n_states) AS v FROM states)"
    ]
    for r in range(1, iters + 1):
        parts.append(f"""
    pi{r} AS MATERIALIZED (
      SELECT s.state,
             CAST(COALESCE((SELECT sum((pi.v * p.n) // t.total)
                            FROM pi{r - 1} pi
                            JOIN pairs p ON p.from_type = pi.state
                             AND p.to_type = s.state
                            JOIN totals t ON t.from_type = pi.state),
                           0) AS BIGINT) AS v
      FROM states s
    )""")
    return ",\n".join(parts)


@query("events_markov_stationary", oracle=f"""
    WITH {_mkv_prefix_sql()},
    {_mkv_iter_sql(MKV_ITERS, MKV_SCALE)}
    SELECT cur.state,
           cur.v AS pi_scaled,
           CAST(abs(cur.v - prev.v) AS BIGINT) AS delta_scaled,
           round(CAST(cur.v AS DOUBLE)
                 / (SELECT CAST(sum(v) AS DOUBLE) FROM pi{MKV_ITERS}), 8)
             AS pi
    FROM pi{MKV_ITERS} cur JOIN pi{MKV_ITERS - 1} prev USING (state)
""")
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain (new r9)
    — the long-run visit frequencies the transition matrix
    (events_transition_matrix) only implies: π = πP solved by
    {MKV_ITERS} power iterations, reported with the per-state
    last-iteration delta so convergence is ON THE ROW, not asserted
    (delta ≈ 0 at fixture mixing rates; the chain is ergodic because
    every observed type transitions onward).

    Exactness: the graph_pagerank fixed-point device — π carries as
    BIGINT numerators at scale 10^12 and each step computes
    Σᵢ (πᵢ·nᵢⱼ) // totᵢ with INTEGER division in both engines (DuckDB
    `//`, Spark `DIV`), so every iterate is bit-identical under any
    partitioning; floors leak ≤|states| units of 10⁻¹² mass per round,
    which the final normalization (one double division) absorbs. The
    πᵢ·nᵢⱼ product bounds BIGINT while counts stay below ~10⁶ ·
    10¹²⁻ᵏ; beyond that the matrix pre-normalizes to scaled
    probabilities once (documented, the pagerank convention).

    Scale shape: the chain state is |types| rows and the matrix
    |types|² — iterations are joins over broadcast-size frames
    composed into one Catalyst plan; the only data-grain work is the
    ONE per-user lead() window building the pair counts (shared shape
    with events_transition_matrix)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pair_rows = (
        seq.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()  # |types|² rows — metadata-scale, the IVF-centroid
        # precedent: the DATA-GRAIN work is the per-user window above;
        # iterating a |types|×|types| matrix is control-plane arithmetic
        # (a 12-round chain of 5-row Spark jobs measured 21 s of pure
        # scheduling floor — the iteration itself is exact either way)
    )
    pairs = {(r.from_type, r.to_type): r.n for r in pair_rows}
    totals: dict = {}
    for (f, _), n in pairs.items():
        totals[f] = totals.get(f, 0) + n
    state_list = sorted(totals)
    k = len(state_list)
    pi = {s: MKV_SCALE // k for s in state_list}
    prev = dict(pi)
    for _ in range(MKV_ITERS):
        prev = pi
        nxt = {s: 0 for s in state_list}
        for (f, t), n in pairs.items():
            # exact Python ints: same floor-division chain as the oracle
            nxt[t] = nxt.get(t, 0) + (pi[f] * n) // totals[f]
        pi = {s: nxt.get(s, 0) for s in state_list}
    tv = float(sum(pi.values()))
    rows = [
        (s, pi[s], abs(pi[s] - prev[s]), round(pi[s] / tv, 8))
        for s in state_list
    ]
    return spark.createDataFrame(
        rows,
        "state string, pi_scaled bigint, delta_scaled bigint, pi double",
    )


# ---------------------------------------------------------------------------
# events_decay_score — recency-decayed engagement score (r9)
# ---------------------------------------------------------------------------

DECAY_ANCHOR = "2024-02-01"  # scoring date: day after the fixture horizon


@query("events_decay_score", oracle=f"""
    WITH aged AS (
      SELECT user_id,
             datediff('day',
                      CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE),
                      DATE '{DECAY_ANCHOR}') AS age,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    buckets AS (
      SELECT user_id, age,
             CAST(sum(cents) AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM aged GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(sum(c) AS BIGINT) AS total_cents,
           round(list_reduce(
             list_transform(list_sort(list({{'a': age,
               'v': CAST(c AS DOUBLE) * power(2.0, -CAST(age AS DOUBLE))}})),
               x -> x.v),
             (p, q) -> p + q) / 100.0, 8) AS decayed_value
    FROM buckets GROUP BY user_id
""")
def events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed engagement score (new r9) — the half-life
    weighting every ranking/LTV/churn feature store keeps: each
    purchase contributes value·2^(−age_days) (one-day half-life against
    the fixed scoring date), so yesterday counts half of today and last
    month is noise. The standard alternative to hard recency windows
    (events_rfm buckets recency; this key integrates it).

    Exactness: 2^(−k) for integer k is EXACT in IEEE double (pure
    exponent), so each age bucket's term is one exact-BIGINT-cents ×
    exact-power product (a single rounding, identical in both engines
    — power(2.0, -k) is exact, not libm-approximated, for integral k);
    the per-user sum folds over the AGE-SORTED bucket array, identical
    order both engines. Cents and counts stay exact BIGINTs.

    Scale shape: one map-side-combinable (user, age) rollup — age is
    calendar-bounded, so per-user arrays are ≤ horizon days — then a
    per-user fold. No window, no join."""
    aged = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.datediff(
                F.lit(DECAY_ANCHOR).cast("date"),
                F.date_trunc("day", F.col("ts")).cast("date"),
            ).alias("age"),
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    buckets = aged.groupBy("user_id", "age").agg(
        F.sum("cents").cast("bigint").alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return buckets.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum("c").cast("bigint").alias("total_cents"),
        F.round(
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("age").alias("a"),
                                (
                                    F.col("c").cast("double")
                                    * F.pow(F.lit(2.0), -F.col("age").cast("double"))
                                ).alias("v"),
                            )
                        )
                    ),
                    lambda x: x["v"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(100.0),
            8,
        ).alias("decayed_value"),
    )


# ---------------------------------------------------------------------------
# events_propensity_match — stratified nearest-neighbor matching (r10)
# ---------------------------------------------------------------------------

PSM_ANCHOR = "1970-01-05"  # Monday anchor, the engine-neutral dow recipe


@query("events_propensity_match", oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS score,
             8 * CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                      AS BIGINT) > count(*) AS treated,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0)
                  AS BIGINT) AS y_cents,
             CAST(date_diff('day', DATE '{PSM_ANCHOR}',
                  CAST(min(CAST(ts AS TIMESTAMP)) AS DATE)) % 7 AS INT)
               AS stratum
      FROM events GROUP BY user_id
    ),
    t AS (SELECT * FROM u WHERE treated),
    c AS (SELECT * FROM u WHERE NOT treated),
    m AS (
      SELECT t.user_id, t.stratum, t.y_cents AS y_t,
             min(ROW(abs(t.score - c.score), c.score, c.user_id, c.y_cents))
               AS best
      FROM t JOIN c USING (stratum)
      GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_matched,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_controls,
           CAST(sum(CAST(best[1] AS BIGINT)) AS BIGINT) AS total_score_gap,
           round(CAST(sum(y_t - best[4]) AS DOUBLE)
                 / count(*) / 100.0, 6) AS att_per_user
    FROM m
""")
def events_propensity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched-cohort treatment-effect estimate (new r10) — coarsened
    exact matching on a stratum (first-seen day-of-week, the CEM step)
    plus nearest-neighbor matching WITH replacement on an integer
    activity score within the stratum, then ATT = mean(Y_treated −
    Y_matched-control): the observational-causal method the suite
    lacked (events_did needs a time boundary, events_cuped a pre-period
    covariate; matching needs neither). Treatment = error-heavy user
    (errors exceed 1/8 of the user's events: 8·sum(error) > count(*));
    outcome = purchase cents; score = event count (the confounder a
    propensity model would absorb — swap in
    pipeline_train_quality_filter's weights for a learned score, the
    plumbing is identical).

    Spark-first: the within-stratum nearest match is the join_nearest
    union+window device on the SCORE axis — controls and treated
    interleave in one (score, src, user_id) sort per stratum; a running
    max(struct(score, −uid, y)) over preceding rows yields the best
    at-or-below control and a running min(struct) the best above; a
    projection picks the smaller gap with ties to the lower score then
    lower user_id — exactly the oracle's min-ROW(abs, score, uid)
    order. No treated×control join exists on the Spark side; the
    oracle states ground truth with that quadratic join, proving the
    window rewrite lossless.

    Exactness: scores, gaps and outcomes are BIGINTs end-to-end; the
    ATT is one division chain of exact integers.

    Scale shape: one user rollup (map-side combinable) + one
    stratum-keyed sort-window over USERS (not events). Strata here are
    the 7 dows; a production run matches within finer cells (geo ×
    cohort × signup-week), which is the same plan with a wider
    partition key — and 1-D NN across a single giant stratum
    range-partitions by score with boundary exchange (the ntile
    device), documented not implemented."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("score"),
        (
            8 * F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).cast("bigint")
            > F.count(F.lit(1))
        ).alias("treated"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,2)") * 100,
                )
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("y_cents"),
        (
            F.datediff(
                F.min(F.col("ts")).cast("date"), F.lit(PSM_ANCHOR).cast("date")
            )
            % 7
        ).cast("int").alias("stratum"),
    )
    merged = u.select(
        "user_id",
        "score",
        "stratum",
        "y_cents",
        F.when(F.col("treated"), 1).otherwise(0).alias("src"),
        F.when(
            ~F.col("treated"),
            F.struct(
                F.col("score"),
                (-F.col("user_id")).alias("nid"),
                F.col("y_cents").alias("y"),
            ),
        ).alias("cb"),
        F.when(
            ~F.col("treated"),
            F.struct(
                F.col("score"),
                F.col("user_id").alias("id"),
                F.col("y_cents").alias("y"),
            ),
        ).alias("cf"),
    )
    order = [F.col("score"), F.col("src"), F.col("user_id")]
    w_back = (
        W.partitionBy("stratum")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("stratum")
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    scored = merged.select(
        "user_id",
        "score",
        "stratum",
        "y_cents",
        "src",
        F.max("cb").over(w_back).alias("back"),
        F.min("cf").over(w_fwd).alias("fwd"),
    ).filter(F.col("src") == 1)
    gap_b = F.col("score") - F.col("back.score")
    gap_f = F.col("fwd.score") - F.col("score")
    use_back = F.col("fwd").isNull() | (
        F.col("back").isNotNull() & (gap_b <= gap_f)
    )
    matched = scored.filter(
        F.col("back").isNotNull() | F.col("fwd").isNotNull()
    ).select(
        "y_cents",
        F.when(use_back, gap_b).otherwise(gap_f).alias("gap"),
        F.when(use_back, F.col("back.y")).otherwise(F.col("fwd.y")).alias("y_c"),
    )
    n_controls = u.filter(~F.col("treated")).count()
    return matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched"),
        F.lit(n_controls).cast("bigint").alias("n_controls"),
        F.sum("gap").cast("bigint").alias("total_score_gap"),
        F.round(
            F.sum(F.col("y_cents") - F.col("y_c")).cast("double")
            / F.count(F.lit(1))
            / F.lit(100.0),
            6,
        ).alias("att_per_user"),
    )


# ---------------------------------------------------------------------------
# events_survival_km — Kaplan-Meier retention curve with censoring (r11)
# ---------------------------------------------------------------------------

KM_BIG_PURCHASE = 150  # value threshold defining the KM event (measured:
# ~47% of users convert at every fixture SF — a genuine censor mix; the
# naive lifetime (first→last event day) is degenerate on this fixture,
# every user spans the whole window)

# Shared VERBATIM from the per-user lifetime table onward (the ljung_box
# device): one SQL text over a `lif(user_id, dur, ev)` relation, so both
# engines evaluate identical expression trees. The only float surface is
# the survival product, computed as exp(sum(ln(factor))) with the factor
# GUARDED integer-side (ln(0) is -inf in DuckDB but NULL in Spark — the
# guard keeps both out of the transcendental entirely; a zeroed
# at-risk set instead short-circuits surv to exact 0 via the integer
# running min). The running sums are ≤31-row windows over the duration
# rollup — domain-bounded by the fixture calendar.
_KM_TAIL_SQL = """
    n_total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lif),
    leaving AS (
      SELECT dur AS t,
             CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM lif GROUP BY dur
    ),
    risk AS (
      SELECT t, d,
             nt.n - coalesce(sum(c) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS n_risk
      FROM leaving CROSS JOIN n_total nt
    ),
    km AS (
      SELECT t, n_risk, d,
             sum(CASE WHEN n_risk > d
                      THEN ln(CAST(n_risk - d AS DOUBLE)
                              / CAST(n_risk AS DOUBLE))
                      ELSE 0.0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lsum,
             min(n_risk - d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
               AS minleft
      FROM risk WHERE d > 0
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events,
           CASE WHEN minleft = 0 THEN 0.0
                ELSE round(exp(lsum), 6) END AS surv
    FROM km"""


@query("events_survival_km", oracle=f"""
    WITH u AS (
      SELECT user_id,
             min(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS d0,
             max(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS d1,
             min(CASE WHEN event_type = 'purchase'
                       AND value >= {KM_BIG_PURCHASE}
                      THEN CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                                AS DATE) END) AS dc
      FROM events GROUP BY user_id
    ),
    lif AS (
      SELECT user_id,
             CAST(coalesce(dc, d1) - d0 AS BIGINT) AS dur,
             dc IS NOT NULL AS ev
      FROM u
    ),
    {_KM_TAIL_SQL}
""")
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve with right-censoring (new r11) —
    THE estimator for time-to-event when the observation window
    truncates lifetimes. Event here: the user's first BIG purchase
    (value ≥ KM_BIG_PURCHASE); duration = days from the user's first
    activity to that purchase; users who never convert are CENSORED at
    their observed span (first→last event day) — they contribute to
    the at-risk denominators for as long as observed, the correction a
    naive conversion curve lacks and the complement to
    events_time_to_convert (which reports converters only) and
    events_churn_hazard's per-interval rate.
    S(t) = Π over event times u ≤ t of (n_u − d_u)/n_u.

    Exactness: lifetimes, censor flags, at-risk counts and event
    counts are exact BIGINTs (the entire decision surface); the
    survival product evaluates as exp(Σ ln(·)) inside ONE SQL text
    shared verbatim from the lifetime table onward (_KM_TAIL_SQL) —
    identical window orders, identical IEEE accumulation; the ln
    argument is guarded by the integer n_risk > d predicate on both
    sides (ln(0) is -inf in DuckDB but NULL in Spark — neither is ever
    evaluated), and an exhausted risk set yields exact 0.0 via the
    integer running min. The text_perplexity_bigram precedent covers
    the ln/exp usage: both engines' logs are within 1 ulp, the sum of
    ≤31 terms is rounded at 6 decimals.

    Scale shape: one map-side-combinable per-user rollup over raw
    events, then every window runs on the ≤|calendar| duration rollup
    (≤31 rows here; always calendar-bounded) — the unpartitioned
    windows sit above an aggregate, the sanctioned domain-bounded
    shape (PLANS.md unpart.win tripwire)."""
    day = F.date_trunc("day", F.col("ts")).cast("date")
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(day).alias("d0"),
            F.max(day).alias("d1"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= KM_BIG_PURCHASE),
                    day,
                )
            ).alias("dc"),
        )
    )
    lif = u.select(
        "user_id",
        F.datediff(F.coalesce(F.col("dc"), F.col("d1")), F.col("d0"))
        .cast("bigint")
        .alias("dur"),
        F.col("dc").isNotNull().alias("ev"),
    )
    lif.createOrReplaceTempView("_km_lif")
    return spark.sql(f"WITH lif AS (SELECT * FROM _km_lif), {_KM_TAIL_SQL}")


# ---------------------------------------------------------------------------
# events_markov_absorption — hit-purchase-before-error probabilities (r11)
# ---------------------------------------------------------------------------

# Shared VERBATIM from the pair-count grid onward: the fixture chain's
# transient states {click, signup, view} with {purchase, error} made
# absorbing. (I − Q)x = R·e_purchase, each row scaled by the integer
# out-degree tot_i so the WHOLE system is integer: A = diag(tot) − N_Q,
# b = n(i→purchase); solved in closed form by 3×3 Cramer — integer
# determinants (entries ≤ ~2e4 at sf0.1, dets ≤ ~1e13; pre-scale the
# counts once past ~1e12 events — the pagerank convention), ONE double
# division per state, rounded at 8. No iteration, no inverse, no libm.
_ABS_TAIL_SQL = """
    m AS (
      SELECT
        sum(CASE WHEN from_type = 'click'  AND to_type = 'click'  THEN n ELSE 0 END) AS n_cc,
        sum(CASE WHEN from_type = 'click'  AND to_type = 'signup' THEN n ELSE 0 END) AS n_cs,
        sum(CASE WHEN from_type = 'click'  AND to_type = 'view'   THEN n ELSE 0 END) AS n_cv,
        sum(CASE WHEN from_type = 'click'  AND to_type = 'purchase' THEN n ELSE 0 END) AS n_cp,
        sum(CASE WHEN from_type = 'signup' AND to_type = 'click'  THEN n ELSE 0 END) AS n_sc,
        sum(CASE WHEN from_type = 'signup' AND to_type = 'signup' THEN n ELSE 0 END) AS n_ss,
        sum(CASE WHEN from_type = 'signup' AND to_type = 'view'   THEN n ELSE 0 END) AS n_sv,
        sum(CASE WHEN from_type = 'signup' AND to_type = 'purchase' THEN n ELSE 0 END) AS n_sp,
        sum(CASE WHEN from_type = 'view'   AND to_type = 'click'  THEN n ELSE 0 END) AS n_vc,
        sum(CASE WHEN from_type = 'view'   AND to_type = 'signup' THEN n ELSE 0 END) AS n_vs,
        sum(CASE WHEN from_type = 'view'   AND to_type = 'view'   THEN n ELSE 0 END) AS n_vv,
        sum(CASE WHEN from_type = 'view'   AND to_type = 'purchase' THEN n ELSE 0 END) AS n_vp,
        sum(CASE WHEN from_type = 'click'  THEN n ELSE 0 END) AS t_c,
        sum(CASE WHEN from_type = 'signup' THEN n ELSE 0 END) AS t_s,
        sum(CASE WHEN from_type = 'view'   THEN n ELSE 0 END) AS t_v
      FROM pairs
    ),
    a AS (
      SELECT CAST(t_c - n_cc AS BIGINT) AS a11, CAST(0 - n_cs AS BIGINT) AS a12,
             CAST(0 - n_cv AS BIGINT) AS a13, CAST(n_cp AS BIGINT) AS b1,
             CAST(0 - n_sc AS BIGINT) AS a21, CAST(t_s - n_ss AS BIGINT) AS a22,
             CAST(0 - n_sv AS BIGINT) AS a23, CAST(n_sp AS BIGINT) AS b2,
             CAST(0 - n_vc AS BIGINT) AS a31, CAST(0 - n_vs AS BIGINT) AS a32,
             CAST(t_v - n_vv AS BIGINT) AS a33, CAST(n_vp AS BIGINT) AS b3,
             CAST(t_c AS BIGINT) AS t_c, CAST(t_s AS BIGINT) AS t_s,
             CAST(t_v AS BIGINT) AS t_v
      FROM m
    ),
    d AS (
      SELECT t_c, t_s, t_v, b1, b2, b3,
             a11*(a22*a33 - a23*a32) - a12*(a21*a33 - a23*a31)
               + a13*(a21*a32 - a22*a31) AS det,
             b1*(a22*a33 - a23*a32) - a12*(b2*a33 - a23*b3)
               + a13*(b2*a32 - a22*b3) AS det1,
             a11*(b2*a33 - a23*b3) - b1*(a21*a33 - a23*a31)
               + a13*(a21*b3 - b2*a31) AS det2,
             a11*(a22*b3 - b2*a32) - a12*(a21*b3 - b2*a31)
               + b1*(a21*a32 - a22*a31) AS det3
      FROM a
    )
    SELECT s.state, s.n_out,
           CAST(s.detj AS BIGINT) AS det_num,
           CAST(d2.det AS BIGINT) AS det_den,
           round(CAST(s.detj AS DOUBLE) / CAST(d2.det AS DOUBLE), 8)
             AS p_purchase_first
    FROM (
      SELECT 'click' AS state, t_c AS n_out, det1 AS detj FROM d
      UNION ALL SELECT 'signup', t_s, det2 FROM d
      UNION ALL SELECT 'view', t_v, det3 FROM d
    ) s CROSS JOIN (SELECT det FROM d) d2"""


@query("events_markov_absorption", oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    {_ABS_TAIL_SQL}
""")
def events_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-chain hitting probabilities (new r11): make
    {{purchase, error}} absorbing in the observed event-type chain and
    report, for each transient state, P(absorb at purchase before
    error | start there) — the "which intermediate state converts?"
    question events_markov_stationary's long-run frequencies and
    events_top_paths' literal paths both dodge: absorption marginalizes
    over ALL paths of ALL lengths in closed form.

    Exactness: (I − Q)x = R·e_purchase row-scaled by the integer
    out-degrees becomes a PURE INTEGER 3×3 system (A = diag(tot) − N,
    b = n(·→purchase)); Cramer's determinants are exact BIGINT products
    of counts, identical in both engines, and the emitted probability
    is one shared double division rounded at 8 (numerator AND
    denominator determinants are emitted as columns, so the exactness
    claim is auditable on the row). Everything from the pair grid
    onward is ONE SQL text shared verbatim (_ABS_TAIL_SQL). Probability
    interpretation guaranteed by 0 ≤ detj ≤ det (substochastic Q).

    Scale shape: the data-grain work is the one per-user lead() window
    (shared shape with events_transition_matrix / markov_stationary);
    the grid is |types|² rows and the Cramer solve a single-row
    projection. At ~1e12+ events pre-scale the counts once so the
    triple products stay inside BIGINT (the pagerank convention,
    documented here rather than silently risked)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    pairs.createOrReplaceTempView("_abs_pairs")
    return spark.sql(
        f"WITH pairs AS (SELECT * FROM _abs_pairs), {_ABS_TAIL_SQL}"
    )


# ---------------------------------------------------------------------------
# events_hmm_viterbi — exact-integer Viterbi decode per user session (r11)
# ---------------------------------------------------------------------------

# 2-state HMM over the per-user event stream: state 0 "healthy", state 1
# "degraded"; observation = is the event an error. Penalties are integer
# NEGATIVE-LOG-LIKELIHOOD surrogates (the SPRT/Kalman constant device
# pushed all the way: the whole max-product recursion is exact integer
# arithmetic, so the per-step argmin and the final decode are
# bit-identical under any engine / partitioning).
HMM_E0_ERR = 3    # emission penalty: error observed while healthy
HMM_E0_OK = 0     # non-error while healthy
HMM_E1_ERR = 0    # error while degraded
HMM_E1_OK = 1     # non-error while degraded
HMM_SWITCH = 2    # transition penalty for changing state
HMM_INIT1 = 1     # prior penalty for starting degraded
HMM_BUCKETS = 64  # applyInPandas salt: many users per Arrow group


@query("events_hmm_viterbi", oracle=f"""
    WITH RECURSIVE idx AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS k,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS obs
      FROM events
    ),
    nu AS (SELECT user_id, CAST(max(k) AS BIGINT) AS n FROM idx GROUP BY 1),
    step AS (
      SELECT user_id, k,
             CAST(CASE WHEN obs = 1 THEN {HMM_E0_ERR}
                       ELSE {HMM_E0_OK} END AS BIGINT) AS c0,
             CAST(CASE WHEN obs = 1 THEN {HMM_E1_ERR}
                       ELSE {HMM_E1_OK} END + {HMM_INIT1} AS BIGINT) AS c1
      FROM idx WHERE k = 1
      UNION ALL
      SELECT i.user_id, i.k,
             CAST(least(s.c0, s.c1 + {HMM_SWITCH})
                  + CASE WHEN i.obs = 1 THEN {HMM_E0_ERR}
                         ELSE {HMM_E0_OK} END AS BIGINT),
             CAST(least(s.c0 + {HMM_SWITCH}, s.c1)
                  + CASE WHEN i.obs = 1 THEN {HMM_E1_ERR}
                         ELSE {HMM_E1_OK} END AS BIGINT)
      FROM step s JOIN idx i ON i.user_id = s.user_id AND i.k = s.k + 1
    )
    SELECT s.user_id AS user_id, nu.n AS n_events,
           s.c0 AS cost_healthy, s.c1 AS cost_degraded,
           CASE WHEN s.c0 <= s.c1 THEN 'healthy' ELSE 'degraded' END
             AS best_state,
           least(s.c0, s.c1) AS best_cost
    FROM step s JOIN nu ON nu.user_id = s.user_id AND s.k = nu.n
""")
def events_hmm_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi decode of a 2-state HMM over each user's event stream
    (new r11) — the max-product forward recursion (Viterbi 1967) with
    states healthy/degraded and observation 'is this event an error':
    V_t(s) = emis(s, obs_t) + min_s' (V_{t-1}(s') + trans(s', s)).
    Completes the latent-sequence set: events_markov_* treat the event
    TYPES as the chain; this key infers a HIDDEN regime behind them —
    the sessionized 'was this user in a degraded stretch' question SRE
    tooling answers with exactly this decode.

    Exactness: penalties are integer negative-log-likelihood
    surrogates (module constants shared into both texts), so every
    V_t(s), every argmin, and the final state decision are exact
    BIGINT arithmetic — the whole DP is hash-provable, no float
    anywhere. Ties prefer healthy (c0 <= c1) in both engines.

    Scale shape (Spark): applyInPandas over user groups — each group
    is one bounded session stream (the applyInPandasWithState
    batch-side analog); the DP is O(states²·events) per user with
    O(1) rolling state, Arrow-batched, embarrassingly parallel across
    users. The oracle states the identical recursion as a recursive
    CTE stepping the per-user event index (depth = max session
    length, calendar-bounded)."""
    # Salt-bucketed grouping (r11 perf): applyInPandas keyed directly on
    # user_id paid one pandas-group construction per USER (1500 tiny
    # Arrow groups at sf0.1 — 5.6 s, 2.45x the oracle). Grouping on a
    # 64-way salt and decoding every user inside one kernel call cuts
    # the per-group floor ~4x while the per-user DP stays exact and
    # identical (users never straddle buckets: bucket = f(user_id)).
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "error").cast("int").alias("obs"),
        (F.col("user_id") % HMM_BUCKETS).alias("bucket"),
    )

    def _decode(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out: dict[str, list] = {
            "user_id": [], "n_events": [], "cost_healthy": [],
            "cost_degraded": [], "best_state": [], "best_cost": [],
        }
        for uid, grp in pdf.groupby("user_id", sort=True):
            c0, c1 = None, None
            n = 0
            for o in grp["obs"].astype(int).tolist():
                n += 1
                e0 = HMM_E0_ERR if o == 1 else HMM_E0_OK
                e1 = HMM_E1_ERR if o == 1 else HMM_E1_OK
                if c0 is None:
                    c0, c1 = e0, e1 + HMM_INIT1
                else:
                    c0, c1 = (
                        min(c0, c1 + HMM_SWITCH) + e0,
                        min(c0 + HMM_SWITCH, c1) + e1,
                    )
            out["user_id"].append(int(uid))
            out["n_events"].append(n)
            out["cost_healthy"].append(c0)
            out["cost_degraded"].append(c1)
            out["best_state"].append("healthy" if c0 <= c1 else "degraded")
            out["best_cost"].append(min(c0, c1))
        return pd.DataFrame(out)

    return ev.groupBy("bucket").applyInPandas(
        _decode,
        "user_id bigint, n_events bigint, cost_healthy bigint, "
        "cost_degraded bigint, best_state string, best_cost bigint",
    )


# ---------------------------------------------------------------------------
# events_competing_risks — Aalen–Johansen cumulative incidence (r11)
# ---------------------------------------------------------------------------

CR_BIG = 150  # threshold shared by both causes (measured at sf0.01:
# 52 convert / 56 incident / 42 censored — a genuine three-way mix)

# Shared VERBATIM from lif(user_id, dur, cause) onward (the KM tail
# device extended to two causes): cause 1 = first big purchase, cause
# 2 = first big error, whichever day comes FIRST (same-day ties go to
# convert); cause 0 = censored at the observed span. All decision
# surfaces (durations, cause codes, at-risk counts) are exact BIGINT;
# the float surface is the all-cause KM prefix survival S(u−) =
# exp(Σ ln) with the survival_km ln-guard, and the two CIF running
# sums of S(u−)·d_k/n_u — identical text, identical window order,
# identical IEEE.
_CR_TAIL_SQL = """
    n_total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lif),
    leaving AS (
      SELECT dur AS t,
             CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
             CAST(count(*) AS BIGINT) AS c
      FROM lif GROUP BY dur
    ),
    risk AS (
      SELECT t, d1, d2,
             nt.n - coalesce(sum(c) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS n_risk
      FROM leaving CROSS JOIN n_total nt
    ),
    ev AS (SELECT t, n_risk, d1, d2 FROM risk WHERE d1 + d2 > 0),
    km AS (
      SELECT t, n_risk, d1, d2,
             coalesce(sum(CASE WHEN n_risk > d1 + d2
                      THEN ln(CAST(n_risk - d1 - d2 AS DOUBLE)
                              / CAST(n_risk AS DOUBLE))
                      ELSE 0.0 END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0.0) AS lprev,
             coalesce(min(n_risk - d1 - d2) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 1) AS minprev
      FROM ev
    ),
    terms AS (
      SELECT t, n_risk, d1, d2,
             CASE WHEN minprev = 0 THEN 0.0 ELSE exp(lprev) END AS sprev
      FROM km
    ),
    cif AS (
      SELECT t, n_risk, d1, d2,
             sum(sprev * CAST(d1 AS DOUBLE) / CAST(n_risk AS DOUBLE))
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cif1,
             sum(sprev * CAST(d2 AS DOUBLE) / CAST(n_risk AS DOUBLE))
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cif2
      FROM terms
    )
    SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
           d1 AS d_convert, d2 AS d_incident,
           round(cif1, 6) AS cif_convert,
           round(cif2, 6) AS cif_incident
    FROM cif"""


@query("events_competing_risks", oracle=f"""
    WITH u AS (
      SELECT user_id,
             min(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS d0,
             max(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS d1,
             min(CASE WHEN event_type = 'purchase' AND value >= {CR_BIG}
                      THEN CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                                AS DATE) END) AS dc,
             min(CASE WHEN event_type = 'error' AND value >= {CR_BIG}
                      THEN CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                                AS DATE) END) AS de
      FROM events GROUP BY user_id
    ),
    lif AS (
      SELECT user_id,
             CAST(CASE WHEN dc IS NOT NULL AND (de IS NULL OR dc <= de)
                       THEN dc - d0
                       WHEN de IS NOT NULL THEN de - d0
                       ELSE d1 - d0 END AS BIGINT) AS dur,
             CASE WHEN dc IS NOT NULL AND (de IS NULL OR dc <= de) THEN 1
                  WHEN de IS NOT NULL THEN 2 ELSE 0 END AS cause
      FROM u
    ),
    {_CR_TAIL_SQL}
""")
def events_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen–Johansen cumulative incidence under competing risks (new
    r11) — when two event kinds race per user (first big purchase vs
    first big error, whichever day comes first; never-reached users
    censored at their observed span), 1−KM per cause OVERSTATES both
    incidences because it treats the rival cause as censoring. The AJ
    estimator is the correct decomposition: CIF_k(t) = Σ_{{u≤t}}
    Ŝ(u−)·d_k(u)/n_u with Ŝ the ALL-CAUSE KM survival — and it
    satisfies Ŝ(t) + CIF₁(t) + CIF₂(t) = 1 exactly (tested).
    Completes the survival set: events_survival_km is the one-cause
    special case.

    Exactness: durations, cause codes (tie → convert, stated),
    at-risk and per-cause event counts are exact BIGINTs; the float
    surface is survival_km's guarded exp(Σ ln) prefix product plus
    two running sums of Ŝ(u−)·d_k/n_u — one shared-verbatim text
    (_CR_TAIL_SQL), identical window frames, identical IEEE. n_risk
    on an event row is ≥ d1+d2 ≥ 1, so no division guard is needed.

    Scale shape: identical to survival_km — one map-side per-user
    rollup, then calendar-bounded (≤31-row) windows above the
    aggregate (the sanctioned unpartitioned-window shape)."""
    day = F.date_trunc("day", F.col("ts")).cast("date")
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(day).alias("d0"),
            F.max(day).alias("d1"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= CR_BIG),
                    day,
                )
            ).alias("dc"),
            F.min(
                F.when(
                    (F.col("event_type") == "error")
                    & (F.col("value") >= CR_BIG),
                    day,
                )
            ).alias("de"),
        )
    )
    conv_first = F.col("dc").isNotNull() & (
        F.col("de").isNull() | (F.col("dc") <= F.col("de"))
    )
    lif = u.select(
        "user_id",
        F.when(conv_first, F.datediff(F.col("dc"), F.col("d0")))
        .when(F.col("de").isNotNull(), F.datediff(F.col("de"), F.col("d0")))
        .otherwise(F.datediff(F.col("d1"), F.col("d0")))
        .cast("bigint")
        .alias("dur"),
        F.when(conv_first, F.lit(1))
        .when(F.col("de").isNotNull(), F.lit(2))
        .otherwise(F.lit(0))
        .alias("cause"),
    )
    lif.createOrReplaceTempView("_cr_lif")
    return spark.sql(
        f"WITH lif AS (SELECT * FROM _cr_lif), {_CR_TAIL_SQL}"
    )


# ---------------------------------------------------------------------------
# events_survival_consistency — cross-estimator identity audit (r12)
# ---------------------------------------------------------------------------

# Shared VERBATIM from lif(user_id, dur, cause) onward: the competing-
# risks tail EXTENDED with the inclusive all-cause KM column, so ONE
# row set carries the all-cause life-table survival (the survival_km /
# churn-hazard product Π(1 − d/n)) AND both Aalen–Johansen CIFs, plus
# their sum — the S(t) + CIF₁(t) + CIF₂(t) ≡ 1 identity visible on
# every row, oracle-checked.
_CRX_TAIL_SQL = """
    n_total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lif),
    leaving AS (
      SELECT dur AS t,
             CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
             CAST(count(*) AS BIGINT) AS c
      FROM lif GROUP BY dur
    ),
    risk AS (
      SELECT t, d1, d2,
             nt.n - coalesce(sum(c) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS n_risk
      FROM leaving CROSS JOIN n_total nt
    ),
    ev AS (SELECT t, n_risk, d1, d2 FROM risk WHERE d1 + d2 > 0),
    km AS (
      SELECT t, n_risk, d1, d2,
             coalesce(sum(CASE WHEN n_risk > d1 + d2
                      THEN ln(CAST(n_risk - d1 - d2 AS DOUBLE)
                              / CAST(n_risk AS DOUBLE))
                      ELSE 0.0 END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0.0) AS lprev,
             coalesce(min(n_risk - d1 - d2) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 1) AS minprev,
             sum(CASE WHEN n_risk > d1 + d2
                      THEN ln(CAST(n_risk - d1 - d2 AS DOUBLE)
                              / CAST(n_risk AS DOUBLE))
                      ELSE 0.0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lsum,
             min(n_risk - d1 - d2) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
               AS minleft
      FROM ev
    ),
    terms AS (
      SELECT t, n_risk, d1, d2,
             CASE WHEN minprev = 0 THEN 0.0 ELSE exp(lprev) END AS sprev,
             CASE WHEN minleft = 0 THEN 0.0 ELSE exp(lsum) END AS surv
      FROM km
    ),
    cif AS (
      SELECT t, n_risk, d1, d2, surv,
             sum(sprev * CAST(d1 AS DOUBLE) / CAST(n_risk AS DOUBLE))
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cif1,
             sum(sprev * CAST(d2 AS DOUBLE) / CAST(n_risk AS DOUBLE))
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cif2
      FROM terms
    )
    SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d1 + d2 AS BIGINT) AS d_all,
           round(surv, 6) AS surv_allcause,
           round(cif1, 6) AS cif_convert,
           round(cif2, 6) AS cif_incident,
           round(surv + cif1 + cif2, 6) AS aj_total
    FROM cif"""


@query("events_survival_consistency", oracle=f"""
    WITH u AS (
      SELECT user_id,
             min(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS d0,
             max(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS d1,
             min(CASE WHEN event_type = 'purchase' AND value >= {CR_BIG}
                      THEN CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                                AS DATE) END) AS dc,
             min(CASE WHEN event_type = 'error' AND value >= {CR_BIG}
                      THEN CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                                AS DATE) END) AS de
      FROM events GROUP BY user_id
    ),
    lif AS (
      SELECT user_id,
             CAST(CASE WHEN dc IS NOT NULL AND (de IS NULL OR dc <= de)
                       THEN dc - d0
                       WHEN de IS NOT NULL THEN de - d0
                       ELSE d1 - d0 END AS BIGINT) AS dur,
             CASE WHEN dc IS NOT NULL AND (de IS NULL OR dc <= de) THEN 1
                  WHEN de IS NOT NULL THEN 2 ELSE 0 END AS cause
      FROM u
    ),
    {_CRX_TAIL_SQL}
""")
def events_survival_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-estimator survival CONSISTENCY audit (new r12, VERDICT r11
    stretch #9 — the ann_recall_eval discipline applied to the 44-key
    events/stats family): over the competing-risks lifetimes
    (events_competing_risks' exact cause/censor decisions), compute IN
    ONE ROW SET (a) the all-cause Kaplan–Meier survival — the same
    life-table product Π(1 − d/n) behind events_survival_km and
    events_churn_hazard — and (b) both Aalen–Johansen cumulative
    incidences, and emit their sum: the estimator-theoretic identity
    S(t) + CIF_convert(t) + CIF_incident(t) ≡ 1 (Aalen & Johansen
    1978) is then VISIBLE on every registered row (aj_total) and
    hash-checked by the oracle, promoting the r11 pytest-only identity
    (tests/test_operators.py::test_competing_risks_aj_identity...) to
    a driver-gated artifact. A drift between the KM product path and
    the CIF increment path — a wrong at-risk denominator, a window
    frame off by one row, a mis-guarded ln — breaks aj_total ≈ 1
    before it breaks either curve visibly.

    Exactness: durations, causes, at-risk and event counts are exact
    BIGINTs; every float (lprev/lsum accumulations, exp, CIF running
    sums, the identity total) lives in ONE SQL text shared verbatim
    from lif onward (_CRX_TAIL_SQL) — identical window order,
    identical IEEE in both engines; the survival_km ln(0) guard covers
    both the exclusive and inclusive KM columns.

    Scale shape: identical to events_competing_risks — one map-side-
    combinable per-user rollup; everything after lives on the ≤31-row
    duration grain, calendar-bounded."""
    day = F.date_trunc("day", F.col("ts")).cast("date")
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(day).alias("d0"),
            F.max(day).alias("d1"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= CR_BIG),
                    day,
                )
            ).alias("dc"),
            F.min(
                F.when(
                    (F.col("event_type") == "error")
                    & (F.col("value") >= CR_BIG),
                    day,
                )
            ).alias("de"),
        )
    )
    conv_first = F.col("dc").isNotNull() & (
        F.col("de").isNull() | (F.col("dc") <= F.col("de"))
    )
    lif = u.select(
        "user_id",
        F.when(conv_first, F.datediff(F.col("dc"), F.col("d0")))
        .when(F.col("de").isNotNull(), F.datediff(F.col("de"), F.col("d0")))
        .otherwise(F.datediff(F.col("d1"), F.col("d0")))
        .cast("bigint")
        .alias("dur"),
        F.when(conv_first, F.lit(1))
        .when(F.col("de").isNotNull(), F.lit(2))
        .otherwise(F.lit(0))
        .alias("cause"),
    )
    lif.createOrReplaceTempView("_crx_lif")
    return spark.sql(
        f"WITH lif AS (SELECT * FROM _crx_lif), {_CRX_TAIL_SQL}"
    )


# ---------------------------------------------------------------------------
# events_attribution_shapley — exact Shapley-value channel credit (r11)
# ---------------------------------------------------------------------------

SHAP_BIG = 150  # conversion = first purchase >= this (the CR_BIG device)
# Shapley weights k!(n-1-k)! for n=4 channels, scaled so the total
# weight mass is n! = 24: k=0 -> 6, k=1 -> 2, k=2 -> 2, k=3 -> 6.
# phi is emitted as the exact integer phi24 = 24*phi plus one division.


@query("events_attribution_shapley", oracle=f"""
    WITH conv AS (
      SELECT user_id, min(CASE WHEN event_type = 'purchase'
                                AND value >= {SHAP_BIG}
                               THEN ts END) AS conv_ts
      FROM events GROUP BY user_id
    ),
    touched AS (
      SELECT e.user_id,
             CAST(sum(DISTINCT CASE e.event_type
                  WHEN 'click' THEN 1 WHEN 'error' THEN 2
                  WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END)
                  AS BIGINT) AS mask
      FROM events e JOIN conv c ON c.user_id = e.user_id
      WHERE c.conv_ts IS NOT NULL AND e.ts < c.conv_ts
        AND e.event_type IN ('click', 'error', 'signup', 'view')
      GROUP BY e.user_id
    ),
    mcnt AS (SELECT mask, CAST(count(*) AS BIGINT) AS cnt
             FROM touched GROUP BY mask),
    masks AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS s),
    vsub AS (
      SELECT m.s, CAST(coalesce(sum(c.cnt), 0) AS BIGINT) AS v
      FROM masks m LEFT JOIN mcnt c ON (c.mask & m.s) = c.mask
      GROUP BY m.s
    ),
    chan AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
                                   ('signup', 4), ('view', 8))
                    _c(channel, bit)),
    phi AS (
      SELECT ch.channel,
             CAST(sum(CASE bit_count(s.s)
                      WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END
                  * (vu.v - s0.v)) AS BIGINT) AS phi24
      FROM chan ch
      JOIN vsub s ON (s.s & ch.bit) = 0
      JOIN vsub vu ON vu.s = (s.s | ch.bit)
      JOIN vsub s0 ON s0.s = s.s
      GROUP BY ch.channel
    ),
    tot AS (SELECT v AS total_conv FROM vsub WHERE s = 15)
    SELECT channel, phi24,
           round(CAST(phi24 AS DOUBLE) / 24.0, 6) AS phi,
           round(CAST(phi24 AS DOUBLE)
                 / (24.0 * CAST(t.total_conv AS DOUBLE)), 6) AS share,
           t.total_conv
    FROM phi CROSS JOIN tot t
""")
def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value conversion attribution (new r11) — the
    game-theoretic credit split (Shapley 1953) the marketing-
    attribution literature reached after first/last/position rules
    (all three already in the family: events_attribution,
    events_attribution_position): channels are the four non-purchase
    event types touched BEFORE the user's first big purchase, the
    coalition value v(S) counts converters whose touched set ⊆ S
    (reach convention), and φ_c = Σ_S k!(n−1−k)!/n! · (v(S∪c) − v(S)).
    Efficiency is auditable on the row: Σ_c phi24 = 24·v(full)
    (converters with ZERO prior touches carry no reachable credit and
    are excluded by construction — stated, and visible as
    total_conv < the KM converter count).

    Exactness: masks, subset sums, the factorial weights (scaled to
    integers by n! = 24), and phi24 are ALL exact BIGINT arithmetic —
    the Shapley computation is hash-provable; the emitted phi/share
    are single divisions of exact integers by identical literals.

    Scale shape: one per-user conversion rollup + one per-user
    DISTINCT-bitmask rollup over raw events (both map-side
    combinable); everything after lives on 16 masks × 4 channels —
    the 2^n blow-up is bounded by the CHANNEL vocabulary (n=4 here),
    the standard practical regime for exact Shapley attribution."""
    ev = load_table(spark, sf_dir, "events")
    # The touched-set bit for channel c is exactly (first occurrence of
    # c) < conv_ts, so the whole mask falls out of ONE map-side-
    # combinable groupBy with five conditional MINs — no window, no
    # self-join (measured r11: join plan 1.9 s, window plan 1.55 s,
    # this plan one partial-agg shuffle). Null first-touch compares
    # NULL < conv_ts -> NULL -> bit 0.
    per = ev.groupBy("user_id").agg(
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= SHAP_BIG),
                F.col("ts"),
            )
        ).alias("conv_ts"),
        *[
            F.min(
                F.when(F.col("event_type") == c, F.col("ts"))
            ).alias(f"t_{c}")
            for c in ("click", "error", "signup", "view")
        ],
    )
    mask_expr = (
        F.when(F.col("t_click") < F.col("conv_ts"), 1).otherwise(0)
        + F.when(F.col("t_error") < F.col("conv_ts"), 2).otherwise(0)
        + F.when(F.col("t_signup") < F.col("conv_ts"), 4).otherwise(0)
        + F.when(F.col("t_view") < F.col("conv_ts"), 8).otherwise(0)
    )
    touched = (
        per.filter(F.col("conv_ts").isNotNull())
        .select("user_id", mask_expr.cast("bigint").alias("mask"))
        .filter(F.col("mask") > 0)
    )
    mcnt = touched.groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    masks = spark.range(16).select(F.col("id").cast("bigint").alias("s"))
    vsub = (
        masks.join(
            F.broadcast(mcnt),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("v"))
    )
    chan = spark.range(4).select(
        F.element_at(
            F.array(F.lit("click"), F.lit("error"), F.lit("signup"),
                    F.lit("view")),
            (F.col("id") + 1).cast("int"),
        ).alias("channel"),
        F.expr("CAST(shiftleft(1, CAST(id AS INT)) AS BIGINT)").alias("bit"),
    )
    w = F.expr(
        "CASE bit_count(s) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 "
        "ELSE 6 END"
    )
    s = vsub.select(F.col("s"), F.col("v").alias("v0"))
    vu = vsub.select(F.col("s").alias("su"), F.col("v").alias("vu"))
    phi = (
        chan.join(
            F.broadcast(s), F.col("s").bitwiseAND(F.col("bit")) == 0
        )
        .join(
            F.broadcast(vu),
            F.col("su") == F.col("s").bitwiseOR(F.col("bit")),
        )
        .groupBy("channel")
        .agg(
            F.sum(w * (F.col("vu") - F.col("v0"))).cast("bigint")
            .alias("phi24")
        )
    )
    tot = vsub.filter(F.col("s") == 15).select(
        F.col("v").alias("total_conv")
    )
    return phi.crossJoin(F.broadcast(tot)).select(
        "channel",
        "phi24",
        F.round(F.col("phi24").cast("double") / 24.0, 6).alias("phi"),
        F.round(
            F.col("phi24").cast("double")
            / (24.0 * F.col("total_conv").cast("double")),
            6,
        ).alias("share"),
        "total_conv",
    )


# ---------------------------------------------------------------------------
# events_gains_deciles — cumulative-gains / lift table (r12)
# ---------------------------------------------------------------------------

GAINS_BUCKETS = 10
GAINS_BIG = 150  # converter = any purchase >= this (the CR_BIG device)


@query("events_gains_deciles", oracle=f"""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS score,
             CAST(max(CASE WHEN event_type = 'purchase'
                            AND value >= {GAINS_BIG}
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT user_id, conv,
             CAST(ntile({GAINS_BUCKETS}) OVER (
               ORDER BY score DESC, user_id) AS INT) AS decile
      FROM u
    ),
    g AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(conv) AS BIGINT) AS n_conv
      FROM d GROUP BY decile
    ),
    t AS (SELECT CAST(sum(n_conv) AS BIGINT) AS total_conv,
                 CAST(sum(n_users) AS BIGINT) AS total_users
          FROM g)
    SELECT g.decile, g.n_users, g.n_conv,
           CAST(sum(g.n_conv) OVER (ORDER BY g.decile
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_conv,
           CASE WHEN t.total_conv = 0 THEN 0.0
                ELSE CAST(sum(g.n_conv) OVER (ORDER BY g.decile
                       ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                     / CAST(t.total_conv AS DOUBLE) END AS capture_rate,
           CASE WHEN t.total_conv = 0 OR g.n_users = 0 THEN 0.0
                ELSE CAST(g.n_conv * t.total_users AS DOUBLE)
                     / CAST(g.n_users * t.total_conv AS DOUBLE) END AS lift
    FROM g CROSS JOIN t
""")
def events_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / lift table (new r12) — THE model-evaluation
    artifact of targeting and propensity work (the 'gains chart' every
    campaign report shows): rank users by an activity score (total
    event count as the propensity proxy), cut into {GAINS_BUCKETS}
    deciles, and report each decile's converter capture and lift over
    the base rate. Complements events_propensity_match (which
    ESTIMATES an effect) with the ranking-quality read (how well does
    the score CONCENTRATE converters).

    Exactness: scores, conversion flags, decile assignment (exact
    NTILE over the total order (score DESC, user_id) — Spark side via
    the distributed-exact win_ntile device on the negated score, no
    single-task sort), per-decile counts and the cumulative sum are
    ALL exact integers; capture and lift are raw quotients of exact
    integer products, zero-guarded with identical CASE text in both
    engines (DuckDB raises on /0 where Spark returns NULL — the
    burrows-delta divergent-failure-mode lesson).

    Scale shape: one map-side-combinable user rollup; the ntile is
    one range exchange + per-slice rank (the win_ntile plan); the
    decile rollup is {GAINS_BUCKETS} rows and everything after is
    metadata-scale."""
    from quackflight_spark.streaming.windowed import _ntile_distributed

    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("score"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= GAINS_BIG),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("conv"),
        )
        .withColumn("nscore", -F.col("score"))
    )
    d = _ntile_distributed(u, ["nscore", "user_id"], "decile", GAINS_BUCKETS)
    g = d.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("conv").cast("bigint").alias("n_conv"),
    )
    t = g.agg(
        F.sum("n_conv").cast("bigint").alias("total_conv"),
        F.sum("n_users").cast("bigint").alias("total_users"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        g.crossJoin(F.broadcast(t))
        .withColumn("cum_conv", F.sum("n_conv").over(wc).cast("bigint"))
        .select(
            "decile",
            "n_users",
            "n_conv",
            "cum_conv",
            F.when(F.col("total_conv") == 0, F.lit(0.0))
            .otherwise(
                F.col("cum_conv").cast("double")
                / F.col("total_conv").cast("double")
            )
            .alias("capture_rate"),
            F.when(
                (F.col("total_conv") == 0) | (F.col("n_users") == 0),
                F.lit(0.0),
            )
            .otherwise(
                (F.col("n_conv") * F.col("total_users")).cast("double")
                / (F.col("n_users") * F.col("total_conv")).cast("double")
            )
            .alias("lift"),
        )
    )
