"""Differential-privacy governance operator (round 7).

Beyond-reference family (SURVEY.md §2.12): the DP-noised release of
per-group counts — the governance step between an internal corpus rollup
and anything that leaves the trust boundary (public data cards, partner
reports, telemetry). The mechanism is the two-sided geometric (discrete
Laplace) mechanism — the integer-valued analog of Laplace noise, the
standard choice for count queries (Ghosh–Roughgarden–Sundararajan 2009,
the mechanism inside Google's DP aggregations).

Determinism contract: production DP draws fresh randomness per release;
a differential-testing harness cannot. Like events_bootstrap_ci's
Poisson weights, the draw is a 48-bit md5 integer compared against the
inverse-CDF thresholds of the noise distribution, precomputed as exact
integer literals by ONE Python generator that emits both the Spark
column expression and the DuckDB oracle text — zero RNG state, zero
libm, bit-identical on any engine/partitioning. Swapping the md5 draw
for a secure RNG changes one line and drops the oracle, not the shape.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

DP_NOISE_BOUND = 16  # clamp |noise| (tail mass beyond: ~2e-5, lumped in)
DP_SALT = ":dp7"     # release identifier — a new release re-salts the draw


def _geometric_thresholds() -> list[tuple[int, int]]:
    """Inverse-CDF thresholds of the two-sided geometric distribution
    with alpha = 1/2 (epsilon = ln 2): P(k) = (1/3)(1/2)^|k|, tails
    beyond ±DP_NOISE_BOUND lumped into the endpoints. Returns
    [(k, T_k)] where a 48-bit uniform u maps to the smallest k with
    u < T_k; thresholds are floor-exact integers, the final one 2^48."""
    a = Fraction(1, 2)
    p0 = (1 - a) / (1 + a)
    interior = {
        k: p0 * a ** abs(k)
        for k in range(-DP_NOISE_BOUND + 1, DP_NOISE_BOUND)
    }
    tail_each = (1 - sum(interior.values())) / 2
    cum = Fraction(0)
    out: list[tuple[int, int]] = []
    for k in range(-DP_NOISE_BOUND, DP_NOISE_BOUND + 1):
        p = interior.get(k, tail_each)
        cum += p
        out.append((k, int(cum * 2**48)))
    out[-1] = (DP_NOISE_BOUND, 2**48)  # close the ladder exactly
    return out


def _noise_case_sql(u_expr: str) -> str:
    """The shared CASE ladder, DuckDB spelling (the fn_format_ch
    one-generator-two-texts pattern)."""
    arms = "\n".join(
        f"           WHEN {u_expr} < {t} THEN {k}"
        for k, t in _geometric_thresholds()[:-1]
    )
    return f"CASE\n{arms}\n           ELSE {DP_NOISE_BOUND} END"


def _noise_case_col(u: F.Column) -> F.Column:
    ladder = _geometric_thresholds()
    expr = F.lit(DP_NOISE_BOUND)
    for k, t in reversed(ladder[:-1]):
        expr = F.when(u < F.lit(t), F.lit(k)).otherwise(expr)
    return expr


@query("pipeline_dp_counts", oracle=f"""
    WITH g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST('0x' || substr(md5(source || '{DP_SALT}'), 1, 12) AS BIGINT)
               AS u
      FROM documents GROUP BY source
    )
    SELECT source,
           CAST(greatest(n + {_noise_case_sql("u")}, 0) AS BIGINT)
             AS noisy_count
    FROM g
""")
def pipeline_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private per-source document counts (new r7):
    count + two-sided-geometric noise (alpha = 1/2, epsilon = ln 2 per
    release under add/remove-one adjacency), clamped at zero — the
    noisy histogram a corpus data card publishes. True counts never
    appear in the output.

    Exactness: the noise draw is a 48-bit md5 integer walked down an
    inverse-CDF CASE ladder of exact precomputed integer thresholds
    (see _geometric_thresholds) — deterministic, SQL-replayable, the
    events_bootstrap_ci zero-RNG recipe; noise and clamp are pure
    integer arithmetic.

    Scale shape: ONE map-side-combinable groupBy; the ladder is a
    constant-size projection over |sources| rows. Noise cost is
    independent of corpus size — the mechanism adds nothing to the
    shuffle."""
    g = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn(
            "u",
            F.conv(
                F.substring(F.md5(F.concat(F.col("source"), F.lit(DP_SALT))), 1, 12),
                16,
                10,
            ).cast("bigint"),
        )
    )
    return g.select(
        "source",
        F.greatest(F.col("n") + _noise_case_col(F.col("u")), F.lit(0))
        .cast("bigint")
        .alias("noisy_count"),
    )
