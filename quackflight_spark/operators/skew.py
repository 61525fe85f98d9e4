"""Skew-mitigation operators — manual salting with plain-SQL parity.

Spark's AQE skew-join (spark.sql.adaptive.skewJoin.enabled, on in
session.py) splits oversized partitions at runtime, but it only fires on
sort-merge joins and only when a partition exceeds the skew thresholds.
Salting is the manual, always-available technique for the cases AQE
can't reach (skewed keys feeding a single reducer in a shuffle-hash
join, or a skewed groupBy key): spread one side's hot keys across R
synthetic sub-keys and replicate the other side R times so every
(key, salt) pair still meets its match. Results are provably identical
to the unsalted plan — which is exactly what the DuckDB oracle checks.

At 100 TB this is the difference between a 2-hour straggler task and 32
even tasks: the hot key's rows land in R different shuffle partitions
instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

N_SALTS = 8


@query("join_skew_salted", oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
""")
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dim join: identical semantics to the plain join.

    The probe side (lineitem) gets a deterministic salt in [0, R) from a
    hash of its OWN row identity — crucially NOT of the join key, so the
    hot key's rows scatter uniformly across all R sub-keys. The build
    side (filtered orders) is exploded R times, one copy per salt, and
    the join runs on (orderkey, salt). Every probe row meets exactly one
    copy of its matching build row, so multiplicity is preserved — the
    oracle is the unsalted join.

    Cost model: R× replication of the SMALLER side's shuffle volume buys
    an R-way split of the hottest reducer. Use when one key dominates
    (power-law keys: a null-heavy FK, a bot user_id) and the build side
    is small enough that R copies still beat one straggler. The salt
    column is dropped before the aggregate, so downstream plans are
    unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderpriority")

    salted_li = li.select(
        "l_orderkey",
        "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)).alias(
            "salt"
        ),
    )
    salted_orders = orders.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    ).withColumn("salt", F.col("salt").cast("long"))

    joined = salted_li.join(
        salted_orders,
        on=[
            salted_li.l_orderkey == salted_orders.o_orderkey,
            salted_li.salt == salted_orders.salt,
        ],
        how="inner",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )
