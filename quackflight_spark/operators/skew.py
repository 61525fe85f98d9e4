"""Skew-mitigation operator surface — manual salting with plain-SQL
parity.

The mechanics live in sources/writers.py (salted_join /
two_phase_skew_agg, both test-proven equal to their unsalted forms);
this module registers the gate-visible key that proves the salted join
against the DuckDB oracle.

Spark's AQE skew-join (on in session.py) splits oversized partitions at
runtime, but only for sort-merge joins past its size thresholds.
Salting is the always-available manual technique: spread one side's hot
keys across R synthetic sub-keys and replicate the other side R times so
every (key, salt) pair still meets its match — at 100 TB the difference
between a 2-hour straggler task and R even tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table
from quackflight_spark.sources.writers import salted_join


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
    """Salted fact-to-dim join via writers.salted_join: the probe side
    (lineitem) gets a salt in [0, R), the build side (filtered orders)
    is exploded R times, and the join runs on (orderkey, salt). Every
    probe row meets exactly one copy of its matching build row, so
    multiplicity is preserved — the oracle is the unsalted join.

    Cost model: R× replication of the SMALLER side's shuffle volume buys
    an R-way split of the hottest reducer. Use when one key dominates
    (power-law keys: a null-heavy FK, a bot user_id) and AQE's
    sort-merge-only skew splitting doesn't apply."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"), "o_orderpriority")
    )
    joined = salted_join(li, orders, "k")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )
