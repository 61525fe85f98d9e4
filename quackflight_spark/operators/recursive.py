"""Recursive CTE capability — SURVEY.md §4.2.

DuckDB (delegated at reference main.py:231) supports WITH RECURSIVE;
Spark gained native support in 4.0 (SPARK-24497: the UnionLoop /
UnionLoopRef physical operator iterates the recursion engine-side, each
step a distributed plan). This session runs Spark 4.1.2, so the
registered key uses the NATIVE form — the optimizer sees one plan,
anchors/steps get whole-stage codegen, and no driver round-trips happen
between iterations.

`fixpoint_reachability` stays as the documented fallback for engines
without WITH RECURSIVE (Spark <4.0): a driver-side fixpoint loop where
each iteration is one distributed join round and the driver only checks
a scalar is-empty flag — the classic transitive-closure pattern. Both
forms are tested equal (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table, register_all

MAX_ITERATIONS = 50  # safety bound; the fixture hierarchy is depth 2

_RECURSIVE_SQL = """
    WITH RECURSIVE r(start, reach, depth) AS (
      SELECT c_custkey + 100000, CAST(c_nationkey AS BIGINT), 1 FROM customer
      UNION ALL
      SELECT r.start, e.dst, r.depth + 1
      FROM r JOIN (
        SELECT CAST(n_nationkey AS BIGINT) AS src,
               CAST(n_regionkey + 1000 AS BIGINT) AS dst FROM nation
      ) e ON r.reach = e.src
    )
    SELECT start, reach, CAST(depth AS INT) AS depth FROM r
"""


def fixpoint_reachability(seeds: DataFrame, edges: DataFrame) -> DataFrame:
    """UNION ALL-recursive expansion from seed rows (start, reach, depth)
    over edges (src, dst), to fixpoint — WITH RECURSIVE semantics for
    engines without native support. Requires an acyclic edge set (like
    SQL UNION ALL recursion)."""
    frontier = seeds.persist()
    closure = frontier
    for _ in range(MAX_ITERATIONS):
        nxt = (
            frontier.join(edges, frontier.reach == edges.src)
            .select("start", F.col("dst").alias("reach"), (F.col("depth") + 1).alias("depth"))
            .persist()
        )
        if nxt.isEmpty():
            break
        closure = closure.union(nxt)
        frontier = nxt
    return closure


def fixpoint_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver-side fixpoint form of recursive_cte — the <4.0
    fallback, kept callable so tests can assert it equals the native
    plan."""
    c = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") + 100000).alias("start"),
        F.col("c_nationkey").cast("bigint").alias("reach"),
        F.lit(1).alias("depth"),
    )
    n_edges = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("src"),
        (F.col("n_regionkey") + 1000).cast("bigint").alias("dst"),
    )
    closure = fixpoint_reachability(c, n_edges)
    return closure.select("start", "reach", F.col("depth").cast("int").alias("depth"))


@query("recursive_cte", oracle=_RECURSIVE_SQL)
def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over the customer→nation→region FK hierarchy
    (ids offset into disjoint ranges so the walk is acyclic) — the
    WITH RECURSIVE shape, computed NATIVELY on Spark ≥4.0 (UnionLoop:
    the recursion runs engine-side, no driver round-trips between
    iterations; identical SQL text to the DuckDB oracle). Falls back to
    the distributed driver-side fixpoint on engines without native
    recursion."""
    register_all(spark, sf_dir)
    try:
        return spark.sql(_RECURSIVE_SQL)
    except Exception:  # pragma: no cover - Spark <4.0 fallback
        return fixpoint_recursive_cte(spark, sf_dir)
