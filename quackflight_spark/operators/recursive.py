"""Recursive CTE capability — SURVEY.md §4.2 ("Recursive CTE: driver-side
iterative loop if ever needed").

DuckDB (delegated at reference main.py:231) supports WITH RECURSIVE;
Spark SQL (<4.0 feature set here) does not. The engine's equivalent is a
driver-side *fixpoint loop*: each iteration is one distributed join
round; the driver only checks a scalar is-empty flag. This is the
standard Spark pattern for transitive closure / graph reachability —
per-iteration work is fully distributed, iteration count equals the
graph depth, and each frontier is persisted so lineage doesn't grow
exponentially across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

MAX_ITERATIONS = 50  # safety bound; the fixture hierarchy is depth 2


def fixpoint_reachability(seeds: DataFrame, edges: DataFrame) -> DataFrame:
    """UNION ALL-recursive expansion from seed rows (start, reach, depth)
    over edges (src, dst), to fixpoint — WITH RECURSIVE semantics.
    Requires an acyclic edge set (like SQL UNION ALL recursion)."""
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


@query("recursive_cte", oracle="""
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
""")
def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over the customer→nation→region FK hierarchy
    (ids offset into disjoint ranges so the walk is acyclic) — the
    WITH RECURSIVE shape, computed by distributed fixpoint."""
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
