"""Manual runtime-filter (Bloom-style semi-join reduction) — round 7.

Beyond-reference join family (SURVEY.md §2.12, next to join_skew_salted /
join_bucketed_colocated): the build side of a selective dim join is
compressed into a tiny bitmap that prefilters the probe side BEFORE the
join shuffle — the semi-join reduction Spark's own
InjectRuntimeFilter/Bloom rule applies when statistics justify it, spelled
explicitly so the mechanism is contract-tested and available when the
optimizer's heuristics decline (e.g. a probe side behind a UDF barrier or
a non-parquet source with no stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

RF_BITS = 16384          # filter width (bits); key -> bit = key mod width
RF_REGION = "EUROPE"     # the selective dim predicate


@query("join_bloom_prefilter", oracle=f"""
    SELECT l.l_suppkey,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = '{RF_REGION}'
    GROUP BY l.l_suppkey
""")
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filtered fact-dim join (new r7): revenue per
    {RF_REGION}-region supplier, with the lineitem probe side reduced
    by a {RF_BITS}-bit one-hash Bloom filter built from the qualifying
    supplier keys before any join runs. The result is EXACTLY the plain
    join's (false positives survive the filter but die in the join);
    the filter only changes how many probe rows reach it.

    Mechanism, all engine-side (no driver collect): the build side
    reduces to ≤{RF_BITS}//64 (segment, bits) rows via a
    map-side-combinable bit_or aggregate — the agg_bitmap_distinct
    segment idiom; the probe computes its key's (segment, mask),
    broadcast-joins the segment table (a missing segment IS a filter
    miss), and keeps rows with a set bit. One hash keeps it SQL-free of
    RNG; width {RF_BITS} bounds the false-positive rate at
    |build|/{RF_BITS} per probe.

    Scale shape: this is the pattern that pays when the probe side must
    SHUFFLE (fact-fact joins, or a dim too big to broadcast but whose
    key set still fits a bitmap): rows that cannot match are dropped at
    the scan stage, before the exchange, cutting shuffled bytes by the
    join's selectivity. At fixture scale the final join is itself a
    broadcast so the filter is pure overhead — measured, not hidden;
    the contract is the 100 TB shape. Spark's adaptive runtime filter
    does this automatically behind statistics; this operator is the
    deterministic, always-on spelling."""
    dims = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            load_table(spark, sf_dir, "region").filter(
                F.col("r_name") == RF_REGION
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    segs = (
        dims.select(
            F.expr(f"(s_suppkey % {RF_BITS}) DIV 64").alias("seg"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST((s_suppkey % {RF_BITS}) % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("seg")
        .agg(F.bit_or("m").alias("bits"))
    )
    probe = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.expr(f"(l_suppkey % {RF_BITS}) DIV 64").alias("seg"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST((l_suppkey % {RF_BITS}) % 64 AS INT))"
        ).alias("mask"),
    )
    filtered = (
        probe.join(F.broadcast(segs), "seg")
        .filter(F.col("bits").bitwiseAND(F.col("mask")) != 0)
        .select("l_suppkey", "price")
    )
    return (
        filtered.join(F.broadcast(dims), filtered.l_suppkey == dims.s_suppkey)
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("price").cast("double").alias("revenue"),
        )
    )
