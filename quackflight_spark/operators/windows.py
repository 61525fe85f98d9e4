"""Window-function suite — SURVEY.md §2.5 (Tier B, delegated at
reference main.py:231).

Windows shuffle once on partitionBy keys, then sort within partitions.
Scale rule: never use a global (unpartitioned) window over unbounded data
— every window here partitions on a real key. The QUALIFY rewrite shows
the dialect-frontend strategy (project window col → filter → drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table


@query("win_rank", oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           rank() OVER w AS rk,
           dense_rank() OVER w AS drk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""")
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query("win_percent", oracle="""
    SELECT o_custkey, o_orderkey,
           round(percent_rank() OVER w, 8) AS prk,
           round(cume_dist() OVER w, 8) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""")
def win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 8).alias("prk"),
        F.round(F.cume_dist().over(w), 8).alias("cd"),
    )


@query("win_lag", oracle="""
    SELECT user_id, event_id,
           lag(value, 1) OVER w AS prev_value,
           lead(value, 2, -1.0) OVER w AS next2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 2, -1.0).over(w).alias("next2_value"),
    )


@query("win_firstlast", oracle="""
    SELECT user_id, event_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
           nth_value(event_type, 2) OVER w AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(wfull).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@query("win_agg_frame", oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM events
""")
def win_agg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame aggregates: ROWS BETWEEN n PRECEDING AND CURRENT ROW.
    Decimal-exact moving sum (same determinism rule as agg_basic)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w.rowsBetween(-2, 0))
        .cast("double").alias("moving_sum"),
        F.count(F.lit(1)).over(w.rowsBetween(W.unboundedPreceding, 0)).alias("running_n"),
    )


@query("win_range_frame", oracle="""
    SELECT o_custkey, o_orderkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_within_10k
    FROM orders
""")
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering key."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-10000, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_within_10k"),
    )


@query("win_qualify", oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 2
""")
def win_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY (DuckDB-ism, SURVEY §2.5 W5): Spark SQL lacks it — the
    engine rewrite is project-window-col → filter → drop, which is exactly
    what Catalyst would plan for a native QUALIFY."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("__q", F.row_number().over(w))
        .filter(F.col("__q") <= 2)
        .drop("__q")
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query("win_time_range", oracle="""
    SELECT event_id, event_type,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_1h
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY CAST(ts AS TIMESTAMP)
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""")
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per row, the trailing-1-hour event
    count and value total within its type — the rolling-window-by-TIME
    class (distinct from win_range_frame's numeric range), the shape
    rate-limiters and rolling KPIs use. One shuffle on the partition
    key; the frame is evaluated on the sorted run, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_wtr_events")
    return spark.sql(
        """
        SELECT event_id, event_type,
               count(*) OVER w AS n_1h,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_1h
        FROM _wtr_events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


NTILE_BUCKETS = 10


@query("win_ntile", oracle=f"""
    SELECT c_custkey,
           CAST(ntile({NTILE_BUCKETS}) OVER (
             ORDER BY CAST(c_acctbal AS DECIMAL(18,2)), c_custkey) AS INT)
             AS decile
    FROM customer
""")
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE (customer account-balance deciles) as a first-class
    window operator — implemented with the DISTRIBUTED exact ntile
    (range-partition + parallel per-partition rank + broadcast offsets,
    streaming/windowed._ntile_distributed), NOT `W.orderBy(...)`: the
    bare global window funnels every row through one reducer sort, the
    single-task scale-killer the r3 verdict flagged on events_rfm. The
    oracle is the plain SQL window; output is bit-identical because the
    c_custkey tie-break makes the order total."""
    from quackflight_spark.streaming.windowed import _ntile_distributed

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("decimal(18,2)").alias("bal")
    )
    return _ntile_distributed(
        c, ["bal", "c_custkey"], "decile", NTILE_BUCKETS
    ).select("c_custkey", "decile")
