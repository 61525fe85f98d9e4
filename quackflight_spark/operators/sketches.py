"""Mergeable-sketch aggregation — the pre-aggregated distinct-count
pattern for 100 TB pipelines.

Exact COUNT(DISTINCT) over a big fact table needs a full shuffle of the
distinct keys every time it is asked.  The warehouse-scale answer is a
*sketch table*: per-(group, load-partition) HyperLogLog sketches are
built once at ingest (map-side, mergeable, a few KB each), stored next
to the data, and every later query MERGES sketches instead of rescanning
rows — distinct counts over arbitrary group rollups become metadata-size
work.

Since r9 the sketch table stores the PORTABLE register representation
(md5 bucket + leading-zero rank, the agg_hll_portable recipe below)
instead of opaque JVM DataSketches blobs: the registers are bit-exact
engine-neutral integers, so the materialized sketch table AND every
rollup answered from it replay exactly in DuckDB SQL — the key that was
the suite's last rows-only row is now value-oracled like everything
else.  (Native DataSketches stays exercised by agg_theta_sketch_ops,
where the set-algebra surface is the point.)  The ≤3σ relative-error
contract vs exact COUNT(DISTINCT) is asserted in
tests/test_operators.py::test_hll_sketch_table_accuracy.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

from quackflight_spark.staging import stage_root

SKETCH_ROOT = stage_root("sketch_tables")  # derived data; fixtures untouched


# Register geometry for the stored sketch table. m=256 buckets — the
# md5 first byte IS the bucket (no mod bias); stderr 1.04/sqrt(256)
# ≈ 6.5%. alpha_256 = 0.7213/(1 + 1.079/256) rounded to the 0.7183
# literal; the numerator scales that double by the dyadic m^2 = 65536
# and 2^48 (exponent shifts only, no mantissa rounding), so the single
# FP rounding in the estimate is the final divide — identical under
# IEEE in both engines, then floor. The 2^48 scale (not 2^56) bounds
# the register sum at 256 * 2^48 = 2^56 ≪ 2^63, overflow-safe even
# for a degenerate all-zero segment; ranks ≥ 48 (probability 2^-47
# per key) truncate to the same 2^0 term in both engines via
# greatest(48 - m_j, 0).
SKT_M = 256
_SKT_NUM = "(CAST(0.7183 AS DOUBLE) * 65536 * 281474976710656)"
_SKT_EST = (
    f"CAST(floor({_SKT_NUM} / CAST(sum(shiftleft(CAST(1 AS BIGINT),"
    " greatest(48 - m_j, 0))) AS DOUBLE)) AS BIGINT)"
)


def build_sketch_table(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the per-(returnflag, linestatus) portable-HLL register
    table for lineitem.l_orderkey (idempotent per corpus). This is the
    one-time ingest job; at scale it is partitioned by load date and
    appended. Output: a dense (flag, status, bucket, m_j) lattice —
    #groups × {SKT_M} rows of four small integers; per-partition
    partial maxes ARE the mergeable sketch (max is the merge), so the
    build is ONE map-side-combined groupBy over the fact table."""
    path = f"{SKETCH_ROOT}/{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    import os

    if not os.path.exists(f"{path}/_SUCCESS"):
        li = load_table(spark, sf_dir, "lineitem")
        h = li.select(
            "l_returnflag",
            "l_linestatus",
            F.md5(F.col("l_orderkey").cast("string")).alias("hx"),
        )
        nz = F.regexp_replace(F.substring("hx", 3, 14), "^0+", "")
        digit_lz = (
            F.when(F.substring(nz, 1, 1) == "1", 3)
            .when(F.substring(nz, 1, 1).isin("2", "3"), 2)
            .when(F.substring(nz, 1, 1).isin("4", "5", "6", "7"), 1)
            .otherwise(0)
        )
        rho = h.select(
            "l_returnflag",
            "l_linestatus",
            F.conv(F.substring("hx", 1, 2), 16, 10).cast("bigint").alias("bucket"),
            F.when(nz == "", 57)
            .otherwise(4 * (14 - F.length(nz)) + digit_lz + 1)
            .alias("rho"),
        )
        lattice = (
            li.select("l_returnflag", "l_linestatus")
            .distinct()
            .crossJoin(
                spark.range(SKT_M).select(F.col("id").cast("bigint").alias("bucket"))
            )
        )
        (
            lattice.join(rho, ["l_returnflag", "l_linestatus", "bucket"], "left")
            .groupBy("l_returnflag", "l_linestatus", "bucket")
            .agg(F.coalesce(F.max("rho"), F.lit(0)).cast("int").alias("m_j"))
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


@query("agg_hll_sketch_table", oracle=f"""
    WITH h AS (
      SELECT l_returnflag, md5(CAST(l_orderkey AS VARCHAR)) AS hx
      FROM lineitem
    ),
    rho AS (
      SELECT l_returnflag,
             CAST('0x' || substr(hx, 1, 2) AS BIGINT) AS bucket,
             CASE WHEN regexp_replace(substr(hx, 3, 14), '^0+', '') = ''
                  THEN 57
                  ELSE 4 * (14 - length(regexp_replace(substr(hx, 3, 14), '^0+', '')))
                       + CASE substr(regexp_replace(substr(hx, 3, 14), '^0+', ''), 1, 1)
                           WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                           WHEN '7' THEN 1 ELSE 0 END
                       + 1 END AS rho
      FROM h
    ),
    regs AS (
      SELECT seg.l_returnflag, b.bucket,
             COALESCE(max(r.rho), 0) AS m_j
      FROM (SELECT DISTINCT l_returnflag FROM lineitem) seg
      CROSS JOIN (SELECT unnest(range({SKT_M})) AS bucket) b
      LEFT JOIN rho r ON r.l_returnflag = seg.l_returnflag
                     AND r.bucket = b.bucket
      GROUP BY seg.l_returnflag, b.bucket
    )
    SELECT l_returnflag,
           CAST(floor({_SKT_NUM} / CAST(sum(CAST(1 AS BIGINT)
                  << GREATEST(48 - m_j, 0)) AS DOUBLE)) AS BIGINT)
             AS approx_orders
    FROM regs GROUP BY l_returnflag
""")
def agg_hll_sketch_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct orderkeys per returnflag answered from the STORED sketch
    table — the fact table is not scanned: the rollup reads #groups ×
    {SKT_M} register rows, merges registers to the flag level with
    max() (max IS the HLL merge), and evaluates the estimate. Was the
    suite's only rows-only key through r8; the portable md5-register
    representation (recipe proven bit-identical cross-engine by
    agg_hll_portable since r4) makes the whole pipeline SQL-replayable,
    so the oracle recomputes the identical registers from lineitem —
    associativity of max guarantees flag-level registers derived from
    the stored (flag, status) sketches equal registers built directly.

    Scale shape: the ingest build is one map-side-combined groupBy
    (output bounded at #groups × {SKT_M} small-int rows regardless of
    corpus size); the query side touches only the sketch table —
    distinct-count rollups at 100 TB become metadata-size work, the
    materialized-sketch pattern every warehouse ships.

    Parity with reference: approx distinct per segment mirrors the
    delegated approx_count_distinct surface (/root/reference/main.py:231
    pass-through)."""
    path = build_sketch_table(spark, sf_dir)
    flag_regs = (
        spark.read.parquet(path)
        .groupBy("l_returnflag", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    return (
        flag_regs.groupBy("l_returnflag")
        .agg(F.expr(_SKT_EST).alias("approx_orders"))
        .orderBy("l_returnflag")
    )


@query("agg_theta_sketch_ops", oracle="""
    WITH s AS (
      SELECT o_orderpriority, o_custkey
      FROM orders GROUP BY o_orderpriority, o_custkey
    ),
    per AS (
      SELECT 'per:' || o_orderpriority AS measure,
             CAST(count(*) AS BIGINT) AS est
      FROM s GROUP BY o_orderpriority
    ),
    un AS (
      SELECT 'union:all' AS measure,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS est
      FROM orders
    ),
    inter AS (
      SELECT 'intersect:1-URGENT&5-LOW' AS measure,
             CAST(count(*) AS BIGINT) AS est
      FROM (
        SELECT o_custkey FROM s WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM s WHERE o_orderpriority = '5-LOW'
      )
    ),
    diff AS (
      SELECT 'diff:1-URGENT-minus-5-LOW' AS measure,
             CAST(count(*) AS BIGINT) AS est
      FROM (
        SELECT o_custkey FROM s WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_custkey FROM s WHERE o_orderpriority = '5-LOW'
      )
    )
    SELECT * FROM per UNION ALL SELECT * FROM un
    UNION ALL SELECT * FROM inter UNION ALL SELECT * FROM diff
""")
def agg_theta_sketch_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch distinct-count SET ALGEBRA (Apache DataSketches,
    JVM-native): per-group sketches, then union / intersection /
    difference estimates computed on the SKETCHES — no key rescan, no
    distinct shuffle per question.

    HLL answers only unions; theta's a-not-b and intersection are what
    make sketch tables answer audience-overlap questions ("customers
    with URGENT but no LOW orders") at metadata cost. At 100 TB the
    sketches live next to the data like the HLL sketch table
    (agg_hll_sketch_table) and every question here merges a handful of
    KB.

    Oracle exactness: below the sketch's nominal entries (lgK=15 →
    32768, above every local fixture's customer count incl. sf0.1's
    15000 — verified: the default 4096 went into estimate mode at sf0.1
    with ~1.5% error, exactly the documented degradation) a theta
    sketch retains every hash, so estimates are EXACT and the DuckDB
    oracle is the exact set algebra — the same query at 10^6× scale
    degrades gracefully to ~1-2% relative error."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_theta_orders")
    # Materialize the sketch table once: the SQL below reads it from five
    # branches, and an inlined CTE would re-aggregate the fact table per
    # branch — the sketch TABLE being built once IS the pattern's point.
    sk = spark.sql(
        "SELECT o_orderpriority, theta_sketch_agg(o_custkey, 15) AS s "
        "FROM _theta_orders GROUP BY o_orderpriority"
    ).localCheckpoint(eager=False)
    sk.createOrReplaceTempView("_theta_sk")
    return spark.sql(
        r"""
        WITH sk AS (SELECT * FROM _theta_sk),
        per AS (
          SELECT 'per:' || o_orderpriority AS measure,
                 CAST(theta_sketch_estimate(s) AS BIGINT) AS est
          FROM sk
        ),
        un AS (
          SELECT 'union:all' AS measure,
                 CAST(theta_sketch_estimate(theta_union_agg(s, 15)) AS BIGINT) AS est
          FROM sk
        ),
        ab AS (
          SELECT (SELECT s FROM sk WHERE o_orderpriority = '1-URGENT') AS a,
                 (SELECT s FROM sk WHERE o_orderpriority = '5-LOW') AS b
        ),
        inter AS (
          SELECT 'intersect:1-URGENT&5-LOW' AS measure,
                 CAST(theta_sketch_estimate(theta_intersection(a, b)) AS BIGINT)
                     AS est
          FROM ab
        ),
        diff AS (
          SELECT 'diff:1-URGENT-minus-5-LOW' AS measure,
                 CAST(theta_sketch_estimate(theta_difference(a, b)) AS BIGINT)
                     AS est
          FROM ab
        )
        SELECT * FROM per UNION ALL SELECT * FROM un
        UNION ALL SELECT * FROM inter UNION ALL SELECT * FROM diff
        """
    )


@query("agg_bitmap_distinct", oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM orders
    GROUP BY o_orderpriority
""")
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via bitmap aggregation (Spark's
    bitmap_construct_agg family) — the third distinct-count strategy
    next to the approximate sketch tables (HLL: unions only; theta:
    full set algebra; bitmap: exact, integer-keyed).

    Shape: keys bucket into fixed 32k-bit bitmap segments
    (bitmap_bucket_number), each (group, bucket) aggregates to one
    bitmap map-side, and the final count is a sum of per-segment
    popcounts — COUNT(DISTINCT)'s full shuffle of every distinct key is
    replaced by a shuffle of bounded bitmap blocks. Stored as a table
    (like agg_hll_sketch_table) the segments answer later distinct
    rollups by OR-merge (bitmap_or_agg) without rescanning facts. Exact
    by construction, so the oracle is plain COUNT(DISTINCT)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_bitmap_orders")
    return spark.sql(
        """
        WITH seg AS (
          SELECT o_orderpriority,
                 bitmap_bucket_number(o_custkey) AS bucket,
                 bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS bm,
                 count(*) AS n_rows
          FROM _bitmap_orders
          GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey)
        )
        SELECT o_orderpriority,
               CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_distinct,
               CAST(sum(n_rows) AS BIGINT) AS n_rows
        FROM seg
        GROUP BY o_orderpriority
        """
    )


CMS_WIDTH = 64   # counters per hash row — deliberately small so the
                 # overestimate property is visible on the fixture
CMS_DEPTH = 4    # independent hash rows; estimate = min over rows

# one md5 per ITEM; hash row d reads its own disjoint 8-hex-char slice
# of the 128-bit digest (4 x 32 bits) — CMS_DEPTH-independent rows from
# a single hash evaluation
_CMS_IDX_SQL = (
    "CAST('0x' || substr(md5(item), 1 + 8 * {d}, 8)"
    f" AS BIGINT) % {CMS_WIDTH}"
)


@query("agg_cms_frequency", oracle=f"""
    WITH rows_ AS (
      SELECT p.p_type || '#' || p.p_size AS item FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
    ),
    items AS (
      SELECT item, CAST(count(*) AS BIGINT) AS true_count
      FROM rows_ GROUP BY item
    ),
    cells AS (
      SELECT d.d AS depth, {_CMS_IDX_SQL.format(d='d.d')} AS idx,
             CAST(sum(true_count) AS BIGINT) AS c
      FROM items, (SELECT unnest(range({CMS_DEPTH})) AS d) d
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT i.item, i.true_count, d.d AS depth,
             {_CMS_IDX_SQL.format(d='d.d')} AS idx
      FROM items i, (SELECT unnest(range({CMS_DEPTH})) AS d) d
    )
    SELECT p.item, CAST(min(c.c) AS BIGINT) AS est_count,
           p.true_count
    FROM probes p JOIN cells c ON p.depth = c.depth AND p.idx = c.idx
    GROUP BY p.item, p.true_count
""")
def agg_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimation (new r6) — the mergeable
    heavy-hitter counter (Cormode & Muthukrishnan 2005) every streaming
    /pre-aggregation stack ships next to HLL (cardinality) and theta
    (set ops): a depth×width grid of counters, item increments one
    counter per hash row, estimate = min over rows — never an
    underestimate, overestimates only on hash collision.

    Demonstrated on (p_type, p_size) item frequencies over the
    lineitem⋈part fact stream — ~300 distinct items against width
    {CMS_WIDTH}, deliberately undersized so collisions occur and
    est ≥ true is a REAL property on the fixture (asserted in tests),
    not vacuous equality.

    Exactness: the hash rows read DISJOINT 32-bit slices of one md5
    digest per item (r6 perf rework: one hash evaluation feeds all
    {CMS_DEPTH} rows — was one md5 per (row, depth), 4.9 s at sf0.1,
    now <1 s), so the sketch CELLS — not just the estimates — are
    bit-identical in both engines and the whole pipeline is
    SQL-replayable; the DuckDB oracle rebuilds the identical sketch and
    probes it identically.

    Scale shape: the raw fact stream reduces FIRST to the exact item
    rollup (one map-side-combinable groupBy, output bounded by the item
    vocabulary); the sketch cells are then the cellwise SUM of item
    counts — algebraically identical to per-arrival increments (that
    per-row form is the streaming-ingest shape; this is the batch-build
    shape) — so the expensive hash work runs |items|×{CMS_DEPTH} times,
    not |rows|×{CMS_DEPTH}. Sketch bounded at {CMS_DEPTH}×{CMS_WIDTH}
    rows regardless of corpus size; probes join it broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.concat(F.col("p_type"), F.lit("#"), F.col("p_size").cast("string"))
        .alias("item"),
    )
    rows = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select("item")
    items = rows.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )

    def idx(depth_col):
        return (
            F.conv(
                F.substring(F.md5(F.col("item")), 1 + 8 * depth_col, 8), 16, 10
            ).cast("bigint")
            % CMS_WIDTH
        )

    depths = F.explode(
        F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))
    ).alias("depth")
    hashed = items.select("item", "true_count", depths).select(
        "item", "true_count", "depth", idx(F.col("depth")).alias("idx")
    )
    cells = hashed.groupBy("depth", "idx").agg(
        F.sum("true_count").cast("bigint").alias("c")
    )
    return (
        hashed.join(F.broadcast(cells), ["depth", "idx"])
        .groupBy("item", "true_count")
        .agg(F.min("c").cast("bigint").alias("est_count"))
        .select("item", "est_count", "true_count")
    )


# --- portable HyperLogLog: the cross-engine-exact variant -------------
#
# agg_hll_sketch_table (above) uses Spark's native DataSketches HLL and
# is rows-only by necessity.  This key closes the gap from the other
# side: an HLL built from first principles (Flajolet et al. 2007) out of
# engine-neutral primitives — md5 hash, string leading-zero scan,
# integer bit-shifts — so the 32 REGISTERS themselves (not just the
# estimate) are bit-identical in Spark and DuckDB, and the estimate uses
# only IEEE +,*,/ and floor (no libm), making the whole pipeline
# SQL-replayable with exact value parity.
HLL_M = 32          # registers; stderr 1.04/sqrt(32) ~ 18%
HLL_ALPHA = 0.697   # alpha_32 from the HLL paper
# alpha * m^2 * 2^56 — every factor is a power-of-two scaling of the
# 0.709 double (exponent shifts, no mantissa rounding), so the one and
# only FP rounding in the estimate is the final divide by S.
# Integer literals promote exactly to DOUBLE (1024 and 2^56 are both
# dyadic); the explicit CAST keeps both parsers out of DECIMAL
# arithmetic (DuckDB reads `x.y` literals as DECIMAL and overflows).
_HLL_NUM = "(CAST(0.697 AS DOUBLE) * 1024 * 72057594037927936)"


@query("agg_hll_portable", oracle=f"""
    WITH h AS (
      SELECT o_orderpriority, md5(CAST(o_custkey AS VARCHAR)) AS hx
      FROM orders
    ),
    rho AS (
      SELECT o_orderpriority,
             CAST('0x' || substr(hx, 1, 2) AS BIGINT) % {HLL_M} AS bucket,
             CASE WHEN regexp_replace(substr(hx, 3, 14), '^0+', '') = ''
                  THEN 57
                  ELSE 4 * (14 - length(regexp_replace(substr(hx, 3, 14), '^0+', '')))
                       + CASE substr(regexp_replace(substr(hx, 3, 14), '^0+', ''), 1, 1)
                           WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                           WHEN '7' THEN 1 ELSE 0 END
                       + 1 END AS rho
      FROM h
    ),
    regs AS (
      SELECT seg.o_orderpriority, b.bucket,
             COALESCE(max(r.rho), 0) AS m_j
      FROM (SELECT DISTINCT o_orderpriority FROM orders) seg
      CROSS JOIN (SELECT unnest(range({HLL_M})) AS bucket) b
      LEFT JOIN rho r ON r.o_orderpriority = seg.o_orderpriority
                     AND r.bucket = b.bucket
      GROUP BY seg.o_orderpriority, b.bucket
    ),
    est AS (
      SELECT o_orderpriority,
             CAST(floor({_HLL_NUM} / CAST(sum(CAST(1 AS BIGINT) << GREATEST(56 - m_j, 0)) AS DOUBLE)) AS BIGINT) AS est_distinct
      FROM regs GROUP BY o_orderpriority
    )
    SELECT e.o_orderpriority, e.est_distinct, t.true_distinct
    FROM est e
    JOIN (SELECT o_orderpriority,
                 CAST(count(DISTINCT o_custkey) AS BIGINT) AS true_distinct
          FROM orders GROUP BY o_orderpriority) t
      USING (o_orderpriority)
""")
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct-count — same estimator family the
    reference reaches via DuckDB's approx_count_distinct, rebuilt from
    engine-neutral primitives so cross-engine value parity is EXACT
    (the one thing the native-sketch key above cannot give).

    Register pipeline per row: hx = md5(custkey); bucket = first byte
    mod 32 (uniform: 256/32 is integral); rho = 1 + leading zero bits of
    the next 56 bits, computed by an exact hex-string scan (regexp strip
    of leading '0' chars + a 16-way CASE on the first nonzero digit) —
    no float log2, no bit_length portability trap.  Register value =
    max(rho) per (segment, bucket); absent buckets count as 0 via a
    dense 64-bucket lattice left-join.

    Estimate: E = alpha_32 * m^2 / sum(2^-M_j).  The denominator is the
    exact BIGINT sum of 2^(56-M_j) (bit-shift, no pow()), the numerator
    a power-of-two scaling of 0.697 — the single FP rounding is the
    final divide, identical under IEEE in both engines, then floor.
    Small-range correction (linear counting) is deliberately out of
    scope: m=32 puts the 2.5m=80 threshold below every fixture
    segment's ~130+ true distinct (incl. sf0.001) (asserted in tests).

    Scale shape: ONE map-side-combined groupBy to (segment, bucket) —
    output bounded at segments x 32 rows regardless of corpus size, and
    the per-partition partial maxes ARE mergeable HLL sketches (max is
    the merge), so this is the ingest-once/merge-forever sketch-table
    pattern with exact replayability.  Accuracy vs exact distinct is
    asserted <= 3 sigma (~55%) in tests; observed <=22% on the fixture.

    Parity with reference: approx distinct per segment mirrors
    /root/reference/main.py's delegated approx_count_distinct usage."""
    orders = load_table(spark, sf_dir, "orders")
    h = orders.select(
        "o_orderpriority",
        F.md5(F.col("o_custkey").cast("string")).alias("hx"),
    )
    nz = F.regexp_replace(F.substring("hx", 3, 14), "^0+", "")
    digit_lz = (
        F.when(F.substring(nz, 1, 1) == "1", 3)
        .when(F.substring(nz, 1, 1).isin("2", "3"), 2)
        .when(F.substring(nz, 1, 1).isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = h.select(
        "o_orderpriority",
        (
            F.conv(F.substring("hx", 1, 2), 16, 10).cast("bigint") % HLL_M
        ).alias("bucket"),
        F.when(nz == "", 57)
        .otherwise(4 * (14 - F.length(nz)) + digit_lz + 1)
        .alias("rho"),
    )
    lattice = (
        orders.select("o_orderpriority")
        .distinct()
        .crossJoin(
            spark.range(HLL_M).select(F.col("id").cast("int").alias("bucket"))
        )
    )
    regs = (
        lattice.join(rho, ["o_orderpriority", "bucket"], "left")
        .groupBy("o_orderpriority", "bucket")
        .agg(F.coalesce(F.max("rho"), F.lit(0)).alias("m_j"))
    )
    est = regs.groupBy("o_orderpriority").agg(
        F.expr(
            f"CAST(floor({_HLL_NUM} / CAST(sum(shiftleft(CAST(1 AS BIGINT),"
            " greatest(56 - m_j, 0))) AS DOUBLE)) AS BIGINT)"
        ).alias("est_distinct")
    )
    true_d = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("true_distinct")
    )
    return est.join(true_d, "o_orderpriority").select(
        "o_orderpriority", "est_distinct", "true_distinct"
    )


# ---------------------------------------------------------------------------
# Quantile sketch table (r9) — the quantile member of the mergeable-
# sketch-table trio (HLL = distinct counts, theta = set algebra,
# histogram = quantiles). A fixed-width integer-cents histogram is the
# simplest fully-mergeable quantile sketch (merge = bucket-wise count
# sum, exactly associative), and unlike t-digest/KLL its registers and
# its estimator are pure integer arithmetic — SQL-replayable with exact
# value parity, like the portable HLL above. Estimate error is bounded
# by one bucket width (QSK_WIDTH_CENTS = $256 on a ~$104k domain →
# ≤0.25% of range), the honesty number the docstring carries.
# ---------------------------------------------------------------------------

QSK_WIDTH_CENTS = 25600     # $256 bucket width → ~410 buckets over the domain
QSK_QUANTILES = ((50, "p50"), (90, "p90"), (99, "p99"))


def build_quantile_sketch_table(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the per-(returnflag, linestatus) histogram sketch of
    l_extendedprice (idempotent per corpus): bucket = exact integer
    cents DIV {QSK_WIDTH_CENTS}, register = row count. ONE map-side-
    combined groupBy; output bounded at #groups × #buckets tiny-int
    rows regardless of corpus size; counts merge by sum, so per-
    partition partials ARE the sketch (appended per load partition at
    scale, like the HLL table)."""
    path = f"{SKETCH_ROOT}/q_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    import os

    if not os.path.exists(f"{path}/_SUCCESS"):
        li = load_table(spark, sf_dir, "lineitem")
        cents = (
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
        )
        (
            li.select(
                "l_returnflag",
                "l_linestatus",
                (cents / QSK_WIDTH_CENTS).cast("bigint").alias("bucket"),
            )
            .groupBy("l_returnflag", "l_linestatus", "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


@query("agg_quantile_sketch_table", oracle=f"""
    WITH regs AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // {QSK_WIDTH_CENTS} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT l_returnflag, bucket, cnt,
             sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS c,
             sum(cnt) OVER (PARTITION BY l_returnflag) AS n
      FROM regs
    )
    SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
      {", ".join(
        f'''CAST(min(CASE WHEN c * 100 >= {q} * n THEN bucket END)
             * {QSK_WIDTH_CENTS} AS DOUBLE) / 100.0 AS {name}'''
        for q, name in QSK_QUANTILES)}
    FROM cum GROUP BY l_returnflag
""")
def agg_quantile_sketch_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles per returnflag answered from the STORED
    histogram sketch table — the fact table is not scanned. Registers
    (flag, status, bucket, cnt) merge to the flag level by SUM (counts
    are exactly associative); the q-quantile estimate is the lower
    edge of the first bucket whose cumulative count reaches ⌈q·N⌉,
    computed as the all-integer predicate c·100 ≥ q·N — no float
    enters until the final cents→dollars divide, so the DuckDB replay
    (which rebuilds identical registers from lineitem — merge
    associativity makes stored-(flag,status) vs direct-(flag) register
    builds equal) is hash-exact. Error ≤ one bucket width ($256 on a
    $104k domain, ≤0.25% of range); the exact-quantile siblings are
    agg_quantile (exact percentile_disc) and agg_approx.

    Scale shape: ingest is ONE map-side-combined groupBy bounded at
    #groups × #buckets rows; the query reads only the sketch table,
    merges ≤ #buckets rows per flag, and runs a flag-partitioned
    cumulative window over ≤410 rows per partition — quantile rollups
    at 100 TB become metadata-size work, and appended load partitions
    merge by re-summing, never re-scanning."""
    path = build_quantile_sketch_table(spark, sf_dir)
    regs = (
        spark.read.parquet(path)
        .groupBy("l_returnflag", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("l_returnflag").orderBy("bucket")
    cum = regs.select(
        "l_returnflag",
        "bucket",
        F.sum("cnt").over(w).alias("c"),
        F.sum("cnt").over(W.partitionBy("l_returnflag")).alias("n"),
    )
    aggs = [F.max("n").cast("bigint").alias("n")] + [
        (
            F.min(F.when(F.col("c") * 100 >= q * F.col("n"), F.col("bucket")))
            * QSK_WIDTH_CENTS
        ).cast("double").alias(name)
        for q, name in QSK_QUANTILES
    ]
    out = cum.groupBy("l_returnflag").agg(*aggs)
    return out.select(
        "l_returnflag",
        "n",
        *[(F.col(name) / 100.0).alias(name) for _, name in QSK_QUANTILES],
    )
