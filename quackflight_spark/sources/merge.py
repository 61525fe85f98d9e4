"""Copy-on-write MERGE (upsert) on partitioned parquet — the DML the
reference delegates to DuckDB's single-file ACID engine (SURVEY §2.11
D4/D5 are its only evidenced writes; an embedded engine gets UPDATE/
upsert "for free" inside one .duckdb file).  A distributed engine over
immutable parquet has to re-express it, and the industry answer (Delta/
Hudi/Iceberg copy-on-write) is exactly what's built here:

1. prune  — only partitions that the source touches are read (broadcast
   semi-join on the partition key; every other partition is never opened),
2. rewrite — affected partitions are rebuilt as (target ANTI-JOIN source
   on key) UNION source, i.e. matched rows updated, unmatched inserted,
3. commit — rewritten partition directories are swapped in atomically
   per-partition.

Step 3 is a driver-side directory swap (O(#partitions), not O(data));
in a production lakehouse the same step is a table-format metadata
commit (Delta/Iceberg snapshot) — the *data* plan (steps 1-2) is
identical at 100 TB: IO scales with the touched partitions, never the
table.  No Delta jars ship in this image, so the swap stands in for the
manifest commit and is isolated in `_commit_partition_swap`.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

from quackflight_spark.staging import stage_root

MERGE_ROOT = stage_root("merge_target")  # derived data; fixtures untouched


def merge_upsert_cow(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """MERGE source INTO parquet table at target_path ON key_cols:
    matched rows are replaced by the source row, unmatched source rows
    are inserted.  Only partitions whose `partition_col` value appears
    in the source are rewritten; the rest are untouched on disk
    (asserted file-for-file in tests/test_writers.py).

    ASSUMPTION (documented per r1 advice): keys are partition-stable —
    a source row never reuses an existing key under a DIFFERENT
    partition value.  Like Hudi's non-global index (and unlike Delta's
    whole-table MERGE match), matching is scoped to the touched
    partitions; a key that moved partitions would leave its old row
    alive in the untouched partition.  Callers whose keys can migrate
    must include the old partition value in the source change-set (a
    delete+insert), which is also how partition-key updates are
    expressed in Hudi/Iceberg CoW pipelines."""
    target = spark.read.parquet(target_path)
    touched = source.select(partition_col).distinct()
    affected = target.join(F.broadcast(touched), on=partition_col, how="left_semi")
    merged = affected.join(
        source.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    ).unionByName(source.select(*affected.columns))

    staging = target_path + "__staging"
    (
        merged.repartition(F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(staging)
    )
    _commit_partition_swap(spark, staging, target_path, partition_col, touched)


def _partition_dirname(spark: SparkSession, partition_col: str, value) -> str:
    """Hive-style partition directory name for a value, using Spark's own
    escaping so the driver-side commit agrees with what the writer wrote."""
    if value is None:
        return f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
    try:
        esc = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(
            str(value)
        )
    except Exception:
        esc = str(value)
    return f"{partition_col}={esc}"


def _commit_partition_swap(
    spark: SparkSession,
    staging: str,
    target_path: str,
    partition_col: str,
    touched: DataFrame,
) -> None:
    """Swap rewritten partition directories into the target.  Stands in
    for a table-format metadata commit: per-partition directory rename,
    no data copied.

    Driven by the TOUCHED partition values, not the staging listing (r1
    advice): a touched partition whose rewrite kept zero rows emits no
    staged directory, and it must still be REMOVED from the target —
    deleting an entire partition is the central retention-sweep case.
    Absent staged dir = partition fully deleted."""
    touched_vals = [r[0] for r in touched.collect()]
    for val in touched_vals:
        dirname = _partition_dirname(spark, partition_col, val)
        dest = os.path.join(target_path, dirname)
        staged = os.path.join(staging, dirname)
        dest_existed = os.path.exists(dest)
        staged_exists = os.path.exists(staged)
        if not dest_existed and not staged_exists:
            # The computed dirname matches NOTHING the writer produced and
            # nothing in the target: the escaping path disagrees with the
            # writer (e.g. no _jvm under Spark Connect + a value needing
            # Hive escaping). Committing anyway would silently discard the
            # rewrite at the staging rmtree below — fail loudly instead,
            # leaving staging on disk for recovery.
            raise RuntimeError(
                f"partition swap: touched value {val!r} resolved to "
                f"{dirname!r}, present in neither staging nor target — "
                "partition-name escaping disagrees with the writer's"
            )
        if dest_existed:
            shutil.rmtree(dest)
        if staged_exists:
            shutil.move(staged, dest)
    # Safety net: a staged dir the touched loop did not claim means the
    # computed dirname disagreed with the writer's for that value. The
    # staged rewrite is authoritative — REPLACE any stale dest rather than
    # skipping it (a skip kept the old rows and dropped the rewrite).
    for staged in glob.glob(os.path.join(staging, f"{partition_col}=*")):
        dest = os.path.join(target_path, os.path.basename(staged))
        if os.path.exists(dest):
            shutil.rmtree(dest)
        shutil.move(staged, dest)
    shutil.rmtree(staging)


_SEGS = "('BUILDING', 'AUTOMOBILE')"
_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def _build_target(spark: SparkSession, sf_dir: str) -> str:
    """Fresh partitioned copy of customer (rebuilt every call so the
    merge below is deterministic and idempotent)."""
    import hashlib

    path = f"{MERGE_ROOT}/{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    base = load_table(spark, sf_dir, "customer").select(*_COLS)
    base.write.mode("overwrite").partitionBy("c_mktsegment").parquet(path)
    return path


def _source_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic change-set over two of the five segments: every
    10th customer gets an account-balance update, every key ≡ 3 (mod 7)
    spawns an insert under a fresh key."""
    base = load_table(spark, sf_dir, "customer").select(*_COLS)
    in_segs = F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    updates = base.filter(in_segs & (F.col("c_custkey") % 10 == 0)).withColumn(
        "c_acctbal", F.col("c_acctbal") + F.lit(1000.0)
    )
    inserts = (
        base.filter(in_segs & (F.col("c_custkey") % 7 == 3))
        .withColumn("c_custkey", F.col("c_custkey") + F.lit(1000000))
        .withColumn("c_name", F.concat(F.lit("NEW "), F.col("c_name")))
    )
    return updates.unionByName(inserts)


@query("merge_upsert", oracle=f"""
    WITH src AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
             c_mktsegment
      FROM customer
      WHERE c_mktsegment IN {_SEGS} AND c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEW ' || c_name, c_nationkey, c_acctbal,
             c_mktsegment
      FROM customer
      WHERE c_mktsegment IN {_SEGS} AND c_custkey % 7 = 3
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE NOT (c_mktsegment IN {_SEGS} AND c_custkey % 10 = 0)
    UNION ALL
    SELECT * FROM src
""")
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end copy-on-write MERGE: build a segment-partitioned
    customer table, apply a deterministic update+insert change-set
    touching 2 of 5 partitions, read the merged table back.  The oracle
    states MERGE semantics directly (target rows with unmatched keys,
    plus every source row); the physical path under test rewrites only
    the two touched partition directories."""
    path = _build_target(spark, sf_dir)
    merge_upsert_cow(spark, path, _source_df(spark, sf_dir), ["c_custkey"], "c_mktsegment")
    return spark.read.parquet(path).select(*_COLS)


def delete_where_cow(
    spark: SparkSession, target_path: str, predicate, partition_col: str
) -> None:
    """DELETE FROM parquet table WHERE predicate, copy-on-write: only
    partitions that actually contain matching rows are rewritten (the
    GDPR-erasure / retention-sweep pattern — at 100 TB the deletes
    usually cluster in a few partitions and everything else is zero IO)."""
    target = spark.read.parquet(target_path)
    touched = target.filter(predicate).select(partition_col).distinct()
    affected = target.join(F.broadcast(touched), on=partition_col, how="left_semi")
    # SQL DELETE removes predicate=TRUE rows only; rows where the predicate
    # is NULL survive.  A bare ~predicate would drop NULL rows (three-valued
    # logic) and disagree with `touched` above, which treats NULL as
    # not-matching — coalesce makes both sides use the same semantics.
    kept = affected.filter(~F.coalesce(predicate, F.lit(False)))

    staging = target_path + "__staging"
    (
        kept.repartition(F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(staging)
    )
    _commit_partition_swap(spark, staging, target_path, partition_col, touched)


@query("delete_where", oracle=f"""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE NOT (c_mktsegment IN {_SEGS} AND c_acctbal < 0)
""")
def delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE: drop negative-balance customers from two of
    the five segment partitions, read the table back.  Only the two
    touched partition directories are rewritten."""
    import hashlib

    path = f"{MERGE_ROOT}/del_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    base = load_table(spark, sf_dir, "customer").select(*_COLS)
    base.write.mode("overwrite").partitionBy("c_mktsegment").parquet(path)
    delete_where_cow(
        spark,
        path,
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") & (F.col("c_acctbal") < 0),
        "c_mktsegment",
    )
    return spark.read.parquet(path).select(*_COLS)


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    eff_date: str,
) -> DataFrame:
    """Slowly-changing-dimension TYPE-2 merge: given a versioned
    dimension (tracked columns + valid_from/valid_to/is_current) and a
    change-set carrying new tracked values per key, CLOSE every current
    row whose tracked values actually change (valid_to = eff_date,
    is_current = false) and APPEND the new open version
    (valid_from = eff_date). No-op updates (identical tracked values,
    null-safe compare) create no version; history rows pass through
    untouched.

    The change-set must carry at most one row per key (standard MERGE
    multiple-matches contract) — duplicates would fan the current row
    out into corrupted double versions, so they fail loudly via a
    bounded one-row aggregate check. Change-set keys ABSENT from the
    dimension are rejected the same way: SCD2 inserts are a separate
    concern (give them an explicit seed version) and silently dropping
    them — what a bare left join does — is the worst outcome.

    Scale shape: ONE keyed join of the CURRENT slice against the
    change-set (no forced broadcast — Catalyst/AQE picks broadcast when
    the change-set fits, sort-merge when a backfill doesn't); the
    history slice never joins anything, so with the table partitioned
    on is_current (or valid_to IS NULL) the merge reads and rewrites
    only the current partition — the same touched-partitions-only
    contract as merge_upsert_cow."""
    import functools
    import operator

    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))
    u = updates.select(
        *keys, *[F.col(c).alias(f"_u_{c}") for c in tracked], F.lit(True).alias("_hit")
    )
    # loud preconditions, one 1-row aggregate over the change-set joined
    # to the current slice: no duplicate keys, no unmatched keys
    chk = (
        u.join(cur.select(*keys, F.lit(True).alias("_cur")), keys, "left")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"), F.max("_cur").alias("_m"))
        .agg(
            F.max("_n").alias("max_dup"),
            F.sum(F.when(F.col("_m").isNull(), 1).otherwise(0)).alias("unmatched"),
        )
        .first()
    )
    if chk and (chk["max_dup"] or 0) > 1:
        raise ValueError(
            "scd2_merge: change-set has duplicate keys (max multiplicity "
            f"{chk['max_dup']}) — one row per key required"
        )
    if chk and (chk["unmatched"] or 0) > 0:
        raise ValueError(
            f"scd2_merge: {chk['unmatched']} change-set key(s) have no "
            "current dimension row — seed new keys explicitly instead of "
            "relying on the merge to invent versions"
        )
    joined = cur.join(u, keys, "left")
    changed = F.coalesce(F.col("_hit"), F.lit(False)) & ~functools.reduce(
        operator.and_,
        [F.col(c).eqNullSafe(F.col(f"_u_{c}")) for c in tracked],
    )
    passthrough = joined.filter(~changed).select(*dim.columns)
    closed = (
        joined.filter(changed)
        .withColumn("valid_to", F.lit(eff_date).cast("date"))
        .withColumn("is_current", F.lit(False))
        .select(*dim.columns)
    )
    opened = (
        joined.filter(changed)
        .select(
            *[c for c in dim.columns if c not in tracked
              and c not in ("valid_from", "valid_to", "is_current")],
            *[F.col(f"_u_{c}").alias(c) for c in tracked],
            F.lit(eff_date).cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .select(*dim.columns)
    )
    return hist.unionByName(passthrough).unionByName(closed).unionByName(opened)


SCD2_EFF = "1995-06-17"


@query("merge_scd2", oracle=f"""
    WITH dim AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer
    ),
    upd AS (SELECT c_custkey, bal + 500.00 AS bal FROM dim
            WHERE c_custkey % 10 = 3)
    SELECT d.c_custkey, d.c_name, CAST(d.bal AS DOUBLE) AS acctbal,
           DATE '1990-01-01' AS valid_from,
           CASE WHEN u.c_custkey IS NOT NULL THEN DATE '{SCD2_EFF}' END
             AS valid_to,
           u.c_custkey IS NULL AS is_current
    FROM dim d LEFT JOIN upd u USING (c_custkey)
    UNION ALL
    SELECT u.c_custkey, d.c_name, CAST(u.bal AS DOUBLE),
           DATE '{SCD2_EFF}', CAST(NULL AS DATE), TRUE
    FROM upd u JOIN dim d USING (c_custkey)
""")
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 versioning (new r5): seed customer as a versioned
    dimension (one open row per key since 1990-01-01), apply a
    deterministic balance change to every key ≡ 3 (mod 10) effective
    {SCD2_EFF} via scd2_merge, and return the full version table —
    changed keys carry a closed old row + an open new row; unchanged
    keys keep their original open row. Balances travel as
    DECIMAL(12,2) (exact +500.00) and surface as DOUBLE, so both
    engines agree bit-for-bit."""
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
    )
    dim = base.select(
        "c_custkey",
        "c_name",
        "bal",
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = base.filter(F.col("c_custkey") % 10 == 3).select(
        "c_custkey",
        (F.col("bal") + F.lit(500.00).cast("decimal(12,2)"))
        .cast("decimal(12,2)")  # keep the dim's exact type through the union
        .alias("bal"),
    )
    out = scd2_merge(dim, updates, ["c_custkey"], ["bal"], SCD2_EFF)
    return out.select(
        "c_custkey",
        "c_name",
        F.col("bal").cast("double").alias("acctbal"),
        "valid_from",
        "valid_to",
        "is_current",
    )


@query("join_scd2_pointintime", oracle=f"""
    WITH dim AS (
      SELECT c_custkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer
    ),
    ver AS (
      SELECT c_custkey, CAST(bal AS DOUBLE) AS acctbal,
             DATE '1990-01-01' AS valid_from,
             CASE WHEN c_custkey % 10 = 3 THEN DATE '{SCD2_EFF}' END
               AS valid_to
      FROM dim
      UNION ALL
      SELECT c_custkey, CAST(bal + 500.00 AS DOUBLE),
             DATE '{SCD2_EFF}', CAST(NULL AS DATE)
      FROM dim WHERE c_custkey % 10 = 3
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, v.acctbal,
           v.valid_to IS NULL AS joined_current_version
    FROM orders o JOIN ver v ON o.o_custkey = v.c_custkey
    WHERE o.o_orderdate >= v.valid_from
      AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
""")
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join (new r6) — the READ side of SCD2
    and the reason the version table exists: enrich each fact row with
    the dimension attributes AS OF the fact's own date, not today's.
    The fixture joins every order against the merge_scd2 version table
    (same seed + {SCD2_EFF} balance change, built through the same
    scd2_merge code path), picking the version whose half-open
    [valid_from, valid_to) interval contains o_orderdate — orders
    placed before the change see the old balance, orders after (and on)
    it see the new one.

    Scale shape: this is deliberately NOT a range join — it is ONE
    equi-join on the dimension KEY (sort-merge or broadcast, Catalyst's
    choice) with the interval predicate applied as a post-join filter.
    The fan-out is bounded by versions-per-key (2 here; tens in any
    real dimension), never by the fact row count, so the plan survives
    a 100 TB fact table exactly as well as any keyed join; an
    interval-keyed range join would buy nothing and cost a second sort.
    """
    dim = merge_scd2(spark, sf_dir).select(
        "c_custkey", "acctbal", "valid_from", "valid_to"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    j = o.join(dim, o.o_custkey == dim.c_custkey)
    return j.filter(
        (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to")))
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "acctbal",
        F.col("valid_to").isNull().alias("joined_current_version"),
    )


@query("merge_cdc_apply", oracle="""
    WITH log_ AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    compacted AS (
      SELECT user_id,
             max(ROW(ts, event_id, op, v)) AS last_,
             CAST(count(*) AS BIGINT) AS n_changes
      FROM log_ GROUP BY user_id
    )
    SELECT user_id,
           last_[3] AS last_op,
           CAST(last_[4] AS DOUBLE) AS last_value,
           last_[1] AS last_ts,
           n_changes
    FROM compacted
    WHERE last_[3] <> 'D'
""")
def merge_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply / compaction (new r6) — the Debezium-shaped
    I/U/D log collapsed to current table state, the streaming-table
    duality every lakehouse ingestion path runs (Delta CDF apply, Hudi
    deduped upsert, Kafka compacted topic materialization).

    The events stream plays the changelog: signup=Insert, error=Delete
    (tombstone), everything else=Update, keyed by user_id, totally
    ordered per key by the unique (ts, event_id). Current state = the
    LATEST op per key; a trailing tombstone erases the key entirely.

    Shape: the naive window (row_number DESC, take 1) sorts every key
    group; this is instead ONE map-side-combinable groupBy with
    max(struct(ts, event_id, op, value)) — the shuffle-once argmax
    idiom (same as merge_scd2's sibling ops) — then a tombstone filter.
    max(struct) is associative, so per-microbatch partial compactions
    merge incrementally: at 100 TB the changelog compacts per partition
    BEFORE the shuffle, and a day's delta folds into yesterday's
    compacted state without rescanning it (same contract as
    dedup_incremental).

    Parity: the reference reaches row-level upsert via DuckDB's
    single-file ACID engine (README.md INSERT/ATTACH flows); this is
    the distributed re-expression for immutable parquet."""
    log_ = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    compacted = log_.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "op", "v")).alias("last_"),
        F.count(F.lit(1)).cast("bigint").alias("n_changes"),
    )
    return (
        compacted.filter(F.col("last_.op") != "D")
        .select(
            "user_id",
            F.col("last_.op").alias("last_op"),
            F.col("last_.v").cast("double").alias("last_value"),
            F.col("last_.ts").alias("last_ts"),
            "n_changes",
        )
    )
