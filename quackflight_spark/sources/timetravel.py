"""Versioned table snapshots — time travel + merge-on-read deletes.

A minimal commit-log table format (the Delta/Iceberg mechanic, scoped to
what a query engine must PROVE): every commit writes only NEW files plus
a manifest listing the full file set of that version; readers resolve a
manifest and scan exactly those files. Old versions stay readable
forever (time travel), concurrent readers never see a half-commit (the
manifest write is the atomic commit point), and a merge-on-read DELETE
commits a tiny key sidecar instead of rewriting data files — the
read path applies it as a broadcast anti-join.

Reference scope note: the reference exposes DuckDB ATTACH'd .duckdb
snapshots (serving/namespaces.py mirrors that); this module is the
lakehouse-native sibling every large-scale deployment actually runs.

Version history built on the customer fixture:
  v0  seed: customer partitioned by c_nationkey
  v1  CoW update: +500.00 balance for c_custkey % 10 = 3, but ONLY
      nations with n % 5 = 3 — 5 of 25 partitions rewritten, the other
      20 file-references carried forward unchanged (the point of the
      manifest: unchanged data is never copied)
  v2  MOR delete: c_custkey % 7 = 2 keys recorded in a deletion-vector
      sidecar — zero data files touched; readers anti-join it
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

from quackflight_spark.staging import stage_root

TT_ROOT = stage_root("timetravel")
TT_UPD_NATION_MOD = 3   # nations n % 5 == 3 get the v1 balance update
TT_UPD_KEY_MOD = 3      # ... for customers c_custkey % 10 == 3
TT_DEL_KEY_MOD = 2      # v2 deletes c_custkey % 7 == 2


def _write_partition(df: DataFrame, path: str) -> list[str]:
    df.write.mode("overwrite").parquet(path)
    return sorted(
        p for p in glob.glob(f"{path}/*.parquet") if os.path.getsize(p) > 0
    )


def build_versioned_table(spark: SparkSession, sf_dir: str) -> str:
    """Build the 3-version table once per fixture generation (mtime-
    fingerprinted); returns the table root containing manifest_{0,1,2}.
    json. Each manifest maps partition value -> list of data files, plus
    an optional delete-sidecar path; writing the manifest LAST is the
    commit."""
    src = os.path.join(sf_dir, "customer.parquet")
    try:
        st = os.stat(src)
        fp = f"{src}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        fp = src
    tag = hashlib.md5(fp.encode()).hexdigest()[:12]
    root = f"{TT_ROOT}/{tag}"
    if os.path.exists(f"{root}/manifest_2.json"):
        return root
    os.makedirs(root, exist_ok=True)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
    )
    nations = sorted(
        r.c_nationkey for r in cust.select("c_nationkey").distinct().collect()
    )
    # v0: one directory per partition (partition-granular CoW needs
    # per-partition file ownership)
    m0: dict = {"files": {}, "deletes": None}
    for nk in nations:
        m0["files"][str(nk)] = _write_partition(
            cust.filter(F.col("c_nationkey") == nk), f"{root}/p{nk}/v0"
        )
    with open(f"{root}/manifest_0.json", "w") as f:
        json.dump(m0, f)
    # v1: rewrite ONLY the updated partitions; carry others forward
    m1 = {"files": dict(m0["files"]), "deletes": None}
    for nk in nations:
        if nk % 5 != TT_UPD_NATION_MOD:
            continue
        upd = cust.filter(F.col("c_nationkey") == nk).withColumn(
            "bal",
            F.when(
                F.col("c_custkey") % 10 == TT_UPD_KEY_MOD,
                (F.col("bal") + F.lit(500.00).cast("decimal(12,2)")).cast(
                    "decimal(12,2)"
                ),
            ).otherwise(F.col("bal")),
        )
        m1["files"][str(nk)] = _write_partition(upd, f"{root}/p{nk}/v1")
    with open(f"{root}/manifest_1.json", "w") as f:
        json.dump(m1, f)
    # v2: merge-on-read delete — data files untouched, keys sidecar only
    dv = cust.filter(F.col("c_custkey") % 7 == TT_DEL_KEY_MOD).select(
        "c_custkey"
    )
    dv_path = f"{root}/deletes/v2"
    dv.write.mode("overwrite").parquet(dv_path)
    m2 = {"files": dict(m1["files"]), "deletes": dv_path}
    with open(f"{root}/manifest_2.json", "w") as f:
        json.dump(m2, f)
    return root


def read_version(spark: SparkSession, root: str, version: int) -> DataFrame:
    """Snapshot read: scan exactly the manifest's file set; apply the
    deletion vector (if any) as a BROADCAST anti-join — data files are
    never rewritten for deletes until a compaction folds them in."""
    with open(f"{root}/manifest_{version}.json") as f:
        m = json.load(f)
    files = [p for fs in m["files"].values() for p in fs]
    df = spark.read.parquet(*files)
    if m["deletes"]:
        dv = F.broadcast(spark.read.parquet(m["deletes"]))
        df = df.join(dv, "c_custkey", "left_anti")
    return df


@query("scan_time_travel", oracle=f"""
    WITH v1 AS (
      SELECT c_custkey, c_nationkey,
             CASE WHEN c_nationkey % 5 = {TT_UPD_NATION_MOD}
                   AND c_custkey % 10 = {TT_UPD_KEY_MOD}
                  THEN CAST(c_acctbal AS DECIMAL(12,2))
                       + CAST(500.00 AS DECIMAL(12,2))
                  ELSE CAST(c_acctbal AS DECIMAL(12,2)) END AS bal
      FROM customer
    ),
    v2 AS (SELECT * FROM v1 WHERE c_custkey % 7 <> {TT_DEL_KEY_MOD})
    SELECT 1 AS version, c_nationkey,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(bal) AS DOUBLE) AS total_bal
    FROM v1 GROUP BY c_nationkey
    UNION ALL
    SELECT 2, c_nationkey, CAST(count(*) AS BIGINT),
           CAST(sum(bal) AS DOUBLE)
    FROM v2 GROUP BY c_nationkey
""")
def scan_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel snapshot reads over the commit-log table (new r6):
    per-nation rollups of versions 1 (after the partition-granular CoW
    update) and 2 (after the merge-on-read delete), both read from
    their MANIFESTS — v1 proves unchanged partitions are served from
    the ORIGINAL v0 files (never copied), v2 proves a delete that
    touched zero data files (the broadcast anti-join applies the key
    sidecar at read time). The oracle replays both versions'
    transformations from the raw fixture. Balances stay DECIMAL-exact
    internally; the final total casts to DOUBLE (decimal output is a
    driver-canonicalizer hazard — r6/r7 lesson).

    Scale shape: the manifest IS the scale mechanism — commit cost is
    proportional to changed data, not table size; snapshot isolation is
    one atomic manifest write; the deletion vector is a tiny broadcast
    side. Version reads list files from metadata, never from directory
    walks. Compaction (sources/layout.py::compact_files) folds DVs in
    when they accumulate — same contract as Delta OPTIMIZE."""
    root = build_versioned_table(spark, sf_dir)
    out = []
    for v in (1, 2):
        snap = read_version(spark, root, v)
        out.append(
            snap.groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("bal").cast("double").alias("total_bal"),
            )
            .select(
                F.lit(v).cast("int").alias("version"),
                "c_nationkey",
                "n_rows",
                "total_bal",
            )
        )
    return out[0].unionByName(out[1])
