"""Dedup scaling curve: dedup_exact (same algorithm, engine vs engine) and
dedup_minhash_lsh (our LSH pipeline vs DuckDB's exact inverted-index
oracle) at 1x/4x/16x the sf0.1 documents corpus (5k/20k/80k docs),
Spark local[32] vs DuckDB (32 threads), medians of 3 warm runs.

Replicas get a per-replica vocabulary suffix on every word, so replicas
share no shingles: the near-dup pair structure is the base corpus's,
repeated per replica — corpus n-times bigger means n-times the true
pairs and n-times the candidate volume (the linear-scaling regime a real
crawl lives in), not the n-squared blow-up that replicating identical
text would fake.

Note the 20k/80k corpora are multi-file datasets, so the minhash verify
join takes the non-broadcast fallback path (_corpus_doc_count reports
large) — the same plan shape a real >200k-doc corpus gets.

Derived data lands in /tmp/qf_scale_docs (fixtures never written).
Reproduction script for the dedup crossover table in PERF.md.

Usage: python tools/scale_curve_dedup.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SCALE_DIR = "/tmp/qf_scale_docs"
BASE = "/root/testdata/sf0.1"

EXACT_SQL = """
SELECT md5(lower(trim(text))) AS text_hash,
       min(doc_id) AS keep_id, count(*) AS n_copies
FROM read_parquet('{t}') GROUP BY 1
"""

# the exact inverted-index ground truth the LSH key is oracle-checked
# against (pipeline/dedup.py::_duck_jaccard_pairs at threshold 0.7)
LSH_ORACLE_SQL = """
WITH t AS MATERIALIZED (
  SELECT doc_id, list_sort(list_distinct(
    list_transform(range(1, len(regexp_split_to_array(trim(text), '\\s+'))),
      i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
           regexp_split_to_array(trim(text), '\\s+')[i+1])
  )) AS sh FROM read_parquet('{t}')),
inv AS (SELECT doc_id, unnest(sh) AS shingle FROM t),
sizes AS (SELECT doc_id, len(sh) AS n FROM t),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b
FROM common
JOIN sizes sa ON sa.doc_id = common.doc_a
JOIN sizes sb ON sb.doc_id = common.doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.7
"""


def ensure_scaled(spark, mult: int) -> str:
    """documents.parquet replicated mult times with disjoint per-replica
    vocabularies (word -> word + replica id) and offset doc_ids."""
    sf_dir = f"{SCALE_DIR}/x{mult}"
    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path):
        base = spark.read.parquet(f"{BASE}/documents.parquet")
        n = base.count()
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        big = (
            base.crossJoin(F.broadcast(reps))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n)
            .withColumn(
                "text",
                # per-replica vocab: suffix every word with the replica id
                # (pure Catalyst, one pass over the split words)
                F.array_join(
                    F.transform(
                        F.split(F.trim(F.col("text")), r"\s+"),
                        lambda w: F.concat(w, F.col("rep").cast("string")),
                    ),
                    " ",
                ),
            )
            .drop("rep")
        )
        big.write.mode("overwrite").parquet(path)
    return sf_dir


def median_time(fn, n: int = 3) -> float:
    fn()  # warm
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    from quackflight_spark.registry import QUERIES, load_all
    from quackflight_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="scale_curve_dedup")
    con = duckdb.connect()
    con.execute("SET threads TO 32")

    datasets = [("5k", BASE)]
    for mult in (4, 16):
        datasets.append((f"{5 * mult}k", ensure_scaled(spark, mult)))

    for label, sf_dir in datasets:
        glob = f"{sf_dir}/documents.parquet"
        if os.path.isdir(glob):
            glob = f"{glob}/*.parquet"
        s_t = median_time(lambda: QUERIES["dedup_exact"](spark, sf_dir).count())
        d_t = median_time(lambda: con.execute(EXACT_SQL.format(t=glob)).fetchall())
        print(f"{label} dedup_exact: spark={s_t:.2f}s duckdb={d_t:.2f}s "
              f"ratio={s_t / d_t:.1f}x", flush=True)
        s_t = median_time(lambda: QUERIES["dedup_minhash_lsh"](spark, sf_dir).count())
        d_t = median_time(
            lambda: con.execute(LSH_ORACLE_SQL.format(t=glob)).fetchall()
        )
        print(f"{label} near-dup pairs: spark_lsh={s_t:.2f}s "
              f"duckdb_exact={d_t:.2f}s ratio={s_t / d_t:.1f}x", flush=True)


if __name__ == "__main__":
    main()
