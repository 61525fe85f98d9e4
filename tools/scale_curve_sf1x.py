"""sf1-equivalent leg for the r10 weak trio and the LLM-pipeline
headliners (VERDICT r10 tasks #1b and stretch #8): replicate the sf0.1
fixtures 10x with consistent key remapping (the tpch_sf1 device) and
time Spark local[32] vs DuckDB (32 threads) on the same parquet.

What each family is expected to show:

- graph_kcore / graph_wcc: the per-round cost on local[32] is
  dominated by fixed scheduling floors (AQE job-per-shuffle-stage,
  measured ~4 jobs/round), so Spark wall-clock should grow far slower
  than 10x while DuckDB's 24/20 materialized unrolled rounds grow
  linearly with incidence — the crossover the fixed-round sf0.1 ratio
  (3.74x / 2.40x) cannot see. kcore's generator draws targets mod the
  part count, so 10x parts = one organic 10x graph (constant expected
  degree ~9); wcc's lineitem replicas are disjoint copies, so
  components replicate exactly 10x with unchanged peel depth.
- ann_ivf_append: training is bounded-sample (constant) in BOTH
  engines; the delta-assign + multi-probe search legs are linear. The
  replicated corpus keeps vec_ids 0..N_QUERIES-1 only in replica 0, so
  the query set is fixed while the corpus grows 10x — the production
  ingest shape.
- dedup_minhash_lsh / dedup_substring / search_bm25_topk /
  pipeline_bpe_merges: two replication modes, chosen deliberately.
  VERBATIM (default): only doc_id is offset, so the 10x corpus is
  duplicate-heavy — every original document has 10 exact copies, and
  the within-bucket pair work grows QUADRATICALLY in the copy count on
  BOTH engines (measured: the dedup keys blow past a 10-minute budget
  at x10 — that is the workload changing, not an engine gap).
  SALTED (QF_SF1X_SALT_TEXT=1): every word gets a per-replica suffix,
  so replicas are DISJOINT in shingle space — same near-dup structure
  per replica, 10x the data, the clean iso-workload scale curve. The
  salting happens in the BUILDER (Spark writes the parquet; both
  engines read identical bytes — no cross-engine regex hazard).

Derived data lands under /tmp (fixtures never written). Usage:
  python tools/scale_curve_sf1x.py                 (all keys)
  QF_SF1X_KEYS=graph_kcore,graph_wcc python tools/scale_curve_sf1x.py
  QF_SF1X_SALT_TEXT=1 QF_SF1X_KEYS=dedup_minhash_lsh ... (iso-workload)
One line per key + a JSON summary; paste into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
MULT = int(os.environ.get("QF_SF1X_MULT", "10"))
KEYS = os.environ.get(
    "QF_SF1X_KEYS",
    "graph_kcore,graph_wcc,ann_ivf_append,"
    "dedup_minhash_lsh,dedup_substring,search_bm25_topk,pipeline_bpe_merges",
).split(",")
# key-domain remaps per table: (column, offset-domain). Every replica is
# a disjoint key-space copy; non-key columns are byte-identical.
REMAP = {
    "part": [("p_partkey", "p")],
    "lineitem": [("l_orderkey", "o"), ("l_partkey", "p"), ("l_suppkey", "s")],
    "documents": [("doc_id", "d")],
    "embeddings": [("vec_id", "v")],
}
OFF_SRC = {
    "p": ("part", "p_partkey"),
    "o": ("lineitem", "l_orderkey"),
    "s": ("lineitem", "l_suppkey"),
    "d": ("documents", "doc_id"),
    "v": ("embeddings", "vec_id"),
}


SALT_TEXT = os.environ.get("QF_SF1X_SALT_TEXT") == "1"


def build_sf1x(spark) -> str:
    out = f"/tmp/qf_sf1x{MULT}" + ("_salted" if SALT_TEXT else "")
    if os.path.exists(f"{out}/_BUILT"):
        return out
    os.makedirs(out, exist_ok=True)
    offs = {}
    for dom, (table, col) in OFF_SRC.items():
        m = (
            spark.read.parquet(f"{BASE}/{table}.parquet")
            .agg(F.max(col))
            .collect()[0][0]
        )
        offs[dom] = int(m) + 1
    reps = spark.range(MULT).select(F.col("id").alias("rep"))
    for table, remaps in REMAP.items():
        df = spark.read.parquet(f"{BASE}/{table}.parquet")
        big = df.crossJoin(F.broadcast(reps))
        for col, dom in remaps:
            big = big.withColumn(col, F.col(col) + F.col("rep") * offs[dom])
        if table == "documents" and SALT_TEXT:
            # per-replica word suffix: replicas become disjoint in
            # shingle space while each replica's internal near-dup
            # structure is preserved exactly (bigram equality iff same
            # word pair, suffix consistent within a replica)
            big = big.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.trim(F.col("text")), r"\s+"),
                        lambda w: F.concat(
                            w, F.lit("_r"), F.col("rep").cast("string")
                        ),
                    ),
                    " ",
                ),
            )
        big.drop("rep").write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
    open(f"{out}/_BUILT", "w").write("ok")
    return out


N_RUNS = int(os.environ.get("QF_SF1X_RUNS", "3"))


def min3(fn) -> float:
    """min of N_RUNS warm runs (bench.py contract). Set QF_SF1X_RUNS=1
    for the multi-minute 10x legs (dedup oracles run 4-5 min in DuckDB
    at x10) so a datapoint fits a bounded session; label such rows
    'single warm run' when recording them."""
    fn()  # warm
    samples = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(min(samples), 3)


def main() -> None:
    import __spark_entry__ as e

    from quackflight_spark.pipeline.frame_cache import clear_frames
    from quackflight_spark.session import get_spark

    spark = get_spark(app_name="scale_curve_sf1x")
    sf1x = build_sf1x(spark)
    queries, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in REMAP:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf1x}/{t}.parquet/*.parquet')"
        )

    # QF_SF1X_SPARK_ONLY=1 (r13): record just the Spark x10 leg — the
    # scale-SHAPE evidence (time at x10 vs x1 for the same code) the
    # iterative-operator claims need — without paying the multi-minute
    # DuckDB recursive oracles (ktruss's closure ran 57-124 s at x1).
    spark_only = os.environ.get("QF_SF1X_SPARK_ONLY") == "1"
    summary = {}
    for key in KEYS:
        s_sec = min3(lambda: queries[key](spark, sf1x).count())
        clear_frames()
        spark.catalog.clearCache()
        if spark_only:
            summary[key] = {"spark": s_sec}
            print(f"{key}: spark={s_sec}s (spark-only leg)", flush=True)
            continue
        d_sec = min3(lambda: con.execute(oracles[key]).fetchall())
        ratio = round(s_sec / d_sec, 2) if d_sec else None
        summary[key] = {"spark": s_sec, "duckdb": d_sec, "ratio": ratio}
        print(
            f"{key}: spark={s_sec}s duckdb={d_sec}s ratio={ratio}x",
            flush=True,
        )
    print(json.dumps({"sf": f"sf0.1 x{MULT}", "keys": summary}))


if __name__ == "__main__":
    main()
