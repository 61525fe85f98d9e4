"""Scaling evidence for the r8 retrieval family (search_bm25_topk,
search_hybrid_rrf, search_mmr_rerank): wall-clock at sf0.001/0.01/0.1
alongside the CANDIDATE VOLUMES each stage actually materializes —
postings joined by the lexical legs (after the r9 df ceiling), pairs
scored by the vector leg, pairs compared by MMR's greedy rounds.

What the curve should show (and names if it doesn't):
- lexical join volume = Σ_{query terms surviving the df ceiling} df(t)
  — grows linearly with corpus size for a FIXED query set, because
  each kept term's posting list is ≤ θ·N by construction (the r9
  ceiling); without the ceiling one df≈N term makes this term Θ(N)
  per query with no bound.
- vector-leg pairs = N_QUERIES · (N−1): linear in N (brute force by
  design at these SFs; the IVF keys are the documented scale path).
- MMR pairs = N_QUERIES · depth·(depth−1): CONSTANT in N — the rerank
  never touches the corpus, only the depth-bounded candidate table.

Usage: python tools/scale_curve_search.py   (prints one JSON line/SF)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SFS = ("0.001", "0.01", "0.1")
KEYS = ("search_bm25_topk", "search_hybrid_rrf", "search_mmr_rerank")


def main() -> None:
    import __spark_entry__ as e

    from quackflight_spark.pipeline.similarity import (
        DF_CEIL_DEN,
        DF_CEIL_NUM,
        N_QUERIES,
        RRF_DEPTH,
    )
    from quackflight_spark.session import get_spark
    from quackflight_spark.sources.fixtures import load_table

    spark = get_spark(app_name="scale_curve_search")
    queries = e.queries()

    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        d = load_table(spark, sf_dir, "documents")
        n = d.count()
        toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
        tok = d.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.transform(toks, lambda x: F.lower(x)))
            ).alias("w"),
        )
        dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
        kept = dfreq.filter(DF_CEIL_DEN * F.col("df") <= DF_CEIL_NUM * n)
        dropped = dfreq.count() - kept.count()
        # actual lexical join volume: for each query-doc term that
        # survives the ceiling, its full posting list enters the join
        lex_volume = (
            tok.filter(F.col("doc_id") < N_QUERIES)
            .join(kept, "w")
            .agg(F.sum("df"))
            .collect()[0][0]
            or 0
        )
        volumes = {
            "n_docs": n,
            "vocab": dfreq.count(),
            "terms_dropped_by_ceiling": dropped,
            "lex_postings_joined": int(lex_volume),
            "vector_pairs": N_QUERIES * (n - 1),
            "mmr_pairs": N_QUERIES * RRF_DEPTH * (RRF_DEPTH - 1),
        }
        timings = {}
        for key in KEYS:
            t0 = time.time()
            queries[key](spark, sf_dir).collect()
            timings[key] = round(time.time() - t0, 2)
        print(json.dumps({"sf": sf, "volumes": volumes, "sec": timings}))


if __name__ == "__main__":
    main()
