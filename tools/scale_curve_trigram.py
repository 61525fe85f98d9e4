"""Scaling evidence for search_trigram_fuzzy: wall-clock at
sf0.001/0.01/0.1 alongside the volumes the plan actually materializes —
vocabulary size, trigram posting count, and the candidate volume the
query join pulls (Σ over the 8 fixed queries' trigrams of df(tri)).

What the curve should show (and names if it doesn't):
- |vocab| saturates: the fixture vocabulary is a closed word list, so
  corpus growth stops adding distinct words once the list is covered —
  the operator's cost is bounded by the DICTIONARY, not the corpus
  (the text_* family's standard bound). On an open-vocabulary corpus
  |vocab| grows sub-linearly (Heaps' law) and the posting index with
  it.
- candidate volume = Σ df(query trigrams): bounded by |vocab| per
  trigram, so it saturates with the vocabulary here. A pathological
  trigram (df ≈ |vocab|) costs one |vocab|-sized posting list — the
  same hazard class the bm25 df ceiling bounds; worth a θ·|vocab|
  ceiling if real dictionaries (≈10^6 words) meet adversarial queries.

Usage: python tools/scale_curve_trigram.py   (prints one JSON line/SF)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SFS = ("0.001", "0.01", "0.1")


def main() -> None:
    import __spark_entry__ as e

    from quackflight_spark.pipeline.similarity import (
        TRIGRAM_MIN_LEN,
        TRIGRAM_QUERIES,
    )
    from quackflight_spark.session import get_spark
    from quackflight_spark.sources.fixtures import load_table

    spark = get_spark(app_name="scale_curve_trigram")
    queries = e.queries()

    def tri_set(col):
        padded = F.concat(F.lit("^"), col, F.lit("$"))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(padded) - 2),
                lambda i: F.substring(padded, i, F.lit(3)),
            )
        )

    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        d = load_table(spark, sf_dir, "documents")
        toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
        vocab = (
            d.select(F.explode(toks).alias("w0"))
            .select(F.lower("w0").alias("w"))
            .filter(
                (F.length("w") >= TRIGRAM_MIN_LEN) & F.col("w").rlike("^[a-z]+$")
            )
            .distinct()
        )
        vpost = vocab.select("w", F.explode(tri_set(F.col("w"))).alias("tri"))
        n_vocab = vocab.count()
        n_postings = vpost.count()
        qtris = set()
        for q in TRIGRAM_QUERIES:
            p = f"^{q}$"
            qtris.update(p[i : i + 3] for i in range(len(p) - 2))
        cand = (
            vpost.filter(F.col("tri").isin(*sorted(qtris))).count()
        )  # candidate volume the query join pulls
        t0 = time.time()
        queries["search_trigram_fuzzy"](spark, sf_dir).collect()
        wall = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "sf": sf,
                    "n_docs": d.count(),
                    "n_vocab": n_vocab,
                    "n_trigram_postings": n_postings,
                    "candidate_volume": cand,
                    "wall_s": wall,
                }
            )
        )

    spark.stop()


if __name__ == "__main__":
    main()
