"""Composite training-data pipeline — the end-to-end shape a 100 TB
corpus-preparation job takes, as one declarative plan:

    quality filter → language gate → exact-dedup survivor pick →
    per-language quality stats

Everything is a single Catalyst plan: the filters fuse into the scan,
dedup is one shuffle on the text hash, stats one more bounded shuffle.
No Python, no driver loops. This is the flagship beyond-reference
operator (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table


@query("pipeline_corpus_prep", oracle="""
    WITH toks AS (
      SELECT doc_id, lang, text, n_chars,
             list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
      FROM documents
    ), quality AS (
      SELECT doc_id, lang, text, n_chars,
             len(t) AS n_tokens,
             CAST(length(replace(text, ' ', '')) AS DOUBLE) / greatest(len(t), 1) AS mean_wl
      FROM toks
      WHERE len(t) >= 10 AND n_chars >= 80
    ), dedup AS (
      SELECT *, row_number() OVER (PARTITION BY md5(lower(trim(text)))
                                   ORDER BY doc_id) AS rn
      FROM quality
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(SUM(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
           round(CAST(SUM(mean_wl) AS DOUBLE) / count(*), 6) AS avg_word_len
    FROM dedup WHERE rn = 1
    GROUP BY lang
""")
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    quality = (
        d.withColumn("t", toks)
        .withColumn("n_tokens", F.size("t"))
        .withColumn(
            "mean_wl",
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)),
        )
        .filter((F.col("n_tokens") >= 10) & (F.col("n_chars") >= 80))
    )
    w = W.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    survivors = quality.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6).alias("avg_chars"),
        F.round(F.sum("mean_wl").cast("double") / F.count(F.lit(1)), 6).alias("avg_word_len"),
    )
