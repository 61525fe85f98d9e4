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


OVERLAP_SHINGLE = 5  # tokens per shingle for source-overlap containment


@query("pipeline_overlap_matrix", oracle=rf"""
    WITH tok AS (
      SELECT source,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT source,
             CAST('0x' || substr(md5(sg), 1, 15) AS BIGINT) AS h
      FROM (
        SELECT source,
               unnest(list_transform(
                 range(1, greatest(len(tk) - {OVERLAP_SHINGLE} + 1, 0) + 1),
                 i -> array_to_string(
                        list_slice(tk, i, i + {OVERLAP_SHINGLE} - 1), ' ')))
                 AS sg
        FROM tok
      )
    ),
    sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
    shared AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
      FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT s.src_a, s.src_b,
           CAST(s.shared AS BIGINT) AS shared,
           round(CAST(s.shared AS DOUBLE) / za.n, 6) AS containment_a,
           round(CAST(s.shared AS DOUBLE) / zb.n, 6) AS containment_b
    FROM shared s
    JOIN sizes za ON za.source = s.src_a
    JOIN sizes zb ON zb.source = s.src_b
""")
def pipeline_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram containment matrix — the corpus-governance
    question "which sources duplicate each other, and how much" answered
    before mixing weights are chosen (the overlap analysis behind every
    public pretraining-data card).

    Shape: distinct (source, shingle-hash) inverted index built once
    (one corpus pass), pairs found by EQUI-JOIN on the hash — never an
    all-pairs source product — then two broadcast joins against the
    vocabulary-sized size table. Shingles ride as md5-derived 60-bit
    ints, so the shuffle carries 8-byte keys instead of raw 5-gram
    strings; both engines count the same hash values, so the compare is
    exact even in the (negligible) collision case."""
    d = load_table(spark, sf_dir, "documents")
    tk = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    n_sh = F.greatest(F.size("tk") - F.lit(OVERLAP_SHINGLE - 1), F.lit(0))
    sh = (
        d.select("source", tk.alias("tk"))
        .select(
            "source",
            F.explode(
                F.when(
                    n_sh > 0,
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(n_sh, F.lit(1))),
                        lambda i: F.conv(
                            F.substring(
                                F.md5(
                                    F.concat_ws(
                                        " ",
                                        F.slice(F.col("tk"), i, OVERLAP_SHINGLE),
                                    )
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("bigint"),
                    ),
                ).otherwise(F.array().cast("array<bigint>"))
            ).alias("h"),
        )
        .distinct()
    )
    from quackflight_spark.pipeline.frame_cache import shared_frame

    sh = shared_frame(
        "overlap_shingles", sf_dir, lambda: sh
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("src_a"), "h")
    b = sh.select(F.col("source").alias("src_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    za = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        shared.join(F.broadcast(za), "src_a")
        .join(F.broadcast(zb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("shared").cast("bigint").alias("shared"),
            F.round(F.col("shared") / F.col("na"), 6).alias("containment_a"),
            F.round(F.col("shared") / F.col("nb"), 6).alias("containment_b"),
        )
    )


CHUNK_K = 64   # window size (tokens)
CHUNK_S = 48   # stride (tokens) — 16-token overlap between windows


@query("pipeline_chunk_windows", oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ),
    t2 AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= {CHUNK_K} THEN 1
                  ELSE (len(toks) - {CHUNK_K} + {CHUNK_S - 1}) // {CHUNK_S} + 1
             END AS n_chunks
      FROM t
    ),
    c AS (SELECT doc_id, toks, n, unnest(range(n_chunks)) AS i FROM t2)
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           array_to_string(
             toks[i * {CHUNK_S} + 1 : least(i * {CHUNK_S} + {CHUNK_K}, n)],
             ' ') AS chunk_text,
           CAST(least(i * {CHUNK_S} + {CHUNK_K}, n) - i * {CHUNK_S} AS BIGINT)
             AS n_tokens
    FROM c
""")
def pipeline_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided context-window chunking (new r6) — the BERT/RAG
    long-document splitter: each document becomes overlapping
    {CHUNK_K}-token windows at stride {CHUNK_S} (a {CHUNK_K - CHUNK_S}-
    token overlap so no span falls entirely on a window boundary),
    the standard prep for fixed-context encoders, embedding indexes,
    and retrieval corpora. Chunk count = 1 if n ≤ K else
    ceil((n-K)/S) + 1 — the grid that just covers the tail without
    emitting windows already contained in the previous one.

    Pure Catalyst: tokenize once, per-row posexplode over the
    integer-arithmetic chunk count, slice + join per chunk — no UDF,
    no shuffle at all (the plan is scan → generate → project), so it
    streams over 100 TB of documents at scan speed and parallelism
    follows input splits. Tokens/chunks are exact string and integer
    ops; the oracle replays the identical slicing rules."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    d = d.withColumn("n", F.size("toks")).withColumn(
        "n_chunks",
        F.when(F.col("n") <= CHUNK_K, F.lit(1)).otherwise(
            F.expr(f"(n - {CHUNK_K} + {CHUNK_S - 1}) DIV {CHUNK_S} + 1")
        ),
    )
    c = d.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("i"),
    )
    chunk = F.slice(F.col("toks"), F.col("i") * CHUNK_S + 1, F.lit(CHUNK_K))
    return c.select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
    )
