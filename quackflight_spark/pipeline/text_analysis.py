"""Text-analysis suite — beyond-reference training-data-pipeline operators
(BASELINE.json north star): language ID, quality scoring, token counting,
document fingerprinting. All built-in Catalyst expressions — zero Python
in the data path, so each op is a pure map over documents (no shuffle,
embarrassingly parallel at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

# tiny per-language marker profiles for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "en": ["the", "and", "of", "to", "is", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "en"],
    "fr": ["le", "la", "les", "de", "et", "est", "que"],
    "zh": ["的", "是", "了", "在", "我", "有", "和"],
}

STOPWORDS = sorted(set(LANG_MARKERS["en"]))


@query("text_tokens", oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS INT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_computed,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+(''[a-z]+)?')) AS INT) AS n_words_bpeish
    FROM documents
""")
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex word count."""
    d = load_table(spark, sf_dir, "documents")
    ws_tokens = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    return d.select(
        "doc_id",
        F.size(ws_tokens).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_computed"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9]+('[a-z]+)?"), F.lit(0))).alias("n_words_bpeish"),
    )


@query("text_quality", oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_q,
           round(CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
                 / greatest(length(text), 1), 8) AS punct_ratio,
           round(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                 / greatest(length(text), 1), 8) AS digit_ratio,
           round(CAST(len(list_filter(toks, x -> list_contains(
                   ['and','in','is','of','that','the','to'], lower(x)))) AS DOUBLE)
                 / greatest(len(toks), 1), 8) AS stopword_ratio,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / greatest(len(toks), 1), 8) AS mean_word_len
    FROM t
""")
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals: length, punctuation/digit density, stopword
    ratio, mean word length (the Gopher/C4-style filter inputs)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    n_chars = F.length("text")
    n_toks = F.greatest(F.size(toks), F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return d.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars_q"),
        F.round(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[\p{Punct}]"), F.lit(0))).cast("double")
            / F.greatest(n_chars, F.lit(1)), 8,
        ).alias("punct_ratio"),
        F.round(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]"), F.lit(0))).cast("double")
            / F.greatest(n_chars, F.lit(1)), 8,
        ).alias("digit_ratio"),
        F.round(
            F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x)))).cast("double")
            / n_toks, 8,
        ).alias("stopword_ratio"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_toks, 8
        ).alias("mean_word_len"),
    )


def _lang_score(toks: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(markers, F.lower(x))))


@query("text_langid", oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS toks
      FROM documents
    ), scores AS (
      SELECT doc_id, lang,
        len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','mit'], lower(x)))) AS s_de,
        len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that'], lower(x)))) AS s_en,
        len(list_filter(toks, x -> list_contains(['el','la','de','que','y','los','en'], lower(x)))) AS s_es,
        len(list_filter(toks, x -> list_contains(['le','la','les','de','et','est','que'], lower(x)))) AS s_fr,
        len(list_filter(toks, x -> list_contains(['的','是','了','在','我','有','和'], lower(x)))) AS s_zh
      FROM t
    )
    SELECT doc_id, lang,
           CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
             WHEN 0 THEN 'unknown'
             WHEN s_de THEN 'de'
             WHEN s_en THEN 'en'
             WHEN s_es THEN 'es'
             WHEN s_fr THEN 'fr'
             ELSE 'zh' END AS predicted_lang
    FROM scores
""")
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID heuristic with deterministic tie-break
    (alphabetical language order — the oracle's CASE checks in the same
    order). Returns the labeled lang alongside for accuracy eval."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    t = d.select("doc_id", "lang", toks.alias("toks"))
    langs = sorted(LANG_MARKERS)  # alphabetical = tie-break order
    scored = t.select(
        "doc_id", "lang",
        *[_lang_score(F.col("toks"), lang).alias(f"s_{lang}") for lang in langs],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.when(best == 0, "unknown")
    for lang in langs:
        pred = pred.when(F.col(f"s_{lang}") == best, lang)
    return scored.select("doc_id", "lang", pred.alias("predicted_lang"))


@query("text_lang_confusion", oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS toks
      FROM documents
    ), scores AS (
      SELECT doc_id, lang,
        len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','mit'], lower(x)))) AS s_de,
        len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that'], lower(x)))) AS s_en,
        len(list_filter(toks, x -> list_contains(['el','la','de','que','y','los','en'], lower(x)))) AS s_es,
        len(list_filter(toks, x -> list_contains(['le','la','les','de','et','est','que'], lower(x)))) AS s_fr,
        len(list_filter(toks, x -> list_contains(['的','是','了','在','我','有','和'], lower(x)))) AS s_zh
      FROM t
    ), pred AS (
      SELECT doc_id, lang AS declared,
             CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
               WHEN 0 THEN 'unknown'
               WHEN s_de THEN 'de'
               WHEN s_en THEN 'en'
               WHEN s_es THEN 'es'
               WHEN s_fr THEN 'fr'
               ELSE 'zh' END AS detected
      FROM scores
    )
    SELECT declared, detected, CAST(count(*) AS BIGINT) AS n_docs,
           (declared <> detected) AS is_mismatch
    FROM pred GROUP BY declared, detected
""")
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language confusion matrix (new r6) — the
    corpus-QA rollup a multilingual pipeline runs before trusting
    upstream `lang` labels (mislabeled crawl segments poison per-
    language mixes and eval sets): cross-tabulate the metadata label
    against text_langid's marker-token detection, flagging off-diagonal
    cells. The aggregate form of text_langid's per-doc output — tiny
    (|langs|² cells), and the report a human actually reads.

    Scale shape: the per-doc detection is the same zero-shuffle
    Catalyst map as text_langid; the confusion rollup is one map-side-
    combinable groupBy bounded by the language-pair vocabulary."""
    per_doc = text_langid(spark, sf_dir)
    return (
        per_doc.groupBy(
            F.col("lang").alias("declared"),
            F.col("predicted_lang").alias("detected"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn(
            "is_mismatch", F.col("declared") != F.col("detected")
        )
    )


@query("text_fingerprint", oracle=r"""
    SELECT doc_id,
           CAST(list_aggregate(
             list_transform(
               list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''),
               w -> CAST('0x' || substr(md5(w), 1, 7) AS BIGINT)),
             'sum') % 2147483647 AS BIGINT) AS additive_fp,
           CAST('0x' || substr(md5(lower(trim(text))), 1, 15) AS BIGINT) AS content_fp
    FROM documents
""")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: order-insensitive additive token hash
    (rolling-hash family, mod 2^31-1) + full-content 60-bit fingerprint.
    Both cross-engine-deterministic (md5-derived, no engine hash())."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    tok_hashes = F.transform(
        toks, lambda w: F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("bigint")
    )
    return d.select(
        "doc_id",
        (
            F.aggregate(tok_hashes, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
            % F.lit(2147483647)
        ).alias("additive_fp"),
        F.conv(F.substring(F.md5(F.lower(F.trim(F.col("text")))), 1, 15), 16, 10)
        .cast("bigint")
        .alias("content_fp"),
    )


VOCAB_TOP_K = 100
PACK_BUDGET = 256  # tokens per packed training shard


@query("text_vocab_topk", oracle=f"""
    WITH tok AS (
      SELECT lower(unnest(list_filter(
               regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))) AS token
      FROM documents
    )
    SELECT token, count(*) AS freq
    FROM tok
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT {VOCAB_TOP_K}
""")
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: the VOCAB_TOP_K most frequent lowercased tokens
    (deterministic token tiebreak) — the first step of any tokenizer/
    vocab-construction pass. explode → two-phase hash count (map-side
    partial collapses each executor's token stream before the shuffle, so
    shuffled volume is |vocab|, not |corpus|) → TakeOrdered top-k."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    return (
        d.select(F.explode(toks).alias("t"))
        .select(F.lower(F.col("t")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(VOCAB_TOP_K)
    )


@query("pipeline_pack_sequences", oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ), runs AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM tok
    )
    SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
           CAST(floor(CAST(cum - n_tokens AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS shard
    FROM runs
""")
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to ~PACK_BUDGET-token training
    shards by running token count within each source (deterministic
    doc_id order — reproducible shards, like the splits in sampling.py).

    Shape: one window per source partition (shuffle keyed on source), no
    global sort — at 100 TB each source's stream packs independently;
    shard ids are made globally unique by (source, shard). A greedy
    bin-packer would give tighter packing but is inherently sequential;
    running-sum sharding is the order-preserving distributed form.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    return (
        d.select("doc_id", "source", F.size(toks).alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor((F.col("cum") - F.col("n_tokens")).cast("double") / PACK_BUDGET).alias("shard"),
        )
    )


@query("text_repetition", oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    b AS (
      SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS g
      FROM t WHERE len(toks) >= 2
    ),
    bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
    bs AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_big FROM bc GROUP BY 1),
    tr AS (
      SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
      FROM t WHERE len(toks) >= 3
    ),
    tc AS (SELECT doc_id, g, count(*) AS c FROM tr GROUP BY 1, 2),
    ts AS (SELECT doc_id,
                  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_tri,
                  CAST(sum(c) AS BIGINT) AS n_tri
           FROM tc GROUP BY 1)
    SELECT t.doc_id,
           round(COALESCE(CAST(bs.top_c AS DOUBLE) / bs.n_big, 0.0), 8)
             AS top_bigram_frac,
           round(COALESCE(CAST(ts.dup_tri AS DOUBLE) / ts.n_tri, 0.0), 8)
             AS dup_trigram_frac
    FROM t
    LEFT JOIN bs ON t.doc_id = bs.doc_id
    LEFT JOIN ts ON t.doc_id = ts.doc_id
""")
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: fraction of bigrams taken by the
    single most frequent bigram, and fraction of trigrams that are
    duplicates — the two strongest boilerplate/spam indicators in the
    Gopher filtering rules (the char-level signals live in text_quality).

    Scale shape: n-grams are exploded and counted with groupBy
    (doc_id, gram) — partial aggregation collapses each doc's grams
    map-side, so the shuffle carries one row per distinct gram, keyed by
    doc_id (no hot keys possible: a doc's grams all land together, and
    per-doc work is linear, never the quadratic
    transform-filter-per-element form)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "").alias(
            "toks"
        ),
    )
    big = d.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(toks)-1),"
                   " i -> concat_ws(' ', toks[i-1], toks[i]))")
        ).alias("g"),
    )
    tri = d.filter(F.size("toks") >= 3).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(toks)-2),"
                   " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))")
        ).alias("g"),
    )
    bs = (
        big.groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_c"), F.sum("count").alias("n_big"))
    )
    ts = (
        tri.groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)).alias("dup_tri"),
            F.sum("count").alias("n_tri"),
        )
    )
    return (
        d.select("doc_id")
        .join(bs, on="doc_id", how="left")
        .join(ts, on="doc_id", how="left")
        .select(
            "doc_id",
            F.round(
                F.coalesce(F.col("top_c").cast("double") / F.col("n_big"), F.lit(0.0)), 8
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(F.col("dup_tri").cast("double") / F.col("n_tri"), F.lit(0.0)), 8
            ).alias("dup_trigram_frac"),
        )
    )


# PII scrub patterns, applied in order (URLs first — they may contain
# digit runs and @-signs that the later patterns would mangle). Each
# regex is valid and identical under Java regex (Spark) and RE2 (DuckDB):
# character classes and bounded quantifiers only, no lookaround.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{4,}", "<NUM>"),
)


def _duck_scrub(col: str) -> str:
    out = col
    for pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


@query("text_pii_scrub", oracle=rf"""
    SELECT doc_id,
           {_duck_scrub('text')} AS scrubbed,
           CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS INT)
             + CAST(len(regexp_extract_all(
                 regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS INT)
             + CAST(len(regexp_extract_all(
                 regexp_replace(regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
                                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}',
                                '<EMAIL>', 'g'),
                 '[0-9]{{4,}}')) AS INT) AS n_redactions
    FROM documents
""")
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (corpus-prep staple): URLs, email addresses and
    long digit runs replaced by typed placeholder tokens, with a count of
    redactions per document. Pure Catalyst map — zero shuffle, zero
    Python — so it composes into any ingest scan at 100 TB for free.
    Patterns apply in a fixed order (URL → email → digit-run) so both
    engines transform identical intermediate states."""
    d = load_table(spark, sf_dir, "documents")
    scrubbed = F.col("text")
    n_red = F.lit(0)
    for pat, repl in PII_PATTERNS:
        n_red = n_red + F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0)))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return d.select("doc_id", scrubbed.alias("scrubbed"), n_red.alias("n_redactions"))


BIGRAM_TOP_K = 30


@query("text_bigram_topk", oracle=rf"""
    WITH tok AS (
      SELECT list_transform(
               list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''),
               x -> lower(x)) AS toks
      FROM documents
    ), grams AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM tok
    )
    SELECT bigram, count(*) AS freq
    FROM grams
    GROUP BY bigram
    ORDER BY freq DESC, bigram
    LIMIT {BIGRAM_TOP_K}
""")
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocations: the BIGRAM_TOP_K most frequent lowercased word
    bigrams (deterministic tiebreak). Same two-phase shape as
    text_vocab_topk — explode multiplies rows ~token-count×, but map-side
    partial aggregation collapses each executor's stream to its distinct
    bigrams before the shuffle, and TakeOrdered fuses the top-k (no
    global sort materialized)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.transform(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != ""),
        lambda x: F.lower(x),
    )
    # Guard n<2: Spark's sequence(1, n-1) runs DESCENDING for n-1 < 1
    # (DuckDB's range(1, n) is empty there), which would index toks[0].
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "bigram")
        .limit(BIGRAM_TOP_K)
    )


@query("text_unigram_logprob", oracle=r"""
    WITH tok AS (
      SELECT doc_id, lower(unnest(list_filter(
               regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))) AS w
      FROM documents
    ),
    vocab AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
    totals AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tok,
                      count(*) AS v_sz FROM vocab)
    SELECT doc_id,
           round(avg(-ln((cnt + 1.0) / (n_tok + v_sz))), 6) AS avg_nll,
           count(*) AS n_tokens
    FROM tok JOIN vocab USING (w) CROSS JOIN totals
    GROUP BY doc_id
""")
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score (the CCNet/Gopher LM-filter shape):
    per-document mean negative log-probability under the corpus's own
    add-one-smoothed unigram model. Low avg_nll = stereotypical text,
    high = rare-token soup — the standard signal for quality bucketing
    a pretraining corpus when a real LM is too expensive to run per doc.

    Two map-side-combinable shuffles: token counts (shuffled volume =
    |vocab|, not |corpus|), then the per-doc average (keyed on doc_id).
    The model join carries no broadcast hint — AQE broadcasts the vocab
    while it fits and shuffles on the token past that; at 100 TB the
    unigram table is frequency-capped first anyway (every practical LM
    filter truncates its vocab — OOV mass is exactly what the +1
    smoothing absorbs), keeping the model bounded regardless of corpus
    size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    words = d.select("doc_id", F.explode(toks).alias("t")).select(
        "doc_id", F.lower(F.col("t")).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").alias("n_tok"), F.count(F.lit(1)).alias("v_sz")
    )
    return (
        # no broadcast hint on the vocab: AQE broadcasts it while it fits
        # (always, at fixture scale) and falls back to a shuffle keyed on
        # the token when an uncapped corpus vocabulary outgrows the limit
        # — the same gating rationale as dedup.py's BROADCAST_DOC_LIMIT
        words.join(vocab, "w")
        .join(F.broadcast(totals))
        .withColumn(
            "nll", -F.log((F.col("cnt") + 1.0) / (F.col("n_tok") + F.col("v_sz")))
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("nll"), 6).alias("avg_nll"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


@query("text_entropy", oracle=r"""
    WITH chars AS (
      SELECT doc_id, unnest(list_filter(split(text, ''), x -> x <> '')) AS ch
      FROM documents
    ),
    hist AS (
      SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
      FROM chars GROUP BY doc_id, ch
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_chars,
           round(log2(CAST(sum(c) AS DOUBLE))
                 - sum(c * log2(CAST(c AS DOUBLE))) / sum(c), 6) AS entropy
    FROM hist GROUP BY doc_id
""")
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (bits/char) — the
    classic cheap quality/gibberish signal (new r6): natural prose sits
    ~4 bits/char, base64 blobs and key-mash near the alphabet ceiling,
    template boilerplate and repeated-char runs far below. Computed as
    H = log2(n) − Σ c·log2(c) / n over the per-doc character histogram,
    which needs only per-(doc, char) counts — no per-character log.

    Scale shape: the explode never crosses the wire raw — the
    (doc_id, char) groupBy's map-side partial aggregation collapses
    each partition's characters to its local histogram, so the shuffled
    volume is bounded by docs × alphabet, not corpus characters; the
    per-doc reduce is a second map-side-combinable agg on doc_id. The
    log arithmetic is the identical double expression in both engines
    with the same round-6 absorption the unigram-logprob key uses."""
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), ""), lambda x: x != "")
        ).alias("ch"),
    )
    hist = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return hist.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_chars"),
        F.round(
            F.log2(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log2(F.col("c").cast("double")))
            / F.sum("c"),
            6,
        ).alias("entropy"),
    )


WINNOW_K = 3  # tokens per k-gram
WINNOW_W = 4  # winnowing window (grams per window)


@query("text_winnowing", oracle=rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    grams AS (
      SELECT doc_id, tk,
             list_transform(
               range(1, greatest(len(tk) - {WINNOW_K} + 1, 0) + 1),
               i -> CAST('0x' || substr(md5(
                      array_to_string(list_slice(tk, i, i + {WINNOW_K} - 1), ' ')
                    ), 1, 15) AS BIGINT)) AS gh
      FROM toks
    ),
    fps AS (
      SELECT doc_id,
             len(gh) AS n_grams,
             list_sort(list_distinct(list_transform(
               range(1, greatest(len(gh) - {WINNOW_W} + 1, 0) + 1),
               j -> list_min(list_slice(gh, j, j + {WINNOW_W} - 1))))) AS fp
      FROM grams
    )
    SELECT doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(len(fp) AS BIGINT) AS n_fps,
           md5(array_to_string(list_transform(fp, x -> CAST(x AS STRING)), ','))
             AS fp_sig
    FROM fps
""")
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every k-token gram, slide a w-gram window, keep
    each window's minimum hash; the distinct minima are the document's
    fingerprint set (guaranteed density 2/(w+1), guaranteed to share a
    fingerprint with any copy of >= w+k-1 tokens).

    Scale shape: the entire pipeline is per-row array higher-order
    functions (split -> transform -> slice -> array_min) — zero explode,
    zero shuffle, one narrow pass over the corpus; the fingerprint set
    is emitted as canonical scalars (count + md5 signature) so the gate
    can hash it. Hashes are md5-derived (cross-engine-deterministic, no
    engine hash()). A dedup/all-vs-all comparison would explode fp and
    equi-join on the fingerprint value — the same inverted-index shape
    as dedup_ngram_jaccard."""
    d = load_table(spark, sf_dir, "documents")
    tk = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    n_grams_expr = F.greatest(
        F.size(F.col("tk")) - F.lit(WINNOW_K - 1), F.lit(0)
    )
    gram_hash = lambda i: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat_ws(" ", F.slice(F.col("tk"), i, WINNOW_K))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    grams = (
        d.select("doc_id", tk.alias("tk"))
        .withColumn("n_grams", n_grams_expr)
        .withColumn(
            "gh",
            F.when(
                F.col("n_grams") > 0,
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.col("n_grams"), F.lit(1))),
                    gram_hash,
                ),
            ).otherwise(F.array().cast("array<bigint>")),
        )
    )
    n_wins = F.greatest(F.size(F.col("gh")) - F.lit(WINNOW_W - 1), F.lit(0))
    win_min = lambda j: F.array_min(F.slice(F.col("gh"), j, WINNOW_W))  # noqa: E731
    fps = grams.withColumn(
        "fp",
        F.array_sort(
            F.array_distinct(
                F.when(
                    n_wins > 0,
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(n_wins, F.lit(1))), win_min
                    ),
                ).otherwise(F.array().cast("array<bigint>"))
            )
        ),
    )
    return fps.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.size("fp").cast("bigint").alias("n_fps"),
        F.md5(
            F.array_join(F.transform(F.col("fp"), lambda x: x.cast("string")), ",")
        ).alias("fp_sig"),
    )


TFIDF_TOP = 3


@query("text_tfidf_topterms", oracle=rf"""
    WITH tok AS (
      SELECT doc_id,
             lower(unnest(list_filter(
               regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf AS BIGINT) AS tf,
             CAST(df.df AS BIGINT) AS df,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term), n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, tf, df, tfidf, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= {TFIDF_TOP}
""")
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF salient terms: the TFIDF_TOP most distinctive tokens per
    document (raw-count tf × ln(N/df) idf, deterministic term
    tie-break).

    Scale shape: explode → two groupBys that both shuffle on bounded
    keys ((doc, term) then term); the document-frequency table is
    vocabulary-sized, so it broadcasts back onto the tf table instead
    of shuffling the corpus a second time; top-k per doc is one window
    on the tf table's existing doc partitioning. tf/df stay integers —
    the only float is the final ln, rounded to its stable digits."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    tok = d.select(
        "doc_id", F.explode(toks).alias("t")
    ).select("doc_id", F.lower(F.col("t")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # bounded driver scalar (fixture metadata)
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("df").cast("bigint").alias("df"),
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP)
        .select("doc_id", "term", "tf", "df", "tfidf", "rn")
    )


@query("text_readability", oracle=r"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / nullif(n_words, 0)),
                 4) AS reading_ease,
           round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                 + 11.8 * (CAST(n_syllables AS DOUBLE) / nullif(n_words, 0))
                 - 15.59, 4) AS fk_grade
    FROM m
""")
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch–Kincaid grade per document (new r6)
    — the classic prose-complexity quality signal a pretraining corpus
    filter runs alongside length/stopword ratios (`text_quality`).
    Sentences = runs of terminal punctuation (floored at 1 for
    fragment docs); syllables = vowel-group runs in the lowercased
    text — the standard cheap heuristic (±10% of dictionary syllable
    counts on English prose; exact parity matters here only between
    engines, and both count the identical regex matches).

    Scale shape: pure per-row Catalyst regexp_count/split arithmetic —
    no shuffle, no Python, embarrassingly parallel; the three integer
    counts feed the identical double expression in both engines, so
    round-4 values hash-match exactly."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != ""
        )
    ).cast("bigint")
    n_sentences = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("bigint")
    n_syllables = F.regexp_count(
        F.lower(F.col("text")), F.lit(r"[aeiouy]+")
    ).cast("bigint")
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.try_divide(F.col("n_syllables").cast("double"), F.col("n_words"))
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(F.lit(206.835) - 1.015 * wps - 84.6 * spw, 4).alias("reading_ease"),
        F.round(0.39 * wps + 11.8 * spw - F.lit(15.59), 4).alias("fk_grade"),
    )


@query("text_code_detect", oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text)
                - length(regexp_replace(text, '[{}()\[\];=<>|&]', '', 'g'))
             AS BIGINT) AS n_symbols,
           CAST(len(regexp_extract_all(
                text, '\b(def|return|import|class|function|var|let|const|void|public|static|if|else|elif|for|while|lambda)\b'))
             AS BIGINT) AS n_keywords,
           CAST(len(regexp_extract_all(text, '(^|\n)(    |\t)')) AS BIGINT)
             AS n_indented,
           CAST((length(text)
                 - length(regexp_replace(text, '[{}()\[\];=<>|&]', '', 'g')))
                * 10000 // greatest(length(text), 1) AS BIGINT) AS symbol_bp,
           ((length(text)
             - length(regexp_replace(text, '[{}()\[\];=<>|&]', '', 'g')))
            * 10000 // greatest(length(text), 1) >= 300
            AND len(regexp_extract_all(
                text, '\b(def|return|import|class|function|var|let|const|void|public|static|if|else|elif|for|while|lambda)\b')) >= 2)
             AS looks_like_code
    FROM documents
""")
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection signals (new r6) — the corpus-routing
    classifier every LLM data pipeline runs before language ID (code
    goes to the code mix, prose to the text mix; StarCoder/The-Stack
    style filtering): per-doc symbol density ({}()[];=<>|&), programming
    keyword hits, and indented-line starts, plus a two-signal decision
    rule (symbol density ≥ 3% AND ≥ 2 keywords).

    Exactness: counts are length-difference and regexp-extract-all
    integer arithmetic; the density is held in integer basis points
    (×10000 floor-div), so there is no float anywhere and both engines
    hash-match bit-for-bit. Pure per-row Catalyst string ops: zero
    exchanges, scan-speed over 100 TB, same plan family as
    text_quality/text_langid."""
    d = load_table(spark, sf_dir, "documents")
    sym_re = r"[{}()\[\];=<>|&]"
    kw_re = (
        r"\b(def|return|import|class|function|var|let|const|void|public"
        r"|static|if|else|elif|for|while|lambda)\b"
    )
    # Spark SQL string literals consume one level of backslash escaping,
    # so patterns embedded in F.expr text need them doubled; the direct
    # Column-API calls take the raw pattern.
    sym_sql = sym_re.replace("\\", "\\\\")
    kw_sql = kw_re.replace("\\", "\\\\")
    n_chars = F.length("text")
    n_symbols = n_chars - F.length(F.regexp_replace(F.col("text"), sym_re, ""))
    n_keywords = F.size(F.expr(f"regexp_extract_all(text, '{kw_sql}', 0)"))
    n_indented = F.size(
        F.expr(r"regexp_extract_all(text, '(^|\\n)(    |\\t)', 0)")
    )
    symbol_bp = F.expr(
        f"(length(text) - length(regexp_replace(text, '{sym_sql}', '')))"
        " * 10000 DIV greatest(length(text), 1)"
    )
    return d.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        n_symbols.cast("bigint").alias("n_symbols"),
        n_keywords.cast("bigint").alias("n_keywords"),
        n_indented.cast("bigint").alias("n_indented"),
        symbol_bp.cast("bigint").alias("symbol_bp"),
        ((symbol_bp >= 300) & (n_keywords >= 2)).alias("looks_like_code"),
    )


@query("text_url_normalize", oracle=r"""
    WITH raw AS (
      SELECT doc_id,
             (CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':url'), 1, 1) AS INT) % 2 = 0
                   THEN 'https' ELSE 'HTTPS' END)
             || '://'
             || (CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':url'), 2, 1) AS INT) % 2 = 0
                      THEN 'www.' ELSE '' END)
             || source || '.Example.COM'
             || (CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':url'), 3, 1) AS INT) % 2 = 0
                      THEN ':443' ELSE '' END)
             || '/p/' || CAST(doc_id % 50 AS VARCHAR)
             || (CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':url'), 4, 1) AS INT) % 2 = 0
                      THEN '/' ELSE '' END)
             || '?'
             || (CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':url'), 5, 1) AS INT) % 2 = 0
                      THEN 'utm_source=feed&id=' || CAST(doc_id % 25 AS VARCHAR) || '&ref=home'
                      ELSE 'ref=home&id=' || CAST(doc_id % 25 AS VARCHAR) || '&utm_campaign=x' END)
             || (CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':url'), 6, 1) AS INT) % 2 = 0
                      THEN '#sec' ELSE '' END)
             AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
             regexp_replace(regexp_replace(
               lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
               ':443$', ''), '^www\.', '') AS host,
             regexp_replace(
               regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1),
               '/$', '') AS path,
             array_to_string(
               list_sort(list_filter(
                 str_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
                 x -> NOT starts_with(x, 'utm_') AND x <> '')), '&') AS q
      FROM raw
    ),
    canon AS (
      SELECT doc_id,
             scheme || '://' || host || path
               || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canonical_url
      FROM parts
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM canon GROUP BY canonical_url
""")
def text_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup rollup (new r7): the crawl-pipeline
    step that collapses scheme/host case, default ports, `www.`
    prefixes, trailing slashes, fragments, tracking params (`utm_*`)
    and query-parameter order into ONE canonical URL per resource —
    the first dedup any web corpus runs, upstream of content hashing
    (a crawl that treats `HTTPS://WWW.x.com:443/p/1/?b=2&a=1#top` and
    `https://x.com/p/1?a=1&b=2` as distinct fetches the page twice and
    trains on it twice).

    The fixture carries no URL column, so raw URLs are md5-synthesized
    per document with every messy variation the normalizer must erase
    (the join_spatial_grid in-query-synthesis precedent — both engines
    construct identical inputs, the operator under test is the
    canonicalization chain). Groups with n_docs > 1 are exactly the
    resources the variations had split.

    Scale shape: pure per-row regexp/array projection (zero exchanges
    until the final map-side-combinable groupBy on the canonical key);
    param sorting is a bounded in-row array sort, never a shuffle."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":url")))

    def bit(i: int) -> F.Column:
        return F.conv(F.substring(h, i, 1), 16, 10).cast("int") % 2

    q_variant = F.when(
        bit(5) == 0,
        F.concat(
            F.lit("utm_source=feed&id="),
            (F.col("doc_id") % 25).cast("string"),
            F.lit("&ref=home"),
        ),
    ).otherwise(
        F.concat(
            F.lit("ref=home&id="),
            (F.col("doc_id") % 25).cast("string"),
            F.lit("&utm_campaign=x"),
        )
    )
    url = F.concat(
        F.when(bit(1) == 0, F.lit("https")).otherwise(F.lit("HTTPS")),
        F.lit("://"),
        F.when(bit(2) == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Example.COM"),
        F.when(bit(3) == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(bit(4) == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        q_variant,
        F.when(bit(6) == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    raw = d.select("doc_id", url.alias("url"))
    scheme = F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1))
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1)),
            r":443$",
            "",
        ),
        r"^www\.",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+(/[^?#]*)", 1), r"/$", ""
    )
    params = F.array_join(
        F.sort_array(
            F.filter(
                F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&"),
                lambda x: (~x.startswith("utm_")) & (x != ""),
            )
        ),
        "&",
    )
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(F.lit("")),
    )
    return (
        raw.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
        )
    )


PMI_MIN_COUNT = 5   # bigram support floor
PMI_TOP_K = 50      # deterministic top-k (round-6 PMI, word tie-breaks)


@query("text_collocations_pmi", oracle=rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    flat AS (
      SELECT doc_id, unnest(tk) AS w,
             unnest(range(1, len(tk) + 1)) AS pos
      FROM toks
    ),
    uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM flat GROUP BY w),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM flat),
    bi AS (
      SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS c_ab
      FROM flat a JOIN flat b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_COUNT}
    ),
    btot AS (SELECT CAST(sum(c_ab) AS BIGINT) AS nb FROM (
      SELECT CAST(count(*) AS BIGINT) AS c_ab
      FROM flat a JOIN flat b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      GROUP BY a.w, b.w
    )),
    scored AS (
      SELECT bi.w1, bi.w2, bi.c_ab,
             round(ln(CAST(bi.c_ab AS DOUBLE) * t.n * t.n
                      / (CAST(bt.nb AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
      FROM bi
      JOIN uni u1 ON u1.w = bi.w1
      JOIN uni u2 ON u2.w = bi.w2
      CROSS JOIN tot t CROSS JOIN btot bt
    )
    SELECT w1, w2, c_ab, pmi FROM scored
    ORDER BY pmi DESC, w1, w2 LIMIT {PMI_TOP_K}
""")
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-ranked collocations (new r7): the top bigrams whose observed
    adjacency beats the independence baseline — pmi = ln(p(w1w2) /
    (p(w1)·p(w2))) — the classic phrase-mining / multiword-expression
    detector (Church & Hanks 1990), the statistical step behind
    tokenizer phrase merges and corpus fingerprinting; builds on
    text_bigram_topk's raw counts by normalizing away word frequency.

    Determinism: PMI is ONE shared double expression over exact
    integer counts, rounded to 6 (the text_entropy log-absorption
    contract); the top-k orders by (rounded pmi DESC, w1, w2) so the
    cut line is identical on any engine — the tfidf deterministic-
    term-order idiom.

    Scale shape: unigram and bigram counts are map-side-combinable
    shuffles bounded by vocabulary and vocabulary² observed; the token
    totals broadcast back as 1-row frames; top-k fuses to
    TakeOrderedAndProject. The positional self-join runs on the
    per-doc (token, pos) frame co-partitioned by doc — at 100 TB the
    adjacent-pair build is the same window-free shape
    pipeline_bpe_merges uses."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
        ).alias("tk"),
    )
    flat = toks.select(
        "doc_id", F.posexplode("tk").alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    uni = flat.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    n_tok = flat.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = flat.select("doc_id", "pos", F.col("w").alias("w1"))
    b = flat.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("w").alias("w2")
    )
    pairs = a.join(b, ["doc_id", "pos"]).groupBy("w1", "w2")
    bi_all = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    nb = bi_all.agg(F.sum("c_ab").cast("bigint").alias("nb"))
    bi = bi_all.filter(F.col("c_ab") >= PMI_MIN_COUNT)
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.round(
                F.log(
                    F.col("c_ab").cast("double")
                    * F.col("n")
                    * F.col("n")
                    / (F.col("nb").cast("double") * F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), "w1", "w2"
    ).limit(PMI_TOP_K)


@query("pipeline_dsir_logratio", oracle=r"""
    WITH tok AS (
      SELECT doc_id, source, lower(unnest(list_filter(
               regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))) AS w
      FROM documents
    ),
    tgt AS (SELECT min(source) AS ts FROM documents),
    vocab AS (
      SELECT w, CAST(count(*) AS BIGINT) AS rc,
             CAST(sum(CASE WHEN source = (SELECT ts FROM tgt)
                           THEN 1 ELSE 0 END) AS BIGINT) AS tc
      FROM tok GROUP BY w
    ),
    totals AS (SELECT CAST(sum(rc) AS BIGINT) AS r_tot,
                      CAST(sum(tc) AS BIGINT) AS t_tot,
                      count(*) AS v_sz FROM vocab)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln((v.tc + 1.0) / (tt.t_tot + tt.v_sz))
                   - ln((v.rc + 1.0) / (tt.r_tot + tt.v_sz))), 6) AS dsir_lr
    FROM tok t JOIN vocab v USING (w) CROSS JOIN totals tt
    GROUP BY t.doc_id
""")
def pipeline_dsir_logratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-ratio (new r8) — the actual data-selection
    score from Xie et al. 2023 ("Data Selection for Language Models via
    Importance Resampling"): per document, the mean per-token log ratio
    of an add-one-smoothed word model trained on the TARGET domain
    (deterministically the lexicographically-first source) against one
    trained on the RAW corpus. Positive dsir_lr = the document reads
    like the target domain; this is the importance weight a production
    DSIR run feeds into pipeline_importance_sample's acceptance
    machinery (which here uses the TTR proxy so its accept/reject path
    stays exercised on the fixture).

    Exactness: counts are exact BIGINTs through both shuffles; the only
    float is the final per-token log expression, written ONCE with the
    identical operator tree in both engine texts and averaged under
    round(·, 6) — the text_unigram_logprob recipe, driver-green since
    r4 (the sub-1e-12 relative error of a ~500-term double average is
    absorbed by the rounding).

    Scale shape: ONE token-keyed shuffle builds both models in the same
    map-side-combinable aggregate (rc and tc are conditional sums over
    the identical rows), one doc_id-keyed average — shuffled volume is
    |vocab| + |corpus tokens|, never corpus x vocab; AQE broadcasts the
    model join while the (frequency-capped, in production) vocabulary
    fits, same gating rationale as text_unigram_logprob."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    words = d.select(
        "doc_id", "source", F.explode(toks).alias("t")
    ).select("doc_id", "source", F.lower(F.col("t")).alias("w"))
    ts = d.agg(F.min("source").alias("ts"))
    words_m = words.join(F.broadcast(ts)).withColumn(
        "is_t", (F.col("source") == F.col("ts")).cast("int")
    )
    vocab = words_m.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("rc"),
        F.sum("is_t").cast("bigint").alias("tc"),
    )
    totals = vocab.agg(
        F.sum("rc").cast("bigint").alias("r_tot"),
        F.sum("tc").cast("bigint").alias("t_tot"),
        F.count(F.lit(1)).alias("v_sz"),
    )
    return (
        words.join(vocab, "w")
        .join(F.broadcast(totals))
        .withColumn(
            "lr",
            F.log((F.col("tc") + 1.0) / (F.col("t_tot") + F.col("v_sz")))
            - F.log((F.col("rc") + 1.0) / (F.col("r_tot") + F.col("v_sz"))),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("lr"), 6).alias("dsir_lr"),
        )
    )


# ---------------------------------------------------------------------------
# pipeline_gopher_rules — the named Gopher quality-filter ruleset (r9)
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000


@query("pipeline_gopher_rules", oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks,
             regexp_split_to_array(text, '\\n') AS lines
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                  AS BIGINT) AS n_wchars,
             CAST(len(regexp_extract_all(text, '#')) AS BIGINT)
               + CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT)
               AS n_symbols,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                  AS BIGINT) AS n_alpha_words,
             CAST(len(list_filter(toks, x -> list_contains(
                    ['and','in','is','of','that','the','to'], lower(x))))
                  AS BIGINT) AS n_stop,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(lines, x ->
                    regexp_matches(x, '^\\s*([-*•])'))) AS BIGINT)
               AS n_bullet,
             CAST(len(list_filter(lines, x ->
                    regexp_matches(x, '\\.\\.\\.\\s*$'))) AS BIGINT) AS n_ell
      FROM t
    )
    SELECT doc_id, n_words,
           n_words >= {GOPHER_MIN_WORDS}
             AND n_words <= {GOPHER_MAX_WORDS} AS ok_word_count,
           n_wchars >= 3 * n_words AND n_wchars <= 10 * n_words
             AS ok_mean_word_len,
           10 * n_symbols <= n_words AS ok_symbol_ratio,
           5 * n_alpha_words >= 4 * n_words AS ok_alpha_words,
           n_stop >= 2 AS ok_stopwords,
           10 * n_bullet <= 9 * n_lines AS ok_bullets,
           10 * n_ell <= 3 * n_lines AS ok_ellipsis,
           (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
             AND (n_wchars >= 3 * n_words AND n_wchars <= 10 * n_words)
             AND 10 * n_symbols <= n_words
             AND 5 * n_alpha_words >= 4 * n_words
             AND n_stop >= 2
             AND 10 * n_bullet <= 9 * n_lines
             AND 10 * n_ell <= 3 * n_lines AS keep
    FROM m
""")
def pipeline_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-filter RULESET applied as keep/drop decisions
    (new r9) — text_quality computes the raw SIGNALS; this key is the
    named filter itself (Rae et al. 2021 'Scaling Language Models'
    C.2, as reused by MassiveText/RefinedWeb/Dolma): word count in
    [{GOPHER_MIN_WORDS}, {GOPHER_MAX_WORDS}], mean word length in
    [3, 10], symbol-to-word ratio (# and ellipsis) <= 0.1, >=80% of
    words containing an alphabetic character, >=2 stop words, <=90%
    bullet-started lines, <=30% ellipsis-ended lines — one boolean per
    rule plus the conjunction, so a pipeline can audit WHICH rule
    killed a document, not just that one did.

    Exactness: every ratio threshold is cross-multiplied into exact
    integer comparisons (mean word length in [3,10] becomes
    3·words <= chars <= 10·words; 10% becomes 10·symbols <= words) —
    the key contains NO float, so decisions are bit-deterministic by
    construction in both engines.

    Scale shape: a pure per-row map over documents (zero shuffle,
    embarrassingly parallel at 100 TB) — token/line arrays never leave
    the row."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    lines = F.split(F.col("text"), r"\n")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    m = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n_wchars"),
        (
            F.size(F.regexp_extract_all(F.col("text"), F.lit("#"), F.lit(0)))
            + F.size(
                F.regexp_extract_all(F.col("text"), F.lit(r"\.\.\."), F.lit(0))
            )
        ).cast("bigint").alias("n_symbols"),
        F.size(
            F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
        ).cast("bigint").alias("n_alpha_words"),
        F.size(
            F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x)))
        ).cast("bigint").alias("n_stop"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(
            F.filter(lines, lambda x: x.rlike(r"^\s*([-*•])"))
        ).cast("bigint").alias("n_bullet"),
        F.size(
            F.filter(lines, lambda x: x.rlike(r"\.\.\.\s*$"))
        ).cast("bigint").alias("n_ell"),
    )
    ok_wc = (F.col("n_words") >= GOPHER_MIN_WORDS) & (
        F.col("n_words") <= GOPHER_MAX_WORDS
    )
    ok_mwl = (F.col("n_wchars") >= 3 * F.col("n_words")) & (
        F.col("n_wchars") <= 10 * F.col("n_words")
    )
    ok_sym = 10 * F.col("n_symbols") <= F.col("n_words")
    ok_alpha = 5 * F.col("n_alpha_words") >= 4 * F.col("n_words")
    ok_stop = F.col("n_stop") >= 2
    ok_bul = 10 * F.col("n_bullet") <= 9 * F.col("n_lines")
    ok_ell = 10 * F.col("n_ell") <= 3 * F.col("n_lines")
    return m.select(
        "doc_id",
        "n_words",
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        ok_bul.alias("ok_bullets"),
        ok_ell.alias("ok_ellipsis"),
        (ok_wc & ok_mwl & ok_sym & ok_alpha & ok_stop & ok_bul & ok_ell)
        .alias("keep"),
    )


# ---------------------------------------------------------------------------
# pipeline_tokenizer_fertility — per-language tokenizer cost profile (r9)
# ---------------------------------------------------------------------------

FERTILITY_CHUNK = 4  # deterministic subword proxy: ceil(len/4) pieces/word


@query("pipeline_tokenizer_fertility", oracle=f"""
    WITH t AS (
      SELECT lang,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
      FROM documents
    ),
    m AS (
      SELECT lang, n_bytes,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_aggregate(list_transform(toks,
                    x -> (length(x) + {FERTILITY_CHUNK - 1})
                         // {FERTILITY_CHUNK}), 'sum') AS BIGINT) AS n_sub
      FROM t
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(n_sub) AS BIGINT) AS n_subwords,
           CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
           round(CAST(sum(n_sub) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE), 8)
             AS fertility,
           round(CAST(sum(n_bytes) AS DOUBLE) / CAST(sum(n_sub) AS DOUBLE), 8)
             AS bytes_per_subword
    FROM m GROUP BY lang
""")
def pipeline_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility profile (new r9) — the
    multilingual budgeting table every training-mix decision reads:
    subwords per word (fertility) and UTF-8 bytes per subword, by
    language. High-fertility languages cost more sequence length per
    word; bytes/subword exposes the CJK-vs-Latin compression asymmetry
    (zh packs ~3 bytes/char into few 'words'). The subword count is a
    deterministic proxy tokenizer — each word splits into
    ceil(len/{FERTILITY_CHUNK}) pieces, the fixed-chunk stand-in for a
    real BPE (whose learned merges live in pipeline_bpe_tokenize; this
    key is the corpus-level COST AGGREGATE, cheap enough to run on
    every ingest batch).

    Exactness: word/subword/byte counts are exact BIGINTs (byte length
    via octet_length over the UTF-8 blob in both engines — never char
    length); the two ratios are single double divisions of exact
    integer totals, rounded once.

    Scale shape: pure per-row map + one map-side-combinable groupBy on
    the |languages|-bounded key. Nothing shuffles at document grain."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    m = d.select(
        "lang",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.size(toks).cast("bigint").alias("n_words"),
        F.aggregate(
            F.transform(
                toks,
                lambda x: (
                    (F.length(x) + (FERTILITY_CHUNK - 1))
                    .cast("bigint")
                    / FERTILITY_CHUNK
                ).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n_sub"),
    )
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_sub").cast("bigint").alias("n_subwords"),
        F.sum("n_bytes").cast("bigint").alias("n_bytes"),
        F.round(
            F.sum("n_sub").cast("double") / F.sum("n_words").cast("double"), 8
        ).alias("fertility"),
        F.round(
            F.sum("n_bytes").cast("double") / F.sum("n_sub").cast("double"), 8
        ).alias("bytes_per_subword"),
    )


# ---------------------------------------------------------------------------
# text_perplexity_bigram — corpus bigram-LM negative log-likelihood (r9)
# ---------------------------------------------------------------------------


@query("text_perplexity_bigram", oracle=r"""
    WITH docs AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    tok AS (
      SELECT doc_id, CAST(r.i AS BIGINT) AS pos,
             toks[CAST(r.i AS INT)] AS w
      FROM docs, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) r
    ),
    pairs AS (
      SELECT doc_id, pos, w,
             lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w_prev
      FROM tok
    ),
    big AS (
      SELECT w_prev, w, CAST(count(*) AS BIGINT) AS c2
      FROM pairs WHERE w_prev IS NOT NULL GROUP BY 1, 2
    ),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM tok GROUP BY 1
    ),
    vsz AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
    scored AS (
      SELECT p.doc_id,
             -ln(CAST(b.c2 + 1 AS DOUBLE) / CAST(u.c1 + vsz.v AS DOUBLE))
               AS nll
      FROM pairs p
      JOIN big b ON b.w_prev = p.w_prev AND b.w = p.w
      JOIN uni u ON u.w = p.w_prev
      CROSS JOIN vsz
      WHERE p.w_prev IS NOT NULL
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_scored,
           round(avg(nll), 6) AS avg_nll
    FROM scored GROUP BY doc_id
""")
def text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model perplexity scoring (new r9) — the CCNet /
    Wikipedia-LM quality filter shape: train an add-1-smoothed bigram
    model ON THE CORPUS ITSELF (one pass), then score every document's
    average negative log-likelihood under it. Low NLL = the document
    looks like the corpus (fluent); high NLL = boilerplate, word salad,
    wrong language — the standard perplexity-bucket filter for training
    data (perplexity = e^avg_nll, monotone in the reported score;
    thresholds operate on NLL directly, so the key emits the score
    whose last-digit determinism is provable and leaves the exp to the
    consumer).

    Exactness: bigram/unigram/vocab counts are exact BIGINTs; each
    position's NLL is one ln() of a single exact-integer ratio
    (c2+1)/(c1+V) — identical double inputs in both engines — and the
    per-document average reorders at most ~1e-13 relative error,
    absorbed by round(…,6) (the text_unigram_logprob precedent, one
    model order up).

    Scale shape: the model build is one token-keyed map-side-combinable
    groupBy at bigram grain (|model| ≤ corpus bigrams, Heaps-bounded);
    scoring joins positions against the model on the bigram key —
    shuffled volume is |corpus tokens| + |model|, never corpus×model.
    The per-doc position window is bounded by document length (the
    chunking pre-step bounds it in production)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    tok = d.select("doc_id", F.posexplode(toks).alias("pos0", "w")).select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "w"
    )
    from pyspark.sql.window import Window

    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    pairs = tok.select(
        "doc_id", "pos", "w", F.lag("w").over(w_doc).alias("w_prev")
    )
    big = (
        pairs.filter(F.col("w_prev").isNotNull())
        .groupBy("w_prev", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    )
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    vsz = uni.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    scored = (
        pairs.filter(F.col("w_prev").isNotNull())
        .join(big, ["w_prev", "w"])
        .join(uni.withColumnRenamed("w", "w_prev"), "w_prev")
        .crossJoin(F.broadcast(vsz))
        .select(
            "doc_id",
            (
                -F.log(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.col("v")).cast("double")
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
    )


# ---------------------------------------------------------------------------
# pipeline_data_card — one-row dataset summary card (r9)
# ---------------------------------------------------------------------------


@query("pipeline_data_card", oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks,
             md5(text) AS h
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang, source, n_bytes, h,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(len(list_filter(toks, x -> list_contains(
                    ['and','in','is','of','that','the','to'], lower(x))))
                  AS BIGINT) AS n_stop
      FROM t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
           CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_exact_dups,
           round(CAST(count(*) - count(DISTINCT h) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 8) AS dup_rate,
           CAST(sum(CASE WHEN n_words >= {GOPHER_MIN_WORDS}
                          AND n_words <= {GOPHER_MAX_WORDS}
                          AND n_stop >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality_pass,
           round(CAST(sum(n_words) AS DOUBLE) / CAST(count(*) AS DOUBLE), 8)
             AS mean_words_per_doc,
           round(CAST(sum(n_bytes) AS DOUBLE)
                 / CAST(sum(n_words) AS DOUBLE), 8) AS bytes_per_word
    FROM m
""")
def pipeline_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset summary card (new r9) — the governance artifact
    (HF dataset card / Datasheets-for-Datasets header) a pipeline
    stamps on every published snapshot: corpus counts, language/source
    cardinalities, token and byte totals, exact-duplicate rate
    (md5-content), and the fraction passing the core quality screen
    (word-count bounds + stopword floor — the cheap subset of
    pipeline_gopher_rules that needs no line analysis). One scan,
    every stat from the same pass, so the card is CONSISTENT — stats
    sampled from different pipeline stages never are.

    Exactness: counts/distincts are exact; the three ratios are single
    double divisions of exact BIGINTs.

    Scale shape: one map-side-combinable full-scan aggregate; the two
    COUNT(DISTINCT)s over low-cardinality columns expand in the same
    aggregate, and the content-hash distinct is the dedup_exact
    shuffle — the one genuinely keyed cost, shared shape with that
    key."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    m = d.select(
        "lang",
        "source",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.md5("text").alias("h"),
        F.size(toks).cast("bigint").alias("n_words"),
        F.size(
            F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x)))
        ).cast("bigint").alias("n_stop"),
    )
    n = F.count(F.lit(1))
    dups = n - F.countDistinct("h")
    return m.agg(
        n.cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_bytes").cast("bigint").alias("n_bytes"),
        dups.cast("bigint").alias("n_exact_dups"),
        F.round(dups.cast("double") / n.cast("double"), 8).alias("dup_rate"),
        F.sum(
            F.when(
                (F.col("n_words") >= GOPHER_MIN_WORDS)
                & (F.col("n_words") <= GOPHER_MAX_WORDS)
                & (F.col("n_stop") >= 2),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_quality_pass"),
        F.round(
            F.sum("n_words").cast("double") / n.cast("double"), 8
        ).alias("mean_words_per_doc"),
        F.round(
            F.sum("n_bytes").cast("double") / F.sum("n_words").cast("double"), 8
        ).alias("bytes_per_word"),
    )


# ---------------------------------------------------------------------------
# text_script_ratio — Unicode script composition per document (r9)
# ---------------------------------------------------------------------------


@query("text_script_ratio", oracle=r"""
    WITH m AS (
      SELECT doc_id, lang,
             CAST(length(text) AS BIGINT) AS n_chars_s,
             CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT)
               AS n_latin,
             CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))
                  AS BIGINT) AS n_cjk,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
             CAST(len(regexp_extract_all(text, '[ \t\n\f\r]')) AS BIGINT)
               AS n_space
      FROM documents
    )
    SELECT doc_id, lang, n_chars_s, n_latin, n_cjk, n_digit, n_space,
           CAST(n_chars_s - n_latin - n_cjk - n_digit - n_space AS BIGINT)
             AS n_other,
           round(CAST(n_latin AS DOUBLE) / CAST(n_chars_s AS DOUBLE), 8)
             AS latin_ratio,
           round(CAST(n_cjk AS DOUBLE) / CAST(n_chars_s AS DOUBLE), 8)
             AS cjk_ratio,
           CASE WHEN 2 * n_cjk > n_latin THEN 'cjk' ELSE 'latin' END
             AS dominant_script
    FROM m WHERE n_chars_s > 0
""")
def text_script_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode SCRIPT composition per document (new r9) — the
    pre-language-ID triage a multilingual pipeline runs first: script
    ranges are deterministic codepoint classes (no model), so routing
    CJK text away from a Latin-stopword quality filter is a pure
    per-row map. Counts Latin letters, CJK unified ideographs, digits
    and whitespace; everything else (punctuation, other scripts) is the
    remainder — the triage signal for mixed-script spam too. The
    complement to text_langid (which needs a tokenizer and marker
    lists; this key needs neither — CJK has no whitespace tokens, which
    is exactly why script detection must come first).

    Exactness: pure integer codepoint-class counts — Java regex and
    RE2 agree on explicit Unicode ranges (the \\u4e00/\\x{{4e00}}
    spelling differs per engine, the CLASS is identical); ratios are
    single double divisions. The dominant-script decision is
    cross-multiplied integer comparison (2·cjk > latin — CJK carries
    ~2× information density per char, the weighting langid uses).

    Scale shape: zero-shuffle per-row map over documents."""
    d = load_table(spark, sf_dir, "documents")

    def count_re(pat: str):
        return F.size(
            F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))
        ).cast("bigint")

    m = d.select(
        "doc_id",
        "lang",
        F.length("text").cast("bigint").alias("n_chars_s"),
        count_re("[A-Za-z]").alias("n_latin"),
        count_re("[一-鿿]").alias("n_cjk"),
        count_re("[0-9]").alias("n_digit"),
        # spelled explicitly and identically in both texts: Java's \s is
        # [ \t\n\x0B\f\r] while RE2's is [\t\n\f\r ] — a document with a
        # vertical tab (U+000B) would diverge under the shorthand
        count_re("[ \t\n\f\r]").alias("n_space"),
    ).filter(F.col("n_chars_s") > 0)
    return m.select(
        "doc_id",
        "lang",
        "n_chars_s",
        "n_latin",
        "n_cjk",
        "n_digit",
        "n_space",
        (
            F.col("n_chars_s")
            - F.col("n_latin")
            - F.col("n_cjk")
            - F.col("n_digit")
            - F.col("n_space")
        ).cast("bigint").alias("n_other"),
        F.round(
            F.col("n_latin").cast("double") / F.col("n_chars_s").cast("double"),
            8,
        ).alias("latin_ratio"),
        F.round(
            F.col("n_cjk").cast("double") / F.col("n_chars_s").cast("double"), 8
        ).alias("cjk_ratio"),
        F.when(2 * F.col("n_cjk") > F.col("n_latin"), "cjk")
        .otherwise("latin")
        .alias("dominant_script"),
    )


# ---------------------------------------------------------------------------
# pipeline_length_buckets — dynamic-batching padding-waste audit (r10)
# ---------------------------------------------------------------------------


@query("pipeline_length_buckets", oracle=r"""
    WITH lens AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, n_tok,
             CASE WHEN n_tok <= 1 THEN CAST(1 AS BIGINT)
                  ELSE CAST(1 AS BIGINT)
                       << CAST(length(bin(n_tok - 1)) AS INT)
             END AS bucket
      FROM lens WHERE n_tok > 0
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(bucket * count(*) AS BIGINT) AS padded_tokens,
           round(1.0 - CAST(sum(n_tok) AS DOUBLE)
                     / CAST(bucket * count(*) AS DOUBLE), 8) AS pad_waste
    FROM bucketed GROUP BY bucket
""")
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit (new r10): assign each document to
    the next power-of-two token-length bucket and report, per bucket,
    the padding waste a fixed-shape batcher pays (padded − real tokens)
    — the accounting that decides between bucketed batching and
    pipeline_pack_sequences' packing for a training run (buckets keep
    attention masks trivial; packing eliminates waste but mixes docs).

    Exactness: token counts are the shared whitespace recipe; the
    power-of-two bucket is a pure INTEGER bit trick — bucket =
    1 << bit_length(n−1), spelled via bin() string length identically
    in both engines (no log2, no floats anywhere near the decision);
    waste is one double division of exact integers.

    Scale shape: one zero-shuffle per-row map + one map-side-combinable
    agg over ≤ ~20 bucket keys."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    lens = d.select(
        F.size(toks).cast("bigint").alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    # F.shiftleft only takes a literal shift amount; the SQL form
    # accepts an expression in both engines
    bucket = F.when(F.col("n_tok") <= 1, F.lit(1).cast("bigint")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n_tok - 1)) AS INT))")
    )
    b = lens.select("n_tok", bucket.alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        (F.col("bucket") * F.count(F.lit(1))).cast("bigint").alias(
            "padded_tokens"
        ),
        F.round(
            F.lit(1.0)
            - F.sum("n_tok").cast("double")
            / (F.col("bucket") * F.count(F.lit(1))).cast("double"),
            8,
        ).alias("pad_waste"),
    )


# ---------------------------------------------------------------------------
# pipeline_train_quality_filter — in-engine perceptron training (r10)
# ---------------------------------------------------------------------------

PERC_ROUNDS = 8  # fixed batch-gradient rounds (deterministic by design)


def _perc_feats_sql() -> str:
    return r"""feats AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(list_filter(
                    regexp_split_to_array(lower(trim(text)), '\s+'),
                    x -> x <> ''))) AS BIGINT) AS n_uniq,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_dig
      FROM documents
    )"""


def _perc_round_sql(rounds: int) -> str:
    parts = ["w0 AS (SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS t, "
             "CAST(0 AS BIGINT) AS u, CAST(0 AS BIGINT) AS d)"]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""
    w{r} AS (
      SELECT w.b + coalesce(s.db, 0) AS b, w.t + coalesce(s.dt, 0) AS t,
             w.u + coalesce(s.du, 0) AS u, w.d + coalesce(s.dd, 0) AS d
      FROM w{p} w LEFT JOIN (
        SELECT CAST(sum(f.y) AS BIGINT) AS db,
               CAST(sum(f.y * f.n_tok) AS BIGINT) AS dt,
               CAST(sum(f.y * f.n_uniq) AS BIGINT) AS du,
               CAST(sum(f.y * f.n_dig) AS BIGINT) AS dd
        FROM feats f, w{p} w
        WHERE f.y * (w.b + w.t * f.n_tok + w.u * f.n_uniq
                     + w.d * f.n_dig) <= 0
      ) s ON true
    ),
    e{r} AS (
      SELECT CAST({r} AS BIGINT) AS r, CAST(count(*) AS BIGINT) AS err
      FROM feats f, w{r} w
      WHERE f.y * (w.b + w.t * f.n_tok + w.u * f.n_uniq
                   + w.d * f.n_dig) <= 0
    )""")
    return ",".join(parts)


def _perc_pocket_sql(rounds: int) -> str:
    """Pocket selection: the round (1-based) with the LOWEST training
    error, earliest on ties, and that round's weights via a CASE over
    the single-row round CTEs."""
    errs = " UNION ALL ".join(f"SELECT r, err FROM e{r}"
                              for r in range(1, rounds + 1))
    case = {}
    for col in ("b", "t", "u", "d"):
        case[col] = "CASE best.r " + " ".join(
            f"WHEN {r} THEN w{r}.{col}" for r in range(1, rounds + 1)
        ) + " END"
    joins = ", ".join(f"w{r}" for r in range(1, rounds + 1))
    return f"""
    errs AS ({errs}),
    best AS (SELECT r, err FROM errs ORDER BY err, r LIMIT 1),
    pocket AS (
      SELECT best.r AS best_round, best.err AS n_misclassified,
             {case['b']} AS b, {case['t']} AS t,
             {case['u']} AS u, {case['d']} AS d
      FROM best, {joins}
    )"""


@query("pipeline_train_quality_filter", oracle=f"""
    WITH {_perc_feats_sql()},
    {_perc_round_sql(PERC_ROUNDS)},
    {_perc_pocket_sql(PERC_ROUNDS)}
    SELECT p.b AS w_bias, p.t AS w_ntok, p.u AS w_nuniq, p.d AS w_ndig,
           p.best_round, p.n_misclassified,
           CAST((SELECT count(*) FROM feats) AS BIGINT) AS n_docs
    FROM pocket p
""")
def pipeline_train_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a linear document classifier INSIDE the engine (new r10) —
    the fastText-style quality-filter training loop a data pipeline
    runs before filtering at scale, here as a POCKET batch-gradient
    perceptron predicting lang='en' from integer count features (token
    count, distinct-token count, digit count, bias). {PERC_ROUNDS}
    fixed synchronous rounds: each round ONE map-side-combinable
    aggregate over the corpus computes Σ y·x over currently-
    misclassified rows plus the round's training error, and the
    4-integer weight vector updates DRIVER-SIDE (metadata-scale state —
    the events_markov_stationary precedent: iterating 4 ints through
    Spark jobs would pay ~20 jobs of scheduling floor for arithmetic
    that is exact and free in Python). The POCKET keeps the
    lowest-error round's weights (earliest on ties) — the Gallant
    fix that makes the perceptron useful on non-separable data, where
    the raw update rule oscillates. Output: pocketed weights, the round
    they came from, and their training error — the artifact a
    deployment ships to the filter stage.

    Exactness: everything is BIGINT — features are count recipes shared
    with the text_* family, the margin test y·(w·x) ≤ 0 is integer, the
    update is an integer sum, and pocket selection orders by exact
    (err, round), so the unrolled-CTE oracle replays training
    bit-exactly (no learning-rate floats: lr = 1, the classical
    perceptron).

    Scale shape: per round one scan + one 5-column conditional agg
    (map-side combinable, no shuffle beyond the final combine); weights
    broadcast back as literals in the next round's predicate. At 100 TB
    each round is exactly one pass — the standard distributed batch
    gradient shape."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    toks_l = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    feats = d.select(
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1))
        .cast("bigint")
        .alias("y"),
        F.size(toks).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(toks_l)).cast("bigint").alias("n_uniq"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[0-9]"), F.lit(0))
        ).cast("bigint").alias("n_dig"),
    ).localCheckpoint(eager=False)

    w = [0, 0, 0, 0]  # (bias, n_tok, n_uniq, n_dig)

    def margin(wv):
        return F.col("y") * (
            F.lit(wv[0])
            + F.lit(wv[1]) * F.col("n_tok")
            + F.lit(wv[2]) * F.col("n_uniq")
            + F.lit(wv[3]) * F.col("n_dig")
        )

    # One aggregate per round, not two (r12 fusion): round r's update
    # sums over mis(w_{r-1}) and round r−1's pocket error count share
    # the SAME predicate, so conditional aggregation over the full
    # feats pass replaces the separate err-count job. n_docs is an
    # UNCONDITIONED count column in round 1's aggregate (ADVICE r12:
    # the earlier "round-1 misclassified = everything under w_0 = 0"
    # identity silently undercounts if a NULL text makes margin NULL;
    # the same single pass now counts all rows explicitly).
    # 2·R+2 sequential jobs → R+2, identical integers.
    best = None  # (err, round, weights)
    n_docs = 0
    for r in range(1, PERC_ROUNDS + 1):
        mis = margin(w) <= 0
        row = feats.agg(
            F.sum(F.when(mis, F.col("y"))).alias("db"),
            F.sum(F.when(mis, F.col("y") * F.col("n_tok"))).alias("dt"),
            F.sum(F.when(mis, F.col("y") * F.col("n_uniq"))).alias("du"),
            F.sum(F.when(mis, F.col("y") * F.col("n_dig"))).alias("dd"),
            F.count(F.when(mis, F.lit(1))).alias("n"),
            F.count(F.lit(1)).alias("n_all"),
        ).collect()[0]
        if r == 1:
            n_docs = row["n_all"]
        else:
            err_prev = row["n"]
            if best is None or err_prev < best[0]:
                best = (err_prev, r - 1, list(w))
        w = [
            w[0] + (row["db"] or 0),
            w[1] + (row["dt"] or 0),
            w[2] + (row["du"] or 0),
            w[3] + (row["dd"] or 0),
        ]
    err_last = feats.filter(margin(w) <= 0).count()
    if best is None or err_last < best[0]:
        best = (err_last, PERC_ROUNDS, list(w))
    err, rnd, wb = best
    return spark.createDataFrame(
        [(wb[0], wb[1], wb[2], wb[3], rnd, err, n_docs)],
        "w_bias bigint, w_ntok bigint, w_nuniq bigint, w_ndig bigint, "
        "best_round bigint, n_misclassified bigint, n_docs bigint",
    )


# ---------------------------------------------------------------------------
# pipeline_dataset_diff — snapshot diff audit (r10)
# ---------------------------------------------------------------------------

DIFF_MOD = 17  # md5(doc_id) % 17 selects the synthetic v2 mutations


@query("pipeline_dataset_diff", oracle=f"""
    WITH v1 AS (SELECT doc_id, text FROM documents),
    sel AS (
      SELECT doc_id, text,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
                  AS BIGINT) % {DIFF_MOD} AS m
      FROM documents
    ),
    v2 AS (
      SELECT doc_id,
             CASE WHEN m IN (1, 2) THEN text || ' [edited]' ELSE text END
               AS text
      FROM sel WHERE m <> 0
      UNION ALL
      SELECT doc_id + 10000000, text FROM sel WHERE m = 3
    ),
    d AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN md5(a.text) <> md5(b.text) THEN 'changed'
                  ELSE 'unchanged' END AS class,
             CAST(coalesce(octet_length(encode(b.text)), 0)
                  - coalesce(octet_length(encode(a.text)), 0) AS BIGINT)
               AS byte_delta
      FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
    )
    SELECT class, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(byte_delta) AS BIGINT) AS byte_delta
    FROM d GROUP BY class
""")
def pipeline_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset snapshot DIFF (new r10) — the audit a versioned corpus
    runs between releases: classify every document as added / removed /
    changed / unchanged between two snapshots and account the byte
    drift per class (the data-card delta that catches a silently
    truncated shard or a filter that suddenly drops a language). The
    second snapshot is synthesized deterministically from the first
    (md5-mod selections: drop, edit-marker, append-with-offset) so the
    key is self-contained; a real deployment points v2 at the next
    release's table — the diff plan is identical (the
    scan_time_travel storage layer provides exactly such snapshots).

    Exactness: classification compares md5 content hashes (the one blob
    hashing both engines share); byte deltas are octet_length BIGINTs.

    Scale shape: one full-outer equi-join on doc_id (the snapshots'
    natural key — at 100 TB both sides bucket by doc_id and the join
    co-locates), then a 4-key rollup. Content hashing is a per-row map
    pushed into the join projection; no text ever shuffles beyond the
    join itself."""
    v1 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sel = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
            .cast("bigint")
            % DIFF_MOD
        ).alias("m"),
    )
    v2 = (
        sel.filter(F.col("m") != 0)
        .select(
            "doc_id",
            F.when(
                F.col("m").isin(1, 2), F.concat(F.col("text"), F.lit(" [edited]"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            sel.filter(F.col("m") == 3).select(
                (F.col("doc_id") + 10000000).alias("doc_id"), "text"
            )
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    d = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer").select(
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.md5(F.col("a.text")) != F.md5(F.col("b.text")), "changed")
        .otherwise("unchanged")
        .alias("class"),
        (
            F.coalesce(F.octet_length(F.col("b.text")), F.lit(0))
            - F.coalesce(F.octet_length(F.col("a.text")), F.lit(0))
        )
        .cast("bigint")
        .alias("byte_delta"),
    )
    return d.groupBy("class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("byte_delta").cast("bigint").alias("byte_delta"),
    )


# ---------------------------------------------------------------------------
# text_kneser_ney_bigram — interpolated KN-smoothed bigram LM head (r11)
# ---------------------------------------------------------------------------

KN_DISCOUNT = "0.75"  # the standard absolute discount, as a shared literal
KN_TOP = 20           # emit the corpus's KN_TOP highest-count bigrams

# Shared VERBATIM by both engine texts (the _OLS_PROJ_SQL doctrine):
# interpolated Kneser-Ney over exact integer counts —
#   P(w|v) = (c(vw) − D)/c(v·) + D·N1+(v·)/c(v·) · N1+(·w)/N_types.
# Identical expression text => identical IEEE evaluation order =>
# bit-identical doubles on both sides. No ln/exp — the decision-free
# probability head of the LM, exact until one round.
_KN_PROJ = (
    f"round((CAST(c AS DOUBLE) - {KN_DISCOUNT}) / CAST(cv AS DOUBLE)"
    f" + {KN_DISCOUNT} * CAST(n1v AS DOUBLE) / CAST(cv AS DOUBLE)"
    f" * (CAST(n1w AS DOUBLE) / CAST(ntypes AS DOUBLE)), 6)"
)


@query("text_kneser_ney_bigram", oracle=rf"""
    WITH docs AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    tok AS (
      SELECT doc_id, CAST(r.i AS BIGINT) AS pos,
             toks[CAST(r.i AS INT)] AS w
      FROM docs, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) r
    ),
    pairs AS (
      SELECT w AS w2, lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS v
      FROM tok
    ),
    counts AS (
      SELECT v, w2 AS w, CAST(count(*) AS BIGINT) AS c
      FROM pairs WHERE v IS NOT NULL GROUP BY 1, 2
    ),
    ctx AS (
      SELECT v, sum(c) AS cv, CAST(count(*) AS BIGINT) AS n1v
      FROM counts GROUP BY v
    ),
    cont AS (SELECT w, CAST(count(*) AS BIGINT) AS n1w FROM counts GROUP BY w),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS ntypes FROM counts),
    top AS (
      SELECT v, w, c,
             row_number() OVER (ORDER BY c DESC, v, w) AS rk
      FROM counts
    )
    SELECT t.v, t.w, t.c AS c_vw,
           {_KN_PROJ} AS p_kn
    FROM top t JOIN ctx USING (v) JOIN cont USING (w) CROSS JOIN tot
    WHERE t.rk <= {KN_TOP}
""")
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities (new r11) for the
    corpus's KN_TOP most frequent bigrams — the smoothing that
    text_perplexity_bigram's add-one baseline is always compared
    against, and the LM head a data-quality pipeline uses to score
    fluency without a neural model. The KN continuation count N1+(·w)
    ("how many contexts does w complete?") is THE distinguishing term:
    'francisco' is frequent but follows only 'san', so KN correctly
    refuses to predict it in fresh contexts — a pure artifact of the
    distinct-counting the engine already does.

    Exactness: every count (c(vw), c(v·), N1+(v·), N1+(·w), N_types)
    is an exact BIGINT from two groupBys; the probability is ONE
    shared-verbatim double expression (_KN_PROJ, the _OLS_PROJ_SQL
    doctrine) with the discount D=0.75 embedded as an identical
    literal — no ln/exp, no iteration, no RNG. The top-KN_TOP cut
    orders by (c DESC, v, w) — (v, w) is the group key, so the order
    is total and the cut engine-identical.

    Scale shape: tokenize is a per-doc map; bigram counts are one
    map-side-combinable shuffle keyed on (v, w); the context /
    continuation / type rollups are vocabulary-bounded aggregates of
    the COUNTS table (never the corpus); the global top-k is Spark's
    TakeOrderedAndProject (per-partition heads, no single-partition
    window); the final joins attach ≤|vocab|-row frames to KN_TOP
    rows. Raw text is read exactly once."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            lambda x: x != "",
        ).alias("toks"),
    )
    pairs = d.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("toks"), i).alias("v"),
                    F.element_at(F.col("toks"), i + 1).alias("w"),
                ),
            )
        ).alias("p")
    ).select("p.v", "p.w")
    counts = pairs.groupBy("v", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ctx = counts.groupBy("v").agg(
        F.sum("c").alias("cv"), F.count(F.lit(1)).cast("bigint").alias("n1v")
    )
    cont = counts.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1w")
    )
    tot = counts.agg(F.count(F.lit(1)).cast("bigint").alias("ntypes"))
    top = counts.orderBy(F.desc("c"), "v", "w").limit(KN_TOP)
    return (
        top.join(F.broadcast(ctx), "v")
        .join(F.broadcast(cont), "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "v",
            "w",
            F.col("c").alias("c_vw"),
            F.expr(_KN_PROJ).alias("p_kn"),
        )
    )


# ---------------------------------------------------------------------------
# text_rake_keywords — RAKE keyphrase extraction, generated stoplist (r11)
# ---------------------------------------------------------------------------

RAKE_STOP_K = 10    # generated stoplist size: top-K corpus words by count
RAKE_SCALE = 10**6  # word score deg/freq carried as (deg*SCALE)//freq
RAKE_TOP = 15       # emitted keyphrases


@query("text_rake_keywords", oracle=rf"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '') AS ws
      FROM documents
    ),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p, lower(ws[CAST(i AS INT)]) AS w
      FROM toks, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) _l
    ),
    wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY w),
    stop AS (
      SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY c DESC, w) AS r FROM wc)
      WHERE r <= {RAKE_STOP_K}
    ),
    marked AS (
      SELECT pos.doc_id, pos.p, pos.w,
             CASE WHEN s.w IS NOT NULL THEN 1 ELSE 0 END AS st
      FROM pos LEFT JOIN stop s ON s.w = pos.w
    ),
    grp AS (
      SELECT doc_id, p, w, st,
             sum(st) OVER (PARTITION BY doc_id ORDER BY p) AS g
      FROM marked
    ),
    pw AS (SELECT doc_id, g, p, w FROM grp WHERE st = 0),
    phr AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS plen,
             string_agg(w, ' ' ORDER BY p) AS phrase
      FROM pw GROUP BY 1, 2
    ),
    wstat AS (
      SELECT pw.w, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(phr.plen) AS BIGINT) AS deg
      FROM pw JOIN phr ON phr.doc_id = pw.doc_id AND phr.g = pw.g
      GROUP BY pw.w
    ),
    ps AS (
      SELECT phr.phrase, phr.plen, phr.doc_id, phr.g,
             CAST(sum((ws.deg * {RAKE_SCALE}) // ws.freq) AS BIGINT)
               AS iscore
      FROM pw
      JOIN phr ON phr.doc_id = pw.doc_id AND phr.g = pw.g
      JOIN wstat ws ON ws.w = pw.w
      GROUP BY 1, 2, 3, 4
    ),
    ag AS (
      SELECT phrase, plen, CAST(count(*) AS BIGINT) AS n_occur,
             min(iscore) AS iscore
      FROM ps GROUP BY 1, 2
    )
    SELECT phrase, plen, n_occur, iscore,
           round(CAST(iscore AS DOUBLE) / {RAKE_SCALE}.0, 6) AS score
    FROM ag ORDER BY iscore DESC, phrase LIMIT {RAKE_TOP}
""")
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (new r11) — Rapid Automatic Keyword
    Extraction (Rose et al. 2010): candidate phrases are maximal runs
    of tokens between stopword delimiters; each word scores
    degree/frequency (degree = Σ length of phrases containing it,
    rewarding words that co-occur in long candidates); a phrase scores
    the sum of its member word scores. The stoplist is GENERATED from
    the corpus — the top-{RAKE_STOP_K} words by total count (tie →
    lexicographic), the frequency-generated-stoplist variant §1.2.3 of
    the RAKE chapter proposes — because the synthetic fixture lacks a
    natural-language stopword vocabulary.

    Exactness: positions, the stoplist cut, phrase grouping (running
    count of delimiters per doc), freq, deg, and the phrase score are
    ALL exact integers — the word score is carried as
    (deg·{RAKE_SCALE})//freq with floor division (DuckDB `//`, Spark
    `DIV` — the markov-stationary device), summed as BIGINT, so the
    final global ORDER BY (iscore DESC, phrase) and top-{RAKE_TOP} cut
    are integer-decided; the emitted double is one division by the
    same literal.

    Scale shape: tokenize + posexplode is embarrassingly parallel;
    the stoplist is a row_number over the VOCABULARY-sized count
    rollup (the sanctioned domain-bounded unpartitioned window);
    phrase grouping is one per-doc window pass; wstat/ps are
    vocabulary- and phrase-keyed joins — postings-shaped, never
    doc x doc. The final is a global top-k (TakeOrderedAndProject)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    pos = d.select(
        "doc_id", F.posexplode(toks).alias("p0", "w0")
    ).select(
        "doc_id",
        (F.col("p0") + 1).cast("bigint").alias("p"),
        F.lower("w0").alias("w"),
    )
    wc = pos.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    stop = (
        wc.withColumn(
            "r", F.row_number().over(W.orderBy(F.desc("c"), "w"))
        )
        .filter(F.col("r") <= RAKE_STOP_K)
        .select("w")
    )
    marked = pos.join(
        F.broadcast(stop.withColumn("st1", F.lit(1))), "w", "left"
    ).select(
        "doc_id", "p", "w", F.coalesce("st1", F.lit(0)).alias("st")
    )
    grp = marked.withColumn(
        "g",
        F.sum("st").over(
            W.partitionBy("doc_id")
            .orderBy("p")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    # NOT pinned (r12 negative): pw feeds three consumers and the
    # initial plan shows the tokenize→window pipeline 3× (16 scans /
    # 34 exchanges) — but AQE stage reuse dedups the identical
    # subtrees at runtime, and an interleaved pin-vs-nopin A/B
    # measured the checkpoint WORSE (2.08 vs 1.85 s min-of-3): the
    # materialization barrier costs more than the (already reused)
    # recomputation. See OPTIMIZATION_r12.md.
    pw = grp.filter(F.col("st") == 0).select("doc_id", "g", "p", "w")
    phr = pw.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "w"))),
                lambda s: s.w,
            ),
            " ",
        ).alias("phrase"),
    )
    wstat = (
        pw.join(phr.select("doc_id", "g", "plen"), ["doc_id", "g"])
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
    )
    ps = (
        pw.join(phr, ["doc_id", "g"])
        .join(F.broadcast(wstat), "w")
        .withColumn("wscore", F.expr(f"(deg * {RAKE_SCALE}) DIV freq"))
        .groupBy("phrase", "plen", "doc_id", "g")
        .agg(F.sum("wscore").cast("bigint").alias("iscore"))
    )
    ag = ps.groupBy("phrase", "plen").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occur"),
        F.min("iscore").alias("iscore"),
    )
    return (
        ag.orderBy(F.desc("iscore"), "phrase")
        .limit(RAKE_TOP)
        .select(
            "phrase",
            "plen",
            "n_occur",
            "iscore",
            F.round(F.col("iscore").cast("double") / RAKE_SCALE, 6).alias(
                "score"
            ),
        )
    )


# ---------------------------------------------------------------------------
# text_zipf_fit — Zipf rank-frequency exponent by log-log OLS (r11)
# ---------------------------------------------------------------------------

ZIPF_MAX_RANK = 1000  # fit over the top-K ranks: keeps the fold input
                      # bounded when the vocabulary is corpus-sized


@query("text_zipf_fit", oracle=rf"""
    WITH pos AS (
      SELECT lower(unnest(list_filter(
               regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))) AS w
      FROM documents
    ),
    wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY w),
    rk AS (
      SELECT w, c,
             CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS r
      FROM wc
    ),
    pts AS (
      SELECT r, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM rk WHERE r <= {ZIPF_MAX_RANK}
    ),
    lst AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             list_transform(list_sort(list({{'r': r, 'x': x, 'y': y}})),
                            s -> {{'x': s.x, 'y': s.y}}) AS ps
      FROM pts
    ),
    mo AS (
      SELECT n,
             list_reduce(list_transform(ps, s -> s.x), (a, b) -> a + b)
               AS sx,
             list_reduce(list_transform(ps, s -> s.y), (a, b) -> a + b)
               AS sy,
             list_reduce(list_transform(ps, s -> s.x * s.y), (a, b) -> a + b)
               AS sxy,
             list_reduce(list_transform(ps, s -> s.x * s.x), (a, b) -> a + b)
               AS sx2
      FROM lst
    )
    SELECT n AS n_ranks,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sx2 - sx * sx), 6) AS zipf_slope,
           round((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sx2 - sx * sx)) * sx)
                 / CAST(n AS DOUBLE), 6) AS zipf_intercept
    FROM mo
""")
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit (new r11) — the corpus-statistics
    baseline (Zipf 1949): regress ln(freq) on ln(rank) over the top
    {ZIPF_MAX_RANK} vocabulary ranks; natural language lands near
    slope −1, and a corpus whose slope drifts far from it (too flat =
    template spam, too steep = vocabulary collapse) fails the data
    card. Complements text_vocab_topk (which reports the head) and
    pipeline_data_card with the one-number distributional summary.

    Exactness: counts and ranks are exact integers (rank ties broken
    lexicographically); x/y are ln of exact integers (the
    perplexity-precedent 1-ulp class), and ALL four moment sums fold
    over the list sorted by rank — both engines add identical doubles
    in identical order (the events_chisq device), so slope/intercept
    are bit-stable under any partitioning.

    Scale shape: tokenize + one vocabulary groupBy (map-side
    combinable); the rank window runs on the vocabulary rollup and the
    fit reads only the top-{ZIPF_MAX_RANK} rows — the fold input is
    LITERAL-bounded even when the vocabulary is corpus-sized."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    wc = (
        d.select(F.explode(F.transform(toks, lambda x: F.lower(x))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    rk = wc.withColumn(
        "r", F.row_number().over(W.orderBy(F.desc("c"), "w")).cast("bigint")
    )
    pts = rk.filter(F.col("r") <= ZIPF_MAX_RANK).select(
        "r",
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )

    def fold(expr):
        return F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("r"), F.col("x"), F.col("y")))
                ),
                expr,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    mo = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        fold(lambda s: s["x"]).alias("sx"),
        fold(lambda s: s["y"]).alias("sy"),
        fold(lambda s: s["x"] * s["y"]).alias("sxy"),
        fold(lambda s: s["x"] * s["x"]).alias("sx2"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sx2") - F.col("sx") * F.col("sx")
    )
    return mo.select(
        F.col("n").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / nd, 6).alias(
            "zipf_intercept"
        ),
    )


# ---------------------------------------------------------------------------
# text_burrows_delta — stylometric source distance (r11)
# ---------------------------------------------------------------------------

DELTA_TOP_W = 20  # marker vocabulary: top-W corpus words (the Delta norm)

# Shared VERBATIM from f(source, w, f) onward: per-word mean/std across
# sources, z-scores, pairwise mean |z diff|. Every float accumulation is
# a running window ordered by an integer/string key (the survival_km
# device) so both engines add identical doubles in identical order.
_DELTA_TAIL_SQL = """st AS (
      SELECT w, source, f,
             sum(f) OVER (PARTITION BY w ORDER BY source
                          ROWS UNBOUNDED PRECEDING) AS rsf,
             sum(f * f) OVER (PARTITION BY w ORDER BY source
                              ROWS UNBOUNDED PRECEDING) AS rsf2,
             row_number() OVER (PARTITION BY w ORDER BY source) AS rn,
             CAST(count(*) OVER (PARTITION BY w) AS BIGINT) AS k
      FROM f
    ),
    stw AS (
      SELECT w, k, rsf / k AS mu,
             CASE WHEN rsf2 / k - (rsf / k) * (rsf / k) > 0
                  THEN sqrt(rsf2 / k - (rsf / k) * (rsf / k))
                  ELSE 0.0 END AS sd
      FROM st WHERE rn = k
    ),
    z AS (
      SELECT f.source, f.w, (f.f - s.mu) / s.sd AS z
      FROM f JOIN stw s ON s.w = f.w
      WHERE s.sd > 0
    ),
    dz AS (
      SELECT a.source AS source_a, b.source AS source_b, a.w,
             abs(a.z - b.z) AS d
      FROM z a JOIN z b ON b.w = a.w AND b.source > a.source
    ),
    acc AS (
      SELECT source_a, source_b, w,
             sum(d) OVER (PARTITION BY source_a, source_b ORDER BY w
                          ROWS UNBOUNDED PRECEDING) AS rs,
             row_number() OVER (PARTITION BY source_a, source_b
                                ORDER BY w) AS rn,
             CAST(count(*) OVER (PARTITION BY source_a, source_b)
                  AS BIGINT) AS nw
      FROM dz
    )
    SELECT source_a, source_b, nw AS n_words,
           round(rs / nw, 6) AS delta
    FROM acc WHERE rn = nw"""


@query("text_burrows_delta", oracle=rf"""
    WITH pos AS (
      SELECT source, lower(unnest(list_filter(
               regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))) AS w
      FROM documents
    ),
    tot AS (SELECT source, CAST(count(*) AS BIGINT) AS t
            FROM pos GROUP BY 1),
    wcx AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY 1),
    topw AS (
      SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY c DESC, w) AS r FROM wcx)
      WHERE r <= {DELTA_TOP_W}
    ),
    csw AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM pos JOIN topw USING (w) GROUP BY 1, 2
    ),
    sp AS (SELECT t.source, t.t, tw.w FROM tot t CROSS JOIN topw tw),
    f AS (
      SELECT sp.source, sp.w,
             CAST(coalesce(csw.c, 0) AS DOUBLE) / CAST(sp.t AS DOUBLE) AS f
      FROM sp LEFT JOIN csw
        ON csw.source = sp.source AND csw.w = sp.w
    ),
    {_DELTA_TAIL_SQL}
""")
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every pair of document sources (new r11)
    — THE stylometric attribution distance (Burrows 2002; Evert et al.
    2017's evaluation is the modern reference): for the top-{DELTA_TOP_W}
    corpus marker words, z-score each source's relative frequency
    across sources, then Delta(a,b) = mean_w |z_aw − z_bw|. Low Delta
    = same 'authorial fingerprint' — in a training-data pipeline this
    is the source-level style-duplicate detector (two crawls of the
    same generator score near 0) complementing the document-level
    dedup family.

    Exactness: token counts and the marker cut are exact integers;
    relative frequencies are one division each; every cross-row float
    sum (per-word Σf, Σf², per-pair Σ|dz|) is a RUNNING window ordered
    by a total key (the survival_km accumulation device) evaluated
    inside one shared-verbatim SQL tail — identical addition order,
    identical IEEE. Zero-variance markers are excluded (sd > 0) in the
    shared text, and the variance expression is CASE-guarded against
    tiny FP-cancellation negatives (r11 ADVICE: DuckDB sqrt raises Out
    of Range where Spark returns NaN — divergent failure modes without
    the guard); n_words on the row makes the exclusion auditable.

    Scale shape: tokenize + two map-side-combinable rollups; the spine,
    z-table, and pair join all live on (|sources| x {DELTA_TOP_W})
    rows — marker-bounded, not corpus-bounded. Pairwise volume is
    |sources|²·W, the stylometry literature's own working size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    pos = d.select(
        "source", F.explode(F.transform(toks, lambda x: F.lower(x))).alias("w")
    )
    tot = pos.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    wcx = pos.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    from pyspark.sql import Window as W

    topw = (
        wcx.withColumn(
            "r", F.row_number().over(W.orderBy(F.desc("c"), "w"))
        )
        .filter(F.col("r") <= DELTA_TOP_W)
        .select("w")
    )
    csw = (
        pos.join(F.broadcast(topw), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    sp = tot.crossJoin(F.broadcast(topw))
    fdf = sp.join(csw, ["source", "w"], "left").select(
        "source",
        "w",
        (
            F.coalesce("c", F.lit(0)).cast("double")
            / F.col("t").cast("double")
        ).alias("f"),
    )
    fdf.createOrReplaceTempView("_delta_f")
    return spark.sql(
        f"WITH f AS (SELECT * FROM _delta_f), {_DELTA_TAIL_SQL}"
    )


# ---------------------------------------------------------------------------
# text_mtld — Measure of Textual Lexical Diversity (r11)
# ---------------------------------------------------------------------------

MTLD_THR_NUM = 18   # TTR threshold 0.72 as the exact rational 18/25, so
MTLD_THR_DEN = 25   # the factor-completion decision is pure integer
MTLD_BUCKETS = 64   # applyInPandas salt (the hmm_viterbi lesson)


@query("text_mtld", oracle=rf"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '') AS ws
      FROM documents
    ),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS k, lower(ws[CAST(i AS INT)]) AS w
      FROM toks, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) _l
    ),
    nu AS (SELECT doc_id, CAST(max(k) AS BIGINT) AS n FROM pos GROUP BY 1),
    walk AS (
      SELECT doc_id, k, [w] AS seen, CAST(1 AS BIGINT) AS cur_n,
             CAST(0 AS BIGINT) AS factors
      FROM pos WHERE k = 1
      UNION ALL
      SELECT p.doc_id, p.k,
             CASE WHEN {MTLD_THR_DEN} * CAST(len(
                        CASE WHEN list_contains(s.seen, p.w) THEN s.seen
                             ELSE list_append(s.seen, p.w) END) AS BIGINT)
                       < {MTLD_THR_NUM} * (s.cur_n + 1)
                  THEN CAST([] AS VARCHAR[])
                  ELSE CASE WHEN list_contains(s.seen, p.w) THEN s.seen
                            ELSE list_append(s.seen, p.w) END END,
             CASE WHEN {MTLD_THR_DEN} * CAST(len(
                        CASE WHEN list_contains(s.seen, p.w) THEN s.seen
                             ELSE list_append(s.seen, p.w) END) AS BIGINT)
                       < {MTLD_THR_NUM} * (s.cur_n + 1)
                  THEN 0 ELSE s.cur_n + 1 END,
             CASE WHEN {MTLD_THR_DEN} * CAST(len(
                        CASE WHEN list_contains(s.seen, p.w) THEN s.seen
                             ELSE list_append(s.seen, p.w) END) AS BIGINT)
                       < {MTLD_THR_NUM} * (s.cur_n + 1)
                  THEN s.factors + 1 ELSE s.factors END
      FROM walk s JOIN pos p ON p.doc_id = s.doc_id AND p.k = s.k + 1
    )
    SELECT doc_id, n_tokens, factors, tail_types, tail_tokens,
           CASE WHEN mtld_den IS NULL OR mtld_den = 0 THEN NULL
                ELSE CAST(mtld_num AS DOUBLE) / CAST(mtld_den AS DOUBLE)
           END AS mtld
    FROM (
      SELECT w.doc_id, nu.n AS n_tokens, w.factors,
             CAST(len(w.seen) AS BIGINT) AS tail_types,
             w.cur_n AS tail_tokens,
             CASE WHEN w.cur_n = 0 AND w.factors > 0 THEN nu.n
                  ELSE nu.n * 7 * w.cur_n END AS mtld_num,
             CASE WHEN w.cur_n = 0 AND w.factors > 0 THEN w.factors
                  ELSE 7 * w.cur_n * w.factors
                       + 25 * (w.cur_n - CAST(len(w.seen) AS BIGINT))
             END AS mtld_den
      FROM walk w JOIN nu ON nu.doc_id = w.doc_id AND w.k = nu.n)
""")
def text_mtld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTLD — Measure of Textual Lexical Diversity per document (new
    r11; McCarthy & Jarvis 2010): walk the token stream keeping a
    running type-token ratio; every time TTR falls below 0.72 a
    'factor' completes and the window resets; MTLD = tokens / factors
    with the unfinished tail contributing fractionally as
    (1−TTR_tail)/(1−0.72). THE length-robust diversity metric (plain
    TTR decays with document length, which is why pipeline quality
    filters can't use it) — complements text_entropy (distributional)
    and text_repetition (local) with the sequential-diversity read.
    Forward pass only (stated; the bidirectional mean doubles cost for
    a fixture-invisible refinement).

    Exactness: the factor decision is 25·types < 18·tokens — exact
    integer (0.72 = 18/25); factors, tail types/tokens are exact
    BIGINTs emitted for audit; the final MTLD is ONE shared-text
    double expression, with the n/factors and undefined (all-distinct
    tail, zero factors) edge cases handled identically integer-side.

    Scale shape (Spark): salt-bucketed applyInPandas (the hmm_viterbi
    lesson — {MTLD_BUCKETS} Arrow groups, not one per doc); each doc's
    walk is O(tokens) with a vocabulary-bounded set. The oracle states
    the identical walk as a recursive CTE advancing one token per
    step, carrying the factor's seen-type LIST as state (depth =
    max doc length; all docs advance in the same recursion)."""
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    # Row-set contract (r11 ADVICE): the oracle's recursive walk seeds
    # only docs with a k=1 token, so an empty/whitespace-only document
    # produces no oracle row — drop zero-token docs here too so both
    # engines agree on the row set even if a fixture ever contains one.
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.transform(toks, lambda x: F.lower(x)).alias("ws"),
            (F.col("doc_id") % MTLD_BUCKETS).alias("bucket"),
        )
        .filter(F.size("ws") > 0)
    )

    def _mtld(pdf):
        import pandas as pd

        out: dict[str, list] = {
            "doc_id": [], "n_tokens": [], "factors": [],
            "tail_types": [], "tail_tokens": [], "mtld": [],
        }
        for _, row in pdf.iterrows():
            ws = list(row["ws"])
            seen: set = set()
            cur_n = 0
            factors = 0
            for w in ws:
                seen.add(w)
                cur_n += 1
                if MTLD_THR_DEN * len(seen) < MTLD_THR_NUM * cur_n:
                    seen, cur_n, factors = set(), 0, factors + 1
            n = len(ws)
            if cur_n == 0 and factors > 0:
                mtld = n / factors
            else:
                den = 7 * cur_n * factors + 25 * (cur_n - len(seen))
                # raw IEEE division of exact ints (no round(): MTLD hits
                # exact half-way 6-decimal values, the known cross-engine
                # round() hazard) — identical numerator/denominator gives
                # the identical double in both engines
                mtld = None if den == 0 else (n * 7 * cur_n) / den
            out["doc_id"].append(int(row["doc_id"]))
            out["n_tokens"].append(n)
            out["factors"].append(factors)
            out["tail_types"].append(len(seen))
            out["tail_tokens"].append(cur_n)
            out["mtld"].append(mtld)
        return pd.DataFrame(out)

    return d.groupBy("bucket").applyInPandas(
        _mtld,
        "doc_id bigint, n_tokens bigint, factors bigint, "
        "tail_types bigint, tail_tokens bigint, mtld double",
    )


# ---------------------------------------------------------------------------
# text_lexicon_score — wordlist-based document scoring (r12)
# ---------------------------------------------------------------------------

# Domain wordlists as shared literals (the mechanism — not the lists —
# is the deliverable: this is the blocklist/allowlist scorer every
# training-data filter runs, from bad-word filters to domain-quality
# lexicons; swap the lists per deployment). Chosen from the fixture's
# own vocabulary so both tails fire.
LEX_POS = ("fast", "small", "batch", "vector", "merge")
LEX_NEG = ("slow", "big", "dup", "spill", "skew")


def _lex_in_sql(words: tuple) -> str:
    return ", ".join(f"'{w}'" for w in words)


@query("text_lexicon_score", oracle=rf"""
    WITH pos AS (
      SELECT source, lower(unnest(list_filter(
               regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))) AS w
      FROM documents
    ),
    hits AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN w IN ({_lex_in_sql(LEX_POS)})
                           THEN 1 ELSE 0 END) AS BIGINT) AS pos_hits,
             CAST(sum(CASE WHEN w IN ({_lex_in_sql(LEX_NEG)})
                           THEN 1 ELSE 0 END) AS BIGINT) AS neg_hits
      FROM pos GROUP BY source
    )
    SELECT source, n_tokens, pos_hits, neg_hits,
           CAST(pos_hits - neg_hits AS BIGINT) AS net,
           CAST(pos_hits - neg_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             AS score
    FROM hits
""")
def text_lexicon_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based source scoring (new r12) — the wordlist mechanism
    behind every blocklist/allowlist pipeline filter (bad-word
    filters, domain-quality lexicons, LIWC-style category counters):
    count per-source hits of a positive and a negative wordlist and
    emit the normalized net score. The lists are configuration — the
    registered key pins the MECHANISM (set-membership aggregation over
    the token stream) with fixture-derived lists so the decision paths
    actually fire; text_pii_scrub covers the regex-class sibling.

    Exactness: hit counts and token totals are exact BIGINTs; the
    score is the RAW quotient of exact integers (the recorded
    raw-quotient lesson), identical in both texts.

    Scale shape: one tokenize + one map-side-combinable groupBy to
    |sources| rows; the IN-list evaluates as a literal hash set inside
    codegen — zero joins, zero shuffles beyond the rollup."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    pos = d.select(
        "source",
        F.explode(F.transform(toks, lambda x: F.lower(x))).alias("w"),
    )
    hits = pos.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("w").isin(*LEX_POS), 1).otherwise(0))
        .cast("bigint")
        .alias("pos_hits"),
        F.sum(F.when(F.col("w").isin(*LEX_NEG), 1).otherwise(0))
        .cast("bigint")
        .alias("neg_hits"),
    )
    return hits.select(
        "source",
        "n_tokens",
        "pos_hits",
        "neg_hits",
        (F.col("pos_hits") - F.col("neg_hits")).cast("bigint").alias("net"),
        (
            (F.col("pos_hits") - F.col("neg_hits")).cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("score"),
    )
