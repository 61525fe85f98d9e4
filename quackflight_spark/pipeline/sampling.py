"""Deterministic sampling & splitting — training-data-pipeline operators
(beyond-reference, BASELINE.json north star; the reference's only sampling
is `ORDER BY RANDOM() LIMIT 1`, examples/flight_watch.py:53-57).

A training pipeline needs *reproducible* selections: the same document
must land in the same split on every run, on any cluster, regardless of
partitioning — otherwise eval sets leak into training between runs. RNG
sampling (F.rand, TABLESAMPLE) can't give that, so these operators derive
the selection from an md5 hash of the row key:

- split_train_test    90/5/5 train/val/test assignment, pure map (no
                      shuffle at any scale — the split ships with the row)
- sample_stratified   per-stratum keep-rates (downsample a dominant
                      language/source class), also a pure map
- sample_quota        at most N docs per source, best-first (quality-
                      ordered window) — one shuffle on the quota key

The md5-bucket trick is the same cross-engine-deterministic device as
pipeline/dedup.py's _h60, so every operator here is exactly oracle-checked
(value-hash, not rows-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

SPLIT_BUCKETS = 100
TRAIN_PCT, VAL_PCT = 90, 5      # remainder → test
STRATA_RATES = {"en": 50, "de": 20}  # keep-% per lang; others 10
QUOTA_PER_SOURCE = 40


def hash_bucket(key: Column, buckets: int = SPLIT_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars of the
    key's string form, mod buckets. Engine-independent (no Spark hash()/
    DuckDB hash() involved) and key-only — independent of partitioning,
    row order, and cluster size."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )


def _duck_bucket(expr: str, buckets: int = SPLIT_BUCKETS) -> str:
    return f"(CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8) AS BIGINT) % {buckets})"


@query("split_train_test", oracle=f"""
    SELECT doc_id,
           CASE WHEN {_duck_bucket('doc_id')} < {TRAIN_PCT} THEN 'train'
                WHEN {_duck_bucket('doc_id')} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
""")
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 90/5/5 split assignment keyed on doc_id.

    Pure map: the bucket is a function of the row alone, so the plan has
    zero exchanges and the assignment is identical at sf0.001 and 100 TB,
    under repartitioning, and across engine versions. This is the property
    RNG-based splits (F.rand, randomSplit) cannot give."""
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    return d.select(
        "doc_id",
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


_RATE_SQL = " ".join(
    f"WHEN lang = '{lang}' THEN {rate}" for lang, rate in STRATA_RATES.items()
)


@query("sample_stratified", oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_duck_bucket('doc_id')} <
          (CASE {_RATE_SQL} ELSE 10 END)
""")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsample: per-language keep-rates
    (en 50%, de 20%, others 10%) via the hash bucket — the reproducible
    form of df.sampleBy. Pure map again: rebalancing a skewed corpus
    costs no shuffle; expected rates hold per stratum because md5 buckets
    are uniform over doc_id."""
    d = load_table(spark, sf_dir, "documents")
    rate = None
    for lang, r in STRATA_RATES.items():
        branch = rate if rate is not None else F
        rate = branch.when(F.col("lang") == lang, F.lit(r))
    rate = rate.otherwise(F.lit(10))
    return d.filter(hash_bucket(F.col("doc_id")) < rate).select("doc_id", "lang", "source")


@query("sample_quota", oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(rn AS INT) AS rn
    FROM scored WHERE rn <= {QUOTA_PER_SOURCE}
""")
def sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota: keep the QUOTA_PER_SOURCE longest documents of
    each source (deterministic doc_id tiebreak). One shuffle on source.
    At 100 TB a hot source is a skew risk — the window needs all of a
    source's rows on one reducer only up to the quota; pre-filtering with
    an approximate per-source n_chars cutoff (quantile sketch) bounds the
    shuffled volume when sources are huge."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QUOTA_PER_SOURCE)
        .select("doc_id", "source", "n_chars", "rn")
    )


RESERVOIR_K = 100  # fixed-size sample (eval subsets, spot-check panels)


@query("sample_reservoir", oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {RESERVOIR_K}
""")
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE uniform sample (r6): the k lowest md5(key) rows — the
    deterministic equivalent of reservoir sampling. sample_percent gives
    a fixed RATE (its output grows with the corpus); eval subsets,
    human-review panels and canary sets need exactly k rows regardless
    of corpus size, reproducibly. Ranking by the key's hash is uniform
    over keys, stable across runs/partitionings/engines, and — unlike a
    true reservoir — needs no sequential state: it distributes as a
    per-partition top-k + k-row reduce (TakeOrderedAndProject), one
    pass, no global sort, no driver bottleneck beyond the k-row result
    itself."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(RESERVOIR_K)
        .select("doc_id", "lang", "source")
    )


MIX_WEIGHTS = {"src0": 4, "src1": 2}  # relative target weight; others 1
MIX_BUDGET_DIV = 2                    # total budget = corpus size // 2
MIX_BP = 10_000                       # keep-rate resolution (basis points)

_MIX_W_SQL = " ".join(
    f"WHEN source = '{s}' THEN {w}" for s, w in MIX_WEIGHTS.items()
)


@query("pipeline_mix_domains", oracle=f"""
    WITH counts AS (
      SELECT source, count(*) AS cnt,
             (CASE {_MIX_W_SQL} ELSE 1 END) AS w
      FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source,
             least({MIX_BP}, ({MIX_BP} * (sum(cnt) OVER () // {MIX_BUDGET_DIV}) * w)
                             // (sum(w) OVER () * cnt)) AS rate_bp
      FROM counts
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {_duck_bucket('d.doc_id', MIX_BP)} < r.rate_bp
""")
def pipeline_mix_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted domain mixture: downsample each `source` so the sampled
    corpus approaches target mixture weights (src0:4, src1:2, others:1)
    within a total budget of corpus_size // MIX_BUDGET_DIV documents.
    The data-mixing step of a training pipeline (e.g. upweighting
    curated sources against web crawl) expressed deterministically.

    Per-source keep-rate r_s = min(1, budget * w_s / (Σw * n_s)), held in
    integer basis points so Spark and DuckDB floor identically, then
    applied through the md5 bucket — same-doc-same-decision on every run.

    Shape at 100 TB: one map-side-combined count per source (output rows
    = #domains, tiny), a window over that tiny frame, then a broadcast
    join back onto the corpus — the full scan happens exactly once and
    the filter is a pure map. No shuffle touches the wide rows."""
    d = load_table(spark, sf_dir, "documents")
    w_col = None
    for s, wgt in MIX_WEIGHTS.items():
        branch = w_col if w_col is not None else F
        w_col = branch.when(F.col("source") == s, F.lit(wgt))
    w_col = w_col.otherwise(F.lit(1))
    counts = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("w", w_col)
    )
    rates = counts.select(
        "source",
        F.least(
            F.lit(MIX_BP),
            F.expr(
                f"({MIX_BP} * (sum(cnt) OVER () div {MIX_BUDGET_DIV}) * w)"
                f" div (sum(w) OVER () * cnt)"
            ),
        ).alias("rate_bp"),
    )
    return (
        d.join(F.broadcast(rates), on="source")
        .filter(hash_bucket(F.col("doc_id"), MIX_BP) < F.col("rate_bp"))
        .select("doc_id", "source")
    )


TEMP_BUDGET_DIV = 2  # temperature-mix budget = corpus size // 2


@query("pipeline_mix_temperature", oracle=f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS cnt FROM documents
      GROUP BY source
    ),
    wts AS (
      SELECT source, cnt,
             CAST(floor(sqrt(CAST(cnt AS DOUBLE))) AS BIGINT) AS sq
      FROM counts
    ),
    rates AS (
      SELECT source, cnt,
             least({MIX_BP},
               ({MIX_BP} * ((SELECT sum(cnt) FROM wts) // {TEMP_BUDGET_DIV})
                * sq) // ((SELECT sum(sq) FROM wts) * cnt)) AS rate_bp
      FROM wts
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE {_duck_bucket('d.doc_id', MIX_BP)} < r.rate_bp
""")
def pipeline_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing at α = 0.5 (new r6) — the
    multilingual/multi-domain sampling recipe from mBERT/XLM-R/mT5:
    instead of hand-set weights (pipeline_mix_domains), each source's
    share of the budget is proportional to count^α, which UPSAMPLES the
    tail relative to its natural share and damps the head — the
    standard fix for web-crawl domination in training mixes.

    Determinism without libm drift: α = 0.5 means the weight is
    isqrt(count) — floor(sqrt(double)) where IEEE-754 sqrt is CORRECTLY
    ROUNDED by spec, so both engines floor the identical value; from
    there everything is the integer basis-point arithmetic of
    mix_domains (exact // chains, md5-bucket keep decision per doc —
    same-doc-same-decision on every run and any partitioning).

    Scale shape: identical to mix_domains — one tiny per-source count
    agg, the rate computation on |domains| rows, one broadcast join
    back, filter as a pure map. The 100 TB scan happens exactly once;
    no shuffle touches the wide rows."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    wts = counts.withColumn(
        "sq", F.floor(F.sqrt(F.col("cnt").cast("double"))).cast("bigint")
    )
    rates = wts.select(
        "source",
        F.least(
            F.lit(MIX_BP).cast("bigint"),
            F.expr(
                f"({MIX_BP} * (sum(cnt) OVER () div {TEMP_BUDGET_DIV}) * sq)"
                f" div (sum(sq) OVER () * cnt)"
            ),
        ).alias("rate_bp"),
    )
    return (
        d.join(F.broadcast(rates), on="source")
        .filter(hash_bucket(F.col("doc_id"), MIX_BP) < F.col("rate_bp"))
        .select("doc_id", "source")
    )


@query("pipeline_shard_balance", oracle=f"""
    WITH assign AS (
      SELECT {_duck_bucket('doc_id', 16)} AS shard,
             CAST(length(text) AS BIGINT) AS n_bytes
      FROM documents
    ),
    per AS (
      SELECT CAST(shard AS INT) AS shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_bytes) AS BIGINT) AS total_bytes
      FROM assign GROUP BY shard
    )
    SELECT shard, n_docs, total_bytes,
           CAST(max(n_docs) OVER () AS BIGINT) AS max_docs,
           CAST(min(n_docs) OVER () AS BIGINT) AS min_docs,
           round(CAST(max(total_bytes) OVER () AS DOUBLE)
                 / CAST(min(total_bytes) OVER () AS DOUBLE), 8)
             AS byte_skew_ratio
    FROM per
""")
def pipeline_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance audit (new r6) — the governance check on
    pipeline_shuffle_shards' output before a training run: per-shard
    document and byte totals plus the global max/min skew ratio. A
    skewed shard is a straggler for the whole epoch (data loaders
    consume shards in parallel), so this report is the gate between
    'shuffled' and 'shippable'; the md5 assignment should keep the
    ratio near 1 and a regression here means the sharding key went
    pathological (e.g. sharding on a low-cardinality column).

    Exactness: counts and byte totals are exact integers; the skew
    ratio is one double division of two exact integers. One map-side-
    combinable groupBy to |shards| rows; the window runs over that
    bounded frame."""
    d = load_table(spark, sf_dir, "documents")
    per = (
        d.select(
            hash_bucket(F.col("doc_id"), 16).cast("int").alias("shard"),
            F.length("text").cast("bigint").alias("n_bytes"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        )
    )
    wall = W.partitionBy()
    return per.select(
        "shard",
        "n_docs",
        "total_bytes",
        F.max("n_docs").over(wall).cast("bigint").alias("max_docs"),
        F.min("n_docs").over(wall).cast("bigint").alias("min_docs"),
        F.round(
            F.max("total_bytes").over(wall).cast("double")
            / F.min("total_bytes").over(wall).cast("double"),
            8,
        ).alias("byte_skew_ratio"),
    )


@query("pipeline_normalize_zscore", oracle="""
    WITH stats AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s,
             CAST(sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars)
                  AS DECIMAL(38,0)) AS q
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           round(CAST(t.n * d.n_chars - t.s AS DOUBLE)
                 / sqrt(CAST(t.n * t.q - CAST(t.s AS DECIMAL(38,0)) * t.s
                             AS DOUBLE)), 8) AS z
    FROM documents d JOIN stats t USING (source)
""")
def pipeline_normalize_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature standardization (new r6) — z-scoring a feature
    within its group (doc length within source), the ML-prep step the
    PySpark docs' canonical GROUPED_MAP pandas-UDF example computes
    (SNIPPETS.md [3]: `df.groupby(id).apply(normalize)`). Spark-first
    contrast, deliberately NOT that UDF: the grouped-map form shuffles
    EVERY ROW into per-group Python workers and holds whole groups in
    pandas memory — at 100 TB a group is not a DataFrame. Here the
    group stats are one map-side-combinable aggregate (|groups| rows),
    broadcast back, and z is a pure codegen projection — the full scan
    never shuffles and no Python runs.

    Exactness: the naive (x−μ)/σ is a float-summation trap; algebra
    clears both divisions: z = (n·x − S) / √(n·Q − S²) with S = Σx and
    Q = Σx² as exact DECIMAL(38,0) sums — two exact integers into one
    IEEE sqrt and one division, bit-identical cross-engine (population
    σ; n·Q ≤ 1e9·(1e5)²·1e9 headroom analysis as agg_skew_kurtosis)."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.sum(F.col("n_chars").cast("decimal(38,0)") * F.col("n_chars"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    return d.join(F.broadcast(stats), "source").select(
        "doc_id",
        "source",
        "n_chars",
        F.round(
            (F.col("n") * F.col("n_chars") - F.col("s")).cast("double")
            / F.sqrt(
                (
                    F.col("n") * F.col("q")
                    - F.col("s").cast("decimal(38,0)") * F.col("s")
                ).cast("double")
            ),
            8,
        ).alias("z"),
    )


N_EVAL = 20  # fixture eval set = doc_id < 20


@query("pipeline_decontaminate", oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(
        list_transform(range(1, len(regexp_split_to_array(trim(text), '\\s+'))),
          i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
               regexp_split_to_array(trim(text), '\\s+')[i+1])
      )) AS shingle
      FROM documents
    )
    SELECT t.doc_id, count(*) AS n_shared
    FROM sh t JOIN sh e ON t.shingle = e.shingle
    WHERE t.doc_id >= {N_EVAL} AND e.doc_id < {N_EVAL}
    GROUP BY t.doc_id
""")
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag every training document that shares
    at least one word-bigram shingle with the held-out eval set (fixture
    eval = doc_id < N_EVAL), with the shared-shingle count as evidence.

    The GPT-3/Pile-style n-gram overlap check expressed as one inverted-
    index join: explode distinct shingles on both sides, equi-join on the
    shingle (shuffle keyed on shingle — never doc×doc), count per train
    doc. At 100 TB the eval side is small by definition, so Catalyst
    broadcasts it and the train corpus streams through map-side; a
    stop-shingle cutoff (drop shingles above a document-frequency bound)
    caps the blow-up from boilerplate n-grams shared by everything.
    """
    from quackflight_spark.pipeline.dedup import doc_shingles

    sh = doc_shingles(spark, sf_dir).select("doc_id", F.explode("sh").alias("shingle"))
    train = sh.filter(F.col("doc_id") >= N_EVAL)
    eval_ = sh.filter(F.col("doc_id") < N_EVAL).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    return (
        train.join(F.broadcast(eval_), on="shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


N_SHARDS = 16


@query("pipeline_shuffle_shards", oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             {_duck_bucket('doc_id', 16)} AS shard,
             md5(CAST(doc_id AS VARCHAR)) AS sort_key
      FROM documents
    )
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY sort_key, doc_id)
                AS INT) AS pos
    FROM keyed
""")
def pipeline_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: every document gets a shard
    in [0, N_SHARDS) and a position within its shard, both pure functions
    of doc_id (md5-derived), so the 'random' order is identical across
    runs, engines, partitionings, and cluster sizes — the property a
    training-data shuffle needs and an RNG shuffle cannot give.

    This is the assignment view; the writer form is
    `df.repartition(N_SHARDS, shard).sortWithinPartitions(sort_key)`
    + partitioned parquet — exactly one shuffle keyed on the shard, with
    the within-shard order produced by the shuffle's sort rather than a
    global orderBy (no single-point sort at 100 TB; shard count scales
    with the cluster, not the data). The row_number window here exists
    for the oracle's benefit at test SF: per-shard ranking over the same
    keys the writer would sort by."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), 16).cast("int").alias("shard"),
        F.md5(F.col("doc_id").cast("string")).alias("sort_key"),
    )
    w = W.partitionBy("shard").orderBy("sort_key", "doc_id")
    return keyed.select(
        "doc_id", "shard", F.row_number().over(w).cast("int").alias("pos")
    )


@query("pipeline_importance_sample", oracle="""
    WITH scored AS (
      SELECT doc_id,
             10000 * len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
               // greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1)
               AS score_bp,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':dsir'), 1, 12)
                  AS BIGINT) AS u
      FROM documents
    )
    SELECT doc_id, CAST(score_bp AS BIGINT) AS score_bp
    FROM scored
    WHERE u * 10000 < score_bp * 281474976710656
""")
def pipeline_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling (new r7): each document is
    kept with probability proportional to its quality score — the
    acceptance-sampling step behind DSIR-style data selection (Xie et
    al. 2023) and quality-weighted corpus mixing: instead of a hard
    quality CUTOFF (pipeline_corpus_prep's filter), the corpus is
    THINNED so better documents survive more often, preserving tail
    diversity while shifting the quality distribution. The weight is
    the type-token ratio in basis points (distinct words / words) — a
    quality proxy that genuinely VARIES on the fixture (r7's
    clean-character share was 10000 for every document, so the
    accept/reject path — the operator's entire point — was never
    exercised; r8 advice item). A production DSIR run swaps in the
    importance ratio of two n-gram LMs — the acceptance machinery is
    identical.

    Exactness (the pipeline_dp_counts / events_bootstrap_ci zero-RNG
    recipe): accept doc d iff u48(d) · 10⁴ < score_bp(d) · 2⁴⁸ — a pure
    BIGINT cross-multiplication of the 48-bit md5 draw against the
    basis-point score (max product 2.8e18, inside int64), so the draw
    is deterministic, engine-identical, and reproducible run-over-run
    (the property a training pipeline needs for data lineage). The
    score itself is an integer FLOOR division on both texts (Spark DIV
    / DuckDB //): a double->bigint CAST would round half-away in
    DuckDB but truncate in Spark — the half-case divergence the r8
    advice flagged.

    Scale shape: zero shuffles — score, draw and accept are one
    codegen projection over the scan; downstream consumers see a
    corpus whose size concentrates toward quality mass with no
    repartition."""
    d = load_table(spark, sf_dir, "documents")
    score_bp = F.expr(
        "(10000 * CAST(size(array_distinct(split(trim(text), '\\\\s+'))) AS BIGINT))"
        " DIV greatest(CAST(size(split(trim(text), '\\\\s+')) AS BIGINT), 1)"
    ).cast("bigint")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":dsir"))), 1, 12
        ),
        16,
        10,
    ).cast("bigint")
    return (
        d.select("doc_id", score_bp.alias("score_bp"), u.alias("u"))
        .filter(F.col("u") * 10000 < F.col("score_bp") * (2**48))
        .select("doc_id", "score_bp")
    )


@query("pipeline_dataset_fingerprint", oracle="""
    SELECT COALESCE(source, '__ALL__') AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(bit_xor(CAST('0x' || substr(
                  md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 12)
                AS BIGINT)) AS BIGINT) AS content_xor,
           CAST(sum(CAST('0x' || substr(
                  md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 12)
                AS BIGINT)) % 281474976710656 AS BIGINT) AS content_sum
    FROM documents
    GROUP BY GROUPING SETS ((source), ())
""")
def pipeline_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset fingerprint (new r7): an order-insensitive content hash
    per source plus a corpus-level root — the reproducibility /
    lineage primitive ('did two pipeline runs produce the SAME
    dataset?') that a training data card records next to the DP counts.
    Each row contributes h = md5(doc_id:content-md5) as a 48-bit
    integer; the rollup keeps BOTH the XOR and the SUM of row hashes —
    two independent commutative-monoid digests (XOR alone is blind to
    duplicated-row pairs, SUM alone to certain swaps; together they
    catch either) plus row and byte counts.

    Exactness/scale: XOR and SUM are commutative and associative, so
    the digest is identical under ANY partitioning, row order, or
    engine — and mergeable: per-shard partial digests fold into the
    corpus root without rescanning (the agg_bitmap_distinct argument).
    The SUM digest accumulates in 128-bit (Spark DECIMAL(38,0), DuckDB
    HUGEINT) and emits sum mod 2^48: a raw BIGINT sum of 48-bit row
    hashes overflows int64 at ~65k docs, exactly the corpus scale the
    mergeability claim targets, and the engines disagree on overflow
    (DuckDB raises on the HUGEINT->BIGINT cast, non-ANSI Spark wraps) —
    r8 advice item, made unrepresentable by construction.
    One map-side-combinable GROUPING SETS pass emits per-source rows
    and the '__ALL__' root together."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.md5(F.col("text")),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        d.select("source", "n_chars", h.alias("h"))
        .groupingSets([["source"], []], "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.bit_xor("h").cast("bigint").alias("content_xor"),
            (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(2**48))
            .cast("bigint")
            .alias("content_sum"),
        )
        .select(
            F.coalesce("source", F.lit("__ALL__")).alias("source"),
            "n_docs",
            "total_chars",
            "content_xor",
            "content_sum",
        )
    )


# ---------------------------------------------------------------------------
# sample_systematic — every-k-th systematic sampling on the hash ring (r9)
# ---------------------------------------------------------------------------

SYSTEMATIC_K = 20  # sampling interval: 1-in-20


@query("sample_systematic", oracle=f"""
    WITH ranked AS (
      SELECT o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey)
               AS BIGINT) AS rk
      FROM orders
    )
    SELECT o_orderkey, rk,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM ranked WHERE rk % {SYSTEMATIC_K} = 1
""")
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-{SYSTEMATIC_K} sampling (new r9) — the survey-
    sampling mode the family lacked (random/percent/reservoir/
    stratified/quota exist): order the frame on a deterministic md5
    hash ring (so the 'systematic' stride is independent of any data
    ordering — the textbook requirement that the frame order be
    unrelated to the measurement) and take every {SYSTEMATIC_K}-th
    element. Guarantees EXACT stride spacing — a Bernoulli sample's
    size is binomial; a systematic sample's is ⌈n/k⌉ exactly, which is
    what shard-budgeted exports need.

    Exactness: ranks are exact (md5 string order, key tie-break makes
    the order total); the stride predicate is integer modulo.

    Scale shape: the global rank uses the distributed-exact ntile
    device (range partition on the hash + per-slice row_number +
    broadcast offsets — no single-task sort); the stride filter is a
    pure map after that. One range exchange total, the unavoidable
    cost of any exact global order."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.md5(F.col("o_orderkey").cast("string")).alias("h"),
    )
    # _ntile_distributed's internals: reuse its rank machinery by
    # requesting n buckets == n rows is wasteful; instead replicate the
    # rank construction directly (range partition + per-slice
    # row_number + offsets) via the shared helper's sibling below.
    from pyspark.sql import Window as W

    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        o.repartitionByRange(p, F.col("h").asc(), F.col("o_orderkey").asc())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    rows = sorted(
        (r["_pid"], r["_c"])
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).collect()
    )
    offs, acc = [], 0
    for pid, c in rows:
        offs.append((pid, acc))
        acc += c
    off_df = spark.createDataFrame(offs, "`_pid` INT, `_off` BIGINT")
    rk = F.col("_off") + F.row_number().over(
        W.partitionBy("_pid").orderBy("h", "o_orderkey")
    )
    return (
        part.join(F.broadcast(off_df), "_pid")
        .withColumn("rk", rk.cast("bigint"))
        .filter(F.col("rk") % SYSTEMATIC_K == 1)
        .select("o_orderkey", "rk", "o_totalprice")
    )
