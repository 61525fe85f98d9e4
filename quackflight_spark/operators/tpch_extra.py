"""Additional TPC-H-shaped queries (q4/q6/q10/q12/q14/q18 analogues,
adapted to the fixture schema — no shipmode/commitdate columns, so the
predicate columns differ while the plan shapes match the originals).

These widen the relational bench surface: existential joins, pure
filter-agg scans, group-by-join-topk, conditional aggregation, ratio
aggregates, and HAVING + IN-subquery composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table


def _dec(col, scale: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


@query("tpch_q4", oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
""")
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking: EXISTS rewritten as inner-join +
    distinct instead of a left-semi join.  Spark can only broadcast the
    BUILD (right) side of a semi join, and here the small side is the
    date-filtered orders on the LEFT — as a semi join both orders AND the
    full lineitem shuffle on orderkey (r1 bench: 3.6 s, 40× oracle).
    With filtered orders on the right of an inner join, AQE's runtime
    size check converts the exchange to a broadcast hash join, so
    lineitem never shuffles; the map-side partial distinct on (orderkey,
    priority) collapses the multi-lineitem matches before the one small
    exchange.  No broadcast() hint on purpose: at 100 TB a quarter of
    orders may exceed the threshold and AQE falls back to shuffle —
    scale-adaptive either way."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    matched = (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        )
        .select("o_orderkey", "o_orderpriority")
        .distinct()
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query("tpch_q6", oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
""")
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting revenue: the pure scan-filter-agg microbenchmark.
    All four predicates push to the parquet reader; the agg is a single
    scalar — the whole query is one codegen stage + a 1-row exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"))
    )


@query("tpch_q10", oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
""")
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: fact⋈fact keyed shuffle + broadcast
    dims + top-k fusion."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query("tpch_q12", oracle="""
    SELECT l_returnflag AS shipclass,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
""")
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode shape: join + conditional (CASE) aggregation."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("shipclass"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query("tpch_q14", oracle="""
    SELECT round(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'ECONOMY%'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS economy_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
""")
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion-effect shape: broadcast dim join + ratio of two
    conditional sums (one scalar result)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    economy = F.when(F.col("p_type").like("ECONOMY%"), rev).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(economy).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("economy_revenue_pct")
        )
    )


@query("tpch_q18", oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
    )
    GROUP BY c_custkey, c_name, o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
""")
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: IN-subquery over a HAVING aggregate →
    semi join against a pre-aggregated key set, then the main 3-way join
    + top-k. The HAVING agg shuffles lineitem once on orderkey; the semi
    join reuses that partitioning."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 180)
        .select(F.col("l_orderkey").alias("k"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(big_orders, li.l_orderkey == big_orders.k, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


BASKET_MIN_CO = 2  # pairs must co-occur in >= 2 orders
# loud-fail guard (r6, the PERF.md-measured mega-basket hazard made
# enforceable): pair expansion is quadratic WITHIN a basket — one
# pathological 50k-item basket alone emits 1.25G pairs into a single
# join key, the skew no partitioning fixes after the fact. Baskets past
# this size raise with their order key instead of silently owning the
# stage (the FUZZY_BLOCK_CAP contract; TPC-H baskets are ≤ 7 items, and
# real retail baskets are 10²-10³ — the cap only trips on data that
# would genuinely need a different algorithm, e.g. top-k items per
# basket or within-basket salting).
BASKET_SIZE_CAP = 10_000


def check_basket_cap(op: DataFrame, cap: int) -> None:
    """Plan-time mega-basket check (shared bounded-block contract,
    pipeline/blocking.py): raises with the worst offender's order key if
    any basket exceeds cap. Plan-time rather than in-plan because the
    in-plan alternative (a basket-size window on the probe side) was
    measured at +0.8 s/run at sf0.1 — a per-run tax on every healthy
    corpus — while this stat runs once per corpus (the registered key
    memoizes it, like join_fuzzy_names' oversized-block stat) and fails
    BEFORE the quadratic expansion is even scheduled."""
    from quackflight_spark.pipeline.blocking import assert_block_cap

    assert_block_cap(
        op, ["o"], cap,
        what="basket",
        fix="pair expansion is quadratic per basket; truncate to top-k "
            "items per basket or raise BASKET_SIZE_CAP",
    )


def basket_pair_lift_core(op: DataFrame, min_co: int = BASKET_MIN_CO,
                          basket_cap: int | None = None,
                          cap_checked: bool = False) -> DataFrame:
    """Pair-lift pipeline over a deduped (o, p) basket frame — shared by
    the registered key and tools/scale_curve_basket.py so the measured
    curve exercises the exact operator shape."""
    from pyspark.sql import Window as W

    if not cap_checked:
        check_basket_cap(op, BASKET_SIZE_CAP if basket_cap is None else basket_cap)
    tot = op.agg(F.countDistinct("o").cast("bigint").alias("n"))
    # per-part order count attaches BEFORE pairing (one window shuffle on
    # p), so it rides the self-join and the pair aggregation as a
    # per-part constant — no post-aggregation join against a part-count
    # table (which at 10^8 parts would be two more keyed shuffles)
    opc = op.withColumn(
        "c", F.count(F.lit(1)).over(W.partitionBy("p")).cast("bigint")
    )
    a, b = opc.alias("a"), opc.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(
            F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ab"),
            F.max(F.col("a.c")).alias("ca"),
            F.max(F.col("b.c")).alias("cb"),
        )
        .filter(F.col("n_ab") >= min_co)
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double") * F.col("n")
                / (F.col("ca") * F.col("cb")),
                8,
            ).alias("lift"),
        )
    )


@query("basket_pair_lift", oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM op),
    pc AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM op GROUP BY p),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_ab,
           round(CAST(n_ab AS DOUBLE) * (SELECT n FROM tot)
                 / (ca.c * cb.c), 8) AS lift
    FROM pairs
    JOIN pc ca ON ca.p = part_a
    JOIN pc cb ON cb.p = part_b
    WHERE n_ab >= {BASKET_MIN_CO}
""")
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift: part pairs bought together
    in ≥ BASKET_MIN_CO orders, lift = P(a,b) / (P(a)·P(b)) — the
    association-rule primitive (recommenders, cross-sell analytics).

    Scale shape: the self-join keys on l_orderkey, so pair expansion per
    order is bounded by basket size (TPC-H ≤ 7 items — quadratic only
    within a basket, the standard market-basket bound; the Σ(basket²)
    cost law and the mega-basket hazard are MEASURED in
    tools/scale_curve_basket.py / PERF.md, and since r6 ENFORCED: a
    basket past BASKET_SIZE_CAP raises with its order key at PLAN time
    — a bounded stat job memoized per corpus, after an in-plan window
    guard measured +0.8 s/run — so a pathological basket fails before
    its k² expansion is ever scheduled). One distinct + one
    pair-count shuffle; the order total
    rides a 1-row broadcast cross join; per-part counts attach BEFORE
    pairing (one window shuffle on p) so they ride the self-join as a
    per-part constant. All-integer counts; lift rounds the identical
    double expression both engines."""
    from quackflight_spark.pipeline.frame_cache import shared_frame

    # three consumers (total, both self-join sides): without pinning, each
    # branch re-scans lineitem and re-runs the distinct (the lineage-per-
    # branch pitfall — 13 exchanges planned). Built once per corpus like
    # every other staging frame (frame_cache).
    op = shared_frame(
        "basket_op",
        sf_dir,
        lambda: load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct(),
    )
    # plan-time mega-basket stat memoized per corpus dir (immutable
    # fixtures): one bounded agg job the first time, zero thereafter
    if sf_dir not in _BASKET_CHECKED:
        check_basket_cap(op, BASKET_SIZE_CAP)
        _BASKET_CHECKED.add(sf_dir)
    return basket_pair_lift_core(op, cap_checked=True)


_BASKET_CHECKED: set[str] = set()


FUZZY_MAX_DIST = 3
# second blocking dimension: length bands of width max_dist+1. Edit
# distance >= |len(a)-len(b)|, so lev <= 3 forces |Δlen| <= 3 and with
# band width 4 every qualifying pair sits in the same or an adjacent
# band — the banding is LOSSLESS for the declared output while cutting
# block membership from "every descriptor variant of the noun" to "the
# variants within one 4-char length band" (sorted-neighborhood practice).
FUZZY_LEN_BAND = FUZZY_MAX_DIST + 1
# loud-fail guard: blocks past this size mean the chosen blocking keys
# have stopped bounding the quadratic Levenshtein stage — fail with the
# offending key instead of silently going O(block²) (r4 verdict: the
# final token alone is a ~92-word vocabulary on TPC-H, so block size
# grew linearly with the name population)
FUZZY_BLOCK_CAP = 10_000
# adaptive banding threshold (r6, the r5 verdict's fix for the 7× bench
# regression): token blocks at or below this size skip the length-band
# refinement entirely — a block of n names costs ~n²/2 Levenshtein calls
# either way at small n, and the banded path's 3× probe explode + extra
# joins are pure overhead when blocks are already bounded. Only blocks
# PAST the threshold (the linearly-growing-vocabulary regime the banding
# exists for) pay for the band split. 400 sits at the measured crossover
# (tools/scale_curve_fuzzy.py r6: blocks of 100 → plain wins 0.40 vs
# 0.63 s; blocks of 1000 → banded wins 5.0 vs 8.9 s).
FUZZY_BAND_THRESHOLD = 400


def token_blocks_oversized(names: DataFrame, col: str = "p_name",
                           band_threshold: int | None = None,
                           block_cap: int | None = None) -> bool:
    """Plan-time statistic: does ANY final-token block of this name
    population exceed the banding threshold? One bounded aggregation
    job over the (already-deduped, dimension-sized) name frame with a
    limit-1 consumer — the blocked-join analog of AQE's stats-driven
    replanning. Callers memoize per corpus (the fixture dirs are
    immutable), so a bench/driver session pays this once per corpus,
    not per invocation."""
    from quackflight_spark.pipeline.blocking import any_block_over

    thr = min(
        FUZZY_BAND_THRESHOLD if band_threshold is None else band_threshold,
        FUZZY_BLOCK_CAP if block_cap is None else block_cap,
    )
    tok = F.element_at(F.split(F.col(col), " "), -1)
    return any_block_over(names.select(tok.alias("tok")), ["tok"], thr)


def fuzzy_name_pairs(names: DataFrame, col: str = "p_name",
                     max_dist: int = FUZZY_MAX_DIST,
                     block_cap: int | None = None,
                     band_threshold: int | None = None,
                     has_oversized: bool | None = None) -> DataFrame:
    """Blocked fuzzy self-join core over a deduped name column: pairs
    within edit distance <= max_dist, blocked on the final token, with
    ADAPTIVE length-band refinement: token blocks larger than
    band_threshold are re-blocked on (token, length band) — the probe
    side explodes to band ±1, so the band join stays a pure equi-join
    and each qualifying pair matches exactly once (the build row has ONE
    band) — while already-small blocks take the direct token equi-join
    with none of the banding overhead. Banding is lossless (lev <= d
    forces |Δlen| <= d; band width d+1 ⇒ same-or-adjacent band), and
    the banded/unbanded split partitions the name population by token,
    so the pair set is exact. Any banded block still past block_cap
    fails loudly with its key via a raise_error filter Catalyst cannot
    prune.

    Two plans, picked by a plan-time statistic (has_oversized, computed
    via token_blocks_oversized when not supplied): if NO token block
    exceeds the threshold, the banding machinery and the cap guard are
    both statically satisfied, and the emitted plan is the bare
    token-blocked self-join — zero adaptive overhead on well-blocked
    populations, which is the common case (the r5 verdict measured the
    unconditional banding at 7× on exactly such a corpus)."""
    cap = FUZZY_BLOCK_CAP if block_cap is None else block_cap
    thr = FUZZY_BAND_THRESHOLD if band_threshold is None else band_threshold
    # the plain path is bounded by the SMALLER of threshold and cap, so a
    # tightened cap still routes the block through banding (whose guard
    # fires) instead of dodging the check entirely
    thr = min(thr, cap)
    raw_band = (F.length(col) / FUZZY_LEN_BAND).cast("int")
    tok = F.element_at(F.split(F.col(col), " "), -1)
    nb = names.select(F.col(col), tok.alias("tok"), raw_band.alias("raw_band"))
    if has_oversized is None:
        has_oversized = token_blocks_oversized(
            names, col, band_threshold=thr, block_cap=cap
        )
    if not has_oversized:
        # every token block ≤ thr ≤ cap: direct token equi-join, no lut,
        # no explode, no guard — the r4 plan shape
        a = nb.select(F.col(col).alias("name_a"), "tok")
        b = nb.select(F.col(col).alias("name_b"), "tok")
        return (
            a.join(b, ["tok"])
            .filter(F.col("name_a") < F.col("name_b"))
            .withColumn("dist", F.levenshtein("name_a", "name_b").cast("int"))
            .filter(F.col("dist") <= max_dist)
            .select("name_a", "name_b", "dist")
        )
    # ONE aggregation pass over the name population yields both guard
    # inputs: per-(token, band) block sizes, re-aggregated (the frame is
    # vocabulary × bands — tiny) to token totals via a window. The lut
    # broadcasts once; at fixture scale every extra stage is the whole
    # cost of this key, so the adaptive machinery must not add a second
    # full-frame aggregation or join.
    from pyspark.sql import Window as W

    lut = (
        nb.groupBy("tok", "raw_band")
        .agg(F.count(F.lit(1)).alias("block_n"))
        .withColumn("tok_n", F.sum("block_n").over(W.partitionBy("tok")))
    )
    # per-row adaptive band: oversized token blocks keep their real
    # length band (and the probe side explodes to band ±1); small blocks
    # collapse to a constant band with a 1-element probe — the join
    # below degenerates to the plain token equi-join for them, with no
    # second join branch or union in the plan. The -1 sentinel cannot
    # cross-match: banding is decided PER TOKEN (tok_n is a token-level
    # count), so a token's build rows are either all sentinel or all
    # real bands >= 0 — a banded probe at band -1 (raw_band 0) finds no
    # sentinel build row under the same token.
    banded = F.col("tok_n") > thr
    build_band = F.when(banded, F.col("raw_band")).otherwise(F.lit(-1))
    probe_bands = F.when(
        banded,
        F.array(
            F.col("raw_band") - 1, F.col("raw_band"), F.col("raw_band") + 1
        ),
    ).otherwise(F.array(F.lit(-1)))
    # the guard bound for a banded block is its (tok, band) size; for an
    # unbanded block it is the token total, which the thr=min(thr, cap)
    # clamp above already bounds by cap — so only banded blocks can trip
    guarded = nb.join(F.broadcast(lut), ["tok", "raw_band"]).filter(
        F.when(
            banded & (F.col("block_n") > cap),
            F.raise_error(
                F.format_string(
                    "fuzzy-join block ('%s', band %d) has %d members, "
                    "exceeding the cap of " + str(cap) + " — add a "
                    "blocking dimension or raise FUZZY_BLOCK_CAP",
                    F.col("tok"), F.col("raw_band"), F.col("block_n"),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    ).select(
        F.col(col),
        "tok",
        build_band.alias("band"),
        probe_bands.alias("probe_bands"),
    )
    a = guarded.select(
        F.col(col).alias("name_a"),
        "tok",
        F.explode("probe_bands").alias("band"),
    )
    b = guarded.select(F.col(col).alias("name_b"), "tok", "band")
    return (
        a.join(b, ["tok", "band"])
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )


@query("join_fuzzy_names", oracle=f"""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM n a JOIN n b
      ON a.p_name < b.p_name
     AND split_part(a.p_name, ' ', -1) = split_part(b.p_name, ' ', -1)
     AND levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
""")
def join_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join (entity resolution / record linkage):
    distinct part names pairing within edit distance ≤ {FUZZY_MAX_DIST},
    blocked on (final product noun, 4-char length band) — the canonical
    linkage recipe: never all-pairs Levenshtein, always block on cheap
    exact keys first, run the quadratic metric only inside blocks.

    Scale shape (r6 adaptive form): the entity dimension is deduped
    first (one distinct shuffle, tiny relative to the fact table it
    came from); the self-join keys on the blocking token, and token
    blocks past FUZZY_BAND_THRESHOLD are additionally re-blocked on a
    4-char length band — lossless because lev ≤ d forces |Δlen| ≤ d
    (see fuzzy_name_pairs) — while well-blocked populations (this
    fixture's ~200-name noun blocks) take the direct token join with
    zero banding overhead (the r5 verdict's unconditional-banding 7×
    regression, fixed). Any banded block that still outgrows
    FUZZY_BLOCK_CAP fails loudly with its key instead of silently
    going O(block²). The banding only PRUNES candidates the distance
    filter would discard, so the DuckDB oracle keeps the simpler
    token-only blocking and stays exact."""
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    # plan-time stat memoized per corpus dir (immutable fixtures): one
    # bounded agg job the first time, zero thereafter
    if sf_dir not in _FUZZY_OVERSIZED:
        _FUZZY_OVERSIZED[sf_dir] = token_blocks_oversized(names)
    return fuzzy_name_pairs(names, has_oversized=_FUZZY_OVERSIZED[sf_dir])


_FUZZY_OVERSIZED: dict[str, bool] = {}


SPATIAL_R_TENTHS = 20  # radius: 2.0 degrees, in integer deci-degrees


@query("join_spatial_grid", oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4)
                  AS BIGINT) % 2000 AS lat_d,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 5, 4)
                  AS BIGINT) % 1999 AS lon_d
      FROM customer
    )
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           (a.lat_d - b.lat_d) * (a.lat_d - b.lat_d)
           + (a.lon_d - b.lon_d) * (a.lon_d - b.lon_d) AS dist_sq
    FROM pts a JOIN pts b
      ON a.c_custkey < b.c_custkey
     AND (a.lat_d - b.lat_d) * (a.lat_d - b.lat_d)
         + (a.lon_d - b.lon_d) * (a.lon_d - b.lon_d)
         <= {SPATIAL_R_TENTHS * SPATIAL_R_TENTHS}
""")
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join via grid bucketing (new r6) — the canonical spatial
    join: find all point pairs within distance r WITHOUT the all-pairs
    product. Each point lands in a cell of side r; the probe side
    explodes to its 3×3 cell neighborhood (any pair within r spans at
    most adjacent cells — the 2-D analog of the fuzzy join's ±1 length
    band, lossless by the same argument); the join is a pure equi-join
    on the cell id and the exact distance predicate filters inside.
    Candidate volume is Σ(cell²) over occupied cells — bounded by data
    density, never n².

    Exactness: coordinates are INTEGER deci-degrees (planar
    small-area approximation, documented — a production geo join scales
    cells by cos(lat) and verifies with haversine; the grid plumbing is
    identical), so squared distances are exact integers in both
    engines. The ORACLE is the naive quadratic form — the definition —
    so the hash match proves the grid decomposition loses no pair.
    The synthetic points are md5-hash-uniform over a 200°×200°
    deci-degree region (the repo's deterministic-hash idiom — r6 fix:
    the original `k*37 % 1800` LATTICE was anti-clustered, so NO pair
    fell within radius at any fixture SF and the key was vacuously
    true on empty-vs-empty; hash-uniform points give the Poisson pair
    density a real radius join sees: 5 / 347 / 35k pairs at
    sf0.001/0.01/0.1). Coordinates are
    non-negative, so Spark's truncating div and DuckDB's flooring //
    agree on the cell id."""
    h = F.md5(F.col("c_custkey").cast("string"))
    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % 2000).alias("lat_d"),
        (F.conv(F.substring(h, 5, 4), 16, 10).cast("bigint") % 1999).alias("lon_d"),
    )
    r = SPATIAL_R_TENTHS
    cx = (F.col("lat_d") / r).cast("bigint")
    cy = (F.col("lon_d") / r).cast("bigint")
    build = pts.select(
        F.col("c_custkey").alias("key_b"),
        F.col("lat_d").alias("lat_b"),
        F.col("lon_d").alias("lon_b"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    probe = pts.select(
        F.col("c_custkey").alias("key_a"),
        F.col("lat_d").alias("lat_a"),
        F.col("lon_d").alias("lon_a"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (cx + dx).alias("cx"), (cy + dy).alias("cy")
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("c"),
    ).select(
        "key_a", "lat_a", "lon_a",
        F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"),
    )
    dist_sq = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
    return (
        probe.join(build, ["cx", "cy"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist_sq", dist_sq)
        .filter(F.col("dist_sq") <= r * r)
        .select("key_a", "key_b", "dist_sq")
    )


@query("join_spatial_nn", oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4)
                  AS BIGINT) % 2000 AS lat_d,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 5, 4)
                  AS BIGINT) % 1999 AS lon_d
      FROM customer
    ),
    cand AS (
      SELECT a.c_custkey AS key_a, b.c_custkey AS nn_key,
             (a.lat_d - b.lat_d) * (a.lat_d - b.lat_d)
             + (a.lon_d - b.lon_d) * (a.lon_d - b.lon_d) AS dist_sq
      FROM pts a JOIN pts b
        ON a.c_custkey <> b.c_custkey
       AND (a.lat_d - b.lat_d) * (a.lat_d - b.lat_d)
           + (a.lon_d - b.lon_d) * (a.lon_d - b.lon_d)
           <= {SPATIAL_R_TENTHS * SPATIAL_R_TENTHS}
    ),
    best AS (
      SELECT key_a, min(ROW(dist_sq, nn_key)) AS m FROM cand GROUP BY key_a
    )
    SELECT key_a, CAST(m[2] AS BIGINT) AS nn_key,
           CAST(m[1] AS BIGINT) AS nn_dist_sq
    FROM best
""")
def join_spatial_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor-within-radius spatial join (new r6): for every
    point, its closest OTHER point within SPATIAL_R_TENTHS, ties broken
    by smallest key — the "snap to nearest station" primitive
    (geocoding, sensor fusion, POI matching). Points with no neighbor
    inside the radius are dropped (a production variant left-joins them
    back as unmatched).

    Scale shape: identical grid decomposition to `join_spatial_grid`
    (cell equi-join + 3×3 probe explode — bounded-radius NN needs no
    ring expansion: every candidate within r lives in an adjacent
    cell), then ONE min(struct(dist², key)) aggregate per probe point —
    the lexicographic struct-min is the same shuffle-once argmin idiom
    as pipeline_dedup_keep_best, no window, no global sort. The ORACLE
    is the naive quadratic min — the definition — so the hash match
    proves the grid finds every point's true nearest neighbor.

    Reference parity: quackflight delegates spatial joins to engine SQL
    (no native spatial operator, main.py's generic query path); this is
    the Spark-native formulation of that capability."""
    h = F.md5(F.col("c_custkey").cast("string"))
    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % 2000).alias("lat_d"),
        (F.conv(F.substring(h, 5, 4), 16, 10).cast("bigint") % 1999).alias("lon_d"),
    )
    r = SPATIAL_R_TENTHS
    cx = (F.col("lat_d") / r).cast("bigint")
    cy = (F.col("lon_d") / r).cast("bigint")
    build = pts.select(
        F.col("c_custkey").alias("nn_key"),
        F.col("lat_d").alias("lat_b"),
        F.col("lon_d").alias("lon_b"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    probe = pts.select(
        F.col("c_custkey").alias("key_a"),
        F.col("lat_d").alias("lat_a"),
        F.col("lon_d").alias("lon_a"),
        F.explode(
            F.array(
                *[
                    F.struct((cx + dx).alias("cx"), (cy + dy).alias("cy"))
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("c"),
    ).select(
        "key_a", "lat_a", "lon_a",
        F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"),
    )
    dist_sq = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
    return (
        probe.join(build, ["cx", "cy"])
        .filter(F.col("key_a") != F.col("nn_key"))
        .withColumn("dist_sq", dist_sq)
        .filter(F.col("dist_sq") <= r * r)
        .groupBy("key_a")
        .agg(F.min(F.struct("dist_sq", "nn_key")).alias("m"))
        .select(
            "key_a",
            F.col("m.nn_key").alias("nn_key"),
            F.col("m.dist_sq").alias("nn_dist_sq"),
        )
    )


# interval-overlap join: fixture intervals synthesized from orders —
# [start, start+len) in epoch days; the two relations are the odd/even
# o_orderkey thinnings so the join is a genuine two-table overlap
INTERVAL_BUCKET_DAYS = 64
INTERVAL_THIN = 50  # keep ~1/50 of orders per side


def _interval_side(spark: SparkSession, sf_dir: str, residue: int) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % INTERVAL_THIN == residue
    )
    start = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    return o.select(
        F.col("o_orderkey").alias("key"),
        start.cast("bigint").alias("start_day"),
        (start + (F.col("o_orderkey") % 30) + 1).cast("bigint").alias("end_day"),
    )


def _interval_side_sql(residue: int) -> str:
    return f"""
      SELECT o_orderkey AS key,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS start_day,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                  + (o_orderkey % 30) + 1 AS BIGINT) AS end_day
      FROM orders WHERE o_orderkey % {INTERVAL_THIN} = {residue}
    """


@query("join_interval_overlap", oracle=f"""
    WITH a AS ({_interval_side_sql(0)}),
         b AS ({_interval_side_sql(1)})
    SELECT a.key AS key_a, b.key AS key_b,
           CAST(least(a.end_day, b.end_day)
                - greatest(a.start_day, b.start_day) AS BIGINT) AS overlap_days
    FROM a JOIN b
      ON a.start_day < b.end_day AND b.start_day < a.end_day
""")
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (new r6): all (a, b) pairs whose half-open
    [start, end) day ranges intersect, plus the overlap length — the
    temporal-alignment primitive (shift overlap, session concurrency,
    exposure windows). The naive form is a non-equi theta join Spark
    can only plan as a nested-loop cartesian.

    Scale shape — the standard distributed interval join: every
    interval explodes to the INTERVAL_BUCKET_DAYS-wide buckets it
    covers (sequence(), bounded by interval length / bucket width, here
    ≤ 1 extra bucket per interval since max len 30 < 64), the join is a
    pure EQUI-join on bucket id, and each qualifying pair is emitted
    EXACTLY once — only in the bucket containing max(start_a, start_b)
    — so no distinct/dedup shuffle is ever needed. Candidate volume is
    Σ per-bucket |a|·|b|, bounded by time density, never |a|·|b|
    overall; a skewed bucket is AQE-splittable because the join is a
    plain equi-join. The ORACLE is the naive theta join — the
    definition — so the hash match proves the bucket decomposition
    emits every overlapping pair exactly once."""
    w = INTERVAL_BUCKET_DAYS
    a = _interval_side(spark, sf_dir, 0)
    b = _interval_side(spark, sf_dir, 1)
    exploded_a = a.select(
        F.col("key").alias("key_a"),
        F.col("start_day").alias("sa"),
        F.col("end_day").alias("ea"),
        F.explode(
            F.sequence(
                (F.col("start_day") / w).cast("bigint"),
                ((F.col("end_day") - 1) / w).cast("bigint"),
            )
        ).alias("bucket"),
    )
    exploded_b = b.select(
        F.col("key").alias("key_b"),
        F.col("start_day").alias("sb"),
        F.col("end_day").alias("eb"),
        F.explode(
            F.sequence(
                (F.col("start_day") / w).cast("bigint"),
                ((F.col("end_day") - 1) / w).cast("bigint"),
            )
        ).alias("bucket"),
    )
    return (
        exploded_a.join(exploded_b, "bucket")
        .filter(
            (F.col("sa") < F.col("eb"))
            & (F.col("sb") < F.col("ea"))
            # exactly-once: only the bucket that OWNS the overlap start
            & (
                (F.greatest(F.col("sa"), F.col("sb")) / w).cast("bigint")
                == F.col("bucket")
            )
        )
        .select(
            "key_a",
            "key_b",
            (
                F.least(F.col("ea"), F.col("eb"))
                - F.greatest(F.col("sa"), F.col("sb"))
            ).cast("bigint").alias("overlap_days"),
        )
    )


TRAJ_PTS = 8       # points kept per user trajectory
TRAJ_TAU = 120     # Hausdorff threshold (grid cell size = tau)
TRAJ_TAU2 = TRAJ_TAU * TRAJ_TAU


@query("join_trajectory_hausdorff", oracle=f"""
    WITH pts AS (
      SELECT user_id AS u,
             CAST((user_id // 3) * 9973 % 10000
                  + event_id * 37 % 300 AS BIGINT) AS x,
             CAST((user_id // 3) * 7919 % 10000
                  + event_id * 53 % 300 AS BIGINT) AS y,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
      FROM events
    ),
    p AS (SELECT u, x, y FROM pts WHERE rn <= {TRAJ_PTS}),
    us AS (SELECT DISTINCT u FROM p),
    pairs AS (SELECT a.u AS ua, b.u AS ub FROM us a, us b WHERE a.u < b.u),
    cross_d AS (
      SELECT c.ua, c.ub, pa.x AS ax, pa.y AS ay, pb.x AS bx, pb.y AS by_,
             (pa.x - pb.x) * (pa.x - pb.x)
             + (pa.y - pb.y) * (pa.y - pb.y) AS d2
      FROM pairs c JOIN p pa ON pa.u = c.ua JOIN p pb ON pb.u = c.ub
    ),
    da AS (SELECT ua, ub, ax, ay, min(d2) AS mind
           FROM cross_d GROUP BY 1, 2, 3, 4),
    db AS (SELECT ua, ub, bx, by_, min(d2) AS mind
           FROM cross_d GROUP BY 1, 2, 3, 4),
    h AS (SELECT ua, ub, max(mind) AS h2
          FROM (SELECT ua, ub, mind FROM da
                UNION ALL SELECT ua, ub, mind FROM db)
          GROUP BY 1, 2)
    SELECT ua AS user_a, ub AS user_b, CAST(h2 AS BIGINT) AS hausdorff_sq
    FROM h WHERE h2 <= {TRAJ_TAU2}
""")
def join_trajectory_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory-similarity join (new r6) — symmetric discrete
    Hausdorff distance between per-user point sets under a threshold:
    the set-distance sibling of join_spatial_grid and the relational
    core of distributed trajectory similarity search (REPOSE ICDE'21 /
    road-network trajectory join ICDE'19 in PAPERS.md — both block
    candidates spatially, then verify exact distances; this key is
    that shape on Spark). Trajectories are the first {TRAJ_PTS} points
    per user — synthesized LOCAL, like real movement data: each user
    triple shares an arithmetic anchor on a 10000-grid and points
    scatter in a 300-box around it, so trajectories cluster instead of
    spraying uniformly (a uniform synthesis measured 10.2 s at sf0.1
    because EVERY user pair became a candidate — density no blocking
    scheme can beat; locality is the property the papers' pruning, and
    this grid, actually exploit).

    Blocking is LOSSLESS by the Hausdorff definition: H(A,B) ≤ τ means
    EVERY point of A has a B-point within τ, so A and B co-occupy some
    3×3 neighborhood of the τ-sized grid — candidates are generated
    from the (user, cell) OCCUPANCY table join (9 neighbor probes on
    one side), never from all user pairs; the oracle computes the
    naive all-pairs ground truth, so the differential check PROVES the
    blocking drops no qualifying pair. Verification is exact integer
    arithmetic: min squared distance per (pair, point) both directions
    in ONE cross-distance pass, max per pair, threshold filter.

    Scale shape: candidates ∝ grid-cell co-occupancy (sparse
    trajectories block hard; fixture density keeps most pairs — the
    worst case, still exact); the verify join fans out a BOUNDED
    {TRAJ_PTS}×{TRAJ_PTS} per candidate. Same loud-cap contract as the
    other blocked joins (pipeline/blocking.py) applies when cells run
    hot."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.col("user_id").alias("u"),
        (
            F.expr("(user_id DIV 3) * 9973 % 10000") + F.col("event_id") * 37 % 300
        ).cast("bigint").alias("x"),
        (
            F.expr("(user_id DIV 3) * 7919 % 10000") + F.col("event_id") * 53 % 300
        ).cast("bigint").alias("y"),
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    ).filter(F.col("rn") <= TRAJ_PTS).drop("rn")
    occ = pts.select(
        "u",
        F.expr(f"x DIV {TRAJ_TAU}").alias("cx"),
        F.expr(f"y DIV {TRAJ_TAU}").alias("cy"),
    ).distinct()
    offs = F.explode(
        F.expr("array(-1, 0, 1)")
    )
    probe = (
        occ.select("u", "cx", "cy", offs.alias("dx"))
        .select("u", "cx", "cy", "dx", offs.alias("dy"))
        .select(
            F.col("u").alias("ub"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    cands = (
        occ.select(F.col("u").alias("ua"), "cx", "cy")
        .join(probe, ["cx", "cy"])
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )
    pa = pts.select(F.col("u").alias("ua"), F.col("x").alias("ax"), F.col("y").alias("ay"))
    pb = pts.select(F.col("u").alias("ub"), F.col("x").alias("bx"), F.col("y").alias("by"))
    cross = (
        cands.join(pa, "ua")
        .join(pb, "ub")
        .withColumn(
            "d2",
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
            + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")),
        )
    )
    da = cross.groupBy("ua", "ub", "ax", "ay").agg(F.min("d2").alias("mind"))
    db = cross.groupBy("ua", "ub", "bx", "by").agg(F.min("d2").alias("mind"))
    h = (
        da.select("ua", "ub", "mind")
        .unionByName(db.select("ua", "ub", "mind"))
        .groupBy("ua", "ub")
        .agg(F.max("mind").alias("h2"))
    )
    return h.filter(F.col("h2") <= TRAJ_TAU2).select(
        F.col("ua").alias("user_a"),
        F.col("ub").alias("user_b"),
        F.col("h2").cast("bigint").alias("hausdorff_sq"),
    )


# ---------------------------------------------------------------------------
# join_point_in_polygon — exact integer ray-casting containment join (r9)
# ---------------------------------------------------------------------------

# fixture polygons over the md5-uniform [0,2000)×[0,1999) deci-degree
# domain of the spatial keys: a rectangle, a triangle, and a non-convex
# (arrow-shaped) quad — closed rings, integer vertices
PIP_POLYGONS: dict[str, list[tuple[int, int]]] = {
    "rect": [(200, 200), (900, 200), (900, 800), (200, 800)],
    "tri": [(1000, 1000), (1800, 1100), (1300, 1900)],
    "arrow": [(100, 1200), (600, 1400), (100, 1600), (900, 1500)],
}


def _pip_edges() -> list[tuple[str, int, int, int, int]]:
    out = []
    for pid, ring in PIP_POLYGONS.items():
        for i, (x1, y1) in enumerate(ring):
            x2, y2 = ring[(i + 1) % len(ring)]
            out.append((pid, x1, y1, x2, y2))
    return out


def _pip_edges_values() -> str:
    return ", ".join(
        f"('{p}', {x1}, {y1}, {x2}, {y2})" for p, x1, y1, x2, y2 in _pip_edges()
    )


@query("join_point_in_polygon", oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4)
                  AS BIGINT) % 2000 AS py,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 5, 4)
                  AS BIGINT) % 1999 AS px
      FROM customer
    ),
    edges AS (
      SELECT * FROM (VALUES {_pip_edges_values()})
        AS t(poly_id, x1, y1, x2, y2)
    ),
    crossings AS (
      SELECT e.poly_id, p.c_custkey,
             CAST(sum(CASE
               WHEN (e.y1 > p.py) <> (e.y2 > p.py)
                AND CASE WHEN e.y2 - e.y1 > 0
                  THEN (p.px - e.x1) * (e.y2 - e.y1)
                       < (p.py - e.y1) * (e.x2 - e.x1)
                  ELSE (p.px - e.x1) * (e.y2 - e.y1)
                       > (p.py - e.y1) * (e.x2 - e.x1)
                END
               THEN 1 ELSE 0 END) AS BIGINT) AS n_cross
      FROM pts p CROSS JOIN edges e
      GROUP BY 1, 2
    )
    SELECT poly_id,
           CAST(count(*) AS BIGINT) AS n_inside,
           CAST(sum(c_custkey) AS BIGINT) AS key_checksum
    FROM crossings WHERE n_cross % 2 = 1
    GROUP BY poly_id
""")
def join_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment join by ray casting (new r9) — the
    geofencing primitive completing the spatial family (grid radius
    join, NN join, trajectory Hausdorff — and now region containment):
    a horizontal ray from each point crosses polygon edges; odd
    crossings = inside (Jordan curve / even-odd rule, non-convex-safe —
    the 'arrow' fixture polygon proves it).

    Exactness: the crossing test is EXACT INTEGER arithmetic — the
    intersection comparison px < x1 + (py−y1)(x2−x1)/(y2−y1) is
    cross-multiplied by (y2−y1) with the inequality flipped on its
    sign, so no division ever happens; points are the md5 integer
    deci-degree synthesis shared with join_spatial_grid, vertices are
    integer literals. Both engines evaluate identical integer
    comparisons — bit-deterministic by construction.

    Scale shape: points × edges is a BROADCAST nested-loop over a
    constant-size edge table (|polygons|·|ring| rows) — per-point cost
    is O(total edges), embarrassingly parallel, no shuffle until the
    |polygons|-bounded aggregate. At real-world polygon counts the
    standard upgrade is the join_spatial_grid cell index on polygon
    bounding boxes (prune candidate polygons per cell), then this
    exact test on the survivors — the plumbing composes unchanged."""
    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 4),
                16,
                10,
            ).cast("bigint")
            % 2000
        ).alias("py"),
        (
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 5, 4),
                16,
                10,
            ).cast("bigint")
            % 1999
        ).alias("px"),
    )
    edges = spark.createDataFrame(
        _pip_edges(), "poly_id string, x1 long, y1 long, x2 long, y2 long"
    )
    dy = F.col("y2") - F.col("y1")
    lhs = (F.col("px") - F.col("x1")) * dy
    rhs = (F.col("py") - F.col("y1")) * (F.col("x2") - F.col("x1"))
    crosses = (
        ((F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py")))
        & F.when(dy > 0, lhs < rhs).otherwise(lhs > rhs)
    )
    crossings = (
        pts.crossJoin(F.broadcast(edges))
        .groupBy("poly_id", "c_custkey")
        .agg(
            F.sum(F.when(crosses, 1).otherwise(0)).cast("bigint").alias("n_cross")
        )
    )
    return (
        crossings.filter(F.col("n_cross") % 2 == 1)
        .groupBy("poly_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_inside"),
            F.sum("c_custkey").cast("bigint").alias("key_checksum"),
        )
    )
