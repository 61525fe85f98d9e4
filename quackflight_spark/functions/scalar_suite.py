"""Scalar-function coverage suite — SURVEY.md §2.8 (delegated DuckDB
built-in families + chsql compat), each family exercised over fixture
tables with a DuckDB oracle.

All expressions are built-in Catalyst functions (WholeStageCodegen) — no
Python in the data path. Dialect differences (DuckDB name ↔ Spark name)
are resolved here per family and, for SQL input, by plans/dialect.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.functions.chsql import ensure_chsql_functions
from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table


@query("fn_string_basic", oracle="""
    SELECT p_partkey,
           lower(p_name) AS lo,
           upper(p_brand) AS up,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           substr(p_name, 1, 5) AS sub5,
           length(p_name) AS len,
           split_part(p_type, ' ', 1) AS first_word,
           replace(p_name, ' ', '_') AS underscored,
           reverse(p_brand) AS rev,
           concat_ws('|', p_brand, p_type) AS joined
    FROM part
""")
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lo"),
        F.upper("p_brand").alias("up"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.length("p_name").alias("len"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("underscored"),
        F.reverse("p_brand").alias("rev"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
    )


@query("fn_regexp", oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)', 1) AS first_token,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           regexp_matches(p_brand, '#[0-9]+$') AS has_num
    FROM part
""")
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_token"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.col("p_brand").rlike("#[0-9]+$").alias("has_num"),
    )


@query("fn_date_parts", oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           EXTRACT(day FROM o_orderdate) AS dom,
           dayofweek(o_orderdate) AS dow,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
""")
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc/extract/strftime family. DuckDB dayofweek = Sunday-0;
    Spark dayofweek = Sunday-1 → subtract 1 to align with the oracle."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@query("fn_date_arith", oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY AS due,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
           date_trunc('year', o_orderdate) + INTERVAL 6 MONTH AS mid_year
    FROM orders
""")
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + date_diff. DuckDB date_diff('day', a, b) ↔
    Spark datediff(b, a) (note the argument swap)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint").alias("days_since_95"),
        (F.date_trunc("year", "o_orderdate") + F.expr("INTERVAL 6 MONTH")).alias("mid_year"),
    )


@query("fn_math", oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS bumped,
           abs(l_discount - 0.05) AS dev,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS q7,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS kbucket,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           round(pow(l_quantity, 2), 1) AS qty_sq,
           CAST(l_orderkey % 10 AS BIGINT) AS last_digit
    FROM lineitem
""")
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # decimal-exact: round() on raw doubles differs between engines at
        # representation boundaries (Spark rounds the shortest decimal
        # repr, DuckDB the binary value)
        F.round(F.col("l_extendedprice").cast("decimal(18,2)") * F.lit(1.1).cast("decimal(2,1)"), 2)
        .cast("double").alias("bumped"),
        F.abs(F.col("l_discount") - 0.05).alias("dev"),
        F.ceil(F.col("l_quantity") / 7).alias("q7"),
        F.floor(F.col("l_extendedprice") / 1000).alias("kbucket"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow("l_quantity", F.lit(2)), 1).alias("qty_sq"),
        (F.col("l_orderkey") % 10).alias("last_digit"),
    )


@query("fn_array_hof", oracle="""
    SELECT n_regionkey,
           CAST(to_json(list_transform(list_sort(list(n_name)), x -> upper(x))) AS VARCHAR) AS upper_names,
           CAST(to_json(list_filter(list_sort(list(n_nationkey)), x -> x % 2 = 0)) AS VARCHAR) AS even_keys,
           list_reduce(list_sort(list(CAST(n_nationkey AS BIGINT))), (a, b) -> a + b) AS key_sum,
           len(list(n_name)) AS n
    FROM nation GROUP BY n_regionkey
""")
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: DuckDB list_transform/filter/reduce ↔
    Spark transform/filter/aggregate — all codegen'd, no UDFs.

    Array cells are projected through to_json on BOTH sides: the driver's
    pandas canonicalizer cannot factorize raw list cells (r2 `unhashable
    type: 'list'`, same constraint agg_list hit in r1) — the HOF semantics
    are fully exercised before serialization."""
    n = load_table(spark, sf_dir, "nation")
    names = F.array_sort(F.collect_list("n_name"))
    keys = F.array_sort(F.collect_list("n_nationkey"))
    return n.groupBy("n_regionkey").agg(
        F.to_json(F.transform(names, lambda x: F.upper(x))).alias("upper_names"),
        F.to_json(F.filter(keys, lambda x: x % 2 == 0)).alias("even_keys"),
        F.aggregate(
            F.array_sort(F.collect_list(F.col("n_nationkey").cast("bigint"))),
            F.lit(None).cast("bigint"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(acc + x),
        ).alias("key_sum"),
        F.size(F.collect_list("n_name")).cast("bigint").alias("n"),
    )


@query("fn_array_ops", oracle="""
    SELECT n_nationkey,
           CAST(to_json([n_nationkey, n_regionkey]) AS VARCHAR) AS pair,
           array_contains([0, 1, 2], n_regionkey) AS in_small,
           CAST(to_json(list_append([n_regionkey], n_nationkey)) AS VARCHAR) AS appended,
           CAST(to_json(range(3)) AS VARCHAR) AS r3
    FROM nation
""")
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construct / contains / append + range (DuckDB range(3) =
    [0,1,2] ↔ Spark sequence(0,2)). Array cells serialized via to_json on
    both sides — driver canonicalizer constraint (see fn_array_hof)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(F.array("n_nationkey", "n_regionkey")).alias("pair"),
        F.array_contains(F.array(F.lit(0), F.lit(1), F.lit(2)), F.col("n_regionkey")).alias("in_small"),
        F.to_json(F.concat(F.array("n_regionkey"), F.array("n_nationkey"))).alias("appended"),
        F.to_json(F.sequence(F.lit(0), F.lit(2))).alias("r3"),
    )


@query("fn_unnest", oracle="""
    SELECT n_regionkey, unnest(list_sort(list(n_name))) AS name
    FROM nation GROUP BY n_regionkey
""")
def fn_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unnest ↔ explode."""
    n = load_table(spark, sf_dir, "nation")
    grouped = n.groupBy("n_regionkey").agg(F.array_sort(F.collect_list("n_name")).alias("names"))
    return grouped.select("n_regionkey", F.explode("names").alias("name"))


@query("fn_generate_series", oracle="""
    SELECT generate_series AS i, generate_series * generate_series AS sq
    FROM generate_series(1, 100)
""")
def fn_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate_series table function ↔ spark.range (distributed,
    partitioned by default — unlike a driver-side Python range)."""
    return spark.range(1, 101).select(
        F.col("id").alias("i"), (F.col("id") * F.col("id")).alias("sq")
    )


@query("fn_map_access", oracle="""
    SELECT n_nationkey,
           element_at(MAP {'k': n_regionkey}, 'k')[1] AS v,
           CAST(to_json(map_keys(MAP {'a': 1, 'b': 2})) AS VARCHAR) AS ks
    FROM nation
""")
def fn_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at/map_keys. The key list is serialized
    via to_json on both sides — driver canonicalizer constraint (see
    fn_array_hof)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.element_at(F.create_map(F.lit("k"), F.col("n_regionkey")), F.lit("k")).alias("v"),
        F.to_json(
            F.map_keys(F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)))
        ).alias("ks"),
    )


@query("fn_struct", oracle="""
    SELECT n_nationkey,
           CAST(to_json({'key': n_nationkey, 'name': n_name}) AS VARCHAR) AS s_json,
           struct_extract({'key': n_nationkey, 'name': n_name}, 'name') AS sname
    FROM nation
""")
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """struct_pack / dot access ↔ F.struct / getField. The struct itself
    is compared via its JSON serialization (engine-neutral canonical
    form); field access (`sname`) is compared natively."""
    n = load_table(spark, sf_dir, "nation")
    s = F.struct(F.col("n_nationkey").alias("key"), F.col("n_name").alias("name"))
    return n.select("n_nationkey", F.to_json(s).alias("s_json"), s.getField("name").alias("sname"))


@query("fn_json_extract", oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int
    FROM events
""")
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (DuckDB json extension `->`/`->>`/json_extract ↔
    Spark get_json_object/from_json)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
    )


@query("fn_cast", oracle="""
    SELECT o_orderkey,
           CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 0) AS BIGINT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           TRY_CAST(o_orderpriority AS INTEGER) AS prio_int,
           CAST(o_orderdate AS DATE) AS d
    FROM orders
""")
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST / :: / TRY_CAST. double→int rounding differs between engines
    (DuckDB: half-to-even on the binary value; Spark round: half-up on the
    shortest decimal repr) → go through DECIMAL where exactness matters."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice").cast("decimal(18,2)"), 0).cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderpriority").try_cast("int").alias("prio_int"),
        F.col("o_orderdate").cast("date").alias("d"),
    )


@query("fn_conditional", oracle="""
    SELECT o_orderkey,
           if(o_totalprice > 200000, 'hi', 'lo') AS flag,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
           greatest(o_totalprice, 100000) AS at_least_100k,
           least(o_totalprice, 100000) AS at_most_100k
    FROM orders
""")
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "hi").otherwise("lo").alias("flag"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status2"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("at_least_100k"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("at_most_100k"),
    )


@query("fn_cast_ch", oracle="""
    SELECT n_nationkey,
           CAST(n_nationkey AS VARCHAR) AS s,
           CAST(n_nationkey AS BIGINT) AS i64,
           CAST(n_nationkey AS DOUBLE) AS f64,
           CAST(FLOOR(n_nationkey / 7) AS BIGINT) AS idiv
    FROM nation
""")
def fn_cast_ch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-compat functions (chsql §2.8b: toString/toInt64/
    toFloat64/intDiv) — registered as session SQL functions, exercised
    through spark.sql to prove the registration path. Self-registers on
    the caller's session: the driver gate builds a bare SparkSession where
    get_spark's startup registration never ran (r2 UNRESOLVED_ROUTINE)."""
    ensure_chsql_functions(spark)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n_nationkey,
               toString(n_nationkey) AS s,
               toInt64(n_nationkey) AS i64,
               toFloat64(n_nationkey) AS f64,
               intDiv(n_nationkey, 7) AS idiv
        FROM nation
        """
    )


def _fmt_ch_oracle() -> str:
    from quackflight_spark.functions.chsql import _fmt_readable_sql

    size = _fmt_readable_sql(
        "b", "//", 1024, [" B", " KiB", " MiB", " GiB", " TiB", " PiB", " EiB"]
    )
    qty = _fmt_readable_sql(
        "q", "//", 1000,
        ["", " thousand", " million", " billion", " trillion", " quadrillion"],
    )
    return f"""
    WITH src AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               * (o_orderkey % 997 + 1) AS b,
             CAST(o_orderkey AS BIGINT) * (o_custkey + 1) AS q
      FROM orders
    )
    SELECT o_orderkey, b, q,
           {size} AS size_readable,
           {qty} AS qty_readable
    FROM src
    """


@query("fn_format_ch", oracle=_fmt_ch_oracle())
def fn_format_ch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse formatReadableSize/formatReadableQuantity compat (new
    r6) — the human-readable formatters chsql dashboards lean on,
    registered as session SQL functions (pure-SQL bodies, codegen'd,
    zero Python) and exercised through spark.sql to prove the
    registration path, like fn_cast_ch. Contract: 2 decimals by integer
    TRUNCATION (ClickHouse printf-rounds the double; this engine's
    variant is integer-deterministic — documented divergence), binary
    ladder for sizes (B..EiB), word ladder for quantities
    (thousand..quadrillion). Synthesized magnitudes sweep B→TiB /
    units→trillions from order keys. Pure per-row CASE/DIV/CONCAT:
    zero exchanges, whole-stage codegen, the identical ladder emitted
    with `//` runs as the DuckDB oracle."""
    ensure_chsql_functions(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_fmt")
    return spark.sql(
        """
        WITH src AS (
          SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   * (o_orderkey % 997 + 1) AS b,
                 CAST(o_orderkey AS BIGINT) * (o_custkey + 1) AS q
          FROM orders_fmt
        )
        SELECT o_orderkey, b, q,
               formatReadableSize(b) AS size_readable,
               formatReadableQuantity(q) AS qty_readable
        FROM src
        """
    )


@query("fn_date_ch", oracle="""
    SELECT o_orderkey,
           CAST(strftime(o_orderdate, '%Y%m') AS INTEGER) AS yyyymm,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS som,
           EXTRACT(year FROM o_orderdate)::INTEGER AS yr,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt
    FROM orders
""")
def fn_date_ch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse date helpers (toYYYYMM/toStartOfMonth/toYear/
    formatDateTime) through the registered chsql session functions."""
    ensure_chsql_functions(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               toYYYYMM(o_orderdate) AS yyyymm,
               toStartOfMonth(o_orderdate) AS som,
               toYear(o_orderdate) AS yr,
               formatDateTime(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS fmt
        FROM orders
        """
    )


@query("fn_url_ip", oracle="""
    SELECT p_partkey,
           CONCAT(CAST((p_partkey * 9973) % 256 AS VARCHAR), '.',
                  CAST((p_partkey * 97) % 256 AS VARCHAR), '.',
                  CAST((p_partkey * 13) % 256 AS VARCHAR), '.',
                  CAST(p_partkey % 256 AS VARCHAR)) AS ip_str,
           (((p_partkey * 9973) % 256) * 16777216
             + ((p_partkey * 97) % 256) * 65536
             + ((p_partkey * 13) % 256) * 256
             + p_partkey % 256) AS ip_num,
           regexp_extract('https://src' || CAST(p_partkey % 20 AS VARCHAR)
                          || '.example.com/p/' || CAST(p_partkey AS VARCHAR),
                          '^[a-z]+://([^/]+)', 1) AS host
    FROM part
""")
def fn_url_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/IP family (chsql §2.8b: IPv4NumToString/IPv4StringToNum/domain)
    through the registered session functions — the Spark side converts the
    synthesized ip_num back to dotted form and re-parses it, proving the
    round-trip; the oracle computes the same values arithmetically."""
    ensure_chsql_functions(spark)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey,
               IPv4NumToString(((p_partkey * 9973) % 256) * 16777216
                 + ((p_partkey * 97) % 256) * 65536
                 + ((p_partkey * 13) % 256) * 256
                 + p_partkey % 256) AS ip_str,
               IPv4StringToNum(IPv4NumToString(((p_partkey * 9973) % 256) * 16777216
                 + ((p_partkey * 97) % 256) * 65536
                 + ((p_partkey * 13) % 256) * 256
                 + p_partkey % 256)) AS ip_num,
               domain(CONCAT('https://src', CAST(p_partkey % 20 AS STRING),
                             '.example.com/p/', CAST(p_partkey AS STRING))) AS host
        FROM part
        """
    )


# prefix lengths present in the synthesized network dimension — the
# probe side explodes to exactly these, so LPM is |plens| equi-join
# probes, never a range scan
LPM_PLENS = (8, 16, 24)
_IP_NUM_SQL = """(((p_partkey * 9973) % 256) * 16777216
             + ((p_partkey * 97) % 256) * 65536
             + ((p_partkey * 13) % 256) * 256
             + p_partkey % 256)"""


@query("join_ip_lpm", oracle=f"""
    WITH ips AS (
      SELECT p_partkey, {_IP_NUM_SQL} AS ip FROM part
    ),
    nets AS (
      SELECT DISTINCT (ip - ip % 16777216) AS net, 8 AS plen,
             'AS' || CAST((ip - ip % 16777216) % 1009 AS VARCHAR) AS label
      FROM ips
      UNION
      SELECT DISTINCT (ip - ip % 65536) AS net, 16 AS plen,
             'AS' || CAST((ip - ip % 65536) % 1009 AS VARCHAR) AS label
      FROM ips WHERE ((ip - ip % 65536) / 65536) % 2 = 0
      UNION
      SELECT DISTINCT (ip - ip % 256) AS net, 24 AS plen,
             'AS' || CAST((ip - ip % 256) % 1009 AS VARCHAR) AS label
      FROM ips WHERE ((ip - ip % 256) / 256) % 4 = 0
    ),
    probes AS (
      SELECT p_partkey, ip, plen, ip - ip % (CASE plen
               WHEN 8 THEN 16777216 WHEN 16 THEN 65536 ELSE 256 END) AS net
      FROM ips, (SELECT unnest([8, 16, 24]) AS plen)
    ),
    hits AS (
      SELECT p.p_partkey, p.ip, n.net, n.plen, n.label,
             row_number() OVER (PARTITION BY p.p_partkey
                                ORDER BY n.plen DESC) AS rn
      FROM probes p JOIN nets n ON n.net = p.net AND n.plen = p.plen
    )
    SELECT p_partkey, ip AS ip_num, net, CAST(plen AS INT) AS plen, label
    FROM hits WHERE rn = 1
""")
def join_ip_lpm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match IP enrichment join (new r6) — the geo/ASN
    lookup primitive: each fact IP takes the attributes of the most
    specific CIDR network containing it. A naive LPM is a range
    predicate (net <= ip < net + 2^(32-plen)) — a non-equi join Spark
    would nest-loop; the scalable rewrite EXPLODES each probe IP to one
    masked candidate per prefix length present in the dimension
    (LPM_PLENS — at most 32, here 3) and equi-joins on (network, plen),
    then keeps the longest hit per fact. Join fan-out is |plens|, the
    dimension broadcasts while it fits (AQE), and everything is integer
    arithmetic identical in both engines.

    The network dimension is synthesized deterministically from the
    fixture's arithmetic IPs (fn_url_ip's synth): sampled /8s, /16s and
    /24s with value-derived labels — so nested prefixes exist and the
    longest-match rule is actually exercised (a /24 hit must shadow the
    /16 and /8 over the same address)."""
    from pyspark.sql import Window as W

    ip = (
        ((F.col("p_partkey") * 9973) % 256) * 16777216
        + ((F.col("p_partkey") * 97) % 256) * 65536
        + ((F.col("p_partkey") * 13) % 256) * 256
        + F.col("p_partkey") % 256
    )
    ips = load_table(spark, sf_dir, "part").select(
        "p_partkey", ip.alias("ip")
    )

    def nets_of(block: int, plen: int, keep_mod: int) -> DataFrame:
        # sample by NETWORK value (not by source row) so not every block
        # of a given width exists — facts then fall through to the next
        # shorter prefix and the longest-match rule is really exercised
        net = F.col("ip") - F.col("ip") % block
        return (
            ips.select(
                net.alias("net"),
                F.lit(plen).alias("plen"),
                F.concat(F.lit("AS"), (net % 1009).cast("string")).alias("label"),
            )
            .filter((F.col("net") / block).cast("bigint") % keep_mod == 0)
            .distinct()
        )

    nets = (
        nets_of(16777216, 8, 1)
        .unionByName(nets_of(65536, 16, 2))
        .unionByName(nets_of(256, 24, 4))
    )
    blocks = {8: 16777216, 16: 65536, 24: 256}
    probes = ips.select(
        "p_partkey",
        "ip",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("plen"),
                        (F.col("ip") - F.col("ip") % blocks[p]).alias("net"),
                    )
                    for p in LPM_PLENS
                ]
            )
        ).alias("c"),
    ).select("p_partkey", "ip", F.col("c.plen").alias("plen"), F.col("c.net").alias("net"))
    w = W.partitionBy("p_partkey").orderBy(F.desc("plen"))
    return (
        probes.join(nets, ["net", "plen"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            F.col("ip").alias("ip_num"),
            "net",
            F.col("plen").cast("int").alias("plen"),
            "label",
        )
    )


@query("fn_date_spine", oracle="""
    WITH bounds AS (
      SELECT CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS lo,
             CAST(max(CAST(ts AS TIMESTAMP)) AS DATE) AS hi
      FROM events
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS d
      FROM bounds
    )
    SELECT d,
           CAST(date_diff('day', DATE '1970-01-05', d) % 7 AS INT) AS dow,
           date_diff('day', DATE '1970-01-05', d) % 7 < 5 AS is_weekday,
           CAST(CAST(strftime(d, '%Y%m%d') AS INT) AS INT) AS date_key,
           CAST(date_trunc('month', d) AS DATE) AS month_start,
           d = CAST(date_trunc('week', d) AS DATE) AS is_week_start
    FROM spine
""")
def fn_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine (date dimension) generation (new r7): one row per
    day spanning the fact table's own range, with the standard dim_date
    attributes — DOW, weekday flag, yyyymmdd surrogate key, month
    anchor, week-start flag. The utility table every warehouse joins
    for gap-free calendars, fiscal rollups and as-of alignment
    (timeseries_gapfill builds its dense grid the same way; this is
    the reusable dimension as a first-class key).

    Determinism: DOW is the epoch-day mod-7 arithmetic (Monday-anchored
    1970-01-05 — immune to engine DOW numbering, the
    seasonal_decompose recipe); the surrogate key is a string-format
    round-trip both engines spell identically; week start compares d
    against its own date_trunc('week') so engine week conventions
    cancel out.

    Scale shape: the spine is a generate_series explode over ONE 1-row
    bounds aggregate — size bounded by the calendar, never the corpus;
    at 100 TB the bounds agg is the only thing that reads the facts,
    and even that is prunable to partition metadata."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    dow = F.pmod(
        F.datediff(F.col("d"), F.lit("1970-01-05").cast("date")), F.lit(7)
    ).cast("int")
    return spine.select(
        "d",
        dow.alias("dow"),
        (dow < 5).alias("is_weekday"),
        F.date_format("d", "yyyyMMdd").cast("int").alias("date_key"),
        F.date_trunc("month", F.col("d")).cast("date").alias("month_start"),
        (
            F.col("d") == F.date_trunc("week", F.col("d")).cast("date")
        ).alias("is_week_start"),
    )


TIES_LIMIT = 10  # top-N WITH TIES target


@query("orderby_limit_ties", oracle=f"""
    WITH ranked AS (
      SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             rank() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC)
               AS rk
      FROM orders
    )
    SELECT o_custkey, CAST(price AS DOUBLE) AS price
    FROM ranked WHERE rk <= {TIES_LIMIT}
""")
def orderby_limit_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N WITH TIES (new r7): ANSI `FETCH FIRST n ROWS WITH TIES` —
    rows tying the n-th value all survive, so the result is a pure
    function of the DATA (a bare LIMIT cuts ties arbitrarily by
    partition order — the nondeterminism bug in every naive top-N
    report). Spark SQL has no WITH TIES clause; the dialect frontend's
    rewrite is rank() ≤ n — which is also exactly DuckDB's documented
    expansion, so the oracle uses the same spelling.

    Scale shape: rank over a global ORDER BY is the textbook
    single-partition window hazard; at fixture scale Catalyst handles
    it, and at 100 TB the idiom is the two-phase top-k the repo's
    win_ntile/events_rfm machinery demonstrates (per-partition top-n,
    then rank the bounded union — lossless because a global top-n row
    must be a partition top-n row). Prices compare as exact DECIMAL so
    the tie set is engine-identical; only the EMITTED price casts to
    DOUBLE on both texts (decimal output = canonicalizer hazard)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    from pyspark.sql import Window as W

    # two-phase lossless: per-partition top-N first (mapPartitions-free —
    # a partition-local sort prune via repartition+local limit would need
    # RDD surgery; the bounded pre-filter below keeps it declarative),
    # then the global rank over the pruned candidate set
    # rank(), NOT row_number(): a partition whose boundary price ties
    # must keep ALL tie rows locally or the global tie set loses members
    per_part = o.withColumn(
        "rk_local",
        F.rank().over(
            W.partitionBy(F.spark_partition_id()).orderBy(F.desc("price"))
        ),
    ).filter(F.col("rk_local") <= TIES_LIMIT)
    ranked = per_part.withColumn(
        "rk", F.rank().over(W.orderBy(F.desc("price")))
    )
    return ranked.filter(F.col("rk") <= TIES_LIMIT).select(
        "o_custkey", F.col("price").cast("double").alias("price")
    )
