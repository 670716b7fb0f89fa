"""F1-F8: scalar function families.

Reference: ``pyLibrary/strings.py`` (string ops), ``filters.py`` regex,
``times/dates.py``+``durations.py`` (epoch-ms dates, calendar-month
Duration arithmetic), ``maths/__init__.py`` (significant-digit round),
``cnv.py`` (JSON <-> object), ``struct/`` (deep arrays, leaves),
``collections/multiset.py`` (value->count bag).

All pure Catalyst expressions (whole-stage codegen'd) — no Python UDFs in
any of these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modevetl_spark.queries import prep
from modevetl_spark.queries._registry import make_registry
from modevetl_spark.sources.catalog import load

QUERIES, ORACLE, q = make_registry()


_STRING_ORACLE = """
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(p_brand) AS brand_upper,
       p_brand || '|' || p_type AS brand_type,
       CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo,
       substring(p_type, 1, 5) AS type_prefix,
       trim(p_name) AS name_trim,
       length(p_name) AS name_len,
       strpos(p_type, 'ECONOMY') AS econ_pos,
       left(p_brand, 5) AS brand_left,
       right(p_brand, 2) AS brand_right,
       replace(p_brand, 'Brand#', 'B') AS brand_short
FROM part
"""


@q("q_string_funcs", oracle_sql=_STRING_ORACLE)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: lower/upper/concat/prefix/find/substring/trim/left/right."""
    prep(spark)
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.concat(F.col("p_brand"), F.lit("|"), F.col("p_type")).alias("brand_type"),
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias("is_promo"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.trim("p_name").alias("name_trim"),
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_type"), "ECONOMY").alias("econ_pos"),
        F.expr("left(p_brand, 5)").alias("brand_left"),
        F.expr("right(p_brand, 2)").alias("brand_right"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
    )


_REGEX_ORACLE = r"""
SELECT p_partkey,
       regexp_extract(p_type, '^(\w+)', 1) AS first_word,
       regexp_extract(p_brand, '#(\d+)$', 1) AS brand_num,
       regexp_matches(p_type, 'ECONOMY|PROMO') AS is_cheap,
       regexp_replace(p_type, '\s+', '_', 'g') AS type_snake
FROM part
WHERE regexp_matches(p_name, '^[a-z]')
"""


@q("q_regex_extract", oracle_sql=_REGEX_ORACLE)
def regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: regex filter / extract / expand (``filters.py`` regex op)."""
    prep(spark)
    p = load(spark, sf_dir, "part")
    return p.where(F.col("p_name").rlike("^[a-z]")).select(
        "p_partkey",
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("p_brand", r"#(\d+)$", 1).alias("brand_num"),
        F.col("p_type").rlike("ECONOMY|PROMO").alias("is_cheap"),
        F.regexp_replace("p_type", r"\s+", "_").alias("type_snake"),
    )


_DATE_ORACLE = """
SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS order_quarter,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS due_date,
       CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS order_week,
       CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT) AS dow_sunday0,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2, 3, 4, 5
"""


@q("q_date_trunc_agg", oracle_sql=_DATE_ORACLE)
def date_trunc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: Date.floor (day/week/month/quarter) + calendar-month Duration
    arithmetic (add_months ≡ the reference's month-aware Duration)."""
    prep(spark)
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_trunc("quarter", "o_orderdate").alias("order_quarter"),
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.add_months("o_orderdate", 3).cast("timestamp").alias("due_date"),
            F.date_trunc("week", "o_orderdate").alias("order_week"),
            (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow_sunday0"),
        )
        .groupBy(
            "order_quarter", "order_year", "due_date", "order_week", "dow_sunday0"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


_MATH_ORACLE = """
SELECT o_orderkey,
       round(o_totalprice, 1) AS price_r1,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
       round(ln(o_totalprice), 9) AS price_ln,
       round(log10(o_totalprice), 9) AS price_log10,
       round(sqrt(o_totalprice), 9) AS price_sqrt,
       abs(o_totalprice - 100000) AS price_dist,
       CAST(o_orderkey % 7 AS BIGINT) AS key_mod
FROM orders
WHERE o_orderkey <= 1000
"""


@q("q_math_round", oracle_sql=_MATH_ORACLE)
def math_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: round/floor/ceil/log/sqrt/abs/mod (``maths/__init__.py``)."""
    prep(spark)
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_r1"),
        F.floor("o_totalprice").alias("price_floor"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.round(F.log("o_totalprice"), 9).alias("price_ln"),
        F.round(F.log10("o_totalprice"), 9).alias("price_log10"),
        F.round(F.sqrt("o_totalprice"), 9).alias("price_sqrt"),
        F.abs(F.col("o_totalprice") - 100000).alias("price_dist"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod"),
    )


_NULL_ORACLE = """
SELECT l_orderkey, l_linenumber,
       COALESCE(nullif(l_returnflag, 'N'), '<none>') AS flag_or_default,
       CASE WHEN l_discount = 0 THEN NULL
            ELSE l_extendedprice / nullif(l_discount, 0) END AS price_per_disc,
       (nullif(l_returnflag, 'N') IS NULL) AS was_defaulted
FROM lineitem
WHERE l_orderkey <= 500
"""


@q("q_null_default", oracle_sql=_NULL_ORACLE)
def null_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: coalesce / default / null-safe division guard (the reference's
    ``div`` with default; try_divide analog)."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 500)
    flag = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(flag, F.lit("<none>")).alias("flag_or_default"),
        F.when(
            F.col("l_discount") != 0, F.col("l_extendedprice") / F.col("l_discount")
        ).alias("price_per_disc"),
        flag.isNull().alias("was_defaulted"),
    )


_JSON_ORACLE = """
SELECT event_id,
       TRY_CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END AS BIGINT)
           AS k_value
FROM events
WHERE TRY_CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END AS BIGINT) > 50
"""


@q("q_json_extract", oracle_sql=_JSON_ORACLE)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: CNV.JSON2object — JSON path extraction over the embedded-JSON
    ``events.props`` column (from_json/schema_of_json forms are
    unit-tested; get_json_object is the pushdown-friendly scalar form).

    Degenerate-input contract: Spark get_json_object returns NULL on
    NULL/malformed JSON and try_cast NULLs non-numeric payloads; the
    oracle mirrors with a json_valid() guard (DuckDB ->> RAISES on
    malformed JSON — the empty-string twin row killed the oracle,
    COVERAGE.md N10) + TRY_CAST. Value-neutral on clean fixtures."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("long")
    return ev.select("event_id", k.alias("k_value")).where(F.col("k_value") > 50)


_ARRAY_ORACLE = """
SELECT token, COUNT(*) AS n
FROM (
    SELECT unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 100
)
WHERE token <> ''
GROUP BY token
"""


@q("q_array_explode", oracle_sql=_ARRAY_ORACLE)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: StructList map/flatten/leaves ≡ split + explode + re-aggregate."""
    prep(spark)
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_MAP_ORACLE = """
SELECT user_id,
       string_agg(event_type || ':' || CAST(n AS VARCHAR), ','
                  ORDER BY event_type) AS type_counts
FROM (
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events
    GROUP BY user_id, event_type
)
GROUP BY user_id
"""


@q("q_map_counts", oracle_sql=_MAP_ORACLE)
def map_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: multiset (value -> count bag, ``collections/multiset.py``),
    serialized as a sorted k:v string for engine-neutral hashing; the
    genuine MapType form is unit-tested in tests/test_operators.py."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.concat(F.col("event_type"), F.lit(":"), F.col("n"))
                )
            ),
            ",",
        ).alias("type_counts")
    )


_LEAVES_ORACLE = """
WITH j AS (
    SELECT event_id,
           TRY_CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END AS BIGINT)
               AS k
    FROM events
    WHERE event_id < 2000
)
SELECT event_id, 'j.k' AS path, CAST(k AS VARCHAR) AS value
FROM j
WHERE k IS NOT NULL
"""


@q("q_leaves", oracle_sql=_LEAVES_ORACLE)
def leaves_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 ``leaves()``: deep-flatten a nested document into (dot-path,
    value) rows (``pyLibrary/struct`` leaves view) — here over the JSON
    ``props`` column parsed into a real struct first.

    The oracle guards with json_valid() + TRY_CAST (DuckDB ->> RAISES
    on the dirty twin's empty-string props where Spark from_json yields
    a NULL struct that leaves() drops — COVERAGE.md N10) and filters on
    the parsed BIGINT, matching from_json's coercion (non-integer k →
    NULL → no leaf). Value-neutral on clean fixtures."""
    from modevetl_spark.operators.nested import leaves

    prep(spark)
    ev = load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    nested = ev.select(
        "event_id", F.from_json("props", "k bigint").alias("j")
    )
    return leaves(nested, ["event_id"])
