"""O1-O5: sort / limit / set operations.

Reference: ``Q.sort(data, [{field, sort: ±1}])`` with Null sorting first
(Null is less-than-everything in struct ordering); query ``limit``;
StructList concat; frontier set difference in ``hierarchy.py``.

Sort-only output is invisible to an order-insensitive checker, so each
sort query composes sort+limit (which rows survive proves the ordering).
Null-first semantics are pinned explicitly (asc_nulls_first) to match the
reference and declared in the oracle SQL (NULLS FIRST).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modevetl_spark.queries import prep
from modevetl_spark.queries._registry import make_registry
from modevetl_spark.sources.catalog import load

QUERIES, ORACLE, q = make_registry()


_SORT_MULTI_ORACLE = """
SELECT o_orderkey, o_orderstatus, nullif(o_orderpriority, '5-LOW') AS prio,
       o_totalprice
FROM orders
ORDER BY nullif(o_orderpriority, '5-LOW') ASC NULLS FIRST,
         o_totalprice DESC,
         o_orderkey
LIMIT 100
"""


@q("q_sort_multi", oracle_sql=_SORT_MULTI_ORACLE)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-key sort with pinned null-first ordering (Null sorts
    before everything, like the reference's struct ordering)."""
    prep(spark)
    o = load(spark, sf_dir, "orders").withColumn(
        "prio", F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    )
    return (
        o.orderBy(
            F.col("prio").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .select("o_orderkey", "o_orderstatus", "prio", "o_totalprice")
        .limit(100)
    )


_SORT_LIMIT_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@q("q_sort_limit", oracle_sql=_SORT_LIMIT_ORACLE)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global top-k — Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge of k rows), never a full global sort."""
    prep(spark)
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


_UNION_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderstatus = 'P'
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE o_totalprice > 400000
"""


@q("q_union", oracle_sql=_UNION_ORACLE)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: concat (StructList +) ≡ UNION ALL, overlapping inputs kept as
    duplicates (bag semantics, like list concatenation)."""
    prep(spark)
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return o.where(F.col("o_orderstatus") == "P").unionByName(
        o.where(F.col("o_totalprice") > 400000)
    )


_EXCEPT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@q("q_except", oracle_sql=_EXCEPT_ORACLE)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: set difference (hierarchy frontier bookkeeping) ≡ EXCEPT."""
    prep(spark)
    o = load(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(op)


_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@q("q_intersect", oracle_sql=_INTERSECT_ORACLE)
def intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: set intersection on ids."""
    prep(spark)
    o = load(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)
