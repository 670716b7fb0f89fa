"""S1/S2 + P1-P4: scan/projection, computed select, compound predicates,
incremental (high-water-mark) pull.

Reference: ``pyLibrary/queries/es_query_setop.py`` (scan with field
projection pushed into ES), ``pyLibrary/queries/filters.py`` (the boolean
expression tree: and/or/not, term, range, in, exists, missing, prefix,
regex), ``MoDevETL/hierarchy.py get_pending`` (modified_ts > last_run).

Spark-first: all of these are pure Catalyst expressions — predicate
pushdown and column pruning reach the parquet scan (verified via
``.explain``: PushedFilters / ReadSchema), so at 100 TB the scan reads only
the projected columns of the row groups that survive the filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modevetl_spark.queries import prep
from modevetl_spark.queries._registry import make_registry
from modevetl_spark.sources.catalog import load

QUERIES, ORACLE, q = make_registry()


_SCAN_ORACLE = """
SELECT o_orderkey AS order_id,
       o_orderstatus AS status,
       o_totalprice AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
"""


@q("q_scan_project", oracle_sql=_SCAN_ORACLE)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: deep/dot-path projection with rename ({"name","value"} select)."""
    prep(spark)
    return (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
    )


_COMPUTED_ORACLE = """
SELECT l_orderkey,
       l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
       l_quantity * 2.5 + 1 AS scaled_qty,
       l_returnflag || '/' || l_linestatus AS flag_status
FROM lineitem
WHERE l_linenumber <= 2
"""


@q("q_select_computed", oracle_sql=_COMPUTED_ORACLE)
def select_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: computed select expressions ({"add": ...} / MVEL analog).

    Per-row double arithmetic in the same operation order is bit-identical
    across engines (IEEE 754) — no rounding compat needed on non-aggregated
    expressions.
    """
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    return li.where(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "net_price"
        ),
        (
            F.col("l_extendedprice")
            * (F.lit(1) - F.col("l_discount"))
            * (F.lit(1) + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity") * 2.5 + 1).alias("scaled_qty"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


_FILTER_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE (o_orderstatus IN ('O', 'F'))
  AND (o_totalprice BETWEEN 50000 AND 200000)
  AND NOT (o_orderpriority = '5-LOW')
  AND o_orderpriority LIKE '1-%'
  AND o_custkey IS NOT NULL
  AND regexp_matches(o_orderpriority, '^[0-9]-')
"""


@q("q_filter_compound", oracle_sql=_FILTER_ORACLE)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4: the full boolean expression tree of ``filters.py`` — and/or/
    not, in/terms, range, term, prefix, regex, exists — in one predicate.
    """
    prep(spark)
    o = load(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(50000, 200000)
        & ~(F.col("o_orderpriority") == "5-LOW")
        & F.col("o_orderpriority").startswith("1-")
        & F.col("o_custkey").isNotNull()
        & F.col("o_orderpriority").rlike("^[0-9]-")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


_INCR_ORACLE = """
SELECT event_id,
       CAST(ts AS TIMESTAMP) AS ts,
       user_id,
       event_type,
       value
FROM events
WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
"""


@q("q_incremental_pull", oracle_sql=_INCR_ORACLE)
def incremental_pull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/T1: high-water-mark pull — only docs newer than the stored
    watermark (``hierarchy.py get_pending``: modified_ts > last_run).

    Whole-second watermark so ns->us truncation can't move rows across the
    boundary (events.ts is ns in parquet; Spark truncates to us).
    """
    prep(spark)
    ev = load(spark, sf_dir, "events")
    return ev.where(F.col("ts") >= F.to_timestamp(F.lit("2024-01-20 00:00:00"))).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


_SNAPSHOT_DIFF_ORACLE = """
WITH old_snap AS (
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
),
new_snap AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
       END AS change_type,
       COALESCE(n.o_totalprice, o.o_totalprice) AS o_totalprice
FROM old_snap o
FULL OUTER JOIN new_snap n USING (o_orderkey)
WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
           WHEN n.o_orderkey IS NULL THEN 'removed'
           WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
      END IS NOT NULL
"""


@q("q_snapshot_diff", oracle_sql=_SNAPSHOT_DIFF_ORACLE)
def snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+ change-data detection: diff two keyed snapshots into
    added/removed/changed rows (the reconcile step of the reference's
    pull -> compare -> bulk-upsert loop, as one full-outer join)."""
    prep(spark)
    from modevetl_spark.operators.diff import snapshot_diff

    o = load(spark, sf_dir, "orders")
    old_snap = o.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    new_snap = o.where(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.1
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff(old_snap, new_snap, keys=["o_orderkey"])
