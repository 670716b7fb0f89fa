"""W1-W6: window functions.

Reference: ``pyLibrary/queries/windows.py`` — Q.window(data, {edges, sort,
value, aggregate, range: {min, max}}) adds a column computed as an
aggregate over a sorted partition with a row frame; plus running
accumulations when no range given.

Direct ``pyspark.sql.Window`` match. Determinism rule for oracle parity:
every ORDER BY inside a window carries a unique tiebreaker (the natural
sort of the reference is stable list order, which SQL engines don't have).
Running sums go through decimal so frame association can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modevetl_spark.queries import prep
from modevetl_spark.queries._registry import make_registry
from modevetl_spark.sources.catalog import load

QUERIES, ORACLE, q = make_registry()


_MOVAVG_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       ROUND(CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 6) AS moving_avg_price
FROM lineitem
WHERE l_suppkey <= 5
WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_orderkey, l_linenumber
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""
# (the engine folds with try_cast / the oracle with TRY_CAST: identical
# admitted range, and a 1e300 row NULLs its term instead of aborting
# the job — the filter above excludes the sweep twin's fresh-keyed
# hostile rows, but a production dirty row can carry any suppkey)


@q("q_window_moving_avg", oracle_sql=_MOVAVG_ORACLE)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: windowed aggregate with a bounded row frame
    (range: {min: -3, max: 0} in Qb terms)."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 5)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber")
        .rowsBetween(-3, 0)
    )
    # decimal SUM / COUNT (not AVG) so both engines do the same exact-sum
    # -> double -> divide pipeline; Spark's AVG(decimal) yields a Decimal
    # result type that pandas-compares unequal to DuckDB's double.
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum(F.col("l_extendedprice").try_cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("moving_avg_price"),
    )


_CUMSUM_ORACLE = """
SELECT o_custkey, o_orderkey,
       ROUND(CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(18,6)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE), 2) AS lifetime_value
FROM orders
"""


@q("q_window_cumsum", oracle_sql=_CUMSUM_ORACLE)
def window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: cumulative running total (Qb range {min: None, max: 0})."""
    prep(spark)
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").try_cast("decimal(18,6)")).over(w).cast("double"),
            2,
        ).alias("lifetime_value"),
    )


_RANK_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
"""


@q("q_window_rank", oracle_sql=_RANK_ORACLE)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: row numbering / rank / dense rank."""
    prep(spark)
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


_LAGLEAD_ORACLE = """
SELECT event_id, user_id,
       CAST(ts AS TIMESTAMP) AS ts,
       LAG(event_type) OVER w AS prev_type,
       LEAD(event_type) OVER w AS next_type,
       FIRST_VALUE(event_type) OVER w AS first_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@q("q_window_lag_lead", oracle_sql=_LAGLEAD_ORACLE)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: first/last/lag/lead in a sorted partition (windows.First/Last)."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
    )


_PCT_ORACLE = """
SELECT c_custkey,
       ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
       NTILE(4) OVER w AS quartile,
       ROUND(CUME_DIST() OVER w, 9) AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
"""


@q("q_window_percent_rank", oracle_sql=_PCT_ORACLE)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: percent-of-partition machinery: percent_rank / ntile /
    cume_dist — same SQL semantics, computed scale-safe (round 6).

    The order key (c_acctbal, c_custkey) is a TOTAL order (custkey is
    unique), so the three window functions collapse to closed forms
    over the global rank: percent_rank = (rn−1)/(n−1), cume_dist =
    rn/n (no ties ⇒ the ≤-count is the rank), ntile =
    ntile_from_rank. The rank is operators/ranking.global_rank (one
    range exchange over the CUSTOMER-cardinality input — the naive
    `Window.orderBy` funnels the whole table through one task, and
    customers grow with the data), n is a one-row broadcast count.
    Bit parity: both engines divide the SAME integers in IEEE double
    (correctly-rounded), so round(·, 9) matches the windowed oracle
    exactly. Plan-gated by the registry-wide no-global-window test."""
    prep(spark)
    from modevetl_spark.operators.ranking import global_rank, ntile_from_rank

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = global_rank(c, ["c_acctbal", "c_custkey"], rank_col="_rn")
    n1 = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    return ranked.crossJoin(F.broadcast(n1)).select(
        "c_custkey",
        F.round(
            F.when(F.col("_n") > 1, (F.col("_rn") - 1) / (F.col("_n") - 1))
            .otherwise(F.lit(0.0)),
            9,
        ).alias("pct_rank"),
        ntile_from_rank("_rn", "_n", 4).cast("int").alias("quartile"),
        F.round(F.col("_rn") / F.col("_n"), 9).alias("cume"),
    )


_TOPK_ORACLE = """
SELECT o_orderstatus, o_orderpriority, o_orderkey, o_totalprice
FROM (
    SELECT o_orderstatus, o_orderpriority, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderstatus, o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
)
WHERE rn <= 3
"""


@q("q_topk_per_group", oracle_sql=_TOPK_ORACLE)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: top-k per group (sort + take-k idiom). Spark executes this as a
    partial top-k per partition before the shuffle (WindowGroupLimit), so
    it scales without materializing full sorted groups."""
    prep(spark)
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus", "o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_orderstatus", "o_orderpriority", "o_orderkey", "o_totalprice")
    )


_NTILE_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       ntile(4) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey) AS quartile
FROM orders
"""


@q("q_window_ntile", oracle_sql=_NTILE_ORACLE)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3+: NTILE bucketing — equi-depth quartiles of order value within
    each priority class. The ORDER BY carries o_orderkey as a tie-break so
    bucket assignment is deterministic across engines and shuffle orders.
    Scale note: ntile needs the full partition ordered — fine here because
    the window key (priority) has tiny cardinality but wide partitions are
    sorted spill-safely by Spark's external sorter; for a quantile-bucket
    over the WHOLE table at 100 TB use q_agg_approx_sketches percentiles
    instead of a single-partition window."""
    prep(spark)
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
    )


_RANGE_FRAME_ORACLE = """
SELECT o_custkey, o_orderkey,
       COUNT(*) OVER w AS n_orders_30d,
       ROUND(CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(18,6))) OVER w
                  AS DOUBLE), 2) AS spend_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
"""


@q("q_window_range_frame", oracle_sql=_RANGE_FRAME_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 value-range variant: the reference's ``range: {min, max}`` is a
    VALUE frame, not a row frame — trailing 30-day order count and spend
    per customer, frame bounds measured in epoch seconds.

    Value frames need no tiebreaker: peers (equal order dates) are all
    in-frame by definition in both engines, so ties are deterministic by
    construction. The spend sum rides the decimal pipeline like every
    windowed float aggregate here — with a try_cast fold (mirrored as
    TRY_CAST in the oracle): a raw decimal cast of the data-derived
    price aborts the whole job on one 1e300 row (the r11 crash class;
    this key was missed because engine-only sweeps used .count(), which
    let Catalyst prune the unconsumed window projection entirely).

    Scale shape: one shuffle on the partition key, then a sorted
    single-pass frame scan per partition — identical to a row frame."""
    prep(spark)
    o = load(spark, sf_dir, "orders").withColumn(
        "ord_sec", F.unix_timestamp("o_orderdate")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ord_sec")
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.round(
            F.sum(F.col("o_totalprice").try_cast("decimal(18,6)"))
            .over(w)
            .cast("double"),
            2,
        ).alias("spend_30d"),
    )
