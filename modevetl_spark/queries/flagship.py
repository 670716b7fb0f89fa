"""M1 flagship: densified revenue cube (SURVEY.md §7 M1).

One query exercising the whole reference essence: scan -> filter -> 4-way
join -> computed aggregate -> time+set edge domains -> dense cube
(``pyLibrary/queries/cube.py`` semantics: every region x month coordinate
exists, empty ones with revenue 0 / item count 0).

Scale notes: region/nation/customer are the small side of every join —
Catalyst broadcast-joins them under the configured threshold; the only big
shuffle is the groupBy on (region, month), whose key cardinality is tiny
(5 x 24), so partial aggregation collapses almost all rows map-side. The
densify grid (120 rows) is a broadcast left join. At 100 TB the plan shape
is unchanged: one wide shuffle of pre-aggregated partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modevetl_spark.functions.compat import dsum_money, money, sql_dsum_money
from modevetl_spark.operators.cube import densify, time_domain
from modevetl_spark.queries import prep
from modevetl_spark.queries._registry import make_registry
from modevetl_spark.sources.catalog import load

QUERIES, ORACLE, q = make_registry()

_START, _STOP = "1996-01-01", "1998-01-01"

_FLAGSHIP_ORACLE = f"""
WITH months AS (
    SELECT m AS order_month
    FROM generate_series(TIMESTAMP '{_START}',
                         TIMESTAMP '{_STOP}' - INTERVAL 1 MONTH,
                         INTERVAL 1 MONTH) AS t(m)
),
agg AS (
    SELECT r_name,
           date_trunc('month', o_orderdate) AS order_month,
           {sql_dsum_money('revenue')},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '{_START}'
      AND o_orderdate <  TIMESTAMP '{_STOP}'
    GROUP BY 1, 2
)
SELECT r.r_name,
       m.order_month,
       COALESCE(a.revenue, 0.0) AS revenue,
       COALESCE(a.n_items, 0) AS n_items
FROM region r
CROSS JOIN months m
LEFT JOIN agg a ON a.r_name = r.r_name AND a.order_month = m.order_month
"""


@q("q_flagship_revenue_cube", oracle_sql=_FLAGSHIP_ORACLE)
def flagship_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(_START)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(_STOP)))
    )
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    agg = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name"),
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        )
        .agg(
            F.round(
                F.sum(money("l_extendedprice", "l_discount")).cast("double"), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )

    grid = [
        region.select("r_name"),
        time_domain(spark, "order_month", _START, _STOP, "1 MONTH"),
    ]
    return densify(
        grid,
        agg,
        keys=["r_name", "order_month"],
        fill={"revenue": F.lit(0.0), "n_items": F.lit(0).cast("long")},
    )


_CUTOFF = "1998-06-01"

_SHIP_PRIORITY_ORACLE = f"""
SELECT l_orderkey,
       {sql_dsum_money('revenue')},
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@q("q_tpch_shipping_priority", oracle_sql=_SHIP_PRIORITY_ORACLE)
def tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+: the TPC-H Q3 shape — selective dimension filter, two big-table
    joins, grouped revenue, global top-10. The plan we want at 100 TB:

    - customer filtered to one segment projects down to c_custkey only and
      is broadcast (explicitly — the filter hides its size from stats);
      orders never shuffles for that join.
    - orders⋈lineitem is the one real shuffle, on l_orderkey/o_orderkey —
      both filters are pushed into the parquet scans first.
    - the grouped aggregate reuses the orderkey shuffle (group key starts
      with l_orderkey), and the final ORDER BY..LIMIT executes as
      TakeOrderedAndProject, never a global sort.
    """
    prep(spark)
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit(_CUTOFF))
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit(_CUTOFF))
    )
    j = li.join(
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        dsum_money("l_extendedprice", "l_discount").alias("revenue")
    )
    return agg.orderBy(
        F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey")
    ).limit(10)


_Q5_START, _Q5_STOP = "1996-01-01", "1997-01-01"

_LOCAL_SUPPLIER_ORACLE = f"""
SELECT n_name,
       {sql_dsum_money('revenue')}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '{_Q5_START}'
  AND o_orderdate <  TIMESTAMP '{_Q5_STOP}'
GROUP BY n_name
"""


@q("q_tpch_local_supplier", oracle_sql=_LOCAL_SUPPLIER_ORACLE)
def tpch_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+: the TPC-H Q5 shape — local supplier volume. Six tables, one
    non-key correlation (customer and supplier must share a nation), a
    region filter that reaches the fact only THROUGH the supplier
    dimension, and a 25-key revenue rollup. The hardest join-planning
    shape in the registry.

    The plan we want at 100 TB:

    - region ⋈ nation collapses to a broadcast ~5-row nation filter;
      supplier (with nationkey) broadcasts onto the fact.
    - customer projects to (custkey, nationkey) and broadcasts onto the
      year-filtered orders — orders never shuffles for it; the
      c_nationkey = s_nationkey correlation is evaluated as part of the
      supplier broadcast join, never as a post-join filter on a wider
      intermediate.
    - lineitem ⋈ orders on the order key is the ONE fact shuffle (at
      100 TB a year of orders is not broadcastable); the 25-nation
      aggregate collapses map-side before its bounded-key exchange.
    - the orderdate range filter pushes into the orders parquet scan.
    """
    prep(spark)
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(_Q5_START)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(_Q5_STOP)))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nr = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    j = (
        li.join(
            o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy("n_name").agg(
        dsum_money("l_extendedprice", "l_discount").alias("revenue")
    )


_LARGE_VOLUME_ORACLE = """
WITH big AS (
    SELECT l_orderkey, SUM(l_quantity) AS qty_total
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 300
)
SELECT c_name, o_orderkey, o_orderdate, o_totalprice, qty_total
FROM orders
JOIN big      ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@q("q_tpch_large_volume", oracle_sql=_LARGE_VOLUME_ORACLE)
def tpch_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+: the TPC-H Q18 shape — large-volume customers, i.e. a HAVING
    aggregate subquery driving the main join. The registry's other TPC-H
    shapes filter with predicates; this one filters with an AGGREGATE,
    the pattern behind every "entities whose rollup exceeds X" report.

    The plan we want at 100 TB: the quantity rollup and the orders join
    both key on the order key, so the aggregate's shuffle partitioning is
    reused by the join (co-partitioned, no second fact shuffle); the
    HAVING collapses the build side to the rare heavy orders, customer
    broadcasts, and the top-20 is TakeOrderedAndProject. l_quantity is
    integral, so its double sum is exact under any accumulation order —
    no decimal pipeline needed on the HAVING boundary."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_total"))
        .where(F.col("qty_total") > 300)
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "qty_total"
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )
