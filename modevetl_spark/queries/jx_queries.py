"""Driver-gated queries expressed in the Qb/jx JSON dialect and executed
through the ``plans.jx.QB`` front-end — proving the reference's own query
API produces oracle-correct plans (not just the hand-written DataFrame
code).

Aggregate choice note: these use jx's plain aggregates (no decimal compat
layer, faithfully reference-shaped), so the measures are chosen to be
order-independent: counts and sums of the integral l_quantity column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modevetl_spark.plans.jx import QB
from modevetl_spark.queries import prep
from modevetl_spark.queries._registry import make_registry
from modevetl_spark.sources.catalog import load

QUERIES, ORACLE, q = make_registry()


_JX_CUBE_ORACLE = """
WITH flags AS (SELECT unnest(['A', 'N', 'R']) AS flag),
     agg AS (
         SELECT l_returnflag AS flag,
                COUNT(*) AS n,
                SUM(l_quantity) AS qty
         FROM lineitem
         WHERE l_discount >= 0.05
         GROUP BY 1
     )
SELECT f.flag, COALESCE(a.n, 0) AS n, a.qty
FROM flags f LEFT JOIN agg a USING (flag)
"""


@q("q_jx_cube", oracle_sql=_JX_CUBE_ORACLE)
def jx_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qb edges query (dense set domain) via the JSON front-end."""
    prep(spark)
    return QB(spark, sf_dir=sf_dir).run(
        {
            "from": "lineitem",
            "edges": [
                {
                    "name": "flag",
                    "value": "l_returnflag",
                    "domain": {"type": "set", "partitions": ["A", "N", "R"]},
                }
            ],
            "select": [
                {"name": "n", "aggregate": "count"},
                {"name": "qty", "value": "l_quantity", "aggregate": "sum"},
            ],
            "where": {"gte": {"l_discount": 0.05}},
        }
    )


_JX_SETOP_ORACLE = """
SELECT o_orderkey AS id,
       o_totalprice AS price,
       CASE WHEN o_totalprice >= 250000 THEN 'big' ELSE 'small' END AS size
FROM orders
WHERE o_orderstatus = 'F'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND NOT (o_totalprice < 50000)
ORDER BY price DESC, id
LIMIT 50
"""


@q("q_jx_setop", oracle_sql=_JX_SETOP_ORACLE)
def jx_setop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qb setop (no-aggregate) query: filter tree + computed select +
    sort + limit via the JSON front-end."""
    prep(spark)
    return QB(spark, sf_dir=sf_dir).run(
        {
            "from": "orders",
            "select": [
                {"name": "id", "value": "o_orderkey"},
                {"name": "price", "value": "o_totalprice"},
                {
                    "name": "size",
                    "value": {
                        "when": {"gte": {"o_totalprice": 250000}},
                        "then": {"literal": "big"},
                        "else": {"literal": "small"},
                    },
                },
            ],
            "where": {
                "and": [
                    {"eq": {"o_orderstatus": "F"}},
                    {"in": {"o_orderpriority": ["1-URGENT", "2-HIGH"]}},
                    {"not": {"lt": {"o_totalprice": 50000}}},
                ]
            },
            "sort": [{"value": "price", "sort": -1}, {"value": "id", "sort": 1}],
            "limit": 50,
        }
    )


_JX_WINDOW_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(SUM(l_quantity) OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber
                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           AS running_qty
FROM lineitem
WHERE l_orderkey <= 2000
"""


@q("q_jx_window", oracle_sql=_JX_WINDOW_ORACLE)
def jx_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q.window: running aggregate over a sorted partition via the JSON
    front-end (integral quantities -> order-independent double sums)."""
    prep(spark)
    return QB(spark, sf_dir=sf_dir).run(
        {
            "from": "lineitem",
            "select": [
                {"name": "l_orderkey", "value": "l_orderkey"},
                {"name": "l_linenumber", "value": "l_linenumber"},
            ],
            "where": {"lte": {"l_orderkey": 2000}},
            "window": [
                {
                    "name": "running_qty",
                    "value": "l_quantity",
                    "aggregate": "sum",
                    "edges": ["l_orderkey"],
                    "sort": ["l_linenumber"],
                    "range": {"min": None, "max": 0},
                }
            ],
        }
    )


_JX_NESTED_ORACLE = """
SELECT o_orderkey AS okey,
       o_orderstatus AS status,
       l_linenumber AS line,
       l_quantity AS qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_quantity >= 48
"""


@q("q_jx_nested_from", oracle_sql=_JX_NESTED_ORACLE)
def jx_nested_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested ``from`` (ES nested-document shape): dot-path into an
    array-of-structs column explodes the inner documents with parent
    fields repeated (reference: es_query.py nested-path dispatch,
    query.py dotted-from normalization).

    The nested table is materialized first (collect_list of item structs
    per order) so the jx query genuinely navigates an array column; the
    oracle is the equivalent flat join the explode undoes.
    """
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    nested = (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("l_linenumber", "l_quantity"))
            ).alias("items")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderkey", "o_orderstatus", "items")
    )
    return QB(spark, tables={"onested": nested}).run(
        {
            "from": "onested.items",
            "where": {"gte": {"items.l_quantity": 48}},
            "select": [
                {"name": "okey", "value": "o_orderkey"},
                {"name": "status", "value": "o_orderstatus"},
                {"name": "line", "value": "items.l_linenumber"},
                {"name": "qty", "value": "items.l_quantity"},
            ],
        }
    )


_JX_COMPUTED_EDGE_ORACLE = """
WITH bands AS (SELECT unnest(['big', 'mid', 'small']) AS price_band),
     agg AS (
         SELECT CASE WHEN o_totalprice >= 250000 THEN 'big'
                     WHEN o_totalprice >= 100000 THEN 'mid'
                     ELSE 'small' END AS price_band,
                COUNT(*) AS n,
                CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
         FROM orders
         GROUP BY 1
     )
SELECT b.price_band, COALESCE(a.n, 0) AS n, a.cust_sum
FROM bands b LEFT JOIN agg a USING (price_band)
"""


@q("q_jx_computed_edge", oracle_sql=_JX_COMPUTED_EDGE_ORACLE)
def jx_computed_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed (expression-valued) edge through the JSON front-end —
    the reference's MVEL-scripted-facet shape (es_query dispatches
    computed edges to scripted facets; here the expression compiles into
    the groupBy key and the dense set domain still densifies)."""
    prep(spark)
    return QB(spark, sf_dir=sf_dir).run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "price_band",
                    "value": {
                        "when": {"gte": {"o_totalprice": 250000}},
                        "then": {"literal": "big"},
                        "else": {
                            "when": {"gte": {"o_totalprice": 100000}},
                            "then": {"literal": "mid"},
                            "else": {"literal": "small"},
                        },
                    },
                    "domain": {
                        "type": "set",
                        "partitions": ["big", "mid", "small"],
                    },
                }
            ],
            "select": [
                {"name": "n", "aggregate": "count"},
                {
                    "name": "cust_sum",
                    "value": "o_custkey",
                    "aggregate": "sum",
                },
            ],
        }
    )


_JX_NAMED_DIM_ORACLE = """
WITH m AS (SELECT s AS month
           FROM generate_series(TIMESTAMP '1996-01-01',
                                TIMESTAMP '1996-06-01',
                                INTERVAL 1 MONTH) t(s)),
     p AS (SELECT unnest(['1-URGENT', '2-HIGH', '3-MEDIUM']) AS priority),
     a AS (SELECT date_trunc('month', o_orderdate) AS month,
                  o_orderpriority AS priority,
                  COUNT(*) AS n
           FROM orders GROUP BY 1, 2)
SELECT m.month, p.priority, COALESCE(a.n, 0) AS n
FROM m CROSS JOIN p LEFT JOIN a USING (month, priority)
"""


@q("q_jx_named_dimension", oracle_sql=_JX_NAMED_DIM_ORACLE)
def jx_named_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edges referencing predeclared catalog dimensions by name (upstream
    dimensions.py: declare field + domain once, reference everywhere) —
    one bare-string reference and one ``{"dimension": ...}`` reference."""
    prep(spark)
    from modevetl_spark.plans.dimensions import DimensionCatalog

    dims = (
        DimensionCatalog()
        .register(
            "order.month",
            "o_orderdate",
            {
                "type": "time",
                "min": "1996-01-01",
                "max": "1996-07-01",
                "interval": "1 MONTH",
            },
        )
        .register(
            "order.priority",
            "o_orderpriority",
            {
                "type": "set",
                "partitions": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
            },
        )
    )
    return QB(spark, sf_dir=sf_dir, dimensions=dims).run(
        {
            "from": "orders",
            "edges": [
                "order.month",
                {"dimension": "order.priority", "name": "priority"},
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )


_JX_STRING_OPS_ORACLE = """
SELECT c_custkey AS id,
       CASE WHEN strpos(c_name, 'Customer#') > 0
            THEN substr(c_name, strpos(c_name, 'Customer#') + 9)
       END AS cust_id,
       lpad(CASE WHEN strpos(c_name, 'Customer#') > 0
                 THEN substr(c_name, strpos(c_name, 'Customer#') + 9)
            END, 12, '0') AS cust_pad,
       CASE WHEN strpos(c_mktsegment, 'CH') > 0
            THEN strpos(c_mktsegment, 'CH') - 1 ELSE -1 END AS seg_pos,
       CASE WHEN strpos(c_mktsegment, 'I') > 0
            THEN substr(c_mktsegment, 1, strpos(c_mktsegment, 'I') - 1)
       END AS seg_head
FROM customer
"""


@q("q_jx_string_ops", oracle_sql=_JX_STRING_OPS_ORACLE)
def jx_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-tail string expressions through the JSON front-end: find
    (0-based index with select.default), between with prefix-only and
    suffix-only anchors, and left_pad — upstream MVEL/strings surface."""
    prep(spark)
    _cust_id = {
        "between": {
            "value": "c_name",
            "prefix": {"literal": "Customer#"},
            "suffix": None,
        }
    }
    return QB(spark, sf_dir=sf_dir).run(
        {
            "from": "customer",
            "select": [
                {"name": "id", "value": "c_custkey"},
                {"name": "cust_id", "value": _cust_id},
                {"name": "cust_pad", "value": {"left_pad": [_cust_id, 12, "0"]}},
                {
                    "name": "seg_pos",
                    "value": {"find": ["c_mktsegment", {"literal": "CH"}]},
                    "default": -1,
                },
                {
                    "name": "seg_head",
                    "value": {
                        "between": {
                            "value": "c_mktsegment",
                            "prefix": None,
                            "suffix": {"literal": "I"},
                        }
                    },
                },
            ],
        }
    )
