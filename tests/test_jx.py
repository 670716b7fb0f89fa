"""Qb/jx front-end tests: JSON queries -> DataFrame plans, checked against
hand-written DataFrame results and DuckDB SQL (the reference's own test
style — small queries with expected outputs — but oracle-backed)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from modevetl_spark.plans.jx import QB, JxError, to_boolean, to_col
from tests.oracle import compare


@pytest.fixture(scope="module")
def qb(spark, sf_dir):
    return QB(spark, sf_dir=sf_dir)


def test_scan_where_select(qb, duck):
    out = qb.run(
        {
            "from": "orders",
            "select": [
                {"name": "id", "value": "o_orderkey"},
                {"name": "price", "value": "o_totalprice"},
            ],
            "where": {"and": [
                {"gte": {"o_totalprice": 100000}},
                {"in": {"o_orderstatus": ["O", "F"]}},
            ]},
        }
    )
    compare(
        out,
        duck,
        """SELECT o_orderkey AS id, o_totalprice AS price FROM orders
           WHERE o_totalprice >= 100000 AND o_orderstatus IN ('O','F')""",
    )


def test_computed_select(qb, duck):
    out = qb.run(
        {
            "from": "lineitem",
            "select": [
                {"name": "key", "value": "l_orderkey"},
                {
                    "name": "net",
                    "value": {"mult": ["l_extendedprice",
                                       {"sub": [1, "l_discount"]}]},
                },
                {
                    "name": "ratio",
                    "value": {"div": ["l_extendedprice", "l_quantity"],
                              "default": 0.0},
                },
            ],
            "where": {"lte": {"l_linenumber": 1}},
        }
    )
    compare(
        out,
        duck,
        """SELECT l_orderkey AS key,
                  l_extendedprice * (1 - l_discount) AS net,
                  COALESCE(CASE WHEN l_quantity <> 0
                                THEN l_extendedprice / l_quantity END, 0.0)
                      AS ratio
           FROM lineitem WHERE l_linenumber <= 1""",
    )


def test_global_aggregate(qb, duck):
    out = qb.run(
        {
            "from": "lineitem",
            "select": [
                {"name": "n", "value": "l_quantity", "aggregate": "count"},
                {"name": "mx", "value": "l_quantity", "aggregate": "maximum"},
            ],
        }
    )
    compare(out, duck, "SELECT COUNT(l_quantity) AS n, MAX(l_quantity) AS mx FROM lineitem")


def test_groupby_sparse(qb, duck):
    out = qb.run(
        {
            "from": "orders",
            "groupby": ["o_orderstatus"],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    compare(
        out,
        duck,
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus",
    )


def test_edges_dense_cube(qb, duck):
    out = qb.run(
        {
            "from": "lineitem",
            "edges": [
                {
                    "name": "flag",
                    "value": "l_returnflag",
                    "domain": {"type": "set", "partitions": ["A", "N", "R"]},
                },
                {
                    "name": "status",
                    "value": "l_linestatus",
                    "domain": {"type": "set", "partitions": ["F", "O"]},
                },
            ],
            "select": [{"name": "n", "aggregate": "count"}],
            "where": {"gte": {"l_quantity": 45}},
        }
    )
    compare(
        out,
        duck,
        """WITH f AS (SELECT unnest(['A','N','R']) AS flag),
                s AS (SELECT unnest(['F','O']) AS status),
                a AS (SELECT l_returnflag AS flag, l_linestatus AS status,
                             COUNT(*) AS n
                      FROM lineitem WHERE l_quantity >= 45 GROUP BY 1, 2)
           SELECT f.flag, s.status, COALESCE(a.n, 0) AS n
           FROM f CROSS JOIN s LEFT JOIN a USING (flag, status)""",
    )


def test_edges_time_domain(qb, duck):
    out = qb.run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "month",
                    "value": "o_orderdate",
                    "domain": {
                        "type": "time",
                        "min": "1996-01-01",
                        "max": "1996-07-01",
                        "interval": "1 MONTH",
                    },
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    # Spark groups ALL months but the grid keeps only the domain's six;
    # rows outside the domain vanish (reference: values outside domain ->
    # null bucket unless allowNulls).
    compare(
        out,
        duck,
        """WITH m AS (SELECT s AS month
                      FROM generate_series(TIMESTAMP '1996-01-01',
                                           TIMESTAMP '1996-06-01',
                                           INTERVAL 1 MONTH) t(s)),
                a AS (SELECT date_trunc('month', o_orderdate) AS month,
                             COUNT(*) AS n
                      FROM orders GROUP BY 1)
           SELECT m.month, COALESCE(a.n, 0) AS n
           FROM m LEFT JOIN a USING (month)""",
    )


def test_edges_time_domain_multi_unit(qb, duck):
    """'2 MONTH' interval: date_trunc('month') would key odd months to grid
    points that don't exist — the key must bucket relative to the domain min."""
    out = qb.run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "bucket",
                    "value": "o_orderdate",
                    "domain": {
                        "type": "time",
                        "min": "1996-01-01",
                        "max": "1997-01-01",
                        "interval": "2 MONTH",
                    },
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    compare(
        out,
        duck,
        """WITH g AS (SELECT s AS bucket
                      FROM generate_series(TIMESTAMP '1996-01-01',
                                           TIMESTAMP '1996-11-01',
                                           INTERVAL 2 MONTH) t(s)),
                a AS (SELECT time_bucket(INTERVAL '2 months', o_orderdate,
                                         TIMESTAMP '1996-01-01') AS bucket,
                             COUNT(*) AS n
                      FROM orders GROUP BY 1)
           SELECT g.bucket, COALESCE(a.n, 0) AS n
           FROM g LEFT JOIN a USING (bucket)""",
    )


def test_edges_time_domain_week_interval(qb, duck):
    """'7 DAY' buckets anchored at an arbitrary (non-Monday) start date."""
    out = qb.run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "wk",
                    "value": "o_orderdate",
                    "domain": {
                        "type": "time",
                        "min": "1996-01-04",
                        "max": "1996-02-29",
                        "interval": "7 DAY",
                    },
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    compare(
        out,
        duck,
        """WITH g AS (SELECT s AS wk
                      FROM generate_series(TIMESTAMP '1996-01-04',
                                           TIMESTAMP '1996-02-22',
                                           INTERVAL 7 DAY) t(s)),
                a AS (SELECT time_bucket(INTERVAL '7 days', o_orderdate,
                                         TIMESTAMP '1996-01-04') AS wk,
                             COUNT(*) AS n
                      FROM orders GROUP BY 1)
           SELECT g.wk, COALESCE(a.n, 0) AS n
           FROM g LEFT JOIN a USING (wk)""",
    )


def test_edges_time_domain_unaligned_min(qb, duck):
    """'1 MONTH' interval whose min is mid-month: the fast date_trunc path
    must NOT fire (its keys would all miss the day-15-anchored grid)."""
    out = qb.run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "m",
                    "value": "o_orderdate",
                    "domain": {
                        "type": "time",
                        "min": "1996-01-15",
                        "max": "1996-07-15",
                        "interval": "1 MONTH",
                    },
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    compare(
        out,
        duck,
        """WITH g AS (SELECT s AS m
                      FROM generate_series(TIMESTAMP '1996-01-15',
                                           TIMESTAMP '1996-06-15',
                                           INTERVAL 1 MONTH) t(s))
           SELECT g.m, COUNT(o.o_orderdate) AS n
           FROM g LEFT JOIN orders o
             ON o.o_orderdate >= g.m AND o.o_orderdate < g.m + INTERVAL 1 MONTH
           GROUP BY 1""",
    )


def test_edges_range_domain_unaligned(qb, duck):
    """Range domain whose min is not a multiple of the width, with a width
    (0.01) that is not exactly representable — the key must be computed with
    the same arithmetic shape as the grid or every cell misses."""
    out = qb.run(
        {
            "from": "lineitem",
            "edges": [
                {
                    "name": "bucket",
                    "value": "l_discount",
                    "domain": {
                        "type": "range",
                        "min": 0.005,
                        "max": 0.105,
                        "interval": 0.01,
                    },
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    compare(
        out,
        duck,
        """WITH g AS (SELECT CAST(0.005 AS DOUBLE) + t.k * CAST(0.01 AS DOUBLE) AS bucket
                      FROM generate_series(0, 9) t(k)),
                a AS (SELECT CAST(0.005 AS DOUBLE)
                             + floor((l_discount - CAST(0.005 AS DOUBLE))
                                     / CAST(0.01 AS DOUBLE))
                               * CAST(0.01 AS DOUBLE) AS bucket,
                             COUNT(*) AS n
                      FROM lineitem GROUP BY 1)
           SELECT g.bucket, COALESCE(a.n, 0) AS n
           FROM g LEFT JOIN a USING (bucket)""",
    )


def test_edges_time_domain_unaligned_max(qb, duck):
    """Aligned min but mid-month max: the domain is right-open at max, so
    rows with val >= max must NOT leak into the partial final bucket (the
    fast date_trunc path used to key 1996-06-25 to 1996-06-01, a real grid
    member here)."""
    out = qb.run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "m",
                    "value": "o_orderdate",
                    "domain": {
                        "type": "time",
                        "min": "1996-01-01",
                        "max": "1996-06-20",
                        "interval": "1 MONTH",
                    },
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    compare(
        out,
        duck,
        """WITH g AS (SELECT s AS m
                      FROM generate_series(TIMESTAMP '1996-01-01',
                                           TIMESTAMP '1996-06-01',
                                           INTERVAL 1 MONTH) t(s))
           SELECT g.m, COUNT(o.o_orderdate) AS n
           FROM g LEFT JOIN orders o
             ON o.o_orderdate >= g.m
            AND o.o_orderdate < LEAST(g.m + INTERVAL 1 MONTH,
                                      TIMESTAMP '1996-06-20')
           GROUP BY 1""",
    )


def test_edges_time_domain_unaligned_max_general(qb, duck):
    """Multi-unit interval AND non-aligned max: the general sequence path's
    largest-boundary-below key used to sweep val >= max into the partial
    final bucket [1996-05-01, 1996-06-20)."""
    out = qb.run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "b",
                    "value": "o_orderdate",
                    "domain": {
                        "type": "time",
                        "min": "1996-01-01",
                        "max": "1996-06-20",
                        "interval": "2 MONTH",
                    },
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    compare(
        out,
        duck,
        """WITH g AS (SELECT s AS b
                      FROM generate_series(TIMESTAMP '1996-01-01',
                                           TIMESTAMP '1996-05-01',
                                           INTERVAL 2 MONTH) t(s))
           SELECT g.b, COUNT(o.o_orderdate) AS n
           FROM g LEFT JOIN orders o
             ON o.o_orderdate >= g.b
            AND o.o_orderdate < LEAST(g.b + INTERVAL 2 MONTH,
                                      TIMESTAMP '1996-06-20')
           GROUP BY 1""",
    )


def test_edges_range_domain_unaligned_max(qb, duck):
    """Range domain whose max is not width-aligned: values >= max used to
    key into the partial final bucket's start (a real grid member) instead
    of falling out of the right-open domain."""
    out = qb.run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "bucket",
                    "value": "o_totalprice",
                    "domain": {
                        "type": "range",
                        "min": 0,
                        "max": 210000,
                        "interval": 50000,
                    },
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    compare(
        out,
        duck,
        """WITH g AS (SELECT t.k * CAST(50000 AS DOUBLE) AS bucket
                      FROM generate_series(0, 4) t(k)),
                a AS (SELECT floor(o_totalprice / CAST(50000 AS DOUBLE))
                             * CAST(50000 AS DOUBLE) AS bucket,
                             COUNT(*) AS n
                      FROM orders
                      WHERE o_totalprice >= 0 AND o_totalprice < 210000
                      GROUP BY 1)
           SELECT g.bucket, COALESCE(a.n, 0) AS n
           FROM g LEFT JOIN a USING (bucket)""",
    )


def test_edges_out_of_domain_allow_nulls_overflow(qb, spark, sf_dir):
    """With allowNulls, out-of-domain values join the overflow bucket —
    the same treatment a set domain gives values not in its partition list
    — instead of leaking into the partial final bucket or vanishing."""
    out = qb.run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "bucket",
                    "value": "o_totalprice",
                    "domain": {
                        "type": "range",
                        "min": 0,
                        "max": 210000,
                        "interval": 50000,
                        "allowNulls": True,
                    },
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    rows = {r["bucket"]: r["n"] for r in out.collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    outside = orders.where(
        (F.col("o_totalprice") >= 210000) | (F.col("o_totalprice") < 0)
    ).count()
    assert outside > 0  # the data must actually exercise the overflow
    assert rows["<null>"] == outside
    assert sum(rows.values()) == orders.count()


def test_select_star_and_dot(spark):
    """Upstream wildcard selects: '*' flattens to all leaf columns (deep
    paths escaped), '.' yields the whole document as a struct."""
    from pyspark.sql import Row

    from modevetl_spark.plans.jx import QB

    df = spark.createDataFrame(
        [(1, Row(x=10, y="a"), "z")],
        "id int, nested struct<x:int, y:string>, v string",
    )
    star = QB(spark, tables={"t": df}).run({"from": "t", "select": "*"})
    assert star.columns == ["id", "nested\\.x", "nested\\.y", "v"]
    assert star.collect()[0] == Row(**{
        "id": 1, "nested\\.x": 10, "nested\\.y": "a", "v": "z"
    })
    dot = QB(spark, tables={"t": df}).run({"from": "t", "select": "."})
    assert dot.columns == ["record"]
    rec = dot.collect()[0].record
    assert rec.id == 1 and rec.nested.x == 10 and rec.v == "z"
    # '*' composes with explicit selects and where
    mix = QB(spark, tables={"t": df}).run(
        {
            "from": "t",
            "select": ["*", {"name": "twice", "value": {"mult": ["id", 2]}}],
            "where": {"eq": {"id": 1}},
        }
    )
    assert mix.columns == ["id", "nested\\.x", "nested\\.y", "v", "twice"]
    assert mix.collect()[0]["twice"] == 2


def test_named_dimension_catalog(spark, duck, sf_dir):
    from modevetl_spark.plans.dimensions import DimensionCatalog
    from modevetl_spark.plans.jx import JxError, QB

    dims = DimensionCatalog().register(
        "flag",
        "l_returnflag",
        {"type": "set", "partitions": ["A", "N", "R"]},
    )
    qbd = QB(spark, sf_dir=sf_dir, dimensions=dims)
    # bare-string edge resolves through the catalog (value + domain)
    out = qbd.run(
        {
            "from": "lineitem",
            "edges": ["flag"],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    compare(
        out,
        duck,
        """WITH f AS (SELECT unnest(['A','N','R']) AS flag),
                a AS (SELECT l_returnflag AS flag, COUNT(*) AS n
                      FROM lineitem GROUP BY 1)
           SELECT f.flag, COALESCE(a.n, 0) AS n
           FROM f LEFT JOIN a USING (flag)""",
    )
    # an inline domain on the edge overrides the catalog's
    out2 = qbd.run(
        {
            "from": "lineitem",
            "edges": [
                {
                    "dimension": "flag",
                    "domain": {"type": "set", "partitions": ["A", "R"]},
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    assert {r.flag for r in out2.collect()} == {"A", "R"}
    # unknown {"dimension": ...} is an error, not a silent column lookup
    import pytest as _pytest

    with _pytest.raises(JxError, match="unknown dimension"):
        qbd.run(
            {
                "from": "lineitem",
                "edges": [{"dimension": "nope"}],
                "select": [{"name": "n", "aggregate": "count"}],
            }
        )


def test_window_running_sum(qb, duck):
    out = qb.run(
        {
            "from": "orders",
            "select": [
                {"name": "o_custkey", "value": "o_custkey"},
                {"name": "o_orderkey", "value": "o_orderkey"},
            ],
            "window": [
                {
                    "name": "seq",
                    "value": "o_orderkey",
                    "aggregate": "count",
                    "edges": ["o_custkey"],
                    "sort": [{"value": "o_orderkey", "sort": 1}],
                }
            ],
        }
    )
    compare(
        out,
        duck,
        """SELECT o_custkey, o_orderkey,
                  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS seq
           FROM orders""",
    )


def test_sort_limit_nested_from(qb, duck):
    out = qb.run(
        {
            "from": {
                "from": "orders",
                "where": {"eq": {"o_orderstatus": "F"}},
                "select": [
                    {"name": "k", "value": "o_orderkey"},
                    {"name": "p", "value": "o_totalprice"},
                ],
            },
            "sort": [{"value": "p", "sort": -1}, {"value": "k", "sort": 1}],
            "limit": 5,
        }
    )
    compare(
        out,
        duck,
        """SELECT o_orderkey AS k, o_totalprice AS p FROM orders
           WHERE o_orderstatus = 'F'
           ORDER BY p DESC, k LIMIT 5""",
    )


def test_filter_tree_ops(spark, qb):
    df = qb.run(
        {
            "from": "part",
            "where": {
                "or": [
                    {"prefix": {"p_type": "PROMO"}},
                    {"and": [{"regex": {"p_name": "^a"}},
                             {"not": {"missing": "p_brand"}}]},
                ]
            },
            "select": ["p_partkey"],
        }
    )
    hand = (
        spark.read.parquet("/root/testdata/sf0.001/part.parquet")
        .where(
            F.col("p_type").startswith("PROMO")
            | (F.col("p_name").rlike("^a") & F.col("p_brand").isNotNull())
        )
        .select(F.col("p_partkey").alias("p_partkey"))
    )
    assert df.count() == hand.count() > 0


def test_errors():
    with pytest.raises(JxError):
        to_col({"frobnicate": [1, 2]})
    with pytest.raises(JxError):
        to_boolean({"unknown_op": {"a": 1}})


def test_when_then_else(qb, duck):
    out = qb.run(
        {
            "from": "orders",
            "select": [
                {"name": "k", "value": "o_orderkey"},
                {
                    "name": "bucket",
                    "value": {
                        "when": {"gte": {"o_totalprice": 200000}},
                        "then": {"literal": "big"},
                        "else": {"literal": "small"},
                    },
                },
            ],
        }
    )
    compare(
        out,
        duck,
        """SELECT o_orderkey AS k,
                  CASE WHEN o_totalprice >= 200000 THEN 'big' ELSE 'small' END
                      AS bucket
           FROM orders""",
    )


def test_nullsafe_missing_fields(qb, spark):
    """§1.1 schemaless navigation: referencing a field the documents don't
    have yields Null (never an AnalysisException), and not(eq(missing))
    matches everything — the reference's struct.Null model."""
    out = qb.run(
        {
            "from": "region",
            "select": [
                {"name": "k", "value": "r_regionkey"},
                {"name": "ghost", "value": "no_such_field"},
                {"name": "deep_ghost", "value": "a.b.c"},
            ],
            "where": {"not": {"eq": {"no_such_field": 42}}},
        }
    )
    rows = out.collect()
    assert len(rows) == 5  # all regions match: missing != 42 is True
    assert all(r.ghost is None and r.deep_ghost is None for r in rows)


def test_nested_struct_paths(spark):
    """Dot-path select into real nested structs via jx."""
    from modevetl_spark.plans.jx import QB

    df = spark.createDataFrame(
        [(1, ("alice", ("nyc", "us"))), (2, ("bob", (None, "fr")))],
        "id int, u struct<name:string, loc:struct<city:string, country:string>>",
    )
    out = QB(spark, tables={"people": df}).run(
        {
            "from": "people",
            "select": [
                {"name": "id", "value": "id"},
                {"name": "city", "value": "u.loc.city"},
                {"name": "missing", "value": "u.loc.zip"},
            ],
        }
    )
    got = {(r.id, r.city, r.missing) for r in out.collect()}
    assert got == {(1, "nyc", None), (2, None, None)}


def test_leaves_operator(spark):
    from modevetl_spark.operators.nested import leaves

    df = spark.createDataFrame(
        [(1, ("alice", ("nyc", "us"))), (2, ("bob", (None, "fr")))],
        "id int, u struct<name:string, loc:struct<city:string, country:string>>",
    )
    out = leaves(df, ["id"])
    got = {(r.id, r.path, r.value) for r in out.collect()}
    assert got == {
        (1, "u.name", "alice"),
        (1, "u.loc.city", "nyc"),
        (1, "u.loc.country", "us"),
        (2, "u.name", "bob"),
        (2, "u.loc.country", "fr"),  # null city has no leaf
    }


def test_nested_from_explodes(spark):
    """Dotting 'from' into an array<struct> explodes inner docs with
    parent fields repeated; unknown inner fields resolve to Null."""
    from modevetl_spark.plans.jx import QB

    df = spark.createDataFrame(
        [(1, [(10, "a"), (20, "b")]), (2, []), (3, None)],
        "id int, items array<struct<qty:int, tag:string>>",
    )
    out = QB(spark, tables={"t": df}).run(
        {
            "from": "t.items",
            "select": [
                {"name": "id", "value": "id"},
                {"name": "qty", "value": "items.qty"},
                {"name": "missing", "value": "items.nope"},
            ],
        }
    )
    got = {(r.id, r.qty, r.missing) for r in out.collect()}
    assert got == {(1, 10, None), (1, 20, None), (2, None, None), (3, None, None)}


def test_nested_from_through_struct(spark):
    """Navigation through a struct segment to reach the array."""
    from modevetl_spark.plans.jx import QB

    df = spark.createDataFrame(
        [(1, ((["x", "y"],),))],
        "id int, a struct<b:struct<tags:array<string>>>",
    )
    out = QB(spark, tables={"t": df}).run(
        {
            "from": "t.a.b.tags",
            "select": [
                {"name": "id", "value": "id"},
                {"name": "tag", "value": "tags"},
            ],
        }
    )
    got = {(r.id, r.tag) for r in out.collect()}
    assert got == {(1, "x"), (1, "y")}


def test_nested_from_unknown_path_raises(spark):
    from modevetl_spark.plans.jx import QB, JxError
    import pytest as _pytest

    df = spark.createDataFrame([(1,)], "id int")
    with _pytest.raises(JxError):
        QB(spark, tables={"t": df}).run({"from": "t.nope", "select": [{"name": "id", "value": "id"}]})


def test_review_fix_jx_regressions(spark, duck, sf_dir):
    """Review fixes: (2) a string `value` naming a dimension resolves to
    the catalog's real expression; (6) the 3-list between stays the
    boolean range op in scalar position; (7) aggregate-over-star raises."""
    import pytest as _pytest

    from modevetl_spark.plans.dimensions import DimensionCatalog
    from modevetl_spark.plans.jx import JxError, QB

    dims = DimensionCatalog().register(
        "flag", "l_returnflag", {"type": "set", "partitions": ["A", "N", "R"]}
    )
    out = QB(spark, sf_dir=sf_dir, dimensions=dims).run(
        {
            "from": "lineitem",
            "edges": [{"name": "f", "value": "flag"}],  # dict value reference
            "select": [{"name": "n", "aggregate": "count"}],
        }
    )
    rows = {r.f: r.n for r in out.collect()}
    assert set(rows) == {"A", "N", "R"} and sum(rows.values()) > 0

    qb = QB(spark, sf_dir=sf_dir)
    sel = qb.run(
        {
            "from": "orders",
            "select": [
                {"name": "id", "value": "o_orderkey"},
                {
                    "name": "mid_price",
                    "value": {"between": ["o_totalprice", 100000, 200000]},
                },
            ],
            "limit": 5,
        }
    )
    assert dict(sel.dtypes)["mid_price"] == "boolean"

    with _pytest.raises(JxError, match="aggregate over"):
        qb.run(
            {
                "from": "orders",
                "select": [{"name": "n", "value": "*", "aggregate": "count"}],
            }
        )
