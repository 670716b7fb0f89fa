"""Property-based differential test (SURVEY.md §5.3): jx filter trees
evaluated by Spark must agree with a naive pure-Python evaluator over the
same documents — echoing the reference's in-memory list evaluator, used
here as a test oracle."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modevetl_spark.plans.jx import to_boolean

FIELDS = ["a", "b", "s"]


def leaf():
    return st.one_of(
        st.builds(lambda f, v: {"eq": {f: v}}, st.sampled_from(["a", "b"]),
                  st.integers(-3, 3)),
        st.builds(lambda f, v: {"gt": {f: v}}, st.sampled_from(["a", "b"]),
                  st.integers(-3, 3)),
        st.builds(lambda f, v: {"lte": {f: v}}, st.sampled_from(["a", "b"]),
                  st.integers(-3, 3)),
        st.builds(lambda v: {"in": {"s": v}},
                  st.lists(st.sampled_from(["x", "y", "z"]), min_size=1,
                           max_size=3)),
        st.builds(lambda: {"missing": "s"}),
        st.builds(lambda: {"exists": "a"}),
        st.builds(lambda p: {"prefix": {"s": p}}, st.sampled_from(["x", "y"])),
    )


def tree(depth=2):
    if depth == 0:
        return leaf()
    sub = tree(depth - 1)
    return st.one_of(
        leaf(),
        st.builds(lambda xs: {"and": xs}, st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda xs: {"or": xs}, st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda x: {"not": x}, sub),
    )


def py_eval(e, doc) -> bool:
    """Naive evaluator with the reference's semantics: comparisons against
    missing values are False (never errors)."""
    op, arg = next(iter(e.items()))
    if op == "and":
        return all(py_eval(x, doc) for x in arg)
    if op == "or":
        return any(py_eval(x, doc) for x in arg)
    if op == "not":
        return not py_eval(arg, doc)
    if op == "eq":
        return all(doc.get(f) is not None and doc.get(f) == v for f, v in arg.items())
    if op == "gt":
        return all(doc.get(f) is not None and doc.get(f) > v for f, v in arg.items())
    if op == "lte":
        return all(doc.get(f) is not None and doc.get(f) <= v for f, v in arg.items())
    if op == "in":
        (f, vs), = arg.items()
        return doc.get(f) in vs
    if op == "missing":
        return doc.get(arg) is None
    if op == "exists":
        return doc.get(arg) is not None
    if op == "prefix":
        (f, p), = arg.items()
        return doc.get(f) is not None and doc[f].startswith(p)
    raise AssertionError(op)


DOCS = [
    {"a": a, "b": b, "s": s}
    for a in [None, -2, 0, 1, 3]
    for b in [None, -1, 2]
    for s in [None, "x", "xy", "z"]
]


@pytest.fixture(scope="module")
def docs_df(spark):
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("a", IntegerType()),
            StructField("b", IntegerType()),
            StructField("s", StringType()),
        ]
    )
    return spark.createDataFrame([tuple(d.values()) for d in DOCS], schema).cache()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=tree())
def test_filter_matches_python(docs_df, expr):
    spark_ids = sorted(
        ((r.a, r.b, r.s) for r in docs_df.where(to_boolean(expr)).collect()),
        key=repr,
    )
    py_ids = sorted(
        ((d["a"], d["b"], d["s"]) for d in DOCS if py_eval(expr, d)), key=repr
    )
    assert spark_ids == py_ids, expr
