"""Canary for driver-side testdata regeneration.

The driver regenerated /root/testdata between rounds 3 and 4, silently
flipping events.ts from TIMESTAMP(NANOS) to µs-without-UTC-flag
(TIMESTAMP_NTZ to Spark 4) — which broke every event-time query until
the catalog normalization landed. These tests pin the *post-load*
contract so any future physical-format drift fails loudly here instead
of as a cryptic analysis error deep in a query.
"""

from __future__ import annotations

import pytest

from modevetl_spark.sources.catalog import TABLES, load

# The dtypes every query in the registry is written against (after
# catalog.load normalization, regardless of the parquet writer's
# timestamp flavor or physical int widths for these columns).
_EXPECTED = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderdate": "timestamp",
        "o_totalprice": "double",
        "o_orderstatus": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_shipdate": "timestamp",
        "l_returnflag": "string",
        "l_linestatus": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", sorted(_EXPECTED))
def test_loaded_dtypes_stable(spark, sf_dir, table):
    got = dict(load(spark, sf_dir, table).dtypes)
    for col, want in _EXPECTED[table].items():
        assert col in got, f"{table}.{col} vanished from testdata"
        assert got[col] == want, (
            f"{table}.{col}: loaded as {got[col]}, queries expect {want} — "
            f"testdata format changed; extend catalog normalization"
        )


def test_no_ntz_survives_load(spark, sf_dir):
    """TIMESTAMP_NTZ must never escape catalog.load — downstream
    unix_micros/window/interval arithmetic rejects it."""
    for t in TABLES:
        bad = [c for c, ty in load(spark, sf_dir, t).dtypes if "ntz" in ty]
        assert not bad, f"{t}: NTZ columns leaked through load(): {bad}"
