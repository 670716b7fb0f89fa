"""Parquet catalog over the driver-generated test tables.

Reference analog: ``pyLibrary/env/elasticsearch.py`` treats an ES index as
the table; here the table is a parquet path. The scan is declarative
(``spark.read.parquet``) so Catalyst gets predicate pushdown + column
pruning for free — the Spark-native equivalent of the reference pushing
``fields``/filters into the ES query DSL (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table not in TABLES:
        raise KeyError(f"unknown table {table!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
