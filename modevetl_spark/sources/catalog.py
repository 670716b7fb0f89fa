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
    if table == "events":
        return _normalize_ts(_load_events(spark, sf_dir))
    return _normalize_ts(spark.read.parquet(f"{sf_dir}/{table}.parquet"))


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP (value-preserving under
    the UTC session timezone) so downstream `unix_micros`/`window`/interval
    arithmetic sees one timestamp flavor regardless of how the parquet
    writer flagged its timestamps."""
    from pyspark.sql import functions as F

    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical testdata wrote events.ts as TIMESTAMP(NANOS), which
    Spark 4 refuses to read as a timestamp ([PARQUET_TYPE_ILLEGAL]); read
    nanos as long and truncate to a µs timestamp with *integer* division
    (a double division at ~1.7e18 ns would lose µs precision past 2^53).
    DuckDB's ``CAST(ts AS TIMESTAMP)`` truncates identically in oracle
    SQL. Current testdata is already µs; the shim is then a no-op.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
