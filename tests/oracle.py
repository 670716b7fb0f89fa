"""Local differential-testing harness: Spark result vs DuckDB oracle.

Mirrors the driver's check (row count + schema-by-name + order-insensitive
values) but stricter: exact value equality after sorting columns by name and
rows by all columns, so any float-association drift shows up locally before
the driver sees it (SURVEY.md §5.1).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from modevetl_spark.sources.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            import numpy as np

            df[c] = s.map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def _check_temporal_flavor(spark_df, duck_types: dict[str, str]) -> None:
    """The driver hashes python reprs, where datetime.date and
    datetime.datetime never compare equal — but pandas coerces both to
    datetime64, so `compare` alone can't see a DATE-vs-TIMESTAMP drift
    (DuckDB's date_trunc returns DATE at day-or-coarser precision while
    Spark's returns TIMESTAMP; caught live in q_date_trunc_agg round 4).
    Assert the declared column flavors agree before value comparison."""
    for f in spark_df.schema.fields:
        dt = duck_types.get(f.name)
        if dt is None:
            continue
        s = f.dataType.simpleString()
        if s.startswith("timestamp") and dt == "DATE":
            raise AssertionError(
                f"column {f.name!r}: spark {s} vs duckdb DATE — add a "
                f"CAST(... AS TIMESTAMP) to the oracle"
            )
        if s == "date" and dt.startswith("TIMESTAMP"):
            raise AssertionError(
                f"column {f.name!r}: spark date vs duckdb {dt} — cast one side"
            )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    cur = con.execute(sql)
    duck_types = {d[0]: str(d[1]).upper() for d in cur.description}
    _check_temporal_flavor(spark_df, duck_types)
    sp = _normalize(spark_df.toPandas())
    dk = _normalize(cur.df())
    assert list(sp.columns) == list(dk.columns), (
        f"schema mismatch: spark={list(sp.columns)} duckdb={list(dk.columns)}"
    )
    assert len(sp) == len(dk), f"row count mismatch: spark={len(sp)} duckdb={len(dk)}"
    for c in sp.columns:
        a, b = sp[c].tolist(), dk[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if not _values_equal(x, y)
        ]
        assert not bad, f"column {c!r}: {len(bad)} mismatches, first 5: {bad[:5]}"
