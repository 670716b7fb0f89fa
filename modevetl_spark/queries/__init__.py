"""Named query library — the driver contract surface.

Every operator row in SURVEY.md §2 lands here as a ``@q("key", oracle=...)``
registered callable ``(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle
SQL string. ``__spark_entry__.py`` re-exports the merged registry.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    "flagship",
    "scans",
    "aggs",
    "cube",
    "joins",
    "windows",
    "sorts",
    "funcs",
    "events",
    "llm",
]


def _load_all() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(f"modevetl_spark.queries.{mod_name}")
        except ModuleNotFoundError:
            continue
        for k, v in getattr(mod, "QUERIES", {}).items():
            if k in queries:
                raise ValueError(f"duplicate query key {k!r} in {mod_name}")
            queries[k] = v
        oracle.update(getattr(mod, "ORACLE", {}))
    return queries, oracle


def all_queries() -> dict[str, QueryFn]:
    return _load_all()[0]


def all_oracle() -> dict[str, str]:
    return _load_all()[1]


def prep(spark: SparkSession) -> SparkSession:
    """Defensive session confs so results match the oracle regardless of how
    the caller built the session (timestamps are interpreted in session tz).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
