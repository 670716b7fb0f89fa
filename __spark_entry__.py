"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship densified revenue cube on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full named-query registry from
``modevetl_spark.queries`` (one entry per implemented operator of
SURVEY.md §2, each paired with a DuckDB oracle unless non-SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from modevetl_spark.queries import all_oracle, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["q_flagship_revenue_cube"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracle()
