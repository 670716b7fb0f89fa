"""Dense-cube materialization (the heart of Qb "edges" queries).

Reference semantics (``pyLibrary/queries/cube.py`` +
``collections/matrix.py``): a query with ``edges`` yields an N-dimensional
*dense* array indexed by the cartesian product of each edge's domain
partitions — every coordinate exists, including empty ones (a month with no
rows appears with count 0), unlike sparse SQL GROUP BY.

Spark-first mapping: sparse ``groupBy().agg()`` + a generated domain
DataFrame per edge, cross-joined into the full coordinate grid, left-joined
with the aggregates, defaults coalesced in.

Scale notes: the domain grid is tiny (|domain_1| x ... x |domain_n| —
thousands of rows even for year-by-region-by-category cubes), so the final
left join is always broadcast-able and is explicitly broadcast *from the
grid side's perspective*: we broadcast the *aggregated* side only when it
is small; more importantly the expensive input (raw fact table) was already
reduced by the aggregation before the densify join, so densify adds no
full-data shuffle. Domains are generated with ``sequence()``/``explode`` or
literal frames — never driver-side loops.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def set_domain(spark: SparkSession, name: str, values: list) -> DataFrame:
    """D1 ``set`` domain: explicit partition list (``domains.py`` SetDomain).

    Built as a Catalyst LocalRelation (range(1) + explode of literals), NOT
    ``spark.createDataFrame``: the latter yields an RDD-backed relation with
    UnknownPartitioning whose cartesian product fans out to
    defaultParallelism^2 scheduler tasks (measured: 1024 tasks / ~20 s of
    pure overhead for a 6-cell grid at local[32]).
    """
    arr = F.array([F.lit(v) for v in values])
    return spark.range(1).select(F.explode(arr).alias(name))


def time_domain(
    spark: SparkSession, name: str, start: str, stop: str, interval: str
) -> DataFrame:
    """D2 ``time`` domain: min/max/interval calendar partitions
    (``domains.py`` TimeDomain). ``stop`` is exclusive, like the reference's
    right-open partitions.
    """
    seq = F.sequence(
        F.to_timestamp(F.lit(start)),
        F.to_timestamp(F.lit(stop)),
        F.expr(f"INTERVAL {interval}"),
    )
    return (
        spark.range(1)
        .select(F.explode(seq).alias(name))
        .where(F.col(name) < F.to_timestamp(F.lit(stop)))
    )


def range_domain(
    spark: SparkSession, name: str, start: float, stop: float, width: float
) -> DataFrame:
    """D4 ``range`` domain: numeric buckets [start+k*width, start+(k+1)*width).

    Cell count is an epsilon-guarded ceil: plain int() truncation turns the
    float-noise 9.999…8 of (0.105-0.005)/0.01 into 9 cells and silently
    drops the last bucket; a not-width-aligned stop still gets its partial
    final bucket (right-open at ``stop``).
    """
    import math

    n = math.ceil((stop - start) / width - 1e-9)
    return spark.range(0, n, 1, numPartitions=1).select(
        (F.lit(start) + F.col("id") * F.lit(width)).alias(name)
    )


def default_domain(df: DataFrame, col: str, limit: int = 1000) -> DataFrame:
    """D5 ``default`` domain: discover distinct values at query time, capped
    (``domains.py`` DefaultDomain)."""
    return df.select(F.col(col)).distinct().orderBy(col).limit(limit)


def densify(
    grid_domains: list[DataFrame],
    aggregated: DataFrame,
    keys: list[str],
    fill: dict[str, Column] | None = None,
) -> DataFrame:
    """Cross-join the edge domains into the dense coordinate grid, left-join
    the (already reduced) aggregates, and coalesce defaults into empty cells.

    ``fill`` maps aggregate column name -> default Column (e.g. lit(0) for
    counts). Columns not in ``fill`` stay NULL in empty cells, matching the
    reference's null cube cells for value aggregates.
    """
    grid = reduce(lambda a, b: a.crossJoin(b), grid_domains)
    # the aggregated side is post-groupBy and therefore domain-bounded —
    # broadcast it explicitly so the densify join never plans a sort-merge
    # (the grid side is generated and has no size statistics)
    out = grid.join(F.broadcast(aggregated), on=keys, how="left")
    if fill:
        agg_cols = [c for c in aggregated.columns if c not in keys]
        out = out.select(
            *keys,
            *[
                F.coalesce(F.col(c), fill[c]).alias(c) if c in fill else F.col(c)
                for c in agg_cols
            ],
        )
    return out
