"""Deterministic sampling + batch packing for training-data pipelines
([EXT] — the selection stage between dedup/quality-filter and training).

Sampling here is CONTENT-hash based, not RNG based: ``sample()`` /
``sampleBy()`` draw from a per-partition RNG stream, so results change
whenever partitioning or row order changes — unacceptable for a 100 TB
pipeline where retries, AQE re-plans, and compaction reshuffle rows.
A row is kept iff a fixed-width prefix of md5(key) falls under the
fraction threshold: the decision is a pure function of the row's key,
stable across any physical layout, and md5 is engine-portable, so even
the sampling queries are DuckDB-oracle-gated (unlike any RNG form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_bucket(key: Column) -> Column:
    """First 4 hex digits of md5(key) -> uniform bucket in [0, 65536)."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


def hash_threshold(fraction: float) -> str:
    """4-hex-digit threshold t such that P(bucket < t) = fraction.

    fraction 1.0 maps to 'g' — lexicographically above every hex bucket
    (format(65536, '04x') would be '10000', which string-compares BELOW
    '2000'-'ffff' and silently drops ~7/8 of the stratum).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = int(round(fraction * 65536))
    return "g" if n >= 65536 else format(n, "04x")


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by md5(key) — deterministic
    under any partitioning, repartitioning, or retry."""
    return df.where(_hash_bucket(F.col(key_col)) < hash_threshold(fraction))


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum hash sampling (e.g. downsample the dominant language,
    keep all of the rare one). Strata absent from ``fractions`` are
    dropped — pass 1.0 to keep a stratum whole. The per-stratum
    threshold is a literal CASE, so the whole filter stays one codegen'd
    predicate pushed at the scan."""
    thresh = None
    for stratum, frac in sorted(fractions.items()):
        t = F.lit(hash_threshold(frac))
        thresh = (
            F.when(F.col(strata_col) == stratum, t)
            if thresh is None
            else thresh.when(F.col(strata_col) == stratum, t)
        )
    if thresh is None:
        raise ValueError("fractions must not be empty")
    return df.where(_hash_bucket(F.col(key_col)) < thresh.otherwise(F.lit("0000")))


def hash_split(
    df: DataFrame, key_col: str, fractions: dict[str, float]
) -> dict[str, DataFrame]:
    """Deterministic disjoint multi-way split (train/val/test) by content
    hash: split s covers the half-open bucket interval whose width is its
    fraction, in sorted-name order, so the assignment is a pure function
    of the key — stable across partitioning, retries, and re-runs, and
    every row lands in exactly one split (fractions must sum to <= 1;
    any remainder is simply unassigned). Each returned DataFrame is one
    pushdown-friendly range predicate on the md5 bucket."""
    bad = {k: v for k, v in fractions.items() if v < 0}
    if bad:
        # a negative fraction would move the interval cursor backward and
        # make later splits OVERLAP earlier ones — silent train/test leakage
        raise ValueError(f"negative fractions: {bad}")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    out: dict[str, DataFrame] = {}
    lo = 0.0
    bucket = _hash_bucket(F.col(key_col))
    for name, frac in sorted(fractions.items()):
        # float accumulation in sorted order can drift a hair past 1.0
        # even when the (differently-ordered) sum() guard passed — clamp,
        # or hash_threshold rejects a legitimate split like .55/.34/.11
        hi = min(lo + frac, 1.0)
        lo_t, hi_t = hash_threshold(lo), hash_threshold(hi)
        out[name] = df.where((bucket >= lo_t) & (bucket < hi_t))
        lo = hi
    return out


def pack_by_budget(
    docs: DataFrame,
    weight_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Greedy first-fit packing of documents into bins of ~``budget``
    total weight (token-budget batch packing for training). Packing is
    PER PARTITION — a global optimal packing is inherently sequential,
    and per-partition greedy is the standard distributed recipe: bins
    never span executors, so the pass is one shuffle-free mapPartitions
    over Arrow batches (``applyInPandas`` on the partition id).

    Returns (id_col, weight_col, bin_id) where bin_id is globally unique
    (partition id * 2^32 + local bin). A document heavier than the
    budget gets a bin of its own.
    """
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)  # deterministic within partition
        part = int(pdf["__part"].iloc[0])
        bins: list[int] = []
        fill = 0
        n_in_bin = 0
        local = 0
        for w in pdf[weight_col]:
            w = int(w)
            # open a new bin when the CURRENT bin is non-empty by
            # membership, not by fill: zero-weight docs leave fill at 0,
            # and gating on fill alone let an oversized doc join their
            # bin — breaking the "multi-doc bins fit the budget"
            # invariant (hypothesis falsifying example: [(0,0),(1,101)],
            # budget 100). Identical packing whenever all weights >= 1.
            if n_in_bin > 0 and fill + w > budget:
                local += 1
                fill = 0
                n_in_bin = 0
            bins.append((part << 32) + local)
            fill += w
            n_in_bin += 1
        out = pdf[[id_col, weight_col]].copy()
        out["bin_id"] = bins
        return out

    # a NULL id or weight is unpackable (no budget contribution, no
    # joinable key) and would reach pandas as NaN, aborting the job at
    # the int() cast on one dirty row — drop JVM-side before the UDF
    src = docs.select(id_col, weight_col).where(
        F.col(id_col).isNotNull() & F.col(weight_col).isNotNull()
    )
    if n_partitions:
        src = src.repartition(n_partitions, id_col)
    with_part = src.withColumn("__part", F.spark_partition_id())
    schema = f"{id_col} long, {weight_col} long, bin_id long"
    return with_part.groupBy("__part").applyInPandas(pack, schema=schema)
