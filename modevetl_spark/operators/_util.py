"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Fan a (possibly single-partition) input out across the cluster
    before CPU-heavy per-row work.

    Small parquet files arrive as one input split, which serializes
    expensive expression work (tokenize/shingle/hash measured single-core
    on the documents table: ~5 s that should be ~0.2 s at local[32]). A
    round-robin repartition of the raw rows is far cheaper than the work
    it unlocks. At 100 TB inputs already have thousands of splits and this
    becomes a near-no-op coalesce guard — keyless repartition preserves no
    useful partitioning, so only call it *before* per-row compute, never
    after a keyed shuffle.
    """
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= partitions:
        return df
    return df.repartition(partitions)
