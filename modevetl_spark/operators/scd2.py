"""Incremental SCD Type-2 maintenance ([EXT] — the dimension-table twin
of operators/aggstate.py): keep a persisted interval store current by
rebuilding only each touched user's OPEN tail from (seed ∪ batch),
leaving every closed interval byte-for-byte in place.

This is the reference's incremental upsert contract applied to
change-capture: the full build is O(history); a tick is O(delta) — the
only state rows a batch can alter are the open intervals of the users it
mentions (a closed interval is immutable by construction: its
effective_to was set by an event that already happened).

Scale shape per tick: one distinct of the batch's users, a left-semi
probe of the state for their open tails (1 row/user, column-pruned), one
windowed rebuild over seed∪batch (delta-sized, keyed on user), and a
partition-scoped keyed upsert on (user_id, version) — the rebuilt tail's
version 1 lands exactly on the old open row's version, closing it.

Replay discipline (same as aggstate): a tick is NOT idempotent — pair
with a watermark pull; batch events must not predate the open interval's
effective_from (the seed row sorts first via a sentinel event id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_SEED_EVENT_ID = -1  # sorts before every real (non-negative) event id


def scd2_build(
    events: DataFrame,
    user_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Change log -> SCD-2 validity intervals. ONE exchange: both
    windows and the change filter share the user partitioning (the plan
    gate on q_scd2_dimension pins this)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    st = events.select(
        F.col(user_col).alias("user_id"),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        F.lag(state_col).over(w).alias("prev"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = st.where(F.col("prev").isNull() | (F.col("prev") != F.col("state")))
    return ch.select(
        "user_id",
        "state",
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w2).alias("effective_to"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


def merge_scd2_state(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    user_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> int:
    """Merge one change batch into the persisted SCD-2 store. Returns
    the number of users the batch touched.

    Mechanics: each touched user's open interval becomes a SEED pseudo
    event (its state at its effective_from, sentinel id -1 so it sorts
    first); the rebuild of seed ∪ batch yields that user's new tail with
    versions 1..k, shifted by (old open version - 1) so version 1
    overwrites — and thereby closes — the old open row. Users absent
    from the batch are never read or written."""
    from modevetl_spark.sources.fs import fs_has_parquet_files, has_scheme
    from modevetl_spark.streaming.incremental import upsert_parquet

    if has_scheme(state_path):
        raise NotImplementedError(
            "merge_scd2_state requires a local-FS state store; "
            "use a lakehouse MERGE for object-store state"
        )
    ev = batch.select(
        F.col(user_col).alias("user_id"),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).cast("long").alias("event_id"),
    )
    if fs_has_parquet_files(spark, state_path):
        state = spark.read.parquet(state_path)
        touched = ev.select("user_id").distinct()
        open_tail = (
            state.where(F.col("effective_to").isNull())
            .join(F.broadcast(touched), "user_id", "left_semi")
            .select(
                "user_id",
                "state",
                F.col("effective_from").alias("ts"),
                F.lit(_SEED_EVENT_ID).cast("long").alias("event_id"),
                (F.col("version") - 1).alias("_voff"),
            )
        )
        offsets = open_tail.select("user_id", "_voff")
        seeds = open_tail.drop("_voff")
        rebuilt = scd2_build(
            seeds.unionByName(ev),
            user_col="user_id",
            state_col="state",
            ts_col="ts",
            id_col="event_id",
        )
        new_rows = (
            rebuilt.join(F.broadcast(offsets), "user_id", "left")
            .select(
                "user_id",
                "state",
                "effective_from",
                "effective_to",
                (
                    F.col("version") + F.coalesce(F.col("_voff"), F.lit(0))
                ).cast("long").alias("version"),
            )
        )
    else:
        new_rows = scd2_build(
            ev,
            user_col="user_id",
            state_col="state",
            ts_col="ts",
            id_col="event_id",
        )
    n_touched = ev.select("user_id").distinct().count()
    if n_touched:
        upsert_parquet(
            spark, new_rows, state_path, keys=["user_id", "version"]
        )
    elif not fs_has_parquet_files(spark, state_path):
        # an all-empty first tick must still leave a READABLE store
        # (same rationale as merge_aggregate_state): write the
        # schema-bearing empty frame so the consumer's unconditional
        # read survives a fresh store that has only seen empty batches.
        new_rows.limit(0).write.mode("overwrite").parquet(state_path)
    return n_touched
