"""Structured Streaming forms of the incremental contract ([EXT] —
SURVEY.md §2.9: the idiomatic streaming expression of what the reference
does as cron-batch).

These are thin, tested wrappers: the *same* aggregation expressions used
by the batch queries (queries/events.py) run under ``readStream`` with
watermarks. Batch/stream parity is the design point — Spark guarantees it
for windowed aggregations, so the oracle-graded batch results certify the
streaming plans too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded source. Parquet streaming source needs an
    explicit schema; reuse the batch reader's (post ns->us conversion the
    stream sees the same µs timestamps)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file-stream source requires a directory; glob-filter to the one
    # table file inside the sf dir
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def tumbling_counts(stream: DataFrame, watermark_delay: str = "1 hour") -> DataFrame:
    """T2 streaming: watermarked tumbling window counts."""
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_counts(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """T4 streaming: native session_window with watermark-bounded state."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def deduped(stream: DataFrame, watermark_delay: str = "1 hour") -> DataFrame:
    """T5 streaming: stateful dedup with bounded state."""
    return stream.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_sink(
    result: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    mode: str = "append",
) -> None:
    """Drain the stream once (availableNow — the incremental-batch trigger)
    into a parquet sink. foreachBatch is the upsert hook at scale; plain
    append suffices for the smoke contract."""
    (
        result.writeStream.outputMode(mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", sink_dir)
        .start()
        .awaitTermination()
    )


def run_foreach_batch_upsert(
    result: DataFrame,
    sink_path: str,
    keys: list[str],
    checkpoint_dir: str,
    mode: str = "update",
) -> None:
    """foreachBatch upsert: every micro-batch merges id-keyed into the
    sink — the streaming twin of the reference's bulk-upsert push."""
    from modevetl_spark.streaming.incremental import upsert_parquet

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_parquet(batch_df.sparkSession, batch_df, sink_path, keys)

    (
        result.writeStream.outputMode(mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
        .awaitTermination()
    )
