"""T1-T5: streaming-shaped operators, batch-checkable forms.

The reference is *incremental batch*: each run pulls docs newer than the
stored high-water mark, recomputes derived rows, idempotently upserts
(id-keyed ES bulk writes — ``MoDevETL/hierarchy.py``,
``env/elasticsearch.py``). These queries reproduce that contract on the
``events`` table; the true Structured Streaming wrappers (readStream,
withWatermark, dropDuplicatesWithinWatermark, foreachBatch upsert) live in
``modevetl_spark.streaming`` and are smoke-tested, not oracle-graded.

Oracle note: events.ts is ns in parquet; every oracle SQL casts to µs
TIMESTAMP to match Spark's read path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modevetl_spark.functions.compat import sql_tsum, tsum
from modevetl_spark.queries import prep
from modevetl_spark.queries._registry import make_registry
from modevetl_spark.sources.catalog import load

QUERIES, ORACLE, q = make_registry()


_TUMBLING_ORACLE = f"""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_tsum('value', 'total_value')}
FROM events
WHERE ts >= TIMESTAMP '1900-01-01' AND ts < TIMESTAMP '2100-01-01'
GROUP BY 1, 2
"""


@q("q_events_tumbling", oracle_sql=_TUMBLING_ORACLE)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: tumbling window aggregation — F.window(ts, '1 hour'); in
    streaming mode the identical expression runs under a watermark.

    The valid-event-time guard (mirrored in the oracle) bounds the
    emitted window_start domain: a malformed year-0001 event otherwise
    produces a bucket that underflows python's datetime range at the
    driver's collect once a western session timezone shifts it into
    year 0 (strong-probe finding, round 12). Clean fixtures (2024) are
    untouched; streaming deployments get the same bound from their
    watermark."""
    prep(spark)
    ev = load(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit("1900-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2100-01-01").cast("timestamp"))
    )
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            tsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SLIDING_ORACLE = f"""
WITH slides AS (
    -- starts 45 min before the data's first event: a 1h window beginning
    -- up to 3 slides earlier still overlaps the first events, and Spark
    -- emits those windows too
    SELECT s AS window_start
    FROM generate_series(TIMESTAMP '2023-12-31 23:15:00',
                         TIMESTAMP '2024-02-01 00:00:00',
                         INTERVAL 15 MINUTE) AS t(s)
)
SELECT s.window_start,
       COUNT(e.event_id) AS n_events
FROM slides s
JOIN events e
  ON CAST(e.ts AS TIMESTAMP) >= s.window_start
 AND CAST(e.ts AS TIMESTAMP) < s.window_start + INTERVAL 1 HOUR
GROUP BY 1
"""


@q("q_events_sliding", oracle_sql=_SLIDING_ORACLE)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: sliding window — window(ts, '1 hour', '15 minutes'); each event
    lands in 4 overlapping windows (Spark expands them without a join)."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


# Session assembly via the lag-gap-cumsum idiom so the SQL oracle can
# replicate session_window() exactly: a session breaks after >30 min of
# user inactivity; session bounds = min(ts) .. max(ts)+gap.
_SESSION_ORACLE = """
WITH marked AS (
    SELECT user_id, event_id,
           CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN CAST(ts AS TIMESTAMP)
                     - LAG(CAST(ts AS TIMESTAMP))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
),
sessions AS (
    SELECT user_id, ts,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


@q("q_events_session", oracle_sql=_SESSION_ORACLE)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: session windows (30 min gap) via lag-gap-cumsum — the
    batch-exact twin of ``session_window(ts, '30 minutes')`` (which is
    exercised in tests/test_streaming.py; its struct output and gap-merge
    rules are engine-specific, so the oracle-graded form is this idiom).
    """
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gap_s = 30 * 60
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_order))
            > gap_s * 1_000_000,
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_id", F.sum("is_new").over(w_run).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


_DEDUP_ORACLE = """
SELECT user_id, event_type,
       COUNT(*) AS n_unique_minutes
FROM (
    SELECT DISTINCT user_id, event_type,
           date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute
    FROM events
)
GROUP BY user_id, event_type
"""


@q("q_events_dedup", oracle_sql=_DEDUP_ORACLE)
def events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: stateful dedup — dropDuplicates on a derived identity (user,
    type, minute); the streaming form is dropDuplicatesWithinWatermark."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    dedup = ev.select(
        "user_id",
        "event_type",
        F.date_trunc("minute", "ts").alias("minute"),
    ).dropDuplicates(["user_id", "event_type", "minute"])
    return dedup.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_unique_minutes")
    )


_SESSION_TERMINAL_ORACLE = """
WITH marked AS (
    SELECT user_id, event_id, event_type,
           CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN CAST(ts AS TIMESTAMP)
                     - LAG(CAST(ts AS TIMESTAMP))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                  OR LAG(event_type)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     = 'purchase'
                THEN 1 ELSE 0 END AS is_new
    FROM events
),
sessions AS (
    SELECT user_id, ts, event_type,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
FROM sessions
GROUP BY user_id, session_id
"""


@q("q_events_session_terminal", oracle_sql=_SESSION_TERMINAL_ORACLE)
def events_session_terminal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4+ batch twin of streaming/structured.stateful_sessions: sessions
    close on a 30-min gap OR a terminal 'purchase' event. The custom
    close rule is lag-gap-cumsum expressible in batch — the streaming
    form needs applyInPandasWithState (tested for parity in
    tests/test_streaming.py); this oracle-grades the shared semantics."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = ev.withColumn(
        "is_new",
        F.when(
            (
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(w_order))
                > 30 * 60 * 1_000_000
            )
            | (F.lag("event_type").over(w_order) == "purchase"),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_id", F.sum("is_new").over(w_run).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
