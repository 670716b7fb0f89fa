"""Sketch operators: distributed Misra–Gries heavy-hitter candidates
and the fixed-width histogram quantile sketch.

The classic two-pass heavy-hitter plan for a key space too large to
hash-aggregate exactly (token streams at corpus scale):

1. **Sketch pass** — each partition folds its stream through a
   Misra–Gries summary of ``k`` counters (Misra & Gries 1982; the
   batch-merge decrement rule is the MERGE of Agarwal et al.,
   "Mergeable Summaries", PODS 2012): combine counts, then subtract the
   (k+1)-th largest count from every counter and drop the non-positive
   ones. Guarantee: any item with partition frequency > n_p/(k+1)
   survives the partition's summary.
2. **Verify pass** — the union of per-partition candidates (≤ k·P rows,
   broadcastable) filters the stream; exact counts over candidates only.

Why the result is exact AND partitioning-independent: if a key's global
frequency exceeds n/k then by pigeonhole some partition holds it above
n_p/k > n_p/(k+1), so it is guaranteed to be a candidate no matter how
rows are distributed; spurious candidates are eliminated by the exact
verify filter. The final output is therefore the true heavy-hitter set
with exact counts — hash-gradable against a plain GROUP BY/HAVING
oracle — while the full key space is never shuffled.

Reference parity: the reference has no sketch layer (its qb aggregates
are exact, `pyLibrary/queries`); this is part of the mandated
LLM-pipeline family ([LOCAL BASELINE.json]).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_summary(df: DataFrame, col: str, k: int) -> DataFrame:
    """One sketch pass: per-partition Misra–Gries summaries.

    Returns a DataFrame with schema ``(tok string, n_part long)``:
    candidate rows carry ``tok`` (``n_part`` null), and one sentinel row
    per partition carries the partition's total item count (``tok``
    null) — so the caller gets candidates AND the stream length from a
    single pass over the data.

    The per-batch fold counts the Arrow batch C-side
    (``value_counts``), merges into the running dict, and applies the
    mergeable-summaries decrement only when the state overflows ``k`` —
    per-item python work is O(1) amortized and the state never exceeds
    ``2k`` entries between trims.

    NULL CONTRACT: null values are excluded from both the candidates
    and the sentinel totals — the sketch answers "heavy hitters among
    non-null values". The exclusion is an explicit ``isNotNull`` filter
    pushed BEFORE the sketch (not an accident of ``value_counts``), so
    a nullable column cannot collide with the tok-null sentinel row,
    and the verify pass's null-rejecting equi-join sees the same
    population as the sketch's totals.
    """

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[str, int] = {}
        total = 0
        for pdf in batches:
            counts = pdf[col].value_counts()
            total += int(counts.sum())
            for tok, c in counts.items():
                state[tok] = state.get(tok, 0) + int(c)
            if len(state) > k:
                # MERGE decrement (Agarwal et al. 2012): subtract the
                # (k+1)-th largest count, drop non-positive counters.
                m = sorted(state.values(), reverse=True)[k]
                state = {t: c - m for t, c in state.items() if c > m}
        yield pd.DataFrame(
            {
                "tok": list(state) + [None],
                "n_part": pd.Series(
                    [None] * len(state) + [total], dtype="Int64"
                ),
            }
        )

    return (
        df.select(F.col(col).alias(col))
        .where(F.col(col).isNotNull())
        .mapInPandas(fold, schema=f"{col} string, n_part long")
    )


def heavy_hitters_exact(
    stream: DataFrame, col: str, k: int, denom: int
) -> DataFrame:
    """Candidate-then-verify heavy hitters: every ``col`` value whose
    exact frequency strictly exceeds ``n/denom``, with exact counts.

    Requires ``k >= denom`` for the superset guarantee (an item above
    n/denom is above n_p/(k+1) in at least one partition). The summary
    is tiny, so it is localCheckpointed once and read twice (candidate
    set + stream total) instead of re-running the sketch pass —
    Catalyst does not reuse the mapInPandas subtree across branches.
    """
    if k < denom:
        raise ValueError(f"k={k} must be >= denom={denom} for the guarantee")
    summ = mg_summary(stream, col, k).localCheckpoint(eager=True)
    cands = summ.where(F.col(col).isNotNull()).select(col).distinct()
    total = summ.agg(F.sum("n_part").cast("long").alias("n_total"))
    exact = (
        stream.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * denom > F.col("n_total"))
        .select(
            col,
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("n_total"), 6).alias(
                "share"
            ),
        )
    )


def run_heavy_hitters_tick(
    spark, batch: DataFrame, col: str, k: int, state_path: str
) -> None:
    """Standing-job tick: fold one arriving batch into a persisted
    Misra–Gries summary of at most ``k`` counters (plus one total-count
    row). Mergeable-summaries semantics end to end: the batch folds to
    per-partition summaries (one mapInPandas pass, no shuffle), those
    merge with the stored summary by counter addition (candidate counts
    re-counted EXACTLY from the batch — tighter than carrying the MG
    under-estimates), and the combined state trims with the
    (k+1)-th-largest decrement. Error accounting: a batch's
    never-added mass per item is bounded by its internal fold trims
    (≤ n_batch/(k+1) summed over the batch) and state-level trims
    remove ≥ (k+1)·m mass each, so the LIFETIME undercount per item is
    ≤ 2·n_total/(k+1) — every item with lifetime frequency
    > 2·n_total/(k+1) has a positive counter after any tick sequence
    (size the job with k ≥ 2·denom for an n/denom detection target);
    ``n_total`` is tracked exactly in the sentinel row.

    The state is ≤ k+1 rows BY CONFIG, so the trim runs driver-side on
    a bounded collect and the store is a tiny overwrite — this is the
    one standing job whose state does not grow with the corpus at all.
    A consumer answers "current heavy-hitter candidates" from the state
    alone, and exact-verifies them with one broadcast-filtered count
    over the corpus when precision matters (the
    :func:`heavy_hitters_exact` second pass).

    Replay contract: NOT idempotent (replaying a batch double-counts) —
    pair with a watermark pull exactly like
    ``operators/aggstate.merge_aggregate_state`` documents.
    """
    from modevetl_spark.sources.fs import fs_has_parquet_files

    summ = mg_summary(batch, col, k)
    rows = summ.collect()
    state: dict[str, int] = {}
    total = 0
    if fs_has_parquet_files(spark, state_path):
        for r in spark.read.parquet(state_path).collect():
            if r["tok"] is None:
                total += int(r["cnt"])
            else:
                state[r["tok"]] = int(r["cnt"])
    for r in rows:
        if r["tok"] is None:
            total += int(r["n_part"])
        else:
            # per-partition batch summaries carry no counts (candidates
            # only) — re-count the batch's candidate occurrences exactly
            # in one filtered pass below
            state.setdefault(r["tok"], 0)
    batch_cands = [t for t in state]
    if batch_cands:
        cnts = (
            batch.where(F.col(col).isin(batch_cands))
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        for r in cnts:
            state[r[col]] = state.get(r[col], 0) + int(r["c"])
    if len(state) > k:
        m = sorted(state.values(), reverse=True)[k]
        state = {t: c - m for t, c in state.items() if c > m}
    out = [(t, c) for t, c in state.items()] + [(None, total)]
    spark.createDataFrame(out, f"tok string, cnt long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(state_path)


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[tuple[str, float]],
    k: int = 1024,
) -> DataFrame:
    """Mergeable fixed-width histogram quantile sketch with a rank-check
    verdict — locate each requested quantile to a bucket of a K-bucket
    equi-width histogram WITHOUT ever sorting or range-exchanging the
    data (-> ``queries/wave7.q_sketch_quantiles`` for the oracle-graded
    face and the full plan-shape story).

    Returns one row per prob: ``(p_label, n, est_bucket, bounds_ok)``
    where ``bounds_ok`` asserts the exact quantile's rank falls inside
    the estimated bucket ±1 bucket of slack, computed by counting raw
    values against the bucket's widened edges — an independent path
    from the floor-division bucket assignment.

    Cross-engine determinism: min/max/count are order-free, the bucket
    id is two exact IEEE ops (``floor((v - mn) / width)``), the walk is
    integer arithmetic. A constant column (width = 0) degenerates to
    one bucket 0 holding every row, with the verdict still true by the
    rank definition.
    """
    from modevetl_spark.operators.ranking import global_running

    spark = df.sparkSession
    vals = df.select(F.col(value_col).alias("v"))
    stats = vals.agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).withColumn("width", (F.col("mx") - F.col("mn")) / F.lit(float(k)))
    bucket = (
        F.when(
            F.col("width") > 0,
            F.least(
                F.floor((F.col("v") - F.col("mn")) / F.col("width")),
                F.lit(k - 1).cast("long"),
            ),
        )
        .otherwise(0)
        .cast("bigint")
    )
    hist = (
        vals.crossJoin(F.broadcast(stats))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = global_running(hist, ["bucket"], sums={"cum": "cnt"})
    probs_df = spark.createDataFrame(probs, "p_label string, p double")
    tgt = probs_df.crossJoin(
        F.broadcast(stats.select("mn", "width", "n"))
    ).withColumn("target", F.ceil(F.col("p") * F.col("n")).cast("bigint"))
    est = (
        tgt.join(F.broadcast(cum), F.col("cum") >= F.col("target"))
        .groupBy("p_label", "target", "mn", "width", "n")
        .agg(F.min("bucket").alias("est_bucket"))
    )
    edges = est.select(
        "p_label",
        "target",
        (F.col("mn") + (F.col("est_bucket") + 2) * F.col("width")).alias("hi"),
        (F.col("mn") + (F.col("est_bucket") - 1) * F.col("width")).alias("lo"),
    )
    chk = (
        vals.crossJoin(F.broadcast(edges))
        .groupBy("p_label")
        .agg(
            F.count(F.when(F.col("v") <= F.col("hi"), 1)).alias("cnt_le_hi"),
            F.count(F.when(F.col("v") < F.col("lo"), 1)).alias("cnt_lt_lo"),
        )
    )
    return est.join(chk, "p_label").select(
        "p_label",
        "n",
        "est_bucket",
        (
            (F.col("cnt_le_hi") >= F.col("target"))
            & (F.col("cnt_lt_lo") < F.col("target"))
        ).alias("bounds_ok"),
    )
