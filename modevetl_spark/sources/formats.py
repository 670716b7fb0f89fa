"""Additional source/sink formats (S3/S4 breadth).

The reference ingests JSON documents (``CNV.JSON2object`` over ES scroll
responses) and emits JSON bulk bodies. The driver fixtures are parquet;
these helpers cover the other formats an engine user needs, with the
same schema-explicit discipline (inference is opt-in — at 100 TB you
never want a full-scan schema inference pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (the reference's document interchange form)."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines source. Pass a schema for production reads; omitting it
    triggers Spark's inference scan (fine for tests, not for 100 TB)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    reader = spark.read.option("header", True)
    reader = reader.schema(schema) if schema is not None else reader.option(
        "inferSchema", True
    )
    return reader.csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def es_bulk_lines(df: DataFrame, index: str, id_col: str) -> DataFrame:
    """Render rows as Elasticsearch bulk-API body lines — the reference's
    push format (bulk POST of alternating action/source JSON lines, with
    the document id in the action so replays upsert idempotently).

    Each row becomes one string: the index action (``{"index":
    {"_index": ..., "_id": ...}}``) and the source document joined by a
    newline; writing the single column as text yields a valid bulk body.
    Pure JVM expression work (to_json) — at 100 TB each partition
    renders its own batch, which is exactly the bulk-batch boundary a
    sink connector would POST.
    """
    action = F.to_json(
        F.struct(
            F.struct(
                F.lit(index).alias("_index"),
                F.col(id_col).cast("string").alias("_id"),
            ).alias("index")
        )
    )
    source = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.select(F.concat(action, F.lit("\n"), source).alias("line"))


def write_range_sorted(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    n_partitions: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, within-partition-sorted parquet — the data
    layout play for 100 TB scan-heavy tables: ``repartitionByRange``
    gives each output file a disjoint key range and the sort tightens
    per-row-group min/max stats, so a range predicate prunes to the few
    files (and row groups) that can match instead of scanning the table.
    The same layout is what makes incremental watermark pulls cheap:
    ``ts > hwm`` touches only the tail files.
    """
    (
        df.repartitionByRange(n_partitions, *range_cols)
        .sortWithinPartitions(*range_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Z-order (Morton) key: interleave the low ``bits`` bits of each
    column's rank-ish integer value. Two/N-dimensional locality in ONE
    sort key — points close in every dimension land in the same files, so
    min/max stats prune multi-column predicates the way a single-column
    range sort only can for its lead column (the Delta/Iceberg OPTIMIZE
    ZORDER play, built from plain shiftleft/or expressions).

    Columns must be non-negative integers that fit ``bits`` bits (rank or
    bucket them first; values are masked to ``bits`` bits defensively).
    ``len(cols) * bits`` must fit the 63 value bits of a signed long:
    JVM long shifts wrap mod 64, so an unguarded 4x16-bit key would place
    a bit on the sign position (inverting sort order) and a 5x16-bit key
    would silently fold dimensions onto each other.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} interleaved bits; "
            "must be <= 63 (signed long) — lower `bits` or drop a column"
        )
    mask = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        v = c.cast("long").bitwiseAND(F.lit(mask))
        for i in range(bits):
            # bit i of dimension d lands at interleaved position i*n + d
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + d)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_partitions: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: range-partition + sort on the Morton key
    of ``zorder_cols`` so every output file covers a compact hyper-rectangle
    of the key space — predicates on ANY of the z-ordered columns prune
    files/row-groups via parquet min/max stats, not just the lead sort
    column. The key is dropped before writing (layout-only)."""
    z = zorder_value([F.col(c) for c in zorder_cols], bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: pre-shuffles data into hash buckets so
    later equi-joins/aggregations on the bucket key need NO exchange —
    the co-located join strategy for repeated 100 TB fact-fact joins.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
