"""Multimodal column plumbing ([EXT]): image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode step itself is STUBBED (no image/audio libs in this container):
``decode_stub`` derives deterministic fake features from the payload bytes
so the Spark-side plumbing — schema, batching, partitioning, UDF signature
— is real and oracle-testable end to end. Swap ``_fake_features`` for a
PIL/libav call in production; nothing else changes.

Scale notes: mapInPandas streams Arrow record batches (no per-row Python
overhead); binary payloads stay off the shuffle (derive features early,
project payload away); `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds batch memory for fat binaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_bytes", LongType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
        StructField("fake_n_frames", LongType()),
    ]
)


def _fake_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video decode.

    Production implementation decodes the payload (PIL / torchaudio /
    pyav) — NotImplementedError semantics are documented rather than
    raised so the plumbing stays runnable in this container.
    """
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 7 + 1)


def extract_features(binary_df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    Rows with a NULL id are dropped JVM-side before the UDF: a NULL key
    is unjoinable downstream and would otherwise reach pandas as NaN,
    where the int64 id cast aborts the whole job on one dirty row. NULL
    payloads are processed as empty (payload_bytes = 0)."""

    binary_df = binary_df.where(F.col(id_col).isNotNull())

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            feats = [_fake_features(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "fake_width": [f[0] for f in feats],
                    "fake_height": [f[1] for f in feats],
                    "fake_n_frames": [f[2] for f in feats],
                }
            )

    return binary_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture an opaque binary payload column from text (the fixtures
    carry no real media; the bytes are opaque to everything downstream)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
        StructField("thumb_w", LongType()),
        StructField("thumb_h", LongType()),
    ]
)


def _thumb(w: int, h: int, max_side: int = 64) -> tuple[int, int]:
    """Aspect-preserving resize to a max_side bounding box — integer
    arithmetic only, so the oracle replays it exactly."""
    if w >= h:
        return max_side, max(1, (h * max_side) // w)
    return max(1, (w * max_side) // h), max_side


def sample_frames(
    binary_df: DataFrame,
    every: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling + resize over a binary video payload — the
    UDTF-shaped multimodal stage (one input row fans out to its sampled
    frames). The decode is the same deterministic stub as
    ``extract_features`` (frame count from payload length, frame
    "content" as md5(doc_id:frame_idx)); production swaps in pyav
    keyframe extraction and a real thumbnailer — schema, batching, and
    fan-out shape stay identical.

    Scale notes: mapInPandas streams Arrow batches and emits a
    DIFFERENT row count than it consumes (the UDTF contract); payloads
    are projected away before anything shuffles, and the fan-out factor
    is bounded by frames/every.

    Rows with a NULL id are dropped JVM-side before the UDF (same
    contract as ``extract_features``): a NULL key would reach pandas as
    NaN and abort the job at the int() cast on one dirty row."""
    import hashlib

    binary_df = binary_df.where(F.col(id_col).isNotNull())

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes, tws, ths = [], [], [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, n_frames = _fake_features(p if p is not None else b"")
                tw, th = _thumb(w, h)
                for fi in range(0, n_frames, every):
                    ids.append(int(did))
                    idxs.append(fi)
                    hashes.append(
                        hashlib.md5(f"{did}:{fi}".encode()).hexdigest()
                    )
                    tws.append(tw)
                    ths.append(th)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                    "thumb_w": pd.Series(tws, dtype="int64"),
                    "thumb_h": pd.Series(ths, dtype="int64"),
                }
            )

    return binary_df.mapInPandas(batches, schema=FRAME_SCHEMA)
