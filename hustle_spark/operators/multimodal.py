"""Multimodal column plumbing (north-star EXT; SURVEY.md section 2.10 L5).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The decode/feature-extract stage runs as an Arrow-batched
``mapInPandas`` so payload bytes move executor-side in columnar
batches — the driver never sees them, and batch size (not row count)
bounds memory.

The actual media decoding libraries (PIL/ffmpeg/torchaudio) are NOT in
this container, so ``decode_image_batch`` is a clearly-marked STUB: it
computes deterministic pseudo-features (byte length, a checksum, fake
width/height parsed from the header bytes) with the exact Spark-side
plumbing — schema, partitioning, Arrow batch shape — that a real
decoder would use. Swap ``_decode_one`` for a real decoder on a
cluster with the libs installed.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta struct<filename: string, declared_w: int, declared_h: int>"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, checksum long, "
    "width int, height int, ok boolean"
)


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media table from any source column by treating its bytes
    as the payload (deterministic fake for tests; real pipelines read
    ``spark.read.format('binaryFile')``)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.concat(F.lit("doc_"), F.col(id_col).cast("string")).alias("filename"),
            F.lit(64).alias("declared_w"),
            F.lit(64).alias("declared_h"),
        ).alias("meta"),
    )


def _decode_one(payload: bytes) -> tuple[int, int, int, int, bool]:
    """STUB decoder. A real implementation would do e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not in container
        return img.width, img.height, ...

    Instead: deterministic pseudo-decode (length, additive checksum,
    fake dims from leading bytes) so tests exercise real plumbing.
    """
    n = len(payload)
    checksum = sum(payload[:256]) + n * 31
    width = (payload[0] % 64 + 1) if n > 0 else 0
    height = (payload[1] % 64 + 1) if n > 1 else 0
    return n, checksum, width, height, n > 0


def decode_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_one(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [f[0] for f in feats],
                    "checksum": [f[1] for f in feats],
                    "width": [f[2] for f in feats],
                    "height": [f[3] for f in feats],
                    "ok": [f[4] for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame sampling *plan*: expands each media row into frame
    descriptors (frame_no) without decoding — the decode itself would be
    a second ``mapInPandas`` over (payload, frame_no). Demonstrates the
    explode-then-decode shape that bounds per-task memory."""
    n_frames = (F.octet_length("payload") / F.lit(every_n)).cast("int")
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_no"),
    )
