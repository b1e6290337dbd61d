"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with typed
metadata structs.  The decode/feature-extract kernels are STUBBED — this
container has no image/audio libraries — behind a clearly-marked seam
(``_decode_image_real`` raises NotImplementedError; ``decode_image_meta``
ships a deterministic fake derived from the payload bytes' md5, so the
Spark-side plumbing — schema, Arrow batching, UDF signature, partition
behaviour — is real and testable, and the oracle can recompute it in SQL).

Swap points for production: Pillow/libvips for images, ffmpeg for av.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = "doc_id long, n_bytes long, fake_width int, fake_height int, format string"


def _decode_image_real(payload: bytes):
    """Production seam: real image decode (Pillow/libvips)."""
    raise NotImplementedError("image decode requires an image library (not in this container)")


def fake_image_meta(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decode: dimensions derived from md5(payload).

    width  = 1 + (first 4 md5 hex digits as int) % 2048
    height = 1 + (next 4 md5 hex digits as int) % 2048
    format = jpeg/png/webp by md5 first byte % 3
    """
    h = hashlib.md5(payload).hexdigest()
    width = 1 + int(h[:4], 16) % 2048
    height = 1 + int(h[4:8], 16) % 2048
    fmt = ["jpeg", "png", "webp"][int(h[:2], 16) % 3]
    return width, height, fmt


def decode_image_meta(images: DataFrame) -> DataFrame:
    """(doc_id, payload binary) -> typed metadata via Arrow-batched UDF.

    The batch shape is the production one: one mapInPandas pass, payload
    column pruned away after decode, metadata columns out."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_image_meta(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "fake_width": [m[0] for m in metas],
                    "fake_height": [m[1] for m in metas],
                    "format": [m[2] for m in metas],
                }
            )

    return images.select("doc_id", "payload").mapInPandas(gen, schema=IMAGE_META_SCHEMA)


def frame_sample_plan(video: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: explode a deterministic frame index plan
    per video payload (decode itself stubbed).  Shows the fan-out schema
    (one row per sampled frame) used by a real extractor."""
    from pyspark.sql import functions as F

    n_frames = (F.length("payload") % 300 + 1).alias("n_frames")  # fake probe
    return (
        video.select("doc_id", n_frames)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias(
                "frame_idx"
            ),
        )
    )
