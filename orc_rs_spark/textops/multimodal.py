"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no image/audio libraries, so the *decode* step is stubbed
(NotImplementedError behind ``REAL_DECODERS``) and feature extraction is a
clearly-marked deterministic fake — but the Spark-side plumbing (schema,
batch shape, mapInArrow signatures, partition behavior) is real and tested,
per the round brief. Swapping in PIL/ffmpeg later only touches the two
stub functions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

REAL_DECODERS = False  # flip when image/audio libs exist in the runtime

MEDIA_DDL = (
    "doc_id bigint, payload binary, media_type string, n_bytes bigint, "
    "checksum string"
)

FEATURE_DDL = "doc_id bigint, media_type string, width int, height int, feature array<float>"


def attach_media(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload per document (utf-8 bytes of the
    text stand in for an image/audio blob) plus typed metadata columns.

    Pure JVM expressions (whole-stage codegen, zero Python): encode ->
    octet_length -> md5. Only the *decode* of real media needs Python."""
    from pyspark.sql import functions as F

    return docs.select(
        F.col(key_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    ).select(
        "doc_id",
        "payload",
        "media_type",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
    )


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB — real decoder requires an imaging library absent from this
    container. The deterministic fake derives a (h, w) gray image from the
    payload hash so downstream plumbing has real shapes to chew on."""
    if REAL_DECODERS:
        raise NotImplementedError("wire a real image decoder here")
    h = hashlib.sha256(payload).digest()
    height = 8 + h[0] % 8
    width = 8 + h[1] % 8
    rng = np.random.default_rng(int.from_bytes(h[2:10], "little"))
    return rng.integers(0, 256, (height, width), dtype=np.uint8)


def extract_features(media: DataFrame) -> DataFrame:
    """Batch feature extraction over binary payloads: decode (stubbed),
    downsample to a fixed 16-dim float vector. Arrow-batched; the per-batch
    loop is over payload blobs (unavoidable for opaque binaries), all math
    NumPy."""

    def fx(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows == 0:
                continue
            widths, heights, feats = [], [], []
            for x in b.column("payload"):
                img = _decode_image(x.as_py())
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                # 4x4 mean-pool "feature"
                hh = img.shape[0] // 4 * 4
                ww = img.shape[1] // 4 * 4
                pooled = img[:hh, :ww].reshape(4, hh // 4, 4, ww // 4).mean(axis=(1, 3))
                feats.append((pooled.ravel() / 255.0).astype(np.float32))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    b.column("media_type"),
                    pa.array(widths, type=pa.int32()),
                    pa.array(heights, type=pa.int32()),
                    pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
                ],
                names=["doc_id", "media_type", "width", "height", "feature"],
            )

    return media.mapInArrow(fx, FEATURE_DDL)
