"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Two tiers of decode:
- REAL: 24-bit BMP images and PCM16 WAV audio are decoded with pure-NumPy
  codecs written from their public headers (make_bmp/decode_bmp,
  make_wav/decode_wav) — no external library needed, so feature
  extraction over these is a genuine decode-and-pool pipeline.
- STUBBED: formats that require external libraries (JPEG/PNG/MP3) stay
  behind ``REAL_DECODERS`` with a clearly-marked deterministic fake;
  swapping in PIL/ffmpeg later only touches ``_decode_image``.

The Spark-side plumbing (schema, batch shape, mapInArrow signatures,
partition behavior) is identical for both tiers.
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


# ---------------------------------------------------- real codecs (no libs)
# BMP (24-bit uncompressed) and WAV (PCM16) are fully decodable in pure
# NumPy from their public headers — REAL decode paths, not stubs. Formats
# that need external libraries (JPEG/PNG/MP3) stay behind REAL_DECODERS.


def make_bmp(pixels: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 grayscale matrix as a 24-bit uncompressed BMP."""
    h, w = pixels.shape
    row_size = (3 * w + 3) // 4 * 4
    img_size = row_size * h
    header = (
        b"BM"
        + (54 + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = np.repeat(pixels[:, :, None], 3, axis=2)  # gray -> BGR
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    return header + rows[::-1].tobytes()  # BMP stores bottom-up


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (h, w) uint8 grayscale."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little")
    h = int.from_bytes(payload[22:26], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    if bpp != 24 or int.from_bytes(payload[30:34], "little") != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    row_size = (3 * w + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=off)
    bgr = rows.reshape(h, row_size)[::-1, : 3 * w].reshape(h, w, 3)
    return bgr.astype(np.uint16).mean(axis=2).astype(np.uint8)


def make_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode int16 PCM samples as a mono WAV."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little") + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little") + b"data" + len(data).to_bytes(4, "little")
        + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 mono WAV -> (int16 samples, sample rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    rate = int.from_bytes(payload[24:28], "little")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"data":
            return np.frombuffer(payload, dtype="<i2", count=clen // 2, offset=pos + 8), rate
        pos += 8 + clen
    raise ValueError("WAV data chunk not found")


def attach_real_media(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id",
                      n_chars_col: str = "n_chars") -> DataFrame:
    """Synthesize REAL media payloads per document — even docs get a 24-bit
    BMP whose pixels are the text bytes tiled to (h, w); odd docs get a
    PCM16 WAV of the text bytes. Both formats decode with the pure-NumPy
    codecs above (no external libs), so the downstream feature extraction
    is a genuine decode, not a fake. Dimensions derive from n_chars so the
    payload size is exactly predictable in SQL (the driver oracle)."""

    def mk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows == 0:
                continue
            ids = b.column(key_col).to_pylist()
            texts = b.column(text_col).to_pylist()
            ncs = b.column(n_chars_col).to_pylist()
            payloads, mtypes = [], []
            for did, text, nc in zip(ids, texts, ncs):
                raw = np.frombuffer(text.encode(), dtype=np.uint8)
                if did % 2 == 0:
                    w = 8 + nc % 9
                    h = 8 + (nc // 9) % 9
                    pix = np.resize(raw, (h, w)).astype(np.uint8)
                    payloads.append(make_bmp(pix))
                    mtypes.append("image/bmp")
                else:
                    n_samp = 64 + nc % 129
                    samples = (np.resize(raw, n_samp).astype(np.int16) - 128) * 256
                    payloads.append(make_wav(samples))
                    mtypes.append("audio/wav")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(key_col),
                    pa.array(payloads, type=pa.binary()),
                    pa.array(mtypes),
                    pa.array([len(p) for p in payloads], type=pa.int64()),
                ],
                names=["doc_id", "payload", "media_type", "n_bytes"],
            )

    from pyspark.sql import functions as F

    made = docs.select(key_col, text_col, n_chars_col).mapInArrow(
        mk, "doc_id bigint, payload binary, media_type string, n_bytes bigint"
    )
    # checksum JVM-side (F.md5 over the binary column), not a Python loop
    return made.withColumn("checksum", F.md5("payload"))


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

    def _pool_image(img: np.ndarray) -> np.ndarray:
        hh = img.shape[0] // 4 * 4
        ww = img.shape[1] // 4 * 4
        pooled = img[:hh, :ww].reshape(4, hh // 4, 4, ww // 4).mean(axis=(1, 3))
        return (pooled.ravel() / 255.0).astype(np.float32)

    def fx(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows == 0:
                continue
            widths, heights, feats = [], [], []
            for x, mt in zip(b.column("payload"), b.column("media_type").to_pylist()):
                payload = x.as_py()
                if mt == "image/bmp":
                    img = decode_bmp(payload)  # REAL decode, pure NumPy
                    heights.append(img.shape[0])
                    widths.append(img.shape[1])
                    feats.append(_pool_image(img))
                elif mt == "audio/wav":
                    samples, _rate = decode_wav(payload)  # REAL decode
                    heights.append(1)
                    widths.append(len(samples))
                    # 16-bin RMS envelope feature
                    n16 = len(samples) // 16 * 16
                    bins = samples[:n16].astype(np.float64).reshape(16, -1)
                    rms = np.sqrt((bins**2).mean(axis=1)) / 32768.0
                    feats.append(rms.astype(np.float32))
                else:  # opaque formats stay behind the documented stub
                    img = _decode_image(payload)
                    heights.append(img.shape[0])
                    widths.append(img.shape[1])
                    feats.append(_pool_image(img))
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
