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


from orc_rs_spark.kernels.strings import arrow_string_views as _string_parts


def _tile_bytes(tdata: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                length: int) -> np.ndarray:
    """(k, length) uint8: each row's source bytes cycled to ``length``
    (np.resize semantics), one gather for the whole bucket. Zero-length
    sources tile to zeros, matching np.resize — an empty row at the END
    of the buffer has start == len(tdata), so it is repointed at a valid
    byte before the gather and zeroed after."""
    empty = lens == 0
    if len(tdata) == 0:
        return np.zeros((len(starts), length), dtype=np.uint8)
    safe = np.maximum(lens, 1)
    s = np.where(empty, 0, starts)
    idx = s[:, None] + (np.arange(length)[None, :] % safe[:, None])
    out = tdata[idx]
    out[empty] = 0
    return out


def _binary_from_blocks(n: int, sizes: np.ndarray,
                        blocks: list[tuple[np.ndarray, np.ndarray]]) -> pa.Array:
    """One contiguous binary column from per-bucket payload matrices:
    ``blocks`` is [(row_indices, (k, size) uint8 matrix)]. No per-row
    python bytes objects anywhere."""
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    buf = np.empty(int(offsets[-1]), dtype=np.uint8)
    for rows_idx, mat in blocks:
        pos = offsets[rows_idx][:, None] + np.arange(mat.shape[1])[None, :]
        buf[pos] = mat
    if offsets[-1] <= 2**31 - 1:
        return pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(buf.tobytes())],
        )
    return pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
    )


def synthesize_media_batch(b: pa.RecordBatch, key_col: str = "doc_id",
                           text_col: str = "text",
                           n_chars_col: str = "n_chars") -> pa.RecordBatch:
    """One Arrow batch of real media payloads, bucketed by geometry: one
    vectorized pixel/sample build per distinct (w, h) or n_samp — Python
    codec work (make_bmp/make_wav, header only) runs once per BUCKET
    (<= 81 BMP + <= 129 WAV geometries), never per row; payload bytes
    assemble into a single binary column buffer."""
    n = b.num_rows
    ids = b.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    nc = b.column(n_chars_col).to_numpy(zero_copy_only=False).astype(np.int64)
    starts, lens, tdata = _string_parts(b.column(text_col))
    even = ids % 2 == 0
    bw = 8 + nc % 9
    bh = 8 + (nc // 9) % 9
    row_size = (3 * bw + 3) // 4 * 4
    n_samp = 64 + nc % 129
    sizes = np.where(even, 54 + row_size * bh, 44 + 2 * n_samp)
    blocks: list[tuple[np.ndarray, np.ndarray]] = []
    for w, h in {(int(w_), int(h_)) for w_, h_ in zip(bw[even], bh[even])}:
        m = np.flatnonzero(even & (bw == w) & (bh == h))
        rs = (3 * w + 3) // 4 * 4
        img = _tile_bytes(tdata, starts[m], lens[m], h * w).reshape(-1, h, w)
        rows = np.zeros((len(m), h, rs), dtype=np.uint8)
        rows[:, :, : 3 * w] = np.repeat(img[..., None], 3, axis=-1).reshape(-1, h, 3 * w)
        hdr = np.frombuffer(make_bmp(np.zeros((h, w), np.uint8))[:54], dtype=np.uint8)
        mat = np.empty((len(m), 54 + rs * h), dtype=np.uint8)
        mat[:, :54] = hdr
        mat[:, 54:] = rows[:, ::-1, :].reshape(len(m), -1)
        blocks.append((m, mat))
    for ns in {int(x) for x in n_samp[~even]}:
        m = np.flatnonzero(~even & (n_samp == ns))
        raw = _tile_bytes(tdata, starts[m], lens[m], ns).astype(np.int16)
        data = ((raw - 128) * 256).astype("<i2").view(np.uint8).reshape(len(m), 2 * ns)
        hdr = np.frombuffer(make_wav(np.zeros(ns, np.int16))[:44], dtype=np.uint8)
        mat = np.empty((len(m), 44 + 2 * ns), dtype=np.uint8)
        mat[:, :44] = hdr
        mat[:, 44:] = data
        blocks.append((m, mat))
    payload = _binary_from_blocks(n, sizes, blocks)
    mtypes = pa.array(np.where(even, "image/bmp", "audio/wav"))
    return pa.RecordBatch.from_arrays(
        [b.column(key_col), payload, mtypes, pa.array(sizes, type=pa.int64())],
        names=["doc_id", "payload", "media_type", "n_bytes"],
    )


def attach_real_media(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id",
                      n_chars_col: str = "n_chars") -> DataFrame:
    """Synthesize REAL media payloads per document — even docs get a 24-bit
    BMP whose pixels are the text bytes tiled to (h, w); odd docs get a
    PCM16 WAV of the text bytes. Both formats decode with the pure-NumPy
    codecs above (no external libs), so the downstream feature extraction
    is a genuine decode, not a fake. Dimensions derive from n_chars so the
    payload size is exactly predictable in SQL (the driver oracle).

    Rows are BUCKETED by geometry: one vectorized pixel/sample build per
    distinct (w, h) or n_samp — the per-batch Python loop is over
    geometry buckets (<= 81 BMP + <= 129 WAV), never rows."""

    def mk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows == 0:
                continue
            yield synthesize_media_batch(b, key_col, text_col, n_chars_col)

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


def _le32_at(pdata: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Vectorized little-endian uint32 reads at N byte positions."""
    bts = pdata[pos[:, None] + np.arange(4)].astype(np.uint32)
    return bts[:, 0] | (bts[:, 1] << 8) | (bts[:, 2] << 16) | (bts[:, 3] << 24)


def _pool_image(img: np.ndarray) -> np.ndarray:
    """4x4 mean-pool of one (h, w) image -> 16 floats in [0, 1]."""
    hh = img.shape[0] // 4 * 4
    ww = img.shape[1] // 4 * 4
    pooled = img[:hh, :ww].reshape(4, hh // 4, 4, ww // 4).mean(axis=(1, 3))
    return (pooled.ravel() / 255.0).astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """Batch feature extraction over binary payloads: REAL BMP/WAV decode,
    downsample to a fixed 16-dim float vector. Arrow-batched AND
    geometry-bucketed: headers are parsed with vectorized byte gathers,
    then one NumPy decode+pool pass per distinct (w, h) / sample-count —
    the per-batch Python loop is over geometry buckets, not rows. Only
    the documented stub tier (opaque formats) decodes per payload."""

    def fx(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for b in batches:
            if b.num_rows == 0:
                continue
            n = b.num_rows
            pay = b.column("payload")
            starts, lens, pdata = _string_parts(pay)
            mt = b.column("media_type")
            is_bmp = pc.equal(mt, "image/bmp").to_numpy(zero_copy_only=False)
            is_wav = pc.equal(mt, "audio/wav").to_numpy(zero_copy_only=False)
            widths = np.zeros(n, dtype=np.int32)
            heights = np.zeros(n, dtype=np.int32)
            feats = np.zeros((n, 16), dtype=np.float32)

            bi = np.flatnonzero(is_bmp)
            if len(bi):
                if int(lens[bi].min()) < 54:
                    raise ValueError("not a BMP payload")  # shorter than the header
                s = starts[bi]
                if not (
                    (pdata[s] == ord("B")) & (pdata[s + 1] == ord("M"))
                ).all():
                    raise ValueError("not a BMP payload")
                off = _le32_at(pdata, s + 10).astype(np.int64)
                ws = _le32_at(pdata, s + 18).astype(np.int64)
                hs = _le32_at(pdata, s + 22).astype(np.int64)
                bpp = pdata[s + 28].astype(np.int64) | (pdata[s + 29].astype(np.int64) << 8)
                compz = _le32_at(pdata, s + 30)
                if ((bpp != 24) | (compz != 0)).any():
                    raise ValueError("only 24-bit uncompressed BMP supported")
                # declared geometry must fit INSIDE its own payload — a lying
                # header would otherwise gather bytes from neighboring rows'
                # payloads in the shared batch buffer (silent wrong features)
                # or run off the buffer end. Cap dims first so the size
                # product can't overflow int64 (top-down BMPs store height
                # as a huge unsigned value and are rejected here too).
                if ((ws <= 0) | (hs <= 0) | (ws > 1 << 16) | (hs > 1 << 16)).any():
                    raise ValueError("unsupported BMP dimensions")
                need = off + ((3 * ws + 3) // 4 * 4) * hs
                if (need > lens[bi]).any():
                    raise ValueError("truncated BMP payload")
                widths[bi] = ws
                heights[bi] = hs
                for w, h, o in {(int(a), int(c), int(d)) for a, c, d in zip(ws, hs, off)}:
                    mloc = np.flatnonzero((ws == w) & (hs == h) & (off == o))
                    m = bi[mloc]
                    rs = (3 * w + 3) // 4 * 4
                    idx = (starts[m] + o)[:, None] + np.arange(rs * h)[None, :]
                    rows = pdata[idx].reshape(-1, h, rs)[:, ::-1, : 3 * w]
                    gray = (
                        rows.reshape(-1, h, w, 3).astype(np.uint16).mean(axis=3)
                    ).astype(np.uint8)
                    hh, ww = h // 4 * 4, w // 4 * 4
                    pooled = gray[:, :hh, :ww].reshape(-1, 4, hh // 4, 4, ww // 4).mean(axis=(2, 4))
                    feats[m] = (pooled.reshape(-1, 16) / 255.0).astype(np.float32)

            wi = np.flatnonzero(is_wav)
            if len(wi):
                if int(lens[wi].min()) < 44:
                    raise ValueError("not a WAV payload")  # shorter than the header
                s = starts[wi]
                sig_ok = np.ones(len(wi), dtype=bool)
                for j, ch in enumerate(b"RIFF"):
                    sig_ok &= pdata[s + j] == ch
                for j, ch in enumerate(b"WAVE"):
                    sig_ok &= pdata[s + 8 + j] == ch
                if not sig_ok.all():
                    raise ValueError("not a WAV payload")
                # canonical layout (our writer + any standard minimal WAV):
                # 'data' chunk right after fmt, at byte 36. Anything else
                # falls back to the scalar chunk walk.
                canon = np.ones(len(wi), dtype=bool)
                for j, ch in enumerate(b"data"):
                    canon &= pdata[s + 36 + j] == ch
                nsamps = np.zeros(len(wi), dtype=np.int64)
                dstart = np.zeros(len(wi), dtype=np.int64)
                nsamps[canon] = _le32_at(pdata, s[canon] + 40).astype(np.int64) // 2
                dstart[canon] = s[canon] + 44
                # declared data size must fit inside its own payload (see
                # the BMP check above for why)
                if (44 + 2 * nsamps[canon] > lens[wi][canon]).any():
                    raise ValueError("truncated WAV payload")
                for j in np.flatnonzero(~canon):
                    # non-canonical chunk layout: scalar walk, inline RMS
                    row = wi[j]
                    samp, _rate = decode_wav(
                        pdata[starts[row] : starts[row] + lens[row]].tobytes()
                    )
                    heights[row] = 1
                    widths[row] = len(samp)
                    n16 = len(samp) // 16 * 16
                    bins = samp[:n16].astype(np.float64).reshape(16, -1)
                    feats[row] = (np.sqrt((bins**2).mean(axis=1)) / 32768.0).astype(np.float32)
                heights[wi[canon]] = 1
                widths[wi[canon]] = nsamps[canon]
                for ns in {int(x) for x in nsamps[canon]}:
                    mloc = np.flatnonzero(canon & (nsamps == ns))
                    m = wi[mloc]
                    idx = dstart[mloc][:, None] + np.arange(2 * ns)[None, :]
                    samples = (
                        np.ascontiguousarray(pdata[idx]).view("<i2").reshape(-1, ns)
                    )
                    n16 = ns // 16 * 16
                    bins = samples[:, :n16].astype(np.float64).reshape(-1, 16, n16 // 16)
                    rms = np.sqrt((bins**2).mean(axis=2)) / 32768.0
                    feats[m] = rms.astype(np.float32)

            other = np.flatnonzero(~is_bmp & ~is_wav)
            for row in other:  # opaque formats stay behind the documented stub
                img = _decode_image(pdata[starts[row] : starts[row] + lens[row]].tobytes())
                heights[row] = img.shape[0]
                widths[row] = img.shape[1]
                feats[row] = _pool_image(img)

            feature = pa.ListArray.from_arrays(
                pa.array(np.arange(0, 16 * (n + 1), 16, dtype=np.int32)),
                pa.array(feats.ravel(), type=pa.float32()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    b.column("media_type"),
                    pa.array(widths, type=pa.int32()),
                    pa.array(heights, type=pa.int32()),
                    feature,
                ],
                names=["doc_id", "media_type", "width", "height", "feature"],
            )

    return media.mapInArrow(fx, FEATURE_DDL)
