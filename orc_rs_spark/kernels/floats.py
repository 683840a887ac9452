"""Float column codecs.

Parity target: the reference stores f32/f64 as raw little-endian IEEE754
pre-block-compression (/root/reference/src/column_reader/numeric_reader.rs:
212-312). Added beyond the reference: byte-stream-split (BSS) — transpose
the byte planes so exponents/high-mantissa bytes group together, which
general-purpose compressors then crush (the trick Parquet v2 standardized;
public knowledge) — selected per chunk when a compression probe says it
wins.

Layout: [mode:1B (0=raw,1=bss)][itemsize:1B (4|8)] + payload.
"""

from __future__ import annotations

import numpy as np

RAW, BSS = 0, 1


def float_encode(values: np.ndarray, mode: int | None = None) -> bytes:
    v = np.ascontiguousarray(values)
    if v.dtype not in (np.dtype("<f4"), np.dtype("<f8")):
        v = v.astype("<f8")
    item = v.dtype.itemsize
    if len(v) == 0:
        return bytes([RAW, item])
    if mode is None:
        # probe: BSS pays when byte planes are individually compressible
        import zlib

        sample = v[: 16384 // item * 8]
        raw_b = sample.tobytes()
        bss_b = sample.view(np.uint8).reshape(-1, item).T.copy().tobytes()
        c = lambda b: len(zlib.compress(b, 1))  # noqa: E731
        mode = BSS if c(bss_b) < 0.95 * c(raw_b) else RAW
    if mode == BSS:
        return bytes([BSS, item]) + v.view(np.uint8).reshape(-1, item).T.copy().tobytes()
    return bytes([RAW, item]) + v.tobytes()


def float_decode(buf: bytes, count: int) -> np.ndarray:
    b = memoryview(buf)
    mode, item = b[0], b[1]
    dt = "<f4" if item == 4 else "<f8"
    if count == 0:
        return np.empty(0, dtype=dt)
    payload = np.frombuffer(b[2 : 2 + count * item], dtype=np.uint8)
    if mode == BSS:
        return np.ascontiguousarray(payload.reshape(item, count).T).view(dt).ravel()
    return payload.view(dt)
