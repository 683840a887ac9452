"""Vectorized LEB128 (protobuf base-128) varints.

Wire format parity target: /root/reference/src/encoding/mod.rs:425-480
(little-endian 7-bit groups, MSB = continuation). Both directions are
whole-array NumPy ops with a fixed 10-iteration byte-position loop — no
per-value Python.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # ceil(64 / 7)
_SHIFTS = (np.uint64(7) * np.arange(_MAX_BYTES, dtype=np.uint64))[None, :]  # (1,10)


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array as concatenated LEB128 varints."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.shape[0]
    if n == 0:
        return b""
    shifted = v[:, None] >> _SHIFTS  # (n, 10); byte k holds shifted[:, k] & 0x7f
    valid = shifted != 0
    valid[:, 0] = True  # every value emits at least one byte
    more = np.zeros_like(valid)
    more[:, :-1] = valid[:, 1:]  # continuation bit: a later byte exists
    mat = (shifted & np.uint64(0x7F)).astype(np.uint8) | (more.astype(np.uint8) << 7)
    return mat[valid].tobytes()  # row-major mask keeps per-value byte order


def varint_decode(buf: bytes | np.ndarray, count: int) -> tuple[np.ndarray, int]:
    """Decode ``count`` varints from ``buf``.

    Returns (uint64 array of length count, bytes consumed).
    """
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if count == 0:
        return np.empty(0, dtype=np.uint64), 0
    ends = np.flatnonzero(b < 0x80)
    if len(ends) < count:
        raise ValueError(f"varint stream truncated: wanted {count}, found {len(ends)}")
    ends = ends[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    if lengths.max() > _MAX_BYTES:
        raise ValueError("varint longer than 10 bytes")
    vals = np.zeros(count, dtype=np.uint64)
    for k in range(int(lengths.max())):
        m = lengths > k
        vals[m] |= (b[starts[m] + k].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
    return vals, int(ends[-1]) + 1
