"""Vectorized big-endian bit-packing and the ORC 5-bit width tables.

Wire format parity target: the bit-serial decoder at
/root/reference/src/encoding/rlev2.rs:71-133 and the width tables at
/root/reference/src/encoding/rlev2.rs:61-69 (Apache ORC v1 spec). The
pack/unpack here is whole-array: value -> 64 big-endian bits via
``np.unpackbits``, slice the low ``width`` bits, repack — the vectorized
replacement for the reference's per-value bit loop (its own TODO at
/root/reference/src/encoding/rlev2.rs:98 points at C++ AVX versions).
"""

from __future__ import annotations

import numpy as np

# encoded 5-bit value -> real bit width (Apache ORC v1 spec)
DIRECT_WIDTH_TABLE = np.array(
    [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
     21, 22, 23, 24, 26, 28, 30, 32, 40, 48, 56, 64],
    dtype=np.int64,
)
DELTA_WIDTH_TABLE = DIRECT_WIDTH_TABLE.copy()
DELTA_WIDTH_TABLE[0] = 0  # encoded 0 = fixed-delta run (no packed deltas)

_DIRECT_ENC = {int(w): i for i, w in enumerate(DIRECT_WIDTH_TABLE)}
_DELTA_ENC = {int(w): i for i, w in enumerate(DELTA_WIDTH_TABLE)}


def bit_width(values: np.ndarray) -> int:
    """Minimum bits needed for the max of a uint64 array (>=1 even for 0)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return 1
    m = int(v.max())
    return max(1, m.bit_length())


def closest_direct_width(width: int) -> int:
    """Round a bit width up to the nearest entry in the direct table."""
    i = int(np.searchsorted(DIRECT_WIDTH_TABLE, max(1, width)))
    return int(DIRECT_WIDTH_TABLE[i])


def closest_delta_width(width: int) -> int:
    """Round a delta bit width up (min usable packed width is 2; 0 = fixed)."""
    if width == 0:
        return 0
    i = int(np.searchsorted(DELTA_WIDTH_TABLE, max(2, width)))
    return int(DELTA_WIDTH_TABLE[i])


def encode_direct_width(width: int) -> int:
    return _DIRECT_ENC[width]


def encode_delta_width(width: int) -> int:
    return _DELTA_ENC[width]


def decode_direct_width(enc: int) -> int:
    return int(DIRECT_WIDTH_TABLE[enc])


def decode_delta_width(enc: int) -> int:
    return int(DELTA_WIDTH_TABLE[enc])


def bitpack(values: np.ndarray, width: int) -> bytes:
    """Pack a uint64 array into ``width``-bit big-endian values (byte-padded)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.shape[0]
    if width == 0 or n == 0:
        return b""
    bits = np.unpackbits(v.astype(">u8").view(np.uint8).reshape(n, 8), axis=1)
    return np.packbits(bits[:, 64 - width:].ravel()).tobytes()


def bitunpack(buf: bytes | np.ndarray, width: int, count: int) -> np.ndarray:
    """Unpack ``count`` ``width``-bit big-endian values -> uint64 array."""
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    need_bits = count * width
    if len(b) * 8 < need_bits:
        raise ValueError(f"bitpacked stream truncated: need {need_bits} bits, have {len(b) * 8}")
    nbytes = (need_bits + 7) // 8
    bits = np.unpackbits(b[:nbytes])[:need_bits].reshape(count, width)
    full = np.zeros((count, 64), dtype=np.uint8)
    full[:, 64 - width:] = bits
    return np.packbits(full, axis=1).view(">u8").ravel().astype(np.uint64)


def packed_size(count: int, width: int) -> int:
    """Bytes occupied by ``count`` ``width``-bit packed values."""
    return (count * width + 7) // 8


def bit_lengths(values: np.ndarray) -> np.ndarray:
    """Per-element bit length of a uint64 array (0 for 0), vectorized."""
    cur = np.asarray(values, dtype=np.uint64).copy()
    bl = np.zeros(cur.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = cur >= np.uint64(1) << np.uint64(s)
        bl[m] += s
        cur[m] >>= np.uint64(s)
    bl[cur > 0] += 1
    return bl
