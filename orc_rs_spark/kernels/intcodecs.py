"""Standalone whole-chunk integer codecs: frame-of-reference, bit-packing,
sorted dictionary, raw.

These are the north-star codecs absent from the reference (SURVEY.md §2.5):
FoR and plain bit-packing as single-header chunk formats (fully vectorized,
one NumPy pass per chunk — no per-frame loop; on the delta-vs-FoR tradeoff
see "Can Delta Compete with Frame-of-Reference for Lightweight Integer
Compression?", VLDB 2024 — PAPERS.md — which motivates keeping both and
letting the measured-trial selector choose), sorted dictionary per the ORC
dictionary requirement (/root/reference/src/column_reader/binary_reader.rs:154-230
reads one; ORC spec requires sorted symbol order), and a raw little-endian
fallback for incompressible data.

Layout conventions (self-describing per chunk, all lengths varint):
- for:     varint(zigzag(min)) + 1B width + bitpacked(v - min)
- bitpack: 1B width + bitpacked(zigzag(v))
- dict:    varint(n_dict) + varint(len(dict_stream)) + rlev2(sorted values)
           + rlev2(indices, unsigned)
- raw:     1B item size (4|8) + little-endian values
"""

from __future__ import annotations

import numpy as np

from orc_rs_spark.kernels.bitpack import bit_lengths, bitpack, bitunpack
from orc_rs_spark.kernels.rlev2 import rlev2_decode, rlev2_encode
from orc_rs_spark.kernels.varint import varint_decode, varint_encode
from orc_rs_spark.kernels.zigzag import zigzag_decode, zigzag_encode


def _uvarint(x: int) -> bytes:
    return varint_encode(np.array([x], dtype=np.uint64))


# ----------------------------------------------------------- frame of ref


def for_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    base = int(v.min())
    adj = v.astype(np.uint64) - np.int64(base).astype(np.uint64)  # wraparound-exact
    w = max(1, int(bit_lengths(adj).max(initial=1)))
    return (
        varint_encode(zigzag_encode(np.array([base], dtype=np.int64)))
        + bytes([w])
        + bitpack(adj, w)
    )


def for_decode(buf: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    u, used = varint_decode(b, 1)
    base = int(zigzag_decode(u)[0])
    w = int(b[used])
    adj = bitunpack(b[used + 1 :], w, count)
    return (adj + np.int64(base).astype(np.uint64)).astype(np.int64)


# ----------------------------------------------------------- bit packing


def bitpack_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    z = zigzag_encode(v)
    w = max(1, int(bit_lengths(z).max(initial=1)))
    return bytes([w]) + bitpack(z, w)


def bitpack_decode(buf: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    w = int(b[0])
    return zigzag_decode(bitunpack(b[1:], w, count))


# ----------------------------------------------------------- dictionary


def dict_encode(values: np.ndarray) -> bytes:
    """Sorted symbol table (np.unique is sorted) + RLEv2 index stream.

    The sorted table makes the dictionary stream itself monotone, so it
    delta-encodes well.
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    uniq, inverse = np.unique(v, return_inverse=True)
    dict_stream = rlev2_encode(uniq, signed=True)
    idx_stream = rlev2_encode(inverse.astype(np.int64), signed=False)
    return _uvarint(len(uniq)) + _uvarint(len(dict_stream)) + dict_stream + idx_stream


def dict_decode(buf: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    hdr, used = varint_decode(b, 2)
    n_dict, dict_len = int(hdr[0]), int(hdr[1])
    uniq = rlev2_decode(b[used : used + dict_len], n_dict, signed=True)
    idx = rlev2_decode(b[used + dict_len :], count, signed=False)
    return uniq[idx]


# ----------------------------------------------------------- raw


def raw_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    if v.size and (v.min() >= -(2**31)) and (v.max() < 2**31):
        return bytes([4]) + v.astype("<i4").tobytes()
    return bytes([8]) + v.astype("<i8").tobytes()


def raw_decode(buf: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    b = memoryview(buf)
    size = b[0]
    dt = "<i4" if size == 4 else "<i8"
    return np.frombuffer(b[1 : 1 + count * size], dtype=dt).astype(np.int64)
