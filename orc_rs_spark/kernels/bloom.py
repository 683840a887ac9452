"""Per-chunk Bloom filters over token values.

The reference parses BLOOM_FILTER streams but never uses them for pruning
(`// TODO: pruning using an index`, /root/reference/src/stripe.rs:171;
stream kinds /root/reference/src/proto/orc_proto.proto:124-142). Here the
filter is both built (vectorized, double-hashing h1+i*h2 like the public
ORC util) and actually used: chunk-level membership pruning before decode.

Layout: [k:1B][m/8 bytes of bits].
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)


def _mix(v: np.ndarray, c: np.uint64) -> np.ndarray:
    x = v.astype(np.uint64) * c
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return x


def bloom_build(values: np.ndarray, bits_per_value: int = 10, k: int = 7) -> bytes:
    """Build a Bloom filter over distinct int64 values (vectorized)."""
    v = np.unique(np.asarray(values, dtype=np.int64))
    m = max(64, 1 << int(np.ceil(np.log2(max(1, len(v)) * bits_per_value))))
    h1 = _mix(v, _C1)
    h2 = _mix(v, _C2) | np.uint64(1)
    bits = np.zeros(m, dtype=bool)
    mm = np.uint64(m - 1)  # m is a power of two
    for i in range(k):
        bits[(h1 + np.uint64(i) * h2) & mm] = True
    return bytes([k]) + np.packbits(bits).tobytes()


def bloom_might_contain(filt: bytes, values: np.ndarray) -> np.ndarray:
    """Vectorized membership probe -> bool array (False = definitely absent)."""
    k = filt[0]
    bits = np.unpackbits(np.frombuffer(filt, dtype=np.uint8, offset=1)).astype(bool)
    m = len(bits)
    v = np.asarray(values, dtype=np.int64)
    h1 = _mix(v, _C1)
    h2 = _mix(v, _C2) | np.uint64(1)
    out = np.ones(len(v), dtype=bool)
    mm = np.uint64(m - 1)
    for i in range(k):
        out &= bits[(h1 + np.uint64(i) * h2) & mm]
    return out
