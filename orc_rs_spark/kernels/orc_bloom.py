"""ORC bloom-filter index: the hash/bitset contract of the Java writer.

The reference parses bloom indexes and gates on their encoding
(/root/reference/src/stripe.rs:172-222, utf8 gate :209-219) but never
probes them; here they drive actual row-group pruning, both for files we
write and for files Java wrote.

Wire facts (Apache ORC spec + Java org.apache.orc.util.BloomFilter):
- BloomFilterIndex { repeated BloomFilter bloomFilter = 1; } — one entry
  per row group, carried in a BLOOM_FILTER_UTF8 (kind 8) index stream.
- BloomFilter { uint32 numHashFunctions = 1; repeated fixed64 bitset = 2;
  bytes utf8bitset = 3; } — the utf8 variant serializes the long[] bitset
  little-endian in field 3.
- LONG columns hash with the Thomas Wang 64-bit mix; STRING/BINARY with
  Murmur3 hash64 (x64_128's h1 lane), seed 104729, over UTF-8 bytes.
- k probe positions: h1 = low32(hash), h2 = high32(hash) (both signed),
  combined_i = int32(h1 + i*h2) for i in 1..k, bit-flipped if negative,
  position = combined_i % numBits; bit pos -> bitset[pos >> 6] bit pos&63.
"""

from __future__ import annotations

import math

import numpy as np

DEFAULT_SEED = 104729
DEFAULT_FPP = 0.05

_M64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M64
    h ^= h >> 33
    return h


def murmur3_hash64(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """Java org.apache.orc.util.Murmur3.hash64 (the h1 lane of x64_128),
    returned as an unsigned 64-bit int."""
    length = len(data)
    h = seed & _M64
    nblocks = length >> 3
    for i in range(nblocks):
        k = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        k = (k * _C1) & _M64
        k = _rotl64(k, 31)
        k = (k * _C2) & _M64
        h ^= k
        h = _rotl64(h, 27)
        h = (h * 5 + 0x52DCE729) & _M64
    tail = data[nblocks * 8 :]
    if tail:
        k1 = 0
        for i in range(len(tail) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h ^= k1
    h ^= length
    return _fmix64(h)


def murmur3_hash64_many(payload: np.ndarray, starts: np.ndarray,
                        lengths: np.ndarray, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Murmur3 hash64 of N variable-length byte strings, vectorized ACROSS
    the strings: iteration count is max(blocks-per-string), every step a
    whole-array gather + uint64 mix (the scalar ``murmur3_hash64`` loops
    per byte-block per value in Python). ``payload`` must carry >= 7 bytes
    of slack past the last string for the tail gather.

    Inputs: uint8 payload buffer, per-string start offsets and lengths.
    Returns unsigned 64-bit hashes identical to ``murmur3_hash64``."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    c1 = np.uint64(_C1)
    c2 = np.uint64(_C2)
    nblocks = lengths >> 3
    # process in descending-block-count order: the strings still active at
    # block j are then a PREFIX, so each iteration works on array slices
    # (views) instead of boolean-mask copies
    order = np.argsort(-nblocks, kind="stable")
    s_starts = starts[order]
    s_nblocks = nblocks[order]
    s_lengths = lengths[order]
    h = np.full(n, seed, dtype=np.uint64)
    neg_blocks = -s_nblocks  # ascending
    with np.errstate(over="ignore"):
        for j in range(int(s_nblocks[0]) if n else 0):
            cnt = int(np.searchsorted(neg_blocks, -j, side="left"))
            idx = s_starts[:cnt] + 8 * j
            k = np.ascontiguousarray(payload[idx[:, None] + np.arange(8)]).view("<u8").ravel()
            k *= c1
            k = (k << np.uint64(31)) | (k >> np.uint64(33))
            k *= c2
            hm = h[:cnt]
            hm ^= k
            hm[:] = (hm << np.uint64(27)) | (hm >> np.uint64(37))
            hm *= np.uint64(5)
            hm += np.uint64(0x52DCE729)
        tl = s_lengths & 7
        tm = tl > 0
        if tm.any():
            tstart = s_starts[tm] + 8 * s_nblocks[tm]
            raw = payload[tstart[:, None] + np.arange(7)].astype(np.uint64)
            valid = np.arange(7)[None, :] < tl[tm, None]
            shifts = (np.uint64(8) * np.arange(7, dtype=np.uint64))[None, :]
            k1 = ((raw << shifts) * valid.astype(np.uint64)).sum(
                axis=1, dtype=np.uint64
            )
            k1 *= c1
            k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
            k1 *= c2
            h[tm] ^= k1
        h ^= s_lengths.astype(np.uint64)
        # fmix64, whole-array
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


def thomas_wang_hash64(v):
    """Java BloomFilter.getLongHash — vectorized over int64 arrays.

    CAUTION (verified against the bundled orc-core bytecode): all three
    right-shifts are Java's SIGNED ``>>`` (lshr), not ``>>>`` — an
    unsigned-shift port diverges exactly on keys whose intermediate goes
    negative (e.g. the value 0)."""
    with np.errstate(over="ignore"):
        key = np.asarray(v, dtype=np.int64)
        key = (~key) + (key << 21)
        key = key ^ (key >> 24)  # arithmetic shift, as in Java
        key = key + (key << 3) + (key << 8)
        key = key ^ (key >> 14)
        key = key + (key << 2) + (key << 4)
        key = key ^ (key >> 28)
        key = key + (key << 31)
        return key.astype(np.uint64)


def optimal_bits(n: int, fpp: float = DEFAULT_FPP) -> int:
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    return max(64, (m + 63) // 64 * 64)


def optimal_k(n: int, m: int) -> int:
    return max(1, int(round(m / n * math.log(2))))


def _positions(hash64: int, k: int, num_bits: int) -> list[int]:
    h1 = hash64 & 0xFFFFFFFF
    if h1 >= 1 << 31:
        h1 -= 1 << 32
    h2 = (hash64 >> 32) & 0xFFFFFFFF
    if h2 >= 1 << 31:
        h2 -= 1 << 32
    out = []
    for i in range(1, k + 1):
        combined = (h1 + i * h2) & 0xFFFFFFFF
        if combined >= 1 << 31:
            combined -= 1 << 32
        if combined < 0:
            combined = ~combined
        out.append(combined % num_bits)
    return out


class OrcBloom:
    """One row group's bloom filter (probe + build)."""

    def __init__(self, num_bits: int, k: int, bitset: np.ndarray | None = None):
        self.num_bits = num_bits
        self.k = k
        self.bitset = (
            bitset if bitset is not None else np.zeros(num_bits // 64, dtype=np.uint64)
        )

    # ------------------------------------------------------------- probe
    @classmethod
    def from_proto(cls, fields: dict) -> "OrcBloom | None":
        """fields = decode_fields(BloomFilter message)."""
        k = fields.get(1, [0])[-1]
        if 3 in fields:  # utf8bitset: little-endian longs
            raw = bytes(fields[3][-1])
            bitset = np.frombuffer(raw, dtype="<u8").copy()
        elif 2 in fields:  # legacy repeated fixed64
            bitset = np.array(fields[2], dtype=np.uint64)
        else:
            return None
        if k <= 0 or not len(bitset):
            return None
        return cls(len(bitset) * 64, int(k), bitset)

    def _test_hash(self, h: int) -> bool:
        for pos in _positions(h, self.k, self.num_bits):
            if not (int(self.bitset[pos >> 6]) >> (pos & 63)) & 1:
                return False
        return True

    def test_long(self, v: int) -> bool:
        return self._test_hash(int(thomas_wang_hash64(np.int64(v))))

    def test_bytes(self, b: bytes) -> bool:
        return self._test_hash(murmur3_hash64(b))

    # ------------------------------------------------------------- build
    def _add_positions(self, h1: np.ndarray, h2: np.ndarray) -> None:
        for i in range(1, self.k + 1):
            combined = (h1 + np.int32(i) * h2).astype(np.int32)
            combined = np.where(combined < 0, ~combined, combined).astype(np.int64)
            pos = combined % self.num_bits
            np.bitwise_or.at(
                self.bitset, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
            )

    def add_hashes(self, hs: np.ndarray) -> None:
        if not len(hs):
            return
        h1 = (hs & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        h2 = (hs >> np.uint64(32)).astype(np.uint32).view(np.int32)
        self._add_positions(h1, h2)

    def add_longs(self, values: np.ndarray) -> None:
        self.add_hashes(thomas_wang_hash64(values))

    def add_doubles(self, values: np.ndarray) -> None:
        """Java BloomFilter.addDouble: addLong(doubleToLongBits(v)) — raw
        IEEE bits with NaN canonicalized to the Java quiet-NaN pattern."""
        v = np.asarray(values, dtype=np.float64)
        bits = v.view(np.int64)
        bits = np.where(np.isnan(v), np.int64(0x7FF8000000000000), bits)
        self.add_longs(bits)

    def add_bytes_many(self, values) -> None:
        self.add_hashes(np.array([murmur3_hash64(v) for v in values], dtype=np.uint64))

    def add_string_parts(self, payload: np.ndarray, starts: np.ndarray,
                         lengths: np.ndarray) -> None:
        """Build from Arrow string-buffer parts — no per-value Python
        objects (see murmur3_hash64_many)."""
        self.add_hashes(murmur3_hash64_many(payload, starts, lengths))

    def to_proto_body(self) -> bytes:
        from orc_rs_spark.orcfile.writer import _field_bytes, _field_varint

        return _field_varint(1, self.k) + _field_bytes(
            3, self.bitset.astype("<u8").tobytes()
        )
