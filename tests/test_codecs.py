"""Round-trip tests: byte RLE, boolean RLE, RLEv1, FoR, bitpack, dict, raw,
block compression, FSST, string codecs.

RLEv1 known-answer vectors come from FIXTURES.md F3 (backported from the
reference's own tests at /root/reference/src/encoding/rlev1.rs:361-505).
"""

import numpy as np
import pyarrow as pa
import pytest

from orc_rs_spark.kernels.blockcomp import block_compress, block_decompress
from orc_rs_spark.kernels.byte_rle import (
    boolean_rle_decode,
    boolean_rle_encode,
    byte_rle_decode,
    byte_rle_encode,
)
from orc_rs_spark.kernels.fsst import fsst_decode, fsst_encode
from orc_rs_spark.kernels.intcodecs import (
    bitpack_decode,
    bitpack_encode,
    dict_decode,
    dict_encode,
    for_decode,
    for_encode,
    raw_decode,
    raw_encode,
)
from orc_rs_spark.kernels.rlev1 import rlev1_decode, rlev1_encode
from orc_rs_spark.kernels.strings import (
    string_dict_decode,
    string_dict_encode,
    string_direct_decode,
    string_direct_encode,
)

RNG = np.random.default_rng(42)


# ------------------------------------------------------------- byte RLE


def test_byte_rle_roundtrip_runs():
    v = np.repeat(RNG.integers(0, 4, 100), RNG.integers(1, 300, 100)).astype(np.uint8)
    np.testing.assert_array_equal(byte_rle_decode(byte_rle_encode(v), len(v)), v)


def test_byte_rle_roundtrip_random():
    v = RNG.integers(0, 256, 5000).astype(np.uint8)
    np.testing.assert_array_equal(byte_rle_decode(byte_rle_encode(v), len(v)), v)


def test_byte_rle_all_same():
    v = np.full(1000, 7, dtype=np.uint8)
    enc = byte_rle_encode(v)
    assert len(enc) <= 2 * (1000 // 130 + 1)
    np.testing.assert_array_equal(byte_rle_decode(enc, 1000), v)


def test_boolean_rle_roundtrip():
    for v in (
        RNG.random(1000) < 0.5,
        np.ones(777, dtype=bool),
        np.zeros(8, dtype=bool),
        np.array([True]),
    ):
        np.testing.assert_array_equal(boolean_rle_decode(boolean_rle_encode(v), len(v)), v)


# ------------------------------------------------------------- RLEv1


def test_rlev1_reference_vector():
    # FIXTURES.md F3: [0x61,0xff,0x64, 0xfb,0x02,0x03,0x05,0x07,0x0b] ->
    # run of 100 values descending from 100 (header 97 -> len 100, delta -1,
    # base 100), then 5 literal varints [2,3,5,7,11] (unsigned)
    buf = bytes([0x61, 0xFF, 0x64, 0xFB, 0x02, 0x03, 0x05, 0x07, 0x0B])
    out = rlev1_decode(buf, 105, signed=False)
    assert out[:100].tolist() == list(range(100, 0, -1))
    assert out[100:].tolist() == [2, 3, 5, 7, 11]


def test_rlev1_roundtrip():
    for v in (
        np.arange(1000, dtype=np.int64),
        RNG.integers(-(2**31), 2**31, 500).astype(np.int64),
        np.repeat(np.int64(5), 1000),
        np.array([2, 3, 5, 7, 11], dtype=np.int64),
        np.array([], dtype=np.int64),
    ):
        enc = rlev1_encode(v, signed=True)
        np.testing.assert_array_equal(rlev1_decode(enc, len(v), signed=True), v)


def test_rlev1_unsigned_roundtrip():
    v = RNG.integers(0, 2**62, 300).astype(np.int64)
    enc = rlev1_encode(v, signed=False)
    np.testing.assert_array_equal(rlev1_decode(enc, len(v), signed=False), v)


# ------------------------------------------------------------- int codecs


INTS = {
    "ramp": np.arange(5000, dtype=np.int64) * 7 - 100,
    "clustered": 10**12 + RNG.integers(0, 1000, 5000).astype(np.int64),
    "random32": RNG.integers(-(2**31), 2**31, 5000).astype(np.int64),
    "low_distinct": RNG.choice(np.array([3, 1000, -5, 77], dtype=np.int64), 5000),
    "single": np.array([42], dtype=np.int64),
    "empty": np.array([], dtype=np.int64),
    "extremes": np.array([2**63 - 1, -(2**63), 0], dtype=np.int64),
}


@pytest.mark.parametrize("name", sorted(INTS))
@pytest.mark.parametrize(
    "enc,dec",
    [(for_encode, for_decode), (bitpack_encode, bitpack_decode), (dict_encode, dict_decode), (raw_encode, raw_decode)],
    ids=["for", "bitpack", "dict", "raw"],
)
def test_int_codec_roundtrip(name, enc, dec):
    v = INTS[name]
    np.testing.assert_array_equal(dec(enc(v), len(v)), v)


def test_for_beats_bitpack_on_clustered():
    v = INTS["clustered"]
    assert len(for_encode(v)) < len(bitpack_encode(v)) / 2


def test_dict_wins_low_distinct():
    v = INTS["low_distinct"]
    assert len(dict_encode(v)) < len(raw_encode(v)) / 4


# ------------------------------------------------------------- block comp


def test_block_compress_roundtrip():
    data = bytes(RNG.integers(0, 4, 100_000).astype(np.uint8))  # 2-bit entropy
    comp = block_compress(data)
    assert len(comp) < len(data) / 3
    assert block_decompress(comp) == data


def test_block_compress_incompressible_escape():
    data = bytes(RNG.integers(0, 256, 10_000).astype(np.uint8))
    comp = block_compress(data)
    assert len(comp) <= len(data) + 3 * (len(data) // (2**23 - 1) + 1)
    assert block_decompress(comp) == data


def test_block_compress_empty():
    assert block_decompress(block_compress(b"")) == b""


# ------------------------------------------------------------- FSST


TEXTS = [
    b"the quick brown fox jumps over the lazy dog " * 200,
    b"aaaaaaaaaabbbbbbbbbb" * 50,
    b"",
    b"x",
    bytes(RNG.integers(0, 256, 5000).astype(np.uint8)),  # binary / incompressible
    "ünïcödé tèxt with ACCENTS and ümlaüts ".encode() * 100,
    b"\xff\xff\xff escape bytes \xff inside " * 40,
]


@pytest.mark.parametrize("i", range(len(TEXTS)))
@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_fsst_roundtrip(i, rounds):
    data = TEXTS[i]
    enc = fsst_encode(data, rounds=rounds)
    assert fsst_decode(enc) == data


def test_fsst_compresses_text():
    data = b"the quick brown fox jumps over the lazy dog " * 500
    enc1 = fsst_encode(data, rounds=1)
    enc2 = fsst_encode(data, rounds=2)
    assert len(enc1) < len(data) * 0.7
    assert len(enc2) <= len(enc1)


def test_fsst_never_grows():
    for data in TEXTS:
        assert len(fsst_encode(data, rounds=2)) <= len(data) + 1


# ------------------------------------------------------------- strings


WORDS = ["web", "books", "code", "wiki", "forums", "papers", "chat", "legal"]


def _random_strings(n):
    return pa.array(
        ["".join(RNG.choice(list("abcdefgh XYZ"), RNG.integers(0, 30))) for _ in range(n)]
    )


@pytest.mark.parametrize("use_fsst", [False, True])
def test_string_direct_roundtrip(use_fsst):
    arr = _random_strings(500)
    enc = string_direct_encode(arr, use_fsst=use_fsst)
    out = string_direct_decode(enc, len(arr), use_fsst=use_fsst)
    assert out.to_pylist() == arr.to_pylist()


@pytest.mark.parametrize("use_fsst", [False, True])
def test_string_dict_roundtrip(use_fsst):
    arr = pa.array([WORDS[i % len(WORDS)] for i in RNG.integers(0, 8, 2000)])
    enc = string_dict_encode(arr, use_fsst=use_fsst)
    out = string_dict_decode(enc, len(arr), use_fsst=use_fsst)
    assert out.to_pylist() == arr.to_pylist()
    assert len(enc) < 2000  # 2000 low-distinct strings must crush


def test_string_dict_sorted_symbol_table():
    arr = pa.array(["zz", "aa", "mm", "zz", "aa"])
    enc = string_dict_encode(arr)
    # decode and confirm values; sortedness is internal but round-trip must hold
    assert string_dict_decode(enc, 5).to_pylist() == ["zz", "aa", "mm", "zz", "aa"]


def test_string_empty_and_unicode():
    arr = pa.array(["", "héllo wörld", "", "日本語テキスト", "x"])
    for codec_enc, codec_dec in (
        (string_direct_encode, string_direct_decode),
        (string_dict_encode, string_dict_decode),
    ):
        enc = codec_enc(arr, use_fsst=True)
        assert codec_dec(enc, len(arr), use_fsst=True).to_pylist() == arr.to_pylist()


def test_rlev1_orc_cpp_backported_vectors():
    """Remaining FIXTURES.md F3 RLEv1 vectors (backported from Apache ORC
    C++ via the reference's tests, /root/reference/src/encoding/rlev1.rs:
    393-505): signed literals, split header, split runs, signed long run."""
    # signed literals: [0xf8, 0x00..0x07] -> 8 zigzag literals 0,-1,1,-2,2,-3,3,-4
    out = rlev1_decode(bytes([0xF8, 0x0, 0x1, 0x2, 0x3, 0x4, 0x5, 0x6, 0x7]), 8, signed=True)
    assert out.tolist() == [0, -1, 1, -2, 2, -3, 3, -4]
    # split header: run of 3 x 247864668 (varint spans buffer boundaries)
    out = rlev1_decode(bytes([0x00, 0x00, 0xDC, 0xBA, 0x98, 0x76]), 3, signed=False)
    assert out.tolist() == [247864668] * 3
    # split runs: 128-run from 255 step 1, then literals [2,3,4,5] -> first 126 checked
    out = rlev1_decode(bytes([0x7D, 0x01, 0xFF, 0x01, 0xFB, 0x01, 0x02, 0x03, 0x04, 0x05]), 126, signed=False)
    assert out.tolist() == [255 + i for i in range(126)]
    # signed long run: 130 values from 16 step -1 (header 0x7f, delta 0xff, base zigzag 0x20)
    out = rlev1_decode(bytes([0x7F, 0xFF, 0x20]), 130, signed=True)
    assert out.tolist() == [16 - i for i in range(130)]
