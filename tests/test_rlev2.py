"""RLEv2 wire-vector and round-trip tests.

Known-answer vectors are the ORC spec examples quoted in FIXTURES.md F3 and
the reference's doc comments (/root/reference/src/encoding/rlev2.rs:26-58);
regimes follow FIXTURES.md F2.
"""

import numpy as np
import pytest

from orc_rs_spark.kernels.rlev2 import MAX_RUN, rlev2_decode, rlev2_encode, rlev2_encode_runs

RNG = np.random.default_rng(42)


# ---------------------------------------------------------- known vectors


def test_short_repeat_spec_example():
    # [0x0a, 0x27, 0x10] -> five 10000s (unsigned)
    out = rlev2_decode(bytes([0x0A, 0x27, 0x10]), 5, signed=False)
    assert out.tolist() == [10000] * 5


def test_direct_spec_example():
    # [0x5e,0x03,0x5c,0xa1,0xab,0x1e,0xde,0xad,0xbe,0xef] -> [23713,43806,57005,48879]
    buf = bytes([0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF])
    out = rlev2_decode(buf, 4, signed=False)
    assert out.tolist() == [23713, 43806, 57005, 48879]


def test_delta_spec_example_fixed():
    # [0xc0,0x13,0x00,0x02] -> 0..19 (fixed delta 1, signed zigzag varints)
    out = rlev2_decode(bytes([0xC0, 0x13, 0x00, 0x02]), 20, signed=True)
    assert out.tolist() == list(range(20))


def test_delta_spec_example_primes():
    # unsigned [2,3,5,7,11,13,17,19,23,29] -> [0xc6,0x09,0x02,0x02,0x22,0x42,0x42,0x46]
    buf = bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46])
    out = rlev2_decode(buf, 10, signed=False)
    assert out.tolist() == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]


def test_delta_negative_sequence():
    # FIXTURES.md: [0xce,0x04,0xe7,0x07,0xc8,0x01,0x32,0x19,0x0f] -> [-500,-400,-350,-325,-310]
    buf = bytes([0xCE, 0x04, 0xE7, 0x07, 0xC8, 0x01, 0x32, 0x19, 0x0F])
    out = rlev2_decode(buf, 5, signed=True)
    assert out.tolist() == [-500, -400, -350, -325, -310]


def test_fixed_delta_signed_ramp():
    # [0xc0,0x40,0x3f,0x02] -> -32..32 (65 values, base -32 zigzag=0x3f, delta 1)
    out = rlev2_decode(bytes([0xC0, 0x40, 0x3F, 0x02]), 65, signed=True)
    assert out.tolist() == list(range(-32, 33))


# ---------------------------------------------------------- round trips


REGIMES = {
    "const_runs": lambda n: np.repeat(
        RNG.integers(0, 50, size=max(1, n // 40)), RNG.integers(3, 100, size=max(1, n // 40))
    )[:n].astype(np.int64),
    "monotone_inc": lambda n: np.cumsum(RNG.integers(0, 7, size=n)).astype(np.int64),
    "monotone_dec": lambda n: (-np.cumsum(RNG.integers(1, 7, size=n))).astype(np.int64),
    "fixed_ramp": lambda n: (100 + 3 * np.arange(n)).astype(np.int64),
    "uniform_4bit": lambda n: RNG.integers(0, 16, size=n).astype(np.int64),
    "uniform_16bit": lambda n: RNG.integers(0, 2**16, size=n).astype(np.int64),
    "uniform_full": lambda n: RNG.integers(-(2**31), 2**31, size=n).astype(np.int64),
    "clustered_offset": lambda n: (10**9 + RNG.integers(0, 256, size=n)).astype(np.int64),
    "outlier_spiked": lambda n: _spiked(n),
    "negatives": lambda n: RNG.integers(-100, 100, size=n).astype(np.int64),
    "alternating": lambda n: np.where(np.arange(n) % 2 == 0, 2**30, -(2**30)).astype(np.int64),
}


def _spiked(n):
    v = (5000 + RNG.integers(0, 64, size=n)).astype(np.int64)
    k = max(1, n // 50)
    idx = RNG.choice(n, size=k, replace=False)
    v[idx] = RNG.integers(2**40, 2**50, size=k)
    return v


@pytest.mark.parametrize("regime", sorted(REGIMES))
@pytest.mark.parametrize("n", [1, 2, 3, 7, 100, 511, 512, 513, 5000])
def test_roundtrip_frame_encoder(regime, n):
    v = REGIMES[regime](n)
    buf = rlev2_encode(v, signed=True)
    np.testing.assert_array_equal(rlev2_decode(buf, len(v), signed=True), v)


@pytest.mark.parametrize("regime", sorted(REGIMES))
def test_roundtrip_run_encoder(regime):
    v = REGIMES[regime](4000)
    buf = rlev2_encode_runs(v, signed=True)
    np.testing.assert_array_equal(rlev2_decode(buf, len(v), signed=True), v)


def test_roundtrip_unsigned():
    v = RNG.integers(0, 2**62, size=3000).astype(np.int64)
    buf = rlev2_encode(v, signed=False)
    np.testing.assert_array_equal(rlev2_decode(buf, len(v), signed=False), v)


def test_empty():
    assert rlev2_encode(np.array([], dtype=np.int64)) == b""
    assert rlev2_decode(b"", 0).tolist() == []


def test_extremes():
    v = np.array([0, 2**31 - 1, -(2**31), 1, -1] * 10, dtype=np.int64)
    buf = rlev2_encode(v)
    np.testing.assert_array_equal(rlev2_decode(buf, len(v)), v)


def test_int64_extremes():
    v = np.array([2**63 - 1, -(2**63), 0, -1, 1], dtype=np.int64)
    buf = rlev2_encode(v)
    np.testing.assert_array_equal(rlev2_decode(buf, len(v)), v)


def test_long_constant_run():
    v = np.full(10_000, 42, dtype=np.int64)
    buf = rlev2_encode_runs(v)
    assert len(buf) < 100  # ~20 fixed-delta blocks of 512
    np.testing.assert_array_equal(rlev2_decode(buf, len(v)), v)


def test_compression_wins():
    """Sanity: each regime's encoded size beats raw 8-byte ints where expected."""
    n = 8192
    raw = n * 8
    for regime in ("const_runs", "monotone_inc", "fixed_ramp", "uniform_4bit", "clustered_offset"):
        v = REGIMES[regime](n)
        assert len(rlev2_encode(v)) < raw / 3, regime


def test_patched_base_beats_direct_on_spiked():
    v = _spiked(8192)
    enc = rlev2_encode(v)
    # direct would need 56-64 bits/value due to spikes; patched should get near 8
    assert len(enc) < 8192 * 3
    np.testing.assert_array_equal(rlev2_decode(enc, len(v)), v)


def test_frame_boundary_splits():
    """Decode equality must hold regardless of how runs straddle frames."""
    for n in (MAX_RUN - 1, MAX_RUN, MAX_RUN + 1, 2 * MAX_RUN + 3):
        v = np.arange(n, dtype=np.int64) * 3 - 1000
        np.testing.assert_array_equal(rlev2_decode(rlev2_encode(v), n), v)


def test_run_modes_truncated_raises_valueerror():
    """A stream cut mid-header (or mid-payload) must raise the documented
    ValueError from rlev2_run_modes, never IndexError (round-6 ADVICE)."""
    import pytest

    from orc_rs_spark.kernels.rlev2 import rlev2_run_modes

    v = np.concatenate([
        np.arange(600, dtype=np.int64),          # delta
        np.full(400, 7, dtype=np.int64),         # short repeat
        np.array([5, 900, 3, 1 << 40] * 200, dtype=np.int64),  # patched/direct
    ])
    enc = rlev2_encode(v)
    full = rlev2_run_modes(enc, len(v))
    assert sum(full.values()) >= 3
    for cut in (0, 1, 2, 3, len(enc) // 3, len(enc) - 1):
        with pytest.raises(ValueError, match="truncated"):
            rlev2_run_modes(enc[:cut], len(v))


def test_patched_header_width_overflow_is_valueerror():
    """A crafted patched-base header with pw=64 (encoded 31) and pgw=8
    makes pgw+pw=72, past the 32-entry direct width table: both the
    decoder and rlev2_run_modes must raise the documented ValueError,
    never IndexError (round-6 ADVICE)."""
    import pytest

    from orc_rs_spark.kernels.rlev2 import rlev2_decode, rlev2_run_modes

    # tag=2 (patched), encoded width 31 -> 64 bits, n-1=7 -> n=8
    h0 = (2 << 6) | (31 << 1) | 0
    h1 = 7
    h2 = (0 << 5) | 31          # bw=1, pw encoded 31 -> 64
    h3 = (7 << 5) | 1           # pgw=8, pll=1
    buf = bytes([h0, h1, h2, h3, 0]) + b"\x00" * 80
    with pytest.raises(ValueError, match="patched-base header"):
        rlev2_run_modes(buf, 8)
    with pytest.raises(ValueError, match="patched-base header"):
        rlev2_decode(buf, 8, signed=True)
