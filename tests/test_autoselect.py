"""Auto-selector picks the expected codec family per FIXTURES.md F2 regime
(the ORC writer-heuristic mirror, SURVEY.md §4.3), and the choice is never
worse than raw.
"""

import numpy as np
import pytest

from orc_rs_spark.kernels.select import INT_CODECS, choose_string_codec, encode_ints_auto

RNG = np.random.default_rng(42)

REGIMES = {
    # regime -> (generator, acceptable codec families)
    "const_runs": (
        lambda n: np.repeat(RNG.integers(0, 8, n // 6 + 1), 6)[:n].astype(np.int64),
        {"rlev2_rle", "rlev2", "dict"},
    ),
    "monotone": (
        lambda n: np.cumsum(RNG.integers(0, 5, n)).astype(np.int64),
        {"rlev2"},
    ),
    "uniform_small": (
        lambda n: RNG.integers(0, 16, n).astype(np.int64),
        {"bitpack", "rlev2", "for", "dict"},
    ),
    "uniform_full": (
        lambda n: RNG.integers(-(2**31), 2**31, n).astype(np.int64),
        {"raw", "bitpack", "rlev2", "for"},
    ),
    "clustered_offset": (
        lambda n: (10**9 + RNG.integers(0, 256, n)).astype(np.int64),
        {"for", "rlev2"},  # rlev2 covers it via patched-base/FoR frames
    ),
    "outlier_spiked": (
        lambda n: _spiked(n),
        {"rlev2", "for"},  # patched-base inside rlev2
    ),
    "low_distinct": (
        lambda n: RNG.choice(np.array([5, 90001, -3, 2**20, 77], dtype=np.int64), n),
        {"dict", "rlev2", "bitpack", "for"},
    ),
}


def _spiked(n):
    v = (5000 + RNG.integers(0, 64, n)).astype(np.int64)
    v[RNG.choice(n, max(1, n // 50), replace=False)] = RNG.integers(2**40, 2**50, max(1, n // 50))
    return v


@pytest.mark.parametrize("regime", sorted(REGIMES))
def test_selector_matches_regime(regime):
    gen, acceptable = REGIMES[regime]
    v = gen(20_000)
    codec, enc = encode_ints_auto(v)
    assert codec in acceptable, f"{regime}: picked {codec}"
    # chosen encoding must round-trip and never exceed raw size + slack
    raw = INT_CODECS["raw"][0](v)
    assert len(enc) <= len(raw) * 1.01
    dec = INT_CODECS[codec][1](enc, len(v))
    np.testing.assert_array_equal(dec, v)


def test_string_selector_regimes():
    import pyarrow as pa

    low_distinct = pa.array(["web", "books", "code"] * 1000)
    assert choose_string_codec(low_distinct).startswith("str_dict")
    english = pa.array([f"the quick brown fox number {i} jumps over" for i in range(2000)])
    assert "fsst" in choose_string_codec(english)
    randomish = pa.array(["".join(RNG.choice(list("qxzjvkw0189"), 20)) for _ in range(1500)])
    assert choose_string_codec(randomish) in ("str_direct", "str_direct_fsst")
