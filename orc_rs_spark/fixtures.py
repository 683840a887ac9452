"""Deterministic generator for the north-star input table (FIXTURES.md F1/F2).

Schema: (doc_id string, tokens array<int32>, n_tok int32, source string).
Seeded NumPy only — no external data. ``source`` is deliberately Zipf-skewed
(web~55%) to exercise the skew-defusing repartitioning (BASELINE.json:14).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SOURCES = ["web", "books", "code", "wiki", "forums", "papers", "chat", "legal"]
SOURCE_WEIGHTS = np.array([0.55, 0.20, 0.10, 0.06, 0.04, 0.025, 0.02, 0.005])

REGIME_NAMES = (
    "const_runs",
    "monotone",
    "uniform_small",
    "uniform_full",
    "clustered_offset",
    "outlier_spiked",
    "low_distinct",
    "edge_cases",
)


def _tokens_for(regime: str, n: int, rng: np.random.Generator) -> np.ndarray:
    if regime == "const_runs":
        k = max(1, n // 8)
        v = np.repeat(rng.integers(0, 64, k), rng.integers(3, 12, k))[:n]
        if len(v) < n:
            v = np.pad(v, (0, n - len(v)), mode="edge")
        return v.astype(np.int32)
    if regime == "monotone":
        start = int(rng.integers(0, 1000))
        step = rng.integers(0, 5, n)
        v = start + np.cumsum(step)
        return (v if rng.random() < 0.5 else v[::-1]).astype(np.int32)
    if regime == "uniform_small":
        b = int(rng.choice([4, 8, 12, 16]))
        return rng.integers(0, 2**b, n).astype(np.int32)
    if regime == "uniform_full":
        return rng.integers(-(2**31), 2**31 - 1, n).astype(np.int32)
    if regime == "clustered_offset":
        base = int(rng.integers(2**20, 2**30))
        return (base + rng.integers(0, 2**8, n)).astype(np.int32)
    if regime == "outlier_spiked":
        v = (10**6 + rng.integers(0, 2**10, n)).astype(np.int64)
        k = max(1, int(n * rng.uniform(0.01, 0.05)))
        v[rng.choice(n, k, replace=False)] = rng.integers(2**28, 2**31 - 1, k)
        return v.astype(np.int32)
    if regime == "low_distinct":
        vocab = rng.integers(0, 2**31 - 1, int(rng.integers(100, 1000)))
        ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
        p = (1 / ranks) / (1 / ranks).sum()
        return vocab[rng.choice(len(vocab), n, p=p)].astype(np.int32)
    # edge_cases
    choice = int(rng.integers(0, 4))
    if choice == 0:
        return np.zeros(n, dtype=np.int32)
    if choice == 1:
        return np.full(n, 2**31 - 1, dtype=np.int32)
    if choice == 2:
        return np.full(n, -(2**31), dtype=np.int32)
    return np.where(np.arange(n) % 2 == 0, 1, -1).astype(np.int32)


def token_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic Arrow table of token sequences."""
    rng = np.random.default_rng(seed)
    lengths = np.clip(rng.lognormal(5.0, 1.0, n_rows), 1, 8192).astype(np.int64)
    # edge-case rows include empties
    regimes = np.arange(n_rows) % len(REGIME_NAMES)
    lengths[(regimes == 7) & (np.arange(n_rows) % 16 == 7)] = 0
    src_idx = rng.choice(len(SOURCES), n_rows, p=SOURCE_WEIGHTS / SOURCE_WEIGHTS.sum())
    flat_parts = []
    for i in range(n_rows):
        flat_parts.append(_tokens_for(REGIME_NAMES[regimes[i]], int(lengths[i]), rng))
    flat = np.concatenate(flat_parts) if flat_parts else np.empty(0, dtype=np.int32)
    offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
    doc_id = pa.array([f"doc-{i:012d}" for i in range(n_rows)])
    source = pa.array([SOURCES[j] for j in src_idx])
    return pa.Table.from_arrays(
        [doc_id, tokens, pa.array(lengths.astype(np.int32)), source],
        names=["doc_id", "tokens", "n_tok", "source"],
    )


def token_df(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """Spark DataFrame of the fixture table (via Arrow-backed createDataFrame)."""
    tbl = token_table(n_rows, seed)
    df = spark.createDataFrame(tbl.to_pandas())
    if partitions:
        df = df.repartition(partitions)
    return df
