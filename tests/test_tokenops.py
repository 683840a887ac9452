"""Token-sequence training-prep operators (textops/tokenops.py):
sequence packing (distributed prefix sum), vocab stats, hash sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=500, seed_mod=37):
    return spark.range(n).select(
        F.format_string("d%06d", F.col("id")).alias("doc_id"),
        ((F.col("id") * 7919) % seed_mod + 1).cast("int").alias("n_tok"),
    )


def test_pack_sequences_matches_sequential_and_is_partition_invariant(spark):
    """The two-phase distributed prefix sum must equal the sequential
    definition AND give identical bins at any parallelism — the property
    that makes it safe on a real cluster."""
    from orc_rs_spark.textops.tokenops import pack_sequences

    docs = _docs(spark)
    rows = sorted(
        (r.doc_id, r.n_tok) for r in docs.collect()
    )
    window = 64
    start = 0
    want = {}
    for d, n in rows:
        want[d] = (start // window, start % window)
        start += n
    for parts in (1, 3, 16):
        got = {
            r.doc_id: (r.bin_id, r.bin_offset)
            for r in pack_sequences(docs, window, partitions=parts).collect()
        }
        assert got == want, f"partitions={parts}"


def test_pack_sequences_bins_are_dense_and_ordered(spark):
    from orc_rs_spark.textops.tokenops import pack_sequences

    out = pack_sequences(_docs(spark, 200), window=50).collect()
    by_doc = sorted(out, key=lambda r: r.doc_id)
    bins = [r.bin_id for r in by_doc]
    assert bins == sorted(bins)  # doc order implies bin order
    assert set(bins) == set(range(max(bins) + 1))  # no empty bins
    for r in out:
        assert 0 <= r.bin_offset < 50


def test_token_vocab_stats_topk(spark):
    from orc_rs_spark.textops.tokenops import token_vocab_stats

    docs = spark.createDataFrame(
        [([1, 1, 1, 2, 2, 3],), ([1, 2, 4],)], "tokens array<int>"
    )
    out = token_vocab_stats(docs, top_k=3).collect()
    assert [(r.token, r.n) for r in out] == [(1, 4), (2, 3), (3, 1)]
    assert abs(out[0].share - 4 / 9) < 1e-12


def test_hash_sample_deterministic_and_disjoint(spark):
    from orc_rs_spark.textops.tokenops import hash_sample

    docs = _docs(spark, 2000)
    a1 = {r.doc_id for r in hash_sample(docs, 0.3, salt="train").collect()}
    a2 = {r.doc_id for r in hash_sample(docs, 0.3, salt="train").collect()}
    assert a1 == a2  # reproducible
    assert 0.2 < len(a1) / 2000 < 0.4  # near the rate
    b = {r.doc_id for r in hash_sample(docs, 0.3, salt="valid").collect()}
    # different salts give an independent (here: materially different) draw
    assert a1 != b
    assert len(hash_sample(docs, 0.0).collect()) == 0
    assert len(hash_sample(docs, 1.0).collect()) == 2000
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)
