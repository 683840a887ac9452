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


def test_weighted_repartition_balances_token_skew(spark):
    """Pathological length skew (1% of docs carry ~x300 tokens): plain
    row-based range partitioning leaves some partitions token-heavy;
    weighted_repartition balances the TOKEN totals to within ~2x of the
    mean while preserving every row exactly once."""
    from orc_rs_spark.textops.tokenops import weighted_repartition

    n, parts = 2000, 8
    docs = spark.range(n).select(
        F.format_string("d%06d", F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 100 == 0, 3000).otherwise(10).cast("int").alias("n_tok"),
    )
    total = docs.agg(F.sum("n_tok")).first()[0]

    def partition_token_sums(df):
        return [
            r.t for r in df.withColumn("_p", F.spark_partition_id())
            .groupBy("_p").agg(F.sum("n_tok").alias("t")).collect()
        ]

    balanced_df = weighted_repartition(docs, parts)
    balanced = partition_token_sums(balanced_df)
    mean = total / parts
    # row-balanced ranges CAN be token-balanced by luck with periodic skew,
    # but the weighted variant must be balanced by CONSTRUCTION
    assert max(balanced) <= 2.0 * mean, (balanced, mean)
    assert min(balanced) >= 0.3 * mean, (balanced, mean)
    assert len(balanced) <= parts
    # no row lost or duplicated, content intact
    assert balanced_df.count() == n
    assert balanced_df.agg(F.sum("n_tok")).first()[0] == total
    assert balanced_df.select("doc_id").distinct().count() == n


def test_weighted_repartition_extreme_single_giant(spark):
    """One document holding ~99% of all tokens: it gets a partition to
    itself (whole docs never split), and the rest still spread."""
    from orc_rs_spark.textops.tokenops import weighted_repartition

    docs = spark.range(100).select(
        F.format_string("d%03d", F.col("id")).alias("doc_id"),
        F.when(F.col("id") == 50, 1_000_000).otherwise(100).cast("int").alias("n_tok"),
    )
    out = weighted_repartition(docs, 4)
    sums = [
        r.t for r in out.withColumn("_p", F.spark_partition_id())
        .groupBy("_p").agg(F.sum("n_tok").alias("t"),
                           F.count(F.lit(1)).alias("c")).collect()
    ]
    assert out.count() == 100
    assert max(sums) >= 1_000_000  # the giant lands somewhere whole


def test_encode_table_weighted_mode_roundtrips(spark):
    """encode_table(partition_mode="weighted") keeps bit-identical
    round-trip through the chunk pipeline on a length-skewed corpus."""
    from orc_rs_spark.decoder import decode_table
    from orc_rs_spark.encoder import encode_table
    from orc_rs_spark.fixtures import token_df

    df = token_df(spark, 3000, seed=7)
    chunks = encode_table(df, partitions=8, partition_mode="weighted")
    back = decode_table(chunks)
    want = df.agg(F.sum("n_tok"), F.count(F.lit(1))).first()
    got = back.agg(F.sum("n_tok"), F.count(F.lit(1))).first()
    assert (got[0], got[1]) == (want[0], want[1])
    joined = (
        df.select("doc_id", F.col("tokens").alias("a"))
        .join(back.select("doc_id", F.col("tokens").alias("b")), "doc_id")
        .where(F.col("a") != F.col("b"))
    )
    assert joined.count() == 0


def test_hash_sample_bound_is_exact(spark):
    """The keep-threshold is floor(rate * 2^60) over the rate float's
    EXACT binary value. (Multiplying by the power of two 2^60 is itself
    exact in IEEE-754, so ``rate * float(1 << 60)`` would give the same
    bound; the Fraction form just states the intent.) Pure-Python md5
    arithmetic with the Fraction bound must reproduce the kept set
    bit-for-bit — including at the non-dyadic rate 0.1."""
    import hashlib
    from fractions import Fraction

    from orc_rs_spark.textops.tokenops import hash_sample

    docs = _docs(spark, 1500)
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    for rate in (0.1, 0.25, 1 / 1024):
        got = {r.doc_id for r in hash_sample(docs, rate, salt="s").collect()}
        bound = int(Fraction(rate) * (1 << 60))
        want = {
            d for d in ids
            if int(hashlib.md5(("s" + d).encode()).hexdigest()[:15], 16) < bound
        }
        assert got == want, f"rate={rate}"
