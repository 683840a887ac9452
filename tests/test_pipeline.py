"""Checkpointed encode job: lineage, crash resume, partition-exactness."""

import pytest
from pyspark.sql import functions as F

from orc_rs_spark.decoder import decode_table, verify_roundtrip
from orc_rs_spark.fixtures import token_df
from orc_rs_spark.pipeline import done_buckets, encode_job


@pytest.mark.spark
def test_encode_job_with_crash_resume(spark, tmp_path):
    chunks_dir = str(tmp_path / "chunks")
    cp_dir = str(tmp_path / "checkpoint")
    df = token_df(spark, 2000, seed=42, partitions=4).cache()
    df.count()

    # crash after the first wave
    with pytest.raises(RuntimeError, match="injected failure"):
        encode_job(spark, df, chunks_dir, cp_dir, n_buckets=8, wave_size=4, fail_after_waves=1)

    done_first = done_buckets(spark, cp_dir)
    assert len(done_first) == 4  # exactly one wave checkpointed

    # resume: must encode only the remaining buckets
    summary = encode_job(spark, df, chunks_dir, cp_dir, n_buckets=8, wave_size=4)
    assert summary["buckets_skipped"] == 4
    assert summary["buckets_encoded"] == 4

    # every bucket done, no duplicates, full bit-identity
    assert done_buckets(spark, cp_dir) == set(range(8))
    chunks = spark.read.parquet(chunks_dir)
    assert chunks.select("chunk_id").distinct().count() == chunks.count()
    decoded = decode_table(chunks)
    n, bad = verify_roundtrip(df, decoded, exact=True)
    assert n == 2000 and bad == 0

    # lineage has per-bucket metrics
    cp = spark.read.parquet(cp_dir)
    row = cp.filter(F.col("n_rows") > 0).first()
    assert row["enc_bytes"] > 0 and row["wall_ms"] >= 0 and len(row["chunk_ids"]) >= 1
    df.unpersist()


@pytest.mark.spark
def test_encode_job_idempotent_rerun(spark, tmp_path):
    chunks_dir = str(tmp_path / "chunks")
    cp_dir = str(tmp_path / "checkpoint")
    df = token_df(spark, 500, seed=1, partitions=2)
    s1 = encode_job(spark, df, chunks_dir, cp_dir, n_buckets=4, wave_size=4)
    assert s1["buckets_encoded"] == 4
    n_chunks = spark.read.parquet(chunks_dir).count()
    # rerun: everything checkpointed -> no new work, no new chunks
    s2 = encode_job(spark, df, chunks_dir, cp_dir, n_buckets=4, wave_size=4)
    assert s2["buckets_encoded"] == 0 and s2["waves"] == 0
    assert spark.read.parquet(chunks_dir).count() == n_chunks


@pytest.mark.spark
def test_crash_between_write_and_checkpoint_no_duplicates(spark, tmp_path):
    """A wave that wrote chunks but died before checkpointing must not
    leave duplicates after the retry (dynamic partition overwrite)."""
    chunks_dir = str(tmp_path / "chunks")
    cp_dir = str(tmp_path / "checkpoint")
    df = token_df(spark, 800, seed=9, partitions=2).cache()
    df.count()
    with pytest.raises(RuntimeError, match="between chunk write"):
        encode_job(
            spark, df, chunks_dir, cp_dir, n_buckets=4, wave_size=2,
            fail_between_write_and_checkpoint=True,
        )
    # orphan chunks exist for wave 0, checkpoint empty
    assert done_buckets(spark, cp_dir) == set()
    orphans = spark.read.parquet(chunks_dir).count()
    assert orphans > 0
    # retry from scratch: buckets rewritten in place, no dupes
    encode_job(spark, df, chunks_dir, cp_dir, n_buckets=4, wave_size=2)
    chunks = spark.read.parquet(chunks_dir)
    assert chunks.select("chunk_id").distinct().count() == chunks.count()
    n, bad = verify_roundtrip(df, decode_table(chunks))
    assert n == 800 and bad == 0
    df.unpersist()


@pytest.mark.spark
def test_encode_table_rejects_wrong_shape(spark):
    from orc_rs_spark.encoder import encode_table

    df = spark.createDataFrame([(1, "x")], "a bigint, b string")
    with pytest.raises(ValueError, match="missing column"):
        encode_table(df)


@pytest.mark.spark
def test_resume_refuses_old_partition_scheme(spark, tmp_path):
    """A checkpoint written under a different bucket-map version must not
    resume (half the rows would map into already-'done' buckets)."""
    from orc_rs_spark.pipeline import CHECKPOINT_DDL

    cp_dir = str(tmp_path / "cp_v1")
    # simulate a v1-era checkpoint row
    spark.createDataFrame(
        [(0, "done", 1, ["c0"], 10, 100, 50, 5, 1, 1)], CHECKPOINT_DDL
    ).write.parquet(cp_dir)
    with pytest.raises(ValueError, match="scheme version"):
        done_buckets(spark, cp_dir)

    # pre-versioning checkpoints (no scheme_version column) refuse too
    cp_dir2 = str(tmp_path / "cp_legacy")
    spark.createDataFrame(
        [(0, "done")], "part_id int, status string"
    ).write.parquet(cp_dir2)
    with pytest.raises(ValueError, match="scheme version"):
        done_buckets(spark, cp_dir2)


def test_decimal256_rejected():
    import pyarrow as pa

    from orc_rs_spark.generic import _encode_column
    from orc_rs_spark.orcfile.writer import _arrow_to_orc_kind

    arr = pa.array([1, 2], type=pa.decimal256(50, 2))
    with pytest.raises(TypeError, match="decimal128"):
        _encode_column(arr)
    with pytest.raises(TypeError, match="decimal128"):
        _arrow_to_orc_kind(pa.decimal256(50, 2))
