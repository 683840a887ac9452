"""Structured Streaming encode: drain-and-stop, incremental files,
exactly-once on restart."""

import os

import pyarrow.parquet as pq
import pytest

from orc_rs_spark.decoder import decode_table, verify_roundtrip
from orc_rs_spark.fixtures import token_table
from orc_rs_spark.streaming import encode_stream


def _write_files(d, n_files, rows_per_file, seed0):
    import pyarrow as pa

    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        tbl = token_table(rows_per_file, seed=seed0 + i)
        ids = pa.array([f"f{seed0 + i}-{x}" for x in tbl.column("doc_id").to_pylist()])
        tbl = tbl.set_column(0, "doc_id", ids)
        pq.write_table(tbl, f"{d}/in-{seed0 + i}.parquet")


@pytest.mark.spark
def test_streaming_encode_available_now(spark, tmp_path):
    inp = str(tmp_path / "in")
    chunks_dir = str(tmp_path / "chunks")
    cp = str(tmp_path / "cp")
    _write_files(inp, 3, 400, seed0=100)

    q = encode_stream(spark, inp, chunks_dir, cp, available_now=True)
    q.awaitTermination(120)
    chunks = spark.read.parquet(chunks_dir)
    assert chunks.count() >= 1

    original = spark.read.parquet(inp)
    n, bad = verify_roundtrip(original, decode_table(chunks))
    assert n == 1200 and bad == 0

    # new files arrive -> resume drains only the delta
    _write_files(inp, 2, 300, seed0=500)
    q2 = encode_stream(spark, inp, chunks_dir, cp, available_now=True)
    q2.awaitTermination(120)
    chunks = spark.read.parquet(chunks_dir)
    original = spark.read.parquet(inp)
    n, bad = verify_roundtrip(original, decode_table(chunks))
    assert n == 1800 and bad == 0
    # no duplicate chunk ids across micro-batches
    assert chunks.select("chunk_id").distinct().count() == chunks.count()


@pytest.mark.spark
def test_streaming_stateful_dedup(spark, tmp_path):
    from orc_rs_spark.streaming import streaming_dedup

    inp = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp2")
    os.makedirs(inp)
    import pyarrow as pa

    pq.write_table(
        pa.table({"doc_id": ["a", "b", "c"], "text": ["xx", "yy", "xx"]}),
        f"{inp}/f1.parquet",
    )
    q = streaming_dedup(spark, inp, out, cp)
    q.awaitTermination(120)
    first = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert first == {"a", "b"}  # c is a dup of a within the batch

    # second batch: dup across micro-batches is dropped by state
    pq.write_table(
        pa.table({"doc_id": ["d", "e"], "text": ["yy", "zz"]}), f"{inp}/f2.parquet"
    )
    q2 = streaming_dedup(spark, inp, out, cp)
    q2.awaitTermination(120)
    rows = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert rows == {"a", "b", "e"}  # d's text was seen in batch 1


@pytest.mark.spark
def test_streaming_orc_sink(spark, tmp_path):
    """Micro-batches land as real ORC part files, readable by both Spark's
    native reader and our stripe-parallel source."""
    import glob

    from orc_rs_spark.orcfile.spark_source import read_orc
    from orc_rs_spark.streaming import encode_stream_orc

    inp, out, cp = str(tmp_path / "in"), str(tmp_path / "orc"), str(tmp_path / "cp")
    _write_files(inp, 2, 200, seed0=300)
    q = encode_stream_orc(spark, inp, out, cp)
    q.awaitTermination(120)
    files = glob.glob(f"{out}/batch=*/part-*.orc")
    assert files
    ours = read_orc(spark, sorted(files))
    assert ours.count() == 400
    native = spark.read.orc(sorted(files))
    assert native.count() == 400
