"""Checkpointed encode job: explicit partitioning, lineage, partition-exact
resume (north_rule: "resumable from checkpoint with per-partition lineage +
metrics").

Partitioning model
------------------
Every row gets an explicit deterministic bucket: ``part_key =
xxhash64(doc_id) mod n_buckets``. Hashing doc_id is the salt that defuses
``source`` skew (web ~55% of rows would melt a source-keyed partitioning);
``repartitionByRange`` on the dense bucket ids then gives one bucket per
task. Buckets — not Spark's internal partition ids — are the resume unit,
so a rerun assigns identical rows to identical buckets regardless of
cluster size (N vs 4N executors), and the bucket id is persisted as the
chunk's ``part_id``.

Waves
-----
Buckets are processed in waves of ``wave_size``; each wave is one Spark
write job (parquet commit is atomic per job) followed by a checkpoint
append. A killed run resumes at the first un-checkpointed wave; completed
buckets are never re-encoded. Chunk files are written partitioned by
``part_id`` so lineage aggregation partition-prunes to just the wave.

At 100 TB: n_buckets scales to ~4x cluster cores; wave_size bounds the
blast radius of a failure; the checkpoint table stays tiny (one row per
bucket) and is read once per resume.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orc_rs_spark.encoder import encode_table

CHECKPOINT_DDL = (
    "part_id int, status string, n_chunks int, chunk_ids array<string>, n_rows bigint, "
    "orig_bytes bigint, enc_bytes bigint, wall_ms bigint, attempt int, scheme_version int"
)

# Bump when the row->bucket mapping changes. v1 was abs(xxhash64)%n; v2 is
# pmod(xxhash64, n) — about half of all rows land in different buckets, so
# resuming a v1 checkpoint under v2 would silently skip rows that now map
# into already-"done" buckets. Resume refuses across versions instead.
PARTITION_SCHEME_VERSION = 2


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    # pmod, not abs(..)%n: abs(Long.MIN_VALUE) stays negative, which would
    # put ~2^-64 of rows in a bucket no wave ever selects (silent data loss)
    return df.withColumn(
        "part_key", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )


def done_buckets(spark: SparkSession, checkpoint_dir: str) -> set[int]:
    try:
        cp = spark.read.parquet(checkpoint_dir)
    except Exception:
        return set()
    if "scheme_version" not in cp.columns:
        versions = {1}  # pre-versioning checkpoints used the v1 bucket map
    else:
        versions = {
            r["scheme_version"]
            for r in cp.select("scheme_version").distinct().collect()
        }
    if versions - {PARTITION_SCHEME_VERSION}:
        raise ValueError(
            f"checkpoint at {checkpoint_dir} was written with partition "
            f"scheme version(s) {sorted(versions)}, this build uses "
            f"{PARTITION_SCHEME_VERSION}; resuming would silently skip rows "
            "that now map into already-done buckets — start a fresh "
            "checkpoint dir (or re-encode from scratch)"
        )
    rows = cp.filter(F.col("status") == "done").select("part_id").distinct().collect()
    return {r["part_id"] for r in rows}


def encode_job(
    spark: SparkSession,
    df: DataFrame,
    chunks_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 32,
    wave_size: int = 16,
    block_codec: str = "zlib",
    fail_after_waves: int | None = None,
    fail_between_write_and_checkpoint: bool = False,
) -> dict:
    """Run (or resume) the checkpointed encode. Returns summary metrics.

    ``fail_after_waves`` / ``fail_between_write_and_checkpoint`` inject
    mid-job crashes (resume tests).

    Idempotency: chunk files are written with DYNAMIC partition overwrite,
    so a wave that crashed after writing chunks but before its checkpoint
    append simply rewrites the same bucket directories on retry — no
    duplicate chunks, no manual cleanup.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df = with_bucket(df, n_buckets)
    done = done_buckets(spark, checkpoint_dir)
    pending = sorted(set(range(n_buckets)) - done)
    totals = {"rows": 0, "orig_bytes": 0, "enc_bytes": 0, "chunks": 0}
    waves = 0
    for i in range(0, len(pending), wave_size):
        if fail_after_waves is not None and waves >= fail_after_waves:
            raise RuntimeError("injected failure for resume test")
        wave = pending[i : i + wave_size]
        t0 = time.time()
        sub = df.filter(F.col("part_key").isin([int(b) for b in wave]))
        sub = sub.repartitionByRange(len(wave), "part_key").sortWithinPartitions(
            "part_key", "source", "doc_id"
        )
        chunks = encode_table(sub, repartition=False, block_codec=block_codec)
        chunks.write.partitionBy("part_id").mode("overwrite").parquet(chunks_dir)
        if fail_between_write_and_checkpoint and waves == 0:
            raise RuntimeError("injected failure between chunk write and checkpoint")
        wall_ms = int((time.time() - t0) * 1000)
        stats = (
            spark.read.parquet(chunks_dir)
            .filter(F.col("part_id").isin([int(b) for b in wave]))
            .groupBy("part_id")
            .agg(
                F.count(F.lit(1)).alias("n_chunks"),
                F.collect_list("chunk_id").alias("chunk_ids"),
                F.sum("n_rows").alias("n_rows"),
                F.sum("orig_bytes").alias("orig_bytes"),
                F.sum("enc_bytes").alias("enc_bytes"),
            )
            .collect()
        )
        by_bucket = {int(s["part_id"]): s for s in stats}
        lineage = []
        for b in wave:
            s = by_bucket.get(int(b))
            lineage.append(
                (
                    int(b),
                    "done",
                    int(s["n_chunks"]) if s else 0,
                    list(s["chunk_ids"]) if s else [],
                    int(s["n_rows"]) if s else 0,
                    int(s["orig_bytes"]) if s else 0,
                    int(s["enc_bytes"]) if s else 0,
                    wall_ms,
                    1,
                    PARTITION_SCHEME_VERSION,
                )
            )
            if s:
                totals["rows"] += int(s["n_rows"])
                totals["orig_bytes"] += int(s["orig_bytes"])
                totals["enc_bytes"] += int(s["enc_bytes"])
                totals["chunks"] += int(s["n_chunks"])
        spark.createDataFrame(lineage, CHECKPOINT_DDL).withColumn(
            "ts", F.current_timestamp()
        ).write.mode("append").parquet(checkpoint_dir)
        waves += 1
    return {
        "buckets_total": n_buckets,
        "buckets_skipped": len(done),
        "buckets_encoded": len(pending),
        "waves": waves,
        **totals,
    }
