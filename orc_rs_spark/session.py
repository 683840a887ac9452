"""SparkSession factory tuned for the encode/decode pipeline."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# glibc malloc tuning for the NumPy kernels: without it every >128KB temp is
# a fresh mmap and the kernel's page-zeroing serializes all executor python
# workers (measured: 32-proc encode ran SLOWER than 8-proc; with this it
# scales 4.4x from 8->32). Large allocations stay on the freelist instead.
_MALLOC_TUNING = {
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
}


def get_spark(
    master: str | None = None,
    app_name: str = "orc_rs_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus if cpus.isdigit() else 32)
    os.environ.update(_MALLOC_TUNING)  # driver-side kernels (tests, local ops)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Arrow everywhere: mapInArrow/pandas UDFs move whole columnar batches
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # batch size == chunk size: one Arrow batch becomes one encoded chunk.
        # 4096 rows (~1M tokens) keeps each worker's temp working set small
        # enough that 32 concurrent workers don't thrash the shared L3
        # (measured: 16384-row chunks ran 2.7x slower at local[32])
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # token tables are wide rows (KBs each): smaller splits keep every
        # core busy during the scan/shuffle-write stage
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if os.path.isdir("/dev/shm"):
        # shuffle spill on tmpfs: this box has no fast local disk; a real
        # cluster node would put spark.local.dir on NVMe
        b = b.config("spark.local.dir", "/dev/shm/spark_local")
    for k, v in _MALLOC_TUNING.items():
        b = b.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def iceberg_conf(catalog: str = "ice", warehouse: str = "/tmp/iceberg_warehouse") -> dict:
    """Spark confs wiring an Iceberg catalog (north-star input is an Iceberg
    table of pre-tokenized sequences).

    This sandbox has no network and no Iceberg runtime jar, so these confs
    are exercised only when the jar is present (cluster deployments add
    ``--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>``
    to spark-submit); everything else in the engine reads/writes through
    the DataFrame API and is source-format agnostic.
    """
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }
