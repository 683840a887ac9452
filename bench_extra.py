#!/usr/bin/env python
"""Round-7 isolation bench (guide §1.4): decomposes the frozen bench.py
queries into scan / Python-boundary / kernel / sink components with noop
sinks, so optimization targets the component that actually costs time.

NOT part of the driver contract — bench.py stays the timed artifact.
Prints one JSON line with component timings; also dumps
``.explain("formatted")`` for the q1b/q2/q3 plans into plans/r07/.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
           python bench_extra.py [--plans]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    rows = {"0.001": 1_000, "0.01": 10_000, "0.1": 100_000}.get(sf, 20_000)
    dump_plans = "--plans" in sys.argv

    from pyspark.sql import functions as F

    from orc_rs_spark.session import get_spark
    from orc_rs_spark.fixtures import token_table
    from orc_rs_spark.encoder import encode_table
    from orc_rs_spark.decoder import decode_table, verify_roundtrip

    cache_dir = f"/tmp/orc_rs_bench/tokens_sf{sf}_r{rows}"
    work_dir = f"/tmp/orc_rs_bench/extra_sf{sf}"
    shutil.rmtree(work_dir, ignore_errors=True)

    spark = get_spark(master=f"local[{cpus}]", app_name="orc_rs_bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    if not os.path.exists(cache_dir):
        import pyarrow.parquet as pq

        tbl = token_table(rows, seed=42)
        os.makedirs(cache_dir, exist_ok=True)
        nf = 16
        n = tbl.num_rows
        for i in range(nf):
            lo = i * n // nf
            hi = (i + 1) * n // nf
            pq.write_table(tbl.slice(lo, hi - lo), f"{cache_dir}/part-{i:02d}.parquet")

    df = spark.read.parquet(cache_dir)
    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        sc.setJobDescription(name)
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)

    # warm exactly like bench.py
    encode_table(df.limit(2000), repartition=False).count()

    # ---- component controls -------------------------------------------
    # scan-only: JVM parquet scan, no Python anywhere
    timed("c0_scan_noop", lambda: noop(df))

    # boundary-only: scan -> JVM->Py->JVM identity mapInArrow -> noop.
    # Prices the Arrow boundary for the WHOLE token table without kernels.
    def _identity(batches):
        yield from batches

    ident = df.mapInArrow(_identity, df.schema.simpleString()[7:-1]
                          .replace(":", " ").replace(",", ", "))
    timed("c1_boundary_noop", lambda: noop(ident))

    # q1b compute only: mapside encode -> noop (no parquet sink)
    timed("c2_encode_mapside_noop", lambda: noop(encode_table(df, repartition=False)))

    # q1 compute only: hash-shuffle encode -> noop
    timed(
        "c3_encode_hash_noop",
        lambda: noop(
            encode_table(df, partitions=int(cpus) if cpus.isdigit() else 32,
                         partition_mode="hash")
        ),
    )

    # the parquet sink alone = q1b(bench) - c2; also time it directly
    timed(
        "c4_encode_mapside_parquet",
        lambda: encode_table(df, repartition=False)
        .write.mode("overwrite")
        .parquet(f"{work_dir}/chunks_mapside"),
    )

    chunks = spark.read.parquet(f"{work_dir}/chunks_mapside")

    # q2: decode -> JVM agg (bench shape), then decode -> noop (all cols)
    timed("c5_decode_agg", lambda: decode_table(chunks).agg(F.sum("n_tok")).collect())
    timed("c6_decode_noop", lambda: noop(decode_table(chunks)))

    # q3: verify join (bench shape)
    timed("c7_verify", lambda: verify_roundtrip(df, decode_table(chunks)))

    # ---- wire paths ----------------------------------------------------
    from orc_rs_spark.orcfile.spark_source import read_orc, write_orc_dir

    nparts = int(cpus) if cpus.isdigit() else 32
    orc_dir = f"{work_dir}/orc_wire"
    timed("c8_wire_write", lambda: write_orc_dir(df.repartition(nparts), orc_dir))

    # the repartition alone (shuffle of the raw rows, no ORC writer)
    timed("c9_repartition_noop", lambda: noop(df.repartition(nparts)))

    timed("c10_wire_read_agg",
          lambda: read_orc(spark, orc_dir).agg(F.sum("n_tok")).collect())
    # projected read: only the summed column crosses the boundary
    timed("c11_wire_read_proj_agg",
          lambda: read_orc(spark, orc_dir, columns=["n_tok"])
          .agg(F.sum("n_tok")).collect())

    if dump_plans:
        os.makedirs("plans/r07", exist_ok=True)
        plans = {
            "q1b_encode_mapside": encode_table(df, repartition=False),
            "q1_encode_hash": encode_table(df, partitions=nparts, partition_mode="hash"),
            "q2_decode": decode_table(chunks),
            "q7_wire_read": read_orc(spark, orc_dir),
        }
        for name, pdf in plans.items():
            with open(f"plans/r07/{name}_current.txt", "w") as f:
                f.write(pdf._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))

    result = {
        "metric": "bench_extra_components",
        "sf": sf,
        "cpus": cpus,
        "timings": timings,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
