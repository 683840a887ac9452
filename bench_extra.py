#!/usr/bin/env python
"""Round-7 isolation bench (guide §1.4): decomposes the frozen bench.py
queries into scan / Python-boundary / kernel / sink components with noop
sinks, so optimization targets the component that actually costs time.

NOT part of the driver contract — bench.py stays the timed artifact.
Prints one JSON line with component timings; also dumps
``.explain("formatted")`` for the q1b/q2/q3 plans into plans/r07/.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
           python bench_extra.py [--plans]
       SPARK_GRAFT_CPUS=32 python bench_extra.py --sf1
           (round-7 VERDICT item 2: the ORC wire write/read legs at 1M rows
           / ~230M values — 10x the frozen bench's sf0.1 — so per-file
           planning and footer overheads are measured at a scale where
           stripes-per-file > 1; min-of-2 per leg, one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_sf1() -> None:
    """ORC wire write/read at 1,000,000 rows (~230M token values): the
    sf0.1 bench never exercises files this large; an extra 8-partition leg
    writes multi-stripe files (2 stripes each) for the stripe-parallel read.
    Uses the same fixture generator at 10x rows; caches the parquet input
    under /tmp like bench.py does for its scale."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rows = 1_000_000
    cache_dir = f"/tmp/orc_rs_bench/tokens_sf1_r{rows}"

    from pyspark.sql import functions as F

    from orc_rs_spark.session import get_spark
    from orc_rs_spark.fixtures import token_table
    from orc_rs_spark.orcfile.spark_source import read_orc, write_orc_dir

    spark = get_spark(master=f"local[{cpus}]", app_name="orc_rs_bench_sf1")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(cache_dir):
        import pyarrow.parquet as pq

        tbl = token_table(rows, seed=42)
        os.makedirs(cache_dir, exist_ok=True)
        nf = 32
        for i in range(nf):
            lo = i * rows // nf
            hi = (i + 1) * rows // nf
            pq.write_table(tbl.slice(lo, hi - lo), f"{cache_dir}/part-{i:02d}.parquet")
        del tbl

    df = spark.read.parquet(cache_dir)
    n_values = int(df.agg(F.sum("n_tok")).collect()[0][0])
    nparts = int(cpus) if cpus.isdigit() else 32
    work_dir = "/tmp/orc_rs_bench/sf1_wire"

    q6 = float("inf")
    for _ in range(2):
        shutil.rmtree(work_dir, ignore_errors=True)
        t0 = time.time()
        write_orc_dir(df.repartition(nparts), work_dir)
        q6 = min(q6, time.time() - t0)
    wire_bytes = sum(
        os.path.getsize(os.path.join(work_dir, f)) for f in os.listdir(work_dir)
    )
    q7 = float("inf")
    for _ in range(2):
        t0 = time.time()
        got = int(read_orc(spark, work_dir).agg(F.sum("n_tok")).collect()[0][0])
        q7 = min(q7, time.time() - t0)
        assert got == n_values, "sf1 wire round-trip lost values"

    # multi-stripe leg: 8 fat part files of ~125k rows = 2 stripes each
    # (stripe_rows 65536), so the stripe-parallel read fans 16 work units
    # over 8 files — the shape a compacted 100 TB directory presents
    ms_dir = "/tmp/orc_rs_bench/sf1_wire_8p"
    q6_8 = float("inf")
    for _ in range(2):
        shutil.rmtree(ms_dir, ignore_errors=True)
        t0 = time.time()
        write_orc_dir(df.repartition(8), ms_dir)
        q6_8 = min(q6_8, time.time() - t0)
    q7_8 = float("inf")
    for _ in range(2):
        t0 = time.time()
        got = int(read_orc(spark, ms_dir).agg(F.sum("n_tok")).collect()[0][0])
        q7_8 = min(q7_8, time.time() - t0)
        assert got == n_values, "sf1 multi-stripe round-trip lost values"

    result = {
        "metric": "bench_sf1_wire",
        "rows": rows,
        "n_values": n_values,
        "cpus": cpus,
        "q6_orc_wire_write_sec": round(q6, 3),
        "q7_orc_wire_read_sec": round(q7, 3),
        "orc_wire_bytes": wire_bytes,
        "orc_wire_write_tokens_per_sec": round(n_values / q6),
        "orc_wire_read_tokens_per_sec": round(n_values / q7),
        "q6_8part_write_sec": round(q6_8, 3),
        "q7_8part_multistripe_read_sec": round(q7_8, 3),
        "runs_per_leg": 2,
    }
    spark.stop()
    print(json.dumps(result))


def main() -> None:
    if "--sf1" in sys.argv:
        return run_sf1()
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
