#!/usr/bin/env python
"""Regenerate PLANS.md: `.explain("formatted")` of the core pipelines with
inline commentary. Run: python jobs/gen_plans.py"""

from __future__ import annotations

import contextlib
import io
import shutil

from orc_rs_spark.session import get_spark
from orc_rs_spark.fixtures import token_table


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from orc_rs_spark.decoder import decode_table, search_token, verify_roundtrip  # noqa: F401
    from orc_rs_spark.encoder import encode_table

    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="gen_plans")
    spark.sparkContext.setLogLevel("ERROR")
    src = "/tmp/orc_rs_plans/tokens"
    shutil.rmtree(src, ignore_errors=True)
    tbl = token_table(5000, seed=42)
    import os

    os.makedirs(src, exist_ok=True)
    pq.write_table(tbl, f"{src}/part-00.parquet")
    df = spark.read.parquet(src)

    sections: list[tuple[str, str, str]] = []

    enc = encode_table(df, partitions=8)
    sections.append((
        "Encode (hash partition mode)",
        "One exchange (the explicit skew-defusing repartition), then the\n"
        "Arrow-batched encode — no other shuffles; AQE handles the rest.",
        plan_of(enc),
    ))

    enc_map = encode_table(df, repartition=False)
    sections.append((
        "Encode (map-side, zero shuffle)",
        "Scan -> MapInArrow -> sink. The production layout when input\n"
        "splits are already uniform: nothing moves between executors.",
        plan_of(enc_map),
    ))

    chunks_dir = "/tmp/orc_rs_plans/chunks"
    shutil.rmtree(chunks_dir, ignore_errors=True)
    enc.write.parquet(chunks_dir)
    chunks = spark.read.parquet(chunks_dir)

    dec_proj = decode_table(chunks, columns=("doc_id", "n_tok"))
    sections.append((
        "Projected decode (doc_id + n_tok only)",
        "Stream-level projection: ReadSchema excludes s_tokens/s_source —\n"
        "token bytes are never read off disk for a metadata projection.",
        plan_of(dec_proj),
    ))

    probe = search_token(spark.read.parquet(chunks_dir), 4242)
    sections.append((
        "Pruned token search",
        "min_val/max_val predicates are parquet-pushed (PushedFilters) so\n"
        "non-matching chunks are skipped at the I/O level before the Bloom\n"
        "probe and decode stages see them.",
        plan_of(probe),
    ))

    dec_full = decode_table(chunks)
    joined = df.alias("o").join(dec_full.alias("d"), "doc_id", "full_outer")
    sections.append((
        "Verify join (original vs decoded)",
        "Sort-merge on uniformly distributed doc_id; reduces to counters,\n"
        "never collects rows.",
        plan_of(joined),
    ))

    from orc_rs_spark.textops.dedup import minhash_lsh_pairs, simhash_pairs

    docs = spark.createDataFrame(
        [(i, f"word{i} common text {i % 7}") for i in range(100)], "doc_id bigint, text string"
    )
    sections.append((
        "MinHash-LSH near-dup pairs",
        "Shuffles are (doc, band) rows — linear in corpus size; the\n"
        "candidate join is per-band equi-join, then exact verification\n"
        "touches candidates only.",
        plan_of(minhash_lsh_pairs(docs)),
    ))
    sections.append((
        "SimHash pigeonhole pairs",
        "k+1 band rows per doc; equi-join on (band, value); JVM bit_count\n"
        "verification. Recall is exactly 1 by pigeonhole.",
        plan_of(simhash_pairs(docs)),
    ))

    out = [
        "# PLANS — physical plans of the core pipelines (`.explain(\"formatted\")`)\n",
        "Generated against local[8] by `jobs/gen_plans.py`; commentary inline.\n",
    ]
    for title, comment, plan in sections:
        out.append(f"## {title}\n")
        out.append(comment + "\n")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written:", len(sections), "sections")
    spark.stop()


if __name__ == "__main__":
    main()
