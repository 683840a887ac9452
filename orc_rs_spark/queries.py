"""Driver-contract queries: each pairs a Spark computation with an ANSI-SQL
oracle DuckDB can run on the same parquet tables (driver compares row count,
schema, and order-insensitive value hash at sf=0.01).

The codec queries express the engine's core invariant — decode(encode(x))
== x (BASELINE.json:15 "token-array equality") — as identity queries: the
Spark side round-trips real columns through a codec, the oracle simply
selects the original column. A hash match therefore *is* the bit-identity
proof, per codec.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orc_rs_spark.decoder import decode_table
from orc_rs_spark.encoder import encode_table
from orc_rs_spark.kernels.select import INT_CODECS, STR_CODECS

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _pq(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def roundtrip_int_column(df: DataFrame, col: str, codec: str) -> DataFrame:
    """Round-trip one int64 column through a named codec inside mapInArrow."""
    enc_fn, dec_fn = INT_CODECS[codec]

    def rt(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows == 0:
                continue
            v = b.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            dec = dec_fn(enc_fn(v), len(v))
            yield pa.RecordBatch.from_arrays([pa.array(dec)], names=[col])

    return df.select(col).mapInArrow(rt, f"{col} bigint")


def roundtrip_str_column(df: DataFrame, col: str, codec: str) -> DataFrame:
    enc_fn, dec_fn = STR_CODECS[codec]

    def rt(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows == 0:
                continue
            arr = b.column(0)
            dec = dec_fn(enc_fn(arr), len(arr))
            yield pa.RecordBatch.from_arrays([dec], names=[col])

    return df.select(col).mapInArrow(rt, f"{col} string")


# ------------------------------------------------------------------ token
# table derived identically in Spark and DuckDB: one "document" per events
# user, tokens = sorted event ids (int32)

TOKEN_TABLE_SQL = """
SELECT CAST(user_id AS VARCHAR) AS doc_id,
       list_sort(list(CAST(event_id AS INTEGER))) AS tokens,
       CAST(COUNT(*) AS INTEGER) AS n_tok,
       MIN(event_type) AS source
FROM events
GROUP BY user_id
"""


def token_table_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _pq(spark, sf_dir, "events")
    return ev.groupBy(F.col("user_id").cast("string").alias("doc_id")).agg(
        F.sort_array(F.collect_list(F.col("event_id").cast("int"))).alias("tokens"),
        F.count(F.lit(1)).cast("int").alias("n_tok"),
        F.min("event_type").alias("source"),
    )


@register(
    "rt_engine_tokens",
    "SELECT doc_id, tokens, n_tok, source FROM (" + TOKEN_TABLE_SQL + ") t",
)
def rt_engine_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine round-trip: encode -> chunk table -> decode."""
    df = token_table_from_events(spark, sf_dir)
    chunks = encode_table(df, partitions=4)
    return decode_table(chunks)


@register(
    "chunk_stats_tokens",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_tok) AS BIGINT) AS n_values,
           CAST(MIN(list_aggregate(tokens, 'min')) AS BIGINT) AS min_val,
           CAST(MAX(list_aggregate(tokens, 'max')) AS BIGINT) AS max_val
    FROM ("""
    + TOKEN_TABLE_SQL
    + """) tt
    """,
)
def chunk_stats_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk metadata must agree with the data it encodes (M7 stats parity)."""
    df = token_table_from_events(spark, sf_dir)
    chunks = encode_table(df, partitions=4)
    return chunks.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_values").alias("n_values"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    )


# ---------------------------------------------------------- per-codec ints

_INT_CODEC_QUERIES = [
    # (name, table, column, codec) — column profiles chosen per codec sweet spot
    ("rt_rlev2_delta", "orders", "o_orderkey", "rlev2"),  # near-monotone ids
    ("rt_rlev2_direct", "lineitem", "l_partkey", "rlev2"),  # uniform ints
    ("rt_rlev2_runs", "lineitem", "l_linenumber", "rlev2_rle"),  # tiny domain runs
    ("rt_rlev1", "orders", "o_custkey", "rlev1"),
    ("rt_for", "part", "p_partkey", "for"),
    ("rt_bitpack", "customer", "c_custkey", "bitpack"),
    ("rt_dict", "supplier", "s_nationkey", "dict"),
    ("rt_raw", "events", "user_id", "raw"),
]

for _name, _table, _col, _codec in _INT_CODEC_QUERIES:

    def _mk(table: str, col: str, codec: str):
        def q(spark: SparkSession, sf_dir: str) -> DataFrame:
            return roundtrip_int_column(_pq(spark, sf_dir, table), col, codec)

        return q

    register(_name, f"SELECT CAST({_col} AS BIGINT) AS {_col} FROM {_table}")(
        _mk(_table, _col, _codec)
    )


# ---------------------------------------------------------- string codecs

_STR_CODEC_QUERIES = [
    ("rt_str_direct", "documents", "text", "str_direct"),
    ("rt_str_fsst", "documents", "text", "str_direct_fsst"),
    ("rt_str_dict", "documents", "source", "str_dict"),
    ("rt_str_dict_fsst", "documents", "lang", "str_dict_fsst"),
]

for _name, _table, _col, _codec in _STR_CODEC_QUERIES:

    def _mks(table: str, col: str, codec: str):
        def q(spark: SparkSession, sf_dir: str) -> DataFrame:
            return roundtrip_str_column(_pq(spark, sf_dir, table), col, codec)

        return q

    register(_name, f"SELECT {_col} FROM {_table}")(_mks(_table, _col, _codec))
