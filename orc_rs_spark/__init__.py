"""orc_rs_spark — a PySpark-native per-column lightweight-compression engine.

Re-creates the ORC encoding suite of the reference (Lagrang/orc-rs, a Rust
decode-only ORC reader) from scratch, Spark-first:

- NumPy-vectorized codec kernels (``orc_rs_spark.kernels``): zigzag, varint,
  bit-packing, RLEv2 (short-repeat / direct / patched-base / delta), byte RLE,
  boolean RLE, frame-of-reference, sorted-dictionary, FSST, raw, plus ORC-style
  zlib block framing.
- A distributed encode pass (``orc_rs_spark.encoder``) that turns a DataFrame
  of ``(doc_id string, tokens array<int32>, n_tok int32, source string)`` into
  stripe-like encoded chunk rows via ``mapInPandas`` (Arrow batches, no
  per-row Python), with per-chunk codec auto-selection
  (``orc_rs_spark.kernels.select``).
- A distributed decode pass (``orc_rs_spark.decoder``) reconstructing the
  original rows bit-identically.
- Checkpoint/lineage bookkeeping for partition-exact resume
  (``orc_rs_spark.pipeline``).

Wire formats follow the public Apache ORC v1 specification; the reference's
decoder doc-comments (e.g. /root/reference/src/encoding/rlev2.rs:12-58) were
used to confirm behavior, never copied.
"""

__version__ = "0.3.0"


def __getattr__(name):  # lazy: importing the package must not start Spark
    _API = {
        "encode_table": ("orc_rs_spark.encoder", "encode_table"),
        "decode_table": ("orc_rs_spark.decoder", "decode_table"),
        "verify_roundtrip": ("orc_rs_spark.decoder", "verify_roundtrip"),
        "search_token": ("orc_rs_spark.decoder", "search_token"),
        "encode_job": ("orc_rs_spark.pipeline", "encode_job"),
        "encode_generic_table": ("orc_rs_spark.generic", "encode_generic_table"),
        "decode_generic_table": ("orc_rs_spark.generic", "decode_generic_table"),
        "read_orc": ("orc_rs_spark.orcfile.spark_source", "read_orc"),
        "write_orc_dir": ("orc_rs_spark.orcfile.spark_source", "write_orc_dir"),
        "write_orc": ("orc_rs_spark.orcfile.writer", "write_orc"),
        "OrcFileReader": ("orc_rs_spark.orcfile.reader", "OrcFileReader"),
        "OrcWriter": ("orc_rs_spark.orcfile.writer", "OrcWriter"),
        "FileSource": ("orc_rs_spark.orcfile.reader", "FileSource"),
        "MemorySource": ("orc_rs_spark.orcfile.reader", "MemorySource"),
        "orc_schema_ddl": ("orc_rs_spark.orcfile.spark_source", "orc_schema_ddl"),
        "read_orc_evolve": ("orc_rs_spark.orcfile.spark_source", "read_orc_evolve"),
        "count_rows": ("orc_rs_spark.orcfile.spark_source", "count_rows"),
        "merge_orc_files": ("orc_rs_spark.orcfile.merge", "merge_orc_files"),
        "OrcRsDataSource": ("orc_rs_spark.orcfile.datasource", "OrcRsDataSource"),
        "compact_orc_dir": ("orc_rs_spark.orcfile.merge", "compact_orc_dir"),
        "get_spark": ("orc_rs_spark.session", "get_spark"),
    }
    if name in _API:
        import importlib

        mod, attr = _API[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'orc_rs_spark' has no attribute {name!r}")
