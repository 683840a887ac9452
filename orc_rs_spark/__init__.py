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

__version__ = "0.1.0"
