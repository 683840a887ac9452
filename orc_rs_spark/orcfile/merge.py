"""Stripe-level ORC file merge — the small-files compaction path.

A distributed sink (``write_orc_dir``) and any long-running ingest job
produce many small part files; at 100 TB the resulting file count (not
byte count) becomes the scan planner's bottleneck. The standard cure is
stripe-level compaction: ORC's design makes every stripe
position-independent — all stream offsets inside a stripe are relative
to the stripe start (the stripe footer lists stream LENGTHS, and the
StripeInformation in the file footer carries the absolute offset) — so
a stripe's byte region ``[offset, offset + indexLength + dataLength +
footerLength)`` can be relocated into another file verbatim, with no
re-decode, no re-encode, no re-compression. This mirrors ORC Java's
public ``OrcFile.mergeFiles`` API; the reference reader
(/root/reference, read-only, single-file) has no analogue.

What must be rebuilt (cheap, metadata-only):
  - the stripe list (new absolute offsets),
  - the Metadata section (per-stripe statistics): each source file's
    Metadata message is ``repeated StripeStatistics stripeStats = 1``,
    so the merged section is the concatenation of the sources'
    decompressed bodies in stripe order — statistics survive the merge
    byte-exact and stripe/row-group pruning keeps working,
  - the file-level column statistics (merged min/max/counts),
  - footer + postscript.

What must match across inputs (validated, refused otherwise):
  - the full type tree (kind/subtypes/field names/precision/scale/
    varchar length per column),
  - compression kind and block size (block boundaries are baked into
    the copied stripe bytes),
  - rowIndexStride (group geometry of the copied ROW_INDEX streams).
"""

from __future__ import annotations

import os

from orc_rs_spark.orcfile import proto
from orc_rs_spark.orcfile.errors import OrcFormatError
from orc_rs_spark.orcfile.reader import (
    OrcTail,
    as_source,
    orc_stream_decompress,
    read_tail,
    schema_signature,
)
from orc_rs_spark.orcfile.writer import (
    _INT_STAT_KINDS,
    _KIND,
    _STR_STAT_KINDS,
    _field_bytes,
    _field_packed,
    _field_varint,
    _stats_body,
)
from orc_rs_spark.kernels.blockcomp import block_compress

_COPY_CHUNK = 8 << 20  # stripes stream through in 8 MiB slices

# round 6: lzo joined block_compress (kernels/lzo.py), so merge can frame
# rebuilt tail sections for kind-3 files too
_CODEC_ENUM = {"none": 0, "zlib": 1, "snappy": 2, "lzo": 3, "lz4": 4, "zstd": 5}

_type_sig = schema_signature


def _type_message(t: proto.OrcType) -> bytes:
    """Re-serialize one parsed footer type node (inverse of
    proto.OrcType.parse; field numbers per the ORC spec Type message)."""
    msg = _field_varint(1, _KIND[t.kind])
    if t.subtypes:
        msg += _field_packed(2, t.subtypes)
    for name in t.field_names:
        msg += _field_bytes(3, name.encode())
    if t.maximum_length:
        msg += _field_varint(4, t.maximum_length)
    if t.kind == "decimal":
        msg += _field_varint(5, t.precision) + _field_varint(6, t.scale)
    return msg


def _stat_bounds(st: proto.ColumnStatistics, kind: str):
    if kind in _INT_STAT_KINDS:
        return st.int_min, st.int_max
    if kind in ("float", "double"):
        return st.double_min, st.double_max
    if kind in _STR_STAT_KINDS:
        return st.string_min, st.string_max
    if kind == "date":
        return st.date_min, st.date_max
    if kind in ("timestamp", "timestamp_instant"):
        return st.ts_min, st.ts_max
    return None, None


def _merge_file_stats(tails: list[OrcTail]) -> list[bytes]:
    """Merged file-level ColumnStatistics bodies, one per column.

    Counts sum, has_null ORs, min/max combine per column kind; a bound
    missing in ANY input makes the merged bound unknown (omitted), which
    readers treat as "may contain anything" — pruning stays sound."""
    types = tails[0].footer.types
    out = []
    for col, t in enumerate(types):
        n_values, has_null = 0, False
        mn = mx = None
        bounds_known = counts_known = True
        for tail in tails:
            stats = tail.footer.statistics
            st = stats[col] if col < len(stats) else None
            if st is None or st.number_of_values is None or st.has_null is None:
                # an input carries no (or partial) stats for this column:
                # affirmative merged counts would LIE about its rows (e.g.
                # hasNull=false over data that does contain nulls), so the
                # merged footer gets an EMPTY ColumnStatistics message —
                # every field is optional and absent == unknown
                counts_known = False
            else:
                n_values += st.number_of_values
                has_null = has_null or st.has_null
            lo, hi = _stat_bounds(st, t.kind) if st is not None else (None, None)
            if lo is None or hi is None:
                bounds_known = False
                continue
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
        if not counts_known:
            out.append(b"")
            continue
        if not bounds_known:
            mn = mx = None
        out.append(_stats_body(n_values, has_null, t.kind, mn, mx))
    return out


def _metadata_body(path: str, tail: OrcTail) -> bytes:
    """Decompressed Metadata section body (``repeated StripeStatistics``)
    — empty when the file carries none."""
    ps = tail.postscript
    if ps.metadata_length == 0:
        return b""
    src = as_source(path)
    file_len = src.size()
    ps_len = src.read_at(file_len - 1, 1)[0]
    meta_off = file_len - ps_len - 1 - ps.footer_length - ps.metadata_length
    raw = src.read_at(meta_off, ps.metadata_length)
    return orc_stream_decompress(raw, ps.compression)


def merge_orc_files(paths: list[str], out_path: str) -> int:
    """Merge ORC files into one by raw stripe relocation. Returns the
    merged row count. Inputs must share schema, compression (kind AND
    block size) and rowIndexStride; stripes keep their input order, so a
    sort clustered across input files stays clustered after compaction
    (range pruning keeps its selectivity). The output is written through
    an in-progress temp name and renamed on success, so a mid-merge
    failure never leaves a truncated file that a later directory scan
    would pick up as a valid ``.orc``."""
    if not paths:
        raise ValueError("merge_orc_files: no input files")
    tmp_path = f"{out_path}.inprogress"
    try:
        n = _merge_orc_files_to(paths, tmp_path)
        os.replace(tmp_path, out_path)
        return n
    finally:
        if os.path.exists(tmp_path):
            os.remove(tmp_path)


def _merge_orc_files_to(paths: list[str], out_path: str) -> int:
    tails = [read_tail(p) for p in paths]
    sig0 = _type_sig(tails[0])
    ps0 = tails[0].postscript
    stride0 = tails[0].footer.row_index_stride
    for p, tail in zip(paths[1:], tails[1:]):
        if _type_sig(tail) != sig0:
            raise OrcFormatError(
                f"merge_orc_files: schema mismatch: {p} differs from {paths[0]}"
            )
        ps = tail.postscript
        if (ps.compression, ps.compression_block_size) != (
            ps0.compression, ps0.compression_block_size
        ):
            raise OrcFormatError(
                f"merge_orc_files: compression mismatch: {p} has "
                f"{ps.compression}/{ps.compression_block_size}, {paths[0]} has "
                f"{ps0.compression}/{ps0.compression_block_size}"
            )
        if tail.footer.row_index_stride != stride0:
            raise OrcFormatError(
                f"merge_orc_files: rowIndexStride mismatch: {p} has "
                f"{tail.footer.row_index_stride}, {paths[0]} has {stride0}"
            )
    if ps0.compression not in _CODEC_ENUM:
        raise OrcFormatError(f"merge_orc_files: unknown codec {ps0.compression!r}")

    stripe_infos: list[dict] = []
    num_rows = 0
    with open(out_path, "wb") as out:
        out.write(b"ORC")
        pos = 3
        for p, tail in zip(paths, tails):
            src = as_source(p)
            for si in tail.footer.stripes:
                length = si.index_length + si.data_length + si.footer_length
                copied = 0
                while copied < length:
                    n = min(_COPY_CHUNK, length - copied)
                    out.write(src.read_at(si.offset + copied, n))
                    copied += n
                stripe_infos.append({
                    "offset": pos,
                    "index_length": si.index_length,
                    "data_length": si.data_length,
                    "footer_length": si.footer_length,
                    "number_of_rows": si.number_of_rows,
                })
                pos += length
                num_rows += si.number_of_rows
        content_length = pos

        # Metadata: concatenation of the sources' StripeStatistics lists
        # is valid protobuf for the merged Metadata message IF every input
        # carries EXACTLY one entry per stripe; a statless input — or a
        # foreign file whose entry count disagrees with its stripe count —
        # would misattribute stats[stripe] to the wrong stripes after
        # concatenation (silent mis-pruning), so drop the whole section in
        # that (never-ours) case rather than mis-prune.
        bodies = [_metadata_body(p, t) for p, t in zip(paths, tails)]
        aligned = all(
            len(proto.decode_fields(b).get(1, [])) == len(t.footer.stripes)
            for b, t in zip(bodies, tails)
        )
        metadata = b"".join(bodies) if aligned else b""
        if metadata:
            metadata = (
                block_compress(metadata, ps0.compression,
                               max_block=ps0.compression_block_size)
                if ps0.compression != "none" else metadata
            )
            out.write(metadata)

        footer = _field_varint(1, 3)  # headerLength: the 3-byte magic
        footer += _field_varint(2, content_length)
        for si in stripe_infos:
            body = (
                _field_varint(1, si["offset"])
                + _field_varint(2, si["index_length"])
                + _field_varint(3, si["data_length"])
                + _field_varint(4, si["footer_length"])
                + _field_varint(5, si["number_of_rows"])
            )
            footer += _field_bytes(3, body)
        for t in tails[0].footer.types:
            footer += _field_bytes(4, _type_message(t))
        # carry user metadata through the merge (ORC Java's
        # OrcFile.mergeFiles preserves it): union of every input's KV
        # pairs, first file wins on a conflicting key
        merged_md: dict[str, bytes] = {}
        for t in tails:
            for k, v in (t.footer.metadata or {}).items():
                merged_md.setdefault(k, v)
        for k, v in merged_md.items():
            footer += _field_bytes(5, _field_bytes(1, k.encode("utf-8")) + _field_bytes(2, bytes(v)))
        footer += _field_varint(6, num_rows)
        for body in _merge_file_stats(tails):
            footer += _field_bytes(7, body)
        footer += _field_varint(8, stride0)
        footer += _field_varint(9, 1)  # writer: ORC C++ code slot (non-Java)
        footer_comp = (
            block_compress(footer, ps0.compression,
                           max_block=ps0.compression_block_size)
            if ps0.compression != "none" else footer
        )
        out.write(footer_comp)

        ps = _field_varint(1, len(footer_comp))
        ps += _field_varint(2, _CODEC_ENUM[ps0.compression])
        ps += _field_varint(3, ps0.compression_block_size)
        ps += _field_packed(4, [0, 12])
        ps += _field_varint(5, len(metadata))
        ps += _field_varint(6, 6)  # writerVersion
        ps += _field_bytes(8000, b"ORC")
        if len(ps) > 255:
            raise OrcFormatError("merged postscript too long")
        out.write(ps)
        out.write(bytes([len(ps)]))
    return num_rows


def plan_compaction(sizes: list[tuple[str, int]], target_bytes: int) -> list[list[str]]:
    """Group CONSECUTIVE files (in the given, normally sorted, order)
    into bins of ≤ target_bytes (≥1 file each, so an oversized file
    becomes its own bin). Consecutive-only grouping preserves any global
    sort clustering across part files — compaction must not destroy the
    range-pruning selectivity the sort bought."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for path, size in sizes:
        if cur and cur_bytes + size > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(path)
        cur_bytes += size
    if cur:
        groups.append(cur)
    return groups


def compact_orc_dir(spark, in_dir: str, out_dir: str,
                    target_bytes: int = 256 << 20,
                    group_by_schema: bool = False,
                    name_prefix: str = "part-") -> int:
    """Distributed small-files compaction: bin part files to
    ~target_bytes and merge each bin in its own task (raw stripe copy —
    no decode, so a task's cost is pure I/O). The driver touches only
    the file LISTING (names + sizes, O(files) metadata); every tail read
    and byte copy happens in tasks. Output files commit via
    attempt-unique temp + atomic rename (same protocol as
    write_orc_dir), so retried/speculative attempts never interleave.
    Returns total rows written.

    ``group_by_schema=True`` compacts a directory whose schema EVOLVED
    over time: files are first grouped by (schema signature,
    compression, rowIndexStride) — one driver-side thread-pooled tail
    read per file, the one case where planning must look past the
    listing — and each generation compacts into its own single-schema
    output files, which ``read_orc_evolve`` / the format's evolve mode
    then read as one table.

    ``name_prefix`` controls the output file names
    (``{name_prefix}{gid:05d}.orc``). This matters when the directory is
    TAILED by a ``readStream.format("orc_rs")`` query, whose offset is a
    name watermark: compacted replacements of already-streamed files must
    sort BELOW the stream's watermark so a checkpoint-restart neither
    re-reads them (duplicates) nor flags them as late arrivals — pass a
    prefix like ``"compact-"`` (ASCII-below the sinks' ``"part-"`` names)
    and swap files only while the stream is stopped. Compacting INTO a
    LIVE-tailed directory is refused by the stream source itself: the new
    names appear below its already-planned watermark and trip the
    out-of-order-producer check (datasource.py) loudly. Cookbook:
    README "Compaction under a tailing stream"; contract test:
    tests/test_datasource.py::test_compact_then_restart_stream."""
    import glob as _glob
    import json
    from collections.abc import Iterator

    import pyarrow as pa
    from pyspark import TaskContext

    files = sorted(_glob.glob(os.path.join(in_dir, "*.orc")))
    if not files:
        raise ValueError(f"compact_orc_dir: no ORC files in {in_dir}")
    if group_by_schema:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, len(files))) as ex:
            keys = list(ex.map(
                lambda f: (
                    schema_signature(t := read_tail(f)),
                    t.postscript.compression,
                    t.postscript.compression_block_size,
                    t.footer.row_index_stride,
                ),
                files,
            ))
        by_key: dict = {}
        for f, k in zip(files, keys):
            by_key.setdefault(k, []).append(f)
        groups = [
            g
            for key in sorted(by_key, key=str)
            for g in plan_compaction(
                [(f, os.path.getsize(f)) for f in by_key[key]], target_bytes
            )
        ]
    else:
        groups = plan_compaction([(f, os.path.getsize(f)) for f in files], target_bytes)
    os.makedirs(out_dir, exist_ok=True)

    rows = [(gid, json.dumps(paths)) for gid, paths in enumerate(groups)]
    df = spark.createDataFrame(rows, "gid int, paths string").repartition(len(groups))

    def work(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        for b in batches:
            for gid, paths_json in zip(
                b.column("gid").to_pylist(), b.column("paths").to_pylist()
            ):
                final = os.path.join(out_dir, f"{name_prefix}{gid:05d}.orc")
                tmp = f"{final}.{attempt}.tmp"
                try:
                    n = merge_orc_files(json.loads(paths_json), tmp)
                    os.replace(tmp, final)
                finally:
                    if os.path.exists(tmp):
                        os.remove(tmp)
                yield pa.RecordBatch.from_arrays(
                    [pa.array([gid], type=pa.int32()),
                     pa.array([n], type=pa.int64()),
                     pa.array([os.path.getsize(final)], type=pa.int64())],
                    names=["gid", "rows", "bytes"],
                )

    result = df.mapInArrow(work, "gid int, rows bigint, bytes bigint")
    # one row per bin — bounded by the group count, not the data
    return sum(r["rows"] for r in result.collect())
