"""ORC file reader: tail walk + stripe decode using the shared kernels.

Wire walk mirrors the reference (/root/reference/src/tail.rs:47-215): read
the last 16 KiB, postscript length from the final byte, postscript
protobuf, then the (possibly compressed) footer. Stripe decode follows the
public ORC v1 spec stream layout: per-stripe index region, data streams in
stripe-footer order, PRESENT bitmaps as boolean RLE, ints as RLEv1
(DIRECT, Hive 0.11) or RLEv2 (DIRECT_V2), strings direct or dictionary,
lists/maps via LENGTH streams, structs by recursion — the same reader
matrix as /root/reference/src/column_reader/*.

Decompression: zlib via stdlib, snappy/lz4 via the from-spec kernels in
kernels/lzblocks.py. zstd has no decoder in this environment (no library,
and FSE+Huffman from spec is out of scope this round) — zstd files raise
a clear error.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from orc_rs_spark.kernels.byte_rle import boolean_rle_decode, byte_rle_decode
from orc_rs_spark.kernels.lzblocks import lz4_block_decompress, snappy_decompress
from orc_rs_spark.kernels.rlev1 import rlev1_decode
from orc_rs_spark.kernels.rlev2 import rlev2_decode
from orc_rs_spark.orcfile import proto

TAIL_BUFFER_SIZE = 16 * 1024

# seconds between 1970-01-01 and the ORC timestamp base 2015-01-01 (UTC)
TS_BASE_SECONDS = 1420070400


def _inner_decompress(block: bytes, codec: str) -> bytes:
    if codec == "zlib":
        return zlib.decompress(block, wbits=-15)
    if codec == "snappy":
        return snappy_decompress(block)
    if codec == "lz4":
        return lz4_block_decompress(block)
    if codec == "zstd":
        from orc_rs_spark.kernels.zstd import zstd_decompress

        return zstd_decompress(block)
    raise ValueError(f"no {codec} decoder available in this environment")


def orc_stream_decompress(data: bytes, codec: str) -> bytes:
    """ORC stream framing: 3-byte LE header = (len << 1) | is_original,
    repeated blocks (reference: /root/reference/src/compression.rs:362-382)."""
    if codec == "none":
        return data
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        header = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        length = header >> 1
        block = data[pos : pos + length]
        if len(block) != length:
            raise ValueError("ORC compressed stream truncated")
        out.append(bytes(block) if header & 1 else _inner_decompress(bytes(block), codec))
        pos += length
    return b"".join(out)


@dataclass
class OrcTail:
    postscript: proto.PostScript
    footer: proto.Footer
    file_length: int

    @property
    def schema_names(self) -> list[str]:
        return list(self.footer.types[0].field_names)


def read_tail(path: str) -> OrcTail:
    with open(path, "rb") as f:
        f.seek(0, 2)
        file_len = f.tell()
        read_pos = max(0, file_len - TAIL_BUFFER_SIZE)
        f.seek(read_pos)
        buf = f.read(file_len - read_pos)
        ps_len = buf[-1]
        ps = proto.PostScript.parse(buf[len(buf) - 1 - ps_len : len(buf) - 1])
        if ps.magic != "ORC":
            raise ValueError(f"invalid postscript magic {ps.magic!r}")
        tail_size = ps.footer_length + ps_len + 1
        if tail_size >= file_len:
            raise ValueError(f"invalid tail size {tail_size} >= file size {file_len}")
        if ps.footer_length <= len(buf) - 1 - ps_len:
            footer_comp = buf[len(buf) - 1 - ps_len - ps.footer_length : len(buf) - 1 - ps_len]
        else:
            f.seek(file_len - tail_size)
            footer_comp = f.read(ps.footer_length)
        footer = proto.Footer.parse(orc_stream_decompress(footer_comp, ps.compression))
        return OrcTail(postscript=ps, footer=footer, file_length=file_len)


def read_stripe_statistics(path: str, tail: OrcTail | None = None) -> list[list[proto.ColumnStatistics]]:
    """Per-stripe column statistics from the file's Metadata section —
    the pruning index the reference parses but never uses
    (/root/reference/src/tail.rs:113-132, src/stripe.rs:171 TODO).
    Returns stats[stripe][column]; empty list when the section is absent."""
    if tail is None:
        tail = read_tail(path)
    ps = tail.postscript
    if ps.metadata_length == 0:
        return []
    with open(path, "rb") as f:
        f.seek(0, 2)
        file_len = f.tell()
        ps_len_byte = 1
        # postscript length byte count: re-read the last byte
        f.seek(file_len - 1)
        ps_len = f.read(1)[0]
        meta_off = file_len - ps_len - ps_len_byte - ps.footer_length - ps.metadata_length
        f.seek(meta_off)
        raw = f.read(ps.metadata_length)
    meta = proto.decode_fields(orc_stream_decompress(raw, ps.compression))
    out = []
    for ss in meta.get(1, []):  # repeated StripeStatistics
        cols = proto.decode_fields(ss)
        out.append([proto.ColumnStatistics.parse(x) for x in cols.get(1, [])])
    return out


def prune_stripes(path: str, column: str, lo, hi, tail: OrcTail | None = None) -> list[int]:
    """Stripe indices whose [min, max] for ``column`` overlaps [lo, hi].
    Falls back to all stripes when stripe statistics are missing."""
    if tail is None:
        tail = read_tail(path)
    stats = read_stripe_statistics(path, tail)
    n = len(tail.footer.stripes)
    if not stats or len(stats) != n:
        return list(range(n))
    root = tail.footer.types[0]
    col_id = root.subtypes[root.field_names.index(column)]
    keep = []
    for i, scols in enumerate(stats):
        if col_id >= len(scols):
            keep.append(i)
            continue
        st = scols[col_id]
        smin = st.int_min if st.int_min is not None else st.string_min
        smax = st.int_max if st.int_max is not None else st.string_max
        if smin is None or smax is None:
            keep.append(i)
        elif not (smax < lo or smin > hi):
            keep.append(i)
    return keep


def _scatter(dense: pa.Array, present: np.ndarray | None) -> pa.Array:
    if present is None:
        return dense
    idx = np.full(len(present), -1, dtype=np.int64)
    idx[present] = np.arange(len(dense))
    return dense.take(pa.array(idx, mask=~present))


def _parse_nanos(v: np.ndarray) -> np.ndarray:
    """ORC SECONDARY nano encoding: low 3 bits = trailing-zero marker z;
    if z != 0 the value is (v >> 3) * 10^(z+1) (ORC v1 spec, timestamps)."""
    zeros = (v & 7).astype(np.int64)
    base = v >> 3
    mult = np.where(zeros != 0, 10 ** (zeros + 1), 1)
    return base * mult


class _StripeColumnReader:
    """Decodes one stripe: streams are sliced by walking the stripe footer's
    stream list in order (index region first, then data region)."""

    def __init__(self, raw: bytes, stripe: proto.StripeInformation,
                 sfooter: proto.StripeFooter, types: list[proto.OrcType], codec: str):
        self.types = types
        self.codec = codec
        self.encodings = sfooter.columns
        self.streams: dict[tuple[int, str], bytes] = {}
        pos = 0
        for s in sfooter.streams:
            self.streams[(s.column, s.kind)] = raw[pos : pos + s.length]
            pos += s.length
        self.n_rows = stripe.number_of_rows

    def _stream(self, col: int, kind: str) -> bytes | None:
        raw = self.streams.get((col, kind))
        if raw is None:
            return None
        return orc_stream_decompress(raw, self.codec)

    def _present(self, col: int, n: int) -> np.ndarray | None:
        buf = self._stream(col, "PRESENT")
        if buf is None or n == 0:
            return None
        return boolean_rle_decode(np.frombuffer(buf, dtype=np.uint8), n).astype(bool)

    def _ints(self, buf: bytes, n: int, col: int, signed: bool) -> np.ndarray:
        enc = self.encodings[col].kind
        b = np.frombuffer(buf, dtype=np.uint8)
        if enc in ("DIRECT_V2", "DICTIONARY_V2"):
            return rlev2_decode(b, n, signed=signed)
        return rlev1_decode(b, n, signed=signed)

    def _varint_bigints(self, buf: bytes, n: int) -> list[int]:
        """n zigzag base-128 varints of unbounded width (decimal mantissas,
        reference: src/column_reader/decimal_reader via numeric_reader i128)."""
        out = []
        pos = 0
        mv = memoryview(buf)
        for _ in range(n):
            result = 0
            shift = 0
            while True:
                byte = mv[pos]
                pos += 1
                result |= (byte & 0x7F) << shift
                if not (byte & 0x80):
                    break
                shift += 7
            out.append((result >> 1) ^ -(result & 1))
        return out

    def read_column(self, col: int, n: int) -> pa.Array:
        t = self.types[col]
        kind = t.kind
        present = self._present(col, n)
        n_dense = int(present.sum()) if present is not None else n

        if kind == "struct":
            children = [self.read_column(sub, n_dense) for sub in t.subtypes]
            dense = pa.StructArray.from_arrays(children, names=t.field_names)
            return _scatter(dense, present)

        if kind == "union":
            # ORC union (R13 — present but never wired in the reference,
            # /root/reference/src/column_reader/mod.rs:265): DIRECT byte-RLE
            # TAG stream; each child stream holds only its rows, in order
            tags = byte_rle_decode(
                np.frombuffer(self._stream(col, "DATA"), dtype=np.uint8), n_dense
            ).astype(np.int8)
            counts = np.bincount(tags, minlength=len(t.subtypes))
            children = [
                self.read_column(sub, int(counts[ci])) for ci, sub in enumerate(t.subtypes)
            ]
            # dense-union offsets: running index within each child
            offsets = np.zeros(n_dense, dtype=np.int32)
            for ci in range(len(t.subtypes)):
                sel = tags == ci
                offsets[sel] = np.arange(int(counts[ci]), dtype=np.int32)
            dense = pa.UnionArray.from_dense(
                pa.array(tags), pa.array(offsets), children
            )
            if present is not None:
                raise ValueError("nullable union columns not supported")
            return dense

        if kind in ("list", "map"):
            lbuf = self._stream(col, "LENGTH")
            lengths = self._ints(lbuf, n_dense, col, signed=False)
            n_child = int(lengths.sum())
            offsets = pa.array(np.concatenate(([0], np.cumsum(lengths))).astype(np.int32))
            if kind == "list":
                child = self.read_column(t.subtypes[0], n_child)
                dense = pa.ListArray.from_arrays(offsets, child)
            else:
                keys = self.read_column(t.subtypes[0], n_child)
                vals = self.read_column(t.subtypes[1], n_child)
                dense = pa.MapArray.from_arrays(offsets, keys, vals)
            return _scatter(dense, present)

        data = self._stream(col, "DATA")

        if kind == "boolean":
            vals = boolean_rle_decode(np.frombuffer(data, dtype=np.uint8), n_dense).astype(bool)
            return _scatter(pa.array(vals), present)
        if kind == "byte":
            vals = byte_rle_decode(np.frombuffer(data, dtype=np.uint8), n_dense)
            return _scatter(pa.array(vals.astype(np.int8)), present)
        if kind in ("short", "int", "long", "date"):
            vals = self._ints(data, n_dense, col, signed=True)
            if kind == "short":
                arr = pa.array(vals.astype(np.int16))
            elif kind == "int":
                arr = pa.array(vals.astype(np.int32))
            elif kind == "date":
                arr = pa.array(vals.astype(np.int32)).cast(pa.date32())
            else:
                arr = pa.array(vals)
            return _scatter(arr, present)
        if kind == "float":
            return _scatter(pa.array(np.frombuffer(data, dtype="<f4")[:n_dense]), present)
        if kind == "double":
            return _scatter(pa.array(np.frombuffer(data, dtype="<f8")[:n_dense]), present)
        if kind in ("string", "varchar", "char", "binary"):
            enc = self.encodings[col].kind
            out_type = pa.binary() if kind == "binary" else pa.string()
            if enc in ("DICTIONARY", "DICTIONARY_V2"):
                dict_size = self.encodings[col].dictionary_size
                dbuf = self._stream(col, "DICTIONARY_DATA") or b""
                lbuf = self._stream(col, "LENGTH")
                dlen = self._ints(lbuf, dict_size, col, signed=False)
                doffsets = np.concatenate(([0], np.cumsum(dlen))).astype(np.int64)
                dictionary = pa.Array.from_buffers(
                    pa.string(), dict_size,
                    [None, pa.py_buffer(doffsets.astype(np.int32).tobytes()), pa.py_buffer(dbuf)],
                )
                idx = self._ints(data, n_dense, col, signed=False)
                dense = dictionary.take(pa.array(idx))
                if kind == "binary":
                    dense = dense.cast(pa.binary())
                return _scatter(dense, present)
            lbuf = self._stream(col, "LENGTH")
            lengths = self._ints(lbuf, n_dense, col, signed=False)
            offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
            dense = pa.Array.from_buffers(
                out_type, n_dense,
                [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data or b"")],
            )
            return _scatter(dense, present)
        if kind in ("timestamp", "timestamp_instant"):
            secs = self._ints(data, n_dense, col, signed=True)
            sbuf = self._stream(col, "SECONDARY")
            nanos = _parse_nanos(self._ints(sbuf, n_dense, col, signed=False))
            # JVM convention (calibrated against Spark's ORC writer): the
            # seconds stream is trunc-toward-zero, nanos are the positive
            # fraction; pre-1970 (ABSOLUTE seconds < 0) values with nanos
            # step back one second. Fractional values in (-1s, 0) are
            # lossy (+1s) in the JVM reader too — bug-compatible on purpose.
            abs_secs = secs + TS_BASE_SECONDS
            epoch = abs_secs * 1_000_000_000
            neg = (abs_secs < 0) & (nanos != 0)
            epoch = epoch + nanos - np.where(neg, 1_000_000_000, 0)
            arr = pa.array(epoch).cast(pa.timestamp("ns", tz="UTC" if kind == "timestamp_instant" else None))
            return _scatter(arr, present)
        if kind == "decimal":
            mantissas = self._varint_bigints(data, n_dense)
            sbuf = self._stream(col, "SECONDARY")
            scales = self._ints(sbuf, n_dense, col, signed=True)
            from decimal import Decimal

            prec = t.precision or 38
            scale = t.scale
            if t.precision == 0:  # Hive 0.11 unbounded decimal: per-value scale
                scale = int(scales.max()) if len(scales) else 0
            vals = [
                Decimal(m).scaleb(-int(s)).quantize(Decimal(1).scaleb(-scale))
                for m, s in zip(mantissas, scales)
            ]
            dense = pa.array(vals, type=pa.decimal128(max(prec, 1), scale))
            return _scatter(dense, present)
        raise ValueError(f"unsupported ORC type {kind!r} (column {col})")


class OrcFileReader:
    """Reads a whole ORC file (or selected stripes) into pyarrow batches."""

    def __init__(self, path: str):
        self.path = path
        self.tail = read_tail(path)
        self.codec = self.tail.postscript.compression

    def read_stripe(self, i: int, columns: list[str] | None = None) -> pa.RecordBatch:
        """Decode one stripe. ``columns`` projects at the STREAM level:
        unselected columns' streams are never decompressed or decoded (the
        wire analogue of the chunk format's stream pruning)."""
        stripe = self.tail.footer.stripes[i]
        with open(self.path, "rb") as f:
            f.seek(stripe.offset)
            raw = f.read(stripe.index_length + stripe.data_length + stripe.footer_length)
        sfooter = proto.StripeFooter.parse(
            orc_stream_decompress(
                raw[stripe.index_length + stripe.data_length :], self.codec
            )
        )
        body = raw[: stripe.index_length + stripe.data_length]
        reader = _StripeColumnReader(body, stripe, sfooter, self.tail.footer.types, self.codec)
        root = self.tail.footer.types[0]
        if columns is None:
            names, subs = list(root.field_names), list(root.subtypes)
        else:
            unknown = [c for c in columns if c not in root.field_names]
            if unknown:
                raise ValueError(f"unknown ORC columns {unknown}; have {root.field_names}")
            names = [n for n in root.field_names if n in columns]
            subs = [s for n, s in zip(root.field_names, root.subtypes) if n in columns]
        arrays = [reader.read_column(sub, stripe.number_of_rows) for sub in subs]
        return pa.RecordBatch.from_arrays(arrays, names=names)

    def arrow_schema(self) -> pa.Schema:
        """Arrow schema from the footer type tree (metadata only)."""
        types = self.tail.footer.types

        def conv(cid: int) -> pa.DataType:
            t = types[cid]
            simple = {
                "boolean": pa.bool_(), "byte": pa.int8(), "short": pa.int16(),
                "int": pa.int32(), "long": pa.int64(), "float": pa.float32(),
                "double": pa.float64(), "string": pa.string(), "varchar": pa.string(),
                "char": pa.string(), "binary": pa.binary(), "date": pa.date32(),
                "timestamp": pa.timestamp("ns"),
                "timestamp_instant": pa.timestamp("ns", tz="UTC"),
            }
            if t.kind in simple:
                return simple[t.kind]
            if t.kind == "decimal":
                return pa.decimal128(t.precision or 38, t.scale)
            if t.kind == "list":
                return pa.list_(conv(t.subtypes[0]))
            if t.kind == "map":
                return pa.map_(conv(t.subtypes[0]), conv(t.subtypes[1]))
            if t.kind == "struct":
                return pa.struct(
                    [pa.field(n, conv(s)) for n, s in zip(t.field_names, t.subtypes)]
                )
            raise ValueError(f"no arrow mapping for ORC kind {t.kind!r}")

        root = types[0]
        return pa.schema(
            [pa.field(n, conv(s)) for n, s in zip(root.field_names, root.subtypes)]
        )

    def read_all(self, columns: list[str] | None = None) -> pa.Table:
        batches = [
            self.read_stripe(i, columns) for i in range(len(self.tail.footer.stripes))
        ]
        if not batches:  # zero-row file: typed empty table from the footer
            schema = self.arrow_schema()
            if columns is not None:
                schema = pa.schema([schema.field(c) for c in schema.names if c in columns])
            return pa.Table.from_batches([], schema=schema)
        return pa.Table.from_batches(batches)
