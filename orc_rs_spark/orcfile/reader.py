"""ORC file reader: tail walk + stripe decode using the shared kernels.

Wire walk mirrors the reference (/root/reference/src/tail.rs:47-215): read
the last 16 KiB, postscript length from the final byte, postscript
protobuf, then the (possibly compressed) footer. Stripe decode follows the
public ORC v1 spec stream layout: per-stripe index region, data streams in
stripe-footer order, PRESENT bitmaps as boolean RLE, ints as RLEv1
(DIRECT, Hive 0.11) or RLEv2 (DIRECT_V2), strings direct or dictionary,
lists/maps via LENGTH streams, structs by recursion — the same reader
matrix as /root/reference/src/column_reader/*.

Decompression: zlib via stdlib; snappy/lz4/zstd through the codec
registry (kernels/blockcomp.py) — pyarrow's bundled C codecs where block
sizes are recoverable, the from-spec kernels (lzblocks.py, zstd.py)
otherwise, so all four ORC block codecs decode in any environment.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from orc_rs_spark.kernels.byte_rle import boolean_rle_decode, byte_rle_decode
from orc_rs_spark.kernels.rlev1 import rlev1_decode
from orc_rs_spark.kernels.rlev2 import rlev2_decode
from orc_rs_spark.kernels.varint import varint_decode_zigzag128
from orc_rs_spark.orcfile import proto
from orc_rs_spark.orcfile.errors import (  # noqa: F401
    OrcBoundsError,
    OrcError,
    OrcFormatError,
    OrcUnsupportedError,
)

TAIL_BUFFER_SIZE = 16 * 1024

# seconds between 1970-01-01 and the ORC timestamp base 2015-01-01 (UTC)
TS_BASE_SECONDS = 1420070400


class FileSource:
    """Positional byte source over a local file (the reference's
    OrcFile/FileSource abstraction, src/source.rs:11-62). Every reader
    access is a bounded (offset, length) range read, so an object-store
    implementation (S3/GCS ranged GET) slots in with no reader changes:
    anything with ``size()`` and ``read_at()`` works."""

    def __init__(self, path: str):
        self.path = path

    def size(self) -> int:
        import os

        return os.path.getsize(self.path)

    def read_at(self, offset: int, length: int) -> bytes:
        with open(self.path, "rb") as f:
            f.seek(offset)
            return f.read(length)


class MemorySource:
    """In-memory byte source (reference MemoryReader, src/source.rs:114-174)."""

    def __init__(self, data: bytes):
        self.data = data
        self.path = "<memory>"

    def size(self) -> int:
        return len(self.data)

    def read_at(self, offset: int, length: int) -> bytes:
        return self.data[offset : offset + length]


def as_source(src):
    """str path / bytes / any size()+read_at() object -> byte source."""
    if isinstance(src, (bytes, bytearray, memoryview)):
        return MemorySource(bytes(src))
    if hasattr(src, "read_at") and hasattr(src, "size"):
        return src
    return FileSource(src)


def _inner_decompress(block: bytes, codec: str) -> bytes:
    """One compressed block -> bytes, through the codec REGISTRY
    (kernels/blockcomp.py): pyarrow's bundled C codecs when the block's
    size is recoverable (snappy preamble, zstd frame content size), the
    from-spec kernels otherwise — a zstd ORC scan was 15x slower when
    this called the pure-Python RFC decoder directly."""
    if codec == "zlib":
        return zlib.decompress(block, wbits=-15)
    from orc_rs_spark.kernels.blockcomp import _DECODERS

    dec = _DECODERS.get(codec)
    if dec is None:
        raise OrcUnsupportedError(f"no {codec} decoder available in this environment")
    return dec(block)


class RowIndexUnsupported(Exception):
    """Positional row-group decode not possible for this stripe/column;
    callers fall back to full-stripe decode (correctness preserved)."""


def decompress_from(data, codec: str, chunk_off: int, skip: int, min_bytes: int):
    """Decompress an ORC-framed stream starting at block boundary
    ``chunk_off``, dropping ``skip`` decompressed bytes, stopping as soon
    as ``min_bytes`` of useful output exist — the positional read that
    makes row-group decode cost proportional to the group, not the stripe."""
    if codec == "none":
        return memoryview(data)[chunk_off + skip:]
    out = []
    got = 0
    pos = chunk_off
    n = len(data)
    need = skip + min_bytes
    while pos < n and got < need:
        header = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        length = header >> 1
        block = data[pos : pos + length]
        if len(block) != length:
            raise OrcFormatError("ORC compressed stream truncated")
        piece = bytes(block) if header & 1 else _inner_decompress(bytes(block), codec)
        out.append(piece)
        got += len(piece)
        pos += length
    return memoryview(b"".join(out))[skip:]


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
            raise OrcFormatError("ORC compressed stream truncated")
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


def read_tail(path) -> OrcTail:
    """Parse the file tail from a path, bytes, or byte source — one
    speculative 16 KiB range read (reference src/tail.rs:38,52-59), plus a
    second ranged read only when the footer outgrows the speculation."""
    src = as_source(path)
    file_len = src.size()
    read_pos = max(0, file_len - TAIL_BUFFER_SIZE)
    buf = src.read_at(read_pos, file_len - read_pos)
    if not buf:
        raise OrcFormatError("empty ORC file")
    ps_len = buf[-1]
    ps = proto.PostScript.parse(buf[len(buf) - 1 - ps_len : len(buf) - 1])
    if ps.magic != "ORC":
        raise OrcFormatError(f"invalid postscript magic {ps.magic!r}")
    tail_size = ps.footer_length + ps_len + 1
    if tail_size >= file_len:
        raise OrcFormatError(f"invalid tail size {tail_size} >= file size {file_len}")
    if ps.footer_length <= len(buf) - 1 - ps_len:
        footer_comp = buf[len(buf) - 1 - ps_len - ps.footer_length : len(buf) - 1 - ps_len]
    else:
        footer_comp = src.read_at(file_len - tail_size, ps.footer_length)
    footer = proto.Footer.parse(orc_stream_decompress(footer_comp, ps.compression))
    if footer.encrypted:
        raise OrcUnsupportedError(
            "encrypted ORC files are not supported (footer carries an "
            "Encryption section; reference rejects these too, "
            "src/tail.rs:86-88)"
        )
    return OrcTail(postscript=ps, footer=footer, file_length=file_len)


def read_stripe_statistics(path, tail: OrcTail | None = None) -> list[list[proto.ColumnStatistics]]:
    """Per-stripe column statistics from the file's Metadata section —
    the pruning index the reference parses but never uses
    (/root/reference/src/tail.rs:113-132, src/stripe.rs:171 TODO).
    Returns stats[stripe][column]; empty list when the section is absent."""
    src = as_source(path)
    if tail is None:
        tail = read_tail(src)
    ps = tail.postscript
    if ps.metadata_length == 0:
        return []
    file_len = src.size()
    ps_len = src.read_at(file_len - 1, 1)[0]
    meta_off = file_len - ps_len - 1 - ps.footer_length - ps.metadata_length
    raw = src.read_at(meta_off, ps.metadata_length)
    meta = proto.decode_fields(orc_stream_decompress(raw, ps.compression))
    out = []
    for ss in meta.get(1, []):  # repeated StripeStatistics
        cols = proto.decode_fields(ss)
        out.append([proto.ColumnStatistics.parse(x) for x in cols.get(1, [])])
    return out


def _stats_overlap(st: proto.ColumnStatistics, lo, hi) -> bool:
    """True when the stats' [min, max] MAY intersect [lo, hi] (missing
    stats always overlap — pruning must only skip proven-empty ranges).
    Either bound may be None = unbounded on that side (one-sided ranges,
    e.g. a pushed-down ``col > v``). Date bounds compare in epoch days,
    timestamps in UTC millis; python date/datetime predicate values are
    converted accordingly."""
    import datetime as _dt

    if st.int_min is not None:
        smin, smax = st.int_min, st.int_max
    elif st.double_min is not None:
        smin, smax = st.double_min, st.double_max
    elif st.ts_min is not None:
        smin, smax = st.ts_min, st.ts_max

        def _ms(v):
            if isinstance(v, _dt.datetime):
                if v.tzinfo is None:
                    v = v.replace(tzinfo=_dt.timezone.utc)
                return int(v.timestamp() * 1000)
            return v

        lo, hi = _ms(lo), _ms(hi)
    elif st.date_min is not None:
        smin, smax = st.date_min, st.date_max

        def _days(v):
            if isinstance(v, _dt.datetime):
                v = v.date()
            if isinstance(v, _dt.date):
                return (v - _dt.date(1970, 1, 1)).days
            return v

        lo, hi = _days(lo), _days(hi)
    else:
        smin, smax = st.string_min, st.string_max
    if smin is None or smax is None:
        return True
    try:
        return not ((lo is not None and smax < lo) or (hi is not None and smin > hi))
    except TypeError:
        # type-mismatched predicate (e.g. string bounds against an int
        # column): keep everything rather than abort the scan — pruning
        # may only skip PROVEN-empty ranges
        return True


def _bloom_test(bloom, value, kind: str | None = None) -> bool:
    """Bloom probe matching the Java writer's hashing, dispatched by the
    COLUMN kind (the writer hashed by column type, so the probe value must
    be coerced the same way — an int probe against a double column's bloom
    must hash doubleToLongBits(float(v)), not ThomasWang(v)); falls back
    to python-type dispatch when the kind is unknown. Ints/dates via the
    Thomas Wang mix, floats via doubleToLongBits -> long hash,
    strings/bytes via Murmur3 hash64."""
    import datetime as _dt
    import struct as _s

    if isinstance(value, bool):
        return True  # boolean columns carry no blooms
    if kind in ("float", "double"):
        if isinstance(value, (int, float, np.integer, np.floating)):
            value = float(value)
        else:
            return True
    elif kind in ("byte", "short", "int", "long"):
        if isinstance(value, (float, np.floating)):
            if not float(value).is_integer():
                return True  # non-integral value can't be in an int column
            value = int(value)
    elif kind == "date":
        if isinstance(value, _dt.datetime):
            value = value.date()
        if isinstance(value, _dt.date):
            value = (value - _dt.date(1970, 1, 1)).days
    if isinstance(value, (int, np.integer)):
        return bloom.test_long(int(value))
    if isinstance(value, (float, np.floating)):
        return bloom.test_long(_s.unpack("<q", _s.pack("<d", float(value)))[0])
    if isinstance(value, str):
        return bloom.test_bytes(value.encode("utf-8"))
    if isinstance(value, (bytes, bytearray)):
        return bloom.test_bytes(bytes(value))
    return True  # unknown type: never prune on a guess


def resolve_column_path(types: list, name: str) -> int | None:
    """ORC column id for a possibly-nested path: top-level names, struct
    fields by name, list elements as ``col.item`` (or ``.element``), map
    sides as ``col.key`` / ``col.value``. None when the path doesn't
    resolve — pruning then simply keeps everything."""
    cur = types[0]
    cid = 0
    for part in name.split("."):
        kind = cur.kind
        if kind == "struct":
            if part not in cur.field_names:
                return None
            cid = cur.subtypes[cur.field_names.index(part)]
        elif kind == "list" and part in ("item", "element"):
            cid = cur.subtypes[0]
        elif kind == "map" and part in ("key", "value"):
            cid = cur.subtypes[0 if part == "key" else 1]
        else:
            return None
        cur = types[cid]
    return cid


def _runs(sorted_ids: list[int]) -> list[tuple[int, int]]:
    """Collapse a sorted id list into (start, length) consecutive runs."""
    runs: list[tuple[int, int]] = []
    for g in sorted_ids:
        if runs and g == runs[-1][0] + runs[-1][1]:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1)
        else:
            runs.append((g, 1))
    return runs


def schema_signature(tail: OrcTail) -> tuple:
    """Hashable signature of the full type tree — every field that
    affects decode or rendering, including varchar/char maximum_length.
    The single source of truth for both the scan's mixed-schema gate and
    merge's compatibility check (drift between two copies would let one
    path combine files the other refuses)."""
    return tuple(
        (t.kind, tuple(t.subtypes), tuple(t.field_names), t.precision, t.scale,
         t.maximum_length)
        for t in tail.footer.types
    )


def predicate_form(p: tuple) -> tuple:
    """Normalize one scan predicate: ``(col, lo, hi)`` -> ("range", col,
    lo, hi); ``(col, values)`` with a list/tuple/set/ndarray -> ("in",
    col, list(values)) — the IN-list shape a semi-join pushdown produces."""
    if len(p) == 3:
        return ("range", p[0], p[1], p[2])
    if len(p) == 2 and isinstance(p[1], (list, tuple, set, frozenset, np.ndarray)):
        return ("in", p[0], list(p[1]))
    raise ValueError(
        f"predicate must be (column, lo, hi) or (column, values-list); got {p!r}"
    )


def prune_stripes_stats(tail: OrcTail, stats: list, predicates: list[tuple]) -> list[int]:
    """Stripe indices that MAY satisfy every predicate — ``(column, lo,
    hi)`` ranges and ``(column, values)`` IN-lists — from pre-parsed
    stripe statistics: the Metadata section is read and parsed ONCE per
    file however many predicates the scan carries. Falls back to all
    stripes when statistics are missing or malformed."""
    n = len(tail.footer.stripes)
    if not stats or len(stats) != n:
        return list(range(n))
    keep = set(range(n))
    for p in predicates:
        form = predicate_form(p)
        column = form[1]
        col_id = resolve_column_path(tail.footer.types, column)
        if col_id is None:
            continue
        if form[0] == "range":
            _, _, lo, hi = form

            def hit(st):
                return _stats_overlap(st, lo, hi)
        else:
            vals = form[2]
            if not vals:
                return []

            def hit(st):
                return any(_stats_overlap(st, v, v) for v in vals)

        keep = {
            i for i in keep
            if col_id >= len(stats[i]) or hit(stats[i][col_id])
        }
    return sorted(keep)


def prune_stripes(path: str, column: str, lo, hi, tail: OrcTail | None = None) -> list[int]:
    """Stripe indices whose [min, max] for ``column`` overlaps [lo, hi].
    Falls back to all stripes when stripe statistics are missing."""
    if tail is None:
        tail = read_tail(path)
    stats = read_stripe_statistics(path, tail)
    return prune_stripes_stats(tail, stats, [(column, lo, hi)])


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

    def __init__(self, streams: dict[tuple[int, str], bytes],
                 stripe: proto.StripeInformation,
                 sfooter: proto.StripeFooter, types: list[proto.OrcType], codec: str):
        self.types = types
        self.codec = codec
        self.encodings = sfooter.columns
        self.streams = streams
        self.n_rows = stripe.number_of_rows
        self._dicts: dict[int, pa.Array] = {}
        self._row_index: dict[int, list] | None = None

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

    def _decimal_dense(self, buf, n_dense: int, scales: np.ndarray,
                       t: proto.OrcType) -> pa.Array:
        """Dense decimal column from the DATA varint stream + SECONDARY
        scales. Fast path: whole-array zigzag-i128 varint decode straight
        into pyarrow's decimal128 two-word buffer layout — no per-value
        Python (the reference loops per value,
        src/column_reader/numeric_reader.rs:314-383). Falls back to the
        python-int path only for Hive-0.11 unbounded decimals or files
        whose per-value scales differ from the column scale (both need
        per-value rescaling/rounding)."""
        prec = t.precision or 38
        scale = t.scale
        if t.precision == 0:  # Hive 0.11 unbounded decimal: per-value scale
            scale = int(scales.max()) if len(scales) else 0
        elif n_dense == 0 or bool((scales == scale).all()):
            lo, hi, _ = varint_decode_zigzag128(
                np.frombuffer(buf, dtype=np.uint8), n_dense
            )
            words = np.empty((n_dense, 2), dtype=np.uint64)
            words[:, 0] = lo
            words[:, 1] = hi
            return pa.Array.from_buffers(
                pa.decimal128(max(prec, 1), scale), n_dense,
                [None, pa.py_buffer(words.tobytes())],
            )
        from decimal import Decimal

        mantissas = self._varint_bigints(bytes(buf), n_dense)
        vals = [
            Decimal(m).scaleb(-int(s)).quantize(Decimal(1).scaleb(-scale))
            for m, s in zip(mantissas, scales)
        ]
        return pa.array(vals, type=pa.decimal128(max(prec, 1), scale))

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

    def _dict_array(self, col: int) -> pa.Array:
        """Stripe-global string dictionary (materialized once per column)."""
        if col not in self._dicts:
            dict_size = self.encodings[col].dictionary_size
            dbuf = self._stream(col, "DICTIONARY_DATA") or b""
            lbuf = self._stream(col, "LENGTH")
            dlen = self._ints(lbuf, dict_size, col, signed=False)
            doffsets = np.concatenate(([0], np.cumsum(dlen))).astype(np.int64)
            self._dicts[col] = pa.Array.from_buffers(
                pa.string(), dict_size,
                [None, pa.py_buffer(doffsets.astype(np.int32).tobytes()), pa.py_buffer(dbuf)],
            )
        return self._dicts[col]

    # ------------------------------------------- positional (row-group) path

    def row_index(self) -> dict[int, list]:
        """col -> RowIndexEntry list, from this stripe's ROW_INDEX streams
        (the index the reference parses at src/stripe.rs:129-168 and never
        uses — TODO at :171; here it drives actual skipping)."""
        if self._row_index is None:
            out: dict[int, list] = {}
            for (col, kind), raw in self.streams.items():
                if kind == "ROW_INDEX":
                    out[col] = proto.parse_row_index(orc_stream_decompress(raw, self.codec))
            self._row_index = out
        return self._row_index

    def _positions(self, col: int, flat: list[int]) -> dict[str, tuple]:
        """Split one entry's flat position list into per-stream cursors
        (chunk_off, decomp_skip, *value_skips) following the canonical
        stream order; a slot-count mismatch aborts to the full-decode path."""
        comp = self.codec != "none"
        base = 2 if comp else 1
        enc = self.encodings[col].kind
        out: dict[str, tuple] = {}
        i = 0
        try:
            layout = proto.stream_position_layout(self.types[col].kind, enc)
        except ValueError as e:
            raise RowIndexUnsupported(str(e)) from None
        for kindname, extra in layout:
            if (col, kindname) not in self.streams:
                continue
            slots = base + extra
            vals = flat[i : i + slots]
            i += slots
            if len(vals) != slots:
                raise RowIndexUnsupported(f"column {col}: truncated positions")
            if comp:
                out[kindname] = tuple(vals)
            else:
                out[kindname] = (vals[0], 0, *vals[1:])
        if i != len(flat):
            raise RowIndexUnsupported(
                f"column {col}: {len(flat) - i} unconsumed position slots"
            )
        return out

    def _stream_at(self, col: int, kind: str, cpos: tuple, min_bytes: int):
        raw = self.streams.get((col, kind))
        if raw is None:
            raise RowIndexUnsupported(f"column {col}: stream {kind} missing")
        if self.codec == "none":
            return memoryview(raw)[cpos[0]:]
        return decompress_from(raw, self.codec, cpos[0], cpos[1], min_bytes)

    def _bits_at(self, col: int, skind: str, nbits: int, pm: dict) -> np.ndarray:
        chunk_off, dskip, byte_skip, bit_skip = pm[skind][:4]
        need_bytes = int(byte_skip) + (int(bit_skip) + nbits + 7) // 8
        buf = self._stream_at(col, skind, (chunk_off, dskip),
                              need_bytes + need_bytes // 128 + 4)
        bys = byte_rle_decode(np.frombuffer(buf, dtype=np.uint8), need_bytes)
        bits = np.unpackbits(bys[int(byte_skip):])
        return bits[int(bit_skip) : int(bit_skip) + nbits]

    def _ints_at(self, col: int, skind: str, n: int, pm: dict, signed: bool) -> np.ndarray:
        cpos = pm[skind]
        vskip = int(cpos[2]) if len(cpos) > 2 else 0
        total = vskip + n
        buf = self._stream_at(col, skind, cpos, total * 11 + 32)
        b = np.frombuffer(buf, dtype=np.uint8)
        enc = self.encodings[col].kind
        if enc in ("DIRECT_V2", "DICTIONARY_V2"):
            vals = rlev2_decode(b, total, signed=signed)
        else:
            vals = rlev1_decode(b, total, signed=signed)
        return vals[vskip:]

    def read_column_group(self, col: int, n: int, index: dict, g: int) -> pa.Array:
        """Decode ``n`` of this column's values starting at row group ``g``
        using recorded positions — only the byte ranges the group touches
        are decompressed and decoded (the row-group skip the reference
        left as a TODO, src/stripe.rs:171)."""
        t = self.types[col]
        kind = t.kind
        entries = index.get(col)
        if not entries or g >= len(entries):
            raise RowIndexUnsupported(f"column {col}: no index entry for group {g}")
        pm = self._positions(col, entries[g].positions)
        present = None
        if "PRESENT" in pm:
            present = self._bits_at(col, "PRESENT", n, pm).astype(bool)
        n_dense = int(present.sum()) if present is not None else n

        if kind == "union":
            # TAG stream is byte RLE (same position contract as a byte
            # column: chunk offset, decompressed skip, value skip); each
            # child's own index entry locates its values for this group
            cpos = pm["DATA"]
            vskip = int(cpos[2]) if len(cpos) > 2 else 0
            need = vskip + n_dense
            buf = self._stream_at(col, "DATA", cpos, need + need // 128 + 4)
            tags = byte_rle_decode(np.frombuffer(buf, dtype=np.uint8), need)[vskip:].astype(np.int8)
            counts = np.bincount(tags, minlength=len(t.subtypes))
            children = [
                self.read_column_group(sub, int(counts[ci]), index, g)
                for ci, sub in enumerate(t.subtypes)
            ]
            offsets = np.zeros(n_dense, dtype=np.int32)
            for ci in range(len(t.subtypes)):
                sel = tags == ci
                offsets[sel] = np.arange(int(counts[ci]), dtype=np.int32)
            if present is not None:
                raise ValueError("nullable union columns not supported")
            return pa.UnionArray.from_dense(pa.array(tags), pa.array(offsets), children)

        if kind == "struct":
            children = [self.read_column_group(sub, n_dense, index, g) for sub in t.subtypes]
            dense = pa.StructArray.from_arrays(children, names=t.field_names)
            return _scatter(dense, present)
        if kind in ("list", "map"):
            lengths = self._ints_at(col, "LENGTH", n_dense, pm, signed=False)
            n_child = int(lengths.sum())
            offsets = pa.array(np.concatenate(([0], np.cumsum(lengths))).astype(np.int32))
            if kind == "list":
                child = self.read_column_group(t.subtypes[0], n_child, index, g)
                dense = pa.ListArray.from_arrays(offsets, child)
            else:
                keys = self.read_column_group(t.subtypes[0], n_child, index, g)
                vals = self.read_column_group(t.subtypes[1], n_child, index, g)
                dense = pa.MapArray.from_arrays(offsets, keys, vals)
            return _scatter(dense, present)
        if kind == "boolean":
            bits = self._bits_at(col, "DATA", n_dense, pm).astype(bool)
            return _scatter(pa.array(bits), present)
        if kind == "byte":
            cpos = pm["DATA"]
            vskip = int(cpos[2])
            need = vskip + n_dense
            buf = self._stream_at(col, "DATA", cpos, need + need // 128 + 4)
            vals = byte_rle_decode(np.frombuffer(buf, dtype=np.uint8), need)[vskip:]
            return _scatter(pa.array(vals.astype(np.int8)), present)
        if kind in ("short", "int", "long", "date"):
            vals = self._ints_at(col, "DATA", n_dense, pm, signed=True)
            if kind == "short":
                arr = pa.array(vals.astype(np.int16))
            elif kind == "int":
                arr = pa.array(vals.astype(np.int32))
            elif kind == "date":
                arr = pa.array(vals.astype(np.int32)).cast(pa.date32())
            else:
                arr = pa.array(vals)
            return _scatter(arr, present)
        if kind in ("float", "double"):
            isz = 4 if kind == "float" else 8
            buf = self._stream_at(col, "DATA", pm["DATA"], n_dense * isz)
            vals = np.frombuffer(buf, dtype="<f4" if kind == "float" else "<f8",
                                 count=n_dense)
            return _scatter(pa.array(vals), present)
        if kind in ("string", "varchar", "char", "binary"):
            out_type = pa.binary() if kind == "binary" else pa.string()
            if self.encodings[col].kind in ("DICTIONARY", "DICTIONARY_V2"):
                dictionary = self._dict_array(col)
                idx = self._ints_at(col, "DATA", n_dense, pm, signed=False)
                dense = dictionary.take(pa.array(idx))
                if kind == "binary":
                    dense = dense.cast(pa.binary())
                return _scatter(dense, present)
            lengths = self._ints_at(col, "LENGTH", n_dense, pm, signed=False)
            total = int(lengths.sum())
            data = self._stream_at(col, "DATA", pm["DATA"], total)
            offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
            dense = pa.Array.from_buffers(
                out_type, n_dense,
                [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(bytes(data[:total]))],
            )
            return _scatter(dense, present)
        if kind in ("timestamp", "timestamp_instant"):
            secs = self._ints_at(col, "DATA", n_dense, pm, signed=True)
            nanos = _parse_nanos(self._ints_at(col, "SECONDARY", n_dense, pm, signed=False))
            abs_secs = secs + TS_BASE_SECONDS
            epoch = abs_secs * 1_000_000_000
            neg = (abs_secs < 0) & (nanos != 0)
            epoch = epoch + nanos - np.where(neg, 1_000_000_000, 0)
            arr = pa.array(epoch).cast(
                pa.timestamp("ns", tz="UTC" if kind == "timestamp_instant" else None)
            )
            return _scatter(arr, present)
        if kind == "decimal":
            buf = self._stream_at(col, "DATA", pm["DATA"], 19 * n_dense + 32)
            scales = self._ints_at(col, "SECONDARY", n_dense, pm, signed=True)
            return _scatter(self._decimal_dense(buf, n_dense, scales, t), present)
        raise RowIndexUnsupported(f"ORC kind {kind!r} has no positional decode")

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
                dictionary = self._dict_array(col)
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
            sbuf = self._stream(col, "SECONDARY")
            scales = self._ints(sbuf, n_dense, col, signed=True)
            return _scatter(self._decimal_dense(data, n_dense, scales, t), present)
        raise OrcUnsupportedError(f"unsupported ORC type {kind!r} (column {col})")


class OrcFileReader:
    """Reads a whole ORC file (or selected stripes) into pyarrow batches.

    Accepts a local path, raw bytes, or any positional byte source with
    ``size()``/``read_at()`` (src/source.rs parity) — every access is a
    bounded range read, never a whole-file scan, so at 100 TB on object
    storage each task pulls only its stripes' byte ranges."""

    def __init__(self, path):
        self.source = as_source(path)
        self.path = getattr(self.source, "path", "<source>")
        self.tail = read_tail(self.source)
        self.codec = self.tail.postscript.compression
        # parsed (row_index, blooms) per stripe: a conjunctive scan probes
        # the same stripe once per predicate, and without this each probe
        # would range-read + decompress + proto-parse the index region
        # again. Bounded (tasks walk a handful of stripes at a time).
        self._index_cache: dict[int, tuple] = {}
        self._index_cache_cap = 8

    def _column_subtree(self, col: int, out: set[int]) -> None:
        out.add(col)
        for sub in self.tail.footer.types[col].subtypes:
            self._column_subtree(sub, out)

    def _open_stripe(self, i: int, columns: list[str] | None = None):
        """Open one stripe, reading ONLY the selected columns' stream byte
        ranges (coalesced) — column pruning at the I/O level, the byte-range
        analogue of the reference's per-stream range readers
        (src/compression.rs:39-56, src/io_utils.rs:237-281). A full-schema
        read stays one contiguous range."""
        stripe = self.tail.footer.stripes[i]
        body_len = stripe.index_length + stripe.data_length
        sfooter = proto.StripeFooter.parse(
            orc_stream_decompress(
                self.source.read_at(stripe.offset + body_len, stripe.footer_length),
                self.codec,
            )
        )
        # stream layout: (offset-in-stripe, length) in footer order
        spans = []
        pos = 0
        for s in sfooter.streams:
            spans.append((s, pos, s.length))
            pos += s.length
        if columns is None:
            raw = self.source.read_at(stripe.offset, body_len)
            streams = {
                (s.column, s.kind): raw[off : off + ln] for s, off, ln in spans
            }
        else:
            _names, subs = self._select(columns)
            needed: set[int] = set()
            for sub in subs:
                self._column_subtree(sub, needed)
            picked = [(s, off, ln) for s, off, ln in spans if s.column in needed]
            # coalesce ranges closer than 64 KiB: fewer, larger reads
            ranges: list[list[int]] = []
            for _s, off, ln in sorted(picked, key=lambda t: t[1]):
                if ranges and off - (ranges[-1][0] + ranges[-1][1]) <= 64 * 1024:
                    ranges[-1][1] = off + ln - ranges[-1][0]
                else:
                    ranges.append([off, ln])
            blobs = {
                (lo, ln): self.source.read_at(stripe.offset + lo, ln)
                for lo, ln in ranges
            }
            streams = {}
            for s, off, ln in picked:
                for (lo, rln), blob in blobs.items():
                    if lo <= off and off + ln <= lo + rln:
                        streams[(s.column, s.kind)] = blob[off - lo : off - lo + ln]
                        break
        return (
            _StripeColumnReader(streams, stripe, sfooter, self.tail.footer.types, self.codec),
            stripe,
        )

    def _select(self, columns: list[str] | None):
        root = self.tail.footer.types[0]
        if columns is None:
            return list(root.field_names), list(root.subtypes)
        unknown = [c for c in columns if c not in root.field_names]
        if unknown:
            raise ValueError(f"unknown ORC columns {unknown}; have {root.field_names}")
        names = [n for n in root.field_names if n in columns]
        subs = [s for n, s in zip(root.field_names, root.subtypes) if n in columns]
        return names, subs

    def _empty_batch(self, names: list[str]) -> pa.RecordBatch:
        schema = self.arrow_schema()
        return pa.RecordBatch.from_arrays(
            [pa.array([], type=schema.field(n).type) for n in names], names=names
        )

    def _check_group_support(self, reader, index, col: int, n_groups: int) -> None:
        """Dry-run the position parse over a column subtree — for EVERY
        index entry, not just the first — so the group path either works
        for the whole stripe or falls back before any batch is emitted.
        (Validating only entry 0 let a malformed later entry raise
        RowIndexUnsupported mid-yield, and the full-stripe fallback then
        re-emitted rows the caller had already consumed.)"""
        t = self.tail.footer.types[col]
        entries = index.get(col)
        if not entries:
            raise RowIndexUnsupported(f"column {col}: no ROW_INDEX stream")
        if len(entries) != n_groups:
            raise RowIndexUnsupported(
                f"column {col}: {len(entries)} index entries for {n_groups} row groups"
            )
        for e in entries:
            reader._positions(col, e.positions)
        for sub in t.subtypes:
            self._check_group_support(reader, index, sub, n_groups)

    def _decode_group_runs(self, reader, stripe, names, subs, sel: list[int],
                           groups_per_batch: int):
        """Yield one RecordBatch per run of ≤ groups_per_batch consecutive
        selected row groups, decoded positionally."""
        stride = self.tail.footer.row_index_stride
        n_rows = stripe.number_of_rows
        index = reader.row_index()
        if not index:
            raise RowIndexUnsupported("stripe has no ROW_INDEX streams")
        n_groups = -(-n_rows // stride)
        for sub in subs:
            self._check_group_support(reader, index, sub, n_groups)
        for g0, glen in _runs(sel):
            for s in range(g0, g0 + glen, groups_per_batch):
                cnt = min(groups_per_batch, g0 + glen - s)
                n = min(cnt * stride, n_rows - s * stride)
                arrays = [reader.read_column_group(sub, n, index, s) for sub in subs]
                yield pa.RecordBatch.from_arrays(arrays, names=names)

    def read_stripe(self, i: int, columns: list[str] | None = None,
                    row_groups: list[int] | None = None) -> pa.RecordBatch:
        """Decode one stripe. ``columns`` projects at the STREAM level:
        unselected columns' streams are never decompressed or decoded (the
        wire analogue of the chunk format's stream pruning). ``row_groups``
        restricts decode to those row-index groups — positional decode when
        the file carries a usable ROW_INDEX, full-decode-and-slice fallback
        otherwise (same rows either way)."""
        reader, stripe = self._open_stripe(i, columns)
        names, subs = self._select(columns)
        n_rows = stripe.number_of_rows
        if row_groups is None:
            arrays = [reader.read_column(sub, n_rows) for sub in subs]
            return pa.RecordBatch.from_arrays(arrays, names=names)
        stride = self.tail.footer.row_index_stride
        if stride <= 0:
            raise OrcBoundsError("row_groups given but the file has no rowIndexStride")
        n_groups = -(-n_rows // stride)
        sel = sorted({int(g) for g in row_groups})
        if any(g < 0 or g >= n_groups for g in sel):
            raise OrcBoundsError(f"row group out of range (stripe {i} has {n_groups})")
        if not sel:
            return self._empty_batch(names)
        try:
            batches = list(self._decode_group_runs(reader, stripe, names, subs, sel, n_groups))
        except RowIndexUnsupported:
            full = pa.Table.from_arrays(
                [reader.read_column(sub, n_rows) for sub in subs], names=names
            )
            batches = [
                full.slice(g0 * stride, min(glen * stride, n_rows - g0 * stride))
                for g0, glen in _runs(sel)
            ]
            batches = [b for t in batches for b in t.to_batches()]
        tbl = pa.Table.from_batches(batches)
        return tbl.combine_chunks().to_batches()[0]

    def read_stripe_batches(self, i: int, columns: list[str] | None = None,
                            batch_rows: int = 65536,
                            row_groups: list[int] | None = None):
        """Iterate one stripe as RecordBatches of ≤ ~batch_rows rows (the
        reference's bounded-batch pull loop, src/reader.rs:17-27 applied
        at row-group granularity). Selective reads (row_groups set) decode
        positionally so memory is bounded by the covering groups; a FULL
        read decodes the stripe in one pass per column and slices — the
        per-group position parsing and restarted partial decompressions
        are pure overhead when every group is wanted anyway, and memory is
        already bounded by the stripe (the format's sizing unit)."""
        stride = self.tail.footer.row_index_stride
        if row_groups is not None and stride <= 0:
            raise OrcBoundsError("row_groups given but the file has no rowIndexStride")
        reader, stripe = self._open_stripe(i, columns)
        names, subs = self._select(columns)
        n_rows = stripe.number_of_rows
        if row_groups is not None and stride > 0 and stripe.index_length > 0:
            n_groups = -(-n_rows // stride)
            sel = sorted({int(g) for g in row_groups})
            if not sel:
                return
            gpb = max(1, batch_rows // stride)
            try:
                yield from self._decode_group_runs(reader, stripe, names, subs, sel, gpb)
                return
            except RowIndexUnsupported:
                pass
        full = pa.Table.from_arrays(
            [reader.read_column(sub, n_rows) for sub in subs], names=names
        )
        if row_groups is not None and stride > 0:
            sel = sorted({int(g) for g in row_groups})
            parts = [
                full.slice(g0 * stride, min(glen * stride, n_rows - g0 * stride))
                for g0, glen in _runs(sel)
            ]
            if not parts:
                return
            full = pa.concat_tables(parts)
        yield from full.to_batches(max_chunksize=batch_rows)

    def _read_index_region(self, i: int):
        """(row_index, bloom_index) for stripe i from the index region
        alone — no data bytes touched. Parsed results are cached per
        stripe (see __init__) so conjunctive predicates pay one read."""
        if i in self._index_cache:
            return self._index_cache[i]
        out = self._read_index_region_uncached(i)
        if len(self._index_cache) >= self._index_cache_cap:
            self._index_cache.pop(next(iter(self._index_cache)))
        self._index_cache[i] = out
        return out

    def _read_index_region_uncached(self, i: int):
        stripe = self.tail.footer.stripes[i]
        if stripe.index_length == 0:
            return {}, {}
        idx = self.source.read_at(stripe.offset, stripe.index_length)
        sf_raw = self.source.read_at(
            stripe.offset + stripe.index_length + stripe.data_length,
            stripe.footer_length,
        )
        sfooter = proto.StripeFooter.parse(orc_stream_decompress(sf_raw, self.codec))
        rows: dict[int, list[proto.RowIndexEntry]] = {}
        blooms: dict[int, list] = {}
        pos = 0
        for s in sfooter.streams:
            if pos >= stripe.index_length:
                break
            if s.kind == "ROW_INDEX":
                rows[s.column] = proto.parse_row_index(
                    orc_stream_decompress(idx[pos : pos + s.length], self.codec)
                )
            elif s.kind in ("BLOOM_FILTER", "BLOOM_FILTER_UTF8"):
                from orc_rs_spark.kernels.orc_bloom import OrcBloom

                raw = orc_stream_decompress(idx[pos : pos + s.length], self.codec)
                blooms[s.column] = [
                    OrcBloom.from_proto(proto.decode_fields(e))
                    for e in proto.decode_fields(raw).get(1, [])
                ]
            pos += s.length
        return rows, blooms

    def read_row_index(self, i: int) -> dict[int, list[proto.RowIndexEntry]]:
        """Parse stripe i's ROW_INDEX streams from the index region alone
        (no data bytes touched) — for planning-time group pruning."""
        return self._read_index_region(i)[0]

    def read_bloom_index(self, i: int) -> dict[int, list]:
        """col -> per-group OrcBloom filters (BLOOM_FILTER_UTF8 / legacy
        BLOOM_FILTER streams) — the index the reference validates but
        never probes (src/stripe.rs:209-219)."""
        return self._read_index_region(i)[1]

    def prune_row_groups(self, i: int, column: str, lo, hi) -> list[int] | None:
        """Row-group ids in stripe i whose [min, max] for ``column``
        overlaps [lo, hi]; None when the file carries no usable index
        (caller decodes everything). Point predicates (lo == hi)
        additionally probe the column's bloom filters when present —
        stats keep a group whose RANGE covers the value, the bloom drops
        it unless the value was (probably) actually written."""
        stride = self.tail.footer.row_index_stride
        if stride <= 0:
            return None
        stripe = self.tail.footer.stripes[i]
        n_groups = -(-stripe.number_of_rows // stride)
        col_id = resolve_column_path(self.tail.footer.types, column)
        if col_id is None:
            return None
        try:
            rows, blooms = self._read_index_region(i)
        except ValueError:
            return None
        entries = rows.get(col_id)
        if not entries or len(entries) != n_groups:
            return None
        keep = [
            g for g, e in enumerate(entries)
            if e.statistics is None or _stats_overlap(e.statistics, lo, hi)
        ]
        col_blooms = blooms.get(col_id)
        if lo is not None and lo == hi and col_blooms is not None and len(col_blooms) == n_groups:
            kind = self.tail.footer.types[col_id].kind
            keep = [
                g for g in keep
                if col_blooms[g] is None or _bloom_test(col_blooms[g], lo, kind)
            ]
        return keep

    def prune_row_groups_in(self, i: int, column: str, values) -> list[int] | None:
        """IN-list variant of ``prune_row_groups``: row-group ids whose
        stats/blooms admit ANY of ``values`` (OR semantics — the pruning
        shape of a semi-join pushdown: collect a small dimension's keys,
        probe them all against one parse of the stripe's index). The
        index region is read once for the whole list."""
        stride = self.tail.footer.row_index_stride
        if stride <= 0:
            return None
        vals = list(values)
        if not vals:
            return []
        stripe = self.tail.footer.stripes[i]
        n_groups = -(-stripe.number_of_rows // stride)
        col_id = resolve_column_path(self.tail.footer.types, column)
        if col_id is None:
            return None
        try:
            rows, blooms = self._read_index_region(i)
        except ValueError:
            return None
        entries = rows.get(col_id)
        if not entries or len(entries) != n_groups:
            return None
        keep = [
            g for g, e in enumerate(entries)
            if e.statistics is None
            or any(_stats_overlap(e.statistics, v, v) for v in vals)
        ]
        col_blooms = blooms.get(col_id)
        if col_blooms is not None and len(col_blooms) == n_groups:
            kind = self.tail.footer.types[col_id].kind
            keep = [
                g for g in keep
                if col_blooms[g] is None
                or any(_bloom_test(col_blooms[g], v, kind) for v in vals)
            ]
        return keep

    def prune_row_groups_null(self, i: int, column: str, want_null: bool) -> list[int] | None:
        """Row-group ids that MAY hold a NULL (``want_null=True``, an
        IS NULL predicate) or a non-NULL (``want_null=False``,
        IS NOT NULL) for ``column``. ORC group statistics carry both
        signals: hasNull=False proves no NULLs, numberOfValues==0 proves
        nothing BUT NULLs. None when no usable index exists."""
        stride = self.tail.footer.row_index_stride
        if stride <= 0:
            return None
        stripe = self.tail.footer.stripes[i]
        n_groups = -(-stripe.number_of_rows // stride)
        col_id = resolve_column_path(self.tail.footer.types, column)
        if col_id is None:
            return None
        try:
            rows, _blooms = self._read_index_region(i)
        except ValueError:
            return None
        entries = rows.get(col_id)
        if not entries or len(entries) != n_groups:
            return None
        keep = []
        for g, e in enumerate(entries):
            st = e.statistics
            if st is None:
                keep.append(g)
            elif want_null:
                if st.has_null is None or st.has_null:
                    keep.append(g)
            else:
                if st.number_of_values is None or st.number_of_values > 0:
                    keep.append(g)
        return keep

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
