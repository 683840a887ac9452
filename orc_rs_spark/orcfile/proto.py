"""Minimal protobuf wire-format decoder + the ORC tail messages.

The ORC metadata layout is public (Apache ORC spec; mirrored in the
reference at /root/reference/src/proto/orc_proto.proto). Rather than
depend on a protobuf library, this decodes the wire format directly:
a message is a sequence of (field_number << 3 | wire_type) keys with
varint (0), fixed64 (1), length-delimited (2), or fixed32 (5) payloads.
Only the fields the reader needs are interpreted; unknown fields are
skipped, exactly as protobuf requires for forward compatibility.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from orc_rs_spark.orcfile.errors import OrcFormatError


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise OrcFormatError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise OrcFormatError("varint too long")


def _zigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def decode_fields(buf: bytes | memoryview) -> dict[int, list]:
    """Wire-decode one message: field number -> list of raw values
    (int for varint/fixed, memoryview for length-delimited)."""
    mv = memoryview(buf)
    out: dict[int, list] = {}
    pos = 0
    n = len(mv)
    while pos < n:
        key, pos = _read_varint(mv, pos)
        fnum, wtype = key >> 3, key & 7
        if wtype == 0:
            val, pos = _read_varint(mv, pos)
        elif wtype == 1:
            val = int.from_bytes(mv[pos : pos + 8], "little")
            pos += 8
        elif wtype == 2:
            ln, pos = _read_varint(mv, pos)
            val = mv[pos : pos + ln]
            pos += ln
        elif wtype == 5:
            val = int.from_bytes(mv[pos : pos + 4], "little")
            pos += 4
        else:
            raise OrcFormatError(f"unsupported wire type {wtype}")  # CorruptedProtobuf
        out.setdefault(fnum, []).append(val)
    return out


def _one(fields: dict, num: int, default=None):
    v = fields.get(num)
    return v[-1] if v else default


def _packed_varints(fields: dict, num: int) -> list[int]:
    """Packed repeated varint field (also accepts the unpacked form)."""
    out: list[int] = []
    for item in fields.get(num, []):
        if isinstance(item, int):
            out.append(item)
        else:
            pos = 0
            while pos < len(item):
                v, pos = _read_varint(item, pos)
                out.append(v)
    return out


COMPRESSION_KINDS = {0: "none", 1: "zlib", 2: "snappy", 3: "lzo", 4: "lz4", 5: "zstd"}

TYPE_KINDS = {
    0: "boolean", 1: "byte", 2: "short", 3: "int", 4: "long",
    5: "float", 6: "double", 7: "string", 8: "binary", 9: "timestamp",
    10: "list", 11: "map", 12: "struct", 13: "union", 14: "decimal",
    15: "date", 16: "varchar", 17: "char", 18: "timestamp_instant",
}

STREAM_KINDS = {
    0: "PRESENT", 1: "DATA", 2: "LENGTH", 3: "DICTIONARY_DATA",
    4: "DICTIONARY_COUNT", 5: "SECONDARY", 6: "ROW_INDEX", 7: "BLOOM_FILTER",
    8: "BLOOM_FILTER_UTF8",
}

ENCODING_KINDS = {0: "DIRECT", 1: "DICTIONARY", 2: "DIRECT_V2", 3: "DICTIONARY_V2"}


@dataclass
class PostScript:
    footer_length: int
    compression: str
    compression_block_size: int
    version: tuple[int, int]
    metadata_length: int
    writer_version: int
    magic: str

    @classmethod
    def parse(cls, buf) -> "PostScript":
        f = decode_fields(buf)
        ver = _packed_varints(f, 4)
        return cls(
            footer_length=_one(f, 1, 0),
            compression=COMPRESSION_KINDS.get(_one(f, 2, 0), "unknown"),
            compression_block_size=_one(f, 3, 256 * 1024),
            version=(ver[0], ver[1]) if len(ver) == 2 else (0, 0),
            metadata_length=_one(f, 5, 0),
            writer_version=_one(f, 6, 0),
            magic=bytes(_one(f, 8000, b"")).decode("utf-8", "replace"),
        )


@dataclass
class OrcType:
    kind: str
    subtypes: list[int]
    field_names: list[str]
    maximum_length: int
    precision: int
    scale: int

    @classmethod
    def parse(cls, buf) -> "OrcType":
        f = decode_fields(buf)
        return cls(
            kind=TYPE_KINDS.get(_one(f, 1, 0), "unknown"),
            subtypes=_packed_varints(f, 2),
            field_names=[bytes(x).decode("utf-8") for x in f.get(3, [])],
            maximum_length=_one(f, 4, 0),
            precision=_one(f, 5, 0),
            scale=_one(f, 6, 0),
        )


@dataclass
class StripeInformation:
    offset: int
    index_length: int
    data_length: int
    footer_length: int
    number_of_rows: int

    @classmethod
    def parse(cls, buf) -> "StripeInformation":
        f = decode_fields(buf)
        return cls(
            offset=_one(f, 1, 0),
            index_length=_one(f, 2, 0),
            data_length=_one(f, 3, 0),
            footer_length=_one(f, 4, 0),
            number_of_rows=_one(f, 5, 0),
        )


@dataclass
class ColumnStatistics:
    number_of_values: int | None
    has_null: bool | None
    int_min: int | None = None
    int_max: int | None = None
    int_sum: int | None = None
    double_min: float | None = None
    double_max: float | None = None
    double_sum: float | None = None
    string_min: str | None = None
    string_max: str | None = None
    string_sum: int | None = None
    binary_sum: int | None = None
    true_count: int | None = None
    date_min: int | None = None  # days since epoch
    date_max: int | None = None
    ts_min: int | None = None  # UTC milliseconds since epoch
    ts_max: int | None = None

    @classmethod
    def parse(cls, buf) -> "ColumnStatistics":
        import struct as _s

        f = decode_fields(buf)
        st = cls(
            number_of_values=_one(f, 1),
            has_null=bool(_one(f, 10)) if _one(f, 10) is not None else None,
        )
        if 2 in f:  # IntegerStatistics (sint64 zigzag)
            g = decode_fields(f[2][-1])
            st.int_min = _zigzag(_one(g, 1)) if 1 in g else None
            st.int_max = _zigzag(_one(g, 2)) if 2 in g else None
            st.int_sum = _zigzag(_one(g, 3)) if 3 in g else None
        if 3 in f:  # DoubleStatistics (fixed64 doubles)
            g = decode_fields(f[3][-1])
            for num, name in ((1, "double_min"), (2, "double_max"), (3, "double_sum")):
                if num in g:
                    setattr(st, name, _s.unpack("<d", int(_one(g, num)).to_bytes(8, "little"))[0])
        if 4 in f:  # StringStatistics
            g = decode_fields(f[4][-1])
            st.string_min = bytes(_one(g, 1)).decode("utf-8") if 1 in g else None
            st.string_max = bytes(_one(g, 2)).decode("utf-8") if 2 in g else None
            st.string_sum = _zigzag(_one(g, 3)) if 3 in g else None
        if 5 in f:  # BucketStatistics: count of true values
            g = decode_fields(f[5][-1])
            counts = _packed_varints(g, 1)
            st.true_count = counts[0] if counts else None
        if 7 in f:  # DateStatistics (sint32 days)
            g = decode_fields(f[7][-1])
            st.date_min = _zigzag(_one(g, 1)) if 1 in g else None
            st.date_max = _zigzag(_one(g, 2)) if 2 in g else None
        if 8 in f:  # BinaryStatistics
            g = decode_fields(f[8][-1])
            st.binary_sum = _zigzag(_one(g, 1)) if 1 in g else None
        if 9 in f:  # TimestampStatistics (sint64 millis; prefer the UTC pair)
            g = decode_fields(f[9][-1])
            lo = _one(g, 3, _one(g, 1))
            hi = _one(g, 4, _one(g, 2))
            st.ts_min = _zigzag(lo) if lo is not None else None
            st.ts_max = _zigzag(hi) if hi is not None else None
        return st


def stream_position_layout(col_kind: str, encoding: str) -> list[tuple[str, int]]:
    """Canonical per-column stream order and per-stream EXTRA position
    slots in a RowIndexEntry, mirroring the Apache ORC writers' position
    recording: every stream contributes its output position (1 slot
    uncompressed, 2 compressed), then RLE streams add one value-skip slot
    and bit-packed boolean streams add a byte-RLE pending slot plus a bit
    offset. Streams absent from the stripe contribute no slots."""
    if col_kind == "boolean":
        data = [("DATA", 2)]
    elif col_kind == "byte":
        data = [("DATA", 1)]
    elif col_kind in ("short", "int", "long", "date"):
        data = [("DATA", 1)]
    elif col_kind in ("float", "double"):
        data = [("DATA", 0)]
    elif col_kind in ("string", "varchar", "char", "binary"):
        if encoding.startswith("DICTIONARY"):
            data = [("DATA", 1)]
        else:
            data = [("DATA", 0), ("LENGTH", 1)]
    elif col_kind in ("timestamp", "timestamp_instant"):
        data = [("DATA", 1), ("SECONDARY", 1)]
    elif col_kind == "decimal":
        data = [("DATA", 0), ("SECONDARY", 1)]
    elif col_kind in ("list", "map"):
        data = [("LENGTH", 1)]
    elif col_kind == "struct":
        data = []
    elif col_kind == "union":
        data = [("DATA", 1)]
    else:
        raise ValueError(f"no position layout for ORC kind {col_kind!r}")
    return [("PRESENT", 2)] + data


@dataclass
class RowIndexEntry:
    """One row group's entry: stream positions + group column statistics
    (reference parse: /root/reference/src/stripe.rs:129-168; proto
    RowIndexEntry at src/proto/orc_proto.proto)."""

    positions: list[int]
    statistics: ColumnStatistics | None

    @classmethod
    def parse(cls, buf) -> "RowIndexEntry":
        f = decode_fields(buf)
        stats = f.get(2)
        return cls(
            positions=_packed_varints(f, 1),
            statistics=ColumnStatistics.parse(stats[-1]) if stats else None,
        )


def parse_row_index(buf) -> list[RowIndexEntry]:
    """RowIndex message: repeated RowIndexEntry entry = 1."""
    f = decode_fields(buf)
    return [RowIndexEntry.parse(x) for x in f.get(1, [])]


@dataclass
class Footer:
    header_length: int
    content_length: int
    stripes: list[StripeInformation]
    types: list[OrcType]
    number_of_rows: int
    statistics: list[ColumnStatistics]
    row_index_stride: int
    # user metadata KV pairs (Footer field 5, UserMetadataItem) — the
    # reference parses and exposes these via Reader::metadata
    # (src/tail.rs:22,100-104; src/reader.rs:52,148)
    metadata: dict[str, bytes] = None  # type: ignore[assignment]
    encrypted: bool = False

    @staticmethod
    def _parse_metadata(f: dict) -> dict[str, bytes]:
        out: dict[str, bytes] = {}
        for item in f.get(5, []):
            g = decode_fields(item)
            name = bytes(_one(g, 1, b"")).decode("utf-8")
            out[name] = bytes(_one(g, 2, b""))
        return out

    @classmethod
    def parse(cls, buf) -> "Footer":
        f = decode_fields(buf)
        return cls(
            header_length=_one(f, 1, 0),
            content_length=_one(f, 2, 0),
            stripes=[StripeInformation.parse(x) for x in f.get(3, [])],
            types=[OrcType.parse(x) for x in f.get(4, [])],
            number_of_rows=_one(f, 6, 0),
            statistics=[ColumnStatistics.parse(x) for x in f.get(7, [])],
            row_index_stride=_one(f, 8, 0),
            metadata=cls._parse_metadata(f),
            # Footer.encryption = 10 (column encryption); reject like the
            # reference (/root/reference/src/tail.rs:86-88) instead of
            # failing later with an opaque stream-parse error
            encrypted=10 in f,
        )


@dataclass
class Stream:
    kind: str
    column: int
    length: int

    @classmethod
    def parse(cls, buf) -> "Stream":
        f = decode_fields(buf)
        return cls(
            kind=STREAM_KINDS.get(_one(f, 1, 0), f"UNKNOWN_{_one(f, 1, 0)}"),
            column=_one(f, 2, 0),
            length=_one(f, 3, 0),
        )


@dataclass
class ColumnEncoding:
    kind: str
    dictionary_size: int

    @classmethod
    def parse(cls, buf) -> "ColumnEncoding":
        f = decode_fields(buf)
        return cls(
            kind=ENCODING_KINDS.get(_one(f, 1, 0), "DIRECT"),
            dictionary_size=_one(f, 2, 0),
        )


@dataclass
class StripeFooter:
    streams: list[Stream]
    columns: list[ColumnEncoding]
    writer_timezone: str = ""

    @classmethod
    def parse(cls, buf) -> "StripeFooter":
        f = decode_fields(buf)
        tz = _one(f, 3)
        return cls(
            streams=[Stream.parse(x) for x in f.get(1, [])],
            columns=[ColumnEncoding.parse(x) for x in f.get(2, [])],
            writer_timezone=bytes(tz).decode("utf-8") if tz is not None else "",
        )
