"""Snappy and LZ4 *block* decompressors, pure Python from the public format
specs (no snappy/lz4 library exists in this container; same spirit as
building RLEv2 patched-base from spec).

- Snappy raw/block format: google/snappy format_description.txt — varint
  uncompressed length preamble, then a tag stream of literals and
  back-references (1/2/4-byte offsets).
- LZ4 block format: lz4/lz4 lz4_Block_format.md — token byte with literal
  and match-length nibbles (15 => 255-extension bytes), 2-byte LE offset,
  minimum match 4, overlap-copy allowed.

These are decode-only (the reference is decode-only for these codecs too:
/root/reference/src/compression.rs:150-193). Throughput is Python-loop
bound (~tens of MB/s) — fine for footers and test-scale stripes; the
production encode path of this engine uses zlib where a C implementation
exists in the stdlib.
"""

from __future__ import annotations


def snappy_decompress(data: bytes) -> bytes:
    """Decompress one snappy block (raw format, not the framing format)."""
    buf = memoryview(data)
    # preamble: uncompressed length, unsigned LEB128
    ulen = 0
    shift = 0
    pos = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy: truncated length preamble")
        b = buf[pos]
        pos += 1
        ulen |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            l = tag >> 2
            if l < 60:
                length = l + 1
            else:
                nb = l - 59  # 1..4 extra length bytes, little-endian
                if pos + nb > n:
                    raise ValueError("snappy: truncated literal length")
                length = int.from_bytes(buf[pos : pos + nb], "little") + 1
                pos += nb
            if pos + length > n:
                raise ValueError("snappy: truncated literal")
            out += buf[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            if pos >= n:
                raise ValueError("snappy: truncated copy1")
            offset = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy2")
            offset = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy4")
            offset = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: invalid copy offset")
        start = len(out) - offset
        if offset >= length:
            out += out[start : start + length]
        else:  # overlapping copy replicates the window
            for i in range(length):
                out.append(out[start + i])
    if len(out) != ulen:
        raise ValueError(f"snappy: expected {ulen} bytes, produced {len(out)}")
    return bytes(out)


def lz4_block_decompress(data: bytes, max_size: int | None = None) -> bytes:
    """Decompress one LZ4 block (block format, no frame header)."""
    buf = memoryview(data)
    out = bytearray()
    pos = 0
    n = len(buf)
    while pos < n:
        token = buf[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = buf[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4: truncated literals")
        out += buf[pos : pos + lit_len]
        pos += lit_len
        if pos >= n:  # last sequence: literals only, no match
            break
        if pos + 2 > n:
            raise ValueError("lz4: truncated offset")
        offset = int.from_bytes(buf[pos : pos + 2], "little")
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: invalid offset")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = buf[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if offset >= match_len:
            out += out[start : start + match_len]
        else:
            for i in range(match_len):
                out.append(out[start + i])
        if max_size is not None and len(out) > max_size:
            raise ValueError("lz4: output exceeds declared size")
    return bytes(out)
