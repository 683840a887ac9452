"""ORC-style block compression framing + zlib (raw deflate).

Wire format parity: 3-byte little-endian header = (block_length << 1) |
is_original, i.e. 23-bit length + 1 LSB "stored uncompressed" escape so
incompressible blocks never grow (reference decode:
/root/reference/src/compression.rs:362-382; format doc :214-239). The
reference's zlib codec is raw deflate with no zlib header
(/root/reference/src/compression.rs:195-212) — mirrored here with
``zlib.compressobj(wbits=-15)``. Only zlib is available in this
environment; the codec registry is pluggable for zstd/snappy/lz4 when
their libraries exist (import-gated).
"""

from __future__ import annotations

import zlib

MAX_BLOCK = (1 << 23) - 1


def _deflate(data: bytes, level: int = 6) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def _inflate(data: bytes) -> bytes:
    return zlib.decompress(data, wbits=-15)


def block_compress(data: bytes, codec: str = "zlib", level: int = 6,
                   max_block: int | None = None) -> bytes:
    """Frame ``data`` into compressed blocks; keeps originals when smaller.

    ``max_block`` caps the DECOMPRESSED block size below the format's
    8 MiB header limit — pass the file's declared compressionBlockSize
    when appending sections to a foreign file (readers may size their
    buffers from that declaration). For snappy/lz4/zstd (decodable here
    but with no encoder in this environment) every block is emitted via
    the is-original escape, which is codec-independent in the ORC
    framing — byte-valid output, no size win."""
    if codec == "none":
        return data
    if codec not in ("zlib", "snappy", "lz4", "zstd"):
        raise ValueError(f"codec {codec!r} unavailable in this environment")
    cap = MAX_BLOCK if max_block is None else min(MAX_BLOCK, max_block)
    out: list = []
    for i in range(0, len(data), cap):
        block = data[i : i + cap]
        comp = _deflate(block, level) if codec == "zlib" else block
        if len(comp) < len(block):
            header = (len(comp) << 1) | 0
            out.append(header.to_bytes(3, "little"))
            out.append(comp)
        else:
            header = (len(block) << 1) | 1
            out.append(header.to_bytes(3, "little"))
            out.append(block)
    return b"".join(out)


def block_decompress(data: bytes, codec: str = "zlib") -> bytes:
    if codec == "none":
        return data
    if codec != "zlib":
        raise ValueError(f"codec {codec!r} unavailable in this environment")
    out: list = []
    pos = 0
    n = len(data)
    while pos < n:
        header = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        length = header >> 1
        block = data[pos : pos + length]
        if len(block) != length:
            raise ValueError("block stream truncated")
        out.append(block if header & 1 else _inflate(block))
        pos += length
    return b"".join(out)
