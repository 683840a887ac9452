"""ORC-style block compression framing + the pluggable codec registry.

Wire format parity: 3-byte little-endian header = (block_length << 1) |
is_original, i.e. 23-bit length + 1 LSB "stored uncompressed" escape so
incompressible blocks never grow (reference decode:
/root/reference/src/compression.rs:362-382; format doc :214-239). The
reference's zlib codec is raw deflate with no zlib header
(/root/reference/src/compression.rs:195-212) — mirrored here with
``zlib.compressobj(wbits=-15)``.

Codec registry (mirrors the reference's pluggable codec table,
/root/reference/src/compression.rs:82-148): NATIVE libraries are probed at
import (python-snappy, lz4, zstandard, cramjam) and preferred when
present; the from-spec pure-Python kernels (kernels/lzblocks.py,
kernels/zstd.py, kernels/zstd_enc.py) are the always-available fallback,
so every ORC codec tag encodes AND decodes in any environment. This
container has no native codec libraries, so the fallbacks carry the whole
load; on a real cluster image with `zstandard` installed the same files
decode ~100x faster with zero code change.
"""

from __future__ import annotations

import zlib

MAX_BLOCK = (1 << 23) - 1
# snappy/lz4/zstd blocks are capped at the declared compressionBlockSize
# (256 KiB, writer.py postscript field 3) — also bounds the vectorized
# matcher's working set per block
LZ_BLOCK = 256 * 1024


def _deflate(data: bytes, level: int = 6) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def _inflate(data: bytes) -> bytes:
    return zlib.decompress(data, wbits=-15)


def _zstd_frame_content_size(data: bytes) -> int | None:
    """Frame_Content_Size from a zstd frame header (RFC 8878 §3.1.1), or
    None when the writer omitted it (then only streaming decode knows)."""
    if len(data) < 6 or int.from_bytes(data[:4], "little") != 0xFD2FB528:
        return None
    fhd = data[4]
    fcs_flag = fhd >> 6
    single = (fhd >> 5) & 1
    did_size = (0, 1, 2, 4)[fhd & 3]
    pos = 5 + (0 if single else 1) + did_size
    if fcs_flag == 0:
        return data[pos] if single else None
    n = (0, 2, 4, 8)[fcs_flag]
    v = int.from_bytes(data[pos : pos + n], "little")
    return v + 256 if fcs_flag == 1 else v


# codec-appropriate defaults when the caller doesn't pick a level: zlib 6
# (stdlib default-ish, matches the historical output bytes), zstd 3 (the
# ORC Java writer / Spark default — level 1, pyarrow's own default, costs
# ~4% size on token data for little speed gain at these block sizes)
DEFAULT_LEVELS = {"zlib": 6, "zstd": 3}


def _build_registry():
    """(encoders, decoders, native_names) — native lib when importable,
    from-spec kernel otherwise. Import-gated exactly once. Every encoder
    takes (data, level); codecs without a level knob ignore it."""
    from orc_rs_spark.kernels import lzblocks

    from orc_rs_spark.kernels import lzo as lzo_kernel

    enc = {"zlib": lambda b, lv: _deflate(b, lv),
           "snappy": lambda b, lv: lzblocks.snappy_compress(b),
           "lz4": lambda b, lv: lzblocks.lz4_block_compress(b),
           # lzo: from-spec only (no container lib bundles lzo1x; the
           # JVM's pure-Java aircompressor is the cross-validator in
           # tests/test_lzo.py). The REFERENCE cannot read kind-3 files
           # at all (no decode arm in src/compression.rs for
           # orc_proto.proto:386) — this closes that gap in both
           # directions.
           "lzo": lambda b, lv: lzo_kernel.lzo1x_compress(b)}
    dec = {"zlib": lambda b: _inflate(b), "snappy": lzblocks.snappy_decompress,
           "lz4": lzblocks.lz4_block_decompress,
           "lzo": lzo_kernel.lzo1x_decompress}
    native: dict[str, str] = {}

    def _zstd_dec_fallback(b: bytes) -> bytes:
        from orc_rs_spark.kernels.zstd import zstd_decompress

        return zstd_decompress(b)

    def _zstd_enc_fallback(b: bytes, lv: int) -> bytes:
        # the from-spec encoder has one strategy; level is advisory only
        from orc_rs_spark.kernels.zstd_enc import zstd_compress

        return zstd_compress(b)

    dec["zstd"] = _zstd_dec_fallback
    enc["zstd"] = _zstd_enc_fallback

    # pyarrow tier: Arrow bundles real C codecs (snappy, lz4_raw, zstd)
    # and is already a hard dependency of this package, so this tier is
    # effectively always on — ~100x the from-spec kernels' throughput.
    # Arrow's decompress() needs the EXACT uncompressed size: snappy
    # blocks self-describe it (varint preamble), zstd frames carry
    # Frame_Content_Size when the writer set it (ours do; unknown-size
    # streaming frames fall back to the from-spec decoder), LZ4 blocks
    # carry nothing — lz4 decode stays from-spec.
    try:
        import pyarrow as _pa

        if _pa.Codec.is_available("snappy"):
            _snappy_c = _pa.Codec("snappy")

            def _pa_snappy_dec(b: bytes) -> bytes:
                ulen = 0
                shift = 0
                pos = 0
                while True:
                    if pos >= len(b):
                        raise ValueError("snappy: truncated length preamble")
                    byte = b[pos]
                    pos += 1
                    ulen |= (byte & 0x7F) << shift
                    if not byte & 0x80:
                        break
                    shift += 7
                return bytes(_snappy_c.decompress(b, decompressed_size=ulen))

            enc["snappy"] = lambda b, lv: bytes(_snappy_c.compress(b))
            dec["snappy"] = _pa_snappy_dec
            native["snappy"] = "pyarrow"
        if _pa.Codec.is_available("lz4_raw"):
            _lz4_c = _pa.Codec("lz4_raw")

            def _pa_lz4_dec(b: bytes) -> bytes:
                # Arrow lz4_raw demands the EXACT output size, which LZ4
                # block framing doesn't carry — a header-only Python scan
                # (skip literals, sum lengths) recovers it, then libarrow
                # moves every byte at C speed. Closes the last
                # Python-bound read path flagged in round 5.
                size = lzblocks.lz4_block_size(b)
                return bytes(_lz4_c.decompress(b, decompressed_size=size))

            enc["lz4"] = lambda b, lv: bytes(_lz4_c.compress(b))
            dec["lz4"] = _pa_lz4_dec
            native["lz4"] = "pyarrow (decode via size-scan)"
        if _pa.Codec.is_available("zstd"):
            _zstd_c = _pa.Codec("zstd")
            _zstd_by_level: dict[int, object] = {}

            def _pa_zstd_enc(b: bytes, lv: int) -> bytes:
                c = _zstd_by_level.get(lv)
                if c is None:
                    c = _zstd_by_level.setdefault(
                        lv, _pa.Codec("zstd", compression_level=lv))
                return bytes(c.compress(b))

            def _pa_zstd_dec(b: bytes) -> bytes:
                size = _zstd_frame_content_size(b)
                if size is None:  # unknown-size frame: from-spec decoder
                    return _zstd_dec_fallback(b)
                return bytes(_zstd_c.decompress(b, decompressed_size=size))

            enc["zstd"] = _pa_zstd_enc
            dec["zstd"] = _pa_zstd_dec
            native["zstd"] = "pyarrow"
    except ImportError:
        pass

    try:
        # system liblz4 via ctypes: LZ4_decompress_safe returns the ACTUAL
        # decompressed size, so unlike Arrow's lz4_raw it needs no
        # exact-size preamble — this drops the Python header scan entirely
        # (272 MB/s vs 55 MB/s size-scan+Arrow vs 10 MB/s from-spec on the
        # token/text mix; SCALE.md round-6 entry). Output capacity is the
        # format's 8 MiB block ceiling (MAX_BLOCK); the buffer is
        # thread-local because Spark's local mode can decode from many
        # driver threads at once.
        import ctypes as _ct
        import ctypes.util as _ctu
        import threading as _threading

        _lz4_path = _ctu.find_library("lz4")
        if _lz4_path is None:
            raise ImportError("no system liblz4")
        _lz4_lib = _ct.CDLL(_lz4_path)
        _lz4_lib.LZ4_decompress_safe.restype = _ct.c_int
        _lz4_lib.LZ4_decompress_safe.argtypes = [
            _ct.c_char_p, _ct.c_char_p, _ct.c_int, _ct.c_int]
        _lz4_tls = _threading.local()

        def _ct_lz4_dec(b: bytes) -> bytes:
            buf = getattr(_lz4_tls, "buf", None)
            if buf is None:
                buf = _lz4_tls.buf = _ct.create_string_buffer(MAX_BLOCK)
            n = _lz4_lib.LZ4_decompress_safe(b, buf, len(b), MAX_BLOCK)
            if n < 0:
                # rc<0 is EITHER corruption OR output > the 8 MiB working
                # buffer (a foreign writer may declare a bigger
                # compressionBlockSize — the 23-bit header cap bounds the
                # COMPRESSED chunk only). Disambiguate with the exact
                # header-only size scan before declaring corruption.
                size = lzblocks.lz4_block_size(b)  # raises if truncated
                if size <= MAX_BLOCK:
                    raise ValueError("lz4: corrupt block (liblz4 rc %d)" % n)
                big = _ct.create_string_buffer(size)
                n = _lz4_lib.LZ4_decompress_safe(b, big, len(b), size)
                if n < 0:
                    raise ValueError("lz4: corrupt block (liblz4 rc %d)" % n)
                return _ct.string_at(big, n)
            return _ct.string_at(buf, n)

        # self-check before trusting the symbol: round-trip one block
        _probe = lzblocks.lz4_block_compress(b"liblz4 probe " * 30)
        if _ct_lz4_dec(_probe) != b"liblz4 probe " * 30:
            raise ImportError("liblz4 probe mismatch")
        dec["lz4"] = _ct_lz4_dec
        native["lz4"] = ("liblz4 (decode); " + native["lz4"]
                         if "lz4" in native else "liblz4 (decode)")
    except (ImportError, OSError, AttributeError):
        pass

    try:  # python-snappy (C bindings)
        import snappy as _snappy  # type: ignore

        enc["snappy"] = lambda b, lv: _snappy.compress(b)
        dec["snappy"] = _snappy.decompress
        native["snappy"] = "python-snappy"
    except ImportError:
        pass
    try:  # lz4.block matches ORC's framed block format (store_size=False)
        import lz4.block as _lz4b  # type: ignore

        enc["lz4"] = lambda b, lv: _lz4b.compress(b, store_size=False)
        dec["lz4"] = lambda b: _lz4b.decompress(b, uncompressed_size=MAX_BLOCK)
        native["lz4"] = "lz4"
    except ImportError:
        pass
    try:
        import zstandard as _zstd  # type: ignore

        _zcs: dict[int, object] = {}

        def _zstd_lib_enc(b: bytes, lv: int) -> bytes:
            c = _zcs.get(lv)
            if c is None:
                c = _zcs.setdefault(lv, _zstd.ZstdCompressor(
                    level=lv, write_checksum=False, write_content_size=True))
            return c.compress(b)

        _zd = _zstd.ZstdDecompressor()
        enc["zstd"] = _zstd_lib_enc
        dec["zstd"] = lambda b: _zd.decompress(b, max_output_size=MAX_BLOCK)
        native["zstd"] = "zstandard"
    except ImportError:
        try:  # cramjam bundles rust codecs for all three
            import cramjam  # type: ignore

            enc["zstd"] = lambda b, lv: bytes(cramjam.zstd.compress(b))
            dec["zstd"] = lambda b: bytes(cramjam.zstd.decompress(b))
            native["zstd"] = "cramjam"
        except ImportError:
            pass
    return enc, dec, native


_ENCODERS, _DECODERS, NATIVE_CODECS = _build_registry()
CODECS = ("none", "zlib", "snappy", "lzo", "lz4", "zstd")


def block_compress(data: bytes, codec: str = "zlib", level: int | None = None,
                   max_block: int | None = None) -> bytes:
    """Frame ``data`` into compressed blocks; keeps originals when smaller.

    ``level`` is the codec's own compression level (zlib 1-9, zstd 1-22);
    ``None`` picks the codec default (DEFAULT_LEVELS — zlib 6, zstd 3);
    snappy/lz4 have no level knob and ignore it. ``max_block`` caps the
    DECOMPRESSED block size below the format's 8 MiB header limit — pass
    the file's declared compressionBlockSize when appending sections to a
    foreign file (readers may size their buffers from that declaration).
    All four ORC codecs have REAL encoders here (zlib via stdlib;
    snappy/lz4 from-spec in kernels/lzblocks.py; zstd from-spec in
    kernels/zstd_enc.py — native libraries preferred when importable);
    any block an encoder fails to shrink falls back to the is-original
    escape, so output never grows beyond 3 bytes per block."""
    if codec == "none":
        return data
    if codec not in _ENCODERS:
        raise ValueError(f"codec {codec!r} unavailable in this environment")
    if level is None:
        level = DEFAULT_LEVELS.get(codec, 0)
    cap = MAX_BLOCK if codec == "zlib" else LZ_BLOCK
    if max_block is not None:
        cap = min(cap, max_block)
    encode = _ENCODERS[codec]
    out: list = []
    for i in range(0, len(data), cap):
        block = data[i : i + cap]
        comp = encode(block, level)
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
    if codec not in _DECODERS:
        raise ValueError(f"codec {codec!r} unavailable in this environment")
    decode = _DECODERS[codec]
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
        out.append(block if header & 1 else decode(bytes(block)))
        pos += length
    return b"".join(out)
