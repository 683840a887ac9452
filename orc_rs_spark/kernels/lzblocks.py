"""Snappy and LZ4 *block* codecs, pure Python/NumPy from the public format
specs (no snappy/lz4 library exists in this container; same spirit as
building RLEv2 patched-base from spec).

- Snappy raw/block format: google/snappy format_description.txt — varint
  uncompressed length preamble, then a tag stream of literals and
  back-references (1/2/4-byte offsets).
- LZ4 block format: lz4/lz4 lz4_Block_format.md — token byte with literal
  and match-length nibbles (15 => 255-extension bytes), 2-byte LE offset,
  minimum match 4, overlap-copy allowed; last 5 bytes are literals and the
  last match starts >= 12 bytes before the end.

The reference is decode-only for these codecs
(/root/reference/src/compression.rs:150-193); this module carries both
directions. Decoders are Python-loop bound (~tens of MB/s — fine for
footers and test-scale stripes); ENCODERS share the vectorized greedy
matcher in kernels/lz77.py (snappy's own single-probe hash heuristic,
NumPy-extended matches, one Python iteration per emitted token).
"""

from __future__ import annotations

from orc_rs_spark.kernels.lz77 import greedy_matches


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
    """Decompress one LZ4 block (block format, no frame header).

    Vectorized (round-6): a header-only Python parse collects per-sequence
    (literal start/len, match offset/len) arrays without copying a byte,
    then NumPy does all the byte movement — literals land via one fancy-
    indexed gather, and match bytes resolve through POINTER DOUBLING on a
    reference array (ref[i] = i - offset for match bytes, i for literals;
    log2(longest copy chain) full-array gathers instead of a Python loop
    per sequence). This is the batch-header-walk pattern rlev2.py uses,
    applied to LZ4 tokens: the native Arrow path cannot cover lz4 decode
    because ``lz4_raw`` needs the exact decompressed size and ORC block
    framing only carries the compressed length (reference framing doc,
    /root/reference/src/compression.rs:214-239). Tiny blocks keep the
    scalar path (array setup would dominate)."""
    if len(data) >= 512:
        return _lz4_block_decompress_np(data, max_size)
    return _lz4_block_decompress_scalar(data, max_size)


def _lz4_block_decompress_scalar(data: bytes, max_size: int | None = None) -> bytes:
    """Reference scalar decoder (also the fuzz cross-check for the
    vectorized path)."""
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


def lz4_block_size(data: bytes) -> int:
    """Exact decompressed size of one LZ4 block from a header-only walk.

    LZ4 block framing does not carry the output size and ORC's 3-byte
    block headers only carry the COMPRESSED length — this scan (skip
    literals, sum lengths, never copy a byte) recovers the exact size so
    a native one-shot decoder (Arrow's ``lz4_raw``, which requires it)
    can do all the byte movement at C speed. ~3x cheaper than a full
    Python decode; the blockcomp registry pairs it with pyarrow for the
    production lz4 read path."""
    mb = bytes(data)
    n = len(mb)
    pos = 0
    out_len = 0
    while pos < n:
        token = mb[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = mb[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        pos += lit_len
        if pos > n:
            raise ValueError("lz4: truncated literals")
        out_len += lit_len
        if pos >= n:
            break
        pos += 2  # match offset (validated by the real decoder)
        if pos > n:
            raise ValueError("lz4: truncated offset")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = mb[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        out_len += match_len
    return out_len


def _lz4_block_decompress_np(data: bytes, max_size: int | None = None) -> bytes:
    """NumPy LZ4 block decode: copy-free header parse, then bulk gathers."""
    import numpy as np

    mb = bytes(data)
    n = len(mb)
    pos = 0
    out_len = 0
    # per-sequence parse results (the ONLY per-sequence Python work)
    ls: list[int] = []  # literal start in src
    ll: list[int] = []  # literal length
    mo: list[int] = []  # match offset (0 on the final literals-only seq)
    ml: list[int] = []  # match length (0 on the final literals-only seq)
    while pos < n:
        token = mb[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = mb[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4: truncated literals")
        ls.append(pos)
        ll.append(lit_len)
        pos += lit_len
        out_len += lit_len
        if pos >= n:  # last sequence: literals only, no match
            mo.append(0)
            ml.append(0)
            break
        if pos + 2 > n:
            raise ValueError("lz4: truncated offset")
        offset = mb[pos] | (mb[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > out_len:
            raise ValueError("lz4: invalid offset")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = mb[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        mo.append(offset)
        ml.append(match_len)
        out_len += match_len
        if max_size is not None and out_len > max_size:
            raise ValueError("lz4: output exceeds declared size")
    if out_len == 0:
        return b""
    return resolve_copy_sequences(mb, ls, ll, mo, ml, out_len)


def resolve_copy_sequences(mb: bytes, ls: list, ll: list, mo: list, ml: list,
                           out_len: int) -> bytes:
    """Materialize LZ77-family output from parsed sequences, NumPy-only.

    Shared back-end for the lz4 and lzo fallback decoders: each sequence
    is (literal src start ``ls``, literal length ``ll``, then a back-copy
    of ``ml`` bytes from ``mo`` back; 0 disables either part). All byte
    movement happens in bulk gathers — literals via one fancy-indexed
    gather, match bytes via pointer doubling over a reference array with
    intra-match overlap chains collapsed arithmetically first."""
    import numpy as np

    lla = np.asarray(ll, dtype=np.int64)
    lsa = np.asarray(ls, dtype=np.int64)
    mla = np.asarray(ml, dtype=np.int64)
    moa = np.asarray(mo, dtype=np.int64)
    seq_end = np.cumsum(lla + mla)
    lit_dst = seq_end - (lla + mla)  # where each seq's literals start
    match_dst = lit_dst + lla  # where each seq's match bytes start

    src = np.frombuffer(mb, dtype=np.uint8)
    # literals: ranges -> flat indices, one gather-scatter pair
    tl = int(lla.sum())
    wl = np.arange(tl, dtype=np.int64) - np.repeat(np.cumsum(lla) - lla, lla)
    lit_src_idx = np.repeat(lsa, lla) + wl
    lit_dst_idx = np.repeat(lit_dst, lla) + wl
    # matches: every match byte references out position (self - offset);
    # literals are fixpoints. Pointer doubling collapses arbitrary copy
    # chains (including overlap/RLE chains) in log2(chain length) gathers.
    tm = int(mla.sum())
    wm = np.arange(tm, dtype=np.int64) - np.repeat(np.cumsum(mla) - mla, mla)
    mpos = np.repeat(match_dst, mla) + wm
    ref = np.arange(out_len, dtype=np.int64)
    rep_o = np.repeat(moa, mla)
    msrc = mpos - rep_o
    # overlap collapse: when offset < match_len the match copies its own
    # output (period = offset). Instead of a per-byte chain back through
    # the match (offset-1 RLE of a full 8 MiB block = a chain the length
    # of the block, ~23 doubling rounds), jump every overlapped byte
    # straight to the periodic pre-image BELOW the match start in one
    # arithmetic step: src = match_start - offset + (pos_in_match % offset).
    # Chain depth is then bounded by the SEQUENCE count, not byte count.
    ov = wm >= rep_o
    if ov.any():
        rep_md = np.repeat(match_dst, mla)
        msrc[ov] = rep_md[ov] - rep_o[ov] + wm[ov] % rep_o[ov]
    ref[mpos] = msrc
    r = ref
    while True:
        r2 = r.take(r)
        if np.array_equal(r2, r):
            break
        r = r2
    # every out position now maps to the literal position that feeds it;
    # litmap turns that into the source byte index
    litmap = np.empty(out_len, dtype=np.int64)
    litmap[lit_dst_idx] = lit_src_idx
    return src.take(litmap.take(r)).tobytes()


def _snappy_varint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _snappy_literal(out: bytearray, chunk: memoryview) -> None:
    l = len(chunk) - 1
    if l < 60:
        out.append(l << 2)
    elif l < (1 << 8):
        out.append(60 << 2)
        out += l.to_bytes(1, "little")
    elif l < (1 << 16):
        out.append(61 << 2)
        out += l.to_bytes(2, "little")
    elif l < (1 << 24):
        out.append(62 << 2)
        out += l.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += l.to_bytes(4, "little")
    out += chunk


def snappy_compress(data: bytes) -> bytes:
    """Compress one snappy block (raw format). Matches are snappy-grade
    (single hash probe, greedy, copies capped at the format's 64-byte op
    limit); every byte not covered by a match is emitted as a literal, so
    round-trip identity holds for arbitrary input."""
    src = memoryview(data)
    out = bytearray(_snappy_varint(len(data)))
    # offsets capped at 64 KiB: google/snappy compresses 64 KiB fragments
    # internally so conforming encoders never need far copies, and a
    # 4-byte-offset copy op costs 5 bytes — a net loss at match length 4
    pos, offs, lens = greedy_matches(data, max_offset=65535, max_match=64)
    last = 0
    for j, off, L in zip(pos.tolist(), offs.tolist(), lens.tolist()):
        if j > last:
            _snappy_literal(out, src[last:j])
        if 4 <= L <= 11 and off < 2048:
            out.append(1 | ((L - 4) << 2) | ((off >> 8) << 5))
            out.append(off & 0xFF)
        elif off < (1 << 16):
            out.append(2 | ((L - 1) << 2))
            out += off.to_bytes(2, "little")
        else:
            out.append(3 | ((L - 1) << 2))
            out += off.to_bytes(4, "little")
        last = j + L
    if last < len(data):
        _snappy_literal(out, src[last:])
    return bytes(out)


def _lz4_seq(out: bytearray, lits: memoryview, off: int, mlen: int) -> None:
    ll = len(lits)
    ml = mlen - 4  # match-length nibble bias
    token = (min(ll, 15) << 4) | min(ml, 15)
    out.append(token)
    if ll >= 15:
        rem = ll - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += lits
    out += off.to_bytes(2, "little")
    if ml >= 15:
        rem = ml - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)


def lz4_block_compress(data: bytes) -> bytes:
    """Compress one LZ4 block (block format, no frame header), honouring
    the spec's end-of-block rules (final 5 bytes literal, last match
    starts >= 12 bytes from the end) so any conforming decoder — ours or
    a native one — accepts the output."""
    src = memoryview(data)
    n = len(data)
    out = bytearray()
    pos, offs, lens = greedy_matches(
        data, max_offset=65535, max_match=273,
        last_match_start_margin=12, match_end_margin=5)
    last = 0
    for j, off, L in zip(pos.tolist(), offs.tolist(), lens.tolist()):
        _lz4_seq(out, src[last:j], off, L)
        last = j + L
    # final literals-only sequence
    lits = src[last:]
    ll = len(lits)
    out.append(min(ll, 15) << 4)
    if ll >= 15:
        rem = ll - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += lits
    return bytes(out)
