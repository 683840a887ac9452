"""Pure-Python zstd decompressor, written from RFC 8878 (no zstd library
exists in this container — same from-spec spirit as the snappy/LZ4 and
patched-base kernels).

Implements the full single-threaded decode path: frame header, raw/RLE/
compressed blocks, literals (raw, RLE, Huffman with direct or
FSE-compressed weights, treeless repeat), FSE-coded sequences (predefined
/ RLE / compressed / repeat modes), repeat-offset history, and sequence
execution with overlap copies. Dictionaries are not supported (raises).
Content checksums are skipped, not verified.

Decode-only, like the reference's codec layer
(/root/reference/src/compression.rs:150-193). Throughput is Python-bound;
fine for footers and test-scale stripes.
"""

from __future__ import annotations

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_LO = 0x184D2A50
SKIPPABLE_HI = 0x184D2A5F


class _Bwd:
    """Backward bitstream (RFC 8878 §3.1.1.3.2.1.1): start after the
    highest set bit of the LAST byte, read MSB-down toward byte 0."""

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("zstd: corrupted backward bitstream")
        self.val = int.from_bytes(data, "little")
        self.pos = (len(data) - 1) * 8 + (data[-1].bit_length() - 1)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        if self.pos >= 0:
            return (self.val >> self.pos) & ((1 << n) - 1)
        # RFC allows the final state reads to consume padding as zeros
        shift = -self.pos
        out = (self.val << shift) & ((1 << n) - 1) if self.pos > -n else 0
        return out


class _Fwd:
    """Forward LSB-first bit reader (FSE table descriptions)."""

    def __init__(self, data, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        got = 0
        while got < n:
            cur = self.data[self.byte] >> self.bit
            take = min(8 - self.bit, n - got)
            out |= (cur & ((1 << take) - 1)) << got
            got += take
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def rewind(self, n: int) -> None:
        total = self.byte * 8 + self.bit - n
        self.byte, self.bit = total // 8, total % 8

    def bytes_used(self) -> int:
        return self.byte + (1 if self.bit else 0)


def _parse_fse_probs(fwd: _Fwd, max_symbol: int) -> tuple[list[int], int]:
    """FSE table description -> (normalized probs, accuracy_log)."""
    al = fwd.read(4) + 5
    if al > 9:
        raise ValueError("zstd: FSE accuracy log too large")
    remaining = (1 << al) + 1
    probs: list[int] = []
    while remaining > 1 and len(probs) <= max_symbol:
        bits = (remaining).bit_length()
        val = fwd.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if (val & lower_mask) < threshold:
            fwd.rewind(1)
            val = val & lower_mask
        elif val > lower_mask:
            val = val - threshold
        prob = val - 1
        probs.append(prob)
        remaining -= prob if prob >= 0 else 1
        if prob == 0:
            repeat = fwd.read(2)
            while repeat == 3:
                probs.extend([0, 0, 0])
                repeat = fwd.read(2)
            probs.extend([0] * repeat)
    if remaining != 1:
        raise ValueError("zstd: FSE probabilities do not sum to table size")
    return probs, al


class _FseTable:
    __slots__ = ("symbol", "nbits", "base", "al")

    def __init__(self, probs: list[int], al: int):
        size = 1 << al
        self.al = al
        symbol = [0] * size
        # low-probability (-1) symbols take one cell each at the table end
        high = size - 1
        for s, p in enumerate(probs):
            if p == -1:
                symbol[high] = s
                high -= 1
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, p in enumerate(probs):
            if p <= 0:
                continue
            for _ in range(p):
                symbol[pos] = s
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ValueError("zstd: FSE table spread error")
        counters = [p if p > 0 else (1 if p == -1 else 0) for p in probs]
        nbits = [0] * size
        base = [0] * size
        for st in range(size):
            s = symbol[st]
            x = counters[s]
            counters[s] += 1
            nb = al - (x.bit_length() - 1)
            nbits[st] = nb
            base[st] = (x << nb) - size
        self.symbol = symbol
        self.nbits = nbits
        self.base = base

    @classmethod
    def rle(cls, sym: int) -> "_FseTable":
        t = cls.__new__(cls)
        t.al = 0
        t.symbol = [sym]
        t.nbits = [0]
        t.base = [0]
        return t


# RFC 8878 predefined distributions
_LL_DEFAULT = ([4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
                2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1], 6)
_ML_DEFAULT = ([1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, -1, -1, -1, -1, -1, -1, -1], 6)
_OF_DEFAULT = ([1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, -1, -1, -1, -1, -1], 5)

_LL_BASE = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 18, 20, 22,
            24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
            32768, 65536]
_LL_EXTRA = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14,
             15, 16]
_ML_BASE = [m + 3 for m in range(32)] + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83,
            99, 131, 259, 515, 1027, 2051, 4099, 8195, 16387, 32771, 65539]
_ML_EXTRA = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13,
             14, 15, 16]


class _HufTable:
    __slots__ = ("syms", "lens", "log")

    def __init__(self, weights: list[int]):
        # the implicit LAST weight completes the total to the next power of
        # two (strictly greater, so the last symbol always exists)
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ValueError("zstd: empty huffman weights")
        max_bits = total.bit_length()
        left = (1 << max_bits) - total
        if left & (left - 1):
            raise ValueError("zstd: corrupted huffman weights")
        last_weight = left.bit_length()
        weights = weights + [last_weight]
        # numBits per symbol: max_bits + 1 - weight (weight 0 -> absent)
        self.log = max_bits
        size = 1 << max_bits
        syms = bytearray(size)
        lens = bytearray(size)
        # canonical layout: symbols in increasing weight order fill the
        # table from the bottom up; within a weight, increasing symbol order
        pos = 0
        for w in range(1, max_bits + 1):
            for s, ws in enumerate(weights):
                if ws == w:
                    n = 1 << (w - 1)
                    nb = max_bits + 1 - w
                    for i in range(pos, pos + n):
                        syms[i] = s
                        lens[i] = nb
                    pos += n
        if pos != size:
            raise ValueError("zstd: huffman table underfilled")
        self.syms = bytes(syms)
        self.lens = bytes(lens)

    def decode(self, data: bytes, n_out: int) -> bytearray:
        bwd = _Bwd(data)
        out = bytearray(n_out)
        log = self.log
        syms = self.syms
        lens = self.lens
        val = bwd.val
        pos = bwd.pos
        mask = (1 << log) - 1
        for i in range(n_out):
            if pos >= log:
                idx = (val >> (pos - log)) & mask
            else:
                idx = (val << (log - pos)) & mask if pos > 0 else 0
            out[i] = syms[idx]
            pos -= lens[idx]
        return out


def _parse_huffman(mv, pos: int) -> tuple[_HufTable, int]:
    hbyte = mv[pos]
    pos += 1
    if hbyte >= 128:
        n = hbyte - 127
        weights = []
        nbytes = (n + 1) // 2
        for i in range(n):
            b = mv[pos + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        pos += nbytes
        return _HufTable(weights), pos
    # FSE-compressed weights: two interleaved states
    comp = bytes(mv[pos : pos + hbyte])
    pos += hbyte
    fwd = _Fwd(comp)
    probs, al = _parse_fse_probs(fwd, 255)
    table = _FseTable(probs, al)
    bitstream = comp[fwd.bytes_used() :]
    bwd = _Bwd(bitstream)
    s1 = bwd.read(al)
    s2 = bwd.read(al)
    weights = []
    # two interleaved FSE states; on bitstream exhaustion during a state
    # update, the OTHER state's symbol flushes last (RFC 8878 weight coding)
    while len(weights) <= 256:
        weights.append(table.symbol[s1])
        s1 = table.base[s1] + bwd.read(table.nbits[s1])
        if bwd.pos < 0:
            weights.append(table.symbol[s2])
            break
        weights.append(table.symbol[s2])
        s2 = table.base[s2] + bwd.read(table.nbits[s2])
        if bwd.pos < 0:
            weights.append(table.symbol[s1])
            break
    else:
        raise ValueError("zstd: runaway huffman weights")
    return _HufTable(weights), pos


def _decode_literals(mv, pos: int, prev_huf: list) -> tuple[bytes, int]:
    b0 = mv[pos]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3
    if lit_type in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif size_format == 1:
            regen = (b0 >> 4) | (mv[pos + 1] << 4)
            pos += 2
        else:
            regen = (b0 >> 4) | (mv[pos + 1] << 4) | (mv[pos + 2] << 12)
            pos += 3
        if lit_type == 0:
            lits = bytes(mv[pos : pos + regen])
            return lits, pos + regen
        return bytes([mv[pos]]) * regen, pos + 1
    # compressed (2) or treeless (3)
    if size_format == 0:
        header = b0 | (mv[pos + 1] << 8) | (mv[pos + 2] << 16)
        regen = (header >> 4) & 0x3FF
        comp_size = (header >> 14) & 0x3FF
        pos += 3
        streams = 1
    elif size_format == 1:
        header = b0 | (mv[pos + 1] << 8) | (mv[pos + 2] << 16)
        regen = (header >> 4) & 0x3FF
        comp_size = (header >> 14) & 0x3FF
        pos += 3
        streams = 4
    elif size_format == 2:
        header = b0 | (mv[pos + 1] << 8) | (mv[pos + 2] << 16) | (mv[pos + 3] << 24)
        regen = (header >> 4) & 0x3FFF
        comp_size = (header >> 18) & 0x3FFF
        pos += 4
        streams = 4
    else:
        header = (b0 | (mv[pos + 1] << 8) | (mv[pos + 2] << 16)
                  | (mv[pos + 3] << 24) | (mv[pos + 4] << 32))
        regen = (header >> 4) & 0x3FFFF
        comp_size = (header >> 22) & 0x3FFFF
        pos += 5
        streams = 4
    end = pos + comp_size
    if lit_type == 2:
        huf, pos = _parse_huffman(mv, pos)
        prev_huf[0] = huf
    else:
        huf = prev_huf[0]
        if huf is None:
            raise ValueError("zstd: treeless literals with no previous table")
    if streams == 1:
        lits = huf.decode(bytes(mv[pos:end]), regen)
        return bytes(lits), end
    # 4 streams: 6-byte jump table, sizes of streams 1-3
    s1 = mv[pos] | (mv[pos + 1] << 8)
    s2 = mv[pos + 2] | (mv[pos + 3] << 8)
    s3 = mv[pos + 4] | (mv[pos + 5] << 8)
    pos += 6
    per = (regen + 3) // 4
    sizes = [s1, s2, s3, end - pos - s1 - s2 - s3]
    outs = []
    cursor = pos
    remaining = regen
    for i, sz in enumerate(sizes):
        n = per if i < 3 else remaining
        outs.append(huf.decode(bytes(mv[cursor : cursor + sz]), n))
        remaining -= n
        cursor += sz
    return bytes(b"".join(outs)), end


def _seq_table(mv, pos: int, mode: int, default: tuple, max_sym: int,
               prev: list) -> tuple[_FseTable, int]:
    if mode == 0:  # predefined
        t = _FseTable(*default)
        prev[0] = t
        return t, pos
    if mode == 1:  # RLE: single symbol byte
        t = _FseTable.rle(mv[pos])
        prev[0] = t
        return t, pos + 1
    if mode == 2:  # FSE-compressed description
        fwd = _Fwd(mv, pos)
        probs, al = _parse_fse_probs(fwd, max_sym)
        t = _FseTable(probs, al)
        prev[0] = t
        return t, fwd.bytes_used()  # _Fwd tracks absolute byte position
    if prev[0] is None:
        raise ValueError("zstd: repeat sequence table with no previous")
    return prev[0], pos


def _decode_block(mv, pos: int, end: int, out: bytearray, ctx: dict) -> None:
    lits, pos = _decode_literals(mv, pos, ctx["huf"])
    if pos > end:
        raise ValueError("zstd: literals overrun block")
    if pos == end:
        out += lits
        return
    # sequences section
    b0 = mv[pos]
    pos += 1
    if b0 == 0:
        out += lits
        return
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) + mv[pos]
        pos += 1
    else:
        nseq = mv[pos] | (mv[pos + 1] << 8)
        nseq += 0x7F00
        pos += 2
    modes = mv[pos]
    pos += 1
    ll_mode = (modes >> 6) & 3
    of_mode = (modes >> 4) & 3
    ml_mode = (modes >> 2) & 3
    ll_t, pos = _seq_table(mv, pos, ll_mode, _LL_DEFAULT, 35, ctx["ll"])
    of_t, pos = _seq_table(mv, pos, of_mode, _OF_DEFAULT, 31, ctx["of"])
    ml_t, pos = _seq_table(mv, pos, ml_mode, _ML_DEFAULT, 52, ctx["ml"])

    bwd = _Bwd(bytes(mv[pos:end]))
    ll_state = bwd.read(ll_t.al)
    of_state = bwd.read(of_t.al)
    ml_state = bwd.read(ml_t.al)
    reps = ctx["reps"]
    lit_pos = 0
    for i in range(nseq):
        of_code = of_t.symbol[of_state]
        of_val = (1 << of_code) + bwd.read(of_code)
        ml_code = ml_t.symbol[ml_state]
        match_len = _ML_BASE[ml_code] + bwd.read(_ML_EXTRA[ml_code])
        ll_code = ll_t.symbol[ll_state]
        lit_len = _LL_BASE[ll_code] + bwd.read(_LL_EXTRA[ll_code])
        # repeat-offset resolution
        if of_val > 3:
            offset = of_val - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = of_val - 1 if lit_len != 0 else of_val
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 2:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # idx == 3: repeat0 - 1
                offset = reps[0] - 1
                if offset == 0:
                    raise ValueError("zstd: zero offset")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        out += lits[lit_pos : lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out):
            raise ValueError("zstd: offset beyond window")
        start = len(out) - offset
        if offset >= match_len:
            out += out[start : start + match_len]
        else:
            for k in range(match_len):
                out.append(out[start + k])
        if i < nseq - 1:
            ll_state = ll_t.base[ll_state] + bwd.read(ll_t.nbits[ll_state])
            ml_state = ml_t.base[ml_state] + bwd.read(ml_t.nbits[ml_state])
            of_state = of_t.base[of_state] + bwd.read(of_t.nbits[of_state])
    out += lits[lit_pos:]


def zstd_decompress(data: bytes) -> bytes:
    mv = memoryview(data)
    out = bytearray()
    pos = 0
    n = len(mv)
    while pos < n:
        magic = int.from_bytes(mv[pos : pos + 4], "little")
        pos += 4
        if SKIPPABLE_LO <= magic <= SKIPPABLE_HI:
            size = int.from_bytes(mv[pos : pos + 4], "little")
            pos += 4 + size
            continue
        if magic != ZSTD_MAGIC:
            raise ValueError(f"zstd: bad magic {magic:#x}")
        fhd = mv[pos]
        pos += 1
        dict_flag = fhd & 3
        checksum = (fhd >> 2) & 1
        single_segment = (fhd >> 5) & 1
        fcs_flag = fhd >> 6
        if not single_segment:
            pos += 1  # window descriptor
        if dict_flag:
            raise ValueError("zstd: dictionaries not supported")
        fcs_bytes = {0: 1 if single_segment else 0, 1: 2, 2: 4, 3: 8}[fcs_flag]
        pos += fcs_bytes
        ctx = {"huf": [None], "ll": [None], "of": [None], "ml": [None], "reps": [1, 4, 8]}
        while True:
            bh = mv[pos] | (mv[pos + 1] << 8) | (mv[pos + 2] << 16)
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:
                out += bytes(mv[pos : pos + bsize])
                pos += bsize
            elif btype == 1:
                out += bytes([mv[pos]]) * bsize
                pos += 1
            elif btype == 2:
                _decode_block(mv, pos, pos + bsize, out, ctx)
                pos += bsize
            else:
                raise ValueError("zstd: reserved block type")
            if last:
                break
        if checksum:
            pos += 4
    return bytes(out)
