"""FSST-style string-symbol compression (Boncz/Neumann/Leis, VLDB 2020).

Absent from the reference entirely (SURVEY.md §2.5); built from the public
paper's core idea: replace frequent substrings with 1-byte codes from a
learned symbol table, code 255 escaping literal bytes.

Vectorization note: the paper's encoder is a sequential greedy longest-match
scan (up to 8-byte symbols). To stay NumPy-vectorized (no per-byte Python)
this implementation parses in staged width order (4, 3, 2, 1/escape):

- width 2 uses an exact greedy equivalence: inside each maximal run of
  matchable positions the greedy parse picks alternating positions, and a
  run is never entered mid-way (the position before a run start is not a
  candidate) — one cumsum pass.
- widths 3-4 use ``_select_nonoverlap``: stride-w selection inside runs,
  then a bounded number of vectorized conflict-drop passes across run
  boundaries. This may drop a few matches exact greedy would keep (the
  decode only needs a VALID parse, which this always is), in exchange for
  zero per-byte Python.

Longer structure still compounds by applying the codec recursively
(``rounds=2+``); the auto-selector picks the round count by measured size.

Layout: [flag:1B (0=stored,1..k=fsst rounds)] + per round:
[n_codes:1B][sym_len:n_codes B][sym bytes][payload...].
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_CODES = 255  # codes 0..254
MAX_SYM = 4  # symbol widths 1..4


def _select_positions(pos: np.ndarray, w: int) -> np.ndarray:
    """Greedy-ish non-overlapping selection among sorted match positions.

    Within each maximal run of CONSECUTIVE candidate positions, the greedy
    left-to-right parse picks offsets 0, w, 2w... (a run is never entered
    mid-way: the position before a run start is not a candidate). For
    w == 2 this is exactly greedy and chosen matches never collide across
    runs (runs are >= 2 apart). For w >= 3 cross-run collisions are
    possible; bounded drop-the-later passes plus a final sweep keep the
    parse VALID (decode needs nothing more) at a tiny optimality cost.
    All work is O(#candidates), not O(input)."""
    if len(pos) == 0:
        return pos
    new_run = np.empty(len(pos), dtype=bool)
    new_run[0] = True
    np.greater(np.diff(pos), 1, out=new_run[1:])
    run_id = np.cumsum(new_run) - 1
    starts = pos[new_run]
    pos = pos[(pos - starts[run_id]) % w == 0]
    if w <= 2:
        return pos
    for _ in range(8):
        if len(pos) < 2:
            break
        bad = np.zeros(len(pos), dtype=bool)
        bad[1:] = np.diff(pos) < w
        drop = bad & ~np.concatenate(([False], bad[:-1]))
        if not drop.any():
            break
        pos = pos[~drop]
    if len(pos) >= 2:
        bad = np.zeros(len(pos), dtype=bool)
        bad[1:] = np.diff(pos) < w
        pos = pos[~bad]
    return pos


def _gram_values(a: np.ndarray, w: int) -> np.ndarray:
    """Big-endian integer value of every width-w window (int64)."""
    n = len(a)
    if n < w:
        return np.empty(0, dtype=np.int64)
    v = a[: n - w + 1].astype(np.int64)
    for j in range(1, w):
        v = v * 256 + a[j : n - w + 1 + j]
    return v


def _top_grams(a: np.ndarray, w: int, limit: int = 512, min_count: int = 4):
    vals = _gram_values(a, w)
    if not len(vals):
        return []
    if w == 2:
        # 2-gram value space is 2^16: a bincount histogram replaces the
        # sort np.unique pays, with identical output (flatnonzero is the
        # same ascending-unique order unique() returns)
        full = np.bincount(vals, minlength=1 << 16)
        uniq = np.flatnonzero(full)
        counts = full[uniq]
    elif w >= 3 and len(vals) > 1 << 17:
        # stride-sample wide grams: frequency RANKING survives 2x
        # decimation and training cost halves (counts are rescaled)
        vals = vals[::2]
        uniq, counts = np.unique(vals, return_counts=True)
        counts = counts * 2
    else:
        uniq, counts = np.unique(vals, return_counts=True)
    order = np.argsort(counts)[::-1][:limit]
    return [
        (int(counts[i]), w, int(uniq[i])) for i in order if counts[i] >= min_count
    ]


def _train(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pick up to 255 symbols (single bytes + frequent 2-4 byte grams) by
    estimated savings. Returns (sym_lens uint8, sym_bytes (k, MAX_SYM))."""
    sample = a if len(a) <= 1 << 19 else a[: 1 << 19]
    bfreq = np.bincount(sample, minlength=256).astype(np.int64)
    singles = np.flatnonzero(bfreq > 0)
    cand = [(int(bfreq[b]), 1, int(b)) for b in singles]
    for w in (2, 3, 4):
        cand += _top_grams(sample, w)
    # score: occurrences x (bytes replaced - code emitted), discounted
    # half a byte for cannibalizing shorter matches
    cand.sort(key=lambda t: (-t[0] * (t[1] - 0.5), t[1]))
    cand = cand[:MAX_CODES]
    lens = np.array([c[1] for c in cand], dtype=np.uint8)
    syms = np.zeros((len(cand), MAX_SYM), dtype=np.uint8)
    for i, (_, ln, key) in enumerate(cand):
        for j in range(ln - 1, -1, -1):
            syms[i, j] = key & 0xFF
            key >>= 8
    return lens, syms


def _encode_round(a: np.ndarray) -> bytes:
    lens, syms = _train(a)
    k = len(lens)
    n = len(a)
    lut1 = np.full(256, -1, dtype=np.int32)
    lut2 = np.full(65536, -1, dtype=np.int32)
    wide: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for w in (3, 4):
        sel = np.flatnonzero(lens == w)
        if len(sel):
            keys = np.zeros(len(sel), dtype=np.int64)
            for j in range(w):
                keys = keys * 256 + syms[sel, j]
            order = np.argsort(keys)
            wide[w] = (keys[order], sel[order].astype(np.int32))
    for code in range(k):
        if lens[code] == 1:
            lut1[syms[code, 0]] = code
        elif lens[code] == 2:
            lut2[syms[code, 0].astype(np.int32) * 256 + syms[code, 1]] = code

    covered = np.zeros(n, dtype=bool)
    code_at = np.full(n, -1, dtype=np.int64)  # code id at each match start
    pv2 = a[:-1].astype(np.int32) * 256 + a[1:] if n >= 2 else np.empty(0, np.int32)
    # first-2-byte prefilter for wide symbols: candidate positions shrink
    # from O(n) to the few spots whose prefix matches any wide symbol, so
    # the sorted-key lookups run over candidates only
    wide_prefix = np.zeros(65536, dtype=bool)
    for w, (keys, _codes) in wide.items():
        wide_prefix[(keys >> (8 * (w - 2))).astype(np.int64)] = True
    # staged longest-first: 4-byte, then 3-byte symbols on free bytes
    for w in (4, 3):
        if w not in wide or n < w:
            continue
        keys, codes = wide[w]
        pos = np.flatnonzero(wide_prefix[pv2[: n - w + 1]])
        if not len(pos):
            continue
        gv = a[pos].astype(np.int64)
        free = ~covered[pos]
        for j in range(1, w):
            gv = gv * 256 + a[pos + j]
            free &= ~covered[pos + j]
        ii = np.clip(np.searchsorted(keys, gv), 0, len(keys) - 1)
        hit = (keys[ii] == gv) & free
        pos, ii = pos[hit], ii[hit]
        pos_sel = _select_positions(pos, w)
        if not len(pos_sel):
            continue
        keep = np.searchsorted(pos, pos_sel)
        for j in range(w):
            covered[pos_sel + j] = True
        code_at[pos_sel] = codes[ii[keep]]
    # width-2 symbols on the residual (exact greedy within runs)
    if n >= 2:
        c2 = (lut2[pv2] >= 0) & ~covered[:-1] & ~covered[1:]
        pos2 = _select_positions(np.flatnonzero(c2), 2)
        covered[pos2] = True
        covered[pos2 + 1] = True
        code_at[pos2] = lut2[pv2[pos2]]

    single_code = lut1[a]
    is_single = ~covered & (single_code >= 0)
    is_escape = ~covered & (single_code < 0)
    starts = code_at >= 0
    out_len = np.zeros(n, dtype=np.int64)
    out_len[starts] = 1
    out_len[is_single] = 1
    out_len[is_escape] = 2
    out_pos = np.concatenate(([0], np.cumsum(out_len)[:-1])) if n else np.empty(0, np.int64)
    total = int(out_len.sum())
    out = np.empty(total, dtype=np.uint8)
    sm = np.flatnonzero(starts)
    out[out_pos[sm]] = code_at[sm].astype(np.uint8)
    si = np.flatnonzero(is_single)
    out[out_pos[si]] = single_code[si].astype(np.uint8)
    ei = np.flatnonzero(is_escape)
    out[out_pos[ei]] = ESCAPE
    out[out_pos[ei] + 1] = a[ei]
    # symbol bytes: only the used length of each symbol
    sym_stream = syms[np.arange(MAX_SYM)[None, :] < lens[:, None].astype(np.int64)].tobytes()
    return bytes([k]) + lens.tobytes() + sym_stream + out.tobytes()


def _decode_round(buf: np.ndarray) -> tuple[np.ndarray, int]:
    """Decode one round from ``buf`` -> (decoded uint8 array, header_size)."""
    k = int(buf[0])
    lens = buf[1 : 1 + k].astype(np.int64)
    sym_stream_len = int(lens.sum())
    sym_flat = buf[1 + k : 1 + k + sym_stream_len]
    # extended table: rows 0..k-1 = symbols, rows 256..511 = literal bytes
    table = np.zeros((512, MAX_SYM), dtype=np.uint8)
    tlens = np.zeros(512, dtype=np.int64)
    starts = np.cumsum(lens) - lens
    tlens[:k] = lens
    if k:
        rows = np.repeat(np.arange(k), lens)
        cols = np.arange(sym_stream_len) - np.repeat(starts, lens)
        table[rows, cols] = sym_flat
    tlens[256:] = 1
    table[256:, 0] = np.arange(256)
    codes = buf[1 + k + sym_stream_len :]
    esc_idx = _select_positions(np.flatnonzero(codes == ESCAPE), 2)
    vals = codes.astype(np.int32)
    vals[esc_idx + 1] += 256
    keep = np.ones(len(codes), dtype=bool)
    keep[esc_idx] = False
    sel = vals[keep]
    ln = tlens[sel]
    mat = table[sel]
    mask = np.arange(MAX_SYM)[None, :] < ln[:, None]
    return mat[mask], 1 + k + sym_stream_len


def _header_size(enc: bytes) -> int:
    k = enc[0]
    lens = np.frombuffer(enc[1 : 1 + k], dtype=np.uint8)
    return 1 + k + int(lens.sum())


def fsst_encode(data: bytes, rounds: int = 1) -> bytes:
    """Compress ``data``; stores raw (flag 0) when compression doesn't pay.

    With rounds > 1 the codec re-applies itself to its own code stream,
    capturing 4-byte structure; the smallest round count wins.
    """
    best = bytes([0]) + data
    headers: list[bytes] = []
    payload = np.frombuffer(data, dtype=np.uint8)
    for r in range(rounds):
        enc = _encode_round(payload)
        h = _header_size(enc)
        headers.append(enc[:h])
        payload = np.frombuffer(enc, dtype=np.uint8)[h:]
        candidate = bytes([r + 1]) + b"".join(headers) + payload.tobytes()
        if len(candidate) < len(best):
            best = candidate
        if len(payload) < 64:
            break
    return best


def fsst_decode(buf: bytes) -> bytes:
    b = np.frombuffer(buf, dtype=np.uint8)
    rounds = int(b[0])
    if rounds == 0:
        return bytes(buf[1:])
    # headers for rounds 1..R are stored in order; payload belongs to round R
    headers = []
    pos = 1
    for _ in range(rounds):
        k = int(b[pos])
        lens = b[pos + 1 : pos + 1 + k].astype(np.int64)
        hsize = 1 + k + int(lens.sum())
        headers.append((pos, hsize))
        pos += hsize
    data = b[pos:]
    # decode innermost (last) round first, then unwrap outward
    for hpos, hsize in reversed(headers):
        merged = np.concatenate((b[hpos : hpos + hsize], data))
        data, _ = _decode_round(merged)
    return data.tobytes()
