"""FSST-style string-symbol compression (Boncz/Neumann/Leis, VLDB 2020).

Absent from the reference entirely (SURVEY.md §2.5); built from the public
paper's core idea: replace frequent substrings with 1-byte codes from a
learned symbol table, code 255 escaping literal bytes.

Vectorization note: the paper's encoder is a sequential greedy longest-match
scan (up to 8-byte symbols). To stay NumPy-vectorized (no per-byte Python)
this implementation restricts symbols to lengths 1-2 and proves the greedy
parse equal to an alternate-position selection inside maximal runs of
matchable positions — computable with cumsum/flatnonzero in one pass. Longer
structure (4-byte repeats) is captured by applying the codec recursively
(``rounds=2``); the auto-selector picks the round count by measured size.

Layout: [flag:1B (0=stored,1..k=fsst rounds)] + per round:
[n_codes:1B][sym_len:n_codes B][sym bytes][payload...].
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_CODES = 255  # codes 0..254


def _run_parity_select(cand: np.ndarray) -> np.ndarray:
    """Greedy non-overlapping selection of 2-wide matches.

    Within each maximal run of consecutive candidate positions, the greedy
    left-to-right parse picks the 0th, 2nd, 4th... position (a match covers
    its position and the next; a run is never entered mid-way because the
    position before a run start is, by definition, not a candidate).
    """
    if not cand.any():
        return cand
    idx = np.arange(len(cand))
    run_start = cand & ~np.concatenate(([False], cand[:-1]))
    run_id = np.cumsum(run_start) - 1
    starts = idx[run_start]
    offset = idx - starts[np.clip(run_id, 0, None)]
    return cand & (offset % 2 == 0)


def _train(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pick up to 255 symbols (single bytes + frequent pairs) by savings.

    Returns (sym_lens uint8 array, sym_bytes (k,2) uint8 array).
    """
    sample = a if len(a) <= 1 << 20 else a[: 1 << 20]
    bfreq = np.bincount(sample, minlength=256).astype(np.int64)
    if len(sample) >= 2:
        pv = sample[:-1].astype(np.int32) * 256 + sample[1:]
        pfreq = np.bincount(pv, minlength=65536).astype(np.int64)
    else:
        pfreq = np.zeros(65536, dtype=np.int64)
    # gains: single byte b: each occurrence 2 bytes (escape) -> 1 code
    # pair p: 2 bytes (as two single codes) -> 1 code; slightly discounted
    # because pair matches also consume single-byte occurrences
    singles = np.flatnonzero(bfreq > 0)
    cand = [(int(bfreq[b]), 1, int(b)) for b in singles]
    top_pairs = np.argsort(pfreq)[::-1][:512]
    cand += [(int(pfreq[p]), 2, int(p)) for p in top_pairs if pfreq[p] >= 4]
    cand.sort(key=lambda t: (-t[0] * (t[1] - 0.5), t[1]))
    cand = cand[:MAX_CODES]
    lens = np.array([c[1] for c in cand], dtype=np.uint8)
    syms = np.zeros((len(cand), 2), dtype=np.uint8)
    for i, (_, ln, key) in enumerate(cand):
        if ln == 1:
            syms[i, 0] = key
        else:
            syms[i, 0] = key >> 8
            syms[i, 1] = key & 0xFF
    return lens, syms


def _encode_round(a: np.ndarray) -> bytes:
    lens, syms = _train(a)
    k = len(lens)
    lut1 = np.full(256, -1, dtype=np.int32)
    lut2 = np.full(65536, -1, dtype=np.int32)
    for code in range(k):
        if lens[code] == 1:
            lut1[syms[code, 0]] = code
        else:
            lut2[syms[code, 0].astype(np.int32) * 256 + syms[code, 1]] = code
    n = len(a)
    if n >= 2:
        pv = a[:-1].astype(np.int32) * 256 + a[1:]
        cand = lut2[pv] >= 0
        chosen = _run_parity_select(cand)
    else:
        chosen = np.zeros(0, dtype=bool)
    covered = np.zeros(n, dtype=bool)
    ch_idx = np.flatnonzero(chosen)
    covered[ch_idx] = True
    covered[ch_idx + 1] = True
    first = np.zeros(n, dtype=bool)
    first[ch_idx] = True
    single_code = lut1[a]
    is_single = ~covered & (single_code >= 0)
    is_escape = ~covered & (single_code < 0)
    out_len = np.zeros(n, dtype=np.int64)
    out_len[first] = 1
    out_len[is_single] = 1
    out_len[is_escape] = 2
    out_pos = np.concatenate(([0], np.cumsum(out_len)[:-1])) if n else np.empty(0, np.int64)
    total = int(out_len.sum())
    out = np.empty(total, dtype=np.uint8)
    if len(ch_idx):
        out[out_pos[ch_idx]] = lut2[pv[ch_idx]].astype(np.uint8)
    si = np.flatnonzero(is_single)
    out[out_pos[si]] = single_code[si].astype(np.uint8)
    ei = np.flatnonzero(is_escape)
    out[out_pos[ei]] = ESCAPE
    out[out_pos[ei] + 1] = a[ei]
    # symbol bytes: only the used length of each symbol
    sym_stream = syms[np.arange(2)[None, :] < lens[:, None].astype(np.int64)].tobytes()
    return bytes([k]) + lens.tobytes() + sym_stream + out.tobytes()


def _decode_round(buf: np.ndarray) -> tuple[np.ndarray, int]:
    """Decode one round from ``buf`` -> (decoded uint8 array, header_size)."""
    k = int(buf[0])
    lens = buf[1 : 1 + k].astype(np.int64)
    sym_stream_len = int(lens.sum())
    sym_flat = buf[1 + k : 1 + k + sym_stream_len]
    # extended table: rows 0..k-1 = symbols, rows 256..511 = literal bytes
    table = np.zeros((512, 2), dtype=np.uint8)
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
    esc_cand = codes == ESCAPE
    is_esc = _run_parity_select(esc_cand)
    vals = codes.astype(np.int32)
    esc_idx = np.flatnonzero(is_esc)
    vals[esc_idx + 1] += 256
    keep = np.ones(len(codes), dtype=bool)
    keep[esc_idx] = False
    sel = vals[keep]
    ln = tlens[sel]
    mat = table[sel]
    mask = np.arange(2)[None, :] < ln[:, None]
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
