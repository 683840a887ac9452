"""ORC RunLength-encoding v2: short-repeat, direct, patched-base, delta.

Encode AND decode, per the public Apache ORC v1 spec. Parity targets in the
reference (decode-only): /root/reference/src/encoding/rlev2.rs:12-58 (wire
format doc comments), :145-183 (header parse), :231-282 (run state),
:360-423 (emit). Patched-base is ``todo!()`` in the reference
(/root/reference/src/encoding/rlev2.rs:185-187) — implemented here from the
spec alone. Known reference bugs (direct reads num_values-2; ``& -8``
bit-length rounding, SURVEY.md C9) are NOT reproduced; the ORC spec is the
oracle.

All per-value math is NumPy-vectorized; Python loops run only over emitted
runs/frames (<= n/512 frames in the frame encoder; <= number of runs in the
run-aware encoder, which the auto-selector only picks for run-dense chunks).
"""

from __future__ import annotations

import numpy as np

from orc_rs_spark.kernels.bitpack import (
    bit_lengths,
    bitpack,
    bitunpack,
    closest_delta_width,
    closest_direct_width,
    decode_delta_width,
    decode_direct_width,
    encode_delta_width,
    encode_direct_width,
    packed_size,
)
from orc_rs_spark.kernels.varint import varint_decode, varint_encode
from orc_rs_spark.kernels.zigzag import zigzag_decode, zigzag_encode

MAX_RUN = 512  # max values per RLEv2 run (9-bit length field, L-1)
_U64_ONE = np.uint64(1)


# ---------------------------------------------------------------- helpers


def _as_unsigned(v: np.ndarray, signed: bool) -> np.ndarray:
    """Value space used by short-repeat/direct: zigzag if signed."""
    if signed:
        return zigzag_encode(v)
    return np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)


def _from_unsigned(u: np.ndarray, signed: bool) -> np.ndarray:
    if signed:
        return zigzag_decode(u)
    # uint64 -> int64 wrap: a view is the same bits for free; astype only
    # when the input is some other dtype
    return u.view(np.int64) if u.dtype == np.uint64 else u.astype(np.int64)


def _encode_base(base: int) -> tuple[bytes, int]:
    """Patched-base base value: sign-magnitude, 1-8 big-endian bytes."""
    mag = abs(int(base))
    bits = mag.bit_length() + 1  # +1 sign bit
    bw = min(8, max(1, (bits + 7) // 8))
    u = mag
    if base < 0:
        u |= 1 << (bw * 8 - 1)
    return u.to_bytes(bw, "big"), bw


def _decode_base(raw: bytes) -> int:
    bw = len(raw)
    u = int.from_bytes(raw, "big")
    sign_mask = 1 << (bw * 8 - 1)
    if u & sign_mask:
        return -(u & (sign_mask - 1))
    return u


def _scalar_varint(z: int) -> bytes:
    """LEB128 for one value already in uint64 space — pure-Python scalar
    (byte-identical to varint_encode on a 1-element array, without the
    ~45us of array construction the hot frame loop was paying per call)."""
    out = bytearray()
    while z > 0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)
    return bytes(out)


def _signed_varint(x: int) -> bytes:
    # Python's arithmetic shifts make (x << 1) ^ (x >> 63) exact zigzag for
    # any int64 x, including the -2^63 wraparound case
    return _scalar_varint((x << 1) ^ (x >> 63))


def _unsigned_varint(x: int) -> bytes:
    return _scalar_varint(x & 0xFFFFFFFFFFFFFFFF)


# ---------------------------------------------------------------- encoders


def _emit_short_repeat(value: int, count: int, signed: bool, out: list) -> None:
    u = ((value << 1) ^ (value >> 63)) if signed else (value & 0xFFFFFFFFFFFFFFFF)
    w = max(1, (u.bit_length() + 7) // 8)
    out.append(bytes([((w - 1) << 3) | (count - 3)]))
    out.append(u.to_bytes(w, "big"))


def _emit_direct(v: np.ndarray, signed: bool, out: list) -> None:
    u = _as_unsigned(v, signed)
    w = closest_direct_width(int(bit_lengths(u).max(initial=0)) or 1)
    n = len(v)
    out.append(bytes([(1 << 6) | (encode_direct_width(w) << 1) | ((n - 1) >> 8), (n - 1) & 0xFF]))
    out.append(bitpack(u, w))


def _emit_fixed_delta(value: int, delta: int, count: int, signed: bool, out: list) -> None:
    """Delta run with encoded width 0: base + fixed delta, no packed bits."""
    out.append(bytes([(3 << 6) | (0 << 1) | ((count - 1) >> 8), (count - 1) & 0xFF]))
    out.append(_signed_varint(value) if signed else _unsigned_varint(value))
    if count >= 2:
        out.append(_signed_varint(delta))


def _emit_delta(
    v: np.ndarray, diffs: np.ndarray, signed: bool, out: list, max_mag_width: int | None = None
) -> None:
    """Monotonic run: base + delta-base varints + bit-packed |deltas|."""
    n = len(v)
    mags = np.abs(diffs).astype(np.uint64)
    if n <= 2:
        w = 0
    elif max_mag_width is not None:
        w = closest_delta_width(max_mag_width)
    else:
        w = closest_delta_width(int(bit_lengths(mags[1:]).max(initial=0)))
    if w == 0 and n > 2 and not np.all(diffs == diffs[0]):
        w = 2  # all |deltas| after first are 0/1 but not fixed -> min packed width
    out.append(
        bytes([(3 << 6) | (encode_delta_width(w) << 1) | ((n - 1) >> 8), (n - 1) & 0xFF])
    )
    out.append(_signed_varint(int(v[0])) if signed else _unsigned_varint(int(v[0])))
    if n >= 2:
        out.append(_signed_varint(int(diffs[0])))
    if n > 2 and w > 0:
        out.append(bitpack(mags[1:], w))


def _patched_plan(
    n: int, base: int, adj: np.ndarray, bls: np.ndarray, w: int, min_pll: int = 0
) -> tuple[int, tuple] | None:
    """Size a patched-base run at main width ``w`` WITHOUT bit-packing.

    Returns (total_bytes, plan) or None when the patch constraints (PLL<=31,
    gap width<=8 bits, w+pw<=64) can't be met. ``_patched_build`` turns the
    plan into bytes — callers size several candidate widths cheaply and
    build only the winner.
    """
    patch_idx = np.flatnonzero(bls > w)
    if len(patch_idx) > 31:
        return None
    if len(patch_idx) == 0:
        # pure frame-of-reference: zero patches is wire-legal (PLL=0)
        gaps = np.empty(0, dtype=np.uint64)
        patches = np.empty(0, dtype=np.uint64)
    else:
        gaps = np.diff(patch_idx, prepend=0).astype(np.uint64)
        patches = (adj[patch_idx] >> np.uint64(w)).astype(np.uint64)
        if gaps.max(initial=0) > 255:
            # expand gaps > 255 with zero-patch filler entries
            eg, ep = [], []
            for g, p in zip(gaps.tolist(), patches.tolist()):
                while g > 255:
                    eg.append(255)
                    ep.append(0)
                    g -= 255
                eg.append(g)
                ep.append(p)
            gaps = np.array(eg, dtype=np.uint64)
            patches = np.array(ep, dtype=np.uint64)
    pll = len(gaps)
    if pll > 31:
        return None
    if pll < min_pll:
        # strict-ORC mode: the canonical Java reader crashes on PLL=0
        # (ArrayIndexOutOfBounds in readPatchedBaseValues), so files written
        # for interop never emit the zero-patch frame-of-reference form
        return None
    # patch/gap lists are <=31 entries: scalar bit_length beats array kernels
    pw = closest_direct_width(max((int(x).bit_length() for x in patches.tolist()), default=1) or 1)
    if w + pw > 64:
        return None
    pgw = max(1, max((int(x).bit_length() for x in gaps.tolist()), default=1))
    if pgw > 8:
        return None
    bw = min(8, max(1, (abs(base).bit_length() + 1 + 7) // 8))
    cw = closest_direct_width(pgw + pw)
    size = 4 + bw + packed_size(n, w) + packed_size(pll, cw)
    return size, (n, base, w, pw, pgw, pll, cw, gaps, patches)


def _patched_build(plan: tuple, adj: np.ndarray) -> list:
    n, base, w, pw, pgw, pll, cw, gaps, patches = plan
    base_bytes, bw = _encode_base(base)
    data = adj & ((_U64_ONE << np.uint64(w)) - _U64_ONE)
    entries = (gaps << np.uint64(pw)) | patches
    return [
        bytes(
            [
                (2 << 6) | (encode_direct_width(w) << 1) | ((n - 1) >> 8),
                (n - 1) & 0xFF,
                ((bw - 1) << 5) | encode_direct_width(pw),
                ((pgw - 1) << 5) | pll,
            ]
        ),
        base_bytes,
        bitpack(data, w),
        bitpack(entries, cw),
    ]


def _patched_candidate(
    n: int, base: int, adj: np.ndarray, bls: np.ndarray, w: int, min_pll: int = 0
) -> list | None:
    sized = _patched_plan(n, base, adj, bls, w, min_pll)
    return _patched_build(sized[1], adj) if sized else None


def _try_patched(v: np.ndarray, out: list, min_pll: int = 0) -> bool:
    """Patched-base: frame-of-reference + patch list for outliers.

    Evaluates main widths at the 90/95/100th percentile bit lengths (100th =
    zero patches = pure FoR) and keeps the smallest encoding. Returns False
    when no candidate satisfies the constraints (caller falls back to
    direct). Built from the ORC v1 spec — the reference never implemented
    this mode (/root/reference/src/encoding/rlev2.rs:185-187).
    """
    n = len(v)
    base = int(v.min())
    if abs(base).bit_length() + 1 > 64:
        return False
    adj = v.astype(np.uint64) - np.int64(base).astype(np.uint64)  # wraparound-exact
    bls = bit_lengths(adj)
    widths = {
        closest_direct_width(max(1, int(np.percentile(bls, p)))) for p in (90, 95, 100)
    }
    best: list | None = None
    best_size = None
    for w in widths:
        cand = _patched_candidate(n, base, adj, bls, w, min_pll)
        if cand is not None:
            size = sum(len(p) for p in cand)
            if best_size is None or size < best_size:
                best, best_size = cand, size
    if best is None:
        return False
    out.extend(best)
    return True


def _encode_frame(v: np.ndarray, signed: bool, out: list, min_pll: int = 0) -> None:
    """Encode one frame (<=512 values) picking the cheapest sub-mode."""
    n = len(v)
    if n == 0:
        return
    vmax, vmin = int(v.max()), int(v.min())
    if vmax == vmin:
        u = int(_as_unsigned(v[:1], signed)[0])
        if 3 <= n <= 10 and u.bit_length() <= 64:
            _emit_short_repeat(vmax, n, signed, out)
        elif n < 3:
            _emit_direct(v, signed, out)
        else:
            _emit_fixed_delta(vmax, 0, n, signed, out)
        return
    diffs = np.diff(v)
    # the decoder derives delta direction from the delta-base's sign, so a
    # decreasing run whose first diff is 0 is not representable in delta mode;
    # int64-wrapping diffs (range >= 2^63) are excluded too
    monotonic = (vmax - vmin) < (1 << 63) and bool(
        np.all(diffs >= 0) or (np.all(diffs <= 0) and diffs[0] != 0)
    )
    # cost estimates (bytes)
    u = _as_unsigned(v, signed)
    w_direct = closest_direct_width(int(bit_lengths(u).max(initial=1)) or 1)
    cost_direct = 2 + packed_size(n, w_direct)
    if monotonic and n >= 3:
        mags = np.abs(diffs).astype(np.uint64)
        w_delta = closest_delta_width(int(bit_lengths(mags[1:]).max(initial=0)))
        cost_delta = 2 + 10 + 5 + packed_size(n - 2, max(w_delta, 2) if w_delta else 0)
        if cost_delta <= cost_direct:
            _emit_delta(v, diffs, signed, out)
            return
    # try patched-base only when it can beat direct
    probe: list = []
    if n >= 8 and _try_patched(v, probe, min_pll):
        if sum(len(p) for p in probe) < cost_direct:
            out.extend(probe)
            return
    _emit_direct(v, signed, out)


def _frame_spans(n: int, boundaries: np.ndarray | None) -> tuple[np.ndarray, np.ndarray]:
    """Frame (start, end) arrays: fixed 512 grid, or greedy row-aligned.

    With ``boundaries`` (sorted positions where logical rows start), each
    frame ends at the last row boundary within 512 values — keeping frames
    regime-homogeneous when consecutive rows differ in token structure —
    falling back to a hard cut at 512 for rows longer than a frame.
    """
    if boundaries is None:
        starts = np.arange(0, n, MAX_RUN, dtype=np.int64)
    else:
        b = np.asarray(boundaries, dtype=np.int64)
        starts_list = [0]
        cur = 0
        while cur + MAX_RUN < n:
            j = int(np.searchsorted(b, cur + MAX_RUN, side="right")) - 1
            nxt = int(b[j]) if j >= 0 and b[j] > cur else cur + MAX_RUN
            nxt = min(nxt, cur + MAX_RUN)
            starts_list.append(nxt)
            cur = nxt
        starts = np.array(starts_list, dtype=np.int64)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = n
    return starts, ends


def rlev2_encode(
    values: np.ndarray,
    signed: bool = True,
    boundaries: np.ndarray | None = None,
    strict_orc: bool = False,
) -> bytes:
    """Frame-adaptive RLEv2 encode: cheapest sub-mode per frame.

    Frames are a fixed 512 grid, or row-aligned when ``boundaries`` is given
    (list-column offsets — frames then respect row structure, which on
    per-row-regime data beats the grid by ~10%). Per-frame statistics
    (min/max, monotonicity, zigzag/FoR bit widths, delta widths) come from a
    handful of whole-array NumPy passes using ``ufunc.reduceat``; the
    per-frame Python loop only dispatches and emits. This is the bulk-stats
    analogue of the SIMD work the reference left as a TODO
    (/root/reference/src/encoding/rlev2.rs:98).
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return b""
    out: list = []
    starts, ends = _frame_spans(n, boundaries)
    k = len(starts)
    seg_lens = ends - starts
    mins = np.minimum.reduceat(v, starts)
    maxs = np.maximum.reduceat(v, starts)
    const = mins == maxs
    # per-frame monotonicity from global diffs; boundary diffs neutralized
    d = np.diff(v) if n > 1 else np.empty(0, dtype=np.int64)
    if len(d):
        bpos = ends[:-1] - 1  # diffs that straddle frame boundaries
        # zeroing boundary diffs in place is safe: the emit slices
        # (d[s:e-1]) exclude them, and 0 is neutral for every per-frame
        # reduction below — this lets min/max reduceat decide monotonicity
        # directly instead of materializing two boolean arrays + inverts
        first_d = d[np.minimum(starts, len(d) - 1)]
        d[bpos] = 0
        rstart = np.minimum(starts, len(d) - 1)
        inc = np.minimum.reduceat(d, rstart) >= 0
        dec = np.maximum.reduceat(d, rstart) <= 0
        # |delta| widths excluding each frame's first diff and boundary
        # diffs. bit_length is monotonic over uint64, so max-reduce the
        # VALUES per frame and bit-length the k-element result — one
        # whole-array pass (abs) instead of the full bit_lengths kernel
        dmag = np.abs(d).view(np.uint64)
        dmag[np.minimum(starts, len(d) - 1)] = 0
        delta_w = bit_lengths(np.maximum.reduceat(dmag, rstart))
        single = seg_lens == 1
        inc[single] = True
        dec[single] = True
    else:
        inc = dec = np.ones(k, dtype=bool)
        first_d = np.zeros(k, dtype=np.int64)
        delta_w = np.zeros(k, dtype=np.int64)
    safe_range = (maxs.view(np.uint64) - mins.view(np.uint64)) < (
        np.uint64(1) << np.uint64(63)
    )
    mono = (inc | (dec & (first_d != 0))) & safe_range & ~const
    # per-frame max ZIGZAG value without a whole-array zigzag pass:
    # zigzag(x) grows with x for x >= 0 and with |x| for x < 0, so the
    # frame's max zigzag is at one of its extremes — k-sized math on the
    # min/max arrays already computed (unsigned mode's uint64 view is free
    # but its max isn't derivable from int64 min/max under mixed signs,
    # so it keeps the reduceat)
    if signed:
        zz_frame_max = np.maximum(zigzag_encode(maxs), zigzag_encode(mins))
    else:
        zz_frame_max = np.maximum.reduceat(v.view(np.uint64), starts)
    # same monotonicity trick: bit-length the per-frame MAX, not the array
    zz_w = bit_lengths(zz_frame_max)
    from orc_rs_spark.kernels.bitpack import DIRECT_WIDTH_TABLE

    dir_w = DIRECT_WIDTH_TABLE[np.searchsorted(DIRECT_WIDTH_TABLE, np.maximum(zz_w, 1))]
    # patched-base probe stats, computed ONLY if some frame can reach the
    # probe branch (non-const, non-mono, >=8 values) — monotonic/constant
    # columns (offsets, ids) skip three whole-array passes + a histogram
    if bool(np.any(~const & ~mono & (seg_lens >= 8))):
        adj_all = v.view(np.uint64) - np.repeat(mins, seg_lens).view(np.uint64)
        abls = bit_lengths(adj_all)
        fw = np.maximum.reduceat(abls, starts)
        # FoR width rounded to the table, and the 90th-percentile bit-length
        # order statistic for every frame in bulk: bit lengths are 0..64, so
        # one bincount over the whole array + a k x 65 cumsum replaces a
        # np.partition per frame (65*frame_id is fused into the repeat to
        # avoid an extra n-sized multiply temp)
        wfc_all = DIRECT_WIDTH_TABLE[np.searchsorted(DIRECT_WIDTH_TABLE, np.maximum(fw, 1))]
        hist = np.bincount(
            np.repeat(np.arange(k, dtype=np.int64) * 65, seg_lens) + abls,
            minlength=k * 65,
        ).reshape(k, 65)
        rank = (9 * (seg_lens - 1)) // 10 + 1  # 1-based rank of the q90 statistic
        w90_bl = np.argmax(np.cumsum(hist, axis=1) >= rank[:, None], axis=1)
        w90_tab = DIRECT_WIDTH_TABLE[np.searchsorted(DIRECT_WIDTH_TABLE, np.maximum(w90_bl, 1))]
        w90_all = np.where(wfc_all >= 4, w90_tab, wfc_all)
    else:
        adj_all = abls = wfc_all = w90_all = None
    # direct frames are batched per width: padding every frame to a multiple
    # of 8 values makes each frame's packed bytes byte-aligned and
    # independent, so ONE bitpack call per distinct width replaces one call
    # per frame (the per-call dispatch dominated encode time)
    direct_groups: dict[int, list[tuple[int, int, int]]] = {}  # w -> [(out_idx, s, e)]
    patched_groups: dict[int, list[tuple[int, int, int]]] = {}  # w -> [(out_idx, s, e)]
    for i in range(k):
        s, e = int(starts[i]), int(ends[i])
        L = e - s
        if const[i]:
            if 3 <= L <= 10:
                _emit_short_repeat(int(mins[i]), L, signed, out)
            elif L < 3:
                _emit_direct(v[s:e], signed, out)
            else:
                _emit_fixed_delta(int(mins[i]), 0, L, signed, out)
            continue
        if mono[i] and L >= 3:
            _emit_delta(v[s:e], d[s : e - 1], signed, out, max_mag_width=int(delta_w[i]))
            continue
        w_direct = int(dir_w[i])
        cost_direct = 2 + packed_size(L, w_direct)
        # patched-base plausible when FoR alone shrinks width, or when the
        # frame is big enough that trimming outliers can pay for the header
        # (wfc_all is None only when NO frame can reach here — see above)
        if wfc_all is not None and L >= 8 and abs(int(mins[i])).bit_length() + 1 <= 64:
            wfc = int(wfc_all[i])
            seg_bls = abls[s:e]
            w90c = int(w90_all[i])
            est_patched = 4 + 9 + packed_size(L, min(w90c, wfc)) + (31 * 5 if w90c < wfc else 0)
            if est_patched < cost_direct:
                best_plan = None
                best_size = cost_direct
                for w in {w90c, wfc}:
                    sized = _patched_plan(
                        L, int(mins[i]), adj_all[s:e], seg_bls, w, 1 if strict_orc else 0
                    )
                    if sized is not None and sized[0] < best_size:
                        best_size, best_plan = sized
                if best_plan is not None:
                    # header + base + (small) patch entries now; the DATA
                    # pack joins the per-width batch below
                    (pn, pbase, pw_, ppw, ppgw, ppll, pcw, pgaps, ppatches) = best_plan
                    base_bytes, pbw = _encode_base(pbase)
                    out.append(
                        bytes(
                            [
                                (2 << 6) | (encode_direct_width(pw_) << 1) | ((pn - 1) >> 8),
                                (pn - 1) & 0xFF,
                                ((pbw - 1) << 5) | encode_direct_width(ppw),
                                ((ppgw - 1) << 5) | ppll,
                            ]
                        )
                    )
                    out.append(base_bytes)
                    out.append(b"")  # DATA placeholder (batched)
                    patched_groups.setdefault(pw_, []).append((len(out) - 1, s, e))
                    out.append(bitpack((pgaps << np.uint64(ppw)) | ppatches, pcw))
                    continue
        out.append(
            bytes(
                [
                    (1 << 6) | (encode_direct_width(w_direct) << 1) | ((L - 1) >> 8),
                    (L - 1) & 0xFF,
                ]
            )
        )
        out.append(b"")  # placeholder, filled by the per-width batch pack
        direct_groups.setdefault(w_direct, []).append((len(out) - 1, s, e))
    def _batch_pack(
        groups: dict, source: np.ndarray, mask_to_w: bool, zigzag: bool = False
    ) -> None:
        for w, frames in groups.items():
            padded_total = sum((e - s + 7) // 8 * 8 for _, s, e in frames)
            buf = np.zeros(padded_total, dtype=np.uint64)
            pos = 0
            for _, s, e in frames:
                buf[pos : pos + (e - s)] = source[s:e]
                pos += (e - s + 7) // 8 * 8
            if zigzag:
                # zigzag only the gathered direct-frame values (padding
                # zeros map to 0) instead of a whole-array pass up front
                buf = zigzag_encode(buf.view(np.int64))
            if mask_to_w and w < 64:
                buf &= (_U64_ONE << np.uint64(w)) - _U64_ONE
            packed = bitpack(buf, w)
            off = 0
            for out_idx, s, e in frames:
                L = e - s
                nb = packed_size(L, w)
                out[out_idx] = packed[off : off + nb]
                off += (L + 7) // 8 * 8 * w // 8

    _batch_pack(direct_groups, v.view(np.uint64), mask_to_w=False, zigzag=signed)
    # patched DATA keeps only the low w bits (outlier high bits ride the
    # patch list)
    _batch_pack(patched_groups, adj_all, mask_to_w=True)
    return b"".join(out)


def rlev2_encode_runs(values: np.ndarray, signed: bool = True) -> bytes:
    """Run-aware RLEv2 encode for run-dense chunks.

    Splits on exact-repeat runs: runs of 3-10 -> short-repeat, longer runs ->
    fixed-delta-0 blocks, inter-run literals -> frame encoder. The Python
    loop is over runs; the auto-selector picks this mode only when mean run
    length is high, bounding iterations.
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return b""
    boundaries = np.flatnonzero(np.diff(v)) + 1
    starts = np.concatenate(([0], boundaries))
    lengths = np.diff(np.concatenate((starts, [n])))
    out: list = []
    lit_start = None
    for s, ln in zip(starts.tolist(), lengths.tolist()):
        if ln >= 3:
            if lit_start is not None:
                for j in range(lit_start, s, MAX_RUN):
                    _encode_frame(v[j : min(j + MAX_RUN, s)], signed, out)
                lit_start = None
            val = int(v[s])
            if ln <= 10:
                _emit_short_repeat(val, ln, signed, out)
            else:
                rem = ln
                while rem > 0:
                    take = min(rem, MAX_RUN)
                    if take < 3:
                        _emit_direct(v[s : s + take], signed, out)
                    else:
                        _emit_fixed_delta(val, 0, take, signed, out)
                    rem -= take
        elif lit_start is None:
            lit_start = s
    if lit_start is not None:
        for j in range(lit_start, n, MAX_RUN):
            _encode_frame(v[j : min(j + MAX_RUN, n)], signed, out)
    return b"".join(out)


# ---------------------------------------------------------------- decoder


def rlev2_decode(buf: bytes, count: int, signed: bool = True) -> np.ndarray:
    """Decode ``count`` values from an RLEv2 stream -> int64 array.

    Handles arbitrary interleavings of all four sub-modes, like the
    reference's dispatch (/root/reference/src/encoding/rlev2.rs:145-183)
    plus the patched-base mode it left unimplemented.
    """
    b = np.frombuffer(buf, dtype=np.uint8)
    mb = bytes(buf) if not isinstance(buf, bytes) else buf  # fast scalar reads
    out = np.empty(count, dtype=np.int64)
    pos = 0
    got = 0
    # direct frames are only recorded during the header walk and unpacked in
    # one batch per distinct width afterwards (same padding trick as the
    # encoder: each frame zero-padded to a multiple of 8 values stays
    # byte-aligned and independent)
    direct_frames: dict[int, list[tuple[int, int, int, int]]] = {}  # w -> (got, take, pos, n)
    # variable-delta frames batch the same way: one bitunpack per width and
    # ONE global cumsum over all frames' deltas (per-frame values recover as
    # differences against each frame's running offset; int64 wraparound in
    # the global cumsum cancels in the difference, mod-2^64 arithmetic)
    delta_frames: dict[int, list[tuple[int, int, int, int, int, int]]] = {}
    # patched-base frames batch their DATA unpack the same way; their patch
    # LISTS (<= 31 entries each) also batch — one bitunpack per distinct
    # combined width instead of one per frame (patched-heavy streams spent
    # more time in per-frame unpack setup than in actual bit work)
    patched_frames: dict[int, list] = {}
    patch_jobs: dict[int, list] = {}  # cw -> [(frame, patch_pos, pll, pw)]
    blen = len(mb)
    while got < count:
        if pos >= blen:
            raise ValueError(f"RLEv2 stream truncated at {got}/{count} values")
        h0 = mb[pos]  # bytes indexing: plain int, no numpy-scalar boxing
        tag = h0 >> 6
        if tag == 0:  # short repeat
            w = ((h0 >> 3) & 0x7) + 1
            n = (h0 & 0x7) + 3
            u = int.from_bytes(mb[pos + 1 : pos + 1 + w], "big")
            if signed:
                val = (u >> 1) ^ -(u & 1)
            else:  # int64 wrap, matching the array path's uint64->int64 view
                val = u - (1 << 64) if u >= (1 << 63) else u
            out[got : got + n] = val
            pos += 1 + w
        elif tag == 1:  # direct
            w = decode_direct_width((h0 >> 1) & 0x1F)
            n = (((h0 & 1) << 8) | mb[pos + 1]) + 1
            pos += 2
            nbytes = packed_size(n, w)
            if pos + nbytes > blen:
                raise ValueError(f"bitpacked stream truncated at {got}/{count} values")
            direct_frames.setdefault(w, []).append((got, min(n, count - got), pos, n))
            pos += nbytes
        elif tag == 2:  # patched base
            w = decode_direct_width((h0 >> 1) & 0x1F)
            n = (((h0 & 1) << 8) | mb[pos + 1]) + 1
            h2, h3 = mb[pos + 2], mb[pos + 3]
            bw = ((h2 >> 5) & 0x7) + 1
            pw = decode_direct_width(h2 & 0x1F)
            pgw = ((h3 >> 5) & 0x7) + 1
            pll = h3 & 0x1F
            pos += 4
            base = _decode_base(mb[pos : pos + bw])
            pos += bw
            nbytes = packed_size(n, w)
            data_pos = pos
            pos += nbytes
            frame = [got, min(n, count - got), n, data_pos, base, None, None]
            patched_frames.setdefault(w, []).append(frame)
            if pll:
                if pgw + pw > 64:
                    # width table has no entry past 64; a crafted header
                    # (e.g. pw=64, pgw=8) must fail as malformed, not
                    # IndexError past the 32-entry table
                    raise ValueError("invalid patched-base header: pgw + pw > 64")
                cw = closest_direct_width(pgw + pw)
                patch_jobs.setdefault(cw, []).append((frame, pos, pll, pw))
                pos += packed_size(pll, cw)
        else:  # delta
            w = decode_delta_width((h0 >> 1) & 0x1F)
            n = (((h0 & 1) << 8) | mb[pos + 1]) + 1
            pos += 2
            u = 0
            shift = 0
            while True:  # inline varint: ~40x cheaper than an array call
                byte = mb[pos]
                pos += 1
                u |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            base = ((u >> 1) ^ -(u & 1)) if signed else u
            if n == 1:
                out[got] = base
            else:
                u = 0
                shift = 0
                while True:
                    byte = mb[pos]
                    pos += 1
                    u |= (byte & 0x7F) << shift
                    if not byte & 0x80:
                        break
                    shift += 7
                dbase = (u >> 1) ^ -(u & 1)
                take = min(n, count - got)
                if w == 0:  # fixed delta: closed form, no cumsum needed
                    out[got : got + take] = base + dbase * np.arange(take, dtype=np.int64)
                else:
                    # defer: unpack + cumsum happen once per width below
                    nbytes = packed_size(n - 2, w)
                    delta_frames.setdefault(w, []).append((got, take, n, base, dbase, pos))
                    pos += nbytes
        got += n
    for w, frames in direct_frames.items():
        padded_vals = sum((n + 7) // 8 * 8 for _, _, _, n in frames)
        packed = np.zeros(padded_vals * w // 8, dtype=np.uint8)
        off = 0
        for _, _, p, n in frames:
            nb = packed_size(n, w)
            packed[off : off + nb] = b[p : p + nb]
            off += (n + 7) // 8 * 8 * w // 8
        vals = _from_unsigned(bitunpack(packed, w, padded_vals), signed)
        voff = 0
        for g, take, _, n in frames:
            out[g : g + take] = vals[voff : voff + take]
            voff += (n + 7) // 8 * 8
    for cw, jobs in patch_jobs.items():
        padded = sum((pll + 7) // 8 * 8 for _, _, pll, _ in jobs)
        packed = np.zeros(padded * cw // 8, dtype=np.uint8)
        off = 0
        for _, p, pll, _ in jobs:
            nb = packed_size(pll, cw)
            packed[off : off + nb] = b[p : p + nb]
            off += (pll + 7) // 8 * 8 * cw // 8
        ents = bitunpack(packed, cw, padded)
        voff = 0
        for frame, _, pll, pw in jobs:
            e = ents[voff : voff + pll]
            frame[5] = np.cumsum((e >> np.uint64(pw)).astype(np.int64))  # idx
            frame[6] = e & ((_U64_ONE << np.uint64(pw)) - _U64_ONE)  # patches
            voff += (pll + 7) // 8 * 8
    for w, frames in patched_frames.items():
        padded_vals = sum((n + 7) // 8 * 8 for _, _, n, _, _, _, _ in frames)
        packed = np.zeros(padded_vals * w // 8, dtype=np.uint8)
        off = 0
        for _, _, n, p, _, _, _ in frames:
            nb = packed_size(n, w)
            packed[off : off + nb] = b[p : p + nb]
            off += (n + 7) // 8 * 8 * w // 8
        vals = bitunpack(packed, w, padded_vals)
        voff = 0
        for g, take, n, p, base, idx, patches in frames:
            seg = vals[voff : voff + n]
            if idx is not None:
                seg[idx] |= patches << np.uint64(w)
            out[g : g + take] = (
                np.uint64(np.int64(base).astype(np.uint64)) + seg
            ).astype(np.int64)[:take]
            voff += (n + 7) // 8 * 8
    for w, all_frames in delta_frames.items():
        # tile into ~128K-value groups: amortizes the per-frame Python cost
        # ~250x while keeping every batched pass (gather, unpack, cumsum)
        # inside L2/L3 — a global pass re-streams DRAM and loses the win
        # back at high core counts where bandwidth is the budget
        group: list = []
        group_vals = 0
        groups = []
        for f in all_frames:
            group.append(f)
            group_vals += f[2]
            if group_vals >= 131072:
                groups.append(group)
                group = []
                group_vals = 0
        if group:
            groups.append(group)
        for frames in groups:
            _decode_delta_group(frames, w, b, out)
    return out


def _decode_delta_group(frames: list, w: int, b: np.ndarray, out: np.ndarray) -> None:
    m_counts = np.array([f[2] - 2 for f in frames], dtype=np.int64)
    padded_counts = (m_counts + 7) // 8 * 8
    total_padded = int(padded_counts.sum())
    packed = np.zeros(total_padded * w // 8, dtype=np.uint8)
    off = 0
    for (_, _, n, _, _, p), pc in zip(frames, padded_counts.tolist()):
        nb = packed_size(n - 2, w)
        packed[off : off + nb] = b[p : p + nb]
        off += pc * w // 8
    mags_padded = bitunpack(packed, w, total_padded).view(np.int64)
    # one delta sequence per frame: [dbase, sign*mag, sign*mag, ...];
    # padding stripped by per-frame slice writes (frames are ~512 vals,
    # so this loop is 1/512th of the data volume)
    d_counts = m_counts + 1
    d_starts_np = np.cumsum(d_counts) - d_counts
    d_starts = d_starts_np.tolist()
    total_d = int(d_counts.sum())
    deltas = np.empty(total_d, dtype=np.int64)
    po = 0
    for i, (_, _, n, _, dbase, _) in enumerate(frames):
        ds = d_starts[i]
        deltas[ds] = dbase
        m = n - 2
        if m:
            if dbase < 0:
                np.negative(mags_padded[po : po + m], out=deltas[ds + 1 : ds + 1 + m])
            else:
                deltas[ds + 1 : ds + 1 + m] = mags_padded[po : po + m]
        po += (m + 7) // 8 * 8
    csum = np.cumsum(deltas)
    if len(frames) > 1:
        frame_offs = np.concatenate(([0], csum[d_starts_np[1:] - 1])).tolist()
    else:
        frame_offs = [0]
    for i, (g, take, n, base, dbase, p) in enumerate(frames):
        out[g] = base
        if take > 1:
            a = d_starts[i]
            out[g + 1 : g + take] = (base - frame_offs[i]) + csum[a : a + take - 1]

def rlev2_run_modes(buf: bytes, count: int) -> dict[str, int]:
    """Tally sub-mode usage across a stream's run headers (diagnostic).

    Walks headers only, skipping payloads — the gate query for patched-base
    (C11, ``todo!()`` in the reference, rlev2.rs:185-187) uses this to
    CERTIFY the encoder actually routed frames to patched-base rather than
    merely producing decodable bytes."""
    mb = bytes(buf)
    modes = {"short_repeat": 0, "direct": 0, "patched": 0, "delta": 0}
    pos, got, blen = 0, 0, len(mb)

    def _trunc(got_now: int):
        return ValueError(f"RLEv2 stream truncated at {got_now}/{count} values")

    def _byte(p: int) -> int:
        # every header byte goes through a bounds check so a mid-header
        # truncation raises the documented ValueError, not IndexError
        if p >= blen:
            raise _trunc(got)
        return mb[p]

    def _skip_varint(p: int) -> int:
        while _byte(p) & 0x80:
            p += 1
        return p + 1

    while got < count:
        if pos >= blen:
            raise _trunc(got)
        h0 = mb[pos]
        tag = h0 >> 6
        if tag == 0:  # short repeat
            w = ((h0 >> 3) & 0x7) + 1
            n = (h0 & 0x7) + 3
            pos += 1 + w
            modes["short_repeat"] += 1
        elif tag == 1:  # direct
            w = decode_direct_width((h0 >> 1) & 0x1F)
            n = (((h0 & 1) << 8) | _byte(pos + 1)) + 1
            pos += 2 + packed_size(n, w)
            modes["direct"] += 1
        elif tag == 2:  # patched base
            w = decode_direct_width((h0 >> 1) & 0x1F)
            n = (((h0 & 1) << 8) | _byte(pos + 1)) + 1
            h2, h3 = _byte(pos + 2), _byte(pos + 3)
            bw = ((h2 >> 5) & 0x7) + 1
            pw = decode_direct_width(h2 & 0x1F)
            pgw = ((h3 >> 5) & 0x7) + 1
            pll = h3 & 0x1F
            pos += 4 + bw + packed_size(n, w)
            if pll:
                if pgw + pw > 64:
                    raise ValueError("invalid patched-base header: pgw + pw > 64")
                pos += packed_size(pll, closest_direct_width(pgw + pw))
            modes["patched"] += 1
        else:  # delta
            w = decode_delta_width((h0 >> 1) & 0x1F)
            n = (((h0 & 1) << 8) | _byte(pos + 1)) + 1
            pos = _skip_varint(pos + 2)  # base
            if n >= 2:
                pos = _skip_varint(pos)  # delta base
                if n > 2 and w > 0:
                    pos += packed_size(n - 2, w)
            modes["delta"] += 1
        got += n
    if pos > blen:  # final run's payload extends past the buffer
        raise _trunc(got)
    return modes
