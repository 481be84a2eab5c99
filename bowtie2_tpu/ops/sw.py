"""Banded gapped-extension DP (Smith-Waterman family), batched for TPU.

Replaces the reference's four SSE striped-Smith-Waterman kernels
(aligner_swsse_ee_u8/i16.cpp, aligner_swsse_loc_u8/i16.cpp, Farrar striping)
with a row-scan rectangle formulation natural to the VPU:

  * One DP problem = read (rows) × the reference columns of the framed DP
    rectangle [anchor - 2*maxgap, anchor + rdlen-1 + 2*maxgap] — exactly
    the reference's seed-extension rect (DynProgFramer, dp_framer.cpp:81:
    maxgap = min(max(maxrdgap, maxrfgap), --dpad)). Paths may wander
    anywhere inside the rect, so e.g. long insertions (bounded only by the
    score budget) are found just as the reference finds them.
  * The row recurrence is: diagonal move = column-1 (previous row), ref-gap
    E (insertion: read char consumed) = same column (previous row), read-gap
    F (deletion: ref char consumed) = columns < c (same row) — resolved
    exactly with a max-plus prefix scan (Kogge-Stone, log2(W) shift/max
    steps). This is the "lazy-F" identity the SSE kernels exploit
    (aligner_swsse_ee_u8.cpp lazy-F loop), done as a scan instead of a loop.
  * The whole batch advances one row per scan step: carries are (B, W)
    registers, per-row inputs arrive as scan xs (reads/quals transposed);
    the reference window is a constant (B, W) operand — there is NO
    per-problem gather anywhere in the hot loop (vmapped dynamic_slice
    measured ~30x slower than such formulations on v5e).
  * Scoring matches scoring.h defaults exactly in int32 (match 0 / mismatch
    -(2..6 by qual, MMP Q,6,2) / N -1 / gaps -(5+3k)) so scores are
    bit-identical to the reference's.

End-to-end mode: whole read must align (rows are mandatory); start/end
column free within the rect (dp_framer.h:59). Local mode: scores clamp at
0, match bonus +2, best cell anywhere wins (soft clipping in backtrace).

Traceback: per-cell direction bits are kept in device memory ((Lmax, B, W)
uint8 — on-TPU HBM is cheap enough at short-read scale to skip the
reference's checkpoint/mini-fill machinery, sse_util.h / aligner_bt.h) and
walked by `backtrace` ON DEVICE; only ~1 byte/step/alignment of packed op
codes returns to the host, where CIGAR/MD strings are assembled.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.int32(-(1 << 29))

# traceback encoding (per cell, uint8):
#   bits 0-1: H source: 0=diag(match/mismatch), 1=E (ref gap), 2=F (read gap),
#             3=local-start (local mode: H clamped to 0 here)
#   bit 2: E came from E (extension) rather than H (open)
#   bit 3: F came from F (extension) rather than H (open)
H_DIAG, H_E, H_F, H_START = 0, 1, 2, 3


class SWParams(NamedTuple):
    """Static scoring params (python ints — part of the jit key)."""
    match_bonus: int = 0          # 0 e2e / 2 local (scoring.h DEFAULT_MATCH_BONUS)
    mm_pen_max: int = 6           # MMP Q,6,2
    mm_pen_min: int = 2
    n_pen: int = 1
    read_gap_open: int = 5        # RDG 5,3 — first gap char costs open+extend
    read_gap_extend: int = 3
    ref_gap_open: int = 5         # RFG 5,3
    ref_gap_extend: int = 3
    gap_barrier: int = 4          # --gbar: no gaps within this many positions
                                  # of either read end (scoring.h gapbar,
                                  # veto masks aligner_swsse_ee_u8.cpp:119-123)
    local: bool = False


def mm_penalty_from_qual(quals: jnp.ndarray, p: SWParams) -> jnp.ndarray:
    """Qual-scaled mismatch penalty (scoring.h initPens COST_MODEL_QUAL):
    pen = MN + floor(min(q,40)/40 * (MX-MN))."""
    q = jnp.minimum(quals.astype(jnp.int32), 40)
    return p.mm_pen_min + (q * (p.mm_pen_max - p.mm_pen_min)) // 40


class SWResult(NamedTuple):
    score: jnp.ndarray    # (B,) int32 best alignment score
    row: jnp.ndarray      # (B,) int32 row of best end (== read_len-1 for e2e)
    lane: jnp.ndarray     # (B,) int32 lane (diagonal) of best end
    dirs: jnp.ndarray     # (Lmax, B, ceil(W/8)) int32: traceback directions,
                          # 8 cells per word, 4 bits each (cell j in word
                          # j//8 at bit 4*(j%8))
    origin: jnp.ndarray = None  # (B,) int32 rect column of the FIRST ref
                          # char the best path consumes (== backtrace
                          # ref_start_win), when track_origin=True. Gives
                          # exact reference extents for every candidate
                          # without a backtrace — the PE pairing
                          # classifier's input (pe.cpp:37 works on extents).


def unpack_dirs(dirs_packed, W: int):
    """(Lmax, B, Wp) packed words → (Lmax, B, W) per-cell uint8 (host/tests)."""
    import numpy as np
    d = np.asarray(dirs_packed)
    cells = (d[:, :, :, None] >> (4 * np.arange(8))[None, None, None, :]) & 15
    return cells.reshape(d.shape[0], d.shape[1], -1)[:, :, :W].astype(np.uint8)


def _prefix_max_excl(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive running max along the last axis (Kogge-Stone)."""
    W = x.shape[-1]
    out = jnp.concatenate([jnp.full(x.shape[:-1] + (1,), NEG_INF, x.dtype),
                           x[..., :-1]], axis=-1)
    shift = 1
    while shift < W:
        shifted = jnp.concatenate(
            [jnp.full(x.shape[:-1] + (shift,), NEG_INF, x.dtype),
             out[..., :-shift]], axis=-1)
        out = jnp.maximum(out, shifted)
        shift <<= 1
    return out


def _prefix_max_payload_excl(x: jnp.ndarray, pay: jnp.ndarray):
    """Exclusive running max + its payload, ties won by the LATER index.

    The later-on-ties rule mirrors the forward pass's strict-> gap-open
    preference (an F run stops at the nearest open opportunity), so the
    payload follows exactly the path `backtrace` would walk."""
    W = x.shape[-1]
    out_v = jnp.concatenate([jnp.full(x.shape[:-1] + (1,), NEG_INF, x.dtype),
                             x[..., :-1]], axis=-1)
    out_p = jnp.concatenate([jnp.full(pay.shape[:-1] + (1,), -1, pay.dtype),
                             pay[..., :-1]], axis=-1)
    shift = 1
    while shift < W:
        sh_v = jnp.concatenate(
            [jnp.full(x.shape[:-1] + (shift,), NEG_INF, x.dtype),
             out_v[..., :-shift]], axis=-1)
        sh_p = jnp.concatenate(
            [jnp.full(pay.shape[:-1] + (shift,), -1, pay.dtype),
             out_p[..., :-shift]], axis=-1)
        take_sh = sh_v > out_v          # strict: the later segment keeps ties
        out_v = jnp.maximum(out_v, sh_v)
        out_p = jnp.where(take_sh, sh_p, out_p)
        shift <<= 1
    return out_v, out_p


@partial(jax.jit, static_argnames=("params", "band", "track_origin"))
def sw_banded(reads: jnp.ndarray, quals: jnp.ndarray, read_lens: jnp.ndarray,
              refwins: jnp.ndarray, params: SWParams, band: int,
              rect_cols: jnp.ndarray = None,
              col_lo: jnp.ndarray = None,
              track_origin: bool = False) -> SWResult:
    """Batched rectangle DP.

    reads: (B, Lmax) int32 codes 0..4 (4=N); quals: (B, Lmax) int32;
    read_lens: (B,) int32; refwins: (B, Lmax + 2*band + 1) int32 codes 0..5
    (4=N, 5=out-of-reference); band = 2*maxgap (the rect pad each side,
    dp_framer.cpp:97-100). refwins[b, c] is the ref char at rect column c;
    column G + i is read row i's no-gap column. rect_cols (B,) is the
    number of valid columns per problem — defaults to read_len + 2*band + 1
    (the seed-extension rect); mate-rescue windows pass the full width.

    track_origin=True additionally propagates, per cell, the rect column of
    the first reference char consumed on the best path into that cell
    (sentinel -1 = no ref char consumed yet), with tie rules matching the
    direction bits, so SWResult.origin equals what a backtrace would report
    as ref_start_win. Costs ~40% extra DP time; used by the fused PE path.
    """
    p = params
    G = band
    B, Lmax = reads.shape
    W = refwins.shape[1]        # >= Lmax + 2*G + 1 (wider when word-aligned)
    mmpen_t = mm_penalty_from_qual(quals, p).T          # (Lmax, B)
    reads_t = reads.T                                   # (Lmax, B)
    lane_e = jnp.arange(W, dtype=jnp.int32) * p.read_gap_extend

    rgo = p.read_gap_open + p.read_gap_extend   # first read-gap char
    fgo = p.ref_gap_open + p.ref_gap_extend     # first ref-gap char

    if rect_cols is None:
        rect_cols = read_lens + 2 * G + 1
    ar = jnp.arange(W, dtype=jnp.int32)[None, :]
    if col_lo is None:
        col_ok = ar < rect_cols[:, None]
    else:
        # word-aligned windows: rect columns start at col_lo (>= 0); the
        # window array may be wider than the rect on both sides
        col_ok = (ar >= col_lo[:, None]) \
            & (ar < (col_lo + rect_cols)[:, None])
    refwins = jnp.where(col_ok, refwins, 5)

    colw = jnp.arange(W, dtype=jnp.int32)[None, :]

    def row_fn(carry, xs):
        if track_origin:
            (h_prev, e_prev, o_prev, oe_prev, best, best_row, best_lane,
             best_origin, i) = carry
        else:
            h_prev, e_prev, best, best_row, best_lane, i = carry
        rc, qp = xs                                     # (B,), (B,)
        active = i < read_lens
        refc = refwins

        is_n = (rc[:, None] >= 4) | (refc == 4)
        oob = refc >= 5
        eq = (refc == rc[:, None]) & ~is_n & ~oob
        sub = jnp.where(eq, p.match_bonus,
              jnp.where(is_n & ~oob, -p.n_pen, -qp[:, None]))
        sub = jnp.where(oob, NEG_INF // 2, sub)

        # E (ref gap / insertion, vertical): same column, previous row
        pad = jnp.full((B, 1), NEG_INF)
        e_open = h_prev - fgo
        e_ext = e_prev - p.ref_gap_extend
        e_cur = jnp.maximum(e_open, e_ext)
        e_cur = jnp.where(oob, NEG_INF, e_cur)
        e_from_ext = e_ext > e_open

        # gap barrier: gap-state cells are dead at rows within gbar of
        # either read end (the SSE kernels' veto words,
        # aligner_swsse_ee_u8.cpp:119-123)
        if p.gap_barrier > 0:
            bar = ((i < p.gap_barrier) |
                   (i >= read_lens - p.gap_barrier))[:, None]
            e_cur = jnp.where(bar, NEG_INF, e_cur)

        # H without F: diagonal move = previous row, column-1
        h_diag = jnp.concatenate([pad, h_prev[:, :-1]], axis=1) + sub
        h_noF = jnp.maximum(h_diag, e_cur)
        src_noF = jnp.where(e_cur > h_diag, H_E, H_DIAG).astype(jnp.uint8)

        if track_origin:
            # origin propagation, same tie rules as the direction bits:
            # diag consumes ref char j (origin j if none consumed yet);
            # E (vertical) consumes none; an F run whose maximizing k is
            # h_noF[k] consumes ref chars k+1..j first.
            o_sh = jnp.concatenate(
                [jnp.full((B, 1), -1, jnp.int32), o_prev[:, :-1]], axis=1)
            o_diag = jnp.where(o_sh < 0, colw, o_sh)
            oe_new = jnp.where(e_from_ext, oe_prev, o_prev)
            o_noF = jnp.where(e_cur > h_diag, oe_new, o_diag)

        # F (read gap, horizontal): a gap run from lane k to lane j consumes
        # j-k ref chars and costs rgo + (j-k-1)*ext, so
        #   F[j] = max_{k<j} (h_noF[k] + k*ext) - rgo + ext - j*ext
        f_arg = h_noF - rgo + p.read_gap_extend + lane_e[None, :]
        if track_origin:
            ofix = jnp.where(o_noF < 0, colw + 1, o_noF)
            f_pre, o_F = _prefix_max_payload_excl(f_arg, ofix)
            f_cur = f_pre - lane_e[None, :]
        else:
            f_cur = _prefix_max_excl(f_arg) - lane_e[None, :]
        # F-from-extension marker: whether the maximizing k is < j-1
        f_open = jnp.concatenate([pad, h_noF[:, :-1]], axis=1) - rgo
        f_from_ext = f_cur > f_open
        if p.gap_barrier > 0:
            f_cur = jnp.where(bar, NEG_INF, f_cur)

        h_cur = jnp.maximum(h_noF, f_cur)
        src = jnp.where(f_cur > h_noF, jnp.uint8(H_F), src_noF)
        if track_origin:
            o_cur = jnp.where(f_cur > h_noF, o_F, o_noF)

        if p.local:
            # 0-score cells reached via the diagonal are local starts (the
            # reference clips 0-net prefixes of matches/mismatches) but a 0
            # reached through a gap state continues the traceback (0-net
            # prefixes ending in a gap are kept; observed golden behavior)
            clamp = (h_cur < 0) | ((h_cur == 0) & (src == H_DIAG))
            h_cur = jnp.where(h_cur < 0, 0, h_cur)
            src = jnp.where(clamp, jnp.uint8(H_START), src)
            if track_origin:
                o_cur = jnp.where(clamp, -1, o_cur)   # path restarts here

        h_cur = jnp.maximum(h_cur, NEG_INF)   # floor: no int32 underflow drift

        dirbits = (src.astype(jnp.int32)
                   | jnp.where(e_from_ext, 4, 0)
                   | jnp.where(f_from_ext, 8, 0))
        # pack 8 cells per int32 word (4 bits each): 2x smaller dirs in HBM
        # and int32-element (not uint8) transposes in the backtrace prep —
        # uint8 axis shuffles measured ~10x slower on this backend
        if W % 8:
            dirbits = jnp.concatenate(
                [dirbits, jnp.zeros((B, 8 - W % 8), jnp.int32)], axis=1)
        packed = jnp.sum(
            dirbits.reshape(B, -1, 8)
            << (4 * jnp.arange(8, dtype=jnp.int32))[None, None, :],
            axis=2, dtype=jnp.int32)

        # best tracking: e2e → only at final row; local → any cell
        row_best = jnp.max(h_cur, axis=1)
        # on equal best scores the reference's reported alignment ends at
        # the RIGHTMOST column (and, in local mode, the latest row) —
        # derived from golden tie-break cases
        colw_i = jnp.arange(W, dtype=jnp.int32)[None, :]
        row_best_lane = jnp.max(
            jnp.where(h_cur == row_best[:, None], colw_i, -1), axis=1)
        if p.local:
            take = active & (row_best >= best)
        else:
            take = (i == read_lens - 1)
        best = jnp.where(take, row_best, best)
        best_row = jnp.where(take, i, best_row)
        best_lane = jnp.where(take, row_best_lane, best_lane)

        h_out = jnp.where(active[:, None], h_cur, h_prev)
        e_out = jnp.where(active[:, None], e_cur, e_prev)
        if track_origin:
            row_best_origin = jnp.take_along_axis(
                o_cur, jnp.clip(row_best_lane, 0, W - 1)[:, None],
                axis=1)[:, 0]
            best_origin = jnp.where(take, row_best_origin, best_origin)
            o_out = jnp.where(active[:, None], o_cur, o_prev)
            oe_out = jnp.where(active[:, None], oe_new, oe_prev)
            return (h_out, e_out, o_out, oe_out, best, best_row, best_lane,
                    best_origin, i + 1), packed
        return (h_out, e_out, best, best_row, best_lane, i + 1), packed

    h0 = jnp.zeros((B, W), jnp.int32)          # free start on row -1, any lane
    e0 = jnp.full((B, W), NEG_INF)
    if track_origin:
        o0 = jnp.full((B, W), -1, jnp.int32)
        init = (h0, e0, o0, o0, jnp.full((B,), NEG_INF),
                jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
                jnp.zeros(B, jnp.int32), jnp.int32(0))
        (h, e, _, _, best, best_row, best_lane, best_origin, _), dirs = \
            jax.lax.scan(row_fn, init, (reads_t, mmpen_t))
        return SWResult(best, best_row, best_lane, dirs, best_origin)
    init = (h0, e0, jnp.full((B,), NEG_INF), jnp.zeros(B, jnp.int32),
            jnp.zeros(B, jnp.int32), jnp.int32(0))
    (h, e, best, best_row, best_lane, _), dirs = jax.lax.scan(
        row_fn, init, (reads_t, mmpen_t))
    return SWResult(best, best_row, best_lane, dirs)


# ----------------------------------------------------------------------
# Device backtrace: walk direction matrices for a compacted set of chosen
# candidates, emitting one packed op byte per step. Replaces the reference's
# BtBranchTracer (aligner_bt.h:544) — with full matrices kept on device
# there is nothing to re-fill, the walk is a straight readout.
# ----------------------------------------------------------------------

# per-step packed op byte: op (2 bits) | refchar (3 bits) | ismatch (1 bit)
OP_M, OP_I, OP_D, OP_NONE = 0, 1, 2, 3


def bt_steps(Lmax: int, W: int, local: bool) -> int:
    """Backtrace walk length. M+I <= Lmax; total gap chars are bounded by
    the score budget (each costs >= extend=3; valid alignments only):
    e2e: -minsc ~ 0.6*L => D < L/4; local: (perfect-minsc)/3 < 2L/3."""
    slack = (2 * Lmax) // 3 + 48 if local else Lmax // 4 + 48
    return min(Lmax + slack, Lmax + W + 2)


class BTResult(NamedTuple):
    ops: jnp.ndarray          # (S, Bc) uint8 packed op bytes, walk order
                              # (read end → read start); OP_NONE after done
    read_start: jnp.ndarray   # (Bc,) first read pos aligned (soft-clip start)
    ref_start_win: jnp.ndarray  # (Bc,) window index of first ref char consumed
    n_mm: jnp.ndarray         # (Bc,) mismatches incl N positions (XM)
    n_go: jnp.ndarray         # (Bc,) gap opens (XO)
    n_gc: jnp.ndarray         # (Bc,) gap chars (XG)
    n_refn: jnp.ndarray       # (Bc,) aligned positions over ref N (XN)
    score_check: jnp.ndarray  # (Bc,) recomputed score


@partial(jax.jit, static_argnames=("params", "band"))
def backtrace(dirs: jnp.ndarray, sel: jnp.ndarray, rows: jnp.ndarray,
              lanes: jnp.ndarray, reads: jnp.ndarray, quals: jnp.ndarray,
              refwins: jnp.ndarray, params: SWParams, band: int) -> BTResult:
    """Walk chosen candidates' direction matrices on device.

    dirs: (Lmax, B, Wp) 4-bit-packed words from sw_banded over the FULL
    candidate batch; sel: (Bc,) indices into that batch; rows/lanes: (Bc,)
    best-cell coords; reads/quals: (Bc, Lmax) for the selected candidates;
    refwins: (Bc, W) with W <= 8*Wp.
    """
    p = params
    G = band
    Lmax, B, Wp = dirs.shape
    W = refwins.shape[1]
    Bc = sel.shape[0]
    S = bt_steps(Lmax, W, p.local)
    # per-candidate flattened (Bc, Lmax*Wp) layout: the per-step lookup is
    # then a take_along_axis, which XLA compiles ~200x faster than a flat
    # 1-D gather over the full dirs buffer (measured: 0.6s vs 135s)
    dirs_sel = jnp.take(dirs, sel, axis=1).transpose(1, 0, 2).reshape(Bc, -1)
    mmpen = mm_penalty_from_qual(quals, p)

    def step(carry, _):
        i, j, mode, done, nmm, ngo, ngc, nrefn, score, refmin = carry
        jc = jnp.clip(j, 0, W - 1)
        flat = (jnp.clip(i, 0, Lmax - 1) * Wp + jc // 8)[:, None]
        word = jnp.take_along_axis(dirs_sel, flat, axis=1)[:, 0]
        d = (word >> (4 * (jc % 8))) & 15
        src = d & 3

        rc = jnp.take_along_axis(reads, jnp.clip(i, 0, Lmax - 1)[:, None],
                                 axis=1)[:, 0]
        qp = jnp.take_along_axis(mmpen, jnp.clip(i, 0, Lmax - 1)[:, None],
                                 axis=1)[:, 0]
        widx = jnp.clip(j, 0, refwins.shape[1] - 1)
        fc = jnp.take_along_axis(refwins, widx[:, None], axis=1)[:, 0]

        at_start = (mode == 0) & (src == H_START)
        done_now = done | at_start | (i < 0)

        # what this step emits (when not done):
        #  mode H + src DIAG          → M
        #  mode H + src E, or mode E  → I (ref gap: read char consumed)
        #  mode H + src F, or mode F  → D (read gap: ref char consumed)
        emit_m = (mode == 0) & (src == H_DIAG)
        emit_i = ((mode == 0) & (src == H_E)) | (mode == 1)
        emit_d = ((mode == 0) & (src == H_F)) | (mode == 2)
        emit_m, emit_i, emit_d = (e & ~done_now for e in (emit_m, emit_i, emit_d))

        is_n = (rc >= 4) | (fc == 4)
        ismatch = emit_m & (rc == fc) & ~is_n & (fc < 4)
        m_sc = jnp.where(ismatch, p.match_bonus,
               jnp.where(is_n, -p.n_pen, -qp))

        e_ext = (d & 4) != 0
        f_ext = (d & 8) != 0
        i_open = emit_i & ~e_ext
        d_open = emit_d & ~f_ext

        score = score + jnp.where(emit_m, m_sc, 0) \
            - jnp.where(emit_i, p.ref_gap_extend, 0) \
            - jnp.where(i_open, p.ref_gap_open, 0) \
            - jnp.where(emit_d, p.read_gap_extend, 0) \
            - jnp.where(d_open, p.read_gap_open, 0)
        nmm = nmm + (emit_m & ~ismatch & (rc < 4) & (fc != 4)).astype(jnp.int32) \
                  + (emit_m & is_n).astype(jnp.int32)
        nrefn = nrefn + (emit_m & (fc == 4)).astype(jnp.int32)
        ngo = ngo + i_open.astype(jnp.int32) + d_open.astype(jnp.int32)
        ngc = ngc + emit_i.astype(jnp.int32) + emit_d.astype(jnp.int32)
        refmin = jnp.where(emit_m | emit_d, jnp.minimum(refmin, j), refmin)

        op = jnp.where(emit_m, OP_M,
             jnp.where(emit_i, OP_I,
             jnp.where(emit_d, OP_D, OP_NONE)))
        packed = (op | (jnp.clip(fc, 0, 5) << 2)
                  | (ismatch.astype(jnp.int32) << 5)).astype(jnp.uint8)

        # column-space moves: M → (i-1, j-1); I → (i-1, j); D → (i, j-1)
        i2 = jnp.where(emit_m | emit_i, i - 1, i)
        j2 = jnp.where(emit_m | emit_d, j - 1, j)
        mode2 = jnp.where(emit_i & e_ext, 1,
                jnp.where(emit_d & f_ext, 2, 0))
        i = jnp.where(done_now, i, i2)
        j = jnp.where(done_now, j, j2)
        mode = jnp.where(done_now, mode, mode2)
        done = done_now | (i < 0)
        return (i, j, mode, done, nmm, ngo, ngc, nrefn, score, refmin), packed

    z = jnp.zeros(Bc, jnp.int32)
    init = (rows, lanes, z, jnp.zeros(Bc, bool), z, z, z, z, z,
            jnp.full(Bc, 1 << 30, jnp.int32))
    (i, j, mode, done, nmm, ngo, ngc, nrefn, score, refmin), ops = \
        jax.lax.scan(step, init, None, length=S)
    read_start = i + 1
    refmin = jnp.where(refmin == (1 << 30), 0, refmin)
    return BTResult(ops, read_start, refmin, nmm, ngo, ngc, nrefn, score)


def diag_readout(reads: jnp.ndarray, quals: jnp.ndarray,
                 refwins: jnp.ndarray, rows: jnp.ndarray,
                 lanes: jnp.ndarray, lens: jnp.ndarray,
                 params: SWParams):
    """Vectorized gapless readout along the diagonal ending at (rows, lanes).

    For an e2e candidate whose best score EQUALS the score of the pure
    diagonal path ending at its best cell, the walked backtrace is exactly
    that diagonal: the forward pass prefers DIAG on ties (sw_banded
    src_noF/src), so score equality forces every dir bit on the diagonal
    to DIAG (induction: H(i,j) = prefix(i) down the whole path). This
    readout replaces the 168+-step scan `backtrace` for such candidates
    with ONE gather + elementwise ops — the overwhelmingly common case on
    real corpora (gapless alignments), leaving the scan walk for the rare
    gapped candidates. Valid for non-local scoring only (local soft-clip
    starts need the walk).

    Returns (ops, dscore, n_mm, n_refn, ref_start_win, gapless_ok) where
    ops is (Lmax, Bc) uint8 in walk order (read end → start; OP_NONE
    after the read is exhausted) and gapless_ok says the diagonal is
    fully inside the window and N-legal (caller must ALSO require
    dscore == best score).
    """
    p = params
    Bc, Lmax = reads.shape
    Wf = refwins.shape[1]
    base = lanes - rows                                   # start column
    idx = base[:, None] + jnp.arange(Lmax, dtype=jnp.int32)[None, :]
    inwin = (idx >= 0) & (idx < Wf)
    diag = jnp.take_along_axis(refwins, jnp.clip(idx, 0, Wf - 1), axis=1)
    diag = jnp.where(inwin, diag, 5)
    live = jnp.arange(Lmax, dtype=jnp.int32)[None, :] < lens[:, None]
    is_n = (reads >= 4) | (diag == 4)
    oob = diag >= 5
    eq = (diag == reads) & ~is_n & ~oob
    mmpen = mm_penalty_from_qual(quals, p)
    sub = jnp.where(eq, p.match_bonus,
                    jnp.where(is_n & ~oob, -p.n_pen, -mmpen))
    dscore = jnp.sum(jnp.where(live & ~oob, sub, 0), axis=1)
    gapless_ok = ~jnp.any(live & oob, axis=1)
    n_mm = jnp.sum((live & (~eq & (reads < 4) & (diag != 4) | is_n))
                   .astype(jnp.int32), axis=1)
    n_refn = jnp.sum((live & (diag == 4)).astype(jnp.int32), axis=1)

    # packed op bytes in walk order: step s emits read pos rows - s
    rev = rows[:, None] - jnp.arange(Lmax, dtype=jnp.int32)[None, :]
    rev_ok = rev >= 0
    revc = jnp.clip(rev, 0, Lmax - 1)
    fc = jnp.take_along_axis(jnp.clip(diag, 0, 5), revc, axis=1)
    ism = jnp.take_along_axis(eq.astype(jnp.int32), revc, axis=1)
    opbyte = jnp.where(rev_ok, OP_M | (fc << 2) | (ism << 5),
                       OP_NONE).astype(jnp.uint8)
    return opbyte.T, dscore, n_mm, n_refn, base, gapless_ok


# ---------------------- numpy oracle (for tests) ----------------------

def sw_full_numpy(read, quals, refwin, p: SWParams):
    """Unbanded affine-gap DP over read × full refwin, free ref start/end.

    e2e: whole read aligns, score of best end in last row.
    local: max cell, clamped at 0. Returns best score (int).
    """
    L, R = len(read), len(refwin)
    mm = [p.mm_pen_min + (min(int(q), 40) * (p.mm_pen_max - p.mm_pen_min)) // 40
          for q in quals]
    NEG = -(1 << 29)
    rgo = p.read_gap_open + p.read_gap_extend
    fgo = p.ref_gap_open + p.ref_gap_extend
    # H[i][j]: best score of alignment ending with read[i] aligned/produced at
    # refwin col j boundary. Use (L+1) x (R+1) matrices, i=#read consumed.
    H = np.full((L + 1, R + 1), NEG, np.int64)
    E = np.full((L + 1, R + 1), NEG, np.int64)  # ref gap (read consumed)
    F = np.full((L + 1, R + 1), NEG, np.int64)  # read gap (ref consumed)
    H[0, :] = 0                                  # free start anywhere on ref
    for i in range(1, L + 1):
        rc, pen = read[i - 1], mm[i - 1]
        barred = (i - 1) < p.gap_barrier or (L - i) < p.gap_barrier
        for j in range(0, R + 1):
            E[i, j] = max(H[i - 1, j] - fgo, E[i - 1, j] - p.ref_gap_extend)
            if barred:
                E[i, j] = NEG
            if j > 0:
                F[i, j] = max(H[i, j - 1] - rgo, F[i, j - 1] - p.read_gap_extend)
                if barred:
                    F[i, j] = NEG
                ref_c = refwin[j - 1]
                if ref_c >= 5 or rc >= 5:
                    sub = NEG // 2
                elif rc >= 4 or ref_c == 4:
                    sub = -p.n_pen
                elif rc == ref_c:
                    sub = p.match_bonus
                else:
                    sub = -pen
                diag = H[i - 1, j - 1] + sub
            else:
                diag = NEG
            H[i, j] = max(diag, E[i, j], F[i, j])
            if p.local:
                H[i, j] = max(H[i, j], 0)
    if p.local:
        return int(H.max())
    return int(H[L, :].max())


def sw_full_numpy_cells(read, quals, refwin, p: SWParams):
    """sw_full_numpy's end-row cell vector (e2e): H[L, j] for j in
    [0, R], the best score of a full-read alignment whose last consumed
    ref char is refwin[j-1], plus the START column (origin) of the best
    path ending at each cell. Used by the RNG-trajectory replay
    (pipeline/seed_replay.py) to enumerate backtrace candidates the way
    the reference's gatherCellsEe does (aligner_swsse_ee_u8.cpp) and to
    approximate RedundantAlns with diagonal spans. Vectorized over j."""
    read = np.asarray(read, np.int64)
    quals = np.asarray(quals, np.int64)
    refwin = np.asarray(refwin, np.int64)
    L, R = len(read), len(refwin)
    mm = p.mm_pen_min + (np.minimum(quals, 40)
                         * (p.mm_pen_max - p.mm_pen_min)) // 40
    NEG = -(1 << 29)
    rgo = p.read_gap_open + p.read_gap_extend
    fgo = p.ref_gap_open + p.ref_gap_extend
    H = np.full(R + 1, 0, np.int64)          # row 0: free start
    E = np.full(R + 1, NEG, np.int64)
    HO = np.arange(R + 1, dtype=np.int64)    # origin col of H path
    EO = np.arange(R + 1, dtype=np.int64)
    refn = refwin == 4
    refoob = refwin >= 5
    for i in range(1, L + 1):
        rc, pen = int(read[i - 1]), int(mm[i - 1])
        barred = (i - 1) < p.gap_barrier or (L - i) < p.gap_barrier
        # E (ref gap: read char consumed, no ref char)
        Eo = np.where(H - fgo >= E - p.ref_gap_extend, HO, EO)
        En = np.maximum(H - fgo, E - p.ref_gap_extend)
        if barred:
            En = np.full(R + 1, NEG, np.int64)
        # diag
        if rc >= 5:
            sub = np.full(R, NEG // 2, np.int64)
        elif rc >= 4:
            sub = np.full(R, -p.n_pen, np.int64)
        else:
            sub = np.where(refoob, NEG // 2,
                           np.where(refn, -p.n_pen,
                                    np.where(refwin == rc,
                                             p.match_bonus, -pen)))
        Dg = np.concatenate([[NEG], H[:-1] + sub])
        DgO = np.concatenate([[0], HO[:-1]])
        Hn = np.maximum(Dg, En)
        HOn = np.where(Dg >= En, DgO, Eo)
        # F (read gap): sequential prefix scan within the row
        Fv = NEG
        FvO = 0
        for j in range(1, R + 1):
            open_ = Hn[j - 1] - rgo
            ext = Fv - p.read_gap_extend
            if open_ >= ext:
                Fv, FvO = open_, HOn[j - 1]
            else:
                Fv = ext
            if barred:
                Fv = NEG
            if Fv > Hn[j]:
                Hn[j] = Fv
                HOn[j] = FvO
        H, HO, E, EO = Hn, HOn, En, Eo
    return H, HO


# ----------------------------------------------------------------------
# Diagonal-band kernel for LONG reads (> the rectangle buckets).
#
# The rectangle formulation above materializes L x (L + 2G + 1) cells —
# fine for short reads, quadratic for long ones (the reference pays the
# same rect cost, aligner_sw.cpp; its checkpointing only bounds BACKTRACE
# memory, sse_util.h). Here the band is explicit: cell (i, d) is read row
# i against ref window column i + d, d in [0, 2G]. Every move maps to a
# shared shift (diag: same d; E/ref-gap: d+1 of the previous row; F/read
# gap: d-1 of the same row via the same Kogge-Stone lazy-F), and the per-
# row ref chars are ONE dynamic_slice with a loop-counter start — shared
# across the batch, so no per-problem gather in the hot loop.
#
# Memory: dirs are (L, B, ceil((2G+1)/8)) words — linear in L — so a
# 100 kbp read costs ~100 KB of direction bits instead of ~5 GB.
# Semantics: identical scoring; the band caps the alignment's NET
# row-column drift at ±G relative to its start offset (the reference's
# own DynProgFramer caps end displacement at the same 2*maxgap pad, so
# the admitted-solution family matches for --dpad-bounded gaps).
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=("params", "band"))
def sw_banded_diag(reads: jnp.ndarray, quals: jnp.ndarray,
                   read_lens: jnp.ndarray, refwins: jnp.ndarray,
                   params: SWParams, band: int) -> SWResult:
    """Band DP. reads/quals: (B, Lmax) int32; refwins: (B, Lmax + 2*band
    + 1) int32 codes 0..5, rect-aligned (column c = ref char at rect col
    c, NOT word-aligned). Returns SWResult whose `lane` is the BAND
    column d of the best cell (ref rect column = row + d) and dirs are in
    band coordinates (walk with backtrace_diag)."""
    p = params
    G = band
    B, Lmax = reads.shape
    BW = 2 * G + 1
    mmpen_t = mm_penalty_from_qual(quals, p).T          # (Lmax, B)
    reads_t = reads.T
    lane_e = jnp.arange(BW, dtype=jnp.int32) * p.read_gap_extend

    rgo = p.read_gap_open + p.read_gap_extend
    fgo = p.ref_gap_open + p.ref_gap_extend

    def row_fn(carry, xs):
        h_prev, e_prev, best, best_row, best_lane, i = carry
        rc, qp = xs
        active = i < read_lens
        # shared slice: band row i covers rect columns [i, i + BW)
        refc = jax.lax.dynamic_slice_in_dim(refwins, i, BW, axis=1)

        is_n = (rc[:, None] >= 4) | (refc == 4)
        oob = refc >= 5
        eq = (refc == rc[:, None]) & ~is_n & ~oob
        sub = jnp.where(eq, p.match_bonus,
              jnp.where(is_n & ~oob, -p.n_pen, -qp[:, None]))
        sub = jnp.where(oob, NEG_INF // 2, sub)

        # E (ref gap): rect (i-1, j) = band (i-1, d+1): shift LEFT
        padR = jnp.full((B, 1), NEG_INF)
        h_up = jnp.concatenate([h_prev[:, 1:], padR], axis=1)
        e_up = jnp.concatenate([e_prev[:, 1:], padR], axis=1)
        e_cur = jnp.maximum(h_up - fgo, e_up - p.ref_gap_extend)
        e_from_ext = (e_up - p.ref_gap_extend) > (h_up - fgo)
        if p.gap_barrier > 0:
            bar = ((i < p.gap_barrier) |
                   (i >= read_lens - p.gap_barrier))[:, None]
            e_cur = jnp.where(bar, NEG_INF, e_cur)
        e_cur = jnp.where(oob, NEG_INF, e_cur)

        # diag: rect (i-1, j-1) = band (i-1, d): no shift
        h_diag = h_prev + sub
        h_noF = jnp.maximum(h_diag, e_cur)
        src_noF = jnp.where(e_cur > h_diag, H_E, H_DIAG).astype(jnp.uint8)

        # F (read gap): band (i, d-1): same lazy-F prefix scan
        f_cur = _prefix_max_excl(h_noF - rgo + p.read_gap_extend
                                 + lane_e[None, :]) - lane_e[None, :]
        padL = jnp.full((B, 1), NEG_INF)
        f_open = jnp.concatenate([padL, h_noF[:, :-1]], axis=1) - rgo
        f_from_ext = f_cur > f_open
        if p.gap_barrier > 0:
            f_cur = jnp.where(bar, NEG_INF, f_cur)

        h_cur = jnp.maximum(h_noF, f_cur)
        src = jnp.where(f_cur > h_noF, jnp.uint8(H_F), src_noF)

        if p.local:
            clamp = (h_cur < 0) | ((h_cur == 0) & (src == H_DIAG))
            h_cur = jnp.where(h_cur < 0, 0, h_cur)
            src = jnp.where(clamp, jnp.uint8(H_START), src)
        h_cur = jnp.maximum(h_cur, NEG_INF)

        dirbits = (src.astype(jnp.int32)
                   | jnp.where(e_from_ext, 4, 0)
                   | jnp.where(f_from_ext, 8, 0))
        if BW % 8:
            dirbits = jnp.concatenate(
                [dirbits, jnp.zeros((B, 8 - BW % 8), jnp.int32)], axis=1)
        packed = jnp.sum(
            dirbits.reshape(B, -1, 8)
            << (4 * jnp.arange(8, dtype=jnp.int32))[None, None, :],
            axis=2, dtype=jnp.int32)

        row_best = jnp.max(h_cur, axis=1)
        colw_i = jnp.arange(BW, dtype=jnp.int32)[None, :]
        row_best_lane = jnp.max(
            jnp.where(h_cur == row_best[:, None], colw_i, -1), axis=1)
        if p.local:
            take = active & (row_best >= best)
        else:
            take = (i == read_lens - 1)
        best = jnp.where(take, row_best, best)
        best_row = jnp.where(take, i, best_row)
        best_lane = jnp.where(take, row_best_lane, best_lane)

        h_out = jnp.where(active[:, None], h_cur, h_prev)
        e_out = jnp.where(active[:, None], e_cur, e_prev)
        return (h_out, e_out, best, best_row, best_lane, i + 1), packed

    # row -1: free start at any rect column c0 in [0, 2G] = band col c0
    # of the virtual row -1 (rect row -1 col c0 maps to band d = c0 + 1
    # seen from row 0's diag... the diag into (0, d) reads band (−1, d)
    # which is rect (−1, d − 1 + 0)… rect col j−1 = d−1+i = d−1: free
    # starts across [−1..2G−1] ⇒ allow all: h0 = 0 like the rect kernel.
    h0 = jnp.zeros((B, BW), jnp.int32)
    e0 = jnp.full((B, BW), NEG_INF)
    init = (h0, e0, jnp.full((B,), NEG_INF), jnp.zeros(B, jnp.int32),
            jnp.zeros(B, jnp.int32), jnp.int32(0))
    (h, e, best, best_row, best_lane, _), dirs = jax.lax.scan(
        row_fn, init, (reads_t, mmpen_t))
    return SWResult(best, best_row, best_lane, dirs)


@partial(jax.jit, static_argnames=("params", "band"))
def backtrace_diag(dirs: jnp.ndarray, sel: jnp.ndarray, rows: jnp.ndarray,
                   lanes: jnp.ndarray, reads: jnp.ndarray,
                   quals: jnp.ndarray, refwins: jnp.ndarray,
                   params: SWParams, band: int) -> BTResult:
    """Backtrace over band-coordinate dirs from sw_banded_diag.

    Band moves: M -> (i-1, d); I/E -> (i-1, d+1); D/F -> (i, d-1). Rect
    column of (i, d) is i + d; ref_start_win is reported in RECT columns
    so callers share the rectangle kernel's position math."""
    p = params
    G = band
    Lmax, B, Wp = dirs.shape
    BW = 2 * G + 1
    Bc = sel.shape[0]
    W = refwins.shape[1]
    S = bt_steps(Lmax, BW, p.local)
    dirs_sel = jnp.take(dirs, sel, axis=1).transpose(1, 0, 2).reshape(Bc, -1)
    mmpen = mm_penalty_from_qual(quals, p)

    def step(carry, _):
        i, d, mode, done, nmm, ngo, ngc, nrefn, score, refmin = carry
        dc = jnp.clip(d, 0, BW - 1)
        flat = (jnp.clip(i, 0, Lmax - 1) * Wp + dc // 8)[:, None]
        word = jnp.take_along_axis(dirs_sel, flat, axis=1)[:, 0]
        dd = (word >> (4 * (dc % 8))) & 15
        src = dd & 3

        rc = jnp.take_along_axis(reads, jnp.clip(i, 0, Lmax - 1)[:, None],
                                 axis=1)[:, 0]
        qp = jnp.take_along_axis(mmpen, jnp.clip(i, 0, Lmax - 1)[:, None],
                                 axis=1)[:, 0]
        j = jnp.clip(i, 0, Lmax - 1) + dc          # rect column
        fc = jnp.take_along_axis(refwins,
                                 jnp.clip(j, 0, W - 1)[:, None],
                                 axis=1)[:, 0]

        at_start = (mode == 0) & (src == H_START)
        done_now = done | at_start | (i < 0) | (d < 0) | (d >= BW)

        emit_m = (mode == 0) & (src == H_DIAG)
        emit_i = ((mode == 0) & (src == H_E)) | (mode == 1)
        emit_d = ((mode == 0) & (src == H_F)) | (mode == 2)
        emit_m, emit_i, emit_d = (e & ~done_now
                                  for e in (emit_m, emit_i, emit_d))

        is_n = (rc >= 4) | (fc == 4)
        ismatch = emit_m & (rc == fc) & ~is_n & (fc < 4)
        m_sc = jnp.where(ismatch, p.match_bonus,
               jnp.where(is_n, -p.n_pen, -qp))

        e_ext = (dd & 4) != 0
        f_ext = (dd & 8) != 0
        i_open = emit_i & ~e_ext
        d_open = emit_d & ~f_ext

        score = score + jnp.where(emit_m, m_sc, 0) \
            - jnp.where(emit_i, p.ref_gap_extend, 0) \
            - jnp.where(i_open, p.ref_gap_open, 0) \
            - jnp.where(emit_d, p.read_gap_extend, 0) \
            - jnp.where(d_open, p.read_gap_open, 0)
        nmm = nmm + (emit_m & ~ismatch & (rc < 4)
                     & (fc != 4)).astype(jnp.int32) \
            + (emit_m & is_n).astype(jnp.int32)
        nrefn = nrefn + (emit_m & (fc == 4)).astype(jnp.int32)
        ngo = ngo + i_open.astype(jnp.int32) + d_open.astype(jnp.int32)
        ngc = ngc + emit_i.astype(jnp.int32) + emit_d.astype(jnp.int32)
        refmin = jnp.where(emit_m | emit_d, jnp.minimum(refmin, j), refmin)

        op = jnp.where(emit_m, OP_M,
             jnp.where(emit_i, OP_I,
             jnp.where(emit_d, OP_D, OP_NONE)))
        packed = (op | (jnp.clip(fc, 0, 5) << 2)
                  | (ismatch.astype(jnp.int32) << 5)).astype(jnp.uint8)

        # band moves: M -> (i-1, d); I -> (i-1, d+1); D -> (i, d-1)
        i2 = jnp.where(emit_m | emit_i, i - 1, i)
        d2 = jnp.where(emit_i, d + 1, jnp.where(emit_d, d - 1, d))
        mode2 = jnp.where(emit_i & e_ext, 1,
                jnp.where(emit_d & f_ext, 2, 0))
        i = jnp.where(done_now, i, i2)
        d = jnp.where(done_now, d, d2)
        mode = jnp.where(done_now, mode, mode2)
        done = done_now | (i < 0)
        return (i, d, mode, done, nmm, ngo, ngc, nrefn, score, refmin), packed

    z = jnp.zeros(Bc, jnp.int32)
    init = (rows, lanes, z, jnp.zeros(Bc, bool), z, z, z, z, z,
            jnp.full(Bc, 1 << 30, jnp.int32))
    (i, d, mode, done, nmm, ngo, ngc, nrefn, score, refmin), ops = \
        jax.lax.scan(step, init, None, length=S)
    read_start = i + 1
    refmin = jnp.where(refmin == (1 << 30), 0, refmin)
    return BTResult(ops, read_start, refmin, nmm, ngo, ngc, nrefn, score)
