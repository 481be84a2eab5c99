"""Banded gapped-extension DP (Smith-Waterman family), batched for TPU.

Replaces the reference's four SSE striped-Smith-Waterman kernels
(aligner_swsse_ee_u8/i16.cpp, aligner_swsse_loc_u8/i16.cpp, Farrar striping)
with a *diagonal-banded* formulation natural to the VPU:

  * One DP problem = read (rows) × a band of diagonals (lanes) centered on
    the seed-hit diagonal. Lane j represents diagonal offset d = j - G where
    G is the band half-width (G >= maxgaps from the score budget,
    reference Scoring::maxReadGaps/maxRefGaps scoring.cpp:42-104).
  * The row recurrence is: diagonal move = same lane (previous row), ref-gap
    (E) = lane+1 (previous row), read-gap (F) = lanes < j (same row) —
    resolved exactly with a max-plus prefix scan (Kogge-Stone, log2(W)
    shift/max steps). This is the "lazy-F" identity the SSE kernels exploit
    (aligner_swsse_ee_u8.cpp lazy-F loop), done as a scan instead of a loop.
  * vmap over thousands of problems; scoring matches scoring.h defaults
    exactly in int32 (match 0 / mismatch -(2..6 by qual, MMP Q,6,2) /
    N -1 / gaps -(5+3k)) so scores are bit-identical to the reference's.

End-to-end mode: whole read must align (rows are mandatory); start/end
column free within the band (the framer's st_/en_ windows, dp_framer.h:59).
Local mode: scores clamp at 0, match bonus +2, best cell anywhere wins
(soft clipping recovered in backtrace).

Traceback directions are emitted per cell (packed uint8) and walked on the
host (bowtie2_tpu/pipeline/backtrace.py); on-TPU memory is cheap enough at
short-read scale to skip the reference's checkpoint/mini-fill machinery
(sse_util.h Checkpointer, aligner_bt.h) below ~2 kbp reads.
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
    dirs: jnp.ndarray     # (B, Lmax, W) uint8 traceback directions


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


def _sw_one(read, quals, read_len, refwin, p: SWParams, G: int):
    """One banded DP problem.

    read: (Lmax,) int32 codes 0..4 (4=N); quals: (Lmax,) int32;
    read_len: scalar int32; refwin: (Lmax + 2G,) int32 codes 0..5
    (4=N, 5=out-of-reference). refwin[G + i + d] is the ref char at
    read row i, diagonal d; lane j holds d = j - G, W = 2G+1 lanes.
    """
    Lmax = read.shape[0]
    W = 2 * G + 1
    mmpen = mm_penalty_from_qual(quals, p)
    lane_e = jnp.arange(W, dtype=jnp.int32) * p.read_gap_extend

    rgo = p.read_gap_open + p.read_gap_extend   # first read-gap char
    fgo = p.ref_gap_open + p.ref_gap_extend     # first ref-gap char

    def row_fn(carry, i):
        h_prev, e_prev, best, best_row, best_lane = carry
        active = i < read_len
        rc = jax.lax.dynamic_index_in_dim(read, i, keepdims=False)
        qp = jax.lax.dynamic_index_in_dim(mmpen, i, keepdims=False)
        refc = jax.lax.dynamic_slice(refwin, (i,), (W,))

        is_n = (rc >= 4) | (refc == 4)
        oob = refc >= 5
        eq = (refc == rc) & ~is_n & ~oob
        sub = jnp.where(eq, p.match_bonus,
              jnp.where(is_n & ~oob, -p.n_pen, -qp))
        sub = jnp.where(oob, NEG_INF // 2, sub)

        # E (ref gap, vertical): from previous row, lane j+1
        h_up = jnp.concatenate([h_prev[1:], jnp.full((1,), NEG_INF)])
        e_up = jnp.concatenate([e_prev[1:], jnp.full((1,), NEG_INF)])
        e_open = h_up - fgo
        e_ext = e_up - p.ref_gap_extend
        e_cur = jnp.maximum(e_open, e_ext)
        e_from_ext = e_ext > e_open

        # H without F
        h_diag = h_prev + sub
        h_noF = jnp.maximum(h_diag, e_cur)
        src_noF = jnp.where(e_cur > h_diag, H_E, H_DIAG).astype(jnp.uint8)

        # F (read gap, horizontal): a gap run from lane k to lane j consumes
        # j-k ref chars and costs rgo + (j-k-1)*ext, so
        #   F[j] = max_{k<j} (h_noF[k] + k*ext) - rgo + ext - j*ext
        f_cur = _prefix_max_excl(h_noF - rgo + p.read_gap_extend + lane_e) - lane_e
        # F-from-extension marker: whether the maximizing k is < j-1
        f_open = jnp.concatenate([jnp.full((1,), NEG_INF), h_noF[:-1]]) - rgo
        f_from_ext = f_cur > f_open

        h_cur = jnp.maximum(h_noF, f_cur)
        src = jnp.where(f_cur > h_noF, jnp.uint8(H_F), src_noF)

        if p.local:
            clamp = h_cur < 0
            h_cur = jnp.where(clamp, 0, h_cur)
            src = jnp.where(clamp, jnp.uint8(H_START), src)

        dirbits = (src
                   | (jnp.where(e_from_ext, 4, 0)).astype(jnp.uint8)
                   | (jnp.where(f_from_ext, 8, 0)).astype(jnp.uint8))

        # best tracking: e2e → only at final row; local → any cell
        if p.local:
            row_best_lane = jnp.argmax(h_cur).astype(jnp.int32)
            row_best = h_cur[row_best_lane]
            take = active & (row_best > best)
        else:
            row_best_lane = jnp.argmax(h_cur).astype(jnp.int32)
            row_best = h_cur[row_best_lane]
            take = (i == read_len - 1)
        best = jnp.where(take, row_best, best)
        best_row = jnp.where(take, i, best_row)
        best_lane = jnp.where(take, row_best_lane, best_lane)

        h_out = jnp.where(active, h_cur, h_prev)
        e_out = jnp.where(active, e_cur, e_prev)
        return (h_out, e_out, best, best_row, best_lane), dirbits

    h0 = jnp.zeros((W,), jnp.int32)          # free start on row -1, any lane
    e0 = jnp.full((W,), NEG_INF)
    init = (h0, e0, NEG_INF, jnp.int32(0), jnp.int32(0))
    (h, e, best, best_row, best_lane), dirs = jax.lax.scan(
        row_fn, init, jnp.arange(Lmax, dtype=jnp.int32))
    return best, best_row, best_lane, dirs


@partial(jax.jit, static_argnames=("params", "band"))
def sw_banded(reads: jnp.ndarray, quals: jnp.ndarray, read_lens: jnp.ndarray,
              refwins: jnp.ndarray, params: SWParams, band: int) -> SWResult:
    """Batched banded DP.

    reads: (B, Lmax) int32; quals: (B, Lmax) int32; read_lens: (B,) int32;
    refwins: (B, Lmax + 2*band) int32 codes 0..5.
    """
    score, row, lane, dirs = jax.vmap(
        _sw_one, in_axes=(0, 0, 0, 0, None, None))(
        reads, quals, read_lens, refwins, params, band)
    return SWResult(score, row, lane, dirs)


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
        for j in range(0, R + 1):
            E[i, j] = max(H[i - 1, j] - fgo, E[i - 1, j] - p.ref_gap_extend)
            if j > 0:
                F[i, j] = max(H[i, j - 1] - rgo, F[i, j - 1] - p.read_gap_extend)
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
