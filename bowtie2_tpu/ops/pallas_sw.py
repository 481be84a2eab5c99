"""Pallas TPU kernel for the rectangle gapped-extension DP.

Same contract as ops.sw.sw_banded (scores/end cells/direction bits,
bit-identical), but the whole row recurrence runs inside one kernel
invocation per problem tile: H/E carries live in VMEM scratch for the
entire read instead of round-tripping through XLA scan plumbing, and the
per-row direction bytes are written straight to the output block.

Status: validated bit-identical to the XLA path, but NOT faster on this
hardware — measured on v5e at (16384 x 96 x 157): XLA scan 70 ms, this
kernel 89 ms at its best tile size (TB=64; 468 ms at TB=8, broken VPU
utilization). XLA's scan + fused gather pipeline is already near the
achievable rate for this recurrence, so the pipeline keeps the XLA path;
this kernel is kept as the starting point for future work (e.g. fusing
the backtrace walk or int8 scoring, which XLA cannot express as one
kernel). Requires B % TB == 0.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bowtie2_tpu.ops.sw import (H_DIAG, H_E, H_F, H_START, SWParams,
                                SWResult, mm_penalty_from_qual)

NEG_INF = -(1 << 29)   # python int: pallas kernels cannot capture traced consts

TB = 64  # problems per grid step (best of {8,64,256} measured)


def _shift_right(x, fill):
    """x[..., j] -> x[..., j-1]; column 0 = fill."""
    y = pltpu.roll(x, 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col == 0, fill, y)


def _prefix_max(x):
    """Inclusive running max along the last axis (Kogge-Stone with rolls)."""
    W = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < W:
        y = pltpu.roll(x, shift, axis=1)
        y = jnp.where(col < shift, NEG_INF, y)
        x = jnp.maximum(x, y)
        shift <<= 1
    return x


def _kernel(p: SWParams, Lmax: int, W: int,
            reads_ref, mmpen_ref, refwin_ref, lens_ref,
            best_ref, row_ref, col_ref, dirs_ref):
    rgo = p.read_gap_open + p.read_gap_extend
    fgo = p.ref_gap_open + p.ref_gap_extend
    refc = refwin_ref[:, :]                     # (TB, W)
    colw = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
    lane_e = colw * p.read_gap_extend
    reads_blk = reads_ref[:, :]                 # (TB, Lmax) registers
    mmpen_blk = mmpen_ref[:, :]
    lens = jnp.min(lens_ref[:, :], axis=1)      # all columns equal
    rowio = jax.lax.broadcasted_iota(jnp.int32, (TB, Lmax), 1)

    is_n_ref = refc == 4
    oob = refc >= 5

    def row(i, carry):
        h_prev, e_prev, best, brow, bcol = carry
        sel = rowio == i
        rc = jnp.sum(jnp.where(sel, reads_blk, 0), axis=1)[:, None]
        qp = jnp.sum(jnp.where(sel, mmpen_blk, 0), axis=1)[:, None]
        active = (i < lens)[:, None]

        is_n = (rc >= 4) | is_n_ref
        eq = (refc == rc) & ~is_n & ~oob
        sub = jnp.where(eq, p.match_bonus,
              jnp.where(is_n & ~oob, -p.n_pen, -qp))
        sub = jnp.where(oob, NEG_INF // 2, sub)

        e_open = h_prev - fgo
        e_ext = e_prev - p.ref_gap_extend
        e_cur = jnp.maximum(e_open, e_ext)
        e_cur = jnp.where(oob, NEG_INF, e_cur)
        e_from_ext = e_ext > e_open
        if p.gap_barrier > 0:
            bar = ((i < p.gap_barrier) |
                   (i >= lens - p.gap_barrier))[:, None]
            e_cur = jnp.where(bar, NEG_INF, e_cur)

        h_diag = _shift_right(h_prev, NEG_INF) + sub
        h_noF = jnp.maximum(h_diag, e_cur)
        src_noF = jnp.where(e_cur > h_diag, H_E, H_DIAG)

        f_in = h_noF - rgo + p.read_gap_extend + lane_e
        f_cur = _shift_right(_prefix_max(f_in), NEG_INF) - lane_e
        f_open = _shift_right(h_noF, NEG_INF) - rgo
        f_from_ext = f_cur > f_open
        if p.gap_barrier > 0:
            f_cur = jnp.where(bar, NEG_INF, f_cur)

        h_cur = jnp.maximum(h_noF, f_cur)
        src = jnp.where(f_cur > h_noF, H_F, src_noF)
        if p.local:
            clamp = (h_cur < 0) | ((h_cur == 0) & (src == H_DIAG))
            h_cur = jnp.where(h_cur < 0, 0, h_cur)
            src = jnp.where(clamp, H_START, src)
        h_cur = jnp.maximum(h_cur, NEG_INF)

        dirbits = (src | jnp.where(e_from_ext, 4, 0)
                   | jnp.where(f_from_ext, 8, 0)).astype(jnp.uint8)
        dirs_ref[i, :, :] = dirbits

        row_best = jnp.max(h_cur, axis=1)
        # first-max column (mosaic lacks integer argmax)
        row_col = jnp.min(jnp.where(h_cur == row_best[:, None], colw, W),
                          axis=1)
        if p.local:
            take = (i < lens) & (row_best >= best)
        else:
            take = i == lens - 1
        best = jnp.where(take, row_best, best)
        brow = jnp.where(take, i, brow)
        bcol = jnp.where(take, row_col, bcol)

        h_out = jnp.where(active, h_cur, h_prev)
        e_out = jnp.where(active, e_cur, e_prev)
        return (h_out, e_out, best, brow, bcol)

    init = (jnp.zeros((TB, W), jnp.int32),
            jnp.full((TB, W), NEG_INF, jnp.int32),
            jnp.full((TB,), NEG_INF, jnp.int32),
            jnp.zeros((TB,), jnp.int32),
            jnp.zeros((TB,), jnp.int32))
    _, _, best, brow, bcol = jax.lax.fori_loop(0, Lmax, row, init)
    best_ref[:, :] = jnp.broadcast_to(best[:, None], (TB, 128))
    row_ref[:, :] = jnp.broadcast_to(brow[:, None], (TB, 128))
    col_ref[:, :] = jnp.broadcast_to(bcol[:, None], (TB, 128))


@partial(jax.jit, static_argnames=("params", "band"))
def sw_pallas(reads, quals, read_lens, refwins, params: SWParams, band: int,
              rect_cols=None) -> SWResult:
    """Drop-in for ops.sw.sw_banded on shapes where the tile fits VMEM."""
    p = params
    G = band
    B, Lmax = reads.shape
    W = refwins.shape[1]
    if rect_cols is None:
        rect_cols = read_lens + 2 * G + 1
    colw = jnp.arange(W, dtype=jnp.int32)[None, :]
    refwins = jnp.where(colw < rect_cols[:, None], refwins, 5)
    mmpen = mm_penalty_from_qual(quals, p)

    grid = B // TB
    kern = partial(_kernel, p, Lmax, W)
    interpret = jax.devices()[0].platform != "tpu"   # CPU tests
    # scalar per-problem arrays are laid out (grid, TB) so each block's
    # trailing dim equals the full array dim (TPU block constraint)
    best, row, col, dirs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TB, Lmax), lambda b: (b, 0)),
            pl.BlockSpec((TB, Lmax), lambda b: (b, 0)),
            pl.BlockSpec((TB, W), lambda b: (b, 0)),
            pl.BlockSpec((TB, 128), lambda b: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TB, 128), lambda b: (b, 0)),
            pl.BlockSpec((TB, 128), lambda b: (b, 0)),
            pl.BlockSpec((TB, 128), lambda b: (b, 0)),
            pl.BlockSpec((Lmax, TB, W), lambda b: (0, b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((Lmax, B, W), jnp.uint8),
        ],
        interpret=interpret,
    )(reads, mmpen, refwins,
      jnp.broadcast_to(read_lens[:, None], (B, 128)))
    return SWResult(best[:, 0], row[:, 0], col[:, 0], dirs)
