"""Batched FM-index primitives (JAX, TPU-first).

The reference walks the BWT one read at a time with prefetch games to hide
HBM latency (aligner_seed.cpp:624,884-912 interleaves a handful of state
machines; bt2_idx.h:382-421 SideLocus prefetch). On TPU the same latency
hiding is real vectorization: every op here is written for ONE search state
and `jax.vmap`-ed over thousands, so each LF step is a single batched gather
from the device-resident index plus a 128-lane unpack/compare/sum on the VPU.

Core math (classic FM index, = reference Ebwt::mapLF bt2_idx.h:2313):
    LF(i, c)  = fchr[c] + Occ(c, i)
    Occ(c, i) = #occurrences of c in bwt[0:i)
Occ is resolved as: checkpoint count for i's 128-base block (occ_cp gather)
+ in-block count from 8 uint32 words unpacked to 128 2-bit crumbs.
The sentinel row (z_off) stores a spurious 'A' which is subtracted when
(c == 0 and i > z_off) — same trick as the reference's $ handling.

All row indices are int32 (genomes < 2 GiB joined; the int64 ".bt2l"
equivalent is a planned dtype switch, reference btypes.h).
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from bowtie2_tpu.constants import OCC_BLOCK, WORDS_PER_BLOCK
from bowtie2_tpu.index.fmindex import FMHalf

_CRUMB_SHIFTS = 2 * jnp.arange(16, dtype=jnp.uint32)
_LANE = jnp.arange(OCC_BLOCK, dtype=jnp.int32)

def _dyn(arr, i):
    """Scalar load arr[i] via dynamic_slice.

    Inside lax.scan bodies, advanced-index gathers compile pathologically
    slowly on the TPU backend (~500s); dynamic_slice compiles in <1s. Every
    scalar index load in this module must go through here.
    """
    return jax.lax.dynamic_index_in_dim(arr, i, keepdims=False)


def _dyn_row(arr2d, i):
    """Row load arr2d[i, :] via dynamic_slice."""
    return jax.lax.dynamic_slice_in_dim(arr2d, i, 1, axis=0)[0]



def _block_crumbs(half: FMHalf, block: jnp.ndarray) -> jnp.ndarray:
    """Unpack one 128-base occ block → (128,) int32 crumbs. block: scalar."""
    words = jax.lax.dynamic_slice(
        half.bwt_words, (block * WORDS_PER_BLOCK,), (WORDS_PER_BLOCK,))
    crumbs = (words[:, None] >> _CRUMB_SHIFTS[None, :]) & jnp.uint32(3)
    return crumbs.reshape(OCC_BLOCK).astype(jnp.int32)


def occ(half: FMHalf, i: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """#occurrences of char c in bwt[0:i). Scalar i, c; vmap for batches."""
    block = i // OCC_BLOCK
    crumbs = _block_crumbs(half, block)
    in_block = jnp.sum(((crumbs == c) & (_LANE < (i - block * OCC_BLOCK))).astype(jnp.int32))
    cp = _dyn(_dyn_row(half.occ_cp, block), c)
    corr = ((c == 0) & (i > half.z_off)).astype(jnp.int32)
    return cp + in_block - corr


def occ4(half: FMHalf, i: jnp.ndarray) -> jnp.ndarray:
    """(4,) occurrence counts of every char in bwt[0:i)."""
    block = i // OCC_BLOCK
    crumbs = _block_crumbs(half, block)
    mask = (_LANE < (i - block * OCC_BLOCK))
    onehot = (crumbs[:, None] == jnp.arange(4, dtype=jnp.int32)[None, :])
    cnt = jnp.sum((onehot & mask[:, None]).astype(jnp.int32), axis=0)
    corr = jnp.where((jnp.arange(4) == 0) & (i > half.z_off), 1, 0)
    return _dyn_row(half.occ_cp, block) + cnt - corr


def lf(half: FMHalf, i: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """LF mapping for char c at row bound i (reference mapLF)."""
    return _dyn(half.fchr, c) + occ(half, i, c)


def bwt_char(half: FMHalf, r: jnp.ndarray) -> jnp.ndarray:
    """BWT char (0..3) at row r. Undefined at r == z_off (caller avoids)."""
    word = _dyn(half.bwt_words, r // 16)
    return ((word >> (2 * (r % 16)).astype(jnp.uint32)) & jnp.uint32(3)).astype(jnp.int32)


def ftab_lookup(half: FMHalf, key: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(top, bot) SA range of the K-mer with base-4 integer `key`."""
    pair = jax.lax.dynamic_slice(half.ftab, (2 * key + 1,), (2,))
    return pair[0], pair[1]


# ----------------------------------------------------------------------
# Exact sweep: end-to-end backward search of the whole read, counting a
# lower bound on edits (reference SeedAligner::exactSweep aligner_seed.cpp:856).
# On range-empty: bump the edit count and restart from the full range at the
# next position. A read with nedit == 0 finishing with a nonempty range has
# exact end-to-end hits [top, bot).
# ----------------------------------------------------------------------

class SweepResult(NamedTuple):
    top: jnp.ndarray
    bot: jnp.ndarray
    nedit: jnp.ndarray   # lower bound on edits; 0 → [top,bot) are exact hits


def _exact_sweep_one(half: FMHalf, read: jnp.ndarray, length: jnp.ndarray) -> SweepResult:
    """read: (Lmax,) int32 codes (4=N); length: scalar."""
    Lmax = read.shape[0]
    nrows = half.n + 1

    def step(carry, p):
        top, bot, nedit = carry
        active = p < length
        pos = length - 1 - p            # right-to-left
        c = _dyn(read, jnp.clip(pos, 0, Lmax - 1))
        is_n = c >= 4
        cc = jnp.clip(c, 0, 3)
        fc = _dyn(half.fchr, cc)
        ntop = fc + occ(half, top, cc)
        nbot = fc + occ(half, bot, cc)
        empty = (ntop >= nbot) | is_n
        # on empty: count an edit, reset to full range (restart after pos)
        top2 = jnp.where(empty, 0, ntop)
        bot2 = jnp.where(empty, nrows, nbot)
        nedit2 = nedit + jnp.where(empty, 1, 0)
        top = jnp.where(active, top2, top)
        bot = jnp.where(active, bot2, bot)
        nedit = jnp.where(active, nedit2, nedit)
        return (top, bot, nedit), None

    (top, bot, nedit), _ = jax.lax.scan(
        step, (jnp.int32(0), nrows.astype(jnp.int32), jnp.int32(0)),
        jnp.arange(Lmax, dtype=jnp.int32))
    return SweepResult(top, bot, nedit)


@partial(jax.jit, static_argnames=())
def exact_sweep(half: FMHalf, reads: jnp.ndarray, lengths: jnp.ndarray) -> SweepResult:
    """Batched exact sweep. reads: (B, Lmax) int32; lengths: (B,)."""
    return jax.vmap(_exact_sweep_one, in_axes=(None, 0, 0))(half, reads, lengths)


# ----------------------------------------------------------------------
# Exact seed search: backward search of fixed-length seeds, no restart —
# empty range means no hit (reference searchSeedBi with -N 0,
# aligner_seed.cpp:1859; exact case needs no bidirectional machinery).
# ----------------------------------------------------------------------

def _seed_search_one(half: FMHalf, seed: jnp.ndarray, valid: jnp.ndarray,
                     seed_len: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """seed: (seed_len,) int32 codes; valid: scalar bool. → (top, bot)."""
    nrows = half.n + 1

    def step(carry, p):
        top, bot = carry
        pos = seed_len - 1 - p
        c = _dyn(seed, pos)
        is_n = c >= 4
        cc = jnp.clip(c, 0, 3)
        alive = top < bot
        fc = _dyn(half.fchr, cc)
        ntop = fc + occ(half, top, cc)
        nbot = fc + occ(half, bot, cc)
        ntop = jnp.where(is_n | ~alive, 1, ntop)
        nbot = jnp.where(is_n | ~alive, 0, nbot)
        return (ntop, nbot), None

    init = (jnp.int32(0), jnp.where(valid, nrows.astype(jnp.int32), 0))
    (top, bot), _ = jax.lax.scan(step, init, jnp.arange(seed_len, dtype=jnp.int32))
    bot = jnp.maximum(top, bot)
    return top, bot


@partial(jax.jit, static_argnames=("seed_len",))
def seed_search_exact(half: FMHalf, seeds: jnp.ndarray, valid: jnp.ndarray,
                      seed_len: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched exact seed search. seeds: (B, seed_len); valid: (B,) bool.

    Returns (top, bot) each (B,); empty ranges have top == bot.
    """
    return jax.vmap(_seed_search_one, in_axes=(None, 0, 0, None))(
        half, seeds, valid, seed_len)


# ----------------------------------------------------------------------
# SA-offset resolution: walk rows leftward with LF until a marked row
# (reference GroupWalk2S/walkLeft, group_walk.h + bt2_idx.h:1607). Our index
# marks by text position (pos % 32 == 0) so the walk is bounded by 32 steps:
# a fixed-trip-count lax.scan instead of a data-dependent while loop.
# ----------------------------------------------------------------------

def _is_marked_and_rank(half: FMHalf, r: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    word_i = r // 32
    bit = (_dyn(half.mark_words, word_i) >> (r % 32).astype(jnp.uint32)) & jnp.uint32(1)
    block = r // OCC_BLOCK
    words = jax.lax.dynamic_slice(half.mark_words, (block * 4,), (4,))
    bits = (words[:, None] >> jnp.arange(32, dtype=jnp.uint32)[None, :]) & jnp.uint32(1)
    bits = bits.reshape(128).astype(jnp.int32)
    in_block = jnp.sum(bits * (_LANE < (r - block * OCC_BLOCK)))
    return bit == 1, _dyn(half.mark_cp, block) + in_block


def _walk_one(half: FMHalf, r: jnp.ndarray, period: int) -> jnp.ndarray:
    """Resolve one BWT row to its joined-text offset."""
    def step(carry, _):
        row, steps, done = carry
        marked, _ = _is_marked_and_rank(half, row)
        done_now = done | marked
        c = bwt_char(half, row)
        nrow = _dyn(half.fchr, c) + occ(half, row, c)
        row = jnp.where(done_now, row, nrow)
        steps = jnp.where(done_now, steps, steps + 1)
        return (row, steps, done_now), None

    (row, steps, _), _ = jax.lax.scan(
        step, (r, jnp.int32(0), jnp.bool_(False)), None, length=period)
    _, rank = _is_marked_and_rank(half, row)
    return _dyn(half.offs, rank) + steps


@partial(jax.jit, static_argnames=("period",))
def sa_resolve(half: FMHalf, rows: jnp.ndarray, period: int = 32) -> jnp.ndarray:
    """Batched row → joined text offset. rows: (B,) int32."""
    return jax.vmap(_walk_one, in_axes=(None, 0, None))(half, rows, period)
