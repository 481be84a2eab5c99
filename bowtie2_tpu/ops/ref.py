"""Reference-window materialization on device.

Equivalent of BitPairReference::getStretch (reference.h:98-111): for each DP
candidate, expand a window of 2-bit packed reference into codes 0..5, where
4 = N (from the ambiguity bitmask) and 5 = outside the candidate's reference
sequence (alignments must not cross reference boundaries; the reference trims
its DP rects at ref edges, dp_framer.cpp).

Window positions are *global reference space* (all references concatenated
with their N stretches included; see index/build.py IndexData).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ShardedWords(NamedTuple):
    """A 1-D word table sharded over the mesh's `shard` axis (the > HBM
    index mode, dist/sharded.py). Inside shard_map each device holds
    `words` = its contiguous slice and `lo` = (1,) its first global word
    index; gathers are owner-computes + psum (ops/fm.py _take_sharded)."""
    words: jnp.ndarray
    lo: jnp.ndarray


def _take_words(table, idx: jnp.ndarray) -> jnp.ndarray:
    """Word gather that accepts a replicated array or ShardedWords.

    idx is GLOBAL and may run past either end (windows near reference
    edges); out-of-range rows return 0 words, whose decoded codes are
    masked to 5 by the callers' [lo, hi) position checks."""
    if isinstance(table, ShardedWords):
        from bowtie2_tpu.ops.fm import _take_sharded
        return _take_sharded(table.words, idx, table.lo)
    return jnp.take(table, jnp.clip(idx, 0, table.shape[0] - 1), axis=0)


@partial(jax.jit, static_argnames=("width",))
def gather_windows(ref_words: jnp.ndarray, refn_words: jnp.ndarray,
                   starts: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                   width: int) -> jnp.ndarray:
    """starts/lo/hi: (B,) int32 global positions. → (B, width) int32 codes.

    Positions outside [lo, hi) are code 5 (out-of-reference). Gathers at
    WORD granularity (16 bases per uint32) then unpacks and aligns with a
    within-row take_along_axis — ~16x fewer random HBM accesses than a
    per-base gather.
    """
    n_words = ref_words.shape[0]
    nw = width // 16 + 2
    wstart = (jnp.clip(starts, -(1 << 24), None) >> 4).astype(jnp.int32)
    widx = jnp.clip(wstart[:, None] + jnp.arange(nw, dtype=jnp.int32)[None, :],
                    0, n_words - 1)
    words = jnp.take(ref_words, widx, axis=0)            # (B, nw)
    crumbs = ((words[:, :, None]
               >> (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :])
              & jnp.uint32(3)).astype(jnp.int32).reshape(-1, nw * 16)
    off = (starts - (wstart << 4).astype(starts.dtype)
           ).astype(jnp.int32)[:, None]                   # 0..15
    sel = off + jnp.arange(width, dtype=jnp.int32)[None, :]
    code = jnp.take_along_axis(crumbs, sel, axis=1)

    nn = width // 32 + 2
    nstart = wstart >> 1
    nidx = jnp.clip(nstart[:, None] + jnp.arange(nn, dtype=jnp.int32)[None, :],
                    0, refn_words.shape[0] - 1)
    nwords = jnp.take(refn_words, nidx, axis=0)
    nbits = ((nwords[:, :, None]
              >> jnp.arange(32, dtype=jnp.uint32)[None, None, :])
             & jnp.uint32(1)).astype(jnp.int32).reshape(-1, nn * 32)
    noff = (starts - (nstart << 5).astype(starts.dtype)
            ).astype(jnp.int32)[:, None]
    is_n = jnp.take_along_axis(nbits, noff + jnp.arange(width, dtype=jnp.int32)[None, :],
                               axis=1) == 1
    code = jnp.where(is_n, 4, code)

    pos = starts[:, None] + jnp.arange(width, dtype=starts.dtype)[None, :]
    oob = (pos < lo[:, None]) | (pos >= hi[:, None])
    return jnp.where(oob, 5, code)


def aligned_width(width: int) -> int:
    """Gathered width of an `gather_windows_aligned` row for a rect width.

    Must cover width + 31 shift columns AND be a multiple of 32 so both
    the 16-crumb ref words and the 32-bit N-mask words reshape exactly."""
    return 32 * ((width + 31 + 31) // 32)


@partial(jax.jit, static_argnames=("width",))
def gather_windows_aligned(ref_words: jnp.ndarray, refn_words: jnp.ndarray,
                           starts: jnp.ndarray, lo: jnp.ndarray,
                           hi: jnp.ndarray, width: int):
    """Word-aligned variant of gather_windows: the window begins at
    `starts & ~31` so the unpacked crumbs/N-bits ARE the window — no
    per-element realignment gather (take_along_axis costs ~10ns/element on
    this backend; for 16k x 157 windows that was ~27+27 ms/batch).

    Returns (win, col_shift): win is (B, Wa) codes with Wa =
    aligned_width(width); the caller's rect columns live at
    [col_shift, col_shift + width). Positions outside [lo, hi) or outside
    the rect column span are code 5.
    """
    Wa = aligned_width(width)
    # signed &~31 rounds toward -inf, so col_shift stays in [0, 32) even
    # for windows starting before the reference (those columns go oob).
    # starts may be int64 (large indexes); word indices always fit int32.
    astart = starts & ~jnp.asarray(31, starts.dtype)
    col_shift = (starts - astart).astype(jnp.int32)         # 0..31
    nw = Wa // 16
    wstart = (astart >> 4).astype(jnp.int32)
    widx = wstart[:, None] + jnp.arange(nw, dtype=jnp.int32)[None, :]
    words = _take_words(ref_words, widx)                    # (B, nw)
    code = ((words[:, :, None]
             >> (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :])
            & jnp.uint32(3)).astype(jnp.int32).reshape(-1, Wa)

    nn = Wa // 32
    nidx = (astart >> 5).astype(jnp.int32)[:, None] \
        + jnp.arange(nn, dtype=jnp.int32)[None, :]
    nwords = _take_words(refn_words, nidx)
    nbits = ((nwords[:, :, None]
              >> jnp.arange(32, dtype=jnp.uint32)[None, None, :])
             & jnp.uint32(1)).astype(jnp.int32).reshape(-1, Wa)
    code = jnp.where(nbits == 1, 4, code)

    pos = astart[:, None] + jnp.arange(Wa, dtype=astart.dtype)[None, :]
    oob = (pos < lo[:, None]) | (pos >= hi[:, None]) \
        | (pos < starts[:, None])
    return jnp.where(oob, 5, code), col_shift
