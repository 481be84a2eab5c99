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

import jax
import jax.numpy as jnp


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
    wstart = jnp.clip(starts, -(1 << 24), 1 << 30) >> 4
    widx = jnp.clip(wstart[:, None] + jnp.arange(nw, dtype=jnp.int32)[None, :],
                    0, n_words - 1)
    words = jnp.take(ref_words, widx, axis=0)            # (B, nw)
    crumbs = ((words[:, :, None]
               >> (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :])
              & jnp.uint32(3)).astype(jnp.int32).reshape(-1, nw * 16)
    off = (starts - (wstart << 4))[:, None]              # 0..15
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
    noff = (starts - (nstart << 5))[:, None]
    is_n = jnp.take_along_axis(nbits, noff + jnp.arange(width, dtype=jnp.int32)[None, :],
                               axis=1) == 1
    code = jnp.where(is_n, 4, code)

    pos = starts[:, None] + jnp.arange(width, dtype=jnp.int32)[None, :]
    oob = (pos < lo[:, None]) | (pos >= hi[:, None])
    return jnp.where(oob, 5, code)
