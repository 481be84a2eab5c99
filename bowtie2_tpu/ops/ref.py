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

    Positions outside [lo, hi) are code 5 (out-of-reference).
    """
    n_words = ref_words.shape[0]
    pos = starts[:, None] + jnp.arange(width, dtype=jnp.int32)[None, :]
    safe = jnp.clip(pos, 0, n_words * 16 - 1)
    word = ref_words[safe >> 4]
    code = ((word >> (2 * (safe & 15)).astype(jnp.uint32)) & jnp.uint32(3)).astype(jnp.int32)
    nword = refn_words[safe >> 5]
    is_n = ((nword >> (safe & 31).astype(jnp.uint32)) & jnp.uint32(1)) == 1
    code = jnp.where(is_n, 4, code)
    oob = (pos < lo[:, None]) | (pos >= hi[:, None])
    return jnp.where(oob, 5, code)
