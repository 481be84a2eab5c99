"""Device-resident FM index.

`FMHalf` / `FMIndex` are NamedTuple pytrees of jnp arrays so they can be
closed over or passed through `jit` / `shard_map` without recompilation per
genome (scalars like n and z_off ride along as traced 0-d arrays).

On a multi-chip mesh the whole index is replicated per device by default
(the reference's shared-memory index, mm.h/shmem.h, becomes
jax.device_put(replicated)); genomes larger than HBM shard the BWT blocks
over the mesh instead (future work, see bowtie2_tpu/dist).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bowtie2_tpu.index.build import HalfIndex, IndexData


class FMHalf(NamedTuple):
    n: jnp.ndarray           # int32 scalar, joined text length
    z_off: jnp.ndarray       # int32 scalar
    lf_blocks: jnp.ndarray   # int32[nblocks, 12]: occ checkpoint counts
                             # [:, :4] + the block's 8 packed-BWT words
                             # [:, 4:] (uint32 bit patterns) — one row gather
                             # serves a whole LF step
    fchr: jnp.ndarray        # int32[5]
    ftab: jnp.ndarray        # int32[2*4^K+1]
    mark_blocks: jnp.ndarray  # uint32[nblocks, 4] (zeros if absent)
    mark_cp: jnp.ndarray      # int32[nblocks]
    offs: jnp.ndarray         # int32[n_marked]


class FMIndex(NamedTuple):
    fw: FMHalf
    bw: Optional[FMHalf]
    ref_words: jnp.ndarray   # uint32, 2-bit global reference space
    refn_words: jnp.ndarray  # uint32 N bitmask
    ref_cum: jnp.ndarray     # int64[nrefs+1]
    n_ref_total: jnp.ndarray  # int32 scalar: total global reference length

    @staticmethod
    def from_host(data: IndexData, device=None) -> "FMIndex":
        def half(h: HalfIndex):
            if h is None:
                return None
            nblocks = h.occ_cp.shape[0]
            mark = h.mark_words if h.mark_words is not None else \
                np.zeros(nblocks * 4, dtype=np.uint32)
            markcp = h.mark_cp if h.mark_cp is not None else \
                np.zeros(nblocks, dtype=np.int32)
            offs = h.offs if h.offs is not None else np.zeros(1, dtype=np.int32)
            lf = np.concatenate(
                [h.occ_cp.astype(np.int32),
                 h.bwt_words.reshape(nblocks, -1).view(np.int32)], axis=1)
            return FMHalf(
                n=jnp.int32(h.n), z_off=jnp.int32(h.z_off),
                lf_blocks=jnp.asarray(lf),
                fchr=jnp.asarray(h.fchr),
                ftab=jnp.asarray(h.ftab),
                mark_blocks=jnp.asarray(mark.reshape(nblocks, -1)),
                mark_cp=jnp.asarray(markcp),
                offs=jnp.asarray(offs),
            )

        idx = FMIndex(
            fw=half(data.fw), bw=half(data.bw),
            ref_words=jnp.asarray(data.ref_words),
            refn_words=jnp.asarray(data.refn_words),
            ref_cum=jnp.asarray(data.ref_cum),
            n_ref_total=jnp.int32(int(data.ref_cum[-1])),
        )
        if device is not None:
            idx = jax.device_put(idx, device)
        return idx
