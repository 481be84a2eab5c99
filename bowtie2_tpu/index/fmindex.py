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
    """Row-space dtype (int32 small / int64 ".bt2l"-analog large indexes)
    is carried by occ_cp/fchr/ftab/offs — kernels derive it from fchr."""
    n: jnp.ndarray           # scalar, joined text length (row dtype)
    z_off: jnp.ndarray       # scalar (row dtype)
    occ_cp: jnp.ndarray      # [nblocks, 4] occ checkpoint counts (row dtype)
    bwt_blocks: jnp.ndarray  # int32[nblocks, 8]: packed-BWT words per block
                             # (uint32 bit patterns)
    fchr: jnp.ndarray        # [5] (row dtype)
    ftab: jnp.ndarray        # [2*4^K+1] (row dtype)
    mark_blocks: jnp.ndarray  # uint32[nblocks, 4] (zeros if absent)
    mark_cp: jnp.ndarray      # int32[nblocks]
    offs: jnp.ndarray         # [n_marked] (row dtype)

    @property
    def row_dtype(self):
        return self.fchr.dtype


class FMIndex(NamedTuple):
    fw: FMHalf
    bw: Optional[FMHalf]
    ref_words: jnp.ndarray   # uint32, 2-bit global reference space
    refn_words: jnp.ndarray  # uint32 N bitmask
    ref_cum: jnp.ndarray     # [nrefs+1] (row dtype)
    n_ref_total: jnp.ndarray  # scalar: total global reference length

    @staticmethod
    def from_host(data: IndexData, device=None) -> "FMIndex":
        large = data.fw.occ_cp.dtype == np.int64
        if large:
            # positions/framing need signed 64-bit on device (window starts
            # can be negative near the origin), so the x64 flag goes on —
            # but the HOT row space (occ/ftab/offs, every LF-step quantity)
            # is uint32 whenever the row count fits: TPUs have no native
            # int64 (XLA emulates it as int32 pairs, and the round-2 large
            # mode measured a 184x cliff), while uint32 rows cover any
            # genome below 4.29 Gbp — including GRCh38 — at native width.
            jax.config.update("jax_enable_x64", True)
            rdt = jnp.uint32 if data.fw.n + 1 < (1 << 32) else jnp.int64
        else:
            rdt = jnp.int32
        nrdt = np.dtype(rdt.dtype if hasattr(rdt, "dtype") else rdt)

        def half(h: HalfIndex):
            if h is None:
                return None
            nblocks = h.occ_cp.shape[0]
            mark = h.mark_words if h.mark_words is not None else \
                np.zeros(nblocks * 4, dtype=np.uint32)
            markcp = h.mark_cp if h.mark_cp is not None else \
                np.zeros(nblocks, dtype=np.int32)
            offs = h.offs if h.offs is not None else \
                np.zeros(1, dtype=h.occ_cp.dtype)
            return FMHalf(
                n=jnp.asarray(np.asarray(h.n, dtype=nrdt)),
                z_off=jnp.asarray(np.asarray(h.z_off, dtype=nrdt)),
                occ_cp=jnp.asarray(h.occ_cp.astype(nrdt, copy=False)),
                bwt_blocks=jnp.asarray(
                    h.bwt_words.reshape(nblocks, -1).view(np.int32)),
                fchr=jnp.asarray(h.fchr.astype(nrdt, copy=False)),
                ftab=jnp.asarray(h.ftab.astype(nrdt, copy=False)),
                mark_blocks=jnp.asarray(mark.reshape(nblocks, -1)),
                mark_cp=jnp.asarray(markcp),
                offs=jnp.asarray(offs.astype(nrdt, copy=False)),
            )

        idx = FMIndex(
            fw=half(data.fw), bw=half(data.bw),
            ref_words=jnp.asarray(data.ref_words),
            refn_words=jnp.asarray(data.refn_words),
            ref_cum=jnp.asarray(data.ref_cum.astype(
                np.int64 if large else np.int32)),
            n_ref_total=rdt(int(data.ref_cum[-1])),
        )
        if device is not None:
            idx = jax.device_put(idx, device)
        return idx
