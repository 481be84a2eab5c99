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
    is carried by fchr/ftab/offs — kernels derive it from fchr.

    fm_blocks packs the BWT words AND the occ checkpoints of one 128-bp
    block into a single 48-byte row so every LF step is ONE gather (the
    reference packs occ+BWT into one 64 B cache side for the same reason,
    bt2_idx.h:1758,1867-1886; here the motive is TPU gather-op count, not
    cache lines). mark_rows likewise packs the SA-sample mark bits with
    their rank checkpoint so sa_resolve needs two gathers per step, not
    three."""
    n: jnp.ndarray           # scalar, joined text length (row dtype)
    z_off: jnp.ndarray       # scalar (row dtype)
    fm_blocks: jnp.ndarray   # uint32[nblocks, 12]: cols 0:8 packed-BWT
                             # words, cols 8:12 occ checkpoints (low 32
                             # bits; full value iff row dtype <= 32-bit)
    fchr: jnp.ndarray        # [5] (row dtype)
    ftab: jnp.ndarray        # [2*4^K+1] (row dtype)
    mark_rows: jnp.ndarray   # uint32[nblocks, 5]: cols 0:4 mark bits,
                             # col 4 mark-rank checkpoint
    offs: jnp.ndarray        # [n_marked] (row dtype)
    occ_cp64: Optional[jnp.ndarray] = None  # int64[nblocks, 4], only in
                             # the >2^32-row mode where cols 8:12 truncate

    @property
    def row_dtype(self):
        return self.fchr.dtype


def pack_fm_blocks(bwt_words: np.ndarray, occ_cp: np.ndarray, nrdt):
    """Host-side [occ4|bwt8] fusion → (uint32[nblocks, 12], occ_cp64).

    occ checkpoints ride in the same row as the BWT words (cols 8:12) so
    the device resolves Occ with one gather. Values are stored as their
    low 32 bits; that is the exact value whenever the row space fits
    32 bits (int32/uint32 modes). Past 2^32 rows the full int64 table is
    returned separately (occ_cp64) and the kernels gather it as a second
    row — the pre-fusion behavior."""
    nblocks = occ_cp.shape[0]
    fm = np.empty((nblocks, 12), dtype=np.uint32)
    fm[:, :8] = bwt_words.reshape(nblocks, 8).view(np.uint32)
    fm[:, 8:] = (occ_cp & np.array(0xFFFFFFFF, dtype=np.int64)).astype(
        np.uint32) if occ_cp.dtype == np.int64 else \
        occ_cp.astype(np.uint32, copy=False)
    occ_cp64 = occ_cp.astype(np.int64, copy=False) \
        if np.dtype(nrdt) == np.int64 else None
    return fm, occ_cp64


def pack_mark_rows(mark_words: np.ndarray, mark_cp: np.ndarray) -> np.ndarray:
    """[mark bits (4 words) | rank checkpoint] per block → uint32[nb, 5]."""
    nblocks = mark_words.shape[0]
    rows = np.empty((nblocks, 5), dtype=np.uint32)
    rows[:, :4] = mark_words
    rows[:, 4] = mark_cp.astype(np.uint32, copy=False)
    return rows


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
            fm_blocks, occ_cp64 = pack_fm_blocks(h.bwt_words, h.occ_cp,
                                                 nrdt)
            return FMHalf(
                n=jnp.asarray(np.asarray(h.n, dtype=nrdt)),
                z_off=jnp.asarray(np.asarray(h.z_off, dtype=nrdt)),
                fm_blocks=jnp.asarray(fm_blocks),
                fchr=jnp.asarray(h.fchr.astype(nrdt, copy=False)),
                ftab=jnp.asarray(h.ftab.astype(nrdt, copy=False)),
                mark_rows=jnp.asarray(pack_mark_rows(
                    mark.reshape(nblocks, -1), markcp)),
                offs=jnp.asarray(offs.astype(nrdt, copy=False)),
                occ_cp64=None if occ_cp64 is None else jnp.asarray(occ_cp64),
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
