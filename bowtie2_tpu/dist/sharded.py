"""Sharded (> HBM) index mode: the FM index + 2-bit reference split over a
mesh `shard` axis, with owner-computes + psum gathers.

The reference shares one read-only index between threads/processes on a
node (mm.h, shmem.h, bt2_search.cpp:4874). Replication is the TPU analog
and the default (a GRCh38 index replicates at ~5-6 GB/chip, STATUS.md HBM
memo); THIS mode is for genomes that exceed one chip's HBM: every large
index table — BWT blocks, occ checkpoints, SA-sample marks and values,
2-bit reference + N mask — is split into contiguous per-device ranges,
and each row gather becomes "every shard answers for its own rows, psum
assembles the row" (ops/fm.py _take_sharded). Queries (the read batch)
are REPLICATED along `shard`; combine with a leading `data` axis for
read parallelism across the remaining chips.

Cost model: each LF step adds one psum of the gathered (B, 8+4) rows over
ICI — latency-bound like the HBM gather it replaces, so expect the LF
scan to slow by roughly the ICI/HBM latency ratio; this buys genomes of
size nshards x HBM. Tiny tables (fchr, ftab ~8 MB, seg geometry) stay
replicated.

Output determinism: after every psum all shards hold identical values, so
the whole fused pipeline computes identically on every shard and the
result blob is replicated by construction (out_specs=P()).
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bowtie2_tpu.index.build import IndexData
from bowtie2_tpu.index.fmindex import FMIndex
from bowtie2_tpu.ops.fm import SHARD_AXIS
from bowtie2_tpu.ops.ref import ShardedWords


class ShardedFMHalf(NamedTuple):
    """FMHalf twin whose big tables are sharded over SHARD_AXIS.

    Field names match FMHalf so ops/fm.py kernels work unchanged; blk_lo /
    off_lo (each (1,) per shard) mark this shard's first global block /
    SA-sample rank and switch the kernels' gathers to owner-computes."""
    n: jnp.ndarray
    z_off: jnp.ndarray
    fm_blocks: jnp.ndarray     # uint32[blocks/shard, 12] ([occ4|bwt8] rows)
    fchr: jnp.ndarray          # [5] replicated
    ftab: jnp.ndarray          # replicated (~8 MB)
    mark_rows: jnp.ndarray     # uint32[blocks/shard, 5]
    offs: jnp.ndarray          # [marked/shard]
    blk_lo: jnp.ndarray        # (1,)
    off_lo: jnp.ndarray        # (1,)
    occ_cp64: Optional[jnp.ndarray] = None  # int64[blocks/shard, 4], only
                               # past 2^32 rows (matches FMHalf.occ_cp64)

    @property
    def row_dtype(self):
        return self.fchr.dtype


class ShardedIndex(NamedTuple):
    fw: ShardedFMHalf
    ref_words: ShardedWords
    refn_words: ShardedWords
    ref_cum: jnp.ndarray
    n_ref_total: jnp.ndarray


def _pad_to(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] == n:
        return a
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


def _ceil_to(n: int, k: int) -> int:
    return (n + k - 1) * 0 + ((n + k - 1) // k) * k


def shard_index(data: IndexData, mesh: Mesh) -> ShardedIndex:
    """Split the host index over mesh's SHARD_AXIS and place it.

    Tables are padded to a multiple of the shard count (padding rows are
    never legitimate gather targets, and out-of-range global indices have
    no owner, contributing zeros that callers mask)."""
    ns = mesh.shape[SHARD_AXIS]
    rep = FMIndex.from_host(data)          # dtype policy (uint32 large mode)
    h = rep.fw
    nblocks = int(h.fm_blocks.shape[0])
    nb_pad = _ceil_to(nblocks, ns)
    noffs = int(h.offs.shape[0])
    no_pad = _ceil_to(noffs, ns)
    nw = int(rep.ref_words.shape[0])
    nw_pad = _ceil_to(nw, ns)
    nn = int(rep.refn_words.shape[0])
    nn_pad = _ceil_to(nn, ns)

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec))

    sh = P(SHARD_AXIS)
    lo_blk = np.arange(ns, dtype=np.int32) * (nb_pad // ns)
    lo_off = np.arange(ns, dtype=np.int32) * (no_pad // ns)
    lo_w = np.arange(ns, dtype=np.int32) * (nw_pad // ns)
    lo_n = np.arange(ns, dtype=np.int32) * (nn_pad // ns)
    fw = ShardedFMHalf(
        n=put(np.asarray(h.n), P()),
        z_off=put(np.asarray(h.z_off), P()),
        fm_blocks=put(_pad_to(np.asarray(h.fm_blocks), nb_pad), sh),
        fchr=put(np.asarray(h.fchr), P()),
        ftab=put(np.asarray(h.ftab), P()),
        mark_rows=put(_pad_to(np.asarray(h.mark_rows), nb_pad), sh),
        offs=put(_pad_to(np.asarray(h.offs), no_pad), sh),
        blk_lo=put(lo_blk, sh),
        off_lo=put(lo_off, sh),
        occ_cp64=None if h.occ_cp64 is None else
        put(_pad_to(np.asarray(h.occ_cp64), nb_pad), sh),
    )
    return ShardedIndex(
        fw=fw,
        ref_words=ShardedWords(
            put(_pad_to(np.asarray(rep.ref_words), nw_pad), sh),
            put(lo_w, sh)),
        refn_words=ShardedWords(
            put(_pad_to(np.asarray(rep.refn_words), nn_pad), sh),
            put(lo_n, sh)),
        ref_cum=put(np.asarray(rep.ref_cum), P()),
        n_ref_total=put(np.asarray(rep.n_ref_total), P()),
    )


def sharded_in_specs(large: bool = False):
    """shard_map in_specs pytree for a ShardedIndex. `large` must match
    whether the index carries the >2^32-row occ_cp64 table (None is an
    empty pytree leaf, so the spec structure must agree)."""
    sh, r = P(SHARD_AXIS), P()
    fw = ShardedFMHalf(n=r, z_off=r, fm_blocks=sh, fchr=r,
                       ftab=r, mark_rows=sh, offs=sh,
                       blk_lo=sh, off_lo=sh,
                       occ_cp64=sh if large else None)
    return ShardedIndex(fw=fw, ref_words=ShardedWords(sh, sh),
                        refn_words=ShardedWords(sh, sh),
                        ref_cum=r, n_ref_total=r)


def make_fused_se_sharded(mesh: Mesh, large: bool = False, **static_kwargs):
    """jit(shard_map(fused_se)) over `mesh` for one static-shape combo.

    Batch arrays and seg tables ride in replicated along SHARD_AXIS; the
    FusedResult blob comes out replicated (identical on every shard after
    the psums), so out_specs=P()."""
    from jax import shard_map

    from bowtie2_tpu.ops.fused import fused_se

    r = P()

    def body(sidx, seg_, jboth, jquals, lens, offs_all, valid_all, minsc,
             live_read, live_or):
        return fused_se.__wrapped__(
            sidx.fw, sidx.ref_words, sidx.refn_words, seg_, jboth, jquals,
            lens, offs_all, valid_all, minsc, live_read, live_or,
            **static_kwargs)

    f = shard_map(
        body, mesh=mesh,
        in_specs=(sharded_in_specs(large), r, r, r, r, r, r, r, r, r),
        out_specs=r, check_vma=False)
    return jax.jit(f)


def make_fused_pe_sharded(mesh: Mesh, large: bool = False, **static_kwargs):
    """jit(shard_map(fused_pe)): the PE search half of the pipeline over a
    sharded index. All five FusedPEResult leaves (metadata blob + the
    direction/read/window device handles kept for the emission backtrace)
    come out replicated; the host pairing/emission layers are unchanged.
    (Mate-rescue DP windows on the host side still gather from the
    replicated copy — at true > HBM scale rescue would need the sharded
    gather too; below that this mode is exercised for correctness.)"""
    from jax import shard_map

    from bowtie2_tpu.ops.fused import fused_pe

    r = P()

    def body(sidx, seg_, jboth, jquals, lens, offs_all, valid_all, minsc,
             live_read, live_or, inst_read, filtered):
        return fused_pe.__wrapped__(
            sidx.fw, sidx.ref_words, sidx.refn_words, seg_, jboth, jquals,
            lens, offs_all, valid_all, minsc, live_read, live_or,
            inst_read, filtered, **static_kwargs)

    f = shard_map(
        body, mesh=mesh,
        in_specs=(sharded_in_specs(large), r, r, r, r, r, r, r, r, r, r, r),
        out_specs=r, check_vma=False)
    return jax.jit(f)
