"""Batched alignment pipelines (unpaired + paired-end).

Host-side orchestration of the device stages, replacing the reference's
per-read worker loop (bt2_search.cpp multiseedSearchWorker:3094 and
SwDriver::extendSeeds/extendSeedsPaired aligner_sw_driver.cpp) with
fixed-shape batch phases:

  phase 1  exact sweep of whole reads, fw+rc            (device)
  phase 2  multiseed instantiate → exact seed search,
           pigeonhole half-read search (≈ oneMmSearch)  (device)
  phase 3  rank/sample SA ranges → resolve offsets      (host rank + device walk)
  phase 4  materialize ref windows → banded DP          (device)
  phase 5  select / pair / mate-rescue DP               (host + device)
  phase 6  backtrace of reported candidates             (device)
  phase 7  MAPQ + CIGAR/MD + SAM                        (host)

Irregular per-read work (variable seed counts, range sizes, candidate
counts) is handled by padding to bucketed shapes with validity masks, and
host-side compaction between phases — per-read branchy control flow becomes
per-stage masking, which is what the TPU wants. Only small arrays cross the
host↔device link (the direction matrices stay on device; see ops/sw.py
backtrace).

Determinism: candidates are processed in a canonical order (exact hits
first, then seed ranges by ascending width, rows in SA order), so output is
reproducible run-to-run and across batch splits. The reference breaks
score ties with a per-read RNG (aln_sink.cpp selectByScore:1477); RNG-parity
tie-breaking is future work — ties here resolve to the canonical order.
"""

import sys
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from bowtie2_tpu.constants import decode_seq
from bowtie2_tpu.index.build import IndexData
from bowtie2_tpu.index.fmindex import FMIndex
from bowtie2_tpu.io.fastx import SeqRecord
from bowtie2_tpu.io.sam import (FLAG_MATE1, FLAG_MATE2, FLAG_MATE_REVERSE,
                                FLAG_MATE_UNMAPPED, FLAG_PAIRED, FLAG_PROPER,
                                FLAG_REVERSE, FLAG_UNMAPPED, SamAlignment,
                                cigar_string, qual_string)
from bowtie2_tpu.ops import fm
from bowtie2_tpu.ops.ref import gather_windows
from bowtie2_tpu.ops.sw import backtrace, sw_banded
from bowtie2_tpu.pipeline.backtrace import cigar_md_from_packed
from bowtie2_tpu.pipeline.mapq import mapq_v2
from bowtie2_tpu.pipeline.pe import PE_DISCORD, pe_classify, rescue_window
from bowtie2_tpu.pipeline.policy import Policy
from bowtie2_tpu.utils.metrics import Metrics

# bucket spacing tuned on the lambda mix: coarser halves the per-bucket
# fixed costs (scan launches), finer shrinks the quadratic DP pad; ~2x
# spacing measured best (3.73s vs 4.36s fine / 4.23s coarse for 10k reads).
# 128 added for the dominant Illumina 100-125 bp read lengths (a 192 pad
# costs ~45% extra scan steps on an all-100bp corpus); sparse bucket
# groups are merged upward at batch-planning time (bucket_groups) so the
# finer spacing never adds dispatches on mixed-length corpora.
LEN_BUCKETS = (96, 128, 192, 384, 768, 1536, 3072, 8192)

BT_FIELDS = ("read_start", "ref_start_win", "n_mm", "n_go",
             "n_gc", "n_refn", "score_check")


LONG_READ_MAX = 1 << 20      # 1 Mbp: sanity ceiling for the long path


def bucket_groups(lengths, merge_below: int = 1024):
    """Group read indices by length bucket for dispatch, merging sparse
    groups into the next-present larger bucket.

    Each device dispatch has a large fixed cost (the fused program is a
    few hundred sequential scan steps; measured ~0.2 s/dispatch on v5e
    regardless of batch rows), so padding a small group up one bucket is
    cheaper than giving it its own program. Returns {bucket: [indices]}
    with sorted keys insertion order."""
    by = {}
    for i, ln in enumerate(lengths):
        by.setdefault(_bucket(max(int(ln), 1)), []).append(i)
    bkts = sorted(by)
    out = {}
    pending = None          # (indices) waiting to merge upward
    for j, b in enumerate(bkts):
        idxs = by[b]
        if pending is not None:
            idxs = pending + idxs
            pending = None
        if len(idxs) < merge_below and j + 1 < len(bkts):
            pending = idxs
        else:
            out[b] = idxs
    if pending is not None:
        if bkts[-1] in out:
            out[bkts[-1]] = out[bkts[-1]] + pending
        else:
            out[bkts[-1]] = pending
    return out


def _bucket(n: int, buckets=LEN_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    # long-read buckets: pow2 sizes served by the diagonal-band kernel
    b = buckets[-1]
    while b < n and b < LONG_READ_MAX:
        b *= 2
    if n > b:
        raise ValueError(f"read length {n} exceeds max supported {b}")
    return b


def _u32pos(a: np.ndarray) -> np.ndarray:
    """Decode an int32-wrapped global position back to int64.

    The fused PE metadata exports global reference positions as int32 to
    keep the blob one dtype; in the large-index mode true positions span
    [-(G+31), 4.29e9) — an interval shorter than 2^32, so the mod-2^32
    image is unambiguous: values in the top 4096 slots are the (small)
    negatives, everything else is the non-negative position."""
    v = a.astype(np.int64) & 0xFFFFFFFF
    return np.where(v >= (1 << 32) - 4096, v - (1 << 32), v)


def _pow2_at_least(n: int, lo: int = 256) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _round_batch(n: int, lo: int = 256) -> int:
    """Batch-row padding: pow2 below 1024, multiples of 1024 above.

    Pow2-everywhere padded 4653 reads to 8192 rows (76% extra gather
    rows in every FM phase); 1024-granularity is never worse than pow2
    padding and caps waste at ~20% once n is well above ~5k (just past
    a boundary — e.g. 1025 -> 2048 — waste still approaches 100%,
    exactly as pow2 would), while keeping the compiled-shape family
    small."""
    b = lo
    while b < n and b < 1024:
        b *= 2
    if b >= n:
        return b
    return -(-n // 1024) * 1024


@dataclass
class AlignStats:
    reads: int = 0
    unal: int = 0
    al_one: int = 0
    al_multi: int = 0
    filtered: int = 0
    # paired-end
    pairs: int = 0
    conc_one: int = 0
    conc_multi: int = 0
    disc: int = 0
    mate_al_one: int = 0   # mates of non-conc/disc pairs aligning once
    mate_al_multi: int = 0

    def merge(self, o: "AlignStats") -> None:
        for f in self.__dataclass_fields__:
            setattr(self, f, getattr(self, f) + getattr(o, f))

    def summary(self) -> str:
        """stderr summary in the reference's format (aln_sink.cpp printAlSumm)."""
        if self.pairs:
            return self._summary_paired()
        n = max(self.reads, 1)
        lines = [f"{self.reads} reads; of these:",
                 f"  {self.reads} (100.00%) were unpaired; of these:",
                 f"    {self.unal} ({100.0*self.unal/n:.2f}%) aligned 0 times",
                 f"    {self.al_one} ({100.0*self.al_one/n:.2f}%) aligned exactly 1 time",
                 f"    {self.al_multi} ({100.0*self.al_multi/n:.2f}%) aligned >1 times",
                 f"{100.0*(self.al_one+self.al_multi)/n:.2f}% overall alignment rate"]
        return "\n".join(lines)

    def _summary_paired(self) -> str:
        np_ = max(self.pairs, 1)
        conc0 = self.pairs - self.conc_one - self.conc_multi
        nodisc = conc0 - self.disc
        nmates = max(2 * nodisc, 1)
        mate0 = 2 * nodisc - self.mate_al_one - self.mate_al_multi
        tot = 2 * self.pairs
        al = tot - mate0 if tot else 0
        lines = [
            f"{self.pairs} reads; of these:",
            f"  {self.pairs} (100.00%) were paired; of these:",
            f"    {conc0} ({100.0*conc0/np_:.2f}%) aligned concordantly 0 times",
            f"    {self.conc_one} ({100.0*self.conc_one/np_:.2f}%) aligned concordantly exactly 1 time",
            f"    {self.conc_multi} ({100.0*self.conc_multi/np_:.2f}%) aligned concordantly >1 times",
            "    ----",
            f"    {conc0} pairs aligned concordantly 0 times; of these:",
            f"      {self.disc} ({100.0*self.disc/max(conc0,1):.2f}%) aligned discordantly 1 time",
            "    ----",
            f"    {nodisc} pairs aligned 0 times concordantly or discordantly; of these:",
            f"      {2*nodisc} mates make up the pairs; of these:",
            f"        {mate0} ({100.0*mate0/nmates:.2f}%) aligned 0 times",
            f"        {self.mate_al_one} ({100.0*self.mate_al_one/nmates:.2f}%) aligned exactly 1 time",
            f"        {self.mate_al_multi} ({100.0*self.mate_al_multi/nmates:.2f}%) aligned >1 times",
            f"{100.0*al/max(tot,1):.2f}% overall alignment rate"]
        return "\n".join(lines)


def pad_reads(records: Sequence[SeqRecord], Lmax: int):
    """Batch padding: → (fw, qu, rc, qu_r, lens), arrays (B, Lmax) int8
    (4x cheaper host→device transfers; kernels upcast on device).

    Pad code is 4 (N) for sequence, 0 for quals. Native C scatter with a
    numpy fallback.
    """
    B = len(records)
    lens = np.array([r.seq.size for r in records], dtype=np.int32)
    if B == 0:
        return (np.full((0, Lmax), 4, np.int8), np.zeros((0, Lmax), np.int8),
                np.full((0, Lmax), 4, np.int8), np.zeros((0, Lmax), np.int8),
                lens)
    allseq = np.concatenate([r.seq for r in records]).astype(np.int8)
    allq = np.concatenate([r.qual for r in records]).astype(np.int8)
    try:
        from bowtie2_tpu.native.samemit import pad_reads_c
        starts = np.zeros(B, np.int64)
        starts[1:] = np.cumsum(lens[:-1], dtype=np.int64)
        fw, qu, rc, qu_r = pad_reads_c(allseq, allq, starts, lens, B, Lmax)
        return fw, qu, rc, qu_r, lens
    except ImportError:
        pass
    fw = np.full((B, Lmax), 4, dtype=np.int8)
    qu = np.zeros((B, Lmax), dtype=np.int8)
    rc = np.full((B, Lmax), 4, dtype=np.int8)
    qu_r = np.zeros((B, Lmax), dtype=np.int8)
    row = np.repeat(np.arange(B), lens)
    col = np.arange(allseq.size) - np.repeat(np.cumsum(lens) - lens, lens)
    rcol = np.repeat(lens, lens) - 1 - col
    fw[row, col] = allseq
    qu[row, col] = allq
    rc[row, rcol] = np.where(allseq < 4, 3 - allseq, 4)
    qu_r[row, rcol] = allq
    return fw, qu, rc, qu_r, lens


@dataclass
class DPPool:
    """One batch of banded-DP problems + results (device handles kept)."""
    G: int
    Lmax: int
    n: int                       # live problems (rest is padding)
    win_start: np.ndarray        # (NC,) global window start per problem
    rid: np.ndarray              # (n,) reference id
    scores: np.ndarray           # (n,) int64
    rows_end: np.ndarray         # (NC,)
    lanes_end: np.ndarray        # (NC,)
    dirs: object                 # device (Lmax, NCDP, W) — NCDP <= NC when
                                 # the fused DP-lane bypass compacted
    jreads: object               # device (NC, Lmax)
    jquals: object               # device (NC, Lmax)
    wins: object                 # device (NC, Lmax + 2G)
    dplane: np.ndarray = None    # (NC,) candidate -> dirs lane (-1 =
                                 # bypassed/gapless); None = identity

    def end_pos(self, k) -> np.ndarray:
        """Global position of the last ref char consumed (exact).

        lanes_end is the best cell's rect COLUMN (ops/sw.py column-space
        rect DP), so the window start plus the column is the position."""
        return (self.win_start[k] + self.lanes_end[k]).astype(np.int64)


@dataclass
class CandSet:
    """Search result for a batch of reads: candidates + DP scores."""
    B: int
    Lmax: int
    lens: np.ndarray
    fw: np.ndarray
    qu: np.ndarray
    rc: np.ndarray
    qu_r: np.ndarray
    minsc: np.ndarray
    perfect: np.ndarray
    filtered: np.ndarray
    yf: np.ndarray = None         # (B,) int8 filter-reason codes (YF_*)
    jboth: object = None          # device (2B, Lmax) int8 fw+rc reads
    jquals: object = None         # device (2B, Lmax) int8 quals fw+rev
    n_cand: int = 0
    cand_read: np.ndarray = None
    cand_or: np.ndarray = None
    anchor: np.ndarray = None
    rid: np.ndarray = None
    valid: np.ndarray = None
    end_pos: np.ndarray = None
    pool: Optional[DPPool] = None
    cand_exact: np.ndarray = None    # candidate from exact end-to-end hit
    cand_half: np.ndarray = None     # candidate from half-read (1mm) range
    cand_rangej: np.ndarray = None   # source range id (width-sorted index;
                                     # -2/-1 for exact fw/rc)
    cand_rwidth: np.ndarray = None   # SA width of the source range
    ee_elts: np.ndarray = None       # (2B,) exact end-to-end elements/orient
    inst0: np.ndarray = None         # (2B,) round-0 N-free instantiated seeds
    seed_elts: np.ndarray = None     # (B,) summed seed SA widths (fw+rc)
    seed_nz: np.ndarray = None       # (B,) nonzero seed ranges (fw+rc)
    sw_top: np.ndarray = None        # (2B,) exact-sweep SA tops (fw then rc)
    sw_bot: np.ndarray = None        # (2B,) bots (strand-suppression applied)
    sw_ned: np.ndarray = None        # (2B,) sweep edit lower bounds


class BatchAligner:
    """Shared search machinery for unpaired and paired aligners."""

    _names_tab = None      # RefNameTable for the native line builders

    MAX_EXACT_ROWS = 4      # rows resolved per exact-hit range per orientation
    NC_PER_READ = 16        # candidate extension budget per read (~ -D/maxIters)

    def __init__(self, data: IndexData, policy: Policy, mesh=None,
                 shard_mesh=None):
        """mesh: optional jax.sharding.Mesh with a "data" axis — the index
        is replicated onto every device and all batch-leading device arrays
        are sharded over it (the reference's parallelism is threads over
        reads with one shared read-only index, bt2_search.cpp:4874; here
        the "threads" are TPU chips). Batch sizes must divide the axis.

        shard_mesh: optional Mesh with a "shard" axis — the > HBM index
        mode: FM/ref tables are SPLIT over the axis with owner-computes +
        psum gathers (dist/sharded.py) instead of replicated. The fused SE
        pipeline runs under shard_map; host fallback paths still use the
        replicated copy (fine below HBM scale, where this mode is only
        exercised for testing)."""
        self.data = data
        self.pol = policy
        self.mesh = mesh
        self.idx = FMIndex.from_host(data)
        self.shard_mesh = shard_mesh
        self._shard_fns = {}
        if shard_mesh is not None:
            from bowtie2_tpu.dist.sharded import shard_index
            self.sidx = shard_index(data, shard_mesh)
        if mesh is not None:
            from bowtie2_tpu.dist.mesh import replicate_index
            self.idx = replicate_index(self.idx, mesh)
            from jax.sharding import NamedSharding, PartitionSpec
            self._batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
        self.stats = AlignStats()
        self.metrics = Metrics()
        # --log-dp sink (reference SwAligner dpLog, aligner_sw.cpp:61):
        # one tab-separated descriptor per DP problem. Our analog logs
        # (read, strand, refid, window_start, rect_cols, minsc, score) —
        # the rect geometry fields differ from the reference's DPRect
        # serialization but carry the same information.
        self.dp_log = None
        self._stats_lock = threading.Lock()   # align_batch is thread-safe
        self._seg_end_joined = data.seg_joined_start + data.seg_len
        # device segment tables for the fused pipeline (replicated: tiny);
        # row dtype follows the index (int64 for ".bt2l"-scale genomes)
        from bowtie2_tpu.ops.fused import SegTables
        sdt = np.int64 if data.fw.occ_cp.dtype == np.int64 else np.int32
        self.seg = SegTables(
            seg_joined_start=jnp.asarray(data.seg_joined_start.astype(sdt)),
            seg_global_start=jnp.asarray(data.seg_global_start.astype(sdt)),
            seg_end_joined=jnp.asarray(self._seg_end_joined.astype(sdt)),
            ref_cum=jnp.asarray(data.ref_cum.astype(sdt)))
        self._row_dtype = sdt

    def _put(self, a):
        """Host→device: batch-axis sharded over the mesh when one is set."""
        if self.mesh is None:
            return jnp.asarray(a)
        import jax
        return jax.device_put(np.asarray(a), self._batch_sharding)

    # YF filter-reason codes (= native samemit mode values)
    YF_NS, YF_LN, YF_QC, YF_SC = 2, 3, 4, 5
    YF_STR = {0: None, 2: "NS", 3: "LN", 4: "QC", 5: "SC"}

    def _filters(self, records, lens, n_count, nceil, minsc):
        """Pre-alignment read filters → (filtered, yf_codes).

        Reference predicates (bt2_search.cpp:3385-3408): length filter
        (rdlen <= -N mms or < 2), N filter (Ns > nceil), score filter
        (perfect score < minsc), upstream QC (--qc-filter). YF priority
        LN > NS > SC > QC (aligner_result.cpp:1097-1101)."""
        pol = self.pol
        lenf = (lens <= pol.seed_mms) | (lens < 2)
        nsf = n_count > nceil
        scf = lens.astype(np.int64) * pol.match_bonus < minsc
        qcf = np.zeros(lens.size, bool)
        for i, r in enumerate(records):
            if getattr(r, "qc_fail", False):
                qcf[i] = True
        yf = np.where(lenf, self.YF_LN,
                      np.where(nsf, self.YF_NS,
                               np.where(scf, self.YF_SC,
                                        np.where(qcf, self.YF_QC, 0))))
        return lenf | nsf | scf | qcf, yf.astype(np.int8)

    def _live_orient(self, B: int, paired: bool) -> Optional[np.ndarray]:
        """--nofw/--norc per-orientation-row liveness, or None if both live.

        Rows < B are fw-orientation, >= B rc. In paired mode the flags
        pertain to the FRAGMENT, so each mate's suppression flips with its
        expected orientation (bt2_search.cpp:3418-3424: nofw[mate] =
        matefw ? gNofw : gNorc). Paired row layout: mate1 reads occupy
        read indices [0, B/2), mate2 [B/2, B)."""
        pol = self.pol
        if not (pol.nofw or pol.norc):
            return None
        live = np.ones(2 * B, bool)
        if not paired:
            if pol.nofw:
                live[:B] = False
            if pol.norc:
                live[B:] = False
            return live
        nb = B // 2
        m1fw = pol.mate_fw_rc[0] == "f"
        m2fw = pol.mate_fw_rc[1] == "f"
        for mate, matefw in ((0, m1fw), (1, m2fw)):
            nofw_m = pol.nofw if matefw else pol.norc
            norc_m = pol.norc if matefw else pol.nofw
            sl_fw = slice(mate * nb, (mate + 1) * nb)
            sl_rc = slice(B + mate * nb, B + (mate + 1) * nb)
            if nofw_m:
                live[sl_fw] = False
            if norc_m:
                live[sl_rc] = False
        return live

    # ---------------- phases 1-5a: search → scored candidates ----------------
    def _search_candidates(self, records: Sequence[SeqRecord],
                           paired: bool = False,
                           nrounds: int = 1) -> CandSet:
        pol = self.pol
        B = len(records)
        fw, qu, rc, qu_r, lens = pad_reads(
            records, _bucket(max(max(int(r.seq.size) for r in records), 1)))
        Lmax = fw.shape[1]

        ulen, inv = np.unique(lens, return_inverse=True)
        minsc = np.array([pol.min_score(int(l)) if l else 0
                          for l in ulen], np.int64)[inv]
        perfect = np.array([pol.perfect_score(int(l)) if pol.local else 0
                            for l in ulen], np.int64)[inv]
        nceil = np.array([pol.nceil(int(l)) if l else 0
                          for l in ulen], np.int32)[inv]
        n_count = (fw >= 4).sum(axis=1) - (Lmax - lens)
        filtered, yf = self._filters(records, lens, n_count, nceil, minsc)

        cs = CandSet(B=B, Lmax=Lmax, lens=lens, fw=fw, qu=qu, rc=rc,
                     qu_r=qu_r, minsc=minsc, perfect=perfect,
                     filtered=filtered, yf=yf)
        import time as _time
        _t = _time.time()

        # long reads (> the rectangle buckets): the whole-read exact sweep
        # and half-read 1mm search are Lmax-step scans — skipped (an
        # exact/1mm full-length hit at 8 kbp+ is vanishing, and the seed
        # path finds the same alignment); DP runs on the diagonal-band
        # kernel (linear memory).
        long_mode = Lmax > LEN_BUCKETS[-1]

        # phase 1+2: dispatch all three searches before pulling any result
        # (the device→host link is high-latency; stacked single transfers)
        both = np.concatenate([fw, rc], axis=0)          # (2B, Lmax) int8
        both_lens = np.concatenate([lens, lens])
        # transfer int8 (4x cheaper over the tunnel), compute in int32
        # (int8 elementwise ops are slower on the VPU's (32,128) tiling)
        cs.jboth = self._put(both).astype(jnp.int32)
        cs.jquals = self._put(np.concatenate([qu, qu_r], axis=0)).astype(jnp.int32)
        if long_mode:
            z2 = np.zeros(2 * B, dtype=self._row_dtype)
            sweep_d = jnp.asarray(np.stack(
                [z2, z2, np.full(2 * B, 99, np.int32).astype(z2.dtype)]))
        else:
            sweep = fm.exact_sweep(self.idx.fw, cs.jboth,
                                   self._put(both_lens))
            sweep_d = jnp.stack([sweep.top, sweep.bot, sweep.nedit])
        # paired-end reads with both mates passing filter get a 20%-boosted
        # seed interval (bt2_search.cpp:3445-3448)
        ival_boost = None
        if paired:
            hb = B // 2
            okm = ~filtered
            ival_boost = okm & np.roll(okm, hb)
        seed_or, seed_off, seed_mlen, seed_tb_d, sshape, cs.inst0 = \
            self._seed_search(fw, rc, lens, ival_boost, nrounds=nrounds,
                              max_seeds=512 if long_mode else 64)
        if long_mode:
            half_off = np.zeros((2 * B, 2), np.int64)
            half_mlen = np.ones((2 * B, 2), np.int64)
            half_tb_d = jnp.asarray(np.stack(
                [np.ones((2, 2 * B), self._row_dtype),
                 np.zeros((2, 2 * B), self._row_dtype)]).reshape(2, -1))
        else:
            half_off, half_mlen, half_tb_d = self._half_search(
                both, both_lens, cs.jboth)
        if pol.seed_mms >= 1:
            # -N 1: a seed occurrence with <=1 mismatch has one exact seed
            # half (pigeonhole, verified by the DP extension) — the TPU
            # formulation of searchSeedBi's in-seed mismatch branching
            # (aligner_seed.cpp:1859); sensitivity superset of the
            # reference's.
            sh_off, sh_mlen, sh_tb_d = self._seed_half_search(
                fw, rc, seed_off, seed_or)
        sw_top, sw_bot, sw_ned = np.asarray(sweep_d)
        if pol.no_exact:   # --no-exact-upfront: drop the exact-sweep phase
            sw_bot = sw_top.copy()
        cs.ee_elts = np.where((sw_ned == 0) & (sw_bot > sw_top),
                              sw_bot - sw_top, 0)
        st_bt = np.asarray(seed_tb_d)
        seed_top = st_bt[0, :sshape[0]].reshape(sshape[1], sshape[2])
        seed_bot = st_bt[1, :sshape[0]].reshape(sshape[1], sshape[2])
        # per-read seed-hit demand for the --seed-boost gate
        # (SeedResults::averageHitsPerSeed, bt2_search.cpp:4146)
        sw_ = np.maximum(seed_bot - seed_top, 0)
        cs.seed_elts = sw_[:B].sum(axis=1) + sw_[B:].sum(axis=1)
        cs.seed_nz = (sw_[:B] > 0).sum(axis=1) + (sw_[B:] > 0).sum(axis=1)
        ht_bt = np.asarray(half_tb_d)
        half_top = ht_bt[0].reshape(2, -1).T
        half_bot = ht_bt[1].reshape(2, -1).T
        if pol.no_1mm:   # --no-1mm-upfront: drop the 1-mismatch phase
            half_bot = half_top.copy()
        # merge half-read hits into the seed-range arrays (2B, smax+2)
        smax0 = seed_off.shape[1]
        seed_off = np.concatenate([seed_off, half_off], axis=1)
        seed_top = np.concatenate([seed_top, half_top], axis=1)
        seed_bot = np.concatenate([seed_bot, half_bot], axis=1)
        seed_mlen = np.concatenate([seed_mlen, half_mlen], axis=1)
        seed_half = np.zeros_like(seed_off, dtype=bool)
        seed_half[:, smax0:] = True
        if pol.seed_mms >= 1:
            st_sh = np.asarray(sh_tb_d)
            nsh = sh_off.shape[1]
            seed_off = np.concatenate([seed_off, sh_off], axis=1)
            seed_top = np.concatenate(
                [seed_top, st_sh[0].reshape(2 * B, nsh)], axis=1)
            seed_bot = np.concatenate(
                [seed_bot, st_sh[1].reshape(2 * B, nsh)], axis=1)
            seed_mlen = np.concatenate([seed_mlen, sh_mlen], axis=1)
            seed_half = np.concatenate(
                [seed_half, np.zeros_like(sh_off, dtype=bool)], axis=1)
        self.metrics.add(
            t_search=_time.time() - _t,
            fm_lf_steps=2 * B * Lmax + seed_off.size * 12 + 2 * B * (Lmax // 2))
        _t = _time.time()

        # --nofw/--norc: suppressed orientation rows get empty SA ranges
        live_or = self._live_orient(B, paired)
        if live_or is not None:
            sw_bot = np.where(live_or, sw_bot, sw_top)
            seed_bot = np.where(live_or[:, None], seed_bot, seed_top)
        cs.sw_top, cs.sw_bot, cs.sw_ned = sw_top, sw_bot, sw_ned

        # phase 3: rank + resolve
        (cand_read, cand_or, cand_off, cand_row, cand_exact, cand_mlen,
         cand_half, cand_rangej, cand_rwidth) = \
            self._assemble_candidates(B, lens, filtered, sw_top, sw_bot,
                                      sw_ned, seed_off, seed_top,
                                      seed_bot, seed_mlen, seed_half)

        n_cand = cand_row.size
        if not n_cand:
            cs.n_cand = 0
            cs.cand_read = np.zeros(0, np.int64)
            return cs

        NR = _pow2_at_least(n_cand)
        rows_pad = np.zeros(NR, dtype=self._row_dtype)
        rows_pad[:n_cand] = cand_row
        jpos = np.asarray(fm.sa_resolve(
            self.idx.fw, self._put(rows_pad),
            period=1 << self.data.off_rate))[:n_cand].astype(np.int64)

        # straddle filter: the matched stretch must stay in one segment
        seg = np.searchsorted(self.data.seg_joined_start, jpos,
                              side="right") - 1
        ok = jpos + cand_mlen <= self._seg_end_joined[seg]
        # half-read (1mm-upfront) hits emulate oneMmSearch, whose hits span
        # the FULL read in the reference's N-excised joined text
        # (aligner_seed.cpp:975; straddles discarded by joinedToTextOff) —
        # so the whole read's joined extent must fit one segment, not just
        # the exact-matched half.
        r0 = jpos - cand_off
        full_ok = (r0 >= self.data.seg_joined_start[seg]) & \
                  (r0 + lens[cand_read] <= self._seg_end_joined[seg])
        ok &= ~cand_half | full_ok
        (cand_read, cand_or, cand_off, cand_exact, cand_half, cand_rangej,
         cand_rwidth, jpos, seg) = (
            a[ok] for a in (cand_read, cand_or, cand_off, cand_exact,
                            cand_half, cand_rangej, cand_rwidth, jpos, seg))

        self.metrics.add(t_resolve=_time.time() - _t,
                         sa_resolves=int(jpos.size))
        _t = _time.time()
        gpos = (self.data.seg_global_start[seg]
                + (jpos - self.data.seg_joined_start[seg]))
        anchor = gpos - cand_off
        rid = np.searchsorted(self.data.ref_cum, gpos, side="right") - 1

        # dedupe by (read, orient, anchor); canonical order keeps exacts
        key = (cand_read.astype(np.int64) * 2 + cand_or) * (1 << 40) \
            + (anchor + (1 << 35))
        uniq, first_raw, inv = np.unique(key, return_index=True,
                                         return_inverse=True)
        # aggregate source flags across the duplicate group: an anchor
        # discoverable via a seed is not subject to the half-candidate
        # (1-mismatch upfront) admission gate, and the -D effort model
        # assigns each anchor to the EARLIEST phase that discovers it
        g_exact = np.zeros(uniq.size, bool)
        np.logical_or.at(g_exact, inv, cand_exact)
        g_half = np.zeros(uniq.size, bool)
        np.logical_or.at(g_half, inv, cand_half)
        g_seed = np.zeros(uniq.size, bool)
        np.logical_or.at(g_seed, inv, ~cand_exact & ~cand_half)
        first_idx = np.sort(first_raw)
        grp = inv[first_idx]
        (cand_read, cand_or, cand_rangej, cand_rwidth, anchor, rid) = (
            a[first_idx] for a in (cand_read, cand_or, cand_rangej,
                                   cand_rwidth, anchor, rid))
        cand_exact = g_exact[grp]
        cand_half = g_half[grp]
        cand_half_only = cand_half & ~g_seed[grp] & ~cand_exact

        # phase 4: windows + DP
        n_cand = anchor.size
        G = pol.band_halfwidth(Lmax)
        pool = self._run_dp(anchor - G, rid, cand_read, cand_or,
                            cs.jboth, cs.jquals, lens, G, Lmax, n_cand,
                            diag_kernel=long_mode)

        valid = pool.scores >= minsc[cand_read]
        # half-read (pigeonhole) candidates model the reference's up-front
        # 1-mismatch search (oneMmSearch): only admit them when the implied
        # end-to-end ungapped alignment has <= 1 mismatch, so sensitivity
        # matches the reference's.
        valid &= ~(cand_half_only & (pool.mm_ug > 1))

        self.metrics.add(
            t_dp=_time.time() - _t, dp_problems=n_cand,
            dp_cells=n_cand * Lmax * (Lmax + 2 * G + 1))
        cs.n_cand = n_cand
        cs.cand_read = cand_read
        cs.cand_or = cand_or
        cs.anchor = anchor
        cs.rid = rid
        cs.valid = valid
        cs.end_pos = pool.end_pos(np.arange(n_cand))
        cs.pool = pool
        cs.cand_exact = cand_exact
        cs.cand_half = cand_half
        cs.cand_rangej = cand_rangej
        cs.cand_rwidth = cand_rwidth
        return cs

    def _run_dp(self, win_start, rid, read_idx, orient, jboth, jquals,
                lens, G: int, Lmax: int, n: int,
                full_width: bool = False,
                diag_kernel: bool = False) -> DPPool:
        """Gather windows + run banded DP for n problems (padded to pow2).

        Candidate read/qual rows are gathered ON DEVICE from the batch
        arrays uploaded in phase 1 (jboth/jquals, int8): only the (NC,)
        row indices cross the host link."""
        pol = self.pol
        B = lens.size
        width = Lmax + 2 * G + 1
        NC = _pow2_at_least(max(n, 1))
        starts = np.zeros(NC, dtype=self._row_dtype)
        lo = np.zeros(NC, dtype=self._row_dtype)
        hi = np.zeros(NC, dtype=self._row_dtype)
        starts[:n] = win_start
        lo[:n] = self.data.ref_cum[rid]
        hi[:n] = self.data.ref_cum[rid + 1]
        wins = gather_windows(self.idx.ref_words, self.idx.refn_words,
                              self._put(starts), self._put(lo),
                              self._put(hi), width)

        cr = np.zeros(NC, dtype=np.int64)
        cr[:n] = read_idx
        co = np.zeros(NC, dtype=np.int64)
        co[:n] = orient
        rows_idx = (co * B + cr).astype(np.int32)
        jrows = self._put(rows_idx)
        jreads_c = jnp.take(jboth, jrows, axis=0)
        jquals_c = jnp.take(jquals, jrows, axis=0)
        lens_c = np.maximum(lens[cr], 1)
        lens_c[n:] = 1
        jlens_c = self._put(lens_c)
        # mate-rescue windows span the whole fragment range: every column
        # of the gathered window is a valid rect column
        rect_cols = np.full(NC, width, np.int32) if full_width \
            else (lens_c + 2 * G + 1).astype(np.int32)
        if diag_kernel:
            from bowtie2_tpu.ops.sw import sw_banded_diag
            res = sw_banded_diag(jreads_c, jquals_c, jlens_c, wins,
                                 pol.sw_params(), G)
        else:
            res = sw_banded(jreads_c, jquals_c, jlens_c, wins,
                            pol.sw_params(), G, self._put(rect_cols))
        # ungapped mismatch count at the anchor diagonal (for the
        # half-candidate 1mm admission gate) — same transfer as DP results
        diag = wins[:, G:G + Lmax]
        mm_ug_d = jnp.sum(
            ((jreads_c != diag) | (jreads_c >= 4))
            & (jnp.arange(Lmax)[None, :] < jlens_c[:, None]), axis=1)
        sw4 = np.asarray(jnp.stack([res.score, res.row, res.lane, mm_ug_d]))
        ws = np.zeros(NC, dtype=np.int64)
        ws[:n] = win_start
        # diag kernel lanes are BAND columns; pool keeps rect columns so
        # end_pos()/emission math is kernel-agnostic, and the band lane is
        # retained for backtrace_diag
        lanes_rect = sw4[2] + (sw4[1] if diag_kernel else 0)
        pool = DPPool(G=G, Lmax=Lmax, n=n, win_start=ws,
                      rid=rid, scores=sw4[0, :n].astype(np.int64),
                      rows_end=sw4[1], lanes_end=lanes_rect,
                      dirs=res.dirs, jreads=jreads_c, jquals=jquals_c,
                      wins=wins)
        pool.mm_ug = sw4[3, :n]
        pool.diag = diag_kernel
        pool.band_lanes = sw4[2]
        return pool

    # ---------------- phase 6: backtrace of chosen problems ----------------
    def _gapless_core(self, pool: DPPool, sel: np.ndarray,
                      codes_sel: np.ndarray, quals_sel: np.ndarray,
                      lens_sel: np.ndarray, end_sel: np.ndarray):
        """Vectorized gapless-diagonal readout for emission (e2e only).

        A candidate whose DP score equals the pure diagonal score ending at
        its best cell walks that diagonal exactly (the forward pass prefers
        DIAG on ties — see ops/sw.diag_readout for the induction), so its
        CIGAR/MD/edit counts can be synthesized from the reference words
        directly, skipping the device backtrace round trip. Returns
        (okg, eq, fc, g0, nmm, nrefn) over sel."""
        pol = self.pol
        p = pol.sw_params()
        L = lens_sel.astype(np.int64)
        rows_end = pool.rows_end[sel]
        rid = pool.rid[sel].astype(np.int64)
        lo = self.data.ref_cum[rid]
        hi = self.data.ref_cum[rid + 1]
        g0 = end_sel.astype(np.int64) - (L - 1)
        Lm = codes_sel.shape[1]
        ar = np.arange(Lm, dtype=np.int64)
        gp = g0[:, None] + ar[None, :]
        live = ar[None, :] < L[:, None]
        inref = (gp >= lo[:, None]) & (gp < hi[:, None])
        gpc = np.clip(gp, 0, int(self.data.ref_cum[-1]) - 1)
        rw = self.data.ref_words
        rn = self.data.refn_words
        fc = ((rw[gpc >> 4] >> (2 * (gpc & 15))) & 3).astype(np.int64)
        fc = np.where((rn[gpc >> 5] >> (gpc & 31)) & 1, 4, fc)
        fc = np.where(inref, fc, 5)
        rd = codes_sel.astype(np.int64)
        is_n = (rd >= 4) | (fc == 4)
        oob = fc >= 5
        eq = (fc == rd) & ~is_n & ~oob
        q = np.minimum(quals_sel.astype(np.int64), 40)
        mmpen = p.mm_pen_min + (q * (p.mm_pen_max - p.mm_pen_min)) // 40
        sub = np.where(eq, p.match_bonus,
                       np.where(is_n & ~oob, -p.n_pen, -mmpen))
        dscore = np.where(live & ~oob, sub, 0).sum(axis=1)
        okg = ~(live & oob).any(axis=1) \
            & (dscore == pool.scores[sel]) \
            & (rows_end == L - 1) \
            & (g0 >= pool.win_start[sel])   # full diagonal inside the rect
        nmm = ((live & ((~eq & (rd < 4) & (fc != 4)) | is_n))
               .astype(np.int64)).sum(axis=1)
        nrefn = (live & (fc == 4)).sum(axis=1)
        return okg, eq, fc, g0, nmm, nrefn

    def _gapless_tb(self, pool: DPPool, sel: np.ndarray,
                    codes_sel: np.ndarray, quals_sel: np.ndarray,
                    lens_sel: np.ndarray, end_sel: np.ndarray):
        """_gapless_core + per-candidate CIGAR/MD string synthesis.

        Returns (tb dict for the gapless members, remaining sel array)."""
        pol = self.pol
        if sel.size == 0 or pol.local:
            return {}, sel
        okg, eq, fc, g0, nmm, nrefn = self._gapless_core(
            pool, sel, codes_sel, quals_sel, lens_sel, end_sel)
        L = lens_sel.astype(np.int64)

        from bowtie2_tpu.pipeline.backtrace import _REF_CHARS
        tb = {}
        sc_sel = pool.scores[sel]
        mop = "=" if pol.xeq else "M"
        for t in np.nonzero(okg)[0].tolist():
            k = int(sel[t])
            Lt = int(L[t])
            ev = np.nonzero(~eq[t, :Lt])[0]
            if pol.xeq and ev.size:
                key = eq[t, :Lt]
                change = np.nonzero(np.diff(key))[0]
                bounds = np.concatenate([[0], change + 1, [Lt]])
                cigar = [("=" if key[s] else "X", int(e - s))
                         for s, e in zip(bounds[:-1], bounds[1:])]
            else:
                cigar = [(mop, Lt)]
            parts = []
            prev = 0
            for e in ev.tolist():
                parts.append(str(e - prev))
                parts.append(_REF_CHARS[int(fc[t, e])])
                prev = e + 1
            parts.append(str(Lt - prev))
            sc = {"read_start": 0,
                  "ref_start_win": int(g0[t] - pool.win_start[k]),
                  "n_mm": int(nmm[t]), "n_go": 0, "n_gc": 0,
                  "n_refn": int(nrefn[t]),
                  "score_check": int(sc_sel[t]),
                  "cigar_ops": cigar, "md": "".join(parts)}
            tb[k] = (None, sc)
        return tb, sel[~okg]

    def _gapless_tb_raw(self, pool: DPPool, sel: np.ndarray,
                        codes_sel: np.ndarray, quals_sel: np.ndarray,
                        lens_sel: np.ndarray, end_sel: np.ndarray):
        """_gapless_core + VECTORIZED packed-op column synthesis for the
        native line builder (no per-candidate Python): gapless candidates
        get an all-OP_M walk column carrying (refchar, ismatch) bits, the
        same byte layout the device backtrace emits (ops/sw.py
        diag_readout), so the C decoder handles both uniformly.

        Returns (okg, ops_syn (nsel, Lmax) uint8 walk rows,
        ref_start_win, nmm, nrefn)."""
        from bowtie2_tpu.ops.sw import OP_M, OP_NONE
        if sel.size == 0 or self.pol.local:
            z = np.zeros(0, np.int64)
            return (np.zeros(0, bool),
                    np.zeros((0, codes_sel.shape[1]), np.uint8), z, z, z)
        okg, eq, fc, g0, nmm, nrefn = self._gapless_core(
            pool, sel, codes_sel, quals_sel, lens_sel, end_sel)
        L = lens_sel.astype(np.int64)
        Lm = codes_sel.shape[1]
        ar = np.arange(Lm, dtype=np.int64)
        pos = L[:, None] - 1 - ar[None, :]          # walk step -> read pos
        posc = np.clip(pos, 0, Lm - 1)
        opb = (OP_M
               | (np.take_along_axis(fc, posc, axis=1) << 2)
               | (np.take_along_axis(eq.astype(np.int64), posc, axis=1)
                  << 5))
        ops_syn = np.where(pos >= 0, opb, OP_NONE).astype(np.uint8)
        return okg, ops_syn, g0 - pool.win_start[sel], nmm, nrefn

    def _backtrace_sel(self, pool: DPPool, sel: np.ndarray):
        """Backtrace pool problems sel → {k: (opcol, scalars dict)}."""
        if sel.size == 0:
            return {}
        import time as _time
        _t = _time.time()
        Bc = _pow2_at_least(sel.size, lo=64)
        sel_pad = np.zeros(Bc, np.int32)
        sel_pad[:sel.size] = sel
        jsel = self._put(sel_pad)
        jsel_dirs = jsel
        if pool.dplane is not None:
            # fused DP-lane bypass: dirs are indexed by compacted DP lane.
            # A candidate reaching the scan walk is gapped, hence DP'd
            # (bypassed ones were synthesized by the gapless fast path);
            # a -1 here would walk lane 0's garbage, which the
            # score_check safety net downstream rejects — log it loudly
            # so a device/host scoring divergence can't silently drop
            # alignments (mirrors the device-side n_dplmiss counter).
            n_miss = int((pool.dplane[sel] < 0).sum())
            if n_miss:
                sys.stderr.write(
                    f"warning: {n_miss} DP-bypassed candidates reached "
                    "the backtrace walk (gapless recompute mismatch); "
                    "their score_check will reject them\n")
                self.metrics.add(host_dplmiss=n_miss)
            jsel_dirs = self._put(
                np.clip(pool.dplane[sel_pad], 0, None).astype(np.int32))
        if getattr(pool, "diag", False):
            from bowtie2_tpu.ops.sw import backtrace_diag
            bt = backtrace_diag(
                pool.dirs, jsel,
                self._put(pool.rows_end[sel_pad].astype(np.int32)),
                self._put(pool.band_lanes[sel_pad].astype(np.int32)),
                jnp.take(pool.jreads, jsel, axis=0),
                jnp.take(pool.jquals, jsel, axis=0),
                jnp.take(pool.wins, jsel, axis=0),
                self.pol.sw_params(), pool.G)
        else:
            bt = backtrace(pool.dirs, jsel_dirs,
                           self._put(pool.rows_end[sel_pad].astype(np.int32)),
                           self._put(pool.lanes_end[sel_pad].astype(np.int32)),
                           jnp.take(pool.jreads, jsel, axis=0),
                           jnp.take(pool.jquals, jsel, axis=0),
                           jnp.take(pool.wins, jsel, axis=0),
                           self.pol.sw_params(), pool.G)
        sc_d = jnp.stack([getattr(bt, f) for f in BT_FIELDS])
        ops_host = np.asarray(bt.ops)            # (S, Bc)
        sc_host = np.asarray(sc_d)               # (7, Bc)
        out = {}
        for ci, k in enumerate(sel.tolist()):
            out[k] = (ops_host[:, ci],
                      {f: int(sc_host[fi, ci])
                       for fi, f in enumerate(BT_FIELDS)})
        self.metrics.add(t_backtrace=_time.time() - _t,
                         backtraces=int(sel.size))
        return out

    # ---------------- per-read candidate ranking ----------------
    def _rank_per_read(self, cs: CandSet) -> Dict[int, List[int]]:
        """read → candidate indices: deduped by (orient, end), sorted by
        (-score, canonical order)."""
        by_read: Dict[int, List[int]] = {}
        if not cs.n_cand:
            return by_read
        scores = cs.pool.scores
        for k in np.nonzero(cs.valid)[0]:
            by_read.setdefault(int(cs.cand_read[k]), []).append(int(k))
        out = {}
        for ri, ks in by_read.items():
            seen = {}
            for k in ks:
                kk = (int(cs.cand_or[k]), int(cs.end_pos[k]))
                if kk not in seen or scores[k] > scores[seen[kk]]:
                    seen[kk] = k
            out[ri] = sorted(seen.values(),
                             key=lambda k: (-scores[k], ks.index(k)))
        return out

    # ---------------- SAM record construction ----------------
    def _emit_aligned(self, rec: SeqRecord, L: int, orient: int,
                      read_codes, read_quals, pool: DPPool, k: int,
                      tb, best: int, sec: Optional[int], mapq: int,
                      yt: str, flag_extra: int = 0, rnext: str = "*",
                      pnext: int = 0, tlen: int = 0,
                      ys: Optional[int] = None) -> Optional[SamAlignment]:
        opcol, sc = tb
        if sc["score_check"] != int(pool.scores[k]):
            return None
        read_end = int(pool.rows_end[k]) + 1
        if "cigar_ops" in sc:      # host gapless fast path (_gapless_tb)
            cigar_ops, md = sc["cigar_ops"], sc["md"]
        elif sc["n_mm"] == 0 and sc["n_gc"] == 0 and sc["n_refn"] == 0:
            span = read_end - sc["read_start"]
            cigar_ops = []
            if sc["read_start"] > 0:
                cigar_ops.append(("S", sc["read_start"]))
            cigar_ops.append(("=" if self.pol.xeq else "M", span))
            if read_end < L:
                cigar_ops.append(("S", L - read_end))
            md = str(span)
        else:
            # ops occupy a prefix of the walk column: at most span + gap
            # chars entries (every op consumes a read or ref char)
            bound = (read_end - sc["read_start"]) + sc["n_gc"] + 1
            cigar_ops, md = cigar_md_from_packed(opcol[:bound],
                                                 sc["read_start"],
                                                 read_end, L,
                                                 read=read_codes,
                                                 xeq=self.pol.xeq)
        r_id = int(pool.rid[k])
        g_start = int(pool.win_start[k]) + sc["ref_start_win"]
        roff = g_start - int(self.data.ref_cum[r_id])
        flag = flag_extra | (FLAG_REVERSE if orient else 0)
        opts = [("AS", "i", best)]
        if sec is not None:
            opts.append(("XS", "i", sec))
        opts += [("XN", "i", sc["n_refn"]),
                 ("XM", "i", sc["n_mm"]),
                 ("XO", "i", sc["n_go"]),
                 ("XG", "i", sc["n_gc"]),
                 ("NM", "i", sc["n_mm"] + sc["n_gc"]),
                 ("MD", "Z", md)]
        # reference field order: MD precedes YS (sam.cpp printOptFlags)
        if ys is not None:
            opts.append(("YS", "i", ys))
        opts.append(("YT", "Z", yt))
        return SamAlignment(
            qname=rec.name, flag=flag, rname=self.data.ref_names[r_id],
            pos=roff + 1, mapq=mapq, cigar=cigar_string(cigar_ops),
            rnext=rnext, pnext=pnext, tlen=tlen,
            seq=decode_seq(read_codes.astype(np.uint8)).decode(),
            qual=qual_string(read_quals), opts=opts,
            raw_tags=getattr(rec, "tags", None))

    def _unaligned(self, rec: SeqRecord, yf: Optional[str] = None,
                   yt: str = "UU", flag_extra: int = 0, rname: str = "*",
                   pos: int = 0, rnext: str = "*",
                   pnext: int = 0) -> SamAlignment:
        opts = [("YT", "Z", yt)]
        if yf:
            opts.append(("YF", "Z", yf))
        return SamAlignment(
            qname=rec.name, flag=FLAG_UNMAPPED | flag_extra, rname=rname,
            pos=pos, mapq=0, cigar="*", rnext=rnext, pnext=pnext,
            seq=decode_seq(rec.seq.astype(np.uint8)).decode(),
            qual=qual_string(rec.qual), opts=opts,
            raw_tags=getattr(rec, "tags", None))

    def _oriented(self, cs: CandSet, ri: int, orient: int):
        L = int(cs.lens[ri])
        if orient == 0:
            return cs.fw[ri, :L], cs.qu[ri, :L]
        return cs.rc[ri, :L], cs.qu_r[ri, :L]

    def _mapq(self, best, sec, per, minsc, paired: bool = False) -> int:
        """Route MAPQ through the policy's --mapq-v version (V2 default;
        V3 = unique.h:96 bin-lookup, paired reads fixed at 44)."""
        if self.pol.mapq_v == 3:
            from bowtie2_tpu.pipeline.mapq import mapq_v3
            return mapq_v3(best, sec, per, minsc, paired)
        return mapq_v2(best, sec, per, minsc, self.pol.local)

    def _merge_stats(self, st: AlignStats) -> None:
        with self._stats_lock:
            self.stats.merge(st)
        self.metrics.add(reads=st.reads, unal=st.unal, al_one=st.al_one,
                         al_multi=st.al_multi)

    # ------------------------------------------------------------------
    def _seed_offsets(self, lens, ival_boost=None, smax_min: int = 1,
                      nrounds: int = 1, max_seeds: int = 64):
        """Instantiated seed offsets for both orientations (host numpy).

        fw seeds start at depth d from the 5' end; rc seeds are anchored
        from the 3' end (reference instantiateSeq windowGetDna fw=false,
        aligner_seed.cpp:488). Returns (offs_all, valid_all), each
        (2B, smax): rows < B fw, rows >= B rc. Reference: instantiateSeeds
        aligner_seed.cpp:498.
        """
        pol = self.pol
        B = lens.size
        slen = pol.seed_len
        # The reference runs up to -R seed rounds per mate
        # (bt2_search.cpp:3881), offsetting round r's seeds by
        # interval*r/nrounds, with per-round effort streaks deciding when
        # later rounds actually fire. Pooling all rounds' seeds into one
        # budget was measured to OVER-align vs the reference (the reference
        # gives up via its round-by-round streaks before consuming round-2
        # candidates on the golden corpora), so the default stays at one
        # round; nrounds>1 is available for sensitivity-oriented use.
        nrounds = max(nrounds, 1)
        ulen, inv = np.unique(lens, return_inverse=True)
        ival_u = np.array([pol.interval(int(l)) if l else 1
                           for l in ulen], np.int32)
        ivals = ival_u[inv]
        if ival_boost is not None:
            ivals = np.where(ival_boost,
                             (ivals * 1.2 + 0.5).astype(np.int32),
                             ivals)
            ivals = np.maximum(ivals, 1)

        base = (ivals[:, None] * np.arange(nrounds, dtype=np.int32)[None, :]
                ) // nrounds                             # (B, nrounds)
        per_round = np.arange(max_seeds, dtype=np.int32)  # seeds per round
        offs = (base[:, :, None] + per_round[None, None, :] * ivals[:, None, None])
        valid_off = offs + slen <= lens[:, None, None]
        valid_off &= (np.arange(nrounds, dtype=np.int32)[None, :, None]
                      < ivals[:, None, None])
        offs = offs.reshape(B, -1)
        valid_off = valid_off.reshape(B, -1)
        nkeep = int(valid_off.sum(axis=1).max()) if B else 1
        smax = max(nkeep, smax_min, 1)
        smax = 1 << int(np.ceil(np.log2(smax)))          # bucket for stability
        order = np.argsort(~valid_off, axis=1, kind="stable")[:, :smax]
        valid_off = np.take_along_axis(valid_off, order, axis=1)
        offs = np.where(valid_off,
                        np.take_along_axis(offs, order, axis=1), 0)

        offs_rc = np.where(valid_off, lens[:, None] - offs - slen, 0)
        offs_all = np.concatenate([offs, offs_rc], axis=0).astype(np.int32)
        valid_all = np.concatenate([valid_off, valid_off], axis=0)
        return offs_all, valid_all

    def _inst_counts(self, both, offs_all, valid_all):
        """# seeds per row surviving the N filter (reference
        instantiateSeeds skips seeds whose window contains N,
        aligner_seed.cpp:498). both: (2B, Lmax) codes."""
        slen = self.pol.seed_len
        B2, Lmax = both.shape
        cumn = np.zeros((B2, Lmax + 1), np.int32)
        cumn[:, 1:] = np.cumsum(both >= 4, axis=1)
        o = np.clip(offs_all, 0, max(Lmax - slen, 0))
        nwin = np.take_along_axis(cumn, o + slen, axis=1) \
            - np.take_along_axis(cumn, o, axis=1)
        return (valid_all & (nwin == 0)).sum(axis=1)

    def _seed_search(self, fw, rc, lens, ival_boost=None, nrounds: int = 1,
                     max_seeds: int = 64):
        """Search instantiated seeds for both orientations (device).

        Seed windows are extracted ON DEVICE (reads are device-resident
        anyway); windows containing N die inside the search kernel, so no
        host-side N filter is needed. Reference: searchAllSeeds.
        """
        pol = self.pol
        B, Lmax = fw.shape
        slen = pol.seed_len
        offs_all, valid_all = self._seed_offsets(lens, ival_boost,
                                                 nrounds=nrounds,
                                                 max_seeds=max_seeds)
        smax = offs_all.shape[1]
        both = np.concatenate([fw, rc], axis=0).astype(np.int32)
        top, bot = fm.seed_search_offsets(
            self.idx.fw, self._put(both), self._put(offs_all),
            self._put(valid_all), slen,
            ftab_chars=self.data.fw.ftab_chars)
        orient = np.repeat(np.array([0, 1]), B)[:, None] * np.ones((1, smax), np.int32)
        mlen = np.full_like(offs_all, slen)
        return (orient.astype(np.int32), offs_all, mlen,
                jnp.stack([top, bot]), (2 * B * smax, 2 * B, smax),
                self._inst_counts(both, offs_all, valid_all))

    def _half_search(self, both, both_lens, jboth=None):
        """Pigeonhole half-read exact search (replaces the reference's
        up-front 1-mismatch search, SeedAligner::oneMmSearch
        aligner_seed.cpp:975): an end-to-end alignment with <= 1 edit has
        one exact half, so both halves' exact SA ranges are a complete
        candidate source for it. both: (2B, Lmax) fw+rc reads.
        """
        B2, Lmax = both.shape
        mid = both_lens // 2
        Hmax = Lmax // 2 + 1
        h1 = both[:, :Hmax].astype(np.int32)
        idx = np.minimum(mid[:, None] + np.arange(Hmax, dtype=np.int32)[None, :],
                         Lmax - 1)
        h2 = both[np.arange(B2)[:, None], idx].astype(np.int32)
        seqs = np.concatenate([h1, h2], axis=0)
        hlens = np.concatenate([mid, both_lens - mid]).astype(np.int32)
        top, bot = fm.substring_search(self.idx.fw, self._put(seqs),
                                       self._put(hlens))
        off = np.stack([np.zeros(B2, np.int32), mid], axis=1)
        mlen = np.stack([mid, both_lens - mid], axis=1)
        return off, mlen, jnp.stack([top, bot])

    def _seed_half_search(self, fw, rc, seed_off, seed_or):
        """-N 1 support: exact search of both halves of every instantiated
        seed; hit ranges become ordinary extension candidates."""
        pol = self.pol
        B, Lmax = fw.shape
        slen = pol.seed_len
        hlen = slen // 2
        smax = seed_off.shape[1]
        both = np.concatenate([fw, rc], axis=0).astype(np.int32)
        # offsets of both halves of every seed window
        offs = np.concatenate([seed_off, seed_off + hlen], axis=1)
        offs = np.clip(offs, 0, Lmax - 1).astype(np.int32)
        valid = np.concatenate(
            [seed_off + slen <= np.full_like(seed_off, Lmax)] * 2, axis=1)
        top, bot = fm.seed_search_offsets(
            self.idx.fw, self._put(both), self._put(offs),
            self._put(valid), hlen,
            ftab_chars=min(self.data.fw.ftab_chars, hlen))
        mlen = np.full_like(offs, hlen)
        return offs.astype(np.int64), mlen.astype(np.int64), \
            jnp.stack([top, bot])

    def _assemble_candidates(self, B, lens, filtered, sw_top, sw_bot,
                             sw_ned, seed_off, seed_top, seed_bot, seed_mlen,
                             seed_half):
        """Vectorized canonical-order candidate assembly (same output as
        _assemble_candidates_ref, which documents the semantics)."""
        T = self.NC_PER_READ
        M2 = seed_off.shape[1]
        live_read = ~filtered & (lens > 0)

        # ---- exact end-to-end hits (phase 1), fw then rc ----
        ex_w = np.where((sw_ned == 0) & (sw_bot > sw_top),
                        sw_bot - sw_top, 0)              # (2B,)
        ex_w = np.minimum(ex_w, self.MAX_EXACT_ROWS)
        ex_w[:B][~live_read] = 0
        ex_w[B:][~live_read] = 0
        t_fw = np.minimum(ex_w[:B], T)
        t_rc = np.minimum(ex_w[B:], T - t_fw)
        rem = T - t_fw - t_rc                            # (B,)

        # ---- seed/half ranges: sort by width ascending per read ----
        w = np.concatenate([seed_bot[:B] - seed_top[:B],
                            seed_bot[B:] - seed_top[B:]], axis=1)  # (B, 2*M2)
        w = np.maximum(w, 0)
        w[~live_read] = 0
        tops = np.concatenate([seed_top[:B], seed_top[B:]], axis=1)
        offs = np.concatenate([seed_off[:B], seed_off[B:]], axis=1)
        mlens = np.concatenate([seed_mlen[:B], seed_mlen[B:]], axis=1)
        halfs = np.concatenate([seed_half[:B], seed_half[B:]], axis=1)
        oris = np.concatenate([np.zeros((B, M2), np.int64),
                               np.ones((B, M2), np.int64)], axis=1)
        dead = w == 0
        order = np.argsort(np.where(dead, 1 << 30, w), axis=1, kind="stable")
        w = np.take_along_axis(w, order, axis=1)
        tops = np.take_along_axis(tops, order, axis=1)
        offs = np.take_along_axis(offs, order, axis=1)
        mlens = np.take_along_axis(mlens, order, axis=1)
        halfs = np.take_along_axis(halfs, order, axis=1)
        oris = np.take_along_axis(oris, order, axis=1)

        # depth-major round-robin allocation: find the deepest full round D
        # with sum_j min(w_j, D) <= rem, then hand the leftover to the
        # narrowest still-live ranges in order
        ds = np.arange(T + 1, dtype=np.int64)            # budget <= T
        f = np.minimum(w[:, :, None], ds[None, None, :]).sum(axis=1)  # (B,T+1)
        Dstar = np.maximum((f <= rem[:, None]).sum(axis=1) - 1, 0)
        used = np.take_along_axis(f, Dstar[:, None], axis=1)[:, 0]
        extra_budget = rem - used
        alive = w > Dstar[:, None]
        extra = alive & (np.cumsum(alive, axis=1) <= extra_budget[:, None])
        n = np.minimum(w, Dstar[:, None]) + extra        # (B, 2*M2)

        # ---- emit: exacts (fw then rc), then (depth, range) order ----
        parts = []
        for oi, t_or in ((0, t_fw), (1, t_rc)):
            tot = int(t_or.sum())
            if tot:
                r_ids = np.repeat(np.arange(B), t_or)
                d = np.arange(tot) - np.repeat(np.cumsum(t_or) - t_or, t_or)
                ex_full = (sw_bot[oi * B:oi * B + B]
                           - sw_top[oi * B:oi * B + B])[r_ids]
                parts.append((r_ids, np.full(tot, oi, np.int64),
                              np.zeros(tot, np.int64),
                              (sw_top[oi * B:oi * B + B][r_ids] + d).astype(np.int32),
                              np.ones(tot, bool),
                              lens[r_ids].astype(np.int64),
                              np.zeros(tot, bool),
                              np.full(tot, -2 + oi, np.int64),  # phase key
                              d,
                              np.full(tot, -2 + oi, np.int64),  # range id
                              ex_full.astype(np.int64)))        # range width
        nf = n.reshape(-1)
        tot = int(nf.sum())
        if tot:
            flat_read = np.repeat(np.arange(B * 2 * M2) // (2 * M2), nf)
            flat_j = np.repeat(np.arange(B * 2 * M2) % (2 * M2), nf)
            d = np.arange(tot) - np.repeat(np.cumsum(nf) - nf, nf)
            parts.append((flat_read,
                          oris[flat_read, flat_j],
                          offs[flat_read, flat_j].astype(np.int64),
                          (tops[flat_read, flat_j] + d).astype(np.int32),
                          np.zeros(tot, bool),
                          mlens[flat_read, flat_j].astype(np.int64),
                          halfs[flat_read, flat_j],
                          d,                              # phase key: depth
                          flat_j,
                          flat_j.astype(np.int64),        # range id
                          w[flat_read, flat_j].astype(np.int64)))
        if not parts:
            z = np.zeros(0, np.int64)
            return (z, z.copy(), z.copy(), np.zeros(0, np.int32),
                    np.zeros(0, bool), z.copy(), np.zeros(0, bool),
                    z.copy(), z.copy())
        cat = [np.concatenate([p[i] for p in parts]) for i in range(11)]
        key_order = np.lexsort((cat[8], cat[7], cat[0]))
        return (cat[0][key_order], cat[1][key_order].astype(np.int64),
                cat[2][key_order], cat[3][key_order],
                cat[4][key_order], cat[5][key_order], cat[6][key_order],
                cat[9][key_order], cat[10][key_order])

    def _assemble_candidates_ref(self, B, lens, filtered, sw_top, sw_bot, sw_ned,
                             seed_off, seed_top, seed_bot, seed_mlen,
                             seed_half):
        """Canonical-order candidate list under a per-read budget.

        Exact end-to-end hits first (phase 1), then seed-hit SA ranges by
        ascending width (reference prioritizeSATups), rows round-robin
        across ranges so wide ranges don't starve narrow ones.
        Range-array rows k < B are fw, k >= B are rc.
        """
        widths = seed_bot - seed_top                 # (2B, smax+2)
        cand = ([], [], [], [], [], [], [])          # read,or,off,row,exact,mlen,half
        for i in range(B):
            if filtered[i]:
                continue
            budget = self.NC_PER_READ
            for oi in (0, 1):
                k = oi * B + i
                if sw_ned[k] == 0 and sw_bot[k] > sw_top[k]:
                    take = min(int(sw_bot[k] - sw_top[k]),
                               self.MAX_EXACT_ROWS, budget)
                    for r in range(take):
                        for lst, v in zip(cand, (i, oi, 0, int(sw_top[k]) + r,
                                                 True, int(lens[i]), False)):
                            lst.append(v)
                    budget -= take
            rows_i = np.array([i, B + i])
            w_i = widths[rows_i]                      # (2, smax+2)
            nz = np.nonzero(w_i > 0)
            if nz[0].size == 0 or budget <= 0:
                continue
            order = np.argsort(w_i[nz], kind="stable")
            ors = nz[0][order]                        # 0=fw, 1=rc
            js = nz[1][order]
            tops = seed_top[rows_i[ors], js]
            ws = w_i[nz][order]
            offs = seed_off[rows_i[ors], js]
            mlens = seed_mlen[rows_i[ors], js]
            halfs = seed_half[rows_i[ors], js]
            depth = 0
            while budget > 0:
                live = depth < ws
                if not live.any():
                    break
                for t in np.nonzero(live)[0]:
                    if budget <= 0:
                        break
                    for lst, v in zip(cand, (i, int(ors[t]), int(offs[t]),
                                             int(tops[t]) + depth, False,
                                             int(mlens[t]), bool(halfs[t]))):
                        lst.append(v)
                    budget -= 1
                depth += 1
        return (np.array(cand[0], dtype=np.int64),
                np.array(cand[1], dtype=np.int64),
                np.array(cand[2], dtype=np.int64),
                np.array(cand[3], dtype=np.int32),
                np.array(cand[4], dtype=bool),
                np.array(cand[5], dtype=np.int64),
                np.array(cand[6], dtype=bool))


@dataclass
class FusedBatch:
    """In-flight fused-pipeline batch: device handle + host-side context.

    submit() dispatches the whole device program and returns immediately
    (JAX async dispatch); collect() blocks on the single result transfer.
    Keeping several FusedBatches in flight overlaps host parse/emit with
    device compute (the reference's readahead thread + worker threads,
    pat.h:1287, become pipeline stages here)."""
    records: Sequence[SeqRecord]
    B: int
    Bp: int
    Lmax: int
    S: int
    kk: int
    kk_bt: int
    lens: np.ndarray
    fw: np.ndarray
    qu: np.ndarray
    rc: np.ndarray
    qu_r: np.ndarray
    minsc: np.ndarray
    perfect: np.ndarray
    filtered: np.ndarray
    yf: np.ndarray               # (Bp,) int8 filter-reason codes (YF_*)
    blob: object                 # device (S*Bc + 4*meta,) uint8


class UnpairedAligner(BatchAligner):
    """Aligns batches of unpaired reads against a loaded index.

    Default path: the fused single-dispatch device pipeline (ops/fused.py).
    `_align_batch_host` is the round-1 phase-by-phase path, kept as the
    fallback for DP-budget overflow and as a differential oracle."""

    def _ee_replay_overrides(self, fb: "FusedBatch", meta: np.ndarray):
        """RNG-parity selection for exact-multimap reads (fused path).

        Reads with >= 2 exact end-to-end hits have their reported
        position(s) chosen by the reference's per-read LCG (see
        pipeline/replay.py — trajectory validated exact against the
        binary). Returns {read_idx: ([(rid, roff, orient), ...] one per
        emitted rank, maxed, n_alns)}; everything else keeps the
        canonical deterministic choice."""
        if self.pol.local:
            return {}
        from bowtie2_tpu.ops.fused import CHOSEN_FIELDS
        kk, kk_bt, Bp, B = fb.kk, fb.kk_bt, fb.Bp, fb.B
        Bc = Bp * kk_bt
        base = 2 * kk * Bp + CHOSEN_FIELDS * Bc + 1
        ee = meta[base:base + 6 * Bp].reshape(6, Bp)
        top_fw = ee[0].astype(np.uint32).astype(np.int64) | \
            (ee[1].astype(np.int64) << 32)
        top_rc = ee[3].astype(np.uint32).astype(np.int64) | \
            (ee[4].astype(np.int64) << 32)
        return self._replay_from_ranges(
            fb.records, fb.lens, fb.filtered, B,
            top_fw, ee[2], top_rc, ee[5])

    def _mm1_replay_overrides(self, fb: "FusedBatch", meta: np.ndarray,
                              ch):
        """Fused-path wrapper for the 1-mismatch maxed-multimap replay."""
        pol = self.pol
        if pol.local or pol.all_hits:
            return {}
        from bowtie2_tpu.ops.fused import CHOSEN_FIELDS
        (ch_ok, ch_or, ch_rid, ch_roff, ch_rdstart, ch_rdend, ch_nmm,
         ch_ngo, ch_ngc, ch_nrefn, ch_sccheck, ch_score) = ch
        kk, kk_bt, Bp, B = fb.kk, fb.kk_bt, fb.Bp, fb.B
        Bc = Bp * kk_bt
        base = 2 * kk * Bp + CHOSEN_FIELDS * Bc + 1
        ee = meta[base:base + 6 * Bp].reshape(6, Bp)
        ee_tot = ee[2].astype(np.int64) + ee[5]
        lens = fb.lens
        cand = (ee_tot == 0) & ~fb.filtered & (np.arange(Bp) < B)
        cand &= (ch_ok[:Bp] != 0) & (ch_nmm[:Bp] == 1) & \
            (ch_ngc[:Bp] == 0) & (ch_nrefn[:Bp] == 0) & \
            (ch_rdstart[:Bp] == 0) & (ch_rdend[:Bp] == lens)
        entries = [(int(ri), int(ch_rid[ri]), int(ch_roff[ri]),
                    int(ch_or[ri]), int(ch_score[ri]))
                   for ri in np.nonzero(cand)[0]]
        return self._mm1_replay_core(entries, fb)

    # Gate for the 1mm replay below: the EE-layer trajectory model does
    # NOT validate against the oracle for this class (tandem-corpus fit
    # search found no consistent draw count — the reference's 1mm-phase
    # trajectory has structure the current model misses). Keep the
    # machinery but disabled until a fitting session nails it; canonical
    # selection is no worse for parity than a wrong deterministic model.
    MM1_REPLAY_ENABLED = False

    def _mm1_replay_core(self, entries, batch):
        """RNG-parity selection for 1-mismatch MAXED multimap reads.

        Reads with NO exact hits whose best alignment is a pure
        full-length 1-mismatch hit and whose corrected-read SA range hits
        the -M cap stop INSIDE the reference's 1mm phase — a
        deterministic trajectory: no EE order draw (tot==0), sort1mmEe
        with one entry draws nothing, then Random1toN row resolution
        (seen-list mode for wide ranges) + the selection shuffle. The
        corrected pattern (= the reported alignment's reference window)
        is recovered host-side and exact-searched to obtain the
        reference's own SA range and row order.

        entries: [(ri, rid0, roff0, orient, score)]; batch provides
        .records/.lens/.fw/.rc/.Lmax. Returns the overrides dict
        {ri: (recs, maxed, cnt, template)}."""
        pol = self.pol
        if not entries or not self.MM1_REPLAY_ENABLED:
            return {}
        cap = pol.khits if pol.mhits == 0 else pol.mhits + 1
        lens = batch.lens
        Lmax = batch.Lmax
        rw = self.data.ref_words
        rn = self.data.refn_words
        pats = np.full((len(entries), Lmax), 4, np.int32)
        keep = np.ones(len(entries), bool)
        plens = np.zeros(len(entries), np.int32)
        for t, (ri, rid0, roff0, ori, _sc) in enumerate(entries):
            L = int(lens[ri])
            g0 = int(self.data.ref_cum[rid0]) + roff0
            gp = np.arange(g0, g0 + L)
            codes = (rw[gp >> 4] >> (2 * (gp & 15))) & 3
            if ((rn[gp >> 5] >> (gp & 31)) & 1).any():
                keep[t] = False
                continue
            pats[t, :L] = codes
            plens[t] = L
        if not keep.any():
            return {}
        jsw = fm.exact_sweep(self.idx.fw,
                             self._put(np.ascontiguousarray(pats)),
                             self._put(plens))
        top = np.asarray(jsw.top).astype(np.int64)
        bot = np.asarray(jsw.bot).astype(np.int64)
        ned = np.asarray(jsw.nedit)
        w = np.where(ned == 0, bot - top, 0)
        from bowtie2_tpu.pipeline.replay import EE_MAXELT, replay_ee_read
        from bowtie2_tpu.pipeline.rng import gen_rand_seed
        keep &= (w >= cap) & (w <= EE_MAXELT)
        if not keep.any():
            return {}
        rows = []
        spans = []
        kidx = np.nonzero(keep)[0]
        for t in kidx:
            spans.append(len(rows))
            rows.extend(range(int(top[t]), int(top[t] + w[t])))
        NR = _pow2_at_least(len(rows), lo=64)
        rows_pad = np.zeros(NR, dtype=self._row_dtype)
        rows_pad[:len(rows)] = rows
        jpos = np.asarray(fm.sa_resolve(
            self.idx.fw, self._put(rows_pad),
            period=1 << self.data.off_rate))[:len(rows)].astype(np.int64)
        seg = np.searchsorted(self.data.seg_joined_start, jpos,
                              side="right") - 1
        gpos = (self.data.seg_global_start[seg]
                + (jpos - self.data.seg_joined_start[seg]))
        rid_all = np.searchsorted(self.data.ref_cum, gpos,
                                  side="right") - 1
        roff_all = gpos - self.data.ref_cum[rid_all]
        overrides = {}
        for s0, t in zip(spans, kidx):
            ri, rid0, roff0, ori, score = entries[t]
            wt = int(w[t])
            L = int(lens[ri])
            ok = jpos[s0:s0 + wt] + L <= \
                self._seg_end_joined[seg[s0:s0 + wt]]
            rec = batch.records[ri]
            if pol.non_deterministic:
                import random as _random
                seed = _random.getrandbits(32)
            else:
                from bowtie2_tpu.pipeline.rng import rng_name
                seed = gen_rand_seed(rec.seq, rec.qual + 33, rng_name(rec),
                                     seed=pol.rng_seed)
            res = replay_ee_read(int(seed), wt if ori == 0 else 0,
                                 0 if ori == 0 else wt,
                                 ok if ori == 0 else ok[:0],
                                 ok[:0] if ori == 0 else ok,
                                 pol.khits, pol.mhits, pol.all_hits,
                                 order_draw=False)
            if res is None:
                continue
            acc, perm, maxed = res
            if not maxed and pol.mhits > 0:
                continue       # phase did not terminate the read
            oriented = batch.fw[ri, :L] if ori == 0 else batch.rc[ri, :L]
            mmp = np.nonzero(pats[t, :L] != oriented)[0]
            if mmp.size != 1:
                continue       # not a clean single-substitution template
            mp = int(mmp[0])
            refb = "ACGT"[int(pats[t, mp])]
            md = f"{mp}{refb}{L - 1 - mp}"
            if pol.xeq:
                cig = (f"{mp}=" if mp else "") + "1X" + \
                    (f"{L - 1 - mp}=" if mp < L - 1 else "")
            else:
                cig = f"{L}M"
            template = dict(as_=score, xm=1, md=md, cigar=cig)
            recs = []
            for j in perm:
                _o, elt = acc[j]
                k = s0 + elt
                recs.append((int(rid_all[k]), int(roff_all[k]), ori))
            overrides[ri] = (recs, maxed, len(acc), template)
        return overrides

    def _replay_from_ranges(self, records, lens, filtered, B,
                            top_fw, w_fw, top_rc, w_rc):
        """Shared replay core over exact-sweep ranges (fused + host)."""
        pol = self.pol
        from bowtie2_tpu.pipeline.replay import EE_MAXELT, replay_ee_read
        from bowtie2_tpu.pipeline.rng import gen_rand_seed
        tot = w_fw.astype(np.int64) + w_rc
        app = (tot >= 2) & (tot <= EE_MAXELT) & ~filtered[:len(tot)] & \
            (np.arange(len(tot)) < B)
        idxs = np.nonzero(app)[0]
        if idxs.size == 0:
            return {}
        rows = []
        spans = []
        for ri in idxs:
            spans.append(len(rows))
            rows.extend(range(int(top_fw[ri]), int(top_fw[ri] + w_fw[ri])))
            rows.extend(range(int(top_rc[ri]), int(top_rc[ri] + w_rc[ri])))
        NR = _pow2_at_least(len(rows), lo=64)
        rows_pad = np.zeros(NR, dtype=self._row_dtype)
        rows_pad[:len(rows)] = rows
        jpos = np.asarray(fm.sa_resolve(
            self.idx.fw, self._put(rows_pad),
            period=1 << self.data.off_rate))[:len(rows)].astype(np.int64)
        seg = np.searchsorted(self.data.seg_joined_start, jpos,
                              side="right") - 1
        gpos = (self.data.seg_global_start[seg]
                + (jpos - self.data.seg_joined_start[seg]))
        rid_all = np.searchsorted(self.data.ref_cum, gpos,
                                  side="right") - 1
        roff_all = gpos - self.data.ref_cum[rid_all]
        overrides = {}
        for t, ri in enumerate(idxs):
            s0 = spans[t]
            wf, wr = int(w_fw[ri]), int(w_rc[ri])
            L = int(lens[ri])
            ok = jpos[s0:s0 + wf + wr] + L <= \
                self._seg_end_joined[seg[s0:s0 + wf + wr]]
            rec = records[ri]
            if pol.non_deterministic:
                import random as _random
                seed = _random.getrandbits(32)
            else:
                from bowtie2_tpu.pipeline.rng import rng_name
                seed = gen_rand_seed(rec.seq, rec.qual + 33, rng_name(rec),
                                     seed=pol.rng_seed)
            res = replay_ee_read(int(seed), wf, wr, ok[:wf], ok[wf:],
                                 pol.khits, pol.mhits, pol.all_hits)
            if res is None:
                continue
            acc, perm, maxed = res
            recs = []
            for j in perm:
                ori, elt = acc[j]
                k = s0 + (elt if ori == 0 else wf + elt)
                recs.append((int(rid_all[k]), int(roff_all[k]), ori))
            overrides[int(ri)] = (recs, maxed, len(acc), None)
        return overrides

    def submit(self, records: Sequence[SeqRecord]) -> Optional[FusedBatch]:
        """Dispatch the fused device program for one batch (non-blocking)."""
        if not records:
            return None
        if max(int(r.seq.size) for r in records) > LEN_BUCKETS[-1]:
            return ("long", records)   # long reads: diag-kernel host path
        from bowtie2_tpu.ops.fused import fused_se
        from bowtie2_tpu.ops.sw import bt_steps
        import time as _time
        _t = _time.time()
        pol = self.pol
        B = len(records)
        Bp = _round_batch(B, lo=256)
        fw, qu, rc, qu_r, lens = pad_reads(
            records, _bucket(max(max(int(r.seq.size) for r in records), 1)))
        Lmax = fw.shape[1]
        if Bp != B:
            pad = ((0, Bp - B), (0, 0))
            fw = np.pad(fw, pad, constant_values=4)
            qu = np.pad(qu, pad)
            rc = np.pad(rc, pad, constant_values=4)
            qu_r = np.pad(qu_r, pad)
            lens = np.pad(lens, (0, Bp - B))

        ulen, inv = np.unique(lens, return_inverse=True)
        minsc = np.array([pol.min_score(int(l)) if l else 0
                          for l in ulen], np.int64)[inv]
        perfect = np.array([pol.perfect_score(int(l)) if pol.local else 0
                            for l in ulen], np.int64)[inv]
        nceil = np.array([pol.nceil(int(l)) if l else 0
                          for l in ulen], np.int32)[inv]
        n_count = (fw >= 4).sum(axis=1) - (Lmax - lens)
        filtered, yf = self._filters(records, lens, n_count, nceil, minsc)
        live = ~filtered & (lens > 0)

        offs_all, valid_all = self._seed_offsets(lens)

        khits = 10**9 if pol.all_hits else pol.khits
        T = self.NC_PER_READ
        kk = min(max(khits, 1) + 1, T)
        kk_bt = min(max(khits, 1), T)
        G = pol.band_halfwidth(Lmax)
        NC = 2 * Bp
        W = Lmax + 2 * G + 1

        both = np.concatenate([fw, rc], axis=0)
        jboth = self._put(both).astype(jnp.int32)
        jquals = self._put(np.concatenate([qu, qu_r], axis=0)).astype(jnp.int32)
        live_or = self._live_orient(Bp, paired=False)
        statics = dict(
            params=pol.sw_params(), band=G, seed_len=pol.seed_len,
            ftab_chars=self.data.fw.ftab_chars,
            half_ftab=min(self.data.fw.ftab_chars, pol.seed_len // 2),
            period=1 << self.data.off_rate, T=T, kk=kk, kk_bt=kk_bt,
            NC=NC, n1=pol.seed_mms >= 1, no_1mm=getattr(pol, "no_1mm", False),
            no_exact=getattr(pol, "no_exact", False),
            NCDP=max(Bp, 512))
        if self.shard_mesh is not None:
            key = tuple(sorted(statics.items()))
            if key not in self._shard_fns:
                from bowtie2_tpu.dist.sharded import make_fused_se_sharded
                self._shard_fns[key] = make_fused_se_sharded(
                    self.shard_mesh,
                    large=self.sidx.fw.occ_cp64 is not None, **statics)
            res = self._shard_fns[key](
                self.sidx, self.seg, jboth, jquals, self._put(lens),
                self._put(offs_all), self._put(valid_all),
                self._put(minsc.astype(np.int32)), self._put(live),
                None if live_or is None else self._put(live_or))
        else:
            res = fused_se(
                self.idx.fw, self.idx.ref_words, self.idx.refn_words,
                self.seg, jboth, jquals, self._put(lens),
                self._put(offs_all), self._put(valid_all),
                self._put(minsc.astype(np.int32)), self._put(live),
                None if live_or is None else self._put(live_or),
                **statics)
        self.metrics.add(
            t_search=_time.time() - _t, bases=int(lens[:B].sum()),
            unpaired=B, unf_reads=int((~filtered[:B]).sum()),
            unf_bases=int(lens[:B][~filtered[:B]].sum()),
            ex_attempts=int(live.sum()), seed_searches=int(live.sum()),
            dp_problems=NC, dp_cells=NC * Lmax * W, backtraces=Bp * kk_bt)
        return FusedBatch(records=records, B=B, Bp=Bp, Lmax=Lmax,
                          S=bt_steps(Lmax, W, pol.local), kk=kk, kk_bt=kk_bt,
                          lens=lens, fw=fw, qu=qu, rc=rc, qu_r=qu_r,
                          minsc=minsc, perfect=perfect, filtered=filtered,
                          yf=yf, blob=res.blob)

    def collect(self, fb: Optional[FusedBatch]) -> List[SamAlignment]:
        """Block on a submitted batch's single transfer and emit SAM."""
        if fb is None:
            return []
        if isinstance(fb, tuple) and fb[0] == "long":
            return self._align_batch_host(fb[1])
        from bowtie2_tpu.ops.fused import CHOSEN_FIELDS
        import time as _time
        _t = _time.time()
        pol = self.pol
        B, Bp, kk, kk_bt, S = fb.B, fb.Bp, fb.kk, fb.kk_bt, fb.S
        Bc = Bp * kk_bt
        blob = np.asarray(fb.blob)
        self.metrics.add(t_dp=_time.time() - _t)
        _t = _time.time()
        ops = blob[:S * Bc].reshape(S, Bc)
        meta = blob[S * Bc:].view(np.int32)
        r_score = meta[:kk * Bp].reshape(kk, Bp)
        r_valid = meta[kk * Bp:2 * kk * Bp].reshape(kk, Bp) != 0
        ch = meta[2 * kk * Bp:2 * kk * Bp + CHOSEN_FIELDS * Bc]\
            .reshape(CHOSEN_FIELDS, Bc)
        (ch_ok, ch_or, ch_rid, ch_roff, ch_rdstart, ch_rdend, ch_nmm,
         ch_ngo, ch_ngc, ch_nrefn, ch_sccheck, ch_score) = ch
        ovr = self._ee_replay_overrides(fb, meta)
        n_dropped = int(meta[2 * kk * Bp + CHOSEN_FIELDS * Bc])
        if n_dropped == 0:
            ovr.update(self._mm1_replay_overrides(fb, meta, ch))
        if n_dropped > 0:
            # DP budget overflow: rerun this batch on the uncapped
            # phase-by-phase path (rare; keeps output identical)
            sys.stderr.write(
                f"fused DP budget exceeded by {n_dropped}; falling back\n")
            return self._align_batch_host(fb.records)

        khits = 10**9 if pol.all_hits else pol.khits
        st = AlignStats()
        out: List[SamAlignment] = []
        n_rank = r_valid.sum(axis=0)
        from bowtie2_tpu.pipeline.traj_replay import traj_overrides
        from bowtie2_tpu.ops.fused import CHOSEN_FIELDS as _CF_T
        _base_t = 2 * kk * Bp + _CF_T * Bc + 1
        _ee_t = meta[_base_t:_base_t + 8 * Bp].reshape(8, Bp)
        tovr = traj_overrides(self, fb, n_rank, ovr,
                              rep_ctx=_ee_t[6] > _ee_t[7])

        # ---- batched CIGAR/MD decode (native C; numpy fallback) ----
        n_rep = np.minimum(np.minimum(n_rank, khits), kk_bt)
        emit2 = (ch_ok.reshape(kk_bt, Bp).astype(bool)
                 & (np.arange(kk_bt)[:, None] < n_rep[None, :])
                 & (~fb.filtered & (np.arange(Bp) < B))[None, :]
                 & (ch_sccheck == ch_score).reshape(kk_bt, Bp))
        cis = np.nonzero(emit2.reshape(-1))[0].astype(np.int32)
        ri_arr = cis % Bp
        L_arr = fb.lens[ri_arr]
        codes_n = np.where((ch_or[cis] == 0)[:, None],
                           fb.fw[ri_arr], fb.rc[ri_arr])
        bound_n = (ch_rdend[cis] - ch_rdstart[cis]) + ch_ngc[cis] + 1
        decoded = np.full(Bc, -1, np.int32)
        decoded[cis] = np.arange(cis.size, dtype=np.int32)
        try:
            from bowtie2_tpu.native.samemit import cigar_md_batch
            cigars, mds = cigar_md_batch(
                ops, cis, ch_rdstart[cis], ch_rdend[cis], L_arr,
                bound_n, codes_n, xeq=pol.xeq)
        except Exception:
            cigars, mds = [], []
            for t, ci in enumerate(cis.tolist()):
                co, md = cigar_md_from_packed(
                    ops[:bound_n[t], ci], int(ch_rdstart[ci]),
                    int(ch_rdend[ci]), int(L_arr[t]),
                    read=codes_n[t, :L_arr[t]], xeq=pol.xeq)
                cigars.append(cigar_string(co))
                mds.append(md)
        for ri in range(B):
            rec = fb.records[ri]
            st.reads += 1
            L = int(fb.lens[ri])
            if fb.filtered[ri]:
                st.filtered += 1
                st.unal += 1
                out.append(self._unaligned(rec, self.YF_STR[int(fb.yf[ri])]))
                continue
            if ri in ovr:
                recs_o, _maxed_o, _cnt_o, _tp_o = ovr[ri]
                out.extend(self._synth_replay_group(
                    rec, recs_o, _cnt_o, L, int(fb.minsc[ri]),
                    lambda o, _ri=ri, _L=L: (fb.fw[_ri, :_L], fb.qu[_ri, :_L])
                    if o == 0 else (fb.rc[_ri, :_L], fb.qu_r[_ri, :_L]),
                    template=_tp_o))
                st.al_multi += 1
                continue
            if ri in tovr:
                t_recs, t_nalns = tovr[ri]
                out.extend(t_recs)
                if t_nalns == 0:
                    st.unal += 1
                elif t_nalns > 1:
                    st.al_multi += 1
                else:
                    st.al_one += 1
                continue
            nr = int(n_rank[ri])
            if nr == 0:
                st.unal += 1
                out.append(self._unaligned(rec))
                continue
            n_report = min(nr, khits, kk_bt)
            n_emitted = 0
            for j in range(n_report):
                ci = j * Bp + ri
                if not ch_ok[ci]:
                    break
                best = int(ch_score[ci])
                if khits > 1:
                    # -k/-a mode (unique.h:202): secondary records get 255;
                    # the primary gets a real MAPQ when a second-best EXISTS
                    # (without one the search "didn't really look"), and
                    # every record carries XS when there is a second-best
                    sec = int(r_score[1, ri]) if nr > 1 else None
                    if j == 0 and sec is not None:
                        per = int(fb.perfect[ri]) if pol.local else 0
                        mq = self._mapq(best, sec, per, int(fb.minsc[ri]))
                    else:
                        mq = 255
                else:
                    sec = int(r_score[1, ri]) if r_valid[1, ri] else None
                    per = int(fb.perfect[ri]) if pol.local else 0
                    mq = self._mapq(best, sec, per, int(fb.minsc[ri]))
                di = decoded[ci]
                if di < 0:
                    continue   # backtrace inconsistency: skip (safety net)
                orient = int(ch_or[ci])
                if orient == 0:
                    codes, quals = fb.fw[ri, :L], fb.qu[ri, :L]
                else:
                    codes, quals = fb.rc[ri, :L], fb.qu_r[ri, :L]
                flag = (FLAG_REVERSE if orient else 0) \
                    | (0x100 if n_emitted > 0 else 0)
                opts = [("AS", "i", best)]
                if sec is not None:
                    opts.append(("XS", "i", sec))
                opts += [("XN", "i", int(ch_nrefn[ci])),
                         ("XM", "i", int(ch_nmm[ci])),
                         ("XO", "i", int(ch_ngo[ci])),
                         ("XG", "i", int(ch_ngc[ci])),
                         ("NM", "i", int(ch_nmm[ci] + ch_ngc[ci])),
                         ("MD", "Z", mds[di]), ("YT", "Z", "UU")]
                out.append(SamAlignment(
                    qname=rec.name, flag=flag,
                    rname=self.data.ref_names[int(ch_rid[ci])],
                    pos=int(ch_roff[ci]) + 1, mapq=mq,
                    cigar=cigars[di],
                    seq=decode_seq(codes.astype(np.uint8)).decode(),
                    qual=qual_string(quals), opts=opts))
                n_emitted += 1
            if n_emitted == 0:
                st.unal += 1
                out.append(self._unaligned(rec))
            elif nr > 1:
                st.al_multi += 1
            else:
                st.al_one += 1
        self._merge_stats(st)
        self.metrics.add(t_host=_time.time() - _t)
        return out

    def align_batch(self, records: Sequence[SeqRecord]) -> List[SamAlignment]:
        return self.collect(self.submit(records))

    def collect_raw(self, fb: Optional[FusedBatch], suffix: bytes = b""
                    ) -> List[List[Tuple[int, bytes]]]:
        """collect(), but emit finished SAM line bytes via the native line
        builder instead of SamAlignment objects: one group per read, each
        entry (flag, line). ~10x less host Python per record; the CLI's
        default unpaired path. `suffix` is appended to every line (RG)."""
        if fb is None:
            return []
        if isinstance(fb, tuple) and fb[0] == "long":
            out = self._align_batch_host(fb[1])
            groups, t = [], 0
            for rec in fb[1]:
                grp = [(out[t].flag, out[t].line().encode() + suffix)]
                t += 1
                while t < len(out) and out[t].qname == rec.name \
                        and out[t].flag & 0x100:
                    grp.append((out[t].flag, out[t].line().encode() + suffix))
                    t += 1
                groups.append(grp)
            return groups
        from bowtie2_tpu.native.samemit import (RefNameTable, XS_OMIT,
                                                sam_tails_batch)
        from bowtie2_tpu.ops.fused import CHOSEN_FIELDS
        import time as _time
        _t = _time.time()
        pol = self.pol
        B, Bp, kk, kk_bt, S = fb.B, fb.Bp, fb.kk, fb.kk_bt, fb.S
        Bc = Bp * kk_bt
        blob = np.asarray(fb.blob)
        self.metrics.add(t_dp=_time.time() - _t)
        _t = _time.time()
        ops = blob[:S * Bc].reshape(S, Bc)
        meta = blob[S * Bc:].view(np.int32)
        r_score = meta[:kk * Bp].reshape(kk, Bp)
        r_valid = meta[kk * Bp:2 * kk * Bp].reshape(kk, Bp) != 0
        ch = meta[2 * kk * Bp:2 * kk * Bp + CHOSEN_FIELDS * Bc]\
            .reshape(CHOSEN_FIELDS, Bc)
        (ch_ok, ch_or, ch_rid, ch_roff, ch_rdstart, ch_rdend, ch_nmm,
         ch_ngo, ch_ngc, ch_nrefn, ch_sccheck, ch_score) = ch
        ovr = self._ee_replay_overrides(fb, meta)
        if int(meta[2 * kk * Bp + CHOSEN_FIELDS * Bc]) == 0:
            ovr.update(self._mm1_replay_overrides(fb, meta, ch))
        if int(meta[2 * kk * Bp + CHOSEN_FIELDS * Bc]) > 0:
            out = self._align_batch_host(fb.records)   # rare overflow
            groups, t = [], 0
            for rec in fb.records:
                grp = [(out[t].flag, out[t].line().encode() + suffix)]
                t += 1
                while t < len(out) and out[t].qname == rec.name \
                        and out[t].flag & 0x100:
                    grp.append((out[t].flag, out[t].line().encode() + suffix))
                    t += 1
                groups.append(grp)
            return groups

        khits = 10**9 if pol.all_hits else pol.khits
        n_rank = r_valid.sum(axis=0)
        from bowtie2_tpu.pipeline.traj_replay import traj_overrides
        from bowtie2_tpu.ops.fused import CHOSEN_FIELDS as _CF_T
        _base_t = 2 * kk * Bp + _CF_T * Bc + 1
        _ee_t = meta[_base_t:_base_t + 8 * Bp].reshape(8, Bp)
        tovr = traj_overrides(self, fb, n_rank, ovr,
                              rep_ctx=_ee_t[6] > _ee_t[7])
        n_rep = np.minimum(np.minimum(n_rank, khits), kk_bt)
        live_col = ~fb.filtered & (np.arange(Bp) < B)
        emit2 = (ch_ok.reshape(kk_bt, Bp).astype(bool)
                 & (np.arange(kk_bt)[:, None] < n_rep[None, :])
                 & live_col[None, :]
                 & (ch_sccheck == ch_score).reshape(kk_bt, Bp))
        if ovr:
            ovr_arr = np.zeros(Bp, bool)
            ovr_arr[list(ovr)] = True
            emit2 &= ~ovr_arr[None, :]   # replay reads emit synth groups
        if tovr:
            tovr_arr = np.zeros(Bp, bool)
            tovr_arr[list(tovr)] = True
            emit2 &= ~tovr_arr[None, :]  # trajectory-replay groups below
        n_emit = emit2.sum(axis=0)
        unal = (np.arange(Bp) < B) & (n_emit == 0)
        if ovr:
            unal &= ~ovr_arr
        if tovr:
            unal &= ~tovr_arr

        # record table: aligned records (ci order) then unaligned reads
        cis = np.nonzero(emit2.reshape(-1))[0].astype(np.int32)
        ri_al = cis % Bp
        j_al = cis // Bp
        ri_un = np.nonzero(unal)[0].astype(np.int32)
        nal, nun = cis.size, ri_un.size
        ri_all = np.concatenate([ri_al, ri_un])
        L_all = fb.lens[ri_all]
        orient = np.zeros(nal + nun, np.int32)
        orient[:nal] = ch_or[cis]
        codes_n = np.where((orient == 0)[:, None],
                           fb.fw[ri_all], fb.rc[ri_all])
        quals_n = np.where((orient == 0)[:, None],
                           fb.qu[ri_all], fb.qu_r[ri_all])

        mode = np.zeros(nal + nun, np.int8)
        mode[:nal] = 1
        mode[nal:] = fb.yf[ri_un]      # 0 or the YF reason code
        flag = np.zeros(nal + nun, np.int32)
        # secondary = per-read EMISSION rank > 0 (not raw candidate rank):
        # if rank 0 was dropped by the score-check net, rank 1 is primary —
        # matches collect()'s n_emitted ordering
        emit_rank = np.cumsum(emit2, axis=0).reshape(-1)[cis]   # 1-based
        flag[:nal] = (orient[:nal] != 0) * 0x10 + (emit_rank > 1) * 0x100
        flag[nal:] = FLAG_UNMAPPED

        # MAPQ + XS (khits == 1) / 255 (k/a mode)
        mapq = np.full(nal + nun, 255, np.int32)
        xs = np.full(nal + nun, XS_OMIT, np.int32)
        if khits == 1:
            has2 = r_valid[1] if kk > 1 else np.zeros(Bp, bool)
            for t in range(nal):
                ri = ri_al[t]
                sec = int(r_score[1, ri]) if has2[ri] else None
                per = int(fb.perfect[ri]) if pol.local else 0
                mapq[t] = self._mapq(int(ch_score[cis[t]]), sec, per,
                                     int(fb.minsc[ri]))
                if sec is not None:
                    xs[t] = sec
        else:
            # -k/-a mode (unique.h:202): XS on every record with a
            # second-best; primary MAPQ computed when second-best exists
            has2 = r_valid[1] if kk > 1 else np.zeros(Bp, bool)
            first = emit_rank == 1
            xs[:nal] = np.where(has2[ri_al], r_score[1, ri_al]
                                if kk > 1 else XS_OMIT, XS_OMIT)
            for t in np.nonzero(first & has2[ri_al])[0]:
                ri = ri_al[t]
                per = int(fb.perfect[ri]) if pol.local else 0
                mapq[t] = self._mapq(int(ch_score[cis[t]]),
                                     int(r_score[1, ri]), per,
                                     int(fb.minsc[ri]))

        try:
            from bowtie2_tpu.ops.fused import CHOSEN_FIELDS as _CF
            _base = 2 * kk * Bp + _CF * Bc + 1
            _ee = meta[_base:_base + 8 * Bp].reshape(8, Bp)
            _live = ~fb.filtered & (np.arange(Bp) < B)
            _wf, _wr = _ee[2], _ee[5]
            self.metrics.add(
                ex_ranges=int(((_wf > 0) & _live).sum()
                              + ((_wr > 0) & _live).sum()),
                ex_rows=int(_wf[_live].sum() + _wr[_live].sum()),
                ex_succ=int((((_wf + _wr) > 0) & _live).sum()),
                seed_nrange=int(_ee[7][_live].sum()),
                seed_nelt=int(_ee[6][_live].sum()),
                mm1_attempts=int(_live.sum()), mm1_ranges=0)
        except Exception:
            pass
        if self.dp_log is not None:
            for t in range(nal):
                ri = int(ri_al[t])
                self.dp_log.write(
                    f"{fb.records[ri].name}\t{'-' if orient[t] else '+'},"
                    f"{int(ch_rid[cis[t]])},{int(ch_roff[cis[t]])},"
                    f"{int(fb.minsc[ri])},{int(ch_score[cis[t]])}\n")
        if self._names_tab is None:
            self._names_tab = RefNameTable(self.data.ref_names)
        z = np.zeros(nal + nun, np.int32)
        tails = sam_tails_batch(
            mode, flag, np.concatenate([ch_rid[cis], z[nal:]]),
            np.concatenate([ch_roff[cis] + 1, z[nal:]]), mapq,
            np.concatenate([ch_score[cis], z[nal:]]), xs,
            np.concatenate([ch_nrefn[cis], z[nal:]]),
            np.concatenate([ch_nmm[cis], z[nal:]]),
            np.concatenate([ch_ngo[cis], z[nal:]]),
            np.concatenate([ch_ngc[cis], z[nal:]]),
            codes_n, quals_n, L_all, ops,
            np.concatenate([cis, z[nal:]]),
            np.concatenate([ch_rdstart[cis], z[nal:]]),
            np.concatenate([ch_rdend[cis], z[nal:]]),
            np.concatenate([(ch_rdend[cis] - ch_rdstart[cis])
                            + ch_ngc[cis] + 1, z[nal:]]),
            self._names_tab, suffix, xeq=self.pol.xeq)

        # group per read, aligned ranks ascending
        groups: List[List[Tuple[int, bytes]]] = [[] for _ in range(B)]
        def _tg(rec):
            tg = getattr(rec, "tags", None)
            return tg.encode() if tg else b""

        for t in range(nal):
            rec_t = fb.records[ri_al[t]]
            groups[ri_al[t]].append(
                (int(flag[t]), rec_t.name.encode() + tails[t] + _tg(rec_t)))
        for t in range(nun):
            rec_t = fb.records[ri_un[t]]
            groups[ri_un[t]].append(
                (int(flag[nal + t]),
                 rec_t.name.encode() + tails[nal + t] + _tg(rec_t)))
        for ri_o, (recs_o, _maxed_o, _cnt_o, _tp_o) in ovr.items():
            L_o = int(fb.lens[ri_o])
            rec_o = fb.records[ri_o]
            for r in self._synth_replay_group(
                    rec_o, recs_o, _cnt_o, L_o, int(fb.minsc[ri_o]),
                    lambda o, _ri=ri_o, _L=L_o:
                    (fb.fw[_ri, :_L], fb.qu[_ri, :_L]) if o == 0
                    else (fb.rc[_ri, :_L], fb.qu_r[_ri, :_L]),
                    template=_tp_o):
                groups[ri_o].append((r.flag, r.line().encode() + suffix))
        n_t_unal = n_t_multi = n_t_one = 0
        for ri_t, (t_recs, t_nalns) in tovr.items():
            for r in t_recs:
                groups[ri_t].append((r.flag, r.line().encode() + suffix))
            if t_nalns == 0:
                n_t_unal += 1
            elif t_nalns > 1:
                n_t_multi += 1
            else:
                n_t_one += 1

        st = AlignStats()
        st.reads = B
        st.filtered = int(fb.filtered[:B].sum())
        st.unal = int(unal.sum()) + n_t_unal
        multi = (n_emit > 0) & (n_rank > 1) & live_col
        st.al_multi = int(multi.sum()) + len(ovr) + n_t_multi
        st.al_one = int(((n_emit > 0) & ~multi).sum()) + n_t_one
        self._merge_stats(st)
        self.metrics.add(t_host=_time.time() - _t)
        return groups


    def _synth_replay_group(self, rec: SeqRecord, recs, cnt: int, L: int,
                            minsc_ri: int, oriented,
                            template: dict = None) -> List[SamAlignment]:
        """Build the full SAM record group for an RNG-replayed exact-
        multimap read. All alignments are perfect end-to-end matches, so
        the records are clones differing only in position/orientation —
        no DP or backtrace involved.

        recs: [(rid, roff, orient)] in reference priority order; cnt: how
        many alignments existed (> len(recs) when -k truncates); oriented:
        orient -> (codes, quals)."""
        pol = self.pol
        kmode = pol.all_hits or pol.khits > 1 or pol.mhits == 0
        # exact e2e AS = 0. cnt = alignments the reference ACCUMULATED
        # before its ReportingState cap (-k 1 stops at one → no
        # second-best was ever seen → no XS, MAPQ 255 in k-mode /
        # unique-value otherwise; unique.h:202 oracle-verified).
        has_sec = cnt > 1
        tp = template or dict(as_=0, xm=0, md=str(L),
                              cigar=f"{L}{'=' if pol.xeq else 'M'}")
        mq0 = self._mapq(tp["as_"], tp["as_"] if has_sec else None, 0,
                         minsc_ri)
        out = []
        for j, (rid_, roff_, ori) in enumerate(recs):
            codes, quals = oriented(ori)
            flag = (FLAG_REVERSE if ori else 0) | (0x100 if j else 0)
            if kmode:
                mq = mq0 if (j == 0 and has_sec) else 255
            else:
                mq = mq0
            opts = [("AS", "i", tp["as_"])]
            if has_sec:
                opts.append(("XS", "i", tp["as_"]))
            opts += [("XN", "i", 0),
                     ("XM", "i", tp["xm"]), ("XO", "i", 0), ("XG", "i", 0),
                     ("NM", "i", tp["xm"]), ("MD", "Z", tp["md"]),
                     ("YT", "Z", "UU")]
            out.append(SamAlignment(
                qname=rec.name, flag=flag,
                rname=self.data.ref_names[rid_], pos=roff_ + 1, mapq=mq,
                cigar=tp["cigar"],
                seq=decode_seq(codes.astype(np.uint8)).decode(),
                qual=qual_string(quals), opts=opts))
        return out

    def _se_effort_filter(self, cs: CandSet) -> None:
        """SE -D fail-streak model (bt2_search.cpp:464-472, the unpaired
        extendSeeds loop): an attempt that does not produce a NEW valid
        alignment builds the streak; `-D` consecutive fails end the phase;
        maxIters(400)/maxDp(300) are hard per-read caps. Mirrors
        pe_effort.py's PE replay: phases (exact, 1mm/half, seed) each
        reset the streak, ranges are visited width-ascending round-robin
        with small-range bursts. Candidates the reference would never
        have attempted are marked invalid in cs (cs.valid &= attempted).

        The within-range visit order approximates the reference's
        RowSampler random order with canonical SA order — exact only for
        width-1 ranges (RowSampler RNG parity is the open layer-2 item),
        so this models the reference's EFFORT envelope, not its exact
        attempted set on wide ranges."""
        pol = self.pol
        if pol.all_hits or not cs.n_cand:
            return
        from bowtie2_tpu.pipeline.pe_effort import pe_streak_limit
        from bowtie2_tpu.pipeline.pe_effort import attempt_order
        limit = pe_streak_limit(pol.fail_streak, pol.khits, False)
        MAX_ITERS, MAX_DP = 400, 300
        by_read: Dict[int, List[int]] = {}
        for k in range(cs.n_cand):
            by_read.setdefault(int(cs.cand_read[k]), []).append(k)
        drop: List[int] = []
        for ri, ks in by_read.items():
            # fast path: no phase can build a full streak
            if len(ks) <= limit:
                continue
            exact = [k for k in ks if cs.cand_exact[k]]
            halfp = [k for k in ks
                     if cs.cand_half[k] and not cs.cand_exact[k]]
            seedp = [k for k in ks
                     if not cs.cand_exact[k] and not cs.cand_half[k]]
            iters = 0
            seen_ends = set()
            hard_stop = False
            for ks_p in (exact, halfp, seedp):
                if hard_stop or not ks_p:
                    continue
                order = attempt_order(ks_p, cs.cand_rangej, cs.cand_rwidth)
                streak = 0
                for k in order:
                    if iters >= min(MAX_ITERS, MAX_DP):
                        hard_stop = True
                    if hard_stop or streak >= limit:
                        drop.append(k)
                        continue
                    iters += 1
                    key = (int(cs.cand_or[k]), int(cs.end_pos[k]))
                    if cs.valid[k] and key not in seen_ends:
                        seen_ends.add(key)
                        streak = 0
                    else:
                        streak += 1
        if drop:
            cs.valid[np.array(drop, np.int64)] = False



    def _align_batch_host(self, records: Sequence[SeqRecord],
                          nrounds: int = 1,
                          _merge: bool = True) -> List[SamAlignment]:
        if not records:
            return []
        pol = self.pol
        khits = 10**9 if pol.all_hits else pol.khits
        cs = self._search_candidates(records, nrounds=nrounds)
        self._se_effort_filter(cs)
        ranked = self._rank_per_read(cs)
        B = len(records)
        ovr = {}
        if not pol.local and cs.sw_top is not None:
            ee_wf = np.where((cs.sw_ned[:B] == 0)
                             & (cs.sw_bot[:B] > cs.sw_top[:B]),
                             cs.sw_bot[:B] - cs.sw_top[:B], 0)
            ee_wr = np.where((cs.sw_ned[B:] == 0)
                             & (cs.sw_bot[B:] > cs.sw_top[B:]),
                             cs.sw_bot[B:] - cs.sw_top[B:], 0)
            ovr = self._replay_from_ranges(
                records, cs.lens, cs.filtered, B,
                cs.sw_top[:B].astype(np.int64), ee_wf,
                cs.sw_top[B:].astype(np.int64), ee_wr)
        chosen = {ri: ks[:max(khits, 1) + (0 if khits > 1 else 1)]
                  for ri, ks in ranked.items()}
        sel = np.array(sorted({k for ks in chosen.values() for k in ks}),
                       np.int32)
        tb_of = self._backtrace_sel(cs.pool, sel) if chosen else {}

        st = AlignStats()
        out: List[SamAlignment] = []
        # per-read class for the stderr summary (0=unal, 1=unique, 2=multi);
        # group replacements below (exact/trajectory replay) update it
        cls = np.zeros(B, np.int8)
        rd_start = np.zeros(len(records) + 1, np.int64)
        for ri, rec in enumerate(records):
            rd_start[ri] = len(out)
            st.reads += 1
            L = int(cs.lens[ri])
            if cs.filtered[ri]:
                st.filtered += 1
                out.append(self._unaligned(rec, self.YF_STR[int(cs.yf[ri])]))
                continue
            ks = chosen.get(ri)
            if not ks:
                out.append(self._unaligned(rec))
                continue
            scores = cs.pool.scores
            n_report = min(len(ks), khits)
            n_emitted = 0
            for rank, k in enumerate(ks[:n_report]):
                best = int(scores[k])
                if khits > 1:
                    # -k/-a mode (unique.h:202): secondaries 255; primary
                    # gets a real MAPQ when a second-best exists; XS on all
                    sec = int(scores[ks[1]]) if len(ks) > 1 else None
                    if rank == 0 and sec is not None:
                        per = int(cs.perfect[ri]) if pol.local else 0
                        mq = self._mapq(best, sec, per, int(cs.minsc[ri]))
                    else:
                        mq = 255
                else:
                    sec_k = ks[1] if len(ks) > 1 else None
                    sec = int(scores[sec_k]) if sec_k is not None else None
                    per = int(cs.perfect[ri]) if pol.local else 0
                    mq = self._mapq(best, sec, per, int(cs.minsc[ri]))
                orient = int(cs.cand_or[k])
                codes, quals = self._oriented(cs, ri, orient)
                flag_extra = 0x100 if n_emitted > 0 else 0
                rec_out = self._emit_aligned(rec, L, orient, codes, quals,
                                             cs.pool, k, tb_of[k],
                                             best, sec, mq, "UU", flag_extra)
                if rec_out is not None:
                    out.append(rec_out)
                    n_emitted += 1
            if n_emitted == 0:
                out.append(self._unaligned(rec))
            elif len(ks) > 1:
                cls[ri] = 2
            else:
                cls[ri] = 1
        rd_start[len(records)] = len(out)
        # 1mm maxed-multimap replay from the emitted rank-0 records
        if not pol.local and not pol.all_hits and cs.sw_top is not None:
            ee_tot2 = np.where((cs.sw_ned == 0) & (cs.sw_bot > cs.sw_top),
                               cs.sw_bot - cs.sw_top, 0)
            ee_tot_h = ee_tot2[:B] + ee_tot2[B:]
            name2id = {n: i for i, n in enumerate(self.data.ref_names)}
            entries = []
            for ri in range(B):
                if ri in ovr or cs.filtered[ri] or ee_tot_h[ri] != 0:
                    continue
                r0 = out[int(rd_start[ri])]
                if r0.flag & FLAG_UNMAPPED:
                    continue
                op = {t: v for t, _ty, v in r0.opts}
                L0 = int(cs.lens[ri])
                if not (op.get("XM") == 1 and op.get("XO") == 0
                        and op.get("XG") == 0 and op.get("XN") == 0
                        and r0.cigar == f"{L0}M"):
                    continue
                entries.append((ri, name2id[r0.rname], r0.pos - 1,
                                1 if r0.flag & FLAG_REVERSE else 0,
                                int(op.get("AS", 0))))
            if entries:
                import types as _types
                shim = _types.SimpleNamespace(
                    records=records, lens=cs.lens, fw=cs.fw, rc=cs.rc,
                    Lmax=cs.Lmax)
                ovr.update(self._mm1_replay_core(entries, shim))
        repl = {}
        for ri in ovr:
            recs_o, _maxed_o, _cnt_o, _tp_o = ovr[ri]
            repl[ri] = self._synth_replay_group(
                records[ri], recs_o, _cnt_o, int(cs.lens[ri]),
                int(cs.minsc[ri]),
                lambda o, _ri=ri: self._oriented(cs, _ri, o),
                template=_tp_o)
            cls[ri] = 2 if _cnt_o > 1 else 1
        # --seed-boost re-seeding rounds (bt2_search.cpp:3881): a mate
        # continues into round 1+ only when its average seed range is
        # >= seedBoostThresh elements; those ultra-repetitive reads are
        # rerun with the pooled round-0..R-1 seed offsets
        if nrounds == 1 and pol.seed_rounds > 1 and not pol.local \
                and cs.seed_nz is not None:
            gated = [ri for ri in range(B)
                     if ri not in repl and not cs.filtered[ri]
                     and cs.seed_nz[ri] > 0
                     and cs.seed_elts[ri] / cs.seed_nz[ri]
                     >= self.pol.seed_boost]
            if gated:
                sub = self._align_batch_host([records[i] for i in gated],
                                             nrounds=pol.seed_rounds,
                                             _merge=False)
                t = 0
                for gi, ri in enumerate(gated):
                    grp = [sub[t]]
                    t += 1
                    while t < len(sub) and (sub[t].flag & 0x100):
                        grp.append(sub[t])
                        t += 1
                    repl[ri] = grp
        # trajectory-RNG replay (pipeline/traj_replay.py): route imperfect
        # multimaps / order-sensitive-XS reads through the draw-for-draw
        # reference trajectory; the replay models the full round schedule
        # so it supersedes the seed-boost rerun group when it succeeds
        from bowtie2_tpu.pipeline import traj_replay as _traj
        if _merge and nrounds == 1 and _traj.eligible(pol):
            # cohort: reads whose reported fields depend on the search
            # trajectory — canonical multimaps, plus reads in repetitive
            # context (some seed range has >= 2 elements: the reference's
            # sampled visits can surface a second-best ours didn't rank)
            rep_ctx = (cs.seed_nz is not None
                       and (cs.seed_elts > cs.seed_nz))
            tris = [ri for ri in range(B)
                    if not cs.filtered[ri] and ri not in ovr
                    and cls[ri] != 0
                    and (len(ranked.get(ri, ())) >= 2
                         or (rep_ctx is not False and bool(rep_ctx[ri])))]
            if tris:
                preds = _traj.run_replays(self, records, tris)
                if preds:
                    import types as _types
                    shim = _types.SimpleNamespace(
                        records=records, B=B, lens=cs.lens, fw=cs.fw,
                        rc=cs.rc, qu=cs.qu, qu_r=cs.qu_r, minsc=cs.minsc,
                        Lmax=cs.Lmax, filtered=cs.filtered)
                    tout = _traj.emit_overrides(self, shim, preds)
                    if tout:
                        self.metrics.add(traj_overridden=len(tout))
                    for ri, t_recs in tout.items():
                        repl[ri] = t_recs
                        n_t = preds[ri].nalns
                        cls[ri] = 0 if n_t == 0 else (2 if n_t > 1 else 1)
        for ri in sorted(repl, reverse=True):
            out[int(rd_start[ri]):int(rd_start[ri + 1])] = repl[ri]
        st.unal = int((cls == 0).sum())
        st.al_one = int((cls == 1).sum())
        st.al_multi = int((cls == 2).sum())
        if _merge:
            self._merge_stats(st)
        return out


@dataclass
class FusedPEBatch:
    """In-flight fused paired-end batch: device handles + host context.

    Read-row layout: mate-1 reads occupy rows [0, Bp), mate-2 rows
    [Bp, 2*Bp) (real pairs first, padding after, per half)."""
    pairs: Sequence[Tuple[SeqRecord, SeqRecord]]
    B: int                      # real pairs
    Bp: int                     # padded pairs (pow2)
    B2: int                     # 2 * Bp read rows
    Lmax: int
    T: int
    NC: int
    G: int
    lens: np.ndarray            # (B2,)
    fw: np.ndarray              # (B2, Lmax) host int8
    qu: np.ndarray
    rc: np.ndarray
    qu_r: np.ndarray
    minsc: np.ndarray
    perfect: np.ndarray
    filtered: np.ndarray
    yf: np.ndarray
    inst_read: np.ndarray       # (B2,) N-free instantiated seeds per read
    jboth: object               # device (2*B2, Lmax)
    jquals: object
    res: object                 # ops.fused.FusedPEResult
    pairing: object = None      # static pairing tuple passed to fused_pe
                                # (None = device pairing disabled)


class PairedAligner(BatchAligner):
    """Aligns batches of read pairs: concordant search, mate rescue DP,
    discordant and mixed fallbacks (reference SwDriver::extendSeedsPaired +
    PairedEndPolicy, aligner_sw_driver.cpp / pe.cpp).

    Default path: fused single-dispatch search (ops/fused.py fused_pe) +
    vectorized host pairing/effort + emission backtrace of only the
    reported records. `align_batch_host` is the phase-by-phase fallback
    (int64 large-index mode, DP-budget overflow) and differential oracle."""

    def submit(self, pairs):
        """Dispatch the fused PE device program (non-blocking)."""
        if not pairs:
            return None
        if max(max(p[0].seq.size, p[1].seq.size) for p in pairs) \
                > LEN_BUCKETS[-1]:
            return ("host", pairs)    # long reads: diag-kernel host path
        from bowtie2_tpu.ops.fused import fused_pe
        import time as _time
        _t = _time.time()
        pol = self.pol
        B = len(pairs)
        Bp = _round_batch(B, lo=128)
        dummy = SeqRecord(name="", seq=np.zeros(0, np.uint8),
                          qual=np.zeros(0, np.uint8))
        recs = [p[0] for p in pairs] + [dummy] * (Bp - B) + \
               [p[1] for p in pairs] + [dummy] * (Bp - B)
        B2 = 2 * Bp
        Lmax = _bucket(max(max(int(r.seq.size) for r in recs), 1))
        fw, qu, rc, qu_r, lens = pad_reads(recs, Lmax)

        ulen, inv = np.unique(lens, return_inverse=True)
        minsc = np.array([pol.min_score(int(l)) if l else 0
                          for l in ulen], np.int64)[inv]
        perfect = np.array([pol.perfect_score(int(l)) if pol.local else 0
                            for l in ulen], np.int64)[inv]
        nceil = np.array([pol.nceil(int(l)) if l else 0
                          for l in ulen], np.int32)[inv]
        n_count = (fw >= 4).sum(axis=1) - (Lmax - lens)
        filtered, yf = self._filters(recs, lens, n_count, nceil, minsc)
        live = ~filtered & (lens > 0)

        # paired-end seed-interval boost when BOTH mates pass filters
        # (bt2_search.cpp:3445-3448)
        okm = ~filtered
        ival_boost = okm & np.roll(okm, Bp)
        offs_all, valid_all = self._seed_offsets(lens, ival_boost)

        both = np.concatenate([fw, rc], axis=0)
        inst0 = self._inst_counts(both, offs_all, valid_all)
        inst_read = inst0[:B2] + inst0[B2:]

        T = self.NC_PER_READ
        G = pol.band_halfwidth(Lmax)
        NC = 2 * B2
        jboth = self._put(both).astype(jnp.int32)
        jquals = self._put(np.concatenate([qu, qu_r], axis=0)
                           ).astype(jnp.int32)
        live_or = self._live_orient(B2, paired=True)
        pairing = self._pe_pairing_static(minsc, perfect)
        statics = dict(
            params=pol.sw_params(), band=G, seed_len=pol.seed_len,
            ftab_chars=self.data.fw.ftab_chars,
            half_ftab=min(self.data.fw.ftab_chars, pol.seed_len // 2),
            period=1 << self.data.off_rate, T=T,
            NC=NC, n1=pol.seed_mms >= 1,
            no_1mm=getattr(pol, "no_1mm", False),
            no_exact=getattr(pol, "no_exact", False),
            NCDP=max(B2, 512), pairing=pairing)
        batch_args = (jboth, jquals, self._put(lens),
                      self._put(offs_all), self._put(valid_all),
                      self._put(minsc.astype(np.int32)), self._put(live),
                      None if live_or is None else self._put(live_or),
                      self._put(inst_read.astype(np.int32)),
                      self._put(filtered))
        if self.shard_mesh is not None:
            key = ("pe",) + tuple(sorted(statics.items()))
            if key not in self._shard_fns:
                from bowtie2_tpu.dist.sharded import make_fused_pe_sharded
                self._shard_fns[key] = make_fused_pe_sharded(
                    self.shard_mesh,
                    large=self.sidx.fw.occ_cp64 is not None, **statics)
            res = self._shard_fns[key](self.sidx, self.seg, *batch_args)
        else:
            res = fused_pe(self.idx.fw, self.idx.ref_words,
                           self.idx.refn_words, self.seg, *batch_args,
                           **statics)
        self.metrics.add(t_search=_time.time() - _t)
        return FusedPEBatch(
            pairs=pairs, B=B, Bp=Bp, B2=B2, Lmax=Lmax, T=T, NC=NC, G=G,
            lens=lens, fw=fw, qu=qu, rc=rc, qu_r=qu_r, minsc=minsc,
            perfect=perfect, filtered=filtered, yf=yf, inst_read=inst_read,
            jboth=jboth, jquals=jquals, res=res, pairing=pairing)

    def _pe_pairing_static(self, minsc, perfect):
        """Static pairing tuple for the device-side fused-PE pairing, or
        None when the host must run the full pairing anyway (k/-a modes
        re-rank whole combo lists) or when the int32 pairing key could
        overflow (extreme --score-min / --ma settings)."""
        from bowtie2_tpu.pipeline.pe_effort import pe_streak_limit
        pol = self.pol
        if pol.all_hits or pol.khits > 1:
            return None
        bound = (int(np.abs(minsc).max(initial=0))
                 + int(np.abs(perfect).max(initial=0)) + 1) * 2
        if bound << 10 >= (1 << 31):      # 2*shift bits at T<=32
            return None
        if getattr(self, "force_host_pairing", False):
            return None
        return (pol.mate_fw_rc, pol.minins, pol.maxins, pol.olap_ok,
                pol.contain_ok, pol.dovetail_ok,
                pe_streak_limit(pol.fail_streak, pol.khits, True))

    def collect(self, h):
        if h is None:
            return []
        if isinstance(h, tuple) and h[0] == "host":
            return self.align_batch_host(h[1])
        return self._collect_fused(h)

    def collect_raw(self, h, suffix: bytes = b""
                    ) -> List[List[Tuple[int, bytes]]]:
        """collect(), but emit finished SAM line bytes via the native PE
        line builder: one group per PAIR, each entry (flag, line). The
        fast path builds concordant pairs fully vectorized (native C
        CIGAR/MD decode + line assembly); legacy/k-mode/host batches fall
        back to object records rendered to lines."""
        if h is None:
            return []
        if isinstance(h, tuple) and h[0] == "host":
            return self._pe_groups_from_objects(
                len(h[1]), self.align_batch_host(h[1]), suffix)
        from bowtie2_tpu.ops.fused import PE_PAIR_FIELDS
        dec = self._pe_decode(h)
        if dec is None:    # DP budget overflow
            return self._pe_groups_from_objects(
                len(h.pairs), self.align_batch_host(h.pairs), suffix)
        rf, pf, ee, snz, cif = dec
        if h.pairing is None or pf[PE_PAIR_FIELDS - 1, :h.B].any():
            return self._pe_groups_from_objects(
                h.B, self._collect_fused_legacy(h, ee, snz, cif), suffix)
        return self._collect_fused_fast_raw(h, rf, pf, cif, suffix)

    @staticmethod
    def _pe_groups_from_objects(n_pairs, out, suffix):
        """Group a flat SamAlignment list into per-pair (flag, line)
        groups. A group holds one primary record per mate (half-mapped
        pairs may lead with the aligned MATE 2 record — finishRead
        order), plus any secondaries; a new group starts at a primary
        record for a mate the current group already has."""
        groups = []
        s1 = s2 = True          # force a new group at the first record
        for r in out:
            m1 = bool(r.flag & FLAG_MATE1)
            if not (r.flag & 0x100) and (s1 if m1 else s2):
                groups.append([])
                s1 = s2 = False
            if not (r.flag & 0x100):
                if m1:
                    s1 = True
                else:
                    s2 = True
            groups[-1].append((r.flag, r.line().encode() + suffix))
        assert len(groups) == n_pairs
        return groups

    def align_batch(self, pairs: Sequence[Tuple[SeqRecord, SeqRecord]]
                    ) -> List[SamAlignment]:
        return self.collect(self.submit(pairs))

    def align_pairs_fast(self, pairs, batch: int = 2048, depth: int = 3,
                         raw: bool = False) -> int:
        """Pipelined submit/collect over a whole corpus (bench helper)."""
        from collections import deque
        pend = deque()
        drain = self.collect_raw if raw else self.collect
        for k in range(0, len(pairs), batch):
            pend.append(self.submit(pairs[k:k + batch]))
            if len(pend) > depth:
                drain(pend.popleft())
        while pend:
            drain(pend.popleft())
        return len(pairs)

    def align_batch_host(self, pairs: Sequence[Tuple[SeqRecord, SeqRecord]]
                         ) -> List[SamAlignment]:
        if not pairs:
            return []
        pol = self.pol
        B = len(pairs)
        records = [p[0] for p in pairs] + [p[1] for p in pairs]
        cs = self._search_candidates(records, paired=True)
        ranked = self._rank_per_read(cs)

        # exact extents need backtrace of every ranked candidate
        all_ks = sorted({k for ks in ranked.values() for k in ks})
        if cs.pool is not None:
            tb_of = self._backtrace_sel(cs.pool, np.array(all_ks, np.int32))
            ext_lo = {k: int(cs.pool.win_start[k])
                      + tb_of[k][1]["ref_start_win"] for k in all_ks}
            ext_hi = {k: int(cs.end_pos[k]) for k in all_ks}
            scores = cs.pool.scores
        else:
            tb_of, ext_lo, ext_hi = {}, {}, {}
            scores = np.zeros(0, np.int64)

        # ---- pairing pass 1: cross products of per-mate candidates ----
        # Every concordant (k1, k2) classification; anchors that pair with
        # SOME valid opposite candidate are "successful attempts" for the
        # -D effort model below (the reference's mate-window DP would have
        # found that partner, aligner_sw_driver.cpp:2310).
        conc_raw: Dict[int, List[Tuple[int, int, int]]] = {}
        succ_cross: set = set()
        for i in range(B):
            l1 = ranked.get(i, [])
            l2 = ranked.get(B + i, [])
            combos = []
            for k1 in l1:
                for k2 in l2:
                    if cs.rid[k1] != cs.rid[k2]:
                        continue
                    typ = pe_classify(
                        pol.mate_fw_rc,
                        ext_lo[k1], ext_hi[k1], cs.cand_or[k1] == 0,
                        ext_lo[k2], ext_hi[k2], cs.cand_or[k2] == 0,
                        pol.minins, pol.maxins, pol.olap_ok, pol.contain_ok, pol.dovetail_ok)
                    if typ != PE_DISCORD:
                        combos.append((int(scores[k1] + scores[k2]), k1, k2))
                        succ_cross.add(k1)
                        succ_cross.add(k2)
            if combos:
                combos.sort(key=lambda c: -c[0])
                conc_raw[i] = combos

        # ---- -D fail-streak effort model (pe_effort.py) ----
        # seed-round suppression: mate with fewer exact-sweep elements
        # anchors first (bt2_search.cpp:3537-3541); if it instantiates no
        # N-free seeds (bt2_search.cpp:3948) OR its seed search finds no
        # SA ranges at all (:3968), the round's `break` skips the other
        # mate's seeding — and PE's halved round count (1 under -R 2)
        # means no seed phase for that mate at all
        B2 = 2 * B
        ee = cs.ee_elts[:B2] + cs.ee_elts[B2:]
        inst = cs.inst0[:B2] + cs.inst0[B2:]
        suppress = np.zeros(B2, bool)
        for i in range(B):
            if cs.filtered[i] or cs.filtered[B + i]:
                continue
            n1, n2_ = int(ee[i]), int(ee[B + i])
            first, second = ((B + i, i) if (n1 > 0 and n2_ > 0 and n1 > n2_)
                             else (i, B + i))
            if inst[first] == 0 or cs.seed_nz[first] == 0:
                suppress[second] = True
                suppress[first] = True
        eff = self._pe_effort_sets(cs, succ_cross, suppress)
        conc: Dict[int, List[Tuple[int, int, int]]] = {}
        for i, combos in conc_raw.items():
            kept = [c for c in combos
                    if c[1] in eff[i][1] or c[2] in eff[B + i][1]]
            if kept:
                conc[i] = kept

        def _eff_ranked(ri):
            return [k for k in ranked.get(ri, []) if k in eff[ri][0]]

        # ---- pass 2: mate rescue DP for pairs without a concordant combo ----
        rescue_specs = []   # (pair, anchor_k, opp_read_idx, opp_or, win_lo)
        for i in range(B):
            if i in conc:
                continue
            for mate, ri in ((0, i), (1, B + i)):
                lst = _eff_ranked(ri)
                if not lst:
                    continue
                ak = lst[0]
                wlo, whi, opp_fw = rescue_window(
                    pol.mate_fw_rc, ext_lo[ak], ext_hi[ak],
                    cs.cand_or[ak] == 0, mate == 0, pol.maxins)
                opp_ri = (B + i) if mate == 0 else i
                if cs.filtered[opp_ri] or cs.lens[opp_ri] == 0:
                    continue
                if _eff_ranked(opp_ri):
                    # opposite mate already aligned validly: no rescue
                    # (matches the reference's observed give-up behavior)
                    continue
                rescue_specs.append((i, ak, opp_ri, 0 if opp_fw else 1, wlo))

        rpool = None
        rtb = {}
        if cs.Lmax > LEN_BUCKETS[-1]:
            rescue_specs = []      # long reads: no rect-kernel mate rescue
        if rescue_specs:
            Lmax = cs.Lmax
            Gr = max((pol.maxins + 32 - Lmax + 1) // 2,
                     pol.band_halfwidth(Lmax))
            r_read = np.array([s[2] for s in rescue_specs], np.int64)
            r_or = np.array([s[3] for s in rescue_specs], np.int64)
            r_wlo = np.array([s[4] for s in rescue_specs], np.int64)
            r_rid = np.searchsorted(
                self.data.ref_cum,
                np.array([ext_lo[s[1]] for s in rescue_specs]),
                side="right") - 1
            rpool = self._run_dp(r_wlo, r_rid, r_read, r_or,
                                 cs.jboth, cs.jquals, cs.lens,
                                 Gr, Lmax, len(rescue_specs),
                                 full_width=True)
            r_valid = rpool.scores >= cs.minsc[r_read]
            rsel = np.nonzero(r_valid)[0].astype(np.int32)
            rtb = self._backtrace_sel(rpool, rsel)
            # classify each rescue result against its anchor
            for t in rsel.tolist():
                (i, ak, opp_ri, opp_or, _) = rescue_specs[t]
                if i in conc:
                    continue  # another rescue already made this pair CP
                rlo = int(rpool.win_start[t]) + rtb[t][1]["ref_start_win"]
                rhi = int(rpool.end_pos(np.array([t]))[0])
                if opp_ri >= B:  # opposite is mate 2 → anchor is mate 1
                    typ = pe_classify(pol.mate_fw_rc,
                                      ext_lo[ak], ext_hi[ak],
                                      cs.cand_or[ak] == 0,
                                      rlo, rhi, opp_or == 0,
                                      pol.minins, pol.maxins, pol.olap_ok, pol.contain_ok, pol.dovetail_ok)
                else:
                    typ = pe_classify(pol.mate_fw_rc,
                                      rlo, rhi, opp_or == 0,
                                      ext_lo[ak], ext_hi[ak],
                                      cs.cand_or[ak] == 0,
                                      pol.minins, pol.maxins, pol.olap_ok, pol.contain_ok, pol.dovetail_ok)
                if typ != PE_DISCORD:
                    sc_sum = int(scores[ak] + rpool.scores[t])
                    conc.setdefault(i, []).append(
                        (sc_sum, ("r", ak, t, opp_ri, opp_or, rlo, rhi)))
            for i in list(conc.keys()):
                conc[i].sort(key=lambda c: -c[0])

        # ---- emit ----
        st = AlignStats()
        out: List[SamAlignment] = []
        for i in range(B):
            rec1, rec2 = pairs[i]
            st.pairs += 1
            st.reads += 2
            l1 = _eff_ranked(i)
            l2 = _eff_ranked(B + i)

            def _xs_leg(lst, krep):
                # best attempted alignment EXCLUDING the reported one
                # (reference bestUnp1/2 — may outscore the pair choice)
                for k in lst:
                    if k != krep:
                        return int(scores[k])
                return None

            xs1 = _xs_leg(l1, l1[0] if l1 else -1)
            xs2 = _xs_leg(l2, l2[0] if l2 else -1)
            combos = conc.get(i)
            if combos:
                sec_sum = combos[1][0] if len(combos) > 1 else None

                def _unpack(combo):
                    if isinstance(combo[1], tuple):   # rescue pair
                        _, ak, t, opp_ri, opp_or, rlo, rhi = combo[1]
                        anchor = (ak, cs.pool, tb_of[ak],
                                  int(cs.cand_or[ak]), ext_lo[ak],
                                  ext_hi[ak])
                        resc = (t, rpool, rtb[t], opp_or, rlo, rhi)
                        return (anchor, resc) if opp_ri >= B \
                            else (resc, anchor)
                    _, k1, k2 = combo
                    return ((k1, cs.pool, tb_of[k1], int(cs.cand_or[k1]),
                             ext_lo[k1], ext_hi[k1]),
                            (k2, cs.pool, tb_of[k2], int(cs.cand_or[k2]),
                             ext_lo[k2], ext_hi[k2]))

                def _rep_ks(combo):
                    if isinstance(combo[1], tuple):
                        _, ak, t, opp_ri, *_r = combo[1]
                        return (ak, -1) if opp_ri >= B else (-1, ak)
                    return combo[1], combo[2]

                # -k/-a: up to khits ranked pairs; secondaries get 0x100 +
                # MAPQ 255, the primary a real MAPQ only when a second-best
                # pair exists (unique.h:202 k-mode convention)
                kmode = pol.all_hits or pol.khits > 1
                npairs = len(combos) if pol.all_hits \
                    else min(pol.khits, len(combos))
                rank0_ok = False
                # XS excludes the PRIMARY selection's slot; same value on
                # every rank (selectByScore computes bestUnchosenP1/2 once
                # from select[0], aln_sink.cpp)
                kr1, kr2 = _rep_ks(combos[0])
                xs1p, xs2p = _xs_leg(l1, kr1), _xs_leg(l2, kr2)
                for r in range(npairs):
                    if r > 0 and not rank0_ok:
                        break
                    fmq = None
                    if kmode:
                        fmq = 255 if (r > 0 or sec_sum is None) else None
                    marg1, marg2 = _unpack(combos[r])
                    ok = self._emit_pair(st, out, cs, i, rec1, rec2,
                                         marg1, marg2,
                                         combos[r][0], sec_sum, "CP", True,
                                         xs1=xs1p, xs2=xs2p,
                                         secondary=r > 0, force_mq=fmq)
                    if r == 0:
                        rank0_ok = ok
                if rank0_ok:
                    if len(combos) > 1:
                        st.conc_multi += 1
                    else:
                        st.conc_one += 1
                    continue
            # discordant: both mates aligned uniquely (any reference;
            # cross-chromosome pairs are discordant by construction)
            if not pol.no_discordant and len(l1) == 1 and len(l2) == 1:
                k1, k2 = l1[0], l2[0]
                ok = self._emit_pair(st, out, cs, i, rec1, rec2,
                                     (k1, cs.pool, tb_of[k1],
                                      int(cs.cand_or[k1]), ext_lo[k1], ext_hi[k1]),
                                     (k2, cs.pool, tb_of[k2],
                                      int(cs.cand_or[k2]), ext_lo[k2], ext_hi[k2]),
                                     int(scores[k1] + scores[k2]), None,
                                     "DP", False,
                                     force_mq=255 if (pol.all_hits or
                                                      pol.khits > 1)
                                     else None)
                if ok:
                    st.disc += 1
                    continue
            # mixed / unaligned
            self._emit_mixed(st, out, cs, i, rec1, rec2, l1, l2, tb_of)
        self._merge_stats(st)
        return out

    # ------------------------------------------------------------------
    def _collect_fused(self, fpb: FusedPEBatch) -> List[SamAlignment]:
        """Decode the fused PE compact blob and dispatch.

        The dense pairing math (dedupe/rank, (pairs, T, T) concordance
        classification, -D fast-path effort, best-combo selection, rescue
        heads) ran ON DEVICE (ops/fused.py _pe_pairing); the fast path
        consumes its per-pair/per-read decisions directly and only runs
        rescue DP + emission on the host. The legacy host pairing remains
        for k/-a modes and for batches where any read needs the
        suppression 1mm-legality or non-fast -D replay (the device flags
        those via `hostneed`); it re-runs the full pairing from the
        per-slot export, byte-identical by construction."""
        from bowtie2_tpu.ops.fused import PE_PAIR_FIELDS
        dec = self._pe_decode(fpb)
        if dec is None:
            # DP budget overflow: rerun on the uncapped host path (rare)
            return self.align_batch_host(fpb.pairs)
        rf, pf, ee, snz, cif = dec
        if fpb.pairing is None or pf[PE_PAIR_FIELDS - 1, :fpb.B].any():
            return self._collect_fused_legacy(fpb, ee, snz, cif)
        return self._collect_fused_fast(fpb, rf, pf, cif)

    def _pe_decode(self, fpb: FusedPEBatch):
        """Pull + split the compact fused-PE blob. None on DP overflow."""
        from bowtie2_tpu.ops.fused import (PE_CI_FIELDS, PE_PAIR_FIELDS,
                                           PE_READ_FIELDS)
        import time as _time
        B2, Bp, NC = fpb.B2, fpb.Bp, fpb.NC
        _t = _time.time()
        meta = np.asarray(fpb.res.blob)
        self.metrics.add(t_dp=_time.time() - _t)
        rf = meta[:PE_READ_FIELDS * B2].reshape(PE_READ_FIELDS, B2)
        off = PE_READ_FIELDS * B2
        pf = meta[off:off + PE_PAIR_FIELDS * Bp].reshape(PE_PAIR_FIELDS, Bp)
        off += PE_PAIR_FIELDS * Bp
        ee = meta[off:off + B2]
        off += B2
        snz = meta[off:off + B2]
        off += B2
        cif = meta[off:off + PE_CI_FIELDS * NC].reshape(PE_CI_FIELDS, NC)
        off += PE_CI_FIELDS * NC
        if int(meta[off]) > 0:
            sys.stderr.write("fused PE DP budget exceeded; falling back\n")
            return None
        return rf, pf, ee, snz, cif

    def _collect_fused_legacy(self, fpb: FusedPEBatch, ee, snz, cif
                              ) -> List[SamAlignment]:
        """Full host pairing from the per-slot export: pair candidates
        VECTORIZED, replay the -D effort model (fast path: any read whose
        per-phase candidate count fits under the streak limit attempts
        everything — the replay is only run for the rare reads that could
        actually give up), mate-rescue the rest, and emit.

        Semantics identical to align_batch_host (golden-tested); the
        per-pair Python cross-product loops of the legacy path
        (aligner_sw_driver.cpp:1680's per-read state machine analog) are
        replaced by (pairs, T, T) array classification."""
        from bowtie2_tpu.pipeline.pe import pe_classify_np
        from bowtie2_tpu.pipeline.pe_effort import (pe_streak_limit,
                                                    simulate_mate)
        import time as _time
        pol = self.pol
        B, Bp, B2, T, NC = fpb.B, fpb.Bp, fpb.B2, fpb.T, fpb.NC
        _t = _time.time()
        sf = np.asarray(fpb.res.slots)
        self.metrics.add(t_dp=_time.time() - _t)
        _t = _time.time()
        large = self._row_dtype == np.int64
        OCC = sf[0].astype(bool)
        AOK = sf[1].astype(bool)
        S = sf[2]
        OR = sf[3]
        RID = sf[4]
        LO = _u32pos(sf[5]) if large else sf[5].astype(np.int64)
        HI = _u32pos(sf[6]) if large else sf[6].astype(np.int64)
        RDEND = sf[7]
        EXACT = sf[8].astype(bool)
        HALF = sf[9].astype(bool)
        RANGEJ = sf[10]
        RWID = sf[11]
        CPOS = sf[12]
        MMUG = sf[13]
        ANCH = _u32pos(sf[14]) if large else sf[14].astype(np.int64)
        astart, ci_rid, ci_row, ci_lane, ci_score, ci_dplane = cif
        if large:
            astart = _u32pos(astart)

        pool = DPPool(G=fpb.G, Lmax=fpb.Lmax, n=NC,
                      win_start=astart.astype(np.int64),
                      rid=ci_rid.astype(np.int64),
                      scores=ci_score.astype(np.int64),
                      rows_end=ci_row, lanes_end=ci_lane,
                      dirs=fpb.res.dirs, jreads=fpb.res.jreads_c,
                      jquals=fpb.res.jquals_c, wins=fpb.res.wins,
                      dplane=ci_dplane)
        m = CPOS >= 0
        ci_or = np.zeros(NC, np.int64)
        ci_or[CPOS[m]] = OR[m]
        valid_ci = np.zeros(NC, bool)
        valid_ci[CPOS[m]] = AOK[m]
        cs = CandSet(B=B2, Lmax=fpb.Lmax, lens=fpb.lens, fw=fpb.fw,
                     qu=fpb.qu, rc=fpb.rc, qu_r=fpb.qu_r, minsc=fpb.minsc,
                     perfect=fpb.perfect, filtered=fpb.filtered, yf=fpb.yf,
                     n_cand=NC, cand_or=ci_or, rid=ci_rid.astype(np.int64),
                     valid=valid_ci,
                     end_pos=(astart + ci_lane).astype(np.int64), pool=pool)

        # ---- ranked representatives: dedupe by (orient, end) ----
        tj = np.arange(T)
        same = (OR[:, :, None] == OR[:, None, :]) & \
               (HI[:, :, None] == HI[:, None, :]) & \
               AOK[:, :, None] & AOK[:, None, :]
        bet = (S[:, None, :] > S[:, :, None]) | \
              ((S[:, None, :] == S[:, :, None]) &
               (tj[None, None, :] < tj[None, :, None]))
        rep = AOK & ~(same & bet).any(axis=2)
        rid_flat = np.repeat(np.arange(B2), T)
        order = np.lexsort((np.tile(tj, B2), (-S).reshape(-1),
                            (~rep).reshape(-1), rid_flat))
        ranked_slots = (order % T).reshape(B2, T)       # rank -> slot
        rankpos = np.empty((B2, T), np.int64)
        np.put_along_axis(rankpos, ranked_slots,
                          np.broadcast_to(tj, (B2, T)), axis=1)
        nrank = rep.sum(axis=1)

        # ---- concordant cross-products, vectorized (pairs, T, T) ----
        m1, m2 = slice(0, Bp), slice(Bp, B2)
        conc = (RID[m1][:, :, None] == RID[m2][:, None, :]) & \
            rep[m1][:, :, None] & rep[m2][:, None, :]
        from bowtie2_tpu.pipeline.pe import PE_DISCORD as _PED
        typ = pe_classify_np(
            pol.mate_fw_rc,
            LO[m1][:, :, None], HI[m1][:, :, None],
            (OR[m1] == 0)[:, :, None],
            LO[m2][:, None, :], HI[m2][:, None, :],
            (OR[m2] == 0)[:, None, :],
            pol.minins, pol.maxins, pol.olap_ok, pol.contain_ok, pol.dovetail_ok)
        conc &= typ != _PED
        SUCC = np.concatenate([conc.any(axis=2), conc.any(axis=1)], axis=0)

        # ---- seed-round suppression (zero-seed-round `break` quirk) ----
        # The reference's PE rounds loop searches the mates in matemap
        # order and `break`s out of the loop — skipping the OTHER mate's
        # seed instantiation AND search — when the current mate either
        # instantiates no N-free seeds (bt2_search.cpp:3948) or its
        # searchAllSeeds finds no SA ranges at all (:3968). With PE's
        # halved round count (ceil(R/2) = 1 under -R 2) the skipped mate
        # never gets a seed round, so it can only align via the exact /
        # 1mm up-front phases or mate rescue. -R 3 gives PE a round 1,
        # which is exactly why the residual class aligns under -R 3.
        inst = fpb.inst_read
        n1e, n2e = ee[:Bp], ee[Bp:]
        swap = (n1e > 0) & (n2e > 0) & (n1e > n2e)
        inst_first = np.where(swap, inst[Bp:], inst[:Bp])
        snz_first = np.where(swap, snz[Bp:], snz[:Bp])
        both_ok = ~fpb.filtered[:Bp] & ~fpb.filtered[Bp:]
        supp_pair = both_ok & ((inst_first == 0) | (snz_first == 0))
        suppress = np.concatenate([supp_pair, supp_pair])

        # under suppression only exact-sweep hits and 1mm-upfront-
        # discoverable half candidates (ungapped anchor-diagonal mm <= 1)
        # survive; a half+seed dual-source candidate with 2+ mismatches
        # exists only through the blocked seed phase
        half_ok = HALF & np.where(suppress[:, None], MMUG <= 1, True)
        for ri in np.nonzero(suppress)[0]:
            # full oneMmSearch discoverability for the rare suppressed
            # rows: segment containment + --local mismatch-position
            # legality (aligner_seed.cpp:1231-1263)
            for k in np.nonzero(OCC[ri] & half_ok[ri] & ~EXACT[ri])[0]:
                ori = int(OR[ri, k])
                codes = (fpb.rc if ori else fpb.fw)[ri]
                quals = (fpb.qu_r if ori else fpb.qu)[ri]
                if not self._mm1_upfront_ok(codes, quals,
                                            int(fpb.lens[ri]),
                                            int(ANCH[ri, k])):
                    half_ok[ri, k] = False

        # ---- -D fail-streak effort (pe_effort.py), vectorized fast path ----
        nex = (OCC & EXACT).sum(axis=1)
        nhf = (OCC & half_ok & ~EXACT).sum(axis=1)
        nsd = (OCC & ~EXACT & ~HALF).sum(axis=1)
        ATT = OCC & np.where(suppress[:, None], EXACT | half_ok, True)
        SUC = ATT & SUCC
        if not pol.all_hits:
            limit = pe_streak_limit(pol.fail_streak, pol.khits, True)
            fast = (nex <= limit) & (nhf <= limit) & \
                np.where(suppress, True, nsd <= limit)
            for ri in np.nonzero(~fast)[0]:
                ks = np.nonzero(OCC[ri])[0]
                exact_l = [int(k) for k in ks if EXACT[ri, k]]
                half_l = [int(k) for k in ks
                          if half_ok[ri, k] and not EXACT[ri, k]]
                seed_l = [] if suppress[ri] else \
                    [int(k) for k in ks
                     if not EXACT[ri, k] and not HALF[ri, k]]
                att, suc = simulate_mate(
                    [exact_l, half_l, seed_l], RANGEJ[ri], RWID[ri],
                    set(np.nonzero(SUCC[ri])[0].tolist()),
                    set(np.nonzero(AOK[ri])[0].tolist()), limit)
                ATT[ri] = False
                ATT[ri, list(att)] = True
                SUC[ri] = False
                SUC[ri, list(suc)] = True

        # ---- best concordant combo per pair ----
        keep = conc & (SUC[m1][:, :, None] | SUC[m2][:, None, :])
        SS = S[m1].astype(np.int64)[:, :, None] + \
            S[m2].astype(np.int64)[:, None, :]
        # ordering = legacy stable sort: score desc, then enumeration order
        # (mate-1 rank asc, mate-2 rank asc)
        key = (SS << 20) - (rankpos[m1][:, :, None] << 10) - \
            rankpos[m2][:, None, :]
        key = np.where(keep, key, np.int64(-(1 << 62)))
        flatk = key.reshape(Bp, T * T)
        bestflat = flatk.argmax(axis=1)
        arangeBp = np.arange(Bp)
        has = keep.reshape(Bp, -1).any(axis=1)
        best_s1 = bestflat // T
        best_s2 = bestflat % T
        best_ss = SS.reshape(Bp, -1)[arangeBp, bestflat]
        n_kept = keep.reshape(Bp, -1).sum(axis=1)
        flatk2 = flatk.copy()
        flatk2[arangeBp, bestflat] = -(1 << 62)
        secflat = flatk2.argmax(axis=1)
        sec_ss = SS.reshape(Bp, -1)[arangeBp, secflat]

        # ---- eff-ranked heads (rescue anchors / discordant / mixed) ----
        BIGR = 1 << 30
        att_rank = np.where(rep & ATT, rankpos, BIGR)
        first_rank = att_rank.min(axis=1)
        first_slot = att_rank.argmin(axis=1)
        has_l = first_rank < BIGR
        att_rank2 = att_rank.copy()
        att_rank2[np.arange(B2), first_slot] = BIGR
        sec_rank = att_rank2.min(axis=1)
        sec_slot = att_rank2.argmin(axis=1)
        has_l2 = sec_rank < BIGR
        nL = (rep & ATT).sum(axis=1)

        # ---- mate rescue DP for pairs without a concordant combo ----
        real = np.arange(B)
        rescue_specs = []
        for i in real[~has[:B]]:
            for mate, ri in ((0, i), (1, Bp + i)):
                if not has_l[ri]:
                    continue
                ak_s = first_slot[ri]
                wlo, whi, opp_fw = rescue_window(
                    pol.mate_fw_rc, int(LO[ri, ak_s]), int(HI[ri, ak_s]),
                    OR[ri, ak_s] == 0, mate == 0, pol.maxins)
                opp_ri = (Bp + i) if mate == 0 else i
                if fpb.filtered[opp_ri] or fpb.lens[opp_ri] == 0:
                    continue
                if has_l[opp_ri]:
                    # opposite mate already has a valid alignment: the
                    # reference does not rescue-replace it with a worse
                    # squeezed-into-the-fragment alignment (observed: its
                    # mate DP never yields a concordant pair in this
                    # situation — the r1105-class give-ups)
                    continue
                rescue_specs.append((int(i), ri, int(ak_s), opp_ri,
                                     0 if opp_fw else 1, wlo))
        rpool = None
        rtb = {}
        rconc = {}       # pair -> ("r", ak_ci, t, opp_ri, opp_or, rlo, rhi,
                         #          sc_sum)
        rdisc = {}       # pair -> same payload, rescue pair classified
                         # DISCORDANT: the reference still reports both
                         # mates as unpaired alignments (msink->report with
                         # one NULL side, aligner_sw_driver.cpp:2417-2445),
                         # so a unique anchor + unique rescued mate emit as
                         # a discordant pair at finishRead
        if rescue_specs:
            Lmax = fpb.Lmax
            Gr = max((pol.maxins + 32 - Lmax + 1) // 2,
                     pol.band_halfwidth(Lmax))
            r_read = np.array([s[3] for s in rescue_specs], np.int64)
            r_or = np.array([s[4] for s in rescue_specs], np.int64)
            r_wlo = np.array([s[5] for s in rescue_specs], np.int64)
            r_rid = np.searchsorted(
                self.data.ref_cum,
                np.array([int(LO[s[1], s[2]]) for s in rescue_specs]),
                side="right") - 1
            self.metrics.add(mate_dps=len(rescue_specs))
            rpool = self._run_dp(r_wlo, r_rid, r_read, r_or,
                                 fpb.jboth, fpb.jquals, fpb.lens,
                                 Gr, Lmax, len(rescue_specs),
                                 full_width=True)
            r_valid = rpool.scores >= fpb.minsc[r_read]
            rsel = np.nonzero(r_valid)[0].astype(np.int32)
            rtb = self._backtrace_sel(rpool, rsel)
            for t in rsel.tolist():
                (i, ari, ak_s, opp_ri, opp_or, _) = rescue_specs[t]
                if i in rconc:
                    continue
                rlo = int(rpool.win_start[t]) + rtb[t][1]["ref_start_win"]
                rhi = int(rpool.end_pos(np.array([t]))[0])
                alo, ahi = int(LO[ari, ak_s]), int(HI[ari, ak_s])
                afw = OR[ari, ak_s] == 0
                if opp_ri >= Bp:     # opposite is mate 2 → anchor is mate 1
                    typr = pe_classify(pol.mate_fw_rc, alo, ahi, afw,
                                       rlo, rhi, opp_or == 0,
                                       pol.minins, pol.maxins, pol.olap_ok, pol.contain_ok, pol.dovetail_ok)
                else:
                    typr = pe_classify(pol.mate_fw_rc, rlo, rhi,
                                       opp_or == 0, alo, ahi, afw,
                                       pol.minins, pol.maxins, pol.olap_ok, pol.contain_ok, pol.dovetail_ok)
                sc_sum = int(S[ari, ak_s]) + int(rpool.scores[t])
                payload = ("r", int(CPOS[ari, ak_s]), t, opp_ri,
                           opp_or, rlo, rhi, sc_sum, ari, int(ak_s))
                if typr != PE_DISCORD:
                    rconc[i] = payload
                elif i not in rdisc:
                    rdisc[i] = payload

        # ---- ranked combo list per pair (top-k; default k=1 keeps the
        # vectorized argmax result, no per-pair argsort) ----
        khits_pe = 10**9 if pol.all_hits else max(pol.khits, 1)
        combo_of = {}
        for i in real[has[:B]]:
            if khits_pe > 1 and n_kept[i] > 1:
                fl = flatk[i]
                kk = min(khits_pe, int(n_kept[i]))
                ordk = np.argsort(-fl, kind="stable")[:kk]
                combo_of[i] = [(int(o) // T, int(o) % T) for o in ordk]
            else:
                combo_of[i] = [(int(best_s1[i]), int(best_s2[i]))]

        # ---- emission backtrace of everything reported ----
        need = set()
        for i in real[has[:B]]:
            for s1c, s2c in combo_of[i]:
                need.add(int(CPOS[i, s1c]))
                need.add(int(CPOS[Bp + i, s2c]))
        for i, rc_ in list(rconc.items()) + list(rdisc.items()):
            need.add(rc_[1])
        for i in real:
            if has[i] or i in rconc:
                continue
            for ri in (i, Bp + i):
                if has_l[ri]:
                    need.add(int(CPOS[ri, first_slot[ri]]))
        sel = np.array(sorted(need), np.int32)
        tb_of = {}
        if sel.size and not pol.local:
            # host gapless fast path: candidates whose score equals the
            # pure-diagonal score synthesize CIGAR/MD from the host ref
            # words, skipping the device backtrace round trip
            cand_read = np.zeros(NC, np.int64)
            cand_read[CPOS[m]] = np.broadcast_to(
                np.arange(B2)[:, None], (B2, T))[m]
            ri_s = cand_read[sel]
            or_s = ci_or[sel]
            codes_sel = np.where((or_s == 0)[:, None],
                                 fpb.fw[ri_s], fpb.rc[ri_s])
            quals_sel = np.where((or_s == 0)[:, None],
                                 fpb.qu[ri_s], fpb.qu_r[ri_s])
            tb_of, sel = self._gapless_tb(
                pool, sel, codes_sel, quals_sel, fpb.lens[ri_s],
                cs.end_pos[sel])
            sel = np.asarray(sel, np.int32)
        if sel.size:
            tb_of.update(self._backtrace_sel(pool, sel))
        self.metrics.add(t_host=_time.time() - _t)
        _t = _time.time()

        # ---- per-pair emission ----
        st = AlignStats()
        out: List[SamAlignment] = []
        scores = pool.scores
        def _xs_for(ri, srep):
            """Best attempted alignment of mate ri EXCLUDING the reported
            slot (reference AlnSetSumm bestUnp1/2: XS is the best OTHER
            alignment, which may outscore the pair-chosen one)."""
            fs = int(first_slot[ri])
            if has_l[ri] and fs != srep:
                return int(S[ri, fs])
            ss = int(sec_slot[ri])
            if has_l2[ri] and ss != srep:
                return int(S[ri, ss])
            return None

        for i in range(B):
            rec1, rec2 = fpb.pairs[i]
            st.pairs += 1
            st.reads += 2
            emitted = False
            xs1 = _xs_for(i, int(first_slot[i]))
            xs2 = _xs_for(Bp + i, int(first_slot[Bp + i]))
            if has[i]:
                sec_sum = int(sec_ss[i]) if n_kept[i] > 1 else None
                kmode = pol.all_hits or pol.khits > 1
                rank0_ok = False
                # XS excludes the PRIMARY selection's coordinate and the
                # same value prints on every rank (selectByScore computes
                # bestUnchosenP1/2 once from select[0], aln_sink.cpp)
                s1_0, s2_0 = combo_of[i][0]
                xs1p = _xs_for(i, int(s1_0))
                xs2p = _xs_for(Bp + i, int(s2_0))
                for r, (s1, s2) in enumerate(combo_of[i]):
                    if r > 0 and not rank0_ok:
                        break
                    k1 = int(CPOS[i, s1])
                    k2 = int(CPOS[Bp + i, s2])
                    fmq = None
                    if kmode:
                        fmq = 255 if (r > 0 or sec_sum is None) else None
                    sc_sum_r = int(S[i, s1]) + int(S[Bp + i, s2])
                    ok = self._emit_pair(
                        st, out, cs, i, rec1, rec2,
                        (k1, pool, tb_of[k1], int(OR[i, s1]),
                         int(LO[i, s1]), int(HI[i, s1])),
                        (k2, pool, tb_of[k2], int(OR[Bp + i, s2]),
                         int(LO[Bp + i, s2]), int(HI[Bp + i, s2])),
                        sc_sum_r, sec_sum, "CP", True,
                        xs1=xs1p, xs2=xs2p,
                        secondary=r > 0, force_mq=fmq)
                    if r == 0:
                        rank0_ok = ok
                if rank0_ok:
                    if n_kept[i] > 1:
                        st.conc_multi += 1
                    else:
                        st.conc_one += 1
                    continue
                emitted = False
            elif i in rconc:
                (_, ak_ci, t, opp_ri, opp_or, rlo, rhi, sc_sum, ari,
                 ak_s) = rconc[i]
                if opp_ri >= Bp:
                    marg1 = (ak_ci, pool, tb_of[ak_ci], int(OR[ari, ak_s]),
                             int(LO[ari, ak_s]), int(HI[ari, ak_s]))
                    marg2 = (t, rpool, rtb[t], opp_or, rlo, rhi)
                else:
                    marg1 = (t, rpool, rtb[t], opp_or, rlo, rhi)
                    marg2 = (ak_ci, pool, tb_of[ak_ci], int(OR[ari, ak_s]),
                             int(LO[ari, ak_s]), int(HI[ari, ak_s]))
                kmode = pol.all_hits or pol.khits > 1
                ok = self._emit_pair(st, out, cs, i, rec1, rec2,
                                     marg1, marg2, sc_sum, None, "CP", True,
                                     xs1=xs1, xs2=xs2,
                                     force_mq=255 if kmode else None)
                if ok:
                    st.conc_one += 1
                    continue
            # discordant: both mates aligned uniquely (any reference)
            ri1, ri2 = i, Bp + i
            if not pol.no_discordant and nL[ri1] == 1 and nL[ri2] == 1:
                s1, s2 = int(first_slot[ri1]), int(first_slot[ri2])
                k1, k2 = int(CPOS[ri1, s1]), int(CPOS[ri2, s2])
                ok = self._emit_pair(
                    st, out, cs, i, rec1, rec2,
                    (k1, pool, tb_of[k1], int(OR[ri1, s1]),
                     int(LO[ri1, s1]), int(HI[ri1, s1])),
                    (k2, pool, tb_of[k2], int(OR[ri2, s2]),
                     int(LO[ri2, s2]), int(HI[ri2, s2])),
                    int(S[ri1, s1]) + int(S[ri2, s2]), None, "DP", False,
                    force_mq=255 if (pol.all_hits or pol.khits > 1)
                    else None)
                if ok:
                    st.disc += 1
                    continue
            # discordant with a rescue-found mate: the reference reports
            # rescue results as UNPAIRED alignments even when the rescued
            # pair is discordant (aligner_sw_driver.cpp:2417-2445), so a
            # unique anchor + a rescued opposite mate with no alignments
            # of its own pair up as YT:Z:DP at finishRead
            if not pol.no_discordant and i in rdisc:
                (_, ak_ci, t, opp_ri, opp_or, rlo, rhi, sc_sum, ari,
                 ak_s) = rdisc[i]
                if nL[ari] == 1 and nL[opp_ri] == 0:
                    aarg = (ak_ci, pool, tb_of[ak_ci], int(OR[ari, ak_s]),
                            int(LO[ari, ak_s]), int(HI[ari, ak_s]))
                    rarg = (t, rpool, rtb[t], opp_or, rlo, rhi)
                    marg1, marg2 = ((aarg, rarg) if opp_ri >= Bp
                                    else (rarg, aarg))
                    ok = self._emit_pair(
                        st, out, cs, i, rec1, rec2, marg1, marg2,
                        sc_sum, None, "DP", False,
                        force_mq=255 if (pol.all_hits or pol.khits > 1)
                        else None)
                    if ok:
                        st.disc += 1
                        continue
            # mixed / unaligned
            l1 = [int(CPOS[ri1, first_slot[ri1]])] if has_l[ri1] else []
            if has_l2[ri1]:
                l1.append(int(CPOS[ri1, sec_slot[ri1]]))
            l2 = [int(CPOS[ri2, first_slot[ri2]])] if has_l[ri2] else []
            if has_l2[ri2]:
                l2.append(int(CPOS[ri2, sec_slot[ri2]]))
            self._emit_mixed(st, out, cs, i, rec1, rec2, l1, l2, tb_of)
        self._merge_stats(st)
        self.metrics.add(t_host=_time.time() - _t)
        return out

    def _pe_fast_prep(self, fpb: FusedPEBatch, rf, pf, cif):
        """Shared decode + rescue for the fast path: unpack the device
        pairing decisions, reconstruct the DP pool and run mate-rescue DP
        for conc-less pairs. Returns a namespace consumed by the object
        (_collect_fused_fast) and native-line (_collect_fused_fast_raw)
        emitters."""
        from types import SimpleNamespace
        pol = self.pol
        B, Bp, B2, T, NC = fpb.B, fpb.Bp, fpb.B2, fpb.T, fpb.NC
        large = self._row_dtype == np.int64
        (r_fc, r_fo, r_flo32, r_fhi32, r_fs, r_hasl,
         r_sc, r_ss, r_hasl2, r_nl) = rf
        r_flo = _u32pos(r_flo32) if large else r_flo32.astype(np.int64)
        r_fhi = _u32pos(r_fhi32) if large else r_fhi32.astype(np.int64)
        (p_has, b1c, b1o, b1lo32, b1hi32, b1s,
         b2c, b2o, b2lo32, b2hi32, b2s, p_bss, p_sss, p_nk, _hn) = pf
        b1lo = _u32pos(b1lo32) if large else b1lo32.astype(np.int64)
        b1hi = _u32pos(b1hi32) if large else b1hi32.astype(np.int64)
        b2lo = _u32pos(b2lo32) if large else b2lo32.astype(np.int64)
        b2hi = _u32pos(b2hi32) if large else b2hi32.astype(np.int64)
        astart, ci_rid, ci_row, ci_lane, ci_score, ci_dplane = cif
        if large:
            astart = _u32pos(astart)

        pool = DPPool(G=fpb.G, Lmax=fpb.Lmax, n=NC,
                      win_start=astart.astype(np.int64),
                      rid=ci_rid.astype(np.int64),
                      scores=ci_score.astype(np.int64),
                      rows_end=ci_row, lanes_end=ci_lane,
                      dirs=fpb.res.dirs, jreads=fpb.res.jreads_c,
                      jquals=fpb.res.jquals_c, wins=fpb.res.wins,
                      dplane=ci_dplane)
        # sparse candidate attributes (only emitted candidates are read)
        ci_or = np.zeros(NC, np.int64)
        cand_read = np.zeros(NC, np.int64)
        mm = (r_fc >= 0) & (r_hasl != 0)
        ci_or[r_fc[mm]] = r_fo[mm]
        cand_read[r_fc[mm]] = np.arange(B2)[mm]
        mb = (b1c >= 0) & (p_has != 0)
        ci_or[b1c[mb]] = b1o[mb]
        cand_read[b1c[mb]] = np.arange(Bp)[mb]
        mb = (b2c >= 0) & (p_has != 0)
        ci_or[b2c[mb]] = b2o[mb]
        cand_read[b2c[mb]] = Bp + np.arange(Bp)[mb]
        cs = CandSet(B=B2, Lmax=fpb.Lmax, lens=fpb.lens, fw=fpb.fw,
                     qu=fpb.qu, rc=fpb.rc, qu_r=fpb.qu_r, minsc=fpb.minsc,
                     perfect=fpb.perfect, filtered=fpb.filtered, yf=fpb.yf,
                     n_cand=NC, cand_or=ci_or, rid=ci_rid.astype(np.int64),
                     valid=np.zeros(NC, bool),
                     end_pos=(astart + ci_lane).astype(np.int64), pool=pool)

        has = p_has.astype(bool)
        real = np.arange(B)

        # ---- mate rescue DP for pairs without a concordant combo ----
        rescue_specs = []
        for i in real[~has[:B]]:
            for mate, ri in ((0, i), (1, Bp + i)):
                if not r_hasl[ri]:
                    continue
                wlo, whi, opp_fw = rescue_window(
                    pol.mate_fw_rc, int(r_flo[ri]), int(r_fhi[ri]),
                    r_fo[ri] == 0, mate == 0, pol.maxins)
                opp_ri = (Bp + i) if mate == 0 else i
                if fpb.filtered[opp_ri] or fpb.lens[opp_ri] == 0:
                    continue
                if r_hasl[opp_ri]:
                    # opposite mate already has a valid alignment: the
                    # reference never rescue-replaces it (r1105 class)
                    continue
                rescue_specs.append((int(i), ri, opp_ri,
                                     0 if opp_fw else 1, wlo))
        rpool = None
        rtb = {}
        rconc = {}
        rdisc = {}
        if rescue_specs:
            Lmax = fpb.Lmax
            Gr = max((pol.maxins + 32 - Lmax + 1) // 2,
                     pol.band_halfwidth(Lmax))
            r_read = np.array([s[2] for s in rescue_specs], np.int64)
            r_or = np.array([s[3] for s in rescue_specs], np.int64)
            r_wlo = np.array([s[4] for s in rescue_specs], np.int64)
            r_rid = np.searchsorted(
                self.data.ref_cum,
                np.array([int(r_flo[s[1]]) for s in rescue_specs]),
                side="right") - 1
            self.metrics.add(mate_dps=len(rescue_specs))
            rpool = self._run_dp(r_wlo, r_rid, r_read, r_or,
                                 fpb.jboth, fpb.jquals, fpb.lens,
                                 Gr, Lmax, len(rescue_specs),
                                 full_width=True)
            r_valid = rpool.scores >= fpb.minsc[r_read]
            rsel = np.nonzero(r_valid)[0].astype(np.int32)
            rtb = self._backtrace_sel(rpool, rsel)
            for t in rsel.tolist():
                (i, ari, opp_ri, opp_or, _) = rescue_specs[t]
                if i in rconc:
                    continue
                rlo = int(rpool.win_start[t]) + rtb[t][1]["ref_start_win"]
                rhi = int(rpool.end_pos(np.array([t]))[0])
                alo, ahi = int(r_flo[ari]), int(r_fhi[ari])
                afw = r_fo[ari] == 0
                if opp_ri >= Bp:     # opposite is mate 2 → anchor is mate 1
                    typr = pe_classify(pol.mate_fw_rc, alo, ahi, afw,
                                       rlo, rhi, opp_or == 0,
                                       pol.minins, pol.maxins, pol.olap_ok,
                                       pol.contain_ok, pol.dovetail_ok)
                else:
                    typr = pe_classify(pol.mate_fw_rc, rlo, rhi,
                                       opp_or == 0, alo, ahi, afw,
                                       pol.minins, pol.maxins, pol.olap_ok,
                                       pol.contain_ok, pol.dovetail_ok)
                sc_sum = int(r_fs[ari]) + int(rpool.scores[t])
                payload = ("r", int(r_fc[ari]), t, opp_ri, opp_or, rlo, rhi,
                           sc_sum, ari)
                if typr != PE_DISCORD:
                    rconc[i] = payload
                elif i not in rdisc:
                    rdisc[i] = payload

        return SimpleNamespace(
            fpb=fpb, pool=pool, cs=cs, cand_read=cand_read, ci_or=ci_or,
            has=has, real=real, rpool=rpool, rtb=rtb, rconc=rconc,
            rdisc=rdisc, r_fc=r_fc, r_fo=r_fo, r_flo=r_flo, r_fhi=r_fhi,
            r_fs=r_fs, r_hasl=r_hasl, r_sc=r_sc, r_ss=r_ss,
            r_hasl2=r_hasl2, r_nl=r_nl, b1c=b1c, b1o=b1o, b1lo=b1lo,
            b1hi=b1hi, b1s=b1s, b2c=b2c, b2o=b2o, b2lo=b2lo, b2hi=b2hi,
            b2s=b2s, p_sss=p_sss, p_nk=p_nk)

    def _xs_fast(self, ns, ri, srep_cpos):
        """Best attempted alignment of mate ri EXCLUDING the reported
        candidate (reference AlnSetSumm bestUnp1/2)."""
        if ns.r_hasl[ri] and int(ns.r_fc[ri]) != srep_cpos:
            return int(ns.r_fs[ri])
        if ns.r_hasl2[ri] and int(ns.r_sc[ri]) != srep_cpos:
            return int(ns.r_ss[ri])
        return None

    def _emit_fast_pair(self, ns, i, st, out, tb_of):
        """Emit one pair from the device decisions (object records).
        Mirrors _collect_fused_legacy's default-mode emission order."""
        fpb = ns.fpb
        pol = self.pol
        Bp = fpb.Bp
        pool, cs, rpool, rtb = ns.pool, ns.cs, ns.rpool, ns.rtb
        rec1, rec2 = fpb.pairs[i]
        st.pairs += 1
        st.reads += 2
        ri1, ri2 = i, Bp + i
        xs1 = self._xs_fast(ns, ri1, int(ns.r_fc[ri1]))
        xs2 = self._xs_fast(ns, ri2, int(ns.r_fc[ri2]))
        if ns.has[i]:
            sec_sum = int(ns.p_sss[i]) if ns.p_nk[i] > 1 else None
            k1, k2 = int(ns.b1c[i]), int(ns.b2c[i])
            ok = self._emit_pair(
                st, out, cs, i, rec1, rec2,
                (k1, pool, tb_of[k1], int(ns.b1o[i]),
                 int(ns.b1lo[i]), int(ns.b1hi[i])),
                (k2, pool, tb_of[k2], int(ns.b2o[i]),
                 int(ns.b2lo[i]), int(ns.b2hi[i])),
                int(ns.b1s[i]) + int(ns.b2s[i]), sec_sum, "CP", True,
                xs1=self._xs_fast(ns, ri1, k1),
                xs2=self._xs_fast(ns, ri2, k2))
            if ok:
                if ns.p_nk[i] > 1:
                    st.conc_multi += 1
                else:
                    st.conc_one += 1
                return
        elif i in ns.rconc:
            (_, ak_ci, t, opp_ri, opp_or, rlo, rhi, sc_sum,
             ari) = ns.rconc[i]
            aarg = (ak_ci, pool, tb_of[ak_ci], int(ns.r_fo[ari]),
                    int(ns.r_flo[ari]), int(ns.r_fhi[ari]))
            rarg = (t, rpool, rtb[t], opp_or, rlo, rhi)
            marg1, marg2 = ((aarg, rarg) if opp_ri >= Bp
                            else (rarg, aarg))
            ok = self._emit_pair(st, out, cs, i, rec1, rec2,
                                 marg1, marg2, sc_sum, None, "CP", True,
                                 xs1=xs1, xs2=xs2)
            if ok:
                st.conc_one += 1
                return
        # discordant: both mates aligned uniquely (any reference)
        if not pol.no_discordant and ns.r_nl[ri1] == 1 and ns.r_nl[ri2] == 1:
            k1, k2 = int(ns.r_fc[ri1]), int(ns.r_fc[ri2])
            ok = self._emit_pair(
                st, out, cs, i, rec1, rec2,
                (k1, pool, tb_of[k1], int(ns.r_fo[ri1]),
                 int(ns.r_flo[ri1]), int(ns.r_fhi[ri1])),
                (k2, pool, tb_of[k2], int(ns.r_fo[ri2]),
                 int(ns.r_flo[ri2]), int(ns.r_fhi[ri2])),
                int(ns.r_fs[ri1]) + int(ns.r_fs[ri2]), None, "DP", False)
            if ok:
                st.disc += 1
                return
        # discordant with a rescue-found mate (YT:Z:DP at finishRead)
        if not pol.no_discordant and i in ns.rdisc:
            (_, ak_ci, t, opp_ri, opp_or, rlo, rhi, sc_sum,
             ari) = ns.rdisc[i]
            if ns.r_nl[ari] == 1 and ns.r_nl[opp_ri] == 0:
                aarg = (ak_ci, pool, tb_of[ak_ci], int(ns.r_fo[ari]),
                        int(ns.r_flo[ari]), int(ns.r_fhi[ari]))
                rarg = (t, rpool, rtb[t], opp_or, rlo, rhi)
                marg1, marg2 = ((aarg, rarg) if opp_ri >= Bp
                                else (rarg, aarg))
                ok = self._emit_pair(
                    st, out, cs, i, rec1, rec2, marg1, marg2,
                    sc_sum, None, "DP", False)
                if ok:
                    st.disc += 1
                    return
        # mixed / unaligned
        l1 = [int(ns.r_fc[ri1])] if ns.r_hasl[ri1] else []
        if ns.r_hasl2[ri1]:
            l1.append(int(ns.r_sc[ri1]))
        l2 = [int(ns.r_fc[ri2])] if ns.r_hasl[ri2] else []
        if ns.r_hasl2[ri2]:
            l2.append(int(ns.r_sc[ri2]))
        self._emit_mixed(st, out, cs, i, rec1, rec2, l1, l2, tb_of)

    def _fast_need(self, ns, pairs_iter):
        """Emission-backtrace candidate set for the given pairs."""
        need = set()
        Bp = ns.fpb.Bp
        for i in pairs_iter:
            if ns.has[i]:
                need.add(int(ns.b1c[i]))
                need.add(int(ns.b2c[i]))
                continue
            if i in ns.rconc:
                need.add(ns.rconc[i][1])
                continue
            if i in ns.rdisc:
                need.add(ns.rdisc[i][1])
            for ri in (i, Bp + i):
                if ns.r_hasl[ri]:
                    need.add(int(ns.r_fc[ri]))
        return need

    def _fast_tb(self, ns, need):
        """tb dict for the `need` candidates (gapless host synthesis +
        device backtrace for the rest)."""
        fpb, pool, cs = ns.fpb, ns.pool, ns.cs
        sel = np.array(sorted(need), np.int32)
        tb_of = {}
        if sel.size and not self.pol.local:
            ri_s = ns.cand_read[sel]
            or_s = ns.ci_or[sel]
            codes_sel = np.where((or_s == 0)[:, None],
                                 fpb.fw[ri_s], fpb.rc[ri_s])
            quals_sel = np.where((or_s == 0)[:, None],
                                 fpb.qu[ri_s], fpb.qu_r[ri_s])
            tb_of, sel = self._gapless_tb(
                pool, sel, codes_sel, quals_sel, fpb.lens[ri_s],
                cs.end_pos[sel])
            sel = np.asarray(sel, np.int32)
        if sel.size:
            tb_of.update(self._backtrace_sel(pool, sel))
        return tb_of

    def _collect_fused_fast(self, fpb: FusedPEBatch, rf, pf, cif
                            ) -> List[SamAlignment]:
        """Emit straight from the device pairing decisions (the common
        path): per-pair best concordant combo + per-read eff-ranked heads
        arrive in the compact blob, so the host only runs mate-rescue DP
        for conc-less pairs, the emission backtrace, and record building.
        Byte-identical to _collect_fused_legacy (same decision math,
        mirrored on device in ops/fused.py _pe_pairing; cross-checked by
        tests/test_pe_devpair.py and the golden corpora)."""
        import time as _time
        _t = _time.time()
        ns = self._pe_fast_prep(fpb, rf, pf, cif)
        tb_of = self._fast_tb(ns, self._fast_need(ns, range(fpb.B)))
        self.metrics.add(t_host=_time.time() - _t)
        _t = _time.time()
        st = AlignStats()
        out: List[SamAlignment] = []
        for i in range(fpb.B):
            self._emit_fast_pair(ns, i, st, out, tb_of)
        self._merge_stats(st)
        self.metrics.add(t_host=_time.time() - _t)
        return out

    def _collect_fused_fast_raw(self, fpb: FusedPEBatch, rf, pf, cif,
                                suffix: bytes
                                ) -> List[List[Tuple[int, bytes]]]:
        """_collect_fused_fast, emitting finished SAM line bytes via the
        native PE line builder (native/samemit.c sam_tails_pe): concordant
        pairs — the overwhelming majority — are built fully VECTORIZED
        (flags/positions/TLEN/XS as arrays, CIGAR/MD decoded in C from
        device-backtrace or host-synthesized gapless op columns); only
        rescue/discordant/mixed pairs and score-check failures take the
        per-pair object path. Returns one [(flag, line bytes)] group per
        pair."""
        import time as _time
        from bowtie2_tpu.native.samemit import (RefNameTable, XS_OMIT,
                                                sam_tails_pe_batch)
        pol = self.pol
        _t = _time.time()
        B, Bp = fpb.B, fpb.Bp
        ns = self._pe_fast_prep(fpb, rf, pf, cif)
        pool = ns.pool

        # ---- candidate decode: gapless synthesis + device backtrace ----
        vec0 = ns.real[ns.has[:B]]                    # candidate vec pairs
        need_vec = set()
        for i in vec0:
            need_vec.add(int(ns.b1c[i]))
            need_vec.add(int(ns.b2c[i]))
        sel = np.array(sorted(need_vec), np.int32)
        nsel = sel.size
        selidx = {int(k): t for t, k in enumerate(sel.tolist())}
        # per-candidate scalar fields, filled from both sources
        c_rdstart = np.zeros(nsel, np.int32)
        c_refwin = np.zeros(nsel, np.int64)
        c_nmm = np.zeros(nsel, np.int32)
        c_ngo = np.zeros(nsel, np.int32)
        c_ngc = np.zeros(nsel, np.int32)
        c_nrefn = np.zeros(nsel, np.int32)
        c_scchk = np.full(nsel, -(1 << 60), np.int64)
        Lsel = fpb.lens[ns.cand_read[sel]] if nsel else np.zeros(0, np.int64)
        or_s = ns.ci_or[sel]
        ri_s = ns.cand_read[sel]
        codes_sel = np.where((or_s == 0)[:, None],
                             fpb.fw[ri_s], fpb.rc[ri_s]) \
            if nsel else np.zeros((0, fpb.Lmax), np.int8)
        ops_cols = np.full(nsel, 0, np.int32)
        S_walk = 1
        ops_mat = np.zeros((1, max(nsel, 1)), np.uint8)
        if nsel:
            quals_sel = np.where((or_s == 0)[:, None],
                                 fpb.qu[ri_s], fpb.qu_r[ri_s])
            if not pol.local:
                okg, ops_syn, refwin_g, nmm_g, nrefn_g = self._gapless_tb_raw(
                    pool, sel, codes_sel, quals_sel, Lsel,
                    ns.cs.end_pos[sel])
            else:
                okg = np.zeros(nsel, bool)
            walk_sel = sel[~okg]
            tbw = {}
            if walk_sel.size:
                tbw = self._backtrace_sel(pool, walk_sel)
            # assemble a single (S, nsel) op matrix: gapless columns from
            # the host synthesis, walked columns from the device output
            S_walk = max((v[0].shape[0] for v in tbw.values()), default=1)
            S_walk = max(S_walk, fpb.Lmax)
            ops_mat = np.full((S_walk, nsel), 3, np.uint8)   # OP_NONE
            if okg.any():
                gi = np.nonzero(okg)[0]
                ops_mat[:ops_syn.shape[1], gi] = ops_syn[gi].T
                c_refwin[gi] = refwin_g[gi]
                c_nmm[gi] = nmm_g[gi]
                c_nrefn[gi] = nrefn_g[gi]
                c_scchk[gi] = pool.scores[sel[gi]]
            for k, (opcol, sc) in tbw.items():
                t = selidx[k]
                ops_mat[:opcol.shape[0], t] = opcol
                c_rdstart[t] = sc["read_start"]
                c_refwin[t] = sc["ref_start_win"]
                c_nmm[t] = sc["n_mm"]
                c_ngo[t] = sc["n_go"]
                c_ngc[t] = sc["n_gc"]
                c_nrefn[t] = sc["n_refn"]
                c_scchk[t] = sc["score_check"]
            ops_cols = np.arange(nsel, dtype=np.int32)

        # vec pairs must pass the score-check net on BOTH mates
        if nsel:
            t1 = np.array([selidx[int(ns.b1c[i])] for i in vec0], np.int64)
            t2 = np.array([selidx[int(ns.b2c[i])] for i in vec0], np.int64)
            chk = (c_scchk[t1] == pool.scores[ns.b1c[vec0]]) & \
                  (c_scchk[t2] == pool.scores[ns.b2c[vec0]])
            vec = vec0[chk]
            t1, t2 = t1[chk], t2[chk]
        else:
            vec = vec0
            t1 = t2 = np.zeros(0, np.int64)
        vec_mask = np.zeros(B, bool)
        vec_mask[vec] = True
        nv = vec.size

        # ---- vectorized record fields for the vec pairs (2 records each,
        # mate 1 at even rows) ----
        if nv:
            ri1, ri2 = vec, Bp + vec
            k1, k2 = ns.b1c[vec], ns.b2c[vec]
            o1, o2 = ns.b1o[vec], ns.b2o[vec]
            L1 = fpb.lens[ri1]
            L2 = fpb.lens[ri2]
            s1 = ns.b1s[vec].astype(np.int64)
            s2 = ns.b2s[vec].astype(np.int64)
            rid1 = pool.rid[k1]
            rid2 = pool.rid[k2]
            lo1, hi1 = ns.b1lo[vec], ns.b1hi[vec]
            lo2, hi2 = ns.b2lo[vec], ns.b2hi[vec]
            rdend1 = pool.rows_end[k1] + 1
            rdend2 = pool.rows_end[k2] + 1
            # TLEN from soft-clip-extended extents (aligner_result.h:1311)
            if pol.sc_unmapped_tlen:
                xl1, xh1, xl2, xh2 = lo1, hi1, lo2, hi2
            else:
                xl1 = lo1 - c_rdstart[t1]
                xh1 = hi1 + (L1 - rdend1)
                xl2 = lo2 - c_rdstart[t2]
                xh2 = hi2 + (L2 - rdend2)
            frag = np.maximum(xh1, xh2) - np.minimum(xl1, xl2) + 1
            fw1 = o1 == 0
            m1_up = np.where(xl1 == xl2, fw1, xl1 < xl2)
            tlen1 = np.where(m1_up, frag, -frag)
            cross = rid1 != rid2
            tlen1 = np.where(cross, 0, tlen1)
            # POS from the backtrace/gapless ref start (mirrors
            # _emit_aligned); PNEXT from the device LO export (mirrors
            # _emit_pair — track_origin keeps the two identical)
            pos1 = (pool.win_start[k1] + c_refwin[t1]
                    - self.data.ref_cum[rid1] + 1).astype(np.int64)
            pos2 = (pool.win_start[k2] + c_refwin[t2]
                    - self.data.ref_cum[rid2] + 1).astype(np.int64)
            pn1 = (lo1 - self.data.ref_cum[rid1] + 1).astype(np.int64)
            pn2 = (lo2 - self.data.ref_cum[rid2] + 1).astype(np.int64)
            # paired MAPQ (scalar decision table; cheap per pair)
            sec_sum = np.where(ns.p_nk[vec] > 1, ns.p_sss[vec], 0)
            has_sec = ns.p_nk[vec] > 1
            minsum = (fpb.minsc[ri1] + fpb.minsc[ri2]).astype(np.int64)
            persum = (fpb.perfect[ri1] + fpb.perfect[ri2]).astype(np.int64) \
                if pol.local else np.zeros(nv, np.int64)
            mq = np.empty(nv, np.int32)
            for t in range(nv):
                mq[t] = self._mapq(
                    int(s1[t] + s2[t]),
                    int(sec_sum[t]) if has_sec[t] else None,
                    int(persum[t]), int(minsum[t]), paired=True)
            # per-mate XS (vectorized _xs_fast)
            def _xs_vec(ri, k):
                first_other = (ns.r_hasl[ri] != 0) & (ns.r_fc[ri] != k)
                sec_other = (ns.r_hasl2[ri] != 0) & (ns.r_sc[ri] != k)
                return np.where(first_other, ns.r_fs[ri],
                                np.where(sec_other, ns.r_ss[ri], XS_OMIT))
            xs1 = _xs_vec(ri1, k1)
            xs2 = _xs_vec(ri2, k2)
            FP = FLAG_PAIRED | FLAG_PROPER
            flag1 = FP | FLAG_MATE1 | np.where(o1 != 0, FLAG_REVERSE, 0) \
                | np.where(o2 != 0, FLAG_MATE_REVERSE, 0)
            flag2 = FP | FLAG_MATE2 | np.where(o2 != 0, FLAG_REVERSE, 0) \
                | np.where(o1 != 0, FLAG_MATE_REVERSE, 0)

            def ilv(a1, a2, dt=np.int32):
                o = np.empty(2 * nv, dt)
                o[0::2] = a1
                o[1::2] = a2
                return o

            nrec = 2 * nv
            mode = np.ones(nrec, np.int8)
            flag = ilv(flag1, flag2)
            rname_i = ilv(rid1, rid2)
            posr = ilv(pos1, pos2)
            mapq = ilv(mq, mq)
            rnext_i = ilv(np.where(cross, rid2, -2),
                          np.where(cross, rid1, -2))
            pnext = ilv(pn2, pn1)
            tlen = ilv(tlen1, -tlen1)
            tlen[0::2][cross] = 0
            tlen[1::2][cross] = 0
            opt_as = ilv(s1, s2)
            opt_xs = ilv(xs1, xs2)
            xn = ilv(c_nrefn[t1], c_nrefn[t2])
            xm = ilv(c_nmm[t1], c_nmm[t2])
            xo = ilv(c_ngo[t1], c_ngo[t2])
            xg = ilv(c_ngc[t1], c_ngc[t2])
            ys = ilv(s2, s1)
            yt = np.ones(nrec, np.int8)                 # CP
            tsel = ilv(t1, t2, np.int64)
            codes_r = codes_sel[tsel]
            quals_r = quals_sel[tsel]
            rdlen = ilv(L1, L2)
            rdstart = c_rdstart[tsel]
            rdend = ilv(rdend1, rdend2)
            bound = (rdend - rdstart) + xg + 1
            if self._names_tab is None:
                self._names_tab = RefNameTable(self.data.ref_names)
            tails = sam_tails_pe_batch(
                mode, flag, rname_i, posr, mapq, rnext_i, pnext, tlen,
                opt_as, opt_xs, xn, xm, xo, xg, ys, yt,
                codes_r, quals_r, rdlen,
                ops_mat, ops_cols[tsel], rdstart, rdend, bound,
                self._names_tab, suffix, xeq=pol.xeq)

        # ---- stats for vec pairs + object path for the rest ----
        st = AlignStats()
        st.pairs += nv
        st.reads += 2 * nv
        multi = ns.p_nk[vec] > 1 if nv else np.zeros(0, bool)
        st.conc_multi += int(multi.sum())
        st.conc_one += int(nv - multi.sum())

        rest = [i for i in range(B) if not vec_mask[i]]
        groups: List[List[Tuple[int, bytes]]] = [None] * B
        if nv:
            for t, i in enumerate(vec.tolist()):
                nm = fpb.pairs[i][0].name.encode()
                nm2 = fpb.pairs[i][1].name.encode()
                tg1 = getattr(fpb.pairs[i][0], "tags", None)
                tg2 = getattr(fpb.pairs[i][1], "tags", None)
                l1 = nm + tails[2 * t] + (tg1.encode() if tg1 else b"")
                l2 = nm2 + tails[2 * t + 1] + (tg2.encode() if tg2 else b"")
                groups[i] = [(int(flag[2 * t]), l1),
                             (int(flag[2 * t + 1]), l2)]
        if rest:
            tb_of = self._fast_tb(ns, self._fast_need(ns, rest))
            for i in rest:
                out: List[SamAlignment] = []
                self._emit_fast_pair(ns, i, st, out, tb_of)
                groups[i] = [(r.flag, r.line().encode() + suffix)
                             for r in out]
        self._merge_stats(st)
        self.metrics.add(t_host=_time.time() - _t)
        return groups

    # ------------------------------------------------------------------
    def _mm1_upfront_ok(self, codes: np.ndarray, quals: np.ndarray,
                        L: int, g0: int) -> bool:
        """Would the reference's 1mm-upfront phase discover the implied
        end-to-end <=1-mismatch hit at global diagonal start g0?

        oneMmSearch (aligner_seed.cpp:975) runs over the N-excised joined
        text, so the hit must fit one non-N segment of one reference; it
        bails for reads with >1 Ns; and in --local mode a hit is legal
        only if the running score stays positive through the mismatch
        from BOTH read ends and the e2e score clears minsc
        (aligner_seed.cpp:1231-1263) — which is why e.g. a last-base
        mismatch is NOT a local 1mm hit (a legal local alignment clips
        it instead). codes/quals are the aligned-orientation row."""
        pol = self.pol
        g0 = int(g0)
        if g0 < 0 or g0 + L > int(self.data.ref_cum[-1]):
            return False
        segs = self.data.seg_global_start
        si = int(np.searchsorted(segs, g0, side="right")) - 1
        if si < 0 or g0 + L > int(segs[si] + self.data.seg_len[si]):
            return False
        rw = self.data.ref_words
        gp = np.arange(g0, g0 + L)
        ref = ((rw[gp >> 4] >> (2 * (gp & 15))) & 3).astype(np.int64)
        rd = codes[:L].astype(np.int64)
        mism = (rd != ref) | (rd >= 4)
        idx = np.nonzero(mism)[0]
        if idx.size == 0:
            return True
        if idx.size > 1 or int((rd >= 4).sum()) > 1:
            return False
        p = int(idx[0])
        if rd[p] >= 4:
            pen = -pol.n_pen
        else:
            lo = pol.mm_pen_max if pol.ignore_quals else pol.mm_pen_min
            pen = -(lo + (min(int(quals[p]), 40)
                          * (pol.mm_pen_max - lo)) // 40)
        if not pol.local:
            return True
        ma = pol.match_bonus
        if p * ma + pen <= 0 or (L - 1 - p) * ma + pen <= 0:
            return False
        return (L - 1) * ma + pen >= pol.min_score(L)

    # ------------------------------------------------------------------
    def _pe_effort_sets(self, cs: CandSet, succ_cross: set,
                        suppress_seeds: np.ndarray = None):
        """Per-mate (attempted, successful) candidate sets under the
        reference's -D fail-streak schedule (pipeline/pe_effort.py).

        suppress_seeds[ri]: drop the read's SEED-phase candidates — models
        the reference's round loop `break` when the first mate (fewer
        exact hits) instantiates zero N-free seeds, which skips the other
        mate's seed search for the round (bt2_search.cpp:3948-3952); with
        PE's halved round count (1) that means no seed search at all."""
        from bowtie2_tpu.pipeline.pe_effort import (pe_streak_limit,
                                                    simulate_mate)
        pol = self.pol
        n2 = len(cs.lens)
        eff = {}
        by_read: Dict[int, List[int]] = {}
        for k in range(cs.n_cand):
            by_read.setdefault(int(cs.cand_read[k]), []).append(k)
        if pol.all_hits:
            # -a: no effort limits (bt2_search.cpp:3458-3462)
            for ri in range(n2):
                ks = set(by_read.get(ri, []))
                eff[ri] = (ks, ks & succ_cross)
            return eff
        limit = pe_streak_limit(pol.fail_streak, pol.khits, True)
        for ri in range(n2):
            ks = by_read.get(ri, [])
            if not ks:
                eff[ri] = (set(), set())
                continue
            exact = [k for k in ks if cs.cand_exact[k]]
            if suppress_seeds is not None and suppress_seeds[ri]:
                # only 1mm-upfront-discoverable half candidates survive a
                # suppressed seed round (ungapped anchor mm <= 1 + the full
                # oneMmSearch segment/--local legality rules); the rest
                # exist only through the blocked seed phase
                halfp = [k for k in ks
                         if cs.cand_half[k] and not cs.cand_exact[k]
                         and cs.pool.mm_ug[k] <= 1
                         and self._mm1_upfront_ok(
                             (cs.rc if cs.cand_or[k] else cs.fw)[ri],
                             (cs.qu_r if cs.cand_or[k] else cs.qu)[ri],
                             int(cs.lens[ri]), int(cs.anchor[k]))]
                seedp = []
            else:
                halfp = [k for k in ks
                         if cs.cand_half[k] and not cs.cand_exact[k]]
                seedp = [k for k in ks
                         if not cs.cand_exact[k] and not cs.cand_half[k]]
            anchor_ok = {k for k in ks if cs.valid[k]}
            eff[ri] = simulate_mate([exact, halfp, seedp], cs.cand_rangej,
                                    cs.cand_rwidth, succ_cross, anchor_ok,
                                    limit)
        return eff

    def _emit_pair(self, st, out, cs, i, rec1, rec2, m1, m2, sc_sum,
                   sec_sum, yt, proper, xs1=None, xs2=None,
                   secondary=False, force_mq=None) -> bool:
        """Emit both mates of a concordant/discordant pair. Returns False if
        a backtrace consistency check failed (caller falls through).

        xs1/xs2: per-mate XS:i (second-best distinct alignment of THAT mate
        among everything found for it, reference AlnSetSumm bestUnp2 —
        emitted on CP/DP records too, not just unpaired ones). secondary
        sets 0x100; force_mq overrides the computed MAPQ (k-mode
        conventions, unique.h:202: secondaries 255, primary real only when
        a second-best pair exists)."""
        pol = self.pol
        (k1, p1, t1, o1, lo1, hi1) = m1
        (k2, p2, t2, o2, lo2, hi2) = m2
        B = len(cs.lens) // 2
        L1 = int(cs.lens[i])
        L2 = int(cs.lens[B + i])
        s1 = int(p1.scores[k1])
        s2 = int(p2.scores[k2])
        # paired MAPQ: summed scores vs summed minima (unique.h paired path)
        minsum = int(cs.minsc[i] + cs.minsc[B + i])
        persum = int(cs.perfect[i] + cs.perfect[B + i]) if pol.local else 0
        mq = force_mq if force_mq is not None else \
            self._mapq(sc_sum, sec_sum, persum, minsum, paired=True)

        # TLEN: soft-clip-EXTENDED extents (reference getExtendedCoords /
        # setFragmentLength, aligner_result.h:1311-1341) — clipped bases
        # count toward the fragment; sign: upstream mate positive, ties
        # broken by strand (fw over rc) and mate-1 for --ff. Classification
        # above used the plain extents (aligner_sw_driver.cpp:2382
        # refExtent), matching the reference.
        if pol.sc_unmapped_tlen:
            # --soft-clipped-unmapped-tlen: clipped bases count as
            # unmapped, so TLEN uses the PLAIN alignment extents
            # (getExtendedCoords skips the trim adjustment when
            # flags.scUnMapped(), aligner_result.h:901)
            xl1, xh1, xl2, xh2 = lo1, hi1, lo2, hi2
        else:
            xl1 = lo1 - t1[1]["read_start"]
            xh1 = hi1 + (L1 - (int(p1.rows_end[k1]) + 1))
            xl2 = lo2 - t2[1]["read_start"]
            xh2 = hi2 + (L2 - (int(p2.rows_end[k2]) + 1))
        frag = max(xh1, xh2) - min(xl1, xl2) + 1
        fw1, fw2 = o1 == 0, o2 == 0
        if xl1 == xl2:
            m1_up = (fw1 and fw2) or (fw1 and not fw2)
        else:
            m1_up = xl1 < xl2
        tlen1 = frag if m1_up else -frag
        tlen2 = -tlen1
        rid1, rid2 = int(p1.rid[k1]), int(p2.rid[k2])
        if rid1 != rid2:
            # discordant pair across references: RNEXT names the other
            # mate's reference and TLEN is 0 (reference sam.cpp TLEN rule
            # for refid mismatch; pairs on different chromosomes can only
            # be discordant)
            tlen1 = tlen2 = 0
        rnext1 = "=" if rid1 == rid2 else self.data.ref_names[rid2]
        rnext2 = "=" if rid1 == rid2 else self.data.ref_names[rid1]

        sec_fl = 0x100 if secondary else 0
        fl1 = FLAG_PAIRED | FLAG_MATE1 | (FLAG_PROPER if proper else 0) \
            | (FLAG_MATE_REVERSE if o2 else 0) | sec_fl
        fl2 = FLAG_PAIRED | FLAG_MATE2 | (FLAG_PROPER if proper else 0) \
            | (FLAG_MATE_REVERSE if o1 else 0) | sec_fl
        codes1, quals1 = self._oriented(cs, i, o1)
        codes2, quals2 = self._oriented(cs, B + i, o2)
        r1 = self._emit_aligned(rec1, L1, o1, codes1, quals1, p1, k1, t1,
                                s1, xs1, mq, yt, fl1, rnext1,
                                lo2 - int(self.data.ref_cum[rid2]) + 1,
                                tlen1, ys=s2)
        r2 = self._emit_aligned(rec2, L2, o2, codes2, quals2, p2, k2, t2,
                                s2, xs2, mq, yt, fl2, rnext2,
                                lo1 - int(self.data.ref_cum[rid1]) + 1,
                                tlen2, ys=s1)
        if r1 is None or r2 is None:
            return False
        out.append(r1)
        out.append(r2)
        return True

    def _emit_mixed(self, st, out, cs, i, rec1, rec2, l1, l2, tb_of):
        """No concordant/discordant pair: report mates individually
        (--no-mixed disables the aligned records). Field conventions for
        half-mapped pairs follow the reference (sam.cpp): the unmapped
        record carries the mapped mate's RNAME/POS, RNEXT "=", TLEN 0; the
        mapped record has RNEXT "=" and PNEXT = its own POS.

        Record order inside the pair follows the reference's finishRead
        appendance: in a half-mapped pair the ALIGNED mate's record comes
        first (its unpaired alignment is reported before the unaligned
        leftover record), mate 1 first otherwise (verified against the
        binary on reads_1/2.fq: all 290 mate2-first pairs are exactly
        the aligned-mate2 + unaligned-mate1 class)."""
        pol = self.pol
        B = len(cs.lens) // 2
        scores = cs.pool.scores
        mates = [(rec1, i, l1, l2), (rec2, B + i, l2, l1)]
        m1_al = bool(l1) and not pol.no_mixed
        m2_al = bool(l2) and not pol.no_mixed
        order = (1, 0) if (m2_al and not m1_al) else (0, 1)
        for mate in order:
            rec, ri, lst, other_lst = mates[mate]
            mate_flag = FLAG_MATE1 if mate == 0 else FLAG_MATE2
            other_aligned = bool(other_lst) and not pol.no_mixed
            fl = FLAG_PAIRED | mate_flag \
                | (0 if other_aligned else FLAG_MATE_UNMAPPED)
            if lst and not pol.no_mixed:
                best_k = lst[0]
                sec_k = lst[1] if len(lst) > 1 else None
                best = int(scores[best_k])
                sec = int(scores[sec_k]) if sec_k is not None else None
                per = int(cs.perfect[ri]) if pol.local else 0
                # k-mode convention (unique.h:202) also covers mixed-mode
                # records: without an observed second-best the search
                # "didn't really look" → MAPQ 255
                if (pol.all_hits or pol.khits > 1) and sec is None:
                    mq = 255
                else:
                    mq = self._mapq(best, sec, per, int(cs.minsc[ri]))
                orient = int(cs.cand_or[best_k])
                codes, quals = self._oriented(cs, ri, orient)
                rnext, pnext = ("*", 0)
                own_echo = False
                if not other_aligned:
                    # own coords echoed (reference half-mapped convention)
                    rnext = "="
                    own_echo = True
                else:
                    # both mates aligned but not as a pair: the reference
                    # still cross-references them (RNEXT '=', PNEXT =
                    # other's POS, TLEN 0; sam.cpp mixed-mode convention)
                    ok2 = other_lst[0]
                    rnext = "="
                    pnext = int(cs.pool.win_start[ok2])                         + tb_of[ok2][1]["ref_start_win"]                         - int(self.data.ref_cum[int(cs.pool.rid[ok2])]) + 1
                    fl |= FLAG_MATE_REVERSE if cs.cand_or[ok2] else 0
                r = self._emit_aligned(rec, int(cs.lens[ri]), orient, codes,
                                       quals, cs.pool, best_k, tb_of[best_k],
                                       best, sec, mq, "UP", fl,
                                       rnext=rnext, pnext=pnext)
                if r is not None:
                    if own_echo:
                        r.pnext = r.pos
                    out.append(r)
                    if sec is not None:
                        st.mate_al_multi += 1
                    else:
                        st.mate_al_one += 1
                    continue
            yf = self.YF_STR[int(cs.yf[ri])] if cs.filtered[ri] else None
            if other_aligned:
                ok = other_lst[0]
                o_rid = int(cs.pool.rid[ok])
                o_pos = ext_pos = int(cs.pool.win_start[ok]) \
                    + tb_of[ok][1]["ref_start_win"] \
                    - int(self.data.ref_cum[o_rid]) + 1
                fl |= FLAG_MATE_REVERSE if cs.cand_or[ok] else 0
                out.append(self._unaligned(
                    rec, yf, "UP", fl,
                    rname=self.data.ref_names[o_rid], pos=o_pos,
                    rnext="=", pnext=o_pos))
            else:
                out.append(self._unaligned(rec, yf, "UP", fl))
