"""Batched unpaired alignment pipeline.

Host-side orchestration of the device stages, replacing the reference's
per-read worker loop (bt2_search.cpp multiseedSearchWorker:3094 and
SwDriver::extendSeeds aligner_sw_driver.cpp) with fixed-shape batch phases:

  phase 1  exact sweep of whole reads, fw+rc            (device)
  phase 2  multiseed instantiate → exact seed search    (device)
  phase 3  rank/sample SA ranges → resolve offsets      (host rank + device walk)
  phase 4  materialize ref windows → banded DP          (device)
  phase 5  best/secbest select, MAPQ, traceback, SAM    (host)

Irregular per-read work (variable seed counts, range sizes, candidate
counts) is handled by padding to bucketed shapes with validity masks, and
host-side compaction between phases — per-read branchy control flow becomes
per-stage masking, which is what the TPU wants.

Determinism: candidates are processed in a canonical order (exact hits
first, then seed ranges by ascending width, rows in SA order), so output is
reproducible run-to-run and across batch splits. The reference breaks
score ties with a per-read RNG (aln_sink.cpp selectByScore:1477); RNG-parity
tie-breaking is future work — ties here resolve to the canonical order.
"""

import sys
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from bowtie2_tpu.constants import decode_seq, revcomp
from bowtie2_tpu.index.build import IndexData
from bowtie2_tpu.index.fmindex import FMIndex
from bowtie2_tpu.io.fastx import SeqRecord
from bowtie2_tpu.io.sam import (SamAlignment, SamWriter, cigar_string,
                                qual_string)
from bowtie2_tpu.ops import fm
from bowtie2_tpu.ops.ref import gather_windows
from bowtie2_tpu.ops.sw import sw_banded
from bowtie2_tpu.pipeline.backtrace import backtrace_one
from bowtie2_tpu.pipeline.mapq import mapq_v2
from bowtie2_tpu.pipeline.policy import Policy

LEN_BUCKETS = (64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048)


def _bucket(n: int, buckets=LEN_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"read length {n} exceeds max supported {buckets[-1]}")


def _pow2_at_least(n: int, lo: int = 256) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@dataclass
class AlignStats:
    reads: int = 0
    unal: int = 0
    al_one: int = 0
    al_multi: int = 0
    filtered: int = 0

    def summary(self) -> str:
        """stderr summary in the reference's format (aln_sink.cpp printAlSumm)."""
        n = max(self.reads, 1)
        lines = [f"{self.reads} reads; of these:",
                 f"  {self.reads} (100.00%) were unpaired; of these:",
                 f"    {self.unal} ({100.0*self.unal/n:.2f}%) aligned 0 times",
                 f"    {self.al_one} ({100.0*self.al_one/n:.2f}%) aligned exactly 1 time",
                 f"    {self.al_multi} ({100.0*self.al_multi/n:.2f}%) aligned >1 times",
                 f"{100.0*(self.al_one+self.al_multi)/n:.2f}% overall alignment rate"]
        return "\n".join(lines)


class UnpairedAligner:
    """Aligns batches of unpaired reads against a loaded index."""

    MAX_EXACT_ROWS = 4      # rows resolved per exact-hit range per orientation
    NC_PER_READ = 16        # candidate extension budget per read (~ -D/maxIters)

    def __init__(self, data: IndexData, policy: Policy):
        self.data = data
        self.pol = policy
        self.idx = FMIndex.from_host(data)
        self.stats = AlignStats()
        self._seg_end_joined = data.seg_joined_start + data.seg_len

    # ------------------------------------------------------------------
    def align_batch(self, records: Sequence[SeqRecord]) -> List[SamAlignment]:
        pol = self.pol
        B = len(records)
        lens = np.array([r.seq.size for r in records], dtype=np.int32)
        Lmax = _bucket(int(lens.max()) if B else 64)

        fw = np.full((B, Lmax), 4, dtype=np.int32)
        qu = np.zeros((B, Lmax), dtype=np.int32)
        rc = np.full((B, Lmax), 4, dtype=np.int32)
        qu_r = np.zeros((B, Lmax), dtype=np.int32)
        for i, r in enumerate(records):
            L = r.seq.size
            fw[i, :L] = r.seq
            qu[i, :L] = r.qual
            rc[i, :L] = revcomp(r.seq)
            qu_r[i, :L] = r.qual[::-1]

        minsc = np.array([pol.min_score(int(l)) for l in lens], dtype=np.int64)
        perfect = np.array([pol.perfect_score(int(l)) if pol.local else 0
                            for l in lens], dtype=np.int64)
        nceil = np.array([pol.nceil(int(l)) for l in lens], dtype=np.int32)
        n_count = np.array([(r.seq >= 4).sum() for r in records], dtype=np.int32)
        filtered = (lens == 0) | (n_count > nceil)

        # ---------------- phase 1+2: device searches ----------------
        both = np.concatenate([fw, rc], axis=0)          # (2B, Lmax)
        both_lens = np.concatenate([lens, lens])
        sweep = fm.exact_sweep(self.idx.fw, jnp.asarray(both),
                               jnp.asarray(both_lens))
        sw_top = np.asarray(sweep.top)
        sw_bot = np.asarray(sweep.bot)
        sw_ned = np.asarray(sweep.nedit)

        slen = pol.seed_len
        seed_tb = self._seed_search(fw, rc, lens, Lmax)

        # ---------------- phase 3: rank + resolve ----------------
        (cand_read, cand_or, cand_off, cand_row, cand_exact) = \
            self._assemble_candidates(B, lens, filtered, sw_top, sw_bot,
                                      sw_ned, seed_tb)
        n_cand = cand_row.size
        results = [None] * B
        if n_cand:
            NR = _pow2_at_least(n_cand)
            rows_pad = np.zeros(NR, dtype=np.int32)
            rows_pad[:n_cand] = cand_row
            jpos = np.asarray(fm.sa_resolve(
                self.idx.fw, jnp.asarray(rows_pad),
                period=1 << self.data.off_rate))[:n_cand].astype(np.int64)

            # straddle filter: the matched stretch must stay in one segment
            seg = np.searchsorted(self.data.seg_joined_start, jpos,
                                  side="right") - 1
            match_len = np.where(cand_exact, lens[cand_read], slen)
            ok = jpos + match_len <= self._seg_end_joined[seg]
            cand_read, cand_or, cand_off, cand_exact, jpos, seg = (
                a[ok] for a in (cand_read, cand_or, cand_off, cand_exact,
                                jpos, seg))

            gpos = (self.data.seg_global_start[seg]
                    + (jpos - self.data.seg_joined_start[seg]))
            anchor = gpos - cand_off
            rid = np.searchsorted(self.data.ref_cum, gpos, side="right") - 1

            # dedupe by (read, orient, anchor); canonical order keeps exacts
            key = (cand_read.astype(np.int64) * 2 + cand_or) * (1 << 40) \
                + (anchor + (1 << 35))
            _, first_idx = np.unique(key, return_index=True)
            first_idx.sort()
            cand_read, cand_or, cand_exact, anchor, rid = (
                a[first_idx] for a in (cand_read, cand_or, cand_exact,
                                       anchor, rid))
        else:
            anchor = np.zeros(0, dtype=np.int64)
            rid = np.zeros(0, dtype=np.int64)

        # ---------------- phase 4: windows + DP ----------------
        n_cand = anchor.size
        if n_cand:
            G = pol.band_halfwidth(Lmax)
            width = Lmax + 2 * G
            NC = _pow2_at_least(n_cand)
            starts = np.zeros(NC, dtype=np.int32)
            lo = np.zeros(NC, dtype=np.int32)
            hi = np.zeros(NC, dtype=np.int32)
            starts[:n_cand] = (anchor - G).astype(np.int32)
            lo[:n_cand] = self.data.ref_cum[rid].astype(np.int32)
            hi[:n_cand] = self.data.ref_cum[rid + 1].astype(np.int32)
            wins = gather_windows(self.idx.ref_words, self.idx.refn_words,
                                  jnp.asarray(starts), jnp.asarray(lo),
                                  jnp.asarray(hi), width)

            reads_c = np.zeros((NC, Lmax), dtype=np.int32)
            quals_c = np.zeros((NC, Lmax), dtype=np.int32)
            lens_c = np.ones(NC, dtype=np.int32)
            reads_c[:n_cand] = np.where((cand_or == 0)[:, None],
                                        fw[cand_read], rc[cand_read])
            quals_c[:n_cand] = np.where((cand_or == 0)[:, None],
                                        qu[cand_read], qu_r[cand_read])
            lens_c[:n_cand] = lens[cand_read]

            res = sw_banded(jnp.asarray(reads_c), jnp.asarray(quals_c),
                            jnp.asarray(lens_c), wins, pol.sw_params(), G)
            scores = np.asarray(res.score)[:n_cand].astype(np.int64)
            rows_end = np.asarray(res.row)[:n_cand]
            lanes_end = np.asarray(res.lane)[:n_cand]
            dirs_dev = res.dirs
        else:
            scores = np.zeros(0, dtype=np.int64)

        # ---------------- phase 5: select + report ----------------
        out: List[SamAlignment] = []
        chosen_per_read = {}
        if n_cand:
            valid = scores >= minsc[cand_read]
            end_pos = anchor + (lanes_end - G) + rows_end  # global ref pos of last char
            order = np.argsort(cand_read, kind="stable")
            by_read = {}
            for k in order:
                if not valid[k]:
                    continue
                by_read.setdefault(int(cand_read[k]), []).append(int(k))
            for ri, ks in by_read.items():
                # dedupe identical final alignments
                seen = {}
                for k in ks:
                    kk = (int(cand_or[k]), int(end_pos[k]))
                    if kk not in seen or scores[k] > scores[seen[kk]]:
                        seen[kk] = k
                uniq = sorted(seen.values(),
                              key=lambda k: (-scores[k], ks.index(k)))
                best_k = uniq[0]
                sec_k = uniq[1] if len(uniq) > 1 else None
                chosen_per_read[ri] = (best_k, sec_k)

        # pull direction matrices + windows for chosen best candidates only
        if chosen_per_read:
            idxs = np.array([v[0] for v in chosen_per_read.values()],
                            dtype=np.int32)
            jidx = jnp.asarray(idxs)
            dirs_host = np.asarray(jnp.take(dirs_dev, jidx, axis=0))
            wins_host = np.asarray(jnp.take(wins, jidx, axis=0))
            dir_of = {k: dirs_host[i] for i, k in enumerate(idxs.tolist())}
            win_of = {k: wins_host[i] for i, k in enumerate(idxs.tolist())}

        for ri, rec in enumerate(records):
            self.stats.reads += 1
            L = int(lens[ri])
            if filtered[ri]:
                self.stats.filtered += 1
                self.stats.unal += 1
                out.append(self._unaligned(rec, "NS"))
                continue
            ch = chosen_per_read.get(ri)
            if ch is None:
                self.stats.unal += 1
                out.append(self._unaligned(rec))
                continue
            best_k, sec_k = ch
            orient = int(cand_or[best_k])
            read_codes = fw[ri, :L] if orient == 0 else rc[ri, :L]
            read_quals = qu[ri, :L] if orient == 0 else qu_r[ri, :L]
            G = pol.band_halfwidth(Lmax)
            win_start = int(anchor[best_k]) - G
            win = win_of[best_k]
            pad_read = np.full(Lmax, 4, np.int32)
            pad_read[:L] = read_codes
            pad_qual = np.zeros(Lmax, np.int32)
            pad_qual[:L] = read_quals
            tb = backtrace_one(dir_of[best_k], int(rows_end[best_k]),
                               int(lanes_end[best_k]), pad_read, pad_qual,
                               win, pol.sw_params())
            if tb.score_check != int(scores[best_k]):
                # should not happen; drop to unaligned rather than emit garbage
                self.stats.unal += 1
                out.append(self._unaligned(rec))
                continue

            g_start = win_start + tb.ref_start_win
            r_id = int(rid[best_k])
            roff = g_start - int(self.data.ref_cum[r_id])
            best = int(scores[best_k])
            sec = int(scores[sec_k]) if sec_k is not None else None
            per = int(perfect[ri]) if pol.local else 0
            mq = mapq_v2(best, sec, per, int(minsc[ri]), pol.local)

            flag = 0x10 if orient else 0
            seq_out = decode_seq(read_codes.astype(np.uint8)).decode()
            qual_out = qual_string(read_quals)
            cigar_ops = list(tb.ops)
            if tb.read_end < L:
                cigar_ops.append(("S", L - tb.read_end))
            opts = [("AS", "i", best)]
            if sec is not None:
                opts.append(("XS", "i", sec))
            opts += [("XN", "i", tb.n_refn),
                     ("XM", "i", tb.n_mm),
                     ("XO", "i", tb.n_gap_opens),
                     ("XG", "i", tb.n_gap_chars),
                     ("NM", "i", tb.n_mm + tb.n_gap_chars),
                     ("MD", "Z", "".join(tb.md_parts)),
                     ("YT", "Z", "UU")]
            out.append(SamAlignment(
                qname=rec.name, flag=flag, rname=self.data.ref_names[r_id],
                pos=roff + 1, mapq=mq, cigar=cigar_string(cigar_ops),
                rnext="*", pnext=0, tlen=0, seq=seq_out, qual=qual_out,
                opts=opts))
            if sec is not None:
                self.stats.al_multi += 1
            else:
                self.stats.al_one += 1
        return out

    # ------------------------------------------------------------------
    def _seed_search(self, fw, rc, lens, Lmax):
        """Instantiate + search seeds for both orientations.

        Returns dict read→list[(orient, rdoff, top, bot)] with nonempty
        ranges only (reference instantiateSeeds aligner_seed.cpp:498 +
        searchAllSeeds).
        """
        pol = self.pol
        B = lens.size
        slen = pol.seed_len
        per_read_offs = []
        smax = 1
        for i in range(B):
            L = int(lens[i])
            n = pol.n_seeds(L)
            ival = pol.interval(L)
            offs = [j * ival for j in range(n)]
            per_read_offs.append(offs)
            smax = max(smax, n)
        seeds = np.full((2 * B, smax, slen), 0, dtype=np.int32)
        valid = np.zeros((2 * B, smax), dtype=bool)
        offmat = np.zeros((2 * B, smax), dtype=np.int32)
        for i in range(B):
            for j, off in enumerate(per_read_offs[i]):
                for oi, src in ((0, fw), (1, rc)):
                    s = src[i, off:off + slen]
                    v = not (s >= 4).any()
                    seeds[oi * B + i, j] = s
                    valid[oi * B + i, j] = v
                    offmat[oi * B + i, j] = off
        flat_seeds = seeds.reshape(-1, slen)
        flat_valid = valid.reshape(-1)
        top, bot = fm.seed_search_exact(self.idx.fw, jnp.asarray(flat_seeds),
                                        jnp.asarray(flat_valid), slen)
        top = np.asarray(top).reshape(2 * B, smax)
        bot = np.asarray(bot).reshape(2 * B, smax)
        result = {}
        for i in range(B):
            hits = []
            for oi in (0, 1):
                for j in range(len(per_read_offs[i])):
                    t, b = int(top[oi * B + i, j]), int(bot[oi * B + i, j])
                    if b > t:
                        hits.append((oi, int(offmat[oi * B + i, j]), t, b))
            result[i] = hits
        return result

    def _assemble_candidates(self, B, lens, filtered, sw_top, sw_bot, sw_ned,
                             seed_tb):
        """Canonical-order candidate list under a per-read budget."""
        cand_read, cand_or, cand_off, cand_row, cand_exact = [], [], [], [], []
        for i in range(B):
            if filtered[i]:
                continue
            budget = self.NC_PER_READ
            # exact end-to-end hits first (phase 1)
            for oi in (0, 1):
                k = oi * B + i
                if sw_ned[k] == 0 and sw_bot[k] > sw_top[k]:
                    take = min(int(sw_bot[k] - sw_top[k]),
                               self.MAX_EXACT_ROWS, budget)
                    for r in range(take):
                        cand_read.append(i)
                        cand_or.append(oi)
                        cand_off.append(0)
                        cand_row.append(int(sw_top[k]) + r)
                        cand_exact.append(True)
                    budget -= take
            # seed ranges by ascending width (prioritizeSATups), rows
            # round-robin across ranges so wide ranges don't starve others
            hits = sorted(seed_tb.get(i, []), key=lambda h: (h[3] - h[2]))
            depth = 0
            while budget > 0:
                advanced = False
                for (oi, off, t, b) in hits:
                    if budget <= 0:
                        break
                    if t + depth < b:
                        cand_read.append(i)
                        cand_or.append(oi)
                        cand_off.append(off)
                        cand_row.append(t + depth)
                        cand_exact.append(False)
                        budget -= 1
                        advanced = True
                if not advanced:
                    break
                depth += 1
        return (np.array(cand_read, dtype=np.int64),
                np.array(cand_or, dtype=np.int64),
                np.array(cand_off, dtype=np.int64),
                np.array(cand_row, dtype=np.int32),
                np.array(cand_exact, dtype=bool))

    def _unaligned(self, rec: SeqRecord, yf: Optional[str] = None) -> SamAlignment:
        opts = []
        if yf:
            opts.append(("YF", "Z", yf))
        opts.append(("YT", "Z", "UU"))
        return SamAlignment(
            qname=rec.name, flag=4, rname="*", pos=0, mapq=0, cigar="*",
            seq=decode_seq(rec.seq.astype(np.uint8)).decode(),
            qual=qual_string(rec.qual), opts=opts)
