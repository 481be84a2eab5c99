"""Batched unpaired alignment pipeline.

Host-side orchestration of the device stages, replacing the reference's
per-read worker loop (bt2_search.cpp multiseedSearchWorker:3094 and
SwDriver::extendSeeds aligner_sw_driver.cpp) with fixed-shape batch phases:

  phase 1  exact sweep of whole reads, fw+rc            (device)
  phase 2  multiseed instantiate → exact seed search    (device)
  phase 3  rank/sample SA ranges → resolve offsets      (host rank + device walk)
  phase 4  materialize ref windows → banded DP          (device)
  phase 5  best/secbest select per read                 (host, small arrays)
  phase 6  backtrace of chosen candidates               (device)
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
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from bowtie2_tpu.constants import decode_seq
from bowtie2_tpu.index.build import IndexData
from bowtie2_tpu.index.fmindex import FMIndex
from bowtie2_tpu.io.fastx import SeqRecord
from bowtie2_tpu.io.sam import SamAlignment, SamWriter, cigar_string, qual_string
from bowtie2_tpu.ops import fm
from bowtie2_tpu.ops.ref import gather_windows
from bowtie2_tpu.ops.sw import backtrace, sw_banded
from bowtie2_tpu.pipeline.backtrace import cigar_md_from_packed
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


def pad_reads(records: Sequence[SeqRecord], Lmax: int):
    """Vectorized padding: → (fw, qu, rc, qu_r) each (B, Lmax) int32.

    Pad code is 4 (N) for sequence, 0 for quals.
    """
    B = len(records)
    lens = np.array([r.seq.size for r in records], dtype=np.int32)
    fw = np.full((B, Lmax), 4, dtype=np.int32)
    qu = np.zeros((B, Lmax), dtype=np.int32)
    rc = np.full((B, Lmax), 4, dtype=np.int32)
    qu_r = np.zeros((B, Lmax), dtype=np.int32)
    if B == 0:
        return fw, qu, rc, qu_r, lens
    allseq = np.concatenate([r.seq for r in records]).astype(np.int32)
    allq = np.concatenate([r.qual for r in records]).astype(np.int32)
    row = np.repeat(np.arange(B), lens)
    col = np.arange(allseq.size) - np.repeat(np.cumsum(lens) - lens, lens)
    rcol = np.repeat(lens, lens) - 1 - col
    fw[row, col] = allseq
    qu[row, col] = allq
    rc[row, rcol] = np.where(allseq < 4, 3 - allseq, 4)
    qu_r[row, rcol] = allq
    return fw, qu, rc, qu_r, lens


class UnpairedAligner:
    """Aligns batches of unpaired reads against a loaded index."""

    MAX_EXACT_ROWS = 4      # rows resolved per exact-hit range per orientation
    NC_PER_READ = 16        # candidate extension budget per read (~ -D/maxIters)

    def __init__(self, data: IndexData, policy: Policy):
        self.data = data
        self.pol = policy
        self.idx = FMIndex.from_host(data)
        self.stats = AlignStats()
        self._stats_lock = threading.Lock()   # align_batch is thread-safe
        self._seg_end_joined = data.seg_joined_start + data.seg_len
        self._fn_cache = {}

    # ------------------------------------------------------------------
    def align_batch(self, records: Sequence[SeqRecord]) -> List[SamAlignment]:
        pol = self.pol
        B = len(records)
        if B == 0:
            return []
        fw, qu, rc, qu_r, lens = pad_reads(
            records, _bucket(max(int(r.seq.size) for r in records)))
        Lmax = fw.shape[1]

        # per-length policy values via the unique lengths
        ulen, inv = np.unique(lens, return_inverse=True)
        minsc = np.array([pol.min_score(int(l)) for l in ulen], np.int64)[inv]
        perfect = np.array([pol.perfect_score(int(l)) if pol.local else 0
                            for l in ulen], np.int64)[inv]
        nceil = np.array([pol.nceil(int(l)) for l in ulen], np.int32)[inv]
        n_count = (fw >= 4).sum(axis=1) - (Lmax - lens)
        filtered = (lens == 0) | (n_count > nceil)

        # ---------------- phase 1+2: device searches ----------------
        # dispatch all three searches before pulling any result (the
        # device→host link is high-latency; stacked single transfers)
        both = np.concatenate([fw, rc], axis=0)          # (2B, Lmax)
        both_lens = np.concatenate([lens, lens])
        sweep = fm.exact_sweep(self.idx.fw, jnp.asarray(both),
                               jnp.asarray(both_lens))
        sweep_d = jnp.stack([sweep.top, sweep.bot, sweep.nedit])
        seed_or, seed_off, seed_mlen, seed_tb_d, sshape = \
            self._seed_search(fw, rc, lens)
        half_off, half_mlen, half_tb_d = self._half_search(both, both_lens)
        sw_top, sw_bot, sw_ned = np.asarray(sweep_d)
        st_bt = np.asarray(seed_tb_d)
        seed_top = st_bt[0, :sshape[0]].reshape(sshape[1], sshape[2])
        seed_bot = st_bt[1, :sshape[0]].reshape(sshape[1], sshape[2])
        ht_bt = np.asarray(half_tb_d)
        half_top = ht_bt[0].reshape(2, -1).T
        half_bot = ht_bt[1].reshape(2, -1).T
        # merge half-read hits into the seed-range arrays (2B, smax+2)
        smax0 = seed_off.shape[1]
        seed_off = np.concatenate([seed_off, half_off], axis=1)
        seed_top = np.concatenate([seed_top, half_top], axis=1)
        seed_bot = np.concatenate([seed_bot, half_bot], axis=1)
        seed_mlen = np.concatenate([seed_mlen, half_mlen], axis=1)
        seed_half = np.zeros_like(seed_off, dtype=bool)
        seed_half[:, smax0:] = True

        # ---------------- phase 3: rank + resolve ----------------
        (cand_read, cand_or, cand_off, cand_row, cand_exact, cand_mlen,
         cand_half) = \
            self._assemble_candidates(B, lens, filtered, sw_top, sw_bot,
                                      sw_ned, seed_off, seed_top,
                                      seed_bot, seed_mlen, seed_half)
        n_cand = cand_row.size
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
            ok = jpos + cand_mlen <= self._seg_end_joined[seg]
            cand_read, cand_or, cand_off, cand_exact, cand_half, jpos, seg = (
                a[ok] for a in (cand_read, cand_or, cand_off, cand_exact,
                                cand_half, jpos, seg))

            gpos = (self.data.seg_global_start[seg]
                    + (jpos - self.data.seg_joined_start[seg]))
            anchor = gpos - cand_off
            rid = np.searchsorted(self.data.ref_cum, gpos, side="right") - 1

            # dedupe by (read, orient, anchor); canonical order keeps exacts
            key = (cand_read.astype(np.int64) * 2 + cand_or) * (1 << 40) \
                + (anchor + (1 << 35))
            _, first_idx = np.unique(key, return_index=True)
            first_idx.sort()
            cand_read, cand_or, cand_exact, cand_half, anchor, rid = (
                a[first_idx] for a in (cand_read, cand_or, cand_exact,
                                       cand_half, anchor, rid))
        else:
            anchor = np.zeros(0, dtype=np.int64)
            rid = np.zeros(0, dtype=np.int64)

        # ---------------- phase 4: windows + DP ----------------
        n_cand = anchor.size
        G = pol.band_halfwidth(Lmax)
        if n_cand:
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

            cr = np.zeros(NC, dtype=np.int64)
            cr[:n_cand] = cand_read
            co = np.zeros(NC, dtype=np.int64)
            co[:n_cand] = cand_or
            reads_c = np.where((co == 0)[:, None], fw[cr], rc[cr])
            quals_c = np.where((co == 0)[:, None], qu[cr], qu_r[cr])
            lens_c = np.maximum(lens[cr], 1)
            lens_c[n_cand:] = 1

            jreads_c = jnp.asarray(reads_c)
            jquals_c = jnp.asarray(quals_c)
            jlens_c = jnp.asarray(lens_c)
            res = sw_banded(jreads_c, jquals_c, jlens_c,
                            wins, pol.sw_params(), G)
            # ungapped mismatch count at the anchor diagonal (for the
            # half-candidate 1mm admission gate, phase 5) — stacked into the
            # same transfer as the DP results
            diag = wins[:, G:G + Lmax]
            mm_ug_d = jnp.sum(
                ((jreads_c != diag) | (jreads_c >= 4))
                & (jnp.arange(Lmax)[None, :] < jlens_c[:, None]), axis=1)
            sw4 = np.asarray(jnp.stack([res.score, res.row, res.lane, mm_ug_d]))
            scores = sw4[0, :n_cand].astype(np.int64)
            rows_end = sw4[1]
            lanes_end = sw4[2]
            mm_ug = sw4[3, :n_cand]
        else:
            scores = np.zeros(0, dtype=np.int64)

        # ---------------- phase 5: select per read ----------------
        chosen_per_read = {}
        if n_cand:
            valid = scores >= minsc[cand_read]
            # half-read (pigeonhole) candidates model the reference's
            # up-front 1-mismatch search (oneMmSearch): only admit them when
            # the implied end-to-end ungapped alignment has <= 1 mismatch,
            # so sensitivity matches the reference's (stronger use of these
            # hits would align reads the reference reports unaligned).
            valid &= ~(cand_half[:n_cand] & (mm_ug > 1))
            end_pos = anchor + (lanes_end[:n_cand] - G) + rows_end[:n_cand]
            by_read = {}
            for k in np.nonzero(valid)[0]:
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
                chosen_per_read[ri] = (uniq[0],
                                       uniq[1] if len(uniq) > 1 else None)

        # ---------------- phase 6: device backtrace of chosen ----------------
        tb_of = {}
        if chosen_per_read:
            sel = np.array([v[0] for v in chosen_per_read.values()], np.int32)
            Bc = _pow2_at_least(sel.size, lo=64)
            sel_pad = np.zeros(Bc, np.int32)
            sel_pad[:sel.size] = sel
            bt = backtrace(res.dirs, jnp.asarray(sel_pad),
                           jnp.asarray(rows_end[sel_pad]),
                           jnp.asarray(lanes_end[sel_pad]),
                           jnp.take(jreads_c, jnp.asarray(sel_pad), axis=0),
                           jnp.take(jquals_c, jnp.asarray(sel_pad), axis=0),
                           jnp.take(wins, jnp.asarray(sel_pad), axis=0),
                           pol.sw_params(), G)
            fields = ("read_start", "ref_start_win", "n_mm", "n_go",
                      "n_gc", "n_refn", "score_check")
            sc_d = jnp.stack([getattr(bt, f) for f in fields])
            ops_host = np.asarray(bt.ops)            # (S, Bc)
            sc_host = np.asarray(sc_d)               # (7, Bc)
            for ci, k in enumerate(sel.tolist()):
                tb_of[k] = (ops_host[:, ci],
                            {f: int(sc_host[fi, ci])
                             for fi, f in enumerate(fields)})

        # ---------------- phase 7: report ----------------
        st = AlignStats()
        out: List[SamAlignment] = []
        for ri, rec in enumerate(records):
            st.reads += 1
            L = int(lens[ri])
            if filtered[ri]:
                st.filtered += 1
                st.unal += 1
                out.append(self._unaligned(rec, "NS"))
                continue
            ch = chosen_per_read.get(ri)
            if ch is None:
                st.unal += 1
                out.append(self._unaligned(rec))
                continue
            best_k, sec_k = ch
            opcol, sc = tb_of[best_k]
            if sc["score_check"] != int(scores[best_k]):
                # should not happen; drop to unaligned rather than emit garbage
                st.unal += 1
                out.append(self._unaligned(rec))
                continue

            orient = int(cand_or[best_k])
            read_codes = fw[ri, :L] if orient == 0 else rc[ri, :L]
            read_quals = qu[ri, :L] if orient == 0 else qu_r[ri, :L]
            read_end = int(rows_end[best_k]) + 1
            if sc["n_mm"] == 0 and sc["n_gc"] == 0 and sc["n_refn"] == 0:
                # pure-match fast path: no op decoding needed
                span = read_end - sc["read_start"]
                cigar_ops = []
                if sc["read_start"] > 0:
                    cigar_ops.append(("S", sc["read_start"]))
                cigar_ops.append(("M", span))
                if read_end < L:
                    cigar_ops.append(("S", L - read_end))
                md = str(span)
            else:
                cigar_ops, md = cigar_md_from_packed(opcol, sc["read_start"],
                                                     read_end, L)
            win_start = int(anchor[best_k]) - G
            g_start = win_start + sc["ref_start_win"]
            r_id = int(rid[best_k])
            roff = g_start - int(self.data.ref_cum[r_id])
            best = int(scores[best_k])
            sec = int(scores[sec_k]) if sec_k is not None else None
            per = int(perfect[ri]) if pol.local else 0
            mq = mapq_v2(best, sec, per, int(minsc[ri]), pol.local)

            flag = 0x10 if orient else 0
            seq_out = decode_seq(read_codes.astype(np.uint8)).decode()
            qual_out = qual_string(read_quals)
            opts = [("AS", "i", best)]
            if sec is not None:
                opts.append(("XS", "i", sec))
            opts += [("XN", "i", sc["n_refn"]),
                     ("XM", "i", sc["n_mm"]),
                     ("XO", "i", sc["n_go"]),
                     ("XG", "i", sc["n_gc"]),
                     ("NM", "i", sc["n_mm"] + sc["n_gc"]),
                     ("MD", "Z", md),
                     ("YT", "Z", "UU")]
            out.append(SamAlignment(
                qname=rec.name, flag=flag, rname=self.data.ref_names[r_id],
                pos=roff + 1, mapq=mq, cigar=cigar_string(cigar_ops),
                rnext="*", pnext=0, tlen=0, seq=seq_out, qual=qual_out,
                opts=opts))
            if sec is not None:
                st.al_multi += 1
            else:
                st.al_one += 1
        with self._stats_lock:
            for f in ("reads", "unal", "al_one", "al_multi", "filtered"):
                setattr(self.stats, f, getattr(self.stats, f) + getattr(st, f))
        return out

    # ------------------------------------------------------------------
    def _seed_search(self, fw, rc, lens):
        """Instantiate + search seeds for both orientations (vectorized).

        Returns (orient, offsets, top, bot) each (2B, smax); empty ranges
        have top == bot. Row k < B is fw read k; row B+k is rc read k.
        (Reference instantiateSeeds aligner_seed.cpp:498 + searchAllSeeds.)
        """
        pol = self.pol
        B, Lmax = fw.shape
        slen = pol.seed_len
        # Re-seeding rounds beyond the first only run in the reference when
        # round-1 seed hits average >= --seed-boost (300) elements — i.e.
        # essentially never outside highly repetitive reads (bt2_search.cpp
        # :4146 averageHitsPerSeed() gate; verified empirically: 0 of the
        # lambda golden alignments need round-2 seeds). Round-0 only here;
        # the repetitive-read boost pass is future work.
        nrounds = 1
        ulen, inv = np.unique(lens, return_inverse=True)
        ival_u = np.array([pol.interval(int(l)) for l in ulen], np.int32)
        ivals = ival_u[inv]

        # seed offsets from ALL multiseed rounds at once: round r starts at
        # (interval * r) / nrounds (bt2_search.cpp:3911), seeds every
        # interval while they fit. The reference may stop after an earlier
        # round (ReportingState short-circuits); searching the union is a
        # sensitivity superset — acceptable until RNG/effort parity work.
        base = (ivals[:, None] * np.arange(nrounds, dtype=np.int32)[None, :]
                ) // nrounds                             # (B, nrounds)
        per_round = np.arange(64, dtype=np.int32)        # max seeds per round
        offs = (base[:, :, None] + per_round[None, None, :] * ivals[:, None, None])
        valid_off = offs + slen <= lens[:, None, None]
        # a round is skipped when seeds are already packed as tight as
        # possible (reference: interval <= roundi → continue)
        valid_off &= (np.arange(nrounds, dtype=np.int32)[None, :, None]
                      < ivals[:, None, None])
        offs = offs.reshape(B, -1)
        valid_off = valid_off.reshape(B, -1)
        nkeep = int(valid_off.sum(axis=1).max()) if B else 1
        smax = max(nkeep, 1)
        smax = 1 << int(np.ceil(np.log2(smax)))          # bucket for stability
        # compact the valid offsets left into (B, smax)
        order = np.argsort(~valid_off, axis=1, kind="stable")[:, :smax]
        valid_off = np.take_along_axis(valid_off, order, axis=1)
        offs = np.where(valid_off,
                        np.take_along_axis(offs, order, axis=1), 0)

        # fw seeds start at depth d from the 5' end; rc seeds are anchored
        # from the 3' end: depth d covers rc positions [L-d-len, L-d)
        # (reference instantiateSeq windowGetDna fw=false, aligner_seed.cpp:488)
        offs_rc = np.where(valid_off, lens[:, None] - offs - slen, 0)
        idx = offs[:, :, None] + np.arange(slen, dtype=np.int32)[None, None, :]
        idx = np.minimum(idx, Lmax - 1)
        idx_rc = offs_rc[:, :, None] + np.arange(slen, dtype=np.int32)[None, None, :]
        idx_rc = np.minimum(idx_rc, Lmax - 1)
        rows = np.arange(B)[:, None, None]
        seeds_fw = fw[rows, idx]
        seeds_rc = rc[rows, idx_rc]
        seeds = np.concatenate([seeds_fw, seeds_rc], axis=0)  # (2B, smax, slen)
        valid = np.concatenate([valid_off, valid_off], axis=0) \
            & ~(seeds >= 4).any(axis=2)

        # the reference gives a read up entirely when a round instantiates
        # zero valid seeds in BOTH orientations (bt2_search.cpp:3943-3947
        # "No seed hits! Done with this mate"), never reaching later rounds.
        # round_of was compacted with the offsets; reconstruct per-seed round
        round_of = np.broadcast_to(
            np.arange(nrounds, dtype=np.int32)[None, :, None],
            (B, nrounds, per_round.size)).reshape(B, -1)
        round_of = np.take_along_axis(round_of, order, axis=1)   # (B, smax)
        alive = np.ones(B, dtype=bool)
        for r in range(nrounds):
            mask_r = round_of == r
            drop = ~alive[:, None] & mask_r
            valid[:B][drop] = False
            valid[B:][drop] = False
            alive &= ((valid[:B] | valid[B:]) & mask_r).any(axis=1)

        flat_seeds = seeds.reshape(-1, slen).astype(np.int32)
        flat_valid = valid.reshape(-1)
        NS = _pow2_at_least(flat_seeds.shape[0])
        if NS > flat_seeds.shape[0]:
            pad = NS - flat_seeds.shape[0]
            flat_seeds = np.concatenate(
                [flat_seeds, np.zeros((pad, slen), np.int32)], axis=0)
            flat_valid = np.concatenate([flat_valid, np.zeros(pad, bool)])
        top, bot = fm.seed_search_exact(self.idx.fw, jnp.asarray(flat_seeds),
                                        jnp.asarray(flat_valid), slen)
        orient = np.repeat(np.array([0, 1]), B)[:, None] * np.ones((1, smax), np.int32)
        offs2 = np.concatenate([offs, offs_rc], axis=0)
        mlen = np.full_like(offs2, slen)
        return (orient.astype(np.int32), offs2, mlen,
                jnp.stack([top, bot]), (2 * B * smax, 2 * B, smax))

    def _half_search(self, both, both_lens):
        """Pigeonhole half-read exact search (replaces the reference's
        up-front 1-mismatch search, SeedAligner::oneMmSearch
        aligner_seed.cpp:975): an end-to-end alignment with <= 1 edit has
        one exact half, so both halves' exact SA ranges are a complete
        candidate source for it. both: (2B, Lmax) fw+rc reads.
        """
        B2, Lmax = both.shape
        mid = both_lens // 2
        Hmax = Lmax // 2 + 1
        # first half = read[0:mid]; second half = read[mid:L]
        h1 = both[:, :Hmax].astype(np.int32)
        idx = np.minimum(mid[:, None] + np.arange(Hmax, dtype=np.int32)[None, :],
                         Lmax - 1)
        h2 = both[np.arange(B2)[:, None], idx].astype(np.int32)
        seqs = np.concatenate([h1, h2], axis=0)
        hlens = np.concatenate([mid, both_lens - mid]).astype(np.int32)
        top, bot = fm.substring_search(self.idx.fw, jnp.asarray(seqs),
                                       jnp.asarray(hlens))
        off = np.stack([np.zeros(B2, np.int32), mid], axis=1)
        mlen = np.stack([mid, both_lens - mid], axis=1)
        return off, mlen, jnp.stack([top, bot])

    def _assemble_candidates(self, B, lens, filtered, sw_top, sw_bot, sw_ned,
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
            # nonempty seed ranges for this read, both orientations
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

    def _unaligned(self, rec: SeqRecord, yf: Optional[str] = None) -> SamAlignment:
        opts = []
        if yf:
            opts.append(("YF", "Z", yf))
        opts.append(("YT", "Z", "UU"))
        return SamAlignment(
            qname=rec.name, flag=4, rname="*", pos=0, mapq=0, cigar="*",
            seq=decode_seq(rec.seq.astype(np.uint8)).decode(),
            qual=qual_string(rec.qual), opts=opts)
