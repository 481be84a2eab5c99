"""Single-dispatch fused alignment pipeline (device-side end to end).

Round-1 ran the per-batch phases as separate device calls with host numpy
between them (search -> host rank -> resolve -> host assemble -> DP -> host
select -> backtrace), costing 4+ device round-trips per batch plus host
work on arrays that never needed to leave the device. On the tunneled
backend each sync is ~30-50 ms of pure latency, and the host numpy stages
(candidate assembly, ranking) are exactly the kind of fixed-shape masked
work the TPU does natively.

This module moves the WHOLE per-batch pipeline into one jitted program:

  exact sweep + seed search + half-read search     (ops/fm.py kernels)
  -> per-read candidate slot assembly               (canonical budget order)
  -> SA resolution of every slot                    (ops/fm.py sa_resolve)
  -> straddle filter, anchor dedupe                 (per-read slot masks)
  -> compaction -> banded DP                        (ops/sw.py sw_banded)
  -> per-read ranking (dedupe by (orient,end))      (reference aln_sink
     selectByScore canonical order: score desc, candidate index asc)
  -> backtrace of the reported candidates           (ops/sw.py backtrace)

One upload (reads/quals/seed offsets), one download (packed ops + one int32
metadata vector). Semantics are IDENTICAL to the round-1 host pipeline
(pipeline/align.py _search_candidates/_rank_per_read), which in turn holds
100% byte-parity with the reference on the golden corpora; the golden tests
assert this path produces the same records.

Reference counterparts: SwDriver::extendSeeds flow aligner_sw_driver.cpp,
prioritizeSATups (rank SA ranges small->large), AlnSinkWrap::finishRead
selection (aln_sink.cpp:643).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bowtie2_tpu.index.fmindex import FMHalf
from bowtie2_tpu.ops import fm
from bowtie2_tpu.ops.ref import aligned_width, gather_windows_aligned
from bowtie2_tpu.ops.sw import (OP_NONE, SWParams, SWResult, backtrace,
                                diag_readout, mm_penalty_from_qual,
                                sw_banded)

NEG = jnp.int32(-(1 << 29))
BIGKEY = jnp.int32(1 << 29)

# number of per-chosen scalar fields in the metadata vector (host decode
# must match pipeline/align.py FusedBatch)
CHOSEN_FIELDS = 12


class SegTables(NamedTuple):
    """Joined-text segment geometry (device copies of IndexData tables)."""
    seg_joined_start: jnp.ndarray   # (nseg,) int32
    seg_global_start: jnp.ndarray   # (nseg,) int32
    seg_end_joined: jnp.ndarray     # (nseg,) int32 = joined_start + len
    ref_cum: jnp.ndarray            # (nref+1,) int32


class FusedResult(NamedTuple):
    blob: jnp.ndarray   # (S*Bc + 4*(B*2*kk + Bc*CHOSEN_FIELDS + 1),) uint8:
                        # packed backtrace ops followed by the bitcast int32
                        # metadata vector — ONE device->host transfer


def _pack4(codes: jnp.ndarray) -> jnp.ndarray:
    """(B, L) int32 codes 0..5 → (B, ceil(L/8)) int32, 4 bits per code.

    Per-element gathers cost ~10ns/element on this backend; extracting
    subsequences from packed words turns an m*length-element gather into an
    m*nwords one (8x fewer) plus cheap shifts."""
    B, L = codes.shape
    if L % 8:
        codes = jnp.concatenate(
            [codes, jnp.full((B, 8 - L % 8), 5, jnp.int32)], axis=1)
    return jnp.sum(codes.reshape(B, -1, 8)
                   << (4 * jnp.arange(8, dtype=jnp.int32))[None, None, :],
                   axis=2, dtype=jnp.int32)


def _extract_packed(words: jnp.ndarray, offs: jnp.ndarray, length: int
                    ) -> jnp.ndarray:
    """Extract fixed-length windows from packed 4-bit rows.

    words: (B, Lw) int32 packed rows; offs: (B, m) window starts (chars).
    Returns (B, m, length) int32 codes. Out-of-row positions read garbage;
    callers mask by validity.
    """
    B, Lw = words.shape
    m = offs.shape[1]
    nw = (length + 7) // 8 + 1
    w0 = jnp.clip(offs, 0, None) // 8
    # short rows: select straight from the broadcast row (no gather at
    # all); long rows: gather nw words per window first
    if Lw <= max(32, nw):
        loc = jnp.broadcast_to(words[:, None, :], (B, m, Lw))
        w0 = jnp.zeros_like(w0)
        rel = jnp.clip(offs, 0, None)
        nsel = Lw
    else:
        widx = jnp.clip(w0[:, :, None]
                        + jnp.arange(nw, dtype=jnp.int32)[None, None, :],
                        0, Lw - 1)
        loc = jnp.take_along_axis(words, widx.reshape(B, -1),
                                  axis=1).reshape(B, m, nw)
        rel = jnp.clip(offs, 0, None) - w0 * 8
        nsel = nw
    k = jnp.arange(length, dtype=jnp.int32)
    cpos = rel[:, :, None] + k[None, None, :]             # (B, m, length)
    word_of = cpos // 8
    bit_of = 4 * (cpos % 8)
    sel = jnp.sum(jnp.where(
        word_of[..., None] == jnp.arange(nsel, dtype=jnp.int32),
        loc[:, :, None, :], 0), axis=3, dtype=jnp.int32)
    return (sel >> bit_of) & 15


def _assemble_slots(B, T, lens, live_read, sw_top, sw_bot, sw_ned,
                    tops2, bots2, offs2, mlens2, halfs2, max_exact_rows):
    """Canonical-order candidate slots, (B, T) arrays.

    Mirrors pipeline/align.py _assemble_candidates: exact end-to-end hits
    first (fw then rc, up to max_exact_rows each), then seed/half SA ranges
    by ascending width with depth-major round-robin row allocation under
    the per-read budget T.

    tops2/...: (2B, M2) per-orientation range arrays (rows < B fw, >= B rc).
    Returns slot_valid, slot_row, slot_or, slot_off, slot_exact, slot_mlen,
    slot_half — all (B, T).
    """
    M2 = tops2.shape[1]
    M = 2 * M2

    # ---- exact end-to-end hits ----
    ex_w = jnp.where((sw_ned == 0) & (sw_bot > sw_top),
                     sw_bot - sw_top, 0)
    ex_w = jnp.minimum(ex_w, max_exact_rows).astype(jnp.int32)   # (2B,)
    ex_w = jnp.where(jnp.concatenate([live_read, live_read]), ex_w, 0)
    t_fw = jnp.minimum(ex_w[:B], T)
    t_rc = jnp.minimum(ex_w[B:], T - t_fw)
    rem = T - t_fw - t_rc                                        # (B,)

    # ---- seed/half ranges sorted by width ascending ----
    w = jnp.concatenate([bots2[:B] - tops2[:B],
                         bots2[B:] - tops2[B:]], axis=1)         # (B, M)
    w = jnp.minimum(jnp.maximum(w, 0), BIGKEY - 1).astype(jnp.int32)
    w = jnp.where(live_read[:, None], w, 0)
    tops = jnp.concatenate([tops2[:B], tops2[B:]], axis=1)
    offs = jnp.concatenate([offs2[:B], offs2[B:]], axis=1)
    mlens = jnp.concatenate([mlens2[:B], mlens2[B:]], axis=1)
    halfs = jnp.concatenate([halfs2[:B], halfs2[B:]], axis=1)
    oris = jnp.concatenate([jnp.zeros((B, M2), jnp.int32),
                            jnp.ones((B, M2), jnp.int32)], axis=1)
    order = jnp.argsort(jnp.where(w == 0, BIGKEY, w), axis=1, stable=True)
    w = jnp.take_along_axis(w, order, axis=1)
    tops = jnp.take_along_axis(tops, order, axis=1)
    offs = jnp.take_along_axis(offs, order, axis=1)
    mlens = jnp.take_along_axis(mlens, order, axis=1)
    halfs = jnp.take_along_axis(halfs, order, axis=1)
    oris = jnp.take_along_axis(oris, order, axis=1)

    # ---- depth-major round-robin allocation (deepest full round Dstar,
    # leftover to the narrowest still-live ranges) ----
    ds = jnp.arange(T + 1, dtype=jnp.int32)
    f = jnp.minimum(w[:, :, None], ds[None, None, :]).sum(
        axis=1, dtype=jnp.int32)                                   # (B,T+1)
    Dstar = jnp.maximum((f <= rem[:, None]).sum(axis=1) - 1, 0)
    used = jnp.take_along_axis(f, Dstar[:, None], axis=1)[:, 0]
    extra_budget = rem - used
    alive = w > Dstar[:, None]
    extra = alive & (jnp.cumsum(alive, axis=1, dtype=jnp.int32)
                     <= extra_budget[:, None])
    n = jnp.minimum(w, Dstar[:, None]) + extra                   # (B, M)

    # ---- slot fill: sort a per-read key table, take first T ----
    # keys: exact fw d -> d (0..3), exact rc d -> 4+d, seed (depth d,
    # range j) -> 8 + d*M + j; dead entries get BIGKEY
    e4 = jnp.arange(max_exact_rows, dtype=jnp.int32)
    key_fw = jnp.where(e4[None, :] < t_fw[:, None], e4[None, :], BIGKEY)
    key_rc = jnp.where(e4[None, :] < t_rc[:, None],
                       max_exact_rows + e4[None, :], BIGKEY)
    dT = jnp.arange(T, dtype=jnp.int32)
    seed_key = (8 + dT[None, :, None] * M
                + jnp.arange(M, dtype=jnp.int32)[None, None, :])
    seed_key = jnp.where(dT[None, :, None] < n[:, None, :],
                         seed_key, BIGKEY).reshape(B, T * M)
    keys = jnp.concatenate([key_fw, key_rc, seed_key], axis=1)
    keys = jnp.sort(keys, axis=1)[:, :T]                         # (B, T)

    slot_valid = keys < BIGKEY
    is_exact = keys < 2 * max_exact_rows
    ex_or = (keys >= max_exact_rows).astype(jnp.int32)
    ex_d = jnp.where(is_exact, keys % max_exact_rows, 0)
    q = jnp.where(is_exact, 0, keys - 8)
    sd = q // M
    sj = q % M

    rdix = jnp.arange(B, dtype=jnp.int32)[:, None]
    ex_row = jnp.take(sw_top, ex_or * B + rdix) + ex_d.astype(sw_top.dtype)
    seed_row = jnp.take_along_axis(tops, sj, axis=1) \
        + sd.astype(tops.dtype)
    slot_row = jnp.where(is_exact, ex_row, seed_row)
    slot_or = jnp.where(is_exact, ex_or,
                        jnp.take_along_axis(oris, sj, axis=1))
    slot_off = jnp.where(is_exact, 0,
                         jnp.take_along_axis(offs, sj, axis=1))
    slot_mlen = jnp.where(is_exact, lens[:, None],
                          jnp.take_along_axis(mlens, sj, axis=1))
    slot_half = jnp.where(is_exact, False,
                          jnp.take_along_axis(halfs, sj, axis=1))
    slot_row = jnp.where(slot_valid, slot_row,
                         jnp.zeros((), slot_row.dtype))
    # source-range bookkeeping for the PE -D effort model (pe_effort.py):
    # range id in width-sorted order (-2/-1 = exact fw/rc, matching the
    # host path's cand_rangej) + the source range's full SA width
    ex_full = jnp.take((sw_bot - sw_top).astype(jnp.int32),
                       ex_or * B + rdix)
    slot_rangej = jnp.where(is_exact, -2 + ex_or, sj)
    slot_rwidth = jnp.where(is_exact, ex_full,
                            jnp.take_along_axis(w, sj, axis=1))
    return (slot_valid, slot_row, slot_or, slot_off, is_exact & slot_valid,
            slot_mlen, slot_half, slot_rangej, slot_rwidth)


def _core(half: FMHalf, ref_words, refn_words, seg: SegTables,
          jboth, jquals, lens, offs_all, valid_all, minsc, live_read,
          live_or, params: SWParams, band: int, seed_len: int,
          ftab_chars: int, half_ftab: int, period: int, T: int,
          NC: int, n1: bool, max_exact_rows: int, no_1mm: bool,
          no_exact: bool = False, track_origin: bool = False,
          NCDP: int = None):
    """Shared pipeline phases 1-4: searches → slots → SA resolve → DP.

    Returns a dict of intermediates; fused_se ranks/backtraces from it,
    fused_pe exports per-slot metadata for host pairing."""
    G = band
    B2, Lmax = jboth.shape
    B = B2 // 2
    W = Lmax + 2 * G + 1
    lens2 = jnp.concatenate([lens, lens])
    parange = jnp.arange(Lmax, dtype=jnp.int32)[None, :]

    # Reversed char streams with ZERO gathers: the reversed fw read is the
    # complement of the rc read row (both are uploaded anyway), since
    # rc[p] = comp(read[len-1-p]). R[:, p] = read[len-1-p]; 5 = inactive.
    other = jnp.concatenate([jboth[B:], jboth[:B]], axis=0)
    R = jnp.where(other < 4, 3 - other, other)
    R = jnp.where(parange < lens2[:, None], R, 5)
    jpack = _pack4(jboth)                  # forward reads, packed 4-bit
    rpack = _pack4(R)                      # reversed streams, packed

    # ---------------- phase 1+2: FM searches ----------------
    sweep = fm.exact_sweep_rr.__wrapped__(half, R)

    # seed windows extracted from packed rows (no per-element char gather)
    smax = offs_all.shape[1]
    seeds = _extract_packed(jpack, offs_all, seed_len).reshape(-1, seed_len)
    top_s, bot_s = fm.seed_search_exact.__wrapped__(
        half, seeds, valid_all.reshape(-1), seed_len, ftab_chars)
    seed_top = top_s.reshape(B2, smax)
    seed_bot = bot_s.reshape(B2, smax)

    # pigeonhole half-read search (~ oneMmSearch): reversed h2 stream is a
    # prefix of R; reversed h1 stream is R shifted by (len - mid)
    mid = lens2 // 2
    Hmax = Lmax // 2 + 1
    h2r = jnp.where(parange[:, :Hmax] < (lens2 - mid)[:, None],
                    R[:, :Hmax], 5)
    h1r = _extract_packed(rpack, (lens2 - mid)[:, None], Hmax)[:, 0, :]
    h1r = jnp.where(jnp.arange(Hmax, dtype=jnp.int32)[None, :]
                    < mid[:, None], h1r, 5)
    htop, hbot = fm.substring_search_rr.__wrapped__(
        half, jnp.concatenate([h1r, h2r], axis=0))
    half_off = jnp.stack([jnp.zeros(B2, jnp.int32), mid], axis=1)
    half_mlen = jnp.stack([mid, lens2 - mid], axis=1)
    half_top = htop.reshape(2, B2).T
    half_bot = hbot.reshape(2, B2).T
    if no_1mm:   # --no-1mm-upfront: skip the up-front 1-mismatch stage
        half_top = jnp.zeros_like(half_top)
        half_bot = jnp.zeros_like(half_bot)

    tops2 = jnp.concatenate([seed_top, half_top], axis=1)
    bots2 = jnp.concatenate([seed_bot, half_bot], axis=1)
    offs2 = jnp.concatenate([offs_all, half_off], axis=1)
    mlens2 = jnp.concatenate(
        [jnp.full((B2, smax), seed_len, jnp.int32), half_mlen], axis=1)
    halfs2 = jnp.concatenate(
        [jnp.zeros((B2, smax), bool), jnp.ones((B2, 2), bool)], axis=1)

    if n1:
        # -N 1 pigeonhole: exact search of both halves of every seed
        hlen = seed_len // 2
        sh_offs = jnp.concatenate([offs_all, offs_all + hlen], axis=1)
        sh_offs = jnp.clip(sh_offs, 0, Lmax - 1)
        sh_valid = jnp.concatenate(
            [offs_all + seed_len <= Lmax] * 2, axis=1)
        sh_seeds = _extract_packed(jpack, sh_offs, hlen).reshape(-1, hlen)
        shtop, shbot = fm.seed_search_exact.__wrapped__(
            half, sh_seeds, sh_valid.reshape(-1), hlen, half_ftab)
        tops2 = jnp.concatenate(
            [tops2, shtop.reshape(B2, 2 * smax)], axis=1)
        bots2 = jnp.concatenate(
            [bots2, shbot.reshape(B2, 2 * smax)], axis=1)
        offs2 = jnp.concatenate([offs2, sh_offs], axis=1)
        mlens2 = jnp.concatenate(
            [mlens2, jnp.full((B2, 2 * smax), hlen, jnp.int32)], axis=1)
        halfs2 = jnp.concatenate(
            [halfs2, jnp.zeros((B2, 2 * smax), bool)], axis=1)

    # ---------------- phase 3a: slot assembly ----------------
    sweep_bot = sweep.bot
    if no_exact:   # --no-exact-upfront: drop the exact-sweep phase
        sweep_bot = sweep.top
    if live_or is not None:
        # strand suppression: dead orientation rows get empty SA ranges
        sweep_bot = jnp.where(live_or, sweep_bot, sweep.top)
        bots2 = jnp.where(live_or[:, None], bots2, tops2)
    (slot_valid, slot_row, slot_or, slot_off, slot_exact, slot_mlen,
     slot_half, slot_rangej, slot_rwidth) = _assemble_slots(
        B, T, lens, live_read, sweep.top, sweep_bot, sweep.nedit,
        tops2, bots2, offs2, mlens2, halfs2, max_exact_rows)

    # ---------------- phase 3b: SA resolution of every slot ----------------
    # position/framing arithmetic from here on is signed (window starts can
    # go negative near the origin) and per-candidate, so it leaves the row
    # dtype (uint32 in the large mode) for the seg tables' dtype (int64)
    jpos = fm.sa_resolve.__wrapped__(
        half, slot_row.reshape(-1), period=period
    ).reshape(B, T).astype(seg.seg_joined_start.dtype)

    # straddle filter: matched stretch must stay inside one segment; for
    # half-read (1mm-upfront) slots the FULL read span must fit, since the
    # reference's oneMmSearch hits span the whole read in the N-excised
    # joined text (aligner_seed.cpp:975; straddles discarded by
    # joinedToTextOff)
    segi = jnp.searchsorted(seg.seg_joined_start, jpos, side="right") - 1
    seg_ok = jpos + slot_mlen <= jnp.take(seg.seg_end_joined, segi)
    r0 = jpos - slot_off.astype(jpos.dtype)
    full_ok = (r0 >= jnp.take(seg.seg_joined_start, segi)) & \
        (r0 + lens[:, None].astype(jpos.dtype)
         <= jnp.take(seg.seg_end_joined, segi))
    slot_valid &= seg_ok & (~slot_half | full_ok)
    gpos = jnp.take(seg.seg_global_start, segi) + \
        (jpos - jnp.take(seg.seg_joined_start, segi))
    anchor = gpos - slot_off.astype(gpos.dtype)
    rid = jnp.searchsorted(seg.ref_cum, gpos, side="right") - 1

    # dedupe by (orient, anchor) within each read, keep first slot; source
    # flags aggregate across the duplicate group (an anchor discoverable
    # via a seed is exempt from the half-candidate 1-mismatch gate)
    same = (slot_or[:, :, None] == slot_or[:, None, :]) & \
           (anchor[:, :, None] == anchor[:, None, :]) & \
           slot_valid[:, :, None] & slot_valid[:, None, :]
    earlier = jnp.arange(T)[None, :, None] > jnp.arange(T)[None, None, :]
    dup = (same & earlier).any(axis=2)
    seed_src = slot_valid & ~slot_half & ~slot_exact
    half_only = (same & slot_half[:, None, :]).any(axis=2) \
        & ~(same & seed_src[:, None, :]).any(axis=2) \
        & ~(same & slot_exact[:, None, :]).any(axis=2)
    # aggregated source flags across the duplicate group (the host path's
    # g_exact/g_half): the -D effort model assigns each anchor to the
    # EARLIEST phase that discovers it, so a seed-kept slot that is also a
    # half-read hit must report half=True (exported by fused_pe)
    agg_exact = (same & slot_exact[:, None, :]).any(axis=2)
    agg_half = (same & slot_half[:, None, :]).any(axis=2)
    slot_valid &= ~dup

    # ---------------- phase 4: compact -> windows -> DP ----------------
    flat_valid = slot_valid.reshape(-1)
    flat_ids = jnp.arange(B * T, dtype=jnp.int32)
    ckeys = jnp.where(flat_valid, flat_ids, BIGKEY)
    perm = jnp.argsort(ckeys, stable=True)[:NC]                  # (NC,)
    live_c = jnp.take(ckeys, perm) < BIGKEY
    ci_read = jnp.where(live_c, perm // T, 0)
    ci_slot = jnp.where(live_c, perm % T, 0)

    c_anchor = anchor[ci_read, ci_slot]
    c_or = slot_or[ci_read, ci_slot]
    c_rid = jnp.where(live_c, rid[ci_read, ci_slot], 0)
    c_half = half_only[ci_read, ci_slot] & live_c

    win_start = jnp.where(live_c, c_anchor - G,
                          jnp.zeros((), c_anchor.dtype))
    lo = jnp.take(seg.ref_cum, c_rid)
    hi = jnp.take(seg.ref_cum, c_rid + 1)
    # word-aligned window gather: the window row begins at win_start & ~31
    # and the rect's column 0 lives at col_shift (0..31)
    wins, col_shift = gather_windows_aligned.__wrapped__(
        ref_words, refn_words, win_start, lo, hi, W)
    astart = win_start - col_shift

    rows_idx = c_or * B + ci_read
    jreads_c = jnp.take(jboth, rows_idx, axis=0)
    jquals_c = jnp.take(jquals, rows_idx, axis=0)
    lens_c = jnp.where(live_c, jnp.take(lens, ci_read), 1)
    rect_cols = lens_c + 2 * G + 1

    # ungapped anchor-diagonal readout for every candidate: mismatch count
    # (half-candidate gate), exact diagonal score and any-out-of-window
    # flag (DP bypass below) — resolved by a 32-way select on the per-row
    # window shift instead of a per-element gather
    read_live = jnp.arange(Lmax, dtype=jnp.int32)[None, :] < lens_c[:, None]
    mmpen_c = mm_penalty_from_qual(jquals_c, params)
    mm_ug = jnp.zeros(NC, jnp.int32)
    d_score = jnp.zeros(NC, jnp.int32)
    d_oob = jnp.zeros(NC, bool)
    for k in range(32):
        diag_k = jax.lax.dynamic_slice_in_dim(wins, k + G, Lmax, axis=1)
        mm_k = jnp.sum(((jreads_c != diag_k) | (jreads_c >= 4)) & read_live,
                       axis=1, dtype=jnp.int32)
        isn_k = (jreads_c >= 4) | (diag_k == 4)
        oob_k = diag_k >= 5
        eq_k = (diag_k == jreads_c) & ~isn_k & ~oob_k
        sub_k = jnp.where(eq_k, params.match_bonus,
                          jnp.where(isn_k & ~oob_k, -params.n_pen,
                                    -mmpen_c))
        sc_k = jnp.sum(jnp.where(read_live & ~oob_k, sub_k, 0),
                       axis=1, dtype=jnp.int32)
        ob_k = jnp.any(read_live & oob_k, axis=1)
        sel_k = col_shift == k
        mm_ug = jnp.where(sel_k, mm_k, mm_ug)
        d_score = jnp.where(sel_k, sc_k, d_score)
        d_oob = jnp.where(sel_k, ob_k, d_oob)

    # DP-lane bypass (e2e): a candidate whose anchor diagonal lies fully
    # inside the window and has at most bypass_mm penalized positions is
    # PROVABLY diagonal-optimal — any other end-to-end path opens >= 1
    # gap, costing at least min(RDG, RFG) open+extend, strictly more than
    # bypass_mm positions at the worst per-position penalty (defaults:
    # 1 * 6 < 5 + 3). Such candidates skip the DP entirely (score, end
    # cell and origin are the diagonal's, computed above); only the
    # gapped-possible remainder is compacted into an NCDP-lane sw_banded.
    # The reference pays its SSE DP per extend; batched, the overwhelming
    # gapless case becomes one readout. Local mode keeps full DP (its
    # backtrace walks every record for soft-clip starts).
    ncdp = NC if NCDP is None else min(NCDP, NC)
    min_gap_cost = min(params.read_gap_open + params.read_gap_extend,
                       params.ref_gap_open + params.ref_gap_extend)
    max_pos_pen = max(params.mm_pen_max, params.n_pen, 1)
    bypass_mm = 0 if (params.local or params.match_bonus > 0) \
        else max((min_gap_cost - 1) // max_pos_pen, 0)
    if ncdp >= NC or bypass_mm == 0:
        res = sw_banded.__wrapped__(jreads_c, jquals_c, lens_c, wins,
                                    params, G, rect_cols, col_shift,
                                    track_origin=track_origin)
        dplane = jnp.arange(NC, dtype=jnp.int32)
        n_dpdrop = jnp.zeros((), jnp.int32)
    else:
        needs_dp = live_c & ((mm_ug > bypass_mm) | d_oob)
        dpk = jnp.where(needs_dp, jnp.arange(NC, dtype=jnp.int32), BIGKEY)
        dperm = jnp.argsort(dpk)[:ncdp]
        dlive = jnp.take(dpk, dperm) < BIGKEY
        res_dp = sw_banded.__wrapped__(
            jnp.take(jreads_c, dperm, axis=0),
            jnp.take(jquals_c, dperm, axis=0),
            jnp.where(dlive, jnp.take(lens_c, dperm), 1),
            jnp.take(wins, dperm, axis=0), params, G,
            jnp.take(rect_cols, dperm), jnp.take(col_shift, dperm),
            track_origin=track_origin)
        dpos = jnp.where(dlive, dperm, NC)
        m_score = d_score.at[dpos].set(res_dp.score, mode="drop")
        m_row = (lens_c - 1).at[dpos].set(res_dp.row, mode="drop")
        m_lane = (col_shift + G + lens_c - 1).at[dpos].set(
            res_dp.lane, mode="drop")
        m_origin = None
        if track_origin:
            m_origin = (col_shift + G).at[dpos].set(res_dp.origin,
                                                    mode="drop")
        res = SWResult(m_score, m_row, m_lane, res_dp.dirs, m_origin)
        dplane = jnp.full(NC, -1, jnp.int32).at[dpos].set(
            jnp.arange(ncdp, dtype=jnp.int32), mode="drop")
        n_dpdrop = jnp.maximum(
            jnp.sum(needs_dp.astype(jnp.int32), dtype=jnp.int32) - ncdp, 0)

    c_score = jnp.where(live_c, res.score, NEG)
    c_valid = live_c & (c_score >= jnp.take(minsc, ci_read)) & \
        ~(c_half & (mm_ug > 1))
    c_end = astart + res.lane                                     # end pos

    # per-read seed-hit demand (reference SeedResults::averageHitsPerSeed
    # numerator/denominator, bt2_search.cpp:4146 seed-boost gate): summed
    # SA widths + nonzero count of the instantiated-seed ranges (fw + rc
    # rows folded per read), BEFORE the slot budget caps anything
    seed_w_all = jnp.maximum(seed_bot - seed_top, 0).astype(jnp.int32)
    selt2 = jnp.sum(seed_w_all, axis=1, dtype=jnp.int32)
    snz2 = jnp.sum((seed_w_all > 0).astype(jnp.int32), axis=1,
                   dtype=jnp.int32)
    seed_elts = selt2[:B] + selt2[B:]
    seed_nz = snz2[:B] + snz2[B:]

    return dict(
        B=B, Lmax=Lmax, W=W, sweep=sweep, sweep_bot=sweep_bot,
        seed_elts=seed_elts, seed_nz=seed_nz,
        slot_valid=slot_valid, slot_or=slot_or, slot_exact=slot_exact,
        slot_half=slot_half, slot_rangej=slot_rangej,
        slot_rwidth=slot_rwidth, half_only=half_only,
        agg_exact=agg_exact, agg_half=agg_half,
        anchor=anchor, rid=rid, earlier=earlier,
        flat_valid=flat_valid, perm=perm, live_c=live_c,
        ci_read=ci_read, ci_slot=ci_slot,
        c_or=c_or, c_rid=c_rid, c_half=c_half,
        wins=wins, col_shift=col_shift, astart=astart,
        jreads_c=jreads_c, jquals_c=jquals_c,
        res=res, mm_ug=mm_ug, c_score=c_score, c_valid=c_valid, c_end=c_end,
        dplane=dplane, n_dpdrop=n_dpdrop)


@partial(jax.jit, static_argnames=(
    "params", "band", "seed_len", "ftab_chars", "half_ftab", "period",
    "T", "kk", "kk_bt", "NC", "n1", "max_exact_rows", "no_1mm",
    "no_exact", "NCDP"))
def fused_se(half: FMHalf, ref_words, refn_words, seg: SegTables,
             jboth, jquals, lens, offs_all, valid_all, minsc, live_read,
             live_or=None,
             *, params: SWParams, band: int, seed_len: int, ftab_chars: int,
             half_ftab: int, period: int, T: int, kk: int, kk_bt: int,
             NC: int, n1: bool, max_exact_rows: int = 4,
             no_1mm: bool = False, no_exact: bool = False,
             NCDP: int = None) -> FusedResult:
    """Whole single-end batch pipeline in one device program.

    jboth/jquals: (2B, Lmax) int32 fw+rc codes / quals; lens: (B,);
    offs_all/valid_all: (2B, smax) instantiated seed offsets (fw rows then
    rc rows); minsc: (B,) int32; live_read: (B,) bool (filters applied).
    live_or: optional (2B,) bool per-orientation-row liveness (--nofw/--norc
    strand suppression: rows < B fw, >= B rc; bt2_search.cpp:3418-3424).
    kk = ranked slots returned per read (khits+1 capped to T); kk_bt =
    slots backtraced per read; NC = DP problem budget (static).
    """
    cx = _core(half, ref_words, refn_words, seg, jboth, jquals, lens,
               offs_all, valid_all, minsc, live_read, live_or, params,
               band, seed_len, ftab_chars, half_ftab, period, T, NC, n1,
               max_exact_rows, no_1mm, no_exact, NCDP=NCDP)
    G = band
    B = cx["B"]
    (slot_or, flat_valid, perm, live_c, c_or, c_rid, wins, astart,
     jreads_c, jquals_c, res, c_score, c_valid, c_end) = (
        cx[k] for k in ("slot_or", "flat_valid", "perm", "live_c", "c_or",
                        "c_rid", "wins", "astart", "jreads_c", "jquals_c",
                        "res", "c_score", "c_valid", "c_end"))
    earlier = cx["earlier"]

    # ---------------- phase 5: per-read ranking ----------------
    # scatter compact results back to (B, T) slots
    flat_ci = jnp.where(live_c, perm, B * T)
    sc_sl = jnp.full(B * T + 1, NEG, jnp.int32).at[flat_ci].set(
        jnp.where(c_valid, c_score, NEG))[:-1].reshape(B, T)
    end_sl = jnp.zeros(B * T + 1, c_end.dtype).at[flat_ci].set(
        c_end)[:-1].reshape(B, T)
    cpos_sl = jnp.zeros(B * T + 1, jnp.int32).at[flat_ci].set(
        jnp.arange(NC, dtype=jnp.int32))[:-1].reshape(B, T)
    vd_sl = sc_sl > NEG

    # dedupe by (orient, end): representative = max score, first on ties
    same2 = (slot_or[:, :, None] == slot_or[:, None, :]) & \
            (end_sl[:, :, None] == end_sl[:, None, :]) & \
            vd_sl[:, :, None] & vd_sl[:, None, :]
    better = (sc_sl[:, None, :] > sc_sl[:, :, None]) | \
             ((sc_sl[:, None, :] == sc_sl[:, :, None]) & earlier)
    rep = vd_sl & ~(same2 & better).any(axis=2)

    # rank key: score desc, slot index asc (canonical tie-break)
    rkey = jnp.where(rep, sc_sl * 32 + (31 - jnp.arange(T, dtype=jnp.int32))
                     [None, :], NEG)
    rorder = jnp.argsort(-rkey, axis=1, stable=True)[:, :kk]     # (B, kk)
    rkey_s = jnp.take_along_axis(rkey, rorder, axis=1)
    r_valid = rkey_s > NEG
    r_score = jnp.take_along_axis(sc_sl, rorder, axis=1)
    r_score = jnp.where(r_valid, r_score, NEG)

    # ---------------- phase 6: backtrace chosen ----------------
    ch_slot = rorder[:, :kk_bt]                                  # (B, kk_bt)
    ch_ok = r_valid[:, :kk_bt]
    ch_ci = jnp.where(ch_ok,
                      jnp.take_along_axis(cpos_sl, ch_slot, axis=1),
                      0).T.reshape(-1)                           # (Bc,)
    ch_okf = ch_ok.T.reshape(-1)
    rows_sel = jnp.take(res.row, ch_ci)
    lanes_sel = jnp.take(res.lane, ch_ci)
    reads_sel = jnp.take(jreads_c, ch_ci, axis=0)
    quals_sel = jnp.take(jquals_c, ch_ci, axis=0)
    wins_sel = jnp.take(wins, ch_ci, axis=0)
    Bc = ch_ci.shape[0]
    if params.local:
        # local mode: soft-clipped starts need the walk for every record
        bt = backtrace.__wrapped__(res.dirs, ch_ci, rows_sel, lanes_sel,
                                   reads_sel, quals_sel, wins_sel, params, G)
        ops_full = bt.ops
        rdstart, refstart = bt.read_start, bt.ref_start_win
        nmm, ngo, ngc, nrefn = bt.n_mm, bt.n_go, bt.n_gc, bt.n_refn
        sccheck = bt.score_check
        n_btdrop = jnp.zeros((), jnp.int32)
    else:
        # gapless fast path: candidates whose best score equals the pure
        # diagonal score at their best cell walk that diagonal exactly
        # (DIAG wins forward ties) — synthesize their op stream in one
        # vectorized readout and scan-walk only the gapped remainder,
        # compacted to an NBT budget (overflow → host unfused fallback)
        lens_sel = rows_sel + 1                       # e2e: row = len-1
        (ops_syn, dscore, s_nmm, s_nrefn, s_base, gok) = diag_readout(
            reads_sel, quals_sel, wins_sel, rows_sel, lanes_sel,
            lens_sel, params)
        gapless = ch_okf & gok & (dscore == jnp.take(res.score, ch_ci))
        need_bt = ch_okf & ~gapless
        NBT = max(Bc // 4, 64)
        bkeys = jnp.where(need_bt, jnp.arange(Bc, dtype=jnp.int32),
                          jnp.int32(BIGKEY))
        gperm = jnp.argsort(bkeys)[:NBT]
        glive = jnp.take(bkeys, gperm) < BIGKEY
        gci = jnp.take(ch_ci, gperm)
        # DP-lane bypass: dirs exist only for the NCDP-compacted lanes;
        # a candidate needing the scan walk is by construction gapped,
        # hence DP'd (bypassed ones always satisfy dscore == score) —
        # dplane < 0 here is impossible, counted defensively as a drop
        gdpl = jnp.take(cx["dplane"], gci)
        n_dplmiss = jnp.sum((glive & (gdpl < 0)).astype(jnp.int32),
                            dtype=jnp.int32)
        glive &= gdpl >= 0
        bt = backtrace.__wrapped__(
            res.dirs, jnp.clip(gdpl, 0, None),
            jnp.take(res.row, gci), jnp.take(res.lane, gci),
            jnp.take(jreads_c, gci, axis=0), jnp.take(jquals_c, gci, axis=0),
            jnp.take(wins, gci, axis=0), params, G)
        pos = jnp.where(glive, gperm, Bc)             # dead -> dropped
        S_bt = bt.ops.shape[0]
        ops_full = jnp.full((S_bt, Bc), OP_NONE, jnp.uint8)
        ops_full = ops_full.at[:ops_syn.shape[0]].set(ops_syn)
        ops_full = ops_full.at[:, pos].set(bt.ops, mode="drop")
        z = jnp.zeros(Bc, jnp.int32)
        rdstart = z.at[pos].set(bt.read_start, mode="drop")
        refstart = s_base.at[pos].set(bt.ref_start_win, mode="drop")
        nmm = s_nmm.at[pos].set(bt.n_mm, mode="drop")
        ngo = z.at[pos].set(bt.n_go, mode="drop")
        ngc = z.at[pos].set(bt.n_gc, mode="drop")
        nrefn = s_nrefn.at[pos].set(bt.n_refn, mode="drop")
        sccheck = dscore.at[pos].set(bt.score_check, mode="drop")
        n_btdrop = jnp.maximum(
            jnp.sum(need_bt.astype(jnp.int32), dtype=jnp.int32) - NBT, 0) \
            + n_dplmiss

    g_start = jnp.take(astart, ch_ci) \
        + refstart.astype(astart.dtype)
    ch_rid = jnp.take(c_rid, ch_ci).astype(jnp.int32)
    roff = (g_start - jnp.take(seg.ref_cum, ch_rid)).astype(jnp.int32)
    # exact end-to-end sweep ranges (per orientation, rows split into two
    # int32 words for the int64 large-index mode): the RNG-replay layer
    # (pipeline/replay.py) needs the FULL ranges, not just the
    # max_exact_rows-capped slots, to model the reference's EE trajectory
    sweep = cx["sweep"]
    ee_w2 = jnp.where((sweep.nedit == 0) & (cx["sweep_bot"] > sweep.top),
                      cx["sweep_bot"] - sweep.top, 0)
    if sweep.top.dtype == jnp.int64:     # large-index mode (x64 enabled)
        mask = jnp.int64(0xFFFFFFFF)
        ee_lo = (sweep.top & mask).astype(jnp.int32)
        ee_hi = (sweep.top >> 32).astype(jnp.int32)
    else:
        ee_lo = sweep.top.astype(jnp.int32)
        ee_hi = jnp.zeros_like(ee_lo)
    Bse = ee_w2.shape[0] // 2
    ee_block = jnp.concatenate([
        ee_lo[:Bse], ee_hi[:Bse], ee_w2[:Bse].astype(jnp.int32),
        ee_lo[Bse:], ee_hi[Bse:], ee_w2[Bse:].astype(jnp.int32),
        cx["seed_elts"], cx["seed_nz"]])

    meta = jnp.concatenate([
        r_score.T.reshape(-1), r_valid.T.reshape(-1).astype(jnp.int32),
        ch_okf.astype(jnp.int32),
        jnp.take(c_or, ch_ci), ch_rid, roff,
        rdstart, rows_sel + 1,
        nmm, ngo, ngc, nrefn, sccheck,
        jnp.take(c_score, ch_ci),
        # n_dropped: candidates beyond the NC DP budget or gapped
        # backtraces beyond the NBT budget (host falls back to the
        # reference-order-preserving unfused path when nonzero)
        (jnp.maximum(jnp.sum(flat_valid.astype(jnp.int32),
                             dtype=jnp.int32) - NC, 0)
         + n_btdrop + cx["n_dpdrop"])[None],
        ee_block,
    ]).astype(jnp.int32)
    blob = jnp.concatenate([
        ops_full.reshape(-1),
        jax.lax.bitcast_convert_type(meta, jnp.uint8).reshape(-1)])
    return FusedResult(blob)


# number of per-slot scalar fields in the fused-PE metadata export (host
# decode must match pipeline/align.py PairedAligner._collect_fused)
PE_SLOT_FIELDS = 15
# per-compact-candidate fields exported for DPPool reconstruction
# (astart, rid, row, lane, score, dplane — dplane maps candidate -> DP
# lane in the NCDP-compacted dirs buffer, -1 = bypassed/gapless)
PE_CI_FIELDS = 6
# device-pairing compact exports: per-read (B2) and per-pair (Bp) fields
# (layout must match pipeline/align.py PairedAligner._collect_fused):
# read: first_cpos first_or first_lo first_hi first_s has_l
#       sec_cpos sec_s has_l2 nL
# pair: has b1_cpos b1_or b1_lo b1_hi b1_s b2_cpos b2_or b2_lo b2_hi b2_s
#       best_ss sec_ss n_kept hostneed
PE_READ_FIELDS = 10
PE_PAIR_FIELDS = 15

# pairing rank sentinel (host mirror uses 1 << 30)
PAIR_BIGR = jnp.int32(1 << 30)


class FusedPEResult(NamedTuple):
    blob: jnp.ndarray      # int32 compact vector (PE_READ_FIELDS*B2 +
                           # PE_PAIR_FIELDS*Bp + 2*B2 + PE_CI_FIELDS*NC + 1,)
                           # — the ONE transfer the fast path needs
    slots: jnp.ndarray     # int32 (PE_SLOT_FIELDS, B2, T) full per-slot
                           # metadata; pulled only on the rare host-replay
                           # path (suppression/effort corrections, k-mode)
    dirs: jnp.ndarray      # device handles kept for the emission backtrace
    jreads_c: jnp.ndarray
    jquals_c: jnp.ndarray
    wins: jnp.ndarray


def _pe_pairing(pairing, B, Bp, T_, aok, score, slot_or, rid, lo_p, hi_p,
                occ, exact, half, mmug, cpos, ee_read, seed_nz, inst_read,
                filtered):
    """Device half of PairedAligner._collect_fused's dense pairing math.

    Mirrors the host numpy line for line (same tie-break orders, argmax /
    argmin first-index semantics); the host keeps only the rare replay
    paths (suppression 1mm-legality, -D non-fast effort simulation), which
    raise `hostneed` so the host re-runs its full pairing for that batch.
    Returns (read_fields (PE_READ_FIELDS, B), pair_fields
    (PE_PAIR_FIELDS, Bp)) as int32."""
    from bowtie2_tpu.pipeline.pe import PE_DISCORD, pe_classify_jnp
    (pe_pol, minins, maxins, olap_ok, contain_ok, dove_ok, limit) = pairing
    i32 = jnp.int32
    AOK = aok.astype(bool)
    S = score
    OR = slot_or
    tj = jnp.arange(T_, dtype=i32)

    # dedupe by (orient, end): reference slot loses to a same-key slot with
    # higher score (or equal score, earlier index)
    same = (OR[:, :, None] == OR[:, None, :]) & \
           (hi_p[:, :, None] == hi_p[:, None, :]) & \
           AOK[:, :, None] & AOK[:, None, :]
    bet = (S[:, None, :] > S[:, :, None]) | \
          ((S[:, None, :] == S[:, :, None]) &
           (tj[None, None, :] < tj[None, :, None]))
    rep = AOK & ~(same & bet).any(axis=2)

    # rankpos[j] = lexsort rank under key (~rep asc, -S asc, tj asc) —
    # counted pairwise (T is small), identical to the host lexsort since
    # tj makes every key distinct
    nrep = ~rep
    s_gt = S[:, None, :] > S[:, :, None]
    s_eq = S[:, None, :] == S[:, :, None]
    t_lt = tj[None, None, :] < tj[None, :, None]
    less = (nrep[:, None, :].astype(i32) < nrep[:, :, None].astype(i32)) | \
           ((nrep[:, None, :] == nrep[:, :, None]) &
            (s_gt | (s_eq & t_lt)))
    rankpos = less.sum(axis=2, dtype=i32)

    # concordant cross-products (pairs, T, T)
    conc = (rid[:Bp, :, None] == rid[Bp:, None, :]) & \
        rep[:Bp][:, :, None] & rep[Bp:][:, None, :]
    typ = pe_classify_jnp(
        pe_pol,
        lo_p[:Bp][:, :, None], hi_p[:Bp][:, :, None],
        (OR[:Bp] == 0)[:, :, None],
        lo_p[Bp:][:, None, :], hi_p[Bp:][:, None, :],
        (OR[Bp:] == 0)[:, None, :],
        minins, maxins, olap_ok, contain_ok, dove_ok)
    conc &= typ != PE_DISCORD
    SUCC = jnp.concatenate([conc.any(axis=2), conc.any(axis=1)], axis=0)

    # zero-seed-round suppression (bt2_search.cpp:3948/:3968 `break`)
    n1e, n2e = ee_read[:Bp], ee_read[Bp:]
    swap = (n1e > 0) & (n2e > 0) & (n1e > n2e)
    inst_first = jnp.where(swap, inst_read[Bp:], inst_read[:Bp])
    snz_first = jnp.where(swap, seed_nz[Bp:], seed_nz[:Bp])
    both_ok = ~filtered[:Bp] & ~filtered[Bp:]
    supp_pair = both_ok & ((inst_first == 0) | (snz_first == 0))
    suppress = jnp.concatenate([supp_pair, supp_pair])
    half_ok = half & jnp.where(suppress[:, None], mmug <= 1, True)

    # -D fail-streak fast path; non-fast reads -> host replay
    nex = (occ & exact).sum(axis=1)
    nhf = (occ & half_ok & ~exact).sum(axis=1)
    nsd = (occ & ~exact & ~half).sum(axis=1)
    if limit is None:
        fast = jnp.ones(B, bool)
    else:
        fast = (nex <= limit) & (nhf <= limit) & \
            jnp.where(suppress, True, nsd <= limit)
    # suppressed rows with surviving half candidates need the host's full
    # oneMmSearch segment/--local legality refinement
    need_mm1 = suppress & (occ & half_ok & ~exact).any(axis=1)
    hostneed_read = (~fast) | need_mm1
    ATT = occ & jnp.where(suppress[:, None], exact | half_ok, True)
    SUC = ATT & SUCC

    # best concordant combo per pair: lexicographic (SS desc, mate-1 rank
    # asc, mate-2 rank asc), packed into one int32 key (rankpos < T)
    keep = conc & (SUC[:Bp][:, :, None] | SUC[Bp:][:, None, :])
    SS = S[:Bp][:, :, None] + S[Bp:][:, None, :]
    shift = max(T_ - 1, 1).bit_length()
    KMIN = jnp.int32(-(1 << 31) + 1)
    key = jnp.where(
        keep,
        (SS << (2 * shift)) - (rankpos[:Bp][:, :, None] << shift)
        - rankpos[Bp:][:, None, :],
        KMIN)
    flatk = key.reshape(Bp, T_ * T_)
    bestflat = jnp.argmax(flatk, axis=1).astype(i32)
    has = keep.reshape(Bp, -1).any(axis=1)
    b_s1 = bestflat // T_
    b_s2 = bestflat % T_
    ar = jnp.arange(Bp)
    best_ss = SS.reshape(Bp, -1)[ar, bestflat]
    n_kept = keep.reshape(Bp, -1).sum(axis=1, dtype=i32)
    flatk2 = flatk.at[ar, bestflat].set(KMIN)
    secflat = jnp.argmax(flatk2, axis=1)
    sec_ss = SS.reshape(Bp, -1)[ar, secflat]

    # eff-ranked heads (rescue anchors / discordant / mixed)
    att_rank = jnp.where(rep & ATT, rankpos, PAIR_BIGR)
    first_rank = att_rank.min(axis=1)
    first_slot = att_rank.argmin(axis=1).astype(i32)
    has_l = first_rank < PAIR_BIGR
    arB = jnp.arange(B)
    att_rank2 = att_rank.at[arB, first_slot].set(PAIR_BIGR)
    sec_rank = att_rank2.min(axis=1)
    sec_slot = att_rank2.argmin(axis=1).astype(i32)
    has_l2 = sec_rank < PAIR_BIGR
    nL = (rep & ATT).sum(axis=1, dtype=i32)

    def tk(arr, slot):
        return jnp.take_along_axis(arr, slot[:, None], axis=1)[:, 0]

    lo32 = lo_p.astype(i32)     # host decodes wrapped values via _u32pos
    hi32 = hi_p.astype(i32)
    read_fields = jnp.stack([
        tk(cpos, first_slot), tk(OR, first_slot), tk(lo32, first_slot),
        tk(hi32, first_slot), tk(S, first_slot), has_l.astype(i32),
        tk(cpos, sec_slot), tk(S, sec_slot), has_l2.astype(i32), nL])
    pair_fields = jnp.stack([
        has.astype(i32),
        tk(cpos[:Bp], b_s1), tk(OR[:Bp], b_s1), tk(lo32[:Bp], b_s1),
        tk(hi32[:Bp], b_s1), tk(S[:Bp], b_s1),
        tk(cpos[Bp:], b_s2), tk(OR[Bp:], b_s2), tk(lo32[Bp:], b_s2),
        tk(hi32[Bp:], b_s2), tk(S[Bp:], b_s2),
        best_ss, sec_ss, n_kept,
        (hostneed_read[:Bp] | hostneed_read[Bp:]).astype(i32)])
    return read_fields.astype(i32), pair_fields.astype(i32)


@partial(jax.jit, static_argnames=(
    "params", "band", "seed_len", "ftab_chars", "half_ftab", "period",
    "T", "NC", "n1", "max_exact_rows", "no_1mm", "no_exact", "NCDP",
    "pairing"))
def fused_pe(half: FMHalf, ref_words, refn_words, seg: SegTables,
             jboth, jquals, lens, offs_all, valid_all, minsc, live_read,
             live_or=None, inst_read=None, filtered=None,
             *, params: SWParams, band: int, seed_len: int, ftab_chars: int,
             half_ftab: int, period: int, T: int,
             NC: int, n1: bool, max_exact_rows: int = 4,
             no_1mm: bool = False,
             no_exact: bool = False, NCDP: int = None,
             pairing=None) -> FusedPEResult:
    """Paired-end search half of the pipeline in one device program.

    Same phases 1-4 as fused_se over a 2*Bpairs-read batch (mate1 rows
    first, then mate2), but instead of ranking+backtracing a top-k, exports
    EVERY candidate slot's metadata — score, orientation, exact global
    reference extents (via origin-tracking DP, no backtrace needed),
    source-phase flags and SA-range bookkeeping — so the host can replay
    the reference's pairing logic (extendSeedsPaired cross products,
    pe.cpp classification, the -D fail-streak schedule) VECTORIZED, then
    backtrace only the few records actually emitted.

    The direction matrices and compacted read/window device arrays are
    returned as live handles for that emission backtrace.
    """
    cx = _core(half, ref_words, refn_words, seg, jboth, jquals, lens,
               offs_all, valid_all, minsc, live_read, live_or, params,
               band, seed_len, ftab_chars, half_ftab, period, T, NC, n1,
               max_exact_rows, no_1mm, no_exact, track_origin=True,
               NCDP=NCDP)
    B, T_ = cx["B"], cx["slot_valid"].shape[1]
    res = cx["res"]
    live_c, perm = cx["live_c"], cx["perm"]
    flat_ci = jnp.where(live_c, perm, B * T_)

    def scat(vals, fill=0):
        return jnp.full(B * T_ + 1, fill, jnp.int32).at[flat_ci].set(
            vals.astype(jnp.int32))[:-1].reshape(B, T_)

    aok = scat(cx["c_valid"])
    score = scat(jnp.where(cx["c_valid"], cx["c_score"], NEG), fill=NEG)
    lo_full = cx["astart"] + res.origin.astype(cx["astart"].dtype)
    lo = scat(lo_full.astype(jnp.int32))
    hi = scat(cx["c_end"].astype(jnp.int32))
    rdend = scat(res.row + 1)
    cpos = scat(jnp.arange(NC, dtype=jnp.int32), fill=-1)

    sweep = cx["sweep"]
    ee2 = jnp.where((sweep.nedit == 0) & (cx["sweep_bot"] > sweep.top),
                    (cx["sweep_bot"] - sweep.top).astype(jnp.int32), 0)
    ee_read = ee2[:B] + ee2[B:]                  # fw + rc rows per read

    n_dropped = (jnp.maximum(
        jnp.sum(cx["flat_valid"].astype(jnp.int32), dtype=jnp.int32) - NC,
        0) + cx["n_dpdrop"])[None]

    # per-slot ungapped anchor-diagonal mismatch count: under the PE
    # zero-seed-round suppression (bt2_search.cpp:3948 `break`) only
    # 1mm-upfront-discoverable half candidates (<= 1 mm) survive
    mmug = scat(cx["mm_ug"])
    # per-slot e2e diagonal start (global space; int32-wrapped in the
    # large mode, decoded via _u32pos): the host gate re-derives the
    # implied 1mm-upfront hit's mismatch position/penalty from it
    anch = cx["anchor"].astype(jnp.int32)
    slot_fields = [
        cx["slot_valid"], aok.astype(bool), score, cx["slot_or"],
        cx["rid"], lo, hi, rdend, cx["agg_exact"], cx["agg_half"],
        cx["slot_rangej"], cx["slot_rwidth"], cpos, mmug, anch]
    ci_fields = [cx["astart"], cx["c_rid"], res.row, res.lane,
                 cx["c_score"], cx["dplane"]]
    slots = jnp.stack([f.astype(jnp.int32) for f in slot_fields])

    Bp = B // 2
    if pairing is not None:
        # device half of the host pairing (un-wrapped positions: the
        # large-index mode keeps true int64 extents here even though the
        # slot export wraps them to int32)
        pdt = lo_full.dtype if lo_full.dtype == jnp.int64 else jnp.int32

        def scat_p(vals, fill=0):
            return jnp.full(B * T_ + 1, fill, pdt).at[flat_ci].set(
                vals.astype(pdt))[:-1].reshape(B, T_)

        lo_p = scat_p(lo_full) if pdt != jnp.int32 else lo
        hi_p = scat_p(cx["c_end"]) if pdt != jnp.int32 else hi
        read_fields, pair_fields = _pe_pairing(
            pairing, B, Bp, T_, aok, score, cx["slot_or"], cx["rid"],
            lo_p, hi_p, cx["slot_valid"].astype(bool),
            cx["agg_exact"].astype(bool), cx["agg_half"].astype(bool),
            mmug, cpos, ee_read, cx["seed_nz"].astype(jnp.int32),
            inst_read, filtered)
    else:
        read_fields = jnp.zeros((PE_READ_FIELDS, B), jnp.int32)
        # hostneed=1 on every pair: no device decision to trust
        pair_fields = jnp.zeros((PE_PAIR_FIELDS, Bp), jnp.int32
                                ).at[PE_PAIR_FIELDS - 1].set(1)

    blob = jnp.concatenate(
        [read_fields.reshape(-1), pair_fields.reshape(-1)]
        + [ee_read.astype(jnp.int32)]
        # per-read count of round-0 seeds with a nonzero SA range: the
        # reference's rounds loop `break`s (skipping the OTHER mate's seed
        # search) when the first mate's searchAllSeeds comes up empty
        # (bt2_search.cpp:3968-3971), not only when instantiation fails
        + [cx["seed_nz"].astype(jnp.int32)]
        + [f.astype(jnp.int32).reshape(-1) for f in ci_fields]
        + [n_dropped])
    return FusedPEResult(blob, slots, res.dirs, cx["jreads_c"],
                         cx["jquals_c"], cx["wins"])
