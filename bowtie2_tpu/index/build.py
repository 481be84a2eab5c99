"""Index construction: FASTA → device-friendly FM-index arrays.

Equivalent role to the reference's bowtie2-build (bt2_build.cpp driver +
Ebwt::buildToDisk bt2_idx.h:1714), but the output layout is designed for TPU
gathers rather than 64-byte cache-line "sides" (bt2_idx.h:1867-1886):

  * BWT packed 2 bits/base into uint32 words (16 bases/word), SoA.
  * Occ checkpoints every OCC_BLOCK(=128) bases: int32[nblocks, 4] counts of
    each char strictly before the block. One LF step = gather 8 contiguous
    words + one checkpoint row, then a 128-lane unpack-compare-sum on the VPU.
  * ftab: first FTAB_CHARS chars of the query resolved with one lookup
    (reference ftab, bt2_idx.h:1476 ftabLoHi), stored as a searchsorted
    boundary array F with short-suffix disambiguation (key*2+isFull).
  * SA sample marked by TEXT POSITION (pos % 2^OFF_RATE == 0), unlike the
    reference's row marking (bt2_idx.h:1607 walkLeft): the resolve walk is
    then bounded by 2^OFF_RATE LF steps — a fixed trip count for lax.scan.
    Marked rows are a bitmask + rank checkpoints (every 128 rows), values in
    a compact int32 array.

Ambiguity handling follows the reference (ref_read.h RefRecord): N stretches
are excluded from the indexed "joined" text; a segment table maps joined
offsets back to (reference, offset) (reference.h:59 BitPairReference +
bt2_idx.h joinedToTextOff). The full reference sequences (with N) are kept
2-bit packed + N bitmask for DP window gathers (BitPairReference::getStretch
equivalent).

A mirror index over the reversed joined text is built alongside (reference's
.rev.1/2.bt2, EBWT_ENTIRE_REV bt2_idx.h:100-105) for bidirectional /
1-mismatch seed search.
"""

import json
import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from bowtie2_tpu.constants import FTAB_CHARS, OCC_BLOCK, OFF_RATE, WORDS_PER_BLOCK
from bowtie2_tpu.index.sa import suffix_array
from bowtie2_tpu.io.fastx import read_fasta


def pack_2bit(codes: np.ndarray) -> np.ndarray:
    """uint8 codes (values 0..3) → uint32 words, 16 codes/word, crumb j at bits 2j."""
    n = codes.size
    nwords = (n + 15) // 16
    padded = np.zeros(nwords * 16, dtype=np.uint32)
    padded[:n] = codes
    padded = padded.reshape(nwords, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, :]
    return np.bitwise_or.reduce(padded << shifts, axis=1).astype(np.uint32)


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """bool array → uint32 words, bit j of word w = bits[32w+j]."""
    n = bits.size
    nwords = (n + 31) // 32
    padded = np.zeros(nwords * 32, dtype=np.uint32)
    padded[:n] = bits
    padded = padded.reshape(nwords, 32)
    shifts = np.arange(32, dtype=np.uint32)[None, :]
    return np.bitwise_or.reduce(padded << shifts, axis=1).astype(np.uint32)


@dataclass
class HalfIndex:
    """One direction's FM index (host numpy arrays)."""
    n: int                    # joined text length (BWT has n+1 rows)
    z_off: int                # row whose BWT char is the sentinel
    bwt_words: np.ndarray     # uint32[ceil((n+1)/16)], padded to whole blocks
    occ_cp: np.ndarray        # int32[nblocks, 4]
    fchr: np.ndarray          # int32[5]: C[c] = first row of suffixes starting with c
    ftab: np.ndarray          # int32[2*4^K + 1] searchsorted boundaries
    ftab_chars: int
    # SA sample (may be absent for the mirror index)
    mark_words: Optional[np.ndarray] = None   # uint32[ceil((n+1)/32)] → padded
    mark_cp: Optional[np.ndarray] = None      # int32[nblocks]: marked rows < 128*b
    offs: Optional[np.ndarray] = None         # int32[n_marked]


@dataclass
class IndexData:
    """Full index (both directions + reference data). Host container."""
    ref_names: List[str]
    ref_lens: np.ndarray          # int64[nrefs] full lengths incl N
    ref_cum: np.ndarray           # int64[nrefs+1] cumulative full lengths
    # non-N segment table (joined ↔ reference mapping)
    seg_joined_start: np.ndarray  # int64[nsegs]
    seg_global_start: np.ndarray  # int64[nsegs]  (global = ref_cum[ref]+off)
    seg_len: np.ndarray           # int64[nsegs]
    # reference bases in global coordinate space
    ref_words: np.ndarray         # uint32 2-bit packed, N stored as 0
    refn_words: np.ndarray        # uint32 bitmask of N positions
    fw: HalfIndex = None
    bw: HalfIndex = None
    off_rate: int = OFF_RATE

    @property
    def n_joined(self) -> int:
        return self.fw.n

    def joined_to_global(self, jpos: np.ndarray) -> np.ndarray:
        """Joined text offsets → global reference-space offsets."""
        jpos = np.asarray(jpos, dtype=np.int64)
        seg = np.searchsorted(self.seg_joined_start, jpos, side="right") - 1
        return self.seg_global_start[seg] + (jpos - self.seg_joined_start[seg])

    def global_to_ref(self, gpos: np.ndarray):
        """Global offsets → (ref_id, ref_off)."""
        gpos = np.asarray(gpos, dtype=np.int64)
        rid = np.searchsorted(self.ref_cum, gpos, side="right") - 1
        return rid, gpos - self.ref_cum[rid]


def _build_half(text: np.ndarray, ftab_chars: int, with_sa_sample: bool,
                off_rate: int, large: bool = False) -> HalfIndex:
    """large=True stores row-space arrays (occ_cp/fchr/ftab/offs) as int64
    — the ".bt2l" analog (reference btypes.h TIndexOffU 64-bit switch,
    bt2_idx.h:100-105) — required when the joined text reaches 2^31 bp
    (GRCh38 is ~3.1 Gbp). Device kernels pick the row dtype up from the
    arrays; the small mode stays int32 (2x less HBM and faster)."""
    rdt = np.int64 if large else np.int32
    n = int(text.size)
    sa = suffix_array(text)          # length n+1, sa[0] == n
    nrows = n + 1

    # BWT chars; row with sa==0 gets placeholder 0 (A), corrected at query time
    prev = sa - 1
    z_off = int(np.nonzero(sa == 0)[0][0])
    prev[sa == 0] = 0                # text[-1] placeholder; overwritten below
    bwt = text[prev].astype(np.uint8)
    bwt[0] = text[n - 1] if n > 0 else 0   # row 0 is the sentinel suffix
    bwt[z_off] = 0                   # spurious 'A'; occ queries subtract it

    # pad rows to whole occ blocks
    nblocks = (nrows + OCC_BLOCK - 1) // OCC_BLOCK
    bwt_padded = np.zeros(nblocks * OCC_BLOCK, dtype=np.uint8)
    bwt_padded[:nrows] = bwt
    # padding must not pollute occ counts of 'A': counts are cumulative
    # checkpoints before each block, and in-block queries mask by row < i.
    bwt_words = pack_2bit(bwt_padded)

    # occ checkpoints: counts of c in bwt_padded[0 : 128*b] (includes
    # spurious A); per-block counts then an exclusive cumsum — O(n) int32.
    # Padding zeros only pollute the LAST block's 'A' count; subtract them
    # instead of materializing an n-sized validity matrix.
    blk = bwt_padded.reshape(nblocks, OCC_BLOCK)
    per_block = np.stack(
        [(blk == c).sum(axis=1) for c in range(4)],
        axis=1).astype(np.int64)
    per_block[-1, 0] -= nblocks * OCC_BLOCK - nrows
    occ_cp = np.concatenate(
        [np.zeros((1, 4), np.int64),
         np.cumsum(per_block, axis=0)[:-1]]).astype(rdt)

    # fchr: C[c] = 1 + #chars < c in text  (sentinel occupies row 0)
    counts = np.bincount(text, minlength=4)[:4]
    fchr = np.concatenate([[1], 1 + np.cumsum(counts)]).astype(rdt)[:5]

    # ftab boundaries: ftab[v] = #suffixes whose disambiguated K-char key
    # (key*2 + isFull) is < v. The count is ORDER-INDEPENDENT, so no SA
    # gather and no sorted-key array are needed at all: build per-position
    # keys with sequential shifted adds (cache-friendly), histogram them
    # chunked (the 2*4^K-bin counts stay cache-resident), prefix-sum.
    # Replaces a 100M-element searchsorted that cost ~25% of total build.
    K = ftab_chars
    assert K <= 15, "ftab keys are uint32 (4^15 max)"
    keys_text = np.zeros(n + 1, dtype=np.uint32)
    tpad = np.concatenate([text, np.zeros(K + 1, np.uint8)])
    for j in range(K):
        keys_text *= 4
        keys_text += tpad[j:j + n + 1]
    keys_text *= 2
    keys_text[:max(n - K + 1, 0)] += 1      # isFull: suffix has >= K chars
    nbin = 2 * 4**K
    counts_k = np.zeros(nbin, dtype=np.int64)
    CH = 1 << 28
    for s in range(0, n + 1, CH):
        counts_k += np.bincount(keys_text[s:s + CH], minlength=nbin)
    del keys_text
    ftab = np.concatenate(
        [[0], np.cumsum(counts_k)]).astype(rdt)
    del counts_k

    half = HalfIndex(
        n=n, z_off=z_off, bwt_words=bwt_words, occ_cp=occ_cp, fchr=fchr,
        ftab=ftab, ftab_chars=K,
    )

    if with_sa_sample:
        period = 1 << off_rate
        marked = (sa % period) == 0
        marked_padded = np.zeros(nblocks * OCC_BLOCK, dtype=bool)
        marked_padded[:nrows] = marked
        half.mark_words = pack_bits(marked_padded)
        mcsum = np.concatenate([[0], np.cumsum(marked_padded)])
        half.mark_cp = mcsum[:: OCC_BLOCK][:nblocks].astype(np.int32)
        half.offs = sa[marked].astype(rdt)
    return half


def build_index(fasta_path: str, ftab_chars: int = FTAB_CHARS,
                off_rate: int = OFF_RATE, mirror: bool = False,
                large: Optional[bool] = None) -> IndexData:
    refs = read_fasta(fasta_path)
    if not refs:
        raise ValueError(f"no sequences in {fasta_path}")
    return build_index_from_refs(refs, ftab_chars, off_rate, mirror, large)


def build_index_from_refs(refs, ftab_chars: int = FTAB_CHARS,
                          off_rate: int = OFF_RATE, mirror: bool = False,
                          large: Optional[bool] = None) -> IndexData:
    """refs: [(name, uint8 codes incl N)]. mirror=True additionally builds
    the reversed-text index (the reference's .rev.1/2.bt2); no current
    search path uses it (kept for future in-index bidirectional -N 1
    work), so default off."""
    names = [r[0] for r in refs]
    lens = np.array([r[1].size for r in refs], dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(lens)])

    # segment table: non-N stretches, in order
    seg_j, seg_g, seg_l = [], [], []
    joined_parts = []
    jpos = 0
    for ri, (_, codes) in enumerate(refs):
        isn = codes >= 4
        # boundaries of non-N runs
        d = np.diff(np.concatenate([[1], isn.view(np.int8), [1]]).astype(np.int8))
        starts = np.nonzero(d == -1)[0]
        ends = np.nonzero(d == 1)[0]
        for s, e in zip(starts, ends):
            seg_j.append(jpos)
            seg_g.append(cum[ri] + s)
            seg_l.append(e - s)
            joined_parts.append(codes[s:e])
            jpos += e - s
    if jpos == 0:
        raise ValueError("reference contains no unambiguous (non-N) bases")
    joined = np.concatenate(joined_parts).astype(np.uint8)

    # global reference arrays (N stored as A + N bitmask)
    allcodes = np.concatenate([r[1] for r in refs]).astype(np.uint8)
    nmask = allcodes >= 4
    packed_src = np.where(nmask, 0, allcodes).astype(np.uint8)

    data = IndexData(
        ref_names=names, ref_lens=lens, ref_cum=cum,
        seg_joined_start=np.array(seg_j, dtype=np.int64),
        seg_global_start=np.array(seg_g, dtype=np.int64),
        seg_len=np.array(seg_l, dtype=np.int64),
        ref_words=pack_2bit(packed_src),
        refn_words=pack_bits(nmask),
        off_rate=off_rate,
    )
    if large is None:
        # auto: int64 row space once the joined text nears 2^31 rows
        # (reference bowtie2-build picks .bt2l past ~4 GB, bowtie2-build:61)
        large = jpos >= (1 << 31) - 64
    data.fw = _build_half(joined, ftab_chars, True, off_rate, large)
    if mirror:
        data.bw = _build_half(joined[::-1].copy(), ftab_chars, False,
                              off_rate, large)
    return data


# ---------------------------- save / load ----------------------------

def save_index(data: IndexData, prefix: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(prefix)) or ".", exist_ok=True)
    meta = {
        "version": 1,
        "ref_names": data.ref_names,
        "off_rate": data.off_rate,
        "fw": {"n": data.fw.n, "z_off": data.fw.z_off, "ftab_chars": data.fw.ftab_chars},
        "bw": None if data.bw is None else
              {"n": data.bw.n, "z_off": data.bw.z_off, "ftab_chars": data.bw.ftab_chars},
    }
    arrays = {
        "ref_lens": data.ref_lens, "ref_cum": data.ref_cum,
        "seg_joined_start": data.seg_joined_start,
        "seg_global_start": data.seg_global_start, "seg_len": data.seg_len,
        "ref_words": data.ref_words, "refn_words": data.refn_words,
    }
    for tag, h in (("fw", data.fw), ("bw", data.bw)):
        if h is None:
            continue
        arrays[f"{tag}_bwt"] = h.bwt_words
        arrays[f"{tag}_occ"] = h.occ_cp
        arrays[f"{tag}_fchr"] = h.fchr
        arrays[f"{tag}_ftab"] = h.ftab
        if h.mark_words is not None:
            arrays[f"{tag}_mark"] = h.mark_words
            arrays[f"{tag}_markcp"] = h.mark_cp
            arrays[f"{tag}_offs"] = h.offs
    np.savez_compressed(prefix + ".bt2t.npz", **arrays)
    with open(prefix + ".bt2t.json", "w") as f:
        json.dump(meta, f)


def load_index(prefix: str) -> IndexData:
    with open(prefix + ".bt2t.json") as f:
        meta = json.load(f)
    z = np.load(prefix + ".bt2t.npz")

    def half(tag):
        m = meta[tag]
        if m is None:
            return None
        h = HalfIndex(
            n=m["n"], z_off=m["z_off"], bwt_words=z[f"{tag}_bwt"],
            occ_cp=z[f"{tag}_occ"], fchr=z[f"{tag}_fchr"], ftab=z[f"{tag}_ftab"],
            ftab_chars=m["ftab_chars"],
        )
        if f"{tag}_mark" in z:
            h.mark_words = z[f"{tag}_mark"]
            h.mark_cp = z[f"{tag}_markcp"]
            h.offs = z[f"{tag}_offs"]
        return h

    return IndexData(
        ref_names=meta["ref_names"], ref_lens=z["ref_lens"], ref_cum=z["ref_cum"],
        seg_joined_start=z["seg_joined_start"],
        seg_global_start=z["seg_global_start"], seg_len=z["seg_len"],
        ref_words=z["ref_words"], refn_words=z["refn_words"],
        fw=half("fw"), bw=half("bw"), off_rate=meta["off_rate"],
    )
