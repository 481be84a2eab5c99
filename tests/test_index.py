"""Index construction invariants: SA, BWT/occ, ftab, SA sample, segments."""

import numpy as np
import pytest

from bowtie2_tpu.constants import encode_seq
from bowtie2_tpu.index.build import (build_index_from_refs, load_index,
                                     pack_2bit, pack_bits, save_index)
from bowtie2_tpu.index.sa import suffix_array_doubling


def naive_sa(text):
    n = len(text)
    suf = sorted(range(n + 1), key=lambda i: tuple(text[i:]) + (-1,))
    # sentinel sorts first: represent suffix i as tuple(text[i:]) then sentinel
    suf = sorted(range(n + 1), key=lambda i: (tuple(int(x) for x in text[i:]), ))
    # tuples compare elementwise; shorter prefix-equal sorts first == sentinel smallest
    return np.array(suf)


@pytest.mark.parametrize("n", [1, 2, 13, 100, 1000])
def test_suffix_array_matches_naive(rng, n):
    text = rng.integers(0, 4, n).astype(np.uint8)
    got = suffix_array_doubling(text)
    want = naive_sa(text)
    np.testing.assert_array_equal(got, want)


def test_pack_roundtrip(rng):
    codes = rng.integers(0, 4, 100).astype(np.uint8)
    words = pack_2bit(codes)
    unpacked = np.array([(words[i // 16] >> (2 * (i % 16))) & 3 for i in range(100)])
    np.testing.assert_array_equal(unpacked, codes)
    bits = rng.integers(0, 2, 100).astype(bool)
    bw = pack_bits(bits)
    ub = np.array([(bw[i // 32] >> (i % 32)) & 1 for i in range(100)]).astype(bool)
    np.testing.assert_array_equal(ub, bits)


def _rand_refs(rng, sizes, with_n=False):
    refs = []
    for k, sz in enumerate(sizes):
        codes = rng.integers(0, 4, sz).astype(np.uint8)
        if with_n and sz > 20:
            codes[5:9] = 4
            codes[sz // 2] = 4
        refs.append((f"ref{k}", codes))
    return refs


def test_bwt_occ_fchr(rng):
    refs = _rand_refs(rng, [500])
    data = build_index_from_refs(refs, ftab_chars=4)
    h = data.fw
    text = refs[0][1]
    n = text.size
    sa = suffix_array_doubling(text)
    # reconstruct bwt with sentinel semantics
    bwt = []
    for r in range(n + 1):
        p = sa[r]
        bwt.append(-1 if p == 0 else int(text[p - 1]))
    # fchr: first row of suffixes starting with c = 1 (sentinel) + #chars < c
    firsts = [1 + int(np.sum(text < c)) for c in range(4)]
    np.testing.assert_array_equal(h.fchr[:4], firsts)
    # occ via checkpoints at a few i values
    from bowtie2_tpu.constants import OCC_BLOCK
    for i in [0, 1, 63, 128, 129, 200, n, n + 1]:
        for c in range(4):
            want = sum(1 for x in bwt[:i] if x == c)
            block = i // OCC_BLOCK
            # emulate device query
            crumbs = [(h.bwt_words[w // 16] >> (2 * (w % 16))) & 3
                      for w in range(block * OCC_BLOCK, block * OCC_BLOCK + OCC_BLOCK)]
            inb = sum(1 for j, cr in enumerate(crumbs)
                      if cr == c and block * OCC_BLOCK + j < i)
            got = int(h.occ_cp[block, c]) + inb - (1 if c == 0 and i > h.z_off else 0)
            assert got == want, (i, c)


def test_ftab_ranges(rng):
    refs = _rand_refs(rng, [800])
    K = 4
    data = build_index_from_refs(refs, ftab_chars=K)
    h = data.fw
    text = refs[0][1]
    n = text.size
    sa = suffix_array_doubling(text)
    # every K-mer's range must equal brute-force suffix matches
    for _ in range(50):
        kmer = rng.integers(0, 4, K)
        key = int(sum(int(c) * 4 ** (K - 1 - j) for j, c in enumerate(kmer)))
        lo, hi = int(h.ftab[2 * key + 1]), int(h.ftab[2 * key + 2])
        want = [r for r in range(n + 1)
                if sa[r] + K <= n and np.array_equal(text[sa[r]:sa[r] + K], kmer)]
        assert list(range(lo, hi)) == want


def test_sa_sample_and_segments(rng):
    refs = _rand_refs(rng, [300, 200], with_n=True)
    data = build_index_from_refs(refs, ftab_chars=4)
    h = data.fw
    # joined text = concat of non-N segments
    joined = np.concatenate(
        [refs[0][1][refs[0][1] < 4], refs[1][1][refs[1][1] < 4]])
    assert h.n == joined.size
    sa = suffix_array_doubling(joined)
    marked = (sa % (1 << data.off_rate)) == 0
    np.testing.assert_array_equal(h.offs, sa[marked])
    # joined→global→ref mapping round trip
    jpos = np.arange(h.n)
    gpos = data.joined_to_global(jpos)
    rid, roff = data.global_to_ref(gpos)
    # mapped base must equal joined base
    for j in range(0, h.n, 37):
        r, o = int(rid[j]), int(roff[j])
        assert refs[r][1][o] == joined[j]


def test_save_load_roundtrip(tmp_path, rng):
    refs = _rand_refs(rng, [300], with_n=True)
    data = build_index_from_refs(refs, ftab_chars=4)
    save_index(data, str(tmp_path / "idx"))
    back = load_index(str(tmp_path / "idx"))
    np.testing.assert_array_equal(back.fw.bwt_words, data.fw.bwt_words)
    np.testing.assert_array_equal(back.fw.offs, data.fw.offs)
    if data.bw is not None:
        np.testing.assert_array_equal(back.bw.bwt_words, data.bw.bwt_words)
    assert back.ref_names == data.ref_names
    assert back.fw.z_off == data.fw.z_off
