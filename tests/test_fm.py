"""FM-index device ops vs brute-force numpy oracles."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from bowtie2_tpu.index.build import build_index_from_refs  # noqa: E402
from bowtie2_tpu.index.fmindex import FMIndex  # noqa: E402
from bowtie2_tpu.index.sa import suffix_array_doubling  # noqa: E402
from bowtie2_tpu.ops import fm  # noqa: E402


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(7)
    text = rng.integers(0, 4, 1000).astype(np.uint8)
    data = build_index_from_refs([("r", text)], ftab_chars=4)
    idx = FMIndex.from_host(data)
    sa = suffix_array_doubling(text)
    return text, data, idx, sa


def _occurrences(text, pat):
    n = text.size
    m = len(pat)
    return sorted(p for p in range(n - m + 1)
                  if np.array_equal(text[p:p + m], pat))


def test_occ_and_lf(small):
    text, data, idx, sa = small
    n = text.size
    bwt = np.array([-1 if sa[r] == 0 else int(text[sa[r] - 1])
                    for r in range(n + 1)])
    ii = np.array([0, 1, 5, 127, 128, 129, 500, n, n + 1], dtype=np.int32)
    for c in range(4):
        got = jax.vmap(fm.occ, in_axes=(None, 0, None))(idx.fw, ii, jnp.int32(c))
        want = np.array([np.sum(bwt[:i] == c) for i in ii])
        np.testing.assert_array_equal(np.asarray(got), want)
    got4 = jax.vmap(fm.occ4, in_axes=(None, 0))(idx.fw, ii)
    for k, i in enumerate(ii):
        np.testing.assert_array_equal(
            np.asarray(got4)[k], [np.sum(bwt[:i] == c) for c in range(4)])


def test_seed_search_exact(small):
    text, data, idx, sa = small
    rng = np.random.default_rng(3)
    S = 16
    # half real substrings (must be found), half random (may or may not exist)
    seeds = []
    for k in range(32):
        if k % 2 == 0:
            p = rng.integers(0, text.size - S)
            seeds.append(text[p:p + S])
        else:
            seeds.append(rng.integers(0, 4, S).astype(np.uint8))
    seeds = np.array(seeds, dtype=np.int32)
    valid = np.ones(32, dtype=bool)
    top, bot = fm.seed_search_exact(idx.fw, jnp.asarray(seeds),
                                    jnp.asarray(valid), S)
    top, bot = np.asarray(top), np.asarray(bot)
    for k in range(32):
        occs = _occurrences(text, seeds[k])
        assert bot[k] - top[k] == len(occs), k
        got_pos = sorted(int(sa[r]) for r in range(top[k], bot[k]))
        assert got_pos == occs, k


def test_exact_sweep(small):
    text, data, idx, sa = small
    rng = np.random.default_rng(4)
    Lmax = 60
    B = 16
    reads = np.full((B, Lmax), 0, dtype=np.int32)
    lens = np.zeros(B, dtype=np.int32)
    expect_exact = np.zeros(B, dtype=bool)
    for k in range(B):
        L = int(rng.integers(30, Lmax + 1))
        p = int(rng.integers(0, text.size - L))
        r = text[p:p + L].astype(np.int32).copy()
        if k % 2 == 1:
            r[L // 2] = (r[L // 2] + 1) % 4  # plant one mismatch
        reads[k, :L] = r
        lens[k] = L
        expect_exact[k] = (k % 2 == 0)
    res = fm.exact_sweep(idx.fw, jnp.asarray(reads), jnp.asarray(lens))
    nedit = np.asarray(res.nedit)
    top, bot = np.asarray(res.top), np.asarray(res.bot)
    for k in range(B):
        if expect_exact[k]:
            assert nedit[k] == 0
            occs = _occurrences(text, reads[k, :lens[k]])
            assert bot[k] - top[k] == len(occs)
        else:
            assert nedit[k] >= 1


def test_sa_resolve(small):
    text, data, idx, sa = small
    rng = np.random.default_rng(5)
    rows = rng.integers(0, text.size + 1, 64).astype(np.int32)
    got = fm.sa_resolve(idx.fw, jnp.asarray(rows), period=32)
    np.testing.assert_array_equal(np.asarray(got), sa[rows])


def test_ftab_matches_stepwise(small):
    text, data, idx, sa = small
    rng = np.random.default_rng(6)
    K = 4
    for _ in range(20):
        kmer = rng.integers(0, 4, K).astype(np.int64)
        key = int(sum(int(c) * 4 ** (K - 1 - j) for j, c in enumerate(kmer)))
        lo, hi = fm.ftab_lookup(idx.fw, jnp.int64(key))
        occs = _occurrences(text, kmer)
        assert int(hi) - int(lo) == len(occs)
