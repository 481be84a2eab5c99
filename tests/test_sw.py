"""Banded DP kernel vs unbanded numpy oracle + backtrace consistency."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from bowtie2_tpu.ops.sw import unpack_dirs, SWParams, sw_banded, sw_full_numpy  # noqa: E402
from bowtie2_tpu.pipeline.backtrace import backtrace_one  # noqa: E402

E2E = SWParams()
LOCAL = SWParams(match_bonus=2, local=True)


def _make_problem(rng, L, G, n_mm=0, n_ins=0, n_del=0, with_n=False):
    """Plant a read derived from the middle of a random ref window."""
    W = L + 2 * G + 1
    refwin = rng.integers(0, 4, W).astype(np.int32)
    # read = refwin[G : G+L] mutated
    read = refwin[G:G + L].copy()
    for _ in range(n_mm):
        p = rng.integers(L // 4, 3 * L // 4)
        read[p] = (read[p] + rng.integers(1, 4)) % 4
    for _ in range(n_ins):  # insertion in read: add a char
        p = int(rng.integers(L // 4, 3 * L // 4))
        read = np.concatenate([read[:p], [rng.integers(0, 4)], read[p:]])[:L]
    for _ in range(n_del):  # deletion: remove a char, extend from window
        p = int(rng.integers(L // 4, 3 * L // 4))
        read = np.concatenate([read[:p], read[p + 1:], [refwin[G + L]]])[:L]
    if with_n:
        read[L // 2] = 4
    quals = rng.integers(10, 41, L).astype(np.int32)
    return read.astype(np.int32), quals, refwin


@pytest.mark.parametrize("params", [E2E, LOCAL], ids=["e2e", "local"])
def test_banded_matches_oracle_random(rng, params):
    G, L = 8, 40
    B = 24
    reads, quals, wins = [], [], []
    for k in range(B):
        r, q, w = _make_problem(
            rng, L, G, n_mm=k % 4, n_ins=(k // 4) % 2, n_del=(k // 8) % 2,
            with_n=(k % 5 == 0))
        reads.append(r)
        quals.append(q)
        wins.append(w)
    reads = np.stack(reads)
    quals = np.stack(quals)
    wins = np.stack(wins)
    lens = np.full(B, L, np.int32)
    res = sw_banded(jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
                    jnp.asarray(wins), params, G)
    scores = np.asarray(res.score)
    for k in range(B):
        want = sw_full_numpy(reads[k], quals[k], wins[k], params)
        assert scores[k] == want, (k, scores[k], want)


@pytest.mark.parametrize("params", [E2E, LOCAL], ids=["e2e", "local"])
def test_backtrace_score_consistency(rng, params):
    G, L = 8, 50
    B = 32
    reads, quals, wins = [], [], []
    for k in range(B):
        r, q, w = _make_problem(rng, L, G, n_mm=k % 5, n_ins=k % 3, n_del=k % 2)
        reads.append(r)
        quals.append(q)
        wins.append(w)
    reads, quals, wins = np.stack(reads), np.stack(quals), np.stack(wins)
    lens = np.full(B, L, np.int32)
    res = sw_banded(jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
                    jnp.asarray(wins), params, G)
    dirs = unpack_dirs(res.dirs, wins.shape[1])
    for k in range(B):
        tb = backtrace_one(dirs[:, k], int(res.row[k]), int(res.lane[k]),
                           reads[k], quals[k], wins[k], params)
        assert tb.score_check == int(res.score[k]), k
        # read chars consumed must equal aligned span
        n_read = sum(ln for op, ln in tb.ops if op in ("M", "I"))
        assert n_read == tb.read_end - tb.read_start
        if not params.local:
            assert tb.read_start == 0 and tb.read_end == L
        # ref chars consumed = M + D
        n_ref = sum(ln for op, ln in tb.ops if op in ("M", "D"))
        assert n_ref == tb.ref_len


def test_perfect_match_and_positions(rng):
    G, L = 8, 30
    read, quals, win = _make_problem(rng, L, G)
    res = sw_banded(jnp.asarray(read[None]), jnp.asarray(quals[None]),
                    jnp.asarray([L], np.int32), jnp.asarray(win[None]), E2E, G)
    assert int(res.score[0]) == 0
    tb = backtrace_one(unpack_dirs(res.dirs, win.size)[:, 0], int(res.row[0]),
                       int(res.lane[0]), read, quals, win, E2E)
    assert tb.ops == [("M", L)]
    assert tb.ref_start_win == G
    assert tb.md_parts == [str(L)]


def test_known_indel_cigar(rng):
    # read with a 2-base deletion relative to ref (read gap): CIGAR M D M
    G = 8
    ref = rng.integers(0, 4, 60).astype(np.int32)
    read = np.concatenate([ref[G:G + 15], ref[G + 17:G + 32]]).astype(np.int32)
    L = read.size
    win = ref[:L + 2 * G + 1].astype(np.int32)
    quals = np.full(L, 40, np.int32)
    res = sw_banded(jnp.asarray(read[None]), jnp.asarray(quals[None]),
                    jnp.asarray([L], np.int32), jnp.asarray(win[None]), E2E, G)
    # score: 2-gap = -(5 + 3*2) = -11
    assert int(res.score[0]) == -11
    tb = backtrace_one(unpack_dirs(res.dirs, win.size)[:, 0], int(res.row[0]),
                       int(res.lane[0]), read, quals, win, E2E)
    # deletion placement may shift within equal-score runs; totals must hold
    assert sum(n for op, n in tb.ops if op == "M") == 30
    assert sum(n for op, n in tb.ops if op == "D") == 2
    assert tb.n_gap_opens == 1 and tb.n_gap_chars == 2
    md = "".join(tb.md_parts)
    assert "^" in md


def test_out_of_bounds_window_blocked(rng):
    # window marked out-of-reference on the right: alignment must not use it
    G, L = 8, 20
    read, quals, win = _make_problem(rng, L, G)
    win2 = win.copy()
    win2[G + L - 5:] = 5  # last 5 read positions have no valid ref
    res = sw_banded(jnp.asarray(read[None]), jnp.asarray(quals[None]),
                    jnp.asarray([L], np.int32), jnp.asarray(win2[None]), E2E, G)
    want = sw_full_numpy(read, quals, win2, E2E)
    assert int(res.score[0]) == want
    assert int(res.score[0]) < 0  # forced mismatches/gaps, not the clean hit


@pytest.mark.parametrize("params", [E2E, LOCAL], ids=["e2e", "local"])
def test_device_backtrace_matches_host(rng, params):
    from bowtie2_tpu.ops.sw import backtrace
    from bowtie2_tpu.pipeline.backtrace import cigar_md_from_packed

    G, L = 8, 50
    B = 32
    reads, quals, wins = [], [], []
    for k in range(B):
        r, q, w = _make_problem(rng, L, G, n_mm=k % 5, n_ins=k % 3, n_del=k % 2)
        reads.append(r)
        quals.append(q)
        wins.append(w)
    reads, quals, wins = np.stack(reads), np.stack(quals), np.stack(wins)
    lens = np.full(B, L, np.int32)
    res = sw_banded(jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
                    jnp.asarray(wins), params, G)
    sel = np.arange(B, dtype=np.int32)
    bt = backtrace(res.dirs, jnp.asarray(sel), res.row, res.lane,
                   jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(wins),
                   params, G)
    ops_host = np.asarray(bt.ops)
    dirs = unpack_dirs(res.dirs, wins.shape[1])
    for k in range(B):
        want = backtrace_one(dirs[:, k], int(res.row[k]), int(res.lane[k]),
                             reads[k], quals[k], wins[k], params)
        assert int(bt.score_check[k]) == want.score_check == int(res.score[k]), k
        assert int(bt.read_start[k]) == want.read_start, k
        assert int(bt.ref_start_win[k]) == want.ref_start_win, k
        assert int(bt.n_mm[k]) == want.n_mm, k
        assert int(bt.n_go[k]) == want.n_gap_opens, k
        assert int(bt.n_gc[k]) == want.n_gap_chars, k
        cigar, md = cigar_md_from_packed(ops_host[:, k],
                                         int(bt.read_start[k]),
                                         int(res.row[k]) + 1, L)
        want_cigar = list(want.ops)
        if want.read_end < L:
            want_cigar.append(("S", L - want.read_end))
        assert cigar == want_cigar, k
        assert md == "".join(want.md_parts), k


@pytest.mark.parametrize("params", [E2E, LOCAL], ids=["e2e", "local"])
def test_origin_tracking_matches_backtrace(rng, params):
    """track_origin's per-candidate ref start must equal what the
    backtrace reports (exact extents without backtracing — the fused PE
    classifier's contract)."""
    from bowtie2_tpu.ops.sw import backtrace

    G, L = 8, 50
    B = 48
    reads, quals, wins = [], [], []
    for k in range(B):
        r, q, w = _make_problem(rng, L, G, n_mm=k % 5, n_ins=k % 3,
                                n_del=k % 4, with_n=(k % 7 == 0))
        reads.append(r)
        quals.append(q)
        wins.append(w)
    reads, quals, wins = np.stack(reads), np.stack(quals), np.stack(wins)
    lens = np.full(B, L, np.int32)
    res = sw_banded(jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
                    jnp.asarray(wins), params, G, track_origin=True)
    res0 = sw_banded(jnp.asarray(reads), jnp.asarray(quals),
                     jnp.asarray(lens), jnp.asarray(wins), params, G)
    # tracking must not perturb scores/coords
    assert np.array_equal(np.asarray(res.score), np.asarray(res0.score))
    assert np.array_equal(np.asarray(res.lane), np.asarray(res0.lane))
    sel = np.arange(B, dtype=np.int32)
    bt = backtrace(res.dirs, jnp.asarray(sel), res.row, res.lane,
                   jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(wins),
                   params, G)
    np.testing.assert_array_equal(np.asarray(res.origin),
                                  np.asarray(bt.ref_start_win))


@pytest.mark.parametrize("params", [E2E, LOCAL], ids=["e2e", "local"])
def test_diag_kernel_matches_rect(rng, params):
    """The long-read diagonal-band kernel must reproduce the rectangle
    kernel's scores/positions and a consistent backtrace for
    --dpad-bounded alignments."""
    from bowtie2_tpu.ops.sw import backtrace_diag, sw_banded_diag

    G, L = 10, 80
    B = 32
    reads, quals, wins = [], [], []
    for k in range(B):
        r, q, w = _make_problem(rng, L, G, n_mm=k % 4, n_ins=k % 3,
                                n_del=k % 2, with_n=(k % 6 == 0))
        reads.append(r)
        quals.append(q)
        wins.append(w)
    reads, quals, wins = np.stack(reads), np.stack(quals), np.stack(wins)
    lens = np.full(B, L, np.int32)
    r0 = sw_banded(jnp.asarray(reads), jnp.asarray(quals),
                   jnp.asarray(lens), jnp.asarray(wins), params, G)
    r1 = sw_banded_diag(jnp.asarray(reads), jnp.asarray(quals),
                        jnp.asarray(lens), jnp.asarray(wins), params, G)
    np.testing.assert_array_equal(np.asarray(r0.score), np.asarray(r1.score))
    # rect column of the diag result = row + band lane
    np.testing.assert_array_equal(
        np.asarray(r0.lane), np.asarray(r1.row) + np.asarray(r1.lane))
    sel = np.arange(B, dtype=np.int32)
    bt = backtrace_diag(r1.dirs, jnp.asarray(sel), r1.row, r1.lane,
                        jnp.asarray(reads), jnp.asarray(quals),
                        jnp.asarray(wins), params, G)
    np.testing.assert_array_equal(np.asarray(bt.score_check),
                                  np.asarray(r0.score))
    from bowtie2_tpu.ops.sw import backtrace
    bt0 = backtrace(r0.dirs, jnp.asarray(sel), r0.row, r0.lane,
                    jnp.asarray(reads), jnp.asarray(quals),
                    jnp.asarray(wins), params, G)
    np.testing.assert_array_equal(np.asarray(bt.ref_start_win),
                                  np.asarray(bt0.ref_start_win))
    np.testing.assert_array_equal(np.asarray(bt.read_start),
                                  np.asarray(bt0.read_start))
    np.testing.assert_array_equal(np.asarray(bt.n_mm), np.asarray(bt0.n_mm))
    np.testing.assert_array_equal(np.asarray(bt.n_gc), np.asarray(bt0.n_gc))
