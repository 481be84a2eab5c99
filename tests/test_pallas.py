"""Pallas SW kernel vs the XLA path (bit-identical where supported)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from bowtie2_tpu.ops.sw import SWParams, sw_banded, unpack_dirs  # noqa: E402


@pytest.mark.parametrize("local", [False, True], ids=["e2e", "local"])
def test_pallas_sw_matches_xla(rng, local):
    try:
        from bowtie2_tpu.ops.pallas_sw import TB, sw_pallas
    except Exception as e:
        pytest.skip(f"pallas unavailable: {e}")
    import jax.numpy as jnp
    p = SWParams(match_bonus=2 if local else 0, local=local)
    B, L, G = 2 * 64, 64, 16
    W = L + 2 * G + 1
    if B % TB:
        pytest.skip("B must divide TB")
    reads = rng.integers(0, 4, (B, L)).astype(np.int32)
    wins = rng.integers(0, 4, (B, W)).astype(np.int32)
    wins[:, G:G + L] = reads
    for b in range(B):
        for _ in range(b % 5):
            wins[b, G + rng.integers(0, L)] = rng.integers(0, 4)
    quals = rng.integers(5, 41, (B, L)).astype(np.int32)
    lens = np.full(B, L, np.int32)
    lens[::7] = L - 9
    a = sw_banded(jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
                  jnp.asarray(wins), p, G)
    b_ = sw_pallas(jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
                   jnp.asarray(wins), p, G)
    np.testing.assert_array_equal(np.asarray(a.score), np.asarray(b_.score))
    np.testing.assert_array_equal(np.asarray(a.row), np.asarray(b_.row))
    np.testing.assert_array_equal(np.asarray(a.lane), np.asarray(b_.lane))
    # XLA path packs dirs 8 cells/int32 word; the pallas kernel emits
    # per-cell uint8 — unpack before comparing
    np.testing.assert_array_equal(unpack_dirs(a.dirs, W),
                                  np.asarray(b_.dirs))
