"""Native SA-IS vs the NumPy prefix-doubling oracle."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sais():
    try:
        from bowtie2_tpu.native import sais as m
    except Exception as e:  # no compiler in env — fallback path still works
        pytest.skip(f"native build unavailable: {e}")
    return m


def test_sais_matches_doubling(sais, rng):
    from bowtie2_tpu.index.sa import suffix_array_doubling
    for _ in range(100):
        n = int(rng.integers(1, 200))
        k = int(rng.integers(1, 5))
        t = rng.integers(0, k, n).astype(np.uint8)
        np.testing.assert_array_equal(sais.suffix_array(t),
                                      suffix_array_doubling(t))
    for t in (np.zeros(257, np.uint8),
              np.tile([0, 1], 100).astype(np.uint8),
              np.tile([3, 3, 0], 67).astype(np.uint8)):
        np.testing.assert_array_equal(sais.suffix_array(t),
                                      suffix_array_doubling(t))


def test_sais_genome_scale(sais, rng):
    from bowtie2_tpu.index.sa import suffix_array_doubling
    t = rng.integers(0, 4, 100_000).astype(np.uint8)
    np.testing.assert_array_equal(sais.suffix_array(t),
                                  suffix_array_doubling(t))
