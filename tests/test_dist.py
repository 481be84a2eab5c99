"""Multi-chip data-parallel execution on the virtual CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from bowtie2_tpu.dist.mesh import make_mesh  # noqa: E402
from bowtie2_tpu.index.build import build_index_from_refs  # noqa: E402
from bowtie2_tpu.io.fastx import SeqRecord  # noqa: E402
from bowtie2_tpu.pipeline.align import PairedAligner, UnpairedAligner  # noqa: E402
from bowtie2_tpu.pipeline.policy import make_policy  # noqa: E402


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, 20000).astype(np.uint8)
    data = build_index_from_refs([("t", genome)], ftab_chars=4)
    return genome, data


def _reads(genome, n, rng, L=64):
    out = []
    for i in range(n):
        p = int(rng.integers(0, genome.size - L))
        s = genome[p:p + L].copy()
        if i % 4 == 0:
            s[L // 3] = (s[L // 3] + 1) % 4
        out.append(SeqRecord(f"r{i}", s.astype(np.uint8),
                             np.full(L, 35, np.uint8)))
    return out


def test_sharded_unpaired_identical(toy):
    genome, data = toy
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(5)
    records = _reads(genome, 64, rng)
    base = UnpairedAligner(data, make_policy("sensitive"))
    want = [r.line() for r in base.align_batch(records)]
    mesh = make_mesh(8)
    sh = UnpairedAligner(data, make_policy("sensitive"), mesh=mesh)
    got = [r.line() for r in sh.align_batch(records)]
    assert got == want


def test_sharded_paired_identical(toy):
    genome, data = toy
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(6)
    m1 = _reads(genome, 32, rng)
    # mates: reverse-complement windows ~200bp downstream
    m2 = []
    for i, r in enumerate(m1):
        p = int(np.random.default_rng(i).integers(0, genome.size - 300))
        s = genome[p + 150:p + 214]
        s = (3 - s[::-1]) % 4
        m2.append(SeqRecord(r.name, s.astype(np.uint8),
                            np.full(64, 35, np.uint8)))
    pairs = list(zip(m1, m2))
    base = PairedAligner(data, make_policy("sensitive"))
    want = [r.line() for r in base.align_batch(pairs)]
    mesh = make_mesh(8)
    sh = PairedAligner(data, make_policy("sensitive"), mesh=mesh)
    got = [r.line() for r in sh.align_batch(pairs)]
    assert got == want
