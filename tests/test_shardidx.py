"""Sharded (> HBM) index mode: identical output to the replicated index.

The FM/ref tables are split over an 8-device virtual CPU mesh `shard`
axis (dist/sharded.py); every gather becomes owner-computes + psum. The
whole fused SE pipeline must produce byte-identical SAM to the replicated
path — determinism holds because each psum leaves every shard with the
identical assembled rows.
"""

import itertools

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from jax.sharding import Mesh  # noqa: E402

from bowtie2_tpu.index.build import build_index  # noqa: E402
from bowtie2_tpu.io.fastx import iter_reads  # noqa: E402
from bowtie2_tpu.pipeline.align import UnpairedAligner  # noqa: E402
from bowtie2_tpu.pipeline.policy import make_policy  # noqa: E402


@pytest.mark.parametrize("nshards", [4, 8])
def test_sharded_index_matches_replicated(lambda_fasta, lambda_reads,
                                          nshards):
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    records = list(itertools.islice(iter_reads(lambda_reads), 192))
    data = build_index(lambda_fasta)
    pol = make_policy("sensitive")
    want = [r.line() for r in UnpairedAligner(data, pol)
            .align_batch(records)]

    mesh = Mesh(np.array(jax.devices()[:nshards]), ("shard",))
    al = UnpairedAligner(data, pol, shard_mesh=mesh)
    # per-shard table sizes really shrink (the point of the mode)
    assert al.sidx.fw.fm_blocks.sharding.num_devices == nshards
    got = [r.line() for r in al.align_batch(records)]
    assert got == want


def test_sharded_index_pe_matches_replicated(lambda_fasta, lambda_reads):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from bowtie2_tpu.pipeline.align import PairedAligner
    r1 = list(itertools.islice(iter_reads(lambda_reads), 128))
    r2 = list(itertools.islice(
        iter_reads(lambda_reads.replace("reads_1", "reads_2")), 128))
    pairs = list(zip(r1, r2))
    data = build_index(lambda_fasta)
    pol = make_policy("sensitive")
    want = [r.line() for r in PairedAligner(data, pol).align_batch(pairs)]
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    got = [r.line() for r in PairedAligner(data, pol, shard_mesh=mesh)
           .align_batch(pairs)]
    assert got == want
