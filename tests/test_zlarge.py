"""Large-index (int64 row space) mode: identical output to the int32 path.

The ".bt2l" analog: genomes >= 2^31 joined bp get int64 occ/ftab/offs
arrays (index/build.py large=True) and the kernels follow the row dtype.
Forcing large mode on lambda must produce byte-identical SAM to the small
index. Named test_z* so the global x64 flag flip (required for device
int64) happens after the int32 tests in a session.
"""

import itertools

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from bowtie2_tpu.index.build import build_index  # noqa: E402
from bowtie2_tpu.io.fastx import iter_reads  # noqa: E402
from bowtie2_tpu.pipeline.align import UnpairedAligner  # noqa: E402
from bowtie2_tpu.pipeline.policy import make_policy  # noqa: E402


def test_large_mode_matches_small(lambda_fasta, lambda_reads):
    records = list(itertools.islice(iter_reads(lambda_reads), 256))
    small = build_index(lambda_fasta)
    large = build_index(lambda_fasta, large=True)
    assert large.fw.occ_cp.dtype == np.int64
    assert large.fw.offs.dtype == np.int64

    al_s = UnpairedAligner(small, make_policy("sensitive"))
    out_s = [r.line() for r in al_s.align_batch(records)]
    al_l = UnpairedAligner(large, make_policy("sensitive"))
    out_l = [r.line() for r in al_l.align_batch(records)]
    # large-mode device row space is uint32 (native 32-bit on TPU; int64
    # row arithmetic is emulated and was the round-2 184x cliff) — int64
    # rows engage only past 2^32 joined bp
    import jax.numpy as jnp
    assert al_l.idx.fw.fchr.dtype == jnp.uint32
    assert al_l.idx.fw.offs.dtype == jnp.uint32
    assert out_s == out_l

    # raw emit path too
    g_s = al_s.collect_raw(al_s.submit(records))
    g_l = al_l.collect_raw(al_l.submit(records))
    assert [[ln for _, ln in g] for g in g_s] == \
           [[ln for _, ln in g] for g in g_l]


def test_large_mode_pe_fused_matches_small(lambda_fasta):
    """The fused PE path runs in large mode (round-3: it used to fall back
    to the legacy host path) and must match the small-index output,
    including the int32-wrapped global-position decode (_u32pos)."""
    from bowtie2_tpu.pipeline.align import PairedAligner
    r1 = list(itertools.islice(
        iter_reads("/root/reference/example/reads/reads_1.fq"), 192))
    r2 = list(itertools.islice(
        iter_reads("/root/reference/example/reads/reads_2.fq"), 192))
    pairs = list(zip(r1, r2))
    small = build_index(lambda_fasta)
    large = build_index(lambda_fasta, large=True)
    pol = make_policy("sensitive")
    out_s = [r.line() for r in PairedAligner(small, pol).align_batch(pairs)]
    al_l = PairedAligner(large, pol)
    fb = al_l.submit(pairs)
    assert not (isinstance(fb, tuple) and fb[0] == "host"), \
        "large mode must use the fused PE path"
    out_l = [r.line() for r in al_l.collect(fb)]
    assert out_s == out_l
