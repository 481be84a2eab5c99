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
    assert out_s == out_l

    # raw emit path too
    g_s = al_s.collect_raw(al_s.submit(records))
    g_l = al_l.collect_raw(al_l.submit(records))
    assert [[ln for _, ln in g] for g in g_s] == \
           [[ln for _, ln in g] for g in g_l]
