"""Importing reference-built .bt2 indexes (if golden binaries available)."""

import os

import numpy as np
import pytest

GOLDEN = "/root/repo/.ref_build/golden/lambda"


@pytest.mark.skipif(not os.path.exists(GOLDEN + ".1.bt2"),
                    reason="no reference-built index available")
def test_bt2_import_reconstructs_reference(lambda_fasta):
    from bowtie2_tpu.index.bt2_import import read_bt2_refs
    from bowtie2_tpu.io.fastx import read_fasta
    refs = read_bt2_refs(GOLDEN)
    orig = read_fasta(lambda_fasta)
    assert len(refs) == len(orig) == 1
    assert refs[0][0] == orig[0][0]
    np.testing.assert_array_equal(refs[0][1], orig[0][1])


@pytest.mark.skipif(not os.path.exists(GOLDEN + ".1.bt2"),
                    reason="no reference-built index available")
def test_bt2_import_aligns(lambda_fasta, lambda_reads):
    import itertools

    from bowtie2_tpu.index.bt2_import import import_bt2
    from bowtie2_tpu.io.fastx import iter_reads
    from bowtie2_tpu.pipeline.align import UnpairedAligner
    from bowtie2_tpu.pipeline.policy import make_policy
    data = import_bt2(GOLDEN)
    al = UnpairedAligner(data, make_policy("sensitive"))
    records = list(itertools.islice(iter_reads(lambda_reads), 64))
    out = al.align_batch(records)
    assert sum(1 for r in out if not r.flag & 4) > 55
