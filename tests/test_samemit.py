"""Native CIGAR/MD decoder (native/samemit.c) vs the numpy reference
implementation (pipeline/backtrace.py cigar_md_from_packed): identical
strings on randomized op columns covering mismatches, insertions,
deletions, soft clips and left-align normalization cases."""

import numpy as np
import pytest

from bowtie2_tpu.io.sam import cigar_string
from bowtie2_tpu.ops.sw import OP_D, OP_I, OP_M, OP_NONE
from bowtie2_tpu.pipeline.backtrace import cigar_md_from_packed

samemit = pytest.importorskip("bowtie2_tpu.native.samemit")


def _pack(op, refc, ismatch):
    return np.uint8(op | (refc << 2) | (ismatch << 5))


def _random_case(rng, L):
    """Build a consistent (opcol, read, read_start, read_end) walk."""
    read = rng.integers(0, 4, L).astype(np.int8)
    read_start = int(rng.integers(0, max(L // 4, 1)))
    ops_fwd = []          # (op, refchar, ismatch) in 5'->3' order
    rpos = read_start
    while rpos < L - 1:
        r = rng.random()
        if r < 0.70:      # match
            ops_fwd.append((OP_M, int(read[rpos]), 1))
            rpos += 1
        elif r < 0.85:    # mismatch (ref char differs)
            ops_fwd.append((OP_M, int((read[rpos] + 1) % 4), 0))
            rpos += 1
        elif r < 0.93:    # insertion run (read chars, no ref)
            for _ in range(int(rng.integers(1, 3))):
                if rpos >= L - 1:
                    break
                ops_fwd.append((OP_I, 0, 0))
                rpos += 1
        else:             # deletion run
            for _ in range(int(rng.integers(1, 3))):
                ops_fwd.append((OP_D, int(rng.integers(0, 4)), 0))
        if rng.random() < 0.05:
            break
    if not ops_fwd or all(o[0] != OP_M for o in ops_fwd):
        ops_fwd.append((OP_M, int(read[rpos]), 1))
        rpos += 1
    read_end = rpos
    # walk order (read end -> start) + OP_NONE padding
    col = [_pack(*t) for t in ops_fwd[::-1]]
    col += [np.uint8(OP_NONE)] * int(rng.integers(0, 5))
    return np.array(col, np.uint8), read, read_start, read_end


def test_native_matches_numpy(rng):
    L = 64
    cases = [_random_case(rng, L) for _ in range(300)]
    S = max(c[0].size for c in cases)
    n = len(cases)
    ops = np.full((S, n), OP_NONE, np.uint8)
    reads = np.zeros((n, L), np.int8)
    rs = np.zeros(n, np.int32)
    re_ = np.zeros(n, np.int32)
    for i, (col, read, a, b) in enumerate(cases):
        ops[:col.size, i] = col
        reads[i] = read
        rs[i], re_[i] = a, b
    bound = np.full(n, S, np.int32)
    cigars, mds = samemit.cigar_md_batch(
        ops, np.arange(n, dtype=np.int32), rs, re_,
        np.full(n, L, np.int32), bound, reads)
    for i, (col, read, a, b) in enumerate(cases):
        co, md = cigar_md_from_packed(ops[:, i], a, b, L, read=read)
        assert cigars[i] == cigar_string(co), (i, cigars[i], cigar_string(co))
        assert mds[i] == md, (i, mds[i], md)


def test_collect_raw_matches_objects(rng):
    """collect_raw's native-built lines == SamAlignment.line() for the
    same batch (lambda subset, e2e + local)."""
    import itertools
    from bowtie2_tpu.index.build import build_index
    from bowtie2_tpu.io.fastx import iter_reads
    from bowtie2_tpu.pipeline.align import UnpairedAligner
    from bowtie2_tpu.pipeline.policy import make_policy

    data = build_index("/root/reference/example/reference/lambda_virus.fa")
    records = list(itertools.islice(
        iter_reads("/root/reference/example/reads/reads_1.fq"), 384))
    for local in (False, True):
        al = UnpairedAligner(data, make_policy("sensitive", local=local))
        objs = al.align_batch(records)
        groups = al.collect_raw(al.submit(records))
        flat = [(fl, ln) for g in groups for fl, ln in g]
        assert len(flat) == len(objs)
        for (fl, line), o in zip(flat, objs):
            assert fl == o.flag
            assert line.decode() == o.line(), (line, o.line())


def test_rescore_golden_outputs(rng):
    """Property re-scorer (utils/rescore.py, ~ AlignmentCheck.pm): every
    record we emit on a lambda subset re-derives cleanly from the genome
    (AS, XM/XO/XG, MD, CIGAR read-length), e2e and local."""
    import itertools
    from bowtie2_tpu.index.build import build_index
    from bowtie2_tpu.io.fastx import iter_reads, read_fasta
    from bowtie2_tpu.pipeline.align import UnpairedAligner
    from bowtie2_tpu.pipeline.policy import make_policy
    from bowtie2_tpu.utils.rescore import rescore_sam

    fa = "/root/reference/example/reference/lambda_virus.fa"
    refs = {n: c for n, c in read_fasta(fa)}
    data = build_index(fa)
    records = list(itertools.islice(
        iter_reads("/root/reference/example/reads/reads_1.fq"), 512))
    for local in (False, True):
        pol = make_policy("sensitive", local=local)
        al = UnpairedAligner(data, pol)
        lines = [r.line() for r in al.align_batch(records)]
        errs = rescore_sam(lines, refs, pol.sw_params())
        assert not errs, errs[:5]
