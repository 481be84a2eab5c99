"""Golden-SAM differential tests against the reference bowtie2's output.

tests/golden/*.sam.gz were produced by the reference binary (bowtie2 2.5.5,
built from /root/reference) on the bundled lambda-phage example reads —
the same differential strategy as the reference's own simple_tests.pl
(scripts/test/simple_tests.pl), with the reference itself as the oracle.

Only a subset of reads runs here (CPU mesh is slow); the full 10k-read
comparisons are part of the perf/driver flow (see .claude/skills/verify).
"""

import gzip
import itertools

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from bowtie2_tpu.index.build import build_index  # noqa: E402
from bowtie2_tpu.io.fastx import iter_reads  # noqa: E402
from bowtie2_tpu.pipeline.align import PairedAligner, UnpairedAligner  # noqa: E402
from bowtie2_tpu.pipeline.policy import make_policy  # noqa: E402

N_READS = 512

FIELDS_CHECKED = ("flag", "rname", "pos", "mapq", "cigar", "rnext", "pnext",
                  "tlen", "AS", "XS", "XM", "XO", "XG", "NM", "MD", "YS", "YT")


def _parse_golden(path):
    recs = {}
    with gzip.open(path, "rt") as f:
        for line in f:
            if line.startswith("@"):
                continue
            t = line.rstrip("\n").split("\t")
            opts = dict((x.split(":", 2)[0], x.split(":", 2)[2])
                        for x in t[11:])
            mate = 1 if int(t[1]) & 0x40 else (2 if int(t[1]) & 0x80 else 0)
            recs[(t[0], mate)] = dict(
                flag=int(t[1]), rname=t[2], pos=int(t[3]), mapq=int(t[4]),
                cigar=t[5], rnext=t[6], pnext=int(t[7]), tlen=int(t[8]),
                **{k: opts.get(k) for k in
                   ("AS", "XS", "XM", "XO", "XG", "NM", "MD", "YS", "YT")})
    return recs


def _rec_dict(r):
    opts = dict((t, str(v)) for t, _ty, v in r.opts)
    return dict(flag=r.flag, rname=r.rname, pos=r.pos, mapq=r.mapq,
                cigar=r.cigar, rnext=r.rnext, pnext=r.pnext, tlen=r.tlen,
                **{k: opts.get(k) for k in
                   ("AS", "XS", "XM", "XO", "XG", "NM", "MD", "YS", "YT")})


@pytest.fixture(scope="module")
def lambda_index(lambda_fasta):
    return build_index(lambda_fasta)


def _compare(got, golden, min_match_frac):
    """Alignment SET must match exactly; per-field parity above threshold."""
    n_exact = n = 0
    mismatches = []
    for key, ours in got.items():
        want = golden[key]
        n += 1
        if (ours["flag"] & 4) != (want["flag"] & 4):
            mismatches.append((key, "aligned-state", want["flag"], ours["flag"]))
            continue
        if all(ours[f] == want[f] for f in FIELDS_CHECKED):
            n_exact += 1
        else:
            bad = [(f, want[f], ours[f]) for f in FIELDS_CHECKED
                   if ours[f] != want[f]]
            mismatches.append((key, bad))
    state_bad = [m for m in mismatches if len(m) == 4]
    assert not state_bad, f"aligned/unaligned set diverges: {state_bad[:5]}"
    frac = n_exact / max(n, 1)
    assert frac >= min_match_frac, (
        f"only {n_exact}/{n} records byte-identical; first diffs: "
        f"{mismatches[:5]}")


def test_golden_unpaired_e2e(lambda_index, lambda_reads):
    golden = _parse_golden("tests/golden/lambda_u1.sam.gz")
    records = list(itertools.islice(iter_reads(lambda_reads), N_READS))
    al = UnpairedAligner(lambda_index, make_policy("sensitive"))
    got = {}
    for k in range(0, len(records), 256):
        for rec, r in zip(records[k:k + 256],
                          al.align_batch(records[k:k + 256])):
            got[(rec.name, 0)] = _rec_dict(r)
    _compare(got, golden, 1.0)


def test_golden_unpaired_local(lambda_index, lambda_reads):
    golden = _parse_golden("tests/golden/lambda_local.sam.gz")
    records = list(itertools.islice(iter_reads(lambda_reads), N_READS))
    al = UnpairedAligner(lambda_index, make_policy("sensitive", local=True))
    got = {}
    for k in range(0, len(records), 256):
        for rec, r in zip(records[k:k + 256],
                          al.align_batch(records[k:k + 256])):
            got[(rec.name, 0)] = _rec_dict(r)
    _compare(got, golden, 0.995)


def test_golden_paired(lambda_index, lambda_reads):
    golden = _parse_golden("tests/golden/lambda_pe.sam.gz")
    m2 = lambda_reads.replace("reads_1", "reads_2")
    pairs = list(itertools.islice(
        zip(iter_reads(lambda_reads), iter_reads(m2)), N_READS))
    al = PairedAligner(lambda_index, make_policy("sensitive"))
    got = {}
    for k in range(0, len(pairs), 128):
        chunk = pairs[k:k + 128]
        outs = al.align_batch(chunk)
        for t, (r1, r2) in enumerate(chunk):
            # half-mapped pairs emit the ALIGNED mate first (finishRead
            # order, matched in round 4) — key records by their FLAG
            # mate bit, not position
            for r in (outs[2 * t], outs[2 * t + 1]):
                mate = 1 if r.flag & 0x40 else 2
                got[((r1 if mate == 1 else r2).name, mate)] = _rec_dict(r)
    # round 3: the PE zero-seed-round `break` model closed the reference
    # give-up class — the full 10k-pair corpus is byte-identical, so this
    # asserts the aligned SET and 100% per-record parity like the SE test
    _compare(got, golden, 1.0)


def test_golden_paired_local(lambda_index, lambda_reads):
    golden = _parse_golden("tests/golden/lambda_pe_local.sam.gz")
    m2 = lambda_reads.replace("reads_1", "reads_2")
    pairs = list(itertools.islice(
        zip(iter_reads(lambda_reads), iter_reads(m2)), N_READS))
    al = PairedAligner(lambda_index, make_policy("sensitive", local=True))
    got = {}
    for k in range(0, len(pairs), 128):
        chunk = pairs[k:k + 128]
        outs = al.align_batch(chunk)
        for t, (r1, r2) in enumerate(chunk):
            for r in (outs[2 * t], outs[2 * t + 1]):
                mate = 1 if r.flag & 0x40 else 2
                got[((r1 if mate == 1 else r2).name, mate)] = _rec_dict(r)
    n_exact = sum(
        1 for key, ours in got.items()
        if all(ours[f] == golden[key][f] for f in FIELDS_CHECKED))
    assert n_exact / max(len(got), 1) >= 0.90, n_exact
