"""End-to-end pipeline tests on small synthetic genomes (CPU mesh)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from bowtie2_tpu.constants import decode_seq, revcomp  # noqa: E402
from bowtie2_tpu.index.build import build_index_from_refs  # noqa: E402
from bowtie2_tpu.io.fastx import SeqRecord  # noqa: E402
from bowtie2_tpu.pipeline.align import UnpairedAligner  # noqa: E402
from bowtie2_tpu.pipeline.policy import make_policy  # noqa: E402


@pytest.fixture(scope="module")
def genome_and_aligner():
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, 5000).astype(np.uint8)
    data = build_index_from_refs([("chr_t", genome)], ftab_chars=4)
    pol = make_policy("sensitive")
    return genome, UnpairedAligner(data, pol)


def _mk(name, codes, qual=35):
    return SeqRecord(name=name, seq=codes.astype(np.uint8),
                     qual=np.full(codes.size, qual, np.uint8))


def test_perfect_reads_fw_and_rc(genome_and_aligner):
    genome, al = genome_and_aligner
    rng = np.random.default_rng(1)
    recs, poss, orients = [], [], []
    for k in range(20):
        L = int(rng.integers(40, 61))
        p = int(rng.integers(0, genome.size - L))
        codes = genome[p:p + L].copy()
        if k % 2:
            codes = revcomp(codes)
        recs.append(_mk(f"q{k}", codes))
        poss.append(p)
        orients.append(k % 2)
    out = al.align_batch(recs)
    assert len(out) == 20
    for k, rec in enumerate(out):
        assert rec.flag & 4 == 0, f"read {k} unaligned"
        assert rec.pos == poss[k] + 1, k
        assert (rec.flag & 16 != 0) == bool(orients[k]), k
        assert rec.cigar == f"{recs[k].seq.size}M"
        d = dict((t, v) for t, _ty, v in rec.opts)
        assert d["AS"] == 0
        assert d["NM"] == 0


def test_mismatched_reads(genome_and_aligner):
    genome, al = genome_and_aligner
    rng = np.random.default_rng(2)
    recs, poss = [], []
    for k in range(10):
        L = 60
        p = int(rng.integers(0, genome.size - L))
        codes = genome[p:p + L].copy()
        mpos = 30 + k
        codes[mpos % L] = (codes[mpos % L] + 1) % 4
        recs.append(_mk(f"m{k}", codes))
        poss.append(p)
    out = al.align_batch(recs)
    for k, rec in enumerate(out):
        assert rec.flag & 4 == 0
        assert rec.pos == poss[k] + 1
        d = dict((t, v) for t, _ty, v in rec.opts)
        assert d["XM"] == 1 and d["NM"] == 1
        # qual 35 → penalty 2 + 35*4//40 = 5
        assert d["AS"] == -5


def test_indel_read(genome_and_aligner):
    import re
    genome, al = genome_and_aligner
    p = 1000
    # 60bp read with 2bp deletion after 30 genome chars
    codes = np.concatenate([genome[p:p + 30], genome[p + 32:p + 62]])
    out = al.align_batch([_mk("d0", codes)])
    rec = out[0]
    assert rec.flag & 4 == 0
    assert rec.pos == p + 1
    # deletion placement may shift within a repeat (equal score); stats fixed
    m = re.fullmatch(r"(\d+)M2D(\d+)M", rec.cigar)
    assert m and int(m.group(1)) + int(m.group(2)) == 60, rec.cigar
    d = dict((t, v) for t, _ty, v in rec.opts)
    assert d["AS"] == -11 and d["XO"] == 1 and d["XG"] == 2 and d["NM"] == 2


def test_garbage_read_unaligned(genome_and_aligner):
    genome, al = genome_and_aligner
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 50).astype(np.uint8)
    out = al.align_batch([_mk("g0", codes)])
    # random 50-mer almost surely unalignable end-to-end within -30.6 budget
    assert out[0].flag & 4


def test_n_filtered_read(genome_and_aligner):
    genome, al = genome_and_aligner
    codes = genome[100:160].copy()
    codes[:30] = 4  # 30 Ns > nceil(60) = 9
    out = al.align_batch([_mk("n0", codes)])
    assert out[0].flag & 4
    assert ("YF", "Z", "NS") in out[0].opts


def test_multi_mapping_read_has_xs(genome_and_aligner):
    genome, al = genome_and_aligner
    # plant a duplicated 70bp segment: read maps to both copies equally
    rng = np.random.default_rng(4)
    seg = rng.integers(0, 4, 70).astype(np.uint8)
    g2 = np.concatenate([genome[:1000], seg, genome[1000:2000], seg,
                         genome[2000:3000]])
    data = build_index_from_refs([("dup", g2)], ftab_chars=4)
    al2 = UnpairedAligner(data, make_policy("sensitive"))
    out = al2.align_batch([_mk("x0", seg.copy())])
    rec = out[0]
    assert rec.flag & 4 == 0
    d = dict((t, v) for t, _ty, v in rec.opts)
    assert d["AS"] == 0 and d.get("XS") == 0
    assert rec.mapq <= 1  # equal best elsewhere → mapq 0/1


def test_local_mode_soft_clip():
    rng = np.random.default_rng(12)
    genome = rng.integers(0, 4, 4000).astype(np.uint8)
    data = build_index_from_refs([("loc", genome)], ftab_chars=4)
    al = UnpairedAligner(data, make_policy("sensitive", local=True))
    # read = 10 garbage + 50 genome: local should clip the garbage
    p = 700
    codes = np.concatenate([
        (genome[p - 10:p] + 2) % 4,           # corrupt prefix
        genome[p:p + 50]]).astype(np.uint8)
    out = al.align_batch([_mk("l0", codes)])
    rec = out[0]
    assert rec.flag & 4 == 0
    assert rec.cigar.startswith("10S") or rec.cigar.endswith("S")
    assert rec.pos == p + 1


def test_assemble_candidates_vectorized_matches_loop(genome_and_aligner):
    """The vectorized candidate assembly must replicate the reference loop
    implementation exactly (same candidates, same canonical order)."""
    genome, al = genome_and_aligner
    rng = np.random.default_rng(33)
    B, smax = 40, 6
    lens = rng.integers(30, 80, B).astype(np.int32)
    filtered = rng.random(B) < 0.1
    sw_top = rng.integers(0, 1000, 2 * B).astype(np.int32)
    sw_bot = sw_top + rng.integers(0, 8, 2 * B).astype(np.int32)
    sw_ned = rng.integers(0, 2, 2 * B).astype(np.int32)
    seed_top = rng.integers(0, 1000, (2 * B, smax)).astype(np.int32)
    widths = rng.integers(0, 6, (2 * B, smax)).astype(np.int32)
    seed_bot = seed_top + widths
    seed_off = rng.integers(0, 40, (2 * B, smax)).astype(np.int64)
    seed_mlen = rng.integers(20, 40, (2 * B, smax)).astype(np.int64)
    seed_half = rng.random((2 * B, smax)) < 0.3
    args = (B, lens, filtered, sw_top, sw_bot, sw_ned, seed_off, seed_top,
            seed_bot, seed_mlen, seed_half)
    ref = al._assemble_candidates_ref(*args)
    vec = al._assemble_candidates(*args)
    for a, b in zip(ref, vec):
        np.testing.assert_array_equal(a, b)


def test_k_mode_reports_multiple_alignments():
    """-k mode on a repetitive genome: primary + secondary records."""
    from bowtie2_tpu.pipeline.align import UnpairedAligner
    rng = np.random.default_rng(7)
    unit = rng.integers(0, 4, 400).astype(np.uint8)
    genome = np.concatenate([unit, rng.integers(0, 4, 133).astype(np.uint8),
                             unit, rng.integers(0, 4, 91).astype(np.uint8),
                             unit])
    data = build_index_from_refs([("rep", genome)], ftab_chars=4)
    al = UnpairedAligner(data, make_policy("sensitive", khits=3))
    read = unit[50:110]
    out = al.align_batch([_mk("q0", read)])
    assert len(out) == 3
    assert out[0].flag & 0x100 == 0
    assert all(r.flag & 0x100 for r in out[1:])
    # primary gets a real MAPQ when a second-best exists (unique.h:202,
    # oracle-verified in test_rng_parity.py); secondaries are always 255
    assert out[0].mapq != 255
    assert all(r.mapq == 255 for r in out[1:])
    poss = sorted(r.pos for r in out)
    assert poss == [51, 51 + 533, 51 + 533 + 491]
    assert all(r.cigar == "60M" for r in out)


def test_seed_mms_n1_rescues_mismatched_seeds():
    """-N 1: reads whose every full seed window has a mismatch still align
    via exact seed halves (pigeonhole)."""
    from bowtie2_tpu.pipeline.align import UnpairedAligner
    rng = np.random.default_rng(9)
    genome = rng.integers(0, 4, 8000).astype(np.uint8)
    data = build_index_from_refs([("g", genome)], ftab_chars=4)
    L = 44
    p = 3000
    read = genome[p:p + L].copy()
    # mismatches at 5, 27 kill every 22bp window at the sensitive offsets,
    # and split the read so neither half of the READ is clean either at
    # both ends... but each SEED half [11bp] windows around them are clean
    for q in (5, 27):
        read[q] = (read[q] + 1) % 4
    rec = _mk("n1", read)
    al0 = UnpairedAligner(data, make_policy("sensitive"))
    al1 = UnpairedAligner(data, make_policy("sensitive", seed_mms=1))
    out1 = al1.align_batch([rec])
    assert out1[0].flag & 4 == 0
    assert out1[0].pos == p + 1


def test_long_reads_diag_kernel():
    """Reads beyond the rectangle buckets (> 8192 bp) route to the
    diagonal-band kernel (linear memory); alignments must match the
    reference on full fields (validated vs the oracle binary in
    development; here we assert the structural invariants + score
    round-trip since the oracle needs .ref_build)."""
    import os
    import subprocess
    rng = np.random.default_rng(17)
    from bowtie2_tpu.io.fastx import read_fasta
    refs = read_fasta("/root/reference/example/reference/lambda_virus.fa")
    g = refs[0][1]
    from bowtie2_tpu.index.build import build_index
    from bowtie2_tpu.pipeline.align import UnpairedAligner
    from bowtie2_tpu.pipeline.policy import make_policy
    data = build_index("/root/reference/example/reference/lambda_virus.fa")
    ua = UnpairedAligner(data, make_policy("sensitive"))
    reads = []
    truth = []
    for i in range(4):
        L = int(rng.integers(9000, 12000))
        p = int(rng.integers(0, g.size - L))
        codes = g[p:p + L].astype(np.int8).copy()
        err = rng.random(L) < 0.02
        codes[err] = (codes[err] + rng.integers(1, 4, err.sum())) % 4
        reads.append(_mk(f"L{i}", np.clip(codes, 0, 3).astype(np.uint8)))
        truth.append(p + 1)
    out = ua.collect(ua.submit(reads))
    assert len(out) == 4
    for r, want_pos in zip(out, truth):
        assert not (r.flag & 0x4)
        assert r.pos == want_pos
        assert r.cigar.endswith("M")
        op = dict((t, v) for t, _y, v in r.opts)
        assert op["NM"] == op["XM"]          # pure substitutions
    # live-oracle field comparison when the reference binary is present
    refbin = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".ref_build", "bowtie2-align-s")
    refidx = os.path.join(os.path.dirname(refbin), "golden", "lambda")
    if os.path.exists(refbin):
        import tempfile
        alpha = np.frombuffer(b"ACGT", np.uint8)
        with tempfile.NamedTemporaryFile("w", suffix=".fq",
                                         delete=False) as f:
            for rec in reads:
                f.write("@%s\n%s\n+\n%s\n" % (
                    rec.name, alpha[rec.seq].tobytes().decode(),
                    (rec.qual + 33).tobytes().decode()))
            fq = f.name
        res = subprocess.run([refbin, "-x", refidx, "-U", fq, "--quiet",
                              "-p", "1"], check=True, capture_output=True)
        want = [ln.split("\t") for ln in res.stdout.decode().splitlines()
                if not ln.startswith("@")]
        for r, w in zip(out, want):
            assert (str(r.flag), str(r.pos), str(r.mapq), r.cigar) == \
                (w[1], w[3], w[4], w[5]), (r.qname, w[:6])
