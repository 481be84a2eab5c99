"""RNG-parity differential tests: exact-multimap selection vs the live
reference binary (pipeline/replay.py + pipeline/rng.py).

The reference picks among equal-score alignments with a per-read LCG; for
reads whose reportable alignments all come from the exact end-to-end sweep
the trajectory is replayed draw-for-draw. These tests build duplicated-
segment corpora, run the reference binary as oracle, and assert BYTE
identity of every record under default, -k, -M and -a modes.
"""

import os
import subprocess

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from bowtie2_tpu.index.build import build_index  # noqa: E402
from bowtie2_tpu.io.fastx import SeqRecord  # noqa: E402
from bowtie2_tpu.pipeline.align import UnpairedAligner  # noqa: E402
from bowtie2_tpu.pipeline.policy import make_policy  # noqa: E402

REFBIN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".ref_build")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFBIN, "bowtie2-align-s")),
    reason="reference binary not built")

ALPHA = np.frombuffer(b"ACGT", np.uint8)


def _corpus(tmp_path, ncopy, nreads=60, seed=11):
    rng = np.random.default_rng(seed)
    G = 6000 * (ncopy + 1)
    g = rng.integers(0, 4, G, dtype=np.int8)
    seg = rng.integers(0, 4, 300, dtype=np.int8)
    for i in range(ncopy):
        p = 2000 + 5000 * i
        g[p:p + 300] = seg
    fa = tmp_path / f"ref{ncopy}.fa"
    with open(fa, "w") as f:
        f.write(">dupref\n")
        s = ALPHA[g].tobytes().decode()
        for i in range(0, G, 70):
            f.write(s[i:i + 70] + "\n")
    reads = []
    fq = tmp_path / f"reads{ncopy}.fq"
    with open(fq, "w") as f:
        for i in range(nreads):
            p = int(rng.integers(0, 250))
            codes = seg[p:p + 50]
            if i % 2:
                codes = (3 - codes)[::-1]
            q = rng.integers(30, 41, 50).astype(np.uint8)
            f.write("@m%d\n%s\n+\n%s\n" % (
                i, ALPHA[codes].tobytes().decode(),
                (q + 33).tobytes().decode()))
            reads.append(SeqRecord(name=f"m{i}",
                                   seq=codes.astype(np.uint8).copy(),
                                   qual=q))
    return str(fa), str(fq), reads


def _oracle(fa, fq, tmp_path, args=()):
    idx = str(tmp_path / "refidx")
    subprocess.run([os.path.join(REFBIN, "bowtie2-build-s"), "-q", fa, idx],
                   check=True, capture_output=True)
    out = subprocess.run(
        [os.path.join(REFBIN, "bowtie2-align-s"), "-x", idx, "-U", fq,
         "--quiet", "-p", "1", *args],
        check=True, capture_output=True)
    return [ln for ln in out.stdout.decode().splitlines()
            if not ln.startswith("@")]


@pytest.mark.parametrize("ncopy,args,polkw", [
    (2, (), {}),
    (3, (), {}),
    (3, ("-k", "2"), dict(khits=2, mhits=0)),
    (3, ("-a",), dict(all_hits=True, mhits=0)),
    (3, ("-M", "1"), dict(mhits=1)),
])
def test_exact_multimap_byte_parity(tmp_path, ncopy, args, polkw):
    fa, fq, reads = _corpus(tmp_path, ncopy)
    want = _oracle(fa, fq, tmp_path, args)
    data = build_index(fa)
    ua = UnpairedAligner(data, make_policy("sensitive", **polkw))
    got = [r.line() for r in ua.collect(ua.submit(reads))]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_exact_multimap_collect_raw_matches_collect(tmp_path):
    fa, fq, reads = _corpus(tmp_path, 3)
    data = build_index(fa)
    ua = UnpairedAligner(data, make_policy("sensitive"))
    obj = [r.line().encode() for r in ua.collect(ua.submit(reads))]
    ua2 = UnpairedAligner(data, make_policy("sensitive"))
    raw = [line for grp in ua2.collect_raw(ua2.submit(reads))
           for _, line in grp]
    assert obj == raw


def test_tandem_maxed_seen_list_mode(tmp_path):
    """Wide exact ranges (w >= 128) use Random1toN's seen-list rejection
    mode with different draw consumption; error-free tandem-repeat reads
    max out the -M cap (51 alignments) and must still match the oracle
    byte for byte."""
    rng = np.random.default_rng(5)
    G = 40000
    g = rng.integers(0, 4, G, dtype=np.int8)
    unit = rng.integers(0, 4, 50, dtype=np.int8)
    tr = np.tile(unit, 160)            # 8000bp tandem: ~158 copies/frame
    g[10000:10000 + tr.size] = tr
    fa = tmp_path / "tr.fa"
    with open(fa, "w") as f:
        f.write(">tr\n")
        s = ALPHA[g].tobytes().decode()
        for i in range(0, G, 70):
            f.write(s[i:i + 70] + "\n")
    fq = tmp_path / "tr.fq"
    reads = []
    with open(fq, "w") as f:
        for i in range(40):
            p = int(rng.integers(10000, 10000 + tr.size - 100))
            codes = g[p:p + 100].copy()
            if i % 2:
                codes = (3 - codes)[::-1]
            q = rng.integers(25, 41, 100).astype(np.uint8)
            f.write("@t%d\n%s\n+\n%s\n" % (
                i, ALPHA[codes].tobytes().decode(),
                (q + 33).tobytes().decode()))
            reads.append(SeqRecord(name=f"t{i}",
                                   seq=codes.astype(np.uint8).copy(),
                                   qual=q))
    want = _oracle(str(fa), str(fq), tmp_path)
    data = build_index(str(fa))
    ua = UnpairedAligner(data, make_policy("sensitive"))
    got = [r.line() for r in ua.collect(ua.submit(reads))]
    assert got == want
