"""End-to-end CLI flag differential tests: run `bt2x align` and the
reference bowtie2 binary as subprocesses with the SAME flags on tiny
corpora and diff the SAM bodies. Covers the input/output-layer flags the
in-process oracle harness (test_simple_cases.py) can't reach: --trim-to,
--sample, --omit-sec-seq, --sam-no-qname-trunc, --sam-append-comment,
--refidx, --fullref, --no-exact-upfront, --454, and option aliases.

Skipped when the reference build (.ref_build, gitignored) is absent.
"""

import os
import subprocess
import sys

import pytest

REFBIN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".ref_build")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFBIN, "bowtie2-align-s")),
    reason="reference binaries not present")

REF160 = ("GGGCGGCGACCTCGCGGGTTTTCGCTATTTATGAAAATTTTCCGGTTTAAGGCGTTTCCG"
          "ACCTGACCAACAACCTGATTACGGCATCACAGTTGGCTGTTCAGGCAGATAACGGCTCAA"
          "TGCCTGTTGGCTACAGGTGCTAATCCAGCTACCGCC")
READS = [
    ("r0 1:N:0:ACGTAC", REF160[10:58]),
    ("r1 plain comment here", REF160[60:100]),
    ("r2", REF160[90:140]),
    ("r3", "CACACACACACACACACACACACACACACACA"),       # unalignable
    ("r4", REF160[5:75]),
]


def _write_corpus(tmp, ref_header="seq0", reads=READS):
    fa = os.path.join(tmp, "ref.fa")
    with open(fa, "w") as f:
        f.write(f">{ref_header}\n{REF160}\n")
    fq = os.path.join(tmp, "reads.fq")
    with open(fq, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    return fa, fq


def _ref_run(tmp, fa, fq, flags):
    idx = os.path.join(tmp, "refidx")
    subprocess.run([os.path.join(REFBIN, "bowtie2-build-s"), "-q", fa, idx],
                   check=True, capture_output=True)
    r = subprocess.run(
        [os.path.join(REFBIN, "bowtie2-align-s"), "--sensitive",
         "-x", idx, "-U", fq, *flags],
        check=True, capture_output=True, text=True)
    return [ln for ln in r.stdout.splitlines() if not ln.startswith("@")]


def _our_run(tmp, fa, fq, flags):
    idx = os.path.join(tmp, "ouridx")
    env = dict(os.environ)
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            f"import sys; sys.path.insert(0, {REPO!r});"
            "from bowtie2_tpu.cli.main import main;"
            "sys.exit(main(sys.argv[1:]))")
    subprocess.run([sys.executable, "-c", code, "build", fa, idx, "-q"],
                   check=True, capture_output=True, env=env, cwd=REPO)
    r = subprocess.run(
        [sys.executable, "-c", code, "align", "--sensitive",
         "-x", idx, "-U", fq, *flags],
        check=True, capture_output=True, text=True, env=env, cwd=REPO)
    return [ln for ln in r.stdout.splitlines() if not ln.startswith("@")]


def _fields(lines, drop=("XT", "YE", "YB")):
    out = []
    for ln in lines:
        t = ln.rstrip("\n").split("\t")
        opts = sorted(x for x in t[11:] if not x.startswith(drop))
        out.append(tuple(t[:11]) + tuple(opts))
    return out


CASES = [
    ("trim-to default 3'", ["--trim-to", "30"]),
    ("trim-to 5'", ["--trim-to", "5:30"]),
    ("trim-to 3'", ["--trim-to", "3:36"]),
    ("omit-sec-seq", ["-k", "2", "--omit-sec-seq"]),
    ("sam-no-qname-trunc", ["--sam-no-qname-trunc"]),
    ("sam-append-comment", ["--sam-append-comment"]),
    ("refidx", ["--refidx"]),
    ("no-exact-upfront", ["--no-exact-upfront"]),
    ("454 gap penalties", ["--454"]),
    ("sample half", ["--sample", "0.5"]),
    ("sample half seeded", ["--sample", "0.5", "--seed", "7"]),
    ("aliases", ["--phred33-quals", "--qupto", "4", "--sam-nohead"]),
]


@pytest.mark.parametrize("name,flags", CASES, ids=[c[0] for c in CASES])
def test_cli_flag_parity(name, flags, tmp_path):
    tmp = str(tmp_path)
    fa, fq = _write_corpus(tmp)
    want = _fields(_ref_run(tmp, fa, fq, flags))
    got = _fields(_our_run(tmp, fa, fq, flags))
    assert got == want


def test_fullref(tmp_path):
    """--fullref is inert in the 2.5.5 binary (both builders truncate
    names at index time) — assert we match that, plus the default."""
    tmp = str(tmp_path)
    fa, fq = _write_corpus(tmp, ref_header="seq0 descriptive text here")
    want = _fields(_ref_run(tmp, fa, fq, ["--fullref"]))
    got = _fields(_our_run(tmp, fa, fq, ["--fullref"]))
    assert got == want
    # and the default truncates identically
    want = _fields(_ref_run(tmp, fa, fq, []))
    got = _fields(_our_run(tmp, fa, fq, []))
    assert got == want


# -F FASTA-continuous k-mer sampling parity (simple_tests.pl
# "FASTA-continuous 1-6", scripts/test/simple_tests.pl:72-140): read names
# are <seq>_<offset>, -u/-s count SAMPLED k-mers, ival wraps across
# records. The reference consumes -F with -U pointing at the FASTA.
FCONT_CASES = [
    ("F 10,9", ">seq1\nAGCATCGATCAGTATCTGA\n", ["-F", "10,9"]),
    ("F 10,9 two seqs",
     ">seq1\nAGCATCGATCAGTATCTG\n>seq2\nAGCATCGATCAGTATCTGA\n",
     ["-F", "10,9"]),
    ("F 10,9 -u 1", ">seq1\nAGCATCGATCAGTATCTGA\n", ["-F", "10,9", "-u", "1"]),
    ("F 10,9 -s 1", ">seq1\nAGCATCGATCAGTATCTGA\n", ["-F", "10,9", "-s", "1"]),
    ("F 10,9 -u 1 -s 1",
     ">seq1\nAGCATCGATCAGTATCTG\n>seq2\nAGCATCGATCAGTATCTGA\n",
     ["-F", "10,9", "-u", "1", "-s", "1"]),
    ("F 10,1 tiling", ">seq1\nAGCATCGATCAG\n", ["-F", "10,1"]),
    ("F k:i syntax", ">seq1\nAGCATCGATCAGTATCTGA\n", ["-F", "k:10,i:9"]),
    ("F on ref-scale corpus", None, ["-F", "25,13"]),
]


@pytest.mark.parametrize("name,reads_fa,flags", FCONT_CASES,
                         ids=[c[0] for c in FCONT_CASES])
def test_fasta_continuous_parity(name, reads_fa, flags, tmp_path):
    tmp = str(tmp_path)
    fa, _ = _write_corpus(tmp)
    if reads_fa is None:                      # sample k-mers off REF160
        reads_fa = f">big\n{REF160}\n"
    rfa = os.path.join(tmp, "cont.fa")
    with open(rfa, "w") as f:
        f.write(reads_fa)
    want = _fields(_ref_run(tmp, fa, rfa, flags))
    got = _fields(_our_run(tmp, fa, rfa, flags))
    assert got == want
