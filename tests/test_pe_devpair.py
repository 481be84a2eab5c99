"""Device-side fused-PE pairing vs forced host pairing: byte identity.

The dense pairing math (dedupe/rank, concordance classification, -D
fast-path effort, best-combo selection, rescue heads) runs on device
(ops/fused.py _pe_pairing); `force_host_pairing` disables it so the host
legacy path (pipeline/align.py _collect_fused_legacy) recomputes
everything from the per-slot export. Both must produce IDENTICAL SAM
records on corpora that exercise concordant, discordant, rescue and
mixed outcomes.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from bowtie2_tpu.index.build import build_index  # noqa: E402
from bowtie2_tpu.io.fastx import SeqRecord  # noqa: E402
from bowtie2_tpu.pipeline.align import PairedAligner  # noqa: E402
from bowtie2_tpu.pipeline.policy import make_policy  # noqa: E402


@pytest.fixture(scope="module")
def lambda_index(lambda_fasta):
    return build_index(lambda_fasta)


def _codes(seq):
    return np.frombuffer(seq.encode(), np.uint8)


def _mk_pairs(data, rng, n, L=60, err=0.02, bad_frac=0.15):
    """FR pairs over the indexed genome with enough noise to hit every
    outcome class: concordant, too-far (discordant), one-mate-garbage
    (rescue/mixed), both-garbage (unaligned)."""
    from bowtie2_tpu.constants import decode_seq
    g_words = data.ref_words
    G = int(data.ref_cum[-1])

    def ref_codes(lo, n):
        gp = np.arange(lo, lo + n)
        return ((g_words[gp >> 4] >> (2 * (gp & 15))) & 3).astype(np.int8)

    comp = lambda c: (3 - c) % 4
    pairs = []
    for i in range(n):
        pos = int(rng.integers(0, G - 700))
        kind = rng.random()
        if kind < bad_frac:                       # mate2 garbage
            ins = int(rng.integers(150, 500))
            c1 = ref_codes(pos, L)
            c2 = rng.integers(0, 4, L).astype(np.int8)
        elif kind < 2 * bad_frac:                 # fragment too long
            ins = int(rng.integers(1200, 2000))
            if pos + ins + L >= G:
                ins = 600
            c1 = ref_codes(pos, L)
            c2 = comp(ref_codes(pos + ins - L, L))[::-1]
        else:                                     # concordant
            ins = int(rng.integers(150, 500))
            c1 = ref_codes(pos, L)
            c2 = comp(ref_codes(pos + ins - L, L))[::-1]
        for c in (c1, c2):
            e = rng.random(L) < err
            c[e] = (c[e] + rng.integers(1, 4, int(e.sum()))) % 4
        q = np.full(L, 35, np.uint8) + 33
        pairs.append((
            SeqRecord(name=f"p{i}", seq=c1.astype(np.uint8),
                      qual=q.copy()),
            SeqRecord(name=f"p{i}", seq=c2.astype(np.uint8),
                      qual=q.copy())))
    return pairs


@pytest.mark.parametrize("local", [False, True])
def test_device_pairing_matches_host(lambda_index, rng, local):
    pairs = _mk_pairs(lambda_index, np.random.default_rng(7), 256)
    pa_dev = PairedAligner(lambda_index, make_policy("sensitive",
                                                     local=local))
    out_dev = pa_dev.align_batch(pairs)
    pa_host = PairedAligner(lambda_index, make_policy("sensitive",
                                                      local=local))
    pa_host.force_host_pairing = True
    out_host = pa_host.align_batch(pairs)
    assert len(out_dev) == len(out_host)
    for a, b in zip(out_dev, out_host):
        assert a.line() == b.line()


def test_device_pairing_used(lambda_index):
    """The fast path must actually engage on a clean corpus (pairing
    static set and no hostneed fallback)."""
    pairs = _mk_pairs(lambda_index, np.random.default_rng(3), 64,
                      err=0.0, bad_frac=0.0)
    pa = PairedAligner(lambda_index, make_policy("sensitive"))
    fpb = pa.submit(pairs)
    assert fpb.pairing is not None
    from bowtie2_tpu.ops.fused import (PE_PAIR_FIELDS, PE_READ_FIELDS)
    meta = np.asarray(fpb.res.blob)
    pf = meta[PE_READ_FIELDS * fpb.B2:
              PE_READ_FIELDS * fpb.B2 + PE_PAIR_FIELDS * fpb.Bp]\
        .reshape(PE_PAIR_FIELDS, fpb.Bp)
    assert not pf[PE_PAIR_FIELDS - 1, :fpb.B].any()
    out = pa._collect_fused(fpb)
    assert sum(1 for r in out if r.flag & 0x2) == 128   # all concordant


def test_pe_classify_jnp_matches_np(rng):
    from bowtie2_tpu.pipeline.pe import pe_classify_jnp, pe_classify_np
    import jax.numpy as jnp
    r = np.random.default_rng(11)
    n = 4096
    lo1 = r.integers(0, 10000, n)
    hi1 = lo1 + r.integers(20, 400, n)
    lo2 = r.integers(0, 10000, n)
    hi2 = lo2 + r.integers(20, 400, n)
    fw1 = r.random(n) < 0.5
    fw2 = r.random(n) < 0.5
    for pol in ("fr", "rf", "ff"):
        for olap, cont, dove in ((True, True, False), (False, False, True),
                                 (True, False, False)):
            a = pe_classify_np(pol, lo1, hi1, fw1, lo2, hi2, fw2,
                               0, 500, olap, cont, dove)
            b = np.asarray(pe_classify_jnp(
                pol, jnp.asarray(lo1, jnp.int32), jnp.asarray(hi1, jnp.int32),
                jnp.asarray(fw1), jnp.asarray(lo2, jnp.int32),
                jnp.asarray(hi2, jnp.int32), jnp.asarray(fw2),
                0, 500, olap, cont, dove))
            assert (a == b).all(), (pol, olap, cont, dove)


@pytest.mark.parametrize("local", [False, True])
def test_collect_raw_matches_objects(lambda_index, local):
    """Native-line PE emission (sam_tails_pe) == object records."""
    pairs = _mk_pairs(lambda_index, np.random.default_rng(21), 256)
    pa = PairedAligner(lambda_index, make_policy("sensitive", local=local))
    objs = pa.collect(pa.submit(pairs))
    pa2 = PairedAligner(lambda_index, make_policy("sensitive", local=local))
    groups = pa2.collect_raw(pa2.submit(pairs))
    lines_obj = [r.line().encode() for r in objs]
    lines_raw = [ln for g in groups for _, ln in g]
    assert len(lines_obj) == len(lines_raw)
    for a, b in zip(lines_obj, lines_raw):
        assert a == b, (a, b)
