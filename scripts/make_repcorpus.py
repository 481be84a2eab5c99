"""Deterministic repetitive-genome corpus generator (round-3/4 RNG work).

Builds the corpus class where multimap tie-breaking dominates output
parity: a 5 Mbp genome seeded with diverged Alu-like repeats and a
tandem array, plus simulated reads. Used to measure byte-identity of
the RNG-trajectory replay against the reference binary.

Usage: python scripts/make_repcorpus.py OUTDIR [--n-reads 10000]
Writes OUTDIR/rep.fa and OUTDIR/reads.fq.
"""

import argparse
import os

import numpy as np

BASES = np.frombuffer(b"ACGT", np.uint8)


def make_genome(rng: np.random.Generator, size: int = 5_000_000,
                n_alu: int = 1200, alu_len: int = 300,
                tandem_unit: int = 250, tandem_copies: int = 40,
                n_tandem: int = 5):
    g = rng.integers(0, 4, size, dtype=np.int8)
    # NEAR-identical dispersed repeats (0.3-3% divergence): reads from
    # these multimap with >= 1 mismatch — the imperfect-multimap class
    # whose tie-breaking consumes the reference's seed-phase RNG
    alu = rng.integers(0, 4, alu_len, dtype=np.int8)
    for _ in range(n_alu):
        pos = int(rng.integers(0, size - alu_len))
        div = rng.random() * 0.027 + 0.003
        copy = alu.copy()
        nmut = max(int(div * alu_len), 1)
        mp = rng.choice(alu_len, nmut, replace=False)
        copy[mp] = (copy[mp] + rng.integers(1, 4, nmut)) % 4
        g[pos:pos + alu_len] = copy
    # near-identical tandem arrays (exact + 1mm multimap class)
    for _ in range(n_tandem):
        unit = rng.integers(0, 4, tandem_unit, dtype=np.int8)
        tpos = int(rng.integers(0, size - tandem_unit * tandem_copies))
        for c in range(tandem_copies):
            copy = unit.copy()
            nmut = int(rng.integers(0, 3))      # 0-2 subs per copy
            if nmut:
                mp = rng.choice(tandem_unit, nmut, replace=False)
                copy[mp] = (copy[mp] + rng.integers(1, 4, nmut)) % 4
            g[tpos + c * tandem_unit:tpos + (c + 1) * tandem_unit] = copy
    return g


def sample_reads(rng: np.random.Generator, g: np.ndarray, n: int,
                 rdlen: int = 100, err: float = 0.01):
    pos = rng.integers(0, g.size - rdlen, n)
    strand = rng.integers(0, 2, n)
    reads = []
    for i in range(n):
        r = g[pos[i]:pos[i] + rdlen].copy()
        if strand[i]:
            r = (3 - r)[::-1]
        ne = rng.binomial(rdlen, err)
        if ne:
            mp = rng.choice(rdlen, ne, replace=False)
            r[mp] = (r[mp] + rng.integers(1, 4, ne)) % 4
        q = rng.integers(28, 41, rdlen)
        reads.append((r, q))
    return reads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--n-reads", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=7)
    a = ap.parse_args()
    os.makedirs(a.outdir, exist_ok=True)
    rng = np.random.default_rng(a.seed)
    g = make_genome(rng)
    with open(os.path.join(a.outdir, "rep.fa"), "w") as f:
        f.write(">rep\n")
        s = BASES[g].tobytes().decode()
        for k in range(0, len(s), 70):
            f.write(s[k:k + 70] + "\n")
    reads = sample_reads(rng, g, a.n_reads)
    with open(os.path.join(a.outdir, "reads.fq"), "w") as f:
        for i, (r, q) in enumerate(reads):
            f.write(f"@rr{i}\n{BASES[r].tobytes().decode()}\n+\n"
                    + "".join(chr(33 + int(x)) for x in q) + "\n")
    print(f"wrote {a.outdir}/rep.fa ({g.size} bp), "
          f"{a.outdir}/reads.fq ({a.n_reads} reads)")


if __name__ == "__main__":
    main()
