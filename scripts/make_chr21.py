"""chr21-scale benchmark corpus (north-star workload, BASELINE.json #4).

No network egress is available to fetch GRCh38 chr21, so this generates a
deterministic 46.7-Mbp chromosome with human-like repeat content — the
properties that actually stress an aligner's multimap/effort paths:

  * ~10.5% Alu-like SINEs: 40k copies of a 300-bp consensus at 5-15%
    divergence (the dominant human multimap class)
  * ~3.8% LINE-1-like elements: 300 copies of a 6-kbp consensus at
    5-20% divergence, many 5'-truncated (as in the genome)
  * alpha-satellite-like centromeric field: 171-bp monomer tandem array
    (2 Mbp) at 1-5% monomer divergence
  * telomeric (TTAGGG)n caps and interstitial N assembly gaps (~2%)
  * GC content varying by 100-kbp isochore blocks

Reads mirror the reference repo's own hg19 speed benchmark
(scripts/test/benchmark/data/conf/speed.json: art_illumina -l 150 -m 200
-s 10, 1M pairs): 150-bp pairs, fragment ~N(200,10) (mates overlap!),
cycle-dependent quality decay, quality-driven substitution errors.

Usage: python scripts/make_chr21.py OUTDIR [--n-pairs 1000000] [--size 46700000]
Writes OUTDIR/chr21sim.fa, reads_1.fq, reads_2.fq.
"""

import argparse
import os

import numpy as np

BASES = np.frombuffer(b"ACGT", np.uint8)


def make_genome(rng, size):
    # isochore GC structure: per-100kbp GC in [0.35, 0.55]
    nblk = size // 100_000 + 1
    gc = rng.uniform(0.35, 0.55, nblk)
    g = np.empty(size, dtype=np.int8)
    for b in range(nblk):
        s, e = b * 100_000, min((b + 1) * 100_000, size)
        if s >= e:
            break
        p_gc = gc[b] / 2
        p_at = (1 - gc[b]) / 2
        g[s:e] = rng.choice(4, e - s, p=[p_at, p_gc, p_gc, p_at])

    def plant(consensus, n, div_lo, div_hi, trunc_frac=0.0):
        L = consensus.size
        for _ in range(n):
            pos = int(rng.integers(0, size - L))
            copy = consensus.copy()
            div = rng.uniform(div_lo, div_hi)
            nmut = max(int(div * L), 1)
            mp = rng.choice(L, nmut, replace=False)
            copy[mp] = (copy[mp] + rng.integers(1, 4, nmut)) % 4
            if trunc_frac and rng.random() < trunc_frac:
                cut = int(rng.integers(L // 10, L))   # keep 3' end
                copy = copy[L - cut:]
            if rng.random() < 0.5:                     # strand
                copy = (3 - copy)[::-1]
            g[pos:pos + copy.size] = copy

    alu = rng.integers(0, 4, 300, dtype=np.int8)
    plant(alu, 40_000, 0.05, 0.15)
    line1 = rng.integers(0, 4, 6_000, dtype=np.int8)
    plant(line1, 300, 0.05, 0.20, trunc_frac=0.7)
    # centromeric alpha-satellite-like field: 2 Mbp of 171-bp monomers
    mono = rng.integers(0, 4, 171, dtype=np.int8)
    cen = int(size * 0.45)
    ncopy = 2_000_000 // 171
    arr = np.tile(mono, ncopy)
    mut = rng.random(arr.size) < 0.03
    arr[mut] = (arr[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
    g[cen:cen + arr.size] = arr
    # telomeric caps
    tel = np.tile(np.frombuffer(b"TTAGGG", np.uint8), 2000)
    telc = np.array([{65: 0, 67: 1, 71: 2, 84: 3}[c] for c in tel[:6]],
                    np.int8)
    telc = np.tile(telc, 2000)
    g[:telc.size] = telc
    g[-telc.size:] = (3 - telc)[::-1]
    # N assembly gaps: ~2% in a few dozen blocks (code 4)
    n_total = int(size * 0.02)
    nblocks = 30
    for _ in range(nblocks):
        blk = n_total // nblocks
        pos = int(rng.integers(telc.size, size - blk - telc.size))
        g[pos:pos + blk] = 4
    return g


def write_fa(path, name, g):
    alpha = np.frombuffer(b"ACGTN", np.uint8)
    with open(path, "w") as f:
        f.write(f">{name}\n")
        gb = alpha[g].tobytes()
        for i in range(0, g.size, 70):
            f.write(gb[i:i + 70].decode() + "\n")


def sim_pairs(rng, g, n, L=150, fmean=200, fsd=10):
    """art_illumina-like: fragment ~N(fmean,fsd) (>=L), mate1 fw at p,
    mate2 rc at p+frag-L; cycle-decaying quals, qual-driven sub errors."""
    size = g.size
    frag = np.maximum(rng.normal(fmean, fsd, n).astype(np.int64), L)
    pos = rng.integers(0, size - frag.max() - 1, n)
    # skip fragments overlapping N gaps (resample once; leftovers filtered)
    cyc = np.arange(L)
    qprof1 = np.clip(38 - cyc * 0.04 - rng.normal(0, 2, (n, L)), 2, 40)
    qprof2 = np.clip(36 - cyc * 0.05 - rng.normal(0, 2, (n, L)), 2, 40)

    def mate(p_start, rc, qprof):
        idx = p_start[:, None] + np.arange(L)[None, :]
        codes = g[idx].astype(np.int8)
        q = qprof.astype(np.int64)
        perr = 10.0 ** (-q / 10.0)
        err = rng.random((n, L)) < perr
        codes = np.where(err & (codes < 4),
                         (codes + rng.integers(1, 4, (n, L))) % 4, codes)
        if rc:
            comp = np.where(codes < 4, 3 - codes, codes)
            codes = comp[:, ::-1]
            q = q[:, ::-1]
        return codes, (q + 33).astype(np.uint8)

    c1, q1 = mate(pos, False, qprof1)
    c2, q2 = mate(pos + frag - L, True, qprof2)
    # drop pairs touching an N gap (reads with N still align; keep a few)
    hasn = ((c1 == 4).sum(1) + (c2 == 4).sum(1)) > 8
    keep = ~hasn
    return c1[keep], q1[keep], c2[keep], q2[keep]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--n-pairs", type=int, default=1_000_000)
    ap.add_argument("--size", type=int, default=46_700_000)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.default_rng(2021)
    g = make_genome(rng, args.size)
    fa = os.path.join(args.outdir, "chr21sim.fa")
    write_fa(fa, "chr21sim", g)
    alpha = np.frombuffer(b"ACGTN", np.uint8)
    f1 = open(os.path.join(args.outdir, "reads_1.fq"), "w")
    f2 = open(os.path.join(args.outdir, "reads_2.fq"), "w")
    done = 0
    chunk = 250_000
    while done < args.n_pairs:
        want = min(chunk, args.n_pairs - done)
        c1, q1, c2, q2 = sim_pairs(rng, g, int(want * 1.05))
        c1, q1, c2, q2 = c1[:want], q1[:want], c2[:want], q2[:want]
        s1, s2 = alpha[c1], alpha[c2]
        for i in range(c1.shape[0]):
            k = done + i
            f1.write("@c%d\n%s\n+\n%s\n" % (
                k, s1[i].tobytes().decode(), q1[i].tobytes().decode()))
            f2.write("@c%d\n%s\n+\n%s\n" % (
                k, s2[i].tobytes().decode(), q2[i].tobytes().decode()))
        done += c1.shape[0]
    f1.close()
    f2.close()
    print(f"wrote {fa} ({args.size} bp), {done} pairs")


if __name__ == "__main__":
    main()
