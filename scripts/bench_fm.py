"""FM-chain microbench: device time of the LF-gather phases at production
SE shapes (8192 reads, 100 bp, lambda-sized index by default).

Round-4 phase profile (pre-fusion, Lmax=384 shapes): exact_sweep 132 ms,
half-read substring 122 ms, seed search 98 ms, sa_resolve 30 ms per
8192-read batch. This script re-measures the same phases so layout/kernel
changes (the [occ4|bwt8] row fusion, popcount Occ) have a tracked number.

Usage: python scripts/bench_fm.py [--fasta PATH] [--batch 8192] [--len 100]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fasta",
                    default="/root/reference/example/reference/lambda_virus.fa")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--len", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    from bowtie2_tpu.index.build import build_index
    from bowtie2_tpu.index.fmindex import FMIndex
    from bowtie2_tpu.ops import fm

    data = build_index(args.fasta)
    idx = FMIndex.from_host(data)
    half = idx.fw
    B, L = args.batch, args.len
    rng = np.random.default_rng(7)
    n = int(data.fw.n)
    # reads = genome substrings (realistic ranges, mostly alive scans)
    text = np.asarray(idx.ref_words)
    pos = rng.integers(0, max(n - L - 8, 1), B)
    gp = pos[:, None] + np.arange(L)[None, :]
    reads = ((text[gp >> 4] >> (2 * (gp & 15))) & 3).astype(np.int32)
    jreads = jax.numpy.asarray(reads)
    lens = jax.numpy.asarray(np.full(B, L, np.int32))

    def timeit(name, f):
        f()  # compile
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = f()
            jax.block_until_ready(r)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:24s} {best * 1e3:8.2f} ms  (median "
              f"{sorted(ts)[len(ts) // 2] * 1e3:.2f})")
        return best

    timeit("exact_sweep", lambda: fm.exact_sweep(half, jreads, lens))
    # half-read substring search (pigeonhole 1mm phase shape: 2 halves)
    hlen = jax.numpy.asarray(np.full(2 * B, L // 2, np.int32))
    hseqs = jax.numpy.asarray(
        np.concatenate([reads[:, :L // 2], reads[:, L // 2:]], axis=0))
    timeit("substring(2B halves)", lambda: fm.substring_search(
        half, hseqs, hlen))
    # seed search: n_seeds per read at L=100/ival~15 -> ~6 seeds
    smax = 8
    offs = np.minimum(np.arange(smax, dtype=np.int32) * 13, L - 22)
    offs = np.broadcast_to(offs, (B, smax)).copy()
    valid = np.ones((B, smax), bool)
    timeit("seed_search(8/read)", lambda: fm.seed_search_offsets(
        half, jreads, jax.numpy.asarray(offs), jax.numpy.asarray(valid),
        22, min(10, data.fw.ftab_chars)))
    rows = jax.numpy.asarray(
        rng.integers(0, n, 4 * B).astype(np.asarray(half.fchr).dtype))
    timeit("sa_resolve(4B rows)", lambda: fm.sa_resolve(
        half, rows, 1 << data.off_rate))


if __name__ == "__main__":
    main()
