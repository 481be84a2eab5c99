"""Command-line interface: build / align / inspect.

Flag surface mirrors the reference binaries where implemented
(bt2_search.cpp parseOptions:1668, bt2_build.cpp, bt2_inspect.cpp); unknown
reference flags fail loudly rather than silently diverging.
"""

import argparse
import sys
import time


def cmd_build(argv):
    ap = argparse.ArgumentParser(prog="bt2x build")
    ap.add_argument("fasta")
    ap.add_argument("prefix")
    ap.add_argument("--offrate", type=int, default=5)
    ap.add_argument("--ftabchars", type=int, default=10)
    args = ap.parse_args(argv)
    from bowtie2_tpu.index.build import build_index, save_index
    t0 = time.time()
    data = build_index(args.fasta, ftab_chars=args.ftabchars,
                       off_rate=args.offrate)
    save_index(data, args.prefix)
    print(f"built index for {len(data.ref_names)} sequence(s), "
          f"{data.n_joined} bp joined, in {time.time()-t0:.1f}s",
          file=sys.stderr)
    return 0


def cmd_align(argv):
    ap = argparse.ArgumentParser(prog="bt2x align")
    ap.add_argument("-x", dest="index", required=True)
    ap.add_argument("-U", dest="unpaired", default=None)
    ap.add_argument("-1", dest="mate1", default=None)
    ap.add_argument("-2", dest="mate2", default=None)
    ap.add_argument("-S", dest="out", default=None)
    ap.add_argument("--local", action="store_true")
    ap.add_argument("--preset", default="sensitive",
                    choices=["very-fast", "fast", "sensitive", "very-sensitive"])
    ap.add_argument("--very-fast", dest="preset", action="store_const",
                    const="very-fast")
    ap.add_argument("--fast", dest="preset", action="store_const", const="fast")
    ap.add_argument("--sensitive", dest="preset", action="store_const",
                    const="sensitive")
    ap.add_argument("--very-sensitive", dest="preset", action="store_const",
                    const="very-sensitive")
    ap.add_argument("-L", dest="seed_len", type=int, default=None)
    ap.add_argument("-p", "--threads", type=int, default=1)  # accepted; batching supersedes
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("-f", dest="fasta_reads", action="store_true")
    ap.add_argument("--phred64", action="store_true")
    ap.add_argument("-k", dest="khits", type=int, default=1)
    ap.add_argument("--norc", action="store_true")
    ap.add_argument("--nofw", action="store_true")
    args = ap.parse_args(argv)

    from bowtie2_tpu.index.build import load_index
    from bowtie2_tpu.io.fastx import iter_reads
    from bowtie2_tpu.io.sam import SamWriter
    from bowtie2_tpu.pipeline.align import PairedAligner, UnpairedAligner
    from bowtie2_tpu.pipeline.policy import make_policy

    overrides = {}
    if args.seed_len is not None:
        overrides["seed_len"] = args.seed_len
    if args.khits != 1:
        overrides["khits"] = args.khits
    if args.norc:
        overrides["norc"] = True
    if args.nofw:
        overrides["nofw"] = True
    pol = make_policy(args.preset, local=args.local, **overrides)

    data = load_index(args.index)
    paired = args.mate1 is not None and args.mate2 is not None
    if args.batch is None:
        args.batch = 2048 if paired else 8192
    aligner = (PairedAligner if paired else UnpairedAligner)(data, pol)
    out = open(args.out, "w") if args.out else sys.stdout
    writer = SamWriter(out, data.ref_names, data.ref_lens,
                       prog_args=" ".join(["bt2x align"] + argv))

    if not args.unpaired and not paired:
        print("provide -U or -1/-2", file=sys.stderr)
        return 2
    qoff = 64 if args.phred64 else 33
    fmt = "fasta" if args.fasta_reads else "auto"
    t0 = time.time()
    nreads = 0
    # Window + length-bucket: group reads of similar length so device
    # shapes stay small and stable (a single long read would otherwise pad
    # the whole batch to its bucket). Output is restitched in input order —
    # the reference's --reorder contract (outq.h:38).
    from bowtie2_tpu.pipeline.align import _bucket
    window_n = args.batch * 8
    if paired:
        def _pair_iter():
            it1 = iter_reads(args.mate1, fmt=fmt, qual_offset=qoff)
            it2 = iter_reads(args.mate2, fmt=fmt, qual_offset=qoff)
            for r1, r2 in zip(it1, it2):
                yield (r1, r2)
        reader = _pair_iter()
    else:
        reader = iter_reads(args.unpaired, fmt=fmt, qual_offset=qoff)
    done = False
    while not done:
        window = []
        for rec in reader:
            window.append(rec)
            if len(window) >= window_n:
                break
        else:
            done = True
        if not window:
            break
        by_bucket = {}
        for i, rec in enumerate(window):
            ln = max(rec[0].seq.size, rec[1].seq.size) if paired \
                else rec.seq.size
            by_bucket.setdefault(_bucket(max(ln, 1)), []).append(i)
        results = [None] * len(window)
        chunks = []
        for bkt in sorted(by_bucket):
            idxs = by_bucket[bkt]
            for k in range(0, len(idxs), args.batch):
                chunks.append(idxs[k:k + args.batch])
        # sequential batches: measured faster than thread-overlap (two
        # threads contend on JAX dispatch); JAX's async dispatch already
        # overlaps device compute with the host phases
        for chunk in chunks:
            outs = aligner.align_batch([window[j] for j in chunk])
            if paired:   # two records per pair, regroup
                outs = [outs[2 * t:2 * t + 2] for t in range(len(chunk))]
            for j, rec_out in zip(chunk, outs):
                results[j] = rec_out
        for rec_out in results:
            if paired:
                for r in rec_out:
                    writer.write(r)
            else:
                writer.write(rec_out)
        nreads += len(window)
    dt = time.time() - t0
    print(aligner.stats.summary(), file=sys.stderr)
    print(f"# {nreads} reads in {dt:.1f}s = {nreads/max(dt,1e-9):.0f} reads/s",
          file=sys.stderr)
    if args.out:
        out.close()
    return 0


def cmd_inspect(argv):
    ap = argparse.ArgumentParser(prog="bt2x inspect")
    ap.add_argument("prefix")
    ap.add_argument("-n", "--names", action="store_true")
    ap.add_argument("-s", "--summary", action="store_true")
    args = ap.parse_args(argv)
    from bowtie2_tpu.index.build import load_index
    data = load_index(args.prefix)
    if args.names:
        for n in data.ref_names:
            print(n)
        return 0
    if args.summary:
        print(f"Sequences: {len(data.ref_names)}")
        for n, l in zip(data.ref_names, data.ref_lens):
            print(f"Sequence\t{n}\t{int(l)}")
        print(f"Joined length\t{data.n_joined}")
        print(f"Offrate\t{data.off_rate}")
        return 0
    # full FASTA reconstruction from the 2-bit reference + N mask
    import numpy as np
    from bowtie2_tpu.constants import CODE_TO_CHAR
    for ri, name in enumerate(data.ref_names):
        print(f">{name}")
        lo, hi = int(data.ref_cum[ri]), int(data.ref_cum[ri + 1])
        pos = np.arange(lo, hi)
        word = data.ref_words[pos >> 4]
        code = (word >> (2 * (pos & 15))) & 3
        nbit = (data.refn_words[pos >> 5] >> (pos & 31)) & 1
        code = np.where(nbit == 1, 4, code).astype(np.uint8)
        s = CODE_TO_CHAR[code].tobytes().decode()
        for k in range(0, len(s), 60):
            print(s[k:k + 60])
    return 0


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: bt2x {build|align|inspect} ...", file=sys.stderr)
        return 2
    cmd, rest = argv[0], argv[1:]
    if cmd == "build":
        return cmd_build(rest)
    if cmd == "align":
        return cmd_align(rest)
    if cmd == "inspect":
        return cmd_inspect(rest)
    print(f"unknown command: {cmd}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
