"""Debug harness: run the RNG-trajectory replay against the oracle.

Usage:
  python scripts/replay_debug.py /tmp/repc [n] [--names rr1,rr2]
Expects OUTDIR/rep.fa, reads.fq, oracle.sam (scripts/make_repcorpus.py +
the reference binary). Reports per-read agreement of (pos, strand, AS,
XS) between the replay's prediction and the oracle, for reads where the
canonical pipeline diverges.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bowtie2_tpu.index.build import build_index
from bowtie2_tpu.io.fastx import iter_reads
from bowtie2_tpu.pipeline.align import UnpairedAligner
from bowtie2_tpu.pipeline.policy import make_policy
from bowtie2_tpu.pipeline.replay_driver import ReplayBuilder
from bowtie2_tpu.pipeline.rng import select_by_score
from bowtie2_tpu.pipeline.seed_replay import ReadReplay, ReplayAbort


def parse_sam(path):
    recs = {}
    for l in open(path):
        if l.startswith("@"):
            continue
        t = l.rstrip("\n").split("\t")
        if t[0] in recs:
            continue                    # primary only
        opts = dict((x.split(":", 2)[0], x.split(":", 2)[2])
                    for x in t[11:])
        recs[t[0]] = dict(flag=int(t[1]), rname=t[2], pos=int(t[3]),
                          mapq=int(t[4]),
                          AS=opts.get("AS"), XS=opts.get("XS"))
    return recs


def main():
    outdir = sys.argv[1]
    n_dbg = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    names = None
    if "--names" in sys.argv:
        names = set(sys.argv[sys.argv.index("--names") + 1].split(","))
    oracle = parse_sam(f"{outdir}/oracle.sam")
    ours = parse_sam(f"{outdir}/ours.sam")
    div = [nm for nm in oracle
           if (oracle[nm]["pos"], oracle[nm]["flag"] & 16,
               oracle[nm]["AS"], oracle[nm]["XS"]) !=
              (ours[nm]["pos"], ours[nm]["flag"] & 16,
               ours[nm]["AS"], ours[nm]["XS"])]
    print(f"{len(div)} diverging reads")
    if names:
        picks = [nm for nm in div if nm in names] or sorted(names)
    else:
        picks = div[:n_dbg]

    reads = {r.name: r for r in iter_reads(f"{outdir}/reads.fq")}
    edata = build_index(f"{outdir}/rep.fa")
    al = UnpairedAligner(edata, make_policy("sensitive"))
    builder = ReplayBuilder(al)
    recs = [reads[nm] for nm in picks]
    inputs = builder.build(recs, trace=True)
    pol = builder._policy()

    n_ok = n_abort = n_bad = 0
    for rec, inp in zip(recs, inputs):
        o = oracle[rec.name]
        if inp is None:
            n_abort += 1
            print(f"{rec.name}: ABORT (build)")
            continue
        try:
            rr = ReadReplay(inp, pol)
            sink = rr.run()
        except ReplayAbort as e:
            n_abort += 1
            print(f"{rec.name}: ABORT ({e})")
            continue
        if not sink.alns:
            pred = ("unal",)
            got = (o["flag"] & 4) != 0
            ok = got
        else:
            scores = [a.score for a in sink.alns]
            perm = select_by_score(scores, 1, rr.rng)
            prim = sink.alns[perm[0]]
            best = max(scores)
            others = sorted(scores, reverse=True)
            xs = others[1] if len(others) > 1 else None
            pred = (prim.refoff + 1, prim.fw, prim.score, xs)
            got = (o["pos"], (o["flag"] & 16) == 0,
                   int(o["AS"]) if o["AS"] else None,
                   int(o["XS"]) if o["XS"] else None)
            ok = pred == got
        if ok:
            n_ok += 1
        else:
            n_bad += 1
            print(f"{rec.name}: pred={pred} oracle={got} "
                  f"nalns={len(sink.alns)} minsc_end={rr.minsc} "
                  f"iters={rr.n_ex_iters} dps={rr.n_ex_dps}")
    print(f"ok={n_ok} bad={n_bad} abort={n_abort} / {len(picks)}")


if __name__ == "__main__":
    main()
