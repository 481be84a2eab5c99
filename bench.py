"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE primary JSON line on stdout as early as possible (lambda-phage
SE end-to-end, the reference repo's own example workload:
/root/reference/example/reads/reads_1.fq, sensitive preset), then runs
deadline-guarded extras (E. coli-scale SE/PE, BASELINE.json configs 2-3)
whose results go to stderr + BENCH_EXTRA.json only.

Structure is dictated by round-2's failure mode: the old script ran every
extra BEFORE printing the primary line and the driver timed out with zero
captured numbers. Now the primary line is flushed the moment it exists and
every extra checks a wall-clock budget (BENCH_DEADLINE_S, default 480 s)
before starting.

vs_baseline compares against reference bowtie2-align-s single-thread on
this host's CPU (measured uncontended; see BASELINE.md).
"""

import json
import os
import sys
import time

T0 = time.time()
DEADLINE = float(os.environ.get("BENCH_DEADLINE_S", "480"))

REF_READS_PER_SEC = 18300.0   # bowtie2-align-s -p1, this host, lambda 10k (0.545s)
REF_ECOLI_SE_RPS = 19010.0    # -p1, 100k x 100bp sim reads (5.26s), this host
REF_ECOLI_PE_PPS = 5377.0     # -p1, 50k sim pairs (9.30s), this host
ECOLI_FA = "/tmp/ecoli_sim.fa"
ECOLI_SE = "/tmp/ecoli_se.fq"
ECOLI_PE1 = "/tmp/ecoli_1.fq"
ECOLI_PE2 = "/tmp/ecoli_2.fq"
ECOLI_IDX = "/tmp/bench_ecoli_idx"
LAMBDA_FA = "/root/reference/example/reference/lambda_virus.fa"
LAMBDA_READS = "/root/reference/example/reads/reads_1.fq"
IDX_PREFIX = "/tmp/bench_lambda_idx"


def left(need: float) -> bool:
    """True if at least `need` seconds remain before the deadline."""
    return (time.time() - T0) + need < DEADLINE


def gen_ecoli_corpus():
    """Deterministically regenerate the E. coli-scale corpus if /tmp was
    wiped: 4.6 Mbp random genome, 100k x 100 bp SE reads, 50k FR pairs
    (insert 150-550), 0.5% substitution errors. Seeded so reruns measure
    the same workload."""
    import numpy as np
    rng = np.random.default_rng(42)
    G = 4_600_000
    genome = rng.integers(0, 4, G, dtype=np.int8)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    with open(ECOLI_FA, "w") as f:
        f.write(">ecoli_sim\n")
        gb = alpha[genome].tobytes().decode()
        for i in range(0, G, 70):
            f.write(gb[i:i + 70] + "\n")

    def reads(n, L, rng):
        pos = rng.integers(0, G - L, n)
        idx = pos[:, None] + np.arange(L)[None, :]
        codes = genome[idx].astype(np.int8)
        err = rng.random((n, L)) < 0.005
        codes = np.where(err, (codes + rng.integers(1, 4, (n, L))) % 4, codes)
        rc = rng.random(n) < 0.5
        comp = 3 - codes
        codes = np.where(rc[:, None], comp[:, ::-1], codes)
        quals = rng.integers(25, 41, (n, L)).astype(np.uint8) + 33
        return codes, quals

    with open(ECOLI_SE, "w") as f:
        codes, quals = reads(100_000, 100, rng)
        seqs = alpha[codes]
        for i in range(codes.shape[0]):
            f.write("@e%d\n%s\n+\n%s\n" % (
                i, seqs[i].tobytes().decode(), quals[i].tobytes().decode()))
    # FR pairs: mate1 fw at p, mate2 rc at p+insert-L
    pos = rng.integers(0, G - 600, 50_000)
    ins = rng.integers(150, 551, 50_000)
    L = 100
    i1 = pos[:, None] + np.arange(L)[None, :]
    i2 = (pos + ins - L)[:, None] + np.arange(L)[None, :]
    c1 = genome[i1].astype(np.int8)
    c2 = (3 - genome[i2].astype(np.int8))[:, ::-1]
    for c in (c1, c2):
        err = rng.random(c.shape) < 0.005
        c[...] = np.where(err, (c + rng.integers(1, 4, c.shape)) % 4, c)
    q1 = rng.integers(25, 41, c1.shape).astype(np.uint8) + 33
    q2 = rng.integers(25, 41, c2.shape).astype(np.uint8) + 33
    with open(ECOLI_PE1, "w") as f1, open(ECOLI_PE2, "w") as f2:
        s1, s2 = alpha[c1], alpha[c2]
        for i in range(c1.shape[0]):
            f1.write("@p%d\n%s\n+\n%s\n" % (
                i, s1[i].tobytes().decode(), q1[i].tobytes().decode()))
            f2.write("@p%d\n%s\n+\n%s\n" % (
                i, s2[i].tobytes().decode(), q2[i].tobytes().decode()))


def _probe_backend(timeout_s: float = 150.0) -> bool:
    """True if the default (TPU) backend initializes within timeout.

    The tunneled axon backend can hang indefinitely at init when the
    tunnel is down (observed: a full day of UNAVAILABLE during round 3);
    probing in a SUBPROCESS keeps this process clean so it can fall back
    to CPU and still print its primary metric instead of timing out with
    no output at all."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(len(jax.devices()))"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _host_tag() -> str:
    """Host fingerprint for the compile-cache path: XLA:CPU AOT blobs are
    machine-feature-specific but the cache key omits the features — a blob
    compiled on another host SIGABRTs at load (observed round 3)."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.node() or "unknown"


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/bowtie2_tpu/jax-" + _host_tag()))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    backend_note = None
    if not _probe_backend():
        import jax
        jax.config.update("jax_platforms", "cpu")
        backend_note = "cpu-fallback (TPU backend init timed out)"
        print(json.dumps({"warning": backend_note}), file=sys.stderr,
              flush=True)
    from bowtie2_tpu.index.build import build_index, load_index, save_index
    from bowtie2_tpu.io.fastx import iter_reads
    from bowtie2_tpu.pipeline.align import UnpairedAligner, bucket_groups
    from bowtie2_tpu.pipeline.policy import make_policy

    if not os.path.exists(IDX_PREFIX + ".bt2t.json"):
        save_index(build_index(LAMBDA_FA), IDX_PREFIX)
    data = load_index(IDX_PREFIX)
    records = list(iter_reads(LAMBDA_READS))
    if backend_note:
        records = records[:2000]     # CPU fallback: stay under the driver
        # timeout — the number is a liveness marker, not a TPU claim

    def run(aligner, batch=8192):
        by_bucket = bucket_groups([r.seq.size for r in records])
        n = 0
        handles = []
        for bkt in sorted(by_bucket):
            idxs = by_bucket[bkt]
            for k in range(0, len(idxs), batch):
                chunk = [records[j] for j in idxs[k:k + batch]]
                handles.append(aligner.submit(chunk))
                n += len(chunk)
        for h in handles:
            aligner.collect_raw(h)
        return n

    run(UnpairedAligner(data, make_policy("sensitive")))  # warmup/compile
    runs = []
    for _ in range(1 if backend_note else 3):   # noisy tunnel: median of 3
        aligner2 = UnpairedAligner(data, make_policy("sensitive"))
        t0 = time.time()
        n = run(aligner2)
        dt = time.time() - t0
        runs.append(n / dt)
        if not left(10):
            break
    runs.sort()
    rps = runs[len(runs) // 2]                  # median
    spread = 100.0 * (runs[-1] - runs[0]) / rps if len(runs) > 1 else 0.0

    # PRIMARY LINE — printed before any extra work, flushed immediately.
    primary = {
        "metric": "lambda_unpaired_e2e_reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(rps / REF_READS_PER_SEC, 4),
        "runs": [round(r, 1) for r in runs],
        "spread_pct": round(spread, 1),
    }
    if backend_note:
        primary["backend"] = backend_note
    print(json.dumps(primary), flush=True)

    # ---- deadline-guarded extras (stderr + BENCH_EXTRA.json only) ----
    extra = {"lambda_se_reads_per_sec": round(rps, 1),
             "lambda_se_vs_baseline": round(rps / REF_READS_PER_SEC, 4)}
    if backend_note:
        extra["backend"] = backend_note

    def save_extra():
        print(json.dumps(extra), file=sys.stderr, flush=True)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_EXTRA.json"), "w") as f:
            json.dump(extra, f)

    try:
        if not (os.path.exists(ECOLI_FA) and os.path.exists(ECOLI_SE)):
            if left(240):
                gen_ecoli_corpus()
            else:
                extra["ecoli_skipped"] = "no corpus + deadline"
                save_extra()
                return
        if not os.path.exists(ECOLI_IDX + ".bt2t.json"):
            if not left(200):
                extra["ecoli_skipped"] = "no index + deadline"
                save_extra()
                return
            save_index(build_index(ECOLI_FA), ECOLI_IDX)
        edata = load_index(ECOLI_IDX)

        if left(90):
            try:
                ereads = list(iter_reads(ECOLI_SE))
                ea = UnpairedAligner(edata, make_policy("sensitive"))
                hs = [ea.submit(ereads[k:k + 8192])
                      for k in range(0, len(ereads), 8192)]
                for h in hs:
                    ea.collect_raw(h)          # warmup/compile pass
                t0 = time.time()
                ea2 = UnpairedAligner(edata, make_policy("sensitive"))
                hs = [ea2.submit(ereads[k:k + 8192])
                      for k in range(0, len(ereads), 8192)]
                for h in hs:
                    ea2.collect_raw(h)
                se_rps = len(ereads) / (time.time() - t0)
                extra["ecoli_se_reads_per_sec"] = round(se_rps, 1)
                extra["ecoli_se_vs_baseline"] = round(
                    se_rps / REF_ECOLI_SE_RPS, 4)
                save_extra()
            except Exception as e:
                extra["ecoli_se_error"] = str(e)[:200]
                save_extra()

        if left(120):
            try:
                from bowtie2_tpu.pipeline.align import PairedAligner
                pairs = list(zip(iter_reads(ECOLI_PE1), iter_reads(ECOLI_PE2)))
                # batch divides the corpus exactly: a ragged tail batch
                # would compile a second fused-PE shape inside the timed
                # region (round-2 failure mode); Bp pads 3125 -> 4096
                PB = 3125
                pa = PairedAligner(edata, make_policy("sensitive"))
                pa.align_pairs_fast(pairs[:PB], batch=PB,
                                    raw=True)   # warmup/compile
                t0 = time.time()
                pa2 = PairedAligner(edata, make_policy("sensitive"))
                n = pa2.align_pairs_fast(pairs, batch=PB, raw=True)
                pe_pps = len(pairs) / (time.time() - t0)
                extra["ecoli_pe_pairs_per_sec"] = round(pe_pps, 1)
                extra["ecoli_pe_vs_baseline"] = round(
                    pe_pps / REF_ECOLI_PE_PPS, 4)
                del n
                save_extra()
            except Exception as e:
                extra["ecoli_pe_error"] = str(e)[:200]
                save_extra()
    except Exception as e:
        extra["ecoli_error"] = str(e)[:200]
        save_extra()


if __name__ == "__main__":
    main()
