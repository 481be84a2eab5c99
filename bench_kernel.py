"""SW-extend kernel roofline measurement (VERDICT round-2 item 4).

Measures sw_banded's achieved cell rate and int-op throughput against the
chip's VPU peak at production shapes, so kernel work is steered by a
number instead of a guess. Prints one JSON line per configuration plus a
summary utilization estimate.

Op accounting (per DP cell, from the row_fn body in ops/sw.py):
  substitution select + compare chain        ~8 elementwise int32 ops
  E open/extend max + veto                   ~5
  Kogge-Stone lazy-F prefix max              ~2*ceil(log2 W) (shift+max)
  H combine + dir-bit pack + best tracking   ~12
A W=135 rect is ~41 int32 ops/cell. VPU peak on v5e is ~4 int32
ops/cycle/lane * 8 lanes... practically we compare against the bf16/int
elementwise throughput ceiling reported for the chip class
(~2e12 int32 op/s effective); the printed utilization uses that figure
and is labeled with its assumptions.

Run on the real TPU: `python bench_kernel.py`.
"""

import json
import math
import sys
import time

import numpy as np

# practical elementwise int32 ceiling for one v5e core (≈ 2 VPU issue
# slots/cycle * 8 sublanes * 128 lanes * ~0.94 GHz); see the pallas guide's
# VPU discussion — treat as the denominator for "utilization"
VPU_INT32_PEAK = 1.9e12


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from bowtie2_tpu.ops.sw import SWParams, sw_banded

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(1)
    results = []
    for (B, L, G, label) in [
        (8192, 96, 22, "lambda/short bucket"),
        (8192, 192, 30, "100bp PE bucket"),
        (2048, 384, 30, "long bucket"),
    ]:
        W = L + 2 * G + 1
        reads = rng.integers(0, 4, (B, L)).astype(np.int32)
        quals = rng.integers(20, 41, (B, L)).astype(np.int32)
        lens = np.full(B, L, np.int32)
        wins = rng.integers(0, 4, (B, W)).astype(np.int32)
        p = SWParams()
        jr, jq, jl, jw = (jnp.asarray(x) for x in (reads, quals, lens, wins))
        res = sw_banded(jr, jq, jl, jw, p, G)
        res.score.block_until_ready()          # compile
        t0 = time.time()
        n_iter = 3
        for _ in range(n_iter):
            res = sw_banded(jr, jq, jl, jw, p, G)
        res.score.block_until_ready()
        dt = (time.time() - t0) / n_iter
        cells = B * L * W
        ops_per_cell = 25 + 2 * math.ceil(math.log2(W))
        ops = cells * ops_per_cell
        util = ops / dt / VPU_INT32_PEAK
        rec = {
            "metric": "sw_banded_cells_per_sec",
            "label": label,
            "B": B, "L": L, "W": W,
            "cells_per_sec": round(cells / dt / 1e9, 2),
            "unit": "Gcell/s",
            "time_ms": round(dt * 1e3, 2),
            "est_int32_Top_per_sec": round(ops / dt / 1e12, 3),
            "est_vpu_utilization": round(util, 4),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    best = max(r["est_vpu_utilization"] for r in results)
    print(json.dumps({
        "metric": "sw_banded_best_vpu_utilization",
        "value": best,
        "unit": "fraction of ~1.9e12 int32 op/s practical peak",
    }), flush=True)


if __name__ == "__main__":
    main()
