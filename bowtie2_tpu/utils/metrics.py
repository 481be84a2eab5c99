"""Interval metrics (reference PerfMetrics, bt2_search.cpp:1968-2870).

The reference merges per-thread counter blocks and emits a wide TSV line
every --met seconds. Here the pipeline is batched, so counters accumulate
per batch under a lock and `report_line` emits one TSV row; the CLI drives
periodic emission to --met-file / --met-stderr.

Columns (subset of the reference's ~100, same spirit):
  elapsed secs since start; reads/pairs seen; aligned 0/1/>1 breakdowns;
  FM-index ops (LF steps dispatched = the bwops analog); SA offsets
  resolved; DP problems and DP cells computed (SW metrics analog);
  backtraces; per-phase wall seconds.
"""

import threading
import time

FIELDS = ("secs", "reads", "unal", "al_one", "al_multi",
          "fm_lf_steps", "sa_resolves", "dp_problems", "dp_cells",
          "backtraces",
          "t_search", "t_resolve", "t_dp", "t_backtrace", "t_host")


class Metrics:
    def __init__(self):
        self._lock = threading.Lock()
        self.t0 = time.time()
        self.counters = {f: 0 for f in FIELDS if not f.startswith(("secs",))}

    def add(self, **kw) -> None:
        with self._lock:
            for k, v in kw.items():
                self.counters[k] = self.counters.get(k, 0) + v

    def header_line(self) -> str:
        return "\t".join(FIELDS)

    def report_line(self) -> str:
        with self._lock:
            vals = [f"{time.time() - self.t0:.2f}"]
            for f in FIELDS[1:]:
                v = self.counters.get(f, 0)
                vals.append(f"{v:.3f}" if isinstance(v, float) else str(v))
        return "\t".join(vals)


class MetricsSink:
    """Periodic TSV emitter (reference: reportInterval, bt2_search.cpp:2064)."""

    def __init__(self, metrics: Metrics, stream=None, path: str = None,
                 every: int = 1):
        self.metrics = metrics
        self.every = max(every, 1)
        self.f = open(path, "w") if path else stream
        self._last = 0.0
        if self.f:
            self.f.write(metrics.header_line() + "\n")

    def maybe_report(self) -> None:
        if self.f is None:
            return
        now = time.time()
        if now - self._last >= self.every:
            self._last = now
            self.f.write(self.metrics.report_line() + "\n")
            self.f.flush()

    def final(self) -> None:
        if self.f is None:
            return
        self.f.write(self.metrics.report_line() + "\n")
        self.f.flush()
