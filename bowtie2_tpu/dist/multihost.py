"""Multi-host execution: process init, input sharding, ordered SAM merge.

The reference is single-node (pthreads + mmap'd index, SURVEY.md §5.8);
the TPU-native multi-host story replaces it with `jax.distributed`:

  * every process (host) calls `init_multihost` (jax.distributed.initialize
    — the coordination backend standing in for the reference's
    pthreads/shm),
  * the FM index is loaded and device-put on every host's local chips
    (the reference's one-shared-read-only-index contract),
  * reads are sharded BY CONTIGUOUS WINDOW: host h takes windows
    w with w % P == h (`shard_windows`); each host aligns its windows
    with the normal single-host pipeline and writes one shard file,
  * `merge_shards` concatenates shard outputs back into input order —
    byte-identical to a single-host run (the reference's --reorder
    ordered-output contract, outq.h:38).

The per-window round-robin keeps shards balanced without any cross-host
communication during alignment; the only collective point is the final
merge (host 0, or a post-processing `cat` in window order). Scaling is
embarrassingly parallel: reads/s should scale ~linearly with hosts as
long as input IO keeps up (measure with `scripts` once multi-host
hardware is available; the 2-process CPU determinism test in
tests/test_multihost.py validates the contract).
"""

import itertools
import os
from typing import Iterable, Iterator, List, Optional

WINDOW = 65536   # reads per shard window (must match across hosts)


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or BT2X_* env vars.

    On TPU pods jax.distributed.initialize() autodetects; on CPU/other
    fleets pass coordinator ("host:port"), num_processes and process_id.
    """
    import jax

    coordinator = coordinator or os.environ.get("BT2X_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("BT2X_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("BT2X_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        jax.distributed.initialize()


def shard_windows(reader: Iterable, process_id: int, num_processes: int,
                  window: int = WINDOW) -> Iterator[tuple]:
    """Yield (window_index, records) for the windows owned by this host.

    Deterministic round-robin over fixed-size windows of the input stream:
    every host parses the stream (cheap vs alignment) but aligns only its
    windows; window w belongs to host w % P.
    """
    it = iter(reader)
    for w in itertools.count():
        chunk = list(itertools.islice(it, window))
        if not chunk:
            return
        if w % num_processes == process_id:
            yield w, chunk
        if len(chunk) < window:
            return


def shard_path(prefix: str, window_index: int) -> str:
    return f"{prefix}.shard{window_index:08d}"


def merge_shards(prefix: str, out_path: str, header: bytes = b"",
                 cleanup: bool = True) -> int:
    """Concatenate shard files in window order → single SAM (host 0).

    Returns the number of shards merged. Deterministic: window order is
    input order, so output bytes equal a single-host run's.
    """
    import glob

    shards = sorted(glob.glob(prefix + ".shard*"))
    n = 0
    with open(out_path, "wb") as out:
        if header:
            out.write(header)
        for s in shards:
            with open(s, "rb") as f:
                out.write(f.read())
            if cleanup:
                os.remove(s)
            n += 1
    return n
