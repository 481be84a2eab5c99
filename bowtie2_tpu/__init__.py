"""bowtie2_tpu — a TPU-native short-read aligner with Bowtie 2's capabilities.

A from-scratch JAX/XLA/Pallas re-design of the Bowtie 2 algorithmic contract
(FM-index multiseed search + gapped Smith-Waterman extension + SAM output),
restructured from one-read-at-a-time branchy C++ into batched, fixed-shape
device pipelines: thousands of reads per device step, per-stage compaction on
the host, collectives across a `jax.sharding.Mesh` for multi-chip scaling.

Reference behavior contract: BenLangmead/bowtie2 v2.5.5 (see SURVEY.md).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compile cache: the pipeline uses a small set of bucketed
# shapes, but first-compile on a TPU backend costs seconds per shape —
# cache across runs. The env var alone is NOT enough: this JAX build does
# not read JAX_COMPILATION_CACHE_DIR into the config (verified: config
# stays None with the env var set), so apply it explicitly — honoring the
# user's env path when present, else a per-user default.
import jax as _jax


def _host_tag() -> str:
    """XLA:CPU AOT cache blobs bake in the compile machine's CPU features
    but the cache key omits them — loading a blob compiled on a different
    host SIGABRTs (observed round 3). Default cache paths are therefore
    host-fingerprinted; an explicit JAX_COMPILATION_CACHE_DIR is honored
    as-is."""
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


if _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/bowtie2_tpu/jax-" + _host_tag())))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def _warm_device_link() -> None:
    """Round-trip one tiny buffer through the device at import time.

    On the tunneled TPU backend, the FIRST device→host transfer of a
    process stalls ~190s if it happens after compilation activity; an
    immediate tiny round-trip avoids the stall entirely (measured).

    Skipped in multi-host mode: jax.distributed.initialize must precede
    any backend use (dist/multihost.py init_multihost).
    """
    if _os.environ.get("BT2X_NUM_PROCESSES") or \
            _os.environ.get("BT2X_COORDINATOR"):
        return
    try:
        import numpy as _np
        import jax.numpy as _jnp

        _np.asarray(_jnp.zeros(8, _jnp.int32))
    except Exception:
        pass  # no device — CPU tests and doc builds don't care


_warm_device_link()

from bowtie2_tpu.index.fmindex import FMIndex  # noqa: F401
