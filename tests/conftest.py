"""Test config: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is validated on virtual CPU devices (the driver's
dryrun does the same); bench.py runs on the real TPU chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers the TPU backend at interpreter
# startup (before this file runs), so env vars alone can't undo it — the
# jax.config override below wins and pins tests to the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The persistent cache stores XLA:CPU AOT executables whose machine
# features are NOT part of the cache key — loading a blob compiled on a
# different host SIGABRTs mid-suite (observed round 3). Scope the cache
# dir by a host fingerprint so each machine gets its own cache.
def _host_tag():
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


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      f"/root/repo/.jax_cache/{_host_tag()}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def lambda_fasta():
    return "/root/reference/example/reference/lambda_virus.fa"


@pytest.fixture(scope="session")
def lambda_reads():
    return "/root/reference/example/reads/reads_1.fq"
