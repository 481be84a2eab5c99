"""Test config: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is validated on virtual CPU devices (the driver's
dryrun does the same); bench.py runs on the real TPU chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's parallel LLVM codegen (default split 32) is implicated in
# nondeterministic mid-suite crashes (SIGSEGV in backend_compile_and_load
# and in executable serialize/deserialize, always while compiling the
# same pipeline-shape region of the suite; reproduced at a clean HEAD
# with and without the persistent cache, round 4). Single-module codegen
# sidesteps it; on this 1-core host it costs nothing.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

# The axon sitecustomize force-registers the TPU backend at interpreter
# startup (before this file runs), so env vars alone can't undo it — the
# jax.config override below wins and pins tests to the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# No persistent compile cache for the suite: this jaxlib's XLA:CPU
# executables do not reliably round-trip serialization (SIGABRT in
# executable.serialize() and SIGSEGV in deserialize_executable were both
# observed killing the suite mid-run, round 4). bowtie2_tpu.__init__
# disables the cache whenever the backend is CPU; the explicit config
# update here also covers any jax use before the package import. The
# TPU backend (bench.py) keeps its cache.
jax.config.update("jax_enable_compilation_cache", False)

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
