"""Test config: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is validated on virtual CPU devices (the driver's
dryrun does the same); bench.py runs on the real TPU chip instead.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
