"""Multi-chip execution: mesh setup, index replication, read sharding.

The reference's parallelism is pthreads over reads with one shared read-only
index per node (bt2_search.cpp:4874-4897, mm.h/shmem.h multi-process index
sharing). The TPU-native equivalent (SURVEY.md §2.10 mapping):

  * a 1-D `data` mesh over all chips (hosts × chips via jax.distributed),
  * the FM index + 2-bit reference REPLICATED onto every device (the human
    genome index is ~3.2 GB — comfortably within a v5e/v5p HBM),
  * read batches sharded along `data`,
  * per-stage device results gathered to hosts for compaction; SAM records
    are emitted in input order per shard, so concatenation by shard index
    reproduces the single-host byte stream (the reference's --reorder
    contract, outq.h:38).

Genomes larger than HBM shard the BWT/occ/ref tables over a `shard` mesh
axis with owner-computes + psum gathers — see dist/sharded.py
(UnpairedAligner(shard_mesh=...), byte-identical to the replicated path,
tests/test_shardidx.py).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def replicate_index(idx, mesh: Mesh):
    """Place every index array replicated on all mesh devices."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(idx, sharding)


def shard_batch(arrays, mesh: Mesh):
    """Shard leading (batch) dim of each array over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), arrays)
