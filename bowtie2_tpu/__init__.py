"""bowtie2_tpu — a TPU-native short-read aligner with Bowtie 2's capabilities.

A from-scratch JAX/XLA/Pallas re-design of the Bowtie 2 algorithmic contract
(FM-index multiseed search + gapped Smith-Waterman extension + SAM output),
restructured from one-read-at-a-time branchy C++ into batched, fixed-shape
device pipelines: thousands of reads per device step, per-stage compaction on
the host, collectives across a `jax.sharding.Mesh` for multi-chip scaling.

Reference behavior contract: BenLangmead/bowtie2 v2.5.5 (see SURVEY.md).
"""

__version__ = "0.1.0"

from bowtie2_tpu.index.fmindex import FMIndex  # noqa: F401
