"""Device-mesh helpers for multi-chip scaling.

The reference's only parallelism is OpenMP threads over independent
ciphertext tasks (SURVEY.md section 2 "parallelism strategies"); the TPU
equivalents are mesh axes:

  "batch" -- independent ciphertext work items (constructRank batches,
             the MEHP24 pairwise-comparison triangle, k-way lane groups);
             pure data parallelism, accumulations become psums over ICI.
  "limb"  -- RNS limb planes (a tensor-parallel axis for NTT/key-switch;
             base extension requires all-gathers along it; see
             parallel/limb_parallel.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Shard the leading (stacked-ciphertext) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
