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


def make_mesh_2d(n_batch: int, n_limb: int,
                 axes: tuple = ("batch", "limb")) -> Mesh:
    """2D mesh: independent ciphertext work items on one axis, RNS limb
    planes on the other (the two natural mesh dimensions of this domain,
    SURVEY.md section 5)."""
    devs = jax.devices()
    n = n_batch * n_limb
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]).reshape(n_batch, n_limb), axes)


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Shard the leading (stacked-ciphertext) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
