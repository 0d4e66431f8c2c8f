"""Limb-axis (tensor-parallel) sharding of ciphertext RNS planes.

The second mesh axis promised by `parallel/mesh.py`: ciphertext data
[2, L, n] is sharded over its limb axis.  Almost the whole op surface is
limb-local - add/sub/negate, ct*pt / ct*ct tensor products, and crucially
the NTT itself (each limb plane transforms independently) - so XLA's SPMD
partitioner keeps those fully parallel with zero communication.  The only
ops that mix limbs are:

  * rescale          - the dropped limb's coefficient form is broadcast to
                       the surviving limbs (one [2, 1, n] plane over ICI);
  * ModUp / ModDown  - the hybrid key-switch CRT base extensions gather the
                       digit (alpha limbs) resp. special (K limbs)
                       coefficient planes.

Rather than hand-writing those collectives, this module follows the
annotate-and-let-XLA-partition recipe: inputs carry a NamedSharding with
PartitionSpec (None, "limb", None), the existing jitted evaluator ops run
unchanged, and GSPMD inserts all-gathers exactly at the base-extension
boundaries.  This mirrors how the reference distributes *nothing* (it is
single-process OpenMP; SURVEY.md section 5 "distributed backend: none") -
the limb axis is new capability the TPU build adds.

Composes with the batch axis (`mehp24_sharded.py`): a 2D mesh
("batch", "limb") shards independent ciphertexts over one axis and their
RNS planes over the other.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.cipher import Ciphertext
from ..core.evaluator import Evaluator


def limb_spec(mesh: Mesh, axis: str = "limb") -> NamedSharding:
    """Sharding for ciphertext/plaintext limb planes [..., L, n]."""
    ndim_spec = (None, axis, None)
    return NamedSharding(mesh, P(*ndim_spec))


def shard_limbs(ct: Ciphertext, mesh: Mesh, axis: str = "limb") -> Ciphertext:
    """Place a ciphertext with its limb axis sharded over `axis`."""
    return ct.with_data(jax.device_put(ct.data, limb_spec(mesh, axis)))


def is_limb_sharded(ct: Ciphertext, axis: str = "limb") -> bool:
    sh = ct.data.sharding
    spec = getattr(sh, "spec", None)
    return spec is not None and axis in tuple(spec)


class LimbParallelEvaluator:
    """Thin veneer over `Evaluator` that keeps operands limb-sharded.

    Every op accepts/returns ordinary `Ciphertext`s whose `.data` carries a
    limb NamedSharding; the underlying jitted programs are the same ones the
    single-chip path uses - XLA re-specializes each (op, level, sdeg)
    executable for the sharded layout, inserting ICI collectives only for
    rescale / base-extension mixes.
    """

    def __init__(self, ev: Evaluator, mesh: Mesh, axis: str = "limb"):
        self.ev = ev
        self.mesh = mesh
        self.axis = axis

    def ingest(self, ct: Ciphertext) -> Ciphertext:
        return shard_limbs(ct, self.mesh, self.axis)

    def __getattr__(self, name):
        return getattr(self.ev, name)
