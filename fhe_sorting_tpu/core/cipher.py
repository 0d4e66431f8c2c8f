"""Ciphertext / plaintext containers (JAX pytrees with static metadata).

A ciphertext is `data[k, L, n]` u32 (k=2 components, L active limb planes,
n ring coefficients) in the bit-reversed NTT evaluation domain, plus static
trace-time metadata:

  level  -- number of rescales performed (OpenFHE GetLevel parity)
  sdeg   -- scale degree (1 or 2): canonical scale is scales[level]^sdeg
            (OpenFHE "NoiseScaleDeg" under FLEXIBLEAUTO)
  slots  -- interpreted slot count; data is `slots`-periodic in slot space,
            so the reference's SetSlots trick (sort_algo.h:429,501,654) is a
            pure metadata change here.

Because metadata is pytree aux-data, level/scale bookkeeping happens at
trace time and jitted programs stay fully static-shaped.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax.tree_util as tree_util
import jax.numpy as jnp


@dataclass(frozen=True)
class Ciphertext:
    data: jnp.ndarray   # [2, L, n] u32, eval domain
    level: int
    sdeg: int
    slots: int

    @property
    def num_limbs(self) -> int:
        return self.data.shape[-2]

    def with_data(self, data) -> "Ciphertext":
        return replace(self, data=data)

    def set_slots(self, slots: int) -> "Ciphertext":
        """Reinterpret the slot count (requires `slots`-periodic content;
        maintained by construction as in the reference's SetSlots usage)."""
        return replace(self, slots=slots)


tree_util.register_pytree_node(
    Ciphertext,
    lambda c: ((c.data,), (c.level, c.sdeg, c.slots)),
    lambda aux, ch: Ciphertext(ch[0], *aux),
)


@dataclass(frozen=True)
class Plaintext:
    """Encoded vector plaintext in the eval domain (limbs match a level)."""

    data: jnp.ndarray   # [L, n] u32
    level: int
    sdeg: int
    slots: int


tree_util.register_pytree_node(
    Plaintext,
    lambda c: ((c.data,), (c.level, c.sdeg, c.slots)),
    lambda aux, ch: Plaintext(ch[0], *aux),
)
