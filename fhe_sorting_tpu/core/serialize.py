"""Serialization of contexts, keys and ciphertexts (serving boundary).

Role parity with the OpenFHE Serial::SerializeToFile surface the reference's
serving context uses (/root/reference/src/sort.h:31-102): the server process
deserializes a crypto context, public/eval keys and an input ciphertext from
files, evaluates, and serializes the output.  The wire format here is npz
(numpy archives) + a small JSON header - self-describing and independent of
OpenFHE's binary format.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .cipher import Ciphertext
from .context import CkksParams, Context
from .keys import Keys, KeySwitchKey


def save_context(path: str, ctx: Context):
    p = ctx.params
    with open(path, "w") as f:
        json.dump({
            "ring_n": p.ring_n, "mult_depth": p.mult_depth,
            "scale_bits": p.scale_bits, "special_bits": p.special_bits,
            "dnum": p.dnum, "base_limbs": p.base_limbs, "sigma": p.sigma,
        }, f)


def load_context(path: str) -> Context:
    with open(path) as f:
        kw = json.load(f)
    return Context(CkksParams(**kw))


def save_ciphertext(path: str, ct: Ciphertext):
    np.savez_compressed(
        path, data=np.asarray(ct.data),
        meta=np.array([ct.level, ct.sdeg, ct.slots], dtype=np.int64),
    )


def load_ciphertext(path: str) -> Ciphertext:
    import jax.numpy as jnp

    z = np.load(path)
    level, sdeg, slots = (int(v) for v in z["meta"])
    return Ciphertext(jnp.asarray(z["data"]), level, sdeg, slots)


def save_eval_keys(path: str, keys: Keys):
    """Public + evaluation keys only - never the secret key."""
    arrs = {
        "pk_b": keys.pk[0], "pk_a": keys.pk[1],
        "relin_kb": np.asarray(keys.relin.kb),
        "relin_ka": np.asarray(keys.relin.ka),
        "rot_gs": np.array(sorted(keys.rot.keys()), dtype=np.int64),
    }
    for g, ksk in keys.rot.items():
        arrs[f"rot_{g}_kb"] = np.asarray(ksk.kb)
        arrs[f"rot_{g}_ka"] = np.asarray(ksk.ka)
    np.savez_compressed(path, **arrs)


def load_eval_keys(path: str, ctx: Context) -> Keys:
    """Reconstruct a server-side (secret-free) Keys object."""
    import jax.numpy as jnp

    z = np.load(path)
    keys = Keys.__new__(Keys)
    keys.ctx = ctx
    keys.s_coeffs = None
    keys.s_eval = None
    keys._s2_eval = None
    keys.pk = (z["pk_b"], z["pk_a"])
    keys.relin = KeySwitchKey(jnp.asarray(z["relin_kb"]),
                              jnp.asarray(z["relin_ka"]))
    keys.rot = {}
    for g in z["rot_gs"]:
        g = int(g)
        keys.rot[g] = KeySwitchKey(jnp.asarray(z[f"rot_{g}_kb"]),
                                   jnp.asarray(z[f"rot_{g}_ka"]))
    return keys
