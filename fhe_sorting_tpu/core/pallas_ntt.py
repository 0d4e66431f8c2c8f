"""Pallas TPU kernel: fused negacyclic NTT (all stages in VMEM).

The XLA fallback (`core/ntt.py`) materializes every butterfly stage through
HBM (log2(n) round trips); this kernel keeps one limb plane resident in VMEM
for all stages: grid over (poly, limb), one HBM read + one write per limb.
A 2^17-point limb is 512 KB - limb + twiddle + scratch fit comfortably in
the ~16 MB VMEM budget.

Gated by FHE_PALLAS=1 (or explicit use) because the Mosaic relayouts for the
per-stage reshapes are TPU-generation dependent; the XLA path remains the
correctness reference (tests compare the two bit-exactly).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import add_mod, shoup_mulmod, sub_mod
from .ntt import NttTables


def _fwd_stages(x, psi, psi_sh, p, n, logn):
    """x: [1, n] value; psi/psi_sh: [1, n] values; p scalar."""
    for s in range(logn):
        m = 1 << s
        half = n >> (s + 1)
        xr = x.reshape(m, 2, half)
        S = psi[0, m : 2 * m].reshape(m, 1)
        Ssh = psi_sh[0, m : 2 * m].reshape(m, 1)
        u = xr[:, 0, :]
        v = shoup_mulmod(xr[:, 1, :], S, Ssh, p)
        x = jnp.stack([add_mod(u, v, p), sub_mod(u, v, p)], axis=1
                      ).reshape(1, n)
    return x


def _inv_stages(x, ipsi, ipsi_sh, p, n, logn, ninv, ninv_sh):
    for s in range(logn - 1, -1, -1):
        m = 1 << s
        half = n >> (s + 1)
        xr = x.reshape(m, 2, half)
        S = ipsi[0, m : 2 * m].reshape(m, 1)
        Ssh = ipsi_sh[0, m : 2 * m].reshape(m, 1)
        u = xr[:, 0, :]
        v = xr[:, 1, :]
        s0 = add_mod(u, v, p)
        s1 = shoup_mulmod(sub_mod(u, v, p), S, Ssh, p)
        x = jnp.stack([s0, s1], axis=1).reshape(1, n)
    return shoup_mulmod(x, ninv, ninv_sh, p)


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _pallas_ntt_call(a, psi, psi_sh, p_col, ninv, ninv_sh, inverse: bool,
                     interpret: bool = False):
    *lead, L, n = a.shape
    logn = n.bit_length() - 1
    a2 = a.reshape(-1, L, n)
    B = a2.shape[0]

    def kernel(x_ref, psi_ref, psish_ref, p_ref, ninv_ref, ninvsh_ref, o_ref):
        x = x_ref[0]                       # [1, n]
        p = p_ref[0, 0]
        if not inverse:
            out = _fwd_stages(x, psi_ref[:], psish_ref[:], p, n, logn)
        else:
            out = _inv_stages(x, psi_ref[:], psish_ref[:], p, n, logn,
                              ninv_ref[0, 0], ninvsh_ref[0, 0])
        o_ref[0] = out

    out = pl.pallas_call(
        kernel,
        grid=(B, L),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda b, l: (b, l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b, l: (l, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b, l: (l, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, l: (l, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b, l: (l, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b, l: (l, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n), lambda b, l: (b, l, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, n), jnp.uint32),
        interpret=interpret,
    )(a2, psi, psi_sh, p_col, ninv, ninv_sh)
    return out.reshape(*lead, L, n)


def use_pallas() -> bool:
    return os.environ.get("FHE_PALLAS", "0") == "1"


def ntt_pallas(a: jnp.ndarray, t: NttTables, interpret: bool = False):
    return _pallas_ntt_call(a, t.psi_rev, t.psi_rev_shoup, t.p,
                            t.n_inv, t.n_inv_shoup, inverse=False,
                            interpret=interpret)


def intt_pallas(a: jnp.ndarray, t: NttTables, interpret: bool = False):
    return _pallas_ntt_call(a, t.ipsi_rev, t.ipsi_rev_shoup, t.p,
                            t.n_inv, t.n_inv_shoup, inverse=True,
                            interpret=interpret)
