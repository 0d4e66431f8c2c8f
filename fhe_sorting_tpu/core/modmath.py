"""u32 modular arithmetic primitives for RNS limb planes.

TPU has no native 64-bit integer datapath, so every mod-p operation is built
from wrapping u32 multiplies and 16-bit partial products (these lower to plain
VPU ops under XLA and inside Pallas kernels alike).  Three multiplier styles:

  * `shoup_mulmod`  -- a * b mod p where b is a *precomputed constant*
                       (NTT twiddles, CRT base-extension factors, key-switch
                       key limbs, encoded plaintext masks).  ~1.5 mulhi cost.
  * `barrett_mulmod`-- general a * b mod p for data*data (ciphertext tensor
                       products).  Splits the 64-bit product into (hi, lo)
                       and folds hi via the constant 2^32 mod p.
  * add/sub/neg     -- single conditional-subtract reductions.

All residues are kept in canonical form [0, p) with p < 2^31; this keeps
a + b < 2^32 so additions never wrap before reduction.

This module replaces the integer HAL that OpenFHE supplies to the reference
(cf. SURVEY.md section 2 "native components"), and is shared by the jnp
fallback path and the Pallas kernels (both call these with array refs).

Host-side mirrors (`host_*`, numpy uint64) are used at key-generation /
encode time where exactness with Python ints is convenient, and to build the
Shoup precomputation tables.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# plain int so Pallas kernels don't capture a device constant
_MASK16 = 0xFFFF


def mulhi32(a, b):
    """High 32 bits of the 64-bit product of two u32 arrays.

    16-bit partial products; every intermediate fits in u32.
    """
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # carry-collecting middle term: (ll>>16) + (lh&0xffff) + (hl&0xffff) < 3*2^16
    mid = (ll >> 16) + (lh & _MASK16) + (hl & _MASK16)
    return hh + (lh >> 16) + (hl >> 16) + (mid >> 16)


def mul64(a, b):
    """(hi, lo) 32-bit halves of the full 64-bit product."""
    lo = (a * b).astype(jnp.uint32)
    return mulhi32(a, b), lo


def add_mod(a, b, p):
    t = a + b
    return jnp.where(t >= p, t - p, t)


def sub_mod(a, b, p):
    t = a - b
    return jnp.where(a >= b, t, t + p)


def neg_mod(a, p):
    return jnp.where(a == 0, a, p - a)


def shoup_mulmod(a, b, b_shoup, p):
    """a * b mod p with b constant and b_shoup = floor(b * 2^32 / p).

    Requires b < p < 2^31; a may be any u32.  Result in [0, p).
    """
    q = mulhi32(a, b_shoup)
    r = a * b - q * p  # wrapping; true remainder or remainder + p
    return jnp.where(r >= p, r - p, r)


def reduce_u32(lo, p, p_inv32):
    """lo mod p for arbitrary u32 lo; p_inv32 = floor(2^32 / p) (fits u32).

    q = mulhi(lo, p_inv32) underestimates floor(lo/p) by at most 2,
    so two conditional subtracts complete the reduction.
    """
    q = mulhi32(lo, p_inv32)
    r = lo - q * p
    r = jnp.where(r >= p, r - p, r)
    return jnp.where(r >= p, r - p, r)


def barrett_mulmod(a, b, p, r2_32, r2_32_shoup, p_inv32):
    """General a * b mod p for a, b in [0, p), p < 2^31.

    r2_32 = 2^32 mod p (with its Shoup precompute).  Uses the identity
    a*b = hi*2^32 + lo, and hi < p automatically since hi <= p^2/2^32 < p.
    """
    hi, lo = mul64(a, b)
    t1 = shoup_mulmod(hi, r2_32, r2_32_shoup, p)
    t2 = reduce_u32(lo, p, p_inv32)
    return add_mod(t1, t2, p)


# ---------------------------------------------------------------------------
# Host-side (numpy uint64 / Python int) mirrors and precompute helpers.
# ---------------------------------------------------------------------------


def host_shoup(b: np.ndarray, p: int) -> np.ndarray:
    """floor(b * 2^32 / p) as u32 (b may be array or scalar, values < p)."""
    b = np.asarray(b, dtype=np.uint64)
    return ((b << np.uint64(32)) // np.uint64(p)).astype(np.uint32)


def host_mulmod(a: np.ndarray, b: np.ndarray, p: int) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    return (a * b % np.uint64(p)).astype(np.uint64)


class PrimeConsts:
    """Per-prime constants needed by the device kernels (all u32 scalars)."""

    __slots__ = ("p", "r2_32", "r2_32_shoup", "p_inv32")

    def __init__(self, p: int):
        assert p < 2**31
        self.p = np.uint32(p)
        r2 = (1 << 32) % p
        self.r2_32 = np.uint32(r2)
        self.r2_32_shoup = np.uint32((r2 << 32) // p)
        self.p_inv32 = np.uint32((1 << 32) // p)
