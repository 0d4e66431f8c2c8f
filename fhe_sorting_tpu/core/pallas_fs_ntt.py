"""Fused four-step NTT as a Pallas TPU kernel (MXU matmuls, VMEM-resident).

The XLA four-step path (`core/ntt_mxu.py`) materializes 16 s32 digit-pair
partials per matmul step through HBM; this kernel keeps one limb plane plus
its twiddle matrices in VMEM and runs the whole pipeline -

    digit-decompose -> W1 matmul -> twiddle -> digit-decompose -> W2 matmul

- in one program per (limb, poly) grid step: exactly one HBM read and one
write of the [n1, n2] data block.  Digit matmuls run on the MXU in bf16:
balanced s8 digits are exact in bf16 (|d| <= 128, 8-bit mantissa), each
digit-pair product is bounded by 128*128*max(n1,n2) < 2^23 so the f32
accumulation is exact, and partials are cast to s32 before the cross-pair
sum (which may reach 2^25).  Grid order (L, B) keeps the per-limb weight
blocks resident across the inner poly steps.

Shapes are MXU/Mosaic-friendly by construction (n1, n2 >= 128 for
production rings; min tile (8, 128) u32 / (16, 128) bf16), unlike the
butterfly kernel (`core/pallas_ntt.py`) whose per-stage reshapes Mosaic
rejects on v5e.  Block-shape constraint: n1, n2 multiples of 128, i.e.
ring_n >= 2^15; smaller rings use the XLA path (or interpret mode in tests).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_mxu import FourStepTables


def _digits_bf16(v_i32):
    """int32 (canonical residue < 2^30) -> 4 balanced digit planes in bf16."""
    outs = []
    v = v_i32
    for _ in range(4):
        b = v & 0xFF
        d = b - jnp.where(b >= 128, 256, 0)
        outs.append(d.astype(jnp.bfloat16))
        v = (v - d) >> 8
    return outs


def _mm_digits(dA, dB, p_u32, sh256_u32):
    """sum_k A[i,k] B[k,j] mod p; dA/dB are lists of 4 bf16 digit planes.

    Each dot is exact in f32 (|product sum| < 2^23); the cross-pair group
    sums live in s32; the digit weights 256^t fold in by a Shoup-Horner
    ladder."""
    groups = [None] * 7
    for a in range(4):
        for b in range(4):
            pp = jax.lax.dot(dA[a], dB[b],
                             preferred_element_type=jnp.float32)
            pp = pp.astype(jnp.int32)
            t = a + b
            groups[t] = pp if groups[t] is None else groups[t] + pp
    pi = p_u32.astype(jnp.int32)

    def to_mod(s):
        return jnp.where(s < 0, s + pi, s).astype(jnp.uint32)

    # Horner fold by 256 with Shoup constant-mult
    acc = to_mod(groups[6])
    for t in range(5, -1, -1):
        q = _mulhi32(acc, sh256_u32)
        r = acc * jnp.uint32(256) - q * p_u32
        acc = jnp.where(r >= p_u32, r - p_u32, r)
        u = acc + to_mod(groups[t])
        acc = jnp.where(u >= p_u32, u - p_u32, u)
    return acc


def _mulhi32(a, b):
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
    return a1 * b1 + (lh >> 16) + (hl >> 16) + (mid >> 16)


def _shoup(a, b, bsh, p):
    q = _mulhi32(a, bsh)
    r = a * b - q * p
    return jnp.where(r >= p, r - p, r)


def _kernel(x_ref, wa_ref, tw_ref, twsh_ref, wb_ref, p_ref, sh_ref, o_ref,
            *, first_left: bool):
    """One (limb, poly) step.

    first_left=True (forward): out = ((W1 @ X) * T) @ W2
    first_left=False (inverse): out = W1i @ ((X @ W2i) * Ti)
    with wa = the [n1,n1] matrix, wb = the [n2,n2] matrix in both cases.
    """
    x = x_ref[0, 0].astype(jnp.int32)          # [n1, n2]
    p = p_ref[0, 0, 0]
    sh = sh_ref[0, 0, 0]
    wa = [wa_ref[a, 0].astype(jnp.bfloat16) for a in range(4)]
    wb = [wb_ref[a, 0].astype(jnp.bfloat16) for a in range(4)]
    tw = tw_ref[0]
    twsh = twsh_ref[0]
    if first_left:
        u = _mm_digits(wa, _digits_bf16(x), p, sh)
        v = _shoup(u, tw, twsh, p)
        y = _mm_digits(_digits_bf16(v.astype(jnp.int32)), wb, p, sh)
    else:
        s = _mm_digits(_digits_bf16(x), wb, p, sh)
        s2 = _shoup(s, tw, twsh, p)
        y = _mm_digits(wa, _digits_bf16(s2.astype(jnp.int32)), p, sh)
    o_ref[0, 0] = y


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _call(a, t: FourStepTables, inverse: bool, interpret: bool = False):
    *lead, L, n = a.shape
    n1 = t.w1f.shape[-1]
    n2 = n // n1
    a4 = a.reshape(-1, L, n1, n2)
    B = a4.shape[0]

    if inverse:
        wa, tw, twsh, wb = t.w1i, t.ti, t.ti_sh, t.w2i
    else:
        wa, tw, twsh, wb = t.w1f, t.tf, t.tf_sh, t.w2f

    kern = functools.partial(_kernel, first_left=not inverse)
    out = pl.pallas_call(
        kern,
        grid=(L, B),
        in_specs=[
            pl.BlockSpec((1, 1, n1, n2), lambda l, b: (b, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, n1, n1), lambda l, b: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, n2), lambda l, b: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, n2), lambda l, b: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, n2, n2), lambda l, b: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda l, b: (l, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda l, b: (l, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n1, n2), lambda l, b: (b, l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, n1, n2), jnp.uint32),
        interpret=interpret,
    )(a4, wa, tw, twsh, wb, t.p, t.sh256)
    return out.reshape(*lead, L, n)


def use_pallas_fs() -> bool:
    env = os.environ.get("FHE_PALLAS_FS")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def supported(n: int, n1: int) -> bool:
    n2 = n // n1
    return n1 % 128 == 0 and n2 % 128 == 0


def ntt_fs_pallas(a, t: FourStepTables, interpret: bool = False):
    return _call(a, t, inverse=False, interpret=interpret)


def intt_fs_pallas(a, t: FourStepTables, interpret: bool = False):
    return _call(a, t, inverse=True, interpret=interpret)
