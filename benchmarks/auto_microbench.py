"""Microbench: automorphism strategies on the real TPU chip.

Times three ways of applying a slot permutation to ciphertext-shaped data
[2, L, n] u32 at ring 2^17:
  1. gather  - data[:, :, perm] with a traced perm (the current
               evaluator._automorphism_impl path, core/evaluator.py:602-608)
  2. roll    - jnp.roll (the lower bound for any layout where the
               automorphism is a cyclic shift)
  3. matmul  - the structured affine path: lane-axis one-hot matmul +
               sublane one-hot + per-row lane-roll via mod-DFT (digit-plane
               s8 MXU matmuls, exact)

Usage: python -m benchmarks.auto_microbench [--limbs 91] [--ring 131072]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(f, *args, reps=20):
    out = f(*args)
    out.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    out.block_until_ready()
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limbs", type=int, default=91)
    ap.add_argument("--ring", type=int, default=131072)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n, L = args.ring, args.limbs
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    rng = np.random.default_rng(0)
    p = np.uint32(0x3F000001)  # representative 30-bit NTT prime shape
    x = jnp.asarray(rng.integers(0, int(p), size=(2, L, n), dtype=np.uint32))

    # galois-style permutation: affine k -> (g*k + c) mod n pulled through
    # a bitrev grid (structurally identical to ctx.galois_perm output)
    g, c = 5, 2
    perm_np = (g * np.arange(n, dtype=np.int64) + c) % n
    perm = jnp.asarray(perm_np.astype(np.int32))

    gather = jax.jit(lambda d, pm: d[:, :, pm])
    t_gather = timeit(gather, x, perm, reps=args.reps)

    roll = jax.jit(lambda d: jnp.roll(d, 12345, axis=-1))
    t_roll = timeit(roll, x, reps=args.reps)

    # structured: lane one-hot matmul on [.., n1, n2] grid (s8 digit planes)
    hot2 = np.zeros((n2, n2), dtype=np.int8)
    lam = (g * np.arange(n2, dtype=np.int64) + c) % n2
    hot2[lam, np.arange(n2)] = 1
    hot2j = jnp.asarray(hot2)
    hot1 = np.zeros((n1, n1), dtype=np.int8)
    rho = (g * np.arange(n1, dtype=np.int64)) % n1
    hot1[rho, np.arange(n1)] = 1
    hot1j = jnp.asarray(hot1)
    # stand-in mod-DFT matrices (content irrelevant for timing)
    F = jnp.asarray(rng.integers(-128, 127, size=(4, n2, n2), dtype=np.int8))

    def structured(d, h2, h1, Fd):
        z = d.reshape(2, L, n1, n2)
        dig = []
        v = z.astype(jnp.int32)
        for _ in range(4):
            b = v & 0xFF
            dg = b - jnp.where(b >= 128, 256, 0)
            dig.append(dg.astype(jnp.int8))
            v = (v - dg) >> 8
        # lane perm + row perm + two lane-axis DFT matmuls per digit plane
        acc = None
        for a in range(4):
            y = jax.lax.dot_general(
                dig[a], h2, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y8 = (y & 0xFF).astype(jnp.int8)
            y2 = jax.lax.dot_general(
                y8, Fd[a], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y3 = jax.lax.dot_general(
                (y2 & 0xFF).astype(jnp.int8), Fd[a],
                (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = y3 if acc is None else acc + y3
        h1f = h1.astype(jnp.int8)
        r = jax.lax.dot_general(
            h1f, (acc & 0xFF).astype(jnp.int8), (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32)
        return r.astype(jnp.uint32).reshape(2, L, n)

    sj = jax.jit(structured)
    t_struct = timeit(sj, x, hot2j, hot1j, F, reps=args.reps)

    bytes_ct = 2 * L * n * 4
    print(f"ct bytes: {bytes_ct/1e6:.0f} MB, v5e HBM ~819 GB/s -> "
          f"1-pass bound {bytes_ct*2/819e9*1e3:.2f} ms")
    print(f"gather (current rotate path): {t_gather*1e3:8.2f} ms")
    print(f"roll   (slot-ordered bound) : {t_roll*1e3:8.2f} ms")
    print(f"matmul (structured affine)  : {t_struct*1e3:8.2f} ms "
          f"(~2x overcount vs real impl: includes digit decomp each call)")


if __name__ == "__main__":
    main()
