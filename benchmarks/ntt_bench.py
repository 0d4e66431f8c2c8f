"""Microbench: NTT and keyswitch on the real chip (XLA vs Pallas paths).

Usage: python benchmarks/ntt_bench.py [--ring 65536] [--limbs 40] [--iters 20]
Prints per-variant wall times; used to pick the default NTT kernel per
platform (cf. RotationBenchmark.cpp:8-52 in the reference, which played the
same role for EvalRotate vs EvalFastRotation).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ring", type=int, default=65536)
    ap.add_argument("--limbs", type=int, default=40)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--depth", type=int, default=34)
    args = ap.parse_args()

    import jax

    from fhe_sorting_tpu.core import ntt as nttm
    from fhe_sorting_tpu.core import pallas_ntt
    from fhe_sorting_tpu.core.primes import ntt_primes

    n = args.ring
    L = args.limbs
    primes = ntt_primes(n, 28, L)
    tabs = nttm.build_device_tables(primes, n)
    rng = np.random.default_rng(0)
    a = jax.numpy.asarray(
        rng.integers(0, min(primes), size=(2, L, n), dtype=np.uint32)
    )

    from fhe_sorting_tpu.utils import roofline

    def bench(name, fn, *xs, cost=None):
        """`cost`: roofline.KernelCost for the speed-of-light column."""
        try:
            out = fn(*xs)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            return None
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*xs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        gb = 2 * L * n * 4 * 2 / 1e9  # one read + one write of [2, L, n] u32
        sol = ""
        if cost is not None:
            sol = (f"   SoL {cost.sol_seconds()*1e3:.3f} ms "
                   f"({cost.bound()}-bound) -> {cost.pct_of_sol(dt):.1f}%")
        print(f"{name:24s} {dt*1e3:8.3f} ms   "
              f"({gb/dt:6.1f} GB/s min-traffic){sol}")
        return out

    fs_cost = roofline.ntt_fourstep(n, L, polys=2)
    bf_cost = roofline.ntt_butterfly(n, L, polys=2)

    from fhe_sorting_tpu.core import ntt_mxu

    fst = ntt_mxu.build_fs_tables(primes, n)
    f_xla = jax.jit(lambda x: nttm.ntt(x, tabs))
    f_pal = jax.jit(lambda x: pallas_ntt.ntt_pallas(x, tabs))
    f_fs = jax.jit(lambda x: ntt_mxu.ntt_fs(x, fst))
    from fhe_sorting_tpu.core import pallas_fs_ntt

    f_pfs = jax.jit(lambda x: pallas_fs_ntt.ntt_fs_pallas(x, fst))
    o1 = bench("ntt/xla-butterfly", f_xla, a, cost=bf_cost)
    o2 = bench("ntt/pallas-butterfly", f_pal, a, cost=bf_cost)
    o3 = bench("ntt/mxu-four-step", f_fs, a, cost=fs_cost)
    o4 = bench("ntt/pallas-four-step", f_pfs, a, cost=fs_cost)
    for name, o in (("pallas", o2), ("four-step", o3), ("pallas-fs", o4)):
        if o1 is not None and o is not None:
            same = bool((np.asarray(o1) == np.asarray(o)).all())
            print(f"bit-exact match ({name}): {same}")

    i_xla = jax.jit(lambda x: nttm.intt(x, tabs))
    i_pal = jax.jit(lambda x: pallas_ntt.intt_pallas(x, tabs))
    i_fs = jax.jit(lambda x: ntt_mxu.intt_fs(x, fst))
    i_pfs = jax.jit(lambda x: pallas_fs_ntt.intt_fs_pallas(x, fst))
    bench("intt/xla-butterfly", i_xla, a, cost=bf_cost)
    bench("intt/pallas-butterfly", i_pal, a, cost=bf_cost)
    bench("intt/mxu-four-step", i_fs, a, cost=fs_cost)
    bench("intt/pallas-four-step", i_pfs, a, cost=fs_cost)

    # one full keyswitch (rotation) at top level for context
    from fhe_sorting_tpu.core.context import CkksParams, Context
    from fhe_sorting_tpu.core.evaluator import Evaluator
    from fhe_sorting_tpu.core.keys import Keys

    ctx = Context(CkksParams(ring_n=n, mult_depth=args.depth))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys([1])
    ev = Evaluator(ctx, keys)
    ct = keys.encrypt(rng.uniform(0, 1, n // 2))
    Lq, K, D, alpha = roofline.ks_geometry(ctx, ct.level)
    r = ev.rotate(ct, 1)
    jax.block_until_ready(r.data)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        r = ev.rotate(ct, 1)
    jax.block_until_ready(r.data)
    dt = (time.perf_counter() - t0) / args.iters
    print(roofline.report("rotate(keyswitch)",
                          roofline.keyswitch(n, Lq, K, D, alpha), dt))

    m = ev.mult(ct, ct)
    jax.block_until_ready(m.data)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        m = ev.mult(ct, ct)
    jax.block_until_ready(m.data)
    dt = (time.perf_counter() - t0) / args.iters
    print(roofline.report("mult(ct,ct)+relin",
                          roofline.ct_mult(n, Lq, K, D, alpha), dt))


if __name__ == "__main__":
    main()
