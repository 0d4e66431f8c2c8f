"""Bootstrap-at-scale experiment rows (VERDICT r4 #5: ring >= 2^14,
target max err <= 3e-4).

Reference ships levelBudget {4,4}/{5,5} at ring 2^17
(/root/reference/src/kway_adapter.h:56-62) via OpenFHE's EvalBootstrap;
this runs the framework's own Bootstrapper (core/bootstrap.py) at full
slot packing and appends a row to
experiment_results/bootstrap/level_budgets.json.

The error floor at the round-4 settings (1.27e-3) is the SECOND-order
arcsine truncation at msg ratio q0/Delta = 16; asin_terms=3 pushes the
residual to O(m^9) and K/sin_degree are sized for the secret in use.

Usage: python -m benchmarks.run_bootstrap --ring 16384 [--budget 3]
       [--uniform] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ring", type=int, default=16384)
    ap.add_argument("--budget", type=int, default=3)
    ap.add_argument("--depth", type=int, default=30)
    ap.add_argument("--uniform", action="store_true",
                    help="uniform ternary secret (double-angle EvalMod); "
                         "default: sparse hamming-64 test secret, K=13")
    ap.add_argument("--sin-degree", type=int, default=None)
    ap.add_argument("--asin-terms", type=int, default=3)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", default="experiment_results/bootstrap/"
                                     "level_budgets.json")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from fhe_sorting_tpu.core.bootstrap import Bootstrapper
    from fhe_sorting_tpu.core.context import CkksParams, Context
    from fhe_sorting_tpu.core.evaluator import Evaluator
    from fhe_sorting_tpu.core.keys import Keys
    from fhe_sorting_tpu.ops.rotation import RotationComposer

    ring, lb = args.ring, args.budget
    t0 = time.time()
    ctx = Context(CkksParams(
        ring_n=ring, mult_depth=args.depth, scale_bits=56, comp=2,
        base_limbs=4, first_mod_bits=30,
        secret_hamming=None if args.uniform else 64))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_conj_key()
    ev = Evaluator(ctx, keys)
    if args.uniform:
        # K ~ 6 sigma of I for a dense ternary secret: sigma ~ sqrt(h/12),
        # h ~ 2n/3 (K=128 at ring 2^14 measured a tail-clip noise blowup)
        K = {4096: 128.0, 8192: 128.0, 16384: 256.0, 32768: 256.0,
             65536: 512.0}.get(ring, 512.0)
        # double-angle count keeps the Chebyshev range K/2^da = 32
        da = int(np.log2(K)) - 5
        deg = args.sin_degree or 270
    else:
        # sparse secrets also ride the double-angle path: the cos-seed +
        # arcsin-in-y form measured ~4 orders better than the direct
        # sin/(2 pi) fit (1.3e-3 -> ~1e-7 class at ring 4096)
        K, da = 13.0, 2
        deg = args.sin_degree or 64
    basis = sorted({1 << i for i in range(ring.bit_length() - 2)})
    rot = RotationComposer(ev, basis, lazy_key_budget=8)
    bs = Bootstrapper(ev, K=K, sin_degree=deg, level_budget=(lb, lb),
                      asin_terms=args.asin_terms, double_angle=da, rot=rot)
    keys.gen_rotation_keys(basis)
    setup_s = time.time() - t0
    print(f"# setup {setup_s:.1f}s ({len(keys.rot)} direct keys)",
          file=sys.stderr, flush=True)

    nh = ring // 2
    rng = np.random.default_rng(3)
    z = rng.uniform(0, 1.0, nh)
    ct = keys.encrypt(z)
    t0 = time.time()
    out = bs.bootstrap(ev.level_reduce(ct, 8))
    out.data.block_until_ready()
    boot_s = time.time() - t0
    got = keys.decrypt(out, nh)
    err = np.abs(got - z)
    row = {
        "ring": ring, "level_budget": [lb, lb], "slots": nh,
        "max_err": float(err.max()), "mean_err": float(err.mean()),
        "levels_consumed": out.level, "out_level": out.level,
        "setup_s": round(setup_s, 1),
        f"bootstrap_s_{args.platform}": round(boot_s, 1),
        "secret": "uniform_ternary" if args.uniform else "hamming64",
        "chain": (f"comp=2 Delta=2^56, q0/Delta=16, K={K:.0f}, "
                  f"sin_degree={deg}, double_angle={da}, "
                  f"asin_terms={args.asin_terms}, composed-key basis "
                  f"({len(basis)} direct + lazy pool)"),
    }
    print(json.dumps(row), flush=True)
    rows = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            rows = json.load(f)
    rows.append(row)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
