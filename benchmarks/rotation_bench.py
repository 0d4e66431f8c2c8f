"""Rotation microbenchmark: EvalRotate chains vs hoisted fast rotation.

Parity with /root/reference/benchmarks/RotationBenchmark.cpp (whose comment
block records ~4.94 ms per EvalRotate and a 30-40% win for hoisting on an
8-core laptop at ring 2^12).  Run on whatever backend is active:

  python -m benchmarks.rotation_bench [--ring 4096] [--depth 1] [--chain 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ring", type=int, default=4096)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--chains", type=int, nargs="*", default=[1, 2, 3, 5, 10])
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from fhe_sorting_tpu.core.context import CkksParams, Context
    from fhe_sorting_tpu.core.evaluator import Evaluator
    from fhe_sorting_tpu.core.keys import Keys

    ctx = Context(CkksParams(ring_n=args.ring, mult_depth=args.depth))
    keys = Keys.generate(ctx, seed=0)
    steps = list(range(1, max(args.chains) + 1))
    keys.gen_rotation_keys(steps)
    ev = Evaluator(ctx, keys)
    x = np.arange(64) / 64.0
    ct = keys.encrypt(x)

    results = {}
    for n_chain in args.chains:
        # plain chain
        out = ct
        for r in range(1, n_chain + 1):   # warm-up/compile
            out = ev.rotate(out, r)
        out.data.block_until_ready()
        t0 = time.time()
        for _ in range(args.reps):
            out = ct
            for r in range(1, n_chain + 1):
                out = ev.rotate(out, r)
            out.data.block_until_ready()
        plain = (time.time() - t0) / args.reps

        # hoisted: one ModUp shared by the whole chain
        pre = ev.rotate_precompute(ct)
        outs = [ev.rotate_hoisted(ct, pre, r) for r in range(1, n_chain + 1)]
        outs[-1].data.block_until_ready()
        t0 = time.time()
        for _ in range(args.reps):
            pre = ev.rotate_precompute(ct)
            outs = [ev.rotate_hoisted(ct, pre, r) for r in range(1, n_chain + 1)]
            outs[-1].data.block_until_ready()
        hoisted = (time.time() - t0) / args.reps

        results[n_chain] = (plain, hoisted)
        print(f"chain {n_chain:3d}: rotate {plain*1e3:8.2f} ms | "
              f"hoisted {hoisted*1e3:8.2f} ms | "
              f"win {100*(1-hoisted/max(plain,1e-12)):5.1f}%", file=sys.stderr)

    print(json.dumps({
        "metric": "rotate_chain_ms",
        "results": {str(k): {"plain_ms": round(v[0]*1e3, 3),
                             "hoisted_ms": round(v[1]*1e3, 3)}
                    for k, v in results.items()},
        "ring": args.ring,
    }))


if __name__ == "__main__":
    main()
