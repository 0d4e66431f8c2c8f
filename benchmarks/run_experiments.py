"""Multi-trial experiment driver with per-size aggregation.

Parity with /root/reference/comparison/run_experiments.sh (a 268-line bash
harness that re-runs gtest binaries 10x and averages wall-clock + log2
errors per array size).  Here it drives the sort implementations directly:

  python -m benchmarks.run_experiments --algo direct --sizes 4 8 16 \
      --trials 3 --ring 4096 --depth 36 --out results/

Writes N<k>_summary.txt and total_results.txt in the reference's spirit
(mean time, max/avg log2 error per size).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def run_one(algo: str, N: int, ring: int, depth: int | None, seed: int,
            dg: int | None, df: int | None, comp: int = 1):
    from fhe_sorting_tpu.core.context import CkksParams, Context
    from fhe_sorting_tpu.core.evaluator import Evaluator
    from fhe_sorting_tpu.core.keys import Keys
    from fhe_sorting_tpu.ops.sign import (
        CompositeSignConfig, SignConfig, SignFunc,
    )
    from tests.utils import vector_with_min_diff

    # per-N defaults from the declarative registry + depth meter (replaces
    # the reference's hand-maintained per-N switch tables, sort_algo.h:87-201)
    if dg is None or df is None:
        from fhe_sorting_tpu.utils.params_registry import direct_sort_sign_cfg

        _, rdg, rdf = direct_sort_sign_cfg(N)
        dg = dg if dg is not None else rdg
        df = df if df is not None else rdf
    if depth is None:
        if algo == "direct":
            from fhe_sorting_tpu.utils.depth_meter import (
                measure_direct_sort_depth,
            )

            depth = measure_direct_sort_depth(
                N, ring, SignConfig(CompositeSignConfig(3, dg, df))
            )["mult_depth"]
        elif algo == "kway":
            # the k-way network consumes ~9-11 levels/stage (the reference
            # runs it at multDepth 40 WITH bootstrapping, kway_adapter.h:52);
            # the insecure-fast table provisions deep instead: per-stage
            # budget x stage count (Sorter.cpp:298)
            from fhe_sorting_tpu.models.kway.adapter import kway_decompose
            from fhe_sorting_tpu.models.kway.masking import num_stages

            k, M = kway_decompose(N)
            depth = 14 * num_stages(k, M) + 10
        else:
            depth = 36

    ctx = Context(CkksParams(
        ring_n=ring, mult_depth=depth,
        scale_bits=56 if comp == 2 else 28, comp=comp,
        base_limbs=4 if comp == 2 else 2,
    ))
    keys = Keys.generate(ctx, seed=0)
    cfg = SignConfig(CompositeSignConfig(3, dg, df))
    ev = Evaluator(ctx, keys)

    if algo == "direct":
        from fhe_sorting_tpu.models.direct_sort import (
            DirectSort, rotation_indices_direct_sort,
        )

        keys.gen_rotation_keys(sorted(
            rotation_indices_direct_sort(N, ring)
            | {1 << i for i in range(ring.bit_length() - 2)}
        ))
        sorter = DirectSort(ev, N)
        x = vector_with_min_diff(N, seed=seed)
        ct = keys.encrypt(x)
    elif algo == "mehp24":
        from fhe_sorting_tpu.models.mehp24 import Mehp24Sort
        from fhe_sorting_tpu.models.mehp24.utils import rotation_indices_mehp24

        keys.gen_rotation_keys(sorted(
            rotation_indices_mehp24(N)
            | {1 << i for i in range(ring.bit_length() - 2)}
            | {-(1 << i) for i in range(ring.bit_length() - 2)}
        ))
        sorter = Mehp24Sort(ev, N, sub_length=min(N, 256))
        x = vector_with_min_diff(N, seed=seed)
        padded = np.zeros(min(N, 256) ** 2)
        padded[:N] = x
        ct = keys.encrypt(padded, slots=len(padded))
    elif algo == "kway":
        from fhe_sorting_tpu.models.kway.adapter import KWayAdapter

        keys.gen_rotation_keys(sorted(
            {1 << i for i in range(ring.bit_length() - 2)}
            | {-(1 << i) for i in range(ring.bit_length() - 2)}
        ))
        sorter = KWayAdapter(ev, N)
        x = vector_with_min_diff(N, seed=seed)
        slots = 1 << (N - 1).bit_length()
        padded = np.zeros(slots)
        padded[:N] = x
        ct = keys.encrypt(padded, slots=slots)
    else:
        raise ValueError(algo)

    t0 = time.time()
    out_ct = sorter.sort(ct, SignFunc.CompositeSign, cfg)
    out_ct.data.block_until_ready()
    dt = time.time() - t0
    out = keys.decrypt(out_ct, N)
    errs = np.abs(out - np.sort(x))
    return dt, float(errs.max()), float(errs.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="direct",
                    choices=["direct", "mehp24", "kway"])
    ap.add_argument("--sizes", type=int, nargs="+", default=[4, 8])
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--ring", type=int, default=2048)
    ap.add_argument("--depth", type=int, default=None,
                    help="default: depth meter (direct) / 36")
    ap.add_argument("--dg", type=int, default=None,
                    help="default: params registry per N")
    ap.add_argument("--df", type=int, default=None)
    ap.add_argument("--comp", type=int, default=2,
                    help="primes per level (2 -> Delta=2^56, the noise floor "
                         "the reference reaches with 59-bit primes)")
    ap.add_argument("--out", default="experiment_results")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force a JAX platform (the container pins the axon "
                         "TPU; cpu matches the reference's insecure-fast "
                         "test mode)")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out, exist_ok=True)
    total = []
    for N in args.sizes:
        rows = []
        for t in range(args.trials):
            dt, emax, eavg = run_one(args.algo, N, args.ring, args.depth,
                                     seed=t, dg=args.dg, df=args.df,
                                     comp=args.comp)
            rows.append((dt, emax, eavg))
            print(f"N={N} trial {t}: {dt:.2f}s maxerr {emax:.2e}",
                  file=sys.stderr)
        mt = float(np.mean([r[0] for r in rows]))
        memax = float(np.max([r[1] for r in rows]))
        meavg = float(np.mean([r[2] for r in rows]))
        summary = {
            "N": N, "trials": args.trials, "mean_time_s": round(mt, 3),
            "max_err_log2": round(float(np.log2(max(memax, 1e-300))), 2),
            "avg_err_log2": round(float(np.log2(max(meavg, 1e-300))), 2),
        }
        total.append(summary)
        with open(os.path.join(args.out, f"N{N}_summary.txt"), "w") as f:
            json.dump(summary, f, indent=1)
    with open(os.path.join(args.out, "total_results.txt"), "w") as f:
        json.dump({"algo": args.algo, "results": total}, f, indent=1)
    print(json.dumps(total))


if __name__ == "__main__":
    main()
