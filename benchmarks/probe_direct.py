"""Decrypt-probe harness for DirectSort (DebugEncryption workflow parity).

Runs constructRank -> probes rank error -> rotationIndexCheck -> probes the
final sort, printing per-phase wall-clock and error stats.  This is the
tool the reference uses via PRINT_PT/DebugEncryption in DirectSortNTest
(/root/reference/tests/DirectSortNTest.cpp:130-285) to localize noise.

Usage: python benchmarks/probe_direct.py --n 16 --ring 4096 [--comp 2]
       [--depth auto] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--ring", type=int, default=4096)
    ap.add_argument("--comp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dnum", type=int, default=3)
    ap.add_argument("--cn", type=int, default=None)
    ap.add_argument("--dg", type=int, default=None)
    ap.add_argument("--df", type=int, default=None)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from fhe_sorting_tpu.core.context import CkksParams, Context
    from fhe_sorting_tpu.core.evaluator import Evaluator
    from fhe_sorting_tpu.core.keys import Keys
    from fhe_sorting_tpu.models.direct_sort import (
        DirectSort, rotation_indices_direct_sort,
    )
    from fhe_sorting_tpu.ops.sign import (
        CompositeSignConfig, SignConfig, SignFunc,
    )
    from fhe_sorting_tpu.utils.params_registry import direct_sort_sign_cfg

    cn, dg, df = direct_sort_sign_cfg(args.n)
    cn = args.cn if args.cn is not None else cn
    dg = args.dg if args.dg is not None else dg
    df = args.df if args.df is not None else df
    cfg = SignConfig(CompositeSignConfig(cn, dg, df))

    if args.depth is None:
        from fhe_sorting_tpu.utils.depth_meter import measure_direct_sort_depth

        m = measure_direct_sort_depth(args.n, args.ring, cfg)
        args.depth = m["mult_depth"]
        print(f"# depth meter: {m}", file=sys.stderr)

    sb = 56 if args.comp == 2 else 28
    bl = 4 if args.comp == 2 else 2
    t0 = time.time()
    ctx = Context(CkksParams(ring_n=args.ring, mult_depth=args.depth,
                             scale_bits=sb, comp=args.comp, base_limbs=bl,
                             dnum=args.dnum))
    print(f"# context {time.time()-t0:.1f}s  ntt={ctx.ntt_impl}",
          file=sys.stderr, flush=True)
    t0 = time.time()
    keys = Keys.generate(ctx, seed=0)
    steps = rotation_indices_direct_sort(args.n, args.ring)
    keys.gen_rotation_keys(sorted(steps))
    print(f"# keygen {time.time()-t0:.1f}s ({len(steps)} rot keys)",
          file=sys.stderr, flush=True)
    t0 = time.time()
    ev = Evaluator(ctx, keys)
    srt = DirectSort(ev, args.n)
    print(f"# setup {time.time()-t0:.1f}s  Lq={ctx.num_q} K={ctx.num_sp} "
          f"sign=({cn},{dg},{df}) depth={args.depth}", file=sys.stderr,
          flush=True)

    rng = np.random.default_rng(0)
    vals = rng.permutation(args.n) / args.n + 0.5 / args.n
    ct = keys.encrypt(vals)
    want_rank = np.array([np.sum(v > vals) for v in vals], dtype=np.float64)

    t0 = time.time()
    rank = srt.construct_rank(ct, SignFunc.CompositeSign, cfg)
    rank.data.block_until_ready()
    t_rank = time.time() - t0
    got_rank = keys.decrypt(rank, args.n)
    rank_err = np.abs(got_rank - want_rank)
    print(f"# constructRank {t_rank:.1f}s  level={rank.level}  "
          f"rank_err max={rank_err.max():.2e} mean={rank_err.mean():.2e}",
          file=sys.stderr)

    t0 = time.time()
    out = srt.rotation_index_check_n(rank, ct)
    out.data.block_until_ready()
    t_idx = time.time() - t0
    got = keys.decrypt(out, args.n)
    err = np.abs(got - np.sort(vals))
    print(f"# rotationIndexCheckN {t_idx:.1f}s  level={out.level}  "
          f"sort_err max={err.max():.2e} mean={err.mean():.2e}",
          file=sys.stderr)
    print(f"{{\"n\": {args.n}, \"ring\": {args.ring}, \"comp\": {args.comp}, "
          f"\"rank_err\": {rank_err.max():.3e}, \"sort_err\": {err.max():.3e}, "
          f"\"t_rank_s\": {t_rank:.1f}, \"t_idx_s\": {t_idx:.1f}}}")


if __name__ == "__main__":
    main()
