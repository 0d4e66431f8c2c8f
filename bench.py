"""End-of-round benchmark: encrypted sort wall-clock on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N, ...}

Baseline: the only complete end-to-end numbers the reference publishes are
the k-way k=2 10-trial means at HEStd_128_classic, ring 2^17
(BASELINE.md: N=128 -> 2485.52 s on an unspecified CPU).  We benchmark our
flagship DirectSort at the SAME ring dimension (2^17) with a modulus chain
verified against the 128-bit logQP budget (HomomorphicEncryption.org table
as extended by OpenFHE: logQP <= 3524 bits at n = 2^17), so the comparison
is at matching security.  vs_baseline = baseline_seconds / our_seconds
(speedup factor; algorithms differ - DirectSort is the reference's own
headline algorithm, whose runs the reference left unrecorded).

The JSON line also carries `logqp_bits` (+ the budget it must stay under)
and `pct_of_sol` - measured wall-clock as a percentage of the single-chip
speed-of-light bound accumulated per-op by utils/roofline.py.

Usage: python bench.py [--n 128] [--ring 131072] [--depth N] [--trials 1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# Reference k-way k=2 mean sort times (comparison/experimental_results)
BASELINE_S = {4: 89.34, 8: 249.99, 16: 472.66, 32: 911.74, 64: 1292.26,
              128: 2485.52, 256: 3846.34, 512: 4625.21, 1024: 5732.39}

# 128-bit classic budget for uniform-ternary secrets, logQP bits per ring_n
# (HomomorphicEncryption.org standard + OpenFHE's extension to large rings)
LOGQP_128 = {2048: 54, 4096: 109, 8192: 218, 16384: 438, 32768: 881,
             65536: 1772, 131072: 3524}


def run(n_arr: int, ring: int, depth: int, trials: int, cn: int, dg: int,
        df: int, comp: int = 2, dnum: int = 3, verbose: bool = True,
        lazy_keys: int | None = None):
    import os

    import jax
    import numpy as np

    # persistent compile cache: the per-(op, level) programs are identical
    # across rounds, so later invocations skip the long warm-up
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fhe_sorting_tpu.core.context import CkksParams, Context
    from fhe_sorting_tpu.core.evaluator import Evaluator
    from fhe_sorting_tpu.core.keys import Keys
    from fhe_sorting_tpu.models.direct_sort import (
        DirectSort, rotation_indices_direct_sort,
    )
    from fhe_sorting_tpu.ops.sign import (
        CompositeSignConfig, SignConfig, SignFunc,
    )
    from fhe_sorting_tpu.utils import roofline

    t0 = time.time()
    # composite scaling: Delta = 2^56 from u32 prime pairs - the noise
    # floor a deep sort needs (the 28-bit chain noise-blew at depth 42)
    ctx = Context(CkksParams(
        ring_n=ring, mult_depth=depth,
        scale_bits=56 if comp == 2 else 28, comp=comp,
        base_limbs=4 if comp == 2 else 2, dnum=dnum,
    ))
    import math

    logqp = sum(math.log2(p) for p in ctx.all_primes)
    budget = LOGQP_128.get(ring)
    sec_ok = budget is not None and logqp <= budget
    print(f"# security: ring 2^{ring.bit_length()-1}, logQP = {logqp:.0f} "
          f"bits vs 128-bit budget {budget} -> "
          f"{'OK (>=128-bit classic)' if sec_ok else 'INSECURE'}",
          file=sys.stderr)

    keys = Keys.generate(ctx, seed=0)
    if lazy_keys is None and n_arr < 512:
        # exactly the keys DirectSort requests (computed registry) - each
        # KSK is ~290 MB at this depth, so no speculative extras
        steps = rotation_indices_direct_sort(n_arr, ring)
        keys.gen_rotation_keys(sorted(steps))
        ev = Evaluator(ctx, keys)
        srt = DirectSort(ev, n_arr)
    elif lazy_keys is not None:
        # explicit JIT keygen pool (ops/rotation.py lazy_key_budget)
        ev = Evaluator(ctx, keys, pt_cache_bytes=2 << 30)
        srt = DirectSort(ev, n_arr, lazy_key_budget=lazy_keys)
    else:
        # N >= 512: the full per-offset key set exceeds HBM, and just-in-
        # time keygen/evict churn of ~360 MB KSK buffers wedges the relay's
        # D2H path.  Instead pin a FIXED set: the shared keys (babies +
        # giants + folds, used every batch) plus the powers-of-two multiples
        # of the partition stride - each batch-offset rotation b*P then
        # composes from <= 2 pinned steps (NAF), with zero keygen churn.
        from fhe_sorting_tpu.ops.rotation import RotationComposer

        P = min(n_arr, (ring // 2) // n_arr)
        nb = n_arr // P
        offsets = {b * P for b in range(1, nb)}
        pows = {P << i for i in range(nb.bit_length())} | {-P}
        steps = (rotation_indices_direct_sort(n_arr, ring) - offsets) | pows
        keys.gen_rotation_keys(sorted(steps))
        ev = Evaluator(ctx, keys, pt_cache_bytes=2 << 30)
        # decomposition basis = the stride powers only; every other step
        # has a direct key, so the NAF path stays <= 3 key-switches/offset
        srt = DirectSort(ev, n_arr,
                         rot=RotationComposer(ev, sorted(pows)))
    cfg = SignConfig(CompositeSignConfig(cn, dg, df))
    print(f"# setup {time.time()-t0:.1f}s (ring {ring}, depth {depth}, "
          f"Lq={ctx.num_q}, K={ctx.num_sp}, {len(keys.rot)} rot keys)",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    vals = rng.permutation(n_arr) / n_arr + 0.5 / n_arr
    ct = keys.encrypt(vals)

    # warm-up run compiles every (op, level) combination; verbose so the
    # stderr log carries a per-phase (name, level, seconds) breakdown
    # (observability parity with mehp24_sort.cpp:230-244 level prints)
    srt.verbose = verbose
    t0 = time.time()
    out = srt.sort(ct, SignFunc.CompositeSign, cfg)
    out.data.block_until_ready()
    warm = time.time() - t0
    srt.verbose = False
    print(f"# warm-up (incl. compile): {warm:.1f}s", file=sys.stderr)

    # measure the sort error NOW, on the warm-up output: the relay's D2H
    # path wedges nondeterministically as per-process work accumulates, so
    # the earliest possible fetch has the best odds (the timed trials rerun
    # the identical computation - the error does not change)
    expected = np.sort(vals)
    err = float("nan")
    err_method = "decrypt"
    try:
        hd = _fetch(out.data, 120.0)
        from fhe_sorting_tpu.core.cipher import Ciphertext as _Ct0

        got = keys.decrypt(_Ct0(hd, out.level, out.sdeg, out.slots), n_arr)
        err = float(np.abs(got - expected).max())
        print(f"# max sort error (decrypt, post-warm-up): {err:.2e}",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# post-warm-up decrypt transfer failed ({type(e).__name__});"
              f" will retry after the timed trials", file=sys.stderr)

    times = []
    phases = []
    for _ in range(trials):
        ev.op_stats.clear()
        t0 = time.time()
        rank = srt.construct_rank(ct, SignFunc.CompositeSign, cfg)
        rank.data.block_until_ready()
        t1 = time.time()
        out = srt.rotation_index_check_n(rank, ct)
        out.data.block_until_ready()
        t2 = time.time()
        times.append(t2 - t0)
        phases.append((t1 - t0, t2 - t1))
    best = min(times)
    bi = times.index(best)
    print(f"# phases: constructRank {phases[bi][0]:.2f}s, "
          f"rotationIndexCheck {phases[bi][1]:.2f}s", file=sys.stderr)

    # roofline: % of single-chip speed-of-light for the measured run
    sol_s, breakdown = roofline.accumulate_sol(ctx, ev.op_stats)
    pct = 100.0 * sol_s / best
    if verbose:
        tot_ops = sum(ev.op_stats.values())
        print(f"# roofline: SoL bound {sol_s:.2f}s over {tot_ops} ops -> "
              f"{pct:.1f}% of speed-of-light", file=sys.stderr)
        for kind, s in sorted(breakdown.items(), key=lambda kv: -kv[1]):
            print(f"#   {kind:12s} SoL {s:.3f}s", file=sys.stderr)
        rs = getattr(srt.rot, "stats", None)
        if rs is not None:
            print(f"# rotation stats: rotations={rs.rotations} "
                  f"fast={rs.fast_rotations} composed={rs.composed} "
                  f"lazy_keygens={rs.lazy_keygens}", file=sys.stderr)

    # Decrypt transfer.  IMPORTANT: attempt the D2H with the device state
    # untouched - mass-deallocating GBs (or churning keys during the run)
    # right before a transfer is precisely what wedges the relay's D2H path
    # (observed: N=128 decrypts fine with no cleanup, hangs with an
    # aggressive pre-transfer free; N=1024 with keygen churn never
    # transfers at all).  Cleanup is the FALLBACK, not the preparation.
    import gc
    from fhe_sorting_tpu.core.cipher import Ciphertext as _Ct

    if err != err:  # early post-warm-up fetch failed: full fallback chain
        host_data = None
        try:
            host_data = _fetch(out.data, 120.0)
        except Exception as e:  # noqa: BLE001
            print(f"# direct decrypt transfer failed ({type(e).__name__}); "
                  f"freeing eval keys and retrying", file=sys.stderr)
            ev._pt_cache.clear()
            ev._pt_cache_used = 0
            keys.rot.clear()
            gc.collect()
            for pause in (5.0, 30.0):
                time.sleep(pause)
                try:
                    host_data = _fetch(out.data, 60.0)
                    break
                except Exception:  # noqa: BLE001
                    continue
        if host_data is not None:
            got = keys.decrypt(
                _Ct(host_data, out.level, out.sdeg, out.slots), n_arr)
            err = float(np.abs(got - expected).max())
        else:
            # bulk D2H is gone for this process: compute the error bound
            # ON DEVICE against the encoded expected output; only f32
            # scalars cross the link (sound L1 max-slot bound)
            try:
                err_method = "device_l1_bound"
                err = _device_err_bound(ev, keys, out, expected)
            except Exception as e:  # noqa: BLE001 - even scalar D2H wedged
                print(f"# device error bound also failed: "
                      f"{type(e).__name__}", file=sys.stderr)
                err_method = "transfer_wedged"
                err = float("nan")
        print(f"# max sort error ({err_method}): {err:.2e}", file=sys.stderr)
    return best, err, logqp, budget, sec_ok, pct, err_method


def _device_err_bound(ev, keys, out, expected) -> float:
    """Sound upper bound on the slot-domain sort error, computed entirely on
    device.

    decrypt(out) - expected has coefficient vector d/scale where
    d = INTT(c0 + c1*s - encode(expected)) (mod Q).  Each slot of the error
    is sum_j d_j/scale * zeta^j with |zeta| = 1, so
    max_slot |err| <= sum_j |d_j| / scale  (the L1 bound reported here).
    Mixed-radix (Garner) digits of each |d_j| are computed with u32 modular
    ops on device and combined in f32 against 1/scale-scaled weights; only
    the final scalar crosses the host link (the relay's bulk D2H path can
    be wedged after a ~19k-program run - the reason this exists)."""
    import jax.numpy as jnp
    import numpy as np

    from fhe_sorting_tpu.core import ntt as nttm
    from fhe_sorting_tpu.core.modmath import (
        add_mod, barrett_mulmod, neg_mod, shoup_mulmod, sub_mod,
    )

    ctx = ev.ctx
    Ll = out.data.shape[1]
    qs = [int(p) for p in ctx.q_primes[:Ll]]
    pc = ctx.pc
    sl = slice(0, Ll)
    p = pc.p[sl]
    pt = ev.make_plaintext(expected, out.level, out.sdeg, slots=out.slots)
    s = keys._s_dev[:Ll]
    m = add_mod(
        out.data[0],
        barrett_mulmod(out.data[1], s, p, pc.r2_32[sl], pc.r2_32_shoup[sl],
                       pc.p_inv32[sl]),
        p,
    )
    diff = sub_mod(m, pt.data, p)
    dco = nttm.intt(diff[None], ctx.tables.slice(0, Ll))[0]     # [Ll, n]

    scale = float(ctx.scale(out.level, out.sdeg))

    def garner_f32(res):
        """f32 |value|/scale per coefficient from residue planes (positive
        mixed-radix expansion; huge for negative values - min with the
        negated expansion below)."""
        xs = [res[i] for i in range(Ll)]
        val = jnp.zeros(res.shape[-1], jnp.float32)
        w = 1.0
        for i in range(Ll):
            gi = xs[i]
            val = val + gi.astype(jnp.float32) * np.float32(w / scale)
            qi = qs[i]
            for j in range(i + 1, Ll):
                qj = qs[j]
                inv = pow(qi % qj, -1, qj)
                inv_sh = (inv << 32) // qj
                gi_j = jnp.where(gi >= np.uint32(qj), gi - np.uint32(qj), gi)
                t = sub_mod(xs[j], gi_j, np.uint32(qj))
                xs[j] = shoup_mulmod(t, np.uint32(inv), np.uint32(inv_sh),
                                     np.uint32(qj))
            w *= qi
        return val

    pos = garner_f32(dco)
    negres = neg_mod(dco, p)
    neg = garner_f32(negres)
    coeff_err = jnp.minimum(pos, neg)
    both = jnp.stack([jnp.sum(coeff_err),
                      jnp.sqrt(jnp.mean(coeff_err * coeff_err))])
    both_h = _fetch(both, 120.0)        # 8-byte D2H, hang-guarded
    l1_f = float(both_h[0])
    n = ctx.params.ring_n
    rms_slot_est = float(both_h[1]) * float(np.sqrt(n / 2.0))
    print(f"# device err: L1 max-slot bound {l1_f:.3e}, "
          f"Parseval RMS-slot estimate {rms_slot_est:.3e}", file=sys.stderr)
    return l1_f


def _fetch(arr, timeout_s: float):
    """D2H with a hang guard: the relay's transfer path can block forever
    after a heavy run; the worker thread is abandoned on timeout (the RPC
    releases the GIL) and the caller falls back."""
    import threading

    import numpy as np

    box: dict = {}

    def work():
        try:
            box["v"] = np.asarray(arr)
        except Exception as e:  # noqa: BLE001
            box["e"] = e

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout_s)
    if "v" in box:
        return box["v"]
    if "e" in box:
        raise box["e"]
    raise TimeoutError(f"D2H did not complete in {timeout_s:.0f}s")


def _bench_one(n: int, args) -> dict:
    """One (N, ring) measurement with registry/meter defaults."""
    from fhe_sorting_tpu.ops.sign import CompositeSignConfig, SignConfig
    from fhe_sorting_tpu.utils.depth_meter import measure_direct_sort_depth
    from fhe_sorting_tpu.utils.params_registry import direct_sort_sign_cfg

    cn, dg, df = direct_sort_sign_cfg(n)
    cn = args.cn if args.cn is not None else cn
    dg = args.dg if args.dg is not None else dg
    df = args.df if args.df is not None else df
    depth = args.depth
    if depth is None:
        m = measure_direct_sort_depth(
            n, args.ring, SignConfig(CompositeSignConfig(cn, dg, df)))
        depth = m["mult_depth"]
        print(f"# N={n}: depth meter mult_depth {depth} "
              f"({m['ct_mults_and_rotations'][0]} ct-mults)", file=sys.stderr)
    best, err, logqp, budget, sec_ok, pct, err_method = run(
        n, args.ring, depth, args.trials, cn, dg, df,
        comp=args.comp, dnum=args.dnum, lazy_keys=args.lazy_keys)
    base = BASELINE_S.get(n)
    return {
        "value": round(best, 3),
        "vs_baseline": round(base / best, 2) if base else None,
        "max_error": err if err == err else None,  # NaN -> null (strict JSON)
        "err_method": err_method,
        "logqp_bits": round(logqp, 1),
        "logqp_128bit_budget": budget,
        "security_128bit": sec_ok,
        "pct_of_sol": round(pct, 1),
        "baseline_ref_s": base,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None,
                    help="array size; default: 128 then 1024 (north star)")
    ap.add_argument("--ring", type=int, default=131072)
    ap.add_argument("--depth", type=int, default=None,
                    help="mult depth; default: measured by the depth meter")
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--cn", type=int, default=None,
                    help="CompositeSign variant (3 or 4); registry default")
    ap.add_argument("--dg", type=int, default=None,
                    help="sign g-iterations; default from the params registry")
    ap.add_argument("--df", type=int, default=None)
    ap.add_argument("--comp", type=int, default=2,
                    help="primes per level (2 -> Delta=2^56)")
    ap.add_argument("--dnum", type=int, default=3)
    ap.add_argument("--lazy-keys", type=int, default=None,
                    help="JIT rotation-key pool size (default 3 for N>=512)")
    ap.add_argument("--budget-s", type=float, default=1500.0,
                    help="skip the secondary N if the primary took longer "
                         "than this (cold-cache guard)")
    args = ap.parse_args()

    t0 = time.time()
    ns = [args.n] if args.n is not None else [128, 1024]
    out = None
    for i, n in enumerate(ns):
        if i and time.time() - t0 > args.budget_s:
            out[f"n{n}_skipped"] = (
                f"time budget {args.budget_s:.0f}s exhausted (cold cache?)"
            )
            continue
        if out is None:
            r = _bench_one(n, args)
            out = {
                "metric": f"directsort_n{n}_ring{args.ring}_wall_clock",
                "unit": "s",
                **r,
                "baseline_src": "kway_k2 total_results.txt (reference CPU, "
                                "HEStd_128_classic ring 2^17)",
            }
        else:
            # secondary N in a FRESH process: the relay defers buffer frees,
            # so a same-process second phase OOMs in the sort no matter how
            # aggressively the first phase's keys/executables are dropped
            import os
            import subprocess

            cmd = [sys.executable, os.path.abspath(__file__),
                   "--n", str(n), "--ring", str(args.ring),
                   "--trials", str(args.trials), "--comp", str(args.comp),
                   "--dnum", str(args.dnum)]
            try:
                res = subprocess.run(cmd, stdout=subprocess.PIPE,
                                     timeout=1800)
                line = res.stdout.decode().strip().splitlines()[-1]
                sub = json.loads(line)
                out.update({f"n{n}_{k}": v for k, v in sub.items()
                            if k not in ("metric", "unit", "baseline_src")})
            except Exception as e:  # noqa: BLE001
                out[f"n{n}_error"] = type(e).__name__
    print(json.dumps(out))


if __name__ == "__main__":
    main()
