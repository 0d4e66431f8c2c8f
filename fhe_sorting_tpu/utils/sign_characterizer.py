"""Sign-approximation characterizer.

Parity with /root/reference/utils/sign_characterizer.cpp: sweep sign
configurations over shrinking input magnitudes until the approximation error
exceeds a threshold; report working precision, consumed depth and time.
Emits a metrics table (the reference's X-macro header becomes a dict).

  python -m fhe_sorting_tpu.utils.sign_characterizer --configs 3,2,2 3,3,2 4,2,2
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def characterize(n: int, dg: int, df: int, ring: int = 1024,
                 depth: int | None = None, threshold: float = 0.01):
    from ..core.context import CkksParams, Context
    from ..core.evaluator import Evaluator
    from ..core.keys import Keys
    from ..ops.sign import CompositeSignConfig, SignConfig, composite_sign

    per_iter = 3 if n == 3 else 5
    depth = depth or (dg + df) * per_iter + 4
    ctx = Context(CkksParams(ring_n=ring, mult_depth=depth))
    keys = Keys.generate(ctx, seed=0)
    ev = Evaluator(ctx, keys)
    cfg = SignConfig(CompositeSignConfig(n, dg, df))

    step = 0.5
    working = None
    elapsed = None
    consumed = None
    while step > 1e-9:
        vals = np.array([step, -step] * 32)
        ct = keys.encrypt(vals)
        t0 = time.time()
        out_ct = composite_sign(ev, ct, cfg)
        out_ct.data.block_until_ready()
        dt = time.time() - t0
        out = keys.decrypt(out_ct, 64)
        err = float(np.abs(out - np.sign(vals)).max())
        if err > threshold:
            break
        working = step
        elapsed = dt
        consumed = out_ct.level
        step /= 10.0
    return {
        "config": f"CompositeSign_{n}_{dg}_{df}",
        "working_precision": working,
        "depth_consumed": consumed,
        "time_s": round(elapsed, 3) if elapsed else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["3,2,2", "3,3,2"],
                    help="n,dg,df triples")
    ap.add_argument("--ring", type=int, default=1024)
    args = ap.parse_args()
    out = []
    for c in args.configs:
        n, dg, df = (int(v) for v in c.split(","))
        m = characterize(n, dg, df, ring=args.ring)
        print(m, file=sys.stderr)
        out.append(m)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
