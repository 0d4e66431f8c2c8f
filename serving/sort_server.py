"""Serving entry point: blind sort of a serialized ciphertext.

Parity with /root/reference/src/main.cpp + src/sort.h (the FHERMA
blind-sorting challenge deployment shape): the server loads a crypto
context, evaluation keys and an input ciphertext from files - never a
secret key - runs the chosen sort, and writes the output ciphertext.

Usage:
  python -m serving.sort_server --cc ctx.json --keys keys.npz \
      --input input.npz --output output.npz --n 128 \
      [--algo direct|bitonic|kway|mehp24]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")  # repo root

from fhe_sorting_tpu.core.evaluator import Evaluator  # noqa: E402
from fhe_sorting_tpu.core.serialize import (  # noqa: E402
    load_ciphertext, load_context, load_eval_keys, save_ciphertext,
)
from fhe_sorting_tpu.ops.sign import (  # noqa: E402
    CompositeSignConfig, SignConfig, SignFunc,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cc", required=True, help="context json")
    ap.add_argument("--keys", required=True, help="evaluation keys npz")
    ap.add_argument("--input", required=True, help="input ciphertext npz")
    ap.add_argument("--output", required=True, help="output ciphertext npz")
    ap.add_argument("--n", type=int, required=True, help="array size")
    ap.add_argument("--algo", default="direct",
                    choices=["direct", "bitonic", "kway", "mehp24"])
    # default: the params registry's per-N choice (the reference hardcodes
    # CompositeSignConfig(4,3,3) at sort.h:89; a registry default cannot
    # exceed the depth the context was provisioned for)
    ap.add_argument("--sign_n", type=int, default=None)
    ap.add_argument("--dg", type=int, default=None)
    ap.add_argument("--df", type=int, default=None)
    args = ap.parse_args(argv)

    if args.sign_n is None or args.dg is None or args.df is None:
        from fhe_sorting_tpu.utils.params_registry import direct_sort_sign_cfg

        cn, dg, df = direct_sort_sign_cfg(args.n)
        args.sign_n = args.sign_n if args.sign_n is not None else cn
        args.dg = args.dg if args.dg is not None else dg
        args.df = args.df if args.df is not None else df

    ctx = load_context(args.cc)
    keys = load_eval_keys(args.keys, ctx)
    ct = load_ciphertext(args.input)
    ev = Evaluator(ctx, keys)

    if args.algo == "direct":
        from fhe_sorting_tpu.models.direct_sort import DirectSort

        sorter = DirectSort(ev, args.n)
    elif args.algo == "bitonic":
        from fhe_sorting_tpu.models.bitonic import BitonicSort

        sorter = BitonicSort(ev, args.n, normalize=1.0)
    elif args.algo == "kway":
        from fhe_sorting_tpu.models.kway.adapter import KWayAdapter

        sorter = KWayAdapter(ev, args.n)
    else:
        from fhe_sorting_tpu.models.mehp24 import Mehp24Sort

        sorter = Mehp24Sort(ev, args.n)

    cfg = SignConfig(CompositeSignConfig(args.sign_n, args.dg, args.df))
    t0 = time.time()
    out = sorter.sort(ct, SignFunc.CompositeSign, cfg)
    out.data.block_until_ready()
    print(f"sorted N={args.n} with {args.algo} in {time.time()-t0:.2f}s",
          file=sys.stderr)
    save_ciphertext(args.output, out)


if __name__ == "__main__":
    main()
