"""Generic whole-model jit: trace ANY sort/model call as one XLA program.

Generalizes the ScanDirectSort execution model (parallel/direct_scan.py) to
arbitrary model code: the callable runs once under `jax.jit` with the
evaluator's key-switch keys and device tables rebound to traced program
ARGUMENTS (see `_bound_state`), so

  * a sort is O(1) dispatches instead of ~10^3 per-op programs (the
    dispatch storm is what wedges the TPU relay's D2H path);
  * no multi-GB captured constants are shipped at compile time;
  * the persistent compile cache key is value-independent.

Usage:
    ev = Evaluator(ctx, keys, jit_ops=False)
    run = WholeJit(ev, lambda cts: model.sort_fg_multi(cts, ...))
    outs = run(parts)         # parts: list[Ciphertext]
"""

from __future__ import annotations

import jax

from ..core.cipher import Ciphertext
from ..core.evaluator import Evaluator
from .direct_scan import _bound_state


class WholeJit:
    """Compile `call(list[Ciphertext]) -> Ciphertext | list[Ciphertext]`
    into one jitted program with keys/tables as arguments."""

    def __init__(self, ev: Evaluator, call):
        assert not ev.jit_ops, "WholeJit needs a jit_ops=False Evaluator"
        self.ev = ev
        self.call = call
        self._jitted = None
        self._in_meta = None
        self._out_meta = None
        self.calls = 0             # dispatch count (for roofline weighting)
        self.op_counts = {}        # per-dispatch logical-op tally

    def _build(self, cts):
        import jax.numpy as jnp

        ev = self.ev
        keys_obj = ev.keys
        gs = tuple(sorted(keys_obj.rot))
        rot_pack = tuple((keys_obj.rot[g].kb, keys_obj.rot[g].ka)
                         for g in gs)
        relin_pack = (keys_obj.relin.kb, keys_obj.relin.ka)
        self._packs = (ev._dev, rot_pack, relin_pack, jnp.int32(0))
        in_meta = tuple((c.level, c.sdeg, c.slots) for c in cts)
        self._in_meta = in_meta
        out_box = {}

        def fn(datas, dev, rot_pack, relin_pack, token):
            with _bound_state(ev, dev, rot_pack, relin_pack, gs, token):
                ins = [Ciphertext(d, *m) for d, m in zip(datas, in_meta)]
                out = self.call(ins)
                if isinstance(out, Ciphertext):
                    out_box["meta"] = (out.level, out.sdeg, out.slots)
                    return out.data
                out_box["meta"] = [(o.level, o.sdeg, o.slots) for o in out]
                return [o.data for o in out]

        # abstract pass pins the output metadata before compilation, and
        # records the per-dispatch op tally for roofline accounting
        from collections import Counter

        ev.op_stats, saved = Counter(), ev.op_stats
        jax.eval_shape(fn, [jax.ShapeDtypeStruct(c.data.shape, c.data.dtype)
                            for c in cts], *self._packs)
        self.op_counts = dict(ev.op_stats)
        ev.op_stats = saved
        self._out_meta = out_box["meta"]
        self._jitted = jax.jit(fn)

    def __call__(self, cts):
        if isinstance(cts, Ciphertext):
            cts = [cts]
        if self._jitted is None:
            self._build(cts)
        got = tuple((c.level, c.sdeg, c.slots) for c in cts)
        assert got == self._in_meta, (
            f"stage reused with different ciphertext metadata: built for "
            f"{self._in_meta}, called with {got} - align inputs or use a "
            f"separate stage name"
        )
        self.calls += 1
        out = self._jitted([c.data for c in cts], *self._packs)
        if isinstance(self._out_meta, tuple):
            return Ciphertext(out, *self._out_meta)
        return [Ciphertext(d, *m) for d, m in zip(out, self._out_meta)]
