"""Medium-grain MEHP24 multi-ciphertext sort for the N > 256 regime.

The reference splits arrays longer than 256 into 256-slot sub-ciphertexts
and runs an O(k^2) pairwise comparison triangle with Cv/Ch rank
accumulators (`sortLargeArrayFG`, mehp24_sort.cpp:607-645, 284-443).  At
sub_length 256 a matrix tile is 65536 slots = a FULL ring-2^17 ciphertext,
so this is TPU-scale work; like the flagship (direct_staged.py) it runs as
a handful of jitted stage programs over a REDUCED rotation-key set:

  * keys: signed powers of FOUR {+-4^i} (+-256 included for split/combine);
    every matrix-ladder step (powers of two and the transpose steps
    2^a - 2^b) composes from <= 4 of them via the RotationComposer;
  * stages: split -> replicate (per part) -> pairwise signAdv compare
    (shared program) -> rank fold -> per-(j,kk) indicator+mask (heavy
    program shared; per-pair index offsets in tiny Sub stages) ->
    placement fold -> combine.

At ring 2^17 / depth 44 the key set is ~6 GB - inside the v5e's HBM where
the reference-faithful 48-key ladder set (~19 GB) is not.
"""

from __future__ import annotations

from ..core.cipher import Ciphertext
from ..core.evaluator import Evaluator
from ..models.mehp24.sort import Mehp24Sort
from ..models.mehp24.utils import combine_ciphertext, split_ciphertext
from ..ops.rotation import RotationComposer
from ..ops.sign import sign_adv
from .whole_jit import WholeJit

import numpy as np


def mehp24_staged_keys(sub: int, ring_n: int) -> set:
    """Signed powers of 4 covering the ladder range, plus +-sub."""
    nh = ring_n // 2
    idx = {sub, -sub}
    p = 1
    while p < nh:
        idx.update({p, -p})
        p *= 4
    idx.discard(0)
    return idx


class StagedMehp24Multi:
    """k-part MEHP24 triangle sort as staged jitted programs."""

    def __init__(self, ev: Evaluator, total: int, sub: int,
                 dg_c: int, df_c: int, dg_i: int, df_i: int):
        assert not ev.jit_ops, "StagedMehp24Multi needs jit_ops=False"
        self.ev = ev
        self.total = total
        self.sub = sub
        self.k = total // sub
        self.cfg = (dg_c, df_c, dg_i, df_i)
        rot = RotationComposer(ev, sorted(mehp24_staged_keys(
            sub, ev.ctx.params.ring_n)))
        self.model = Mehp24Sort(ev, total, sub_length=sub, rot=rot)
        self.rot = rot
        self._stages: dict = {}
        self.verbose = False

    def _run(self, name: str, fn, cts):
        st = self._stages.get(name)
        if st is None:
            st = self._stages[name] = WholeJit(self.ev, fn)
        import sys
        import time

        t0 = time.time()
        out = st(cts)
        if self.verbose:
            (out[0] if isinstance(out, list) else out
             ).data.block_until_ready()
            print(f"#   stage {name}: {time.time()-t0:.2f}s",
                  file=sys.stderr)
        return out

    def __call__(self, ct: Ciphertext) -> Ciphertext:
        ev, mat = self.ev, self.model.mat
        k, sub, total = self.k, self.sub, self.total
        dg_c, df_c, dg_i, df_i = self.cfg

        def stage_split(cts):
            return split_ciphertext(ev, self.rot, cts[0], total, sub)

        parts = self._run("split", stage_split, [ct])

        def stage_repl(cts):
            c = cts[0]
            return [mat.replicate_row(c),
                    mat.replicate_column(mat.transpose_row(c, True))]

        repl = [self._run("repl", stage_repl, [p]) for p in parts]
        replR = [r[0] for r in repl]
        replC = [r[1] for r in repl]

        # pairwise triangle: ONE shared compare program
        def stage_cmp(cts):
            return sign_adv(ev, ev.sub(cts[0], cts[1]), dg_c, df_c)

        Cv = [None] * k
        Ch = [None] * k
        for j in range(k):
            for kk in range(j, k):
                Cjk = self._run("cmp", stage_cmp, [replR[j], replC[kk]])
                Cv[j] = Cjk if Cv[j] is None else self._run(
                    "acc", lambda cts: ev.add(cts[0], cts[1]), [Cv[j], Cjk])
                if j != kk:
                    Ckj = self._run("flip",
                                    lambda cts: ev.rsub(1.0, cts[0]), [Cjk])
                    Ch[kk] = Ckj if Ch[kk] is None else self._run(
                        "acc", lambda cts: ev.add(cts[0], cts[1]),
                        [Ch[kk], Ckj])

        def stage_sv(cts):
            return mat.sum_rows(cts[0])

        def stage_sh(cts):
            shj = mat.sum_columns(cts[0], True)
            shj = mat.transpose_column(shj, True)
            return mat.replicate_row(shj)

        s = []
        for j in range(k):
            sj = self._run("sv", stage_sv, [Cv[j]])
            if j > 0:
                shj = self._run("sh", stage_sh, [Ch[j]])
                sj = self._run("acc2", lambda cts: ev.add(cts[0], cts[1]),
                               [sj, shj])
            s.append(sj)
        # align all rank tiles to one (level, sdeg) so the downstream
        # indicator stages are shared programs (s[0] is shallower: it has
        # no masked Ch fold)
        if k > 1:
            s = self._run("align", lambda cts: ev.align_group(cts), s)

        # indicator + placement: heavy program shared across (j, kk); the
        # per-j row-index offset is a tiny per-j Sub stage (constant baked)
        from ..ops.compare import Comparison

        comp = Comparison(ev)

        def stage_ind(cts):
            Rm, vr = cts
            return ev.mult(
                comp.indicator_adv(Rm, float(total), dg_i, df_i), vr)

        def stage_place(cts):
            acc = cts[0]
            for c in cts[1:]:
                acc = ev.add(acc, c)
            acc = mat.sum_columns(acc, True)
            return mat.transpose_column(acc, True)

        out_parts = []
        for j in range(k):
            subm = np.repeat(
                -(j * sub + np.arange(sub, dtype=np.float64)) - 0.5, sub)

            def stage_sub(cts, subm=subm):
                return ev.add(cts[0], ev.make_plaintext(
                    subm, cts[0].level, cts[0].sdeg, slots=sub * sub))

            terms = []
            for kk in range(k):
                Rm = self._run(f"Rsub{j}", stage_sub, [s[kk]])
                terms.append(self._run("ind", stage_ind, [Rm, replR[kk]]))
            out_parts.append(self._run("place", stage_place, terms))

        def stage_combine(cts):
            return combine_ciphertext(ev, self.rot, cts, sub)

        return self._run("combine", stage_combine, out_parts)
