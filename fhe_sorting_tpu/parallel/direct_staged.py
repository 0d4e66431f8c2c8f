"""Medium-grain DirectSort: ~a dozen jitted stage programs per sort.

The two whole-phase programs of ScanDirectSort (direct_scan.py) proved too
large for the TPU toolchain at ring 2^17 - the remote XLA compile helper
runs out of host RAM (SIGKILL) on a ~500-op program.  This module keeps the
same minimal-key execution model (incremental rot-by-1 babies, Horner
giant-step recombination, incremental rot-by-P batch offsets - key set
`scan_rotation_indices`) but cuts each phase at natural boundaries into
SEPARATE jitted programs:

  phase 1, per batch:  A  babies + vecRots Horner -> diff = dup - shifted
                       B* one program per composite-sign iteration
                       C  compare affine + rank accumulate
           once:       D  log-tree fold + SetSlots + (-0.5)
  phase 2, once:       E  index-minus-rank prep (Chebyshev domain scale)
           per batch:  F  PS baby/giant Chebyshev powers
                       G  PS leaf combos + divmod-tree fold (the sinc)
                       H  mask-mult + pre-rotations + blind-rotation Horner
           once:       I  batch Horner recombine + fold + SetSlots

A sort is stages x num_batch dispatches (12 at N=128, ~100 at N=1024) -
two orders of magnitude below the per-op path whose ~10^3-dispatch storm
wedges the TPU relay, while every single program stays small enough to
compile.  Each stage is a `WholeJit` (keys/tables as arguments, op tallies
recorded for the roofline).
"""

from __future__ import annotations

import math
from collections import Counter



from ..core.cipher import Ciphertext
from ..core.evaluator import Evaluator
from ..models.direct_sort import DirectSort, _default_np
from ..ops.chebyshev import ChebyshevPS
from ..ops.sign import F3, G3, SignConfig, eval_odd_poly7
from ..utils.sinc_coeffs import doubled_sinc_coefficients
from .direct_scan import scan_rotation_indices  # noqa: F401 (re-export)
from .whole_jit import WholeJit


class StagedDirectSort:
    """DirectSort over the minimal key set, one jitted program per stage."""

    def __init__(self, ev: Evaluator, N: int, sign_cfg: SignConfig):
        assert not ev.jit_ops, "StagedDirectSort needs jit_ops=False"
        assert sign_cfg.compos.n == 3, "staged path implements CompositeSign<3>"
        self.ev = ev
        self.N = N
        self.cfg = sign_cfg
        ring = ev.ctx.params.ring_n
        self.max_batch = ring // 2
        self.P = min(N, self.max_batch // N)
        self.nb = N // self.P
        self.num_slots = N * self.P
        self.np_ = min(_default_np(self.P, N), self.P)
        self.J = self.P // self.np_
        self.I2 = (self.num_slots // N) // self.np_
        self.srt = DirectSort(ev, N)     # mask generators
        self.ps = ChebyshevPS(ev)
        stretch = 1.0 + 4.0 / N
        self.alpha = 1.0 / (2.0 * N * stretch)
        self.coeffs = doubled_sinc_coefficients(N, stretch=stretch)
        self._stages: dict = {}
        self.verbose = False
        # fused PS (F+G in one program) unless its compile proves too big
        self.split_ps = False

    # -- stage infrastructure ---------------------------------------------

    def _run(self, name: str, fn, cts):
        st = self._stages.get(name)
        if st is None:
            st = self._stages[name] = WholeJit(self.ev, fn)
        import time

        t0 = time.time()
        out = st(cts)
        if self.verbose:
            (out[0] if isinstance(out, list) else out
             ).data.block_until_ready()
            import sys

            print(f"#   stage {name}: {time.time()-t0:.2f}s",
                  file=sys.stderr)
        return out

    def stage_stats(self) -> Counter:
        """Summed per-dispatch op tallies weighted by invocation counts."""
        total = Counter()
        for st in self._stages.values():
            total += Counter({k: v * st.calls for k, v in
                              st.op_counts.items()})
        return total

    def phase_stats(self) -> dict:
        """Op tallies split constructRank (stages A-D) vs
        rotationIndexCheck (E-I) for the per-phase roofline."""
        out = {"constructRank": Counter(), "rotationIndexCheck": Counter()}
        for name, st in self._stages.items():
            phase = ("constructRank" if name[0] in "ABCD"
                     else "rotationIndexCheck")
            out[phase] += Counter({k: v * st.calls for k, v in
                                   st.op_counts.items()})
        return out

    # -- phase 1: constructRank -------------------------------------------

    def _sign_coeff_plan(self):
        """[(coeffs, tag)] for the dg x g3 + df x f3 iterations, with the
        compare post-scale folded into the last iteration (sign.py
        final_scale)."""
        dg, df = self.cfg.compos.dg, self.cfg.compos.df
        plan = []
        for i in range(dg):
            plan.append((G3, f"g{i}"))
        for i in range(df):
            plan.append((F3, f"f{i}"))
        cs, tag = plan[-1]
        plan[-1] = (tuple(c * 0.5 for c in cs), tag + "s")
        return plan

    def construct_rank(self, ct: Ciphertext) -> Ciphertext:
        ev, srt = self.ev, self.srt
        N, np_, J, P = self.N, self.np_, self.J, self.P
        num_slots = self.num_slots
        base = srt._mask_block(num_slots, 0, N)

        def stage_a(cts):
            u, dup = cts
            babies = [u]
            for _ in range(1, np_):
                babies.append(ev.rotate(babies[-1], 1))
            babies = [b.set_slots(num_slots) for b in babies]
            shifted = None
            for j in range(J - 1, -1, -1):
                T = None
                for i in range(np_):
                    r = (np_ * j + i) * N + j * np_
                    term = ev.mult_plain_at(babies[i], base, roll=r)
                    T = term if T is None else ev.add(T, term)
                shifted = T if shifted is None else ev.add(
                    T, ev.rotate(shifted, np_))
            diff = ev.sub(dup.set_slots(num_slots), shifted)
            nxt = ev.rotate(u, P) if self.nb > 1 else u
            return [diff, nxt]

        plan = self._sign_coeff_plan()
        rank = None
        u = ct
        dup = ct
        for b in range(self.nb):
            diff, u = self._run("A", stage_a, [u, dup])
            y = diff
            for cs, tag in plan:
                y = self._run(
                    f"B{tag}",
                    (lambda csx: lambda cts: eval_odd_poly7(ev, cts[0], csx))(cs),
                    [y])
            # compare = 0.5*sign + 0.5 (post_scale folded into B's last cs)
            if rank is None:
                rank = self._run("C0", lambda cts: ev.add(cts[0], 0.5), [y])
            else:
                rank = self._run(
                    "C", lambda cts: ev.add(cts[0], ev.add(cts[1], 0.5)),
                    [y, rank])

        def stage_d(cts):
            r = cts[0]
            for i in range(1, int(math.log2(P)) + 1):
                r = ev.add(r, ev.rotate(r, num_slots >> i))
            return ev.sub(r.set_slots(N), 0.5)

        return self._run("D", stage_d, [rank])

    # -- phase 2: rotationIndexCheckN -------------------------------------

    def index_check(self, rank: Ciphertext, ct: Ciphertext) -> Ciphertext:
        ev, srt = self.ev, self.srt
        N, np_, I2, P = self.N, self.np_, self.I2, self.P
        num_slots = self.num_slots
        base2 = srt._mask_block(num_slots, 0, N)
        alpha = self.alpha

        def stage_e(cts):
            r = cts[0]
            if r.sdeg == 2:
                r = ev.rescale(r)
            idx_pt = ev.make_plaintext(srt._index_vector(), r.level, r.sdeg,
                                       slots=N)
            imr = ev.rsub(idx_pt, r).set_slots(num_slots)
            imr = ev.mult(imr, alpha)
            if imr.sdeg == 2:
                imr = ev.rescale(imr)
            return imr

        imr = self._run("E", stage_e, [rank])

        # the PS plan is split at its natural seam: powers (babies+giants),
        # then leaf combos + tree fold (ChebyshevPS.powers/combine).  The
        # per-batch checking vector is a tiny per-batch program (its encoded
        # plaintext is baked as a constant); the heavy F/G/H programs are
        # shared by every batch.
        inners = []
        for b in range(self.nb):
            check = srt._checking_vector_n(num_slots, b * P) * alpha

            def stage_sub(cts, check=check):
                return ev.sub(cts[0], ev.make_plaintext(
                    check, cts[0].level, cts[0].sdeg, slots=num_slots))

            x = self._run(f"Esub{b}", stage_sub, [imr])

            if self.split_ps:
                def stage_f(cts):
                    return self.ps.powers(cts[0], self.coeffs)

                powers = self._run("F", stage_f, [x])

                def stage_g(cts):
                    return self.ps.combine(cts, self.coeffs)

                sinc = self._run("G", stage_g, powers)
            else:
                # fused PS: one program, ONE output ciphertext per batch -
                # the split F->G seam hands ~70 power ciphertexts (~3.2 GB
                # at N=1024) across the stage boundary every batch, and the
                # relay's deferred frees turn that churn into OOM on any
                # second sort in the same process
                def stage_fg(cts):
                    return self.ps.evaluate(cts[0], self.coeffs)

                sinc = self._run("FG", stage_fg, [x])

            def stage_h(cts):
                ri, inp = cts
                masked = ev.mult(ri, inp.set_slots(num_slots))
                mrots = [masked]
                for _ in range(1, np_):
                    mrots.append(ev.rotate(mrots[-1], 1))
                inner = None
                for i in range(I2 - 1, -1, -1):
                    tmp = None
                    for j in range(np_):
                        r = (np_ * i + j) * N - j
                        term = ev.mult_plain_at(mrots[j], base2, roll=r)
                        tmp = term if tmp is None else ev.add(tmp, term)
                    inner = tmp if inner is None else ev.add(
                        tmp, ev.rotate(inner, np_))
                return inner

            inners.append(self._run("H", stage_h, [sinc, ct]))

        def stage_i(cts):
            out = cts[-1]
            for b in range(len(cts) - 2, -1, -1):
                out = ev.add(cts[b], ev.rotate(out, P))
            for i in range(1, int(math.log2(P)) + 1):
                out = ev.add(out, ev.rotate(out, num_slots >> i))
            return out.set_slots(N)

        return self._run("I", stage_i, inners)

    def __call__(self, ct: Ciphertext) -> Ciphertext:
        rank = self.construct_rank(ct)
        return self.index_check(rank, ct)
