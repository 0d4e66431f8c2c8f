"""Staged hybrid DirectSort: the TRUE maxArraySize=256 tiling at N > 256.

The reference's hybrid placement (sort_algo.h:893-1047) lays ranks out in
N x N-matrix style: for N > 256 it tiles into batches of 256 (num_slots =
ring/2 = 65536 at ring 2^17, num_batch = N/256), indicates each row's
target with a SIGN-based indicator (CompositeSign dg 4/5 - the sinc branch
is for N < 256), and places elements via the sumColumnsToTarget /
transposeColumnTarget binary-path folds (sort_algo.h:824-891).

This module stages that placement for the TPU the same way
direct_staged.py stages the flagship: construct_rank reuses
StagedDirectSort's A-D stages; the placement runs as per-(b,k) indicator
programs (shared where ciphertext metadata allows) + per-b binary-path
fold programs.  The placement-phase rotation-key basis is
{±1, ±max_array} + positive powers of four + batch offsets
(hybrid_staged_keys below, ~10 keys): every fold/transpose step
greedy-decomposes over it in a handful of hops, and the TPU driver swaps
this basis in AFTER constructRank's scan keys are dropped, so peak HBM is
max(phase), not the union of both key sets.
"""

from __future__ import annotations

import numpy as np

from ..core.cipher import Ciphertext
from ..core.evaluator import Evaluator
from ..models.direct_sort import DirectSort
from ..ops.rotation import RotationComposer
from ..ops.sign import SignConfig
from .direct_staged import StagedDirectSort
from .whole_jit import WholeJit


def hybrid_staged_keys(N: int, ring_n: int, max_array: int = 256) -> set:
    """Placement-phase key basis: {±1} + powers of four + batch offsets.

    Full-chain rotation keys at depth 48 / ring 2^17 / dnum 5 are ~630 MB
    EACH, so the basis is chosen for HBM residency, not hop count: every
    placement step (sumColumnsToTarget's halving ladder, sort_algo.h:825-861;
    transposeColumnTarget's s(s-1)/2 >> i ladder, sort_algo.h:863-891;
    the -1/-255-style negative fixups) greedy-decomposes over signed
    {±1, 4^a} in <= 13 hops (measured), and every one of those hops runs at
    end-of-chain levels where a key-switch touches ~1/10 of the limbs.
    9 keys (~5.7 GB) at N=512 instead of the >= 17 a 2-hop NAF basis needs
    (~11 GB - the round-4 OOM).

    The constructRank phase uses scan_rotation_indices(N) instead; the TPU
    driver (benchmarks/run_hybrid_tpu.py) swaps the resident key set
    between phases to keep peak HBM at max(phase), not the union.
    """
    nh = ring_n // 2
    num_batch = max(1, N // max_array)
    # -max_array keyed too: the b>=1 transpose fixup needs rotate(-(size-1))
    # = [-max_array, +1]-class chains; without it the all-positive greedy
    # costs 13 sequential end-of-chain key-switches (round-4 advice).
    ks = {1, -1, -max_array}
    for b in range(1, num_batch):
        ks.add((b * max_array) % nh)
    p = 4
    while p < nh:
        ks.add(p)
        p *= 4
    ks.discard(0)
    return ks


class StagedHybridSort:
    """sort_hybrid (sort_algo.h:1050-1064) with the true 256-wide tiling."""

    def __init__(self, ev: Evaluator, N: int, sign_cfg: SignConfig,
                 max_array: int = 256, indicator_dg: int | None = None):
        assert not ev.jit_ops
        self.ev = ev
        self.N = N
        self.max_array = max_array
        ring = ev.ctx.params.ring_n
        self.num_slots = ring // 2 if N > max_array else N * N
        self.num_batch = max(1, N // max_array)
        self.size = min(N, max_array)
        assert self.num_slots <= ring // 2
        self.base = StagedDirectSort(ev, N, sign_cfg)
        self.rot = RotationComposer(
            ev, sorted(hybrid_staged_keys(N, ring, max_array)))
        self.srt = DirectSort(ev, N, rot=self.rot)
        # sort_algo.h:968-981: dg 4 below N=512, else 5
        self.dgi = indicator_dg or (4 if N < 512 else 5)
        self._stages: dict = {}
        self.verbose = False

    def _run(self, name, fn, cts):
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

    def _ind_coeff_plan(self):
        """Per-iteration coefficient plan for the placement indicator's two
        CompositeSign<3> branches (dg=self.dgi, df=2), final 0.5 folded."""
        from ..ops.sign import F3, G3

        plan = [(G3, f"g{i}") for i in range(self.dgi)]
        plan += [(F3, f"f{i}") for i in range(2)]
        cs, tag = plan[-1]
        plan[-1] = (tuple(c * 0.5 for c in cs), tag + "s")
        return plan

    def place(self, rank: Ciphertext, ct: Ciphertext) -> Ciphertext:
        """rotationIndexCheckHybrid (sort_algo.h:893-1047), staged.

        The indicator (2 CompositeSign branches) runs as ONE jitted program
        per sign iteration over BOTH branches - the whole-indicator program
        was the compile-size risk at ring 2^17 (cf. direct_staged's B
        stages)."""
        from ..ops.sign import eval_odd_poly7

        ev, N = self.ev, self.N
        num_slots, num_batch, size = self.num_slots, self.num_batch, self.size
        stretch = 1.0 + 8.0 / N
        c_ind = 0.5 / (N * stretch)

        def stage_prep(cts):
            r = cts[0]
            if r.sdeg == 2:
                r = ev.rescale(r)
            r = r.set_slots(num_slots)
            return ev.mult(r, 1.0 / (N * stretch))

        r = self._run("Hprep", stage_prep, [rank])

        def stage_rot(cts, b):
            return [self.rot.rotate(cts[0], b * self.max_array),
                    self.rot.rotate(cts[1].set_slots(num_slots),
                                    b * self.max_array)]

        rots = [self._run(f"Hrot{b}",
                          (lambda bb: lambda cts: stage_rot(cts, bb))(b),
                          [r, ct])
                for b in range(num_batch)]
        rots_rank = [x[0] for x in rots]
        rots_inp = [x[1] for x in rots]

        plan = self._ind_coeff_plan()

        masked = []
        for b in range(num_batch):
            sub_mask = np.zeros(num_slots)
            for i in range(size):
                sub_mask[i * size : (i + 1) * size] = (
                    (b * size + i) / (N * stretch))

            def stage_sub(cts, sub_mask=sub_mask):
                sub_pt = ev.make_plaintext(sub_mask, cts[0].level,
                                           cts[0].sdeg, slots=num_slots)
                rm = ev.rsub(sub_pt, cts[0])
                return [ev.add(rm, c_ind), ev.sub(rm, c_ind)]

            def stage_iter(cts, cs):
                return [eval_odd_poly7(ev, cts[0], cs),
                        eval_odd_poly7(ev, cts[1], cs)]

            def stage_comb(cts):
                y1, y2, inp = cts
                # c1*(1-c2) with c = 0.5*s + 0.5 (scale folded into the
                # last iteration): (y1+0.5)*(0.5-y2)
                ind = ev.mult(ev.add(y1, 0.5), ev.rsub(0.5, y2))
                return ev.mult(inp, ind)

            terms = []
            for k in range(num_batch):
                ys = self._run(f"Hsub{b}", stage_sub, [rots_rank[k]])
                for cs, tag in plan:
                    ys = self._run(
                        f"HB{tag}",
                        (lambda csx: lambda cts: stage_iter(cts, csx))(cs),
                        ys)
                terms.append(self._run(
                    "Hcomb", stage_comb, [ys[0], ys[1], rots_inp[k]]))

            # binary-path folds (sum_columns_to_target /
            # transpose_column_target, sort_algo.h:824-891) as SEGMENTED
            # rotate-add programs: the powers-of-4 key basis composes each
            # fold step from up to ~13 hops, so a whole ladder in one
            # program would cross the ring-2^17 compile-size limit.
            def seg(cts, steps, mask=None):
                c = cts[0].set_slots(size * size)
                if len(cts) > 1:
                    for extra in cts[1:]:
                        c = ev.add(c, extra.set_slots(size * size))
                for s in steps:
                    c = ev.add(c, self.rot.rotate(c, s))
                if mask is not None:
                    c = ev.mult_plain_at(c, mask)
                return c

            def ladder(initial_step, path, halve_shift=1):
                steps = []
                st = initial_step
                for bit in path:
                    steps.append(-st if bit else st)
                    st >>= halve_shift
                return steps

            path = self.srt._binary_path(b, size)
            sum_steps = ladder(size >> 1, path)
            m_col = np.zeros(size * size)
            m_col[b::size] = 1.0
            T = size * (size - 1) // 2
            tr_steps = ladder(T, path)
            m_row = np.zeros(size * size)
            m_row[size * b : size * (b + 1)] = 1.0

            acc = self._run(
                f"HplaceS{b}",
                (lambda ss, mc: lambda cts: seg(cts, ss, mc))(
                    sum_steps, m_col),
                terms)
            # transpose split: the first steps are hop-heaviest
            cut = max(1, len(tr_steps) // 3)
            acc = self._run(
                f"HplaceT{b}a",
                (lambda ss: lambda cts: seg(cts, ss))(tr_steps[:cut]),
                [acc])
            acc = self._run(
                f"HplaceT{b}b",
                (lambda ss: lambda cts: seg(cts, ss))(
                    tr_steps[cut:2 * cut]),
                [acc])
            masked.append(self._run(
                f"HplaceT{b}c",
                (lambda ss, mr: lambda cts: seg(cts, ss, mr))(
                    tr_steps[2 * cut:], m_row),
                [acc]))

        def stage_fin(cts):
            return ev.add_many(cts)

        return self._run("Hfin", stage_fin, masked)

    def __call__(self, ct: Ciphertext) -> Ciphertext:
        rank = self.base.construct_rank(ct)
        return self.place(rank, ct)
