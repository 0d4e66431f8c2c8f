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
fold programs.  The rotation-key set is minimized: StagedDirectSort's
{1, np, P} plus signed powers of four (binary-path steps 2^a and the
transpose steps 2^a - 2^b compose via the Decomposer's
closest-signed-greedy), with the fold rotations composed rather than
keyed - ~15 full-chain keys total.
"""

from __future__ import annotations

import numpy as np

from ..core.cipher import Ciphertext
from ..core.evaluator import Evaluator
from ..models.direct_sort import DirectSort
from ..ops.compare import Comparison
from ..ops.rotation import RotationComposer
from ..ops.sign import CompositeSignConfig, SignConfig, SignFunc
from .direct_staged import StagedDirectSort
from .whole_jit import WholeJit


def hybrid_staged_keys(N: int, ring_n: int) -> set:
    """StagedDirectSort's incremental/Horner keys + signed powers of four
    (placement ladders compose from them); folds compose too."""
    from .direct_scan import scan_rotation_indices

    idx = {k for k in scan_rotation_indices(N, ring_n)
           if k in (1,) or (k & (k - 1)) == 0 and k <= N}  # {1, np, P}
    # keep the scan set's small members; compose the big folds
    idx = {1}
    from ..models.direct_sort import _default_np

    P = min(N, (ring_n // 2) // N)
    idx.add(min(_default_np(P, N), P))
    if N // P > 1:
        idx.add(P)
    p = 1
    while p < ring_n // 2:
        idx.update({p, -p})
        p *= 4
    idx.discard(0)
    return idx


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
        self.rot = RotationComposer(ev, sorted(hybrid_staged_keys(N, ring)))
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

    def place(self, rank: Ciphertext, ct: Ciphertext) -> Ciphertext:
        """rotationIndexCheckHybrid (sort_algo.h:893-1047), staged."""
        ev, N = self.ev, self.N
        num_slots, num_batch, size = self.num_slots, self.num_batch, self.size
        stretch = 1.0 + 8.0 / N
        cfg_i = SignConfig(CompositeSignConfig(3, self.dgi, 2))
        comp = Comparison(ev)

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

        def stage_ind(cts):
            rm, inp = cts
            rm = comp.indicator(rm, 0.5 / (N * stretch),
                                SignFunc.CompositeSign, cfg_i)
            return ev.mult(inp, rm)

        masked = []
        for b in range(num_batch):
            sub_mask = np.zeros(num_slots)
            for i in range(size):
                sub_mask[i * size : (i + 1) * size] = (
                    (b * size + i) / (N * stretch))

            def stage_sub(cts, sub_mask=sub_mask):
                sub_pt = ev.make_plaintext(sub_mask, cts[0].level,
                                           cts[0].sdeg, slots=num_slots)
                return ev.rsub(sub_pt, cts[0])

            terms = []
            for k in range(num_batch):
                rm = self._run(f"Hsub{b}", stage_sub, [rots_rank[k]])
                terms.append(self._run("Hind", stage_ind,
                                       [rm, rots_inp[k]]))

            def stage_place(cts, b=b):
                acc = cts[0]
                for c in cts[1:]:
                    acc = ev.add(acc, c)
                acc = self.srt.sum_columns_to_target(
                    acc, N // num_batch, b, True)
                return self.srt.transpose_column_target(
                    acc, N // num_batch, b, True)

            masked.append(self._run(f"Hplace{b}", stage_place, terms))

        def stage_fin(cts):
            return ev.add_many(cts)

        return self._run("Hfin", stage_fin, masked)

    def __call__(self, ct: Ciphertext) -> Ciphertext:
        rank = self.base.construct_rank(ct)
        return self.place(rank, ct)
