"""Metadata-only depth metering: compute required mult_depth without crypto.

The reference hardcodes per-N depth tables as switch statements
(/root/reference/src/sort_algo.h:87-201, DirectSortHTest.cpp:28-102,
Mehp24SortTest.cpp:33-66).  Here level/scale bookkeeping is static trace-time
metadata (core/cipher.py), so the exact depth any algorithm consumes can be
*measured* by running it against a `MeterEvaluator` that implements the real
evaluator's (level, sdeg) transition rules on data-free ciphertexts - no
keys, no NTTs, milliseconds instead of minutes.  This is the computed
replacement for the reference's parameter tables: `bench.py` and the params
registry derive `mult_depth` from `measure_direct_sort_depth` instead of
maintaining tables by hand.

The transition rules mirror `core/evaluator.py` exactly:
  mult/square     : operands rescale first if sdeg==2, align levels, out sdeg 2
  mult by pt/scalar: rescale first if sdeg==2, out sdeg 2
  add/sub         : align levels (cheapest path: rescale / scalar-mult +
                    rescale / level_reduce), align sdeg (1 -> 2 via scalar)
  rescale         : sdeg 2 -> 1, level += 1   (the depth-consuming op)
  rotations/conj  : metadata no-ops
"""

from __future__ import annotations

from dataclasses import dataclass

from ..core.cipher import Ciphertext, Plaintext


@dataclass
class _MeterParams:
    ring_n: int
    mult_depth: int = 10_000     # effectively unbounded

    @property
    def max_slots(self) -> int:
        return self.ring_n // 2


class _MeterCtx:
    def __init__(self, ring_n: int):
        self.params = _MeterParams(ring_n)

    def galois_element_rot(self, r: int) -> int:  # composer compatibility
        return pow(5, r % (self.params.ring_n // 2), 2 * self.params.ring_n)


class MeterEvaluator:
    """Evaluator facade tracking only (level, sdeg); `max_level` after a run
    is the minimum `mult_depth` the real context needs."""

    class _AllRot:
        def __contains__(self, g) -> bool:   # composer key probes
            return True

    class _AllKeys:
        pass

    def __init__(self, ring_n: int):
        self.ctx = _MeterCtx(ring_n)
        self.keys = self._AllKeys()
        self.keys.rot = self._AllRot()
        self.max_level = 0
        self.mults = 0
        self.rotations = 0

    # -- core transitions --------------------------------------------------

    def rescale(self, a: Ciphertext) -> Ciphertext:
        lvl = a.level + 1
        self.max_level = max(self.max_level, lvl)
        return Ciphertext(None, lvl, 1, a.slots)

    def level_reduce(self, a: Ciphertext, target: int) -> Ciphertext:
        assert target >= a.level
        return Ciphertext(None, target, a.sdeg, a.slots)

    def adjust_level(self, a: Ciphertext, target: int) -> Ciphertext:
        if a.sdeg == 2:
            a = self.rescale(a)
        if a.level > target:
            raise ValueError("cannot adjust downwards")
        if a.level < target:
            # scalar mult to sdeg 2, rescale, then free drops
            a = self.rescale(Ciphertext(None, a.level, 2, a.slots))
            a = self.level_reduce(a, target)
        return a

    def _to_sdeg2(self, a: Ciphertext) -> Ciphertext:
        return Ciphertext(None, a.level, 2, a.slots)

    def _align(self, a: Ciphertext, b: Ciphertext):
        if a.level != b.level:
            if a.level < b.level:
                a = self.adjust_level(a, b.level)
            else:
                b = self.adjust_level(b, a.level)
        if a.sdeg != b.sdeg:
            if a.sdeg == 1:
                a = self._to_sdeg2(a)
            else:
                b = self._to_sdeg2(b)
        return a, b

    # -- op surface --------------------------------------------------------

    def add(self, a: Ciphertext, b) -> Ciphertext:
        if isinstance(b, Ciphertext):
            a, b = self._align(a, b)
        return Ciphertext(None, a.level, a.sdeg, a.slots)

    sub = add

    def rsub(self, b, a: Ciphertext) -> Ciphertext:
        return self.add(self.negate(a), b)

    def negate(self, a: Ciphertext) -> Ciphertext:
        return a

    def mult(self, a: Ciphertext, b) -> Ciphertext:
        self.mults += 1
        if isinstance(b, Ciphertext):
            if a.sdeg == 2:
                a = self.rescale(a)
            if b.sdeg == 2:
                b = self.rescale(b)
            if a.level != b.level:
                if a.level < b.level:
                    a = self.adjust_level(a, b.level)
                else:
                    b = self.adjust_level(b, a.level)
            return Ciphertext(None, a.level, 2, a.slots)
        if a.sdeg == 2:
            a = self.rescale(a)
        return Ciphertext(None, a.level, 2, a.slots)

    def square(self, a: Ciphertext) -> Ciphertext:
        return self.mult(a, a)

    def mult_plain_at(self, a: Ciphertext, values,
                      roll: int = 0) -> Ciphertext:
        return self.mult(a, 1.0)

    def make_plaintext(self, values, level: int, sdeg: int = 1,
                       slots: int | None = None) -> Plaintext:
        return Plaintext(None, level, sdeg, slots or 0)

    def combo(self, cts, rows, consts):
        """Mirror of Evaluator.combo's level discipline: align all inputs to
        (max level incl. pending rescales, sdeg 1), outputs at sdeg 2."""
        import numpy as np

        tgt = max(c.level + (1 if c.sdeg == 2 else 0) for c in cts)
        self.max_level = max(self.max_level, tgt)
        R = np.asarray(rows).shape[0]
        self.mults += R
        return [Ciphertext(None, tgt, 2, cts[0].slots) for _ in range(R)]

    def add_many(self, cts) -> Ciphertext:
        out = cts[0]
        for c in cts[1:]:
            out = self.add(out, c)
        return out

    def align_group(self, cts):
        lvl = max(c.level for c in cts)
        out = [self.adjust_level(c, lvl) if c.level < lvl else c for c in cts]
        lvl = max(c.level for c in out)
        out = [self.adjust_level(c, lvl) if c.level < lvl else c for c in out]
        if len({c.sdeg for c in out}) > 1:
            out = [self._to_sdeg2(c) if c.sdeg == 1 else c for c in out]
        return out

    def zeros_like(self, a: Ciphertext) -> Ciphertext:
        return a

    # -- rotations: metadata no-ops ---------------------------------------

    def rotate(self, a: Ciphertext, r: int) -> Ciphertext:
        self.rotations += 1
        return a

    def conjugate(self, a: Ciphertext) -> Ciphertext:
        return a

    def rotate_precompute(self, a: Ciphertext):
        return None

    def rotate_hoisted(self, a: Ciphertext, pre, r: int) -> Ciphertext:
        self.rotations += 1
        return a


def measure_direct_sort_depth(N: int, ring_n: int, sign_cfg=None,
                              hybrid: bool = False) -> dict:
    """Required mult_depth (+ op counts) for DirectSort at (N, ring, cfg).

    Replaces the reference's per-N depth table (sort_algo.h:87-201) with a
    measurement of this implementation's actual consumption (which differs:
    e.g. the stretched-domain sinc fit runs at a higher Chebyshev degree)."""
    from ..models.direct_sort import DirectSort
    from ..ops.sign import SignConfig, SignFunc

    ev = MeterEvaluator(ring_n)
    srt = DirectSort.__new__(DirectSort)
    # minimal init without a real evaluator
    from ..models.base import SortBase
    from ..ops.chebyshev import ChebyshevPS
    from ..ops.compare import Comparison
    from ..ops.rotation import RotationComposer
    from ..models.direct_sort import rotation_indices_direct_sort

    SortBase.__init__(srt, ev, N)
    srt.max_batch = ring_n // 2
    srt.comp = Comparison(ev)
    srt.ps = ChebyshevPS(ev)
    srt.rot = RotationComposer(
        ev, sorted(rotation_indices_direct_sort(N, ring_n))
    )
    cfg = sign_cfg or SignConfig()
    ct = Ciphertext(None, 0, 1, N)
    out = (srt.sort_hybrid if hybrid else srt.sort)(
        ct, SignFunc.CompositeSign, cfg
    )
    # decrypt headroom: a scale-degree-2 result at the bottom carries
    # scale^2 ~ 2^(2*scale_bits), which exceeds the base_limbs modulus -
    # reserve one extra level so an extra limb survives
    need = ev.max_level + (1 if out.sdeg == 2 else 0)
    return {
        "mult_depth": need,
        "final_level": out.level,
        "ct_mults_and_rotations": (ev.mults, ev.rotations),
    }
