"""CKKS bootstrapping: ModRaise -> CoeffsToSlots -> EvalMod -> SlotsToCoeffs.

The reference *uses* OpenFHE's EvalBootstrap (required by the k-way and
bitonic paths, EvalUtils.cpp:57-86, sort_algo.h:1110-1112) but does not
implement it; here it is built from this framework's own primitives:

  * ModRaise: drop to a single bottom prime q0 ~ Delta, INTT, exact centered
    base-extension of each coefficient to the full chain, NTT.  The raised
    ciphertext encrypts a + q0*I with |I| <~ K (ternary secret).
  * CoeffsToSlots: two BSGS linear transforms + a conjugation put the
    polynomial coefficients (low/high halves) into slot space, pre-scaled
    by 1/q0 so slot values live in [-K, K].
  * EvalMod: Chebyshev approximation of sin(2*pi*u)/(2*pi) on [-K, K]
    removes the q0*I multiples (messages must satisfy |m| <= msg_ratio/2
    so the small-angle regime holds; EvalBootstrap callers scale down
    accordingly, as OpenFHE's correction factor does).
  * SlotsToCoeffs: the forward embedding as two BSGS transforms, returning
    a fresh ciphertext at a low level with the original message.

This round supports full single-level transforms (O(slots) diagonals),
which is practical at the insecure test rings; the FFT-factored
level-budget variant (OpenFHE's {4,4}/{5,5}) is the planned upgrade for
production rings.
"""

from __future__ import annotations

import numpy as np

from ..ops.chebyshev import ChebyshevPS, chebyshev_fit
from ..ops.linear_transform import LinearTransform
from .cipher import Ciphertext
from .encoding import embed_forward, embed_inverse
from .evaluator import Evaluator, _pc_slice, _tab_slice
from . import ntt as nttm
from .modmath import add_mod, reduce_u32, shoup_mulmod, sub_mod
import jax
import jax.numpy as jnp


class Bootstrapper:
    def __init__(self, ev: Evaluator, slots: int | None = None,
                 K: float = 25.0, sin_degree: int = 255):
        self.ev = ev
        ctx = ev.ctx
        n = ctx.params.ring_n
        nh = n // 2
        self.slots = slots or nh
        assert self.slots == nh, "bootstrap currently requires full packing"
        self.K = K
        self.q0 = ctx.q_primes[0]
        self.bottom_level = ctx.params.mult_depth + ctx.params.base_limbs - 1
        # NOTE: bottom_level indexes the 1-limb state (below the rescale
        # floor); we only reach it by level_reduce, never by rescale.

        # --- probing the real-linear slot->coeff maps: a = A z + B conj(z)
        M1 = np.zeros((n, nh), dtype=np.complex128)
        M2 = np.zeros((n, nh), dtype=np.complex128)
        for t in range(nh):
            e = np.zeros(nh, dtype=np.complex128)
            e[t] = 1.0
            M1[:, t] = embed_inverse(e, n)
            e[t] = 1j
            M2[:, t] = embed_inverse(e, n)
        A = (M1 - 1j * M2) / 2.0
        B = (M1 + 1j * M2) / 2.0

        # C2S: slots of the raised ct are w = embed_forward(c)/s0 where c is
        # the coefficient vector (a + q0*I) and s0 the level-0 canonical
        # scale.  Want slots = c_half / q0:  c = s0 * (A w + B conj(w)).
        f = float(ctx.scale_dec(0)) / float(self.q0)
        self.c2s_lo = (LinearTransform(ev, f * A[:nh, :], nh),
                       LinearTransform(ev, f * B[:nh, :], nh))
        self.c2s_hi = (LinearTransform(ev, f * A[nh:, :], nh),
                       LinearTransform(ev, f * B[nh:, :], nh))

        # S2C: given slots u1 = c_lo/q0, u2 = c_hi/q0 (post EvalMod these are
        # a_lo/q0, a_hi/q0), final slots must be z = embed_forward(a)/s_out
        # where s_out is the canonical scale at the output level; the exact
        # per-level factor is folded in at apply time via a scalar multiply,
        # so the matrices carry q0/s_bottom with s_bottom = scale the input
        # ciphertext carried (folded below in `bootstrap`).
        F = np.zeros((nh, n), dtype=np.complex128)
        for k in range(n):
            e = np.zeros(n)
            e[k] = 1.0
            F[:, k] = embed_forward(e, n)
        self.F_lo = F[:, :nh]
        self.F_hi = F[:, nh:]
        self._s2c_cache = {}

        # EvalMod: h(v) = sin(2 pi K v) / (2 pi) on [-1, 1]
        self.sin_coeffs = chebyshev_fit(
            lambda v: np.sin(2 * np.pi * K * v) / (2 * np.pi), sin_degree
        )
        self.ps = ChebyshevPS(ev)

    # ------------------------------------------------------------------

    def required_rotations(self) -> set:
        idx = set()
        for lt in (*self.c2s_lo, *self.c2s_hi):
            idx |= lt.required_rotations()
        nh = self.slots
        # S2C transforms are built per call but share the BSGS structure
        from ..ops.linear_transform import LinearTransform as LT

        idx |= LT(self.ev, np.ones((nh, nh)), nh).required_rotations()
        return idx

    def _mod_raise(self, ct: Ciphertext) -> Ciphertext:
        """1-limb ct -> full-chain level-0 ct (exact centered extension)."""
        ev = self.ev
        ctx = ev.ctx
        dev = ev._dev
        L0 = ctx.num_q
        t1 = _tab_slice(dev.tables, 0, 1)
        t_all = _tab_slice(dev.tables, 0, L0)
        pc_all = _pc_slice(dev.pc, 0, L0)
        x = nttm.intt(ct.data[:, :1, :], t1)          # [2, 1, n] coeff, mod q0
        q0 = self.q0
        q0_half = jnp.uint32((q0 + 1) // 2)
        q0_mod = jnp.asarray(
            np.array([q0 % p for p in ctx.q_primes[:L0]], np.uint64)
            .astype(np.uint32)[:, None]
        )
        xm = reduce_u32(x, pc_all.p[None], pc_all.p_inv32[None])
        ext = jnp.where(x >= q0_half, sub_mod(xm, q0_mod[None], pc_all.p[None]),
                        xm)
        data = nttm.ntt(ext, t_all)
        return Ciphertext(data, 0, 1, ct.slots)

    def _apply_pair(self, lts, ct, ct_conj):
        a = lts[0].apply(ct)
        b = lts[1].apply(ct_conj)
        return self.ev.add(a, b)

    def bootstrap(self, ct: Ciphertext, msg_scale_down: float | None = None
                  ) -> Ciphertext:
        """Refresh `ct` to a low level.  |message| must be < 0.5 (callers
        with larger ranges pass msg_scale_down to pre-scale and the inverse
        is applied at the end)."""
        ev = self.ev
        ctx = ev.ctx
        nh = self.slots

        if msg_scale_down:
            ct = ev.mult(ct, 1.0 / msg_scale_down)
        # descend to the single bottom prime
        if ct.sdeg == 2:
            ct = ev.rescale(ct)
        s_bottom = float(ctx.scale_dec(ct.level))
        data1 = ct.data[:, :1, :]
        ct1 = Ciphertext(data1, ct.level, 1, ct.slots)

        raised = self._mod_raise(ct1)

        conj = ev.conjugate(raised)
        u1 = self._apply_pair(self.c2s_lo, raised, conj)
        u2 = self._apply_pair(self.c2s_hi, raised, conj)

        # EvalMod: v = u / K, then sin series
        v1 = ev.mult(u1, 1.0 / self.K)
        v2 = ev.mult(u2, 1.0 / self.K)
        m1 = self.ps.evaluate(v1, self.sin_coeffs)   # slots ~ a_lo / q0
        m2 = self.ps.evaluate(v2, self.sin_coeffs)

        # S2C at the current level: slots -> coefficients -> slot semantics
        m1, m2 = ev.align_group([m1, m2])
        if m1.sdeg == 2:
            m1, m2 = ev.rescale(m1), ev.rescale(m2)
        # slots of m1/m2 are a/q0; the original coefficients carry s_bottom,
        # so the forward-embedding matrices are scaled by q0/s_bottom
        f = float(self.q0) / s_bottom
        key = round(f, 12)
        if key not in self._s2c_cache:
            lt1 = LinearTransform(ev, f * self.F_lo, nh)
            lt2 = LinearTransform(ev, f * self.F_hi, nh)
            self._s2c_cache[key] = (lt1, lt2)
        lt1, lt2 = self._s2c_cache[key]
        out = ev.add(lt1.apply(m1), lt2.apply(m2))
        if msg_scale_down:
            out = ev.mult(out, msg_scale_down)
        return out
