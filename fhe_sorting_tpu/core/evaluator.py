"""Homomorphic evaluation ops over u32 limb planes (the OpenFHE Eval* surface).

Implements the exact API surface the reference exercises (SURVEY.md section 2
"OpenFHE API actually exercised"): add/sub/negate, ct*pt and ct*ct multiply
with relinearisation, rescale, rotations with hoisted precompute
(EvalFastRotationPrecompute/EvalFastRotation parity, rotation.h:286,343-347),
and the FLEXIBLEAUTO scale/level auto-adjustment that the reference's depth
budgets (sort_algo.h:87-201) assume.

Everything here is pure jnp on static shapes: it runs eagerly on CPU for
tests and is jitted whole-program for TPU benchmarks.  Trace-time metadata
(level/sdeg/slots) lives in the Ciphertext pytree aux data.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import ntt as nttm
from .cipher import Ciphertext, Plaintext
from .context import Context
from .encoding import coeffs_to_residues, encode_coeffs
from .keys import KeySwitchKey, Keys, _host_ntt_all
from .modmath import add_mod, barrett_mulmod, neg_mod, reduce_u32, shoup_mulmod, sub_mod


class Evaluator:
    """Stateless op collection bound to a Context + Keys.

    Mirrors the role of OpenFHE's CryptoContext as used by the reference;
    methods are pure functions of their ciphertext arguments.
    """

    def __init__(self, ctx: Context, keys: Keys, jit_ops: bool = True):
        self.ctx = ctx
        self.keys = keys
        self._tables_cache = {}
        self._pc_cache = {}
        # Pre-populate every limb-slice view eagerly: doing it lazily inside a
        # jit trace would cache traced values (tracer leak).
        for lvl in range(ctx.params.mult_depth + 1):
            Ll = ctx.limbs_at(lvl)
            plan = ctx.ks_plans[lvl]
            for idx in (
                tuple(range(Ll)),
                tuple(range(Ll - 1)),
                (Ll - 1,),
                tuple(range(ctx.num_q, ctx.num_q + ctx.num_sp)),
                plan.target_idx,
            ):
                if idx:
                    self._tables(idx)
                    self._pc(idx)
            for dp in plan.digits:
                self._pc(tuple(range(dp.limb_lo, dp.limb_hi)))
        # Per-instance jitted entry points.  Ciphertext metadata is pytree
        # aux-data, so each distinct (level, sdeg, slots, op) combination
        # compiles once and is then dispatched from cache; scalars and
        # rotation steps are static arguments.
        self.jit_ops = jit_ops
        if jit_ops:
            import jax

            self._jit_add_ct = jax.jit(self._align_then(add_mod))
            self._jit_sub_ct = jax.jit(self._align_then(sub_mod))
            self._jit_add_scalar = jax.jit(self._add_scalar, static_argnums=1)
            self._jit_add_pt = jax.jit(self._add_pt)
            self._jit_sub_pt = jax.jit(self._sub_pt)
            self._jit_negate = jax.jit(self._negate_impl)
            self._jit_mult_ct = jax.jit(self._mult_ct)
            self._jit_mult_scalar = jax.jit(self._mult_scalar, static_argnums=1)
            self._jit_mult_plain = jax.jit(self._mult_plain_adj)
            self._jit_square = jax.jit(self._square_impl)
            self._jit_rescale = jax.jit(self.rescale)
            self._jit_rotate = jax.jit(self._automorphism, static_argnums=1)
            self._jit_rotate_hoisted = jax.jit(
                self._rotate_hoisted_impl, static_argnums=2
            )
            self._jit_rotate_pre = jax.jit(
                lambda a: self._modup(a.data[1], a.level)
            )
            self._jit_adjust_level = jax.jit(self.adjust_level, static_argnums=1)

    def _align_then(self, op):
        def f(a, b):
            a, b = self._align_add(a, b)
            p = self._pc(self._active_idx(a.level)).p[None]
            return a.with_data(op(a.data, b.data, p))

        return f

    # -- cached limb-sliced tables ---------------------------------------

    def _tables(self, idx: tuple):
        if idx not in self._tables_cache:
            self._tables_cache[idx] = self.ctx.tables_for(list(idx))
        return self._tables_cache[idx]

    def _pc(self, idx: tuple):
        if idx not in self._pc_cache:
            self._pc_cache[idx] = self.ctx.pc_for(list(idx))
        return self._pc_cache[idx]

    def _active_idx(self, level: int) -> tuple:
        return tuple(range(self.ctx.limbs_at(level)))

    # -- plaintext construction ------------------------------------------

    def make_plaintext(self, values, level: int, sdeg: int = 1,
                       slots: int | None = None) -> Plaintext:
        """Host-encode a vector plaintext at the canonical (level, sdeg) scale
        (MakeCKKSPackedPlaintext with explicit level/slots parity,
        sort_algo.h:317-318)."""
        ctx = self.ctx
        values = np.asarray(values, dtype=np.float64)
        s = slots if slots is not None else len(values)
        scale = ctx.scale(level, sdeg)
        coeffs = encode_coeffs(values, ctx.params.ring_n, scale, slots=s)
        Ll = ctx.limbs_at(level)
        res = coeffs_to_residues(coeffs, ctx.q_primes[:Ll])
        ev = _host_ntt_all(ctx, res, range(Ll))
        return Plaintext(jnp.asarray(ev.astype(np.uint32)), level, sdeg, s)

    def _scalar_limbs(self, c: float, level: int, sdeg_scale: float) -> np.ndarray:
        """round(c * scale) reduced mod each active prime -> [Ll, 1] u32."""
        m = int(np.rint(np.float64(c) * sdeg_scale))
        Ll = self.ctx.limbs_at(level)
        out = np.array(
            [m % p for p in self.ctx.q_primes[:Ll]], dtype=np.uint64
        )
        return out.astype(np.uint32)[:, None]

    # -- add / sub / neg --------------------------------------------------

    def _align_add(self, a: Ciphertext, b: Ciphertext):
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

    def _add_pt(self, a: Ciphertext, b: Plaintext) -> Ciphertext:
        assert b.level == a.level and b.sdeg == a.sdeg, "pt/ct mismatch"
        p = self._pc(self._active_idx(a.level)).p[None]
        d0 = add_mod(a.data[0], b.data, p[0])
        return a.with_data(jnp.stack([d0, a.data[1]]))

    def _sub_pt(self, a: Ciphertext, b: Plaintext) -> Ciphertext:
        assert b.level == a.level and b.sdeg == a.sdeg
        p = self._pc(self._active_idx(a.level)).p[None]
        d0 = sub_mod(a.data[0], b.data, p[0])
        return a.with_data(jnp.stack([d0, a.data[1]]))

    def _add_scalar(self, a: Ciphertext, c: float) -> Ciphertext:
        # scalar: constant polynomial addition, eval-domain broadcast
        scale = self.ctx.scale(a.level, a.sdeg)
        sc = jnp.asarray(self._scalar_limbs(c, a.level, scale))
        p = self._pc(self._active_idx(a.level)).p
        d0 = add_mod(a.data[0], sc, p)
        return a.with_data(jnp.stack([d0, a.data[1]]))

    def add(self, a: Ciphertext, b) -> Ciphertext:
        if isinstance(b, Ciphertext):
            if self.jit_ops:
                return self._jit_add_ct(a, b)
            a, b = self._align_add(a, b)
            p = self._pc(self._active_idx(a.level)).p[None]
            return a.with_data(add_mod(a.data, b.data, p))
        if isinstance(b, Plaintext):
            return self._jit_add_pt(a, b) if self.jit_ops else self._add_pt(a, b)
        if self.jit_ops:
            return self._jit_add_scalar(a, float(b))
        return self._add_scalar(a, float(b))

    def sub(self, a: Ciphertext, b) -> Ciphertext:
        if isinstance(b, Ciphertext):
            if self.jit_ops:
                return self._jit_sub_ct(a, b)
            a, b = self._align_add(a, b)
            p = self._pc(self._active_idx(a.level)).p[None]
            return a.with_data(sub_mod(a.data, b.data, p))
        if isinstance(b, Plaintext):
            return self._jit_sub_pt(a, b) if self.jit_ops else self._sub_pt(a, b)
        return self.add(a, -float(b))

    def rsub(self, b, a: Ciphertext) -> Ciphertext:
        """scalar/pt minus ciphertext."""
        return self.add(self.negate(a), b)

    def _negate_impl(self, a: Ciphertext) -> Ciphertext:
        p = self._pc(self._active_idx(a.level)).p[None]
        return a.with_data(neg_mod(a.data, p))

    def negate(self, a: Ciphertext) -> Ciphertext:
        return self._jit_negate(a) if self.jit_ops else self._negate_impl(a)

    # -- level / scale adjustment ----------------------------------------

    def level_reduce(self, a: Ciphertext, target_level: int) -> Ciphertext:
        """Drop limbs without rescaling (OpenFHE LevelReduce)."""
        assert target_level >= a.level
        Lt = self.ctx.limbs_at(target_level)
        return Ciphertext(a.data[:, :Lt], target_level, a.sdeg, a.slots)

    def adjust_level(self, a: Ciphertext, target_level: int) -> Ciphertext:
        """Raise a to target_level keeping the canonical scale invariant.

        sdeg-1 path: multiply by 1 encoded at scale s_tgt*q_l/s_l, rescale,
        then drop limbs - lands exactly on s_tgt (FLEXIBLEAUTO adjustment).
        """
        if a.level == target_level:
            return a
        if a.sdeg == 2:
            a = self.rescale(a)
            if a.level == target_level:
                return a
            if a.level > target_level:
                raise ValueError("cannot adjust downwards")
        ctx = self.ctx
        la = a.level
        t = float(
            ctx.scale_dec(target_level)
            * ctx.drop_prime(la)
            / ctx.scale_dec(la)
        )
        sc = jnp.asarray(self._scalar_limbs(1.0, la, t))
        p = self._pc(self._active_idx(la)).p[None]
        a = a.with_data(barrett_limbs_scalar(a.data, sc, self._pc(self._active_idx(la))))
        a = Ciphertext(a.data, la, 2, a.slots)   # off-canonical; fixed below
        a = self._rescale_data(a)                # true scale now s_target
        a = Ciphertext(a.data, a.level, 1, a.slots)
        return self.level_reduce(a, target_level)

    def _to_sdeg2(self, a: Ciphertext) -> Ciphertext:
        """Multiply by integer round(s_l) so scale becomes s_l^2."""
        scale = self.ctx.scale(a.level, 1)
        sc = jnp.asarray(self._scalar_limbs(1.0, a.level, scale))
        pc = self._pc(self._active_idx(a.level))
        return Ciphertext(
            barrett_limbs_scalar(a.data, sc, pc), a.level, 2, a.slots
        )

    # -- rescale ----------------------------------------------------------

    def _rescale_data(self, a: Ciphertext) -> Ciphertext:
        """Divide by the level's dropped prime with exact rounding."""
        ctx = self.ctx
        lvl = a.level
        if lvl >= ctx.params.mult_depth:
            raise RuntimeError(
                f"multiplicative depth exhausted (level {lvl} == mult_depth "
                f"{ctx.params.mult_depth}); deepen parameters or bootstrap"
            )
        Ll = ctx.limbs_at(lvl)
        plan = ctx.rescale_plans[lvl]
        last_idx = (Ll - 1,)
        rest_idx = tuple(range(Ll - 1))
        t_last = self._tables(last_idx)
        t_rest = self._tables(rest_idx)
        pc_rest = self._pc(rest_idx)

        last_coeff = nttm.intt(a.data[:, Ll - 1 :, :], t_last)  # [2,1,n]
        x = last_coeff  # canonical residues of q_last
        # centered residue mod each remaining prime
        xm = reduce_u32(x, pc_rest.p[None], pc_rest.p_inv32[None])
        t = jnp.where(
            x >= plan.qlast_half,
            sub_mod(xm, plan.qlast_mod_qi[None], pc_rest.p[None]),
            xm,
        )
        t_eval = nttm.ntt(t, t_rest)
        num = sub_mod(a.data[:, : Ll - 1, :], t_eval, pc_rest.p[None])
        out = shoup_mulmod(
            num, plan.qlast_inv[None], plan.qlast_inv_shoup[None], pc_rest.p[None]
        )
        return Ciphertext(out, lvl + 1, a.sdeg, a.slots)

    def rescale(self, a: Ciphertext) -> Ciphertext:
        assert a.sdeg == 2, "rescale only from scale degree 2"
        out = self._rescale_data(a)
        return Ciphertext(out.data, out.level, 1, out.slots)

    # -- multiplication ---------------------------------------------------

    def _adjust_for_mult(self, a: Ciphertext):
        if a.sdeg == 2:
            a = self.rescale(a)
        return a

    def mult(self, a: Ciphertext, b) -> Ciphertext:
        if isinstance(b, Ciphertext):
            return self._jit_mult_ct(a, b) if self.jit_ops else self._mult_ct(a, b)
        if isinstance(b, Plaintext):
            return (
                self._jit_mult_plain(a, b)
                if self.jit_ops
                else self._mult_plain_adj(a, b)
            )
        if self.jit_ops:
            return self._jit_mult_scalar(a, float(b))
        return self._mult_scalar(a, float(b))

    def _mult_plain_adj(self, a: Ciphertext, pt: Plaintext) -> Ciphertext:
        return self._mult_plain(a, pt)

    def _mult_scalar(self, a: Ciphertext, c: float) -> Ciphertext:
        a = self._adjust_for_mult(a)
        scale = self.ctx.scale(a.level, 1)
        sc = jnp.asarray(self._scalar_limbs(c, a.level, scale))
        pc = self._pc(self._active_idx(a.level))
        return Ciphertext(
            barrett_limbs_scalar(a.data, sc, pc), a.level, 2, a.slots
        )

    def _mult_plain(self, a: Ciphertext, pt: Plaintext) -> Ciphertext:
        a = self._adjust_for_mult(a)
        assert pt.level == a.level and pt.sdeg == 1, (
            f"plaintext at level {pt.level}/deg {pt.sdeg}, ct at {a.level}"
        )
        pc = self._pc(self._active_idx(a.level))
        d = barrett_mulmod(
            a.data, pt.data[None], pc.p[None], pc.r2_32[None],
            pc.r2_32_shoup[None], pc.p_inv32[None],
        )
        return Ciphertext(d, a.level, 2, a.slots)

    def mult_plain_at(self, a: Ciphertext, values) -> Ciphertext:
        """Convenience: encode `values` at a's level and multiply."""
        if a.sdeg == 2:
            a = self._jit_rescale(a) if self.jit_ops else self.rescale(a)
        pt = self.make_plaintext(values, a.level, 1, slots=a.slots)
        return self.mult(a, pt)

    def _mult_ct(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a = self._adjust_for_mult(a)
        b = self._adjust_for_mult(b)
        if a.level < b.level:
            a = self.adjust_level(a, b.level)
        elif b.level < a.level:
            b = self.adjust_level(b, a.level)
        pc = self._pc(self._active_idx(a.level))
        mm = functools.partial(
            barrett_mulmod,
            p=pc.p[None],
            r2_32=pc.r2_32[None],
            r2_32_shoup=pc.r2_32_shoup[None],
            p_inv32=pc.p_inv32[None],
        )
        p = pc.p[None]
        a0, a1 = a.data[0], a.data[1]
        b0, b1 = b.data[0], b.data[1]
        d0 = mm(a0[None], b0[None])[0]
        d1 = add_mod(mm(a0[None], b1[None])[0], mm(a1[None], b0[None])[0], p[0])
        d2 = mm(a1[None], b1[None])[0]
        e0, e1 = self._keyswitch_core(d2, a.level, self.keys.relin)
        c0 = add_mod(d0, e0, p[0])
        c1 = add_mod(d1, e1, p[0])
        return Ciphertext(jnp.stack([c0, c1]), a.level, 2, a.slots)

    def square(self, a: Ciphertext) -> Ciphertext:
        return self._jit_square(a) if self.jit_ops else self._square_impl(a)

    def _square_impl(self, a: Ciphertext) -> Ciphertext:
        a = self._adjust_for_mult(a)
        pc = self._pc(self._active_idx(a.level))
        mm = functools.partial(
            barrett_mulmod,
            p=pc.p[None],
            r2_32=pc.r2_32[None],
            r2_32_shoup=pc.r2_32_shoup[None],
            p_inv32=pc.p_inv32[None],
        )
        p = pc.p[None]
        a0, a1 = a.data[0], a.data[1]
        d0 = mm(a0[None], a0[None])[0]
        cross = mm(a0[None], a1[None])[0]
        d1 = add_mod(cross, cross, p[0])
        d2 = mm(a1[None], a1[None])[0]
        e0, e1 = self._keyswitch_core(d2, a.level, self.keys.relin)
        return Ciphertext(
            jnp.stack([add_mod(d0, e0, p[0]), add_mod(d1, e1, p[0])]),
            a.level, 2, a.slots,
        )

    # -- key switching ----------------------------------------------------

    def _modup(self, d_limb: jnp.ndarray, level: int):
        """Hybrid ModUp of a single poly [Ll, n] (eval) -> list of extended
        digits [T, n] (eval) over the target basis Q_l + P."""
        ctx = self.ctx
        plan = ctx.ks_plans[level]
        active = self._active_idx(level)
        t_active = self._tables(active)
        t_target = self._tables(plan.target_idx)
        pc_t = self._pc(plan.target_idx)
        d_coeff = nttm.intt(d_limb[None], t_active)[0]  # [Ll, n]
        out = []
        for dp in plan.digits:
            y = shoup_mulmod(
                d_coeff[dp.limb_lo : dp.limb_hi],
                dp.dhat_inv,
                dp.dhat_inv_shoup,
                self._pc(tuple(range(dp.limb_lo, dp.limb_hi))).p,
            )  # [alpha, n]
            T = len(plan.target_idx)
            n = y.shape[-1]
            acc = jnp.zeros((T, n), dtype=jnp.uint32)
            for i in range(dp.limb_hi - dp.limb_lo):
                term = shoup_mulmod(
                    y[i][None], dp.ext_fac[i], dp.ext_fac_shoup[i], pc_t.p
                )
                acc = add_mod(acc, term, pc_t.p)
            out.append(nttm.ntt(acc[None], t_target)[0])
        return out

    def _inner_product(self, digits, level: int, ksk: KeySwitchKey):
        ctx = self.ctx
        plan = ctx.ks_plans[level]
        pc_t = self._pc(plan.target_idx)
        tgt = list(plan.target_idx)
        acc0 = None
        acc1 = None
        for j, ext in enumerate(digits):
            kb = ksk.kb[j][jnp.asarray(tgt)]
            ka = ksk.ka[j][jnp.asarray(tgt)]
            t0 = barrett_mulmod(
                ext, kb, pc_t.p, pc_t.r2_32, pc_t.r2_32_shoup, pc_t.p_inv32
            )
            t1 = barrett_mulmod(
                ext, ka, pc_t.p, pc_t.r2_32, pc_t.r2_32_shoup, pc_t.p_inv32
            )
            acc0 = t0 if acc0 is None else add_mod(acc0, t0, pc_t.p)
            acc1 = t1 if acc1 is None else add_mod(acc1, t1, pc_t.p)
        return acc0, acc1

    def _moddown(self, c: jnp.ndarray, level: int) -> jnp.ndarray:
        """[T, n] over Q_l + P  ->  [Ll, n] over Q_l (divide by P)."""
        ctx = self.ctx
        plan = ctx.ks_plans[level]
        Ll = ctx.limbs_at(level)
        K = ctx.num_sp
        sp_idx = tuple(range(ctx.num_q, ctx.num_q + K))
        active = self._active_idx(level)
        cq = c[:Ll]
        cp = c[Ll:]
        cp_coeff = nttm.intt(cp[None], self._tables(sp_idx))[0]
        y = shoup_mulmod(
            cp_coeff, plan.phat_inv, plan.phat_inv_shoup, self._pc(sp_idx).p
        )
        pc_a = self._pc(active)
        n = c.shape[-1]
        acc = jnp.zeros((Ll, n), dtype=jnp.uint32)
        for i in range(K):
            term = shoup_mulmod(
                y[i][None], plan.pext_fac[i], plan.pext_fac_shoup[i], pc_a.p
            )
            acc = add_mod(acc, term, pc_a.p)
        ext_eval = nttm.ntt(acc[None], self._tables(active))[0]
        num = sub_mod(cq, ext_eval, pc_a.p)
        return shoup_mulmod(
            num, plan.p_inv_mod_qi, plan.p_inv_mod_qi_shoup, pc_a.p
        )

    def _keyswitch_core(self, d_limb: jnp.ndarray, level: int,
                        ksk: KeySwitchKey):
        digits = self._modup(d_limb, level)
        acc0, acc1 = self._inner_product(digits, level, ksk)
        return self._moddown(acc0, level), self._moddown(acc1, level)

    # -- rotations --------------------------------------------------------

    def rotate(self, a: Ciphertext, r: int) -> Ciphertext:
        """Left slot-rotation by r (EvalRotate parity; negative = right)."""
        nh = self.ctx.params.ring_n // 2
        if r % nh == 0:
            return a
        g = self.ctx.galois_element_rot(r)
        return self._jit_rotate(a, g) if self.jit_ops else self._automorphism(a, g)

    def conjugate(self, a: Ciphertext) -> Ciphertext:
        g = 2 * self.ctx.params.ring_n - 1
        return self._jit_rotate(a, g) if self.jit_ops else self._automorphism(a, g)

    def _automorphism(self, a: Ciphertext, g: int) -> Ciphertext:
        assert g in self.keys.rot, f"missing rotation key for galois {g}"
        perm = self.ctx.galois_perm(g)
        d = a.data[:, :, perm]
        e0, e1 = self._keyswitch_core(d[1], a.level, self.keys.rot[g])
        p = self._pc(self._active_idx(a.level)).p
        c0 = add_mod(d[0], e0, p)
        return Ciphertext(jnp.stack([c0, e1]), a.level, a.sdeg, a.slots)

    def rotate_precompute(self, a: Ciphertext):
        """Hoisted decomposition of c1 (EvalFastRotationPrecompute parity)."""
        if self.jit_ops:
            return self._jit_rotate_pre(a)
        return self._modup(a.data[1], a.level)

    def rotate_hoisted(self, a: Ciphertext, pre, r: int) -> Ciphertext:
        if self.jit_ops:
            return self._jit_rotate_hoisted(a, pre, r)
        return self._rotate_hoisted_impl(a, pre, r)

    def _rotate_hoisted_impl(self, a: Ciphertext, pre, r: int) -> Ciphertext:
        """EvalFastRotation parity: reuse the hoisted ModUp across rotations.

        sigma_g(ModUp(x)) = ModUp(sigma_g(x)) up to extension noise that the
        gadget annihilates, so the permutation is applied to the extended
        digits directly.
        """
        nh = self.ctx.params.ring_n // 2
        if r % nh == 0:
            return a
        g = self.ctx.galois_element_rot(r)
        assert g in self.keys.rot, f"missing rotation key for galois {g}"
        perm = self.ctx.galois_perm(g)
        digits = [ext[:, perm] for ext in pre]
        acc0, acc1 = self._inner_product(digits, a.level, self.keys.rot[g])
        e0 = self._moddown(acc0, a.level)
        e1 = self._moddown(acc1, a.level)
        p = self._pc(self._active_idx(a.level)).p
        c0 = add_mod(a.data[0][:, perm], e0, p)
        return Ciphertext(jnp.stack([c0, e1]), a.level, a.sdeg, a.slots)

    # -- misc -------------------------------------------------------------

    def zeros_like(self, a: Ciphertext) -> Ciphertext:
        return a.with_data(jnp.zeros_like(a.data))

    def add_many(self, cts) -> Ciphertext:
        out = cts[0]
        for c in cts[1:]:
            out = self.add(out, c)
        return out


def barrett_limbs_scalar(data, sc, pc):
    """Multiply [k, L, n] data by per-limb scalars sc [L, 1]."""
    return barrett_mulmod(
        data, sc[None], pc.p[None], pc.r2_32[None], pc.r2_32_shoup[None],
        pc.p_inv32[None],
    )
