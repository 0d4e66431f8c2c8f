"""Homomorphic evaluation ops over u32 limb planes (the OpenFHE Eval* surface).

Implements the API surface the reference exercises (SURVEY.md section 2):
add/sub/negate, ct*pt and ct*ct multiply with relinearisation, rescale,
rotations with hoisted precompute (EvalFastRotationPrecompute/EvalFastRotation
parity, rotation.h:286,343-347), and FLEXIBLEAUTO scale/level auto-adjustment
so the reference's depth budgets (sort_algo.h:87-201) hold.

Architecture for TPU dispatch/compile efficiency:

  * Every jitted entry point receives the big device state - full NTT
    twiddle tables, prime constants, per-level key-switch plans, and the
    relevant key-switch key - as *explicit pytree arguments*.  Closed-over
    jax.Arrays would be baked as literals into every executable (duplicating
    hundreds of MB of KSK per compiled op); passing them keeps one
    device-resident copy shared by all executables.

  * Rotation permutations are traced arguments, so all rotation steps at a
    given (level, sdeg) share ONE compiled program; the galois element only
    selects which perm/KSK arrays are passed in.

  * Scalar add/mult pass the per-limb residue vector as a traced argument,
    so distinct scalar constants do not trigger recompiles.

Compiles are therefore keyed only by (op, level, sdeg, slots-shape), a small
bounded set.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import jax.tree_util as tree_util
import numpy as np

from . import ntt as nttm
from .cipher import Ciphertext, Plaintext
from .context import Context, PrimeConsts
from .encoding import coeffs_to_residues, encode_coeffs
from .keys import KeySwitchKey, Keys, _host_ntt_all
from .modmath import add_mod, barrett_mulmod, neg_mod, reduce_u32, shoup_mulmod, sub_mod


@dataclass(frozen=True)
class DevState:
    """Full device-resident tables, passed into every jitted op."""

    tables: nttm.NttTables           # over all Q+P primes
    pc: PrimeConsts                  # over all Q+P primes
    ks_plans: tuple                  # per-level KeySwitchPlan
    rescale_plans: tuple             # per-level RescalePlan
    auto: object = None              # AffineAutoTables (gather-free rotate)


tree_util.register_pytree_node(
    DevState,
    lambda d: ((d.tables, d.pc, d.ks_plans, d.rescale_plans, d.auto), None),
    lambda aux, ch: DevState(*ch),
)


def _tab_slice(t, lo: int, hi: int):
    """Limb-range view of NTT tables (NttTables or FourStepTables)."""
    return t.slice(lo, hi)


def _tab_concat(a, b):
    return a.concat(b)


def _pc_slice(pc: PrimeConsts, lo: int, hi: int) -> PrimeConsts:
    return PrimeConsts(pc.p[lo:hi], pc.r2_32[lo:hi], pc.r2_32_shoup[lo:hi],
                       pc.p_inv32[lo:hi], pc.sh256[lo:hi])


def _pc_concat(a: PrimeConsts, b: PrimeConsts) -> PrimeConsts:
    cat = lambda x, y: jnp.concatenate([x, y], axis=0)
    return PrimeConsts(cat(a.p, b.p), cat(a.r2_32, b.r2_32),
                       cat(a.r2_32_shoup, b.r2_32_shoup),
                       cat(a.p_inv32, b.p_inv32), cat(a.sh256, b.sh256))


class Evaluator:
    """Op collection bound to a Context + Keys (role parity: CryptoContext)."""

    def __init__(self, ctx: Context, keys: Keys, jit_ops: bool = True,
                 pt_cache_entries: int = 1024,
                 pt_cache_bytes: int = 2 << 30):
        self.ctx = ctx
        self.keys = keys
        self.jit_ops = jit_ops
        # logical-op counter for roofline accounting (utils/roofline.py):
        # (op, level) -> count, incremented at Python dispatch (trace) time.
        from collections import Counter
        self.op_stats: Counter = Counter()
        # Whole-graph tracers (parallel/whole_jit.py) set this to a traced
        # int32 zero: mixing it into the galois perms of mult_plain_at
        # keeps the mask gathers IN-GRAPH.  Without it, gathering a
        # concrete cached plaintext by a concrete perm constant-folds at
        # trace time, materializing one multi-MB mask constant per roll
        # (observed: 128 x 36 MB = 4.6 GB of HLO globals at ring 2^17).
        self._trace_token = None
        # Plaintext-encode memo: sort graphs re-request the same masks every
        # call (trace time), and each encode costs an embedding FFT + CRT +
        # host NTT + H2D copy.  LRU-bounded by entries AND device bytes (a
        # full-chain ring-2^16 plaintext is ~25 MB; entries alone would let
        # the cache eat the whole HBM).
        from collections import OrderedDict
        self._pt_cache: OrderedDict = OrderedDict()
        self._pt_host_cache: OrderedDict = OrderedDict()
        self._pt_cache_entries = pt_cache_entries
        self._pt_cache_bytes = pt_cache_bytes
        self._pt_cache_used = 0
        self._pt_host_cache_bytes = 16 << 30
        self._pt_host_used = 0
        # Structured (gather-free) automorphisms (core/auto_affine.py).
        # OPT-IN for now: measured on-chip at N=1024 the XLA lowering loses
        # to the gather (the 16 digit-pair einsums materialize full-size
        # s32 intermediates; needs the Pallas fusion treatment the NTT
        # got).  FHE_AFFINE_AUTO=1 enables on MXU contexts, =force on any.
        import os as _os

        _aff_env = _os.environ.get("FHE_AFFINE_AUTO", "0")
        self.use_affine = (_aff_env == "force"
                           or (_aff_env == "1" and ctx.ntt_impl == "mxu"))
        self._dev = DevState(
            tables=ctx.tables, pc=ctx.pc,
            ks_plans=tuple(ctx.ks_plans),
            rescale_plans=tuple(ctx.rescale_plans),
            auto=ctx.auto_tables() if self.use_affine else None,
        )
        if jit_ops:
            self._jit_add_ct = jax.jit(self._add_ct_impl)
            self._jit_sub_ct = jax.jit(self._sub_ct_impl)
            self._jit_add_sc = jax.jit(self._add_scalar_impl)
            self._jit_add_pt = jax.jit(self._add_pt)
            self._jit_sub_pt = jax.jit(self._sub_pt)
            self._jit_negate = jax.jit(self._negate_impl)
            self._jit_mult_ct = jax.jit(self._mult_ct_impl)
            self._jit_mult_sc = jax.jit(self._mult_scalar_impl)
            self._jit_mult_pt = jax.jit(self._mult_plain_impl)
            self._jit_square = jax.jit(self._square_impl)
            self._jit_rescale = jax.jit(self._rescale_full)
            self._jit_rot = jax.jit(self._automorphism_impl)
            self._jit_rot_pre = jax.jit(self._rotate_precompute_impl)
            self._jit_rot_hoist = jax.jit(self._rotate_hoisted_impl)
            self._jit_combo = jax.jit(self._combo_impl)
            self._jit_pt_ntt = jax.jit(self._pt_ntt_impl)
            self._jit_mult_pt_perm = jax.jit(self._mult_plain_perm_impl)

    # -- trace-time helpers ------------------------------------------------

    def _q_count(self) -> int:
        return self.ctx.num_q

    def _active(self, dev: DevState, level: int):
        Ll = self.ctx.limbs_at(level)
        return _tab_slice(dev.tables, 0, Ll), _pc_slice(dev.pc, 0, Ll)

    def _special(self, dev: DevState):
        lo = self.ctx.num_q
        hi = lo + self.ctx.num_sp
        return _tab_slice(dev.tables, lo, hi), _pc_slice(dev.pc, lo, hi)

    def _target(self, dev: DevState, level: int):
        ta, pa = self._active(dev, level)
        ts, ps = self._special(dev)
        return _tab_concat(ta, ts), _pc_concat(pa, ps)

    def _scalar_limbs(self, c: float, level: int, scale: float) -> jnp.ndarray:
        m = int(np.rint(np.float64(c) * scale))
        Ll = self.ctx.limbs_at(level)
        out = np.array([m % p for p in self.ctx.q_primes[:Ll]], dtype=np.uint64)
        return jnp.asarray(out.astype(np.uint32)[:, None])

    def _pt_ntt_impl(self, res, dev: DevState):
        """Plaintext residues [L, n] coeff -> eval domain (device NTT)."""
        L = res.shape[0]
        t = _tab_slice(dev.tables, 0, L)
        return nttm.ntt(res, t)

    # -- plaintext construction (host side) --------------------------------

    def make_plaintext(self, values, level: int, sdeg: int = 1,
                       slots: int | None = None) -> Plaintext:
        """MakeCKKSPackedPlaintext parity (explicit level/slots args).

        Two-tier memo: the host-side encode (embedding FFT + CRT + host NTT)
        is always cached; the device Plaintext is cached ONLY when its array
        is a concrete jax.Array.  Under a jit/eval_shape trace `jnp.asarray`
        can yield a tracer, and caching that leaks it into later traces
        (the round-1 MULTICHIP dryrun failure mode)."""
        ctx = self.ctx
        values = np.asarray(values)
        values = values.astype(
            np.complex128 if np.iscomplexobj(values) else np.float64
        )
        s = slots if slots is not None else len(values)
        # hash the payload: a raw tobytes key holds the full vector (1 MB
        # at ring 2^17) in BOTH cache dicts forever
        import hashlib

        vh = hashlib.sha1(values.tobytes()).digest()
        key = (vh, values.dtype.char, level, sdeg, s)
        hit = self._pt_cache.get(key)
        if hit is not None:
            self._pt_cache.move_to_end(key)
            return hit
        host = self._pt_host_cache.get(key)
        if host is None:
            scale = ctx.scale(level, sdeg)
            coeffs = encode_coeffs(values, ctx.params.ring_n, scale, slots=s)
            Ll = ctx.limbs_at(level)
            res = coeffs_to_residues(coeffs, ctx.q_primes[:Ll])
            if self.jit_ops:
                # device-side NTT: at ring 2^17 the 68-limb host butterfly
                # costs seconds per plaintext; the TPU does it in sub-ms.
                # (jit_ops=False paths run under an outer jit where a
                # device NTT would embed a per-constant subgraph - those
                # keep the host path.)
                host = res.astype(np.uint32)
            else:
                host = _host_ntt_all(ctx, res, range(Ll)).astype(np.uint32)
            self._pt_host_cache[key] = host
            self._pt_host_used += host.nbytes
            # byte-bound the HOST tier too: 1024 entries x ~60 MB
            # full-chain ring-2^17 encodes = 61 GB - the host OOM (130 GB
            # RSS, SIGKILL) that killed the first honest-security k-way
            # run mid-sort
            while (len(self._pt_host_cache) > self._pt_cache_entries
                   or self._pt_host_used > self._pt_host_cache_bytes):
                _, old = self._pt_host_cache.popitem(last=False)
                self._pt_host_used -= old.nbytes
        else:
            self._pt_host_cache.move_to_end(key)
        if self.jit_ops:
            arr = self._jit_pt_ntt(jnp.asarray(host), self._dev)
        else:
            arr = jnp.asarray(host)
        pt = Plaintext(arr, level, sdeg, s)
        if not isinstance(arr, jax.core.Tracer):
            self._pt_cache[key] = pt
            self._pt_cache_used += host.nbytes
            while (len(self._pt_cache) > self._pt_cache_entries
                   or self._pt_cache_used > self._pt_cache_bytes):
                _, old = self._pt_cache.popitem(last=False)
                self._pt_cache_used -= old.data.nbytes
        return pt

    # -- add / sub / neg ---------------------------------------------------

    def _align_add(self, a: Ciphertext, b: Ciphertext, dev: DevState):
        if a.level != b.level:
            if a.level < b.level:
                a = self._adjust_level_impl(a, b.level, dev)
            else:
                b = self._adjust_level_impl(b, a.level, dev)
        if a.sdeg != b.sdeg:
            if a.sdeg == 1:
                a = self._to_sdeg2(a, dev)
            else:
                b = self._to_sdeg2(b, dev)
        return a, b

    def _add_ct_impl(self, a, b, dev):
        a, b = self._align_add(a, b, dev)
        _, pc = self._active(dev, a.level)
        return a.with_data(add_mod(a.data, b.data, pc.p[None]))

    def _sub_ct_impl(self, a, b, dev):
        a, b = self._align_add(a, b, dev)
        _, pc = self._active(dev, a.level)
        return a.with_data(sub_mod(a.data, b.data, pc.p[None]))

    def _add_pt(self, a: Ciphertext, b: Plaintext, dev):
        assert b.level == a.level and b.sdeg == a.sdeg, "pt/ct mismatch"
        _, pc = self._active(dev, a.level)
        d0 = add_mod(a.data[0], b.data, pc.p)
        return a.with_data(jnp.stack([d0, a.data[1]]))

    def _sub_pt(self, a: Ciphertext, b: Plaintext, dev):
        assert b.level == a.level and b.sdeg == a.sdeg
        _, pc = self._active(dev, a.level)
        d0 = sub_mod(a.data[0], b.data, pc.p)
        return a.with_data(jnp.stack([d0, a.data[1]]))

    def _add_scalar_impl(self, a: Ciphertext, sc, dev):
        _, pc = self._active(dev, a.level)
        d0 = add_mod(a.data[0], sc, pc.p)
        return a.with_data(jnp.stack([d0, a.data[1]]))

    def _negate_impl(self, a: Ciphertext, dev):
        _, pc = self._active(dev, a.level)
        return a.with_data(neg_mod(a.data, pc.p[None]))

    def add(self, a: Ciphertext, b) -> Ciphertext:
        self.op_stats[("add", a.level)] += 1
        if isinstance(b, Ciphertext):
            f = self._jit_add_ct if self.jit_ops else self._add_ct_impl
            return f(a, b, self._dev)
        if isinstance(b, Plaintext):
            f = self._jit_add_pt if self.jit_ops else self._add_pt
            return f(a, b, self._dev)
        sc = self._scalar_limbs(float(b), a.level, self.ctx.scale(a.level, a.sdeg))
        f = self._jit_add_sc if self.jit_ops else self._add_scalar_impl
        return f(a, sc, self._dev)

    def sub(self, a: Ciphertext, b) -> Ciphertext:
        self.op_stats[("add", a.level)] += 1
        if isinstance(b, Ciphertext):
            f = self._jit_sub_ct if self.jit_ops else self._sub_ct_impl
            return f(a, b, self._dev)
        if isinstance(b, Plaintext):
            f = self._jit_sub_pt if self.jit_ops else self._sub_pt
            return f(a, b, self._dev)
        return self.add(a, -float(b))

    def rsub(self, b, a: Ciphertext) -> Ciphertext:
        """scalar/plaintext minus ciphertext."""
        return self.add(self.negate(a), b)

    def negate(self, a: Ciphertext) -> Ciphertext:
        f = self._jit_negate if self.jit_ops else self._negate_impl
        return f(a, self._dev)

    # -- level / scale adjustment -----------------------------------------

    def _drop_limbs(self, a: Ciphertext, target_level: int) -> Ciphertext:
        """Raw limb drop: declared level changes, TRUE scale does not.
        Internal only - callers must have arranged the scales to match."""
        Lt = self.ctx.limbs_at(target_level)
        return Ciphertext(a.data[:, :Lt], target_level, a.sdeg, a.slots)

    def level_reduce(self, a: Ciphertext, target_level: int) -> Ciphertext:
        """Descend to target_level preserving the declared-scale invariant.

        Under FLEXIBLEAUTO, scale_dec(l) drifts with the prime chain, so a
        raw limb drop leaves the value at the SOURCE level's scale while
        the declared level says otherwise - a silent multiplicative error
        of scale_dec(src)/scale_dec(dst) on everything downstream (the
        flat 0.13%/0.84% "noise floor" of the ring 2^13/2^14 bootstrap
        rows was exactly this, from the test harness's level_reduce; the
        bootstrap itself was precise to ~2e-7).  When the scales differ,
        route through adjust_level's exact scalar fold."""
        assert target_level >= a.level
        if (a.sdeg == 1 and self.ctx.scale_dec(target_level)
                == self.ctx.scale_dec(a.level)):
            return self._drop_limbs(a, target_level)
        return self.adjust_level(a, target_level)

    def _adjust_level_impl(self, a: Ciphertext, target_level: int,
                           dev: DevState) -> Ciphertext:
        if a.level == target_level:
            return a
        if a.sdeg == 2:
            a = self._rescale_impl(a, dev)
            if a.level == target_level:
                return a
            if a.level > target_level:
                raise ValueError("cannot adjust downwards")
        ctx = self.ctx
        la = a.level
        t = float(ctx.scale_dec(target_level) * ctx.drop_prime(la)
                  / ctx.scale_dec(la))
        sc = self._scalar_limbs(1.0, la, t)
        _, pc = self._active(dev, la)
        a = a.with_data(_mul_scalar_limbs(a.data, sc, pc))
        a = Ciphertext(a.data, la, 2, a.slots)
        a = self._rescale_data(a, dev)
        a = Ciphertext(a.data, a.level, 1, a.slots)
        # raw drop: the t-fold above already landed the TRUE scale at
        # scale_dec(target_level)
        return self._drop_limbs(a, target_level)

    def adjust_level(self, a: Ciphertext, target_level: int) -> Ciphertext:
        return self._adjust_level_impl(a, target_level, self._dev)

    def _to_sdeg2(self, a: Ciphertext, dev: DevState | None = None) -> Ciphertext:
        dev = dev or self._dev
        sc = self._scalar_limbs(1.0, a.level, self.ctx.scale(a.level, 1))
        _, pc = self._active(dev, a.level)
        return Ciphertext(_mul_scalar_limbs(a.data, sc, pc), a.level, 2, a.slots)

    def align_group(self, cts):
        """Common (level, sdeg) for a group (for batch-axis stacking)."""
        lvl = max(c.level for c in cts)
        out = [self.adjust_level(c, lvl) if c.level < lvl else c for c in cts]
        lvl = max(c.level for c in out)
        out = [self.adjust_level(c, lvl) if c.level < lvl else c for c in out]
        if len({c.sdeg for c in out}) > 1:
            out = [self._to_sdeg2(c) if c.sdeg == 1 else c for c in out]
        return out

    # -- rescale -----------------------------------------------------------

    def _rescale_data(self, a: Ciphertext, dev: DevState) -> Ciphertext:
        ctx = self.ctx
        lvl = a.level
        if lvl >= ctx.params.mult_depth:
            raise RuntimeError(
                f"multiplicative depth exhausted (level {lvl} == mult_depth "
                f"{ctx.params.mult_depth}); deepen parameters or bootstrap"
            )
        comp = ctx.params.comp
        data = a.data
        for j in range(comp):
            Ll = ctx.limbs_at(lvl) - j
            plan = dev.rescale_plans[lvl * comp + j]
            t_last = _tab_slice(dev.tables, Ll - 1, Ll)
            t_rest = _tab_slice(dev.tables, 0, Ll - 1)
            pc_rest = _pc_slice(dev.pc, 0, Ll - 1)

            x = nttm.intt(data[:, Ll - 1 :, :], t_last)  # [2,1,n] coeff
            xm = reduce_u32(x, pc_rest.p[None], pc_rest.p_inv32[None])
            t = jnp.where(
                x >= plan.qlast_half,
                sub_mod(xm, plan.qlast_mod_qi[None], pc_rest.p[None]),
                xm,
            )
            t_eval = nttm.ntt(t, t_rest)
            num = sub_mod(data[:, : Ll - 1, :], t_eval, pc_rest.p[None])
            data = shoup_mulmod(num, plan.qlast_inv[None],
                                plan.qlast_inv_shoup[None], pc_rest.p[None])
        return Ciphertext(data, lvl + 1, a.sdeg, a.slots)

    def _rescale_impl(self, a: Ciphertext, dev: DevState) -> Ciphertext:
        assert a.sdeg == 2, "rescale only from scale degree 2"
        out = self._rescale_data(a, dev)
        return Ciphertext(out.data, out.level, 1, out.slots)

    def _rescale_full(self, a: Ciphertext, dev: DevState) -> Ciphertext:
        return self._rescale_impl(a, dev)

    def rescale(self, a: Ciphertext) -> Ciphertext:
        self.op_stats[("rescale", a.level)] += 1
        f = self._jit_rescale if self.jit_ops else self._rescale_full
        return f(a, self._dev)

    # -- multiplication ----------------------------------------------------

    def _adjust_for_mult(self, a: Ciphertext, dev: DevState):
        if a.sdeg == 2:
            a = self._rescale_impl(a, dev)
        return a

    def mult(self, a: Ciphertext, b) -> Ciphertext:
        if isinstance(b, Ciphertext):
            le = max(a.level + (a.sdeg == 2), b.level + (b.sdeg == 2))
            self.op_stats[("mult_ct", le)] += 1
            f = self._jit_mult_ct if self.jit_ops else self._mult_ct_impl
            return f(a, b, self.keys.relin, self._dev)
        if isinstance(b, Plaintext):
            if a.sdeg == 2:
                a = self.rescale(a)
            self.op_stats[("mult_pt", a.level)] += 1
            f = self._jit_mult_pt if self.jit_ops else self._mult_plain_impl
            return f(a, b, self._dev)
        # scalar: pre-rescale on the host side so the residues match
        if a.sdeg == 2:
            a = self.rescale(a)
        self.op_stats[("mult_pt", a.level)] += 1
        sc = self._scalar_limbs(float(b), a.level, self.ctx.scale(a.level, 1))
        f = self._jit_mult_sc if self.jit_ops else self._mult_scalar_impl
        return f(a, sc, self._dev)

    def _mult_scalar_impl(self, a: Ciphertext, sc, dev) -> Ciphertext:
        _, pc = self._active(dev, a.level)
        return Ciphertext(_mul_scalar_limbs(a.data, sc, pc), a.level, 2, a.slots)

    def _mult_plain_impl(self, a: Ciphertext, pt: Plaintext, dev) -> Ciphertext:
        assert pt.level == a.level and pt.sdeg == 1, (
            f"plaintext at level {pt.level}/deg {pt.sdeg}, ct at {a.level}"
        )
        _, pc = self._active(dev, a.level)
        d = barrett_mulmod(a.data, pt.data[None], pc.p[None], pc.r2_32[None],
                           pc.r2_32_shoup[None], pc.p_inv32[None])
        return Ciphertext(d, a.level, 2, a.slots)

    def _mult_plain_perm_impl(self, a: Ciphertext, pt: Plaintext, perm,
                              dev) -> Ciphertext:
        """ct x sigma_g(pt): the plaintext is slot-rotated ON DEVICE by the
        galois automorphism (no key switch - plaintexts are not encrypted)."""
        _, pc = self._active(dev, a.level)
        rolled = self._apply_auto(pt.data, perm, a.level, dev)
        d = barrett_mulmod(a.data, rolled[None], pc.p[None],
                           pc.r2_32[None], pc.r2_32_shoup[None],
                           pc.p_inv32[None])
        return Ciphertext(d, a.level, 2, a.slots)

    def mult_plain_at(self, a: Ciphertext, values,
                      roll: int = 0) -> Ciphertext:
        """Encode `values` at a's (post-rescale) level and multiply.

        `roll`: multiply by np.roll(values, roll) WITHOUT encoding the
        rolled copy - the roll is a plaintext automorphism applied on
        device.  The mask families of the BSGS sorts are all rolls of one
        base block, so this collapses O(num_batch * P) mask encodes +
        uploads (4.6 GB per N=128 sort through the host link) into ONE."""
        if a.sdeg == 2:
            a = self.rescale(a)
        pt = self.make_plaintext(values, a.level, 1, slots=a.slots)
        if roll % (self.ctx.params.ring_n // 2) == 0:
            return self.mult(a, pt)
        # np.roll(v, s) = slot left-rotation by -s
        g = self.ctx.galois_element_rot(-roll)
        if self.use_affine:
            from .auto_affine import AffineAutoConsts

            perm = self.ctx.galois_affine(g)
            if self._trace_token is not None:
                # keep the matmuls in-graph (same reason as the gather
                # token below: a concrete pt x concrete consts chain would
                # constant-fold into one materialized mask per roll)
                tok = self._trace_token.astype(jnp.int8)
                perm = AffineAutoConsts(row=perm.row + tok,
                                        lam=perm.lam + tok,
                                        hot_a=perm.hot_a + tok)
        else:
            perm = self.ctx.galois_perm(g)
            if self._trace_token is not None:
                perm = perm + self._trace_token  # keep the gather in-graph
        self.op_stats[("mult_pt", a.level)] += 1
        f = (self._jit_mult_pt_perm if self.jit_ops
             else self._mult_plain_perm_impl)
        return f(a, pt, perm, self._dev)

    def _mult_ct_impl(self, a, b, relin: KeySwitchKey, dev) -> Ciphertext:
        a = self._adjust_for_mult(a, dev)
        b = self._adjust_for_mult(b, dev)
        if a.level < b.level:
            a = self._adjust_level_impl(a, b.level, dev)
        elif b.level < a.level:
            b = self._adjust_level_impl(b, a.level, dev)
        _, pc = self._active(dev, a.level)
        mm = lambda x, y: barrett_mulmod(
            x, y, pc.p, pc.r2_32, pc.r2_32_shoup, pc.p_inv32)
        a0, a1 = a.data[0], a.data[1]
        b0, b1 = b.data[0], b.data[1]
        d0 = mm(a0, b0)
        d1 = add_mod(mm(a0, b1), mm(a1, b0), pc.p)
        d2 = mm(a1, b1)
        e0, e1 = self._keyswitch_core(d2, a.level, relin, dev)
        return Ciphertext(
            jnp.stack([add_mod(d0, e0, pc.p), add_mod(d1, e1, pc.p)]),
            a.level, 2, a.slots,
        )

    def _square_impl(self, a, relin: KeySwitchKey, dev) -> Ciphertext:
        a = self._adjust_for_mult(a, dev)
        _, pc = self._active(dev, a.level)
        mm = lambda x, y: barrett_mulmod(
            x, y, pc.p, pc.r2_32, pc.r2_32_shoup, pc.p_inv32)
        a0, a1 = a.data[0], a.data[1]
        d0 = mm(a0, a0)
        cross = mm(a0, a1)
        d1 = add_mod(cross, cross, pc.p)
        d2 = mm(a1, a1)
        e0, e1 = self._keyswitch_core(d2, a.level, relin, dev)
        return Ciphertext(
            jnp.stack([add_mod(d0, e0, pc.p), add_mod(d1, e1, pc.p)]),
            a.level, 2, a.slots,
        )

    def square(self, a: Ciphertext) -> Ciphertext:
        self.op_stats[("mult_ct", a.level + (a.sdeg == 2))] += 1
        f = self._jit_square if self.jit_ops else self._square_impl
        return f(a, self.keys.relin, self._dev)

    # -- key switching -----------------------------------------------------

    def _modup(self, d_limb: jnp.ndarray, level: int, dev: DevState):
        """Hybrid ModUp: [Ll, n] eval -> stacked per-digit extended
        [D, T, n] eval.

        The CRT base extension runs as an MXU digit matmul
        (ntt_mxu.mod_matmul_digits): out[t] = sum_i fac[i,t] y[i] mod p_t.
        The digit loop is a `lax.scan` over zero-padded uniform digit blocks
        (one compiled body regardless of digit count)."""
        from .ntt_mxu import _balanced_digits_dev, mod_matmul_digits

        plan = dev.ks_plans[level]
        t_active, pc_a = self._active(dev, level)
        t_target, pc_t = self._target(dev, level)
        d_coeff = nttm.intt(d_limb[None], t_active)[0]
        y = shoup_mulmod(d_coeff, plan.dhat_inv, plan.dhat_inv_shoup, pc_a.p)
        D, alpha = plan.dig_ext_dT.shape[0], plan.alpha
        n = y.shape[-1]
        ypad = jnp.pad(y, ((0, D * alpha - y.shape[0]), (0, 0)))
        yblocks = ypad.reshape(D, alpha, n)

        def body(carry, xs):
            yd, ext = xs
            acc = mod_matmul_digits(ext, _balanced_digits_dev(yd),
                                    pc_t.p, pc_t.sh256)
            return carry, nttm.ntt(acc, t_target)

        _, out = jax.lax.scan(body, None, (yblocks, plan.dig_ext_dT))
        return out

    def _ksk_rows(self, ksk: KeySwitchKey, level: int):
        """Slice KSK limbs to the target basis (active Q + specials)."""
        Ll = self.ctx.limbs_at(level)
        lo = self.ctx.num_q
        hi = lo + self.ctx.num_sp
        kb = jnp.concatenate([ksk.kb[:, :Ll], ksk.kb[:, lo:hi]], axis=1)
        ka = jnp.concatenate([ksk.ka[:, :Ll], ksk.ka[:, lo:hi]], axis=1)
        return kb, ka

    def _inner_product(self, digits, level: int, ksk: KeySwitchKey,
                       dev: DevState):
        """digits: stacked [D, T, n].  One batched mulmod per key half,
        then a log-free modular fold over the (small) digit axis."""
        _, pc_t = self._target(dev, level)
        kb, ka = self._ksk_rows(ksk, level)
        D = digits.shape[0]
        t0 = barrett_mulmod(digits, kb[:D], pc_t.p[None], pc_t.r2_32[None],
                            pc_t.r2_32_shoup[None], pc_t.p_inv32[None])
        t1 = barrett_mulmod(digits, ka[:D], pc_t.p[None], pc_t.r2_32[None],
                            pc_t.r2_32_shoup[None], pc_t.p_inv32[None])
        acc0, acc1 = t0[0], t1[0]
        for j in range(1, D):
            acc0 = add_mod(acc0, t0[j], pc_t.p)
            acc1 = add_mod(acc1, t1[j], pc_t.p)
        return acc0, acc1

    def _moddown(self, c: jnp.ndarray, level: int, dev: DevState) -> jnp.ndarray:
        """Exact division by P.  c: [..., Ll+K, n] -> [..., Ll, n]; leading
        axes are merged into the coefficient axis around the CRT matmul so
        one graph serves both key-switch halves."""
        from .ntt_mxu import _balanced_digits_dev, mod_matmul_digits

        ctx = self.ctx
        plan = dev.ks_plans[level]
        Ll = ctx.limbs_at(level)
        t_active, pc_a = self._active(dev, level)
        t_sp, pc_sp = self._special(dev)
        cq = c[..., :Ll, :]
        cp = c[..., Ll:, :]
        cp_coeff = nttm.intt(cp, t_sp)
        y = shoup_mulmod(cp_coeff, plan.phat_inv, plan.phat_inv_shoup, pc_sp.p)
        *lead, K, n = y.shape
        y2 = jnp.moveaxis(y, -2, 0).reshape(K, -1)
        acc = mod_matmul_digits(plan.pext_dT, _balanced_digits_dev(y2),
                                pc_a.p, pc_a.sh256)
        acc = jnp.moveaxis(acc.reshape(Ll, *lead, n), 0, -2)
        ext_eval = nttm.ntt(acc, t_active)
        num = sub_mod(cq, ext_eval, pc_a.p)
        return shoup_mulmod(num, plan.p_inv_mod_qi, plan.p_inv_mod_qi_shoup,
                            pc_a.p)

    def _keyswitch_core(self, d_limb, level: int, ksk: KeySwitchKey,
                        dev: DevState):
        digits = self._modup(d_limb, level, dev)
        acc0, acc1 = self._inner_product(digits, level, ksk, dev)
        e = self._moddown(jnp.stack([acc0, acc1]), level, dev)
        return e[0], e[1]

    # -- rotations ---------------------------------------------------------

    def _apply_auto(self, data, aff, level: int, dev: DevState,
                    target: bool = False):
        """sigma_g on eval-domain planes: structured matmuls when `aff` is
        the affine-consts pytree, gather otherwise.  `target`: the data
        lives on the extended (active Q + specials) basis."""
        from .auto_affine import AffineAutoConsts, apply_affine

        if isinstance(aff, AffineAutoConsts):
            Ll = self.ctx.limbs_at(level)
            if target:
                lo, hi = self.ctx.num_q, self.ctx.num_q + self.ctx.num_sp
                tq = dev.auto.slice(0, Ll)
                tsp = dev.auto.slice(lo, hi)
                dq = apply_affine(data[..., :Ll, :], aff, tq)
                dsp = apply_affine(data[..., Ll:, :], aff, tsp)
                return jnp.concatenate([dq, dsp], axis=-2)
            return apply_affine(data, aff, dev.auto.slice(0, Ll))
        return data[..., aff]

    def _automorphism_impl(self, a: Ciphertext, perm, ksk: KeySwitchKey,
                           dev: DevState) -> Ciphertext:
        d = self._apply_auto(a.data, perm, a.level, dev)
        e0, e1 = self._keyswitch_core(d[1], a.level, ksk, dev)
        _, pc = self._active(dev, a.level)
        c0 = add_mod(d[0], e0, pc.p)
        return Ciphertext(jnp.stack([c0, e1]), a.level, a.sdeg, a.slots)

    def _rot_args(self, g: int):
        assert g in self.keys.rot, f"missing rotation key for galois {g}"
        aff = (self.ctx.galois_affine(g) if self.use_affine
               else self.ctx.galois_perm(g))
        return aff, self.keys.rot[g]

    def rotate(self, a: Ciphertext, r: int) -> Ciphertext:
        """Left slot-rotation by r (EvalRotate parity; negative = right)."""
        nh = self.ctx.params.ring_n // 2
        if r % nh == 0:
            return a
        self.op_stats[("rot", a.level)] += 1
        perm, ksk = self._rot_args(self.ctx.galois_element_rot(r))
        f = self._jit_rot if self.jit_ops else self._automorphism_impl
        return f(a, perm, ksk, self._dev)

    def conjugate(self, a: Ciphertext) -> Ciphertext:
        self.op_stats[("rot", a.level)] += 1
        perm, ksk = self._rot_args(2 * self.ctx.params.ring_n - 1)
        f = self._jit_rot if self.jit_ops else self._automorphism_impl
        return f(a, perm, ksk, self._dev)

    def _rotate_precompute_impl(self, a: Ciphertext, dev: DevState):
        return self._modup(a.data[1], a.level, dev)

    def rotate_precompute(self, a: Ciphertext):
        """Hoisted ModUp of c1 (EvalFastRotationPrecompute parity)."""
        self.op_stats[("rot_pre", a.level)] += 1
        f = self._jit_rot_pre if self.jit_ops else self._rotate_precompute_impl
        return f(a, self._dev)

    def _rotate_hoisted_impl(self, a: Ciphertext, pre, perm,
                             ksk: KeySwitchKey, dev: DevState) -> Ciphertext:
        """sigma_g(ModUp(x)) = ModUp(sigma_g(x)) up to gadget-annihilated
        extension noise, so the permutation applies to the extended digits."""
        digits = self._apply_auto(pre, perm, a.level, dev, target=True)
        acc0, acc1 = self._inner_product(digits, a.level, ksk, dev)
        e0 = self._moddown(acc0, a.level, dev)
        e1 = self._moddown(acc1, a.level, dev)
        _, pc = self._active(dev, a.level)
        c0 = add_mod(self._apply_auto(a.data[0], perm, a.level, dev),
                     e0, pc.p)
        return Ciphertext(jnp.stack([c0, e1]), a.level, a.sdeg, a.slots)

    def rotate_hoisted(self, a: Ciphertext, pre, r: int) -> Ciphertext:
        nh = self.ctx.params.ring_n // 2
        if r % nh == 0:
            return a
        self.op_stats[("rot_hoisted", a.level)] += 1
        perm, ksk = self._rot_args(self.ctx.galois_element_rot(r))
        f = self._jit_rot_hoist if self.jit_ops else self._rotate_hoisted_impl
        return f(a, pre, perm, ksk, self._dev)

    # -- batched linear combinations ---------------------------------------

    def _combo_impl(self, stacked, coeff_res, const_res, dev):
        """out[r] = sum_b coeff[r,b] * ct[b] (+ const[r]), all mod q_i.

        stacked  [B, 2, L, n] u32  - B ciphertexts at one (level, sdeg=1)
        coeff_res [L, R, B]   u32  - per-limb scalar residues (traced, so
                                     distinct coefficient sets share a compile)
        const_res [R, L, 1]   u32  - additive constants at scale(level, 2)

        Lowered as ONE per-limb modular matmul [R,B] @ [B,2n] on the MXU
        (ntt_mxu._mm_mod digit planes) instead of R*B scalar-mult dispatches -
        this is what keeps Paterson-Stockmeyer's giant-step segment evaluation
        (ops/chebyshev.py) from dominating dispatch and HBM at large N.
        """
        from .ntt_mxu import _balanced_digits_dev, _mm_mod

        B, two, L, n = stacked.shape
        level = (self.ctx.num_q - L) // self.ctx.params.comp
        _, pc = self._active(dev, level)
        x = jnp.moveaxis(stacked, 2, 0).reshape(L, B, two * n)
        out = _mm_mod(_balanced_digits_dev(coeff_res),
                      _balanced_digits_dev(x),
                      pc.p[:, :, None], pc.sh256[:, :, None])
        out = jnp.moveaxis(out.reshape(L, -1, two, n), 0, 2)   # [R, 2, L, n]
        d0 = add_mod(out[:, 0], const_res, pc.p[None])
        return jnp.stack([d0, out[:, 1]], axis=1)

    def combo(self, cts, rows, consts) -> list:
        """Batched Sum_b rows[r][b]*cts[b] + consts[r] -> R ciphertexts.

        cts are aligned to a common (level, sdeg=1) first (costing the same
        depth the old per-term path consumed); outputs are sdeg 2.
        """
        assert len(cts) >= 1
        tgt = max(c.level + (1 if c.sdeg == 2 else 0) for c in cts)
        aligned = []
        for c in cts:
            if c.sdeg == 2:
                c = self.rescale(c)
            if c.level < tgt:
                c = self.adjust_level(c, tgt)
            aligned.append(c)
        lvl = tgt
        Ll = self.ctx.limbs_at(lvl)
        rows = np.asarray(rows, dtype=np.float64)
        consts = np.asarray(consts, dtype=np.float64)
        R, B = rows.shape
        assert B == len(cts) and consts.shape == (R,)
        ps = np.array(self.ctx.q_primes[:Ll], dtype=object)
        s1 = self.ctx.scale(lvl, 1)
        m = np.rint(rows * s1).astype(np.int64)          # |c| small, fits
        coeff_res = (m[None, :, :] % ps[:, None, None].astype(np.int64))
        coeff_res = coeff_res.astype(np.uint32)           # [L, R, B]
        s2 = self.ctx.scale_dec(lvl) ** 2
        const_res = np.zeros((R, Ll), dtype=np.uint32)
        for r in range(R):
            if consts[r] != 0.0:
                mi = int(consts[r] * float(s2))
                for i in range(Ll):
                    const_res[r, i] = mi % int(ps[i])
        self.op_stats[("combo", lvl, B, R)] += 1
        stacked = jnp.stack([c.data for c in aligned])
        f = self._jit_combo if self.jit_ops else self._combo_impl
        out = f(stacked, jnp.asarray(coeff_res),
                jnp.asarray(const_res[:, :, None]), self._dev)
        slots = aligned[0].slots
        return [Ciphertext(out[r], lvl, 2, slots) for r in range(R)]

    # -- misc --------------------------------------------------------------

    def zeros_like(self, a: Ciphertext) -> Ciphertext:
        return a.with_data(jnp.zeros_like(a.data))

    def add_many(self, cts) -> Ciphertext:
        out = cts[0]
        for c in cts[1:]:
            out = self.add(out, c)
        return out


def _mul_scalar_limbs(data, sc, pc: PrimeConsts):
    """Multiply [k, L, n] data by per-limb scalars sc [L, 1]."""
    return barrett_mulmod(data, sc[None], pc.p[None], pc.r2_32[None],
                          pc.r2_32_shoup[None], pc.p_inv32[None])
