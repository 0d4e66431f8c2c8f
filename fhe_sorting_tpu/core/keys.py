"""Key generation, encryption and decryption (host side, exact integers).

Equivalent of the OpenFHE KeyGen/EvalMultKeyGen/EvalRotateKeyGen/Encrypt/
Decrypt surface the reference exercises (SURVEY.md section 2).  All sampling
and big-int arithmetic happens on the host with numpy/Python ints; the
products live in the NTT evaluation domain so no host polynomial
multiplication is ever needed (pointwise per-prime products only).

Hybrid key-switch keys (dnum digits, special primes P): for digit j,
    ksk_b[j] = -a_j * s + e_j + P * (Q/D_j) * [(Q/D_j)^{-1}]_{D_j} * s'
over every prime of Q*P, with s' = s^2 (relinearisation) or sigma_g(s)
(rotation/conjugation).  See core/context.py for why the approximate
(correction-free) ModUp is exact against this gadget.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from . import ntt as nttm
from .cipher import Ciphertext
from .context import Context
from .encoding import coeffs_to_residues, encode_coeffs
from .modmath import add_mod, neg_mod, reduce_u32


def _host_ntt_all(ctx: Context, res: np.ndarray, prime_idx) -> np.ndarray:
    out = np.zeros_like(res)
    for k, gi in enumerate(prime_idx):
        out[k] = nttm.host_ntt(res[k], ctx._host_psi_rev[gi], ctx.all_primes[gi])
    return out


def _host_intt_all(ctx: Context, res: np.ndarray, prime_idx) -> np.ndarray:
    out = np.zeros_like(res)
    for k, gi in enumerate(prime_idx):
        out[k] = nttm.host_intt(
            res[k], ctx._host_ipsi_rev[gi], int(ctx._host_ninv[gi]),
            ctx.all_primes[gi],
        )
    return out


@dataclass
class KeySwitchKey:
    kb: jnp.ndarray  # [dnum, Lq+K, n] u32 eval domain
    ka: jnp.ndarray


import jax.tree_util as _tree_util  # noqa: E402

_tree_util.register_pytree_node(
    KeySwitchKey,
    lambda k: ((k.kb, k.ka), None),
    lambda aux, ch: KeySwitchKey(*ch),
)


@dataclass
class Keys:
    """Secret + public + evaluation keys.  The secret parts stay host-side;
    only evaluation keys are device arrays."""

    ctx: Context
    s_coeffs: np.ndarray            # [n] int8 ternary
    s_eval: np.ndarray              # [Lq+K, n] u64 eval residues (host)
    pk: tuple                       # (b, a) [Lq, n] u64 eval (host)
    relin: KeySwitchKey | None = None
    rot: dict = field(default_factory=dict)    # galois element -> KeySwitchKey
    _s2_eval: np.ndarray | None = None

    # -- generation -------------------------------------------------------

    @classmethod
    def generate(cls, ctx: Context, seed: int = 0) -> "Keys":
        rng = np.random.default_rng(seed)
        n = ctx.params.ring_n
        all_p = ctx.all_primes
        h = ctx.params.secret_hamming
        if h is None:
            s = rng.integers(-1, 2, size=n).astype(np.int64)  # uniform ternary
        else:
            # sparse ternary secret (bounds the q0*I term in bootstrapping)
            s = np.zeros(n, dtype=np.int64)
            pos = rng.choice(n, size=h, replace=False)
            s[pos] = rng.choice([-1, 1], size=h)
        s_res = coeffs_to_residues(s, all_p)
        s_eval = _host_ntt_all(ctx, s_res, range(len(all_p)))

        e = np.rint(rng.normal(0, ctx.params.sigma, size=n)).astype(np.int64)
        e_eval = _host_ntt_all(
            ctx, coeffs_to_residues(e, ctx.q_primes), range(ctx.num_q)
        )
        a = np.stack(
            [rng.integers(0, p, size=n, dtype=np.uint64) for p in ctx.q_primes]
        )
        b = np.zeros_like(a)
        for i, p in enumerate(ctx.q_primes):
            P = np.uint64(p)
            b[i] = ((P - a[i]) * s_eval[i] + e_eval[i]) % P
        keys = cls(ctx=ctx, s_coeffs=s.astype(np.int8), s_eval=s_eval, pk=(b, a))
        keys._s2_eval = np.stack(
            [s_eval[i] * s_eval[i] % np.uint64(p) for i, p in enumerate(all_p)]
        )
        keys.gen_relin_key(rng)
        return keys

    def _gadget_residues(self) -> np.ndarray:
        """Per-digit hybrid gadget residues [dnum, Lq+K] u32 (host bigints)."""
        ctx = self.ctx
        layout = ctx.digit_layout(0)
        Q = 1
        for p in ctx.q_primes:
            Q *= p
        out = np.zeros((len(layout), len(ctx.all_primes)), dtype=np.uint32)
        for j, (lo, hi) in enumerate(layout):
            D = 1
            for p in ctx.q_primes[lo:hi]:
                D *= p
            QhatD = Q // D
            g_big = ctx.P * QhatD * pow(QhatD, -1, D)
            out[j] = np.array(
                [g_big % p for p in ctx.all_primes], dtype=np.uint64
            ).astype(np.uint32)
        return out

    def _ksk_kernel_factory(self):
        """One jitted device program shared by every KSK generation.

        kb[j] = -a_j * s + e_j + g_j * s'  over all Q*P primes, with the
        uniform a_j drawn on-device (two u32 bit-planes combined mod p:
        statistical distance < 2^-32 from uniform) and the noise NTT'd
        on-device.  All per-key heavy lifting is pointwise [dnum, L, n]
        modmul - MXU/VPU work instead of the former host numpy loop."""
        import jax
        from .modmath import barrett_mulmod as bm

        ctx = self.ctx

        def kernel(s_dev, target_dev, gres, e_host, key, tables, pc):
            p = pc.p[None]                       # [1, Ltot, 1]
            mm = lambda x, y: bm(x, y, p, pc.r2_32[None],
                                 pc.r2_32_shoup[None], pc.p_inv32[None])
            # noise residues -> eval domain
            e = e_host[:, None, :]               # [dnum, 1, n] int32
            e_res = jnp.where(e < 0, p - (-e).astype(jnp.uint32),
                              e.astype(jnp.uint32))
            e_eval = nttm.ntt(e_res, tables)
            # uniform a mod p from two u32 planes
            dnum, Ltot = gres.shape
            n = s_dev.shape[-1]
            hi, lo = jax.random.bits(key, (2, dnum, Ltot, n), jnp.uint32)
            lo = reduce_u32(lo, p, pc.p_inv32[None])
            # 2^32 mod p == (2^32 - p) mod p == (0 - p) in u32, reduced
            two32 = reduce_u32(jnp.uint32(0) - pc.p[None], p, pc.p_inv32[None])
            a = add_mod(mm(hi, two32), lo, p)
            ka = a
            kb = add_mod(mm(neg_mod(a, p), s_dev[None]), e_eval, p)
            kb = add_mod(kb, mm(gres[:, :, None].astype(jnp.uint32),
                                target_dev[None]), p)
            return kb, ka

        return jax.jit(kernel)

    @property
    def _s_dev(self):
        if getattr(self, "_s_dev_arr", None) is None:
            self._s_dev_arr = jnp.asarray(self.s_eval.astype(np.uint32))
        return self._s_dev_arr

    def _gen_ksk(self, target_eval, rng) -> KeySwitchKey:
        """target_eval: s' residues [Lq+K, n] eval domain (u64 host array or
        u32 device array)."""
        import jax

        ctx = self.ctx
        n = ctx.params.ring_n
        Ltot = len(ctx.all_primes)
        if isinstance(target_eval, np.ndarray):
            target_dev = jnp.asarray(target_eval.astype(np.uint32))
        else:
            target_dev = target_eval
        if getattr(self, "_ksk_kernel", None) is None:
            self._ksk_kernel = self._ksk_kernel_factory()
            self._gres = jnp.asarray(self._gadget_residues())
        dnum = self._gres.shape[0]
        e = np.rint(rng.normal(0, ctx.params.sigma, size=(dnum, n))
                    ).astype(np.int32)
        key = jax.random.PRNGKey(int(rng.integers(0, 2**63)))
        tables = ctx.tables.slice(0, Ltot)
        kb, ka = self._ksk_kernel(self._s_dev, target_dev, self._gres,
                                  jnp.asarray(e), key, tables, ctx.pc)
        return KeySwitchKey(kb=kb, ka=ka)

    def gen_relin_key(self, rng=None):
        rng = rng or np.random.default_rng(1)
        self.relin = self._gen_ksk(self._s2_eval, rng)

    def gen_rotation_keys(self, steps, seed: int | None = None):
        """Generate keys for the given slot-rotation steps (reference
        parity: EvalRotateKeyGen with the per-N index lists).

        Randomness comes from ONE persistent generator across calls: reusing
        a fixed seed per call would draw the same `a` planes for different
        galois targets, and b_1 - b_2 then reveals g*(sigma_1(s)-sigma_2(s))
        - a secret-key leak.  An explicit `seed` reseeds the stream (tests
        only)."""
        if seed is not None or getattr(self, "_rot_rng", None) is None:
            self._rot_rng = np.random.default_rng(2 if seed is None else seed)
        rng = self._rot_rng
        for r in steps:
            g = self.ctx.galois_element_rot(r)
            if g in self.rot or g == 1:
                continue
            s_g = self._s_dev[:, self.ctx.galois_perm(g)]
            self.rot[g] = self._gen_ksk(s_g, rng)

    def gen_conj_key(self, seed: int = 3):
        g = 2 * self.ctx.params.ring_n - 1
        if g not in self.rot:
            s_g = self._s_dev[:, self.ctx.galois_perm(g)]
            self.rot[g] = self._gen_ksk(s_g, np.random.default_rng(seed))

    def available_rotations(self):
        return set(self.rot.keys())

    # -- encrypt / decrypt ------------------------------------------------

    def encrypt(self, values, level: int = 0, slots: int | None = None,
                seed=None) -> Ciphertext:
        ctx = self.ctx
        n = ctx.params.ring_n
        rng = np.random.default_rng(seed)
        scale = ctx.scale(level, 1)
        s = slots if slots is not None else len(values)
        coeffs = encode_coeffs(values, n, scale, slots=s)
        Ll = ctx.limbs_at(level)
        qs = ctx.q_primes[:Ll]
        m_eval = _host_ntt_all(ctx, coeffs_to_residues(coeffs, qs), range(Ll))

        v = rng.integers(-1, 2, size=n).astype(np.int64)
        e0 = np.rint(rng.normal(0, ctx.params.sigma, size=n)).astype(np.int64)
        e1 = np.rint(rng.normal(0, ctx.params.sigma, size=n)).astype(np.int64)
        v_eval = _host_ntt_all(ctx, coeffs_to_residues(v, qs), range(Ll))
        e0_eval = _host_ntt_all(ctx, coeffs_to_residues(e0, qs), range(Ll))
        e1_eval = _host_ntt_all(ctx, coeffs_to_residues(e1, qs), range(Ll))

        pkb, pka = self.pk
        c0 = np.zeros((Ll, n), dtype=np.uint64)
        c1 = np.zeros((Ll, n), dtype=np.uint64)
        for i, p in enumerate(qs):
            P64 = np.uint64(p)
            c0[i] = (pkb[i] * v_eval[i] + e0_eval[i] + m_eval[i]) % P64
            c1[i] = (pka[i] * v_eval[i] + e1_eval[i]) % P64
        data = np.stack([c0, c1]).astype(np.uint32)
        return Ciphertext(jnp.asarray(data), level=level, sdeg=1, slots=s)

    def decrypt(self, ct: Ciphertext, num_values: int | None = None) -> np.ndarray:
        from .encoding import crt_to_float_centered, decode_coeffs

        ctx = self.ctx
        Ll = ct.num_limbs
        qs = ctx.q_primes[:Ll]
        data = np.asarray(ct.data, dtype=np.uint64)
        m_eval = np.zeros((Ll, ctx.params.ring_n), dtype=np.uint64)
        for i, p in enumerate(qs):
            P64 = np.uint64(p)
            m_eval[i] = (data[0, i] + data[1, i] * self.s_eval[i]) % P64
        m_coeff = _host_intt_all(ctx, m_eval, range(Ll))
        vals = crt_to_float_centered(m_coeff, qs)
        scale = ctx.scale(ct.level, ct.sdeg)
        out = decode_coeffs(vals, ctx.params.ring_n, scale, ct.slots)
        if num_values is not None:
            out = out[:num_values]
        return out.real

    def decrypt_complex(self, ct: Ciphertext,
                        num_values: int | None = None) -> np.ndarray:
        from .encoding import crt_to_float_centered, decode_coeffs

        ctx = self.ctx
        Ll = ct.num_limbs
        qs = ctx.q_primes[:Ll]
        data = np.asarray(ct.data, dtype=np.uint64)
        m_eval = np.zeros((Ll, ctx.params.ring_n), dtype=np.uint64)
        for i, p in enumerate(qs):
            P64 = np.uint64(p)
            m_eval[i] = (data[0, i] + data[1, i] * self.s_eval[i]) % P64
        m_coeff = _host_intt_all(ctx, m_eval, range(Ll))
        vals = crt_to_float_centered(m_coeff, qs)
        scale = ctx.scale(ct.level, ct.sdeg)
        out = decode_coeffs(vals, ctx.params.ring_n, scale, ct.slots)
        return out[:num_values] if num_values is not None else out
