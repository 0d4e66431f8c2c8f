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

    def _gen_ksk(self, target_eval: np.ndarray, rng) -> KeySwitchKey:
        """target_eval: s' residues [Lq+K, n] u64 eval domain."""
        ctx = self.ctx
        n = ctx.params.ring_n
        all_p = ctx.all_primes
        Ltot = len(all_p)
        layout = ctx.digit_layout(0)  # full-chain digit partition
        dnum = len(layout)
        Q = 1
        for p in ctx.q_primes:
            Q *= p
        kb = np.zeros((dnum, Ltot, n), dtype=np.uint64)
        ka = np.zeros_like(kb)
        for j, (lo, hi) in enumerate(layout):
            D = 1
            for p in ctx.q_primes[lo:hi]:
                D *= p
            QhatD = Q // D
            g_big = ctx.P * QhatD * pow(QhatD, -1, D)
            e = np.rint(rng.normal(0, ctx.params.sigma, size=n)).astype(np.int64)
            e_eval = _host_ntt_all(ctx, coeffs_to_residues(e, all_p), range(Ltot))
            for i, p in enumerate(all_p):
                P64 = np.uint64(p)
                aij = rng.integers(0, p, size=n, dtype=np.uint64)
                ka[j, i] = aij
                gp = np.uint64(g_big % p)
                kb[j, i] = (
                    (P64 - aij) * self.s_eval[i] % P64
                    + e_eval[i]
                    + gp * target_eval[i] % P64
                ) % P64
        return KeySwitchKey(
            kb=jnp.asarray(kb.astype(np.uint32)), ka=jnp.asarray(ka.astype(np.uint32))
        )

    def gen_relin_key(self, rng=None):
        rng = rng or np.random.default_rng(1)
        self.relin = self._gen_ksk(self._s2_eval, rng)

    def gen_rotation_keys(self, steps, seed: int = 2):
        """Generate keys for the given slot-rotation steps (reference
        parity: EvalRotateKeyGen with the per-N index lists)."""
        rng = np.random.default_rng(seed)
        for r in steps:
            g = self.ctx.galois_element_rot(r)
            if g in self.rot or g == 1:
                continue
            perm = np.asarray(self.ctx.galois_perm(g))
            s_g = self.s_eval[:, perm]
            self.rot[g] = self._gen_ksk(s_g, rng)

    def gen_conj_key(self, seed: int = 3):
        g = 2 * self.ctx.params.ring_n - 1
        if g not in self.rot:
            perm = np.asarray(self.ctx.galois_perm(g))
            self.rot[g] = self._gen_ksk(self.s_eval[:, perm],
                                        np.random.default_rng(seed))

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
