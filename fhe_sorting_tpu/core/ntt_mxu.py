"""Four-step negacyclic NTT on the MXU (matmul formulation).

The butterfly NTT (`core/ntt.py`) is VPU/HBM-bound: log2(n) strided stages,
each materialized through HBM, measured ~1% of v5e HBM speed-of-light.  The
TPU-native formulation decomposes n = n1*n2 and evaluates

    X[k] = sum_i x_i psi^{(2k+1) i}          (negacyclic, psi a 2n-th root)

as two *modular matrix multiplies* against constant twiddle matrices, which
map straight onto the 128x128 systolic array:

    step 1   U = W1 @ reshape(x, [n1, n2])       [n1,n1] x [n1,n2] matmul
    step 2   V = U * T                           elementwise twiddle (VPU)
    step 3   Y = V @ W2                          [n1,n2] x [n2,n2] matmul

with psi pre/post-twists, the 1/n factor, and the bit-reversed output
ordering of `core/ntt.py` all *folded into the constant matrices* (rows of
W1 and columns of W2 are permuted, psi powers multiplied in), so the result
is bit-identical to the butterfly path with zero extra passes.

Exact u32 modular matmul on the MXU: operands are decomposed into 4 balanced
signed-8-bit digit planes (d in [-128,127], value = sum d_a 256^a); the 16
digit-pair products run as s8 x s8 -> s32 MXU matmuls (each partial sum is
bounded by 128*128*max(n1,n2) < 2^24, far from s32 overflow), and the planes
are recombined mod p with a short Shoup-Horner ladder on the VPU.

Role parity: replaces the NTT OpenFHE runs under every EvalMult/EvalRotate
the reference issues (SURVEY.md section 2).  ~16x the scalar multiply count
of the butterfly, but on a unit with ~50x the throughput and ~5x less HBM
traffic.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import jax.tree_util as tree_util
import numpy as np

from . import primes as primes_mod
from .modmath import host_shoup, shoup_mulmod


def split_n(n: int) -> tuple[int, int]:
    logn = n.bit_length() - 1
    n1 = 1 << (logn // 2)
    return n1, n // n1


def _bitrev(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _pow_table(base: int, count: int, p: int) -> np.ndarray:
    """[1, b, b^2, ..., b^{count-1}] mod p, vectorized doubling build."""
    t = np.array([1], dtype=np.uint64)
    cur = base % p
    while len(t) < count:
        t = np.concatenate([t, t * np.uint64(cur) % np.uint64(p)])
        cur = cur * cur % p
    return t[:count]


def _balanced_digits_host(m: np.ndarray) -> np.ndarray:
    """u64 values < 2^31 -> [4, ...] s8 balanced digits."""
    x = m.astype(np.int64)
    out = []
    for _ in range(4):
        d = ((x + 128) % 256) - 128
        out.append(d.astype(np.int8))
        x = (x - d) >> 8
    assert not x.any(), "digit decomposition residual"
    return np.stack(out)


@dataclass(frozen=True)
class FourStepTables:
    """Per-limb constant tables; digit planes stacked on axis 0."""

    p: jnp.ndarray          # [L, 1, 1] u32
    sh256: jnp.ndarray      # [L, 1, 1] shoup(256, p)
    w1f: jnp.ndarray        # [4, L, n1, n1] s8   (rows bitrev, psi^(n2 i1) folded)
    tf: jnp.ndarray         # [L, n1, n2] u32     (omega^(rev(j1) i2) psi^(i2))
    tf_sh: jnp.ndarray
    w2f: jnp.ndarray        # [4, L, n2, n2] s8   (cols bitrev)
    w2i: jnp.ndarray        # [4, L, n2, n2] s8
    ti: jnp.ndarray         # [L, n1, n2] u32     (incl. psi^(-i2)/n)
    ti_sh: jnp.ndarray
    w1i: jnp.ndarray        # [4, L, n1, n1] s8   (psi^(-n2 i1) folded)

    def slice(self, lo: int, hi: int) -> "FourStepTables":
        return FourStepTables(
            p=self.p[lo:hi], sh256=self.sh256[lo:hi],
            w1f=self.w1f[:, lo:hi], tf=self.tf[lo:hi],
            tf_sh=self.tf_sh[lo:hi], w2f=self.w2f[:, lo:hi],
            w2i=self.w2i[:, lo:hi], ti=self.ti[lo:hi],
            ti_sh=self.ti_sh[lo:hi], w1i=self.w1i[:, lo:hi],
        )

    def concat(self, o: "FourStepTables") -> "FourStepTables":
        c = lambda a, b, ax=0: jnp.concatenate([a, b], axis=ax)
        return FourStepTables(
            p=c(self.p, o.p), sh256=c(self.sh256, o.sh256),
            w1f=c(self.w1f, o.w1f, 1), tf=c(self.tf, o.tf),
            tf_sh=c(self.tf_sh, o.tf_sh), w2f=c(self.w2f, o.w2f, 1),
            w2i=c(self.w2i, o.w2i, 1), ti=c(self.ti, o.ti),
            ti_sh=c(self.ti_sh, o.ti_sh), w1i=c(self.w1i, o.w1i, 1),
        )


tree_util.register_pytree_node(
    FourStepTables,
    lambda t: ((t.p, t.sh256, t.w1f, t.tf, t.tf_sh, t.w2f, t.w2i, t.ti,
                t.ti_sh, t.w1i), None),
    lambda aux, ch: FourStepTables(*ch),
)


def build_fs_tables(prime_list, n: int) -> FourStepTables:
    n1, n2 = split_n(n)
    # digit-group bound: S_t <= 4 * 128^2 * max(n1,n2) must stay below p for
    # the single-conditional-add renormalization, and p < 2^30 keeps the
    # balanced decomposition inside int32.
    bound = 4 * 128 * 128 * max(n1, n2)
    for p in prime_list:
        assert bound < p < 2**30, (
            f"prime {p} outside four-step NTT range (need {bound} < p < 2^30);"
            " use the butterfly path"
        )
    r1, r2 = _bitrev(n1), _bitrev(n2)
    i1 = np.arange(n1, dtype=np.int64)
    i2 = np.arange(n2, dtype=np.int64)
    L = len(prime_list)

    w1f = np.zeros((L, n1, n1), dtype=np.uint64)
    tf = np.zeros((L, n1, n2), dtype=np.uint64)
    tf_sh = np.zeros((L, n1, n2), dtype=np.uint32)
    w2f = np.zeros((L, n2, n2), dtype=np.uint64)
    w2i = np.zeros((L, n2, n2), dtype=np.uint64)
    ti = np.zeros((L, n1, n2), dtype=np.uint64)
    ti_sh = np.zeros((L, n1, n2), dtype=np.uint32)
    w1i = np.zeros((L, n1, n1), dtype=np.uint64)
    sh256 = np.zeros((L,), dtype=np.uint32)

    for li, p in enumerate(prime_list):
        psi = primes_mod.primitive_root_2n(p, n)
        w = psi * psi % p
        pw = _pow_table(w, n, p)          # omega^e, e in [0, n)
        ps = _pow_table(psi, 2 * n, p)    # psi^e,   e in [0, 2n)
        ninv = pow(n, -1, p)

        # forward
        w1f[li] = (pw[(n2 * np.outer(r1, i1)) % n]
                   * ps[(n2 * i1[None, :]) % (2 * n)]) % p
        tf[li] = (pw[np.outer(r1, i2) % n] * ps[i2[None, :] % (2 * n)]) % p
        w2f[li] = pw[(n1 * np.outer(i2, r2)) % n]
        # inverse
        w2i[li] = pw[np.mod(-n1 * np.outer(r2, i2), n)]
        ti[li] = (pw[np.mod(-np.outer(r1, i2), n)]
                  * ps[np.mod(-i2[None, :], 2 * n)]) % p * np.uint64(ninv) % p
        w1i[li] = (pw[np.mod(-n2 * np.outer(i1, r1), n)]
                   * ps[np.mod(-n2 * i1[:, None], 2 * n)]) % p

        tf_sh[li] = host_shoup(tf[li], p)
        ti_sh[li] = host_shoup(ti[li], p)
        sh256[li] = host_shoup(np.uint64(256), p)

    pcol = np.asarray(prime_list, dtype=np.uint32)[:, None, None]
    return FourStepTables(
        p=jnp.asarray(pcol),
        sh256=jnp.asarray(sh256[:, None, None]),
        w1f=jnp.asarray(_balanced_digits_host(w1f)),
        tf=jnp.asarray(tf.astype(np.uint32)),
        tf_sh=jnp.asarray(tf_sh),
        w2f=jnp.asarray(_balanced_digits_host(w2f)),
        w2i=jnp.asarray(_balanced_digits_host(w2i)),
        ti=jnp.asarray(ti.astype(np.uint32)),
        ti_sh=jnp.asarray(ti_sh),
        w1i=jnp.asarray(_balanced_digits_host(w1i)),
    )


# ---------------------------------------------------------------------------
# Device path
# ---------------------------------------------------------------------------


def _balanced_digits_dev(x: jnp.ndarray) -> jnp.ndarray:
    """u32 canonical (< 2^31) -> [4, ...] s8 balanced digits."""
    v = x.astype(jnp.int32)
    outs = []
    for _ in range(4):
        b = v & 0xFF
        d = b - jnp.where(b >= 128, 256, 0)
        outs.append(d.astype(jnp.int8))
        v = (v - d) >> 8
    return jnp.stack(outs)


def _recombine(groups, p, sh256) -> jnp.ndarray:
    """Fold 7 digit-weight group sums (s32, each in (-p, p)) into
    sum_t S_t 256^t mod p via a Shoup-Horner ladder."""

    def to_mod(s):
        return jnp.where(s < 0, s + p.astype(jnp.int32), s).astype(jnp.uint32)

    acc = to_mod(groups[6])
    for t in range(5, -1, -1):
        acc = shoup_mulmod(acc, jnp.uint32(256), sh256, p)
        st = to_mod(groups[t])
        u = acc + st
        acc = jnp.where(u >= p, u - p, u)
    return acc


def _mm_mod(dA: jnp.ndarray, dB: jnp.ndarray, p, sh256) -> jnp.ndarray:
    """out[l,i,j] = sum_k A[l,i,k] B[l,k,j] mod p from digit planes [4,L,.,.].

    Partials |P| <= 128*128*K < 2^24, so each digit-weight group S_t already
    lies in (-p, p) and one conditional add renormalizes before the Horner
    fold by 256.
    """
    dn = (((2,), (1,)), ((0,), (0,)))
    groups: list = [None] * 7
    for a in range(4):
        for b in range(4):
            pp = jax.lax.dot_general(dA[a], dB[b], dn,
                                     preferred_element_type=jnp.int32)
            t = a + b
            groups[t] = pp if groups[t] is None else groups[t] + pp
    return _recombine(groups, p, sh256)


def mod_matmul_digits(dA: jnp.ndarray, dB: jnp.ndarray, p_col,
                      sh256_col) -> jnp.ndarray:
    """out[i, j] = sum_k A[i,k] B[k,j] mod p_i (per-ROW modulus).

    dA [4, m, k] s8 (host-precomputed constants, e.g. CRT base-extension
    factors per target prime), dB [4, k, n] s8 (device data digits),
    p_col/sh256_col [m, 1].  This is the MXU form of the hybrid key-switch
    ModUp/ModDown extensions (each output limb is an independent inner
    product over the source limbs).
    """
    dn = (((1,), (0,)), ((), ()))
    groups: list = [None] * 7
    for a in range(4):
        for b in range(4):
            pp = jax.lax.dot_general(dA[a], dB[b], dn,
                                     preferred_element_type=jnp.int32)
            t = a + b
            groups[t] = pp if groups[t] is None else groups[t] + pp
    return _recombine(groups, p_col, sh256_col)


def _ntt_one(x: jnp.ndarray, t: FourStepTables, inverse: bool) -> jnp.ndarray:
    """x: [L, n] -> [L, n] (coeff -> bitrev eval, or the inverse)."""
    L, n = x.shape
    n1 = t.w1f.shape[-1]
    xm = x.reshape(L, n1, n // n1)
    if not inverse:
        u = _mm_mod(t.w1f, _balanced_digits_dev(xm), t.p, t.sh256)
        v = shoup_mulmod(u, t.tf, t.tf_sh, t.p)
        y = _mm_mod(_balanced_digits_dev(v), t.w2f, t.p, t.sh256)
        return y.reshape(L, n)
    s = _mm_mod(_balanced_digits_dev(xm), t.w2i, t.p, t.sh256)
    s2 = shoup_mulmod(s, t.ti, t.ti_sh, t.p)
    out = _mm_mod(t.w1i, _balanced_digits_dev(s2), t.p, t.sh256)
    return out.reshape(L, n)


def _pallas_route(n: int, n1: int) -> bool:
    from . import pallas_fs_ntt

    return pallas_fs_ntt.use_pallas_fs() and pallas_fs_ntt.supported(n, n1)


def ntt_fs(a: jnp.ndarray, t: FourStepTables) -> jnp.ndarray:
    """Forward negacyclic NTT, [..., L, n] coeff -> bitrev eval (matches
    core/ntt.py `ntt` bit-exactly).  Routes to the fused Pallas kernel on
    TPU for MXU-tileable rings."""
    *lead, L, n = a.shape
    n1 = t.w1f.shape[-1]
    if _pallas_route(n, n1):
        from .pallas_fs_ntt import ntt_fs_pallas

        return ntt_fs_pallas(a, t)
    a2 = a.reshape(-1, L, n)
    out = jax.vmap(lambda x: _ntt_one(x, t, False))(a2)
    return out.reshape(*lead, L, n)


def intt_fs(a: jnp.ndarray, t: FourStepTables) -> jnp.ndarray:
    """Inverse NTT, [..., L, n] bitrev eval -> coeff order."""
    *lead, L, n = a.shape
    n1 = t.w1f.shape[-1]
    if _pallas_route(n, n1):
        from .pallas_fs_ntt import intt_fs_pallas

        return intt_fs_pallas(a, t)
    a2 = a.reshape(-1, L, n)
    out = jax.vmap(lambda x: _ntt_one(x, t, True))(a2)
    return out.reshape(*lead, L, n)
