"""Galois automorphisms as MXU matmuls (no gathers).

The evaluator's rotation path applies sigma_g in the evaluation domain as
``data[:, :, perm]`` - a full-width gather along the minor (lane) axis,
which XLA lowers to a serialized dynamic-gather far below HBM speed of
light (the round-4 roofline: constructRank as low as 9.6% of SoL, gather-
dominated).  This module replaces the gather with structured MXU work.

Key fact: in NATURAL evaluation order (position k holds the eval at
zeta^{2k+1}), sigma_g is the affine index map

    out[k] = in[(g*k + c) mod n],   c = (g-1)/2.

On the [n1 (rows/sublanes), n2 (lanes)] four-step grid with k = k_hi*n1 +
k_lo ... more precisely with k_lo = k mod n1 on the ROW axis and
k_hi = k div n1 on the LANE axis (exactly the four-step output layout,
core/ntt_mxu.py:137-169), the map factors:

    src_lo = (g*k_lo + c) mod n1                  -> ROW permutation
    src_hi = (g*k_hi + t(k_lo)) mod n2,
      t(k_lo) = ((g*k_lo + c) - src_lo)/n1        -> LANE stride-g
                                                     + per-row lane ROLL

and the per-row roll by a(k_lo) = g^{-1} t(k_lo) mod n2 diagonalizes over
the mod-p DFT of order n2 (omega = a primitive n2-th root mod p, which
exists because n2 | n | (p-1)/2):

    roll_a = F^{-1} . diag(omega^{-r a}) . F      -> two mod matmuls
                                                     + one twiddle build.

Storage stays BIT-REVERSED (no layout change anywhere else): all constant
matrices are conjugated by the bitrev grid permutations r1/r2 at build
time, which is free.  The whole automorphism is then

    x -> R_g x          (one-hot row matmul, digit-preserving)
      -> x Lam_g        (one-hot lane matmul, digit-preserving)
      -> F_br x         (mod matmul over lanes)
      -> * T_g          (T = W @ onehot_a, one mod matmul; elementwise)
      -> F_br^{-1} x    (mod matmul over lanes, 1/n2 folded)

- exact mod-p arithmetic on s8 digit planes (same machinery as the
four-step NTT), bit-identical to the gather.  Per-g constants are three
tiny 0/1 s8 matrices passed as traced arguments, so all rotation steps at
a level still share one compiled program (the evaluator's existing
trace-token design).

Reference parity: this implements the same EvalAutomorphism the reference
gets from OpenFHE's precomputed index tables (rotation.h:193-238); the
formulation is TPU-native.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import jax.tree_util as tree_util
import numpy as np

from . import primes as primes_mod
from .modmath import barrett_mulmod, host_shoup
from .ntt_mxu import _balanced_digits_dev, _balanced_digits_host, _recombine


def _bitrev(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@dataclass(frozen=True)
class AffineAutoTables:
    """Per-limb common tables (independent of g)."""

    p: jnp.ndarray        # [L, 1, 1] u32
    sh256: jnp.ndarray    # [L, 1, 1] u32
    r2_32: jnp.ndarray    # [L, 1, 1] u32 (barrett)
    r2_32_shoup: jnp.ndarray
    p_inv32: jnp.ndarray
    fb: jnp.ndarray       # [4, L, n2, n2] s8   F_br[r, j2] = w^{r*r2(j2)}
    fib: jnp.ndarray      # [4, L, n2, n2] s8   F_br^{-1}[j2, r] (1/n2 folded)
    wneg: jnp.ndarray     # [4, L, n2, n2] s8   W[r, s] = w^{-r*s}

    def slice(self, lo: int, hi: int) -> "AffineAutoTables":
        return AffineAutoTables(
            p=self.p[lo:hi], sh256=self.sh256[lo:hi],
            r2_32=self.r2_32[lo:hi], r2_32_shoup=self.r2_32_shoup[lo:hi],
            p_inv32=self.p_inv32[lo:hi],
            fb=self.fb[:, lo:hi], fib=self.fib[:, lo:hi],
            wneg=self.wneg[:, lo:hi],
        )

    def take(self, idx) -> "AffineAutoTables":
        idx = np.asarray(idx)
        return AffineAutoTables(
            p=self.p[idx], sh256=self.sh256[idx],
            r2_32=self.r2_32[idx], r2_32_shoup=self.r2_32_shoup[idx],
            p_inv32=self.p_inv32[idx],
            fb=self.fb[:, idx], fib=self.fib[:, idx],
            wneg=self.wneg[:, idx],
        )


tree_util.register_pytree_node(
    AffineAutoTables,
    lambda t: ((t.p, t.sh256, t.r2_32, t.r2_32_shoup, t.p_inv32,
                t.fb, t.fib, t.wneg), None),
    lambda aux, ch: AffineAutoTables(*ch),
)


@dataclass(frozen=True)
class AffineAutoConsts:
    """Per-g 0/1 selector matrices (tiny; passed as traced arguments)."""

    row: jnp.ndarray      # [n1, n1] s8: out row j1 <- in row (R[j1,:] hot)
    lam: jnp.ndarray      # [n2, n2] s8: lane stride-g (in @ lam)
    hot_a: jnp.ndarray    # [n2, n1] s8: onehot_a[s, j1] = [s == a(r1(j1))]


tree_util.register_pytree_node(
    AffineAutoConsts,
    lambda t: ((t.row, t.lam, t.hot_a), None),
    lambda aux, ch: AffineAutoConsts(*ch),
)


def build_tables(prime_list, n: int, n1: int) -> AffineAutoTables:
    """Common per-limb DFT/twiddle tables over the lane axis (size n2)."""
    n2 = n // n1
    L = len(prime_list)
    r2 = _bitrev(n2)
    r = np.arange(n2, dtype=np.int64)
    fb = np.zeros((L, n2, n2), dtype=np.uint64)
    fib = np.zeros((L, n2, n2), dtype=np.uint64)
    wneg = np.zeros((L, n2, n2), dtype=np.uint64)
    sh256 = np.zeros((L,), dtype=np.uint32)
    for li, p in enumerate(prime_list):
        psi = primes_mod.primitive_root_2n(p, n)
        w = pow(int(psi), (2 * n) // n2, p)      # primitive n2-th root
        wi = pow(w, -1, p)
        n2inv = pow(n2, -1, p)
        pw = np.ones(n2, dtype=np.uint64)
        pwi = np.ones(n2, dtype=np.uint64)
        for i in range(1, n2):
            pw[i] = pw[i - 1] * np.uint64(w) % np.uint64(p)
            pwi[i] = pwi[i - 1] * np.uint64(wi) % np.uint64(p)
        # F_br[r, j2] = w^{r * r2(j2)};  Fib[j2, r] = w^{-r2(j2)*r} / n2
        fb[li] = pw[(np.outer(r, r2)) % n2]
        fib[li] = pwi[(np.outer(r2, r)) % n2] * np.uint64(n2inv) % np.uint64(p)
        # W[r, s] = w^{-r s}
        wneg[li] = pwi[(np.outer(r, r)) % n2]
        sh256[li] = host_shoup(np.uint64(256), p)
    # barrett constants for the elementwise twiddle multiply
    ps = np.asarray(prime_list, dtype=np.uint64)
    r2_32v = np.array([(1 << 32) % int(p) for p in ps], dtype=np.uint64)
    r2_sh = np.array([int(host_shoup(np.uint64(int(x)), int(p)))
                      for x, p in zip(r2_32v, ps)], dtype=np.uint32)
    p_inv32 = np.array([(1 << 32) // int(p) for p in ps],
                       dtype=np.uint64).astype(np.uint32)
    pcol = ps.astype(np.uint32)[:, None, None]
    return AffineAutoTables(
        p=jnp.asarray(pcol),
        sh256=jnp.asarray(sh256[:, None, None]),
        r2_32=jnp.asarray(r2_32v.astype(np.uint32)[:, None, None]),
        r2_32_shoup=jnp.asarray(r2_sh[:, None, None]),
        p_inv32=jnp.asarray(p_inv32[:, None, None]),
        fb=jnp.asarray(_balanced_digits_host(fb)),
        fib=jnp.asarray(_balanced_digits_host(fib)),
        wneg=jnp.asarray(_balanced_digits_host(wneg)),
    )


def build_consts(g: int, n: int, n1: int) -> AffineAutoConsts:
    """Per-g selector matrices, bitrev-conjugated."""
    n2 = n // n1
    g = g % (2 * n)
    assert g % 2 == 1
    c = ((g - 1) // 2) % n
    r1 = _bitrev(n1)
    r2 = _bitrev(n2)
    r1_inv = np.argsort(r1)
    r2_inv = np.argsort(r2)
    k_lo = r1  # k_lo at row j1
    src_lo = (g * k_lo + c) % n1
    t = (((g * k_lo + c) - src_lo) // n1) % n2
    g_inv = pow(g % n2, -1, n2) if n2 > 1 else 0
    a = (g_inv * t) % n2

    # row one-hot: out1[j1, :] = in[row_src(j1), :]
    row = np.zeros((n1, n1), dtype=np.int8)
    row[np.arange(n1), r1_inv[src_lo]] = 1
    # lane stride-g one-hot (pull): B[..., j2] = A[..., lam(j2)],
    # lam(j2) = r2^{-1}((g * r2(j2)) mod n2);  B = A @ Lam with
    # Lam[lam(j2), j2] = 1
    lam_idx = r2_inv[(g * r2) % n2]
    lam = np.zeros((n2, n2), dtype=np.int8)
    lam[lam_idx, np.arange(n2)] = 1
    # roll selector: onehot_a[s, j1] = [s == a(j1)]
    hot = np.zeros((n2, n1), dtype=np.int8)
    hot[a, np.arange(n1)] = 1
    return AffineAutoConsts(
        row=jnp.asarray(row), lam=jnp.asarray(lam), hot_a=jnp.asarray(hot))


def _onehot_rows(hot: jnp.ndarray, dig: jnp.ndarray) -> jnp.ndarray:
    """dig [4, ..., n1, n2] s8, hot [n1, n1] -> rows permuted (digits kept).

    One-hot matmul never sums two nonzero products, so digit planes stay
    valid digit planes and no modular recombination is needed.
    """
    out = jnp.einsum("rj,d...jl->d...rl", hot, dig,
                     preferred_element_type=jnp.int32)
    return out.astype(jnp.int8)


def _onehot_lanes(dig: jnp.ndarray, hot: jnp.ndarray) -> jnp.ndarray:
    """dig [4, ..., n1, n2] s8, hot [n2, n2] -> lanes permuted."""
    out = jnp.einsum("d...jl,lm->d...jm", dig, hot,
                     preferred_element_type=jnp.int32)
    return out.astype(jnp.int8)


def _mm_lane(dig: jnp.ndarray, tbl_dig: jnp.ndarray, p, sh256) -> jnp.ndarray:
    """Per-limb mod matmul over the lane axis.

    dig     [4, B, L, n1, n2] s8 (data digits)
    tbl_dig [4, L, n2_out, n2] s8 (per-limb constant matrix digits)
    returns [B, L, n1, n2_out] u32 = data @ tbl^T mod p (per limb)
    """
    groups: list = [None] * 7
    for da in range(4):
        for db in range(4):
            pp = jnp.einsum("blrk,lmk->blrm", dig[da], tbl_dig[db],
                            preferred_element_type=jnp.int32)
            tt = da + db
            groups[tt] = pp if groups[tt] is None else groups[tt] + pp
    return _recombine(groups, p[None], sh256[None])


def _twiddle(consts: AffineAutoConsts, t: AffineAutoTables) -> jnp.ndarray:
    """T[L, n1, n2freq] = (W @ onehot_a)^T per limb, u32."""
    groups: list = [None] * 7
    for da in range(4):
        pp = jnp.einsum("lrs,sj->lrj", t.wneg[da], consts.hot_a,
                        preferred_element_type=jnp.int32)
        groups[da] = pp
    for tt in range(4, 7):
        groups[tt] = jnp.zeros_like(groups[0])
    tw = _recombine(groups, t.p, t.sh256)      # [L, n2freq, n1]
    return jnp.swapaxes(tw, -1, -2)            # [L, n1, n2freq]


def apply_affine(x: jnp.ndarray, consts: AffineAutoConsts,
                 t: AffineAutoTables) -> jnp.ndarray:
    """x [..., L, n] u32 (bitrev eval order) -> sigma_g(x), bit-identical
    to x[..., perm] for perm = ctx.galois_perm(g)."""
    *lead, L, n = x.shape
    n2 = t.fb.shape[-1]
    n1 = n // n2
    B = int(np.prod(lead)) if lead else 1
    xg = x.reshape(B, L, n1, n2)
    dig = _balanced_digits_dev(xg)                       # [4, B, L, n1, n2]
    dig = _onehot_rows(consts.row, dig)
    dig = _onehot_lanes(dig, consts.lam)
    freq = _mm_lane(dig, t.fb, t.p, t.sh256)             # [B, L, n1, n2]
    tw = _twiddle(consts, t)                             # [L, n1, n2]
    freq = barrett_mulmod(freq, tw[None], t.p[None], t.r2_32[None],
                          t.r2_32_shoup[None], t.p_inv32[None])
    dig2 = _balanced_digits_dev(freq)
    out = _mm_lane(dig2, t.fib, t.p, t.sh256)
    return out.reshape(*lead, L, n)
