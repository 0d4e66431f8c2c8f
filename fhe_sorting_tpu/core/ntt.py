"""Negacyclic number-theoretic transform over u32 limb planes.

The forward transform (Cooley-Tukey, natural -> bit-reversed) and inverse
(Gentleman-Sande, bit-reversed -> natural) follow the classic merged-twiddle
formulation: the 2n-th root psi is folded into the twiddle tables so no
separate pre/post twisting pass is needed.  Ciphertext polynomials live in
the bit-reversed evaluation domain between operations; only rescale and
key-switch base extension round-trip through the coefficient domain.

Data layout: [..., num_limbs, n] u32, one prime per limb plane.  Twiddle
tables are per-limb ([num_limbs, n]) with Shoup precomputation, so a single
call transforms every limb of a polynomial at once - the XLA fallback path
vectorizes over limbs on the VPU, and the Pallas kernel (ops in
`fhe_sorting_tpu/core/pallas_ntt.py`) grids over limbs with the whole limb
resident in VMEM.

Role parity: this is the TPU-native equivalent of the NTT OpenFHE runs under
every EvalMult/EvalRotate the reference issues (SURVEY.md section 2,
"native components -> TPU equivalents").
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from . import primes as primes_mod
from .modmath import add_mod, host_shoup, shoup_mulmod, sub_mod


def bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@dataclass(frozen=True)
class NttTables:
    """Device-side twiddle tables for a set of primes (one limb plane each).

    The `cg_*` stacks are the per-stage twiddle vectors of the
    constant-geometry (Pease) formulation: every butterfly stage pairs
    (i, i + n/2) -> (2i, 2i+1), so one `lax.scan` body covers all log2(n)
    stages (the unrolled loop made every key-switch HLO graph ~16x larger,
    which dominated XLA compile time).  Stage s of the forward transform
    multiplies lane i by psi_rev[2^s + (i mod 2^s)]; after all stages the
    output is exactly the usual bit-reversed evaluation order (the stage
    permutation is a one-bit rotation whose log2(n)-fold composition is the
    identity).
    """

    p: jnp.ndarray            # [L, 1] u32 (pre-shaped for broadcast over n)
    psi_rev: jnp.ndarray      # [L, n]
    psi_rev_shoup: jnp.ndarray
    ipsi_rev: jnp.ndarray     # [L, n]
    ipsi_rev_shoup: jnp.ndarray
    n_inv: jnp.ndarray        # [L, 1]
    n_inv_shoup: jnp.ndarray  # [L, 1]
    cg_psi: jnp.ndarray       # [logn, L, n/2] forward stage twiddles
    cg_psi_shoup: jnp.ndarray
    cg_ipsi: jnp.ndarray      # [logn, L, n/2] inverse stage twiddles
    cg_ipsi_shoup: jnp.ndarray  # (stage axis ordered s = logn-1 .. 0)

    def tree_flatten(self):
        return (
            (self.p, self.psi_rev, self.psi_rev_shoup, self.ipsi_rev,
             self.ipsi_rev_shoup, self.n_inv, self.n_inv_shoup,
             self.cg_psi, self.cg_psi_shoup, self.cg_ipsi,
             self.cg_ipsi_shoup),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def slice(self, lo: int, hi: int) -> "NttTables":
        return NttTables(
            p=self.p[lo:hi], psi_rev=self.psi_rev[lo:hi],
            psi_rev_shoup=self.psi_rev_shoup[lo:hi],
            ipsi_rev=self.ipsi_rev[lo:hi],
            ipsi_rev_shoup=self.ipsi_rev_shoup[lo:hi],
            n_inv=self.n_inv[lo:hi], n_inv_shoup=self.n_inv_shoup[lo:hi],
            cg_psi=self.cg_psi[:, lo:hi],
            cg_psi_shoup=self.cg_psi_shoup[:, lo:hi],
            cg_ipsi=self.cg_ipsi[:, lo:hi],
            cg_ipsi_shoup=self.cg_ipsi_shoup[:, lo:hi],
        )

    def concat(self, o: "NttTables") -> "NttTables":
        c = lambda x, y: jnp.concatenate([x, y], axis=0)
        c1 = lambda x, y: jnp.concatenate([x, y], axis=1)
        return NttTables(
            p=c(self.p, o.p), psi_rev=c(self.psi_rev, o.psi_rev),
            psi_rev_shoup=c(self.psi_rev_shoup, o.psi_rev_shoup),
            ipsi_rev=c(self.ipsi_rev, o.ipsi_rev),
            ipsi_rev_shoup=c(self.ipsi_rev_shoup, o.ipsi_rev_shoup),
            n_inv=c(self.n_inv, o.n_inv),
            n_inv_shoup=c(self.n_inv_shoup, o.n_inv_shoup),
            cg_psi=c1(self.cg_psi, o.cg_psi),
            cg_psi_shoup=c1(self.cg_psi_shoup, o.cg_psi_shoup),
            cg_ipsi=c1(self.cg_ipsi, o.cg_ipsi),
            cg_ipsi_shoup=c1(self.cg_ipsi_shoup, o.cg_ipsi_shoup),
        )


import jax.tree_util as _tree_util  # noqa: E402

_tree_util.register_pytree_node(
    NttTables, NttTables.tree_flatten, NttTables.tree_unflatten
)


def build_host_tables(prime_list, n: int):
    """Numpy twiddle tables; also used by the host-side keygen NTT."""
    rev = bit_reverse_indices(n)
    L = len(prime_list)
    psi_rev = np.zeros((L, n), dtype=np.uint64)
    ipsi_rev = np.zeros((L, n), dtype=np.uint64)
    n_inv = np.zeros((L,), dtype=np.uint64)
    for li, p in enumerate(prime_list):
        psi = primes_mod.primitive_root_2n(p, n)
        ipsi = pow(psi, -1, p)
        pows = np.zeros(n, dtype=np.uint64)
        ipows = np.zeros(n, dtype=np.uint64)
        acc = 1
        iacc = 1
        for i in range(n):
            pows[i] = acc
            ipows[i] = iacc
            acc = acc * psi % p
            iacc = iacc * ipsi % p
        psi_rev[li] = pows[rev]
        ipsi_rev[li] = ipows[rev]
        n_inv[li] = pow(n, -1, p)
    return psi_rev, ipsi_rev, n_inv


def _cg_stack(tab: np.ndarray, n: int) -> np.ndarray:
    """[L, n] twiddle table -> [logn, L, n/2] constant-geometry stages.

    Stage s lane i uses tab[2^s + (i mod 2^s)]: the block tab[2^s : 2^{s+1}]
    tiled across the n/2 lanes.
    """
    logn = n.bit_length() - 1
    L = tab.shape[0]
    out = np.zeros((logn, L, n // 2), dtype=tab.dtype)
    for s in range(logn):
        m = 1 << s
        out[s] = np.tile(tab[:, m : 2 * m], (1, (n // 2) // m))
    return out


def build_device_tables(prime_list, n: int) -> NttTables:
    psi_rev, ipsi_rev, n_inv = build_host_tables(prime_list, n)
    L = len(prime_list)
    psi_sh = np.zeros((L, n), dtype=np.uint32)
    ipsi_sh = np.zeros((L, n), dtype=np.uint32)
    ninv_sh = np.zeros((L,), dtype=np.uint32)
    for li, p in enumerate(prime_list):
        psi_sh[li] = host_shoup(psi_rev[li], p)
        ipsi_sh[li] = host_shoup(ipsi_rev[li], p)
        ninv_sh[li] = host_shoup(n_inv[li], p)
    pcol = np.asarray(prime_list, dtype=np.uint32)[:, None]
    psi32 = psi_rev.astype(np.uint32)
    ipsi32 = ipsi_rev.astype(np.uint32)
    # inverse stages run s = logn-1 .. 0; store them in execution order so
    # the scan reads xs[0], xs[1], ... directly
    return NttTables(
        p=jnp.asarray(pcol),
        psi_rev=jnp.asarray(psi32),
        psi_rev_shoup=jnp.asarray(psi_sh),
        ipsi_rev=jnp.asarray(ipsi32),
        ipsi_rev_shoup=jnp.asarray(ipsi_sh),
        n_inv=jnp.asarray(n_inv.astype(np.uint32)[:, None]),
        n_inv_shoup=jnp.asarray(ninv_sh[:, None]),
        cg_psi=jnp.asarray(_cg_stack(psi32, n)),
        cg_psi_shoup=jnp.asarray(_cg_stack(psi_sh, n)),
        cg_ipsi=jnp.asarray(_cg_stack(ipsi32, n)[::-1].copy()),
        cg_ipsi_shoup=jnp.asarray(_cg_stack(ipsi_sh, n)[::-1].copy()),
    )


def _limb_slice(tables: NttTables, limb_idx) -> NttTables:
    """Tables restricted to a subset of limb planes (list/array of indices)."""
    idx = np.asarray(limb_idx)
    return NttTables(
        p=tables.p[idx],
        psi_rev=tables.psi_rev[idx],
        psi_rev_shoup=tables.psi_rev_shoup[idx],
        ipsi_rev=tables.ipsi_rev[idx],
        ipsi_rev_shoup=tables.ipsi_rev_shoup[idx],
        n_inv=tables.n_inv[idx],
        n_inv_shoup=tables.n_inv_shoup[idx],
        cg_psi=tables.cg_psi[:, idx],
        cg_psi_shoup=tables.cg_psi_shoup[:, idx],
        cg_ipsi=tables.cg_ipsi[:, idx],
        cg_ipsi_shoup=tables.cg_ipsi_shoup[:, idx],
    )


def ntt(a: jnp.ndarray, t) -> jnp.ndarray:
    """Forward negacyclic NTT.  a: [..., L, n] coeff order -> bitrev eval.

    Dispatches on the table type: `NttTables` runs the constant-geometry
    scan below (one compiled butterfly stage body for all log2(n) stages);
    `FourStepTables` runs the MXU matmul formulation (core/ntt_mxu.py)."""
    if not isinstance(t, NttTables):
        from .ntt_mxu import ntt_fs

        return ntt_fs(a, t)
    import jax.lax as lax

    *lead, L, n = a.shape
    h = n // 2
    p = t.p.reshape((1,) * len(lead) + (L, 1))

    def stage(x, tw):
        w, wsh = tw
        u = x[..., :h]
        v = shoup_mulmod(x[..., h:], w, wsh, p)
        y = jnp.stack([add_mod(u, v, p), sub_mod(u, v, p)], axis=-1)
        return y.reshape(*lead, L, n), None

    x, _ = lax.scan(stage, a, (t.cg_psi, t.cg_psi_shoup))
    return x


def intt(a: jnp.ndarray, t) -> jnp.ndarray:
    """Inverse NTT.  a: [..., L, n] bitrev eval order -> coeff order.

    Constant-geometry transpose of `ntt`: pairs (2i, 2i+1) -> (i, i+n/2),
    stage twiddles pre-reversed in `cg_ipsi` (execution order s = logn-1..0),
    final multiply by n^{-1}.
    """
    if not isinstance(t, NttTables):
        from .ntt_mxu import intt_fs

        return intt_fs(a, t)
    import jax.lax as lax

    *lead, L, n = a.shape
    h = n // 2
    p = t.p.reshape((1,) * len(lead) + (L, 1))

    def stage(x, tw):
        w, wsh = tw
        z = x.reshape(*lead, L, h, 2)
        u = z[..., 0]
        v = z[..., 1]
        s0 = add_mod(u, v, p)
        s1 = shoup_mulmod(sub_mod(u, v, p), w, wsh, p)
        return jnp.concatenate([s0, s1], axis=-1), None

    x, _ = lax.scan(stage, a, (t.cg_ipsi, t.cg_ipsi_shoup))
    ninv = t.n_inv.reshape((1,) * len(lead) + (L, 1))
    ninv_sh = t.n_inv_shoup.reshape((1,) * len(lead) + (L, 1))
    return shoup_mulmod(x, ninv, ninv_sh, p)


def _ntt_unrolled(a: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    """Reference unrolled Cooley-Tukey path (test oracle for the scan form)."""
    *lead, L, n = a.shape
    logn = n.bit_length() - 1
    p = t.p.reshape((1,) * len(lead) + (L, 1, 1, 1))
    x = a
    for s in range(logn):
        m = 1 << s
        half = n >> (s + 1)
        x = x.reshape(*lead, L, m, 2, half)
        S = t.psi_rev[:, m : 2 * m].reshape((1,) * len(lead) + (L, m, 1))
        Ssh = t.psi_rev_shoup[:, m : 2 * m].reshape((1,) * len(lead) + (L, m, 1))
        u = x[..., 0, :]
        v = shoup_mulmod(x[..., 1, :], S, Ssh, p[..., 0, :])
        x = jnp.stack(
            [add_mod(u, v, p[..., 0, :]), sub_mod(u, v, p[..., 0, :])], axis=-2
        )
    return x.reshape(*lead, L, n)


def _intt_unrolled(a: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    """Reference unrolled Gentleman-Sande path (test oracle)."""
    *lead, L, n = a.shape
    logn = n.bit_length() - 1
    x = a
    for s in range(logn - 1, -1, -1):
        m = 1 << s
        half = n >> (s + 1)
        x = x.reshape(*lead, L, m, 2, half)
        S = t.ipsi_rev[:, m : 2 * m].reshape((1,) * len(lead) + (L, m, 1))
        Ssh = t.ipsi_rev_shoup[:, m : 2 * m].reshape((1,) * len(lead) + (L, m, 1))
        pb = t.p.reshape((1,) * len(lead) + (L, 1, 1))
        u = x[..., 0, :]
        v = x[..., 1, :]
        s0 = add_mod(u, v, pb)
        s1 = shoup_mulmod(sub_mod(u, v, pb), S, Ssh, pb)
        x = jnp.stack([s0, s1], axis=-2)
    x = x.reshape(*lead, L, n)
    pb = t.p.reshape((1,) * len(lead) + (L, 1))
    ninv = t.n_inv.reshape((1,) * len(lead) + (L, 1))
    ninv_sh = t.n_inv_shoup.reshape((1,) * len(lead) + (L, 1))
    return shoup_mulmod(x, ninv, ninv_sh, pb)


# ---------------------------------------------------------------------------
# Host-side (numpy uint64) transforms for keygen / encode exactness checks.
# ---------------------------------------------------------------------------


def host_ntt(a: np.ndarray, psi_rev_l: np.ndarray, p: int) -> np.ndarray:
    """Forward NTT of one limb on the host.  a: [n] u64, canonical residues."""
    from . import native

    if native.available():
        return native.ntt_batch(a[None], psi_rev_l, int(p))[0]
    n = a.shape[0]
    logn = n.bit_length() - 1
    x = a.astype(np.uint64).copy()
    P = np.uint64(p)
    for s in range(logn):
        m = 1 << s
        half = n >> (s + 1)
        x = x.reshape(m, 2, half)
        S = psi_rev_l[m : 2 * m].astype(np.uint64)[:, None]
        u = x[:, 0, :]
        v = x[:, 1, :] * S % P
        x = np.stack([(u + v) % P, (u + P - v) % P], axis=1)
    return x.reshape(n)


def host_intt(a: np.ndarray, ipsi_rev_l: np.ndarray, n_inv_l: int, p: int) -> np.ndarray:
    from . import native

    if native.available():
        return native.intt_batch(a[None], ipsi_rev_l, int(n_inv_l), int(p))[0]
    n = a.shape[0]
    logn = n.bit_length() - 1
    x = a.astype(np.uint64).copy()
    P = np.uint64(p)
    for s in range(logn - 1, -1, -1):
        m = 1 << s
        half = n >> (s + 1)
        x = x.reshape(m, 2, half)
        S = ipsi_rev_l[m : 2 * m].astype(np.uint64)[:, None]
        u = x[:, 0, :]
        v = x[:, 1, :]
        x = np.stack([(u + v) % P, (u + P - v) % P * S % P], axis=1)
    return x.reshape(n) * np.uint64(n_inv_l) % P


def host_negacyclic_mul(a: np.ndarray, b: np.ndarray, p: int) -> np.ndarray:
    """Schoolbook negacyclic product mod (x^n + 1, p) - test oracle only."""
    n = len(a)
    out = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            k = i + j
            v = int(a[i]) * int(b[j])
            if k >= n:
                out[k - n] -= v
            else:
                out[k] += v
    return np.array([int(v) % p for v in out], dtype=np.uint64)
