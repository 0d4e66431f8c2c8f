"""RNS-CKKS crypto context: parameter registry + device precompute tables.

This is the TPU-native replacement for OpenFHE's `CryptoContext<DCRTPoly>`
that the reference builds in every test (e.g.
/root/reference/tests/DirectSortTest.cpp:24-43).  Differences by design:

  * The modulus chain is built from u32 NTT primes (< 2^31) because the TPU
    VPU has no 64-bit integer datapath.  Instead of one 60-bit first modulus,
    decryption headroom comes from *reserving extra base limbs*: a ciphertext
    at the deepest level still holds `base_limbs` primes (~2^56 of modulus for
    the default 2 x 28-bit), so slot values up to ~2^26 decrypt correctly
    (ranks go up to N = 2048, cf. constructRank in sort_algo.h:368-506).

  * Scale management follows OpenFHE's FLEXIBLEAUTO discipline: there is one
    canonical scale per (level, scale-degree) and every ciphertext sits
    exactly on it, so additions never need fudging.  The canonical scale
    recursion s_{l+1} = s_l^2 / q_l is numerically unstable in f64 (error
    doubles per level), so it is evaluated with 120-digit Decimal arithmetic
    at context-build time and only rounded to f64 at encode time.

  * The scaling primes are chosen *sequentially* so that the prime dropped at
    level l is the closest available NTT prime to s_l^2 / Delta, keeping every
    canonical scale within ~2^-9 of Delta.

  * Key switching is hybrid (HPS-style) with `dnum` digits and approximate
    (integer-only, correction-free) ModUp/ModDown: the u*D extension error is
    annihilated mod Q*P by the P*(Q/D_j) gadget factor, and the ModDown
    extension error adds only O(#special primes) of additive noise.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from decimal import Decimal, getcontext
from typing import Optional

import jax
import jax.numpy as jnp
import jax.tree_util as tree_util
import numpy as np

from . import ntt as nttm
from . import primes as primes_mod
from .modmath import host_shoup

getcontext().prec = 120


@dataclass(frozen=True)
class CkksParams:
    """Declarative parameter set (replaces the reference's per-N switch
    statements, sort_algo.h:87-205, with data)."""

    ring_n: int                  # ring dimension (polynomial degree)
    mult_depth: int              # usable multiplicative depth
    scale_bits: int = 28         # log2 of the target scaling factor Delta
    comp: int = 1                # primes per level (composite scaling):
    #   the TPU datapath caps primes below 2^31, so a reference-grade scale
    #   (40..59 bits, kway_adapter.h:52-54) is reached by dropping `comp`
    #   u32 primes per rescale whose product tracks Delta = 2^scale_bits.
    #   comp=2 with scale_bits=56 gives ~2^-42 relative noise per level vs
    #   ~2^-14 for the single-prime 28-bit chain - required for deep sorts.
    special_bits: int = 30       # bit size of key-switch special primes
    dnum: int = 3                # hybrid key-switch digit count
    base_limbs: int = 2          # limbs reserved below the last rescale
    sigma: float = 3.2           # error std-dev
    ksk_shoup: bool = False      # store Shoup tables for KSK limbs (2x mem)
    secret_hamming: int | None = None  # sparse ternary secret (bootstrapping)
    ntt_impl: str = "auto"       # "auto" | "butterfly" | "mxu" (four-step)
    first_mod_bits: int | None = None  # bottom-prime size (OpenFHE
    #   FirstModSize counterpart, kway_adapter.h:52): a q0 well above Delta
    #   lets full-range messages ModRaise without a pre-scale (bootstrap on
    #   level-exhausted ciphertexts) and shrinks the EvalMod argument
    #   m*Delta/q0.  Max 30 on the u32 chain (31 breaks lazy reduction).

    def __post_init__(self):
        assert self.scale_bits % self.comp == 0, (self.scale_bits, self.comp)
        assert self.scale_bits // self.comp < 31, "per-prime size must be u32"

    @property
    def prime_bits(self) -> int:  # per-prime size of the scaling chain
        return self.scale_bits // self.comp

    @property
    def num_q(self) -> int:      # limbs of a fresh ciphertext
        return self.comp * self.mult_depth + self.base_limbs

    @property
    def max_slots(self) -> int:
        return self.ring_n // 2


def _choose_prime_chain(params: CkksParams):
    """Pick scaling primes so canonical scales stay glued to 2^scale_bits.

    Returns (q_primes ordered limb 0..Lq-1, canonical scales as Decimal per
    level 0..mult_depth).  Limb Lq-1 is dropped first (level 0 rescale).
    With composite scaling (comp > 1) each level drops `comp` primes whose
    *product* is glued to s_l^2 / Delta: the first comp-1 sit near
    2^prime_bits and the last absorbs the remainder.
    """
    n, m = params.ring_n, 2 * params.ring_n
    delta = Decimal(2) ** params.scale_bits
    unit = Decimal(2) ** params.prime_bits

    # Candidate pool around 2^prime_bits (both sides).  Big rings (2^17) have
    # only a few hundred u32 NTT primes total, so stop expanding once both
    # directions are exhausted and only require enough for the chain itself.
    pool = []
    want = params.num_q + 4 * params.comp * params.mult_depth + 64
    center_k = (1 << params.prime_bits) // m
    k_lo, k_hi = center_k, center_k + 1
    while len(pool) < want:
        lo_dead = k_lo <= 0
        hi_dead = k_hi * m + 1 >= 2**31
        if lo_dead and hi_dead:
            break
        for k in (k_lo, k_hi):
            cand = k * m + 1
            if m < cand < 2**31 and primes_mod.is_prime(cand):
                pool.append(cand)
        k_lo -= 1
        k_hi += 1
    if len(pool) < params.num_q + 8:
        raise ValueError(
            f"prime pool exhausted: {len(pool)} primes = 1 mod {m} "
            f"near 2^{params.prime_bits}, need {params.num_q}"
        )
    pool = sorted(set(pool))

    used = set()

    def take_nearest(target: Decimal) -> int:
        best = min((p for p in pool if p not in used), key=lambda p: abs(Decimal(p) - target))
        used.add(best)
        return best

    scales = [delta]
    drop_order = []  # tuple of comp primes dropped at level l
    for _ in range(params.mult_depth):
        s = scales[-1]
        target = s * s / delta
        lvl_primes = []
        prod = Decimal(1)
        for j in range(params.comp - 1):
            q = take_nearest(unit)
            lvl_primes.append(q)
            prod *= q
        q = take_nearest(target / prod)
        lvl_primes.append(q)
        prod *= q
        drop_order.append(tuple(lvl_primes))
        scales.append(s * s / prod)

    base = [take_nearest(unit) for _ in range(params.base_limbs)]
    if params.first_mod_bits is not None:
        # replace the bottom `comp` limbs with NTT primes near
        # 2^first_mod_bits (scan downward; the around-Delta pool never
        # reaches this size).  All `comp` bottom limbs are enlarged because
        # the bootstrap's ModRaise base q0 is their PRODUCT: at comp=2 this
        # gives q0/Delta = 2^(comp*fmb - scale_bits) = 16 at fmb=30, so
        # [0,1] messages sit at m/q0 <= 1/16 (asin residual < 1e-5) with NO
        # message pre-scaling (which would cost levels the lazy-bootstrap
        # callers do not have).  Capped at 30: primes within a bit of 2^31
        # break the u32 lazy-reduction headroom in modmath (empirically:
        # decrypt blows up at fmb=31).
        assert params.first_mod_bits <= 30, (
            "first_mod_bits > 30 exceeds the u32 chain's headroom")
        k = (1 << params.first_mod_bits) // m
        found = []
        while k > 0 and len(found) < params.comp:
            cand = k * m + 1
            if cand < 2**31 and cand not in used and primes_mod.is_prime(cand):
                found.append(cand)
                used.add(cand)
            k -= 1
        assert len(found) == params.comp, \
            "not enough NTT primes near 2^first_mod_bits"
        base[: params.comp] = found
    # limb order: base primes at the bottom, then scaling primes such that
    # the *last* limb is dropped first (within a level, in lvl_primes order:
    # the level's first-listed prime occupies the outermost limb).
    flat = [q for lvl in drop_order for q in lvl]
    q_primes = base + list(reversed(flat))
    return q_primes, scales


@dataclass(frozen=True)
class PrimeConsts:
    """Per-limb constants, stacked [L, 1] for broadcast over coefficients."""

    p: jnp.ndarray
    r2_32: jnp.ndarray
    r2_32_shoup: jnp.ndarray
    p_inv32: jnp.ndarray
    sh256: jnp.ndarray           # shoup(256, p) for digit-matmul recombines

    def slice(self, idx) -> "PrimeConsts":
        idx = np.asarray(idx)
        return PrimeConsts(
            self.p[idx], self.r2_32[idx], self.r2_32_shoup[idx],
            self.p_inv32[idx], self.sh256[idx],
        )


tree_util.register_pytree_node(
    PrimeConsts,
    lambda c: ((c.p, c.r2_32, c.r2_32_shoup, c.p_inv32, c.sh256), None),
    lambda aux, ch: PrimeConsts(*ch),
)


def _prime_consts(prime_list) -> PrimeConsts:
    ps = np.asarray(prime_list, dtype=np.uint64)
    r2 = (np.uint64(1 << 32) % ps).astype(np.uint64)
    return PrimeConsts(
        p=jnp.asarray(ps.astype(np.uint32)[:, None]),
        r2_32=jnp.asarray(r2.astype(np.uint32)[:, None]),
        r2_32_shoup=jnp.asarray(
            np.stack([host_shoup(r2[i], int(ps[i])) for i in range(len(ps))])[:, None]
        ),
        p_inv32=jnp.asarray(
            ((np.uint64(1) << np.uint64(32)) // ps).astype(np.uint32)[:, None]
        ),
        sh256=jnp.asarray(
            np.stack([host_shoup(np.uint64(256), int(p)) for p in ps])[:, None]
        ),
    )


@dataclass(frozen=True)
class RescalePlan:
    """Tables to divide by the level-l dropped prime (exact rounding)."""

    qlast_mod_qi: jnp.ndarray        # [Ll-1, 1]
    qlast_inv: jnp.ndarray           # [Ll-1, 1] q_drop^{-1} mod q_i
    qlast_inv_shoup: jnp.ndarray
    qlast_half: jnp.ndarray          # scalar u32


tree_util.register_pytree_node(
    RescalePlan,
    lambda c: ((c.qlast_mod_qi, c.qlast_inv,
                c.qlast_inv_shoup, c.qlast_half), None),
    lambda aux, ch: RescalePlan(*ch),
)


@dataclass(frozen=True)
class KeySwitchPlan:
    """Everything key switching needs at a fixed ciphertext level.

    ModUp runs as ONE `lax.scan` over the hybrid digits (keeping the
    compiled graph a single digit body instead of dnum unrolled copies):
    the per-limb (D'_j/q_i)^{-1} factors are stored as one [Ll, 1] vector
    applied before the scan, and the per-digit CRT base-extension factor
    matrices are zero-padded to a uniform [D, 4, T, alpha] stack (the MXU
    digit-matmul form, cf. core/ntt_mxu.py: out[t] = sum_i fac[i,t] y[i]
    mod p_t; padded source limbs contribute 0).
    """

    alpha: int                       # static: limbs per digit (last padded)
    target_idx: tuple                # static global prime indices (Q_l + P)
    dhat_inv: jnp.ndarray            # [Ll, 1] per-limb (D'_j/q_i)^{-1} mod q_i
    dhat_inv_shoup: jnp.ndarray
    dig_ext_dT: jnp.ndarray          # [D, 4, T, alpha] s8 digit planes
    # ModDown (divide by P) tables:
    phat_inv: jnp.ndarray            # [K, 1]
    phat_inv_shoup: jnp.ndarray
    pext_dT: jnp.ndarray             # [4, Ll, K] s8 digit planes
    p_inv_mod_qi: jnp.ndarray        # [Ll, 1]
    p_inv_mod_qi_shoup: jnp.ndarray


tree_util.register_pytree_node(
    KeySwitchPlan,
    lambda c: ((c.dhat_inv, c.dhat_inv_shoup, c.dig_ext_dT,
                c.phat_inv, c.phat_inv_shoup, c.pext_dT,
                c.p_inv_mod_qi, c.p_inv_mod_qi_shoup),
               (c.alpha, c.target_idx)),
    lambda aux, ch: KeySwitchPlan(aux[0], aux[1], *ch),
)


class Context:
    """Host object bundling parameters, prime chain and device tables.

    Device-array members form a pytree (see `device_tree`) that algorithm
    programs take as a jit argument; the Python-side members (primes, scales,
    galois cache) are static trace-time data.
    """

    def __init__(self, params: CkksParams):
        self.params = params
        self.q_primes, self._scales_dec = _choose_prime_chain(params)
        sp_pool_skip = 0
        self.sp_primes = list(
            primes_mod.ntt_primes(
                params.ring_n, params.special_bits,
                # enough special primes to cover the largest digit
                -(-params.num_q // params.dnum),
                skip=sp_pool_skip,
                exclude=tuple(self.q_primes),
            )
        )
        assert not (set(self.sp_primes) & set(self.q_primes))
        self.all_primes = list(self.q_primes) + list(self.sp_primes)
        self.num_q = len(self.q_primes)
        self.num_sp = len(self.sp_primes)
        self.P = 1
        for p in self.sp_primes:
            self.P *= p

        n = params.ring_n
        import os

        impl = os.environ.get("FHE_NTT", params.ntt_impl)
        if impl == "auto":
            # the MXU four-step path wins on TPU for rings big enough that
            # the matmuls tile the systolic array AND the fused Pallas kernel
            # applies (n1, n2 multiples of 128, i.e. ring >= 2^15).  For
            # mid-size rings the XLA-lowered four-step graph compile-bombs
            # inside key-switch (hundreds of sub-128 s8 dots), so the
            # butterfly stays the default there and on CPU.
            import jax

            from .pallas_fs_ntt import supported as _fs_ok
            from .ntt_mxu import split_n as _split_n

            impl = ("mxu" if jax.default_backend() == "tpu"
                    and _fs_ok(n, _split_n(n)[0]) else "butterfly")
        self.ntt_impl = impl
        if impl == "mxu":
            from . import ntt_mxu

            self.tables = ntt_mxu.build_fs_tables(tuple(self.all_primes), n)
        else:
            self.tables = nttm.build_device_tables(tuple(self.all_primes), n)
        self.pc = _prime_consts(self.all_primes)
        self._host_psi_rev, self._host_ipsi_rev, self._host_ninv = (
            nttm.build_host_tables(tuple(self.all_primes), n)
        )

        # canonical scales: scale(level, sdeg) = scales[level]^sdeg
        self._scales_f64 = [float(s) for s in self._scales_dec]

        # one plan per dropped limb: plan[d] divides a (num_q - d)-limb
        # ciphertext by its last limb; a level-l rescale chains plans
        # [l*comp, (l+1)*comp)
        self.rescale_plans = [
            self._build_rescale_plan(d)
            for d in range(params.comp * params.mult_depth)
        ]
        self.ks_plans = [self._build_ks_plan(l) for l in range(params.mult_depth + 1)]

        # evaluation-point exponent bookkeeping for automorphisms
        self._root_exp = self._compute_root_exponents()
        self._exp_pos = {int(e): i for i, e in enumerate(self._root_exp)}
        self._galois_perm_cache = {}
        # structured (gather-free) automorphism tables, built lazily on
        # first use (core/auto_affine.py)
        self._auto_tables = None
        self._galois_affine_cache = {}

    # -- structured automorphism ------------------------------------------

    def auto_tables(self):
        """Per-limb mod-DFT tables for the affine automorphism path
        (core/auto_affine.py); built once, lazily."""
        if self._auto_tables is None:
            from . import auto_affine
            from .ntt_mxu import split_n

            n = self.params.ring_n
            self._auto_tables = auto_affine.build_tables(
                tuple(self.all_primes), n, split_n(n)[0])
        return self._auto_tables

    def galois_affine(self, g: int):
        """Per-g selector matrices for the affine automorphism path."""
        if g not in self._galois_affine_cache:
            from . import auto_affine
            from .ntt_mxu import split_n

            n = self.params.ring_n
            consts = auto_affine.build_consts(g, n, split_n(n)[0])
            if isinstance(consts.row, jax.core.Tracer):
                # under a trace jnp.asarray yields tracers; caching them
                # would leak into later traces (same guard as galois_perm)
                return consts
            self._galois_affine_cache[g] = consts
        return self._galois_affine_cache[g]

    # -- scale bookkeeping ------------------------------------------------

    def scale(self, level: int, sdeg: int) -> float:
        s = self._scales_dec[level]
        return float(s ** sdeg)

    def scale_dec(self, level: int) -> Decimal:
        return self._scales_dec[level]

    def drop_primes(self, level: int) -> tuple:
        """The comp primes removed by the rescale performed *at* `level`."""
        c = self.params.comp
        hi = self.num_q - c * level
        return tuple(self.q_primes[hi - c : hi])

    def drop_prime(self, level: int) -> int:
        """Product of the primes removed by the level-`level` rescale."""
        out = 1
        for p in self.drop_primes(level):
            out *= p
        return out

    def limbs_at(self, level: int) -> int:
        return self.num_q - self.params.comp * level

    # -- rescale precompute ----------------------------------------------

    def _build_rescale_plan(self, drop_idx: int) -> RescalePlan:
        Ll = self.num_q - drop_idx
        q_last = self.q_primes[Ll - 1]
        rest = self.q_primes[: Ll - 1]
        qmod = np.array([q_last % p for p in rest], dtype=np.uint64)
        qinv = np.array([pow(q_last, -1, p) for p in rest], dtype=np.uint64)
        return RescalePlan(
            qlast_mod_qi=jnp.asarray(qmod.astype(np.uint32)[:, None]),
            qlast_inv=jnp.asarray(qinv.astype(np.uint32)[:, None]),
            qlast_inv_shoup=jnp.asarray(
                np.stack([host_shoup(qinv[i], rest[i]) for i in range(len(rest))])[:, None]
            ),
            qlast_half=jnp.uint32((q_last + 1) // 2),
        )

    # -- key-switch precompute -------------------------------------------

    def digit_layout(self, level: int):
        """Static digit partition of the active limbs at `level`."""
        Ll = self.limbs_at(level)
        alpha = -(-self.num_q // self.params.dnum)
        out = []
        lo = 0
        while lo < Ll:
            hi = min(lo + alpha, Ll)
            out.append((lo, hi))
            lo = hi
        return out

    def _build_ks_plan(self, level: int) -> KeySwitchPlan:
        Ll = self.limbs_at(level)
        active = self.q_primes[:Ll]
        target_primes = active + self.sp_primes
        target_idx = tuple(range(Ll)) + tuple(
            range(self.num_q, self.num_q + self.num_sp)
        )
        from .ntt_mxu import _balanced_digits_host

        alpha = -(-self.num_q // self.params.dnum)
        dhat_inv_all = np.zeros((Ll,), dtype=np.uint64)
        dhat_inv_sh = np.zeros((Ll,), dtype=np.uint32)
        ext_stack = []
        for (lo, hi) in self.digit_layout(level):
            dp = active[lo:hi]
            D = 1
            for p in dp:
                D *= p
            dhat = [D // p for p in dp]
            for i in range(len(dp)):
                inv = pow(dhat[i], -1, dp[i])
                dhat_inv_all[lo + i] = inv
                dhat_inv_sh[lo + i] = host_shoup(np.uint64(inv), dp[i])
            ext = np.zeros((alpha, len(target_primes)), dtype=np.uint64)
            for i in range(len(dp)):
                for t, pt in enumerate(target_primes):
                    ext[i, t] = dhat[i] % pt
            # digit-matmul bound: the recombination's group sums must stay
            # below every target prime (cf. ntt_mxu._mm_mod)
            assert 4 * 128 * 128 * len(dp) < min(target_primes)
            ext_stack.append(_balanced_digits_host(ext.T))  # [4, T, alpha]

        # ModDown: P -> active Q
        K = self.num_sp
        phat = [self.P // p for p in self.sp_primes]
        phat_inv = np.array(
            [pow(phat[i], -1, self.sp_primes[i]) for i in range(K)], dtype=np.uint64
        )
        pext = np.zeros((K, Ll), dtype=np.uint64)
        for i in range(K):
            for t, q in enumerate(active):
                pext[i, t] = phat[i] % q
        assert 4 * 128 * 128 * K < min(active)
        from .ntt_mxu import _balanced_digits_host

        pinv = np.array([pow(self.P, -1, q) for q in active], dtype=np.uint64)
        return KeySwitchPlan(
            alpha=alpha,
            target_idx=target_idx,
            dhat_inv=jnp.asarray(dhat_inv_all.astype(np.uint32)[:, None]),
            dhat_inv_shoup=jnp.asarray(dhat_inv_sh[:, None]),
            dig_ext_dT=jnp.asarray(np.stack(ext_stack)),
            phat_inv=jnp.asarray(phat_inv.astype(np.uint32)[:, None]),
            phat_inv_shoup=jnp.asarray(
                np.stack(
                    [host_shoup(phat_inv[i], self.sp_primes[i]) for i in range(K)]
                )[:, None]
            ),
            pext_dT=jnp.asarray(_balanced_digits_host(pext.T)),
            p_inv_mod_qi=jnp.asarray(pinv.astype(np.uint32)[:, None]),
            p_inv_mod_qi_shoup=jnp.asarray(
                np.stack([host_shoup(pinv[i], active[i]) for i in range(Ll)])[:, None]
            ),
        )

    # -- automorphism bookkeeping ----------------------------------------

    def _compute_root_exponents(self) -> np.ndarray:
        """exponent e_j s.t. NTT output index j = evaluation at psi^{e_j}."""
        n = self.params.ring_n
        p = self.all_primes[0]
        x_poly = np.zeros(n, dtype=np.uint64)
        x_poly[1] = 1
        vals = nttm.host_ntt(x_poly, self._host_psi_rev[0], p)
        psi = int(self._host_psi_rev[0][1])  # psi^{bitrev(1)} = psi^{2^{logn-1}}
        # build power table of the primitive 2n-th root actually used
        # (recover psi itself: table[1] = psi^{bitrev(1)}; instead recompute)
        psi = primes_mod.primitive_root_2n(p, n)
        pow_to_exp = {}
        acc = 1
        for e in range(2 * n):
            pow_to_exp[acc] = e
            acc = acc * psi % p
        return np.array([pow_to_exp[int(v)] for v in vals], dtype=np.int64)

    def galois_element_rot(self, r: int) -> int:
        """Galois element for a left slot-rotation by r."""
        m = 2 * self.params.ring_n
        r = r % (self.params.ring_n // 2)
        return pow(5, r, m)

    def galois_perm(self, g: int) -> jnp.ndarray:
        """Permutation perm with out[j] = in[perm[j]] for sigma_g in eval."""
        if g not in self._galois_perm_cache:
            m = 2 * self.params.ring_n
            tgt = (g * self._root_exp) % m
            perm = np.array([self._exp_pos[int(e)] for e in tgt], dtype=np.int32)
            arr = jnp.asarray(perm)
            if isinstance(arr, jax.core.Tracer):
                # under a trace (jit / eval_shape) jnp.asarray yields a
                # tracer; caching it would leak it into later traces (the
                # same failure mode as the round-1 plaintext-cache leak)
                return arr
            self._galois_perm_cache[g] = arr
        return self._galois_perm_cache[g]

    # -- limb-sliced views ------------------------------------------------

    def tables_for(self, idx) -> nttm.NttTables:
        return nttm._limb_slice(self.tables, idx)

    def pc_for(self, idx) -> PrimeConsts:
        return self.pc.slice(idx)


@functools.lru_cache(maxsize=8)
def make_context(ring_n: int, mult_depth: int, **kw) -> Context:
    return Context(CkksParams(ring_n=ring_n, mult_depth=mult_depth, **kw))
