"""NTT layer tests: roundtrip, host/device agreement, negacyclic product.

Test-oracle role parity: the reference trusts OpenFHE's NTT; here we pin ours
against an O(n^2) schoolbook negacyclic multiply (exact integer oracle).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fhe_sorting_tpu.core import modmath as mm
from fhe_sorting_tpu.core import ntt as nttm
from fhe_sorting_tpu.core import primes


@pytest.mark.parametrize("n", [16, 64, 256])
def test_roundtrip_and_host_agreement(n):
    ps = primes.ntt_primes(n, 28, 3)
    tabs = nttm.build_device_tables(ps, n)
    psi_rev, ipsi_rev, n_inv = nttm.build_host_tables(ps, n)
    rng = np.random.default_rng(0)
    a = np.stack([rng.integers(0, p, size=n, dtype=np.uint64) for p in ps])

    ad = jnp.asarray(a.astype(np.uint32))
    fa = nttm.ntt(ad, tabs)
    ra = nttm.intt(fa, tabs)
    np.testing.assert_array_equal(np.asarray(ra), a.astype(np.uint32))

    fh = np.stack([nttm.host_ntt(a[i], psi_rev[i], ps[i]) for i in range(3)])
    np.testing.assert_array_equal(np.asarray(fa), fh.astype(np.uint32))
    rh = np.stack(
        [nttm.host_intt(fh[i], ipsi_rev[i], int(n_inv[i]), ps[i]) for i in range(3)]
    )
    np.testing.assert_array_equal(rh, a)


@pytest.mark.parametrize("n", [16, 64])
def test_negacyclic_product(n):
    ps = primes.ntt_primes(n, 28, 2)
    tabs = nttm.build_device_tables(ps, n)
    rng = np.random.default_rng(1)
    a = np.stack([rng.integers(0, p, size=n, dtype=np.uint64) for p in ps])
    b = np.stack([rng.integers(0, p, size=n, dtype=np.uint64) for p in ps])

    fa = nttm.ntt(jnp.asarray(a.astype(np.uint32)), tabs)
    fb = nttm.ntt(jnp.asarray(b.astype(np.uint32)), tabs)
    pcol = tabs.p
    consts = [mm.PrimeConsts(p) for p in ps]
    r2 = jnp.asarray(np.array([c.r2_32 for c in consts], np.uint32)[:, None])
    r2s = jnp.asarray(np.array([c.r2_32_shoup for c in consts], np.uint32)[:, None])
    pinv = jnp.asarray(np.array([c.p_inv32 for c in consts], np.uint32)[:, None])
    fc = mm.barrett_mulmod(fa, fb, pcol, r2, r2s, pinv)
    c = np.asarray(nttm.intt(fc, tabs))

    ref = np.stack([nttm.host_negacyclic_mul(a[i], b[i], ps[i]) for i in range(2)])
    np.testing.assert_array_equal(c, ref.astype(np.uint32))


def test_modmath_random():
    rng = np.random.default_rng(2)
    p = primes.ntt_primes(64, 30, 1)[0]
    c = mm.PrimeConsts(p)
    a = rng.integers(0, p, size=4096, dtype=np.uint64)
    b = rng.integers(0, p, size=4096, dtype=np.uint64)
    got = mm.barrett_mulmod(
        jnp.asarray(a.astype(np.uint32)),
        jnp.asarray(b.astype(np.uint32)),
        jnp.uint32(p),
        jnp.uint32(c.r2_32),
        jnp.uint32(c.r2_32_shoup),
        jnp.uint32(c.p_inv32),
    )
    np.testing.assert_array_equal(np.asarray(got), (a * b % p).astype(np.uint32))

    bs = mm.host_shoup(b, p)
    got2 = mm.shoup_mulmod(
        jnp.asarray(a.astype(np.uint32)),
        jnp.asarray(b.astype(np.uint32)),
        jnp.asarray(bs),
        jnp.uint32(p),
    )
    np.testing.assert_array_equal(np.asarray(got2), (a * b % p).astype(np.uint32))
