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


@pytest.mark.parametrize("n", [64, 256, 1024])
def test_four_step_matches_butterfly(n):
    """MXU four-step NTT (core/ntt_mxu.py) is bit-identical to the butterfly
    path in both directions, including the folded bitrev ordering."""
    from fhe_sorting_tpu.core import ntt_mxu

    ps = primes.ntt_primes(n, 28, 3)
    tabs = nttm.build_device_tables(ps, n)
    fst = ntt_mxu.build_fs_tables(ps, n)
    rng = np.random.default_rng(3)
    a = np.stack([rng.integers(0, p, size=(2, n), dtype=np.uint64) for p in ps])
    a = jnp.asarray(a.transpose(1, 0, 2).astype(np.uint32))  # [2, L, n]

    f_ref = np.asarray(nttm.ntt(a, tabs))
    f_fs = np.asarray(ntt_mxu.ntt_fs(a, fst))
    np.testing.assert_array_equal(f_fs, f_ref)

    r_ref = np.asarray(nttm.intt(jnp.asarray(f_ref), tabs))
    r_fs = np.asarray(ntt_mxu.intt_fs(jnp.asarray(f_ref), fst))
    np.testing.assert_array_equal(r_fs, r_ref)
    np.testing.assert_array_equal(r_fs, np.asarray(a))


def test_four_step_context_end_to_end():
    """A full mult+rotate+decrypt chain under ntt_impl="mxu" matches the
    butterfly context bit-exactly (same primes, same keys seed)."""
    from fhe_sorting_tpu.core.context import CkksParams, Context
    from fhe_sorting_tpu.core.evaluator import Evaluator
    from fhe_sorting_tpu.core.keys import Keys

    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, 128)
    outs = {}
    for impl in ("butterfly", "mxu"):
        ctx = Context(CkksParams(ring_n=256, mult_depth=6, ntt_impl=impl))
        keys = Keys.generate(ctx, seed=0)
        keys.gen_rotation_keys([1])
        ev = Evaluator(ctx, keys)
        ct = keys.encrypt(x, seed=0)
        out = ev.rotate(ev.rescale(ev.mult(ct, ct)), 1)
        outs[impl] = (np.asarray(out.data), keys.decrypt(out))
    np.testing.assert_array_equal(outs["mxu"][0], outs["butterfly"][0])
    np.testing.assert_allclose(outs["mxu"][1], np.roll(x * x, -1), atol=1e-4)


@pytest.mark.parametrize("n", [256, 1024])
def test_four_step_pallas_interpret(n):
    """Fused Pallas four-step kernel (interpret mode on CPU) is bit-identical
    to the butterfly path in both directions."""
    from fhe_sorting_tpu.core import ntt_mxu, pallas_fs_ntt

    ps = primes.ntt_primes(n, 28, 2)
    tabs = nttm.build_device_tables(ps, n)
    fst = ntt_mxu.build_fs_tables(ps, n)
    rng = np.random.default_rng(5)
    a = np.stack([rng.integers(0, p, size=(2, n), dtype=np.uint64) for p in ps])
    a = jnp.asarray(a.transpose(1, 0, 2).astype(np.uint32))

    f_ref = np.asarray(nttm.ntt(a, tabs))
    f_pl = np.asarray(pallas_fs_ntt.ntt_fs_pallas(a, fst, interpret=True))
    np.testing.assert_array_equal(f_pl, f_ref)

    r_pl = np.asarray(pallas_fs_ntt.intt_fs_pallas(jnp.asarray(f_ref), fst,
                                                   interpret=True))
    np.testing.assert_array_equal(r_pl, np.asarray(a))
