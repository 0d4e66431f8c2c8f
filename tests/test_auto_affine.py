"""auto_affine: structured (MXU-matmul) automorphism vs the gather oracle.

The structured path must be BIT-IDENTICAL to data[..., perm] with
perm = ctx.galois_perm(g) for every galois element the evaluator uses
(rotations, negative rotations, conjugation) - it replaces the gather in
the hot rotate path (core/auto_affine.py; reference parity
rotation.h:193-238 EvalAutomorphism)."""

import numpy as np
import pytest

from fhe_sorting_tpu.core import auto_affine
from fhe_sorting_tpu.core.context import CkksParams, Context


@pytest.fixture(scope="module")
def ctx():
    return Context(CkksParams(ring_n=512, mult_depth=4))


def _tables(ctx, n1):
    return auto_affine.build_tables(tuple(ctx.all_primes),
                                    ctx.params.ring_n, n1)


@pytest.mark.parametrize("r", [1, 2, 5, -1, -7, 100, 255])
def test_affine_matches_gather_rotations(ctx, r):
    n = ctx.params.ring_n
    n1 = 16
    t = _tables(ctx, n1)
    g = ctx.galois_element_rot(r)
    perm = np.asarray(ctx.galois_perm(g))
    consts = auto_affine.build_consts(g, n, n1)
    rng = np.random.default_rng(r & 0xFF)
    L = len(ctx.all_primes)
    x = np.stack([rng.integers(0, int(p), size=(n,), dtype=np.uint32)
                  for p in ctx.all_primes])
    x2 = np.stack([x, (x + 1) % np.array(ctx.all_primes, dtype=np.uint32)[:, None]])
    got = np.asarray(auto_affine.apply_affine(x2, consts, t))
    want = x2[:, :, perm]
    np.testing.assert_array_equal(got, want)


def test_affine_matches_gather_conjugation(ctx):
    n = ctx.params.ring_n
    n1 = 16
    t = _tables(ctx, n1)
    g = 2 * n - 1
    perm = np.asarray(ctx.galois_perm(g))
    consts = auto_affine.build_consts(g, n, n1)
    rng = np.random.default_rng(9)
    x = np.stack([rng.integers(0, int(p), size=(n,), dtype=np.uint32)
                  for p in ctx.all_primes])
    got = np.asarray(auto_affine.apply_affine(x, consts, t))
    np.testing.assert_array_equal(got, x[:, perm])


def test_affine_pipeline_rotate_hoisted_ptroll(ctx, monkeypatch):
    """The evaluator's three automorphism consumers (rotate, hoisted
    rotate, plaintext roll) through the affine path, against decrypt
    oracles (FHE_AFFINE_AUTO=force enables it on the CPU context)."""
    monkeypatch.setenv("FHE_AFFINE_AUTO", "force")
    from fhe_sorting_tpu.core.evaluator import Evaluator
    from fhe_sorting_tpu.core.keys import Keys

    keys = Keys.generate(ctx, seed=7)
    keys.gen_rotation_keys([1, 2, -3, 5])
    keys.gen_conj_key()
    ev = Evaluator(ctx, keys)
    assert ev.use_affine
    x = np.arange(8) / 8.0 + 1 / 16
    ct = keys.encrypt(x)
    got = keys.decrypt(ev.rotate(ct, 2), 8)
    np.testing.assert_allclose(got, np.roll(x, -2), atol=1e-4)
    pre = ev.rotate_precompute(ct)
    got = keys.decrypt(ev.rotate_hoisted(ct, pre, 5), 8)
    np.testing.assert_allclose(got, np.roll(x, -5), atol=1e-4)
    m = np.arange(8) / 8.0
    z = ev.mult_plain_at(ct, m, roll=3)
    np.testing.assert_allclose(keys.decrypt(ev.rescale(z), 8),
                               x * np.roll(m, 3), atol=1e-4)
    got = keys.decrypt(ev.conjugate(ct), 8)
    np.testing.assert_allclose(got, x, atol=1e-4)


def test_affine_four_step_split(ctx):
    """n1 = the four-step split (the production grid) also round-trips."""
    from fhe_sorting_tpu.core.ntt_mxu import split_n

    n = ctx.params.ring_n
    n1, _ = split_n(n)
    t = _tables(ctx, n1)
    g = ctx.galois_element_rot(3)
    perm = np.asarray(ctx.galois_perm(g))
    consts = auto_affine.build_consts(g, n, n1)
    rng = np.random.default_rng(3)
    x = np.stack([rng.integers(0, int(p), size=(n,), dtype=np.uint32)
                  for p in ctx.all_primes])
    got = np.asarray(auto_affine.apply_affine(x, consts, t))
    np.testing.assert_array_equal(got, x[:, perm])
