"""End-to-end CKKS runtime tests: encrypt/eval/decrypt against numpy.

Reference-parity strategy (SURVEY.md section 4): no mocks - every test builds
a real context, encrypts real data, runs the homomorphic op, decrypts and
compares against the plaintext computation, exactly like the reference's
gtest suites do through OpenFHE.
"""

import numpy as np
import pytest

from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator
from fhe_sorting_tpu.core.keys import Keys


@pytest.fixture(scope="module")
def small_ctx():
    ctx = Context(CkksParams(ring_n=256, mult_depth=6, dnum=3))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys([1, 2, 4, -1, 8, 16])
    return ctx, keys, Evaluator(ctx, keys)


def test_encrypt_decrypt(small_ctx):
    ctx, keys, ev = small_ctx
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, 64)
    ct = keys.encrypt(z)
    out = keys.decrypt(ct)
    np.testing.assert_allclose(out, z, atol=5e-5)


def test_sparse_slots(small_ctx):
    ctx, keys, ev = small_ctx
    z = np.arange(8) / 8.0
    ct = keys.encrypt(z)  # 8 slots, tiled across 128
    out = keys.decrypt(ct)
    assert out.shape == (8,)
    np.testing.assert_allclose(out, z, atol=5e-5)
    # reinterpret at more slots: content is 8-periodic
    out16 = keys.decrypt(ct.set_slots(16))
    np.testing.assert_allclose(out16, np.tile(z, 2), atol=5e-5)


def test_add_sub_scalar(small_ctx):
    ctx, keys, ev = small_ctx
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, 64)
    y = rng.uniform(-1, 1, 64)
    cx, cy = keys.encrypt(x), keys.encrypt(y)
    np.testing.assert_allclose(keys.decrypt(ev.add(cx, cy)), x + y, atol=5e-5)
    np.testing.assert_allclose(keys.decrypt(ev.sub(cx, cy)), x - y, atol=5e-5)
    np.testing.assert_allclose(keys.decrypt(ev.add(cx, 0.25)), x + 0.25, atol=5e-5)
    np.testing.assert_allclose(keys.decrypt(ev.rsub(1.0, cx)), 1 - x, atol=5e-5)
    np.testing.assert_allclose(keys.decrypt(ev.negate(cx)), -x, atol=5e-5)


def test_mult_scalar_and_plain(small_ctx):
    ctx, keys, ev = small_ctx
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, 64)
    m = rng.uniform(-1, 1, 64)
    cx = keys.encrypt(x)
    np.testing.assert_allclose(keys.decrypt(ev.mult(cx, 0.5)), 0.5 * x, atol=5e-5)
    got = keys.decrypt(ev.mult_plain_at(cx, m))
    np.testing.assert_allclose(got, m * x, atol=5e-5)


def test_mult_ct_chain(small_ctx):
    """Deep product chain: x^(2^k) via repeated squaring, depth = mult_depth."""
    ctx, keys, ev = small_ctx
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, 64)
    cx = keys.encrypt(x)
    acc = cx
    expect = x.copy()
    for d in range(ctx.params.mult_depth - 1):
        acc = ev.square(acc)
        expect = expect * expect
        got = keys.decrypt(acc)
        np.testing.assert_allclose(got, expect, atol=1e-3, err_msg=f"depth {d}")


def test_mult_two_cts(small_ctx):
    ctx, keys, ev = small_ctx
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, 64)
    y = rng.uniform(-1, 1, 64)
    cx, cy = keys.encrypt(x), keys.encrypt(y)
    np.testing.assert_allclose(keys.decrypt(ev.mult(cx, cy)), x * y, atol=1e-4)
    # mixed levels: (x*y) * y needs auto level adjustment
    cxy = ev.mult(cx, cy)
    got = keys.decrypt(ev.mult(cxy, cy))
    np.testing.assert_allclose(got, x * y * y, atol=1e-4)
    # add across levels
    got2 = keys.decrypt(ev.add(cxy, cx))
    np.testing.assert_allclose(got2, x * y + x, atol=1e-4)


def test_rotation(small_ctx):
    ctx, keys, ev = small_ctx
    x = np.arange(64) / 64.0
    cx = keys.encrypt(x)
    for r in [1, 2, 4, -1]:
        got = keys.decrypt(ev.rotate(cx, r))
        np.testing.assert_allclose(got, np.roll(x, -r), atol=5e-5, err_msg=f"r={r}")


def test_rotation_hoisted(small_ctx):
    ctx, keys, ev = small_ctx
    x = np.arange(64) / 64.0
    cx = keys.encrypt(x)
    pre = ev.rotate_precompute(cx)
    for r in [1, 2, 4]:
        got = keys.decrypt(ev.rotate_hoisted(cx, pre, r))
        np.testing.assert_allclose(got, np.roll(x, -r), atol=5e-5, err_msg=f"r={r}")


def test_rotation_sparse_period(small_ctx):
    """Rotation acts per-period on sparsely packed (tiled) content."""
    ctx, keys, ev = small_ctx
    z = np.arange(8) / 8.0
    ct = keys.encrypt(z)
    got = keys.decrypt(ev.rotate(ct, 1))
    np.testing.assert_allclose(got, np.roll(z, -1), atol=5e-5)


def test_rotation_after_mult(small_ctx):
    ctx, keys, ev = small_ctx
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, 64)
    y = rng.uniform(-1, 1, 64)
    cx, cy = keys.encrypt(x), keys.encrypt(y)
    prod = ev.mult(cx, cy)
    got = keys.decrypt(ev.rotate(prod, 2))
    np.testing.assert_allclose(got, np.roll(x * y, -2), atol=1e-4)
