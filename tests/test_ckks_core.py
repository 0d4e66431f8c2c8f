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


# ---------------------------------------------------------------------------
# Composite scaling (comp=2): two u32 primes per level, Delta = 2^56.
# This is the TPU counterpart of the reference's 40..59-bit scales
# (kway_adapter.h:52-54) - a single u32 prime cannot reach them.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def comp2_ctx():
    ctx = Context(CkksParams(ring_n=256, mult_depth=6, scale_bits=56, comp=2,
                             base_limbs=3, dnum=3))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys([1, 2, 4, -1])
    return ctx, keys, Evaluator(ctx, keys)


def test_comp2_chain_layout(comp2_ctx):
    ctx, keys, ev = comp2_ctx
    assert ctx.num_q == 3 + 2 * 6
    assert ctx.limbs_at(1) == ctx.num_q - 2
    # canonical scales glued to 2^56
    for lvl in range(ctx.params.mult_depth + 1):
        assert abs(float(ctx.scale_dec(lvl)) / 2.0**56 - 1.0) < 2e-2


def test_comp2_encrypt_decrypt(comp2_ctx):
    ctx, keys, ev = comp2_ctx
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, 64)
    ct = keys.encrypt(z)
    np.testing.assert_allclose(keys.decrypt(ct), z, atol=1e-9)


def test_comp2_deep_chain_precision(comp2_ctx):
    """The whole point of comp=2: a full-depth squaring chain keeps ~1e-9
    error where the 28-bit chain drifts to ~1e-3 (ring-noise 2^-42/level)."""
    ctx, keys, ev = comp2_ctx
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, 64)
    acc = keys.encrypt(x)
    expect = x.copy()
    for d in range(ctx.params.mult_depth - 1):
        acc = ev.square(acc)
        expect = expect * expect
    np.testing.assert_allclose(keys.decrypt(acc), expect, atol=1e-8)


def test_comp2_ops(comp2_ctx):
    ctx, keys, ev = comp2_ctx
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, 64)
    y = rng.uniform(-1, 1, 64)
    m = rng.uniform(-1, 1, 64)
    cx, cy = keys.encrypt(x), keys.encrypt(y)
    np.testing.assert_allclose(keys.decrypt(ev.mult(cx, cy)), x * y, atol=1e-8)
    np.testing.assert_allclose(keys.decrypt(ev.add(ev.mult(cx, cy), cx)),
                               x * y + x, atol=1e-8)
    np.testing.assert_allclose(keys.decrypt(ev.mult(cx, 0.5)), 0.5 * x,
                               atol=1e-8)
    np.testing.assert_allclose(keys.decrypt(ev.mult_plain_at(cx, m)), m * x,
                               atol=1e-8)
    np.testing.assert_allclose(keys.decrypt(ev.rotate(cx, 2)),
                               np.roll(x, -2), atol=1e-8)
    # cross-level adjustment: mixed sdeg/level adds
    cxy = ev.mult(cx, cy)
    cxy2 = ev.mult(cxy, cy)
    np.testing.assert_allclose(keys.decrypt(ev.add(cxy2, cx)),
                               x * y * y + x, atol=1e-8)


def test_rotation_after_mult(small_ctx):
    ctx, keys, ev = small_ctx
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, 64)
    y = rng.uniform(-1, 1, 64)
    cx, cy = keys.encrypt(x), keys.encrypt(y)
    prod = ev.mult(cx, cy)
    got = keys.decrypt(ev.rotate(prod, 2))
    np.testing.assert_allclose(got, np.roll(x * y, -2), atol=1e-4)
