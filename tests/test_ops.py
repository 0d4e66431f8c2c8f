"""Sign / comparison / Chebyshev-PS / rotation-composer layer tests.

Mirrors the reference's SignTest / CompareTest / DecomposeTest / RotationTest
strategy (SURVEY.md section 4) at insecure fast parameters.
"""

import numpy as np
import pytest

from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator
from fhe_sorting_tpu.core.keys import Keys
from fhe_sorting_tpu.ops.chebyshev import ChebyshevPS, chebyshev_fit
from fhe_sorting_tpu.ops.compare import Comparison
from fhe_sorting_tpu.ops.rotation import (
    Decomposer, DecomposeAlgo, RotationComposer,
)
from fhe_sorting_tpu.ops.sign import (
    CompositeSignConfig, SignConfig, SignFunc, composite_sign, sign_adv,
    signum_polycircuit, signum_polycircuit_coeffs,
)


@pytest.fixture(scope="module")
def ctx16():
    ctx = Context(CkksParams(ring_n=256, mult_depth=16))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys([1, 2, 4, 8, 16])
    return ctx, keys, Evaluator(ctx, keys)


def test_chebyshev_fit_matches_numpy():
    f = lambda x: np.sin(3 * x) + 0.5 * x * x
    c = chebyshev_fit(f, 40)
    xs = np.linspace(-1, 1, 101)
    got = np.polynomial.chebyshev.chebval(xs, c)
    np.testing.assert_allclose(got, f(xs), atol=1e-10)


def test_chebyshev_ps_encrypted(ctx16):
    ctx, keys, ev = ctx16
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 64)
    coeffs = chebyshev_fit(lambda v: np.tanh(3 * v), 59)
    ct = keys.encrypt(x)
    out = keys.decrypt(ChebyshevPS(ev).evaluate(ct, coeffs))
    np.testing.assert_allclose(out, np.tanh(3 * x), atol=2e-3)


def test_composite_sign3(ctx16):
    ctx, keys, ev = ctx16
    vals = np.array([0.9, -0.9, 0.3, -0.3, 0.05, -0.05, 0.5, -0.5] * 8)
    ct = keys.encrypt(vals)
    cfg = SignConfig(CompositeSignConfig(3, 2, 2))
    out = keys.decrypt(composite_sign(ev, ct, cfg))
    np.testing.assert_allclose(out, np.sign(vals), atol=0.02)


def test_sign_adv(ctx16):
    ctx, keys, ev = ctx16
    vals = np.array([0.9, -0.9, 0.3, -0.3, 0.1, -0.1, 0.6, -0.6] * 8)
    ct = keys.encrypt(vals)
    out = keys.decrypt(sign_adv(ev, ct, dg=2, df=2))
    np.testing.assert_allclose(out, (np.sign(vals) + 1) / 2, atol=0.02)


def test_signum_polycircuit(ctx16):
    """Deg-1023 Chebyshev signum (sign.cpp:189-608 parity): the analytic
    coefficients match the reference's constant table, and the encrypted
    Paterson-Stockmeyer evaluation signs inputs away from the boundary."""
    c = signum_polycircuit_coeffs()
    # the reference's constant table is a Chebyshev-node fit; node-count
    # conventions differ at ~1e-6, the function is the same
    np.testing.assert_allclose(c[1], 1.273238551875655, rtol=2e-6)
    np.testing.assert_allclose(c[3], -0.42441020299615195, rtol=2e-5)
    assert c[::2].max() == 0.0 and len(c) == 1024

    ctx = Context(CkksParams(ring_n=256, mult_depth=22))
    keys = Keys.generate(ctx, seed=0)
    ev = Evaluator(ctx, keys)
    vals = np.array([0.9, -0.9, 0.3, -0.3, 0.1, -0.1, 0.6, -0.6] * 8)
    ct = keys.encrypt(vals)
    out = keys.decrypt(signum_polycircuit(ev, ct))
    # truncated Fourier-Chebyshev series ringing limits accuracy to ~1/deg
    np.testing.assert_allclose(out, np.sign(vals), atol=0.05)


def test_compare(ctx16):
    ctx, keys, ev = ctx16
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, 64)
    b = rng.uniform(0, 1, 64)
    # keep gaps resolvable by the approximation
    mask = np.abs(a - b) < 0.05
    b[mask] = (a[mask] + 0.2) % 1.0
    ca, cb = keys.encrypt(a), keys.encrypt(b)
    comp = Comparison(ev)
    cfg = SignConfig(CompositeSignConfig(3, 2, 2))
    out = keys.decrypt(comp.compare(ca, cb, SignFunc.CompositeSign, cfg))
    np.testing.assert_allclose(out, (a > b).astype(float), atol=0.02)


def test_decomposer_pure_math():
    dec = Decomposer([1, 2, 4, 8, 16, 6], wrap=64)
    for r in range(-63, 64):
        parts = dec.decompose(r)
        assert sum(parts) % 64 == r % 64, (r, parts)
    dec2 = Decomposer([1, 2, 4, 8, 16], wrap=64, algo=DecomposeAlgo.BINARY)
    for r in range(64):
        assert sum(dec2.decompose(r)) % 64 == r % 64


def test_rotation_composer(ctx16):
    ctx, keys, ev = ctx16
    x = np.arange(64) / 64.0
    ct = keys.encrypt(x)
    rot = RotationComposer(ev, [1, 2, 4, 8, 16], wrap=64)
    for r in [3, 5, 7, -3, 21, 63]:
        got = keys.decrypt(rot.rotate(ct, r))
        np.testing.assert_allclose(got, np.roll(x, -r), atol=2e-4, err_msg=f"r={r}")
    assert rot.stats.composed > 0


def test_rotation_tree_hoisted(ctx16):
    from fhe_sorting_tpu.ops.rotation import RotationTree

    ctx, keys, ev = ctx16
    x = np.arange(64) / 64.0
    ct = keys.encrypt(x)
    rot = RotationComposer(ev, [1, 2, 4, 8, 16], wrap=64)
    tree = RotationTree(rot)
    tree.build(ct)
    for r in [1, 2, 3, 5, 8]:
        got = keys.decrypt(tree.rotate(r))
        np.testing.assert_allclose(got, np.roll(x, -r), atol=2e-4, err_msg=f"r={r}")
    # shared-prefix caching: r=3 -> [(-1),4] or [1,2]-style paths; repeating
    # the same rotations must not add any new key-switches
    before = rot.stats.fast_rotations
    for r in [3, 5, 8, 1]:
        got = keys.decrypt(tree.rotate(r))
        np.testing.assert_allclose(got, np.roll(x, -r), atol=2e-4)
    assert rot.stats.fast_rotations == before
    # composed rotations that share a prefix reuse the cached intermediate:
    # with positive-only keys, 6 -> [4, 2] and 7 -> [4, 2, 1] share [4, 2]
    tree2 = RotationTree(RotationComposer(ev, [1, 2, 4, 8, 16], wrap=64))
    tree2.build(ct)
    tree2.rotate(6)
    n_after_6 = tree2.comp.stats.fast_rotations
    got = keys.decrypt(tree2.rotate(7))  # only the final step 1 is new
    np.testing.assert_allclose(got, np.roll(x, -7), atol=2e-4)
    assert tree2.comp.stats.fast_rotations == n_after_6 + 1


def test_depth_meter_predicts_exactly():
    """The metadata-only depth meter's prediction is exact: a context with
    precisely the measured mult_depth completes the sort (and one less
    would exhaust, by construction of max_level)."""
    from fhe_sorting_tpu.core.context import CkksParams, Context
    from fhe_sorting_tpu.core.keys import Keys
    from fhe_sorting_tpu.core.evaluator import Evaluator
    from fhe_sorting_tpu.models.direct_sort import (
        DirectSort, rotation_indices_direct_sort,
    )
    from fhe_sorting_tpu.utils.depth_meter import measure_direct_sort_depth

    N, ring = 4, 512
    cfg = SignConfig(CompositeSignConfig(3, 2, 2))
    m = measure_direct_sort_depth(N, ring, cfg)
    ctx = Context(CkksParams(ring_n=ring, mult_depth=m["mult_depth"]))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys(sorted(
        rotation_indices_direct_sort(N, ring) | {1 << i for i in range(8)}
    ))
    ev = Evaluator(ctx, keys)
    x = np.array([0.7, 0.1, 0.9, 0.4])
    out = DirectSort(ev, N).sort(keys.encrypt(x), SignFunc.CompositeSign, cfg)
    assert out.level == m["final_level"]
    got = keys.decrypt(out)[:N]
    np.testing.assert_allclose(got, np.sort(x), atol=0.01)
