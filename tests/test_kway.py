"""k-way sorting network tests (KWaySortTest / MaskingTest parity)."""

import numpy as np
import pytest

from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator
from fhe_sorting_tpu.core.keys import Keys
from fhe_sorting_tpu.models.kway import KWaySorter
from fhe_sorting_tpu.models.kway.adapter import kway_decompose
from fhe_sorting_tpu.models.kway.masking import (
    gen_indices, gen_mask, get_rotate_distance, num_stages, sort_type,
)
from fhe_sorting_tpu.ops.sign import CompositeSignConfig, SignConfig, SignFunc

from .utils import vector_with_min_diff

RING = 512
DEPTH = 36


@pytest.fixture(scope="module")
def env():
    ctx = Context(CkksParams(ring_n=RING, mult_depth=DEPTH))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys(
        sorted({1 << i for i in range(8)} | {-(1 << i) for i in range(8)})
    )
    return ctx, keys, Evaluator(ctx, keys)


def test_masking_pure_math():
    """sortType/genIndices sanity (MaskingTest parity)."""
    # k=2: stage schedule visits every (m, logDist) pair
    for k, M in [(2, 3), (3, 2), (5, 1)]:
        for stage in range(num_stages(k, M)):
            m, log_dist, slope = sort_type(k, M, stage)
            assert 0 <= m <= M
            assert log_dist >= 0 or slope > 0
            ind = gen_indices(k ** M, k, M, m, log_dist, slope)
            assert ind.shape == (2, k ** M)
            assert ind[0].max() <= k
            # positions never exceed sorter size
            assert np.all(ind[1] <= ind[0])
    assert get_rotate_distance(2, 1, 0) == 2
    assert kway_decompose(8) == (2, 3)
    assert kway_decompose(9) == (3, 2)
    assert kway_decompose(125) == (5, 3)


@pytest.mark.slow
def test_kway_k2_sort(env):
    ctx, keys, ev = env
    k, M = 2, 2
    N = k ** M
    x = vector_with_min_diff(N, seed=1)
    ct = keys.encrypt(x, slots=N)
    srt = KWaySorter(ev, k, M)
    cfg = SignConfig(CompositeSignConfig(3, 1, 1))
    out = keys.decrypt(srt.sort(ct, SignFunc.CompositeSign, cfg), N)
    assert np.abs(out - np.sort(x)).max() < 0.01


def test_kway_k3_sort(env):
    ctx, keys, ev = env
    k, M = 3, 1
    N = k ** M
    x = np.array([0.7, 0.2, 0.5])
    padded = np.zeros(4)
    padded[:N] = x
    ct = keys.encrypt(padded, slots=4)
    srt = KWaySorter(ev, k, M)
    cfg = SignConfig(CompositeSignConfig(3, 1, 1))
    out = keys.decrypt(srt.sort(ct, SignFunc.CompositeSign, cfg), N)
    assert np.abs(out - np.sort(x)).max() < 0.01


def test_kway_k5_sort(env):
    """Single five-sorter stage (k=5, M=1)."""
    ctx, keys, ev = env
    k, M = 5, 1
    N = k ** M
    x = np.array([0.9, 0.1, 0.5, 0.7, 0.3])
    padded = np.zeros(8)
    padded[:N] = x
    ct = keys.encrypt(padded, slots=8)
    srt = KWaySorter(ev, k, M)
    cfg = SignConfig(CompositeSignConfig(3, 1, 1))
    out = keys.decrypt(srt.sort(ct, SignFunc.CompositeSign, cfg), N)
    assert np.abs(out - np.sort(x)).max() < 0.01


@pytest.mark.slow
def test_kway_k5_m2_sort(env):
    """k=5, M=2 (N=25): exercises the mixed 2345 sorter path."""
    ctx, keys, ev = env
    k, M = 5, 2
    N = k ** M
    x = vector_with_min_diff(N, seed=9)
    padded = np.zeros(32)
    padded[:N] = x
    ct = keys.encrypt(padded, slots=32)
    srt = KWaySorter(ev, k, M)
    cfg = SignConfig(CompositeSignConfig(3, 2, 2))
    out = keys.decrypt(srt.sort(ct, SignFunc.CompositeSign, cfg), N)
    assert np.abs(out - np.sort(x)).max() < 0.01


# -- bootstrap-in-sort (EvalUtils.cpp:57-86 + sign.cpp:164-185 parity) -----


@pytest.fixture(scope="module")
def boot_env():
    from fhe_sorting_tpu.core.bootstrap import Bootstrapper

    # first_mod_bits=30: q0/Delta = 4 so [0,1] messages ModRaise with no
    # pre-scale - the bootstrap can take level-exhausted ciphertexts.
    # depth 22: the k=2/M=2 sort consumes 26 levels, so this chain is too
    # shallow to finish without refreshing (forces >= 1 real bootstrap)
    ctx = Context(CkksParams(ring_n=256, mult_depth=22, secret_hamming=64,
                             first_mod_bits=30))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_conj_key()
    ev = Evaluator(ctx, keys)
    bs = Bootstrapper(ev, K=13.0, sin_degree=127, asin_terms=2)
    keys.gen_rotation_keys(sorted(
        bs.required_rotations()
        | {1 << i for i in range(8)} | {-(1 << i) for i in range(8)}
    ))
    return ctx, keys, ev, bs


def test_kway_sort_with_real_bootstrap(boot_env):
    """k-way sort at a depth too shallow to finish without refreshing:
    checkLevelAndBoot fires our own Bootstrapper mid-sort and the result
    still meets the <0.01 contract (EvalUtilsTest.cpp:132-190 +
    Sorter.cpp:316 parity, with a real bootstrap instead of OpenFHE's)."""
    ctx, keys, ev, bs = boot_env
    fired = []

    def bfn(ct):
        fired.append(ct.level)
        return bs.bootstrap(ct)

    k, M = 2, 2
    N = k ** M
    x = vector_with_min_diff(N, seed=3)
    ct = keys.encrypt(x, slots=N)
    srt = KWaySorter(ev, k, M, bootstrap_fn=bfn)
    cfg = SignConfig(CompositeSignConfig(3, 1, 1),
                     mult_depth=ctx.params.mult_depth)
    out = keys.decrypt(srt.sort(ct, SignFunc.CompositeSign, cfg), N)
    assert len(fired) >= 1, "no bootstrap fired - depth budget too deep"
    assert np.abs(out - np.sort(x)).max() < 0.01


@pytest.mark.slow
def test_kway_reference_shape_multdepth40():
    """The reference's own k-way configuration scaled to this chain
    (kway_adapter.h:41-64: multDepth 40, bootstrap levelBudget {2,2}) at
    ring 4096: N=16 (k=2, M=4, d_g=3, d_f=2 per KWaySort235Test.cpp:98-222)
    with at least TWO real bootstraps firing mid-sort, err < 0.01."""
    from fhe_sorting_tpu.core.bootstrap import Bootstrapper

    # composite scaling: the 28-bit chain's C2S/S2C plaintext quantization
    # wrecks bootstrap precision at ring >= 2^10 (found round 4 - this test
    # previously never ran: its import was broken); q0/Delta = 16 (both
    # bottom primes 30-bit) keeps m/q0 <= 1/16 for [0,1] messages
    ctx = Context(CkksParams(ring_n=4096, mult_depth=40, scale_bits=56,
                             comp=2, base_limbs=4, secret_hamming=64,
                             first_mod_bits=30))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_conj_key()
    ev = Evaluator(ctx, keys)
    bs = Bootstrapper(ev, K=13.0, sin_degree=255, level_budget=(2, 2),
                      asin_terms=2)
    keys.gen_rotation_keys(sorted(
        bs.required_rotations()
        | {1 << i for i in range(12)} | {-(1 << i) for i in range(12)}
    ))
    fired = []

    def bfn(ct):
        fired.append(ct.level)
        return bs.bootstrap(ct)

    k, M = 2, 4
    N = k ** M
    x = vector_with_min_diff(N, seed=4)
    ct = keys.encrypt(x, slots=N)
    srt = KWaySorter(ev, k, M, bootstrap_fn=bfn)
    cfg = SignConfig(CompositeSignConfig(3, 3, 2),
                     mult_depth=ctx.params.mult_depth)
    out = keys.decrypt(srt.sort(ct, SignFunc.CompositeSign, cfg), N)
    assert len(fired) >= 2, f"expected >=2 bootstraps, got {len(fired)}"
    assert np.abs(out - np.sort(x)).max() < 0.01
