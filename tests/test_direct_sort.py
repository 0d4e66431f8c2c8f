"""DirectSort end-to-end and stagewise tests (DirectSortNTest parity).

Mirrors /root/reference/tests/DirectSortNTest.cpp: ConstructRank against
plaintext ranks, RotationIndexCheck on plaintext-encrypted rank inputs,
the noise-robustness variant (rank +- 0.001), and the full sort with the
maxError < 0.01 contract on min-gap-1/N inputs.
"""

import numpy as np
import pytest

from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator
from fhe_sorting_tpu.core.keys import Keys
from fhe_sorting_tpu.models.direct_sort import (
    DirectSort, rotation_indices_direct_sort,
    rotation_indices_direct_sort_2n,
    rotation_indices_direct_sort_hybrid,
)
from fhe_sorting_tpu.ops.rotation import RotationComposer
from fhe_sorting_tpu.ops.sign import CompositeSignConfig, SignConfig, SignFunc

from .utils import vector_with_min_diff

RING = 512
DEPTH = 34


@pytest.fixture(scope="module")
def env():
    ctx = Context(CkksParams(ring_n=RING, mult_depth=DEPTH))
    keys = Keys.generate(ctx, seed=0)
    steps = set()
    for N in (4, 8):
        steps |= rotation_indices_direct_sort(N, RING)
        steps |= rotation_indices_direct_sort_2n(N, RING)
        steps |= rotation_indices_direct_sort_hybrid(N, RING)
    # powers of two for composed fallbacks
    steps |= {1 << i for i in range(8)} | {-(1 << i) for i in range(8)}
    keys.gen_rotation_keys(sorted(steps))
    return ctx, keys, Evaluator(ctx, keys)


def plain_rank(x):
    return np.array([np.sum(v > x) for v in x], dtype=np.float64)


@pytest.mark.parametrize("N", [4, 8])
def test_construct_rank(env, N):
    ctx, keys, ev = env
    x = vector_with_min_diff(N, seed=1)
    ct = keys.encrypt(x)
    srt = DirectSort(ev, N)
    cfg = SignConfig(CompositeSignConfig(3, 3, 2))
    rank = srt.construct_rank(ct, SignFunc.CompositeSign, cfg)
    got = keys.decrypt(rank)[:N]
    np.testing.assert_allclose(got, plain_rank(x), atol=1e-2)


@pytest.mark.parametrize("N", [4, 8])
def test_rotation_index_check_plain_rank(env, N):
    """Feed an encrypted *plaintext-computed* rank (DirectSortNTest.cpp:130-203)."""
    ctx, keys, ev = env
    x = vector_with_min_diff(N, seed=2)
    ranks = plain_rank(x)
    ct = keys.encrypt(x)
    ct_rank = keys.encrypt(ranks)
    srt = DirectSort(ev, N)
    out = keys.decrypt(srt.rotation_index_check_n(ct_rank, ct))[:N]
    np.testing.assert_allclose(out, np.sort(x), atol=5e-3)


@pytest.mark.parametrize("N", [4, 8])
def test_rotation_index_check_noisy_rank(env, N):
    """Rank perturbed +-0.001 still sorts (DirectSortNTest.cpp:205-285)."""
    ctx, keys, ev = env
    x = vector_with_min_diff(N, seed=3)
    rng = np.random.default_rng(4)
    ranks = plain_rank(x) + rng.uniform(-1e-3, 1e-3, N)
    ct = keys.encrypt(x)
    ct_rank = keys.encrypt(ranks)
    srt = DirectSort(ev, N)
    out = keys.decrypt(srt.rotation_index_check_n(ct_rank, ct))[:N]
    np.testing.assert_allclose(out, np.sort(x), atol=5e-3)


@pytest.mark.parametrize("N", [4, 8])
def test_rotation_index_check_2n(env, N):
    """2N-wide sinc placement variant (sort_algo.h:586-656 parity)."""
    ctx, keys, ev = env
    x = vector_with_min_diff(N, seed=6)
    ranks = plain_rank(x)
    ct = keys.encrypt(x)
    ct_rank = keys.encrypt(ranks)
    rot = RotationComposer(
        ev, sorted(rotation_indices_direct_sort_2n(N, RING))
    )
    srt = DirectSort(ev, N, rot=rot)
    out = keys.decrypt(srt.rotation_index_check_2n(ct_rank, ct))[:N]
    np.testing.assert_allclose(out, np.sort(x), atol=5e-3)


@pytest.mark.parametrize("N", [4])
def test_sort_hybrid(env, N):
    """DirectSortHTest parity: MEHP24-style placement after rank build."""
    ctx, keys, ev = env
    x = vector_with_min_diff(N, seed=7)
    ct = keys.encrypt(x, slots=N)
    rot = RotationComposer(
        ev, rotation_indices_direct_sort_hybrid(N, RING)
    )
    srt = DirectSort(ev, N, rot=rot)
    cfg = SignConfig(CompositeSignConfig(3, 3, 2))
    out = keys.decrypt(srt.sort_hybrid(ct, SignFunc.CompositeSign, cfg), N)
    assert np.abs(out - np.sort(x)).max() < 0.01


@pytest.mark.parametrize("N", [4, 8])
def test_full_sort(env, N):
    ctx, keys, ev = env
    x = vector_with_min_diff(N, seed=5)
    ct = keys.encrypt(x)
    srt = DirectSort(ev, N)
    cfg = SignConfig(CompositeSignConfig(3, 3, 2))
    out_ct = srt.sort(ct, SignFunc.CompositeSign, cfg)
    out = keys.decrypt(out_ct)[:N]
    assert np.abs(out - np.sort(x)).max() < 0.01  # the reference contract


def test_full_sort_multibatch_lazy_keys(env):
    """num_batch > 1 geometry (N=32 at ring 512 -> num_partition=8,
    num_batch=4) through the uniform-batch path, with just-in-time LRU
    rotation keys forcing eviction + regeneration.  This is the same code
    path N=1024 takes at ring 2^17 (sort_algo.h:371-416 collapse)."""
    ctx, keys, ev = env
    N = 32
    x = vector_with_min_diff(N, seed=9)
    ct = keys.encrypt(x)
    srt = DirectSort(ev, N, lazy_key_budget=6)
    assert N // min(N, RING // 2 // N) == 4  # num_batch
    cfg = SignConfig(CompositeSignConfig(3, 4, 2))
    out = keys.decrypt(srt.sort(ct, SignFunc.CompositeSign, cfg))[:N]
    assert np.abs(out - np.sort(x)).max() < 0.01
    assert srt.rot.stats.lazy_keygens > 0  # eviction actually happened


def test_hybrid_batched_sign_indicator_branch(env):
    """The N >= 256 hybrid branch (sort_algo.h:964-981: batched placement +
    sign-based indicator instead of the sinc) exercised at small scale by
    lowering the class thresholds: N=8 with max_array=4 -> num_batch=2 and
    the CompositeSign indicator path."""
    ctx, keys, ev = env
    N = 8
    x = vector_with_min_diff(N, seed=11)
    ct = keys.encrypt(x, slots=N)
    from fhe_sorting_tpu.models.direct_sort import (
        rotation_indices_direct_sort_hybrid,
    )
    rot = RotationComposer(
        ev, rotation_indices_direct_sort_hybrid(N, RING, max_array=4),
        lazy_key_budget=8,
    )
    srt = DirectSort(ev, N, rot=rot)
    srt.hybrid_max_array = 4
    srt.hybrid_sinc_threshold = 8   # force the sign-indicator branch
    srt.hybrid_indicator_dg = 2     # 1/8 gap needs only 2 g-iterations
    cfg = SignConfig(CompositeSignConfig(3, 3, 2))
    out = keys.decrypt(srt.sort_hybrid(ct, SignFunc.CompositeSign, cfg), N)
    assert np.abs(out - np.sort(x)).max() < 0.01
