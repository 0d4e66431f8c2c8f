"""BitonicSort tests (reference sort_algo.h:1067-1161 path)."""

import numpy as np
import pytest

from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator
from fhe_sorting_tpu.core.keys import Keys
from fhe_sorting_tpu.models.bitonic import BitonicSort
from fhe_sorting_tpu.ops.sign import CompositeSignConfig, SignConfig, SignFunc

from .utils import vector_with_min_diff


@pytest.fixture(scope="module")
def env():
    ctx = Context(CkksParams(ring_n=512, mult_depth=48))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys(
        sorted({1 << i for i in range(6)} | {-(1 << i) for i in range(6)})
    )
    return ctx, keys, Evaluator(ctx, keys)


def test_bitonic_sort_n2(env):
    """Single comparator stage: fast default coverage."""
    ctx, keys, ev = env
    N = 2
    x = np.array([0.8, 0.3])
    ct = keys.encrypt(x, slots=N)
    srt = BitonicSort(ev, N, normalize=1.0)
    cfg = SignConfig(CompositeSignConfig(3, 2, 2))
    out = keys.decrypt(srt.sort(ct, SignFunc.CompositeSign, cfg), N)
    assert np.abs(out - np.sort(x)).max() < 0.01


@pytest.mark.slow
def test_bitonic_sort_n4(env):
    ctx, keys, ev = env
    N = 4
    x = vector_with_min_diff(N, seed=2)
    ct = keys.encrypt(x, slots=N)
    srt = BitonicSort(ev, N, normalize=1.0)
    cfg = SignConfig(CompositeSignConfig(3, 2, 2))
    out = keys.decrypt(srt.sort(ct, SignFunc.CompositeSign, cfg), N)
    assert np.abs(out - np.sort(x)).max() < 0.01


def test_bitonic_sort_with_bootstrap():
    """Bitonic with a REAL bootstrap firing mid-network (sort_algo.h:1110-1112:
    bootstrap when depth runs low).  A shallow chain forces >= 1 refresh."""
    from fhe_sorting_tpu.core.bootstrap import Bootstrapper

    # depth 25, not 24: the last stage lands at level 24, where sdeg-2
    # intermediates (compare outputs ~1.0 at scale^2 = 2^56) need a 3-limb
    # modulus; at depth 24 only 2 limbs (~2^56) remain and values >= 0.5 wrap
    ctx = Context(CkksParams(ring_n=256, mult_depth=25, secret_hamming=64))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_conj_key()
    ev = Evaluator(ctx, keys)
    bs = Bootstrapper(ev, K=13.0, sin_degree=127)
    keys.gen_rotation_keys(sorted(
        bs.required_rotations()
        | {1 << i for i in range(6)} | {-(1 << i) for i in range(6)}
    ))
    boots = []

    def bootstrap_fn(ct):
        boots.append(ct.level)
        return bs.bootstrap(ct, msg_scale_down=2.0)

    N = 4
    x = np.array([0.19, 0.06, 0.13, 0.02])
    ct = keys.encrypt(x, slots=N)
    srt = BitonicSort(ev, N, normalize=1.0, bootstrap_fn=bootstrap_fn,
                      bootstrap_level=12)
    # (3,2,1): 10 levels/stage, so stage 3 fits after a refresh to ~level 12
    # (input gaps >= 0.04 resolve with 2 g-iterations)
    cfg = SignConfig(CompositeSignConfig(3, 2, 1))
    out = keys.decrypt(srt.sort(ct, SignFunc.CompositeSign, cfg), N)
    assert len(boots) >= 1, "bootstrap never fired"
    assert np.abs(out - np.sort(x)).max() < 0.01
