"""StagedHybridSort: the TRUE maxArraySize tiling regime, scaled to CPU.

Mirrors the reference's N>256 hybrid placement (sort_algo.h:893-1047):
num_batch = N/maxArraySize tiles, sign-based indicator (not the sinc),
sumColumnsToTarget/transposeColumnTarget binary-path folds.  The staged
path is what the TPU runs at N=512 (experiment_results/direct_tpu/).
"""

from __future__ import annotations

import numpy as np
import pytest

from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator
from fhe_sorting_tpu.core.keys import Keys
from fhe_sorting_tpu.ops.sign import CompositeSignConfig, SignConfig
from fhe_sorting_tpu.parallel.direct_scan import scan_rotation_indices
from fhe_sorting_tpu.parallel.hybrid_staged import (
    StagedHybridSort, hybrid_staged_keys,
)


def test_hybrid_staged_keys_small():
    """Key set stays minimal ({±1} + powers of 4 + batch offsets):
    full-chain keys are ~630 MB each at depth 48 / ring 2^17 / dnum 5, so
    the count decides HBM fit, and every placement fold step must still
    greedy-decompose over the basis."""
    idx = hybrid_staged_keys(512, 131072)
    assert {1, -1, 256} <= idx                    # anchors + Hrot offset
    assert {4, 16, 64, 1024, 4096, 16384} <= idx  # powers-of-4 backbone
    assert len(idx) <= 10
    # every fold amount the N=512 placement requests decomposes
    from fhe_sorting_tpu.ops.rotation import DecomposeAlgo, Decomposer

    dec = Decomposer(sorted(idx), 65536, DecomposeAlgo.NAF)
    T = 256 * 255 // 2
    for a in ([256 >> i for i in range(1, 9)] + [T >> i for i in range(8)]
              + [-1, -255]):
        parts = dec.decompose(a)
        assert sum(parts) % 65536 == a % 65536, a
        assert len(parts) <= 13, (a, parts)


@pytest.mark.slow
def test_hybrid_staged_sort_batched():
    """N=8 with max_array=4 -> num_batch=2 tiles + sign indicator, the
    same code path the TPU N=512 run takes (sort_algo.h:898-981)."""
    RING, N = 512, 8
    ctx = Context(CkksParams(ring_n=RING, mult_depth=38))
    keys = Keys.generate(ctx, seed=0)
    steps = set(scan_rotation_indices(N, RING)) | set(
        hybrid_staged_keys(N, RING))
    keys.gen_rotation_keys(sorted(steps))
    ev = Evaluator(ctx, keys, jit_ops=False)
    cfg = SignConfig(CompositeSignConfig(3, 3, 2))
    srt = StagedHybridSort(ev, N, cfg, max_array=4, indicator_dg=2)
    assert srt.num_batch == 2
    rng = np.random.default_rng(0)
    x = rng.permutation(N) / N + 0.5 / N
    ct = keys.encrypt(x, slots=N)
    out = keys.decrypt(srt(ct), N)
    assert np.abs(out - np.sort(x)).max() < 0.01
