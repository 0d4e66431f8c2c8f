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
    """Key set stays minimal: batch offsets + halving ladder + power-of-two
    backbone + the two negative NAF anchors (full-chain keys are ~0.5 GB
    each at depth 48 / ring 2^17, so the count decides HBM fit)."""
    idx = hybrid_staged_keys(512, 131072)
    assert {1, -1, -256, 256} <= idx           # anchors + Hrot offset
    assert {128, 64, 32, 16, 8, 4, 2} <= idx   # sumColumns ladder
    assert {512, 1024, 32768} <= idx           # transpose greedy backbone
    # the whole set is small enough to hold full-chain keys in HBM
    assert len(idx) <= 19


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
