"""Staged MEHP24 multi-ciphertext sort (parallel/mehp24_staged.py).

The N > sub_length tiling regime (sortLargeArrayFG,
/root/reference/src/mehp24/mehp24_sort.cpp:607-645) as a handful of jitted
stage programs over the signed-powers-of-4 key basis.
"""

import numpy as np
import pytest

from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator
from fhe_sorting_tpu.core.keys import Keys
from fhe_sorting_tpu.parallel.mehp24_staged import (
    StagedMehp24Multi, mehp24_staged_keys,
)


def test_pow4_key_basis():
    idx = mehp24_staged_keys(256, 131072)
    assert 256 in idx and -256 in idx
    assert len(idx) <= 18  # ~6 GB of KSKs at ring 2^17 vs ~19 GB faithful


@pytest.mark.slow
def test_staged_mehp24_multi_two_tiles():
    """16 elements over two 8x8 tiles: the exact triangle/Cv/Ch shape of
    the reference's N=512/sub=256 regime, scaled down for CPU."""
    total, sub, ring = 16, 8, 512
    ctx = Context(CkksParams(ring_n=ring, mult_depth=40))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys(sorted(mehp24_staged_keys(sub, ring)))
    ev = Evaluator(ctx, keys, jit_ops=False)
    rng = np.random.default_rng(0)
    vals = rng.permutation(total) / total + 0.5 / total
    pad = np.zeros(sub * sub)
    pad[:total] = vals
    ct = keys.encrypt(pad, slots=sub * sub)
    srt = StagedMehp24Multi(ev, total, sub, dg_c=2, df_c=2, dg_i=3, df_i=2)
    out = srt(ct)
    got = keys.decrypt(out, total)
    err = float(np.abs(got - np.sort(vals)).max())
    assert err < 0.01, err
    assert sum(st.calls for st in srt._stages.values()) < 30
