"""Whole-phase ScanDirectSort tests (parallel/direct_scan.py).

The single-chip execution path of the flagship: each sort phase is ONE
jitted XLA program, per-batch work scanned with incremental-offset /
Horner-recombination rotations over the MINIMAL key set {1, np, P, folds}.
Mirrors DirectSortNTest's insecure-fast scale ladder
(/root/reference/tests/DirectSortNTest.cpp:24-27).
"""

import numpy as np
import pytest

from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator
from fhe_sorting_tpu.core.keys import Keys
from fhe_sorting_tpu.ops.sign import CompositeSignConfig, SignConfig
from fhe_sorting_tpu.parallel.direct_scan import (
    ScanDirectSort, scan_rotation_indices,
)
from fhe_sorting_tpu.utils.depth_meter import measure_direct_sort_depth


def _run(N, ring, cn=3, dg=3, df=2):
    cfg = SignConfig(CompositeSignConfig(cn, dg, df))
    depth = measure_direct_sort_depth(N, ring, cfg)["mult_depth"] + 1
    ctx = Context(CkksParams(ring_n=ring, mult_depth=depth))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys(sorted(scan_rotation_indices(N, ring)))
    ev = Evaluator(ctx, keys, jit_ops=False)
    rng = np.random.default_rng(0)
    vals = rng.permutation(N) / N + 0.5 / N
    ct = keys.encrypt(vals)
    srt = ScanDirectSort(ev, N, cfg)
    out = srt(ct)
    got = keys.decrypt(out, N)
    return srt, float(np.abs(got - np.sort(vals)).max())


def test_minimal_key_set():
    """Whole-phase path needs only {1, np, P} + folds (the key count decides
    whether the program fits HBM at ring 2^17)."""
    # N=128 at ring 2^17: P=128, nb=1, np=8 -> {1, 8} + 7 folds
    idx = scan_rotation_indices(128, 131072)
    assert idx == {1, 8, 128, 256, 512, 1024, 2048, 4096, 8192}
    # N=1024 at ring 2^17: P=64, nb=16 -> adds the offset step P=64
    idx = scan_rotation_indices(1024, 131072)
    assert 64 in idx and 1 in idx and 8 in idx
    assert len(idx) <= 9


@pytest.mark.slow
def test_scan_sort_multibatch():
    """N=16 over num_batch=8 scanned batches (the N=1024 geometry)."""
    srt, err = _run(16, 64)
    assert srt.nb == 8
    assert err < 0.01
    # roofline tallies: body ops are multiplied by num_batch
    assert sum(srt.phase_stats["constructRank"].values()) > 100


@pytest.mark.slow
def test_scan_sort_single_batch():
    """nb=1 (the N=128-at-ring-2^17 geometry): no scan, no offset key."""
    srt, err = _run(8, 512, dg=2, df=2)
    assert srt.nb == 1
    assert err < 0.01


@pytest.mark.slow
def test_scan_matches_per_op_ranks():
    """Whole-phase constructRank agrees with the per-op DirectSort path."""
    from fhe_sorting_tpu.models.direct_sort import (
        DirectSort, rotation_indices_direct_sort,
    )
    from fhe_sorting_tpu.ops.sign import SignFunc

    N, ring = 8, 64
    cfg = SignConfig(CompositeSignConfig(3, 2, 2))
    depth = measure_direct_sort_depth(N, ring, cfg)["mult_depth"] + 1
    ctx = Context(CkksParams(ring_n=ring, mult_depth=depth))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys(sorted(
        scan_rotation_indices(N, ring) | rotation_indices_direct_sort(N, ring)
    ))
    rng = np.random.default_rng(1)
    vals = rng.permutation(N) / N + 0.5 / N
    ct = keys.encrypt(vals)

    ev = Evaluator(ctx, keys, jit_ops=False)
    scan = ScanDirectSort(ev, N, cfg)
    rank_scan = keys.decrypt(scan.construct_rank(ct), N)

    ev2 = Evaluator(ctx, keys)
    perop = DirectSort(ev2, N)
    rank_ref = keys.decrypt(
        perop.construct_rank(ct, SignFunc.CompositeSign, cfg), N)
    np.testing.assert_allclose(rank_scan, rank_ref, atol=1e-3)
