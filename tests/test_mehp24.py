"""MEHP24 sort tests (Mehp24SortTest parity at insecure fast params)."""

import numpy as np
import pytest

from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator
from fhe_sorting_tpu.core.keys import Keys
from fhe_sorting_tpu.models.mehp24 import Mehp24Sort
from fhe_sorting_tpu.models.mehp24.utils import (
    MatrixOps, rotation_indices_mehp24,
)
from fhe_sorting_tpu.ops.rotation import RotationComposer

from .utils import vector_with_min_diff

RING = 512
DEPTH = 38
SUB = 8


@pytest.fixture(scope="module")
def env():
    ctx = Context(CkksParams(ring_n=RING, mult_depth=DEPTH))
    keys = Keys.generate(ctx, seed=0)
    steps = rotation_indices_mehp24(SUB) | rotation_indices_mehp24(4)
    steps |= {1 << i for i in range(8)} | {-(1 << i) for i in range(8)}
    steps |= {SUB, -SUB, 2 * SUB, -2 * SUB}
    keys.gen_rotation_keys(sorted(steps))
    return ctx, keys, Evaluator(ctx, keys)


def _encrypt_matrix_input(keys, x, sub):
    """Vector in row 0 of a sub x sub matrix, rest zero."""
    padded = np.zeros(sub * sub)
    padded[: len(x)] = x
    return keys.encrypt(padded, slots=sub * sub)


def test_matrix_ops_plain(env):
    """replicate/transpose/sum ladders against numpy."""
    ctx, keys, ev = env
    n = SUB
    x = np.arange(n) / n + 0.1
    ct = _encrypt_matrix_input(keys, x, n)
    rot = RotationComposer(ev, rotation_indices_mehp24(n))
    mat = MatrixOps(ev, rot, n)

    VR = keys.decrypt(mat.replicate_row(ct), n * n)
    np.testing.assert_allclose(VR, np.tile(x, n), atol=2e-3)

    VC = keys.decrypt(mat.replicate_column(mat.transpose_row(ct, True)), n * n)
    np.testing.assert_allclose(VC, np.repeat(x, n), atol=2e-3)

    # sum of each column of the replicated-row matrix = n * x
    SR = keys.decrypt(mat.sum_rows(mat.replicate_row(ct)), n * n)
    np.testing.assert_allclose(SR[:n], n * x, atol=5e-3)


@pytest.mark.parametrize("N", [4, 8])
def test_sort_fg_single(env, N):
    ctx, keys, ev = env
    x = vector_with_min_diff(N, seed=10 + N)
    # the matrix size must equal N: padding with zeros would sort the zeros
    ct = _encrypt_matrix_input(keys, x, N)
    srt = Mehp24Sort(ev, N, sub_length=N)
    out_ct = srt.sort_fg(ct, dg_c=2, df_c=2, dg_i=2, df_i=2)
    out = keys.decrypt(out_ct, N)
    assert np.abs(out - np.sort(x)).max() < 0.01


@pytest.mark.slow
def test_sort_fg_multi(env):
    """N=16 split over two sub-ciphertexts (the tiling/triangle path)."""
    ctx, keys, ev = env
    N = 16
    x = vector_with_min_diff(N, seed=3)
    srt = Mehp24Sort(ev, N, sub_length=SUB)
    parts = [
        _encrypt_matrix_input(keys, x[:SUB], SUB),
        _encrypt_matrix_input(keys, x[SUB:], SUB),
    ]
    out_parts = srt.sort_fg_multi(parts, dg_c=2, df_c=3, dg_i=2, df_i=3)
    got = np.concatenate([keys.decrypt(p, SUB) for p in out_parts])
    assert np.abs(got - np.sort(x)).max() < 0.01


def test_sort_large_array_fg(env):
    """N > sub_length: split -> multi-ciphertext sortFG -> combine
    (mehp24_sort.cpp:607-645 / splitCiphertext mehp24_utils.cpp:266-302).
    N=8 with sub_length=4 exercises the same split/triangle/combine code
    the reference only reaches at N>256."""
    ctx, keys, ev = env
    N, sub = 8, 4
    x = vector_with_min_diff(N, seed=21)
    srt = Mehp24Sort(ev, N, sub_length=sub)
    ct = _encrypt_matrix_input(keys, x, sub)  # row-0 layout, N spills rows
    # sort() dispatches to sort_large_array_fg when N > sub_length
    padded = np.zeros(sub * sub)
    padded[:N] = x
    ct = keys.encrypt(padded, slots=sub * sub)
    out = srt.sort_large_array_fg(ct, 2, 2, 2, 3)
    got = keys.decrypt(out, N)
    assert np.abs(got - np.sort(x)).max() < 0.01
