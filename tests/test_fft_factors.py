"""Special-FFT factorization: exactness of the level-budget C2S/S2C factors.

Pure-numpy layer (no crypto): the grouped sparse factors must reproduce the
dense canonical-embedding matrix E[t,k] = zeta^(5^t k) and its scaled
conjugate-transpose inverse for every budget, including the round trip.
"""

import numpy as np
import pytest

from fhe_sorting_tpu.core import fft_factors as ff


def _bitrev_perm(nh):
    L = nh.bit_length() - 1
    P = np.zeros((nh, nh))
    for i in range(nh):
        P[i, ff._bitrev(i, L)] = 1.0
    return P


@pytest.mark.parametrize("n", [16, 64, 256])
@pytest.mark.parametrize("budget", [1, 2, 3])
def test_factor_products(n, budget):
    nh = n // 2
    E = ff.embedding_matrix(n)
    P = _bitrev_perm(nh)

    A = np.eye(nh, dtype=complex)
    for G in ff.s2c_factors(n, budget):
        A = ff.dense_from_diags(G, nh) @ A
    B = np.eye(nh, dtype=complex)
    for G in ff.c2s_factors(n, budget):
        B = ff.dense_from_diags(G, nh) @ B

    np.testing.assert_allclose(A, E @ P, atol=1e-12)
    np.testing.assert_allclose(B, P @ np.conj(E.T) / nh, atol=1e-12)
    np.testing.assert_allclose(A @ B, np.eye(nh), atol=1e-12)


def test_unitarity_and_complex_packing():
    """E^{-1} = conj(E)^T/nh, and embed_forward(c) = E (c_lo + i c_hi)."""
    n = 64
    nh = n // 2
    E = ff.embedding_matrix(n)
    np.testing.assert_allclose(E @ np.conj(E.T), nh * np.eye(nh), atol=1e-10)

    from fhe_sorting_tpu.core.encoding import embed_forward

    rng = np.random.default_rng(0)
    c = rng.normal(size=n)
    z = embed_forward(c, n)
    np.testing.assert_allclose(z, E @ (c[:nh] + 1j * c[nh:]), atol=1e-10)


def test_diag_count_drops_with_budget():
    n = 1024
    full = ff.c2s_factors(n, 1)
    assert len(full) == 1 and len(full[0]) == n // 2
    b3 = ff.c2s_factors(n, 3)
    assert len(b3) == 3 and max(len(g) for g in b3) <= 16
