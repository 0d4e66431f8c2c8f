"""Chebyshev coefficient codegen for the sinc blind-rotation indicators.

Parity with the reference's build-time tools
(/root/reference/utils/generate_cheb_coeffs.cpp and
generate_cheb_doubled_coeffs.cpp): fit a high-degree Chebyshev series to the
periodic sinc indicator on [-1, 1], zero the structurally-absent terms, trim
negligible ones, and cache.  The reference runs this as a CMake codegen step
emitting C++ headers; here it is a cached numpy computation (the DCT-based
fit handles degree ~13k in milliseconds).

Functions (comparison.h:11-79 parity):
  scaled_sinc_{N}(x)  = sin(pi N x)/(pi N x)                (even)
  doubled_sinc_{N}(x) = scaled_sinc(x) + scaled_sinc(x+1/2)
"""

from __future__ import annotations

import functools

import numpy as np

from ..ops.chebyshev import chebyshev_fit

FIT_DEGREE = 13011  # generate_cheb_coeffs.cpp:14


def scaled_sinc(x: float, N: int) -> float:
    if abs(x) < 1e-10:
        return 1.0
    t = np.pi * N * x
    return float(np.sin(t) / t)


def doubled_sinc(x: float, N: int) -> float:
    return scaled_sinc(x, N) + scaled_sinc(x + 0.5, N)


def _vector_fit(fn, degree: int) -> np.ndarray:
    """chebyshev_fit but with a vectorized fn for speed."""
    n = degree + 1
    theta = (np.arange(n) + 0.5) * np.pi / n
    xs = np.cos(theta)
    ys = fn(xs)
    ext = np.concatenate([ys, ys[::-1]])
    ph = np.exp(-1j * np.pi * np.arange(2 * n) / (2 * n))
    F = np.fft.fft(ext)
    ck = (F * ph).real[:n] / n
    ck[0] *= 0.5
    return ck


def _np_scaled_sinc(xs: np.ndarray, N: int) -> np.ndarray:
    t = np.pi * N * xs
    return np.where(np.abs(xs) < 1e-10, 1.0, np.sin(t) / np.where(t == 0, 1, t))


@functools.lru_cache(maxsize=32)
def sinc_coefficients(N: int, degree: int = FIT_DEGREE, tol: float = 1e-6,
                      stretch: float = 1.0) -> tuple:
    """Even scaled-sinc series for Sinc<2N> (rotationIndexCheck2N path).

    `stretch` > 1 fits f(stretch * y) on y in [-1, 1]: the caller divides the
    argument by `stretch` so that rank-approximation noise cannot push the
    Chebyshev argument outside [-1, 1] (T_k explodes like cosh(k sqrt(2 eps))
    beyond the interval - catastrophic at the ~400+ degrees larger N needs).
    """
    c = _vector_fit(lambda xs: _np_scaled_sinc(stretch * xs, 2 * N), degree)
    c[1::2] = 0.0                      # even function: odd terms are noise
    c[np.abs(c) < tol] = 0.0
    nz = np.nonzero(c)[0]
    return tuple(c[: nz[-1] + 1]) if len(nz) else (0.0,)


@functools.lru_cache(maxsize=32)
def doubled_sinc_coefficients(N: int, degree: int = FIT_DEGREE,
                              tol: float = 1e-8,
                              stretch: float = 1.0) -> tuple:
    """Doubled-sinc series (rotationIndexCheckN path, sort_algo.h:725-728).

    Fits Sinc<2N>::doubled_sinc (generate_cheb_doubled_coeffs.cpp:16): the
    argument is (index - rank - check)/(2N), so the 2N factor makes every
    integer difference hit an exact sinc zero, peaking only at 0 and -N.
    See `sinc_coefficients` for the `stretch` out-of-range guard.
    """
    c = _vector_fit(
        lambda xs: _np_scaled_sinc(stretch * xs, 2 * N)
        + _np_scaled_sinc(stretch * xs + 0.5, 2 * N),
        degree,
    )
    c[np.abs(c) < tol] = 0.0
    nz = np.nonzero(c)[0]
    return tuple(c[: nz[-1] + 1]) if len(nz) else (0.0,)
