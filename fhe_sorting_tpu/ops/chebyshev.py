"""Chebyshev-basis polynomial evaluation on ciphertexts (Paterson-Stockmeyer).

TPU-native equivalent of OpenFHE's `EvalChebyshevSeriesPS` /
`EvalChebyshevFunction` surface, which the reference leans on for the sinc
indicator (sort_algo.h:628,727) and the degree-27 g4 composite-sign factor
(sign.cpp:76).  The PS plan (baby/giant steps, Chebyshev divmod tree) is
computed host-side at trace time with numpy float64; only the resulting
linear combinations and ~2*sqrt(d) ciphertext multiplies are traced.

Coefficient convention: f(x) = sum_i c[i] * T_i(x) on [-1, 1] (plain
numpy.polynomial.chebyshev convention, no half-c0).
"""

from __future__ import annotations

import numpy as np

from ..core.cipher import Ciphertext
from ..core.evaluator import Evaluator


def _cheb_divmod_tn(c: np.ndarray, n: int):
    """Divide sum c_i T_i by T_n: returns (q, r) with f = q*T_n + r.

    Uses T_i = 2*T_n*T_{i-n} - T_{|i-2n|} for i > n and T_n*T_0 = T_n.
    """
    d = len(c) - 1
    q = np.zeros(max(d - n + 1, 1), dtype=np.float64)
    r = c.astype(np.float64).copy()
    for i in range(d, n, -1):
        ci = r[i]
        if ci == 0.0:
            continue
        r[i] = 0.0
        q[i - n] += 2.0 * ci
        r[abs(i - 2 * n)] -= ci
    # i == n term: c_n T_n = c_n * T_0 * T_n
    q[0] += r[n]
    r[n] = 0.0
    return np.trim_zeros(q, "b") if q.any() else q[:1], r[: n]


def _trim(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c, dtype=np.float64)
    nz = np.nonzero(c)[0]
    return c[: nz[-1] + 1] if len(nz) else c[:1]


class ChebyshevPS:
    """Reusable PS evaluator bound to an Evaluator."""

    def __init__(self, ev: Evaluator):
        self.ev = ev

    def _plan_shape(self, coeffs):
        """(trimmed coeffs, degree, baby count k, giant degrees)."""
        c = _trim(np.asarray(coeffs, dtype=np.float64))
        d = len(c) - 1
        if d == 0:
            raise ValueError("constant polynomial: nothing to evaluate")
        # baby-step count: power of two near sqrt(d) (power of two keeps the
        # giant-step ladder a pure doubling chain)
        k = 1 << max(1, int(round(np.log2(max(d, 2) ** 0.5))))
        gs = []
        g = 2 * k
        while g <= d:
            gs.append(g)
            g *= 2
        return c, d, k, gs

    def powers(self, x: Ciphertext, coeffs) -> list:
        """Stage 1 of PS: the shared Chebyshev powers as a flat list
        [T_1..T_k, T_2k, T_4k, ...] (the seam for staged execution)."""
        ev = self.ev
        _, d, k, gs = self._plan_shape(coeffs)

        # doubling identities cost ONE level each: the factor 2 is a
        # self-addition (free), never a scalar multiply (which would force an
        # extra rescale level - OpenFHE's EvalChebyshevSeriesPS likewise
        # doubles by EvalAdd)
        def dbl(c: Ciphertext) -> Ciphertext:
            return ev.add(c, c)

        babies = {1: x}
        for i in range(2, k + 1):
            if i % 2 == 0:
                half = babies[i // 2]
                # T_{2m} = 2 T_m^2 - 1
                babies[i] = ev.sub(dbl(ev.square(half)), 1.0)
            else:
                a, b = babies[(i + 1) // 2], babies[i // 2]
                # T_{m+n} = 2 T_m T_n - T_{m-n};  here m-n = 1
                babies[i] = ev.sub(dbl(ev.mult(a, b)), x)

        giants = {k: babies[k]}
        for g in gs:
            giants[g] = ev.sub(dbl(ev.square(giants[g // 2])), 1.0)
        return [babies[i] for i in range(1, k + 1)] + [giants[g] for g in gs]

    def combine(self, pows: list, coeffs) -> Ciphertext:
        """Stage 2 of PS: leaf linear combinations + divmod-tree fold over
        the powers produced by `powers`."""
        c, d, k, gs = self._plan_shape(coeffs)
        babies = {i + 1: pows[i] for i in range(k)}
        giants = {k: babies[k]}
        for idx, g in enumerate(gs):
            giants[g] = pows[k + idx]
        return self._combine_impl(c, d, k, babies, giants)

    def evaluate(self, x: Ciphertext, coeffs) -> Ciphertext:
        return self.combine(self.powers(x, coeffs), coeffs)

    def _combine_impl(self, c, d, k, babies, giants) -> Ciphertext:
        ev = self.ev

        # Pass 1 (host, numpy): build the divmod tree, collecting every
        # degree<=k segment as a "leaf" row.
        leaves: list = []

        def plan(cc: np.ndarray):
            cc = _trim(cc)
            deg = len(cc) - 1
            if deg == 0:
                # constant quotient: caller multiplies the giant-step T_g by
                # the scalar instead of a ciphertext
                return ("const", float(cc[0]))
            if deg <= k:
                leaves.append(cc)
                return ("leaf", len(leaves) - 1)
            gg = k
            while 2 * gg <= deg:
                gg *= 2
            q, r = _cheb_divmod_tn(cc, gg)
            qn = plan(q)
            rr = _trim(r)
            rn = plan(rr) if (len(rr) > 1 or rr[0] != 0.0) else None
            return ("node", gg, qn, rn)

        root = plan(c)

        # Pass 2: ONE batched modular matmul evaluates every leaf segment
        # (sum_i c_i T_i over the shared baby steps) - ~d scalar-mult
        # dispatches collapse into a single MXU op (Evaluator.combo).
        leaf_cts: list = []
        if leaves:
            rows = np.zeros((len(leaves), k), dtype=np.float64)
            consts = np.zeros(len(leaves), dtype=np.float64)
            for i, cc in enumerate(leaves):
                rows[i, : len(cc) - 1] = cc[1:]
                consts[i] = cc[0]
            combo = getattr(ev, "combo", None)
            if combo is not None:
                # chunk the row axis: bounds the [R, 2, L, n] output + digit
                # temporaries (N=1024's ~100 segments would spike HBM), and
                # chunks of a fixed size share one compiled program; at ring
                # 2^17 a 32-row chunk is a ~1.5 GB temp, so large rings cap
                # the chunk at 8
                CH = 32 if ev.ctx.params.ring_n <= (1 << 14) else 8
                baby_list = [babies[i] for i in range(1, k + 1)]
                leaf_cts = []
                for lo in range(0, len(leaves), CH):
                    leaf_cts += combo(baby_list, rows[lo:lo + CH],
                                      consts[lo:lo + CH])
            else:
                leaf_cts = [self._linear_combo(cc, babies) for cc in leaves]

        def fold(node) -> Ciphertext:
            if node[0] == "const":
                return node[1]
            if node[0] == "leaf":
                return leaf_cts[node[1]]
            _, gg, qn, rn = node
            qc = fold(qn)
            if isinstance(qc, float):
                out = ev.mult(giants[gg], qc)
            else:
                out = ev.mult(qc, giants[gg])
            if rn is not None:
                rv = fold(rn)
                out = ev.add(out, rv)
            return out

        return fold(root)

    def _linear_combo(self, cc: np.ndarray, babies) -> Ciphertext:
        """sum_i c_i T_i(x) for deg <= k using precomputed baby steps."""
        ev = self.ev
        out = None
        for i in range(1, len(cc)):
            if cc[i] == 0.0:
                continue
            term = ev.mult(babies[i], float(cc[i]))
            out = term if out is None else ev.add(out, term)
        if out is None:
            # only the constant term
            raise ValueError("degenerate chebyshev segment")
        if cc[0] != 0.0:
            out = ev.add(out, float(cc[0]))
        return out


def chebyshev_fit(fn, degree: int) -> np.ndarray:
    """Chebyshev interpolation of `fn` on [-1,1] at Chebyshev nodes via DCT
    (EvalChebyshevCoefficients parity; O(d log d), handles degree ~13k)."""
    n = degree + 1
    # Chebyshev points of the first kind
    theta = (np.arange(n) + 0.5) * np.pi / n
    xs = np.cos(theta)
    ys = np.asarray([fn(float(v)) for v in xs], dtype=np.float64)
    # DCT-II based coefficients: c_k = (2/n) sum_j y_j cos(k theta_j)
    # computed via FFT of the even extension.
    ext = np.concatenate([ys, ys[::-1]])
    ph = np.exp(-1j * np.pi * np.arange(2 * n) / (2 * n))
    F = np.fft.fft(ext * 1.0)
    ck = (F * ph).real[:n] / n
    ck[0] *= 0.5
    return ck


def eval_chebyshev_function(ev: Evaluator, fn, x: Ciphertext,
                            degree: int) -> Ciphertext:
    """Fit-and-evaluate (EvalChebyshevFunction parity)."""
    return ChebyshevPS(ev).evaluate(x, chebyshev_fit(fn, degree))


def eval_chebyshev_function_ab(ev: Evaluator, fn, x: Ciphertext, degree: int,
                               a: float, b: float) -> Ciphertext:
    """EvalChebyshevFunction with an explicit [a, b] domain: fits fn on
    [a, b], maps x affinely into [-1, 1] (one ct-scalar mult level, as
    OpenFHE's linear transform inside EvalChebyshevSeries does), then PS."""
    if (a, b) == (-1.0, 1.0):
        return eval_chebyshev_function(ev, fn, x, degree)
    mid, half = (a + b) / 2.0, (b - a) / 2.0
    y = ev.mult(ev.sub(x, mid), 1.0 / half)
    return ChebyshevPS(ev).evaluate(
        y, chebyshev_fit(lambda t: fn(mid + half * t), degree)
    )
