"""Test helpers (reference tests/utils.h parity)."""

import numpy as np


def vector_with_min_diff(n: int, min_v: float = 0.0, max_v: float = 1.0,
                         min_diff: float | None = None, seed: int = 0):
    """Shuffled uniform grid with guaranteed minimum gap
    (tests/utils.h:7-51 parity: the gap ~1/N is what the sign precision
    configuration must resolve)."""
    if min_diff is None:
        min_diff = (max_v - min_v) / n
    rng = np.random.default_rng(seed)
    max_steps = int((max_v - min_v) / min_diff)
    assert max_steps >= n
    steps = rng.choice(max_steps, size=n, replace=False)
    vals = min_v + steps * min_diff
    rng.shuffle(vals)
    return vals.astype(np.float64)
