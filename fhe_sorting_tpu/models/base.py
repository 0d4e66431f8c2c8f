"""Common sorting-algorithm interface (SortBase parity, sort_algo.h:36-59)."""

from __future__ import annotations

from ..core.cipher import Ciphertext
from ..core.evaluator import Evaluator
from ..ops.sign import SignConfig, SignFunc


class SortBase:
    """Base class: holds the evaluator and the array size N."""

    def __init__(self, ev: Evaluator, N: int):
        self.ev = ev
        self.N = N
        assert N & (N - 1) == 0, "array size must be a power of two"

    def sort(self, ct: Ciphertext, sign_func: SignFunc,
             cfg: SignConfig) -> Ciphertext:
        raise NotImplementedError

    @property
    def array_size(self) -> int:
        return self.N
