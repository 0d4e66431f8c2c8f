"""k-way EvalUtils parity (/root/reference/src/k-way/EvalUtils.{h,cpp}).

The reference groups small ciphertext helpers used by the k-way network in
an EvalUtils class; most of them folded naturally into the evaluator or the
sorter here, and the remainder live in this module:

  * mult_by_int      - EvalUtils.cpp:18-43: exact integer scaling by binary
                       double-and-add (adds are noise-free and level-free,
                       unlike a scalar multiply which costs a rescale level).
  * check_level_and_boot[2] - EvalUtils.cpp:57-94: bootstrap when the
                       remaining depth cannot cover `required_level + 1`.
  * flip_ctxt        - EvalUtils.cpp:96-104: x -> 1 - x (optionally masked).
  * left/right_rotate - EvalUtils.cpp:106-147: binary decomposition into
                       power-of-two keyed rotations.
  * debug_with_sk    - EvalUtils.cpp:149-180: decrypt-print via a
                       secret-key-holding Keys (the DebugEncryption role).
"""

from __future__ import annotations

from ...core.cipher import Ciphertext
from ...core.evaluator import Evaluator


def mult_by_int(ev: Evaluator, ct: Ciphertext, coeff: int) -> Ciphertext:
    """ct * coeff for integer coeff via double-and-add (EvalUtils.cpp:18-43).

    Depth-free: integer scaling by repeated EvalAdd keeps the scale degree
    and level unchanged, which the k-way sorters rely on for their level
    budgets (SortUtils.h:105-111)."""
    if coeff == 0:
        return ev.zeros_like(ct)
    if coeff < 0:
        coeff = -coeff
        out = origin = ev.negate(ct)
    else:
        out = origin = ct
    bits = []
    while coeff > 0:
        bits.append(coeff % 2)
        coeff //= 2
    for i in range(len(bits) - 1, 0, -1):
        out = ev.add(out, out)
        if bits[i - 1]:
            out = ev.add(out, origin)
    return out


def check_level_and_boot(ev: Evaluator, ct: Ciphertext, required_level: int,
                         bootstrap_fn=None, verbose: bool = False
                         ) -> Ciphertext:
    """EvalUtils.cpp:57-86: refresh when mult_depth - level < required + 1."""
    depth = ev.ctx.params.mult_depth
    if depth - ct.level < required_level + 1:
        if bootstrap_fn is None:
            raise RuntimeError(
                f"depth exhausted at level {ct.level} (need {required_level}"
                f"+1 of {depth}) and no bootstrap_fn provided"
            )
        if verbose:
            print(f"bootstrapping at level {ct.level} "
                  f"(mult_depth {depth}, required {required_level})")
        ct = bootstrap_fn(ct)
    return ct


def check_level_and_boot2(ev: Evaluator, ct1: Ciphertext, ct2: Ciphertext,
                          required_level: int, bootstrap_fn=None,
                          verbose: bool = False):
    """EvalUtils.cpp:88-94: the two-ciphertext variant."""
    return (
        check_level_and_boot(ev, ct1, required_level, bootstrap_fn, verbose),
        check_level_and_boot(ev, ct2, required_level, bootstrap_fn, verbose),
    )


def flip_ctxt(ev: Evaluator, ct: Ciphertext, mask=None) -> Ciphertext:
    """EvalUtils.cpp:96-104: 1 - x, or mask - x with a plaintext mask."""
    if mask is None:
        return ev.rsub(1.0, ct)
    neg = ev.negate(ct)
    pt = ev.make_plaintext(mask, neg.level, neg.sdeg, slots=neg.slots)
    return ev.add(neg, pt)


def left_rotate(ev: Evaluator, ct: Ciphertext, r: int) -> Ciphertext:
    """EvalUtils.cpp:106-126: binary decomposition into 2^i EvalRotates."""
    out = ct
    power = 1
    while r > 0:
        if r % 2:
            out = ev.rotate(out, power)
        r //= 2
        power *= 2
    return out


def right_rotate(ev: Evaluator, ct: Ciphertext, r: int) -> Ciphertext:
    """EvalUtils.cpp:128-147."""
    out = ct
    power = 1
    while r > 0:
        if r % 2:
            out = ev.rotate(out, -power)
        r //= 2
        power *= 2
    return out


def debug_with_sk(keys, ct: Ciphertext, length: int = 20,
                  label: str = "") -> None:
    """EvalUtils.cpp:149-180: decrypt-print head/tail + abs-max (requires a
    secret-key-holding Keys, i.e. the DebugEncryption role)."""
    import numpy as np

    vals = keys.decrypt(ct)
    if label:
        print(f"check {label}")
    head = ", ".join(f"({i}, {vals[i]:.6g})" for i in range(min(20, length)))
    tail = ", ".join(
        f"({i}, {vals[i]:.6g})" for i in range(max(0, len(vals) - 20),
                                               len(vals))
    )
    idx = int(np.argmax(np.abs(vals)))
    print(head)
    print(tail)
    print(f"{label} max val = {idx}, {abs(vals[idx]):.6g}")
