"""Static HBM accounting: keys x limbs x ring -> bytes, checked on paper.

Round-4 lesson (VERDICT r4 weak #4): two hybrid key-basis redesigns each
discovered HBM OOM *on the chip* although every number needed was static.
This module does the arithmetic up front so a key-basis / phase-residency
plan is validated before any device allocation.

Sizes (all planes are uint32):
  * key-switch key (hybrid HPS, core/keys.py:153-197): kb + ka, each
    [dnum, num_q + num_sp, ring_n]           -> 2*dnum*(Lq+K)*n*4 bytes
  * ciphertext at level l (core/cipher.py): [2, limbs_at(l), ring_n]
                                            -> 2*Ll*n*4 bytes
  * NTT twiddle tables etc. are O(limbs * n) once per context - counted
    via the `overhead_frac` safety margin rather than itemized.
"""

from __future__ import annotations

# TPU v5e (the bench chip) has 16 GiB HBM; leave headroom for XLA scratch,
# fusion temporaries and the relay's deferred frees.
DEFAULT_HBM_GB = 16.0
DEFAULT_HEADROOM_FRAC = 0.20


def ksk_bytes(ctx) -> int:
    """One key-switch key (rotation/relin/conj) resident size in bytes."""
    n = ctx.params.ring_n
    return 2 * ctx.params.dnum * (ctx.num_q + ctx.num_sp) * n * 4


def ct_bytes(ctx, level: int = 0) -> int:
    """One ciphertext at `level` in bytes."""
    return 2 * ctx.limbs_at(level) * ctx.params.ring_n * 4


def phase_bytes(ctx, n_rot_keys: int, n_cts: int, *, relin: bool = True,
                work_cts: int = 4) -> int:
    """Resident bytes for one execution phase.

    n_rot_keys : rotation keys resident during the phase
    n_cts      : long-lived ciphertexts (inputs + accumulators)
    work_cts   : transient ciphertext-sized XLA temporaries in flight
    """
    total = (n_rot_keys + (1 if relin else 0)) * ksk_bytes(ctx)
    total += (n_cts + work_cts) * ct_bytes(ctx, 0)
    return total


def check_phase(ctx, n_rot_keys: int, n_cts: int, *, relin: bool = True,
                work_cts: int = 4, hbm_gb: float = DEFAULT_HBM_GB,
                headroom_frac: float = DEFAULT_HEADROOM_FRAC,
                label: str = "phase") -> dict:
    """Account one phase and raise if it cannot fit the chip's HBM."""
    used = phase_bytes(ctx, n_rot_keys, n_cts, relin=relin,
                       work_cts=work_cts)
    budget = hbm_gb * (1 - headroom_frac) * (1 << 30)
    report = {
        "label": label,
        "ksk_mb": round(ksk_bytes(ctx) / (1 << 20), 1),
        "ct_mb": round(ct_bytes(ctx, 0) / (1 << 20), 1),
        "n_rot_keys": n_rot_keys,
        "n_cts": n_cts,
        "used_gb": round(used / (1 << 30), 2),
        "budget_gb": round(budget / (1 << 30), 2),
        "fits": used <= budget,
    }
    if not report["fits"]:
        raise MemoryError(
            f"HBM budget: {label} needs {report['used_gb']} GB "
            f"({n_rot_keys} rot keys x {report['ksk_mb']} MB + "
            f"{n_cts}+{work_cts} cts x {report['ct_mb']} MB) "
            f"> {report['budget_gb']} GB available "
            f"({hbm_gb} GB HBM - {headroom_frac:.0%} headroom)")
    return report
