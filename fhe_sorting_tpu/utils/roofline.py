"""Speed-of-light accounting for the core FHE kernels on TPU.

BASELINE.md's north star requires per-kernel roofline numbers ("NTT/rotation/
key-switch kernels at speed-of-light HBM/MXU bounds").  This module computes,
from first principles, the bytes moved and MXU/VPU work of each kernel as a
function of (ring_n, limbs, key-switch geometry), and turns measured
wall-clock into a % of the HBM / MXU bound.

Chip peaks default to TPU v5e (one chip):
  HBM   819 GB/s
  MXU   394 TOPS int8 / bf16-with-s8-digits (the four-step NTT and the
        base-extension matmuls run as s8 x s8 -> s32/f32 MXU work)
  VPU   ~ 4 u32 lane-ops/cycle/ALU; modmul via 16x16 partial products is
        ~ 10 VPU ops per u32 mulmod - we fold VPU work into the HBM bound
        (elementwise kernels here are bandwidth-bound at ~4 B/op).

All sizes in bytes, work in MAC units (1 MAC = 2 ops).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ChipSpec:
    name: str = "v5e"
    hbm_bytes_s: float = 819e9
    mxu_macs_s: float = 197e12        # 394 TOPS -> 197e12 MAC/s
    vpu_ops_s: float = 7e12           # ~ for u32 elementwise bound checks


V5E = ChipSpec()


@dataclass
class KernelCost:
    """Bytes through HBM + MXU MACs for one kernel invocation."""

    name: str
    bytes_hbm: float
    macs_mxu: float

    def sol_seconds(self, chip: ChipSpec = V5E) -> float:
        """Speed of light = max(HBM time, MXU time)."""
        return max(self.bytes_hbm / chip.hbm_bytes_s,
                   self.macs_mxu / chip.mxu_macs_s)

    def pct_of_sol(self, measured_s: float, chip: ChipSpec = V5E) -> float:
        return 100.0 * self.sol_seconds(chip) / max(measured_s, 1e-12)

    def bound(self, chip: ChipSpec = V5E) -> str:
        return ("HBM" if self.bytes_hbm / chip.hbm_bytes_s
                >= self.macs_mxu / chip.mxu_macs_s else "MXU")


def ntt_fourstep(n: int, limbs: int, polys: int = 1) -> KernelCost:
    """Fused four-step NTT (pallas_fs_ntt): one HBM read + one write of the
    u32 data block per (limb, poly); twiddle matrices are VMEM-resident and
    amortized across polys (counted once per limb).  MXU work: two
    [n1,n1]x[n1,n2]-shaped digit matmuls with 16 s8 digit-pair products.
    """
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    data = polys * limbs * n * 4
    twiddles = limbs * (n1 * n1 + n2 * n2 + 2 * n1 * n2) * 4  # s8 4-planes+tw
    macs = polys * limbs * 16 * (n1 * n1 * n2 + n1 * n2 * n2)
    return KernelCost("ntt_fourstep", data * 2 + twiddles, macs)


def ntt_butterfly(n: int, limbs: int, polys: int = 1) -> KernelCost:
    """log2(n) strided stages, each a full HBM pass (the XLA lowering)."""
    stages = n.bit_length() - 1
    data = polys * limbs * n * 4
    return KernelCost("ntt_butterfly", data * 2 * stages, 0)


def keyswitch(n: int, limbs: int, num_sp: int, dnum_active: int,
              alpha: int) -> KernelCost:
    """Hybrid key-switch of one [limbs, n] polynomial:
       ModUp: per digit INTT(alpha) + base-ext matmul [T,alpha]@[alpha,n]
              + NTT(T);  T = limbs + num_sp
       inner product: 2 * dnum * T ct*ksk mulmods (HBM-bound: KSK read!)
       ModDown x2: INTT(K) + ext matmul [limbs,K]@[K,n] + NTT(limbs)
    The KSK read (2 * dnum * T * n * 4 B) dominates HBM.
    """
    T = limbs + num_sp
    ntts = []
    ntts.append(ntt_fourstep(n, dnum_active * alpha))        # ModUp INTTs
    ntts.append(ntt_fourstep(n, dnum_active * T))            # ModUp NTTs
    ntts.append(ntt_fourstep(n, 2 * num_sp))                 # ModDown INTTs
    ntts.append(ntt_fourstep(n, 2 * limbs))                  # ModDown NTTs
    ntt_bytes = sum(k.bytes_hbm for k in ntts)
    ntt_macs = sum(k.macs_mxu for k in ntts)
    ext_macs = 16 * n * (dnum_active * T * alpha + 2 * limbs * num_sp)
    ksk_bytes = 2 * dnum_active * T * n * 4
    ip_bytes = ksk_bytes + 2 * T * n * 4 * 2
    return KernelCost("keyswitch", ntt_bytes + ip_bytes + ext_macs / 64,
                      ntt_macs + ext_macs)


def ct_mult(n: int, limbs: int, num_sp: int, dnum_active: int,
            alpha: int) -> KernelCost:
    """ct x ct mult + relinearize: 4 elementwise limb products (HBM) + one
    key-switch."""
    ks = keyswitch(n, limbs, num_sp, dnum_active, alpha)
    elem = 4 * 3 * limbs * n * 4   # read a, b, write out per product
    return KernelCost("ct_mult", ks.bytes_hbm + elem, ks.macs_mxu)


def rescale(n: int, limbs: int, comp: int) -> KernelCost:
    """comp chained single-prime drops: INTT(1) + NTT(L-j-1) + 2 elementwise
    passes per drop, on 2 polys."""
    b = 0.0
    m = 0.0
    for j in range(comp):
        L = limbs - j
        k1 = ntt_fourstep(n, 2 * 1)
        k2 = ntt_fourstep(n, 2 * (L - 1))
        b += k1.bytes_hbm + k2.bytes_hbm + 3 * 2 * (L - 1) * n * 4
        m += k1.macs_mxu + k2.macs_mxu
    return KernelCost("rescale", b, m)


def modup(n: int, limbs: int, num_sp: int, dnum_active: int,
          alpha: int) -> KernelCost:
    """Hoisted-rotation precompute: per digit INTT(alpha) + base-ext matmul
    + NTT(T) (the ModUp half of `keyswitch`)."""
    T = limbs + num_sp
    k1 = ntt_fourstep(n, dnum_active * alpha)
    k2 = ntt_fourstep(n, dnum_active * T)
    ext_macs = 16 * n * dnum_active * T * alpha
    return KernelCost("modup", k1.bytes_hbm + k2.bytes_hbm + ext_macs / 64,
                      k1.macs_mxu + k2.macs_mxu + ext_macs)


def elementwise(n: int, limbs: int, polys: int = 2,
                passes: float = 3.0) -> KernelCost:
    """HBM-bound limb-plane op (add/mult_pt/mult_sc): read+write passes."""
    return KernelCost("elementwise", passes * polys * limbs * n * 4, 0)


def combo_cost(n: int, limbs: int, B: int, R: int) -> KernelCost:
    """Batched PS segment matmul (Evaluator.combo): read B cts + digit temps,
    write R results; MXU work 16 digit-pair [R,B]@[B,2n] matmuls per limb."""
    data = (2 * B + 2 * R) * 2 * limbs * n * 4
    macs = 16 * limbs * R * B * 2 * n
    return KernelCost("combo", data, macs)


def accumulate_sol(ctx, op_stats, chip: ChipSpec = V5E):
    """Sum speed-of-light seconds over an Evaluator.op_stats counter.

    Returns (total_sol_seconds, per-op-kind breakdown dict).  This is the
    wiring BASELINE.md's north star asks for: measured wall-clock divided by
    this bound = % of speed-of-light."""
    n = ctx.params.ring_n
    comp = ctx.params.comp
    total = 0.0
    breakdown: dict = {}

    def add(kind: str, cost: KernelCost, count: int = 1):
        nonlocal total
        s = cost.sol_seconds(chip) * count
        total += s
        breakdown[kind] = breakdown.get(kind, 0.0) + s

    for key, cnt in op_stats.items():
        op, lvl = key[0], key[1]
        lvl = min(lvl, ctx.params.mult_depth)
        L, K, D, alpha = ks_geometry(ctx, lvl)
        if op == "mult_ct":
            add(op, ct_mult(n, L, K, D, alpha), cnt)
        elif op in ("rot", "rot_hoisted"):
            ks = keyswitch(n, L, K, D, alpha)
            add(op, KernelCost(op, ks.bytes_hbm + 3 * 2 * L * n * 4,
                               ks.macs_mxu), cnt)
        elif op == "rot_pre":
            add(op, modup(n, L, K, D, alpha), cnt)
        elif op == "rescale":
            add(op, rescale(n, L, comp), cnt)
        elif op in ("mult_pt", "add"):
            add(op, elementwise(n, L), cnt)
        elif op == "combo":
            _, _, B, R = key
            add(op, combo_cost(n, L, B, R), cnt)
    return total, breakdown


def ks_geometry(ctx, level: int):
    """(limbs, num_sp, dnum_active, alpha) for a Context at `level`."""
    L = ctx.limbs_at(level)
    layout = ctx.digit_layout(level)
    alpha = -(-ctx.num_q // ctx.params.dnum)
    return L, ctx.num_sp, len(layout), alpha


def report(name: str, cost: KernelCost, measured_s: float,
           chip: ChipSpec = V5E) -> str:
    sol = cost.sol_seconds(chip)
    return (f"{name}: measured {measured_s*1e3:.2f} ms, SoL {sol*1e3:.2f} ms "
            f"({cost.bound(chip)}-bound) -> {cost.pct_of_sol(measured_s, chip):.1f}% of SoL")
