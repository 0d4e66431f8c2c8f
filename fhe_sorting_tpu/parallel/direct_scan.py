"""Whole-phase DirectSort: each phase as ONE jitted program, batches scanned.

Single-chip execution path (round-3 verdict #2): instead of dispatching
~10^3 per-op programs per sort (which stresses the TPU relay's dispatch and
D2H paths and dominates warm-up latency), the two sort phases
(constructRank, sort_algo.h:368-506; rotationIndexCheckN, :658-750) are
traced and compiled as TWO XLA programs.  The per-batch work - identical
across batches thanks to the uniform-batch refactoring
rot(x, b*P + j*np) = rot(rot(x, b*P), j*np) - runs as a `jax.lax.scan`
whose body compiles ONCE regardless of num_batch.  Memory stays at
single-batch footprint (the sharded vmap formulation in direct_sharded.py
holds num_batch concurrent sign-evaluation intermediates - too much HBM
for N=1024 on one chip).

Batch offsets cost ONE rotation key instead of num_batch:

  phase 1: the offset-rotated input u_b = rot(x, b*P) rides the scan carry,
           advanced by rot(u, P) each iteration (incremental offsets);
  phase 2: sum_b rot(inner_b, b*P) is recombined by a Horner chain
           acc = inner_b + rot(acc, P) walking b high->low.

The num_batch stacked offset key-switch keys of the vmap formulation
(~5.6 GB at N=1024, ring 2^17) collapse to the single step-P key.

The scan body's op counts are recorded once at trace time and multiplied by
num_batch for the roofline accounting (utils/roofline.py).
"""

from __future__ import annotations

import math
from collections import Counter
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cipher import Ciphertext, Plaintext
from ..core.evaluator import Evaluator
from ..core.keys import KeySwitchKey
from ..models.direct_sort import DirectSort, _default_np
from ..ops.sign import SignConfig, SignFunc
from .direct_sharded import rotation_indices_sharded


@contextmanager
def _bound_state(ev: Evaluator, dev, rot_pack, relin_pack, gs, token=None):
    """Temporarily rebind the evaluator's device state + key-switch keys to
    (possibly traced) values.  The whole-phase programs take keys and tables
    as ARGUMENTS: captured-constant closures would ship ~9 GB of KSK through
    the relay at every compile and defeat the persistent compile cache.
    `token` (a traced int32 zero) keeps mask-roll gathers in-graph - see
    Evaluator._trace_token."""
    keys = ev.keys
    old = (keys.rot, keys.relin, ev._dev, ev._trace_token)
    keys.rot = {g: KeySwitchKey(kb, ka) for g, (kb, ka) in zip(gs, rot_pack)}
    keys.relin = KeySwitchKey(*relin_pack)
    ev._dev = dev
    ev._trace_token = token
    try:
        yield
    finally:
        keys.rot, keys.relin, ev._dev, ev._trace_token = old


def scan_rotation_indices(N: int, ring_n: int) -> set:
    """MINIMAL key set for ScanDirectSort: {1, np, P} + the fold steps.

    Each full-chain key-switch key is ~290 MB at ring 2^17/depth 32, so the
    key count decides whether the whole-phase program fits HBM (the 29-key
    set of the per-op path OOM'd the v5e by 4.4 GB).  Baby steps are
    generated INCREMENTALLY (rot by 1 each), giant-step accumulations are
    Horner chains (one rot by np per term), and batch offsets advance by
    one rot-by-P per scan iteration - so only the fold rotations
    (num_slots >> i, all powers of two) need direct keys."""
    max_batch = ring_n // 2
    P = min(N, max_batch // N)
    num_slots = N * P
    np_ = min(_default_np(P, N), P)
    idx = {1, np_}
    if N // P > 1:
        idx.add(P)
    for i in range(1, int(math.log2(P)) + 1):
        idx.add(num_slots >> i)
    idx.discard(0)
    return idx


class ScanDirectSort:
    """DirectSort as two whole-phase jitted programs (single chip).

    Key set: `scan_rotation_indices(N, ring)`.
    """

    def __init__(self, ev: Evaluator, N: int, sign_cfg: SignConfig):
        assert not ev.jit_ops, "ScanDirectSort needs a jit_ops=False Evaluator"
        self.ev = ev
        self.N = N
        self.cfg = sign_cfg
        ring = ev.ctx.params.ring_n
        self.max_batch = ring // 2
        self.P = min(N, self.max_batch // N)
        self.nb = N // self.P
        self.num_slots = N * self.P
        self.np_ = min(_default_np(self.P, N), self.P)
        self.srt = DirectSort(ev, N)   # mask generators + PS evaluator
        self._p1 = None
        self._p2 = None
        self._recording = False
        self._rank_meta = None
        self._out_meta = None
        # roofline tallies, populated by build()
        self.phase_stats = {"constructRank": Counter(),
                            "rotationIndexCheck": Counter()}

    def _fold_stack(self, stacked, meta):
        """Tree modular sum over the leading (batch) axis -> Ciphertext."""
        _, pc = self.ev._active(self.ev._dev, meta[0])
        from ..core.modmath import add_mod

        nb = stacked.shape[0]
        while nb > 1:
            half = nb // 2
            lo = stacked[:half]
            hi = stacked[half : 2 * half]
            rest = stacked[2 * half :]
            s = add_mod(lo, hi, pc.p[None, None])
            stacked = jnp.concatenate([s, rest]) if rest.shape[0] else s
            nb = stacked.shape[0]
        return Ciphertext(stacked[0], *meta)

    def build(self, example: Ciphertext):
        ev, srt, cfg = self.ev, self.srt, self.cfg
        N, P, nb, np_ = self.N, self.P, self.nb, self.np_
        num_slots = self.num_slots
        meta0 = (example.level, example.sdeg, example.slots)

        # keys + device tables as program ARGUMENTS (see _bound_state)
        keys_obj = ev.keys
        gs = tuple(sorted(keys_obj.rot))
        self._gs = gs
        rot_pack0 = tuple((keys_obj.rot[g].kb, keys_obj.rot[g].ka)
                          for g in gs)
        relin_pack0 = (keys_obj.relin.kb, keys_obj.relin.ka)
        self._packs = (ev._dev, rot_pack0, relin_pack0)

        J = P // np_
        I2 = (num_slots // N) // np_
        stretch = 1.0 + 4.0 / N
        alpha = 1.0 / (2.0 * N * stretch)
        from ..utils.sinc_coeffs import doubled_sinc_coefficients

        coeffs = doubled_sinc_coefficients(N, stretch=stretch)
        checks = np.stack([
            srt._checking_vector_n(num_slots, b * P) * alpha
            for b in range(nb)
        ])

        meta_cells: dict = {}

        def remember(tag, ct: Ciphertext) -> Ciphertext:
            meta_cells.setdefault(tag, (ct.level, ct.sdeg, ct.slots))
            return ct

        def counted(tag, body):
            """Record the body's op tally once (trace time), scaled by nb.
            Only the build()-time eval_shape pass records (self._recording);
            later jit retraces would double-count."""
            def inner(carry, xs):
                before = ev.op_stats.copy()
                out = body(carry, xs)
                if self._recording:
                    delta = ev.op_stats - before
                    self.phase_stats[tag] += Counter(
                        {k: v * nb for k, v in delta.items()})
                ev.op_stats = before  # body ops live in phase_stats only
                return out
            return inner

        # ---- phase 1: constructRank ----------------------------------------
        def p1_body(u_data, _):
            u = Ciphertext(u_data, *meta0)
            # incremental baby steps: rot-by-1 chain (one key, serialized
            # key-switch temps instead of np_ concurrent ModUps)
            babies = [u]
            for i in range(1, np_):
                babies.append(ev.rotate(babies[-1], 1))
            babies = [b.set_slots(num_slots) for b in babies]
            base = srt._mask_block(num_slots, 0, N)
            # Horner giant accumulation: sum_j rot(T_j, j*np) with only the
            # step-np key, walking j high -> low
            shifted = None
            for j in range(J - 1, -1, -1):
                T = None
                for i in range(np_):
                    r = (np_ * j + i) * N + j * np_
                    term = ev.mult_plain_at(babies[i], base, roll=r)
                    T = term if T is None else ev.add(T, term)
                shifted = T if shifted is None else ev.add(
                    T, ev.rotate(shifted, np_))
            c = srt.comp.compare(p1_body.dup, shifted,
                                 SignFunc.CompositeSign, cfg)
            # incremental batch offset: u <- rot(u, P) for the next batch
            if nb > 1:
                u_next = ev.rotate(u, P).data
            else:
                u_next = u_data
            return u_next, remember("cmp", c).data

        def phase1(data, dev, rot_pack, relin_pack):
            with _bound_state(ev, dev, rot_pack, relin_pack, gs):
                inp = Ciphertext(data, *meta0)
                p1_body.dup = inp.set_slots(num_slots)
                body = counted("constructRank", p1_body)
                if nb > 1:
                    _, cs = jax.lax.scan(body, data, None, length=nb)
                else:
                    _, c_data = body(data, None)
                    cs = c_data[None]
                rank = self._fold_stack(cs, meta_cells["cmp"])
                for i in range(1, int(math.log2(P)) + 1):
                    rank = ev.add(rank, ev.rotate(rank, num_slots >> i))
                rank = rank.set_slots(N)
                rank = ev.sub(rank, 0.5)
                self._rank_meta = (rank.level, rank.sdeg, rank.slots)
                return rank.data

        # ---- phase 2: rotationIndexCheckN ----------------------------------
        def p2_body(_, check_data):
            imr, input2 = p2_body.state
            pt = Plaintext(check_data, imr.level, imr.sdeg, num_slots)
            ri = ev._sub_pt(imr, pt, ev._dev)
            ri = srt.ps.evaluate(ri, coeffs)
            masked = ev.mult(ri, input2)
            # incremental pre-rotations (rot-by-1 chain; replaces the
            # hoisted per-i rotations that needed keys 1..np_-1)
            mrots = [masked]
            for j in range(1, np_):
                mrots.append(ev.rotate(mrots[-1], 1))
            base2 = srt._mask_block(num_slots, 0, N)
            # Horner giant accumulation with the single step-np key
            inner = None
            for i in range(I2 - 1, -1, -1):
                tmp = None
                for j in range(np_):
                    r = (np_ * i + j) * N - j
                    term = ev.mult_plain_at(mrots[j], base2, roll=r)
                    tmp = term if tmp is None else ev.add(tmp, term)
                inner = tmp if inner is None else ev.add(
                    tmp, ev.rotate(inner, np_))
            return None, remember("inner", inner).data

        def phase2(rank_data, data, dev, rot_pack, relin_pack):
            with _bound_state(ev, dev, rot_pack, relin_pack, gs):
                rank = Ciphertext(rank_data, *self._rank_meta)
                inp = Ciphertext(data, *meta0)
                if rank.sdeg == 2:
                    rank = ev.rescale(rank)
                idx_pt = ev.make_plaintext(srt._index_vector(), rank.level,
                                           rank.sdeg, slots=N)
                imr = ev.rsub(idx_pt, rank).set_slots(num_slots)
                imr = ev.mult(imr, alpha)
                if imr.sdeg == 2:
                    imr = ev.rescale(imr)
                check_pts = jnp.stack([
                    ev.make_plaintext(checks[b], imr.level, imr.sdeg,
                                      slots=num_slots).data
                    for b in range(nb)
                ])
                p2_body.state = (imr, inp.set_slots(num_slots))
                body = counted("rotationIndexCheck", p2_body)
                if nb > 1:
                    _, inners = jax.lax.scan(body, None, check_pts)
                else:
                    _, i_data = body(None, check_pts[0])
                    inners = i_data[None]
                meta_i = meta_cells["inner"]
                # Horner recombination of sum_b rot(inner_b, b*P) with the
                # single step-P key: acc = inner_b + rot(acc, P), b high->low
                out = Ciphertext(inners[nb - 1], *meta_i)
                for b in range(nb - 2, -1, -1):
                    out = ev.add(Ciphertext(inners[b], *meta_i),
                                 ev.rotate(out, P))
                for i in range(1, int(math.log2(P)) + 1):
                    out = ev.add(out, ev.rotate(out, num_slots >> i))
                out = out.set_slots(N)
                self._out_meta = (out.level, out.sdeg, out.slots)
                return out.data

        # one abstract pass per phase: pins meta cells AND tallies the op
        # counts (phase_stats) exactly once
        for c in self.phase_stats.values():
            c.clear()
        self._recording = True
        ev.op_stats, saved = Counter(), ev.op_stats
        packs = self._packs
        r_sds = jax.eval_shape(
            phase1, jax.ShapeDtypeStruct(example.data.shape, jnp.uint32),
            *packs)
        self.phase_stats["constructRank"] += ev.op_stats
        ev.op_stats = Counter()
        jax.eval_shape(
            phase2, jax.ShapeDtypeStruct(r_sds.shape, r_sds.dtype),
            jax.ShapeDtypeStruct(example.data.shape, jnp.uint32), *packs)
        self.phase_stats["rotationIndexCheck"] += ev.op_stats
        ev.op_stats = saved
        self._recording = False

        self._p1 = jax.jit(phase1)
        self._p2 = jax.jit(phase2)
        return self

    # -- execution ---------------------------------------------------------

    def construct_rank(self, ct: Ciphertext) -> Ciphertext:
        if self._p1 is None:
            self.build(ct)
        return Ciphertext(self._p1(ct.data, *self._packs), *self._rank_meta)

    def index_check(self, rank: Ciphertext, ct: Ciphertext) -> Ciphertext:
        return Ciphertext(self._p2(rank.data, ct.data, *self._packs),
                          *self._out_meta)

    def __call__(self, ct: Ciphertext) -> Ciphertext:
        rank = self.construct_rank(ct)
        return self.index_check(rank, ct)
