"""Multi-chip DirectSort: the num_batch loops as a sharded mesh axis.

The reference parallelizes constructRank's and rotationIndexCheck's
per-batch work with OpenMP threads (`#pragma omp parallel for` over
num_batch, /root/reference/src/sort_algo.h:438-492 and 713-742).  Here the
same loops become ONE jitted SPMD program over a device mesh, built on an
algebraic refactoring that makes the batch iterations *uniform*:

    rot(x, is_*P + j*np) = rot(rot(x, j*np), is_*P)

so every batch runs identical masked-rotation programs (shared giant-step
keys, shared masks = batch-0's), and only the "batch offset" rotation by
is_*P differs per batch.  Its key-switch keys are STACKED on the batch axis
and sharded over the mesh - each device holds exactly its own offset key -
and the rank/output accumulations across batches become XLA all-reduces
over ICI (the psum equivalent of the reference's `#pragma omp critical`
merges).  The same refactoring is what makes single-chip N=1024 feasible:
the distinct-key count collapses from O(num_batch * P/np) to
O(P/np + num_batch).

Phase structure (sort_algo.h:368-506, 658-750):
  1. each device rotates the replicated input by its batch offset, builds
     its baby steps and batch-0-shaped vecRots, compares -> partial rank;
     all-reduce over the batch axis + log-tree fold -> rank (replicated).
  2. each device evaluates the doubled-sinc Chebyshev indicator of
     (index - rank - check_b)/2N (its own checking vector), blind-rotates
     with shared giants, applies its batch-offset rotation to the summed
     partial, and the outputs all-reduce + fold into the sorted ciphertext.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cipher import Ciphertext, Plaintext
from ..core.evaluator import Evaluator
from ..core.keys import KeySwitchKey
from ..models.direct_sort import DirectSort, _default_np
from ..ops.sign import SignConfig, SignFunc
from .mesh import batch_sharding, make_mesh, replicated


def rotation_indices_sharded(N: int, ring_n: int) -> set:
    """Keys the sharded formulation needs: babies, batch-independent giants,
    folds.  Batch offsets (is_*P, incl. 0) are generated separately via
    `gen_offset_keys` because offset 0 needs the identity-galois key."""
    max_batch = ring_n // 2
    P = min(N, max_batch // N)
    num_slots = N * P
    np_ = min(_default_np(P, N), P)
    idx = set()
    idx.update(range(1, np_))                    # babies / pre-rotations
    idx.update(j * np_ for j in range(1, P // np_))
    idx.update(i * np_ for i in range(1, (num_slots // N) // np_))
    for i in range(1, int(math.log2(P)) + 1):
        idx.add(num_slots >> i)                  # folds
    idx.discard(0)
    return idx


def gen_offset_keys(keys, offsets):
    """Rotation keys for the batch offsets, INCLUDING rotation 0 (the
    identity galois element g=1): inside the uniform vmapped program every
    batch applies an offset rotation, so batch 0 key-switches with a key
    whose target is s itself (a re-encryption key - tiny extra noise, one
    uniform program for all batches)."""
    rng = np.random.default_rng(11)
    out = []
    for r in offsets:
        g = keys.ctx.galois_element_rot(r)
        if g == 1:
            if 1 not in keys.rot:
                keys.rot[1] = keys._gen_ksk(keys._s_dev, rng)
            out.append(keys.rot[1])
        else:
            if g not in keys.rot:
                keys.rot[g] = keys._gen_ksk(
                    keys._s_dev[:, keys.ctx.galois_perm(g)], rng)
            out.append(keys.rot[g])
    return out


class ShardedDirectSort:
    """Full DirectSort as one mesh-sharded jitted step."""

    def __init__(self, ev: Evaluator, N: int, sign_cfg: SignConfig,
                 mesh=None):
        self.ev = ev
        self.N = N
        self.cfg = sign_cfg
        ring = ev.ctx.params.ring_n
        self.max_batch = ring // 2
        self.P = min(N, self.max_batch // N)
        self.nb = N // self.P
        self.num_slots = N * self.P
        self.np_ = min(_default_np(self.P, N), self.P)
        self.mesh = mesh or make_mesh()
        self.srt = DirectSort(ev, N)  # mask generators + PS evaluator
        self._jitted = None
        self._out_meta = None

    def _perm(self, r: int):
        return self.ev.ctx.galois_perm(self.ev.ctx.galois_element_rot(r))

    def build(self, example: Ciphertext):
        ev, srt = self.ev, self.srt
        N, P, nb, np_ = self.N, self.P, self.nb, self.np_
        num_slots = self.num_slots
        dev = ev._dev
        meta0 = (example.level, example.sdeg, num_slots)
        cfg = self.cfg

        def as_ct(data, meta):
            return Ciphertext(data, *meta)

        # batch-offset rotation keys, stacked on the sharded axis
        offs = [b * P for b in range(nb)]
        off_keys = gen_offset_keys(ev.keys, offs)
        off_kb = jnp.stack([k.kb for k in off_keys])
        off_ka = jnp.stack([k.ka for k in off_keys])
        off_perm = jnp.stack([self._perm(r) for r in offs])

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

        def step(data, off_perm, off_kb, off_ka):
            inp = as_ct(data, meta0)

            # ---- phase 1: sharded rank construction ----
            def p1(perm, kb, ka):
                u = remember("u", ev._automorphism_impl(
                    inp, perm, KeySwitchKey(kb, ka), dev))
                babies = [u if i == 0 else srt.rot.rotate(u, i)
                          for i in range(np_)]
                base = srt._mask_block(num_slots, 0, N)
                shifted = None
                for j in range(J):
                    T = None
                    for i in range(np_):
                        r = (np_ * j + i) * N + j * np_
                        term = ev.mult_plain_at(babies[i], base, roll=r)
                        T = term if T is None else ev.add(T, term)
                    T = srt.rot.rotate(T, j * np_)
                    shifted = T if shifted is None else ev.add(shifted, T)
                c = srt.comp.compare(inp, shifted, SignFunc.CompositeSign,
                                     cfg)
                return remember("cmp", c).data

            cmp_stack = jax.vmap(p1)(off_perm, off_kb, off_ka)
            meta_cmp = meta_cells["cmp"]
            rank = None
            for b in range(nb):
                c = as_ct(cmp_stack[b], meta_cmp)
                rank = c if rank is None else ev.add(rank, c)
            for i in range(1, int(math.log2(P)) + 1):
                rank = ev.add(rank, srt.rot.rotate(rank, num_slots >> i))
            rank = rank.set_slots(N)
            rank = ev.sub(rank, 0.5)

            # ---- phase 2: sharded blind rotation ----
            if rank.sdeg == 2:
                rank = ev.rescale(rank)
            idx_pt = ev.make_plaintext(srt._index_vector(), rank.level,
                                       rank.sdeg, slots=N)
            imr = ev.rsub(idx_pt, rank).set_slots(num_slots)
            imr = ev.mult(imr, alpha)
            if imr.sdeg == 2:
                imr = ev.rescale(imr)
            meta_imr = (imr.level, imr.sdeg, num_slots)
            check_pts = jnp.stack([
                ev.make_plaintext(checks[b], imr.level, imr.sdeg,
                                  slots=num_slots).data
                for b in range(nb)
            ])

            def p2(check_data, perm, kb, ka):
                pt = Plaintext(check_data, meta_imr[0], meta_imr[1],
                               num_slots)
                rot_index = ev._sub_pt(imr, pt, dev)
                rot_index = srt.ps.evaluate(rot_index, coeffs)
                masked = ev.mult(rot_index, inp)
                pre = ev.rotate_precompute(masked)
                mrots = [
                    srt.rot.rotate_hoisted(masked, pre, i) if i else masked
                    for i in range(np_)
                ]
                base2 = srt._mask_block(num_slots, 0, N)
                inner = None
                for i in range(I2):
                    tmp = None
                    for j in range(np_):
                        r = (np_ * i + j) * N - j
                        term = ev.mult_plain_at(mrots[j], base2, roll=r)
                        tmp = term if tmp is None else ev.add(tmp, term)
                    tmp = srt.rot.rotate(tmp, i * np_)
                    inner = tmp if inner is None else ev.add(inner, tmp)
                outer = ev._automorphism_impl(inner, perm,
                                              KeySwitchKey(kb, ka), dev)
                return remember("outer", outer).data

            outer_stack = jax.vmap(p2)(check_pts, off_perm, off_kb, off_ka)
            meta_out = meta_cells["outer"]
            out = None
            for b in range(nb):
                c = as_ct(outer_stack[b], meta_out)
                out = c if out is None else ev.add(out, c)
            for i in range(1, int(math.log2(P)) + 1):
                out = ev.add(out, srt.rot.rotate(out, num_slots >> i))
            out = out.set_slots(N)
            self._out_meta = (out.level, out.sdeg, N)
            return out.data

        shard = batch_sharding(self.mesh)
        repl = replicated(self.mesh)
        self._args = (off_perm, off_kb, off_ka)
        if "limb" in self.mesh.axis_names:
            # 2D mesh: batch-shard the per-batch state AND limb-shard the
            # ciphertext/KSK RNS planes; GSPMD inserts the base-extension /
            # rescale collectives along the limb axis
            from jax.sharding import NamedSharding, PartitionSpec as PSpec

            data_sh = NamedSharding(self.mesh, PSpec(None, "limb", None))
            key_sh = NamedSharding(self.mesh,
                                   PSpec("batch", None, "limb", None))
            in_sh = (data_sh, shard, key_sh, key_sh)
        else:
            in_sh = (repl, shard, shard, shard)
        self._jitted = jax.jit(
            step,
            in_shardings=in_sh,
            out_shardings=repl,
        )
        # abstract pass pins _out_meta (and all meta cells) before execution
        jax.eval_shape(
            step,
            jax.ShapeDtypeStruct(example.data.shape, jnp.uint32),
            jax.ShapeDtypeStruct(off_perm.shape, off_perm.dtype),
            jax.ShapeDtypeStruct(off_kb.shape, jnp.uint32),
            jax.ShapeDtypeStruct(off_ka.shape, jnp.uint32),
        )
        return self._jitted

    def __call__(self, ct: Ciphertext) -> Ciphertext:
        if self._jitted is None:
            self.build(ct)
        out = self._jitted(ct.data, *self._args)
        return Ciphertext(out, *self._out_meta)
