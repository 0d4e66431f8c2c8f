"""Multi-chip MEHP24 sort: the pairwise-comparison triangle over a mesh.

The reference parallelizes the N>256 MEHP24 path with OpenMP threads over
the O(c^2) pairwise comparison triangle of sub-ciphertexts
(/root/reference/src/mehp24/mehp24_sort.cpp:284-443).  Here the same
structure becomes an SPMD program over a device mesh:

  * sub-ciphertexts are stacked on a leading "parts" axis and sharded over
    the mesh's "batch" axis;
  * the replicate/transpose ladders and the per-part rank folds are vmapped
    - identical static programs per part, zero communication;
  * the comparison triangle is evaluated pair-by-pair on whichever device
    owns the data; XLA GSPMD inserts the ICI collectives for the Cv/Ch
    rank accumulations (the psum equivalent of the reference's
    `#pragma omp critical` merges).

Everything is one jitted program with NamedSharding annotations on the
stacked part axis - the canonical "pick a mesh, annotate shardings, let XLA
insert collectives" recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cipher import Ciphertext
from ..core.evaluator import Evaluator
from ..models.mehp24.sort import Mehp24Sort
from ..ops.compare import Comparison
from ..ops.sign import sign_adv
from .mesh import batch_sharding, make_mesh


class ShardedMehp24:
    """Builds a jitted, mesh-sharded multi-ciphertext sortFG step."""

    def __init__(self, ev: Evaluator, sub_length: int, num_parts: int,
                 dg_c: int = 1, df_c: int = 1, dg_i: int = 1, df_i: int = 1,
                 mesh=None):
        self.ev = ev
        self.sub = sub_length
        self.B = num_parts
        self.cfg = (dg_c, df_c, dg_i, df_i)
        self.mesh = mesh or make_mesh()
        self.srt = Mehp24Sort(ev, sub_length * num_parts, sub_length=sub_length)
        self._jitted = None

    # -- single-part closures (vmapped) -----------------------------------

    def _meta(self, like: Ciphertext):
        return dict(level=like.level, sdeg=like.sdeg, slots=like.slots)

    def build(self, example: Ciphertext):
        """Trace the full sharded step for parts shaped like `example`."""
        ev, mat = self.ev, self.srt.mat
        dg_c, df_c, dg_i, df_i = self.cfg
        B, sub = self.B, self.sub
        total = B * sub
        meta0 = (example.level, example.sdeg, example.slots)

        def as_ct(data, meta):
            return Ciphertext(data, *meta)

        def repl_fn(data):
            ct = as_ct(data, meta0)
            r = mat.replicate_row(ct)
            c = mat.replicate_column(mat.transpose_row(ct, True))
            return (r.data, (r.level, r.sdeg, r.slots),
                    c.data, (c.level, c.sdeg, c.slots))

        # metadata is static: learn it with eval_shape (abstract trace, no
        # compute) - the returned Ciphertext pytrees carry level/sdeg/slots
        probe_r = jax.eval_shape(mat.replicate_row, example)
        probe_c = jax.eval_shape(
            lambda c: mat.replicate_column(mat.transpose_row(c, True)), example
        )
        metaR = (probe_r.level, probe_r.sdeg, probe_r.slots)
        metaC = (probe_c.level, probe_c.sdeg, probe_c.slots)

        pairs = [(j, k) for j in range(B) for k in range(j, B)]
        jidx = np.array([p[0] for p in pairs])
        kidx = np.array([p[1] for p in pairs])

        comp = Comparison(ev)

        def compare_fn(dR, dC):
            ctR = as_ct(dR, metaR)
            ctC = as_ct(dC, metaC)
            out = sign_adv(ev, ev.sub(ctR, ctC), dg_c, df_c)
            return out.data, (out.level, out.sdeg, out.slots)

        # probe compare metadata (abstract)
        probe_cmp = jax.eval_shape(
            lambda r, c: sign_adv(ev, ev.sub(r, c), dg_c, df_c),
            probe_r, probe_c,
        )
        metaCmp = (probe_cmp.level, probe_cmp.sdeg, probe_cmp.slots)

        # rank-fold per part (uniform: j=0 gets a zero Ch, which contributes
        # nothing, so one vmapped program covers every part)
        def rank_fn(cv_data, ch_data):
            cv = as_ct(cv_data, metaCmp)
            s = mat.sum_rows(cv)
            ch = as_ct(ch_data, metaCmp)
            shj = mat.sum_columns(ch, True)
            shj = mat.transpose_column(shj, True)
            shj = mat.replicate_row(shj)
            return ev.add(s, shj)

        probe_s = jax.eval_shape(
            lambda cv, ch: rank_fn(cv.data, ch.data), probe_cmp, probe_cmp
        )
        metaS = (probe_s.level, probe_s.sdeg, probe_s.slots)
        # per-part placement masks, stacked as a traced input
        subm_pts = [
            ev.make_plaintext(
                np.repeat(-(j * sub + np.arange(sub, dtype=np.float64))
                          - 0.5, sub),
                metaS[0], metaS[1], slots=sub * sub,
            )
            for j in range(B)
        ]
        subm_stack = jnp.stack([p.data for p in subm_pts])
        from ..core.cipher import Plaintext

        def place_fn(s_data, dR_data, subm_data):
            sk = as_ct(s_data, metaS)
            pt = Plaintext(subm_data, metaS[0], metaS[1], sub * sub)
            rm = ev._add_pt(sk, pt, ev._dev)
            ind = comp.indicator_adv(rm, float(total), dg_i, df_i)
            return ev.mult(ind, as_ct(dR_data, metaR)).data

        # placement metadata via a dedicated abstract probe
        probe_pl2 = jax.eval_shape(
            lambda s, r, m: ev.mult(
                comp.indicator_adv(
                    ev._add_pt(s, Plaintext(m, metaS[0], metaS[1], sub * sub),
                               ev._dev),
                    float(total), dg_i, df_i),
                r,
            ),
            probe_s, probe_r,
            jax.ShapeDtypeStruct(subm_stack.shape[1:], jnp.uint32),
        )
        meta_pl = (probe_pl2.level, probe_pl2.sdeg, probe_pl2.slots)
        probe_out = jax.eval_shape(
            lambda c: mat.transpose_column(mat.sum_columns(c, True), True),
            probe_pl2,
        )
        self.out_meta = (probe_out.level, probe_out.sdeg, probe_out.slots)

        # combo index arrays for the all-(j,k) placement phase
        j2 = np.repeat(np.arange(B), B)
        k2 = np.tile(np.arange(B), B)

        def step(stacked):
            # stacked: [B, 2, L, n]
            dR = jax.vmap(lambda d: repl_fn(d)[0])(stacked)
            dC = jax.vmap(lambda d: repl_fn(d)[2])(stacked)

            cmp_data = jax.vmap(lambda r, c: compare_fn(r, c)[0])(
                dR[jidx], dC[kidx]
            )

            # Cv/Ch accumulation with modular adds (O(B^2) tiny static ops)
            Cv = [None] * B
            Ch = [None] * B
            for p, (j, k) in enumerate(pairs):
                cj = as_ct(cmp_data[p], metaCmp)
                Cv[j] = cj if Cv[j] is None else ev.add(Cv[j], cj)
                if j != k:
                    ckj = ev.rsub(1.0, cj)
                    Ch[k] = ckj if Ch[k] is None else ev.add(Ch[k], ckj)
            zero = jnp.zeros_like(cmp_data[0])
            cv_stack = jnp.stack([c.data for c in Cv])
            ch_stack = jnp.stack(
                [Ch[j].data if Ch[j] is not None else zero for j in range(B)]
            )

            # one vmapped rank fold for every part
            s_stack = jax.vmap(lambda cv, ch: rank_fn(cv, ch).data)(
                cv_stack, ch_stack
            )

            # phase C: all B^2 (j,k) combos in one vmapped program
            placed = jax.vmap(place_fn)(s_stack[k2], dR[k2], subm_stack[j2])
            accs = []
            for j in range(B):
                acc = None
                for k in range(B):
                    c = as_ct(placed[j * B + k], meta_pl)
                    acc = c if acc is None else ev.add(acc, c)
                accs.append(acc.data)
            acc_stack = jnp.stack(accs)

            out = jax.vmap(
                lambda d: mat.transpose_column(
                    mat.sum_columns(as_ct(d, meta_pl), True), True
                ).data
            )(acc_stack)
            return out
        shard = batch_sharding(self.mesh)
        self._jitted = jax.jit(step, in_shardings=shard, out_shardings=shard)
        self._out_meta_probe = None
        return self._jitted

    def __call__(self, parts):
        """parts: list of Ciphertexts (same metadata). Returns sorted parts."""
        if self._jitted is None:
            self.build(parts[0])
        stacked = jnp.stack([p.data for p in parts])
        out = self._jitted(stacked)
        return [Ciphertext(out[i], *self.out_meta) for i in range(self.B)]
