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

        # rank-fold per part
        def rank_fn(cv_data, ch_data, has_ch):
            cv = as_ct(cv_data, metaCmp)
            s = mat.sum_rows(cv)
            if has_ch:
                ch = as_ct(ch_data, metaCmp)
                shj = mat.sum_columns(ch, True)
                shj = mat.transpose_column(shj, True)
                shj = mat.replicate_row(shj)
                s = ev.add(s, shj)
            return s

        # abstract probes for the aligned rank and placement metadata
        probe_s = jax.eval_shape(
            lambda cv, ch: ev.align_group(
                [rank_fn(cv.data, cv.data, False),
                 rank_fn(cv.data, ch.data, True)]
            )[0],
            probe_cmp, probe_cmp,
        )
        metaS_pre = (probe_s.level, probe_s.sdeg, probe_s.slots)
        pt_probe = ev.make_plaintext(
            np.zeros(sub * sub), metaS_pre[0], metaS_pre[1], slots=sub * sub
        )
        probe_pl = jax.eval_shape(
            lambda s, r: ev.mult(
                comp.indicator_adv(ev.add(s, pt_probe), float(total),
                                   dg_i, df_i),
                r,
            ),
            probe_s, probe_r,
        )
        meta_pl_pre = (probe_pl.level, probe_pl.sdeg, probe_pl.slots)

        # placement per (j, k): indicator(s_k + mask_j) * replR_k
        def build_step():
            def step(stacked):
                # stacked: [B, 2, L, n]
                dR = jax.vmap(lambda d: repl_fn(d)[0])(stacked)
                dC = jax.vmap(lambda d: repl_fn(d)[2])(stacked)

                cmp_data = jax.vmap(compare_fn)(dR[jidx], dC[kidx])[0]

                # Cv/Ch accumulation with modular adds (loop over pairs;
                # the pair count is O(B^2) static)
                Cv = [None] * B
                Ch = [None] * B
                for p, (j, k) in enumerate(pairs):
                    cj = as_ct(cmp_data[p], metaCmp)
                    Cv[j] = cj if Cv[j] is None else ev.add(Cv[j], cj)
                    if j != k:
                        ckj = ev.rsub(1.0, cj)
                        Ch[k] = ckj if Ch[k] is None else ev.add(Ch[k], ckj)

                s = [
                    rank_fn(Cv[j].data, Ch[j].data if Ch[j] is not None
                            else Cv[j].data, Ch[j] is not None)
                    for j in range(B)
                ]
                s = ev.align_group(s)
                metaS = (s[0].level, s[0].sdeg, s[0].slots)
                s_stack = jnp.stack([x.data for x in s])

                # phase C: subSorted[j] = sum_k indicator(s_k + m_j) * replR_k
                out_parts = []
                for j in range(B):
                    subm = np.repeat(
                        -(j * sub + np.arange(sub, dtype=np.float64)) - 0.5, sub
                    )
                    pt = ev.make_plaintext(subm, metaS[0], metaS[1],
                                           slots=sub * sub)

                    def place_fn(s_data, dR_k):
                        sk = as_ct(s_data, metaS)
                        rm = ev.add(sk, pt)
                        ind = comp.indicator_adv(rm, float(total), dg_i, df_i)
                        return ev.mult(ind, as_ct(dR_k, metaR)).data

                    placed = jax.vmap(place_fn)(s_stack, dR)
                    # modular tree-sum over the k axis
                    meta_pl = meta_pl_pre
                    acc = None
                    for k in range(B):
                        c = as_ct(placed[k], meta_pl)
                        acc = c if acc is None else ev.add(acc, c)
                    acc = mat.sum_columns(acc, True)
                    acc = mat.transpose_column(acc, True)
                    out_parts.append(acc.data)
                return jnp.stack(out_parts)

            return step

        step = build_step()
        shard = batch_sharding(self.mesh)
        self._jitted = jax.jit(step, in_shardings=shard, out_shardings=shard)
        self._out_meta_probe = None
        return self._jitted

    def __call__(self, parts):
        """parts: list of Ciphertexts (same metadata). Returns sorted parts."""
        stacked = jnp.stack([p.data for p in parts])
        if self._jitted is None:
            self.build(parts[0])
        out = self._jitted(stacked)
        # output metadata: recompute via a tiny host probe is unnecessary -
        # level equals the traced result; recover from a dry metadata pass
        return out
