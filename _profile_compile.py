import os, time
os.environ['JAX_PLATFORMS']='cpu'
import jax, numpy as np, jax.numpy as jnp
from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator, DevState
from fhe_sorting_tpu.core.keys import Keys
from fhe_sorting_tpu.core import ntt as nttm

ctx = Context(CkksParams(ring_n=256, mult_depth=34))
keys = Keys.generate(ctx, seed=0)
ev = Evaluator(ctx, keys)
dev = ev._dev
ct = keys.encrypt(np.linspace(0,1,16))

def t(name, f, *a):
    t0=time.time(); r = f(*a); jax.block_until_ready(r); print(f'{name}: {time.time()-t0:.2f}s', flush=True); return r

# bare ntt on full limbs
x = ct.data
tab = dev.tables.slice(0, ctx.num_q)
t('jit ntt  ', jax.jit(lambda a: nttm.ntt(a, tab)), x)
t('jit intt ', jax.jit(lambda a: nttm.intt(a, tab)), x)
# keyswitch core alone
ks = jax.jit(lambda d, k, dv: ev._keyswitch_core(d, 0, k, dv))
t('jit keyswitch', ks, x[1], keys.relin, dev)
# modup alone
t('jit modup', jax.jit(lambda d, dv: ev._modup(d, 0, dv)), x[1], dev)
# inner product alone
digits = ev._modup(x[1], 0, dev)
t('jit innerprod', jax.jit(lambda ds, k, dv: ev._inner_product(ds, 0, k, dv)), digits, keys.relin, dev)
acc0, _ = ev._inner_product(digits, 0, keys.relin, dev)
t('jit moddown', jax.jit(lambda c, dv: ev._moddown(c, 0, dv)), acc0, dev)
# rescale
ct2 = ev.mult(ct, ct)
t('jit rescale', jax.jit(lambda a, dv: ev._rescale_full(a, dv)), ct2, dev)
