"""Limb-axis tensor parallelism: sharded ops match single-device bit-exactly.

Runs on the 8-virtual-CPU-device mesh from conftest (stand-in for a TPU
slice).  The claim under test: with ciphertext limb planes sharded over the
mesh, the unchanged evaluator programs still produce identical u32 residues
(GSPMD inserts the base-extension/rescale collectives), and limb-local ops
keep their outputs sharded (no silent full replication).
"""

import jax
import numpy as np
import pytest

from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator
from fhe_sorting_tpu.core.keys import Keys
from fhe_sorting_tpu.parallel.limb_parallel import (
    LimbParallelEvaluator, is_limb_sharded, shard_limbs,
)
from fhe_sorting_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def env():
    # mult_depth 6 + 2 base limbs = 8 fresh limbs: evenly divisible over the
    # 8-device limb axis (device_put requires divisibility at ingest)
    ctx = Context(CkksParams(ring_n=256, mult_depth=6))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys([1, 2, 4])
    mesh = make_mesh(8, axis="limb")
    return ctx, keys, Evaluator(ctx, keys), mesh


def _enc(keys, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, 128)
    return x, keys.encrypt(x)


def test_mult_rescale_limb_sharded(env):
    ctx, keys, ev, mesh = env
    x, ct = _enc(keys, 0)
    ref = ev.rescale(ev.mult(ct, ct))

    lp = LimbParallelEvaluator(ev, mesh)
    ct_sh = lp.ingest(ct)
    assert is_limb_sharded(ct_sh)
    out = ev.rescale(ev.mult(ct_sh, ct_sh))
    np.testing.assert_array_equal(np.asarray(out.data), np.asarray(ref.data))
    got = keys.decrypt(out)
    np.testing.assert_allclose(got, x * x, atol=1e-4)


def test_rotate_limb_sharded(env):
    ctx, keys, ev, mesh = env
    x, ct = _enc(keys, 1)
    ref = ev.rotate(ct, 1)
    out = ev.rotate(shard_limbs(ct, mesh), 1)
    np.testing.assert_array_equal(np.asarray(out.data), np.asarray(ref.data))


def test_add_stays_sharded(env):
    """A limb-local op must not trigger replication of its output."""
    ctx, keys, ev, mesh = env
    _, ct = _enc(keys, 2)
    ct_sh = shard_limbs(ct, mesh)
    out = ev.add(ct_sh, ct_sh)
    assert is_limb_sharded(out)


def test_batch_by_limb_2d_mesh(env):
    """2D ("batch", "limb") mesh: vmapped ciphertext stack sharded on both
    axes still multiplies correctly (composes with mehp24_sharded's axis)."""
    ctx, keys, ev, mesh = env
    del mesh
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh2 = Mesh(devs, ("batch", "limb"))
    _, ct = _enc(keys, 3)
    stack = jax.numpy.stack([ct.data] * 4)          # [B, 2, L, n]
    stack = jax.device_put(
        stack, NamedSharding(mesh2, P("batch", None, "limb", None))
    )
    ref = ev.mult(ct, ct)
    outs = jax.vmap(
        lambda d: ev._mult_ct_impl(
            ct.with_data(d), ct.with_data(d), ev.keys.relin, ev._dev
        ).data
    )(stack)
    for b in range(4):
        np.testing.assert_array_equal(np.asarray(outs[b]), np.asarray(ref.data))
