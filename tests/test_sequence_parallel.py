"""Ring attention (parallel/sequence_parallel.py) on the 8-device virtual
CPU mesh: forward and gradient parity vs the full-matrix reference
(diffusion_model.py:44-61 semantics), with batch over ``data`` and tokens
over ``model``.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.ops.pallas_kernels import attention_xla
from vgd_tpu.parallel.mesh import build_mesh, shard_tree_replicated
from vgd_tpu.parallel.sequence_parallel import (ring_attention_local,
                                                sp_self_attention)
from jax.sharding import NamedSharding, PartitionSpec as P

KEY = jax.random.key(11)


def _qkv(b=4, n=64, d=32, seed=0):
    ks = jax.random.split(jax.random.fold_in(KEY, seed), 3)
    q = jax.random.normal(ks[0], (b, n, d))
    k = jax.random.normal(ks[1], (b, n, d))
    v = jax.random.normal(ks[2], (b, n, d))
    return q, k, v


def test_ring_matches_full_attention():
    mesh = build_mesh(data=2, model=4)
    q, k, v = _qkv()
    ref = attention_xla(q, k, v)
    sp = NamedSharding(mesh, P("data", "model", None))
    qs, ks, vs = (jax.device_put(x, sp) for x in (q, k, v))
    out = sp_self_attention(mesh, qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_ring_all_devices_on_model_axis():
    mesh = build_mesh(data=1, model=8)
    q, k, v = _qkv(b=2, n=128, d=16, seed=1)
    ref = attention_xla(q, k, v)
    sp = NamedSharding(mesh, P("data", "model", None))
    out = sp_self_attention(mesh, *(jax.device_put(x, sp)
                                    for x in (q, k, v)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_ring_gradients_match():
    mesh = build_mesh(data=2, model=4)
    q, k, v = _qkv(seed=2)
    r = jax.random.normal(jax.random.fold_in(KEY, 9), q.shape)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v) * r)

    def loss_ring(q, k, v):
        return jnp.sum(sp_self_attention(mesh, q, k, v) * r)

    sp = NamedSharding(mesh, P("data", "model", None))
    args = tuple(jax.device_put(x, sp) for x in (q, k, v))
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(*args)
    for gr, gg in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gr),
                                   rtol=5e-5, atol=5e-6)


def test_ring_single_device_axis_degenerates():
    """p=1 ring == plain softmax attention (no permute hops)."""
    mesh = build_mesh(data=8, model=1)
    q, k, v = _qkv(b=8, n=32, d=8, seed=3)
    ref = attention_xla(q, k, v)
    sp = NamedSharding(mesh, P("data", "model", None))
    out = sp_self_attention(mesh, *(jax.device_put(x, sp)
                                    for x in (q, k, v)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
