"""Fused Glow coupling kernel (ops/glow_coupling.py) vs the stock XLA chain.

Interpret-mode Pallas on CPU: forward equivalence at every block shape of
the reference config, custom-VJP gradients vs autodiff of the stock chain,
and a short train-step trajectory with the fused path enabled end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgd_tpu.models.glow import Glow
from vgd_tpu.ops.glow_coupling import glow_coupling_nn

# (channels_after_squeeze, spatial) for K=32 L=4 64x64 (nf_code.py:711-722)
BLOCK_SHAPES = [(12, 32), (24, 16), (48, 8), (96, 4)]


def _params(key, cin_half, f, kh, kw):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": {"w": jax.random.normal(k1, (kh, kw, cin_half, f)) * 0.05,
                  "b": jnp.zeros((f,))},
        "conv2": {"w": jax.random.normal(k2, (1, 1, f, f)) * 0.05,
                  "b": jnp.zeros((f,))},
        # non-zero "zero" conv: emulate a trained state so the test is not
        # trivially 0 == 0
        "zero": {"w": jax.random.normal(key, (kh, kw, f, cin_half)) * 0.01,
                 "b": jnp.full((cin_half,), 0.02),
                 "scale": jnp.full((cin_half,), 0.1)},
    }


@pytest.mark.parametrize("ch,size", BLOCK_SHAPES)
def test_fused_forward_matches_stock(ch, size):
    f = 64   # narrow filter keeps interpret-mode runtime sane
    glow = Glow(filter_size=f, compute_dtype=jnp.bfloat16)
    key = jax.random.key(ch)
    p = _params(key, ch // 2, f, 3, 3)
    ya = jax.random.normal(jax.random.fold_in(key, 1),
                           (4, size, size, ch // 2))
    ref = glow._coupling_nn(p, ya)                     # stock XLA chain
    out = glow_coupling_nn(p, ya, (3, 3), (1, 1), interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)


def test_fused_forward_matches_stock_eeg():
    f = 64
    glow = Glow(variant="eeg", filter_size=f, compute_dtype=jnp.float32)
    key = jax.random.key(0)
    p = _params(key, 22, f, 3, 1)
    ya = jax.random.normal(jax.random.fold_in(key, 1), (4, 40, 1, 22))
    ref = glow._coupling_nn(p, ya)
    out = glow_coupling_nn(p, ya, (3, 1), (1, 0), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)


def test_fused_vjp_matches_autodiff():
    f = 32
    ch, size = 12, 8
    glow = Glow(filter_size=f, compute_dtype=jnp.float32)
    key = jax.random.key(3)
    p = _params(key, ch // 2, f, 3, 3)
    ya = jax.random.normal(jax.random.fold_in(key, 1),
                           (2, size, size, ch // 2))
    tgt = jax.random.normal(jax.random.fold_in(key, 2),
                            (2, size, size, ch // 2))

    def loss_stock(p, ya):
        return jnp.sum(jnp.square(glow._coupling_nn(p, ya) - tgt))

    def loss_fused(p, ya):
        return jnp.sum(jnp.square(
            glow_coupling_nn(p, ya, (3, 3), (1, 1),
                             compute_dtype=jnp.float32,
                             interpret=True) - tgt))

    (l0, g0) = jax.value_and_grad(loss_stock, argnums=(0, 1))(p, ya)
    (l1, g1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(p, ya)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-3)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for (path, a), b in zip(flat0, flat1):
        a, b = np.asarray(a), np.asarray(b)
        tol = 2e-3 * (1e-3 + np.abs(a).max())
        assert np.abs(a - b).max() <= tol, \
            (jax.tree_util.keystr(path), float(np.abs(a - b).max()),
             float(tol))


def test_fused_train_step_trajectory_matches_stock():
    """5 GlowTrainer steps, fused vs stock, same data/keys: losses track."""
    from vgd_tpu.core.config import DataConfig, GlowConfig, RunConfig
    from vgd_tpu.train.glow import GlowTrainer

    rng = np.random.default_rng(0)
    batch = rng.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8)
    key = jax.random.key(5)
    losses = {}
    for fused in (False, True):
        cfg = GlowConfig(
            data=DataConfig(batch_size=4, image_size=(16, 16),
                            normalize=False),
            run=RunConfig(compute_dtype="float32"),
            n_flows=2, n_blocks=2, filter_size=32, fused_coupling=fused)
        tr = GlowTrainer(cfg, (16, 16, 3))
        st = tr.init(key, 4)
        st = tr.init_step(st, jnp.asarray(batch), key)
        traj = []
        for i in range(5):
            st, m = tr.train_step(st, jnp.asarray(batch),
                                  jax.random.fold_in(key, i))
            traj.append(float(m["loss"]))
        losses[fused] = traj
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=2e-3, atol=1e-4)
