"""Whole-block flow-stack Pallas kernel (ops/glow_flow_stack.py) vs the
stock per-flow scan.

Interpret-mode Pallas on CPU: block-forward equivalence (values, logdet,
log_p), custom-VJP gradients for EVERY flow parameter vs autodiff of the
stock scan (including the PLU assembly, which lives outside the kernel), and
a short end-to-end train-step trajectory with flow_stack=True.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgd_tpu.models.glow import Glow, calc_loss


def _models(f=24, K=3, blocks=2, cd=jnp.float32):
    stock = Glow(n_flows=K, n_blocks=blocks, filter_size=f,
                 compute_dtype=cd)
    fused = Glow(n_flows=K, n_blocks=blocks, filter_size=f,
                 compute_dtype=cd, flow_stack=True)
    return stock, fused


def test_block_forward_matches_scan():
    stock, fused = _models()
    key = jax.random.key(0)
    params = stock.init(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 3))
    lp0, ld0, z0 = stock.forward(params, x)
    lp1, ld1, z1 = fused.forward(params, x)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp0),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(z0, z1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_block_grads_match_scan():
    stock, fused = _models()
    key = jax.random.key(7)
    params = stock.init(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 3))

    def loss(model, p):
        log_p, logdet, _ = model.forward(p, x)
        l, _, _ = calc_loss(log_p, jnp.mean(logdet), 8, 32.0, n_channels=3)
        return l

    l0, g0 = jax.value_and_grad(lambda p: loss(stock, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(fused, p))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for (path, a), b in zip(flat0, flat1):
        a, b = np.asarray(a), np.asarray(b)
        tol = 5e-4 * (1e-3 + np.abs(a).max())
        assert np.abs(a - b).max() <= tol, \
            (jax.tree_util.keystr(path), float(np.abs(a - b).max()),
             float(tol))


@pytest.mark.parametrize("bt_batch", [2, 4])
def test_batch_tiling_invariance(bt_batch):
    """Different batch sizes exercise different grid tilings; the weight-grad
    accumulation across grid steps must be exact."""
    stock, fused = _models(K=2, blocks=1)
    key = jax.random.key(11)
    params = stock.init(key)
    x = jax.random.normal(jax.random.fold_in(key, 2), (bt_batch, 8, 8, 3))

    def s(model):
        lp, ld, _ = model.forward(params, x)
        return jnp.sum(lp) + jnp.sum(ld)

    np.testing.assert_allclose(float(s(fused)), float(s(stock)), rtol=1e-4)


def test_chunked_calls_match_single_call():
    """chunk=1 (one pallas_call per flow, chained) == chunk=K, values and
    grads — the chunk boundary streams the activation exactly."""
    from vgd_tpu.models.glow import _flow_init
    from vgd_tpu.ops.glow_flow_stack import glow_flow_stack

    K, f, ch = 4, 16, 6
    key = jax.random.key(2)
    flows = jax.vmap(lambda k: _flow_init(k, ch, f, 3, 3))(
        jax.random.split(key, K))
    wt = jax.vmap(Glow._plu_weight)(flows["invconv"]).swapaxes(1, 2)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, ch))

    def loss(flows, x, chunk):
        y = glow_flow_stack(flows, wt, x, (3, 3), (1, 1),
                            compute_dtype=jnp.float32, interpret=True,
                            chunk=chunk)
        return jnp.sum(jnp.tanh(y))

    l1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(flows, x, 1)
    lk, gk = jax.value_and_grad(loss, argnums=(0, 1))(flows, x, K)
    np.testing.assert_allclose(float(l1), float(lk), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(gk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_step_trajectory_matches_stock():
    """5 GlowTrainer steps, flow_stack vs stock, same data/keys."""
    from vgd_tpu.core.config import DataConfig, GlowConfig, RunConfig
    from vgd_tpu.train.glow import GlowTrainer

    rng = np.random.default_rng(0)
    batch = rng.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8)
    key = jax.random.key(5)
    losses = {}
    for fs in (False, True):
        cfg = GlowConfig(
            data=DataConfig(batch_size=4, image_size=(16, 16),
                            normalize=False),
            run=RunConfig(compute_dtype="float32"),
            n_flows=2, n_blocks=2, filter_size=32, flow_stack=fs)
        tr = GlowTrainer(cfg, (16, 16, 3))
        st = tr.init(key, 4)
        st = tr.init_step(st, jnp.asarray(batch), key)
        traj = []
        for i in range(5):
            st, m = tr.train_step(st, jnp.asarray(batch),
                                  jax.random.fold_in(key, i))
            traj.append(float(m["loss"]))
        losses[fs] = traj
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=2e-3, atol=1e-4)


def test_flow_stack_threshold_selects_small_blocks(monkeypatch):
    """int-valued flow_stack applies the kernel only to blocks whose
    squeezed h*w is at or under the threshold; the rest keep the scan."""
    import vgd_tpu.ops.glow_flow_stack as gfs

    calls = []
    real = gfs.glow_flow_stack

    def spy(flows, wt, y, *a, **kw):
        calls.append(y.shape[1] * y.shape[2])
        return real(flows, wt, y, *a, **kw)

    monkeypatch.setattr(gfs, "glow_flow_stack", spy)

    key = jax.random.key(3)
    stock = Glow(n_flows=2, n_blocks=2, filter_size=16)
    params = stock.init(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 3))
    lp0, ld0, _ = stock.forward(params, x)

    # blocks squeeze to 4x4x12 (hw=16) then 2x2x24 (hw=4): threshold 4
    # must route ONLY the deep block through the kernel
    hybrid = Glow(n_flows=2, n_blocks=2, filter_size=16, flow_stack=4)
    lp1, ld1, _ = hybrid.forward(params, x)
    assert calls == [4]
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp0),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0),
                               rtol=1e-5, atol=1e-5)

    calls.clear()
    assert Glow(filter_size=16, flow_stack=False)._use_flow_stack(4) is False
    assert Glow(filter_size=16, flow_stack=True)._use_flow_stack(4096) is True
    assert Glow(filter_size=16, flow_stack=16)._use_flow_stack(16) is True
    assert Glow(filter_size=16, flow_stack=16)._use_flow_stack(64) is False
