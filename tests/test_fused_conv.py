"""Fused Conv4x4s2 + train-BN + LeakyReLU (ops/fused_conv.py).

Checks, on CPU (Pallas in interpret mode):
* forward parity of the Pallas kernel vs the unfused XLA composition, for
  both the encoder geometry (VALID, main_vae.py:23) and the discriminator
  geometry (pad 1, gan_code.py:59-66);
* the custom VJP matches autodiff of the unfused chain for x, w, gamma,
  beta (and conv-bias gradient is identically zero under train-mode BN);
* the fused Encoder/Discriminator branches produce the same variable tree,
  outputs, gradients, and running-stat updates as the stock modules.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.ops.fused_conv import conv_bn_lrelu, conv_bn_lrelu_xla

KEY = jax.random.key(7)


def _inputs(b=4, h=16, c=6, k=12, seed=0):
    ks = jax.random.split(jax.random.fold_in(KEY, seed), 4)
    x = jax.random.normal(ks[0], (b, h, h, c))
    w = jax.random.normal(ks[1], (4, 4, c, k)) * 0.1
    gamma = 1.0 + 0.1 * jax.random.normal(ks[2], (k,))
    beta = 0.1 * jax.random.normal(ks[3], (k,))
    return x, w, gamma, beta


def test_pallas_forward_matches_xla_valid_and_pad():
    x, w, gamma, beta = _inputs()
    for padding, slope in [(0, 0.01), (1, 0.2)]:
        ref_y, ref_m, ref_v = conv_bn_lrelu_xla(x, w, gamma, beta,
                                                padding=padding, slope=slope)
        y, m, v = conv_bn_lrelu(x, w, gamma, beta, padding=padding,
                                slope=slope, force="pallas", interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m), np.asarray(ref_m),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                                   rtol=1e-4, atol=1e-5)


def test_bias_shifts_mean_only():
    x, w, gamma, beta = _inputs(seed=1)
    bias = jnp.linspace(-1.0, 1.0, w.shape[-1])
    y0, m0, v0 = conv_bn_lrelu(x, w, gamma, beta, padding=1, force="xla")
    y1, m1, v1 = conv_bn_lrelu(x, w, gamma, beta, bias=bias, padding=1,
                               force="xla")
    ref_y, ref_m, ref_v = conv_bn_lrelu_xla(x, w, gamma, beta, bias=bias,
                                            padding=1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(ref_m), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(ref_y),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v),
                               rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff():
    x, w, gamma, beta = _inputs(seed=2)
    r = jax.random.normal(jax.random.fold_in(KEY, 9), (4, 8, 8, 12))

    def loss_fused(x, w, gamma, beta):
        y, _, _ = conv_bn_lrelu(x, w, gamma, beta, padding=1, slope=0.2,
                                force="xla")
        return jnp.sum(y * r)

    def loss_ref(x, w, gamma, beta):
        y, _, _ = conv_bn_lrelu_xla(x, w, gamma, beta, padding=1, slope=0.2)
        return jnp.sum(y * r)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)


def test_custom_vjp_pallas_interpret_grads():
    x, w, gamma, beta = _inputs(b=2, h=12, c=4, k=8, seed=3)

    def loss(mode):
        def f(x, w, gamma, beta):
            y, _, _ = conv_bn_lrelu(x, w, gamma, beta, padding=0,
                                    slope=0.01, force=mode,
                                    interpret=(mode == "pallas"))
            return jnp.sum(jnp.square(y))
        return f

    g_p = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    g_x = jax.grad(loss("xla"), argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    for gp, gx in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=2e-4, atol=2e-5)


def test_conv_bias_gradient_is_zero():
    """Under train-mode BN a conv bias cancels in (c - mean(c)); torch
    autograd returns exact zeros for it, and so must the fused op."""
    x, w, gamma, beta = _inputs(seed=4)
    bias = jnp.ones((w.shape[-1],)) * 0.3

    def loss(bias):
        y, _, _ = conv_bn_lrelu(x, w, gamma, beta, bias=bias, padding=1,
                                force="xla")
        return jnp.sum(jnp.square(y))

    g = jax.grad(loss)(bias)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)


def _tree_paths(tree):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(tree)}


def test_encoder_fused_matches_stock():
    from vgd_tpu.models.vae import Encoder
    x = jax.random.normal(KEY, (4, 64, 64, 3))
    stock = Encoder(latent_dim=16)
    fused = Encoder(latent_dim=16, fused=True)
    vars_s = stock.init(jax.random.key(0), x, train=True)
    vars_f = fused.init(jax.random.key(0), x, train=True)
    assert _tree_paths(vars_s) == _tree_paths(vars_f)

    (mu_s, lv_s), upd_s = stock.apply(vars_s, x, train=True,
                                      mutable=["batch_stats"])
    (mu_f, lv_f), upd_f = fused.apply(vars_s, x, train=True,
                                      mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_s),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lv_f), np.asarray(lv_s),
                               rtol=1e-3, atol=1e-4)
    for (ps, ls), (pf, lf) in zip(
            jax.tree_util.tree_leaves_with_path(upd_s),
            jax.tree_util.tree_leaves_with_path(upd_f)):
        assert jax.tree_util.keystr(ps) == jax.tree_util.keystr(pf)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                                   rtol=1e-3, atol=1e-4)

    # gradients agree between the two branches
    def loss(m, variables):
        (mu, lv), _ = m.apply(variables, x, train=True,
                              mutable=["batch_stats"])
        return jnp.sum(jnp.square(mu)) + jnp.sum(jnp.square(lv))

    g_s = jax.grad(lambda p: loss(stock, {**vars_s, "params": p}))(
        vars_s["params"])
    g_f = jax.grad(lambda p: loss(fused, {**vars_s, "params": p}))(
        vars_s["params"])
    for (ps, ls), (pf, lf) in zip(
            jax.tree_util.tree_leaves_with_path(g_s),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(ls), rtol=5e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(ps))


def test_discriminator_fused_matches_stock():
    from vgd_tpu.models.gan import Discriminator
    x = jax.random.normal(KEY, (4, 64, 64, 3))
    stock = Discriminator(img_size=64, ndf=64)
    fused = Discriminator(img_size=64, ndf=64, fused=True)
    vars_s = stock.init(jax.random.key(0), x, train=True)
    vars_f = fused.init(jax.random.key(0), x, train=True)
    assert _tree_paths(vars_s) == _tree_paths(vars_f)

    s_s, upd_s = stock.apply(vars_s, x, train=True, mutable=["batch_stats"])
    s_f, upd_f = fused.apply(vars_s, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_s),
                               rtol=1e-3, atol=1e-4)
    for ls, lf in zip(jax.tree_util.tree_leaves(upd_s),
                      jax.tree_util.tree_leaves(upd_f)):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                                   rtol=1e-3, atol=1e-4)
    # eval mode must be identical code regardless of the flag
    e_s = stock.apply(vars_s, x, train=False)
    e_f = fused.apply(vars_s, x, train=False)
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_s), atol=0)
