"""Pallas kernel tests (interpret mode on CPU): flash attention and fused
GroupNorm+SiLU match their XLA references; fallbacks trigger on ragged
shapes; the fused UNet produces the same outputs as the stock UNet."""
import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.models.unet import UNet
from vgd_tpu.ops.pallas_kernels import (attention_xla, flash_attention,
                                        groupnorm_silu, groupnorm_silu_xla)

KEY = jax.random.key(0)


def test_flash_attention_matches_xla_interpret():
    b, n, m, d = 2, 128, 128, 32
    q = jax.random.normal(KEY, (b, n, d))
    k = jax.random.normal(jax.random.fold_in(KEY, 1), (b, m, d))
    v = jax.random.normal(jax.random.fold_in(KEY, 2), (b, m, d))
    ref = attention_xla(q, k, v)
    out = flash_attention(q, k, v, block_q=64, block_kv=64,
                          force="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_flash_attention_cross_shape():
    """Cross-attention layout: many queries, few kv tokens
    (diffusion_model.py:63-85)."""
    b, n, m, d = 2, 256, 64, 32
    q = jax.random.normal(KEY, (b, n, d))
    k = jax.random.normal(jax.random.fold_in(KEY, 1), (b, m, d))
    v = jax.random.normal(jax.random.fold_in(KEY, 2), (b, m, d))
    ref = attention_xla(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_kv=64,
                          force="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_flash_attention_ragged_falls_back():
    """N not divisible by the block -> identical to XLA (fallback)."""
    q = jax.random.normal(KEY, (1, 100, 32))
    k = jax.random.normal(KEY, (1, 100, 32))
    v = jax.random.normal(KEY, (1, 100, 32))
    np.testing.assert_array_equal(np.asarray(flash_attention(q, k, v)),
                                  np.asarray(attention_xla(q, k, v)))


def test_groupnorm_silu_matches_xla_interpret():
    x = jax.random.normal(KEY, (2, 8, 8, 32))
    scale = 1.0 + 0.1 * jax.random.normal(KEY, (32,))
    bias = 0.1 * jax.random.normal(jax.random.fold_in(KEY, 1), (32,))
    ref = groupnorm_silu_xla(x, scale, bias, groups=8)
    out = groupnorm_silu(x, scale, bias, groups=8, force="pallas",
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_groupnorm_silu_matches_torch_semantics():
    """Golden check of GroupNorm math vs torch.nn.GroupNorm + SiLU."""
    import pytest
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    gn = torch.nn.GroupNorm(8, 32)
    with torch.no_grad():
        gn.weight.copy_(torch.linspace(0.5, 1.5, 32))
        gn.bias.copy_(torch.linspace(-0.1, 0.1, 32))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref = torch.nn.functional.silu(gn(xt)).permute(0, 2, 3, 1).numpy()
    out = groupnorm_silu_xla(jnp.asarray(x),
                             jnp.linspace(0.5, 1.5, 32),
                             jnp.linspace(-0.1, 0.1, 32), groups=8)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_fused_unet_matches_stock_unet():
    """fused=True must be a pure execution-path switch: identical params,
    identical outputs (on CPU both routes run the XLA fallback, proving the
    wiring introduces no math changes)."""
    stock = UNet(out_ch=3, base_ch=16, time_emb_dim=32, attention=True)
    fused = UNet(out_ch=3, base_ch=16, time_emb_dim=32, attention=True,
                 fused=True)
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    t = jnp.array([3, 7], jnp.int32)
    variables = stock.init(KEY, x, t)
    y0 = stock.apply(variables, x, t)
    y1 = fused.apply(variables, x, t)   # same tree must be accepted
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)


def test_attention_vjp_gradients_match_xla():
    """The custom-VJP flash kernels (training path) must reproduce XLA's
    gradients for q, k, v — interpret mode so this runs on CPU."""
    from vgd_tpu.ops.pallas_kernels import attention

    rng = np.random.default_rng(0)
    b, n, m, d = 2, 256, 256, 32
    q = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, m, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, m, d)).astype(np.float32))

    def loss_p(q, k, v):
        o = attention(q, k, v, block_q=128, block_kv=128, force="pallas",
                      interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_x(q, k, v):
        return jnp.sum(jnp.sin(attention_xla(q, k, v)))

    o_p = attention(q, k, v, block_q=128, block_kv=128, force="pallas",
                    interpret=True)
    np.testing.assert_allclose(np.asarray(o_p),
                               np.asarray(attention_xla(q, k, v)),
                               rtol=1e-5, atol=1e-5)
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_attention_dispatcher_small_shapes_use_xla():
    """Sub-threshold token counts (and CPU backends) must silently take the
    XLA form — gradients flow through stock autodiff."""
    from vgd_tpu.ops.pallas_kernels import attention

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))
    out = attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(attention_xla(q, k, v)),
                               rtol=1e-6, atol=1e-6)
    g = jax.grad(lambda q: jnp.sum(attention(q, k, v)))(q)
    assert np.isfinite(np.asarray(g)).all()
