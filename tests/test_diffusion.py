"""DDPM tests: schedule golden values, UNet shapes (attn / no-attn), train
step, compiled ancestral sampler, one-step x0 prediction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgd_tpu.core.config import DataConfig, DiffusionConfig, RunConfig
from vgd_tpu.models.unet import UNet, sinusoidal_embedding
from vgd_tpu.train.diffusion import (DiffusionTrainer, make_schedule,
                                     q_sample, sample_timestep_beta,
                                     sample_timestep_sinusoidal,
                                     sample_timestep_uniform)

KEY = jax.random.key(0)


def small_cfg(attention=True):
    return DiffusionConfig(
        data=DataConfig(image_size=(32, 32), batch_size=4),
        run=RunConfig(compute_dtype="float32"),
        timesteps=50, base_ch=16, time_emb_dim=32, attention=attention)


def test_schedule_golden_values():
    s = make_schedule(1000)
    # train_diffusion.py:35-36: linspace(1e-4, 0.02, 1000)
    np.testing.assert_allclose(float(s.betas[0]), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s.betas[-1]), 0.02, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod),
                               np.cumprod(1 - np.asarray(s.betas)),
                               rtol=1e-5)
    # posterior_variance[0] = beta0*(1-1)/(1-acp0) = 0 (test_diffusion.py:65)
    assert float(s.posterior_variance[0]) == 0.0


def test_q_sample_endpoints():
    s = make_schedule(100)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full((2, 4, 4, 3), 2.0)
    t0 = jnp.zeros((2,), jnp.int32)
    early = q_sample(s, x0, t0, noise)
    # at t=0, alpha_cumprod ~ 1 => mostly x0
    assert abs(float(early[0, 0, 0, 0]) - 1.0) < 0.05


def test_sinusoidal_embedding_shape_and_range():
    emb = sinusoidal_embedding(jnp.arange(4), 32)
    assert emb.shape == (4, 32)
    assert float(jnp.max(jnp.abs(emb))) <= 1.0


@pytest.mark.parametrize("attention", [True, False])
def test_unet_shapes(attention):
    model = UNet(out_ch=3, base_ch=16, time_emb_dim=32, attention=attention)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.zeros((2,), jnp.int32)
    variables = model.init(KEY, x, t)
    y = model.apply(variables, x, t)
    assert y.shape == (2, 32, 32, 3)
    has_attn = any("attn" in k for k in variables["params"])
    assert has_attn == attention


def test_unused_level3_attention_not_in_params():
    """diffusion_model.py:104 defines attn3 but never calls it; we omit it."""
    model = UNet(out_ch=3, base_ch=16, time_emb_dim=32, attention=True)
    variables = model.init(KEY, jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1,), jnp.int32))
    assert "attn3" not in variables["params"]
    assert "attn_bottleneck" in variables["params"]


def test_train_step_loss_decreases():
    tr = DiffusionTrainer(small_cfg(attention=False), (32, 32, 3))
    state = tr.init(KEY, 4)
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (4, 32, 32, 3), dtype=np.uint8))
    losses = []
    for i in range(5):
        state, m = tr.train_step(state, batch, jax.random.fold_in(KEY, i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    vl = tr.eval_loss(state, batch, KEY)      # per-sample eps-MSE
    assert vl.shape == (batch.shape[0],) and np.isfinite(np.asarray(vl)).all()


def test_ancestral_sampler_masking():
    """Start step below T-1: only steps <= t_start may alter x."""
    tr = DiffusionTrainer(small_cfg(attention=False), (32, 32, 3))
    state = tr.init(KEY, 2)
    xt = jax.random.normal(KEY, (2, 32, 32, 3))
    out_full = tr.ancestral_sample(state, xt, jnp.int32(49), KEY)
    out_short = tr.ancestral_sample(state, xt, jnp.int32(3), KEY)
    assert out_full.shape == xt.shape
    assert float(jnp.max(jnp.abs(out_full))) <= 1.0
    # shorter chains run fewer UNet evals => outputs differ
    assert not np.allclose(np.asarray(out_full), np.asarray(out_short))


def test_ddim_full_stride_eta1_equals_ancestral():
    """DDIM at num_steps=T, eta=1 is algebraically the DDPM posterior step
    and draws noise through the identical key-split sequence, so it must
    reproduce ancestral_sample sample-for-sample."""
    tr = DiffusionTrainer(small_cfg(attention=False), (32, 32, 3))
    state = tr.init(KEY, 2)
    xt = jax.random.normal(KEY, (2, 32, 32, 3))
    k = jax.random.fold_in(KEY, 7)
    ref = tr.ancestral_sample(state, xt, jnp.int32(49), k)
    out = tr.ddim_sample(state, xt, k, tr.cfg.timesteps, eta=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=0)


def test_ddim_eta0_deterministic_and_strided():
    """eta=0 makes the chain noise-free: the chain key must not matter.
    A strided chain (S<<T) returns the right shape/range and actually runs
    fewer UNet evals (differs from the full chain)."""
    tr = DiffusionTrainer(small_cfg(attention=False), (32, 32, 3))
    state = tr.init(KEY, 2)
    xt = jax.random.normal(KEY, (2, 32, 32, 3))
    a = tr.ddim_sample(state, xt, jax.random.fold_in(KEY, 1), 10, eta=0.0)
    b = tr.ddim_sample(state, xt, jax.random.fold_in(KEY, 2), 10, eta=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, rtol=0)
    assert a.shape == xt.shape
    assert float(jnp.max(jnp.abs(a))) <= 1.0
    full = tr.ddim_sample(state, xt, KEY, tr.cfg.timesteps, eta=0.0)
    assert not np.allclose(np.asarray(a), np.asarray(full))


def test_ddim_t_start_masking():
    """Subsequence steps above t_start must be inert, matching the
    partial-noise-restoration contract of ancestral_sample."""
    tr = DiffusionTrainer(small_cfg(attention=False), (32, 32, 3))
    state = tr.init(KEY, 2)
    xt = jax.random.normal(KEY, (2, 32, 32, 3))
    full = tr.ddim_sample(state, xt, KEY, 10, eta=0.0)
    part = tr.ddim_sample(state, xt, KEY, 10, eta=0.0,
                          t_start=jnp.int32(5))
    assert not np.allclose(np.asarray(full), np.asarray(part))
    g = tr.generate_ddim(state, (2, 32, 32, 3), KEY, 10)
    assert g.shape == (2, 32, 32, 3)


def test_predict_x0_clipped():
    tr = DiffusionTrainer(small_cfg(attention=False), (32, 32, 3))
    state = tr.init(KEY, 2)
    xt = jax.random.normal(KEY, (2, 32, 32, 3))
    t = jnp.full((2,), 10, jnp.int32)
    x0 = tr.predict_x0(state, xt, t)
    assert float(jnp.max(x0)) <= 1.0 and float(jnp.min(x0)) >= -1.0


def test_alternate_timestep_samplers():
    t_u = sample_timestep_uniform(KEY, 16, 100)
    assert t_u.shape == (16,) and int(t_u.min()) >= 0 and int(t_u.max()) < 100
    t_s = sample_timestep_sinusoidal(16, 100, epoch=3, total_epochs=10)
    # the reference formula (train_diffusion.py:53) maps sampled=1 to t_max
    # itself — an off-by-one preserved for parity
    assert t_s.shape == (16,) and int(t_s.min()) >= 1 and int(t_s.max()) <= 100
    t_b = sample_timestep_beta(KEY, 16, 100)
    assert t_b.shape == (16,) and int(t_b.min()) >= 0 and int(t_b.max()) < 100


def test_ddim_rejects_nonpositive_steps():
    tr = DiffusionTrainer(small_cfg(False), (32, 32, 3))
    state = tr.init(KEY, 2)
    xt = jax.random.normal(KEY, (2, 32, 32, 3))
    with pytest.raises(AssertionError):
        tr.ddim_sample(state, xt, KEY, 0)


def test_ddim_oversampled_dedupes_to_full_chain():
    """num_steps > T produces duplicate taus from rounding; they are deduped
    at trace time, so the oversampled eta=1 chain is exactly the full DDPM
    ancestral chain (each duplicate would have been an algebraic no-op)."""
    tr = DiffusionTrainer(small_cfg(False), (32, 32, 3))
    state = tr.init(KEY, 2)
    xt = jax.random.normal(KEY, (2, 32, 32, 3))
    k = jax.random.fold_in(KEY, 3)
    a = tr.ddim_sample(state, xt, k, tr.cfg.timesteps + 17, eta=1.0)
    b = tr.ddim_sample(state, xt, k, tr.cfg.timesteps, eta=1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
