"""Single-train-step integration tests for VAE-GAN, denoising VAE, DCGAN and
WGAN (SURVEY.md §4: one step per workload on CPU), plus a sharded-batch
data-parallel run on the 8-device virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgd_tpu.core.config import (DataConfig, GANConfig, RunConfig, VAEConfig,
                                 VAEGANConfig)
from vgd_tpu.parallel.mesh import build_mesh, shard_batch, shard_tree_replicated
from vgd_tpu.train.gan import GANTrainer
from vgd_tpu.train.vae import VAETrainer
from vgd_tpu.train.vaegan import VAEGANTrainer

KEY = jax.random.key(42)
F32 = RunConfig(compute_dtype="float32")


def _batch(b=8, s=64):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8))


def test_vaegan_step_runs_and_learns():
    cfg = VAEGANConfig(data=DataConfig(image_size=(64, 64), batch_size=8),
                       run=F32)
    tr = VAEGANTrainer(cfg, (64, 64, 3))
    state = tr.init(KEY, 8)
    batch = _batch()
    losses = []
    for i in range(4):
        state, m = tr.train_step(state, batch, jax.random.fold_in(KEY, i),
                                 jnp.float32(0.0))
        losses.append(float(m["recon"]))
    assert int(state.step) == 4
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # pixel MSE falls on a repeated batch

    ev = tr.eval_step(state, batch, KEY)
    assert ev["recon"].shape == (8, 64, 64, 3)
    z = jax.random.normal(KEY, (4, cfg.latent_dim))
    assert tr.generate(state, z).shape == (4, 64, 64, 3)


def test_vaegan_d_steps_update_disc_twice():
    """Two D updates per batch => Adam's count is 2x the E/Dec count."""
    cfg = VAEGANConfig(data=DataConfig(image_size=(64, 64), batch_size=4),
                       run=F32)
    tr = VAEGANTrainer(cfg, (64, 64, 3))
    state = tr.init(KEY, 4)
    state, _ = tr.train_step(state, _batch(4), KEY, jnp.float32(0.0))
    assert int(state.disc.opt_state[0].count) == 2     # vaegan_code.py:95
    assert int(state.encoder.opt_state[0].count) == 1


def test_vae_step_runs_and_denoises():
    cfg = VAEConfig(data=DataConfig(image_size=(64, 64), batch_size=8,
                                    noise_max_std=0.5), run=F32)
    tr = VAETrainer(cfg, (64, 64, 3))
    state = tr.init(KEY, 8)
    batch = _batch()
    losses = []
    for i in range(4):
        state, m = tr.train_step(state, batch, jax.random.fold_in(KEY, i),
                                 jnp.float32(0.0))
        losses.append(float(m["recon"]))
    assert losses[-1] < losses[0]
    noisy = jnp.zeros((8, 64, 64, 3))
    out = tr.denoise(state, noisy, KEY)
    assert out.shape == noisy.shape


def test_dcgan_step():
    cfg = GANConfig(data=DataConfig(image_size=(64, 64), batch_size=8),
                    run=F32)
    tr = GANTrainer(cfg, (64, 64, 3))
    state = tr.init(KEY, 8)
    state, m = tr.train_step(state, _batch(), KEY)
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    assert tr.generate(state, jax.random.normal(KEY, (4, 100))).shape \
        == (4, 64, 64, 3)


def test_wgan_step_clips_critic_weights():
    cfg = GANConfig(data=DataConfig(image_size=(64, 64), batch_size=4),
                    run=F32, wgan=True, critic_iters=2)
    tr = GANTrainer(cfg, (64, 64, 3))
    state = tr.init(KEY, 4)
    state, m = tr.train_step_wgan(state, _batch(4), KEY)
    max_abs = max(float(jnp.max(jnp.abs(p)))
                  for p in jax.tree_util.tree_leaves(state.disc.params))
    assert max_abs <= 0.01 + 1e-7                      # gan_code.py:319-320
    assert int(state.disc.opt_state[0].count) == 2


def test_vaegan_data_parallel_mesh():
    """Same jitted step with the batch sharded over an 8-device mesh."""
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    mesh = build_mesh()
    cfg = VAEGANConfig(data=DataConfig(image_size=(64, 64), batch_size=8),
                       run=F32)
    tr = VAEGANTrainer(cfg, (64, 64, 3))
    state = tr.init(KEY, 8)
    state = shard_tree_replicated(mesh, state)
    batch = shard_batch(mesh, np.asarray(_batch(8)))
    state, m = tr.train_step(state, batch, KEY, jnp.float32(0.0))
    assert np.isfinite(float(m["recon"]))
    # params stay replicated after the step
    leaf = jax.tree_util.tree_leaves(state.encoder.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_vaegan_disl_feature_loss_step():
    """The Dis_l feature-reconstruction option (README.md:11-14 names it;
    vaegan_code.py:113 ships pixel MSE) must train end-to-end."""
    cfg = VAEGANConfig(data=DataConfig(image_size=(64, 64), batch_size=4),
                       run=F32, recon_loss="disl")
    tr = VAEGANTrainer(cfg, (64, 64, 3))
    state = tr.init(KEY, 4)
    state, m = tr.train_step(state, _batch(4), KEY, jnp.float32(0.5))
    assert np.isfinite(float(m["recon"])) and np.isfinite(float(m["g_total"]))
    assert int(state.encoder.opt_state[0].count) == 1


def test_glow_tensor_parallel_mesh():
    """Glow coupling filters sharded over the model axis (2 data x 4 model):
    the jitted forward must run, match the replicated result, and keep the
    coupling conv1 kernel sharded on its filter dim."""
    from vgd_tpu.models.glow import Glow
    from vgd_tpu.parallel.tensor_parallel import (shard_glow_batch,
                                                  shard_glow_coupling)

    mesh = build_mesh(data=2, model=4)
    model = Glow(in_channels=3, n_flows=2, n_blocks=2, variant="image",
                 filter_size=32)
    params = model.init(KEY)
    x = jax.random.normal(KEY, (4, 16, 16, 3))
    ref_lp, ref_ld, _ = jax.jit(model.forward)(params, x)

    params_tp = shard_glow_coupling(mesh, params)
    x_tp = shard_glow_batch(mesh, x)
    w1 = params_tp["block0"]["flows"]["coupling"]["conv1"]["w"]
    assert not w1.sharding.is_fully_replicated
    lp, ld, z_outs = jax.jit(model.forward)(params_tp, x_tp)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref_lp),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(float(ld), float(ref_ld), rtol=2e-4,
                               atol=1e-3)


def test_vaegan_epoch_scan_matches_sequential():
    """train_epoch (device-resident lax.scan over the epoch) must produce
    the same state as the sequential per-step path with identical keys."""
    cfg = VAEGANConfig(data=DataConfig(image_size=(64, 64), batch_size=4),
                       run=F32)
    tr = VAEGANTrainer(cfg, (64, 64, 3))
    rng = np.random.default_rng(1)
    stacked = jnp.asarray(rng.integers(0, 255, (3, 4, 64, 64, 3),
                                       dtype=np.uint8))
    s_scan = tr.init(KEY, 4)
    s_scan, m_scan = tr.train_epoch(s_scan, stacked, KEY, jnp.float32(0.3))

    s_seq = tr.init(KEY, 4)
    for i in range(3):
        s_seq, m = tr.train_step(s_seq, stacked[i],
                                 jax.random.fold_in(KEY, i),
                                 jnp.float32(0.3))
    # Not bitwise: XLA fuses the scan body differently from the standalone
    # step, and Adam's early updates are ~sign(g)*lr, so f32 rounding noise
    # amplifies to O(lr) per step. Equivalence tolerance: a few lr (2e-4).
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.encoder.params),
                    jax.tree_util.tree_leaves(s_seq.encoder.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)
    assert np.isfinite(float(m_scan["recon"]))


def test_val_loss_ignores_padded_rows():
    """The eval loaders pad the last batch by repeating its final row
    (data/celeba.py); the loops rebuild val_loss from eval_step's
    per-sample components over the TRUE rows only. Invariance check:
    mutating the pad rows must not change the reconstructed loss (the
    encoder runs with train=False, so rows are independent)."""
    n_valid = 6
    for Cfg, Tr, alpha in ((VAEGANConfig, VAEGANTrainer, None),
                           (VAEConfig, VAETrainer, 1.0)):
        cfg = Cfg(data=DataConfig(image_size=(64, 64), batch_size=8),
                  run=F32)
        a = alpha if alpha is not None else cfg.alpha_kl
        tr = Tr(cfg, (64, 64, 3))
        state = tr.init(KEY, 8)
        batch = np.asarray(_batch())
        pad_repeat = batch.copy()
        pad_repeat[n_valid:] = pad_repeat[n_valid - 1]
        pad_garbage = batch.copy()
        pad_garbage[n_valid:] = 0

        def loss(b):
            ev = tr.eval_step(state, jnp.asarray(b), KEY)
            return (float(jnp.mean(ev["per_mse"][:n_valid]))
                    + a * float(jnp.sum(ev["per_kl"][:n_valid])))

        l_rep, l_garb = loss(pad_repeat), loss(pad_garbage)
        assert np.isfinite(l_rep)
        np.testing.assert_allclose(l_rep, l_garb, rtol=1e-6)
        # the old full-batch scalar DOES move when the pads change —
        # i.e. the per-sample path is load-bearing, not redundant
        ev_r = tr.eval_step(state, jnp.asarray(pad_repeat), KEY)
        ev_g = tr.eval_step(state, jnp.asarray(pad_garbage), KEY)
        assert abs(float(ev_r["val_loss"]) - float(ev_g["val_loss"])) > 0
