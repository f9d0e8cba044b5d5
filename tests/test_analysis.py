"""VAE analysis suite + diffusion evaluator + EEG plotting tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.core.config import DataConfig, RunConfig, VAEConfig
from vgd_tpu.data.corrupt import corrupt
from vgd_tpu.eval.vae_analysis import (denoise_test_loss, latent_traversal,
                                       renoise_cycle)
from vgd_tpu.train.vae import VAETrainer
from vgd_tpu.utils.viz import plot_eeg_signals, save_gif

KEY = jax.random.key(0)


def _vae():
    cfg = VAEConfig(data=DataConfig(image_size=(64, 64), batch_size=4,
                                    noise_max_std=0.5),
                    run=RunConfig(compute_dtype="float32"))
    tr = VAETrainer(cfg, (64, 64, 3))
    return tr, tr.init(KEY, 4)


def test_denoise_test_loss_and_metrics():
    tr, state = _vae()
    clean = jax.random.uniform(KEY, (4, 64, 64, 3)) * 2 - 1
    noisy = corrupt(KEY, clean, 0.25, occlusion=True)
    out = denoise_test_loss(tr, state, noisy, clean, KEY)
    assert np.isfinite(out["test_loss"])
    assert 0 <= out["ssim"] <= 1 or out["ssim"] > -1  # untrained net
    assert out["recon"].shape == clean.shape
    assert np.isfinite(out["psnr"]) and np.isfinite(out["mse"])


def test_renoise_cycle_shapes():
    tr, state = _vae()
    noisy = jax.random.uniform(KEY, (2, 64, 64, 3)) * 2 - 1
    outs = renoise_cycle(tr, state, noisy, KEY, cycles=3)
    assert len(outs) == 3
    for o in outs:
        assert o.shape == noisy.shape
        assert float(jnp.max(jnp.abs(o))) <= 1.0


def test_latent_traversal_changes_output():
    tr, state = _vae()
    img = jax.random.uniform(KEY, (1, 64, 64, 3)) * 2 - 1
    frames_mu = latent_traversal(tr, state, img, KEY, dim=0, delta=4.0,
                                 steps=3, target="mu")
    frames_lv = latent_traversal(tr, state, img, KEY, dim=0, delta=4.0,
                                 steps=2, target="logvar")
    assert frames_mu.shape == (4, 64, 64, 3)
    assert frames_lv.shape == (3, 64, 64, 3)
    # shifting mu by 12 sigma must visibly change the decode
    assert float(jnp.mean(jnp.abs(frames_mu[0] - frames_mu[-1]))) > 1e-4


def test_plot_eeg_and_gif(tmp_path):
    trials = np.random.default_rng(0).normal(0, 1, (2, 22, 160))
    p1 = str(tmp_path / "eeg1.png")
    p2 = str(tmp_path / "eeg2.png")
    plot_eeg_signals(trials, p1)
    plot_eeg_signals(trials[1], p2, n_channels=5)
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0
    gif = str(tmp_path / "anim.gif")
    save_gif([p1, p2], gif, duration_ms=100)
    assert os.path.getsize(gif) > 0
