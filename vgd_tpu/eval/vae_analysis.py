"""VAE test/analysis suite.

Capability parity with main_vae.py:215-641 (test_vae and friends):
* denoising test-set evaluation with sum-reduction MSE + KL test loss
  (main_vae.py:258-267) over (noisy, clean) pairs — the reference loads its
  occlusion test set from a pickle (main_vae.py:236-237); here the pairs are
  produced by the same corruption pipeline (or supplied),
* re-noise -> re-encode cycling (main_vae.py:278-283),
* latent traversals: mutate mu[:, dim] / logvar[:, dim] by a delta and
  decode (main_vae.py:322-326, 339-343),
* single-image restoration (test_img, main_vae.py:376-413) — exposed on the
  CLI as ``denoise``.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.eval.metrics import mse_metric, psnr, ssim
from vgd_tpu.models.vae import latent_to_spatial, reparameterize
from vgd_tpu.ops.image import signed_to_unit


def denoise_test_loss(trainer, state, noisy: jax.Array, clean: jax.Array,
                      key: jax.Array) -> Dict[str, float]:
    """Sum-reduction test loss + per-pair quality metrics
    (main_vae.py:258-267; PSNR/SSIM/MSE per README.md:22)."""
    recon = trainer.denoise(state, noisy, key)
    mu, logvar = trainer.encoder.apply(state.encoder.variables(), noisy,
                                       train=False)
    logvar = jnp.clip(logvar, -10, 10)
    recon_sum = jnp.sum(jnp.square(recon - clean))
    kl = -0.5 * jnp.sum(1 + logvar - jnp.square(mu) - jnp.exp(logvar))
    ru, cu = signed_to_unit(recon), signed_to_unit(clean)
    return {"test_loss": float(recon_sum + kl),
            "mse": float(mse_metric(ru, cu)),
            "psnr": float(psnr(ru, cu)),
            "ssim": float(ssim(ru, cu)),
            "recon": recon}


def renoise_cycle(trainer, state, noisy: jax.Array, key: jax.Array,
                  noise_std: float = 0.25, cycles: int = 2):
    """Repeatedly denoise -> re-noise -> re-encode (main_vae.py:278-283).
    Returns the list [recon_1, ..., recon_cycles]."""
    outs = []
    x = noisy
    for i in range(cycles):
        k_eps, k_noise, key = jax.random.split(jax.random.fold_in(key, i), 3)
        recon = trainer.denoise(state, x, k_eps)
        outs.append(recon)
        x = jnp.clip(recon + noise_std *
                     jax.random.normal(k_noise, recon.shape), -1.0, 1.0)
    return outs


def latent_traversal(trainer, state, image: jax.Array, key: jax.Array,
                     dim: int = 0, delta: float = 4.0, steps: int = 3,
                     target: str = "mu") -> jax.Array:
    """Decode while shifting one latent statistic (main_vae.py:322-343):
    target='mu' adds ``delta`` to mu[:, dim] per step; target='logvar'
    shifts logvar[:, dim]. Returns (steps+1, H, W, C) decoded frames."""
    mu, logvar = trainer.encoder.apply(state.encoder.variables(), image,
                                       train=False)
    logvar = jnp.clip(logvar, -10, 10)
    frames = []
    for i in range(steps + 1):
        if target == "mu":
            mu_i = mu.at[:, dim].add(delta * i)
            lv_i = logvar
        else:
            mu_i = mu
            lv_i = jnp.clip(logvar.at[:, dim].add(delta * i), -10, 10)
        z, _ = reparameterize(jax.random.fold_in(key, i), mu_i, lv_i,
                              clamp=False)
        recon = trainer.decoder.apply(state.decoder.variables(),
                                      latent_to_spatial(z), train=False)
        frames.append(recon[0])
    return jnp.stack(frames)
