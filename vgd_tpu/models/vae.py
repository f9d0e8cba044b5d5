"""Convolutional VAE encoder + reparameterisation.

Capability parity with main_vae.py:20-58: four ConvBlocks
(Conv 4x4 stride 2, VALID padding, bias) + BatchNorm + LeakyReLU(0.01 — the
torch default slope, main_vae.py:25), channels [C_in,32,64,128,256], flatten,
two Dense heads -> (mu, logvar). The reference sizes the flatten dim with a
dummy zero-tensor forward at construction (main_vae.py:43-45); in flax the
lazy Dense input dim falls out of shape inference for free.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Encoder(nn.Module):
    latent_dim: int = 100
    channels: Sequence[int] = (32, 64, 128, 256)  # main_vae.py:37
    dtype: Dtype = jnp.float32
    fused: bool = False   # Pallas fused conv+BN+LeakyReLU on the train path

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jax.Array, jax.Array]:
        h = x.astype(self.dtype)
        for i, ch in enumerate(self.channels):
            # torch Conv2d(k=4, s=2) default padding=0 => VALID (main_vae.py:23)
            if self.fused and train:
                from vgd_tpu.models.blocks import BNParams, ConvParams
                from vgd_tpu.ops.fused_conv import conv_bn_lrelu
                kernel, cbias = ConvParams(ch, h.shape[-1],
                                           name=f"conv{i}")()
                bn = BNParams(ch, name=f"bn{i}")
                scale, bbias, _, _ = bn()
                y, m, v = conv_bn_lrelu(h, kernel.astype(self.dtype),
                                        scale, bbias, bias=cbias,
                                        padding=0, slope=0.01, eps=1e-5)
                bn(m, v)   # running-stat momentum update
                h = y.astype(self.dtype)
                continue
            h = nn.Conv(ch, (4, 4), strides=(2, 2), padding="VALID",
                        use_bias=True, dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"bn{i}")(h)
            h = nn.leaky_relu(h, 0.01).astype(self.dtype)
        h = h.reshape(h.shape[0], -1).astype(jnp.float32)
        mu = nn.Dense(self.latent_dim, dtype=jnp.float32, name="fc_mu")(h)
        logvar = nn.Dense(self.latent_dim, dtype=jnp.float32,
                          name="fc_logvar")(h)
        return mu, logvar


def reparameterize(key: jax.Array, mu: jax.Array, logvar: jax.Array,
                   clamp: bool = True) -> Tuple[jax.Array, jax.Array]:
    """z = mu + exp(0.5*clamp(logvar, -10, 10)) * eps.

    Returns (z, clamped_logvar). Ref: vaegan_code.py:75-78,
    main_vae.py:112-115.
    """
    if clamp:
        logvar = jnp.clip(logvar, -10.0, 10.0)
    std = jnp.exp(0.5 * logvar)
    z = mu + std * jax.random.normal(key, std.shape, std.dtype)
    return z, logvar


def kl_divergence(mu: jax.Array, logvar: jax.Array,
                  mean_over_batch: bool = True) -> jax.Array:
    """KL(q||N(0,I)) = -0.5 * sum(1 + logvar - mu^2 - exp(logvar)).

    The VAE-GAN trainer divides by batch size (vaegan_code.py:114); the plain
    VAE trainer uses the raw sum (main_vae.py:120).
    """
    kl = -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
    if mean_over_batch:
        kl = kl / mu.shape[0]
    return kl


def latent_to_spatial(z: jax.Array) -> jax.Array:
    """(B, latent) -> (B, 1, 1, latent) for the conv decoder (the NHWC
    counterpart of z.unsqueeze(-1).unsqueeze(-1), vaegan_code.py:78)."""
    return z[:, None, None, :]
