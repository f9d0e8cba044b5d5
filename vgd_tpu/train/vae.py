"""Denoising VAE trainer.

Capability parity with main_vae.py:60-213: encoder + Generator-decoder, one
joint Adam(1e-3) over both networks (main_vae.py:84-87), training noise of a
fixed std ``noise_max_std`` (main_vae.py:104-105; validation uses a random
per-batch std U(0,1)*max, main_vae.py:145), inputs clamped to [-1,1], loss
``MSE(recon, clean) + 1e-5 * min(epoch/50, 1) * KL_sum`` (main_vae.py:119-121).

TPU-first: noise injection + forward + backward + update compile into one
step; corruption happens on device instead of the host dataloader.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vgd_tpu.core.config import VAEConfig
from vgd_tpu.data.corrupt import corrupt
from vgd_tpu.models.gan import Generator
from vgd_tpu.models.vae import (Encoder, kl_divergence, latent_to_spatial,
                                reparameterize)
from vgd_tpu.ops.image import to_signed
from vgd_tpu.train.common import NetState, adam, mse, scan_epoch


@struct.dataclass
class VAEState:
    encoder: NetState
    decoder: NetState
    step: jax.Array


class VAETrainer:
    def __init__(self, cfg: VAEConfig, img_shape: Tuple[int, int, int]):
        self.cfg = cfg
        h, w, c = img_shape
        dtype = jnp.dtype(cfg.run.compute_dtype)
        self.encoder = Encoder(latent_dim=cfg.latent_dim, dtype=dtype,
                               fused=cfg.run.fused_conv)
        self.decoder = Generator(img_size=h, nz=cfg.latent_dim, ngf=cfg.ngf,
                                 nc=c, dtype=dtype)
        # One joint optimizer over (encoder, decoder) — main_vae.py:84-87.
        self.tx = adam(cfg.lr)
        self.img_shape = img_shape

    def init(self, key: jax.Array, batch_size: int) -> VAEState:
        h, w, c = self.img_shape
        k_e, k_d = jax.random.split(key)
        x = jnp.zeros((batch_size, h, w, c), jnp.float32)
        z = jnp.zeros((batch_size, 1, 1, self.cfg.latent_dim), jnp.float32)
        enc_v = self.encoder.init(k_e, x, train=False)
        dec_v = self.decoder.init(k_d, z, train=False)
        # Joint opt state over the combined param tree.
        joint = {"enc": enc_v["params"], "dec": dec_v["params"]}
        opt_state = self.tx.init(joint)
        return VAEState(
            encoder=NetState(params=enc_v["params"],
                             batch_stats=enc_v.get("batch_stats", {}),
                             opt_state=None),
            decoder=NetState(params=dec_v["params"],
                             batch_stats=dec_v.get("batch_stats", {}),
                             opt_state=opt_state),
            step=jnp.zeros((), jnp.int32))

    def _train_step_impl(self, state: VAEState, batch_uint8: jax.Array,
                         key: jax.Array, kl_ramp: jax.Array
                         ) -> Tuple[VAEState, Dict[str, jax.Array]]:
        cfg = self.cfg
        img = to_signed(batch_uint8)
        k_noise, k_eps = jax.random.split(key)
        std = cfg.data.noise_max_std if cfg.data.noise_max_std else 0.5
        if cfg.data.occlusion:
            # Full dataset-pipeline corruption: occlusion rectangle +
            # per-sample-std gaussian noise (dataset_code.py:35-56), on
            # device inside the compiled step.
            noisy = corrupt(k_noise, img, std, occlusion=True)
        else:
            # Fixed-std training noise (main_vae.py:104-105).
            noisy = jnp.clip(img + std * jax.random.normal(k_noise,
                                                           img.shape),
                             -1.0, 1.0)

        def loss_fn(joint):
            enc_vars = {"params": joint["enc"],
                        "batch_stats": state.encoder.batch_stats}
            dec_vars = {"params": joint["dec"],
                        "batch_stats": state.decoder.batch_stats}
            (mu, logvar), enc_mut = self.encoder.apply(
                enc_vars, noisy, train=True, mutable=["batch_stats"])
            z, logvar = reparameterize(k_eps, mu, logvar)
            recon, dec_mut = self.decoder.apply(
                dec_vars, latent_to_spatial(z), train=True,
                mutable=["batch_stats"])
            recon_loss = mse(recon, img)
            kl = kl_divergence(mu, logvar, mean_over_batch=False)
            total = recon_loss + kl * kl_ramp * cfg.kl_weight
            return total, (recon_loss, kl, enc_mut["batch_stats"],
                           dec_mut["batch_stats"])

        joint = {"enc": state.encoder.params, "dec": state.decoder.params}
        (total, (recon_loss, kl, enc_stats, dec_stats)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(joint)
        updates, new_opt = self.tx.update(grads,
                                          state.decoder.opt_state, joint)
        new_joint = optax.apply_updates(joint, updates)
        new_state = VAEState(
            encoder=state.encoder.replace(params=new_joint["enc"],
                                          batch_stats=enc_stats),
            decoder=state.decoder.replace(params=new_joint["dec"],
                                          batch_stats=dec_stats,
                                          opt_state=new_opt),
            step=state.step + 1)
        return new_state, {"total": total, "recon": recon_loss, "kl": kl}

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: VAEState, batch_uint8: jax.Array,
                   key: jax.Array, kl_ramp: jax.Array
                   ) -> Tuple[VAEState, Dict[str, jax.Array]]:
        return self._train_step_impl(state, batch_uint8, key, kl_ramp)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_epoch(self, state: VAEState, batches_uint8: jax.Array,
                    key: jax.Array, kl_ramp: jax.Array
                    ) -> Tuple[VAEState, Dict[str, jax.Array]]:
        """ONE compiled scan over stacked batches (see train/common.py
        scan_epoch) — removes per-step host dispatch from the hot loop
        (main_vae.py:96-141)."""
        return scan_epoch(self._train_step_impl, state, batches_uint8,
                          key, kl_ramp)

    @functools.partial(jax.jit, static_argnums=0)
    def denoise(self, state: VAEState, noisy: jax.Array, key: jax.Array
                ) -> jax.Array:
        """The product capability: encode -> reparameterize -> decode
        (main_vae.py:258-260). ``noisy`` is float NHWC in [-1,1]."""
        mu, logvar = self.encoder.apply(state.encoder.variables(), noisy,
                                        train=False)
        z, _ = reparameterize(key, mu, logvar)
        return self.decoder.apply(state.decoder.variables(),
                                  latent_to_spatial(z), train=False)

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: VAEState, batch_uint8: jax.Array,
                  key: jax.Array) -> Dict[str, jax.Array]:
        """Validation with random-std noise (main_vae.py:143-159)."""
        cfg = self.cfg
        img = to_signed(batch_uint8)
        k_s, k_n, k_eps = jax.random.split(key, 3)
        max_std = cfg.data.noise_max_std if cfg.data.noise_max_std else 0.5
        if cfg.data.occlusion:
            noisy = corrupt(k_n, img, max_std, occlusion=True)
        else:
            std = jax.random.uniform(k_s, ()) * max_std
            noisy = jnp.clip(img + std * jax.random.normal(k_n, img.shape),
                             -1, 1)
        recon = self.denoise(state, noisy, k_eps)
        mu, logvar = self.encoder.apply(state.encoder.variables(), noisy,
                                        train=False)
        logvar = jnp.clip(logvar, -10, 10)
        recon_loss = mse(recon, img)
        kl = kl_divergence(mu, logvar, mean_over_batch=False)
        # per-sample components: the loop rebuilds the reference's val loss
        # over the TRUE rows of a padded final batch
        # (main_vae.py:119-121 semantics: mean MSE + raw-sum KL)
        per_mse = jnp.mean(jnp.square(recon.astype(jnp.float32)
                                      - img.astype(jnp.float32)),
                           axis=(1, 2, 3))
        per_kl = -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu)
                                - jnp.exp(logvar), axis=1)
        return {"val_loss": recon_loss + kl, "per_mse": per_mse,
                "per_kl": per_kl, "recon": recon, "noisy": noisy}

    @functools.partial(jax.jit, static_argnums=0)
    def generate(self, state: VAEState, z: jax.Array) -> jax.Array:
        return self.decoder.apply(state.decoder.variables(),
                                  latent_to_spatial(z), train=False)
