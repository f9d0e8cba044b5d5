"""DCGAN and WGAN trainers.

Capability parity with gan_code.py:
* DCGAN (train_gan, gan_code.py:162-259): per batch — D step on real
  (label 1) and fake (label 0, stop-gradient), then G step against label 1
  with the *updated* discriminator and the same z; Adam(2e-4, betas (0.5,
  0.999)).
* WGAN (train_wgan, gan_code.py:261-372): 5 critic iterations per batch,
  each with a fresh z, loss = mean(D(fake)) - mean(D(real)), post-update
  weight clipping of ALL critic parameters to +-0.01 (gan_code.py:319-320);
  generator loss -mean(D(fake)). Note the reference keeps the sigmoid output
  on the critic; that quirk is preserved by default for parity.

Both steps compile into single XLA programs with the optimizer updates
(and WGAN's clipping) inlined.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vgd_tpu.core.config import GANConfig
from vgd_tpu.models.gan import Discriminator, Generator
from vgd_tpu.ops.image import to_signed
from vgd_tpu.train.common import (NetState, adam, bce,
                                  clamp_params, scan_epoch)


@struct.dataclass
class GANState:
    gen: NetState
    disc: NetState
    step: jax.Array


class GANTrainer:
    def __init__(self, cfg: GANConfig, img_shape: Tuple[int, int, int]):
        self.cfg = cfg
        h, w, c = img_shape
        dtype = jnp.dtype(cfg.run.compute_dtype)
        self.gen = Generator(img_size=h, nz=cfg.latent_dim, ngf=cfg.ngf,
                             nc=c, dtype=dtype)
        self.disc = Discriminator(img_size=h, ndf=cfg.ndf, nc=c, dtype=dtype,
                                  fused=cfg.run.fused_conv)
        self.tx_g = adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)
        self.tx_d = adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)
        self.img_shape = img_shape

    def init(self, key: jax.Array, batch_size: int) -> GANState:
        h, w, c = self.img_shape
        k_g, k_d = jax.random.split(key)
        z = jnp.zeros((batch_size, 1, 1, self.cfg.latent_dim), jnp.float32)
        x = jnp.zeros((batch_size, h, w, c), jnp.float32)
        gen_v = self.gen.init(k_g, z, train=False)
        dis_v = self.disc.init(k_d, x, train=False)
        return GANState(gen=NetState.create(gen_v, self.tx_g),
                        disc=NetState.create(dis_v, self.tx_d),
                        step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------ DCGAN
    def _train_step_impl(self, state: GANState, batch_uint8: jax.Array,
                         key: jax.Array
                         ) -> Tuple[GANState, Dict[str, jax.Array]]:
        x = to_signed(batch_uint8)
        b = x.shape[0]
        k_z, = jax.random.split(key, 1)
        z = jax.random.normal(k_z, (b, 1, 1, self.cfg.latent_dim))

        # fake generated once, reused by D (stop-grad) and G (gan_code.py:204,214)
        fake, gen_mut = self.gen.apply(state.gen.variables(), z, train=True,
                                       mutable=["batch_stats"])
        ones = jnp.ones((b,), jnp.float32)
        zeros = jnp.zeros((b,), jnp.float32)

        def d_loss_fn(d_params, d_stats):
            dv = {"params": d_params, "batch_stats": d_stats}
            out_real, mut = self.disc.apply(dv, x, train=True,
                                            mutable=["batch_stats"])
            dv = {"params": d_params, "batch_stats": mut["batch_stats"]}
            out_fake, mut = self.disc.apply(dv, jax.lax.stop_gradient(fake),
                                            train=True,
                                            mutable=["batch_stats"])
            return bce(out_real, ones) + bce(out_fake, zeros), \
                mut["batch_stats"]

        (d_loss, d_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.disc.params,
                                     state.disc.batch_stats)
        disc = state.disc.apply_gradients(self.tx_d, d_grads, d_stats)

        def g_loss_fn(g_params):
            gv = {"params": g_params, "batch_stats": state.gen.batch_stats}
            fake2, gmut = self.gen.apply(gv, z, train=True,
                                         mutable=["batch_stats"])
            out, dmut = self.disc.apply(disc.variables(), fake2, train=True,
                                        mutable=["batch_stats"])
            return bce(out, ones), (gmut["batch_stats"], dmut["batch_stats"])

        (g_loss, (g_stats, d_stats2)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gen.params)
        gen = state.gen.apply_gradients(self.tx_g, g_grads, g_stats)

        new_state = GANState(gen=gen, disc=disc.replace(batch_stats=d_stats2),
                             step=state.step + 1)
        return new_state, {"d_loss": d_loss, "g_loss": g_loss}

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: GANState, batch_uint8: jax.Array,
                   key: jax.Array) -> Tuple[GANState, Dict[str, jax.Array]]:
        return self._train_step_impl(state, batch_uint8, key)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_epoch(self, state: GANState, batches_uint8: jax.Array,
                    key: jax.Array) -> Tuple[GANState, Dict[str, jax.Array]]:
        """ONE compiled scan over stacked batches (train/common.py
        scan_epoch) — the reference's hot loop gan_code.py:187-226 without
        per-step host dispatch."""
        return scan_epoch(self._train_step_impl, state, batches_uint8, key)

    # ------------------------------------------------------------------- WGAN
    def _train_step_wgan_impl(self, state: GANState, batch_uint8: jax.Array,
                              key: jax.Array
                              ) -> Tuple[GANState, Dict[str, jax.Array]]:
        cfg = self.cfg
        x = to_signed(batch_uint8)
        b = x.shape[0]
        keys = jax.random.split(key, cfg.critic_iters + 1)

        disc = state.disc
        gen = state.gen
        d_loss = jnp.zeros(())
        for i in range(cfg.critic_iters):  # unrolled (gan_code.py:300-320)
            z = jax.random.normal(keys[i], (b, 1, 1, cfg.latent_dim))
            fake, gen_mut = self.gen.apply(gen.variables(), z, train=True,
                                           mutable=["batch_stats"])
            gen = gen.replace(batch_stats=gen_mut["batch_stats"])
            fake = jax.lax.stop_gradient(fake)

            def d_loss_fn(d_params, d_stats, fake=fake):
                dv = {"params": d_params, "batch_stats": d_stats}
                out_real, mut = self.disc.apply(dv, x, train=True,
                                                mutable=["batch_stats"])
                dv = {"params": d_params, "batch_stats": mut["batch_stats"]}
                out_fake, mut = self.disc.apply(dv, fake, train=True,
                                                mutable=["batch_stats"])
                return jnp.mean(out_fake) - jnp.mean(out_real), \
                    mut["batch_stats"]

            (d_loss, d_stats), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(disc.params, disc.batch_stats)
            disc = disc.apply_gradients(self.tx_d, d_grads, d_stats)
            disc = disc.replace(params=clamp_params(disc.params,
                                                    cfg.clip_value))

        z = jax.random.normal(keys[-1], (b, 1, 1, cfg.latent_dim))

        def g_loss_fn(g_params):
            gv = {"params": g_params, "batch_stats": gen.batch_stats}
            fake2, gmut = self.gen.apply(gv, z, train=True,
                                         mutable=["batch_stats"])
            out, dmut = self.disc.apply(disc.variables(), fake2, train=True,
                                        mutable=["batch_stats"])
            return -jnp.mean(out), (gmut["batch_stats"], dmut["batch_stats"])

        (g_loss, (g_stats, d_stats2)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(gen.params)
        gen = gen.apply_gradients(self.tx_g, g_grads, g_stats)

        new_state = GANState(gen=gen, disc=disc.replace(batch_stats=d_stats2),
                             step=state.step + 1)
        return new_state, {"d_loss": d_loss, "g_loss": g_loss}

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step_wgan(self, state: GANState, batch_uint8: jax.Array,
                        key: jax.Array
                        ) -> Tuple[GANState, Dict[str, jax.Array]]:
        return self._train_step_wgan_impl(state, batch_uint8, key)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_epoch_wgan(self, state: GANState, batches_uint8: jax.Array,
                         key: jax.Array
                         ) -> Tuple[GANState, Dict[str, jax.Array]]:
        """Scanned WGAN epoch (5 critic iters + clip per step, unrolled
        inside the scan body — gan_code.py:289-345 hot loop)."""
        return scan_epoch(self._train_step_wgan_impl, state, batches_uint8,
                          key)

    @functools.partial(jax.jit, static_argnums=0)
    def generate(self, state: GANState, z: jax.Array) -> jax.Array:
        """z: (B, latent) or (B,1,1,latent) -> images in [-1,1]
        (gan_code.py:121-122)."""
        if z.ndim == 2:
            z = z[:, None, None, :]
        return self.gen.apply(state.gen.variables(), z, train=False)
