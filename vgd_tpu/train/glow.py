"""Glow trainers (images and EEG).

Capability parity with nf_code.py:560-625 and flow_eeg.py:343-422:
* image: 5-bit quantisation + uniform dequantisation noise
  (nf_code.py:582-596), a first-iteration no-gradient pass that performs the
  ActNorm data-dependent init (nf_code.py:589-594), bits/dim loss, Adam.
* EEG: same skeleton with +U(0,1) dequantisation noise (flow_eeg.py:384-388)
  and the reference's calc_loss(T, n_bins=1) normalisation (flow_eeg.py:392).

TPU-first: the ActNorm init is an explicit one-shot jitted ``init_step``
returning updated params (no mutable-module trickery), and the train step is
a single compiled program. Sampling (``reverse``) is compiled once and reused
(nf_code.py:613-621 equivalent).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax import traverse_util

from vgd_tpu.core.config import GlowConfig, GlowEEGConfig
from vgd_tpu.models.glow import (GlowModel, calc_loss, calc_z_shapes,
                                 calc_z_shapes_eeg)
from vgd_tpu.ops.image import quantize_bits, to_unit
from vgd_tpu.train.common import adam


@struct.dataclass
class GlowState:
    params: dict
    opt_state: tuple
    step: jax.Array


def _merge_actnorm(params, actnorm_init):
    """Overwrite ActNorm b/s params with the data-dependent values sown in
    the 'actnorm_init' collection (paths mirror the params tree)."""
    flat_p = traverse_util.flatten_dict(jax.tree_util.tree_map(lambda x: x,
                                                               params))
    flat_a = traverse_util.flatten_dict(actnorm_init)
    for k, v in flat_a.items():
        assert k in flat_p, f"actnorm path {k} missing from params"
        flat_p[k] = v
    return traverse_util.unflatten_dict(flat_p)


class GlowTrainer:
    """Image-variant trainer (nf_code.py __main__, K=32 L=4 64x64 5-bit)."""

    def __init__(self, cfg: GlowConfig, img_shape: Tuple[int, int, int]):
        self.cfg = cfg
        h, w, c = img_shape
        assert h == w
        self.model = GlowModel(in_channels=c, n_flows=cfg.n_flows,
                               n_blocks=cfg.n_blocks, variant="image",
                               filter_size=cfg.filter_size)
        self.tx = adam(cfg.lr)
        self.img_shape = img_shape
        self.n_bins = 2.0 ** cfg.n_bits
        self.z_shapes = calc_z_shapes(c, h, cfg.n_blocks)

    def init(self, key: jax.Array, batch_size: int) -> GlowState:
        h, w, c = self.img_shape
        x = jnp.zeros((batch_size, h, w, c), jnp.float32)
        variables = self.model.init(key, x)
        params = variables["params"]
        return GlowState(params=params, opt_state=self.tx.init(params),
                         step=jnp.zeros((), jnp.int32))

    def _prep(self, batch_uint8, key):
        """5-bit quantisation + U(0, 1/n_bins) dequant noise
        (nf_code.py:582-596)."""
        x = quantize_bits(to_unit(batch_uint8), self.cfg.n_bits)
        noise = jax.random.uniform(key, x.shape) / self.n_bins
        return x + noise

    @functools.partial(jax.jit, static_argnums=0)
    def init_step(self, state: GlowState, batch_uint8: jax.Array,
                  key: jax.Array) -> GlowState:
        """First-iteration no-grad pass = ActNorm data-dependent init
        (nf_code.py:589-594), returning params with b/s replaced."""
        x = self._prep(batch_uint8, key)
        _, mut = self.model.apply({"params": state.params}, x, init=True,
                                  mutable=["actnorm_init"])
        new_params = _merge_actnorm(state.params, mut["actnorm_init"])
        return state.replace(params=new_params,
                             opt_state=self.tx.init(new_params))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: GlowState, batch_uint8: jax.Array,
                   key: jax.Array) -> Tuple[GlowState, Dict[str, jax.Array]]:
        x = self._prep(batch_uint8, key)
        img_size = self.img_shape[0]

        def loss_fn(params):
            log_p, logdet, _ = self.model.apply({"params": params}, x)
            logdet = jnp.mean(logdet)
            loss, lp, ld = calc_loss(log_p, logdet, img_size, self.n_bins,
                                     n_channels=self.img_shape[2])
            return loss, (lp, ld)

        (loss, (lp, ld)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = GlowState(params=new_params, opt_state=new_opt,
                              step=state.step + 1)
        return new_state, {"loss": loss, "log_p": lp, "logdet": ld}

    # -- sampling / reverse -------------------------------------------------
    def sample_z(self, key: jax.Array, n: int,
                 temperature: float = None) -> List[jax.Array]:
        """Fixed z list at temperature (nf_code.py:569-575)."""
        temp = self.cfg.temperature if temperature is None else temperature
        keys = jax.random.split(key, len(self.z_shapes))
        return [jax.random.normal(k, (n,) + s) * temp
                for k, s in zip(keys, self.z_shapes)]

    @functools.partial(jax.jit, static_argnums=0)
    def reverse(self, state: GlowState, z_list) -> jax.Array:
        """z -> image in [-0.5, 0.5] (nf_code.py:613-621)."""
        return self.model.apply({"params": state.params}, z_list,
                                method=GlowModel.reverse)

    @functools.partial(jax.jit, static_argnums=0)
    def forward(self, state: GlowState, x: jax.Array):
        """Raw (log_p, logdet, z_outs) for likelihood eval / reconstruction."""
        return self.model.apply({"params": state.params}, x)


class GlowEEGTrainer:
    """EEG-variant trainer (flow_eeg.py:343-422)."""

    def __init__(self, cfg: GlowEEGConfig):
        self.cfg = cfg
        self.model = GlowModel(in_channels=cfg.num_channels,
                               n_flows=cfg.n_flows, n_blocks=cfg.n_blocks,
                               variant="eeg", filter_size=cfg.filter_size)
        self.tx = adam(cfg.lr)
        self.z_shapes = calc_z_shapes_eeg(cfg.num_channels, cfg.num_samples,
                                          cfg.n_blocks)

    def init(self, key: jax.Array, batch_size: int) -> GlowState:
        x = jnp.zeros((batch_size, self.cfg.num_samples, 1,
                       self.cfg.num_channels), jnp.float32)
        variables = self.model.init(key, x)
        params = variables["params"]
        return GlowState(params=params, opt_state=self.tx.init(params),
                         step=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, static_argnums=0)
    def init_step(self, state: GlowState, batch: jax.Array,
                  key: jax.Array) -> GlowState:
        """No-grad ActNorm init pass (flow_eeg.py:381-386)."""
        x = batch + jax.random.uniform(key, batch.shape)
        _, mut = self.model.apply({"params": state.params}, x, init=True,
                                  mutable=["actnorm_init"])
        new_params = _merge_actnorm(state.params, mut["actnorm_init"])
        return state.replace(params=new_params,
                             opt_state=self.tx.init(new_params))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: GlowState, batch: jax.Array, key: jax.Array
                   ) -> Tuple[GlowState, Dict[str, jax.Array]]:
        x = batch + jax.random.uniform(key, batch.shape)  # flow_eeg.py:384-388

        def loss_fn(params):
            log_p, logdet, _ = self.model.apply({"params": params}, x)
            logdet = jnp.mean(logdet)
            # Reference normalisation: calc_loss(T, n_bins=1) with the image
            # formula n_pixel = T*T*3 (flow_eeg.py:392) — preserved verbatim.
            loss, lp, ld = calc_loss(log_p, logdet, self.cfg.num_samples, 1.0,
                                     n_channels=3)
            return loss, (lp, ld)

        (loss, (lp, ld)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (GlowState(params=new_params, opt_state=new_opt,
                          step=state.step + 1),
                {"loss": loss, "log_p": lp, "logdet": ld})

    def sample_z(self, key: jax.Array, n: int,
                 temperature: float = None) -> List[jax.Array]:
        temp = self.cfg.temperature if temperature is None else temperature
        keys = jax.random.split(key, len(self.z_shapes))
        return [jax.random.normal(k, (n,) + s) * temp
                for k, s in zip(keys, self.z_shapes)]

    @functools.partial(jax.jit, static_argnums=0)
    def reverse(self, state: GlowState, z_list) -> jax.Array:
        """Generate synthetic EEG (B, T, 1, C) (flow_eeg.py:406-412)."""
        return self.model.apply({"params": state.params}, z_list,
                                method=GlowModel.reverse)
