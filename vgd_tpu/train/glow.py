"""Glow trainers (images and EEG).

Capability parity with nf_code.py:560-625 and flow_eeg.py:343-422:
* image: 5-bit quantisation + uniform dequantisation noise
  (nf_code.py:582-596), a first-iteration no-gradient pass performing the
  ActNorm data-dependent init (nf_code.py:589-594), bits/dim loss, Adam.
* EEG: same skeleton with +U(0,1) dequantisation noise (flow_eeg.py:384-388)
  and the reference's calc_loss(T, n_bins=1) normalisation (flow_eeg.py:392).

TPU-first: the model is the scan-compiled functional Glow
(vgd_tpu.models.glow) — one flow body per block instead of K*L inlined
modules; the ActNorm init is an explicit one-shot jitted ``init_step``.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vgd_tpu.core.config import GlowConfig, GlowEEGConfig
from vgd_tpu.models.glow import (Glow, calc_loss, calc_z_shapes,
                                 calc_z_shapes_eeg)
from vgd_tpu.ops.image import quantize_bits, to_unit
from vgd_tpu.train.common import adam


@struct.dataclass
class GlowState:
    params: dict
    opt_state: tuple
    step: jax.Array


class _GlowTrainerBase:
    model: Glow
    tx: optax.GradientTransformation

    def _make_state(self, params) -> GlowState:
        return GlowState(params=params, opt_state=self.tx.init(params),
                         step=jnp.zeros((), jnp.int32))

    def _update(self, state, loss_aux_grads):
        (loss, (lp, ld)), grads = loss_aux_grads
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (GlowState(params=new_params, opt_state=new_opt,
                          step=state.step + 1),
                {"loss": loss, "log_p": lp, "logdet": ld})

    @functools.partial(jax.jit, static_argnums=0)
    def reverse(self, state: GlowState, z_list) -> jax.Array:
        """z -> sample (nf_code.py:613-621 / flow_eeg.py:406-412)."""
        return self.model.reverse(state.params, z_list)

    @functools.partial(jax.jit, static_argnums=0)
    def forward(self, state: GlowState, x: jax.Array):
        """(log_p, logdet, z_outs) for likelihood eval / reconstruction."""
        return self.model.forward(state.params, x)


class GlowTrainer(_GlowTrainerBase):
    """Image-variant trainer (nf_code.py __main__: K=32 L=4 64x64 5-bit)."""

    def __init__(self, cfg: GlowConfig, img_shape: Tuple[int, int, int],
                 pp_mesh=None):
        """``pp_mesh``: a Mesh whose model axis stages the flow chains as a
        GPipe pipeline (cfg.pp_stages devices; parallel/pipeline_parallel.py)
        on the training forward. Sampling/init keep the sequential scan."""
        self.cfg = cfg
        h, w, c = img_shape
        assert h == w
        dtype = jnp.dtype(cfg.run.compute_dtype)
        if pp_mesh is not None:
            assert cfg.n_flows % getattr(cfg, "pp_stages", 1) == 0, \
                (cfg.n_flows, cfg.pp_stages)
        self.model = Glow(in_channels=c, n_flows=cfg.n_flows,
                          n_blocks=cfg.n_blocks, variant="image",
                          filter_size=cfg.filter_size, compute_dtype=dtype,
                          remat=getattr(cfg, "remat", False),
                          fused_coupling=getattr(cfg, "fused_coupling",
                                                 False),
                          flow_stack=getattr(cfg, "flow_stack", False),
                          scan_unroll=getattr(cfg, "scan_unroll", 1),
                          pp_mesh=pp_mesh,
                          pp_microbatches=getattr(cfg, "pp_microbatches", 2))
        self.tx = adam(cfg.lr)
        self.img_shape = img_shape
        self.n_bins = 2.0 ** cfg.n_bits
        self.z_shapes = calc_z_shapes(c, h, cfg.n_blocks)

    def init(self, key: jax.Array, batch_size: int = None) -> GlowState:
        return self._make_state(self.model.init(key))

    def _prep(self, batch_uint8, key):
        """5-bit quantisation + U(0, 1/n_bins) dequant noise
        (nf_code.py:582-596)."""
        x = quantize_bits(to_unit(batch_uint8), self.cfg.n_bits)
        return x + jax.random.uniform(key, x.shape) / self.n_bins

    @functools.partial(jax.jit, static_argnums=0)
    def init_step(self, state: GlowState, batch_uint8: jax.Array,
                  key: jax.Array) -> GlowState:
        """First-iteration no-grad pass = ActNorm data-dependent init
        (nf_code.py:589-594)."""
        x = self._prep(batch_uint8, key)
        new_params = self.model.init_actnorm(state.params, x)
        return state.replace(params=new_params,
                             opt_state=self.tx.init(new_params))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: GlowState, batch_uint8: jax.Array,
                   key: jax.Array) -> Tuple[GlowState, Dict[str, jax.Array]]:
        x = self._prep(batch_uint8, key)
        img_size = self.img_shape[0]

        def loss_fn(params):
            log_p, logdet, _ = self.model.forward(params, x)
            loss, lp, ld = calc_loss(log_p, jnp.mean(logdet), img_size,
                                     self.n_bins,
                                     n_channels=self.img_shape[2])
            return loss, (lp, ld)

        return self._update(state, jax.value_and_grad(
            loss_fn, has_aux=True)(state.params))

    def sample_z(self, key: jax.Array, n: int,
                 temperature: float = None) -> List[jax.Array]:
        """Fixed z list at temperature (nf_code.py:569-575)."""
        temp = self.cfg.temperature if temperature is None else temperature
        keys = jax.random.split(key, len(self.z_shapes))
        return [jax.random.normal(k, (n,) + s) * temp
                for k, s in zip(keys, self.z_shapes)]


class GlowEEGTrainer(_GlowTrainerBase):
    """EEG-variant trainer (flow_eeg.py:343-422)."""

    def __init__(self, cfg: GlowEEGConfig):
        self.cfg = cfg
        dtype = jnp.dtype(cfg.run.compute_dtype)
        self.model = Glow(in_channels=cfg.num_channels, n_flows=cfg.n_flows,
                          n_blocks=cfg.n_blocks, variant="eeg",
                          filter_size=cfg.filter_size, compute_dtype=dtype)
        self.tx = adam(cfg.lr)
        self.z_shapes = calc_z_shapes_eeg(cfg.num_channels, cfg.num_samples,
                                          cfg.n_blocks)

    def init(self, key: jax.Array, batch_size: int = None) -> GlowState:
        return self._make_state(self.model.init(key))

    @functools.partial(jax.jit, static_argnums=0)
    def init_step(self, state: GlowState, batch: jax.Array,
                  key: jax.Array) -> GlowState:
        """No-grad ActNorm init pass (flow_eeg.py:381-386)."""
        x = batch + jax.random.uniform(key, batch.shape)
        new_params = self.model.init_actnorm(state.params, x)
        return state.replace(params=new_params,
                             opt_state=self.tx.init(new_params))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: GlowState, batch: jax.Array, key: jax.Array
                   ) -> Tuple[GlowState, Dict[str, jax.Array]]:
        x = batch + jax.random.uniform(key, batch.shape)  # flow_eeg.py:384-388

        def loss_fn(params):
            log_p, logdet, _ = self.model.forward(params, x)
            # Reference normalisation: calc_loss(T, n_bins=1) with the image
            # formula n_pixel = T*T*3 (flow_eeg.py:392) — preserved verbatim.
            loss, lp, ld = calc_loss(log_p, jnp.mean(logdet),
                                     self.cfg.num_samples, 1.0, n_channels=3)
            return loss, (lp, ld)

        return self._update(state, jax.value_and_grad(
            loss_fn, has_aux=True)(state.params))

    def sample_z(self, key: jax.Array, n: int,
                 temperature: float = None) -> List[jax.Array]:
        temp = self.cfg.temperature if temperature is None else temperature
        keys = jax.random.split(key, len(self.z_shapes))
        return [jax.random.normal(k, (n,) + s) * temp
                for k, s in zip(keys, self.z_shapes)]
