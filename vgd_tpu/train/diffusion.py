"""DDPM trainer + samplers.

Capability parity with train_diffusion.py:35-151 and test_diffusion.py:34-96:
* linear beta schedule in [1e-4, 0.02] over T (train_diffusion.py:35-36),
* q_sample forward process sqrt(a-bar)x0 + sqrt(1-a-bar)eps
  (train_diffusion.py:38-40),
* epsilon-prediction MSE loss with per-sample uniform t
  (train_diffusion.py:42-45, 120),
* alternate timestep samplers (sinusoidal / Beta), present in the reference
  but unused in its final loop (train_diffusion.py:47-63),
* ancestral reverse sampler from a (possibly random, data-dependent) start
  step down to 0 with posterior variance beta*(1-a-bar_{t-1})/(1-a-bar)
  (test_diffusion.py:62-65, 90-96),
* one-step x0 prediction (test_diffusion.py:135).

TPU-first: the reference's Python loop of up to 1000 sequential UNet forwards
(test_diffusion.py:90-96 — its hottest inference loop) becomes a single
``lax.fori_loop`` inside one compiled program; data-dependent start timesteps
are handled by masking rather than dynamic trip counts.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vgd_tpu.core.config import DiffusionConfig
from vgd_tpu.models.unet import UNet
from vgd_tpu.ops.image import to_signed
from vgd_tpu.train.common import adam, mse, scan_epoch


class Schedule(NamedTuple):
    """All precomputed DDPM schedule tensors (device-resident)."""
    betas: jax.Array
    alphas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    posterior_variance: jax.Array


def make_schedule(timesteps: int, start: float = 1e-4, end: float = 0.02
                  ) -> Schedule:
    """Linear beta schedule + derived quantities (train_diffusion.py:35-36,
    test_diffusion.py:58-65)."""
    betas = jnp.linspace(start, end, timesteps, dtype=jnp.float32)
    alphas = 1.0 - betas
    acp = jnp.cumprod(alphas)
    acp_prev = jnp.concatenate([jnp.ones((1,), jnp.float32), acp[:-1]])
    return Schedule(
        betas=betas, alphas=alphas, alphas_cumprod=acp,
        alphas_cumprod_prev=acp_prev,
        sqrt_alphas_cumprod=jnp.sqrt(acp),
        sqrt_one_minus_alphas_cumprod=jnp.sqrt(1.0 - acp),
        posterior_variance=betas * (1.0 - acp_prev) / (1.0 - acp))


def q_sample(sched: Schedule, x0: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    """Forward diffusion (train_diffusion.py:38-40)."""
    a = sched.sqrt_alphas_cumprod[t][:, None, None, None]
    b = sched.sqrt_one_minus_alphas_cumprod[t][:, None, None, None]
    return a * x0 + b * noise


def sample_timestep_uniform(key, batch_size, t_max):
    """t ~ U{0..T-1} (train_diffusion.py:120)."""
    return jax.random.randint(key, (batch_size,), 0, t_max)


def sample_timestep_sinusoidal(batch_size, t_max, epoch, total_epochs):
    """Phase-shifting sine schedule (train_diffusion.py:47-54; unused in the
    reference's final loop, provided for capability parity)."""
    phase = (epoch / total_epochs) * 3.1416
    grid = jnp.linspace(0.0, 3.1416, batch_size)
    sampled = (jnp.sin(grid + phase) + 1.0) / 2.0
    return (sampled * (t_max - 1) + 1).astype(jnp.int32)


def sample_timestep_beta(key, batch_size, t_max, alpha=2.0, beta_param=2.0):
    """Beta(a,b)-distributed timesteps (train_diffusion.py:56-63)."""
    sampled = jax.random.beta(key, alpha, beta_param, (batch_size,))
    return (sampled * (t_max - 1)).astype(jnp.int32)


@struct.dataclass
class DiffusionState:
    params: dict
    opt_state: tuple
    step: jax.Array


class DiffusionTrainer:
    def __init__(self, cfg: DiffusionConfig, img_shape: Tuple[int, int, int],
                 sp_mesh=None):
        """``sp_mesh``: a Mesh with model-axis > 1 routes the bottleneck
        self-attention through ring attention (sequence parallelism) in BOTH
        the train and sampling paths (parallel/sequence_parallel.py)."""
        self.cfg = cfg
        h, w, c = img_shape
        dtype = jnp.dtype(cfg.run.compute_dtype)
        self.model = UNet(out_ch=c, base_ch=cfg.base_ch,
                          time_emb_dim=cfg.time_emb_dim,
                          attention=cfg.attention, dtype=dtype,
                          sp_mesh=sp_mesh)
        # same params, Pallas-fused attention + GroupNorm/SiLU — used on the
        # no-grad sampling paths (the reference's hottest inference loop,
        # test_diffusion.py:90-96); sp_mesh routing wins over `fused` at the
        # bottleneck (the ring body is itself the blockwise form)
        self.model_fused = UNet(out_ch=c, base_ch=cfg.base_ch,
                                time_emb_dim=cfg.time_emb_dim,
                                attention=cfg.attention, dtype=dtype,
                                fused=True, sp_mesh=sp_mesh)
        self.tx = adam(cfg.lr)
        self.img_shape = img_shape
        self.sched = make_schedule(cfg.timesteps, cfg.beta_start, cfg.beta_end)

    def init(self, key: jax.Array, batch_size: int) -> DiffusionState:
        h, w, c = self.img_shape
        x = jnp.zeros((batch_size, h, w, c), jnp.float32)
        t = jnp.zeros((batch_size,), jnp.int32)
        variables = self.model.init(key, x, t)
        params = variables["params"]
        return DiffusionState(params=params, opt_state=self.tx.init(params),
                              step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------ train
    def _train_step_impl(self, state: DiffusionState, batch_uint8: jax.Array,
                         key: jax.Array
                         ) -> Tuple[DiffusionState, Dict[str, jax.Array]]:
        x0 = to_signed(batch_uint8)
        b = x0.shape[0]
        k_t, k_n = jax.random.split(key)
        t = sample_timestep_uniform(k_t, b, self.cfg.timesteps)
        noise = jax.random.normal(k_n, x0.shape)

        def loss_fn(params):
            xt = q_sample(self.sched, x0, t, noise)
            pred = self.model.apply({"params": params}, xt, t)
            return mse(pred, noise)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (DiffusionState(params=new_params, opt_state=new_opt,
                               step=state.step + 1), {"loss": loss})

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: DiffusionState, batch_uint8: jax.Array,
                   key: jax.Array
                   ) -> Tuple[DiffusionState, Dict[str, jax.Array]]:
        return self._train_step_impl(state, batch_uint8, key)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_epoch(self, state: DiffusionState, batches_uint8: jax.Array,
                    key: jax.Array
                    ) -> Tuple[DiffusionState, Dict[str, jax.Array]]:
        """ONE compiled scan over stacked batches (train/common.py
        scan_epoch) — train_diffusion.py:110-134's hot loop without per-step
        host dispatch."""
        return scan_epoch(self._train_step_impl, state, batches_uint8, key)

    @functools.partial(jax.jit, static_argnums=0)
    def eval_loss(self, state: DiffusionState, batch_uint8: jax.Array,
                  key: jax.Array) -> jax.Array:
        """Validation epsilon-MSE (train_diffusion.py:140-146)."""
        x0 = to_signed(batch_uint8)
        k_t, k_n = jax.random.split(key)
        t = sample_timestep_uniform(k_t, x0.shape[0], self.cfg.timesteps)
        noise = jax.random.normal(k_n, x0.shape)
        xt = q_sample(self.sched, x0, t, noise)
        pred = self.model.apply({"params": state.params}, xt, t)
        # per-sample epsilon-MSE so the loop can drop the padded repeats of
        # a final val batch (rows are independent: GroupNorm is per-sample)
        return jnp.mean(jnp.square(pred.astype(jnp.float32)
                                   - noise.astype(jnp.float32)),
                        axis=(1, 2, 3))

    # ---------------------------------------------------------------- sample
    @functools.partial(jax.jit, static_argnums=0)
    def ancestral_sample(self, state: DiffusionState, xt: jax.Array,
                         t_start: jax.Array, key: jax.Array) -> jax.Array:
        """Reverse chain from per-call start step down to 0
        (test_diffusion.py:90-96 semantics, compiled).

        The reference iterates a Python loop whose trip count depends on a
        random tensor value; here a ``lax.fori_loop`` over all T steps masks
        out iterations above ``t_start`` — identical math, one compiled
        program, no recompile per start step.
        """
        T = self.cfg.timesteps
        s = self.sched
        b = xt.shape[0]

        def body(i, carry):
            x, k = carry
            t_i = T - 1 - i  # descend T-1 .. 0
            active = t_i <= t_start
            k, k_noise = jax.random.split(k)
            t_vec = jnp.full((b,), t_i, jnp.int32)
            pred_noise = self.model_fused.apply({"params": state.params},
                                                x, t_vec)
            x_new = x - (1.0 - s.alphas[t_i]) / \
                s.sqrt_one_minus_alphas_cumprod[t_i] * pred_noise
            x_new = x_new / jnp.sqrt(s.alphas[t_i])
            x_new = x_new + jax.random.normal(k_noise, x.shape) * \
                jnp.sqrt(s.posterior_variance[t_i])
            x = jnp.where(active, x_new, x)
            return (x, k)

        x, _ = jax.lax.fori_loop(0, T, body, (xt, key))
        return jnp.clip(x, -1.0, 1.0)

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def ddim_sample(self, state: DiffusionState, xt: jax.Array,
                    key: jax.Array, num_steps: int,
                    eta: jax.Array = 1.0,
                    t_start: Optional[jax.Array] = None) -> jax.Array:
        """DDIM sampler (Song et al. 2020) over an evenly strided timestep
        subsequence — a fast-inference superset of the reference's ancestral
        chain (test_diffusion.py:90-96).

        With ``num_steps == T`` and ``eta == 1`` the update is algebraically
        the DDPM posterior step (sigma^2 reduces to
        beta_t*(1-abar_prev)/(1-abar_t)), so this matches
        :meth:`ancestral_sample` sample-for-sample (pinned by
        tests/test_diffusion.py). With ``eta == 0`` the chain is
        deterministic; ``num_steps << T`` (e.g. 50) trades a little quality
        for a ~T/num_steps speedup of the hottest inference loop — a
        capability the reference does not have.

        ``t_start`` (default T-1) masks out subsequence steps above it. At
        full stride (``num_steps == T``) this is exactly
        ``ancestral_sample``'s partial-noise-restoration contract; with a
        strided chain the first active step is the nearest subsequence entry
        <= t_start, whose abar differs from the noise level xt actually
        carries, so strided t_start restarts are approximate (exact only
        when t_start lands on a subsequence entry).
        """
        assert num_steps >= 1, f"num_steps must be >= 1, got {num_steps}"
        T = self.cfg.timesteps
        acp = self.sched.alphas_cumprod
        b = xt.shape[0]
        if t_start is None:
            t_start = jnp.int32(T - 1)
        # Evenly spaced subsequence of {0..T-1}, descending; previous entry
        # of the last step is the data distribution (abar = 1). num_steps and
        # T are static, so the subsequence is a trace-time numpy computation;
        # np.unique drops the duplicate taus that rounding produces when
        # num_steps doesn't evenly sample {0..T-1} (duplicates are exact
        # algebraic no-ops but would each still cost a full UNet forward).
        import numpy as _np
        if num_steps >= 2:
            taus_np = _np.unique(_np.round(
                _np.linspace(0.0, T - 1, num_steps)).astype(_np.int32))
        else:
            taus_np = _np.array([T - 1], _np.int32)
        taus = jnp.asarray(taus_np)
        taus_desc = taus[::-1]
        a_t = acp[taus_desc]
        a_prev = jnp.concatenate(
            [acp[taus_desc[1:]], jnp.ones((1,), jnp.float32)])
        eta = jnp.asarray(eta, jnp.float32)

        def body(carry, inp):
            x, k = carry
            tau, at, ap = inp
            active = tau <= t_start
            k, k_noise = jax.random.split(k)
            t_vec = jnp.full((b,), tau, jnp.int32)
            eps = self.model_fused.apply({"params": state.params}, x, t_vec)
            x0 = (x - jnp.sqrt(1.0 - at) * eps) / jnp.sqrt(at)
            sigma = eta * jnp.sqrt((1.0 - ap) / (1.0 - at)) * \
                jnp.sqrt(1.0 - at / ap)
            dir_c = jnp.sqrt(jnp.clip(1.0 - ap - sigma * sigma, 0.0))
            x_new = jnp.sqrt(ap) * x0 + dir_c * eps + \
                sigma * jax.random.normal(k_noise, x.shape)
            x = jnp.where(active, x_new, x)
            return (x, k), None

        (x, _), _ = jax.lax.scan(body, (xt, key), (taus_desc, a_t, a_prev))
        return jnp.clip(x, -1.0, 1.0)

    @functools.partial(jax.jit, static_argnums=(0, 2, 4))
    def generate_ddim(self, state: DiffusionState, shape: Tuple[int, ...],
                      key: jax.Array, num_steps: int,
                      eta: jax.Array = 0.0) -> jax.Array:
        """Unconditional generation through the strided DDIM chain."""
        k_x, k_chain = jax.random.split(key)
        xt = jax.random.normal(k_x, shape)
        return self.ddim_sample(state, xt, k_chain, num_steps, eta)

    @functools.partial(jax.jit, static_argnums=0)
    def predict_x0(self, state: DiffusionState, xt: jax.Array,
                   t: jax.Array) -> jax.Array:
        """One-step x0 estimate (test_diffusion.py:135-136)."""
        s = self.sched
        pred = self.model_fused.apply({"params": state.params}, xt, t)
        a = s.sqrt_alphas_cumprod[t][:, None, None, None]
        b = s.sqrt_one_minus_alphas_cumprod[t][:, None, None, None]
        return jnp.clip((xt - b * pred) / a, -1.0, 1.0)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def generate(self, state: DiffusionState, shape: Tuple[int, ...],
                 key: jax.Array) -> jax.Array:
        """Unconditional generation from pure noise."""
        k_x, k_chain = jax.random.split(key)
        xt = jax.random.normal(k_x, shape)
        t_start = jnp.full((), self.cfg.timesteps - 1, jnp.int32)
        return self.ancestral_sample(state, xt, t_start, k_chain)
