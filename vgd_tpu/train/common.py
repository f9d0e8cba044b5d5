"""Shared training-state containers and loss primitives."""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class NetState:
    """One network: parameters + BatchNorm running statistics + its
    optimizer state. The reference's torch Modules carry running stats
    implicitly; here they are explicit pytree leaves so the whole training
    step stays purely functional under jit."""
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        params = variables["params"]
        return cls(params=params,
                   batch_stats=variables.get("batch_stats", FrozenDict()),
                   opt_state=tx.init(params))

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def apply_gradients(self, tx: optax.GradientTransformation, grads,
                        new_batch_stats=None):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=new_params,
            opt_state=new_opt,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats))


def bce(p: jax.Array, target: jax.Array) -> jax.Array:
    """Binary cross-entropy on probabilities, torch.nn.BCELoss semantics:
    mean over elements, log terms clamped at -100."""
    p = p.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(p), -100.0)
    log_1p = jnp.maximum(jnp.log1p(-p), -100.0)
    return -jnp.mean(target * log_p + (1.0 - target) * log_1p)


def mse(a: jax.Array, b: jax.Array, reduction: str = "mean") -> jax.Array:
    d = jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32))
    return jnp.mean(d) if reduction == "mean" else jnp.sum(d)


def adam(lr: float, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam-equivalent (bias-corrected moments, eps outside
    the sqrt is torch's eps-hat convention — optax.adam matches)."""
    return optax.adam(lr, b1=b1, b2=b2, eps=eps)


def clamp_params(tree, clip_value: float):
    """WGAN weight clipping applied to every parameter post-update
    (gan_code.py:319-320 clamps all netD parameters)."""
    return jax.tree_util.tree_map(
        lambda p: jnp.clip(p, -clip_value, clip_value), tree)


def scan_epoch(step_impl, state, batches, key, *extra):
    """Device-resident epoch body shared by every epoch-driven trainer: ONE
    ``lax.scan`` over stacked uint8 batches (n_steps, B, ...), calling
    ``step_impl(state, batch, fold_in(key, i), *extra)`` per step. Returns
    (state, per-metric means over the scanned steps). The TPU-native answer
    to the reference's per-batch CPU->GPU copy + Python dispatch hot loops
    (vaegan_code.py:66, gan_code.py:187-226, main_vae.py:96-141,
    train_diffusion.py:110-134)."""
    def body(carry, inp):
        st, i = carry
        new_st, m = step_impl(st, inp, jax.random.fold_in(key, i), *extra)
        return (new_st, i + 1), m

    (state, _), ms = jax.lax.scan(body, (state, jnp.int32(0)), batches)
    return state, jax.tree_util.tree_map(jnp.mean, ms)
