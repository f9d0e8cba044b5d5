"""Param-holder modules for the fused conv+BN+LeakyReLU training path.

The fused op (ops/fused_conv.py) replaces the ``nn.Conv`` -> ``nn.BatchNorm``
-> ``leaky_relu`` chain inside the Encoder (main_vae.py:20-31 semantics) and
Discriminator (gan_code.py:59-66 semantics) *without changing the variable
tree*: these holders register parameters / batch_stats under exactly the
names and shapes ``nn.Conv`` / ``nn.BatchNorm`` would (``conv{i}/kernel``,
``conv{i}/bias``, ``bn{i}/scale``, ``bn{i}/bias``, batch_stats
``bn{i}/mean|var``), so orbax checkpoints, the torch importers
(io/torch_import.py) and the parity tests are oblivious to which path
computed the activations.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvParams(nn.Module):
    """Registers an ``nn.Conv``-compatible (kernel, bias) pair."""
    features: int
    in_features: int
    kernel_size: Tuple[int, int] = (4, 4)
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, self.in_features, self.features),
                            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class BNParams(nn.Module):
    """Registers ``nn.BatchNorm``-compatible params + running stats.

    Call once with no args to read (scale, bias, running_mean, running_var);
    call again with batch statistics to apply the flax momentum update
    (ra = m * ra + (1 - m) * batch), mirroring nn.BatchNorm's train-mode
    side effect in the ``batch_stats`` collection.
    """
    features: int
    momentum: float = 0.9
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, batch_mean: Optional[jax.Array] = None,
                 batch_var: Optional[jax.Array] = None):
        scale = self.param("scale", self.scale_init, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,),
                                                  jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,),
                                                jnp.float32))
        if batch_mean is not None and not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * batch_mean
            ra_var.value = m * ra_var.value + (1.0 - m) * batch_var
        return scale, bias, ra_mean.value, ra_var.value
