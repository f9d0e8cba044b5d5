"""Weight initializers matching the reference's DCGAN init.

Reference ``weights_init`` (gan_code.py:91-97): Conv* weights ~ N(0, 0.02);
BatchNorm scale ~ N(1, 0.02), bias = 0. Glow couplings use N(0, 0.05)
(nf_code.py:215-219).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dcgan_conv_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * 0.02


def dcgan_bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init
