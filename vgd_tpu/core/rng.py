"""Deterministic RNG plumbing.

Capability parity with the reference's ``configure_seed`` (utils.py:6-14):
seed 42 everywhere, deterministic by construction. In JAX determinism is the
default — randomness is threaded explicitly as PRNG keys, so there is nothing
to "switch off". This module standardises how keys are derived so that every
workload is reproducible from a single integer seed.
"""
from __future__ import annotations

import os
import random as _pyrandom

import jax
import numpy as np

DEFAULT_SEED = 42


def seed_all(seed: int = DEFAULT_SEED, impl: str = None) -> jax.Array:
    """Seed host-side RNGs (numpy / python, used only by data loaders and
    offline eval) and return the root JAX PRNG key for device-side randomness.

    ``impl`` selects the key's PRNG family: None/"threefry2x32" (jax default,
    used by the golden tests) or "rbg" (XLA RngBitGenerator — measured 7.9%
    faster on the flagship VAE-GAN step on TPU v5e, BASELINE.md; the training
    loops pass ``RunConfig.prng_impl``). Both are deterministic per seed;
    they produce different (equally valid) random streams.
    """
    os.environ["PYTHONHASHSEED"] = str(seed)
    _pyrandom.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed, impl=impl) if impl else jax.random.key(seed)


def fold(key: jax.Array, *data: int) -> jax.Array:
    """Derive a sub-key by folding in one or more integers (e.g. step index)."""
    for d in data:
        key = jax.random.fold_in(key, d)
    return key


def key_iter(key: jax.Array):
    """Infinite iterator of fresh keys (host-side convenience, NOT for use
    inside jit — inside a step, split explicitly)."""
    i = 0
    while True:
        yield jax.random.fold_in(key, i)
        i += 1
