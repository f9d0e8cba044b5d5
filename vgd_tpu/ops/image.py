"""On-device image dtype/range conversions.

The reference converts uint8 JPEGs to float on the CPU (ToTensor + Normalize,
dataset_code.py:26-30, 147-150); here raw uint8 batches are shipped to the
device and converted there, fused into the compiled step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def to_unit(x_uint8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 -> [0, 1] (torchvision ToTensor; 'LQ' path dataset_code.py:26-30)."""
    return x_uint8.astype(dtype) / 255.0


def to_signed(x_uint8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 -> [-1, 1] (ToTensor + Normalize(0.5, 0.5); 'HQ' path
    dataset_code.py:147-150)."""
    return x_uint8.astype(dtype) / 127.5 - 1.0


def signed_to_unit(x: jax.Array) -> jax.Array:
    """[-1,1] -> [0,1] (metric preprocessing, e.g. vaegan_code.py:170-171)."""
    return (x + 1.0) * 0.5


def unit_to_uint8(x: jax.Array) -> jax.Array:
    """[0,1] float -> uint8 with clamping (vaegan_code.py:176-177)."""
    return jnp.clip(x * 255.0, 0, 255).astype(jnp.uint8)


def quantize_bits(x_unit: jax.Array, n_bits: int) -> jax.Array:
    """Glow n-bit dequantisation input prep (nf_code.py:582-586):
    x*255 -> floor(/2^(8-n)) -> /n_bins - 0.5."""
    n_bins = 2.0 ** n_bits
    x = x_unit * 255.0
    if n_bits < 8:
        x = jnp.floor(x / 2 ** (8 - n_bits))
    return x / n_bins - 0.5
