"""Device-side image corruption (jittable, batched, static shapes).

Capability parity with the reference's CPU-side per-sample transforms
(dataset_code.py:35-56): gaussian noise with a per-sample random std drawn
U(0,1)*noise_max_std, and a random occlusion rectangle filled with uniform
noise, whose side lengths are 1-25%% of min(H,W) and whose position is
restricted to the central 25-75%% region of the image.

TPU-native differences: everything is vectorised over the batch and compiled
into the training step, so corruption costs ~nothing on the VPU instead of
serialising on host CPU. Rectangles are realised as iota-comparison masks —
no dynamic shapes.

Images are NHWC in [-1, 1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def add_gaussian_noise(key: jax.Array, img: jax.Array, noise_max_std: float,
                       clip: bool = True) -> jax.Array:
    """noisy = clamp(img + randn * (U(0,1)*noise_max_std per sample), -1, 1).

    Reference: dataset_code.py:35-42 (std drawn once per image).
    """
    k_std, k_noise = jax.random.split(key)
    b = img.shape[0]
    std = jax.random.uniform(k_std, (b,) + (1,) * (img.ndim - 1),
                             dtype=img.dtype) * noise_max_std
    noisy = img + jax.random.normal(k_noise, img.shape, img.dtype) * std
    if clip:
        noisy = jnp.clip(noisy, -1.0, 1.0)
    return noisy


def add_occlusion_rectangle(key: jax.Array, img: jax.Array,
                            min_size: float = 0.01,
                            max_size: float = 0.25) -> jax.Array:
    """Overlay a per-sample random rectangle of uniform noise in [-1, 1].

    Reference: dataset_code.py:44-56 — side lengths in
    [round(min(H,W)*min_size), round(min(H,W)*max_size)], top-left constrained
    so the rectangle stays within the central 25-75%% band, per-channel uniform
    fill.
    """
    b, h, w, c = img.shape
    s = min(h, w)
    lo = max(int(round(s * min_size)), 1)
    hi = int(round(s * max_size))
    k_h, k_w, k_x, k_y, k_fill = jax.random.split(key, 5)

    rect_h = jax.random.randint(k_h, (b,), lo, hi + 1)
    rect_w = jax.random.randint(k_w, (b,), lo, hi + 1)
    # x in [round(W*0.25), round(W*0.75) - rect_w], inclusive
    x0_lo = int(round(w * 0.25))
    y0_lo = int(round(h * 0.25))
    x_hi = int(round(w * 0.75)) + 1 - rect_w          # exclusive upper bound
    y_hi = int(round(h * 0.75)) + 1 - rect_h
    u_x = jax.random.uniform(k_x, (b,))
    u_y = jax.random.uniform(k_y, (b,))
    x0 = x0_lo + (u_x * jnp.maximum(x_hi - x0_lo, 1)).astype(jnp.int32)
    y0 = y0_lo + (u_y * jnp.maximum(y_hi - y0_lo, 1)).astype(jnp.int32)

    ys = jax.lax.broadcasted_iota(jnp.int32, (b, h, w, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, h, w, 1), 2)
    y0b = y0[:, None, None, None]
    x0b = x0[:, None, None, None]
    mask = ((ys >= y0b) & (ys < y0b + rect_h[:, None, None, None]) &
            (xs >= x0b) & (xs < x0b + rect_w[:, None, None, None]))
    fill = jax.random.uniform(k_fill, img.shape, img.dtype) * 2.0 - 1.0
    return jnp.where(mask, fill, img)


def corrupt(key: jax.Array, img: jax.Array, noise_max_std: float,
            occlusion: bool = True) -> jax.Array:
    """Full reference corruption pipeline: optional rectangle, then noise,
    then clamp (dataset_code.py:35-42 order: rect first, noise after)."""
    k_rect, k_noise = jax.random.split(key)
    out = img
    if occlusion:
        out = add_occlusion_rectangle(k_rect, out)
    out = add_gaussian_noise(k_noise, out, noise_max_std, clip=True)
    return out
