"""Convolution primitives (NHWC / HWIO, MXU-friendly).

Standard convolutions use ``flax.linen.Conv`` (XLA's conv emitter tiles these
onto the MXU directly). Transposed convolution is implemented explicitly as a
fractionally-strided convolution via ``lax.conv_general_dilated`` with
``lhs_dilation`` — mathematically identical to torch ``ConvTranspose2d(k,s,p)``
(used by the reference generator, gan_code.py:16-54), which keeps the
PyTorch-checkpoint importer exact and lets XLA fuse the zero-insertion into
the conv instead of materialising it.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv_transpose2d(x: jax.Array, w: jax.Array, stride: int = 2,
                     padding: int = 1) -> jax.Array:
    """torch.nn.ConvTranspose2d semantics.

    x: (B, H, W, Cin) NHWC.  w: (kh, kw, Cin, Cout) HWIO, *unflipped* (i.e.
    torch's weight transposed to HWIO; this function applies the spatial flip
    that makes convT the exact adjoint of conv).
    out: (B, H', W', Cout) with H' = (H-1)*stride - 2*padding + kh.
    """
    kh, kw = w.shape[0], w.shape[1]
    # convT(k, s, p) == conv(x dilated by s, kernel flipped, pad k-1-p)
    w_flipped = jnp.flip(w, axis=(0, 1))
    pad_h = kh - 1 - padding
    pad_w = kw - 1 - padding
    return jax.lax.conv_general_dilated(
        x, w_flipped,
        window_strides=(1, 1),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )


class ConvTranspose(nn.Module):
    """Flax module wrapping :func:`conv_transpose2d` (bias-free, like the
    reference generator's layers, gan_code.py:21-49)."""
    features: int
    kernel_size: Tuple[int, int] = (4, 4)
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        w = self.param("kernel", self.kernel_init,
                       (kh, kw, cin, self.features), self.param_dtype)
        y = conv_transpose2d(x.astype(self.dtype), w.astype(self.dtype),
                             self.stride, self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
            y = y + b.astype(self.dtype)
        return y
