"""DDPM UNet (with and without attention).

Capability parity with diffusion_model.py:6-139 and
diffusion_model_no_attn.py:6-91, NHWC/TPU-first:

* sinusoidal timestep embedding (diffusion_model.py:6-12),
* residual ConvBlock: Conv3x3 -> [+time proj] -> GroupNorm(8) -> SiLU ->
  Conv3x3 -> GroupNorm(8) -> SiLU, 1x1 residual when channels change
  (diffusion_model.py:15-42),
* single-head self-attention over HW tokens (diffusion_model.py:44-61),
* cross-attention from pixels to 64 learned global tokens of dim 256
  (diffusion_model.py:63-85),
* 3-level UNet: MaxPool downsampling, bilinear (align_corners=False)
  upsampling with skip concat, cross-attn at levels 2-3, self-attn at level 3
  and the bottleneck, time MLP 256->1024->256 (diffusion_model.py:88-139).

The attention matmuls run through a fused kernel path (vgd_tpu.ops.attention)
on TPU; token counts at the attended resolutions are small (<=1024 at 256px
input), so the full-matrix XLA form is used as the reference semantics and
fallback.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vgd_tpu.ops.pallas_kernels import (attention, flash_attention,
                                        groupnorm_silu, groupnorm_silu_xla)

F32 = jnp.float32


class GroupNormSiLU(nn.Module):
    """GroupNorm(8) + SiLU with the same param tree as nn.GroupNorm
    ({scale, bias}). ``fused=True`` routes through the Pallas kernel
    (inference paths; the training step keeps the XLA form so autodiff
    stays on the stock path)."""
    groups: int = 8
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), F32)
        bias = self.param("bias", nn.initializers.zeros, (c,), F32)
        fn = groupnorm_silu if self.fused else groupnorm_silu_xla
        return fn(x.astype(F32), scale, bias, self.groups)


def sinusoidal_embedding(timesteps: jax.Array, dim: int) -> jax.Array:
    """sin/cos positional embedding of scalar timesteps
    (diffusion_model.py:6-12)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=F32)
                    / (half - 1))
    args = timesteps.astype(F32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)


class ConvBlock(nn.Module):
    """Residual double-conv block with additive time embedding
    (diffusion_model.py:15-42). Note the reference adds the time projection
    AFTER the first conv and BEFORE its GroupNorm (diffusion_model.py:34-41)."""
    out_ch: int
    time_emb_dim: Optional[int] = 256
    dtype: Any = F32
    fused: bool = False

    @nn.compact
    def __call__(self, x, t_emb=None):
        in_ch = x.shape[-1]
        res = x
        if in_ch != self.out_ch:
            res = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                          name="residual_conv")(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(x)
        if t_emb is not None and self.time_emb_dim is not None:
            proj = nn.Dense(self.out_ch, dtype=F32, name="time_proj")(t_emb)
            h = h + proj[:, None, None, :].astype(h.dtype)
        h = GroupNormSiLU(fused=self.fused, name="gn1")(h)
        h = h.astype(self.dtype)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        h = GroupNormSiLU(fused=self.fused, name="gn2")(h)
        return (h + res.astype(F32)).astype(self.dtype)


class AttentionBlock(nn.Module):
    """Single-head self-attention over flattened HW tokens with residual
    (diffusion_model.py:44-61)."""
    channels: int
    dtype: Any = F32
    fused: bool = False
    # sequence parallelism: a Mesh with a model axis > 1 routes the token
    # axis through ring attention (parallel/sequence_parallel.py) — K/V
    # blocks rotate via ppermute, peak memory O(N/p) per device
    sp_mesh: Any = None

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=F32,
                         name="norm")(x)
        qkv = nn.Conv(c * 3, (1, 1), dtype=self.dtype, name="qkv")(
            h.astype(self.dtype))
        q, k, v = jnp.split(qkv.reshape(b, hh * ww, 3 * c), 3, axis=-1)
        if self.sp_mesh is not None:
            from vgd_tpu.parallel.sequence_parallel import sp_self_attention
            out = sp_self_attention(self.sp_mesh, q.astype(F32),
                                    k.astype(F32), v.astype(F32),
                                    scale=1.0 / math.sqrt(c))
        else:
            # training path: ops.attention dispatches to the Pallas flash
            # kernels WITH custom VJP on TPU at large token counts (the
            # reference materialises the (HW)^2 matrix,
            # diffusion_model.py:52-60)
            attend = flash_attention if self.fused else attention
            out = attend(q.astype(F32), k.astype(F32), v.astype(F32),
                         scale=1.0 / math.sqrt(c))
        out = out.reshape(b, hh, ww, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj")(
            out.astype(self.dtype))
        return out.astype(F32) + x.astype(F32)


class CrossAttentionToGlobalTokens(nn.Module):
    """Pixels query 64 learned global tokens (diffusion_model.py:63-85)."""
    dim: int
    num_tokens: int = 64
    token_dim: int = 256
    dtype: Any = F32
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        tokens = self.param("global_tokens", nn.initializers.normal(1.0),
                            (1, self.num_tokens, self.token_dim), F32)
        x_ = x.reshape(b, hh * ww, c)
        q_in = nn.LayerNorm(epsilon=1e-5, dtype=F32, name="norm")(x_)
        q = nn.Dense(self.token_dim, dtype=self.dtype, name="to_q")(
            q_in.astype(self.dtype))
        kv = nn.Dense(self.token_dim * 2, dtype=self.dtype, name="to_kv")(
            jnp.broadcast_to(tokens, (b, self.num_tokens, self.token_dim))
            .astype(self.dtype))
        k, v = jnp.split(kv, 2, axis=-1)
        # 64 kv tokens — ops.attention's size heuristic keeps this on the
        # XLA form during training; fused inference uses the flash kernel
        attend = flash_attention if self.fused else attention
        h = attend(q.astype(F32), k.astype(F32), v.astype(F32),
                   scale=1.0 / math.sqrt(self.token_dim))
        h = nn.Dense(c, dtype=self.dtype, name="proj")(h.astype(self.dtype))
        return h.astype(F32).reshape(b, hh, ww, c) + x.astype(F32)


def max_pool2(x):
    """MaxPool2d(2) (diffusion_model.py:105)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def upsample2_bilinear(x):
    """scale_factor=2 bilinear, align_corners=False — half-pixel centers,
    which jax.image.resize('bilinear') implements
    (diffusion_model.py:135-137)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")


class UNet(nn.Module):
    """3-level DDPM UNet; ``attention=False`` reproduces
    diffusion_model_no_attn.py:47-91."""
    out_ch: int = 3
    base_ch: int = 64
    time_emb_dim: int = 256
    attention: bool = True
    dtype: Any = F32
    # route attention + GroupNorm/SiLU through the Pallas kernels; used on
    # inference paths (sampling), where no VJP is required
    fused: bool = False
    # sequence-parallel mesh: bottleneck self-attention tokens sharded over
    # the mesh's model axis (ring attention); cross-attention needs no ring
    # (its 64 global-token K/V replicate)
    sp_mesh: Any = None

    @nn.compact
    def __call__(self, x, t):
        c = self.base_ch
        t_emb = sinusoidal_embedding(t, self.time_emb_dim)
        t_emb = nn.Dense(self.time_emb_dim * 4, dtype=F32,
                         name="time_mlp1")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(self.time_emb_dim, dtype=F32,
                         name="time_mlp2")(t_emb)

        d1 = ConvBlock(c, self.time_emb_dim, self.dtype, self.fused,
                       name="down1")(x.astype(self.dtype), t_emb)
        d2 = ConvBlock(c * 2, self.time_emb_dim, self.dtype, self.fused,
                       name="down2")(max_pool2(d1), t_emb)
        if self.attention:
            d2 = CrossAttentionToGlobalTokens(c * 2, dtype=self.dtype,
                                              fused=self.fused,
                                              name="cross_attn2")(d2)
        d3 = ConvBlock(c * 4, self.time_emb_dim, self.dtype, self.fused,
                       name="down3")(max_pool2(d2), t_emb)
        if self.attention:
            d3 = CrossAttentionToGlobalTokens(c * 4, dtype=self.dtype,
                                              fused=self.fused,
                                              name="cross_attn3")(d3)
            # NOTE: the reference constructs a level-3 self-attention module
            # (diffusion_model.py:104) but never calls it in forward
            # (diffusion_model.py:124-131); behavioural parity keeps it out.

        b = ConvBlock(c * 4, self.time_emb_dim, self.dtype, self.fused,
                      name="bottleneck")(max_pool2(d3), t_emb)
        if self.attention:
            b = AttentionBlock(c * 4, dtype=self.dtype, fused=self.fused,
                               sp_mesh=self.sp_mesh,
                               name="attn_bottleneck")(b)

        u3 = ConvBlock(c * 2, self.time_emb_dim, self.dtype, self.fused,
                       name="up3")(
            jnp.concatenate([upsample2_bilinear(b), d3], axis=-1), t_emb)
        u2 = ConvBlock(c, self.time_emb_dim, self.dtype, self.fused, name="up2")(
            jnp.concatenate([upsample2_bilinear(u3), d2], axis=-1), t_emb)
        u1 = ConvBlock(c, self.time_emb_dim, self.dtype, self.fused, name="up1")(
            jnp.concatenate([upsample2_bilinear(u2), d1], axis=-1), t_emb)

        return nn.Conv(self.out_ch, (1, 1), dtype=F32,
                       name="out_conv")(u1.astype(F32))
