"""DCGAN generator / discriminator (also the VAE-GAN decoder and the
denoising-VAE decoder).

Capability parity with gan_code.py:16-89, re-designed NHWC/TPU-first:
* Generator: ConvTranspose(4x4, stride 1, valid) from z to a 4x4 map with
  ngf*16 channels, then stride-2 ConvTranspose(4,2,1) stages doubling the
  spatial size and halving channels, each with BatchNorm+ReLU, closed by a
  3x3 conv + tanh (gan_code.py:21-50).
* Discriminator: stride-2 Conv(4,2,1) stages doubling channels (no BatchNorm
  on the first stage), LeakyReLU(0.2), final 4x4 valid conv to one logit +
  sigmoid (gan_code.py:59-89).

Unlike the reference (whose depth is hard-wired to 256x256), depth here is
derived from ``img_size`` so the same module family serves the 64x64
benchmark config and 256x256 training. At 256x256 the channel progression is
identical to the reference: 1024,512,256,128,64,32,16 down / 16..512 up.

BatchNorm statistics are computed over the *global* logical batch: under a
sharded-batch jit, XLA inserts the cross-replica reduction (the TPU
equivalent of torch SyncBatchNorm, needed because the reference's semantics
are single-device full-batch stats).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vgd_tpu.ops.conv import ConvTranspose
from vgd_tpu.ops.initializers import dcgan_conv_init, dcgan_bn_scale_init

Dtype = Any


def _num_stages(img_size: int) -> int:
    n = 0
    s = img_size
    while s > 4:
        assert s % 2 == 0, f"img_size must be 4*2^n, got {img_size}"
        s //= 2
        n += 1
    return n


class Generator(nn.Module):
    """z (B,1,1,nz) -> image (B,H,W,nc) in [-1,1]. Ref: gan_code.py:16-54."""
    img_size: int = 256
    nz: int = 128          # reference default; callers pass 100
    ngf: int = 64
    nc: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        n_up = _num_stages(self.img_size)
        x = z.astype(self.dtype)
        ch0 = self.ngf * 16
        x = ConvTranspose(ch0, (4, 4), stride=1, padding=0, dtype=self.dtype,
                          kernel_init=dcgan_conv_init, name="up0")(x)
        x = self._bn_relu(x, "bn0", train)
        for i in range(1, n_up + 1):
            ch = max(ch0 >> i, self.nc)
            x = ConvTranspose(ch, (4, 4), stride=2, padding=1,
                              dtype=self.dtype, kernel_init=dcgan_conv_init,
                              name=f"up{i}")(x)
            x = self._bn_relu(x, f"bn{i}", train)
        x = nn.Conv(self.nc, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, kernel_init=dcgan_conv_init,
                    name="out")(x)
        return jnp.tanh(x.astype(jnp.float32))

    def _bn_relu(self, x, name, train):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         scale_init=dcgan_bn_scale_init, name=name)(x)
        return nn.relu(x).astype(self.dtype)


class Discriminator(nn.Module):
    """image (B,H,W,nc) -> score (B,). Ref: gan_code.py:56-89."""
    img_size: int = 256
    ndf: int = 64
    nc: int = 3
    use_sigmoid: bool = True   # the reference keeps sigmoid even for WGAN
    dtype: Dtype = jnp.float32
    fused: bool = False   # Pallas fused conv+BN+LeakyReLU on the train path

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        n_down = _num_stages(self.img_size)
        h = x.astype(self.dtype)
        feat = None
        for i in range(n_down):
            ch = (self.ndf // 4) << i
            if self.fused and train and i > 0:
                from vgd_tpu.models.blocks import BNParams, ConvParams
                from vgd_tpu.ops.fused_conv import conv_bn_lrelu
                kernel, _ = ConvParams(ch, h.shape[-1], use_bias=False,
                                       kernel_init=dcgan_conv_init,
                                       name=f"down{i}")()
                bn = BNParams(ch, scale_init=dcgan_bn_scale_init,
                              name=f"bn{i}")
                scale, bbias, _, _ = bn()
                y, m, v = conv_bn_lrelu(h, kernel.astype(self.dtype),
                                        scale, bbias, padding=1,
                                        slope=0.2, eps=1e-5)
                bn(m, v)   # running-stat momentum update
                h = y.astype(self.dtype)
                feat = h  # penultimate activation = Dis_l feature map
                continue
            h = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        kernel_init=dcgan_conv_init, name=f"down{i}")(h)
            if i > 0:  # first stage has no BatchNorm (gan_code.py:61-62)
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 scale_init=dcgan_bn_scale_init,
                                 name=f"bn{i}")(h)
            h = nn.leaky_relu(h.astype(jnp.float32), 0.2).astype(self.dtype)
            feat = h  # penultimate activation = Dis_l feature map
        h = nn.Conv(1, (4, 4), padding="VALID", use_bias=False,
                    dtype=self.dtype, kernel_init=dcgan_conv_init,
                    name="out")(h)
        h = h.reshape(h.shape[0]).astype(jnp.float32)
        score = nn.sigmoid(h) if self.use_sigmoid else h
        if return_features:
            # Feature-reconstruction ("Dis_l") loss support: the reference
            # README describes matching discriminator features (README.md:11-14)
            # though vaegan_code.py:113 ships pixel MSE; both are offered.
            return score, feat.astype(jnp.float32)
        return score
