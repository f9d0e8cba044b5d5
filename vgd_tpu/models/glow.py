"""Glow normalizing flow (2-D images and 1-D EEG variants).

Capability parity with nf_code.py:20-538 and flow_eeg.py:74-336, re-designed
as ONE generic NHWC flax implementation — the reference maintains two
near-duplicate module stacks; here a ``variant`` knob selects:

* ``variant='image'`` (nf_code.py): 2x2 space-to-depth squeeze (x4 channels),
  3x3/1x1 coupling convs, channel count doubling per block.
* ``variant='eeg'`` (flow_eeg.py): squeeze factor 2 along time only
  (flow_eeg.py:229-233), (3,1)/(1,1) coupling convs padded only on the time
  axis (flow_eeg.py:89-96), constant per-block channel count
  (flow_eeg.py:309-313).

Per-layer semantics (with reference cites):
* ActNorm  (nf_code.py:28-91): y = s*(x+b), logdet = H*W*sum(log|s|);
  data-dependent init from the first batch (mean/unbiased-std per channel,
  nf_code.py:49-71) — realised functionally via an 'actnorm_init' mutable
  collection instead of in-place mutation.
* Invertible 1x1 conv (nf_code.py:122-187): PLU parameterisation — fixed
  permutation P and sign(s) (buffers, stop-gradient), trainable L, U and
  log|s|; logdet = H*W*sum(log|s|); reverse uses the explicit matrix inverse.
  PLU math stays float32 (SURVEY.md §7 numerics risk).
* Additive coupling (nf_code.py:190-242): NN = Conv3x3(512, N(0,0.05)) ->
  ReLU -> Conv1x1(512, N(0,0.05)) -> ReLU -> ZeroConv; out_b = x_b + NN(x_a);
  logdet = 0.
* ZeroConv (nf_code.py:94-119): 3x3 VALID conv on input padded with VALUE 1,
  zero-initialised weight+bias, output scaled by exp(3*scale).
* FlowBlock (nf_code.py:369-456): squeeze -> K flows -> split with a learned
  ZeroConv prior producing (mean, log_sd); final block priors on zeros.
* GlowModel (nf_code.py:459-505): L blocks; forward returns
  (log_p_sum, logdet, z_outs); reverse consumes a z list.

The reference's dead ``my*`` rewrites (nf_code.py:248-329) and stray
``breakpoint()`` debug artifacts (nf_code.py:447,587,684) are intentionally
not reproduced (SURVEY.md §7).
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vgd_tpu.ops.initializers import normal_init

F32 = jnp.float32


# ---------------------------------------------------------------------------
# Gaussian helpers (nf_code.py:20-25)
# ---------------------------------------------------------------------------

def gaussian_log_p(x, mean, log_sd):
    return (-0.5 * math.log(2 * math.pi) - log_sd
            - 0.5 * jnp.square(x - mean) / jnp.exp(2.0 * log_sd))


def gaussian_sample(eps, mean, log_sd):
    return mean + jnp.exp(log_sd) * eps


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init (nf_code.py:28-91)."""
    channels: int

    def setup(self):
        self.b = self.param("b", nn.initializers.zeros, (self.channels,), F32)
        self.s = self.param("s", nn.initializers.ones, (self.channels,), F32)

    def __call__(self, x, init: bool = False):
        if init:
            # First-batch statistics: mean / unbiased std over (B, H, W)
            # per channel (torch .std(1) default ddof=1, nf_code.py:54-68).
            mean = jnp.mean(x, axis=(0, 1, 2))
            std = jnp.std(x, axis=(0, 1, 2), ddof=1)
            b = -mean
            s = 1.0 / (std + 1e-6)
            overwrite = lambda prev, new: new  # noqa: E731
            self.sow("actnorm_init", "b", b, reduce_fn=overwrite)
            self.sow("actnorm_init", "s", s, reduce_fn=overwrite)
        else:
            b, s = self.b, self.s
        y = s * (x + b)
        h, w = x.shape[1], x.shape[2]
        logdet = h * w * jnp.sum(jnp.log(jnp.abs(s)))
        return y, logdet

    def reverse(self, y):
        return y / self.s - self.b


def _plu_init(key, channels):
    """Random rotation -> PLU pieces (nf_code.py:139-157)."""
    w = jax.random.normal(key, (channels, channels), F32)
    q, _ = jnp.linalg.qr(w)
    p, l, u = jax.scipy.linalg.lu(q)
    s = jnp.diag(u)
    return {
        "P": p,                       # buffer (stop-gradient in forward)
        "L": l,
        "U": jnp.triu(u, 1),
        "log_s": jnp.log(jnp.abs(s)),
        "s_sign": jnp.sign(s),        # buffer
    }


class InvConv1x1(nn.Module):
    """PLU-parameterised invertible 1x1 convolution (nf_code.py:122-187)."""
    channels: int

    def setup(self):
        self.plu = self.param("plu", _plu_init, self.channels)

    def _weight(self):
        c = self.channels
        p = self.plu
        eye = jnp.eye(c, dtype=F32)
        l_mask = jnp.tril(jnp.ones((c, c), F32), -1)
        u_mask = jnp.triu(jnp.ones((c, c), F32), 1)
        P = jax.lax.stop_gradient(p["P"])
        s_sign = jax.lax.stop_gradient(p["s_sign"])
        # W = P (L~ + I) (U~ + diag(sign(s) e^{log|s|}))  (nf_code.py:161-167)
        return (P @ (p["L"] * l_mask + eye)
                @ (p["U"] * u_mask + jnp.diag(s_sign * jnp.exp(p["log_s"]))))

    def __call__(self, x):
        w = self._weight()
        # 1x1 conv == channel matmul: out_o = sum_i W[o,i] x_i  (MXU-friendly)
        y = jnp.einsum("bhwi,oi->bhwo", x.astype(F32), w)
        logdet = x.shape[1] * x.shape[2] * jnp.sum(self.plu["log_s"])
        return y, logdet

    def reverse(self, y):
        w_inv = jnp.linalg.inv(self._weight())
        return jnp.einsum("bhwi,oi->bhwo", y.astype(F32), w_inv)


class ZeroConv(nn.Module):
    """Zero-initialised conv on value-1-padded input, scaled by exp(3*scale)
    (nf_code.py:94-119; EEG kernel/padding variant flow_eeg.py:86-102)."""
    features: int
    kernel: Tuple[int, int] = (3, 3)
    pad: Tuple[Tuple[int, int], Tuple[int, int]] = ((1, 1), (1, 1))

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), self.pad[0], self.pad[1], (0, 0)),
                    constant_values=1.0)
        out = nn.Conv(self.features, self.kernel, padding="VALID",
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, dtype=F32,
                      name="conv")(x)
        scale = self.param("scale", nn.initializers.zeros,
                           (self.features,), F32)
        return out * jnp.exp(scale * 3.0)


class AdditiveCoupling(nn.Module):
    """Additive coupling with a 3-conv NN (nf_code.py:190-242)."""
    channels: int                 # full channel count of the flow
    filter_size: int = 512
    kernel: Tuple[int, int] = (3, 3)
    pad: Tuple[Tuple[int, int], Tuple[int, int]] = ((1, 1), (1, 1))
    compute_dtype: Any = F32

    def setup(self):
        self.conv1 = nn.Conv(self.filter_size, self.kernel, padding=self.pad,
                             kernel_init=normal_init(0.05),
                             bias_init=nn.initializers.zeros,
                             dtype=self.compute_dtype)
        self.conv2 = nn.Conv(self.filter_size, (1, 1),
                             kernel_init=normal_init(0.05),
                             bias_init=nn.initializers.zeros,
                             dtype=self.compute_dtype)
        self.zero = ZeroConv(self.channels // 2, self.kernel, self.pad)

    def _nn(self, xa):
        h = nn.relu(self.conv1(xa.astype(self.compute_dtype)))
        h = nn.relu(self.conv2(h))
        return self.zero(h.astype(F32))

    def __call__(self, x, init: bool = False):
        xa, xb = jnp.split(x, 2, axis=-1)
        out_b = xb + self._nn(xa)
        return jnp.concatenate([xa, out_b], axis=-1), 0.0

    def reverse(self, y):
        ya, yb = jnp.split(y, 2, axis=-1)
        in_b = yb - self._nn(ya)
        return jnp.concatenate([ya, in_b], axis=-1)


class Flow(nn.Module):
    """ActNorm -> InvConv -> AdditiveCoupling (nf_code.py:331-366)."""
    channels: int
    filter_size: int = 512
    kernel: Tuple[int, int] = (3, 3)
    pad: Tuple[Tuple[int, int], Tuple[int, int]] = ((1, 1), (1, 1))
    compute_dtype: Any = F32

    def setup(self):
        self.actnorm = ActNorm(self.channels)
        self.invconv = InvConv1x1(self.channels)
        self.coupling = AdditiveCoupling(self.channels, self.filter_size,
                                         self.kernel, self.pad,
                                         self.compute_dtype)

    def __call__(self, x, init: bool = False):
        y, logdet = self.actnorm(x, init=init)
        y, det1 = self.invconv(y)
        y, det2 = self.coupling(y, init=init)
        return y, logdet + det1 + det2

    def reverse(self, y):
        y = self.coupling.reverse(y)
        y = self.invconv.reverse(y)
        return self.actnorm.reverse(y)


# ---------------------------------------------------------------------------
# Squeeze (space-to-depth) — channel ordering matches the torch reshape
# (nf_code.py:401-405 / flow_eeg.py:229-233) so checkpoints are importable.
# ---------------------------------------------------------------------------

def squeeze2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel = c*4 + a*2 + s."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # b, h2, w2, c, a, s
    return x.reshape(b, h // 2, w // 2, c * 4)


def unsqueeze2d(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # b, h, a, w, s, c
    return x.reshape(b, h * 2, w * 2, c)


def squeeze_time(x):
    """EEG: (B, T, 1, C) -> (B, T/2, 1, 2C), channel = c*2 + a
    (flow_eeg.py:229-233)."""
    b, t, w, c = x.shape
    x = x.reshape(b, t // 2, 2, w, c)
    x = x.transpose(0, 1, 3, 4, 2)             # b, t2, w, c, a
    return x.reshape(b, t // 2, w, c * 2)


def unsqueeze_time(x):
    b, t, w, c2 = x.shape
    c = c2 // 2
    x = x.reshape(b, t, w, c, 2)
    x = x.transpose(0, 1, 4, 2, 3)             # b, t, a, w, c
    return x.reshape(b, t * 2, w, c)


# ---------------------------------------------------------------------------
# Blocks + model
# ---------------------------------------------------------------------------

class FlowBlock(nn.Module):
    """Squeeze -> K flows -> (optional) split with a ZeroConv prior
    (nf_code.py:369-456 / flow_eeg.py:193-288)."""
    in_channels: int              # channels BEFORE the squeeze
    n_flows: int
    split: bool = True
    variant: str = "image"        # 'image' | 'eeg'
    filter_size: int = 512
    compute_dtype: Any = F32

    def setup(self):
        img = self.variant == "image"
        factor = 4 if img else 2
        kernel = (3, 3) if img else (3, 1)
        pad = ((1, 1), (1, 1)) if img else ((1, 1), (0, 0))
        sq = self.in_channels * factor
        self.flows = [Flow(sq, self.filter_size, kernel, pad,
                           self.compute_dtype, name=f"flow{i}")
                      for i in range(self.n_flows)]
        if self.split:
            self.prior = ZeroConv(sq, kernel, pad, name="prior")
        else:
            self.prior = ZeroConv(sq * 2, kernel, pad, name="prior")
        self._squeeze = squeeze2d if img else squeeze_time
        self._unsqueeze = unsqueeze2d if img else unsqueeze_time

    def __call__(self, x, init: bool = False):
        b = x.shape[0]
        y = self._squeeze(x)
        logdet = 0.0
        for flow in self.flows:
            y, ld = flow(y, init=init)
            logdet = logdet + ld
        if self.split:
            y, z_new = jnp.split(y, 2, axis=-1)
            mean, log_sd = jnp.split(self.prior(y), 2, axis=-1)
            log_p = gaussian_log_p(z_new, mean, log_sd)
        else:
            zero = jnp.zeros_like(y)
            mean, log_sd = jnp.split(self.prior(zero), 2, axis=-1)
            log_p = gaussian_log_p(y, mean, log_sd)
            z_new = y
        log_p = jnp.sum(log_p.reshape(b, -1), axis=1)
        return y, logdet, log_p, z_new

    def reverse(self, y, eps, reconstruct: bool = False):
        if reconstruct:
            x = jnp.concatenate([y, eps], axis=-1) if self.split else eps
        else:
            if self.split:
                mean, log_sd = jnp.split(self.prior(y), 2, axis=-1)
                z = gaussian_sample(eps, mean, log_sd)
                x = jnp.concatenate([y, z], axis=-1)
            else:
                zero = jnp.zeros_like(y)
                mean, log_sd = jnp.split(self.prior(zero), 2, axis=-1)
                x = gaussian_sample(eps, mean, log_sd)
        for flow in self.flows[::-1]:
            x = flow.reverse(x)
        return self._unsqueeze(x)


class GlowModel(nn.Module):
    """L blocks of K flows (nf_code.py:459-505 / flow_eeg.py:291-336)."""
    in_channels: int = 3
    n_flows: int = 32
    n_blocks: int = 4
    variant: str = "image"
    filter_size: int = 512
    compute_dtype: Any = F32

    def setup(self):
        blocks = []
        ch = self.in_channels
        for i in range(self.n_blocks - 1):
            blocks.append(FlowBlock(ch, self.n_flows, split=True,
                                    variant=self.variant,
                                    filter_size=self.filter_size,
                                    compute_dtype=self.compute_dtype,
                                    name=f"block{i}"))
            if self.variant == "image":
                ch *= 2            # nf_code.py:478-480
            # EEG: constant channel count per block (flow_eeg.py:309-313)
        blocks.append(FlowBlock(ch, self.n_flows, split=False,
                                variant=self.variant,
                                filter_size=self.filter_size,
                                compute_dtype=self.compute_dtype,
                                name=f"block{self.n_blocks - 1}"))
        self.blocks = blocks

    def __call__(self, x, init: bool = False):
        log_p_sum = 0.0
        logdet = 0.0
        z_outs = []
        for block in self.blocks:
            x, ld, lp, z_new = block(x, init=init)
            z_outs.append(z_new)
            logdet = logdet + ld
            log_p_sum = log_p_sum + lp
        return log_p_sum, logdet, z_outs

    def reverse(self, z_list: Sequence[jax.Array],
                reconstruct: bool = False):
        x = None
        for i, block in enumerate(self.blocks[::-1]):
            if i == 0:
                x = block.reverse(z_list[-1], z_list[-1],
                                  reconstruct=reconstruct)
            else:
                x = block.reverse(x, z_list[-(i + 1)],
                                  reconstruct=reconstruct)
        return x


# ---------------------------------------------------------------------------
# Shapes + loss (nf_code.py:510-538)
# ---------------------------------------------------------------------------

def calc_z_shapes(n_channel: int, input_size: int, n_block: int
                  ) -> List[Tuple[int, int, int]]:
    """Latent shapes (H, W, C) for image-variant sampling
    (nf_code.py:510-522, converted to NHWC)."""
    shapes = []
    size, ch = input_size, n_channel
    for _ in range(n_block - 1):
        size //= 2
        ch *= 2
        shapes.append((size, size, ch))
    size //= 2
    shapes.append((size, size, ch * 4))
    return shapes


def calc_z_shapes_eeg(num_chans: int, num_samples: int, n_block: int
                      ) -> List[Tuple[int, int, int]]:
    """Latent shapes (T, 1, C) for the EEG variant (flow_eeg.py:360-363:
    [(22,80),(22,40),(22,20),(44,10)] in torch layout)."""
    shapes = []
    t = num_samples
    for _ in range(n_block - 1):
        t //= 2
        shapes.append((t, 1, num_chans))
    t //= 2
    shapes.append((t, 1, num_chans * 2))
    return shapes


def calc_loss(log_p: jax.Array, logdet: jax.Array, image_size: int,
              n_bins: float, n_channels: int = 3):
    """Bits/dim objective (nf_code.py:528-538). The EEG trainer reuses this
    formula with image_size=T and n_bins=1 (flow_eeg.py:392); that exact
    normalisation is preserved for parity."""
    n_pixel = image_size * image_size * n_channels
    loss = -math.log(n_bins) * n_pixel + logdet + log_p
    scale = math.log(2) * n_pixel
    return (jnp.mean(-loss / scale), jnp.mean(log_p / scale),
            jnp.mean(logdet / scale))
