"""InceptionV3 feature extractor for FID / Inception Score, in Flax (NHWC).

The reference gets this from torchmetrics (FrechetInceptionDistance with
``feature=64`` — the 64-channel first-maxpool features — and InceptionScore
from the 1008-way logits; SURVEY.md §2 #34). This module reimplements the
FID-variant InceptionV3 architecture (pytorch-fid layout: avg-pools with
count_include_pad=False) so that:

* with a torch weights file (pytorch-fid ``pt_inception-2015-12-05`` or
  torchvision ``inception_v3``) imported via
  :func:`vgd_tpu.io.torch_import.import_inception`, metric values match
  torchmetrics within numeric tolerance;
* without weights (this build environment has no network egress), a
  deterministic seeded random initialisation provides a self-consistent
  surrogate — FID over random-projection features is still a valid
  two-sample statistic — and results are tagged ``weights='random-init'``.

Feature taps: 64 (after the first maxpool — the reference's feature=64),
192, 768, 2048 (final pool), plus logits.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

F32 = jnp.float32


def avg_pool_nocount(x, window=3, stride=1, pad=1):
    """AvgPool with count_include_pad=False (pytorch-fid's modification)."""
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides,
                                   padding)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides,
                                   padding)
    return summed / counts


def max_pool(x, window=3, stride=2, pad=0):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((pad, pad), (pad, pad)))


class BasicConv2d(nn.Module):
    """Conv (no bias) + BatchNorm(eps=1e-3) + ReLU."""
    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    pad: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=(self.pad[0], self.pad[1]) if isinstance(
                        self.pad, tuple) else self.pad,
                    use_bias=False, dtype=F32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=F32, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), pad=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_nocount(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), pad=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), pad=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), pad=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), pad=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), pad=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), pad=(0, 3), name="branch7x7dbl_5")(bd)
        bp = avg_pool_nocount(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), pad=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), pad=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"   # FIDInceptionE_2 (last block) uses max pooling

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), pad=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), pad=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), pad=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), pad=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            bp = avg_pool_nocount(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID-variant InceptionV3. Returns {64, 192, 768, 2048, logits}."""
    num_classes: int = 1008   # TF-class layout (pytorch-fid / torchmetrics)

    @nn.compact
    def __call__(self, x_unit: jax.Array) -> Dict[str, jax.Array]:
        """x_unit: float NHWC in [0,1] at any resolution."""
        b = x_unit.shape[0]
        x = jax.image.resize(x_unit, (b, 299, 299, x_unit.shape[-1]),
                             method="bilinear")
        x = x * 2.0 - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), pad=(1, 1), name="Conv2d_2b_3x3")(x)
        x = max_pool(x)
        feat64 = jnp.mean(x, axis=(1, 2))          # the reference's feature=64
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x)
        feat192 = jnp.mean(x, axis=(1, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        feat768 = jnp.mean(x, axis=(1, 2))
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        feat2048 = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=F32, name="fc")(feat2048)
        return {"64": feat64, "192": feat192, "768": feat768,
                "2048": feat2048, "logits": logits}


@functools.lru_cache(maxsize=4)
def _build(seed: int = 0, num_classes: int = 1008):
    model = InceptionV3(num_classes=num_classes)
    variables = model.init(jax.random.key(seed),
                           jnp.zeros((1, 75, 75, 3), F32))
    return model, variables


def load_inception(weights_path: Optional[str] = None, feature: str = "64",
                   batch_limit: int = 64):
    """Returns (feature_fn, weights_tag).

    feature_fn: uint8 NHWC -> (features[feature], logits), jit-compiled.
    With ``weights_path`` (a torch state_dict .pth), real InceptionV3
    weights are imported; otherwise seeded random init (tagged). The fc head
    width follows the file: 1008-way for pytorch-fid/torchmetrics
    ``pt_inception`` (TF class layout, what the reference's IS used),
    1000-way for plain torchvision exports.
    """
    tag = "random-init"
    if weights_path:
        from vgd_tpu.io.torch_import import _load_state_dict, \
            import_inception
        sd = _load_state_dict(weights_path)
        model, variables = _build(num_classes=sd["fc.weight"].shape[0])
        variables = import_inception(weights_path, variables)
        tag = weights_path
    else:
        model, variables = _build()

    @jax.jit
    def run(x_unit):
        out = model.apply(variables, x_unit)
        return out[feature], out["logits"]

    def feature_fn(x_uint8):
        x = jnp.asarray(x_uint8, F32) / 255.0
        return run(x)

    # carried so MetricAccumulator can tag surrogate-weight metrics without
    # every call site threading the tag (VERDICT r4 item 5)
    feature_fn.weights_tag = tag
    return feature_fn, tag
