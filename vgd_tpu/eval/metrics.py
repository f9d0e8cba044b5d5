"""Image quality metrics: MSE, PSNR, SSIM, Inception Score, FID.

Capability parity with the reference's torchmetrics stack (SURVEY.md §2 #34):
* SSIM with data_range (0,1): gaussian 11x11 kernel, sigma 1.5, k1=0.01,
  k2=0.03 (torchmetrics defaults used at e.g. vaegan_code.py:143,174);
  inputs clamped to the range, per-image mean over channels.
* InceptionScore / FID(feature=64): the reference relies on torchmetrics'
  InceptionV3; here feature extraction is a Flax InceptionV3
  (vgd_tpu.eval.inception) and the statistics (Frechet distance, IS splits)
  are computed from accumulated features with the same formulas.
* PSNR + MSE: named as intended denoising metrics in the reference README
  (README.md:22) but never implemented there — implemented here properly
  (BASELINE.md demands PSNR parity).

SSIM/PSNR/MSE are pure-JAX and jittable (usable inside compiled eval steps);
FID/IS statistics run host-side on accumulated features, as offline eval.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Pixel metrics
# ---------------------------------------------------------------------------

def mse_metric(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean squared error over all elements."""
    return jnp.mean(jnp.square(pred.astype(jnp.float32)
                               - target.astype(jnp.float32)))


def psnr(pred: jax.Array, target: jax.Array,
         data_range: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio, mean over the batch (dB).

    Per-image MSE -> 10 log10(range^2 / mse). README.md:22 names PSNR as a
    denoising metric; the reference never implements it.
    """
    p = pred.astype(jnp.float32).reshape(pred.shape[0], -1)
    t = target.astype(jnp.float32).reshape(target.shape[0], -1)
    per_img_mse = jnp.mean(jnp.square(p - t), axis=1)
    return jnp.mean(10.0 * jnp.log10(data_range ** 2 /
                                     jnp.maximum(per_img_mse, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-jnp.square(coords) / (2 * sigma * sigma))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03,
         clamp: bool = True) -> jax.Array:
    """Structural similarity, NHWC, mean over batch.

    Matches torchmetrics StructuralSimilarityIndexMeasure semantics with
    data_range=(0,1): inputs are clamped into the range, gaussian-weighted
    local statistics, VALID windowing, mean over all windows/channels.
    """
    if clamp:
        pred = jnp.clip(pred, 0.0, data_range)
        target = jnp.clip(target, 0.0, data_range)
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    c = pred.shape[-1]
    kern = _gaussian_kernel(kernel_size, sigma)
    # depthwise conv: one gaussian filter per channel
    kern4 = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))  # HWIO, groups=c

    def filt(x):
        # HIGHEST precision: TPU convs otherwise truncate to bf16, and the
        # E[x^2]-E[x]^2 cancellation then produces garbage (SSIM >> 1) on
        # smooth regions
        return jax.lax.conv_general_dilated(
            x, kern4, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    # clamp self-variances at 0 (float cancellation can leave tiny negatives
    # that blow up the ratio on near-constant windows)
    sigma_pp = jnp.maximum(filt(pred * pred) - mu_pp, 0.0)
    sigma_tt = jnp.maximum(filt(target * target) - mu_tt, 0.0)
    sigma_pt = filt(pred * target) - mu_pt
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ssim_map = ((2 * mu_pt + c1) * (2 * sigma_pt + c2)) / \
        ((mu_pp + mu_tt + c1) * (sigma_pp + sigma_tt + c2))
    return jnp.mean(ssim_map)


# ---------------------------------------------------------------------------
# FID / IS statistics (host-side, from accumulated features/logits)
# ---------------------------------------------------------------------------

def frechet_distance(feat_real: np.ndarray, feat_fake: np.ndarray) -> float:
    """FID between two feature sets (N, D): ||mu1-mu2||^2 +
    Tr(S1 + S2 - 2 sqrt(S1 S2)). Same statistic torchmetrics computes over
    InceptionV3 features (feature=64 in the reference)."""
    from scipy import linalg

    mu1, mu2 = feat_real.mean(0), feat_fake.mean(0)
    s1 = np.cov(feat_real, rowvar=False)
    s2 = np.cov(feat_fake, rowvar=False)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(s1 @ s2)
    if isinstance(covmean, tuple):   # older scipy returns (sqrtm, errest)
        covmean = covmean[0]
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1 + s2 - 2.0 * covmean))


def inception_score_from_logits(logits: np.ndarray,
                                splits: int = 10) -> tuple:
    """IS = exp(E_x KL(p(y|x) || p(y))), computed over `splits` chunks
    (torchmetrics InceptionScore default), returns (mean, std)."""
    logits = np.asarray(logits, np.float64)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    n = probs.shape[0]
    scores = []
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        if len(part) == 0:
            continue
        py = part.mean(axis=0, keepdims=True)
        kl = (part * (np.log(part + 1e-12) - np.log(py + 1e-12))).sum(1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


def _knn_radii(feat: np.ndarray, k: int, block: int = 2048) -> np.ndarray:
    """Distance from each row to its k-th nearest OTHER row (blocked O(N^2))."""
    n = feat.shape[0]
    sq = np.sum(feat * feat, axis=1)
    radii = np.empty(n, np.float64)
    for s in range(0, n, block):
        e = min(s + block, n)
        d2 = sq[s:e, None] + sq[None, :] - 2.0 * (feat[s:e] @ feat.T)
        np.maximum(d2, 0.0, out=d2)
        d2[np.arange(s, e) - s, np.arange(s, e)] = np.inf  # exclude self
        # k-th smallest distance (k=1 -> nearest neighbor)
        radii[s:e] = np.sqrt(np.partition(d2, k - 1, axis=1)[:, k - 1])
    return radii


def _covered_fraction(query: np.ndarray, support: np.ndarray,
                      radii: np.ndarray, block: int = 2048) -> float:
    """Fraction of query rows lying within any support row's k-NN ball."""
    sq_s = np.sum(support * support, axis=1)
    sq_q = np.sum(query * query, axis=1)
    r2 = radii * radii
    hits = 0
    for s in range(0, query.shape[0], block):
        e = min(s + block, query.shape[0])
        d2 = sq_q[s:e, None] + sq_s[None, :] - 2.0 * (query[s:e] @ support.T)
        np.maximum(d2, 0.0, out=d2)
        hits += int(np.any(d2 <= r2[None, :], axis=1).sum())
    return hits / max(query.shape[0], 1)


def manifold_precision_recall(feat_real: np.ndarray, feat_fake: np.ndarray,
                              k: int = 3) -> Dict[str, float]:
    """Improved precision/recall for generative models (Kynkaanniemi et al.
    2019): each set's manifold is the union of k-NN balls around its samples.

    precision = fraction of fake samples inside the REAL manifold (fidelity);
    recall    = fraction of real samples inside the FAKE manifold (coverage);
    f1        = their harmonic mean.

    The reference's README names manifold Precision/Recall/F1 as intended
    metrics (README.md:22) but never implements them; this completes that
    capability on the same Inception features FID already accumulates.
    Requires > k samples per set; returns NaNs otherwise.
    """
    feat_real = np.asarray(feat_real, np.float64)
    feat_fake = np.asarray(feat_fake, np.float64)
    if feat_real.shape[0] <= k or feat_fake.shape[0] <= k:
        return {"precision": float("nan"), "recall": float("nan"),
                "f1": float("nan")}
    rad_real = _knn_radii(feat_real, k)
    rad_fake = _knn_radii(feat_fake, k)
    precision = _covered_fraction(feat_fake, feat_real, rad_real)
    recall = _covered_fraction(feat_real, feat_fake, rad_fake)
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) > 0 else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1}


class MetricAccumulator:
    """Streaming evaluation over batches, mirroring the reference's
    per-epoch torchmetrics update/compute loop (vaegan_code.py:143-185):
    SSIM on [0,1] floats; IS on fake uint8; FID on real+fake uint8 features.

    feature extraction is injected (a callable uint8 NHWC -> (features,
    logits)); see vgd_tpu.eval.inception.load_inception.
    """

    def __init__(self, feature_fn=None, manifold_k: Optional[int] = 3,
                 weights_tag: Optional[str] = None):
        self.feature_fn = feature_fn
        self.manifold_k = manifold_k
        # 'random-init' (see eval/inception.py load_inception) marks the
        # egress-blocked surrogate: FID over random-projection features is
        # still a valid two-sample statistic (relative trend only), but IS
        # is provably ~1.0 under random logits. compute() suffixes the
        # feature-based keys with '_surrogate' and drops IS so no logged row
        # can be misread as real-Inception quality (VERDICT r4 item 5).
        self.weights_tag = (weights_tag if weights_tag is not None
                            else getattr(feature_fn, "weights_tag", None))
        self.reset()

    def reset(self):
        # device-resident accumulation: update() keeps everything as device
        # arrays (async dispatch) and compute() fetches ONCE — per-batch
        # float()/np.asarray() here would be the reference's .item()
        # pathology on the eval side (SURVEY.md §3.1)
        self._ssim_vals: List = []        # (device scalar, n) per batch
        self._feat_real: List = []
        self._feat_fake: List = []
        self._logits_fake: List = []

    def update(self, fake_unit: jax.Array, real_unit: jax.Array,
               n_valid: Optional[int] = None):
        """fake/real in [0,1] float NHWC (vaegan_code.py:170-183 path).

        ``n_valid``: number of non-padded rows (the eval Loader pads the last
        batch to a static shape, data/celeba.py:166-170). Padded duplicates
        are sliced off so they cannot bias SSIM/FID/IS — the reference scores
        the true val set (vaegan_code.py:165-185). SSIM is weighted by image
        count, so uneven final batches average correctly.
        """
        n = fake_unit.shape[0] if n_valid is None else n_valid
        fake_unit = fake_unit[:n]
        real_unit = real_unit[:n]
        self._ssim_vals.append((ssim(fake_unit, real_unit), n))
        if self.feature_fn is not None:
            fake_u8 = jnp.clip(fake_unit * 255, 0, 255).astype(jnp.uint8)
            real_u8 = jnp.clip(real_unit * 255, 0, 255).astype(jnp.uint8)
            f_fake, l_fake = self.feature_fn(fake_u8)
            f_real, _ = self.feature_fn(real_u8)
            self._feat_fake.append(f_fake)
            self._feat_real.append(f_real)
            self._logits_fake.append(l_fake)

    def compute(self) -> Dict[str, float]:
        # the single host<->device sync for the whole accumulation window
        ssim_vals = jax.device_get([v for v, _ in self._ssim_vals])
        ssim_sum = sum(float(v) * n for v, (_, n)
                       in zip(ssim_vals, self._ssim_vals))
        ssim_n = sum(n for _, n in self._ssim_vals)
        out = {"ssim": ssim_sum / max(ssim_n, 1)}
        if self.feature_fn is not None and self._feat_fake:
            feat_fake = np.concatenate(jax.device_get(self._feat_fake))
            feat_real = np.concatenate(jax.device_get(self._feat_real))
            surrogate = self.weights_tag == "random-init"
            sfx = "_surrogate" if surrogate else ""
            out["fid" + sfx] = frechet_distance(feat_real, feat_fake)
            if not surrogate:
                # IS needs a trained classifier head; under random logits it
                # is identically ~1.0 (measured: 151 soak epochs all
                # 1.0000000) — logging it would read as mode collapse.
                logits = np.concatenate(jax.device_get(self._logits_fake))
                is_mean, is_std = inception_score_from_logits(logits)
                out["inception_score"] = is_mean
                out["inception_score_std"] = is_std
            if self.manifold_k is not None:
                pr = manifold_precision_recall(feat_real, feat_fake,
                                               k=self.manifold_k)
                out["precision" + sfx] = pr["precision"]
                out["recall" + sfx] = pr["recall"]
                out["f1" + sfx] = pr["f1"]
        return out
