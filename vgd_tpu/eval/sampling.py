"""Generation / sampling utilities.

Capability parity with the reference's four generation modes (SURVEY.md §3.5):
(a) prior sampling z~N(0,1) -> decoder (main_vae.py:348-374),
(b) aggregated-posterior sampling: encode the dataset, build per-dimension
    empirical CDFs, inverse-transform sample (main_vae.py:415-436) — the
    reference uses nested Python loops; here it is vectorised numpy,
(c) Glow reverse from a temperature-scaled z list (handled by
    GlowTrainer.reverse),
(d) DDPM ancestral chain (handled by DiffusionTrainer.ancestral_sample).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def vals_to_hist(arr: np.ndarray, n_bins: int = 100
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-dimension histogram CDFs (main_vae.py:415-425).

    arr: (N, D). Returns (bins (D, n_bins+1), cdf (D, n_bins))."""
    n, d = arr.shape
    out_cdf = np.zeros((d, n_bins))
    out_bins = np.zeros((d, n_bins + 1))
    for i in range(d):
        freqs, bins = np.histogram(arr[:, i], bins=n_bins)
        out_cdf[i] = np.cumsum(freqs / n)
        out_bins[i] = bins
    return out_bins, out_cdf


def sample_distribution(bins: np.ndarray, cdf: np.ndarray,
                        n_samples: int = 1,
                        rng: np.random.Generator = None) -> np.ndarray:
    """Inverse-transform sampling from per-dimension empirical CDFs
    (main_vae.py:427-436, vectorised: the reference loops over samples and
    dimensions in Python)."""
    rng = rng or np.random.default_rng()
    d, n_bins = cdf.shape
    u = rng.random((n_samples, d))
    # searchsorted per dimension
    idx = np.empty((n_samples, d), np.int64)
    for i in range(d):
        idx[:, i] = np.searchsorted(cdf[i], u[:, i])
    idx = np.clip(idx, 0, n_bins - 1)
    x0 = np.take_along_axis(bins[None, :, :-1], idx[:, :, None],
                            axis=2)[:, :, 0]
    x1 = np.take_along_axis(bins[None, :, 1:], idx[:, :, None],
                            axis=2)[:, :, 0]
    return (x0 + rng.random((n_samples, d)) * (x1 - x0)).astype(np.float32)


def encode_dataset(encode_fn: Callable, loaders, max_batches: int = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Encode every batch of the given loaders -> stacked (mu, logvar)
    (main_vae.py:452-467: train + val loaders)."""
    all_mu, all_logvar = [], []
    for loader in loaders:
        for i, (batch, n_valid) in enumerate(loader.epoch()):
            if max_batches is not None and i >= max_batches:
                break
            mu, logvar = encode_fn(jnp.asarray(batch))
            all_mu.append(np.asarray(mu)[:n_valid])
            all_logvar.append(np.asarray(logvar)[:n_valid])
    return np.concatenate(all_mu), np.concatenate(all_logvar)


def aggregated_posterior_sampler(encode_fn: Callable, loaders,
                                 n_bins: int = 100, seed: int = 42):
    """Build the (b) sampler: returns sample(n) -> (mu, logvar) arrays drawn
    from the aggregated posterior CDFs (main_vae.py:438-512 protocol)."""
    mu, logvar = encode_dataset(encode_fn, loaders)
    mu_bins, mu_cdf = vals_to_hist(mu, n_bins)
    lv_bins, lv_cdf = vals_to_hist(logvar, n_bins)
    rng = np.random.default_rng(seed)

    def sample(n: int):
        return (sample_distribution(mu_bins, mu_cdf, n, rng),
                sample_distribution(lv_bins, lv_cdf, n, rng))

    return sample
