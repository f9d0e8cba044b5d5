"""Per-family train-step throughput at the reference's own 64x64 scales,
on-chip, fetch-timed, under repo defaults (bf16 compute, rbg keys).

Covers the families BASELINE.md's measured table lacked: DCGAN (batch 128,
gan_code.py:166), WGAN (batch 64 + 5 critic iters, gan_code.py:266-288),
denoising VAE (batch 64, main_vae.py), EEG Glow (batch 16 trials,
flow_eeg.py:445-465). VAE-GAN / image-Glow / DDPM numbers live in bench.py
and benchmarks/scale_bench.py.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _cache():
    d = os.path.expanduser("~/.cache/vgd_tpu_xla")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def fetch(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[0]


def timed(step, state, *args, iters=30):
    state, m = step(state, *args)
    fetch(m)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, *args)
        fetch(m)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def bench_gan(wgan: bool):
    from vgd_tpu.core.config import DataConfig, GANConfig
    from vgd_tpu.train.gan import GANTrainer
    b = 64 if wgan else 128   # gan_code.py:288 / :166
    cfg = GANConfig(data=DataConfig(image_size=(64, 64), batch_size=b))
    tr = GANTrainer(cfg, (64, 64, 3))
    key = jax.random.key(0, impl=cfg.run.prng_impl)
    state = tr.init(key, b)
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (b, 64, 64, 3), np.uint8))
    step = tr.train_step_wgan if wgan else tr.train_step
    ms = timed(lambda s, x, k: step(s, x, k), state, batch, key)
    name = "wgan (5 critic iters)" if wgan else "dcgan"
    print(f"{name} 64x64 b{b}: {ms:.3f} ms ({b / ms * 1e3:.0f} img/s)",
          flush=True)


def bench_vae():
    from vgd_tpu.core.config import DataConfig, VAEConfig
    from vgd_tpu.train.vae import VAETrainer
    cfg = VAEConfig(data=DataConfig(image_size=(64, 64), batch_size=64))
    tr = VAETrainer(cfg, (64, 64, 3))
    key = jax.random.key(1, impl=cfg.run.prng_impl)
    state = tr.init(key, 64)
    batch = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (64, 64, 64, 3), np.uint8))
    ms = timed(lambda s, x, k: tr.train_step(s, x, k, jnp.float32(0.5)),
               state, batch, key)
    print(f"denoising vae 64x64 b64: {ms:.3f} ms ({64 / ms * 1e3:.0f} img/s)",
          flush=True)


def bench_glow_eeg():
    from vgd_tpu.core.config import GlowEEGConfig
    from vgd_tpu.data.eeg import EEGDataset
    from vgd_tpu.train.glow import GlowEEGTrainer
    cfg = GlowEEGConfig()
    tr = GlowEEGTrainer(cfg)
    key = jax.random.key(2, impl=cfg.run.prng_impl)
    state = tr.init(key)
    ds = EEGDataset(synthetic_n=64)
    batch = jnp.asarray(ds.as_nhwc()[:16])
    state = tr.init_step(state, batch, key)
    ms = timed(lambda s, x, k: tr.train_step(s, x, k), state, batch, key)
    print(f"eeg glow b16 (22ch x 160): {ms:.3f} ms "
          f"({16 / ms * 1e3:.0f} trials/s)", flush=True)


if __name__ == "__main__":
    _cache()
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    bench_gan(wgan=False)
    bench_gan(wgan=True)
    bench_vae()
    bench_glow_eeg()
