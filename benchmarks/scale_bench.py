"""Reference-full-scale train-step throughput, on-chip, fetch-timed.

Measures the two configs the reference actually trains at
(vaegan_code.py:22-26: VAE-GAN 256x256 batch 64; train_diffusion.py:70-73:
DDPM 256x256 batch 16 with attention), under the repo defaults (bf16
compute, rbg PRNG keys). Uses the persistent XLA compile cache so repeat
invocations skip the ~3-5 min 256px compiles.

Timing rule (BASELINE.md): every measured region ends with a host fetch.
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


def bench_vaegan_256():
    from vgd_tpu.core.config import DataConfig, VAEGANConfig
    from vgd_tpu.train.vaegan import VAEGANTrainer
    cfg = VAEGANConfig(data=DataConfig(image_size=(256, 256), batch_size=64))
    tr = VAEGANTrainer(cfg, (256, 256, 3))
    key = jax.random.key(42, impl=cfg.run.prng_impl)
    state = tr.init(key, 64)
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (64, 256, 256, 3), np.uint8))
    t0 = time.perf_counter()
    state, m = tr.train_step(state, batch, key, jnp.float32(0.5))
    fetch(m)
    print(f"vaegan256 compile+first: {time.perf_counter()-t0:.0f}s",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            state, m = tr.train_step(state, batch, key, jnp.float32(0.5))
        fetch(m)
        best = min(best, (time.perf_counter() - t0) / 20)
    print(f"vaegan 256x256 b64 train_step: {best*1e3:.2f} ms "
          f"({64/best:.0f} img/s)", flush=True)


def bench_ddpm_256():
    from vgd_tpu.core.config import DiffusionConfig
    from vgd_tpu.train.diffusion import DiffusionTrainer
    cfg = DiffusionConfig()
    tr = DiffusionTrainer(cfg, (256, 256, 3))
    key = jax.random.key(43, impl=cfg.run.prng_impl)
    state = tr.init(key, 16)
    batch = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (16, 256, 256, 3), np.uint8))
    t0 = time.perf_counter()
    state, m = tr.train_step(state, batch, key)
    fetch(m)
    print(f"ddpm256 compile+first: {time.perf_counter()-t0:.0f}s",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            state, m = tr.train_step(state, batch, key)
        fetch(m)
        best = min(best, (time.perf_counter() - t0) / 20)
    print(f"ddpm 256x256 b16 attn train_step: {best*1e3:.2f} ms "
          f"({16/best:.0f} img/s)", flush=True)


if __name__ == "__main__":
    _cache()
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    bench_vaegan_256()
    bench_ddpm_256()
