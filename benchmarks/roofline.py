"""Roofline accounting: XLA cost_analysis of the compiled train steps vs
measured step times (BASELINE.md) on TPU v5e.

For each workload's compiled train step this prints the XLA-estimated
FLOPs and HBM bytes, the arithmetic intensity, and — using the fetch-timed
step measurements — the achieved TFLOP/s and GB/s against the v5e peaks
(197 TFLOP/s bf16 MXU, ~819 GB/s HBM). This answers "how far from
speed-of-light" per workload and says which side of the roofline each one
sits on; the measured times include the per-call tunnel RPC, so the
achieved numbers are end-to-end (conservative) figures.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS_BF16 = 197.0   # TPU v5e (public spec)
PEAK_GBS = 819.0           # HBM bandwidth

# fetch-timed ms/step from BASELINE.md (this host, incl. tunnel RPC)
MEASURED_MS = {
    "vaegan 64x64 b64": 4.54,
    "vaegan 256x256 b64": 28.34,
    "ddpm 256x256 b16": 86.98,
    "glow 64x64 b16 (bf16)": 31.5,
}


def _cache():
    d = os.path.expanduser("~/.cache/vgd_tpu_xla")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def analyze(name, lowered):
    comp = lowered.compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    ms = MEASURED_MS[name]
    tflops = flops / (ms * 1e-3) / 1e12
    gbs = bytes_ / (ms * 1e-3) / 1e9
    ai = flops / max(bytes_, 1.0)
    ridge = PEAK_TFLOPS_BF16 * 1e12 / (PEAK_GBS * 1e9)   # ~240 flops/byte
    bound = "compute" if ai >= ridge else "bandwidth"
    print(f"{name}: {flops/1e9:.1f} GFLOP, {bytes_/1e9:.2f} GB, "
          f"AI {ai:.0f} fl/B ({bound}-bound) | measured {ms} ms -> "
          f"{tflops:.1f} TF/s ({100*tflops/PEAK_TFLOPS_BF16:.0f}% MXU peak), "
          f"{gbs:.0f} GB/s ({100*gbs/PEAK_GBS:.0f}% HBM peak)", flush=True)


def main():
    _cache()
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    from vgd_tpu.core.config import (DataConfig, DiffusionConfig,
                                     GlowConfig, VAEGANConfig)
    from vgd_tpu.train.diffusion import DiffusionTrainer
    from vgd_tpu.train.glow import GlowTrainer
    from vgd_tpu.train.vaegan import VAEGANTrainer

    for name, img, b in [("vaegan 64x64 b64", 64, 64),
                         ("vaegan 256x256 b64", 256, 64)]:
        cfg = VAEGANConfig(data=DataConfig(image_size=(img, img),
                                           batch_size=b))
        tr = VAEGANTrainer(cfg, (img, img, 3))
        key = jax.random.key(0, impl=cfg.run.prng_impl)
        state = tr.init(key, b)
        batch = jnp.zeros((b, img, img, 3), jnp.uint8)
        lowered = jax.jit(tr._train_step_impl,
                          donate_argnums=0).lower(state, batch, key,
                                                  jnp.float32(0.5))
        analyze(name, lowered)

    cfg = DiffusionConfig()
    tr = DiffusionTrainer(cfg, (256, 256, 3))
    key = jax.random.key(1, impl=cfg.run.prng_impl)
    state = tr.init(key, 16)
    batch = jnp.zeros((16, 256, 256, 3), jnp.uint8)
    lowered = jax.jit(lambda s, x, k: tr.train_step.__wrapped__(tr, s, x, k)
                      ).lower(state, batch, key)
    analyze("ddpm 256x256 b16", lowered)

    cfg = GlowConfig(data=DataConfig(image_size=(64, 64), batch_size=16))
    tr = GlowTrainer(cfg, (64, 64, 3))
    key = jax.random.key(2, impl=cfg.run.prng_impl)
    state = tr.init(key)
    batch = jnp.zeros((16, 64, 64, 3), jnp.uint8)
    lowered = jax.jit(lambda s, x, k: tr.train_step.__wrapped__(tr, s, x, k)
                      ).lower(state, batch, key)
    analyze("glow 64x64 b16 (bf16)", lowered)


if __name__ == "__main__":
    main()
