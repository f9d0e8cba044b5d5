"""DDPM ancestral-sampling throughput (VERDICT r2 #9).

The compiled full reverse chain (train/diffusion.py:ancestral_sample — one
``lax.fori_loop`` program) replaces the reference's hottest inference loop
(test_diffusion.py:90-96: up to 1000 sequential Python-driven UNet forwards).
Measures fetch-timed samples/s at the reference scale (T=1000, 256px) for
the stock UNet vs the Pallas-fused inference UNet (flash attention +
fused GroupNorm/SiLU).

Run:  python benchmarks/ddpm_sampling_bench.py [--image-size 256]
      [--batch 8] [--timesteps 1000] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ddim", type=int, default=50,
                    help="also time the strided DDIM chain at this many "
                    "steps (0 = skip)")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--device", default=None, choices=["cpu", "tpu"],
                    help="force the jax platform (cpu = harness drill)")
    a = ap.parse_args()

    import jax

    if a.device:
        jax.config.update("jax_platforms", a.device)
    import jax.numpy as jnp

    from vgd_tpu.core.config import DataConfig, DiffusionConfig, RunConfig
    from vgd_tpu.core.rng import seed_all
    from vgd_tpu.train.diffusion import DiffusionTrainer

    print("backend:", jax.default_backend())
    key = seed_all(42, impl="rbg")
    s = a.image_size
    cfg = DiffusionConfig(
        data=DataConfig(image_size=(s, s), batch_size=a.batch),
        run=RunConfig(compute_dtype=a.compute_dtype),
        timesteps=a.timesteps)

    result = {"image_size": s, "batch": a.batch, "timesteps": a.timesteps}
    for tag in ("stock", "fused"):
        tr = DiffusionTrainer(cfg, (s, s, 3))
        if tag == "stock":
            tr.model_fused = tr.model   # the sampler runs the stock UNet
        state = tr.init(key, a.batch)
        shape = (a.batch, s, s, 3)
        # warm-up/compile
        out = tr.generate(state, shape, jax.random.fold_in(key, 0))
        _ = float(out[0, 0, 0, 0])      # host fetch (axon timing rule)
        t0 = time.perf_counter()
        for i in range(a.reps):
            out = tr.generate(state, shape, jax.random.fold_in(key, 1 + i))
        _ = float(out[0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / a.reps
        result[tag + "_chain_s"] = round(dt, 3)
        result[tag + "_samples_per_s"] = round(a.batch / dt, 3)
        result[tag + "_unet_fwd_per_s"] = round(a.batch * a.timesteps / dt)
        print(f"{tag}: {dt:.2f} s/chain  {a.batch / dt:.3f} samples/s  "
              f"({a.batch * a.timesteps / dt:.0f} UNet fwd/s)")
    result["speedup"] = round(result["stock_chain_s"]
                              / result["fused_chain_s"], 3)
    if a.ddim:
        # strided DDIM chain (fused UNet) — the fast-inference path the
        # reference lacks; quality/speed knob is the step count
        tr = DiffusionTrainer(cfg, (s, s, 3))
        state = tr.init(key, a.batch)
        shape = (a.batch, s, s, 3)
        out = tr.generate_ddim(state, shape, jax.random.fold_in(key, 0),
                               a.ddim)
        _ = float(out[0, 0, 0, 0])
        t0 = time.perf_counter()
        for i in range(a.reps):
            out = tr.generate_ddim(state, shape,
                                   jax.random.fold_in(key, 1 + i), a.ddim)
        _ = float(out[0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / a.reps
        result["ddim_steps"] = a.ddim
        result["ddim_chain_s"] = round(dt, 3)
        result["ddim_samples_per_s"] = round(a.batch / dt, 3)
        result["ddim_speedup_vs_full"] = round(
            result["fused_chain_s"] / dt, 2)
        print(f"ddim{a.ddim}: {dt:.2f} s/chain  {a.batch / dt:.3f} "
              f"samples/s  ({result['ddim_speedup_vs_full']}x vs full "
              "chain)")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
