"""Fused conv+BN+LeakyReLU vs XLA, on the TPU chip (fetch-timed).

Measures forward+backward (the training-path cost) of:
* each discriminator stage shape at the 64x64 batch-64 flagship config,
* the encoder's first stage (VALID geometry),
* the full Discriminator fwd+bwd, fused vs stock,
* the full VAE-GAN train step, fused_conv on vs off.

Timing rule for this host (BASELINE.md): end every measured region with a
HOST FETCH — block_until_ready returns at dispatch-accept on the axon
tunnel and overstates throughput ~4x.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[0]


def fetch_time(f, *args, iters=30, reps=3):
    o = f(*args)
    fetch(o)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*args)
        fetch(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def layer_bench():
    from vgd_tpu.ops.fused_conv import conv_bn_lrelu
    key = jax.random.key(0)
    shapes = [
        ("disc1 64x(32,32,16)->32", (64, 32, 32, 16), 32, 1, 0.2),
        ("disc2 64x(16,16,32)->64", (64, 16, 16, 32), 64, 1, 0.2),
        ("disc3 64x(8,8,64)->128", (64, 8, 8, 64), 128, 1, 0.2),
        ("enc0  64x(64,64,3)->32", (64, 64, 64, 3), 32, 0, 0.01),
        ("enc1  64x(31,31,32)->64 [odd:xla-gate]", (64, 31, 31, 32), 64, 0,
         0.01),
    ]
    for name, xshape, k, pad, slope in shapes:
        ks = jax.random.split(jax.random.fold_in(key, hash(name) % 2**31), 4)
        x = jax.random.normal(ks[0], xshape)
        w = jax.random.normal(ks[1], (4, 4, xshape[-1], k)) * 0.05
        g = jnp.ones((k,))
        b = jnp.zeros((k,))

        def make(mode):
            def loss(x, w, g, b):
                y, _, _ = conv_bn_lrelu(x, w, g, b, padding=pad,
                                        slope=slope, force=mode)
                return jnp.sum(jnp.square(y))
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

        tx = fetch_time(make("xla"), x, w, g, b)
        tp = fetch_time(make(None), x, w, g, b)
        print(f"{name}: xla {tx:.3f} ms, fused {tp:.3f} ms "
              f"({tx / tp:.2f}x)")


def disc_bench():
    from vgd_tpu.models.gan import Discriminator
    key = jax.random.key(1)
    x = jax.random.normal(key, (64, 64, 64, 3))
    for fused in (False, True):
        m = Discriminator(img_size=64, ndf=64, fused=fused)
        variables = m.init(jax.random.key(0), x, train=True)

        def loss(p):
            s, _ = m.apply({**variables, "params": p}, x, train=True,
                           mutable=["batch_stats"])
            return jnp.sum(jnp.square(s))

        f = jax.jit(jax.grad(loss))
        t = fetch_time(f, variables["params"])
        print(f"discriminator fwd+bwd fused={fused}: {t:.3f} ms")


def vaegan_bench():
    import dataclasses
    from vgd_tpu.core.config import DataConfig, RunConfig, VAEGANConfig
    from vgd_tpu.train.vaegan import VAEGANTrainer
    key = jax.random.key(2)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 64, 3), np.uint8))
    for fused in (False, True):
        cfg = VAEGANConfig(
            data=DataConfig(image_size=(64, 64), batch_size=64),
            run=RunConfig(compute_dtype="bfloat16", fused_conv=fused))
        tr = VAEGANTrainer(cfg, (64, 64, 3))
        state = tr.init(jax.random.key(0), 64)
        warm = jnp.float32(0.5)

        # warm (train_step donates state: always thread it)
        state, m = tr.train_step(state, batch, key, warm)
        fetch(m)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(50):
                state, m = tr.train_step(state, batch, key, warm)
            fetch(m)
            best = min(best, (time.perf_counter() - t0) / 50)
        t = best * 1e3
        print(f"vaegan train_step 64x64 b64 bf16 fused_conv={fused}: "
              f"{t:.3f} ms ({64 / t * 1e3:.0f} img/s)")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0])
    layer_bench()
    disc_bench()
    vaegan_bench()
