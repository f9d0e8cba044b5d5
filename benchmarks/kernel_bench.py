"""Microbenchmarks: Pallas kernels vs XLA (run on the TPU chip).

Measured 2026-08-16 on TPU v5 lite (f32):
  gn+silu (16,32,32,256): xla 0.771 ms, pallas 1.013 ms   (XLA wins)
  gn+silu (16,16,16,256): xla 0.730 ms, pallas 0.583 ms   (pallas 1.25x)
  gn+silu  (8,64,64,128): xla 1.634 ms, pallas 0.625 ms   (pallas 2.6x)
  attn  B16 N1024 D256:   xla 0.811 ms, pallas 0.643 ms   (pallas 1.26x)
  cross B16 N16384 M64:   xla 3.392 ms, pallas 3.176 ms   (pallas 1.07x)
Gating: groupnorm_silu auto-falls back to XLA above 2 MiB/image; attention
falls back on ragged shapes. Fused paths serve inference (no VJP needed).

Training-path attention (ops.attention: flash fwd + custom-VJP bwd,
gridded scratch accumulators), fwd+bwd fetch-timed, best-of-3x30 reps,
f32, 2026-08-16:
  B16 N1024 D256 (DDPM 256px bottleneck): xla 1.79 ms, pallas 1.74 ms (1.03x)
  B4  N4096 D64:   xla 6.67 ms, pallas(512) 5.87 ms  (1.14x)
  B4  N4096 D256:  xla 7.04 ms, pallas(512) 5.37 ms  (1.31x)
  B1  N16384 D64:  xla 18.0 ms, pallas(512) 12.2 ms  (1.48x)
Honest verdict: parity at the reference's own bottleneck shape (the
(HW)^2 matrix is no longer materialised, saving HBM); real wins appear
from ~4k tokens. ops.attention engages pallas at n*m >= MIN_FLASH_ELEMS.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from vgd_tpu.ops.pallas_kernels import (attention_xla, flash_attention,
                                        groupnorm_silu, groupnorm_silu_xla)


def bench(f, *args, iters=100):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.key(0)
    print("backend:", jax.default_backend())
    for shape in [(16, 32, 32, 256), (16, 16, 16, 256), (8, 64, 64, 128)]:
        x = jax.random.normal(key, shape)
        sc = jnp.ones((shape[-1],))
        bi = jnp.zeros((shape[-1],))
        gx = jax.jit(lambda x: groupnorm_silu_xla(x, sc, bi))
        gp = jax.jit(lambda x: groupnorm_silu(x, sc, bi, force="pallas"))
        print(f"gn+silu {shape}: xla {bench(gx, x):.3f} ms, "
              f"pallas {bench(gp, x):.3f} ms")
    for (b, n, m, d) in [(16, 1024, 1024, 256), (16, 16384, 64, 256)]:
        q = jax.random.normal(key, (b, n, d))
        k = jax.random.normal(key, (b, m, d))
        v = jax.random.normal(key, (b, m, d))
        fx = jax.jit(lambda q, k, v: attention_xla(q, k, v))
        fp = jax.jit(lambda q, k, v: flash_attention(
            q, k, v, force="pallas", block_q=min(512, n),
            block_kv=min(256, m)))
        print(f"attn B{b} N{n} M{m} D{d}: xla {bench(fx, q, k, v, iters=20):.3f} ms, "
              f"pallas {bench(fp, q, k, v, iters=20):.3f} ms")


if __name__ == "__main__":
    main()
