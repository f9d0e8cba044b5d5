"""Micro-bench: ONE coupling-NN op, fused Pallas vs stock XLA chain.

Isolates the per-op cost at each block geometry of the Glow reference config
(K=32 L=4 64x64) so the full-step result (benchmarks/glow_fused_bench.py)
can be decomposed into kernel-body time vs scan/launch overhead.

Run:  python benchmarks/glow_coupling_micro.py [--batch 16] [--iters 50]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--filter-size", type=int, default=512)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vgd_tpu.models.glow import Glow
    from vgd_tpu.ops.glow_coupling import glow_coupling_nn

    print("backend:", jax.default_backend())
    f = a.filter_size
    glow = Glow(filter_size=f, compute_dtype=jnp.bfloat16)
    key = jax.random.key(0)

    def params(cin_half):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "conv1": {"w": jax.random.normal(k1, (3, 3, cin_half, f)) * 0.05,
                      "b": jnp.zeros((f,))},
            "conv2": {"w": jax.random.normal(k2, (1, 1, f, f)) * 0.05,
                      "b": jnp.zeros((f,))},
            "zero": {"w": jax.random.normal(k3, (3, 3, f, cin_half)) * 0.01,
                     "b": jnp.zeros((cin_half,)),
                     "scale": jnp.full((cin_half,), 0.05)},
        }

    def timeit(fn, *args):
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _i in range(a.iters):
            out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / a.iters

    results = []
    # block geometries of the 64px L=4 reference config
    for ch, size in [(12, 32), (24, 16), (48, 8), (96, 4)]:
        p = params(ch // 2)
        ya = jax.random.normal(jax.random.fold_in(key, ch),
                               (a.batch, size, size, ch // 2))

        stock_f = jax.jit(lambda p, ya: glow._coupling_nn(p, ya))
        fused_f = jax.jit(functools.partial(glow_coupling_nn, khw=(3, 3),
                                            pad=(1, 1)))

        def loss_stock(p, ya):
            return jnp.sum(jnp.square(glow._coupling_nn(p, ya)))

        def loss_fused(p, ya):
            return jnp.sum(jnp.square(
                glow_coupling_nn(p, ya, (3, 3), (1, 1))))

        stock_g = jax.jit(jax.grad(loss_stock, argnums=(0, 1)))
        fused_g = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))

        row = {"block": f"{ch}x{size}",
               "fwd_stock_us": round(timeit(stock_f, p, ya) * 1e6, 1),
               "fwd_fused_us": round(timeit(fused_f, p, ya) * 1e6, 1),
               "grad_stock_us": round(timeit(stock_g, p, ya) * 1e6, 1),
               "grad_fused_us": round(timeit(fused_g, p, ya) * 1e6, 1)}
        row["fwd_speedup"] = round(row["fwd_stock_us"]
                                   / row["fwd_fused_us"], 2)
        row["grad_speedup"] = round(row["grad_stock_us"]
                                    / row["grad_fused_us"], 2)
        print(row)
        results.append(row)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
