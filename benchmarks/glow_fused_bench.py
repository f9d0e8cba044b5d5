"""Fused Pallas Glow variants vs stock XLA chain at the reference config.

Measures the full train step (fwd+bwd+Adam, fetch-timed per the axon tunnel
rules) for K=32 L=4 64x64 batch 16 (nf_code.py:711-722) across modes:
stock scan / per-flow fused coupling (ops/glow_coupling.py) / whole-block
flow stack (ops/glow_flow_stack.py).

Run:  python benchmarks/glow_fused_bench.py [--batches 16 64] [--steps 30]
      [--modes stock stack]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[16])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--modes", nargs="*",
                    default=["stock", "coupling", "stack"],
                    help="stock | coupling | stack | stackN (N = squeezed "
                    "h*w threshold: kernel only on blocks with h*w <= N, "
                    "e.g. stack64 = the 8x8-and-smaller deep blocks) | "
                    "unrollN (lax.scan unroll=N on the flow chain)")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vgd_tpu.core.config import DataConfig, GlowConfig, RunConfig
    from vgd_tpu.core.rng import seed_all
    from vgd_tpu.train.glow import GlowTrainer

    print("backend:", jax.default_backend())
    key = seed_all(42, impl="rbg")
    s = a.image_size

    def fetch_time(tr, st, batch, n):
        for i in range(3):
            st, m = tr.train_step(st, jnp.asarray(batch),
                                  jax.random.fold_in(key, i))
        jax.block_until_ready(st)
        _ = float(jax.tree_util.tree_leaves(st.params)[0].ravel()[0])
        t0 = time.perf_counter()
        for i in range(n):
            st, m = tr.train_step(st, jnp.asarray(batch),
                                  jax.random.fold_in(key, 100 + i))
        _ = float(jax.tree_util.tree_leaves(st.params)[0].ravel()[0])
        return (time.perf_counter() - t0) / n, float(m["loss"])

    results = []
    for b in a.batches:
        batch = np.random.default_rng(0).integers(
            0, 255, (b, s, s, 3)).astype(np.uint8)
        row = {"batch": b}
        for tag in a.modes:
            if tag.startswith("stack") and tag != "stack":
                flow_stack = int(tag[len("stack"):])
            else:
                flow_stack = tag == "stack"
            unroll = int(tag[len("unroll"):]) if tag.startswith("unroll") \
                else 1
            cfg = GlowConfig(
                data=DataConfig(batch_size=b, image_size=(s, s),
                                normalize=False),
                run=RunConfig(compute_dtype=a.compute_dtype),
                fused_coupling=tag == "coupling",
                flow_stack=flow_stack,
                scan_unroll=unroll)
            tr = GlowTrainer(cfg, (s, s, 3))
            st = tr.init(key, b)
            st = tr.init_step(st, jnp.asarray(batch), key)
            dt, loss = fetch_time(tr, st, batch, a.steps)
            row[tag + "_ms"] = round(dt * 1000, 2)
            row[tag + "_ips"] = round(b / dt)
            row[tag + "_loss"] = round(loss, 4)
            print(f"b{b} {tag}: {dt * 1000:.2f} ms  {b / dt:.0f} img/s  "
                  f"(loss {loss:.4f})", flush=True)
        for tag in a.modes:
            if tag != "stock" and "stock_ms" in row:
                row[f"speedup_{tag}"] = round(
                    row["stock_ms"] / row[tag + "_ms"], 2)
                print(f"b{b} {tag} speedup: {row[f'speedup_{tag}']}x")
        results.append(row)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
