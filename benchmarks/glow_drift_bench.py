"""Long-run Glow bits/dim drift: bf16 couplings vs f32, 30k iters each.

Validates STATUS.md item 2: whether `--compute-dtype bfloat16` (1.9x step
time) tracks the f32 bits/dim curve over the reference's full training
length (nf_code.py:713 n_iter=30000). Synthetic CelebA-like 64x64 data,
batch 16, K=32 L=4 — the reference's exact Glow scale.
"""
import json
import time
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.core.config import DataConfig, GlowConfig, RunConfig
from vgd_tpu.core.rng import seed_all
from vgd_tpu.data.celeba import make_image_datasets
from vgd_tpu.train.glow import GlowTrainer

print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

N_ITER = 30000
LOG_EVERY = 1000


def run(dtype):
    cfg = GlowConfig(data=DataConfig(path=None, image_size=(64, 64),
                                     batch_size=16, dataset_size=2048),
                     run=RunConfig(compute_dtype=dtype,
                                   out_dir="/tmp/glow_drift"))
    key = seed_all(42)
    train, _, img_shape = make_image_datasets(cfg.data, seed=42)
    tr = GlowTrainer(cfg, img_shape)
    state = tr.init(key)
    it = iter(train)
    state = tr.init_step(state, jnp.asarray(next(it)), key)
    curve = []
    t0 = time.perf_counter()
    for i in range(N_ITER):
        state, m = tr.train_step(state, jnp.asarray(next(it)),
                                 jax.random.fold_in(key, i))
        if (i + 1) % 200 == 0:
            float(m["loss"])   # bound the dispatch queue on the tunnel
        if (i + 1) % LOG_EVERY == 0:
            bpd = float(m["loss"])
            curve.append(bpd)
            print(f"{dtype} iter {i+1}: bits/dim {bpd:.4f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
            if not np.isfinite(bpd):
                print(f"{dtype}: NON-FINITE at iter {i+1}", flush=True)
                break
    return curve


c_bf16 = run("bfloat16")
c_f32 = run("float32")
out = {"bf16": c_bf16, "f32": c_f32,
       "final_gap": abs(c_bf16[-1] - c_f32[-1]) if c_bf16 and c_f32 else None}
with open("/tmp/glow_drift.json", "w") as f:
    json.dump(out, f)
print("RESULT", json.dumps(out))
