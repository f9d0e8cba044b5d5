"""EEG Glow bf16 vs f32: full 6k-iter schedule (flow_eeg.py:461), bits/dim
drift + step time, synthetic ERD trials, batch 16."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.core.config import GlowEEGConfig
from vgd_tpu.core.rng import seed_all
from vgd_tpu.data.eeg import EEGDataset, eeg_batches
from vgd_tpu.train.glow import GlowEEGTrainer

print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

N_ITER = 6000


def run(dtype):
    import dataclasses
    cfg = GlowEEGConfig()
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, compute_dtype=dtype))
    key = seed_all(42)
    tr = GlowEEGTrainer(cfg)
    ds = EEGDataset(synthetic_n=288, seed=42)
    it = eeg_batches(ds, cfg.batch_size, seed=42)
    state = tr.init(key)
    state = tr.init_step(state, jnp.asarray(next(it)), key)
    curve, t0 = [], time.perf_counter()
    for i in range(N_ITER):
        state, m = tr.train_step(state, jnp.asarray(next(it)),
                                 jax.random.fold_in(key, i))
        if (i + 1) % 200 == 0:
            float(m["loss"])
        if (i + 1) % 1000 == 0:
            bpd = float(m["loss"])
            curve.append(bpd)
            print(f"{dtype} iter {i+1}: loss {bpd:.4f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    dt = time.perf_counter() - t0
    # finite reverse sample check (mid-training capability)
    z = tr.sample_z(jax.random.fold_in(key, 99), 8)
    fake = tr.reverse(state, z)
    fin = bool(np.all(np.isfinite(np.asarray(fake))))
    print(f"{dtype}: {1000*dt/N_ITER:.2f} ms/step avg, reverse finite={fin}",
          flush=True)
    return curve


c_bf16 = run("bfloat16")
c_f32 = run("float32")
print("RESULT bf16", [round(x, 4) for x in c_bf16])
print("RESULT f32 ", [round(x, 4) for x in c_f32])
print("final gap", round(abs(c_bf16[-1] - c_f32[-1]), 4))
