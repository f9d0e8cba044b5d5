"""Glow step-time batch scaling: is the 24%-of-roofline figure at the
reference's batch 16 (benchmarks/roofline.py) a framework limit or a
config limit? Measures the K=32 L=4 64x64 bf16 train step at growing
batch sizes, fetch-timed."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.core.config import DataConfig, GlowConfig
from vgd_tpu.train.glow import GlowTrainer


def _cache():
    d = os.path.expanduser("~/.cache/vgd_tpu_xla")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def fetch(m):
    return float(jax.tree_util.tree_leaves(m)[0])


if __name__ == "__main__":
    _cache()
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    for b, remat in ((16, False), (64, False), (64, True), (256, True)):
        cfg = GlowConfig(data=DataConfig(image_size=(64, 64), batch_size=b),
                         remat=remat)
        tr = GlowTrainer(cfg, (64, 64, 3))
        key = jax.random.key(0, impl=cfg.run.prng_impl)
        state = tr.init(key)
        batch = jnp.asarray(np.random.default_rng(0).integers(
            0, 255, (b, 64, 64, 3), np.uint8))
        state = tr.init_step(state, batch, key)
        state, m = tr.train_step(state, batch, key)
        fetch(m)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(15):
                state, m = tr.train_step(state, batch, key)
            fetch(m)
            best = min(best, (time.perf_counter() - t0) / 15)
        print(f"glow b{b} remat={remat}: {best*1e3:.2f} ms/step "
              f"({b/best:.0f} img/s)", flush=True)
