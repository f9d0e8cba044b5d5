"""Flagship epoch-scan throughput: threefry vs rbg PRNG keys."""
import time
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.core.config import DataConfig, VAEGANConfig
from vgd_tpu.data.celeba import synthetic_faces
from vgd_tpu.train.vaegan import VAEGANTrainer

print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

batch_size, img, steps = 64, 64, 28
cfg = VAEGANConfig(data=DataConfig(image_size=(img, img),
                                   batch_size=batch_size))
data = synthetic_faces(steps * batch_size, (img, img), seed=0)
stacked = jnp.asarray(np.stack(
    [data[i * batch_size:(i + 1) * batch_size] for i in range(steps)]))


def fetch(s):
    return float(jnp.sum(s.encoder.params["fc_mu"]["bias"]))


for impl in ("threefry2x32", "rbg"):
    trainer = VAEGANTrainer(cfg, (img, img, 3))
    key = jax.random.key(42, impl=impl)
    state = trainer.init(key, batch_size)
    state, _ = trainer.train_epoch(state, stacked, key, jnp.float32(0.5))
    fetch(state)
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        state, _ = trainer.train_epoch(state, stacked,
                                       jax.random.fold_in(key, rep),
                                       jnp.float32(0.5))
        fetch(state)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{impl}: {1000*dt/steps:.3f} ms/step "
          f"({steps*batch_size/dt:.0f} img/s)", flush=True)
