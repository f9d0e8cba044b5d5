"""Benchmark: flagship VAE-GAN training throughput (images/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Config matches BASELINE.json config 1: CelebA 64x64, batch 64, the full
reference training step (encode/reparam/decode, 2 discriminator Adam steps
with label smoothing + instance noise, G/E step with pixel MSE + KL warmup +
adversarial BCE — vaegan_code.py:55-135 semantics), run via the
device-resident epoch scan (ONE compiled program per 28-step epoch) with
bf16 conv compute.

Timing methodology: each measured region ends with a host fetch of a
parameter value. On the axon TPU tunnel, ``block_until_ready`` returns at
dispatch-accept, not completion — dispatch-queue timings overstate
throughput ~4x (measured); fetch-timing is honest and also covers the
per-call RPC overhead a real trainer pays.

Baseline: the reference's own torch implementation measured on this host's
CPU via benchmarks/reference_baseline_torch.py (the reference publishes no
numbers; SURVEY.md §6). Measured 2026-08-16: 18.93 train images/sec
(torch 2.13.0+cpu, batch 64, 64x64).
"""
from __future__ import annotations

import json
import time

BASELINE_TRAIN_IPS = 18.93  # reference torch CPU, measured (see docstring)


def _backend_watchdog(seconds=300):
    """Fail loud instead of hanging forever when the TPU tunnel is dead.

    If the axon relay process is down, jax backend init blocks
    indefinitely (observed 2026-08-18: no listener on the relay port, every
    init hangs past 15 min). A hung bench gives the driver a silent stall;
    this prints a diagnostic JSON line and exits non-zero once init has
    clearly failed. Disarmed as soon as the backend answers.
    """
    import os
    import threading

    seconds = float(os.environ.get("VGD_BENCH_INIT_TIMEOUT", seconds))

    def _fire():
        print(json.dumps({
            "metric": "train_images_per_sec_per_chip",
            "value": None, "unit": "images/sec/chip", "vs_baseline": None,
            "error": f"backend init exceeded {seconds}s — TPU tunnel "
                     "relay down? (ss -tln | grep 8093)"}), flush=True)
        os._exit(1)

    t = threading.Timer(seconds, _fire)
    t.daemon = True
    t.start()
    return t


def main():
    watchdog = _backend_watchdog()
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.devices()          # force backend init under the watchdog
    watchdog.cancel()

    from vgd_tpu.core.config import DataConfig, VAEGANConfig
    from vgd_tpu.data.celeba import synthetic_faces
    from vgd_tpu.train.vaegan import VAEGANTrainer

    batch_size, img, steps = 64, 64, 28
    cfg = VAEGANConfig(data=DataConfig(image_size=(img, img),
                                       batch_size=batch_size))
    trainer = VAEGANTrainer(cfg, (img, img, 3))
    # rbg PRNG keys: the RunConfig.prng_impl default (7.9% faster than
    # threefry on this step, BASELINE.md; deterministic per seed either way)
    key = jax.random.key(42, impl=cfg.run.prng_impl)
    state = trainer.init(key, batch_size)

    data = synthetic_faces(steps * batch_size, (img, img), seed=0)
    stacked = jnp.asarray(np.stack(
        [data[i * batch_size:(i + 1) * batch_size] for i in range(steps)]))

    def fetch(s):
        # host fetch forces true completion (tunnel-safe timing)
        return float(jnp.sum(s.encoder.params["fc_mu"]["bias"]))

    # warmup / compile
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
    ips = steps * batch_size / dt

    print(json.dumps({
        "metric": "VAE-GAN train throughput (CelebA 64x64, batch 64, full "
                  "3-optimizer step, device-resident epoch scan, "
                  "fetch-timed)",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_TRAIN_IPS, 2),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "step_ms": round(1000 * dt / steps, 2),
    }))


if __name__ == "__main__":
    main()
