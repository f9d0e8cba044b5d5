"""A/B: device-resident val-epoch metrics vs per-batch host fetches.

The reference's eval loops fetch scalars per batch (``.item()`` per metric
per torchmetrics update, vaegan_code.py:165-185); round 3 of this repo did
the same with ``float(jnp.mean(...))`` per batch per metric (4 fetches per
val batch on the flagship). Round 4 accumulates every per-batch value on
device and fetches ONCE per val epoch (train/loop.py run_vaegan val loop,
eval/metrics.py MetricAccumulator). This benchmark isolates exactly that
difference on the same eval_step outputs and reports both wall-clocks.

Usage: python benchmarks/val_sync_bench.py [--images 2048] [--batch 64]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    a = ap.parse_args()

    from vgd_tpu.core.config import DataConfig, VAEGANConfig
    from vgd_tpu.core.rng import seed_all
    from vgd_tpu.data.celeba import synthetic_faces
    from vgd_tpu.eval.metrics import psnr, ssim
    from vgd_tpu.ops.image import signed_to_unit, to_signed
    from vgd_tpu.train.vaegan import VAEGANTrainer

    cfg = VAEGANConfig(data=DataConfig(
        image_size=(a.image_size, a.image_size), batch_size=a.batch))
    key = seed_all(42)
    trainer = VAEGANTrainer(cfg, (a.image_size, a.image_size, 3))
    state = trainer.init(key, a.batch)
    data = synthetic_faces(a.images, (a.image_size, a.image_size), seed=3)
    batches = [jnp.asarray(data[i:i + a.batch])
               for i in range(0, a.images, a.batch)]

    def run_per_batch_fetch():
        """Round-3 shape: float() per metric per batch (4 syncs/batch)."""
        val_loss = psnr_sum = ssim_sum = 0.0
        n = 0
        for j, vb in enumerate(batches):
            ev = trainer.eval_step(state, vb, jax.random.fold_in(key, j))
            img = to_signed(vb)
            val_loss += (float(jnp.mean(ev["per_mse"]))
                         + cfg.alpha_kl * float(jnp.sum(ev["per_kl"])))
            ru, iu = signed_to_unit(ev["recon"]), signed_to_unit(img)
            ssim_sum += float(ssim(ru, iu)) * len(vb)
            psnr_sum += float(psnr(ru, iu)) * len(vb)
            n += len(vb)
        return val_loss, ssim_sum / n, psnr_sum / n

    def run_device_resident():
        """Round-4 shape: accumulate device values, ONE fetch per epoch."""
        rows = []
        for j, vb in enumerate(batches):
            ev = trainer.eval_step(state, vb, jax.random.fold_in(key, j))
            img = to_signed(vb)
            ru, iu = signed_to_unit(ev["recon"]), signed_to_unit(img)
            rows.append((len(vb), jnp.mean(ev["per_mse"]),
                         jnp.sum(ev["per_kl"]), ssim(ru, iu), psnr(ru, iu)))
        fetched = jax.device_get([r[1:] for r in rows])
        n = sum(r[0] for r in rows)
        val_loss = sum(m + cfg.alpha_kl * k_ for m, k_, *_ in fetched)
        ssim_m = sum(v[2] * r[0] for r, v in zip(rows, fetched)) / n
        psnr_m = sum(v[3] * r[0] for r, v in zip(rows, fetched)) / n
        return float(val_loss), float(ssim_m), float(psnr_m)

    # warm both paths (compiles)
    ref = run_per_batch_fetch()
    new = run_device_resident()
    assert np.allclose(ref, new, rtol=1e-4), (ref, new)

    t_ref = min(_timed(run_per_batch_fetch) for _ in range(a.repeats))
    t_new = min(_timed(run_device_resident) for _ in range(a.repeats))
    dev = jax.devices()[0]
    print(f"device={dev.device_kind} images={a.images} batch={a.batch} "
          f"({len(batches)} val batches)")
    print(f"per-batch-fetch val epoch: {t_ref * 1e3:.1f} ms")
    print(f"device-resident val epoch: {t_new * 1e3:.1f} ms "
          f"({t_ref / t_new:.2f}x)")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
