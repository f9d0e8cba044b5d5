"""At-scale data-pipeline drill (VERDICT r2 #5).

Stages N synthetic JPEGs on disk (stand-ins for real CelebA files, which are
not available on this host), builds the parallel uint8 decode cache
(data/celeba.py:_decode_folder — the replacement for the reference's
multiprocessing Pool preload, dataset_code.py:152-155), then optionally runs
ONE training epoch of the chosen family off the cache. Prints one JSON line
with cache-build throughput and epoch img/s.

Run:  python benchmarks/data_drill.py --n 50000 [--epoch] [--family vaegan]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stage_jpegs(path: str, n: int, size: int) -> float:
    """Write n synthetic JPEGs (chunked so memory stays flat)."""
    from PIL import Image

    from vgd_tpu.data.celeba import synthetic_faces

    os.makedirs(path, exist_ok=True)
    have = len(glob.glob(os.path.join(path, "*.jpg")))
    if have >= n:
        print(f"[drill] {have} JPEGs already staged")
        return 0.0
    t0 = time.perf_counter()
    chunk = 2048
    for c0 in range(have, n, chunk):
        c1 = min(c0 + chunk, n)
        arr = synthetic_faces(c1 - c0, (size, size), seed=c0)
        for j in range(c1 - c0):
            Image.fromarray(arr[j]).save(
                os.path.join(path, f"{c0 + j:06d}.jpg"), quality=92)
        print(f"[drill] staged {c1}/{n}")
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--dir", default="/tmp/vgd_drill_jpegs")
    ap.add_argument("--family", default="vaegan",
                    choices=["vaegan", "gan", "vae"])
    ap.add_argument("--epoch", action="store_true",
                    help="also run one training epoch off the cache")
    ap.add_argument("--batch-size", type=int, default=64)
    a = ap.parse_args()

    stage_s = stage_jpegs(a.dir, a.n, a.image_size)

    # fresh cache build (drop any previous one)
    for f in glob.glob(os.path.join(a.dir, ".vgd_cache_*")):
        os.remove(f)
    from vgd_tpu.data.celeba import _decode_folder
    t0 = time.perf_counter()
    arr = _decode_folder(a.dir, (a.image_size, a.image_size), a.n)
    build_s = time.perf_counter() - t0
    assert arr.shape == (a.n, a.image_size, a.image_size, 3), arr.shape
    # reuse must hit the cache, not re-decode
    t0 = time.perf_counter()
    arr2 = _decode_folder(a.dir, (a.image_size, a.image_size), a.n)
    reuse_s = time.perf_counter() - t0
    assert arr2.shape == arr.shape

    result = {
        "n_images": a.n,
        "stage_seconds": round(stage_s, 1),
        "cache_build_seconds": round(build_s, 1),
        "cache_build_img_per_s": round(a.n / build_s),
        "cache_reuse_seconds": round(reuse_s, 3),
    }

    if a.epoch:
        import jax

        from vgd_tpu.core.config import (DataConfig, GANConfig, RunConfig,
                                         VAEConfig, VAEGANConfig)
        from vgd_tpu.train import loop as L
        print("backend:", jax.default_backend())
        data = DataConfig(path=a.dir, image_size=(a.image_size, a.image_size),
                          batch_size=a.batch_size, dataset_size=a.n)
        run = RunConfig(out_dir="/tmp/vgd_drill_run", eval_metrics=False)
        t0 = time.perf_counter()
        if a.family == "vaegan":
            cfg = VAEGANConfig(data=data, run=run, epochs=1)
            out = L.run_vaegan(cfg)
        elif a.family == "gan":
            cfg = GANConfig(data=data, run=run, epochs=1)
            out = L.run_gan(cfg)
        else:
            cfg = VAEConfig(data=data, run=run, epochs=1)
            out = L.run_vae(cfg)
        epoch_s = time.perf_counter() - t0
        result["epoch_seconds"] = round(epoch_s, 1)
        result["epoch_img_per_s"] = round(
            int(a.n * 0.9) // a.batch_size * a.batch_size / epoch_s)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
