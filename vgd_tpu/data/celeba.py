"""CelebA / CelebA-HQ input pipeline.

Capability parity with dataset_code.py:
* folder-of-JPEGs loading with resize + center-crop (CelebADatasetV0,
  dataset_code.py:13-65) and the HQ 256x256 variant (dataset_code.py:137-165),
* 90/10 train/val split (dataset_code.py:167-178),
* noise/occlusion corruption — moved on-device (see vgd_tpu.data.corrupt).

TPU-native design: instead of the reference's multiprocessing Pool that
preloads decoded float tensors into RAM (dataset_code.py:152-155), images are
decoded ONCE into a uint8 memmap cache (4x smaller than float32, persists
across runs) and batches stream from the memmap. Normalisation to [-1,1] or
[0,1] happens on device, fused into the training step. A synthetic procedural
dataset stands in when no JPEG folder is available (tests, benchmarks).
"""
from __future__ import annotations

import glob as _glob
import hashlib
import os
from typing import Iterator, Optional, Tuple

import numpy as np

from vgd_tpu.core.config import DataConfig


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------

class ArrayDataset:
    """A uint8 (N, H, W, C) array-backed dataset."""

    def __init__(self, array: np.ndarray):
        assert array.dtype == np.uint8 and array.ndim == 4, array.shape
        self.array = array

    def __len__(self) -> int:
        return self.array.shape[0]

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        return tuple(self.array.shape[1:])

    def __getitem__(self, idx):
        return self.array[idx]


def _decode_one(p: str, h: int, w: int) -> np.ndarray:
    """Decode one JPEG: resize so the short side matches, then center-crop
    (torchvision Resize(int)+CenterCrop semantics, dataset_code.py:26-30;
    for already-square HQ images this is a plain resize)."""
    from PIL import Image

    img = Image.open(p).convert("RGB")
    iw, ih = img.size
    scale = max(h / ih, w / iw)
    nw, nh = max(int(round(iw * scale)), w), max(int(round(ih * scale)), h)
    img = img.resize((nw, nh), Image.BILINEAR)
    left, top = (nw - w) // 2, (nh - h) // 2
    img = img.crop((left, top, left + w, top + h))
    return np.asarray(img, dtype=np.uint8)


def _decode_folder(path: str, image_size: Tuple[int, int],
                   dataset_size: Optional[int],
                   workers: Optional[int] = None,
                   progress: bool = True) -> np.ndarray:
    """Decode a folder of JPEGs to a uint8 memmap cache.

    The decode fans out over a thread pool (PIL releases the GIL inside the
    JPEG decompressor and the resampler, so threads scale without the
    per-image pickling the reference's multiprocessing Pool pays,
    dataset_code.py:152-155) and the memmap is flushed in chunks so a 200k
    build never holds more than one chunk of decoded images in page cache
    dirty state."""
    import concurrent.futures as _fut
    import time as _time

    paths = sorted(_glob.glob(os.path.join(path, "*.jpg")))
    if not paths:
        raise FileNotFoundError(f"no *.jpg under {path}")
    if dataset_size is not None:
        paths = paths[:dataset_size]
    h, w = image_size
    tag = hashlib.md5(f"{path}|{h}x{w}|{len(paths)}".encode()).hexdigest()[:12]
    cache_dir = path if os.access(path, os.W_OK) else os.path.join(
        os.path.expanduser("~/.cache/vgd_tpu_data"))
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, f".vgd_cache_{h}x{w}_{tag}.npy")
    if os.path.exists(cache):
        return np.load(cache, mmap_mode="r")
    out = np.lib.format.open_memmap(cache + ".tmp", mode="w+",
                                    dtype=np.uint8, shape=(len(paths), h, w, 3))
    workers = workers or min(32, (os.cpu_count() or 1) * 4)
    chunk = 2048
    t0 = _time.perf_counter()
    with _fut.ThreadPoolExecutor(max_workers=workers) as ex:
        for c0 in range(0, len(paths), chunk):
            c1 = min(c0 + chunk, len(paths))
            for i, arr in zip(range(c0, c1),
                              ex.map(_decode_one, paths[c0:c1],
                                     [h] * (c1 - c0), [w] * (c1 - c0))):
                out[i] = arr
            out.flush()
            if progress and len(paths) > chunk:
                rate = c1 / max(_time.perf_counter() - t0, 1e-9)
                print(f"[data] decode cache {c1}/{len(paths)} "
                      f"({rate:.0f} img/s, {workers} threads)")
    del out
    os.replace(cache + ".tmp", cache)
    return np.load(cache, mmap_mode="r")


def synthetic_faces(n: int, image_size: Tuple[int, int], channels: int = 3,
                    seed: int = 0) -> np.ndarray:
    """Deterministic procedural images (smooth colour blobs + an oval) for
    tests and data-free benchmarking. uint8 (N, H, W, C)."""
    h, w = image_size
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    ys, xs = ys / h - 0.5, xs / w - 0.5
    out = np.empty((n, h, w, channels), dtype=np.uint8)
    for i in range(n):
        cy, cx = rng.uniform(-0.15, 0.15, 2)
        ry, rx = rng.uniform(0.2, 0.35, 2)
        oval = np.exp(-(((ys - cy) / ry) ** 2 + ((xs - cx) / rx) ** 2) * 2.5)
        img = np.empty((h, w, channels), np.float32)
        for c in range(channels):
            fy, fx = rng.uniform(1.0, 4.0, 2)
            py, px = rng.uniform(0, 2 * np.pi, 2)
            base = 0.5 + 0.25 * np.sin(2 * np.pi * fy * ys + py) * \
                np.cos(2 * np.pi * fx * xs + px)
            tone = rng.uniform(0.3, 0.9)
            img[..., c] = base * (1 - oval) + tone * oval
        out[i] = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Split + loader
# ---------------------------------------------------------------------------

def split_dataset(ds: ArrayDataset, train_fraction: float, seed: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Random 90/10-style index split (dataset_code.py:172-175)."""
    n = len(ds)
    n_train = int(round(train_fraction * n))
    perm = np.random.default_rng(seed).permutation(n)
    return perm[:n_train], perm[n_train:]


class Loader:
    """Minibatch iterator over an ArrayDataset subset.

    Yields uint8 host arrays (B, H, W, C). Shapes are static: the train loader
    drops the last partial batch (required for a single compiled step); the
    eval loader pads the final batch and reports the valid count.
    """

    def __init__(self, ds: ArrayDataset, indices: np.ndarray, batch_size: int,
                 shuffle: bool, seed: int = 0, drop_last: bool = True):
        self.ds = ds
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    @property
    def num_examples(self) -> int:
        return len(self.indices)

    def epoch(self) -> Iterator[Tuple[np.ndarray, int]]:
        idx = self.indices
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            idx = rng.permutation(idx)
        self._epoch += 1
        b = self.batch_size
        n_full = len(idx) // b
        from vgd_tpu.data import native
        for i in range(n_full):
            sel = np.sort(idx[i * b:(i + 1) * b])  # sorted => faster memmap gather
            yield native.gather_batch(self.ds.array, sel), b
        rem = len(idx) - n_full * b
        if rem and not self.drop_last:
            sel = np.sort(idx[n_full * b:])
            batch = native.gather_batch(self.ds.array, sel)
            pad = np.repeat(batch[-1:], b - rem, axis=0)
            yield np.concatenate([batch, pad], 0), rem

    def __iter__(self):
        """Infinite stream of batches (iteration-driven trainers, e.g. Glow
        nf_code.py:577)."""
        return self.stream(0)

    def stream(self, start_batch: int = 0) -> Iterator[np.ndarray]:
        """Infinite full-size batch stream starting at global batch index
        ``start_batch`` — a resumed run sees exactly the batches an
        uninterrupted run would have seen from that point (the skipped
        prefix replays only the shuffle permutations, never the memmap
        gathers, so fast-forwarding 30k iterations is O(indices) cheap)."""
        from vgd_tpu.data import native
        b = self.batch_size
        per = max(len(self.indices) // b, 1)
        self._epoch = start_batch // per
        skip = start_batch % per
        while True:
            idx = self.indices
            if self.shuffle:
                rng = np.random.default_rng(self.seed + self._epoch)
                idx = rng.permutation(idx)
            self._epoch += 1
            for i in range(skip, len(idx) // b):
                sel = np.sort(idx[i * b:(i + 1) * b])
                yield native.gather_batch(self.ds.array, sel)
            skip = 0


def make_image_datasets(cfg: DataConfig, seed: int = 42):
    """Returns (train_loader, val_loader, image_shape HWC).

    Mirrors get_dataset_loaders (dataset_code.py:167-178) but array-backed.
    Falls back to a synthetic dataset when cfg.path is None/missing.
    """
    if cfg.path and os.path.isdir(cfg.path):
        arr = _decode_folder(cfg.path, cfg.image_size, cfg.dataset_size)
    else:
        n = cfg.dataset_size or 512
        arr = synthetic_faces(n, cfg.image_size, cfg.channels, seed=seed)
    ds = ArrayDataset(arr)
    tr_idx, va_idx = split_dataset(ds, cfg.train_fraction, seed)
    train = Loader(ds, tr_idx, cfg.batch_size, shuffle=True, seed=seed)
    val = Loader(ds, va_idx, cfg.batch_size, shuffle=False, seed=seed,
                 drop_last=False)
    return train, val, ds.image_shape
