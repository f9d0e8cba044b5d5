"""Run artifacts: sample grids, triplet panels, loss curves, metric logs.

Capability parity with the reference's matplotlib outputs (SURVEY.md §2 #35):
8x8 fake-sample grids (vaegan_code.py:212-219), noisy/clean/recon triplet
panels (vaegan_code.py:197-207), loss-curve plots (gan_code.py:239-247) and
``.npz`` loss/metric arrays (vaegan_code.py:195). Uses the Agg backend so it
runs headless.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt               # noqa: E402
from matplotlib import gridspec               # noqa: E402


def primary_host() -> bool:
    """True on jax process 0 (and on single-host runs). Artifact files are
    written only by the primary host: on a multi-host pod every process runs
    the same loop code, and unguarded writes to a shared out_dir would race /
    duplicate. Orbax checkpoint saves are NOT gated — they must run on all
    processes."""
    import jax
    return jax.process_index() == 0


def _to_unit(img: np.ndarray) -> np.ndarray:
    """[-1,1] NHWC -> [0,1] (utils.py:16-24 equivalent)."""
    return np.clip(np.asarray(img) * 0.5 + 0.5, 0.0, 1.0)


def save_grid(images, path: str, nrow: int = 8, signed: bool = True):
    """Square grid of samples (vaegan_code.py:212-219)."""
    if not primary_host():
        return
    imgs = _to_unit(images) if signed else np.clip(np.asarray(images), 0, 1)
    n = min(len(imgs), nrow * nrow)
    fig = plt.figure(figsize=(nrow * 1.2, nrow * 1.2))
    gs = gridspec.GridSpec(nrow, nrow, figure=fig, wspace=0, hspace=0)
    for i in range(n):
        ax = fig.add_subplot(gs[i])
        ax.imshow(imgs[i].squeeze())
        ax.set_axis_off()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=90)
    plt.close(fig)


def save_triplets(noisy, clean, recon, path: str, n: int = 6):
    """noisy/clean/recon comparison rows (vaegan_code.py:197-207)."""
    if not primary_host():
        return
    rows = [_to_unit(x) for x in (noisy, clean, recon)]
    n = min(n, len(rows[0]))
    fig, axes = plt.subplots(3, n, figsize=(n * 1.6, 5))
    for j in range(n):
        for i in range(3):
            ax = axes[i][j] if n > 1 else axes[i]
            ax.imshow(rows[i][j].squeeze())
            ax.set_axis_off()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=90)
    plt.close(fig)


def save_loss_curves(curves: Dict[str, Sequence[float]], path: str):
    """Named loss curves over epochs (gan_code.py:239-247)."""
    if not primary_host():
        return
    fig = plt.figure(figsize=(10, 5))
    for name, values in curves.items():
        plt.plot(values, label=name)
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.grid(True)
    plt.legend()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=90)
    plt.close(fig)


class MetricLog:
    """Append-only metric history persisted as .npz + .jsonl
    (vaegan_code.py:195 ``np.savez`` equivalent, plus a greppable jsonl)."""

    def __init__(self, out_dir: str, name: str = "loss"):
        self.out_dir = out_dir
        self.name = name
        self.history: List[Dict[str, float]] = []
        os.makedirs(out_dir, exist_ok=True)

    def append(self, **metrics: float):
        row = {k: float(v) for k, v in metrics.items()}
        self.history.append(row)   # in-memory history on every host
        if not primary_host():
            return
        with open(os.path.join(self.out_dir, f"{self.name}.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    def save(self):
        if not self.history or not primary_host():
            return
        keys = sorted({k for row in self.history for k in row})
        arr = np.full((len(self.history), len(keys)), np.nan)
        for i, row in enumerate(self.history):
            for j, k in enumerate(keys):
                if k in row:
                    arr[i, j] = row[k]
        np.savez(os.path.join(self.out_dir, f"{self.name}.npz"),
                 values=arr, columns=np.array(keys))

    def curves(self) -> Dict[str, List[float]]:
        keys = sorted({k for row in self.history for k in row})
        return {k: [row.get(k, float("nan")) for row in self.history]
                for k in keys}
