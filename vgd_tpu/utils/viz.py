"""Visualisation helpers.

Capability parity with utils.py:16-24 (show_tensor_image: [-1,1] -> [0,1],
axes off) and test_eegglow.py:12-22 (GIF assembly — imageio is not in this
image, so PIL writes the GIF).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def show_tensor_image(img, ax):
    """NHWC or HWC float image in [-1,1] onto a matplotlib axis
    (utils.py:16-24 equivalent; no CHW permute needed in NHWC-land)."""
    arr = np.asarray(img)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr * 0.5 + 0.5, 0.0, 1.0)
    ax.imshow(arr.squeeze())
    ax.get_xaxis().set_visible(False)
    ax.get_yaxis().set_visible(False)
    return ax


def save_gif(frame_paths: Sequence[str], out_path: str,
             duration_ms: int = 750):
    """Assemble PNG frames into a GIF (test_eegglow.py:12-22 capability,
    via PIL instead of imageio)."""
    from PIL import Image

    frames = [Image.open(p).convert("P") for p in frame_paths]
    if not frames:
        return
    frames[0].save(out_path, save_all=True, append_images=frames[1:],
                   duration=duration_ms, loop=0)


def plot_eeg_signals(trials, out_path: str, n_channels: int = None,
                     fs: float = 62.5, channel_names=None):
    """Stacked multichannel EEG trace plot — the capability the reference
    gets from mne.io.RawArray.plot (flow_eeg.py:414-417); mne is not in this
    image, so matplotlib draws the stacked traces directly.

    trials: (C, T) single trial or (N, C, T) (the first is plotted)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.asarray(trials)
    if arr.ndim == 3:
        arr = arr[0]
    c, t = arr.shape
    if n_channels is not None:
        c = min(c, n_channels)
        arr = arr[:c]
    times = np.arange(t) / fs
    spread = np.std(arr) * 4 + 1e-9
    fig, ax = plt.subplots(figsize=(10, max(4, c * 0.4)))
    for i in range(c):
        ax.plot(times, arr[i] + (c - 1 - i) * spread, lw=0.6)
    ax.set_yticks([(c - 1 - i) * spread for i in range(c)])
    ax.set_yticklabels(channel_names[:c] if channel_names
                       else [f"ch{i}" for i in range(c)], fontsize=7)
    ax.set_xlabel("time [s]")
    fig.savefig(out_path, bbox_inches="tight", dpi=90)
    plt.close(fig)
