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
