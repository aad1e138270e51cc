"""Image grids, loss plots, attention-map dumps.

Reference: trainers/trainer.py:49-107 (moving-average loss plots, per-epoch
image grids and single-image PNGs) and pretrain_damsm.py:150-164 (attention
viewers). matplotlib is host-side and optional; arrays in, PNGs out.
"""

from __future__ import annotations

import math
import os
from typing import List, Sequence

import numpy as np


def _ensure_dir(path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)


def moving_average(values: Sequence[float], window: int) -> np.ndarray:
    """Same simple sliding mean the reference plots (trainer.py:55-63)."""
    v = np.asarray(values, np.float64)
    if len(v) < window:
        return v
    kernel = np.ones(window) / window
    return np.convolve(v, kernel, mode="valid")


def plot_history(histories, path: str, window: int = 100) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if histories and not isinstance(histories[0], (list, np.ndarray)):
        histories = [histories]
    _ensure_dir(path)
    fig = plt.figure()
    for h in histories:
        plt.plot(moving_average(h, min(window, max(len(h), 1))))
    fig.savefig(path)
    plt.close(fig)


def image_grid(images: np.ndarray, nrow: int = 0) -> np.ndarray:
    """(N, H, W, 3) in [0, 1] -> one (gh*H, gw*W, 3) grid array."""
    n, h, w, c = images.shape
    if nrow <= 0:
        nrow = max(int(math.sqrt(n)), 1)
    ncol = math.ceil(n / nrow)
    grid = np.zeros((nrow * h, ncol * w, c), images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        if r < nrow:
            grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    return grid


def save_image(array: np.ndarray, path: str) -> None:
    """(H, W, 3) in [0, 1] -> PNG."""
    from PIL import Image

    _ensure_dir(path)
    Image.fromarray((np.clip(array, 0, 1) * 255).astype(np.uint8)).save(path)


def save_image_grids(fake_images: List[np.ndarray], epoch: int,
                     folder: str = "generated_images") -> None:
    """Per-resolution grids, like reference trainer.py:68-102."""
    for images in fake_images:
        res = images.shape[1]
        save_image(image_grid(np.asarray(images)),
                   os.path.join(folder, f"epoch_{epoch}-{res}x{res}.png"))


def save_attention_maps(attn: np.ndarray, path: str) -> None:
    """(L, H, W) attention -> horizontal strip PNG (pretrain viewers)."""
    l, h, w = attn.shape
    normalized = attn / (attn.max(axis=(1, 2), keepdims=True) + 1e-8)
    strip = normalized.transpose(1, 0, 2).reshape(h, l * w)
    save_image(np.repeat(strip[..., None], 3, axis=-1), path)
