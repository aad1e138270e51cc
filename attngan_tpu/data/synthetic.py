"""Synthetic in-memory dataset for tests and benchmarks.

The reference has no test assets (its data paths are hardcoded Windows
directories, bedrooms.py:105). This generator produces a structured fake
dataset — colored-noise images whose hue correlates with their (synthetic)
cluster identity — so the full pipeline (clustering captioner -> DAMSM ->
GAN -> inference) can be exercised end-to-end without LSUN.
"""

from __future__ import annotations

from typing import List

import numpy as np

from attngan_tpu.data.dataset import CANONICAL_RES, Dataset, Record


def make_synthetic_dataset(
    num_images: int = 32,
    num_classes: int = 4,
    seed: int = 0,
    with_captions: bool = True,
    levels: int = 2,
    res: int = CANONICAL_RES,
) -> Dataset:
    rng = np.random.default_rng(seed)
    records: List[Record] = []
    for i in range(num_images):
        cls = i % num_classes
        base = np.zeros((res, res, 3), np.float32)
        base[..., cls % 3] = 120 + 40 * (cls // 3)      # class-correlated hue
        noise = rng.normal(0, 30, (res, res, 3))
        pixels = np.clip(base + noise + 80, 0, 255).astype(np.uint8)
        rec = Record(fpath=f"synthetic/{i:05d}.jpg", pixels=pixels)
        if with_captions:
            # mimic the clusterer's coarse->fine "k{k}c{c}" token ladder
            rec.caption = [f"k{2 ** (lvl + 1)}c{cls % (2 ** (lvl + 1))}"
                           for lvl in range(levels)]
            rec.class_id = cls
        records.append(rec)
    return Dataset(records=records)
