"""Human-captioned dataset loaders (reference data/preprocessor.py path)."""

import csv
import os

import numpy as np
from PIL import Image

from attngan_tpu.data.captioned import (
    csv_caption_dataset,
    folder_caption_dataset,
    tokenize_caption,
)


def _write_jpg(path, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                    .astype(np.uint8)).save(path)


def test_tokenize_caption():
    assert tokenize_caption("modern,square, urban loft") == [
        "modern", "square", "urban", "loft"]
    assert tokenize_caption("") == []


def test_folder_caption_dataset(tmp_path):
    for folder, n in [("gothic", 2), ("bauhaus", 1), ("unlabeled", 1)]:
        for i in range(n):
            _write_jpg(str(tmp_path / folder / f"{i}.jpg"), seed=i)
    lookup = {"gothic": "religious,spiky", "bauhaus": "modern,square,simple"}
    ds = folder_caption_dataset(str(tmp_path), lookup, flip_augment=True)
    # unlabeled folder skipped; 3 labeled images x2 flip
    assert len(ds.records) == 6
    gothic = [r for r in ds.records if "gothic" in r.fpath]
    assert gothic[0].caption == ["religious", "spiky"]
    # class ids per folder (sorted): bauhaus=0, gothic=1 (unlabeled skipped)
    assert {r.class_id for r in gothic} == {1}
    # feeds the standard batching path unchanged
    batch = next(ds.iter_batches(2, shuffle=False))
    assert batch["tokens"].shape[1] == ds.max_seqlen


def test_csv_caption_dataset(tmp_path):
    imagedir = tmp_path / "imgs"
    for i in range(3):
        _write_jpg(str(imagedir / f"img{i}.jpg"), seed=i)
    index = tmp_path / "index.csv"
    with open(index, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["img0.jpg", "sunny kitchen, wood floor"])
        writer.writerow(["img1.jpg", "dark bedroom"])
        writer.writerow(["missing.jpg", "should be skipped"])
        writer.writerow(["img2.jpg", "green garden"])
    ds = csv_caption_dataset(str(index), str(imagedir), flip_augment=False)
    assert len(ds.records) == 3  # missing file tolerated
    assert ds.records[0].caption == ["sunny", "kitchen", "wood", "floor"]
    assert ds.records[0].class_id == 0 and ds.records[2].class_id == 3
