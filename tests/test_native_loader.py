"""Native C++ JPEG loader vs the PIL reference path."""

import os

import numpy as np
import pytest
from PIL import Image

from attngan_tpu.data import native_loader
from attngan_tpu.data.dataset import Dataset, decode_image


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    for i, size in enumerate([(640, 480), (256, 256), (100, 377)]):
        # smooth-ish image so JPEG round-trip noise stays small
        base = np.linspace(0, 255, size[0] * size[1] * 3) % 256
        arr = (base.reshape(size[1], size[0], 3)
               + rng.normal(0, 8, (size[1], size[0], 3))).clip(0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(d / f"img{i}.jpg",
                                                   quality=95)
    return str(d)


def test_native_lib_builds():
    assert native_loader.available(), "native loader failed to build"


def test_native_decode_matches_pil(jpeg_dir):
    paths = sorted(os.path.join(jpeg_dir, f) for f in os.listdir(jpeg_dir))
    images, ok = native_loader.decode_batch(paths, res=64)
    assert ok.all()
    assert images.shape == (3, 64, 64, 3)
    for i, path in enumerate(paths):
        pil = decode_image(path, 64).astype(np.float32)
        ours = images[i].astype(np.float32)
        # same filter family; small differences from DCT prescaling and
        # rounding are expected
        mad = np.abs(pil - ours).mean()
        assert mad < 6.0, f"{path}: mean abs diff {mad:.2f}"


def test_native_decode_tolerates_bad_files(jpeg_dir, tmp_path):
    bad = tmp_path / "notajpeg.jpg"
    bad.write_bytes(b"definitely not a jpeg")
    missing = str(tmp_path / "missing.jpg")
    good = os.path.join(jpeg_dir, "img0.jpg")
    images, ok = native_loader.decode_batch([good, str(bad), missing], res=32)
    assert ok.tolist() == [True, False, False]
    assert images[1].sum() == 0 and images[2].sum() == 0


def test_dataset_uses_native_loader(jpeg_dir):
    ds_native = Dataset(jpeg_dir, flip_augment=False, use_native_loader=True)
    ds_pil = Dataset(jpeg_dir, flip_augment=False, use_native_loader=False)
    assert len(ds_native) == len(ds_pil) == 3
    for a, b in zip(ds_native.records, ds_pil.records):
        assert a.fpath == b.fpath
        mad = np.abs(a.pixels.astype(np.float32)
                     - b.pixels.astype(np.float32)).mean()
        assert mad < 6.0
