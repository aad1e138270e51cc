"""Dataset: host file scan + device-side multi-scale preprocessing.

Reference: data/bedrooms.py:104-238 — a recursive .jpg scan, EAGER PIL
decode of every image at 3 resolutions plus a flipped duplicate, per-res
Resize/ToTensor/Normalize(0.5, 0.5) to [-1, 1], JSON caption persistence,
and a TensorDataset DataLoader of (tokens, lengths, class_ids, img64,
img128, img256).

TPU-native redesign: the host only decodes each JPEG once to a canonical
256x256 uint8 array; the 64/128/256 pyramid, [-1, 1] normalization, and
horizontal-flip augmentation all run as ONE jit-compiled batched function on
device (``preprocess_pyramid``) — the "pure-JAX preprocessing path" of the
north star. Batches have static shapes (captions padded to max_seqlen), and
like the reference's training loops we drop ragged final batches
(train.py:112-113).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from attngan_tpu.data.vocab import Vocab

CANONICAL_RES = 256
IMAGE_EXTS = (".jpg", ".jpeg", ".png")


def scan_image_paths(rootdir: str, max_images: int = 99999) -> List[str]:
    """Recursive scan for image files (reference bedrooms.py:122-132)."""
    paths: List[str] = []
    for dirpath, _, filenames in sorted(os.walk(rootdir)):
        for fname in sorted(filenames):
            if fname.lower().endswith(IMAGE_EXTS):
                paths.append(os.path.join(dirpath, fname))
                if len(paths) >= max_images:
                    return paths
    return paths


def decode_image(path: str, res: int = CANONICAL_RES) -> np.ndarray:
    """Host-side decode to (res, res, 3) uint8 (the only non-JAX step)."""
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB").resize((res, res), Image.BILINEAR)
        return np.asarray(img, np.uint8)


@jax.jit
def preprocess_pyramid(images_u8: jax.Array, flip: jax.Array):
    """uint8 (B, 256, 256, 3) -> dict of normalized float32 pyramids.

    Replaces the reference's per-res PIL transform stack
    (bedrooms.py:149-164): bilinear resize to 64/128, scale to [-1, 1]
    (Normalize(0.5, 0.5) on ToTensor output), optional horizontal flip
    (RandomHorizontalFlip(p=1) duplicate, bedrooms.py:141-146).
    """
    x = images_u8.astype(jnp.float32) / 255.0
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    x = jnp.clip((x - 0.5) / 0.5, -1.0, 1.0)  # guard fp32 rounding past 1.0
    b = x.shape[0]
    out = {256: x}
    for res in (128, 64):
        out[res] = jax.image.resize(x, (b, res, res, 3), "bilinear")
    return out


def _decode_records(paths: List[str], max_images: int, flip_augment: bool,
                    use_native: bool) -> List["Record"]:
    """Eager decode of the scanned files into Records, preferring the
    multithreaded native C++ loader (attngan_tpu/data/native_loader.py);
    unreadable files are tolerated (reference bedrooms.py:143-144)."""
    records: List[Record] = []
    pixels_by_path = {}
    if use_native:
        from attngan_tpu.data import native_loader

        if native_loader.available():
            images, ok = native_loader.decode_batch(paths, CANONICAL_RES)
            pixels_by_path = {p: images[i] for i, p in enumerate(paths)
                              if ok[i]}
            use_native = True
        else:
            use_native = False
    for path in paths:
        if use_native:
            pixels = pixels_by_path.get(path)
            if pixels is None:
                continue
        else:
            try:
                pixels = decode_image(path)
            except (OSError, FileNotFoundError):
                continue
        records.append(Record(path, pixels))
        if flip_augment:
            records.append(Record(f"{path}_r", pixels, flip=True))
        if len(records) >= max_images:
            break
    return records


@dataclass
class Record:
    """One image record (reference SingleImage, bedrooms.py:28-57)."""

    fpath: str
    pixels: np.ndarray            # (256, 256, 3) uint8, pre-flip
    flip: bool = False
    caption: List[str] = field(default_factory=list)
    class_id: Optional[int] = None


class Dataset:
    """Eagerly-decoded image dataset + vocab + caption persistence."""

    def __init__(self, rootdir: str = "", max_images: int = 99999,
                 flip_augment: bool = True, records: Optional[List[Record]] = None,
                 use_native_loader: bool = False):
        # use_native_loader: the C++ thread-pool decoder (attngan_tpu/native/) pays off
        # on many-core hosts; on this 1-core dev box PIL's SIMD resampling
        # wins (measured 0.73x), so the default is off. Set True on real
        # data-loading hosts.
        self.rootdir = rootdir
        self.vocab = Vocab()
        if records is not None:
            self.records = records
        else:
            self.records = []
            if rootdir:
                paths = scan_image_paths(rootdir, max_images)
                self.records = _decode_records(paths, max_images, flip_augment,
                                               use_native_loader)

    def __len__(self) -> int:
        return len(self.records)

    # ----- pixel access (overridden by data/streaming.py) -----
    #
    # Everything that touches pixels goes through these two hooks, so the
    # bounded-memory StreamingDataset can swap decode-on-demand in under the
    # SAME batching/vocab/caption semantics (identical batches for the same
    # seed — tested in tests/test_streaming.py).

    def _record_pixels(self, record: "Record") -> np.ndarray:
        """(256, 256, 3) uint8 pre-flip pixels of one record."""
        return record.pixels

    def _batch_pixels(self, records: List["Record"]) -> np.ndarray:
        """(N, 256, 256, 3) uint8 pre-flip pixels of a batch of records."""
        return np.stack([self._record_pixels(r) for r in records])

    @property
    def max_seqlen(self) -> int:
        return max((len(r.caption) for r in self.records), default=0)

    # ----- caption persistence (reference bedrooms.py:166-180) -----

    def save_captions_and_class_ids(self, path: str) -> None:
        mapping = {r.fpath: [r.caption, r.class_id] for r in self.records}
        with open(path, "w") as f:
            json.dump(mapping, f)

    def load_captions_and_class_ids(self, path: str) -> None:
        with open(path) as f:
            mapping = json.load(f)
        by_path = {r.fpath: r for r in self.records}
        for fpath, (caption, class_id) in mapping.items():
            if fpath in by_path:
                by_path[fpath].caption = caption
                by_path[fpath].class_id = class_id

    # ----- batching (replaces make_dataloaders, bedrooms.py:209-238) -----

    def build_vocab(self) -> None:
        if not self.vocab.vocab_built:
            self.vocab.build([r.caption for r in self.records])

    def iter_batches(
        self,
        batch_size: int,
        max_seqlen: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_ragged: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yields static-shape host batches; run ``preprocess_pyramid`` on
        the uint8 pixels device-side. Ragged final batches are dropped like
        the reference's `len(words) < BATCH_SIZE` skip (train.py:112-113)."""
        self.build_vocab()
        max_seqlen = max_seqlen or self.max_seqlen
        order = np.arange(len(self.records))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, len(order), batch_size):
            idx = order[start : start + batch_size]
            if drop_ragged and len(idx) < batch_size:
                continue
            recs = [self.records[i] for i in idx]
            tokens, lengths = self.vocab.encode_batch(
                [r.caption for r in recs], max_seqlen
            )
            yield {
                "indices": idx,
                "tokens": tokens,
                "lengths": lengths,
                "class_ids": np.asarray(
                    [r.class_id if r.class_id is not None else 0 for r in recs],
                    np.int32,
                ),
                "pixels": self._batch_pixels(recs),
                "flip": np.asarray([r.flip for r in recs], bool),
            }

    def evaluate_clustering(self, idx, max_images: int = 50, nrow: int = 10,
                            folder: str = "images_testing", seed: int = 0):
        """For each cluster level of one image's caption (finest first),
        dump a grid of co-clustered members (reference bedrooms.py:186-207).
        Returns {k_value: member count}."""
        import os

        from attngan_tpu.utils.imaging import image_grid, save_image

        record = (self.records[idx] if isinstance(idx, int)
                  else next(r for r in self.records if r.fpath == idx))
        counts = {}
        rng = np.random.default_rng(seed)
        for i, token in enumerate(reversed(record.caption), 1):
            k_value = token.split("c")[0].lstrip("k")
            members = [r for r in self.records
                       if len(r.caption) >= i and r.caption[-i] == token]
            counts[k_value] = len(members)
            chosen = list(members)
            rng.shuffle(chosen)
            chosen = chosen[:max_images]
            imgs = self._batch_pixels(chosen).astype(np.float32) / 255.0
            os.makedirs(folder, exist_ok=True)
            save_image(image_grid(imgs, nrow=nrow),
                       os.path.join(folder, f"k-{k_value}.png"))
        return counts

    def device_batch(self, host_batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        """Move a host batch to device and build the image pyramid."""
        pyramid = preprocess_pyramid(
            jnp.asarray(host_batch["pixels"]), jnp.asarray(host_batch["flip"])
        )
        return {
            "tokens": jnp.asarray(host_batch["tokens"]),
            "lengths": jnp.asarray(host_batch["lengths"]),
            "class_ids": jnp.asarray(host_batch["class_ids"]),
            "img64": pyramid[64],
            "img128": pyramid[128],
            "img256": pyramid[256],
        }


def word_mask(lengths: jax.Array, max_seqlen: int) -> jax.Array:
    """(B,) lengths -> (B, L) 1/0 mask (reference _make_mask, train.py:96-100)."""
    return (jnp.arange(max_seqlen)[None, :] < lengths[:, None]).astype(jnp.int32)
