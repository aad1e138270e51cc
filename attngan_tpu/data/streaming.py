"""Bounded-memory streaming dataset: decode-on-demand over the same
batching semantics as the eager Dataset.

Why this exists (TPU-first redesign, not parity): the reference eagerly
decodes the ENTIRE corpus into host tensors before training starts
(data/bedrooms.py:137-147), and the eager ``Dataset`` here mirrors that —
~200 KB of host RAM per 256x256 uint8 record means an LSUN-scale corpus
(~3M bedrooms, the reference's own live path, bedrooms.py:105) needs
~600 GB of host RAM. This class holds only the file paths and captions
resident and decodes each epoch's batches on demand, so host RSS is bounded
by ``O(prefetch_depth * batch_size)`` images regardless of corpus size.

Design:

  * Record list construction (scan order, flip duplicates, ``max_images``
    cap) is IDENTICAL to the eager Dataset's, and ``iter_batches`` is
    inherited unchanged — the epoch's global seeded permutation, caption
    encoding, and ragged-batch drop are the same code path. Only the
    ``_batch_pixels`` hook differs: it decodes the batch's files at yield
    time instead of reading a resident array. Given the same seed, the two
    classes produce byte-identical batches (tests/test_streaming.py).
  * Decoding goes through the native C++ thread-pool loader
    (attngan_tpu/data/native_loader.py) when available — one
    ``decode_batch`` call per training batch, libjpeg decode + box-filter
    resize across threads — with transparent PIL fallback. Flip duplicates
    share their source file's single decode within a batch.
  * The existing ``data/prefetch.py`` wrapper (already wrapping both train
    loops) runs ``iter_batches`` in a background thread, so decode overlaps
    the accelerator step — the TPU sees the same prefetched h2d stream as
    the eager path.
  * Failure tolerance diverges from eager BY NECESSITY: the eager loader
    drops unreadable files at construction time (reference
    bedrooms.py:143-144), which a streaming loader cannot do without
    decoding everything once. Static batch shapes are load-bearing under
    jit, so an unreadable file yields ZERO pixels plus a rate-limited
    warning instead of changing the batch shape mid-epoch.

Selected from the CLIs with ``--stream`` (pretrain_damsm.py / train.py).
Feature caching (``--cache-features``) is refused under streaming: the
cache itself is ~300 KB/image host-resident, which defeats the bound.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

from attngan_tpu.data.dataset import (
    CANONICAL_RES,
    Dataset,
    Record,
    scan_image_paths,
)

logger = logging.getLogger(__name__)


class StreamingDataset(Dataset):
    """Dataset with path-only records and decode-on-demand batches."""

    def __init__(self, rootdir: str = "", max_images: int = 99999,
                 flip_augment: bool = True,
                 records: Optional[List[Record]] = None,
                 use_native_loader: bool = True):
        # Same record-list construction rule as the eager path
        # (dataset.py::_decode_records): per scanned file, one record plus
        # (optionally) one flipped duplicate, capped at max_images RECORDS.
        # The flip duplicate keeps the eager loader's "<path>_r" fpath so
        # caption-JSON keys round-trip between the two classes.
        self.rootdir = rootdir
        from attngan_tpu.data.vocab import Vocab

        self.vocab = Vocab()
        self.use_native_loader = use_native_loader
        self._decode_failures = 0
        if records is not None:
            self.records = records
            return
        self.records = []
        if rootdir:
            for path in scan_image_paths(rootdir, max_images):
                self.records.append(Record(path, None))
                if flip_augment:
                    self.records.append(Record(f"{path}_r", None, flip=True))
                if len(self.records) >= max_images:
                    break

    # ----- pixel access: decode at batch-yield time -----

    @staticmethod
    def _source_path(record: Record) -> str:
        """The on-disk file behind a record (flip duplicates carry the
        eager loader's '<path>_r' fpath; pixels are pre-flip — the flip
        itself happens on device in preprocess_pyramid)."""
        return record.fpath[:-2] if record.flip else record.fpath

    def _batch_pixels(self, records: List[Record]) -> np.ndarray:
        from attngan_tpu.data import native_loader

        paths = [self._source_path(r) for r in records]
        # flip duplicates landing in the same batch share one decode
        unique = list(dict.fromkeys(paths))
        if self.use_native_loader and native_loader.available():
            images, ok = native_loader.decode_batch(unique, CANONICAL_RES)
        else:
            from attngan_tpu.data.dataset import decode_image

            images = np.zeros((len(unique), CANONICAL_RES, CANONICAL_RES, 3),
                              np.uint8)
            ok = np.zeros((len(unique),), bool)
            for i, path in enumerate(unique):
                try:
                    images[i] = decode_image(path)
                    ok[i] = True
                except (OSError, FileNotFoundError):
                    pass
        if not ok.all():
            bad = [p for p, good in zip(unique, ok) if not good]
            self._decode_failures += len(bad)
            if self._decode_failures <= 20:
                logger.warning(
                    "streaming decode failed for %d file(s) (zero-filled to "
                    "keep batch shapes static; eager loading would have "
                    "dropped them up front): %s", len(bad), bad[:3])
        index = {p: i for i, p in enumerate(unique)}
        return images[[index[p] for p in paths]]

    def _record_pixels(self, record: Record) -> np.ndarray:
        return self._batch_pixels([record])[0]


# Above this many records the eager path would hold >~10 GB of pixels
# resident; open_dataset auto-switches to streaming.
STREAM_AUTO_THRESHOLD = 50_000


def open_dataset(rootdir: str, max_images: int = 99999,
                 flip_augment: bool = True, stream: bool = False,
                 use_native_loader: Optional[bool] = None) -> Dataset:
    """CLI-facing constructor: the eager Dataset, or the bounded-memory
    streaming one when ``stream`` (or when the scan exceeds
    STREAM_AUTO_THRESHOLD records — eagerly decoding a corpus that large is
    never what anyone wants)."""
    n_scanned = len(scan_image_paths(rootdir, max_images))
    n_records = min(max_images, n_scanned * (2 if flip_augment else 1))
    if not stream and n_records > STREAM_AUTO_THRESHOLD:
        print(f"dataset: {n_records} records exceed the eager-decode "
              f"threshold ({STREAM_AUTO_THRESHOLD}); switching to the "
              "bounded-memory streaming loader (pass --stream to silence)")
        stream = True
    cls = StreamingDataset if stream else Dataset
    kwargs: Dict = {}
    if use_native_loader is not None:
        kwargs["use_native_loader"] = use_native_loader
    return cls(rootdir, max_images=max_images, flip_augment=flip_augment,
               **kwargs)
