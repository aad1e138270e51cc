#!/usr/bin/env python
"""Benchmark attention-map extraction against the reference's ONE number.

The reference's only published performance artifact is the comment
"44 seconds for 1000 images" (~23 img/s) on its commented-out
``populate_attnmaps`` (reference pretrain_damsm.py:85-107,148): for every
dataset batch, run the frozen Inception trunk + the text LSTM, compute
each image's attention over its OWN caption, and copy the maps to host
objects. BASELINE.md carries it as the one reference number to beat.

This measures the framework's equivalent at the same unit of work:
``DamsmTrainer.iter_attention_maps`` — host batching + h2d + device
pyramid + trunk fwd + BiLSTM fwd + masked DAMSM attention in ONE jit,
maps read back to host numpy per batch (the readback is the fence, so
wall-clock over many batches is honest through the remote-device tunnel;
BENCH.md "Methodology"). The reference-comparable rate is maps-on-host;
--png additionally measures the file-writing product path
(``populate_attention_maps``), which does strictly more than the
reference did (it wrote no files).

  python tools/attnmaps_bench.py --n 1024            # maps-to-host rate
  python tools/attnmaps_bench.py --n 1024 --png      # + PNG-writing rate

Prints one JSON line per measurement with vs_reference = rate / 23.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_IMG_PER_SEC = 1000.0 / 44.0   # reference pretrain_damsm.py:148


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1024,
                   help="images to extract (reference quote is per 1000)")
    p.add_argument("--batch-size", type=int, default=64,
                   help="reference DAMSM batch (pretrain_damsm.py:41)")
    p.add_argument("--emb-dim", type=int, default=256)
    p.add_argument("--image-encoder", default="inception_v3",
                   help="inception_v3 = reference trunk; tiny for smoke")
    p.add_argument("--levels", type=int, default=7,
                   help="caption ladder depth (reference max_vocab=1000 "
                        "yields a ~7-token k-ladder)")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--png", action="store_true",
                   help="also time the PNG-writing product path")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    from attngan_tpu.core.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from attngan_tpu.core.config import DamsmConfig
    from attngan_tpu.data.synthetic import make_synthetic_dataset
    from attngan_tpu.train.damsm_trainer import DamsmTrainer

    # +1 warmup batch so the timed region is pure steady state.
    n_total = args.n + args.batch_size
    dataset = make_synthetic_dataset(n_total, num_classes=8, seed=args.seed,
                                     levels=args.levels)
    dataset.build_vocab()
    seq_len = dataset.max_seqlen

    cfg = DamsmConfig(emb_dim=args.emb_dim, batch_size=args.batch_size,
                      image_encoder=args.image_encoder,
                      compute_dtype=args.compute_dtype)
    trainer = DamsmTrainer(cfg, vocab_size=dataset.vocab.n_words,
                           seq_len=seq_len)
    state = trainer.init_state(seed=args.seed)

    # Warmup: compiles the pyramid + attention jits and faults in the
    # dataset's first host batch.
    next(trainer.iter_attention_maps(state, dataset,
                                     batch_size=args.batch_size,
                                     limit=1))

    start = time.perf_counter()
    count = sum(1 for _ in trainer.iter_attention_maps(
        state, dataset, batch_size=args.batch_size, limit=args.n))
    dt = time.perf_counter() - start
    rate = count / dt
    print(json.dumps({
        "metric": "attnmap_images_per_sec", "value": round(rate, 1),
        "unit": "img/s", "images": count, "batch_size": args.batch_size,
        "image_encoder": args.image_encoder, "seconds": round(dt, 2),
        "reference_img_per_sec": round(REFERENCE_IMG_PER_SEC, 1),
        "vs_reference": round(rate / REFERENCE_IMG_PER_SEC, 1)}))

    if args.png:
        import tempfile

        with tempfile.TemporaryDirectory() as folder:
            start = time.perf_counter()
            written = trainer.populate_attention_maps(
                state, dataset, folder=folder, batch_size=args.batch_size,
                limit=args.n)
            dt = time.perf_counter() - start
        rate = written / dt
        print(json.dumps({
            "metric": "attnmap_png_images_per_sec", "value": round(rate, 1),
            "unit": "img/s", "images": written, "seconds": round(dt, 2),
            "vs_reference": round(rate / REFERENCE_IMG_PER_SEC, 1)}))


if __name__ == "__main__":
    main()
