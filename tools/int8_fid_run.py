#!/usr/bin/env python
"""int8-vs-bf16 serving-tier FID comparison on a trained GAN checkpoint.

Restores the checkpoint the same way test.py does, samples one batch of
captions through the float Sampler and the Int8Sampler, and reports the
FID shift int8 introduces (plus absolute FIDs vs --real-dir images when
given). eval/fid.py::int8_vs_bf16_fid is the library entry; this is the
CLI around it (VERDICT r2 #8: the number that decides whether the int8
tier ships for a given checkpoint).

  python tools/int8_fid_run.py --checkpoint checkpoints/gan \
      --captions-path data/caps.json [--real-dir /data/bedrooms] [--n 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--captions-path", required=True)
    p.add_argument("--real-dir", default="",
                   help="directory of real images for absolute FIDs "
                        "(omitted: only the int8-vs-float shift)")
    p.add_argument("--n", type=int, default=64, help="images per arm")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--feature-batch", type=int, default=32)
    p.add_argument("--int8-percentile", type=float, default=99.0,
                   help="int8 activation-scale calibration percentile "
                        "(100 = pure max; 99 = measured default) — "
                        "reproduces BENCH.md's calibration comparison")
    return p.parse_args()


def main():
    args = parse_args()
    from attngan_tpu.core.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from attngan_tpu.core.config import GanConfig
    from attngan_tpu.data.captions import CaptionHandler
    from attngan_tpu.eval.fid import FIDEvaluator, int8_vs_bf16_fid
    from attngan_tpu.train.checkpoint import (latest_checkpoint,
                                              load_config_sidecar,
                                              restore_inference_state)
    from attngan_tpu.train.gan_trainer import GanTrainer

    handler = CaptionHandler(args.captions_path)
    sidecar = load_config_sidecar(args.checkpoint) or {}
    cfg = GanConfig(**{k: sidecar[k] for k in
                       ("gf_dim", "df_dim", "emb_dim", "seq_len",
                        "num_stages", "image_encoder") if k in sidecar},
                    compute_dtype="bfloat16")
    trainer = GanTrainer(cfg, vocab_size=handler.vocab_size)
    ckpt = latest_checkpoint(args.checkpoint) or args.checkpoint
    abstract = jax.eval_shape(lambda: trainer.init_state(seed=args.seed))
    state = jax.device_put(restore_inference_state(ckpt, abstract))
    print(f"restored {ckpt}", flush=True)

    rng = np.random.default_rng(args.seed)
    tokens = jnp.asarray(
        rng.integers(0, handler.vocab_size, (args.n, cfg.seq_len)), jnp.int32)
    lengths = jnp.full((args.n,), cfg.seq_len, jnp.int32)

    real = None
    if args.real_dir:
        from attngan_tpu.data.dataset import Dataset, preprocess_pyramid

        ds = Dataset(args.real_dir, max_images=args.n)
        pix = np.stack([r.pixels for r in ds.records[: args.n]])
        flip = np.zeros((pix.shape[0],), bool)
        real = np.asarray(
            preprocess_pyramid(jnp.asarray(pix), jnp.asarray(flip))[256])

    ev = FIDEvaluator(batch_size=args.feature_batch)
    out = int8_vs_bf16_fid(trainer, state, tokens, lengths,
                           jax.random.key(args.seed), real_images=real,
                           evaluator=ev,
                           int8_percentile=args.int8_percentile)
    print(json.dumps({k: round(float(v), 4) for k, v in out.items()}))


if __name__ == "__main__":
    main()
