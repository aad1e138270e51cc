#!/usr/bin/env python
"""Adversarial (GAN) training entry point (reference train.py, with a real
CLI instead of notebook cells).

Loads the dataset + saved pseudo-captions, restores the DAMSM-pretrained
text/image encoders (frozen, reference train.py:88-90), and runs the
3-optimizer adversarial loop: per-resolution discriminator steps, then a
generator step with adversarial + DAMSM + KL terms.

Examples:
  python train.py --data-root /data/bedrooms --epochs 150
  python train.py --synthetic 32 --num-stages 2 --gf-dim 8 --df-dim 8 \
      --image-encoder tiny --epochs 1      # BASELINE configs[1-2]-style smoke
"""

from __future__ import annotations

import argparse


def parse_args():
    from attngan_tpu.core.config import Config

    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--data-root", default=Config.DATA_ROOT)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--max-images", type=int, default=99999)
    p.add_argument("--stream", action="store_true",
                   help="bounded-memory streaming loader: decode batches on "
                        "demand instead of eagerly holding the whole corpus "
                        "in host RAM — required for LSUN-scale corpora; "
                        "auto-enabled above 50k records")
    p.add_argument("--captions-path", default=Config.CAPTIONS_JSON)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-stages", type=int, default=3, choices=[1, 2, 3])
    p.add_argument("--gf-dim", type=int, default=32)
    p.add_argument("--df-dim", type=int, default=64)
    p.add_argument("--emb-dim", type=int, default=256)
    p.add_argument("--seq-len", type=int, default=5)
    p.add_argument("--gen-lr", type=float, default=2e-4)
    p.add_argument("--disc-lr", type=float, default=2e-4)
    p.add_argument("--loss-variant", default="non_saturating",
                   choices=["non_saturating", "standard"])
    p.add_argument("--image-encoder", default="inception_v3",
                   choices=["inception_v3", "tiny"])
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--damsm-checkpoint", default="",
                   help="orbax DAMSM checkpoint dir/step to restore encoders")
    p.add_argument("--checkpoint-dir", default=Config.CHECKPOINT_DIR)
    p.add_argument("--image-dir", default=Config.IMAGE_DIR)
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest GAN checkpoint; epoch "
                        "numbering continues and --epochs is the TOTAL "
                        "epoch count, so a run killed at epoch 23 of 100 "
                        "resumes with the same --epochs 100")
    p.add_argument("--checkpoint-every-epochs", type=int, default=1,
                   help="save a checkpoint + sample grid every N epochs "
                        "(each save is a separate step_* dir — raise N on "
                        "long runs to bound disk)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=50,
                   help="print loss + steps/s every N steps")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of steps 2-7")
    p.add_argument("--mesh-shape", type=int, nargs="*", default=[],
                   help="device mesh shape: empty=auto 1-D; one int=1-D over "
                        "n devices; two ints=2-D (slices, chips) multi-slice")
    return p.parse_args()


def load_damsm_encoders(path: str, cfg, vocab_size: int, seq_len: int):
    """Restore (rnn_params, cnn_variables) from a DAMSM checkpoint."""
    from attngan_tpu.core.config import DamsmConfig
    from attngan_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint
    from attngan_tpu.train.damsm_trainer import DamsmTrainer

    dcfg = DamsmConfig(emb_dim=cfg.emb_dim, image_encoder=cfg.image_encoder,
                       compute_dtype=cfg.compute_dtype)
    trainer = DamsmTrainer(dcfg, vocab_size=vocab_size, seq_len=seq_len)
    template = trainer.init_state(seed=0)
    ckpt = latest_checkpoint(path) or path
    state = restore_checkpoint(ckpt, template)
    cnn_params = {**state.cnn_trunk_params, **state.cnn_head_params}
    cnn_vars = {"params": cnn_params, "batch_stats": state.cnn_stats}
    return state.rnn_params, cnn_vars


def main():
    args = parse_args()
    from attngan_tpu.core.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from attngan_tpu.core.config import GanConfig, RunConfig
    from attngan_tpu.data.streaming import open_dataset
    from attngan_tpu.data.synthetic import make_synthetic_dataset
    from attngan_tpu.train.loops import run_gan_training

    if args.synthetic:
        dataset = make_synthetic_dataset(args.synthetic)
    else:
        dataset = open_dataset(args.data_root, max_images=args.max_images,
                               stream=args.stream)
        dataset.load_captions_and_class_ids(args.captions_path)
    dataset.build_vocab()

    cfg = GanConfig(gf_dim=args.gf_dim, df_dim=args.df_dim,
                    emb_dim=args.emb_dim, seq_len=args.seq_len,
                    batch_size=args.batch_size, gen_lr=args.gen_lr,
                    disc_lr=args.disc_lr, epochs=args.epochs,
                    num_stages=args.num_stages, loss_variant=args.loss_variant,
                    image_encoder=args.image_encoder,
                    compute_dtype=args.compute_dtype)
    run_cfg = RunConfig(seed=args.seed, checkpoint_dir=args.checkpoint_dir,
                        log_every=args.log_every,
                        image_dir=args.image_dir, profile=args.profile,
                        checkpoint_every_epochs=args.checkpoint_every_epochs,
                        mesh_shape=tuple(args.mesh_shape))

    rnn_params = cnn_vars = None
    if args.damsm_checkpoint:
        rnn_params, cnn_vars = load_damsm_encoders(
            args.damsm_checkpoint, cfg, dataset.vocab.n_words, args.seq_len)

    run_gan_training(cfg, run_cfg, dataset, rnn_params=rnn_params,
                     cnn_variables=cnn_vars, resume=args.resume)


if __name__ == "__main__":
    main()
