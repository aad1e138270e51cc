#!/usr/bin/env python
"""DAMSM pretraining entry point (reference pretrain_damsm.py, with a real
CLI instead of notebook cells).

Pipeline (reference :48-73 setup + :110-138 loop): build the dataset,
synthesize pseudo-captions by hierarchical clustering (unless a saved
captions JSON is loaded), then train the BiLSTM text encoder + image-encoder
heads with the fused DAMSM word/sentence losses.

Examples:
  python pretrain_damsm.py --data-root /data/bedrooms --cluster --epochs 30
  python pretrain_damsm.py --synthetic 64 --batch-size 4 --epochs 2 \
      --image-encoder tiny          # BASELINE.json configs[0]-style smoke run
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    from attngan_tpu.core.config import Config

    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--data-root", default=Config.DATA_ROOT)
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic images instead of --data-root")
    p.add_argument("--max-images", type=int, default=99999)
    p.add_argument("--stream", action="store_true",
                   help="bounded-memory streaming loader: decode batches on "
                        "demand (native C++ thread-pool decoder, overlapped "
                        "with training via prefetch) instead of eagerly "
                        "holding the whole corpus in host RAM — required "
                        "for LSUN-scale corpora; auto-enabled above "
                        "50k records")
    p.add_argument("--captions-path", default=Config.CAPTIONS_JSON)
    p.add_argument("--cluster", action="store_true",
                   help="run the clustering captioner (else load captions JSON)")
    p.add_argument("--cluster-method", default="agglomerative_complete",
                   choices=["kmeans", "agglomerative_single_linkage",
                            "agglomerative_complete"])
    p.add_argument("--latent-dims", type=int, default=128)
    p.add_argument("--reducer", default="auto",
                   choices=["auto", "umap", "pca", "spectral", "tsne"],
                   help="embedding reducer before clustering; umap = "
                        "umap-learn if installed else the native "
                        "implementation (data/umap_native.py); auto = pca, "
                        "the measured real-photo default")
    p.add_argument("--min-clusters", type=int, default=5)
    p.add_argument("--max-vocab-size", type=int, default=1000)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--emb-dim", type=int, default=256)
    p.add_argument("--image-encoder", default="inception_v3",
                   choices=["inception_v3", "tiny"])
    p.add_argument("--pretrained-cnn", default="",
                   help="msgpack from tools/convert_torch_weights.py")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--cache-features", action="store_true",
                   help="precompute frozen-trunk region features once and "
                        "train against the cache (removes the Inception "
                        "forward from every step)")
    p.add_argument("--superbatch", type=int, default=1,
                   help="amortize the frozen trunk: run it once at "
                        "superbatch*batch_size images, then do that many "
                        "sequential batch_size contrastive steps inside "
                        "one jit (exact step semantics, fewer dispatches)")
    p.add_argument("--trunk-int8", action="store_true",
                   help="run the frozen image trunk in int8 (MXU s8 convs; "
                        "activation scales calibrated on the first batch) — "
                        "faster full-path pretraining with a fixed, "
                        "documented embedding perturbation")
    p.add_argument("--checkpoint-dir", default=Config.CHECKPOINT_DIR)
    p.add_argument("--image-dir", default=Config.IMAGE_DIR)
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest checkpoint (exact resume: "
                        "params + optimizer states + step + PRNG key); "
                        "epoch numbering continues and --epochs is the "
                        "TOTAL epoch count, so a run killed at epoch 23 of "
                        "100 resumes with the same --epochs 100")
    p.add_argument("--checkpoint-every-epochs", type=int, default=1,
                   help="save a checkpoint every N epochs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--trunk-train-mode-bn", action="store_true",
                   help="reproduce the reference quirk: frozen Inception "
                        "trunk runs with train-mode BatchNorm (the reference "
                        "never calls eval() on it, pretrain_damsm.py:59-73)")
    p.add_argument("--log-every", type=int, default=50,
                   help="print loss + steps/s every N steps")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of steps 2-7")
    p.add_argument("--mesh-shape", type=int, nargs="*", default=[],
                   help="device mesh shape: empty=auto 1-D; one int=1-D over "
                        "n devices; two ints=2-D (slices, chips) multi-slice")
    return p.parse_args()


def main():
    args = parse_args()
    from attngan_tpu.core.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from attngan_tpu.core.config import DamsmConfig, RunConfig
    from attngan_tpu.data.synthetic import make_synthetic_dataset
    from attngan_tpu.data.streaming import open_dataset
    from attngan_tpu.train.loops import run_damsm_training

    if args.stream and args.cache_features:
        raise SystemExit(
            "--stream and --cache-features are incompatible: the feature "
            "cache holds ~300 KB/image in host RAM, which defeats the "
            "streaming loader's bounded-memory guarantee; drop one")
    if args.synthetic:
        dataset = make_synthetic_dataset(args.synthetic,
                                         with_captions=not args.cluster)
    else:
        dataset = open_dataset(args.data_root, max_images=args.max_images,
                               stream=args.stream)

    if args.cluster:
        from attngan_tpu.data.clusterer import HierarchicalClusterer

        for rec in dataset.records:     # reset_captions_and_class_ids
            rec.caption, rec.class_id = [], None
        HierarchicalClusterer().cluster(
            dataset, latent_dims=args.latent_dims,
            max_vocab_size=args.max_vocab_size,
            min_clusters=args.min_clusters, method=args.cluster_method,
            reducer=args.reducer)
        os.makedirs(os.path.dirname(args.captions_path) or ".", exist_ok=True)
        dataset.save_captions_and_class_ids(args.captions_path)
    elif args.synthetic:
        # synthetic captions are generated in-memory; persist them so the
        # GAN/inference phases can rebuild the same vocab from JSON
        os.makedirs(os.path.dirname(args.captions_path) or ".", exist_ok=True)
        dataset.save_captions_and_class_ids(args.captions_path)
    else:
        dataset.load_captions_and_class_ids(args.captions_path)

    cfg = DamsmConfig(emb_dim=args.emb_dim, batch_size=args.batch_size,
                      lr=args.lr, epochs=args.epochs,
                      image_encoder=args.image_encoder,
                      compute_dtype=args.compute_dtype,
                      cache_region_features=args.cache_features,
                      trunk_int8=args.trunk_int8,
                      superbatch=args.superbatch,
                      trunk_train_mode_bn=args.trunk_train_mode_bn)
    run_cfg = RunConfig(seed=args.seed, checkpoint_dir=args.checkpoint_dir,
                        log_every=args.log_every,
                        image_dir=args.image_dir, profile=args.profile,
                        checkpoint_every_epochs=args.checkpoint_every_epochs,
                        mesh_shape=tuple(args.mesh_shape))
    pretrained = None
    if args.pretrained_cnn:
        from attngan_tpu.train.checkpoint import load_converted

        pretrained = load_converted(args.pretrained_cnn)
    run_damsm_training(cfg, run_cfg, dataset, pretrained_cnn=pretrained,
                       resume=args.resume)


if __name__ == "__main__":
    main()
