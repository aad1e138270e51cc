#!/usr/bin/env python
"""Clustering-captioner quality run (ROADMAP r1 #4 / VERDICT r1 #9).

Measures what the reference only ever eyeballed (its clusterer,
/root/reference/data/bedrooms.py:241-304, was judged from grid plots):

  * silhouette score of every k level of the ladder,
  * adjusted Rand index of the finest clustering vs ground-truth generative
    factors (procedural scene corpus; pass --data-root for real photos,
    where ARI is skipped),
  * cluster-size balance,
  * the reference's own evaluate_clustering grids + a caption-swap demo.

Usage:
  python tools/cluster_quality_run.py --num-images 512 --out /tmp/clusterq
  python tools/cluster_quality_run.py --data-root /path/to/photos --out ...

Prints one JSON summary line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-images", type=int, default=512)
    p.add_argument("--data-root", default="",
                   help="real photo directory (recursive .jpg scan); "
                        "default: procedural scene corpus")
    p.add_argument("--photo-patches", action="store_true",
                   help="REAL-photograph patch corpus from the photos "
                        "bundled with sklearn/matplotlib (ARI vs source "
                        "photo + quadrant; data/synthetic.py)")
    p.add_argument("--max-images", type=int, default=2000)
    p.add_argument("--latent-dims", type=int, default=128)
    p.add_argument("--max-vocab-size", type=int, default=64)
    p.add_argument("--min-clusters", type=int, default=5)
    p.add_argument("--method", default="agglomerative_complete",
                   choices=["kmeans", "agglomerative_single_linkage",
                            "agglomerative_complete"])
    p.add_argument("--reducer", default="pca",
                   choices=["auto", "umap", "pca", "spectral", "tsne"],
                   help="umap = umap-learn if installed else the native "
                        "implementation (data/umap_native.py); auto = pca, "
                        "the measured real-photo default")
    p.add_argument("--embedder-weights", default="",
                   help="converted resnet18 msgpack "
                        "(tools/convert_torch_weights.py); default random init")
    p.add_argument("--out", default="cluster_quality")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def run(args):
    import numpy as np
    from sklearn.metrics import adjusted_rand_score, silhouette_score

    from attngan_tpu.data.clusterer import (
        HierarchicalClusterer,
        _reduce_dimensionality,
        determine_k_values,
    )
    from attngan_tpu.data.dataset import Dataset
    from attngan_tpu.models.resnet import ImageEmbedder

    factors = None
    if args.data_root:
        dataset = Dataset(args.data_root, max_images=args.max_images)
    elif args.photo_patches:
        from attngan_tpu.data.synthetic import make_photo_patch_dataset

        dataset, factors = make_photo_patch_dataset(args.num_images,
                                                    seed=args.seed)
    else:
        from attngan_tpu.data.synthetic import make_scene_dataset

        dataset, factors = make_scene_dataset(args.num_images, seed=args.seed)
    for rec in dataset.records:         # reset_captions_and_class_ids
        rec.caption, rec.class_id = [], None

    embedder = None
    if args.embedder_weights:
        from attngan_tpu.train.checkpoint import load_converted

        embedder = ImageEmbedder(variables=load_converted(args.embedder_weights))
    clusterer = HierarchicalClusterer(embedder=embedder)
    embeddings = clusterer.embed_dataset(dataset)
    x = embeddings
    if args.latent_dims < x.shape[1]:
        x = _reduce_dimensionality(x, args.latent_dims, args.reducer)

    # Cluster on the SAME reduced embedding the silhouette below is scored
    # against (x is already at latent_dims, so the clusterer's internal
    # reduction is a no-op) — stochastic reducers (spectral) would otherwise
    # produce labels from a different embedding than the one being scored.
    clusterer.cluster(dataset, latent_dims=args.latent_dims,
                      max_vocab_size=args.max_vocab_size,
                      min_clusters=args.min_clusters, method=args.method,
                      embeddings=x, reducer=args.reducer)

    k_values = determine_k_values(args.max_vocab_size, args.min_clusters)
    summary = {"n_images": len(dataset.records), "k_ladder": k_values,
               "method": args.method,
               "reducer": args.reducer,
               "levels": []}
    for level, k in enumerate(k_values):
        tokens = [rec.caption[level] for rec in dataset.records]
        labels = np.asarray([int(t.split("c")[1]) for t in tokens])
        sizes = np.bincount(labels)
        level_info = {
            "k": k,
            "silhouette": round(float(silhouette_score(x, labels)), 4),
            "size_max": int(sizes.max()), "size_min": int(sizes.min()),
        }
        if factors is not None:
            level_info["ari_vs_factors"] = {
                name: round(float(adjusted_rand_score(truth, labels)), 4)
                for name, truth in factors.items()}
        summary["levels"].append(level_info)

    os.makedirs(args.out, exist_ok=True)
    # the reference's own qualitative check: co-cluster grids for one image
    counts = dataset.evaluate_clustering(0, folder=args.out, max_images=36,
                                         nrow=6)
    summary["grid_member_counts"] = {str(k): v for k, v in counts.items()}

    # caption-swap demo (the controllability check, reference test.py:105-106)
    caps_path = os.path.join(args.out, "captions.json")
    dataset.save_captions_and_class_ids(caps_path)
    from attngan_tpu.data.captions import CaptionHandler

    handler = CaptionHandler(caps_path)
    pair = handler.get_captions([dataset.records[0].fpath,
                                 dataset.records[-1].fpath])
    swapped = handler.swap_captions([list(pair[0]), list(pair[1])], num=1)
    summary["caption_swap_demo"] = {"before": pair, "after": swapped}

    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    run(parse_args())
