"""Hierarchical clustering pseudo-caption synthesis.

Reference: data/bedrooms.py:241-304 (HierarchicalClusterer). Captions are
SYNTHESIZED, not human-written: every image is embedded (frozen ResNet-18,
TPU forward), optionally reduced to latent_dims, then clustered at an
ascending ladder of k values (coarse -> fine); each level appends a token
``k{k}c{c}`` to the image's caption, and the finest clustering assigns the
class_id used by the DAMSM mismatch masks.

Reducers: the reference reduces with UMAP (bedrooms.py:274-276).
``reducer='umap'`` uses umap-learn if installed, else the NATIVE UMAP
implementation in attngan_tpu/data/umap_native.py (same algorithm from the
paper's math). ``'auto'`` resolves to pca — the measured, deterministic
default on real photographs (docs/cluster_quality_photos/: pca beats every
nonlinear reducer's ARI there, UMAP included). sklearn SpectralEmbedding
and t-SNE remain as alternates. Reducer impact on cluster quality is
measurable with tools/cluster_quality_run.py (ARI vs known factors).
sklearn's AgglomerativeClustering dropped the ``affinity`` kwarg in favor
of ``metric`` — handled for both API generations.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from attngan_tpu.data.dataset import Dataset, preprocess_pyramid


def determine_k_values(max_vocab_size: int, min_k: int = 5) -> List[int]:
    """k ladder: max//2, max//4, ... > min_k, ascending (bedrooms.py:291-304)."""
    ks, factor = [], 2
    k = max_vocab_size // factor
    while k > min_k:
        ks.append(k)
        factor *= 2
        k = max_vocab_size // factor
    return list(reversed(ks))


def _make_cluster_labels(x: np.ndarray, k: int, method: str) -> List[str]:
    from sklearn.cluster import AgglomerativeClustering, KMeans

    if method == "kmeans":
        clusterer = KMeans(n_clusters=k, n_init=10)
    elif method in ("agglomerative_single_linkage", "agglomerative_complete"):
        linkage = "single" if "single" in method else "complete"
        try:
            clusterer = AgglomerativeClustering(
                n_clusters=k, metric="cosine", linkage=linkage
            )
        except TypeError:  # older sklearn uses affinity=
            clusterer = AgglomerativeClustering(
                n_clusters=k, affinity="cosine", linkage=linkage
            )
    else:
        raise ValueError(f"unknown clustering method {method!r}")
    labels = clusterer.fit(x).labels_.tolist()
    return [f"k{k}c{c}" for c in labels]


def _reduce_dimensionality(x: np.ndarray, outdims: int,
                           reducer: str = "auto") -> np.ndarray:
    """reducer: 'umap' (the reference's choice — umap-learn if installed,
    else the native implementation in umap_native.py), 'pca', 'spectral'
    (neighbor-graph nonlinear embedding), 'tsne' (capped at 3 components
    by sklearn's barnes-hut), or 'auto' = pca: the measured, deterministic
    default on real photographs (docs/cluster_quality_photos/ — pca beats
    every nonlinear reducer's ARI there, including UMAP itself)."""
    if reducer == "auto":
        # Visible at run time, not only in --help: 'auto' diverges from the
        # reference's UMAP default (bedrooms.py:274-276) by measurement.
        print("reducer 'auto' -> pca (measured best ARI on real photos, "
              "docs/cluster_quality_photos/; pass --reducer umap for "
              "reference parity)")
        reducer = "pca"
    if reducer == "umap":
        try:
            from umap import UMAP  # reference reducer (bedrooms.py:274-276)

            return UMAP(n_components=outdims).fit_transform(x)
        except ImportError:
            # umap-learn absent: use the native implementation of the
            # same algorithm (attngan_tpu/data/umap_native.py).
            from attngan_tpu.data.umap_native import umap_embed

            return umap_embed(x, n_components=outdims)
    if reducer == "tsne":
        from sklearn.manifold import TSNE

        n = x.shape[0]
        if outdims > 3:  # barnes-hut supports <= 3 components
            print(f"tsne: clamping latent dims {outdims} -> 3 (sklearn "
                  "barnes-hut limit); downstream k-ladder clustering runs "
                  "on the 3-dim embedding")
        outdims = min(outdims, 3)
        return TSNE(n_components=outdims, init="pca",
                    perplexity=min(30.0, max(2.0, (n - 1) / 3.0)),
                    random_state=0).fit_transform(x)
    if reducer == "spectral":
        from sklearn.manifold import SpectralEmbedding

        outdims = min(outdims, x.shape[0] - 2)
        return SpectralEmbedding(
            n_components=outdims,
            n_neighbors=min(15, x.shape[0] - 1)).fit_transform(x)
    if reducer == "pca":
        from sklearn.decomposition import PCA

        outdims = min(outdims, min(x.shape))
        return PCA(n_components=outdims).fit_transform(x)
    raise ValueError(f"unknown reducer {reducer!r}")


class HierarchicalClusterer:
    def __init__(self, embedder=None):
        if embedder is None:
            from attngan_tpu.models.resnet import ImageEmbedder

            embedder = ImageEmbedder()
        self.embedder = embedder

    def embed_dataset(self, dataset: Dataset, batch_size: int = 32) -> np.ndarray:
        """Normalized img256 forward through the frozen embedder on device."""
        import jax.numpy as jnp

        embs = []
        recs = dataset.records
        for start in range(0, len(recs), batch_size):
            chunk = recs[start : start + batch_size]
            # _batch_pixels: streams decode-on-demand for StreamingDataset,
            # so the captioner runs at corpus scale in bounded host memory
            pixels = dataset._batch_pixels(chunk)
            flip = np.asarray([r.flip for r in chunk], bool)
            img256 = preprocess_pyramid(jnp.asarray(pixels), jnp.asarray(flip))[256]
            embs.append(self.embedder.embed(np.asarray(img256), batch_size))
        return np.concatenate(embs, axis=0)

    def cluster(
        self,
        dataset: Dataset,
        latent_dims: int = 128,
        max_vocab_size: int = 1000,
        min_clusters: int = 5,
        batch_size: int = 32,
        method: str = "agglomerative_complete",
        embeddings: Optional[np.ndarray] = None,
        reducer: str = "auto",
    ) -> None:
        """In-place: appends caption tokens and assigns class_ids
        (reference bedrooms.py:248-271)."""
        if embeddings is None:
            embeddings = self.embed_dataset(dataset, batch_size)
        x = embeddings
        if latent_dims < x.shape[1]:
            x = _reduce_dimensionality(x, latent_dims, reducer)
        labels = None
        for k in determine_k_values(max_vocab_size, min_clusters):
            labels = _make_cluster_labels(x, k, method)
            for rec, label in zip(dataset.records, labels):
                rec.caption.append(label)
        assert labels is not None, "max_vocab_size too small for any k level"
        id_map = {lab: i for i, lab in enumerate(sorted(set(labels)))}
        for rec, label in zip(dataset.records, labels):
            rec.class_id = id_map[label]
