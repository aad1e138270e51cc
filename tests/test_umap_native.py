"""Native UMAP implementation (attngan_tpu/data/umap_native.py).

The reference's clustering captioner reduces embeddings with UMAP
(reference data/bedrooms.py:274-276); umap-learn is absent here, so the
algorithm is implemented natively. These tests validate it the way the
quality harness validates reducers: structure recovery (ARI on separable
blobs), calibration math (smooth-kNN row sums), and determinism.
"""

import numpy as np
import pytest

from attngan_tpu.data import clusterer as clusterer_mod
from attngan_tpu.data.umap_native import (
    find_ab_params,
    fuzzy_simplicial_set,
    smooth_knn_dist,
    umap_embed,
)


def _blobs(n_per=60, dims=64, n_blobs=4, sep=8.0, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_blobs, dims)) * sep
    x = np.concatenate(
        [c + rng.normal(size=(n_per, dims)) for c in centers], axis=0
    )
    y = np.repeat(np.arange(n_blobs), n_per)
    return x, y


def test_smooth_knn_row_sums_hit_log2k():
    x, _ = _blobs()
    from attngan_tpu.data.umap_native import _knn

    k = 15
    _, dists = _knn(x, k)
    sigma, rho = smooth_knn_dist(dists, k)
    psum = np.exp(
        -np.maximum(dists - rho[:, None], 0.0) / sigma[:, None]
    ).sum(axis=1)
    np.testing.assert_allclose(psum, np.log2(k), rtol=1e-3)
    assert np.all(sigma > 0)
    assert np.all(rho >= 0)


def test_fuzzy_graph_is_symmetric_unit_bounded():
    from scipy.sparse import coo_matrix

    x, _ = _blobs(n_per=40, n_blobs=3)
    rows, cols, vals = fuzzy_simplicial_set(x, 10)
    assert np.all(vals > 0) and np.all(vals <= 1.0 + 1e-9)
    n = x.shape[0]
    g = coo_matrix((vals, (rows, cols)), shape=(n, n)).toarray()
    np.testing.assert_allclose(g, g.T, atol=1e-12)


def test_ab_params_match_umap_learn_defaults():
    # umap-learn's documented values for spread=1.0, min_dist=0.1:
    # a ~= 1.577, b ~= 0.8951
    a, b = find_ab_params(1.0, 0.1)
    assert abs(a - 1.577) < 0.05
    assert abs(b - 0.8951) < 0.02


def test_embedding_recovers_blob_structure():
    from sklearn.cluster import KMeans
    from sklearn.metrics import adjusted_rand_score

    x, y = _blobs()
    emb = umap_embed(x, n_components=2, random_state=0)
    assert emb.shape == (x.shape[0], 2)
    assert np.all(np.isfinite(emb))
    labels = KMeans(n_clusters=4, n_init=10, random_state=0).fit(emb).labels_
    ari = adjusted_rand_score(y, labels)
    assert ari > 0.95, f"blob ARI through native UMAP too low: {ari}"


def test_embedding_deterministic_given_seed():
    x, _ = _blobs(n_per=30, n_blobs=3)
    e1 = umap_embed(x, n_components=2, random_state=7, n_epochs=100)
    e2 = umap_embed(x, n_components=2, random_state=7, n_epochs=100)
    np.testing.assert_array_equal(e1, e2)


def test_too_few_samples_raises():
    with pytest.raises(ValueError):
        umap_embed(np.zeros((3, 8)), n_components=2)


def test_clusterer_reducer_umap_routes_to_native(monkeypatch):
    """With umap-learn absent, reducer='umap' must use the native
    implementation instead of raising (clusterer.py dispatch)."""
    import builtins

    real_import = builtins.__import__

    def no_umap(name, *args, **kwargs):
        if name == "umap" or name.startswith("umap."):
            raise ImportError("umap-learn not installed")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", no_umap)
    x, y = _blobs(n_per=30, dims=32, n_blobs=3)
    out = clusterer_mod._reduce_dimensionality(x, 2, reducer="umap")
    assert out.shape == (x.shape[0], 2)

    from sklearn.cluster import KMeans
    from sklearn.metrics import adjusted_rand_score

    labels = KMeans(n_clusters=3, n_init=10, random_state=0).fit(out).labels_
    assert adjusted_rand_score(y, labels) > 0.9
