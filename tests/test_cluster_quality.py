"""Clustering-quality harness plumbing (tools/cluster_quality_run.py).

Uses a stub embedder whose vectors encode the scene factors directly, so
the metric/grids/swap plumbing is verified fast and the ARI sanity bound is
meaningful (a real-embedder run is the tool's own job, not the suite's)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from attngan_tpu.data.synthetic import make_scene_dataset


class _FactorEmbedder:
    """Stands in for ResNet-18: emits factor one-hots + noise."""

    def __init__(self, factors):
        f = np.concatenate([
            np.eye(6)[factors["wall"]],
            np.eye(5)[factors["bed"]],
            np.eye(3)[factors["layout"]] * 0.3,
        ], axis=1)
        rng = np.random.default_rng(0)
        self._emb = (f * 4.0 + rng.normal(0, 0.05, f.shape)).astype(np.float32)
        self._next = 0

    def embed(self, images, batch_size=32):
        out = self._emb[self._next: self._next + len(images)]
        self._next += len(images)
        return out


def test_scene_dataset_factors():
    dataset, factors = make_scene_dataset(24, seed=1, res=64)
    assert len(dataset.records) == 24
    assert set(factors) == {"wall", "bed", "layout"}
    assert all(len(v) == 24 for v in factors.values())
    px = dataset.records[0].pixels
    assert px.shape == (64, 64, 3) and px.dtype == np.uint8


@pytest.mark.slow
def test_cluster_quality_run_summary(tmp_path, monkeypatch):
    from tools import cluster_quality_run as cq

    dataset, factors = make_scene_dataset(48, seed=0, res=64)

    import attngan_tpu.data.clusterer as clmod

    stub = _FactorEmbedder(factors)
    monkeypatch.setattr(
        clmod.HierarchicalClusterer, "embed_dataset",
        lambda self, ds, batch_size=32: stub.embed(ds.records))

    monkeypatch.setattr(
        sys, "argv",
        ["cluster_quality_run.py", "--num-images", "48",
         "--max-vocab-size", "16", "--latent-dims", "8",
         "--out", str(tmp_path)])
    # make the tool use OUR dataset + factors (num_images must match)
    monkeypatch.setattr(
        "attngan_tpu.data.synthetic.make_scene_dataset",
        lambda n, seed=0: (dataset, factors))
    summary = cq.run(cq.parse_args())

    assert summary["n_images"] == 48
    assert summary["k_ladder"] == [8]
    level = summary["levels"][0]
    # factor-encoding embeddings must cluster well above chance
    assert level["silhouette"] > 0.2
    assert max(level["ari_vs_factors"].values()) > 0.3
    assert (tmp_path / "captions.json").exists()
    assert summary["caption_swap_demo"]["before"][0] != \
        summary["caption_swap_demo"]["after"][0]
    grids = [f for f in os.listdir(tmp_path) if f.startswith("k-")]
    assert grids, "evaluate_clustering grids missing"


def test_photo_patch_dataset_real_photos():
    """Real-photograph patch corpus (round 3): built from the photos
    bundled in sklearn/matplotlib, deterministic per seed, with 'photo'
    and 'region' ground-truth factors."""
    from attngan_tpu.data.synthetic import (find_bundled_photos,
                                            make_photo_patch_dataset)

    photos = find_bundled_photos()
    assert len(photos) >= 2, f"bundled photos missing: {photos}"
    ds, factors = make_photo_patch_dataset(24, seed=3, res=64)
    assert len(ds.records) == 24
    assert set(factors) == {"photo", "region"}
    assert factors["photo"].max() < len(photos)
    px = ds.records[0].pixels
    assert px.shape == (64, 64, 3) and px.dtype == np.uint8
    # patches are real image content, not constant fills
    assert px.std() > 5
    ds2, f2 = make_photo_patch_dataset(24, seed=3, res=64)
    np.testing.assert_array_equal(ds.records[0].pixels, ds2.records[0].pixels)
    np.testing.assert_array_equal(factors["photo"], f2["photo"])


def test_make_photo_corpus_writes_scannable_jpgs(tmp_path):
    """tools/make_photo_corpus.py materializes the patch corpus as .jpg
    files that the product Dataset scan ingests (the three-phase pipeline's
    --data-root surface, docs/e2e_photos), with the factors sidecar."""
    import json
    import subprocess
    import sys

    out = tmp_path / "corpus"
    proc = subprocess.run(
        [sys.executable, "tools/make_photo_corpus.py", "--num-images", "8",
         "--out", str(out)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-1000:]
    jpgs = sorted(p.name for p in out.glob("*.jpg"))
    assert len(jpgs) == 8
    factors = json.loads((out / "factors.json").read_text())
    assert set(factors) == set(jpgs)

    from attngan_tpu.data.dataset import Dataset

    ds = Dataset(str(out), max_images=99, flip_augment=False)
    assert len(ds.records) == 8
    assert ds.records[0].pixels.shape == (256, 256, 3)
