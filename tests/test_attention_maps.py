"""DAMSM attention-map population (reference's commented-out
populate_attnmaps, pretrain_damsm.py:85-107)."""

import os

from attngan_tpu.core.config import DamsmConfig
from attngan_tpu.data.synthetic import make_synthetic_dataset
from attngan_tpu.train.damsm_trainer import DamsmTrainer


def test_populate_attention_maps(tmp_path):
    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=4,
                      image_encoder="tiny", compute_dtype="")
    ds = make_synthetic_dataset(num_images=8, num_classes=2, res=64)
    ds.build_vocab()
    trainer = DamsmTrainer(cfg, vocab_size=ds.vocab.n_words,
                           seq_len=ds.max_seqlen, image_res=64)
    state = trainer.init_state(seed=0)
    written = trainer.populate_attention_maps(state, ds,
                                              folder=str(tmp_path), limit=5)
    assert written == 5
    files = sorted(os.listdir(tmp_path))
    assert files == [f"attn_{i:06d}.png" for i in range(5)]


def test_iter_attention_maps_yields_host_maps():
    """The generator form (the reference-comparable 'maps to host' unit,
    benchmarked by tools/attnmaps_bench.py) must yield one (L, side, side)
    float numpy map per image, normalized per-word over regions."""
    import numpy as np

    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=4,
                      image_encoder="tiny", compute_dtype="")
    ds = make_synthetic_dataset(num_images=8, num_classes=2, res=64)
    ds.build_vocab()
    trainer = DamsmTrainer(cfg, vocab_size=ds.vocab.n_words,
                           seq_len=ds.max_seqlen, image_res=64)
    state = trainer.init_state(seed=0)
    maps = list(trainer.iter_attention_maps(state, ds, limit=6))
    assert len(maps) == 6
    for m in maps:
        assert isinstance(m, np.ndarray) and m.ndim == 3
        assert m.shape[0] == ds.max_seqlen
        assert m.shape[1] == m.shape[2]
        # softmax over regions for each real word sums to 1
        np.testing.assert_allclose(m.reshape(m.shape[0], -1).sum(-1)[:1],
                                   1.0, rtol=1e-4)
