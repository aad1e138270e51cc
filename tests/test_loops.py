"""Host-loop integration: run both training phases end to end at tiny scale
(the CPU analogue of BASELINE configs[0-3]) and check the artifacts."""

import os

import numpy as np
import pytest

from attngan_tpu.core.config import DamsmConfig, GanConfig, RunConfig
from attngan_tpu.data.synthetic import make_synthetic_dataset
from attngan_tpu.train.loops import run_damsm_training, run_gan_training


@pytest.fixture
def run_cfg(tmp_path):
    return RunConfig(seed=0, checkpoint_dir=str(tmp_path / "ckpt"),
                     image_dir=str(tmp_path / "img"), log_every=1000)


@pytest.mark.slow
def test_damsm_loop_end_to_end(tmp_path, run_cfg):
    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=4, epochs=2,
                      image_encoder="tiny", compute_dtype="")
    ds = make_synthetic_dataset(num_images=8, num_classes=2, res=64)
    trainer, state, history = run_damsm_training(cfg, run_cfg, ds)
    assert len(history) == 4  # 2 batches/epoch x 2 epochs
    assert np.all(np.isfinite(history))
    assert int(state.step) == 4
    ckpts = os.listdir(os.path.join(run_cfg.checkpoint_dir, "damsm"))
    assert any(c.startswith("step_") for c in ckpts)
    assert "config.json" in ckpts
    assert os.path.exists(os.path.join(run_cfg.image_dir,
                                       "epoch_2-damsm_loss.png"))


def test_damsm_resume_continues_epoch_numbering(tmp_path, run_cfg):
    """--epochs is the run's TOTAL epoch count under --resume: resuming at
    the same total is a no-op, and a larger total continues the original
    epoch numbering (snapshots named epoch_2, not a second epoch_1)."""
    import dataclasses

    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=4, epochs=1,
                      image_encoder="tiny", compute_dtype="")
    ds = make_synthetic_dataset(num_images=8, num_classes=2, res=64)
    _, state, _ = run_damsm_training(cfg, run_cfg, ds)

    _, state_noop, h_noop = run_damsm_training(cfg, run_cfg, ds, resume=True)
    assert int(state_noop.step) == int(state.step) and not h_noop

    cfg2 = dataclasses.replace(cfg, epochs=2)
    _, state2, _ = run_damsm_training(cfg2, run_cfg, ds, resume=True)
    assert int(state2.step) == 2 * int(state.step)
    assert os.path.exists(os.path.join(run_cfg.image_dir,
                                       "epoch_2-damsm_loss.png"))


def test_final_epoch_always_checkpointed(tmp_path):
    """epochs=3 with --checkpoint-every-epochs 2: without the final-epoch
    save, epoch 3 trains and is silently discarded — the latest snapshot
    must carry the full run's step count."""
    from attngan_tpu.train.checkpoint import (latest_checkpoint,
                                              load_progress_sidecar)

    run_cfg = RunConfig(seed=0, checkpoint_dir=str(tmp_path / "ckpt"),
                        image_dir=str(tmp_path / "img"), log_every=1000,
                        checkpoint_every_epochs=2)
    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=4, epochs=3,
                      image_encoder="tiny", compute_dtype="")
    ds = make_synthetic_dataset(num_images=8, num_classes=2, res=64)
    _, state, _ = run_damsm_training(cfg, run_cfg, ds)
    damsm_dir = os.path.join(run_cfg.checkpoint_dir, "damsm")
    ckpt = latest_checkpoint(damsm_dir)
    assert ckpt is not None
    assert int(os.path.basename(ckpt).split("_")[1]) == int(state.step)
    assert load_progress_sidecar(damsm_dir) == 3


def test_damsm_loop_cached_features(tmp_path, run_cfg):
    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=4, epochs=1,
                      image_encoder="tiny", compute_dtype="",
                      cache_region_features=True)
    ds = make_synthetic_dataset(num_images=8, num_classes=2, res=64)
    _, state, history = run_damsm_training(cfg, run_cfg, ds)
    assert len(history) == 2 and np.all(np.isfinite(history))


def test_damsm_loop_superbatch(tmp_path, run_cfg):
    """cfg.superbatch=2 through the host loop: 4 batches/epoch group into
    2 superbatch steps whose per-chunk metrics unroll back into a per-step
    history identical in length to the plain loop's."""
    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=2, epochs=1,
                      image_encoder="tiny", compute_dtype="", superbatch=2)
    ds = make_synthetic_dataset(num_images=8, num_classes=2, res=64)
    _, state, history = run_damsm_training(cfg, run_cfg, ds)
    assert len(history) == 4  # 4 B-batches -> 2 superbatches -> 4 steps
    assert np.all(np.isfinite(history))
    assert int(state.step) == 4


@pytest.mark.slow
def test_gan_loop_end_to_end(tmp_path, run_cfg):
    cfg = GanConfig(gf_dim=4, df_dim=4, emb_dim=16, cond_dim=4, z_dim=4,
                    seq_len=4, batch_size=4, epochs=1, num_stages=2,
                    image_encoder="tiny", compute_dtype="")
    ds = make_synthetic_dataset(num_images=8, num_classes=2, res=128)
    trainer, state, losses = run_gan_training(cfg, run_cfg, ds)
    assert losses["g_total"] and np.all(np.isfinite(losses["g_total"]))
    assert os.path.exists(os.path.join(run_cfg.image_dir,
                                       "epoch_1-128x128.png"))
    ckpt_dir = os.path.join(run_cfg.checkpoint_dir, "gan")
    assert any(c.startswith("step_") for c in os.listdir(ckpt_dir))

    # resume with the SAME total --epochs: epoch 1 is already done, so
    # nothing trains and the restored step is unchanged
    _, state_noop, _ = run_gan_training(cfg, run_cfg, ds, resume=True)
    assert int(state_noop.step) == int(state.step)

    # resume toward a larger total: continues at epoch 2 (numbering
    # continues — the snapshot is epoch_2, not a second epoch_1)
    import dataclasses
    cfg2 = dataclasses.replace(cfg, epochs=2)
    _, state2, _ = run_gan_training(cfg2, run_cfg, ds, resume=True)
    assert int(state2.step) == 2 * int(state.step)  # one more epoch ran
    assert os.path.exists(os.path.join(run_cfg.image_dir,
                                       "epoch_2-128x128.png"))
