"""Imaging utilities (reference trainer.py plotting surface)."""

import numpy as np

from attngan_tpu.utils.imaging import (
    image_grid,
    moving_average,
    plot_history,
    save_attention_maps,
    save_image,
)


def test_moving_average_matches_reference_semantics():
    # reference trainer.py:55-63: simple sliding mean, stride 1
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    np.testing.assert_allclose(moving_average(vals, 2), [1.5, 2.5, 3.5, 4.5])
    np.testing.assert_allclose(moving_average(vals, 5), [3.0])
    # shorter than window -> passthrough
    np.testing.assert_allclose(moving_average([1.0, 2.0], 5), [1.0, 2.0])


def test_image_grid_layout(rng):
    imgs = rng.random((5, 4, 4, 3)).astype(np.float32)
    grid = image_grid(imgs, nrow=2)
    assert grid.shape == (2 * 4, 3 * 4, 3)  # 2 rows x ceil(5/2)=3 cols
    np.testing.assert_allclose(grid[:4, :4], imgs[0])
    np.testing.assert_allclose(grid[4:, :4], imgs[3])
    # unfilled cell is zero
    np.testing.assert_allclose(grid[4:, 8:], 0.0)


def test_save_image_and_plots(tmp_path, rng):
    save_image(rng.random((8, 8, 3)).astype(np.float32),
               str(tmp_path / "img.png"))
    assert (tmp_path / "img.png").exists()
    plot_history([[1.0] * 10, [2.0] * 10], str(tmp_path / "loss.png"),
                 window=3)
    assert (tmp_path / "loss.png").exists()
    save_attention_maps(rng.random((4, 5, 5)).astype(np.float32),
                        str(tmp_path / "attn.png"))
    assert (tmp_path / "attn.png").exists()


def test_sampler_from_captions(tmp_path, rng):
    """End-to-end caption -> image through CaptionHandler + Sampler."""
    import json

    import jax

    from attngan_tpu.core.config import GanConfig
    from attngan_tpu.data.captions import CaptionHandler
    from attngan_tpu.infer.sampler import Sampler
    from attngan_tpu.train.gan_trainer import GanTrainer

    mapping = {"img_one.jpg": [["k2c0", "k4c1"], 0],
               "img_two.jpg": [["k2c1", "k4c3"], 1]}
    path = tmp_path / "caps.json"
    path.write_text(json.dumps(mapping))
    handler = CaptionHandler(str(path))

    cfg = GanConfig(gf_dim=4, df_dim=4, emb_dim=16, cond_dim=4, z_dim=4,
                    seq_len=4, batch_size=2, num_stages=1,
                    image_encoder="tiny", compute_dtype="")
    trainer = GanTrainer(cfg, vocab_size=handler.vocab_size)
    state = trainer.init_state(seed=0)
    sampler = Sampler(trainer, state, caption_handler=handler)
    imgs = sampler.generate_from_captions(
        handler.get_captions(["img_one", "img_two"]))
    assert imgs.shape == (2, 64, 64, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
