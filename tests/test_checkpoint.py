"""Orbax checkpoint round-trip, config sidecar, exact resume."""

import jax
import jax.numpy as jnp
import numpy as np

from attngan_tpu.core.config import DamsmConfig
from attngan_tpu.train.checkpoint import (
    latest_checkpoint,
    load_config_sidecar,
    restore_checkpoint,
    save_checkpoint,
)
from attngan_tpu.train.damsm_trainer import DamsmTrainer

B, L, VOCAB = 4, 5, 30


def _trainer_and_state():
    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=B,
                      image_encoder="tiny", compute_dtype="")
    trainer = DamsmTrainer(cfg, vocab_size=VOCAB, seq_len=L, image_res=64)
    return cfg, trainer, trainer.init_state(seed=0)


def _batch(rng):
    return {
        "tokens": jnp.asarray(rng.integers(0, VOCAB, (B, L)), jnp.int32),
        "lengths": jnp.asarray([5, 3, 4, 2], jnp.int32),
        "class_ids": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "img256": jnp.asarray(rng.standard_normal((B, 64, 64, 3)), jnp.float32),
    }


def test_checkpoint_roundtrip_and_sidecar(tmp_path, rng):
    cfg, trainer, state = _trainer_and_state()
    batch = _batch(rng)
    state, _ = trainer.train_step(state, batch)
    host_state = jax.device_get(state)

    directory = str(tmp_path / "damsm")
    path = save_checkpoint(directory, host_state, int(state.step), cfg)
    assert latest_checkpoint(directory) == path
    sidecar = load_config_sidecar(directory)
    assert sidecar["emb_dim"] == 16 and sidecar["image_encoder"] == "tiny"

    template = trainer.init_state(seed=1)  # different values, same structure
    restored = restore_checkpoint(path, jax.device_get(template))

    def as_np(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        return np.asarray(x)

    for a, b in zip(jax.tree_util.tree_leaves(host_state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(as_np(a), as_np(b))


def test_resume_continues_exactly(tmp_path, rng):
    """Training N steps == training k, checkpoint, restore, train N-k
    (same batches; PRNG key lives in the state so trajectories align)."""
    _, trainer, state_a = _trainer_and_state()
    _, _, state_b = _trainer_and_state()
    batch = _batch(rng)

    for _ in range(4):
        state_a, metrics_a = trainer.train_step(state_a, batch)

    for _ in range(2):
        state_b, _ = trainer.train_step(state_b, batch)
    directory = str(tmp_path / "resume")
    path = save_checkpoint(directory, jax.device_get(state_b), 2)
    state_b2 = restore_checkpoint(path, jax.device_get(
        trainer.init_state(seed=9)))
    for _ in range(2):
        state_b2, metrics_b = trainer.train_step(state_b2, batch)

    np.testing.assert_allclose(float(metrics_a["loss"]),
                               float(metrics_b["loss"]), rtol=1e-5)
    assert int(state_b2.step) == int(state_a.step) == 4
