"""Orbax checkpoint round-trip, config sidecar, exact resume."""

import pytest
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

@pytest.mark.slow
def test_restore_inference_state_partial_and_single_trace(tmp_path, rng):
    """Serving-path regression (ROADMAP #8): restore_inference_state must
    (a) restore ONLY the sampling subtrees, as HOST numpy (one bulk
    device_put later — not 800 per-leaf device restores through the
    tunnel), (b) produce images identical to a full-state restore, and
    (c) the Sampler must compile its sample fn exactly ONCE across many
    calls with the restored state."""
    from attngan_tpu.core.config import GanConfig
    from attngan_tpu.infer.sampler import InferState, Sampler
    from attngan_tpu.train.checkpoint import restore_inference_state
    from attngan_tpu.train.gan_trainer import GanTrainer

    cfg = GanConfig(gf_dim=8, df_dim=8, emb_dim=32, seq_len=4, num_stages=2,
                    image_encoder="tiny", compute_dtype="")
    trainer = GanTrainer(cfg, vocab_size=VOCAB)
    state = trainer.init_state(seed=0)
    directory = str(tmp_path / "gan")
    path = save_checkpoint(directory, jax.device_get(state), 0, cfg)

    # (a) partial restore from an eval_shape template: no device arrays
    abstract = jax.eval_shape(lambda: trainer.init_state(seed=0))
    infer = restore_inference_state(path, abstract)
    assert isinstance(infer, InferState)
    for leaf in jax.tree_util.tree_leaves(infer):
        assert isinstance(leaf, np.ndarray), type(leaf)
    for got, want in ((infer.rnn_params, state.rnn_params),
                      (infer.gen_params, state.gen_params),
                      (infer.gen_stats, state.gen_stats)):
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_array_equal(a, np.asarray(b))

    # (b) identical images vs the full-state sampler
    tokens = jnp.asarray(rng.integers(0, VOCAB, (2, cfg.seq_len)), jnp.int32)
    lengths = jnp.full((2,), cfg.seq_len, jnp.int32)
    s_full = Sampler(trainer, state)
    s_part = Sampler(trainer, infer)
    img_full = s_full.generate_from_tokens(tokens, lengths, jax.random.key(0))
    img_part = s_part.generate_from_tokens(tokens, lengths, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(img_full), np.asarray(img_part))

    # (c) one trace across repeated calls with the restored state
    for i in range(4):
        s_part.generate_from_tokens(tokens, lengths, jax.random.key(i))
    assert s_part._sample_fn._cache_size() == 1
