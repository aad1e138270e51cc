"""AOT serving artifacts (infer/export.py): the serialized StableHLO
program must reproduce the live Sampler, serve any batch size through a
symbolic batch dim, and round-trip through the file format with no model
code at the call site.

Reference being served: test.py:48-68 reconstructs networks + pickles
before it can generate; the artifact replaces all of that with one file.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from attngan_tpu.core.config import GanConfig
from attngan_tpu.infer.export import (
    ExportedSampler,
    export_sampler,
    save_exported_sampler,
)
from attngan_tpu.infer.sampler import Sampler
from attngan_tpu.train.gan_trainer import GanTrainer

VOCAB = 30


def _trainer_and_state(num_stages=2):
    cfg = GanConfig(gf_dim=8, df_dim=8, emb_dim=32, seq_len=4,
                    num_stages=num_stages, image_encoder="tiny",
                    compute_dtype="")
    trainer = GanTrainer(cfg, vocab_size=VOCAB)
    return trainer, trainer.init_state(seed=0)


def _tokens(rng, b, seq_len=4):
    tokens = jnp.asarray(rng.integers(1, VOCAB, (b, seq_len)), jnp.int32)
    lengths = jnp.asarray(rng.integers(1, seq_len + 1, (b,)), jnp.int32)
    return tokens, lengths


def test_export_roundtrip_matches_sampler(tmp_path, rng):
    trainer, state = _trainer_and_state()
    path = str(tmp_path / "sampler.stablehlo")
    n = save_exported_sampler(path, trainer, state, platforms=["cpu"])
    assert n > 0

    served = ExportedSampler(path)
    assert served.platforms == ("cpu",)
    tokens, lengths = _tokens(rng, 3)
    out = served(tokens, lengths, seed=7)
    res = 64 * 2 ** (trainer.cfg.num_stages - 1)
    assert out.shape == (3, res, res, 3)

    live = Sampler(trainer, state).generate_from_tokens(
        tokens, lengths, jax.random.key(np.uint32(7)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                               atol=1e-6, rtol=0)


def test_export_symbolic_batch_serves_any_size(tmp_path, rng):
    trainer, state = _trainer_and_state(num_stages=1)
    path = str(tmp_path / "sampler.stablehlo")
    save_exported_sampler(path, trainer, state, platforms=["cpu"])
    served = ExportedSampler(path)
    for b in (1, 2, 5):
        tokens, lengths = _tokens(rng, b)
        assert served(tokens, lengths).shape == (b, 64, 64, 3)


def test_export_fixed_batch_rejects_other_sizes(rng):
    trainer, state = _trainer_and_state(num_stages=1)
    exported = export_sampler(trainer, state, platforms=["cpu"],
                              batch_size=2)
    tokens, lengths = _tokens(rng, 2)
    assert exported.call(tokens, lengths, jnp.uint32(0)).shape == (
        2, 64, 64, 3)
    bad_tokens, bad_lengths = _tokens(rng, 3)
    with pytest.raises(ValueError):
        exported.call(bad_tokens, bad_lengths, jnp.uint32(0))


def test_export_seed_changes_noise_deterministically(tmp_path, rng):
    trainer, state = _trainer_and_state(num_stages=1)
    path = str(tmp_path / "sampler.stablehlo")
    save_exported_sampler(path, trainer, state, platforms=["cpu"])
    served = ExportedSampler(path)
    tokens, lengths = _tokens(rng, 2)
    a = np.asarray(served(tokens, lengths, seed=1))
    b = np.asarray(served(tokens, lengths, seed=2))
    a2 = np.asarray(served(tokens, lengths, seed=1))
    np.testing.assert_array_equal(a, a2)
    assert np.abs(a - b).max() > 1e-4


def test_export_int8_matches_live_int8_sampler(tmp_path, rng):
    """The int8 artifact must reproduce the live Int8Sampler exactly when
    calibrated on the same batch (same scales -> same quantized program),
    and still serve a symbolic batch."""
    from attngan_tpu.infer.export import save_exported_int8_sampler
    from attngan_tpu.infer.quantize import Int8Sampler

    trainer, state = _trainer_and_state(num_stages=1)
    calib_tokens, calib_lengths = _tokens(rng, 4)
    path = str(tmp_path / "sampler_int8.stablehlo")
    save_exported_int8_sampler(path, trainer, state, calib_tokens,
                               calib_lengths, platforms=["cpu"],
                               calib_seed=3)
    served = ExportedSampler(path)

    live = Int8Sampler(trainer, state)
    live.calibrate_on(calib_tokens, calib_lengths,
                      jax.random.key(np.uint32(3)))

    tokens, lengths = _tokens(rng, 2)
    out = served(tokens, lengths, seed=9)
    want = live.generate_from_tokens(tokens, lengths,
                                     jax.random.key(np.uint32(9)))
    assert out.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-6, rtol=0)
    # symbolic batch: a different request size through the same artifact
    tokens5, lengths5 = _tokens(rng, 5)
    assert served(tokens5, lengths5).shape == (5, 64, 64, 3)
