"""End-to-end train-step tests on tiny shapes (reference SURVEY.md §4:
loss decreases, state updates, optimizers step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attngan_tpu.core.config import DamsmConfig, GanConfig
from attngan_tpu.train.damsm_trainer import DamsmTrainer
from attngan_tpu.train.gan_trainer import GanTrainer

B, L, VOCAB = 4, 5, 30


def _damsm_batch(rng, res=64):
    return {
        "tokens": jnp.asarray(rng.integers(0, VOCAB, (B, L)), jnp.int32),
        "lengths": jnp.asarray([5, 3, 4, 2], jnp.int32),
        "class_ids": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "img256": jnp.asarray(rng.standard_normal((B, res, res, 3)), jnp.float32) * 0.5,
    }


@pytest.fixture(scope="module")
def damsm_cfg():
    return DamsmConfig(emb_dim=32, text_emb_dim=16, batch_size=B,
                       image_encoder="tiny", compute_dtype="")


def test_damsm_step_decreases_loss(rng, damsm_cfg):
    trainer = DamsmTrainer(damsm_cfg, vocab_size=VOCAB, seq_len=L, image_res=64)
    state = trainer.init_state(seed=0)
    batch = _damsm_batch(rng)
    losses = []
    for _ in range(30):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"no improvement: {losses[0]} -> {losses[-1]}"
    assert int(state.step) == 30


def test_damsm_trunk_params_frozen(rng, damsm_cfg):
    trainer = DamsmTrainer(damsm_cfg, vocab_size=VOCAB, seq_len=L, image_res=64)
    state = trainer.init_state(seed=0)
    trunk_before = [np.asarray(x).copy()
                    for x in jax.tree_util.tree_leaves(state.cnn_trunk_params)]
    state, _ = trainer.train_step(state, _damsm_batch(rng))
    trunk_after = jax.tree_util.tree_leaves(state.cnn_trunk_params)
    for a, b in zip(trunk_before, trunk_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # heads and rnn DID move
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.rnn_params),
                        jax.tree_util.tree_leaves(
                            trainer.init_state(seed=0).rnn_params))
    )


def test_damsm_rnn_grad_clip(rng, damsm_cfg):
    trainer = DamsmTrainer(damsm_cfg, vocab_size=VOCAB, seq_len=L, image_res=64)
    state = trainer.init_state(seed=0)
    _, metrics = trainer.train_step(state, _damsm_batch(rng))
    assert np.isfinite(float(metrics["rnn_grad_norm"]))


def _gan_batch(rng, resolutions):
    batch = {
        "tokens": jnp.asarray(rng.integers(0, VOCAB, (B, L)), jnp.int32),
        "lengths": jnp.asarray([5, 3, 4, 2], jnp.int32),
        "class_ids": jnp.asarray([0, 1, 2, 3], jnp.int32),
    }
    for res in resolutions:
        batch[f"img{res}"] = jnp.asarray(
            np.tanh(rng.standard_normal((B, res, res, 3))), jnp.float32)
    return batch


@pytest.mark.parametrize("num_stages", [1, 2])
def test_gan_step_runs_and_updates(rng, num_stages):
    cfg = GanConfig(gf_dim=8, df_dim=8, emb_dim=32, cond_dim=8, z_dim=8,
                    seq_len=L, batch_size=B, num_stages=num_stages,
                    image_encoder="tiny", compute_dtype="")
    trainer = GanTrainer(cfg, vocab_size=VOCAB)
    state = trainer.init_state(seed=0)
    gen_before = jax.tree_util.tree_leaves(state.gen_params)
    gen_before = [np.asarray(g).copy() for g in gen_before]
    batch = _gan_batch(rng, cfg.resolutions)
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch)
    for key, val in metrics.items():
        assert np.isfinite(float(val)), f"{key} not finite"
    assert f"d_loss_{cfg.resolutions[-1]}" in metrics
    assert "kl_loss" in metrics
    gen_after = jax.tree_util.tree_leaves(state.gen_params)
    assert any(not np.allclose(a, np.asarray(b))
               for a, b in zip(gen_before, gen_after))
    assert int(state.step) == 3


@pytest.mark.slow
def test_gan_step_full_3stage_with_damsm(rng):
    """Full cascade incl. the DAMSM coupling on fake256 (train.py:138-145)."""
    cfg = GanConfig(gf_dim=4, df_dim=4, emb_dim=16, cond_dim=4, z_dim=4,
                    seq_len=L, batch_size=B, num_stages=3,
                    image_encoder="tiny", compute_dtype="")
    trainer = GanTrainer(cfg, vocab_size=VOCAB)
    state = trainer.init_state(seed=0)
    batch = _gan_batch(rng, cfg.resolutions)
    state, metrics = trainer.train_step(state, batch)
    assert "damsm_loss" in metrics
    for key, val in metrics.items():
        assert np.isfinite(float(val)), f"{key} not finite"


@pytest.mark.slow
def test_gan_step_reuse_gen_forward_parity(rng):
    """reuse_gen_forward=True (one jax.vjp'd generator forward, the
    reference's retained-graph semantics, train.py:119-145) must produce
    the same step as the recompute form: same noise + params + PRNG key
    means identical fakes, so every metric and updated parameter agrees to
    fp32 tolerance."""
    kw = dict(gf_dim=4, df_dim=4, emb_dim=16, cond_dim=4, z_dim=4,
              seq_len=L, batch_size=B, num_stages=3,
              image_encoder="tiny", compute_dtype="")
    batch = _gan_batch(rng, GanConfig(**kw).resolutions)
    states, metrics = [], []
    for reuse in (True, False):
        trainer = GanTrainer(GanConfig(reuse_gen_forward=reuse, **kw),
                             vocab_size=VOCAB)
        state = trainer.init_state(seed=0)
        state, m = trainer.train_step(state, batch)
        states.append(state)
        metrics.append(m)
    for key in metrics[0]:
        np.testing.assert_allclose(
            float(metrics[0][key]), float(metrics[1][key]),
            rtol=1e-5, atol=1e-6, err_msg=key)
    for a, b in zip(jax.tree_util.tree_leaves(states[0].gen_params),
                    jax.tree_util.tree_leaves(states[1].gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_gan_step_bf16_compute(rng):
    """bf16 compute dtype end to end (the TPU default) — catches dtype
    promotion bugs that fp32-only tests miss (e.g. fp32 accumulator outputs
    breaking conv VJPs)."""
    cfg = GanConfig(gf_dim=4, df_dim=4, emb_dim=16, cond_dim=4, z_dim=4,
                    seq_len=L, batch_size=B, num_stages=3,
                    image_encoder="tiny", compute_dtype="bfloat16")
    trainer = GanTrainer(cfg, vocab_size=VOCAB)
    state = trainer.init_state(seed=0)
    batch = _gan_batch(rng, cfg.resolutions)
    state, metrics = trainer.train_step(state, batch)
    for key, val in metrics.items():
        assert np.isfinite(float(val)), f"{key} not finite"


def test_damsm_step_bf16_compute(rng):
    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=B,
                      image_encoder="tiny", compute_dtype="bfloat16")
    trainer = DamsmTrainer(cfg, vocab_size=VOCAB, seq_len=L, image_res=64)
    state = trainer.init_state(seed=0)
    _, metrics = trainer.train_step(state, _damsm_batch(rng))
    assert np.isfinite(float(metrics["loss"]))


def test_gan_sampler(rng):
    from attngan_tpu.infer.sampler import Sampler

    cfg = GanConfig(gf_dim=4, df_dim=4, emb_dim=16, cond_dim=4, z_dim=4,
                    seq_len=L, batch_size=B, num_stages=2,
                    image_encoder="tiny", compute_dtype="")
    trainer = GanTrainer(cfg, vocab_size=VOCAB)
    state = trainer.init_state(seed=0)
    sampler = Sampler(trainer, state)
    tokens = jnp.asarray(rng.integers(0, VOCAB, (B, L)), jnp.int32)
    lengths = jnp.asarray([5, 3, 4, 2], jnp.int32)
    imgs = sampler.generate_from_tokens(tokens, lengths, jax.random.key(0))
    assert imgs.shape == (B, 128, 128, 3)
    arr = np.asarray(imgs)
    assert arr.min() >= 0.0 and arr.max() <= 1.0


def _make_bn_encoder():
    """A minimal encoder with the CNNEncoder param contract (trunk /
    emb_features / emb_cnn_code) whose trunk HAS a BatchNorm — TinyTrunk has
    none, so this is the cheap vehicle for the train-mode-BN quirk test."""
    import flax.linen as nn

    from attngan_tpu.ops.layers import TorchBatchNorm

    class BNTrunk(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(8, (3, 3), strides=4, padding=1)(x)
            x = TorchBatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            return x, jnp.mean(x, axis=(1, 2))

    class BNEncoder(nn.Module):
        out_dim: int = 8

        @nn.nowrap
        def make_trunk(self):
            return BNTrunk()

        @nn.compact
        def __call__(self, x, train: bool = False):
            regions, pooled = BNTrunk(name="trunk")(x, train)
            regions = nn.Conv(self.out_dim, (1, 1), use_bias=False,
                              name="emb_features")(regions)
            code = nn.Dense(self.out_dim, name="emb_cnn_code")(pooled)
            b = regions.shape[0]
            return regions.reshape(b, -1, self.out_dim), code

    return BNEncoder()


def test_trunk_train_mode_bn_quirk(rng):
    """DamsmConfig.trunk_train_mode_bn reproduces the reference quirk: the
    frozen image trunk is never put in eval() (no eval call anywhere in
    reference pretrain_damsm.py:59-73), so its BN normalizes with BATCH
    statistics and keeps updating the running averages. Asserts (a) the flag
    changes the loss, (b) running stats update exactly as a manual
    train-mode apply does, (c) the default leaves stats untouched."""
    import dataclasses

    base = DamsmConfig(emb_dim=8, text_emb_dim=8, batch_size=B,
                       image_encoder="tiny", compute_dtype="")
    batch = _damsm_batch(rng, res=32)

    def build(flag):
        cfg = dataclasses.replace(base, trunk_train_mode_bn=flag)
        trainer = DamsmTrainer(cfg, vocab_size=VOCAB, seq_len=L, image_res=32)
        trainer.cnn = _make_bn_encoder()
        state = trainer.init_state(seed=0)
        return trainer, state

    t_eval, s_eval = build(False)
    t_quirk, s_quirk = build(True)
    stats_before = jax.device_get(s_quirk.cnn_stats)
    params_merged = {**s_quirk.cnn_trunk_params, **s_quirk.cnn_head_params}
    _, expected_mut = t_quirk.cnn.apply(
        {"params": params_merged, "batch_stats": stats_before},
        batch["img256"], train=True, mutable=["batch_stats"])

    s_eval2, m_eval = t_eval.train_step(s_eval, batch)
    s_quirk2, m_quirk = t_quirk.train_step(s_quirk, batch)

    # (a) quirk changes the forward numerics (batch stats vs fresh running stats)
    assert abs(float(m_eval["loss"]) - float(m_quirk["loss"])) > 1e-6
    # (b) quirk updates running stats exactly like a train-mode apply
    for got, want in zip(
            jax.tree_util.tree_leaves(s_quirk2.cnn_stats),
            jax.tree_util.tree_leaves(expected_mut["batch_stats"])):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)
    # stats actually moved
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree_util.tree_leaves(stats_before),
                               jax.tree_util.tree_leaves(s_quirk2.cnn_stats)))
    # (c) default (eval-mode trunk) leaves stats untouched
    for a, b in zip(jax.tree_util.tree_leaves(stats_before),
                    jax.tree_util.tree_leaves(s_eval2.cnn_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cache_features_rejects_train_mode_bn():
    import dataclasses

    import pytest

    cfg = dataclasses.replace(
        DamsmConfig(emb_dim=8, text_emb_dim=8, batch_size=B,
                    image_encoder="tiny", compute_dtype=""),
        cache_region_features=True, trunk_train_mode_bn=True)
    with pytest.raises(ValueError, match="step-invariant"):
        DamsmTrainer(cfg, vocab_size=VOCAB, seq_len=L, image_res=32)


def test_damsm_superbatch_exact_parity(rng):
    """cfg.superbatch=K must be EXACTLY K sequential plain steps: one
    frozen eval-mode trunk forward at K*B cannot change per-image features,
    and the scan body replays the same key-split/loss/clip/Adam sequence
    (damsm_trainer._damsm_step_super)."""
    k = 3
    cfg = DamsmConfig(emb_dim=32, text_emb_dim=16, batch_size=B,
                      image_encoder="tiny", compute_dtype="")
    cfg_super = DamsmConfig(emb_dim=32, text_emb_dim=16, batch_size=B,
                            image_encoder="tiny", compute_dtype="",
                            superbatch=k)
    plain = DamsmTrainer(cfg, vocab_size=VOCAB, seq_len=L, image_res=64)
    superb = DamsmTrainer(cfg_super, vocab_size=VOCAB, seq_len=L, image_res=64)
    state_p = plain.init_state(seed=0)
    state_s = superb.init_state(seed=0)

    batches = []
    for i in range(k):
        r = np.random.default_rng(100 + i)
        batches.append({
            "tokens": jnp.asarray(r.integers(0, VOCAB, (B, L)), jnp.int32),
            "lengths": jnp.asarray(r.integers(2, L + 1, (B,)), jnp.int32),
            "class_ids": jnp.asarray(np.arange(B), jnp.int32),
            "img256": jnp.asarray(
                r.standard_normal((B, 64, 64, 3)), jnp.float32) * 0.5,
        })

    losses_p = []
    for b in batches:
        state_p, metrics = plain.train_step(state_p, b)
        losses_p.append(float(metrics["loss"]))

    superbatch = {key: jnp.concatenate([b[key] for b in batches], axis=0)
                  for key in batches[0]}
    state_s, metrics_s = superb.train_step_super(state_s, superbatch)

    assert metrics_s["loss"].shape == (k,)
    np.testing.assert_allclose(np.asarray(metrics_s["loss"]), losses_p,
                               rtol=1e-5)
    assert int(state_s.step) == k == int(state_p.step)
    for a, b_ in zip(jax.tree_util.tree_leaves(state_p.rnn_params),
                     jax.tree_util.tree_leaves(state_s.rnn_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(state_p.cnn_head_params),
                     jax.tree_util.tree_leaves(state_s.cnn_head_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-6)


def test_damsm_superbatch_rejects_train_mode_bn():
    with pytest.raises(ValueError, match="superbatch"):
        DamsmTrainer(
            DamsmConfig(emb_dim=32, text_emb_dim=16, batch_size=B,
                        image_encoder="tiny", compute_dtype="",
                        superbatch=2, trunk_train_mode_bn=True),
            vocab_size=VOCAB, seq_len=L, image_res=64)


def test_damsm_superbatch_rejects_wrong_rows(rng):
    cfg = DamsmConfig(emb_dim=32, text_emb_dim=16, batch_size=B,
                      image_encoder="tiny", compute_dtype="", superbatch=2)
    trainer = DamsmTrainer(cfg, vocab_size=VOCAB, seq_len=L, image_res=64)
    state = trainer.init_state(seed=0)
    with pytest.raises(ValueError, match="rows"):
        trainer.train_step_super(state, _damsm_batch(rng))  # B, not 2*B
