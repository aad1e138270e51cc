"""Data-parallel sharding over the forced 8-device CPU mesh (SURVEY.md §2.5:
the reference is single-GPU; DP over ICI is first-class here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attngan_tpu.core.config import DamsmConfig, GanConfig
from attngan_tpu.parallel import make_mesh, replicate, shard_batch
from attngan_tpu.train.damsm_trainer import DamsmTrainer
from attngan_tpu.train.gan_trainer import GanTrainer

B, L, VOCAB = 16, 5, 30  # global batch 16 over 8 devices


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def _batch(rng, keys):
    batch = {
        "tokens": jnp.asarray(rng.integers(0, VOCAB, (B, L)), jnp.int32),
        "lengths": jnp.asarray(rng.integers(2, L + 1, (B,)), jnp.int32),
        "class_ids": jnp.asarray(np.arange(B) % 4, jnp.int32),
    }
    for key in keys:
        res = int(key[3:])
        batch[key] = jnp.asarray(
            np.tanh(rng.standard_normal((B, res, res, 3))), jnp.float32)
    return batch


def test_damsm_step_sharded_matches_single_device(rng):
    """The sharded step must produce the same loss as the unsharded one —
    the global BxB similarity all-gather is handled by SPMD."""
    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=B,
                      image_encoder="tiny", compute_dtype="")
    trainer = DamsmTrainer(cfg, vocab_size=VOCAB, seq_len=L, image_res=64)
    state = trainer.init_state(seed=0)
    batch = _batch(rng, ["img256"])

    _, metrics_single = trainer.train_step(
        jax.tree_util.tree_map(jnp.copy, state),
        jax.tree_util.tree_map(jnp.copy, batch))

    mesh = make_mesh()
    sharded_state = replicate(jax.tree_util.tree_map(jnp.copy, state), mesh)
    sharded_batch = shard_batch(jax.tree_util.tree_map(jnp.copy, batch), mesh)
    new_state, metrics_sharded = trainer.train_step(sharded_state, sharded_batch)

    np.testing.assert_allclose(float(metrics_single["loss"]),
                               float(metrics_sharded["loss"]),
                               rtol=1e-4)
    assert int(new_state.step) == 1


def test_damsm_trainer_with_explicit_collective_loss(rng):
    """DamsmTrainer(mesh=...) routes through the shard_map loss and matches
    the single-device trainer's loss trajectory."""
    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=B,
                      image_encoder="tiny", compute_dtype="")
    mesh = make_mesh()
    trainer_ref = DamsmTrainer(cfg, vocab_size=VOCAB, seq_len=L, image_res=64)
    trainer_sh = DamsmTrainer(cfg, vocab_size=VOCAB, seq_len=L, image_res=64,
                              mesh=mesh)
    assert trainer_sh.sharded_loss is not None
    state_ref = trainer_ref.init_state(seed=0)
    state_sh = replicate(trainer_sh.init_state(seed=0), mesh)
    batch = _batch(rng, ["img256"])
    sharded_batch = shard_batch(jax.tree_util.tree_map(jnp.copy, batch), mesh)

    losses_ref, losses_sh = [], []
    for _ in range(3):
        state_ref, m_ref = trainer_ref.train_step(state_ref, batch)
        state_sh, m_sh = trainer_sh.train_step(state_sh, sharded_batch)
        losses_ref.append(float(m_ref["loss"]))
        losses_sh.append(float(m_sh["loss"]))
    np.testing.assert_allclose(losses_ref, losses_sh, rtol=1e-4)


def _gan_cfg():
    return GanConfig(gf_dim=4, df_dim=4, emb_dim=16, cond_dim=4, z_dim=4,
                     seq_len=L, batch_size=B, num_stages=2,
                     image_encoder="tiny", compute_dtype="")


@pytest.mark.slow
def test_gan_step_sharded_matches_single_device(rng):
    """8-device GAN step == single-device step at the same global batch.
    BN policy: under jit-SPMD the batch-axis mean/var reduce over the GLOBAL
    batch (sync-BN, gan_trainer.py module docstring), so the sharded math is
    IDENTICAL to single-device up to reduction order — asserted here for
    every loss term, not just finiteness."""
    cfg = _gan_cfg()
    trainer = GanTrainer(cfg, vocab_size=VOCAB)
    state = trainer.init_state(seed=0)
    batch = _batch(rng, ["img64", "img128"])

    _, m_single = trainer.train_step(
        jax.tree_util.tree_map(jnp.copy, state),
        jax.tree_util.tree_map(jnp.copy, batch))

    mesh = make_mesh()
    sh_state = replicate(jax.tree_util.tree_map(jnp.copy, state), mesh)
    sh_batch = shard_batch(jax.tree_util.tree_map(jnp.copy, batch), mesh)
    _, m_sharded = trainer.train_step(sh_state, sh_batch)

    assert set(m_single) == set(m_sharded)
    for key in m_single:
        np.testing.assert_allclose(float(m_single[key]),
                                   float(m_sharded[key]),
                                   rtol=2e-4, atol=1e-5, err_msg=key)


def test_gan_step_2d_mesh_matches_single_device(rng):
    """Multi-slice story: a 2-D ('slice', 'data') mesh — batch sharded over
    both axes, hierarchical gradient reduction — gives the same step as one
    device."""
    cfg = _gan_cfg()
    trainer = GanTrainer(cfg, vocab_size=VOCAB)
    state = trainer.init_state(seed=0)
    batch = _batch(rng, ["img64", "img128"])

    _, m_single = trainer.train_step(
        jax.tree_util.tree_map(jnp.copy, state),
        jax.tree_util.tree_map(jnp.copy, batch))

    mesh = make_mesh(shape=(2, 4))
    assert mesh.axis_names == ("slice", "data") and mesh.size == 8
    sh_state = replicate(jax.tree_util.tree_map(jnp.copy, state), mesh)
    sh_batch = shard_batch(jax.tree_util.tree_map(jnp.copy, batch), mesh)
    new_state, m_sharded = trainer.train_step(sh_state, sh_batch)

    for key in m_single:
        np.testing.assert_allclose(float(m_single[key]),
                                   float(m_sharded[key]),
                                   rtol=2e-4, atol=1e-5, err_msg=key)
    assert int(new_state.step) == 1


def _gan_cfg3():
    """Full 3-stage config => the G-step's DAMSM coupling is active."""
    return GanConfig(gf_dim=4, df_dim=4, emb_dim=16, cond_dim=4, z_dim=4,
                     seq_len=L, batch_size=B, num_stages=3,
                     image_encoder="tiny", compute_dtype="")


@pytest.mark.slow
def test_gan_coupling_sharded_loss_matches_single_device(rng):
    """GanTrainer(mesh=...) routes the G-step's DAMSM coupling through the
    explicit-collective shard_map loss (losses/damsm_sharded.py) — each
    device computes its image rows against all-gathered text tensors instead
    of XLA gathering the (B, 289, D) region features. Every metric
    (including damsm_loss and the G-grads' effect via g_total) must match
    the plain single-device step."""
    cfg = _gan_cfg3()
    batch = _batch(rng, ["img64", "img128", "img256"])

    ref = GanTrainer(cfg, vocab_size=VOCAB)
    state_ref = ref.init_state(seed=0)
    mesh = make_mesh()
    sh = GanTrainer(cfg, vocab_size=VOCAB, mesh=mesh)
    assert sh.sharded_loss is not None
    state_sh = replicate(sh.init_state(seed=0), mesh)
    batch_sh = shard_batch(jax.tree_util.tree_map(jnp.copy, batch), mesh)

    # Two steps: the second step's params depend on the first step's grads,
    # so step-2 agreement proves the sharded coupling's GRADIENTS match too
    # (at a looser tolerance — the shard_map loss reduces in a different
    # order and Adam amplifies the fp drift; a wiring bug would be O(1)).
    for step, rtol in enumerate((2e-4, 2e-3)):
        state_ref, m_single = ref.train_step(state_ref, batch)
        state_sh, m_sharded = sh.train_step(state_sh, batch_sh)
        assert "damsm_loss" in m_single and "damsm_loss" in m_sharded
        for key in m_single:
            np.testing.assert_allclose(float(m_single[key]),
                                       float(m_sharded[key]),
                                       rtol=rtol, atol=1e-5,
                                       err_msg=f"step {step}: {key}")


@pytest.mark.slow
def test_gan_coupling_sharded_loss_2d_mesh(rng):
    """Same coupling parity on the 2-D ('slice', 'data') multi-slice mesh."""
    cfg = _gan_cfg3()
    batch = _batch(rng, ["img64", "img128", "img256"])

    ref = GanTrainer(cfg, vocab_size=VOCAB)
    _, m_single = ref.train_step(ref.init_state(seed=0),
                                 jax.tree_util.tree_map(jnp.copy, batch))

    mesh = make_mesh(shape=(2, 4))
    sh = GanTrainer(cfg, vocab_size=VOCAB, mesh=mesh)
    assert sh.sharded_loss is not None
    state_sh = replicate(sh.init_state(seed=0), mesh)
    batch_sh = shard_batch(jax.tree_util.tree_map(jnp.copy, batch), mesh)
    _, m_sharded = sh.train_step(state_sh, batch_sh)

    for key in m_single:
        np.testing.assert_allclose(float(m_single[key]),
                                   float(m_sharded[key]),
                                   rtol=2e-4, atol=1e-5, err_msg=key)


def test_mesh_shape_wiring():
    """RunConfig.mesh_shape semantics (parallel/mesh.py::make_mesh)."""
    import pytest

    from attngan_tpu.parallel import make_mesh_for_batch

    m1 = make_mesh_for_batch(16, shape=(4,))
    assert m1.axis_names == ("data",) and m1.size == 4
    m2 = make_mesh_for_batch(16, shape=(2, 4))
    assert m2.axis_names == ("slice", "data") and m2.size == 8
    with pytest.raises(ValueError):
        make_mesh_for_batch(6, shape=(2, 4))   # 6 % 8 != 0
    with pytest.raises(ValueError):
        make_mesh_for_batch(16, shape=(4, 4))  # needs 16 devices, have 8


@pytest.mark.slow
def test_gan_step_sharded_runs(rng):
    cfg = GanConfig(gf_dim=4, df_dim=4, emb_dim=16, cond_dim=4, z_dim=4,
                    seq_len=L, batch_size=B, num_stages=2,
                    image_encoder="tiny", compute_dtype="")
    trainer = GanTrainer(cfg, vocab_size=VOCAB)
    state = trainer.init_state(seed=0)
    batch = _batch(rng, ["img64", "img128"])
    mesh = make_mesh()
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    state, metrics = trainer.train_step(state, batch)
    for key, val in metrics.items():
        assert np.isfinite(float(val)), f"{key} not finite"


def test_sharded_inference(rng):
    from attngan_tpu.infer.sampler import Sampler

    cfg = GanConfig(gf_dim=4, df_dim=4, emb_dim=16, cond_dim=4, z_dim=4,
                    seq_len=L, batch_size=B, num_stages=2,
                    image_encoder="tiny", compute_dtype="")
    trainer = GanTrainer(cfg, vocab_size=VOCAB)
    state = trainer.init_state(seed=0)
    mesh = make_mesh()
    state = replicate(state, mesh)
    sampler = Sampler(trainer, state)
    tokens = jnp.asarray(rng.integers(0, VOCAB, (B, L)), jnp.int32)
    lengths = jnp.asarray(rng.integers(2, L + 1, (B,)), jnp.int32)
    batch = shard_batch({"tokens": tokens, "lengths": lengths}, mesh)
    imgs = sampler.generate_from_tokens(batch["tokens"], batch["lengths"],
                                        jax.random.key(0))
    assert imgs.shape == (B, 128, 128, 3)


def test_damsm_superbatch_sharded_matches_sequential(rng):
    """Superbatch K=2 on the 8-device mesh (sharded explicit-collective
    loss INSIDE the lax.scan body) == 2 sequential sharded steps. Guards
    the kernel/shard_map loss composition under scan."""
    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=B,
                      image_encoder="tiny", compute_dtype="")
    cfg_super = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=B,
                            image_encoder="tiny", compute_dtype="",
                            superbatch=2)
    mesh = make_mesh()
    plain = DamsmTrainer(cfg, vocab_size=VOCAB, seq_len=L, image_res=64,
                         mesh=mesh)
    superb = DamsmTrainer(cfg_super, vocab_size=VOCAB, seq_len=L,
                          image_res=64, mesh=mesh)
    assert superb.sharded_loss is not None
    state_p = replicate(plain.init_state(seed=0), mesh)
    state_s = replicate(superb.init_state(seed=0), mesh)

    b1 = shard_batch(_batch(rng, ["img256"]), mesh)
    b2 = shard_batch(_batch(rng, ["img256"]), mesh)
    losses = []
    for b in (b1, b2):
        state_p, m = plain.train_step(state_p, b)
        losses.append(float(m["loss"]))

    superbatch = shard_batch(
        {k: jnp.concatenate([b1[k], b2[k]], axis=0) for k in b1}, mesh)
    state_s, m_s = superb.train_step_super(state_s, superbatch)

    np.testing.assert_allclose(np.asarray(m_s["loss"]), losses, rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(state_p.rnn_params),
                     jax.tree_util.tree_leaves(state_s.rnn_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)
