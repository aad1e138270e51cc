"""int8 post-training quantization (infer/quantize.py).

The quantized path must (a) reproduce the float math within classic int8
tolerance on well-conditioned inputs, (b) fall back to the float path for
anything it cannot faithfully reproduce, and (c) keep the end-to-end
sampler's images close to the bf16/fp32 reference output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from attngan_tpu.infer.quantize import Int8Sampler, calibrate, quantized_call


class _ConvNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3), padding=1, name="c1")(x)
        x = nn.relu(x)
        x = nn.Conv(8, (3, 3), strides=2, padding=1, use_bias=False,
                    name="c2")(x)
        return nn.Dense(4, name="d")(x.reshape(x.shape[0], -1))


def test_calibrate_records_every_quantizable_input(rng):
    net = _ConvNet()
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), x)
    out, records = calibrate(net.apply, variables, x)
    assert set(records) == {"c1", "c2", "d"}
    assert float(records["c1"]) == pytest.approx(float(jnp.max(jnp.abs(x))))
    np.testing.assert_allclose(out, net.apply(variables, x), rtol=1e-6)


def test_quantized_matches_float_within_int8_tolerance(rng):
    net = _ConvNet()
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), x)
    ref = net.apply(variables, x)
    _, records = calibrate(net.apply, variables, x)
    scales = {k: float(v) for k, v in records.items()}
    got = quantized_call(scales, net.apply, variables, x)
    # symmetric int8: ~0.8% per-tensor step; three stacked layers
    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.08, (err, scale)
    corr = float(jnp.corrcoef(got.ravel(), ref.ravel())[0, 1])
    assert corr > 0.999


def test_uncalibrated_and_grouped_modules_stay_float(rng):
    class Grouped(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(8, (3, 3), padding=1, feature_group_count=4,
                           name="g")(x)

    net = Grouped()
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    variables = net.init(jax.random.key(0), x)
    _, records = calibrate(net.apply, variables, x)
    assert records == {}                      # grouped conv not quantizable
    ref = net.apply(variables, x)
    got = quantized_call({"g": 1.0}, net.apply, variables, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # missing calibration record => exact float path
    net2 = _ConvNet()
    x2 = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    v2 = net2.init(jax.random.key(1), x2)
    got2 = quantized_call({}, net2.apply, v2, x2)
    np.testing.assert_array_equal(np.asarray(got2),
                                  np.asarray(net2.apply(v2, x2)))


@pytest.mark.slow
def test_int8_sampler_end_to_end_close_to_float(rng):
    from attngan_tpu.core.config import GanConfig
    from attngan_tpu.infer.sampler import Sampler
    from attngan_tpu.train.gan_trainer import GanTrainer

    vocab = 50
    cfg = GanConfig(gf_dim=8, df_dim=8, emb_dim=32, seq_len=4, num_stages=2,
                    compute_dtype="", image_encoder="tiny")
    trainer = GanTrainer(cfg, vocab_size=vocab)
    state = trainer.init_state(seed=0)

    tokens = jnp.asarray(rng.integers(0, vocab, (4, cfg.seq_len)), jnp.int32)
    lengths = jnp.full((4,), cfg.seq_len, jnp.int32)
    key = jax.random.key(7)

    ref = Sampler(trainer, state).generate_from_tokens(tokens, lengths, key)
    qs = Int8Sampler(trainer, state)
    got = qs.generate_from_tokens(tokens, lengths, key)

    assert got.shape == ref.shape
    assert qs.act_scales and all(v > 0 for v in qs.act_scales.values())
    # images live in [0, 1]; random-init GAN output is low-contrast, so the
    # mean-abs bound is the meaningful one
    mad = float(jnp.mean(jnp.abs(got - ref)))
    assert mad < 0.05, mad
    # repeat call reuses the cached scales (no recalibration)
    again = qs.generate_from_tokens(tokens, lengths, key)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(got))


def test_damsm_trunk_int8_step(rng):
    """cfg.trunk_int8: the DAMSM step calibrates once, runs the frozen
    trunk quantized, and stays close to the float step's loss."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from attngan_tpu.core.config import DamsmConfig
    from attngan_tpu.train.damsm_trainer import DamsmTrainer

    B, L, VOCAB = 4, 5, 30
    base = DamsmConfig(emb_dim=16, text_emb_dim=8, batch_size=B,
                       image_encoder="tiny", compute_dtype="")
    batch = {
        "tokens": jnp.asarray(rng.integers(0, VOCAB, (B, L)), jnp.int32),
        "lengths": jnp.asarray([5, 3, 4, 2], jnp.int32),
        "class_ids": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "img256": jnp.asarray(rng.standard_normal((B, 32, 32, 3)),
                              jnp.float32) * 0.5,
    }

    N_STEPS = 4
    trajectories = {}
    for flag in (False, True):
        cfg = dataclasses.replace(base, trunk_int8=flag)
        tr = DamsmTrainer(cfg, vocab_size=VOCAB, seq_len=L, image_res=32)
        st = tr.init_state(seed=0)
        losses = []
        for _ in range(N_STEPS):
            st, m = tr.train_step(st, dict(batch))
            loss = float(m["loss"])
            assert np.isfinite(loss)
            losses.append(loss)
        trajectories[flag] = losses
        if flag:
            assert tr._trunk_scales and len(tr._trunk_scales) >= 2
    # int8 perturbs the trunk features but the whole OPTIMIZATION TRAJECTORY
    # must stay in the float regime (VERDICT r2 #8): bounded per-step
    # relative deviation, and the loss still decreases under int8
    for f_loss, q_loss in zip(trajectories[False], trajectories[True]):
        assert abs(q_loss - f_loss) / abs(f_loss) < 0.05, trajectories
    assert trajectories[True][-1] < trajectories[True][0], trajectories


def test_trunk_int8_rejects_train_mode_bn():
    import dataclasses

    import pytest

    from attngan_tpu.core.config import DamsmConfig
    from attngan_tpu.train.damsm_trainer import DamsmTrainer

    cfg = dataclasses.replace(DamsmConfig(image_encoder="tiny"),
                              trunk_int8=True, trunk_train_mode_bn=True)
    with pytest.raises(ValueError):
        DamsmTrainer(cfg, vocab_size=10, seq_len=4, image_res=32)


def test_gan_config_fused_flags_plumb_to_generator(rng):
    """GanConfig.fused_attention / fused_upsample must reach the Generator
    (they were test-only constructor args before) — sample a tiny 2-stage
    cascade with both on; the 64^2 stage exercises the Pallas UpBlock eval
    kernel (interpret mode on CPU) and the fused attention."""
    import jax
    import jax.numpy as jnp

    from attngan_tpu.core.config import GanConfig
    from attngan_tpu.infer.sampler import Sampler
    from attngan_tpu.train.gan_trainer import GanTrainer

    vocab = 30
    cfg = GanConfig(gf_dim=4, df_dim=4, emb_dim=16, cond_dim=4, z_dim=4,
                    seq_len=4, num_stages=2, compute_dtype="",
                    image_encoder="tiny", fused_attention=True,
                    fused_upsample=True)
    trainer = GanTrainer(cfg, vocab_size=vocab)
    assert trainer.generator.fused_attention
    assert trainer.generator.fused_upsample
    state = trainer.init_state(seed=0)
    tokens = jnp.asarray(rng.integers(0, vocab, (2, 4)), jnp.int32)
    lengths = jnp.full((2,), 4, jnp.int32)
    imgs = Sampler(trainer, state).generate_from_tokens(
        tokens, lengths, jax.random.key(0))
    assert imgs.shape == (2, 128, 128, 3)
    import numpy as np

    assert np.isfinite(np.asarray(imgs)).all()


def test_percentile_calibration_clips_outliers(rng):
    """calib_percentile < 100 must record a smaller activation scale than
    the max when the input has rare spikes, and the percentile estimate
    must track the true quantile (histogram approximation)."""
    net = _ConvNet()
    x = np.asarray(rng.standard_normal((2, 8, 8, 3)), np.float32)
    x[0, 0, 0, 0] = 1000.0  # one spike dominates the max
    x = jnp.asarray(x)
    variables = net.init(jax.random.key(0), x)
    _, rec_max = calibrate(net.apply, variables, x)
    _, rec_pct = calibrate(net.apply, variables, x, calib_percentile=99.0)
    assert float(rec_max["c1"]) == pytest.approx(1000.0)
    true_q = float(np.quantile(np.abs(np.asarray(x)), 0.99))
    got = float(rec_pct["c1"])
    assert got < 50.0, "outlier not clipped"
    assert abs(got - true_q) / true_q < 0.35, (got, true_q)


def test_percentile_calibration_reduces_spiky_input_error(rng):
    """With a rare activation spike, percentile scales must beat max
    scales on BULK reconstruction error — the grid no longer stretches to
    the outlier (the trained-checkpoint failure mode: mean |image delta|
    0.103 max-calib vs 0.034 at p99, BENCH.md). Error is measured on the
    un-spiked batch element: the clipped spike region is the price paid."""
    net = _ConvNet()
    x = np.asarray(rng.standard_normal((2, 8, 8, 3)), np.float32)
    x[0, 0, 0, 0] = 300.0  # single outlier, 0.26% of elements
    x = jnp.asarray(x)
    variables = net.init(jax.random.key(0), x)
    ref = net.apply(variables, x)
    _, rec_max = calibrate(net.apply, variables, x)
    _, rec_pct = calibrate(net.apply, variables, x, calib_percentile=99.0)
    err = lambda rec: float(jnp.mean(jnp.abs(quantized_call(
        {k: float(v) for k, v in rec.items()}, net.apply, variables, x)[1]
        - ref[1])))
    assert err(rec_pct) < err(rec_max)


def test_abs_percentile_no_float32_count_saturation():
    """Regression: jnp.histogram's float32 ones-weights scatter-add
    saturates at 2^24 per bin, so a >16.7M-element bulk crowded into one
    bin of a spike-stretched range made the cdf never reach pct and the
    'percentile' degraded to (above) the max — exactly at the production
    scale the feature exists for. Counts are now int32."""
    from attngan_tpu.infer.quantize import _abs_percentile

    n = 20_000_000  # > 2^24 elements in one bin
    x = np.full((n,), 0.001, np.float32)
    x[0] = 1000.0
    got = float(_abs_percentile(jnp.asarray(x), 99.0))
    assert got < 1.0, f"percentile saturated back to the max: {got}"
    # bulk value is inside the first bin of [0, 1000]: edge 1000/2048
    assert got <= 1000.0 / 2048.0 + 1e-3


def test_abs_percentile_chunked_matches_single_chunk():
    """The cross-chunk float32 running histogram (guards int32 wraparound at
    n >= 2^31, ADVICE r3) must give the same percentile as the one-shot
    int32 scatter path on identical data."""
    from attngan_tpu.infer.quantize import _abs_percentile

    rng = np.random.default_rng(0)
    small = np.abs(rng.standard_normal((1 << 20,))).astype(np.float32)
    # Tile the same distribution past the 2^22 chunk size => scan path.
    big = np.tile(small, 8)
    for pct in (99.0, 95.0, 50.0):
        a = float(_abs_percentile(jnp.asarray(small), pct))
        b = float(_abs_percentile(jnp.asarray(big), pct))
        np.testing.assert_allclose(a, b, rtol=1e-6,
                                   err_msg=f"pct={pct}")
