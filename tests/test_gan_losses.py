"""GAN losses vs hand-computed values (reference losses/*.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from attngan_tpu.losses.gan import (
    kl_loss,
    non_saturating_disc_loss,
    non_saturating_gen_loss,
    standard_disc_loss,
    standard_gen_loss,
)


def test_non_saturating_disc_loss():
    real = jnp.asarray([0.9, 0.8])
    fake = jnp.asarray([0.1, 0.2])
    expected = -np.mean(
        np.log(np.array([0.9, 0.8]) + 1e-8) + np.log(1 - np.array([0.1, 0.2]) + 1e-8)
    )
    np.testing.assert_allclose(float(non_saturating_disc_loss(real, fake)),
                               expected, rtol=1e-4)


def test_non_saturating_gen_loss():
    fake = jnp.asarray([0.25, 0.5])
    expected = -np.mean(np.log(np.array([0.25, 0.5]) + 1e-8))
    np.testing.assert_allclose(float(non_saturating_gen_loss(fake)),
                               expected, rtol=1e-4)


def test_standard_gen_loss_is_bce_vs_ones():
    fake = jnp.asarray([0.25, 0.5])
    expected = -np.mean(np.log(np.array([0.25, 0.5])))
    np.testing.assert_allclose(float(standard_gen_loss(fake)), expected, rtol=1e-5)


def test_standard_disc_loss_smoothing_bounds():
    real = jnp.full((64,), 0.9)
    fake = jnp.full((64,), 0.1)
    loss = standard_disc_loss(real, fake, rng=jax.random.key(0), label_smooth=0.8)
    # labels in [0.8, 1.0]; loss must be finite and positive
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_kl_loss_zero_at_standard_normal():
    mu = jnp.zeros((4, 10))
    logvar = jnp.zeros((4, 10))
    np.testing.assert_allclose(float(kl_loss(mu, logvar)), 0.0, atol=1e-7)


def test_kl_loss_positive_away_from_prior():
    mu = jnp.ones((4, 10)) * 2.0
    logvar = jnp.ones((4, 10))
    assert float(kl_loss(mu, logvar)) > 0
