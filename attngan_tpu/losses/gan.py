"""Adversarial losses + conditioning-augmentation KL.

Reference: losses/disc_loss.py:8-62, losses/gen_loss.py:8-47,
losses/KL_loss.py:5-9. Discriminators output sigmoid probabilities (not
logits) in the reference, and the 1e-8 epsilons inside the logs are part of
its numerics — both preserved. The non-saturating variants are what the
live training path uses (train.py:74-75); the "standard" BCE variants (with
U(0.8, 1.0) real-label smoothing, disc_loss.py:12-15) are provided for
parity and take an explicit PRNG key instead of implicit CUDA RNG.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

EPS = 1e-8


def non_saturating_disc_loss(real_probs: jax.Array, fake_probs: jax.Array) -> jax.Array:
    """-mean(log D(x) + log(1 - D(G(z)))) (disc_loss.py:50-62)."""
    return -jnp.mean(jnp.log(real_probs + EPS) + jnp.log(1.0 - fake_probs + EPS))


def non_saturating_gen_loss(fake_probs: jax.Array) -> jax.Array:
    """-mean(log D(G(z))) (gen_loss.py:38-47)."""
    return -jnp.mean(jnp.log(fake_probs + EPS))


def _bce(probs: jax.Array, targets: jax.Array) -> jax.Array:
    probs = jnp.clip(probs, EPS, 1.0 - EPS)
    return -jnp.mean(targets * jnp.log(probs) + (1.0 - targets) * jnp.log(1.0 - probs))


def standard_disc_loss(
    real_probs: jax.Array,
    fake_probs: jax.Array,
    rng: Optional[jax.Array] = None,
    label_smooth: float = 0.8,
) -> jax.Array:
    """BCE avg of real/fake with smoothed real labels (disc_loss.py:26-47)."""
    n = real_probs.shape[0]
    if rng is not None:
        real_labels = jax.random.uniform(rng, (n,), minval=label_smooth, maxval=1.0)
    else:
        real_labels = jnp.full((n,), 0.5 * (label_smooth + 1.0))
    loss_fake = _bce(fake_probs, jnp.zeros_like(fake_probs))
    loss_real = _bce(real_probs, real_labels)
    return 0.5 * (loss_fake + loss_real)


def standard_gen_loss(fake_probs: jax.Array) -> jax.Array:
    """BCE vs. all-ones labels (gen_loss.py:21-34)."""
    return _bce(fake_probs, jnp.ones_like(fake_probs))


def kl_loss(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """-0.5 * mean(1 + logvar - mu^2 - exp(logvar)) (KL_loss.py:5-9)."""
    return -0.5 * jnp.mean(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
