"""Discriminator shape/range tests (reference networks/discriminators.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attngan_tpu.models.discriminators import Discriminator


@pytest.mark.parametrize("res", [64, 128, 256])
def test_discriminator_output(rng, res):
    disc = Discriminator(df_dim=8, resolution=res)
    x = jnp.asarray(rng.standard_normal((2, res, res, 3)).astype(np.float32))
    variables = disc.init(jax.random.key(0), x, train=True)
    probs, _ = disc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert probs.shape == (2,)
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))


def test_discriminator_rejects_wrong_resolution(rng):
    disc = Discriminator(df_dim=8, resolution=128)
    x = jnp.zeros((2, 64, 64, 3))
    with pytest.raises(AssertionError):
        disc.init(jax.random.key(0), x, train=True)
