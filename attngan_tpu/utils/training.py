"""Runtime training helpers (reference utilities/training.py:19-58).

The reference's ``Training`` static class was imported once and mostly
unused; the capability is kept as plain functions. Noise generation takes an
explicit PRNG key (the reference used implicit torch.randn).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp


def scale_255_to_1(images: jax.Array) -> jax.Array:
    """[0, 255] -> [-1, 1]."""
    return (images - 127.5) / 127.5


def scale_1_to_255(images: jax.Array) -> jax.Array:
    """[-1, 1] -> [0, 255]."""
    return images * 127.5 + 127.5


def noise_vector(rng: jax.Array, n_examples: int, n_hidden: int) -> jax.Array:
    """N(0, 1) noise of shape (n_examples, n_hidden)."""
    return jax.random.normal(rng, (n_examples, n_hidden))


def calculate_out_hw(hw: int, k: int, s: int, p: int = 0) -> int:
    from attngan_tpu.ops.layers import calculate_out_hw as _f

    return _f(hw, k, s, p)
