"""Generator cascade shape/structure tests (reference networks/generator.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attngan_tpu.models.generator import CondAugment, Generator

GF, EMB, Z, COND, B, L = 8, 32, 16, 12, 2, 5


def _inputs(rng):
    noise = jnp.asarray(rng.standard_normal((B, Z)).astype(np.float32))
    sent = jnp.asarray(rng.standard_normal((B, EMB)).astype(np.float32))
    words = jnp.asarray(rng.standard_normal((B, L, EMB)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int32))
    return noise, sent, words, mask


@pytest.mark.parametrize("num_stages", [1, 2, 3])
def test_generator_shapes(rng, num_stages):
    gen = Generator(gf_dim=GF, emb_dim=EMB, z_dim=Z, cond_dim=COND,
                    num_stages=num_stages)
    noise, sent, words, mask = _inputs(rng)
    variables = gen.init(jax.random.key(0), noise, sent, words, mask,
                         jax.random.key(1))
    (fakes, attns, mu, logvar), _ = gen.apply(
        variables, noise, sent, words, mask, jax.random.key(2),
        mutable=["batch_stats"],
    )
    assert len(fakes) == num_stages
    assert len(attns) == num_stages - 1
    for stage, img in enumerate(fakes):
        res = 64 * (2 ** stage)
        assert img.shape == (B, res, res, 3)
        assert float(jnp.max(jnp.abs(img))) <= 1.0  # tanh range
    for stage, attn in enumerate(attns):
        res = 64 * (2 ** stage)
        assert attn.shape == (B, L, res, res)
    assert mu.shape == (B, COND) and logvar.shape == (B, COND)


def test_cond_augment_reparametrization():
    ca = CondAugment(cond_dim=COND)
    sent = jnp.ones((B, EMB))
    variables = ca.init(jax.random.key(0), sent, jax.random.key(1))
    c1, mu, logvar = ca.apply(variables, sent, jax.random.key(2))
    c2, _, _ = ca.apply(variables, sent, jax.random.key(3))
    assert c1.shape == (B, COND)
    # different keys -> different samples; same key -> identical
    assert not np.allclose(np.asarray(c1), np.asarray(c2))
    c3, _, _ = ca.apply(variables, sent, jax.random.key(2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c3))


def test_generator_masked_words_do_not_leak(rng):
    """Changing a masked word embedding must not change the output."""
    gen = Generator(gf_dim=GF, emb_dim=EMB, z_dim=Z, cond_dim=COND, num_stages=2)
    noise, sent, words, mask = _inputs(rng)
    variables = gen.init(jax.random.key(0), noise, sent, words, mask,
                         jax.random.key(1))
    out1, _ = gen.apply(variables, noise, sent, words, mask, jax.random.key(2),
                        mutable=["batch_stats"])
    words2 = words.at[0, 4].set(100.0)  # masked position of sample 0
    out2, _ = gen.apply(variables, noise, sent, words2, mask, jax.random.key(2),
                        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out1[0][1]), np.asarray(out2[0][1]),
                               atol=2e-5)
