"""Pallas kernels vs their jnp oracles (interpret mode on CPU)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from attngan_tpu.losses.damsm import words_loss
from attngan_tpu.ops.attention import word_attention
from attngan_tpu.ops.pallas_attention import word_attention_pallas
from attngan_tpu.ops.pallas_damsm import (
    damsm_similarity_pallas,
    words_loss_pallas,
)


def _attn_inputs(rng, b=2, h=16, w=16, c=32, l=6):
    images = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    words = jnp.asarray(rng.standard_normal((b, l, c)), jnp.float32)
    mask = np.ones((b, l), np.int32)
    mask[0, 4:] = 0
    return images, words, jnp.asarray(mask)


def test_pallas_word_attention_matches_jnp(rng):
    images, words, mask = _attn_inputs(rng)
    ctx_p, attn_p = word_attention_pallas(images, words, mask, block_p=128)
    ctx_j, attn_j = word_attention(images, words, mask)
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx_j),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn_p), np.asarray(attn_j),
                               rtol=1e-4, atol=1e-5)


def test_pallas_word_attention_grad_matches_jnp(rng):
    images, words, mask = _attn_inputs(rng, h=8, w=8)

    def loss_pallas(im, wd):
        ctx, _ = word_attention_pallas(im, wd, mask, block_p=64)
        return jnp.sum(ctx ** 2)

    def loss_jnp(im, wd):
        ctx, _ = word_attention(im, wd, mask)
        return jnp.sum(ctx ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(images, words)
    gj = jax.grad(loss_jnp, argnums=(0, 1))(images, words)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def _damsm_inputs(rng, b=4, r=9, d=16, l=5):
    img = jnp.asarray(rng.standard_normal((b, r, d)), jnp.float32)
    words = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    mask = np.ones((b, l), np.int32)
    mask[1, 3:] = 0
    mask[2, 2:] = 0
    return img, words, jnp.asarray(mask)


def test_pallas_damsm_similarity_matches_vmap(rng):
    from attngan_tpu.ops.pallas_damsm import _jnp_similarity

    img, words, mask = _damsm_inputs(rng)
    sims_p = damsm_similarity_pallas(img, words, mask)
    sims_j = _jnp_similarity(img, words, mask, 4.0, 5.0)
    np.testing.assert_allclose(np.asarray(sims_p), np.asarray(sims_j),
                               rtol=1e-4, atol=1e-5)


def test_pallas_words_loss_matches_reference_impl(rng):
    img, words, mask = _damsm_inputs(rng)
    labels = jnp.arange(4)
    class_ids = jnp.asarray([0, 1, 0, 2])
    loss_p = words_loss_pallas(img, words, labels, mask, class_ids)
    loss_j, _ = words_loss(img, words, labels, mask, class_ids)
    np.testing.assert_allclose(float(loss_p), float(loss_j), rtol=1e-4)


def test_pallas_words_loss_grad_matches(rng):
    img, words, mask = _damsm_inputs(rng)
    labels = jnp.arange(4)

    gp = jax.grad(lambda im, wd: words_loss_pallas(im, wd, labels, mask, None),
                  argnums=(0, 1))(img, words)
    gj = jax.grad(lambda im, wd: words_loss(im, wd, labels, mask, None)[0],
                  argnums=(0, 1))(img, words)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_words_loss_pallas_extreme_magnitudes(rng):
    """Per-GROUP max shift in softmax #1: with score groups separated by
    >> 88 (exp underflow range), a global max shift would zero out entire
    low-scoring texts' softmaxes; the kernel must still match the vmap
    oracle."""
    B, L, D, R = 4, 3, 16, 9
    img = jnp.asarray(rng.standard_normal((B, R, D)), jnp.float32)
    # text 0's words are huge (scores ~ +-1000), the rest tiny
    words = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    words = words.at[0].mul(250.0)
    labels = jnp.arange(B)
    mask = jnp.ones((B, L), jnp.int32)
    cls = jnp.arange(B)

    ref, _ = words_loss(img, words, labels, mask, cls, fused=False)
    got, _ = words_loss(img, words, labels, mask, cls, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # the hand-derived backward kernel must track the oracle here too
    gp = jax.grad(lambda i, w: words_loss(i, w, labels, mask, cls,
                                          fused=True)[0], argnums=(0, 1))(
        img, words)
    gj = jax.grad(lambda i, w: words_loss(i, w, labels, mask, cls,
                                          fused=False)[0], argnums=(0, 1))(
        img, words)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_pallas_damsm_similarity_rectangular(rng):
    """Images and texts are independent axes (kernel v3): a 3-image shard
    vs 5 texts must match the vmap oracle."""
    from attngan_tpu.ops.pallas_damsm import _jnp_similarity

    img, words, mask = _damsm_inputs(rng)
    img = img[:3]
    sims_p = damsm_similarity_pallas(img, words, mask)
    sims_j = _jnp_similarity(img, words, mask, 4.0, 5.0)
    assert sims_p.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(sims_p), np.asarray(sims_j),
                               rtol=1e-4, atol=1e-5)


def test_pallas_damsm_similarity_tiled_forward_and_grad(rng, monkeypatch):
    """Force multi-tile grids (tile=2 over 5 texts -> K=3 with one padded
    dummy text): forward AND the two-kernel tiled backward must match the
    oracle, including the zero contribution of the padded tile."""
    import attngan_tpu.ops.pallas_damsm as pd

    monkeypatch.setattr(pd, "_TILE_FWD", 2)
    monkeypatch.setattr(pd, "_TILE_BWD", 2)
    img, words, mask = _damsm_inputs(rng, b=5)
    img = img[:3]                      # rectangular too

    sims_p = damsm_similarity_pallas(img, words, mask)
    sims_j = pd._jnp_similarity(img, words, mask, 4.0, 5.0)
    np.testing.assert_allclose(np.asarray(sims_p), np.asarray(sims_j),
                               rtol=1e-4, atol=1e-5)

    def loss_p(im, wd):
        return jnp.sum(jnp.sin(damsm_similarity_pallas(im, wd, mask)))

    def loss_j(im, wd):
        return jnp.sum(jnp.sin(pd._jnp_similarity(im, wd, mask, 4.0, 5.0)))

    gp = jax.grad(loss_p, argnums=(0, 1))(img, words)
    gj = jax.grad(loss_j, argnums=(0, 1))(img, words)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_words_loss_large_batch_tiled_grad(rng):
    """B > 2 * _TILE_BWD texts routes the tiled backward even square — the
    round-2 cap at B=128 is lifted. Scaled-down tiles via real sizes would
    be slow in interpret mode; 5 texts with tile=2 already covered the
    machinery, so here just assert the square fast-path gate still fires
    for small square batches (shape-driven dispatch sanity)."""
    import attngan_tpu.ops.pallas_damsm as pd

    img, words, mask = _damsm_inputs(rng)
    calls = {}
    orig = pd._similarity_grid_bwd_square

    def spy(*a, **k):
        calls["square"] = True
        return orig(*a, **k)

    pd._similarity_grid_bwd_square = spy
    try:
        jax.grad(lambda im: jnp.sum(damsm_similarity_pallas(im, words,
                                                            mask)))(img)
    finally:
        pd._similarity_grid_bwd_square = orig
    assert calls.get("square"), "square fast path should serve B=4"
