"""Attention ops vs independent numpy oracles of the documented math
(reference networks/attention.py:25-79 and :82-121)."""

import jax.numpy as jnp
import numpy as np

from attngan_tpu.ops.attention import damsm_attention, word_attention


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _np_word_attention(images, words, mask):
    """Oracle: pixels attend over masked words (scale 1/sqrt(C))."""
    b, h, w, c = images.shape
    pix = images.reshape(b, h * w, c)
    scores = np.einsum("bpc,blc->bpl", pix, words) / np.sqrt(c)
    scores = np.where(mask[:, None, :] == 0, -np.inf, scores)
    attn = _softmax(scores, axis=-1)
    ctx = np.einsum("bpl,blc->bpc", attn, words).reshape(b, h, w, c)
    maps = attn.transpose(0, 2, 1).reshape(b, -1, h, w)
    return ctx, maps


def _np_damsm_attention(query, context, gamma1, mask=None):
    """Oracle: AttnGAN Eq. 7-9 double softmax."""
    b, l, d = query.shape
    scores = np.einsum("brd,bld->brl", context, query) / np.sqrt(d)
    if mask is not None:
        scores = np.where(mask[:, None, :] == 0, -np.inf, scores)
    a1 = _softmax(scores, axis=-1)                 # over words per region
    a2 = _softmax(a1.transpose(0, 2, 1) * gamma1, axis=-1)  # over regions
    weighted = np.einsum("blr,brd->bld", a2, context)
    return weighted, a2


def test_word_attention_matches_oracle(rng):
    b, h, w, c, l = 3, 4, 4, 8, 5
    images = rng.standard_normal((b, h, w, c)).astype(np.float32)
    words = rng.standard_normal((b, l, c)).astype(np.float32)
    mask = (rng.random((b, l)) > 0.3).astype(np.int32)
    mask[:, 0] = 1  # at least one valid word each
    ctx, maps = word_attention(jnp.asarray(images), jnp.asarray(words),
                               jnp.asarray(mask))
    octx, omaps = _np_word_attention(images, words, mask)
    np.testing.assert_allclose(np.asarray(ctx), octx, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(maps), omaps, rtol=1e-4, atol=1e-5)


def test_word_attention_rows_sum_to_one(rng):
    b, h, w, c, l = 2, 8, 8, 16, 6
    images = rng.standard_normal((b, h, w, c)).astype(np.float32)
    words = rng.standard_normal((b, l, c)).astype(np.float32)
    mask = np.ones((b, l), np.int32)
    mask[0, 3:] = 0
    _, maps = word_attention(jnp.asarray(images), jnp.asarray(words),
                             jnp.asarray(mask))
    sums = np.asarray(maps).sum(axis=1)            # over words
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)
    # masked words get zero attention everywhere
    np.testing.assert_allclose(np.asarray(maps)[0, 3:], 0.0, atol=1e-7)


def test_damsm_attention_matches_oracle(rng):
    b, l, r, d = 3, 5, 9, 8
    query = rng.standard_normal((b, l, d)).astype(np.float32)
    context = rng.standard_normal((b, r, d)).astype(np.float32)
    weighted, attn = damsm_attention(jnp.asarray(query), jnp.asarray(context),
                                     gamma1=4.0)
    ow, oa = _np_damsm_attention(query, context, 4.0)
    np.testing.assert_allclose(np.asarray(weighted), ow, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), oa, rtol=1e-4, atol=1e-5)


def test_damsm_attention_mask_equals_ragged_slice(rng):
    """Masked static-shape attention == attention on the truly-sliced words
    (the property that lets us replace the reference's ragged host loop)."""
    b, l, r, d, true_len = 2, 6, 9, 8, 4
    query = rng.standard_normal((b, l, d)).astype(np.float32)
    context = rng.standard_normal((b, r, d)).astype(np.float32)
    mask = np.zeros((b, l), np.int32)
    mask[:, :true_len] = 1
    w_masked, _ = damsm_attention(jnp.asarray(query), jnp.asarray(context),
                                  gamma1=4.0, mask=jnp.asarray(mask))
    w_sliced, _ = damsm_attention(jnp.asarray(query[:, :true_len]),
                                  jnp.asarray(context), gamma1=4.0)
    np.testing.assert_allclose(np.asarray(w_masked[:, :true_len]),
                               np.asarray(w_sliced), rtol=1e-4, atol=1e-5)
