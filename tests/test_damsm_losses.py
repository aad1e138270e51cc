"""Vectorized DAMSM losses vs a numpy oracle that follows the reference's
per-sample ragged loop semantics (losses/words_loss.py:29-101,
losses/sentence_loss.py:12-50)."""

import jax.numpy as jnp
import numpy as np

from attngan_tpu.losses.damsm import sentence_loss, words_loss

B, L, R, D = 4, 6, 9, 8
G1, G2, G3, WL, SL = 4.0, 5.0, 10.0, 5.0, 5.0


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _ce_rows(scores, labels):
    """Mean cross entropy of each row vs its integer label."""
    logp = scores - scores.max(axis=1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(axis=1, keepdims=True))
    return -logp[np.arange(len(labels)), labels].mean()


def _oracle_words_loss(img, words, labels, lens, class_ids):
    """Per-text loop with TRUE ragged slicing, as the reference does."""
    sims = np.zeros((B, B))
    for i in range(B):
        n = lens[i]
        q = words[i, :n]                                # (n, D)
        # attention of text i's words vs every image j
        scores = np.einsum("jrd,ld->jrl", img, q) / np.sqrt(D)
        a1 = _softmax(scores, axis=-1)
        a2 = _softmax(a1.transpose(0, 2, 1) * G1, axis=-1)
        weighted = np.einsum("jlr,jrd->jld", a2, img)   # (B, n, D)
        dots = (q[None] * weighted).sum(-1)
        norms = np.linalg.norm(q, axis=-1)[None] * np.linalg.norm(weighted, axis=-1)
        cos = dots / np.maximum(norms, 1e-8)            # (B, n)
        sims[:, i] = np.log(np.exp(G2 * cos).sum(axis=1))
    sims = sims * G3
    if class_ids is not None:
        mask = (class_ids[:, None] == class_ids[None, :]) & ~np.eye(B, dtype=bool)
        sims = np.where(mask, -1e9, sims)
    return (_ce_rows(sims, labels) + _ce_rows(sims.T, labels)) * WL


def _oracle_sentence_loss(cnn, rnn, labels, class_ids):
    scores = cnn @ rnn.T
    norms = np.linalg.norm(cnn, axis=1)[:, None] * np.linalg.norm(rnn, axis=1)[None]
    scores = scores / np.maximum(norms, 1e-8) * G3
    if class_ids is not None:
        mask = (class_ids[:, None] == class_ids[None, :]) & ~np.eye(B, dtype=bool)
        scores = np.where(mask, -1e9, scores)
    return (_ce_rows(scores, labels) + _ce_rows(scores.T, labels)) * SL


def _make_inputs(rng, with_classes=True):
    img = rng.standard_normal((B, R, D)).astype(np.float32)
    words = rng.standard_normal((B, L, D)).astype(np.float32)
    lens = np.array([6, 4, 3, 5])
    mask = (np.arange(L)[None] < lens[:, None]).astype(np.int32)
    labels = np.arange(B)
    class_ids = np.array([0, 1, 0, 2]) if with_classes else None
    return img, words, lens, mask, labels, class_ids


def test_words_loss_matches_ragged_oracle(rng):
    img, words, lens, mask, labels, class_ids = _make_inputs(rng)
    loss, attn = words_loss(
        jnp.asarray(img), jnp.asarray(words), jnp.asarray(labels),
        jnp.asarray(mask), jnp.asarray(class_ids), G1, G2, G3, WL,
    )
    oracle = _oracle_words_loss(img, words, labels, lens, class_ids)
    np.testing.assert_allclose(float(loss), oracle, rtol=1e-4)
    assert attn.shape == (B, L, R)


def test_words_loss_no_class_ids(rng):
    img, words, lens, mask, labels, _ = _make_inputs(rng, with_classes=False)
    loss, _ = words_loss(
        jnp.asarray(img), jnp.asarray(words), jnp.asarray(labels),
        jnp.asarray(mask), None, G1, G2, G3, WL,
    )
    oracle = _oracle_words_loss(img, words, labels, lens, None)
    np.testing.assert_allclose(float(loss), oracle, rtol=1e-4)


def test_sentence_loss_matches_oracle(rng):
    cnn = rng.standard_normal((B, D)).astype(np.float32)
    rnn = rng.standard_normal((B, D)).astype(np.float32)
    labels = np.arange(B)
    class_ids = np.array([0, 1, 1, 2])
    loss = sentence_loss(jnp.asarray(cnn), jnp.asarray(rnn),
                         jnp.asarray(labels), jnp.asarray(class_ids), G3, SL)
    oracle = _oracle_sentence_loss(cnn, rnn, labels, class_ids)
    np.testing.assert_allclose(float(loss), oracle, rtol=1e-4)


def test_matched_pairs_minimize_words_loss(rng):
    """Loss with perfectly-aligned pairs must beat a shuffled pairing."""
    img = rng.standard_normal((B, R, D)).astype(np.float32)
    # Make words equal to a region of their own image -> strong alignment.
    words = np.stack([np.tile(img[i, :1], (L, 1)) for i in range(B)])
    lens = np.full(B, L)
    mask = np.ones((B, L), np.int32)
    labels = np.arange(B)
    aligned, _ = words_loss(jnp.asarray(img), jnp.asarray(words),
                            jnp.asarray(labels), jnp.asarray(mask), None)
    shuffled, _ = words_loss(jnp.asarray(img), jnp.asarray(np.roll(words, 1, 0)),
                             jnp.asarray(labels), jnp.asarray(mask), None)
    assert float(aligned) < float(shuffled)
