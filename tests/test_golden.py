"""Golden-value regression tests.

Freezes scalar/vector outputs of the verified round-1 numerics (BiLSTM
encoder, DAMSM losses, GAN losses, generator attention) for fixed seeds and
inputs, so later refactors that unintentionally change semantics fail
loudly. Regenerate deliberately with:

    python tests/test_golden.py --regenerate
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "golden_values.npz")


def _compute_goldens():
    from attngan_tpu.losses.damsm import sentence_loss, words_loss
    from attngan_tpu.losses.gan import (
        kl_loss,
        non_saturating_disc_loss,
        non_saturating_gen_loss,
    )
    from attngan_tpu.models.rnn_encoder import BiLSTMEncoder
    from attngan_tpu.ops.attention import damsm_attention, word_attention

    rng = np.random.default_rng(1234)
    out = {}

    # BiLSTM: fixed init, fixed tokens -> sent embedding fingerprint
    enc = BiLSTMEncoder(vocab_size=40, emb_dim=12, hidden_dim=16)
    caps = jnp.asarray(rng.integers(0, 40, (3, 6)), jnp.int32)
    lens = jnp.asarray([6, 4, 2], jnp.int32)
    variables = enc.init(jax.random.key(0), caps, lens)
    word_embs, sent_embs = enc.apply(variables, caps, lens, train=False)
    out["bilstm_sent"] = np.asarray(sent_embs, np.float64)
    out["bilstm_word_sum"] = np.asarray(
        jnp.sum(word_embs, axis=(1, 2)), np.float64)

    # DAMSM losses
    img = jnp.asarray(rng.standard_normal((4, 9, 8)), jnp.float32)
    words = jnp.asarray(rng.standard_normal((4, 5, 8)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 1, 1], [1, 1, 1, 0, 0],
                        [1, 1, 0, 0, 0], [1, 1, 1, 1, 0]], jnp.int32)
    labels = jnp.arange(4)
    cls = jnp.asarray([0, 1, 0, 2])
    wloss, _ = words_loss(img, words, labels, mask, cls, fused=False)
    code = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    sent = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    out["words_loss"] = np.float64(wloss)
    out["sentence_loss"] = np.float64(sentence_loss(code, sent, labels, cls))

    # attention fingerprints
    w2, a2 = damsm_attention(words, img, gamma1=4.0, mask=mask)
    out["damsm_attn_sum"] = np.asarray(jnp.sum(w2, axis=(1, 2)), np.float64)
    images = jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)
    wp = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    ctx, _ = word_attention(images, wp, jnp.ones((2, 5), jnp.int32))
    out["word_attn_sum"] = np.asarray(jnp.sum(ctx, axis=(1, 2, 3)), np.float64)

    # GAN losses
    real = jnp.asarray([0.9, 0.7, 0.85])
    fake = jnp.asarray([0.15, 0.3, 0.05])
    out["ns_disc"] = np.float64(non_saturating_disc_loss(real, fake))
    out["ns_gen"] = np.float64(non_saturating_gen_loss(fake))
    mu = jnp.asarray(rng.standard_normal((2, 6)), jnp.float32)
    logvar = jnp.asarray(rng.standard_normal((2, 6)), jnp.float32) * 0.3
    out["kl"] = np.float64(kl_loss(mu, logvar))
    return out


def test_golden_values_unchanged():
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run: python tests/test_golden.py --regenerate")
    stored = np.load(GOLDEN_PATH)
    current = _compute_goldens()
    assert set(stored.files) == set(current)
    for key in current:
        np.testing.assert_allclose(
            np.asarray(current[key]), stored[key], rtol=2e-4, atol=1e-6,
            err_msg=f"golden value drifted: {key}")


if __name__ == "__main__":
    import sys

    if "--regenerate" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, **_compute_goldens())
        print(f"wrote {GOLDEN_PATH}")
