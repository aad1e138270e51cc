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

    # Generator cascade forward (the product's actual output): fixed init,
    # fixed noise/embeddings -> per-stage image fingerprints + mu/logvar.
    from attngan_tpu.models.discriminators import Discriminator
    from attngan_tpu.models.generator import Generator

    gen = Generator(gf_dim=4, emb_dim=8, z_dim=6, cond_dim=4, num_stages=3)
    b, L = 2, 5
    noise = jnp.asarray(rng.standard_normal((b, 6)), jnp.float32)
    sent = jnp.asarray(rng.standard_normal((b, 8)), jnp.float32)
    wordsg = jnp.asarray(rng.standard_normal((b, L, 8)), jnp.float32)
    gmask = jnp.asarray([[1, 1, 1, 1, 0], [1, 1, 0, 0, 0]], jnp.int32)
    gvars = gen.init(jax.random.key(7), noise, sent, wordsg, gmask,
                     jax.random.key(8))
    fakes, attns, gmu, glogvar = gen.apply(
        gvars, noise, sent, wordsg, gmask, jax.random.key(8), train=False)
    for img in fakes:
        out[f"gen_img{img.shape[1]}_sum"] = np.asarray(
            jnp.sum(img, axis=(1, 2, 3)), np.float64)
        out[f"gen_img{img.shape[1]}_absmean"] = np.asarray(
            jnp.mean(jnp.abs(img), axis=(1, 2, 3)), np.float64)
    for attn in attns:
        out[f"gen_attn{attn.shape[-1]}_sum"] = np.asarray(
            jnp.sum(attn, axis=(1, 2, 3)), np.float64)
    out["gen_mu"] = np.asarray(gmu, np.float64)
    out["gen_logvar"] = np.asarray(glogvar, np.float64)

    # Discriminator forwards at each resolution
    for res in (64, 128, 256):
        disc = Discriminator(df_dim=4, resolution=res)
        x = jnp.asarray(rng.standard_normal((2, res, res, 3)) * 0.3,
                        jnp.float32)
        dvars = disc.init(jax.random.key(10 + res), x, train=True)
        probs = disc.apply(dvars, x, train=False)
        out[f"disc{res}_probs"] = np.asarray(probs, np.float64)
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
