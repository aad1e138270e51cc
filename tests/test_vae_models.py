"""DFCVAE / AutoEncoder / VGG19-BN structure and loss tests
(reference networks/VAE.py, networks/autoencoder.py)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from attngan_tpu.models.vae import (
    AutoEncoder,
    DFCVAE,
    VAEEmbedder,
    autoencoder_loss,
    dfc_vae_loss,
)

RES = 64  # smoke resolution; hidden stack handles any power-of-two >= 2^8?


def test_dfcvae_roundtrip_shapes(rng):
    # 64px input with the default 8 stride-2 blocks needs 256px; use a
    # truncated stack for the smoke test (capability is dim-parameterized).
    model = DFCVAE(latent_dim=16, hidden_dims=(4, 8, 16, 32, 64, 128))
    x = jnp.asarray(rng.standard_normal((2, RES, RES, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, jax.random.key(1), train=False)
    recons, mu, logvar = model.apply(variables, x, jax.random.key(2),
                                     train=False)
    assert recons.shape == (2, RES, RES, 3)
    assert mu.shape == (2, 16) and logvar.shape == (2, 16)
    assert float(jnp.max(jnp.abs(recons))) <= 1.0

    loss = dfc_vae_loss(recons, x, mu, logvar)
    assert np.isfinite(float(loss))
    # with matching feature lists the feature term adds
    feats = [recons * 2], [x * 2]
    loss_f = dfc_vae_loss(recons, x, mu, logvar, feats[0], feats[1])
    assert float(loss_f) >= float(loss) - 1e-6


@pytest.mark.slow
def test_autoencoder_roundtrip(rng):
    model = AutoEncoder(nz=8)
    x = jnp.asarray(rng.standard_normal((2, 256, 256, 3)) * 0.1, jnp.float32)
    variables = model.init(jax.random.key(0), x, jax.random.key(1), train=False)
    z, decoded, mu, logvar = model.apply(variables, x, jax.random.key(2),
                                         train=False)
    assert z.shape == (2, 8)
    assert decoded.shape == (2, 256, 256, 3)
    loss = autoencoder_loss(decoded, x, mu, logvar)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_vae_embedder_contracts(rng):
    model = AutoEncoder(nz=8)
    x = jnp.zeros((1, 256, 256, 3))
    variables = model.init(jax.random.key(0), x, jax.random.key(1), train=False)
    emb = VAEEmbedder(model, variables, kind="ae")
    images = rng.standard_normal((3, 256, 256, 3)).astype(np.float32) * 0.1
    out = emb.embed(images, batch_size=2)
    assert out.shape == (3, 8)


@pytest.mark.slow
def test_vgg19bn_tap_count_and_shapes(rng):
    from attngan_tpu.models.vgg import VGG19BNFeatures

    model = VGG19BNFeatures(taps=(14, 24))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    feats = model.apply(variables, x, train=False)
    assert len(feats) == 2
    # module 14 = first conv of stage 3 (256 ch at 16x16 for 64px input)
    assert feats[0].shape == (1, 16, 16, 256)
    # torchvision naming parity for the converter
    assert "features_0" in variables["params"]
    assert "features_14" in variables["params"]


def test_vgg_colliding_taps_raise():
    """A BN tap t collects at t+1 (post inplace-ReLU); requesting both t and
    t+1 must fail loudly instead of silently dropping one."""
    import jax
    import jax.numpy as jnp
    import pytest

    from attngan_tpu.models.vgg import VGG19BNFeatures

    net = VGG19BNFeatures(taps=(24, 25))
    with pytest.raises(ValueError, match="collide"):
        net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
