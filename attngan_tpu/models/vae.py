"""Alternative image embedders: DFCVAE and plain conv AutoEncoder.

Reference: networks/VAE.py:11-215 (DFCVAE) and networks/autoencoder.py:16-123
(AutoEncoder). Both are off the main training path — alternative embedders
for the clustering captioner (their ``embed`` output can replace the
ResNet-18 features feeding HierarchicalClusterer) — and are part of the
capability surface.

DFCVAE: 8-block stride-2 conv encoder 256px -> 1x1x512, fc mu/logvar heads,
mirrored ConvTranspose decoder, tanh output; loss = beta * (pixel MSE +
VGG19-BN deep-feature MSE at taps [14, 24, 34, 43]) + alpha * KLD
(VAE.py:164-188). Its ``embed`` returns the LOGVAR vector — a reference
quirk preserved deliberately (VAE.py:199-215).

AutoEncoder: 8x DownBlockLeakyReLU encoder -> fc bottleneck (mu/logvar) ->
fc -> 8x UpBlockReLU decoder + tanh; loss = pixel MSE + mean KLD
(autoencoder.py:79-83); ``embed`` returns the sampled z.

Randomness is explicit (PRNG keys); feature nets are pluggable so the
VGG19-BN trunk can be dropped for tests or replaced after weight conversion.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from attngan_tpu.ops.layers import (
    DownBlockLeakyReLU,
    TorchBatchNorm,
    UpBlockReLU,
    conv3x3,
)

DFC_HIDDEN_DIMS = (4, 8, 16, 32, 64, 128, 256, 512)


def _reparametrize(rng, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    return mu + jax.random.normal(rng, std.shape, std.dtype) * std


class DFCVAE(nn.Module):
    """Deep-feature-consistent VAE (reference VAE.py:11-215)."""

    latent_dim: int = 128
    hidden_dims: Sequence[int] = DFC_HIDDEN_DIMS
    alpha: float = 1.0
    beta: float = 0.5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, rng: jax.Array, train: bool = True):
        """x (B, 256, 256, 3) in [-1, 1] -> (recons, mu, logvar)."""
        d = self.dtype
        h = x
        for width in self.hidden_dims:                 # 256 -> 1 spatial
            h = nn.Conv(width, (3, 3), strides=2, padding=1, dtype=d)(h)
            h = TorchBatchNorm(use_running_average=not train, dtype=d)(h)
            h = nn.leaky_relu(h, negative_slope=0.01)
        h = h.reshape(h.shape[0], -1)                  # (B, 512)
        mu = nn.Dense(self.latent_dim, name="fc_mu")(h)
        logvar = nn.Dense(self.latent_dim, name="fc_var")(h)
        z = _reparametrize(rng, mu, logvar)

        rev = list(self.hidden_dims)[::-1]
        y = nn.Dense(rev[0], name="decoder_input")(z)
        y = y.reshape(-1, 1, 1, rev[0])
        for width in rev[1:]:                          # 1 -> 128 spatial
            y = nn.ConvTranspose(width, (3, 3), strides=(2, 2),
                                 padding="SAME", dtype=d)(y)
            y = TorchBatchNorm(use_running_average=not train, dtype=d)(y)
            y = nn.leaky_relu(y, negative_slope=0.01)
        y = nn.ConvTranspose(rev[-1], (3, 3), strides=(2, 2),
                             padding="SAME", dtype=d)(y)  # -> 256
        y = TorchBatchNorm(use_running_average=not train, dtype=d)(y)
        y = nn.leaky_relu(y, negative_slope=0.01)
        recons = jnp.tanh(conv3x3(3, use_bias=True, dtype=d)(y)
                          .astype(jnp.float32))
        return recons, mu, logvar


def dfc_vae_loss(
    recons: jax.Array,
    inputs: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    recons_features: Optional[List[jax.Array]] = None,
    input_features: Optional[List[jax.Array]] = None,
    alpha: float = 1.0,
    beta: float = 0.5,
) -> jax.Array:
    """beta * (pixel MSE + deep-feature MSE) + alpha * KLD (VAE.py:164-188)."""
    recons_loss = jnp.mean(jnp.square(recons - inputs))
    feature_loss = 0.0
    if recons_features is not None:
        for r, i in zip(recons_features, input_features):
            feature_loss = feature_loss + jnp.mean(jnp.square(r - i))
    kld = jnp.mean(-0.5 * jnp.sum(
        1 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=1))
    return beta * (recons_loss + feature_loss) + alpha * kld


class AutoEncoder(nn.Module):
    """Plain conv VAE 256px <-> nz latent (reference autoencoder.py:62-123)."""

    nz: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, rng: jax.Array, train: bool = True):
        """Returns (z, decoded, mu, logvar)."""
        d = self.dtype
        widths = (8, 16, 32, 64, 128, 256, 512, 1024)
        h = x
        for w in widths:                               # 256 -> 1 spatial
            h = DownBlockLeakyReLU(w, dtype=d)(h, train=train)
        h = h.reshape(h.shape[0], -1)                  # (B, 1024)
        h1 = nn.Dense(512, name="fc1")(h)
        mu = nn.Dense(self.nz, name="fc21")(h1)
        logvar = nn.Dense(self.nz, name="fc22")(h1)
        z = _reparametrize(rng, mu, logvar)
        y = nn.relu(nn.Dense(512, name="fc3")(z))
        y = nn.Dense(1024, name="fc4")(y)
        y = y.reshape(-1, 1, 1, 1024)
        for w in (512, 256, 128, 64, 32, 16, 8, 3):    # 1 -> 256 spatial
            y = UpBlockReLU(w, dtype=d)(y, train=train)
        decoded = jnp.tanh(y.astype(jnp.float32))
        return z, decoded, mu, logvar


def autoencoder_loss(recon_x, x, mu, logvar) -> jax.Array:
    """Pixel MSE + mean KLD (reference autoencoder.py:79-83)."""
    mse = jnp.mean(jnp.square(recon_x - x))
    kld = -0.5 * jnp.mean(jnp.mean(
        1 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=1))
    return mse + kld


class VAEEmbedder:
    """Batched frozen embedder with the reference ``embed`` contracts:
    DFCVAE.embed -> logvar (VAE.py:199-215, quirk preserved);
    AutoEncoder.embed -> sampled z (autoencoder.py:107-123).
    Interchangeable with models.resnet.ImageEmbedder for the clusterer."""

    def __init__(self, model, variables, kind: str = "dfc", seed: int = 0):
        assert kind in ("dfc", "ae")
        self.model, self.variables, self.kind = model, variables, kind
        self._rng = jax.random.key(seed)

        def fwd(v, x, rng):
            out = self.model.apply(v, x, rng, train=False)
            return out[2] if self.kind == "dfc" else out[0]  # logvar | z

        self._fwd = jax.jit(fwd)

    def embed(self, images, batch_size: int = 32):
        import numpy as np

        out = []
        for start in range(0, images.shape[0], batch_size):
            batch = jnp.asarray(images[start : start + batch_size])
            self._rng, sub = jax.random.split(self._rng)
            out.append(np.asarray(self._fwd(self.variables, batch, sub)))
        return np.concatenate(out, axis=0)
