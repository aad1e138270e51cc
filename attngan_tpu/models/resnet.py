"""ResNet-18 image embedder for the clustering captioner, flax/NHWC.

Reference: networks/cnn_embedder.py:14-38 — a frozen torchvision resnet18
minus its fc layer; ``embed`` batches images through it and returns (M, 512)
features that the HierarchicalClusterer reduces and clusters
(data/bedrooms.py:255-259). Module names mirror torchvision's resnet18
state_dict keys (conv1, bn1, layer1.0.conv1, ...) for the weight converter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from attngan_tpu.ops.layers import TorchBatchNorm

BN_EPS = 1e-5
BN_MOMENTUM = 0.9


def _bn(name, train, dtype=None):
    return TorchBatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                          epsilon=BN_EPS, name=name, dtype=dtype)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, name="conv1", dtype=self.dtype)(x)
        y = _bn("bn1", train, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=1, padding=1,
                    use_bias=False, name="conv2", dtype=self.dtype)(y)
        y = _bn("bn2", train, self.dtype)(y)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, name="downsample_conv",
                               dtype=self.dtype)(x)
            identity = _bn("downsample_bn", train, self.dtype)(identity)
        return nn.relu(y + identity)


class ResNet18(nn.Module):
    """(B, H, W, 3) -> (B, 512) pooled features (fc removed, as in the
    reference's ``Sequential(*children[:-1])``, cnn_embedder.py:17-18)."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1", dtype=d)(x)
        x = _bn("bn1", train, d)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for layer_idx, (features, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)], start=1
        ):
            x = BasicBlock(features, strides=stride, downsample=(stride != 1),
                           name=f"layer{layer_idx}_0", dtype=d)(x, train)
            x = BasicBlock(features, name=f"layer{layer_idx}_1", dtype=d)(x, train)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1


class ImageEmbedder:
    """Frozen batched embedder (reference ImageEmbedder.embed, :28-38).

    Host-side convenience wrapper: jit-compiles the forward once and maps
    over fixed-size batches, returning a single (M, 512) numpy array.
    """

    def __init__(self, variables=None, rng_seed: int = 0, dtype=None):
        self.model = ResNet18(dtype=dtype)
        if variables is None:
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            variables = self.model.init(jax.random.key(rng_seed), dummy)
        self.variables = variables
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))

    def embed(self, images: np.ndarray, batch_size: int = 32) -> np.ndarray:
        m = images.shape[0]
        out = []
        for start in range(0, m, batch_size):
            batch = jnp.asarray(images[start : start + batch_size])
            if batch.shape[0] < batch_size:  # pad to keep one compiled shape
                pad = batch_size - batch.shape[0]
                padded = jnp.pad(batch, ((0, pad), (0, 0), (0, 0), (0, 0)))
                emb = self._fwd(self.variables, padded)[: batch.shape[0]]
            else:
                emb = self._fwd(self.variables, batch)
            out.append(np.asarray(emb))
        return np.concatenate(out, axis=0)
