"""Per-resolution unconditional discriminators.

Reference: networks/discriminators.py:10-70 (Disc64/Disc128/Disc256). All
share the 16x image encoder stack and a Conv(4x4, stride 4) -> sigmoid head
that maps the final (4, 4, 8*df) code to one probability per image; the
128/256 variants insert extra DownBlocks plus 3x3 squeezer blocks to get
back to 8*df channels at 4x4. A single ``Discriminator`` module is
parameterized by resolution instead of three near-identical classes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from attngan_tpu.ops.layers import (
    Block3x3LeakyRelu,
    DownBlock,
    ImageEncoder16x,
)


class Discriminator(nn.Module):
    """(B, R, R, 3) in [-1, 1] -> (B,) probability of real.

    resolution=64  : encoder16x -> head                       (Disc64, :10-23)
    resolution=128 : + DownBlock(16df) + Block3x3(8df)        (Disc128, :27-45)
    resolution=256 : + DownBlock(16df) + DownBlock(32df)
                     + Block3x3(16df) + Block3x3(8df)         (Disc256, :48-70)
    """

    df_dim: int = 64
    resolution: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        assert x.shape[1] == x.shape[2] == self.resolution, (
            f"expected {self.resolution}px input, got {x.shape}"
        )
        df = self.df_dim
        x = ImageEncoder16x(df, dtype=self.dtype)(x, train=train)
        if self.resolution >= 128:
            x = DownBlock(df * 16, dtype=self.dtype)(x, train=train)
        if self.resolution >= 256:
            x = DownBlock(df * 32, dtype=self.dtype)(x, train=train)
            x = Block3x3LeakyRelu(df * 16, dtype=self.dtype)(x, train=train)
        if self.resolution >= 128:
            x = Block3x3LeakyRelu(df * 8, dtype=self.dtype)(x, train=train)
        # Head: Conv2d(8df -> 1, kernel 4, stride 4) + sigmoid (ref :15-18)
        x = nn.Conv(1, (4, 4), strides=4, padding=0, dtype=self.dtype)(x)
        return jax.nn.sigmoid(x.astype(jnp.float32)).reshape(-1)
