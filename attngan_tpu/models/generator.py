"""3-stage attentional generator cascade.

Reference: networks/generator.py:12-66 and networks/generator_submodules.py.
Structure (gf_dim=32, emb_dim=256, z_dim=100, cond_dim=100 per train.py:34-38):

  CondAugment (VarAutoEncoder, submodules:145-170): sent_emb -> Dense(4*cond)
    -> GLU -> (mu, logvar) -> reparametrized condition code.
  InitialStage (GenInitialStage, submodules:13-66): concat(noise, cond) ->
    Dense(16*gf*4*4*2, no bias) -> BN -> GLU -> (4,4,16*gf) -> 4x UpBlock
    -> (64,64,gf).
  NextStage (GenNextStage, submodules:69-120): word attention -> concat ->
    2x ResBlock(2*gf) -> UpBlock(2*gf -> gf), doubling resolution.
  MakeImage (GenMakeImage, submodules:123-142): conv3x3 -> tanh -> RGB.

The whole cascade is one pure function under jit — XLA fuses the
upsample+conv+BN+GLU chains; the word attention can route through the fused
Pallas kernel (ops/pallas_attention.py). Randomness (reparametrization) is
explicit: callers pass a PRNG key instead of the reference's implicit
``torch.cuda.FloatTensor.normal_()`` (submodules:163).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from attngan_tpu.ops.attention import word_attention
from attngan_tpu.ops.layers import (
    ResBlock,
    UpBlock,
    batch_norm,
    conv1x1,
    conv3x3,
    glu,
)


class CondAugment(nn.Module):
    """Conditioning augmentation ("VarAutoEncoder", submodules:145-170)."""

    cond_dim: int = 100

    @nn.compact
    def __call__(self, sent_emb: jax.Array, rng: jax.Array):
        x = nn.Dense(self.cond_dim * 4)(sent_emb)
        x = glu(x)                                   # (B, 2*cond)
        mu = x[:, : self.cond_dim]
        logvar = x[:, self.cond_dim :]
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, std.shape, std.dtype)
        return mu + eps * std, mu, logvar


class InitialStage(nn.Module):
    """(noise, condition) -> (B, 64, 64, gf) feature map (submodules:13-66)."""

    gf_dim: int  # full width at 4x4, i.e. 16 * base gf (reference "ng")
    dtype: jnp.dtype | None = None
    fused_upsample: bool | str = False

    @nn.compact
    def __call__(self, noise, condition, train: bool = True):
        ng = self.gf_dim
        x = jnp.concatenate([noise, condition], axis=-1)
        x = nn.Dense(ng * 4 * 4 * 2, use_bias=False, dtype=self.dtype)(x)
        x = batch_norm(train, dtype=self.dtype)(x)
        x = glu(x)
        x = x.reshape(-1, 4, 4, ng)
        for div in (2, 4, 8, 16):
            x = UpBlock(ng // div, dtype=self.dtype,
                        fused_inference=self.fused_upsample)(x, train=train)
        return x  # (B, 64, 64, ng // 16)


class NextStage(nn.Module):
    """Word attention + residual merge + 2x upsample (submodules:69-120)."""

    gf_dim: int
    num_residual: int = 2
    dtype: jnp.dtype | None = None
    # Measured on v5e at reference dims (gf=32, B=128, 3 stages): the XLA
    # bmm->mask->softmax->bmm chain beats the fused Pallas kernel (51 ms vs
    # 71 ms/batch) — at C=gf=32 the kernel wastes 3/4 of the 128-wide vector
    # lanes. Flip on for wide-channel variants where the fusion pays.
    fused_attention: bool = False
    fused_upsample: bool | str = False  # Pallas eval UpBlock (True/"pallas"/"packed")

    @nn.compact
    def __call__(self, images, word_embs, mask, train: bool = True):
        # AttentionModule's learned conv1x1 word projection (attention.py:19,50-52)
        words_p = conv1x1(self.gf_dim, name="word_proj", dtype=self.dtype)(
            word_embs[:, None, :, :]
        )[:, 0]                                      # (B, L, gf)
        if self.fused_attention:
            from attngan_tpu.ops.pallas_attention import word_attention_auto

            context, attn = word_attention_auto(images, words_p, mask)
        else:
            context, attn = word_attention(images, words_p, mask, scaled=True)
        x = jnp.concatenate([images, context], axis=-1)   # (B, h, w, 2*gf)
        for _ in range(self.num_residual):
            x = ResBlock(self.gf_dim * 2, dtype=self.dtype)(x, train=train)
        x = UpBlock(self.gf_dim, dtype=self.dtype,
                    fused_inference=self.fused_upsample)(x, train=train)
        return x, attn


class MakeImage(nn.Module):
    """Feature map -> RGB in [-1, 1] (submodules:123-142)."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        return jnp.tanh(conv3x3(3, dtype=self.dtype)(x).astype(jnp.float32))


class Generator(nn.Module):
    """Full cascade (reference networks/generator.py:37-66).

    __call__(noise (B,z), sent_emb (B,emb), word_embs (B,L,emb), mask (B,L),
    rng) -> (fake_imgs [per-stage (B,R,R,3)], attn_maps [per-attn-stage
    (B,L,h,w)], mu, logvar).
    """

    gf_dim: int = 32
    emb_dim: int = 256
    z_dim: int = 100
    cond_dim: int = 100
    num_stages: int = 3           # 1=64px, 2=+128, 3=+256
    dtype: jnp.dtype | None = None
    fused_attention: bool = False  # see NextStage.fused_attention
    fused_upsample: bool | str = False  # Pallas eval UpBlock (True/"pallas"/"packed")

    @nn.compact
    def __call__(
        self,
        noise: jax.Array,
        sent_emb: jax.Array,
        word_embs: jax.Array,
        mask: jax.Array,
        rng: jax.Array,
        train: bool = True,
    ) -> Tuple[List[jax.Array], List[jax.Array], jax.Array, jax.Array]:
        condition, mu, logvar = CondAugment(self.cond_dim)(sent_emb, rng)

        fake_imgs: List[jax.Array] = []
        attn_maps: List[jax.Array] = []

        x = InitialStage(self.gf_dim * 16, dtype=self.dtype,
                         fused_upsample=self.fused_upsample, name="gen1")(
            noise, condition, train=train
        )
        fake_imgs.append(MakeImage(dtype=self.dtype, name="img_out1")(x))

        for stage in range(2, self.num_stages + 1):
            x, attn = NextStage(self.gf_dim, dtype=self.dtype,
                                fused_attention=self.fused_attention,
                                fused_upsample=self.fused_upsample,
                                name=f"gen{stage}")(
                x, word_embs, mask, train=train
            )
            fake_imgs.append(
                MakeImage(dtype=self.dtype, name=f"img_out{stage}")(x)
            )
            attn_maps.append(attn)

        return fake_imgs, attn_maps, mu, logvar
