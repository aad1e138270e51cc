"""Attention primitives, pure-jnp reference implementations.

Two attentions exist in the reference:

* ``word_attention`` — the generator's learned word-context attention core
  (reference networks/attention.py:15-79 ``AttentionModule.forward``): image
  pixels attend over caption words; padded words are masked to -inf before
  the softmax. The learned conv1x1 word projection lives in the calling
  linen module; this function is the parameter-free math, so it can be
  swapped for the fused Pallas kernel (ops/pallas_attention.py) 1:1.

* ``damsm_attention`` — the parameter-free DAMSM attention (reference
  networks/attention.py:82-121 ``func_attention``; AttnGAN Eq. 7-9): caption
  words attend over 17x17 image regions, with a second gamma1-sharpened
  softmax over regions. The reference avoids word masking by slicing each
  caption to its true length in a host loop (words_loss.py:49-53); here the
  word axis is static and a mask argument replaces the ragged slicing.

Layouts are TPU-native: images (B, H, W, C); words (B, L, D); regions
(B, R, D). (The reference uses channel-first (B, C, L) / (B, C, H, W).)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Large-negative fill for masked logits. Not -inf: exp(-inf - -inf) => NaN in
# fully-masked rows, and the fused kernels subtract running maxima.
NEG_INF = -1e9


def word_attention(
    images: jax.Array,   # (B, H, W, C) pixel features (query)
    words: jax.Array,    # (B, L, C) projected word features (key & value)
    mask: jax.Array,     # (B, L) 1 for real words, 0 for padding
    scaled: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Pixels attend over words; returns (context (B,H,W,C), attn (B,L,H,W)).

    Matches reference attention.py:25-79: scores = pixels.words / sqrt(C),
    -inf where mask==0, softmax over words, context = attn-weighted words.
    """
    b, h, w, c = images.shape
    scale = (1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))) if scaled else 1.0
    pix = images.reshape(b, h * w, c)
    scores = jnp.einsum(
        "bpc,blc->bpl", pix, words, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(mask[:, None, :] == 0, NEG_INF, scores)
    attn = jax.nn.softmax(scores, axis=-1)                      # (B, P, L)
    context = jnp.einsum(
        "bpl,blc->bpc", attn.astype(words.dtype), words,
        preferred_element_type=jnp.float32,
    ).astype(images.dtype)
    attn_maps = attn.transpose(0, 2, 1).reshape(b, -1, h, w)    # (B, L, H, W)
    return context.reshape(b, h, w, c), attn_maps


def damsm_attention(
    query: jax.Array,              # (B, L, D) word embeddings
    context: jax.Array,            # (B, R, D) image region features (R=17*17)
    gamma1: float = 4.0,
    mask: Optional[jax.Array] = None,  # (B, L) 1=real word; None = all valid
    scaled: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """AttnGAN Eq. 7-9 (reference func_attention, attention.py:82-121).

    Softmax #1 normalizes over words per region (scaled by 1/sqrt(D)); the
    transposed result is sharpened by gamma1 and softmax #2 normalizes over
    regions per word; the weighted context is the region features mixed by
    the second attention. Returns (weighted (B,L,D), attn (B,L,R)).
    """
    d = query.shape[-1]
    scale = (1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))) if scaled else 1.0
    scores = jnp.einsum(
        "brd,bld->brl", context, query, preferred_element_type=jnp.float32
    ) * scale                                                    # (B, R, L)
    if mask is not None:
        scores = jnp.where(mask[:, None, :] == 0, NEG_INF, scores)
    attn = jax.nn.softmax(scores, axis=-1)                       # over words
    attn = attn.transpose(0, 2, 1) * gamma1                      # (B, L, R)
    attn = jax.nn.softmax(attn, axis=-1)                         # over regions
    weighted = jnp.einsum(
        "blr,brd->bld", attn.astype(context.dtype), context,
        preferred_element_type=jnp.float32,
    ).astype(query.dtype)
    return weighted, attn
