"""Fused Pallas kernel for generator word-context attention.

The hot attention in the generator (reference networks/attention.py:59-73:
bmm -> scale -> mask -> softmax -> bmm) runs at pixel counts of 4096 (64px)
and 16384 (128px) per image with a tiny word axis (L <= 16). Under plain XLA
the two bmms are separate kernels with the (B, P, L) attention tensor making
an HBM round trip between them; this kernel fuses score computation, mask,
softmax, and the context matmul into one pass over pixel blocks, everything
VMEM-resident. No online softmax is needed — the softmax axis (words) is
tiny and fully resident.

Backward: wrapped in jax.custom_vjp; the backward pass recomputes through
the pure-jnp reference (ops/attention.py::word_attention) and reuses its
VJP — rematerialization over residual storage (HBM-bandwidth-friendly).

The kernel is numerically equivalent to word_attention (oracle-tested in
tests/test_pallas.py) and is used automatically for aligned shapes via
``word_attention_auto``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from attngan_tpu.ops.attention import NEG_INF, word_attention


def _attention_kernel(img_ref, words_ref, bias_ref, ctx_ref, attn_ref):
    img = img_ref[0]                    # (block_p, C)
    words = words_ref[0]                # (L, C)
    c = img.shape[-1]
    scale = jax.lax.rsqrt(jnp.asarray(c, jnp.float32))
    scores = jax.lax.dot_general(
        img, words, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                           # (block_p, L)
    scores = scores + bias_ref[0]       # bias block (1, 1, L) -> (1, L)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.dot(attn.astype(words.dtype), words,
                  preferred_element_type=jnp.float32)
    ctx_ref[0] = ctx.astype(ctx_ref.dtype)
    attn_ref[0] = attn.astype(attn_ref.dtype)


def _attention_fwd_flat(images_flat: jax.Array, words: jax.Array,
                        bias: jax.Array, block_p: int, interpret: bool):
    b, p, c = images_flat.shape
    l = words.shape[1]
    grid = (b, pl.cdiv(p, block_p))
    ctx, attn = pl.pallas_call(
        _attention_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_p, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_p, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_p, l), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, p, c), images_flat.dtype),
            jax.ShapeDtypeStruct((b, p, l), jnp.float32),
        ],
        interpret=interpret,
    )(images_flat, words, bias)
    return ctx, attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _word_attention_pallas(images, words, mask, block_p, interpret):
    ctx, attn = _word_attention_pallas_fwd(images, words, mask, block_p,
                                           interpret)[0]
    return ctx, attn


def _word_attention_pallas_fwd(images, words, mask, block_p, interpret):
    b, h, w, c = images.shape
    bias = jnp.where(mask == 0, NEG_INF, 0.0).astype(jnp.float32)
    bias = bias[:, None, :]             # (B, 1, L) for TPU block tiling
    ctx, attn = _attention_fwd_flat(images.reshape(b, h * w, c), words, bias,
                                    block_p, interpret)
    ctx = ctx.reshape(b, h, w, c)
    attn_maps = attn.transpose(0, 2, 1).reshape(b, -1, h, w)
    return (ctx, attn_maps), (images, words, mask)


def _word_attention_pallas_bwd(block_p, interpret, residuals, grads):
    images, words, mask = residuals
    _, vjp = jax.vjp(lambda im, wd: word_attention(im, wd, mask), images, words)
    d_images, d_words = vjp(grads)
    return d_images, d_words, None


_word_attention_pallas.defvjp(_word_attention_pallas_fwd,
                              _word_attention_pallas_bwd)


def word_attention_pallas(
    images: jax.Array,   # (B, H, W, C)
    words: jax.Array,    # (B, L, C)
    mask: jax.Array,     # (B, L)
    block_p: int = 1024,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in fused replacement for ops.attention.word_attention."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = images.shape
    p = h * w
    block_p = min(block_p, p)
    return _word_attention_pallas(images, words, mask, block_p, interpret)


def word_attention_auto(images, words, mask):
    """Route to the fused Pallas kernel on TPU when shapes tile cleanly;
    fall back to the jnp path elsewhere (CPU interpret mode is for tests)."""
    b, h, w, c = images.shape
    p = h * w
    if jax.default_backend() == "tpu" and p % 256 == 0 and c >= 8:
        return word_attention_pallas(images, words, mask,
                                     block_p=min(1024, p), interpret=False)
    return word_attention(images, words, mask)
