"""Fused Pallas kernel for the DAMSM pairwise word-region similarity.

The DAMSM words loss needs, for EVERY (text i, image j) pair, a full
attention (AttnGAN Eq. 7-9) plus per-word cosine similarity and the Eq. 10
log-sum-exp aggregate (reference words_loss.py:43-86 does this with a host
loop; losses/damsm.py vectorizes it with vmap). The vmapped form
materializes O(B^2 * R * L) intermediates in HBM; this kernel computes each
pair's whole chain (two matmuls, two softmaxes, cosine, logsumexp) in VMEM
and writes ONE scalar per pair.

Grid layout: one cell per image j; an in-kernel fori_loop walks all B texts
while the (R, D) region block stays resident in VMEM — region features are
loaded from HBM exactly once per image, the dominant traffic term.

Backward: custom_vjp recomputing through the jnp path (rematerialization).

Status (BENCH.md): at reference sizes XLA's vmap form is FASTER (the
per-text loop serializes small matmuls), so losses/damsm.py defaults to
vmap; this kernel stays available via fused=True and is the per-shard
compute shape for losses/damsm_sharded.py's row-sharded multi-chip design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from attngan_tpu.losses.damsm import EPS
from attngan_tpu.ops.attention import damsm_attention


def _image_row_kernel(ctx_ref, words_ref, bias_ref, maskf_ref, out_ref, *,
                      gamma1, gamma2):
    """One grid cell = one image j vs ALL texts: the (R, D) region block is
    loaded from HBM once and stays VMEM-resident across the text loop.

    Every intermediate is kept >= 2D (column/row vectors) — Mosaic's vector
    layouts reject 1D reductions.
    """
    ctx = ctx_ref[0].astype(jnp.float32)           # (R, D)
    batch = words_ref.shape[0]
    d = ctx.shape[-1]
    scale = jax.lax.rsqrt(jnp.asarray(d, jnp.float32))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, batch), 1)

    def body(i, acc):
        w = words_ref[i].astype(jnp.float32)       # (L, D) text i
        scores = jax.lax.dot_general(              # (R, L)
            ctx, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = scores + bias_ref[pl.ds(i, 1)]    # (1, L) word-mask bias
        a1 = jax.nn.softmax(scores, axis=-1)       # over words per region
        a2 = jax.nn.softmax(a1.T * gamma1, axis=-1)  # (L, R) over regions
        weighted = jnp.dot(a2, ctx, preferred_element_type=jnp.float32)
        num = jnp.sum(w * weighted, axis=-1, keepdims=True)        # (L, 1)
        norms = (jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True))
                 * jnp.sqrt(jnp.sum(weighted * weighted, axis=-1,
                                    keepdims=True)))
        cos = num / jnp.maximum(norms, EPS)        # (L, 1)
        # Eq. 10 masked sum as a (1,L)x(L,1) matmul — dynamic slicing of the
        # lane dimension isn't allowed on TPU, so the word mask is consumed
        # as a sublane-sliced ROW and contracted against the cos COLUMN.
        mask_row = maskf_ref[pl.ds(i, 1)]          # (1, L)
        agg = jnp.log(jnp.dot(mask_row, jnp.exp(gamma2 * cos),
                              preferred_element_type=jnp.float32))  # (1, 1)
        return jnp.where(lane == i, agg, acc)      # scatter via one-hot

    out_ref[0] = jax.lax.fori_loop(0, batch, body,
                                   jnp.zeros((1, batch), jnp.float32))


def _similarity_grid(img_features, words, bias, maskt, gamma1, gamma2,
                     interpret):
    b, r, d = img_features.shape
    l = words.shape[1]
    out = pl.pallas_call(
        functools.partial(_image_row_kernel, gamma1=gamma1, gamma2=gamma2),
        grid=(b,),                                  # one cell per image j
        in_specs=[
            pl.BlockSpec((1, r, d), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, l, d), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, l), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, l), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, b), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, b), jnp.float32),
        interpret=interpret,
    )(img_features, words, bias, maskt)
    return out[:, 0, :]                             # sims[j, i]


def _jnp_similarity(img_features, words, word_mask, gamma1, gamma2):
    """Oracle path (same math as losses/damsm.py::words_loss inner loop)."""
    batch = img_features.shape[0]
    wm = word_mask.astype(jnp.float32)

    def per_text(words_i, mask_i):
        query = jnp.broadcast_to(words_i[None], (batch,) + words_i.shape)
        qmask = jnp.broadcast_to(mask_i[None], (batch, mask_i.shape[0]))
        weighted, _ = damsm_attention(query, img_features, gamma1, mask=qmask)
        num = jnp.sum(query * weighted, axis=-1)
        norms = (jnp.linalg.norm(query, axis=-1)
                 * jnp.linalg.norm(weighted, axis=-1))
        cos = num / jnp.maximum(norms, EPS)
        return jnp.log(jnp.sum(jnp.exp(gamma2 * cos) * mask_i[None], axis=-1))

    sims = jax.vmap(per_text)(words, wm)       # (B_text, B_img)
    return sims.T


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _damsm_similarity(img_features, words, word_mask, gamma1, gamma2,
                      interpret):
    return _damsm_similarity_fwd(img_features, words, word_mask, gamma1,
                                 gamma2, interpret)[0]


def _damsm_similarity_fwd(img_features, words, word_mask, gamma1, gamma2,
                          interpret):
    from attngan_tpu.ops.attention import NEG_INF

    bias = jnp.where(word_mask == 0, NEG_INF, 0.0).astype(jnp.float32)
    maskf = word_mask.astype(jnp.float32)
    sims = _similarity_grid(img_features, words, bias, maskf,
                            float(gamma1), float(gamma2), interpret)
    return sims, (img_features, words, word_mask)


def _damsm_similarity_bwd(gamma1, gamma2, interpret, residuals, g):
    img_features, words, word_mask = residuals
    _, vjp = jax.vjp(
        lambda im, wd: _jnp_similarity(im, wd, word_mask, gamma1, gamma2),
        img_features, words,
    )
    d_img, d_words = vjp(g)
    return d_img, d_words, None


_damsm_similarity.defvjp(_damsm_similarity_fwd, _damsm_similarity_bwd)


def damsm_similarity_pallas(
    img_features: jax.Array,   # (B, R, D)
    words: jax.Array,          # (B, L, D)
    word_mask: jax.Array,      # (B, L)
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    interpret: bool | None = None,
) -> jax.Array:
    """sims[j, i] = Eq. 10 similarity of (image j, text i); (B, B) fp32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _damsm_similarity(img_features, words, word_mask,
                             float(gamma1), float(gamma2), interpret)


def words_loss_pallas(img_features, words_emb, labels, word_mask, class_ids,
                      gamma1=4.0, gamma2=5.0, gamma3=10.0, wlambda=5.0):
    """Drop-in fused replacement for losses.damsm.words_loss (no attention
    maps output — fetch diagonal maps via ops.attention.damsm_attention)."""
    from attngan_tpu.losses.damsm import _class_mask, _symmetric_ce
    from attngan_tpu.ops.attention import NEG_INF

    sims = damsm_similarity_pallas(img_features, words_emb, word_mask,
                                   gamma1, gamma2) * gamma3
    if class_ids is not None:
        sims = jnp.where(_class_mask(class_ids), NEG_INF, sims)
    return _symmetric_ce(sims, labels) * wlambda
