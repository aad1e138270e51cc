"""Fused Pallas kernel for the DAMSM pairwise word-region similarity.

The DAMSM words loss needs, for EVERY (text i, image j) pair, a full
attention (AttnGAN Eq. 7-9) plus per-word cosine similarity and the Eq. 10
log-sum-exp aggregate (reference words_loss.py:43-86 does this with a host
loop; losses/damsm.py vectorizes it with vmap). The vmapped form
materializes O(B^2 * R * L) intermediates in HBM; this kernel computes each
pair's whole chain (two matmuls, two softmaxes, cosine, logsumexp) in VMEM
and writes ONE scalar per pair.

Grid layout (kernel v2): one cell per image j computing ALL B texts at once
— the (R, D) region block is loaded from HBM exactly once per image (the
dominant traffic term) and the per-pair chain runs as two MXU-wide matmuls
over the flattened (B*L, D) word matrix with sublane-group softmaxes.
(Kernel v1 walked texts in a fori_loop, serializing L=8-column matmuls,
and lost to XLA 5.9 ms vs 1.6 ms at reference dims — BENCH.md r1 #4.)

Backward: custom_vjp recomputing through the jnp path (rematerialization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from attngan_tpu.losses.damsm import EPS
from attngan_tpu.ops.attention import damsm_attention


def _image_cell_kernel(ctx_ref, words_ref, bias_ref, maskf_ref, gsel_ref,
                       gstart_ref, out_ref, *, gamma1, gamma2, l_static):
    """One grid cell = one image j vs ALL texts AT ONCE (kernel v2).

    The (R, D) region block is loaded from HBM once; all B texts' words
    arrive pre-flattened as one (B*L, D) operand so both matmuls run at
    MXU-friendly sizes — v1's per-text fori_loop serialized (R,D)x(D,L)
    matmuls with L=8 output columns, idling >90% of the array (BENCH.md r1:
    5.9 ms vs XLA's 1.6 ms).

    Mosaic constraint: sublane<->lane shape casts like (B,L)->(B*L,1) are
    unsupported, so the kernel contains NO reshapes — and neither strided
    row slices (s[j::L]) nor lax.slice with stride L lower (gather /
    extract_strided_slice stride limits). The word-group softmax (softmax
    #1, over L words per region) shifts by the PER-GROUP max instead
    computed with sublane ROTATIONS: max over j of roll(s, -j) leaves each
    group's true max at its FIRST row (each text's words are contiguous
    rows), the 0/1 start-row selector matmul gstart extracts those rows
    exactly, and gsel scatters them back. (A global max shift underflows
    entire low-scoring groups to zero when any pair's score exceeds theirs
    by ~88 — softmax is only shift-invariant per group.) Softmax #2 over
    regions is a plain lane reduction.
    """
    ctx = ctx_ref[0].astype(jnp.float32)           # (R, D)
    w = words_ref[...].astype(jnp.float32)         # (B*L, D) pre-flattened
    gsel = gsel_ref[...]                           # (B, B*L) group selector
    gstart = gstart_ref[...]                       # (B, B*L) start-row sel
    d = ctx.shape[-1]
    num_words = l_static
    scale = jax.lax.rsqrt(jnp.asarray(d, jnp.float32))
    s = jax.lax.dot_general(                       # (B*L, R)
        w, ctx, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s + bias_ref[...]                          # (B*L, 1) -1e9 word pads
    # softmax #1 over WORDS per region (attention.py:83): running max over
    # the L rotations puts each group's max at its first row (groups are
    # contiguous and aligned, so no wraparound reaches a start row)...
    m = s
    total_rows = s.shape[0]
    for j in range(1, num_words):
        # roll requires a non-negative shift; rolling UP by j == rolling
        # down by (rows - j)
        m = jnp.maximum(m, pltpu.roll(s, total_rows - j, 0))
    gmax = jnp.dot(gstart, m, preferred_element_type=jnp.float32)  # (B, R)
    # ...scattered back to every row through the 0/1 selector (exact)
    shift = jax.lax.dot_general(                   # (B*L, R)
        gsel, gmax, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    e1 = jnp.exp(s - shift)
    gsum = jnp.dot(gsel, e1, preferred_element_type=jnp.float32)  # (B, R)
    denom = jax.lax.dot_general(                   # (B*L, R) scatter back
        gsel, gsum, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    a1 = e1 / jnp.maximum(denom, EPS)
    # softmax #2 over REGIONS per word, gamma1-sharpened (attention.py:84-85)
    t = a1 * gamma1
    e2 = jnp.exp(t - jnp.max(t, axis=-1, keepdims=True))
    a2 = e2 / jnp.sum(e2, axis=-1, keepdims=True)
    weighted = jnp.dot(a2, ctx, preferred_element_type=jnp.float32)  # (BL, D)
    num = jnp.sum(w * weighted, axis=-1, keepdims=True)              # (BL, 1)
    norms = (jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True))
             * jnp.sqrt(jnp.sum(weighted * weighted, axis=-1,
                                keepdims=True)))
    cos = num / jnp.maximum(norms, EPS)
    # Eq. 10: log sum_l exp(gamma2*cos) over REAL words, grouped per text
    expg = jnp.exp(gamma2 * cos) * maskf_ref[...]                    # (BL, 1)
    agg = jnp.dot(gsel, expg, preferred_element_type=jnp.float32)    # (B, 1)
    out_ref[0] = jnp.log(agg)


def _image_cell_bwd_kernel(ctx_ref, words_ref, bias_ref, maskf_ref, gsel_ref,
                           gstart_ref, gt_ref, dctx_ref, dwords_ref, *,
                           gamma1, gamma2, l_static):
    """Backward of one image cell: hand-derived VJP of the fwd chain.

    Recomputes the forward intermediates in VMEM (they were never
    materialized), then walks the chain backwards: Eq.10 logsumexp ->
    cosine -> weighted-context matmul -> region softmax -> word-group
    softmax -> score matmul. dctx (R, D) is this cell's own output block;
    dwords (B*L, D) accumulates across the sequential grid (constant index
    map keeps the block VMEM-resident; zeroed at cell 0). The incoming
    cotangent arrives PRE-TRANSPOSED (gt[:, j] = g[j, :]) so the kernel
    needs no sublane<->lane transpose.
    """
    j = pl.program_id(0)
    ctx = ctx_ref[0].astype(jnp.float32)           # (R, D)
    w = words_ref[...].astype(jnp.float32)         # (B*L, D)
    gsel = gsel_ref[...]                           # (B, B*L)
    gstart = gstart_ref[...]                       # (B, B*L)
    gt = gt_ref[...]                               # (B, B): gt[:, j]=g[j, :]
    # column j via a one-hot lane mask + reduction (dynamic lane slicing and
    # sub-128 lane blocks are both unsupported)
    lane = jax.lax.broadcasted_iota(jnp.int32, gt.shape, 1)
    g_col = jnp.sum(jnp.where(lane == j, gt, 0.0), axis=1,
                    keepdims=True)                 # (B, 1) = dL/d sims[j, :]
    d = ctx.shape[-1]
    num_words = l_static
    scale = jax.lax.rsqrt(jnp.asarray(d, jnp.float32))

    # ---- forward recompute (mirrors _image_cell_kernel) ----
    s = jax.lax.dot_general(w, ctx, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[...]
    m = s
    total_rows = s.shape[0]
    for jj in range(1, num_words):
        m = jnp.maximum(m, pltpu.roll(s, total_rows - jj, 0))
    gmax = jnp.dot(gstart, m, preferred_element_type=jnp.float32)
    shift = jax.lax.dot_general(gsel, gmax, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    e1 = jnp.exp(s - shift)
    gsum = jnp.dot(gsel, e1, preferred_element_type=jnp.float32)
    denom = jax.lax.dot_general(gsel, gsum, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    a1 = e1 / jnp.maximum(denom, EPS)
    t = a1 * gamma1
    e2 = jnp.exp(t - jnp.max(t, axis=-1, keepdims=True))
    a2 = e2 / jnp.sum(e2, axis=-1, keepdims=True)
    v = jnp.dot(a2, ctx, preferred_element_type=jnp.float32)   # (BL, D)
    num = jnp.sum(w * v, axis=-1, keepdims=True)               # (BL, 1)
    wn = jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True))
    vn = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    norms = wn * vn
    nc = jnp.maximum(norms, EPS)
    cos = num / nc
    expg = jnp.exp(gamma2 * cos) * maskf_ref[...]              # (BL, 1)
    agg = jnp.dot(gsel, expg, preferred_element_type=jnp.float32)  # (B, 1)

    # ---- backward ----
    d_agg = g_col / agg                                        # (B, 1)
    d_expg = jax.lax.dot_general(gsel, d_agg, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    d_cos = d_expg * gamma2 * expg                             # (BL, 1)
    d_num = d_cos / nc
    d_norms = jnp.where(norms > EPS, -d_cos * num / (nc * nc), 0.0)
    d_wn = d_norms * vn
    d_vn = d_norms * wn
    d_w = d_num * v + d_wn * w / jnp.maximum(wn, EPS)          # (BL, D)
    d_v = d_num * w + d_vn * v / jnp.maximum(vn, EPS)          # (BL, D)
    # v = a2 @ ctx
    d_a2 = jax.lax.dot_general(d_v, ctx, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (BL,R)
    d_ctx = jax.lax.dot_general(a2, d_v, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (R,D)
    # a2 = softmax over regions of t = gamma1 * a1
    d_t = a2 * (d_a2 - jnp.sum(d_a2 * a2, axis=-1, keepdims=True))
    d_a1 = d_t * gamma1
    # a1 = softmax over each text's words (rows within a group, per region)
    inner = jnp.dot(gsel, d_a1 * a1, preferred_element_type=jnp.float32)
    d_s = a1 * (d_a1 - jax.lax.dot_general(
        gsel, inner, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    # s = scale * (w @ ctx^T) + bias
    d_w = d_w + scale * jnp.dot(d_s, ctx, preferred_element_type=jnp.float32)
    d_ctx = d_ctx + scale * jax.lax.dot_general(
        d_s, w, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dctx_ref[0] = d_ctx

    @pl.when(j == 0)
    def _zero():
        dwords_ref[...] = jnp.zeros_like(dwords_ref)

    dwords_ref[...] += d_w


def _similarity_grid_bwd(img_features, words_flat, bias_flat, maskf_flat,
                         gsel, gstart, g, gamma1, gamma2, interpret):
    b, r, d = img_features.shape
    bl = words_flat.shape[0]
    l = bl // b
    gt = g.T                                        # gt[:, j] = g[j, :]
    d_img, d_words = pl.pallas_call(
        functools.partial(_image_cell_bwd_kernel, gamma1=gamma1,
                          gamma2=gamma2, l_static=l),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r, d), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bl, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bl, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bl, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, bl), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, bl), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, b), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, r, d), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bl, d), lambda j: (0, 0),   # accumulated
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, r, d), jnp.float32),
            jax.ShapeDtypeStruct((bl, d), jnp.float32),
        ],
        interpret=interpret,
    )(img_features, words_flat, bias_flat, maskf_flat, gsel, gstart, gt)
    return d_img, d_words.reshape(b, l, d)


def _similarity_grid(img_features, words, bias, maskt, gamma1, gamma2,
                     interpret):
    b, r, d = img_features.shape
    l = words.shape[1]
    bl = b * l
    words_flat = words.reshape(bl, d)
    bias_flat = bias.reshape(bl, 1)
    maskf_flat = maskt.reshape(bl, 1)
    # 0/1 selector: gsel[i, k] = 1 iff flattened word row k belongs to text i
    gsel = jnp.repeat(jnp.eye(b, dtype=jnp.float32), l, axis=1)
    # start-row selector: 1 only at each text's FIRST flattened word row
    gstart = jnp.zeros((b, bl), jnp.float32).at[
        jnp.arange(b), jnp.arange(b) * l].set(1.0)
    out = pl.pallas_call(
        functools.partial(_image_cell_kernel, gamma1=gamma1, gamma2=gamma2,
                          l_static=l),
        grid=(b,),                                  # one cell per image j
        in_specs=[
            pl.BlockSpec((1, r, d), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bl, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bl, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bl, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, bl), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, bl), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, 1), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, b, 1), jnp.float32),
        interpret=interpret,
    )(img_features, words_flat, bias_flat, maskf_flat, gsel, gstart)
    return out[:, :, 0]                             # sims[j, i]


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
    """Hand-derived backward in a second Pallas kernel (same cell layout as
    the forward; intermediates recomputed in VMEM). Replaces the earlier
    recompute-through-the-XLA-vjp backward that made fwd+bwd only break
    even with the vmap form. Beyond ~(B*L, R) x 10 fp32 intermediates of
    VMEM (B>128 at reference dims) the kernel cannot hold its live set —
    fall back to the XLA-vjp recompute there."""
    from attngan_tpu.ops.attention import NEG_INF

    img_features, words, word_mask = residuals
    b, r, d = img_features.shape
    l = words.shape[1]
    if b * l * r * 4 * 10 > 12 * 2**20:
        _, vjp = jax.vjp(
            lambda im, wd: _jnp_similarity(im, wd, word_mask, gamma1,
                                           gamma2),
            img_features, words,
        )
        d_img, d_words = vjp(g)
        return d_img, d_words, None
    bias_flat = jnp.where(word_mask == 0, NEG_INF,
                          0.0).astype(jnp.float32).reshape(b * l, 1)
    maskf_flat = word_mask.astype(jnp.float32).reshape(b * l, 1)
    gsel = jnp.repeat(jnp.eye(b, dtype=jnp.float32), l, axis=1)
    gstart = jnp.zeros((b, b * l), jnp.float32).at[
        jnp.arange(b), jnp.arange(b) * l].set(1.0)
    d_img, d_words = _similarity_grid_bwd(
        img_features, words.reshape(b * l, d), bias_flat, maskf_flat, gsel,
        gstart, g, float(gamma1), float(gamma2), interpret)
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
