"""Fused Pallas kernel for the DAMSM pairwise word-region similarity.

The DAMSM words loss needs, for EVERY (text i, image j) pair, a full
attention (AttnGAN Eq. 7-9) plus per-word cosine similarity and the Eq. 10
log-sum-exp aggregate (reference words_loss.py:43-86 does this with a host
loop; losses/damsm.py vectorizes it with vmap). The vmapped form
materializes O(B^2 * R * L) intermediates in HBM; this kernel computes each
pair's whole chain (two matmuls, two softmaxes, cosine, logsumexp) in VMEM
and writes ONE scalar per pair.

Grid layout (kernel v3): one cell per (image j, text tile k) — the (R, D)
region block is loaded from HBM once per image row of the grid (the
dominant traffic term) and each cell's chain runs as two MXU-wide matmuls
over a (T*L, D) word tile with sublane-group softmaxes. Images and texts
are INDEPENDENT axes: the image side may be a data-parallel shard while the
text side is the full gathered batch (losses/damsm_sharded.py), and the
text tiling bounds VMEM at any batch (the v2 kernel held ALL B texts per
cell, capping B at ~128 — BENCH.md round 2).

Backward: hand-derived VJP as two Pallas kernels sharing one recompute
body — grid (Bi, K) accumulating d_ctx over the inner text tiles, and grid
(K, Bi) accumulating d_words over the inner images (each output block
stays VMEM-resident exactly while its grid axis is innermost). A square
single-tile fast path keeps the round-2 single-kernel backward (one
recompute instead of two) where it measured fastest (B <= 128 at reference
dims).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from attngan_tpu.losses.damsm import EPS
from attngan_tpu.ops.attention import damsm_attention

# Text-tile sizes (texts per grid cell). Forward live set ~6 fp32 (T*L, R)
# arrays; backward ~10-12 — both sized to stay well inside ~16 MB VMEM at
# reference dims (R=289, D=256, L<=8).
_TILE_FWD = 128
_TILE_BWD = 64


def _chain_fwd(ctx, w, bias, maskf, gsel, gstart, gamma1, gamma2, num_words):
    """Forward chain of one (image, text-tile) cell, all in VMEM.

    ctx (R, D) fp32; w (T*L, D) fp32; bias/maskf (T*L, 1); gsel/gstart
    (T, T*L) 0/1 selectors. Returns every intermediate the backward needs.

    Mosaic constraint: sublane<->lane shape casts like (T,L)->(T*L,1) are
    unsupported, so the body contains NO reshapes — and neither strided
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
    d = ctx.shape[-1]
    scale = jax.lax.rsqrt(jnp.asarray(d, jnp.float32))
    s = jax.lax.dot_general(                       # (T*L, R)
        w, ctx, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s + bias
    m = s
    total_rows = s.shape[0]
    for j in range(1, num_words):
        # roll requires a non-negative shift; rolling UP by j == rolling
        # down by (rows - j)
        m = jnp.maximum(m, pltpu.roll(s, total_rows - j, 0))
    gmax = jnp.dot(gstart, m, preferred_element_type=jnp.float32)  # (T, R)
    shift = jax.lax.dot_general(                   # (T*L, R) scatter back
        gsel, gmax, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    e1 = jnp.exp(s - shift)
    gsum = jnp.dot(gsel, e1, preferred_element_type=jnp.float32)   # (T, R)
    denom = jax.lax.dot_general(
        gsel, gsum, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    a1 = e1 / jnp.maximum(denom, EPS)
    # softmax #2 over REGIONS per word, gamma1-sharpened (attention.py:84-85)
    t = a1 * gamma1
    e2 = jnp.exp(t - jnp.max(t, axis=-1, keepdims=True))
    a2 = e2 / jnp.sum(e2, axis=-1, keepdims=True)
    v = jnp.dot(a2, ctx, preferred_element_type=jnp.float32)       # (TL, D)
    num = jnp.sum(w * v, axis=-1, keepdims=True)                   # (TL, 1)
    wn = jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True))
    vn = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    norms = wn * vn
    nc = jnp.maximum(norms, EPS)
    cos = num / nc
    # Eq. 10: log sum_l exp(gamma2*cos) over REAL words, grouped per text
    expg = jnp.exp(gamma2 * cos) * maskf                           # (TL, 1)
    agg = jnp.dot(gsel, expg, preferred_element_type=jnp.float32)  # (T, 1)
    return s, a1, a2, v, num, wn, vn, norms, nc, expg, agg


def _chain_bwd(chain, ctx, w, gsel, d_agg, gamma1, gamma2):
    """Hand-derived VJP of _chain_fwd given d(loss)/d(agg) (T, 1).

    Walks the chain backwards: Eq.10 logsumexp -> cosine -> weighted-
    context matmul -> region softmax -> word-group softmax -> score
    matmul. Returns (d_ctx (R, D), d_w (T*L, D)).
    """
    s, a1, a2, v, num, wn, vn, norms, nc, expg, agg = chain
    d = ctx.shape[-1]
    scale = jax.lax.rsqrt(jnp.asarray(d, jnp.float32))
    d_expg = jax.lax.dot_general(gsel, d_agg, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    d_cos = d_expg * gamma2 * expg                             # (TL, 1)
    d_num = d_cos / nc
    d_norms = jnp.where(norms > EPS, -d_cos * num / (nc * nc), 0.0)
    d_wn = d_norms * vn
    d_vn = d_norms * wn
    d_w = d_num * v + d_wn * w / jnp.maximum(wn, EPS)          # (TL, D)
    d_v = d_num * w + d_vn * v / jnp.maximum(vn, EPS)          # (TL, D)
    # v = a2 @ ctx
    d_a2 = jax.lax.dot_general(d_v, ctx, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (TL,R)
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
    return d_ctx, d_w


def _image_cell_kernel(ctx_ref, words_ref, bias_ref, maskf_ref, gsel_ref,
                       gstart_ref, out_ref, *, gamma1, gamma2, l_static):
    """One grid cell = (image j, text tile k): T texts' Eq.10 scores."""
    ctx = ctx_ref[0].astype(jnp.float32)           # (R, D)
    w = words_ref[...].astype(jnp.float32)         # (T*L, D) pre-flattened
    chain = _chain_fwd(ctx, w, bias_ref[...], maskf_ref[...], gsel_ref[...],
                       gstart_ref[...], gamma1, gamma2, l_static)
    agg = chain[-1]                                # (T, 1)
    out_ref[0] = jnp.log(agg)


def _image_cell_bwd_kernel(ctx_ref, words_ref, bias_ref, maskf_ref, gsel_ref,
                           gstart_ref, gt_ref, dctx_ref, dwords_ref, *,
                           gamma1, gamma2, l_static):
    """Square single-tile backward (round-2 fast path): grid (B,), ALL
    texts per cell. One recompute serves both outputs: dctx (R, D) is this
    cell's own block; dwords (B*L, D) accumulates across the sequential
    grid (constant index map keeps the block VMEM-resident; zeroed at cell
    0). The incoming cotangent arrives PRE-TRANSPOSED (gt[:, j] = g[j, :])
    so the kernel needs no sublane<->lane transpose."""
    j = pl.program_id(0)
    ctx = ctx_ref[0].astype(jnp.float32)           # (R, D)
    w = words_ref[...].astype(jnp.float32)         # (B*L, D)
    gsel = gsel_ref[...]                           # (B, B*L)
    gt = gt_ref[...]                               # (B, B): gt[:, j]=g[j, :]
    # column j via a one-hot lane mask + reduction (dynamic lane slicing and
    # sub-128 lane blocks are both unsupported)
    lane = jax.lax.broadcasted_iota(jnp.int32, gt.shape, 1)
    g_col = jnp.sum(jnp.where(lane == j, gt, 0.0), axis=1,
                    keepdims=True)                 # (B, 1) = dL/d sims[j, :]
    chain = _chain_fwd(ctx, w, bias_ref[...], maskf_ref[...], gsel,
                       gstart_ref[...], gamma1, gamma2, l_static)
    agg = chain[-1]
    d_agg = jnp.where(agg > 0, g_col / agg, 0.0)   # (B, 1)
    d_ctx, d_w = _chain_bwd(chain, ctx, w, gsel, d_agg, gamma1, gamma2)

    dctx_ref[0] = d_ctx

    @pl.when(j == 0)
    def _zero():
        dwords_ref[...] = jnp.zeros_like(dwords_ref)

    dwords_ref[...] += d_w


def _tiled_bwd_kernel(ctx_ref, words_ref, bias_ref, maskf_ref, gsel_ref,
                      gstart_ref, gt_ref, out_ref, *, gamma1, gamma2,
                      l_static, emit, img_axis):
    """Tiled backward cell: recompute the (image j, tile k) chain, emit ONE
    cotangent. ``emit``: 'dctx' runs on grid (Bi, K) — d_ctx accumulates
    over the INNER tile axis into the (1, R, D) block; 'dwords' runs on
    grid (K, Bi) — d_words accumulates over the INNER image axis into the
    (T*L, D) block. Each orientation keeps its output block VMEM-resident
    exactly while it accumulates (Pallas only guarantees retention across
    CONSECUTIVE grid steps). Two recomputes of a cheap forward buy
    unbounded batch; the square fast path above keeps the single-recompute
    form where it measured fastest."""
    j = pl.program_id(img_axis)                    # image index
    inner = pl.program_id(1)                       # innermost grid axis
    ctx = ctx_ref[0].astype(jnp.float32)           # (R, D)
    w = words_ref[...].astype(jnp.float32)         # (T*L, D)
    gsel = gsel_ref[...]                           # (T, T*L)
    gt = gt_ref[...]                               # (T, Bi): gt[:, j]=g[j,:]
    lane = jax.lax.broadcasted_iota(jnp.int32, gt.shape, 1)
    g_col = jnp.sum(jnp.where(lane == j, gt, 0.0), axis=1,
                    keepdims=True)                 # (T, 1)
    chain = _chain_fwd(ctx, w, bias_ref[...], maskf_ref[...], gsel,
                       gstart_ref[...], gamma1, gamma2, l_static)
    agg = chain[-1]
    # padded dummy texts have agg == 0 (all words masked) — guard the 0/0
    d_agg = jnp.where(agg > 0, g_col / agg, 0.0)
    d_ctx, d_w = _chain_bwd(chain, ctx, w, gsel, d_agg, gamma1, gamma2)

    if emit == "dctx":
        @pl.when(inner == 0)
        def _zero():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        out_ref[0] += d_ctx
    else:
        @pl.when(inner == 0)
        def _zero():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] += d_w


def _text_tile(bt: int, l: int, cap: int):
    """Tile size T <= cap and the padded tile count K (texts padded to
    K*T with fully-masked dummies — their Eq.10 column is sliced off and
    their backward contribution is exactly zero via the agg > 0 guard)."""
    t = min(bt, cap)
    k = -(-bt // t)
    return t, k


def _tile_operands(words, word_mask, t, k):
    """Flatten + pad the text side to (K*T*L, ...) and build the per-tile
    (T, T*L) group selectors."""
    from attngan_tpu.ops.attention import NEG_INF

    bt, l, d = words.shape
    pad = k * t - bt
    if pad:
        words = jnp.pad(words, ((0, pad), (0, 0), (0, 0)))
        word_mask = jnp.pad(word_mask, ((0, pad), (0, 0)))
    words_flat = words.reshape(k * t * l, d)
    bias_flat = jnp.where(word_mask == 0, NEG_INF,
                          0.0).astype(jnp.float32).reshape(k * t * l, 1)
    maskf_flat = word_mask.astype(jnp.float32).reshape(k * t * l, 1)
    # 0/1 selector: gsel[i, m] = 1 iff tile word row m belongs to tile text i
    gsel = jnp.repeat(jnp.eye(t, dtype=jnp.float32), l, axis=1)
    # start-row selector: 1 only at each text's FIRST flattened word row
    gstart = jnp.zeros((t, t * l), jnp.float32).at[
        jnp.arange(t), jnp.arange(t) * l].set(1.0)
    return words_flat, bias_flat, maskf_flat, gsel, gstart


def _similarity_grid(img_features, words, bias_flat, maskf_flat, words_flat,
                     gsel, gstart, t, k, gamma1, gamma2, interpret):
    bi, r, d = img_features.shape
    l = words.shape[1]
    tl = t * l
    out = pl.pallas_call(
        functools.partial(_image_cell_kernel, gamma1=gamma1, gamma2=gamma2,
                          l_static=l),
        grid=(bi, k),                 # cell = (image j, text tile kk)
        in_specs=[
            pl.BlockSpec((1, r, d), lambda j, kk: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tl, d), lambda j, kk: (kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tl, 1), lambda j, kk: (kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tl, 1), lambda j, kk: (kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, tl), lambda j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, tl), lambda j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, 1), lambda j, kk: (j, kk, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bi, k * t, 1), jnp.float32),
        interpret=interpret,
    )(img_features, words_flat, bias_flat, maskf_flat, gsel, gstart)
    bt = words.shape[0]
    return out[:, :bt, 0]                           # sims[j, i]


def _similarity_grid_bwd_square(img_features, words_flat, bias_flat,
                                maskf_flat, gsel, gstart, g, gamma1, gamma2,
                                interpret):
    """Round-2 single-kernel backward: square batch, ALL texts per cell."""
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


def _similarity_grid_bwd_tiled(img_features, words, word_mask, g, gamma1,
                               gamma2, interpret):
    """Text-tiled backward: two kernels sharing the recompute body (see
    _tiled_bwd_kernel). Lifts the square path's B <= 128 VMEM cap and
    handles rectangular (sharded) batches."""
    bi, r, d = img_features.shape
    bt, l, _ = words.shape
    t, k = _text_tile(bt, l, _TILE_BWD)
    tl = t * l
    words_flat, bias_flat, maskf_flat, gsel, gstart = _tile_operands(
        words, word_mask, t, k)
    # gt[:, j] = g[j, :], padded text rows get zero cotangent
    gt = jnp.pad(g.T, ((0, k * t - bt), (0, 0)))    # (K*T, Bi)

    common = dict(gamma1=gamma1, gamma2=gamma2, l_static=l)
    operands = (img_features, words_flat, bias_flat, maskf_flat, gsel,
                gstart, gt)

    def specs(index):
        # index(j, kk) -> grid coords of (image, tile) for this orientation
        return [
            pl.BlockSpec((1, r, d), lambda a, b: (index(a, b)[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tl, d), lambda a, b: (index(a, b)[1], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tl, 1), lambda a, b: (index(a, b)[1], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tl, 1), lambda a, b: (index(a, b)[1], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, tl), lambda a, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, tl), lambda a, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, bi), lambda a, b: (index(a, b)[1], 0),
                         memory_space=pltpu.VMEM),
        ]

    d_img = pl.pallas_call(
        functools.partial(_tiled_bwd_kernel, emit="dctx", img_axis=0,
                          **common),
        grid=(bi, k),                                # image outer, tile inner
        in_specs=specs(lambda a, b: (a, b)),
        out_specs=pl.BlockSpec((1, r, d), lambda a, b: (a, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bi, r, d), jnp.float32),
        interpret=interpret,
    )(*operands)
    d_words = pl.pallas_call(
        functools.partial(_tiled_bwd_kernel, emit="dwords", img_axis=1,
                          **common),
        grid=(k, bi),                                # tile outer, image inner
        in_specs=specs(lambda a, b: (b, a)),
        out_specs=pl.BlockSpec((tl, d), lambda a, b: (a, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * tl, d), jnp.float32),
        interpret=interpret,
    )(*operands)
    return d_img, d_words.reshape(k * t, l, d)[:bt]


def _jnp_similarity(img_features, words, word_mask, gamma1, gamma2):
    """Oracle path (same math as losses/damsm.py::words_loss inner loop).
    Rectangular-safe: images and texts may have different batch sizes."""
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
    bt, l, _ = words.shape
    t, k = _text_tile(bt, l, _TILE_FWD)
    words_flat, bias_flat, maskf_flat, gsel, gstart = _tile_operands(
        words, word_mask, t, k)
    sims = _similarity_grid(img_features, words, bias_flat, maskf_flat,
                            words_flat, gsel, gstart, t, k,
                            float(gamma1), float(gamma2), interpret)
    return sims, (img_features, words, word_mask)


def _damsm_similarity_bwd(gamma1, gamma2, interpret, residuals, g):
    """Hand-derived backward (see module docstring). Square batches at
    <= _TILE_BWD * 2 texts keep the round-2 single-kernel fast path (one
    recompute); everything else — rectangular shards, B > 128 — runs the
    text-tiled two-kernel path."""
    img_features, words, word_mask = residuals
    bi, r, d = img_features.shape
    bt, l, _ = words.shape
    if bi == bt and bt <= 2 * _TILE_BWD and bt * l * r * 4 * 10 <= 12 * 2**20:
        from attngan_tpu.ops.attention import NEG_INF

        bias_flat = jnp.where(word_mask == 0, NEG_INF,
                              0.0).astype(jnp.float32).reshape(bt * l, 1)
        maskf_flat = word_mask.astype(jnp.float32).reshape(bt * l, 1)
        gsel = jnp.repeat(jnp.eye(bt, dtype=jnp.float32), l, axis=1)
        gstart = jnp.zeros((bt, bt * l), jnp.float32).at[
            jnp.arange(bt), jnp.arange(bt) * l].set(1.0)
        d_img, d_words = _similarity_grid_bwd_square(
            img_features, words.reshape(bt * l, d), bias_flat, maskf_flat,
            gsel, gstart, g, float(gamma1), float(gamma2), interpret)
        return d_img, d_words, None
    d_img, d_words = _similarity_grid_bwd_tiled(
        img_features, words, word_mask, g, float(gamma1), float(gamma2),
        interpret)
    return d_img, d_words, None


_damsm_similarity.defvjp(_damsm_similarity_fwd, _damsm_similarity_bwd)


def damsm_similarity_pallas(
    img_features: jax.Array,   # (Bi, R, D) — may be a data-parallel shard
    words: jax.Array,          # (Bt, L, D) — e.g. the full gathered batch
    word_mask: jax.Array,      # (Bt, L)
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    interpret: bool | None = None,
) -> jax.Array:
    """sims[j, i] = Eq. 10 similarity of (image j, text i); (Bi, Bt) fp32."""
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
