"""DAMSM word- and sentence-level contrastive losses.

Reference: losses/words_loss.py:9-102 and losses/sentence_loss.py:6-50
(AttnGAN Eq. 7-11). The reference's WordsLoss runs a HOST-SIDE Python loop
over the batch, slicing each caption to its ragged true length and repeating
it across the batch (words_loss.py:43-83). That loop is the #1 hot-path
rewrite: here it is a single vmap over the text axis with a static word axis
and a length mask — every (text_i, image_j) pair's attention is computed in
one fused batched contraction, jit-compiled end to end (and optionally
routed through the fused Pallas kernel in ops/pallas_damsm.py).

Semantics preserved exactly:
  * per-word cosine similarity with 1e-8 norm clamp (words_loss.py:20-27),
  * Eq. 10 aggregation  log(sum_l exp(gamma2 * sim_l))  over REAL words only
    (the mask replaces the reference's ragged slicing),
  * same-class pair masking with the diagonal excluded
    (words_loss.py:44-47,87-95; sentence_loss.py:17-25),
  * gamma3-scaled symmetric cross entropy vs. arange labels, scaled by
    w/s-lambda (words_loss.py:93-101).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from attngan_tpu.ops.attention import NEG_INF, damsm_attention

EPS = 1e-8


def cosine_similarity(x1: jax.Array, x2: jax.Array, axis: int = -1) -> jax.Array:
    """Reference words_loss.py:20-27: dot / max(|x1||x2|, eps)."""
    w12 = jnp.sum(x1 * x2, axis=axis)
    w1 = jnp.linalg.norm(x1, axis=axis)
    w2 = jnp.linalg.norm(x2, axis=axis)
    return w12 / jnp.maximum(w1 * w2, EPS)


def _class_mask(class_ids: jax.Array) -> jax.Array:
    """(B, B) True where the pair is a same-class NON-diagonal mismatch."""
    same = class_ids[:, None] == class_ids[None, :]
    eye = jnp.eye(class_ids.shape[0], dtype=bool)
    return same & ~eye


def _symmetric_ce(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """CE(scores, labels) + CE(scores.T, labels), mean over batch."""
    logp0 = jax.nn.log_softmax(scores, axis=-1)
    logp1 = jax.nn.log_softmax(scores.T, axis=-1)
    loss0 = -jnp.mean(jnp.take_along_axis(logp0, labels[:, None], axis=1))
    loss1 = -jnp.mean(jnp.take_along_axis(logp1, labels[:, None], axis=1))
    return loss0 + loss1


def words_loss(
    img_features: jax.Array,          # (B, R, D) region features (R = 17*17)
    words_emb: jax.Array,             # (B, L, D) word embeddings
    labels: jax.Array,                # (B,) int match labels (arange)
    word_mask: jax.Array,             # (B, L) 1 = real word, 0 = padding
    class_ids: Optional[jax.Array],   # (B,) or None
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    gamma3: float = 10.0,
    wlambda: float = 5.0,
    fused: Optional[bool] = None,     # None = Pallas on TPU (measured default)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scalar loss, diagonal attention maps (B, L, R))."""
    if fused is None:
        # Honest on-device A/B (v5e, R=289, D=256, L=8; device_timeit
        # readback-chain timing — full table in BENCH.md): the Pallas
        # kernel (ops/pallas_damsm.py, one grid cell per (image, text
        # tile)) wins the forward at every batch (1.74 vs 9.90 ms @ B=64)
        # by loading each (R, D) region block from HBM once instead of
        # materializing the O(B^2 L R) pairwise intermediates. Fwd+bwd
        # uses the HAND-DERIVED backward kernels (pallas_damsm.py:
        # recompute the chain's intermediates in VMEM and walk it
        # backwards): 5.67 vs 6.64 ms XLA at B=64, 5.85 vs 7.66 at B=128
        # (single-kernel square fast path); above 128 texts the v3 text-
        # tiled two-kernel backward takes over (BENCH.md round 3 for its
        # numbers), so no batch cap remains.
        # Off-TPU the vmap form runs (the kernel would need interpret
        # mode). Multi-device: pallas_call has no SPMD partitioning rule,
        # so under a >1-device jitted step it would force replication /
        # all-gather of the sharded operands — the vmap form partitions
        # cleanly and stays the default there; the pretrain path instead
        # routes through the explicit-collective shard_map loss
        # (losses/damsm_sharded.py), which calls this kernel per shard
        # (local images x all texts — the kernel's native rectangular
        # grid).
        # NOTE: the gate reads the GLOBAL jax.device_count(), so a
        # single-device program on a multi-chip host conservatively falls
        # back to vmap — pass fused=True explicitly there.
        fused = (jax.default_backend() == "tpu"
                 and jax.device_count() == 1)
    if fused:
        from attngan_tpu.ops.pallas_damsm import words_loss_pallas

        loss = words_loss_pallas(img_features, words_emb, labels, word_mask,
                                 class_ids, gamma1, gamma2, gamma3, wlambda)
        # diagonal (matched-pair) attention maps, B cheap pairs only
        _, diag_attn = damsm_attention(words_emb, img_features, gamma1,
                                       mask=word_mask)
        return loss, diag_attn

    batch = img_features.shape[0]
    wm = word_mask.astype(jnp.float32)

    def per_text(words_i: jax.Array, mask_i: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # words_i (L, D) attends over every image's regions at once.
        query = jnp.broadcast_to(words_i[None], (batch,) + words_i.shape)
        qmask = jnp.broadcast_to(mask_i[None], (batch, mask_i.shape[0]))
        weighted, attn = damsm_attention(query, img_features, gamma1, mask=qmask)
        sim = cosine_similarity(query, weighted)             # (B, L)
        # Eq. 10 over real words only (mask replaces ragged slicing).
        agg = jnp.log(jnp.sum(jnp.exp(gamma2 * sim) * mask_i[None], axis=-1))
        return agg, attn                                      # (B,), (B, L, R)

    # sims[i, j] = similarity(text i, image j); reference builds the
    # transpose (rows = images) — transpose below to match.
    sims, attns = jax.vmap(per_text)(words_emb, wm)
    similarities = sims.T * gamma3                            # (B_img, B_text)
    if class_ids is not None:
        similarities = jnp.where(_class_mask(class_ids), NEG_INF, similarities)
    loss = _symmetric_ce(similarities, labels) * wlambda
    # Reference keeps attn of the matched pair (text i, image i).
    diag_attn = attns[jnp.arange(batch), jnp.arange(batch)]   # (B, L, R)
    return loss, diag_attn


def sentence_loss(
    cnn_code: jax.Array,              # (B, D) global image code
    rnn_code: jax.Array,              # (B, D) sentence embedding
    labels: jax.Array,                # (B,)
    class_ids: Optional[jax.Array],
    gamma3: float = 10.0,
    slambda: float = 5.0,
) -> jax.Array:
    """Reference sentence_loss.py:12-50."""
    scores = jnp.einsum(
        "id,jd->ij", cnn_code, rnn_code, preferred_element_type=jnp.float32
    )
    norms = (
        jnp.linalg.norm(cnn_code, axis=-1)[:, None]
        * jnp.linalg.norm(rnn_code, axis=-1)[None, :]
    )
    scores = scores / jnp.maximum(norms, EPS) * gamma3
    if class_ids is not None:
        scores = jnp.where(_class_mask(class_ids), NEG_INF, scores)
    return _symmetric_ce(scores, labels) * slambda


def damsm_loss(
    img_features: jax.Array,
    cnn_code: jax.Array,
    words_emb: jax.Array,
    sent_emb: jax.Array,
    labels: jax.Array,
    word_mask: jax.Array,
    class_ids: Optional[jax.Array],
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    gamma3: float = 10.0,
    wlambda: float = 5.0,
    slambda: float = 5.0,
):
    """Combined w+s loss as used by both phases (pretrain_damsm.py:128-130,
    train.py:138-143). Returns (total, dict of parts, attn maps)."""
    wloss, attn = words_loss(
        img_features, words_emb, labels, word_mask, class_ids,
        gamma1, gamma2, gamma3, wlambda,
    )
    sloss = sentence_loss(cnn_code, sent_emb, labels, class_ids, gamma3, slambda)
    return wloss + sloss, {"words_loss": wloss, "sentence_loss": sloss}, attn
