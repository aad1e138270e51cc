"""Batched text -> image inference.

Reference: test.py:77-87 (GanTester.generate_images) — preprocess captions,
embed with the frozen RNN, run the full generator cascade, denormalize the
final 256x256 images. Here the whole device path (text encoder + generator
+ denormalize) is ONE jit-compiled function, shardable over the mesh's
'data' axis for multi-chip throughput (the BASELINE north-star config).
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from attngan_tpu.data.captions import CaptionHandler
from attngan_tpu.data.dataset import word_mask
from attngan_tpu.train.gan_trainer import GanState, GanTrainer


def denormalize(images: jax.Array) -> jax.Array:
    """[-1, 1] -> [0, 1] (reference trainer.py:37-43)."""
    return jnp.clip(images * 0.5 + 0.5, 0.0, 1.0)


class InferState(struct.PyTreeNode):
    """The three state subtrees sampling actually touches — ~15% of the
    full GanState (which also carries discriminators, the frozen Inception,
    and four Adam moments). Serving restores ONLY this (checkpoint.py::
    restore_inference_state): at reference scale the full training state is
    1.1 GB on disk and orbax's leaf-by-leaf restore of it through a remote
    device tunnel measured in MINUTES (ROADMAP #8), while this subtree is
    one bulk host->device transfer."""

    rnn_params: Any
    gen_params: Any
    gen_stats: Any


def as_infer_state(state) -> InferState:
    """Accept a full GanState (bench/tests) or an InferState (serving)."""
    if isinstance(state, InferState):
        return state
    return InferState(rnn_params=state.rnn_params,
                      gen_params=state.gen_params,
                      gen_stats=state.gen_stats)


class Sampler:
    def __init__(self, trainer: GanTrainer, state,
                 caption_handler: Optional[CaptionHandler] = None,
                 mesh=None):
        self.trainer = trainer
        self.state = as_infer_state(state)
        self.caption_handler = caption_handler
        self.mesh = mesh  # data-parallel inference mesh (or None)
        self._sample_fn = jax.jit(
            functools.partial(_sample, trainer),
            static_argnames=("return_all_stages",),
        )

    def _shard(self, tokens, lengths):
        if self.mesh is not None and tokens.shape[0] % self.mesh.size == 0:
            from attngan_tpu.parallel import shard_batch

            return shard_batch((tokens, lengths), self.mesh)
        return tokens, lengths

    def generate_from_captions(
        self, captions: List[List[str]], seed: int = 0
    ) -> np.ndarray:
        """Tokenize + embed + generate; returns (N, 256, 256, 3) in [0, 1]."""
        assert self.caption_handler is not None, "needs a CaptionHandler"
        tokens, lengths = self.caption_handler.preprocess(
            captions, max_seqlen=self.trainer.cfg.seq_len
        )
        tokens, lengths = self._shard(jnp.asarray(tokens), jnp.asarray(lengths))
        imgs = self._sample_fn(
            self.state, tokens, lengths, jax.random.key(seed),
        )
        return np.asarray(imgs)

    def generate_from_tokens(self, tokens, lengths, key) -> jax.Array:
        return self._sample_fn(self.state, tokens, lengths, key)

    def generate_stages(self, tokens, lengths, key):
        """All cascade stages + attention maps (reference test.py exposes the
        full (fake_imgs, attn_maps) tuple). Returns ([per-stage (B,R,R,3) in
        [0,1]], [per-attn-stage (B, L, h, w)])."""
        if not hasattr(self, "_stages_fn"):
            trainer = self.trainer

            def _stages(state, tokens, lengths, key):
                cfg = trainer.cfg
                k_noise, k_reparam = jax.random.split(key)
                word_embs, sent_embs = trainer.rnn.apply(
                    {"params": state.rnn_params}, tokens, lengths, train=False)
                mask = word_mask(lengths, cfg.seq_len)
                noise = jax.random.normal(k_noise, (tokens.shape[0], cfg.z_dim))
                fakes, attns, _, _ = trainer.generator.apply(
                    {"params": state.gen_params,
                     "batch_stats": state.gen_stats},
                    noise, sent_embs, word_embs, mask, k_reparam, train=False)
                return [denormalize(f) for f in fakes], attns

            self._stages_fn = jax.jit(_stages)
        return self._stages_fn(self.state, tokens, lengths, key)


def _sample(trainer: GanTrainer, state: InferState, tokens, lengths, key,
            return_all_stages: bool = False):
    cfg = trainer.cfg
    k_noise, k_reparam = jax.random.split(key)
    word_embs, sent_embs = trainer.rnn.apply(
        {"params": state.rnn_params}, tokens, lengths, train=False
    )
    mask = word_mask(lengths, cfg.seq_len)
    noise = jax.random.normal(k_noise, (tokens.shape[0], cfg.z_dim))
    fakes, _, _, _ = trainer.generator.apply(
        {"params": state.gen_params, "batch_stats": state.gen_stats},
        noise, sent_embs, word_embs, mask, k_reparam, train=False,
    )
    if return_all_stages:
        return [denormalize(f) for f in fakes]
    return denormalize(fakes[-1])
