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
                 image_res: int = 256, mesh=None):
        self.cfg = cfg
        self.seq_len = seq_len
        self.image_res = image_res
        # Multi-device: use the explicit-collective loss that shards the
        # O(B^2 L R) pairwise attention by image rows (losses/damsm_sharded);
        # single device: the plain vmap form.
        self.sharded_loss = None
        if mesh is not None and mesh.size > 1:
            from attngan_tpu.losses.damsm_sharded import make_sharded_damsm_loss

            self.sharded_loss = make_sharded_damsm_loss(
                mesh, cfg.gamma1, cfg.gamma2, cfg.gamma3, cfg.wlambda,
                cfg.slambda)
        if cfg.cache_region_features and cfg.trunk_train_mode_bn:
            raise ValueError(
                "cache_region_features assumes a step-invariant trunk forward;"
                " trunk_train_mode_bn makes features depend on batch "
                "composition — pick one")
        if cfg.trunk_int8 and cfg.trunk_train_mode_bn:
            raise ValueError(
                "trunk_int8 quantizes the eval-mode trunk; batch-stat BN "
                "(trunk_train_mode_bn) is not supported under int8")
        if cfg.superbatch > 1 and cfg.trunk_train_mode_bn:
            raise ValueError(
                "superbatch amortizes ONE eval-mode trunk forward over "
                "several steps; trunk_train_mode_bn needs per-step batch "
                "stats — pick one")
        self._trunk_scales = None   # int8 activation scales, lazily calibrated
        dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
        self.rnn = BiLSTMEncoder(vocab_size=vocab_size, emb_dim=cfg.text_emb_dim,
                                 hidden_dim=cfg.emb_dim, dropout=cfg.dropout)
        self.cnn = make_image_encoder(cfg.image_encoder, cfg.emb_dim, dtype)
        # Reference: one Adam over RNN params + trainable CNN heads
        # (pretrain_damsm.py:66-73); RNN grads clipped to 0.25 (:132).
        self.optimizer = optax.adam(cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1])
        self._step_fn = jax.jit(
            functools.partial(_damsm_step, self), donate_argnums=(1,),
            static_argnums=(0,),   # int8 act-scales tuple (or None)
        )
        self._cached_step_fn = jax.jit(
            functools.partial(_damsm_step_cached, self), donate_argnums=(0,)
        )
        self._super_step_fn = jax.jit(
            functools.partial(_damsm_step_super, self), donate_argnums=(1,),
            static_argnums=(0,),
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
        self.trunk_module()   # construct outside the jit trace (flax forbids
        scales = None         # module creation mid-trace)
        if self.cfg.trunk_int8:
            scales = self._calibrate_trunk_int8(state, batch["img256"])
        return self._step_fn(scales, state, batch)

    def train_step_super(self, state: DamsmState, batch):
        """One jitted SUPERBATCH step (cfg.superbatch = K > 1): batch arrays
        carry K*batch_size rows; the frozen trunk runs once at K*B and the
        step performs K sequential B-sized contrastive updates in a
        lax.scan — exact reference step semantics (the trunk receives no
        gradient, so its features are identical whenever computed), one
        dispatch instead of K. Metrics leaves come back with leading dim K
        (one entry per inner step)."""
        kb = batch["tokens"].shape[0]
        if kb != self.cfg.superbatch * self.cfg.batch_size:
            raise ValueError(
                f"superbatch step expects {self.cfg.superbatch}x"
                f"{self.cfg.batch_size} rows, got {kb}")
        self.trunk_module()
        scales = None
        if self.cfg.trunk_int8:
            scales = self._calibrate_trunk_int8(state, batch["img256"])
        return self._super_step_fn(scales, state, batch)

    def _calibrate_trunk_int8(self, state: DamsmState, img256) -> tuple:
        """One-time activation-scale calibration for the int8 frozen-trunk
        path (cfg.trunk_int8): run ONE jitted eval forward under the
        recording interceptor, read the per-site max|x| back, and bake the
        scales into the step as trace-time constants."""
        if self._trunk_scales is None:
            from attngan_tpu.infer.quantize import calibrate

            trunk = self.trunk_module()
            variables = {"params": state.cnn_trunk_params["trunk"]}
            if state.cnn_stats:
                variables["batch_stats"] = state.cnn_stats["trunk"]

            @jax.jit
            def calib(v, x):
                (_, pooled), records = calibrate(trunk.apply, v, x,
                                                 train=False)
                return pooled, records

            _, records = calib(variables, img256)
            self._trunk_scales = tuple(sorted(
                (k, float(v)) for k, v in records.items()))
        return self._trunk_scales

    def encode_text(self, state: DamsmState, tokens, lengths):
        return self.rnn.apply({"params": state.rnn_params}, tokens, lengths,
                              train=False)

    def encode_image(self, state: DamsmState, images):
        params = _merge_cnn_params(state.cnn_head_params, state.cnn_trunk_params)
        return self.cnn.apply(
            {"params": params, "batch_stats": state.cnn_stats}, images,
            train=False,
        )

    # ---- cached-trunk-features fast path (cfg.cache_region_features) ----
    #
    # The trunk is FROZEN and the input images never change, so its forward
    # is a pure function of the dataset: compute each image's (17x17, F)
    # regions + pooled code ONCE, keep them in host RAM (fp16), and train
    # the heads + RNN against the cache. This removes the Inception forward
    # (the dominant FLOPs of the reference's hot loop,
    # pretrain_damsm.py:121) from every step after the first epoch — a
    # TPU-native throughput lever the eager torch reference cannot express.

    def trunk_module(self):
        """The encoder's standalone trunk (params == state.cnn_trunk_params
        ['trunk']); every encoder — including test doubles — provides it via
        make_trunk(). Memoized per encoder instance so the jitted step can
        reuse it (flax modules cannot be constructed inside a trace)."""
        if getattr(self, "_trunk_src", None) is not self.cnn:
            self._trunk = self.cnn.make_trunk()
            self._trunk_src = self.cnn
        return self._trunk

    def precompute_trunk_features(self, state: DamsmState, dataset,
                                  batch_size: int = 0, cache_dtype=None):
        """Run the frozen trunk over the whole dataset (record order).
        Returns {'regions' (N, R, F), 'pooled' (N, F2)} in ``cache_dtype``
        (default fp16: ~300 KB/image in host RAM; the rounding shifts the
        cached-step loss by O(1e-3) relative — pass np.float32 for a
        bit-exact cache at 2x the memory)."""
        import numpy as np

        cache_dtype = cache_dtype or np.float16

        batch_size = batch_size or self.cfg.batch_size
        trunk = self.trunk_module()
        variables = {"params": state.cnn_trunk_params["trunk"]}
        stats = state.cnn_stats.get("trunk", {})
        if stats:
            variables["batch_stats"] = stats
        fwd = jax.jit(lambda x: trunk.apply(variables, x, train=False))

        regions_out, pooled_out = [], []
        n = len(dataset.records)
        for start in range(0, n, batch_size):
            recs = dataset.records[start : start + batch_size]
            pixels = dataset._batch_pixels(recs)
            flip = np.asarray([r.flip for r in recs], bool)
            pad = batch_size - len(recs)
            if pad:
                pixels = np.pad(pixels, ((0, pad), (0, 0), (0, 0), (0, 0)))
                flip = np.pad(flip, (0, pad))
            from attngan_tpu.data.dataset import preprocess_pyramid

            img256 = preprocess_pyramid(jnp.asarray(pixels),
                                        jnp.asarray(flip))[256]
            regions, pooled = fwd(img256)
            keep = len(recs)
            regions_out.append(np.asarray(regions, cache_dtype)[:keep]
                               .reshape(keep, -1, regions.shape[-1]))
            pooled_out.append(np.asarray(pooled, cache_dtype)[:keep])
        return {"regions": np.concatenate(regions_out),
                "pooled": np.concatenate(pooled_out)}

    def train_step_cached(self, state: DamsmState, batch):
        """batch: tokens, lengths, class_ids, trunk_regions (B, R, F),
        trunk_pooled (B, F2) — from precompute_trunk_features."""
        return self._cached_step_fn(state, batch)

    def iter_attention_maps(self, state: DamsmState, dataset,
                            batch_size: int = 0, limit: int = 0):
        """Yield per-image DAMSM word-region attention maps as HOST
        (L, side, side) float arrays — the reference's commented-out
        ``populate_attnmaps`` semantics (pretrain_damsm.py:85-107: CNN +
        RNN forwards, diagonal image-vs-own-caption attention, maps copied
        to host objects; its '44 s for 1000 images' comment is the only
        reference perf artifact — tools/attnmaps_bench.py measures this
        path against it). One jit covers decode pyramid -> trunk -> BiLSTM
        -> masked attention; the per-batch ``np.asarray`` is the host
        boundary the reference's ``.detach().cpu()`` crossed."""
        import numpy as np

        from attngan_tpu.data.dataset import word_mask
        from attngan_tpu.data.prefetch import prefetch
        from attngan_tpu.ops.attention import damsm_attention

        batch_size = batch_size or self.cfg.batch_size

        @jax.jit
        def attn_fn(st, tokens, lengths, img256):
            regions, _ = self.encode_image(st, img256)
            word_embs, _ = self.encode_text(st, tokens, lengths)
            mask = word_mask(lengths, self.seq_len)
            _, attn = damsm_attention(word_embs, regions, self.cfg.gamma1,
                                      mask=mask)
            return attn                                # (B, L, R)

        # The (B, 256, 256, 3) uint8 h2d dominates this loop's wall clock
        # through a remote-device tunnel (~430 ms/batch at B=64 vs ~94 ms
        # compute+map-readback, tools/attnmaps_bench.py) — prefetch
        # overlaps the next batches' transfers with the current compute
        # and per-batch readback fence.
        yielded = 0
        for device_batch in prefetch(
                dataset.iter_batches(batch_size, self.seq_len,
                                     shuffle=False),
                transform=dataset.device_batch, depth=2):
            attn = np.asarray(attn_fn(state, device_batch["tokens"],
                                      device_batch["lengths"],
                                      device_batch["img256"]))
            b, l, r = attn.shape
            side = int(np.sqrt(r))
            for i in range(b):
                yield attn[i].reshape(l, side, side)
                yielded += 1
                if limit and yielded >= limit:
                    return

    def populate_attention_maps(self, state: DamsmState, dataset,
                                folder: str = "attention_maps",
                                batch_size: int = 0, limit: int = 0):
        """Dump per-image DAMSM word-region attention strips as PNGs (the
        file-writing form of ``iter_attention_maps``). Returns the number
        of images written."""
        import os

        from attngan_tpu.utils.imaging import save_attention_maps

        os.makedirs(folder, exist_ok=True)
        written = 0
        for maps in self.iter_attention_maps(state, dataset,
                                             batch_size=batch_size,
                                             limit=limit):
            save_attention_maps(
                maps, os.path.join(folder, f"attn_{written:06d}.png"))
            written += 1
        return written


def _apply_heads(head_params, trunk_regions, trunk_pooled):
    """Apply the trainable heads to cached trunk features — identical math
    to CNNEncoder's emb_features (1x1 conv == per-region matmul, no bias)
    and emb_cnn_code (Dense)."""
    k = head_params["emb_features"]["kernel"][0, 0]        # (F, out_dim)
    regions = jnp.einsum(
        "brf,fd->brd", trunk_regions, k, preferred_element_type=jnp.float32)
    dense = head_params["emb_cnn_code"]
    code = trunk_pooled @ dense["kernel"] + dense["bias"]
    return regions.astype(jnp.float32), code.astype(jnp.float32)


def _make_loss_fn(trainer: DamsmTrainer, tokens, lengths, class_ids,
                  trunk_regions, trunk_pooled, labels, mask, k_drop,
                  new_stats=None):
    """The differentiated tail shared by all three step variants (plain /
    cached / superbatch): train-mode RNN forward + trainable heads over
    the (stop-gradiented or cached) trunk features + the DAMSM loss."""

    def loss_fn(trainable):
        word_embs, sent_embs = trainer.rnn.apply(
            {"params": trainable["rnn"]}, tokens, lengths,
            train=True, rngs={"dropout": k_drop},
        )
        regions, cnn_code = _apply_heads(trainable["cnn_heads"],
                                         trunk_regions, trunk_pooled)
        total, parts = _compute_damsm_loss(trainer, regions, cnn_code,
                                           word_embs, sent_embs, labels,
                                           mask, class_ids)
        return total, (parts, new_stats)

    return loss_fn


def _damsm_update(trainer: DamsmTrainer, state: DamsmState, key, loss_fn):
    """Shared grad/clip/Adam tail of both step variants. ``loss_fn`` returns
    (loss, (parts, new_cnn_stats_or_None)) — train-mode trunk BN threads its
    updated running stats back into the state."""
    cfg = trainer.cfg
    trainable = {"rnn": state.rnn_params, "cnn_heads": state.cnn_head_params}
    (loss, (parts, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(trainable)

    # clip_grad_norm_(RNN.parameters(), 0.25) — RNN subtree only
    # (pretrain_damsm.py:132)
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
        cnn_stats=(state.cnn_stats if new_stats is None
                   else jax.lax.stop_gradient(new_stats)),
        opt_state=opt_state,
        step=state.step + 1,
        key=key,
    )
    metrics = {"loss": loss, "rnn_grad_norm": gnorm, **parts}
    return new_state, metrics


def _compute_damsm_loss(trainer, regions, cnn_code, word_embs, sent_embs,
                        labels, mask, class_ids):
    cfg = trainer.cfg
    if trainer.sharded_loss is not None:
        return trainer.sharded_loss(regions, cnn_code, word_embs, sent_embs,
                                    labels, mask, class_ids)
    total, parts, _ = damsm_loss(
        regions, cnn_code, word_embs, sent_embs, labels, mask, class_ids,
        cfg.gamma1, cfg.gamma2, cfg.gamma3, cfg.wlambda, cfg.slambda,
    )
    return total, parts


def _eval_trunk_forward(trainer: DamsmTrainer, int8_scales,
                        state: DamsmState, img256):
    """Frozen EVAL-mode trunk forward (bf16 or int8), stop-gradiented and
    region-flattened. Shared by the plain step and the superbatch step —
    per-image math is batch-composition-independent (running-stat BN), so
    one K*B forward equals K separate B forwards."""
    trunk = trainer.trunk_module()
    trunk_vars = {"params": state.cnn_trunk_params["trunk"]}
    if state.cnn_stats:
        trunk_vars["batch_stats"] = state.cnn_stats["trunk"]
    if int8_scales is not None:
        # Opt-in int8 frozen-trunk forward (cfg.trunk_int8): every Conv in
        # the trunk runs as s8 x s8 -> s32 on the MXU with calibrated
        # static activation scales. The trunk is frozen so the
        # approximation is a fixed, documented embedding perturbation —
        # not compounding training noise.
        from attngan_tpu.infer.quantize import quantized_call

        trunk_regions, trunk_pooled = quantized_call(
            dict(int8_scales), trunk.apply, trunk_vars, img256, train=False,
        )
    else:
        trunk_regions, trunk_pooled = trunk.apply(trunk_vars, img256,
                                                  train=False)
    b = trunk_regions.shape[0]
    return (
        jax.lax.stop_gradient(
            trunk_regions.reshape(b, -1, trunk_regions.shape[-1])),
        jax.lax.stop_gradient(trunk_pooled),
    )


def _damsm_step(trainer: DamsmTrainer, int8_scales, state: DamsmState,
                batch: Dict[str, jax.Array]):
    key, k_drop = jax.random.split(state.key)
    labels = jnp.arange(batch["tokens"].shape[0])  # match labels (trainer.py:20-25)
    mask = word_mask(batch["lengths"], trainer.seq_len)

    # The frozen trunk forward runs OUTSIDE loss_fn: only the heads/RNN are
    # differentiated, and hoisting the trunk out of value_and_grad stops
    # autodiff residual-saving from de-fusing every conv+BN+relu in it
    # (measured honest cost of leaving it inside: the 12.6 ms trunk forward
    # balloons the 21.6 ms step to 45 ms). Mathematically identical — the
    # trunk's params receive no gradient either way, and jax.grad of the
    # heads needs only the trunk's OUTPUT activations.
    if trainer.cfg.trunk_train_mode_bn:
        # Reproduce the reference's accidental quirk: the frozen trunk is
        # never put in eval() (no eval call anywhere in reference
        # pretrain_damsm.py:59-73), so its BN normalizes with BATCH stats
        # and keeps updating the running averages.
        trunk = trainer.trunk_module()
        trunk_vars = {"params": state.cnn_trunk_params["trunk"]}
        if state.cnn_stats:
            trunk_vars["batch_stats"] = state.cnn_stats["trunk"]
        (trunk_regions, trunk_pooled), mutated = trunk.apply(
            trunk_vars, batch["img256"], train=True, mutable=["batch_stats"],
        )
        new_stats = ({"trunk": mutated["batch_stats"]}
                     if state.cnn_stats else None)
        b = trunk_regions.shape[0]
        trunk_regions = jax.lax.stop_gradient(
            trunk_regions.reshape(b, -1, trunk_regions.shape[-1]))
        trunk_pooled = jax.lax.stop_gradient(trunk_pooled)
    else:
        trunk_regions, trunk_pooled = _eval_trunk_forward(
            trainer, int8_scales, state, batch["img256"])
        new_stats = None

    return _damsm_update(trainer, state, key, _make_loss_fn(
        trainer, batch["tokens"], batch["lengths"], batch["class_ids"],
        trunk_regions, trunk_pooled, labels, mask, k_drop, new_stats))


def _damsm_step_cached(trainer: DamsmTrainer, state: DamsmState,
                       batch: Dict[str, jax.Array]):
    key, k_drop = jax.random.split(state.key)
    labels = jnp.arange(batch["tokens"].shape[0])
    mask = word_mask(batch["lengths"], trainer.seq_len)
    trunk_regions = batch["trunk_regions"].astype(jnp.float32)
    trunk_pooled = batch["trunk_pooled"].astype(jnp.float32)

    return _damsm_update(trainer, state, key, _make_loss_fn(
        trainer, batch["tokens"], batch["lengths"], batch["class_ids"],
        trunk_regions, trunk_pooled, labels, mask, k_drop))


def _damsm_step_super(trainer: DamsmTrainer, int8_scales, state: DamsmState,
                      batch: Dict[str, jax.Array]):
    """Superbatch step (cfg.superbatch = K): ONE frozen-trunk forward at
    K*B images, then K sequential B-sized contrastive optimization steps in
    a lax.scan. Mathematically identical to K reference-shaped steps over
    the same K batches in order — the trunk is frozen and eval-mode, so its
    per-image features do not depend on batch composition or on when they
    are computed, and the scan body replays `_damsm_step`'s exact key
    split / loss / clip / Adam sequence per chunk. What it saves is
    per-step overhead: K-1 host dispatches and K-1 separate trunk program
    launches (the trunk is latency-bound at B=64 — BENCH.md)."""
    cfg = trainer.cfg
    k = cfg.superbatch
    kb = batch["tokens"].shape[0]
    b = kb // k
    regions, pooled = _eval_trunk_forward(trainer, int8_scales, state,
                                          batch["img256"])
    labels = jnp.arange(b)
    xs = {
        "tokens": batch["tokens"].reshape(k, b, -1),
        "lengths": batch["lengths"].reshape(k, b),
        "class_ids": batch["class_ids"].reshape(k, b),
        "regions": regions.reshape(k, b, *regions.shape[1:]),
        "pooled": pooled.reshape(k, b, *pooled.shape[1:]),
    }

    def body(st, chunk):
        key, k_drop = jax.random.split(st.key)
        mask = word_mask(chunk["lengths"], trainer.seq_len)
        return _damsm_update(trainer, st, key, _make_loss_fn(
            trainer, chunk["tokens"], chunk["lengths"], chunk["class_ids"],
            chunk["regions"], chunk["pooled"], labels, mask, k_drop))

    return jax.lax.scan(body, state, xs)
