"""Host-side epoch loops for both training phases.

Reference: the notebook-style loops in pretrain_damsm.py:110-138 and
train.py:103-162. Same responsibilities — degenerate-batch skipping,
per-epoch checkpointing, loss plots, fixed-noise sample grids — but with
real checkpoints (orbax, whole state) and metrics from inside the jit
region. Batches are sharded over the data mesh axis before each step.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from attngan_tpu.core.config import DamsmConfig, GanConfig, RunConfig
from attngan_tpu.data.dataset import Dataset
from attngan_tpu.data.prefetch import prefetch
from attngan_tpu.infer.sampler import denormalize
from attngan_tpu.parallel import make_mesh_for_batch, replicate, shard_batch
from attngan_tpu.train.checkpoint import (
    latest_checkpoint,
    load_progress_sidecar,
    restore_checkpoint,
    save_checkpoint,
)


from attngan_tpu.train.damsm_trainer import DamsmState, DamsmTrainer
from attngan_tpu.train.gan_trainer import GanState, GanTrainer
from attngan_tpu.utils.imaging import plot_history, save_image_grids
from attngan_tpu.utils.timing import StepTimer, StepWindowProfiler


def _maybe_resume(state, directory: str, resume: bool):
    """Exact resume from the newest checkpoint (params + every optimizer
    state + step + PRNG key) — the reference's per-epoch pickles could not
    resume optimizers at all (Adam name collision, SURVEY.md §3.2).

    Returns ``(state, start_epoch)``: the loop continues at epoch
    ``start_epoch + 1``, so ``cfg.epochs`` is the run's TOTAL epoch count
    and a resumed run's logs/snapshots keep the original numbering."""
    if not resume:
        return state, 0
    ckpt = latest_checkpoint(directory)
    if ckpt is None:
        print(f"--resume: no checkpoint under {directory}, starting fresh")
        return state, 0
    start_epoch = load_progress_sidecar(directory)
    print(f"resuming from {ckpt} (epoch {start_epoch} done)")
    return restore_checkpoint(ckpt, state), start_epoch


def _skip_batch(host_batch, batch_size: int) -> bool:
    """min(len) < 2 or ragged (reference train.py:112-113)."""
    return (host_batch["lengths"].min() < 2
            or host_batch["tokens"].shape[0] < batch_size)


def _group_superbatches(batches, k: int):
    """Concatenate K consecutive host batches into one K*B superbatch
    (cfg.superbatch; a leftover group of < K batches at epoch end is
    dropped, like the reference drops ragged batches). Grouping happens
    AFTER the degenerate-batch skip, so the K inner steps are exactly the
    steps the plain loop would have taken. Warns when batches are dropped
    — and an epoch with fewer than K valid batches would otherwise train
    ZERO steps silently."""
    group, yielded = [], 0
    for b in batches:
        group.append(b)
        if len(group) == k:
            yield {key: np.concatenate([g[key] for g in group], axis=0)
                   for key in group[0]}
            group = []
            yielded += 1
    if group:
        print(f"superbatch={k}: dropped {len(group)} leftover batch(es) "
              f"this epoch ({yielded} superbatch steps ran)"
              + ("" if yielded else
                 " — the epoch trained ZERO steps; lower --superbatch or "
                 "add data"))


def run_damsm_training(
    cfg: DamsmConfig,
    run_cfg: RunConfig,
    dataset: Dataset,
    state: Optional[DamsmState] = None,
    trainer: Optional[DamsmTrainer] = None,
    pretrained_cnn: Optional[dict] = None,
    resume: bool = False,
):
    dataset.build_vocab()
    seq_len = max(dataset.max_seqlen, 1)
    mesh = make_mesh_for_batch(cfg.batch_size, shape=run_cfg.mesh_shape)
    if trainer is None:
        trainer = DamsmTrainer(cfg, vocab_size=dataset.vocab.n_words,
                               seq_len=seq_len, mesh=mesh)
    start_epoch = 0
    if state is None:
        state = trainer.init_state(run_cfg.seed, pretrained_cnn=pretrained_cnn)
        state, start_epoch = _maybe_resume(
            state, os.path.join(run_cfg.checkpoint_dir, "damsm"), resume)
    cache = None
    if cfg.cache_region_features:
        print("precomputing frozen-trunk region features for "
              f"{len(dataset.records)} images ...")
        cache = trainer.precompute_trunk_features(state, dataset)
    state = replicate(state, mesh)

    def to_device(host_batch):
        if cache is not None:
            idx = host_batch["indices"]
            return shard_batch({
                "tokens": jnp.asarray(host_batch["tokens"]),
                "lengths": jnp.asarray(host_batch["lengths"]),
                "class_ids": jnp.asarray(host_batch["class_ids"]),
                "trunk_regions": jnp.asarray(cache["regions"][idx]),
                "trunk_pooled": jnp.asarray(cache["pooled"][idx]),
            }, mesh)
        device_batch = dataset.device_batch(host_batch)
        return shard_batch(
            {k: device_batch[k]
             for k in ("tokens", "lengths", "class_ids", "img256")}, mesh)

    history = []
    last_logged = 0   # superbatch logging: steps advance K at a time
    timer = StepTimer()
    profiler = StepWindowProfiler(
        os.path.join(run_cfg.checkpoint_dir, "profile_damsm"),
        enabled=run_cfg.profile)
    superbatch = cfg.superbatch if cache is None else 1
    if superbatch > 1:
        per_epoch = len(dataset.records) // cfg.batch_size
        if per_epoch < superbatch:
            raise ValueError(
                f"superbatch={superbatch} needs at least {superbatch} full "
                f"batches per epoch; this dataset yields at most {per_epoch}"
                f" (batch_size={cfg.batch_size})")
    if start_epoch >= cfg.epochs:
        print(f"--resume: checkpoint already at epoch {start_epoch} >= "
              f"--epochs {cfg.epochs}; nothing to train")
    for epoch in range(start_epoch + 1, cfg.epochs + 1):
        batches = (b for b in dataset.iter_batches(cfg.batch_size, seq_len,
                                                   seed=run_cfg.seed + epoch)
                   if not _skip_batch(b, cfg.batch_size))
        if superbatch > 1:
            batches = _group_superbatches(batches, superbatch)
        for batch in prefetch(batches, to_device):
            if cache is not None:
                state, metrics = trainer.train_step_cached(state, batch)
            elif superbatch > 1:
                state, metrics = trainer.train_step_super(state, batch)
                # One DEVICE dispatch carrying K optimization steps: the
                # timer counts all K (warmup excludes the whole compile
                # dispatch), the profiler window counts dispatches, and
                # the history unrolls the per-step metrics.
                timer.tick(superbatch)
                profiler.tick()
                history.extend(float(l) for l in np.asarray(metrics["loss"]))
                # log once per log_every window even when K doesn't divide
                # it (`% log_every < K` fires on every remainder in [0, K))
                if len(history) - last_logged >= run_cfg.log_every:
                    last_logged = len(history)
                    print(f"epoch {epoch} step {len(history)} "
                          f"loss {history[-1]:.3f} "
                          f"({timer.steps_per_sec:.2f} steps/s)")
                continue
            else:
                state, metrics = trainer.train_step(state, batch)
            timer.tick()
            profiler.tick()
            history.append(float(metrics["loss"]))
            if len(history) % run_cfg.log_every == 0:
                print(f"epoch {epoch} step {len(history)} "
                      f"loss {history[-1]:.3f} "
                      f"({timer.steps_per_sec:.2f} steps/s)")
        # always snapshot the final epoch, even when epochs is not a
        # multiple of checkpoint_every_epochs — otherwise the tail of the
        # run trains and is silently discarded
        if epoch % run_cfg.checkpoint_every_epochs == 0 or epoch == cfg.epochs:
            save_checkpoint(os.path.join(run_cfg.checkpoint_dir, "damsm"),
                            jax.device_get(state), int(state.step), cfg,
                            epoch=epoch)
            if history:
                plot_history(history,
                             os.path.join(run_cfg.image_dir,
                                          f"epoch_{epoch}-damsm_loss.png"))
        print(f"===== epoch {epoch} done; mean loss "
              f"{np.mean(history[-100:]) if history else float('nan'):.3f} =====")
    profiler.close()
    return trainer, state, history


def run_gan_training(
    cfg: GanConfig,
    run_cfg: RunConfig,
    dataset: Dataset,
    state: Optional[GanState] = None,
    trainer: Optional[GanTrainer] = None,
    rnn_params=None,
    cnn_variables=None,
    resume: bool = False,
):
    dataset.build_vocab()
    mesh = make_mesh_for_batch(cfg.batch_size, shape=run_cfg.mesh_shape)
    if trainer is None:
        trainer = GanTrainer(cfg, vocab_size=dataset.vocab.n_words, mesh=mesh)
    start_epoch = 0
    if state is None:
        state = trainer.init_state(run_cfg.seed, rnn_params=rnn_params,
                                   cnn_variables=cnn_variables)
        state, start_epoch = _maybe_resume(
            state, os.path.join(run_cfg.checkpoint_dir, "gan"), resume)
    state = replicate(state, mesh)

    losses: Dict[str, list] = defaultdict(list)
    fixed_noise = jax.random.normal(jax.random.key(run_cfg.seed),
                                    (cfg.batch_size, cfg.z_dim))
    last_embed = None
    timer = StepTimer()
    profiler = StepWindowProfiler(
        os.path.join(run_cfg.checkpoint_dir, "profile_gan"),
        enabled=run_cfg.profile)
    step_count = 0
    image_keys = [f"img{res}" for res in cfg.resolutions]

    def to_device(host_batch):
        device_batch = dataset.device_batch(host_batch)
        return shard_batch(
            {k: device_batch[k]
             for k in ("tokens", "lengths", "class_ids", *image_keys)}, mesh)

    if start_epoch >= cfg.epochs:
        print(f"--resume: checkpoint already at epoch {start_epoch} >= "
              f"--epochs {cfg.epochs}; nothing to train")
    for epoch in range(start_epoch + 1, cfg.epochs + 1):
        batches = (b for b in dataset.iter_batches(cfg.batch_size, cfg.seq_len,
                                                   seed=run_cfg.seed + epoch)
                   if not _skip_batch(b, cfg.batch_size))
        for batch in prefetch(batches, to_device):
            last_embed = (batch["tokens"], batch["lengths"])
            state, metrics = trainer.train_step(state, batch)
            timer.tick()
            profiler.tick()
            step_count += 1
            for key, val in metrics.items():
                losses[key].append(float(val))
            if step_count % run_cfg.log_every == 0:
                head = {k: round(v[-1], 3) for k, v in losses.items()}
                print(f"epoch {epoch} step {step_count} {head} "
                      f"({timer.steps_per_sec:.2f} steps/s)")
        # per-epoch snapshot (reference train.py:154-162); the final epoch
        # always saves, even when epochs % checkpoint_every_epochs != 0
        if epoch % run_cfg.checkpoint_every_epochs == 0 or epoch == cfg.epochs:
            save_checkpoint(os.path.join(run_cfg.checkpoint_dir, "gan"),
                            jax.device_get(state), int(state.step), cfg,
                            epoch=epoch)
            if last_embed is not None:
                _sample_grid(trainer, state, last_embed, fixed_noise,
                             epoch, run_cfg, mesh)
            for name in ("g_total", f"d_loss_{cfg.resolutions[-1]}"):
                if losses.get(name):
                    plot_history(losses[name],
                                 os.path.join(run_cfg.image_dir,
                                              f"epoch_{epoch}-{name}.png"))
        print(f"===== epoch {epoch} done =====")
    profiler.close()
    return trainer, state, dict(losses)


def _sample_grid(trainer, state, last_embed, fixed_noise, epoch, run_cfg, mesh):
    """Fixed-noise evaluation grid + word-attention strips of the first
    sample, like reference train.py:154-158 + the attention viewers."""
    import os

    from attngan_tpu.data.dataset import word_mask
    from attngan_tpu.utils.imaging import save_attention_maps

    tokens, lengths = last_embed
    word_embs, sent_embs = trainer.embed_text(state, tokens, lengths)
    mask = word_mask(lengths, trainer.cfg.seq_len)
    fakes, attns, _, _ = trainer.generate(
        state, fixed_noise, sent_embs, word_embs, mask,
        jax.random.key(run_cfg.seed))
    fakes = [np.asarray(denormalize(f)) for f in fakes]
    save_image_grids(fakes, epoch, run_cfg.image_dir)
    for attn in attns:                      # (B, L, h, w) per attention stage
        res = attn.shape[-1]
        save_attention_maps(
            np.asarray(attn[0]),
            os.path.join(run_cfg.image_dir, f"epoch_{epoch}-attn{res}.png"))
