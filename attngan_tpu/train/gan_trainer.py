"""Adversarial training: one jit region per step, 4 optimizers.

Reference: train.py:103-162 (GanTrainer.train_gan). Per batch:
  1. frozen RNN embeds captions (:117);
  2. generator makes the 64/128/256 cascade from fresh noise (:119-120);
  3. each discriminator takes a NonSaturatingDiscLoss step on (fake_i,
     real_i) — the fake graph is retained across D updates (:123-130);
  4. the generator takes one step on the sum of per-D NonSaturatingGenLoss,
     plus the DAMSM word+sentence loss of the frozen CNN on fake256
     (:132-145), plus the conditioning-augmentation KL (:147-148).

TPU-native restructuring (same update semantics, no retain_graph):
  * D-steps differentiate only disc params with the fakes as stop-gradient
    constants; the G-step recomputes the generator forward inside its own
    grad (same noise + same PRNG key => identical images), which XLA
    schedules as one fused region — replacing torch's retained autograd
    graph idiomatically.
  * G loss is evaluated against the UPDATED discriminators, exactly like the
    reference's sequential optim.step() ordering.
  * BatchNorm running stats update on every train-mode forward (both D
    passes and the G-step pass), matching torch train() semantics; the
    frozen CNN runs in eval mode (the reference loads it with eval(),
    trainer.py:117-127).

Data parallel: batch args sharded over the 'data' mesh axis; XLA psums
gradients and handles the global BxB DAMSM similarity under SPMD. BatchNorm
under SPMD reduces over the GLOBAL batch (the batch-axis mean/var become
cross-replica all-reduces) — i.e. sync-BN semantics, the principled choice
the single-device torch reference never had to make (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from attngan_tpu.core.config import GanConfig
from attngan_tpu.data.dataset import word_mask
from attngan_tpu.losses.damsm import damsm_loss
from attngan_tpu.losses.gan import (
    kl_loss,
    non_saturating_disc_loss,
    non_saturating_gen_loss,
    standard_disc_loss,
    standard_gen_loss,
)
from attngan_tpu.models.cnn_encoder import make_image_encoder
from attngan_tpu.models.discriminators import Discriminator
from attngan_tpu.models.generator import Generator
from attngan_tpu.models.rnn_encoder import BiLSTMEncoder


class GanState(struct.PyTreeNode):
    gen_params: Any
    gen_stats: Any
    disc_params: Any              # {res: params}
    disc_stats: Any               # {res: batch_stats}
    gen_opt_state: Any
    disc_opt_states: Any          # {res: opt_state}
    rnn_params: Any               # frozen text encoder
    cnn_params: Any               # frozen image encoder (trunk + heads)
    cnn_stats: Any
    step: jax.Array
    key: jax.Array


class GanTrainer:
    def __init__(self, cfg: GanConfig, vocab_size: int, mesh=None):
        self.cfg = cfg
        # Multi-device: the G-step's DAMSM coupling (reference
        # train.py:138-145) routes through the explicit-collective shard_map
        # loss — each device computes its image rows of the B x B similarity
        # against all-gathered TEXT-side tensors (B*L*D floats over ICI)
        # instead of leaving XLA's SPMD partitioner to gather the much larger
        # (B, R=289, D) region features. Same plumbing as DamsmTrainer
        # (train/damsm_trainer.py:71-77); single device keeps the vmap form.
        self.sharded_loss = None
        if mesh is not None and mesh.size > 1:
            from attngan_tpu.losses.damsm_sharded import make_sharded_damsm_loss

            self.sharded_loss = make_sharded_damsm_loss(
                mesh, cfg.gamma1, cfg.gamma2, cfg.gamma3, cfg.wlambda,
                cfg.slambda)
        dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
        self.generator = Generator(
            gf_dim=cfg.gf_dim, emb_dim=cfg.emb_dim, z_dim=cfg.z_dim,
            cond_dim=cfg.cond_dim, num_stages=cfg.num_stages, dtype=dtype,
            fused_attention=cfg.fused_attention,
            fused_upsample=cfg.fused_upsample,
        )
        self.discriminators = {
            res: Discriminator(df_dim=cfg.df_dim, resolution=res, dtype=dtype)
            for res in cfg.resolutions
        }
        self.rnn = BiLSTMEncoder(vocab_size=vocab_size, hidden_dim=cfg.emb_dim)
        self.cnn = make_image_encoder(cfg.image_encoder, cfg.emb_dim, dtype)
        self.gen_opt = optax.adam(cfg.gen_lr, b1=cfg.betas[0], b2=cfg.betas[1])
        self.disc_opt = optax.adam(cfg.disc_lr, b1=cfg.betas[0], b2=cfg.betas[1])
        self._step_fn = jax.jit(
            functools.partial(_gan_step, self), donate_argnums=(0,)
        )
        self._generate_fn = jax.jit(functools.partial(_generate, self))
        self._embed_fn = jax.jit(
            lambda params, tokens, lengths: self.rnn.apply(
                {"params": params}, tokens, lengths, train=False))

    # ---- init ----

    def init_state(
        self,
        seed: int = 0,
        rnn_params: Optional[Any] = None,
        cnn_variables: Optional[dict] = None,
    ) -> GanState:
        """Fresh GAN params; DAMSM-pretrained encoder weights passed in
        (reference loads + freezes them, train.py:88-90)."""
        cfg = self.cfg
        key = jax.random.key(seed)
        keys = jax.random.split(key, 4 + len(cfg.resolutions))
        b, L = 2, cfg.seq_len
        noise = jnp.zeros((b, cfg.z_dim))
        sent = jnp.zeros((b, cfg.emb_dim))
        words = jnp.zeros((b, L, cfg.emb_dim))
        mask = jnp.ones((b, L), jnp.int32)
        gen_vars = self.generator.init(keys[0], noise, sent, words, mask, keys[1])

        disc_params, disc_stats, disc_opts = {}, {}, {}
        for i, res in enumerate(cfg.resolutions):
            dv = self.discriminators[res].init(
                keys[4 + i], jnp.zeros((b, res, res, 3)), train=True
            )
            disc_params[res] = dv["params"]
            disc_stats[res] = dv["batch_stats"]
            disc_opts[res] = self.disc_opt.init(dv["params"])

        if rnn_params is None:
            rnn_params = self.rnn.init(
                keys[2], jnp.zeros((b, L), jnp.int32), jnp.ones((b,), jnp.int32)
            )["params"]
        if cnn_variables is None:
            cnn_variables = self.cnn.init(
                keys[3], jnp.zeros((b, 64, 64, 3)), train=False
            )

        return GanState(
            gen_params=gen_vars["params"],
            gen_stats=gen_vars["batch_stats"],
            disc_params=disc_params,
            disc_stats=disc_stats,
            gen_opt_state=self.gen_opt.init(gen_vars["params"]),
            disc_opt_states=disc_opts,
            rnn_params=rnn_params,
            cnn_params=cnn_variables["params"],
            cnn_stats=cnn_variables.get("batch_stats", {}),
            step=jnp.zeros((), jnp.int32),
            key=key,
        )

    def train_step(self, state: GanState, batch: Dict[str, jax.Array]):
        """batch: tokens, lengths, class_ids, img64[, img128, img256]."""
        return self._step_fn(state, batch)

    # ---- inference helpers ----

    def embed_text(self, state: GanState, tokens, lengths):
        return self._embed_fn(state.rnn_params, tokens, lengths)

    def generate(self, state: GanState, noise, sent_embs, word_embs, mask, rng):
        """Eval-mode cascade (BN running stats), returns per-stage images.
        jit-compiled: an eager apply dispatches thousands of individual ops,
        which is pathological through a remote-device tunnel."""
        return self._generate_fn(state, noise, sent_embs, word_embs, mask, rng)


def _generate(trainer: "GanTrainer", state: GanState, noise, sent_embs,
              word_embs, mask, rng):
    return trainer.generator.apply(
        {"params": state.gen_params, "batch_stats": state.gen_stats},
        noise, sent_embs, word_embs, mask, rng, train=False,
    )


def _disc_loss_and_stats(trainer, res, params, stats, fake, real, rng):
    """One discriminator's loss with train-mode BN on real then fake passes
    (reference NonSaturatingDiscLoss.get_loss order, disc_loss.py:54-62)."""
    disc = trainer.discriminators[res]
    real_probs, mut = disc.apply(
        {"params": params, "batch_stats": stats}, real, train=True,
        mutable=["batch_stats"],
    )
    fake_probs, mut = disc.apply(
        {"params": params, "batch_stats": mut["batch_stats"]}, fake,
        train=True, mutable=["batch_stats"],
    )
    if trainer.cfg.loss_variant == "standard":
        loss = standard_disc_loss(real_probs, fake_probs, rng,
                                  trainer.cfg.label_smooth)
    else:
        loss = non_saturating_disc_loss(real_probs, fake_probs)
    return loss, mut["batch_stats"]


def _gan_step(trainer: GanTrainer, state: GanState,
              batch: Dict[str, jax.Array]):
    cfg = trainer.cfg
    resolutions = cfg.resolutions
    batch_size = batch["tokens"].shape[0]
    key, k_noise, k_reparam, k_label = jax.random.split(state.key, 4)
    labels = jnp.arange(batch_size)
    mask = word_mask(batch["lengths"], cfg.seq_len)
    reals = {res: batch[f"img{res}"] for res in resolutions}

    # 1. Frozen text encoder (train.py:117).
    word_embs, sent_embs = trainer.rnn.apply(
        {"params": state.rnn_params}, batch["tokens"], batch["lengths"],
        train=False,
    )
    noise = jax.random.normal(k_noise, (batch_size, cfg.z_dim))

    def run_generator(gen_params, gen_stats, train=True):
        (fakes, attns, mu, logvar), mut = trainer.generator.apply(
            {"params": gen_params, "batch_stats": gen_stats},
            noise, sent_embs, word_embs, mask, k_reparam, train=train,
            mutable=["batch_stats"],
        )
        return fakes, mu, logvar, mut["batch_stats"]

    # 2. ONE generator forward (train.py:119-120): the reference builds the
    # fake cascade once and reuses the tensors for every D-step (detached)
    # AND the G-step (retained graph). jax.vjp stores the pullback so the
    # G-grads flow through THIS forward — no recompute. (The recompute form
    # below relies on XLA CSE to dedupe two identical forwards inside one
    # jit region, which it does not reliably do across a value_and_grad
    # boundary — measured A/B in BENCH.md round 3.)
    if cfg.reuse_gen_forward:

        def gen_fwd(gen_params):
            fakes, mu, logvar, gen_stats = run_generator(
                gen_params, state.gen_stats)
            return (tuple(fakes), mu, logvar), gen_stats

        ((fakes1, mu1, logvar1), gen_vjp, gen_stats1) = jax.vjp(
            gen_fwd, state.gen_params, has_aux=True)
        fakes0 = {res: jax.lax.stop_gradient(img)
                  for res, img in zip(resolutions, fakes1)}
    else:
        # Fakes for the D-steps: constants w.r.t. both nets (train.py:120).
        fakes0, _, _, _ = run_generator(state.gen_params, state.gen_stats)
        fakes0 = {res: jax.lax.stop_gradient(img)
                  for res, img in zip(resolutions, fakes0)}

    # 3. D-steps (train.py:123-130), one Adam per discriminator.
    new_disc_params, new_disc_stats, new_disc_opts = {}, {}, {}
    metrics: Dict[str, jax.Array] = {}
    for i, res in enumerate(resolutions):
        rng_i = jax.random.fold_in(k_label, i)

        def d_loss_fn(dp, res=res, rng_i=rng_i):
            return _disc_loss_and_stats(
                trainer, res, dp, state.disc_stats[res], fakes0[res],
                reals[res], rng_i,
            )

        (d_loss, d_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.disc_params[res])
        updates, opt_state = trainer.disc_opt.update(
            d_grads, state.disc_opt_states[res], state.disc_params[res])
        new_disc_params[res] = optax.apply_updates(
            state.disc_params[res], updates)
        new_disc_stats[res] = d_stats
        new_disc_opts[res] = opt_state
        metrics[f"d_loss_{res}"] = d_loss

    # 4. G-step against the UPDATED discriminators (train.py:132-151).
    def downstream_loss(fakes, mu, logvar):
        """Everything after the generator forward: adv + DAMSM + KL."""
        total = 0.0
        parts = {}
        disc_stats_after = {}
        for res, fake in zip(resolutions, fakes):
            disc = trainer.discriminators[res]
            probs, mut = disc.apply(
                {"params": new_disc_params[res],
                 "batch_stats": new_disc_stats[res]},
                fake, train=True, mutable=["batch_stats"],
            )
            disc_stats_after[res] = mut["batch_stats"]
            g_adv = (standard_gen_loss(probs)
                     if cfg.loss_variant == "standard"
                     else non_saturating_gen_loss(probs))
            parts[f"g_loss_{res}"] = g_adv
            total = total + g_adv
        # DAMSM coupling on the final resolution (train.py:138-145). The
        # gradient DOES flow through the frozen CNN into the fakes
        # (reference backprops through it), so it must stay inside the
        # grad — but jax.checkpoint (remat) keeps its forward FUSED
        # (no residual saving de-fuses the trunk's conv+BN+relu chains;
        # the backward recomputes the cheap B=16 forward instead).
        if resolutions[-1] == 256:

            def cnn_fwd(img):
                return trainer.cnn.apply(
                    {"params": state.cnn_params,
                     "batch_stats": state.cnn_stats},
                    img, train=False,
                )

            if cfg.remat_coupling:
                cnn_fwd = jax.checkpoint(cnn_fwd)
            regions, cnn_code = cnn_fwd(fakes[-1])
            if trainer.sharded_loss is not None:
                dloss, dparts = trainer.sharded_loss(
                    regions, cnn_code, word_embs, sent_embs, labels, mask,
                    batch["class_ids"])
            else:
                dloss, dparts, _ = damsm_loss(
                    regions, cnn_code, word_embs, sent_embs, labels, mask,
                    batch["class_ids"], cfg.gamma1, cfg.gamma2, cfg.gamma3,
                    cfg.wlambda, cfg.slambda,
                )
            parts["damsm_loss"] = dloss
            total = total + dloss
        kl = kl_loss(mu, logvar)
        parts["kl_loss"] = kl
        total = total + kl
        return total, (parts, disc_stats_after)

    if cfg.reuse_gen_forward:
        (g_total, (g_parts, disc_stats_after)), down_grads = (
            jax.value_and_grad(downstream_loss, argnums=(0, 1, 2),
                               has_aux=True)(fakes1, mu1, logvar1)
        )
        g_grads, = gen_vjp(down_grads)
        gen_stats = gen_stats1
    else:

        def g_loss_fn(gen_params):
            fakes, mu, logvar, gen_stats = run_generator(
                gen_params, state.gen_stats)
            total, (parts, disc_stats_after) = downstream_loss(
                tuple(fakes), mu, logvar)
            return total, (parts, gen_stats, disc_stats_after)

        (g_total, (g_parts, gen_stats, disc_stats_after)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.gen_params)
        )
    updates, gen_opt_state = trainer.gen_opt.update(
        g_grads, state.gen_opt_state, state.gen_params)
    gen_params = optax.apply_updates(state.gen_params, updates)
    metrics.update(g_parts)
    metrics["g_total"] = g_total

    new_state = state.replace(
        gen_params=gen_params,
        gen_stats=gen_stats,
        disc_params=new_disc_params,
        disc_stats=disc_stats_after,
        gen_opt_state=gen_opt_state,
        disc_opt_states=new_disc_opts,
        step=state.step + 1,
        key=key,
    )
    return new_state, metrics
