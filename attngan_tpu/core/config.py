"""Configuration dataclasses for the framework.

The reference keeps its configuration as module-level UPPERCASE constants in
its entry scripts (reference train.py:34-49, pretrain_damsm.py:39-46) plus a
vestigial config.py. Here every phase gets a frozen dataclass whose defaults
reproduce those constants, and the root-level CLI shims expose them as flags.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class DamsmConfig:
    """DAMSM pretraining phase (reference pretrain_damsm.py:39-46)."""

    emb_dim: int = 256          # EMB_DIM: joint word/image embedding width
    text_emb_dim: int = 300     # nn.Embedding width (reference rnn_encoder.py:38)
    dropout: float = 0.5        # embedding dropout (reference rnn_encoder.py:39)
    batch_size: int = 64        # BATCH_SIZE
    lr: float = 0.002           # LR
    betas: Tuple[float, float] = (0.5, 0.999)
    rnn_grad_clip: float = 0.25  # RNN_GRAD_CLIP, clip_grad_norm_ on RNN params only
    epochs: int = 30
    # DAMSM attention/loss temperatures (reference words_loss.py:12-17)
    gamma1: float = 4.0
    gamma2: float = 5.0
    gamma3: float = 10.0
    wlambda: float = 5.0
    slambda: float = 5.0
    # TPU-specific knobs (no reference equivalent)
    compute_dtype: str = "bfloat16"  # trunk/matmul compute dtype
    image_encoder: str = "inception_v3"  # or "tiny" (tests/cheap runs)
    cache_region_features: bool = False  # cache frozen-trunk features per image
    trunk_int8: bool = False
    # ^ run the frozen image trunk in int8 (s8xs8->s32 MXU convs, activation
    #   scales calibrated on the first batch) — an opt-in throughput lever
    #   with a fixed, measurable embedding perturbation (infer/quantize.py).
    trunk_train_mode_bn: bool = False
    # ^ the reference accidentally runs the frozen Inception trunk with
    #   train-mode BatchNorm during DAMSM pretraining (the model is never put
    #   in eval()); True reproduces that, False (default) uses running stats.
    superbatch: int = 1
    # ^ amortize the frozen-trunk forward: run it ONCE at superbatch*batch_size
    #   images, then perform `superbatch` sequential batch_size-sized
    #   contrastive optimization steps inside one jit (lax.scan) — EXACT
    #   reference step semantics (the trunk is frozen, so its features do not
    #   depend on when they are computed), fewer per-step dispatch latencies.
    #   Incompatible with trunk_train_mode_bn; ignored on the cached path.


@dataclass(frozen=True)
class GanConfig:
    """Adversarial training phase (reference train.py:34-49)."""

    gf_dim: int = 32            # GF_DIM generator base width
    df_dim: int = 64            # DF_DIM discriminator base width
    emb_dim: int = 256          # EMB_DIM text embedding width
    cond_dim: int = 100         # COND_DIM conditioning-augmentation width
    z_dim: int = 100            # Z_DIM noise width
    seq_len: int = 5            # SEQ_LEN max caption tokens (static shape)
    batch_size: int = 16        # BATCH_SIZE (global batch, sharded over mesh)
    gen_lr: float = 2e-4        # GEN_LR
    disc_lr: float = 2e-4       # DISC_LR
    betas: Tuple[float, float] = (0.5, 0.999)
    epochs: int = 150
    # DAMSM temperatures reused by the G-step DAMSM term (train.py:44-49)
    gamma1: float = 4.0
    gamma2: float = 5.0
    gamma3: float = 10.0
    wlambda: float = 5.0
    slambda: float = 5.0
    num_stages: int = 3         # 1 => 64px only; 2 => +128 attention; 3 => full
    label_smooth: float = 0.8   # StandardDiscLoss real-label smoothing low bound
    loss_variant: str = "non_saturating"  # or "standard" (reference disc_loss.py)
    compute_dtype: str = "bfloat16"
    image_encoder: str = "inception_v3"  # DAMSM-coupling encoder; or "tiny"
    remat_coupling: bool = False
    # ^ jax.checkpoint the frozen-CNN DAMSM coupling in the G-step.
    #   Measured on v5e at B=16: LOSES (48.7 vs 45.4 ms/step) — the
    #   recompute costs more than the residual traffic it saves at this
    #   batch; kept as a knob for memory-constrained larger batches.
    fused_attention: bool = False
    # ^ Pallas generator word-attention kernel (ops/pallas_attention.py).
    #   Measured LOSING at gf=32 (C=32 wastes 3/4 of the vector lanes);
    #   for wide-channel variants.
    fused_upsample: bool | str = False
    # ^ Pallas eval-mode UpBlock kernel (ops/pallas_upblock.py). Wins
    #   isolated at 128^2 but loses in the full sampler to XLA's fused
    #   chain (BENCH.md round 2); the measured default is the dilated-conv
    #   form, which needs no flag.
    reuse_gen_forward: bool = True
    # ^ Run the generator forward ONCE per step via jax.vjp and reuse its
    #   fakes for both the D-steps and the G-grad pullback — the
    #   reference's retained-autograd-graph semantics (train.py:119-145
    #   reuses one fake tensor for D [detached] and G). False recomputes
    #   the forward inside the G-step's value_and_grad (round-1/2
    #   structure, kept for A/B + parity tests).

    @property
    def resolutions(self) -> Tuple[int, ...]:
        return (64, 128, 256)[: self.num_stages]


@dataclass(frozen=True)
class DataConfig:
    """Dataset/caption pipeline (reference data/bedrooms.py)."""

    rootdir: str = ""
    max_images: int = 99999
    captions_path: str = "captionsAndClassIDs.json"
    max_seqlen: int = 8         # captions padded to this static length
    # HierarchicalClusterer settings (reference pretrain_damsm.py:55-57)
    latent_dims: int = 128
    min_clusters: int = 5
    max_vocab_size: int = 1000
    cluster_method: str = "agglomerative_complete"
    embed_batch_size: int = 32
    flip_augment: bool = True   # eager horizontally-flipped duplicate of each image


@dataclass(frozen=True)
class RunConfig:
    """Process-level knobs shared by every entry point."""

    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    image_dir: str = "generated_images"
    # () => 1-D 'data' mesh over the devices that divide the batch;
    # (n,) => 1-D over first n devices; (s, d) => 2-D ('slice', 'data')
    # multi-slice mesh (parallel/mesh.py::make_mesh)
    mesh_shape: Tuple[int, ...] = ()
    log_every: int = 50
    checkpoint_every_epochs: int = 1
    profile: bool = False  # trace steps 2-7 with jax.profiler (StepWindowProfiler)


def replace(cfg, **kw):
    """Functional update helper for frozen configs."""
    return dataclasses.replace(cfg, **kw)


class Config:
    """Default filesystem layout for the CLI entry points (reference
    config.py:3-5 held two hardcoded Windows dataset paths; here the paths
    are env-var-overridable defaults behind real CLI flags)."""

    DATA_ROOT = os.environ.get("ATTNGAN_DATA_ROOT", "data/images")
    CAPTIONS_JSON = os.environ.get(
        "ATTNGAN_CAPTIONS", "data/captionsAndClassIDs.json")
    CHECKPOINT_DIR = os.environ.get("ATTNGAN_CKPT_DIR", "checkpoints")
    IMAGE_DIR = os.environ.get("ATTNGAN_IMAGE_DIR", "generated_images")
