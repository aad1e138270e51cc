"""attngan_tpu — a TPU-native (JAX / XLA / Pallas / pjit) text-to-image framework.

Re-implements the full capability surface of the PyTorch reference
(ku222/Attention-GAN, mounted at /root/reference) as a brand-new, idiomatic
JAX stack:

  * DAMSM pretraining: a lax.scan bidirectional-LSTM text encoder and an
    Inception-v3 image encoder trained with word- and sentence-level
    contrastive losses (reference: pretrain_damsm.py, losses/words_loss.py,
    losses/sentence_loss.py).
  * A 3-stage (64/128/256 px) attentional GAN with conditioning-augmentation
    KL loss and per-resolution discriminators (reference: train.py,
    networks/generator.py, networks/discriminators.py).
  * A clustering-based pseudo-caption pipeline (reference: data/bedrooms.py
    HierarchicalClusterer) and batched text→image inference (test.py).

Design: NHWC image layout, (batch, seq, feature) text layout, explicit PRNG
key threading, flax.linen modules, optax optimizers, orbax checkpointing,
Pallas kernels for the fused attention hot paths, and data-parallel sharding
over a jax.sharding.Mesh (ICI collectives inserted by XLA under jit).
"""

__version__ = "0.1.0"
