"""FID harness (SURVEY.md §7 step 11 — a gap in the reference, which
publishes no metrics; BASELINE.md requires FID parity checking).

Features are the 2048-d pooled Inception-v3 activations from the same
InceptionV3Trunk used by the DAMSM encoder (the classic FID feature space
when loaded with converted torchvision weights). Statistics are accumulated
on device in batches; the Frechet distance (matrix sqrt) runs host-side via
scipy eigendecomposition.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray,
                     eps: float = 1e-6) -> float:
    """||mu1 - mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    covmean = np.real(covmean)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def activation_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D))."""
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


class FIDEvaluator:
    """Computes FID between two image sets in [-1, 1] NHWC.

    feature_fn: images -> (N, D) features. Defaults to the InceptionV3Trunk
    pooled output. Pass converted-torchvision variables for standard FID;
    without them the random-init trunk's BatchNorm running stats are
    CALIBRATED on seeded noise first — in raw eval mode the default (0, 1)
    stats mismatch the random convs' activation scale, the signal decays
    ~0.5x per block, and the pooled features collapse to a near-constant
    (measured std ~3e-4, per-image spread ~1e-6: FID of anything vs
    anything reads ~0). Calibrated random features are a self-consistent
    relative metric; absolute FID still needs real weights.
    """

    def __init__(self, feature_fn: Optional[Callable] = None,
                 variables: Optional[dict] = None, batch_size: int = 32,
                 seed: int = 0):
        self.batch_size = batch_size
        if feature_fn is None:
            from attngan_tpu.models.cnn_encoder import BN_MOMENTUM, InceptionV3Trunk

            trunk = InceptionV3Trunk(dtype=jnp.bfloat16)
            if variables is None:
                variables = trunk.init(
                    jax.random.key(seed), jnp.zeros((1, 64, 64, 3)),
                    train=False)
                params = variables["params"]
                stats = variables["batch_stats"]
                calib = jax.random.uniform(
                    jax.random.key(seed + 1), (16, 128, 128, 3),
                    minval=-1.0, maxval=1.0)

                @jax.jit
                def batch_stats_of(stats, x):
                    _, mut = trunk.apply(
                        {"params": params, "batch_stats": stats}, x,
                        train=True, mutable=["batch_stats"])
                    return mut["batch_stats"]

                # ONE pass reaches the fixed point: train-mode BN
                # normalizes with the batch's own stats, so the mutated
                # running stats are independent of the stats passed in.
                # Invert the EMA (new = m*old + (1-m)*batch) to SET the
                # running stats to the calibration batch's stats.
                new = batch_stats_of(stats, calib)
                stats = jax.tree_util.tree_map(
                    lambda n, o: (n - BN_MOMENTUM * o) / (1 - BN_MOMENTUM),
                    new, stats)
                variables = {"params": params, "batch_stats": stats}
            fwd = jax.jit(lambda x: trunk.apply(variables, x, train=False)[1]
                          .astype(jnp.float32))
            feature_fn = fwd
        self.feature_fn = feature_fn

    def features(self, images: np.ndarray) -> np.ndarray:
        out = []
        bs = self.batch_size
        for start in range(0, images.shape[0], bs):
            batch = jnp.asarray(images[start : start + bs])
            if batch.shape[0] < bs:  # pad to a single compiled shape
                pad = bs - batch.shape[0]
                padded = jnp.pad(batch, ((0, pad), (0, 0), (0, 0), (0, 0)))
                out.append(np.asarray(self.feature_fn(padded))[: batch.shape[0]])
            else:
                out.append(np.asarray(self.feature_fn(batch)))
        return np.concatenate(out, axis=0)

    def fid(self, real_images: np.ndarray, fake_images: np.ndarray) -> float:
        mu_r, sig_r = activation_statistics(self.features(real_images))
        mu_f, sig_f = activation_statistics(self.features(fake_images))
        return frechet_distance(mu_r, sig_r, mu_f, sig_f)


def int8_vs_bf16_fid(trainer, state, tokens, lengths, key,
                     real_images: Optional[np.ndarray] = None,
                     evaluator: Optional["FIDEvaluator"] = None,
                     int8_percentile: float = 99.0) -> dict:
    """Quality delta of the int8 serving tier, in FID units.

    Samples the SAME (tokens, lengths, key) batch through the float
    Sampler and the Int8Sampler, then reports:

    - ``fid_int8_vs_float``: FID between the two generated sets — the
      distribution shift int8 introduces, measurable on any checkpoint;
    - ``fid_float`` / ``fid_int8`` vs ``real_images`` when given — the
      absolute comparison that needs a trained checkpoint + real data
      (the number that decides whether the tier ships, VERDICT r2 #8).

    Images are denormalized [0, 1] from the samplers; they are mapped back
    to the trunk's [-1, 1] domain here.
    """
    from attngan_tpu.infer.quantize import Int8Sampler
    from attngan_tpu.infer.sampler import Sampler

    if evaluator is None:
        evaluator = FIDEvaluator()
    float_imgs = np.asarray(
        Sampler(trainer, state).generate_from_tokens(tokens, lengths, key))
    int8_imgs = np.asarray(
        Int8Sampler(trainer, state, percentile=int8_percentile)
        .generate_from_tokens(tokens, lengths, key))
    to_trunk = lambda x: x.astype(np.float32) * 2.0 - 1.0
    out = {"fid_int8_vs_float": evaluator.fid(to_trunk(float_imgs),
                                              to_trunk(int8_imgs))}
    if real_images is not None:
        mu_r, sig_r = activation_statistics(
            evaluator.features(np.asarray(real_images)))
        for name, imgs in (("float", float_imgs), ("int8", int8_imgs)):
            mu, sig = activation_statistics(evaluator.features(to_trunk(imgs)))
            out[f"fid_{name}"] = frechet_distance(mu_r, sig_r, mu, sig)
    return out
