"""VGG19-BN feature extractor (for the DFCVAE's deep-feature-consistent
loss), flax/NHWC.

Reference: networks/VAE.py:82-88,143-162 — a frozen torchvision vgg19_bn
whose ``features`` Sequential is walked module by module, collecting the
outputs at indices ['14', '24', '34', '43']. The flax modules are named
``features_{i}`` with the same indices as torchvision's state_dict keys
(features.0.weight, ...) so the weight converter maps 1:1.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from attngan_tpu.ops.layers import TorchBatchNorm

# VGG-19 configuration "E": conv widths with 'M' maxpools between stages.
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

DEFAULT_FEATURE_LAYERS = (14, 24, 34, 43)  # reference VAE.py:150


def _torch_module_index_plan() -> List[Tuple[int, str, int]]:
    """[(torch module index, kind, width)] for vgg19_bn.features:
    each conv entry expands to conv, bn, relu; 'M' is one maxpool."""
    plan, idx = [], 0
    for entry in VGG19_CFG:
        if entry == "M":
            plan.append((idx, "pool", 0))
            idx += 1
        else:
            plan.append((idx, "conv", entry))
            plan.append((idx + 1, "bn", entry))
            plan.append((idx + 2, "relu", entry))
            idx += 3
    return plan


class VGG19BNFeatures(nn.Module):
    """Runs the features trunk, returning the outputs at ``taps`` indices
    (torchvision module indices). Frozen usage: train=False always.

    Inplace-ReLU quirk, reproduced deliberately: the reference appends the
    raw tensor after module ``idx`` (VAE.py:157-160), but torchvision's
    ``ReLU(inplace=True)`` then MUTATES any tap taken at a BatchNorm index
    before the loss reads it — so the reference's EFFECTIVE features at BN
    taps (24, 34 of the default [14, 24, 34, 43]) are post-ReLU, while conv
    taps (14, 43) stay pre-BN. Verified against a torch oracle with
    torchvision's exact Sequential in tests/test_torch_oracle_trunks.py.
    """

    taps: Sequence[int] = DEFAULT_FEATURE_LAYERS
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        plan = _torch_module_index_plan()
        kind_at = {idx: kind for idx, kind, _ in plan}
        # a BN tap is effectively collected AFTER the following inplace relu
        collect_at = {}
        for t in self.taps:
            at = t + 1 if kind_at[t] == "bn" else t
            if at in collect_at:
                raise ValueError(
                    f"taps {collect_at[at]} and {t} collide: a BN tap {t} is "
                    f"collected at index {at} (post inplace-ReLU) — pick "
                    "non-adjacent taps")
            collect_at[at] = t
        outputs = {}
        for idx, kind, width in plan:
            if kind == "conv":
                x = nn.Conv(width, (3, 3), padding=1, use_bias=True,
                            name=f"features_{idx}", dtype=self.dtype)(x)
            elif kind == "bn":
                x = TorchBatchNorm(use_running_average=not train,
                                   name=f"features_{idx}", dtype=self.dtype)(x)
            elif kind == "relu":
                x = nn.relu(x)
            else:  # pool
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if idx in collect_at:
                outputs[collect_at[idx]] = x
        return [outputs[t] for t in self.taps]
