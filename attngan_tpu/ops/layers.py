"""Reusable conv/norm blocks — the TPU-native equivalent of the reference's
``Layers`` static factory (reference utilities/layers.py:8-176).

All modules are flax.linen, NHWC layout (TPU-native; XLA tiles NHWC convs
onto the MXU directly). BatchNorm carries explicit state in the
``batch_stats`` collection; ``train=True`` uses batch statistics and updates
the running averages (torch train-mode semantics), ``train=False`` uses the
running averages (torch eval()).

Mapping to the reference factory:
  GLU                      -> glu / GLU           (layers.py:13-26)
  conv1x1 / conv3x3        -> conv1x1 / conv3x3   (layers.py:45-58)
  conv4x4DownSpatial       -> conv4x4_down        (layers.py:55-58)
  upBlock                  -> UpBlock             (layers.py:60-69)
  upBlockReLU              -> UpBlockReLU         (layers.py:71-80)
  downBlock                -> DownBlock           (layers.py:115-126)
  downBlockLeakyReLU       -> DownBlockLeakyReLU  (layers.py:82-90)
  Block3x3_relu            -> Block3x3Relu        (layers.py:92-101)
  Block3x3_leakRelu        -> Block3x3LeakyRelu   (layers.py:103-113)
  encode_image_by_16times  -> ImageEncoder16x     (layers.py:128-154)
  ResBlock                 -> ResBlock            (layers.py:156-176)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (new-stat weight).
# flax momentum is the *retain* factor, so 0.9 == torch 0.1.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def glu(x: jax.Array) -> jax.Array:
    """Gated linear unit over the trailing (channel) axis: halves channels.

    Reference layers.py:13-26 splits dim 1 of NCHW; here the channel axis is
    last (NHWC / (B, F)).
    """
    nc = x.shape[-1]
    assert nc % 2 == 0, "GLU needs an even channel count"
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x spatial upsample for NHWC, matching
    nn.Upsample(scale_factor=2, mode='nearest')."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def conv1x1(features: int, use_bias: bool = False, name=None, dtype=None) -> nn.Conv:
    return nn.Conv(features, (1, 1), strides=1, padding=0, use_bias=use_bias,
                   name=name, dtype=dtype)


def conv3x3(features: int, use_bias: bool = False, name=None, dtype=None) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=1, padding=1, use_bias=use_bias,
                   name=name, dtype=dtype)


def conv4x4_down(features: int, use_bias: bool = True, name=None, dtype=None) -> nn.Conv:
    """4x4 stride-2 conv, halves H/W (reference conv4x4DownSpatial)."""
    return nn.Conv(features, (4, 4), strides=2, padding=1, use_bias=use_bias,
                   name=name, dtype=dtype)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact stat semantics.

    flax's nn.BatchNorm stores the BIASED batch variance in its running
    average; torch normalizes with the biased variance in train mode but
    accumulates the UNBIASED (n/(n-1)) variance into running_var. The
    difference (~n/(n-1)) matters when importing/exporting torch weights and
    for eval-mode parity, so this module reproduces torch exactly. Stats and
    normalization are computed in fp32 regardless of compute dtype.
    """

    use_running_average: bool
    momentum: float = BN_MOMENTUM       # retain factor (torch 1 - 0.1)
    epsilon: float = BN_EPS
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, fold_only: bool = False):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        if fold_only:
            # Return the eval-mode affine constants (k, b) — for callers that
            # fold BN into a fused kernel (ops/pallas_upblock.py). ``x`` is a
            # shape hint only; declares the exact same params/stats so the
            # variable tree is identical to the normalizing path.
            assert self.use_running_average, "fold_only is eval-mode only"
            k = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            return k, bias - ra_mean.value * k
        if self.use_running_average:
            # Inference fast path: fold stats+affine into one multiply-add
            # computed in the model dtype (k, b are fp32 constants folded at
            # compile time; avoids fp32 cast round-trips in bf16 graphs).
            k = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            b = bias - ra_mean.value * k
            shape = (1,) * (x.ndim - 1) + (-1,)
            y = x * k.reshape(shape).astype(x.dtype) \
                + b.reshape(shape).astype(x.dtype)
            return y.astype(x.dtype if self.dtype is None else self.dtype)
        # Train mode: batch statistics (fp32) + running-average updates.
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf - mean.reshape(
            (1,) * (x.ndim - 1) + (-1,))), axis=axes)
        if not self.is_initializing():
            n = 1
            for dim in x.shape[:-1]:
                n *= dim
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * unbiased
        shape = (1,) * (x.ndim - 1) + (-1,)
        y = (xf - mean.reshape(shape)) * jax.lax.rsqrt(
            var.reshape(shape) + self.epsilon)
        y = y * scale.reshape(shape) + bias.reshape(shape)
        return y.astype(x.dtype if self.dtype is None else self.dtype)


def batch_norm(train: bool, name=None, dtype=None) -> TorchBatchNorm:
    return TorchBatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                          epsilon=BN_EPS, name=name, dtype=dtype)


def calculate_out_hw(hw: int, k: int, s: int, p: int = 0) -> int:
    """Conv output size: floor((hw + 2p - k)/s) + 1 (reference
    utilities/layers.py:41-43)."""
    return (hw + 2 * p - k) // s + 1


def solve_conv_params(in_hw: int, out_hw: int, max_kern: int = 4,
                      max_stride: int = 3, max_pad: int = 3):
    """Search (kernel, stride, pad) hitting an exact output size, preferring
    large kernel, then large pad, then large stride (reference
    utilities/layers.py:28-38 ``Layers.conv``)."""
    valid = [
        (k, s, p)
        for k in range(1, max_kern + 1)
        for s in range(1, max_stride + 1)
        for p in range(max_pad + 1)
        if calculate_out_hw(in_hw, k, s, p) == out_hw
    ]
    if not valid:
        raise ValueError(
            f"no (k, s, p) with k<={max_kern}, s<={max_stride}, p<={max_pad} "
            f"maps {in_hw} -> {out_hw}")
    return max(valid, key=lambda x: (x[0], x[2], x[1]))


def conv_for_output(features: int, in_hw: int, out_hw: int, use_bias=False,
                    name=None, dtype=None, **limits) -> nn.Conv:
    """Conv layer whose (k, s, p) are solved to hit ``out_hw`` exactly."""
    k, s, p = solve_conv_params(in_hw, out_hw, **limits)
    return nn.Conv(features, (k, k), strides=s, padding=p, use_bias=use_bias,
                   name=name, dtype=dtype)


def upsample_conv3x3_fused(x: jax.Array, kernel: jax.Array,
                           dtype=None) -> jax.Array:
    """conv3x3(nearest_upsample_2x(x)) WITHOUT materializing the 4x tensor.

    Exact parity decomposition: on the nearest-upsampled grid, every output
    pixel of parity (py, px) sees a 3x3 window whose entries collapse onto a
    2x2 neighborhood of the ORIGINAL grid — adjacent taps that land on the
    same source pixel sum their weights. So the op equals FOUR 2x2 convs
    (one per parity, kernels derived from the 3x3 weights by pairwise sums)
    followed by a pixel interleave. 2.25x fewer MXU tap-multiplies and no
    (B, 2H, 2W, C_in) intermediate in HBM; boundary-exact vs zero padding
    (verified to fp32 tolerance in tests/test_layers.py).
    """
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    b, h, w_dim, _ = x.shape
    c_out = kernel.shape[-1]

    # Row-parity collapse: parity 0 rows read (i-1, i); parity 1 read (i, i+1)
    w_r0 = jnp.stack([kernel[0], kernel[1] + kernel[2]], axis=0)  # (2,3,Ci,Co)
    w_r1 = jnp.stack([kernel[0] + kernel[1], kernel[2]], axis=0)
    # Column-parity collapse of each
    def cols(wk):
        return (jnp.stack([wk[:, 0], wk[:, 1] + wk[:, 2]], axis=1),
                jnp.stack([wk[:, 0] + wk[:, 1], wk[:, 2]], axis=1))

    k00, k01 = cols(w_r0)
    k10, k11 = cols(w_r1)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(xs, k):
        # no preferred_element_type: a fp32 accumulator output makes the
        # conv VJP mix fp32 cotangents with bf16 operands (TypeError); the
        # MXU accumulates in fp32 internally regardless.
        return jax.lax.conv_general_dilated(
            xs, k, (1, 1), "VALID", dimension_numbers=dn)

    y00 = conv(xp[:, : h + 1, : w_dim + 1], k00)   # rows (i-1,i), cols (j-1,j)
    y01 = conv(xp[:, : h + 1, 1:], k01)            # rows (i-1,i), cols (j,j+1)
    y10 = conv(xp[:, 1:, : w_dim + 1], k10)        # rows (i,i+1), cols (j-1,j)
    y11 = conv(xp[:, 1:, 1:], k11)                 # rows (i,i+1), cols (j,j+1)

    top = jnp.stack([y00, y01], axis=3).reshape(b, h, 2 * w_dim, c_out)
    bot = jnp.stack([y10, y11], axis=3).reshape(b, h, 2 * w_dim, c_out)
    return jnp.stack([top, bot], axis=2).reshape(b, 2 * h, 2 * w_dim, c_out)


def upsample_conv3x3_dilated(x: jax.Array, kernel: jax.Array,
                             dtype=None) -> jax.Array:
    """conv3x3(nearest_upsample_2x(x)) as ONE input-dilated conv.

    The conv-transpose identity: with the input dilated 2x (zeros between
    pixels) and a 4x4 kernel K4 = A w A^T, A = [[1,0,0],[1,1,0],[0,1,1],
    [0,0,1]], each output parity's taps land exactly on its 2x2
    parity-summed kernel (the same collapse as upsample_conv3x3_fused) and
    the off-parity taps hit dilation zeros. One dense MXU conv, no
    (B, 2H, 2W, C_in) intermediate, and — unlike the Pallas eval kernel —
    an ordinary differentiable XLA op usable in training.

    Honest on-device A/B (v5e, B=128, Ci=64, Co=32, device_timeit): 13.6 ms
    vs 24.7 naive at the 128^2->256^2 generator tail (1.8x), 4.0 vs 4.6 at
    64^2, a wash at 32^2 — hence UpBlock's >=64 spatial gate.
    """
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    a = jnp.asarray([[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]],
                    kernel.dtype)
    k4 = jnp.einsum("ar,bc,rcio->abio", a, a, kernel)
    return jax.lax.conv_general_dilated(
        x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class UpBlock(nn.Module):
    """2x nearest upsample -> conv3x3(out*2) -> BN -> GLU (layers.py:60-69).

    Default algorithm is measured per spatial size: at >=64^2 the
    upsample+conv runs as ONE input-dilated conv (upsample_conv3x3_dilated,
    1.8x over the naive chain at the 128^2 tail on v5e); below that the
    naive upsample+conv chain wins (dispatch/small-grid dominated).
    fused=True forces the 4-conv parity decomposition (kept for A/B;
    measured slower); fused_inference routes EVAL-mode forwards through a
    Pallas block kernel — True/"pallas" = ops/pallas_upblock.py (ties the
    dilated form at 128^2), "packed" = the lane-packed redesign
    (ops/pallas_upblock_packed.py, exact only at the generator-tail dims
    Ci=64->Co=32; other dims fall back to the measured default below),
    "packed64" = packed ONLY at 64^2 input (dilated elsewhere — the
    per-size winners). All Pallas forms are forward-only. All paths share
    one (3,3,Cin,2*out) kernel param (checkpoint compatible).
    """

    out_features: int
    dtype: jnp.dtype | None = None
    fused: bool = False
    fused_inference: bool | str = False  # Pallas eval kernel (train keeps XLA)

    @nn.compact
    def __call__(self, x, train: bool = True):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.out_features * 2))
        # size gate: the Pallas kernel pays at >=64^2 spatial (honest A/B,
        # B=128 Ci=64: 22.4 vs 42.2 ms at 128^2, 6.4 vs 8.6 at 64^2, but
        # 5.1 vs 2.7 at 32^2 where dispatch + small grids dominate)
        mode = self.fused_inference
        packed_ok = (x.shape[-1] * 2 == 128 and self.out_features * 4 == 128
                     and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if mode == "packed64" and not (packed_ok and x.shape[1] == 64):
            mode = False        # hybrid: packed ONLY at the 64^2 tail,
            #                     measured-default dilated form elsewhere
        if mode == "packed" and not packed_ok:
            mode = False        # dims outside the kernel's specialization
        if mode and not train and x.shape[1] >= 64:
            bn = batch_norm(train, dtype=self.dtype)
            k, b = bn(jnp.zeros((1, self.out_features * 2), jnp.float32),
                      fold_only=True)
            if self.dtype is not None:
                x = x.astype(self.dtype)
            if mode in ("packed", "packed64"):
                from attngan_tpu.ops.pallas_upblock_packed import (
                    upblock_pallas_packed)

                return upblock_pallas_packed(x, kernel, k, b)
            from attngan_tpu.ops.pallas_upblock import upblock_pallas

            return upblock_pallas(x, kernel, k, b)
        if self.fused:
            x = upsample_conv3x3_fused(x, kernel, self.dtype)
        elif x.shape[1] >= 64:
            x = upsample_conv3x3_dilated(x, kernel, self.dtype)
        else:
            x = upsample_nearest_2x(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)
                kernel = kernel.astype(self.dtype)
            x = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = batch_norm(train, dtype=self.dtype)(x)
        return glu(x)


class UpBlockReLU(nn.Module):
    """2x nearest upsample -> conv3x3 -> BN -> ReLU (layers.py:71-80)."""

    out_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = upsample_nearest_2x(x)
        x = conv3x3(self.out_features, dtype=self.dtype)(x)
        x = batch_norm(train, dtype=self.dtype)(x)
        return nn.relu(x)


class DownBlock(nn.Module):
    """conv4x4 stride2 (no bias) -> BN -> LeakyReLU(0.2) (layers.py:115-126)."""

    out_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = conv4x4_down(self.out_features, use_bias=False, dtype=self.dtype)(x)
        x = batch_norm(train, dtype=self.dtype)(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class DownBlockLeakyReLU(nn.Module):
    """conv4x4 stride2 (bias) -> BN -> LeakyReLU(0.2) (layers.py:82-90)."""

    out_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = conv4x4_down(self.out_features, use_bias=True, dtype=self.dtype)(x)
        x = batch_norm(train, dtype=self.dtype)(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class Block3x3Relu(nn.Module):
    """conv3x3(out*2) -> BN -> GLU, same spatial size (layers.py:92-101)."""

    out_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = conv3x3(self.out_features * 2, dtype=self.dtype)(x)
        x = batch_norm(train, dtype=self.dtype)(x)
        return glu(x)


class Block3x3LeakyRelu(nn.Module):
    """conv3x3 -> BN -> LeakyReLU(0.2), same spatial size (layers.py:103-113)."""

    out_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = conv3x3(self.out_features, dtype=self.dtype)(x)
        x = batch_norm(train, dtype=self.dtype)(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class ImageEncoder16x(nn.Module):
    """4 stride-2 4x4 convs: (B,H,W,3) -> (B,H/16,W/16,8*df).

    First conv has no BN; the rest are conv->BN->LeakyReLU
    (reference encode_image_by_16times, layers.py:128-154).
    """

    df_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        df = self.df_dim
        x = conv4x4_down(df, use_bias=False, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        for mult in (2, 4, 8):
            x = conv4x4_down(df * mult, use_bias=False, dtype=self.dtype)(x)
            x = batch_norm(train, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        return x


class ResBlock(nn.Module):
    """conv3x3(c*2)->BN->GLU->conv3x3(c)->BN + skip (layers.py:156-176)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = conv3x3(self.features * 2, dtype=self.dtype)(x)
        y = batch_norm(train, dtype=self.dtype)(y)
        y = glu(y)
        y = conv3x3(self.features, dtype=self.dtype)(y)
        y = batch_norm(train, dtype=self.dtype)(y)
        return y + residual
