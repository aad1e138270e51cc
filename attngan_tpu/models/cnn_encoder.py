"""Inception-v3 DAMSM image encoder, ported to flax/NHWC.

Reference: networks/cnn_encoder.py:13-102 — a frozen torchvision Inception-v3
trunk re-wired by hand (:37-54), bilinear-resized 299x299 input INSIDE the
forward (:75, align_corners=False), a region tap at Mixed_6e (17x17x768,
:92), and two trainable heads: conv1x1(768 -> out_dim) on regions and
Linear(2048 -> out_dim) on the pooled global code, both init U(-0.1, 0.1)
(:56-63). Note the reference feeds [-1, 1] images straight in with NO
Inception channel renormalization — preserved here.

Module names mirror torchvision's Inception3 state_dict keys
(Conv2d_1a_3x3.conv, Mixed_5b.branch1x1, ...) so the one-time weight
converter (tools/convert_torch_weights.py) is a pure key-transpose.

Freezing: the trunk has no notion of requires_grad in JAX — the train steps
partition the param tree with ``trainable_mask`` below and differentiate
only the heads, while the GAN phase still backprops THROUGH the trunk into
the generator's fake images (reference train.py:138-143).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from attngan_tpu.ops.layers import TorchBatchNorm

# torchvision BasicConv2d BN: eps=0.001, default momentum 0.1
INCEPTION_BN_EPS = 1e-3
BN_MOMENTUM = 0.9


def _head_init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -0.1, 0.1)


class _ConvKernel(nn.Module):
    """Bare conv kernel param with nn.Conv's exact tree layout
    (``<name>/kernel``) and init — lets BasicConv2d's packed path share
    checkpoints/converted torch weights with the nn.Conv path."""

    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class BasicConv2d(nn.Module):
    """conv(no bias) -> BN(eps=1e-3) -> relu (torchvision BasicConv2d).

    ``pack_w`` > 1 routes the conv through ops/packed_conv.py (g output
    columns packed into the lane dim — the TPU layout fix for the stem's
    lane-starved 32/64-channel convs); parameters and numerics are
    identical (packed_conv is exact)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    padding: Tuple[Tuple[int, int], Tuple[int, int]] | int = 0
    dtype: jnp.dtype | None = None
    pack_w: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False, fold_only: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        if fold_only:
            # Eval-mode folded weights for layout-lifted callers (the s2d
            # stem): conv->BN->relu == relu(conv(x, w*k) + b) with (k, b)
            # the BN affine constants. ``x`` is a channel-count hint only.
            # Declares the identical param/stat tree as the normal path.
            assert not train, "fold_only is eval-mode only"
            kernel = _ConvKernel(self.kernel + (x.shape[-1], self.features),
                                 name="conv")()
            k, b = TorchBatchNorm(use_running_average=True,
                                  momentum=BN_MOMENTUM,
                                  epsilon=INCEPTION_BN_EPS, name="bn",
                                  dtype=self.dtype)(
                jnp.zeros((1, self.features)), fold_only=True)
            return kernel * k, b
        if self.pack_w > 1:
            from flax.linen import dtypes as nn_dtypes

            from attngan_tpu.ops.packed_conv import packed_conv

            kernel = _ConvKernel(self.kernel + (x.shape[-1], self.features),
                                 name="conv")()
            x, kernel = nn_dtypes.promote_dtype(x, kernel, dtype=self.dtype)
            s = self.strides
            x = packed_conv(x, kernel, g=self.pack_w,
                            strides=(s, s) if isinstance(s, int) else tuple(s),
                            padding=pad)
        else:
            x = nn.Conv(self.features, self.kernel, strides=self.strides,
                        padding=pad, use_bias=False, name="conv",
                        dtype=self.dtype)(x)
        x = TorchBatchNorm(use_running_average=not train,
                           momentum=BN_MOMENTUM, epsilon=INCEPTION_BN_EPS,
                           name="bn", dtype=self.dtype)(x)
        return nn.relu(x)


def _fused_siblings(x, branches, strides=1, padding=0):
    """Run same-geometry sibling convs that read the SAME input as ONE conv.

    The MXU emits 128 output columns per pass, so a conv with 48-192 output
    channels wastes 25-62% of the lanes; sibling branches of an Inception
    block (e.g. InceptionC's three input-side convs: 192 + c7 + c7 >= 448
    columns) concatenated along Cout fill them. Column j of a matmul is
    computed identically wherever it sits, so this is EXACT — conv ->
    folded-BN -> relu per branch == relu(conv(x, [w1*k1 | w2*k2 | ...]) +
    [b1 | b2 | ...]) sliced back. Eval-mode only (BN folded); param tree
    identical to the per-branch path (fold_only declares the same params).

    ``branches``: list of BasicConv2d modules (same kernel/strides/padding).
    Returns the per-branch outputs as a tuple.
    """
    dt = x.dtype
    hint = jnp.zeros((1, 1, 1, x.shape[-1]))
    folded = [m(hint, fold_only=True) for m in branches]
    wcat = jnp.concatenate([w for w, _ in folded], axis=-1).astype(dt)
    bcat = jnp.concatenate([b for _, b in folded], axis=-1).astype(dt)
    pad = padding
    if isinstance(pad, int):
        pad = ((pad, pad), (pad, pad))
    y = jax.lax.conv_general_dilated(
        x, wcat, window_strides=(strides, strides), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = nn.relu(y + bcat)
    sizes = np.cumsum([m.features for m in branches])[:-1]
    return tuple(jnp.split(y, sizes, axis=-1))


def _max_pool3x3s2(x):
    # Separable two-pass max (3x1 stride-2 rows, then 1x3 stride-2 cols) —
    # bit-exact vs the 9-tap window and measured 4.6x faster at the stem's
    # (147,147,64) shape on v5e (3.4 vs 15.8 ms per 10-rep program; ties at
    # the other trunk pool shapes, where channels fill the vector lanes).
    x = nn.max_pool(x, (3, 1), strides=(2, 1), padding="VALID")
    return nn.max_pool(x, (1, 3), strides=(1, 2), padding="VALID")


def _avg_pool3x3s1p1(x):
    # torch avg_pool2d(3, stride=1, padding=1) counts padded zeros in the mean
    return nn.avg_pool(x, (3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), count_include_pad=True)


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        heads = [BasicConv2d(64, (1, 1), name="branch1x1", dtype=d),
                 BasicConv2d(48, (1, 1), name="branch5x5_1", dtype=d),
                 BasicConv2d(64, (1, 1), name="branch3x3dbl_1", dtype=d)]
        if train:
            b1, b5, b3 = (m(x, train) for m in heads)
        else:
            b1, b5, b3 = _fused_siblings(x, heads)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2", dtype=d)(b5, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2", dtype=d)(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3", dtype=d)(b3, train)
        bp = _avg_pool3x3s1p1(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool", dtype=d)(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), strides=2, name="branch3x3", dtype=d)(x, train)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", dtype=d)(x, train)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2", dtype=d)(bd, train)
        bd = BasicConv2d(96, (3, 3), strides=2, name="branch3x3dbl_3", dtype=d)(bd, train)
        bp = _max_pool3x3s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))  # (1,7) kernel padding
        p71 = ((3, 3), (0, 0))  # (7,1) kernel padding
        heads = [BasicConv2d(192, (1, 1), name="branch1x1", dtype=d),
                 BasicConv2d(c7, (1, 1), name="branch7x7_1", dtype=d),
                 BasicConv2d(c7, (1, 1), name="branch7x7dbl_1", dtype=d)]
        if train:
            b1, b7, bd = (m(x, train) for m in heads)
        else:
            b1, b7, bd = _fused_siblings(x, heads)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2", dtype=d)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3", dtype=d)(b7, train)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2", dtype=d)(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3", dtype=d)(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4", dtype=d)(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5", dtype=d)(bd, train)
        bp = _avg_pool3x3s1p1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", dtype=d)(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        heads = [BasicConv2d(192, (1, 1), name="branch3x3_1", dtype=d),
                 BasicConv2d(192, (1, 1), name="branch7x7x3_1", dtype=d)]
        if train:
            b3, b7 = (m(x, train) for m in heads)
        else:
            b3, b7 = _fused_siblings(x, heads)
        b3 = BasicConv2d(320, (3, 3), strides=2, name="branch3x3_2", dtype=d)(b3, train)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2", dtype=d)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3", dtype=d)(b7, train)
        b7 = BasicConv2d(192, (3, 3), strides=2, name="branch7x7x3_4", dtype=d)(b7, train)
        bp = _max_pool3x3s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        heads = [BasicConv2d(320, (1, 1), name="branch1x1", dtype=d),
                 BasicConv2d(384, (1, 1), name="branch3x3_1", dtype=d),
                 BasicConv2d(448, (1, 1), name="branch3x3dbl_1", dtype=d)]
        if train:
            b1, b3, bd = (m(x, train) for m in heads)
        else:
            b1, b3, bd = _fused_siblings(x, heads)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=p13, name="branch3x3_2a", dtype=d)(b3, train),
            BasicConv2d(384, (3, 1), padding=p31, name="branch3x3_2b", dtype=d)(b3, train),
        ], axis=-1)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2", dtype=d)(bd, train)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=p13, name="branch3x3dbl_3a", dtype=d)(bd, train),
            BasicConv2d(384, (3, 1), padding=p31, name="branch3x3dbl_3b", dtype=d)(bd, train),
        ], axis=-1)
        bp = _avg_pool3x3s1p1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", dtype=d)(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Trunk(nn.Module):
    """Stem through Mixed_7c, tapping Mixed_6e (reference cnn_encoder.py:76-97).

    Input (B, H, W, 3) in [-1, 1]; internally resized to 299x299 bilinear.
    Returns (regions (B, 17, 17, 768), pooled (B, 2048)).
    """

    dtype: jnp.dtype | None = None
    # Lane-pack the stem's 32/64-channel convs (ops/packed_conv.py): g
    # output columns share the channel dim, turning the stem's 19-25%
    # MXU-lane occupancy into full lanes at 4/3 the FLOPs. Exact (tested
    # against the unpacked forms + torch oracles); default measured on-TPU.
    packed_stem: bool = False
    # Space-to-depth stem (ops/s2d_conv.py, ROADMAP #1): run 1a/2a/2b in
    # r=2 block layout (conv1a consumes the image at r=4), K>=512 / N>=128
    # full-lane contractions at 16/9 FLOPs, maxpool fused back to pixels.
    # Eval-mode only (BN is folded into the lifted kernels); train-mode BN
    # falls back to the standard path. Numerically the same contraction —
    # see tests/test_s2d_conv.py + test_cnn_encoder.py.
    s2d_stem: bool = False

    def _stem_s2d(self, x, d):
        """Space-to-depth stem, transpose-free: every relayout is expressed
        AS a convolution so it stays on the MXU fast path (explicit
        reshape/transpose s2d measured 16.6 ms at B=64 — pathological).

        conv1a composes the s2d with the conv itself: its r=2-blocked output
        y[(do_h*2+do_w)*32+co] at block (I,J) is an ordinary 5x5/stride-4
        conv on the (right-pad-to-304) image — lift_kernel with input block
        factor p=1 (e = 2*do + u in [0,5)). conv2a/2b then run blocked
        (K=512, N=128/256 — full MXU lanes, 16/9 FLOPs), and depth-to-space
        back to pixels is a stride-2 identity conv_transpose fused before
        the separable maxpool. Numerics: the identical contraction, with BN
        folded into the lifted kernels (tests/test_cnn_encoder.py)."""
        from attngan_tpu.ops.s2d_conv import d2s_conv, lift_kernel, mask_valid

        dt = d or jnp.float32
        w1, b1 = BasicConv2d(32, (3, 3), strides=2, name="Conv2d_1a_3x3",
                             dtype=d)(jnp.zeros((1, 1, 1, 3)), fold_only=True)
        w2, b2 = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", dtype=d)(
            jnp.zeros((1, 1, 1, 32)), fold_only=True)
        w3, b3 = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3",
                             dtype=d)(jnp.zeros((1, 1, 1, 32)), fold_only=True)

        # conv1a + s2d in one op: 5x5/s4 on 299px right-padded to 304
        l1 = lift_kernel(w1, 1, 2, (2, 2), (0, 0), (0, 0), (0, 0),
                         (0, 0)).astype(dt)          # (5, 5, 3, 128)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), l1, window_strides=(4, 4),
            padding=((0, 5), (0, 5)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (75, 75, 128)
        y = nn.relu(y + jnp.tile(b1, 4).astype(dt))
        # conv2a: blocked VALID 3x3 -> 2x2 kernel, offsets chain 0 -> 0;
        # conv2b (SAME) reads pixel 147 = the zero pad, so the epilogue
        # zeroes the garbage slot (fused with bias+relu).
        l2 = lift_kernel(w2, 2, 2, (1, 1), (0, 0), (0, 0), (0, 0),
                         (0, 0)).astype(dt)          # (2, 2, 128, 128)
        y = jax.lax.conv_general_dilated(
            y, l2, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (74, 74, 128)
        y = mask_valid(nn.relu(y + jnp.tile(b2, 4).astype(dt)),
                       2, 32, (147, 147), (0, 0))
        l3 = lift_kernel(w3, 2, 2, (1, 1), (1, 1), (0, 0), (1, 1),
                         (1, 1)).astype(dt)          # (2, 2, 128, 256)
        y = jax.lax.conv_general_dilated(
            y, l3, window_strides=(1, 1), padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (74, 74, 256)
        y = nn.relu(y + jnp.tile(b3, 4).astype(dt))
        # back to pixels via identity conv_transpose, crop origin offset 1,
        # then the separable maxpool
        y = d2s_conv(y, 2, 64)[:, 1:148, 1:148]     # (147, 147, 64)
        return _max_pool3x3s2(y)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        g = 2 if self.packed_stem else 0
        b = x.shape[0]
        if d is not None:
            # cast BEFORE the in-trunk resize: the (B,299,299,3) bilinear
            # intermediate is pure traffic and the first conv consumes the
            # compute dtype anyway (fp32 mode — the oracle-parity config —
            # is unaffected)
            x = x.astype(d)
        if x.shape[1] != 299:
            x = jax.image.resize(x, (b, 299, 299, x.shape[-1]), "bilinear")
        if self.s2d_stem and not train:
            x = self._stem_s2d(x, d)
        else:
            x = BasicConv2d(32, (3, 3), strides=2, name="Conv2d_1a_3x3",
                            dtype=d, pack_w=2 * g)(x, train)
            x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", dtype=d,
                            pack_w=g)(x, train)
            x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3",
                            dtype=d, pack_w=g)(x, train)
            x = _max_pool3x3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", dtype=d)(x, train)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3", dtype=d)(x, train)
        x = _max_pool3x3s2(x)
        x = InceptionA(32, name="Mixed_5b", dtype=d)(x, train)
        x = InceptionA(64, name="Mixed_5c", dtype=d)(x, train)
        x = InceptionA(64, name="Mixed_5d", dtype=d)(x, train)
        x = InceptionB(name="Mixed_6a", dtype=d)(x, train)
        x = InceptionC(128, name="Mixed_6b", dtype=d)(x, train)
        x = InceptionC(160, name="Mixed_6c", dtype=d)(x, train)
        x = InceptionC(160, name="Mixed_6d", dtype=d)(x, train)
        x = InceptionC(192, name="Mixed_6e", dtype=d)(x, train)
        regions = x                                      # (B, 17, 17, 768)
        x = InceptionD(name="Mixed_7a", dtype=d)(x, train)
        x = InceptionE(name="Mixed_7b", dtype=d)(x, train)
        x = InceptionE(name="Mixed_7c", dtype=d)(x, train)
        pooled = jnp.mean(x, axis=(1, 2))                # avg_pool2d(k=8)
        return regions, pooled


class CNNEncoder(nn.Module):
    """Trunk + trainable heads (reference CNNEncoder.forward, :65-102).

    Returns (region_features (B, 289, out_dim), cnn_code (B, out_dim)).
    """

    out_dim: int = 256
    dtype: jnp.dtype | None = None

    @nn.nowrap
    def make_trunk(self) -> nn.Module:
        """The standalone trunk module (param tree == the 'trunk' subtree of
        this encoder) — lets trainers run the frozen forward outside
        value_and_grad / precompute cached features. @nowrap: flax must not
        adopt the returned module as a child of this (possibly unbound)
        encoder."""
        return InceptionV3Trunk(dtype=self.dtype)

    @nn.compact
    def __call__(self, x, train: bool = False):
        regions, pooled = InceptionV3Trunk(name="trunk", dtype=self.dtype)(x, train)
        regions = nn.Conv(self.out_dim, (1, 1), use_bias=False,
                          kernel_init=_head_init, name="emb_features",
                          dtype=self.dtype)(regions)
        cnn_code = nn.Dense(self.out_dim, kernel_init=_head_init,
                            name="emb_cnn_code", dtype=self.dtype)(pooled)
        b = regions.shape[0]
        return regions.reshape(b, -1, self.out_dim).astype(jnp.float32), \
            cnn_code.astype(jnp.float32)


class TinyTrunk(nn.Module):
    """Small conv trunk with the InceptionV3Trunk output contract
    ((B, 17, 17, F) regions, (B, F) pooled)."""

    width: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = jax.image.resize(x, (b, 68, 68, x.shape[-1]), "bilinear")
        w = self.width
        x = nn.relu(nn.Conv(w, (3, 3), strides=2, padding=1,
                            dtype=self.dtype)(x))       # 34x34
        x = nn.relu(nn.Conv(w * 2, (3, 3), strides=2, padding=1,
                            dtype=self.dtype)(x))       # 17x17
        regions = nn.relu(nn.Conv(w * 2, (3, 3), padding=1,
                                  dtype=self.dtype)(x))
        pooled = jnp.mean(regions, axis=(1, 2))
        return regions, pooled


class TinyCNNEncoder(nn.Module):
    """Drop-in small image encoder with the CNNEncoder interface.

    No reference equivalent — a test/dev encoder (and a deliberately cheap
    production option) producing the same (regions (B, 289, out_dim),
    cnn_code (B, out_dim)) contract without the Inception trunk. Param
    layout mirrors CNNEncoder: a 'trunk' scope plus trainable
    'emb_features' / 'emb_cnn_code' heads, so trainers treat both
    identically.
    """

    out_dim: int = 256
    width: int = 64
    dtype: jnp.dtype | None = None

    @nn.nowrap
    def make_trunk(self) -> nn.Module:
        """See CNNEncoder.make_trunk."""
        return TinyTrunk(width=self.width, dtype=self.dtype)

    @nn.compact
    def __call__(self, x, train: bool = False):
        regions, pooled = TinyTrunk(self.width, self.dtype, name="trunk")(x, train)
        regions = nn.Conv(self.out_dim, (1, 1), use_bias=False,
                          kernel_init=_head_init, name="emb_features",
                          dtype=self.dtype)(regions)
        cnn_code = nn.Dense(self.out_dim, kernel_init=_head_init,
                            name="emb_cnn_code", dtype=self.dtype)(pooled)
        b = regions.shape[0]
        return regions.reshape(b, -1, self.out_dim).astype(jnp.float32), \
            cnn_code.astype(jnp.float32)


def make_image_encoder(name: str, out_dim: int, dtype=None):
    """Encoder registry: 'inception_v3' (reference-parity) or 'tiny'."""
    if name == "inception_v3":
        return CNNEncoder(out_dim=out_dim, dtype=dtype)
    if name == "tiny":
        return TinyCNNEncoder(out_dim=out_dim, dtype=dtype)
    raise ValueError(f"unknown image encoder {name!r}")


def trainable_mask(params) -> dict:
    """True for head params (emb_features / emb_cnn_code), False for the
    frozen trunk — feed to optax.masked / train-step param partitioning."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {k: (k[0] in ("emb_features", "emb_cnn_code")) for k in flat}
    return flax.traverse_util.unflatten_dict(mask)
