"""Space-to-depth (block-layout) convolution lifting.

Why: the Inception stem's convs (reference networks/cnn_encoder.py's
torchvision trunk, Conv2d_1a..2b) run at 147-299px with 32-64 channels —
the MXU contracts K=27..288 (under one 128-deep pass) and emits N=32..64
columns (a quarter/half of the 128 lanes), so the systolic array idles.
Re-laying the tensor as r x r spatial blocks stacked into channels
("space-to-depth") multiplies both K and N by r^2: at r=2 the stem's
contractions become K>=512 / N>=128 (full lanes) at 16/9 the FLOPs — a
large net win in the lane-starved limit (ROADMAP #1; BENCH.md round 3).

The math. A tensor x is stored blocked with factor r and origin offset
``off``: X[b, I, J, (di*r + dj)*C + c] = xpad[b, r*I + di, r*J + dj, c]
where xpad is x left-padded by ``off`` zeros (and right-padded to a
multiple of r). For a conv y[m] = sum_u w[u] x[s*m - pad + u] (per axis),
writing outputs blocked with factor q / offset off_out and inputs blocked
with factor p / offset off_in, one derives

    p*Ii + di = p*t*Io + e,   e = s*do + u - s*off_out - pad + off_in + p*pb

with t = s*q/p (must divide) and pb blocks of zero left-padding in block
space. So the blocked computation is itself an ordinary conv with stride t
whose kernel tap a = e // p reads sub-position di = e % p: scattering
w[u, ci, co] into W'[a_h, a_w, (di_h*p + di_w)*Ci + ci,
(do_h*q + do_w)*Co + co] makes conv(X, W', stride=t) the exact blocked y
(the scatter's untouched entries are zeros — exact 0 terms, so the lift is
numerically the same contraction, just denser). Offsets are the chaining
lever: choosing off_out per conv keeps 0 <= e < 2p (a 2x2 blocked kernel)
through a whole stem instead of 3x3 (which would cost 4x FLOPs).

Everything here is pure XLA (reshape/transpose/conv), differentiable, and
shape-static.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def space_to_depth(x: jax.Array, r: int,
                   off: Tuple[int, int] = (0, 0),
                   pad_hw: Tuple[int, int] = (0, 0)) -> jax.Array:
    """(B, H, W, C) -> (B, H', W', r*r*C) blocked layout.

    Left-pads by ``off`` zeros and right-pads by at least ``pad_hw`` then to
    a multiple of r; block (I, J) channel slot (di*r + dj)*C + c holds
    xpad[r*I+di, r*J+dj, c]. ``pad_hw`` exists because a strided lifted
    conv consumes whole input blocks: e.g. conv1a (3x3/s2 on 299px, p=4)
    needs 76 input blocks (304px) to emit all 149 valid outputs.
    """
    b, h, w, c = x.shape
    oh, ow = off
    hp = -(-(h + oh + pad_hw[0]) // r) * r
    wp = -(-(w + ow + pad_hw[1]) // r) * r
    x = jnp.pad(x, ((0, 0), (oh, hp - h - oh), (ow, wp - w - ow), (0, 0)))
    x = x.reshape(b, hp // r, r, wp // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # (B, H', W', di, dj, c)
    return x.reshape(b, hp // r, wp // r, r * r * c)


def depth_to_space(xb: jax.Array, r: int, c: int,
                   valid_hw: Tuple[int, int],
                   off: Tuple[int, int] = (0, 0)) -> jax.Array:
    """Inverse of space_to_depth: -> (B, valid_h, valid_w, C), dropping the
    ``off`` origin pixels and anything past ``valid_hw``."""
    b, hb, wb, _ = xb.shape
    x = xb.reshape(b, hb, wb, r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hb * r, wb * r, c)
    vh, vw = valid_hw
    oh, ow = off
    return x[:, oh:oh + vh, ow:ow + vw]


def mask_valid(xb: jax.Array, r: int, c: int, valid_hw: Tuple[int, int],
               off: Tuple[int, int] = (0, 0)) -> jax.Array:
    """Zero every slot of a blocked tensor outside [off, off+valid) — needed
    before a lifted conv whose window reads a neighbour's padding slot (the
    blocked layout stores garbage there after a previous VALID conv)."""
    b, hb, wb, _ = xb.shape
    oh, ow = off
    vh, vw = valid_hw

    def axis_mask(nblk, valid, o):
        pix = np.arange(nblk * r)
        return ((pix >= o) & (pix < o + valid)).reshape(nblk, r)

    mh = axis_mask(hb, vh, oh)                 # (H', r)
    mw = axis_mask(wb, vw, ow)                 # (W', r)
    m = mh[:, None, :, None] & mw[None, :, None, :]    # (H', W', r, r)
    m = jnp.asarray(m.reshape(1, hb, wb, r * r, 1), xb.dtype)
    return (xb.reshape(b, hb, wb, r * r, c) * m).reshape(xb.shape)


def d2s_conv(xb: jax.Array, r: int, c: int) -> jax.Array:
    """Depth-to-space as a stride-r transposed conv with an identity kernel.

    An explicit reshape/transpose d2s is a pathological TPU relayout
    (measured 16.6 ms for s2d of a (64,299,299,3) at B=64 vs ~0.3 ms for
    this form); expressing it as W[dh, dw, (di*r+dj)*C + c, c'] =
    delta(dh=di, dw=dj, c=c') keeps it on the conv/MXU fast path and lets
    XLA fuse it with neighbours. Output (B, r*H', r*W', C) — caller crops
    the origin offset."""
    b, hb, wb, cc = xb.shape
    assert cc == r * r * c
    w = np.zeros((r, r, r * r * c, c), np.float32)
    for di in range(r):
        for dj in range(r):
            base = (di * r + dj) * c
            # lax.conv_transpose applies the kernel spatially FLIPPED
            # (gradient-of-conv semantics) — scatter mirrored
            w[r - 1 - di, r - 1 - dj, base:base + c, :] = np.eye(c)
    return jax.lax.conv_transpose(
        xb, jnp.asarray(w, xb.dtype), strides=(r, r), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d_maxpool3x3s2(xb: jax.Array, c: int, off: Tuple[int, int],
                     out_hw: Tuple[int, int]) -> jax.Array:
    """3x3/stride-2 max-pool of an r=2 blocked tensor, emitting PIXEL layout.

    Output pixel m reads input pixels 2m+d (d in [0,3)); with the input at
    origin offset ``off`` that is slot 2m+d+off = block (m + (d+off)//2),
    sub-position (d+off)%2 — so each of the 9 taps is a (block-shift,
    sub-plane) slice and the whole pool is one fused 9-way elementwise max
    that performs the depth-to-space for free (no separate relayout pass).
    Requires every tap in range: garbage slots outside the window are never
    read (callers arrange off/out_hw so 2m+d+off stays within the valid
    region — the stem's relu output also keeps slots >= 0).
    """
    b, hb, wb, _ = xb.shape
    x6 = xb.reshape(b, hb, wb, 2, 2, c)
    oh, ow = out_hw
    offh, offw = off
    out = None
    for dh in range(3):
        sh, ph = (dh + offh) // 2, (dh + offh) % 2
        assert sh + oh <= hb, "H tap out of range"
        for dw in range(3):
            sw, pw = (dw + offw) // 2, (dw + offw) % 2
            assert sw + ow <= wb, "W tap out of range"
            t = x6[:, sh:sh + oh, sw:sw + ow, ph, pw, :]
            out = t if out is None else jnp.maximum(out, t)
    return out


def lift_kernel(w: jax.Array, p: int, q: int,
                strides: Tuple[int, int], padding: Tuple[int, int],
                off_in: Tuple[int, int], off_out: Tuple[int, int],
                pad_blocks: Tuple[int, int]) -> jax.Array:
    """Scatter a (kh, kw, Ci, Co) kernel into the blocked
    (kh', kw', p*p*Ci, q*q*Co) kernel (see module docstring).

    Raises if any (do, u) maps to e < 0 — pick a larger off_out/pad_blocks.
    """
    kh, kw, ci, co = w.shape
    ks = (kh, kw)

    def axis(do_or_u, axis_i):
        s = strides[axis_i]
        e = (s * do_or_u[0] + do_or_u[1] - s * off_out[axis_i]
             - padding[axis_i] + off_in[axis_i] + p * pad_blocks[axis_i])
        if e < 0:
            raise ValueError(
                f"axis {axis_i}: e={e} < 0 for (do={do_or_u[0]}, "
                f"u={do_or_u[1]}) — increase off_out or pad_blocks")
        return e // p, e % p

    k_blk = []
    for i in range(2):
        s = strides[i]
        e_max = (s * (q - 1) + ks[i] - 1 - s * off_out[i] - padding[i]
                 + off_in[i] + p * pad_blocks[i])
        k_blk.append(e_max // p + 1)
    wp = jnp.zeros((k_blk[0], k_blk[1], p * p * ci, q * q * co), w.dtype)
    for do_h in range(q):
        for do_w in range(q):
            for u_h in range(kh):
                for u_w in range(kw):
                    a_h, di_h = axis((do_h, u_h), 0)
                    a_w, di_w = axis((do_w, u_w), 1)
                    ci0 = (di_h * p + di_w) * ci
                    co0 = (do_h * q + do_w) * co
                    wp = wp.at[a_h, a_w, ci0:ci0 + ci,
                               co0:co0 + co].set(w[u_h, u_w])
    return wp


def lifted_conv(xb: jax.Array, w_lifted: jax.Array, p: int, q: int,
                strides: Tuple[int, int],
                pad_blocks: Tuple[int, int]) -> jax.Array:
    """Apply a lifted kernel to a blocked input: left-pad ``pad_blocks``
    zero blocks, ordinary VALID conv at block stride t = s*q/p."""
    sh, sw = strides
    th, tw = sh * q // p, sw * q // p
    assert sh * q == th * p and sw * q == tw * p, \
        f"stride {strides} not liftable: s*q must be divisible by p"
    pbh, pbw = pad_blocks
    return lax.conv_general_dilated(
        xb, w_lifted, window_strides=(th, tw),
        padding=((pbh, 0), (pbw, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
