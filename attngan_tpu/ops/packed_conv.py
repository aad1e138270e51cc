"""Lane-packed 2-D convolution: g output columns per MXU row.

Why: the Inception stem's convs (reference networks/cnn_encoder.py stem,
torchvision Conv2d_1a..2b) have 32-64 output channels — a quarter/half of
the TPU's 128-wide vector lanes — and contraction depth k*k*Cin = 27..288,
under the MXU's 128-deep sublanes. XLA lowers them as-is, so the systolic
array runs at ~19-25% occupancy and the stem dominates the DAMSM step
(BENCH.md: trunk ~11-12 ms of 13.8 at B=64).

The packing: group g adjacent OUTPUT columns. Their 3xk input windows
overlap; the union window spans win = (g-1)*sw + k columns. Concatenate
the win strided column-slices of the input along channels -> a
(B, H, W/g, win*Cin) tensor; scatter the (kh, kw, Cin, Cout) kernel into a
block-structured (kh, 1, win*Cin, g*Cout) kernel (zeros where an output
column does not read an input column); one ordinary conv then computes g
output columns per spatial position:

    K = kh*win*Cin   (e.g. conv2a: 288 -> 384, a full sublane multiple)
    N = g*Cout       (e.g. conv2a: 32  -> 128, full lanes)

at (win/(k*sw))x the FLOPs (conv2a/2b at g=2: 4/3) — a large net win when
the unpacked layout wastes 4x the lanes. Pure XLA (strided slices + concat
+ conv + reshape), so it is differentiable and exact: the extra kernel
entries are zeros, contributing exact 0 terms.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def pack_conv_kernel(kernel: jax.Array, g: int, stride_w: int = 1) -> jax.Array:
    """Scatter a (kh, kw, Cin, Cout) kernel into the packed
    (kh, 1, win*Cin, g*Cout) block-structured kernel."""
    kh, kw, cin, cout = kernel.shape
    win = (g - 1) * stride_w + kw
    wp = jnp.zeros((kh, 1, win * cin, g * cout), kernel.dtype)
    for j in range(g):              # output column within the group
        for c in range(kw):         # kernel tap column
            o = j * stride_w + c    # packed (union-window) offset
            wp = wp.at[:, 0, o * cin:(o + 1) * cin,
                       j * cout:(j + 1) * cout].set(kernel[:, c])
    return wp


def packed_conv(
    x: jax.Array,                   # (B, H, W, Cin)
    kernel: jax.Array,              # (kh, kw, Cin, Cout)
    g: int = 2,
    strides: Tuple[int, int] = (1, 1),
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0)),
) -> jax.Array:
    """== lax.conv_general_dilated(x, kernel, strides, padding, NHWC/HWIO),
    computed with g output columns packed into the channel dim."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    sh, sw = strides
    (ph_lo, ph_hi), (pw_lo, pw_hi) = padding
    w_out = (w + pw_lo + pw_hi - kw) // sw + 1
    groups = -(-w_out // g)                       # ceil
    win = (g - 1) * sw + kw
    # width of padded input consumed by the packed layout
    need = sw * g * (groups - 1) + win
    xp = jnp.pad(x, ((0, 0), (0, 0),
                     (pw_lo, max(need - w - pw_lo, 0)), (0, 0)))
    # win strided column-slices, concatenated along channels
    cols = [lax.slice(xp, (0, 0, o, 0),
                      (b, h, o + sw * g * (groups - 1) + 1, cin),
                      (1, 1, sw * g, 1))
            for o in range(win)]
    xpk = jnp.concatenate(cols, axis=-1)          # (B, H, groups, win*Cin)
    wp = pack_conv_kernel(kernel, g, sw)
    y = lax.conv_general_dilated(
        xpk, wp, window_strides=(sh, 1),
        padding=((ph_lo, ph_hi), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h_out = y.shape[1]
    y = y.reshape(b, h_out, groups * g, cout)
    return y[:, :, :w_out]
