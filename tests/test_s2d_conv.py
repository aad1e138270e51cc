"""Exactness of the space-to-depth lifted convolution (ops/s2d_conv.py).

The lift is an exact re-layout of the same contraction (extra kernel slots
are zeros), so every test demands near-machine-precision agreement with the
plain lax.conv at fp32 — including the chained three-conv Inception stem
geometry the trunk uses (ROADMAP #1): conv1a 3x3/s2 on p=4 blocks, conv2a
3x3 VALID, conv2b 3x3 SAME, with the offset chain (0 -> 0 -> 1) that keeps
every lifted kernel at 2x2 blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from attngan_tpu.ops.s2d_conv import (depth_to_space, lift_kernel,
                                      lifted_conv, mask_valid,
                                      space_to_depth)


def ref_conv(x, w, strides, padding):
    return lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 13, 11, 5)), jnp.float32)
    for r, off in [(2, (0, 0)), (2, (1, 1)), (4, (0, 0)), (4, (3, 1))]:
        xb = space_to_depth(x, r, off)
        back = depth_to_space(xb, r, 5, (13, 11), off)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_mask_valid_zeroes_only_outside(rng):
    x = jnp.asarray(rng.normal(size=(1, 9, 9, 3)), jnp.float32)
    xb = space_to_depth(x, 2, (1, 1))
    # corrupt every slot, then mask: valid region must equal x again
    xb = xb + 7.0
    masked = mask_valid(xb, 2, 3, (9, 9), (1, 1))
    back = depth_to_space(masked, 2, 3, (9, 9), (1, 1))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x) + 7.0)
    # and the out-of-range slots are exactly zero
    full = np.asarray(masked).reshape(1, 5, 5, 2, 2, 3)
    full = full.transpose(0, 1, 3, 2, 4, 5).reshape(1, 10, 10, 3)
    assert np.all(full[:, 0] == 0) and np.all(full[:, :, 0] == 0)


@pytest.mark.parametrize("k,s,pad,p,q,off_in,off_out,pb,kblk", [
    ((3, 3), (1, 1), (0, 0), 2, 2, (0, 0), (0, 0), (0, 0), 2),  # conv2a
    ((3, 3), (1, 1), (1, 1), 2, 2, (0, 0), (1, 1), (1, 1), 2),  # conv2b
    ((3, 3), (2, 2), (0, 0), 4, 2, (0, 0), (0, 0), (0, 0), 2),  # conv1a
    ((1, 1), (1, 1), (0, 0), 2, 2, (0, 0), (0, 0), (0, 0), 1),  # 1x1
    # a 5x5 SAME window spans s(q-1)+k = 6 pixels -> 3 blocks minimum
    ((5, 5), (1, 1), (2, 2), 2, 2, (0, 0), (2, 2), (2, 2), 3),
])
def test_lifted_conv_matches_plain(rng, k, s, pad, p, q, off_in, off_out,
                                   pb, kblk):
    ci, co = 3, 5
    h = w = 21
    x = jnp.asarray(rng.normal(size=(2, h, w, ci)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=k + (ci, co)), jnp.float32)
    y = ref_conv(x, wk, s, ((pad[0], pad[0]), (pad[1], pad[1])))
    vh, vw = y.shape[1], y.shape[2]

    pad_px = (p * 2, p * 2)   # generous right padding: extra blocks are cheap
    xb = space_to_depth(x, p, off_in, pad_px)
    wl = lift_kernel(wk, p, q, s, pad, off_in, off_out, pb)
    assert wl.shape[:2] == (kblk, kblk), \
        f"expected {kblk}x{kblk} blocked kernel, got {wl.shape[:2]}"
    yb = lifted_conv(xb, wl, p, q, s, pb)
    got = depth_to_space(yb, q, co, (vh, vw), off_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y),
                               rtol=1e-5, atol=1e-5)


def test_stem_chain_exact(rng):
    """The full Inception stem geometry, chained in block space end-to-end:
    299x299x3 -> conv1a(3x3,s2) -> conv2a(3x3 VALID) -> conv2b(3x3 SAME),
    never leaving the blocked layout between convs. Matches the plain chain
    at fp32 on the whole 147x147 valid region."""
    ci = 3
    c1, c2, c3 = 4, 6, 8                     # small stand-ins for 32/32/64
    x = jnp.asarray(rng.normal(size=(2, 299, 299, ci)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, ci, c1)), jnp.float32) * 0.2
    w2 = jnp.asarray(rng.normal(size=(3, 3, c1, c2)), jnp.float32) * 0.2
    w3 = jnp.asarray(rng.normal(size=(3, 3, c2, c3)), jnp.float32) * 0.2

    y1 = ref_conv(x, w1, (2, 2), ((0, 0), (0, 0)))          # 149
    y2 = ref_conv(y1, w2, (1, 1), ((0, 0), (0, 0)))         # 147
    y3 = ref_conv(y2, w3, (1, 1), ((1, 1), (1, 1)))         # 147

    # blocked chain
    xb = space_to_depth(x, 4, (0, 0), (5, 5))               # 76 blocks (304)
    l1 = lift_kernel(w1, 4, 2, (2, 2), (0, 0), (0, 0), (0, 0), (0, 0))
    b1 = lifted_conv(xb, l1, 4, 2, (2, 2), (0, 0))          # 75 blk, 149 valid
    l2 = lift_kernel(w2, 2, 2, (1, 1), (0, 0), (0, 0), (0, 0), (0, 0))
    b2 = lifted_conv(b1, l2, 2, 2, (1, 1), (0, 0))          # 74 blk, 147 valid
    # conv2b (SAME) reads the zero-pad at pixel 147 -> mask slot 147 garbage
    b2 = mask_valid(b2, 2, c2, (147, 147), (0, 0))
    l3 = lift_kernel(w3, 2, 2, (1, 1), (1, 1), (0, 0), (1, 1), (1, 1))
    b3 = lifted_conv(b2, l3, 2, 2, (1, 1), (1, 1))          # off_out = 1

    got1 = depth_to_space(b1, 2, c1, (149, 149), (0, 0))
    got2 = depth_to_space(b2, 2, c2, (147, 147), (0, 0))
    got3 = depth_to_space(b3, 2, c3, (147, 147), (1, 1))
    np.testing.assert_allclose(np.asarray(got1), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(y3),
                               rtol=1e-4, atol=1e-4)


def test_lifted_conv_gradient_matches(rng):
    """The GAN phase differentiates through the trunk — d/dx of the lifted
    chain must equal d/dx of the plain conv."""
    ci, co = 3, 4
    x = jnp.asarray(rng.normal(size=(1, 33, 33, ci)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(3, 3, ci, co)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(1, 31, 31, co)), jnp.float32)

    def plain(x):
        return jnp.sum(ref_conv(x, wk, (1, 1), ((0, 0), (0, 0))) * ct)

    def blocked(x):
        xb = space_to_depth(x, 2, (0, 0))
        wl = lift_kernel(wk, 2, 2, (1, 1), (0, 0), (0, 0), (0, 0), (0, 0))
        yb = lifted_conv(xb, wl, 2, 2, (1, 1), (0, 0))
        y = depth_to_space(yb, 2, co, (31, 31), (0, 0))
        return jnp.sum(y * ct)

    g0 = jax.grad(plain)(x)
    g1 = jax.grad(blocked)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-5)
