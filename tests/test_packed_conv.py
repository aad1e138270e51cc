"""Lane-packed conv == plain XLA conv, exactly (forward AND gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attngan_tpu.ops.packed_conv import packed_conv


def _ref(x, k, strides, padding):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


CASES = [
    # (h, w, cin, cout, kh, kw, strides, padding, g)  — incl. the stem's
    # exact shapes at small spatial stand-ins
    (17, 17, 32, 32, 3, 3, (1, 1), ((0, 0), (0, 0)), 2),   # conv2a-like VALID
    (16, 15, 32, 64, 3, 3, (1, 1), ((1, 1), (1, 1)), 2),   # conv2b-like SAME, odd W
    (21, 21, 3, 32, 3, 3, (2, 2), ((0, 0), (0, 0)), 4),    # conv1a-like stride 2
    (12, 13, 8, 16, 5, 5, (1, 1), ((2, 2), (2, 2)), 2),    # 5x5 branch
    (10, 10, 4, 8, 1, 1, (1, 1), ((0, 0), (0, 0)), 4),     # 1x1
    (14, 14, 8, 8, 3, 3, (1, 1), ((0, 0), (0, 0)), 3),     # g=3, W_out % g != 0
]


@pytest.mark.parametrize("h,w,cin,cout,kh,kw,strides,padding,g", CASES)
def test_packed_conv_matches_xla(rng, h, w, cin, cout, kh, kw, strides,
                                 padding, g):
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)) * 0.1,
                    jnp.float32)
    want = _ref(x, k, strides, padding)
    got = packed_conv(x, k, g=g, strides=strides, padding=padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_gradients_match(rng):
    """d/dx and d/dk agree with the plain conv (the GAN coupling backprops
    through the trunk into the fakes, reference train.py:138-143)."""
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((2, 9, 11, 8)), jnp.float32)

    def loss_ref(x, k):
        return jnp.sum(_ref(x, k, (1, 1), ((1, 1), (1, 1))) * ct)

    def loss_packed(x, k):
        return jnp.sum(packed_conv(x, k, g=2, strides=(1, 1),
                                   padding=((1, 1), (1, 1))) * ct)

    gx_r, gk_r = jax.grad(loss_ref, (0, 1))(x, k)
    gx_p, gk_p = jax.grad(loss_packed, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-5)
