"""Lane-packed Pallas UpBlock kernel vs the XLA chain.

Runs in interpreter mode on CPU (ops/pallas_upblock_packed.py
auto-interprets off TPU). The kernel is specialized to the generator
tail's dims (Ci=64, Co=32 — 2*Ci == 4*Co == 128 lanes); other dims must
raise so the caller can fall back.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attngan_tpu.ops.layers import glu, upsample_nearest_2x
from attngan_tpu.ops.pallas_upblock_packed import upblock_pallas_packed


def _xla_reference(x, kernel, bn_k, bn_b):
    y = upsample_nearest_2x(x)
    y = jax.lax.conv_general_dilated(
        y, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return glu(y * bn_k + bn_b)


def _case(rng, b, h, w, ci=64, co=32):
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((3, 3, ci, 2 * co)) * 0.1,
                         jnp.float32)
    bn_k = jnp.asarray(rng.uniform(0.5, 1.5, (2 * co,)), jnp.float32)
    bn_b = jnp.asarray(rng.standard_normal((2 * co,)) * 0.1, jnp.float32)
    return x, kernel, bn_k, bn_b


@pytest.mark.parametrize("b,h,w", [(2, 16, 16), (1, 8, 24)])
def test_packed_kernel_matches_xla_chain(rng, b, h, w):
    x, kernel, bn_k, bn_b = _case(rng, b, h, w)
    want = _xla_reference(x, kernel, bn_k, bn_b)
    got = upblock_pallas_packed(x, kernel, bn_k, bn_b)
    assert got.shape == (b, 2 * h, 2 * w, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_kernel_rejects_other_dims(rng):
    x, kernel, bn_k, bn_b = _case(rng, 1, 8, 8, ci=32, co=32)
    with pytest.raises(ValueError, match="Ci=64"):
        upblock_pallas_packed(x, kernel, bn_k, bn_b)
