"""Fused Pallas UpBlock (upsample+conv3x3+BN_eval+GLU) vs the XLA chain.

Runs in interpreter mode on CPU (ops/pallas_upblock.py auto-interprets off
TPU); the same kernel is TPU-compiled by bench.py / test.py when
fused_upsample inference is enabled.
"""

import jax
import jax.numpy as jnp
import numpy as np

from attngan_tpu.ops.layers import UpBlock, glu, upsample_nearest_2x
from attngan_tpu.ops.pallas_upblock import upblock_fused_eval


def _xla_reference(x, kernel, scale, bias, mean, var, eps=1e-5):
    y = upsample_nearest_2x(x)
    y = jax.lax.conv_general_dilated(
        y, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k = scale * jax.lax.rsqrt(var + eps)
    y = y * k + (bias - mean * k)
    return glu(y)


def test_upblock_kernel_matches_xla_chain(rng):
    b, h, w, ci, co = 2, 12, 12, 32, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((3, 3, ci, 2 * co)) * 0.1,
                         jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (2 * co,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((2 * co,)) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.standard_normal((2 * co,)) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 1.5, (2 * co,)), jnp.float32)

    want = _xla_reference(x, kernel, scale, bias, mean, var)
    got = upblock_fused_eval(x, kernel, scale, bias, mean, var)
    assert got.shape == (b, 2 * h, 2 * w, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_upblock_module_fused_inference_path(rng):
    """UpBlock(fused_inference=True) eval forward == the default eval
    forward, with an IDENTICAL variable tree (checkpoint compatible).

    64x64 input: UpBlock only routes eval forwards through the Pallas
    kernel at >=64^2 spatial (the measured win region), so a smaller input
    would compare the default path to itself."""
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 8)), jnp.float32)
    ref = UpBlock(out_features=8)
    fused = UpBlock(out_features=8, fused_inference=True)
    variables = ref.init(jax.random.key(0), x, train=False)
    vf = fused.init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(vf)
    # make BN stats non-trivial
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.1 * np.random.default_rng(1).standard_normal(a.shape)
        .astype(a.dtype), variables)
    want = ref.apply(variables, x, train=False)
    got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # train mode must keep the XLA path (kernel is eval-only): same outputs,
    # stats update
    out_t, mut = fused.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    out_r, mut_r = ref.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
