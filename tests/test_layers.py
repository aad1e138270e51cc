"""Unit tests for ops/layers.py vs hand-derived values and torch-cpu oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from attngan_tpu.ops import layers as L


def test_glu_matches_torch(rng):
    x = rng.standard_normal((4, 6, 6, 16)).astype(np.float32)
    ours = L.glu(jnp.asarray(x))
    # torch glu splits the given dim in half: a * sigmoid(b)
    theirs = F.glu(torch.from_numpy(x), dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6, atol=1e-6)


def test_glu_odd_channels_raises():
    with pytest.raises(AssertionError):
        L.glu(jnp.zeros((1, 2, 2, 3)))


def test_upsample_nearest_2x(rng):
    x = rng.standard_normal((2, 3, 5, 4)).astype(np.float32)
    ours = np.asarray(L.upsample_nearest_2x(jnp.asarray(x)))
    theirs = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
                      mode="nearest")
        .permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(ours, theirs)


@pytest.mark.parametrize("k,s,p,bias", [(1, 1, 0, False), (3, 1, 1, False), (4, 2, 1, True)])
def test_conv_matches_torch(rng, k, s, p, bias):
    """Our NHWC convs == torch NCHW convs given transposed weights."""
    cin, cout, hw = 8, 16, 12
    x = rng.standard_normal((2, hw, hw, cin)).astype(np.float32)
    w = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.1
    b = rng.standard_normal((cout,)).astype(np.float32) if bias else None

    conv = {1: L.conv1x1, 3: L.conv3x3, 4: L.conv4x4_down}[k](cout, use_bias=bias)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
    if bias:
        params["params"]["bias"] = jnp.asarray(b)
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))

    theirs = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
        torch.from_numpy(b) if bias else None, stride=s, padding=p,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_batch_norm_train_and_eval(rng):
    """Train mode normalizes by batch stats and updates running averages the
    way torch BatchNorm2d (momentum=0.1) does; eval mode uses running stats."""
    x = rng.standard_normal((8, 4, 4, 3)).astype(np.float32) * 2 + 1
    bn = L.batch_norm(train=True)
    variables = bn.init(jax.random.key(0), jnp.asarray(x))
    y, mutated = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(3, eps=L.BN_EPS, momentum=0.1)
    ty = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).detach()
    np.testing.assert_allclose(
        np.asarray(y), ty.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-4,
    )

    bn_eval = L.batch_norm(train=False)
    y_eval = bn_eval.apply(
        {"params": variables["params"], "batch_stats": mutated["batch_stats"]},
        jnp.asarray(x),
    )
    tbn.eval()
    ty_eval = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).detach()
    np.testing.assert_allclose(
        np.asarray(y_eval), ty_eval.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize(
    "module,kw,in_shape,out_shape",
    [
        (L.UpBlock, dict(out_features=8), (2, 8, 8, 16), (2, 16, 16, 8)),
        (L.UpBlockReLU, dict(out_features=8), (2, 8, 8, 16), (2, 16, 16, 8)),
        (L.DownBlock, dict(out_features=32), (2, 16, 16, 16), (2, 8, 8, 32)),
        (L.DownBlockLeakyReLU, dict(out_features=32), (2, 16, 16, 16), (2, 8, 8, 32)),
        (L.Block3x3Relu, dict(out_features=8), (2, 8, 8, 16), (2, 8, 8, 8)),
        (L.Block3x3LeakyRelu, dict(out_features=8), (2, 8, 8, 16), (2, 8, 8, 8)),
        (L.ResBlock, dict(features=16), (2, 8, 8, 16), (2, 8, 8, 16)),
        (L.ImageEncoder16x, dict(df_dim=8), (2, 64, 64, 3), (2, 4, 4, 64)),
    ],
)
def test_block_shapes(rng, module, kw, in_shape, out_shape):
    x = jnp.asarray(rng.standard_normal(in_shape).astype(np.float32))
    m = module(**kw)
    variables = m.init(jax.random.key(0), x, train=True)
    y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == out_shape
    assert jnp.all(jnp.isfinite(y))


def test_upsample_conv_fusion_exact(rng):
    """The parity-decomposed fused path == naive upsample+conv3x3, including
    borders (zero padding)."""
    from attngan_tpu.ops.layers import upsample_conv3x3_fused

    x = rng.standard_normal((2, 7, 5, 6)).astype(np.float32)
    kernel = rng.standard_normal((3, 3, 6, 10)).astype(np.float32) * 0.2
    fused = np.asarray(upsample_conv3x3_fused(jnp.asarray(x),
                                              jnp.asarray(kernel)))
    up = np.asarray(L.upsample_nearest_2x(jnp.asarray(x)))
    naive = jax.lax.conv_general_dilated(
        jnp.asarray(up), jnp.asarray(kernel), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(fused, np.asarray(naive), rtol=1e-4, atol=1e-4)


def test_upblock_fused_matches_naive(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    m_fused = L.UpBlock(out_features=8, fused=True)
    m_naive = L.UpBlock(out_features=8, fused=False)
    variables = m_fused.init(jax.random.key(0), x, train=False)
    y_fused = m_fused.apply(variables, x, train=False)
    y_naive = m_naive.apply(variables, x, train=False)  # shared param tree
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_naive),
                               rtol=1e-4, atol=1e-5)


def test_resblock_is_residual(rng):
    """Zeroing the block's final BN scale must make it the identity."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    m = L.ResBlock(features=16)
    variables = m.init(jax.random.key(0), x, train=True)
    params = jax.tree_util.tree_map(lambda p: p, variables["params"])
    params["TorchBatchNorm_1"]["scale"] = jnp.zeros_like(params["TorchBatchNorm_1"]["scale"])
    params["TorchBatchNorm_1"]["bias"] = jnp.zeros_like(params["TorchBatchNorm_1"]["bias"])
    y, _ = m.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        x, train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_upsample_conv_dilated_exact(rng):
    """The input-dilated conv-transpose form == naive upsample+conv3x3,
    including borders (zero padding) and odd sizes — this is the DEFAULT
    UpBlock algorithm at >=64^2 spatial, and unlike the Pallas eval kernel
    it must also differentiate."""
    from attngan_tpu.ops.layers import upsample_conv3x3_dilated

    x = rng.standard_normal((2, 7, 5, 6)).astype(np.float32)
    kernel = rng.standard_normal((3, 3, 6, 10)).astype(np.float32) * 0.2
    got = np.asarray(upsample_conv3x3_dilated(jnp.asarray(x),
                                              jnp.asarray(kernel)))
    up = np.asarray(L.upsample_nearest_2x(jnp.asarray(x)))
    naive = jax.lax.conv_general_dilated(
        jnp.asarray(up), jnp.asarray(kernel), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, np.asarray(naive), rtol=1e-4, atol=1e-4)

    # gradient parity wrt both operands
    def f_dil(xx, kk):
        return jnp.sum(upsample_conv3x3_dilated(xx, kk) ** 2)

    def f_naive(xx, kk):
        u = L.upsample_nearest_2x(xx)
        y = jax.lax.conv_general_dilated(
            u, kk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y ** 2)

    g1 = jax.grad(f_dil, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(kernel))
    g2 = jax.grad(f_naive, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(kernel))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
