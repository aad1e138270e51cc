"""Inception-v3 / ResNet-18 port structure tests.

torchvision is not installed in this environment, so numeric parity with the
pretrained torch weights can't be oracle-tested here; these tests pin the
documented architecture contract instead (stage shapes from reference
cnn_encoder.py:76-97's inline comments) and check the weight-converter key
mapping logic on synthetic state dicts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attngan_tpu.models.cnn_encoder import CNNEncoder, TinyCNNEncoder
from attngan_tpu.models.resnet import ImageEmbedder, ResNet18


@pytest.mark.slow
def test_inception_encoder_shapes(rng):
    enc = CNNEncoder(out_dim=32)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = enc.init(jax.random.key(0), x, train=False)
    regions, code = enc.apply(variables, x, train=False)
    assert regions.shape == (1, 17 * 17, 32)  # Mixed_6e tap (ref :92)
    assert code.shape == (1, 32)              # pooled Mixed_7c (ref :94-97)
    # trunk/head param split used by the freeze logic
    assert set(variables["params"]) == {"trunk", "emb_features", "emb_cnn_code"}
    # head init bound U(-0.1, 0.1) (ref :59-63)
    k = variables["params"]["emb_features"]["kernel"]
    assert float(jnp.max(jnp.abs(k))) <= 0.1


def test_tiny_encoder_contract(rng):
    enc = TinyCNNEncoder(out_dim=16, width=8)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = enc.init(jax.random.key(0), x, train=False)
    regions, code = enc.apply(variables, x, train=False)
    assert regions.shape == (2, 17 * 17, 16)
    assert code.shape == (2, 16)
    assert set(variables["params"]) == {"trunk", "emb_features", "emb_cnn_code"}


@pytest.mark.slow
def test_resnet18_embedder(rng):
    model = ResNet18()
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 512)

    embedder = ImageEmbedder(variables=variables)
    imgs = rng.standard_normal((5, 64, 64, 3)).astype(np.float32)
    embs = embedder.embed(imgs, batch_size=2)  # exercises ragged pad path
    assert embs.shape == (5, 512)


@pytest.mark.slow
def test_inception_stage_widths_match_torchvision(rng):
    """Pin the per-stage channel widths via kernel INPUT dims — a port
    mistake anywhere shifts every downstream in_channels and would break
    converted-weight loading (reference cnn_encoder.py:76-97 comments)."""
    from attngan_tpu.models.cnn_encoder import InceptionV3Trunk

    trunk = InceptionV3Trunk()
    x = jnp.zeros((1, 64, 64, 3))
    params = trunk.init(jax.random.key(0), x, train=False)["params"]

    def in_ch(module, branch):
        return params[module][branch]["conv"]["kernel"].shape[2]

    assert in_ch("Mixed_5b", "branch1x1") == 192    # after stem
    assert in_ch("Mixed_5c", "branch1x1") == 256    # 64+64+96+32
    assert in_ch("Mixed_5d", "branch1x1") == 288    # 64+64+96+64
    assert in_ch("Mixed_6a", "branch3x3") == 288
    assert in_ch("Mixed_6b", "branch1x1") == 768    # 384+96+288
    assert in_ch("Mixed_6e", "branch1x1") == 768
    assert in_ch("Mixed_7a", "branch3x3_1") == 768
    assert in_ch("Mixed_7b", "branch1x1") == 1280   # 320+192+768
    assert in_ch("Mixed_7c", "branch1x1") == 2048   # 320+768+768+192


def test_weight_converter_key_mapping():
    """Synthetic torch-style state_dict -> our param tree paths."""
    import torch

    from tools.convert_torch_weights import convert_cnn_trunk_like

    sd = {
        "Conv2d_1a_3x3.conv.weight": torch.zeros(32, 3, 3, 3),
        "Conv2d_1a_3x3.bn.weight": torch.ones(32),
        "Conv2d_1a_3x3.bn.bias": torch.zeros(32),
        "Conv2d_1a_3x3.bn.running_mean": torch.zeros(32),
        "Conv2d_1a_3x3.bn.running_var": torch.ones(32),
        "layer1.0.conv1.weight": torch.zeros(64, 64, 3, 3),
        "layer2.0.downsample.0.weight": torch.zeros(128, 64, 1, 1),
        "layer2.0.downsample.1.running_var": torch.ones(128),
        "fc_like.weight": torch.zeros(10, 512),
    }
    out = convert_cnn_trunk_like(sd)
    assert out["params"]["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert out["params"]["Conv2d_1a_3x3"]["bn"]["scale"].shape == (32,)
    assert out["batch_stats"]["Conv2d_1a_3x3"]["bn"]["mean"].shape == (32,)
    assert out["params"]["layer1_0"]["conv1"]["kernel"].shape == (3, 3, 64, 64)
    assert out["params"]["layer2_0"]["downsample_conv"]["kernel"].shape == (1, 1, 64, 128)
    assert out["batch_stats"]["layer2_0"]["downsample_bn"]["var"].shape == (128,)
    assert out["params"]["fc_like"]["kernel"].shape == (512, 10)  # linear transposed


@pytest.mark.slow
def test_packed_stem_trunk_exact_and_checkpoint_compatible(rng):
    """InceptionV3Trunk(packed_stem=True): identical param tree (checkpoint
    / converted-weight compatible) and numerically matching forward — the
    lane-packed stem is a pure layout change (ops/packed_conv.py)."""
    import jax

    from attngan_tpu.models.cnn_encoder import InceptionV3Trunk

    plain = InceptionV3Trunk()
    packed = InceptionV3Trunk(packed_stem=True)
    x = jnp.asarray(rng.standard_normal((1, 299, 299, 3)), jnp.float32)
    variables = plain.init(jax.random.key(0), x)
    vp = packed.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(vp)

    r0, p0 = plain.apply(variables, x)
    r1, p1 = packed.apply(variables, x)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_s2d_stem_trunk_exact_and_checkpoint_compatible(rng):
    """InceptionV3Trunk(s2d_stem=True): identical param tree and numerically
    matching forward AND input-gradient — the space-to-depth stem
    (ops/s2d_conv.py) is the same contraction in a denser layout, with BN
    folded into the lifted kernels (eval mode)."""
    import jax

    from attngan_tpu.models.cnn_encoder import InceptionV3Trunk

    plain = InceptionV3Trunk()
    s2d = InceptionV3Trunk(s2d_stem=True)
    x = jnp.asarray(rng.standard_normal((1, 299, 299, 3)), jnp.float32)
    variables = plain.init(jax.random.key(0), x)
    vs = s2d.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(vs)

    r0, p0 = plain.apply(variables, x)
    r1, p1 = s2d.apply(variables, x)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-4, atol=1e-4)

    # GAN phase differentiates through the trunk into the fakes: d/dx parity
    ct_r = jnp.asarray(rng.standard_normal(r0.shape), jnp.float32)
    ct_p = jnp.asarray(rng.standard_normal(p0.shape), jnp.float32)

    def scalar(mod):
        def f(xx):
            r, p = mod.apply(variables, xx)
            return jnp.vdot(r, ct_r) + jnp.vdot(p, ct_p)
        return f

    g0 = jax.grad(scalar(plain))(x)
    g1 = jax.grad(scalar(s2d))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=5e-3, atol=2e-4)
