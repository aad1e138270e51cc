"""Numeric parity of the flax trunk ports vs torch oracles (VERDICT r1 #1).

Every block of the Inception-v3 / ResNet-18 / VGG19-bn ports is compared
against a torch re-implementation carrying torchvision's exact state_dict
key set (tests/torch_oracles.py): random torch weights are round-tripped
through tools/convert_torch_weights.py into the flax module and both
forwards must agree to fp32 tolerance. This validates, in one sweep:
conv weight transposition, BN eps=1e-3 + running-stat channel mapping,
count_include_pad avg-pooling, VALID max-pooling, bilinear resize
(align_corners=False), stage wiring, and the converter key fixups — i.e.
everything that loading a REAL torchvision .pth exercises, minus the bytes
of the weights themselves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

pytestmark = pytest.mark.slow  # full-trunk CPU oracle tier; run with -m ""

from tests.torch_oracles import (
    TBasicBlock,
    TBasicConv2d,
    TInceptionA,
    TInceptionB,
    TInceptionC,
    TInceptionD,
    TInceptionE,
    TInceptionTrunk,
    TResNet18,
    randomize_,
    t_vgg19_bn_features,
)
from tools.convert_torch_weights import (
    convert_cnn_trunk_like,
    convert_inception,
    convert_resnet18,
    convert_vgg19_bn,
)


def _to_nhwc(x_nchw: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x_nchw.permute(0, 2, 3, 1).numpy())


def _variables(converted: dict) -> dict:
    variables = {"params": converted["params"]}
    if converted["batch_stats"]:
        variables["batch_stats"] = converted["batch_stats"]
    return variables


def _assert_close(flax_out, torch_out_nchw, rtol=1e-3, atol=2e-4, msg=""):
    """fp32 tolerance: XLA and torch-cpu tile/accumulate convs differently,
    so wide-channel (768+) contractions drift ~1e-4 absolute."""
    want = torch_out_nchw.detach().permute(0, 2, 3, 1).numpy() \
        if torch_out_nchw.ndim == 4 else torch_out_nchw.detach().numpy()
    np.testing.assert_allclose(np.asarray(flax_out), want, rtol=rtol,
                               atol=atol, err_msg=msg)


def _oracle_check(torch_block, flax_module, in_ch, hw, seed, convert=None,
                  batch=2, **tol):
    """Random-init torch block -> converter -> flax apply == torch forward."""
    randomize_(torch_block, seed=seed)
    converted = (convert or convert_cnn_trunk_like)(torch_block.state_dict())
    gen = torch.Generator().manual_seed(seed + 99)
    x = torch.randn(batch, in_ch, hw, hw, generator=gen)
    with torch.no_grad():
        want = torch_block(x)
    got = flax_module.apply(_variables(converted), _to_nhwc(x), train=False)
    _assert_close(got, want, msg=type(torch_block).__name__, **tol)


# ------------------------------------------------------------ block oracles

def test_basic_conv2d_matches_torch():
    from attngan_tpu.models.cnn_encoder import BasicConv2d

    for seed, (kernel, stride, pad) in enumerate(
            [((3, 3), 2, 0), ((3, 3), 1, 1), ((1, 1), 1, 0),
             ((1, 7), 1, (0, 3)), ((7, 1), 1, (3, 0))]):
        tb = TBasicConv2d(8, 16, kernel_size=kernel, stride=stride,
                          padding=pad)
        fpad = (((pad[0], pad[0]), (pad[1], pad[1]))
                if isinstance(pad, tuple) else pad)
        fb = BasicConv2d(16, kernel, strides=stride, padding=fpad)
        _oracle_check(tb, fb, in_ch=8, hw=15, seed=seed)


def test_inception_a_matches_torch():
    from attngan_tpu.models.cnn_encoder import InceptionA

    _oracle_check(TInceptionA(192, 32), InceptionA(32), 192, 17, seed=1)


def test_inception_b_matches_torch():
    from attngan_tpu.models.cnn_encoder import InceptionB

    _oracle_check(TInceptionB(288), InceptionB(), 288, 17, seed=2)


def test_inception_c_matches_torch():
    from attngan_tpu.models.cnn_encoder import InceptionC

    _oracle_check(TInceptionC(768, 128), InceptionC(128), 768, 17, seed=3,
                  batch=1)


def test_inception_d_matches_torch():
    from attngan_tpu.models.cnn_encoder import InceptionD

    _oracle_check(TInceptionD(768), InceptionD(), 768, 17, seed=4, batch=1)


def test_inception_e_matches_torch():
    from attngan_tpu.models.cnn_encoder import InceptionE

    _oracle_check(TInceptionE(1280), InceptionE(), 1280, 9, seed=5, batch=1)


def test_resnet_basic_block_matches_torch():
    from attngan_tpu.models.resnet import BasicBlock

    _oracle_check(TBasicBlock(16, 16), BasicBlock(16), 16, 14, seed=6)
    _oracle_check(TBasicBlock(16, 32, stride=2),
                  BasicBlock(32, strides=2, downsample=True), 16, 14, seed=7)


def test_bilinear_resize_matches_torch_interpolate(rng):
    """jax.image.resize('bilinear') upsampling == F.interpolate(mode=
    'bilinear', align_corners=False) — the reference's in-forward 299 resize
    (cnn_encoder.py:75) and the VAE's feature-loss resize."""
    x = rng.standard_normal((2, 3, 29, 31)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(299, 299),
                         mode="bilinear", align_corners=False)
    got = jax.image.resize(jnp.asarray(x.transpose(0, 2, 3, 1)),
                           (2, 299, 299, 3), "bilinear")
    _assert_close(got, want, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------- full-model oracles

@pytest.mark.slow
def test_inception_trunk_matches_torch_end_to_end():
    """Full trunk: stem + pools + 11 Mixed stages + Mixed_6e tap + mean
    pool + the in-forward bilinear resize, vs torch, through the converter.
    Also asserts the converted tree is STRUCTURALLY identical to the flax
    init tree (the real torchvision key set loads without surgery) and that
    AuxLogits/fc keys are dropped."""
    from flax import traverse_util

    from attngan_tpu.models.cnn_encoder import InceptionV3Trunk

    tt = randomize_(TInceptionTrunk(), seed=11)
    sd = dict(tt.state_dict())
    # decoys present in the real torchvision state_dict
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
    sd["AuxLogits.conv0.bn.running_mean"] = torch.zeros(128)
    sd["fc.weight"] = torch.zeros(1000, 2048)
    sd["fc.bias"] = torch.zeros(1000)
    converted = convert_inception(sd)

    trunk = InceptionV3Trunk()
    init_vars = trunk.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)),
                           train=False)
    for col in ("params", "batch_stats"):
        want_keys = set(traverse_util.flatten_dict(init_vars[col]))
        got_keys = set(traverse_util.flatten_dict(converted[col]))
        assert got_keys == want_keys, (
            f"{col} key mismatch: extra={got_keys - want_keys}, "
            f"missing={want_keys - got_keys}")

    gen = torch.Generator().manual_seed(123)
    x = torch.rand(1, 3, 96, 96, generator=gen) * 2 - 1   # [-1, 1] images
    with torch.no_grad():
        want_regions, want_pooled = tt(x)
    fwd = jax.jit(lambda v, xx: trunk.apply(v, xx, train=False))
    got_regions, got_pooled = fwd(_variables(converted), _to_nhwc(x))
    assert got_regions.shape == (1, 17, 17, 768)
    _assert_close(got_regions, want_regions, rtol=5e-4, atol=5e-4,
                  msg="Mixed_6e regions")
    np.testing.assert_allclose(np.asarray(got_pooled),
                               want_pooled.detach().numpy(),
                               rtol=5e-4, atol=5e-4, err_msg="pooled code")


# ------------------------------------------------------- gradient oracles
#
# The GAN phase backprops THROUGH the frozen trunk into the generator's
# fake images (reference train.py:138-143), so the trunk's VJP — not just
# its forward — must match torch autograd. These compare d(loss)/d(input)
# for a fixed random cotangent: torch .backward() vs jax.grad, through the
# converter round-trip, eval-mode BN.

def _input_grad_check(torch_block, flax_module, in_ch, hw, seed,
                      convert=None, batch=2, rtol=1e-3, atol=None):
    randomize_(torch_block, seed=seed)
    converted = (convert or convert_cnn_trunk_like)(torch_block.state_dict())
    gen = torch.Generator().manual_seed(seed + 77)
    x = torch.randn(batch, in_ch, hw, hw, generator=gen, requires_grad=True)
    out = torch_block(x)
    ct = torch.randn(out.shape, generator=gen)
    (out * ct).sum().backward()
    want = x.grad.permute(0, 2, 3, 1).numpy()

    ct_j = jnp.asarray(ct.permute(0, 2, 3, 1).numpy())

    def loss(xx):
        y = flax_module.apply(_variables(converted), xx, train=False)
        return jnp.sum(y * ct_j)

    got = np.asarray(jax.grad(loss)(_to_nhwc(x.detach())))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=rtol,
                               atol=atol if atol is not None else 1e-4 * scale,
                               err_msg=f"d/dx {type(torch_block).__name__}")


def test_basic_conv2d_input_grad_matches_torch():
    from attngan_tpu.models.cnn_encoder import BasicConv2d

    for seed, (kernel, stride, pad) in enumerate(
            [((3, 3), 2, 0), ((3, 3), 1, 1), ((1, 7), 1, (0, 3))]):
        tb = TBasicConv2d(8, 16, kernel_size=kernel, stride=stride,
                          padding=pad)
        fpad = (((pad[0], pad[0]), (pad[1], pad[1]))
                if isinstance(pad, tuple) else pad)
        fb = BasicConv2d(16, kernel, strides=stride, padding=fpad)
        _input_grad_check(tb, fb, in_ch=8, hw=15, seed=40 + seed)


def test_separable_maxpool_grad_matches_torch(rng):
    """The two-pass 3x1/1x3 maxpool decomposition must route gradients like
    torch's single 9-tap window (tie-free random input)."""
    from attngan_tpu.models.cnn_encoder import _max_pool3x3s2

    x = rng.standard_normal((2, 15, 15, 6)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    out = F.max_pool2d(xt, 3, stride=2)
    gen = torch.Generator().manual_seed(7)
    ct = torch.randn(out.shape, generator=gen)
    (out * ct).sum().backward()
    want = xt.grad.permute(0, 2, 3, 1).numpy()

    ct_j = jnp.asarray(ct.permute(0, 2, 3, 1).numpy())
    got = np.asarray(jax.grad(
        lambda xx: jnp.sum(_max_pool3x3s2(xx) * ct_j))(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bilinear_resize_grad_matches_torch(rng):
    """VJP of the in-forward 299 upsample (reference cnn_encoder.py:75)."""
    x = rng.standard_normal((1, 3, 29, 31)).astype(np.float32)
    xt = torch.from_numpy(x).requires_grad_(True)
    out = F.interpolate(xt, size=(99, 99), mode="bilinear",
                        align_corners=False)
    gen = torch.Generator().manual_seed(8)
    ct = torch.randn(out.shape, generator=gen)
    (out * ct).sum().backward()
    want = xt.grad.permute(0, 2, 3, 1).numpy()

    ct_j = jnp.asarray(ct.permute(0, 2, 3, 1).numpy())
    got = np.asarray(jax.grad(lambda xx: jnp.sum(jax.image.resize(
        xx, (1, 99, 99, 3), "bilinear") * ct_j))(
            jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_inception_trunk_input_grad_matches_torch_end_to_end():
    """Full-trunk VJP at the fakes: cotangents on BOTH outputs (regions tap
    + pooled code), d/dx through 16 stages, 2 maxpools and the bilinear
    resize — the exact path the GAN generator gradient rides
    (reference train.py:138-143 -> cnn_encoder.py:65-97)."""
    from attngan_tpu.models.cnn_encoder import InceptionV3Trunk

    tt = randomize_(TInceptionTrunk(), seed=12)
    converted = convert_inception(dict(tt.state_dict()))
    trunk = InceptionV3Trunk()

    gen = torch.Generator().manual_seed(345)
    x = (torch.rand(1, 3, 96, 96, generator=gen) * 2 - 1).requires_grad_(True)
    regions, pooled = tt(x)
    ct_r = torch.randn(regions.shape, generator=gen)
    ct_p = torch.randn(pooled.shape, generator=gen)
    ((regions * ct_r).sum() + (pooled * ct_p).sum()).backward()
    want = x.grad.permute(0, 2, 3, 1).numpy()

    ct_r_j = jnp.asarray(ct_r.permute(0, 2, 3, 1).numpy())
    ct_p_j = jnp.asarray(ct_p.numpy())

    def loss(xx):
        r, p = trunk.apply(_variables(converted), xx, train=False)
        return jnp.sum(r * ct_r_j) + jnp.sum(p * ct_p_j)

    got = np.asarray(jax.jit(jax.grad(loss))(_to_nhwc(x.detach())))
    # 16 stages of fp32 accumulation-order drift; tolerance relative to the
    # gradient's own scale
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * scale)


@pytest.mark.slow
def test_resnet18_matches_torch_end_to_end():
    from flax import traverse_util

    from attngan_tpu.models.resnet import ResNet18

    tr = randomize_(TResNet18(), seed=21)
    sd = dict(tr.state_dict())
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)
    converted = convert_resnet18(sd)

    model = ResNet18()
    init_vars = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    for col in ("params", "batch_stats"):
        want_keys = set(traverse_util.flatten_dict(init_vars[col]))
        got_keys = set(traverse_util.flatten_dict(converted[col]))
        assert got_keys == want_keys, f"{col} key mismatch"

    gen = torch.Generator().manual_seed(321)
    x = torch.rand(2, 3, 64, 64, generator=gen) * 2 - 1
    with torch.no_grad():
        want = tr(x)
    got = model.apply(_variables(converted), _to_nhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_vgg19_bn_tap_walk_matches_torch():
    """The DFCVAE feature-loss tap walk (reference VAE.py:143-162): outputs
    collected after torchvision module indices 14/24/34/43 must match."""
    from attngan_tpu.models.vgg import DEFAULT_FEATURE_LAYERS, VGG19BNFeatures

    seq = randomize_(t_vgg19_bn_features(), seed=31)
    sd = {f"features.{k}": v for k, v in seq.state_dict().items()}
    converted = convert_vgg19_bn(sd)

    gen = torch.Generator().manual_seed(132)
    x = torch.rand(1, 3, 64, 64, generator=gen) * 2 - 1
    taps = []
    with torch.no_grad():
        y = x
        for idx, module in enumerate(seq):
            y = module(y)
            if idx in DEFAULT_FEATURE_LAYERS:
                taps.append(y)

    model = VGG19BNFeatures()
    got = model.apply(_variables(converted), _to_nhwc(x), train=False)
    assert len(got) == len(taps) == 4
    for i, (g, w) in enumerate(zip(got, taps)):
        _assert_close(g, w, rtol=5e-4, atol=5e-4, msg=f"tap {i}")
