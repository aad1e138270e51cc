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


def test_upblock_module_mode_routing(rng, monkeypatch):
    """UpBlock.fused_inference mode routing (ops/layers.py): "packed"
    uses the lane-packed kernel wherever the dims fit, "packed64" only at
    the 64^2 tail (dilated elsewhere — the measured per-size winners),
    True/"pallas" the original HBM-block kernel. All eval-mode outputs
    must agree with the default dilated path."""
    import attngan_tpu.ops.pallas_upblock as old_mod
    import attngan_tpu.ops.pallas_upblock_packed as packed_mod
    from attngan_tpu.ops.layers import UpBlock

    calls = {"packed": 0, "old": 0}
    real_packed = packed_mod.upblock_pallas_packed
    real_old = old_mod.upblock_pallas

    def spy_packed(*a, **k):
        calls["packed"] += 1
        return real_packed(*a, **k)

    def spy_old(*a, **k):
        calls["old"] += 1
        return real_old(*a, **k)

    monkeypatch.setattr(packed_mod, "upblock_pallas_packed", spy_packed)
    monkeypatch.setattr(old_mod, "upblock_pallas", spy_old)

    x64 = jnp.asarray(rng.standard_normal((1, 64, 64, 64)), jnp.float32)
    x128 = jnp.asarray(rng.standard_normal((1, 128, 128, 64)), jnp.float32)
    variables = UpBlock(32).init(jax.random.key(0), x64, train=False)

    def run(x, mode):
        return UpBlock(32, fused_inference=mode).apply(
            variables, x, train=False)

    want = run(x64, False)
    got = run(x64, "packed")
    assert calls["packed"] == 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    run(x64, "packed64")
    assert calls["packed"] == 2          # 64^2 tail -> packed kernel
    run(x128, "packed64")
    assert calls["packed"] == 2          # 128^2 -> dilated, NOT the kernel
    run(x128, "packed")
    assert calls["packed"] == 3
    run(x64, True)
    assert calls["old"] == 1             # True keeps the original kernel

    # odd WIDTH demotes to the dilated fallback instead of crashing in the
    # kernel's even-dims precondition (the gate once checked only H)
    x_odd_w = jnp.asarray(rng.standard_normal((1, 64, 63, 64)), jnp.float32)
    run(x_odd_w, "packed")
    assert calls["packed"] == 3          # unchanged: fell back, no kernel call
