"""Explicit-collective DAMSM loss vs the single-device reference math."""

import jax
import jax.numpy as jnp
import numpy as np

from attngan_tpu.losses.damsm import damsm_loss
from attngan_tpu.losses.damsm_sharded import make_sharded_damsm_loss
from attngan_tpu.parallel import make_mesh, shard_batch

B, L, R, D = 16, 5, 9, 8


def _inputs(rng):
    img = jnp.asarray(rng.standard_normal((B, R, D)), jnp.float32)
    code = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    words = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    sent = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    labels = jnp.arange(B)
    mask = jnp.asarray((rng.random((B, L)) > 0.3).astype(np.int32)).at[:, 0].set(1)
    class_ids = jnp.asarray(np.arange(B) % 4)
    return img, code, words, sent, labels, mask, class_ids


def test_sharded_loss_matches_reference(rng):
    img, code, words, sent, labels, mask, class_ids = _inputs(rng)
    expected, _, _ = damsm_loss(img, code, words, sent, labels, mask,
                                class_ids)

    mesh = make_mesh()
    loss_fn = make_sharded_damsm_loss(mesh)
    args = shard_batch((img, code, words, sent, labels, mask, class_ids),
                       mesh)
    got, parts = jax.jit(loss_fn)(*args)
    assert set(parts) == {"words_loss", "sentence_loss"}
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-4)


def test_sharded_loss_matches_reference_2d_mesh(rng):
    """The explicit-collective loss on a 2-D ('slice', 'data') mesh: gathers
    run over BOTH batch axes (parallel/mesh.py::batch_axes)."""
    img, code, words, sent, labels, mask, class_ids = _inputs(rng)
    expected, _, _ = damsm_loss(img, code, words, sent, labels, mask,
                                class_ids)

    mesh = make_mesh(shape=(2, 4))
    loss_fn = make_sharded_damsm_loss(mesh)
    args = shard_batch((img, code, words, sent, labels, mask, class_ids),
                       mesh)
    got, _ = jax.jit(loss_fn)(*args)
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-4)


def test_sharded_loss_gradients_match(rng):
    img, code, words, sent, labels, mask, class_ids = _inputs(rng)

    def ref(i, w):
        return damsm_loss(i, code, w, sent, labels, mask, class_ids)[0]

    g_ref = jax.grad(ref, argnums=(0, 1))(img, words)

    mesh = make_mesh()
    loss_fn = make_sharded_damsm_loss(mesh)

    def sharded(i, w):
        return loss_fn(i, code, w, sent, labels, mask, class_ids)[0]

    args = shard_batch((img, words), mesh)
    g_shard = jax.jit(jax.grad(sharded, argnums=(0, 1)))(*args)
    for a, b in zip(g_ref, g_shard):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_loss_fused_kernel_matches_reference(rng):
    """fused=True routes each shard's (local images x all texts) similarity
    rows through the Pallas kernel (interpret mode here) — the composition
    of shard_map + pallas_call must reproduce the reference loss."""
    img, code, words, sent, labels, mask, class_ids = _inputs(rng)
    expected, _, _ = damsm_loss(img, code, words, sent, labels, mask,
                                class_ids)

    mesh = make_mesh()
    loss_fn = make_sharded_damsm_loss(mesh, fused=True)
    args = shard_batch((img, code, words, sent, labels, mask, class_ids),
                       mesh)
    got, _ = jax.jit(loss_fn)(*args)
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-4)


def test_sharded_loss_fused_kernel_gradients_match(rng):
    """Backward through shard_map + the tiled two-kernel Pallas VJP (each
    shard's image side is B/8 = rectangular, so the square fast path cannot
    trigger) vs the single-device reference grads."""
    img, code, words, sent, labels, mask, class_ids = _inputs(rng)

    def ref(i, w):
        return damsm_loss(i, code, w, sent, labels, mask, class_ids)[0]

    g_ref = jax.grad(ref, argnums=(0, 1))(img, words)

    mesh = make_mesh()
    loss_fn = make_sharded_damsm_loss(mesh, fused=True)

    def sharded(i, w):
        return loss_fn(i, code, w, sent, labels, mask, class_ids)[0]

    args = shard_batch((img, words), mesh)
    g_shard = jax.jit(jax.grad(sharded, argnums=(0, 1)))(*args)
    for a, b in zip(g_ref, g_shard):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
