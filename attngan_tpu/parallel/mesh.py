"""Device mesh and sharding helpers.

The reference is strictly single-GPU (`.cuda()` literals, reference
train.py:60-69; no torch.distributed anywhere). In this framework data
parallelism is first-class: every train/infer step is jit-compiled with its
batch arguments sharded over the mesh's batch axes, and XLA inserts the
ICI collectives (gradient psum, the all-gathers needed by the cross-replica
B×B DAMSM similarity matrices) automatically under SPMD.

The default mesh is 1-D ('data') because the models are tens of MB; a 2-D
('slice', 'data') mesh — the multi-slice / DCN-over-ICI topology — is
supported by passing ``shape=(n_slices, chips_per_slice)`` (or setting
``RunConfig.mesh_shape``). Batches shard over BOTH axes and gradient
reductions become hierarchical (intra-slice ICI psum, then the small
inter-slice combine over DCN) — XLA lowers this from the same SPMD program,
so no call site changes between the 1-D and 2-D layouts.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SLICE_AXIS = "slice"   # outer (DCN) axis of a 2-D multi-slice mesh


def make_mesh(devices: Optional[Sequence] = None,
              shape: Tuple[int, ...] = ()) -> Mesh:
    """A device mesh whose every axis is a batch axis.

    shape () or (n,): 1-D mesh over all (or the first n) devices, axis
    'data'. shape (s, d): 2-D ('slice', 'data') mesh over the first s*d
    devices — the multi-slice layout (slices over DCN, chips over ICI).
    """
    if devices is None:
        devices = jax.devices()
    if len(shape) <= 1:
        n = shape[0] if shape else len(devices)
        if n > len(devices):
            raise ValueError(f"mesh shape {shape} needs {n} devices, "
                             f"have {len(devices)}")
        return Mesh(np.asarray(devices[:n]), axis_names=(DATA_AXIS,))
    if len(shape) == 2:
        n = shape[0] * shape[1]
        if n > len(devices):
            raise ValueError(f"mesh shape {shape} needs {n} devices, "
                             f"have {len(devices)}")
        return Mesh(np.asarray(devices[:n]).reshape(shape),
                    axis_names=(SLICE_AXIS, DATA_AXIS))
    raise ValueError(f"unsupported mesh shape {shape} (max 2-D)")


def make_mesh_for_batch(batch_size: int,
                        devices: Optional[Sequence] = None,
                        shape: Tuple[int, ...] = ()) -> Mesh:
    """With an explicit ``shape`` (RunConfig.mesh_shape), build exactly that
    mesh (the global batch must divide by its size). Otherwise a 1-D data
    mesh using the most devices that evenly divide the global batch (a
    4-sample batch on an 8-device host uses 4 devices)."""
    if shape:
        mesh = make_mesh(devices, shape)
        if batch_size % mesh.size != 0:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"mesh size {mesh.size} (shape {shape})")
        return mesh
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(devices[:n])


def batch_axes(mesh: Mesh) -> Tuple[str, ...]:
    """Every mesh axis shards the batch (pure data parallelism)."""
    return tuple(mesh.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over all mesh axes."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place every array in ``tree`` with its leading dim batch-sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
