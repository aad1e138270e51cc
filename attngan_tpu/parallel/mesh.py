"""Device mesh and sharding helpers.

The reference is strictly single-GPU (`.cuda()` literals, reference
train.py:60-69; no torch.distributed anywhere). In this framework data
parallelism is first-class: every train/infer step is jit-compiled with its
batch arguments sharded over a 1-D ``data`` mesh axis, and XLA inserts the
ICI collectives (gradient psum, the all-gathers needed by the cross-replica
B×B DAMSM similarity matrices) automatically under SPMD.

The mesh is 1-D today because the models are tens of MB; the axis name is a
tuple so tensor/pipeline axes can be added without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over all (or the given) devices, axis name 'data'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=(DATA_AXIS,))


def make_mesh_for_batch(batch_size: int,
                        devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D data mesh using the most devices that evenly divide the global
    batch (a 4-sample batch on an 8-device host uses 4 devices)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place every array in ``tree`` with its leading dim sharded over data."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
