"""Device mesh + sharding layer.

The reference's only multi-device construct is single-process
``nn.DataParallel`` (nf_code.py:732). The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis: batches are sharded across chips,
parameters are replicated, and XLA inserts the ICI collectives (gradient
all-reduce, global BatchNorm statistics) automatically because the jitted
training step is written against *global* logical shapes.

A ``model`` axis is part of the mesh from day one so tensor-parallel layouts
(e.g. sharding the 512-filter Glow coupling convs) can be added without
re-plumbing callers. Multi-host "just works": the mesh is constructed from
``jax.devices()`` which spans hosts after ``jax.distributed.initialize``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(data: int = -1, model: int = 1,
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the given devices.

    data=-1 uses all devices not consumed by the model axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model <= 0:
        model = 1
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a (pytree of) host array(s) with the batch axis sharded over
    ``data``. Batch size must be divisible by the data-axis size."""
    def put(x):
        return jax.device_put(x, batch_sharding(mesh, ndim=np.ndim(x)))
    return jax.tree_util.tree_map(put, batch)


def shard_tree_replicated(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
