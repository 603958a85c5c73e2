"""Device mesh and sharding policy.

The reference has no distributed machinery at all (single `.cuda()` device,
SURVEY.md §2.2); scaling here is TPU-native: a `jax.sharding.Mesh` over all chips,
batch ('data') axis sharded, parameters and batch-norm statistics replicated. Every
train/eval step is a global-view jit program — GSPMD inserts the ICI collectives
(gradient psum, global batch-norm moments) automatically.

Multi-host: see parallel/multihost.py — `initialize_distributed(cfg)` before
`make_mesh()`, per-host feeding via `host_batch_indices` +
`global_batch_from_local` (`jax.make_array_from_process_local_data`).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg=None, devices=None) -> Mesh:
    """Build the device mesh from cfg.TPU.MESH_SHAPE / MESH_AXES.

    A -1 entry absorbs all remaining devices (like a reshape). Defaults to a 1-D
    'data' mesh over every visible device.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = list(cfg.TPU.MESH_SHAPE) if cfg is not None else [-1]
    axes = list(cfg.TPU.MESH_AXES) if cfg is not None else ["data"]
    n = len(devices)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) if len(shape) > 1 else 1
        shape[shape.index(-1)] = n // max(known, 1)
    total = int(np.prod(shape))
    assert total == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def data_sharding(mesh: Mesh, ndim: int, batch_axis=None) -> NamedSharding:
    """Shard dim 0 (batch) over the mesh, replicate the rest.

    With a multi-axis mesh (e.g. ('slice', 'data') for a DCN x ICI hierarchy)
    the batch shards jointly over every axis unless ``batch_axis`` names a
    specific axis (or tuple of axes).
    """
    if batch_axis is None:
        batch_axis = tuple(mesh.axis_names)
    spec = P(batch_axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, batch_axis=None) -> Any:
    """Device-put a pytree of host arrays with batch-dim sharding."""
    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, data_sharding(mesh, x.ndim, batch_axis))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pad_batch_for_mesh(batch: dict, mesh: Mesh, batch_axis=None):
    """Pad a host batch so its leading dim divides the data-axis size.

    Returns (padded batch, real count). Padding repeats row 0; callers mask by the
    real count (eval) or avoid ragged batches entirely (train drops the last batch,
    matching the reference's drop_last=True loader, train.py:164).
    """
    if batch_axis is None:
        size = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    else:
        size = mesh.shape[batch_axis]
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    target = pad_to_multiple(n, size)
    if target == n:
        return batch, n

    def pad(x):
        x = np.asarray(x)
        reps = np.repeat(x[:1], target - n, axis=0)
        return np.concatenate([x, reps], axis=0)

    return jax.tree.map(pad, batch), n


def visible_device_count() -> int:
    return jax.device_count()
