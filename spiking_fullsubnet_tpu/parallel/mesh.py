"""Mesh construction and sharding helpers.

Replaces the reference's NCCL/Accelerate topology (SURVEY.md §2d / §5h):
DDP grad all-reduce becomes a batch-sharded jit step on a Mesh('data'), with
XLA inserting the psum over ICI. The 'band' axis is available for sharding
the folded sub-band dimension when one chip's HBM is exceeded.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Tuple[str, ...] = ("data",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a Mesh over all available devices.

    Default: 1-D 'data' mesh over every chip (ICI within host, DCN across
    hosts — jax orders devices host-major so the data axis rides ICI first).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    else:
        shape = list(axis_sizes)
        unknown = [i for i, s in enumerate(shape) if s == -1]
        if unknown:
            known = int(np.prod([s for s in shape if s != -1]))
            shape[unknown[0]] = len(devices) // known
    return Mesh(devices.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, batch_axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; everything else replicated."""
    return NamedSharding(mesh, P(batch_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: str = "data"):
    """Place a host batch (pytree of arrays, dim 0 = batch) onto the mesh."""
    sharding = batch_sharding(mesh, batch_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def current_axis_size(name: str) -> Optional[int]:
    """Size of mesh axis `name` in the enclosing mesh context, or None.

    Works at trace time inside jit under a ``with mesh:`` block. Used by the
    model to decide whether a tensor dimension divides an axis before
    pinning a sharding on it: GSPMD's uneven-partition padding produced
    WRONG gradients for a padded-and-scanned sub-band axis (measured on jax
    0.9, tests/test_band_sharding.py documents the parity bar). Ragged
    dimensions are therefore EXPLICITLY zero-padded to the next axis
    multiple with masked BN statistics (models/fused_forward.py:221-236)
    so every section still shards; when the axis size cannot be detected
    at trace time (this returns None) the model falls back to replicating
    that tensor rather than risking the GSPMD padding path.
    """
    try:
        m = jax.sharding.get_abstract_mesh()
        if m is not None and name in m.shape:
            return int(m.shape[name])
    except Exception:  # noqa: BLE001
        pass
    try:
        from jax._src.mesh import thread_resources

        shape = thread_resources.env.physical_mesh.shape
        if name in shape:
            return int(shape[name])
    except Exception:  # noqa: BLE001
        pass
    return None
