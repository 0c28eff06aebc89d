"""Device-mesh runtime.

The reference has no distributed code at all (SURVEY.md §2.18); this is the
new communication/runtime layer for the TPU build. One `Mesh` abstraction
from day one: single chip is a 1x1 mesh so nothing is "added later".

Axes convention:
  * ``data``  — batch / frame / pair data parallelism
  * ``model`` — model or map-block parallelism (tensor-parallel matmuls,
                camera/point-block sharding in distributed BA)
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["P", "Mesh", "NamedSharding", "make_mesh", "data_sharding",
           "replicated", "shard_batch", "local_mesh"]

_ACTIVE_MESH: Optional[Mesh] = None


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a mesh over available devices.

    Default: all devices on the ``data`` axis, ``model``=1. On one chip
    this is a 1x1 mesh, so sharded code paths run unchanged.
    """
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def local_mesh() -> Mesh:
    """The process-wide default mesh (lazily built)."""
    global _ACTIVE_MESH
    if _ACTIVE_MESH is None:
        _ACTIVE_MESH = make_mesh()
    return _ACTIVE_MESH


@contextmanager
def use_mesh(mesh: Mesh):
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dim `axis` over the mesh's `data` axis, replicate the rest."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x: jax.Array, mesh: Optional[Mesh] = None, axis: int = 0) -> jax.Array:
    """Place a batched array with its leading dim sharded over ``data``."""
    mesh = mesh or local_mesh()
    return jax.device_put(x, data_sharding(mesh, x.ndim, axis))
