"""Device-mesh helpers.

The scaling model (BASELINE.json / SURVEY.md §5.8): rays and voxel tiles
shard over a device mesh (ICI within a host, DCN across hosts); the scene —
object banks, tape, arbitrary data, all <= a few hundred KB — is replicated.
Shape-parameter gradients in the fit all-reduce with ``psum`` over the mesh
axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = RAY_AXIS,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1D mesh over the available devices (rays/voxels only need one axis;
    a 2D ("host", "chip") mesh is a reshape away for multi-host layouts)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    hosts: Optional[int] = None,
    axis_names=("host", "chip"),
) -> Mesh:
    """("host", "chip") mesh for pod slices: shard voxel slabs over hosts
    (DCN) and rays/rows over chips (ICI).  Single-host: hosts=1."""
    devices = np.asarray(jax.devices())
    if hosts is None:
        hosts = max(1, jax.process_count())
    per_host = devices.size // hosts
    return Mesh(devices.reshape(hosts, per_host), axis_names)


def initialize_distributed(**kwargs) -> None:
    """Multi-host runtime bring-up (jax.distributed); no-op if single
    process.  On a pod slice every host calls this before building meshes."""
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # already initialized, or single-process context
        pass


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis_name: str = RAY_AXIS) -> NamedSharding:
    """Shard the leading axis (image rows / point batches) over the mesh."""
    return NamedSharding(mesh, P(axis_name))
