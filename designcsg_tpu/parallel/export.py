"""Multi-device voxel-grid evaluation for export.

Slabs of the export grid shard across the mesh: device k evaluates z-rows
``[k*per, (k+1)*per)`` of each slab with the scene replicated (the voxel-tile
data parallelism of SURVEY.md §2.7).  On a pod slice the per-host gather
rides DCN only once per slab; within a host, slices ride ICI.  Works with
both the jnp staged interpreter and (on TPU) the Pallas grid kernel inside
``shard_map``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..compiler import CompiledScene
from ..ops.interpreter import make_primary_sdf
from .mesh import make_mesh


def make_sharded_corner_provider(
    scene: CompiledScene,
    center,
    half_diameter: float,
    resolution: int,
    mesh: Optional[Mesh] = None,
    use_pallas: Optional[bool] = None,
) -> Callable[[int, int], np.ndarray]:
    """Returns ``corner_provider(z0, sz) -> f32[sz+1, res+1, res+1]`` with the
    z-rows of each slab split across the mesh devices."""
    if mesh is None:
        mesh = make_mesh()
    axes = tuple(mesh.axis_names)  # axis-agnostic: 1D and 2D meshes alike
    n = mesh.devices.size
    r1 = resolution + 1
    center = np.asarray(center, np.float64)
    cell = 2.0 * half_diameter / resolution
    lo = center - half_diameter
    lo32 = np.asarray(lo, np.float32)
    cell32 = np.float32(cell)

    if use_pallas is None:
        from ..ops.pallas import supports_scene

        use_pallas = jax.default_backend() == "tpu" and supports_scene(scene)

    if use_pallas:
        from ..ops.pallas import make_grid_eval

        grid_kernel = make_grid_eval(scene)

        def eval_rows(arrays, z0f, nrows: int):
            return grid_kernel(arrays, lo32, cell32, z0f, nrows, r1)

    else:
        sdf = make_primary_sdf(scene)

        def eval_rows(arrays, z0f, nrows: int):
            zi = jax.lax.broadcasted_iota(jnp.int32, (nrows, r1, r1), 0)
            yi = jax.lax.broadcasted_iota(jnp.int32, (nrows, r1, r1), 1)
            xi = jax.lax.broadcasted_iota(jnp.int32, (nrows, r1, r1), 2)
            pts = jnp.stack(
                [
                    lo32[0] + cell32 * xi.astype(jnp.float32),
                    lo32[1] + cell32 * yi.astype(jnp.float32),
                    lo32[2] + cell32 * (zi.astype(jnp.float32) + z0f),
                ],
                axis=-1,
            )
            return sdf(pts, arrays)

    _cache = {}

    def provider(z0: int, sz: int) -> np.ndarray:
        nz = sz + 1
        per = -(-nz // n)  # rows per device (last device may overhang)
        if per not in _cache:

            def block(arrays, z0f):
                k = jax.lax.axis_index(axes).astype(jnp.float32)
                return eval_rows(arrays, z0f + k * per, per)

            sharded = jax.shard_map(
                block,
                mesh=mesh,
                in_specs=(P(), P()),
                out_specs=P(axes),
                check_vma=False,
            )
            _cache[per] = jax.jit(sharded)
        arrays = jax.tree_util.tree_map(jnp.asarray, scene.arrays)
        out = np.asarray(_cache[per](arrays, np.float32(z0)))
        return out[:nz]

    return provider
