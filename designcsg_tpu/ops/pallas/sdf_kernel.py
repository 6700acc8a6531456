"""Pallas voxel/point SDF evaluation kernels.

Two entry points:

* :func:`make_pallas_point_eval` — arbitrary point batches (the k2 path,
  Evaluator.cpp:117-162): coordinates stream HBM->VMEM in (SUB, 128) tiles,
  the whole staged tape runs on VMEM-resident planes, one f32 out per point.

* :func:`make_grid_eval` — dense voxel grids for export/bench: no coordinate
  input at all; world coordinates are synthesized in-register from the grid
  index (program_id + iota), eliminating the 16-byte/point HBM read that
  would otherwise dominate — the kernel is pure compute + 4-byte/point
  write.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...brushes import EvalContext
from ...compiler import CompiledScene, SceneArrays
from .tape import make_component_tape, smem_bank_reader

SUB = 256  # sublane tile (rows)
LANE = 128  # lane tile (cols)


def _bank_specs():
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # position
        pl.BlockSpec(memory_space=pltpu.SMEM),  # right
        pl.BlockSpec(memory_space=pltpu.SMEM),  # up
        pl.BlockSpec(memory_space=pltpu.SMEM),  # forward
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ad (reshaped 2D)
    ]


def _bank_inputs(arrays: SceneArrays):
    ad = jnp.asarray(arrays.ad).reshape(-1, LANE)
    return (
        jnp.asarray(arrays.position),
        jnp.asarray(arrays.right),
        jnp.asarray(arrays.up),
        jnp.asarray(arrays.forward),
        ad,
    )


def make_pallas_point_eval(
    scene: CompiledScene,
    gizmo: bool = False,
    interpret: bool = False,
):
    """Returns ``eval(points f32[N,3], arrays) -> f32[N]``.  N is padded to a
    tile multiple internally."""
    tape_eval = make_component_tape(scene, gizmo=gizmo)
    tile_points = SUB * LANE

    def kernel(pos_ref, right_ref, up_ref, fwd_ref, ad_ref, x_ref, y_ref, z_ref, out_ref):
        bank = smem_bank_reader(pos_ref, right_ref, up_ref, fwd_ref)
        ctx = EvalContext(ad=ad_ref)
        out_ref[:] = tape_eval(x_ref[:], y_ref[:], z_ref[:], bank, ctx)

    @jax.jit
    def point_eval(points, arrays: SceneArrays):
        n = points.shape[0]
        pad = (-n) % tile_points
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros((pad, 3), points.dtype)], axis=0
            )
        total = points.shape[0]
        rows = total // LANE
        x = points[:, 0].reshape(rows, LANE)
        y = points[:, 1].reshape(rows, LANE)
        z = points[:, 2].reshape(rows, LANE)
        grid = rows // SUB

        plane = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=_bank_specs() + [plane, plane, plane],
            out_specs=plane,
            out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            interpret=interpret,
        )(*_bank_inputs(arrays), x, y, z)
        return out.reshape(total)[:n]

    return point_eval


def make_grid_eval(
    scene: CompiledScene,
    gizmo: bool = False,
    interpret: bool = False,
):
    """Returns ``grid_eval(arrays, lo, cell, z0, slab, resolution) ->
    f32[slab, res, res]`` — SDF at grid corners ``lo + cell * (x, y, z0+z)``.

    ``resolution`` and ``slab`` are static; ``lo``/``cell``/``z0`` are traced
    scalars so one executable serves every slab and bounding box.
    """
    tape_eval = make_component_tape(scene, gizmo=gizmo)

    def kernel(scalars_ref, pos_ref, right_ref, up_ref, fwd_ref, ad_ref, out_ref, *, ny):
        # scalars: [lox, loy, loz, cell, z0]
        lox = scalars_ref[0]
        loy = scalars_ref[1]
        loz = scalars_ref[2]
        cell = scalars_ref[3]
        z0 = scalars_ref[4]
        i = pl.program_id(0)  # row-block index over (slab*ny) rows
        j = pl.program_id(1)  # col-block index over nx cols
        rows = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0) + i * SUB
        cols = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1) + j * LANE
        zi = rows // ny
        yi = rows % ny
        x = lox + cell * cols.astype(jnp.float32)
        y = loy + cell * yi.astype(jnp.float32)
        z = loz + cell * (z0 + zi.astype(jnp.float32))
        bank = smem_bank_reader(pos_ref, right_ref, up_ref, fwd_ref)
        ctx = EvalContext(ad=ad_ref)
        out_ref[:] = tape_eval(x, y, z, bank, ctx)

    @functools.partial(jax.jit, static_argnames=("slab", "ny", "nx"))
    def grid_eval(
        arrays: SceneArrays, lo, cell, z0, slab: int, ny: int, nx: Optional[int] = None
    ):
        """SDF at the (slab, ny, nx) lattice ``lo + cell*(x, y, z0+z)``.
        ny/nx need not be tile-aligned; padding rows/cols are evaluated and
        sliced off."""
        if nx is None:
            nx = ny
        nx_pad = -(-nx // LANE) * LANE
        total_rows = slab * ny
        rows_pad = -(-total_rows // SUB) * SUB
        scalars = jnp.concatenate(
            [
                jnp.asarray(lo, jnp.float32).reshape(3),
                jnp.asarray(cell, jnp.float32).reshape(1),
                jnp.asarray(z0, jnp.float32).reshape(1),
            ]
        )
        out = pl.pallas_call(
            functools.partial(kernel, ny=ny),
            grid=(rows_pad // SUB, nx_pad // LANE),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _bank_specs(),
            out_specs=pl.BlockSpec(
                (SUB, LANE), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((rows_pad, nx_pad), jnp.float32),
            interpret=interpret,
        )(scalars, *_bank_inputs(arrays))
        return out[:total_rows, :nx].reshape(slab, ny, nx)

    return grid_eval
