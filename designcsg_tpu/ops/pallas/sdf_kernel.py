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


def _bank_specs(scene: Optional[CompiledScene] = None):
    from .brushes_kernel import scene_preludes

    n_extras = len(scene_preludes(scene)) if scene is not None else 0
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # position
        pl.BlockSpec(memory_space=pltpu.SMEM),  # right
        pl.BlockSpec(memory_space=pltpu.SMEM),  # up
        pl.BlockSpec(memory_space=pltpu.SMEM),  # forward
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ad (reshaped 2D)
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_extras  # twin preludes


def _bank_inputs(arrays: SceneArrays, scene: Optional[CompiledScene] = None):
    from .brushes_kernel import scene_preludes

    ad = jnp.asarray(arrays.ad).reshape(-1, LANE)
    extras = (
        tuple(pf(arrays) for _, pf in scene_preludes(scene))
        if scene is not None
        else ()
    )
    return (
        jnp.asarray(arrays.position),
        jnp.asarray(arrays.right),
        jnp.asarray(arrays.up),
        jnp.asarray(arrays.forward),
        ad,
    ) + extras


def _split_bank_refs(scene: Optional[CompiledScene], refs):
    """(pos, right, up, fwd, ad, extras_dict, remaining_refs)."""
    from .brushes_kernel import scene_preludes

    names = [n for n, _ in scene_preludes(scene)] if scene is not None else []
    pos_ref, right_ref, up_ref, fwd_ref, ad_ref = refs[:5]
    extras = dict(zip(names, refs[5 : 5 + len(names)]))
    return pos_ref, right_ref, up_ref, fwd_ref, ad_ref, extras, refs[5 + len(names):]


def make_pallas_point_eval(
    scene: CompiledScene,
    gizmo: bool = False,
    interpret: bool = False,
    sub: int = SUB,
):
    """Returns ``eval(points f32[N,3], arrays) -> f32[N]``.  N is padded to a
    tile multiple internally.

    ``sub`` is the tile's sublane rows (default 256 = the measured TPU
    sweet spot).  Interpret-mode parity tests pass a small value (e.g. 8):
    interpret cost is proportional to padded tile elements, and a 2 k-point
    spot check should not pay for a 32 k-point tile."""
    assert sub % 8 == 0 and sub > 0, sub
    tape_eval = make_component_tape(scene, gizmo=gizmo)
    tile_points = sub * LANE

    def kernel(*refs):
        pos_ref, right_ref, up_ref, fwd_ref, ad_ref, extras, rest = (
            _split_bank_refs(scene, refs)
        )
        x_ref, y_ref, z_ref, out_ref = rest
        bank = smem_bank_reader(pos_ref, right_ref, up_ref, fwd_ref)
        ctx = EvalContext(ad=ad_ref, extras=extras)
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
        grid = rows // sub

        plane = pl.BlockSpec((sub, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=_bank_specs(scene) + [plane, plane, plane],
            out_specs=plane,
            out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            interpret=interpret,
            # Deep twin tapes (Logo: 3 letters x rank-32 gather chains on
            # (256, 128) planes) need more scratch than Mosaic's default
            # 16 MB scoped-vmem budget — the Logo export's refine loop OOMed
            # at 17.7 MB on v5e (128 MB VMEM physical).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(*_bank_inputs(arrays, scene), x, y, z)
        return out.reshape(total)[:n]

    return point_eval


def make_twin_point_eval(scene: CompiledScene, gizmo: bool = False):
    """Plain-XLA evaluation of the kernel-twin FIELD: the same component
    tape (and hence the same baked/twin brushes — e.g. Logo's rank-32
    letter fields) as :func:`make_pallas_point_eval`, but composed as
    ordinary jnp ops instead of a ``pallas_call``.

    Two uses: evaluating the twin field off-TPU at XLA speed (interpret-
    mode Pallas is orders of magnitude slower — the CPU analog of the TPU
    export path for tests), and cross-checking the kernel against an
    independent compilation of the identical tape."""
    from .brushes_kernel import scene_preludes
    from .tape import array_bank_reader

    tape_eval = make_component_tape(scene, gizmo=gizmo)
    names = [nm for nm, _ in scene_preludes(scene)]
    tile_points = 8 * LANE

    @jax.jit
    def point_eval(points, arrays: SceneArrays):
        n = points.shape[0]
        pad = (-n) % tile_points
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros((pad, 3), points.dtype)], axis=0
            )
        rows = points.shape[0] // LANE
        x = points[:, 0].reshape(rows, LANE)
        y = points[:, 1].reshape(rows, LANE)
        z = points[:, 2].reshape(rows, LANE)
        inputs = _bank_inputs(arrays, scene)
        ad = inputs[4]
        extras = dict(zip(names, inputs[5:]))
        # Trace-time marker for twins that must compose differently under
        # plain XLA vs Mosaic (e.g. packed_rank_sample's gather form).
        extras["__xla_tape__"] = True
        ctx = EvalContext(ad=ad, extras=extras)
        bank = array_bank_reader(arrays)
        out = tape_eval(x, y, z, bank, ctx)
        return out.reshape(-1)[:n]

    return point_eval


BZ = 16  # z cells per grid block
BY = 32  # y cells per grid block (best of the measured (BZ,BY) sweep)


def make_grid_eval(
    scene: CompiledScene,
    gizmo: bool = False,
    interpret: bool = False,
    cull: Optional[bool] = None,
):
    """Returns ``grid_eval(arrays, lo, cell, z0, slab, resolution) ->
    f32[slab, res, res]`` — SDF at grid corners ``lo + cell * (x, y, z0+z)``.

    ``resolution`` and ``slab`` are static; ``lo``/``cell``/``z0`` are traced
    scalars so one executable serves every slab and bounding box.

    Each kernel instance owns a *spatially compact* (BZ, BY, 128) cell block
    (not a flat row stripe), so the exact interval cull (ops/pallas/cull.py)
    can prune whole brush evaluations per block: the scalar interval chain
    runs once per 32K points, and blocks far from an object skip its brush
    entirely — the dominant win for large dense grids, whose tape is
    otherwise instruction-issue bound.
    """
    tape_eval = make_component_tape(scene, gizmo=gizmo)
    from .cull import make_tape_culler

    # cull=None (default) currently means OFF: measured on the shipped
    # designs the exact cull nets out neutral-to-negative (see
    # cull.worth_culling's docstring for why); pass cull=True for scenes
    # with many expensive, spatially-separated brushes.
    culler = make_tape_culler(scene, gizmo=gizmo) if cull else None

    def kernel(scalars_ref, *refs):
        pos_ref, right_ref, up_ref, fwd_ref, ad_ref, extras, rest = (
            _split_bank_refs(scene, refs)
        )
        (out_ref,) = rest
        # scalars: [lox, loy, loz, cell, z0]
        lox = scalars_ref[0]
        loy = scalars_ref[1]
        loz = scalars_ref[2]
        cell = scalars_ref[3]
        z0 = scalars_ref[4]
        k0 = pl.program_id(0)
        k1 = pl.program_id(1)
        k2 = pl.program_id(2)
        shape = (BZ, BY, LANE)
        zi = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + k0 * BZ
        yi = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + k1 * BY
        xi = jax.lax.broadcasted_iota(jnp.int32, shape, 2) + k2 * LANE
        x = lox + cell * xi.astype(jnp.float32)
        y = loy + cell * yi.astype(jnp.float32)
        z = loz + cell * (z0 + zi.astype(jnp.float32))
        bank = smem_bank_reader(pos_ref, right_ref, up_ref, fwd_ref)
        ctx = EvalContext(ad=ad_ref, extras=extras)
        if culler is not None:
            x0 = lox + cell * (k2 * LANE).astype(jnp.float32)
            y0 = loy + cell * (k1 * BY).astype(jnp.float32)
            zb = loz + cell * (z0 + (k0 * BZ).astype(jnp.float32))
            box = (
                (x0, x0 + cell * (LANE - 1)),
                (y0, y0 + cell * (BY - 1)),
                (zb, zb + cell * (BZ - 1)),
            )
            preds, substs = culler(box, bank, ctx)
            out_ref[:] = tape_eval(
                x, y, z, bank, ctx, (culler.groups, preds, substs)
            )
        else:
            out_ref[:] = tape_eval(x, y, z, bank, ctx)

    @functools.partial(jax.jit, static_argnames=("slab", "ny", "nx"))
    def grid_eval(
        arrays: SceneArrays, lo, cell, z0, slab: int, ny: int, nx: Optional[int] = None
    ):
        """SDF at the (slab, ny, nx) lattice ``lo + cell*(x, y, z0+z)``.
        Dimensions need not be block-aligned; padding cells are evaluated
        and sliced off."""
        if nx is None:
            nx = ny
        nx_pad = -(-nx // LANE) * LANE
        ny_pad = -(-ny // BY) * BY
        nz_pad = -(-slab // BZ) * BZ
        scalars = jnp.concatenate(
            [
                jnp.asarray(lo, jnp.float32).reshape(3),
                jnp.asarray(cell, jnp.float32).reshape(1),
                jnp.asarray(z0, jnp.float32).reshape(1),
            ]
        )
        out = pl.pallas_call(
            kernel,
            grid=(nz_pad // BZ, ny_pad // BY, nx_pad // LANE),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _bank_specs(scene),
            out_specs=pl.BlockSpec(
                (BZ, BY, LANE), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((nz_pad, ny_pad, nx_pad), jnp.float32),
            interpret=interpret,
            # Same scoped-vmem headroom as the point kernel: Logo's twin
            # tape on a (16, 32, 128) block overruns the 16 MB default.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(scalars, *_bank_inputs(arrays, scene))
        return out[:slab, :ny, :nx]

    return grid_eval
