"""Active-block surface extraction — the TPU-native octree.

The reference descends an octree so the CPU only visits cells near the
surface (reference: /root/reference/master/cms/main/Headers/mesh.hpp:214-308).
The dense TPU pipeline inverted that: evaluate everything, ship everything to
the host.  Evaluation is nearly free on the TPU (the Pallas grid kernel runs
512^3 in tens of ms) but *shipping* the corner grid is not — a 513^3 f32 grid
is ~540 MB over the host link, and that transfer dominated export wall-clock.

This module is the two-level hierarchy that restores the octree's asymptotics
with TPU-shaped dataflow:

  1. evaluate the full corner grid on device, slab by slab (dense, vectorized
     — the TPU analog of visiting every octree leaf candidate);
  2. reduce, *on device*, a per-block activity mask: a block of cells is
     active iff some cell in it has corners on both sides of the surface
     (exactly the corner-sign test the octree uses to descend,
     mesh.hpp:176-183);
  3. ship the tiny mask, gather only active blocks (vmapped dynamic_slice —
     one XLA gather), and ship those;
  4. assemble triangles on the host from active blocks only (native C++
     mc_blocks or the numpy fallback) and weld exactly as the dense path.

Only O(surface) bytes cross the host link instead of O(volume): for Design1
at 512^3 that is ~60 MB instead of ~540 MB.  Results are bit-identical to the
dense path (same cells, same corner values, same table).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluator import BatchEvaluator
from ..ops.marching_cubes import Mesh, _block_triangles, assemble_mesh

# Gather chunk bound: caps device memory for the gathered-block buffer.
_MAX_GATHER = 2048


def _make_slab_provider(
    evaluator: BatchEvaluator, device_mesh=None
) -> Callable:
    """Returns ``provider(lo3 f64[3], cell, z0, rows, r1) -> device f32[rows, r1, r1]``
    — corner values at ``lo + cell * (x, y, z0 + z)``, left on device.

    With ``device_mesh``, slab z-rows are evaluated in ``shard_map`` across
    the mesh's first axis (the voxel-tile data parallelism of SURVEY.md §2.7)
    and the result stays sharded; the downstream mask/gather jits run on the
    global array with GSPMD inserting the halo exchanges."""
    if device_mesh is not None:
        return _make_sharded_slab_provider(evaluator, device_mesh)
    if getattr(evaluator, "use_pallas", False):
        from ..ops.pallas import make_grid_eval

        grid_eval = make_grid_eval(
            evaluator.scene,
            interpret=getattr(evaluator, "pallas_interpret", False),
        )

        def provider(lo3, cell, z0, rows, r1):
            return grid_eval(
                evaluator._device_arrays,
                np.asarray(lo3, np.float32),
                np.float32(cell),
                np.float32(z0),
                rows,
                r1,
            )

        return provider

    sdf = evaluator._sdf_raw

    @functools.partial(jax.jit, static_argnames=("rows", "r1"))
    def jnp_grid(arrays, lo3, cell, z0f, rows: int, r1: int):
        zi = z0f + jnp.arange(rows, dtype=jnp.float32)
        yi = jnp.arange(r1, dtype=jnp.float32)
        xi = jnp.arange(r1, dtype=jnp.float32)
        z = lo3[2] + cell * zi
        y = lo3[1] + cell * yi
        x = lo3[0] + cell * xi
        pts = jnp.stack(
            jnp.broadcast_arrays(
                x[None, None, :], y[None, :, None], z[:, None, None]
            ),
            axis=-1,
        ).reshape(-1, 3)
        return sdf(pts, arrays).reshape(rows, r1, r1)

    def provider(lo3, cell, z0, rows, r1):
        return jnp_grid(
            evaluator._device_arrays,
            jnp.asarray(np.asarray(lo3, np.float32)),
            jnp.float32(cell),
            jnp.float32(z0),
            rows,
            r1,
        )

    return provider


def _make_sharded_slab_provider(evaluator: BatchEvaluator, device_mesh):
    from jax.sharding import PartitionSpec as P

    # All mesh axes jointly shard the z-rows: a 1D ("rays",) mesh and a 2D
    # ("host", "chip") pod layout run the same program (axis-agnostic spec).
    axes = tuple(device_mesh.axis_names)
    n = int(np.prod([device_mesh.shape[a] for a in axes]))
    scene = evaluator.scene

    if getattr(evaluator, "use_pallas", False):
        from ..ops.pallas import make_grid_eval

        grid_eval = make_grid_eval(
            scene, interpret=getattr(evaluator, "pallas_interpret", False)
        )

        def eval_rows(arrays, lo3, cell, z0f, nrows: int, r1: int):
            return grid_eval(arrays, lo3, cell, z0f, nrows, r1)

    else:
        # Fresh unsharded interpreter: the evaluator's own sdf may already be
        # shard_map-wrapped (sharded=True), and shard_maps don't nest.
        from ..ops.interpreter import make_primary_sdf

        sdf = make_primary_sdf(scene)

        def eval_rows(arrays, lo3, cell, z0f, nrows: int, r1: int):
            zi = jax.lax.broadcasted_iota(jnp.int32, (nrows, r1, r1), 0)
            yi = jax.lax.broadcasted_iota(jnp.int32, (nrows, r1, r1), 1)
            xi = jax.lax.broadcasted_iota(jnp.int32, (nrows, r1, r1), 2)
            pts = jnp.stack(
                [
                    lo3[0] + cell * xi.astype(jnp.float32),
                    lo3[1] + cell * yi.astype(jnp.float32),
                    lo3[2] + cell * (zi.astype(jnp.float32) + z0f),
                ],
                axis=-1,
            ).reshape(-1, 3)
            return sdf(pts, arrays).reshape(nrows, r1, r1)

    _cache = {}

    def provider(lo3, cell, z0, rows, r1):
        per = -(-rows // n)  # z-rows per device; trailing overhang sliced off
        key = (per, r1)
        if key not in _cache:

            def block(arrays, lo3d, celld, z0f):
                k = jax.lax.axis_index(axes).astype(jnp.float32)
                return eval_rows(arrays, lo3d, celld, z0f + k * per, per, r1)

            _cache[key] = jax.jit(
                jax.shard_map(
                    block,
                    mesh=device_mesh,
                    in_specs=(P(), P(), P(), P()),
                    out_specs=P(axes),
                    check_vma=False,
                )
            )
        out = _cache[key](
            evaluator._device_arrays,
            jnp.asarray(np.asarray(lo3, np.float32)),
            jnp.float32(cell),
            jnp.float32(z0),
        )
        return out[:rows]

    return provider


@functools.partial(jax.jit, static_argnames=("bz", "by", "bx"))
def _block_mask(vals, bz: int, by: int, bx: int):
    """bool[sz/bz, res/by, res/bx] — block contains a sign-change cell.

    A cell is active iff its 8 corners straddle the surface (min < 0 <= max)
    — the same corner-sign descend test as the reference octree
    (mesh.hpp:176-183); blocks OR their cells."""
    sz = vals.shape[0] - 1
    res_y = vals.shape[1] - 1
    res_x = vals.shape[2] - 1
    m = None
    M = None
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                c = vals[dz : dz + sz, dy : dy + res_y, dx : dx + res_x]
                m = c if m is None else jnp.minimum(m, c)
                M = c if M is None else jnp.maximum(M, c)
    active = (m < 0.0) & (M >= 0.0)
    return active.reshape(
        sz // bz, bz, res_y // by, by, res_x // bx, bx
    ).any(axis=(1, 3, 5))


@functools.partial(jax.jit, static_argnames=("bz", "by", "bx"))
def _gather_blocks(vals, coords, bz: int, by: int, bx: int):
    """f32[K, bz+1, by+1, bx+1] — corner sub-grids of the blocks whose local
    (z, y, x) cell origins are ``coords`` i32[K, 3].  One XLA gather."""

    def one(c):
        return jax.lax.dynamic_slice(
            vals, (c[0], c[1], c[2]), (bz + 1, by + 1, bx + 1)
        )

    return jax.vmap(one)(coords)


def choose_block(resolution: int, slab_cells: int) -> Tuple[int, int, int]:
    """Largest (bz, by, bx) <= (4, 16, 16) dividing (slab, res, res).

    The cap is link-bandwidth-tuned: the host link is the extract
    bottleneck (~50 MB/s through the relay), and shipped bytes scale with
    how tightly active blocks hug the surface.  Measured on Design1 512^3
    (2.18 M tris): (8, 32, 32) ships ~124 MB of corner blocks, (4, 16, 16)
    halves that and cuts the extract stage ~35%; below (4, 16, 16) the
    per-block halo (+1 corner row per axis) and gather fan-out win back the
    savings."""

    def largest_divisor(n: int, cap: int) -> int:
        d = 1
        while d * 2 <= cap and n % (d * 2) == 0:
            d *= 2
        return d

    bz = largest_divisor(slab_cells, 4)
    bxy = largest_divisor(resolution, 16)
    return bz, bxy, bxy


def extract_surface_active(
    evaluator: BatchEvaluator,
    center: np.ndarray,
    half_diameter: float,
    resolution: int,
    midpoint: bool = False,
    slab_cells: int = 32,
    block: Optional[Tuple[int, int, int]] = None,
    progress: Optional[Callable[[str, float], None]] = None,
    use_native: Optional[bool] = None,
    device_mesh=None,
    slab_store=None,
    stats: Optional[dict] = None,
) -> Mesh:
    """March ``resolution^3`` cells over ``center ± half_diameter`` shipping
    only surface-active blocks to the host.  Produces the same triangle set
    as :func:`..ops.marching_cubes.extract_surface` on the same evaluator
    (identical cells, corner values, and table; only enumeration order — and
    hence vertex numbering — differs).

    Requires ``slab_cells | resolution``; callers fall back to the dense path
    otherwise.

    ``slab_store`` / ``stats``: per-slab resume shards and triangle counts,
    as in :func:`..ops.marching_cubes.extract_surface`.
    """
    res = int(resolution)
    slab = min(int(slab_cells), res)
    if res % slab != 0:
        raise ValueError(f"slab_cells={slab} must divide resolution={res}")
    bz, by, bx = block if block is not None else choose_block(res, slab)
    if slab % bz or res % by or res % bx:
        raise ValueError(f"block {(bz, by, bx)} must divide {(slab, res, res)}")

    center = np.asarray(center, dtype=np.float64)
    cell = 2.0 * half_diameter / res
    lo = center - half_diameter
    r1 = res + 1
    provider = _make_slab_provider(evaluator, device_mesh=device_mesh)

    # The host link is the bottleneck (the relay moves ~25 MB/s for
    # call-at-a-time reads but ~55 MB/s with several copies in flight), so
    # gathered block chunks are issued with copy_to_host_async and
    # materialized a few slabs behind: transfers pipeline against the next
    # slab's eval/gather AND the host-side triangle assembly.  The window
    # bounds both memory and the crash-resume loss (at most window+1 slabs
    # re-extract on resume, vs 1 for the old synchronous loop).
    window = 4
    results: dict = {}  # z0 -> (slab_keys, slab_pos)
    pending: list = []  # (z0, [(dev_blocks, k, gxyz[k, 3])])

    def flush_one():
        z0p, items = pending.pop(0)
        slab_keys = []
        slab_pos = []
        for dev, k, gxyz in items:
            blocks = np.asarray(dev)[:k]
            keys, pos = _host_blocks(blocks, gxyz, res, midpoint, use_native)
            if keys.shape[0]:
                slab_keys.append(keys.reshape(-1))
                slab_pos.append(pos.reshape(-1, 3))
        if slab_store is not None:
            slab_store.save(
                z0p,
                keys=(
                    np.concatenate(slab_keys)
                    if slab_keys
                    else np.zeros((0,), np.int64)
                ),
                pos=(
                    np.concatenate(slab_pos)
                    if slab_pos
                    else np.zeros((0, 3), np.float32)
                ),
            )
        finish_slab(z0p, slab_keys, slab_pos)

    def finish_slab(z0f, slab_keys, slab_pos):
        results[z0f] = (slab_keys, slab_pos)
        if stats is not None:
            stats.setdefault("slab_triangles", {})[z0f] = (
                int(sum(k.reshape(-1).shape[0] for k in slab_keys)) // 3
            )
        if progress is not None:
            progress("extract", (z0f + slab) / res)

    for z0 in range(0, res, slab):
        cached = slab_store.load(z0) if slab_store is not None else None
        if cached is not None:
            finish_slab(
                z0,
                [cached["keys"]] if cached["keys"].shape[0] else [],
                [cached["pos"]] if cached["pos"].shape[0] else [],
            )
            continue
        vals = provider(lo, cell, z0, slab + 1, r1)
        mask = np.asarray(_block_mask(vals, bz, by, bx))
        bcoords = np.argwhere(mask)  # [(zb, yb, xb)] block indices
        items = []
        if bcoords.shape[0]:
            # Local cell origins (z, y, x) for the device gather;
            # global (x, y, z) for key/vertex assembly.
            local = (bcoords * np.array([bz, by, bx])).astype(np.int32)
            global_xyz = np.stack(
                [local[:, 2], local[:, 1], local[:, 0] + z0], axis=-1
            ).astype(np.int64)
            K = local.shape[0]
            for s in range(0, K, _MAX_GATHER):
                chunk = local[s : s + _MAX_GATHER]
                k = chunk.shape[0]
                kpad = max(16, 1 << int(np.ceil(np.log2(k))))
                if kpad != k:
                    chunk = np.concatenate(
                        [chunk, np.zeros((kpad - k, 3), np.int32)], axis=0
                    )
                dev = _gather_blocks(vals, jnp.asarray(chunk), bz, by, bx)
                try:
                    dev.copy_to_host_async()
                except Exception:  # pragma: no cover - backend-dependent
                    pass
                items.append((dev, k, global_xyz[s : s + k]))
        pending.append((z0, items))
        while len(pending) > window:
            flush_one()
    while pending:
        flush_one()

    all_keys = []
    all_pos = []
    for z0 in sorted(results):
        slab_keys, slab_pos = results[z0]
        all_keys.extend(slab_keys)
        all_pos.extend(slab_pos)

    return assemble_mesh(all_keys, all_pos, lo, cell, use_native=use_native)


def _host_blocks(blocks, coords_xyz, resolution, midpoint, use_native):
    from .. import native

    if use_native is None:
        use_native = native.available()
    if use_native:
        return native.mc_blocks(blocks, coords_xyz, resolution, midpoint)
    keys_list = []
    pos_list = []
    for b in range(blocks.shape[0]):
        k, p = _block_triangles(
            blocks[b], tuple(coords_xyz[b]), resolution, midpoint
        )
        if k.shape[0]:
            keys_list.append(k)
            pos_list.append(p)
    if not keys_list:
        return (
            np.zeros((0, 3), dtype=np.int64),
            np.zeros((0, 3, 3), dtype=np.float32),
        )
    return np.concatenate(keys_list), np.concatenate(pos_list)
