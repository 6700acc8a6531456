"""Compact extraction: on-device marching-cubes compaction.

The active-block path (export/active.py) ships f32 corner *blocks* — already
O(surface), but each shipped byte is a raw corner sample, most of which only
ever contributes a sign bit.  This module compacts on device down to the
information marching cubes actually consumes:

  * per active cell: its linear index + 8-bit corner-sign config
    (5 bytes/cell effective);
  * per cut edge: its linear index + interpolation parameter
    ``t = v0 / (v0 - v1)`` (8 bytes/edge)

— the fixed-capacity cumsum/scatter compaction of SURVEY §7.4 (hard part 4)
done as a plain XLA program: count (tiny reduce) -> pick a power-of-two
bucket -> scatter-compact into it -> ship.  For Design2 at 512^3 this is
~11 MB off-device instead of 87 MB (blocks) or 540 MB (dense).

The host never sees corner values: triangle topology comes from the shipped
configs via the generated 256-case table, vertex positions decode from the
edge key + t (position = edge origin + t * axis).  Produces the same
triangle set as the dense and active paths (same cells, same t formula,
same table).
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluator import BatchEvaluator
from ..ops.marching_cubes import (
    EDGE_AXIS,
    EDGE_ORIGIN,
    Mesh,
    triangle_table,
)
from .active import _make_slab_provider


@jax.jit
def _slab_counts(vals):
    """(n_active_cells, n_cut_x, n_cut_y, n_cut_z) for one slab of corner
    values ``vals f32[sz+1, r1, r1]`` — four scalars, shipped to pick bucket
    sizes and trim the compacted streams exactly."""
    inside = vals < 0.0
    sz = vals.shape[0] - 1
    res = vals.shape[1] - 1
    m = None
    M = None
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                c = vals[dz : dz + sz, dy : dy + res, dx : dx + res]
                m = c if m is None else jnp.minimum(m, c)
                M = c if M is None else jnp.maximum(M, c)
    n_cells = jnp.sum(((m < 0.0) & (M >= 0.0)).astype(jnp.int32))
    cut_x = inside[:, :, :-1] != inside[:, :, 1:]
    cut_y = inside[:, :-1, :] != inside[:, 1:, :]
    cut_z = inside[:-1] != inside[1:]
    return (
        n_cells,
        jnp.sum(cut_x.astype(jnp.int32)),
        jnp.sum(cut_y.astype(jnp.int32)),
        jnp.sum(cut_z.astype(jnp.int32)),
    )


def _compact(flat_mask, payloads, cap: int):
    """Scatter-compact ``payloads[i][flat_mask]`` into length-``cap`` buffers
    (fixed shapes under jit); inactive elements fall into a dropped slot."""
    pos = jnp.cumsum(flat_mask.astype(jnp.int32))
    dest = jnp.where(flat_mask, pos - 1, cap)
    return tuple(
        jnp.zeros((cap + 1,), p.dtype).at[dest].set(p)[:cap] for p in payloads
    )


@functools.partial(jax.jit, static_argnames=("cap_cells", "cap_edges", "midpoint"))
def _slab_compact(vals, cap_cells: int, cap_edges: int, midpoint: bool = False):
    """Compact one slab to (cell_idx i32[Cc], cfg i32[Cc],
    {x,y,z}_edge (idx i32[Ce], t f32[Ce])) — all indices slab-local."""
    inside = (vals < 0.0).astype(jnp.int32)
    sz = vals.shape[0] - 1
    res = vals.shape[1] - 1
    cfg = None
    # corner c = cx + 2*cy + 4*cz (ops/marching_cubes.py CORNERS order)
    for c in range(8):
        cx, cy, cz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        bit = inside[cz : cz + sz, cy : cy + res, cx : cx + res] << c
        cfg = bit if cfg is None else cfg | bit
    active = (cfg != 0) & (cfg != 255)
    n_cells = sz * res * res
    cell_iota = jnp.arange(n_cells, dtype=jnp.int32)
    cells = _compact(
        active.reshape(-1), (cell_iota, cfg.reshape(-1)), cap_cells
    )

    def edge(v0, v1):
        cut = (v0 < 0.0) != (v1 < 0.0)
        if midpoint:
            t = jnp.full(v0.shape, 0.5, jnp.float32)
        else:
            denom = v0 - v1
            t = jnp.where(
                jnp.abs(denom) > 1e-12, v0 / jnp.where(denom == 0, 1.0, denom), 0.5
            )
            t = jnp.clip(t, 0.0, 1.0)
        n = cut.size
        iota = jnp.arange(n, dtype=jnp.int32)
        return _compact(
            cut.reshape(-1), (iota, t.reshape(-1).astype(jnp.float32)), cap_edges
        )

    ex = edge(vals[:, :, :-1], vals[:, :, 1:])
    ey = edge(vals[:, :-1, :], vals[:, 1:, :])
    ez = edge(vals[:-1], vals[1:])
    return cells, ex, ey, ez


def _bucket(n: int, floor: int = 1 << 12) -> int:
    return max(floor, 1 << int(np.ceil(np.log2(max(n, 1)))))


def extract_surface_compact(
    evaluator: BatchEvaluator,
    center: np.ndarray,
    half_diameter: float,
    resolution: int,
    midpoint: bool = False,
    slab_cells: int = 32,
    progress: Optional[Callable[[str, float], None]] = None,
    use_native: Optional[bool] = None,
    device_mesh=None,
    slab_store=None,
    stats: Optional[dict] = None,
) -> Mesh:
    """March ``resolution^3`` cells shipping only compacted (cell config,
    edge t) streams off device.  Same triangle set as the dense/active paths
    (up to enumeration order).

    ``slab_store`` / ``stats``: per-slab resume shards and triangle counts,
    as in :func:`..ops.marching_cubes.extract_surface` (here ``stats`` counts
    active *cells* per slab under ``slab_cells_active`` as well — triangle
    counts are only known after host assembly)."""
    from .. import native

    if use_native is None:
        use_native = native.available()
    res = int(resolution)
    slab = min(int(slab_cells), res)
    if res % slab != 0:
        raise ValueError(f"slab_cells={slab} must divide resolution={res}")
    center = np.asarray(center, dtype=np.float64)
    cell = 2.0 * half_diameter / res
    lo = center - half_diameter
    r1 = res + 1
    provider = _make_slab_provider(evaluator, device_mesh=device_mesh)

    cells_idx: List[np.ndarray] = []
    cells_cfg: List[np.ndarray] = []
    ekeys: List[np.ndarray] = []
    ets: List[np.ndarray] = []
    # Per-axis slab-local plane sizes and global strides (axis-grouped keys
    # identical to ops.marching_cubes: key = ((axis*r1 + gz)*r1 + gy)*r1 + gx).
    edge_dims = {
        0: (r1, res),  # x-edges: (ny=r1, nx=res) per z-plane
        1: (res, r1),  # y-edges
        2: (r1, r1),  # z-edges
    }
    for z0 in range(0, res, slab):
        cached = slab_store.load(z0) if slab_store is not None else None
        if cached is not None:
            ci_g = cached["cells_idx"]
            cc_g = cached["cells_cfg"]
            ek_g = cached["edge_keys"]
            et_g = cached["edge_t"]
        else:
            vals = provider(lo, cell, z0, slab + 1, r1)
            nc, nx_, ny_, nz_ = (
                int(v) for v in jax.device_get(_slab_counts(vals))
            )
            slab_ek: List[np.ndarray] = []
            slab_et: List[np.ndarray] = []
            if nc == 0:
                ci_g = np.zeros((0,), np.int64)
                cc_g = np.zeros((0,), np.uint8)
            else:
                cap_c, cap_e = _bucket(nc), _bucket(max(nx_, ny_, nz_))
                cells, ex, ey, ez = _slab_compact(vals, cap_c, cap_e, midpoint)
                (ci, cc), (exi, ext), (eyi, eyt), (ezi, ezt) = (
                    jax.device_get(cells),
                    jax.device_get(ex),
                    jax.device_get(ey),
                    jax.device_get(ez),
                )
                ci_g = ci[:nc].astype(np.int64) + z0 * res * res
                cc_g = cc[:nc].astype(np.uint8)
                for axis, (idx, t), count in (
                    (0, (exi, ext), nx_),
                    (1, (eyi, eyt), ny_),
                    (2, (ezi, ezt), nz_),
                ):
                    ny, nx = edge_dims[axis]
                    arr_idx = idx[:count].astype(np.int64)
                    arr_t = t[:count]
                    gz = arr_idx // (ny * nx) + z0
                    rem = arr_idx % (ny * nx)
                    gy = rem // nx
                    gx = rem % nx
                    key = ((axis * r1 + gz) * r1 + gy) * r1 + gx
                    slab_ek.append(key)
                    slab_et.append(arr_t.astype(np.float32))
            ek_g = (
                np.concatenate(slab_ek) if slab_ek else np.zeros((0,), np.int64)
            )
            et_g = (
                np.concatenate(slab_et) if slab_et else np.zeros((0,), np.float32)
            )
            if slab_store is not None:
                slab_store.save(
                    z0, cells_idx=ci_g, cells_cfg=cc_g, edge_keys=ek_g, edge_t=et_g
                )
        if ci_g.shape[0]:
            cells_idx.append(ci_g)
            cells_cfg.append(cc_g)
            ekeys.append(ek_g)
            ets.append(et_g)
        if stats is not None:
            stats.setdefault("slab_cells_active", {})[z0] = int(ci_g.shape[0])
        if progress is not None:
            progress("extract", (z0 + slab) / res)

    if not cells_idx:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))

    all_cells = np.concatenate(cells_idx)
    all_cfg = np.concatenate(cells_cfg)
    all_ekeys = np.concatenate(ekeys)
    all_ets = np.concatenate(ets)
    return assemble_from_compact(
        all_cells, all_cfg, all_ekeys, all_ets, res, lo, cell, use_native
    )


def assemble_from_compact(
    cells_idx: np.ndarray,  # i64[N] global linear cell index (z*res + y)*res + x
    cells_cfg: np.ndarray,  # u8[N]
    edge_keys: np.ndarray,  # i64[E] global edge keys (dupes across slabs ok)
    edge_t: np.ndarray,  # f32[E]
    resolution: int,
    lo: np.ndarray,
    cell: float,
    use_native: Optional[bool] = None,
) -> Mesh:
    """Host assembly: configs -> table -> face edge-keys; weld edge keys to
    vertex ids; positions decode from key + t."""
    from .. import native

    if use_native is None:
        use_native = native.available()
    res = int(resolution)
    r1 = res + 1
    if use_native:
        tri_keys = native.cells_to_tri_keys(cells_idx, cells_cfg, res)
    else:
        tri_keys = _cells_to_tri_keys_np(cells_idx, cells_cfg, res)
    if tri_keys.shape[0] == 0:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))

    flat = tri_keys.reshape(-1)
    if use_native:
        _, inverse, first_idx = native.weld(flat)
        unique_keys = flat[first_idx]
    else:
        unique_keys, first_idx, inverse = np.unique(
            flat, return_index=True, return_inverse=True
        )
    # t per unique key: scatter the shipped (key, t) stream into a lookup.
    order = np.argsort(edge_keys, kind="stable")
    sorted_keys = edge_keys[order]
    pos = np.searchsorted(sorted_keys, unique_keys)
    if not np.array_equal(sorted_keys[np.clip(pos, 0, sorted_keys.size - 1)], unique_keys):
        raise AssertionError(
            "triangle references an edge missing from the compacted stream"
        )
    t = edge_t[order][pos]
    # decode key -> axis, (gz, gy, gx)
    axis = unique_keys // (r1 * r1 * r1)
    rem = unique_keys % (r1 * r1 * r1)
    gz = rem // (r1 * r1)
    gy = (rem // r1) % r1
    gx = rem % r1
    grid_pos = np.stack([gx, gy, gz], axis=-1).astype(np.float64)
    step = np.eye(3)[axis]
    grid_pos = grid_pos + t[:, None].astype(np.float64) * step
    vertices = (np.asarray(lo)[None, :] + cell * grid_pos).astype(np.float32)
    faces = inverse.reshape(-1, 3)
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return Mesh(vertices=vertices, faces=faces[ok])


def _cells_to_tri_keys_np(
    cells_idx: np.ndarray, cells_cfg: np.ndarray, resolution: int
) -> np.ndarray:
    """i64[T, 3] global edge keys of every triangle (numpy fallback)."""
    tri_edges, n_tris = triangle_table()
    res = int(resolution)
    r1 = res + 1
    cz = cells_idx // (res * res)
    cy = (cells_idx // res) % res
    cx = cells_idx % res
    counts = n_tris[cells_cfg]
    tri_cell = np.repeat(np.arange(cells_idx.shape[0]), counts)
    slot = (
        np.concatenate([np.arange(c) for c in counts])
        if counts.size
        else np.zeros(0, np.int64)
    )
    if tri_cell.size == 0:
        return np.zeros((0, 3), np.int64)
    edges = tri_edges[cells_cfg[tri_cell], slot]  # i64[T, 3]
    axis = EDGE_AXIS[edges]
    orig = EDGE_ORIGIN[edges]
    gx = cx[tri_cell][:, None] + orig[..., 0]
    gy = cy[tri_cell][:, None] + orig[..., 1]
    gz = cz[tri_cell][:, None] + orig[..., 2]
    return ((axis * r1 + gz) * r1 + gy) * r1 + gx
