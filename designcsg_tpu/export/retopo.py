"""Retopology: T-junction crack healing for mixed-resolution meshes.

Port of the reference's crack-patching pass (reference:
/root/reference/master/cms/main/Headers/mesh.hpp:432-529): every triangle
vertex is indexed to a global grid (the reference's Indexer/Deindexer,
mesh.hpp:413-430); each triangle's edges are walked at grid resolution
collecting *occupied* grid points into an n-gon, which is re-triangulated
with an alternating strip (geometry.hpp:228-248).  This heals the cracks that
appear where meshes of different cell sizes meet: the coarse side's edge
passes through lattice points that the fine side has vertices on; inserting
those points makes the two sides share edges exactly.

The uniform-grid extractor (ops/marching_cubes.py, export/active.py) never
produces cracks — welding is exact — so this pass is not in the default
export.  It matters when *mixed resolutions* meet: region exports at
different ``grid_level`` stitched with :func:`merge_meshes`, or meshes from
resumable per-region runs.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import numpy as np

from ..ops.marching_cubes import Mesh


def strip_triangulate(polygon: Sequence[int]) -> List[Tuple[int, int, int]]:
    """Alternating-ends strip triangulation of a polygon's vertex ids,
    preserving the polygon's winding (the reference's
    getIndexTriangleStrip, geometry.hpp:228-248)."""
    m = len(polygon)
    if m < 3:
        return []
    seq = []
    lo, hi = 0, m - 1
    take_front = True
    while lo <= hi:
        if take_front:
            seq.append(polygon[lo])
            lo += 1
        else:
            seq.append(polygon[hi])
            hi -= 1
        take_front = not take_front
    tris = []
    for i in range(len(seq) - 2):
        a, b, c = seq[i], seq[i + 1], seq[i + 2]
        # Alternate winding so every strip triangle matches the polygon's
        # (seq zig-zags front/back, flipping orientation every step).
        tris.append((a, c, b) if i % 2 == 0 else (a, b, c))
    return tris


def merge_meshes(meshes: Iterable[Mesh], weld_eps: float = 0.0) -> Mesh:
    """Concatenate meshes and weld exactly-coincident vertices (or within
    ``weld_eps`` by rounded-coordinate key).  Region exports over adjacent
    boxes share boundary vertices exactly at matching resolutions; at
    mismatched resolutions the result has T-junction cracks — heal with
    :func:`retopologize`."""
    meshes = list(meshes)
    if not meshes:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
    verts = np.concatenate([m.vertices for m in meshes]).astype(np.float32)
    offsets = np.cumsum([0] + [m.num_vertices for m in meshes][:-1])
    faces = np.concatenate(
        [m.faces + off for m, off in zip(meshes, offsets)]
    ).astype(np.int64)
    if weld_eps > 0.0:
        key = np.round(verts / weld_eps).astype(np.int64)
    else:
        key = verts.view(np.int32).astype(np.int64).reshape(-1, 3)
    _, first, inverse = np.unique(
        key, axis=0, return_index=True, return_inverse=True
    )
    verts = verts[first]
    faces = inverse[faces]
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return Mesh(vertices=verts, faces=faces[ok])


def retopologize(
    mesh: Mesh,
    grid_origin: np.ndarray,
    cell: float,
) -> Mesh:
    """Heal T-junction cracks by re-triangulating every triangle against the
    global vertex lattice.

    ``grid_origin``/``cell`` define the finest lattice the mesh's vertices
    live on (for merged region exports: the finest region's grid).  Vertices
    are snapped to lattice indices; each triangle edge is walked along the
    lattice segment between its endpoints, inserting any lattice point
    occupied by another vertex of the mesh; the resulting n-gon is
    strip-triangulated.  Winding is preserved, so a watertight-up-to-cracks
    input becomes edge-manifold."""
    lo = np.asarray(grid_origin, dtype=np.float64)
    v = mesh.vertices.astype(np.float64)
    idx = np.round((v - lo[None, :]) / cell).astype(np.int64)

    # Occupied lattice -> representative vertex id (first occurrence wins —
    # coincident vertices are welded, as in merge_meshes).
    occupied: dict = {}
    canon = np.empty(mesh.num_vertices, dtype=np.int64)
    for i in range(mesh.num_vertices):
        k = (idx[i, 0], idx[i, 1], idx[i, 2])
        if k not in occupied:
            occupied[k] = i
        canon[i] = occupied[k]

    new_faces: List[Tuple[int, int, int]] = []
    for tri in mesh.faces:
        a, b, c = (int(canon[t]) for t in tri)
        if a == b or b == c or a == c:
            continue
        ngon: List[int] = []
        for p, q in ((a, b), (b, c), (c, a)):
            ngon.append(p)
            dp, dq = idx[p], idx[q]
            delta = dq - dp
            n = int(np.max(np.abs(delta)))
            if n <= 1:
                continue
            g = np.gcd.reduce(np.abs(delta))
            if g <= 1:
                continue  # no interior lattice points on this segment
            step = delta // g
            for k in range(1, g):
                pt = dp + step * k
                key = (int(pt[0]), int(pt[1]), int(pt[2]))
                hit = occupied.get(key)
                if hit is not None and hit != p and hit != q:
                    ngon.append(int(hit))
        # Deduplicate consecutive repeats introduced by welding.
        dedup = [x for i, x in enumerate(ngon) if x != ngon[i - 1]]
        if len(dedup) < 3:
            continue
        new_faces.extend(strip_triangulate(dedup))

    faces = np.asarray(new_faces, dtype=np.int64).reshape(-1, 3)
    # Compact unused vertices.
    used = np.unique(faces) if faces.size else np.zeros(0, np.int64)
    remap = np.full(mesh.num_vertices, -1, dtype=np.int64)
    remap[used] = np.arange(used.size)
    return Mesh(
        vertices=mesh.vertices[used].astype(np.float32),
        faces=remap[faces] if faces.size else faces,
    )
