"""Compact extraction (export/compact.py): the on-device (cell config,
edge t) compaction must reproduce the dense path's triangle set exactly —
including across slab boundaries, where shared corner planes make edge keys
appear in two slabs' compacted streams."""

import numpy as np
import pytest

import designs
from designcsg_tpu import native
from designcsg_tpu.evaluator import BatchEvaluator
from designcsg_tpu.export.compact import (
    assemble_from_compact,
    extract_surface_compact,
)
from designcsg_tpu.ops.marching_cubes import extract_surface


@pytest.fixture(scope="module")
def design1():
    return designs.get_design("design1")


@pytest.fixture(scope="module")
def evaluator(design1):
    return BatchEvaluator(design1)


def canonical_triangles(mesh):
    tri = np.round(mesh.vertices[mesh.faces].astype(np.float64), 5)
    out = []
    for t in tri:
        rows = [tuple(r) for r in t]
        k = min(range(3), key=lambda i: rows[i])
        out.append(tuple(rows[k:] + rows[:k]))
    return sorted(out)


def test_compact_matches_dense_multislab(evaluator):
    """res=64, slab=16 -> 4 slabs: the 3 interior shared corner planes put
    duplicate x/y edge keys into adjacent slabs' streams; assembly must
    dedupe them (searchsorted first-occurrence) and still weld exactly.

    Topology (faces/vertices/welding) must be identical; vertex positions
    agree to f32 ulps only — the dense path evaluates corners through the
    chunked point evaluator while compact's provider evaluates the grid in
    one program, and XLA fuses the two shapes differently (1-ulp corner
    deltas shift interpolated t in the 6th decimal)."""
    center = np.zeros(3)
    dense = extract_surface(
        evaluator.eval_sdf_at_points, center, 4.0, 64, slab_cells=16
    )
    compact = extract_surface_compact(evaluator, center, 4.0, 64, slab_cells=16)
    assert compact.num_faces == dense.num_faces
    assert compact.num_vertices == dense.num_vertices
    a = canonical_triangles(dense)
    b = canonical_triangles(compact)
    mismatched = [(x, y) for x, y in zip(a, b) if x != y]
    assert len(mismatched) < 0.01 * len(a)
    for x, y in mismatched:
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-5)


def test_compact_duplicate_edge_keys_exist(evaluator):
    """Precondition check for the test above: the compacted streams really do
    contain duplicate edge keys across slab boundaries (otherwise the dedupe
    path is untested)."""
    stats = {}
    stream = {"keys": []}

    import designcsg_tpu.export.compact as compact_mod

    orig = compact_mod.assemble_from_compact

    def spy(cells_idx, cells_cfg, edge_keys, edge_t, *args, **kwargs):
        stream["keys"] = edge_keys
        return orig(cells_idx, cells_cfg, edge_keys, edge_t, *args, **kwargs)

    compact_mod.assemble_from_compact = spy
    try:
        extract_surface_compact(
            evaluator, np.zeros(3), 4.0, 32, slab_cells=8, stats=stats
        )
    finally:
        compact_mod.assemble_from_compact = orig
    keys = np.asarray(stream["keys"])
    assert keys.size > np.unique(keys).size, "no duplicate edge keys crossed slabs"
    assert sum(stats["slab_cells_active"].values()) > 0


def test_compact_matches_active_both_backends(evaluator):
    from designcsg_tpu.export.active import extract_surface_active

    center = np.zeros(3)
    active = extract_surface_active(evaluator, center, 2.0, 32, slab_cells=16)
    for use_native in ([True, False] if native.available() else [False]):
        compact = extract_surface_compact(
            evaluator, center, 2.0, 32, slab_cells=16, use_native=use_native
        )
        assert canonical_triangles(compact) == canonical_triangles(active)


def test_compact_midpoint_mode(evaluator):
    dense = extract_surface(
        evaluator.eval_sdf_at_points, np.zeros(3), 2.0, 32, midpoint=True
    )
    compact = extract_surface_compact(
        evaluator, np.zeros(3), 2.0, 32, midpoint=True
    )
    assert canonical_triangles(compact) == canonical_triangles(dense)


def test_compact_empty_volume(evaluator):
    """A volume the surface never enters produces an empty mesh."""
    mesh = extract_surface_compact(
        evaluator, np.array([50.0, 50.0, 50.0]), 1.0, 16
    )
    assert mesh.num_faces == 0 and mesh.num_vertices == 0


def test_assemble_missing_edge_raises():
    """A triangle referencing an edge absent from the shipped stream is a
    hard error (stream/table inconsistency), not silent garbage."""
    # config 1 (corner 0 inside) cuts edges 0 (x), 4 (y), 8 (z) of cell 0.
    cells_idx = np.array([0], np.int64)
    cells_cfg = np.array([1], np.uint8)
    r1 = 5
    keys_full = []
    for axis, (gx, gy, gz) in ((0, (0, 0, 0)), (1, (0, 0, 0)), (2, (0, 0, 0))):
        keys_full.append(((axis * r1 + gz) * r1 + gy) * r1 + gx)
    edge_keys = np.array(keys_full[:2], np.int64)  # drop the z-edge
    edge_t = np.full(edge_keys.shape, 0.5, np.float32)
    with pytest.raises(AssertionError, match="missing from the compacted"):
        assemble_from_compact(
            cells_idx,
            cells_cfg,
            edge_keys,
            edge_t,
            4,
            np.zeros(3),
            0.25,
            use_native=False,
        )


def test_compact_bytes_shipped_accounting(evaluator):
    """The compact stream for a 64^3 Design1 volume is far smaller than the
    dense corner grid (the claim behind the strategy: bytes-off-device is
    the export bottleneck on TPU)."""
    captured = {}

    import designcsg_tpu.export.compact as compact_mod

    orig = compact_mod.assemble_from_compact

    def spy(cells_idx, cells_cfg, edge_keys, edge_t, *args, **kwargs):
        captured["bytes"] = (
            cells_idx.nbytes + cells_cfg.nbytes + edge_keys.nbytes + edge_t.nbytes
        )
        return orig(cells_idx, cells_cfg, edge_keys, edge_t, *args, **kwargs)

    compact_mod.assemble_from_compact = spy
    try:
        extract_surface_compact(evaluator, np.zeros(3), 2.0, 64, slab_cells=16)
    finally:
        compact_mod.assemble_from_compact = orig
    dense_bytes = 65 * 65 * 65 * 4
    assert captured["bytes"] < dense_bytes / 3
