"""Marching-cubes table and extraction tests."""

import numpy as np
import pytest

from designcsg_tpu.ops.marching_cubes import (
    Mesh,
    extract_surface,
    refine_vertices,
    triangle_table,
)


def _sphere(pts, r=1.0):
    return np.linalg.norm(pts, axis=-1) - r


def _box(pts, h=0.8):
    v = np.abs(pts)
    return np.max(v - h, axis=-1)


def _edge_counts(mesh: Mesh):
    f = mesh.faces
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    return counts


def test_table_structure():
    tri_edges, n_tris = triangle_table()
    assert tri_edges.shape[0] == 256
    assert n_tris[0] == 0 and n_tris[255] == 0
    # Single-corner configs produce exactly one triangle
    for c in range(8):
        assert n_tris[1 << c] == 1
        assert n_tris[0xFF ^ (1 << c)] == 1
    # Complementary configs cut the same edge set (triangulation may differ:
    # the isolate-inside ambiguity rule is not complement-symmetric, by
    # design — it only needs to be *consistent across the shared face*).
    for c in range(256):
        ours = set(tri_edges[c][tri_edges[c] >= 0].ravel().tolist())
        comp = set(tri_edges[255 - c][tri_edges[255 - c] >= 0].ravel().tolist())
        assert ours == comp
    # classic MC bound
    assert tri_edges.shape[1] <= 5


@pytest.mark.parametrize("shape", ["sphere", "box"])
def test_watertight_and_oriented(shape):
    sdf = _sphere if shape == "sphere" else _box
    mesh = extract_surface(sdf, np.zeros(3), 1.5, 48)
    counts = _edge_counts(mesh)
    assert (counts == 2).all(), "every edge must be shared by exactly 2 faces"
    assert mesh.signed_volume() > 0, "outward orientation"


def test_sphere_metrics_converge():
    mesh = extract_surface(_sphere, np.zeros(3), 1.5, 64)
    assert abs(mesh.signed_volume() - 4 / 3 * np.pi) / (4 / 3 * np.pi) < 0.01
    assert abs(mesh.surface_area() - 4 * np.pi) / (4 * np.pi) < 0.01


def test_midpoint_mode_matches_reference_strategy():
    """Midpoint vertices (the reference's choice, mesh.hpp:283-308) still give
    a watertight mesh; refinement recovers accuracy."""
    mesh = extract_surface(_sphere, np.zeros(3), 1.5, 32, midpoint=True)
    assert (_edge_counts(mesh) == 2).all()

    def normal_eval(p):
        return p / np.linalg.norm(p, axis=-1, keepdims=True)

    refined = refine_vertices(mesh.vertices, _sphere, normal_eval, steps=20)
    err = np.abs(np.linalg.norm(refined, axis=-1) - 1.0)
    assert err.max() < 1e-5


def test_empty_volume():
    mesh = extract_surface(lambda p: np.full(p.shape[0], 5.0), np.zeros(3), 1.0, 16)
    assert mesh.num_faces == 0


def test_offcenter_box():
    center = np.array([0.5, -0.25, 1.0])

    def sdf(pts):
        return _box(pts - center, 0.5)

    mesh = extract_surface(sdf, center, 1.0, 32)
    assert (_edge_counts(mesh) == 2).all()
    assert abs(mesh.signed_volume() - 1.0) < 0.05
    lo = mesh.vertices.min(axis=0)
    hi = mesh.vertices.max(axis=0)
    np.testing.assert_allclose(lo, center - 0.5, atol=0.05)
    np.testing.assert_allclose(hi, center + 0.5, atol=0.05)
