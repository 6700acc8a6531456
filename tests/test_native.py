"""Native C++ mesh-ops tests: the ctypes library must agree exactly with the
numpy implementations it accelerates."""

import numpy as np
import pytest

from designcsg_tpu import native
from designcsg_tpu.export import writers
from designcsg_tpu.ops.marching_cubes import (
    Mesh,
    _slab_triangles,
    extract_surface,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _sphere(pts, r=1.0):
    return np.linalg.norm(pts, axis=-1) - r


def _corner_slab(res=32, z0=4, sz=6):
    r1 = res + 1
    axis = np.linspace(-1.5, 1.5, r1)
    z = axis[z0 : z0 + sz + 1]
    zz, yy, xx = np.meshgrid(z, axis, axis, indexing="ij")
    pts = np.stack([xx, yy, zz], axis=-1)
    return _sphere(pts.reshape(-1, 3)).reshape(sz + 1, r1, r1).astype(np.float32), res


@pytest.mark.parametrize("midpoint", [False, True])
def test_mc_slab_matches_numpy(midpoint):
    vals, res = _corner_slab()
    keys_np, pos_np = _slab_triangles(vals, 4, res, midpoint)
    keys_c, pos_c = native.mc_slab(vals, 4, midpoint)
    assert keys_c.shape == keys_np.shape
    # Same traversal order (z, y, x cells; table order within a cell)
    np.testing.assert_array_equal(keys_c, keys_np)
    np.testing.assert_allclose(pos_c, pos_np, atol=1e-6)


def test_weld_matches_numpy():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 500, size=10_000).astype(np.int64)
    num, inverse, first_idx = native.weld(keys)
    assert num == len(np.unique(keys))
    # welding is correct iff keys[first_idx][inverse] == keys
    np.testing.assert_array_equal(keys[first_idx][inverse], keys)


def test_extract_native_equals_numpy():
    mesh_np = extract_surface(_sphere, np.zeros(3), 1.5, 32, use_native=False)
    mesh_c = extract_surface(_sphere, np.zeros(3), 1.5, 32, use_native=True)
    # vertex order may differ (hash vs sorted); compare triangle soups
    np.testing.assert_allclose(
        np.sort(mesh_c.triangle_soup().reshape(-1, 9), axis=0),
        np.sort(mesh_np.triangle_soup().reshape(-1, 9), axis=0),
        atol=1e-6,
    )
    assert abs(mesh_c.signed_volume() - mesh_np.signed_volume()) < 1e-6


def test_native_stl_matches_python_writer(tmp_path):
    mesh = extract_surface(_sphere, np.zeros(3), 1.5, 16, use_native=False)
    p1 = str(tmp_path / "native.stl")
    p2 = str(tmp_path / "python.stl")
    assert native.write_stl_soup(p1, mesh.triangle_soup()) == mesh.num_faces
    writers.write_stl(p2, mesh, header_text="x")  # force python path
    b1 = open(p1, "rb").read()
    b2 = open(p2, "rb").read()
    assert b1[80:] == b2[80:]  # identical after the header
