"""Active-block extraction (export/active.py): the on-device surface mask +
block gather must reproduce the dense path's triangle set exactly."""

import numpy as np
import pytest

import designs
from designcsg_tpu import native
from designcsg_tpu.evaluator import BatchEvaluator
from designcsg_tpu.export.active import (
    _block_mask,
    choose_block,
    extract_surface_active,
)
from designcsg_tpu.ops.marching_cubes import (
    Mesh,
    _block_triangles,
    _slab_triangles,
    extract_surface,
)


@pytest.fixture(scope="module")
def design1():
    return designs.get_design("design1")


@pytest.fixture(scope="module")
def evaluator(design1):
    return BatchEvaluator(design1)


def canonical_triangles(mesh: Mesh):
    """Order-independent triangle multiset (rotation-canonical per triangle,
    sorted): the active and dense paths enumerate cells in different orders
    and weld vertices with different numbering, but must produce the same
    geometric triangles with the same winding."""
    tri = np.round(mesh.vertices[mesh.faces].astype(np.float64), 5)
    out = []
    for t in tri:
        rows = [tuple(r) for r in t]
        k = min(range(3), key=lambda i: rows[i])
        out.append(tuple(rows[k:] + rows[:k]))
    return sorted(out)


def test_active_matches_dense(evaluator):
    center = np.zeros(3)
    dense = extract_surface(
        evaluator.eval_sdf_at_points, center, 2.0, 64, slab_cells=32
    )
    active = extract_surface_active(evaluator, center, 2.0, 64, slab_cells=32)
    assert dense.num_faces == active.num_faces > 0
    assert canonical_triangles(dense) == canonical_triangles(active)


def test_active_numpy_host_matches_native(evaluator):
    if not native.available():
        pytest.skip("native library unavailable")
    center = np.zeros(3)
    a = extract_surface_active(
        evaluator, center, 2.0, 32, slab_cells=32, use_native=True
    )
    b = extract_surface_active(
        evaluator, center, 2.0, 32, slab_cells=32, use_native=False
    )
    assert canonical_triangles(a) == canonical_triangles(b)


def test_block_mask_flags_exactly_the_sign_change_blocks():
    # Sphere of radius 0.5 sampled on a 17^3 corner grid over [-1, 1]^3.
    r1 = 17
    coords = np.linspace(-1.0, 1.0, r1)
    g = np.stack(np.meshgrid(coords, coords, coords, indexing="ij"), axis=-1)
    vals = np.linalg.norm(g, axis=-1).astype(np.float32) - 0.5  # [z, y, x]
    mask = np.asarray(_block_mask(vals, 8, 8, 8))
    assert mask.shape == (2, 2, 2)
    # The sphere is centered: every octant block touches the surface.
    assert mask.all()
    # A constant-sign grid has no active blocks.
    mask_empty = np.asarray(_block_mask(vals + 10.0, 8, 8, 8))
    assert not mask_empty.any()


def test_block_triangles_offset_consistency():
    # A block extracted at origin (x0, y0, z0) must emit the same triangles
    # as the containing slab restricted to that block's cells.
    rng = np.random.default_rng(7)
    res = 8
    vals = rng.uniform(-1, 1, size=(res + 1, res + 1, res + 1)).astype(np.float32)
    slab_keys, slab_pos = _slab_triangles(vals, 0, res, midpoint=False)
    block = vals[2:7, 3:8, 1:6]  # 4^3 cells at origin (x=1, y=3, z=2)
    bkeys, bpos = _block_triangles(block, (1, 3, 2), res, midpoint=False)
    # Every block triangle appears in the slab triangle set.
    slab_set = {tuple(k) for k in slab_keys.reshape(-1, 3)}
    for k in bkeys.reshape(-1, 3):
        assert tuple(k) in slab_set


def test_native_mc_blocks_matches_numpy():
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    K, b = 5, 4
    blocks = rng.uniform(-1, 1, size=(K, b + 1, b + 1, b + 1)).astype(np.float32)
    coords = (rng.integers(0, 12, size=(K, 3)) * 4).astype(np.int64)
    nk, npos = native.mc_blocks(blocks, coords, 64, False)
    pk_list, pp_list = [], []
    for i in range(K):
        k, p = _block_triangles(blocks[i], tuple(coords[i]), 64, False)
        pk_list.append(k)
        pp_list.append(p)
    pk = np.concatenate(pk_list)
    pp = np.concatenate(pp_list)
    np.testing.assert_array_equal(nk, pk)
    np.testing.assert_allclose(npos, pp, atol=1e-6)


def test_sharded_active_matches_single_device(evaluator):
    import jax

    from designcsg_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    center = np.zeros(3)
    single = extract_surface_active(evaluator, center, 2.0, 32, slab_cells=32)
    sharded = extract_surface_active(
        evaluator, center, 2.0, 32, slab_cells=32, device_mesh=make_mesh()
    )
    assert single.num_faces == sharded.num_faces > 0
    assert canonical_triangles(single) == canonical_triangles(sharded)


def test_choose_block_divides():
    for res in (32, 64, 128, 512):
        for slab in (8, 16, 32):
            bz, by, bx = choose_block(res, slab)
            assert slab % bz == 0 and res % by == 0 and res % bx == 0
    # Non-power-of-two resolutions still get valid (possibly size-1) blocks.
    bz, by, bx = choose_block(48, 12)
    assert 12 % bz == 0 and 48 % by == 0 and 48 % bx == 0


def test_export_mesh_strategies_agree(design1, tmp_path):
    from designcsg_tpu.compiler import ExportConfig
    from designcsg_tpu.export.pipeline import export_mesh

    cfg = ExportConfig(
        bounding_box_half_diameter=10.0, grid_level=5, gradient_descent_steps=2
    )
    kw = dict(autodetect_resolution=32)
    mesh_a, _ = export_mesh(design1, cfg, strategy="active", **kw)
    mesh_d, _ = export_mesh(design1, cfg, strategy="dense", **kw)
    assert mesh_a.num_faces == mesh_d.num_faces
    assert abs(mesh_a.signed_volume() - mesh_d.signed_volume()) < 1e-6
    assert abs(mesh_a.surface_area() - mesh_d.surface_area()) < 1e-6
