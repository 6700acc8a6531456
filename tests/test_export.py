"""Export-pipeline integration tests (writers, autodetect, resume)."""

import os
import struct

import numpy as np
import pytest

import designs
from designcsg_tpu.compiler import ExportConfig
from designcsg_tpu.evaluator import BatchEvaluator
from designcsg_tpu.export import writers
from designcsg_tpu.export.pipeline import autodetect_bounding_box, export_mesh
from designcsg_tpu.ops.marching_cubes import Mesh


@pytest.fixture(scope="module")
def design1():
    return designs.get_design("design1")


@pytest.fixture(scope="module")
def exported(design1, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export")
    cfg = ExportConfig(
        bounding_box_half_diameter=10.0, grid_level=5, gradient_descent_steps=5
    )
    mesh, report = export_mesh(
        design1,
        cfg,
        stl_path=str(tmp / "d1.stl"),
        ply_path=str(tmp / "d1.ply"),
        autodetect_resolution=48,
    )
    return mesh, report, tmp


def test_evaluator_chunking(design1):
    ev = BatchEvaluator(design1, chunk_size=4096)
    pts = np.random.default_rng(0).uniform(-5, 5, size=(10_000, 3)).astype(np.float32)
    vals = ev.eval_sdf_at_points(pts)
    assert vals.shape == (10_000,)
    # chunk boundaries must be seamless: same values as one-shot eval
    ev_big = BatchEvaluator(design1, chunk_size=1 << 20)
    np.testing.assert_allclose(vals, ev_big.eval_sdf_at_points(pts), atol=1e-6)
    normals = ev.eval_normal_at_points(pts[:100])
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-4)


def test_autodetect_bounding_box(design1):
    ev = BatchEvaluator(design1)
    center, half = autodetect_bounding_box(ev, 10.0, resolution=64)
    # Design1 spans roughly ±3.5 world units; the scan covers ±5 (the
    # reference treats half-diameter as diameter) and cubifies.
    assert 3.0 < half < 5.1
    assert np.abs(center).max() < 0.5


def test_export_report(exported):
    mesh, report, _ = exported
    assert report.num_triangles == mesh.num_faces > 1000
    assert report.num_vertices == mesh.num_vertices
    assert mesh.signed_volume() > 50  # roughly a 7-unit-wide solid
    assert set(report.stage_seconds) == {"bounding_box", "extract", "refine", "write"}


def test_stl_format(exported):
    mesh, report, tmp = exported
    path = str(tmp / "d1.stl")
    size = os.path.getsize(path)
    assert size == 84 + 50 * mesh.num_faces
    with open(path, "rb") as fl:
        fl.read(80)
        (n,) = struct.unpack("<I", fl.read(4))
    assert n == mesh.num_faces
    back = writers.read_stl(path)
    np.testing.assert_allclose(back.triangle_soup(), mesh.triangle_soup(), atol=1e-6)


def test_ply_roundtrip(exported):
    mesh, report, tmp = exported
    back = writers.read_ply(str(tmp / "d1.ply"))
    assert back.num_faces == mesh.num_faces
    np.testing.assert_allclose(
        back.triangle_soup(), mesh.triangle_soup(), atol=1e-6
    )


def test_ply_indexed_mode(tmp_path):
    mesh = Mesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32),
        faces=np.array([[0, 1, 2]], dtype=np.int64),
    )
    writers.write_ply(str(tmp_path / "t.ply"), mesh, soup=False)
    back = writers.read_ply(str(tmp_path / "t.ply"))
    assert back.num_vertices == 3
    np.testing.assert_allclose(back.vertices, mesh.vertices)


def test_resume_cache(design1, tmp_path):
    cfg = ExportConfig(
        bounding_box_half_diameter=10.0, grid_level=4, gradient_descent_steps=2
    )
    calls = []

    def progress(stage, frac):
        calls.append(stage)

    mesh1, r1 = export_mesh(
        design1, cfg, resume_dir=str(tmp_path), autodetect_resolution=32,
        progress=progress,
    )
    # Second run hits the extract cache: identical mesh, faster extract.
    mesh2, r2 = export_mesh(
        design1, cfg, resume_dir=str(tmp_path), autodetect_resolution=32
    )
    np.testing.assert_allclose(mesh1.vertices, mesh2.vertices, atol=1e-6)
    assert any(c.startswith("EXTRACTING") for c in calls)
    cache_files = [f for f in os.listdir(tmp_path) if f.startswith("extract_")]
    assert len(cache_files) == 1


def test_auto_strategy_picks_adaptive_when_configured(design1):
    """strategy='auto' honors a design's octree configuration (the
    reference's export is always the adaptive octree, DesignCSG.cpp:717-758):
    min < max octree levels within the grid level select adaptive; the
    per-level triangle histogram in stats is the witness."""
    cfg = ExportConfig(
        bounding_box_half_diameter=10.0,
        minimum_octree_level=2,
        maximum_octree_level=3,
        grid_level=3,
        gradient_descent_steps=1,
    )
    _, report = export_mesh(design1, cfg, autodetect=False, strategy="auto")
    assert "level_triangles" in report.stats

    # Octree range the grid cannot support -> uniform fast path (no levels).
    cfg2 = ExportConfig(
        bounding_box_half_diameter=10.0,
        minimum_octree_level=5,
        maximum_octree_level=7,
        grid_level=4,
        gradient_descent_steps=1,
    )
    _, report2 = export_mesh(design1, cfg2, autodetect=False, strategy="auto")
    assert "level_triangles" not in report2.stats


def test_pallas_corner_offsets_route_through_lattice(design1):
    """On the Pallas path, integer corner offsets ship compact i16 cells
    and expand on DEVICE via a small XLA program feeding the shared
    lattice program (r5: each extra Pallas entry point costs ~20 s of
    axon AOT load per fresh process, and host expansion cost K-fold
    up-link bytes); values must equal the jnp evaluator's on-device
    expansion, and fractional offsets must still take the offsets
    program."""
    import jax.numpy as jnp  # noqa: F401

    rng = np.random.default_rng(5)
    cells = rng.integers(0, 60, (500, 3)).astype(np.int16)
    offs = np.stack(
        np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), -1
    ).reshape(-1, 3)
    lo, cell = (-5.0, -5.0, -5.0), 10.0 / 64
    ev_p = BatchEvaluator(design1, use_pallas=True, pallas_interpret=True)
    ev_j = BatchEvaluator(design1, use_pallas=False)
    a = ev_p.eval_sdf_at_cell_corners(cells, lo, cell, offs)
    b = ev_j.eval_sdf_at_cell_corners(cells, lo, cell, offs)
    assert a.shape == b.shape == (500, 8)
    np.testing.assert_allclose(a, b, atol=2e-5)
    # normals (FD) through the same route
    na = ev_p.eval_normal_at_cell_corners(cells[:64], lo, cell, offs)
    nb = ev_j.eval_normal_at_cell_corners(cells[:64], lo, cell, offs)
    assert na.shape == nb.shape == (64, 8, 3)
    np.testing.assert_allclose(na, nb, atol=5e-4)
    # fractional offsets: the offsets program, same values either way
    foffs = offs + 0.5
    fa = ev_p.eval_sdf_at_cell_corners(cells[:64], lo, cell, foffs)
    fb = ev_j.eval_sdf_at_cell_corners(cells[:64], lo, cell, foffs)
    np.testing.assert_allclose(fa, fb, atol=2e-5)


def test_corner_signs_near_pack(design1):
    """eval_corner_signs_near must reproduce the sign bits and near-band
    flag of the full corner-value evaluation on BOTH the device-fused
    Pallas path and the host-packed fallback — the adaptive extractor's
    classification rides these 2 bytes/cell instead of 32 (signs pick the
    MC config, near drives descent; mesh.hpp:176-183)."""
    rng = np.random.default_rng(11)
    cells = rng.integers(0, 60, (3000, 3)).astype(np.int64)
    offs = np.stack(
        np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), -1
    ).reshape(-1, 3)
    lo, cell = (-4.0, -4.0, -4.0), 8.0 / 64
    bound = np.sqrt(3.0) * cell * 1.1
    for kwargs in ({}, dict(use_pallas=True, pallas_interpret=True)):
        ev = BatchEvaluator(design1, **kwargs)
        signs, near = ev.eval_corner_signs_near(cells, lo, cell, offs, bound)
        vals = ev.eval_sdf_at_cell_corners(cells, lo, cell, offs)
        ref_signs = np.zeros(len(cells), np.uint8)
        for k in range(8):
            ref_signs |= (vals[:, k] < 0).astype(np.uint8) << np.uint8(k)
        assert np.array_equal(signs, ref_signs)
        assert np.array_equal(near, np.abs(vals).min(axis=1) <= bound)
        # mixed signs <=> the dense classification's straddle test
        straddle = (vals.min(axis=1) < 0.0) & (vals.max(axis=1) >= 0.0)
        assert np.array_equal((signs != 0) & (signs != 255), straddle)
        assert straddle.any() and near.any()
    # empty input and K > 8 guard
    ev = BatchEvaluator(design1)
    s0, n0 = ev.eval_corner_signs_near(
        np.zeros((0, 3), np.int64), lo, cell, offs, bound
    )
    assert s0.shape == (0,) and n0.shape == (0,)
    with pytest.raises(ValueError):
        ev.eval_corner_signs_near(
            cells, lo, cell, np.zeros((9, 3)), bound
        )
