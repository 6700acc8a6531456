"""Tape-interpreter correctness tests.

Oracles: (1) the brute-force MIN loop (the reference's commented-out semantic
spec, k1.cl:157-184) for additive-only scenes; (2) closed-form SDFs; (3) the
dynamic (runtime-tape) interpreter must agree with the staged one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import designs
from designcsg_tpu import api
from designcsg_tpu.api import Transform
from designcsg_tpu.constants import INITIAL_SCALE, MAX_DISTANCE
from designcsg_tpu.ops import (
    brute_force_min_sdf,
    make_dynamic_primary_sdf,
    make_normal_fn,
    make_primary_sdf,
)


@pytest.fixture(scope="module")
def design1():
    return designs.get_design("design1")


@pytest.fixture(scope="module")
def design2():
    return designs.get_design("design2")


def _grid_points(n=9, extent=4.0):
    axis = np.linspace(-extent, extent, n)
    pts = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), axis=-1)
    return jnp.asarray(pts.reshape(-1, 3), dtype=jnp.float32)


def test_single_sphere_closed_form():
    c = api.new_design()
    api.draw(api.sphere_brush(c), Transform.identity(), compiler=c)
    scene = c.commit()
    sdf = make_primary_sdf(scene)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [2.5, 0.0, 0.0], [5.0, 0.0, 0.0]])
    vals = np.asarray(sdf(pts, scene.arrays))
    # Root applies INITIAL_SCALE=5: local = v/5, sd = |v|/5 - 0.5
    np.testing.assert_allclose(vals, [-0.5, 0.0, 0.5], atol=1e-6)


def test_additive_scene_matches_brute_force():
    c = api.new_design()
    api.draw(api.sphere_brush(c), Transform.initial(
        position=np.array([0.3, 0.0, 0.0]), yaw=0.2, pitch=0.0, roll=0.0,
        scale=np.array([1.0, 2.0, 1.0])), compiler=c)
    api.draw(api.box_brush(c), Transform.initial(
        position=np.array([-0.5, 0.5, 0.0]), yaw=0.0, pitch=0.4, roll=0.1,
        scale=np.array([0.7, 0.7, 0.7])), compiler=c)
    scene = c.commit()
    pts = _grid_points()
    staged = np.asarray(make_primary_sdf(scene)(pts, scene.arrays))
    # brute force includes the root empty brush (MAX_DISTANCE) — harmless in MIN
    oracle = np.asarray(brute_force_min_sdf(scene, pts))
    np.testing.assert_allclose(staged, oracle, atol=1e-6)


def test_dynamic_matches_staged_design1(design1):
    pts = _grid_points()
    staged = np.asarray(make_primary_sdf(design1)(pts, design1.arrays))
    dynamic = np.asarray(make_dynamic_primary_sdf(design1)(pts, design1.arrays))
    np.testing.assert_allclose(staged, dynamic, atol=1e-6)


def test_dynamic_matches_staged_design2(design2):
    pts = _grid_points(n=7)
    staged = np.asarray(make_primary_sdf(design2)(pts, design2.arrays))
    dynamic = np.asarray(make_dynamic_primary_sdf(design2)(pts, design2.arrays))
    np.testing.assert_allclose(staged, dynamic, atol=1e-5)


def test_subtraction_semantics():
    """Design1's corner spheres must carve the union: at a corner-sphere
    center, the SDF must be positive (inside the carved region)."""
    scene = designs.get_design("design1")
    sdf = make_primary_sdf(scene)
    # corner (1,1,1) in design coords = (5,5,5) world
    corner = jnp.asarray([[5.0, 5.0, 5.0]], dtype=jnp.float32)
    val = float(sdf(corner, scene.arrays)[0])
    assert val > 0.0
    center = jnp.asarray([[0.0, 0.0, 0.0]], dtype=jnp.float32)
    assert float(sdf(center, scene.arrays)[0]) < 0.0


def test_gizmo_union(design1):
    sdf_plain = make_primary_sdf(design1, gizmo=False)
    sdf_gizmo = make_primary_sdf(design1, gizmo=True)
    # A point on the +x axis far from the model but inside the gizmo cylinder
    p = jnp.asarray([[4.9, 0.0, 0.0]], dtype=jnp.float32)
    d_plain = float(sdf_plain(p, design1.arrays)[0])
    d_gizmo = float(sdf_gizmo(p, design1.arrays)[0])
    assert d_gizmo <= d_plain
    assert d_gizmo < 0.05


def test_fd_normals_unit_length(design1):
    sdf = make_primary_sdf(design1)
    normals = make_normal_fn(sdf, mode="fd")
    pts = jnp.asarray([[2.5, 0.1, 0.2], [0.0, 3.0, 0.0]], dtype=jnp.float32)
    n = np.asarray(normals(pts, design1.arrays))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_analytic_normals_match_fd(design1):
    sdf = make_primary_sdf(design1)
    fd = make_normal_fn(sdf, mode="fd")
    analytic = make_normal_fn(sdf, mode="analytic")
    pts = jnp.asarray(
        [[3.1, 0.3, 0.2], [0.2, 3.2, 0.4], [1.0, 1.0, 2.8]], dtype=jnp.float32
    )
    n_fd = np.asarray(fd(pts, design1.arrays))
    n_an = np.asarray(analytic(pts, design1.arrays))
    np.testing.assert_allclose(n_fd, n_an, atol=2e-3)


def test_sdf_is_differentiable_wrt_banks(design1):
    sdf = make_primary_sdf(design1)
    pts = jnp.asarray([[2.0, 0.5, 0.5]], dtype=jnp.float32)

    def loss(position):
        return jnp.sum(sdf(pts, design1.arrays.replace(position=position)) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(design1.arrays.position)))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0.0


def test_empty_scene_raises():
    c = api.new_design()
    with pytest.raises(ValueError):
        c.commit()


def test_sdf_jit_and_batch_shapes(design1):
    sdf = jax.jit(make_primary_sdf(design1))
    pts = _grid_points(n=5).reshape(5, 25, 3)
    out = sdf(pts, design1.arrays)
    assert out.shape == (5, 25)
    assert bool(jnp.all(out < MAX_DISTANCE + 1.0))
